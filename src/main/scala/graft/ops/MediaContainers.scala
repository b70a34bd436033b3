package graft.ops

/**
 * REAL container-format encode/decode for the two media formats whose
 * containers are pure byte layout — no codec library required: canonical
 * PCM WAV (RIFF/WAVE, 44-byte header) and uncompressed 24-bpp BMP
 * (BITMAPFILEHEADER + BITMAPINFOHEADER). This upgrades the multimodal
 * "decode" step from a documented stub to actual byte-level container
 * parsing for audio and image assets; video container demuxing genuinely
 * needs codec libraries and remains stubbed ([[Multimodal.frameSample]]).
 *
 * All multi-byte fields are little-endian per both specs. Writers emit
 * spec-valid files (playable/viewable outside this system); parsers
 * validate magics and reject malformed input loudly.
 */
object MediaContainers {

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def ascii(b: Array[Byte], off: Int, n: Int): String =
    new String(b, off, n, java.nio.charset.StandardCharsets.US_ASCII)

  final case class WavInfo(sampleRate: Int, channels: Int, bitsPerSample: Int,
                           nSamples: Int, totalBytes: Int)
  final case class BmpInfo(width: Int, height: Int, bitsPerPixel: Int, totalBytes: Int)

  /** Canonical 44-byte-header PCM16 mono WAV with deterministic samples
    * (seeded LCG — no RNG). */
  def wavBytes(sampleRate: Int, nSamples: Int, seed: Long): Array[Byte] = {
    require(sampleRate > 0 && nSamples >= 0)
    val dataLen = nSamples * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes); out.write(le32(36 + dataLen))
    out.write("WAVE".getBytes)
    out.write("fmt ".getBytes); out.write(le32(16))
    out.write(le16(1))                    // PCM
    out.write(le16(1))                    // mono
    out.write(le32(sampleRate))
    out.write(le32(sampleRate * 2))       // byte rate = rate * block align
    out.write(le16(2))                    // block align
    out.write(le16(16))                   // bits per sample
    out.write("data".getBytes); out.write(le32(dataLen))
    var s = seed | 1
    var i = 0
    while (i < nSamples) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out.write(le16(((s >>> 33) & 0xffff).toInt))
      i += 1
    }
    out.toByteArray
  }

  /** Parse a PCM WAV header: validates RIFF/WAVE/fmt/data magics and walks
    * the chunk list (spec-correct: tolerates extra chunks before `data`). */
  def parseWav(bytes: Array[Byte]): WavInfo = {
    require(bytes.length >= 44, s"WAV too short: ${bytes.length} bytes")
    require(ascii(bytes, 0, 4) == "RIFF" && ascii(bytes, 8, 4) == "WAVE",
      "not a RIFF/WAVE file")
    var off = 12
    var rate = -1; var channels = -1; var bits = -1; var dataLen = -1
    while (off + 8 <= bytes.length && (rate < 0 || dataLen < 0)) {
      val id = ascii(bytes, off, 4)
      val len = rd32(bytes, off + 4)
      id match {
        case "fmt " =>
          require(rd16(bytes, off + 8) == 1, "only PCM WAV supported")
          channels = rd16(bytes, off + 10)
          rate = rd32(bytes, off + 12)
          bits = rd16(bytes, off + 22)
        case "data" => dataLen = len
        case _ => // skip unknown chunk (spec: chunks are padded to even)
      }
      off += 8 + len + (len & 1)
    }
    require(rate > 0 && dataLen >= 0, "missing fmt /data chunk")
    WavInfo(rate, channels, bits, dataLen / (channels * bits / 8), bytes.length)
  }

  /** Uncompressed 24-bpp bottom-up BMP with deterministic pixels; rows
    * padded to 4 bytes per spec. */
  def bmpBytes(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0)
    val rowSize = ((3 * width + 3) / 4) * 4
    val dataLen = rowSize * height
    val out = new java.io.ByteArrayOutputStream(54 + dataLen)
    out.write('B'); out.write('M')
    out.write(le32(54 + dataLen))         // file size
    out.write(le32(0))                    // reserved
    out.write(le32(54))                   // pixel-array offset
    out.write(le32(40))                   // BITMAPINFOHEADER size
    out.write(le32(width))
    out.write(le32(height))
    out.write(le16(1))                    // planes
    out.write(le16(24))                   // bpp
    out.write(le32(0))                    // BI_RGB (uncompressed)
    out.write(le32(dataLen))
    out.write(le32(2835)); out.write(le32(2835)) // 72 DPI
    out.write(le32(0)); out.write(le32(0))
    var s = seed | 1
    var y = 0
    while (y < height) {
      var x = 0
      while (x < rowSize) {
        s = s * 6364136223846793005L + 1442695040888963407L
        out.write(((s >>> 33) & 0xff).toInt)
        x += 1
      }
      y += 1
    }
    out.toByteArray
  }

  /** Parse a BMP header: validates the BM magic and BI_RGB layout. */
  def parseBmp(bytes: Array[Byte]): BmpInfo = {
    require(bytes.length >= 54, s"BMP too short: ${bytes.length} bytes")
    require(bytes(0) == 'B' && bytes(1) == 'M', "not a BMP file")
    require(rd32(bytes, 30) == 0, "only uncompressed (BI_RGB) BMP supported")
    BmpInfo(rd32(bytes, 18), rd32(bytes, 22), rd16(bytes, 28), bytes.length)
  }

  // ------------------------------------------------------------------ MP4
  // ISO-BMFF (MP4) is big-endian, unlike RIFF/BMP above.

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int): Array[Byte] =
    Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def rdBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** `size + fourcc + payload` ISO-BMFF box. Sizes are computed from the
    * assembled children, never hardcoded. */
  private def box(fourcc: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.foldLeft(Array.emptyByteArray)(_ ++ _)
    be32(8 + body.length) ++ fourcc.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ body
  }

  /** Box-level metadata of an MP4: everything a demuxer reads before any
    * codec is involved. `sampleSizes`/`chunkOffset` locate the raw sample
    * byte ranges inside `mdat` (sample i starts at
    * `chunkOffset + sum(sampleSizes take i)`). */
  final case class Mp4Info(timescale: Int, durationTicks: Int,
                           width: Int, height: Int,
                           sampleCount: Int, sampleSizes: Array[Int],
                           chunkOffset: Int, totalBytes: Int)

  /**
   * Spec-valid minimal single-track MP4 (ISO/IEC 14496-12 box layout):
   * `ftyp` + `moov`(`mvhd` + `trak`(`tkhd` + `mdia`(`mdhd` + `hdlr` +
   * `minf`(`vmhd` + `dinf`/`dref` + `stbl`(`stsd`/`stts`/`stsc`/`stsz`/
   * `stco`))))) + `mdat`, one chunk holding all samples back-to-back with
   * deterministic LCG payload bytes (no RNG). Duration = nSamples ×
   * sampleDelta in `timescale` ticks; width/height land in `tkhd` as
   * 16.16 fixed point. The `mp4v` sample entry carries no decoder-config
   * box — box-level demux needs none; sample DECODE is the part that
   * genuinely requires codec libraries and stays stubbed.
   */
  def mp4Bytes(width: Int, height: Int, sampleSizes: Array[Int],
               timescale: Int, sampleDelta: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0 && timescale > 0 && sampleDelta > 0)
    require(sampleSizes.nonEmpty && sampleSizes.forall(_ > 0))
    val n = sampleSizes.length
    val duration = n * sampleDelta
    val ftyp = box("ftyp", "isom".getBytes, be32(0), "isom".getBytes, "mp41".getBytes)
    val mvhd = box("mvhd", be32(0), be32(0), be32(0), be32(timescale), be32(duration),
      be32(0x00010000), be16(0x0100), be16(0), be32(0), be32(0),
      identityMatrix, new Array[Byte](24), be32(2))
    val tkhd = box("tkhd", be32(3) /* flags: enabled+in-movie */, be32(0), be32(0),
      be32(1), be32(0), be32(duration), new Array[Byte](8),
      be16(0), be16(0), be16(0), be16(0), identityMatrix,
      be32(width << 16), be32(height << 16))
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(timescale), be32(duration),
      be16(0x55c4) /* 'und' */, be16(0))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes,
      new Array[Byte](12), Array(0.toByte))
    val vmhd = box("vmhd", be32(1), be16(0), new Array[Byte](6))
    val dinf = box("dinf", box("dref", be32(0), be32(1), box("url ", be32(1))))
    val sampleEntry = be32(86) ++ "mp4v".getBytes ++ new Array[Byte](6) ++ be16(1) ++
      be16(0) ++ be16(0) ++ new Array[Byte](12) ++ be16(width) ++ be16(height) ++
      be32(0x00480000) ++ be32(0x00480000) ++ be32(0) ++ be16(1) ++
      new Array[Byte](32) ++ be16(24) ++ be16(0xffff)
    val stsd = box("stsd", be32(0), be32(1), sampleEntry)
    val stts = box("stts", be32(0), be32(1), be32(n), be32(sampleDelta))
    val stsc = box("stsc", be32(0), be32(1), be32(1), be32(n), be32(1))
    val stsz = box("stsz", be32(0), be32(0), be32(n),
      sampleSizes.flatMap(be32))
    // stco's chunk offset is an ABSOLUTE file offset — computed from the
    // assembled box sizes, which is what makes parsing it a real check
    def moovWith(chunkOffset: Int): Array[Byte] = {
      val stco = box("stco", be32(0), be32(1), be32(chunkOffset))
      val stbl = box("stbl", stsd, stts, stsc, stsz, stco)
      val minf = box("minf", vmhd, dinf, stbl)
      val mdia = box("mdia", mdhd, hdlr, minf)
      val trak = box("trak", tkhd, mdia)
      box("moov", mvhd, trak)
    }
    val moovLen = moovWith(0).length // stco is fixed-width: length is offset-independent
    val chunkOffset = ftyp.length + moovLen + 8
    val dataLen = sampleSizes.sum
    val out = new java.io.ByteArrayOutputStream(chunkOffset + dataLen)
    out.write(ftyp); out.write(moovWith(chunkOffset))
    out.write(be32(8 + dataLen)); out.write("mdat".getBytes)
    var s = seed | 1
    var i = 0
    while (i < dataLen) {
      s = s * 6364136223846793005L + 1442695040888963407L
      out.write(((s >>> 33) & 0xff).toInt)
      i += 1
    }
    out.toByteArray
  }

  private val identityMatrix: Array[Byte] =
    be32(0x00010000) ++ be32(0) ++ be32(0) ++
      be32(0) ++ be32(0x00010000) ++ be32(0) ++
      be32(0) ++ be32(0) ++ be32(0x40000000)

  /**
   * Box-level MP4 demux: a recursive box walk (the generic size+fourcc
   * grammar, so unknown sibling boxes are skipped per spec) collecting
   * `mvhd` (timescale/duration), `tkhd` (track dims, 16.16 fixed),
   * `stsz` (per-sample sizes) and `stco` (chunk offset). Validates the
   * `ftyp` magic and rejects truncated/malformed boxes loudly.
   */
  def parseMp4(bytes: Array[Byte]): Mp4Info = {
    require(bytes.length >= 16, s"MP4 too short: ${bytes.length} bytes")
    require(ascii(bytes, 4, 4) == "ftyp", "not an ISO-BMFF file (no ftyp)")
    var timescale = -1; var duration = -1
    var width = -1; var height = -1
    var sizes: Array[Int] = null; var chunkOffset = -1
    def walk(start: Int, end: Int): Unit = {
      var off = start
      while (off + 8 <= end) {
        val len = rdBe32(bytes, off)
        require(len >= 8 && off + len <= end, s"malformed box at offset $off (size $len)")
        val typ = ascii(bytes, off + 4, 4)
        val body = off + 8
        typ match {
          case "moov" | "trak" | "mdia" | "minf" | "stbl" => walk(body, off + len)
          case "mvhd" =>
            timescale = rdBe32(bytes, body + 12); duration = rdBe32(bytes, body + 16)
          case "tkhd" =>
            width = rdBe32(bytes, body + 76) >>> 16
            height = rdBe32(bytes, body + 80) >>> 16
          case "stsz" =>
            val fixed = rdBe32(bytes, body + 4)
            val n = rdBe32(bytes, body + 8)
            sizes = if (fixed != 0) Array.fill(n)(fixed)
                    else Array.tabulate(n)(i => rdBe32(bytes, body + 12 + 4 * i))
          case "stco" =>
            require(rdBe32(bytes, body + 4) == 1, "only single-chunk MP4s supported")
            chunkOffset = rdBe32(bytes, body + 8)
          case _ => // skip: ftyp, mdat, hdlr, vmhd, dinf, stsd, stts, stsc, ...
        }
        off += len
      }
    }
    walk(0, bytes.length)
    require(timescale > 0 && sizes != null && chunkOffset > 0,
      "missing mvhd/stsz/stco box")
    require(chunkOffset + sizes.sum <= bytes.length,
      s"stco/stsz point past the file (${chunkOffset + sizes.sum} > ${bytes.length})")
    Mp4Info(timescale, duration, width, height, sizes.length, sizes,
      chunkOffset, bytes.length)
  }
}
