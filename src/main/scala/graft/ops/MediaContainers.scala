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
}
