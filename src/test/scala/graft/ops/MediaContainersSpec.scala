package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The real WAV/BMP container codecs: spec-shape bytes, round-trip
  * parse, chunk-walking, and loud rejection of malformed input. */
class MediaContainersSpec extends AnyFunSuite {

  test("WAV round-trip: canonical header fields parse back exactly") {
    for ((rate, n, seed) <- Seq((8000, 16, 1L), (16000, 0, 7L), (44100, 333, 42L))) {
      val bytes = MediaContainers.wavBytes(rate, n, seed)
      assert(bytes.length == 44 + n * 2)
      // spec shape: RIFF size field = file size - 8, little-endian
      assert(new String(bytes, 0, 4, "US-ASCII") == "RIFF")
      val riffLen = (bytes(4) & 0xff) | ((bytes(5) & 0xff) << 8) |
        ((bytes(6) & 0xff) << 16) | ((bytes(7) & 0xff) << 24)
      assert(riffLen == bytes.length - 8)
      val w = MediaContainers.parseWav(bytes)
      assert(w == MediaContainers.WavInfo(rate, 1, 16, n, bytes.length))
    }
  }

  test("WAV parser walks extra chunks before data (spec allows them)") {
    val base = MediaContainers.wavBytes(8000, 4, 1L)
    // splice a LIST chunk of 6 bytes between fmt and data (odd -> padded)
    val out = new java.io.ByteArrayOutputStream()
    out.write(base, 0, 36)                       // up to end of fmt chunk
    out.write("LIST".getBytes); out.write(Array[Byte](5, 0, 0, 0))
    out.write(Array[Byte](1, 2, 3, 4, 5, 0))     // 5 bytes + pad
    out.write(base, 36, base.length - 36)        // data chunk onward
    val spliced = out.toByteArray
    // RIFF length field is now stale, but chunk walking must still find data
    val w = MediaContainers.parseWav(spliced)
    assert(w.sampleRate == 8000 && w.nSamples == 4)
  }

  test("BMP round-trip: dimensions and row padding parse back exactly") {
    for ((wd, ht, seed) <- Seq((1, 1, 1L), (16, 12, 9L), (5, 3, 77L))) {
      val bytes = MediaContainers.bmpBytes(wd, ht, seed)
      val rowSize = ((3 * wd + 3) / 4) * 4
      assert(bytes.length == 54 + rowSize * ht)
      assert(bytes(0) == 'B' && bytes(1) == 'M')
      val b = MediaContainers.parseBmp(bytes)
      assert(b == MediaContainers.BmpInfo(wd, ht, 24, bytes.length))
    }
  }

  test("malformed input is rejected loudly, never parsed silently") {
    intercept[IllegalArgumentException](MediaContainers.parseWav(Array.fill(10)(0: Byte)))
    intercept[IllegalArgumentException](
      MediaContainers.parseWav("JUNKJUNKJUNK".getBytes ++ new Array[Byte](40)))
    intercept[IllegalArgumentException](MediaContainers.parseBmp(new Array[Byte](54)))
    // a WAV payload handed to the BMP parser must not "work"
    intercept[IllegalArgumentException](
      MediaContainers.parseBmp(MediaContainers.wavBytes(8000, 32, 1L)))
  }

  test("MP4 round-trip: box fields parse back exactly; chunk offset = 587 + 4n") {
    for ((w, h, sizes, ts, delta, seed) <- Seq(
        (16, 16, Array(8), 600, 40, 1L),
        (256, 144, Array(10, 20, 30, 9), 600, 80, 42L),
        (64, 48, Array.tabulate(13)(i => i + 8), 90000, 3000, 7L))) {
      val bytes = MediaContainers.mp4Bytes(w, h, sizes, ts, delta, seed)
      val m = MediaContainers.parseMp4(bytes)
      assert(m.timescale == ts && m.durationTicks == sizes.length * delta)
      assert(m.width == w && m.height == h)
      assert(m.sampleCount == sizes.length && m.sampleSizes.sameElements(sizes))
      // the absolute stco offset equals the assembled ftyp+moov+mdat-header
      // length — a fixed 587-byte prefix plus the 4-byte-per-sample stsz
      // table (the constant the SQL oracle recomputes)
      assert(m.chunkOffset == 587 + 4 * sizes.length,
        s"chunk offset ${m.chunkOffset} != ${587 + 4 * sizes.length}")
      assert(m.totalBytes == bytes.length && m.chunkOffset + sizes.sum == bytes.length)
    }
  }

  test("MP4 sample slices are the true mdat byte ranges (match an independent LCG)") {
    val sizes = Array(5, 9, 3)
    val bytes = MediaContainers.mp4Bytes(32, 32, sizes, 600, 40, 99L)
    val m = MediaContainers.parseMp4(bytes)
    // regenerate the mdat payload independently and compare each slice
    var s = 99L | 1
    val expected = Array.tabulate(sizes.sum) { _ =>
      s = s * 6364136223846793005L + 1442695040888963407L
      ((s >>> 33) & 0xff).toByte
    }
    var off = 0
    for (i <- sizes.indices) {
      val slice = java.util.Arrays.copyOfRange(
        bytes, m.chunkOffset + off, m.chunkOffset + off + sizes(i))
      assert(slice.sameElements(expected.slice(off, off + sizes(i))),
        s"sample $i bytes differ")
      off += sizes(i)
    }
  }

  test("MP4 parser skips unknown boxes and rejects malformed input") {
    val base = MediaContainers.mp4Bytes(16, 16, Array(4, 4), 600, 40, 1L)
    // splice an unknown 'free' box between ftyp and moov: chunk offsets
    // shift, so re-point stco by reparsing must FAIL the bounds check only
    // if stco were stale — here we keep the original (stale) stco, so the
    // parser's offset+sizes bound still passes (free box ADDS bytes), and
    // the parse must simply skip 'free' and find everything
    val free = Array[Byte](0, 0, 0, 12) ++ "free".getBytes ++ Array[Byte](1, 2, 3, 4)
    val spliced = base.take(24) ++ free ++ base.drop(24)
    val m = MediaContainers.parseMp4(spliced)
    assert(m.sampleCount == 2 && m.timescale == 600)
    intercept[IllegalArgumentException](MediaContainers.parseMp4(new Array[Byte](32)))
    intercept[IllegalArgumentException](
      MediaContainers.parseMp4(MediaContainers.wavBytes(8000, 8, 1L)))
    // a box whose declared size runs past the file must fail loudly
    val truncated = base.take(base.length - 3)
    intercept[IllegalArgumentException](MediaContainers.parseMp4(truncated))
  }
}
