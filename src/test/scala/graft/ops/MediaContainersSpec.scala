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
}
