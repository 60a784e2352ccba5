package graft

import graft.data.PngCodec

class MultimodalSpec extends SparkSpec {

  test("PNG round-trip recovers header fields through the real container grammar") {
    for ((w, h, seed) <- Seq((1, 1, 0), (64, 48, 7), (640, 480, 123), (3, 200, 9))) {
      val bytes = PngCodec.encode(w, h, seed)
      val m = PngCodec.decode(bytes)
      assert(m.width == w && m.height == h, s"dims for ${w}x$h")
      assert(m.bitDepth == 8 && m.colorType == 0)
      assert(m.nChunks == 3) // IHDR, IDAT, IEND
      assert(m.nBytes == bytes.length)
    }
  }

  test("PNG output is a valid container for an independent reader (javax.imageio)") {
    val bytes = PngCodec.encode(17, 9, 3)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO could not parse the encoded PNG")
    assert(img.getWidth == 17 && img.getHeight == 9)
    // pixel formula (x*31 + y*17 + seed) % 256 survives the full pipeline
    val gray = img.getRaster.getSample(5, 2, 0)
    assert(gray == (5 * 31 + 2 * 17 + 3) % 256)
  }

  test("decode rejects malformed containers") {
    val good = PngCodec.encode(4, 4, 0)
    intercept[IllegalArgumentException](PngCodec.decode(good.take(20))) // truncated
    val badMagic = good.clone(); badMagic(0) = 0x42
    intercept[IllegalArgumentException](PngCodec.decode(badMagic))
    val badCrc = good.clone(); badCrc(16) = (badCrc(16) ^ 0x01).toByte // corrupt IHDR data
    intercept[IllegalArgumentException](PngCodec.decode(badCrc))
  }
}
