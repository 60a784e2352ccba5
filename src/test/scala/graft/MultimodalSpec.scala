package graft

import graft.data.{PngCodec, WavCodec}

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

  test("WAV round-trip recovers fmt/data fields through the RIFF chunk walk") {
    for ((ch, rate, n, seed) <- Seq((1, 8000, 100, 0), (2, 44100, 1999, 7), (1, 16000, 0, 3))) {
      val bytes = WavCodec.encode(ch, rate, n, seed)
      val m = WavCodec.decode(bytes)
      assert(m.channels == ch && m.sampleRate == rate && m.bitsPerSample == 16)
      assert(m.nSamples == n)
      assert(m.durationMs == n * 1000L / rate)
      assert(m.nChunks == 2) // fmt + data
      assert(m.nBytes == bytes.length)
    }
  }

  test("WAV output is a valid container for an independent reader (javax.sound)") {
    val bytes = WavCodec.encode(2, 16000, 500, 11)
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val fmt = in.getFormat
    assert(fmt.getChannels == 2 && fmt.getSampleRate == 16000f &&
      fmt.getSampleSizeInBits == 16)
    assert(in.getFrameLength == 500)
    // first frame, channel 0: little-endian 16-bit of (0*37 + 0*11 + 11)
    val frame = new Array[Byte](4)
    assert(in.read(frame) == 4)
    val s0 = (frame(0) & 0xff) | (frame(1) << 8)
    assert(s0 == (11 % 8192 - 4096))
  }

  test("WAV decode rejects malformed containers") {
    val good = WavCodec.encode(1, 8000, 50, 0)
    intercept[IllegalArgumentException](WavCodec.decode(good.take(30))) // truncated
    val badMagic = good.clone(); badMagic(8) = 0x42
    intercept[IllegalArgumentException](WavCodec.decode(badMagic))
    // declare a chunk longer than the buffer
    val badLen = good.clone(); badLen(16) = 0x7f; badLen(17) = 0x7f
    intercept[IllegalArgumentException](WavCodec.decode(badLen))
  }
}
