package graft.data

import java.io.ByteArrayOutputStream

/** Minimal pure-JVM WAV (RIFF/WAVE) container codec.
  *
  * The encoder writes a complete, valid PCM WAV: `RIFF` header, `fmt `
  * chunk (PCM format tag, channels, sample rate, block align, bits per
  * sample), and a `data` chunk of deterministic 16-bit samples. The
  * decoder is the part the multimodal pillar exercises at scale: it
  * validates the RIFF/WAVE magic, walks the chunk stream (tolerating
  * extension chunks like `LIST`), parses `fmt `, and derives sample count
  * and duration from the `data` chunk length. Pure JVM, no native audio
  * libraries — runs inside executor tasks.
  *
  * Reference scope note: the reference engine has no media columns — this
  * pillar is the driver's training-data-pipeline extension; the RIFF/WAVE
  * layout is public (Microsoft/IBM WAVE spec, RFC 2361 format tags).
  */
object WavCodec {

  final case class WavMeta(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nSamples: Long, durationMs: Long, nChunks: Int, nBytes: Int)

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)
  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def readLe16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def readLe32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** Encode `nSamples` frames of 16-bit PCM; sample (i, ch) is the
    * deterministic triangle-ish wave ((i*37 + ch*11 + seed) % 8192 - 4096). */
  def encode(channels: Int, sampleRate: Int, nSamples: Int, seed: Int = 0): Array[Byte] = {
    require(channels > 0 && sampleRate > 0 && nSamples >= 0,
      s"bad wav params ch=$channels rate=$sampleRate n=$nSamples")
    val bytesPerFrame = channels * 2
    val dataLen = nSamples * bytesPerFrame
    val out = new ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(4 + (8 + 16) + (8 + dataLen))) // WAVE + fmt + data
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32(16))
    out.write(le16(1)) // PCM
    out.write(le16(channels))
    out.write(le32(sampleRate))
    out.write(le32(sampleRate * bytesPerFrame)) // byte rate
    out.write(le16(bytesPerFrame)) // block align
    out.write(le16(16)) // bits per sample
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(dataLen))
    var i = 0
    while (i < nSamples) {
      var ch = 0
      while (ch < channels) {
        val v = (i * 37 + ch * 11 + seed) % 8192 - 4096
        out.write(le16(v & 0xffff))
        ch += 1
      }
      i += 1
    }
    out.toByteArray
  }

  /** Parse the container: validate RIFF/WAVE magic, walk chunks, parse
    * `fmt `, size the `data` chunk. Throws IllegalArgumentException on
    * malformed input. */
  def decode(bytes: Array[Byte]): WavMeta = {
    require(bytes.length >= 44, s"truncated WAV (${bytes.length} bytes)")
    require(new String(bytes, 0, 4, "US-ASCII") == "RIFF", "bad RIFF magic")
    require(new String(bytes, 8, 4, "US-ASCII") == "WAVE", "bad WAVE magic")
    val riffLen = readLe32(bytes, 4)
    require(riffLen + 8 <= bytes.length, "RIFF length overruns buffer")
    var off = 12
    var channels = -1; var rate = -1; var bits = -1; var blockAlign = -1
    var dataLen = -1L
    var nChunks = 0
    while (off + 8 <= bytes.length) {
      val typ = new String(bytes, off, 4, "US-ASCII")
      val len = readLe32(bytes, off + 4)
      require(len >= 0 && off + 8 + len <= bytes.length, s"chunk $typ overruns buffer")
      nChunks += 1
      if (typ == "fmt ") {
        require(len >= 16, "fmt chunk too short")
        require(readLe16(bytes, off + 8) == 1, "only PCM (format tag 1) supported")
        channels = readLe16(bytes, off + 10)
        rate = readLe32(bytes, off + 12)
        blockAlign = readLe16(bytes, off + 20)
        bits = readLe16(bytes, off + 22)
      } else if (typ == "data") {
        dataLen = len.toLong
      }
      // chunks are word-aligned: odd lengths carry a pad byte
      off += 8 + len + (len & 1)
    }
    require(channels > 0 && rate > 0 && bits > 0, "missing fmt chunk")
    require(dataLen >= 0, "missing data chunk")
    require(blockAlign == channels * bits / 8, "block align disagrees with fmt")
    val nSamples = dataLen / blockAlign
    WavMeta(channels, rate, bits, nSamples,
      durationMs = nSamples * 1000L / rate, nChunks = nChunks, nBytes = bytes.length)
  }
}
