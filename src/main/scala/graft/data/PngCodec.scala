package graft.data

import java.io.ByteArrayOutputStream
import java.util.zip.{CRC32, Deflater}

/** Minimal pure-JVM PNG container codec (RFC 2083 / ISO 15948).
  *
  * The encoder writes a complete, valid grayscale PNG: 8-byte signature,
  * IHDR, one deflate-compressed IDAT (filter byte 0 per scanline), IEND —
  * every chunk with its real CRC-32. The decoder is the part the multimodal
  * pillar actually exercises at scale: it validates the signature, walks the
  * chunk stream, checks the IHDR CRC and returns the header fields. Both
  * sides use only java.util.zip, so the codec runs inside executor tasks
  * with no native libraries.
  *
  * Reference scope note: the reference engine has no media columns at all —
  * this pillar is the driver's training-data-pipeline extension; the PNG
  * grammar is public (libpng/W3C PNG spec §5, §11).
  */
object PngCodec {

  val Signature: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  final case class PngMeta(width: Int, height: Int, bitDepth: Int,
      colorType: Int, nChunks: Int, nBytes: Int)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def readBe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def chunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
    out.write(be32(data.length))
    val typeBytes = typ.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(typeBytes)
    crc.update(data)
    out.write(typeBytes)
    out.write(data)
    out.write(be32(crc.getValue.toInt))
  }

  /** Encode a width×height 8-bit grayscale PNG; pixel (x,y) = (x*31+y*17+seed)%256. */
  def encode(width: Int, height: Int, seed: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val out = new ByteArrayOutputStream(64 + width * height / 2)
    out.write(Signature)
    // IHDR: width, height, bit depth 8, color type 0 (gray), deflate, none, none
    chunk(out, "IHDR", be32(width) ++ be32(height) ++ Array[Byte](8, 0, 0, 0, 0))
    val raw = new Array[Byte]((width + 1) * height)
    var y = 0
    while (y < height) {
      // raw(y*(width+1)) = 0: filter type None
      var x = 0
      while (x < width) {
        raw(y * (width + 1) + 1 + x) = ((x * 31 + y * 17 + seed) % 256).toByte
        x += 1
      }
      y += 1
    }
    val deflater = new Deflater(Deflater.DEFAULT_COMPRESSION)
    deflater.setInput(raw)
    deflater.finish()
    val buf = new Array[Byte](8192)
    val idat = new ByteArrayOutputStream(raw.length / 2 + 32)
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      idat.write(buf, 0, n)
    }
    deflater.end()
    chunk(out, "IDAT", idat.toByteArray)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse the container: validate signature + IHDR CRC, walk all chunks.
    * Throws IllegalArgumentException on malformed input. */
  def decode(bytes: Array[Byte]): PngMeta = {
    require(bytes.length >= 33, s"truncated PNG (${bytes.length} bytes)")
    var i = 0
    while (i < 8) {
      require(bytes(i) == Signature(i), "bad PNG signature")
      i += 1
    }
    var off = 8
    var meta: PngMeta = null
    var nChunks = 0
    var sawEnd = false
    while (off + 12 <= bytes.length && !sawEnd) {
      val len = readBe32(bytes, off)
      require(len >= 0 && off + 12 + len <= bytes.length, "chunk overruns buffer")
      val typ = new String(bytes, off + 4, 4, "US-ASCII")
      nChunks += 1
      if (typ == "IHDR") {
        require(off == 8 && len == 13, "IHDR must be first with length 13")
        val crc = new CRC32
        crc.update(bytes, off + 4, 4 + len)
        require(crc.getValue.toInt == readBe32(bytes, off + 8 + len), "IHDR CRC mismatch")
        meta = PngMeta(
          width = readBe32(bytes, off + 8),
          height = readBe32(bytes, off + 12),
          bitDepth = bytes(off + 16) & 0xff,
          colorType = bytes(off + 17) & 0xff,
          nChunks = 0, nBytes = bytes.length)
      }
      if (typ == "IEND") sawEnd = true
      off += 12 + len
    }
    require(meta != null, "missing IHDR")
    require(sawEnd, "missing IEND")
    meta.copy(nChunks = nChunks)
  }
}
