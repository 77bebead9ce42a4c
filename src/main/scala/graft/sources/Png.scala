package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{Adler32, CRC32}

/** In-engine PNG writer (JDK-only, zero dependencies — the same posture as
  * [[Xlsx]]/[[Rds]]/[[Avro]]/[[Tar]]): 8-bit grayscale, zlib container with
  * STORED deflate blocks, so the byte stream is a pure deterministic
  * function of (width, height, pixels) — no compressor version can change
  * it, which is what lets planted images carry bit-exact size oracles
  * (total bytes = 68 + height·(width+1) for any image whose raw scanline
  * stream fits one stored block).
  *
  * Layout per the PNG spec (RFC 2083): signature, IHDR (bit depth 8,
  * color type 0 = grayscale, no interlace), one IDAT holding the zlib
  * stream over filter-0-prefixed scanlines, IEND. CRC32/Adler32 come from
  * `java.util.zip` (the spec's exact polynomials).
  *
  * Reading is delegated to `javax.imageio` (see
  * [[graft.operators.Multimodal.decodeImage]]) — the JDK ships PNG/JPEG/
  * GIF/BMP readers, so decode needs no in-engine parser.
  */
object Png {

  private val Signature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Encode a row-major grayscale raster (values 0..255; higher bits are
    * masked) as a PNG byte array.
    */
  def encodeGray(width: Int, height: Int, pixels: Array[Int]): Array[Byte] = {
    require(width > 0 && height > 0, s"empty image: ${width}x$height")
    require(pixels.length == width.toLong * height,
      s"pixel buffer ${pixels.length} != ${width}x$height")
    val out = new ByteArrayOutputStream(64 + height * (width + 1))
    out.write(Signature, 0, Signature.length)
    val ihdr = new ByteArrayOutputStream(13)
    writeIntBE(ihdr, width)
    writeIntBE(ihdr, height)
    ihdr.write(8) // bit depth
    ihdr.write(0) // color type: grayscale
    ihdr.write(0) // compression: deflate
    ihdr.write(0) // filter method 0
    ihdr.write(0) // no interlace
    writeChunk(out, "IHDR", ihdr.toByteArray)
    // raw scanline stream: one filter-type-0 byte, then the row's samples
    val raw = new Array[Byte](height * (width + 1))
    var y = 0
    while (y < height) {
      val base = y * (width + 1)
      raw(base) = 0
      var x = 0
      while (x < width) {
        raw(base + 1 + x) = (pixels(y * width + x) & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    writeChunk(out, "IDAT", zlibStored(raw))
    writeChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A zlib stream whose deflate payload is STORED (BTYPE=00) blocks —
    * legal deflate, byte-deterministic, and 5 bytes overhead per 64 KiB
    * block instead of a compressor dependency.
    */
  private def zlibStored(raw: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(raw.length + 16)
    out.write(0x78) // CMF: deflate, 32K window
    out.write(0x01) // FLG: check bits, no dict, fastest
    var off = 0
    do {
      val len = math.min(65535, raw.length - off)
      out.write(if (off + len >= raw.length) 1 else 0) // BFINAL + BTYPE=00
      out.write(len & 0xFF)
      out.write((len >> 8) & 0xFF)
      out.write(~len & 0xFF)
      out.write((~len >> 8) & 0xFF)
      out.write(raw, off, len)
      off += len
    } while (off < raw.length)
    val ad = new Adler32()
    ad.update(raw, 0, raw.length)
    writeIntBE(out, ad.getValue.toInt)
    out.toByteArray
  }

  private def writeChunk(out: ByteArrayOutputStream, kind: String, data: Array[Byte]): Unit = {
    writeIntBE(out, data.length)
    val tag = kind.getBytes("US-ASCII")
    out.write(tag, 0, tag.length)
    out.write(data, 0, data.length)
    val crc = new CRC32()
    crc.update(tag, 0, tag.length)
    crc.update(data, 0, data.length)
    writeIntBE(out, crc.getValue.toInt)
  }

  private def writeIntBE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xFF)
    out.write((v >>> 16) & 0xFF)
    out.write((v >>> 8) & 0xFF)
    out.write(v & 0xFF)
  }
}
