package graft.sources

import java.io.ByteArrayOutputStream

/** In-engine animated-GIF writer (JDK-only, zero dependencies — the same
  * posture as [[Png]]/[[Wav]]): GIF89a, one global 256-entry grayscale
  * palette, N full-size image frames. The LZW payload uses the classic
  * "uncompressed GIF" encoding — a CLEAR code, then one 9-bit literal per
  * pixel, re-CLEARing before the decoder's table would force a code-width
  * change — which every conforming decoder (including `javax.imageio`'s
  * GIF reader) accepts, and which makes the byte stream a pure
  * deterministic function of (width, height, frames): no LZW heuristic or
  * encoder version can change it, so planted multi-frame fixtures carry
  * bit-exact oracles.
  *
  * Layout per GIF89a: header, logical screen descriptor, global color
  * table (i → (i,i,i) gray), then per frame an image descriptor + LZW
  * data sub-blocks, then the 0x3B trailer. No graphic-control extensions:
  * frames carry no delay/dispose semantics, and `ImageReader.read(i)`
  * returns each frame's raw indexed raster — exactly what
  * [[graft.operators.Multimodal.decodeGifFrames]] reads back.
  */
object Gif {

  /** Encode row-major grayscale frames (values 0..255; higher bits are
    * masked) as a multi-frame GIF. All frames share the logical screen
    * size — `width`×`height` each.
    */
  def encodeGrayFrames(width: Int, height: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    require(width > 0 && width <= 0xFFFF && height > 0 && height <= 0xFFFF,
      s"bad geometry: ${width}x$height")
    require(frames.nonEmpty, "need at least one frame")
    frames.foreach(f => require(f.length == width * height,
      s"frame buffer ${f.length} != ${width}x$height"))
    val out = new ByteArrayOutputStream(32 + 768 + frames.size * (16 + width * height * 2))
    out.write("GIF89a".getBytes("US-ASCII"))
    // logical screen descriptor: size, global table (256 entries, 8-bit)
    writeShortLE(out, width)
    writeShortLE(out, height)
    out.write(0xF7) // global table, color res 8, size 2^(7+1)=256
    out.write(0)    // background color index
    out.write(0)    // no aspect ratio
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    frames.foreach { px =>
      out.write(0x2C) // image descriptor
      writeShortLE(out, 0)
      writeShortLE(out, 0)
      writeShortLE(out, width)
      writeShortLE(out, height)
      out.write(0) // no local table, not interlaced
      writeLzwLiterals(out, px)
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** The literal-only LZW stream: min code size 8, codes are 9 bits
    * (CLEAR=256, EOI=257). After a CLEAR the decoder's table holds 258
    * entries and each subsequent literal adds one; the width would grow
    * at 512, so a CLEAR every ≤254 literals pins the width at 9 bits
    * forever. Bits pack LSB-first (the GIF LZW bit order), data flushes
    * as ≤255-byte sub-blocks.
    */
  private def writeLzwLiterals(out: ByteArrayOutputStream, px: Array[Int]): Unit = {
    out.write(8) // LZW minimum code size
    val data = new ByteArrayOutputStream(px.length + px.length / 8 + 16)
    var acc = 0L
    var nbits = 0
    def emit(code: Int): Unit = {
      acc |= (code.toLong << nbits)
      nbits += 9
      while (nbits >= 8) {
        data.write((acc & 0xFF).toInt)
        acc >>>= 8
        nbits -= 8
      }
    }
    emit(256) // initial CLEAR
    var n = 0
    var i = 0
    while (i < px.length) {
      emit(px(i) & 0xFF)
      n += 1
      if (n == 250 && i != px.length - 1) { emit(256); n = 0 }
      i += 1
    }
    emit(257) // EOI
    if (nbits > 0) data.write((acc & 0xFF).toInt)
    // sub-blocks: length byte + payload, 0 terminator
    val bytes = data.toByteArray
    var off = 0
    while (off < bytes.length) {
      val len = math.min(255, bytes.length - off)
      out.write(len)
      out.write(bytes, off, len)
      off += len
    }
    out.write(0)
  }

  private def writeShortLE(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF)
    out.write((v >>> 8) & 0xFF)
  }
}
