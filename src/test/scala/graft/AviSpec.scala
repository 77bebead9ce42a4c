package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Avi

/** Pins the in-engine AVI codec (VERDICT r9 #6): container round-trip for
  * the deterministic uncompressed-DIB path, the lossy Motion-JPEG path
  * (geometry + ImageIO-consistency, since JPEG pixel values are not
  * formula-replayable), and the strict-but-skipping parser contract on
  * malformed payloads.
  */
class AviSpec extends AnyFunSuite {

  private def gray(w: Int, h: Int, f: Int => Int): Array[Int] =
    Array.tabulate(w * h)(f)

  test("gray8 DIB: encode->decode round-trips geometry, fps, frame count and pixels") {
    val frames = Seq(
      gray(9, 4, i => (i * 11) % 256),
      gray(9, 4, i => 255 - (i % 200)))
    val bytes = Avi.encodeGray8Frames(9, 4, 30, frames)
    val v = Avi.decodeGrayFrames(bytes).get
    assert(v.width == 9 && v.height == 4 && v.fps == 30 && v.handler == "DIB ")
    assert(v.frames.size == 2)
    assert(v.frames(0).toSeq == frames(0).toSeq && v.frames(1).toSeq == frames(1).toSeq)
  }

  test("gray8 DIB: stride padding (width not a multiple of 4) round-trips exactly") {
    for (w <- 1 to 9) {
      val px = gray(w, 3, i => (i * 37 + w) % 256)
      val v = Avi.decodeGrayFrames(Avi.encodeGray8Frames(w, 3, 24, Seq(px))).get
      assert(v.width == w && v.frames.head.toSeq == px.toSeq, s"width $w")
    }
  }

  test("encode is deterministic byte-for-byte") {
    val frames = Seq(gray(8, 6, i => i % 256))
    val a = Avi.encodeGray8Frames(8, 6, 24, frames)
    val b = Avi.encodeGray8Frames(8, 6, 24, frames)
    assert(java.util.Arrays.equals(a, b))
  }

  test("MJPEG: ImageIO-encoded JPEG frames decode with correct geometry and " +
      "pixels consistent with a direct ImageIO read") {
    val w = 16
    val h = 12
    val jpegs = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (x * 16 + y * 3 + f * 40) % 256)
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val bytes = Avi.encodeMjpegFrames(w, h, 24, jpegs)
    val v = Avi.decodeGrayFrames(bytes).get
    assert(v.handler == "MJPG" && v.width == w && v.height == h && v.frames.size == 3)
    // lossy codec: the contract is consistency with the JDK's own JPEG
    // decode of the same bitstream, not the planted values
    v.frames.zip(jpegs).foreach { case (px, jpeg) =>
      val direct = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(jpeg))
      val expect = for (y <- 0 until h; x <- 0 until w)
        yield direct.getRaster.getSample(x, y, 0)
      assert(px.toSeq == expect)
    }
  }

  private def le32b(v: Int): Array[Byte] = Array[Byte](
    (v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
    ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def tagAt(b: Array[Byte], i: Int): String = new String(b, i, 4, "US-ASCII")
  private def sizeAt(b: Array[Byte], i: Int): Int =
    java.nio.ByteBuffer.wrap(b, i, 4).order(java.nio.ByteOrder.LITTLE_ENDIAN).getInt

  test("frame chunks wrapped in nested LIST 'rec ' lists still decode (interleaved AVIs)") {
    val px = gray(4, 3, i => i * 3)
    val good = Avi.encodeGray8Frames(4, 3, 24, Seq(px))
    // dissect: hdrl LIST at 12, movi LIST after it, the 00db chunk inside
    assert(tagAt(good, 12) == "LIST")
    val hdrlSize = sizeAt(good, 16)
    val hdrl = good.slice(12, 12 + 8 + hdrlSize + (hdrlSize & 1))
    val moviOff = 12 + hdrl.length
    assert(tagAt(good, moviOff) == "LIST" && tagAt(good, moviOff + 8) == "movi")
    val chunkOff = moviOff + 12
    assert(tagAt(good, chunkOff) == "00db")
    val chunkSize = sizeAt(good, chunkOff + 4)
    val chunk = good.slice(chunkOff, chunkOff + 8 + chunkSize + (chunkSize & 1))
    // rebuild with the chunk wrapped: LIST movi [ LIST 'rec ' [ 00db ] ]
    val ascii = (s: String) => s.getBytes("US-ASCII")
    val rec = ascii("LIST") ++ le32b(4 + chunk.length) ++ ascii("rec ") ++ chunk
    val movi = ascii("LIST") ++ le32b(4 + rec.length) ++ ascii("movi") ++ rec
    val body = hdrl ++ movi
    val wrapped = ascii("RIFF") ++ le32b(4 + body.length) ++ ascii("AVI ") ++ body
    val v = Avi.decodeGrayFrames(wrapped).get
    assert(v.frames.size == 1, "rec-wrapped frame must decode, not silently skip")
    assert(v.frames.head.toSeq == px.toSeq)
  }

  test("a second stream's same-geometry chunks do not interleave into the video stream") {
    val f0 = gray(4, 3, i => i)
    val f1 = gray(4, 3, i => 255 - i)
    val good = Avi.encodeGray8Frames(4, 3, 24, Seq(f0, f1))
    val hdrlSize = sizeAt(good, 16)
    val moviOff = 12 + 8 + hdrlSize + (hdrlSize & 1)
    val chunk1Off = moviOff + 12
    assert(tagAt(good, chunk1Off) == "00db")
    val c1 = sizeAt(good, chunk1Off + 4)
    val chunk2Off = chunk1Off + 8 + c1 + (c1 & 1)
    assert(tagAt(good, chunk2Off) == "00db")
    // relabel frame 2 as stream 01 (a second, foreign stream): the
    // decoder honors only the declared 'vids' stream (00) — the foreign
    // frame must be SKIPPED, not appended to stream 00's frames
    val patched = good.clone()
    patched(chunk2Off + 1) = '1'.toByte
    val v = Avi.decodeGrayFrames(patched).get
    assert(v.frames.size == 1, s"foreign-stream chunk interleaved: ${v.frames.size} frames")
    assert(v.frames.head.toSeq == f0.toSeq)
  }

  test("parser: malformed payloads return None, never throw") {
    val good = Avi.encodeGray8Frames(4, 4, 24, Seq(gray(4, 4, identity)))
    val cases = Seq(
      Array.emptyByteArray,
      "RIFF".getBytes("US-ASCII"),
      "RIFFxxxxWAVE".getBytes("US-ASCII"),          // right magic family, wrong form
      good.take(20),                                 // truncated headers
      good.take(good.length - 3),                    // truncated final chunk
      { val b = good.clone(); b(12) = 'X'; b })      // corrupted hdrl LIST tag
    cases.foreach(b =>
      assert(Avi.decodeGrayFrames(b).isEmpty, "malformed payload must not decode"))
    assert(Avi.decodeGrayFrames(good).isDefined)
  }

  test("parser: frame-size/geometry mismatch is rejected, not mis-read") {
    val good = Avi.encodeGray8Frames(5, 3, 24, Seq(gray(5, 3, identity)))
    // flip avih width 5 -> 3 (offset: RIFF(12) + LIST hdr(12) + avih
    // hdr(8) + 32); stride(3)=4 no longer matches the 8-byte rows written
    val b = good.clone()
    val widthOff = 12 + 12 + 8 + 32
    b(widthOff) = 3
    assert(Avi.decodeGrayFrames(b).isEmpty,
      "geometry no longer matching the DIB stride must reject")
  }
}
