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
