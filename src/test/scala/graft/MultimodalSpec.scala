package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val media =
    Multimodal.asMedia(
      Seq((1L, "x" * 700), (2L, "abc")).toDF("doc_id", "text"), "doc_id", "text", "image")

  test("payloadFeatures derives shape plumbing from byte length") {
    val out = Multimodal.payloadFeatures(media).orderBy("media_id")
      .select("n_bytes", "width", "height", "n_frames").as[(Int, Int, Int, Int)].collect()
    assert(out(0) == ((700, 60, 1, 1)))
    assert(out(1) == ((3, 3, 0, 1)))
  }

  test("decodeAviFrames: DIB round-trip, exact per-frame sums, frame order") {
    val frames = Seq(
      Array.tabulate(35)(i => (i * 7) % 256),
      Array.tabulate(35)(i => 255 - (i % 256)),
      Array.fill(35)(129))
    val m = Seq(Multimodal.MediaRow(7L, "video",
      graft.sources.Avi.encodeGray8Frames(7, 5, 24, frames))).toDF()
    val out = Multimodal.decodeAviFrames(spark, m).collect().sortBy(_.frame)
    assert(out.length == 3 && out.forall(r => r.decoded && r.n_frames == 3))
    assert(out.map(_.frame).toSeq == Seq(0, 1, 2))
    assert(out.forall(r => r.width.contains(7) && r.height.contains(5)))
    assert(out.map(_.px_sum.get).toSeq == frames.map(_.map(_.toLong).sum))
  }

  test("aviFramePhash: per-frame hashes, brightness shift moves few bits, corrupt flags") {
    val base = Array.tabulate(24 * 16)(i => (i * 3) % 256)
    val shifted = base.map(p => math.min(255, p + 8))
    val differentFrame = Array.tabulate(24 * 16)(i => 255 - (i * 3) % 256)
    val m = Seq(
      Multimodal.MediaRow(1L, "video",
        graft.sources.Avi.encodeGray8Frames(24, 16, 24, Seq(base, differentFrame))),
      Multimodal.MediaRow(2L, "video",
        graft.sources.Avi.encodeGray8Frames(24, 16, 24, Seq(shifted))),
      Multimodal.MediaRow(3L, "video", "not an avi".getBytes("UTF-8"))).toDF()
    val out = Multimodal.aviFramePhash(spark, m).collect()
      .sortBy(r => (r.media_id, r.frame))
    assert(out.map(r => (r.media_id, r.frame)).toSeq ==
      Seq((1L, 0), (1L, 1), (2L, 0), (3L, -1)))
    assert(!out.last.decoded && out.last.phash.isEmpty)
    val h10 = out(0).phash.get
    val h11 = out(1).phash.get
    val h20 = out(2).phash.get
    // near-dup anchor frames: few differing bits; unrelated frames: many
    val near = h10.zip(h20).count { case (a, b) => a != b }
    val far = h10.zip(h11).count { case (a, b) => a != b }
    assert(near <= 6, s"brightness shift moved $near bits")
    assert(far > 6, s"inverted frame should differ widely, moved $far bits")
    // frame hashes match the still-image hash of the same raster
    val still = Multimodal.imagePhash(spark, Seq(Multimodal.MediaRow(9L, "image",
      graft.sources.Png.encodeGray(24, 16, base))).toDF()).collect().head
    assert(still.phash.contains(h10), "frame aHash must equal the image aHash of the raster")
  }

  test("decodeAviFrames: corrupt payload flags one row, never kills the pass") {
    val m = Seq(
      Multimodal.MediaRow(1L, "video",
        graft.sources.Avi.encodeGray8Frames(2, 2, 10, Seq(Array(1, 2, 3, 4)))),
      Multimodal.MediaRow(2L, "video", "RIFFnot-an-avi".getBytes("UTF-8")),
      Multimodal.MediaRow(3L, "video", Array.emptyByteArray)).toDF()
    val out = Multimodal.decodeAviFrames(spark, m).collect().sortBy(_.media_id)
    assert(out.length == 3)
    assert(out(0).decoded && out(0).px_sum.contains(10L))
    assert(!out(1).decoded && out(1).frame == -1 && out(1).px_sum.isEmpty)
    assert(!out(2).decoded)
  }

  test("decodeImage: in-engine PNG round-trips geometry and exact pixel sum") {
    val cases = Seq((1L, 5, 3), (2L, 1, 1), (3L, 16, 11), (4L, 300, 2))
    val media = cases.map { case (id, w, h) =>
      val px = Array.tabulate(w * h)(i => ((id * 31 + i) % 256).toInt)
      Multimodal.MediaRow(id, "image", graft.sources.Png.encodeGray(w, h, px))
    }.toDF()
    val out = Multimodal.decodeImage(spark, media).collect().sortBy(_.media_id)
    assert(out.length == cases.length && out.forall(_.decoded))
    cases.zip(out).foreach { case ((id, w, h), r) =>
      assert(r.width.contains(w) && r.height.contains(h), s"geometry mismatch for $id")
      val expected = (0 until w * h).map(i => (id * 31 + i) % 256).sum
      assert(r.px_sum.contains(expected), s"pixel sum mismatch for $id")
      // documented deterministic container size: one stored deflate block
      assert(r.n_bytes == 68 + h * (w + 1), s"container size drifted for $id")
    }
  }

  test("decodeImage: undecodable payload flags decoded=false, does not fail the job") {
    val media = Seq(
      Multimodal.MediaRow(1L, "image", graft.sources.Png.encodeGray(2, 2, Array(1, 2, 3, 4))),
      Multimodal.MediaRow(2L, "image", "not an image at all".getBytes("UTF-8")),
      Multimodal.MediaRow(3L, "image", Array.emptyByteArray)).toDF()
    val out = Multimodal.decodeImage(spark, media).collect().sortBy(_.media_id)
    assert(out.map(_.decoded).toSeq == Seq(true, false, false))
    assert(out.filter(!_.decoded).forall(r =>
      r.width.isEmpty && r.height.isEmpty && r.px_sum.isEmpty))
  }

  test("sampleFrames emits one row per stride offset") {
    val out = Multimodal.sampleFrames(media.filter(col("media_id") === 1), everyNBytes = 100)
    assert(out.count() == 7) // offsets 0,100,...,600
  }

  test("resizePlan: aspect-preserving fit, integer math, zero-area passthrough") {
    val feats = Seq(
      (1L, 1920, 1080),  // wide: fits by width into 640x480 -> 640x360
      (2L, 1080, 1920),  // tall: fits by height -> 270x480
      (3L, 100, 100),    // square into rectangle: height binds -> 480x480
      (4L, 0, 50))       // zero-area: no target geometry
      .toDF("media_id", "width", "height")
    val out = Multimodal.resizePlan(feats, maxW = 640, maxH = 480)
      .orderBy("media_id")
      .select("target_width", "target_height")
      .as[(Option[Int], Option[Int])].collect().toSeq
    assert(out == Seq(
      (Some(640), Some(360)), (Some(270), Some(480)),
      (Some(480), Some(480)), (None, None)))
  }

  test("imagePhash: hand-checkable bits, integer mean comparison") {
    // 8x8 gray: top 4 rows 0, bottom 4 rows 200 → mean 100; 1-px blocks
    // bit = (p*64 >= total*1) = (p >= 100) → 32 zeros then 32 ones
    val px = Array.tabulate(64)(i => if (i < 32) 0 else 200)
    val m = Seq(Multimodal.MediaRow(1L, "image",
      graft.sources.Png.encodeGray(8, 8, px))).toDF()
    val r = Multimodal.imagePhash(spark, m).collect().head
    assert(r.decoded && r.width.contains(8) && r.height.contains(8))
    assert(r.phash.contains("0" * 32 + "1" * 32))
  }

  test("imagePhash: uneven block lattice still covers every pixel exactly once") {
    // 10x9 image, constant pixels → every block mean == image mean → all-'1'
    val m = Seq(Multimodal.MediaRow(1L, "image",
      graft.sources.Png.encodeGray(10, 9, Array.fill(90)(7)))).toDF()
    val r = Multimodal.imagePhash(spark, m).collect().head
    assert(r.phash.contains("1" * 64))
  }

  test("imagePhash: sub-grid and corrupt images flag, never fake a hash") {
    val m = Seq(
      Multimodal.MediaRow(1L, "image", graft.sources.Png.encodeGray(4, 12, Array.fill(48)(9))),
      Multimodal.MediaRow(2L, "image", "junk".getBytes("UTF-8"))).toDF()
    val out = Multimodal.imagePhash(spark, m).collect().sortBy(_.media_id)
    assert(out(0).decoded && out(0).phash.isEmpty && out(0).width.contains(4))
    assert(!out(1).decoded && out(1).phash.isEmpty)
  }

  test("decodeGifFrames: multi-frame round-trip, exact per-frame sums, frame order") {
    val frames = Seq(
      Array.tabulate(12)(i => i * 5),
      Array.tabulate(12)(i => 255 - i),
      Array.fill(12)(42))
    val m = Seq(Multimodal.MediaRow(7L, "image",
      graft.sources.Gif.encodeGrayFrames(4, 3, frames))).toDF()
    val out = Multimodal.decodeGifFrames(spark, m).collect().sortBy(_.frame)
    assert(out.length == 3 && out.forall(r => r.decoded && r.n_frames == 3))
    assert(out.map(_.frame).toSeq == Seq(0, 1, 2))
    assert(out.forall(r => r.width.contains(4) && r.height.contains(3)))
    assert(out.map(_.px_sum.get).toSeq == frames.map(_.map(_.toLong).sum))
  }

  test("decodeGifFrames: a frame large enough to span LZW clear boundaries round-trips") {
    // 30x20 = 600 pixels > the 250-literal clear cadence — exercises
    // mid-stream CLEAR codes and multi-sub-block packing
    val px = Array.tabulate(600)(i => (i * 7) % 256)
    val m = Seq(Multimodal.MediaRow(1L, "image",
      graft.sources.Gif.encodeGrayFrames(30, 20, Seq(px)))).toDF()
    val out = Multimodal.decodeGifFrames(spark, m).collect()
    assert(out.length == 1 && out.head.decoded)
    assert(out.head.px_sum.contains(px.map(_.toLong).sum))
  }

  test("decodeGifFrames: corrupt payload flags one row, never kills the pass") {
    val m = Seq(
      Multimodal.MediaRow(1L, "image",
        graft.sources.Gif.encodeGrayFrames(2, 2, Seq(Array(1, 2, 3, 4)))),
      Multimodal.MediaRow(2L, "image", "GIF89a-not-really".getBytes("UTF-8"))).toDF()
    val out = Multimodal.decodeGifFrames(spark, m).collect().sortBy(_.media_id)
    assert(out.length == 2)
    assert(out(0).decoded && out(0).px_sum.contains(10L))
    assert(!out(1).decoded && out(1).frame == -1 && out(1).px_sum.isEmpty)
  }

  test("imagePhash: brightness shift moves few bits (the near-dup signal)") {
    val base = Array.tabulate(24 * 16)(i => (i * 3) % 256)
    val shifted = base.map(p => math.min(255, p + 8))
    val m = Seq(
      Multimodal.MediaRow(1L, "image", graft.sources.Png.encodeGray(24, 16, base)),
      Multimodal.MediaRow(2L, "image", graft.sources.Png.encodeGray(24, 16, shifted))).toDF()
    val hs = Multimodal.imagePhash(spark, m).collect().sortBy(_.media_id).map(_.phash.get)
    val ham = hs(0).zip(hs(1)).count { case (a, b) => a != b }
    assert(ham <= 6, s"brightness shift should move few bits, moved $ham")
  }
}
