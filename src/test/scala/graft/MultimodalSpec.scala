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

  test("decodeStub is deterministic and keeps ids/modality") {
    val a = Multimodal.decodeStub(spark, media).collect().sortBy(_.media_id)
    val b = Multimodal.decodeStub(spark, media).collect().sortBy(_.media_id)
    assert(a.toSeq == b.toSeq)
    assert(a.map(_.media_id).toSeq == Seq(1L, 2L))
    assert(a.forall(_.modality == "image"))
    assert(a(0).n_bytes == 700 && a(1).n_bytes == 3)
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
}
