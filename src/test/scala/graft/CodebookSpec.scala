package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Codebook persistence: a materialized index must be probeable,
  * appendable and compactable from a DIFFERENT process than the one that
  * built it — so every build persists its codebooks under `_codebook/`
  * (invisible to the index's own parquet discovery) and the load side
  * round-trips them exactly.
  */
class CodebookSpec extends SparkTestBase {

  private lazy val e = spark.read.parquet(s"$sfDir/embeddings.parquet")

  test("IVF: persisted codebook round-trips exactly; probe with the loaded codebook matches") {
    val path = java.nio.file.Files.createTempDirectory("graft-cb-ivf").toString + "/idx"
    val cents = Similarity.buildIvfIndex(e, "vec_id", "embedding", path, nCells = 8)
    val loaded = Similarity.loadCodebook(spark, path)
    assert(loaded == cents.sortBy(_._1), "codebook changed through persistence")
    val qvec = e.filter(col("vec_id") === 0).select("embedding").collect()(0)
      .getSeq[Number](0).map(_.doubleValue()).toSeq
    val a = Similarity.probeIvfIndex(spark, path, "vec_id", "embedding",
      qvec, 0L, 10, cents, nProbe = 4).collect().map(_.toSeq).toSeq
    val b = Similarity.probeIvfIndex(spark, path, "vec_id", "embedding",
      qvec, 0L, 10, loaded, nProbe = 4).collect().map(_.toSeq).toSeq
    assert(a == b, "probe with the loaded codebook diverged")
    // the codebook dir must stay invisible to the index scan
    assert(!spark.read.parquet(path).columns.contains("centroid"))
  }

  test("SQ8: ranges and codebook round-trip; loaded pair decodes identically") {
    val path = java.nio.file.Files.createTempDirectory("graft-cb-sq8").toString + "/idx"
    val (cents, stats) = Similarity.buildIvfSq8Index(e, "vec_id", "embedding", path, nCells = 8)
    assert(Similarity.loadCodebook(spark, path) == cents.sortBy(_._1))
    assert(Similarity.loadSq8Ranges(spark, path) == stats)
    val qvec = e.filter(col("vec_id") === 0).select("embedding").collect()(0)
      .getSeq[Number](0).map(_.doubleValue()).toSeq
    val a = Similarity.probeIvfSq8Index(spark, path, "vec_id", qvec, 0L, 10,
      cents, stats, nProbe = 4).collect().map(_.toSeq).toSeq
    val b = Similarity.probeIvfSq8Index(spark, path, "vec_id", qvec, 0L, 10,
      Similarity.loadCodebook(spark, path), Similarity.loadSq8Ranges(spark, path),
      nProbe = 4).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("PQ: per-subspace codebooks round-trip; loaded chain probes identically") {
    val path = java.nio.file.Files.createTempDirectory("graft-cb-pq").toString + "/idx"
    val (cents, cbs) = Similarity.buildIvfPqIndex(
      e, "vec_id", "embedding", path, dim = 64, nCells = 8,
      trainIters = 3, m = 4, ksub = 8, pqIters = 2)
    val loadedC = Similarity.loadCodebook(spark, path)
    val loadedCbs = Similarity.loadPqCodebooks(spark, path, m = 4)
    assert(loadedC == cents.sortBy(_._1))
    assert(loadedCbs == cbs.map(_.sortBy(_._1)))
    val qvec = e.filter(col("vec_id") === 0).select("embedding").collect()(0)
      .getSeq[Number](0).map(_.doubleValue()).toSeq
    val a = Similarity.probeIvfPqIndex(spark, path, "vec_id", qvec, 0L, 10,
      cents, cbs, nProbe = 4).collect().map(_.toSeq).toSeq
    val b = Similarity.probeIvfPqIndex(spark, path, "vec_id", qvec, 0L, 10,
      loadedC, loadedCbs, nProbe = 4).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
