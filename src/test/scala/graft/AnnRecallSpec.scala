package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Similarity

/** ANN quality on the real embedding fixtures: LSH top-k must recover a
  * meaningful fraction of the exact brute-force neighbors (it is a
  * candidate filter, not an exact method — recall is the contract).
  */
class AnnRecallSpec extends SparkTestBase {
  import spark.implicits._

  test("lshTopK recall@10 vs brute force on fixture embeddings") {
    val e = Tables.embeddings(spark, sfDir).cache()
    val queryIds = Seq(0L, 7L, 21L)
    val recalls = queryIds.map { qid =>
      val q = e.filter(col("vec_id") === qid).select(col("embedding").as("qvec"))
      val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, qid, 10)
        .select("vec_id").as[Long].collect().toSet
      val approx = Similarity.lshTopK(e, "vec_id", "embedding", q, qid, 10,
          radius = 3)
        .select("vec_id").as[Long].collect().toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@10 $mean (per-query: $recalls)")
  }

  test("ivfTopK recall@10 vs brute force on fixture embeddings") {
    val e = Tables.embeddings(spark, sfDir).cache()
    val queryIds = Seq(0L, 7L, 21L)
    val recalls = queryIds.map { qid =>
      val q = e.filter(col("vec_id") === qid).select(col("embedding").as("qvec"))
      val exact = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, qid, 10)
        .select("vec_id").as[Long].collect().toSet
      val approx = Similarity.ivfTopK(e, "vec_id", "embedding", q, qid, 10,
          nCells = 16, nProbe = 6)
        .select("vec_id").as[Long].collect().toSet
      exact.intersect(approx).size.toDouble / exact.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.5, s"mean recall@10 $mean (per-query: $recalls)")
  }

  test("bruteForceTopK is deterministic across runs") {
    val e = Tables.embeddings(spark, sfDir)
    val q = e.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val r1 = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 0L, 5)
      .collect().toSeq
    val r2 = Similarity.bruteForceTopK(e, "vec_id", "embedding", q, 0L, 5)
      .collect().toSeq
    assert(r1 == r2)
  }
}
