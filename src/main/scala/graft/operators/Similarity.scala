package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.VectorFns

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — one narrow pass + a k-row global
  * top (Spark's orderBy+limit compiles to per-partition TakeOrdered then a
  * driver-side merge of k·P rows, not a full sort).
  * Scale path: sign-bit LSH bucketing — the index is a cheap int column;
  * candidate filtering by bucket Hamming radius touches an int per row
  * instead of a d-dim dot product, and at cluster scale the table would be
  * written bucketed by `bucket` so a probe reads only matching buckets.
  */
object Similarity {

  /** Deterministic pseudo-random hyperplanes (fixed seed), generated
    * driver-side as literals — no RNG inside the plan (non-deterministic
    * expressions would break retries/resume at scale).
    */
  def randomPlanes(nPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Exact brute-force cosine top-k against a single query vector column
    * (1-row DataFrame `query` with column `qvec`), self excluded by id.
    */
  def bruteForceTopK(
      df: DataFrame,
      id: String,
      vec: String,
      query: DataFrame,
      queryId: Long,
      k: Int): DataFrame =
    df.crossJoin(broadcast(query))
      .filter(col(id) =!= queryId)
      .withColumn("cosine", VectorFns.cosine(col(vec), col("qvec")))
      .select(col(id), col("cosine"))
      .orderBy(col("cosine").desc, col(id))
      .limit(k)

  /** LSH-filtered ANN: restrict to rows whose bucket is within `radius`
    * Hamming bits of the query bucket, then exact cosine re-rank.
    */
  def lshTopK(
      df: DataFrame,
      id: String,
      vec: String,
      query: DataFrame,
      queryId: Long,
      k: Int,
      nPlanes: Int = 8,
      dim: Int = 64,
      radius: Int = 2,
      seed: Long = 42L): DataFrame = {
    val planes = randomPlanes(nPlanes, dim, seed)
    val withBucket = df.withColumn("bucket", VectorFns.hyperplaneBucket(col(vec), planes))
    val q = query.withColumn("qbucket", VectorFns.hyperplaneBucket(col("qvec"), planes))
    withBucket
      .crossJoin(broadcast(q))
      .filter(col(id) =!= queryId)
      .filter(VectorFns.bucketHamming(col("bucket"), col("qbucket"), nPlanes) <= radius)
      .withColumn("cosine", VectorFns.cosine(col(vec), col("qvec")))
      .select(col(id), col("cosine"))
      .orderBy(col("cosine").desc, col(id))
      .limit(k)
  }
}
