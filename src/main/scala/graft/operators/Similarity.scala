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

  /** Score a vector against every centroid and return the `nProbe` cell
    * ids with the highest cosine — pure array-of-struct expressions
    * (array_sort orders by the leading cos field; slice(-n) keeps the top).
    */
  private def nearestCells(v: Column, cents: Seq[(Int, Seq[Double])], nProbe: Int): Column = {
    val scored = array(cents.map { case (c, arr) =>
      // rank by dot(v, c/|c|) = |v|·cos(v,c): same argmax as cosine (|v| is
      // constant across cells) at one dot product per centroid instead of
      // three dots + a sqrt
      val n = math.sqrt(arr.map(x => x * x).sum)
      val unit = if (n == 0) arr else arr.map(_ / n)
      struct(VectorFns.dot(v, typedLit(unit)).as("score"), lit(c).as("cell"))
    }: _*)
    transform(slice(array_sort(scored), -nProbe, nProbe), s => s.getField("cell"))
  }

  /** IVF-style ANN: coarse-quantize each vector to its nearest of `nCells`
    * centroids (an inverted file), probe the `nProbe` cells nearest the
    * query, and exact-cosine re-rank inside probed cells only.
    *
    * The codebook is a deterministic corpus sample (lowest `nCells` ids)
    * standing in for a trained k-means codebook — the assignment/probe
    * plumbing is identical and the codebook source is swappable. Collecting
    * it is an index-build action over nCells rows, done once; the search
    * itself stays one lazy plan. At cluster scale the assigned table is
    * written partitioned by `cell`, so a probe scans ~nProbe/nCells of the
    * data instead of broadcasting the query against everything.
    */
  def ivfTopK(
      df: DataFrame,
      id: String,
      vec: String,
      query: DataFrame,
      queryId: Long,
      k: Int,
      nCells: Int = 16,
      nProbe: Int = 4): DataFrame = {
    val cents: Seq[(Int, Seq[Double])] = df
      .select(col(id), col(vec)).orderBy(col(id)).limit(nCells)
      .collect().toSeq.zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Float](1).map(_.toDouble) }
    val assigned = df.withColumn("cell", element_at(nearestCells(col(vec), cents, 1), 1))
    val q = query.withColumn("qcells", nearestCells(col("qvec"), cents, nProbe))
    assigned
      .crossJoin(broadcast(q))
      .filter(col(id) =!= queryId)
      .filter(array_contains(col("qcells"), col("cell")))
      .withColumn("cosine", VectorFns.cosine(col(vec), col("qvec")))
      .select(col(id), col("cosine"))
      .orderBy(col("cosine").desc, col(id))
      .limit(k)
  }

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
