package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector expression library over `Array[Float]` embedding columns.
  *
  * Pure higher-order-function expressions (`zip_with`/`aggregate`) — the
  * fold order is the array order, so results are deterministic. For the
  * absolute hot path a custom Catalyst Expression with `doGenCode` over
  * primitive arrays would shave the boxing; these are already codegen'd
  * and adequate until profiling says otherwise.
  */
object VectorFns {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val denom = norm(a) * norm(b)
    when(denom =!= 0, dot(a, b) / denom)
  }

  /** v / |v| as array<double>; zero vectors stay zero (cosine with them is
    * then 0, matching `cosine`'s null-guard semantics closely enough for
    * thresholding). Pre-normalizing once per row turns each pair score
    * into a single dot product.
    */
  def unit(v: Column): Column = {
    val n = norm(v)
    transform(v, x => when(n =!= 0, x.cast("double") / n).otherwise(lit(0.0)))
  }

  /** Sign-bit LSH bucket: pack sign(dot(v, plane_p)) for each hyperplane
    * into an int. Deterministic planes come from the caller (seeded).
    */
  def hyperplaneBucket(v: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      when(dot(v, typedLit(p.toSeq)) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  /** Hamming distance between two small packed-bit buckets (nBits <= 30). */
  def bucketHamming(a: Column, b: Column, nBits: Int): Column =
    (0 until nBits)
      .map(i => when((a.bitwiseXOR(b)).bitwiseAND(lit(1 << i)) =!= 0, 1).otherwise(0))
      .reduce(_ + _)
}
