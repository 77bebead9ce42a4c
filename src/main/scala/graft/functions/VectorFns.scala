package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector expression library over `Array[Float]` embedding columns.
  *
  * The dot product — the hot inner loop of every dedup/ANN operator — is
  * the custom `graft_dot` Catalyst expression (one primitive loop per row;
  * the HOF `aggregate(zip_with(...))` formulation evaluated interpreted
  * lambdas per element and dominated the embedding profiles, the same
  * failure mode the MinHash sketch had). Callers must run
  * `graft.plans.Sketches.ensureRegistered(spark)` once per session — every
  * `graft.operators` entry point does. `hofDot` remains as the registry-free
  * portable fallback.
  */
object VectorFns {

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)

  /** Registry-free composed-builtins formulation (deterministic fold in
    * array order); used where no session is in scope to register the
    * custom expression.
    */
  def hofDot(a: Column, b: Column): Column =
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

  /** Johnson–Lindenstrauss random projection to `planes.size` dimensions:
    * out_j = dot(v, plane_j) / sqrt(k · σ²), where σ² = 1/12 is the
    * variance of the uniform [-0.5, 0.5) LCG plane entries — without the
    * 12, norms shrink ~3.5× and dots ~12× and any threshold calibrated in
    * the original space is wrong. With the correction, E‖proj‖² = ‖v‖²
    * and pairwise geometry survives within (1 ± ε) at k = O(log n / ε²) —
    * the shrink-before-ANN step for oversized embeddings.
    *
    * Reproducible in SQL: planes regenerate from the LCG formula
    * ([[graft.operators.Similarity.lcgPlanes]]) and the divisor is one
    * double constant — spell it `sqrt(k.0/12.0)` in the oracle (both
    * engines round sqrt correctly to the same bits; a bare decimal
    * literal would NOT work — DuckDB parses those as DECIMAL first,
    * which double-rounds 1 ulp off) and every output double is
    * bit-identical across engines.
    */
  def jlProject(v: Column, planes: Seq[Array[Double]]): Column = {
    val scale = jlScale(planes.size)
    array(planes.map(p => dot(v, typedLit(p.toSeq)) / scale): _*)
  }

  /** The exact divisor jlProject uses: sqrt(k/12) for k uniform
    * [-0.5, 0.5) planes. Exposed so oracle SQL can embed the identical
    * double literal.
    */
  def jlScale(k: Int): Double = math.sqrt(k / 12.0)
}
