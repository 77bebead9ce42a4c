package graft

import org.apache.spark.sql.functions._
import graft.ops.Linalg

/** Pins the fixed-point power-iteration contract of
  * [[graft.ops.Linalg.dominantDirection]]: determinism, agreement with a
  * high-precision float power iteration, eigen-residual quality, and the
  * planted-dominant-axis sanity case.
  */
class LinalgSpec extends SparkTestBase {
  import spark.implicits._

  private def result(df: org.apache.spark.sql.DataFrame, d: Int, iters: Int = 3) =
    Linalg.dominantDirection(df, "emb", d, iters).collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)

  test("guards d > 64 loudly (one-Row aggregate width bound)") {
    val data = Seq((1L, Array.fill(65)(1.0))).toDF("vec_id", "emb")
    val e = intercept[IllegalArgumentException](Linalg.dominantDirection(data, "emb", 65))
    assert(e.getMessage.contains("d <= 64"))
  }

  test("second moments stay exact past the long-multiply wrap point") {
    // raw |x| > ~3037 quantizes past 3.0e9 micro-units; the long product
    // x*x would exceed 2^63 and silently wrap in non-ANSI mode — the
    // decimal-factor cast keeps it exact (ADVICE r10 #1). Planted axis 0
    // carries ~5000-magnitude values, so the pre-fix sum was garbage.
    val data = (0 until 100).map { i =>
      (i.toLong, Array(5000.0 + (i % 7), 0.001 * (i % 5)))
    }.toDF("vec_id", "emb")
    val r = result(data, 2)
    assert(r.forall { case (_, _, ratio) => ratio > 0.999999 && ratio <= 1.0 },
      s"axis 0 carries essentially all energy, got ${r.toSeq}")
    assert(math.abs(r(0)._2) == 1.0 && math.abs(r(1)._2) < 1e-5,
      s"loading must point at the planted axis, got ${r.toSeq}")
  }

  test("deterministic across runs and partitionings") {
    val data = (0 until 500).map { i =>
      (i.toLong, Array.tabulate(8)(k => math.sin(i * 0.37 + k * 1.3)))
    }.toDF("vec_id", "emb")
    val a = result(data, 8)
    val b = result(data.repartition(7), 8)
    assert(a.toSeq == b.toSeq, "result depends on partitioning")
  }

  test("matches a high-precision float power iteration on direction and ratio") {
    val n = 400
    val d = 8
    def emb(i: Int): Array[Double] =
      Array.tabulate(d)(k => math.sin(i * 0.31 + k) * (1.0 + k * 0.2))
    val data = (0 until n).map(i => (i.toLong, emb(i))).toDF("vec_id", "emb")
    // convergence rate is the spectral gap's: this fixture's top two
    // eigenvalues are close, so run the fixed-point iteration further
    // than the catalog default before demanding tight agreement
    val got = result(data, d, iters = 12)

    // reference: quantized second-moment matrix (same micro-unit rule),
    // then 60 double-precision power iterations
    val m = Array.ofDim[Double](d, d)
    for (i <- 0 until n) {
      val x = emb(i).map(v => math.floor(v * 1e6 + 0.5))
      for (a <- 0 until d; b <- 0 until d) m(a)(b) += x(a) * x(b)
    }
    var v = Array.fill(d)(1.0)
    for (_ <- 0 until 60) {
      val w = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
      val norm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / norm)
    }
    val lam = (0 until d).map(i => (0 until d).map(j => v(i) * m(i)(j) * v(j)).sum).sum
    val trace = (0 until d).map(i => m(i)(i)).sum

    // direction agreement: |cos(angle)| between the fixed-point loading
    // and the converged eigenvector
    val g = got.map(_._2)
    val dot = (0 until d).map(i => g(i) * v(i)).sum
    val ng = math.sqrt(g.map(x => x * x).sum)
    assert(math.abs(dot) / ng > 0.9999,
      s"direction diverged: |cos| = ${math.abs(dot) / ng}")
    assert(math.abs(got.head._3 - lam / trace) < 1e-3,
      s"explained ratio ${got.head._3} vs reference ${lam / trace}")
  }

  test("planted dominant axis concentrates the loading") {
    val data = (0 until 300).map { i =>
      val sign = if (i % 2 == 0) 1.0 else -1.0
      (i.toLong, Array.tabulate(6)(k =>
        if (k == 2) sign * 5.0 else math.sin(i * 1.7 + k) * 0.05))
    }.toDF("vec_id", "emb")
    val got = result(data, 6)
    val byAbs = got.sortBy(r => -math.abs(r._2))
    assert(byAbs.head._1 == 2, s"dominant axis should be pos 2, got ${byAbs.head._1}")
    assert(math.abs(byAbs.head._2) == 1.0, "max |loading| must be exactly 1 (the fixed-point scale)")
    assert(byAbs.tail.forall(r => math.abs(r._2) < 0.05),
      s"off-axis loadings should be tiny: ${got.mkString(",")}")
    assert(got.head._3 > 0.99, s"planted axis should explain ~all energy, got ${got.head._3}")
  }

  test("rejects degenerate inputs loudly") {
    val zero = (0 until 10).map(i => (i.toLong, Array.fill(4)(0.0))).toDF("vec_id", "emb")
    val e = intercept[IllegalArgumentException](result(zero, 4))
    assert(e.getMessage.contains("zero second-moment"))
    assertThrows[IllegalArgumentException](
      Linalg.dominantDirection(zero, "emb", d = 1))
  }
}
