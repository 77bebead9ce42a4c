package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Profile

/** Column profiling (§2.11): the exact tier is oracled (pf_profile); here
  * the sketch tier is pinned against the exact tier at fixture scale, and
  * shapes/edge cases are covered.
  */
class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  test("numericProfile: exact metrics on a small frame with nulls") {
    val df = Seq(
      (1, Some(10.0)), (2, Some(20.0)), (3, None), (4, Some(20.0)))
      .toDF("id", "v")
    val rows = Profile.numericProfile(df, Seq("id", "v"))
      .as[(String, Long, Long, Long, Double, Double, Double, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq("id", "v")) // ordered by column
    val Array(id, v) = rows
    assert(id == (("id", 4L, 0L, 4L, 1.0, 4.0, 10.0, 2.5)))
    assert(v == (("v", 4L, 1L, 2L, 10.0, 20.0, 50.0, 50.0 / 3)))
  }

  test("approxProfile tracks the exact tier on the lineitem fixture") {
    val li = Tables.lineitem(spark, sfDir).select("l_quantity", "l_extendedprice")
    val cols = Seq("l_quantity", "l_extendedprice")
    val exact = Profile.numericProfile(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    val approx = Profile.approxProfile(li, cols).collect()
      .map(r => r.getString(0) -> r).toMap
    for (c <- cols) {
      val e = exact(c); val a = approx(c)
      assert(a.getLong(1) == e.getLong(1)) // n_rows exact
      assert(a.getLong(2) == e.getLong(2)) // n_nulls exact
      val nd = e.getLong(3).toDouble
      val nda = a.getLong(3).toDouble
      assert(math.abs(nda - nd) / nd < 0.15, s"$c approx_distinct $nda vs exact $nd")
      // p50 within the column's range and between min/max of exact tier
      assert(a.getDouble(4) >= e.getDouble(4) && a.getDouble(4) <= e.getDouble(5),
        s"$c p50 ${a.getDouble(4)} outside [${e.getDouble(4)}, ${e.getDouble(5)}]")
      assert(a.getDouble(6) == e.getDouble(4) && a.getDouble(7) == e.getDouble(5)) // min/max exact
    }
  }

  test("stringProfile: nulls, empties, and length stats") {
    val df = Seq(Some("abc"), Some(""), None, Some("de")).toDF("s")
    val r = Profile.stringProfile(df, Seq("s"))
      .as[(String, Long, Long, Long, Long, Int, Int, Double)].head()
    assert(r == (("s", 4L, 1L, 3L, 1L, 0, 3, 5.0 / 3)))
  }

  test("keySkew: hot keys first with share and multiple-of-mean, bounded at topN") {
    val df = (Seq.fill(6)("hot") ++ Seq.fill(2)("warm") ++ Seq("cold", "cool")).toDF("k")
    val out = Profile.keySkew(df, Seq("k"), topN = 3)
      .as[(String, Long, Double, Double)].collect()
    assert(out.length == 3)
    assert(out(0) == (("hot", 6L, 0.6, 2.4)))  // 6/10 rows, 2.4x the mean key load of 2.5
    assert(out(1) == (("warm", 2L, 0.2, 0.8)))
    assert(out(2)._1 == "cold") // tie between cold/cool broken by key asc
  }

  test("keySkew plans a TakeOrdered, not a global sort or window") {
    val li = Tables.lineitem(spark, sfDir).select("l_suppkey")
    val plan = Profile.keySkew(li, Seq("l_suppkey")).queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrdered"), s"expected TakeOrderedAndProject:\n$plan")
    assert(!plan.contains("Window"), s"keySkew must not window:\n$plan")
  }

  test("profile is one aggregate job: a single pair of hash-aggregate stages") {
    val li = Tables.lineitem(spark, sfDir).select("l_quantity", "l_discount")
    val plan = Profile.numericProfile(li, Seq("l_quantity", "l_discount"))
      .queryExecution.executedPlan.toString
    // count(distinct) over 2 columns -> one Expand, not one scan per column
    assert("Scan parquet".r.findAllIn(plan).length == 1, s"profile must scan once:\n$plan")
  }

  test("chiSquare: closed-form 2x2, exact independence, zero cells included") {
    // textbook 2x2: obs [[10,20],[20,10]] -> every e = 15, every term
    // (±5)²/15, chi2 = 4·25/15 = 20/3, dof 1
    def rows(counts: Seq[(String, String, Int)]) =
      counts.flatMap { case (a, b, n) => Seq.fill(n)((a, b)) }.toDF("a", "b")
    val skewed = Profile.chiSquare(
      rows(Seq(("x", "u", 10), ("x", "v", 20), ("y", "u", 20), ("y", "v", 10))), "a", "b")
      .as[(Long, Long, Long, Long, Double)].head()
    assert(skewed._1 == 60 && skewed._2 == 2 && skewed._3 == 2 && skewed._4 == 1)
    assert(math.abs(skewed._5 - 20.0 / 3.0) < 1e-5, s"chi2 ${skewed._5} (want 6.6667)")
    // perfectly proportional table: every o·N == r·c exactly -> chi2 = 0
    val indep = Profile.chiSquare(
      rows(Seq(("x", "u", 6), ("x", "v", 2), ("y", "u", 3), ("y", "v", 1))), "a", "b")
      .select("chi2").as[Double].head()
    assert(indep == 0.0)
    // a level pair never observed together still contributes its e term:
    // [[5,0],[0,5]] -> chi2 = N = 10 (the maximal 2x2 association)
    val disjoint = Profile.chiSquare(
      rows(Seq(("x", "u", 5), ("y", "v", 5))), "a", "b")
      .select("dof", "chi2").as[(Long, Double)].head()
    assert(disjoint._1 == 1 && math.abs(disjoint._2 - 10.0) < 1e-9)
  }

  test("cohenKappa: textbook 2x2, perfect agreement, degenerate denominator, null rejection") {
    def rows(counts: Seq[(String, String, Int)]) =
      counts.flatMap { case (a, b, n) => Seq.fill(n)((a, b)) }.toDF("a", "b")
    // Cohen's worked shape: [[20,5],[10,15]] -> N=50 D=35 S=25·30+25·20=1250
    // -> p_o=0.7 p_e=0.5 kappa=(0.7-0.5)/0.5 = 0.4, and the integer form
    // (N·D-S)/(N²-S) = 500/1250 gives it exactly
    val k = Profile.cohenKappa(
      rows(Seq(("yes", "yes", 20), ("yes", "no", 5), ("no", "yes", 10), ("no", "no", 15))),
      "a", "b").as[(Long, Long, Double, Double, Double)].head()
    assert(k._1 == 50 && k._2 == 35)
    assert(k._3 == 0.7 && k._4 == 0.5 && k._5 == 0.4) // exact rational values
    // identical columns with >1 level: kappa = 1
    val perfect = Profile.cohenKappa(
      rows(Seq(("x", "x", 3), ("y", "y", 7))), "a", "b")
      .select("kappa").as[Double].head()
    assert(perfect == 1.0)
    // single shared level: p_e = 1, kappa undefined -> null
    val degen = Profile.cohenKappa(rows(Seq(("x", "x", 5))), "a", "b")
      .select("kappa").as[Option[Double]].head()
    assert(degen.isEmpty)
    intercept[IllegalArgumentException] {
      Profile.cohenKappa(Seq((null.asInstanceOf[String], "x")).toDF("a", "b"), "a", "b")
    }
  }

  test("cramersV: perfect association 1, independence 0, single-level null") {
    def rows(counts: Seq[(String, String, Int)]) =
      counts.flatMap { case (a, b, n) => Seq.fill(n)((a, b)) }.toDF("a", "b")
    // diagonal 2x2: chi2 = N, min(k)-1 = 1 -> V = sqrt(N/N) = 1
    val perfect = Profile.cramersV(
      rows(Seq(("x", "u", 5), ("y", "v", 5))), "a", "b")
      .select("cramers_v").as[Double].head()
    assert(perfect == 1.0)
    // proportional table: chi2 = 0 -> V = 0
    val indep = Profile.cramersV(
      rows(Seq(("x", "u", 6), ("x", "v", 2), ("y", "u", 3), ("y", "v", 1))), "a", "b")
      .select("cramers_v").as[Double].head()
    assert(indep == 0.0)
    // one-level column: association undefined -> null, no division blowup
    val degen = Profile.cramersV(
      rows(Seq(("x", "u", 3), ("x", "v", 2))), "a", "b")
      .select("cramers_v").as[Option[Double]].head()
    assert(degen.isEmpty)
  }

  test("confusionStats: hand-computed per-class metrics, degenerate classes null not NaN") {
    val rows = Seq.fill(3)(("en", "en")) ++ Seq(("en", "de")) ++
      Seq.fill(2)(("de", "de")) ++ Seq(("fr", "en"))
    val out = Profile.confusionStats(rows.toDF("pred", "label"), "pred", "label")
      .orderBy("label")
      .as[(String, Long, Long, Long, Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
    // de: predicted 2, true 3, tp 2 -> p=1, r=2/3, f1=0.8
    assert(out(0) == (("de", 3L, 2L, 2L, 0L, 1L, Some(1.0), Some(2.0 / 3.0), Some(0.8))))
    // en: predicted 4, true 4, tp 3 -> p=r=f1=0.75
    assert(out(1) == (("en", 4L, 4L, 3L, 1L, 1L, Some(0.75), Some(0.75), Some(0.75))))
    // fr: predicted once, never true -> precision 0, recall/f1 undefined (null)
    assert(out(2) == (("fr", 0L, 1L, 0L, 1L, 0L, Some(0.0), None, None)))
    intercept[IllegalArgumentException] {
      Profile.confusionStats(Seq(("x", null.asInstanceOf[String])).toDF("pred", "label"),
        "pred", "label")
    }
  }

  test("giniImpurity: pure group 0, uniform two-label 0.5, exact three-label value") {
    val df = Seq(
      ("s1", "en"), ("s1", "en"), ("s1", "en"),               // pure
      ("s2", "en"), ("s2", "de"), ("s2", "en"), ("s2", "de"), // 2+2
      ("s3", "en"), ("s3", "de"), ("s3", "fr")                // 1+1+1
    ).toDF("source", "lang")
    val out = Profile.giniImpurity(df, "source", "lang")
      .orderBy("source").as[(String, Long, Long, Double)].collect()
    assert(out(0) == (("s1", 3L, 1L, 0.0)))
    assert(out(1) == (("s2", 4L, 2L, 0.5)))          // 1 - 8/16
    assert(out(2)._4 == 1.0 - 3.0 / 9.0)             // 1 - 3/9, exact
    intercept[IllegalArgumentException] {
      Profile.giniImpurity(Seq(("s", null.asInstanceOf[String])).toDF("source", "lang"),
        "source", "lang")
    }
  }
}
