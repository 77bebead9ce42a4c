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
}
