package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Runtime data-quality assertions — the port of the reference's inline
  * `assertr::verify` / `stopifnot` checks, which are its real test surface
  * (reference: R/prepare_prewrangled_financial_data_stress_test.R:211-214,
  * 330,333-336,600-603; R/prepare_prewrangled_capacity_factors.R:177-193
  * capacity_factor in [0,1]; R/prepare_price_data_long.R:224-231 price >= 0;
  * R/prepare_scenario_data.R:174-182 schema checks).
  *
  * Column-set checks are plan-only (free). Value checks are actions — each
  * one executes the plan, so pipelines should checkpoint/cache before a
  * cluster-scale check, or use [[checkExpr]] to fold the assertion into the
  * plan as a side-effect-free filter count.
  */
object DataChecks {
  final case class CheckFailed(msg: String) extends RuntimeException(msg)

  /** reference R/prepare_scenario_data.R:89-99 check_crucial_names. */
  def requireColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    val missing = cols.filterNot(df.columns.contains)
    if (missing.nonEmpty) throw CheckFailed(s"missing columns: ${missing.mkString(", ")}")
    df
  }

  /** Count of rows violating a predicate (single job, no collect of data). */
  def violations(df: DataFrame, pred: Column): Long =
    df.filter(!coalesce(pred, lit(false))).count()

  /** reference R/prepare_prewrangled_financial_data_stress_test.R:600-603. */
  def assertNoNull(df: DataFrame, cols: Seq[String]): DataFrame = {
    val bad = df.filter(cols.map(col(_).isNull).reduce(_ || _)).count()
    if (bad > 0) throw CheckFailed(s"$bad rows with nulls in ${cols.mkString(",")}")
    df
  }

  /** reference R/prepare_prewrangled_capacity_factors.R:177-193 bounds. */
  def assertBetween(df: DataFrame, c: String, lo: Double, hi: Double): DataFrame = {
    val bad = violations(df, col(c).isNotNull && col(c) >= lo && col(c) <= hi)
    if (bad > 0) throw CheckFailed(s"$bad rows with $c outside [$lo,$hi] or null")
    df
  }

  /** reference R/prepare_abcd_stress_test_input.R:423 unique-row check;
    * R/helpers.R:36-52 duplicate reporter.
    */
  def assertUniqueKeys(df: DataFrame, keys: Seq[String]): DataFrame = {
    val dups = df.groupBy(keys.map(col): _*).count().filter(col("count") > 1).count()
    if (dups > 0) throw CheckFailed(s"$dups duplicated key combos on ${keys.mkString(",")}")
    df
  }
}
