package graft.pipelines

import org.apache.spark.sql.{DataFrame, expressions}
import org.apache.spark.sql.functions._
import graft.core.DataChecks
import graft.ops.{Aggregates, Joins}

/** Datalake prep — Spark re-expression of the engine-shaped parts of
  * data-raw/prep_datalake.R (the xlsx/dropbox loaders are out-of-engine,
  * SURVEY §7.3): eikon indicator medians per isin, vintage merge,
  * ownership-tree majority-parent prewrangle, and the ids-table isin
  * consistency rules.
  */
object Datalake {

  val eikonIndicators: Seq[String] =
    Seq("pd", "net_profit_margin", "debt_equity_ratio", "volatility", "asset_drift")

  /** prep_datalake.R:97-107 — collapse the new eikon feed to one row per
    * isin: first ticker/industry, exact median for every indicator
    * (Aggregates.median = R stats::median interpolation).
    */
  def eikonMediansByIsin(eikonNew: DataFrame): DataFrame =
    eikonNew.groupBy("isin")
      .agg(
        first(col("ticker_symbol")).as("ticker_symbol"),
        (eikonIndicators.map(i => Aggregates.median(col(i)).as(i)) :+
          first(col("trbc_industry_name")).as("trbc_industry_name")): _*)

  /** prep_datalake.R:109-115 — the new vintage wins per isin (old rows
    * anti-joined out), ald_location from the isin country prefix.
    */
  def mergeEikonVintages(eikonOld: DataFrame, eikonNew: DataFrame): DataFrame =
    eikonOld
      .join(eikonNew.select("isin"), Seq("isin"), "left_anti")
      .unionByName(eikonNew, allowMissingColumns = true)
      .withColumn("ald_location", substring(col("isin"), 1, 2))
      .drop("ticker_symbol", "trbc_industry_name")

  /** prep_datalake.R:235-283 prewrangle_ownership_tree: one direction only
    * (ownership_level >= 0), a null linking stake means sole ownership
    * (→ 100), majority parent per (company, level) with slice_max ties
    * broken by keeping one row (distinct .keep_all — survivor pinned on
    * target_company_id for determinism), then the parent/subsidiary
    * renames. One shuffle on (company_id, ownership_level).
    */
  def prewrangleOwnershipTree(ownershipTree: DataFrame): DataFrame = {
    val oneDirection = ownershipTree
      .distinct()
      .filter(col("ownership_level") >= 0)
      .withColumn("linking_stake", coalesce(col("linking_stake"), lit(100.0)))
    val w = expressions.Window
      .partitionBy(col("company_id"), col("ownership_level"))
      .orderBy(col("linking_stake").desc)
    val majority = oneDirection
      .withColumn("__rk", rank().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
    Joins.dedupKeepFirst(majority, Seq("company_id", "ownership_level"),
        Seq(col("target_company_id")))
      .withColumnRenamed("target_company_id", "parent_company_id")
      .withColumnRenamed("company_id", "subsidiary_company_id")
  }

  /** prep_datalake.R:339-355 — a company may have either one null-isin row
    * or any number of non-null-isin rows, never both: null-isin rows are
    * dropped when the company has a real isin. The company set must be
    * preserved (reference assertr::verify).
    */
  def enforceIsinConsistency(ids: DataFrame): DataFrame = {
    val withIsin = ids.filter(col("isin").isNotNull)
    val nullIsinOnly = ids.filter(col("isin").isNull)
      .join(withIsin.select("company_id").distinct(), Seq("company_id"), "left_anti")
    val out = withIsin.unionByName(nullIsinOnly).cache()
    val before = ids.select("company_id").distinct().count()
    val after = out.select("company_id").distinct().count()
    if (before != after)
      throw DataChecks.CheckFailed(
        s"isin cleanup changed the company set: $before -> $after")
    // :357-361 — an isin maps to exactly one company
    DataChecks.assertUniqueKeys(
      out.filter(col("isin").isNotNull).select("isin", "company_id").distinct(),
      Seq("isin"))
    out
  }

  /** prep_datalake.R:296-330 get_additional_isins: externally supplied
    * (company_id, isin) pairs not yet known are attached to the company's
    * id row (many-to-many fan-out over the id attributes) and marked
    * trustworthy.
    */
  def attachAdditionalIsins(ids: DataFrame, newIdIsins: DataFrame): DataFrame = {
    val unknown = newIdIsins.select("company_id", "isin").distinct()
      .join(ids.select("isin").distinct(), Seq("isin"), "left_anti")
    val idAttrs = ids.drop("isin", "trustworthy").distinct()
    val enhanced = unknown
      .join(idAttrs, Seq("company_id"))
      .withColumn("trustworthy", lit(true))
    ids.unionByName(enhanced.select(ids.columns.map(col): _*))
  }
}
