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

  /** prep_datalake.R:27-65 — the archived-vintage eikon wrangle: the
    * net-profit-margin repair ladder (the "smart ratios" figure is trusted
    * only inside [0,1]; outside it the plain LTM figure substitutes when
    * itself plausible, else clamps to the violated bound), indicator
    * renames/casts, and the not-null-isin filter. R case_when semantics on
    * NA conditions (skip to the default) match Spark's when().
    */
  def wrangleEikonOld(raw: DataFrame): DataFrame = {
    // cast like the sibling indicators: the archived feeds arrive
    // string-typed, and an uncast when-ladder would widen its result to
    // STRING (R reads these numeric via readxl, so parity needs doubles)
    val csr = col("credit_smart_ratios_net_profit_margin_percent_ltm_s_avg").cast("double")
    val ltm = col("net_profit_margin_percent_0d_ltm_1_s_avg").cast("double")
    raw
      .withColumn("net_profit_margin",
        when(csr < 0 && ltm.between(0, 1), ltm)
          .when(csr < 0 && ltm < 0, lit(0.0))
          .when(csr < 0 && ltm > 1, lit(0.0))
          .when(csr > 1 && ltm.between(0, 1), ltm)
          .when(csr > 1 && ltm > 1, lit(1.0))
          .when(csr > 1 && ltm < 0, lit(1.0))
          .otherwise(csr))
      .withColumn("pd", col("x4").cast("double"))
      .withColumn("debt_equity_ratio", col("leverage_s_avg").cast("double"))
      .withColumn("volatility", col("asset_volatility_s_avg").cast("double"))
      .withColumn("asset_drift", col("asset_drift_s_avg").cast("double"))
      .withColumn("ticker_symbol", col("identifier_ric"))
      .withColumn("trbc_industry_name", col("gics_sub_industry_name"))
      .select(col("isin"), col("structural"), col("ticker_symbol"), col("pd"),
        col("net_profit_margin"), col("debt_equity_ratio"), col("volatility"),
        col("asset_drift"), col("trbc_industry_name"))
      .filter(col("isin").isNotNull)
  }

  /** prep_datalake.R:67-95 — the current-feed eikon wrangle: renames plus
    * percent→fraction scaling on pd/npm/volatility/drift.
    */
  def wrangleEikonNew(raw: DataFrame): DataFrame =
    raw
      .withColumn("debt_equity_ratio", col("credit_structural_leverage").cast("double"))
      .withColumn("pd", col("credit_structural_pd_percent").cast("double") / 100)
      .withColumn("net_profit_margin", col("net_profit_margin_percent").cast("double") / 100)
      .withColumn("volatility",
        col("credit_structural_asset_volatility_percent").cast("double") / 100)
      .withColumn("asset_drift", col("credit_structural_asset_drift_percent").cast("double") / 100)
      .select(col("isin"), col("ticker_symbol"), col("pd"), col("net_profit_margin"),
        col("debt_equity_ratio"), col("volatility"), col("asset_drift"),
        col("trbc_industry_name"))

  /** prep_datalake.R:118-160 make_asset_impact_db + the :330 filter —
    * company information full-joined with the distinct (company, sector,
    * location) activity perimeter; placeholder "Unknown" companies dropped.
    */
  def makeAssetImpactDb(companyInfo: DataFrame, companyActivities: DataFrame): DataFrame =
    companyInfo
      .join(
        companyActivities
          .withColumnRenamed("id", "company_id")
          .select("company_id", "ald_sector", "ald_location").distinct(),
        Seq("company_id"), "full")
      .filter(col("company_name") =!= "Unknown")

  /** prep_datalake.R:165-232 make_ids_db — the DB_ids assembly:
    *
    *  1. usable archived rows = security ⋈ consolidated financial data
    *     (natural inner join), reduced to the id columns;
    *  2. asset-impact isins = the provider's ISIN sheet plus one isin-less
    *     row per provider company absent from that sheet;
    *  3. archived rows for companies the provider now covers are dropped
    *     (by company_id), then any archived isin the provider also lists is
    *     dropped (by isin) — provider data wins on both keys;
    *  4. eikon-only isins (no company_id anywhere) are appended last.
    */
  def makeIdsDb(
      securityFinancial: DataFrame,
      consolidatedFinancial: DataFrame,
      assetImpactIsins: DataFrame,
      dbAssetImpact: DataFrame,
      dbAssetsEikon: DataFrame): DataFrame = {
    val usableOld = securityFinancial
      .join(consolidatedFinancial,
        securityFinancial.columns.intersect(consolidatedFinancial.columns).toSeq)
      .select("isin", "company_name", "company_id", "bloomberg_id",
        "legal_entity_id", "parent_company_id", "obligor_company_id")
      .distinct()
    // the pair anti-join below must be null-safe for the same dplyr
    // na_matches = "na" reason as the isin anti-joins: a provider company
    // with a null id or name is "absent from the sheet" only if the sheet
    // holds no matching null-keyed row
    val sheetKeys = assetImpactIsins
      .select(col("company_id").as("__s_cid"), col("company_name").as("__s_cn"))
      .distinct()
    val providerIsins = assetImpactIsins.unionByName(
      dbAssetImpact.select("company_id", "company_name").distinct()
        .join(sheetKeys,
          col("company_id") <=> col("__s_cid") && col("company_name") <=> col("__s_cn"),
          "left_anti"),
      allowMissingColumns = true)
    // dplyr anti_join defaults to na_matches = "na": an NA key on the left
    // IS dropped when the right holds an NA key. providerIsins always
    // carries null isins (the isin-less companies appended above), so the
    // isin anti-joins must be NULL-SAFE (<=>) to reproduce the reference —
    // a null-unsafe left_anti would keep every null-isin row instead.
    def antiNullSafe(l: DataFrame, r: DataFrame, key: String): DataFrame =
      l.join(r.select(col(key).as(s"__r_$key")).distinct(),
        col(key) <=> col(s"__r_$key"), "left_anti")
    val oldNotSuperseded = antiNullSafe(
      antiNullSafe(usableOld, providerIsins, "company_id"),
      providerIsins, "isin")
    val ids = oldNotSuperseded.unionByName(
      providerIsins.select("company_id", "company_name", "isin").distinct(),
      allowMissingColumns = true)
    ids.unionByName(
      antiNullSafe(dbAssetsEikon.select("isin").distinct(), ids, "isin"),
      allowMissingColumns = true)
  }

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
    // reference :310 left_join: an externally supplied company_id absent
    // from the ids table still lands (attrs null), it is not dropped
    val idAttrs = ids.drop("isin", "trustworthy").distinct()
    val enhanced = unknown
      .join(idAttrs, Seq("company_id"), "left")
      .withColumn("trustworthy", lit(true))
    ids.unionByName(enhanced.select(ids.columns.map(col): _*))
  }
}
