package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Datalake

/** Datalake prep (data-raw/prep_datalake.R engine-shaped parts). */
class DatalakeSpec extends SparkTestBase {
  import spark.implicits._

  private def eikonRow(isin: String, ticker: String, pd: Double) =
    (isin, ticker, pd, 0.1, 1.5, 0.2, 0.05, "Industry")

  private def eikonDf(rows: Seq[(String, String, Double, Double, Double, Double, Double, String)]) =
    rows.toDF("isin", "ticker_symbol", "pd", "net_profit_margin", "debt_equity_ratio",
      "volatility", "asset_drift", "trbc_industry_name")

  test("eikonMediansByIsin: exact median per isin, first ticker") {
    val df = eikonDf(Seq(
      eikonRow("US1", "T1", 0.02), eikonRow("US1", "T1", 0.04), eikonRow("US1", "T1", 0.10),
      eikonRow("FR2", "T2", 0.08)))
    val out = Datalake.eikonMediansByIsin(df)
    assert(out.count() == 2)
    val us = out.filter(col("isin") === "US1").collect().head
    assert(us.getAs[Double]("pd") == 0.04) // odd-count median = middle value
    assert(us.getAs[String]("ticker_symbol") == "T1")
  }

  test("mergeEikonVintages: new wins per isin, ald_location from prefix") {
    val old = eikonDf(Seq(eikonRow("US1", "T1", 0.9), eikonRow("DE3", "T3", 0.03)))
    val neu = eikonDf(Seq(eikonRow("US1", "T1", 0.02)))
    val out = Datalake.mergeEikonVintages(old, neu).cache()
    assert(out.count() == 2)
    assert(out.filter(col("isin") === "US1").select("pd").as[Double].head() == 0.02)
    assert(out.filter(col("isin") === "DE3").select("ald_location").as[String].head() == "DE")
    assert(!out.columns.contains("ticker_symbol"))
  }

  test("prewrangleOwnershipTree: direction filter, NA stake=100, majority parent, ties kept once") {
    val df = Seq(
      // negative level = other direction -> dropped
      (10L, 1L, Some(60.0), -1),
      // level 1: two parents, 60 vs 40 -> parent 11
      (11L, 1L, Some(60.0), 1), (12L, 1L, Some(40.0), 1),
      // level 2: null stake -> 100 beats 80
      (13L, 1L, None, 2), (14L, 1L, Some(80.0), 2),
      // company 2: 50/50 tie -> exactly one survivor (lowest parent id)
      (15L, 2L, Some(50.0), 1), (16L, 2L, Some(50.0), 1))
      .map { case (t, c, s, l) => (t, c, s.map(Double.box).orNull, l) }
      .toDF("target_company_id", "company_id", "linking_stake", "ownership_level")
    val out = Datalake.prewrangleOwnershipTree(df).cache()
    assert(out.columns.toSet ==
      Set("parent_company_id", "subsidiary_company_id", "linking_stake", "ownership_level"))
    val c1 = out.filter(col("subsidiary_company_id") === 1).orderBy("ownership_level")
      .select("parent_company_id").as[Long].collect().toSeq
    assert(c1 == Seq(11L, 13L))
    val c2 = out.filter(col("subsidiary_company_id") === 2)
    assert(c2.count() == 1)
    assert(c2.select("parent_company_id").as[Long].head() == 15L)
  }

  test("enforceIsinConsistency: null-isin rows drop when a real isin exists; company set kept") {
    val ids = Seq(
      (1L, "US1", true), (1L, null, true),  // null row dropped
      (2L, null, true),                      // only row -> kept
      (3L, "FR3", true), (3L, "FR4", false)) // multiple isins fine
      .toDF("company_id", "isin", "trustworthy")
    val out = Datalake.enforceIsinConsistency(ids)
    assert(out.count() == 4)
    assert(out.filter(col("company_id") === 1 && col("isin").isNull).count() == 0)
    assert(out.filter(col("company_id") === 2).count() == 1)
  }

  test("enforceIsinConsistency rejects an isin shared across companies") {
    val ids = Seq((1L, "US1", true), (2L, "US1", true)).toDF("company_id", "isin", "trustworthy")
    intercept[graft.core.DataChecks.CheckFailed] {
      Datalake.enforceIsinConsistency(ids)
    }
  }

  test("attachAdditionalIsins: unknown isins fan over id attributes, trustworthy") {
    val ids = Seq((1L, "US1", "B1", true), (2L, null, "B2", true))
      .toDF("company_id", "isin", "bloomberg_id", "trustworthy")
    val extra = Seq((2L, "DE9"), (1L, "US1")).toDF("company_id", "isin") // US1 already known
    val out = Datalake.attachAdditionalIsins(ids, extra).cache()
    assert(out.count() == 3)
    val added = out.filter(col("isin") === "DE9").collect().head
    assert(added.getAs[String]("bloomberg_id") == "B2")
    assert(added.getAs[Boolean]("trustworthy"))
  }

  test("wrangleEikonOld: npm repair ladder, casts, isin filter") {
    def row(isin: String, csr: java.lang.Double, ltm: java.lang.Double) =
      (isin, "s", "RIC", "0.02", csr, ltm, "1.5", "0.2", "0.05", "Ind")
    val df = Seq(
      row("A1", -0.5, 0.3),   // csr<0, ltm plausible -> ltm
      row("A2", -0.5, -0.1),  // csr<0, ltm<0 -> 0
      row("A3", -0.5, 1.4),   // csr<0, ltm>1 -> 0
      row("A4", 1.5, 0.4),    // csr>1, ltm plausible -> ltm
      row("A5", 1.5, 1.2),    // csr>1, ltm>1 -> 1
      row("A6", 1.5, -0.2),   // csr>1, ltm<0 -> 1
      row("A7", 0.6, 0.9),    // csr trusted -> csr
      row("A8", null, 0.9),   // NA conditions skip -> csr (null)
      row(null, 0.6, 0.9))    // no isin -> dropped
      .toDF("isin", "structural", "identifier_ric", "x4",
        "credit_smart_ratios_net_profit_margin_percent_ltm_s_avg",
        "net_profit_margin_percent_0d_ltm_1_s_avg",
        "leverage_s_avg", "asset_volatility_s_avg", "asset_drift_s_avg",
        "gics_sub_industry_name")
    val out = Datalake.wrangleEikonOld(df).cache()
    assert(out.count() == 8)
    val npm = out.select("isin", "net_profit_margin").as[(String, Option[Double])]
      .collect().toMap
    assert(npm("A1").get == 0.3 && npm("A2").get == 0.0 && npm("A3").get == 0.0)
    assert(npm("A4").get == 0.4 && npm("A5").get == 1.0 && npm("A6").get == 1.0)
    assert(npm("A7").get == 0.6 && npm("A8").isEmpty)
    val a1 = out.filter(col("isin") === "A1").collect().head
    assert(a1.getAs[Double]("pd") == 0.02)
    assert(a1.getAs[String]("ticker_symbol") == "RIC")
  }

  test("wrangleEikonNew: percent -> fraction scaling") {
    val df = Seq(("US1", "T", "2.0", "11.0", "1.4", "20.0", "5.0", "Ind"))
      .toDF("isin", "ticker_symbol", "credit_structural_pd_percent",
        "net_profit_margin_percent", "credit_structural_leverage",
        "credit_structural_asset_volatility_percent",
        "credit_structural_asset_drift_percent", "trbc_industry_name")
    val r = Datalake.wrangleEikonNew(df).collect().head
    assert(r.getAs[Double]("pd") == 0.02)
    assert(r.getAs[Double]("net_profit_margin") == 0.11)
    assert(r.getAs[Double]("debt_equity_ratio") == 1.4)
    assert(r.getAs[Double]("volatility") == 0.2)
    assert(r.getAs[Double]("asset_drift") == 0.05)
  }

  test("makeAssetImpactDb: full join over the activity perimeter, Unknown dropped") {
    val info = Seq(
      (1L, "AlphaCo", true, "DE"),
      (2L, "Unknown", false, "FR"),      // placeholder -> dropped
      (3L, "GammaCo", true, "US"))       // no activities -> survives via full join
      .toDF("company_id", "company_name", "is_ultimate_parent", "country_of_domicile")
    val acts = Seq(
      (1L, "Power", "DE"), (1L, "Power", "DE"), // duplicate activity row collapses
      (1L, "Coal", "PL"),
      (2L, "Power", "FR"))
      .toDF("id", "ald_sector", "ald_location")
    val out = Datalake.makeAssetImpactDb(info, acts).cache()
    assert(out.filter(col("company_name") === "Unknown").count() == 0)
    assert(out.filter(col("company_id") === 1L).count() == 2) // two distinct perimeters
    val gamma = out.filter(col("company_id") === 3L).collect().head
    assert(gamma.isNullAt(gamma.fieldIndex("ald_sector")))
  }

  test("makeIdsDb: provider wins by company then isin; eikon-only isins appended") {
    val security = Seq(
      ("US1", "OldCo", 10L, "B1", "L1", 100L, 200L),
      ("US2", "KeptCo", 11L, "B2", "L2", 101L, 201L),
      ("US9", "DupIsinCo", 12L, "B3", "L3", 102L, 202L),
      (null.asInstanceOf[String], "NullIsinCo", 13L, "B4", "L4", 103L, 203L))
      .toDF("isin", "company_name", "company_id", "bloomberg_id",
        "legal_entity_id", "parent_company_id", "obligor_company_id")
    // consolidated shares (isin, company_name): the natural join keeps all
    val consolidated = Seq(
      ("US1", "OldCo", 5.0), ("US2", "KeptCo", 6.0), ("US9", "DupIsinCo", 7.0),
      (null.asInstanceOf[String], "NullIsinCo", 8.0))
      .toDF("isin", "company_name", "total_assets")
    // the provider sheet lists one row TWICE — the reference distinct()s it
    val providerSheet = Seq((10L, "OldCo", "US1"), (30L, "NewCo", "US9"),
      (30L, "NewCo", "US9"))
      .toDF("company_id", "company_name", "isin")
    val assetImpact = Seq(
      (10L, "OldCo", "DE"), (30L, "NewCo", "FR"),
      (31L, "NoIsinCo", "IT"))                     // absent from the sheet
      .toDF("company_id", "company_name", "country_of_domicile")
    val eikon = Seq(("US2", 0.1), ("ZZ7", 0.2)).toDF("isin", "pd")
    val out = Datalake.makeIdsDb(security, consolidated, providerSheet,
      assetImpact, eikon).cache()
    // company 10 superseded by the provider (anti by company_id);
    // US9 superseded (anti by isin); US2 survives from the archive
    assert(out.filter(col("company_id") === 12L).count() == 0)
    assert(out.filter(col("isin") === "US2" && col("company_id") === 11L).count() == 1)
    // provider rows present ONCE (sheet dup collapsed), incl. the
    // isin-less company
    assert(out.filter(col("company_id") === 30L && col("isin") === "US9").count() == 1)
    assert(out.filter(col("company_id") === 31L && col("isin").isNull).count() == 1)
    // dplyr na_matches="na": the archived null-isin row is superseded by
    // the provider's null isin (company 31), not kept
    assert(out.filter(col("company_id") === 13L).count() == 0)
    // eikon-only isin appended once, with no company id
    val zz = out.filter(col("isin") === "ZZ7").collect()
    assert(zz.length == 1 && zz.head.isNullAt(zz.head.fieldIndex("company_id")))
    // US1 appears exactly once (provider copy)
    assert(out.filter(col("isin") === "US1").count() == 1)
  }
}
