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
}
