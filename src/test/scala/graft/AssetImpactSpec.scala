package graft

import org.apache.spark.sql.functions._
import graft.pipelines.AssetImpact

/** Asset-impact cleanup stage (reference R/prepare_asset_impact_data.R:
  * 47-244) over AR-shaped synthetic input, end-to-end.
  */
class AssetImpactSpec extends SparkTestBase {
  import spark.implicits._

  private def arRow(id: String, name: String, sector: String, tech: String,
      techType: String, loc: String, unit: String,
      eo2030: java.lang.Double, eo2031: java.lang.Double) =
    (id, name, sector, tech, techType, "Region X", loc, unit, eo2030, eo2031)

  private def arDf(rows: Seq[(String, String, String, String, String, String, String,
      String, java.lang.Double, java.lang.Double)]) =
    rows.toDF("company_id", "company_name", "ald_sector", "technology", "technology_type",
      "region", "ald_location", "activity_unit", "Equity Ownership 2030",
      "Equity Ownership 2031")

  test("renameTechnology: fuel/vehicle recodes and the steel matrix") {
    val df = arDf(Seq(
      arRow("C1", "A", "Coal", "Lignite", "t", "US", "t", 1.0, 1.0),
      arRow("C1", "A", "Oil&Gas", "Natural Gas Liquids", "t", "US", "t", 1.0, 1.0),
      arRow("C1", "A", "LDV", "ICE Diesel", "t", "US", "t", 1.0, 1.0),
      arRow("C1", "A", "LDV", "Hybrid Plug-In", "t", "US", "t", 1.0, 1.0),
      arRow("C1", "A", "Steel", "Basic Oxygen Furnace", "Integrated Blast Furnace", "US", "t", 1.0, 1.0),
      arRow("C1", "A", "Steel", "Electric Arc Furnace", "Mini-Mill", "US", "t", 1.0, 1.0)))
    val out = AssetImpact.renameTechnology(df)
      .select("technology").as[String].collect().toSeq
    assert(out == Seq("Coal", "Gas", "ICE", "Hybrid", "BOF-BF", "EAF-MM"))
  }

  test("renameAldSector: LDV->Automotive, fuel-led realignment") {
    val df = arDf(Seq(
      arRow("C1", "A", "LDV", "ICE", "t", "US", "t", 1.0, 1.0),
      arRow("C1", "A", "Upstream", "Gas", "t", "US", "t", 1.0, 1.0),
      arRow("C1", "A", "Coal Mining", "Coal", "t", "US", "t", 1.0, 1.0)))
    val out = AssetImpact.renameAldSector(df)
      .select("ald_sector").as[String].collect().toSeq
    assert(out == Seq("Automotive", "Oil&Gas", "Coal"))
  }

  test("aggregateOverTechnologyTypes: sum-or-all-null over the ownership block") {
    val df = arDf(Seq(
      arRow("C1", "A", "Power", "GasCap", "CCGT", "US", "MW", 10.0, null),
      arRow("C1", "A", "Power", "GasCap", "OCGT", "US", "MW", 5.0, null),
      arRow("C2", "B", "Power", "CoalCap", "Sub", "US", "MW", null, null)))
    val out = AssetImpact.aggregateOverTechnologyTypes(df).cache()
    assert(!out.columns.contains("technology_type"))
    val c1 = out.filter(col("company_id") === "C1").collect().head
    assert(c1.getAs[Double]("Equity Ownership 2030") == 15.0)
    assert(c1.isNullAt(c1.fieldIndex("Equity Ownership 2031"))) // all-null stays null
    val c2 = out.filter(col("company_id") === "C2").collect().head
    assert(c2.isNullAt(c2.fieldIndex("Equity Ownership 2030")))
  }

  test("filterCountriesCoverage: HQ and asset filters compose") {
    val ar = arDf(Seq(
      arRow("C1", "A", "Power", "GasCap", "t", "DE", "MW", 1.0, 1.0),
      arRow("C1", "A", "Power", "GasCap", "t", "FR", "MW", 1.0, 1.0),
      arRow("C2", "B", "Power", "GasCap", "t", "DE", "MW", 1.0, 1.0)))
    val info = Seq(("C1", "DE", true), ("C2", "US", true), ("C3", "DE", false))
      .toDF("company_id", "ald_location", "is_ultimate_parent")
    // no filters -> untouched
    assert(AssetImpact.filterCountriesCoverage(ar, info).count() == 3)
    assert(AssetImpact.filterCountriesCoverage(ar, info, Seq("DE")).count() == 3)
    // HQ filter: only C1 (C3 is not ultimate parent, C2 HQ in US)
    assert(AssetImpact.filterCountriesCoverage(ar, info, Seq("DE"),
      filterHqs = true).count() == 2)
    // asset filter: DE assets regardless of HQ
    assert(AssetImpact.filterCountriesCoverage(ar, info, Seq("DE"),
      filterAssets = true).count() == 2)
    // both: C1's DE asset only
    assert(AssetImpact.filterCountriesCoverage(ar, info, Seq("DE"),
      filterHqs = true, filterAssets = true).count() == 1)
  }

  test("prepareAssetImpactData end-to-end: chain, emissions unit filter, final shape") {
    val activities = arDf(Seq(
      arRow("C1", "A", "LDV", "ICE Diesel", "small", "US", "vehicles", 10.0, 12.0),
      arRow("C1", "A", "LDV", "ICE Gasoline", "small", "US", "vehicles", 5.0, null),
      arRow("C2", "Unknown Owner", "LDV", "ICE Diesel", "small", "US", "vehicles", 7.0, 7.0)))
    val emissions = arDf(Seq(
      arRow("C1", "A", "LDV", "ICE Diesel", "small", "US", "tCO2", 100.0, 110.0),
      arRow("C1", "A", "LDV", "ICE Diesel", "small", "US", "proportion", 0.5, 0.5)))
    val (acts, ems) = AssetImpact.prepareAssetImpactData(activities, emissions)
    // unknown owner dropped; ICE variants merged into one row
    assert(acts.count() == 1)
    val a = acts.collect().head
    assert(a.getAs[String]("ald_business_unit") == "ICE")
    assert(a.getAs[String]("ald_sector") == "Automotive")
    assert(a.getAs[Double]("Equity Ownership 2030") == 15.0)
    assert(a.getAs[Double]("Equity Ownership 2031") == 12.0) // null skipped, not null result
    assert(!acts.columns.contains("region"))
    assert(!acts.columns.contains("technology_type"))
    // proportion emissions dropped
    assert(ems.count() == 1)
    assert(ems.select("activity_unit").as[String].head() == "tCO2")
  }
}
