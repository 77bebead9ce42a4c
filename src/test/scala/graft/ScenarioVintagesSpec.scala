package graft

import org.apache.spark.sql.functions._
import graft.pipelines.ScenarioData

/** Round-2 scenario vintages (reference R/prepare_scenario_data.R:262-1065):
  * WEO2023, GECO2023, NGFS Phase V, IPR2023 (+baselines), Oxford, steel.
  * Fixtures are hand-built to pin each vintage's distinctive constructs.
  */
class ScenarioVintagesSpec extends SparkTestBase {
  import spark.implicits._

  private val powerTechs =
    Seq("CoalCap", "GasCap", "HydroCap", "NuclearCap", "OilCap", "RenewablesCap")

  private def weoRow(source: String, scenario: String, geo: String, sector: String,
      tech: String, subTech: String, year: Int, pathway: Double) =
    (source, geo, scenario, sector, tech, subTech, "Capacity", "GW", year,
      pathway, 0.1, 0.2, "increasing", 0.5)

  test("prepareScenarioDataWeo23: rename/prefix, sub-tech renewables filter, completeness") {
    val complete = powerTechs.map(t =>
      weoRow("WEO2023", "STEPS", "Global", "Power", t, null, 2030, 7.0))
    // RenewablesCap with a non-null sub-technology -> dropped (double count guard)
    val subTech = Seq(weoRow("WEO2023", "STEPS", "Global", "Power", "RenewablesCap", "Solar", 2030, 1.0))
    // incomplete perimeter: one of six power techs
    val incomplete = Seq(weoRow("WEO2023", "STEPS", "Asia", "Power", "CoalCap", null, 2030, 2.0))
    val df = (complete ++ subTech ++ incomplete)
      .toDF("Source", "ScenarioGeography", "Scenario", "Sector", "Technology", "Sub_Technology",
        "Indicator", "Units", "Year", "scenario_pathway", "techFSRatio", "mktFSRatio",
        "Direction", "FairSharePerc")
    val out = ScenarioData.prepareScenarioDataWeo23(df)
    assert(out.count() == 6)
    assert(out.select("scenario").distinct().as[String].head() == "WEO2023_STEPS")
    assert(out.columns.contains("scenario_pathway"))
    assert(!out.columns.contains("scenario_source"))
    assert(out.select("scenario_geography").distinct().as[String].collect().toSet == Set("Global"))
  }

  test("prepareGeco2023: prefix + World->Global, no sector pruning") {
    val df = Seq(
      weoRow("GECO2023", "Reference", "World", "Automotive", "Electric", null, 2030, 3.0),
      weoRow("GECO2023", "Reference", "EU", "Automotive", "ICE", null, 2030, 5.0))
      .toDF("Source", "ScenarioGeography", "Scenario", "Sector", "Technology", "Sub_Technology",
        "Indicator", "Units", "Year", "scenario_pathway", "techFSRatio", "mktFSRatio",
        "Direction", "FairSharePerc")
    val out = ScenarioData.prepareGeco2023(df)
    assert(out.select("scenario").distinct().as[String].head() == "GECO2023_Reference")
    assert(out.select("scenario_geography").as[String].collect().toSet == Set("Global", "EU"))
    assert(out.count() == 2) // no completeness pruning in GECO2023
  }

  test("preprepareNgfsScenarioDataV5: variable filter, Phase-V models, indicator, unite") {
    val df = Seq(
      // Secondary Energy rows are dropped (capacity trajectory selected)
      ("REMIND-MAgPIE 3.3-4.8", "Net Zero 2050", "World", "Secondary Energy|Electricity|Coal",
        "a", "Electricity", "Coal", "EJ", 2030, 9.0),
      ("REMIND-MAgPIE 3.3-4.8", "Net Zero 2050", "World", "Capacity|Electricity|Solar",
        "a", "Electricity", "Solar", "GW", 2030, 1.5),
      ("REMIND-MAgPIE 3.3-4.8", "Net Zero 2050", "World", "Capacity|Electricity|Wind",
        "a", "Electricity", "Wind", "GW", 2030, 2.5),
      ("MESSAGEix-GLOBIOM 2.0-M-R12-NGFS", "Low demand", "World", "Primary Energy|Oil",
        "a", "Oil", "Oil", "EJ", 2030, 4.0))
      .toDF("Model", "Scenario", "Region", "Variable", "category_a", "category_b",
        "category_c", "Unit", "year", "value")
    val out = ScenarioData.preprepareNgfsScenarioDataV5(df)
    val scenarios = out.select("scenario").distinct().as[String].collect().toSet
    assert(scenarios == Set("NGFS2024REMIND_NZ2050", "NGFS2024MESSAGE_LD"))
    val renew = out.filter(col("technology") === "RenewablesCap")
    assert(renew.count() == 1)
    assert(renew.select("value").as[Double].head() == 4.0) // solar+wind summed
    assert(renew.select("indicator").as[String].head() == "Capacity")
    assert(out.filter(col("technology") === "Oil")
      .select("indicator").as[String].head() == "Production")
    // the Secondary Energy row never survives
    assert(out.count() == 2)
  }

  private def iprRow(scenario: String, sector: String, vc: String, svc1: String, svc2: String,
      year: Int, value: Double) =
    (scenario, "WORLD", "Units X", sector, vc, svc1, svc2, year, value)

  private def iprDf(rows: Seq[(String, String, String, String, String, String, String, Int, Double)]) =
    rows.toDF("Scenario", "Region", "Units", "Sector", "Variable_class",
      "Sub_variable_class_1", "Sub_variable_class_2", "year", "value")

  test("prepareIprScenarioData2023: tech synthesis, renewables re-agg, shares, horizon") {
    val rows = Seq(
      // Power sector: technology = svc2_Power
      iprRow("FPS", "Power", "Cap", "x", "Coal", 2025, 10.0),
      iprRow("FPS", "Power", "Cap", "x", "Coal", 2030, 5.0),
      iprRow("FPS", "Power", "Cap", "x", "Solar", 2025, 2.0),
      iprRow("FPS", "Power", "Cap", "x", "Solar", 2030, 6.0),
      iprRow("FPS", "Power", "Cap", "x", "Offshore wind", 2025, 1.0),
      iprRow("FPS", "Power", "Cap", "x", "Offshore wind", 2030, 3.0),
      // Transport: technology = svc2 -> BEV -> Electric -> Automotive
      iprRow("FPS", "Transport", "Sales", "x", "BEV", 2025, 1.0),
      iprRow("FPS", "Transport", "Sales", "x", "BEV", 2030, 2.0),
      // horizon cap: automotive at 2042+ dropped
      iprRow("FPS", "Transport", "Sales", "x", "BEV", 2045, 9.0),
      // unmatched tech (hydrogen) -> null sector -> dropped
      iprRow("FPS", "Power", "Cap", "x", "Hydrogen", 2025, 7.0),
      // other sector: technology = svc1
      iprRow("RPS", "Fossil", "Supply", "Natural gas", "y", 2025, 8.0),
      iprRow("RPS", "Fossil", "Supply", "Natural gas", "y", 2030, 4.0))
    val out = ScenarioData.prepareIprScenarioData2023(iprDf(rows), startYear = 2025)
    // scenario split: FPS non-auto vs FPS auto
    val scen = out.select("scenario").distinct().as[String].collect().toSet
    assert(scen == Set("IPR2023_FPS", "IPR2023Automotive_FPS", "IPR2023_RPS"))
    // renewables re-agg: Solar+OffWind merged, sources gone
    val renew = out.filter(col("technology") === "RenewablesCap").orderBy("year")
      .select("scenario_pathway").as[Double].collect()
    assert(renew.toSeq == Seq(3.0, 9.0))
    assert(out.filter(col("technology").isin("SolarCap", "OffWindCap")).count() == 0)
    // declining tech carries tmsr: CoalCap 2030 = (5-10)/10
    val coal2030 = out.filter(col("technology") === "CoalCap" && col("year") === 2030)
      .select("fair_share_perc").as[Double].head()
    assert(math.abs(coal2030 - (-0.5)) < 1e-12)
    // increasing tech carries smsp: RenewablesCap 2030 = (9-3)/first sector total
    // sector total 2025 (Power, after re-agg): 10 + 3 = 13
    val renew2030 = out.filter(col("technology") === "RenewablesCap" && col("year") === 2030)
      .select("fair_share_perc").as[Double].head()
    assert(math.abs(renew2030 - (9.0 - 3.0) / 13.0) < 1e-12)
    // horizon: no automotive rows at 2042+
    assert(out.filter(col("ald_sector") === "Automotive" && col("year") >= 2042).count() == 0)
    assert(out.filter(col("technology") === "Gas").count() == 2)
    assert(out.select("scenario_geography").distinct().as[String].head() == "Global")
  }

  test("IPR baselines: WEO STEPS and GECO CurPol relabelled") {
    val weo = Seq(("WEO2021_STEPS", "Global", 2030, 1.0), ("WEO2021_SDS", "Global", 2030, 2.0))
      .toDF("scenario", "scenario_geography", "year", "fair_share_perc")
    val base = ScenarioData.prepareIprBaselineScenario(weo)
    assert(base.select("scenario").distinct().as[String].head() == "IPR2023_baseline")
    assert(base.count() == 1)

    val geco = Seq(
      weoRow("GECO2021", "CurPol", "Global", "Automotive", "Electric", null, 2030, 3.0),
      weoRow("GECO2021", "CurPol", "Global", "Power", "CoalCap", null, 2030, 4.0), // non-auto dropped
      weoRow("GECO2021", "NDC-LTS", "Global", "Automotive", "ICE", null, 2030, 5.0))
      .toDF("Source", "ScenarioGeography", "Scenario", "Sector", "Technology", "Sub_Technology",
        "Indicator", "Units", "Year", "scenario_pathway", "techFSRatio", "mktFSRatio",
        "Direction", "FairSharePerc")
    val auto = ScenarioData.prepareIprBaselineScenarioAutomotive(geco)
    assert(auto.select("scenario").distinct().as[String].head() == "IPR2023Automotive_baseline")
    assert(auto.count() == 1)
    assert(auto.select("ald_sector").as[String].head() == "Automotive")
  }

  test("prepareOxfScenarioData: separate+recode cascade, renewables, OilCap clone") {
    def row(energy: String, year: Int, value: Double) =
      (energy, "Oxford2021_base", "Global", "EJ", year, value)
    val rows = Seq(
      row("coal_electricity", 2021, 10.0), row("coal_electricity", 2030, 4.0),
      row("gas_electricity", 2021, 8.0), row("gas_electricity", 2030, 6.0),
      row("wind_electricity", 2021, 2.0), row("wind_electricity", 2030, 7.0),
      row("solar_electricity", 2021, 1.0), row("solar_electricity", 2030, 5.0),
      row("coal_final", 2021, 20.0), row("coal_final", 2030, 12.0),
      row("oil_final", 2021, 30.0), row("oil_final", 2030, 25.0),
      row("hydrogen", 2021, 99.0), // filtered
      row("batteries_ST_transport", 2021, 99.0)) // filtered
    val df = rows.toDF("Annual energy", "scenario", "scenario_geography", "units", "year", "value")
    val out = ScenarioData.prepareOxfScenarioData(df, startYear = 2021).cache()
    // cascade: coal_electricity -> Power/CoalCap; coal_final -> Coal/Coal;
    // oil_final -> Oil&Gas/Oil
    assert(out.filter(col("technology") === "CoalCap" && col("ald_sector") === "Power").count() == 2)
    assert(out.filter(col("technology") === "Coal" && col("ald_sector") === "Coal").count() == 2)
    assert(out.filter(col("technology") === "Oil" && col("ald_sector") === "Oil&Gas").count() == 2)
    // wind+solar merged into RenewablesCap (2+1=3 at 2021, 7+5=12 at 2030)
    val renew = out.filter(col("technology") === "RenewablesCap").orderBy("year")
      .select("value").as[Double].collect()
    assert(renew.toSeq == Seq(3.0, 12.0))
    assert(out.filter(col("technology").isin("WindCap", "SolarCap")).count() == 0)
    // OilCap cloned from GasCap with identical fair shares
    val gas = out.filter(col("technology") === "GasCap" && col("year") === 2030)
      .select("fair_share_perc").as[Double].head()
    val oil = out.filter(col("technology") === "OilCap" && col("year") === 2030)
      .select("fair_share_perc").as[Double].head()
    assert(gas == oil)
    // GasCap declining -> tmsr = (6-8)/8
    assert(math.abs(gas - (-0.25)) < 1e-12)
    // RenewablesCap increasing -> smsp vs 2021 Power sector total (10+8+3=21)
    val rfs = out.filter(col("technology") === "RenewablesCap" && col("year") === 2030)
      .select("fair_share_perc").as[Double].head()
    assert(math.abs(rfs - (12.0 - 3.0) / 21.0) < 1e-12)
    // filtered energies never surface
    assert(out.filter(col("value") === 99.0).count() == 0)
    assert(out.columns.toSeq.contains("value")) // OXF keeps `value` (no rename)
  }

  test("prepareSteelScenarioData: cross grid, fan-outs, trailing zeros, 2026 anchor, tmsr") {
    def row(scenario: String, tech: String, year: Int, v: java.lang.Double) =
      (scenario, tech, year, v)
    val rows = Seq(
      row("Baseline", "Avg BF-BOF", 2025, 100.0), row("Baseline", "Avg BF-BOF", 2030, 60.0),
      // EAF present through 2030
      row("Baseline", "EAF", 2025, 50.0), row("Baseline", "EAF", 2030, 80.0),
      // DRI-Melt-BOF starts at 2026 (leading null at 2025 anchored to 2026)
      row("Baseline", "DRI-Melt-BOF", 2026, 10.0), row("Baseline", "DRI-Melt-BOF", 2030, 30.0),
      row("Baseline", "DRI-EAF", 2025, 5.0), row("Baseline", "DRI-EAF", 2030, 15.0),
      // irrelevant technology and scenario -> filtered
      row("Baseline", "Scrap", 2025, 9.0),
      row("High Demand", "EAF", 2025, 9.0))
    val df = rows.toDF("scenario", "technology", "year", "Production (Mt)")
    val out = graft.pipelines.ScenarioData
      .prepareSteelScenarioData(df, startYear = 2025, maxYear = 2030).cache()
    // only the two named scenarios, renamed
    assert(out.select("scenario").distinct().as[String].collect().toSet == Set("Steel_baseline"))
    // technologies: BF-BOF, DRI-BOF, EAF, DRI-EAF + BF-EAF + BOF + BF-OHF
    val techs = out.select("technology").distinct().as[String].collect().toSet
    assert(techs == Set("BF-BOF", "DRI-BOF", "EAF", "DRI-EAF", "BF-EAF", "BOF", "BF-OHF"))
    // cross grid: every tech covers 2025..2030
    val yearsPerTech = out.groupBy("technology").count().select("count").as[Long].collect()
    assert(yearsPerTech.forall(_ == 6))
    // 2026 anchor: DRI-BOF 2025 = its 2026 value
    val dri2025 = out.filter(col("technology") === "DRI-BOF" && col("year") === 2025)
      .select("scenario_pathway").as[Double].head()
    assert(dri2025 == 10.0)
    // interior gap years stay null (no interpolation in this vintage)
    val bfbof2026 = out.filter(col("technology") === "BF-BOF" && col("year") === 2026)
      .select(col("scenario_pathway")).collect().head
    assert(bfbof2026.isNullAt(0))
    // fan-out clones carry the source values: BOF 2025 = BF-BOF 2025
    val bof2025 = out.filter(col("technology") === "BOF" && col("year") === 2025)
      .select("scenario_pathway").as[Double].head()
    assert(bof2025 == 100.0)
    // tmsr-only: declining direction everywhere, fair share = (v - first)/first
    assert(out.select("direction").distinct().as[String].head() == "declining")
    val eaf2030 = out.filter(col("technology") === "EAF" && col("year") === 2030)
      .select("fair_share_perc").as[Double].head()
    assert(math.abs(eaf2030 - (80.0 - 50.0) / 50.0) < 1e-12)
    assert(out.select("units").distinct().as[String].head() == "Mt/yr")
  }
}
