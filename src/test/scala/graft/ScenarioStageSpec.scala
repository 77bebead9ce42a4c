package graft

import org.apache.spark.sql.functions._
import graft.pipelines.ScenarioData
import graft.pipelines.ScenarioData.ScenarioInputs

/** The full multi-vintage scenario stage
  * (data-raw/run_prepare_Scenarios_AnalysisInput.R end-to-end): each
  * vintage flows through its own pipeline, the frames union-dedup into one
  * Scenarios_AnalysisInput with scenario_type and ald_business_unit.
  */
class ScenarioStageSpec extends SparkTestBase {
  import spark.implicits._

  private val powerTechs =
    Seq("CoalCap", "GasCap", "HydroCap", "NuclearCap", "OilCap", "RenewablesCap")

  /** Long P4I-style frame covering a complete Power sector for `scen`. */
  private def longVintage(source: String, scen: String) =
    powerTechs.flatMap { t =>
      Seq(
        (source, scen, "Global", "Power", t, "GW", "Capacity", 2021, 10.0),
        (source, scen, "Global", "Power", t, "GW", "Capacity", 2023, 16.0))
    }.toDF("source", "scenario", "scenario_geography", "sector", "technology",
      "units", "indicator", "year", "value")

  private def gecoAutomotive(source: String, scen: String) =
    Seq(
      (source, scen, "World", "Automotive", "Electric", "# vehicles", "Sales", 2021, 1.0),
      (source, scen, "World", "Automotive", "Electric", "# vehicles", "Sales", 2023, 3.0),
      (source, scen, "World", "Automotive", "ICE", "# vehicles", "Sales", 2021, 9.0),
      (source, scen, "World", "Automotive", "ICE", "# vehicles", "Sales", 2023, 7.0))
      .toDF("source", "scenario", "scenario_geography", "sector", "technology",
        "units", "indicator", "year", "value")

  private def ngfsRaw = Seq(
    ("GCAM 6.0 NGFS", "Net Zero 2050", "World", "V", "a", "Electricity", "Solar", "EJ", 2021, 1.0),
    ("GCAM 6.0 NGFS", "Net Zero 2050", "World", "V", "a", "Electricity", "Solar", "EJ", 2023, 2.0),
    ("GCAM 6.0 NGFS", "Net Zero 2050", "World", "V", "a", "Oil", "Oil", "EJ", 2021, 4.0),
    ("GCAM 6.0 NGFS", "Net Zero 2050", "World", "V", "a", "Oil", "Oil", "EJ", 2023, 3.0))
    .toDF("Model", "Scenario", "Region", "Variable", "category_a", "category_b",
      "category_c", "Unit", "year", "value")

  private def steelRaw = Seq(
    ("Baseline", "Avg BF-BOF", 2021, 100.0), ("Baseline", "Avg BF-BOF", 2030, 60.0),
    ("Baseline", "EAF", 2021, 50.0), ("Baseline", "EAF", 2030, 80.0),
    ("Baseline", "DRI-Melt-BOF", 2026, 10.0), ("Baseline", "DRI-Melt-BOF", 2030, 30.0),
    ("Baseline", "DRI-EAF", 2021, 5.0), ("Baseline", "DRI-EAF", 2030, 15.0))
    .toDF("scenario", "technology", "year", "Production (Mt)")

  private def iprRaw = Seq(
    ("FPS", "WORLD", "GW", "Power", "Cap", "x", "Coal", 2021, 10.0),
    ("FPS", "WORLD", "GW", "Power", "Cap", "x", "Coal", 2023, 5.0),
    ("FPS", "WORLD", "GW", "Power", "Cap", "x", "Solar", 2021, 2.0),
    ("FPS", "WORLD", "GW", "Power", "Cap", "x", "Solar", 2023, 6.0))
    .toDF("Scenario", "Region", "Units", "Sector", "Variable_class",
      "Sub_variable_class_1", "Sub_variable_class_2", "year", "value")

  test("prepareScenariosAnalysisInput merges vintages with types and renames") {
    val out = ScenarioData.prepareScenariosAnalysisInput(
      ScenarioInputs(
        weoGeco = Some(longVintage("WEO2021", "STEPS")
          .unionByName(longVintage("WEO2021", "SDS"))),
        geco2021 = Some(gecoAutomotive("GECO2021", "CurPol")),
        geco2023 = Some(gecoAutomotive("GECO2023", "CurPol")),
        ngfsPhase4 = Some(ngfsRaw),
        ipr = Some(iprRaw),
        steel = Some(steelRaw)),
      startYear = 2021).cache()

    val scen = out.select("scenario", "scenario_type").distinct()
      .as[(String, String)].collect().toMap
    // one scenario from every vintage, each typed from the reference lists
    assert(scen("WEO2021_STEPS") == "baseline")
    assert(scen("WEO2021_SDS") == "shock")
    assert(scen("GECO2023_CurPol") == "baseline")
    assert(scen("NGFS2023GCAM_NZ2050") == "shock")
    assert(scen("IPR2023_FPS") == "shock")
    assert(scen("IPR2023_baseline") == "baseline")          // from WEO STEPS relabel
    assert(scen("IPR2023Automotive_baseline") == "baseline") // from GECO2021 CurPol
    assert(scen("Steel_baseline") == "baseline")
    // no orphans by construction; rename applied
    assert(out.columns.contains("ald_business_unit"))
    assert(!out.columns.contains("technology"))
    assert(out.filter(col("scenario_type").isNull).count() == 0)
    // interpolation ran: the 2022 grid year exists for the WEO vintage
    assert(out.filter(col("scenario") === "WEO2021_STEPS" && col("year") === 2022).count() > 0)
    // IPR nulls coalesced
    assert(out.filter(col("scenario").startsWith("IPR") &&
      col("fair_share_perc").isNull).count() == 0)
  }

  test("prepareScenariosAnalysisInput rejects unclassified scenarios") {
    intercept[graft.core.DataChecks.CheckFailed] {
      ScenarioData.prepareScenariosAnalysisInput(
        ScenarioInputs(weoGeco = Some(longVintage("WEO2021", "Mystery"))),
        startYear = 2021)
    }
  }
}
