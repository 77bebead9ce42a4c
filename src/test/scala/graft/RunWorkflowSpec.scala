package graft

import org.apache.spark.sql.functions._
import graft.pipelines.RunWorkflow

/** Whole-workflow smoke on synthetic + fixture inputs: all five outputs
  * materialize and satisfy their contracts in one run.
  */
class RunWorkflowSpec extends SparkTestBase {
  import spark.implicits._

  private def ngfsWide = {
    val base = Seq(("NGFS", "NZ2050", "World", "Price|Carbon", "US$2010/t CO2"))
      .toDF("Model", "Scenario", "Region", "Variable", "Unit")
    (2015 to 2100 by 5).zipWithIndex.foldLeft(base) { case (d, (y, i)) =>
      d.withColumn(y.toString, lit(5.0 * i))
    }
  }

  private def weoWide = Seq(
    ("WEO2020", "Capacity", "Power", "GW", "SDS", "World", "Coal", null: String, 100.0, 100.0),
    ("WEO2020", "Generation", "Power", "TWh", "SDS", "World", "Coal", null: String, 438.0, 613.2))
    .toDF("Source", "Indicator", "Sector", "Units", "Scenario", "ScenarioGeography",
      "Technology", "Sub_Technology", "2021", "2040")

  private def fossilWide = Seq(
    ("WEO2021", "Crude oil", "usd/barrel", "Global", "SDS", 100.0, 50.0))
    .toDF("source", "sector", "unit", "scenario_geography", "scenario", "2020", "2030")

  private def powerWide = Seq(
    ("WEO2021", "SDS", "EU", "Gas CCGT", "LCOE", "usd/MWh", 70.0, 50.0))
    .toDF("source", "scenario", "region", "technology", "indicator", "unit", "2020", "2030")

  private def gecoAutomotive = Seq(
    ("GECO2021", "CurPol", "World", "Automotive", "Electric", "# vehicles", "Sales", 2022, 1.0),
    ("GECO2021", "CurPol", "World", "Automotive", "Electric", "# vehicles", "Sales", 2024, 3.0),
    ("GECO2021", "CurPol", "World", "Automotive", "ICE", "# vehicles", "Sales", 2022, 9.0),
    ("GECO2021", "CurPol", "World", "Automotive", "ICE", "# vehicles", "Sales", 2024, 7.0))
    .toDF("source", "scenario", "scenario_geography", "sector", "technology",
      "units", "indicator", "year", "value")

  test("run: all outputs materialize with their invariants") {
    val activities = SyntheticData.companyActivities(spark, nCompanies = 20)
    val out = RunWorkflow.run(spark, RunWorkflow.Inputs(
      ngfsCarbonPriceWide = ngfsWide,
      weoCapacityFactorsWide = weoWide,
      fossilFuelPricesWide = fossilWide,
      powerLcoeWide = powerWide,
      companyActivities = activities,
      companyEmissions = SyntheticData.companyEmissions(spark, nCompanies = 20),
      eikonFinancials = SyntheticData.eikonFinancials(spark, nCompanies = 20),
      companyIds = None,
      ownershipTree = Some(SyntheticData.ownershipTree(spark, nCompanies = 20)),
      scenarios = Some(graft.pipelines.ScenarioData.ScenarioInputs(
        geco2023 = Some(gecoAutomotive
          .withColumn("source", lit("GECO2023")))) ),
      startYear = 2022, timeHorizon = 5))

    assert(out.carbonPrice.count() > 0)
    assert(out.capacityFactors.filter(col("capacity_factor") < 0 ||
      col("capacity_factor") > 1).count() == 0)
    assert(out.prices.filter(col("price").isNull || col("price") < 0).count() == 0)
    assert(out.abcd.count() > 0)
    // financial output restricted to abcd companies, nothing null
    val abcdCompanies = out.abcd.select("company_id").distinct().count()
    assert(out.financial.count() == abcdCompanies)
    assert(out.financial.filter(col("pd").isNull).count() == 0)
    // stage 1 merged scenario set present, and its automotive perimeter
    // surfaced as dummy unit prices in the price output
    val scen = out.scenariosAnalysisInput.get
    assert(scen.filter(col("scenario") === "GECO2023_CurPol").count() > 0)
    assert(out.prices.filter(col("unit") === "dummy" && col("price") === 1.0).count() > 0)
  }
}
