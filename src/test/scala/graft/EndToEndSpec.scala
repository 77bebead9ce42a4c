package graft

import org.apache.spark.sql.functions._
import graft.pipelines.{Abcd, Financial, Workflow}

/** The vignette flow (reference vignettes/examples.Rmd:30-83 +
  * gen_synthetic_workflow.R): generate synthetic company data, run
  * prepare_abcd_data and prepare_financial_data, check the reference's
  * output invariants. This is the pipeline-level integration test the
  * reference runs via its .rda fixtures.
  */
class EndToEndSpec extends SparkTestBase {

  private lazy val activities = SyntheticData.companyActivities(spark).cache()
  private lazy val emissions = SyntheticData.companyEmissions(spark).cache()

  test("abcd on synthetic data: invariants of the reference output contract") {
    val out = Abcd.prepareAbcdData(activities, emissions,
      startYear = 2022, timeHorizon = 5,
      sectorList = Seq("Automotive", "Power", "Oil&Gas", "Coal")).cache()
    assert(out.count() > 0)
    // production and EF are never null after the fill chain (reference :380-392)
    assert(out.filter(col("plan_tech_prod").isNull).count() == 0)
    assert(out.filter(col("plan_emission_factor").isNull).count() == 0)
    // no Inf/NaN emission factors survive (prod==0 -> EF forced to 0)
    assert(out.filter(isnan(col("plan_emission_factor")) ||
      col("plan_emission_factor") === Double.PositiveInfinity).count() == 0)
    // every (asset, year) has exactly the configured year span
    val yrs = out.select("year").distinct().collect().map(_.getInt(0)).sorted
    assert(yrs.toSeq == (2022 to 2027))
    // full-NA production keys were dropped (A7)
    val zeroProd = out.groupBy("asset_id", "ald_business_unit")
      .agg(sum("plan_tech_prod").as("s")).filter(col("s") === 0).count()
    assert(zeroProd == 0)
    // MWh production rows were folded into MW assets
    assert(out.filter(col("ald_production_unit") === "MWh").count() == 0)
  }

  test("financial on synthetic data: every production company covered, no nulls") {
    val financial = SyntheticData.eikonFinancials(spark)
    val companies = SyntheticData.companiesTable(spark, activities
      .select("company_id", "ald_sector", "ald_location"))
    val tree = SyntheticData.ownershipTree(spark)
    val out = Financial.prepareFinancialData(spark, financial, companies, Some(tree),
      minimumSampleSize = 1, minimumRatioSample = 0,
      allowedRangeNpm = (Double.NegativeInfinity, Double.PositiveInfinity)).cache()
    // one row per company, all companies from production present
    val expected = companies.select("company_id").distinct().count()
    assert(out.count() == expected)
    assert(out.select("company_id").distinct().count() == expected)
    // reference :600-603 — no nulls anywhere
    val anyNull = out.filter(out.columns.map(col(_).isNull).reduce(_ || _)).count()
    assert(anyNull == 0)
    // raw-data ratios are valid fractions
    for (c <- Seq("net_profit_margin_rawdata_ratio", "debt_equity_ratio_rawdata_ratio",
        "volatility_rawdata_ratio")) {
      assert(out.filter(col(c) < 0 || col(c) > 1).count() == 0)
    }
    // trisk-v2 projection works on the output
    assert(Workflow.triskV2FinancialFeatures(out).columns.length == 5)
  }
}
