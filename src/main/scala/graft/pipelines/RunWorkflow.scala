package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Full-batch orchestrator — the Spark twin of data-raw/run_workflow.R's
  * sequential script. Each stage is a pure function over DataFrames; the
  * orchestrator wires them in reference order and caches the frames that
  * are consumed by more than one downstream stage (SURVEY §4.1: branch
  * reuse is free in eager R but recomputes the subtree in lazy Spark).
  */
object RunWorkflow {

  final case class Inputs(
      ngfsCarbonPriceWide: DataFrame,
      weoCapacityFactorsWide: DataFrame,
      fossilFuelPricesWide: DataFrame,
      powerLcoeWide: DataFrame,
      companyActivities: DataFrame,
      companyEmissions: DataFrame,
      eikonFinancials: DataFrame,
      companyIds: Option[DataFrame],
      ownershipTree: Option[DataFrame],
      startYear: Int = 2021,
      timeHorizon: Int = 5,
      sectorList: Seq[String] = Seq("Automotive", "Power", "Oil&Gas", "Coal"))

  final case class Outputs(
      carbonPrice: DataFrame,
      capacityFactors: DataFrame,
      prices: DataFrame,
      abcd: DataFrame,
      financial: DataFrame)

  def run(spark: SparkSession, in: Inputs): Outputs = {
    // stages 2-4 of run_workflow.R (scenario stage needs per-vintage raw
    // CSVs; its building blocks live in ScenarioData)
    val carbonPrice = CarbonPrice.prepareNgfsCarbonPrice(
      spark, in.ngfsCarbonPriceWide, in.startYear)
    val capacityFactors = CapacityFactors.prepareCapacityFactorsWeo2021(
      in.weoCapacityFactorsWide, in.startYear)
    val prices = Prices.preparePriceDataLongWeo2021(
      in.fossilFuelPricesWide, in.powerLcoeWide)

    // stage 7: abcd — consumed by the financial stage too -> cache
    val abcd = Abcd.prepareAbcdData(in.companyActivities, in.companyEmissions,
      in.startYear, in.timeHorizon, Nil, in.sectorList).cache()

    // stage 8: financials (isin -> company when an ids table is present)
    val financialInput = in.companyIds
      .map(ids => Financial.attachCompanyIds(in.eikonFinancials, ids))
      .getOrElse(in.eikonFinancials)
    val companies = in.companyActivities
      .select("company_id", "ald_sector", "ald_location").distinct()
    var financial = Financial.prepareFinancialData(spark, financialInput, companies,
      in.ownershipTree, minimumSampleSize = 50, minimumRatioSample = 1.0 / 3,
      allowedRangeNpm = (Double.NegativeInfinity, Double.PositiveInfinity))
    financial = Financial.restrictToAbcdCompanies(financial, abcd)

    Outputs(carbonPrice, capacityFactors, prices, abcd, financial)
  }
}
