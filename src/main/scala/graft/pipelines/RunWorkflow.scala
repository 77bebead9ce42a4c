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
      scenarios: Option[ScenarioData.ScenarioInputs] = None,
      startYear: Int = 2021,
      timeHorizon: Int = 5,
      sectorList: Seq[String] = Seq("Automotive", "Power", "Oil&Gas", "Coal"))

  final case class Outputs(
      carbonPrice: DataFrame,
      capacityFactors: DataFrame,
      prices: DataFrame,
      abcd: DataFrame,
      financial: DataFrame,
      scenariosAnalysisInput: Option[DataFrame] = None)

  /** The st_inputs column convention: every runner renames
    * technology→ald_business_unit (and the price runner sector→ald_sector)
    * before writing (data-raw/run_prepare_price_data_long.R:357-358,
    * run_prepare_prewrangled_capacity_factors.R:187).
    */
  private def toStInputNames(df: DataFrame): DataFrame = {
    val renamed = df.withColumnRenamed("technology", "ald_business_unit")
    if (renamed.columns.contains("sector")) renamed.withColumnRenamed("sector", "ald_sector")
    else renamed
  }

  def run(spark: SparkSession, in: Inputs): Outputs = {
    // stage 1 of run_workflow.R: the multi-vintage scenario merge
    // (data-raw/run_prepare_Scenarios_AnalysisInput.R) when the per-vintage
    // raw frames are supplied
    // consumed by the automotive-price fan-out, the alignment rewrite AND
    // the caller's write — cache, or each consumer re-runs the full
    // multi-vintage merge (SURVEY §4.1: branch reuse is free in eager R,
    // recomputes the subtree in lazy Spark)
    val scenariosAnalysisInput = in.scenarios.map(s =>
      ScenarioData.prepareScenariosAnalysisInput(s, in.startYear).cache())

    // stages 2-4 of run_workflow.R
    val carbonPrice = CarbonPrice.prepareNgfsCarbonPrice(
      spark, in.ngfsCarbonPriceWide, in.startYear)
    val capacityFactors = CapacityFactors.prepareCapacityFactorsWeo2021(
      in.weoCapacityFactorsWide, in.startYear)
    var prices = Prices.preparePriceDataLongWeo2021(
      in.fossilFuelPricesWide, in.powerLcoeWide)
    // run_workflow.R price stage appends dummy automotive prices wherever
    // the merged scenario set has automotive rows (create_automotive_prices)
    for (scen <- scenariosAnalysisInput) {
      val auto = Prices.createAutomotivePrices(scen)
        .withColumn("source", lit("synthetic"))
        .withColumn("year", col("year").cast("int"))
        .withColumn("price", col("price").cast("double"))
      prices = prices.unionByName(auto.select(prices.columns.map(col): _*))
    }

    // stages 5-6 of run_workflow.R (:28-72): align the scenario, price and
    // capacity-factor frames to the perimeter complete across all three —
    // rewrite-as-new-frames, never in place (a lazy plan must not read a
    // path being overwritten). The st_inputs renames apply UNCONDITIONALLY
    // (the reference runners always rename before writing), so Outputs
    // carries one schema regardless of whether the scenario stage ran.
    var capacityFactorsOut = toStInputNames(capacityFactors)
    var pricesOut = toStInputNames(prices)
    var scenariosOut = scenariosAnalysisInput
    for (scen <- scenariosAnalysisInput) {
      val (alignedScen, alignedPrices, alignedCf) = Workflow.alignDatasets(
        scen, pricesOut, capacityFactorsOut)
      scenariosOut = Some(alignedScen)
      pricesOut = alignedPrices
      capacityFactorsOut = alignedCf
    }

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

    Outputs(carbonPrice, capacityFactorsOut, pricesOut, abcd, financial, scenariosOut)
  }
}
