package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.DataChecks
import graft.ops.{Regression, Reshape, TimeSeries}

/** Price pipeline — Spark re-expression of prepare_price_data_long_WEO2021
  * and the LCOE price adjustment (reference R/prepare_price_data_long.R:
  * 12-233, R/prepare_LCOE_adjusted_price_data.R:18-71,160-258).
  */
object Prices {

  private val keyCols = Seq("source", "scenario", "scenario_geography", "sector",
    "technology", "indicator", "unit")

  /** reference :12-233. Fossil-fuel and power (LCOE) wide frames to one
    * long price table: unit conversion, technology recodes, global =
    * mean over regions, placeholder technologies, fill-down, completion
    * and interpolation, with the reference's hard assertions (no NA,
    * price >= 0).
    */
  def preparePriceDataLongWeo2021(fossilWide: DataFrame, powerWide: DataFrame): DataFrame = {
    val firstYear = 2020

    // ---- fossil fuels (reference :17-95) -------------------------------
    DataChecks.requireColumns(fossilWide,
      Seq("source", "sector", "unit", "scenario_geography", "scenario"))
    var fossil = Reshape.unpivotYears(fossilWide,
        Seq("source", "sector", "unit", "scenario_geography", "scenario"), "price")
      .filter(col("year") >= firstYear)
      .withColumn("price",
        when(col("unit") === "usd/barrel", col("price") * 0.16)
          .when(col("unit") === "usd/Mbtu", col("price") * 0.9478171203)
          .otherwise(col("price")))
      .withColumn("unit",
        when(col("unit").isin("usd/barrel", "usd/Mbtu"), "GJ").otherwise(col("unit")))
      .withColumnRenamed("sector", "technology")
    fossil = Reshape.recodeValues(fossil, "technology",
        Map("Crude oil" -> "Oil", "IEA crude oil" -> "Oil", "Natural gas" -> "Gas"))
      .withColumn("sector", when(col("technology") === "Coal", "Coal").otherwise("Oil&Gas"))
      .withColumn("indicator", lit("price"))
    val fossilGlobal = fossil
      .filter(col("technology").isin("Gas", "Coal"))
      .groupBy("source", "scenario", "sector", "technology", "year", "unit", "indicator")
      .agg(avg(col("price")).as("price"))
      .withColumn("scenario_geography", lit("Global"))
    fossil = fossil.unionByName(fossilGlobal.select(fossil.columns.map(col): _*))

    // ---- power / LCOE (reference :97-189) ------------------------------
    DataChecks.requireColumns(powerWide,
      Seq("source", "scenario", "region", "technology", "indicator", "unit"))
    var power = Reshape.unpivotYears(powerWide,
        Seq("source", "scenario", "region", "technology", "indicator", "unit"), "price")
      .filter(col("year") >= firstYear && col("indicator") === "LCOE")
      .withColumnRenamed("region", "scenario_geography")
      .withColumn("technology",
        when(col("technology") === "Nuclear", "NuclearCap")
          .when(col("technology") === "Coal", "CoalCap")
          .when(col("technology") === "Gas CCGT", "GasCap")
          .otherwise("RenewablesCap"))
      .withColumn("sector", lit("Power"))
      .groupBy((keyCols :+ "year").map(col): _*)
      .agg(avg(col("price")).as("price")) // multiple wind/solar rows -> one
    // placeholder OilCap/HydroCap from GasCap/RenewablesCap (reference :144-158)
    val placeholders = power
      .filter(col("technology").isin("GasCap", "RenewablesCap"))
      .withColumn("technology",
        when(col("technology") === "GasCap", "OilCap").otherwise("HydroCap"))
    power = power.unionByName(placeholders)
    power = TimeSeries.fillDown(power, keyCols.filterNot(_ == "year"), "year", "price", "price")
    val powerGlobal = power
      .groupBy("source", "scenario", "year", "sector", "technology", "unit", "indicator")
      .agg(avg(col("price")).as("price"))
      .withColumn("scenario_geography", lit("Global"))
    power = power.unionByName(powerGlobal.select(power.columns.map(col): _*))

    // ---- union + complete + interpolate (reference :190-231) -----------
    var data = fossil.unionByName(power.select(fossil.columns.map(col): _*))
    data = TimeSeries.completeGridGlobalRange(data, keyCols, "year")
    data = TimeSeries.naApprox(data, keyCols, "year", "price", "price")

    DataChecks.assertNoNull(data, Seq("price"))
    DataChecks.assertBetween(data, "price", 0.0, Double.MaxValue)
    data.select((keyCols :+ "year" :+ "price").map(col): _*)
  }

  /** reference R/prepare_LCOE_adjusted_price_data.R:18-71 — derive implied
    * market prices from LCOE by adding the start-year profit margin scaled
    * by the cost factor lcoe_t0 / lcoe_t.
    */
  def lcoeAdjustedPrices(input: DataFrame, averageNpmPower: Double, startYear: Int): DataFrame = {
    val unadjusted = input.filter(col("year") >= startYear)
    val lcoe = unadjusted.filter(col("sector") === "Power" && col("indicator") === "LCOE")
    val implied = lcoe.filter(col("year") === startYear)
      .withColumn("implied_price", col("price") / (1 - averageNpmPower))
      .select("source", "scenario", "scenario_geography", "sector", "technology",
        "unit", "implied_price")
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("year"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withFactor = lcoe.withColumn("cost_factor",
      first(col("price")).over(w) / col("price"))
    val adjusted = withFactor
      .join(broadcast(implied),
        Seq("source", "scenario", "scenario_geography", "sector", "technology", "unit"))
      .withColumn("price", col("implied_price") * col("cost_factor"))
      .withColumn("indicator", lit("price"))
      .select(input.columns.map(col): _*)
    adjusted.unionByName(
      unadjusted.filter(!(col("sector") === "Power" && col("indicator") === "LCOE")))
  }

  /** reference R/prepare_LCOE_adjusted_price_data.R:171-205 — extend the
    * year axis to `predHi` and fill with a per-(technology, scenario) OLS
    * line fitted on [fitLo, fitHi]. Replaces the reference's quadratic
    * rbind loop + per-group lm() with a grid join + closed-form fit (W9).
    */
  def extrapolatePrices(
      df: DataFrame,
      fitLo: Int = 2049, fitHi: Int = 2069,
      predLo: Int = 2070, predHi: Int = 2100): DataFrame = {
    val nesting = df.columns.filterNot(Seq("year", "price").contains).toSeq
    val lo = predLo.min(fitLo)
    val completed = TimeSeries.completeGrid(df, nesting, "year", lo, predHi)
      .filter(col("year") >= lo || col("price").isNotNull)
    Regression.olsExtrapolate(completed, Seq("technology", "scenario"), "year", "price",
      fitLo, fitHi, predLo, predHi)
  }

  /** reference R/prepare_LCOE_adjusted_price_data.R:225-252 — fan Oxford
    * transition paths out to NGFS (model x scenario) labels (R9 as a
    * crossJoin, not a pivot_longer of label columns).
    */
  def fanOutNgfsScenarios(pricesAdjusted: DataFrame, ngfsVintage: String): DataFrame = {
    val spark = pricesAdjusted.sparkSession
    import spark.implicits._
    val models = Seq("GCAM", "REMIND", "MESSAGE").toDF("model")
    def slice(oxfordScenario: String, ngfsScenarios: Seq[String]): DataFrame =
      pricesAdjusted.filter(col("scenario") === oxfordScenario).drop("scenario")
        .crossJoin(broadcast(models))
        .crossJoin(broadcast(ngfsScenarios.toDF("ngfs_scenario")))
    val fast = slice("fast_transition_oxford", Seq("NZ2050", "LD", "B2DS", "DT"))
    val slow = slice("no_transition_oxford", Seq("NDC", "FW", "CP"))
    val ngfs = fast.unionByName(slow)
      .withColumn("scenario",
        concat(lit(s"NGFS$ngfsVintage"), col("model"), lit("_"), col("ngfs_scenario")))
      .drop("model", "ngfs_scenario")
    val oxford = pricesAdjusted
      .withColumn("scenario",
        when(col("scenario") === "fast_transition_oxford", "Oxford2021_fast")
          .when(col("scenario") === "no_transition_oxford", "Oxford2021_base")
          .otherwise(col("scenario")))
      .filter(col("scenario") =!= "slow_transition_oxford")
    ngfs.unionByName(oxford.select(ngfs.columns.map(col): _*))
  }
}
