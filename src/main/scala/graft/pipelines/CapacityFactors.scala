package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.core.DataChecks
import graft.ops.{Reshape, TimeSeries}

/** Capacity-factor pipeline — Spark re-expression of
  * `prepare_prewrangled_capacity_factors_WEO2021` (reference
  * R/prepare_prewrangled_capacity_factors.R:12-240): filter Power, resolve
  * renewables sub-technologies, aggregate the wide year columns, split
  * Capacity/Generation, convert TWh->GW, join, complete+interpolate,
  * cf = generation/capacity with NaN->0, bounds-assert, relabel scenario
  * slices (SDS cloned as NZE_2050, STEPS as APS).
  */
object CapacityFactors {

  private val hoursToYear = 24 * 365

  /** @param data wide frame: Source, Indicator, Sector, Units, Scenario,
    *             ScenarioGeography, Technology, Sub_Technology, year cols
    */
  def prepareCapacityFactorsWeo2021(data: DataFrame, startYear: Int): DataFrame = {
    val endYear = 2040
    DataChecks.requireColumns(data, Seq("Source", "Indicator", "Sector", "Units", "Scenario",
      "ScenarioGeography", "Technology", "Sub_Technology", endYear.toString))

    val yearCols = data.columns.filter(_.startsWith("20")).toSeq

    // reference :31-48 — Power only; renewables must carry a sub-technology,
    // non-renewables must not; Hydro is promoted to a technology
    var d = data
      .filter(col("Sector") === "Power" && col("Technology") =!= "Total capacity")
      .filter((col("Technology") =!= "Renewables" && col("Sub_Technology").isNull) ||
        (col("Technology") === "Renewables" && col("Sub_Technology").isNotNull))
      .withColumn("Technology",
        when(col("Technology") === "Renewables" && col("Sub_Technology") === "Hydro", "Hydro")
          .otherwise(col("Technology")))

    // reference :51-67 — aggregate the dynamic year-column set (A5)
    val grp = Seq("Source", "Indicator", "Sector", "Units", "Scenario",
      "ScenarioGeography", "Technology")
    d = d.groupBy(grp.map(col): _*)
      .agg(sum(col(yearCols.head)).as(yearCols.head),
        yearCols.tail.map(c => sum(col(c)).as(c)): _*)

    // reference :69-103 — split indicator frames, unpivot, unit-convert
    def longSide(indicator: String, valueName: String): DataFrame =
      Reshape.unpivotYears(
          d.filter(col("Indicator") === indicator).drop("Indicator"),
          grp.filterNot(_ == "Indicator"), valueName)
        .withColumnRenamed("Units", "units")
    val capacity = longSide("Capacity", "capacity")
    val generation = longSide("Generation", "generation")
      .withColumn("generation", col("generation") * 1000 / hoursToYear)
      .withColumn("units", lit("GW"))

    val joinKeys = Seq("Source", "Scenario", "ScenarioGeography", "Sector",
      "Technology", "units", "year")
    var cf = generation.select((joinKeys :+ "generation").map(col): _*)
      .join(capacity.select((joinKeys :+ "capacity").map(col): _*), joinKeys)
      .distinct()

    // reference :110-135 — complete to [startYear, endYear], interpolate
    val nesting = joinKeys.filterNot(_ == "year")
    cf = TimeSeries.completeGrid(cf, nesting, "year", startYear, endYear)
    cf = TimeSeries.naApprox(cf, nesting, "year", "capacity", "capacity")
    cf = TimeSeries.naApprox(cf, nesting, "year", "generation", "generation")
    cf = cf.filter(col("year") >= startYear)

    // reference :138-149 — ratio with 0/0 -> NaN -> 0
    cf = cf
      .withColumn("capacity_factor", col("generation") / col("capacity"))
      .withColumn("capacity_factor",
        when(isnan(col("capacity_factor")) || col("capacity_factor").isNull, 0.0)
          .otherwise(col("capacity_factor")))

    // reference :151-177 — renames + technology recode + World -> Global
    cf = cf
      .withColumnRenamed("Source", "source")
      .withColumnRenamed("Scenario", "scenario")
      .withColumnRenamed("ScenarioGeography", "scenario_geography")
      .withColumnRenamed("Sector", "ald_sector")
      .withColumnRenamed("Technology", "technology")
    cf = Reshape.recodeValues(cf, "technology", Map(
      "Coal" -> "CoalCap", "Oil" -> "OilCap", "Natural gas" -> "GasCap",
      "Hydro" -> "HydroCap", "Nuclear" -> "NuclearCap", "Renewables" -> "RenewablesCap"))
    cf = cf.withColumn("scenario_geography",
      when(col("scenario_geography") === "World", "Global").otherwise(col("scenario_geography")))

    // reference :179-193 — hard bounds: cf in [0, 1], never null
    DataChecks.assertBetween(cf, "capacity_factor", 0.0, 1.0)

    cf = cf.select("scenario", "scenario_geography", "technology", "year", "capacity_factor")

    // reference :213-237 — scenario prefix + relabel slices (U5)
    cf = cf.withColumn("scenario", concat_ws("_", lit("WEO2021"), col("scenario")))
    cf = Reshape.recodeValues(cf, "scenario", Map("WEO2021_SPS" -> "WEO2021_STEPS"))
    cf = Reshape.relabelSlice(cf, col("scenario") === "WEO2021_SDS", "scenario", "WEO2021_NZE_2050")
    cf = Reshape.relabelSlice(cf, col("scenario") === "WEO2021_STEPS", "scenario", "WEO2021_APS")
    cf
  }
}
