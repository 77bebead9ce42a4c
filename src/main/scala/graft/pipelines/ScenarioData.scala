package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.{Shares, TimeSeries}

/** Scenario-data helpers — Spark re-expression of the exported reference
  * functions `interpolate_yearly` and `add_market_share_columns`
  * (reference R/prepare_scenario_data.R:11-72).
  */
object ScenarioData {

  /** reference :11-20 — per-group full_seq completion + na.approx with
    * na.rm=FALSE (edge nulls stay null). Groups = every column except
    * (year, value).
    */
  def interpolateYearly(data: DataFrame, groupCols: Seq[String]): DataFrame = {
    val completed = TimeSeries.completeGridLocal(data, groupCols, "year")
    TimeSeries.naApprox(completed, groupCols, "year", "value", "value")
  }

  /** reference :22-72 — tmsr + smsp over the canonical fair-share groups
    * (scenario, sector, scenario_geography) x technology. At the start
    * year tmsr = 0 and smsp = 0 (both are deltas against the base year).
    */
  def addMarketShareColumns(data: DataFrame, startYear: Int): DataFrame = {
    val fsGroups = Seq("scenario", "sector", "scenario_geography")
    Shares.addMarketShares(
      data.filter(col("year") >= startYear),
      techKeys = fsGroups :+ "technology",
      sectorKeys = fsGroups,
      x = "year", v = "value")
  }
}
