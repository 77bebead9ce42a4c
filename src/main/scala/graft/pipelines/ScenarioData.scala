package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.DataChecks
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

  /** The P4I/P4B sector-technology lookup (reference R/lookup.R:4-33) —
    * an in-code literal table (S7), broadcast wherever joined.
    */
  def sectorTechnologyLookup(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("automotive", "electric", "Automotive", "Electric"),
      ("automotive", "hybrid", "Automotive", "Hybrid"),
      ("automotive", "ice", "Automotive", "ICE"),
      ("coal", "coal", "Coal", "Coal"),
      ("oil and gas", "gas", "Oil&Gas", "Gas"),
      ("oil and gas", "oil", "Oil&Gas", "Oil"),
      ("power", "coalcap", "Power", "CoalCap"),
      ("power", "gascap", "Power", "GasCap"),
      ("power", "hydrocap", "Power", "HydroCap"),
      ("power", "nuclearcap", "Power", "NuclearCap"),
      ("power", "oilcap", "Power", "OilCap"),
      ("power", "renewablescap", "Power", "RenewablesCap"),
      ("aviation", "freight", "Aviation", "Freight"),
      ("aviation", "passenger", "Aviation", "Passenger"),
      ("cement", "grinding", "Cement", "Grinding"),
      ("cement", "integrated facility", "Cement", "Integrated facility"),
      ("steel", "ac-electric arc furnace", "Steel", "Ac-Electric Arc Furnace"),
      ("steel", "bof shop", "Steel", "Bof Shop"),
      ("steel", "dc-electric arc furnace", "Steel", "Dc-Electric Arc Furnace"),
      ("steel", "open hearth meltshop", "Steel", "Open Hearth Meltshop")
    ).toDF("sector_p4b", "technology_p4b", "sector_p4i", "technology_p4i")
  }

  /** reference R/helpers.R:110-155 remove_incomplete_sectors: within each
    * (scenario, scenario_geography), a sector is kept only when EVERY
    * technology the lookup expects for it is present. The reference loops
    * group-by-group on the driver; here it is one aggregation + anti-join.
    */
  def removeIncompleteSectors(data: DataFrame): DataFrame = {
    val lookup = sectorTechnologyLookup(data.sparkSession)
    val expected = lookup.groupBy(col("sector_p4i").as("ald_sector"))
      .agg(countDistinct(col("technology_p4i")).as("__n_expected"))
    val present = data.select("scenario", "scenario_geography", "ald_sector", "technology")
      .distinct()
      .join(broadcast(lookup),
        col("ald_sector") === col("sector_p4i") && col("technology") === col("technology_p4i"),
        "left_semi")
      .groupBy("scenario", "scenario_geography", "ald_sector")
      .agg(countDistinct(col("technology")).as("__n_present"))
    val incomplete = data.select("scenario", "scenario_geography", "ald_sector").distinct()
      .join(broadcast(expected), Seq("ald_sector"), "left")
      .join(present, Seq("scenario", "scenario_geography", "ald_sector"), "left")
      .filter(col("__n_expected").isNotNull &&
        coalesce(col("__n_present"), lit(0L)) < col("__n_expected"))
      .select("scenario", "scenario_geography", "ald_sector")
    data.join(incomplete, Seq("scenario", "scenario_geography", "ald_sector"), "left_anti")
  }

  /** reference R/prepare_scenario_data.R:123-163 format_p4i: directions
    * from the green-tech list, fair-share percentage = tmsr for declining,
    * smsp for increasing technologies.
    */
  def formatP4i(data: DataFrame, greenTechs: Seq[String]): DataFrame = {
    DataChecks.requireColumns(data, Seq("source", "scenario", "scenario_geography", "sector",
      "technology", "indicator", "units", "year", "tmsr", "smsp"))
    data
      .withColumn("Sub_Technology", lit(null).cast("string"))
      .withColumn("Direction",
        when(col("technology").isin(greenTechs: _*), "increasing").otherwise("declining"))
      .withColumn("FairSharePerc",
        when(col("Direction") === "declining", col("tmsr")).otherwise(col("smsp")))
      .select(
        col("source").as("Source"), col("scenario_geography").as("ScenarioGeography"),
        col("scenario").as("Scenario"), col("sector").as("Sector"),
        col("technology").as("Technology"), col("Sub_Technology"),
        col("indicator").as("Indicator"), col("units").as("Units"), col("year").as("Year"),
        col("value").as("scenario_pathway"), col("tmsr").as("techFSRatio"),
        col("smsp").as("mktFSRatio"), col("Direction"), col("FairSharePerc"))
  }

  /** reference R/prepare_scenario_data.R:435-503
    * preprepare_ngfs_scenario_data (NGFS Phase IV): scenario/model/sector/
    * technology recodes, renewables re-aggregation (grouped window sum +
    * dedup), model x scenario unite with the NGFS2023 prefix.
    */
  def preprepareNgfsScenarioData(data: DataFrame, startYear: Int): DataFrame = {
    val scenarioRecode = Map(
      "Nationally Determined Contributions (NDCs)" -> "NDC", "Below 2 C" -> "B2DS",
      "Delayed transition" -> "DT", "Current Policies" -> "CP",
      "Divergent Net Zero" -> "DN0", "Net Zero 2050" -> "NZ2050",
      "Fragmented World" -> "FW", "Low demand" -> "LD")
    val modelRecode = Map(
      "GCAM 6.0 NGFS" -> "GCAM", "REMIND-MAgPIE 3.2-4.6" -> "REMIND",
      "MESSAGEix-GLOBIOM 1.1-M-R12" -> "MESSAGE")
    val elecTech = Map(
      "Coal" -> "CoalCap", "Gas" -> "GasCap", "Hydro" -> "HydroCap", "Nuclear" -> "NuclearCap",
      "Oil" -> "OilCap", "Solar" -> "RenewablesCap", "Geothermal" -> "RenewablesCap",
      "Biomass" -> "RenewablesCap", "Wind" -> "RenewablesCap")
    var d = data
      .withColumn("scenario",
        coalesce(element_at(typedLit(scenarioRecode), col("Scenario")), col("Scenario")))
      .withColumn("scenario_geography",
        when(col("Region") === "World", "Global").otherwise(col("Region")))
      .withColumn("sector",
        when(col("category_b").isin("Oil", "Gas"), "Oil&Gas")
          .when(col("category_b") === "Coal", "Coal")
          .otherwise("Power"))
      .withColumn("technology",
        when(col("category_b").isin("Oil", "Gas", "Coal"), col("category_b"))
          .when(col("category_b") === "Electricity",
            coalesce(element_at(typedLit(elecTech), col("category_c")), col("category_c")))
          .otherwise(col("category_c")))
      .withColumn("indicator",
        when(col("sector") === "Power", "Capacity").otherwise("Production"))
      .withColumn("source", lit(s"NGFS$startYear"))
      .withColumn("model_name",
        coalesce(element_at(typedLit(modelRecode), col("Model")), col("Model")))
      // explicit select: drop() is case-insensitive and "Model"/"model"
      // would collide
      .select(col("source"), col("scenario"), col("scenario_geography"), col("sector"),
        col("technology"), col("indicator"), col("Unit").as("units"), col("year"),
        col("value"), col("model_name").as("model"))
    // reference :493-499 — re-aggregate the renewables sub-technologies
    // (grouped mutate(sum) + unique == window sum + distinct, SURVEY A1)
    val w = Window.partitionBy(
      col("year"), col("technology"), col("scenario_geography"), col("model"), col("scenario"))
    val renew = d.filter(col("technology") === "RenewablesCap")
      .withColumn("value", sum(col("value")).over(w)).distinct()
    val rest = d.filter(col("technology") =!= "RenewablesCap")
    // full_join with no `by` == union-dedup (J5)
    renew.unionByName(rest).distinct()
      .withColumn("scenario", concat_ws("_", col("model"), col("scenario"))).drop("model")
      .withColumn("scenario", concat(lit("NGFS2023"), col("scenario")))
  }

  /** reference R/prepare_scenario_data.R:506-525 style_ngfs. */
  def styleNgfs(data: DataFrame): DataFrame =
    data
      .drop("Sub_Technology", "Indicator", "mktFSRatio", "techFSRatio", "Source")
      .withColumnRenamed("ScenarioGeography", "scenario_geography")
      .withColumnRenamed("Scenario", "scenario")
      .withColumnRenamed("Sector", "ald_sector")
      .withColumnRenamed("Units", "units")
      .withColumnRenamed("Technology", "technology")
      .withColumnRenamed("Year", "year")
      .withColumnRenamed("Direction", "direction")
      .withColumnRenamed("FairSharePerc", "fair_share_perc")

  /** reference R/prepare_scenario_data.R:173-256 prepare_scenario_data:
    * per-source indicator filters, renewables sub-technology rule, renames,
    * scenario prefixing, NA-perimeter removal, sector completeness.
    */
  def prepareScenarioData(data: DataFrame): DataFrame = {
    DataChecks.requireColumns(data, Seq("Source", "Technology", "ScenarioGeography", "Sector",
      "Units", "Indicator", "Scenario", "Sub_Technology", "Year", "Direction", "mktFSRatio",
      "techFSRatio", "FairSharePerc"))
    var d = data
      .filter(
        (col("Source").rlike("WEO2021") &&
          col("Indicator").isin("Capacity", "Energy Supply", "Production", "Sales")) ||
        (col("Source").rlike("GECO2021") &&
          col("Indicator").isin("Capacity", "Production", "Sales")))
      .filter(!(col("Source").rlike("GECO2021") && col("Sector") =!= "Automotive"))
      .filter(!(col("Technology") === "RenewablesCap" && col("Sub_Technology").isNotNull))
      .drop("Sub_Technology", "Indicator", "mktFSRatio", "techFSRatio")
      .withColumnRenamed("Source", "scenario_source")
      .withColumnRenamed("ScenarioGeography", "scenario_geography")
      .withColumnRenamed("Scenario", "scenario")
      .withColumnRenamed("Sector", "ald_sector")
      .withColumnRenamed("Units", "units")
      .withColumnRenamed("Technology", "technology")
      .withColumnRenamed("Year", "year")
      .withColumnRenamed("Direction", "direction")
      .withColumnRenamed("FairSharePerc", "fair_share_perc")
      .withColumn("scenario", concat_ws("_", col("scenario_source"), col("scenario")))
      .distinct()

    // reference :227-242 — drop (source, geography, sector) perimeters with
    // NA in any column for the operative scenarios
    val operative = Seq("WEO2021_STEPS", "WEO2021_SDS", "WEO2021_NZE_2050", "WEO2021_APS",
      "WEO2020_SPS", "GECO2021_CurPol", "GECO2021_1.5C-Unif", "GECO2021_NDC-LTS")
    val naGeos = d
      .filter(col("scenario").isin(operative: _*))
      .filter(d.columns.map(col(_).isNull).reduce(_ || _))
      .select("scenario_source", "scenario_geography", "ald_sector")
      .distinct()
    d = d.join(naGeos, Seq("scenario_source", "scenario_geography", "ald_sector"), "left_anti")

    // reference :246-252 — supported sectors only, then completeness
    val supportedSectors = sectorTechnologyLookup(d.sparkSession)
      .select(col("sector_p4i").as("ald_sector")).distinct()
    d = d.join(broadcast(supportedSectors), Seq("ald_sector"), "left_semi")
    d = removeIncompleteSectors(d)
    d.drop("scenario_source")
  }
}
