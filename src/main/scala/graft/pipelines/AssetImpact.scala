package graft.pipelines

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Aggregates

/** Asset-impact (AR) cleanup stage — Spark re-expression of
  * R/prepare_asset_impact_data.R:47-244. The xlsx read itself
  * (`read_asset_resolution`, :7-41) is an out-of-engine loader (SURVEY
  * §7.3); the functions here take its two frames (activities, emissions)
  * with the post-rename column names: company_id, company_name, ald_sector,
  * technology, technology_type, region, ald_location, activity_unit and the
  * wide `Equity Ownership YYYY` columns.
  */
object AssetImpact {

  /** reference :47-80 rename_technology: fuel/vehicle recodes plus the
    * hardcoded steel (technology × technology_type) matrix.
    */
  def renameTechnology(arData: DataFrame): DataFrame =
    arData
      .withColumn("technology",
        when(col("ald_sector") === "Coal", "Coal")
          .when(col("technology").isin("Gas", "Natural Gas Liquids"), "Gas")
          .when(col("technology") === "Oil and Condensate", "Oil")
          .when(col("technology").isin(
            "ICE Diesel", "ICE Gasoline", "ICE CNG", "ICE Propane", "ICE E85+"), "ICE")
          .when(col("technology").isin("Hybrid No-Plug", "Hybrid Plug-In"), "Hybrid")
          .when(col("technology") === "Fuel Cell", "FuelCell")
          .otherwise(col("technology")))
      .withColumn("technology",
        when(col("technology") === "Basic Oxygen Furnace" &&
          col("technology_type") === "Integrated Blast Furnace", "BOF-BF")
          .when(col("technology") === "Basic Oxygen Furnace" &&
            col("technology_type") === "Integrated DRI Furnace", "BOF-DRI")
          .when(col("technology") === "Electric Arc Furnace" &&
            col("technology_type") === "Integrated Blast Furnace", "EAF-BF")
          .when(col("technology") === "Electric Arc Furnace" &&
            col("technology_type") === "Integrated DRI Furnace", "EAF-DRI")
          .when(col("technology") === "Electric Arc Furnace" &&
            col("technology_type") === "Integrated Open Hearth Furnace", "EAF-OHF")
          .when(col("technology") === "Electric Arc Furnace" &&
            col("technology_type") === "Mini-Mill", "EAF-MM")
          .otherwise(col("technology")))

  /** reference :86-90. */
  def removeUnknownOwnerCompanies(arData: DataFrame): DataFrame =
    arData.filter(col("company_name") =!= "Unknown Owner")

  /** reference :96-108 rename_ald_sector: LDV → Automotive, then sector
    * realignment from the already-renamed technology.
    */
  def renameAldSector(arData: DataFrame): DataFrame =
    arData
      .withColumn("ald_sector",
        when(col("ald_sector") === "LDV", "Automotive").otherwise(col("ald_sector")))
      .withColumn("ald_sector",
        when(col("technology") === "Coal", "Coal")
          .when(col("technology").isin("Gas", "Oil"), "Oil&Gas")
          .otherwise(col("ald_sector")))

  /** reference :111-120 aggregate_over_technology_types: group by every
    * column except technology_type and the wide `Equity Ownership YYYY`
    * block; each ownership column aggregates with sum-or-all-null (A6 —
    * sum(na.rm=TRUE) but null when every input is null). One hash
    * aggregate; the wide-column set is resolved from the schema.
    */
  def aggregateOverTechnologyTypes(arData: DataFrame): DataFrame = {
    val ownershipCols = arData.columns.filter(_.contains("Equity Ownership ")).toSeq
    val keys = arData.columns
      .filterNot(ownershipCols.contains).filterNot(_ == "technology_type").toSeq
    require(ownershipCols.nonEmpty, "no Equity Ownership columns to aggregate")
    arData.groupBy(keys.map(col): _*)
      .agg(
        Aggregates.sumOrAllNull(col(ownershipCols.head)).as(ownershipCols.head),
        ownershipCols.tail.map(c => Aggregates.sumOrAllNull(col(c)).as(c)): _*)
  }

  /** reference :128-141 remove_prop_emissions: keep raw-valued CO2 rows
    * only (proportions are re-derived downstream).
    */
  def removePropEmissions(companyEmissions: DataFrame): DataFrame =
    companyEmissions.filter(col("activity_unit").isin("tCO2e", "tCO2"))

  /** reference :157-199 filter_countries_coverage: optional HQ and/or asset
    * country filters. The HQ set is a distinct company_id list (small —
    * broadcast semi-join); a no-op when the filter list is empty or both
    * flags are off, exactly like the reference.
    */
  def filterCountriesCoverage(
      arData: DataFrame,
      companyInformations: DataFrame,
      countryFilter: Seq[String] = Seq.empty,
      filterHqs: Boolean = false,
      filterAssets: Boolean = false): DataFrame = {
    if (countryFilter.isEmpty || !(filterHqs || filterAssets)) return arData
    val hqsInCountries = companyInformations
      .filter(col("ald_location").isin(countryFilter: _*) && col("is_ultimate_parent") === true)
      .select("company_id").distinct()
    val byHq =
      if (filterHqs) arData.join(broadcast(hqsInCountries), Seq("company_id"), "left_semi")
      else arData
    if (filterAssets) byHq.filter(col("ald_location").isin(countryFilter: _*)) else byHq
  }

  /** reference :205-244 prepare_asset_impact_data: the full cleanup chain
    * over both frames (loader replaced by the two input DataFrames).
    * Returns (company_activities, company_emissions).
    */
  def prepareAssetImpactData(
      companyActivities: DataFrame,
      companyEmissions: DataFrame): (DataFrame, DataFrame) = {
    def commonChain(df: DataFrame): DataFrame =
      aggregateOverTechnologyTypes(
        renameAldSector(removeUnknownOwnerCompanies(renameTechnology(df))))
    def finish(df: DataFrame): DataFrame =
      df.withColumnRenamed("technology", "ald_business_unit").drop("region")
    val activities = finish(commonChain(companyActivities))
    val emissions = finish(removePropEmissions(commonChain(companyEmissions)))
    (activities, emissions)
  }
}
