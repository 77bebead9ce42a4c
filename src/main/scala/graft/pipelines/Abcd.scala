package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.DataChecks
import graft.ops.{Aggregates, Reshape, TimeSeries}
import graft.core.Barriers.BarrierOps

/** ABCD stress-test input pipeline — the Spark re-expression of
  * `prepare_abcd_data` (reference R/prepare_abcd_stress_test_input.R:
  * 339-426). One lazy plan end-to-end; the group keys stay on the
  * (company_id, sector, business_unit, location, unit) prefix throughout,
  * so the complete -> interpolate -> fill chain and the aggregations reuse
  * a consistent partitioning.
  *
  * Inputs are the wide datalake tables with `Equity Ownership YYYY`
  * columns (FIXTURES.md §2):
  *  - activities: company_id, company_name, ald_sector, ald_business_unit,
  *    ald_location, activity_unit, Equity Ownership YYYY...
  *  - emissions: same shape, units tCO2/tCO2e.
  */
object Abcd {

  private val mergeKeys = Seq(
    "company_id", "company_name", "ald_sector", "ald_business_unit", "ald_location", "year")

  private def groupAllExcept(df: DataFrame, except: Seq[String])(aggs: Seq[Column]): DataFrame = {
    val keys = df.columns.filterNot(except.contains).toSeq
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** reference :22-46 — unpivot Equity Ownership years and aggregate
    * duplicate rows with sum-or-all-null (A6).
    */
  private def unpivotAndAggregate(wide: DataFrame): DataFrame = {
    val ids = wide.columns.filterNot(_.startsWith("Equity Ownership")).toSeq
    val long = Reshape.unpivotYears(wide, ids, valueName = "equity_ownership")
    // key this dedup-aggregate's ONE exchange on the downstream merge keys
    // (a strict subset of the grouping keys — clustering by fewer keys
    // still satisfies the aggregate's required distribution), so the
    // activities-emissions outer join on exactly these keys reuses the
    // partitioning instead of re-shuffling BOTH pre-aggregated sides
    // (guide §2.4 exchange sharing; r15 plan diff: 2 fewer Exchanges).
    // Trade-off: the explicit repartition lands above the partial
    // aggregate, so the shuffle moves un-combined rows — duplicates in
    // the raw feed are rare (the aggregate is a dedup gate, groups are
    // ~1 row), so map-side combine saved ~nothing here.
    groupAllExcept(long.repartition(mergeKeys.map(col): _*), Seq("equity_ownership"))(
      Seq(Aggregates.sumOrAllNull(col("equity_ownership")).as("equity_ownership")))
  }

  /** R `is.na` counts NaN as missing; Spark isNull does not. */
  private def isMissing(c: Column): Column = c.isNull || isnan(c)
  private def nanAsNull(c: Column): Column = when(!isnan(c), c)

  def prepareAbcdData(
      companyActivities: DataFrame,
      companyEmissions: DataFrame,
      startYear: Int,
      timeHorizon: Int,
      additionalYears: Seq[Int] = Nil,
      sectorList: Seq[String]): DataFrame = {

    // reference :348-357
    val activities = unpivotAndAggregate(companyActivities)
      .withColumnRenamed("activity_unit", "ald_production_unit")
      .withColumnRenamed("equity_ownership", "ald_production")
    val emissions = unpivotAndAggregate(companyEmissions)
      .withColumnRenamed("activity_unit", "emissions_factor_unit")
      .withColumnRenamed("equity_ownership", "emissions_factor")

    // reference :67-80 match_emissions_to_production: full outer on 6 keys
    var abcd = activities.join(emissions, mergeKeys, "outer")

    // reference :369-371: drop NA locations, aggregate duplicate keys
    abcd = abcd.filter(col("ald_location").isNotNull)
    abcd = groupAllExcept(abcd, Seq("ald_production", "emissions_factor"))(Seq(
      Aggregates.sumOrAllNull(col("ald_production")).as("ald_production"),
      Aggregates.sumOrAllNull(col("emissions_factor")).as("emissions_factor")))

    // reference :95-106 complete year grid per nesting keys
    val nesting = Seq("company_id", "company_name", "ald_sector", "ald_business_unit",
      "ald_location", "ald_production_unit", "emissions_factor_unit")
    abcd = TimeSeries.completeGrid(abcd, nesting, "year", startYear, startYear + timeHorizon)

    // reference :267-295: interior interpolation, then forward fill, then 0
    val fillKeys = Seq("company_id", "ald_sector", "ald_business_unit", "ald_location",
      "emissions_factor_unit", "ald_production_unit")
    abcd = TimeSeries.naApprox(abcd, fillKeys, "year", "ald_production", "ald_production")
    abcd = TimeSeries.naApprox(abcd, fillKeys, "year", "emissions_factor", "emissions_factor")
    abcd = TimeSeries.fillDown(abcd, fillKeys, "year", "ald_production", "ald_production")
    abcd = TimeSeries.fillDown(abcd, fillKeys, "year", "emissions_factor", "emissions_factor")
    abcd = abcd
      .withColumn("ald_production", coalesce(col("ald_production"), lit(0.0)))
      .withColumn("emissions_factor", coalesce(col("emissions_factor"), lit(0.0)))

    // reference :175-210 create_emissions_factor_ratio (EF := EF/production;
    // division is IEEE in both R and Spark doubles, 0/0 -> NaN, x/0 -> Inf,
    // cleaned below exactly like the reference)
    abcd = abcd
      .withColumn("emissions_factor", col("emissions_factor") / col("ald_production"))
      .withColumn("emissions_factor_unit",
        when(col("emissions_factor_unit").isNotNull,
          concat_ws("/", col("emissions_factor_unit"), col("ald_production_unit")))
          .otherwise("unknown"))
    // JUNCTION BARRIER (SURVEY §7.4 pt 7): from here the frame fans out
    // into mwProd + mwhEmis + the non-MW/MWh filter — three consumers,
    // each of which the later stages reference again. Without a LINEAGE
    // barrier the final output's logical tree contains ~36 copies of
    // everything above this line (measured: 9-42 s of pure Catalyst time
    // per run on a 1.3k-row fixture; .cache() does NOT help — the tree
    // still carries the full subtree and CacheManager canonicalization
    // walks it per consumer). localCheckpoint truncates the plan to a
    // materialized leaf: downstream analysis/optimization see a scan. At
    // 100 TB the same math holds harder — one extra pass over the data
    // beats recomputing the fill chain per branch (swap for a reliable
    // checkpoint() on clusters where executor loss must be survivable).
    abcd = abcd.planBarrier()
    // MW production matched to MWh-derived emission factors (reference :193-207)
    val mwProd = abcd.filter(col("ald_production_unit") === "MW")
      .drop("emissions_factor_unit", "emissions_factor").distinct()
    val mwhEmis = abcd.filter(col("ald_production_unit") === "MWh")
      .drop("ald_production_unit", "ald_production").distinct()
    val mwJoined = mwProd.join(mwhEmis,
      Seq("company_id", "company_name", "ald_sector", "ald_business_unit", "ald_location", "year"))
      .select(abcd.columns.map(col): _*)
    abcd = abcd.filter(!col("ald_production_unit").isin("MW", "MWh"))
      .unionByName(mwJoined)
      // junction: avgEf + missingEf + the not-missing filter all re-read
      .planBarrier()

    // reference :130-168 fill_missing_emission_factor
    val avgEf = abcd
      .groupBy("ald_sector", "ald_business_unit", "emissions_factor_unit")
      .agg(avg(nanAsNull(col("emissions_factor"))).as("emissions_factor"))
    val missingEf = abcd.filter(isMissing(col("emissions_factor")))
      .drop("emissions_factor", "emissions_factor_unit")
      .join(avgEf, Seq("ald_sector", "ald_business_unit"), "left")
      .withColumn("emissions_factor", coalesce(nanAsNull(col("emissions_factor")), lit(0.0)))
    abcd = abcd.filter(!isMissing(col("emissions_factor")))
      .unionByName(missingEf.select(abcd.columns.map(col): _*))
    abcd = abcd.withColumn("emissions_factor",
      when(col("ald_production") === 0, 0.0).otherwise(col("emissions_factor")))
      // junction: emptyKeys probe + anti join + assetIds + final join
      .planBarrier()

    // reference :216-237 drop keys whose production is all-null-or-zero
    val emptyKeys = groupAllExcept(abcd, Seq("year", "ald_production", "emissions_factor"))(
      Seq(Aggregates.allNullOrZero(col("ald_production")).as("__empty")))
      .filter(col("__empty")).drop("__empty")
    abcd = graft.ops.Joins.antiJoinNullSafe(abcd, emptyKeys,
      abcd.columns.filterNot(Seq("year", "ald_production", "emissions_factor").contains).toSeq)

    abcd = abcd
      .withColumnRenamed("ald_production", "plan_tech_prod")
      .withColumnRenamed("emissions_factor", "plan_emission_factor")

    // reference :303-307, :117-124 filters
    abcd = abcd.filter(col("ald_sector").isin(sectorList: _*))
    val years = (startYear to startYear + timeHorizon) ++ additionalYears
    abcd = abcd.filter(col("year").isin(years: _*))

    // reference :309-320 create_asset_id. The reference numbers assets by
    // arrival order (non-deterministic under parallelism, SURVEY §7.4 pt 4);
    // we pin (ald_location, ald_business_unit) — same ids on every run.
    val assetIds = abcd.select("company_id", "ald_location", "ald_business_unit").distinct()
      .withColumn("asset_id",
        concat_ws("_", col("company_id").cast("string"),
          row_number().over(Window.partitionBy(col("company_id"))
            .orderBy(col("ald_location"), col("ald_business_unit"))).cast("string")))
    abcd = abcd.join(assetIds, Seq("company_id", "ald_location", "ald_business_unit"), "right")

    abcd = abcd
      .withColumn("scenario_geography", lit("Global"))
      .withColumnRenamed("ald_location", "country_iso2")

    // reference :423 — result must have no duplicate rows; cached so the
    // uniqueness action materializes the frame the caller consumes
    abcd = abcd.cache()
    DataChecks.assertUniqueKeys(abcd, abcd.columns.toSeq)
    abcd
  }
}
