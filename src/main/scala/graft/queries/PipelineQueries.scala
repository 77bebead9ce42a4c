package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.pipelines.{CapacityFactors, CarbonPrice, Prices}

/** End-to-end oracle entries for the reference's OUTPUT PIPELINES — the
  * composed DAGs behind the six deliverable tables
  * (reference data-raw/outputs_structure.dbml:1-61, run_workflow.R:172-257),
  * not per-operator slices. Each entry builds a deterministic fixture from
  * the driver parquet tables (values are dyadic rationals so every sum /
  * mean is exact and order-independent — the Catalog.scala parity rules),
  * runs the REAL pipeline object, and the DuckDB oracle restates the whole
  * pipeline relationally (the `sm_corpus_prep` composite precedent).
  *
  * Why it matters: the per-operator catalog proves the parts; these prove
  * the reference's actual deliverables survive the driver's hard hash gate
  * as one plan — completion grids, conditional interpolation, unit
  * conversions, provenance tiers and all.
  */
object PipelineQueries {

  /** DuckDB replay of TimeSeries.naApprox (the w4 machinery): emits
    * px/pv/nx/nv window columns for `v` over (keys ORDER BY x) and the
    * two-point interpolation expression. `keys` comma-joined.
    */
  private def naApproxSql(keys: String, x: String, v: String, sfx: String = ""): String =
    s"""last_value(CASE WHEN $v IS NOT NULL THEN CAST($x AS DOUBLE) END IGNORE NULLS)
       |  OVER (PARTITION BY $keys ORDER BY $x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __px$sfx,
       |last_value($v IGNORE NULLS)
       |  OVER (PARTITION BY $keys ORDER BY $x ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __pv$sfx,
       |first_value(CASE WHEN $v IS NOT NULL THEN CAST($x AS DOUBLE) END IGNORE NULLS)
       |  OVER (PARTITION BY $keys ORDER BY $x ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS __nx$sfx,
       |first_value($v IGNORE NULLS)
       |  OVER (PARTITION BY $keys ORDER BY $x ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS __nv$sfx""".stripMargin

  /** The interpolated value given the window columns of [[naApproxSql]]. */
  private def interpSql(x: String, v: String, sfx: String = ""): String =
    s"""COALESCE($v, CASE WHEN __px$sfx IS NOT NULL AND __nx$sfx IS NOT NULL AND __nx$sfx <> __px$sfx
       |  THEN __pv$sfx + (__nv$sfx - __pv$sfx) * (CAST($x AS DOUBLE) - __px$sfx) / (__nx$sfx - __px$sfx) END)""".stripMargin

  // ---- pipe_carbon_price ---------------------------------------------

  /** Fixture scenarios, one per nation key 0..7 — unique (model, scenario,
    * geography) combos so the completion/interpolation windows have no
    * order ties. Two are in CarbonPrice.interpolatedScenarios via the
    * Indonesia family, two via the plain NGFS names; the rest exercise the
    * "everything else is zero" branch.
    */
  private val cpScenarios = Seq(
    "DN0", "NDC", "NZ2050", "B2DS", "GCAM_CurPol", "MESSAGE_NDC",
    "NDC_Indonesia_moderate", "NZ2050_Indonesia_market_assumption")

  private def carbonPriceFixture(s: SparkSession, d: String): DataFrame = {
    val base = nation(s, d).filter(col("n_nationkey") < 8)
      .select(col("n_nationkey").cast("int").as("k"))
      .withColumn("Scenario", element_at(typedLit(cpScenarios), col("k") + 1))
      .withColumn("Model", lit("MODEL1"))
      .withColumn("Region",
        when(col("Scenario").contains("Indonesia"), "Indonesia").otherwise("World"))
      .withColumn("Variable", lit("Price|Carbon"))
      .withColumn("Unit", lit("US$2010/t CO2"))
    // 18 five-year columns 2015..2100; every 4th cell (by k+i) is a gap the
    // interpolation must bridge; values are quarters — exact in doubles
    (0 until 18).foldLeft(base) { (df, i) =>
      df.withColumn((2015 + 5 * i).toString,
        when((col("k") + i) % 4 === 0, lit(null).cast("double"))
          .otherwise((col("k") + 1) * (10 + i) * lit(0.25)))
    }.drop("k")
  }

  private val cpInterpList =
    CarbonPrice.interpolatedScenarios.map(s => s"'$s'").mkString(", ")

  private val carbonPriceOracle: String = {
    val scenList = cpScenarios.map(s => s"'$s'").mkString(", ")
    s"""WITH scen AS (
       |  SELECT CAST(n_nationkey AS INT) AS k,
       |    [$scenList][CAST(n_nationkey AS INT) + 1] AS scenario
       |  FROM nation WHERE n_nationkey < 8),
       |cells AS (
       |  SELECT 'MODEL1' AS model, s.scenario,
       |    CASE WHEN s.scenario LIKE '%Indonesia%' THEN 'Indonesia' ELSE 'Global' END AS scenario_geography,
       |    'Price|Carbon' AS variable, 'US$$2010/t CO2' AS unit,
       |    2015 + 5 * y.i AS year,
       |    CASE WHEN (s.k + y.i) % 4 = 0 THEN NULL
       |         ELSE CAST((s.k + 1) * (10 + y.i) * 0.25 AS DOUBLE) END AS v
       |  FROM scen s CROSS JOIN (SELECT unnest(range(18)) AS i) y),
       |injected AS (
       |  SELECT 'no_carbon_tax' AS model, 'no_carbon_tax' AS scenario, 'Global' AS scenario_geography,
       |    'Price|Carbon' AS variable, 'US$$2010/t CO2' AS unit, 2015 + 5 * i AS year, 0.0 AS v
       |  FROM (SELECT unnest(range(18)) AS i)
       |  UNION ALL
       |  SELECT 'flat_carbon_tax_50', 'flat_carbon_tax_50', 'Global',
       |    'Price|Carbon', 'US$$2010/t CO2', 2015 + 5 * i, 50.0
       |  FROM (SELECT unnest(range(18)) AS i)
       |  UNION ALL
       |  SELECT 'increasing_carbon_tax_50', 'increasing_carbon_tax_50', 'Global',
       |    'Price|Carbon', 'US$$2010/t CO2', 2015 + 5 * i, 50.0
       |  FROM (SELECT unnest(range(18)) AS i)
       |  UNION ALL
       |  SELECT 'independent_increasing_carbon_tax_50', 'independent_increasing_carbon_tax_50',
       |    'Global', 'Price|Carbon', 'US$$2010/t CO2', 2015 + 5 * i,
       |    CAST([0.0, 0.0, 50.0, 60.83, 74.01, 90.05, 109.56, 133.29, 162.17, 197.30,
       |     240.05, 292.06, 355.33, 432.32, 525.98, 639.94, 778.58, 947.26][CAST(i AS INT) + 1] AS DOUBLE)
       |  FROM (SELECT unnest(range(18)) AS i)),
       |edited AS (
       |  SELECT model, scenario, scenario_geography, variable, unit, year,
       |    CASE
       |      WHEN scenario = 'NDC_Indonesia_moderate' AND year = 2025 THEN 2.0
       |      WHEN scenario = 'NDC_Indonesia_moderate' AND year IN (2030, 2040, 2045) THEN NULL
       |      WHEN scenario = 'NDC_Indonesia_moderate' AND year = 2035 THEN 10.0
       |      WHEN scenario IN ('NDC_Indonesia_market_assumption', 'NZ2050_Indonesia_market_assumption')
       |        AND year = 2025 THEN 5.0
       |      WHEN scenario IN ('NDC_Indonesia_market_assumption', 'NZ2050_Indonesia_market_assumption')
       |        AND year = 2030 THEN NULL
       |      WHEN scenario IN ('NDC_Indonesia_market_assumption', 'NZ2050_Indonesia_market_assumption')
       |        AND year = 2035 THEN 35.0
       |      ELSE v END AS v
       |  FROM (SELECT * FROM cells UNION ALL SELECT * FROM injected)),
       |grid AS (
       |  SELECT k.model, k.scenario, k.scenario_geography, k.variable, k.unit,
       |    CAST(y.year AS INT) AS year, e.v
       |  FROM (SELECT DISTINCT model, scenario, scenario_geography, variable, unit FROM edited) k
       |  CROSS JOIN (SELECT unnest(range(2015, 2101)) AS year) y
       |  LEFT JOIN edited e
       |    ON e.model = k.model AND e.scenario = k.scenario
       |    AND e.scenario_geography = k.scenario_geography
       |    AND e.variable = k.variable AND e.unit = k.unit AND e.year = y.year),
       |w AS (
       |  SELECT *, ${naApproxSql("model, scenario, scenario_geography, variable, unit", "year", "v")}
       |  FROM grid)
       |SELECT model, scenario, scenario_geography, variable, unit, year,
       |  CASE WHEN scenario IN ($cpInterpList) AND year >= 2025
       |       THEN ${interpSql("year", "v")}
       |       ELSE 0.0 END AS carbon_tax
       |FROM w
       |ORDER BY model, scenario, scenario_geography, variable, unit, year""".stripMargin
  }

  // ---- pipe_capacity_factors -----------------------------------------

  /** Wide WEO2021-shape capacity/generation frame from nation keys 0..23:
    * (scenario, geography, technology) varies by k; Renewables carries
    * Solar/Wind sub-technologies (aggregated by the pipeline) and a Hydro
    * sub-technology (promoted to a technology); a 25th 'Total capacity'
    * row exercises the Power filter. Capacity cells are always observed;
    * generation has (k+i)%4 gaps the interpolation must bridge. All
    * values are halves — exact in doubles, so the sub-technology sums and
    * the TWh->GW conversion are bit-stable cross-engine.
    */
  private def capacityFactorsFixture(s: SparkSession, d: String): DataFrame = {
    def labeled(df: DataFrame): DataFrame = df
      .withColumn("Scenario", when(col("k") % 2 === 0, "SDS").otherwise("SPS"))
      .withColumn("ScenarioGeography",
        element_at(typedLit(Seq("World", "EU", "US")),
          (floor(col("k") / 2) % 3).cast("int") + 1))
      .withColumn("ti", floor(col("k") / 6).cast("int"))
      .withColumn("Technology", when(col("ti") === 0, "Coal").otherwise("Renewables"))
      .withColumn("Sub_Technology",
        when(col("ti") === 0, lit(null).cast("string"))
          .when(col("ti") === 1, "Solar")
          .when(col("ti") === 2, "Wind")
          .otherwise("Hydro"))
      .withColumn("Source", lit("WEO2021"))
      .withColumn("Sector", lit("Power"))
    def yearCols(df: DataFrame, capacity: Boolean): DataFrame =
      (0 until 5).foldLeft(df) { (acc, i) =>
        acc.withColumn((2020 + 5 * i).toString,
          if (capacity) (lit(7) + (col("k") + i) % 3) * lit(0.5)
          else when((col("k") + i) % 4 === 0, lit(null).cast("double"))
            .otherwise((lit(2) + (col("k") + i) % 5) * lit(0.5)))
      }
    val base = labeled(nation(s, d).filter(col("n_nationkey") < 24)
      .select(col("n_nationkey").cast("int").as("k")))
    val cap = yearCols(base.withColumn("Indicator", lit("Capacity"))
      .withColumn("Units", lit("GW")), capacity = true)
    val gen = yearCols(base.withColumn("Indicator", lit("Generation"))
      .withColumn("Units", lit("TWh")), capacity = false)
    val total = yearCols(
      labeled(nation(s, d).filter(col("n_nationkey") === 24)
          .select(col("n_nationkey").cast("int").as("k")))
        .withColumn("Technology", lit("Total capacity"))
        .withColumn("Sub_Technology", lit(null).cast("string"))
        .withColumn("Indicator", lit("Capacity")).withColumn("Units", lit("GW")),
      capacity = true)
    cap.unionByName(gen).unionByName(total).drop("k", "ti")
  }

  private val cfKeys = "scenario0, geo, tech"

  private val capacityFactorsOracle: String =
    s"""WITH base AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 24),
       |lab AS (
       |  SELECT k,
       |    CASE WHEN k % 2 = 0 THEN 'SDS' ELSE 'SPS' END AS scenario0,
       |    ['World','EU','US'][CAST((k // 2) % 3 AS INT) + 1] AS geo,
       |    CASE WHEN k // 6 = 0 THEN 'Coal' WHEN k // 6 = 3 THEN 'Hydro'
       |         ELSE 'Renewables' END AS tech
       |  FROM base),
       |cells AS (
       |  SELECT l.scenario0, l.geo, l.tech, ind.indicator, 2020 + 5 * y.i AS year,
       |    CASE WHEN ind.indicator = 'Capacity' THEN (7 + (l.k + y.i) % 3) * 0.5
       |         WHEN (l.k + y.i) % 4 = 0 THEN NULL
       |         ELSE (2 + (l.k + y.i) % 5) * 0.5 END AS v
       |  FROM lab l
       |  CROSS JOIN (SELECT unnest(['Capacity','Generation']) AS indicator) ind
       |  CROSS JOIN (SELECT unnest(range(5)) AS i) y),
       |agg AS (
       |  SELECT scenario0, geo, tech, indicator, year, SUM(v) AS v
       |  FROM cells GROUP BY scenario0, geo, tech, indicator, year),
       |joined AS (
       |  SELECT g.scenario0, g.geo, g.tech, g.year,
       |    g.v * 1000 / 8760 AS generation, c.v AS capacity
       |  FROM agg g JOIN agg c
       |    ON c.scenario0 = g.scenario0 AND c.geo = g.geo AND c.tech = g.tech
       |   AND c.year = g.year AND g.indicator = 'Generation' AND c.indicator = 'Capacity'),
       |grid AS (
       |  SELECT kk.scenario0, kk.geo, kk.tech, CAST(y.year AS INT) AS year,
       |    j.generation, j.capacity
       |  FROM (SELECT DISTINCT scenario0, geo, tech FROM joined) kk
       |  CROSS JOIN (SELECT unnest(range(2020, 2041)) AS year) y
       |  LEFT JOIN joined j ON j.scenario0 = kk.scenario0 AND j.geo = kk.geo
       |    AND j.tech = kk.tech AND j.year = y.year),
       |w AS (SELECT *,
       |  ${naApproxSql(cfKeys, "year", "capacity", "_c")},
       |  ${naApproxSql(cfKeys, "year", "generation", "_g")}
       |  FROM grid),
       |interp AS (SELECT scenario0, geo, tech, year,
       |    ${interpSql("year", "capacity", "_c")} AS capacity,
       |    ${interpSql("year", "generation", "_g")} AS generation
       |  FROM w),
       |cf AS (SELECT scenario0, geo, tech, year,
       |    CASE WHEN generation / capacity IS NULL OR isnan(generation / capacity)
       |         THEN 0.0 ELSE generation / capacity END AS capacity_factor
       |  FROM interp),
       |named AS (
       |  SELECT CASE WHEN scenario0 = 'SPS' THEN 'WEO2021_STEPS'
       |              ELSE 'WEO2021_' || scenario0 END AS scenario,
       |    CASE WHEN geo = 'World' THEN 'Global' ELSE geo END AS scenario_geography,
       |    CASE tech WHEN 'Coal' THEN 'CoalCap' WHEN 'Hydro' THEN 'HydroCap'
       |         ELSE 'RenewablesCap' END AS technology,
       |    year, capacity_factor
       |  FROM cf),
       |cloned AS (
       |  SELECT * FROM named
       |  UNION ALL SELECT 'WEO2021_NZE_2050', scenario_geography, technology, year,
       |    capacity_factor FROM named WHERE scenario = 'WEO2021_SDS'
       |  UNION ALL SELECT 'WEO2021_APS', scenario_geography, technology, year,
       |    capacity_factor FROM named WHERE scenario = 'WEO2021_STEPS')
       |SELECT scenario, scenario_geography, technology, year, capacity_factor
       |FROM cloned ORDER BY scenario, scenario_geography, technology, year""".stripMargin

  // ---- pipe_prices ----------------------------------------------------

  /** Wide fossil-fuel price frame (nation k 0..11): three sectors with
    * their raw units (barrel/Mbtu conversions), two scenarios, two
    * geographies; all cells observed, quarters (exact in doubles).
    */
  private def pricesFossilFixture(s: SparkSession, d: String): DataFrame = {
    val base = nation(s, d).filter(col("n_nationkey") < 12)
      .select(col("n_nationkey").cast("int").as("k"))
      .withColumn("sector",
        element_at(typedLit(Seq("Crude oil", "Natural gas", "Coal")), col("k") % 3 + 1))
      .withColumn("unit",
        element_at(typedLit(Seq("usd/barrel", "usd/Mbtu", "usd/t")), col("k") % 3 + 1))
      .withColumn("scenario",
        when(floor(col("k") / 3) % 2 === 0, "STEPS").otherwise("SDS"))
      .withColumn("scenario_geography",
        when(floor(col("k") / 6) % 2 === 0, "EU").otherwise("US"))
      .withColumn("source", lit("WEO2021"))
    (0 until 5).foldLeft(base) { (df, i) =>
      df.withColumn((2020 + 5 * i).toString, (col("k") + 2) * (3 + i) * lit(0.25))
    }.drop("k")
  }

  /** Wide power/LCOE frame (nation k 0..15): four raw technologies (two
    * collapsing into RenewablesCap via the mean), (k+i)%5 gaps the
    * fill-down bridges (i=0 always observed, so no leading nulls survive
    * to the no-NA assertion), plus one CAPEX row the LCOE filter drops.
    */
  private def pricesPowerFixture(s: SparkSession, d: String): DataFrame = {
    def shape(df: DataFrame): DataFrame = df
      .withColumn("technology",
        element_at(typedLit(Seq("Nuclear", "Gas CCGT", "Solar PV", "Wind")), col("k") % 4 + 1))
      .withColumn("scenario",
        when(floor(col("k") / 4) % 2 === 0, "STEPS").otherwise("SDS"))
      .withColumn("region",
        when(floor(col("k") / 8) % 2 === 0, "EU").otherwise("US"))
      .withColumn("source", lit("WEO2021"))
      .withColumn("unit", lit("usd/MWh"))
    def yearCols(df: DataFrame): DataFrame =
      (0 until 5).foldLeft(df) { (acc, i) =>
        acc.withColumn((2020 + 5 * i).toString,
          when(lit(i) > 0 && (col("k") + i) % 5 === 0, lit(null).cast("double"))
            .otherwise((col("k") + 1) * (4 + i) * lit(0.5)))
      }
    val lcoe = yearCols(shape(nation(s, d).filter(col("n_nationkey") < 16)
        .select(col("n_nationkey").cast("int").as("k")))
      .withColumn("indicator", lit("LCOE")))
    val capex = yearCols(shape(nation(s, d).filter(col("n_nationkey") === 16)
        .select(col("n_nationkey").cast("int").as("k")))
      .withColumn("indicator", lit("CAPEX")))
    lcoe.unionByName(capex).drop("k")
  }

  private val prKeys =
    "source, scenario, scenario_geography, sector, technology, indicator, unit"

  private val pricesOracle: String =
    s"""WITH f0 AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 12),
       |fossil_cells AS (
       |  SELECT ['Crude oil','Natural gas','Coal'][k % 3 + 1] AS sector,
       |    ['usd/barrel','usd/Mbtu','usd/t'][k % 3 + 1] AS unit,
       |    CASE WHEN (k // 3) % 2 = 0 THEN 'STEPS' ELSE 'SDS' END AS scenario,
       |    CASE WHEN (k // 6) % 2 = 0 THEN 'EU' ELSE 'US' END AS geo,
       |    2020 + 5 * y.i AS year,
       |    CAST((k + 2) * (3 + y.i) * 0.25 AS DOUBLE) AS price
       |  FROM f0 CROSS JOIN (SELECT unnest(range(5)) AS i) y),
       |fossilr AS (
       |  SELECT 'WEO2021' AS source, scenario, geo AS scenario_geography,
       |    CASE sector WHEN 'Crude oil' THEN 'Oil' WHEN 'Natural gas' THEN 'Gas'
       |         ELSE sector END AS technology,
       |    'price' AS indicator,
       |    CASE WHEN unit IN ('usd/barrel','usd/Mbtu') THEN 'GJ' ELSE unit END AS unit2,
       |    year,
       |    CASE unit WHEN 'usd/barrel' THEN price * 0.16
       |         WHEN 'usd/Mbtu' THEN price * 0.9478171203 ELSE price END AS price2
       |  FROM fossil_cells),
       |fossil1 AS (
       |  SELECT source, scenario, scenario_geography,
       |    CASE WHEN technology = 'Coal' THEN 'Coal' ELSE 'Oil&Gas' END AS sector,
       |    technology, indicator, unit2 AS unit, year, price2 AS price
       |  FROM fossilr),
       |fossil_glob AS (
       |  SELECT source, scenario, 'Global' AS scenario_geography, sector, technology,
       |    indicator, unit, year, AVG(price) AS price
       |  FROM fossil1 WHERE technology IN ('Gas','Coal')
       |  GROUP BY source, scenario, sector, technology, indicator, unit, year),
       |fossil_all AS (SELECT * FROM fossil1 UNION ALL SELECT * FROM fossil_glob),
       |p0 AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 16),
       |power_cells AS (
       |  SELECT ['Nuclear','Gas CCGT','Solar PV','Wind'][k % 4 + 1] AS rawtech,
       |    CASE WHEN (k // 4) % 2 = 0 THEN 'STEPS' ELSE 'SDS' END AS scenario,
       |    CASE WHEN (k // 8) % 2 = 0 THEN 'EU' ELSE 'US' END AS geo,
       |    2020 + 5 * y.i AS year,
       |    CASE WHEN y.i > 0 AND (k + y.i) % 5 = 0 THEN NULL
       |         ELSE CAST((k + 1) * (4 + y.i) * 0.5 AS DOUBLE) END AS price
       |  FROM p0 CROSS JOIN (SELECT unnest(range(5)) AS i) y),
       |power1 AS (
       |  SELECT 'WEO2021' AS source, scenario, geo AS scenario_geography,
       |    'Power' AS sector,
       |    CASE rawtech WHEN 'Nuclear' THEN 'NuclearCap' WHEN 'Gas CCGT' THEN 'GasCap'
       |         ELSE 'RenewablesCap' END AS technology,
       |    'LCOE' AS indicator, 'usd/MWh' AS unit, year, price
       |  FROM power_cells),
       |power_agg AS (
       |  SELECT source, scenario, scenario_geography, sector, technology, indicator,
       |    unit, year, AVG(price) AS price
       |  FROM power1
       |  GROUP BY source, scenario, scenario_geography, sector, technology, indicator,
       |    unit, year),
       |power_ph AS (
       |  SELECT source, scenario, scenario_geography, sector,
       |    CASE technology WHEN 'GasCap' THEN 'OilCap' ELSE 'HydroCap' END AS technology,
       |    indicator, unit, year, price
       |  FROM power_agg WHERE technology IN ('GasCap','RenewablesCap')),
       |power2 AS (SELECT source, scenario, scenario_geography, sector, technology,
       |    indicator, unit, year, price FROM power_agg
       |  UNION ALL SELECT source, scenario, scenario_geography, sector, technology,
       |    indicator, unit, year, price FROM power_ph),
       |power_fd AS (
       |  SELECT source, scenario, scenario_geography, sector, technology, indicator,
       |    unit, year,
       |    COALESCE(price, last_value(price IGNORE NULLS) OVER (
       |      PARTITION BY $prKeys ORDER BY year
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS price
       |  FROM power2),
       |power_glob AS (
       |  SELECT source, scenario, 'Global' AS scenario_geography, sector, technology,
       |    indicator, unit, year, AVG(price) AS price
       |  FROM power_fd
       |  GROUP BY source, scenario, sector, technology, indicator, unit, year),
       |power_all AS (SELECT * FROM power_fd UNION ALL SELECT * FROM power_glob),
       |data0 AS (SELECT * FROM fossil_all UNION ALL SELECT * FROM power_all),
       |grid AS (
       |  SELECT kk.source, kk.scenario, kk.scenario_geography, kk.sector,
       |    kk.technology, kk.indicator, kk.unit, CAST(y.year AS INT) AS year, d.price
       |  FROM (SELECT DISTINCT $prKeys FROM data0) kk
       |  CROSS JOIN (SELECT unnest(range(2020, 2041)) AS year) y
       |  LEFT JOIN data0 d ON d.source = kk.source AND d.scenario = kk.scenario
       |    AND d.scenario_geography = kk.scenario_geography AND d.sector = kk.sector
       |    AND d.technology = kk.technology AND d.indicator = kk.indicator
       |    AND d.unit = kk.unit AND d.year = y.year),
       |w AS (SELECT *, ${naApproxSql(prKeys, "year", "price")} FROM grid)
       |SELECT source, scenario, scenario_geography, sector, technology, indicator,
       |  unit, year, ${interpSql("year", "price")} AS price
       |FROM w
       |ORDER BY source, scenario, scenario_geography, sector, technology, indicator,
       |  unit, year""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("pipe_prices", pricesOracle) { (s, d) =>
      // The price_data_long deliverable (outputs_structure.dbml:23-31)
      // end-to-end: fossil unit conversions (barrel/Mbtu->GJ), technology
      // recodes, Global = mean over regions on both legs, the LCOE
      // RenewablesCap mean-collapse + OilCap/HydroCap placeholders +
      // fill-down, global-range completion and interpolation, under the
      // reference's no-NA / price>=0 assertions — the full
      // prepare_price_data_long_WEO2021 DAG.
      Prices.preparePriceDataLongWeo2021(pricesFossilFixture(s, d), pricesPowerFixture(s, d))
        .orderBy("source", "scenario", "scenario_geography", "sector", "technology",
          "indicator", "unit", "year")
    },
    Q("pipe_capacity_factors", capacityFactorsOracle) { (s, d) =>
      // The prewrangled-capacity-factors deliverable
      // (outputs_structure.dbml:32-39) end-to-end: Power filter,
      // sub-technology resolution + Hydro promotion, wide aggregation,
      // Capacity/Generation split + TWh->GW, completion+interpolation,
      // cf ratio with NaN->0, recodes, and the SDS->NZE_2050 /
      // STEPS->APS scenario clones — the full
      // prepare_prewrangled_capacity_factors_WEO2021 DAG.
      CapacityFactors.prepareCapacityFactorsWeo2021(capacityFactorsFixture(s, d), 2020)
        .orderBy("scenario", "scenario_geography", "technology", "year")
    },
    Q("pipe_carbon_price", carbonPriceOracle) { (s, d) =>
      // The NGFS carbon-price deliverable (`ngfs_carbon_price`,
      // outputs_structure.dbml:55-61) end-to-end: literal-scenario
      // injection, Indonesia point edits on the wide frame, unpivot,
      // completion to 2100, conditional interpolation — the full
      // prepare_ngfs_carbon_price DAG under the hash gate.
      CarbonPrice.prepareNgfsCarbonPrice(s, carbonPriceFixture(s, d), startYear = 2019)
        .orderBy("model", "scenario", "scenario_geography", "variable", "unit", "year")
    }
  )
}
