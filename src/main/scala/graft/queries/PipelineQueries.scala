package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.pipelines.{Abcd, AssetImpact, CapacityFactors, CarbonPrice, Datalake, Financial, Geographies, Prices, ScenarioData, ToyData, Workflow}

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

  // ---- pipe_scenarios -------------------------------------------------

  /** Long P4I-style scenario frame (nation k 0..15): a complete Coal
    * sector (1 tech), an INCOMPLETE Oil&Gas (1 of 2 — dropped by the
    * sector-completeness rule), a complete Power (all 6 lookup techs,
    * including the green ones that switch FairSharePerc to smsp), two
    * scenarios, years 2020/2024/2028 (gap-4 so every interpolated value
    * stays dyadic-exact) with interior (i=1, k%3) holes, plus one
    * null-value EU row that trips the NA-perimeter removal.
    */
  /** `geos` = (scenario_geography, dyadic value multiplier) pairs the base
    * 16-key lattice is replicated across — the default is the original
    * Global-only shape; the TRISK-v2 reshape entry adds a US slice so the
    * bench-region country-list attach is exercised non-trivially.
    */
  private def scenariosFixture(
      s: SparkSession, d: String,
      geos: Seq[(String, Int)] = Seq(("Global", 1))): DataFrame = {
    val sectors = Seq("Coal", "Oil&Gas", "Power", "Power", "Power", "Power", "Power", "Power")
    val techs = Seq("Coal", "Oil", "CoalCap", "GasCap", "HydroCap", "NuclearCap",
      "OilCap", "RenewablesCap")
    val base = nation(s, d).filter(col("n_nationkey") < 16)
      .select(col("n_nationkey").cast("int").as("k"))
      .withColumn("sector", element_at(typedLit(sectors), col("k") % 8 + 1))
      .withColumn("technology", element_at(typedLit(techs), col("k") % 8 + 1))
      .withColumn("scenario", when(floor(col("k") / 8) === 0, "STEPS").otherwise("SDS"))
      .withColumn("__g", explode(typedLit(geos)))
      .withColumn("scenario_geography", col("__g._1"))
      .withColumn("__m", col("__g._2"))
      .drop("__g")
      .withColumn("source", lit("WEO2021"))
      .withColumn("units",
        when(col("sector") === "Coal", "t")
          .when(col("sector") === "Oil&Gas", "GJ").otherwise("GW"))
      .withColumn("indicator",
        when(col("sector") === "Power", "Capacity").otherwise("Production"))
    val long = base.withColumn("i", explode(typedLit(Seq(0, 1, 2))))
      .withColumn("year", lit(2020) + col("i") * 4)
      .withColumn("value",
        when(col("i") === 1 && col("k") % 3 === 0, lit(null).cast("double"))
          .otherwise((col("k") + 1) * (lit(5) + col("i")) * lit(0.25) * col("__m")))
      .drop("k", "i", "__m")
    val plant = nation(s, d).filter(col("n_nationkey") === 16)
      .select(lit("WEO2021").as("source"), lit("STEPS").as("scenario"),
        lit("EU").as("scenario_geography"), lit("Coal").as("sector"),
        lit("Coal").as("technology"), lit("t").as("units"),
        lit("Production").as("indicator"), lit(2020).as("year"),
        lit(null).cast("double").as("value"))
    long.unionByName(plant)
  }

  private val scKeys7 =
    "source, scenario, scenario_geography, sector, technology, units, indicator"

  private def scenariosOracleFor(geos: Seq[(String, Int)]): String = {
    val greens = "'HydroCap','NuclearCap','RenewablesCap'"
    val geoValues = geos.map { case (g, m) => s"('$g', $m)" }.mkString(", ")
    s"""WITH b AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 16),
       |pairs AS (
       |  SELECT k,
       |    ['Coal','Oil&Gas','Power','Power','Power','Power','Power','Power'][k % 8 + 1] AS sector,
       |    ['Coal','Oil','CoalCap','GasCap','HydroCap','NuclearCap','OilCap','RenewablesCap'][k % 8 + 1] AS technology,
       |    CASE WHEN k // 8 = 0 THEN 'STEPS' ELSE 'SDS' END AS scenario
       |  FROM b),
       |cells AS (
       |  SELECT 'WEO2021' AS source, scenario, g.geo AS scenario_geography, sector,
       |    technology,
       |    CASE sector WHEN 'Coal' THEN 't' WHEN 'Oil&Gas' THEN 'GJ' ELSE 'GW' END AS units,
       |    CASE WHEN sector = 'Power' THEN 'Capacity' ELSE 'Production' END AS indicator,
       |    2020 + 4 * y.i AS year,
       |    CASE WHEN y.i = 1 AND k % 3 = 0 THEN NULL
       |         ELSE CAST((k + 1) * (5 + y.i) * 0.25 * g.m AS DOUBLE) END AS value
       |  FROM pairs
       |  CROSS JOIN (SELECT * FROM (VALUES $geoValues) t(geo, m)) g
       |  CROSS JOIN (SELECT unnest(range(3)) AS i) y
       |  UNION ALL
       |  SELECT 'WEO2021', 'STEPS', 'EU', 'Coal', 'Coal', 't', 'Production', 2020, NULL),
       |grp AS (SELECT $scKeys7, MIN(year) AS lo, MAX(year) AS hi
       |  FROM cells GROUP BY $scKeys7),
       |grid0 AS (SELECT $scKeys7, unnest(range(lo, hi + 1)) AS year FROM grp),
       |gridj AS (
       |  SELECT g.source, g.scenario, g.scenario_geography, g.sector, g.technology,
       |    g.units, g.indicator, CAST(g.year AS INT) AS year, c.value
       |  FROM grid0 g LEFT JOIN cells c
       |    ON c.source = g.source AND c.scenario = g.scenario
       |   AND c.scenario_geography = g.scenario_geography AND c.sector = g.sector
       |   AND c.technology = g.technology AND c.units = g.units
       |   AND c.indicator = g.indicator AND c.year = g.year),
       |wi AS (SELECT *, ${naApproxSql(scKeys7, "year", "value")} FROM gridj),
       |interp AS (SELECT source, scenario, scenario_geography, sector, technology, units,
       |    indicator, year, ${interpSql("year", "value")} AS value
       |  FROM wi),
       |tot AS (SELECT *, CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER (
       |      PARTITION BY scenario, sector, scenario_geography, year) AS DOUBLE) AS __stot
       |  FROM interp WHERE year >= 2020),
       |shares AS (
       |  SELECT *, first_value(value) OVER wt AS __first,
       |    first_value(__stot) OVER wt AS __stot0
       |  FROM tot
       |  WINDOW wt AS (PARTITION BY scenario, sector, scenario_geography, technology
       |    ORDER BY year ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |ms AS (SELECT *, (value - __first) / __first AS tmsr,
       |    (value - __first) / __stot0 AS smsp FROM shares),
       |p4 AS (
       |  SELECT source, scenario_geography, 'WEO2021_' || scenario AS scenario,
       |    sector AS ald_sector, technology, units, year,
       |    CASE WHEN technology IN ($greens) THEN 'increasing'
       |         ELSE 'declining' END AS direction,
       |    CASE WHEN technology IN ($greens) THEN smsp ELSE tmsr END AS fair_share_perc,
       |    value AS scenario_pathway
       |  FROM ms),
       |nageo AS (
       |  SELECT DISTINCT source, scenario_geography, ald_sector FROM p4
       |  WHERE scenario IN ('WEO2021_STEPS', 'WEO2021_SDS')
       |    AND (scenario_pathway IS NULL OR fair_share_perc IS NULL)),
       |kept AS (
       |  SELECT p.* FROM p4 p LEFT JOIN nageo n
       |    ON p.source = n.source AND p.scenario_geography = n.scenario_geography
       |   AND p.ald_sector = n.ald_sector
       |  WHERE n.source IS NULL),
       |expected AS (SELECT * FROM (VALUES ('Coal', 1), ('Oil&Gas', 2), ('Power', 6))
       |  t(ald_sector, n_exp)),
       |present AS (SELECT scenario, scenario_geography, ald_sector,
       |    COUNT(DISTINCT technology) AS n_pres
       |  FROM kept GROUP BY scenario, scenario_geography, ald_sector),
       |incomplete AS (SELECT p.scenario, p.scenario_geography, p.ald_sector
       |  FROM present p JOIN expected e USING (ald_sector) WHERE p.n_pres < e.n_exp)
       |SELECT k.scenario_geography, k.scenario, k.ald_sector, k.units,
       |  k.technology AS ald_business_unit, k.year, k.direction, k.fair_share_perc,
       |  k.scenario_pathway,
       |  CASE WHEN k.scenario = 'WEO2021_STEPS' THEN 'baseline' ELSE 'shock' END AS scenario_type
       |FROM kept k LEFT JOIN incomplete i
       |  ON k.scenario = i.scenario AND k.scenario_geography = i.scenario_geography
       | AND k.ald_sector = i.ald_sector
       |WHERE i.ald_sector IS NULL
       |ORDER BY k.scenario, k.scenario_geography, k.ald_sector, ald_business_unit, k.year""".stripMargin
  }

  private val scenariosOracle: String = scenariosOracleFor(Seq(("Global", 1)))

  // ---- pipe_abcd ------------------------------------------------------

  /** Wide `Equity Ownership` frames from nation keys 0..15 exercising
    * every prepare_abcd_data branch: a duplicated row (k=6,
    * sum-or-all-null), a NULL-location row (k=5, dropped), an
    * emissions-only company (k=10, full-outer orphan), a no-emissions
    * company (k=9, EF unknown), MW+MWh twin rows for every Power company
    * with an all-zero MW producer (k=8, empty-key drop) and an all-zero
    * MWh producer (k=4, 0/0 EF -> sector-average fill that SURFACES on
    * production>0 rows), a second location (k=13, asset numbering) and a
    * Steel company per cycle (sector-list filter). Emission values are
    * dyadic multiples of the production values, so every surviving EF
    * ratio, interpolation and group mean is bit-exact cross-engine.
    */
  private val abcdSectors = Seq("Power", "Oil&Gas", "Coal", "Steel")
  private val abcdBus = Seq("CoalCap", "Oil", "Coal", "Steel")
  private val abcdUnits = Seq("MW", "GJ", "t", "t")
  private val abcdLocs = Seq("DE", "FR", "US")

  private def abcdDims(df: DataFrame): DataFrame = df
    .withColumn("ald_sector", element_at(typedLit(abcdSectors), col("k") % 4 + 1))
    .withColumn("ald_business_unit", element_at(typedLit(abcdBus), col("k") % 4 + 1))
    .withColumn("activity_unit", element_at(typedLit(abcdUnits), col("k") % 4 + 1))
    .withColumn("ald_location", element_at(typedLit(abcdLocs), col("k") % 3 + 1))
    .withColumn("company_name", concat(lit("company-"), col("k").cast("string")))
    .withColumn("company_id", col("k"))

  private def abcdYearCols(df: DataFrame)(v: (org.apache.spark.sql.Column, Int) =>
      org.apache.spark.sql.Column): DataFrame =
    (0 until 4).foldLeft(df)((acc, i) =>
      acc.withColumn(s"Equity Ownership ${2022 + i}", v(col("k"), i)))

  private def abcdK(s: SparkSession, d: String, pred: org.apache.spark.sql.Column): DataFrame =
    nation(s, d).filter(pred).select(col("n_nationkey").cast("int").as("k"))

  private def abcdActV(k: org.apache.spark.sql.Column, i: Int): org.apache.spark.sql.Column =
    when(k === 8, lit(0.0))
      .when(lit(i) >= 1 && lit(i) <= 2 && (k + i) % 5 === 0, lit(null).cast("double"))
      .otherwise((k + 1) * (2 + i) * lit(0.25))

  private def abcdActivitiesFixture(s: SparkSession, d: String): DataFrame = {
    val base = abcdYearCols(abcdDims(
      abcdK(s, d, col("n_nationkey") < 16 && col("n_nationkey") =!= 10)))(abcdActV)
    val dup = base.filter(col("k") === 6)
    val mwh = abcdYearCols(
      abcdDims(abcdK(s, d, col("n_nationkey") < 16 && col("n_nationkey") % 4 === 0))
        .withColumn("activity_unit", lit("MWh"))) { (k, i) =>
      when(k === 4, lit(0.0)).otherwise((k + 2) * (1 + i) * lit(0.25))
    }
    val extraLoc = abcdYearCols(abcdDims(abcdK(s, d, col("n_nationkey") === 13))
      .withColumn("ald_location", lit("BR")))(abcdActV)
    val nullLoc = abcdYearCols(abcdDims(abcdK(s, d, col("n_nationkey") === 5))
      .withColumn("ald_location", lit(null).cast("string")))(abcdActV)
    base.unionByName(dup).unionByName(mwh).unionByName(extraLoc).unionByName(nullLoc)
      .drop("k")
  }

  private def abcdEmissionsFixture(s: SparkSession, d: String): DataFrame =
    abcdYearCols(
      abcdDims(abcdK(s, d, col("n_nationkey") < 16 && col("n_nationkey") =!= 9))
        .withColumn("activity_unit", lit("tCO2"))) { (k, i) =>
      when(k % 4 === 0,
        when(k === 4, lit(0.0)).otherwise((k + 2) * (1 + i) * lit(0.125)))
        .when(lit(i) >= 1 && lit(i) <= 2 && (k + i) % 5 === 0, lit(null).cast("double"))
        .otherwise((k + 1) * (2 + i) * lit(0.25) *
          when(k % 2 === 0, lit(0.5)).otherwise(lit(0.25)))
    }.drop("k")

  private val abcdFillKeys = "k, sector, bu, loc, ef_unit, prod_unit"

  private val abcdOracle: String =
    s"""WITH b AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 16),
       |dims AS (SELECT k,
       |    ['Power','Oil&Gas','Coal','Steel'][k % 4 + 1] AS sector,
       |    ['CoalCap','Oil','Coal','Steel'][k % 4 + 1] AS bu,
       |    ['MW','GJ','t','t'][k % 4 + 1] AS unit,
       |    ['DE','FR','US'][k % 3 + 1] AS loc
       |  FROM b),
       |years AS (SELECT CAST(unnest(range(4)) AS INT) AS i),
       |actrows AS (
       |  SELECT k, sector, bu, loc, unit, i,
       |    CASE WHEN k = 8 THEN 0.0
       |         WHEN i BETWEEN 1 AND 2 AND (k + i) % 5 = 0 THEN NULL
       |         ELSE CAST((k+1)*(2+i)*0.25 AS DOUBLE) END AS v
       |  FROM dims CROSS JOIN years WHERE k <> 10
       |  UNION ALL
       |  SELECT k, sector, bu, loc, unit, i,
       |    CASE WHEN i BETWEEN 1 AND 2 AND (k + i) % 5 = 0 THEN NULL
       |         ELSE CAST((k+1)*(2+i)*0.25 AS DOUBLE) END
       |  FROM dims CROSS JOIN years WHERE k = 6
       |  UNION ALL
       |  SELECT k, sector, bu, loc, 'MWh', i,
       |    CASE WHEN k = 4 THEN 0.0 ELSE CAST((k+2)*(1+i)*0.25 AS DOUBLE) END
       |  FROM dims CROSS JOIN years WHERE k % 4 = 0
       |  UNION ALL
       |  SELECT k, sector, bu, 'BR', unit, i,
       |    CASE WHEN i BETWEEN 1 AND 2 AND (k + i) % 5 = 0 THEN NULL
       |         ELSE CAST((k+1)*(2+i)*0.25 AS DOUBLE) END
       |  FROM dims CROSS JOIN years WHERE k = 13),
       |act AS (
       |  SELECT k, sector, bu, loc, unit, 2022 + i AS year,
       |    CASE WHEN COUNT(v) = 0 THEN NULL ELSE SUM(v) END AS prod
       |  FROM actrows GROUP BY k, sector, bu, loc, unit, i),
       |emisrows AS (
       |  SELECT k, sector, bu, loc, i,
       |    CASE WHEN k % 4 = 0 THEN
       |           (CASE WHEN k = 4 THEN 0.0 ELSE CAST((k+2)*(1+i)*0.125 AS DOUBLE) END)
       |         WHEN i BETWEEN 1 AND 2 AND (k + i) % 5 = 0 THEN NULL
       |         ELSE CAST((k+1)*(2+i)*0.25 *
       |           (CASE WHEN k % 2 = 0 THEN 0.5 ELSE 0.25 END) AS DOUBLE) END AS v
       |  FROM dims CROSS JOIN years WHERE k <> 9),
       |emis AS (
       |  SELECT k, sector, bu, loc, 2022 + i AS year,
       |    CASE WHEN COUNT(v) = 0 THEN NULL ELSE SUM(v) END AS ef
       |  FROM emisrows GROUP BY k, sector, bu, loc, i),
       |oj AS (
       |  SELECT COALESCE(a.k, e.k) AS k, COALESCE(a.sector, e.sector) AS sector,
       |    COALESCE(a.bu, e.bu) AS bu, COALESCE(a.loc, e.loc) AS loc,
       |    COALESCE(a.year, e.year) AS year,
       |    a.unit AS prod_unit, a.prod,
       |    CASE WHEN e.k IS NOT NULL THEN 'tCO2' END AS ef_unit, e.ef
       |  FROM act a FULL JOIN emis e
       |    ON a.k = e.k AND a.sector = e.sector AND a.bu = e.bu AND a.loc = e.loc
       |   AND a.year = e.year),
       |agg2 AS (
       |  SELECT k, sector, bu, loc, year, prod_unit, ef_unit,
       |    CASE WHEN COUNT(prod) = 0 THEN NULL ELSE SUM(prod) END AS prod,
       |    CASE WHEN COUNT(ef) = 0 THEN NULL ELSE SUM(ef) END AS ef
       |  FROM oj WHERE loc IS NOT NULL
       |  GROUP BY k, sector, bu, loc, year, prod_unit, ef_unit),
       |grid AS (
       |  SELECT kk.k, kk.sector, kk.bu, kk.loc, kk.prod_unit, kk.ef_unit,
       |    CAST(y2.year AS INT) AS year, a2.prod, a2.ef
       |  FROM (SELECT DISTINCT k, sector, bu, loc, prod_unit, ef_unit FROM agg2) kk
       |  CROSS JOIN (SELECT unnest(range(2022, 2026)) AS year) y2
       |  LEFT JOIN agg2 a2 ON a2.k = kk.k AND a2.sector = kk.sector AND a2.bu = kk.bu
       |    AND a2.loc = kk.loc AND a2.year = y2.year
       |    AND a2.prod_unit IS NOT DISTINCT FROM kk.prod_unit
       |    AND a2.ef_unit IS NOT DISTINCT FROM kk.ef_unit),
       |w1 AS (SELECT *,
       |    ${naApproxSql(abcdFillKeys, "year", "prod", "_p")},
       |    ${naApproxSql(abcdFillKeys, "year", "ef", "_e")}
       |  FROM grid),
       |f1 AS (SELECT k, sector, bu, loc, prod_unit, ef_unit, year,
       |    ${interpSql("year", "prod", "_p")} AS prod,
       |    ${interpSql("year", "ef", "_e")} AS ef
       |  FROM w1),
       |w2 AS (SELECT *,
       |    last_value(prod IGNORE NULLS) OVER fw AS __fp,
       |    last_value(ef IGNORE NULLS) OVER fw AS __fe
       |  FROM f1
       |  WINDOW fw AS (PARTITION BY $abcdFillKeys ORDER BY year
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |f2 AS (SELECT k, sector, bu, loc, prod_unit, ef_unit, year,
       |    COALESCE(prod, __fp, 0.0) AS prod, COALESCE(ef, __fe, 0.0) AS ef FROM w2),
       |r1 AS (SELECT k, sector, bu, loc, prod_unit, year, prod,
       |    ef / prod AS ef_ratio,
       |    CASE WHEN ef_unit IS NULL THEN 'unknown'
       |         WHEN prod_unit IS NULL THEN ef_unit
       |         ELSE ef_unit || '/' || prod_unit END AS ef_unit
       |  FROM f2),
       |mwprod AS (SELECT DISTINCT k, sector, bu, loc, year, prod, prod_unit
       |  FROM r1 WHERE prod_unit = 'MW'),
       |mwhef AS (SELECT DISTINCT k, sector, bu, loc, year, ef_ratio, ef_unit
       |  FROM r1 WHERE prod_unit = 'MWh'),
       |mwjoin AS (SELECT p.k, p.sector, p.bu, p.loc, p.year, p.prod, p.prod_unit,
       |    e.ef_ratio, e.ef_unit
       |  FROM mwprod p JOIN mwhef e ON e.k = p.k AND e.sector = p.sector
       |    AND e.bu = p.bu AND e.loc = p.loc AND e.year = p.year),
       |ab AS (SELECT k, sector, bu, loc, year, prod, prod_unit, ef_ratio, ef_unit
       |    FROM r1 WHERE prod_unit NOT IN ('MW', 'MWh')
       |  UNION ALL SELECT k, sector, bu, loc, year, prod, prod_unit, ef_ratio, ef_unit
       |    FROM mwjoin),
       |avgef AS (SELECT sector, bu, ef_unit,
       |    AVG(CASE WHEN isnan(ef_ratio) THEN NULL ELSE ef_ratio END) AS avg_ef
       |  FROM ab GROUP BY sector, bu, ef_unit),
       |missing AS (
       |  SELECT m.k, m.sector, m.bu, m.loc, m.year, m.prod, m.prod_unit,
       |    a.ef_unit,
       |    COALESCE(CASE WHEN isnan(a.avg_ef) THEN NULL ELSE a.avg_ef END, 0.0) AS ef_ratio
       |  FROM (SELECT * FROM ab WHERE ef_ratio IS NULL OR isnan(ef_ratio)) m
       |  LEFT JOIN avgef a ON a.sector = m.sector AND a.bu = m.bu),
       |ab2 AS (SELECT k, sector, bu, loc, year, prod, prod_unit, ef_ratio, ef_unit
       |    FROM ab WHERE NOT (ef_ratio IS NULL OR isnan(ef_ratio))
       |  UNION ALL SELECT k, sector, bu, loc, year, prod, prod_unit, ef_ratio, ef_unit
       |    FROM missing),
       |ab3 AS (SELECT k, sector, bu, loc, year, prod, prod_unit,
       |    CASE WHEN prod = 0 THEN 0.0 ELSE ef_ratio END AS ef_ratio, ef_unit
       |  FROM ab2),
       |empty AS (SELECT k, sector, bu, loc, prod_unit, ef_unit FROM ab3
       |  GROUP BY k, sector, bu, loc, prod_unit, ef_unit
       |  HAVING COUNT(prod) = 0 OR SUM(prod) = 0),
       |ab4 AS (SELECT a.* FROM ab3 a LEFT JOIN empty e
       |    ON a.k = e.k AND a.sector = e.sector AND a.bu = e.bu AND a.loc = e.loc
       |   AND a.prod_unit = e.prod_unit AND a.ef_unit = e.ef_unit
       |  WHERE e.k IS NULL),
       |ab5 AS (SELECT * FROM ab4
       |  WHERE sector IN ('Power','Oil&Gas','Coal') AND year BETWEEN 2022 AND 2025),
       |assets AS (SELECT k, loc, bu,
       |    CAST(k AS VARCHAR) || '_' || CAST(row_number() OVER (
       |      PARTITION BY k ORDER BY loc, bu) AS VARCHAR) AS asset_id
       |  FROM (SELECT DISTINCT k, loc, bu FROM ab5))
       |SELECT a5.k AS company_id,
       |  'company-' || CAST(a5.k AS VARCHAR) AS company_name,
       |  a5.sector AS ald_sector, a5.bu AS ald_business_unit,
       |  a5.loc AS country_iso2, a5.prod_unit AS ald_production_unit,
       |  a5.ef_unit AS emissions_factor_unit, a5.year,
       |  a5.prod AS plan_tech_prod, a5.ef_ratio AS plan_emission_factor,
       |  a.asset_id, 'Global' AS scenario_geography
       |FROM ab5 a5 JOIN assets a
       |  ON a.k = a5.k AND a.loc = a5.loc AND a.bu = a5.bu
       |ORDER BY company_id, asset_id, year""".stripMargin

  // ---- pipe_financial -------------------------------------------------

  /** Eleven companies (nation k 0..10) through prepare_financial_data:
    * k 0..5 have two Eikon rows each (exact two-value medians), k=3's
    * implausible npm (median 1.625 > 1) is nulled and tier-filled, k 6..9
    * are missing companies resolved through the ownership tree (k=7 has
    * two tree levels — rank picks the closest; k=8 has none — parent is
    * itself, so all indicators tier-fill; k=9's parent carries real
    * values), and k=10 is a Coal company no average tier covers except
    * the global one. Locations DE/US split the bridge regions so the
    * sector x region, sector, and global tiers are all exercised. All
    * values are dyadic — medians (1-2 values) and tier fills are
    * bit-exact cross-engine.
    */
  private def finCompaniesFixture(s: SparkSession, d: String): DataFrame =
    nation(s, d).filter(col("n_nationkey") < 11)
      .select(col("n_nationkey").cast("int").as("company_id"))
      .withColumn("ald_sector",
        when(col("company_id") === 10, "Coal")
          .otherwise(element_at(typedLit(Seq("Power", "Oil&Gas")),
            (floor(col("company_id") / 2) % 2).cast("int") + 1)))
      .withColumn("ald_location",
        element_at(typedLit(Seq("DE", "US")), col("company_id") % 2 + 1))

  private def finEikonFixture(s: SparkSession, d: String): DataFrame =
    nation(s, d).filter(col("n_nationkey") < 6)
      .select(col("n_nationkey").cast("int").as("company_id"))
      .withColumn("ald_location",
        element_at(typedLit(Seq("DE", "US")), col("company_id") % 2 + 1))
      .withColumn("j", explode(typedLit(Seq(0, 1))))
      .withColumn("pd", (col("company_id") + 1 + col("j")) * lit(0.03125))
      .withColumn("net_profit_margin",
        when(col("company_id") === 3, lit(1.5) + col("j") * lit(0.25))
          .otherwise((col("company_id") + 2 + col("j")) * lit(0.0625)))
      .withColumn("debt_equity_ratio", (col("company_id") + 1 + col("j")) * lit(0.25))
      .withColumn("volatility", (col("company_id") + 1 + col("j")) * lit(0.125))
      .drop("j")

  private def finTreeFixture(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq((2, 6, 0.5, 1), (3, 7, 0.5, 1), (5, 7, 0.5, 2), (5, 9, 0.5, 1))
      .toDF("parent_company_id", "subsidiary_company_id", "linking_stake", "ownership_level")
  }

  private val finMedians =
    """quantile_cont(pd, 0.5) AS a_pd, quantile_cont(npm, 0.5) AS a_npm,
      |quantile_cont(der, 0.5) AS a_der, quantile_cont(vol, 0.5) AS a_vol""".stripMargin

  private val finGate =
    """a_pd IS NOT NULL AND a_npm IS NOT NULL AND a_der IS NOT NULL
      |AND a_vol IS NOT NULL AND a_npm BETWEEN 0.0 AND 1.0""".stripMargin

  private val financialOracle: String =
    s"""WITH b AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 11),
       |comp AS (SELECT k AS company_id,
       |    CASE WHEN k = 10 THEN 'Coal'
       |         ELSE ['Power','Oil&Gas'][CAST((k // 2) % 2 AS INT) + 1] END AS sector,
       |    ['Europe & Central Asia','North America'][k % 2 + 1] AS region
       |  FROM b),
       |finrows AS (
       |  SELECT c.company_id, c.sector, c.region,
       |    CAST((c.company_id + 1 + j.j) * 0.03125 AS DOUBLE) AS pd,
       |    CASE WHEN c.company_id = 3 THEN CAST(1.5 + j.j * 0.25 AS DOUBLE)
       |         ELSE CAST((c.company_id + 2 + j.j) * 0.0625 AS DOUBLE) END AS npm,
       |    CAST((c.company_id + 1 + j.j) * 0.25 AS DOUBLE) AS der,
       |    CAST((c.company_id + 1 + j.j) * 0.125 AS DOUBLE) AS vol
       |  FROM comp c CROSS JOIN (SELECT unnest(range(2)) AS j) j
       |  WHERE c.company_id < 6),
       |fin1 AS (SELECT company_id, sector, region,
       |    quantile_cont(pd, 0.5) AS pd, quantile_cont(npm, 0.5) AS npm,
       |    quantile_cont(der, 0.5) AS der, quantile_cont(vol, 0.5) AS vol
       |  FROM finrows GROUP BY company_id, sector, region),
       |fin2 AS (SELECT company_id, sector, region, pd,
       |    CASE WHEN npm <= 0 OR npm > 1 THEN NULL ELSE npm END AS npm, der, vol
       |  FROM fin1),
       |tree AS (SELECT * FROM (VALUES (2, 6, 1), (3, 7, 1), (5, 7, 2), (5, 9, 1))
       |  t(parent, sub, lvl)),
       |missing0 AS (SELECT company_id, sector, region FROM comp WHERE company_id >= 6),
       |mj AS (SELECT m.company_id, m.sector, m.region,
       |    COALESCE(t.parent, m.company_id) AS parent, COALESCE(t.lvl, 0) AS lvl
       |  FROM missing0 m LEFT JOIN tree t ON t.sub = m.company_id),
       |closest AS (SELECT company_id, sector, region, parent FROM (
       |    SELECT *, rank() OVER (PARTITION BY company_id, sector, region
       |      ORDER BY lvl) AS rk FROM mj) WHERE rk = 1),
       |miss AS (SELECT c.company_id, c.sector, c.region, p.pd, p.npm, p.der, p.vol
       |  FROM closest c LEFT JOIN fin2 p ON p.company_id = c.parent
       |    AND p.region = c.region AND p.sector = c.sector),
       |srg0 AS (SELECT sector, region, $finMedians, COUNT(*) AS n
       |  FROM fin2 WHERE sector IS NOT NULL AND region IS NOT NULL
       |  GROUP BY sector, region),
       |srgg AS (SELECT sector, region, a_pd, a_npm, a_der, a_vol,
       |    'bics_subgroup_region' AS avg_type
       |  FROM srg0 WHERE n > 1 AND $finGate),
       |sg0 AS (SELECT sector, $finMedians, COUNT(*) AS n
       |  FROM fin2 WHERE sector IS NOT NULL GROUP BY sector),
       |sgg AS (SELECT sector, a_pd, a_npm, a_der, a_vol, 'bics_subgroup' AS avg_type
       |  FROM sg0 WHERE n > 1 AND $finGate),
       |gg0 AS (SELECT $finMedians, COUNT(*) AS n FROM fin2),
       |gg AS (SELECT a_pd, a_npm, a_der, a_vol, 'global' AS avg_type
       |  FROM gg0 WHERE n > 1 AND $finGate),
       |allc AS (SELECT * FROM fin2 UNION ALL SELECT * FROM miss),
       |tier1 AS (SELECT a.company_id, a.pd, a.npm, a.der, a.vol,
       |    s.a_pd, s.a_npm, s.a_der, s.a_vol, s.avg_type
       |  FROM allc a JOIN srgg s ON s.sector = a.sector AND s.region = a.region),
       |rest1 AS (SELECT a.* FROM allc a WHERE NOT EXISTS (
       |    SELECT 1 FROM srgg s WHERE s.sector = a.sector AND s.region = a.region)),
       |tier2 AS (SELECT a.company_id, a.pd, a.npm, a.der, a.vol,
       |    s.a_pd, s.a_npm, s.a_der, s.a_vol, s.avg_type
       |  FROM rest1 a JOIN sgg s ON s.sector = a.sector),
       |rest2 AS (SELECT a.* FROM rest1 a WHERE NOT EXISTS (
       |    SELECT 1 FROM sgg s WHERE s.sector = a.sector)),
       |tier3 AS (SELECT a.company_id, a.pd, a.npm, a.der, a.vol,
       |    g.a_pd, g.a_npm, g.a_der, g.a_vol, g.avg_type FROM rest2 a CROSS JOIN gg g),
       |tiers AS (SELECT * FROM tier1 UNION ALL SELECT * FROM tier2
       |  UNION ALL SELECT * FROM tier3),
       |sel0 AS (SELECT company_id,
       |    CASE WHEN npm IS NOT NULL THEN 'Eikon' ELSE avg_type || ' average' END AS t_npm,
       |    CASE WHEN der IS NOT NULL THEN 'Eikon' ELSE avg_type || ' average' END AS t_der,
       |    CASE WHEN vol IS NOT NULL THEN 'Eikon' ELSE avg_type || ' average' END AS t_vol,
       |    COALESCE(pd, a_pd) AS f_pd, COALESCE(npm, a_npm) AS f_npm,
       |    COALESCE(der, a_der) AS f_der, COALESCE(vol, a_vol) AS f_vol
       |  FROM tiers),
       |clevel AS (SELECT company_id, quantile_cont(f_pd, 0.5) AS pd,
       |    quantile_cont(f_npm, 0.5) AS net_profit_margin,
       |    quantile_cont(f_der, 0.5) AS debt_equity_ratio,
       |    quantile_cont(f_vol, 0.5) AS volatility
       |  FROM sel0 GROUP BY company_id),
       |cnt AS (SELECT company_id,
       |    SUM(CASE WHEN t_npm = 'Eikon' THEN 1 ELSE 0 END) / COUNT(*)
       |      AS net_profit_margin_rawdata_ratio,
       |    SUM(CASE WHEN t_der = 'Eikon' THEN 1 ELSE 0 END) / COUNT(*)
       |      AS debt_equity_ratio_rawdata_ratio,
       |    SUM(CASE WHEN t_vol = 'Eikon' THEN 1 ELSE 0 END) / COUNT(*)
       |      AS volatility_rawdata_ratio
       |  FROM sel0 GROUP BY company_id)
       |SELECT c.company_id, c.pd, c.net_profit_margin, c.debt_equity_ratio,
       |  c.volatility, n.net_profit_margin_rawdata_ratio,
       |  n.debt_equity_ratio_rawdata_ratio, n.volatility_rawdata_ratio
       |FROM clevel c JOIN cnt n USING (company_id)
       |ORDER BY company_id""".stripMargin

  // ---- pipe_workflow_* — the TRISK-v2 reshape (run_workflow.R:98-272) ---

  /** The workflow-scenarios fixture replicates the 16-key scenario lattice
    * across Global and a doubled-value US slice, so the bench-region
    * country-list attach (run_workflow.R:186-194) joins non-trivially
    * (Global is excluded from the aggregate by the reference itself).
    */
  private val workflowGeos = Seq(("Global", 1), ("US", 2))

  /** bench_regions shape (scenario_geography_newname, country_iso): three
    * countries under US, three under Global (the reference's
    * bench_regions.rds after run_rename_geographies.R).
    */
  private def benchRegionsFixture(s: SparkSession, d: String): DataFrame =
    nation(s, d).filter(col("n_nationkey") < 6)
      .select(col("n_nationkey").cast("int").as("k"))
      .withColumn("scenario_geography_newname", when(col("k") < 3, "US").otherwise("Global"))
      .withColumn("country_iso", concat(lit("C"), col("k").cast("string")))
      .drop("k")

  /** run_workflow.R:264-267 — financial_features.csv is a plain projection
    * of the financial deliverable, so the oracle projects the full
    * prepare_financial_data restatement.
    */
  private val workflowFinancialOracle: String =
    s"""SELECT company_id, pd, net_profit_margin, debt_equity_ratio, volatility
       |FROM ($financialOracle)
       |ORDER BY company_id""".stripMargin

  /** run_workflow.R:112-177 — assets.csv from the abcd deliverable: the
    * asset-id synthesis branch (row_number per company over (technology,
    * country) at :125-136), capacity = max production per asset (:149-158),
    * the renames and placeholder columns. The abcd chain is the
    * [[abcdOracle]] restatement nested as a subquery.
    */
  private val workflowAssetsOracle: String =
    s"""WITH abcd AS (SELECT * FROM ($abcdOracle)),
       |ids AS (
       |  SELECT company_id, technology, country_iso2,
       |    CAST(company_id AS VARCHAR) || '_' || CAST(row_number() OVER (
       |      PARTITION BY company_id ORDER BY technology, country_iso2) AS VARCHAR) AS asset_id
       |  FROM (SELECT DISTINCT company_id, ald_business_unit AS technology, country_iso2
       |        FROM abcd)),
       |joined AS (
       |  SELECT d.*, i.asset_id AS new_asset_id FROM abcd d JOIN ids i
       |    ON i.company_id = d.company_id AND i.technology = d.ald_business_unit
       |   AND i.country_iso2 = d.country_iso2),
       |cap AS (SELECT *, MAX(plan_tech_prod) OVER (PARTITION BY new_asset_id) AS capacity
       |  FROM joined)
       |SELECT new_asset_id AS asset_id, company_name AS asset_name, company_id, company_name,
       |  country_iso2, CAST(NULL AS VARCHAR) AS country_name,
       |  ald_business_unit AS technology, ald_sector AS sector,
       |  CAST(NULL AS DOUBLE) AS plant_age_years, CAST(NULL AS DOUBLE) AS workforce_size,
       |  plan_tech_prod / capacity AS capacity_factor, capacity,
       |  year AS production_year, ald_production_unit AS production_unit,
       |  plan_emission_factor AS emission_factor
       |FROM cap
       |ORDER BY asset_id, production_year""".stripMargin

  /** run_workflow.R:186-256 — scenarios.csv: the scenario pathways joined
    * with capacity factors (left, NA->1), Global prices (inner — Power
    * CoalCap has no price row and drops, like any uncovered technology in
    * the reference) and the per-geography country list, then the recodes
    * and renames. All three upstream deliverable restatements nest as
    * subqueries; the price leg applies the runner's vintage prefix +
    * source drop + Global write filter (run_prepare_price_data_long.R:
    * 357-360) the same way the Spark wiring does.
    */
  private val workflowScenariosOracle: String =
    s"""WITH scen AS (SELECT * FROM (${scenariosOracleFor(workflowGeos)})),
       |cfz AS (SELECT * FROM ($capacityFactorsOracle)),
       |prz AS (SELECT * FROM ($pricesOracle)),
       |przg AS (
       |  SELECT DISTINCT 'WEO2021_' || scenario AS scenario, sector AS ald_sector,
       |    technology AS ald_business_unit, indicator, unit, year, price
       |  FROM prz WHERE scenario_geography = 'Global'),
       |bk AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 6),
       |bagg AS (
       |  SELECT CASE WHEN k < 3 THEN 'US' ELSE 'Global' END AS geo,
       |    string_agg(DISTINCT 'C' || CAST(k AS VARCHAR), ',' ORDER BY 'C' || CAST(k AS VARCHAR))
       |      AS country_iso2_list
       |  FROM bk GROUP BY 1),
       |bagg2 AS (SELECT * FROM bagg WHERE geo <> 'Global'),
       |j AS (
       |  SELECT s.scenario, s.scenario_geography, s.ald_sector, s.ald_business_unit,
       |    s.units, s.year, s.direction, s.scenario_pathway, s.scenario_type,
       |    c.capacity_factor, p.unit, p.price, b.country_iso2_list
       |  FROM scen s
       |  LEFT JOIN cfz c ON c.scenario_geography = s.scenario_geography
       |    AND c.scenario = s.scenario AND c.technology = s.ald_business_unit
       |    AND c.year = s.year
       |  JOIN przg p ON p.scenario = s.scenario AND p.ald_sector = s.ald_sector
       |    AND p.ald_business_unit = s.ald_business_unit AND p.year = s.year
       |  LEFT JOIN bagg2 b ON b.geo = s.scenario_geography)
       |SELECT scenario, regexp_extract(scenario, '^[^_]+', 0) AS scenario_provider,
       |  CASE WHEN scenario_type = 'shock' THEN 'target' ELSE scenario_type END AS scenario_type,
       |  scenario_geography, ald_sector AS sector, ald_business_unit AS technology,
       |  year AS scenario_year, unit AS price_unit, price AS scenario_price,
       |  COALESCE(capacity_factor, 1.0) AS scenario_capacity_factor,
       |  units AS pathway_unit, scenario_pathway,
       |  CASE WHEN direction = 'declining' THEN 'carbontech' ELSE 'greentech' END
       |    AS technology_type,
       |  country_iso2_list
       |FROM j
       |ORDER BY scenario, scenario_geography, sector, technology, scenario_year""".stripMargin

  /** run_workflow.R:39-72 — the stage-6 cross-dataset alignment: the
    * (scenario, scenario_geography) perimeter complete across scenario,
    * price and capacity-factor data (inner-join scenario x price, anti-join
    * the Power combos missing a capacity factor, semi-filter all three
    * frames). The scenario leg is post-filtered to a deliberate coverage
    * mix so the alignment is non-trivial: OilCap dropped everywhere (its
    * placeholder price exists but no capacity factor — it would wipe every
    * perimeter), GasCap only in (STEPS, US) (kills that perimeter: the cf
    * fixture has no GasCap), NuclearCap only in SDS (kills both SDS
    * perimeters) — leaving exactly (WEO2021_STEPS, Global) complete. The
    * result relation is the per-frame surviving-perimeter census:
    * (frame, scenario, scenario_geography, ald_business_unit, n_rows).
    */
  private val workflowAlignOracle: String =
    s"""WITH scen0 AS (SELECT * FROM (${scenariosOracleFor(workflowGeos)})),
       |scen AS (SELECT * FROM scen0
       |  WHERE ald_business_unit <> 'OilCap'
       |    AND (ald_business_unit <> 'GasCap'
       |         OR (scenario = 'WEO2021_STEPS' AND scenario_geography = 'US'))
       |    AND (ald_business_unit <> 'NuclearCap' OR scenario = 'WEO2021_SDS')),
       |cfz AS (SELECT * FROM ($capacityFactorsOracle)),
       |prz AS (SELECT * FROM ($pricesOracle)),
       |przg AS (
       |  SELECT 'WEO2021_' || scenario AS scenario, scenario_geography,
       |    sector AS ald_sector, technology AS ald_business_unit, indicator, unit,
       |    year, price
       |  FROM prz WHERE scenario_geography = 'Global'),
       |przd AS (SELECT DISTINCT scenario, ald_sector, ald_business_unit, year FROM przg),
       |sp AS (
       |  SELECT s.scenario, s.scenario_geography, s.ald_sector, s.ald_business_unit
       |  FROM scen s JOIN przd p ON p.scenario = s.scenario
       |    AND p.ald_sector = s.ald_sector
       |    AND p.ald_business_unit = s.ald_business_unit AND p.year = s.year),
       |notin AS (
       |  SELECT DISTINCT s.scenario, s.scenario_geography FROM sp s
       |  WHERE s.ald_sector = 'Power' AND NOT EXISTS (
       |    SELECT 1 FROM cfz c WHERE c.scenario_geography = s.scenario_geography
       |      AND c.scenario = s.scenario AND c.technology = s.ald_business_unit)),
       |avail AS (
       |  SELECT DISTINCT scenario, scenario_geography FROM sp
       |  EXCEPT SELECT scenario, scenario_geography FROM notin),
       |scens AS (SELECT DISTINCT scenario FROM avail)
       |SELECT frame, scenario, scenario_geography, ald_business_unit, n_rows FROM (
       |  SELECT 'scenarios' AS frame, s.scenario, s.scenario_geography,
       |    s.ald_business_unit, CAST(COUNT(*) AS BIGINT) AS n_rows
       |  FROM scen s JOIN avail a ON a.scenario = s.scenario
       |    AND a.scenario_geography = s.scenario_geography
       |  GROUP BY s.scenario, s.scenario_geography, s.ald_business_unit
       |  UNION ALL
       |  SELECT 'prices', p.scenario, p.scenario_geography, p.ald_business_unit,
       |    CAST(COUNT(*) AS BIGINT)
       |  FROM przg p JOIN scens x ON x.scenario = p.scenario
       |  GROUP BY p.scenario, p.scenario_geography, p.ald_business_unit
       |  UNION ALL
       |  SELECT 'capacity_factors', c.scenario, c.scenario_geography, c.technology,
       |    CAST(COUNT(*) AS BIGINT)
       |  FROM cfz c JOIN scens x ON x.scenario = c.scenario
       |  GROUP BY c.scenario, c.scenario_geography, c.technology)
       |ORDER BY frame, scenario, scenario_geography, ald_business_unit""".stripMargin

  // ---- pipe_datalake — the DB-assembly prep (data-raw/prep_datalake.R) --

  /** ISIN generator shared by the eikon and ids fixtures: a 2-letter
    * country prefix (the :113 ald_location derivation reads it back) over a
    * 6-isin universe, so the 12-row new feed folds 2 rows into each isin's
    * median.
    */
  private def dlIsin(k: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(element_at(typedLit(Seq("US", "DE", "FR")), (k % 3) + 1),
      lit("00"), (k % 6).cast("string"))

  private def dlK(s: SparkSession, d: String,
      pred: org.apache.spark.sql.Column): DataFrame =
    nation(s, d).filter(pred).select(col("n_nationkey").cast("int").as("k"))

  /** Current-feed eikon rows (k 0..11): two rows per isin, percent-scaled
    * indicator columns in exact quarter/eighth steps so the per-isin median
    * (mean of two) is bit-exact cross-engine.
    */
  private def dlEikonNewFixture(s: SparkSession, d: String): DataFrame =
    dlK(s, d, col("n_nationkey") < 12)
      .withColumn("isin", dlIsin(col("k")))
      .withColumn("ticker_symbol", concat(lit("T"), col("k").cast("string")))
      .withColumn("credit_structural_pd_percent", (col("k") + 1) * lit(25.0))
      .withColumn("credit_structural_leverage", (col("k") + 2) * lit(0.5))
      .withColumn("net_profit_margin_percent", (col("k") + 1) * lit(12.5))
      .withColumn("credit_structural_asset_volatility_percent", (col("k") + 2) * lit(25.0))
      .withColumn("credit_structural_asset_drift_percent", (col("k") + 3) * lit(12.5))
      .withColumn("trbc_industry_name", lit("IND"))
      .drop("k")

  /** Archived-feed rows (k 12..19): k<15 overlap the new feed (the vintage
    * merge drops them), 15..18 are GB-only survivors hitting all four
    * npm-repair-ladder clamp branches, k=19 has a null isin (the :63
    * not-null filter).
    */
  private def dlEikonOldFixture(s: SparkSession, d: String): DataFrame =
    dlK(s, d, col("n_nationkey").between(12, 19))
      .withColumn("isin",
        when(col("k") < 15, dlIsin(col("k")))
          .when(col("k") <= 18, concat(lit("GB00"), col("k").cast("string"))))
      .withColumn("structural", concat(lit("S"), col("k").cast("string")))
      .withColumn("identifier_ric", concat(lit("R"), col("k").cast("string")))
      .withColumn("credit_smart_ratios_net_profit_margin_percent_ltm_s_avg",
        when(col("k").isin(15, 16), lit(-0.5))
          .when(col("k").isin(17, 18), lit(1.5)).otherwise(lit(0.5)))
      .withColumn("net_profit_margin_percent_0d_ltm_1_s_avg",
        when(col("k").isin(15, 17), lit(0.5))
          .when(col("k") === 16, lit(-1.0))
          .when(col("k") === 18, lit(2.0)).otherwise(lit(0.25)))
      .withColumn("x4", (col("k") + 1) * lit(0.25))
      .withColumn("leverage_s_avg", (col("k") + 2) * lit(0.5))
      .withColumn("asset_volatility_s_avg", (col("k") + 1) * lit(0.5))
      .withColumn("asset_drift_s_avg", (col("k") + 2) * lit(0.25))
      .withColumn("gics_sub_industry_name", lit("G"))
      .drop("k")

  /** DB_ids shape: six isin-bearing companies, company 0 with an EXTRA
    * null-isin row (the :348 consistency gate drops it), company 20 with
    * ONLY a null-isin row (kept), four GB companies matching the archived
    * eikon survivors.
    */
  private def dlIdsFixture(s: SparkSession, d: String): DataFrame = {
    val sixCompanies = dlK(s, d, col("n_nationkey") < 6)
      .withColumn("company_id", col("k"))
      .withColumn("company_name", concat(lit("N"), col("k").cast("string")))
      .withColumn("isin", dlIsin(col("k")))
      .withColumn("trustworthy", col("k") % 2 === 0)
    val nullRows = dlK(s, d, col("n_nationkey").isin(6, 7))
      .withColumn("company_id", when(col("k") === 6, 0).otherwise(20))
      .withColumn("company_name",
        when(col("k") === 6, "N0").otherwise("N20"))
      .withColumn("isin", lit(null).cast("string"))
      .withColumn("trustworthy", col("k") === 6)
    val gbCompanies = dlK(s, d, col("n_nationkey").between(15, 18))
      .withColumn("company_id", col("k") - 5)
      .withColumn("company_name", concat(lit("N"), (col("k") - 5).cast("string")))
      .withColumn("isin", concat(lit("GB00"), col("k").cast("string")))
      .withColumn("trustworthy", col("k") % 2 === 0)
    sixCompanies.unionByName(nullRows).unionByName(gbCompanies).drop("k")
  }

  /** :296-327 get_additional_isins input: one already-known pair (dropped),
    * one unknown isin for a known company (attrs attach), one for a company
    * absent from the ids table (the left-join keeps it with null attrs).
    */
  private def dlNewIdIsinsFixture(s: SparkSession, d: String): DataFrame =
    dlK(s, d, col("n_nationkey").isin(0, 10, 21))
      .withColumn("company_id",
        when(col("k") === 0, 0).when(col("k") === 10, 10).otherwise(21))
      .withColumn("isin",
        when(col("k") === 0, "US000")
          .when(col("k") === 10, "JP0001").otherwise("JP0002"))
      .select("company_id", "isin")

  /** Ownership rows: per-company level-1 parents, a stake tie (company 1 —
    * rank keeps both, the keep-first pin takes the lower target id), a
    * negative-level row (filtered), a null stake (-> 100, beating the 60),
    * and a level-2 row (excluded from the level-1 parent attach).
    */
  private def dlTreeFixture(s: SparkSession, d: String): DataFrame =
    dlK(s, d, col("n_nationkey") < 11)
      .withColumn("company_id",
        when(col("k") < 6, col("k"))
          .when(col("k").isin(6, 7), 1)
          .when(col("k") === 8, 2)
          .when(col("k") === 9, 3).otherwise(4))
      .withColumn("target_company_id",
        when(col("k") < 6, col("k") + 100)
          .when(col("k") === 6, 201)
          .when(col("k") === 7, 101)
          .when(col("k") === 8, 999)
          .when(col("k") === 9, 300).otherwise(400))
      .withColumn("ownership_level",
        when(col("k") === 8, -1).when(col("k") === 10, 2).otherwise(1))
      .withColumn("linking_stake",
        when(col("k") < 6, lit(60.0))
          .when(col("k").isin(6, 7), lit(80.0))
          .when(col("k") === 8, lit(90.0))
          .when(col("k") === 9, lit(null).cast("double")).otherwise(lit(70.0)))
      .select("company_id", "target_company_id", "ownership_level", "linking_stake")

  /** prep_datalake.R composed: the per-isin eikon median collapse (:97-107),
    * the npm repair ladder of the archived wrangle (:27-65), the
    * new-vintage-wins merge + isin-country ald_location (:109-115), the
    * trustworthiness attach for externally supplied isins (:296-327), the
    * null-isin consistency gate (:339-361) and the ownership-tree
    * majority-parent prewrangle (:235-283) — assembled into the one
    * per-id-row relation the financial runner consumes.
    */
  private val datalakeOracle: String =
    s"""WITH b AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 25),
       |enew AS (
       |  -- every indicator CAST AS DOUBLE: DuckDB's median over DECIMAL
       |  -- takes the lower element instead of interpolating (Catalog.scala
       |  -- parity rules), and (k+2)*0.5 is DECIMAL-typed there
       |  SELECT ['US','DE','FR'][(k % 3) + 1] || '00' || CAST(k % 6 AS VARCHAR) AS isin,
       |    CAST((k+1)*25.0/100 AS DOUBLE) AS pd,
       |    CAST((k+1)*12.5/100 AS DOUBLE) AS net_profit_margin,
       |    CAST((k+2)*0.5 AS DOUBLE) AS debt_equity_ratio,
       |    CAST((k+2)*25.0/100 AS DOUBLE) AS volatility,
       |    CAST((k+3)*12.5/100 AS DOUBLE) AS asset_drift
       |  FROM b WHERE k < 12),
       |emed AS (
       |  SELECT isin, median(pd) AS pd, median(net_profit_margin) AS net_profit_margin,
       |    median(debt_equity_ratio) AS debt_equity_ratio,
       |    median(volatility) AS volatility, median(asset_drift) AS asset_drift
       |  FROM enew GROUP BY isin),
       |eoldraw AS (
       |  SELECT k,
       |    CASE WHEN k < 15 THEN ['US','DE','FR'][(k % 3) + 1] || '00' || CAST(k % 6 AS VARCHAR)
       |         WHEN k <= 18 THEN 'GB00' || CAST(k AS VARCHAR) END AS isin,
       |    CASE WHEN k IN (15, 16) THEN -0.5 WHEN k IN (17, 18) THEN 1.5 ELSE 0.5 END AS csr,
       |    CASE WHEN k IN (15, 17) THEN 0.5 WHEN k = 16 THEN -1.0
       |         WHEN k = 18 THEN 2.0 ELSE 0.25 END AS ltm,
       |    (k+1)*0.25 AS pd, (k+2)*0.5 AS debt_equity_ratio,
       |    (k+1)*0.5 AS volatility, (k+2)*0.25 AS asset_drift
       |  FROM b WHERE k BETWEEN 12 AND 19),
       |eold AS (
       |  SELECT isin, pd,
       |    CASE WHEN csr < 0 AND ltm BETWEEN 0 AND 1 THEN ltm
       |         WHEN csr < 0 AND ltm < 0 THEN 0.0
       |         WHEN csr < 0 AND ltm > 1 THEN 0.0
       |         WHEN csr > 1 AND ltm BETWEEN 0 AND 1 THEN ltm
       |         WHEN csr > 1 AND ltm > 1 THEN 1.0
       |         WHEN csr > 1 AND ltm < 0 THEN 1.0
       |         ELSE csr END AS net_profit_margin,
       |    debt_equity_ratio, volatility, asset_drift
       |  FROM eoldraw WHERE isin IS NOT NULL),
       |emerged AS (
       |  SELECT isin, pd, net_profit_margin, debt_equity_ratio, volatility, asset_drift
       |  FROM eold WHERE isin NOT IN (SELECT isin FROM emed)
       |  UNION ALL
       |  SELECT isin, pd, net_profit_margin, debt_equity_ratio, volatility, asset_drift
       |  FROM emed),
       |eikon AS (SELECT *, substr(isin, 1, 2) AS ald_location FROM emerged),
       |ids0 AS (
       |  SELECT k AS company_id, 'N' || CAST(k AS VARCHAR) AS company_name,
       |    ['US','DE','FR'][(k % 3) + 1] || '00' || CAST(k % 6 AS VARCHAR) AS isin,
       |    k % 2 = 0 AS trustworthy
       |  FROM b WHERE k < 6
       |  UNION ALL SELECT 0, 'N0', NULL, true FROM b WHERE k = 6
       |  UNION ALL SELECT 20, 'N20', NULL, false FROM b WHERE k = 7
       |  UNION ALL SELECT k - 5, 'N' || CAST(k - 5 AS VARCHAR),
       |    'GB00' || CAST(k AS VARCHAR), k % 2 = 0 FROM b WHERE k BETWEEN 15 AND 18),
       |newisins AS (
       |  SELECT 0 AS company_id, 'US000' AS isin FROM b WHERE k = 0
       |  UNION ALL SELECT 10, 'JP0001' FROM b WHERE k = 10
       |  UNION ALL SELECT 21, 'JP0002' FROM b WHERE k = 21),
       |unknown AS (
       |  SELECT DISTINCT company_id, isin FROM newisins
       |  WHERE isin NOT IN (SELECT isin FROM ids0 WHERE isin IS NOT NULL)),
       |idattrs AS (SELECT DISTINCT company_id, company_name FROM ids0),
       |enhanced AS (
       |  SELECT u.company_id, a.company_name, u.isin, true AS trustworthy
       |  FROM unknown u LEFT JOIN idattrs a USING (company_id)),
       |ids1 AS (SELECT * FROM ids0 UNION ALL SELECT * FROM enhanced),
       |withisin AS (SELECT * FROM ids1 WHERE isin IS NOT NULL),
       |nullonly AS (SELECT * FROM ids1 WHERE isin IS NULL
       |  AND company_id NOT IN (SELECT company_id FROM withisin)),
       |ids AS (SELECT * FROM withisin UNION ALL SELECT * FROM nullonly),
       |tree0 AS (
       |  SELECT k AS company_id, k + 100 AS target, 1 AS lvl, 60.0 AS stake
       |  FROM b WHERE k < 6
       |  UNION ALL SELECT 1, 201, 1, 80.0 FROM b WHERE k = 6
       |  UNION ALL SELECT 1, 101, 1, 80.0 FROM b WHERE k = 7
       |  UNION ALL SELECT 2, 999, -1, 90.0 FROM b WHERE k = 8
       |  UNION ALL SELECT 3, 300, 1, NULL FROM b WHERE k = 9
       |  UNION ALL SELECT 4, 400, 2, 70.0 FROM b WHERE k = 10),
       |tree1 AS (
       |  SELECT DISTINCT company_id, target, lvl, COALESCE(stake, 100.0) AS stake
       |  FROM tree0 WHERE lvl >= 0),
       |ranked AS (
       |  SELECT *, rank() OVER (PARTITION BY company_id, lvl ORDER BY stake DESC) AS rk
       |  FROM tree1),
       |major AS (
       |  SELECT company_id, lvl, target, stake FROM (
       |    SELECT *, row_number() OVER (PARTITION BY company_id, lvl ORDER BY target) AS rn
       |    FROM ranked WHERE rk = 1) WHERE rn = 1),
       |parents AS (
       |  SELECT company_id AS sub_id, target AS parent_company_id,
       |    stake AS linking_stake
       |  FROM major WHERE lvl = 1)
       |SELECT i.company_id, i.company_name, i.isin, i.trustworthy, e.ald_location,
       |  e.pd, e.net_profit_margin, e.debt_equity_ratio, e.volatility, e.asset_drift,
       |  p.parent_company_id, p.linking_stake
       |FROM ids i LEFT JOIN eikon e ON e.isin = i.isin
       |LEFT JOIN parents p ON p.sub_id = i.company_id
       |ORDER BY i.company_id, i.isin NULLS FIRST""".stripMargin

  // ---- pipe_asset_impact — the AR cleanup (R/prepare_asset_impact_data.R)

  private val aiSectors = Seq("Upstream", "Upstream", "LDV", "LDV", "LDV", "LDV",
    "Steel", "Coal")
  private val aiUnits = Seq("GJ", "GJ", "#", "#", "#", "#", "t", "t")
  private val aiTechA = Seq("Natural Gas Liquids", "Oil and Condensate", "ICE Diesel",
    "ICE Gasoline", "Hybrid No-Plug", "Fuel Cell", "Electric Arc Furnace",
    "Lignite Mining")
  private val aiTechB = Seq("Gas", "Oil and Condensate", "ICE Gasoline", "ICE CNG",
    "Hybrid Plug-In", "Fuel Cell", "Basic Oxygen Furnace", "Hard Coal")

  /** Two raw-vintage blocks per company (k and k+8 -> company k%8): the
    * pre-recode technology names differ between blocks but recode to the
    * same label (exercising the :47-80 fuel/vehicle maps), so the :111-120
    * technology_type aggregate folds them; company 6 is the exception —
    * its blocks hit EAF-MM and BOF-BF in the steel matrix and stay two
    * rows. k=16 rides along for the per-frame extra case (Unknown Owner /
    * proportion emissions).
    */
  private def aiBase(s: SparkSession, d: String): DataFrame =
    dlK(s, d, col("n_nationkey") < 17)
      .withColumn("idx", col("k") % 8)
      .withColumn("blk", floor(col("k") / 8).cast("int"))
      .withColumn("company_id", col("idx"))
      .withColumn("company_name", concat(lit("company-"), col("idx").cast("string")))
      .withColumn("ald_sector", element_at(typedLit(aiSectors), col("idx") + 1))
      .withColumn("activity_unit", element_at(typedLit(aiUnits), col("idx") + 1))
      .withColumn("ald_location",
        element_at(typedLit(Seq("DE", "FR", "US")), (col("idx") % 3) + 1))
      .withColumn("region", concat(lit("R"), (col("idx") % 2).cast("string")))
      .withColumn("technology",
        when(col("blk") === 0, element_at(typedLit(aiTechA), col("idx") + 1))
          .otherwise(element_at(typedLit(aiTechB), col("idx") + 1)))
      .withColumn("technology_type",
        when(col("idx") === 6,
          when(col("blk") === 0, "Mini-Mill").otherwise("Integrated Blast Furnace"))
          .otherwise(when(col("blk") === 0, "TA").otherwise("TB")))

  /** Activities: quarter-step ownership values with one both-blocks-null
    * cell (company 1, 2023 — the A6 all-null branch) and one single-block
    * null (company 3, 2024 — summed around); k=16 is an "Unknown Owner"
    * row the :86-90 filter must drop whole.
    */
  private def aiActivitiesFixture(s: SparkSession, d: String): DataFrame =
    (0 until 4).foldLeft(
      aiBase(s, d).withColumn("company_name",
        when(col("k") === 16, "Unknown Owner").otherwise(col("company_name")))
    ) { (acc, i) =>
      acc.withColumn(s"Equity Ownership ${2022 + i}",
        when(col("blk") === 0,
          when(col("k") === 1 && lit(i) === 1, lit(null).cast("double"))
            .otherwise((col("k") + 1) * (i + 1) * lit(0.25)))
          .otherwise(
            when((col("k") === 9 && lit(i) === 1) || (col("k") === 11 && lit(i) === 2),
              lit(null).cast("double"))
              .otherwise((col("k") + 1) * (i + 2) * lit(0.25))))
    }.drop("k", "idx", "blk")

  /** Emissions: eighth-step values under tCO2/tCO2e units (tCO2e on the
    * steel rows), one single-block null (company 4, 2022); k=16 is a
    * proportion-unit row the :128-141 filter must drop AFTER the
    * aggregate.
    */
  private def aiEmissionsFixture(s: SparkSession, d: String): DataFrame =
    (0 until 4).foldLeft(
      aiBase(s, d).withColumn("activity_unit",
        when(col("k") === 16, "CO2 proportion")
          .when(col("idx") === 6, "tCO2e").otherwise("tCO2"))
    ) { (acc, i) =>
      acc.withColumn(s"Equity Ownership ${2022 + i}",
        when(col("blk") === 0, (col("k") + 1) * (i + 1) * lit(0.125))
          .otherwise(
            when(col("k") === 12 && lit(i) === 0, lit(null).cast("double"))
              .otherwise((col("k") + 2) * (i + 1) * lit(0.125))))
    }.drop("k", "idx", "blk")

  /** R/prepare_asset_impact_data.R:205-244 restated: both vintage blocks
    * built, the technology recodes (:47-80 incl. the steel matrix), the
    * Unknown-Owner drop (:86-90 — the oracle simply never generates k=16's
    * activities row; a Spark-side filter regression surfaces as an extra
    * company), the LDV/tech sector realignment (:96-108), the
    * sum-or-all-null technology_type aggregate (:111-120) and the
    * proportion-emissions drop (:128-141), emitted as one tagged relation
    * over both cleaned frames.
    */
  private val assetImpactOracle: String = {
    val recodeSql =
      """CASE WHEN sector0 = 'Coal' THEN 'Coal'
        |         WHEN tech0 IN ('Gas', 'Natural Gas Liquids') THEN 'Gas'
        |         WHEN tech0 = 'Oil and Condensate' THEN 'Oil'
        |         WHEN tech0 IN ('ICE Diesel', 'ICE Gasoline', 'ICE CNG') THEN 'ICE'
        |         WHEN tech0 IN ('Hybrid No-Plug', 'Hybrid Plug-In') THEN 'Hybrid'
        |         WHEN tech0 = 'Fuel Cell' THEN 'FuelCell'
        |         WHEN tech0 = 'Basic Oxygen Furnace'
        |           AND ttype = 'Integrated Blast Furnace' THEN 'BOF-BF'
        |         WHEN tech0 = 'Electric Arc Furnace'
        |           AND ttype = 'Mini-Mill' THEN 'EAF-MM'
        |         ELSE tech0 END""".stripMargin
    def wideSql(rel: String): String =
      s"""SELECT company_id, company_name, ald_sector, ald_business_unit,
         |    activity_unit, ald_location,
         |    MAX(CASE WHEN i = 0 THEN v END) AS eo_2022,
         |    MAX(CASE WHEN i = 1 THEN v END) AS eo_2023,
         |    MAX(CASE WHEN i = 2 THEN v END) AS eo_2024,
         |    MAX(CASE WHEN i = 3 THEN v END) AS eo_2025
         |  FROM $rel
         |  GROUP BY company_id, company_name, ald_sector, ald_business_unit,
         |    activity_unit, ald_location""".stripMargin
    s"""WITH b AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 16),
       |dims AS (
       |  SELECT k, k % 8 AS idx, k // 8 AS blk, k % 8 AS c,
       |    ['Upstream','Upstream','LDV','LDV','LDV','LDV','Steel','Coal'][k % 8 + 1] AS sector0,
       |    ['GJ','GJ','#','#','#','#','t','t'][k % 8 + 1] AS unit0,
       |    ['DE','FR','US'][(k % 8) % 3 + 1] AS loc
       |  FROM b),
       |techd AS (
       |  SELECT *,
       |    CASE WHEN blk = 0 THEN ['Natural Gas Liquids','Oil and Condensate','ICE Diesel','ICE Gasoline','Hybrid No-Plug','Fuel Cell','Electric Arc Furnace','Lignite Mining'][idx + 1]
       |         ELSE ['Gas','Oil and Condensate','ICE Gasoline','ICE CNG','Hybrid Plug-In','Fuel Cell','Basic Oxygen Furnace','Hard Coal'][idx + 1] END AS tech0,
       |    CASE WHEN blk = 0 THEN (CASE WHEN idx = 6 THEN 'Mini-Mill' ELSE 'TA' END)
       |         ELSE (CASE WHEN idx = 6 THEN 'Integrated Blast Furnace' ELSE 'TB' END)
       |         END AS ttype
       |  FROM dims),
       |rec AS (
       |  SELECT *, $recodeSql AS tech
       |  FROM techd),
       |sec AS (
       |  SELECT *,
       |    CASE WHEN tech = 'Coal' THEN 'Coal'
       |         WHEN tech IN ('Gas', 'Oil') THEN 'Oil&Gas'
       |         WHEN sector0 = 'LDV' THEN 'Automotive'
       |         ELSE sector0 END AS sector
       |  FROM rec),
       |years AS (SELECT CAST(unnest(range(4)) AS INT) AS i),
       |avals AS (
       |  SELECT c AS company_id, 'company-' || CAST(c AS VARCHAR) AS company_name,
       |    sector AS ald_sector, tech AS ald_business_unit, unit0 AS activity_unit,
       |    loc AS ald_location, i,
       |    CASE WHEN blk = 0 THEN
       |           (CASE WHEN k = 1 AND i = 1 THEN NULL
       |                 ELSE CAST((k+1)*(i+1)*0.25 AS DOUBLE) END)
       |         ELSE (CASE WHEN (k = 9 AND i = 1) OR (k = 11 AND i = 2) THEN NULL
       |                    ELSE CAST((k+1)*(i+2)*0.25 AS DOUBLE) END) END AS v0
       |  FROM sec CROSS JOIN years),
       |aagg AS (
       |  SELECT company_id, company_name, ald_sector, ald_business_unit,
       |    activity_unit, ald_location, i,
       |    CASE WHEN COUNT(v0) = 0 THEN NULL ELSE SUM(v0) END AS v
       |  FROM avals GROUP BY company_id, company_name, ald_sector,
       |    ald_business_unit, activity_unit, ald_location, i),
       |awide AS (${wideSql("aagg")}),
       |evals AS (
       |  SELECT c AS company_id, 'company-' || CAST(c AS VARCHAR) AS company_name,
       |    sector AS ald_sector, tech AS ald_business_unit,
       |    CASE WHEN idx = 6 THEN 'tCO2e' ELSE 'tCO2' END AS activity_unit,
       |    loc AS ald_location, i,
       |    CASE WHEN blk = 0 THEN CAST((k+1)*(i+1)*0.125 AS DOUBLE)
       |         ELSE (CASE WHEN k = 12 AND i = 0 THEN NULL
       |                    ELSE CAST((k+2)*(i+1)*0.125 AS DOUBLE) END) END AS v0
       |  FROM sec CROSS JOIN years),
       |eagg AS (
       |  SELECT company_id, company_name, ald_sector, ald_business_unit,
       |    activity_unit, ald_location, i,
       |    CASE WHEN COUNT(v0) = 0 THEN NULL ELSE SUM(v0) END AS v
       |  FROM evals GROUP BY company_id, company_name, ald_sector,
       |    ald_business_unit, activity_unit, ald_location, i),
       |ewide AS (${wideSql("eagg")})
       |SELECT frame, company_id, company_name, ald_sector, ald_business_unit,
       |  activity_unit, ald_location, eo_2022, eo_2023, eo_2024, eo_2025 FROM (
       |  SELECT 'activities' AS frame, * FROM awide
       |  UNION ALL
       |  SELECT 'emissions' AS frame, * FROM ewide)
       |ORDER BY frame, company_id, ald_sector, ald_business_unit, activity_unit""".stripMargin
  }

  // ---- pipe_lcoe_* — the LCOE-adjusted price variants ------------------
  // (reference R/prepare_LCOE_adjusted_price_data.R; port Prices.scala)

  /** The implied-price adjustment restated over a frame: implied start-year
    * market price = lcoe_t0 / (1 - npm), scaled by cost factor
    * lcoe_t0 / lcoe_t (reference :18-71). `keys` comma-joined; `npmExpr`
    * written as the same arithmetic expression the Scala side evaluates so
    * both engines derive the identical double divisor.
    */
  private def impliedAdjustSql(rel: String, keys: String, npmExpr: String,
      startYear: Int, outCols: String): String =
    s"""SELECT $outCols,
       |    i.implied_price * (first_value(l.price) OVER (PARTITION BY ${keys.split(", ").map("l." + _).mkString(", ")}
       |      ORDER BY l.year ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / l.price) AS price,
       |    'price' AS indicator
       |  FROM $rel l JOIN (
       |    SELECT ${keys.split(", ").mkString(", ")}, price / (1 - $npmExpr) AS implied_price
       |    FROM $rel WHERE year = $startYear) i
       |  ON ${keys.split(", ").map(k => s"i.$k = l.$k").mkString(" AND ")}""".stripMargin

  /** The W9 closed-form OLS fit restated (the w9_ols_extrapolate oracle
    * pattern): decimal-exact sums, slope/intercept in the same expression
    * shape Regression.olsFit evaluates.
    */
  private def olsFitSql(rel: String, keys: String, fitLo: Int, fitHi: Int): String =
    s"""SELECT $keys,
       |    (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       |    (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n AS intercept
       |  FROM (SELECT $keys,
       |      CAST(COUNT(price) AS DOUBLE) AS n,
       |      CAST(SUM(CAST(CAST(year AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sx,
       |      CAST(SUM(CAST(price AS DECIMAL(30,6))) AS DOUBLE) AS sy,
       |      CAST(SUM(CAST(CAST(year AS DOUBLE) * price AS DECIMAL(30,6))) AS DOUBLE) AS sxy,
       |      CAST(SUM(CAST(CAST(year AS DOUBLE) * CAST(year AS DOUBLE) AS DECIMAL(30,6))) AS DOUBLE) AS sxx
       |    FROM $rel WHERE year BETWEEN $fitLo AND $fitHi AND price IS NOT NULL
       |    GROUP BY $keys)""".stripMargin

  /** reference :18-71 applied to the real WEO2021 price output — the
    * adjustedWeoPrices leg of the vintage merge. Power LCOE rows become
    * implied market prices; everything else passes through.
    */
  private val lcoeWeoKeys = "source, scenario, scenario_geography, sector, technology, unit"

  private val lcoeWeoOracle: String =
    s"""WITH prz AS (SELECT * FROM ($pricesOracle)),
       |lc AS (SELECT * FROM prz WHERE sector = 'Power' AND indicator = 'LCOE'),
       |adj AS (
       |  ${impliedAdjustSql("lc", lcoeWeoKeys, "0.115", 2020,
             "l.source, l.scenario, l.scenario_geography, l.sector, l.technology, l.unit, l.year")})
       |SELECT source, scenario, scenario_geography, sector, technology, indicator, unit,
       |  year, price
       |FROM (
       |  SELECT source, scenario, scenario_geography, sector, technology, indicator, unit,
       |    year, price FROM adj
       |  UNION ALL
       |  SELECT source, scenario, scenario_geography, sector, technology, indicator, unit,
       |    year, price
       |  FROM prz WHERE NOT (sector = 'Power' AND indicator = 'LCOE'))
       |ORDER BY source, scenario, scenario_geography, sector, technology, indicator,
       |  unit, year""".stripMargin

  /** Oxford LCOE wide fixture (nation k 0..11 × 2 regions × 5 years):
    * every technology-recode branch (Natural gas/Coal/Nuclear, Renewables
    * with Solar+Wind mean-collapse, Hydro promotion), both live Oxford
    * scenarios; junk rows exercise the Sector/scenario-rlike/slow/startYear
    * filters. Years reach the 2049-2069 OLS fit window so the 2070-2100
    * extension predicts from three observations per (technology, scenario).
    */
  private val oxfTechs = Seq("Natural gas", "Coal", "Nuclear", "Renewables",
    "Renewables", "Renewables")
  private val oxfSubs: Seq[String] = Seq(null, null, null, "Solar", "Wind", "Hydro")
  private val oxfYears = Seq(2021, 2033, 2049, 2057, 2069)

  private def oxfordLcoeFixture(s: SparkSession, d: String): DataFrame = {
    val base = nation(s, d).filter(col("n_nationkey") < 12)
      .select(col("n_nationkey").cast("int").as("k"))
      .withColumn("Sector", lit("Power"))
      .withColumn("Technology", element_at(typedLit(oxfTechs), col("k") % 6 + 1))
      .withColumn("Sub_Technology", element_at(typedLit(oxfSubs), col("k") % 6 + 1))
      .withColumn("Scenario",
        when(floor(col("k") / 6) === 0, "Oxford - fast_transition")
          .otherwise("Oxford - no_transition"))
      .withColumn("__m", explode(typedLit(Seq(1, 2))))
      .withColumn("Region", when(col("__m") === 1, "World").otherwise("EU"))
      .withColumn("__i", explode(typedLit(Seq(0, 1, 2, 3, 4))))
      .withColumn("Year", element_at(typedLit(oxfYears), col("__i") + 1))
      .withColumn("LCOE", (col("k") + 1) * (lit(3) + col("__i")) * lit(0.25) * col("__m"))
      .drop("k", "__m", "__i")
    // filter fodder: wrong sector, non-Oxford scenario, the dropped slow
    // path, pre-startYear year — each must leave no trace in the output
    def junk(key: Int, sector: String, scenario: String, year: Int) =
      nation(s, d).filter(col("n_nationkey") === key).select(
        lit(sector).as("Sector"), element_at(typedLit(oxfTechs), lit(1)).as("Technology"),
        lit(null).cast("string").as("Sub_Technology"), lit(scenario).as("Scenario"),
        lit("World").as("Region"), lit(year).as("Year"), lit(9.25).as("LCOE"))
    base
      .unionByName(junk(12, "Coal", "Oxford - fast_transition", 2021))
      .unionByName(junk(13, "Power", "GCAM NZ2050", 2021))
      .unionByName(junk(14, "Power", "Oxford - slow_transition", 2021))
      .unionByName(junk(15, "Power", "Oxford - fast_transition", 2019))
  }

  private val oxfKeys = "scenario, scenario_geography, sector, technology, unit"

  private val lcoeOxfordOracle: String = {
    val years = oxfYears.mkString("[", ", ", "]")
    s"""WITH b AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 12),
       |raw AS (
       |  SELECT k,
       |    ['Natural gas','Coal','Nuclear','Renewables','Renewables','Renewables'][k % 6 + 1] AS tech0,
       |    [NULL,NULL,NULL,'Solar','Wind','Hydro'][k % 6 + 1] AS sub0,
       |    CASE WHEN k // 6 = 0 THEN 'fast_transition_oxford'
       |         ELSE 'no_transition_oxford' END AS scenario,
       |    CASE WHEN m.m = 1 THEN 'Global' ELSE 'EU' END AS scenario_geography,
       |    $years[y.i + 1] AS year,
       |    CAST((k + 1) * (3 + y.i) * 0.25 * m.m AS DOUBLE) AS price
       |  FROM b CROSS JOIN (SELECT unnest([1, 2]) AS m) m
       |  CROSS JOIN (SELECT CAST(unnest(range(5)) AS INT) AS i) y),
       |rec AS (
       |  SELECT scenario, scenario_geography, 'Power' AS sector,
       |    CASE WHEN tech0 = 'Natural gas' THEN 'GasCap'
       |         WHEN tech0 = 'Coal' THEN 'CoalCap'
       |         WHEN sub0 = 'Hydro' THEN 'HydroCap'
       |         WHEN tech0 = 'Nuclear' THEN 'NuclearCap'
       |         WHEN tech0 = 'Renewables' AND sub0 <> 'HydroCap' THEN 'RenewablesCap'
       |         ELSE tech0 END AS technology,
       |    '$$/MWh' AS unit, year, price
       |  FROM raw),
       |renewd AS (SELECT DISTINCT * FROM (
       |  SELECT scenario, scenario_geography, sector, technology, unit, year,
       |    AVG(price) OVER (PARTITION BY scenario, scenario_geography, sector, year,
       |      technology) AS price
       |  FROM rec WHERE technology = 'RenewablesCap')),
       |d0 AS (SELECT DISTINCT * FROM (
       |  SELECT * FROM rec WHERE technology <> 'RenewablesCap'
       |  UNION ALL SELECT * FROM renewd
       |  UNION ALL SELECT scenario, scenario_geography, sector, 'OilCap', unit, year, price
       |  FROM rec WHERE technology = 'GasCap')),
       |adj AS (
       |  ${impliedAdjustSql("d0", oxfKeys, "0.115", 2021,
             "l.scenario, l.scenario_geography, l.sector, l.technology, l.unit, l.year")}),
       |extr AS (
       |  SELECT e.scenario, e.scenario_geography, e.sector, e.technology, e.unit,
       |    CAST(y.year AS INT) AS year, CAST(NULL AS DOUBLE) AS price, e.indicator
       |  FROM (SELECT DISTINCT sector, scenario_geography, technology, unit, indicator,
       |        scenario FROM adj) e
       |  CROSS JOIN (SELECT unnest(range(2070, 2101)) AS year) y),
       |full0 AS (
       |  SELECT scenario, scenario_geography, sector, technology, unit, year, price,
       |    indicator FROM adj
       |  UNION ALL SELECT * FROM extr),
       |fit AS (
       |  ${olsFitSql("full0", "technology, scenario", 2049, 2069)}),
       |pred AS (
       |  SELECT d.scenario, d.scenario_geography, d.sector, d.technology, d.unit, d.year,
       |    CASE WHEN d.price IS NULL AND d.year BETWEEN 2021 AND 2100
       |          AND ft.slope IS NOT NULL
       |         THEN ft.intercept + ft.slope * CAST(d.year AS DOUBLE)
       |         ELSE d.price END AS price, d.indicator
       |  FROM full0 d LEFT JOIN fit ft
       |    ON ft.technology = d.technology AND ft.scenario = d.scenario),
       |ngfs AS (
       |  SELECT 'NGFS2023' || m.model || '_' || n.ngfs AS scenario, p.scenario_geography,
       |    p.sector, p.technology, p.unit, p.year, p.price, p.indicator
       |  FROM pred p
       |  CROSS JOIN (SELECT unnest(['GCAM','REMIND','MESSAGE']) AS model) m
       |  CROSS JOIN (SELECT unnest(['NZ2050','LD','B2DS','DT']) AS ngfs) n
       |  WHERE p.scenario = 'fast_transition_oxford'
       |  UNION ALL
       |  SELECT 'NGFS2023' || m.model || '_' || n.ngfs, p.scenario_geography,
       |    p.sector, p.technology, p.unit, p.year, p.price, p.indicator
       |  FROM pred p
       |  CROSS JOIN (SELECT unnest(['GCAM','REMIND','MESSAGE']) AS model) m
       |  CROSS JOIN (SELECT unnest(['NDC','FW','CP']) AS ngfs) n
       |  WHERE p.scenario = 'no_transition_oxford'),
       |oxf AS (
       |  SELECT CASE scenario WHEN 'fast_transition_oxford' THEN 'Oxford2021_fast'
       |      WHEN 'no_transition_oxford' THEN 'Oxford2021_base' ELSE scenario END AS scenario,
       |    scenario_geography, sector, technology, unit, year, price, indicator
       |  FROM pred)
       |SELECT scenario, scenario_geography, sector, technology, unit, year, price, indicator
       |FROM (SELECT * FROM ngfs UNION ALL SELECT * FROM oxf)
       |ORDER BY scenario, scenario_geography, technology, year""".stripMargin
  }

  /** Mission-Possible steel levelized-cost fixture (nation k 0..7 × 2
    * regions × 3 years): all four kept source technologies across both
    * scenarios; junk technology/scenario rows exercise the filters. The
    * Global leg is the mean over the two regions.
    */
  private def steelLcFixture(s: SparkSession, d: String): DataFrame = {
    val base = nation(s, d).filter(col("n_nationkey") < 8)
      .select(col("n_nationkey").cast("int").as("k"))
      .withColumn("technology",
        element_at(typedLit(Seq("Avg BF-BOF", "DRI-Melt-BOF", "EAF", "DRI-EAF")),
          col("k") % 4 + 1))
      .withColumn("scenario",
        when(floor(col("k") / 4) === 0, "baseline").otherwise("carbon_cost"))
      .withColumn("__m", explode(typedLit(Seq(1, 2))))
      .withColumn("region", when(col("__m") === 1, "R1").otherwise("R2"))
      .withColumn("__i", explode(typedLit(Seq(0, 1, 2))))
      .withColumn("year", element_at(typedLit(Seq(2022, 2030, 2040)), col("__i") + 1))
      .withColumn("levelized_cost",
        (col("k") + 1) * (lit(2) + col("__i")) * lit(0.25) * col("__m"))
      .drop("k", "__m", "__i")
    def junk(key: Int, tech: String, scenario: String) =
      nation(s, d).filter(col("n_nationkey") === key).select(
        lit(tech).as("technology"), lit(scenario).as("scenario"), lit("R1").as("region"),
        lit(2022).as("year"), lit(7.5).as("levelized_cost"))
    base
      .unionByName(junk(8, "Scrap steel", "baseline"))
      .unionByName(junk(9, "EAF", "high_ambition"))
  }

  private val steelKeys = "source, scenario, scenario_geography, sector, technology, unit"

  private val lcoeSteelOracle: String =
    s"""WITH b AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 8),
       |raw AS (
       |  SELECT k,
       |    ['Avg BF-BOF','DRI-Melt-BOF','EAF','DRI-EAF'][k % 4 + 1] AS technology,
       |    CASE WHEN k // 4 = 0 THEN 'baseline' ELSE 'carbon_cost' END AS scenario,
       |    CASE WHEN m.m = 1 THEN 'R1' ELSE 'R2' END AS region,
       |    [2022, 2030, 2040][y.i + 1] AS year,
       |    CAST((k + 1) * (2 + y.i) * 0.25 * m.m AS DOUBLE) AS lc
       |  FROM b CROSS JOIN (SELECT unnest([1, 2]) AS m) m
       |  CROSS JOIN (SELECT CAST(unnest(range(3)) AS INT) AS i) y),
       |gmean AS (SELECT technology, scenario, 'Global' AS region, year, AVG(lc) AS lc
       |  FROM raw GROUP BY technology, scenario, year),
       |u AS (SELECT technology, scenario, region AS scenario_geography, year, lc AS price
       |    FROM raw
       |  UNION ALL SELECT technology, scenario, region, year, lc FROM gmean),
       |flt AS (
       |  SELECT CASE technology WHEN 'Avg BF-BOF' THEN 'BF-BOF'
       |      WHEN 'DRI-Melt-BOF' THEN 'DRI-BOF' ELSE technology END AS technology,
       |    scenario, scenario_geography, year, price
       |  FROM u WHERE technology IN ('Avg BF-BOF','DRI-Melt-BOF','EAF','DRI-EAF')
       |    AND scenario IN ('baseline','carbon_cost')),
       |stl AS (
       |  SELECT technology, scenario, scenario_geography, year, price,
       |    'Steel' AS sector, 'Levelized Cost' AS indicator,
       |    'Mission Possible' AS source, '$$/ton' AS unit
       |  FROM (SELECT * FROM flt
       |    UNION ALL SELECT 'BF-EAF', scenario, scenario_geography, year, price
       |      FROM flt WHERE technology = 'EAF'
       |    UNION ALL SELECT 'BOF', scenario, scenario_geography, year, price
       |      FROM flt WHERE technology = 'BF-BOF'
       |    UNION ALL SELECT 'BF-OHF', scenario, scenario_geography, year, price
       |      FROM flt WHERE technology = 'BF-BOF')),
       |adj AS (
       |  ${impliedAdjustSql("stl", steelKeys, "0.06866203", 2022,
             "l.scenario, l.year, l.technology, l.scenario_geography, l.sector, l.unit")})
       |SELECT CASE WHEN scenario = 'baseline' THEN 'Steel_baseline'
       |    WHEN scenario = 'carbon_cost' THEN 'Steel_NZ' ELSE scenario END AS scenario,
       |  year, technology, scenario_geography, price, sector, indicator, unit
       |FROM adj
       |ORDER BY scenario, scenario_geography, technology, year""".stripMargin

  // ---- pipe_geographies — the stage-5 regroup/rename --------------------

  /** Five geographies: three with IDENTICAL country sets (the grouping +
    * transitive-chain prune: EU -> Euro Area -> European Union (R5), the
    * longest name winning), one with '&' and spaces (the full
    * standardization chain), one Global singleton-ish set overlapping EU
    * below tolerance.
    */
  private val geoNames = Seq("EU", "Euro Area", "European Union (R5)",
    "Latin America & Carib", "Global")

  private def geoBenchFixture(s: SparkSession, d: String): DataFrame =
    nation(s, d).filter(col("n_nationkey") < 20)
      .select(col("n_nationkey").cast("int").as("k"))
      .withColumn("gi",
        when(col("k") < 5, 0).when(col("k") < 10, 1)
          .when(col("k") < 15, 2).when(col("k") < 18, 3).otherwise(4))
      .withColumn("scenario_geography", element_at(typedLit(geoNames), col("gi") + 1))
      .withColumn("ci",
        when(col("gi") === 0, col("k"))
          .when(col("gi") === 1, col("k") - 5)
          .when(col("gi") === 2, col("k") - 10)
          .when(col("gi") === 3, col("k") - 5)
          .otherwise(when(col("k") === 18, 0).otherwise(10)))
      .withColumn("country_iso", concat(lit("C"), col("ci").cast("string")))
      .select("scenario_geography", "country_iso")

  private def geoInputFixture(s: SparkSession, d: String): DataFrame =
    nation(s, d).filter(col("n_nationkey") < 10)
      .select(col("n_nationkey").cast("int").as("k"))
      .withColumn("scenario_geography", element_at(typedLit(geoNames), col("k") % 5 + 1))
      .withColumn("v", (col("k") + 1) * lit(0.25))
      .drop("k")

  /** The standardization chain (rename_geographies.R:144-176) in DuckDB:
    * '&' -> ' and ', title-case multi-word names (initcap replicated as a
    * per-word upper-first/lower-rest lambda — DuckDB has no initcap),
    * strip spaces, strip '(R5)' case-insensitively.
    */
  private def geoStdSql(x: String): String =
    s"""regexp_replace(replace(
       |  CASE WHEN contains(replace($x, '&', ' and '), ' ')
       |       THEN array_to_string(list_transform(
       |              string_split(replace($x, '&', ' and '), ' '),
       |              w -> upper(w[1]) || lower(w[2:])), ' ')
       |       ELSE replace($x, '&', ' and ') END,
       |  ' ', ''), '(?i)\\(r5\\)', '')""".stripMargin

  private val geographiesOracle: String =
    s"""WITH b AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 20),
       |lab AS (SELECT k,
       |    CASE WHEN k < 5 THEN 0 WHEN k < 10 THEN 1 WHEN k < 15 THEN 2
       |         WHEN k < 18 THEN 3 ELSE 4 END AS gi
       |  FROM b),
       |bench AS (SELECT
       |    ['EU','Euro Area','European Union (R5)','Latin America & Carib','Global'][gi + 1]
       |      AS scenario_geography,
       |    'C' || CAST(CASE gi WHEN 0 THEN k WHEN 1 THEN k - 5 WHEN 2 THEN k - 10
       |        WHEN 3 THEN k - 5 ELSE (CASE WHEN k = 18 THEN 0 ELSE 10 END) END
       |      AS VARCHAR) AS country_iso
       |  FROM lab),
       |cnt AS (SELECT scenario_geography AS g, COUNT(*) AS n FROM bench GROUP BY 1),
       |inter AS (SELECT a.scenario_geography AS g_x, bb.scenario_geography AS g_y,
       |    COUNT(*) AS c
       |  FROM bench a JOIN bench bb ON a.country_iso = bb.country_iso
       |    AND a.scenario_geography <> bb.scenario_geography
       |  GROUP BY 1, 2),
       |pairs AS (SELECT i.g_x, i.g_y FROM inter i JOIN cnt cx ON i.g_x = cx.g
       |  WHERE CAST(i.c AS DOUBLE) / cx.n >= 1.0),
       |dedup AS (SELECT *, row_number() OVER (
       |    PARTITION BY LEAST(g_x, g_y), GREATEST(g_x, g_y) ORDER BY g_x, g_y) AS rn
       |  FROM pairs),
       |nd AS (SELECT DISTINCT
       |    CASE WHEN length(g_x) >= length(g_y) THEN g_y ELSE g_x END AS shortest_name,
       |    CASE WHEN length(g_x) >= length(g_y) THEN g_x ELSE g_y END AS longest_name
       |  FROM dedup WHERE rn = 1),
       |pruned AS (SELECT n.* FROM nd n
       |  LEFT JOIN (SELECT DISTINCT shortest_name AS mid FROM nd) m
       |    ON n.longest_name = m.mid
       |  WHERE m.mid IS NULL),
       |std AS (SELECT bench.scenario_geography, bench.country_iso,
       |    ${geoStdSql("COALESCE(p.longest_name, bench.scenario_geography)")} AS newname
       |  FROM bench LEFT JOIN pruned p ON bench.scenario_geography = p.shortest_name),
       |mapping AS (SELECT DISTINCT scenario_geography AS old, newname FROM std),
       |input0 AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 10),
       |input AS (SELECT
       |    ['EU','Euro Area','European Union (R5)','Latin America & Carib','Global'][k % 5 + 1]
       |      AS scenario_geography
       |  FROM input0),
       |ren AS (SELECT COALESCE(m.newname, i.scenario_geography) AS g
       |  FROM input i LEFT JOIN mapping m ON i.scenario_geography = m.old),
       |icounts AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n_input_rows FROM ren GROUP BY g),
       |agg AS (SELECT scenario_geography, newname AS scenario_geography_newname,
       |    CAST(COUNT(*) AS BIGINT) AS n_countries
       |  FROM std GROUP BY 1, 2)
       |SELECT a.scenario_geography, a.scenario_geography_newname, a.n_countries,
       |  i.n_input_rows
       |FROM agg a LEFT JOIN icounts i ON i.g = a.scenario_geography_newname
       |ORDER BY a.scenario_geography""".stripMargin

  // ---- sm_toy_sample — the toy-data subsetting workflow ----------------

  /** abcd-shaped universe from nation keys 0..23: eight companies whose
    * market coverage varies 1-3 business units (the diversity weight
    * base), with company 6's only series CONSTANT (dropped by rule 1).
    */
  private def toyAbcdFixture(s: SparkSession, d: String): DataFrame =
    nation(s, d).filter(col("n_nationkey") < 24)
      .select(col("n_nationkey").cast("int").as("k"))
      .withColumn("company_id", col("k") % 8)
      .withColumn("bui", floor(col("k") / 8).cast("int"))
      .filter(col("bui") <= col("company_id") % 3)
      .withColumn("ald_sector", element_at(typedLit(Seq("Power", "Coal", "Oil&Gas")), col("bui") + 1))
      .withColumn("ald_business_unit", element_at(typedLit(Seq("CoalCap", "Coal", "Oil")), col("bui") + 1))
      .withColumn("ald_production_unit", element_at(typedLit(Seq("MW", "t", "GJ")), col("bui") + 1))
      .withColumn("i", explode(typedLit(Seq(0, 1, 2, 3))))
      .withColumn("year", lit(2022) + col("i"))
      .withColumn("plan_tech_prod",
        when(col("company_id") === 6, lit(2.0))
          .otherwise((col("k") + 1) * (col("i") + 1) * lit(0.25)))
      .withColumn("plan_emission_factor", (col("k") + 1) * lit(0.125))
      .drop("k", "bui", "i")

  private val toyKeys = "company_id, ald_sector, ald_business_unit, ald_production_unit"

  private val toySampleOracle: String =
    s"""WITH b AS (SELECT CAST(n_nationkey AS INT) AS k FROM nation WHERE n_nationkey < 24),
       |r0 AS (SELECT k, CAST(k % 8 AS INT) AS company_id, CAST(k // 8 AS INT) AS bui
       |  FROM b WHERE k // 8 <= (k % 8) % 3),
       |dims AS (SELECT k, company_id,
       |    ['Power','Coal','Oil&Gas'][bui + 1] AS ald_sector,
       |    ['CoalCap','Coal','Oil'][bui + 1] AS ald_business_unit,
       |    ['MW','t','GJ'][bui + 1] AS ald_production_unit
       |  FROM r0),
       |cells AS (SELECT d.company_id, d.ald_sector, d.ald_business_unit,
       |    d.ald_production_unit, 2022 + y.i AS year,
       |    CASE WHEN d.company_id = 6 THEN 2.0
       |         ELSE CAST((d.k + 1) * (y.i + 1) * 0.25 AS DOUBLE) END AS plan_tech_prod,
       |    CAST((d.k + 1) * 0.125 AS DOUBLE) AS plan_emission_factor
       |  FROM dims d CROSS JOIN (SELECT CAST(unnest(range(4)) AS INT) AS i) y),
       |nonconst AS (SELECT $toyKeys
       |  FROM cells GROUP BY $toyKeys HAVING COUNT(DISTINCT plan_tech_prod) > 1),
       |clean AS (SELECT c.* FROM cells c
       |  JOIN nonconst n USING (company_id, ald_sector, ald_business_unit, ald_production_unit)),
       |div AS (SELECT company_id, CAST(COUNT(*) AS BIGINT) AS n_bu FROM
       |    (SELECT DISTINCT company_id, ald_sector, ald_business_unit FROM clean)
       |  GROUP BY company_id),
       |cand AS (SELECT DISTINCT ald_sector, ald_business_unit, company_id FROM clean),
       |tick AS (SELECT c.ald_sector, c.ald_business_unit, c.company_id,
       |    CAST(CAST(concat('0x', substr(md5(
       |      c.ald_sector || '|' || c.ald_business_unit || '|' ||
       |      CAST(c.company_id AS VARCHAR) || '|' || CAST(t.t AS VARCHAR)), 1, 8)) AS BIGINT)
       |      % 1000000 AS BIGINT) AS bkt
       |  FROM cand c JOIN div d USING (company_id),
       |    unnest(generate_series(1, d.n_bu * d.n_bu * d.n_bu)) AS t(t)),
       |keyed AS (SELECT ald_sector, ald_business_unit, company_id, MIN(bkt) AS minb
       |  FROM tick GROUP BY 1, 2, 3),
       |sel AS (SELECT ald_sector, ald_business_unit, company_id FROM (
       |    SELECT *, row_number() OVER (PARTITION BY ald_sector, ald_business_unit
       |      ORDER BY minb, company_id) AS rk FROM keyed) WHERE rk <= 2)
       |SELECT c.company_id, c.ald_sector, c.ald_business_unit, c.ald_production_unit,
       |  c.year, c.plan_tech_prod, c.plan_emission_factor
       |FROM clean c JOIN sel s USING (ald_sector, ald_business_unit, company_id)
       |ORDER BY c.ald_sector, c.ald_business_unit, c.company_id, c.year""".stripMargin

  def queries: Seq[Q] = Seq(
    Q("pipe_geographies", geographiesOracle) { (s, d) =>
      // The stage-5 geography regroup/rename (run_workflow.R:24-25,
      // rename_geographies.R:216-268) under the hash gate: set-overlap
      // grouping at tolerance 1, transitive-chain pruning (EU ->
      // Euro Area -> European Union (R5): the middle mapping dies), name
      // standardization ('&' -> ' and ', title-case, space strip, (R5)
      // strip), the mapping rewrite over an input frame, and the closing
      // containment check — one relation carrying the old -> new mapping,
      // per-geography country counts and the renamed input's row counts.
      val (benchOut, renamed) = Geographies.regroupAndRenameGeographies(
        geoBenchFixture(s, d), Seq(geoInputFixture(s, d)))
      val counts = renamed.head
        .groupBy(col("scenario_geography").as("__g"))
        .agg(count(lit(1)).as("n_input_rows"))
      benchOut.groupBy("scenario_geography", "scenario_geography_newname")
        .agg(count(lit(1)).as("n_countries"))
        .join(counts, col("scenario_geography_newname") === col("__g"), "left")
        .drop("__g")
        .orderBy("scenario_geography")
    },
    Q("sm_toy_sample", toySampleOracle) { (s, d) =>
      // The toy-data subsetting workflow (reference data-raw/
      // sampling_scripts/create-toy-data.Rmd, "to_share" path):
      // constant-production series dropped, then per (sector, business
      // unit) TWO companies drawn without replacement with diversity
      // weight n_bu^3 — the weighted draw as integer ticket-minimum
      // order statistics over the md5 uniform, so the oracle replays
      // the exact subset (no cross-engine pow/ln ulp risk).
      ToyData.sampleNCompaniesWeighted(
        ToyData.removeConstantProductions(toyAbcdFixture(s, d)), n = 2)
        .orderBy("ald_sector", "ald_business_unit", "company_id", "year")
    },
    Q("s21_multi_partition",
      """WITH e AS (SELECT event_type, event_id % 3 AS b, value FROM events
        |  WHERE value IS NOT NULL),
        |v1 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |  FROM e GROUP BY event_type),
        |v2r AS (SELECT event_type,
        |    CASE WHEN event_type = 'click' AND b = 1 THEN value * 2 ELSE value END AS value
        |  FROM e),
        |v2 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |  FROM v2r GROUP BY event_type),
        |v3 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |  FROM v2r WHERE event_type <> 'view' GROUP BY event_type)
        |SELECT CAST(1 AS INT) AS version, event_type, n, value_sum FROM v1
        |UNION ALL SELECT CAST(2 AS INT), event_type, n, value_sum FROM v2
        |UNION ALL SELECT CAST(3 AS INT), event_type, n, value_sum FROM v3
        |ORDER BY version, event_type""".stripMargin) { (s, d) =>
      // MULTI-COLUMN partitioned snapshot publishes (VERDICT r12 #6):
      // v1 lands the events table as a NESTED event_type=*/b=* layout
      // (15 leaf partitions), v2 replaces exactly ONE leaf
      // (click/b=1, values doubled) — every sibling leaf and every other
      // event_type's leaves carry over verbatim — and v3 drops the
      // whole event_type=view ANCESTOR level via dropPartitions prefix
      // coverage (all three of its leaves leave the manifest, no data
      // file moves). Reading all three versions after v3 landed proves
      // pinned reads, leaf-grain replacement and ancestor-grain drops
      // on the nested layout. SnapshotSpec pins the file-level locality.
      import graft.core.{Num, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_s21_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"), col("value"),
          pmod(col("event_id"), lit(3)).cast("int").as("b"))
      val v1 = Snapshots.publishPartitions(s, root)(stage =>
        ev.write.partitionBy("event_type", "b").parquet(stage))
      val v2 = Snapshots.publishPartitions(s, root)(stage =>
        ev.filter(col("event_type") === "click" && col("b") === 1)
          .withColumn("value", col("value") * 2)
          .write.partitionBy("event_type", "b").parquet(stage))
      val v3 = Snapshots.publishPartitions(s, root,
        dropPartitions = Seq("event_type=view"))(_ => ())
      def agg(v: Long) = Snapshots.readSnapshot(s, root, Some(v))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
        .withColumn("version", lit(v).cast("int"))
      agg(v1).unionByName(agg(v2)).unionByName(agg(v3))
        .select("version", "event_type", "n", "value_sum")
        .orderBy("version", "event_type")
    },
    Q("pipe_financial", financialOracle) { (s, d) =>
      // The prewrangled_financial_data_stress_test deliverable
      // (outputs_structure.dbml:14-22) end-to-end: per-ISIN medians with
      // NaN-skip, implausible-npm nulling, closest-parent resolution over
      // the ownership tree, the three-tier average attach (sector x
      // region -> sector -> global) with sample-size and npm-range gates,
      // provenance labels + pivot counts, company-level medians and
      // rawdata ratios, under the reference's no-null assertion — the
      // full prepare_financial_data DAG.
      Financial.prepareFinancialData(s,
        finEikonFixture(s, d), finCompaniesFixture(s, d), Some(finTreeFixture(s)),
        minimumSampleSize = 1.0, minimumRatioSample = 2.0,
        allowedRangeNpm = (0.0, 1.0))
        .orderBy("company_id")
    },
    Q("pipe_abcd", abcdOracle) { (s, d) =>
      // The abcd_stress_test_input deliverable (outputs_structure.dbml:
      // 40-54) end-to-end: wide unpivot + sum-or-all-null dedup, the
      // activities/emissions full outer match, completion +
      // interpolation + fill-down + zero-coalesce, the EF ratio with
      // MW/MWh matching, sector-average EF fill, empty-production key
      // drop, sector/year filters and deterministic asset ids — the
      // full prepare_abcd_data DAG under the hash gate.
      Abcd.prepareAbcdData(
        abcdActivitiesFixture(s, d), abcdEmissionsFixture(s, d),
        startYear = 2022, timeHorizon = 3,
        sectorList = Seq("Power", "Oil&Gas", "Coal"))
        .orderBy("company_id", "asset_id", "year")
    },
    Q("pipe_scenarios", scenariosOracle) { (s, d) =>
      // The Scenarios_AnalysisInput deliverable (outputs_structure.dbml:
      // 1-13) end-to-end through the FULL stage runner: per-group
      // completion + interpolation, tmsr/smsp market shares, P4I
      // formatting with green-tech directions, the WEO2021 scenario
      // filters + renames + prefixing, NA-perimeter removal, sector
      // completeness, baseline/shock typing, ald_business_unit rename —
      // run_prepare_Scenarios_AnalysisInput.R as one plan.
      ScenarioData.prepareScenariosAnalysisInput(
        ScenarioData.ScenarioInputs(weoGeco = Some(scenariosFixture(s, d))), 2020)
        .orderBy("scenario", "ald_sector", "ald_business_unit", "year")
    },
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
    Q("pipe_lcoe_weo", lcoeWeoOracle) { (s, d) =>
      // The LCOE implied-price adjustment (prepare_LCOE_adjusted_price_
      // data.R:18-71) over the REAL WEO2021 price pipeline output — the
      // adjustedWeoPrices leg every vintage merge starts from: Power LCOE
      // rows become implied market prices (lcoe_t0/(1-npm) scaled by the
      // cost factor), everything else passes through unchanged.
      Prices.lcoeAdjustedPrices(
        Prices.preparePriceDataLongWeo2021(
          pricesFossilFixture(s, d), pricesPowerFixture(s, d)),
        averageNpmPower = 0.115, startYear = 2020)
        .orderBy("source", "scenario", "scenario_geography", "sector", "technology",
          "indicator", "unit", "year")
    },
    Q("pipe_lcoe_oxford", lcoeOxfordOracle) { (s, d) =>
      // prepare_lcoe_adjusted_price_data_oxford2022 (reference :81-258)
      // end-to-end: Oxford wrangle (recode branches, RenewablesCap
      // mean-collapse, OilCap clone), implied-price adjustment, 2070-2100
      // extension filled by the 2049-2069 closed-form OLS fit, and the
      // NGFS model x scenario fan-out merged with the Oxford relabels.
      Prices.prepareLcoeAdjustedPriceDataOxford2022(
        oxfordLcoeFixture(s, d), averageNpmPower = 0.115, startYear = 2021,
        ngfsVintage = "2023")
        .orderBy("scenario", "scenario_geography", "technology", "year")
    },
    Q("pipe_lcoe_steel", lcoeSteelOracle) { (s, d) =>
      // MP_LC_steel_wrangling + prepare_lc_adjusted_price_data_steel
      // (reference :333-448): Global mean over regions, technology
      // fan-outs (EAF->BF-EAF, BF-BOF->{BOF, BF-OHF}), the implied-price
      // adjustment under the steel npm, scenario relabels.
      Prices.prepareLcAdjustedPriceDataSteel(
        Prices.mpLcSteelWrangling(steelLcFixture(s, d)),
        averageNpmSteel = 0.06866203, startYear = 2022)
        .orderBy("scenario", "scenario_geography", "technology", "year")
    },
    Q("pipe_workflow_financial", workflowFinancialOracle) { (s, d) =>
      // The TRISK-v2 financial_features.csv deliverable (run_workflow.R:
      // 264-267): the full prepare_financial_data DAG projected to the v2
      // feature schema — the last reshape stage of the reference workflow
      // under the hash gate.
      Workflow.triskV2FinancialFeatures(
        Financial.prepareFinancialData(s,
          finEikonFixture(s, d), finCompaniesFixture(s, d), Some(finTreeFixture(s)),
          minimumSampleSize = 1.0, minimumRatioSample = 2.0,
          allowedRangeNpm = (0.0, 1.0)))
        .orderBy("company_id")
    },
    Q("pipe_workflow_assets", workflowAssetsOracle) { (s, d) =>
      // The TRISK-v2 assets.csv deliverable (run_workflow.R:112-177):
      // prepare_abcd_data composed with the reshape — asset_id dropped
      // first so the row_number synthesis branch (:125-136) is the path
      // under test, capacity = max production per asset with
      // capacity_factor = prod/capacity (:149-158), placeholder columns
      // and renames, full 15-column v2 schema.
      val abcd = Abcd.prepareAbcdData(
        abcdActivitiesFixture(s, d), abcdEmissionsFixture(s, d),
        startYear = 2022, timeHorizon = 3,
        sectorList = Seq("Power", "Oil&Gas", "Coal"))
      Workflow.triskV2Assets(abcd.drop("asset_id"))
        .orderBy("asset_id", "production_year")
    },
    Q("pipe_workflow_scenarios", workflowScenariosOracle) { (s, d) =>
      // The TRISK-v2 scenarios.csv deliverable (run_workflow.R:186-256):
      // the scenario pipeline (replicated across Global + a doubled US
      // slice), the capacity-factor pipeline (left join, NA -> 1.0), the
      // price pipeline under the runner's vintage prefix + Global write
      // filter (inner join — Power CoalCap carries no price and drops),
      // and the bench-region country list, reshaped to the 14-column v2
      // schema with provider-prefix extraction and type recodes.
      // the three upstream pipelines are independent; building them on
      // the small pool overlaps their eager construction jobs (the
      // RunWorkflow.run treatment, guide §2.6) — same frames, same result
      val legs = graft.core.Pools.mapAll(Seq[() => org.apache.spark.sql.DataFrame](
        () => ScenarioData.prepareScenariosAnalysisInput(
          ScenarioData.ScenarioInputs(
            weoGeco = Some(scenariosFixture(s, d, workflowGeos))), 2020),
        () => CapacityFactors.prepareCapacityFactorsWeo2021(capacityFactorsFixture(s, d), 2020)
          .withColumnRenamed("technology", "ald_business_unit"),
        () => Prices.preparePriceDataLongWeo2021(
            pricesFossilFixture(s, d), pricesPowerFixture(s, d))
          .withColumn("scenario", concat(lit("WEO2021_"), col("scenario")))
          .drop("source")
          .filter(col("scenario_geography") === "Global")
          .withColumnRenamed("sector", "ald_sector")
          .withColumnRenamed("technology", "ald_business_unit")), 3)(_())
      Workflow.triskV2Scenarios(legs(0), legs(1), legs(2), benchRegionsFixture(s, d))
        .orderBy("scenario", "scenario_geography", "sector", "technology", "scenario_year")
    },
    Q("pipe_asset_impact", assetImpactOracle) { (s, d) =>
      // The AR cleanup (R/prepare_asset_impact_data.R:47-244) under the
      // hash gate: both frames through the full
      // prepare_asset_impact_data chain — technology recodes (fuel,
      // vehicle, steel matrix), Unknown-Owner drop, LDV/tech sector
      // realignment, sum-or-all-null technology_type aggregate,
      // proportion-emissions drop, ald_business_unit rename + region drop
      // — emitted as one tagged relation (the wide ownership columns
      // renamed parquet-safe).
      val (act, emis) = AssetImpact.prepareAssetImpactData(
        aiActivitiesFixture(s, d), aiEmissionsFixture(s, d))
      def tagged(df: DataFrame, frame: String): DataFrame = df
        .withColumn("frame", lit(frame))
        .select(col("frame"), col("company_id"), col("company_name"),
          col("ald_sector"), col("ald_business_unit"), col("activity_unit"),
          col("ald_location"),
          col("Equity Ownership 2022").as("eo_2022"),
          col("Equity Ownership 2023").as("eo_2023"),
          col("Equity Ownership 2024").as("eo_2024"),
          col("Equity Ownership 2025").as("eo_2025"))
      tagged(act, "activities").unionByName(tagged(emis, "emissions"))
        .orderBy("frame", "company_id", "ald_sector", "ald_business_unit",
          "activity_unit")
    },
    Q("pipe_datalake", datalakeOracle) { (s, d) =>
      // The datalake prep (data-raw/prep_datalake.R) under the hash gate:
      // both eikon vintage wrangles (the archived feed's npm repair
      // ladder), the per-isin median collapse, the new-vintage-wins merge
      // with isin-country ald_location, the ids trustworthiness attach +
      // null-isin consistency gate (a throwing check — running it IS the
      // assertion), and the ownership-tree majority-parent prewrangle,
      // joined into the one per-id-row relation the financial runner
      // consumes (eikon indicators by isin, level-1 majority parent by
      // company).
      val eikonNew = Datalake.eikonMediansByIsin(
        Datalake.wrangleEikonNew(dlEikonNewFixture(s, d)))
      val eikon = Datalake.mergeEikonVintages(
        Datalake.wrangleEikonOld(dlEikonOldFixture(s, d)), eikonNew)
      val ids = Datalake.enforceIsinConsistency(
        Datalake.attachAdditionalIsins(dlIdsFixture(s, d), dlNewIdIsinsFixture(s, d)))
      val parents = Datalake.prewrangleOwnershipTree(dlTreeFixture(s, d))
        .filter(col("ownership_level") === 1)
        .select(col("subsidiary_company_id").as("__sub"),
          col("parent_company_id"), col("linking_stake"))
      ids.join(eikon, Seq("isin"), "left")
        .join(parents, col("company_id") === col("__sub"), "left")
        .drop("__sub")
        .select("company_id", "company_name", "isin", "trustworthy", "ald_location",
          "pd", "net_profit_margin", "debt_equity_ratio", "volatility", "asset_drift",
          "parent_company_id", "linking_stake")
        .orderBy(col("company_id"), col("isin"))
    },
    Q("pipe_workflow_align", workflowAlignOracle) { (s, d) =>
      // Stage 6 of run_workflow.R (:39-72) under the hash gate: the
      // cross-dataset alignment run over the REAL composed pipelines
      // (scenario prepare, WEO2021 capacity factors, WEO2021 prices under
      // the runner's vintage prefix + Global filter), with a deliberate
      // post-prepare coverage mix (see [[workflowAlignOracle]]) so three of
      // the four perimeters drop and the surviving frames shrink
      // non-trivially (the cf leg also loses its NZE/APS clones).
      // independent upstream legs built on the small pool (guide §2.6, the
      // pipe_workflow_scenarios treatment) — same frames, same result
      val legs = graft.core.Pools.mapAll(Seq[() => DataFrame](
        () => ScenarioData.prepareScenariosAnalysisInput(
          ScenarioData.ScenarioInputs(
            weoGeco = Some(scenariosFixture(s, d, workflowGeos))), 2020)
          .filter(col("ald_business_unit") =!= "OilCap" &&
            (col("ald_business_unit") =!= "GasCap" ||
              (col("scenario") === "WEO2021_STEPS" && col("scenario_geography") === "US")) &&
            (col("ald_business_unit") =!= "NuclearCap" || col("scenario") === "WEO2021_SDS")),
        () => CapacityFactors.prepareCapacityFactorsWeo2021(capacityFactorsFixture(s, d), 2020)
          .withColumnRenamed("technology", "ald_business_unit"),
        () => Prices.preparePriceDataLongWeo2021(
            pricesFossilFixture(s, d), pricesPowerFixture(s, d))
          .withColumn("scenario", concat(lit("WEO2021_"), col("scenario")))
          .drop("source")
          .filter(col("scenario_geography") === "Global")
          .withColumnRenamed("sector", "ald_sector")
          .withColumnRenamed("technology", "ald_business_unit")), 3)(_())
      val (alignedScen, alignedPrices, alignedCf) =
        Workflow.alignDatasets(legs(0), legs(2), legs(1))
      def leg(df: DataFrame, frame: String, bu: String): DataFrame =
        df.groupBy(col("scenario"), col("scenario_geography"),
            col(bu).as("ald_business_unit"))
          .agg(count(lit(1)).as("n_rows"))
          .withColumn("frame", lit(frame))
      leg(alignedScen, "scenarios", "ald_business_unit")
        .unionByName(leg(alignedPrices, "prices", "ald_business_unit"))
        .unionByName(leg(alignedCf, "capacity_factors", "ald_business_unit"))
        .select("frame", "scenario", "scenario_geography", "ald_business_unit", "n_rows")
        .orderBy("frame", "scenario", "scenario_geography", "ald_business_unit")
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
