package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Prices

class PricesSpec extends SparkTestBase {
  import spark.implicits._

  private def fossilWide = Seq(
    ("WEO2021", "Crude oil", "usd/barrel", "Global", "SDS", 100.0, 50.0),
    ("WEO2021", "Coal", "usd/tonnes", "EU", "SDS", 60.0, 40.0),
    ("WEO2021", "Coal", "usd/tonnes", "US", "SDS", 80.0, 60.0))
    .toDF("source", "sector", "unit", "scenario_geography", "scenario", "2020", "2030")

  private def powerWide = Seq(
    ("WEO2021", "SDS", "EU", "Gas CCGT", "LCOE", "usd/MWh", 70.0, 50.0),
    ("WEO2021", "SDS", "EU", "Solar PV", "LCOE", "usd/MWh", 40.0, 20.0),
    ("WEO2021", "SDS", "EU", "Wind onshore", "LCOE", "usd/MWh", 60.0, 40.0),
    ("WEO2021", "SDS", "EU", "Gas CCGT", "CAPEX", "usd/kW", 999.0, 999.0)) // dropped
    .toDF("source", "scenario", "region", "technology", "indicator", "unit", "2020", "2030")

  test("WEO2021 prices: unit conversion, global mean, placeholders, interpolation") {
    val out = Prices.preparePriceDataLongWeo2021(fossilWide, powerWide)
    // oil barrel -> GJ conversion
    val oil = out.filter(col("technology") === "Oil" && col("year") === 2020)
      .select("price", "unit").as[(Double, String)].head()
    assert(oil == ((16.0, "GJ")))
    // coal global = mean of EU (60) and US (80)
    val coalGlobal = out.filter(col("technology") === "Coal" &&
      col("scenario_geography") === "Global" && col("year") === 2020)
      .select("price").as[Double].head()
    assert(coalGlobal == 70.0)
    // renewables averaged: (40+60)/2 = 50 at 2020; HydroCap placeholder clones it
    val renew = out.filter(col("technology") === "RenewablesCap" &&
      col("scenario_geography") === "EU" && col("year") === 2020).select("price").as[Double].head()
    assert(renew == 50.0)
    val hydro = out.filter(col("technology") === "HydroCap" &&
      col("scenario_geography") === "EU" && col("year") === 2020).select("price").as[Double].head()
    assert(hydro == 50.0)
    // OilCap placeholder = GasCap
    assert(out.filter(col("technology") === "OilCap").count() > 0)
    // completed + interpolated: every year 2020..2030, never null
    val coalEu = out.filter(col("technology") === "Coal" && col("scenario_geography") === "EU")
    assert(coalEu.count() == 11)
    assert(coalEu.filter(col("price").isNull).count() == 0)
    val mid = coalEu.filter(col("year") === 2025).select("price").as[Double].head()
    assert(mid == 50.0) // halfway 60 -> 40
    // CAPEX indicator rows were dropped
    assert(out.filter(col("indicator") === "CAPEX").count() == 0)
  }

  test("LCOE adjustment: implied price scaled by cost factor") {
    val input = Seq(
      ("S", "sc", "Global", "Power", "GasCap", "LCOE", "usd/MWh", 2020, 100.0),
      ("S", "sc", "Global", "Power", "GasCap", "LCOE", "usd/MWh", 2021, 80.0),
      ("S", "sc", "Global", "Coal", "Coal", "price", "usd/t", 2020, 60.0))
      .toDF("source", "scenario", "scenario_geography", "sector", "technology",
        "indicator", "unit", "year", "price")
    val out = Prices.lcoeAdjustedPrices(input, averageNpmPower = 0.2, startYear = 2020)
    val gas = out.filter(col("technology") === "GasCap")
      .select("year", "price").as[(Int, Double)].collect().toMap
    assert(gas(2020) == 125.0)          // 100 / (1 - 0.2)
    assert(gas(2021) == 156.25)         // 125 * (100/80)
    assert(out.filter(col("indicator") === "LCOE").count() == 0)
    // non-LCOE rows pass through untouched
    assert(out.filter(col("sector") === "Coal").select("price").as[Double].head() == 60.0)
  }

  test("extrapolatePrices fills 2070-2100 with the fitted line") {
    val rows = (2049 to 2069).map(y => ("t1", "s1", y, 10.0 + 2.0 * (y - 2049)))
    val df = rows.toDF("technology", "scenario", "year", "price")
    val out = Prices.extrapolatePrices(df)
    assert(out.count() == (2100 - 2049 + 1))
    val p2100 = out.filter(col("year") === 2100).select("price").as[Double].head()
    assert(math.abs(p2100 - (10.0 + 2.0 * (2100 - 2049))) < 1e-9)
    assert(out.filter(col("price").isNull).count() == 0)
  }

  test("fanOutNgfsScenarios: 3 models x fast/slow sets + Oxford renames") {
    val df = Seq(
      ("fast_transition_oxford", "Power", "Global", "GasCap", "usd/MWh", "price", 2020, 1.0),
      ("no_transition_oxford", "Power", "Global", "GasCap", "usd/MWh", "price", 2020, 2.0),
      ("slow_transition_oxford", "Power", "Global", "GasCap", "usd/MWh", "price", 2020, 3.0))
      .toDF("scenario", "sector", "scenario_geography", "technology", "unit",
        "indicator", "year", "price")
    val out = Prices.fanOutNgfsScenarios(df, "2023")
    // fast: 3 models x 4 scenarios; slow: 3 x 3; oxford: fast + base
    assert(out.count() == 12 + 9 + 2)
    assert(out.filter(col("scenario") === "NGFS2023GCAM_NZ2050").count() == 1)
    assert(out.filter(col("scenario") === "Oxford2021_base").count() == 1)
    assert(out.filter(col("scenario").contains("slow_transition")).count() == 0)
  }
}
