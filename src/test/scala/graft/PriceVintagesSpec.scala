package graft

import org.apache.spark.sql.functions._
import graft.pipelines.Prices

/** Round-2 price vintages (reference R/prepare_price_data_long.R:247-769 and
  * R/prepare_LCOE_adjusted_price_data.R:81-448). Every produced frame is
  * asserted price >= 0 (the reference's hard invariant).
  */
class PriceVintagesSpec extends SparkTestBase {
  import spark.implicits._

  private def assertNonNegative(df: org.apache.spark.sql.DataFrame): Unit = {
    val bad = df.filter(col("price") < 0 || col("price").isNull).count()
    assert(bad == 0, s"$bad null/negative prices")
  }

  private def ngfsRow(scenario: String, catC: String, year: Int, value: Double) =
    ("GCAM 6.0 NGFS", scenario, "World", "V", "Price", "Primary Energy", catC,
      "US$2010/GJ", year, value)

  test("NGFS2023/2024 prices: interpolate, unit split, coal conversion, unite") {
    val df = Seq(
      ngfsRow("Net Zero 2050", "Oil", 2030, 10.0),
      ngfsRow("Net Zero 2050", "Oil", 2032, 14.0),
      ngfsRow("Net Zero 2050", "Coal", 2030, 2.0),
      ngfsRow("Net Zero 2050", "Coal", 2032, 3.0))
      .toDF("Model", "Scenario", "Region", "Variable", "category_a", "category_b",
        "category_c", "Unit", "year", "value")
    val out = Prices.preparePriceDataLongNgfs2023(df, startYear = 2030).cache()
    assertNonNegative(out)
    assert(out.select("scenario").distinct().as[String].head() == "NGFS2023GCAM_NZ2050")
    // interpolation filled 2031
    val oil2031 = out.filter(col("technology") === "Oil" && col("year") === 2031)
      .select("price").as[Double].head()
    assert(oil2031 == 12.0)
    assert(out.filter(col("technology") === "Oil")
      .select("unit").distinct().as[String].head() == "$/GJ")
    // coal $/GJ -> $/tonnes: / 0.03414368
    val coal2030 = out.filter(col("technology") === "Coal" && col("year") === 2030)
      .select("price").as[Double].head()
    assert(math.abs(coal2030 - 2.0 / 0.03414368) < 1e-9)
    assert(out.filter(col("technology") === "Coal")
      .select("unit").distinct().as[String].head() == "$/tonnes")
    val v5 = Prices.preparePriceDataLongNgfs2024(df, startYear = 2030)
    assert(v5.select("scenario").distinct().as[String].head() == "NGFS2024GCAM_NZ2050")
  }

  test("IPR2023 prices: staged global means, high/low averaging, unit conversion") {
    def row(scen: String, region: String, vc: String, svc1: String, year: Int, v: Double) =
      (scen, region, "USD", vc, svc1, year, v)
    val df = Seq(
      // coal: two regions averaged within one variable class
      row("FPS", "Europe", "price", "Coal", 2030, 80.0),
      row("FPS", "USA", "price", "Coal", 2030, 120.0),
      // gas: two regions per class, then high/low averaged
      row("FPS", "USA", "high price", "Natural gas", 2030, 12.0),
      row("FPS", "Europe", "high price", "Natural gas", 2030, 8.0),
      row("FPS", "USA", "low price", "Natural gas", 2030, 6.0),
      row("FPS", "Europe", "low price", "Natural gas", 2030, 4.0),
      // oil: high/low in one region averaged directly
      row("FPS", "WORLD", "high price", "Oil", 2030, 100.0),
      row("FPS", "WORLD", "low price", "Oil", 2030, 60.0))
      .toDF("Scenario", "Region", "Units", "Variable_class", "Sub_variable_class_1",
        "year", "value")
    val out = Prices.preparePriceDataLongIpr2023(df, startYear = 2025).cache()
    assertNonNegative(out)
    assert(out.select("scenario_geography").distinct().as[String].head() == "Global")
    // coal mean(80,120)=100, unit usd/tonne unconverted
    val coal = out.filter(col("technology") === "Coal").select("price").as[Double].head()
    assert(coal == 100.0)
    assert(out.filter(col("technology") === "Coal")
      .select("unit").as[String].head() == "usd/tonne")
    // gas: mean(12,8)=10 high, mean(6,4)=5 low -> mean 7.5, MMBtu->GJ
    val gas = out.filter(col("technology") === "Gas").select("price").as[Double].head()
    assert(math.abs(gas - 7.5 * 0.9478171203) < 1e-9)
    // oil: mean(100,60)=80, barrel->GJ
    val oil = out.filter(col("technology") === "Oil").select("price").as[Double].head()
    assert(math.abs(oil - 80.0 * 0.16) < 1e-9)
    assert(out.select("indicator").distinct().as[String].head() == "price")
  }

  test("IPR2023 power prices: shared WEO LCOE wrangle standalone with asserts") {
    val wide = Seq(
      ("WEO2021", "SDS", "US", "Gas CCGT", "LCOE", "usd/MWh", 60.0, 50.0),
      ("WEO2021", "SDS", "US", "Solar PV", "LCOE", "usd/MWh", 40.0, 20.0),
      ("WEO2021", "SDS", "US", "Wind onshore", "LCOE", "usd/MWh", 50.0, 30.0),
      ("WEO2021", "SDS", "EU", "Gas CCGT", "LCOE", "usd/MWh", 70.0, 55.0))
      .toDF("source", "scenario", "region", "technology", "indicator", "unit", "2020", "2040")
    val out = Prices.preparePriceDataLongPowerIpr2023(wide).cache()
    assertNonNegative(out)
    val techs = out.select("technology").distinct().as[String].collect().toSet
    // GasCap + RenewablesCap + placeholders OilCap/HydroCap
    assert(techs == Set("GasCap", "RenewablesCap", "OilCap", "HydroCap"))
    // renewables collapse: US 2020 mean(40,50)=45
    val renewUs = out.filter(col("technology") === "RenewablesCap" &&
      col("scenario_geography") === "US" && col("year") === 2020)
      .select("price").as[Double].head()
    assert(renewUs == 45.0)
    // global mean over regions for GasCap 2020: mean(60,70)=65
    val gasGlobal = out.filter(col("technology") === "GasCap" &&
      col("scenario_geography") === "Global" && col("year") === 2020)
      .select("price").as[Double].head()
    assert(gasGlobal == 65.0)
    // interpolated interior year exists (completed 2020..2040)
    assert(out.filter(col("year") === 2030).count() > 0)
  }

  test("Oxf2021 fossil prices: extension, conversions, OLS fill, slow dropped") {
    val years = (2021 to 2069)
    def series(tech: String, base: Double, slope: Double) =
      years.map(y => (tech, "Fossil Fuels", "Oxford - fast_transition", "World", y,
        base + slope * (y - 2021)))
    val df = (series("Oil", 36.0, 0.36) ++ series("Coal", 12.2835, 0.12) ++
      series("Gas", 18.0, 0.18) ++
      years.map(y => ("Oil", "Fossil Fuels", "Oxford - slow_transition", "World", y, 99.0)))
      .toDF("Technology", "Sector", "Scenario", "Region", "Year", "LCOE")
    val out = Prices.preparePriceDataLongOxf2021(df, startYear = 2021).cache()
    assertNonNegative(out)
    assert(out.select("scenario").distinct().as[String].collect().toSet ==
      Set("Oxford2021_fast"))
    // conversion at 2021: oil 36/3.6 = 10 $/GJ; coal 12.2835/0.122835 = 100 usd/tonne
    val oil2021 = out.filter(col("technology") === "Oil" && col("year") === 2021)
      .select("price").as[Double].head()
    assert(math.abs(oil2021 - 10.0) < 1e-9)
    val coal2021 = out.filter(col("technology") === "Coal" && col("year") === 2021)
      .select("price").as[Double].head()
    assert(math.abs(coal2021 - 100.0) < 1e-9)
    // 2070-2100 extension filled by the 2049-2069 OLS line (exact for a line)
    val oil2100 = out.filter(col("technology") === "Oil" && col("year") === 2100)
      .select("price").as[Double].head()
    assert(math.abs(oil2100 - (36.0 + 0.36 * (2100 - 2021)) / 3.6) < 1e-6)
    assert(out.filter(col("year") === 2100).count() == 3)
  }

  test("oxford2022 LCOE adjust: implied price, fan-out to NGFS + Oxford labels") {
    def row(scen: String, tech: String, subTech: String, year: Int, lcoe: Double) =
      ("Power", scen, "World", tech, subTech, year, lcoe)
    val years = 2021 to 2069
    val df = (years.flatMap { y =>
      Seq(
        row("Oxford - fast_transition", "Natural gas", null, y, 60.0),
        row("Oxford - fast_transition", "Renewables", "Solar", y, 40.0 - 0.2 * (y - 2021)),
        row("Oxford - fast_transition", "Renewables", "Wind", y, 50.0 - 0.2 * (y - 2021)),
        row("Oxford - no_transition", "Natural gas", null, y, 60.0))
    } ++ Seq(row("Oxford - slow_transition", "Natural gas", null, 2021, 99.0)))
      .toDF("Sector", "Scenario", "Region", "Technology", "Sub_Technology", "Year", "LCOE")
    val out = Prices.prepareLcoeAdjustedPriceDataOxford2022(
      df, averageNpmPower = 0.1, startYear = 2021, ngfsVintage = "2023").cache()
    assertNonNegative(out)
    val scen = out.select("scenario").distinct().as[String].collect().toSet
    // 3 models x 4 fast + 3 models x 3 slow + 2 oxford = 23
    assert(scen.size == 23)
    assert(scen.contains("NGFS2023GCAM_NZ2050"))
    assert(scen.contains("NGFS2023MESSAGE_CP"))
    assert(scen.contains("Oxford2021_fast"))
    assert(!scen.exists(_.contains("slow")))
    // flat GasCap series: implied price = 60 / 0.9, cost factor 1 -> constant
    val gas = out.filter(col("technology") === "GasCap" &&
      col("scenario") === "Oxford2021_base" && col("year") === 2040)
      .select("price").as[Double].head()
    assert(math.abs(gas - 60.0 / 0.9) < 1e-9)
    // OilCap clone exists with GasCap prices
    val oil = out.filter(col("technology") === "OilCap" &&
      col("scenario") === "Oxford2021_base" && col("year") === 2040)
      .select("price").as[Double].head()
    assert(oil == gas)
    // renewables collapsed to the mean and adjusted: t0 mean = 45, implied 50
    val renew2021 = out.filter(col("technology") === "RenewablesCap" &&
      col("scenario") === "Oxford2021_fast" && col("year") === 2021)
      .select("price").as[Double].head()
    assert(math.abs(renew2021 - 45.0 / 0.9) < 1e-9)
    // extension years extrapolated
    assert(out.filter(col("year") === 2100 && col("scenario") === "Oxford2021_fast").count() > 0)
  }

  test("IPR2023 LCOE adjust: SDS duplicated to FPS and RPS, Global only") {
    val df = Seq(
      ("WEO2021", "SDS", "Global", "Power", "GasCap", "LCOE", "usd/MWh", 2021, 60.0),
      ("WEO2021", "SDS", "Global", "Power", "GasCap", "LCOE", "usd/MWh", 2030, 30.0),
      ("WEO2021", "SDS", "EU", "Power", "GasCap", "LCOE", "usd/MWh", 2021, 70.0),
      ("WEO2021", "STEPS", "Global", "Power", "GasCap", "LCOE", "usd/MWh", 2021, 65.0))
      .toDF("source", "scenario", "scenario_geography", "sector", "technology",
        "indicator", "unit", "year", "price")
    val out = Prices.prepareLcoeAdjustedPriceDataIpr2023(df, 0.1, 2021).cache()
    assertNonNegative(out)
    assert(out.select("scenario").distinct().as[String].collect().toSet ==
      Set("IPR2023_FPS", "IPR2023_RPS"))
    assert(out.select("scenario_geography").distinct().as[String].head() == "Global")
    // cost factor doubles the 2030 price: implied 60/0.9 * (60/30)
    val p2030 = out.filter(col("year") === 2030 && col("scenario") === "IPR2023_FPS")
      .select("price").as[Double].head()
    assert(math.abs(p2030 - (60.0 / 0.9) * 2.0) < 1e-9)
    assert(out.select("indicator").distinct().as[String].head() == "price")
  }

  test("MP steel LC wrangle + adjust: global mean, fan-outs, scenario relabel") {
    val df = Seq(
      ("baseline", "Europe", "Avg BF-BOF", 2025, 500.0),
      ("baseline", "Asia", "Avg BF-BOF", 2025, 700.0),
      ("baseline", "Europe", "Avg BF-BOF", 2030, 550.0),
      ("baseline", "Asia", "Avg BF-BOF", 2030, 650.0),
      ("baseline", "Europe", "EAF", 2025, 400.0),
      ("baseline", "Europe", "EAF", 2030, 380.0),
      ("carbon_cost", "Europe", "Avg BF-BOF", 2025, 800.0),
      ("carbon_cost", "Europe", "Avg BF-BOF", 2030, 900.0),
      ("baseline", "Europe", "Scrap", 2025, 1.0)) // irrelevant tech filtered
      .toDF("scenario", "region", "technology", "year", "levelized_cost")
    val wrangled = Prices.mpLcSteelWrangling(df).cache()
    val techs = wrangled.select("technology").distinct().as[String].collect().toSet
    assert(techs == Set("BF-BOF", "EAF", "BF-EAF", "BOF", "BF-OHF"))
    // global mean: baseline BF-BOF 2025 = (500+700)/2
    val glob = wrangled.filter(col("technology") === "BF-BOF" &&
      col("scenario_geography") === "Global" && col("year") === 2025 &&
      col("scenario") === "baseline")
      .select("price").as[Double].head()
    assert(glob == 600.0)
    assert(wrangled.select("unit").distinct().as[String].head() == "$/ton")

    val out = Prices.prepareLcAdjustedPriceDataSteel(wrangled, 0.2, 2025).cache()
    assertNonNegative(out)
    assert(out.select("scenario").distinct().as[String].collect().toSet ==
      Set("Steel_baseline", "Steel_NZ"))
    assert(!out.columns.contains("source"))
    // Europe EAF: implied 400/0.8 = 500; 2030 factor 400/380
    val eaf2030 = out.filter(col("technology") === "EAF" &&
      col("scenario_geography") === "Europe" && col("year") === 2030 &&
      col("scenario") === "Steel_baseline")
      .select("price").as[Double].head()
    assert(math.abs(eaf2030 - 500.0 * (400.0 / 380.0)) < 1e-9)
  }

  test("createAutomotivePrices: unit dummy prices over automotive perimeter") {
    val df = Seq(
      ("GECO2021_CurPol", "Automotive", "Electric", 2030, 1.5),
      ("GECO2021_CurPol", "Automotive", "Electric", 2030, 1.5), // duplicate collapses
      ("GECO2021_CurPol", "Automotive", "ICE", 2030, 2.5),
      ("WEO2021_SDS", "Power", "CoalCap", 2030, 3.0))
      .toDF("scenario", "ald_sector", "ald_business_unit", "year", "fair_share_perc")
    val out = Prices.createAutomotivePrices(df)
    assert(out.count() == 2)
    assert(out.select("price").distinct().as[Int].head() == 1)
    assert(out.select("sector").distinct().as[String].head() == "Automotive")
    assert(out.select("unit").distinct().as[String].head() == "dummy")
  }
}
