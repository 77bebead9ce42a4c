package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.util.Random

/** Seeded port of the reference's synthetic-data generators
  * (tests/testthat/fixtures/gen_synthetic_company_data.R:1-205,
  * gen_synthetic_eikon_data.R:10-59) — the reference's de-facto test rig.
  * Structure is reproduced (sector sampling with MW/MWh duplication,
  * per-row country lists, geometric production with injected NA and
  * full-NA rows, oversampled ISINs with unmatched extras); draws come
  * from a fixed JVM seed, so fixtures are identical run to run.
  */
object SyntheticData {

  // (ald_sector, ald_business_unit, activity_unit) — reference data(production_types)
  private val productionTypes = Seq(
    ("Power", "CoalCap", "MW"), ("Power", "GasCap", "MW"), ("Power", "RenewablesCap", "MW"),
    ("Automotive", "Electric", "# vehicles"), ("Automotive", "ICE", "# vehicles"),
    ("Oil&Gas", "Oil", "GJ"), ("Oil&Gas", "Gas", "GJ"), ("Coal", "Coal", "tonnes"))

  private val countries = Seq("DE", "FR", "US", "CN", "BR", "IN")

  private def geometric(rng: Random, mean: Double): Double =
    math.floor(math.log(rng.nextDouble()) / math.log(1.0 - 1.0 / mean))

  final case class WideRow(
      company_id: Long, company_name: String, ald_sector: String,
      ald_business_unit: String, ald_location: String, activity_unit: String,
      y0: Option[Double], y1: Option[Double], y2: Option[Double],
      y3: Option[Double], y4: Option[Double], y5: Option[Double])

  private def wideFrame(spark: SparkSession, rows: Seq[WideRow]): DataFrame = {
    import spark.implicits._
    val df = rows.toDF()
    (0 to 5).foldLeft(df)((d, i) => d.withColumnRenamed(s"y$i", s"Equity Ownership ${2022 + i}"))
  }

  private def genRows(
      rng: Random,
      nCompanies: Int,
      nMultiSector: Int,
      maxCountries: Int,
      propNa: Double,
      nRowFullNa: Int,
      meanValue: Double,
      unitOverride: Option[String]): Seq[WideRow] = {
    val base = (1 to nCompanies).flatMap { cid =>
      val sectors = rng.shuffle(productionTypes).take(nMultiSector)
      // companies with MW production also get MWh rows and vice versa
      val withDuals = (sectors ++
        sectors.filter(_._3 == "MW").map(s => (s._1, s._2, "MWh")) ++
        sectors.filter(_._3 == "MWh").map(s => (s._1, s._2, "MW"))).distinct
      withDuals.flatMap { case (sec, bu, unit) =>
        val locs = rng.shuffle(countries).take(1 + rng.nextInt(maxCountries))
        locs.map(loc => (cid.toLong, s"company-$cid", sec, bu, loc, unit))
      }
    }
    val rows = base.map { case (cid, name, sec, bu, loc, unit) =>
      val vals = (0 to 5).map { _ =>
        if (rng.nextDouble() < propNa) None else Some(geometric(rng, meanValue))
      }
      WideRow(cid, name, sec, bu, loc, unitOverride.getOrElse(unit),
        vals(0), vals(1), vals(2), vals(3), vals(4), vals(5))
    }
    // full-NA rows (reference nrow_full_na)
    rows.zipWithIndex.map { case (r, i) =>
      if (i < nRowFullNa) r.copy(y0 = None, y1 = None, y2 = None, y3 = None, y4 = None, y5 = None)
      else r
    }
  }

  def companyActivities(spark: SparkSession, nCompanies: Int = 50, seed: Long = 42): DataFrame = {
    val rng = new Random(seed)
    wideFrame(spark, genRows(rng, nCompanies, nMultiSector = 3, maxCountries = 3,
      propNa = 0.3, nRowFullNa = 10, meanValue = 1e4, unitOverride = None))
  }

  def companyEmissions(spark: SparkSession, nCompanies: Int = 50, seed: Long = 43): DataFrame = {
    val rng = new Random(seed)
    wideFrame(spark, genRows(rng, nCompanies, nMultiSector = 3, maxCountries = 3,
      propNa = 0.2, nRowFullNa = 5, meanValue = 1e3, unitOverride = Some("tCO2")))
  }

  /** Eikon-style per-ISIN financials: ~10x oversampled company ids, half
    * the companies dropped, plus unmatched ISINs; uniform(0,1) ratios;
    * ald_location = first two ISIN chars.
    */
  def eikonFinancials(spark: SparkSession, nCompanies: Int = 50, seed: Long = 44): DataFrame = {
    import spark.implicits._
    val rng = new Random(seed)
    val keptCompanies = (1 to nCompanies).filter(_ => rng.nextDouble() < 0.5)
    val rows = keptCompanies.flatMap { cid =>
      (0 until 1 + rng.nextInt(3)).map { _ =>
        val loc = countries(rng.nextInt(countries.size))
        (cid.toLong, loc, rng.nextDouble(), rng.nextDouble(), rng.nextDouble(), rng.nextDouble())
      }
    }
    rows.toDF("company_id", "ald_location", "pd", "net_profit_margin",
      "debt_equity_ratio", "volatility")
  }

  def companiesTable(spark: SparkSession, activities: DataFrame): DataFrame =
    activities.select("company_id", "ald_sector", "ald_location").distinct()

  def ownershipTree(spark: SparkSession, nCompanies: Int = 50, seed: Long = 45): DataFrame = {
    import spark.implicits._
    val rng = new Random(seed)
    // every even company is owned by the preceding odd one
    (2 to nCompanies by 2).map { cid =>
      (cid.toLong - 1, cid.toLong, 0.5 + rng.nextDouble() / 2, 1)
    }.toDF("parent_company_id", "subsidiary_company_id", "linking_stake", "ownership_level")
  }
}
