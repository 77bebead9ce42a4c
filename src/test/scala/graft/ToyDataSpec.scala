package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.pipelines.ToyData

/** The toy-data subsetting workflow (reference data-raw/sampling_scripts/
  * create-toy-data.Rmd, sample_abcd_input.Rmd) — the Rmd's subsetting
  * invariants, deterministic where the reference used seeded R RNG.
  */
class ToyDataSpec extends SparkTestBase {
  import spark.implicits._

  /** abcd-shaped universe: `n` companies, company c spanning 1 + (c % 3)
    * business units, four years of hash-varied production; companies
    * divisible by 7 carry CONSTANT production (rule-1 fodder).
    */
  private def universe(n: Int): DataFrame = {
    val base = spark.range(n).select(col("id").cast("int").as("company_id"))
      .withColumn("bui", explode(sequence(lit(0), pmod(col("company_id"), lit(3)))))
      .withColumn("ald_sector",
        element_at(typedLit(Seq("Power", "Coal", "Oil&Gas")), col("bui") + 1))
      .withColumn("ald_business_unit",
        element_at(typedLit(Seq("CoalCap", "Coal", "Oil")), col("bui") + 1))
      .withColumn("ald_production_unit",
        element_at(typedLit(Seq("MW", "t", "GJ")), col("bui") + 1))
      .withColumn("i", explode(typedLit(Seq(0, 1, 2, 3))))
      .withColumn("year", lit(2022) + col("i"))
      .withColumn("plan_tech_prod",
        when(pmod(col("company_id"), lit(7)) === 0, lit(3.0))
          .otherwise((pmod(col("company_id") * 13 + col("i") * 7, lit(31)) + 1) * lit(0.25)))
      .withColumn("plan_emission_factor", (col("company_id") + 1) * lit(0.125))
      .drop("bui", "i")
    base
  }

  test("removeConstantProductions drops exactly the flat series") {
    val u = universe(40)
    val clean = ToyData.removeConstantProductions(u)
    val droppedCompanies = u.select("company_id").distinct()
      .join(clean.select("company_id").distinct(), Seq("company_id"), "left_anti")
      .collect().map(_.getInt(0)).sorted.toSeq
    assert(droppedCompanies == Seq(0, 7, 14, 21, 28, 35),
      s"exactly the planted constant companies must drop: $droppedCompanies")
    // surviving series really vary
    val flat = clean.groupBy("company_id", "ald_sector", "ald_business_unit",
        "ald_production_unit")
      .agg(countDistinct(col("plan_tech_prod")).as("n"))
      .filter(col("n") <= 1).count()
    assert(flat == 0)
  }

  test("sampleNCompaniesWeighted: per-group count, company closure, determinism") {
    val clean = ToyData.removeConstantProductions(universe(40))
    val sampled = ToyData.sampleNCompaniesWeighted(clean, n = 5)
    // exactly min(n, group size) companies per (sector, business unit)
    val counts = sampled.select("ald_sector", "ald_business_unit", "company_id").distinct()
      .groupBy("ald_sector", "ald_business_unit").agg(count(lit(1)).as("n")).collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(2) == 5L),
      counts.mkString(", "))
    // company-closed per group: every sampled company keeps ALL its rows
    val perGroup = clean.join(
      sampled.select("ald_sector", "ald_business_unit", "company_id").distinct(),
      Seq("ald_sector", "ald_business_unit", "company_id"), "left_semi")
    assert(perGroup.count() == sampled.count())
    // a pure function of the data: the second draw is byte-identical
    val again = ToyData.sampleNCompaniesWeighted(clean, n = 5)
    assert(sampled.exceptAll(again).isEmpty && again.exceptAll(sampled).isEmpty)
    // the n clamp: a group smaller than n keeps all its companies
    val tiny = ToyData.sampleNCompaniesWeighted(clean, n = 1000)
    assert(tiny.count() == clean.count())
  }

  test("diversity weighting favors multi-market companies") {
    // two populations of equal size: weight-27 companies (3 business
    // units) vs weight-1 companies (1 unit). In the shared Power group a
    // 5-of-N draw should select multi-market companies well above parity
    // (P(pick) scales with the ticket count through the min-statistic).
    val clean = ToyData.removeConstantProductions(universe(120))
    val sampled = ToyData.sampleNCompaniesWeighted(clean, n = 5)
    val picked = sampled.filter(col("ald_sector") === "Power")
      .select("company_id").distinct()
      .join(ToyData.companyDiversity(clean), Seq("company_id"))
      .agg(avg(col("n_bu"))).collect()(0).getDouble(0)
    val base = ToyData.companyDiversity(clean).agg(avg(col("n_bu")))
      .collect()(0).getDouble(0)
    assert(picked > base,
      f"weighted draw must over-select diverse companies: picked avg n_bu $picked%.2f vs population $base%.2f")
  }

  test("sampleCompaniesGreedy: company-closed subset honoring the kept-ratio target") {
    val clean = ToyData.removeConstantProductions(universe(60))
    val grp = Seq("ald_sector", "ald_business_unit")
    val sampled = ToyData.sampleCompaniesGreedy(clean, uniformRatio = 0.2,
      groupCols = grp, nSamplingAttempts = 2, greedyLr = 0.2)
    assert(sampled.count() > 0, "the greedy search must return a sample")
    // subset + company-closed: all rows of every sampled company survive
    assert(sampled.join(clean, clean.columns.toSeq, "left_anti").isEmpty)
    val closure = clean.join(sampled.select("company_id").distinct(),
      Seq("company_id"), "left_semi")
    assert(closure.count() == sampled.count())
    // the accepted sample's mean |kept-ratio - target| beats the trivial
    // ratio=1 candidate (|1 - 0.2| = 0.8) — the Rmd's acceptance rule
    val kept = sampled.groupBy(grp.map(col): _*)
      .agg(sum(col("plan_tech_prod")).as("s"))
      .join(clean.groupBy(grp.map(col): _*)
        .agg(sum(col("plan_tech_prod")).as("f")), grp)
      .agg(avg(abs(col("s") / col("f") - 0.2))).collect()(0).getDouble(0)
    assert(kept < 0.8, f"greedy sample ratio-diff $kept%.3f must beat the full set's 0.8")
    // deterministic: same inputs, same subset
    val again = ToyData.sampleCompaniesGreedy(clean, uniformRatio = 0.2,
      groupCols = grp, nSamplingAttempts = 2, greedyLr = 0.2)
    assert(sampled.exceptAll(again).isEmpty && again.exceptAll(sampled).isEmpty)
  }
}
