package graft.pipelines

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Sampling
import graft.core.Barriers.BarrierOps

/** Toy-data subsetting workflow — Spark re-expression of the reference's
  * sampling scripts (data-raw/sampling_scripts/create-toy-data.Rmd and
  * sample_abcd_input.Rmd): drop constant-production series, then shrink
  * the company universe either to a fixed per-(sector, business-unit)
  * company count with diversity-weighted draws (`toy_data_type =
  * "to_share"`, create-toy-data.Rmd:100-134) or by a greedy ratio search
  * that matches a target kept-production ratio while minimizing the
  * yearly-curve RMSE (`"for_app"`, create-toy-data.Rmd:140-236 and the
  * generalized sample_abcd_input.Rmd:62-120).
  *
  * DETERMINISM: the reference draws with `set.seed(42)` R RNG; a
  * distributed engine cannot replay R's stream, and `rand()` would change
  * the sample under retries/recomputation (the Sampling.scala rule). Every
  * draw here derives from the MD5-bucket uniform over a stable key, so
  * the subset is a pure function of the data — replayable, and exactly
  * restatable by the DuckDB oracle (`sm_toy_sample`).
  *
  * WEIGHTED DRAWS are ticket-minimum order statistics, not u^(1/w)
  * (Efraimidis-Spirakis) keys: a company of weight w holds tickets
  * 1..w, each hashed to an integer bucket, and companies rank by their
  * MINIMUM bucket — distributionally the same weighted-without-
  * replacement scheme (min of w uniforms ~ Beta(1, w)), but the rank key
  * stays an INTEGER, immune to the cross-engine 1-ulp `pow`/`ln`
  * differences that could flip a rank in the hash gate.
  */
object ToyData {

  private val valueCols = Set("year", "plan_tech_prod", "plan_emission_factor", "plan_sec_prod")

  /** create-toy-data.Rmd:74-95 "remove constant productions": series
    * identity is every column EXCEPT the per-year values; series whose
    * production never changes (one distinct value — which also covers
    * the all-zero case) are dropped. One aggregate + a semi join on the
    * series key — no window state, co-partitioned at any scale.
    */
  def removeConstantProductions(abcd: DataFrame): DataFrame = {
    val keys = abcd.columns.filterNot(valueCols.contains).toSeq
    val nonConst = abcd
      .groupBy(keys.map(col): _*)
      .agg(countDistinct(col("plan_tech_prod")).as("__n"))
      .filter(col("__n") > 1)
      .drop("__n")
    abcd.join(nonConst, keys, "left_semi")
  }

  /** Company diversity: how many (sector, business-unit) markets the
    * company spans (create-toy-data.Rmd:103-106) — the sampling weight
    * base favoring multi-sector companies.
    */
  def companyDiversity(abcd: DataFrame): DataFrame =
    abcd.select("company_id", "ald_sector", "ald_business_unit").distinct()
      .groupBy("company_id")
      .agg(count(lit(1)).as("n_bu"))

  /** The integer weighted-draw key: the minimum MD5 bucket over `w`
    * tickets of `key` (weight acts through the order statistic). The
    * scope string keeps draws independent across groups/attempts.
    */
  private def minTicketBucket(df: DataFrame, scope: Column, key: Column, w: Column,
      groupCols: Seq[String]): DataFrame =
    df.withColumn("__t", explode(sequence(lit(1), w.cast("int"))))
      .withColumn("__b", Sampling.md5Bucket(concat_ws("|", scope, key, col("__t")), 1000000))
      .groupBy((groupCols.map(col) :+ key.as("__k")): _*)
      .agg(min(col("__b")).as("__minb"))

  /** create-toy-data.Rmd:111-134 ("to_share"): per (sector, business
    * unit), keep `n` companies drawn without replacement with weight
    * n_bu^3 (strong preference for companies that span markets). Groups
    * with fewer than `n` companies keep them all — the Rmd's
    * total_companies clamp.
    */
  def sampleNCompaniesWeighted(abcd: DataFrame, n: Int): DataFrame = {
    val grp = Seq("ald_sector", "ald_business_unit")
    val div = companyDiversity(abcd)
    val cand = abcd.select("ald_sector", "ald_business_unit", "company_id").distinct()
      .join(div, Seq("company_id"))
      .withColumn("__w", pow(col("n_bu").cast("double"), 3.0))
    val keyed = minTicketBucket(cand,
      concat_ws("|", col("ald_sector"), col("ald_business_unit")),
      col("company_id"), col("__w"), grp)
    val sel = keyed
      .withColumn("__rk", row_number().over(
        Window.partitionBy(grp.map(col): _*).orderBy(col("__minb"), col("__k"))))
      .filter(col("__rk") <= n)
      .select(col("ald_sector"), col("ald_business_unit"), col("__k").as("company_id"))
    abcd.join(sel, grp :+ "company_id", "left_semi")
  }

  /** One deterministic company-level weighted sample of ~`ratio` of the
    * distinct companies (`sample_frac(ratio, weight = n_bu)`): the
    * round(ratio * n) lowest ticket-minimum companies, via a global
    * sort-limit (TakeOrderedAndProject — no single-reducer window).
    */
  private def sampleFracCompanies(
      companies: DataFrame, ratio: Double, nTotal: Long, attemptTag: String): DataFrame = {
    val k = math.round(ratio * nTotal).toInt
    val keyed = minTicketBucket(companies, lit(attemptTag), col("company_id"),
      col("n_bu"), Nil)
    keyed.orderBy(col("__minb"), col("__k")).limit(k)
      .select(col("__k").as("company_id"))
  }

  /** Greedy kept-ratio search (sample_abcd_input.Rmd:62-120,
    * create-toy-data.Rmd:140-236): walk the sampling ratio down from 1 in
    * `greedyLr` steps; at each step draw `nSamplingAttempts` candidate
    * company subsets, keep the attempt with the best yearly-curve RMSE,
    * and accept it when its mean |kept-production ratio − uniformRatio|
    * beats the best so far. Driver-coordinated like the reference's loop:
    * each attempt is two aggregation passes + a semi join (bounded by
    * attempts × steps jobs); only per-group scalars ever reach the
    * driver.
    */
  def sampleCompaniesGreedy(
      abcd: DataFrame,
      uniformRatio: Double,
      groupCols: Seq[String],
      nSamplingAttempts: Int = 5,
      greedyLr: Double = 0.02,
      useWeighting: Boolean = true): DataFrame = {
    val spark = abcd.sparkSession
    val div = companyDiversity(abcd)
    val companies = abcd.select("company_id").distinct()
      .join(div, Seq("company_id"))
      .withColumn("n_bu", if (useWeighting) col("n_bu") else lit(1L))
      // re-used once per attempt — pin it
      .planBarrier()
    val nTotal = companies.count()
    val pinned = abcd.planBarrier()
    def totalVolume(df: DataFrame): DataFrame =
      df.groupBy(groupCols.map(col): _*).agg(sum(col("plan_tech_prod")).as("__tot"))
    def yearlyVolume(df: DataFrame): DataFrame =
      df.groupBy((("year" +: groupCols).map(col)): _*)
        .agg(sum(col("plan_tech_prod")).as("__yv"))
    val fullTotal = totalVolume(pinned).withColumnRenamed("__tot", "__tot_full")
      .planBarrier()
    val fullYearly = yearlyVolume(pinned).withColumnRenamed("__yv", "__yv_full")
      .planBarrier()

    var best: Option[DataFrame] = None
    var bestRatioDiff = Double.PositiveInfinity
    var ratio = 1.0
    while (ratio > greedyLr * 2) {
      var iterBest: Option[(DataFrame, Double, Double)] = None // (sample, rmse, ratioDiff)
      for (i <- 1 to nSamplingAttempts) {
        val sel = sampleFracCompanies(companies, ratio, nTotal, f"r$ratio%.4f-a$i")
        val sampled = pinned.join(sel, Seq("company_id"), "left_semi")
        // one pass for both stats: per-group kept ratio + yearly RMSE
        val keptRow = totalVolume(sampled).join(fullTotal, groupCols)
          .agg(avg(abs(col("__tot") / col("__tot_full") - uniformRatio)))
          .collect()(0)
        val ratioDiff = if (keptRow.isNullAt(0)) 1.0 else keptRow.getDouble(0)
        val rmseRow = yearlyVolume(sampled)
          .join(fullYearly, "year" +: groupCols)
          .groupBy(groupCols.map(col): _*)
          .agg(sqrt(avg(org.apache.spark.sql.functions.pow(
            col("__yv") - col("__yv_full"), 2.0))).as("__rmse"))
          .agg(avg(col("__rmse"))).collect()(0)
        val rmse = if (rmseRow.isNullAt(0)) Double.PositiveInfinity else rmseRow.getDouble(0)
        if (iterBest.forall(_._2 > rmse)) iterBest = Some((sampled, rmse, ratioDiff))
      }
      for ((sample, _, rd) <- iterBest if rd < bestRatioDiff) {
        best = Some(sample)
        bestRatioDiff = rd
      }
      ratio -= greedyLr
    }
    best.getOrElse(pinned.limit(0))
  }
}
