package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Num

/** W1/W2: market-share columns (reference R/prepare_scenario_data.R:22-72).
  *
  * tmsr ("technology market share ratio"): per (group keys incl. technology),
  * value relative to the first (base-year) value.
  * smsp ("sector market share percentage"): per-technology change since base
  * year, as a share of the base-year *sector* total (sum over technologies).
  *
  * Both are two window passes over the same partitioning — one exchange.
  */
object Shares {

  /** @param techKeys  full keys incl. technology, e.g. (scenario, geography,
    *                  sector, technology)
    * @param sectorKeys keys excl. technology, e.g. (scenario, geography,
    *                  sector) — sums over technologies
    */
  def addMarketShares(
      df: DataFrame,
      techKeys: Seq[String],
      sectorKeys: Seq[String],
      x: String,
      v: String): DataFrame = {
    require(sectorKeys.nonEmpty && sectorKeys.forall(techKeys.contains),
      "sectorKeys must be a non-empty subset of techKeys")
    // ONE exchange for both window families (guide §2.4; probed 2 -> 1):
    // the sector-total window clusters on (sectorKeys, x) and the tech
    // windows on techKeys — hash(sectorKeys) satisfies BOTH (a subset of
    // each), so partitioning once here lets every window below run
    // exchange-free. Group sizes stay bounded (one sector's technologies
    // x years), so the coarser key is scale-safe.
    val pre = df.repartition(sectorKeys.map(col): _*)
    val wTech = Window
      .partitionBy(techKeys.map(col): _*)
      .orderBy(col(x))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSectorYear = Window.partitionBy((sectorKeys :+ x).map(col): _*)
    val firstTech = first(col(v), ignoreNulls = false).over(wTech)
    val df1 = pre
      .withColumn("__sector_total", Num.dsumOver(col(v), wSectorYear))
    val wSectorFirst = Window
      .partitionBy(techKeys.map(col): _*)
      .orderBy(col(x))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df1
      .withColumn("tmsr", (col(v) - firstTech) / firstTech)
      .withColumn(
        "smsp",
        (col(v) - firstTech) / first(col("__sector_total")).over(wSectorFirst))
      .drop("__sector_total")
  }
}
