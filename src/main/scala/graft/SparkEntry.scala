package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Num.dsum
import graft.core.Tables._
import graft.queries.{Q, Relational}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** All verifiable queries, keyed by SURVEY §2 operator id. */
  private[graft] def catalog: Seq[Q] =
    Relational.queries ++ graft.queries.TextData.queries ++
      graft.queries.Analytics.queries ++ graft.queries.Advanced.queries ++
      graft.queries.Extensions.queries ++ graft.queries.PipelineQueries.queries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star-join (lineitem⋈orders⋈customer⋈nation⋈region: two broadcastable
    * dims), grouped revenue per (region, order year), then an analytic
    * share-of-region window — exercises scan pruning, broadcast joins,
    * hash agg and a window in one plan.
    */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    val rev = lineitem(spark, d)
      .select(col("l_orderkey"), (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      .join(orders(spark, d).select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, d).select("c_custkey", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation(spark, d).select("n_nationkey", "n_regionkey")),
        col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region(spark, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), year(col("o_orderdate")).as("order_year"))
      .agg(dsum(col("rev")).as("revenue"))
    rev
      .withColumn("region_share",
        col("revenue") / sum(col("revenue")).over(Window.partitionBy(col("r_name"))))
      .orderBy("r_name", "order_year")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (hash-based sketches) -> driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
