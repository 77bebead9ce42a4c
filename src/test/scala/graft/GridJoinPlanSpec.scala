package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ops.TimeSeries

/** The null-safe grid join must stay a hash/sort-merge equi-join —
  * EqualNullSafe is a supported join key; if a refactor ever turns it
  * into a BroadcastNestedLoopJoin or cartesian product it would be a
  * 100 TB disaster that small tests would never notice.
  */
class GridJoinPlanSpec extends SparkTestBase {

  test("completeGrid null-safe join compiles to an equi-join, not a nested loop") {
    val base = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey").as("g"), col("l_linenumber").as("x"), col("l_quantity").as("v"))
    val p = TimeSeries.completeGrid(base, Seq("g"), "x", 1, 7)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"grid join degraded to a non-equi join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p)
  }
}
