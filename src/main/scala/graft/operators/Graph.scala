package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge DataFrames (beyond-reference; the connected-
  * component half lives in [[Dedup.canonicalize]]).
  *
  * PageRank here is FIXED-POINT: ranks are BIGINT micro-units (scale
  * 1e12) and every step is integer arithmetic — `r DIV outdeg` per edge,
  * integer sums, `(damp·s) DIV 100` — so the result is bit-identical
  * across engines, partitionings, retries and speculative re-executions.
  * Floating-point PageRank loses that: a distributed double sum reorders
  * per run, which is exactly the nondeterminism this engine's decimal-sum
  * discipline (core.Num) exists to kill. The cost is bounded truncation
  * (each division floors), absorbed into the usual PageRank tolerance;
  * dangling-node mass is dropped (ranks sum to < scale), the standard
  * simplification when ranking within a link graph rather than modeling a
  * random surfer exactly.
  *
  * Scale shape per iteration: one join of edges (pre-joined once with
  * out-degrees) against the current rank vector on src, one hash
  * aggregate on dst, one left join back to the node set — all keyed on
  * node ids. At web scale you would checkpoint the rank vector every few
  * iterations (lineage) and pre-partition edges by src; both are the
  * caller's choice, the operator stays declarative.
  */
object Graph {

  val Scale: Long = 1000000000000L // 1e12: rank 1.0 == 1e12 micro-units

  /** `iters` rounds of damped fixed-point PageRank over `edges`
    * (src, dst), ranking every node in `nodes` (single column `v`).
    * Multi-edges should be deduplicated by the caller if unwanted.
    * dampPct is the damping factor in percent (85 -> 0.85).
    */
  def pageRankFixedPoint(
      nodes: DataFrame,
      edges: DataFrame,
      iters: Int,
      dampPct: Int = 85): DataFrame = {
    require(iters >= 1, "need at least one iteration")
    require(dampPct >= 0 && dampPct <= 100, "dampPct in [0, 100]")
    val spark = nodes.sparkSession
    val nodeCount = nodes.count()
    require(nodeCount > 0, "empty node set")
    val teleport = (Scale - dampPct * Scale / 100) / nodeCount // exact BIGINT
    val outDeg = edges.groupBy("src").agg(count(lit(1)).as("__d"))
    // edges carry their out-degree once; re-used every iteration
    val eWithDeg = edges.join(outDeg, "src")
    var ranks = nodes.select(col("v"), lit(Scale / nodeCount).as("r"))
    for (_ <- 0 until iters) {
      val contribs = eWithDeg
        .join(ranks.withColumnRenamed("v", "src"), Seq("src"))
        .select(col("dst").as("v"), expr("r DIV __d").as("__c"))
        .groupBy("v").agg(sum(col("__c")).as("__s"))
      ranks = nodes
        .join(contribs, Seq("v"), "left")
        .select(col("v"),
          (lit(teleport) +
            expr(s"($dampPct * coalesce(__s, 0L)) DIV 100")).as("r"))
    }
    ranks.select(col("v"), col("r").as("rank_fp"),
      (col("r").cast("double") / Scale.toDouble).as("rank"))
  }
}
