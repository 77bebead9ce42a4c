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

  /** Synchronized k-core peeling over an undirected view of `edges`:
    * each round drops every node whose degree in the CURRENT induced
    * subgraph is below `k`, simultaneously (the Pregel-style peel —
    * matches the sequential k-core fixpoint when run to convergence;
    * `rounds` bounds the iteration the way [[pageRankFixedPoint]]'s
    * `iters` does, and each round is monotone, so survivors of round r
    * always contain the true k-core). The density gate graph curation
    * needs: spam/link-farm cores surface as high-k survivors, leaf
    * chains peel away in the first rounds.
    *
    * Scale shape per round: one hash-aggregate degree count plus two
    * LEFT SEMI joins of the edge list against the ≥k survivor set — all
    * keyed on node ids, nothing quadratic; integer-exact throughout, so
    * the result is engine-replayable.
    *
    * Returns the round-`rounds` survivors (node, deg) where `deg` is the
    * node's degree in the subgraph that round's filter ran on (≥ k by
    * construction).
    */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "need at least one peeling round")
    // drop self-loops and null endpoints BEFORE mirroring — filtering only
    // the forward branch would let (a, a) re-enter through the reversed
    // union and inflate a's degree by one
    val clean = edges
      .select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    val und = clean
      .unionAll(clean.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    var cur = und
    var alive = cur.groupBy("src").agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= k)
    for (_ <- 1 until rounds) {
      cur = cur
        .join(alive.select("src"), Seq("src"), "left_semi")
        .join(alive.select(col("src").as("dst")), Seq("dst"), "left_semi")
      alive = cur.groupBy("src").agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
    }
    alive.select(col("src").as("node"), col("deg"))
  }

  /** Synchronized label propagation (Raghavan et al. 2007, the LPA
    * community detector) over an undirected view of `edges`, made fully
    * DETERMINISTIC: labels start as node ids, and each round every node
    * simultaneously adopts the label most frequent among its neighbors,
    * ties broken by the SMALLEST label — no random visit order, no
    * random tie coin, so the result is bit-identical across engines,
    * partitionings and retries (classic LPA's randomness is what keeps
    * it out of reproducible pipelines). `rounds` bounds the fixpoint the
    * way [[pageRankFixedPoint]]'s `iters` does; synchronized LPA can
    * two-cycle on bipartite structure, and a bounded round count is the
    * standard guard. Use case: community structure of a link/interaction
    * graph for corpus curation — content farms and topic clusters
    * surface as large communities, and the community id is a grouping
    * key downstream mixing stages can balance on.
    *
    * Scale shape per round: one join of the (mirrored, deduplicated)
    * edge list against the current label vector on the neighbor id, one
    * map-side-combined (node, label) count, and an argmax aggregate via
    * max(struct(count, -label)) — NO per-node rank window, so no
    * single-reducer risk; everything keys on node ids. The label vector
    * is one row per node; at web scale you would checkpoint it every few
    * rounds exactly like the PageRank vector.
    *
    * Returns (node, community) after `rounds` rounds; isolated nodes
    * (none, when nodes are derived from edge endpoints) keep their id.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one propagation round")
    // same cleaning as kCorePeel: self-loops and null endpoints out
    // BEFORE mirroring
    val clean = edges
      .select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
    val und = clean
      .unionAll(clean.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val nodes = und.select(col("src").as("v")).distinct()
    var labels = nodes.select(col("v"), col("v").as("lab"))
    for (_ <- 0 until rounds) {
      val nb = und
        .join(labels.select(col("v").as("dst"), col("lab")), Seq("dst"))
        .select(col("src").as("v"), col("lab"))
      val cnt = nb.groupBy("v", "lab").agg(count(lit(1)).as("c"))
      // argmax by (count DESC, label ASC): max over (c, -lab) structs —
      // an aggregate, not a rank window, so hot nodes don't serialize
      val pick = cnt
        .groupBy("v")
        .agg(max(struct(col("c"), (-col("lab")).as("nl"))).as("b"))
        .select(col("v"), (-col("b.nl")).as("lab"))
      labels = nodes
        .join(pick, Seq("v"), "left")
        .select(col("v"), coalesce(col("lab"), col("v")).as("lab"))
    }
    labels.select(col("v").as("node"), col("lab").as("community"))
  }

  /** Exact per-node triangle counts over an undirected view of `edges`,
    * DEGREE-ORIENTED (the MapReduce triangle algorithm of Cohen 2009 /
    * Suri–Vassilvitskii 2011): each canonical edge is directed from its
    * (degree, id)-smaller endpoint, which bounds every out-list by
    * O(√m), so wedge generation — the quadratic danger zone — does
    * O(m^1.5) work total instead of Σ degree² (a single celebrity node
    * with degree 10⁷ would otherwise generate 10¹⁴ wedges). Each triangle
    * is found exactly once, at its (degree, id)-minimum vertex.
    *
    * Plan shape: degree aggregate, one self-join on the wedge apex, one
    * equi-join closure against the oriented edge set, one explode-free
    * membership union + hash aggregate — all shuffle equi-joins on node
    * ids, nothing O(N²) in nodes.
    *
    * Output: every node in `nodes` (single column `v`) with its BIGINT
    * `n_triangles` (0 when absent from any triangle).
    */
  def triangleCounts(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"), greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b")).distinct()
    val deg = und.select(col("a").as("v")).unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    // orient a—b from the (degree, id)-smaller endpoint; ties on degree
    // break by id, and a != b, so the order is total
    val oriented = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("w")))
          .otherwise(struct(col("b").as("u"), col("a").as("w"))).as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"))
    // wedges at apex u: each unordered out-pair {x, y} appears in both
    // orders, and the closure edge is oriented exactly one way — the join
    // keeps exactly one, so no v<w filter is needed and each triangle
    // counts once
    val wedges = oriented.select(col("u"), col("w").as("x"))
      .join(oriented.select(col("u"), col("w").as("y")), "u")
      .filter(col("x") =!= col("y"))
    val tri = wedges.join(
      oriented.select(col("u").as("x"), col("w").as("y")), Seq("x", "y"))
    val members = tri.select(col("u").as("v"))
      .unionAll(tri.select(col("x").as("v")))
      .unionAll(tri.select(col("y").as("v")))
    nodes
      .join(members.groupBy("v").agg(count(lit(1)).as("n_triangles")), Seq("v"), "left")
      .na.fill(0L, Seq("n_triangles"))
  }
}
