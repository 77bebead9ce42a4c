package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Round-11 graph-operator contracts: convergence-detected connected
  * components (exact at any diameter, where bounded-round LPA is provably
  * short), string-node-id support (the r10 tie-break fix), and the
  * checkpointEvery cadence (bit-identical results, bounded plan depth).
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private def pathEdges(n: Int) =
    (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")

  test("connectedComponents: exact on a long path where bounded LPA is short") {
    // one 60-node path (diameter 59) + one separate 3-node path
    val edges = pathEdges(60)
      .unionAll(Seq((100L, 101L), (101L, 102L)).toDF("src", "dst"))
    val cc = Graph.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 63)
    assert((0 until 60).forall(i => cc(i.toLong) == 0L),
      "every path node must reach the minimum label 0 regardless of distance")
    assert(Seq(100L, 101L, 102L).forall(cc(_) == 100L))
    // the contrast the operator exists for: min-label propagation at 3
    // rounds only carries a label 3 hops — the far end of the path
    // cannot know about node 0, so LPA yields many "communities" where
    // there is provably one component
    val lpa = Graph.labelPropagation(edges, rounds = 3).collect()
      .map(r => r.getLong(1)).distinct
    assert(lpa.length > 2, s"expected bounded LPA to under-merge the path, got ${lpa.length}")
  }

  test("connectedComponents: string node ids (generic min-label type)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y"), ("q", "q"))
      .toDF("src", "dst")
    val cc = Graph.connectedComponents(edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x"),
      "string ids must flow through least/min; self-loops drop")
  }

  test("connectedComponents: partitioning-independent") {
    val edges = pathEdges(40).unionAll(Seq((200L, 201L)).toDF("src", "dst"))
    val a = Graph.connectedComponents(edges.repartition(1)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = Graph.connectedComponents(edges.repartition(7)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b)
  }

  test("labelPropagation: string node ids analyze and propagate (r10 #3)") {
    // triangle a-b-c plus pendant d: after 2 rounds everything adopts the
    // smallest label of its neighborhood majority
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"))
      .toDF("src", "dst")
    val lp = Graph.labelPropagation(edges, rounds = 2).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(lp.keySet == Set("a", "b", "c", "d"))
    assert(lp.values.forall(Set("a", "b", "c", "d")),
      "labels must stay within the node-id domain")
  }

  test("checkpointEvery: results bit-identical, plan depth bounded") {
    val edges = pathEdges(30)
    val nodes = (0 until 30).map(_.toLong).toDF("v")
    val plain = Graph.pageRankFixedPoint(nodes, edges, iters = 20)
    val chk = Graph.pageRankFixedPoint(nodes, edges, iters = 20, checkpointEvery = 4)
    val a = plain.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val b = chk.collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(a == b, "checkpoint cadence must not change any rank bit")
    val plainDepth = plain.queryExecution.analyzed.treeString.linesIterator.size
    val chkDepth = chk.queryExecution.analyzed.treeString.linesIterator.size
    assert(chkDepth * 3 < plainDepth,
      s"checkpointed plan should be far shallower: $chkDepth vs $plainDepth lines")

    val lpPlain = Graph.labelPropagation(edges, rounds = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val lpChk = Graph.labelPropagation(edges, rounds = 6, checkpointEvery = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(lpPlain == lpChk)

    val kcPlain = Graph.kCorePeel(edges, k = 2, rounds = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    val kcChk = Graph.kCorePeel(edges, k = 2, rounds = 6, checkpointEvery = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(kcPlain == kcChk)
  }

  test("bfsDistances: exact multi-source hops, unreachable absent, empty-frontier stop") {
    import spark.implicits._
    // a 10-node path with seeds at both ends, plus a disconnected pair
    val edges = pathEdges(10)
      .unionAll(Seq((100L, 101L)).toDF("src", "dst"))
    val seeds = Seq(0L, 9L).toDF("v")
    val got = Graph.bfsDistances(edges, seeds).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // dist = min hops to the NEAREST seed: 0..4 from the left, 4..0 from
    // the right — node i settles at min(i, 9 - i)
    assert(got == (0 to 9).map(i => i.toLong -> math.min(i, 9 - i).toLong).toMap,
      got.toString)
    assert(!got.contains(100L) && !got.contains(101L),
      "nodes unreachable from any seed must be absent, not defaulted")

    // single seed on the long path: exact linear distances (the shape a
    // bounded-round variant would truncate), and the round count equals
    // the eccentricity + 1 — convergence, not a cap
    val one = Graph.bfsDistances(pathEdges(10), Seq(0L).toDF("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(one == (0 to 9).map(i => i.toLong -> i.toLong).toMap)

    // string node ids work (no numeric assumptions anywhere)
    val sEdges = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val sGot = Graph.bfsDistances(sEdges, Seq("a").toDF("v")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sGot == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))

    // a null seed (outer-join residue) is dropped, not returned as a
    // phantom (null, 0) node — same hygiene as the edge cleaning
    val nullSeeds = Seq(Some("a"), None).toDF("v")
    val nGot = Graph.bfsDistances(sEdges, nullSeeds).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(nGot == Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
  }

  test("ssspDistances: cheaper-but-longer paths win, re-relaxation, negative refusal") {
    import spark.implicits._
    // directed: 0→4 direct costs 10; the 4-hop chain costs 4; 0→2 direct
    // costs 9 but improves to 2 via the chain AFTER 2 is first reached —
    // the re-relaxation case hop-settling (BFS-style) would get wrong
    val edges = Seq(
      (0L, 4L, 10L), (0L, 2L, 9L),
      (0L, 1L, 1L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L),
      (100L, 101L, 1L) // disconnected from the seed
    ).toDF("src", "dst", "w")
    val got = Graph.ssspDistances(edges, Seq(0L).toDF("v")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L, 4L -> 4L), got.toString)
    assert(!got.contains(100L) && !got.contains(101L),
      "unreachable nodes must be absent, not defaulted")
    // zero-weight edges are fine (non-negative, not strictly positive)
    val z = Graph.ssspDistances(
      Seq((0L, 1L, 0L), (1L, 2L, 5L)).toDF("src", "dst", "w"), Seq(0L).toDF("v"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(z == Map(0L -> 0L, 1L -> 0L, 2L -> 5L))
    // negative weights refuse loudly instead of silently not converging —
    // the check rides the edge checkpoint (assert_true), so it surfaces
    // as a task failure, not a pre-scan IllegalArgumentException
    val err = intercept[Exception] {
      Graph.ssspDistances(Seq((0L, 1L, -1L)).toDF("src", "dst", "w"), Seq(0L).toDF("v"))
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("non-negative")), messages(err).toString)
  }

  test("commonNeighborCandidates: exact counts, edge anti-join, apex cap semantics") {
    import spark.implicits._
    // a 4-cycle 0-1-2-3-0 plus a hub 9 adjacent to all four
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L),
      (9L, 0L), (9L, 1L), (9L, 2L), (9L, 3L)).toDF("src", "dst")
    def rows(cap: Int) = Graph.commonNeighborCandidates(edges, cap, minCommon = 2L)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap

    // cap 3 excludes the hub (deg 4) as a wedge APEX: the opposite-corner
    // pairs count only their two cycle apexes; every pair THROUGH an
    // allowed apex that is already an edge (all the hub spokes) anti-joins
    // away; degrees in the Jaccard stay FULL
    val capped = rows(3)
    assert(capped.keySet == Set((0L, 2L), (1L, 3L)), capped.toString)
    assert(capped((0L, 2L)) == ((2L, 3L, 3L, 2.0 / 4.0)))
    assert(capped((1L, 3L)) == ((2L, 3L, 3L, 2.0 / 4.0)))

    // no binding cap: the hub is a third shared neighbor
    val full = rows(10)
    assert(full((0L, 2L)) == ((3L, 3L, 3L, 1.0)))
    assert(full((1L, 3L)) == ((3L, 3L, 3L, 1.0)))
  }
}
