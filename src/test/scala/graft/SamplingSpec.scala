package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.Sampling

/** Deterministic sampling/split operators: stability across runs (the
  * anti-rand() contract), proportion sanity, and group caps.
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("deterministicSplit: stable across runs, proportions near weights, total preserved") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey")
    val split = Sampling.deterministicSplit(orders, col("o_orderkey"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)).cache()
    val counts = split.groupBy("split").count().as[(String, Long)].collect().toMap
    val n = orders.count().toDouble
    assert(counts.values.sum == n.toLong) // exhaustive, no dropped rows
    assert(math.abs(counts("train") / n - 0.8) < 0.02, s"train share ${counts("train") / n}")
    assert(math.abs(counts("val") / n - 0.1) < 0.02)
    assert(math.abs(counts("test") / n - 0.1) < 0.02)
    // rerun is identical row-for-row (hash, not rand)
    val again = Sampling.deterministicSplit(orders, col("o_orderkey"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    assert(split.exceptAll(again).count() == 0)
  }

  test("stratifiedSampleByHash: per-stratum fractions honored, unlisted strata dropped") {
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_linenumber", "l_returnflag")
    val out = Sampling.stratifiedSampleByHash(li, col("l_returnflag"),
      col("l_orderkey") * 10 + col("l_linenumber"),
      Map("A" -> 0.1, "R" -> 0.5)).cache()
    assert(out.filter(col("l_returnflag") === "N").count() == 0) // unlisted
    val aBase = li.filter(col("l_returnflag") === "A").count().toDouble
    val aKept = out.filter(col("l_returnflag") === "A").count()
    assert(math.abs(aKept / aBase - 0.1) < 0.02, s"A fraction ${aKept / aBase}")
    val rBase = li.filter(col("l_returnflag") === "R").count().toDouble
    val rKept = out.filter(col("l_returnflag") === "R").count()
    assert(math.abs(rKept / rBase - 0.5) < 0.02, s"R fraction ${rKept / rBase}")
  }

  test("capPerGroup: at most k rows per group, pinned survivors") {
    val df = Seq(
      ("d1", 1, "2020-01-01"), ("d1", 2, "2020-01-02"), ("d1", 3, "2020-01-03"),
      ("d1", 4, "2020-01-04"), ("d2", 5, "2020-01-01"))
      .toDF("domain", "id", "date")
    val out = Sampling.capPerGroup(df, Seq("domain"), 2, Seq(col("date"), col("id")))
    assert(out.groupBy("domain").count().select("count").as[Long].collect().forall(_ <= 2))
    // earliest two by date survive
    assert(out.filter(col("domain") === "d1").select("id").as[Int].collect().toSet == Set(1, 2))
  }

  test("globalShuffle: exact permutation equal to the flat hash rank, stable shards") {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val out = Sampling.globalShuffle(docs, col("doc_id"), rowsPerShard = 50L,
      nBuckets = 16).cache()
    val n = docs.count()
    // pos is a 0..N-1 permutation
    val pos = out.select("pos").as[Long].collect().sorted
    assert(pos.toSeq == (0L until n).toSeq, "pos is not a permutation")
    // the two-level rank equals the naive flat ORDER BY (md5, key) rank
    val flat = docs.withColumn("hx", md5(col("doc_id").cast("string")))
      .withColumn("flat_pos", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("hx"), col("doc_id")))
        .cast("long") - 1)
    val mismatches = out.join(flat, "doc_id")
      .filter(col("pos") =!= col("flat_pos")).count()
    assert(mismatches == 0, s"$mismatches rows diverge from the flat hash rank")
    // shard = pos div 50, so every shard except the last has exactly 50 rows
    val sizes = out.groupBy("shard").count().orderBy("shard")
      .as[(Long, Long)].collect()
    assert(sizes.dropRight(1).forall(_._2 == 50L), s"non-final shard not full: ${sizes.toSeq}")
    // repartitioned input yields the identical permutation (retry-stability)
    val again = Sampling.globalShuffle(docs.repartition(7), col("doc_id"),
      rowsPerShard = 50L, nBuckets = 16)
    assert(out.exceptAll(again).count() == 0)
  }

  test("capPerGroup: pre-existing __rn column survives untouched") {
    val df = Seq(("d1", 1, 99), ("d1", 2, 98), ("d1", 3, 97))
      .toDF("domain", "id", "__rn")
    val out = Sampling.capPerGroup(df, Seq("domain"), 2, Seq(col("id")))
    assert(out.columns.contains("__rn"))
    assert(out.select("id", "__rn").as[(Int, Int)].collect().toSet == Set((1, 99), (2, 98)))
  }

  test("packShards: greedy budget packing, boundary doc stays in its starting shard") {
    val df = Seq(
      ("s1", 1, 900), ("s1", 2, 900), ("s1", 3, 900), // doc3 starts at 1800 < 2000 -> shard 0
      ("s1", 4, 100),                                 // starts at 2700 -> shard 1
      ("s2", 5, 2500), ("s2", 6, 1)                   // oversized doc alone in shard 0; next starts at 2500 -> shard 1
    ).toDF("source", "id", "n_tokens")
    val out = Sampling.packShards(df, col("n_tokens"), Seq("source"), Seq(col("id")), 2000L)
      .select("id", "shard").as[(Int, Long)].collect().toMap
    assert(out == Map(1 -> 0L, 2 -> 0L, 3 -> 0L, 4 -> 1L, 5 -> 0L, 6 -> 1L))
  }

  test("packSequences: segments tile examples exactly, conserve every token, split on boundaries") {
    val df = Seq(
      ("s1", 1, 90), ("s1", 2, 50),  // doc2 spans the 100-token boundary: 10 in ex0, 40 in ex1
      ("s1", 3, 0),                  // zero-token doc vanishes
      ("s1", 4, 260),                // spans ex1..ex4 (offset 140)
      ("s2", 5, 100), ("s2", 6, 7)   // exact-fit doc, then a short tail
    ).toDF("source", "id", "tc")
    val out = Sampling.packSequences(df, col("tc"), Seq("source"), Seq(col("id")), 100)
      .select("source", "id", "example_id", "tok_from", "tok_len", "pos_in_example")
      .as[(String, Int, Long, Long, Long, Long)].collect().toSet
    // doc4: offset 140, 260 tokens -> ends at 400 EXACTLY; lastEx uses
    // n_tokens - 1, so no empty 4th segment is generated
    val expected = Set(
      ("s1", 1, 0L, 0L, 90L, 0L),
      ("s1", 2, 0L, 0L, 10L, 90L), ("s1", 2, 1L, 10L, 40L, 0L),
      ("s1", 4, 1L, 0L, 60L, 40L), ("s1", 4, 2L, 60L, 100L, 0L),
      ("s1", 4, 3L, 160L, 100L, 0L),
      ("s2", 5, 0L, 0L, 100L, 0L),
      ("s2", 6, 1L, 0L, 7L, 0L))
    assert(out == expected, s"got $out")
    // conservation: per doc, segment lengths sum to n_tokens
    val conserved = Sampling.packSequences(df, col("tc"), Seq("source"), Seq(col("id")), 100)
      .groupBy("id").agg(sum("tok_len").as("t"), first("n_tokens").as("n"))
      .filter(col("t") =!= col("n")).count()
    assert(conserved == 0, "token conservation violated")
    // fullness: every example except the last per source holds exactly 100
    val ex = Sampling.packSequences(df, col("tc"), Seq("source"), Seq(col("id")), 100)
      .groupBy("source", "example_id").agg(sum("tok_len").as("t"))
    val lastEx = ex.groupBy("source").agg(max("example_id").as("last"))
    val short = ex.join(lastEx, Seq("source"))
      .filter(col("example_id") =!= col("last") && col("t") =!= 100)
      .count()
    assert(short == 0, "non-final examples must be exactly full")
  }

  test("rebalanceToMixture: pre-existing __st/__q columns survive untouched") {
    val df = Seq(
      ("web", 1, "keep-st", 7), ("web", 2, "keep-st", 7), ("web", 3, "keep-st", 7),
      ("web", 4, "keep-st", 7), ("code", 5, "keep-st", 7), ("code", 6, "keep-st", 7))
      .toDF("domain", "id", "__st", "__q")
    val out = Sampling.rebalanceToMixture(df, col("domain"), col("id"),
      Map("web" -> 0.5, "code" -> 0.5))
    assert(out.columns.count(_ == "__st") == 1 && out.columns.count(_ == "__q") == 1)
    // T = min(4/.5, 2/.5) = 4 -> 2 per domain; user columns untouched
    assert(out.count() == 4)
    assert(out.select("__st").distinct().as[String].collect().toSeq == Seq("keep-st"))
    assert(out.select("__q").distinct().as[Int].collect().toSeq == Seq(7))
  }

  test("interleaveBySource: weighted round-robin order, unlisted sources dropped") {
    val df = (Seq.tabulate(6)(i => ("heavy", i)) ++ Seq.tabulate(3)(i => ("light", i)) ++
      Seq(("unlisted", 0))).toDF("src", "id")
    val out = Sampling.interleaveBySource(df, col("src"), Seq(col("id")),
        Map("heavy" -> 2.0, "light" -> 1.0))
      .orderBy("pos", "src", "id")
      .select("src", "id").as[(String, Int)].collect().toSeq
    // heavy's k-th row at k/2, light's at k: h1(.5) h2(1) l1(1) h3(1.5) h4(2) l2(2) ...
    assert(out == Seq(
      ("heavy", 0), ("heavy", 1), ("light", 0), ("heavy", 2), ("heavy", 3), ("light", 1),
      ("heavy", 4), ("heavy", 5), ("light", 2)))
  }

  test("split is narrow: no shuffle in the plan") {
    val orders = Tables.orders(spark, sfDir).select("o_orderkey")
    val p = Sampling.deterministicSplit(orders, col("o_orderkey"), Seq("a" -> 0.5, "b" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"sampling must not shuffle:\n$p")
  }

  test("weightedSampleByHash: weight 1 always survives, 0 and null never, out-of-range clamps") {
    val rows = (0L until 200L).map { i =>
      val w: Option[Double] = (i % 5) match {
        case 0 => Some(1.0)
        case 1 => Some(0.0)
        case 2 => None
        case 3 => Some(7.5)   // clamps to 1 -> always kept
        case _ => Some(-2.0)  // clamps to 0 -> never kept
      }
      (i, w)
    }
    val kept = Sampling.weightedSampleByHash(rows.toDF("k", "w"), col("k"), col("w"))
      .select("k").as[Long].collect().toSet
    rows.foreach { case (k, w) =>
      val expect = w match {
        case Some(x) if x >= 1.0 => true
        case Some(x) if x <= 0.0 => false
        case None => false
        case _ => kept(k) // fractional handled below
      }
      assert(kept(k) == expect, s"k=$k w=$w")
    }
    // fractional weights keep roughly the weighted share deterministically
    val frac = (0L until 2000L).map(i => (i, Some(0.3): Option[Double]))
    val fracKept = Sampling.weightedSampleByHash(frac.toDF("k", "w"), col("k"), col("w")).count()
    assert(fracKept > 2000 * 0.2 && fracKept < 2000 * 0.4, s"kept $fracKept of 2000 at w=0.3")
    // and identically on a second run
    val again = Sampling.weightedSampleByHash(frac.toDF("k", "w"), col("k"), col("w")).count()
    assert(again == fracKept)
  }

  test("kFoldSplit: exhaustive disjoint folds, held-out labeling, stable across runs") {
    val docs = Tables.documents(spark, sfDir).select("doc_id")
    val folds = Sampling.kFoldSplit(docs, col("doc_id"), k = 5, heldOut = 2).cache()
    val n = docs.count()
    assert(folds.count() == n) // every row assigned exactly once
    val perFold = folds.groupBy("fold").count().as[(Int, Long)].collect().toMap
    assert(perFold.keySet == Set(0, 1, 2, 3, 4), s"folds seen: ${perFold.keySet}")
    // roughly balanced (hash-uniform): each fold within 3x of fair share
    perFold.values.foreach(c => assert(c > n / 15 && c < n, s"fold sizes $perFold"))
    // split labeling is exactly fold == heldOut
    assert(folds.filter((col("fold") === 2) =!= (col("split") === "test")).count() == 0)
    // a pure function of the key: rerun identical row-for-row
    val again = Sampling.kFoldSplit(docs, col("doc_id"), k = 5, heldOut = 2)
    assert(folds.exceptAll(again).count() == 0)
    intercept[IllegalArgumentException] {
      Sampling.kFoldSplit(docs, col("doc_id"), k = 1, heldOut = 0)
    }
    intercept[IllegalArgumentException] {
      Sampling.kFoldSplit(docs, col("doc_id"), k = 5, heldOut = 5)
    }
    folds.unpersist()
  }
}
