package graft

import org.apache.spark.sql.functions._
import graft.operators.BpeTokenizer

class BpeSpec extends SparkTestBase {
  import spark.implicits._

  /** Reference implementation: sequential greedy-leftmost BPE merge of one
    * pair over one word's symbols — the textbook scan the relational
    * formulation must equal.
    */
  private def mergeOnce(syms: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toList
  }

  private def trainRef(words: Map[String, Long], n: Int): Seq[(String, String, Long)] = {
    var st: Map[List[String], Long] =
      words.toSeq.groupBy(_._1.map(_.toString).toList).map { case (k, v) => k -> v.map(_._2).sum }
    val merges = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to n) {
      val pairCounts = st.toSeq.flatMap { case (syms, f) =>
        syms.zip(syms.drop(1)).map(p => p -> f)
      }.groupBy(_._1).map { case (p, v) => p -> v.map(_._2).sum }
      if (pairCounts.nonEmpty) {
        val ((l, r), c) = pairCounts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((l, r, c))
        st = st.toSeq.map { case (syms, f) => mergeOnce(syms, l, r) -> f }
          .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).sum }
      }
    }
    merges.result()
  }

  test("applyMerge: equals the sequential scan incl. overlapping runs") {
    // "aaaa" with pair (a,a) is the overlap case: leftmost-greedy gives
    // aa,aa (not aa,a,a or a,aa,a); "aaaaa" gives aa,aa,a
    val words = Seq("aaaa", "aaaaa", "banana", "aab", "baa", "ab")
      .zipWithIndex.map { case (w, i) => (w, 1L + i) }.toDF("word", "freq")
    val st = BpeTokenizer.charState(words)
    val merged = BpeTokenizer.applyMerge(st, Seq("word"), "a", "a")
      .orderBy("word", "pos")
      .groupBy("word").agg(collect_list(col("sym")).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    for (w <- Seq("aaaa", "aaaaa", "banana", "aab", "baa", "ab")) {
      val want = mergeOnce(w.map(_.toString).toList, "a", "a")
      assert(merged(w).toList == want, s"word=$w got=${merged(w)} want=$want")
    }
  }

  test("train: matches the reference implementation on a hand corpus") {
    // classic BPE teaching corpus (lower/lowest/newer/wider shapes)
    val freqs = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val words = freqs.toSeq.toDF("word", "freq")
    val got = BpeTokenizer.train(spark, words, nMerges = 6)
      .map(m => (m.left_sym, m.right_sym, m.cnt))
    val want = trainRef(freqs, 6)
    assert(got == want, s"\ngot  $got\nwant $want")
  }

  test("train: driver-side loop equals the relational window spelling round-for-round") {
    // r15: train() moved from per-round Spark jobs to a driver loop over
    // the bounded vocabulary. This replays the OLD distributed spelling
    // (lead-window top-pair + applyMerge) and checks merges AND final
    // state agree — including overlap runs and cnt/lex tie-breaks.
    import org.apache.spark.sql.expressions.Window
    val words = Seq("aaaa", "banana", "bandana", "low", "lower", "newest",
      "widest", "aab", "abab", "ccc")
      .zipWithIndex.map { case (w, i) => (w, 2L + (i % 4)) }.toDF("word", "freq")
    val n = 5
    val got = BpeTokenizer.train(spark, words, nMerges = n)
    var st = BpeTokenizer.charState(words).localCheckpoint(false)
    val relational = Seq.newBuilder[(String, String, Long)]
    for (_ <- 1 to n) {
      val wp = Window.partitionBy(col("word")).orderBy(col("pos"))
      val top = st
        .withColumn("nxt", lead(col("sym"), 1).over(wp))
        .filter(col("nxt").isNotNull)
        .groupBy(col("sym"), col("nxt"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("sym"), col("nxt"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        relational += ((l, r, c))
        st = BpeTokenizer.applyMerge(st, Seq("word"), l, r).localCheckpoint(false)
      }
    }
    assert(got.map(m => (m.left_sym, m.right_sym, m.cnt)) == relational.result())
    // final state parity: re-apply the learned merges relationally and
    // compare against the driver loop's implied symbol counts
    val relState = st.orderBy("word", "pos")
      .groupBy("word").agg(collect_list(col("sym")).as("syms"))
      .as[(String, Seq[String])].collect().toMap
    val driverState = {
      var s = words.as[(String, Long)].collect()
        .map { case (w, f) => (w, w.map(_.toString).toList) }.toMap
      got.foreach { m =>
        s = s.map { case (w, syms) => w -> mergeOnce(syms, m.left_sym, m.right_sym) }
      }
      s
    }
    for ((w, syms) <- driverState)
      assert(relState(w).toList == syms, s"word=$w rel=${relState(w)} drv=$syms")
  }

  test("encodeCounts: counts merged symbols plus non-alpha fallback tokens") {
    val freqs = Map("aa" -> 10L, "ab" -> 5L)
    val words = freqs.toSeq.toDF("word", "freq")
    val merges = BpeTokenizer.train(spark, words, nMerges = 1)
    assert(merges.map(m => (m.left_sym, m.right_sym)) == Seq(("a", "a")))
    val docs = Seq(
      (1L, "aa ab 42 aa"),   // aa->1 sym, ab->2 syms, 42->fallback 1: total 5
      (2L, "aaaa"),          // a a a a -> aa aa -> 2
      (3L, "!! ??"))         // no alpha words -> 2 fallbacks
      .toDF("doc_id", "text")
    val got = BpeTokenizer.encodeCounts(docs, "doc_id", "text", merges, maxWordLen = 12)
      .as[(Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 5L), (2L, 2L), (3L, 2L)), got.toString)
  }

  test("train state stays vocabulary-bounded (positions re-densify each round)") {
    val words = Seq(("abab", 3L), ("abc", 2L)).toDF("word", "freq")
    var st = BpeTokenizer.charState(words)
    val m = BpeTokenizer.train(spark, words, 2)
    m.foreach(x => st = BpeTokenizer.applyMerge(st, Seq("word"), x.left_sym, x.right_sym))
    val rows = st.select("word", "pos", "sym").as[(String, Int, String)].collect()
    // positions are dense 1..n per word after every round
    rows.groupBy(_._1).foreach { case (w, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to rs.length).toSeq, s"$w: ${rs.toSeq}")
    }
    // total symbols only ever shrink
    assert(rows.length <= 7)
  }
}
