package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.CorpusPrep

/** The oracled corpus-prep composite: gate semantics, planted-duplicate
  * removal, permutation integrity, manifest consistency.
  */
class CorpusPrepSpec extends SparkTestBase {
  import spark.implicits._

  private def base = {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text")
    docs.unionByName(docs.filter(col("doc_id") % 9 === 0)
      .select((col("doc_id") + 10000).as("doc_id"), col("text")))
  }

  test("prepare: gate + dedup + shuffle compose into a clean permutation") {
    val out = CorpusPrep.prepare(base, "doc_id", "text",
      minTokens = 30, maxTokens = 800, rowsPerShard = 50L, nBuckets = 16).cache()
    // every planted copy is an exact duplicate of a smaller id -> none survive
    assert(out.filter(col("doc_id") >= 10000).count() == 0)
    // token gate is a hard band
    assert(out.filter(col("n_tokens") < 30 || col("n_tokens") > 800).count() == 0)
    // pos is a 0..N-1 permutation of the survivors
    val n = out.count()
    assert(out.select("pos").as[Long].collect().sorted.toSeq == (0L until n).toSeq)
    // something was actually gated AND something was actually deduped
    val planted = base.filter(col("doc_id") >= 10000).count()
    assert(planted > 0 && n < base.count() - planted,
      s"gate vacuous: $n survivors of ${base.count()} with $planted planted dups")
  }

  test("globalShuffle plan: data window is per-bucket, offsets fold to a map literal") {
    val out = graft.operators.Sampling.globalShuffle(
      Tables.documents(spark, sfDir).select("doc_id"), col("doc_id"), 50L, nBuckets = 16)
    val p = out.queryExecution.executedPlan.toString
    // offsets are driver-computed and shipped as one map literal: the plan
    // must carry NO join at all and NO unpartitioned window anywhere (the
    // round-5 offsets frame ran a global window over <= nBuckets rows —
    // harmless, but its WindowExec warning pattern-matched the #1
    // scale-killer and would mask a real one)
    assert(p.contains("element_at(map("), s"offsets must be a map literal:\n$p")
    assert(!p.contains("Join"), s"offsets must not join back:\n$p")
    val unpartitioned = "Window \\[[^\\]]*windowspecdefinition\\((?!__b)".r
    assert(unpartitioned.findFirstIn(p).isEmpty,
      s"every window must partition by the hash bucket:\n$p")
    // the bucket-key shuffle the rank needs is the only exchange kind
    assert(p.contains("Exchange hashpartitioning(__b"),
      s"rank must shuffle on the bucket key:\n$p")
    assert(!p.contains("BroadcastExchange") && !p.contains("Exchange SinglePartition"),
      s"no broadcast or single-partition exchange expected:\n$p")
  }

  test("manifest: per-shard totals reconcile with the per-doc frame") {
    val prep = CorpusPrep.prepare(base, "doc_id", "text",
      minTokens = 30, maxTokens = 800, rowsPerShard = 50L, nBuckets = 16).cache()
    val m = CorpusPrep.manifest(prep).cache()
    assert(m.agg(sum("n_docs")).as[Long].head() == prep.count())
    assert(m.agg(sum("total_tokens")).as[Long].head() ==
      prep.agg(sum(col("n_tokens").cast("long"))).as[Long].head())
    // every shard except the last is exactly full, and first_pos = shard*50
    val rows = m.orderBy("shard").as[(Long, Long, Long, Long)].collect()
    assert(rows.dropRight(1).forall(_._2 == 50L))
    assert(rows.forall { case (shard, _, _, firstPos) => firstPos == shard * 50L })
  }

  test("stripBoilerplate: threshold-crossing lines vanish, unique lines keep order") {
    val df = Seq(
      (1L, "unique one\nSHARED HEADER\nbody of one"),
      (2L, "SHARED HEADER\nbody of two"),
      (3L, "body of three\nSHARED HEADER"),
      (4L, "twice only\nbody of four"),
      (5L, "twice only\nbody of five")).toDF("doc_id", "text")
    val out = CorpusPrep.stripBoilerplate(df, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (1L, "unique one\nbody of one", 3L, 1L),   // middle line removed, order kept
      (2L, "body of two", 2L, 1L),
      (3L, "body of three", 2L, 1L),
      (4L, "twice only\nbody of four", 2L, 0L),  // df=2 < minDocs=3 -> kept
      (5L, "twice only\nbody of five", 2L, 0L)))
  }

  test("stripBoilerplate: all-boilerplate docs survive as empty; trim-matched lines drop") {
    val df = Seq(
      (1L, "  chrome  "),   // trimmed key 'chrome'
      (2L, "chrome"),
      (3L, "chrome\nreal content here"),
      (4L, "a\n\nb")).toDF("doc_id", "text")
    val out = CorpusPrep.stripBoilerplate(df, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    // 'chrome' appears (trimmed) in 3 docs -> removed everywhere, including
    // the whitespace-padded variant; docs 1 and 2 become empty but are NOT
    // dropped from the output
    assert(out == Seq(
      (1L, "", 1L, 1L),
      (2L, "", 1L, 1L),
      (3L, "real content here", 2L, 1L),
      (4L, "a\n\nb", 3L, 0L)))
  }

  test("stripBoilerplate: empty lines are never boilerplate") {
    // blank lines appear in every doc — far past the threshold — but are
    // document structure and must survive
    val df = (1L to 5L).map(i => (i, s"top $i\n\nbottom $i")).toDF("doc_id", "text")
    val out = CorpusPrep.stripBoilerplate(df, "doc_id", "text", minDocs = 2)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect()
    assert(out.forall { case (i, t, nl, nr) => t == s"top $i\n\nbottom $i" && nl == 3 && nr == 0 })
  }
}
