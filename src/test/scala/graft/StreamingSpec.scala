package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.Events

/** Streaming semantics: the file-source micro-batch run of the hourly
  * aggregation must agree with its batch twin on the same data.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val eventsDir: String = {
    // re-write the sf0.001 events (nanos ts) as a clean micro-batch source
    val dir = Files.createTempDirectory("graft-events").toString
    graft.core.Tables.events(spark, sfDir).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly agg equals the batch twin") {
    val stream = Events.readEventStream(spark, eventsDir)
    assert(stream.isStreaming)
    val q = Events.hourlyAggStream(stream)
      .writeStream.outputMode("complete").format("memory").queryName("hourly_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly_out")
      .select(col("hour_start").cast("long").as("h"), col("event_type"), col("n"), col("sum_value"))
    val batch = graft.core.Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).cast("long").as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    assert(streamed.count() == batch.count())
    assert(streamed.join(batch, Seq("h", "event_type", "n"), "left_anti").count() == 0)
  }

  test("stream-stream attribution join equals the batch twin") {
    val stream = Events.readEventStream(spark, eventsDir)
    val q = Events.attributionStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("attr_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("attr_out")
    val batch = graft.SparkEntry.queries("ev_attribution")(spark, sfDir)
      .select("purchase_id", "user_id", "p_ts", "click_id", "c_ts", "click_value")
    assert(streamed.count() == batch.count(), "pair counts differ")
    assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
  }

  test("dedupStream drops within-watermark duplicates, state bounded") {
    // duplicate every event once in the source; the deduped stream must
    // agree with the batch distinct-on-id count
    val dir = Files.createTempDirectory("graft-events-dup").toString
    val base = graft.core.Tables.events(spark, sfDir)
    base.unionByName(base).write.mode("overwrite").parquet(dir)
    val q = Events.dedupStream(Events.readEventStream(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("dedup_out").count()
    assert(streamed == base.select("event_id").distinct().count())
  }

  test("streaming novelty filter drops corpus-known docs, passes novel ones") {
    import graft.operators.Dedup
    import graft.streaming.Ingest
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-docs").toString
    docs.write.mode("overwrite").parquet(dir)
    // corpus = even doc_ids; the stream replays ALL docs -> only odd pass
    val index = Dedup.exactIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val q = Ingest.noveltyFilter(Ingest.readDocStream(spark, dir), index)
      .writeStream.outputMode("append").format("memory").queryName("novel_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("novel_out").select("doc_id").as[Long].collect().toSet
    val expected = docs.filter(col("doc_id") % 2 === 1).select("doc_id").as[Long].collect().toSet
    assert(got == expected, s"diff: ${(got diff expected) ++ (expected diff got)}")
  }

  test("streaming corpus gate equals the batch gate + novelty composition") {
    import graft.operators.Dedup
    import graft.streaming.Ingest
    import graft.functions.TextFns
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val dir = Files.createTempDirectory("graft-docs-gate").toString
    docs.write.mode("overwrite").parquet(dir)
    val index = Dedup.exactIndex(docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
    val q = Ingest.corpusGateStream(Ingest.readDocStream(spark, dir), index,
        minTokens = 30, maxTokens = 800)
      .writeStream.outputMode("append").format("memory").queryName("gate_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("gate_out").select("doc_id").as[Long].collect().toSet
    // batch twin: same band, odd ids only (evens are corpus-known)
    val expected = docs
      .withColumn("n_tokens", TextFns.tokenCount(col("text")))
      .filter(col("n_tokens").between(30, 800) && col("doc_id") % 2 === 1)
      .select("doc_id").as[Long].collect().toSet
    assert(got == expected, s"diff: ${(got diff expected) ++ (expected diff got)}")
    assert(got.nonEmpty && got.size < docs.count() / 2, "gate vacuous")
  }

  test("sessionize closes sessions at gaps and matches a batch recomputation") {
    import org.apache.spark.sql.expressions.Window
    val stream = Events.readEventStream(spark, eventsDir)
    val q = Events.sessionize(spark, stream, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sessions_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("sessions_out")
    assert(got.count() > 0)
    // batch twin: sessions from gap > 30min per user (window lag), minus the
    // final (still-open) session per user which streaming holds in state
    val ev = graft.core.Tables.events(spark, sfDir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val sessions = ev
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        (col("prev_ts").isNull ||
          col("ts").cast("long") - col("prev_ts").cast("long") > 1800).cast("long"))
      .withColumn("session_no", sum(col("new_session")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_no")
      .agg(count(lit(1)).as("n_events"), max(col("ts")).as("session_end"))
    // still-held sessions: the last per user, unless the final watermark
    // (max ts - 1h) already passed session_end + 30min (then the timeout
    // path emitted them too)
    val maxTs = ev.agg(max(col("ts")).cast("long")).head().getLong(0)
    val lastPerUser = sessions.groupBy("user_id").agg(max("session_no").as("last_no"))
    val held = sessions.join(lastPerUser,
        sessions("user_id") === lastPerUser("user_id") &&
          sessions("session_no") === lastPerUser("last_no"), "left_semi")
      .filter(col("session_end").cast("long") + 1800 >= maxTs - 3600)
    val closedBatch = sessions.join(held,
      sessions("user_id") === held("user_id") &&
        sessions("session_no") === held("session_no"), "left_anti")
    assert(got.count() == closedBatch.count())
    // event counts per closed session agree (session_end compared at
    // second precision: the state API goes through java.sql.Timestamp
    // millis while the batch side keeps parquet micros)
    val mismatch = got.select(col("user_id"),
        col("session_end").cast("long").as("end_s"), col("n_events"))
      .join(closedBatch.select(col("user_id").as("u2"),
        col("session_end").cast("long").as("e2"), col("n_events").as("n2")),
        col("user_id") === col("u2") && col("end_s") === col("e2") &&
          col("n_events") === col("n2"), "left_anti").count()
    assert(mismatch == 0)
  }

  test("streaming funnel stage counts equal the batch Funnel on in-order replay") {
    val stream = Events.readEventStream(spark, eventsDir)
    val q = Events.funnelStream(spark, stream, Seq("view", "click", "purchase"))
      .writeStream.outputMode("update").format("memory").queryName("funnel_out").start()
    try q.processAllAvailable() finally q.stop()
    // latest state per user (update mode re-emits on change)
    val streamed = spark.table("funnel_out")
      .groupBy("user_id").agg(max("stage").as("stage"))
      .filter(col("stage") >= 1)
    val streamedByStage = (1 to 3).map(k => streamed.filter(col("stage") >= k).count())
    val batch = graft.ops.Funnel.counts(
        graft.core.Tables.events(spark, sfDir)
          .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us")),
        "user_id", "us",
        Seq("view" -> (col("event_type") === "view"),
          "click" -> (col("event_type") === "click"),
          "purchase" -> (col("event_type") === "purchase")))
      .orderBy("stage").select("n_users").as[Long].collect().toSeq
    assert(streamedByStage == batch,
      s"streaming $streamedByStage vs batch $batch")
  }

  test("streaming OHLC bars equal the batch ev_ohlc twin") {
    val stream = Events.readEventStream(spark, eventsDir)
    val q = Events.ohlcStream(stream)
      .writeStream.outputMode("complete").format("memory").queryName("ohlc_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("ohlc_out")
      .select(col("hour_start").cast("long").as("h"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"))
    val batch = graft.queries.Analytics.queries.find(_.name == "ev_ohlc").get
      .fn(spark, sfDir)
      .select(col("hour_epoch").as("h"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).count() == 0 && batch.exceptAll(streamed).count() == 0)
  }

  test("streaming near-dup probe equals the one-shot batch probe across micro-batches") {
    import graft.operators.Dedup
    import graft.streaming.Ingest
    val docs = graft.core.Tables.documents(spark, sfDir)
      .select("doc_id", "text", "lang", "source", "n_chars")
    val corpus = docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text")
    val index = Dedup.minhashIndex(corpus, "doc_id", "text")
    val dir = Files.createTempDirectory("graft-neardup-in").toString
    val out = Files.createTempDirectory("graft-neardup-out").toString + "/probe"
    val ckpt = Files.createTempDirectory("graft-neardup-ckpt").toString
    // two arriving batches of planted exact copies of corpus-known docs
    // (re-keyed clear of real ids) — each must pair with its original
    val b1 = docs.filter(col("doc_id") % 14 === 0)
      .withColumn("doc_id", col("doc_id") + (1L << 40))
    val b2 = docs.filter(col("doc_id") % 14 === 2)
      .withColumn("doc_id", col("doc_id") + (1L << 41))
    b1.write.mode("append").parquet(dir)
    val q = Ingest.nearDupProbeSink(Ingest.readDocStream(spark, dir), index, out, ckpt).start()
    try {
      q.processAllAvailable()
      b2.write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).drop("probe_batch")
      .as[(Long, Long, Double)].collect().toSet
    // micro-batched probing must equal the one-shot batch probe: probing
    // is per-document independent, so splitting into batches changes nothing
    val expected = Dedup.incrementalNearDupPairs(
        b1.unionByName(b2).select("doc_id", "text"), index, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected, s"diff: ${(got diff expected) ++ (expected diff got)}")
    // non-vacuous: every planted copy surfaces against its original at 1.0
    val planted = docs.filter(col("doc_id") % 14 === 0).select("doc_id").as[Long].collect()
    assert(planted.nonEmpty)
    planted.foreach { origId =>
      assert(got.contains((origId + (1L << 40), origId, 1.0)),
        s"planted copy of $origId did not surface at est_jaccard 1.0")
    }
  }

  test("streaming k-NN probe equals the one-shot batch knnJoin across micro-batches") {
    import graft.operators.Similarity
    import graft.streaming.Ingest
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val idxDir = Files.createTempDirectory("graft-knn-idx").toString + "/idx"
    val cents = Similarity.buildIvfIndex(e, "vec_id", "embedding", idxDir, nCells = 8)
    val dir = Files.createTempDirectory("graft-knn-in").toString
    val out = Files.createTempDirectory("graft-knn-out").toString + "/probe"
    val ckpt = Files.createTempDirectory("graft-knn-ckpt").toString
    val queries = e.filter(col("vec_id") % 16 === 0)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val b1 = queries.filter(col("q_id") % 32 === 0)
    val b2 = queries.filter(col("q_id") % 32 =!= 0)
    b1.write.mode("append").parquet(dir)
    val q = Ingest.knnProbeSink(
      spark.readStream.schema(queries.schema).parquet(dir),
      idxDir, cents, out, ckpt).start()
    try {
      q.processAllAvailable()
      b2.write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.read.parquet(out).drop("probe_batch")
      .as[(Long, Long, Double)].collect().toSet
    // probing is per-query independent against a frozen index, so the
    // micro-batched union must equal the one-shot batch retrieval
    val expected = Similarity.knnJoin(spark, idxDir, "vec_id", "embedding",
        queries, "q_id", "q_emb", k = 5, cents, nProbe = 4, excludeSelf = true)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected, s"diff: ${(got diff expected) ++ (expected diff got)}")
    assert(got.nonEmpty && got.groupBy(_._1).size == queries.count())
  }

  test("streaming index append equals the one-shot batch append (content and touched cells)") {
    import graft.operators.Similarity
    import graft.streaming.Ingest
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(col("vec_id") % 4 =!= 3)
    val arrivals = e.filter(col("vec_id") % 4 === 3)
    val streamedIdx = Files.createTempDirectory("graft-appidx-s").toString + "/idx"
    val batchIdx = Files.createTempDirectory("graft-appidx-b").toString + "/idx"
    val dir = Files.createTempDirectory("graft-appidx-in").toString
    val ckpt = Files.createTempDirectory("graft-appidx-ckpt").toString
    val cents = Similarity.buildIvfIndex(base, "vec_id", "embedding", streamedIdx, nCells = 8)
    Similarity.buildIvfIndex(base, "vec_id", "embedding", batchIdx, nCells = 8)
    val b1 = arrivals.filter(col("vec_id") % 8 === 3)
    val b2 = arrivals.filter(col("vec_id") % 8 === 7)
    b1.write.mode("append").parquet(dir)
    val q = Ingest.indexAppendSink(
      spark.readStream.schema(arrivals.schema).parquet(dir),
      streamedIdx, cents, ckpt).start()
    try {
      q.processAllAvailable()
      b2.write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    Similarity.appendToIvfIndex(arrivals, "vec_id", "embedding", batchIdx, cents)
    val got = spark.read.parquet(streamedIdx).select("vec_id", "cell")
    val want = spark.read.parquet(batchIdx).select("vec_id", "cell")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "streamed appends diverge from the one-shot batch append")
    assert(got.count() == e.count())
  }

  test("cmsSketchSink: merged per-batch partials equal the one-shot sketch bit-for-bit") {
    import graft.ops.Stats
    import graft.streaming.Ingest
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val dir = Files.createTempDirectory("graft-cms-in").toString
    val out = Files.createTempDirectory("graft-cms-out").toString
    val ckpt = Files.createTempDirectory("graft-cms-ckpt").toString
    val items = docs.select(col("doc_id"), col("lang"))
    val b1 = items.filter(col("doc_id") % 2 === 0)
    val b2 = items.filter(col("doc_id") % 2 === 1)
    b1.write.mode("append").parquet(dir)
    val q = Ingest.cmsSketchSink(
      spark.readStream.schema(items.schema).parquet(dir),
      out, ckpt, key = "lang", depth = 3, width = 64).start()
    try {
      q.processAllAvailable()
      b2.write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val merged = Ingest.readCmsCounters(spark, out)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    // additivity: Σ per-batch counters == counters of the union, exactly
    val oneShot = Stats.cmsCounters(items, "lang", depth = 3, width = 64)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(merged == oneShot, "merged partial sketches diverge from the one-shot sketch")
    // the folded sketch answers point queries: estimates ≥ true counts,
    // and equal the batch path's estimates
    val est = Stats.cmsEstimate(Ingest.readCmsCounters(spark, out),
        items, "lang", depth = 3, width = 64)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val truth = items.groupBy("lang").count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(truth.keySet == est.keySet)
    for ((k, n) <- truth) assert(est(k) >= n, s"CMS under-counted $k: ${est(k)} < $n")
  }

  test("aucSink: folded per-batch partials equal the one-shot exact AUC bit-for-bit") {
    import graft.ops.Stats
    import graft.streaming.Ingest
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val dir = Files.createTempDirectory("graft-auc-in").toString
    val out = Files.createTempDirectory("graft-auc-out").toString
    val ckpt = Files.createTempDirectory("graft-auc-ckpt").toString
    // pre-quantized score + boolean label, the sink's column contract
    val scored = orders.select(
      (col("o_orderstatus") === "F").as("p"),
      round(col("o_totalprice") * 100).cast("long").as("v"))
    val b1 = scored.filter(col("v") % 2 === 0)
    val b2 = scored.filter(col("v") % 2 =!= 0)
    b1.write.mode("append").parquet(dir)
    val q = Ingest.aucSink(
      spark.readStream.schema(scored.schema).parquet(dir),
      out, ckpt, pos = "p", valueCents = "v").start()
    try {
      q.processAllAvailable()
      b2.write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()
    val streamed = Ingest.readAuc(spark, out).head()
    val oneShot = Stats.rocAuc(scored, col("p"), col("v")).head()
    assert(streamed == oneShot,
      s"streamed AUC $streamed diverges from one-shot $oneShot")
    // and the mid-stream state was already the exact AUC of batch 1
    val afterB1 = Stats.rocAuc(b1, col("p"), col("v")).head()
    val partial1 = Stats.rocAucFromPartials(
      spark.read.parquet(s"$out/auc_batch=0")).head()
    assert(partial1 == afterB1)
  }

  test("indexMaintainSink: exactly-once appends plus bounded per-cell file counts") {
    import graft.operators.Similarity
    import graft.streaming.Ingest
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(col("vec_id") % 4 =!= 3)
    val arrivals = e.filter(col("vec_id") % 4 === 3)
    val idx = Files.createTempDirectory("graft-maint-idx").toString + "/idx"
    val dir = Files.createTempDirectory("graft-maint-in").toString
    val ckpt = Files.createTempDirectory("graft-maint-ckpt").toString
    // single-file base write → every cell starts at one file, so file
    // growth below is attributable to the streamed appends alone
    val cents = Similarity.buildIvfIndex(base.coalesce(1), "vec_id", "embedding", idx, nCells = 8)
    val q = Ingest.indexMaintainSink(
      spark.readStream.schema(arrivals.schema).parquet(dir),
      idx, cents, ckpt, maxFilesPerCell = 1, compactEveryNBatches = 2).start()
    try {
      for (r <- Seq(3, 7, 11, 15)) {
        arrivals.filter(col("vec_id") % 16 === r).coalesce(1)
          .write.mode("append").parquet(dir)
        q.processAllAvailable()
      }
    } finally q.stop()
    // content: union of streamed appends == one-shot assignment of all arrivals
    val got = spark.read.parquet(idx).select("vec_id", "cell")
    val want = e
      .withColumn("cell", element_at(Similarity.nearestCells(col("embedding"), cents, 1), 1))
      .select("vec_id", "cell")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty,
      "maintained index content diverges from the one-shot assignment")
    // maintenance: the final sweep (after batch 3) left every cell at one
    // file — four appends did not accumulate four files anywhere
    val cellDirs = new java.io.File(idx).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    assert(cellDirs.nonEmpty)
    for (c <- cellDirs) {
      val n = c.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n == 1, s"${c.getName} has $n files after maintenance, expected 1")
    }
  }

  test("index append sink is replay-safe: a re-run batch cannot duplicate index rows") {
    import graft.operators.Similarity
    import org.apache.hadoop.fs.Path
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val base = e.filter(col("vec_id") % 4 =!= 3)
    val batch = e.filter(col("vec_id") % 4 === 3)
    val idx = Files.createTempDirectory("graft-replay-idx").toString + "/idx"
    val cents = Similarity.buildIvfIndex(base, "vec_id", "embedding", idx, nCells = 8)
    val snapshot = () => spark.read.parquet(idx).select("vec_id", "cell")
      .collect().map(r => (r.getLong(0), r.get(1).toString)).sorted.toSeq

    Similarity.appendToIvfIndexIdempotent(batch, "vec_id", "embedding", idx, cents, batchId = 7L)
    val once = snapshot()
    assert(once.length == e.count(), "first append must cover base ∪ batch")

    // replay after a clean commit: exact no-op (the done marker short-circuits)
    Similarity.appendToIvfIndexIdempotent(batch, "vec_id", "embedding", idx, cents, batchId = 7L)
    assert(snapshot() == once, "replay of a committed batch changed the index")

    // replay after a simulated crash BETWEEN the file moves and the commit
    // marker: the staged files were already renamed into live cell dirs,
    // but no done marker exists — the retry must sweep the prior attempt's
    // batch-keyed files and converge to the identical row set, not double it
    val fs = new Path(idx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.delete(new Path(s"$idx/_ingest_commits/batch-7.done"), false),
      "fixture sanity: commit marker must exist to simulate the crash window")
    Similarity.appendToIvfIndexIdempotent(batch, "vec_id", "embedding", idx, cents, batchId = 7L)
    assert(snapshot() == once, "crash-window replay duplicated or lost index rows")
    assert(fs.exists(new Path(s"$idx/_ingest_commits/batch-7.done")), "retry must re-commit")
    assert(!fs.exists(new Path(s"$idx/_ingest_stage/batch-7")), "stage dir must be cleaned")

    // a SECOND batch under a new id appends normally (no cross-batch interference)
    val b2base = snapshot()
    Similarity.appendToIvfIndexIdempotent(
      base.filter(col("vec_id") % 16 === 0), "vec_id", "embedding", idx, cents, batchId = 8L)
    assert(snapshot().length == b2base.length +
      base.filter(col("vec_id") % 16 === 0).count(), "second batch must append")

    // PQ twin: same protocol, same convergence under replay
    val pqIdx = Files.createTempDirectory("graft-replay-pq").toString + "/idx"
    val (pqCents, cbs) = Similarity.buildIvfPqIndex(
      base, "vec_id", "embedding", pqIdx, dim = 64, nCells = 8,
      trainIters = 3, m = 4, ksub = 8, pqIters = 2)
    val pqSnap = () => spark.read.parquet(pqIdx).select("vec_id", "cell")
      .collect().map(r => (r.getLong(0), r.get(1).toString)).sorted.toSeq
    Similarity.appendToIvfPqIndexIdempotent(
      batch, "vec_id", "embedding", pqIdx, pqCents, cbs, subDim = 16, batchId = 3L)
    val pqOnce = pqSnap()
    assert(pqOnce.length == e.count(), "PQ append must cover base ∪ batch")
    Similarity.appendToIvfPqIndexIdempotent(
      batch, "vec_id", "embedding", pqIdx, pqCents, cbs, subDim = 16, batchId = 3L)
    assert(pqSnap() == pqOnce, "PQ replay of a committed batch changed the index")
    val pqFs = new Path(pqIdx).getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(pqFs.delete(new Path(s"$pqIdx/_ingest_commits/batch-3.done"), false))
    Similarity.appendToIvfPqIndexIdempotent(
      batch, "vec_id", "embedding", pqIdx, pqCents, cbs, subDim = 16, batchId = 3L)
    assert(pqSnap() == pqOnce, "PQ crash-window replay duplicated or lost index rows")

    // compaction must refuse while an UNCOMMITTED append's stage dir
    // exists (compacting a crashed attempt's renamed files would make the
    // later replay duplicate them)
    fs.mkdirs(new Path(s"$idx/_ingest_stage/batch-99"))
    val err = intercept[IllegalArgumentException] {
      Similarity.compactIvfIndex(spark, idx, maxFilesPerCell = 0)
    }
    assert(err.getMessage.contains("batch-99"))
    fs.delete(new Path(s"$idx/_ingest_stage/batch-99"), true)
    Similarity.compactIvfIndex(spark, idx, maxFilesPerCell = 0) // drained: compacts fine

    // crash window between commit-marker create and stage delete: the
    // leftover stage dir of a COMMITTED batch must not wedge compaction
    // (self-heal) nor make a replay duplicate rows (short-circuit cleans)
    val preCrash = snapshot()
    fs.mkdirs(new Path(s"$idx/_ingest_stage/batch-8")) // batch 8 committed above
    Similarity.compactIvfIndex(spark, idx, maxFilesPerCell = 0) // heals, no throw
    assert(!fs.exists(new Path(s"$idx/_ingest_stage/batch-8")),
      "committed batch's stage leftover must be dropped by the guard")
    fs.mkdirs(new Path(s"$idx/_ingest_stage/batch-8"))
    Similarity.appendToIvfIndexIdempotent(
      base.filter(col("vec_id") % 16 === 0), "vec_id", "embedding", idx, cents, batchId = 8L)
    assert(!fs.exists(new Path(s"$idx/_ingest_stage/batch-8")),
      "replay of a committed batch must clean its stage leftover")
    assert(snapshot() == preCrash, "committed-batch replay must not change the index")
  }

  test("upsertSink maintains a parquet dimension across micro-batches (MERGE per batch)") {
    import graft.streaming.Ingest
    import org.apache.spark.sql.types._
    val updDir = Files.createTempDirectory("graft-upd").toString
    val target = Files.createTempDirectory("graft-dim").toString + "/dim"
    val ckpt = Files.createTempDirectory("graft-upd-ckpt").toString
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("v", StringType), StructField("version", LongType)))
    // batch 1: inserts, including two versions of k=2 in ONE batch — the
    // in-batch collapse must keep the higher version
    Seq((1L, "a", 1L), (2L, "b", 1L), (2L, "b2", 2L), (3L, "c", 1L))
      .toDF("k", "v", "version").write.mode("append").parquet(updDir)
    val q = Ingest.upsertSink(
      spark.readStream.schema(schema).parquet(updDir),
      target, ckpt, Seq("k"), "version").start()
    try {
      q.processAllAvailable()
      val after1 = spark.read.parquet(target).as[(Long, String, Long)].collect().toSet
      assert(after1 == Set((1L, "a", 1L), (2L, "b2", 2L), (3L, "c", 1L)))
      // batch 2 (arrives after batch 1 is fully applied): update + insert
      Seq((2L, "b3", 3L), (4L, "d", 1L))
        .toDF("k", "v", "version").write.mode("append").parquet(updDir)
      q.processAllAvailable()
      val after2 = spark.read.parquet(target).as[(Long, String, Long)].collect().toSet
      assert(after2 == Set((1L, "a", 1L), (2L, "b3", 3L), (3L, "c", 1L), (4L, "d", 1L)))
    } finally q.stop()
  }

  test("mergeSink: CDC stream with deletes maintains the snapshot table exactly") {
    import graft.core.{SnapshotOps, Snapshots}
    import graft.streaming.Ingest
    import org.apache.spark.sql.types._
    val updDir = Files.createTempDirectory("graft-mrg-in").toString
    val target = Files.createTempDirectory("graft-mrg-out").toString + "/tbl"
    val ckpt = Files.createTempDirectory("graft-mrg-ckpt").toString
    // seed table: two partitions
    Snapshots.publishPartitions(spark, target) { stage =>
      Seq((1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0))
        .toDF("k", "part", "v").write.partitionBy("part").parquet(stage)
    }
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("part", StringType), StructField("v", DoubleType),
      StructField("op", StringType), StructField("seq", LongType)))
    // batch 1: update k=1, insert k=4 into a NEW partition, plus an
    // in-batch supersede of k=4 (seq 2 must win over seq 1)
    Seq((1L, "p1", 11.0, "upsert", 1L), (4L, "p3", 40.0, "upsert", 1L),
        (4L, "p3", 44.0, "upsert", 2L))
      .toDF("k", "part", "v", "op", "seq").write.mode("append").parquet(updDir)
    val q = Ingest.mergeSink(
      spark.readStream.schema(schema).parquet(updDir),
      target, ckpt, Seq("k"), "part").start()
    try {
      q.processAllAvailable()
      val after1 = Snapshots.readSnapshot(spark, target)
        .select("k", "part", "v").as[(Long, String, Double)].collect().toSet
      assert(after1 == Set((1L, "p1", 11.0), (2L, "p1", 20.0),
        (3L, "p2", 30.0), (4L, "p3", 44.0)))
      // batch 2: delete k=3 — its partition p2 empties and must DROP
      Seq((3L, "p2", 30.0, "delete", 1L))
        .toDF("k", "part", "v", "op", "seq").write.mode("append").parquet(updDir)
      q.processAllAvailable()
      val after2 = Snapshots.readSnapshot(spark, target)
        .select("k", "part", "v").as[(Long, String, Double)].collect().toSet
      assert(after2 == Set((1L, "p1", 11.0), (2L, "p1", 20.0), (4L, "p3", 44.0)))
    } finally q.stop()
    val vFinal = Snapshots.latestVersion(spark, target).get
    // at-least-once REPLAYS converge: a replayed upsert batch re-commits
    // identical content; a replayed delete-only batch merges nothing
    // (allowNoop) and must not even commit a version
    Ingest.applyMergeBatch(
      Seq((1L, "p1", 11.0, "upsert", 1L), (4L, "p3", 44.0, "upsert", 2L))
        .toDF("k", "part", "v", "op", "seq"), target, Seq("k"), "part")
    val replayed = Snapshots.readSnapshot(spark, target)
      .select("k", "part", "v").as[(Long, String, Double)].collect().toSet
    assert(replayed == Set((1L, "p1", 11.0), (2L, "p1", 20.0), (4L, "p3", 44.0)),
      "replayed upsert batch changed content")
    Ingest.applyMergeBatch(
      Seq((3L, "p2", 30.0, "delete", 1L)).toDF("k", "part", "v", "op", "seq"),
      target, Seq("k"), "part")
    assert(Snapshots.latestVersion(spark, target).get == vFinal + 1,
      "replayed delete-only batch should no-op without committing")
    val afterReplay = Snapshots.readSnapshot(spark, target)
      .select("k", "part", "v").as[(Long, String, Double)].collect().toSet
    assert(afterReplay == replayed, "replayed delete batch changed content")
  }

  test("mergeOnReadSink: DV commits in the hot path, purge tick materializes, replay no-ops") {
    import graft.core.Snapshots
    import graft.streaming.Ingest
    import org.apache.spark.sql.types._
    val updDir = Files.createTempDirectory("graft-mor-in").toString
    val target = Files.createTempDirectory("graft-mor-out").toString + "/tbl"
    val ckpt = Files.createTempDirectory("graft-mor-ckpt").toString
    Snapshots.publishPartitions(spark, target) { stage =>
      Seq((1L, "p1", 10.0), (2L, "p1", 20.0), (3L, "p2", 30.0))
        .toDF("k", "part", "v").write.partitionBy("part").parquet(stage)
    }
    val seedFiles = Snapshots.manifestFiles(spark, target, 1L).toSet
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("part", StringType), StructField("v", DoubleType),
      StructField("op", StringType), StructField("seq", LongType)))
    // batch 1 (batchId 0): update k=1, insert k=4, in-batch supersede
    Seq((1L, "p1", 11.0, "upsert", 1L), (4L, "p3", 40.0, "upsert", 1L),
        (4L, "p3", 44.0, "upsert", 2L))
      .toDF("k", "part", "v", "op", "seq").write.mode("append").parquet(updDir)
    val q = Ingest.mergeOnReadSink(
      spark.readStream.schema(schema).parquet(updDir),
      target, ckpt, Seq("k"), "part", purgeEveryNBatches = 2).start()
    try {
      q.processAllAvailable()
      val after1 = Snapshots.readSnapshot(spark, target)
        .select("k", "part", "v").as[(Long, String, Double)].collect().toSet
      assert(after1 == Set((1L, "p1", 11.0), (2L, "p1", 20.0),
        (3L, "p2", 30.0), (4L, "p3", 44.0)))
      // hot path = merge-on-read: every seed file still in the manifest
      val v2 = Snapshots.latestVersion(spark, target).get
      assert(seedFiles.subsetOf(Snapshots.manifestFiles(spark, target, v2).toSet),
        "the DV hot path must not rewrite seed files")
      assert(Snapshots.fileDvs(spark, target, v2).nonEmpty,
        "the update must have committed deletion vectors")
      // batch 2 (batchId 1): delete k=3 — then the purge tick fires:
      // vectors materialize, the emptied partition drops, DVs clear
      Seq((3L, "p2", 30.0, "delete", 1L))
        .toDF("k", "part", "v", "op", "seq").write.mode("append").parquet(updDir)
      q.processAllAvailable()
      val after2 = Snapshots.readSnapshot(spark, target)
        .select("k", "part", "v").as[(Long, String, Double)].collect().toSet
      assert(after2 == Set((1L, "p1", 11.0), (2L, "p1", 20.0), (4L, "p3", 44.0)))
      val vP = Snapshots.latestVersion(spark, target).get
      assert(Snapshots.fileDvs(spark, target, vP).isEmpty,
        "the purge tick must clear the pending vectors")
      assert(!Snapshots.manifestFiles(spark, target, vP).exists(_.startsWith("part=p2/")),
        "the fully-dead partition must drop at the purge tick")
    } finally q.stop()
    // at-least-once replays: a replayed delete finds its positions dead
    // (the probe subtracts DVs) and must not even commit a version
    val vFinal = Snapshots.latestVersion(spark, target).get
    Ingest.applyMergeOnReadBatch(
      Seq((3L, "p2", 30.0, "delete", 1L)).toDF("k", "part", "v", "op", "seq"),
      target, Seq("k"), "part")
    assert(Snapshots.latestVersion(spark, target).get == vFinal,
      "replayed delete-only batch must no-op without committing")
    // a replayed upsert converges in content (one superseded version ok)
    Ingest.applyMergeOnReadBatch(
      Seq((1L, "p1", 11.0, "upsert", 1L)).toDF("k", "part", "v", "op", "seq"),
      target, Seq("k"), "part")
    val afterReplay = Snapshots.readSnapshot(spark, target)
      .select("k", "part", "v").as[(Long, String, Double)].collect().toSet
    assert(afterReplay == Set((1L, "p1", 11.0), (2L, "p1", 20.0), (4L, "p3", 44.0)))
  }

  test("snapshotMaintainSink: publishes stream, optimize tick bounds files, vacuum reclaims") {
    import graft.core.Snapshots
    import graft.streaming.Ingest
    val items = graft.core.Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
    val dir = Files.createTempDirectory("graft-mnt-in").toString
    val target = Files.createTempDirectory("graft-mnt-out").toString + "/tbl"
    val ckpt = Files.createTempDirectory("graft-mnt-ckpt").toString
    // four source files + maxFilesPerTrigger=1 => four micro-batches, so
    // the every-4th-batch maintenance tick fires exactly once
    (0 until 4).foreach(i =>
      items.filter(col("event_id") % 4 === i).coalesce(1)
        .write.mode("append").parquet(dir))
    val q = Ingest.snapshotMaintainSink(
      spark.readStream.schema(items.schema).option("maxFilesPerTrigger", "1").parquet(dir),
      target, ckpt, partitionCol = "event_type",
      optimizeEveryNBatches = 4, keepVersions = 2, vacuumGraceMs = 0).start()
    try q.processAllAvailable() finally q.stop()
    // content: everything ingested, exactly once
    val latest = Snapshots.readSnapshot(spark, target)
      .select("event_type", "event_id", "value")
    assert(latest.exceptAll(items).isEmpty && items.exceptAll(latest).isEmpty,
      "maintained table diverged from the ingested content")
    // the optimize tick ran: each partition packed to its bin count (1)
    val v = Snapshots.latestVersion(spark, target).get
    val perPart = Snapshots.manifestFiles(spark, target, v)
      .groupBy(_.takeWhile(_ != '/')).view.mapValues(_.size)
    assert(perPart.values.forall(_ == 1),
      s"optimize tick did not pack the partitions: ${perPart.toMap}")
    // vacuum reclaimed superseded versions beyond keepVersions
    val kept = Snapshots.history(spark, target).map(_._1)
    assert(kept.size <= 2, s"vacuum kept ${kept.size} versions, expected <= 2")
  }

  test("snapshotPublishSink: per-batch atomic publishes, pinned isolation, replay converges") {
    import graft.core.Snapshots
    import graft.streaming.Ingest
    val items = graft.core.Tables.events(spark, sfDir)
      .select(col("event_type"), col("event_id"), col("value"))
    val b1 = items.filter(col("event_id") % 2 === 0)
    val b2 = items.filter(col("event_id") % 2 === 1)
    val dir = Files.createTempDirectory("graft-pub-in").toString
    val target = Files.createTempDirectory("graft-pub-out").toString + "/tbl"
    val ckpt = Files.createTempDirectory("graft-pub-ckpt").toString
    b1.write.mode("append").parquet(dir)
    val q = Ingest.snapshotPublishSink(
      spark.readStream.schema(items.schema).parquet(dir),
      target, ckpt, partitionCol = "event_type").start()
    try {
      q.processAllAvailable()
      b2.write.mode("append").parquet(dir)
      q.processAllAvailable()
    } finally q.stop()

    def content(df: org.apache.spark.sql.DataFrame) =
      df.select("event_type", "event_id", "value")
    val latest = content(Snapshots.readSnapshot(spark, target))
    assert(latest.exceptAll(items).isEmpty && items.exceptAll(latest).isEmpty,
      "streamed publishes diverge from the one-shot content")
    // batch 1's version is pinned history: exactly the first half
    val v = Snapshots.latestVersion(spark, target).get
    assert(v >= 2)
    val pinned = content(Snapshots.readSnapshot(spark, target, Some(v - 1)))
    assert(pinned.exceptAll(b1).isEmpty && b1.exceptAll(pinned).isEmpty,
      "the previous version must still read as exactly batch 1")
    // at-least-once replay of the second batch: content converges (one
    // more superseded version is the only residue)
    Ingest.applyPublishBatch(b2, target, "event_type", batchId = 1L)
    val replayed = content(Snapshots.readSnapshot(spark, target))
    assert(replayed.exceptAll(items).isEmpty && items.exceptAll(replayed).isEmpty,
      "a replayed batch must not duplicate rows")
  }

  test("indexMaintainSink: the profile step raises and clears the retrain marker") {
    import graft.operators.Similarity
    import graft.streaming.Ingest
    val e = graft.core.Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), transform(col("embedding"), x => x.cast("double")).as("emb"))
    val root = Files.createTempDirectory("graft-maint-rt").toString + "/idx"
    val cents = Similarity.buildIvfIndex(e, "vec_id", "emb", root, nCells = 4)
    val dir = Files.createTempDirectory("graft-maint-in").toString
    val ckpt = Files.createTempDirectory("graft-maint-ckpt").toString
    def sink(cs: Seq[(Int, Seq[Double])]) = Ingest.indexMaintainSink(
      spark.readStream.schema(e.schema).parquet(dir), root, cs, ckpt,
      id = "vec_id", vec = "emb",
      compactEveryNBatches = 100, profileEveryNBatches = 1)

    // batch 0: same distribution — first profile writes the baseline
    e.limit(10).withColumn("vec_id", col("vec_id") + 5000)
      .write.mode("append").parquet(dir)
    val q1 = sink(cents).start()
    try q1.processAllAvailable() finally q1.stop()
    assert(Similarity.retrainRequested(spark, root).isEmpty,
      "the bootstrap profile must only write the baseline")

    // batch 1: a drifted slab — the trigger fires and the marker appears
    e.filter(col("vec_id") % 2 === 1)
      .select((col("vec_id") + 6000).as("vec_id"),
        transform(col("emb"), x => x * 0.2 + 0.5).as("emb"))
      .write.mode("append").parquet(dir)
    val q2 = sink(cents).start()
    try q2.processAllAvailable() finally q2.stop()
    val req = Similarity.retrainRequested(spark, root)
    assert(req.exists(_.contains("inertia_ratio=")),
      s"drift must raise the marker with its measured ratios, got $req")

    // the scheduler answers with the batch rebuild; the restarted sink's
    // next profile measures a fresh baseline and clears the marker
    val (_, newCents) = Similarity.rebuildIvfIndex(spark, root, "vec_id", "emb")
    e.limit(3).withColumn("vec_id", col("vec_id") + 7000)
      .write.mode("append").parquet(dir)
    val q3 = sink(newCents).start()
    try q3.processAllAvailable() finally q3.stop()
    assert(Similarity.retrainRequested(spark, root).isEmpty,
      "a completed rebuild must clear the standing request at the next profile")
  }

  test("userRunningTotals keeps per-user state across a micro-batch") {
    val stream = Events.readEventStream(spark, eventsDir)
    val q = Events.userRunningTotals(spark, stream)
      .writeStream.outputMode("update").format("memory").queryName("user_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("user_out").groupBy("user_id").agg(max("n_events").as("n"))
    val want = graft.core.Tables.events(spark, sfDir).groupBy("user_id").count()
    assert(got.join(want, got("user_id") === want("user_id") && got("n") === want("count")).count()
      == want.count())
  }
}
