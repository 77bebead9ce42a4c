package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{CorpusPrep, Dedup}

/** OPT-IN 100× scale probe (VERDICT r8 #7): the 10× probes in
  * [[ScaleProbeSpec]] bound the per-decade growth; this pushes the two
  * end-to-end composites across a full 100× span — `sm_corpus_prep`
  * (gate → exact-dedup → global shuffle → shard) at 50k → 5M synthetic
  * docs and `dd_corpus_dedup` (minhash LSH → verify → connected
  * components → keep-best) at 20k → 2M — asserting at-or-below-linear
  * growth (ratio ≤ 250 for 100× data, the same 2.5× contention slack the
  * 10× gate uses) and an unchanged exchange count, with planted-dup
  * recall held at the documented floor at 2M docs.
  *
  * Opt-in because the 2M-doc dedup run is minutes of real compute:
  * `SPARK_GRAFT_SCALE100=1 sbt "testOnly graft.Scale100Spec"`. Measured
  * numbers are recorded in BASELINE.md ("100× scale probe").
  */
class Scale100Spec extends SparkTestBase {

  private def optIn(): Unit =
    if (!sys.env.get("SPARK_GRAFT_SCALE100").contains("1"))
      cancel("opt-in: set SPARK_GRAFT_SCALE100=1 (minutes of compute)")

  // same generator family as ScaleProbeSpec: hash-derived unique vocab,
  // 3% planted exact copies, 3% planted near-copies
  private def syntheticDocs(n: Long): DataFrame = {
    val base = spark.range(n).select(
      col("id").as("doc_id"),
      array_join(
        transform(sequence(lit(1), lit(40)),
          k => substring(md5(concat_ws("-", col("id"), k)), 1, 6)),
        " ").as("text"))
    val exact = base.filter(pmod(col("doc_id"), lit(100)) < 3)
      .select((col("doc_id") + lit(1L << 40)).as("doc_id"), col("text"))
    val near = base
      .filter(pmod(col("doc_id"), lit(100)).between(50, 52))
      .select((col("doc_id") + lit(1L << 41)).as("doc_id"),
        concat(col("text"), lit(" zzextra")).as("text"))
    base.unionByName(exact).unionByName(near)
  }

  private def timed(f: => Long): (Long, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def exchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size

  test("merge-on-read at 100x: fixed CDC batch cost stays flat, zero rewrites") {
    optIn()
    import graft.core.{SnapshotOps, Snapshots}
    // rows-per-partition FIXED (2k), so the 2M-row table has 1000
    // partitions — a fixed 20-key DV merge must cost the bloom probe +
    // one candidate file's position scan + the sidecar write at EITHER
    // scale; the gate is far below linear (100x data in <= 6x time; the
    // residual is the manifest/sidecar listing, never data IO), and the
    // zero-rewrite claim is asserted structurally on the 2M table.
    def build(n: Long, tag: String): String = {
      val root = java.nio.file.Files.createTempDirectory(s"probe100-mor-$tag")
        .toString + "/tbl"
      val rows = spark.range(n).select(
        concat(lit("p"), (col("id") / 2000).cast("long")).as("part"),
        col("id"), (col("id") % 97).as("v"))
      Snapshots.publishPartitions(spark, root, bloomCols = Seq("id"))(stage =>
        rows.write.partitionBy("part").parquet(stage))
      root
    }
    def morOnce(root: String): Long = {
      import spark.implicits._
      SnapshotOps.mergeOnRead(spark, root,
        (0L until 20L).map(i => ("p0", i, 1000L + i, "upsert"))
          .toDF("part", "id", "v", "op"),
        Seq("id"), "part")
    }
    val small = build(20000L, "small")
    val big = build(2000000L, "big")
    morOnce(small) // warm the code paths
    val (_, tS) = timed(morOnce(small))
    val (vB, tB) = timed(morOnce(big))
    info(f"merge-on-read fixed batch: 20k-table=$tS%.2fs 2M-table=$tB%.2fs " +
      f"(${tB / math.max(tS, 0.3)}%.1fx for 100x data)")
    assert(tB <= math.max(tS, 0.5) * 6 + 3.0,
      f"fixed-batch merge-on-read grew ${tB / math.max(tS, 0.3)}%.1fx on a 100x " +
        "table — something in the probe or commit scans the table")
    val v1Files = Snapshots.manifestFiles(spark, big, 1L).toSet
    assert(v1Files.subsetOf(Snapshots.manifestFiles(spark, big, vB).toSet),
      "a DV commit must carry every previous data file verbatim")
    assert(Snapshots.readSnapshot(spark, big)
      .filter(col("id") < 20 && col("v") >= 1000L).count() == 20)
    // listing-cost COUNT holds at 2M: recorded rows minus DV positions
    assert(Snapshots.snapshotRowCount(spark, big) == 2000000L)
  }

  test("sm_corpus_prep: 100x docs within linear time, same exchange count") {
    optIn()
    val n = 50000L
    def prep(m: Long): DataFrame =
      CorpusPrep.prepare(syntheticDocs(m), "doc_id", "text",
        minTokens = 1, maxTokens = 1000, rowsPerShard = 4096)
    def run(m: Long): (Long, Double) = timed(prep(m).count())
    run(n) // warm
    val (rowsSmall, tSmall) = run(n)
    val (rowsBig, tBig) = run(n * 100)
    assert(rowsSmall == n + (n * 3) / 100)
    assert(rowsBig == n * 100 + (n * 100 * 3) / 100)
    assert(exchanges(prep(n)) == exchanges(prep(n * 100)),
      "corpus-prep plan changed shape at 100x")
    val ratio = tBig / math.max(tSmall, 0.3)
    info(f"sm_corpus_prep 100x: small=$tSmall%.1fs big=$tBig%.1fs ratio=$ratio%.1fx")
    assert(ratio <= 250.0, f"grew $ratio%.1fx on 100x data (linear = 100x)")
  }

  // input records read by the jobs of `body` ONLY (job-group scoped —
  // the IvfAppendSpec pattern): source rows from every input (range
  // generators and parquet scans alike), so an append that reads exactly
  // its batch measures |batch| and any index scan shows up on top
  private def readsDuring[T](body: => T): (T, Long) = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}
    val group = s"s100-reads-${System.nanoTime()}"
    @volatile var read = 0L
    val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (js.properties != null && group == js.properties.getProperty("spark.jobGroup.id"))
          js.stageIds.foreach(stages.add(_))
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null && stages.contains(te.stageId))
          read += te.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "scale100 read measurement")
      val r = body
      spark.sparkContext.clearJobGroup()
      // metrics post asynchronously: poll until the counter is stable
      var last = -1L
      var stableFor = 0
      val deadline = System.currentTimeMillis() + 30000
      while (stableFor < 5 && System.currentTimeMillis() < deadline) {
        if (read == last) stableFor += 1 else { stableFor = 0; last = read }
        Thread.sleep(100)
      }
      (r, read)
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("ann index lifecycle at 100x: append never reads the index, probe stays " +
      "partition-pruned, compaction converges content-identically") {
    optIn()
    import graft.operators.Similarity
    val dim = 16
    val nCells = 32
    val nProbe = 4
    val batchN = 10000L
    def vecs(m: Long, offset: Long = 0L): DataFrame =
      spark.range(m).select(
        (col("id") + offset).as("vec_id"),
        transform(sequence(lit(1), lit(dim)),
          k => conv(substring(md5(concat_ws("-", col("id") + offset, k)), 1, 4), 16, 10)
            .cast("double") / 65536.0 - 0.5).as("embedding"))

    // (appendSec, appendIndexReads, probeReads, indexRows, probe top-k)
    def lifecycle(m: Long, tag: String): (Double, Long, Long, Long, Seq[(Long, Double)]) = {
      val path = java.nio.file.Files.createTempDirectory(s"graft-s100-$tag").toString + "/idx"
      val cents = Similarity.buildIvfIndex(vecs(m), "vec_id", "embedding", path,
        nCells, trainIters = 2, sampleMod = math.max(1, (m / 50000L).toInt))
      val t0 = System.nanoTime()
      val (_, appendReads) = readsDuring {
        for (b <- 0 until 3)
          Similarity.appendToIvfIndexIdempotent(
            vecs(batchN, offset = (1L << 40) + b * batchN),
            "vec_id", "embedding", path, cents, batchId = b.toLong)
      }
      val tAppend = (System.nanoTime() - t0) / 1e9
      val qvec = (1 to dim).map(k => (k % 7).toDouble / 7.0 - 0.5)
      def probe(): Seq[(Long, Double)] =
        Similarity.probeIvfIndex(spark, path, "vec_id", "embedding",
            qvec, queryId = -1L, k = 10, cents, nProbe)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      val (before, probeReads) = readsDuring(probe())
      // threshold sweep must converge: a second sweep finds nothing
      Similarity.compactIvfIndex(spark, path, maxFilesPerCell = 4)
      assert(Similarity.compactIvfIndex(spark, path, maxFilesPerCell = 4).isEmpty,
        s"compaction did not converge at n=$m")
      assert(probe() == before, s"compaction changed probe results at n=$m")
      // profile → retrain closes the lifecycle loop (r10 missing #3):
      // same-distribution appends must NOT trip the drift trigger, and
      // the atomic rebuild must keep the index probeable with the same
      // k-row contract (result set differs only through the re-trained
      // codebook, so compare against a self-probe, not `before`)
      Similarity.baselineIvfIndex(spark, path, "embedding")
      val (needed, ratio, skew) = Similarity.needsRetrain(spark, path, "embedding")
      assert(!needed,
        f"same-distribution appends tripped the retrain trigger at n=$m " +
          f"(inertia ratio $ratio%.3f, skew $skew%.3f)")
      val (_, newCents) = Similarity.rebuildIvfIndex(
        spark, path, "vec_id", "embedding",
        trainIters = 2, sampleMod = math.max(1, (m / 50000L).toInt))
      graft.core.Snapshots.vacuum(spark, path, keepVersions = 1, graceMs = 0L)
      val after = Similarity.probeIvfIndex(spark, path, "vec_id", "embedding",
          qvec, queryId = -1L, k = 10, newCents, nProbe)
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(after.size == 10, s"rebuilt index must answer a full top-k at n=$m")
      val (n2, r2, _) = Similarity.needsRetrain(spark, path, "embedding")
      assert(!n2 && r2 == 1.0, s"rebuild must reset the baseline at n=$m (ratio $r2)")
      (tAppend, appendReads, probeReads, m + 3 * batchN, before)
    }

    val nSmall = 20000L
    val (tAppS, readsAppS, readsPrbS, rowsS, topS) = lifecycle(nSmall, "small")
    val (tAppB, readsAppB, readsPrbB, rowsB, topB) = lifecycle(nSmall * 100, "big")
    assert(topS.size == 10 && topB.size == 10)
    // append cost ∝ |batch|: each append reads EXACTLY its batch rows at
    // either scale — one extra row would mean the existing index (20k
    // small, 2M big) was scanned
    assert(readsAppS == 3 * batchN, s"append read $readsAppS rows at n=$nSmall, " +
      s"expected exactly 3 batches x $batchN")
    assert(readsAppB == 3 * batchN, s"append read $readsAppB rows at n=${nSmall * 100}, " +
      s"expected exactly 3 batches x $batchN")
    // probe reads ∝ nProbe/nCells of the corpus across the whole span
    // (3x slack for cell imbalance)
    val bound = (f: Long) => f * nProbe.toLong * 3 / nCells
    assert(readsPrbS > 0 && readsPrbS <= bound(rowsS),
      s"probe read $readsPrbS of $rowsS rows at small scale (bound ${bound(rowsS)})")
    assert(readsPrbB > 0 && readsPrbB <= bound(rowsB),
      s"probe read $readsPrbB of $rowsB rows at 100x scale (bound ${bound(rowsB)})")
    info(f"ann lifecycle 100x: append small=$tAppS%.1fs big=$tAppB%.1fs; " +
      f"probe reads small=$readsPrbS/$rowsS big=$readsPrbB/$rowsB " +
      f"(fraction ${readsPrbB.toDouble / rowsB}%.3f, nProbe/nCells=${nProbe.toDouble / nCells}%.3f)")
    // fixed-size appends must not grow with the corpus: generous 6x +
    // contention slack against the small-scale time
    assert(tAppB <= tAppS * 6 + 10.0,
      f"append slowed from $tAppS%.1fs to $tAppB%.1fs on a 100x index — not ∝ |batch|")
  }

  test("dd_corpus_dedup: 100x docs within linear time, recall floor holds at 2M") {
    optIn()
    val n = 20000L
    def run(m: Long): (Long, Double) =
      timed(Dedup.dedupCorpus(syntheticDocs(m), "doc_id", "text").count())
    run(n) // warm
    val (rowsSmall, tSmall) = run(n)
    val (rowsBig, tBig) = run(n * 100)
    def checkRecall(m: Long, survivors: Long): Unit = {
      val planted = (m * 3) / 100 * 2
      val removed = (m + planted) - survivors
      val recall = removed.toDouble / planted
      info(f"dd_corpus_dedup n=$m: planted=$planted removed=$removed recall=$recall%.4f")
      assert(recall >= 0.99, f"planted-dup recall $recall%.4f < 0.99 at n=$m")
      assert(survivors >= m, "dedup must never remove non-duplicates")
    }
    checkRecall(n, rowsSmall)
    checkRecall(n * 100, rowsBig)
    val ratio = tBig / math.max(tSmall, 0.3)
    info(f"dd_corpus_dedup 100x: small=$tSmall%.1fs big=$tBig%.1fs ratio=$ratio%.1fx")
    assert(ratio <= 250.0, f"grew $ratio%.1fx on 100x data (linear = 100x)")
  }

  test("u26 change feed at 100x: windowed consume costs the churn, never the table") {
    optIn()
    import graft.core.{ChangeFeed, SnapshotOps, Snapshots}
    import spark.implicits._
    // same 2k-rows-per-partition layout as the merge-on-read probe: the
    // 2M table has 1000 partitions. A consumer pinned at latest, then a
    // FIXED 20-key DV merge, then consume: the window the callback sees
    // is the churn (20 upserts + their 20 removals), and the consume cost
    // must stay flat across 100x — IO proportional to the manifest diff
    // + one file's DV positions (VERDICT r12 #8).
    def build(n: Long, tag: String): String = {
      val root = java.nio.file.Files.createTempDirectory(s"probe100-feed-$tag")
        .toString + "/tbl"
      val rows = spark.range(n).select(
        concat(lit("p"), (col("id") / 2000).cast("long")).as("part"),
        col("id"), (col("id") % 97).as("v"))
      Snapshots.publishPartitions(spark, root, bloomCols = Seq("id"))(stage =>
        rows.write.partitionBy("part").parquet(stage))
      root
    }
    def probe(root: String): (Double, Long) = {
      ChangeFeed.consume(spark, root, "c100", startAtLatest = true)(_ => ())
      SnapshotOps.mergeOnRead(spark, root,
        (0L until 20L).map(i => ("p0", i, 5000L + i, "upsert"))
          .toDF("part", "id", "v", "op"),
        Seq("id"), "part")
      var seen = -1L
      val t0 = System.nanoTime()
      val win = ChangeFeed.consume(spark, root, "c100")(df => seen = df.count())
      val t = (System.nanoTime() - t0) / 1e9
      assert(win.isDefined, "consume must process the committed window")
      (t, seen)
    }
    val small = build(20000L, "small")
    val big = build(2000000L, "big")
    probe(small) // warm code paths (second consume on small is a no-op tick)
    val (tS, seenS) = probe(build(20000L, "small2"))
    val (tB, seenB) = probe(big)
    info(f"change-feed consume: 20k-table=$tS%.2fs 2M-table=$tB%.2fs " +
      f"window rows small=$seenS big=$seenB")
    // the callback's window is churn-sized at BOTH scales (20 upserted
    // rows surface as adds + their superseded versions as removes)
    assert(seenS > 0 && seenS <= 60, s"window rows $seenS not churn-sized")
    assert(seenB > 0 && seenB <= 60, s"window rows $seenB not churn-sized")
    assert(tB <= math.max(tS, 0.5) * 6 + 3.0,
      f"windowed consume grew ${tB / math.max(tS, 0.3)}%.1fx on a 100x table " +
        "— something in the diff scans the table")
  }

  test("u22 constraints on a 1000-partition staged publish: one flag pass, not one per dir") {
    optIn()
    import graft.core.Snapshots
    // the batched enforcement (ADVICE r12): a CLEAN constrained publish
    // staging 1000 partitions must pay ONE flag+count job over the batch
    // — the old per-dir loop paid an eager localCheckpoint plus two
    // counts per dir (>= 3000 jobs here). The listener bound is generous
    // (stage write + enforcement + commit machinery) but 200x under the
    // per-dir floor, so a regression to per-dir scanning trips it hard.
    val root = java.nio.file.Files.createTempDirectory("probe100-cons")
      .toString + "/tbl"
    val rows = spark.range(2000000L).select(
      concat(lit("p"), (col("id") / 2000).cast("long")).as("part"),
      col("id"), (col("id") % 97).as("v"))
    Snapshots.publishPartitions(spark, root)(stage =>
      rows.filter(col("id") < 2000).write.partitionBy("part").parquet(stage))
    Snapshots.setConstraints(spark, root, Seq("v_nonneg" -> "v >= 0"))
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val (v2, t) = try {
      val t0 = System.nanoTime()
      val v = Snapshots.publishPartitions(spark, root)(stage =>
        rows.write.partitionBy("part").parquet(stage))
      Thread.sleep(1000) // drain listener queue
      (v, (System.nanoTime() - t0) / 1e9)
    } finally spark.sparkContext.removeSparkListener(listener)
    info(f"constrained 1000-partition publish: $t%.1fs, ${jobs.get()} Spark jobs")
    assert(jobs.get() <= 15,
      s"gated publish ran ${jobs.get()} jobs over 1000 staged dirs — " +
        "enforcement is scanning per dir again")
    assert(Snapshots.manifestMeta(spark, root, v2).get("constraint_quarantined").isEmpty,
      "clean publish must record no quarantine")
    assert(Snapshots.snapshotRowCount(spark, root) == 2000000L)
  }
}
