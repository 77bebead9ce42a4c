package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Pins the incremental index-maintenance contract (VERDICT r8 #2):
  *
  *  1. `appendToIvfIndex` creates files ONLY under the cell partitions the
  *     batch actually lands in — untouched cells keep their exact file
  *     set (name + length);
  *  2. the append job reads ONLY the batch — recordsRead == |batch|, so
  *     append cost is ∝ |batch| regardless of index size (the existing
  *     inverted file is never scanned);
  *  3. append(index, batch) content-equals a rebuild of corpus ∪ batch
  *     against the SAME frozen codebook (the bit-exact probe equivalence
  *     is oracled by ann_ivf_append; this pins the (id, cell) inventory
  *     engine-side, including the PQ codes-only variant).
  */
class IvfAppendSpec extends SparkTestBase {

  private def cellFiles(path: String): Map[String, Set[(String, Long)]] = {
    val root = new java.io.File(path)
    root.listFiles().filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map { d =>
        d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.length)).toSet
      }.toMap
  }

  test("appendToIvfIndex: touched-cells-only files, batch-only reads, rebuild-equal content") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_append").toString
    val path = s"$tmp/idx"
    val base = e.filter(col("vec_id") % 4 =!= 3)
    // materialize the batch to its own parquet so the append job's entire
    // input is the batch file — recordsRead then measures exactly what
    // the append scans (a filter over the corpus would re-read all rows
    // at the source and hide an accidental index scan)
    e.filter(col("vec_id") % 4 === 3).write.parquet(s"$tmp/batch")
    val batch = spark.read.parquet(s"$tmp/batch")
    val batchCount = batch.count()

    val cents = Similarity.buildIvfIndex(base, "vec_id", "embedding", path, nCells = 8)
    val before = cellFiles(path)
    val expectedTouched = batch
      .select(element_at(Similarity.nearestCells(col("embedding"), cents, 1), 1).as("c"))
      .distinct().collect().map(r => s"cell=${r.get(0)}").toSet

    // scope the measurement to the append's OWN jobs via a job group:
    // SparkListenerJobStart carries the group property and the job's stage
    // ids, so only task metrics from those stages accumulate — an
    // unrelated or straggler job can no longer pollute the counter
    // (ADVICE r9: the previous process-global counter was flaky-by-design)
    val group = s"ivf-append-pin-${System.nanoTime()}"
    @volatile var read = 0L
    val groupStages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
    val listener = new SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        if (js.properties != null &&
            group == js.properties.getProperty("spark.jobGroup.id"))
          js.stageIds.foreach(groupStages.add(_))
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null && groupStages.contains(te.stageId))
          read += te.taskMetrics.inputMetrics.recordsRead
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      spark.sparkContext.setJobGroup(group, "ivf append under measurement")
      Similarity.appendToIvfIndex(batch, "vec_id", "embedding", path, cents)
      spark.sparkContext.clearJobGroup()
      // task metrics post asynchronously — poll until the append's reads land
      val deadline = System.currentTimeMillis() + 30000
      while (read < batchCount && System.currentTimeMillis() < deadline) Thread.sleep(100)
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(read == batchCount,
      s"append read $read records, expected exactly |batch| = $batchCount (no index scan)")

    val after = cellFiles(path)
    val grown = after.keySet.filter(c => after(c) != before.getOrElse(c, Set.empty))
    assert(grown == expectedTouched,
      s"cells with new files $grown != batch-assigned cells $expectedTouched")
    for (c <- after.keySet -- expectedTouched)
      assert(after(c) == before(c), s"untouched $c changed file set")

    // content equivalence vs rebuild-with-same-codebook over base ∪ batch
    val appended = spark.read.parquet(path).select("vec_id", "cell")
    val rebuilt = e
      .withColumn("cell", element_at(Similarity.nearestCells(col("embedding"), cents, 1), 1))
      .select("vec_id", "cell")
    assert(appended.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(appended).isEmpty,
      "appended index (id, cell) inventory differs from same-codebook rebuild")
  }

  test("compactIvfCells: file count drops, content preserved, untouched cells byte-stable") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_compact").toString
    val path = s"$tmp/idx"
    val base = e.filter(col("vec_id") % 4 =!= 3)
    val cents = Similarity.buildIvfIndex(base, "vec_id", "embedding", path, nCells = 8)
    // two separate append batches -> touched cells accumulate small files
    val arrivals = e.filter(col("vec_id") % 4 === 3)
    Similarity.appendToIvfIndex(arrivals.filter(col("vec_id") % 8 === 3),
      "vec_id", "embedding", path, cents)
    Similarity.appendToIvfIndex(arrivals.filter(col("vec_id") % 8 === 7),
      "vec_id", "embedding", path, cents)
    val before = cellFiles(path)
    val touched = arrivals
      .select(element_at(Similarity.nearestCells(col("embedding"), cents, 1), 1).as("c"))
      .distinct().collect().map(r => r.get(0).toString.toInt).toSeq
    assert(touched.exists(c => before(s"cell=$c").size > 1),
      "fixture sanity: appends must have produced multi-file cells")
    val contentBefore = spark.read.parquet(path).select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.get(1).toString)).sorted.toSeq
    Similarity.compactIvfCells(spark, path, touched)
    val after = cellFiles(path)
    for (c <- touched)
      assert(after(s"cell=$c").size == 1, s"cell=$c not compacted: ${after(s"cell=$c")}")
    for (c <- after.keySet.filterNot(k => touched.contains(k.stripPrefix("cell=").toInt)))
      assert(after(c) == before(c), s"untouched $c changed during compaction")
    val contentAfter = spark.read.parquet(path).select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.get(1).toString)).sorted.toSeq
    assert(contentAfter == contentBefore, "compaction changed index content")
  }

  test("compactIvfIndex: only threshold-crossing cells rewrite; compact index is a no-op") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_autocompact").toString
    val path = s"$tmp/idx"
    val base = e.filter(col("vec_id") % 4 =!= 3)
    val cents = Similarity.buildIvfIndex(
      base.coalesce(1), "vec_id", "embedding", path, nCells = 8)
    // fragment exactly ONE cell deterministically: pick the arrival cell
    // with the most rows and append three single-partition batches drawn
    // from it — that cell gains 3 files while every other cell keeps its
    // single base file, giving the mixed fragmented/compact fixture the
    // threshold sweep must discriminate
    val arrivals = e.filter(col("vec_id") % 4 === 3)
      .withColumn("c", element_at(Similarity.nearestCells(col("embedding"), cents, 1), 1))
    val hot = arrivals.groupBy("c").count()
      .orderBy(col("count").desc, col("c")).head().get(0).toString.toInt
    val hotRows = arrivals.filter(col("c") === hot).drop("c")
    assert(hotRows.count() >= 3, "fixture sanity: hottest arrival cell needs >= 3 rows")
    for (r <- 0 to 2)
      Similarity.appendToIvfIndex(hotRows.filter(col("vec_id") % 3 === r).coalesce(1),
        "vec_id", "embedding", path, cents)
    val before = cellFiles(path)
    val threshold = 2
    val expected = Seq(hot)
    assert(before(s"cell=$hot").size > threshold && before.size > 1,
      s"fixture sanity: need a mix of fragmented and compact cells, got $before")
    assert(Similarity.cellsNeedingCompaction(spark, path, threshold) == expected)
    val contentBefore = spark.read.parquet(path).select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.get(1).toString)).sorted.toSeq

    val compacted = Similarity.compactIvfIndex(spark, path, threshold)
    assert(compacted == expected, s"compacted $compacted, expected $expected")
    val after = cellFiles(path)
    for (c <- expected)
      assert(after(s"cell=$c").size == 1, s"cell=$c not compacted: ${after(s"cell=$c")}")
    for ((c, fs) <- before if !expected.contains(c.stripPrefix("cell=").toInt))
      assert(after(c) == fs, s"below-threshold $c was rewritten")
    val contentAfter = spark.read.parquet(path).select("vec_id", "cell").collect()
      .map(r => (r.getLong(0), r.get(1).toString)).sorted.toSeq
    assert(contentAfter == contentBefore, "threshold compaction changed index content")

    // second sweep: nothing crosses the threshold any more -> no-op
    assert(Similarity.compactIvfIndex(spark, path, threshold).isEmpty,
      "an already-compact index must not rewrite anything")
    assert(cellFiles(path) == after, "no-op sweep changed files")
  }

  test("appendToIvfPqIndex: codes-only rows match a same-codebooks re-encode of the batch") {
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq_append").toString
    val path = s"$tmp/idx"
    val base = e.filter(col("vec_id") % 4 =!= 3)
    val batch = e.filter(col("vec_id") % 4 === 3)
    val (cents, cbs) = Similarity.buildIvfPqIndex(
      base, "vec_id", "embedding", path, dim = 64, nCells = 8,
      trainIters = 3, m = 4, ksub = 8, pqIters = 2)
    Similarity.appendToIvfPqIndex(batch, "vec_id", "embedding", path, cents, cbs, subDim = 16)
    val appended = spark.read.parquet(path)
    assert(appended.count() == e.count(), "appended PQ index must cover base ∪ batch")
    // every batch row's stored codes equal a fresh frozen-codebook encode
    val expected = Similarity.pqEncode(
        batch.withColumn("cell",
          element_at(Similarity.nearestCells(col("embedding"), cents, 1), 1))
          .select(col("vec_id"), col("cell"), col("embedding")),
        "embedding", cbs, subDim = 16)
      .drop("embedding")
    val stored = appended.join(batch.select("vec_id"), Seq("vec_id"))
      .select(expected.columns.map(col): _*)
    assert(stored.exceptAll(expected).isEmpty && expected.exceptAll(stored).isEmpty,
      "stored batch codes differ from frozen-codebook re-encode")
  }
}
