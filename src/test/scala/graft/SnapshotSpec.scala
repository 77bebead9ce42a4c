package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.core.Snapshots
import graft.operators.Similarity

/** Contracts of the manifest-commit snapshot layer (core.Snapshots) and
  * its composition with the IVF index lifecycle: pinned readers are
  * isolated from in-flight publishes, vacuum bounds history, and the
  * compaction lock closes the append/compact race (ADVICE r10 #2).
  */
class SnapshotSpec extends SparkTestBase {
  import spark.implicits._

  private def fs(root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/tbl"

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long)] =
    df.select(col("part"), col("id"), col("v")).as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  private def fixture(parts: (String, Int)*): org.apache.spark.sql.DataFrame =
    parts.flatMap { case (p, mult) =>
      (0 until 10).map(i => (p, i.toLong, i.toLong * mult))
    }.toDF("part", "id", "v")

  test("pinned reader stays byte-stable while the next version publishes") {
    val root = freshRoot("snap_race")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 1).write.partitionBy("part").parquet(stage))
    val pinned = rowsOf(Snapshots.readSnapshot(spark, root, Some(v1)))
    val v1Files = Snapshots.manifestFiles(spark, root, v1)

    // version 2 replaces ONLY partition b with rewritten rows
    val v2 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("b" -> 100).write.partitionBy("part").parquet(stage))
    assert(v2 == v1 + 1)

    // the pinned version re-reads identically AND its files still exist
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(v1))) == pinned,
      "a reader holding version 1 must see pre-publish rows after v2 lands")
    assert(v1Files.forall(f => fs(root).exists(new Path(s"$root/$f"))),
      "publish must never delete a pinned version's files")

    // latest = replaced b + carried-over a
    val latest = rowsOf(Snapshots.readSnapshot(spark, root))
    assert(latest.filter(_._1 == "a") == pinned.filter(_._1 == "a"))
    assert(latest.filter(_._1 == "b") == fixture("b" -> 100)
      .as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq)
  }

  test("legacy plain table bootstraps: first publish snapshots existing files") {
    val root = freshRoot("snap_boot")
    // a pre-snapshot table written the plain way
    fixture("a" -> 1, "b" -> 1).write.partitionBy("part").parquet(root)
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("b" -> 7).write.partitionBy("part").parquet(stage))
    val got = rowsOf(Snapshots.readSnapshot(spark, root, Some(v1)))
    val want = rowsOf(fixture("a" -> 1, "b" -> 7))
    assert(got == want, "bootstrap manifest must carry legacy files of untouched partitions")
  }

  test("vacuum keeps the latest versions and reclaims superseded files") {
    val root = freshRoot("snap_vac")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 1).write.partitionBy("part").parquet(stage))
    val v2 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("b" -> 100).write.partitionBy("part").parquet(stage))
    val before = rowsOf(Snapshots.readSnapshot(spark, root, Some(v2)))
    val removed = Snapshots.vacuum(spark, root, keepVersions = 1)
    assert(removed.nonEmpty, "v1's superseded b-files must be reclaimed")
    assert(removed.forall(_.startsWith("part=b/")),
      s"only the replaced partition's old files are garbage, got $removed")
    // latest version is untouched, and the plain root read now equals it
    // (no superseded duplicates left on disk)
    assert(rowsOf(Snapshots.readSnapshot(spark, root)) == before)
    assert(rowsOf(spark.read.parquet(root)) == before,
      "after vacuum(keep=1) a plain reader sees exactly the current version")
    intercept[IllegalArgumentException](Snapshots.manifestFiles(spark, root, v2 - 1))
  }

  test("compaction lock: appends refuse while held; compact releases it") {
    val e = core.Tables.embeddings(spark, sfDir)
    val root = freshRoot("snap_lock") + "/idx"
    val cents = Similarity.buildIvfIndex(e, "vec_id", "embedding", root, nCells = 4)
    val batch = e.limit(5).withColumn("vec_id", col("vec_id") + 10000)

    // simulate a compactor holding the lock
    fs(root).createNewFile(new Path(s"$root/_compaction_lock"))
    val err = intercept[IllegalArgumentException](
      Similarity.appendToIvfIndexIdempotent(batch, "vec_id", "embedding", root, cents, 1L))
    assert(err.getMessage.contains("_compaction_lock"))
    Similarity.clearCompactionLock(spark, root)

    // append now lands, and a real compaction acquires + releases cleanly
    Similarity.appendToIvfIndexIdempotent(batch, "vec_id", "embedding", root, cents, 1L)
    Similarity.compactIvfCells(spark, root, Seq(0, 1, 2, 3))
    assert(!fs(root).exists(new Path(s"$root/_compaction_lock")),
      "compactIvfCells must release the lock")
    // and a held lock blocks a second compactor
    fs(root).createNewFile(new Path(s"$root/_compaction_lock"))
    intercept[IllegalArgumentException](Similarity.compactIvfCells(spark, root, Seq(0)))
    Similarity.clearCompactionLock(spark, root)
  }

  test("snapshot mode: probes dedupe pre-vacuum, appends commit additively, plain compact refuses") {
    val e = core.Tables.embeddings(spark, sfDir)
    val root = freshRoot("snap_mode") + "/idx"
    val cents = Similarity.buildIvfIndex(e, "vec_id", "embedding", root, nCells = 4)
    val b1 = e.limit(4).withColumn("vec_id", col("vec_id") + 1000)
    Similarity.appendToIvfIndexIdempotent(b1, "vec_id", "embedding", root, cents, 1L)
    val expected1 = (spark.read.parquet(root).select("vec_id").as[Long].collect()).sorted.toSeq

    // compaction publishes v1 — the superseded generation stays on disk,
    // but the SNAPSHOT-AWARE probe must see exactly-once rows pre-vacuum
    Similarity.compactIvfCellsSnapshot(spark, root, Seq(0, 1, 2, 3))
    val qvec = e.limit(1).select("embedding").collect()(0)
      .getSeq[Number](0).map(_.doubleValue()).toSeq
    def probeAll() = Similarity.probeIvfIndex(spark, root, "vec_id", "embedding",
        qvec, queryId = -1L, k = 100000, cents, nProbe = 4)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(probeAll() == expected1,
      "a probe on a snapshot-managed index must not double-count the superseded generation")

    // an idempotent append on the snapshot-managed index commits an
    // additive manifest version — snapshot readers see the batch at once
    val vBefore = Snapshots.latestVersion(spark, root).get
    val b2 = e.limit(3).withColumn("vec_id", col("vec_id") + 2000)
    Similarity.appendToIvfIndexIdempotent(b2, "vec_id", "embedding", root, cents, 2L)
    assert(Snapshots.latestVersion(spark, root).get == vBefore + 1)
    val expected2 = (expected1 ++ b2.select("vec_id").as[Long].collect()).sorted
    assert(probeAll() == expected2.toSeq,
      "snapshot readers must see appended rows through the additive manifest")
    // replaying the same batch must not add a duplicate version or rows
    Similarity.appendToIvfIndexIdempotent(b2, "vec_id", "embedding", root, cents, 2L)
    assert(Snapshots.latestVersion(spark, root).get == vBefore + 1)
    assert(probeAll() == expected2.toSeq)

    // the in-place dynamic overwrite would delete manifest-referenced
    // files under pinned readers — it must refuse on a managed index
    val err = intercept[IllegalArgumentException](
      Similarity.compactIvfCells(spark, root, Seq(0)))
    assert(err.getMessage.contains("compactIvfCellsSnapshot"))
  }

  test("snapshot compaction: rows preserved, files drop, pinned reader unharmed") {
    val e = core.Tables.embeddings(spark, sfDir)
    val root = freshRoot("snap_comp") + "/idx"
    val cents = Similarity.buildIvfIndex(e, "vec_id", "embedding", root, nCells = 4)
    for (b <- 1 to 3)
      Similarity.appendToIvfIndexIdempotent(
        e.limit(4).withColumn("vec_id", col("vec_id") + b * 1000),
        "vec_id", "embedding", root, cents, b.toLong)
    val before = spark.read.parquet(root)
      .select("vec_id").as[Long].collect().sorted.toSeq
    def cellFiles(c: Int) = fs(root).listStatus(new Path(s"$root/cell=$c"))
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val filesBefore = (0 until 4).map(cellFiles).sum

    val v = Similarity.compactIvfCellsSnapshot(spark, root, Seq(0, 1, 2, 3))
    val snap = Snapshots.readSnapshot(spark, root, Some(v))
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(snap == before, "snapshot compaction must preserve every row exactly once")

    // the superseded generation still exists for plain/pinned readers
    // until vacuum; vacuum(keep=1) then restores plain-read equivalence
    // with fewer files
    Snapshots.vacuum(spark, root, keepVersions = 1)
    val plain = spark.read.parquet(root)
      .select("vec_id").as[Long].collect().sorted.toSeq
    assert(plain == before)
    val filesAfter = (0 until 4).map(cellFiles).sum
    assert(filesAfter < filesBefore,
      s"compaction must shrink the file count ($filesBefore -> $filesAfter)")
  }
}
