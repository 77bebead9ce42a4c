package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.core.Snapshots

/** Multi-column (nested) partition layouts in the snapshot layer
  * (VERDICT r12 #6): leaf-grain replacement locality, ancestor-grain
  * drops, and batched constraint enforcement across nested dirs.
  */
class NestedPartitionSpec extends SparkTestBase {

  private def freshRoot(tag: String): String = {
    val root = s"${sys.props("java.io.tmpdir")}/graft_nested_${tag}_${System.nanoTime()}"
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new Path(root), true)
    root
  }

  private def base() = {
    import spark.implicits._
    (for (k1 <- Seq("a", "b"); k2 <- 0 to 1; i <- 1 to 5)
      yield (k1, k2, i.toLong, i * 10.0)).toDF("k1", "k2", "id", "v")
  }

  test("nested leaf replace: sibling partitions' files carry over byte-for-byte") {
    val root = freshRoot("leaf")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      base().write.partitionBy("k1", "k2").parquet(stage))
    val v1Files = Snapshots.manifestFiles(spark, root, v1)
    assert(v1Files.map(Snapshots.partitionOf).toSet ==
      Set("k1=a/k2=0", "k1=a/k2=1", "k1=b/k2=0", "k1=b/k2=1"))
    val mtimes = v1Files.map(f =>
      f -> fs.getFileStatus(new Path(s"$root/$f")).getModificationTime).toMap
    // replace exactly one leaf
    val v2 = Snapshots.publishPartitions(spark, root)(stage =>
      base().filter(col("k1") === "a" && col("k2") === 0)
        .withColumn("v", col("v") * 100)
        .write.partitionBy("k1", "k2").parquet(stage))
    val v2Files = Snapshots.manifestFiles(spark, root, v2)
    // the three sibling leaves carry their v1 entries VERBATIM, untouched
    val carried = v2Files.filter(f => Snapshots.partitionOf(f) != "k1=a/k2=0")
    assert(carried.toSet == v1Files.filterNot(f =>
      Snapshots.partitionOf(f) == "k1=a/k2=0").toSet)
    for (f <- carried)
      assert(fs.getFileStatus(new Path(s"$root/$f")).getModificationTime == mtimes(f),
        s"sibling file $f was rewritten by a leaf-grain replace")
    // v2 content: replaced leaf doubled x100, siblings intact; v1 pinned
    val v2Sum = Snapshots.readSnapshot(spark, root, Some(v2))
      .agg(sum("v")).collect()(0).getDouble(0)
    val v1Sum = Snapshots.readSnapshot(spark, root, Some(v1))
      .agg(sum("v")).collect()(0).getDouble(0)
    val leafSum = 150.0 // ids 1..5 * 10
    assert(v1Sum == 4 * leafSum)
    assert(v2Sum == 3 * leafSum + leafSum * 100)
  }

  test("corrupted sibling partition: a pruned read of the replaced leaf never opens it") {
    val root = freshRoot("corrupt")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      base().write.partitionBy("k1", "k2").parquet(stage))
    val v2 = Snapshots.publishPartitions(spark, root)(stage =>
      base().filter(col("k1") === "a" && col("k2") === 0)
        .withColumn("v", col("v") * 100)
        .write.partitionBy("k1", "k2").parquet(stage))
    // trash the LAST sibling leaf's data file on disk (path-order last, so
    // footer-based schema inference never samples it either)
    val victim = Snapshots.manifestFiles(spark, root, v2)
      .filter(f => Snapshots.partitionOf(f) == "k1=b/k2=1").max
    val out = fs.create(new Path(s"$root/$victim"), true)
    out.write("not a parquet file".getBytes("UTF-8")); out.close()
    // partition-pruned read of the replaced leaf: the corrupt sibling is
    // planned away before any footer IO — locality at read time
    val rows = Snapshots.readSnapshot(spark, root, Some(v2))
      .filter(col("k1") === "a" && col("k2") === 0)
      .agg(sum("v")).collect()
    assert(rows(0).getDouble(0) == 15000.0)
    // while the corrupted partition itself fails loudly
    intercept[Throwable] {
      Snapshots.readSnapshot(spark, root, Some(v2))
        .filter(col("k1") === "b" && col("k2") === 1).count()
    }
  }

  test("ancestor-grain drop removes every covered leaf, no data file moves") {
    val root = freshRoot("drop")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      base().write.partitionBy("k1", "k2").parquet(stage))
    val v1Files = Snapshots.manifestFiles(spark, root, v1)
    val v2 = Snapshots.publishPartitions(spark, root,
      dropPartitions = Seq("k1=b"))(_ => ())
    val v2Files = Snapshots.manifestFiles(spark, root, v2)
    assert(v2Files.map(Snapshots.partitionOf).toSet == Set("k1=a/k2=0", "k1=a/k2=1"))
    assert(v2Files.toSet == v1Files.filter(_.startsWith("k1=a/")).toSet)
    // dropped leaves' files still on disk (older versions stay readable)
    assert(Snapshots.readSnapshot(spark, root, Some(v1)).count() == 20)
    assert(Snapshots.readSnapshot(spark, root, Some(v2)).count() == 10)
  }

  test("constraints on a nested stage: one flag job, per-level partition values, quarantine") {
    val root = freshRoot("cons")
    Snapshots.publishPartitions(spark, root)(stage =>
      base().write.partitionBy("k1", "k2").parquet(stage))
    // constraint references BOTH partition levels and a data column —
    // the per-level dir-name values must attach for it to evaluate
    Snapshots.setConstraints(spark, root, Seq(
      "v_positive" -> "v > 0",
      "b1_bounded" -> "NOT (k1 = 'b' AND k2 = 1 AND id > 3)"))
    // count Spark jobs during the gated publish: the batched enforcement
    // (ADVICE r12) must not pay one job per staged dir
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    val v2 = try {
      val v = Snapshots.publishPartitions(spark, root)(stage =>
        base().withColumn("v", when(col("id") === 5, -1.0).otherwise(col("v")))
          .write.partitionBy("k1", "k2").parquet(stage))
      Thread.sleep(500) // let queued listener events drain
      v
    } finally spark.sparkContext.removeSparkListener(listener)
    // staged 4 leaf dirs; enforcement flags+counts in ONE job, then only
    // the violating dirs pay rewrites. Generous bound: the whole gated
    // publish (stage write + enforce + quarantine + rewrites + footer
    // reads) stays far under the old 2-jobs-per-dir floor.
    assert(jobs.get() <= 14, s"gated nested publish ran ${jobs.get()} jobs")
    val meta = Snapshots.manifestMeta(spark, root, v2)
    // id=5 violates v_positive in all 4 leaves; (b,1,id=4..5) violates
    // b1_bounded -> quarantined rows: 4*1 + 1 extra (b/1 id=4) = 5... id=5
    // in b/1 violates BOTH (one row, both names recorded)
    assert(meta("constraint_quarantined").toLong == 5)
    val quar = spark.read.parquet(
      s"$root/_quarantine/${meta("constraint_quarantine_dir")}")
    assert(quar.count() == 5)
    // partition values survived per level, verbatim
    assert(quar.filter(col("k1") === "b" && col("k2") === "1").count() == 2)
    assert(quar.filter(col("violated").contains("b1_bounded")).count() == 2)
    assert(quar.filter(col("violated").contains("v_positive")).count() == 4)
    // committed rows: 20 - 5
    assert(Snapshots.readSnapshot(spark, root, Some(v2)).count() == 15)
  }

  test("constraints gate hive-ESCAPED partition dirs (no silent join-miss bypass)") {
    import spark.implicits._
    val root = freshRoot("consesc")
    // ':' in the partition value -> dir 'k=a%3A1'; the runtime's file_path
    // column may re-quote the '%' — a join miss here would let violating
    // rows COMMIT ungated (the bypass the variant map + null check close)
    val df = Seq(("a:1", 1L, 5.0), ("a:1", 2L, -1.0), ("b", 3L, 7.0))
      .toDF("k", "id", "v")
    Snapshots.publishPartitions(spark, root)(stage =>
      df.filter(col("id") === 3).write.partitionBy("k").parquet(stage))
    Snapshots.setConstraints(spark, root, Seq("v_pos" -> "v > 0"))
    val v2 = Snapshots.publishPartitions(spark, root)(stage =>
      df.filter(col("k") === "a:1").write.partitionBy("k").parquet(stage))
    val meta = Snapshots.manifestMeta(spark, root, v2)
    assert(meta("constraint_quarantined").toLong == 1,
      s"escaped-dir violation must quarantine, got $meta")
    val got = Snapshots.readSnapshot(spark, root, Some(v2))
    assert(got.count() == 2) // id=2 quarantined, id=1 + carried id=3 committed
    assert(got.filter(col("k") === "a:1").count() == 1)
  }

  test("optimize on a nested layout: only the fragmented leaf rewrites") {
    val root = freshRoot("opt")
    // fragment ONE leaf into 4 files; every other leaf lands as 1
    val frag = base().filter(col("k1") === "a" && col("k2") === 0).repartition(4)
    val rest = base().filter(!(col("k1") === "a" && col("k2") === 0)).coalesce(1)
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      frag.unionByName(rest).write.partitionBy("k1", "k2").parquet(stage))
    val before = Snapshots.manifestFiles(spark, root, v1)
    val fragBefore = before.filter(f => Snapshots.partitionOf(f) == "k1=a/k2=0")
    assert(fragBefore.size >= 3, s"fixture should fragment: $fragBefore")
    val v2 = graft.core.SnapshotOps.optimize(spark, root, minWaste = 1)
    assert(v2.isDefined)
    val after = Snapshots.manifestFiles(spark, root, v2.get)
    // compacted leaf: one file; every sibling leaf carried verbatim
    assert(after.count(f => Snapshots.partitionOf(f) == "k1=a/k2=0") == 1)
    assert(after.filterNot(f => Snapshots.partitionOf(f) == "k1=a/k2=0").toSet ==
      before.filterNot(f => Snapshots.partitionOf(f) == "k1=a/k2=0").toSet)
    // content identical
    assert(Snapshots.readSnapshot(spark, root, Some(v2.get))
      .agg(sum("v")).collect()(0).getDouble(0) ==
      base().agg(sum("v")).collect()(0).getDouble(0))
  }

  test("merge on a nested layout: keyed upsert + leaf-emptying delete") {
    import spark.implicits._
    val root = freshRoot("merge")
    Snapshots.publishPartitions(spark, root)(stage =>
      base().coalesce(1).write.partitionBy("k1", "k2").parquet(stage))
    // delete EVERY row of leaf b/1, update one row of a/0, insert into a/1
    val src = (
      (1 to 5).map(i => ("b", 1, i.toLong, 0.0, "delete")) ++
      Seq(("a", 0, 1L, 999.0, "upsert"), ("a", 1, 77L, 7.0, "upsert"))
    ).toDF("k1", "k2", "id", "v", "op")
    val v2 = graft.core.SnapshotOps.merge(spark, root, src,
      keyCols = Seq("k1", "k2", "id"), partitionCol = "k1")
    val got = Snapshots.readSnapshot(spark, root, Some(v2))
    assert(got.count() == 20 - 5 + 1) // 5 deleted, 1 inserted
    // the emptied LEAF left the manifest; its sibling under the same k1 stayed
    val parts = Snapshots.manifestFiles(spark, root, v2)
      .map(Snapshots.partitionOf).toSet
    assert(!parts.contains("k1=b/k2=1"), s"emptied leaf still present: $parts")
    assert(parts.contains("k1=b/k2=0"))
    assert(got.filter(col("id") === 1 && col("k1") === "a" && col("k2") === 0)
      .select("v").collect()(0).getDouble(0) == 999.0)
    assert(got.filter(col("id") === 77).count() == 1)
  }

  test("DV purge on a nested layout rewrites only the DV'd files") {
    val root = freshRoot("purge")
    Snapshots.publishPartitions(spark, root)(stage =>
      base().coalesce(1).write.partitionBy("k1", "k2").parquet(stage))
    // deleteWhere empties leaf a/1 entirely and nicks one row of b/0
    val v2 = graft.core.SnapshotOps.deleteWhere(spark, root,
      (col("k1") === "a" && col("k2") === 1) ||
        (col("k1") === "b" && col("k2") === 0 && col("id") === 1))
    assert(Snapshots.readSnapshot(spark, root, Some(v2)).count() == 14)
    val before = Snapshots.manifestFiles(spark, root, v2)
    val v3 = graft.core.SnapshotOps.purgeDeletes(spark, root)
    assert(v3.isDefined)
    val after = Snapshots.manifestFiles(spark, root, v3.get)
    val parts = after.map(Snapshots.partitionOf).toSet
    assert(!parts.contains("k1=a/k2=1"), "fully-deleted leaf must drop")
    // untouched leaves carry their exact files
    for (p <- Seq("k1=a/k2=0", "k1=b/k2=1"))
      assert(after.filter(f => Snapshots.partitionOf(f) == p).toSet ==
        before.filter(f => Snapshots.partitionOf(f) == p).toSet, p)
    assert(Snapshots.readSnapshot(spark, root, Some(v3.get)).count() == 14)
    assert(Snapshots.fileDvs(spark, root, v3.get).isEmpty)
  }
}
