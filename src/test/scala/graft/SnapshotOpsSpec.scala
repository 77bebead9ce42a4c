package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.core.{SnapshotOps, Snapshots}
import graft.core.SnapshotOps.Expect

/** Contracts of the table-maintenance verbs over the manifest layer:
  * OPTIMIZE bin-packs without changing content, MERGE applies
  * insert/update/delete atomically touching only affected partitions,
  * publishExpect quarantines instead of poisoning, and bloom sidecars
  * skip files on point lookups without ever changing results.
  */
class SnapshotOpsSpec extends SparkTestBase {
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
      (0 until 40).map(i => (p, i.toLong, i.toLong * mult))
    }.toDF("part", "id", "v")

  private def filesPerPart(root: String, v: Long): Map[String, Int] =
    Snapshots.manifestFiles(spark, root, v)
      .groupBy(_.takeWhile(_ != '/')).view.mapValues(_.size).toMap

  test("optimize bin-packs fragmented partitions, preserves content and old pins") {
    val root = freshRoot("snap_opt")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 2).repartition(12)
        .write.partitionBy("part").parquet(stage))
    val before = rowsOf(Snapshots.readSnapshot(spark, root))
    assert(filesPerPart(root, v1).values.forall(_ > 4), "fixture must be fragmented")

    val v2 = SnapshotOps.optimize(spark, root, targetFileBytes = 1L << 30)
      .getOrElse(fail("fragmented table must optimize"))
    assert(filesPerPart(root, v2).values.forall(_ == 1),
      "everything fits one target bin -> one file per partition")
    assert(rowsOf(Snapshots.readSnapshot(spark, root)) == before,
      "optimize must be content-preserving")
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(v1))) == before,
      "the pre-optimize pin must stay readable")
    // idle tick: already packed -> no commit at all
    assert(SnapshotOps.optimize(spark, root, targetFileBytes = 1L << 30).isEmpty)
    assert(Snapshots.latestVersion(spark, root).contains(v2))
  }

  test("optimize splits an oversized partition across multiple bins") {
    val root = freshRoot("snap_opt_bins")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1).repartition(10).write.partitionBy("part").parquet(stage))
    val before = rowsOf(Snapshots.readSnapshot(spark, root))
    val bytes = Snapshots.manifestFiles(spark, root, 1L)
      .map(f => fs(root).getFileStatus(new Path(s"$root/$f")).getLen).sum
    // target ~ a third of the partition -> 3-4 bins, still < 10 files
    val v2 = SnapshotOps.optimize(spark, root, targetFileBytes = bytes / 3, minWaste = 2)
      .getOrElse(fail("10 files vs ~4 bins must qualify"))
    val n = filesPerPart(root, v2)("part=a")
    assert(n > 1 && n <= 4, s"bin-packed file count out of range: $n")
    assert(rowsOf(Snapshots.readSnapshot(spark, root)) == before)
  }

  test("merge applies insert/update/delete atomically, carries untouched partitions") {
    val root = freshRoot("snap_merge")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 1, "c" -> 1).write.partitionBy("part").parquet(stage))
    // source: update a/id0 (value bump), delete every b row, insert d/id99
    val source = Seq(
      ("a", 0L, 777L, "upsert"),
      ("d", 99L, 1L, "upsert")
    ).toDF("part", "id", "v", "op")
      .unionByName((0 until 40).map(i => ("b", i.toLong, 0L, "delete"))
        .toDF("part", "id", "v", "op"))
    val v2 = SnapshotOps.merge(spark, root, source, Seq("id", "part"), "part")

    val after = rowsOf(Snapshots.readSnapshot(spark, root))
    val expected = (rowsOf(fixture("a" -> 1, "c" -> 1))
      .filterNot(r => r._1 == "a" && r._2 == 0L) ++
      Seq(("a", 0L, 777L), ("d", 99L, 1L))).sortBy(r => (r._1, r._2))
    assert(after == expected)
    // the emptied partition left the manifest; untouched c carried its files
    val partsNow = Snapshots.manifestFiles(spark, root, v2).map(_.takeWhile(_ != '/')).toSet
    assert(!partsNow.contains("part=b"), "a fully-deleted partition must drop")
    val cFiles = (v: Long) => Snapshots.manifestFiles(spark, root, v)
      .filter(_.startsWith("part=c/")).toSet
    assert(cFiles(v2) == cFiles(v1), "untouched partition must carry over, not rewrite")
    // the pre-merge pin still shows partition b
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(v1)))
      .count(_._1 == "b") == 40)
  }

  test("merge with a bloom-indexed key never opens unaffected partitions' data") {
    val root = freshRoot("snap_merge_bloom")
    // keys clustered per partition (bloom-selective); partition "zz"
    // sorts LAST so the snapshot read's schema-inference footer never
    // lands on it (the corruption below must only prove merge planned
    // around it, not break unrelated footer sampling)
    val rows = (0L until 40L).map(i => ("p1", i, i)) ++
      (100L until 140L).map(i => ("p2", i, i)) ++
      (200L until 240L).map(i => ("zz", i, i))
    val v1 = Snapshots.publishPartitions(spark, root, bloomCols = Seq("id"))(stage =>
      rows.toDF("part", "id", "v").write.partitionBy("part").parquet(stage))
    // corrupt partition zz's data file ON DISK: any attempt to read it
    // from here on throws — a passing merge is PROOF the probe went
    // through the bloom sidecar and the rewrite planned only p1/p2
    val zzFile = Snapshots.manifestFiles(spark, root, v1)
      .find(_.startsWith("part=zz/")).get
    val out = fs(root).create(new Path(s"$root/$zzFile"), true)
    out.write("not a parquet file".getBytes("UTF-8")); out.close()
    val source = Seq(
      ("p1", 0L, 777L, "upsert"),   // update inside p1
      ("p2", 555L, 1L, "upsert")    // insert into p2
    ).toDF("part", "id", "v", "op")
    val v2 = SnapshotOps.merge(spark, root, source, Seq("id"), "part")
    // content correct on the readable partitions; zz carried over unread
    val got = Snapshots.readSnapshot(spark, root, Some(v2))
      .filter(col("part") =!= "zz")
      .select(col("part"), col("id"), col("v")).as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val expected = (Seq(("p1", 0L, 777L), ("p2", 555L, 1L)) ++
      (1L until 40L).map(i => ("p1", i, i)) ++
      (100L until 140L).map(i => ("p2", i, i))).sortBy(r => (r._1, r._2))
    assert(got == expected)
    assert(Snapshots.manifestFiles(spark, root, v2).contains(zzFile),
      "untouched partition must carry over by manifest reference")
    // the rewrite re-indexed its fresh files: the sidecar has markers for
    // every v2 file outside zz, so point reads keep pruning after merges
    val fresh = Snapshots.manifestFiles(spark, root, v2).filterNot(_ == zzFile).toSet
    val markers = Snapshots.fileBlooms(spark, root, v2).get
      .filter(col("word_idx") === -1L && col("col") === "id")
      .select("file").as[String].collect().toSet
    assert(fresh.subsetOf(markers), "merged partitions' fresh files must re-index")
    // false-negative check: a delete of a zz-resident key MUST plan zz
    // (and therefore crash on the corrupted bytes) — the bloom probe may
    // over-approximate but never under-approximate
    intercept[Exception] {
      SnapshotOps.merge(spark, root,
        Seq(("zz", 200L, 0L, "delete")).toDF("part", "id", "v", "op"), Seq("id"), "part")
    }
  }

  test("merge and optimize survive hive-escaped partition values; empty-table refusal") {
    val root = freshRoot("snap_escape")
    // 'a:1' escapes to 'a%3A1' on disk — raw-vs-escaped comparisons
    // anywhere in merge/optimize would lose the partition or no-op
    val rows = (0L until 20L).map(i => ("a:1", i, i)) ++
      (100L until 120L).map(i => ("b 2", i, i))
    Snapshots.publishPartitions(spark, root)(stage =>
      rows.toDF("part", "id", "v").repartition(4)
        .write.partitionBy("part").parquet(stage))
    // delete every 'a:1' row — the ESCAPED dir must drop from the manifest
    SnapshotOps.merge(spark, root,
      (0L until 20L).map(i => ("a:1", i, i, "delete")).toDF("part", "id", "v", "op"),
      Seq("id"), "part")
    val v2 = Snapshots.latestVersion(spark, root).get
    assert(rowsOf(Snapshots.readSnapshot(spark, root)) ==
      (100L until 120L).map(i => ("b 2", i, i)).sortBy(r => (r._1, r._2)))
    assert(!Snapshots.manifestFiles(spark, root, v2).exists(_.contains("a%3A1")),
      "fully-deleted escaped partition must leave the manifest")
    // optimize must compact the remaining escaped-value partition
    val v3 = SnapshotOps.optimize(spark, root, targetFileBytes = 512L << 20,
      minWaste = 1).getOrElse(fail("optimize found nothing to compact"))
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(v3))) ==
      (100L until 120L).map(i => ("b 2", i, i)).sortBy(r => (r._1, r._2)))
    assert(filesPerPart(root, v3).values.sum == 1,
      "escaped partition did not compact (raw-vs-escaped join mismatch)")
    // a delete-EVERYTHING batch refuses loudly instead of committing an
    // unreadable zero-file version; the table stays at the old version
    val err = intercept[IllegalArgumentException] {
      SnapshotOps.merge(spark, root,
        (100L until 120L).map(i => ("b 2", i, i, "delete")).toDF("part", "id", "v", "op"),
        Seq("id"), "part")
    }
    assert(err.getMessage.contains("EMPTY file set"))
    assert(rowsOf(Snapshots.readSnapshot(spark, root)).size == 20,
      "refused merge must leave the table readable at the previous version")
  }

  test("merge and optimize handle NULL partition values (reserved hive dir)") {
    val root = freshRoot("snap_null_part")
    val rows: Seq[(Option[String], Long, Long)] = Seq(
      (Some("a"), 1L, 1L), (Some("a"), 2L, 2L),
      (None, 3L, 3L), (None, 4L, 4L))
    Snapshots.publishPartitions(spark, root)(stage =>
      rows.toDF("part", "id", "v").repartition(4)
        .write.partitionBy("part").parquet(stage))
    // update inside the null partition, delete from it, insert into it
    val src: Seq[(Option[String], Long, Long, String)] = Seq(
      (None, 3L, 333L, "upsert"), (None, 4L, 0L, "delete"), (None, 5L, 5L, "upsert"))
    SnapshotOps.merge(spark, root, src.toDF("part", "id", "v", "op"),
      Seq("id"), "part")
    val got = Snapshots.readSnapshot(spark, root)
      .select(col("part"), col("id"), col("v"))
      .as[(Option[String], Long, Long)].collect().sortBy(_._2).toSeq
    assert(got == Seq((Some("a"), 1L, 1L), (Some("a"), 2L, 2L),
      (None, 3L, 333L), (None, 5L, 5L)), got.toString)
    // the fragmented null partition must compact, not be silently skipped
    val v = SnapshotOps.optimize(spark, root, targetFileBytes = 512L << 20,
      minWaste = 1).getOrElse(fail("optimize found nothing to compact"))
    assert(Snapshots.readSnapshot(spark, root, Some(v))
      .select(col("part"), col("id"), col("v"))
      .as[(Option[String], Long, Long)].collect().sortBy(_._2).toSeq == got)
    assert(filesPerPart(root, v).values.forall(_ == 1),
      s"null partition did not compact: ${filesPerPart(root, v)}")
  }

  test("merge detects an interleaved commit instead of losing its update") {
    val root = freshRoot("snap_occ")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 1).write.partitionBy("part").parquet(stage))
    // simulate the race: a publish computed against version 1 tries to
    // commit AFTER another writer landed version 2 on the same partition
    Snapshots.publishPartitions(spark, root)(stage =>
      Seq(("a", 500L, 500L)).toDF("part", "id", "v")
        .write.partitionBy("part").parquet(stage))
    val err = intercept[java.util.ConcurrentModificationException] {
      Snapshots.publishPartitions(spark, root, expectedPrev = Some(1L))(stage =>
        Seq(("a", 0L, 999L)).toDF("part", "id", "v")
          .write.partitionBy("part").parquet(stage))
    }
    assert(err.getMessage.contains("already claimed") && err.getMessage.contains("retry"))
    // the interleaved writer's content survived untouched
    assert(rowsOf(Snapshots.readSnapshot(spark, root)).contains(("a", 500L, 500L)))
    // a merge whose base IS the latest commits fine (the happy path
    // carries expectedPrev through)
    SnapshotOps.merge(spark, root,
      Seq(("b", 0L, 777L, "upsert")).toDF("part", "id", "v", "op"), Seq("id", "part"), "part")
    assert(rowsOf(Snapshots.readSnapshot(spark, root)).contains(("b", 0L, 777L)))
  }

  test("optimize keeps stat and bloom coverage by default") {
    val root = freshRoot("snap_opt_cover")
    val rows = (0L until 40L).map(i => ("a", i, i)) ++
      (100L until 140L).map(i => ("b", i, i))
    Snapshots.publishPartitions(spark, root,
      statsCols = Seq("v"), bloomCols = Seq("id"))(stage =>
      rows.toDF("part", "id", "v").repartition(6)
        .write.partitionBy("part").parquet(stage))
    val v2 = SnapshotOps.optimize(spark, root, targetFileBytes = 512L << 20)
      .getOrElse(fail("optimize found nothing to compact"))
    // (entries here are plain tables — manifest lines ARE the rel suffixes)
    val files = Snapshots.manifestFiles(spark, root, v2).toSet
    val statFiles = Snapshots.fileStats(spark, root, v2).map(_._1).toSet
    assert(files.subsetOf(statFiles),
      s"optimize dropped stat coverage: ${files -- statFiles}")
    val markers = Snapshots.fileBlooms(spark, root, v2).get
      .filter(col("word_idx") === -1L && col("col") === "id")
      .select("file").as[String].collect().toSet
    assert(files.subsetOf(markers),
      s"optimize dropped bloom coverage: ${files -- markers}")
    // and the coverage actually bites: a point read plans one file
    assert(Snapshots.readSnapshotEquals(spark, root, "id", lit(5L))
      .inputFiles.length == 1)
  }

  test("optimizeZorder: content preserved, range reads prune on BOTH columns") {
    val root = freshRoot("snap_zorder")
    import spark.implicits._
    // a and b are independent; a hash-scattered write gives every file
    // the full range of both, so nothing can prune before the rewrite
    val rows = (0L until 4000L).map(i => ("p" + (i % 2), i % 1000, (i * 7919) % 1000, i))
    Snapshots.publishPartitions(spark, root, statsCols = Seq("a", "b"))(stage =>
      rows.toDF("part", "a", "b", "v").repartition(8)
        .write.partitionBy("part").parquet(stage))
    val v1 = Snapshots.latestVersion(spark, root).get
    val allFiles = Snapshots.manifestFiles(spark, root, v1).size
    assert(allFiles >= 8)
    assert(Snapshots.readSnapshotRange(spark, root, "a", 0, 60).inputFiles.length
      == allFiles, "scattered layout should not prune (fixture sanity)")
    val v2 = SnapshotOps.optimizeZorder(spark, root, ("a", "b"),
      targetFileBytes = 16L << 10)
    // content identical
    val got = Snapshots.readSnapshot(spark, root, Some(v2))
      .select("part", "a", "b", "v").as[(String, Long, Long, Long)]
      .collect().sortBy(_._4).toSeq
    assert(got == rows.sortBy(_._4))
    val nowFiles = Snapshots.manifestFiles(spark, root, v2).size
    assert(nowFiles >= 4, s"need several files for pruning to mean anything: $nowFiles")
    // narrow range predicates on EITHER column now plan a strict subset
    val keepA = Snapshots.readSnapshotRange(spark, root, "a", 0, 60).inputFiles.length
    val keepB = Snapshots.readSnapshotRange(spark, root, "b", 0, 60).inputFiles.length
    assert(keepA < nowFiles, s"a-range read planned all $nowFiles files")
    assert(keepB < nowFiles, s"b-range read planned all $nowFiles files")
    // and the rows are exact regardless of pruning
    assert(Snapshots.readSnapshotRange(spark, root, "a", 0, 60).count()
      == rows.count(_._2 <= 60))
    assert(Snapshots.readSnapshotRange(spark, root, "b", 0, 60).count()
      == rows.count(_._3 <= 60))
  }

  test("cloneTable: zero-copy, pinned against source churn, copy-on-write, safe vacuum") {
    val src = freshRoot("snap_clone_src")
    val dst = freshRoot("snap_clone_dst")
    val rows = (0L until 40L).map(i => ("a", i, i)) ++
      (100L until 140L).map(i => ("b", i, i))
    Snapshots.publishPartitions(spark, src,
      statsCols = Seq("v"), bloomCols = Seq("id"))(stage =>
      rows.toDF("part", "id", "v").write.partitionBy("part").parquet(stage))
    Snapshots.cloneTable(spark, src, dst)
    def content(root: String) = rowsOf(Snapshots.readSnapshot(spark, root))
    assert(content(dst) == content(src), "clone must read the source content")
    // ZERO data files under the clone root — manifest-only
    val dataDirs = fs(dst).listStatus(new Path(dst))
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
    assert(dataDirs.isEmpty, "clone must not copy data files")
    // the copied bloom sidecar prunes point reads on the clone from birth
    val probe = Snapshots.readSnapshotEquals(spark, dst, "id", lit(5L))
    assert(probe.count() == 1)
    assert(probe.inputFiles.length == 1,
      "clone point read should prune to the one candidate source file")
    // the clone is PINNED: source churn after the clone is invisible
    Snapshots.publishPartitions(spark, src)(stage =>
      Seq(("b", 999L, 9L)).toDF("part", "id", "v")
        .write.partitionBy("part").parquet(stage))
    assert(content(dst) == rowsOf(rows.toDF("part", "id", "v")),
      "source publish leaked into the clone")
    // copy-on-write: replacing partition a ON THE CLONE stages local
    // files; partition b keeps reading the source's immutable files
    Snapshots.publishPartitions(spark, dst)(stage =>
      Seq(("a", 500L, 1L)).toDF("part", "id", "v")
        .write.partitionBy("part").parquet(stage))
    val expected = (Seq(("a", 500L, 1L)) ++ (100L until 140L).map(i => ("b", i, i)))
      .sortBy(r => (r._1, r._2))
    assert(content(dst) == expected)
    val lines = Snapshots.manifestFiles(spark, dst,
      Snapshots.latestVersion(spark, dst).get)
    assert(lines.exists(_.startsWith("part=a/")), "rewritten partition must be local")
    assert(lines.filter(f => f.startsWith("/") || f.contains("://"))
      .forall(f => f.contains("part=b")), "untouched partition must stay by reference")
    // the clone's vacuum deletes only under its own root — the source
    // table (including the clone-referenced b files) stays intact
    Snapshots.vacuum(spark, dst, keepVersions = 1, graceMs = 0)
    assert(content(dst) == expected, "clone vacuum broke the clone")
    val srcNow = rowsOf(Snapshots.readSnapshot(spark, src))
    assert(srcNow.contains(("b", 999L, 9L)) && srcNow.count(_._1 == "a") == 40,
      "clone activity must never touch the source")
  }

  test("publishExpect quarantines violations and duplicate keys, commits the clean rows") {
    val root = freshRoot("snap_expect")
    val df = Seq(
      ("a", 1L, 10L),   // clean
      ("a", 2L, -5L),   // violates nonneg
      ("a", 3L, 10L),   // clean
      ("b", 4L, 20L),   // dup key with next -> both quarantined
      ("b", 4L, 21L),
      ("b", 5L, -1L)    // violates nonneg (its key stays unique among clean)
    ).toDF("part", "id", "v")
    val (v, nQuar) = SnapshotOps.publishExpect(spark, root, df, "part",
      expectations = Seq(Expect("nonneg", col("v") >= 0)),
      uniqueKey = Seq("id"))
    assert(nQuar == 4L)
    assert(rowsOf(Snapshots.readSnapshot(spark, root)) ==
      Seq(("a", 1L, 10L), ("a", 3L, 10L)))
    val meta = Snapshots.manifestMeta(spark, root, v)
    assert(meta("expect_total") == "6" && meta("expect_clean") == "2" &&
      meta("expect_quarantined") == "4")
    // vacuum reaps a crash-orphaned quarantine dir (written, commit never
    // landed) but keeps the committed version's referenced one
    fs(root).mkdirs(new Path(s"$root/_quarantine/q-orphan"))
    Snapshots.vacuum(spark, root, keepVersions = 1, graceMs = 0)
    assert(!fs(root).exists(new Path(s"$root/_quarantine/q-orphan")),
      "orphaned quarantine dir must be vacuumed")
    val quar = SnapshotOps.readQuarantine(spark, root, v).get
      .select("id", "violated").as[(Long, String)].collect().sortBy(identity).toMap
    assert(quar == Map(2L -> "nonneg", 4L -> "unique_key", 5L -> "nonneg"))
    // an all-violating batch refuses rather than committing emptiness
    intercept[IllegalArgumentException] {
      SnapshotOps.publishExpect(spark, root,
        Seq(("a", 9L, -9L)).toDF("part", "id", "v"), "part",
        expectations = Seq(Expect("nonneg", col("v") >= 0)))
    }
  }

  test("bloom sidecar skips files on point lookups, never changes results") {
    val root = freshRoot("snap_bloom")
    // key-clustered: 8 files, ids 0..399 in disjoint ranges per file
    val df = (0 until 400).map(i => ("a", i.toLong, i.toLong * 3)).toDF("part", "id", "v")
    Snapshots.publishPartitions(spark, root, bloomCols = Seq("id")) { stage =>
      df.repartitionByRange(8, col("id")).write.partitionBy("part").parquet(stage)
    }
    val all = Snapshots.manifestFiles(spark, root, 1L)
    assert(all.size >= 6, s"fixture should have several files, got ${all.size}")

    val hit = Snapshots.readSnapshotEquals(spark, root, "id", lit(123L))
    assert(hit.select("v").as[Long].collect().toSeq == Seq(369L))
    assert(hit.inputFiles.length < all.size,
      s"bloom must skip files: planned ${hit.inputFiles.length} of ${all.size}")
    assert(hit.inputFiles.length >= 1)

    // absent key: every file's bloom rejects -> empty plan, empty result
    val miss = Snapshots.readSnapshotEquals(spark, root, "id", lit(5555L))
    assert(miss.count() == 0L)

    // a column with no bloom -> conservative full plan, still exact
    val noIdx = Snapshots.readSnapshotEquals(spark, root, "v", lit(369L))
    assert(noIdx.select("id").as[Long].collect().toSeq == Seq(123L))
    assert(noIdx.inputFiles.length == all.size)
  }

  test("bloom carries across publishes; pre-bloom files stay conservatively planned") {
    val root = freshRoot("snap_bloom_mix")
    // v1: partition a published WITHOUT blooms
    Snapshots.publishPartitions(spark, root)(stage =>
      (0 until 100).map(i => ("a", i.toLong, i.toLong)).toDF("part", "id", "v")
        .coalesce(1).write.partitionBy("part").parquet(stage))
    // v2: partition b added WITH blooms -> sidecar indexes only b's file
    Snapshots.publishPartitions(spark, root, bloomCols = Seq("id")) { stage =>
      (1000 until 1100).map(i => ("b", i.toLong, i.toLong)).toDF("part", "id", "v")
        .coalesce(1).write.partitionBy("part").parquet(stage)
    }
    val all = Snapshots.manifestFiles(spark, root, 2L)
    assert(all.size == 2)
    // id=7 lives in a (unindexed, must stay planned); b's bloom rejects it
    val r = Snapshots.readSnapshotEquals(spark, root, "id", lit(7L))
    assert(r.select("v").as[Long].collect().toSeq == Seq(7L))
    assert(r.inputFiles.length == 1, "b's bloom should reject id=7, a has no bloom")
    // v3 replaces b; a's (absent) bloom state and b's fresh bloom both correct
    Snapshots.publishPartitions(spark, root, bloomCols = Seq("id")) { stage =>
      (2000 until 2100).map(i => ("b", i.toLong, i.toLong)).toDF("part", "id", "v")
        .coalesce(1).write.partitionBy("part").parquet(stage)
    }
    val r3 = Snapshots.readSnapshotEquals(spark, root, "id", lit(2050L))
    assert(r3.select("v").as[Long].collect().toSeq == Seq(2050L))
    // a's file has no bloom -> conservatively planned; b's fresh file
    // holds the value; b's REPLACED file left the manifest entirely
    assert(r3.inputFiles.length == 2,
      "unindexed a stays planned + b's fresh file; nothing else")
  }

  test("merge is FILE-grain: untouched sibling files inside an affected partition carry verbatim") {
    val root = freshRoot("snap_merge_file")
    // one partition, two key-clustered files (ids 0..39 | 100..139) —
    // the bloom separates them, so a merge on id=5 must replace only
    // file 1 and carry file 2's manifest line BYTE-identical
    val lo = (0L until 40L).map(i => ("a", i, i)).toDF("part", "id", "v")
    val hi = (100L until 140L).map(i => ("a", i, i)).toDF("part", "id", "v")
    val v1 = Snapshots.publishPartitions(spark, root, bloomCols = Seq("id")) { stage =>
      lo.coalesce(1).unionByName(hi.coalesce(1)).repartitionByRange(2, col("id"))
        .write.partitionBy("part").parquet(stage)
    }
    val files1 = Snapshots.manifestFiles(spark, root, v1)
    assert(files1.size == 2, s"fixture needs exactly 2 files, got $files1")
    // read-locality, pinned at the probe: the bloom names ONLY the
    // lo file as a candidate for id=5 — the rewrite unit merge uses
    val cand = Snapshots.bloomCandidateFiles(spark, root, v1, "id",
      Seq(5L).toDF("id")).get
    assert(cand.size == 1, s"bloom must name exactly the one holding file: $cand")
    // write-locality, pinned at the bytes: the sibling file inside the
    // SAME affected partition must carry byte-identical (the r11 verdict
    // asked for the locality proof one level finer than partitions)
    val sibling = files1.filterNot(cand.contains).head
    def bytesOf(f: String): Seq[Byte] = {
      val in = fs(root).open(new Path(s"$root/$f"))
      try { val len = fs(root).getFileStatus(new Path(s"$root/$f")).getLen.toInt
        val buf = new Array[Byte](len); in.readFully(buf); buf.toSeq }
      finally in.close()
    }
    val siblingBytes = bytesOf(sibling)
    val v2 = SnapshotOps.merge(spark, root,
      Seq(("a", 5L, 777L, "upsert")).toDF("part", "id", "v", "op"), Seq("id"), "part")
    val files2 = Snapshots.manifestFiles(spark, root, v2)
    assert(files2.contains(sibling) && !files2.contains(cand.head),
      s"exactly the candidate file must be replaced: v1=$files1 v2=$files2")
    assert(bytesOf(sibling) == siblingBytes,
      "the untouched sibling inside the affected partition must stay byte-identical")
    // content exact
    val got = rowsOf(Snapshots.readSnapshot(spark, root))
    val want = (Seq(("a", 5L, 777L)) ++ (0L until 40L).filter(_ != 5L).map(i => ("a", i, i)) ++
      (100L until 140L).map(i => ("a", i, i))).sortBy(r => (r._1, r._2))
    assert(got == want)
    // a hi-key merge names the sibling as its candidate — the probe may
    // over-approximate but never under-approximate (false-negative check)
    val candHi = Snapshots.bloomCandidateFiles(spark, root, v2, "id",
      Seq(100L).toDF("id")).get
    assert(candHi.contains(sibling), s"id=100 must plan the sibling: $candHi")
    assert(!candHi.exists(_.contains(cand.head)), "replaced file must be gone from v2")
  }

  test("composite-key bloom: multi-column merges probe the sidecar, no data IO to discover") {
    val root = freshRoot("snap_merge_comp")
    val rows = (0L until 40L).map(i => ("p1", i, i)) ++
      (100L until 140L).map(i => ("p2", i, i)) ++
      (200L until 240L).map(i => ("zz", i, i))
    val v1 = Snapshots.publishPartitions(spark, root,
      bloomCols = Seq("id,part"))(stage =>
      rows.toDF("part", "id", "v").coalesce(1).write.partitionBy("part").parquet(stage))
    // corrupt zz's file: a passing multi-key merge is PROOF the probe
    // went through the composite sidecar and never opened it
    val zzFile = Snapshots.manifestFiles(spark, root, v1).find(_.startsWith("part=zz/")).get
    val out = fs(root).create(new Path(s"$root/$zzFile"), true)
    out.write("not parquet".getBytes("UTF-8")); out.close()
    val src = Seq(("p1", 0L, 777L, "upsert"), ("p2", 555L, 1L, "upsert"))
      .toDF("part", "id", "v", "op")
    val v2 = SnapshotOps.merge(spark, root, src, Seq("id", "part"), "part")
    val got = Snapshots.readSnapshot(spark, root, Some(v2))
      .filter(col("part") =!= "zz")
      .select(col("part"), col("id"), col("v")).as[(String, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    val expected = (Seq(("p1", 0L, 777L), ("p2", 555L, 1L)) ++
      (1L until 40L).map(i => ("p1", i, i)) ++
      (100L until 140L).map(i => ("p2", i, i))).sortBy(r => (r._1, r._2))
    assert(got == expected)
    assert(Snapshots.manifestFiles(spark, root, v2).contains(zzFile),
      "the unprobed partition must carry by reference")
    // false-negative check: a zz-resident composite key must plan zz
    intercept[Exception] {
      SnapshotOps.merge(spark, root,
        Seq(("zz", 200L, 0L, "delete")).toDF("part", "id", "v", "op"),
        Seq("id", "part"), "part")
    }
  }

  test("typed bloom probe: a narrower-typed source never bloom-misses (no lost deletes)") {
    val root = freshRoot("snap_merge_typed")
    // stored key is LONG; the CDC batch arrives with an INT key column —
    // xxhash64 is type-sensitive, so an uncast probe would miss every
    // file and the delete would silently vanish
    Snapshots.publishPartitions(spark, root, bloomCols = Seq("id"))(stage =>
      (0L until 40L).map(i => ("a", i, i)).toDF("part", "id", "v")
        .coalesce(1).write.partitionBy("part").parquet(stage))
    val src = Seq(("a", 7, 0L, "delete")).toDF("part", "id", "v", "op") // id: INT
    SnapshotOps.merge(spark, root, src, Seq("id"), "part")
    val ids = Snapshots.readSnapshot(spark, root).select("id").as[Long].collect().toSet
    assert(!ids.contains(7L), "the Int-keyed delete must land on the Long-keyed table")
    assert(ids.size == 39)
    // same footgun on the point read: an Int literal against a Long col
    val hit = Snapshots.readSnapshotEquals(spark, root, "id", lit(5))
    assert(hit.select("v").as[Long].collect().toSeq == Seq(5L))
  }

  test("persisted constraints: every publish verb enforces, violators quarantine with audit") {
    val root = freshRoot("snap_cons")
    Snapshots.publishPartitions(spark, root)(stage =>
      Seq(("a", 1L, 10L), ("a", 2L, 20L)).toDF("part", "id", "v")
        .write.partitionBy("part").parquet(stage))
    val vc = Snapshots.setConstraints(spark, root,
      Seq("v_nonneg" -> "v >= 0", "v_cap" -> "v <= 1000"))
    assert(Snapshots.tableConstraints(spark, root) ==
      Seq("v_cap" -> "v <= 1000", "v_nonneg" -> "v >= 0"))
    // a PLAIN publish (not publishExpect) now quarantines its violators
    val v2 = Snapshots.publishPartitions(spark, root)(stage =>
      Seq(("b", 3L, 30L), ("b", 4L, -5L), ("b", 5L, 2000L)).toDF("part", "id", "v")
        .write.partitionBy("part").parquet(stage))
    assert(rowsOf(Snapshots.readSnapshot(spark, root)) ==
      Seq(("a", 1L, 10L), ("a", 2L, 20L), ("b", 3L, 30L)))
    val meta = Snapshots.manifestMeta(spark, root, v2)
    assert(meta("constraint_quarantined") == "2" && meta("constraint_clean") == "1")
    val quar = SnapshotOps.readConstraintQuarantine(spark, root, v2).get
      .select("id", "violated").as[(Long, String)].collect().toMap
    assert(quar == Map(4L -> "v_nonneg", 5L -> "v_cap"))
    // constraints CARRY across versions (v2 was a plain publish, not a
    // setConstraints) and gate MERGE too — ALL-OR-NOTHING: a violating
    // upsert fails the whole statement before any rewrite (quarantining
    // mid-merge would silently drop the matched rows' replacements)
    val preMerge = rowsOf(Snapshots.readSnapshot(spark, root))
    val exm = intercept[IllegalArgumentException] {
      SnapshotOps.merge(spark, root,
        Seq(("a", 9L, -1L, "upsert"), ("a", 10L, 40L, "upsert"))
          .toDF("part", "id", "v", "op"), Seq("id"), "part")
    }
    assert(exm.getMessage.contains("violate"), exm.getMessage)
    assert(rowsOf(Snapshots.readSnapshot(spark, root)) == preMerge,
      "a refused merge must leave the table untouched")
    // the clean remainder merges fine
    SnapshotOps.merge(spark, root,
      Seq(("a", 10L, 40L, "upsert")).toDF("part", "id", "v", "op"), Seq("id"), "part")
    assert(rowsOf(Snapshots.readSnapshot(spark, root)).contains(("a", 10L, 40L)))
    // additive file commits REFUSE (cannot quarantine already-live files)
    val d = new Path(s"$root/part=a")
    Seq(("a", 99L, -77L)).toDF("part", "id", "v").coalesce(1)
      .write.mode("overwrite").parquet(s"$root/_tmp_add")
    val src = fs(root).listStatus(new Path(s"$root/_tmp_add"))
      .map(_.getPath).filter(_.getName.endsWith(".parquet")).head
    fs(root).rename(src, new Path(d, "ingest-bad-0.snappy.parquet"))
    val err = intercept[IllegalArgumentException](
      Snapshots.publishAddedFiles(spark, root, Seq("part=a/ingest-bad-0.snappy.parquet")))
    assert(err.getMessage.contains("violate"), err.getMessage)
    // an all-violating batch refuses rather than committing emptiness
    intercept[IllegalArgumentException] {
      Snapshots.publishPartitions(spark, root)(stage =>
        Seq(("c", 50L, -1L)).toDF("part", "id", "v")
          .write.partitionBy("part").parquet(stage))
    }
    // clearing the constraints lifts the gate
    Snapshots.setConstraints(spark, root, Nil)
    Snapshots.publishPartitions(spark, root)(stage =>
      Seq(("c", 50L, -1L)).toDF("part", "id", "v")
        .write.partitionBy("part").parquet(stage))
    assert(rowsOf(Snapshots.readSnapshot(spark, root)).contains(("c", 50L, -1L)))
    assert(vc == 2L, "setConstraints must be one metadata-only commit")
  }

  test("constraints never corrupt DV updates or re-gate maintenance rewrites") {
    val root = freshRoot("snap_cons_dv")
    Snapshots.publishPartitions(spark, root)(stage =>
      Seq(("a", 1L, 300L), ("a", 2L, 500L), ("b", 3L, 10L)).toDF("part", "id", "v")
        .coalesce(1).write.partitionBy("part").parquet(stage))
    // constraint set AFTER the 500-row entered: documented no retro-scan
    Snapshots.setConstraints(spark, root, Seq("v_cap" -> "v <= 400"))
    val before = rowsOf(Snapshots.readSnapshot(spark, root))
    // (1) an update whose replacement VIOLATES must refuse the whole
    // statement — the old position must NOT die (update != delete)
    val ex1 = intercept[IllegalArgumentException] {
      SnapshotOps.updateWhere(spark, root, col("id") === 1L,
        Map("v" -> (col("v") + 200L)), "part")
    }
    assert(ex1.getMessage.contains("violate"))
    assert(rowsOf(Snapshots.readSnapshot(spark, root)) == before,
      "a refused updateWhere must leave every row live")
    // same for a mergeOnRead upsert whose new image violates
    val ex2 = intercept[IllegalArgumentException] {
      SnapshotOps.mergeOnRead(spark, root,
        Seq(("a", 1L, 999L, "upsert")).toDF("part", "id", "v", "op"),
        Seq("id", "part"), "part")
    }
    assert(ex2.getMessage.contains("violate"))
    assert(rowsOf(Snapshots.readSnapshot(spark, root)) == before)
    // (2) maintenance rewrites carry the PRE-CONSTRAINT 500-row instead
    // of silently deleting it: DV-delete something, then purge — the
    // rewrite re-stages the 500-row and must keep it
    SnapshotOps.mergeOnRead(spark, root,
      Seq(("b", 3L, 10L, "delete")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    val vp = SnapshotOps.purgeDeletes(spark, root).get
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(vp))) ==
      before.filterNot(_._2 == 3L),
      "purge must stay content-preserving for rows that predate a constraint")
    // optimize over a fragmented pre-constraint partition too
    Snapshots.setConstraints(spark, root, Nil)
    Snapshots.publishPartitions(spark, root)(stage =>
      (0L until 40L).map(i => ("c", 100L + i, 500L)).toDF("part", "id", "v")
        .repartition(12).write.partitionBy("part").parquet(stage))
    Snapshots.setConstraints(spark, root, Seq("v_cap" -> "v <= 400"))
    val preOpt = rowsOf(Snapshots.readSnapshot(spark, root))
    val vo = SnapshotOps.optimize(spark, root, targetFileBytes = 1L << 30)
      .getOrElse(fail("fragmented partition must qualify"))
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(vo))) == preOpt,
      "optimize must not re-gate committed rows")
  }

  test("constraint rewrite preserves string partition dirs verbatim; evolution guards hold") {
    val root = freshRoot("snap_cons_part")
    // string partition value "01": a type-inferring rewrite would land
    // k=1 and leave the old k=01 files carried — duplicated rows
    Snapshots.publishPartitions(spark, root)(stage =>
      Seq(("01", 1L, 10L)).toDF("part", "id", "v")
        .coalesce(1).write.partitionBy("part").parquet(stage))
    Snapshots.setConstraints(spark, root, Seq("v_cap" -> "v <= 400"))
    val v2 = Snapshots.publishPartitions(spark, root)(stage =>
      Seq(("01", 2L, 20L), ("01", 3L, 999L)).toDF("part", "id", "v")
        .coalesce(1).write.partitionBy("part").parquet(stage))
    assert(Snapshots.manifestMeta(spark, root, v2)("constraint_quarantined") == "1")
    assert(Snapshots.manifestFiles(spark, root, v2).forall(_.startsWith("part=01/")),
      "the rewrite must preserve the dir name verbatim, never re-infer '01' as 1")
    // read-side partition-TYPE inference may render "01" as 1 (standard
    // hive behavior, same for an unconstrained table) — what must hold
    // is the replacement semantics: exactly the one clean row, the old
    // generation gone, nothing duplicated
    assert(rowsOf(Snapshots.readSnapshot(spark, root)).map(r => (r._2, r._3)) ==
      Seq((2L, 20L)),
      "partition 01 must be replaced exactly once (no resurrected old rows)")
    // an ALL-violating partition refuses the whole publish (silently
    // dropping its dir would carry the old generation)
    val ex = intercept[IllegalArgumentException] {
      Snapshots.publishPartitions(spark, root)(stage =>
        Seq(("01", 9L, 999L), ("02", 10L, 5L)).toDF("part", "id", "v")
          .coalesce(1).write.partitionBy("part").parquet(stage))
    }
    assert(ex.getMessage.contains("EVERY staged row of partition"))
    // rename/drop of a constrained column refuses instead of wedging
    // every later publish with an unresolved-column error
    val exR = intercept[IllegalArgumentException] {
      Snapshots.renameColumn(spark, root, "v", "amount")
    }
    assert(exR.getMessage.contains("constraint"))
    val exD = intercept[IllegalArgumentException] {
      Snapshots.dropColumn(spark, root, "v")
    }
    assert(exD.getMessage.contains("constraint"))
    // separator characters in a rename would corrupt the colmap meta
    Snapshots.setConstraints(spark, root, Nil)
    val exS = intercept[IllegalArgumentException] {
      Snapshots.renameColumn(spark, root, "v", "a>b")
    }
    assert(exS.getMessage.contains("separator"))
    // with constraints cleared the rename goes through
    Snapshots.renameColumn(spark, root, "v", "amount")
    assert(Snapshots.readSnapshot(spark, root).columns.contains("amount"))
  }

  test("renameColumn/dropColumn: metadata-only evolution, old generations re-map at read") {
    val root = freshRoot("snap_rename")
    val v1 = Snapshots.publishPartitions(spark, root, statsCols = Seq("v"))(stage =>
      (0L until 40L).map(i => ("a", i, i)).toDF("part", "id", "v")
        .repartitionByRange(4, col("v")).write.partitionBy("part").parquet(stage))
    val v2 = Snapshots.renameColumn(spark, root, "v", "amount")
    // the rename is METADATA: no new data files
    assert(Snapshots.manifestFiles(spark, root, v2) ==
      Snapshots.manifestFiles(spark, root, v1))
    // old generation reads under the NEW name
    val r = Snapshots.readSnapshot(spark, root)
    assert(r.columns.toSet == Set("part", "id", "amount"))
    assert(r.select("amount").as[Long].collect().sorted.toSeq == (0L until 40L))
    // a post-rename publish writes the new name; both generations union
    Snapshots.publishPartitions(spark, root, statsCols = Seq("amount"))(stage =>
      (100L until 120L).map(i => ("b", i, i)).toDF("part", "id", "amount")
        .write.partitionBy("part").parquet(stage))
    val all = Snapshots.readSnapshot(spark, root)
    assert(all.select("amount").as[Long].collect().sorted.toSeq ==
      ((0L until 40L) ++ (100L until 120L)))
    // pinned pre-rename reads are untouched (old logical schema)
    assert(Snapshots.readSnapshot(spark, root, Some(v1)).columns.toSet ==
      Set("part", "id", "v"))
    // stat skipping still works through the alias chain: v1 files
    // recorded stats under 'v', fresh files under 'amount'
    val ranged = Snapshots.readSnapshotRange(spark, root, "amount", 0, 9)
    assert(ranged.inputFiles.length <
      Snapshots.readSnapshot(spark, root).inputFiles.length,
      "range read must keep pruning across the rename")
    assert(ranged.select("amount").as[Long].collect().sorted.toSeq == (0L to 9L))
    // optimize reads the LOGICAL schema and compacts across generations
    val vOpt = SnapshotOps.optimize(spark, root, targetFileBytes = 512L << 20,
      minWaste = 1).getOrElse(fail("fragmented table must optimize"))
    assert(Snapshots.readSnapshot(spark, root, Some(vOpt))
      .select("amount").as[Long].collect().sorted.toSeq ==
      ((0L until 40L) ++ (100L until 120L)))
    // dropColumn: logical, old pins unaffected
    Snapshots.dropColumn(spark, root, "id")
    assert(Snapshots.readSnapshot(spark, root).columns.toSet == Set("part", "amount"))
    assert(Snapshots.readSnapshot(spark, root, Some(v1)).columns.contains("id"))
    // partition column rename refuses; dropped names are retired
    intercept[IllegalArgumentException](Snapshots.renameColumn(spark, root, "part", "p2"))
    intercept[IllegalArgumentException](Snapshots.renameColumn(spark, root, "amount", "id"))
  }

  test("clone chains compose: a clone of a clone diverges at both levels, vacuums safely") {
    val a = freshRoot("snap_chain_a")
    val b = freshRoot("snap_chain_b")
    val c = freshRoot("snap_chain_c")
    Snapshots.publishPartitions(spark, a, bloomCols = Seq("id"))(stage =>
      ((0L until 20L).map(i => ("p", i, i)) ++ (100L until 120L).map(i => ("q", i, i)))
        .toDF("part", "id", "v").write.partitionBy("part").parquet(stage))
    Snapshots.cloneTable(spark, a, b)
    // b diverges on partition p
    Snapshots.publishPartitions(spark, b)(stage =>
      Seq(("p", 500L, 1L)).toDF("part", "id", "v")
        .write.partitionBy("part").parquet(stage))
    Snapshots.cloneTable(spark, b, c)
    // c sees b's divergence plus a's q files (a 3-deep reference chain)
    def content(root: String) = rowsOf(Snapshots.readSnapshot(spark, root))
    val bContent = content(b)
    assert(content(c) == bContent)
    assert(bContent.contains(("p", 500L, 1L)) && bContent.count(_._1 == "q") == 20)
    // the read plans at most 1 + chain-depth groups and keeps pruning:
    // a point read on c through the carried sidecar plans few files
    val probe = Snapshots.readSnapshotEquals(spark, c, "id", lit(100L))
    assert(probe.count() == 1)
    assert(probe.inputFiles.length < Snapshots.readSnapshot(spark, c).inputFiles.length)
    // c diverges independently on q — b and a never observe it
    Snapshots.publishPartitions(spark, c)(stage =>
      Seq(("q", 900L, 9L)).toDF("part", "id", "v")
        .write.partitionBy("part").parquet(stage))
    assert(content(c).contains(("q", 900L, 9L)))
    assert(content(b) == bContent, "clone-of-clone divergence leaked into its source")
    assert(content(a).count(_._1 == "q") == 20)
    // each root's vacuum deletes only under itself
    Snapshots.vacuum(spark, c, keepVersions = 1, graceMs = 0)
    Snapshots.vacuum(spark, b, keepVersions = 1, graceMs = 0)
    assert(content(c).contains(("q", 900L, 9L)) && content(b) == bContent)
    assert(content(a).count(_._1 == "p") == 20, "chain vacuum must never touch the origin")
  }

  test("bloom sidecar keys survive hive-escaped partition values") {
    val root = freshRoot("snap_bloom_esc")
    // ':' escapes to %3A on disk and input_file_name re-quotes it to
    // %253A — the sidecar must key by MANIFEST suffix or coverage (and
    // carried rows at the next publish) silently vanish
    val v1 = Snapshots.publishPartitions(spark, root, bloomCols = Seq("id")) { stage =>
      (0L until 40L).map(i => ("a:1", i, i)).toDF("part", "id", "v")
        .coalesce(1).write.partitionBy("part").parquet(stage)
    }
    // a plain (non-clone) table's manifest lines ARE the rel suffixes
    val manifestKeys = Snapshots.manifestFiles(spark, root, v1).toSet
    val markerKeys = Snapshots.fileBlooms(spark, root, v1).get
      .filter(col("word_idx") === -1L).select("file").as[String].collect().toSet
    assert(markerKeys == manifestKeys,
      s"sidecar keys must equal manifest suffixes: $markerKeys vs $manifestKeys")
    // skipping bites from birth…
    val miss = Snapshots.readSnapshotEquals(spark, root, "id", lit(5555L))
    assert(miss.count() == 0 && miss.inputFiles.isEmpty,
      "an absent key must plan nothing — the escaped file's bloom must reject it")
    // …and the carried rows survive the next publish's kept-semijoin
    Snapshots.publishPartitions(spark, root, bloomCols = Seq("id")) { stage =>
      (100L until 110L).map(i => ("b", i, i)).toDF("part", "id", "v")
        .coalesce(1).write.partitionBy("part").parquet(stage)
    }
    val miss2 = Snapshots.readSnapshotEquals(spark, root, "id", lit(5555L))
    assert(miss2.count() == 0 && miss2.inputFiles.isEmpty,
      "the escaped partition's carried bloom rows must survive the next publish")
    val hit = Snapshots.readSnapshotEquals(spark, root, "id", lit(7L))
    assert(hit.select("v").as[Long].collect().toSeq == Seq(7L))
    assert(hit.inputFiles.length == 1)
  }

  test("vacuum reaps dropped versions' bloom sidecars, keeps the survivors'") {
    val root = freshRoot("snap_bloom_vac")
    def pub(mult: Int): Long =
      Snapshots.publishPartitions(spark, root, bloomCols = Seq("id")) { stage =>
        (0 until 50).map(i => ("a", i.toLong, i.toLong * mult)).toDF("part", "id", "v")
          .coalesce(1).write.partitionBy("part").parquet(stage)
      }
    val v1 = pub(1); val v2 = pub(2); val v3 = pub(3)
    assert(Seq(v1, v2, v3).forall(v =>
      Snapshots.fileBlooms(spark, root, v).nonEmpty))
    Snapshots.vacuum(spark, root, keepVersions = 2, graceMs = 0L)
    assert(Snapshots.fileBlooms(spark, root, v1).isEmpty, "v1 sidecar must be reaped")
    assert(Snapshots.fileBlooms(spark, root, v2).nonEmpty)
    assert(Snapshots.fileBlooms(spark, root, v3).nonEmpty)
    // post-vacuum point read still exact and still skipping
    val r = Snapshots.readSnapshotEquals(spark, root, "id", lit(10L))
    assert(r.select("v").as[Long].collect().toSeq == Seq(30L))
  }

  // ---- deletion vectors (merge-on-read) --------------------------------

  private def bytesOfFile(root: String, f: String): Seq[Byte] = {
    val p = new Path(s"$root/$f")
    val in = fs(root).open(p)
    try {
      val len = fs(root).getFileStatus(p).getLen.toInt
      val buf = new Array[Byte](len); in.readFully(buf); buf.toSeq
    } finally in.close()
  }

  test("mergeOnRead delete commits with ZERO data-file churn; pinned reads and stacking hold") {
    val root = freshRoot("snap_dv")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 1).coalesce(1).write.partitionBy("part").parquet(stage))
    val files1 = Snapshots.manifestFiles(spark, root, v1)
    val sums1 = files1.map(f => f -> bytesOfFile(root, f)).toMap
    // delete-only batch: ids 0..9 of partition a die by deletion vector
    val batch = (0L until 10L).map(i => ("a", i, i, "delete")).toDF("part", "id", "v", "op")
    val v2 = SnapshotOps.mergeOnRead(spark, root, batch, Seq("id", "part"), "part")
    // the core merge-on-read claim: the manifest's FILE LIST is identical
    // and every data file is byte-identical — only the sidecar changed
    assert(Snapshots.manifestFiles(spark, root, v2) == files1,
      "a DV delete must not add, drop or rename any data file")
    files1.foreach(f => assert(bytesOfFile(root, f) == sums1(f),
      s"data file $f must stay byte-identical across a DV delete"))
    assert(Snapshots.fileDvs(spark, root, v2).nonEmpty, "v2 must carry a DV sidecar")
    // logical content: the rows are gone at v2, intact pinned at v1
    val atV2 = Snapshots.readSnapshot(spark, root)
    assert(rowsOf(atV2) ==
      rowsOf(fixture("a" -> 1, "b" -> 1)).filterNot(r => r._1 == "a" && r._2 < 10))
    // plan shape: a small sidecar must resolve to a BROADCAST anti join
    // (AQE finalizes after the action above) — a shuffled subtraction on
    // a 10-row DV would be the wrong plan at any scale
    val plan = atV2.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"small DV subtraction must be a broadcast anti join, got:\n${plan.take(2000)}")
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(v1))) ==
      rowsOf(fixture("a" -> 1, "b" -> 1)))
    // STACKED second batch: carry ∪ fresh — both generations of deletes apply
    val v3 = SnapshotOps.mergeOnRead(spark, root,
      (10L until 15L).map(i => ("a", i, i, "delete")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(v3))) ==
      rowsOf(fixture("a" -> 1, "b" -> 1)).filterNot(r => r._1 == "a" && r._2 < 15))
    // a re-delete of already-dead keys is a no-op under allowNoop
    assert(SnapshotOps.mergeOnRead(spark, root,
      (0L until 5L).map(i => ("a", i, i, "delete")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part", allowNoop = true) == v3)
  }

  test("mergeOnRead update moves rows across partitions without rewriting either side") {
    val root = freshRoot("snap_dv_upd")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 1).coalesce(1).write.partitionBy("part").parquet(stage))
    val files1 = Snapshots.manifestFiles(spark, root, v1).toSet
    // update a/id0 in place, MOVE a/id1 to partition c, insert d/id99
    val src = Seq(
      ("a", 0L, 777L, "upsert"),
      ("c", 1L, 888L, "upsert"),
      ("d", 99L, 1L, "upsert")).toDF("part", "id", "v", "op")
    // key is id ALONE so the move matches its old row in partition a
    val v2 = SnapshotOps.mergeOnRead(spark, root, src, Seq("id"), "part")
    val files2 = Snapshots.manifestFiles(spark, root, v2).toSet
    assert(files1.subsetOf(files2), "every v1 data file must carry verbatim")
    assert((files2 -- files1).nonEmpty, "the surviving source rows land additively")
    val got = rowsOf(Snapshots.readSnapshot(spark, root))
    val want = (rowsOf(fixture("a" -> 1, "b" -> 1))
      .filterNot(r => r._2 <= 1L) ++
      Seq(("a", 0L, 777L), ("c", 1L, 888L), ("d", 99L, 1L))).sortBy(r => (r._1, r._2))
    assert(got == want, "merge-on-read must equal copy-on-write merge semantics")
  }

  test("purgeDeletes materializes DVs file-grain and returns the table to the DV-free path") {
    val root = freshRoot("snap_dv_purge")
    // two key-clustered files in partition a + one in b: the DV hits only
    // the low file; purge must rewrite exactly the DV'd file
    val v1 = Snapshots.publishPartitions(spark, root, bloomCols = Seq("id")) { stage =>
      val lo = (0L until 40L).map(i => ("a", i, i)).toDF("part", "id", "v")
      val hi = (100L until 140L).map(i => ("a", i, i)).toDF("part", "id", "v")
      val b = (200L until 220L).map(i => ("b", i, i)).toDF("part", "id", "v")
      lo.coalesce(1).unionByName(hi.coalesce(1)).repartitionByRange(2, col("id"))
        .unionByName(b.coalesce(1)).write.partitionBy("part").parquet(stage)
    }
    SnapshotOps.mergeOnRead(spark, root,
      (0L until 5L).map(i => ("a", i, i, "delete")).toDF("part", "id", "v", "op"),
      Seq("id"), "part")
    val before = rowsOf(Snapshots.readSnapshot(spark, root))
    val dvd = Snapshots.fileDvs(spark, root, Snapshots.latestVersion(spark, root).get)
      .get.select(col("file")).distinct().as[String].collect().toSet
    assert(dvd.size == 1, s"the bloom-probed DV must target exactly the lo file: $dvd")
    val untouched = Snapshots.manifestFiles(spark, root, v1)
      .filterNot(f => dvd.contains(f))
    val sums = untouched.map(f => f -> bytesOfFile(root, f)).toMap
    val v3 = SnapshotOps.purgeDeletes(spark, root)
      .getOrElse(fail("pending DVs must purge"))
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(v3))) == before,
      "purge must be content-preserving")
    assert(Snapshots.fileDvs(spark, root, v3).isEmpty,
      "a full purge must return the table to the DV-free fast path")
    val files3 = Snapshots.manifestFiles(spark, root, v3)
    untouched.foreach { f =>
      assert(files3.contains(f) && bytesOfFile(root, f) == sums(f),
        s"non-DV file $f must carry byte-identical through the purge")
    }
    assert(!files3.exists(dvd.contains), "the DV'd file must be replaced")
    // idle tick: nothing pending -> no commit
    assert(SnapshotOps.purgeDeletes(spark, root).isEmpty)
    assert(Snapshots.latestVersion(spark, root).contains(v3))
  }

  test("purgeDeletes drops a partition whose every row died by DV") {
    val root = freshRoot("snap_dv_empty")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 1).coalesce(1).write.partitionBy("part").parquet(stage))
    SnapshotOps.mergeOnRead(spark, root,
      (0L until 40L).map(i => ("b", i, i, "delete")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    // rows are logically gone but the partition's files still carry
    assert(Snapshots.readSnapshot(spark, root).filter(col("part") === "b").count() == 0)
    assert(Snapshots.manifestFiles(spark, root,
      Snapshots.latestVersion(spark, root).get).exists(_.startsWith("part=b/")))
    val v3 = SnapshotOps.purgeDeletes(spark, root).get
    assert(!Snapshots.manifestFiles(spark, root, v3).exists(_.startsWith("part=b/")),
      "a fully-dead partition must drop from the manifest at purge")
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(v3))) ==
      rowsOf(fixture("a" -> 1)))
  }

  test("snapshotChanges reads DV deltas as removed rows; updates net unchanged rows out") {
    val root = freshRoot("snap_dv_cdc")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1).coalesce(1).write.partitionBy("part").parquet(stage))
    // batch: delete id0, update id1 -> 999, and carry everything else
    val v2 = SnapshotOps.mergeOnRead(spark, root,
      Seq(("a", 0L, 0L, "delete"), ("a", 1L, 999L, "upsert"))
        .toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    val ch = Snapshots.snapshotChanges(spark, root, v1, v2)
      .select(col("change"), col("part"), col("id"), col("v"))
      .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(ch == Seq(
      ("added", "a", 1L, 999L),
      ("removed", "a", 0L, 0L),
      ("removed", "a", 1L, 1L)),
      s"DV CDC must emit exactly the churn, got $ch")
    // purge produces NO logical change: the CDC window across it is empty
    val v3 = SnapshotOps.purgeDeletes(spark, root).get
    assert(Snapshots.snapshotChanges(spark, root, v2, v3).count() == 0,
      "materializing DVs must be invisible to CDC")
  }

  test("skipping reads and clones subtract deletion vectors") {
    val root = freshRoot("snap_dv_reads")
    Snapshots.publishPartitions(spark, root,
      statsCols = Seq("id"), bloomCols = Seq("id"))(stage =>
      fixture("a" -> 1).coalesce(1).write.partitionBy("part").parquet(stage))
    SnapshotOps.mergeOnRead(spark, root,
      Seq(("a", 7L, 7L, "delete")).toDF("part", "id", "v", "op"), Seq("id"), "part")
    // point lookup: the bloom still names the file (stale bits are false
    // POSITIVES — allowed) but the row must be gone
    assert(Snapshots.readSnapshotEquals(spark, root, "id", lit(7L)).count() == 0)
    assert(Snapshots.readSnapshotEquals(spark, root, "id", lit(8L))
      .select("v").as[Long].collect().toSeq == Seq(8L))
    // range read subtracts too
    assert(Snapshots.readSnapshotRange(spark, root, "id", 5.0, 9.0)
      .select("id").as[Long].collect().sorted.toSeq == Seq(5L, 6L, 8L, 9L))
    // a clone must carry the pending deletions (or it resurrects rows)
    val cloneRoot = freshRoot("snap_dv_clone")
    Snapshots.cloneTable(spark, root, cloneRoot)
    assert(rowsOf(Snapshots.readSnapshot(spark, cloneRoot)) ==
      rowsOf(fixture("a" -> 1)).filterNot(_._2 == 7L))
  }

  test("deleteWhere commits predicate deletes as DVs with zero data churn, stacks and no-ops") {
    val root = freshRoot("snap_dv_where")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 2).coalesce(1).write.partitionBy("part").parquet(stage))
    val files1 = Snapshots.manifestFiles(spark, root, v1)
    val sums1 = files1.map(f => f -> bytesOfFile(root, f)).toMap
    val v2 = SnapshotOps.deleteWhere(spark, root, col("v") >= 60L)
    assert(Snapshots.manifestFiles(spark, root, v2) == files1)
    files1.foreach(f => assert(bytesOfFile(root, f) == sums1(f),
      s"deleteWhere must not rewrite $f"))
    assert(rowsOf(Snapshots.readSnapshot(spark, root)) ==
      rowsOf(fixture("a" -> 1, "b" -> 2)).filterNot(_._3 >= 60L))
    // stacked on the keyed verb: a later mergeOnRead sees only live rows
    val v3 = SnapshotOps.mergeOnRead(spark, root,
      Seq(("a", 1L, 555L, "upsert")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(v3))) ==
      (rowsOf(fixture("a" -> 1, "b" -> 2))
        .filterNot(_._3 >= 60L).filterNot(r => r._1 == "a" && r._2 == 1L) ++
        Seq(("a", 1L, 555L))).sortBy(r => (r._1, r._2)))
    // nothing-matches: loud by default, version-stable under allowNoop
    intercept[IllegalArgumentException] {
      SnapshotOps.deleteWhere(spark, root, col("v") === -1L)
    }
    assert(SnapshotOps.deleteWhere(spark, root, col("v") === -1L,
      allowNoop = true) == v3)
  }

  test("a multi-column partitionBy stage commits leaf partitions (r13 nested layouts)") {
    // r12 refused nested stages; r13 supports them as first-class leaf
    // partitions (NestedPartitionSpec holds the locality proofs). This
    // pins the LAYOUT-UPGRADE path: re-partitioning a flat table to a
    // nested layout goes through a FULL publish (one consistent depth
    // per version — Spark's partition inference cannot read mixed
    // depths under one base), and the flat version stays pinned-readable.
    val root = freshRoot("snap_multipart")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1).coalesce(1).write.partitionBy("part").parquet(stage))
    val v2 = Snapshots.publishFull(spark, root)(stage =>
      fixture("a" -> 1).coalesce(1).write.partitionBy("part", "id").parquet(stage))
    val parts = Snapshots.manifestFiles(spark, root, v2)
      .map(Snapshots.partitionOf).toSet
    assert(parts.nonEmpty && parts.forall(_.startsWith("part=a/id=")),
      s"nested leaves expected, got $parts")
    assert(Snapshots.readSnapshot(spark, root, Some(v2)).count() ==
      fixture("a" -> 1).count())
    // time travel to the flat generation still works
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(v1))) ==
      rowsOf(fixture("a" -> 1)))
  }

  test("updateWhere transforms matching rows via DV + re-insert, moves across partitions") {
    val root = freshRoot("snap_dv_updw")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 2).coalesce(1).write.partitionBy("part").parquet(stage))
    val files1 = Snapshots.manifestFiles(spark, root, v1).toSet
    // bump v for a's low ids AND move them to partition c — an update
    // that rewrites values and crosses partitions in one commit
    val v2 = SnapshotOps.updateWhere(spark, root,
      col("part") === "a" && col("id") < 5L,
      Map("v" -> (col("v") + 1000L), "part" -> lit("c")), "part")
    assert(files1.subsetOf(Snapshots.manifestFiles(spark, root, v2).toSet),
      "updateWhere must not rewrite any existing data file")
    val got = rowsOf(Snapshots.readSnapshot(spark, root))
    val want = (rowsOf(fixture("a" -> 1, "b" -> 2))
      .filterNot(r => r._1 == "a" && r._2 < 5L) ++
      (0L until 5L).map(i => ("c", i, i + 1000L))).sortBy(r => (r._1, r._2))
    assert(got == want)
    // an update touching already-updated rows stacks (DV carry + fresh)
    val v3 = SnapshotOps.updateWhere(spark, root,
      col("part") === "c", Map("v" -> (col("v") * 2L)), "part")
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(v3)))
      .filter(_._1 == "c").map(_._3).sorted ==
      (0L until 5L).map(i => (i + 1000L) * 2L).sorted)
    // no-match: loud by default, quiet under allowNoop
    intercept[IllegalArgumentException] {
      SnapshotOps.updateWhere(spark, root, col("id") === -5L,
        Map("v" -> lit(0L)), "part")
    }
    assert(SnapshotOps.updateWhere(spark, root, col("id") === -5L,
      Map("v" -> lit(0L)), "part", allowNoop = true) == v3)
  }

  test("change feed: bootstrap, incremental windows, idle ticks, crash replay, horizon") {
    import graft.core.ChangeFeed
    val root = freshRoot("snap_feed")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1).coalesce(1).write.partitionBy("part").parquet(stage))
    // bootstrap: full snapshot as 'added'
    var seen = Seq.empty[(String, String, Long, Long)]
    def collect(df: org.apache.spark.sql.DataFrame): Unit =
      seen = df.select(col("change"), col("part"), col("id"), col("v"))
        .as[(String, String, Long, Long)].collect().sortBy(r => (r._1, r._3)).toSeq
    val w1 = ChangeFeed.consume(spark, root, "idx")(collect)
    assert(w1.exists(_._2 == 1L) && seen.size == 40 && seen.forall(_._1 == "added"))
    // caught up: idle tick is a no-op, callback not invoked
    seen = Seq.empty
    assert(ChangeFeed.consume(spark, root, "idx")(collect).isEmpty && seen.isEmpty)
    // two commits, one consume: the window spans both
    SnapshotOps.mergeOnRead(spark, root,
      Seq(("a", 0L, 0L, "delete")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    SnapshotOps.mergeOnRead(spark, root,
      Seq(("a", 99L, 9L, "upsert")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    val w2 = ChangeFeed.consume(spark, root, "idx")(collect)
    assert(w2.exists(w => w._1 == 1L && w._2 == 3L))
    assert(seen == Seq(("added", "a", 99L, 9L), ("removed", "a", 0L, 0L)))
    // crash replay: a callback that throws must NOT advance the cursor
    SnapshotOps.mergeOnRead(spark, root,
      Seq(("a", 1L, 1L, "delete")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    intercept[RuntimeException] {
      ChangeFeed.consume(spark, root, "idx")(_ => throw new RuntimeException("boom"))
    }
    assert(ChangeFeed.currentOffset(spark, root, "idx").contains(3L))
    val w3 = ChangeFeed.consume(spark, root, "idx")(collect)
    assert(w3.nonEmpty && seen == Seq(("removed", "a", 1L, 1L)),
      "the crashed window must replay in full")
    // a second consumer has its own cursor; startAtLatest skips history
    seen = Seq.empty
    assert(ChangeFeed.consume(spark, root, "ship", startAtLatest = true)(collect).isEmpty
      && seen.isEmpty)
    // behind the vacuum horizon: loud, with the re-bootstrap instruction
    ChangeFeed.resetOffset(spark, root, "ship")
    ChangeFeed.consume(spark, root, "ship", startAtLatest = true)(collect)
    // rewind the cursor artificially to a version vacuum will drop
    (1 to 3).foreach { _ =>
      SnapshotOps.mergeOnRead(spark, root,
        Seq(("a", 77L, 7L, "upsert")).toDF("part", "id", "v", "op"),
        Seq("id", "part"), "part")
    }
    Snapshots.vacuum(spark, root, keepVersions = 2, graceMs = 0L)
    val ex = intercept[IllegalStateException] {
      ChangeFeed.consume(spark, root, "ship")(collect)
    }
    assert(ex.getMessage.contains("vacuum"))
  }

  test("copy-on-write merge over a DV'd table materializes deletes for the files it rewrites") {
    val root = freshRoot("snap_dv_cow")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 1).coalesce(1).write.partitionBy("part").parquet(stage))
    SnapshotOps.mergeOnRead(spark, root,
      Seq(("a", 0L, 0L, "delete")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    // a copy-on-write merge touching partition a rewrites its file: the
    // rewrite read subtracts the DV, and the replaced file's DV rows drop
    val v3 = SnapshotOps.merge(spark, root,
      Seq(("a", 1L, 777L, "upsert")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    assert(Snapshots.fileDvs(spark, root, v3).isEmpty,
      "the rewritten file's DV rows must drop with it")
    val got = rowsOf(Snapshots.readSnapshot(spark, root, Some(v3)))
    val want = (rowsOf(fixture("a" -> 1, "b" -> 1))
      .filterNot(r => r._1 == "a" && r._2 <= 1L) ++ Seq(("a", 1L, 777L)))
      .sortBy(r => (r._1, r._2))
    assert(got == want)
  }

  test("incremental view maintenance stays exact across a merge-on-read batch") {
    val root = freshRoot("snap_dv_ivm")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 2).coalesce(1).write.partitionBy("part").parquet(stage))
    val v2 = SnapshotOps.mergeOnRead(spark, root,
      Seq(("a", 0L, 0L, "delete"), ("a", 1L, 500L, "upsert"),
        ("c", 99L, 9L, "upsert")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    // view(v1) ⊕ signed Δ(v1→v2) must equal the full v2 recompute — the
    // u19 identity, now with the delta carried by DELETION VECTORS (the
    // removed rows come from the DV delta path, not file churn)
    val base = Snapshots.readSnapshot(spark, root, Some(v1))
      .groupBy("part").agg(count(lit(1)).as("n"), sum(col("v")).as("vs"))
    val delta = Snapshots.snapshotChanges(spark, root, v1, v2)
      .withColumn("sgn", when(col("change") === "added", 1L).otherwise(-1L))
      .groupBy("part")
      .agg(sum(col("sgn")).as("n"), sum(col("v") * col("sgn")).as("vs"))
    val maintained = graft.ops.Aggregates.mergePartialAggs(Seq(base, delta),
        Seq("part"), Seq("n", "vs"))
      .filter(col("n") > 0)
      .select("part", "n", "vs").as[(String, Long, Long)]
      .collect().sortBy(_._1).toSeq
    val full = Snapshots.readSnapshot(spark, root, Some(v2))
      .groupBy("part").agg(count(lit(1)).as("n"), sum(col("v")).as("vs"))
      .select("part", "n", "vs").as[(String, Long, Long)]
      .collect().sortBy(_._1).toSeq
    assert(maintained == full, s"IVM drifted: $maintained vs $full")
  }

  test("optimize across a DV'd table materializes rewritten files' vectors, carries the rest") {
    val root = freshRoot("snap_dv_opt")
    // partition a: fragmented (12 files, will compact); partition b: one
    // file (won't qualify) — DVs land in BOTH
    Snapshots.publishPartitions(spark, root) { stage =>
      fixture("a" -> 1).repartition(12).write.partitionBy("part").parquet(stage)
      fixture("b" -> 2).coalesce(1).write.mode("append")
        .partitionBy("part").parquet(stage)
    }
    SnapshotOps.mergeOnRead(spark, root,
      Seq(("a", 3L, 3L, "delete"), ("b", 5L, 10L, "delete"))
        .toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    val before = rowsOf(Snapshots.readSnapshot(spark, root))
    val v3 = SnapshotOps.optimize(spark, root, targetFileBytes = 1L << 30)
      .getOrElse(fail("the fragmented partition must qualify"))
    assert(rowsOf(Snapshots.readSnapshot(spark, root, Some(v3))) == before,
      "optimize over a DV'd table must preserve the DV-subtracted content")
    // partition a's rewrite subtracted its DV (rows drop with the files);
    // partition b's file was untouched, so its DV row must carry
    val dv3 = Snapshots.fileDvs(spark, root, v3)
      .getOrElse(fail("the untouched partition's vector must survive"))
    val dvFiles = dv3.select(col("file")).distinct().as[String].collect().toSeq
    assert(dvFiles.forall(_.startsWith("part=b/")),
      s"only the untouched partition's vectors may remain: $dvFiles")
  }

  test("snapshotRowCount answers COUNT(*) from the manifest across every verb") {
    val root = freshRoot("snap_rows")
    val v1 = Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1, "b" -> 2).coalesce(1).write.partitionBy("part").parquet(stage))
    def scanCount(v: Long): Long = Snapshots.readSnapshot(spark, root, Some(v)).count()
    assert(Snapshots.snapshotRowCount(spark, root, Some(v1)) == scanCount(v1))
    // DV delete: listing count subtracts the pending positions
    val v2 = SnapshotOps.mergeOnRead(spark, root,
      (0L until 7L).map(i => ("a", i, i, "delete")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    assert(Snapshots.snapshotRowCount(spark, root, Some(v2)) == scanCount(v2))
    val det = Snapshots.tableDetail(spark, root)
    assert(det.version == v2 && det.numRows == scanCount(v2) && det.pendingDeletes == 7L)
    // copy-on-write merge: replaced file re-records, fresh file records
    val v3 = SnapshotOps.merge(spark, root,
      Seq(("b", 50L, 1L, "upsert")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    assert(Snapshots.snapshotRowCount(spark, root, Some(v3)) == scanCount(v3))
    // purge + rollback + clone all stay listing-exact
    SnapshotOps.purgeDeletes(spark, root).foreach { vp =>
      assert(Snapshots.snapshotRowCount(spark, root, Some(vp)) == scanCount(vp))
    }
    val vr = Snapshots.rollbackTo(spark, root, v2)
    assert(Snapshots.snapshotRowCount(spark, root, Some(vr)) == scanCount(vr))
    val cloneRoot = freshRoot("snap_rows_clone")
    Snapshots.cloneTable(spark, root, cloneRoot)
    assert(Snapshots.snapshotRowCount(spark, cloneRoot) ==
      Snapshots.readSnapshot(spark, cloneRoot).count())
    // LEGACY manifest (published before the #rows header): strip the
    // header lines in place — the verb must footer-read the gap, same
    // answer, still zero data IO
    val mf = new Path(s"$root/_manifests/" + f"v$vr%012d.manifest")
    val lines = scala.io.Source.fromInputStream(fs(root).open(mf), "UTF-8")
      .getLines().filterNot(_.startsWith("#rows=")).toList
    val out = fs(root).create(mf, true)
    out.write((lines.mkString("\n") + "\n").getBytes("UTF-8")); out.close()
    assert(Snapshots.fileRows(spark, root, vr).isEmpty, "fixture must be rows-free")
    assert(Snapshots.snapshotRowCount(spark, root, Some(vr)) == scanCount(vr))
  }

  test("publishWithDeletes refuses a stale file target; vacuum reaps old DV sidecars") {
    val root = freshRoot("snap_dv_guard")
    Snapshots.publishPartitions(spark, root)(stage =>
      fixture("a" -> 1).coalesce(1).write.partitionBy("part").parquet(stage))
    val bogus = Seq(("part=a/pub-gone-0.snappy.parquet", 0L)).toDF("file", "pos")
    val ex = intercept[IllegalArgumentException] {
      Snapshots.publishWithDeletes(spark, root, bogus)(_ => ())
    }
    assert(ex.getMessage.contains("stale file list"))
    assert(Snapshots.latestVersion(spark, root).contains(1L),
      "a refused DV publish must not commit (and must release its claim)")
    // vacuum: DV sidecars of dropped versions reap, survivors keep theirs
    val v2 = SnapshotOps.mergeOnRead(spark, root,
      Seq(("a", 0L, 0L, "delete")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    val v3 = SnapshotOps.mergeOnRead(spark, root,
      Seq(("a", 1L, 1L, "delete")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    val v4 = SnapshotOps.mergeOnRead(spark, root,
      Seq(("a", 2L, 2L, "delete")).toDF("part", "id", "v", "op"),
      Seq("id", "part"), "part")
    assert(Seq(v2, v3, v4).forall(v => Snapshots.fileDvs(spark, root, v).nonEmpty))
    Snapshots.vacuum(spark, root, keepVersions = 2, graceMs = 0L)
    assert(Snapshots.fileDvs(spark, root, v2).isEmpty, "v2 DV sidecar must be reaped")
    assert(Snapshots.fileDvs(spark, root, v3).nonEmpty)
    assert(Snapshots.fileDvs(spark, root, v4).nonEmpty)
    assert(rowsOf(Snapshots.readSnapshot(spark, root)) ==
      rowsOf(fixture("a" -> 1)).filterNot(_._2 <= 2L))
  }
}
