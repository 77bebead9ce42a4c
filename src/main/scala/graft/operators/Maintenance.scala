package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Table-maintenance operators (beyond-reference). At lake scale the
  * write path degrades silently: every incremental append (streaming
  * micro-batches, per-task output, over-partitioned shuffles) leaves
  * small files, and a 100 TB table fragmented into KB-scale files spends
  * its scan time on open/seek/footer overhead instead of column IO.
  * Periodic compaction is the standing fix.
  */
object Maintenance {

  final case class CompactionReport(
      filesBefore: Long,
      filesAfter: Long,
      bytes: Long,
      targetFileBytes: Long)

  private def parquetFiles(spark: SparkSession, dir: Path): Seq[Path] = {
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(dir, true)
    val out = scala.collection.mutable.ArrayBuffer[Path]()
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) out += f.getPath
    }
    out.toSeq
  }

  /** Rewrite the parquet table at `path` into ceil(bytes / targetFileBytes)
    * files (size-based, not count-based: the right file count follows from
    * the data volume, so the same call is correct at any scale). The
    * rewrite fully materializes into a staging dir BEFORE the old files
    * are replaced (same crash-safe swap protocol as the streaming upsert
    * sink); content is bit-identical, only the layout changes.
    *
    * For a hive-partitioned table pass its `partitionCols`: the rewrite
    * preserves the directory layout (and S10's pruning), repartitioning
    * by the partition columns so each output directory is written by the
    * tasks holding its rows — without it a partitioned table would
    * silently compact into a FLAT table and every partition-pruned read
    * would full-scan.
    */
  /** Partition retention sweep — the lifecycle DELETE of a partitioned
    * lakehouse table: drop every `partCol=<v>` directory whose integer
    * partition value is below `cutoff`, leave every other byte untouched.
    * Metadata-only in cost (one directory listing + per-dropped-partition
    * deletes — never reads or rewrites surviving data), which is what
    * makes time-based retention viable on a 100 TB table. Returns the
    * dropped partition values (sorted) so callers can log/audit the sweep.
    */
  def dropPartitionsBelow(
      spark: SparkSession,
      path: String,
      partCol: String,
      cutoff: Long): Seq[Long] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    val prefix = s"$partCol="
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith(prefix))
      .flatMap { st =>
        val v = st.getPath.getName.stripPrefix(prefix)
        scala.util.Try(v.toLong).toOption.filter(_ < cutoff).map { pv =>
          fs.delete(st.getPath, true)
          pv
        }
      }.sorted
  }

  def compactParquet(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long,
      partitionCols: Seq[String] = Nil): CompactionReport = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val dir = new Path(path)
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // repair any interrupted prior swap before reading the layout
    graft.core.StagedSwap.recover(spark, path)
    val before = parquetFiles(spark, dir)
    val bytes = before.map(p => fs.getFileStatus(p).getLen).sum
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val data = spark.read.parquet(path)
    graft.core.StagedSwap.replace(spark, path) { stage =>
      val writer =
        if (partitionCols.isEmpty) data.repartition(nOut).write
        else data
          .repartition(nOut, partitionCols.map(org.apache.spark.sql.functions.col): _*)
          .write.partitionBy(partitionCols: _*)
      writer.mode("overwrite").parquet(stage)
    }
    CompactionReport(before.size.toLong, parquetFiles(spark, dir).size.toLong,
      bytes, targetFileBytes)
  }

  /** Snapshot diff — CDC between two versions of a keyed table: every key
    * classified `added` / `removed` / `changed` / `unchanged` by one full
    * outer join on the keys plus NULL-SAFE (<=>) compares of the non-key
    * columns (no row hashing: hashing would have to pick a null/empty
    * encoding, and `<=>` is exactly SQL's IS NOT DISTINCT FROM, so the
    * oracle states the same thing verbatim). The daily question at corpus
    * scale — "what changed between crawls?" — for one shuffle on the key.
    *
    * Both sides must share a schema; output = coalesced keys, `status`,
    * and the old/new value columns (new side suffixed `__new`).
    */
  def snapshotDiff(
      old: org.apache.spark.sql.DataFrame,
      cur: org.apache.spark.sql.DataFrame,
      keys: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(old.columns.toSeq == cur.columns.toSeq,
      s"snapshot schemas differ: ${old.columns.toSeq} vs ${cur.columns.toSeq}")
    val valueCols = old.columns.toSeq.diff(keys)
    val inOld = graft.core.Cols.fresh(old.columns ++ cur.columns, "__in_old")
    val inNew = graft.core.Cols.fresh(old.columns ++ cur.columns :+ inOld, "__in_new")
    // collision-free rename suffix: an input that already carries a
    // "<v>__new" column must not be silently overwritten
    val suffix = Iterator.from(0)
      .map(i => if (i == 0) "__new" else s"__new_$i")
      .find(sfx => !valueCols.exists(v => old.columns.contains(v + sfx)))
      .get
    val o = old.withColumn(inOld, lit(true))
    val n = valueCols.foldLeft(cur.withColumn(inNew, lit(true))) {
      (d, v) => d.withColumnRenamed(v, v + suffix)
    }
    val sameVals =
      if (valueCols.isEmpty) lit(true)
      else valueCols.map(v => col(v) <=> col(v + suffix)).reduce(_ && _)
    o.join(n, keys, "full")
      .withColumn("status",
        when(col(inOld).isNull, "added")
          .when(col(inNew).isNull, "removed")
          .when(sameVals, "unchanged")
          .otherwise("changed"))
      .drop(inOld, inNew)
  }

  /** Incremental maintenance of a materialized JOIN view — the join twin
    * of `Aggregates.mergePartialAggs` (A16 maintains aggregates from
    * partials; this maintains `fact ⋈ dim` under a fact-side upsert batch
    * without re-running the join over history).
    *
    * Given the current view rows of `fact INNER JOIN dim ON joinKeys`
    * and a `delta` of upserted fact rows (replace-or-insert on
    * `factKeys`), the maintained view is
    * `(view ANTI delta ON factKeys) ∪ (delta ⋈ dim)` — provably equal to
    * recomputing with the upserted fact: every fact key is either
    * untouched (its view rows survive the anti join unchanged) or
    * replaced (its old rows drop, its new rows re-derive through the
    * dim join; a delta row with no dim match contributes nothing, exactly
    * as a recompute would).
    *
    * Cost shape at 100 TB: the history never re-joins — the dim-side
    * shuffle touches only |delta| rows, and the anti join against the
    * (small, typically broadcast) delta key set is a scan of the view
    * with a map-side filter, prunable further when the view is stored
    * partitioned/bucketed on a fact key prefix. A full recompute
    * shuffles |fact| + |dim| every refresh; this shuffles |delta|.
    *
    * `view` and `delta ⋈ dim` must be column-congruent: the caller
    * projects both to the view's schema (asserted loudly).
    */
  def maintainJoinView(
      view: org.apache.spark.sql.DataFrame,
      delta: org.apache.spark.sql.DataFrame,
      dim: org.apache.spark.sql.DataFrame,
      factKeys: Seq[String],
      joinKeys: Seq[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(factKeys.nonEmpty && joinKeys.nonEmpty, "need fact and join keys")
    require(factKeys.forall(view.columns.contains) && factKeys.forall(delta.columns.contains),
      s"factKeys $factKeys must exist in both view and delta")
    val fresh = delta.join(dim, joinKeys)
    require(view.columns.sorted.toSeq == fresh.columns.sorted.toSeq,
      s"view/delta⋈dim schemas differ: ${view.columns.sorted.toSeq} vs " +
        s"${fresh.columns.sorted.toSeq} — project both to the view schema")
    // no forced broadcast hint: a typical delta key set is small and AQE
    // will broadcast it from runtime stats, but a backfill-sized delta
    // must be allowed to shuffle (the tx_boilerplate lesson — a hard
    // hint on an unbounded side OOMs the driver at corpus scale)
    val survivors = view.join(delta.select(factKeys.map(col): _*).distinct(),
      factKeys, "left_anti")
    survivors.unionByName(fresh.select(view.columns.map(col).toSeq: _*))
  }
}
