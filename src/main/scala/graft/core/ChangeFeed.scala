package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Durable, at-least-once CONSUMPTION of a snapshot table's change feed —
  * the missing half of the CDC story: [[Snapshots.snapshotChanges]] can
  * diff any two versions, but a downstream job (index maintainer,
  * aggregate refresher, replication shipper) needs a persisted cursor so
  * every committed version is processed exactly once per consumer in the
  * steady state and a crash replays, never skips.
  *
  * The cursor is one small file per consumer under `<root>/_feeds/`
  * (invisible to parquet discovery), committed through the same
  * tmp+rename discipline as a manifest. [[consume]] hands the callback
  * `snapshotChanges(cursor → latest)` — IO proportional to the churn,
  * never the table — and advances the cursor ONLY after the callback
  * returns, so a consumer that crashes mid-batch re-reads its window on
  * the next tick (at-least-once; make the callback idempotent, e.g. a
  * keyed MERGE into the downstream table).
  *
  * Retention contract: the cursor must stay inside [[Snapshots.vacuum]]'s
  * keepVersions window. A consumer that falls behind the horizon fails
  * LOUDLY with a re-bootstrap instruction instead of silently losing the
  * gap's deletes (the adds it could still reconstruct; removed rows in
  * vacuumed versions are unrecoverable by design).
  */
object ChangeFeed {

  private val FeedDir = "_feeds"

  private def requireConsumerId(consumerId: String): Unit =
    require(consumerId.nonEmpty && consumerId.forall(c =>
      c.isLetterOrDigit || c == '-' || c == '_'),
      s"consumer id must be [A-Za-z0-9_-]+: '$consumerId'")

  private def feedDir(root: String): Path = new Path(s"$root/$FeedDir")

  /** Pre-r13 single-file cursor (`<consumer>.offset`) — still READ as a
    * fallback so existing consumers upgrade in place; the first advance
    * rewrites them into the monotonic scheme and GCs the legacy file.
    */
  private def legacyOffsetPath(root: String, consumerId: String): Path =
    new Path(feedDir(root), s"$consumerId.offset")

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The monotonic cursor files of a consumer: `<consumer>.<v>.offset`.
    * The consumer id charset excludes '.', so the parse is unambiguous.
    */
  private def offsetFiles(
      fs: org.apache.hadoop.fs.FileSystem,
      root: String,
      consumerId: String): Seq[(Long, Path)] = {
    val dir = feedDir(root)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap { st =>
      val n = st.getPath.getName
      if (st.isFile && n.startsWith(s"$consumerId.") && n.endsWith(".offset")) {
        val mid = n.stripPrefix(s"$consumerId.").stripSuffix(".offset")
        mid.toLongOption.map(_ -> st.getPath)
      } else None
    }
  }

  /** The consumer's persisted cursor: the newest version it has fully
    * processed. None before the first [[consume]].
    *
    * Cursor files are MONOTONICALLY NAMED (`<consumer>.<v>.offset`, max
    * wins, older ones GC'd after the new one is durable) — there is no
    * delete-then-rename window in which a crash drops the cursor and a
    * signed-aggregate consumer re-bootstraps the full snapshot as
    * 'added', double-counting the table (ADVICE r12). Any single-file
    * crash leaves either the old max or both; both is just a pending GC.
    */
  def currentOffset(spark: SparkSession, root: String, consumerId: String): Option[Long] = {
    requireConsumerId(consumerId)
    val fs = fsOf(spark, feedDir(root))
    val monotonic = offsetFiles(fs, root, consumerId).map(_._1).maxOption
    monotonic.orElse {
      val p = legacyOffsetPath(root, consumerId)
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .next().trim.toLong)
        finally in.close()
      }
    }
  }

  private def writeOffset(
      spark: SparkSession, root: String, consumerId: String, v: Long): Unit = {
    val dir = feedDir(root)
    val fs = fsOf(spark, dir)
    fs.mkdirs(dir)
    val p = new Path(dir, s"$consumerId.$v.offset")
    val tmp = new Path(dir, s".tmp-${java.util.UUID.randomUUID().toString.take(12)}")
    val out = fs.create(tmp, true)
    try out.write(s"$v\n".getBytes("UTF-8")) finally out.close()
    if (fs.exists(p)) fs.delete(tmp, false) // same cursor already durable
    else require(fs.rename(tmp, p), s"change feed: cursor commit failed for $consumerId")
    // GC strictly AFTER the new cursor is durable: a crash anywhere in
    // this loop leaves extra older files, and max() still reads the
    // committed cursor — never a silent re-bootstrap
    offsetFiles(fs, root, consumerId).filter(_._1 < v)
      .foreach { case (_, old) => fs.delete(old, false) }
    fs.delete(legacyOffsetPath(root, consumerId), false)
    ()
  }

  /** Drop a consumer's cursor — the explicit re-bootstrap verb. */
  def resetOffset(spark: SparkSession, root: String, consumerId: String): Unit = {
    requireConsumerId(consumerId)
    val fs = fsOf(spark, feedDir(root))
    offsetFiles(fs, root, consumerId).foreach { case (_, p) => fs.delete(p, false) }
    fs.delete(legacyOffsetPath(root, consumerId), false)
    ()
  }

  /** Process everything committed since this consumer's cursor.
    *
    *   - First call ever: `startAtLatest = false` (default) hands the
    *     callback the FULL current snapshot as 'added' rows (the
    *     bootstrap a downstream materialization needs); `true` skips the
    *     callback and just pins the cursor at latest (only new changes
    *     from now on).
    *   - Caught up (cursor == latest): returns None, callback not
    *     invoked — an idle tick is free (two listings).
    *   - Behind: callback gets `snapshotChanges(cursor, latest)` with the
    *     usual `change` column; on normal return the cursor advances to
    *     latest and (fromVersion, toVersion) returns.
    *
    * A cursor behind the vacuum horizon fails loudly — see class doc.
    */
  def consume(
      spark: SparkSession,
      root: String,
      consumerId: String,
      startAtLatest: Boolean = false)(f: DataFrame => Unit): Option[(Long, Long)] = {
    import org.apache.spark.sql.functions.lit
    val latest = Snapshots.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"change feed: no published version under $root"))
    currentOffset(spark, root, consumerId) match {
      case None =>
        if (!startAtLatest)
          f(Snapshots.readSnapshot(spark, root, Some(latest))
            .withColumn("change", lit("added")))
        writeOffset(spark, root, consumerId, latest)
        if (startAtLatest) None else Some((0L, latest))
      case Some(off) if off >= latest => None
      case Some(off) =>
        if (!Snapshots.manifestExists(spark, root, off))
          throw new IllegalStateException(
            s"change feed consumer '$consumerId' is pinned at version $off, which " +
              s"vacuum has already dropped under $root — the gap's removed rows are " +
              "unrecoverable; resetOffset + re-bootstrap the downstream state, and " +
              "raise keepVersions (or consume more often) so the cursor stays " +
              "inside the retention window")
        f(Snapshots.snapshotChanges(spark, root, off, latest))
        writeOffset(spark, root, consumerId, latest)
        Some((off, latest))
    }
  }
}
