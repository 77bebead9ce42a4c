package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table-maintenance and write-shaping verbs built ON the manifest-commit
  * layer ([[Snapshots]]): bin-packed small-file compaction (OPTIMIZE),
  * keyed three-way MERGE, and constraint-gated publish with quarantine.
  * Each commits through the same atomic manifest rename as a plain
  * publish, so pinned readers never observe a half-applied verb and
  * every verb is undoable with [[Snapshots.rollbackTo]].
  */
object SnapshotOps {

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Hive's reserved dir name for a NULL partition value — comparisons
    * between dir names and data values must treat them as the same key
    * (a raw equality would silently drop null-partition rows from every
    * maintenance rewrite).
    */
  private val NullPart = "__HIVE_DEFAULT_PARTITION__"

  /** A partition column as the string key hive dir names use: the cast
    * value, with NULL mapped to the reserved default-partition name.
    */
  private def partKey(c: Column): Column =
    coalesce(c.cast("string"), lit(NullPart))

  /** The stat/bloom columns a rewrite should re-derive: the caller's
    * explicit list, else whatever the table already records — ONE
    * definition so optimize/zorder/merge can never drift apart on
    * coverage inheritance.
    */
  private def inheritedCols(
      spark: SparkSession,
      root: String,
      v: Long,
      statsCols: Seq[String],
      bloomCols: Seq[String]): (Seq[String], Seq[String]) = {
    val stats =
      if (statsCols.nonEmpty) statsCols
      else Snapshots.fileStats(spark, root, v).map(_._2).distinct
    val blooms =
      if (bloomCols.nonEmpty) bloomCols
      else Snapshots.fileBlooms(spark, root, v)
        .map(_.select(col("col")).distinct().collect().map(_.getString(0)).toSeq)
        .getOrElse(Nil)
    (stats, blooms)
  }

  /** Partition dir names and their (fileCount, totalBytes) in a pinned
    * version — listing-scale (one getFileStatus per manifest entry).
    */
  private def partitionProfile(
      spark: SparkSession,
      root: String,
      version: Long): Map[String, (Int, Long)] = {
    val fs = fsOf(spark, new Path(root))
    Snapshots.manifestFiles(spark, root, version)
      .groupBy(f => Snapshots.relSuffix(f).takeWhile(_ != '/'))
      .map { case (part, files) =>
        val bytes = files
          .map(f => fs.getFileStatus(new Path(Snapshots.resolveLine(root, f)._2)).getLen)
          .sum
        part -> (files.size, bytes)
      }
  }

  /** OPTIMIZE: rewrite partitions fragmented by repeated appends or
    * small publishes into bin-packed files of ~`targetFileBytes`,
    * committed as one atomic version. Content-preserving by
    * construction (the rewrite is a read→repartition→write of the same
    * rows); older versions keep their (immutable) small files until
    * [[Snapshots.vacuum]] reaps them.
    *
    * Scale shape: the partitions to compact are picked from the MANIFEST
    * LISTING (a partition qualifies when its file count exceeds what its
    * byte size needs, by `minWaste` files) — no data IO decides; the
    * rewrite then reads ONLY the qualifying partitions' files and
    * shuffles each partition's rows into its computed bin count
    * (`pmod(xxhash64(whole row), bins)`), so one oversized partition
    * still packs into many parallel files while small ones collapse to
    * one. IO is proportional to the fragmented fraction, never the
    * table. Carries forward the stat/bloom columns the table already
    * indexes (fresh files re-derive footer stats; bloom words rebuild
    * from the same one scan discipline as publish).
    *
    * Returns Some(newVersion) or None when nothing qualified (no commit
    * at all — an idle maintenance tick is free). Carries `expectedPrev`
    * (see [[merge]]): a concurrent commit fails the compaction loudly —
    * rerun the tick.
    */
  def optimize(
      spark: SparkSession,
      root: String,
      targetFileBytes: Long = 128L << 20,
      minWaste: Int = 2,
      statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Option[Long] = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val v = Snapshots.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"optimize: no published version under $root"))
    // keep the table's index coverage by DEFAULT: unless the caller
    // overrides, rewritten partitions' fresh files re-derive the stat
    // and bloom columns the table already records (the merge discipline
    // — a default maintenance tick must not decay skipping to
    // conservative planning)
    val (statsAuto, bloomAuto) = inheritedCols(spark, root, v, statsCols, bloomCols)
    val profile = partitionProfile(spark, root, v)
    def bins(bytes: Long): Int =
      math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val frag = profile.filter { case (_, (n, bytes)) => n >= bins(bytes) + minWaste }
    if (frag.isEmpty) return None
    val files = Snapshots.manifestFiles(spark, root, v)
      .filter(f => frag.contains(Snapshots.relSuffix(f).takeWhile(_ != '/')))
    val partCol = frag.keysIterator.next().takeWhile(_ != '=')
    val src0 = Snapshots.readFileGroups(spark, root, files)
    // a fragmented subset may cover ONLY the null partition, whose
    // dir-value inference degrades the partition column to VOID — restore
    // the table's type from the full-version schema before the
    // partitioned write (schema-only read: no data job)
    val partType = Snapshots.readSnapshot(spark, root, Some(v)).schema(partCol).dataType
    val src = src0.withColumn(partCol, col(partCol).cast(partType))
    import spark.implicits._
    // dir names are hive-ESCAPED and a null value writes the reserved
    // default dir; the join compares in dir-key space via partKey, so
    // ':' partitions compact and null-partition rows are never dropped
    val binsDf = frag.toSeq
      .map { case (p, (_, bytes)) =>
        (Snapshots.unescapePartValue(p.dropWhile(_ != '=').drop(1)), bins(bytes))
      }
      .toDF("__pv", "__bins")
    val totalBins = frag.valuesIterator.map { case (_, bytes) => bins(bytes) }.sum
    Some(Snapshots.publishPartitions(spark, root,
      meta = Map("optimize_of" -> v.toString),
      statsCols = statsAuto, bloomCols = bloomAuto,
      expectedPrev = Some(v)) { stage =>
      // range-shuffle on (partition, bin): every (part, bin) pair owns
      // its task, so a partition's file count lands at exactly its bin
      // count — a plain hash repartition could collapse distinct bins
      // into one writer task (or worse, one file)
      src.join(broadcast(binsDf), partKey(src(partCol)) === col("__pv"))
        .withColumn("__bin",
          pmod(xxhash64(src.columns.map(col): _*), col("__bins")))
        .repartitionByRange(totalBins, col(partCol), col("__bin"))
        .drop("__pv", "__bins", "__bin")
        .write.partitionBy(partCol).parquet(stage)
    })
  }

  /** OPTIMIZE ZORDER: rewrite the whole table (every partition, one
    * atomic version) clustered by the Morton z-value of two numeric
    * columns, so the recorded per-file footer ranges (`statsCols`)
    * become narrow on BOTH columns at once and
    * [[Snapshots.readSnapshotRange]] prunes files for predicates on
    * EITHER — the multi-dimensional upgrade over single-column range
    * clustering (which serves one column and scatters the other). The
    * table's existing stat/bloom coverage carries by default, with the
    * z columns added to the stat set (they are the point of the verb).
    *
    * Scale shape: one (partition, z) range shuffle into
    * ceil(bytes/targetFileBytes) writer tasks + an in-task sort — two
    * passes over the data, same as any clustering rewrite; commits with
    * `expectedPrev` (see [[merge]]), so a concurrent commit fails the
    * rewrite loudly instead of being lost. z interleaves the LOW 16 bits
    * of each column (`functions.Layout.zValue`) — pre-bucket wider
    * domains onto 0..65535 first.
    */
  def optimizeZorder(
      spark: SparkSession,
      root: String,
      zCols: (String, String),
      targetFileBytes: Long = 128L << 20,
      statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): Long = {
    require(targetFileBytes > 0, "targetFileBytes must be positive")
    val v = Snapshots.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"optimizeZorder: no published version under $root"))
    val (stats0, bloomAuto) = inheritedCols(spark, root, v, statsCols, bloomCols)
    val statsAuto = (stats0 ++ Seq(zCols._1, zCols._2)).distinct
    val profile = partitionProfile(spark, root, v)
    val partCol = profile.keysIterator.next().takeWhile(_ != '=')
    val totalBytes = profile.valuesIterator.map(_._2).sum
    val bins = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val src = Snapshots.readFileGroups(spark, root,
      Snapshots.manifestFiles(spark, root, v))
    Snapshots.publishPartitions(spark, root,
      meta = Map("zorder_of" -> v.toString,
        "zorder_by" -> s"${zCols._1},${zCols._2}"),
      statsCols = statsAuto, bloomCols = bloomAuto,
      expectedPrev = Some(v)) { stage =>
      src
        .withColumn("__z",
          graft.functions.Layout.zValue(col(zCols._1), col(zCols._2)))
        .repartitionByRange(bins, col(partCol), col("__z"))
        .sortWithinPartitions(col(partCol), col("__z"))
        .drop("__z")
        .write.partitionBy(partCol).parquet(stage)
    }
  }

  /** Keyed three-way MERGE (upsert + delete) committed atomically.
    * Read-modify-write: the commit carries `expectedPrev`, so an
    * interleaved commit by another writer fails THIS merge loudly
    * (java.util.ConcurrentModificationException — re-read and retry)
    * instead of silently losing the other writer's update on shared
    * partitions. The streaming sink gets the retry for free (a failed
    * micro-batch replays).
    *
    *
    *   - source rows with `opCol` = 'delete' remove the matching target
    *     row (by `keyCols`);
    *   - other source rows REPLACE their matching target row (update) or
    *     are inserted when no match exists;
    *   - target rows with no matching source key are untouched.
    *
    * Scale shape: the rewrite touches only AFFECTED partitions — those
    * holding a matching target key (found with a column-pruned
    * key+partition scan, broadcast-joined against the source keys when
    * small) plus those the surviving source rows land in. Everything
    * else carries over via the manifest, unread and unmoved. A delete
    * that empties a partition drops it from the manifest
    * (`dropPartitions`), which a staged parquet tree alone cannot
    * express. Updates may MOVE a row across partitions (the old
    * partition is affected via its matching key, the new via the source
    * row) — both rewrite in the same commit, so no intermediate version
    * ever shows the row twice or zero times.
    *
    * `source` must carry `keyCols`, `partitionCol` and the full data
    * schema of the table (minus `opCol`, which is consumed here).
    * Returns the committed version.
    *
    * `allowNoop`: a source that matches nothing and inserts nothing is
    * an error by default (a batch caller merging nothing is almost
    * always a bug); the streaming sink sets it true because an
    * at-least-once REPLAY of a delete-only batch legitimately finds its
    * keys already gone — the no-op returns the current version with no
    * commit.
    */
  def merge(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      opCol: String = "op",
      allowNoop: Boolean = false): Long = {
    require(keyCols.nonEmpty, "merge needs at least one key column")
    val v = Snapshots.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"merge: no published version under $root"))
    val target = Snapshots.readSnapshot(spark, root, Some(v))
    val srcKeys = source.select(keyCols.map(col): _*).distinct()
    // which target partitions hold a matching key: when the table keeps a
    // bloom sidecar on the (single) key column, the probe is a sidecar
    // membership join — no data file opens at all (a CDC batch against a
    // 100 TB table must not pay a full key scan to find its partitions;
    // false positives only cost a content-preserving extra rewrite).
    // Otherwise, a column-pruned key+partition scan.
    val bloomProbe: Option[Set[String]] =
      if (keyCols.size != 1) None
      else Snapshots.bloomCandidateFiles(spark, root, v, keyCols.head,
          srcKeys.select(col(keyCols.head)))
        // candidate file -> its partition VALUE: rel suffixes are
        // "<partitionCol>=<escaped-value>/part-..." (relSuffix handles
        // clone lines; unescape because everything downstream compares
        // in raw-value space)
        .map(_.map(f => Snapshots.unescapePartValue(
          Snapshots.relSuffix(f).takeWhile(_ != '/').dropWhile(_ != '=').drop(1))).toSet)
    // all partition values compare in dir-KEY space (partKey: cast to
    // string, null mapped to the reserved default-partition name) — a
    // raw cast would NPE on escape and silently drop null-partition rows
    val matchedParts = bloomProbe.getOrElse {
      target
        .select((partitionCol +: keyCols).map(col): _*)
        .join(broadcast(srcKeys), keyCols)
        .select(partKey(col(partitionCol)).as("__pk"))
        .distinct().collect().map(_.getString(0)).toSet
    }
    val survivors = source.filter(not(col(opCol) === "delete")).drop(opCol)
    val insertedParts = survivors.select(partKey(col(partitionCol)).as("__pk"))
      .distinct().collect().map(_.getString(0)).toSet
    val affected = matchedParts ++ insertedParts
    if (affected.isEmpty && allowNoop) return v
    require(affected.nonEmpty, "merge: source matches nothing and inserts nothing")
    val affectedCol = partKey(col(partitionCol)).isin(affected.toSeq: _*)
    // the affected partitions' new content: target rows not superseded
    // by a source key, plus the surviving (insert/update) source rows
    val keptTarget = target.filter(affectedCol)
      .join(broadcast(srcKeys), keyCols, "left_anti")
    // materialized once: the `still` probe below and the staged write
    // both consume it — without the checkpoint the heaviest stage of
    // every merge (and every streaming micro-batch) would run twice
    val merged = keptTarget.unionByName(survivors.filter(affectedCol))
      .localCheckpoint(true)
    // partitions whose content is now EMPTY (all rows deleted) cannot be
    // staged — they drop from the manifest instead (dir names are
    // hive-escaped; `still`/`affected` live in raw-value space)
    val still = merged.select(partKey(col(partitionCol)).as("__pk"))
      .distinct().collect().map(_.getString(0)).toSet
    val emptied = (affected -- still).toSeq.sorted
      .map(p => s"$partitionCol=${Snapshots.escapePartValue(p)}")
    val statCols = Snapshots.fileStats(spark, root, v).map(_._2).distinct
    // keep the table's bloom coverage: rewritten partitions' fresh files
    // re-index the same columns (unindexed fresh files would stay exact
    // but decay every future probe to conservative planning)
    val bloomColsOf = Snapshots.fileBlooms(spark, root, v)
      .map(_.select(col("col")).distinct().collect().map(_.getString(0)).toSeq)
      .getOrElse(Nil)
    Snapshots.publishPartitions(spark, root,
      meta = Map("merge_into" -> v.toString),
      statsCols = statCols, bloomCols = bloomColsOf,
      dropPartitions = emptied, expectedPrev = Some(v)) { stage =>
      if (still.nonEmpty)
        merged.write.partitionBy(partitionCol).parquet(stage)
    }
  }

  /** A named row-level expectation for [[publishExpect]]. */
  final case class Expect(name: String, predicate: Column)

  /** Constraint-gated publish: stage `df`, but commit ONLY the rows that
    * satisfy every expectation; violating rows go to
    * `<root>/_quarantine/<dir>` (bound to the version via the manifest's
    * `quarantine_dir` metadata — written BEFORE the commit, so a crash
    * loses the uncommitted version, never the dead letters; read back
    * with [[readQuarantine]]) with a `violated` column naming the
    * failed expectations (comma-joined, declaration order) — the
    * dead-letter pattern of s19 composed with the atomic commit, so a
    * bad batch can neither poison the table nor vanish silently. The
    * committed manifest records `expect_total/expect_clean/
    * expect_quarantined` counts in its metadata — the audit trail a
    * scheduled loader alarms on.
    *
    * One pass decides (the `violated` array builds from codegen'd
    * predicates — no second scan of df); `uniqueKey`, when given, also
    * quarantines every row of any key that appears more than once in the
    * CLEAN set (both copies — a loader must not silently pick one).
    * Returns (version, quarantined row count).
    */
  def publishExpect(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      partitionBy: String,
      expectations: Seq[Expect],
      uniqueKey: Seq[String] = Nil,
      statsCols: Seq[String] = Nil,
      bloomCols: Seq[String] = Nil): (Long, Long) = {
    require(expectations.nonEmpty || uniqueKey.nonEmpty,
      "publishExpect with no expectations and no unique key is publishPartitions")
    val named = expectations.map(e =>
      when(not(coalesce(e.predicate, lit(false))), lit(e.name)))
    val flagged0 = df.withColumn("violated",
      concat_ws(",", array_compact(array(named: _*))))
    val flagged = uniqueKey match {
      case Nil => flagged0
      case keys =>
        // keys counted over the rows that are otherwise clean: a row
        // already quarantined by a predicate must not drag its key's
        // clean twin out with it
        val w = org.apache.spark.sql.expressions.Window.partitionBy(
          (keys.map(col) :+ (col("violated") === "")): _*)
        flagged0
          .withColumn("__kn", count(lit(1)).over(w))
          .withColumn("violated",
            when(col("violated") === "" && col("__kn") > 1, lit("unique_key"))
              .otherwise(col("violated")))
          .drop("__kn")
    }
    val cached = flagged.localCheckpoint(true)
    val quarantined = cached.filter(col("violated") =!= "")
    val clean = cached.filter(col("violated") === "").drop("violated")
    val nQuar = quarantined.count()
    val nClean = clean.count()
    require(nClean > 0, "publishExpect: every row violated — refusing an empty publish")
    // quarantine BEFORE the commit: a crash between the two must lose
    // the (uncommitted) version, never the dead-letter rows — the
    // manifest's quarantine_dir meta binds the two atomically, and a
    // crash-orphaned dir (written, never referenced) is vacuum residue
    val quarName = s"q-${java.util.UUID.randomUUID().toString.take(12)}"
    if (nQuar > 0)
      quarantined.write.mode("errorifexists")
        .parquet(s"$root/${Snapshots.QuarantineDir}/$quarName")
    val quarMeta = if (nQuar > 0) Map("quarantine_dir" -> quarName) else Map.empty
    val version = Snapshots.publishPartitions(spark, root,
      meta = Map(
        "expect_total" -> (nClean + nQuar).toString,
        "expect_clean" -> nClean.toString,
        "expect_quarantined" -> nQuar.toString) ++ quarMeta,
      statsCols = statsCols, bloomCols = bloomCols) { stage =>
      clean.write.partitionBy(partitionBy).parquet(stage)
    }
    (version, nQuar)
  }

  /** The dead-letter rows of a [[publishExpect]] version (empty when the
    * version quarantined nothing) — resolved through the manifest's
    * `quarantine_dir` metadata, the committed binding between a version
    * and its rejects.
    */
  def readQuarantine(
      spark: SparkSession,
      root: String,
      version: Long): Option[DataFrame] =
    Snapshots.manifestMeta(spark, root, version).get("quarantine_dir")
      .map(q => spark.read.parquet(s"$root/${Snapshots.QuarantineDir}/$q"))
}
