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
    // recorded coverage is keyed by the PHYSICAL names of the files that
    // recorded it — map through the rename chain so a rewrite after a
    // renameColumn re-derives stats/blooms under the current names
    // (fresh files only have those) instead of silently decaying coverage
    val meta = Snapshots.manifestMeta(spark, root, v)
    def logical(phys: String): String =
      Snapshots.columnMapping(meta)._1.foldLeft(phys)((cur, m) =>
        if (m._1 == cur) m._2 else cur)
    def logicalSpec(spec: String): String = spec.split(',').map(logical).mkString(",")
    val stats =
      if (statsCols.nonEmpty) statsCols
      else Snapshots.fileStats(spark, root, v).map(s => logical(s._2)).distinct
    val blooms =
      if (bloomCols.nonEmpty) bloomCols
      else Snapshots.fileBlooms(spark, root, v)
        .map(_.select(col("col")).distinct().collect()
          .map(r => logicalSpec(r.getString(0))).toSeq)
        .getOrElse(Nil)
    (stats, blooms)
  }

  /** Refuse a batch whose NEW rows violate the persisted table
    * constraints — the loud pre-gate of verbs that mix new rows into a
    * content-preserving rewrite (merge) or pair them with deletion
    * vectors (mergeOnRead/updateWhere). Quarantining inside the commit
    * would silently turn an update into a DELETE (the vector lands, the
    * replacement doesn't), so these statements are all-or-nothing; the
    * rewrite side then publishes with gateConstraints = false (re-gating
    * rows that were gated when they ENTERED the table would let a
    * maintenance rewrite delete long-committed rows that predate a
    * constraint — setConstraints documents no retro-scan).
    */
  private def requireConstraintsClean(
      spark: SparkSession, root: String, rows: DataFrame, verb: String): Unit = {
    val cons = Snapshots.tableConstraints(spark, root)
    if (cons.nonEmpty) {
      val bad = rows.filter(
        cons.map(c => not(coalesce(expr(c._2), lit(false)))).reduce(_ || _)).count()
      require(bad == 0,
        s"$verb under $root: $bad row(s) of the batch violate the table " +
          s"constraints (${cons.map(_._1).mkString(", ")}) — refusing the whole " +
          "statement (partial application would corrupt update semantics); " +
          "fix the batch or the constraints")
    }
  }


  /** Layout helpers for NESTED partition identities (`a=1/b=2`, r13):
    * the rewrite verbs derive the table's true partition-column sequence
    * from the manifest (never from caller arguments), compare partitions
    * in raw-value space via a NUL-joined composite key (partition values
    * cannot carry NUL — hive dir names are path segments), and write
    * with the full `partitionBy(cols...)` list, so optimize / zorder /
    * merge / purge work identically on flat and nested tables.
    */
  private def partColsOf(part: String): Seq[String] =
    part.split('/').toSeq.map(_.takeWhile(_ != '='))

  private def layoutOf(parts: Iterable[String], verb: String): Seq[String] = {
    val all = parts.map(partColsOf).toSet
    require(all.size == 1,
      s"$verb: partitions disagree on their column layout: " +
        all.take(3).map(_.mkString("/")).mkString(" vs "))
    all.head
  }

  /** A partition identity's raw values as one composite key (null
    * partition level -> the reserved default name, matching [[partKey]]).
    */
  private def partValuesKey(part: String): String =
    part.split('/').toSeq.map(seg =>
      Snapshots.unescapePartValue(seg.dropWhile(_ != '=').drop(1))).mkString("\u0000")

  /** Row-side composite key matching [[partValuesKey]]. */
  private def partKeyExpr(of: String => Column, cols: Seq[String]): Column =
    concat_ws("\u0000", cols.map(c => partKey(of(c))): _*)

  /** Partition dir names and their (fileCount, totalBytes) in a pinned
    * version — listing-scale (one getFileStatus per manifest entry).
    */
  private def partitionProfile(
      spark: SparkSession,
      root: String,
      version: Long): Map[String, (Int, Long)] = {
    val fs = fsOf(spark, new Path(root))
    Snapshots.manifestFiles(spark, root, version)
      .groupBy(f => Snapshots.partitionOf(f))
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
      .filter(f => frag.contains(Snapshots.partitionOf(f)))
    val partCols = layoutOf(frag.keys, "optimize")
    // mapping-aware read: a table compacted after a renameColumn spans
    // physical generations — the rewrite reads the LOGICAL schema and
    // its fresh files land under the current names
    val src0 = Snapshots.readMapped(spark, root, v, files)
    // a fragmented subset may cover ONLY the null partition, whose
    // dir-value inference degrades the partition column to VOID — restore
    // the table's types from the full-version schema before the
    // partitioned write (schema-only read: no data job)
    val fullSchema = Snapshots.readSnapshot(spark, root, Some(v)).schema
    val src = partCols.foldLeft(src0)((d, c) =>
      d.withColumn(c, col(c).cast(fullSchema(c).dataType)))
    // dir names are hive-ESCAPED and a null value writes the reserved
    // default dir; the join compares in dir-key space via partKey per
    // LEVEL, so ':' partitions compact and null-partition rows are never
    // dropped — one row per fragmented leaf, broadcast
    val binSchema = org.apache.spark.sql.types.StructType(
      partCols.indices.map(i => org.apache.spark.sql.types.StructField(
        s"__pv_$i", org.apache.spark.sql.types.StringType, nullable = true)) :+
        org.apache.spark.sql.types.StructField("__bins",
          org.apache.spark.sql.types.IntegerType, nullable = false))
    val binRows = frag.toSeq.map { case (p, (_, bytes)) =>
      org.apache.spark.sql.Row.fromSeq(
        p.split('/').toSeq.map(seg =>
          Snapshots.unescapePartValue(seg.dropWhile(_ != '=').drop(1))) :+ bins(bytes))
    }
    val binsDf = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](
        scala.jdk.CollectionConverters.SeqHasAsJava(binRows).asJava), binSchema)
    val joinCond = partCols.zipWithIndex
      .map { case (c, i) => partKey(src(c)) === col(s"__pv_$i") }
      .reduce(_ && _)
    val totalBins = frag.valuesIterator.map { case (_, bytes) => bins(bytes) }.sum
    Some(Snapshots.publishPartitions(spark, root,
      meta = Map("optimize_of" -> v.toString),
      statsCols = statsAuto, bloomCols = bloomAuto,
      expectedPrev = Some(v), gateConstraints = false) { stage =>
      // range-shuffle on (partition levels, bin): every (leaf, bin) pair
      // owns its task, so a partition's file count lands at exactly its
      // bin count — a plain hash repartition could collapse distinct bins
      // into one writer task (or worse, one file)
      src.join(broadcast(binsDf), joinCond)
        .withColumn("__bin",
          pmod(xxhash64(src.columns.map(col): _*), col("__bins")))
        .repartitionByRange(totalBins, (partCols.map(col) :+ col("__bin")): _*)
        .drop(partCols.indices.map(i => s"__pv_$i") :+ "__bins" :+ "__bin": _*)
        .write.partitionBy(partCols: _*).parquet(stage)
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
    val partCols = layoutOf(profile.keys, "optimizeZorder")
    val totalBytes = profile.valuesIterator.map(_._2).sum
    val bins = math.max(1, math.ceil(totalBytes.toDouble / targetFileBytes).toInt)
    val src = Snapshots.readMapped(spark, root, v,
      Snapshots.manifestFiles(spark, root, v))
    Snapshots.publishPartitions(spark, root,
      meta = Map("zorder_of" -> v.toString,
        "zorder_by" -> s"${zCols._1},${zCols._2}"),
      statsCols = statsAuto, bloomCols = bloomAuto,
      expectedPrev = Some(v), gateConstraints = false) { stage =>
      src
        .withColumn("__z",
          graft.functions.Layout.zValue(col(zCols._1), col(zCols._2)))
        .repartitionByRange(bins, (partCols.map(col) :+ col("__z")): _*)
        .sortWithinPartitions((partCols.map(col) :+ col("__z")): _*)
        .drop("__z")
        .write.partitionBy(partCols: _*).parquet(stage)
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
    *   - source rows with `opCol` = 'delete' remove the matching target
    *     row (by `keyCols`);
    *   - other source rows REPLACE their matching target row (update) or
    *     are inserted when no match exists;
    *   - target rows with no matching source key are untouched.
    *
    * Scale shape — FILE-grain rewrite: the commit replaces only the
    * FILES that might hold a matching target key; every sibling file —
    * including siblings inside the same partition — carries over via the
    * manifest, unread and unmoved, and the surviving source rows land as
    * additive fresh files. At 100 TB with date-grain partitions, a
    * 100-key CDC batch rewrites ~100 files, not 100 whole partitions.
    * Candidate files come from the bloom sidecar when the table indexes
    * the key — the single key column, or the COMPOSITE spec
    * (`bloomCols = Seq("k1,k2")` at publish) whose column set equals
    * `keyCols`; the probe hashes in the STORED column types (xxhash64 is
    * type-typed — an Int-keyed source against a Long-keyed table would
    * otherwise bloom-miss every file: silently lost deletes). No data
    * file opens to find the candidates; false positives only cost a
    * content-preserving extra file rewrite. Without an index the
    * fallback is an exact column-pruned key scan annotated with file
    * identity — still file-grain, one pass over the key column.
    * A delete that empties a partition (every file replaced, no
    * surviving rows) drops it from the manifest (`dropPartitions`).
    * Updates may MOVE a row across partitions — the old file is
    * replaced, the new row lands additively, both in the same commit, so
    * no version ever shows the row twice or zero times.
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
    // probe keys cast to the STORED key types (see scaladoc: typed hashes)
    val tgtSchema = target.schema
    val srcKeys = source.select(keyCols.map(k =>
      col(k).cast(tgtSchema(k).dataType).as(k)): _*).distinct()
    val allFiles = Snapshots.manifestFiles(spark, root, v)
    // the table's TRUE layout comes from the manifest: on a nested table
    // `partitionCol` names the first level and the staged write carries
    // every level (the source must hold the full schema anyway)
    val partCols = layoutOf(allFiles.map(Snapshots.partitionOf), "merge")
    require(partCols.head == partitionCol,
      s"merge: partitionCol '$partitionCol' does not match the table layout " +
        s"(${partCols.mkString("/")})")
    val candidateFiles =
      candidateKeyFiles(spark, root, v, srcKeys, keyCols, allFiles)
    val survivors = source.filter(not(col(opCol) === "delete")).drop(opCol)
    if (candidateFiles.isEmpty && survivors.isEmpty) {
      if (allowNoop) return v
      require(requirement = false, "merge: source matches nothing and inserts nothing")
    }
    // new rows pre-gate loudly; the rewrite publishes ungated (re-staged
    // old rows were gated when they entered — see requireConstraintsClean)
    requireConstraintsClean(spark, root, survivors, "merge")
    // the replaced files' new content: their rows not superseded by a
    // source key, plus ALL surviving (insert/update) source rows —
    // staged additively into their partitions. Materialized once: the
    // `still` probe below and the staged write both consume it.
    val rewritten =
      if (candidateFiles.isEmpty) survivors
      else Snapshots.readMapped(spark, root, v, candidateFiles)
        .join(broadcast(srcKeys), keyCols, "left_anti")
        .unionByName(survivors)
    // lazy checkpoint: the `still` probe's collect is the first action —
    // one job materializes AND probes (see purgeDeletes)
    val merged = rewritten.localCheckpoint(false)
    // partitions whose every file is replaced and which no merged row
    // re-populates drop from the manifest (dir names are hive-escaped;
    // `still` lives in raw-value space via the composite partition key,
    // one segment per layout level)
    val still = merged.select(partKeyExpr(col, partCols).as("__pk"))
      .distinct().collect().map(_.getString(0)).toSet
    val candSet = candidateFiles.toSet
    val emptied = allFiles
      .groupBy(f => Snapshots.partitionOf(f))
      .collect { case (dir, fls) if fls.forall(candSet.contains) &&
          !still.contains(partValuesKey(dir)) => dir }
      .toSeq.sorted
    // keep the table's stat/bloom coverage: fresh files re-index the
    // same columns (unindexed fresh files would stay exact but decay
    // every future probe to conservative planning)
    val (statCols, bloomColsOf) = inheritedCols(spark, root, v, Nil, Nil)
    Snapshots.publishFileReplacement(spark, root,
      replaceFiles = candidateFiles,
      meta = Map("merge_into" -> v.toString),
      statsCols = statCols, bloomCols = bloomColsOf,
      dropPartitions = emptied, expectedPrev = Some(v),
      gateConstraints = false) { stage =>
      if (still.nonEmpty)
        merged.write.partitionBy(partCols: _*).parquet(stage)
    }
  }

  /** The files of version `v` that MIGHT hold a key matching `srcKeys`
    * (already cast to the stored key types): bloom-probed when the table
    * indexes the key — the single key column, or the composite spec
    * whose column set equals `keyCols` — opening NO data file; else one
    * exact column-pruned key scan with file identity. False positives
    * only. Shared by [[merge]] (rewrite unit) and [[mergeOnRead]]
    * (position-probe unit), so the two merge shapes can never drift on
    * candidate discovery.
    */
  private def candidateKeyFiles(
      spark: SparkSession,
      root: String,
      v: Long,
      srcKeys: DataFrame,
      keyCols: Seq[String],
      allFiles: Seq[String]): Seq[String] = {
    val bloomSpecs: Seq[String] = Snapshots.fileBlooms(spark, root, v)
      .map(_.select(col("col")).distinct().collect().map(_.getString(0)).toSeq)
      .getOrElse(Nil)
    val spec: Option[String] =
      if (keyCols.size == 1 && bloomSpecs.contains(keyCols.head)) Some(keyCols.head)
      else bloomSpecs.find(sp =>
        sp.contains(',') && sp.split(',').toSeq.sorted == keyCols.sorted)
    val candFromBloom: Option[Seq[String]] = spec.flatMap { sp =>
      // composite probe = the same canonical xxhash64-of-columns the
      // publish-side builder indexed (Snapshots.bloomValueCol), over the
      // typed keys
      val probe =
        if (!sp.contains(',')) srcKeys.select(col(sp))
        else srcKeys.select(xxhash64(sp.split(',').map(col).toSeq: _*).as("__h"))
      Snapshots.bloomCandidateFiles(spark, root, v, sp, probe)
    }
    candFromBloom.getOrElse {
      // exact fallback: one column-pruned pass over the key columns with
      // row identity (the `_metadata`-based scan — per-relation, so it
      // composes with a DV'd table's union read, where input_file_name
      // cannot), semi-joined against the batch keys. Deletion vectors
      // are NOT subtracted here: a file whose only matches are dead rows
      // becomes a false-POSITIVE candidate, which both merge shapes
      // tolerate by construction.
      val byRel = allFiles.map(f => Snapshots.relSuffix(f) -> f).toMap
      Snapshots.readMappedWithPos(spark, root, v, allFiles)
        .select((keyCols.map(col) :+ col("__file")): _*)
        .join(broadcast(srcKeys), keyCols, "left_semi")
        .select("__file").distinct().collect().map(_.getString(0)).toSeq
        .map(sfx => byRel.getOrElse(sfx,
          throw new IllegalStateException(
            s"merge: scanned file '$sfx' maps to no manifest line under $root")))
    }
  }

  /** Keyed three-way MERGE-ON-READ: same semantics as [[merge]] (delete /
    * update / insert by `keyCols`), but matched target rows die by
    * DELETION VECTOR — their (file, row-position) pairs land in the
    * version's `_dv` sidecar — instead of rewriting their files, and
    * surviving source rows land as additive fresh files. The commit
    * moves ~|batch| rows of sidecar and fresh data, NO existing data
    * file opens for rewrite and none moves: at 100 TB this is the shape
    * for frequent small CDC batches, where [[merge]]'s copy-on-write
    * would grind candidate files all day. Reads subtract the positions
    * (cost proportional to PENDING deletes) until [[purgeDeletes]]
    * materializes them — schedule it from the maintenance loop like
    * [[optimize]]. Same OCC (`expectedPrev`) and constraint gating as
    * every other write verb; same bloom candidate discovery as [[merge]]
    * (the position probe scans only candidate files).
    */
  def mergeOnRead(
      spark: SparkSession,
      root: String,
      source: DataFrame,
      keyCols: Seq[String],
      partitionCol: String,
      opCol: String = "op",
      allowNoop: Boolean = false): Long = {
    require(keyCols.nonEmpty, "mergeOnRead needs at least one key column")
    val v = Snapshots.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"mergeOnRead: no published version under $root"))
    val target = Snapshots.readSnapshot(spark, root, Some(v))
    val tgtSchema = target.schema
    val srcKeys = source.select(keyCols.map(k =>
      col(k).cast(tgtSchema(k).dataType).as(k)): _*).distinct()
    val allFiles = Snapshots.manifestFiles(spark, root, v)
    // the table's TRUE layout comes from the manifest: on a nested table
    // `partitionCol` names the first level and the staged write carries
    // every level (the source must hold the full schema anyway)
    val partCols = layoutOf(allFiles.map(Snapshots.partitionOf), "merge")
    require(partCols.head == partitionCol,
      s"merge: partitionCol '$partitionCol' does not match the table layout " +
        s"(${partCols.mkString("/")})")
    val candidateFiles =
      candidateKeyFiles(spark, root, v, srcKeys, keyCols, allFiles)
    // every matched LIVE target position within the candidate files —
    // the column-pruned row-identity scan, minus the already-dead
    // positions, so a replayed delete-only batch (at-least-once
    // semantics) correctly detects "nothing live matches" and no-ops
    // instead of committing an empty version per replay
    val deletes: Option[DataFrame] =
      if (candidateFiles.isEmpty) None
      else {
        val scan0 = Snapshots.readMappedWithPos(spark, root, v, candidateFiles)
        val scan = Snapshots.fileDvs(spark, root, v).fold(scan0)(dv =>
          scan0.join(dv.select(col("file").as("__file"), col("pos").as("__pos")),
            Seq("__file", "__pos"), "left_anti"))
        // lazy checkpoint + count: ONE job materializes the pinned blocks
        // AND answers the emptiness probe (the eager-checkpoint + isEmpty
        // spelling ran two)
        val d = scan
          .join(broadcast(srcKeys), keyCols, "left_semi")
          .select(col("__file").as("file"), col("__pos").as("pos"))
          .localCheckpoint(false)
        if (d.count() == 0) None else Some(d)
      }
    val surv = source.filter(not(col(opCol) === "delete")).drop(opCol)
      .localCheckpoint(false)
    val hasSurv = surv.count() > 0
    if (deletes.isEmpty && !hasSurv) {
      if (allowNoop) return v
      require(requirement = false, "mergeOnRead: source matches nothing and inserts nothing")
    }
    // all-or-nothing: a violating upsert must fail HERE, before the DV
    // lands — quarantining the replacement mid-commit would silently
    // turn the update into a delete
    if (hasSurv) requireConstraintsClean(spark, root, surv, "mergeOnRead")
    val (statCols, bloomColsOf) = inheritedCols(spark, root, v, Nil, Nil)
    deletes match {
      case None =>
        // insert-only: a plain additive file-grain commit, no sidecar
        Snapshots.publishFileReplacement(spark, root, replaceFiles = Nil,
          meta = Map("merge_into" -> v.toString),
          statsCols = statCols, bloomCols = bloomColsOf,
          expectedPrev = Some(v), gateConstraints = false) { stage =>
          surv.write.partitionBy(partitionCol).parquet(stage)
        }
      case Some(d) =>
        Snapshots.publishWithDeletes(spark, root, d,
          meta = Map("merge_into" -> v.toString),
          statsCols = statCols, bloomCols = bloomColsOf,
          expectedPrev = Some(v), gateConstraints = false) { stage =>
          if (hasSurv) surv.write.partitionBy(partitionCol).parquet(stage)
        }
    }
  }

  /** Row-level DELETE by arbitrary predicate, merge-on-read: one
    * column-pruned row-identity scan flags the matching LIVE rows (the
    * predicate's columns + file/position — never the full width), their
    * positions commit as deletion vectors, and no data file opens for
    * rewrite. The predicate-shaped twin of [[mergeOnRead]]'s keyed
    * deletes — stat/bloom pruning cannot serve an arbitrary predicate,
    * so the scan walks the manifest's file list, which is exactly what
    * `DELETE FROM t WHERE p` costs anywhere; the COMMIT still moves only
    * sidecar bytes. Returns the committed version; a predicate matching
    * nothing is an error unless `allowNoop` (idempotent retries).
    */
  def deleteWhere(
      spark: SparkSession,
      root: String,
      predicate: Column,
      allowNoop: Boolean = false): Long = {
    val v = Snapshots.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"deleteWhere: no published version under $root"))
    val files = Snapshots.manifestFiles(spark, root, v)
    val scan0 = Snapshots.readMappedWithPos(spark, root, v, files)
    val scan = Snapshots.fileDvs(spark, root, v).fold(scan0)(dv =>
      scan0.join(dv.select(col("file").as("__file"), col("pos").as("__pos")),
        Seq("__file", "__pos"), "left_anti"))
    // lazy checkpoint + count: one job materializes AND probes emptiness
    val d = scan.filter(predicate)
      .select(col("__file").as("file"), col("__pos").as("pos"))
      .localCheckpoint(false)
    if (d.count() == 0) {
      if (allowNoop) return v
      require(requirement = false, s"deleteWhere: no live row matches under $root")
    }
    Snapshots.publishWithDeletes(spark, root, d,
      meta = Map("delete_where" -> predicate.toString.replace('\n', ' ')),
      expectedPrev = Some(v), gateConstraints = false)(_ => ())
  }

  /** Row-level UPDATE by arbitrary predicate, merge-on-read: the matching
    * LIVE rows die by deletion vector and their transformed versions
    * (`set` columns replaced, all others carried) land as one additive
    * fresh file set — `UPDATE t SET c = expr WHERE p` without rewriting
    * any existing data file. One row-identity scan finds the victims;
    * the same scan's rows (full width this time) feed the re-insert, so
    * the verb costs one table pass + ~|matched| rows of write — the
    * copy-on-write alternative rewrites every matched FILE. Updating the
    * partition column moves rows across partitions (the DV kills the old
    * position; the staged write lands the new dir). Returns the committed
    * version; no match is loud unless `allowNoop`.
    */
  def updateWhere(
      spark: SparkSession,
      root: String,
      predicate: Column,
      set: Map[String, Column],
      partitionCol: String,
      allowNoop: Boolean = false): Long = {
    require(set.nonEmpty, "updateWhere: empty SET clause")
    val v = Snapshots.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"updateWhere: no published version under $root"))
    val files = Snapshots.manifestFiles(spark, root, v)
    val scan0 = Snapshots.readMappedWithPos(spark, root, v, files)
    val scan = Snapshots.fileDvs(spark, root, v).fold(scan0)(dv =>
      scan0.join(dv.select(col("file").as("__file"), col("pos").as("__pos")),
        Seq("__file", "__pos"), "left_anti"))
    // lazy checkpoint + count: one job materializes AND probes emptiness
    val matched = scan.filter(predicate).localCheckpoint(false)
    if (matched.count() == 0) {
      if (allowNoop) return v
      require(requirement = false, s"updateWhere: no live row matches under $root")
    }
    val d = matched.select(col("__file").as("file"), col("__pos").as("pos"))
    val updated = set.foldLeft(matched.drop("__file", "__pos")) {
      case (df, (c, e)) => df.withColumn(c, e)
    }
    // the transformed rows must satisfy the constraints BEFORE the old
    // positions die — otherwise the update silently becomes a delete
    requireConstraintsClean(spark, root, updated, "updateWhere")
    Snapshots.publishWithDeletes(spark, root, d,
      meta = Map("update_where" -> predicate.toString.replace('\n', ' ')),
      expectedPrev = Some(v), gateConstraints = false) { stage =>
      updated.write.partitionBy(partitionCol).parquet(stage)
    }
  }

  /** Materialize pending deletion vectors: rewrite ONLY the files the
    * latest version's `_dv` sidecar lists (each file's survivors land as
    * fresh files; siblings carry verbatim), clearing the sidecar — the
    * maintenance verb that bounds the read-side DV tax after a run of
    * [[mergeOnRead]] batches. A partition whose every file is purged to
    * zero survivors drops from the manifest. Content-preserving by
    * construction (the rewrite IS the DV-subtracted read). Returns
    * Some(newVersion), or None when nothing is pending — an idle
    * maintenance tick commits nothing.
    */
  def purgeDeletes(spark: SparkSession, root: String): Option[Long] = {
    val v = Snapshots.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(s"purgeDeletes: no published version under $root"))
    val dv = Snapshots.fileDvs(spark, root, v).getOrElse(return None)
    val dvFiles = dv.select(col("file")).distinct()
      .collect().map(_.getString(0)).toSet
    val files = Snapshots.manifestFiles(spark, root, v)
      .filter(f => dvFiles.contains(Snapshots.relSuffix(f)))
    if (files.isEmpty) return None
    val partCols = layoutOf(files.map(Snapshots.partitionOf), "purgeDeletes")
    // lazy checkpoint: the `still` probe's collect below is the first
    // action, so ONE job materializes the pinned survivor blocks and
    // answers the probe (eager spelling ran a separate checkpoint job)
    val survivors = Snapshots.readMapped(spark, root, v, files).localCheckpoint(false)
    val still = survivors.select(partKeyExpr(col, partCols).as("__pk"))
      .distinct().collect().map(_.getString(0)).toSet
    val candSet = files.toSet
    val emptied = Snapshots.manifestFiles(spark, root, v)
      .groupBy(f => Snapshots.partitionOf(f))
      .collect { case (dir, fls) if fls.forall(candSet.contains) &&
          !still.contains(partValuesKey(dir)) => dir }
      .toSeq.sorted
    val (statCols, bloomColsOf) = inheritedCols(spark, root, v, Nil, Nil)
    Some(Snapshots.publishFileReplacement(spark, root,
      replaceFiles = files,
      meta = Map("purge_of" -> v.toString),
      statsCols = statCols, bloomCols = bloomColsOf,
      dropPartitions = emptied, expectedPrev = Some(v),
      gateConstraints = false) { stage =>
      if (still.nonEmpty)
        survivors.write.partitionBy(partCols: _*).parquet(stage)
    })
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
    // lazy checkpoint + ONE aggregate job for both counts (the eager
    // spelling ran a checkpoint job + two count jobs): the agg is the
    // first action, so it materializes the pinned blocks the quarantine
    // and clean writes then read
    val cached = flagged.localCheckpoint(false)
    val quarantined = cached.filter(col("violated") =!= "")
    val clean = cached.filter(col("violated") === "").drop("violated")
    val counts = cached.agg(
      count(when(col("violated") =!= "", 1)).as("q"),
      count(when(col("violated") === "", 1)).as("c")).head()
    val nQuar = counts.getLong(0)
    val nClean = counts.getLong(1)
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

  /** The dead-letter rows a version's PERSISTED table constraints
    * ([[Snapshots.setConstraints]]) quarantined at its publish (empty
    * when the batch was clean) — resolved through the manifest's
    * `constraint_quarantine_dir` metadata, with the failed constraint
    * names in the `violated` column.
    */
  def readConstraintQuarantine(
      spark: SparkSession,
      root: String,
      version: Long): Option[DataFrame] =
    Snapshots.manifestMeta(spark, root, version).get("constraint_quarantine_dir")
      .map(q => spark.read.parquet(s"$root/${Snapshots.QuarantineDir}/$q"))
}
