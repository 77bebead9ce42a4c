package graft.core

import java.util.{Collections, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.execution.datasources.InMemoryFileIndex
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScanBuilder
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** The DataSource V2 face of a snapshot table (VERDICT r14 #6).
  *
  * `spark.read.format("graft")` resolves [[SnapshotSource]] as a
  * TableProvider and plans reads through this Table:
  *
  *  - FAST PATH (no deletion vectors, no column mapping, no cross-root
  *    clone lines): `newScanBuilder` hands Spark its own V2 parquet scan
  *    ([[ParquetScanBuilder]]) over an [[InMemoryFileIndex]] pinned to the
  *    manifest's exact file list — native vectorized reads, filter
  *    pushdown, partition pruning, pushed AGGREGATES
  *    (SupportsPushDownAggregates — a V2-only capability the V1 relation
  *    never had), runtime (dynamic-partition) filtering via the FileScan
  *    machinery, and scan statistics reported to Catalyst from the pinned
  *    index (SupportsReportStatistics via FileScan).
  *  - SEMANTIC PATH (DVs pending, renamed/dropped columns, clones,
  *    `insertable` views): [[capabilities]] omits BATCH_READ, so Spark's
  *    own loadV2Source falls back to the V1 relation ([[SnapshotSource
  *    .createRelation]]) — the plan-wrapping PrunedFilteredScan whose
  *    pushdown pins SnapshotSourceSpec keeps. Per-version dispatch: a
  *    purge tick returns the table to the native path.
  *
  * Writes stay on the V1 CreatableRelationProvider verbs (BATCH_WRITE is
  * never advertised): Spark's V2 path-based write refuses
  * ErrorIfExists/Ignore outright, while the layer's publish verbs give all
  * four SaveModes their universal semantics. [[partitioning]] still
  * surfaces the manifest's layout as identity transforms — catalogs and
  * `DESCRIBE`-style tooling see the table's true partitioning.
  */
final class GraftTable(
    spark: SparkSession,
    root: String,
    version: Long,
    val dataSchema: StructType,
    partitionSchema: StructType,
    index: InMemoryFileIndex,
    fastPath: Boolean) extends Table with SupportsRead {

  override def name(): String = s"graft:$root@v$version"

  override def schema(): StructType =
    StructType(dataSchema.fields ++
      partitionSchema.fields.filterNot(f => dataSchema.fieldNames.contains(f.name)))

  override def partitioning(): Array[Transform] =
    partitionSchema.fieldNames.map(Expressions.identity)

  override def capabilities(): JSet[TableCapability] =
    if (fastPath) Set[TableCapability](TableCapability.BATCH_READ).asJava
    else Collections.emptySet()

  // r15: reuse the index `resolve` already built and listed — the first
  // spelling constructed a SECOND InMemoryFileIndex here, re-listing every
  // pinned path (a driver pass, or a whole Spark listing job past the
  // parallel-discovery threshold) once per scan of an already-resolved
  // table
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    ParquetScanBuilder(spark, index, schema(), dataSchema, options)
}

object GraftTable {

  /** Resolve the (root, versionAsOf) options to a table instance; a root
    * with no published version yields None (the caller advertises nothing
    * and Spark falls back to the V1 path, which raises the layer's own
    * clear error or performs the initial publish).
    */
  def resolve(spark: SparkSession, options: CaseInsensitiveStringMap): Option[GraftTable] = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft source: 'path' option (the snapshot table root) is required"))
    val explicit = Option(options.get("versionAsOf")).map(_.trim.toLong)
    val version = explicit.orElse(Snapshots.latestVersion(spark, root))
      .getOrElse(return None)
    if (!Snapshots.manifestExists(spark, root, version)) return None
    val files = Snapshots.manifestFiles(spark, root, version)
    if (files.isEmpty) return None
    val meta = Snapshots.manifestMeta(spark, root, version)
    val (renames, drops) = Snapshots.columnMapping(meta)
    val hasDv = Snapshots.fileDvs(spark, root, version).isDefined
    val crossRoot = files.exists(f => Snapshots.resolveLine(root, f)._1 != root)
    val insertable = Option(options.get("insertable")).exists(_.equalsIgnoreCase("true"))
    val fast = !hasDv && renames.isEmpty && drops.isEmpty && !crossRoot && !insertable
    val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    // qualified like every other pinned read — the shared cache is keyed
    // by the path AS PASSED
    val paths = files.map(f => fsys.makeQualified(new Path(Snapshots.resolveLine(root, f)._2)))
    // the session's SHARED FileStatusCache client (Snapshots.fileStatusCache,
    // guide §6): repeated reads of the same pinned version skip the
    // re-listing, and a version the publisher just landed is already warm —
    // stale entries are impossible because published files are immutable
    // and every publish lands fresh pub-<uuid> names
    val index = new InMemoryFileIndex(
      spark, paths, Map("basePath" -> root), userSpecifiedSchema = None,
      fileStatusCache = Snapshots.fileStatusCache(spark))
    val dataSchema = new ParquetFileFormat().inferSchema(
      spark, Map.empty[String, String], index.allFiles()).getOrElse(
      throw new IllegalStateException(
        s"graft source: could not infer schema of version $version under $root"))
    Some(new GraftTable(spark, root, version, dataSchema,
      index.partitionSchema, index, fast))
  }
}
