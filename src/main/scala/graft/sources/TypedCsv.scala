package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Typed CSV scan/sink (SURVEY S1/S2/S4).
  *
  * The reference reads every CSV with explicit per-column types and
  * projection (readr::cols_only, data-raw/run_prepare_Scenarios_
  * AnalysisInput.R:36-49) and writes goldens with write_csv
  * (run_workflow.R:264-272). Spark mapping: schema-on-read (no inference
  * pass — at 100 TB an inference scan is a full extra read), column
  * pruning at the scan, and a sink that sorts before writing so golden
  * files are deterministic (R row order is sequential; Spark's is not).
  */
object TypedCsv {

  /** S1: header CSV with declared schema; `wanted` projects (and prunes)
    * to the reference's cols_only subset.
    */
  def read(
      spark: SparkSession,
      path: String,
      schema: StructType,
      wanted: Seq[String] = Nil,
      delimiter: String = ","): DataFrame = {
    val df = spark.read
      .option("header", "true")
      .option("delimiter", delimiter) // S2: `;`-delimited variants
      .schema(schema)
      .csv(path)
    if (wanted.isEmpty) df else df.select(wanted.map(col): _*)
  }

  /** S1 lenient variant for untrusted feeds: PERMISSIVE mode with the
    * raw malformed line captured in `_corrupt_record` instead of the
    * default null-out (or a FAILFAST abort). At 100 TB a single mangled
    * row must neither kill the job nor vanish silently — the caller splits
    * on `_corrupt_record IS NULL` and routes the rejects to a quarantine
    * sink. (The rejects filter requires a non-pruned scan of the corrupt
    * column, which Spark handles via the cache-free PERMISSIVE path.)
    */
  def readLenient(
      spark: SparkSession,
      path: String,
      schema: StructType,
      delimiter: String = ","): DataFrame = {
    val withCorrupt = schema.add("_corrupt_record", "string")
    spark.read
      .option("header", "true")
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .schema(withCorrupt)
      .csv(path)
  }

  /** S4: deterministic single-file CSV sink — sort by the table's unique
    * index, then coalesce(1). Only for golden/export tables (the reference
    * writes result CSVs of at most ~10^6 rows); large outputs stay
    * parquet + partitioned.
    */
  def writeGolden(df: DataFrame, sortKeys: Seq[String], path: String): Unit =
    df.coalesce(1) // single partition FIRST, then an in-partition sort:
      .sortWithinPartitions(sortKeys.map(col): _*) // total order by construction
      .write.mode("overwrite")
      .option("header", "true")
      .csv(path)
}
