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
