package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Table loaders for the driver-generated parquet fixtures (TESTDATA.md).
  *
  * Mirrors the reference's schema-on-read discipline
  * (reference: data-raw/run_prepare_Scenarios_AnalysisInput.R:36-49 reads every
  * CSV with explicit per-column types) — parquet carries its own schema, so the
  * discipline here is *projection*: callers select the columns they need and
  * Catalyst prunes the scan (`ReadSchema` in explain output).
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Collision-proof suffix for scratch paths / catalog table names keyed
    * by a dataset dir. Int `hashCode` can collide two different dirs onto
    * one path (cross-contaminated read-backs, DROP TABLE races); 16 hex
    * chars of md5 make an accidental collision astronomically unlikely
    * while staying a valid identifier fragment.
    */
  def pathKey(d: String): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(d.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
  }

  def region(s: SparkSession, d: String): DataFrame     = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = t(s, d, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    * reader rejects; with spark.sql.legacy.parquet.nanosAsLong=true it
    * arrives as a nanos long — convert via integer division (a double
    * division of an epoch-nanos int64 would lose precision past 2^53).
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = t(s, d, "events")
    // the fixture's ts physical type has varied across driver versions:
    // TIMESTAMP(NANOS) (read as LONG under nanosAsLong) and timestamp[us]
    // without timezone (read as TIMESTAMP_NTZ). Normalize both to the
    // session-TZ TIMESTAMP every consumer (unix_micros, window casts)
    // expects — sessions run UTC, so the NTZ cast is micros-preserving
    // and matches DuckDB's naive reading of the same column.
    raw.schema("ts").dataType match {
      case LongType => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame  = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = t(s, d, "embeddings")
}
