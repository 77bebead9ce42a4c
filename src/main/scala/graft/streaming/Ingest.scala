package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming document ingestion — the continuous counterpart of the batch
  * incremental dedup (graft.operators.Dedup.exactIndex /
  * incrementalExactFlags): a corpus is deduplicated not once, but on every
  * arriving micro-batch.
  *
  * The join is STREAM-STATIC: the corpus index is a bounded (static) side
  * that Spark re-reads per micro-batch (or broadcasts when small), so no
  * streaming state accrues at all — in production the index lives in a
  * bucketed table keyed by the hash and is refreshed by the compaction job
  * that appends accepted batches. Intra-stream duplicates are handled by
  * the dropDuplicatesWithinWatermark stage (Events.dedupStream shape),
  * which bounds ITS state by the watermark horizon.
  */
object Ingest {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** File-source document stream (each discovered file = arriving docs). */
  def readDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Keep only documents whose normalized text hash is NOT in the corpus
    * index (Dedup.exactIndex shape: `text_hash`, `corpus_id`) — a
    * stream-static left-anti join, stateless on the stream side.
    */
  def noveltyFilter(stream: DataFrame, index: DataFrame, text: String = "text"): DataFrame =
    stream
      .withColumn("text_hash", md5(lower(trim(col(text)))))
      .join(index.select("text_hash"), Seq("text_hash"), "left_anti")
      .drop("text_hash")
}
