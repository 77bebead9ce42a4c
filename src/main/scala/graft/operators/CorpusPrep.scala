package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** The minimal COMPLETE corpus-prep pass a training pipeline runs before
  * writing shard manifests, as one composition: quality gate → exact dedup
  * → deterministic global shuffle → fixed-size shards → per-shard manifest.
  *
  * Every stage is deterministic and engine-portable (md5, never rand() or
  * engine-private hashes), so the WHOLE composite carries a bit-exact
  * DuckDB oracle — unlike the sketch-based `Dedup.dedupCorpus`, whose LSH
  * candidates have no SQL twin. Shuffle/shard semantics come from
  * [[Sampling.globalShuffle]] (two-level rank, no single-reducer window).
  *
  * Scale shape: the token gate is narrow (pushes to the scan), the dedup is
  * one shuffle on the content hash, the shuffle is one shuffle on the
  * hash-prefix bucket + a broadcast offsets join, and the manifest is a
  * partial-aggregated groupBy over the shard id — four stages, three
  * shuffles, no driver-side loops, nothing O(N²).
  */
object CorpusPrep {

  /** Per-document prep result: survivors only, each with its token count,
    * global shuffle position and shard id.
    */
  def prepare(
      docs: DataFrame,
      id: String,
      text: String,
      minTokens: Int,
      maxTokens: Int,
      rowsPerShard: Long,
      nBuckets: Int = 1024): DataFrame = {
    require(minTokens >= 0 && maxTokens >= minTokens, "invalid token band")
    val kept = docs
      .withColumn("n_tokens", TextFns.tokenCount(col(text)))
      .filter(col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens)
    val survivors = Dedup.exactDedup(kept, id, text)
      .filter(!col("is_dup"))
      .select(col(id), col("n_tokens"))
    Sampling.globalShuffle(survivors, col(id), rowsPerShard, nBuckets)
  }

  /** Shard manifest over [[prepare]]'s output: one row per shard with its
    * document count, token total and first position — what a downstream
    * trainer reads to schedule work.
    */
  def manifest(prepared: DataFrame): DataFrame =
    prepared.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens").cast("long")).as("total_tokens"),
        min(col("pos")).as("first_pos"))
}
