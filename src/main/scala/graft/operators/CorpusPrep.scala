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

  /** Corpus-level boilerplate line removal (the C4 / RefinedWeb /
    * CCNet-style pass): a LINE that appears verbatim — compared trimmed —
    * in at least `minDocs` distinct documents is boilerplate (navigation
    * chrome, cookie banners, license footers) and is dropped from every
    * document; all other lines are kept in their original order. Returns
    * one row per input document: (id, clean_text, n_lines, n_removed),
    * with clean_text = '' when every line was boilerplate.
    *
    * Scale shape: one explode + one hash aggregate on the trimmed line key
    * builds the boilerplate dictionary. For real boilerplate the dictionary
    * is small (repeated chrome has few distinct lines), and AQE will pick a
    * broadcast anti join at runtime from its ACTUAL size — the join is
    * deliberately left hint-free, because the dictionary is only small for
    * well-behaved corpora: at minDocs=2 over a multi-billion-doc crawl,
    * every sentence that appears twice anywhere qualifies, the set can
    * reach 10⁸⁺ rows, and a forced broadcast() hint would OOM the driver
    * (the same AQE-owns-the-decision posture as Dedup.spanOverlapStats).
    * The rebuild is one groupBy(id) with an order-pinned array_sort —
    * collect_list order is nondeterministic under parallel merge, so the
    * line position is carried in a struct and sorted before joining. Empty
    * lines are never boilerplate (they are document structure, and counting
    * '' would link every paragraph break corpus-wide). Null `text` fails
    * loudly (assert_true), matching the globalShuffle/bloom/tar posture —
    * split(null) would otherwise silently drop the document from the line
    * explode and emit ('', null, null).
    */
  def stripBoilerplate(
      df: DataFrame,
      id: String,
      text: String,
      minDocs: Long): DataFrame = {
    require(minDocs >= 2, "minDocs < 2 would flag every non-empty line")
    val reserved = Set("clean_text", "n_lines", "n_removed").intersect(df.columns.toSet)
    require(reserved.isEmpty,
      s"input columns collide with the output contract: ${reserved.mkString(", ")}")
    val guardedText = when(col(text).isNotNull, col(text))
      .otherwise(assert_true(col(text).isNotNull,
        lit(s"stripBoilerplate: null $text (document would silently vanish)")).cast("string"))
    val lines = df.select(col(id),
      posexplode(split(guardedText, "\n")).as(Seq("__pos", "__line")))
    val boiler = lines
      .filter(trim(col("__line")) =!= "")
      .groupBy(trim(col("__line")).as("__k"))
      .agg(countDistinct(col(id)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select("__k")
    val kept = lines.join(boiler, trim(lines("__line")) === boiler("__k"), "left_anti")
    val rebuilt = kept
      .groupBy(col(id))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__pos"), col("__line")))),
            s => s.getField("__line")),
          "\n").as("clean_text"),
        count(lit(1)).as("__n_kept"))
    df.select(col(id), size(split(guardedText, "\n")).cast("long").as("n_lines"))
      .join(rebuilt, Seq(id), "left")
      .select(col(id),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_lines"),
        (col("n_lines") - coalesce(col("__n_kept"), lit(0L))).as("n_removed"))
  }
}
