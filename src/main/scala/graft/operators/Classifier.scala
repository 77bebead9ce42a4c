package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Hashed-feature linear text classification — the fastText / quality-
  * classifier inference shape every modern pretraining pipeline runs over
  * its whole corpus (FineWeb-Edu, DCLM, RedPajama quality gates): featurize
  * each document as hashed unigrams + word bigrams, look up one weight per
  * hash bucket, sum, threshold.
  *
  * The scale shape is the point. Scoring is ONE narrow projection — a HOF
  * fold over the token array with the bucket→weight lookup inlined as
  * expressions — so a corpus pass has zero shuffles and stays inside
  * whole-stage codegen: feature hashing (the "hashing trick",
  * Weinberger et al., arXiv:0902.2206) means no vocabulary join at all.
  * A production deployment with learned weights swaps [[weightExpr]] for an
  * `element_at(broadcast-map, bucket)` lookup (the weight table is dims
  * entries — driver/index scale, like the IVF codebook collect); everything
  * else — featurization, bucketing, the fold, the gate — is unchanged.
  *
  * Engine-exact: bucket ids come from md5 prefixes (the catalog's sketch
  * family arithmetic, every intermediate < 2^63), weights are integer
  * milli-units derived from md5 of the bucket id (a deterministic stand-in
  * with the same lookup shape a learned table would have), and the score is
  * a BIGINT sum — bit-exact in any engine, order-independent, so the DuckDB
  * oracle replays classification verbatim.
  */
object HashClassifier {

  /** Feature bucket in [0, dims): first 8 md5 hex chars of the feature
    * string as an integer (< 2^32, exact in BIGINT on both engines).
    */
  def bucketExpr(feature: Column, dims: Int): Column = {
    require(dims > 0, "dims must be positive")
    conv(substring(md5(feature.cast("binary")), 1, 8), 16, 10).cast("long") % dims
  }

  /** Deterministic per-bucket weight in milli-units, range [-1000, 1000]:
    * md5("w:" + bucket) re-hashed into a signed integer. Stands in for a
    * learned weight row with identical lookup cost and exact arithmetic.
    */
  def weightExpr(bucket: Column): Column =
    conv(substring(md5(concat(lit("w:"), bucket.cast("string")).cast("binary")), 1, 8),
      16, 10).cast("long") % 2001 - 1000

  /** Unigram + word-bigram feature strings of a text column (bigrams are
    * space-joined token pairs — [[TextFns.strictWordShingles]]).
    */
  def features(text: Column): Column = {
    val toks = TextFns.tokens(lower(text))
    concat(toks, TextFns.strictWordShingles(toks, 2))
  }

  /** Score every document: n_features, the exact milli-unit score (sum of
    * bucket weights over all feature OCCURRENCES — fastText semantics, no
    * dedup), the per-feature mean (one double division) and the keep gate
    * (score ≥ threshold). Zero shuffles; the fold is O(tokens) per row.
    *
    * Execution: features materialize ONCE (a two-step projection —
    * CollapseProject will not inline a non-cheap alias used twice), and
    * the per-feature hash→bucket→weight→sum loop runs as the custom
    * [[graft.plans.Sketches.ClassifierScore]] expression: identical
    * arithmetic to [[weightExpr]]∘[[bucketExpr]] (the SQL the oracle
    * replays), ~20× faster than the interpreted HOF fold (the MinHash
    * lesson — see SketchExpressions' scaladoc).
    */
  def score(
      df: DataFrame,
      id: String,
      text: String,
      dims: Int = 4096,
      thresholdMilli: Long = 0L): DataFrame = {
    graft.plans.Sketches.ensureRegistered(df.sparkSession)
    // tokens materialize ONCE (two-step projection — CollapseProject will
    // not inline a non-cheap alias used twice); the expression derives
    // unigram + bigram features itself, so no interpreted HOF ever runs.
    // n_features = n + (n-1 | 0) tokens+bigrams, same count size(features)
    // would give.
    df.select(col(id), TextFns.tokens(lower(col(text))).as("__toks"))
      .select(
        col(id),
        (size(col("__toks")) + greatest(size(col("__toks")) - 1, lit(0)))
          .as("n_features"),
        call_function("graft_classifier_score", col("__toks"), lit(dims))
          .as("score_milli"))
      .withColumn("mean_milli",
        when(col("n_features") > 0,
          col("score_milli").cast("double") / col("n_features").cast("double")))
      .withColumn("keep", col("score_milli") >= thresholdMilli)
  }
}
