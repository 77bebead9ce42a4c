package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything here derives from a hash of a stable key — never `rand()`:
  * a non-deterministic sample changes under retries, recomputation and
  * resume (Spark may re-execute any partition at any time), which silently
  * leaks val/test rows into train at scale. The hash is MD5 (standard
  * across engines, so the DuckDB oracle can reproduce the exact split —
  * xxhash64 is Spark-private) taken over the key's string form; the first
  * 8 hex chars give 32 uniform bits, folded into [0, buckets).
  *
  * All operators are narrow (no shuffle) except capPerGroup (one window
  * shuffle on the group key) — sampling 100 TB costs one scan.
  */
object Sampling {

  val DefaultBuckets = 10000

  /** Uniform bucket in [0, buckets) from the key — engine-portable. */
  def md5Bucket(key: Column, buckets: Int = DefaultBuckets): Column =
    pmod(conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long"),
      lit(buckets.toLong)).cast("int")

  /** Label every row with a split name by cumulative weight — the
    * deterministic train/val/test assignment. Weights need not sum to 1;
    * they are normalized. A given key always lands in the same split, on
    * any cluster, any retry, any engine.
    */
  def deterministicSplit(
      df: DataFrame,
      key: Column,
      weights: Seq[(String, Double)],
      out: String = "split"): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val total = weights.map(_._2).sum
    val bucket = md5Bucket(key)
    val cuts = weights.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }.tail
    val expr = weights.zip(cuts).foldLeft(when(lit(false), null)) {
      case (acc, ((label, _), cut)) =>
        acc.when(bucket < math.round(cut * DefaultBuckets), label)
    }
    // the last cut rounds to exactly DefaultBuckets, so the final when
    // already covers every bucket; otherwise(last) guards rounding
    df.withColumn(out, coalesce(expr, lit(weights.last._1)))
  }

  /** Deterministic k-fold assignment: fold = md5-hash of the key mod k —
    * every row lands in exactly one of k same-expectation folds, stable
    * across clusters, retries and engines (cross-validation and sharded
    * eval both need the assignment to be a FUNCTION of the key, never of
    * partitioning or RNG state). `heldOut` additionally labels that
    * fold's rows "test" and the rest "train" — one scan, no shuffle,
    * narrow on any data size.
    */
  def kFoldSplit(
      df: DataFrame,
      key: Column,
      k: Int,
      heldOut: Int,
      out: String = "fold",
      splitOut: String = "split"): DataFrame = {
    require(k >= 2, "k-fold needs k >= 2")
    require(heldOut >= 0 && heldOut < k, s"heldOut must be in [0, $k)")
    df.withColumn(out, md5Bucket(key, k))
      .withColumn(splitOut, when(col(out) === heldOut, "test").otherwise("train"))
  }

  /** Keep a per-stratum deterministic fraction of rows (e.g. downsample
    * overrepresented languages/domains in a corpus). Unlisted strata are
    * dropped; fraction 1.0 keeps the stratum whole. Narrow — the filter
    * pushes into the scan, no shuffle.
    */
  def stratifiedSampleByHash(
      df: DataFrame,
      stratum: Column,
      key: Column,
      fractions: Map[String, Double]): DataFrame = {
    require(fractions.values.forall(f => f >= 0 && f <= 1), "fractions must be in [0,1]")
    val bucket = md5Bucket(key)
    val threshold = element_at(typedLit(fractions.map { case (k, f) =>
      k -> math.round(f * DefaultBuckets)
    }), stratum)
    df.filter(threshold.isNotNull && bucket < threshold)
  }

  /** Per-row weighted Bernoulli sampling, deterministic: keep a row iff
    * its MD5 bucket falls under floor(weight · buckets) — rows with
    * weight 1 always survive, weight 0 never, everything between
    * proportionally, and the SAME rows survive on every engine, retry
    * and re-run (no rand()). The training-data use: sample documents
    * proportional to a quality score instead of uniformly. Weights are
    * clamped to [0, 1]; null weights drop (no silent keep).
    */
  def weightedSampleByHash(df: DataFrame, key: Column, weight: Column): DataFrame = {
    val w = least(lit(1.0), greatest(lit(0.0), weight))
    df.filter(weight.isNotNull &&
      md5Bucket(key) < floor(w * DefaultBuckets).cast("long"))
  }

  /** Rebalance a corpus to a target domain mixture by deterministic
    * downsampling: with target proportions p_i per stratum and observed
    * counts n_i, the largest achievable total is T = min_i(n_i / p_i);
    * keep exactly floor(p_i · T) rows per stratum, chosen by hash rank
    * (retry-stable, engine-portable). Strata not in `targetWeights` are
    * dropped; weights are normalized. Never upsamples — repetition-based
    * upweighting is a manifest policy, not an engine op.
    *
    * Cost: one tiny per-stratum count agg (broadcast back as quotas) plus
    * one window shuffle on the stratum key. Proportions are relative to
    * the strata actually present (an absent stratum can't constrain T).
    */
  def rebalanceToMixture(
      df: DataFrame,
      stratum: Column,
      key: Column,
      targetWeights: Map[String, Double]): DataFrame = {
    require(targetWeights.nonEmpty && targetWeights.values.forall(_ > 0),
      "target weights must be positive")
    val total = targetWeights.values.sum
    val norm = targetWeights.map { case (k, w) => k -> w / total }
    // collision-free temp names: only __st/__q survive into the join with
    // the caller's frame (__n/__p/__t live inside the tiny quota aggregate,
    // whose projection is fixed by the groupBy/agg regardless of df's names)
    val st = graft.core.Cols.fresh(df, "__st")
    val q = graft.core.Cols.fresh(df, "__q")
    val counts = df.groupBy(stratum.as(st)).agg(count(lit(1)).as("__n"))
      .withColumn("__p", element_at(typedLit(norm), col(st)))
      .filter(col("__p").isNotNull)
    val tFrame = counts.agg(min(col("__n") / col("__p")).as("__t"))
    val quota = counts.crossJoin(tFrame)
      .select(col(st), floor(col("__p") * col("__t")).cast("long").as(q))
    val rk = graft.core.Cols.fresh(df, "__rk")
    val w = Window.partitionBy(stratum).orderBy(md5Bucket(key), key)
    df.join(broadcast(quota), stratum === col(st))
      .withColumn(rk, row_number().over(w))
      .filter(col(rk) <= col(q))
      .drop(st, q, rk)
  }

  /** Pack rows into fixed-token-budget training shards: within each
    * partition (e.g. split × source), rows are laid out in the pinned
    * `order` and a document lands in shard `floor(tokens_before_it /
    * budget)` — greedy packing where a document that straddles a boundary
    * stays in the shard it started in (so shards can exceed the budget by
    * at most one document; standard for LLM shard manifests, where the
    * budget is a target, not a hard cap).
    *
    * One window shuffle on the partition keys. Deterministic: same input →
    * same shard ids on any cluster/retry (the order must be a total order
    * within each partition — include a unique id).
    */
  def packShards(
      df: DataFrame,
      tokens: Column,
      partitionCols: Seq[String],
      order: Seq[Column],
      budgetTokens: Long,
      out: String = "shard"): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    val w = Window.partitionBy(graft.ops.Windows.keysOrConstant(partitionCols.map(col)): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val before = coalesce(sum(tokens.cast("long")).over(w), lit(0L))
    // values are non-negative, so cast-truncation of the double division
    // is exactly floor
    df.withColumn(out, (before / budgetTokens).cast("long"))
  }

  /** GPT-style sequence packing: concatenate documents per partition in a
    * pinned order and cut the token stream into fixed-length examples,
    * emitting one row per (example, document) SEGMENT — documents SPLIT
    * across example boundaries (unlike [[packShards]], which bins whole
    * documents), so every example holds exactly `exampleTokens` tokens
    * except the final one per partition. This is the layout next-token
    * training actually consumes; `tok_from`/`tok_len` say which slice of
    * the document lands in the example and `pos_in_example` where.
    *
    * Output: input columns + `n_tokens`, `offset` (tokens before this doc
    * in its partition's stream), `example_id`, `tok_from` (within-doc),
    * `tok_len`, `pos_in_example`. Zero-token documents are dropped (they
    * occupy no positions). Integer arithmetic end to end — deterministic
    * on any cluster, retry or engine. Scale shape: one bounded window
    * shuffle per `partitionCols` (never a global single-reducer window)
    * plus a narrow explode (a document spanning k examples fans out k
    * segment rows, k ≈ n_tokens/exampleTokens + 1).
    */
  def packSequences(
      df: DataFrame,
      tokens: Column,
      partitionCols: Seq[String],
      order: Seq[Column],
      exampleTokens: Int): DataFrame = {
    require(exampleTokens > 0, "exampleTokens must be positive")
    val reserved = Seq("n_tokens", "offset", "example_id", "tok_from",
      "tok_len", "pos_in_example").filter(df.columns.contains)
    require(reserved.isEmpty,
      s"input columns collide with the output contract: ${reserved.mkString(", ")}")
    val w = Window.partitionBy(graft.ops.Windows.keysOrConstant(partitionCols.map(col)): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val L = lit(exampleTokens.toLong)
    // offsets are computed over ALL rows (zero-token docs contribute 0),
    // THEN empties are dropped — same totals, stable offsets
    val withOff = df
      .withColumn("n_tokens", tokens.cast("long"))
      .withColumn("offset", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      .filter(col("n_tokens") > 0)
    // non-negative, so cast-truncation of the double division is floor
    // (packShards precedent)
    val firstEx = (col("offset") / L).cast("long")
    val lastEx = ((col("offset") + col("n_tokens") - lit(1L)) / L).cast("long")
    val gStart = greatest(col("offset"), col("example_id") * L)
    val gEnd = least(col("offset") + col("n_tokens"), (col("example_id") + lit(1L)) * L)
    withOff
      .withColumn("example_id", explode(sequence(firstEx, lastEx)))
      .withColumn("tok_from", gStart - col("offset"))
      .withColumn("tok_len", gEnd - gStart)
      .withColumn("pos_in_example", gStart - col("example_id") * L)
  }

  /** Deterministic curriculum interleaving: assign every row a global
    * training position such that sources appear in proportion to their
    * weight throughout the schedule (source s's k-th row lands at position
    * k / weight(s) — a weight-2 source appears twice as often early and
    * stays interleaved 2:1 for as long as it lasts). Sources without a
    * weight are dropped. Downstream consumes `ORDER BY (pos, source,
    * order-keys)`; the ordering key is computed per-row, so the only
    * shuffles are the per-source window and the final range-partitioned
    * sort — no driver-side scheduling.
    *
    * Output: input columns + `src_rank` (1-based rank within source) +
    * `pos` (the interleave position).
    */
  def interleaveBySource(
      df: DataFrame,
      source: Column,
      order: Seq[Column],
      weights: Map[String, Double]): DataFrame = {
    require(weights.nonEmpty && weights.values.forall(_ > 0), "weights must be positive")
    val w = Window.partitionBy(source).orderBy(order: _*)
    val wt = element_at(typedLit(weights), source)
    df.filter(wt.isNotNull)
      .withColumn("src_rank", row_number().over(w))
      .withColumn("pos", col("src_rank") / wt)
  }

  /** Deterministic global corpus shuffle: a pseudo-random total permutation
    * of the rows (position + shard id), the pass every training pipeline
    * runs once before writing shard manifests. Order is (md5(key), key) —
    * engine-portable, retry-stable, no rand().
    *
    * A naive `row_number() OVER (ORDER BY hash)` is a single-reducer global
    * window — a scale-killer. Instead the rank is two-level: rows get a
    * bucket from the hash's TOP log2(nBuckets) bits (the window runs
    * per-bucket, `nBuckets`-way parallel), and global position = bucket
    * rank + the bucket's cumulative offset, where offsets come from an
    * `nBuckets`-row count aggregate collected driver-side (an index
    * action) and shipped back as a single map literal. Because the bucket
    * is a PREFIX of the very hex the within-bucket window orders by (md5
    * hex is lowercase, so string order == numeric order), the two-level
    * rank is exactly the flat `ORDER BY (md5, key)` rank — which is what
    * the oracle states with a flat window. One shuffle on the bucket key,
    * no global window, no extra join.
    *
    * Shards are fixed-size: shard = pos div rowsPerShard (integral
    * division — no float rounding at any position).
    *
    * CONTRACT: `key` must be non-null (a null key raises at execution time
    * — md5(null) would otherwise silently drop the row through the bucket
    * equi-join) and UNIQUE per row (duplicate keys tie on the sort tuple
    * and a retry could swap their positions; pass a document id, not a
    * payload column).
    *
    * `epochSalt` prefixes the hashed key string ('' leaves the hash
    * byte-identical to md5(key)): multi-epoch training wants a DIFFERENT
    * but equally deterministic permutation per epoch — same corpus, same
    * shards-per-epoch layout, re-ordered by salting the hash, with no new
    * mechanism (the oracle replays md5(salt || key) the same way).
    */
  def globalShuffle(
      df: DataFrame,
      key: Column,
      rowsPerShard: Long,
      nBuckets: Int = 1024,
      posOut: String = "pos",
      shardOut: String = "shard",
      epochSalt: String = ""): DataFrame = {
    require(rowsPerShard > 0, "rowsPerShard must be positive")
    require(nBuckets > 0 && (nBuckets & (nBuckets - 1)) == 0,
      "nBuckets must be a power of two (the bucket is a hash-bit prefix)")
    val bits = 31 - Integer.numberOfLeadingZeros(nBuckets)
    val b = graft.core.Cols.fresh(df, "__b")
    val h = graft.core.Cols.fresh(df, "__h")
    val rk = graft.core.Cols.fresh(df, "__rk")
    val keyStr = when(key.isNotNull, key.cast("string"))
      .otherwise(assert_true(key.isNotNull,
        lit("globalShuffle: null shuffle key (rows would silently vanish)")).cast("string"))
    val saltedKey = if (epochSalt.isEmpty) keyStr else concat(lit(epochSalt), keyStr)
    val hashed = df
      .withColumn(h, md5(saltedKey))
      .withColumn(b, shiftright(
        conv(substring(col(h), 1, 8), 16, 10).cast("long"), 32 - bits).cast("int"))
    val w = Window.partitionBy(col(b)).orderBy(col(h), key)
    val ranked = hashed.withColumn(rk, row_number().over(w).cast("long") - 1)
    // the cumulative bucket offsets are an INDEX action over <= nBuckets
    // aggregate rows (not data): computed driver-side and shipped back as
    // one map literal, so the plan carries no unpartitioned window (whose
    // WindowExec warning pattern-matches the #1 scale-killer and would
    // mask a real one) and no extra join
    val counts = hashed.groupBy(col(b)).agg(count(lit(1)).as("__n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsetByBucket: Map[Int, Long] = counts.map { case (bk, n) =>
      val o = acc; acc += n; bk -> o
    }.toMap
    ranked
      .withColumn(posOut, element_at(typedLit(offsetByBucket), col(b)) + col(rk))
      .withColumn(shardOut, expr(s"`$posOut` div $rowsPerShard"))
      .drop(b, h, rk)
  }

  /** Cap each group at `k` rows with a pinned survivor order (e.g. at most
    * N documents per domain). One shuffle on the group key; ties broken by
    * the explicit order, so output is retry-stable.
    */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], k: Int, order: Seq[Column]): DataFrame = {
    require(k > 0, "k must be positive")
    val w = Window.partitionBy(graft.ops.Windows.keysOrConstant(groupCols.map(col)): _*).orderBy(order: _*)
    // collision-free temp name: an input that already carries "__rn" must
    // not be silently overwritten and dropped
    val rn = graft.core.Cols.fresh(df, "__rn")
    df.withColumn(rn, row_number().over(w)).filter(col(rn) <= k).drop(rn)
  }

  /** Temperature-scaled mixture sampling (the UniMax / multilingual-T5
    * rebalance, arXiv:1910.10683 §3.4.2): keep ~`totalKeep` rows with
    * per-stratum quotas proportional to count^(1/T) — T>1 flattens the
    * head so low-resource strata are not drowned, without the hard flat
    * quota of [[rebalanceToMixture]] (which needs explicit target weights;
    * this derives them from the data).
    *
    * Engine-exact by construction: T is restricted to powers of two
    * (count^(1/2^k) = k nested square roots, and IEEE-754 REQUIRES sqrt to
    * be correctly rounded — bit-identical on every engine — where pow(x,
    * 1/T) guarantees nothing). Each weight is floored to integer
    * micro-units, so quota arithmetic is BIGINT: quota_s = totalKeep ·
    * w_s / Σw (integer division), capped at the stratum count. Survivors
    * are the md5-rank lowest rows per stratum — retry-stable, no rand().
    *
    * Scale: one count aggregate (stratum-scale rows, broadcast back) + one
    * keyed window shuffle for the rank. The quota math never touches data.
    */
  def temperatureMixture(
      df: DataFrame,
      stratum: Column,
      key: Column,
      totalKeep: Long,
      sqrtApplications: Int = 1): DataFrame = {
    require(totalKeep > 0, "totalKeep must be positive")
    require(sqrtApplications >= 1 && sqrtApplications <= 4,
      "T = 2^k with k in 1..4 (IEEE sqrt is exact; pow is not)")
    val st = graft.core.Cols.fresh(df, "__st")
    val q = graft.core.Cols.fresh(df, "__q")
    val w0 = (1 to sqrtApplications)
      .foldLeft(col("__n").cast("double")) { (c, _) => sqrt(c) }
    val counts = df.groupBy(stratum.as(st)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(w0 * 1e6).cast("long"))
    val tot = counts.agg(sum(col("__w")).as("__sw"))
    val quota = counts.crossJoin(broadcast(tot))
      .select(col(st),
        least(expr(s"(${totalKeep}L * __w) DIV __sw"), col("__n")).as(q))
    val rk = graft.core.Cols.fresh(df, "__rk")
    val w = Window.partitionBy(stratum).orderBy(md5Bucket(key), key)
    df.join(broadcast(quota), stratum === col(st))
      .withColumn(rk, row_number().over(w))
      .filter(col(rk) <= col(q))
      .drop(st, q, rk)
  }
}
