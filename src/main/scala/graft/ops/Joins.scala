package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join-shaped operators (SURVEY §2.3). Plain equi-joins use the DataFrame
  * API directly; this module holds the composite ones.
  */
object Joins {

  /** J5: dplyr full_join with no `by` — acts as union+dedup of conformable
    * frames (reference data-raw/run_prepare_Scenarios_AnalysisInput.R:351-357).
    */
  def unionDedup(dfs: Seq[DataFrame]): DataFrame =
    dfs.reduce(_.unionByName(_, allowMissingColumns = true)).distinct()

  /** J12: bind a single-row frame onto every row (reference bind_cols of
    * global averages, R/prepare_prewrangled_financial_data_stress_test.R:
    * 319-322). Broadcast, so no shuffle of the big side.
    */
  def bindOneRow(df: DataFrame, oneRow: DataFrame): DataFrame =
    df.crossJoin(broadcast(oneRow))

  /** Skew-resistant equi-join (scale extension beyond the reference, which
    * never meets skew at tibble sizes — SURVEY §4.2 flags `Global` geography
    * rows as the skewed key at scale). AQE's skew-join split is the first
    * line of defence; this operator is the explicit fallback for joins where
    * one key dominates so heavily that even split shuffle blocks spill: the
    * fact side gets a deterministic salt in [0, buckets), the dim side is
    * replicated once per salt value, and the join key becomes (keys..., salt)
    * so the hot key spreads over `buckets` reducers.
    *
    * Result is row-identical to `facts.join(dim, keys, "inner"|"left")`.
    * Only fact-preserving join types are allowed: with right/full the
    * replicated dim side would emit each unmatched dim row `buckets` times.
    * The salt derives from a hash of the whole fact row (not rand()), so
    * retries/recomputations of a lost partition produce identical output.
    * Known limit: fully-duplicate fact rows share a hash and therefore a
    * bucket — if the hot key's rows are byte-identical the salt cannot
    * spread them (they are indistinguishable; any deterministic function
    * of row content collides). Dedup-with-count first in that case.
    */
  def saltedJoin(
      facts: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(
      Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
        "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedJoin supports fact-preserving join types only (inner/left/semi/anti), got $joinType: " +
        "right/full would replicate unmatched dim rows once per bucket")
    val salt = "__salt"
    val salted = facts.withColumn(
      salt, pmod(xxhash64(facts.columns.map(col).toIndexedSeq: _*), lit(buckets)).cast("int"))
    val replicated = dim.withColumn(salt, explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ salt, joinType).drop(salt)
  }

  /** J10: closest-parent lookup over a pre-flattened hierarchy edge list
    * (reference R/prepare_prewrangled_financial_data_stress_test.R:172-217:
    * left-join subsidiaries to parents, keep min ownership_level per child —
    * ties kept, like slice_min — then attach parent attributes).
    *
    * `edges` = (childKey, parentKey, levelCol ...). Uses rank() so ties at
    * the minimum level are kept, matching slice_min. One shuffle on childKey.
    *
    * @param child      fact table with `childKey`
    * @param edges      edge list (childKey, parentKey, levelCol)
    * @param parentAttrs attributes keyed by parentKey to attach
    */
  def closestParentJoin(
      child: DataFrame,
      edges: DataFrame,
      childKey: String,
      parentKey: String,
      levelCol: String,
      parentAttrs: DataFrame): DataFrame = {
    val w = Window.partitionBy(col(childKey)).orderBy(col(levelCol))
    val closest = edges
      .withColumn("__rk", rank().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk")
    child
      .join(closest, Seq(childKey), "left")
      .join(parentAttrs, Seq(parentKey), "left")
  }

  /** J9: set-overlap "similarity join" between groups of items (reference
    * R/rename_geographies.R:51-107: geographies with near-identical country
    * sets are grouped; overlap = |x∩y| / |x|, keep >= tol, drop unordered
    * duplicate pairs via least/greatest).
    *
    * collect_set per group first (shrinks N rows to G groups), then the
    * G×G comparison — at scale G (number of *groups*) is small even when N
    * is huge, so the crossJoin is driver-safe; if G were large this becomes
    * an LSH problem (see graft.operators.Dedup).
    */
  def setOverlapPairs(df: DataFrame, groupCol: String, itemCol: String, tol: Double): DataFrame = {
    val sets = df
      .groupBy(col(groupCol))
      .agg(collect_set(col(itemCol)).as("__items"))
    val a = sets.select(col(groupCol).as("g_x"), col("__items").as("items_x"))
    val b = sets.select(col(groupCol).as("g_y"), col("__items").as("items_y"))
    a.crossJoin(b)
      .filter(col("g_x") =!= col("g_y"))
      .withColumn(
        "overlap",
        size(array_intersect(col("items_x"), col("items_y"))).cast("double") /
          size(col("items_x")))
      .filter(col("overlap") >= tol)
      .withColumn("__rn", row_number().over(
        Window.partitionBy(least(col("g_x"), col("g_y")), greatest(col("g_x"), col("g_y")))
          .orderBy(col("g_x"), col("g_y"))))
      .filter(col("__rn") === 1)
      .select("g_x", "g_y", "overlap")
  }

  /** Anti join that treats null keys as equal — dplyr::anti_join matches NA
    * to NA (reference drop_always_empty_production anti-joins on keys that
    * can be NA, R/prepare_abcd_stress_test_input.R:230-234); Spark's
    * left_anti with plain equality would keep every null-keyed row.
    */
  def antiJoinNullSafe(df: DataFrame, other: DataFrame, keys: Seq[String]): DataFrame = {
    // rename the probe side to avoid ambiguous self-join resolution when
    // `other` derives from `df`
    val b = keys.foldLeft(other.select(keys.map(col): _*))(
      (d, k) => d.withColumnRenamed(k, s"__b_$k"))
    df.join(b, keys.map(k => col(k) <=> col(s"__b_$k")).reduce(_ && _), "left_anti")
  }

  /** P12 deterministic: dropDuplicates picks an arbitrary row; at scale (and
    * for oracle parity) pin the survivor with an explicit order.
    */
  def dedupKeepFirst(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }
}
