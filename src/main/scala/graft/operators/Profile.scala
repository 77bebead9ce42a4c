package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Column profiling for corpus/table QA (training-data pipeline extension,
  * SURVEY §2.11) — the "know your data before you train on it" pass every
  * large pipeline runs after ingest and after each transform stage.
  *
  * Two tiers, same output shape (one row per profiled column):
  *
  *  - [[numericProfile]] — EXACT counts/extremes/sums. One aggregate job;
  *    count(DISTINCT) over multiple columns makes Catalyst plan a single
  *    expand + two-phase hash aggregate, so the cost is one scan plus a
  *    shuffle of partial aggregates per column — no driver-side loop over
  *    columns, no second scan. Oracle-checkable (pf_profile): every metric
  *    is deterministic, with sums through the fixed-scale decimal cast
  *    (graft.core.Num rationale).
  *  - [[approxProfile]] — the 100 TB tier: HyperLogLog++ distinct counts
  *    (`approx_count_distinct`) and quantile sketches
  *    (`approx_percentile`), both bounded-memory mergeable sketches, no
  *    expand (single scan, one tiny shuffle of sketch buffers). Sketch
  *    internals are engine-specific so there is no cross-engine oracle;
  *    ProfileSpec pins each estimate against the exact tier at fixture
  *    scale instead.
  */
object Profile {

  private val Dec = DecimalType(30, 6)

  /** Exact profile of numeric columns: one output row per column —
    * (column, n_rows, n_nulls, n_distinct, min_v, max_v, sum_v, mean_v),
    * ordered by column name. Values are cast to double for a uniform
    * shape; sums are decimal-exact before the final cast.
    */
  def numericProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"),
        sum(col(c).cast(Dec)).as(s"__sum_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // stack the wide single row into one row per column; all branches are
    // plain column refs, so this is a zero-shuffle projection + explode
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"),
        col(s"__sum_$c").cast("double").as("sum_v"),
        (col(s"__sum_$c").cast("double") / col(s"__nn_$c")).as("mean_v"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*").orderBy("column")
  }

  /** Exact profile of string columns: one row per column —
    * (column, n_rows, n_nulls, n_distinct, n_empty, min_len, max_len,
    * avg_len), ordered by column name. Same one-aggregate shape as
    * [[numericProfile]].
    */
  def stringProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        sum((col(c) === "").cast("long")).as(s"__ne_$c"),
        min(length(col(c))).as(s"__minl_$c"),
        max(length(col(c))).as(s"__maxl_$c"),
        sum(length(col(c)).cast("long")).as(s"__suml_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        coalesce(col(s"__ne_$c"), lit(0L)).as("n_empty"),
        col(s"__minl_$c").as("min_len"),
        col(s"__maxl_$c").as("max_len"),
        (col(s"__suml_$c").cast("double") / col(s"__nn_$c")).as("avg_len"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*").orderBy("column")
  }

  /** Key-skew diagnostic: the `topN` hottest key combinations with their
    * row count, share of all rows, and multiple-of-mean-key-load — the
    * numbers that decide whether a join/aggregation on `keys` needs AQE
    * skew handling or an explicit salted join (ops/Joins.saltedJoin).
    *
    * Shape: one hash aggregate on the keys, a 1-row global aggregate
    * broadcast back, and a TakeOrdered for the top-N — no global sort, no
    * window, output bounded at `topN` regardless of key cardinality.
    */
  /** One-pass pairwise Pearson correlation per group: ALL moments (per-
    * column decimal-exact sums and sums of squares, per-pair sums of
    * products) come from a single hash aggregate, then the textbook
    * formula runs in a handful of IEEE double ops with identical
    * parenthesization to the SQL twin — so the matrix is bit-stable
    * cross-engine (the qt_zscore discipline; sqrt is correctly rounded).
    * Zero-variance columns yield null (no 0/0). Built-in `corr` is a
    * streaming co-moment whose update order varies per run — unusable
    * under the determinism contract.
    *
    * Magnitude note: exactness of the final decimal→double cast needs the
    * scaled sums under 2^53 (core.Num rationale) — profile bounded-range
    * columns (rates, quantities), not raw revenue products.
    */
  def pearsonMatrix(df: DataFrame, keys: Seq[String], cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns to correlate")
    // moment aliases are POSITIONAL (__s_0, __sp_0_1), never name-derived:
    // name-derived aliases are ambiguous under underscores (('a','b_c') and
    // ('a_b','c') would both alias __sp_a_b_c) and collide with user columns
    val pairs = for { i <- cols.indices; j <- i + 1 until cols.size } yield (i, j)
    val moments =
      Seq(count(lit(1)).cast("double").as("__n")) ++
        cols.indices.flatMap(i => Seq(
          sum(col(cols(i)).cast(Dec)).cast("double").as(s"__s_$i"),
          sum((col(cols(i)) * col(cols(i))).cast(Dec)).cast("double").as(s"__ss_$i"))) ++
        pairs.map { case (i, j) =>
          sum((col(cols(i)) * col(cols(j))).cast(Dec)).cast("double").as(s"__sp_${i}_$j") }
    val agg =
      if (keys.isEmpty) df.agg(moments.head, moments.tail: _*)
      else df.groupBy(keys.map(col): _*).agg(moments.head, moments.tail: _*)
    // output aliases can collide the same way (corr_a_b_c from both
    // ('a','b_c') and ('a_b','c')) — keep every emitted name unique
    val nOut = graft.core.Cols.fresh(keys, "n")
    val used = scala.collection.mutable.Set(keys: _*) += nOut
    val corrCols = pairs.map { case (i, j) =>
      val n = col("__n")
      val cov = n * col(s"__sp_${i}_$j") - col(s"__s_$i") * col(s"__s_$j")
      val vx = n * col(s"__ss_$i") - col(s"__s_$i") * col(s"__s_$i")
      val vy = n * col(s"__ss_$j") - col(s"__s_$j") * col(s"__s_$j")
      val name = graft.core.Cols.fresh(used, s"corr_${cols(i)}_${cols(j)}")
      used += name
      when(vx > 0 && vy > 0, cov / (sqrt(vx) * sqrt(vy))).as(name)
    }
    agg.select(keys.map(col) ++ Seq(col("__n").cast("long").as(nOut)) ++ corrCols: _*)
  }

  def keySkew(df: DataFrame, keys: Seq[String], topN: Int = 20): DataFrame = {
    require(keys.nonEmpty && topN > 0, "need keys and positive topN")
    val counts = df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("cnt"))
    val totals = counts.agg(
      sum(col("cnt")).cast("double").as("__total"),
      count(lit(1)).cast("double").as("__n_keys"))
    counts.crossJoin(broadcast(totals))
      .withColumn("share", col("cnt") / col("__total"))
      .withColumn("x_mean", col("cnt") * col("__n_keys") / col("__total"))
      .drop("__total", "__n_keys")
      .orderBy(col("cnt").desc +: keys.map(col): _*)
      .limit(topN)
  }

  /** Sketch-based profile for scales where exact distinct counts are not
    * worth an expand: (column, n_rows, n_nulls, approx_distinct, p50, p95,
    * min_v, max_v), ordered by column name. `rsd` is the HLL++ relative
    * standard deviation (default 5%).
    */
  def approxProfile(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = count(lit(1)).as("__n") +: cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        approx_count_distinct(col(c), rsd).as(s"__nd_$c"),
        percentile_approx(col(c), lit(0.5), lit(10000)).cast("double").as(s"__p50_$c"),
        percentile_approx(col(c), lit(0.95), lit(10000)).cast("double").as(s"__p95_$c"),
        min(col(c)).cast("double").as(s"__min_$c"),
        max(col(c)).cast("double").as(s"__max_$c"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(
        lit(c).as("column"),
        col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$c")).as("n_nulls"),
        col(s"__nd_$c").as("approx_distinct"),
        col(s"__p50_$c").as("p50"),
        col(s"__p95_$c").as("p95"),
        col(s"__min_$c").as("min_v"),
        col(s"__max_$c").as("max_v"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*").orderBy("column")
  }

  /** Pearson chi-squared independence statistic between two categorical
    * columns — the profiling gate for "did the label mix drift with the
    * source" questions, engine-exact where the textbook spelling is not:
    * each cell's term (o−e)²/e is rewritten over the COMMON denominator,
    * (o·N − r·c)² / (N·r·c), so numerator and denominator are exact
    * integers (DECIMAL(38,0) — no float e, no float subtraction), the
    * single division per cell is correctly rounded, and the cell sum goes
    * through the fixed-scale decimal cast every order-dependent double
    * reduction in this engine uses. Zero-observed cells of the full
    * r×c grid are included (their term is e), as the statistic requires.
    * Returns one row: (n_rows, n_levels_a, n_levels_b, dof, chi2).
    *
    * Scale shape: one count aggregate on (a, b), two tiny marginal
    * aggregates, a broadcast cross of the level sets (levels are
    * dictionary-sized by definition), one final one-row aggregate.
    * Exactness bound: the integer numerator is (≤N²)² — exact in a
    * double's 2^53 up to N ≈ 10^4 per the decimal→double cast; beyond
    * that the DECIMAL(38,0) arithmetic itself stays exact to N ≈ 10^9.
    */
  def chiSquare(df: DataFrame, a: String, b: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val dec = org.apache.spark.sql.types.DecimalType(30, 6)
    // null levels are rejected loudly: null join keys fall out of the
    // grid/marginal equi-joins, which would SILENTLY drop those rows from
    // n_rows and compute the statistic over an undocumented subtable (and
    // 0-marginal cells would NaN→null out of the sum). One cheap
    // validation action beats a wrong answer on a profiling op.
    require(df.filter(col(a).isNull || col(b).isNull).limit(1).isEmpty,
      s"chiSquare: null level in '$a' or '$b' — recode nulls to an explicit level first")
    // marginals and totals come from `obs`, not the zero-filled grid:
    // zero cells cannot change a sum, and aggregating the grid would
    // re-instantiate the crossJoin subtree once per marginal
    val obs = df.groupBy(col(a), col(b)).agg(count(lit(1)).as("__o"))
    val la = obs.select(col(a)).distinct()
    val lb = obs.select(col(b)).distinct()
    val full = broadcast(la).crossJoin(broadcast(lb))
      .join(obs, Seq(a, b), "left")
      .withColumn("__o", coalesce(col("__o"), lit(0L)))
    val ri = obs.groupBy(col(a)).agg(sum(col("__o")).as("__ri"))
    val cj = obs.groupBy(col(b)).agg(sum(col("__o")).as("__cj"))
    val n = obs.agg(sum(col("__o")).as("__n"),
      countDistinct(col(a)).as("__ka"), countDistinct(col(b)).as("__kb"))
    full
      .join(broadcast(ri), Seq(a)).join(broadcast(cj), Seq(b))
      .crossJoin(broadcast(n))
      .withColumn("__d",
        col("__o").cast(dec38) * col("__n").cast(dec38)
          - col("__ri").cast(dec38) * col("__cj").cast(dec38))
      .withColumn("__term",
        (col("__d") * col("__d")).cast("double") /
          (col("__n").cast(dec38) * col("__ri").cast(dec38) * col("__cj").cast(dec38))
            .cast("double"))
      .agg(
        first(col("__n")).cast("long").as("n_rows"),
        first(col("__ka")).as("n_levels_a"),
        first(col("__kb")).as("n_levels_b"),
        ((first(col("__ka")) - 1) * (first(col("__kb")) - 1)).as("dof"),
        sum(col("__term").cast(dec)).cast("double").as("chi2"))
  }

  /** Cramér's V — [[chiSquare]] normalized to [0, 1] so association
    * strength is comparable across tables of different size and level
    * counts: V = √(χ² / (N · min(k_a−1, k_b−1))). Built ON the chi2 row
    * (one extra projection, no new pass over the data); engine-exact
    * because χ² is already the decimal-cast sum and IEEE division and
    * sqrt are both correctly rounded — the same double in, the same
    * double out, in any engine. Single-level columns (min(kₐ,k_b) = 1)
    * give dof 0 and V null (association undefined), not a division blowup.
    * Returns (n_rows, n_levels_a, n_levels_b, dof, chi2, cramers_v).
    */
  def cramersV(df: DataFrame, a: String, b: String): DataFrame =
    chiSquare(df, a, b).withColumn("cramers_v",
      when(least(col("n_levels_a"), col("n_levels_b")) > 1,
        sqrt(col("chi2") /
          (col("n_rows") * (least(col("n_levels_a"), col("n_levels_b")) - 1))
            .cast("double"))))

  /** Cohen's kappa between two categorical columns — the chance-corrected
    * agreement a labeling pipeline reports when comparing an automatic
    * classifier against reference labels (or two annotators against each
    * other; Cohen 1960). With N rows, D agreeing rows and S = Σ over
    * levels of (rows where a=ℓ)·(rows where b=ℓ):
    *
    *   kappa = (p_o − p_e) / (1 − p_e) = (N·D − S) / (N² − S)
    *
    * — a ratio of two INTEGERS, so the whole statistic is one correctly
    * rounded IEEE division: bit-exact in any engine, no float
    * accumulation anywhere. Perfect agreement on a single level makes the
    * denominator 0 (p_e = 1); kappa is null there, as convention leaves
    * it undefined. Null levels are rejected loudly, as [[chiSquare]].
    * Returns one row:
    * (n_rows, n_agree, observed_agreement, expected_agreement, kappa).
    *
    * Scale shape: one count aggregate on (a, b) and everything after is
    * arithmetic over its (dictionary-sized) result — marginals, the
    * diagonal sum and the final row never touch the data again.
    * Exactness bound: N·D and N² stay under 2^53 to N ≈ 9·10^7; the
    * DECIMAL(38,0) products themselves are exact to N ≈ 10^18.
    */
  def cohenKappa(df: DataFrame, a: String, b: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    require(df.filter(col(a).isNull || col(b).isNull).limit(1).isEmpty,
      s"cohenKappa: null level in '$a' or '$b' — recode nulls to an explicit level first")
    val obs = df.groupBy(col(a), col(b)).agg(count(lit(1)).as("__o"))
    val ri = obs.groupBy(col(a)).agg(sum(col("__o")).as("__ri"))
      .select(col(a).as("__lvl"), col("__ri"))
    val cj = obs.groupBy(col(b)).agg(sum(col("__o")).as("__cj"))
      .select(col(b).as("__lvl"), col("__cj"))
    // S over the UNION of level sets via inner join: a level absent from
    // either side contributes a zero product, so the inner join is exact
    val s = ri.join(cj, Seq("__lvl"))
      .agg(coalesce(sum(col("__ri").cast(dec38) * col("__cj").cast(dec38)),
        lit(0).cast(dec38)).as("__s"))
    val nd = obs.agg(
      sum(col("__o")).as("__n"),
      coalesce(sum(when(col(a) === col(b), col("__o"))), lit(0L)).as("__d"))
    nd.crossJoin(broadcast(s))
      .select(
        col("__n").as("n_rows"),
        col("__d").as("n_agree"),
        (col("__d").cast("double") / col("__n").cast("double"))
          .as("observed_agreement"),
        (col("__s").cast("double") /
          (col("__n").cast(dec38) * col("__n").cast(dec38)).cast("double"))
          .as("expected_agreement"),
        when(col("__n").cast(dec38) * col("__n").cast(dec38) =!= col("__s"),
          (col("__n").cast(dec38) * col("__d").cast(dec38) - col("__s")).cast("double")
            / (col("__n").cast(dec38) * col("__n").cast(dec38) - col("__s")).cast("double"))
          .as("kappa"))
  }

  /** Per-class confusion summary of a predicted vs reference label column
    * — the classifier-eval companion of [[cohenKappa]]: for every class
    * in either column, (tp, fp, fn) plus precision, recall and F1. All
    * inputs are integer counts from ONE (pred, label) aggregate; the
    * metrics are short chains of correctly rounded IEEE ops (one division
    * each for p and r, 2·p·r/(p+r) for F1), so any engine reproduces them
    * bit-for-bit. Degenerate denominators yield null (a class never
    * predicted has no precision), never NaN/Inf. Null labels rejected
    * loudly, as [[chiSquare]]. Returns
    * (label, n_true, n_pred, tp, fp, fn, precision, recall, f1).
    *
    * Scale shape: one count aggregate on the (pred, label) pair grid
    * (dictionary-sized output), then marginal sums and a full-outer join
    * over class dictionaries — the data is touched once.
    */
  def confusionStats(df: DataFrame, pred: String, label: String): DataFrame = {
    require(df.filter(col(pred).isNull || col(label).isNull).limit(1).isEmpty,
      s"confusionStats: null in '$pred' or '$label' — recode nulls to an explicit level first")
    val cnt = df.groupBy(col(pred), col(label)).agg(count(lit(1)).as("__c"))
    val byPred = cnt.groupBy(col(pred)).agg(sum(col("__c")).as("n_pred"))
      .select(col(pred).as("__cls"), col("n_pred"))
    val byLabel = cnt.groupBy(col(label)).agg(sum(col("__c")).as("n_true"))
      .select(col(label).as("__cls"), col("n_true"))
    val diag = cnt.filter(col(pred) === col(label))
      .select(col(pred).as("__cls"), col("__c").as("tp"))
    val p = col("tp").cast("double") / col("n_pred")
    val r = col("tp").cast("double") / col("n_true")
    byLabel.join(byPred, Seq("__cls"), "full_outer")
      .join(diag, Seq("__cls"), "left")
      .select(
        col("__cls").as("label"),
        coalesce(col("n_true"), lit(0L)).as("n_true"),
        coalesce(col("n_pred"), lit(0L)).as("n_pred"),
        coalesce(col("tp"), lit(0L)).as("tp"))
      .withColumn("fp", col("n_pred") - col("tp"))
      .withColumn("fn", col("n_true") - col("tp"))
      .withColumn("precision", when(col("n_pred") > 0, p))
      .withColumn("recall", when(col("n_true") > 0, r))
      .withColumn("f1", when(col("n_pred") > 0 && col("n_true") > 0 && (p + r) > 0,
        lit(2.0) * p * r / (p + r)))
  }

  /** Per-group Gini impurity of a label column — the class-balance signal
    * a sampling/mixing stage monitors per source/domain: within group g
    * holding N rows with label counts c₁..c_k,
    *
    *   gini = 1 − Σ cᵢ² / N²  ∈ [0, 1 − 1/k]
    *
    * (0 = pure, higher = more mixed). Σcᵢ² and N² are integers and the
    * statistic is one IEEE division and one subtraction from an exact
    * small integer — bit-exact in any engine. Null labels are rejected
    * loudly, as [[chiSquare]]. Returns (group, n_rows, n_labels, gini)
    * ordered by nothing (order downstream).
    *
    * Scale shape: one count aggregate on (group, label), one sum
    * aggregate on group — both map-side combined; never touches the data
    * twice.
    */
  def giniImpurity(df: DataFrame, group: String, label: String): DataFrame = {
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    require(df.filter(col(group).isNull || col(label).isNull).limit(1).isEmpty,
      s"giniImpurity: null in '$group' or '$label' — recode nulls to an explicit level first")
    df.groupBy(col(group), col(label)).agg(count(lit(1)).as("__c"))
      .groupBy(col(group))
      .agg(
        sum(col("__c")).as("n_rows"),
        count(lit(1)).as("n_labels"),
        sum(col("__c").cast(dec38) * col("__c").cast(dec38)).as("__ss"))
      .select(col(group), col("n_rows"), col("n_labels"),
        (lit(1.0) - col("__ss").cast("double") /
          (col("n_rows").cast(dec38) * col("n_rows").cast(dec38)).cast("double"))
          .as("gini"))
  }
}
