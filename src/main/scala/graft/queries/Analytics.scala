package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Num.dsum
import graft.core.Tables._
import graft.functions.TextFns
import graft.ops.{Funnel, Joins}

/** Round-4 catalog extensions: OLAP subtotal aggregation (rollup/cube),
  * batch sessionization, integer-exact histogram profiling, BM25 corpus
  * ranking, URL canonicalization dedup, and the remaining scalar/window
  * function families (bitwise, percent_rank/cume_dist, ntile).
  *
  * All oracles follow the catalog parity rules (see [[Q]]): order-dependent
  * double reductions go through fixed-scale decimals; float expressions are
  * written with IDENTICAL parenthesization on both sides (each IEEE op is
  * correctly rounded, so identical evaluation order => identical bits); and
  * scores that must be summed across rows are floored to integer
  * micro-units first, making the sum order-independent and exact.
  */
object Analytics {

  /** The shared log-free BM25 pipeline (k1=1.2, b=0.75, fixed query
    * terms; per-term scores floored to integer micro-units BEFORE the
    * per-doc sum, so the reduction is order-independent) — tx_bm25's
    * body, factored so the hybrid-fusion entry ranks the identical
    * lexical leg. Returns (doc_id, n_terms, bm25_micro), unsorted.
    */
  private def bm25Scores(s: org.apache.spark.sql.SparkSession, d: String) = {
    val docs = documents(s, d)
    val toks = docs.select(col("doc_id"), explode(TextFns.tokens(col("text"))).as("term"))
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val dt = toks
      .filter(col("term").isin("hash", "join", "spark", "window"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = dt.groupBy("term").agg(count(lit(1)).as("df"))
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val idf = (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
      (col("df").cast("double") + lit(0.5))
    val tfPart = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + (lit(0.75) * col("dl").cast("double")) / avgdl))
    dt.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .select(col("doc_id"), floor(idf * tfPart * lit(1000000.0)).as("micro"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum(col("micro")).as("bm25_micro"))
  }

  /** tx_bm25's oracle CTE chain, shared with ann_hybrid_rrf. Yields
    * `scored_docs(doc_id, n_terms, bm25_micro)`.
    */
  private val bm25Ctes: String =
    """toks AS (SELECT doc_id,
      |    unnest(list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '')) AS term
      |  FROM documents),
      |dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id),
      |stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(dl) AS BIGINT) AS sum_dl FROM dl),
      |dt AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
      |  WHERE term IN ('hash', 'join', 'spark', 'window') GROUP BY doc_id, term),
      |dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY term),
      |scored AS (SELECT dt.doc_id,
      |    CAST(floor(((CAST(stats.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE) + 0.5) / (CAST(dfreq.df AS DOUBLE) + 0.5))
      |      * ((CAST(dt.tf AS DOUBLE) * 2.2) / (CAST(dt.tf AS DOUBLE)
      |          + 1.2 * (0.25 + (0.75 * CAST(dl.dl AS DOUBLE)) / (CAST(stats.sum_dl AS DOUBLE) / CAST(stats.n_docs AS DOUBLE)))))
      |      * 1000000.0) AS BIGINT) AS micro
      |  FROM dt JOIN dfreq USING (term) JOIN dl USING (doc_id), stats),
      |scored_docs AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_terms,
      |    CAST(SUM(micro) AS BIGINT) AS bm25_micro
      |  FROM scored GROUP BY doc_id)""".stripMargin

  val queries: Seq[Q] = Seq(

    // ---- subtotal aggregation (rollup / cube) --------------------------
    Q("a14_rollup",
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      // Hierarchical subtotals in ONE pass: Spark expands rollup to
      // grouping sets inside a single hash aggregate (Expand + partial agg
      // — no extra shuffle vs a plain groupBy). The reference computes
      // subtotal tiers as separate summarise+bind passes
      // (R/prepare_scenario_data.R:435-470 global+sector tiers); grouping
      // sets express that in one scan at any scale.
      lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    Q("a20_weighted_avg",
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(30,6))) AS DOUBLE)
        |    / CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS w_avg_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS total_weight
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // Quantity-weighted average price per flag — the aggregate behind
      // every volume-weighted metric (VWAP, weighted quality score).
      // Both the weighted sum and the weight total go through the
      // fixed-scale decimal cast, so the single final division is the
      // only IEEE op — order-independent and bit-exact.
      lineitem(s, d).groupBy("l_returnflag")
        .agg(
          (dsum(col("l_extendedprice") * col("l_quantity"))
            / dsum(col("l_quantity"))).as("w_avg_price"),
          dsum(col("l_quantity")).as("total_weight"))
        .orderBy("l_returnflag")
    },
    Q("a21_mode",
      """WITH c AS (SELECT l_returnflag, l_quantity, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |r AS (SELECT l_returnflag, l_quantity, cnt,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY cnt DESC, l_quantity) AS rk
        |  FROM c)
        |SELECT l_returnflag, l_quantity AS mode_quantity, cnt AS mode_count
        |FROM r WHERE rk = 1 ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // Per-group MODE with a DETERMINISTIC tie-break (smallest value
      // wins) — the built-in mode() leaves ties engine/partitioning-
      // dependent, which is exactly the nondeterminism this catalog
      // exists to ban. One count aggregate + one rank window over the
      // (group, value) dictionary, never the data twice.
      import org.apache.spark.sql.expressions.Window
      lineitem(s, d).groupBy("l_returnflag", "l_quantity")
        .agg(count(lit(1)).as("cnt"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("l_returnflag"))
            .orderBy(col("cnt").desc, col("l_quantity"))))
        .filter(col("rk") === 1)
        .select(col("l_returnflag"), col("l_quantity").as("mode_quantity"),
          col("cnt").as("mode_count"))
        .orderBy("l_returnflag")
    },
    Q("a19_grouping_sets",
      """SELECT CAST(GROUPING_ID(lang, source) AS BIGINT) AS gid,
        |  COALESCE(lang, 'ALL') AS lang, COALESCE(source, 'ALL') AS source,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(n_chars AS DECIMAL(30,6))) AS DOUBLE) AS sum_chars
        |FROM documents
        |GROUP BY GROUPING SETS ((lang, source), (source), ())
        |ORDER BY gid, lang, source""".stripMargin) { (s, d) =>
      // ARBITRARY grouping sets — the general primitive rollup (a14) and
      // cube (a15) are sugar for: here (lang, source) detail, per-source
      // subtotals SKIPPING the per-lang tier (a shape neither rollup nor
      // cube can express), and the grand total, all in ONE Expand + hash
      // aggregate — no extra shuffle vs a plain groupBy. grouping_id
      // disambiguates genuinely-null keys from subtotal rows on both
      // engines (same standard bitmask, first column = MSB).
      documents(s, d)
        .groupingSets(
          Seq(Seq(col("lang"), col("source")), Seq(col("source")), Seq()),
          col("lang"), col("source"))
        .agg(grouping_id().as("gid"),
          count(lit(1)).as("n"), dsum(col("n_chars")).as("sum_chars"))
        .select(
          col("gid"),
          coalesce(col("lang"), lit("ALL")).as("lang"),
          coalesce(col("source"), lit("ALL")).as("source"),
          col("n"), col("sum_chars"))
        .orderBy("gid", "lang", "source")
    },
    Q("a15_cube",
      """SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
        |  COALESCE(l_linestatus, 'ALL') AS l_linestatus,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
      // Full cross-classified subtotals (adds the per-linestatus slice and
      // the grand total to a14's hierarchy) — same single-pass Expand plan.
      lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("l_returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("l_linestatus"),
          col("n"), col("sum_qty"))
        .orderBy("l_returnflag", "l_linestatus")
    },

    // ---- distinct aggregation -------------------------------------------
    Q("a17_count_distinct",
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // Exact multi-column distinct aggregation — Spark plans TWO distinct
      // columns in one pass via Expand (each row fans out per distinct
      // set, then two-phase agg), not via self-joins. The approximate
      // counterpart (HLL++) is pinned against this exact tier in
      // ProfileSpec; at 100 TB you choose per use: exact for billing-grade
      // counts, sketch for profiling.
      lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
          countDistinct(col("l_suppkey")).as("n_supps"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag")
    },

    // ---- batch sessionization (gaps-and-islands) -----------------------
    Q("ev_sessions",
      """WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |           OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)),
        |s AS (SELECT user_id, event_id, us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                      ROWS UNBOUNDED PRECEDING) AS session_idx
        |  FROM o)
        |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
        |  CAST(COUNT(*) AS BIGINT) AS n_events,
        |  MIN(us) AS start_us, MAX(us) AS end_us
        |FROM s GROUP BY user_id, session_idx
        |ORDER BY user_id, session_idx""".stripMargin) { (s, d) =>
      // Batch twin of streaming sessionize (streaming/Events.scala): a
      // 30-minute inactivity gap closes a session. Gaps-and-islands with
      // ONE shuffle: both windows and the final groupBy key on user_id, so
      // the sort/exchange is reused across the lag, the running sum and
      // the aggregate (micros are integers — no float in the gap compare).
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("is_new",
          when(lag(col("us"), 1).over(w).isNull ||
               col("us") - lag(col("us"), 1).over(w) > 1800000000L, 1).otherwise(0))
        .withColumn("session_idx",
          sum(col("is_new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_idx")
        .agg(count(lit(1)).as("n_events"), min(col("us")).as("start_us"),
          max(col("us")).as("end_us"))
        .orderBy("user_id", "session_idx")
    },

    // ---- profiling: integer-exact equi-width histogram -----------------
    Q("pf_histogram",
      """WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        |  FROM lineitem),
        |m AS (SELECT MIN(cents) AS minc, MAX(cents) AS maxc FROM c)
        |SELECT CAST(((c.cents - m.minc) * 16) // (m.maxc - m.minc + 1) AS INTEGER) AS bucket,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(c.cents) AS min_cents, MAX(c.cents) AS max_cents
        |FROM c, m
        |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, d) =>
      // 16-bucket equi-width histogram with ALL arithmetic in integers
      // (cents), so bucket boundaries are engine-exact — the float-free
      // twin of width_bucket. Two passes over one column: a min/max
      // aggregate broadcast back (no shuffle of the fact side; bucket
      // assignment is a map-side expression feeding one hash agg).
      val c = lineitem(s, d)
        .select(round(col("l_extendedprice") * 100).cast("long").as("cents"))
      val m = c.agg(min(col("cents")).as("minc"), max(col("cents")).as("maxc"))
      c.crossJoin(broadcast(m))
        .select(
          expr("((cents - minc) * 16) DIV (maxc - minc + 1)").cast("int").as("bucket"),
          col("cents"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), min(col("cents")).as("min_cents"),
          max(col("cents")).as("max_cents"))
        .orderBy("bucket")
    },

    // ---- BM25 corpus ranking (log-free, integer-exact sum) -------------
    Q("tx_bm25",
      s"""WITH $bm25Ctes
         |SELECT doc_id, n_terms, bm25_micro
         |FROM scored_docs
         |ORDER BY bm25_micro DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      // BM25 (Robertson/Spärck Jones probabilistic ranking, k1=1.2,
      // b=0.75) for a fixed query over the corpus, LOG-FREE: the raw
      // idf ratio (N-df+0.5)/(df+0.5) replaces ln(...) — ln is not
      // guaranteed identically rounded across engines (the tx_tfidf
      // precedent) — and each per-term score is floored to integer
      // micro-units BEFORE the per-doc sum, so the sum is
      // order-independent and the oracle bit-exact. Scale shape: tf/df/dl
      // are map-side-combined aggregates, the scoring join is keyed on
      // (doc_id, term) with df and corpus stats broadcast, and the final
      // top-20 is TakeOrdered — no global sort/window materializes.
      bm25Scores(s, d)
        .orderBy(col("bm25_micro").desc, col("doc_id"))
        .limit(20)
    },

    // ---- hybrid retrieval: reciprocal-rank fusion ----------------------
    Q("ann_hybrid_rrf",
      // HYBRID search (the modern retrieval default: lexical + vector
      // legs fused by reciprocal rank, Cormack et al. RRF, k=60): the
      // BM25 top-50 and the embedding-cosine top-50 over the SAME doc
      // universe each contribute 1/(60 + rank); docs found by only one
      // leg keep that single term. Rank fusion is scale-free — it needs
      // no score normalization across incomparable scales, which is why
      // RRF beats score mixing in production hybrid stacks. Engine-exact:
      // ranks are integers from total orders, each term is one IEEE
      // division, and the two-term sum is written in fixed order
      // (IEEE + is commutative, so the ≤2-row aggregation cannot drift).
      // Scale shape: both legs end in TakeOrdered top-50 (partial per
      // partition, no global sort); the rank windows then run on ≤50
      // rows each, and the fusion join is 50x50-bounded.
      s"""WITH $bm25Ctes,
         |lex AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY bm25_micro DESC, doc_id) AS INTEGER) AS lex_rank
         |  FROM (SELECT * FROM scored_docs ORDER BY bm25_micro DESC, doc_id LIMIT 50)),
         |ev AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
         |  WHERE vec_id < 500),
         |q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
         |vtop AS (SELECT vec_id AS doc_id,
         |    CAST(row_number() OVER (ORDER BY cosine DESC, vec_id) AS INTEGER) AS vec_rank
         |  FROM (SELECT ev.vec_id, list_cosine_similarity(ev.v, q.qv) AS cosine
         |        FROM ev, q ORDER BY cosine DESC, ev.vec_id LIMIT 50)),
         |fused AS (SELECT COALESCE(lex.doc_id, vtop.doc_id) AS doc_id,
         |    lex.lex_rank, vtop.vec_rank,
         |    COALESCE(1.0 / (60 + lex.lex_rank), 0.0)
         |      + COALESCE(1.0 / (60 + vtop.vec_rank), 0.0) AS rrf
         |  FROM lex FULL OUTER JOIN vtop ON lex.doc_id = vtop.doc_id)
         |SELECT doc_id, lex_rank, vec_rank, rrf
         |FROM fused ORDER BY rrf DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
      graft.plans.Sketches.ensureRegistered(s)
      val lex = bm25Scores(s, d)
        .orderBy(col("bm25_micro").desc, col("doc_id")).limit(50)
        .withColumn("lex_rank",
          row_number().over(graft.ops.Windows.boundedGlobal(col("bm25_micro").desc, col("doc_id"))))
        .select("doc_id", "lex_rank")
      val ev = embeddings(s, d).filter(col("vec_id") < 500)
      val q = ev.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
      val vtop = ev.crossJoin(broadcast(q))
        .withColumn("cosine", graft.functions.VectorFns.cosine(col("embedding"), col("qv")))
        .orderBy(col("cosine").desc, col("vec_id")).limit(50)
        .withColumn("vec_rank",
          row_number().over(graft.ops.Windows.boundedGlobal(col("cosine").desc, col("vec_id"))))
        .select(col("vec_id").as("doc_id"), col("vec_rank"))
      lex.join(vtop, Seq("doc_id"), "full_outer")
        .withColumn("rrf",
          coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0))
            + coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(20)
    },

    // ---- URL canonicalization dedup ------------------------------------
    Q("dd_url_canon",
      """WITH u AS (SELECT o_orderkey,
        |    (CASE WHEN o_orderkey % 2 = 0 THEN 'HTTP' ELSE 'http' END) || '://' ||
        |    (CASE WHEN o_orderkey % 3 = 0 THEN 'Shop.Example.COM:80' ELSE 'shop.example.com' END) ||
        |    '/cat/' || o_orderstatus ||
        |    (CASE WHEN o_orderkey % 5 = 0 THEN '/' ELSE '' END) ||
        |    '?b=' || CAST(o_custkey % 7 AS VARCHAR) || '&a=' || CAST(o_orderkey % 13 AS VARCHAR) ||
        |    (CASE WHEN o_orderkey % 4 = 0 THEN '#sec' ELSE '' END) AS url
        |  FROM orders),
        |c AS (SELECT o_orderkey,
        |    lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) || '://' ||
        |    regexp_replace(lower(regexp_extract(url, '^[A-Za-z]+://([^/?#]+)', 1)), ':80$', '') ||
        |    regexp_replace(regexp_extract(url, '^[A-Za-z]+://[^/?#]+([^?#]*)', 1), '/+$', '') ||
        |    (CASE WHEN array_to_string(list_sort(list_filter(string_split(regexp_extract(url, '\?([^#]*)', 1), '&'), x -> x <> '')), '&') <> ''
        |          THEN '?' || array_to_string(list_sort(list_filter(string_split(regexp_extract(url, '\?([^#]*)', 1), '&'), x -> x <> '')), '&')
        |          ELSE '' END) AS canonical_url
        |  FROM u)
        |SELECT canonical_url, CAST(COUNT(*) AS BIGINT) AS n_variants,
        |  MIN(o_orderkey) AS canonical_id
        |FROM c GROUP BY canonical_url
        |ORDER BY canonical_url""".stripMargin) { (s, d) =>
      // Crawl-style URL dedup: scheme/host case, default :80 port,
      // trailing slashes, query-param order and fragments must not split a
      // URL's identity. The synthetic variants are derived from orders
      // columns (deterministic on both sides); canonicalization is
      // TextFns.canonicalizeUrl — pure string/array expressions, narrow,
      // codegen'd. The only shuffle is the final groupBy(canonical_url).
      val url = concat(
        when(col("o_orderkey") % 2 === 0, lit("HTTP")).otherwise(lit("http")), lit("://"),
        when(col("o_orderkey") % 3 === 0, lit("Shop.Example.COM:80"))
          .otherwise(lit("shop.example.com")),
        lit("/cat/"), col("o_orderstatus"),
        when(col("o_orderkey") % 5 === 0, lit("/")).otherwise(lit("")),
        lit("?b="), (col("o_custkey") % 7).cast("string"),
        lit("&a="), (col("o_orderkey") % 13).cast("string"),
        when(col("o_orderkey") % 4 === 0, lit("#sec")).otherwise(lit("")))
      orders(s, d)
        .select(col("o_orderkey"), TextFns.canonicalizeUrl(url).as("canonical_url"))
        .groupBy("canonical_url")
        .agg(count(lit(1)).as("n_variants"), min(col("o_orderkey")).as("canonical_id"))
        .orderBy("canonical_url")
    },

    // ---- scalar function family: bitwise -------------------------------
    Q("f7_bitwise_funcs",
      """SELECT o_orderkey,
        |  o_orderkey & 255 AS k_and,
        |  o_orderkey | 4096 AS k_or,
        |  xor(o_orderkey, o_custkey) AS k_xor,
        |  o_orderkey << 2 AS k_shl,
        |  o_orderkey >> 3 AS k_shr,
        |  CAST(bit_count(o_orderkey) AS INTEGER) AS k_pop
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // §2.9 bitwise family — hash bucketing / bloom-filter / flag-word
      // arithmetic building blocks. Pure codegen'd expressions, no shuffle.
      orders(s, d).select(
          col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("k_and"),
          col("o_orderkey").bitwiseOR(lit(4096L)).as("k_or"),
          col("o_orderkey").bitwiseXOR(col("o_custkey")).as("k_xor"),
          shiftleft(col("o_orderkey"), 2).as("k_shl"),
          shiftright(col("o_orderkey"), 3).as("k_shr"),
          bit_count(col("o_orderkey")).as("k_pop"))
        .orderBy("o_orderkey")
    },
    Q("f8_hash_funcs",
      """SELECT c_custkey,
        |  md5(c_name) AS h_md5,
        |  sha256(c_name) AS h_sha256
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      // §2.9 digest family — content addressing, cache keys, dedup hashes
      // and PII-safe identifiers all ride on these; cross-engine parity
      // of the hex encodings is exactly what makes the engine's
      // md5-derived sketch family oracle-able. Pure codegen'd
      // expressions, no shuffle.
      customer(s, d).select(
          col("c_custkey"),
          md5(col("c_name")).as("h_md5"),
          sha2(col("c_name"), 256).as("h_sha256"))
        .orderBy("c_custkey")
    },

    // ---- window family: relative rank ----------------------------------
    Q("w12_pct_rank",
      """SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
        |  percent_rank() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS pr,
        |  cume_dist() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS cd
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""".stripMargin) { (s, d) =>
      // percent_rank = (rank-1)/(N-1) and cume_dist = peers/N: a single
      // correctly-rounded division of exact integers, so bit-stable
      // across engines with no decimal detour. Tie handling is rank-based
      // — independent of the physical order within peers.
      val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
      lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
          col("l_quantity"),
          percent_rank().over(w).as("pr"), cume_dist().over(w).as("cd"))
        .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")
    },

    // ---- quantile bucketing --------------------------------------------
    Q("qt_ntile",
      """WITH t AS (SELECT l_returnflag, l_quantity,
        |    CAST(ntile(4) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity, l_orderkey, l_linenumber) AS INTEGER) AS tile
        |  FROM lineitem)
        |SELECT l_returnflag, tile, CAST(COUNT(*) AS BIGINT) AS n,
        |  MIN(l_quantity) AS lo, MAX(l_quantity) AS hi
        |FROM t GROUP BY l_returnflag, tile
        |ORDER BY l_returnflag, tile""".stripMargin) { (s, d) =>
      // Quartile bucketing: ntile's SQL-standard fill rule (first
      // n_rows % n_tiles buckets take the extra row) is deterministic
      // under a total order, so the tie-break includes the row key. The
      // summary per (group, tile) keeps the catalog row-count bounded.
      // Tiles come from Stats.groupedNtile's two-level (group, bucket)
      // rank — l_returnflag has 3 values, so the ntile window the oracle
      // spells would sort a third of the table per reducer at scale.
      // knownGroups = 3 (the return-flag domain) skips the per-call
      // strategy-probe scan (VERDICT r10 "What's wrong" #1)
      graft.ops.Stats.groupedNtile(
          lineitem(s, d).select(col("l_returnflag"), col("l_quantity"),
            col("l_orderkey"), col("l_linenumber")),
          Seq("l_returnflag"), col("l_quantity"),
          Seq(col("l_orderkey"), col("l_linenumber")), 4, "tile",
          knownGroups = Some(3L))
        .groupBy("l_returnflag", "tile")
        .agg(count(lit(1)).as("n"), min(col("l_quantity")).as("lo"),
          max(col("l_quantity")).as("hi"))
        .orderBy("l_returnflag", "tile")
    },

    // ---- sources: ORC + hive-partitioned sink --------------------------
    Q("s9_orc_roundtrip",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // S9 (beyond-reference): ORC sink + scan — the other columnar
      // interchange format Spark ships natively (vectorized reader,
      // predicate pushdown, zlib). Read back with the explicit schema;
      // the oracle is the parquet original, so the roundtrip must be
      // lossless including the timestamp column.
      val base = orders(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_s9_${graft.core.Tables.pathKey(d)}"
      base.write.mode("overwrite").orc(path)
      s.read.schema(base.schema).orc(path).orderBy("o_orderkey")
    },
    Q("s10_partitioned_scan",
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, o_orderpriority,
        |  o_orderstatus
        |FROM orders WHERE o_orderstatus = 'F' ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // S10 (beyond-reference): hive-style partitioned sink + partition-
      // pruned scan — THE layout decision at 100 TB: a filter on the
      // partition column prunes directories at planning time (zero I/O for
      // other partitions; AnalyticsSpec pins PartitionFilters in the plan).
      // Partition by the low-cardinality status column; read back filtered.
      val base = orders(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_s10_${graft.core.Tables.pathKey(d)}"
      base.write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
      s.read.parquet(path)
        .filter(col("o_orderstatus") === "F")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
          "o_orderpriority", "o_orderstatus")
        .orderBy("o_orderkey")
    },

    Q("u10_schema_evolution",
      """SELECT c_custkey, c_name, CAST(NULL AS DOUBLE) AS c_acctbal
        |FROM customer WHERE c_custkey % 3 = 0
        |UNION ALL
        |SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 3 = 1
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      // U10 (beyond-reference): parquet SCHEMA EVOLUTION — a later batch
      // gains a column, mergeSchema unifies the footers at read time and
      // rows from the old batch surface the new column as null (the
      // add-a-field migration every long-lived dataset goes through
      // without rewriting history). The oracle states the expected
      // widened union explicitly, so the read-back hash-proves the
      // backfill semantics.
      val c = customer(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_u10_${graft.core.Tables.pathKey(d)}"
      c.filter(col("c_custkey") % 3 === 0)
        .select("c_custkey", "c_name")
        .write.mode("overwrite").parquet(s"$path/batch=1")
      c.filter(col("c_custkey") % 3 === 1)
        .select("c_custkey", "c_name", "c_acctbal")
        .write.mode("overwrite").parquet(s"$path/batch=2")
      s.read.option("mergeSchema", "true").parquet(s"$path/batch=1", s"$path/batch=2")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
    },
    Q("j19_bucketed_cojoin",
      """SELECT o.o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l.l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority""".stripMargin) { (s, d) =>
      // J19 (beyond-reference): CO-LOCATED bucketed join — both fact
      // tables are written bucketBy(8) on the join key, so the join
      // consumes each side's on-disk bucketing and plans with ZERO
      // shuffle exchanges (pinned in AnalyticsSpec with broadcast off) —
      // the pre-partitioning lever that turns every repeated fact-fact
      // join at 100 TB from two full shuffles into none. External table
      // paths keyed by the sf dir; rewritten idempotently per session.
      val suffix = graft.core.Tables.pathKey(d)
      val tmp = sys.props("java.io.tmpdir")
      s.sql(s"DROP TABLE IF EXISTS graft_j19_li_$suffix")
      s.sql(s"DROP TABLE IF EXISTS graft_j19_ord_$suffix")
      lineitem(s, d).select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$tmp/graft_j19_li_$suffix")
        .mode("overwrite").format("parquet").saveAsTable(s"graft_j19_li_$suffix")
      orders(s, d).select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$tmp/graft_j19_ord_$suffix")
        .mode("overwrite").format("parquet").saveAsTable(s"graft_j19_ord_$suffix")
      s.table(s"graft_j19_li_$suffix")
        .join(s.table(s"graft_j19_ord_$suffix"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("o_orderpriority")
    },
    Q("s16_dynamic_overwrite",
      """WITH base AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag AS flag
        |  FROM lineitem WHERE l_orderkey % 20 = 0),
        |delta AS (
        |  SELECT l_orderkey, l_linenumber, l_quantity + 100 AS l_quantity,
        |    l_returnflag AS flag
        |  FROM lineitem WHERE l_orderkey % 40 = 0 AND l_returnflag = 'A'),
        |merged AS (
        |  SELECT * FROM base WHERE flag <> 'A'
        |  UNION ALL SELECT * FROM delta)
        |SELECT flag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty
        |FROM merged GROUP BY flag ORDER BY flag""".stripMargin) { (s, d) =>
      // S16 (beyond-reference): DYNAMIC partition overwrite — the
      // incremental lakehouse write: the second write replaces ONLY the
      // partitions present in its batch (flag 'A' here), untouched
      // partitions survive byte-for-byte; static overwrite mode would
      // silently drop them. The oracle computes the expected merged state
      // relationally, so the read-back aggregate proves the semantics.
      val li = lineitem(s, d)
      val base = li.filter(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag").as("flag"))
      val delta = li.filter(col("l_orderkey") % 40 === 0 && col("l_returnflag") === "A")
        .select(col("l_orderkey"), col("l_linenumber"),
          (col("l_quantity") + 100).as("l_quantity"), col("l_returnflag").as("flag"))
      val path = s"${sys.props("java.io.tmpdir")}/graft_s16_${graft.core.Tables.pathKey(d)}"
      base.write.mode("overwrite").partitionBy("flag").parquet(path)
      delta.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("flag").parquet(path)
      s.read.parquet(path)
        .groupBy("flag")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("flag")
    },

    // ---- dimension maintenance: MERGE upsert + SCD2 history ------------
    Q("u6_upsert",
      """WITH src AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100 AS c_acctbal,
        |    c_mktsegment
        |  FROM customer WHERE c_custkey % 10 = 0
        |  UNION ALL
        |  SELECT c_custkey + 10000000, c_name, c_nationkey, c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 97 = 0)
        |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment FROM src
        |UNION ALL
        |SELECT t.c_custkey, t.c_name, t.c_nationkey, t.c_acctbal, t.c_mktsegment
        |FROM customer t ANTI JOIN src s ON t.c_custkey = s.c_custkey
        |ORDER BY c_custkey""".stripMargin) { (s, d) =>
      // MERGE semantics (update matched, insert new) over the customer
      // dimension: the batch updates every 10th customer's balance and
      // inserts re-keyed copies of every 97th as new rows. Joins.upsert =
      // one narrow anti-join shuffle + union (no full-outer wide rows).
      val target = customer(s, d)
      val updates = target.filter(col("c_custkey") % 10 === 0)
        .withColumn("c_acctbal", col("c_acctbal") + 100)
      val inserts = target.filter(col("c_custkey") % 97 === 0)
        .withColumn("c_custkey", col("c_custkey") + 10000000L)
      Joins.upsert(target, updates.unionByName(inserts), Seq("c_custkey"))
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
        .orderBy("c_custkey")
    },
    Q("u7_scd2_history",
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  o_orderdate AS valid_from,
        |  lead(o_orderdate) OVER w AS valid_to,
        |  (lead(o_orderdate) OVER w IS NULL) AS is_current
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, valid_from, o_orderkey""".stripMargin) { (s, d) =>
      // Slowly-changing-dimension (type 2) history build from a change
      // log: each order opens a validity interval on its customer, closed
      // by the next change (lead), open-ended on the latest. One window,
      // partitioned by the dimension key — scales by customer, and the
      // downstream as-of join (J14) is the point-in-time lookup twin.
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("o_orderdate").as("valid_from"),
          lead(col("o_orderdate"), 1).over(w).as("valid_to"),
          lead(col("o_orderdate"), 1).over(w).isNull.as("is_current"))
        .orderBy("o_custkey", "valid_from", "o_orderkey")
    },
    Q("u8_snapshot_diff",
      """WITH oldt AS (SELECT doc_id, text FROM documents),
        |newt AS (
        |  SELECT doc_id,
        |    CASE WHEN doc_id % 5 = 0 THEN text || ' [edited]' ELSE text END AS text
        |  FROM documents WHERE doc_id % 17 <> 0
        |  UNION ALL
        |  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 23 = 0)
        |SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
        |  CASE WHEN o.doc_id IS NULL THEN 'added'
        |       WHEN n.doc_id IS NULL THEN 'removed'
        |       WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM oldt o FULL OUTER JOIN newt n ON o.doc_id = n.doc_id
        |ORDER BY doc_id""".stripMargin) { (s, d) =>
      // Snapshot diff between two corpus crawls (CDC): the "new" crawl
      // deterministically drops every 17th doc (removed), edits every 5th
      // (changed) and discovers re-keyed copies of every 23rd (added) —
      // all four statuses non-vacuous by construction. One full outer
      // join + null-safe compares; the oracle states the identical
      // IS NOT DISTINCT FROM logic.
      val docs = documents(s, d).select("doc_id", "text")
      val newer = docs.filter(col("doc_id") % 17 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 5 === 0, concat(col("text"), lit(" [edited]")))
            .otherwise(col("text")).as("text"))
        .unionByName(docs.filter(col("doc_id") % 23 === 0)
          .select((col("doc_id") + 100000).as("doc_id"), col("text")))
      graft.operators.Maintenance.snapshotDiff(docs, newer, Seq("doc_id"))
        .select("doc_id", "status")
        .orderBy("doc_id")
    },
    Q("u12_snapshot_publish",
      """WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |v1 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |  FROM e GROUP BY 1),
        |v2 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value * 2
        |                       ELSE value END AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |  FROM e GROUP BY 1)
        |SELECT 1 AS version, event_type, n, value_sum FROM v1
        |UNION ALL
        |SELECT 2 AS version, event_type, n, value_sum FROM v2
        |ORDER BY version, event_type""".stripMargin) { (s, d) =>
      // Atomic multi-partition publish + snapshot-pinned reads (VERDICT
      // r10 missing #2): version 1 publishes the full event table
      // partitioned by event_type; version 2 REPLACES only the 'click'
      // partition with value-doubled rows through one atomic manifest
      // rename (graft.core.Snapshots — data files are immutable and
      // additive, the manifest pins each version's exact file set). The
      // result reads BOTH versions back AFTER v2 landed: v1's rows prove
      // a pinned reader sees pre-publish bytes (the oracle computes v1
      // from the raw table — any leakage of v2's rewritten partition
      // into the pinned read would double the click sum and break the
      // hash), v2's rows prove the partition swap + carry-over of the
      // four untouched partitions. Decimal-exact sums on both sides.
      import graft.core.{Num, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u12_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_type", "event_id", "value")
      val v1 = Snapshots.publishPartitions(s, root)(stage =>
        ev.write.partitionBy("event_type").parquet(stage))
      val v2 = Snapshots.publishPartitions(s, root)(stage =>
        ev.filter(col("event_type") === "click")
          .withColumn("value", col("value") * 2)
          .write.partitionBy("event_type").parquet(stage))
      def agg(version: Long) = Snapshots.readSnapshot(s, root, Some(version))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
        .withColumn("version", lit(version).cast("int"))
      agg(v1).unionByName(agg(v2))
        .select("version", "event_type", "n", "value_sum")
        .orderBy("version", "event_type")
    },
    Q("s18_stats_skipping",
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |FROM events WHERE value >= 25 AND value <= 45
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // MANIFEST-LEVEL data skipping: the publish records each data
      // file's footer (min, max) for `value` as manifest stat lines (no
      // data IO — footers only), the write range-clusters on value
      // (repartitionByRange before the partitionBy) so per-file ranges
      // are narrow, and the range read plans ONLY files whose recorded
      // range intersects [25, 45] — files that cannot match are never
      // opened, one level above parquet's own row-group pruning.
      // Exactness never depends on the stats (the row filter applies on
      // top; statless files stay in the plan), so the oracle is the
      // plain filtered aggregate. SnapshotSpec pins the skip itself
      // (planned input files a strict subset, same rows).
      import graft.core.{Num, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_s18_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_type", "event_id", "value")
      Snapshots.publishPartitions(s, root, statsCols = Seq("value")) { stage =>
        ev.repartitionByRange(8, col("value"))
          .write.partitionBy("event_type").parquet(stage)
      }
      Snapshots.readSnapshotRange(s, root, "value", 25.0, 45.0)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
        .orderBy("event_type")
    },
    Q("u13_snapshot_cdc",
      """WITH e AS (SELECT event_type, event_id, value FROM events
        |  WHERE value IS NOT NULL),
        |ch AS (
        |  SELECT 'added' AS change, event_type, event_id, value * 2 AS value
        |  FROM e WHERE event_type = 'click' AND value <> 0
        |  UNION ALL
        |  SELECT 'removed', event_type, event_id, value
        |  FROM e WHERE event_type = 'click' AND value <> 0)
        |SELECT change, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |FROM ch GROUP BY 1, 2
        |ORDER BY change, event_type""".stripMargin) { (s, d) =>
      // Incremental CHANGE CAPTURE from the manifest diff: version 2
      // replaced only the 'click' partition (value-doubled rows), and
      // snapshotChanges reads ONLY the files in the two manifests'
      // symmetric difference — IO proportional to the churn, never the
      // table (the four untouched partitions' files are identical
      // entries in both manifests and are never opened; SnapshotSpec
      // pins the input-file set). Within the changed files rows
      // net-diff as multisets, so the zero-valued click rows — whose
      // doubling is a fixpoint — correctly emit NO change, which the
      // oracle mirrors with its value <> 0 guard. This is u8's
      // two-full-scan diff upgraded to the incremental form a 100 TB
      // downstream maintains on.
      import graft.core.{Num, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u13_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_type", "event_id", "value")
      val v1 = Snapshots.publishPartitions(s, root)(stage =>
        ev.write.partitionBy("event_type").parquet(stage))
      val v2 = Snapshots.publishPartitions(s, root)(stage =>
        ev.filter(col("event_type") === "click")
          .withColumn("value", col("value") * 2)
          .write.partitionBy("event_type").parquet(stage))
      Snapshots.snapshotChanges(s, root, v1, v2)
        .groupBy("change", "event_type")
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
        .orderBy("change", "event_type")
    },
    Q("u14_rollback",
      """WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |v1 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |  FROM e GROUP BY 1),
        |v2 AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value * 2
        |                       ELSE value END AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |  FROM e GROUP BY 1)
        |SELECT 'latest_after_rollback' AS phase, event_type, n, value_sum FROM v1
        |UNION ALL
        |SELECT 'pinned_bad_version' AS phase, event_type, n, value_sum FROM v2
        |ORDER BY phase, event_type""".stripMargin) { (s, d) =>
      // ROLLBACK as a forward commit (Snapshots.rollbackTo): version 2
      // is a bad publish (the doubled 'click' partition); rolling back
      // to v1 commits version 3 whose manifest is a copy of v1's file
      // list — no data moves, nothing is deleted, history stays linear.
      // The result proves both halves of the contract: the LATEST read
      // after the rollback equals v1's content exactly (the oracle
      // computes it from the raw table — any leakage of v2's rewrite
      // breaks the hash), and the bad version REMAINS pinned-readable
      // for forensics. The rollback window is vacuum's keepVersions by
      // construction (rollbackTo fails loudly past it).
      import graft.core.{Num, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u14_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_type", "event_id", "value")
      val v1 = Snapshots.publishPartitions(s, root)(stage =>
        ev.write.partitionBy("event_type").parquet(stage))
      val v2 = Snapshots.publishPartitions(s, root)(stage =>
        ev.filter(col("event_type") === "click")
          .withColumn("value", col("value") * 2)
          .write.partitionBy("event_type").parquet(stage))
      Snapshots.rollbackTo(s, root, v1)
      def agg(df: org.apache.spark.sql.DataFrame, phase: String) =
        df.groupBy("event_type")
          .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
          .withColumn("phase", lit(phase))
      agg(Snapshots.readSnapshot(s, root), "latest_after_rollback")
        .unionByName(agg(Snapshots.readSnapshot(s, root, Some(v2)), "pinned_bad_version"))
        .select("phase", "event_type", "n", "value_sum")
        .orderBy("phase", "event_type")
    },
    Q("u15_snapshot_evolve",
      """WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value * 0.25
        |                     ELSE NULL END AS DECIMAL(30,6))) AS DOUBLE) AS eur_sum
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // SCHEMA EVOLUTION across snapshot versions: version 2 rewrites
      // the 'click' partition with an ADDED column (value_eur) the v1
      // files never had. The merged-schema snapshot read plans both
      // generations' files as the union schema — old files yield NULL
      // for the new column, new files carry it — so a table can evolve
      // column-by-column under the manifest layer without rewriting
      // untouched partitions (the additive-evolution contract every
      // long-lived 100 TB table needs; u10 proves the same for plain
      // trees, this composes it with version pinning). The oracle states
      // the expected union-schema aggregate from the raw table: any
      // leakage (v1 clicks surviving, eur values on non-click rows)
      // breaks the hash.
      import graft.core.{Num, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u15_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_type", "event_id", "value")
      Snapshots.publishPartitions(s, root)(stage =>
        ev.write.partitionBy("event_type").parquet(stage))
      Snapshots.publishPartitions(s, root)(stage =>
        ev.filter(col("event_type") === "click")
          .withColumn("value_eur", col("value") * 0.25)
          .write.partitionBy("event_type").parquet(stage))
      Snapshots.readSnapshot(s, root, mergeSchema = true)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          Num.dsum(col("value")).as("value_sum"),
          Num.dsum(col("value_eur")).as("eur_sum"))
        .orderBy("event_type")
    },

    Q("u16_merge",
      """WITH e AS (SELECT event_id, event_type, value FROM events
        |  WHERE value IS NOT NULL),
        |src AS (
        |  SELECT event_id, 'signup' AS event_type, value, 'delete' AS op
        |  FROM e WHERE event_type = 'signup'
        |  UNION ALL
        |  SELECT event_id, 'view', value + 100, 'upsert'
        |  FROM e WHERE event_type = 'click' AND event_id % 11 = 0
        |  UNION ALL
        |  SELECT event_id + 1000000, 'promo', 1.5, 'upsert'
        |  FROM e WHERE event_type = 'purchase' AND event_id % 13 = 0),
        |final AS (
        |  SELECT e.event_id, e.event_type, e.value FROM e
        |  WHERE e.event_id NOT IN (SELECT event_id FROM src)
        |  UNION ALL
        |  SELECT event_id, event_type, value FROM src WHERE op <> 'delete')
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |FROM final GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // Keyed three-way MERGE committed as ONE atomic snapshot version
      // (SnapshotOps.merge): the source batch deletes every 'signup' row
      // (emptying that partition — it must DROP from the manifest, which
      // a staged tree alone cannot express), MOVES every 11th click to
      // the 'view' partition with value+100 (an update that crosses
      // partitions: both the old and new partition rewrite in the same
      // commit, so no version ever shows the row twice or zero times),
      // and INSERTS brand-new 'promo' rows (a partition born in the
      // merge). Only affected partitions rewrite — 'error' and
      // 'purchase' carry over via the manifest, unread. The oracle
      // states the textbook merge semantics (target minus source keys,
      // union surviving source rows); the hash gates all four paths at
      // once. Scale shape: the probe for affected partitions is a
      // column-pruned key scan broadcast-joined against the source keys.
      import graft.core.{Num, SnapshotOps, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u16_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_id", "event_type", "value")
      Snapshots.publishPartitions(s, root)(stage =>
        ev.write.partitionBy("event_type").parquet(stage))
      val deletes = ev.filter(col("event_type") === "signup")
        .withColumn("op", lit("delete"))
      val moves = ev.filter(col("event_type") === "click" && col("event_id") % 11 === 0)
        .select(col("event_id"), lit("view").as("event_type"),
          (col("value") + 100).as("value"), lit("upsert").as("op"))
      val inserts = ev.filter(col("event_type") === "purchase" && col("event_id") % 13 === 0)
        .select((col("event_id") + 1000000).as("event_id"),
          lit("promo").as("event_type"), lit(1.5).as("value"), lit("upsert").as("op"))
      SnapshotOps.merge(s, root, deletes.unionByName(moves).unionByName(inserts),
        keyCols = Seq("event_id"), partitionCol = "event_type")
      Snapshots.readSnapshot(s, root)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
        .orderBy("event_type")
    },
    Q("u17_optimize",
      """WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |agg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |  FROM e GROUP BY event_type)
        |SELECT 'after' AS phase, event_type, n, value_sum,
        |  CAST(1 AS BIGINT) AS n_files FROM agg
        |UNION ALL
        |SELECT 'before', event_type, n, value_sum, CAST(12 AS BIGINT) FROM agg
        |ORDER BY phase, event_type""".stripMargin) { (s, d) =>
      // OPTIMIZE (bin-packed small-file compaction) as an atomic version:
      // version 1 deliberately fragments every partition into 12 files
      // (a round-robin repartition before the write — the shape repeated
      // small appends leave behind); SnapshotOps.optimize picks the
      // fragmented partitions FROM THE MANIFEST LISTING (no data IO
      // decides), rewrites each into its computed bin count (1 here —
      // the 512 MiB target dwarfs the bytes), and commits. The output
      // hash-gates three facts at once: content identical before and
      // after (same n/value_sum per partition — the oracle is the plain
      // aggregate), the fragmentation was real (n_files=12 in the pinned
      // v1 read), and the packing landed (n_files=1 in the latest read;
      // a (partCol, bin) range shuffle makes the file count exactly the
      // bin count — equal keys never split across range tasks).
      import graft.core.{Num, SnapshotOps, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u17_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_id", "event_type", "value")
      val v1 = Snapshots.publishPartitions(s, root)(stage =>
        ev.repartition(12).write.partitionBy("event_type").parquet(stage))
      val v2 = SnapshotOps.optimize(s, root, targetFileBytes = 512L << 20)
        .getOrElse(sys.error("u17_optimize: nothing qualified for compaction"))
      def prof(version: Long, phase: String) =
        Snapshots.readSnapshot(s, root, Some(version))
          .withColumn("__file", input_file_name())
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"),
            countDistinct(col("__file")).as("n_files"))
          .withColumn("phase", lit(phase))
      prof(v2, "after").unionByName(prof(v1, "before"))
        .select("phase", "event_type", "n", "value_sum", "n_files")
        .orderBy("phase", "event_type")
    },
    Q("u18_expect_publish",
      """WITH e AS (SELECT event_id, event_type, value FROM events),
        |aug AS (SELECT * FROM e
        |  UNION ALL
        |  SELECT event_id, event_type, value + 1 FROM e
        |  WHERE event_id % 997 = 0 AND value <= 400),
        |f0 AS (SELECT *, CASE WHEN value IS NULL THEN 'value_present'
        |                      WHEN value > 400 THEN 'value_cap'
        |                      ELSE '' END AS v0 FROM aug),
        |f AS (SELECT event_id, event_type, value,
        |    CASE WHEN v0 = '' AND COUNT(*) OVER (PARTITION BY event_id, v0 = '') > 1
        |         THEN 'unique_key' ELSE v0 END AS violated FROM f0)
        |SELECT 'committed' AS phase, event_type AS key, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |FROM f WHERE violated = '' GROUP BY event_type
        |UNION ALL
        |SELECT 'meta', 'expect_quarantined',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM f WHERE violated <> ''), NULL
        |UNION ALL
        |SELECT 'quarantined', violated, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |FROM f WHERE violated <> '' GROUP BY violated
        |ORDER BY phase, key""".stripMargin) { (s, d) =>
      // Constraint-gated publish (SnapshotOps.publishExpect): the batch
      // carries planted duplicate keys (every 997th event re-sent with a
      // drifted value — BOTH copies must quarantine; a loader silently
      // picking one is corruption) and over-cap values (value > 400).
      // One pass flags rows; clean rows commit atomically, violators
      // land in the version's quarantine dir with the failure named,
      // and the manifest records the audit counts. The result reads all
      // three surfaces back — committed table, quarantine dir, manifest
      // metadata — and the oracle restates the gate logic row-for-row.
      import graft.core.{Num, SnapshotOps, Snapshots}
      import graft.core.SnapshotOps.Expect
      val root = s"${sys.props("java.io.tmpdir")}/graft_u18_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).select("event_id", "event_type", "value")
      val aug = ev.unionByName(
        ev.filter(col("event_id") % 997 === 0 && col("value") <= 400)
          .withColumn("value", col("value") + 1))
      val (version, nQuar) = SnapshotOps.publishExpect(s, root, aug, "event_type",
        Seq(Expect("value_present", col("value").isNotNull),
          Expect("value_cap", col("value").isNull || col("value") <= 400)),
        uniqueKey = Seq("event_id"))
      val committed = Snapshots.readSnapshot(s, root, Some(version))
        .groupBy(col("event_type").as("key"))
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
        .withColumn("phase", lit("committed"))
      val quarantined =
        if (nQuar == 0)
          committed.limit(0)
        else
          SnapshotOps.readQuarantine(s, root, version).get
            .groupBy(col("violated").as("key"))
            .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
            .withColumn("phase", lit("quarantined"))
      val metaN = Snapshots.manifestMeta(s, root, version)("expect_quarantined").toLong
      val meta = s.range(1).select(lit("expect_quarantined").as("key"),
        lit(metaN).as("n"), lit(null).cast("double").as("value_sum"),
        lit("meta").as("phase"))
      committed.unionByName(quarantined).unionByName(meta)
        .select("phase", "key", "n", "value_sum")
        .orderBy("phase", "key")
    },
    Q("u19_incr_view",
      """WITH e AS (SELECT event_type, event_id, value FROM events
        |  WHERE value IS NOT NULL)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value * 2
        |                     ELSE value END AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // INCREMENTAL VIEW MAINTENANCE closed over the snapshot layer: the
      // materialized aggregate of version 1 is advanced to version 2
      // using ONLY the manifest diff — snapshotChanges reads just the
      // rewritten partition's files (u13's contract), its added/removed
      // rows become SIGNED partials (+n/+sum for added, −n/−sum for
      // removed), and one partial-merge yields v2's view without ever
      // re-reading the table. The oracle is the FULL v2 recompute from
      // the raw rows: a hash match proves the IVM identity
      // view(v1) ⊕ Δ(v1→v2) == view(v2) exactly (decimal sums — no FP
      // drift to hide behind). This is a16's merge identity composed
      // with u13's change capture: the maintenance loop a 100 TB
      // downstream aggregate actually runs on each commit.
      import graft.core.{Num, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u19_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_type", "event_id", "value")
      val v1 = Snapshots.publishPartitions(s, root)(stage =>
        ev.write.partitionBy("event_type").parquet(stage))
      val v2 = Snapshots.publishPartitions(s, root)(stage =>
        ev.filter(col("event_type") === "click")
          .withColumn("value", col("value") * 2)
          .write.partitionBy("event_type").parquet(stage))
      val dec = "decimal(30,6)"
      val base = Snapshots.readSnapshot(s, root, Some(v1))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("value").cast(dec)).as("vs"))
      val delta = Snapshots.snapshotChanges(s, root, v1, v2)
        .withColumn("sgn", when(col("change") === "added", 1L).otherwise(-1L))
        .groupBy("event_type")
        .agg(sum(col("sgn")).as("n"),
          sum(col("value").cast(dec) * col("sgn")).as("vs"))
      graft.ops.Aggregates.mergePartialAggs(Seq(base, delta),
          Seq("event_type"), Seq("n", "vs"))
        .filter(col("n") > 0)
        .select(col("event_type"), col("n"),
          col("vs").cast("double").as("value_sum"))
        .orderBy("event_type")
    },
    Q("u20_clone",
      """WITH e AS (SELECT event_type, value FROM events WHERE value IS NOT NULL),
        |src AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |  FROM e GROUP BY event_type),
        |cln AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(CASE WHEN event_type = 'click' THEN value * 2
        |                       ELSE value END AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |  FROM e GROUP BY event_type)
        |SELECT 'clone' AS side, event_type, n, value_sum FROM cln
        |UNION ALL
        |SELECT 'source', event_type, n, value_sum FROM src
        |ORDER BY side, event_type""".stripMargin) { (s, d) =>
      // ZERO-COPY CLONE (Snapshots.cloneTable): the clone's first version
      // pins the source's files by absolute manifest reference — no data
      // moves — and then DIVERGES copy-on-write: rewriting the 'click'
      // partition on the clone stages fresh files under the clone root
      // while the four untouched partitions keep reading the source's
      // immutable files, and the source never observes any of it. The
      // result reads BOTH tables after the divergence: the source row
      // group proving isolation (any leakage of the clone's doubled
      // values breaks the hash), the clone group proving the reference +
      // local mix reads as one table. The dev/staging fork workflow
      // ("experiment on prod data without copying 100 TB") in one verb.
      import graft.core.{Num, Snapshots}
      val tmp = sys.props("java.io.tmpdir")
      val key = graft.core.Tables.pathKey(d)
      val src = s"$tmp/graft_u20s_$key"
      val dst = s"$tmp/graft_u20c_$key"
      Seq(src, dst).foreach { r =>
        val p = new org.apache.hadoop.fs.Path(r)
        p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
      }
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_type", "event_id", "value")
      Snapshots.publishPartitions(s, src)(stage =>
        ev.write.partitionBy("event_type").parquet(stage))
      Snapshots.cloneTable(s, src, dst)
      Snapshots.publishPartitions(s, dst)(stage =>
        ev.filter(col("event_type") === "click")
          .withColumn("value", col("value") * 2)
          .write.partitionBy("event_type").parquet(stage))
      def agg(root: String, side: String) = Snapshots.readSnapshot(s, root)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
        .withColumn("side", lit(side))
      agg(dst, "clone").unionByName(agg(src, "source"))
        .select("side", "event_type", "n", "value_sum")
        .orderBy("side", "event_type")
    },
    Q("u21_zorder",
      """WITH e AS (SELECT event_type, user_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events WHERE value IS NOT NULL)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(cents) AS BIGINT) AS cents_sum
        |FROM e WHERE user_id BETWEEN 40 AND 80
        |GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // OPTIMIZE ZORDER: the whole table rewritten in ONE atomic version
      // clustered by the Morton z-value of (user_id, cents), so the
      // recorded footer ranges become narrow on BOTH columns and range
      // reads prune files for predicates on EITHER — multi-dimensional
      // data skipping where single-column clustering serves one column
      // and scatters the other (o5's write-time key composed with u17's
      // compaction and s18's stats pruning). The result reads a user_id
      // range through readSnapshotRange over the z-ordered table; the
      // oracle is the plain filtered aggregate — exactness never depends
      // on the clustering, SnapshotOpsSpec pins the both-column skip.
      import graft.core.{SnapshotOps, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u21_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), col("event_id"), col("user_id"),
          round(col("value") * 100).cast("long").as("cents"))
      Snapshots.publishPartitions(s, root)(stage =>
        ev.repartition(8).write.partitionBy("event_type").parquet(stage))
      SnapshotOps.optimizeZorder(s, root, ("user_id", "cents"),
        targetFileBytes = 64L << 10)
      Snapshots.readSnapshotRange(s, root, "user_id", 40, 80)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("cents_sum"))
        .orderBy("event_type")
    },
    Q("s20_bloom_point",
      """WITH k AS (SELECT user_id AS k FROM events WHERE event_id = 42)
        |SELECT e.event_id, e.event_type, e.value
        |FROM events e JOIN k ON e.user_id = k.k
        |ORDER BY e.event_id""".stripMargin) { (s, d) =>
      // BLOOM-SIDECAR point lookup: the publish records a per-file bloom
      // filter over user_id (one extra scan at write time, sparse
      // non-zero words only), the write range-clusters on user_id so
      // each file holds few distinct users, and readSnapshotEquals plans
      // ONLY files whose bloom can contain the probed key — the
      // needle-in-haystack read ("this user's rows out of 100 TB") costs
      // IO proportional to the match, not the table. Exactness never
      // depends on the bloom (the equality filter applies on top; a
      // false positive just reads one extra file), so the oracle is the
      // plain key join. SnapshotSpec pins the skip itself (planned input
      // files a strict subset, same rows).
      import graft.core.Snapshots
      val root = s"${sys.props("java.io.tmpdir")}/graft_s20_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).select("event_id", "event_type", "user_id", "value")
      Snapshots.publishPartitions(s, root, bloomCols = Seq("user_id")) { stage =>
        ev.repartitionByRange(8, col("user_id"))
          .write.partitionBy("event_type").parquet(stage)
      }
      val key = ev.filter(col("event_id") === 42).select("user_id").head().getLong(0)
      Snapshots.readSnapshotEquals(s, root, "user_id", lit(key))
        .select("event_id", "event_type", "value")
        .orderBy("event_id")
    },

    Q("u22_table_constraints",
      """WITH e AS (SELECT event_id, event_type, value FROM events),
        |seed AS (SELECT * FROM e WHERE event_type <> 'click'),
        |batch AS (
        |  SELECT * FROM e WHERE event_type = 'click'
        |  UNION ALL
        |  SELECT event_id, event_type, value + 500 FROM e
        |  WHERE event_type = 'click' AND event_id % 97 = 0
        |  UNION ALL
        |  SELECT event_id, event_type, NULL FROM e
        |  WHERE event_type = 'click' AND event_id % 89 = 0),
        |f AS (SELECT event_id, event_type, value,
        |    CASE WHEN value IS NULL THEN 'value_present'
        |         WHEN value > 400 THEN 'value_cap' ELSE '' END AS violated
        |  FROM batch),
        |tbl AS (SELECT event_type, value FROM seed
        |  UNION ALL SELECT event_type, value FROM f WHERE violated = '')
        |SELECT 'committed' AS phase, event_type AS key, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |FROM tbl GROUP BY event_type
        |UNION ALL
        |SELECT 'meta', 'constraint_quarantined',
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM f WHERE violated <> ''), NULL
        |UNION ALL
        |SELECT 'quarantined', violated, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |FROM f WHERE violated <> '' GROUP BY violated
        |ORDER BY phase, key""".stripMargin) { (s, d) =>
      // PERSISTED table constraints (Snapshots.setConstraints): unlike
      // u18's per-call expectations, the constraint set is a metadata
      // commit the TABLE owns — every later publish verb re-enforces it
      // with no caller cooperation. The entry seeds the table, persists
      // `value_present`/`value_cap`, then runs a PLAIN publishPartitions
      // of a batch with planted violations (every 97th click re-sent
      // over-cap, every 89th with a NULL): violators quarantine with the
      // failed constraint named, audit counts land in the manifest, the
      // clean rows commit. Pre-constraint history is NOT retro-scanned
      // (IO proportionality — the gate is on writes). Scale shape: the
      // enforcement scan is one aggregate pass over the BATCH, never the
      // table; SnapshotOpsSpec pins merge/additive-commit enforcement.
      import graft.core.{Num, SnapshotOps, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u22_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).select("event_id", "event_type", "value")
      Snapshots.publishPartitions(s, root)(stage =>
        ev.filter(col("event_type") =!= "click")
          .write.partitionBy("event_type").parquet(stage))
      Snapshots.setConstraints(s, root, Seq(
        "value_cap" -> "value IS NULL OR value <= 400",
        "value_present" -> "value IS NOT NULL"))
      val clicks = ev.filter(col("event_type") === "click")
      val batch = clicks
        .unionByName(clicks.filter(col("event_id") % 97 === 0)
          .withColumn("value", col("value") + 500))
        .unionByName(clicks.filter(col("event_id") % 89 === 0)
          .withColumn("value", lit(null).cast("double")))
      val v = Snapshots.publishPartitions(s, root)(stage =>
        batch.write.partitionBy("event_type").parquet(stage))
      val committed = Snapshots.readSnapshot(s, root)
        .groupBy(col("event_type").as("key"))
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
        .withColumn("phase", lit("committed"))
      val quarantined = SnapshotOps.readConstraintQuarantine(s, root, v)
        .map(_.groupBy(col("violated").as("key"))
          .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
          .withColumn("phase", lit("quarantined")))
        .getOrElse(committed.limit(0))
      val metaN = Snapshots.manifestMeta(s, root, v)
        .getOrElse("constraint_quarantined", "0").toLong
      val meta = s.range(1).select(lit("constraint_quarantined").as("key"),
        lit(metaN).as("n"), lit(null).cast("double").as("value_sum"),
        lit("meta").as("phase"))
      committed.unionByName(quarantined).unionByName(meta)
        .select("phase", "key", "n", "value_sum")
        .orderBy("phase", "key")
    },
    Q("u23_rename_evolve",
      """WITH e AS (SELECT event_id, event_type, value FROM events
        |  WHERE value IS NOT NULL),
        |latest AS (
        |  SELECT event_type, value AS amount FROM e WHERE event_type <> 'click'
        |  UNION ALL
        |  SELECT event_type, value * 2 FROM e WHERE event_type = 'click')
        |SELECT 'latest' AS phase, event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(amount AS DECIMAL(30,6))) AS DOUBLE) AS amount_sum
        |FROM latest GROUP BY event_type
        |UNION ALL
        |SELECT 'pinned_v1', event_type, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |FROM e GROUP BY event_type
        |ORDER BY phase, event_type""".stripMargin) { (s, d) =>
      // COLUMN RENAME as a metadata commit (Snapshots.renameColumn): the
      // rename writes no data file — old generations keep their physical
      // `value` column and re-map at read through the manifest's colmap
      // chain; the post-rename publish (the doubled click partition)
      // writes `amount` natively. The latest read proves both
      // generations surface under the NEW name in one scan (four
      // partitions' files predate the rename, one postdates it), and the
      // pinned pre-rename read proves old versions are untouched (still
      // `value` — the oracle aggregates it verbatim). Non-additive
      // evolution without a table rewrite — the VERDICT r11 missing #4
      // shape. Alias-chained stat skipping is pinned in SnapshotOpsSpec.
      import graft.core.{Num, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u23_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_id", "event_type", "value")
      val v1 = Snapshots.publishPartitions(s, root)(stage =>
        ev.write.partitionBy("event_type").parquet(stage))
      Snapshots.renameColumn(s, root, "value", "amount")
      Snapshots.publishPartitions(s, root)(stage =>
        ev.filter(col("event_type") === "click")
          .select(col("event_id"), col("event_type"),
            (col("value") * 2).as("amount"))
          .write.partitionBy("event_type").parquet(stage))
      val latest = Snapshots.readSnapshot(s, root)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), Num.dsum(col("amount")).as("amount_sum"))
        .withColumn("phase", lit("latest"))
      val pinned = Snapshots.readSnapshot(s, root, Some(v1))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("amount_sum"))
        .withColumn("phase", lit("pinned_v1"))
      latest.unionByName(pinned)
        .select("phase", "event_type", "n", "amount_sum")
        .orderBy("phase", "event_type")
    },

    Q("u24_deletion_vectors",
      """WITH e AS (SELECT event_id, event_type, value FROM events
        |  WHERE value IS NOT NULL),
        |src AS (
        |  SELECT event_id, 'signup' AS event_type, value, 'delete' AS op
        |  FROM e WHERE event_type = 'signup'
        |  UNION ALL
        |  SELECT event_id, 'view', value + 100, 'upsert'
        |  FROM e WHERE event_type = 'click' AND event_id % 11 = 0
        |  UNION ALL
        |  SELECT event_id + 1000000, 'promo', 1.5, 'upsert'
        |  FROM e WHERE event_type = 'purchase' AND event_id % 13 = 0),
        |final AS (
        |  SELECT e.event_id, e.event_type, e.value FROM e
        |  WHERE e.event_id NOT IN (SELECT event_id FROM src)
        |  UNION ALL
        |  SELECT event_id, event_type, value FROM src WHERE op <> 'delete'),
        |fagg AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |  FROM final GROUP BY event_type)
        |SELECT 'final' AS phase, event_type, n, value_sum FROM fagg
        |UNION ALL
        |SELECT 'pinned_v1', event_type, CAST(COUNT(*) AS BIGINT),
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE)
        |FROM e GROUP BY event_type
        |UNION ALL
        |SELECT 'purged', event_type, n, value_sum FROM fagg
        |ORDER BY phase, event_type""".stripMargin) { (s, d) =>
      // DELETION VECTORS (merge-on-read): the SAME CDC batch as u16 —
      // delete every signup, move every 11th click to 'view' with
      // value+100, insert promos — but committed by SnapshotOps
      // .mergeOnRead: matched target rows die as (file, row-position)
      // pairs in the version's _dv sidecar; NO existing data file opens
      // for rewrite and none moves (SnapshotOpsSpec pins the byte-level
      // zero-churn claim), the survivors land additively. At 100 TB this
      // is the frequent-small-CDC shape: commit cost ~|batch| rows, not
      // ~|matched files| (u16's copy-on-write trade). The three phases
      // hash-gate the lifecycle at once: 'final' proves the DV-subtracted
      // read equals textbook merge semantics, 'pinned_v1' proves time
      // travel under pending DVs (the deleted rows still read at v1), and
      // 'purged' proves purgeDeletes materializes the vectors file-grain
      // without changing content (same aggregate, DV-free table after).
      import graft.core.{Num, SnapshotOps, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u24_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_id", "event_type", "value")
      // no bloom index here ON PURPOSE: this batch's keys land in every
      // file (signups spread uniformly), so candidate pruning cannot
      // bite and the sidecar build would only pad the timing — the
      // bloom-pruned DV path is pinned in SnapshotOpsSpec instead
      val v1 = Snapshots.publishPartitions(s, root)(
        stage => ev.write.partitionBy("event_type").parquet(stage))
      val deletes = ev.filter(col("event_type") === "signup")
        .withColumn("op", lit("delete"))
      val moves = ev.filter(col("event_type") === "click" && col("event_id") % 11 === 0)
        .select(col("event_id"), lit("view").as("event_type"),
          (col("value") + 100).as("value"), lit("upsert").as("op"))
      val inserts = ev.filter(col("event_type") === "purchase" && col("event_id") % 13 === 0)
        .select((col("event_id") + 1000000).as("event_id"),
          lit("promo").as("event_type"), lit(1.5).as("value"), lit("upsert").as("op"))
      val v2 = SnapshotOps.mergeOnRead(s, root,
        deletes.unionByName(moves).unionByName(inserts),
        keyCols = Seq("event_id"), partitionCol = "event_type")
      val v3 = SnapshotOps.purgeDeletes(s, root)
        .getOrElse(sys.error("u24: pending deletion vectors must purge"))
      def agg(version: Long, phase: String) =
        Snapshots.readSnapshot(s, root, Some(version))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
          .withColumn("phase", lit(phase))
      agg(v2, "final").unionByName(agg(v1, "pinned_v1")).unionByName(agg(v3, "purged"))
        .select("phase", "event_type", "n", "value_sum")
        .orderBy("phase", "event_type")
    },

    Q("u25_listing_count",
      """WITH e AS (SELECT event_id, event_type, value FROM events
        |  WHERE value IS NOT NULL)
        |SELECT 'v1' AS phase, CAST(COUNT(*) AS BIGINT) AS n FROM e
        |UNION ALL
        |SELECT 'v2', CAST(COUNT(*) AS BIGINT) FROM e WHERE event_type <> 'signup'
        |ORDER BY phase""".stripMargin) { (s, d) =>
      // LISTING-COST COUNT(*): every publish records per-file footer row
      // counts in the manifest (#rows= headers), so snapshotRowCount
      // answers an exact COUNT over any pinned version by summing the
      // listing and subtracting pending deletion-vector positions — zero
      // data files open, no scan, no shuffle; at 100 TB the difference
      // between a metadata lookup and a cluster-wide job. The two phases
      // gate both paths at once: v1 (plain listing sum) and v2 (the same
      // sum minus a DV delete's positions, proving count and vectors
      // stay consistent); the oracle recomputes both from the raw rows.
      import graft.core.{SnapshotOps, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u25_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_id", "event_type", "value")
      val v1 = Snapshots.publishPartitions(s, root)(stage =>
        ev.write.partitionBy("event_type").parquet(stage))
      val v2 = SnapshotOps.mergeOnRead(s, root,
        ev.filter(col("event_type") === "signup").withColumn("op", lit("delete")),
        keyCols = Seq("event_id"), partitionCol = "event_type")
      import s.implicits._
      Seq(("v1", Snapshots.snapshotRowCount(s, root, Some(v1))),
        ("v2", Snapshots.snapshotRowCount(s, root, Some(v2))))
        .toDF("phase", "n").orderBy("phase")
    },

    Q("u26_change_feed",
      """WITH e AS (SELECT event_id, event_type, value FROM events
        |  WHERE value IS NOT NULL),
        |src AS (
        |  SELECT event_id, 'signup' AS event_type, value, 'delete' AS op
        |  FROM e WHERE event_type = 'signup'
        |  UNION ALL
        |  SELECT event_id, 'view', value + 100, 'upsert'
        |  FROM e WHERE event_type = 'click' AND event_id % 11 = 0),
        |final AS (
        |  SELECT e.event_id, e.event_type, e.value FROM e
        |  WHERE e.event_id NOT IN (SELECT event_id FROM src)
        |  UNION ALL
        |  SELECT event_id, event_type, value FROM src WHERE op <> 'delete')
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |FROM final GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // CHANGE-FEED consumption end to end: a downstream aggregate is
      // built from the feed's BOOTSTRAP (full snapshot as 'added'), then
      // advanced by ONE incremental window spanning a merge-on-read CDC
      // commit (deletes arrive as DELETION-VECTOR deltas — no file churn
      // to diff — and moves as DV-remove + additive-add). Each window
      // becomes signed partials merged a16-style; the oracle is the full
      // recompute, so a hash match proves bootstrap ⊕ window == final
      // exactly — the at-least-once consumer loop (ChangeFeed.consume:
      // durable cursor, advance-after-success) a 100 TB downstream
      // materialization runs on every tick, reading only the churn.
      import graft.core.{ChangeFeed, Num, SnapshotOps, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u26_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_id", "event_type", "value")
      Snapshots.publishPartitions(s, root)(stage =>
        ev.write.partitionBy("event_type").parquet(stage))
      val dec = "decimal(30,6)"
      var downstream: org.apache.spark.sql.DataFrame = null
      def fold(changes: org.apache.spark.sql.DataFrame): Unit = {
        val partial = changes
          .withColumn("sgn", when(col("change") === "added", 1L).otherwise(-1L))
          .groupBy("event_type")
          .agg(sum(col("sgn")).as("n"),
            sum(col("value").cast(dec) * col("sgn")).as("vs"))
        downstream =
          if (downstream == null) partial.localCheckpoint(true)
          else graft.ops.Aggregates.mergePartialAggs(Seq(downstream, partial),
            Seq("event_type"), Seq("n", "vs")).localCheckpoint(true)
      }
      ChangeFeed.consume(s, root, "u26")(fold)
      val deletes = ev.filter(col("event_type") === "signup")
        .withColumn("op", lit("delete"))
      val moves = ev.filter(col("event_type") === "click" && col("event_id") % 11 === 0)
        .select(col("event_id"), lit("view").as("event_type"),
          (col("value") + 100).as("value"), lit("upsert").as("op"))
      SnapshotOps.mergeOnRead(s, root, deletes.unionByName(moves),
        keyCols = Seq("event_id"), partitionCol = "event_type")
      ChangeFeed.consume(s, root, "u26")(fold)
      downstream.filter(col("n") > 0)
        .select(col("event_type"), col("n"),
          col("vs").cast("double").as("value_sum"))
        .orderBy("event_type")
    },

    Q("u27_dml_where",
      """WITH e AS (SELECT event_id, event_type, value FROM events
        |  WHERE value IS NOT NULL),
        |afterdel AS (SELECT * FROM e WHERE NOT (value > 400)),
        |afterupd AS (
        |  SELECT event_id, event_type,
        |    CASE WHEN event_type = 'click' THEN value * 2 ELSE value END AS value
        |  FROM afterdel)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
        |FROM afterupd GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // Predicate DML in merge-on-read shape: DELETE FROM t WHERE
      // value > 400 (SnapshotOps.deleteWhere — matching live rows die as
      // deletion vectors, zero data files rewritten), then UPDATE t SET
      // value = value * 2 WHERE event_type = 'click' (updateWhere — the
      // clicks' old positions die by DV, their doubled versions land as
      // ONE additive file set). The oracle states the same two
      // statements as relational algebra; the hash gates sequencing too
      // (the update must see the post-delete state: a click deleted by
      // statement 1 must not resurrect doubled). The SQL-DML surface a
      // warehouse user expects, at sidecar cost on a 100 TB table.
      import graft.core.{Num, SnapshotOps, Snapshots}
      val root = s"${sys.props("java.io.tmpdir")}/graft_u27_${graft.core.Tables.pathKey(d)}"
      val fs = new org.apache.hadoop.fs.Path(root)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(root), true)
      val ev = events(s, d).filter(col("value").isNotNull)
        .select("event_id", "event_type", "value")
      Snapshots.publishPartitions(s, root)(stage =>
        ev.write.partitionBy("event_type").parquet(stage))
      // allowNoop: at sf0.001 no event clears 400, so the delete is a
      // legitimate no-match — the oracle removes nothing there either,
      // so the phases stay consistent at every scale factor
      SnapshotOps.deleteWhere(s, root, col("value") > 400, allowNoop = true)
      val v3 = SnapshotOps.updateWhere(s, root,
        col("event_type") === "click",
        Map("value" -> (col("value") * 2)), "event_type", allowNoop = true)
      Snapshots.readSnapshot(s, root, Some(v3))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), Num.dsum(col("value")).as("value_sum"))
        .orderBy("event_type")
    },

    // ---- incremental aggregate maintenance (materialized-view merge) ---
    Q("a16_incremental_agg",
      """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // The oracle is the FULL recompute; the Spark side answers it
      // incrementally — history partials (shipdate < 1995) merged with the
      // delta batch's partials (>= 1995) via Aggregates.mergePartialAggs.
      // A hash match proves the materialized-view maintenance identity:
      // merge(partial(A), partial(B)) == agg(A ∪ B), exactly (decimal
      // sums; counts merge by summing; avg derives at read time).
      val li = lineitem(s, d)
      val cut = lit("1995-01-01").cast("timestamp_ntz")
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(30,6)")).as("sq"))
      val history = partial(li.filter(col("l_shipdate") < cut))
      val delta = partial(li.filter(col("l_shipdate") >= cut))
      graft.ops.Aggregates.mergePartialAggs(Seq(history, delta),
          Seq("l_returnflag"), Seq("n", "sq"))
        .select(col("l_returnflag"), col("n"),
          col("sq").cast("double").as("sum_qty"),
          (col("sq").cast("double") / col("n")).as("avg_qty"))
        .orderBy("l_returnflag")
    },

    Q("a18_hll_sketch",
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_users,
        |  TRUE AS whole_within_error, TRUE AS merged_within_error
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      // Mergeable-sketch incremental distinct (DataSketches HLL, the
      // 100-TB pattern for daily-sketch -> monthly-rollup unique counts):
      // shard partials are hll_sketch_agg'd and rolled up with
      // hll_union_agg. NOTE the register merge is a max, but DataSketches
      // estimates a direct sketch with the HIP estimator and a union
      // result with the composite estimator, so merged == whole holds
      // only below the coupon->HLL mode transition (~1k distinct at
      // lgK=12) — above it they legitimately differ by a fraction of a
      // percent. The oracle therefore pins the exact distinct count and
      // a 5% relative-error bound on BOTH estimates (deterministic
      // booleans at any SF), not the estimator identity.
      val ev = events(s, d).select(col("event_type"), col("user_id"), col("event_id"))
      val parts = ev.withColumn("half", pmod(col("event_id"), lit(2)))
        .groupBy("event_type", "half")
        .agg(hll_sketch_agg(col("user_id")).as("sk"))
      val merged = parts.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_merged"))
      val whole = ev.groupBy("event_type")
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est_whole"),
          countDistinct(col("user_id")).as("exact_users"))
      whole.join(merged, Seq("event_type"))
        .select(col("event_type"), col("exact_users"),
          (abs(col("est_whole").cast("double") / col("exact_users") - 1.0) < 0.05)
            .as("whole_within_error"),
          (abs(col("est_merged").cast("double") / col("exact_users") - 1.0) < 0.05)
            .as("merged_within_error"))
        .orderBy("event_type")
    },

    // ---- Z-order layout key --------------------------------------------
    Q("o5_zorder_key",
      """WITH b AS (SELECT o_orderkey, o_custkey,
        |    o_custkey & 65535 AS x0, o_orderkey & 65535 AS y0 FROM orders),
        |sx AS (SELECT o_orderkey, o_custkey, y0,
        |    ((x0 | (x0 << 8)) & 16711935) AS x1 FROM b),
        |sx2 AS (SELECT o_orderkey, o_custkey, y0,
        |    ((x1 | (x1 << 4)) & 252645135) AS x2 FROM sx),
        |sx3 AS (SELECT o_orderkey, o_custkey, y0,
        |    ((x2 | (x2 << 2)) & 858993459) AS x3 FROM sx2),
        |sx4 AS (SELECT o_orderkey, o_custkey, y0,
        |    ((x3 | (x3 << 1)) & 1431655765) AS xs FROM sx3),
        |sy AS (SELECT o_orderkey, o_custkey, xs,
        |    ((y0 | (y0 << 8)) & 16711935) AS y1 FROM sx4),
        |sy2 AS (SELECT o_orderkey, o_custkey, xs,
        |    ((y1 | (y1 << 4)) & 252645135) AS y2 FROM sy),
        |sy3 AS (SELECT o_orderkey, o_custkey, xs,
        |    ((y2 | (y2 << 2)) & 858993459) AS y3 FROM sy2),
        |sy4 AS (SELECT o_orderkey, o_custkey, xs,
        |    ((y3 | (y3 << 1)) & 1431655765) AS ys FROM sy3)
        |SELECT o_orderkey, o_custkey, (xs | (ys << 1)) AS z
        |FROM sy4 ORDER BY z, o_orderkey, o_custkey LIMIT 1000""".stripMargin) { (s, d) =>
      // Morton z-value over (custkey, orderkey): the write-time clustering
      // key for two-dimensional data skipping — range-partition + sort by
      // z before the sink and parquet row-group min/max stats prune scans
      // filtered on EITHER column. The oracle spells the same mask-shift
      // doubling network; top-1000 by z is TakeOrdered.
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          graft.functions.Layout.zValue(col("o_custkey"), col("o_orderkey")).as("z"))
        .orderBy("z", "o_orderkey", "o_custkey")
        .limit(1000)
    },

    // ---- ordered funnel analysis ---------------------------------------
    Q("ev_funnel",
      """WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t FROM events e
        |  JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_us(e.ts) > v.t GROUP BY e.user_id),
        |p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS t FROM events e
        |  JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > c.t GROUP BY e.user_id)
        |SELECT 1 AS stage, 'view' AS step, CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_users
        |UNION ALL
        |SELECT 2, 'click', CAST((SELECT COUNT(*) FROM c) AS BIGINT)
        |UNION ALL
        |SELECT 3, 'purchase', CAST((SELECT COUNT(*) FROM p) AS BIGINT)
        |ORDER BY stage""".stripMargin) { (s, d) =>
      // view -> click -> purchase conversion funnel with strict ordering:
      // each stage anchors on the user's earliest completion of the
      // previous one (ops/Funnel.scala). Times compare as integer micros.
      Funnel.counts(
          events(s, d).select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("us")),
          "user_id", "us",
          Seq("view" -> (col("event_type") === "view"),
            "click" -> (col("event_type") === "click"),
            "purchase" -> (col("event_type") === "purchase")))
        .orderBy("stage")
    },

    // ---- time-series resampling (OHLC bars) -----------------------------
    Q("ev_ohlc",
      """WITH x AS (SELECT event_type,
        |    CAST(epoch(date_trunc('hour', ts)) AS BIGINT) AS h,
        |    epoch_us(ts) AS us, event_id, value,
        |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY epoch_us(ts), event_id) AS rna,
        |    row_number() OVER (PARTITION BY event_type, date_trunc('hour', ts)
        |      ORDER BY epoch_us(ts) DESC, event_id DESC) AS rnd
        |  FROM events)
        |SELECT event_type, h AS hour_epoch,
        |  MIN(CASE WHEN rna = 1 THEN value END) AS open,
        |  MAX(value) AS high, MIN(value) AS low,
        |  MIN(CASE WHEN rnd = 1 THEN value END) AS close,
        |  CAST(COUNT(*) AS BIGINT) AS n
        |FROM x GROUP BY event_type, h
        |ORDER BY event_type, hour_epoch""".stripMargin) { (s, d) =>
      // Downsample the event stream to hourly OHLC bars — the canonical
      // time-series resample. Open/close are pinned by a total order
      // (time, event_id), not first()-in-arrival-order, so the bars are
      // deterministic under any partitioning; high/low/count are plain
      // aggregates. One shuffle: both windows and the groupBy share the
      // (event_type, hour) key.
      val w = Window.partitionBy(col("event_type"), col("h"))
      val x = events(s, d).select(
          col("event_type"),
          date_trunc("hour", col("ts")).cast("long").as("h"),
          unix_micros(col("ts")).as("us"), col("event_id"), col("value"))
        .withColumn("rna", row_number().over(w.orderBy(col("us"), col("event_id"))))
        .withColumn("rnd", row_number().over(w.orderBy(col("us").desc, col("event_id").desc)))
      x.groupBy(col("event_type"), col("h").as("hour_epoch"))
        .agg(min(when(col("rna") === 1, col("value"))).as("open"),
          max(col("value")).as("high"), min(col("value")).as("low"),
          min(when(col("rnd") === 1, col("value"))).as("close"),
          count(lit(1)).as("n"))
        .orderBy("event_type", "hour_epoch")
    },

    // ---- cohort retention ------------------------------------------------
    Q("ev_retention",
      """WITH d AS (SELECT DISTINCT user_id,
        |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day FROM events),
        |f AS (SELECT user_id, MIN(day) AS cohort_day FROM d GROUP BY user_id)
        |SELECT f.cohort_day, d.day - f.cohort_day AS offset_days,
        |  CAST(COUNT(*) AS BIGINT) AS n_users
        |FROM d JOIN f USING (user_id)
        |GROUP BY f.cohort_day, offset_days
        |ORDER BY cohort_day, offset_days""".stripMargin) { (s, d) =>
      // Cohort retention matrix: users grouped by first-active day, counted
      // on each later active day. distinct (user, day) -> per-user min ->
      // self-join on user -> count: every shuffle keys on user_id or the
      // (cohort, offset) pair; day arithmetic is integer (micros DIV
      // 86400e6), so counts are engine-exact.
      val dd = events(s, d)
        .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"))
        .distinct()
      val f = dd.groupBy("user_id").agg(min(col("day")).as("cohort_day"))
      dd.join(f, "user_id")
        .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("offset_days"))
        .agg(count(lit(1)).as("n_users"))
        .orderBy("cohort_day", "offset_days")
    },

    // ---- interval-overlap join ------------------------------------------
    Q("j16_interval_overlap",
      """WITH a AS (SELECT o_orderkey AS id_a, o_custkey % 1000 AS a_lo,
        |    o_custkey % 1000 + o_orderkey % 7 AS a_hi
        |  FROM orders WHERE o_orderkey % 20 = 0),
        |b AS (SELECT c_custkey AS id_b, (c_custkey * 3) % 1000 AS b_lo,
        |    (c_custkey * 3) % 1000 + c_custkey % 11 AS b_hi
        |  FROM customer)
        |SELECT b.id_b, CAST(COUNT(*) AS BIGINT) AS n_overlaps,
        |  MAX(LEAST(a.a_hi, b.b_hi) - GREATEST(a.a_lo, b.b_lo)) AS max_olap
        |FROM a JOIN b ON a.a_lo <= b.b_hi AND b.b_lo <= a.a_hi
        |GROUP BY b.id_b ORDER BY id_b""".stripMargin) { (s, d) =>
      // Interval-overlap join (temporal/genomic shape) via fixed-width
      // axis buckets: both sides replicate to the buckets they span, the
      // join is a bucket equi-join, and each pair emits exactly once in
      // the bucket holding the overlap start — no dedup shuffle. The
      // oracle is the naive quadratic predicate join; identical pairs.
      val a = orders(s, d).filter(col("o_orderkey") % 20 === 0)
        .select(col("o_orderkey").as("id_a"),
          (col("o_custkey") % 1000).as("a_lo"),
          (col("o_custkey") % 1000 + col("o_orderkey") % 7).as("a_hi"))
      val b = customer(s, d)
        .select(col("c_custkey").as("id_b"),
          (col("c_custkey") * 3 % 1000).as("b_lo"),
          (col("c_custkey") * 3 % 1000 + col("c_custkey") % 11).as("b_hi"))
      Joins.intervalOverlapJoin(a, b, "a_lo", "a_hi", "b_lo", "b_hi", bucketWidth = 8)
        .groupBy("id_b")
        .agg(count(lit(1)).as("n_overlaps"),
          max(least(col("a_hi"), col("b_hi")) - greatest(col("a_lo"), col("b_lo")))
            .as("max_olap"))
        .orderBy("id_b")
    },

    // ---- table maintenance: small-file compaction ------------------------
    Q("s11_compaction",
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
        |  o_orderpriority
        |FROM orders ORDER BY o_orderkey""".stripMargin) { (s, d) =>
      // Small-files compaction: fragment orders into 64 files, compact to
      // size-targeted files (Maintenance.compactParquet — staging-swap,
      // content-identical), read back. The oracle is the original table:
      // a hash match proves the rewrite changed LAYOUT only. The file-
      // count assertions live in AnalyticsSpec.
      val base = orders(s, d)
      val path = s"${sys.props("java.io.tmpdir")}/graft_s11_${graft.core.Tables.pathKey(d)}"
      base.repartition(64).write.mode("overwrite").parquet(path)
      graft.operators.Maintenance.compactParquet(s, path, targetFileBytes = 64L * 1024 * 1024)
      s.read.schema(base.schema).parquet(path).orderBy("o_orderkey")
    },

    // ---- RANGE-frame moving window --------------------------------------
    Q("w13_moving_window",
      """WITH o AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, day,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER w AS DOUBLE) AS trail_sum,
        |  CAST(COUNT(*) OVER w AS BIGINT) AS trail_n
        |FROM o
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, day, o_orderkey""".stripMargin) { (s, d) =>
      // Trailing 7-day moving window per customer — the RANGE frame
      // (value-based bounds over an integer day axis), completing window-
      // frame coverage next to ROWS frames (W1/W3) and unbounded analytics
      // (W2/W7). RANGE includes ALL peers of the current day, so same-day
      // ties are deterministic without a tie-break; the sum is decimal-
      // exact per the catalog rule.
      import graft.core.Num
      val o = orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("day"))
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("day"))
        .rangeBetween(-6, Window.currentRow)
      o.select(col("o_custkey"), col("o_orderkey"), col("day"),
          Num.dsumOver(col("o_totalprice"), w).as("trail_sum"),
          count(lit(1)).over(w).as("trail_n"))
        .orderBy("o_custkey", "day", "o_orderkey")
    },

    // ---- feature scaling: min-max ---------------------------------------
    Q("qt_minmax",
      """WITH s AS (SELECT l_returnflag, MIN(l_quantity) AS l_quantity_min,
        |    MAX(l_quantity) AS l_quantity_max
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_quantity,
        |  s.l_quantity_min, s.l_quantity_max,
        |  CASE WHEN s.l_quantity_max > s.l_quantity_min
        |       THEN (l.l_quantity - s.l_quantity_min)
        |            / (s.l_quantity_max - s.l_quantity_min) END AS l_quantity_scaled
        |FROM lineitem l JOIN s USING (l_returnflag)
        |ORDER BY l_orderkey, l_linenumber, l_quantity, l_returnflag""".stripMargin) { (s, d) =>
      // Min-max scaling to [0,1] per group — completes the feature-scaling
      // family (qt_zscore standardizes, qt_winsorize clips, this bounds).
      // Exact extremes broadcast back; one division per row, bit-stable.
      graft.ops.Aggregates.minmaxScale(
          lineitem(s, d).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"),
          Seq("l_returnflag"), "l_quantity")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
          "l_quantity_min", "l_quantity_max", "l_quantity_scaled")
        .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    },

    // ---- graph: fixed-point PageRank ------------------------------------
    Q("g3_reciprocity",
      """WITH e AS (SELECT DISTINCT o_custkey % 50 AS src, o_orderkey % 50 AS dst
        |  FROM orders WHERE o_custkey % 50 <> o_orderkey % 50),
        |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e),
        |rec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_reciprocal
        |  FROM e a JOIN e b ON a.src = b.dst AND a.dst = b.src)
        |SELECT m.n_edges, rec.n_reciprocal,
        |  CAST(rec.n_reciprocal AS DOUBLE) / m.n_edges AS reciprocity
        |FROM m, rec""".stripMargin) { (s, d) =>
      // Graph reciprocity — the fraction of directed edges whose reverse
      // edge also exists (mutual-link structure: link farms score near 1,
      // citation DAGs near 0). Same derived 50-node edge set as
      // g1_pagerank; one reversed self-join on the edge key, exact
      // integer counts, one IEEE division.
      val e = orders(s, d)
        .select((col("o_custkey") % 50).as("src"), (col("o_orderkey") % 50).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val rev = e.select(col("dst").as("src"), col("src").as("dst"))
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(e.join(rev, Seq("src", "dst"))
          .agg(count(lit(1)).as("n_reciprocal")))
        .select(col("n_edges"), col("n_reciprocal"),
          (col("n_reciprocal").cast("double") / col("n_edges")).as("reciprocity"))
    },
    Q("g5_kcore",
      """WITH de AS (SELECT DISTINCT o_custkey % 500 AS src, o_orderkey % 500 AS dst
        |  FROM orders WHERE o_orderkey % 7 = 0 AND o_custkey % 500 <> o_orderkey % 500),
        |e AS (SELECT src, dst FROM de UNION SELECT dst, src FROM de),
        |d0 AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
        |a1 AS (SELECT src FROM d0 WHERE deg >= 7),
        |e1 AS (SELECT e.src, e.dst FROM e
        |  JOIN a1 x ON e.src = x.src JOIN a1 y ON e.dst = y.src),
        |d1 AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e1 GROUP BY 1)
        |SELECT src AS node, deg FROM d1 WHERE deg >= 7
        |ORDER BY node""".stripMargin) { (s, d) =>
      // k-core peeling (k=7, two synchronized rounds) over a sparser
      // 500-node undirected view of the order graph — the density gate
      // of graph-based corpus curation: leaf chains peel away, dense
      // (spam/link-farm-like) cores survive. Per round: one degree
      // aggregate + two LEFT SEMI joins on node ids (Graph.kCorePeel),
      // integer-exact throughout — the oracle unrolls both rounds as
      // plain CTEs. The fixture peels 500 -> 418 -> 357 nodes at sf0.01,
      // so both rounds do real work.
      val edges = orders(s, d)
        .filter(col("o_orderkey") % 7 === 0)
        .select((col("o_custkey") % 500).as("src"), (col("o_orderkey") % 500).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      graft.operators.Graph.kCorePeel(edges, k = 7, rounds = 2)
        .orderBy("node")
    },
    Q("g6_label_prop",
      """WITH de AS (SELECT DISTINCT o_custkey % 300 AS src, o_orderkey % 300 AS dst
        |  FROM orders WHERE o_orderkey % 11 = 0 AND o_custkey % 300 <> o_orderkey % 300),
        |e AS (SELECT src, dst FROM de UNION SELECT dst, src FROM de),
        |nodes AS (SELECT DISTINCT src AS v FROM e),
        |l0 AS (SELECT v, v AS lab FROM nodes),
        |n1 AS (SELECT e.src AS v, l0.lab FROM e JOIN l0 ON l0.v = e.dst),
        |c1 AS (SELECT v, lab, CAST(COUNT(*) AS BIGINT) AS c FROM n1 GROUP BY 1, 2),
        |p1 AS (SELECT v, lab FROM (SELECT v, lab,
        |    row_number() OVER (PARTITION BY v ORDER BY c DESC, lab) AS rn FROM c1)
        |  WHERE rn = 1),
        |l1 AS (SELECT nodes.v, COALESCE(p1.lab, nodes.v) AS lab
        |  FROM nodes LEFT JOIN p1 USING (v)),
        |n2 AS (SELECT e.src AS v, l1.lab FROM e JOIN l1 ON l1.v = e.dst),
        |c2 AS (SELECT v, lab, CAST(COUNT(*) AS BIGINT) AS c FROM n2 GROUP BY 1, 2),
        |p2 AS (SELECT v, lab FROM (SELECT v, lab,
        |    row_number() OVER (PARTITION BY v ORDER BY c DESC, lab) AS rn FROM c2)
        |  WHERE rn = 1),
        |l2 AS (SELECT nodes.v, COALESCE(p2.lab, nodes.v) AS lab
        |  FROM nodes LEFT JOIN p2 USING (v)),
        |cs AS (SELECT lab, CAST(COUNT(*) AS BIGINT) AS csize FROM l2 GROUP BY 1)
        |SELECT l2.v AS node, l2.lab AS community, cs.csize
        |FROM l2 JOIN cs USING (lab) ORDER BY node""".stripMargin) { (s, d) =>
      // Deterministic synchronized label propagation (2 rounds) over a
      // 300-node undirected view of the order graph — LPA community
      // detection with the randomness removed (mode label, ties to the
      // SMALLEST label, all nodes update simultaneously), so the oracle
      // can unroll both rounds as plain CTEs. The Spark side's per-round
      // argmax is a max(struct(count, -label)) AGGREGATE, not a rank
      // window (the oracle's row_number spelling is equivalent by the
      // tie-break order) — no per-node reducer serialization at scale.
      // The fixture yields 51 communities (largest 51 nodes) at sf0.01,
      // so both rounds do real re-labeling work. Use case: community
      // ids as curation/mixing keys over link or co-interaction graphs.
      val edges = orders(s, d)
        .filter(col("o_orderkey") % 11 === 0)
        .select((col("o_custkey") % 300).as("src"), (col("o_orderkey") % 300).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val lp = graft.operators.Graph.labelPropagation(edges, rounds = 2)
      val sizes = lp.groupBy("community").agg(count(lit(1)).as("csize"))
      lp.join(sizes, Seq("community"))
        .select("node", "community", "csize")
        .orderBy("node")
    },
    Q("g7_cc_converged",
      """WITH RECURSIVE
        |ck AS (SELECT c_custkey FROM customer),
        |p AS (SELECT a.c_custkey AS src, a.c_custkey + 1 AS dst FROM ck a
        |  JOIN ck b ON b.c_custkey = a.c_custkey + 1 WHERE a.c_custkey % 100 <> 99),
        |m AS (SELECT DISTINCT o_custkey % 700 AS src, o_orderkey % 700 AS dst
        |  FROM orders WHERE o_orderkey % 37 = 0 AND o_custkey % 700 <> o_orderkey % 700),
        |de AS (SELECT src, dst FROM p UNION SELECT src, dst FROM m),
        |e AS (SELECT src, dst FROM de UNION SELECT dst, src FROM de),
        |nodes AS (SELECT DISTINCT src AS v FROM e),
        |walk(v, lab) AS (
        |  SELECT v, v FROM nodes
        |  UNION
        |  SELECT e.src, w.lab FROM walk w JOIN e ON e.dst = w.v),
        |cc AS (SELECT v AS node, MIN(lab) AS component FROM walk GROUP BY v),
        |cs AS (SELECT component, CAST(COUNT(*) AS BIGINT) AS csize FROM cc GROUP BY 1)
        |SELECT cc.node, cc.component, cs.csize
        |FROM cc JOIN cs USING (component) ORDER BY node""".stripMargin) { (s, d) =>
      // CONVERGENCE-DETECTED connected components (VERDICT r10 missing
      // #5): alternating large-star/small-star (Graph.connectedComponents
      // — O(log n) rounds at ANY diameter, exact fixpoint check per
      // round), where bounded-round label propagation is provably short —
      // the fixture is adversarial for LPA by construction: consecutive
      // custkeys form 100-node PATH segments (diameter 99, so min-label
      // propagation would need ~99 rounds), plus sparse order-derived
      // bridge edges among the first 700 ids that weld seven segments
      // into one 700-node blob. 9 components at sf0.01 (one 700 + eight
      // 100-node paths); component = min node id, exactly what the
      // oracle's recursive reachability CTE computes. This is the exact
      // upgrade dedup canonicalization needs for duplicate graphs of
      // arbitrary chain length.
      val ck = customer(s, d).select(col("c_custkey"))
      val path = ck.select(col("c_custkey").as("src"), (col("c_custkey") + 1).as("dst"))
        .filter(col("src") % 100 =!= 99)
        .join(ck.select(col("c_custkey").as("dst")), Seq("dst"), "left_semi")
      val bridges = orders(s, d)
        .filter(col("o_orderkey") % 37 === 0)
        .select((col("o_custkey") % 700).as("src"), (col("o_orderkey") % 700).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val cc = graft.operators.Graph.connectedComponents(path.unionAll(bridges))
      val sizes = cc.groupBy("component").agg(count(lit(1)).as("csize"))
      cc.join(sizes, Seq("component"))
        .select("node", "component", "csize")
        .orderBy("node")
    },
    Q("g8_bfs_dist",
      """WITH RECURSIVE
        |de AS (SELECT DISTINCT o_custkey % 400 AS src, o_orderkey % 400 AS dst
        |  FROM orders WHERE o_orderkey % 5 = 0 AND o_custkey % 400 <> o_orderkey % 400),
        |e AS (SELECT src, dst FROM de UNION SELECT dst, src FROM de),
        |nodes AS (SELECT DISTINCT src AS v FROM e),
        |seeds AS (SELECT v FROM nodes WHERE v % 100 = 0),
        |walk(v, dd) AS (
        |  SELECT v, 0 FROM seeds
        |  UNION
        |  SELECT e.dst, w.dd + 1 FROM walk w JOIN e ON e.src = w.v WHERE w.dd < 20)
        |SELECT v AS node, CAST(MIN(dd) AS BIGINT) AS dist
        |FROM walk GROUP BY v ORDER BY node""".stripMargin) { (s, d) =>
      // Multi-source BFS hop distance from a trusted seed set — the
      // link-distance quality feature of crawl curation (pages near
      // seeds rank higher) — CONVERGENCE-DETECTED frontier expansion
      // (Graph.bfsDistances): per round only frontier-touching edges
      // join, newly reached nodes anti-join the settled set, and the
      // loop stops when a frontier comes back empty — exact distances
      // at any diameter. The oracle's capped recursive CTE is the
      // semantic spec (the fixture's dense 400-node order graph has
      // eccentricity ≪ 20 from the four seeds); the engine needs no
      // cap. Seeds are every node ≡ 0 (mod 100).
      val edges = orders(s, d)
        .filter(col("o_orderkey") % 5 === 0)
        .select((col("o_custkey") % 400).as("src"), (col("o_orderkey") % 400).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val nodes = edges.select(col("src").as("v"))
        .unionAll(edges.select(col("dst").as("v")))
        .distinct()
      val seeds = nodes.filter(col("v") % 100 === 0)
      graft.operators.Graph.bfsDistances(edges, seeds)
        .orderBy("node")
    },
    Q("g10_sssp",
      """WITH RECURSIVE
        |de AS (SELECT DISTINCT o_custkey % 300 AS src, o_orderkey % 300 AS dst
        |  FROM orders WHERE o_orderkey % 23 = 0 AND o_custkey % 300 <> o_orderkey % 300),
        |e AS (SELECT src, dst, 1 + (src + dst) % 7 AS w FROM de
        |  UNION SELECT dst, src, 1 + (src + dst) % 7 FROM de),
        |nodes AS (SELECT DISTINCT src AS v FROM e),
        |seeds AS (SELECT v FROM nodes WHERE v % 150 = 0),
        |walk(v, dd) AS (
        |  SELECT v, 0 FROM seeds
        |  UNION
        |  SELECT e.dst, w.dd + e.w FROM walk w JOIN e ON e.src = w.v
        |  WHERE w.dd < 100)
        |SELECT v AS node, CAST(MIN(dd) AS BIGINT) AS dist
        |FROM walk GROUP BY v ORDER BY node""".stripMargin) { (s, d) =>
      // WEIGHTED shortest paths from a seed set (frontier Bellman-Ford,
      // Graph.ssspDistances) — BFS hop distance upgraded to edge costs
      // (latency, toll, dissimilarity): per round only nodes whose
      // distance IMPROVED relax their edges, improved nodes re-enter the
      // frontier (a cheaper path may arrive after first discovery), and
      // the loop stops when a round improves nothing — exact at any
      // diameter, rounds bounded by the longest shortest-path hop count.
      // Weights are deterministic ints (1 + (src+dst) % 7), so distances
      // are engine-exact integers. The oracle's cost-capped recursive
      // CTE is the semantic spec (the fixture's 300-node order graph has
      // weighted eccentricity ≪ 100 from its two seeds); the engine
      // needs no cap.
      val de = orders(s, d)
        .filter(col("o_orderkey") % 23 === 0)
        .select((col("o_custkey") % 300).as("src"), (col("o_orderkey") % 300).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val edges = de.unionAll(de.select(col("dst").as("src"), col("src").as("dst")))
        .select(col("src"), col("dst"), (lit(1) + (col("src") + col("dst")) % 7).as("w"))
        .distinct()
      val nodes = edges.select(col("src").as("v")).distinct()
      val seeds = nodes.filter(col("v") % 150 === 0)
      graft.operators.Graph.ssspDistances(edges, seeds)
        .orderBy("node")
    },
    Q("g9_link_predict",
      """WITH de AS (SELECT DISTINCT o_custkey % 500 AS src, o_orderkey % 500 AS dst
        |  FROM orders WHERE o_orderkey % 7 = 0 AND o_custkey % 500 <> o_orderkey % 500),
        |e AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b FROM de),
        |adj AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
        |dg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
        |cap AS (SELECT adj.u, adj.v FROM adj JOIN dg USING (u) WHERE dg.deg <= 12),
        |w AS (SELECT x.v AS a, y.v AS b FROM cap x JOIN cap y
        |  ON x.u = y.u AND x.v < y.v),
        |cn AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS cn FROM w GROUP BY 1, 2),
        |ne AS (SELECT cn.a, cn.b, cn.cn FROM cn
        |  WHERE cn.cn >= 2 AND NOT EXISTS (
        |    SELECT 1 FROM e WHERE e.a = cn.a AND e.b = cn.b)),
        |j AS (SELECT ne.a, ne.b, ne.cn, da.deg AS deg_a, db.deg AS deg_b,
        |    CAST(ne.cn AS DOUBLE) / CAST(da.deg + db.deg - ne.cn AS DOUBLE) AS jaccard
        |  FROM ne JOIN dg da ON ne.a = da.u JOIN dg db ON ne.b = db.u),
        |r AS (SELECT a, b, cn, deg_a, deg_b, jaccard,
        |    CAST(row_number() OVER (ORDER BY cn DESC, a, b) AS INTEGER) AS rk
        |  FROM j)
        |SELECT rk, a, b, cn, deg_a, deg_b, jaccard
        |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin) { (s, d) =>
      // Link prediction over the g5 order graph: the top-20 non-adjacent
      // pairs by common-neighbor count (Jaccard-normalized against FULL
      // degrees) — the related-entity signal of co-interaction graphs.
      // Wedge apexes cap at degree 12 (Graph.commonNeighborCandidates):
      // hubs generate deg² wedges and carry the weakest signal, so the
      // cap bounds wedge work by cap·|edges| — replayed by the oracle,
      // explicit semantics rather than a silent approximation (the g5
      // fixture has hubs past 12, so the cap does real work at sf0.01).
      // Top-k is TakeOrdered (per-partition partial top-k); the rank
      // window runs on the 20 survivors only.
      import org.apache.spark.sql.expressions.Window
      val edges = orders(s, d)
        .filter(col("o_orderkey") % 7 === 0)
        .select((col("o_custkey") % 500).as("src"), (col("o_orderkey") % 500).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      graft.operators.Graph.commonNeighborCandidates(edges,
          maxApexDegree = 12, minCommon = 2L)
        .orderBy(col("cn").desc, col("a"), col("b")).limit(20)
        .withColumn("rk", row_number().over(
          graft.ops.Windows.boundedGlobal(col("cn").desc, col("a"), col("b"))))
        .select("rk", "a", "b", "cn", "deg_a", "deg_b", "jaccard")
        .orderBy("rk")
    },
    Q("g1_pagerank",
      """WITH e AS (SELECT DISTINCT o_custkey % 50 AS src, o_orderkey % 50 AS dst
        |  FROM orders WHERE o_custkey % 50 <> o_orderkey % 50),
        |nodes AS (SELECT CAST(range AS BIGINT) AS v FROM range(0, 50)),
        |od AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS d FROM e GROUP BY src),
        |ed AS (SELECT e.src, e.dst, od.d FROM e JOIN od USING (src)),
        |r0 AS (SELECT v, CAST((1000000000000 // 50) AS BIGINT) AS r FROM nodes),
        |c1 AS (SELECT ed.dst AS v, SUM(r0.r // ed.d) AS s
        |  FROM ed JOIN r0 ON r0.v = ed.src GROUP BY ed.dst),
        |r1 AS (SELECT nodes.v,
        |    CAST(((1000000000000 - ((85 * 1000000000000) // 100)) // 50)
        |      + ((85 * COALESCE(c1.s, 0)) // 100) AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c1 USING (v)),
        |c2 AS (SELECT ed.dst AS v, SUM(r1.r // ed.d) AS s
        |  FROM ed JOIN r1 ON r1.v = ed.src GROUP BY ed.dst),
        |r2 AS (SELECT nodes.v,
        |    CAST(((1000000000000 - ((85 * 1000000000000) // 100)) // 50)
        |      + ((85 * COALESCE(c2.s, 0)) // 100) AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c2 USING (v)),
        |c3 AS (SELECT ed.dst AS v, SUM(r2.r // ed.d) AS s
        |  FROM ed JOIN r2 ON r2.v = ed.src GROUP BY ed.dst),
        |r3 AS (SELECT nodes.v,
        |    CAST(((1000000000000 - ((85 * 1000000000000) // 100)) // 50)
        |      + ((85 * COALESCE(c3.s, 0)) // 100) AS BIGINT) AS r
        |  FROM nodes LEFT JOIN c3 USING (v))
        |SELECT v, r AS rank_fp, CAST(r AS DOUBLE) / 1000000000000.0 AS rank
        |FROM r3 ORDER BY v""".stripMargin) { (s, d) =>
      // Fixed-point PageRank (3 damped iterations, d=0.85) over the
      // synthetic 50-node link graph derived from orders. All arithmetic
      // is BIGINT micro-units (operators/Graph.scala), so the iterative
      // computation is bit-identical across engines and partitionings —
      // the oracle unrolls the same three rounds as plain CTEs. Use case:
      // link-centrality quality scoring of a crawl corpus.
      val nodes = s.range(0, 50).select(col("id").as("v"))
      val edges = orders(s, d)
        .select((col("o_custkey") % 50).as("src"), (col("o_orderkey") % 50).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      graft.operators.Graph.pageRankFixedPoint(nodes, edges, iters = 3)
        .orderBy("v")
    },
    Q("g2_triangles",
      """WITH e AS (SELECT DISTINCT o_custkey % 50 AS s, o_orderkey % 50 AS t
        |  FROM orders WHERE o_custkey % 50 <> o_orderkey % 50
        |    AND (o_custkey % 50 + o_orderkey % 50) % 3 <> 0),
        |und AS (SELECT DISTINCT LEAST(s, t) AS a, GREATEST(s, t) AS b FROM e),
        |tri AS (
        |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
        |  FROM und e1
        |  JOIN und e2 ON e2.a = e1.b
        |  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b),
        |m AS (SELECT x AS v FROM tri
        |      UNION ALL SELECT y FROM tri
        |      UNION ALL SELECT z FROM tri),
        |nodes AS (SELECT CAST(range AS BIGINT) AS v FROM range(0, 50)),
        |c AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n_triangles FROM m GROUP BY v)
        |SELECT nodes.v, COALESCE(c.n_triangles, 0) AS n_triangles
        |FROM nodes LEFT JOIN c USING (v) ORDER BY v""".stripMargin) { (s, d) =>
      // Exact per-node triangle counts, DEGREE-ORIENTED on the Spark side
      // (out-lists bounded by O(sqrt m), the at-scale wedge bound) — the
      // oracle states the naive a<b<c triple join, and the per-node counts
      // are orientation-independent, so a hash match proves the oriented
      // algorithm exact. The (src+dst)%3 sparsifier keeps the 50-node
      // graph from collapsing to a complete graph at sf>=0.01 (uniform
      // counts would weaken the check). Use case: community density /
      // spam-farm signals in a link corpus.
      val nodes = s.range(0, 50).select(col("id").as("v"))
      val edges = orders(s, d)
        .select((col("o_custkey") % 50).as("src"), (col("o_orderkey") % 50).as("dst"))
        .filter(col("src") =!= col("dst") && (col("src") + col("dst")) % 3 =!= 0)
        .distinct()
      graft.operators.Graph.triangleCounts(nodes, edges)
        .orderBy("v")
    },

    // ---- profiling: one-pass correlation matrix -------------------------
    Q("pf_corr",
      """WITH m AS (SELECT l_returnflag,
        |    CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS s_q,
        |    CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,6))) AS DOUBLE) AS ss_q,
        |    CAST(SUM(CAST(l_discount AS DECIMAL(30,6))) AS DOUBLE) AS s_d,
        |    CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS ss_d,
        |    CAST(SUM(CAST(l_tax AS DECIMAL(30,6))) AS DOUBLE) AS s_t,
        |    CAST(SUM(CAST(l_tax * l_tax AS DECIMAL(30,6))) AS DOUBLE) AS ss_t,
        |    CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS sp_qd,
        |    CAST(SUM(CAST(l_quantity * l_tax AS DECIMAL(30,6))) AS DOUBLE) AS sp_qt,
        |    CAST(SUM(CAST(l_discount * l_tax AS DECIMAL(30,6))) AS DOUBLE) AS sp_dt
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
        |  CASE WHEN (n * ss_q - s_q * s_q) > 0 AND (n * ss_d - s_d * s_d) > 0
        |       THEN (n * sp_qd - s_q * s_d)
        |            / (sqrt(n * ss_q - s_q * s_q) * sqrt(n * ss_d - s_d * s_d)) END
        |    AS corr_l_quantity_l_discount,
        |  CASE WHEN (n * ss_q - s_q * s_q) > 0 AND (n * ss_t - s_t * s_t) > 0
        |       THEN (n * sp_qt - s_q * s_t)
        |            / (sqrt(n * ss_q - s_q * s_q) * sqrt(n * ss_t - s_t * s_t)) END
        |    AS corr_l_quantity_l_tax,
        |  CASE WHEN (n * ss_d - s_d * s_d) > 0 AND (n * ss_t - s_t * s_t) > 0
        |       THEN (n * sp_dt - s_d * s_t)
        |            / (sqrt(n * ss_d - s_d * s_d) * sqrt(n * ss_t - s_t * s_t)) END
        |    AS corr_l_discount_l_tax
        |FROM m ORDER BY l_returnflag""".stripMargin) { (s, d) =>
      // One-pass pairwise correlation per group (Profile.pearsonMatrix):
      // all moments from a single hash aggregate through decimal-exact
      // sums, then the textbook formula in identically-parenthesized IEEE
      // ops — bit-stable where the built-in streaming `corr` is
      // update-order-dependent. The profiling step that decides which
      // features are redundant before training.
      graft.operators.Profile.pearsonMatrix(
          lineitem(s, d).select("l_returnflag", "l_quantity", "l_discount", "l_tax"),
          Seq("l_returnflag"), Seq("l_quantity", "l_discount", "l_tax"))
        .orderBy("l_returnflag")
    },
    Q("pf_iqr_outliers",
      """WITH o AS (SELECT event_type, value, event_id FROM events WHERE value IS NOT NULL),
        |r AS (SELECT event_type, value,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n,
        |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rk
        |  FROM o),
        |q AS (SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
        |    MAX(CASE WHEN rk = ((n - 1) * 25) // 100 + 1 THEN value END) AS q1,
        |    MAX(CASE WHEN rk = ((n - 1) * 75) // 100 + 1 THEN value END) AS q3
        |  FROM r GROUP BY event_type),
        |b AS (SELECT event_type, n, q1, q3, q3 - q1 AS iqr,
        |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
        |SELECT event_type, b.n, b.q1, b.q3, b.iqr, b.lo, b.hi,
        |  CAST(SUM(CASE WHEN o.value < b.lo OR o.value > b.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_outliers
        |FROM o JOIN b USING (event_type)
        |GROUP BY event_type, b.n, b.q1, b.q3, b.iqr, b.lo, b.hi
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      // Tukey-fence outlier profile per group: EXACT order-statistic
      // quartiles (the qt-family index convention ⌊(n−1)·q⌋+1 with a
      // total (value, id) order — no interpolation arithmetic to drift),
      // fences at 1.5×IQR in identically-parenthesized IEEE ops, and the
      // outlier count from one re-join. The data-QA gate that catches
      // sensor spikes / unit errors before they hit training statistics.
      // Ranks via Stats.groupedRank's (group, range-bucket) two-level
      // machinery — event_type is a handful of values, so the rank window
      // the oracle spells would serialize each type onto one reducer.
      val o = events(s, d).filter(col("value").isNotNull)
        .select(col("event_type"), col("value"), col("event_id"))
      // knownGroups: the event-type domain is 5 fixed values (generator
      // vocabulary) — the hint skips the distinct-count probe scan
      val r = graft.ops.Stats.groupedRank(o, Seq("event_type"), col("value"),
        Seq(col("event_id")), "rk", Some("n"), knownGroups = Some(5L))
      val q = r.groupBy(col("event_type")).agg(
        max(col("n")).as("n"),
        max(when(col("rk") === expr("((n - 1) * 25) div 100 + 1"), col("value"))).as("q1"),
        max(when(col("rk") === expr("((n - 1) * 75) div 100 + 1"), col("value"))).as("q3"))
      val b = q
        .withColumn("iqr", col("q3") - col("q1"))
        .withColumn("lo", col("q1") - lit(1.5) * (col("q3") - col("q1")))
        .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
      o.join(b, Seq("event_type"))
        .groupBy(col("event_type"), col("n"), col("q1"), col("q3"),
          col("iqr"), col("lo"), col("hi"))
        .agg(sum(when(col("value") < col("lo") || col("value") > col("hi"), 1L)
          .otherwise(0L)).as("n_outliers"))
        .orderBy("event_type")
    },
    Q("pf_autocorr",
      """WITH o AS (SELECT event_type, value, epoch_us(ts) AS us, event_id FROM events),
        |p AS (SELECT event_type, value,
        |    lead(value, 1) OVER (PARTITION BY event_type ORDER BY us, event_id) AS value_next
        |  FROM o),
        |f AS (SELECT event_type, value, value_next FROM p WHERE value_next IS NOT NULL),
        |m AS (SELECT event_type, CAST(COUNT(*) AS DOUBLE) AS n,
        |    CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS s_x,
        |    CAST(SUM(CAST(value * value AS DECIMAL(30,6))) AS DOUBLE) AS ss_x,
        |    CAST(SUM(CAST(value_next AS DECIMAL(30,6))) AS DOUBLE) AS s_y,
        |    CAST(SUM(CAST(value_next * value_next AS DECIMAL(30,6))) AS DOUBLE) AS ss_y,
        |    CAST(SUM(CAST(value * value_next AS DECIMAL(30,6))) AS DOUBLE) AS sp
        |  FROM f GROUP BY 1)
        |SELECT event_type, CAST(n AS BIGINT) AS n,
        |  CASE WHEN (n * ss_x - s_x * s_x) > 0 AND (n * ss_y - s_y * s_y) > 0
        |    THEN (n * sp - s_x * s_y)
        |         / (sqrt(n * ss_x - s_x * s_x) * sqrt(n * ss_y - s_y * s_y)) END
        |    AS corr_value_value_next
        |FROM m ORDER BY event_type""".stripMargin) { (s, d) =>
      // Lag-1 autocorrelation of the value stream per event type — the
      // time-series diagnostic (is the metric trending or i.i.d.?) as a
      // composition: one user-keyed lead window builds (x_t, x_{t+1})
      // pairs, then the decimal-exact one-pass Pearson machinery (pf_corr)
      // scores them — same bit-stability argument, zero new aggregation
      // code.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("event_type"))
        .orderBy(expr("unix_micros(ts)"), col("event_id"))
      val lagged = events(s, d)
        .select(col("event_type"), col("value"),
          lead(col("value"), 1).over(w).as("value_next"))
        .filter(col("value_next").isNotNull)
      graft.operators.Profile.pearsonMatrix(
          lagged, Seq("event_type"), Seq("value", "value_next"))
        .orderBy("event_type")
    },
    Q("pf_chi2",
      """WITH obs AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |la AS (SELECT DISTINCT lang FROM documents),
        |sb AS (SELECT DISTINCT source FROM documents),
        |f AS (
        |  SELECT la.lang, sb.source, COALESCE(obs.o, 0) AS o
        |  FROM la CROSS JOIN sb
        |  LEFT JOIN obs ON obs.lang = la.lang AND obs.source = sb.source),
        |r AS (SELECT lang, SUM(o) AS ri FROM f GROUP BY 1),
        |c AS (SELECT source, SUM(o) AS cj FROM f GROUP BY 1),
        |n AS (SELECT SUM(o) AS nn, COUNT(DISTINCT lang) AS ka,
        |             COUNT(DISTINCT source) AS kb FROM f),
        |t AS (
        |  SELECT CAST(f.o AS DECIMAL(38,0)) * CAST(n.nn AS DECIMAL(38,0))
        |         - CAST(r.ri AS DECIMAL(38,0)) * CAST(c.cj AS DECIMAL(38,0)) AS d,
        |         CAST(n.nn AS DECIMAL(38,0)) * CAST(r.ri AS DECIMAL(38,0))
        |           * CAST(c.cj AS DECIMAL(38,0)) AS den
        |  FROM f JOIN r USING (lang) JOIN c USING (source), n)
        |SELECT CAST(n.nn AS BIGINT) AS n_rows,
        |  CAST(n.ka AS BIGINT) AS n_levels_a, CAST(n.kb AS BIGINT) AS n_levels_b,
        |  CAST((n.ka - 1) * (n.kb - 1) AS BIGINT) AS dof,
        |  CAST(SUM(CAST(CAST(d * d AS DOUBLE) / CAST(den AS DOUBLE) AS DECIMAL(30,6)))
        |    AS DOUBLE) AS chi2
        |FROM t, n GROUP BY n.nn, n.ka, n.kb""".stripMargin) { (s, d) =>
      // Chi-squared independence between two categorical columns (did the
      // language mix drift with the source?) — engine-exact where the
      // textbook (o-e)²/e is not: each cell rewritten over the common
      // denominator (o·N - r·c)²/(N·r·c), integer numerator and
      // denominator in DECIMAL(38,0), one correctly-rounded division per
      // cell, decimal-cast cell sum. Zero-observed grid cells included,
      // as the statistic requires.
      graft.operators.Profile.chiSquare(documents(s, d), "lang", "source")
    },
    Q("pf_cohen_kappa",
      s"""WITH t AS (SELECT doc_id, lang,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS toks,
         |    regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS cjk
         |  FROM documents),
         |sc AS (SELECT doc_id, lang, cjk,
         |    len(list_filter(toks, x -> list_contains(${TextData.sqlList(TextFns.stopEn)}, x))) AS s_en,
         |    len(list_filter(toks, x -> list_contains(${TextData.sqlList(TextFns.stopDe)}, x))) AS s_de,
         |    len(list_filter(toks, x -> list_contains(${TextData.sqlList(TextFns.stopEs)}, x))) AS s_es,
         |    len(list_filter(toks, x -> list_contains(${TextData.sqlList(TextFns.stopFr)}, x))) AS s_fr
         |  FROM t),
         |p AS (SELECT lang AS b,
         |    CASE WHEN cjk THEN 'zh'
         |         WHEN s_en >= GREATEST(s_de, s_es, s_fr) THEN 'en'
         |         WHEN s_de >= GREATEST(s_es, s_fr) THEN 'de'
         |         WHEN s_es >= s_fr THEN 'es'
         |         ELSE 'fr' END AS a
         |  FROM sc),
         |obs AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS o FROM p GROUP BY 1, 2),
         |r AS (SELECT a AS lvl, SUM(o) AS ri FROM obs GROUP BY 1),
         |c AS (SELECT b AS lvl, SUM(o) AS cj FROM obs GROUP BY 1),
         |s AS (SELECT COALESCE(SUM(CAST(r.ri AS DECIMAL(38,0)) * CAST(c.cj AS DECIMAL(38,0))),
         |         CAST(0 AS DECIMAL(38,0))) AS ss
         |  FROM r JOIN c USING (lvl)),
         |nd AS (SELECT SUM(o) AS nn,
         |    COALESCE(SUM(CASE WHEN a = b THEN o END), 0) AS dd FROM obs)
         |SELECT CAST(nd.nn AS BIGINT) AS n_rows, CAST(nd.dd AS BIGINT) AS n_agree,
         |  CAST(nd.dd AS DOUBLE) / CAST(nd.nn AS DOUBLE) AS observed_agreement,
         |  CAST(s.ss AS DOUBLE)
         |    / CAST(CAST(nd.nn AS DECIMAL(38,0)) * CAST(nd.nn AS DECIMAL(38,0)) AS DOUBLE)
         |    AS expected_agreement,
         |  CASE WHEN CAST(nd.nn AS DECIMAL(38,0)) * CAST(nd.nn AS DECIMAL(38,0)) <> s.ss
         |    THEN CAST(CAST(nd.nn AS DECIMAL(38,0)) * CAST(nd.dd AS DECIMAL(38,0)) - s.ss AS DOUBLE)
         |      / CAST(CAST(nd.nn AS DECIMAL(38,0)) * CAST(nd.nn AS DECIMAL(38,0)) - s.ss AS DOUBLE)
         |    END AS kappa
         |FROM nd, s""".stripMargin) { (s, d) =>
      // Cohen's kappa between the engine's langid heuristic and the
      // reference lang label — the chance-corrected agreement a labeling
      // pipeline reports for classifier-vs-annotation QA. The whole
      // statistic is a ratio of integers ((N·D − S)/(N² − S)), so the
      // oracle replays it bit-exactly: the langid replay feeds exact
      // integer marginals, one IEEE division each for p_o, p_e, kappa.
      graft.operators.Profile.cohenKappa(
        documents(s, d).select(
          TextFns.langId(col("text")).as("pred"), col("lang")),
        "pred", "lang")
    },
    Q("ml_confusion",
      s"""WITH t AS (SELECT doc_id, lang,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS toks,
         |    regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS cjk
         |  FROM documents),
         |sc AS (SELECT doc_id, lang, cjk,
         |    len(list_filter(toks, x -> list_contains(${TextData.sqlList(TextFns.stopEn)}, x))) AS s_en,
         |    len(list_filter(toks, x -> list_contains(${TextData.sqlList(TextFns.stopDe)}, x))) AS s_de,
         |    len(list_filter(toks, x -> list_contains(${TextData.sqlList(TextFns.stopEs)}, x))) AS s_es,
         |    len(list_filter(toks, x -> list_contains(${TextData.sqlList(TextFns.stopFr)}, x))) AS s_fr
         |  FROM t),
         |pp AS (SELECT lang AS b,
         |    CASE WHEN cjk THEN 'zh'
         |         WHEN s_en >= GREATEST(s_de, s_es, s_fr) THEN 'en'
         |         WHEN s_de >= GREATEST(s_es, s_fr) THEN 'de'
         |         WHEN s_es >= s_fr THEN 'es'
         |         ELSE 'fr' END AS a
         |  FROM sc),
         |cnt AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM pp GROUP BY 1, 2),
         |bp AS (SELECT a AS cls, CAST(SUM(c) AS BIGINT) AS n_pred FROM cnt GROUP BY 1),
         |bl AS (SELECT b AS cls, CAST(SUM(c) AS BIGINT) AS n_true FROM cnt GROUP BY 1),
         |dg AS (SELECT a AS cls, c AS tp FROM cnt WHERE a = b),
         |j AS (SELECT COALESCE(bl.cls, bp.cls) AS label,
         |    COALESCE(n_true, 0) AS n_true, COALESCE(n_pred, 0) AS n_pred
         |  FROM bl FULL OUTER JOIN bp ON bl.cls = bp.cls),
         |k AS (SELECT j.label, j.n_true, j.n_pred, COALESCE(dg.tp, 0) AS tp
         |  FROM j LEFT JOIN dg ON j.label = dg.cls)
         |SELECT label, n_true, n_pred, tp,
         |  n_pred - tp AS fp, n_true - tp AS fn,
         |  CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE) / n_pred END AS precision,
         |  CASE WHEN n_true > 0 THEN CAST(tp AS DOUBLE) / n_true END AS recall,
         |  CASE WHEN n_pred > 0 AND n_true > 0
         |        AND (CAST(tp AS DOUBLE) / n_pred + CAST(tp AS DOUBLE) / n_true) > 0
         |    THEN 2.0 * (CAST(tp AS DOUBLE) / n_pred) * (CAST(tp AS DOUBLE) / n_true)
         |      / (CAST(tp AS DOUBLE) / n_pred + CAST(tp AS DOUBLE) / n_true) END AS f1
         |FROM k ORDER BY label""".stripMargin) { (s, d) =>
      // Per-class confusion summary of the langid heuristic vs the
      // reference labels — precision/recall/F1 from one (pred, label)
      // count grid, the per-class companion of pf_cohen_kappa's single
      // agreement number. Integer counts; each metric is a short chain of
      // correctly rounded IEEE ops, so the oracle replays them exactly;
      // degenerate denominators are null, never NaN.
      graft.operators.Profile.confusionStats(
          documents(s, d).select(
            TextFns.langId(col("text")).as("pred"), col("lang")),
          "pred", "lang")
        .orderBy("label")
    },
    Q("ml_auc",
      """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    (o_orderstatus = 'F') AS p FROM orders),
        |g AS (SELECT v,
        |    CAST(SUM(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |    CAST(SUM(CASE WHEN p THEN 0 ELSE 1 END) AS BIGINT) AS cn
        |  FROM c GROUP BY v),
        |r AS (SELECT v, cp, cn,
        |    COALESCE(SUM(cn) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
        |  FROM g),
        |t AS (SELECT CAST(SUM(cp) AS BIGINT) AS n_pos,
        |    CAST(SUM(cn) AS BIGINT) AS n_neg,
        |    SUM(CAST(cp AS DECIMAL(19,0))
        |        * CAST(below * 2 + cn AS DECIMAL(19,0))) AS num
        |  FROM r)
        |SELECT n_pos, n_neg, CAST(num AS DOUBLE) AS auc_num,
        |  CAST(num AS DOUBLE)
        |    / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
        |FROM t""".stripMargin) { (s, d) =>
      // Exact ROC AUC of order price as a classifier of fulfilled status
      // — the rank-sum (Mann–Whitney) identity with midrank ties, the
      // eval metric every classifier/retrieval pipeline reports. The
      // numerator Σ nPos(s)·(2·cumNegBelow(s) + nNeg(s)) is exact
      // integer/decimal arithmetic per DISTINCT score; the only float op
      // is the final division. The corpus-wide cumulative-negatives is
      // two-level (bucket window + driver offsets — Stats.rocAuc, the
      // ksTest machinery), so no unpartitioned window anywhere; the
      // oracle's single-window spelling is the semantic spec, not the
      // plan. Heavy ties (cent-quantized prices) exercise the midrank
      // path by construction.
      graft.ops.Stats.rocAuc(orders(s, d),
        col("o_orderstatus") === "F",
        round(col("o_totalprice") * 100))
    },
    Q("ml_pr_curve",
      """WITH c AS (SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
        |    (o_orderstatus = 'F') AS p FROM orders),
        |g AS (SELECT v,
        |    CAST(SUM(CASE WHEN p THEN 1 ELSE 0 END) AS BIGINT) AS cp,
        |    CAST(SUM(CASE WHEN p THEN 0 ELSE 1 END) AS BIGINT) AS cn
        |  FROM c GROUP BY v),
        |r AS (SELECT v, cp, cn,
        |    COALESCE(SUM(cp) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bp,
        |    COALESCE(SUM(cn) OVER (ORDER BY v
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS bn
        |  FROM g),
        |t AS (SELECT CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cn) AS BIGINT) AS nn FROM g)
        |SELECT r.v AS score_cents,
        |  CAST(t.np - r.bp AS BIGINT) AS tp, CAST(t.nn - r.bn AS BIGINT) AS fp,
        |  CAST(t.np - r.bp AS DOUBLE)
        |    / (CAST(t.np - r.bp AS DOUBLE) + CAST(t.nn - r.bn AS DOUBLE)) AS prec,
        |  CAST(t.np - r.bp AS DOUBLE) / CAST(t.np AS DOUBLE) AS recall
        |FROM r, t ORDER BY score_cents DESC""".stripMargin) { (s, d) =>
      // Exact PRECISION-RECALL curve — one point per distinct score
      // threshold (predict fulfilled when price ≥ s), tp/fp exact
      // BIGINTs, one IEEE division per output value. ROC AUC's
      // companion for the imbalanced-gate regime every corpus quality
      // filter lives in. Same two-level descending-cumulative machinery
      // as ml_auc (Stats.prCurve — bucket window + driver offsets, no
      // unpartitioned window); the oracle's single-window spelling is
      // the semantic spec, not the plan.
      graft.ops.Stats.prCurve(orders(s, d),
          col("o_orderstatus") === "F",
          round(col("o_totalprice") * 100))
        .orderBy(col("score_cents").desc)
    },
    Q("ml_mcc",
      """WITH c AS (SELECT (o_orderstatus = 'F') AS y,
        |    (o_totalprice >= 150000) AS p FROM orders),
        |t AS (SELECT
        |    CAST(SUM(CASE WHEN p AND y THEN 1 ELSE 0 END) AS BIGINT) AS tp,
        |    CAST(SUM(CASE WHEN p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS fp,
        |    CAST(SUM(CASE WHEN NOT p AND y THEN 1 ELSE 0 END) AS BIGINT) AS fn,
        |    CAST(SUM(CASE WHEN NOT p AND NOT y THEN 1 ELSE 0 END) AS BIGINT) AS tn
        |  FROM c)
        |SELECT tp, fp, fn, tn,
        |  CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn AS DOUBLE) AS mcc_num,
        |  CAST(CAST(tp AS HUGEINT) * tn - CAST(fp AS HUGEINT) * fn AS DOUBLE)
        |    / sqrt(CAST(CAST(tp + fp AS HUGEINT) * (tp + fn) * (tn + fp) * (tn + fn)
        |        AS DOUBLE)) AS mcc
        |FROM t""".stripMargin) { (s, d) =>
      // Matthews correlation of a threshold classifier (price ≥ 150k
      // predicting fulfilled) — the single-number binary metric that
      // stays honest under class imbalance where accuracy and F1
      // inflate. All four cells are exact BIGINTs from one aggregate;
      // the numerator and the margin product run in exact 128-bit
      // integers (HUGEINT / DECIMAL(38,0) — four ~n/2 margins overflow
      // int64 past n ≈ 55k rows), each converts once to the correctly-
      // rounded nearest double, and sqrt is IEEE correctly-rounded — so
      // the whole chain is bit-identical across engines.
      val dec = "decimal(38,0)"
      orders(s, d)
        .select((col("o_orderstatus") === "F").as("y"),
          (col("o_totalprice") >= 150000).as("p"))
        .agg(
          sum(when(col("p") && col("y"), 1L).otherwise(0L)).as("tp"),
          sum(when(col("p") && !col("y"), 1L).otherwise(0L)).as("fp"),
          sum(when(!col("p") && col("y"), 1L).otherwise(0L)).as("fn"),
          sum(when(!col("p") && !col("y"), 1L).otherwise(0L)).as("tn"))
        .select(col("tp"), col("fp"), col("fn"), col("tn"),
          (col("tp").cast(dec) * col("tn") - col("fp").cast(dec) * col("fn"))
            .cast("double").as("mcc_num"),
          ((col("tp").cast(dec) * col("tn") - col("fp").cast(dec) * col("fn"))
            .cast("double") /
            sqrt(((col("tp") + col("fp")).cast(dec) * (col("tp") + col("fn")) *
              (col("tn") + col("fp")) * (col("tn") + col("fn"))).cast("double")))
            .as("mcc"))
    },
    Q("ml_rouge2",
      """WITH toks AS (SELECT doc_id,
        |    list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS w
        |  FROM documents),
        |big AS (SELECT doc_id, w FROM toks WHERE len(w) >= 60),
        |cg0 AS (SELECT doc_id,
        |    unnest(list_transform(range(1, 25), i -> array_to_string(w[i:i+1], ' '))) AS g
        |  FROM big),
        |rg0 AS (SELECT doc_id,
        |    unnest(list_transform(range(26, len(w)), i -> array_to_string(w[i:i+1], ' '))) AS g
        |  FROM big),
        |cg AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM cg0 GROUP BY 1, 2),
        |rg AS (SELECT doc_id, g, CAST(COUNT(*) AS BIGINT) AS c FROM rg0 GROUP BY 1, 2),
        |ov AS (SELECT cg.doc_id, CAST(SUM(LEAST(cg.c, rg.c)) AS BIGINT) AS o
        |  FROM cg JOIN rg ON cg.doc_id = rg.doc_id AND cg.g = rg.g GROUP BY cg.doc_id)
        |SELECT b.doc_id, CAST(COALESCE(ov.o, 0) AS BIGINT) AS overlap,
        |  CAST(floor(COALESCE(ov.o, 0) * 1000000.0 / 24.0) AS BIGINT) AS p_micro,
        |  CAST(floor(COALESCE(ov.o, 0) * 1000000.0
        |    / CAST(len(w) - 26 AS DOUBLE)) AS BIGINT) AS r_micro,
        |  CAST(floor(2.0 * COALESCE(ov.o, 0) * 1000000.0
        |    / CAST(len(w) - 2 AS DOUBLE)) AS BIGINT) AS f1_micro
        |FROM big b LEFT JOIN ov ON ov.doc_id = b.doc_id
        |ORDER BY b.doc_id""".stripMargin) { (s, d) =>
      // ROUGE-2 (clipped bigram overlap, the summarization-eval metric)
      // as a distributed multiset intersection: per side, bigrams count
      // by (doc, gram); the clipped overlap is Σ min(count_cand,
      // count_ref) over the gram join — never a cross join, one shuffle
      // per side on (doc, gram). The fixture is the LEAD-BIAS shape a
      // training-data pipeline actually runs (candidate = a doc's first
      // 25 tokens, reference = its body): high ROUGE = the lead repeats
      // the body. Precision denominator is the candidate's 24 bigrams,
      // recall the body's len(w)-26, and F1 = 2o/(tc+tr) exactly —
      // all floored to integer micro-units, so the oracle compare is
      // bit-exact (the float division chains are shape-identical).
      val toks = documents(s, d)
        .select(col("doc_id"), TextFns.tokens(col("text")).as("w"))
        .filter(size(col("w")) >= 60)
      def grams(c: org.apache.spark.sql.Column) =
        explode(TextFns.strictWordShingles(c, 2)).as("g")
      val cg = toks.select(col("doc_id"), grams(slice(col("w"), 1, 25)))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("cc"))
      val rg = toks.select(col("doc_id"), grams(expr("slice(w, 26, size(w))")))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("rc"))
      val ov = cg.join(rg, Seq("doc_id", "g"))
        .groupBy("doc_id").agg(sum(least(col("cc"), col("rc"))).as("o"))
      toks.select(col("doc_id"), (size(col("w")) - 26).cast("long").as("tr"))
        .join(ov, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("o"), lit(0L)).as("overlap"),
          floor(coalesce(col("o"), lit(0L)) * lit(1000000.0) / lit(24.0))
            .as("p_micro"),
          floor(coalesce(col("o"), lit(0L)) * lit(1000000.0)
            / col("tr").cast("double")).as("r_micro"),
          floor(lit(2.0) * coalesce(col("o"), lit(0L)) * lit(1000000.0)
            / (col("tr") + 24L).cast("double")).as("f1_micro"))
        .orderBy("doc_id")
    },
    Q("pf_topk_coverage",
      """WITH c AS (SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM orders GROUP BY o_custkey),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c),
        |r AS (SELECT key, n,
        |    row_number() OVER (ORDER BY n DESC, key) AS rank
        |  FROM c),
        |top AS (SELECT * FROM r WHERE rank <= 20)
        |SELECT top.rank, top.key, top.n,
        |  CAST(SUM(top.n) OVER (ORDER BY top.rank
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_n,
        |  CAST(SUM(top.n) OVER (ORDER BY top.rank
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
        |    / CAST(t.total AS DOUBLE) AS cum_share
        |FROM top, t ORDER BY rank""".stripMargin) { (s, d) =>
      // Head-concentration profile: how much of the corpus the top-20
      // keys own (the skew diagnostic that decides salting, hot-key
      // caching, and whether per-key quotas are needed before training).
      // Scale shape: one map-side-combined key count, then TakeOrdered
      // 20 — the ordered window runs over exactly 20 rows, never the key
      // space (pf_key_skew's single-hottest-key check widened to the
      // cumulative curve). Counts exact; one division per row.
      import org.apache.spark.sql.expressions.Window
      val cnt = orders(s, d).groupBy(col("o_custkey").as("key"))
        .agg(count(lit(1)).as("n"))
      val tot = cnt.agg(sum(col("n")).as("total"))
      val top = cnt.orderBy(col("n").desc, col("key")).limit(20)
        .withColumn("rank", row_number().over(
          graft.ops.Windows.boundedGlobal(col("n").desc, col("key"))))
      val w = graft.ops.Windows.boundedGlobal(col("rank"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      top.crossJoin(broadcast(tot))
        .withColumn("cum_n", sum(col("n")).over(w))
        .select(col("rank"), col("key"), col("n"), col("cum_n"),
          (col("cum_n").cast("double") / col("total").cast("double")).as("cum_share"))
        .orderBy("rank")
    },
    Q("pf_gini",
      """WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2)
        |SELECT source, CAST(SUM(o) AS BIGINT) AS n_rows,
        |  CAST(COUNT(*) AS BIGINT) AS n_labels,
        |  1.0 - CAST(SUM(CAST(o AS DECIMAL(38,0)) * CAST(o AS DECIMAL(38,0))) AS DOUBLE)
        |    / CAST(CAST(SUM(o) AS DECIMAL(38,0)) * CAST(SUM(o) AS DECIMAL(38,0)) AS DOUBLE)
        |    AS gini
        |FROM c GROUP BY source ORDER BY source""".stripMargin) { (s, d) =>
      // Per-source Gini impurity of the language mix — the class-balance
      // signal a mixing stage monitors per domain (0 = single-language
      // source, higher = more mixed). 1 − Σc²/N² is exact rational
      // arithmetic: integer Σc² and N² in DECIMAL(38,0), one correctly
      // rounded division, one subtraction — bit-exact in any engine.
      graft.operators.Profile.giniImpurity(documents(s, d), "source", "lang")
        .orderBy("source")
    },
    Q("pf_cramers_v",
      """WITH obs AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM documents GROUP BY 1, 2),
        |la AS (SELECT DISTINCT lang FROM documents),
        |sb AS (SELECT DISTINCT source FROM documents),
        |f AS (
        |  SELECT la.lang, sb.source, COALESCE(obs.o, 0) AS o
        |  FROM la CROSS JOIN sb
        |  LEFT JOIN obs ON obs.lang = la.lang AND obs.source = sb.source),
        |r AS (SELECT lang, SUM(o) AS ri FROM f GROUP BY 1),
        |c AS (SELECT source, SUM(o) AS cj FROM f GROUP BY 1),
        |n AS (SELECT SUM(o) AS nn, COUNT(DISTINCT lang) AS ka,
        |             COUNT(DISTINCT source) AS kb FROM f),
        |t AS (
        |  SELECT CAST(f.o AS DECIMAL(38,0)) * CAST(n.nn AS DECIMAL(38,0))
        |         - CAST(r.ri AS DECIMAL(38,0)) * CAST(c.cj AS DECIMAL(38,0)) AS d,
        |         CAST(n.nn AS DECIMAL(38,0)) * CAST(r.ri AS DECIMAL(38,0))
        |           * CAST(c.cj AS DECIMAL(38,0)) AS den
        |  FROM f JOIN r USING (lang) JOIN c USING (source), n),
        |chi AS (
        |  SELECT CAST(n.nn AS BIGINT) AS n_rows,
        |    CAST(n.ka AS BIGINT) AS n_levels_a, CAST(n.kb AS BIGINT) AS n_levels_b,
        |    CAST((n.ka - 1) * (n.kb - 1) AS BIGINT) AS dof,
        |    CAST(SUM(CAST(CAST(d * d AS DOUBLE) / CAST(den AS DOUBLE) AS DECIMAL(30,6)))
        |      AS DOUBLE) AS chi2
        |  FROM t, n GROUP BY n.nn, n.ka, n.kb)
        |SELECT n_rows, n_levels_a, n_levels_b, dof, chi2,
        |  CASE WHEN LEAST(n_levels_a, n_levels_b) > 1
        |    THEN sqrt(chi2 / CAST(n_rows * (LEAST(n_levels_a, n_levels_b) - 1) AS DOUBLE))
        |    END AS cramers_v
        |FROM chi""".stripMargin) { (s, d) =>
      // Cramér's V: pf_chi2 normalized to [0,1] so association strength
      // compares across table sizes and level counts — one projection on
      // top of the chi2 row; engine-exact because IEEE division and sqrt
      // are correctly rounded over the already-bit-exact chi2.
      graft.operators.Profile.cramersV(documents(s, d), "lang", "source")
    },

    // ---- distribution drift between two slices -------------------------
    Q("pf_hellinger",
      """WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    (l_shipdate < TIMESTAMP '1995-01-01') AS is_a
        |  FROM lineitem),
        |m AS (SELECT MIN(cents) AS minc, MAX(cents) AS maxc FROM c),
        |b AS (SELECT CAST(((c.cents - m.minc) * 16) // (m.maxc - m.minc + 1) AS INTEGER) AS bucket,
        |    CAST(SUM(CASE WHEN c.is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN c.is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM c, m GROUP BY bucket),
        |t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta, CAST(SUM(n_b) AS BIGINT) AS tb FROM b),
        |k AS (SELECT CAST(SUM(CAST(floor(
        |      sqrt(CAST(b.n_a * b.n_b AS DOUBLE) / CAST(t.ta * t.tb AS DOUBLE))
        |        * 1000000) AS BIGINT)) AS BIGINT) AS bc_micro,
        |    MAX(t.ta) AS ta, MAX(t.tb) AS tb
        |  FROM b, t)
        |SELECT ta AS n_a, tb AS n_b, bc_micro,
        |  sqrt(1.0 - CAST(bc_micro AS DOUBLE) / 1000000.0) AS hellinger
        |FROM k""".stripMargin) { (s, d) =>
      // Hellinger distance between two slices' 16-bucket histograms —
      // the bounded [0,1] drift metric that (unlike pf_drift's L1) damps
      // the high-mass buckets and amplifies support mismatches, and
      // (unlike KS) works on the same fixed binning a dashboard keeps.
      // The Bhattacharyya terms √(p_a·p_b) are per-bucket doubles from
      // one identically-written expression chain (IEEE sqrt is correctly
      // rounded), FLOORED to integer micro-units BEFORE the cross-bucket
      // sum — so the reduction is order-independent and the final
      // sqrt(1 − BC) is a fixed two-op chain. Same scale shape as
      // pf_drift: the corpus collapses in the first bucket aggregate.
      val c = lineitem(s, d).select(
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        (col("l_shipdate") < lit("1995-01-01").cast("timestamp_ntz")).as("is_a"))
      val m = c.agg(min(col("cents")).as("minc"), max(col("cents")).as("maxc"))
      val b = c.crossJoin(broadcast(m))
        .select(
          expr("((cents - minc) * 16) DIV (maxc - minc + 1)").cast("int").as("bucket"),
          col("is_a"))
        .groupBy("bucket")
        .agg(sum(when(col("is_a"), 1).otherwise(0)).as("n_a"),
          sum(when(col("is_a"), 0).otherwise(1)).as("n_b"))
      val t = b.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
      b.crossJoin(broadcast(t))
        .agg(
          sum(floor(sqrt((col("n_a") * col("n_b")).cast("double") /
              (col("ta") * col("tb")).cast("double")) * 1000000).cast("long"))
            .as("bc_micro"),
          max(col("ta")).as("n_a"), max(col("tb")).as("n_b"))
        .select(col("n_a"), col("n_b"), col("bc_micro"),
          sqrt(lit(1.0) - col("bc_micro").cast("double") / 1000000.0).as("hellinger"))
    },
    Q("pf_drift",
      """WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
        |    (l_shipdate < TIMESTAMP '1995-01-01') AS is_a
        |  FROM lineitem),
        |m AS (SELECT MIN(cents) AS minc, MAX(cents) AS maxc FROM c),
        |b AS (SELECT CAST(((c.cents - m.minc) * 16) // (m.maxc - m.minc + 1) AS INTEGER) AS bucket,
        |    CAST(SUM(CASE WHEN c.is_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        |    CAST(SUM(CASE WHEN c.is_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
        |  FROM c, m GROUP BY bucket),
        |t AS (SELECT CAST(SUM(n_a) AS BIGINT) AS ta, CAST(SUM(n_b) AS BIGINT) AS tb FROM b)
        |SELECT t.ta AS n_a, t.tb AS n_b,
        |  CAST(SUM(abs(b.n_a * t.tb - b.n_b * t.ta)) AS BIGINT) AS l1_num,
        |  CAST(SUM(abs(b.n_a * t.tb - b.n_b * t.ta)) AS DOUBLE) / (t.ta * t.tb) AS l1_drift
        |FROM b, t GROUP BY t.ta, t.tb""".stripMargin) { (s, d) =>
      // Distribution drift check between two slices of a table (the data-
      // quality gate before promoting a new ingest vintage): L1 distance
      // between the slices' 16-bucket histograms. All comparisons stay in
      // integers — |n_a·T_b − n_b·T_a| summed exactly as BIGINT, ONE double
      // division at the end — so the drift score is engine-exact (the PSI
      // twin would need ln). l1_drift ∈ [0, 2]: 0 identical shapes, 2
      // disjoint supports.
      val c = lineitem(s, d).select(
        round(col("l_extendedprice") * 100).cast("long").as("cents"),
        (col("l_shipdate") < lit("1995-01-01").cast("timestamp_ntz")).as("is_a"))
      val m = c.agg(min(col("cents")).as("minc"), max(col("cents")).as("maxc"))
      val b = c.crossJoin(broadcast(m))
        .select(
          expr("((cents - minc) * 16) DIV (maxc - minc + 1)").cast("int").as("bucket"),
          col("is_a"))
        .groupBy("bucket")
        .agg(sum(when(col("is_a"), 1).otherwise(0)).as("n_a"),
          sum(when(col("is_a"), 0).otherwise(1)).as("n_b"))
      val t = b.agg(sum(col("n_a")).as("ta"), sum(col("n_b")).as("tb"))
      b.crossJoin(broadcast(t))
        .groupBy("ta", "tb")
        .agg(sum(abs(col("n_a") * col("tb") - col("n_b") * col("ta"))).as("l1_num"))
        .select(col("ta").as("n_a"), col("tb").as("n_b"), col("l1_num"),
          (col("l1_num").cast("double") / (col("ta") * col("tb"))).as("l1_drift"))
    }
  )
}
