package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.operators.Multimodal
import graft.ops.{Joins, Stats}

/** Round-8 catalog extensions: engine-exact statistics (bounded-recursion
  * EWMA, log-free diversity, count-min heavy hitters, deterministic
  * sample quantiles, grouped closed-form OLS), nearest-neighbor time
  * join, blocked edit-distance near-dup, LIX readability, a fixed-width
  * text source, and REAL audio decode over the in-engine WAV codec.
  *
  * All oracles follow the catalog parity rules (see [[Q]]); the novel
  * parity techniques here are (a) identical-fold EWMA — both engines
  * left-fold the same list with the same exactly-representable α, so
  * every IEEE step matches bit-for-bit — and (b) shared-text Cramer
  * solves — the 3×3 determinant arithmetic is ONE string
  * ([[graft.ops.Stats.det3]]) interpolated into both the Spark
  * `selectExpr` and the DuckDB oracle.
  */
object Advanced {

  // ---- BPE oracle: the train/encode merge rounds as unrolled CTEs ------
  // (the kmeans-codebook pattern: the SQL replays the driver loop's exact
  // relational algebra, one CTE chain per merge round)

  private val BpeMaxLen = 12
  private val BpeTopWords = 512
  private val BpeMerges = 12

  /** Vocabulary + initial char state (CTEs `w`, `s0`). */
  private def bpeBaseCtes: String =
    s"""w AS MATERIALIZED (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
       |    SELECT unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |      x -> regexp_full_match(x, '[a-z]+') AND length(x) <= $BpeMaxLen)) AS word
       |    FROM documents)
       |  GROUP BY word ORDER BY freq DESC, word LIMIT $BpeTopWords),
       |s0 AS MATERIALIZED (SELECT word, freq, CAST(u.i AS BIGINT) AS pos,
       |    substr(word, CAST(u.i AS INTEGER), 1) AS sym
       |  FROM w, unnest(generate_series(1, CAST(length(word) AS BIGINT))) AS u(i))""".stripMargin

  /** One training merge round `t`: top pair CTE `t$t` + merged state `s$t`
    * (the greedy-leftmost island algebra — see BpeTokenizer scaladoc).
    */
  private def bpeTrainRound(t: Int): String =
    s"""p$t AS MATERIALIZED (SELECT word, freq, pos, sym,
       |    lead(sym) OVER (PARTITION BY word ORDER BY pos) AS nxt FROM s${t - 1}),
       |t$t AS MATERIALIZED (SELECT sym AS l, nxt AS r, CAST(SUM(freq) AS BIGINT) AS cnt FROM p$t
       |  WHERE nxt IS NOT NULL GROUP BY sym, nxt ORDER BY cnt DESC, l, r LIMIT 1),
       |c$t AS MATERIALIZED (SELECT p.*, (p.sym = t.l AND p.nxt = t.r) AS iscand FROM p$t p, t$t t),
       |i$t AS MATERIALIZED (SELECT *, CASE WHEN iscand THEN pos - row_number()
       |    OVER (PARTITION BY word, iscand ORDER BY pos) END AS island FROM c$t),
       |m$t AS MATERIALIZED (SELECT *, iscand AND ((pos - MIN(pos)
       |    OVER (PARTITION BY word, island)) % 2 = 0) AS merged FROM i$t),
       |x$t AS MATERIALIZED (SELECT *, COALESCE(lag(merged) OVER (PARTITION BY word ORDER BY pos),
       |    false) AS prevm FROM m$t),
       |s$t AS MATERIALIZED (SELECT word, freq, row_number() OVER (PARTITION BY word ORDER BY pos) AS pos,
       |    CASE WHEN merged THEN sym || nxt ELSE sym END AS sym FROM x$t WHERE NOT prevm)"""
      .stripMargin

  /** One encode round `t` over the per-document word state `d${t-1}`,
    * merging the pair the TRAINING chain chose at step t (CTE `t$t`).
    */
  private def bpeEncodeRound(t: Int): String =
    s"""dp$t AS MATERIALIZED (SELECT doc_id, widx, pos, sym,
       |    lead(sym) OVER (PARTITION BY doc_id, widx ORDER BY pos) AS nxt FROM d${t - 1}),
       |dc$t AS MATERIALIZED (SELECT p.*, (p.sym = t.l AND p.nxt = t.r) AS iscand FROM dp$t p, t$t t),
       |di$t AS MATERIALIZED (SELECT *, CASE WHEN iscand THEN pos - row_number()
       |    OVER (PARTITION BY doc_id, widx, iscand ORDER BY pos) END AS island FROM dc$t),
       |dm$t AS MATERIALIZED (SELECT *, iscand AND ((pos - MIN(pos)
       |    OVER (PARTITION BY doc_id, widx, island)) % 2 = 0) AS merged FROM di$t),
       |dx$t AS MATERIALIZED (SELECT *, COALESCE(lag(merged)
       |    OVER (PARTITION BY doc_id, widx ORDER BY pos), false) AS prevm FROM dm$t),
       |d$t AS MATERIALIZED (SELECT doc_id, widx,
       |    row_number() OVER (PARTITION BY doc_id, widx ORDER BY pos) AS pos,
       |    CASE WHEN merged THEN sym || nxt ELSE sym END AS sym FROM dx$t WHERE NOT prevm)"""
      .stripMargin

  private def bpeTrainSql: String = {
    val rounds = (1 to BpeMerges).map(bpeTrainRound).mkString(",\n")
    val out = (1 to BpeMerges)
      .map(t => s"SELECT $t AS step, l AS left_sym, r AS right_sym, cnt FROM t$t")
      .mkString("\nUNION ALL ")
    s"WITH $bpeBaseCtes,\n$rounds\n$out\nORDER BY step"
  }

  private def bpeCountSql: String = {
    val trainRounds = (1 to BpeMerges).map(bpeTrainRound).mkString(",\n")
    val encodeRounds = (1 to BpeMerges).map(bpeEncodeRound).mkString(",\n")
    s"""WITH $bpeBaseCtes,
       |$trainRounds,
       |tok AS MATERIALIZED (SELECT doc_id,
       |    list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
       |      x -> x <> '') AS ts FROM documents),
       |oth AS MATERIALIZED (SELECT doc_id, CAST(len(list_filter(ts, x -> NOT (
       |      regexp_full_match(x, '[a-z]+') AND length(x) <= $BpeMaxLen)))
       |    AS BIGINT) AS n_other FROM tok),
       |dw AS MATERIALIZED (SELECT doc_id, CAST(u.i AS BIGINT) - 1 AS widx, ws[CAST(u.i AS INTEGER)] AS word
       |  FROM (SELECT doc_id, list_filter(ts, x ->
       |      regexp_full_match(x, '[a-z]+') AND length(x) <= $BpeMaxLen) AS ws FROM tok),
       |    unnest(generate_series(1, CAST(len(ws) AS BIGINT))) AS u(i)),
       |d0 AS MATERIALIZED (SELECT doc_id, widx, CAST(u.i AS BIGINT) AS pos,
       |    substr(word, CAST(u.i AS INTEGER), 1) AS sym
       |  FROM dw, unnest(generate_series(1, CAST(length(word) AS BIGINT))) AS u(i)),
       |$encodeRounds,
       |bc AS MATERIALIZED (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bpe_sym
       |  FROM d$BpeMerges GROUP BY doc_id)
       |SELECT o.doc_id, COALESCE(bc.n_bpe_sym, 0) + o.n_other AS n_bpe_tokens
       |FROM oth o LEFT JOIN bc USING (doc_id) ORDER BY o.doc_id""".stripMargin
  }

  val queries: Seq[Q] = Seq(

    // ---- BPE tokenizer: in-engine training + application ---------------
    Q("tx_bpe_train", bpeTrainSql) { (s, d) =>
      // REAL BPE training (Sennrich arXiv:1508.07909) in the engine: 12
      // merges learned over the top-512 word-frequency vocabulary. The
      // scale shape is the point — ONE corpus-wide tokenize+count
      // shuffle, then every merge round is window algebra over the
      // bounded vocab (corpus-size-independent, the kmeans-codebook
      // pattern), and the oracle replays all 12 rounds as CTE chains —
      // greedy-leftmost merge semantics proven equivalent through the
      // gaps-and-islands formulation on both engines.
      import s.implicits._
      val words = graft.operators.BpeTokenizer.wordFrequencies(
        documents(s, d), "text", maxWordLen = BpeMaxLen, topWords = BpeTopWords)
      graft.operators.BpeTokenizer.train(s, words, nMerges = BpeMerges)
        .toDF().orderBy("step")
    },
    Q("tx_bpe_count", bpeCountSql) { (s, d) =>
      // The trained tokenizer APPLIED: per-document token counts under
      // the 12 learned merges (alphabetic words collapse to their merged
      // symbol count; every other token counts 1 — the byte-fallback
      // floor). Replaces tx_token_count's chars/4 heuristic with a real
      // subword count; the oracle re-derives the merges AND re-encodes
      // every document, so a hash match proves training and application
      // end to end.
      import graft.operators.BpeTokenizer
      val words = BpeTokenizer.wordFrequencies(
        documents(s, d), "text", maxWordLen = BpeMaxLen, topWords = BpeTopWords)
      val merges = BpeTokenizer.train(s, words, nMerges = BpeMerges)
      BpeTokenizer.encodeCounts(documents(s, d), "doc_id", "text", merges,
          maxWordLen = BpeMaxLen)
        .orderBy("doc_id")
    },

    // ---- W14: bounded-recursion EWMA -----------------------------------
    Q("w14_ewma",
      """WITH o AS (SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day
        |  FROM orders)
        |SELECT o_custkey, o_orderkey, day,
        |  list_reduce(
        |    list(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY day, o_orderkey
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW),
        |    (acc, v) -> (0.25 * v) + (0.75 * acc)) AS ewma
        |FROM o ORDER BY o_custkey, day, o_orderkey""".stripMargin) { (s, d) =>
      // Exponentially weighted moving average — the sequential recursion
      // distributed engines usually refuse — as a bounded per-row fold:
      // collect the 8-row trailing frame, left-fold with α=0.25 (exactly
      // representable, so each (0.25·x)+(0.75·acc) step is bit-identical
      // to DuckDB's list_reduce over the same frame). One keyed shuffle.
      val o = orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) DIV 86400000000").as("day"))
      Stats.ewma(o, keys = Seq("o_custkey"), order = Seq("day", "o_orderkey"),
          value = "o_totalprice", alpha = 0.25, lookback = 8)
        .select("o_custkey", "o_orderkey", "day", "ewma")
        .orderBy("o_custkey", "day", "o_orderkey")
    },

    // ---- profiling: log-free diversity ---------------------------------
    Q("pf_diversity",
      """WITH c AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY source, lang),
        |g AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n,
        |    CAST(COUNT(*) AS BIGINT) AS n_cats, CAST(SUM(c*c) AS BIGINT) AS sum_sq
        |  FROM c GROUP BY source)
        |SELECT source, n, n_cats, sum_sq,
        |  1.0 - (CAST(sum_sq AS DOUBLE) / CAST(n*n AS DOUBLE)) AS gini_simpson,
        |  CAST(n*n AS DOUBLE) / CAST(sum_sq AS DOUBLE) AS effective_cats
        |FROM g ORDER BY source NULLS FIRST""".stripMargin) { (s, d) =>
      // Language diversity per corpus source — the domain-mix health
      // check before sampling weights are chosen. Gini–Simpson (1 − Σp²)
      // instead of Shannon entropy: deliberately log-free (ln() is not
      // bit-guaranteed across engines); Σc² is exact BIGINT and each
      // output is ONE double division.
      Stats.diversity(documents(s, d).select("source", "lang"), "source", "lang")
        .orderBy("source")
    },

    // ---- profiling: count-min-sketch heavy hitters ---------------------
    Q("pf_heavy_hitters",
      """WITH c AS (SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS true_n
        |  FROM orders GROUP BY o_custkey),
        |r AS (SELECT key, true_n, j,
        |    CAST('0x' || substr(md5(CAST(j AS VARCHAR) || '-' || CAST(key AS VARCHAR)), 1, 8)
        |         AS BIGINT) % 256 AS bucket
        |  FROM c, unnest([0, 1, 2]) AS u(j)),
        |ctr AS (SELECT j, bucket, CAST(SUM(true_n) AS BIGINT) AS cnt
        |  FROM r GROUP BY j, bucket),
        |e AS (SELECT r.key, r.true_n, MIN(ctr.cnt) AS cms_n
        |  FROM r JOIN ctr USING (j, bucket) GROUP BY r.key, r.true_n),
        |t AS (SELECT key, true_n, cms_n,
        |    row_number() OVER (ORDER BY true_n DESC, key) AS rk FROM e)
        |SELECT key AS o_custkey, true_n, cms_n, cms_n - true_n AS overcount,
        |  CAST(rk AS INTEGER) AS rk
        |FROM t WHERE rk <= 20 ORDER BY rk""".stripMargin) { (s, d) =>
      // Heavy hitters with the sketch's own error surfaced: exact top-20
      // keys, each annotated with what a depth-3 × width-256 count-min
      // sketch would report (md5-bucketed — deterministic, replayable).
      // cms_n ≥ true_n by construction; `overcount` is the collision
      // error a capacity planner sizes width against. One full shuffle
      // (the exact groupBy); the sketch itself is 768 cells.
      Stats.cmsHeavyHitters(orders(s, d).select("o_custkey"), "o_custkey",
          depth = 3, width = 256, topK = 20)
        .orderBy("rk")
    },

    // ---- deterministic sample quantiles --------------------------------
    Q("qt_sample_quantile",
      """WITH s AS (SELECT CAST(l_extendedprice AS DOUBLE) AS v,
        |    md5(CAST(l_orderkey AS VARCHAR) || '-' || CAST(l_linenumber AS VARCHAR)) AS pri
        |  FROM lineitem ORDER BY pri LIMIT 1000),
        |r AS (SELECT v, pri, COUNT(*) OVER () AS n_sample,
        |    row_number() OVER (ORDER BY v, pri) AS vrk FROM s)
        |SELECT CAST(n_sample AS BIGINT) AS n_sample,
        |  MAX(CASE WHEN vrk = ((n_sample - 1) * 25) // 100 + 1 THEN v END) AS p25,
        |  MAX(CASE WHEN vrk = ((n_sample - 1) * 50) // 100 + 1 THEN v END) AS p50,
        |  MAX(CASE WHEN vrk = ((n_sample - 1) * 75) // 100 + 1 THEN v END) AS p75,
        |  MAX(CASE WHEN vrk = ((n_sample - 1) * 90) // 100 + 1 THEN v END) AS p90
        |FROM r GROUP BY n_sample""".stripMargin) { (s, d) =>
      // Quantile estimation over a DETERMINISTIC 1000-row sample: priority
      // = md5 of the row key, take lowest-k (plans as per-partition
      // partial top-k — no global sort, no rand() — retry-stable and
      // layout-independent), then exact order statistics of the sample
      // (index ⌊(k−1)·q⌋ element picks, no interpolation arithmetic).
      Stats.sampleQuantiles(lineitem(s, d),
        keyCols = Seq("l_orderkey", "l_linenumber"),
        value = "l_extendedprice", k = 1000, qs = Seq(0.25, 0.50, 0.75, 0.90))
    },

    // ---- ML: grouped closed-form OLS -----------------------------------
    Q("ml_grouped_ols", {
      val casts = Stats.olsCastSql.map("    " + _).mkString(",\n")
      val solves = Stats.olsSolveSql.map("  " + _).mkString(",\n")
      s"""WITH c AS (SELECT l_returnflag,
         |    CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS yy,
         |    CAST(ROUND(l_quantity * 100) AS BIGINT) AS u,
         |    CAST(ROUND(l_discount * 100) AS BIGINT) AS v
         |  FROM lineitem),
         |s AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(u) AS BIGINT) AS su, CAST(SUM(v) AS BIGINT) AS sv,
         |    CAST(SUM(yy) AS BIGINT) AS sy,
         |    CAST(SUM(u*u) AS BIGINT) AS suu, CAST(SUM(u*v) AS BIGINT) AS suv,
         |    CAST(SUM(v*v) AS BIGINT) AS svv,
         |    CAST(SUM(u*yy) AS BIGINT) AS suy, CAST(SUM(v*yy) AS BIGINT) AS svy
         |  FROM c GROUP BY l_returnflag),
         |dd AS (SELECT l_returnflag, n,
         |$casts
         |  FROM s)
         |SELECT l_returnflag, n,
         |$solves
         |FROM dd ORDER BY l_returnflag""".stripMargin
    }) { (s, d) =>
      // Regression how it must look at 100 TB: ONE map-side-combined
      // aggregation of EXACT normal-equation sums (inputs floored to
      // integer centi-units — BIGINT arithmetic, no float reduction
      // order), then a per-group 3×3 Cramer solve whose arithmetic is
      // the SAME SQL text on both engines (Stats.det3) — bit-identical
      // IEEE evaluation. Predicts extendedprice from quantity+discount
      // per returnflag; sums shuffle, rows never do.
      Stats.groupedOls2(
          lineitem(s, d).select("l_returnflag", "l_extendedprice", "l_quantity", "l_discount"),
          group = "l_returnflag", y = "l_extendedprice",
          x1 = "l_quantity", x2 = "l_discount")
        .orderBy("l_returnflag")
    },

    // ---- J18: nearest-neighbor time join -------------------------------
    Q("j18_nearest_join",
      """WITH p AS (SELECT event_id, user_id, ts FROM events
        |  WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, ts AS click_ts, MAX(value) AS click_value
        |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts)
        |SELECT p.event_id, p.user_id, p.ts, n.click_ts, n.click_value
        |FROM p LEFT JOIN LATERAL (
        |  SELECT c.click_ts, c.click_value FROM c WHERE c.user_id = p.user_id
        |  ORDER BY abs(epoch_us(c.click_ts) - epoch_us(p.ts)), c.click_ts LIMIT 1) n
        |  ON true
        |ORDER BY p.event_id""".stripMargin) { (s, d) =>
      // Nearest click in EITHER direction per purchase (as-of only looks
      // back; attribution analyses often want nearest-touch). Two keyed
      // asof passes (backward + forward) + an exact integer-micros pick —
      // never the O(|L|·|R|) inequality nested-loop the lateral oracle
      // runs. Ties break to the earlier click; clicks are pre-aggregated
      // per (user, instant) so "nearest row" is well-defined.
      val ev = events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("click_ts"))
        .agg(max(col("value")).as("click_value"))
      Joins.nearestJoin(purchases, clicks, Seq("user_id"),
          leftTime = "ts", rightTime = "click_ts",
          rightVals = Seq("click_ts", "click_value"))
        .orderBy("event_id")
    },

    // ---- dedup: blocked edit distance ----------------------------------
    Q("dd_edit_distance",
      """WITH d AS (SELECT doc_id, lang, n_chars // 64 AS b,
        |    substr(lower(trim(text)), 1, 40) AS pfx
        |  FROM documents),
        |e AS (SELECT doc_id, lang, pfx, b FROM d
        |  UNION ALL SELECT doc_id, lang, pfx, b + 1 FROM d),
        |p AS (SELECT DISTINCT a.doc_id AS doc_a, x.doc_id AS doc_b,
        |    a.pfx AS pa, x.pfx AS pb
        |  FROM e a JOIN e x ON a.lang = x.lang AND a.b = x.b AND a.doc_id < x.doc_id)
        |SELECT doc_a, doc_b, CAST(levenshtein(pa, pb) AS INTEGER) AS lev
        |FROM p WHERE levenshtein(pa, pb) <= 10
        |ORDER BY doc_a, doc_b""".stripMargin) { (s, d) =>
      // Near-dup by EDIT DISTANCE — the classic small-perturbation family
      // (minhash/simhash catch token-level similarity; Levenshtein
      // catches character-level edits). Never all-pairs: docs block on
      // (lang, 64-char length bucket), each doc also probes the next
      // bucket (so pairs straddling a boundary are kept), and the O(p²)
      // verify runs on 40-char prefixes within blocks only.
      graft.operators.Dedup.editDistancePairs(documents(s, d),
          id = "doc_id", text = "text", lang = "lang", sizeCol = "n_chars",
          bucketWidth = 64, prefixLen = 40, maxDist = 10)
        .orderBy("doc_a", "doc_b")
    },

    Q("dd_phonetic",
      """WITH w AS (SELECT doc_id, regexp_extract(text, '[A-Za-z]+') AS word
        |  FROM documents),
        |u AS (SELECT doc_id, word, upper(word) AS uw FROM w WHERE word <> ''),
        |t AS (SELECT doc_id, word, uw,
        |    translate(uw, 'AEIOUYBFPVCGJKQSXZDTLMNRHW',
        |              '000000111122222222334556') AS tz FROM u),
        |c AS (SELECT doc_id, word, uw,
        |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        |      regexp_replace(regexp_replace(tz,
        |      '1{2,}', '1', 'g'), '2{2,}', '2', 'g'), '3{2,}', '3', 'g'),
        |      '4{2,}', '4', 'g'), '5{2,}', '5', 'g'), '6{2,}', '6', 'g') AS cz
        |  FROM t),
        |k AS (SELECT doc_id, word,
        |    substr(uw, 1, 1) ||
        |      substr(rpad(translate(substr(cz, 2), '0', ''), 3, '0'), 1, 3) AS code
        |  FROM c)
        |SELECT doc_id, word, code,
        |  CAST(COUNT(*) OVER (PARTITION BY code) AS BIGINT) AS group_n,
        |  (COUNT(*) OVER (PARTITION BY code) > 1) AS is_dup
        |FROM k ORDER BY doc_id""".stripMargin) { (s, d) =>
      // PHONETIC-key dedup (soundex as a translate/regexp chain): the
      // name-matching family minhash and edit distance both miss —
      // 'Smith'/'Smyth' are 1 apart phonetically but far in shingle
      // space. The key is a pure chain of codegen'd built-ins (letter
      // classes via translate with H/W transparent, per-digit run
      // collapse, zero strip, pad) that the oracle replays VERBATIM in
      // SQL — DuckDB has no native soundex, and depending on one
      // engine's soundex variant would make the result untestable.
      // Each doc's leading word is keyed; group_n is the phonetic-block
      // size (the blocking key the neighbor-bucket verify join consumes
      // — DedupSpec pins planted homophones landing in one block).
      // Scale: zero-shuffle projection + one window count on the code.
      graft.operators.Dedup.phoneticGroups(documents(s, d), "doc_id", "text")
        .select("doc_id", "word", "code", "group_n", "is_dup")
        .orderBy("doc_id")
    },

    // ---- text: LIX readability -----------------------------------------
    Q("tx_readability",
      """WITH t AS (SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'), x -> x <> '')) AS nt,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        x -> x <> '' AND length(x) > 6)) AS lw,
        |    len(list_filter(regexp_split_to_array(text, '[.!?]+'), x -> trim(x) <> '')) AS sents
        |  FROM documents)
        |SELECT doc_id, CAST(nt AS INTEGER) AS n_words, CAST(lw AS INTEGER) AS n_long,
        |  CAST(GREATEST(sents, 1) AS INTEGER) AS n_sentences,
        |  CASE WHEN nt > 0 THEN (CAST(nt AS DOUBLE) / GREATEST(sents, 1))
        |       + ((CAST(lw AS DOUBLE) * 100.0) / nt) END AS lix
        |FROM t ORDER BY doc_id""".stripMargin) { (s, d) =>
      // LIX readability (avg sentence length + % long words) — syllable-
      // free by design, so every input is an exact token/char count and
      // the score is two divisions and one add, written identically on
      // both sides. Narrow projection, no shuffle.
      import graft.functions.TextFns
      val toks = TextFns.tokens(col("text"))
      val t = documents(s, d).select(
        col("doc_id"),
        size(toks).as("nt"),
        size(filter(toks, x => length(x) > 6)).as("lw"),
        size(filter(split(col("text"), "[.!?]+"), x => trim(x) =!= "")).as("sents"))
      t.select(
          col("doc_id"), col("nt").cast("int").as("n_words"),
          col("lw").cast("int").as("n_long"),
          greatest(col("sents"), lit(1)).cast("int").as("n_sentences"),
          when(col("nt") > 0,
            (col("nt").cast("double") / greatest(col("sents"), lit(1)))
              + ((col("lw").cast("double") * lit(100.0)) / col("nt"))).as("lix"))
        .orderBy("doc_id")
    },

    // ---- S14: fixed-width text scan/sink -------------------------------
    Q("s14_fixed_width",
      """SELECT n_nationkey, n_regionkey, n_name FROM nation
        |ORDER BY n_nationkey""".stripMargin) { (s, d) =>
      // S14: fixed-width layout (mainframe/COBOL feeds) — sink right-pads
      // into fixed byte slots, scan is substring+rtrim+cast per field;
      // both pure expressions over Spark's native text source. The oracle
      // is the original table: a hash match proves the round-trip is
      // lossless (fit/trailing-space violations fail loudly at write).
      import graft.sources.FixedWidth
      import graft.sources.FixedWidth.Field
      val fields = Seq(
        Field("n_nationkey", 4, "bigint"),
        Field("n_regionkey", 4, "bigint"),
        Field("n_name", 25, "string"))
      val base = nation(s, d).select("n_nationkey", "n_regionkey", "n_name")
      val path = s"${sys.props("java.io.tmpdir")}/graft_s14_${graft.core.Tables.pathKey(d)}"
      FixedWidth.write(base, path, fields)
      FixedWidth.read(s, path, fields).orderBy("n_nationkey")
    },

    // ---- multimodal: REAL audio decode (in-engine WAV) -----------------
    Q("mm_audio_stats",
      """WITH s AS (SELECT doc_id AS media_id, 64 + doc_id % 193 AS n FROM documents),
        |x AS (SELECT media_id, n,
        |    CAST('0x' || substr(md5(CAST(media_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)),
        |      1, 4) AS BIGINT) - 32768 AS v
        |  FROM s, unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS u(i)),
        |a AS (SELECT media_id, CAST(COUNT(*) AS INTEGER) AS n_samples,
        |    CAST(MAX(abs(v)) AS BIGINT) AS peak, CAST(SUM(v*v) AS BIGINT) AS energy,
        |    CAST(SUM(v) AS BIGINT) AS sum_amp
        |  FROM x GROUP BY media_id)
        |SELECT media_id, CAST(44 + 2 * n_samples AS INTEGER) AS n_bytes,
        |  TRUE AS decoded, CAST(16000 AS INTEGER) AS sample_rate,
        |  n_samples, peak, energy, sum_amp
        |FROM a ORDER BY media_id""".stripMargin) { (s, d) =>
      // REAL audio: deterministic PCM16 waveforms (md5-derived samples —
      // non-recursive, so the oracle replays them without a recursive
      // CTE) are ENCODED to RIFF/WAVE bytes by the in-engine Wav codec,
      // PARSED back by the same codec (chunk walk, strict PCM16-mono),
      // and reduced to integer-exact waveform features by pure HOF
      // expressions. A hash match proves container layout, little-endian
      // sample packing, and the decode path all round-trip losslessly —
      // the audio twin of mm_decode's planted-PNG contract.
      val gen = documents(s, d).select(
          col("doc_id").cast("long").as("media_id"),
          lit(16000).as("sample_rate"),
          (lit(64) + col("doc_id") % 193).cast("int").as("n"))
        .withColumn("samples", transform(
          sequence(lit(0), col("n") - 1),
          i => (conv(substring(md5(concat_ws(":", col("media_id"), i)), 1, 4), 16, 10)
            .cast("long") - 32768).cast("int")))
        .select("media_id", "sample_rate", "samples")
      val wav = Multimodal.encodeWav(s, gen)
      Multimodal.audioFeatures(Multimodal.decodeWav(s, wav).toDF())
        .orderBy("media_id")
    },
    Q("mm_audio_silence",
      """WITH s AS (SELECT doc_id AS media_id, 64 + doc_id % 193 AS n FROM documents),
        |x AS (SELECT media_id, n, CAST(i AS BIGINT) AS i,
        |    CAST('0x' || substr(md5(CAST(media_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)),
        |      1, 4) AS BIGINT) - 32768 AS v
        |  FROM s, unnest(generate_series(0, CAST(n - 1 AS BIGINT))) AS u(i)),
        |sl AS (SELECT media_id, i, (abs(v) < 8192) AS sil FROM x),
        |isl AS (SELECT media_id, i, sil,
        |    i - row_number() OVER (PARTITION BY media_id, sil ORDER BY i) AS grp
        |  FROM sl),
        |runs AS (SELECT media_id, grp, CAST(COUNT(*) AS INTEGER) AS rl
        |  FROM isl WHERE sil GROUP BY media_id, grp),
        |agg AS (SELECT media_id,
        |    CAST(SUM(CASE WHEN rl >= 3 THEN 1 ELSE 0 END) AS INTEGER) AS n_runs,
        |    CAST(MAX(rl) AS INTEGER) AS max_run,
        |    CAST(SUM(rl) AS INTEGER) AS silent_samples
        |  FROM runs GROUP BY media_id)
        |SELECT s.media_id, CAST(s.n AS INTEGER) AS n_samples,
        |  COALESCE(a.n_runs, 0) AS n_runs, COALESCE(a.max_run, 0) AS max_run,
        |  COALESCE(a.silent_samples, 0) AS silent_samples
        |FROM s LEFT JOIN agg a USING (media_id)
        |ORDER BY media_id""".stripMargin) { (s, d) =>
      // Silence segmentation over REAL decoded audio (the WAV round-trip
      // of mm_audio_stats): maximal |v| < 8192 runs found by ONE in-order
      // HOF fold per media (Multimodal.silenceRuns — no per-sample rows,
      // no shuffle of samples; the oracle's gaps-and-islands window is
      // the semantic spec, the engine's fold is the plan). Counts are
      // pure integers; ~25% of uniform samples sit under the threshold,
      // so ≥3-sample runs exist but are not universal — both the
      // "has dead air" and the all-zero branches are exercised.
      val gen = documents(s, d).select(
          col("doc_id").cast("long").as("media_id"),
          lit(16000).as("sample_rate"),
          (lit(64) + col("doc_id") % 193).cast("int").as("n"))
        .withColumn("samples", transform(
          sequence(lit(0), col("n") - 1),
          i => (conv(substring(md5(concat_ws(":", col("media_id"), i)), 1, 4), 16, 10)
            .cast("long") - 32768).cast("int")))
        .select("media_id", "sample_rate", "samples")
      val wav = Multimodal.encodeWav(s, gen)
      Multimodal.silenceRuns(Multimodal.decodeWav(s, wav).toDF(),
          threshold = 8192, minRun = 3)
        .orderBy("media_id")
    }
  )
}
