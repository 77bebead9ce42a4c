package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables._
import graft.operators.{HashClassifier, Sampling}
import graft.ops.Stats

/** Round-8 second tranche: exact distribution-shift testing (two-sample
  * KS), hashed-feature classifier inference (the corpus quality-gate
  * shape), temperature-scaled mixture sampling (UniMax), batched ANN range
  * search, perceptual image hashing + image dedup over the REAL decoder,
  * an in-engine XML source, and incremental join-view maintenance.
  *
  * All oracles follow the catalog parity rules (see [[Q]]); the recurring
  * technique is all-integer reductions (BIGINT cumulative counts, milli-
  * unit weights, micro-unit quotas) with at most one final double division
  * per output value.
  */
object Extensions {

  /** Per-family pattern parameters from the family id's md5: a base
    * offset (first hex byte) and an odd pixel stride (second byte → 64
    * strides). The md5 derivation is what keeps cross-family CONTENT
    * diverse: the earlier plain-ramp scheme (base = fam·31, stride 1)
    * had only ~256 distinct wrap positions per geometry, so at sf0.1
    * nearly every pair of the 5000 anchor hashes collided on some band —
    * 10.7M candidate pairs through the near-dup join (measured; the
    * md5-parameterized content yields 4,282 distinct hashes and 674k
    * candidates at the same scale, with the planted same-family pairs
    * still landing). DuckDB replays it as
    * CAST('0x' || substr(md5(fam), …) AS BIGINT).
    */
  private def famPattern(fam: Long): (Int, Int) = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(fam.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (Integer.parseInt(hex.substring(0, 2), 16),
      1 + 2 * (Integer.parseInt(hex.substring(2, 4), 16) % 64))
  }

  /** Planted rasters for the phash family: content keyed by
    * fam = id DIV 5 (exactly 5 images per content family — CONSTANT in
    * the corpus size, so the banded near-dup join's candidate volume
    * grows linearly with the table; the old gid = id % 40 scheme let
    * family size — and candidate pairs, quadratically — grow with SF),
    * pattern shape from [[famPattern]]'s md5-derived (base, stride)
    * (cross-family content diversity — see there), plus a small
    * per-copy brightness phase shift delta = id % 5 — same-family
    * images are NEAR-duplicates (small hamming distance between their
    * aHashes), cross-family images are far. Sizes are ≥ the 8×8 hash
    * grid. Every formula is replayed verbatim by the oracles.
    * Repartitioned off the single-row-group documents scan so
    * encode/decode parallelize.
    */
  private def plantedPhashPngs(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism)
      .as[Long].map { id =>
      val fam = id / 5
      val delta = id % 5
      val (fbase, fstride) = famPattern(fam)
      val w = (24 + (fam % 3) * 8).toInt
      val h = (16 + (fam % 2) * 8).toInt
      val px = Array.tabulate(w * h)(i => ((fbase + i * fstride + delta) % 256).toInt)
      graft.operators.Multimodal.MediaRow(id, "image", graft.sources.Png.encodeGray(w, h, px))
    }.toDF()
  }

  /** The shared phash CTE chain: planted pixels → 8×8 block lattice by
    * exact integer floors → cross-multiplied mean bits → 64-char hash.
    */
  private val phashCtes: String =
    """g AS (SELECT doc_id AS media_id, doc_id // 5 AS fam, doc_id % 5 AS delta
      |  FROM documents),
      |fpat AS (SELECT media_id, fam, delta,
      |    CAST('0x' || substr(md5(CAST(fam AS VARCHAR)), 1, 2) AS BIGINT) AS fbase,
      |    1 + 2 * (CAST('0x' || substr(md5(CAST(fam AS VARCHAR)), 3, 2) AS BIGINT) % 64)
      |      AS fstride FROM g),
      |dim AS (SELECT media_id, fam, delta, fbase, fstride,
      |    CAST(24 + (fam % 3) * 8 AS BIGINT) AS w,
      |    CAST(16 + (fam % 2) * 8 AS BIGINT) AS h FROM fpat),
      |px AS (SELECT media_id, w, h, u.i % w AS x, u.i // w AS y,
      |    (fbase + u.i * fstride + delta) % 256 AS p
      |  FROM dim, unnest(generate_series(0, w * h - 1)) AS u(i)),
      |blk AS (SELECT media_id, w, h, ((y * 8) // h) * 8 + ((x * 8) // w) AS j,
      |    CAST(SUM(p) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS np
      |  FROM px GROUP BY media_id, w, h, j),
      |tot AS (SELECT media_id, CAST(SUM(s) AS BIGINT) AS total FROM blk GROUP BY media_id),
      |bits AS (SELECT blk.media_id, blk.w, blk.h, blk.j,
      |    CASE WHEN blk.s * (blk.w * blk.h) >= tot.total * blk.np
      |      THEN '1' ELSE '0' END AS bit
      |  FROM blk JOIN tot USING (media_id)),
      |ph AS (SELECT media_id, CAST(MAX(w) AS INTEGER) AS width,
      |    CAST(MAX(h) AS INTEGER) AS height,
      |    string_agg(bit, '' ORDER BY j) AS phash
      |  FROM bits GROUP BY media_id)""".stripMargin

  /** Planted AVIs for the video-phash family — the [[plantedPhashPngs]]
    * content-family scheme lifted to multi-frame video: fam = id DIV 5
    * keys the family (constant 5-member families, see the PNG twin),
    * delta = id % 5 is the per-copy brightness phase shift (same-family
    * videos are near-duplicates frame for frame), and each video
    * carries 1 + id % 3 frames whose pixels also vary by a per-frame
    * phase (frame · 53). Every formula is replayed verbatim by the
    * oracles.
    */
  private def plantedPhashAvis(s: org.apache.spark.sql.SparkSession, d: String) = {
    import s.implicits._
    documents(s, d).select("doc_id")
      .repartition(s.sparkContext.defaultParallelism)
      .as[Long].map { id =>
      val fam = id / 5
      val delta = id % 5
      val (fbase, fstride) = famPattern(fam)
      val w = (24 + (fam % 3) * 8).toInt
      val h = (16 + (fam % 2) * 8).toInt
      val nf = (1 + id % 3).toInt
      val frames = (0 until nf).map(f =>
        Array.tabulate(w * h)(i => ((fbase + f * 53 + i * fstride + delta) % 256).toInt))
      graft.operators.Multimodal.MediaRow(id, "video",
        graft.sources.Avi.encodeGray8Frames(w, h, 24, frames))
    }.toDF()
  }

  /** The per-(video, frame) phash CTE chain over [[plantedPhashAvis]]'s
    * formulas — [[phashCtes]] with the frame dimension threaded through.
    */
  private val videoPhashCtes: String =
    """g AS (SELECT doc_id AS media_id, doc_id // 5 AS fam, doc_id % 5 AS delta,
      |    CAST(1 + doc_id % 3 AS INTEGER) AS nf FROM documents),
      |fpat AS (SELECT media_id, fam, delta, nf,
      |    CAST('0x' || substr(md5(CAST(fam AS VARCHAR)), 1, 2) AS BIGINT) AS fbase,
      |    1 + 2 * (CAST('0x' || substr(md5(CAST(fam AS VARCHAR)), 3, 2) AS BIGINT) % 64)
      |      AS fstride FROM g),
      |dim AS (SELECT media_id, fam, delta, nf, fbase, fstride,
      |    CAST(24 + (fam % 3) * 8 AS BIGINT) AS w,
      |    CAST(16 + (fam % 2) * 8 AS BIGINT) AS h FROM fpat),
      |fr AS (SELECT media_id, fam, delta, nf, fbase, fstride, w, h,
      |    CAST(u.f AS INTEGER) AS frame
      |  FROM dim, unnest(generate_series(0, nf - 1)) AS u(f)),
      |px AS (SELECT media_id, frame, nf, w, h, u.i % w AS x, u.i // w AS y,
      |    (fbase + frame * 53 + u.i * fstride + delta) % 256 AS p
      |  FROM fr, unnest(generate_series(0, w * h - 1)) AS u(i)),
      |blk AS (SELECT media_id, frame, nf, w, h,
      |    ((y * 8) // h) * 8 + ((x * 8) // w) AS j,
      |    CAST(SUM(p) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS np
      |  FROM px GROUP BY media_id, frame, nf, w, h, j),
      |tot AS (SELECT media_id, frame, CAST(SUM(s) AS BIGINT) AS total
      |  FROM blk GROUP BY media_id, frame),
      |bits AS (SELECT blk.media_id, blk.frame, blk.nf, blk.w, blk.h, blk.j,
      |    CASE WHEN blk.s * (blk.w * blk.h) >= tot.total * blk.np
      |      THEN '1' ELSE '0' END AS bit
      |  FROM blk JOIN tot USING (media_id, frame)),
      |vph AS (SELECT media_id, frame, CAST(MAX(nf) AS INTEGER) AS n_frames,
      |    CAST(MAX(w) AS INTEGER) AS width, CAST(MAX(h) AS INTEGER) AS height,
      |    string_agg(bit, '' ORDER BY j) AS phash
      |  FROM bits GROUP BY media_id, frame)""".stripMargin

  val queries: Seq[Q] = Seq(

    // ---- multimodal: perceptual hash over REAL decoded pixels ----------
    Q("mm_phash",
      s"""WITH $phashCtes
         |SELECT media_id, width, height, TRUE AS decoded, phash
         |FROM ph ORDER BY media_id""".stripMargin) { (s, d) =>
      // aHash over REAL ImageIO-decoded rasters: 8×8 block lattice by
      // exact integer floors, one bit per block via cross-multiplied
      // integer mean comparison — no float arithmetic anywhere, so the
      // oracle recomputes every bit from the planted pixel formulas. 8
      // bytes of signal per image; pixels never shuffle.
      graft.operators.Multimodal.imagePhash(s, plantedPhashPngs(s, d)).toDF()
        .select("media_id", "width", "height", "decoded", "phash")
        .orderBy("media_id")
    },

    // ---- dedup: banded hamming join over image phashes -----------------
    Q("dd_image_neardup",
      s"""WITH $phashCtes,
         |bands AS (SELECT media_id, phash, bb.b AS band,
         |    substr(phash, CAST(bb.b * 8 + 1 AS INTEGER), 8) AS bv
         |  FROM ph, range(0, 8) AS bb(b)),
         |cand AS (SELECT DISTINCT a.media_id AS id_a, x.media_id AS id_b,
         |    a.phash AS pa, x.phash AS pb
         |  FROM bands a JOIN bands x ON a.band = x.band AND a.bv = x.bv
         |    AND a.media_id < x.media_id),
         |h AS (SELECT id_a, id_b, CAST(len(list_filter(range(1, 65), i ->
         |    substr(pa, CAST(i AS INTEGER), 1) <> substr(pb, CAST(i AS INTEGER), 1)))
         |    AS INTEGER) AS hamming FROM cand)
         |SELECT id_a, id_b, hamming FROM h WHERE hamming <= 6
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      // Near-duplicate image pairs: banded equi-join on 8-bit hash bands
      // (never all-pairs), exact hamming verify on candidates. Recall is
      // EXACT by pigeonhole (6 differing bits cannot dirty all 8 bands),
      // so the output is precisely "all pairs at hamming ≤ 6" — planted
      // same-family brightness-shifted copies land here, cross-family
      // images do not.
      // phashNearDupPairs contracts non-null 64-bit hashes (it
      // assert_true's): corrupt or sub-grid media carry a null phash and
      // must be screened out, not kill the corpus pass
      val hashes = graft.operators.Multimodal.imagePhash(s, plantedPhashPngs(s, d)).toDF()
        .filter(col("phash").isNotNull)
      graft.operators.Dedup.phashNearDupPairs(hashes, "media_id", "phash",
          bands = 8, maxHamming = 6)
        .orderBy("id_a", "id_b")
    },

    // ---- multimodal: per-frame video fingerprints + video near-dup -----
    Q("mm_video_phash",
      s"""WITH $videoPhashCtes
         |SELECT media_id, frame, n_frames, width, height, TRUE AS decoded, phash
         |FROM vph ORDER BY media_id, frame""".stripMargin) { (s, d) =>
      // Per-frame aHash over REAL AVI-decoded frames (Multimodal
      // .aviFramePhash): the video twin of mm_phash, and the fingerprint
      // video near-dup needs — grid²/8 bytes of signal per frame, pixels
      // never shuffle. The oracle replays every planted frame's block
      // lattice and bit from the formulas, per (video, frame).
      graft.operators.Multimodal.aviFramePhash(s, plantedPhashAvis(s, d)).toDF()
        .select("media_id", "frame", "n_frames", "width", "height", "decoded", "phash")
        .orderBy("media_id", "frame")
    },
    Q("dd_video_neardup",
      s"""WITH $videoPhashCtes,
         |f0 AS (SELECT media_id, phash FROM vph WHERE frame = 0),
         |bands AS (SELECT media_id, phash, bb.b AS band,
         |    substr(phash, CAST(bb.b * 8 + 1 AS INTEGER), 8) AS bv
         |  FROM f0, range(0, 8) AS bb(b)),
         |cand AS (SELECT DISTINCT a.media_id AS id_a, x.media_id AS id_b,
         |    a.phash AS pa, x.phash AS pb
         |  FROM bands a JOIN bands x ON a.band = x.band AND a.bv = x.bv
         |    AND a.media_id < x.media_id),
         |h AS (SELECT id_a, id_b, CAST(len(list_filter(range(1, 65), i ->
         |    substr(pa, CAST(i AS INTEGER), 1) <> substr(pb, CAST(i AS INTEGER), 1)))
         |    AS INTEGER) AS hamming FROM cand)
         |SELECT id_a, id_b, hamming FROM h WHERE hamming <= 6
         |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
      // VIDEO near-duplicate pairs — the dedup signal doc-hash families
      // and even image phash cannot see: anchor-frame (frame 0) aHashes
      // feed the SAME banded pigeonhole-exact hamming join as
      // dd_image_neardup, so the output is precisely "all video pairs
      // whose anchor frames sit at hamming ≤ 6" — planted same-family
      // brightness-shifted re-encodes land here, cross-family videos do
      // not. At scale the anchor generalizes to every k-th frame with a
      // pair-count vote; the plumbing (per-frame hash rows → banded
      // join) is identical.
      // null-phash screen (corrupt payloads, sub-grid frames): the
      // banded join contracts non-null 64-bit hashes — flag-and-skip,
      // never kill the pass
      val hashes = graft.operators.Multimodal.aviFramePhash(s, plantedPhashAvis(s, d))
        .toDF()
        .filter(col("frame") === 0 && col("phash").isNotNull)
      graft.operators.Dedup.phashNearDupPairs(hashes, "media_id", "phash",
          bands = 8, maxHamming = 6)
        .orderBy("id_a", "id_b")
    },

    // ---- profiling: exact two-sample Kolmogorov–Smirnov ----------------
    Q("pf_ks_test",
      """WITH c AS (SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
        |    l_returnflag AS s FROM lineitem WHERE l_returnflag IN ('A', 'R')),
        |g AS (SELECT v,
        |    CAST(SUM(CASE WHEN s = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
        |    CAST(SUM(CASE WHEN s = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS cb
        |  FROM c GROUP BY v),
        |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb FROM g),
        |r AS (SELECT v,
        |    SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
        |    SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb
        |  FROM g)
        |SELECT t.na AS n_a, t.nb AS n_b,
        |  CAST(MAX(abs(cuma * t.nb - cumb * t.na)) AS BIGINT) AS d_num,
        |  CAST(MAX(abs(cuma * t.nb - cumb * t.na)) AS DOUBLE)
        |    / (CAST(t.na AS DOUBLE) * CAST(t.nb AS DOUBLE)) AS d
        |FROM r, t GROUP BY t.na, t.nb""".stripMargin) { (s, d) =>
      // Exact two-sample KS distance between the returned-vs-accepted
      // price distributions: D = sup|F_A − F_B| over every observed value,
      // maximized on the INTEGER cross-difference |cumA·nB − cumB·nA|
      // (one double division at the end). The corpus-wide cumulative sum
      // is two-level (bucket window + driver offsets over ≤256 aggregate
      // rows) — no unpartitioned window; the oracle's single-window form
      // is the semantic spec, not the plan.
      Stats.ksTest(lineitem(s, d), col("l_returnflag"), "A", "R",
        round(col("l_extendedprice") * 100))
    },

    // ---- ML: hashed-feature linear classifier inference ----------------
    Q("ml_hash_classifier",
      """WITH t AS (SELECT doc_id,
        |    list_filter(string_split_regex(lower(trim(text)), '\s+'), x -> x <> '') AS toks
        |  FROM documents),
        |f AS (SELECT doc_id, toks || CASE WHEN len(toks) >= 2
        |    THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i+1])
        |    ELSE CAST([] AS VARCHAR[]) END AS feats FROM t),
        |s AS (SELECT doc_id, CAST(len(feats) AS INTEGER) AS n_features,
        |    CAST(COALESCE(list_sum(list_transform(feats, x ->
        |      CAST('0x' || substr(md5('w:' || CAST(
        |        CAST('0x' || substr(md5(x), 1, 8) AS BIGINT) % 4096 AS VARCHAR)), 1, 8)
        |        AS BIGINT) % 2001 - 1000)), 0) AS BIGINT) AS score_milli
        |  FROM f)
        |SELECT doc_id, n_features, score_milli,
        |  CASE WHEN n_features > 0
        |    THEN CAST(score_milli AS DOUBLE) / CAST(n_features AS DOUBLE) END AS mean_milli,
        |  score_milli >= 0 AS keep
        |FROM s ORDER BY doc_id""".stripMargin) { (s, d) =>
      // The corpus quality-gate shape (fastText-style linear classifier
      // over hashed unigrams+bigrams — FineWeb-Edu / DCLM run exactly
      // this over every document): featurize, hash-bucket (no vocabulary
      // join — the hashing trick), one weight lookup per occurrence,
      // BIGINT milli-unit sum, threshold. ZERO shuffles — a corpus pass
      // is one codegen'd projection. Weights here are md5-derived
      // stand-ins with the same lookup shape a learned table would have
      // (production swaps in an element_at over a broadcast weight map).
      HashClassifier.score(documents(s, d), "doc_id", "text",
          dims = 4096, thresholdMilli = 0L)
        .orderBy("doc_id")
    },

    // ---- S15: in-engine XML record source ------------------------------
    Q("s15_xml",
      """SELECT c_custkey, c_name,
        |  '<&"' || c_name AS special,
        |  CASE WHEN c_custkey % 3 = 0 THEN NULL
        |       WHEN c_custkey % 3 = 1 THEN '' ELSE c_name END AS maybe,
        |  c_acctbal
        |FROM customer ORDER BY c_custkey""".stripMargin) { (s, d) =>
      // S15: XML record feed (JDK StAX, no dependency — the Xlsx posture
      // on bare XML). The sink is DISTRIBUTED: each task renders its
      // partition as one complete document through the native text sink,
      // so Spark's commit protocol gives task atomicity for free; the
      // scan distributes over documents via binaryFile. The oracle is the
      // original derivation — a hash match proves the round-trip is
      // lossless, including XML-escaped characters and the null-vs-empty
      // distinction (null omits the element, '' writes an empty one).
      import graft.sources.Xml
      import graft.sources.Xml.Field
      val fields = Seq(
        Field("c_custkey", "bigint"), Field("c_name", "string"),
        Field("special", "string"), Field("maybe", "string"),
        Field("c_acctbal", "double"))
      val base = customer(s, d).select(
        col("c_custkey"), col("c_name"),
        concat(lit("<&\""), col("c_name")).as("special"),
        when(col("c_custkey") % 3 === 0, lit(null).cast("string"))
          .when(col("c_custkey") % 3 === 1, lit(""))
          .otherwise(col("c_name")).as("maybe"),
        col("c_acctbal"))
      val path = s"${sys.props("java.io.tmpdir")}/graft_s15_${graft.core.Tables.pathKey(d)}"
      Xml.write(base, path, fields)
      Xml.read(s, path, fields).orderBy("c_custkey")
    },

    // ---- U9: incremental join-view maintenance -------------------------
    Q("u9_view_maintain",
      """WITH dim AS (SELECT c_custkey, c_name FROM customer),
        |fact AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |  WHERE o_orderkey % 4 <> 0),
        |delta AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0 AS o_totalprice
        |  FROM orders WHERE o_orderkey % 8 = 1
        |  UNION ALL
        |  SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 4 = 0),
        |fact2 AS (
        |  SELECT * FROM fact WHERE o_orderkey NOT IN (SELECT o_orderkey FROM delta)
        |  UNION ALL SELECT * FROM delta)
        |SELECT f.o_orderkey, f.o_custkey, f.o_totalprice, d.c_name
        |FROM fact2 f JOIN dim d ON f.o_custkey = d.c_custkey
        |ORDER BY f.o_orderkey""".stripMargin) { (s, d) =>
      // Incremental maintenance of a materialized fact⋈dim view under a
      // fact-side upsert batch (updates + inserts): survivors = view ANTI
      // delta keys, fresh = delta ⋈ dim — history never re-joins, the
      // dim shuffle touches |delta| rows only. The oracle is the FULL
      // RECOMPUTE over the upserted fact: a hash match proves incremental
      // == recompute, not merely that the algebra replays.
      import graft.operators.Maintenance
      val dim = customer(s, d).select(col("c_custkey").as("o_custkey"), col("c_name"))
      val fact = orders(s, d).filter(col("o_orderkey") % 4 =!= 0)
        .select("o_orderkey", "o_custkey", "o_totalprice")
      val delta = orders(s, d).filter(col("o_orderkey") % 8 === 1)
        .select(col("o_orderkey"), col("o_custkey"),
          (col("o_totalprice") + 1000.0).as("o_totalprice"))
        .unionByName(orders(s, d).filter(col("o_orderkey") % 4 === 0)
          .select("o_orderkey", "o_custkey", "o_totalprice"))
      val view = fact.join(dim, "o_custkey")
        .select("o_orderkey", "o_custkey", "o_totalprice", "c_name")
      Maintenance.maintainJoinView(view, delta, dim,
          factKeys = Seq("o_orderkey"), joinKeys = Seq("o_custkey"))
        .orderBy("o_orderkey")
    },

    // ---- events: top event-type paths ----------------------------------
    Q("ev_top_paths",
      """WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
        |p AS (SELECT user_id, event_type,
        |    lead(event_type, 1) OVER w AS n1, lead(event_type, 2) OVER w AS n2
        |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |c AS (SELECT event_type || '>' || n1 || '>' || n2 AS path,
        |    CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM p WHERE n1 IS NOT NULL AND n2 IS NOT NULL
        |  GROUP BY event_type || '>' || n1 || '>' || n2)
        |SELECT path, cnt FROM c
        |ORDER BY cnt DESC, path LIMIT 20""".stripMargin) { (s, d) =>
      // Top user-journey trigrams (view>click>purchase …): per-user
      // ordered event sequences via two leads over ONE keyed window (the
      // ev_sessions total order: event time, then id), then a map-side-
      // combined path count and a TakeOrdered top-20 — no global sort, no
      // unpartitioned window; the only full shuffle keys on user_id.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(expr("unix_micros(ts)"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("n1", lead(col("event_type"), 1).over(w))
        .withColumn("n2", lead(col("event_type"), 2).over(w))
        .filter(col("n1").isNotNull && col("n2").isNotNull)
        .select(concat(col("event_type"), lit(">"), col("n1"), lit(">"), col("n2"))
          .as("path"))
        .groupBy("path").agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("path")).limit(20)
    },
    Q("ev_markov",
      """WITH o AS (SELECT user_id, event_type, epoch_us(ts) AS us, event_id FROM events),
        |p AS (SELECT event_type AS src, lead(event_type, 1) OVER w AS dst
        |  FROM o WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |c AS (SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM p WHERE dst IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT src, CAST(SUM(cnt) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.src, c.dst, c.cnt, CAST(c.cnt AS DOUBLE) / t.tot AS prob
        |FROM c JOIN t USING (src) ORDER BY src, dst""".stripMargin) { (s, d) =>
      // First-order Markov transition matrix of the event stream: one
      // lead over the user-keyed window (the ev_sessions total order),
      // map-side-combined (src, dst) counts, row-normalized to exact
      // transition probabilities (integer count / integer row total — one
      // IEEE division, bit-exact). The normalizing window keys on src
      // over the |types|² count table — dictionary-sized, never the data.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(expr("unix_micros(ts)"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("dst", lead(col("event_type"), 1).over(w))
        .filter(col("dst").isNotNull)
        .select(col("event_type").as("src"), col("dst"))
        .groupBy("src", "dst").agg(count(lit(1)).as("cnt"))
        .withColumn("prob", col("cnt").cast("double")
          .divide(sum(col("cnt")).over(Window.partitionBy(col("src")))))
        .select("src", "dst", "cnt", "prob")
        .orderBy("src", "dst")
    },
    Q("ev_time_to_convert",
      """WITH v AS (SELECT user_id, MIN(epoch_us(ts)) AS first_view FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(epoch_us(e.ts)) AS first_purchase
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.first_view
        |  GROUP BY 1),
        |dt AS (SELECT p.user_id, p.first_purchase - v.first_view AS delta_us
        |  FROM p JOIN v USING (user_id)),
        |r AS (SELECT delta_us, CAST(COUNT(*) OVER () AS BIGINT) AS n,
        |    row_number() OVER (ORDER BY delta_us, user_id) AS rk FROM dt)
        |SELECT n AS n_converted,
        |  CAST(MIN(delta_us) AS BIGINT) AS min_us,
        |  CAST(MAX(delta_us) AS BIGINT) AS max_us,
        |  CAST(MAX(CASE WHEN n % 2 = 1 AND rk = (n + 1) // 2 THEN CAST(delta_us AS DOUBLE)
        |       WHEN n % 2 = 0 AND rk IN (n // 2, n // 2 + 1) THEN CAST(delta_us AS DOUBLE)
        |       END) + MIN(CASE WHEN n % 2 = 1 AND rk = (n + 1) // 2 THEN CAST(delta_us AS DOUBLE)
        |       WHEN n % 2 = 0 AND rk IN (n // 2, n // 2 + 1) THEN CAST(delta_us AS DOUBLE)
        |       END) AS DOUBLE) / 2.0 AS median_us
        |FROM r GROUP BY n""".stripMargin) { (s, d) =>
      // Time-to-convert: per user, first view → first subsequent
      // purchase, with exact min/max/median over converting users (the
      // a3 mean-of-middle-two convention — MAX+MIN of the middle picks
      // halved, so the odd case degenerates to the single middle value).
      // Two min aggregates + one ordered rank over the per-user deltas —
      // the funnel-latency readout product analytics runs daily.
      import org.apache.spark.sql.expressions.Window
      val ev = events(s, d)
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(expr("unix_micros(ts)")).as("first_view"))
      val p = ev.filter(col("event_type") === "purchase")
        .join(v, Seq("user_id"))
        .filter(expr("unix_micros(ts)") >= col("first_view"))
        .groupBy("user_id").agg(min(expr("unix_micros(ts)")).as("first_purchase"))
      val dt = p.join(v, Seq("user_id"))
        .select(col("user_id"), (col("first_purchase") - col("first_view")).as("delta_us"))
      val r = dt
        .withColumn("n", count(lit(1)).over(graft.ops.Windows.boundedAll))
        .withColumn("rk", row_number().over(
          graft.ops.Windows.boundedGlobal(col("delta_us"), col("user_id"))))
      val mid = when(col("n") % 2 === 1 && col("rk") === (col("n") + 1) / 2,
          col("delta_us").cast("double"))
        .when(col("n") % 2 === 0 &&
          (col("rk") === col("n") / 2 || col("rk") === col("n") / 2 + 1),
          col("delta_us").cast("double"))
      r.groupBy("n")
        .agg(
          min(col("delta_us")).cast("long").as("min_us"),
          max(col("delta_us")).cast("long").as("max_us"),
          ((max(mid) + min(mid)) / 2.0).as("median_us"))
        .select(col("n").as("n_converted"), col("min_us"), col("max_us"), col("median_us"))
    },
    Q("ev_alert_dedup",
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events
        |  WHERE event_type = 'error'),
        |f AS (SELECT user_id, event_id, us,
        |    lag(us, 1) OVER (PARTITION BY user_id ORDER BY us, event_id) AS prev_us
        |  FROM e),
        |a AS (SELECT user_id,
        |    CAST(COUNT(*) AS BIGINT) AS n_errors,
        |    CAST(SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
        |      THEN 1 ELSE 0 END) AS BIGINT) AS n_alerts
        |  FROM f GROUP BY user_id)
        |SELECT user_id, n_errors, n_alerts,
        |  CAST(n_errors - n_alerts AS BIGINT) AS n_suppressed
        |FROM a ORDER BY user_id""".stripMargin) { (s, d) =>
      // Alert dedup with a 30-minute cooldown: an error raises an alert
      // only when the SAME user's previous error is more than 1800 s
      // older (or absent) — the suppression rule that keeps a flapping
      // client from paging someone 400 times. One lag over the user-
      // keyed window (the ev_sessions total order), integer microsecond
      // arithmetic, one aggregate.
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(expr("unix_micros(ts)"), col("event_id"))
      events(s, d).filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"))
        .withColumn("prev_us", lag(col("us"), 1).over(
          Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))))
        .groupBy("user_id")
        .agg(
          count(lit(1)).as("n_errors"),
          sum(when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, 1L)
            .otherwise(0L)).as("n_alerts"))
        .withColumn("n_suppressed", (col("n_errors") - col("n_alerts")).cast("long"))
        .orderBy("user_id")
    },
    Q("w15_moving_median",
      """WITH o AS (SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity
        |  FROM lineitem WHERE l_orderkey % 100 = 0),
        |w AS (SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |    list_sort(list(l_quantity) OVER (PARTITION BY l_returnflag
        |      ORDER BY l_orderkey, l_linenumber, l_quantity
        |      ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS fr
        |  FROM o)
        |SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |  CASE WHEN len(fr) % 2 = 1 THEN fr[(len(fr) + 1) // 2]
        |       ELSE (fr[len(fr) // 2] + fr[len(fr) // 2 + 1]) / 2.0 END AS med5
        |FROM w ORDER BY l_returnflag, l_orderkey, l_linenumber, l_quantity""".stripMargin) { (s, d) =>
      // W15: EXACT moving median over a trailing 5-row frame — the robust
      // smoother a spiky metric needs where a moving average chases
      // outliers. No native windowed median exists; the frame collects
      // into a bounded array (5 values), sorts in-expression, and picks
      // the repo's a3 convention (mean of middle two on even counts —
      // one IEEE add + halving, bit-exact). Frame size bounds per-row
      // work; the only shuffle keys on the partition column.
      import org.apache.spark.sql.expressions.Window
      // (orderkey, linenumber) repeats in the fixture — the window order
      // must be TOTAL or tied rows' frames differ between engines; adding
      // the value itself makes tied frames identical as multisets
      val w = Window.partitionBy(col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .rowsBetween(-4, Window.currentRow)
      lineitem(s, d).filter(col("l_orderkey") % 100 === 0)
        .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"))
        .withColumn("fr", sort_array(collect_list(col("l_quantity")).over(w)))
        .withColumn("med5", expr(
          "CASE WHEN size(fr) % 2 = 1 " +
            "THEN element_at(fr, CAST((size(fr) + 1) div 2 AS INT)) " +
            "ELSE (element_at(fr, CAST(size(fr) div 2 AS INT)) " +
            "+ element_at(fr, CAST(size(fr) div 2 + 1 AS INT))) / 2.0 END"))
        .drop("fr")
        .orderBy("l_returnflag", "l_orderkey", "l_linenumber", "l_quantity")
    },
    Q("ev_user_growth",
      """WITH d AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |fs AS (SELECT user_id, MIN(day) AS first_day FROM d GROUP BY 1),
        |nu AS (SELECT first_day AS day, CAST(COUNT(*) AS BIGINT) AS new_users
        |  FROM fs GROUP BY 1)
        |SELECT day, new_users,
        |  CAST(SUM(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
        |FROM nu ORDER BY day""".stripMargin) { (s, d) =>
      // Cumulative user reach: each user's FIRST active day, per-day new
      // users, and the running total — the growth curve behind every
      // "users over time" chart, computed without a distinct-over-window
      // (which Spark cannot do): first-seen via min aggregate, then a
      // cumsum over the per-day counts. The unpartitioned window runs
      // over one bounded row per ACTIVE DAY (thousands at any horizon),
      // never over events or users.
      import org.apache.spark.sql.expressions.Window
      val days = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").cast("long").as("day"))
        .distinct()
      val firstSeen = days.groupBy("user_id").agg(min(col("day")).as("first_day"))
      firstSeen.groupBy(col("first_day").as("day"))
        .agg(count(lit(1)).as("new_users"))
        .withColumn("cum_users",
          sum(col("new_users")).over(graft.ops.Windows.boundedGlobal(col("day"))))
        .orderBy("day")
    },
    Q("ev_dau_wau",
      """WITH d AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM d GROUP BY 1),
        |w AS (SELECT DISTINCT u.d AS day, user_id
        |  FROM d, unnest(generate_series(d.day, d.day + 6)) AS u(d)),
        |wau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS wau FROM w GROUP BY 1)
        |SELECT dau.day, dau.dau, wau.wau,
        |  CAST(dau.dau AS DOUBLE) / wau.wau AS stickiness
        |FROM dau JOIN wau USING (day)
        |ORDER BY day""".stripMargin) { (s, d) =>
      // Rolling engagement: daily active users and trailing-7-day active
      // users per day, plus the DAU/WAU stickiness ratio. Distinct-count
      // over a sliding window has no native window form — the relational
      // shape is the scalable one: each (user, active day) pair fans out
      // to the 7 report days it contributes to (bounded ×7), distinct,
      // then two map-side-combined counts. Days are integer epoch days;
      // the ratio is one exact integer/integer division. Only days with
      // actual activity report (inner join on dau), so the series needs
      // no calendar table.
      val days = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").cast("long").as("day"))
        .distinct()
      val dau = days.groupBy("day").agg(count(lit(1)).as("dau"))
      val wau = days
        .select(col("user_id"), explode(sequence(col("day"), col("day") + 6)).as("day"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau"))
      dau.join(wau, Seq("day"))
        .withColumn("stickiness", col("dau").cast("double") / col("wau"))
        .select("day", "dau", "wau", "stickiness")
        .orderBy("day")
    },
    Q("ev_seasonal",
      // Additive seasonal decomposition of the per-type daily series:
      // value = trend + seasonal + residual, with trend the centered
      // 7-day moving average (full CALENDAR windows only: the 7-row
      // frame must also span exactly 6 days — a gap day would otherwise
      // silently widen the "7-day" average to 8+ calendar days) and
      // seasonal the per-weekday mean of the detrended series.
      // Engine-exact without a single order-dependent float reduction:
      // daily values and their 7-day window sums are exact decimals, and
      // the seasonal mean Σ(v − S7/7)/n is reorganized into exact sums
      // (Σv − ΣS7/7)/n — so each output is a fixed chain of IEEE ops
      // over exact integers, replayed token-for-token. Scale note: the
      // raw stream collapses in the FIRST aggregation (one map-side-
      // combined shuffle to (type, day)); everything after runs on
      // days×types rows — bounded by the calendar, not the corpus —
      // which is why the per-type window needs no two-level rank.
      """WITH dly AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    SUM(CAST(value AS DECIMAL(30,6))) AS v
        |  FROM events GROUP BY 1, 2),
        |w AS (SELECT event_type, day, v,
        |    SUM(v) OVER win AS s7, COUNT(*) OVER win AS cnt,
        |    MIN(day) OVER win AS d_lo, MAX(day) OVER win AS d_hi
        |  FROM dly
        |  WINDOW win AS (PARTITION BY event_type ORDER BY day
        |                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
        |k AS (SELECT event_type, day, day % 7 AS dow, v, s7 FROM w
        |  WHERE cnt = 7 AND d_hi - d_lo = 6),
        |se AS (SELECT event_type, dow,
        |    (CAST(SUM(v) AS DOUBLE) - CAST(SUM(s7) AS DOUBLE) / 7)
        |      / CAST(COUNT(*) AS BIGINT) AS seasonal
        |  FROM k GROUP BY 1, 2)
        |SELECT k.event_type, k.day, CAST(k.v AS DOUBLE) AS value,
        |  CAST(k.s7 AS DOUBLE) / 7 AS trend, se.seasonal,
        |  (CAST(k.v AS DOUBLE) - CAST(k.s7 AS DOUBLE) / 7) - se.seasonal AS residual
        |FROM k JOIN se ON k.event_type = se.event_type AND k.dow = se.dow
        |ORDER BY k.event_type, k.day""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val dly = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(sum(col("value").cast("decimal(30,6)")).as("v"))
      val win = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(-3, 3)
      val k = dly
        .withColumn("s7", sum(col("v")).over(win))
        .withColumn("cnt", count(lit(1)).over(win))
        .withColumn("d_lo", min(col("day")).over(win))
        .withColumn("d_hi", max(col("day")).over(win))
        .filter(col("cnt") === 7 && col("d_hi") - col("d_lo") === 6)
        .drop("d_lo", "d_hi")
        .withColumn("dow", col("day") % 7)
      val se = k.groupBy(col("event_type"), col("dow"))
        .agg(((sum(col("v")).cast("double")
            - sum(col("s7")).cast("double") / 7)
          / count(lit(1))).as("seasonal"))
      k.join(se, Seq("event_type", "dow"))
        .select(col("event_type"), col("day"), col("v").cast("double").as("value"),
          (col("s7").cast("double") / 7).as("trend"), col("seasonal"),
          ((col("v").cast("double") - col("s7").cast("double") / 7) - col("seasonal"))
            .as("residual"))
        .orderBy("event_type", "day")
    },
    Q("ev_changepoint",
      // CUSUM changepoint per event-type daily series: the day where the
      // cumulative deviation from the series mean peaks — the standard
      // level-shift locator of pipeline monitoring (a source going dark
      // or doubling shows up as the |CUSUM| maximum). Mean-free integer
      // form: S_d = Σ_{i≤d} n_i − d·(T/D) scaled by D gives
      // num_d = D·cum_d − rank_d·T — EXACT decimal arithmetic (each
      // factor cast to DECIMAL(19,0) before the product, the no-wrap
      // rule), no float until the read-out cast. Scale shape: the
      // stream collapses in the first map-side-combined (type, day)
      // aggregate; every window after runs on calendar-bounded rows
      // (the ev_seasonal argument).
      """WITH dly AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |t AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |    CAST(SUM(n) AS BIGINT) AS n_events FROM dly GROUP BY 1),
        |c AS (SELECT event_type, day, n,
        |    CAST(SUM(n) OVER (PARTITION BY event_type ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day) AS BIGINT) AS rk
        |  FROM dly),
        |s AS (SELECT c.event_type, c.day, t.n_days, t.n_events,
        |    CAST(t.n_days AS DECIMAL(19,0)) * CAST(c.cum AS DECIMAL(19,0))
        |      - CAST(c.rk AS DECIMAL(19,0)) * CAST(t.n_events AS DECIMAL(19,0)) AS num
        |  FROM c JOIN t USING (event_type)),
        |p AS (SELECT event_type, day AS change_day, num, n_days, n_events,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY abs(num) DESC, day) AS prk
        |  FROM s)
        |SELECT event_type, change_day, CAST(num AS DOUBLE) AS cusum,
        |  n_days, n_events
        |FROM p WHERE prk = 1 ORDER BY event_type""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val dec19 = org.apache.spark.sql.types.DecimalType(19, 0)
      val dly = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
      val t = dly.groupBy("event_type")
        .agg(count(lit(1)).as("n_days"), sum(col("n")).as("n_events"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      val c = dly
        .withColumn("cum", sum(col("n")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("rk", row_number().over(w).cast("long"))
      val sNum = c.join(t, Seq("event_type"))
        .withColumn("num",
          col("n_days").cast(dec19) * col("cum").cast(dec19)
            - col("rk").cast(dec19) * col("n_events").cast(dec19))
      sNum
        .withColumn("prk", row_number().over(
          Window.partitionBy(col("event_type")).orderBy(abs(col("num")).desc, col("day"))))
        .filter(col("prk") === 1)
        .select(col("event_type"), col("day").as("change_day"),
          col("num").cast("double").as("cusum"), col("n_days"), col("n_events"))
        .orderBy("event_type")
    },
    Q("ev_forecast_eval",
      // Seasonal-naive forecast baseline + exact MAE: predict each day's
      // event count by the SAME WEEKDAY LAST WEEK (n̂_d = n_{d−7}) and
      // score |n_d − n̂_d| over the days that have a 7-day predecessor —
      // the sanity floor every real forecasting pipeline must beat, and
      // the cheapest drift alarm (MAE jumping means the weekly pattern
      // broke). Exact arithmetic end-to-end: counts and the absolute
      // errors are BIGINT, the MAE is one final division. Scale shape:
      // the stream collapses in the first (type, day) aggregate; the
      // lag is a self-equi-join on (type, day−7) — calendar-bounded
      // rows, no window needed at all.
      """WITH dly AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |j AS (SELECT a.event_type, a.day, a.n, b.n AS pred
        |  FROM dly a JOIN dly b
        |    ON a.event_type = b.event_type AND b.day = a.day - 7)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_scored,
        |  CAST(SUM(abs(n - pred)) AS BIGINT) AS total_abs_err,
        |  CAST(SUM(abs(n - pred)) AS DOUBLE) / COUNT(*) AS mae
        |FROM j GROUP BY event_type ORDER BY event_type""".stripMargin) { (s, d) =>
      val dly = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("n"))
      val pred = dly.select(col("event_type"),
        (col("day") + 7).as("day"), col("n").as("pred"))
      dly.join(pred, Seq("event_type", "day"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_scored"),
          sum(abs(col("n") - col("pred"))).as("total_abs_err"))
        .select(col("event_type"), col("n_scored"), col("total_abs_err"),
          (col("total_abs_err").cast("double") / col("n_scored")).as("mae"))
        .orderBy("event_type")
    },
    Q("ev_holt",
      // Holt double-exponential smoothing (level + linear trend) per
      // event-type daily series — the forecasting upgrade over w14's
      // EWMA (which systematically lags a trend). The engine runs the
      // coupled recursion
      //   l_t = α·y + (1−α)(l+b);  b_t = β(l_t−l) + (1−β)b
      // as a per-row left fold over the bounded 8-row trailing frame
      // (Stats.holt, w14's aggregate-HOF route; α=0.5, β=0.25 exact
      // binary). The ORACLE states the recursion's exact CLOSED FORM
      // instead of replaying the fold: over a full 8-row frame, Holt is
      // a fixed integer-weighted sum with denominator 2^21 (the
      // symbolically-unrolled recursion — coefficients derived once,
      // exact by construction), so with integer daily counts BOTH sides
      // compute the same dyadic rational with zero rounding anywhere and
      // match bit-for-bit REGARDLESS of op order (a lambda-replay oracle
      // would instead depend on DuckDB's list_reduce accumulator
      // semantics). Rows without a full frame are warm-up and excluded
      // on both sides. Scale: one keyed shuffle; O(8) fold per row.
      """WITH dly AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day,
        |    CAST(COUNT(*) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |lg AS (SELECT event_type, day,
        |    lag(y, 7) OVER w AS y1, lag(y, 6) OVER w AS y2,
        |    lag(y, 5) OVER w AS y3, lag(y, 4) OVER w AS y4,
        |    lag(y, 3) OVER w AS y5, lag(y, 2) OVER w AS y6,
        |    lag(y, 1) OVER w AS y7, y AS y8
        |  FROM dly WINDOW w AS (PARTITION BY event_type ORDER BY day)),
        |h AS (SELECT event_type, day,
        |    CAST(-224572*y1 - 28772*y2 + 5792*y3 + 73472*y4 + 190464*y5
        |         + 376832*y6 + 655360*y7 + 1048576*y8 AS DOUBLE)
        |      / 2097152 AS level,
        |    CAST(-139657*y1 - 56143*y2 - 63336*y3 - 61888*y4 - 43520*y5
        |         + 4096*y6 + 98304*y7 + 262144*y8 AS DOUBLE)
        |      / 2097152 AS trend
        |  FROM lg WHERE y1 IS NOT NULL)
        |SELECT event_type, day, level, trend, level + trend AS forecast
        |FROM h ORDER BY event_type, day""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val dly = events(s, d)
        .groupBy(col("event_type"),
          expr("unix_micros(ts) div 86400000000").as("day"))
        .agg(count(lit(1)).as("y"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      graft.ops.Stats.holt(dly, keys = Seq("event_type"), order = Seq("day"),
          value = "y", alpha = 0.5, beta = 0.25, lookback = 8)
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") >= 8)
        .select(col("event_type"), col("day"), col("level"), col("trend"),
          (col("level") + col("trend")).as("forecast"))
        .orderBy("event_type", "day")
    },
    Q("ev_streaks",
      """WITH d AS (SELECT DISTINCT user_id,
        |    epoch_us(ts) // 86400000000 AS day FROM events),
        |r AS (SELECT user_id, day,
        |    day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
        |  FROM d),
        |runs AS (SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len,
        |    MIN(day) AS start_day
        |  FROM r GROUP BY 1, 2),
        |best AS (SELECT user_id, len, start_day,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY len DESC, start_day) AS rk
        |  FROM runs)
        |SELECT user_id, len AS longest_streak, start_day AS streak_start_day
        |FROM best WHERE rk = 1 ORDER BY user_id""".stripMargin) { (s, d) =>
      // Longest consecutive-day activity streak per user — the classic
      // gaps-and-islands shape: distinct active days, day − row_number is
      // constant within a consecutive run, one count per (user, run),
      // per-user argmax with ties to the earliest run. Days are integer
      // epoch-day numbers (no timezone/date parsing on either engine).
      // Scale: every step keys on user_id — one shuffle, reused across
      // both windows and the run aggregate.
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
      val days = events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 86400000000").cast("long").as("day"))
        .distinct()
      val runs = days
        .withColumn("grp", col("day") - row_number().over(byUser.orderBy(col("day"))))
        .groupBy("user_id", "grp")
        .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
      runs
        .withColumn("rk", row_number().over(
          byUser.orderBy(col("len").desc, col("start_day"))))
        .filter(col("rk") === 1)
        .select(col("user_id"), col("len").as("longest_streak"),
          col("start_day").as("streak_start_day"))
        .orderBy("user_id")
    },
    Q("ev_ab_test",
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |pc AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS np FROM events
        |  WHERE event_type = 'purchase' GROUP BY 1),
        |cu AS (SELECT u.user_id, u.user_id % 2 AS cohort,
        |    (COALESCE(pc.np, 0) >= 15) AS conv
        |  FROM u LEFT JOIN pc USING (user_id)),
        |g AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n,
        |    CAST(SUM(CASE WHEN conv THEN 1 ELSE 0 END) AS BIGINT) AS x
        |  FROM cu GROUP BY 1),
        |ab AS (SELECT
        |    (SELECT n FROM g WHERE cohort = 0) AS n_a,
        |    (SELECT x FROM g WHERE cohort = 0) AS x_a,
        |    (SELECT n FROM g WHERE cohort = 1) AS n_b,
        |    (SELECT x FROM g WHERE cohort = 1) AS x_b),
        |m AS (SELECT n_a, x_a, n_b, x_b,
        |    CAST(x_a AS DOUBLE) / n_a AS rate_a,
        |    CAST(x_b AS DOUBLE) / n_b AS rate_b,
        |    CAST(x_a + x_b AS DOUBLE) / (n_a + n_b) AS pp
        |  FROM ab)
        |SELECT n_a, x_a, n_b, x_b, rate_a, rate_b,
        |  CASE WHEN pp > 0 AND pp < 1
        |    THEN (rate_a - rate_b)
        |      / sqrt(pp * (1.0 - pp) * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b))
        |    END AS z
        |FROM m""".stripMargin) { (s, d) =>
      // Two-proportion z-test between user cohorts (the A/B readout):
      // cohort = user_id parity, conversion = >= 15 purchase events. All
      // inputs are integer counts; rates, the pooled proportion and the
      // z statistic are one fixed chain of correctly rounded IEEE ops
      // mirrored token-for-token in the oracle — bit-exact, and null
      // (not Inf) when the pooled variance degenerates. Both cohorts are
      // pivoted out of ONE global aggregate row (conditional sums), so an
      // absent cohort yields NULL counts in a single row — exactly the
      // oracle's scalar-subquery semantics — instead of the 0-row result
      // a filtered-aggregate crossJoin would produce.
      val ev = events(s, d)
      val users = ev.select(col("user_id")).distinct()
        .withColumn("cohort", pmod(col("user_id"), lit(2)))
      val pc = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(count(lit(1)).as("np"))
      val cu = users.join(pc, Seq("user_id"), "left")
        .withColumn("conv", coalesce(col("np"), lit(0L)) >= 15)
      val m = cu.agg(
          sum(when(col("cohort") === 0, 1L)).as("n_a"),
          sum(when(col("cohort") === 0, when(col("conv"), 1L).otherwise(0L))).as("x_a"),
          sum(when(col("cohort") === 1, 1L)).as("n_b"),
          sum(when(col("cohort") === 1, when(col("conv"), 1L).otherwise(0L))).as("x_b"))
        .withColumn("rate_a", col("x_a").cast("double") / col("n_a"))
        .withColumn("rate_b", col("x_b").cast("double") / col("n_b"))
        .withColumn("pp", (col("x_a") + col("x_b")).cast("double") / (col("n_a") + col("n_b")))
      m.select(col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        col("rate_a"), col("rate_b"),
        when(col("pp") > 0 && col("pp") < 1,
          (col("rate_a") - col("rate_b"))
            / sqrt(col("pp") * (lit(1.0) - col("pp"))
              * (lit(1.0) / col("n_a") + lit(1.0) / col("n_b"))))
          .as("z"))
    },

    // ---- events: RFM segmentation (two-level global ntile) -------------
    Q("ev_survival",
      // Kaplan-Meier survival over the event stream: subjects are users,
      // origin is each user's first active day, "death" is the first
      // high-severity error (value > 200), right-censoring at the user's
      // last active day for users that never die inside the window.
      // Time is discretized to weeks (capped at 4 — the fixture spans 30
      // days), and the KM estimator S(w) = Π_{j≤w} (n_j − d_j)/n_j is
      // computed as an EXACT integer fraction: the cumulative products
      // run in DECIMAL(38,0) (HUGEINT in the oracle's recursive CTE —
      // n ≤ |users|, ≤ 5 factors, overflow-free by the week cap), and
      // the only float op is the final correctly-rounded num/den
      // division, so the curve is engine-exact with zero FP reductions.
      // Scale shape: the stream collapses in the first per-user
      // aggregate (map-side combined); everything after runs on |users|
      // rows, and the week table is calendar-bounded (≤ 5 rows), so the
      // ordered cumulative-product window is driver-trivial by
      // construction, never corpus-sized.
      """WITH RECURSIVE d AS (SELECT user_id,
        |    CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
        |    event_type, value FROM events),
        |u AS (SELECT user_id, MIN(day) AS t0, MAX(day) AS t1 FROM d GROUP BY user_id),
        |death AS (SELECT user_id, MIN(day) AS td FROM d
        |  WHERE event_type = 'error' AND value > 200 GROUP BY user_id),
        |uu AS (SELECT u.user_id,
        |    CASE WHEN death.td IS NOT NULL THEN LEAST((death.td - u.t0) // 7, 4)
        |         ELSE LEAST((u.t1 - u.t0) // 7, 4) END AS week,
        |    (death.td IS NOT NULL) AS died
        |  FROM u LEFT JOIN death USING (user_id)),
        |wk AS (SELECT UNNEST(range(0, 5)) AS wkn),
        |b AS (SELECT wk.wkn AS week,
        |    CAST(SUM(CASE WHEN uu.week >= wk.wkn THEN 1 ELSE 0 END) AS BIGINT) AS n_risk,
        |    CAST(SUM(CASE WHEN uu.week = wk.wkn AND uu.died THEN 1 ELSE 0 END) AS BIGINT) AS n_died,
        |    CAST(SUM(CASE WHEN uu.week = wk.wkn AND NOT uu.died THEN 1 ELSE 0 END) AS BIGINT) AS n_censored
        |  FROM wk CROSS JOIN uu GROUP BY wk.wkn),
        |bb AS (SELECT * FROM b WHERE n_risk > 0),
        |km AS (
        |  SELECT week, n_risk, n_died, n_censored,
        |    CAST(n_risk - n_died AS HUGEINT) AS snum,
        |    CAST(n_risk AS HUGEINT) AS sden
        |  FROM bb WHERE week = 0
        |  UNION ALL
        |  SELECT bb.week, bb.n_risk, bb.n_died, bb.n_censored,
        |    km.snum * (bb.n_risk - bb.n_died), km.sden * bb.n_risk
        |  FROM bb JOIN km ON bb.week = km.week + 1)
        |SELECT week, n_risk, n_died, n_censored,
        |  CAST(snum AS DOUBLE) AS surv_num, CAST(sden AS DOUBLE) AS surv_den,
        |  CAST(snum AS DOUBLE) / CAST(sden AS DOUBLE) AS survival
        |FROM km ORDER BY week""".stripMargin) { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val dd = events(s, d).select(col("user_id"),
        expr("unix_micros(ts) DIV 86400000000").as("day"),
        col("event_type"), col("value"))
      val u = dd.groupBy("user_id").agg(min("day").as("t0"), max("day").as("t1"))
      val death = dd.filter(col("event_type") === "error" && col("value") > 200)
        .groupBy("user_id").agg(min("day").as("td"))
      val uu = u.join(death, Seq("user_id"), "left")
        .select(
          when(col("td").isNotNull, least(expr("(td - t0) DIV 7"), lit(4L)))
            .otherwise(least(expr("(t1 - t0) DIV 7"), lit(4L))).as("week"),
          col("td").isNotNull.as("died"))
      val wk = s.range(0, 5).select(col("id").as("wkn"))
      val b = uu.crossJoin(broadcast(wk))
        .groupBy(col("wkn").as("week"))
        .agg(
          sum(when(col("week") >= col("wkn"), 1L).otherwise(0L)).as("n_risk"),
          sum(when(col("week") === col("wkn") && col("died"), 1L).otherwise(0L))
            .as("n_died"),
          sum(when(col("week") === col("wkn") && !col("died"), 1L).otherwise(0L))
            .as("n_censored"))
        .filter(col("n_risk") > 0)
      // ≤ 5 calendar-bounded rows: the unpartitioned ordered window and
      // the in-order decimal fold are exact and trivially single-task
      val wnd = graft.ops.Windows.boundedGlobal(col("week"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val one = lit(1).cast("decimal(38,0)")
      b.withColumn("snum",
          aggregate(
            collect_list((col("n_risk") - col("n_died")).cast("decimal(38,0)")).over(wnd),
            one, (acc, x) => acc * x))
        .withColumn("sden",
          aggregate(collect_list(col("n_risk").cast("decimal(38,0)")).over(wnd),
            one, (acc, x) => acc * x))
        .select(col("week"), col("n_risk"), col("n_died"), col("n_censored"),
          col("snum").cast("double").as("surv_num"),
          col("sden").cast("double").as("surv_den"),
          (col("snum").cast("double") / col("sden").cast("double")).as("survival"))
        .orderBy("week")
    },
    Q("ev_rfm",
      """WITH u AS (SELECT user_id,
        |    CAST(MAX(epoch_us(ts) // 86400000000) AS BIGINT) AS last_day,
        |    CAST(COUNT(*) AS BIGINT) AS freq,
        |    SUM(CAST(value AS DECIMAL(30,6))) AS mdec
        |  FROM events GROUP BY 1),
        |b AS (SELECT user_id, last_day, freq,
        |    CAST(mdec AS DOUBLE) AS monetary,
        |    CAST(round(mdec * 1000) AS BIGINT) AS mm FROM u),
        |t AS (SELECT user_id, last_day, freq, monetary,
        |    CAST(ntile(5) OVER (ORDER BY last_day, user_id) AS INTEGER) AS r,
        |    CAST(ntile(5) OVER (ORDER BY freq, user_id) AS INTEGER) AS f,
        |    CAST(ntile(5) OVER (ORDER BY mm, user_id) AS INTEGER) AS m
        |  FROM b)
        |SELECT user_id, last_day, freq, monetary, r, f, m,
        |  CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR) AS segment
        |FROM t ORDER BY user_id""".stripMargin) { (s, d) =>
      // RFM user segmentation (recency/frequency/monetary quintiles —
      // the classic lifecycle segmentation): per-user aggregates, then
      // three EXACT global quintile assignments via Stats.globalNtile —
      // the two-level range-bucket + driver-offset shape, NOT the
      // single-reducer `ntile() OVER (ORDER BY …)` the oracle's spec
      // form plans to (users are unbounded at scale; StatsSpec pins
      // bit-equality with the window form and the absence of any
      // unpartitioned WindowExec). Monetary sums are decimal-exact and
      // ranked as exact milli-unit integers; every order is total
      // (metric, user_id), so tile boundaries are deterministic.
      val u = events(s, d).groupBy("user_id").agg(
          max(expr("unix_micros(ts) div 86400000000")).cast("long").as("last_day"),
          count(lit(1)).as("freq"),
          sum(col("value").cast("decimal(30,6)")).as("__mdec"))
        // explicit round BEFORE the bigint cast, mirrored in the oracle:
        // Spark's decimal->long cast truncates toward zero while DuckDB's
        // CAST rounds, so the rounding rule must be pinned in the query
        // text (both engines' round() is half-away-from-zero on decimals),
        // not left to engine-default cast behavior
        .withColumn("monetary_milli", round(col("__mdec") * 1000, 0).cast("long"))
        .withColumn("monetary", col("__mdec").cast("double"))
        .drop("__mdec")
        // each globalNtile runs two driver probe actions (min/max, bucket
        // offsets) plus the ranked plan itself — without this lazy
        // localCheckpoint the events aggregate above would re-scan the
        // corpus ~7 times across the three nested quintile passes; with
        // it, everything after the first action reads the |users|-row
        // materialization (bit-identical results, lineage truncated)
        .localCheckpoint(false)
      val scored = Stats.globalNtile(
        Stats.globalNtile(
          Stats.globalNtile(u, col("last_day"), col("user_id"), 5, "r"),
          col("freq"), col("user_id"), 5, "f"),
        col("monetary_milli"), col("user_id"), 5, "m")
      scored.select(col("user_id"), col("last_day"), col("freq"), col("monetary"),
          col("r"), col("f"), col("m"),
          concat(col("r").cast("string"), col("f").cast("string"),
            col("m").cast("string")).as("segment"))
        .orderBy("user_id")
    },

    // ---- ML: expected calibration error over the langid margin ---------
    Q("ml_ece",
      s"""WITH t AS (SELECT doc_id, lang,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS toks,
         |    regexp_matches(text, '[\\x{4e00}-\\x{9fff}]') AS cjk
         |  FROM documents),
         |sc AS (SELECT doc_id, lang, cjk,
         |    len(list_filter(toks, x -> list_contains(${TextData.sqlList(graft.functions.TextFns.stopEn)}, x))) AS s_en,
         |    len(list_filter(toks, x -> list_contains(${TextData.sqlList(graft.functions.TextFns.stopDe)}, x))) AS s_de,
         |    len(list_filter(toks, x -> list_contains(${TextData.sqlList(graft.functions.TextFns.stopEs)}, x))) AS s_es,
         |    len(list_filter(toks, x -> list_contains(${TextData.sqlList(graft.functions.TextFns.stopFr)}, x))) AS s_fr
         |  FROM t),
         |p AS (SELECT lang,
         |    CASE WHEN cjk THEN 'zh'
         |         WHEN s_en >= GREATEST(s_de, s_es, s_fr) THEN 'en'
         |         WHEN s_de >= GREATEST(s_es, s_fr) THEN 'de'
         |         WHEN s_es >= s_fr THEN 'es'
         |         ELSE 'fr' END AS pred,
         |    CASE WHEN cjk THEN 1000
         |         ELSE LEAST(1000, GREATEST(s_en, s_de, s_es, s_fr) * 50) END AS conf_milli
         |  FROM sc),
         |bn AS (SELECT LEAST(conf_milli // 100, 9) AS bin,
         |    CAST(COUNT(*) AS BIGINT) AS n,
         |    CAST(SUM(CASE WHEN pred = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
         |    CAST(SUM(conf_milli) AS BIGINT) AS conf_sum
         |  FROM p GROUP BY 1),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM bn)
         |SELECT CAST(bin AS BIGINT) AS bin, n, n_correct,
         |  CAST(conf_sum AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0 AS mean_conf,
         |  CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE) AS accuracy,
         |  (CAST(n AS DOUBLE) / CAST(n_total AS DOUBLE))
         |    * abs(CAST(n_correct AS DOUBLE) / CAST(n AS DOUBLE)
         |      - CAST(conf_sum AS DOUBLE) / CAST(n AS DOUBLE) / 1000.0) AS weighted_gap
         |FROM bn, tot ORDER BY bin""".stripMargin) { (s, d) =>
      // Expected calibration error of the langid heuristic: confidence =
      // clamped linear stopword margin (milli-units — log/exp-free by the
      // catalog's transcendental ban), reliability bins on the integer
      // confidence, per-bin mean confidence vs accuracy, and the
      // bin-weighted |acc − conf| gap whose sum IS the ECE. Every input
      // is an integer count; each output is a fixed chain of IEEE
      // divisions mirrored token-for-token in the oracle. The eval-side
      // companion of ml_confusion: confusion says WHERE the classifier
      // errs, calibration says whether its confidence can gate anything.
      import graft.functions.TextFns
      val toks = TextFns.tokens(col("text"))
      val p = documents(s, d).select(col("doc_id"), col("lang"), col("text"))
        .withColumn("pred", TextFns.langId(col("text")))
        .withColumn("smax", greatest(
          TextFns.dictHits(toks, TextFns.stopEn),
          TextFns.dictHits(toks, TextFns.stopDe),
          TextFns.dictHits(toks, TextFns.stopEs),
          TextFns.dictHits(toks, TextFns.stopFr)))
        .withColumn("conf_milli",
          when(TextFns.hasCjk(col("text")), 1000L)
            .otherwise(least(lit(1000L), col("smax").cast("long") * 50)))
      val bins = p
        .withColumn("bin", least(lit(9L), expr("conf_milli DIV 100")))
        .groupBy("bin").agg(
          count(lit(1)).as("n"),
          sum(when(col("pred") === col("lang"), 1L).otherwise(0L)).as("n_correct"),
          sum(col("conf_milli")).as("conf_sum"))
      val tot = bins.agg(sum(col("n")).as("n_total"))
      bins.crossJoin(broadcast(tot))
        .select(col("bin"), col("n"), col("n_correct"),
          (col("conf_sum").cast("double") / col("n").cast("double") / 1000.0)
            .as("mean_conf"),
          (col("n_correct").cast("double") / col("n").cast("double")).as("accuracy"),
          ((col("n").cast("double") / col("n_total").cast("double"))
            * abs(col("n_correct").cast("double") / col("n").cast("double")
              - col("conf_sum").cast("double") / col("n").cast("double") / 1000.0))
            .as("weighted_gap"))
        .orderBy("bin")
    },

    // ---- ML: dominant direction of the embedding corpus ----------------
    Q("ml_dominant_dir",
      // engine-exact power iteration, fully replayed: micro-unit
      // quantized components, HUGEINT second-moment sums (≡ the Spark
      // side's DECIMAL(38,0) / driver BigInt — all exact, so equal),
      // fixed-point renormalization by the exact max |w| with the sign
      // split keeping truncating division on non-negative operands, and
      // the final three-cast two-division ratio in the same order.
      {
        def matvec(wName: String, vFrom: String): String =
          s"$wName AS (SELECT m.i, SUM(m.mij * v.vq) AS w FROM m JOIN $vFrom v ON m.j = v.i GROUP BY m.i)"
        def renorm(vName: String, wFrom: String, xName: String): String =
          s"""$xName AS (SELECT MAX(ABS(w)) AS mx FROM $wFrom),
             |$vName AS (SELECT i, CASE WHEN w < 0 THEN -(((-w) * 1000000) // mx)
             |  ELSE (w * 1000000) // mx END AS vq FROM $wFrom, $xName)""".stripMargin
        s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           |t AS (SELECT vec_id, u.i AS i,
           |    CAST(FLOOR(v[CAST(u.i + 1 AS INTEGER)] * 1000000 + 0.5) AS HUGEINT) AS xq
           |  FROM e, unnest(range(16)) AS u(i)),
           |m AS (SELECT a.i AS i, b.i AS j, SUM(a.xq * b.xq) AS mij
           |  FROM t a JOIN t b USING (vec_id) GROUP BY 1, 2),
           |w1 AS (SELECT i, SUM(mij) * 1000000 AS w FROM m GROUP BY i),
           |${renorm("v1", "w1", "x1")},
           |${matvec("w2", "v1")},
           |${renorm("v2", "w2", "x2")},
           |${matvec("w3", "v2")},
           |${renorm("v3", "w3", "x3")},
           |${matvec("w4", "v3")},
           |r AS (SELECT
           |    (SELECT SUM(v3.vq * w4.w) FROM v3 JOIN w4 USING (i)) AS num,
           |    (SELECT SUM(vq * vq) FROM v3) AS den,
           |    (SELECT SUM(mij) FROM m WHERE i = j) AS trace)
           |SELECT CAST(v3.i AS INTEGER) AS pos,
           |  CAST(v3.vq AS DOUBLE) / 1000000 AS loading,
           |  (CAST(num AS DOUBLE) / CAST(den AS DOUBLE)) / CAST(trace AS DOUBLE)
           |    AS explained_ratio
           |FROM v3, r ORDER BY pos""".stripMargin
      }) { (s, d) =>
      // Dominant direction of the embedding corpus (ops/Linalg): the top
      // eigenvector of the uncentered second-moment matrix over the
      // first 16 (MRL) dimensions — the anisotropy diagnostic run before
      // whitening/normalizing embeddings ("is one axis eating the
      // energy?"). ONE aggregation pass of d(d+1)/2 exact decimal sums
      // (map-side combined; sufficient statistics shuffle, never rows),
      // then a bounded driver-side BigInt fixed-point power iteration —
      // an index action, the codebook bound. Every reduction is exact
      // integer arithmetic, so the oracle replays it bit-for-bit.
      graft.ops.Linalg.dominantDirection(
        embeddings(s, d).select(slice(col("embedding"), 1, 16).as("emb16")),
        "emb16", d = 16, iters = 3)
    },

    // ---- profiling: Benford first-digit QA ------------------------------
    Q("pf_benford",
      """WITH v AS (SELECT CAST(round(SUM(CAST(value AS DECIMAL(30,6)) * 1000)) AS BIGINT) AS m
        |  FROM events GROUP BY user_id),
        |dg AS (SELECT CAST(substr(CAST(m AS VARCHAR), 1, 1) AS BIGINT) AS digit
        |  FROM v WHERE m > 0),
        |c AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM dg GROUP BY 1),
        |t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM c),
        |exp_ AS (SELECT * FROM (VALUES
        |  (CAST(1 AS BIGINT), 0.3010299956639812), (2, 0.17609125905568124),
        |  (3, 0.12493873660829992), (4, 0.09691001300805642),
        |  (5, 0.07918124604762482), (6, 0.06694678963061322),
        |  (7, 0.05799194697768673), (8, 0.05115252244738129),
        |  (9, 0.04575749056067514)) e(digit, expected))
        |SELECT exp_.digit, COALESCE(c.n, 0) AS n,
        |  CAST(COALESCE(c.n, 0) AS DOUBLE) / CAST(t.nt AS DOUBLE) AS share,
        |  exp_.expected,
        |  abs(CAST(COALESCE(c.n, 0) AS DOUBLE) / CAST(t.nt AS DOUBLE) - exp_.expected)
        |    AS abs_dev
        |FROM exp_ LEFT JOIN c USING (digit), t
        |ORDER BY digit""".stripMargin) { (s, d) =>
      // Benford first-digit QA over per-user spend totals — the classic
      // fabricated/corrupted-numeric-data screen. Log-free by
      // construction: totals become EXACT milli-unit integers (decimal
      // sum ×1000 — scaling by a power of ten never changes the leading
      // significant digit), the first digit is the first character of
      // the canonical integer rendering, and the nine Benford expected
      // shares are shared decimal LITERALS (both engines parse the same
      // text to the same double — no log10 at query time). Digits with
      // zero mass still emit a row (the expected-side left join), so the
      // profile is always 9 rows.
      // explicit round before the bigint cast (same pin as ev_rfm's
      // monetary_milli): Spark's decimal->long cast truncates, DuckDB's
      // rounds — round() on both sides makes the rule engine-independent
      val m = events(s, d).groupBy("user_id")
        .agg(round(sum(col("value").cast("decimal(30,6)")) * 1000, 0).cast("long").as("m"))
        .filter(col("m") > 0)
        .select(substring(col("m").cast("string"), 1, 1).cast("long").as("digit"))
      val c = m.groupBy("digit").agg(count(lit(1)).as("n"))
      val t = c.agg(sum(col("n")).as("nt"))
      val expected = {
        import s.implicits._
        Seq(
          1L -> 0.3010299956639812, 2L -> 0.17609125905568124,
          3L -> 0.12493873660829992, 4L -> 0.09691001300805642,
          5L -> 0.07918124604762482, 6L -> 0.06694678963061322,
          7L -> 0.05799194697768673, 8L -> 0.05115252244738129,
          9L -> 0.04575749056067514).toDF("digit", "expected")
      }
      expected.join(c, Seq("digit"), "left").crossJoin(broadcast(t))
        .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
          (coalesce(col("n"), lit(0L)).cast("double") / col("nt").cast("double"))
            .as("share"),
          col("expected"),
          abs(coalesce(col("n"), lit(0L)).cast("double") / col("nt").cast("double")
            - col("expected")).as("abs_dev"))
        .orderBy("digit")
    },

    // ---- graph: bounded two-hop reach ----------------------------------
    Q("g4_two_hop",
      """WITH e AS (SELECT DISTINCT o_custkey % 50 AS src, o_orderkey % 50 AS dst
        |  FROM orders WHERE o_custkey % 50 <> o_orderkey % 50),
        |two AS (SELECT DISTINCT a.src, b.dst AS dst2
        |  FROM e a JOIN e b ON a.dst = b.src
        |  WHERE b.dst <> a.src),
        |reach AS (
        |  SELECT src, dst AS r FROM e
        |  UNION SELECT src, dst2 FROM two)
        |SELECT src AS v, CAST(COUNT(*) AS BIGINT) AS n_reach2
        |FROM reach GROUP BY src ORDER BY v""".stripMargin) { (s, d) =>
      // Two-hop reach per node (friends-of-friends): distinct nodes
      // reachable in ≤ 2 directed hops, excluding self — the
      // neighborhood-size signal behind link-spam scoring and crawl
      // frontier sizing. ONE self-join on the hop-midpoint key with
      // distinct collapses before counting; at scale the join is
      // bounded by Σ deg² on the EDGE table (never materializing paths),
      // the same df²-bounded shape as the shared-shingle ground truth.
      val edges = orders(s, d)
        .select((col("o_custkey") % 50).as("src"), (col("o_orderkey") % 50).as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
      val two = edges.select(col("src"), col("dst").as("mid"))
        .join(edges.select(col("src").as("mid"), col("dst").as("dst2")), Seq("mid"))
        .filter(col("dst2") =!= col("src"))
        .select(col("src"), col("dst2").as("r"))
      edges.select(col("src"), col("dst").as("r"))
        .unionByName(two).distinct()
        .groupBy(col("src").as("v")).agg(count(lit(1)).as("n_reach2"))
        .orderBy("v")
    },

    // ---- text: OCR/mojibake garbage detection ----------------------------
    Q("tx_garbage",
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT)
        |    AS n_alpha,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT)
        |    AS n_digit,
        |  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]{4,}')) AS BIGINT)
        |    AS n_punct_runs,
        |  CASE WHEN length(text) > 0
        |    THEN CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) END AS alpha_ratio,
        |  (length(text) = 0
        |    OR CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE) < 0.5
        |    OR len(regexp_extract_all(text, '[^A-Za-z0-9\s]{4,}')) > 0) AS garbage
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, d) =>
      // OCR/mojibake garbage screen (the C4-style character-structure
      // filter tx_quality's token statistics cannot see): alphabetic and
      // digit character counts via replace-length deltas (identical
      // regex-class semantics on both engines — no lookaround), runs of
      // ≥4 consecutive symbol characters (the classic OCR-noise /
      // encoding-breakage signature), and the alpha-ratio gate. Pure
      // codegen'd regexp expressions, one narrow pass, no shuffle.
      val t = col("text")
      val nAlpha = (length(t) - length(regexp_replace(t, "[A-Za-z]", ""))).cast("long")
      val nDigit = (length(t) - length(regexp_replace(t, "[0-9]", ""))).cast("long")
      val nRuns = size(regexp_extract_all(t, lit("[^A-Za-z0-9\\s]{4,}"), lit(0))).cast("long")
      val ratio = when(length(t) > 0, nAlpha.cast("double") / length(t).cast("double"))
      documents(s, d).select(col("doc_id"),
          length(t).cast("long").as("n_chars"),
          nAlpha.as("n_alpha"), nDigit.as("n_digit"), nRuns.as("n_punct_runs"),
          ratio.as("alpha_ratio"),
          (length(t) === 0 || ratio < 0.5 || nRuns > 0).as("garbage"))
        .orderBy("doc_id")
    },

    // ---- maintenance: partition retention sweep --------------------------
    Q("u11_retention",
      """WITH d AS (SELECT epoch_us(ts) // 86400000000 AS day, user_id FROM events),
        |c AS (SELECT MIN(day) + 3 AS cutoff FROM d)
        |SELECT CAST(day AS BIGINT) AS day, CAST(COUNT(*) AS BIGINT) AS n
        |FROM d, c WHERE day >= cutoff
        |GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
      // Partition RETENTION sweep — the lifecycle DELETE every
      // partitioned lakehouse table runs on a schedule: drop day
      // partitions older than the cutoff as a metadata-only operation
      // (directory listing + per-dropped-partition deletes — surviving
      // data is never read or rewritten, which is what makes retention
      // viable at 100 TB). The read-back per-day counts prove exactly
      // the expected days survived, byte-identical content for the rest.
      import graft.operators.Maintenance
      val ev = events(s, d)
        .select(expr("unix_micros(ts) div 86400000000").cast("long").as("day"),
          col("user_id"))
      val path = s"${sys.props("java.io.tmpdir")}/graft_u11_${graft.core.Tables.pathKey(d)}"
      ev.write.mode("overwrite").partitionBy("day").parquet(path)
      val cutoff = ev.agg(min(col("day"))).collect()(0).getLong(0) + 3
      Maintenance.dropPartitionsBelow(s, path, "day", cutoff)
      s.read.parquet(path)
        .groupBy(col("day").cast("long").as("day"))
        .agg(count(lit(1)).as("n"))
        .orderBy("day")
    },

    // ---- sampling: temperature-scaled mixture (UniMax) -----------------
    Q("sm_temperature",
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM documents GROUP BY source),
        |w AS (SELECT source, n,
        |    CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000.0) AS BIGINT) AS w FROM c),
        |t AS (SELECT CAST(SUM(w) AS BIGINT) AS sw FROM w),
        |q AS (SELECT source, LEAST((200 * w.w) // t.sw, w.n) AS q FROM w, t),
        |r AS (SELECT d.doc_id, d.source,
        |    row_number() OVER (PARTITION BY d.source ORDER BY
        |      CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 10000,
        |      d.doc_id) AS rk
        |  FROM documents d)
        |SELECT r.doc_id, r.source FROM r JOIN q USING (source)
        |WHERE r.rk <= q.q ORDER BY r.doc_id""".stripMargin) { (s, d) =>
      // Temperature-scaled rebalance (T=2): per-source quotas ∝ √count —
      // flattens the source-size head without a hand-written target
      // mixture. IEEE sqrt is correctly rounded (bit-identical on both
      // engines), weights floor to integer micro-units, quota arithmetic
      // is BIGINT; survivors are the md5-rank lowest per source.
      Sampling.temperatureMixture(
          documents(s, d).select("doc_id", "source"),
          stratum = col("source"), key = col("doc_id"), totalKeep = 200L)
        .orderBy("doc_id")
    }
  )
}
