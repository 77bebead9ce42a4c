package graft

import org.apache.spark.sql.functions._
import graft.functions.{TextFns, VectorFns}
import graft.operators.{Dedup, Similarity}

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
  // appended token: shingle jaccard = 14/15 ≈ 0.93, well above the
  // (H=64, b=8) LSH sweet spot of ~0.77 -> collision is near-certain
  private val nearDup = base + " again"
  private val distinct1 = "completely different content about spark query engines and shuffles"

  test("exactDedup groups identical normalized text (case/whitespace-insensitive)") {
    val df = Seq((1L, base), (2L, "  " + base.toUpperCase + " "), (3L, distinct1))
      .toDF("doc_id", "text")
    val out = Dedup.exactDedup(df, "doc_id", "text")
      .orderBy("doc_id").select("canonical_id", "is_dup").as[(Long, Boolean)].collect()
    assert(out.toSeq == Seq((1L, false), (1L, true), (3L, false)))
  }

  test("minhashLshPairs surfaces planted near-duplicates with high est_jaccard") {
    val df = Seq((1L, base), (2L, nearDup), (3L, distinct1), (4L, base)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(p => (p._1, p._2) -> p._3).toMap
    assert(pairs.contains((1L, 4L)) && pairs((1L, 4L)) == 1.0) // identical text
    assert(pairs.contains((1L, 2L)) && pairs((1L, 2L)) > 0.6)  // near dup
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L))) // unrelated never collides fully
  }

  test("minhashLshPairs maxBucketSize drops boilerplate buckets, keeps normal pairs") {
    // 1,2 are a small near-dup pair; 10..19 are ten IDENTICAL boilerplate
    // docs whose buckets all have size 10 — capped at 5 they vanish
    val df = (Seq((1L, base), (2L, nearDup)) ++ (10L to 19L).map(i => (i, distinct1)))
      .toDF("doc_id", "text")
    val uncapped = Dedup.minhashLshPairs(df, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(uncapped.contains((1L, 2L)))
    assert(uncapped.count { case (a, b) => a >= 10L && b >= 10L } == 45) // 10 choose 2
    val capped = Dedup.minhashLshPairs(df, "doc_id", "text", maxBucketSize = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(capped.contains((1L, 2L)))             // normal pair untouched
    assert(!capped.exists { case (a, b) => a >= 10L || b >= 10L }) // boilerplate gone
  }

  test("ngramJaccardVerify computes exact jaccard on candidates only") {
    val df = Seq((1L, base), (2L, base), (3L, distinct1)).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.ngramJaccardVerify(df, pairs, "doc_id", "text", minJaccard = 0.9)
      .as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 2L, 1.0)))
  }

  test("simhashPairs: identical docs always share all bands") {
    val df = Seq((1L, base), (2L, base), (3L, distinct1)).toDF("doc_id", "text")
    val out = Dedup.simhashPairs(df, "doc_id", "text").as[(Long, Long)].collect()
    assert(out.contains((1L, 2L)))
  }

  test("dedupCorpus end-to-end: keeps one doc per near-dup cluster, unrelated intact") {
    val df = Seq(
      (1L, base), (2L, nearDup), (3L, base),   // cluster {1,2,3} -> keep 1
      (4L, distinct1),                          // untouched
      (5L, "another unrelated document about watermarks and stateful streaming"))
      .toDF("doc_id", "text")
    val out = Dedup.dedupCorpus(df, "doc_id", "text")
    assert(out.columns.toSeq == df.columns.toSeq) // original shape preserved
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 4L, 5L))
  }

  test("contaminationFlags: only docs sharing an 8-gram with the benchmark flag") {
    val benchDoc = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val leaked = "intro words here " + benchDoc + " plus a tail" // contains bench 8-grams
    val clean = "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq((10L, leaked), (11L, clean)).toDF("doc_id", "text")
    val bench = Seq((1L, benchDoc)).toDF("doc_id", "text")
    val out = Dedup.contaminationFlags(docs, bench, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out.keySet == Set(10L))
    assert(out(10L) == 3L) // 10-token bench doc has 3 distinct 8-grams, all present
  }

  test("incremental exact flags: known copies flagged with corpus id, novel pass through") {
    val corpus = Seq((1L, base), (2L, distinct1)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, "  " + base.toUpperCase + " "), // normalized copy of corpus doc 1
      (11L, "entirely new document text")).toDF("doc_id", "text")
    val out = Dedup.incrementalExactFlags(
        batch, Dedup.exactIndex(corpus, "doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "exact_dup_of", "is_known")
      .as[(Long, Option[Long], Boolean)].collect()
    assert(out.toSeq == Seq((10L, Some(1L), true), (11L, None, false)))
  }

  test("incremental exact flags refuse reserved output-contract column names") {
    val corpus = Seq((1L, base)).toDF("doc_id", "text")
    val batch = Seq((10L, base, "user-owned")).toDF("doc_id", "text", "is_known")
    val e = intercept[IllegalArgumentException] {
      Dedup.incrementalExactFlags(batch, Dedup.exactIndex(corpus, "doc_id", "text"),
        "doc_id", "text")
    }
    assert(e.getMessage.contains("is_known"))
  }

  test("incremental near-dup candidates: batch near-copy collides with corpus index") {
    val corpus = Seq((1L, base), (2L, distinct1)).toDF("doc_id", "text")
    val batch = Seq((10L, nearDup), (11L, "unrelated fresh words nobody wrote before today"))
      .toDF("doc_id", "text")
    val out = Dedup.incrementalNearDupPairs(
        batch, Dedup.minhashIndex(corpus, "doc_id", "text"), "doc_id", "text")
      .as[(Long, Long, Double)].collect()
    assert(out.map(p => (p._1, p._2)).toSet == Set((10L, 1L)), s"got ${out.toSeq}")
    assert(out.head._3 > 0.7, s"est_jaccard ${out.head._3} too low for a near-copy")
  }

  test("bucketed minhash index: qualified table names are refused") {
    // the orphan cleanup derives warehouse/<name>; db.tbl would make it
    // point at (and delete) the wrong directory
    val corpus = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Dedup.saveMinhashIndexBucketed(corpus, "doc_id", "text", "somedb.graft_test_mh_q")
    }
    assert(e.getMessage.contains("unqualified"))
  }

  test("bucketed minhash index: probe joins without re-shuffling the corpus side") {
    val corpus = (0L until 30L).map(i => (i, s"$base unique tail token$i")).toDF("doc_id", "text")
    val batch = Seq((100L, base + " unique tail token7"), (101L, distinct1)).toDF("doc_id", "text")
    spark.sql("DROP TABLE IF EXISTS graft_test_mh_idx")
    Dedup.saveMinhashIndexBucketed(corpus, "doc_id", "text", "graft_test_mh_idx", numBuckets = 8)
    // force shuffle joins: at fixture size broadcast would mask the
    // bucketing (at corpus scale the index never broadcasts)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val bucketed = Dedup.probeMinhashIndexBucketed(batch, "graft_test_mh_idx", "doc_id", "text")
      val plain = Dedup.incrementalNearDupPairs(batch,
        Dedup.minhashIndex(corpus, "doc_id", "text"), "doc_id", "text")
      // candidate-identical to the unbucketed probe
      val got = bucketed.select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      val want = plain.select("batch_id", "corpus_id").as[(Long, Long)].collect().toSet
      assert(got == want && got.nonEmpty, s"bucketed=$got plain=$want")
      // the bucketed save pre-shuffled the corpus at build time: the probe
      // plan must carry exactly one fewer Exchange than the unbucketed one
      val exB = "Exchange".r.findAllIn(bucketed.queryExecution.executedPlan.toString).size
      val exP = "Exchange".r.findAllIn(plain.queryExecution.executedPlan.toString).size
      assert(exB == exP - 1, s"bucketed probe has $exB exchanges vs $exP unbucketed")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_test_mh_idx")
    }
  }

  test("canonicalize propagates min id across duplicate chains") {
    val ids = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // chain 1-2, 2-3 and isolated pair 4-5: clusters {1,2,3} and {4,5}
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val out = Dedup.canonicalize(ids, pairs, "doc_id")
      .orderBy("doc_id").select("canonical_id", "is_dup").as[(Long, Boolean)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 1L, 1L, 4L, 4L))
    assert(out.map(_._2).toSeq == Seq(false, true, true, false, true))
  }

  test("semanticDedupPairs: planted duplicate always pairs; output subset of exact all-pairs") {
    val dim = 8
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 40L).map(i => (i, Array.fill(dim)(rnd.nextGaussian().toFloat)))
    // plant an exact duplicate of vector 3 as id 100
    val df = (vecs :+ (100L, vecs(3)._2.clone())).toDF("vec_id", "embedding")
    val sem = Similarity.semanticDedupPairs(df, "vec_id", "embedding",
        minCosine = 0.3, nCells = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sem.contains((3L, 100L)), s"planted duplicate missing from $sem")
    val exact = Similarity.exactCosinePairs(df, "vec_id", "embedding", 0.3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(sem.subsetOf(exact), s"semantic pairs not a subset of exact: ${sem diff exact}")
  }

  test("embedding near-dup finds planted duplicate vector, cosine exact") {
    val v = Array.tabulate(64)(i => (i + 1).toFloat / 64f)
    val w = Array.tabulate(64)(i => if (i % 2 == 0) 1f else -1f) // orthogonal-ish
    val df = Seq((1L, v.toSeq), (2L, v.toSeq), (3L, w.toSeq)).toDF("vec_id", "embedding")
    val out = Dedup.embeddingNearDupPairs(df, "vec_id", "embedding", minCosine = 0.99)
      .as[(Long, Long, Double)].collect()
    assert(out.length == 1 && out.head._1 == 1L && out.head._2 == 2L)
    assert(math.abs(out.head._3 - 1.0) < 1e-12)
  }

  test("bruteForceTopK ranks by cosine and excludes the query row") {
    val mk = (s: Double) => Array.tabulate(64)(i => (s * (i + 1)).toFloat)
    val df = Seq((0L, mk(1.0).toSeq), (1L, mk(2.0).toSeq), // parallel -> cosine 1
      (2L, Array.tabulate(64)(i => if (i == 0) 1f else 0f).toSeq)).toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val out = Similarity.bruteForceTopK(df, "vec_id", "embedding", q, 0L, 2)
      .as[(Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(math.abs(out.head._2 - 1.0) < 1e-12)
  }

  test("lshTopK returns the true neighbor for an identical vector") {
    val v = Array.tabulate(64)(i => math.sin(i + 1).toFloat)
    val far = Array.tabulate(64)(i => math.cos(3 * i + 2).toFloat)
    val df = Seq((0L, v.toSeq), (1L, v.toSeq), (2L, far.toSeq)).toDF("vec_id", "embedding")
    val q = df.filter(col("vec_id") === 0).select(col("embedding").as("qvec"))
    val out = Similarity.lshTopK(df, "vec_id", "embedding", q, 0L, 1)
      .as[(Long, Double)].collect()
    assert(out.length == 1 && out.head._1 == 1L && math.abs(out.head._2 - 1.0) < 1e-9)
  }

  test("langId: CJK short-circuit and stopword argmax") {
    val df = Seq("the cat is on the mat", "der hund ist nicht da", "这是中文文本").toDF("text")
    val out = df.select(TextFns.langId(col("text"))).as[String].collect()
    assert(out.toSeq == Seq("en", "de", "zh"))
  }

  test("fingerprint64 is stable and edit-sensitive") {
    graft.plans.Sketches.ensureRegistered(spark)
    val df = Seq((1L, base), (2L, base), (3L, distinct1)).toDF("id", "text")
    val fps = df.select(TextFns.fingerprint64(col("text"))).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("spanOverlapStats: shared-prefix windows count as dup, fresh tail stays novel") {
    // A = 20 tokens; B = A's 20 tokens + 5 fresh ones. With window=16,
    // A has 5 windows (all inside the shared prefix), B has 10 (5 shared
    // + 5 sliding into the fresh tail); C shares nothing.
    val a = (1 to 20).map(i => s"w$i").mkString(" ")
    val b = a + " " + (1 to 5).map(i => s"fresh$i").mkString(" ")
    val c = (1 to 20).map(i => s"x$i").mkString(" ")
    val df = Seq((1L, a), (2L, b), (3L, c)).toDF("doc_id", "text")
    val out = Dedup.spanOverlapStats(df, "doc_id", "text", window = 16)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 5L, 5L, 1.0),
      (2L, 10L, 5L, 0.5),
      (3L, 5L, 0L, 0.0)))
  }

  test("spanOverlapStats: short docs get one whole-doc window; self-repeats are not dup") {
    // docs 1/2 are identical 3-token docs (single whole-doc window ->
    // cross-doc dup); doc 3 repeats ITS OWN 16-token span twice but shares
    // nothing cross-document, so its self-collision is not duplication
    val selfRep = ((1 to 16) ++ (1 to 16)).map(i => s"t$i").mkString(" ")
    val df = Seq((1L, "tiny doc here"), (2L, "tiny doc here"), (3L, selfRep))
      .toDF("doc_id", "text")
    val out = Dedup.spanOverlapStats(df, "doc_id", "text", window = 16)
      .orderBy("doc_id").as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 1L, 1L, 1.0),
      (2L, 1L, 1L, 1.0),
      (3L, 17L, 0L, 0.0)))
  }

  test("cutDuplicateSpans: owner keeps text, copies cut to their novel tail") {
    val orig = (1 to 20).map(i => s"w$i").mkString(" ")
    val copyWithTail = orig + " my novel tail"
    val third = orig // second copy: still cut (owner is doc 1)
    val unrelated = (1 to 20).map(i => s"u$i").mkString(" ")
    val df = Seq((1L, orig), (2L, copyWithTail), (3L, third), (4L, unrelated))
      .toDF("doc_id", "text")
    val out = Dedup.cutDuplicateSpans(df, "doc_id", "text", window = 16)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    // doc 2: head 20 tokens covered by doc 1's windows; the 3 tail tokens
    // survive (windows crossing into the tail are novel, doc 2 owns them)
    assert(out == Seq(
      (1L, orig, 20L, 0L),            // owner keeps everything
      (2L, "my novel tail", 23L, 20L),
      (3L, "", 20L, 20L),             // exact copy of an earlier doc -> empty
      (4L, unrelated, 20L, 0L)))
  }

  test("mergeDuplicateSpans: a copy with a fresh tail yields ONE maximal span, not N windows") {
    val orig = (1 to 40).map(i => s"w$i").mkString(" ")
    val copyWithTail = orig + " " + (1 to 10).map(i => s"t$i").mkString(" ")
    val unrelated = (1 to 40).map(i => s"u$i").mkString(" ")
    val df = Seq((1L, orig), (2L, copyWithTail), (3L, unrelated))
      .toDF("doc_id", "text")
    val out = Dedup.mergeDuplicateSpans(df, "doc_id", "text", window = 16)
      .orderBy("doc_id", "span_start").as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1: all 25 windows shared with doc 2 -> one span covering all 40
    // tokens; doc 2: the same 25 shared window positions (windows crossing
    // into the tail are novel) merge to ONE maximal span [0, 39] = 40
    // tokens; the 10 fresh tail tokens are outside it; doc 3: no spans.
    assert(out == Seq(
      (1L, 0L, 40L, 25L),
      (2L, 0L, 40L, 25L)))
  }

  test("mergeDuplicateSpans: disjoint duplicated regions stay separate spans") {
    // doc 20 embeds doc 10's 16-token block at positions 0 and 40 with an
    // unshared 24-token gap -> exactly two spans of 16
    val block = (1 to 16).map(i => s"b$i").mkString(" ")
    val gap = (1 to 24).map(i => s"g$i").mkString(" ")
    val host = s"$block $gap $block"
    val df = Seq((10L, block), (20L, host)).toDF("doc_id", "text")
    val out = Dedup.mergeDuplicateSpans(df, "doc_id", "text", window = 16)
      .filter($"doc_id" === 20L)
      .orderBy("span_start").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((20L, 0L, 16L, 1L), (20L, 40L, 16L, 1L)))
  }

  test("cutDuplicateSpans: short docs use the whole-doc window; owner rule holds") {
    val df = Seq((5L, "tiny doc"), (9L, "tiny doc"), (7L, "other tiny")).toDF("doc_id", "text")
    val out = Dedup.cutDuplicateSpans(df, "doc_id", "text", window = 16)
      .orderBy("doc_id").as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq(
      (5L, "tiny doc", 2L, 0L),   // min id owns the shared whole-doc window
      (7L, "other tiny", 2L, 0L),
      (9L, "", 2L, 2L)))
  }

  test("bloom prefilter: no false negatives, exact verification, novel short-circuit") {
    val corpus = Seq((1L, base), (2L, distinct1)).toDF("doc_id", "text")
    val batch = Seq(
      (10L, base),                    // exact copy -> MUST be candidate + known
      (11L, "  " + base.toUpperCase), // normalization-equal copy -> known
      (12L, nearDup),                 // novel (near dup is not exact dup)
      (13L, "entirely new material about bloom filters")).toDF("doc_id", "text")
    val out = Dedup.bloomPrefilterFlags(batch,
        Dedup.bloomIndex(corpus, "doc_id", "text"),
        Dedup.exactIndex(corpus, "doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Boolean, Option[Long], Boolean, Boolean)].collect().toSeq
    val byId = out.map(r => r._1 -> r).toMap
    // the no-false-negative contract: every true duplicate is a candidate
    assert(byId(10L) == ((10L, true, Some(1L), true, false)))
    assert(byId(11L) == ((11L, true, Some(1L), true, false)))
    // novel docs are never known; a bloom fp (if the tiny bitmap yields
    // one) must be flagged as such and still verify novel
    Seq(12L, 13L).foreach { id =>
      val (_, cand, dupOf, known, fp) = byId(id)
      assert(!known && dupOf.isEmpty)
      assert(fp == cand) // candidate but unverified == false positive
    }
  }

  test("saveExactIndex: selective probe reads a fraction of the index bytes") {
    // 20k synthetic rows across 16 range-partitioned hash-sorted files:
    // a point probe must prune by footer min/max (+ bloom for absent
    // hashes) instead of re-reading the index — the bytes-read contract
    // that makes per-batch ingest cost O(batch), not O(corpus index)
    def bytesRead(body: => Unit): Long = {
      val total = new java.util.concurrent.atomic.AtomicLong(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null) total.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
      }
      spark.sparkContext.addSparkListener(listener)
      try { body; Thread.sleep(500) } // listener bus drains async
      finally spark.sparkContext.removeSparkListener(listener)
      total.get()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-exact-idx").toString
    val docs = spark.range(20000).select(
      col("id").as("doc_id"), md5(col("id").cast("string")).as("text"))
    // expectedNdv is PER ROW GROUP: sized to this fixture's ~1250
    // rows/file (an oversized ndv allocates the 1 MB bitmap cap per row
    // group — 22x the disk and the probe reads bitmaps instead of
    // skipping data; saveExactIndex documents the measurement)
    Dedup.saveExactIndex(docs, "doc_id", "text", dir, nFiles = 16, expectedNdv = 2000)
    assert(new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet")) == 16)
    val present = Dedup.exactIndex(docs.limit(1), "doc_id", "text")
      .select("text_hash").as[String].head()
    // full scan through a non-pushable predicate (forces reading the col)
    val full = bytesRead {
      spark.read.parquet(dir).filter(length(col("text_hash")) > 0).count()
    }
    val point = bytesRead {
      assert(spark.read.parquet(dir).filter(col("text_hash") === present).count() == 1)
    }
    val absent = bytesRead {
      assert(spark.read.parquet(dir)
        .filter(col("text_hash") === "ffffffffffffffffffffffffffffffff").count() == 0)
    }
    info(s"index bytes: full=$full point=$point absent=$absent")
    // the point probe still pays a fixed floor — every file's footer +
    // per-row-group bloom bitmaps — before data pages skip, and at this
    // fixture size (16 small files) that floor is ~25% of the index; the
    // pruning claim is point << full, asserted at 3x (the data-page skip),
    // not a tighter bound that races the fixed overhead
    assert(point * 3 < full, s"point probe read $point of $full bytes — layout prunes nothing")
    assert(absent * 3 < full, s"absent probe read $absent of $full bytes")
  }

  test("bloomIndex: packs positions into in-range non-zero words; empty corpus -> all novel") {
    val corpus = Seq((1L, base), (2L, distinct1), (3L, nearDup)).toDF("doc_id", "text")
    val bm = Dedup.bloomIndex(corpus, "doc_id", "text", mBits = 1 << 10)
      .as[(Int, Long)].collect()
    assert(bm.nonEmpty && bm.forall { case (w, bits) => w >= 0 && w < (1 << 10) / 32 && bits != 0L })
    // empty corpus -> empty bitmap -> every batch doc is bloom-negative
    // (novel pre-shuffle) with clean flags
    val empty = corpus.filter(col("doc_id") < 0)
    val out = Dedup.bloomPrefilterFlags(corpus,
        Dedup.bloomIndex(empty, "doc_id", "text"),
        Dedup.exactIndex(empty, "doc_id", "text"), "doc_id", "text")
      .as[(Long, Boolean, Option[Long], Boolean, Boolean)].collect().toSeq
    assert(out.size == 3 && out.forall { case (_, cand, dupOf, known, fp) =>
      !cand && dupOf.isEmpty && !known && !fp })
  }

  test("phashNearDupPairs: output is EXACTLY all pairs at hamming <= max (pigeonhole)") {
    // deterministic 64-bit strings with controlled distances
    def hash(seed: Int, flips: Seq[Int]): String = {
      val base = Array.tabulate(64)(i => if (((seed * 2654435761L + i * 40503L) >> 7) % 2 == 0) '1' else '0')
      flips.foreach(i => base(i) = if (base(i) == '1') '0' else '1')
      new String(base)
    }
    val rows = Seq(
      (1L, hash(7, Nil)),
      (2L, hash(7, Seq(0, 9, 18))),        // ham 3 from 1
      (3L, hash(7, Seq(1, 9, 17, 25, 33, 41))), // ham 6 from 1
      (4L, hash(7, (0 until 10))),          // ham 10 from 1: out
      (5L, hash(99, Nil)))                  // far from everything
    val df = rows.toDF("media_id", "phash")
    val got = Dedup.phashNearDupPairs(df, "media_id", "phash", bands = 8, maxHamming = 6)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Int)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // brute force over ALL pairs — banding must not lose any (pigeonhole)
    val want = (for {
      (a, ha) <- rows; (b, hb) <- rows if a < b
      ham = ha.zip(hb).count { case (x, y) => x != y } if ham <= 6
    } yield (a, b) -> ham).toMap
    assert(got == want, s"got $got want $want")
    assert(want.contains((1L, 2L)) && want.contains((1L, 3L)) && !want.contains((1L, 4L)))
  }

  test("phashNearDupPairs: null/short hash fails loudly, not silently") {
    val df = Seq((1L, "1" * 64), (2L, null.asInstanceOf[String])).toDF("media_id", "phash")
    val e = intercept[Exception] {
      Dedup.phashNearDupPairs(df, "media_id", "phash").collect()
    }
    assert(e.getMessage != null)
  }

  test("dedupEval: counts agree with independently computed exact/candidate sets") {
    val docs = graft.core.Tables.documents(spark, sfDir).select("doc_id", "text")
    val row = Dedup.dedupEval(docs, "doc_id", "text", minJaccard = 0.5)
      .as[(Long, Long, Long, Option[Double], Option[Double])].head()
    val (nExact, nCand, nHits, prec, rec) = row
    // cross-check n_exact against the brute-force exact Jaccard over all
    // pairs (fixture-sized corpus), computed via the verify helper on the
    // full candidate universe
    val ids = docs.select("doc_id")
    val allPairs = ids.select(col("doc_id").as("id_a"))
      .crossJoin(ids.select(col("doc_id").as("id_b")))
      .filter(col("id_a") < col("id_b"))
    val bruteExact = Dedup.ngramJaccardVerify(docs, allPairs, "doc_id", "text",
      shingleSize = 3, minJaccard = 0.5).count()
    assert(nExact == bruteExact, s"exact ground truth $nExact != brute force $bruteExact")
    // candidate count agrees with the LSH pair generator itself
    val candCount = Dedup.minhashLshPairs(docs, "doc_id", "text").count()
    assert(nCand == candCount)
    // metric identities
    assert(nHits <= math.min(nExact, nCand))
    assert(prec.contains(nHits.toDouble / nCand) || nCand == 0)
    assert(rec.contains(nHits.toDouble / nExact) || nExact == 0)
    // 64-hash/8-band LSH at tau=0.5 should recall most true pairs on the
    // fixture's planted near-dups
    if (nExact > 0) assert(rec.get >= 0.8, s"recall ${rec.get} below the 0.8 floor")
  }

  test("lshTuningCurve: candidates nest as bands grow, recall monotone, exact count fixed") {
    val docs = graft.core.Tables.documents(spark, sfDir).select("doc_id", "text")
    val curve = Dedup.lshTuningCurve(docs, "doc_id", "text",
        minJaccard = 0.5, bandsList = Seq(4, 8, 16))
      .orderBy("bands")
      .as[(Int, Long, Long, Long, Option[Double], Option[Double])].collect()
    assert(curve.map(_._1).toSeq == Seq(4, 8, 16))
    assert(curve.map(_._2).distinct.length == 1) // shared ground truth
    // band boundaries align (16 = 2x8 rows), so a full 16-row band match
    // implies both 8-row halves match: candidate sets NEST as bands grow
    curve.sliding(2).foreach {
      case Array((_, _, c1, h1, _, _), (_, _, c2, h2, _, _)) =>
        assert(c2 >= c1 && h2 >= h1, s"curve not monotone: ${curve.toSeq}")
      case _ => ()
    }
    curve.foreach { case (b, ne, nc, nh, p, r) =>
      assert(nh <= math.min(ne, nc))
      assert(p.forall(v => v >= 0 && v <= 1) && r.forall(v => v >= 0 && v <= 1))
    }
    // 16 one-hash... 4-hash bands at tau=0.5 should recall everything the
    // 8-band default does or more; the default already clears 0.8
    if (curve.last._2 > 0) assert(curve.last._6.get >= 0.8)
  }

  test("cdcChunks: lossless reassembly, shift-resistant boundaries, copies dedup to owner") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega " +
      "one two three four five six seven eight nine ten eleven twelve"
    val docs = Seq(
      (1L, base),
      (2L, base),                                  // exact copy: all chunks owned by 1
      (3L, "prefix words inserted here " + base),  // shifted copy: boundaries re-align
      (4L, "tiny doc"),                            // shorter than the window: one chunk
      (5L, "completely different material with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val out = Dedup.cdcChunks(docs, "doc_id", "text", window = 4, divisor = 8)
      .orderBy("doc_id", "chunk_id").cache()

    // 1) chunks reassemble every document's token stream losslessly
    val byDoc = out.select("doc_id", "chunk_id", "chunk_text")
      .as[(Long, Long, String)].collect().groupBy(_._1)
      .map { case (id, cs) => id -> cs.sortBy(_._2).map(_._3).mkString(" ") }
    docs.as[(Long, String)].collect().foreach { case (id, text) =>
      val toks = text.trim.split("\\s+").filter(_.nonEmpty).mkString(" ")
      assert(byDoc(id) == toks, s"doc $id reassembly mismatch")
    }

    // 2) chunk ids are 1..n contiguous and start positions strictly increase
    byDoc.keys.foreach { id =>
      val rows = out.filter(col("doc_id") === id)
        .select("chunk_id", "start_pos", "n_chunk_tokens")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
      rows.sliding(2).foreach {
        case Array((_, s1, n1), (_, s2, _)) => assert(s2 == s1 + n1)
        case _ => ()
      }
    }

    // 3) the exact copy dedups: every chunk of doc 2 has dup_of = 1
    val dup2 = out.filter(col("doc_id") === 2)
      .select("dup_of").as[Option[Long]].collect()
    assert(dup2.nonEmpty && dup2.forall(_.contains(1L)), s"doc2 dup_of: ${dup2.toSeq}")

    // 4) shift-resistance: doc 3 (prefix inserted) still shares its
    // interior chunks with doc 1 — at least one chunk dedups to 1, which
    // fixed-size chunking could never achieve after a 4-token shift
    val dup3 = out.filter(col("doc_id") === 3 && col("dup_of") === 1).count()
    assert(dup3 >= 1, "no chunk of the shifted copy re-aligned to the original")

    // 5) novel docs own all their chunks
    assert(out.filter(col("doc_id").isin(1L, 5L) && col("dup_of").isNotNull).count() == 0)
    // 6) sub-window doc is a single chunk covering itself
    val tiny = out.filter(col("doc_id") === 4)
      .select("chunk_id", "start_pos", "n_chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect()
    assert(tiny.toSeq == Seq((1L, 1L, 2L, "tiny doc")))
    out.unpersist()
  }

  test("phoneticKey: classic codes, H/W transparency, planted homophones block together") {
    // textbook vectors for the chain (H/W transparent variant)
    val words = Seq("Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak",
      "Pfister", "Smith", "Smyth", "Jackson", "Honeyman", "a", "")
    val got = words.toDF("w")
      .select(Dedup.phoneticKey(col("w"))).as[String].collect().toSeq
    // Pfister keys P236: the first letter's own code participates in run
    // collapsing (P,F share class 1), the census-variant behavior
    assert(got == Seq("R163", "R163", "A261", "A261", "T522",
      "P236", "S530", "S530", "J250", "H555", "A000", ""), got.toString)
    // planted homophone fixture: each cluster lands in ONE phonetic
    // block; the disjoint name stays singleton
    val docs = Seq(
      (1L, "Smith wrote the manual."), (2L, "Smyth wrote the manual."),
      (3L, "Robert signed off."), (4L, "Rupert signed off."),
      (5L, "Jackson reviewed it.")).toDF("doc_id", "text")
    val g = Dedup.phoneticGroups(docs, "doc_id", "text")
      .select("doc_id", "code", "group_n", "is_dup")
      .as[(Long, String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(g.map(_._2) == Seq("S530", "S530", "R163", "R163", "J250"))
    assert(g.map(_._3) == Seq(2L, 2L, 2L, 2L, 1L))
    assert(g.map(_._4) == Seq(true, true, true, true, false))
  }
}
