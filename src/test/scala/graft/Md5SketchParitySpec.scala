package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** Cross-engine parity pins for the md5-derived sketch family.
  *
  * Every golden value below was computed independently in Python
  * (hashlib.md5 + integer arithmetic) AND in DuckDB 1.0
  * (CAST('0x' || substr(md5(s), 1, n) AS BIGINT) + BIGINT arithmetic),
  * and the two agreed bit-for-bit. If a refactor of
  * graft.plans.Sketches changes any of these, the DuckDB oracles of the
  * whole LSH dedup stack (dd_minhash_lsh, dd_simhash, dd_ngram_jaccard,
  * dd_corpus_dedup, dd_incr_near, tx_fingerprint) silently break — this
  * spec makes that a local test failure instead of a driver-run red row.
  */
class Md5SketchParitySpec extends SparkTestBase {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"

  test("minhash signature matches the DuckDB affine-family replay") {
    graft.plans.Sketches.ensureRegistered(spark)
    val sig = Seq(base).toDF("text")
      .select(TextFns.minhashSignature(TextFns.tokens(col("text")), 3, 64).as("sig"))
      .as[Seq[Long]].head()
    assert(sig.length == 64)
    // DuckDB: list_transform(range(0,64), k -> list_min(list_transform(hv,
    //   h -> ((1 + (2654435761*(k+1) + 1013904223) % 1073741789) * h
    //        + (2654435761*(k+777) + 1013904223) % 4294967311) % 4294967311)))
    assert(sig.take(4) == Seq(92739073L, 238716133L, 550101650L, 90374634L),
      s"sig head drifted: ${sig.take(4)}")
    // affine coefficients themselves are part of the cross-engine contract
    assert(graft.plans.Sketches.minhashA(0) == 1 + (2654435761L + 1013904223L) % 1073741789L)
    assert(graft.plans.Sketches.minhashB(0) == (2654435761L * 777 + 1013904223L) % 4294967311L)
  }

  test("banded bucket matches md5 of the band,slots string") {
    graft.plans.Sketches.ensureRegistered(spark)
    val sig = Seq(base).toDF("text")
      .select(TextFns.minhashSignature(TextFns.tokens(col("text")), 3, 64).as("sig"))
      .as[Seq[Long]].head()
    val bucketStr = "0," + sig.take(8).mkString(",")
    val viaSpark = Seq(bucketStr).toDF("s").select(md5(col("s"))).as[String].head()
    // DuckDB: md5('0,' || array_to_string(sig[1:8], ','))
    assert(viaSpark == "d99006a78f65eebb714b0200ac040b7f",
      s"band-0 bucket drifted: $viaSpark (bucket string: $bucketStr)")
  }

  test("simhash bands match the DuckDB bit-vote replay") {
    graft.plans.Sketches.ensureRegistered(spark)
    val bands = Seq(base).toDF("text")
      .select(TextFns.simhashBands(TextFns.tokens(col("text"))).as("b"))
      .as[Seq[Long]].head()
    // DuckDB: per-token h60 = CAST('0x'||substr(md5(t),1,15) AS BIGINT),
    // counts per bit, band value packs 15 sign bits
    assert(bands == Seq(5743L, 15345L, 20239L, 2026L), s"simhash drifted: $bands")
  }

  test("fingerprint matches the DuckDB rolling-window replay") {
    graft.plans.Sketches.ensureRegistered(spark)
    val fp = Seq(base).toDF("text")
      .select(TextFns.fingerprint64(col("text"))).as[Long].head()
    // DuckDB: list_min(list_transform(range(1, length(s)-6),
    //   i -> CAST('0x'||substr(md5(substr(s,i,8)),1,15) AS BIGINT)))
    assert(fp == 5938739990923103L, s"fingerprint drifted: $fp")
    // short string: whole-string hash, h60('the') cross-checked in DuckDB
    val short = Seq("the").toDF("text")
      .select(TextFns.fingerprint64(col("text"))).as[Long].head()
    assert(short == 647465868329588333L, s"short fingerprint drifted: $short")
  }

  test("rolling window hashes match the md5-prefix replay, window order preserved") {
    graft.plans.Sketches.ensureRegistered(spark)
    // differential anchor: the JVM loop vs Spark's OWN md5/conv SQL
    // functions over the same window strings — the exact primitives the
    // DuckDB oracle uses (md5 hex prefix -> h60), so agreement here is
    // agreement with the oracle's arithmetic
    val viaExpr = Seq(base).toDF("text")
      .select(TextFns.rollingWindowHashes(TextFns.tokens(col("text")), 5).as("hs"))
      .as[Seq[Long]].head()
    val windows = base.trim.split("\\s+").toSeq.sliding(5).map(_.mkString(" ")).toSeq
    val viaSql = windows.toDF("w")
      .select(conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long"))
      .as[Long].collect().toSeq
    assert(viaExpr.length == windows.length)
    assert(viaExpr == viaSql, s"rolling hashes drifted:\n$viaExpr\n$viaSql")
    // short doc: ONE whole-doc window (the MinHashSig convention)
    val short = Seq("only three tokens").toDF("text")
      .select(TextFns.rollingWindowHashes(TextFns.tokens(col("text")), 5))
      .as[Seq[Long]].head()
    val whole = Seq("only three tokens").toDF("w")
      .select(conv(substring(md5(col("w")), 1, 15), 16, 10).cast("long")).as[Long].head()
    assert(short == Seq(whole))
  }
}
