package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** C4 line rules, Gopher gates and PII redaction on planted fixtures (the
  * synthetic corpus is single-line and PII-free, so line-granular and
  * redaction semantics are pinned here; the doc-level gates and the
  * injection-based redaction also have oracled catalog queries).
  */
class TextQualitySpec extends SparkTestBase {
  import spark.implicits._

  test("wordChunks: overlap continuity, short tail, sub-chunk and empty docs") {
    def chunks(text: String, size: Int, overlap: Int): Seq[(Int, Int, String)] =
      Seq(text).toDF("t")
        .select(explode(TextFns.wordChunks(TextFns.tokens(col("t")), size, overlap)).as("c"))
        .select("c.chunk_id", "c.n_tokens", "c.chunk_text")
        .as[(Int, Int, String)].collect().toSeq
    val ten = (1 to 10).map(i => s"w$i").mkString(" ")
    // size 4, overlap 1 -> stride 3: starts 1,4,7,10
    assert(chunks(ten, 4, 1) == Seq(
      (0, 4, "w1 w2 w3 w4"), (1, 4, "w4 w5 w6 w7"), (2, 4, "w7 w8 w9 w10"), (3, 1, "w10")))
    // doc shorter than one chunk -> single short chunk
    assert(chunks("a b", 5, 2) == Seq((0, 2, "a b")))
    // exact multiple, no overlap -> clean partition of the words
    assert(chunks(ten, 5, 0) == Seq((0, 5, "w1 w2 w3 w4 w5"), (1, 5, "w6 w7 w8 w9 w10")))
    // empty/whitespace doc -> no chunks
    assert(chunks("   ", 5, 1).isEmpty)
  }

  private def c4(text: String) = {
    val r = Seq(text).toDF("t")
      .select(TextFns.c4LineFilter(col("t")).as("c"))
      .select("c.kept_text", "c.n_lines", "c.n_lines_kept", "c.keep")
      .collect()(0)
    (r.getString(0), r.getInt(1), r.getInt(2), r.getBoolean(3))
  }

  test("c4LineFilter keeps punctuated 3+-word lines, drops the rest") {
    val doc = Seq(
      "This is a good sentence.",       // kept
      "short.",                         // < 3 words
      "No terminal punctuation here",   // no [.!?"']
      "Another proper sentence here!",  // kept
      "  ",                             // blank, not counted
      "Is this a question?"             // kept
    ).mkString("\n")
    val (kept, nLines, nKept, keep) = c4(doc)
    assert(nLines == 5) // blank line dropped from the line count
    assert(nKept == 3 && keep)
    assert(kept == "This is a good sentence.\nAnother proper sentence here!\nIs this a question?")
  }

  test("c4LineFilter drops documents with code markers or too few kept lines") {
    assert(!c4("One good sentence here.\nAnother good one too.")._4) // 2 < minLines
    val code = "A proper first sentence.\nfunction f() { return 1; }\nA proper second sentence.\nA proper third sentence."
    assert(!c4(code)._4) // '{' marker
    assert(!c4("Lorem Ipsum dolor sit amet.\nGood line number two here.\nGood line number three here.")._4)
  }

  test("gopherKeep bands: short docs, long-word docs and stopword-free docs drop") {
    def keep(t: String) = Seq(t).toDF("t")
      .select(TextFns.gopherKeep(col("t")).getField("keep")).as[Boolean].collect()(0)
    val good = ("the quick brown fox jumps over a lazy dog in town " * 5).trim
    assert(keep(good))
    assert(!keep("the of a short doc"))                         // < 50 words
    assert(!keep(("supercalifragilistic " * 60 + "the a ").trim)) // mean word len > 10
    assert(!keep(("word " * 60).trim))                          // no stopwords
  }

  test("redactPii replaces every occurrence and leaves near-misses alone") {
    val t = "mail a@b.co and c.d+x@e-f.org, ip 192.168.0.1, call 555-0123; " +
      "not-pii: 1234-5678, 1.2.3, half@domain"
    val out = Seq(t).toDF("t").select(TextFns.redactPii(col("t"))).as[String].collect()(0)
    assert(out == "mail [EMAIL] and [EMAIL], ip [IP], call [PHONE]; " +
      "not-pii: 1234-5678, 1.2.3, half@domain")
    val counts = Seq(t).toDF("t").select(TextFns.piiCounts(col("t")).as("c"))
      .select("c.n_emails", "c.n_ips", "c.n_phones").as[(Int, Int, Int)].collect()(0)
    assert(counts == ((2, 1, 1)))
  }
}
