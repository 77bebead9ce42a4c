package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis expression library for training-data pipelines.
  *
  * Everything here is a pure Catalyst expression built from
  * `org.apache.spark.sql.functions` higher-order functions — codegen'd,
  * no UDFs, so whole-stage codegen spans survive and the ops scale to
  * 100 TB document tables without serialization overhead.
  */
object TextFns {

  /** Whitespace tokens of trimmed text, empty strings dropped (robust to
    * leading/trailing/multiple whitespace).
    */
  def tokens(c: Column): Column =
    filter(split(trim(c), "\\s+"), t => t =!= "")

  def tokenCount(c: Column): Column = size(tokens(c))

  /** BPE-ish token estimate without a tokenizer model: chars/4 heuristic
    * (the published GPT-family rule of thumb), ceil'd.
    */
  def bpeTokenEstimate(nChars: Column): Column =
    ceil(nChars.cast("double") / 4.0)

  /** Count of tokens that appear in `dict` (duplicates counted — it's a
    * ratio numerator, not a set intersection).
    */
  def dictHits(toks: Column, dict: Seq[String]): Column =
    size(filter(toks, t => array_contains(typedLit(dict), t)))

  /** Word n-gram shingles: ["a","b","c"] with n=2 -> ["a b","b c"]. */
  def wordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array(concat_ws(" ", toks)))

  /** Like [[wordShingles]] but docs shorter than `n` words contribute no
    * shingles (no whole-doc fallback) — the right shape for n-gram
    * frequency statistics, where a 1-word "bigram" would pollute counts.
    */
  def strictWordShingles(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)),
        i => concat_ws(" ", slice(toks, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Overlapping fixed-size word chunks — the context-window preprocessing
    * step before training-shard packing: chunk k starts at word
    * 1 + k·(chunkSize - overlap) and takes `chunkSize` words (the final
    * chunks run short rather than padding). Returns an array of structs
    * (chunk_id, n_tokens, chunk_text); empty docs chunk to an empty array.
    * Pure HOF expression — O(words) per row, codegen'd, no shuffle.
    */
  def wordChunks(toks: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      s"need 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    when(size(toks) > 0,
      transform(sequence(lit(1), size(toks), lit(stride)), (start, i) =>
        struct(
          i.cast("int").as("chunk_id"),
          size(slice(toks, start, lit(chunkSize))).as("n_tokens"),
          concat_ws(" ", slice(toks, start, lit(chunkSize))).as("chunk_text"))))
      .otherwise(array().cast("array<struct<chunk_id:int,n_tokens:int,chunk_text:string>>"))
  }

  /** Character n-gram shingles over the raw string. */
  def charShingles(c: Column, n: Int): Column =
    transform(sequence(lit(1), greatest(length(c) - (n - 1), lit(1))),
      i => c.substr(i, lit(n)))

  /** MinHash signature: one md5-derived h32 per shingle, numHashes slots
    * from an affine universal family mod the prime 4294967311 — a custom
    * Catalyst expression (graft.plans.Sketches), SQL-replayable so the LSH
    * dedup stack carries full DuckDB oracles.
    * The equivalent HOF formulation (transform over seeds x shingles)
    * measured ~45 ms/row interpreted; the expression is ~1000x faster.
    * Callers must Sketches.ensureRegistered(session) first (the Dedup
    * operators do it automatically). The LSH band join built on top of
    * this is what makes near-dup detection shuffle candidate PAIRS rather
    * than all N² comparisons (see graft.operators.Dedup).
    */
  def minhashSignature(toks: Column, shingleSize: Int, numHashes: Int): Column =
    call_function("graft_minhash_sig", toks, lit(shingleSize), lit(numHashes))

  /** Estimated Jaccard from two MinHash signatures: fraction of agreeing
    * components.
    */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    aggregate(
      zip_with(sigA, sigB, (a, b) => when(a === b, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x
    ).cast("double") / size(sigA)

  /** SimHash as 4 band values of 15 bits each (60 bits total — the
    * md5-derived h60 keeps the per-token hash a non-negative BIGINT in any
    * engine): bit i is the sign of the sum over tokens of (+/-1 by bit i
    * of the token hash). Custom expression (graft.plans.Sketches) — one
    * hash per token in a tight loop; banded so LSH bucketing needs no
    * dynamic bit-shifts. Callers must Sketches.ensureRegistered first.
    */
  def simhashBands(toks: Column): Column =
    call_function("graft_simhash_bands", toks)

  /** Intra-document repetition ratio over word n-gram shingles:
    * 1 - distinct/total — the Gopher-style quality signal (repeated
    * boilerplate lines/templates score high). Pure HOF projection, narrow.
    */
  /** Row-level repetition ratio. Note for corpus-scale scans: this spells
    * `array_distinct` on a string array, which is a quadratic pairwise
    * scan per row — fine as a per-row gate on bounded docs, but a corpus
    * profiling pass should use the relational spelling instead (explode →
    * per-(doc, shingle) count → per-doc count, see the tx_repetition
    * catalog entry): two map-side-combined hash aggregates, linear work,
    * and it parallelizes across the cluster instead of within a row.
    */
  def repetitionRatio(text: Column, n: Int = 2): Column = {
    val sh = wordShingles(tokens(text), n)
    lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh)
  }

  /** Exact Jaccard of two shingle arrays (arrays treated as sets). */
  def exactJaccard(aShingles: Column, bShingles: Column): Column = {
    val inter = size(array_intersect(aShingles, bShingles)).cast("double")
    val uni = size(array_union(aShingles, bShingles))
    when(uni =!= 0, inter / uni)
  }

  /** Document fingerprint: min of rolling 8-character-window md5 hashes
    * (winnowing with a single global window — robust to small edits at
    * either end; character windows so SQL substr replays the slices).
    * Custom expression; callers must Sketches.ensureRegistered first.
    */
  def fingerprint64(c: Column): Column =
    call_function("graft_fingerprint64", c)

  /** Unicode NFC normalization (UAX #15 canonical composition) — custom
    * expression (graft.plans.Sketches.NfcNormalize, JDK Normalizer);
    * callers must Sketches.ensureRegistered first. DuckDB's
    * `nfc_normalize` is the oracle-side twin.
    */
  def nfcNormalize(c: Column): Column =
    call_function("graft_nfc", c)

  /** The invisible-codepoint class every corpus prep strips AFTER NFC:
    * zero-width space/non-joiner/joiner, word joiner, BOM/zero-width
    * no-break space, and soft hyphen. Kept as one shared character-class
    * pattern so the Spark regexp_replace and the DuckDB oracle strip the
    * identical set (both regex engines treat these as literal class
    * members).
    */
  val InvisibleClass: String =
    "[\u200B\u200C\u200D\u2060\uFEFF\u00AD]"

  /** Strip invisible codepoints (see [[InvisibleClass]]). Run after NFC
    * so audit counts measure post-composition codepoints.
    */
  def stripInvisible(c: Column): Column =
    regexp_replace(c, InvisibleClass, "")

  /** All `window`-token rolling window hashes of a token array (h60 per
    * window, window order preserved; short docs get one whole-doc window)
    * — the signature stage of substring-level duplicate-span detection
    * (see Dedup.spanOverlapStats). Custom expression; callers must
    * Sketches.ensureRegistered first.
    */
  def rollingWindowHashes(toks: Column, window: Int): Column =
    call_function("graft_rolling_hashes", toks, lit(window))

  // --- language ID (n-gram/stopword heuristic) --------------------------
  val stopEn: Seq[String] = Seq("the", "a", "an", "and", "of", "to", "in", "is", "on", "for", "it", "that")
  val stopDe: Seq[String] = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "von")
  val stopEs: Seq[String] = Seq("el", "los", "las", "es", "y", "un", "una", "por", "con", "para")
  val stopFr: Seq[String] = Seq("le", "les", "et", "est", "dans", "une", "pour", "avec", "sur", "pas")

  def hasCjk(c: Column): Column = c.rlike("[\\u4e00-\\u9fff]")

  /** Argmax over per-language stopword scores, CJK short-circuit, fixed
    * tie-break order en > de > es > fr.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val en = dictHits(toks, stopEn); val de = dictHits(toks, stopDe)
    val es = dictHits(toks, stopEs); val fr = dictHits(toks, stopFr)
    when(hasCjk(text), "zh")
      .when(en >= greatest(de, es, fr), "en")
      .when(de >= greatest(es, fr), "de")
      .when(es >= fr, "es")
      .otherwise("fr")
  }

  /** Composite quality score in [0,1]: length signal, stopword signal,
    * mean-token-length sanity band. Linear arithmetic only (no exp/log) so
    * any oracle can reproduce it bit-for-bit.
    */
  def qualityScore(nTokens: Column, stopRatio: Column, avgTokLen: Column): Column = {
    val lenSignal = least(lit(1.0), nTokens.cast("double") / 50.0)
    val stopSignal = least(lit(1.0), stopRatio * 5.0)
    val shapeSignal = when(avgTokLen >= 2.0 && avgTokLen <= 12.0, 1.0).otherwise(0.3)
    lenSignal * 0.4 + stopSignal * 0.3 + shapeSignal * 0.3
  }

  // --- Gopher-style document quality gates ------------------------------
  // The published Gopher/MassiveText filter thresholds (Rae et al. 2021,
  // §A1.1): word count in [minWords, maxWords], mean word length in
  // [3, 10], and at least `minStopwords` stopword occurrences. All pure
  // integer/double arithmetic over whitespace tokens — oracle-exact.

  def meanWordLen(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)
      .cast("double") / size(toks)

  /** The keep/drop decision plus its component metrics (returned together
    * so a pipeline can both filter and audit why documents dropped).
    */
  def gopherKeep(
      text: Column,
      minWords: Int = 50,
      maxWords: Int = 100000,
      minStopwords: Int = 2,
      stopwords: Seq[String] = Seq("the", "a", "and", "of", "to", "in")): Column = {
    val toks = tokens(text)
    val n = size(toks)
    val mwl = meanWordLen(toks)
    val stops = dictHits(toks, stopwords)
    struct(
      n.as("n_words"),
      mwl.as("mean_word_len"),
      stops.as("n_stopwords"),
      (n >= minWords && n <= maxWords &&
        mwl >= 3.0 && mwl <= 10.0 && stops >= minStopwords).as("keep"))
  }

  // --- C4-style line rules ----------------------------------------------
  // C4's line-level cleanup (Raffel et al. 2020, §2.2): keep lines that
  // end in terminal punctuation and have at least `minLineWords` words;
  // drop the document if it has fewer than `minLines` retained lines or
  // mentions code/boilerplate markers. Line-granular, so only meaningful
  // for corpora with newline structure — planted-fixture specs cover it
  // (the synthetic catalog corpus is single-line).

  def lines(text: Column): Column =
    filter(transform(split(text, "\n"), l => trim(l)), l => l =!= "")

  def c4KeptLines(text: Column, minLineWords: Int = 3): Column =
    filter(lines(text), l =>
      l.rlike("[.!?\"']$") && size(filter(split(l, "\\s+"), t => t =!= "")) >= minLineWords)

  /** Document-level C4 decision: retained text + audit counts. */
  def c4LineFilter(text: Column, minLineWords: Int = 3, minLines: Int = 3): Column = {
    val kept = c4KeptLines(text, minLineWords)
    val bad = lower(text).contains("lorem ipsum") || text.contains("{")
    struct(
      concat_ws("\n", kept).as("kept_text"),
      size(lines(text)).as("n_lines"),
      size(kept).as("n_lines_kept"),
      (!bad && size(kept) >= minLines).as("keep"))
  }

  // --- PII redaction ----------------------------------------------------
  // Publishable-corpus hygiene: replace emails, IPv4 addresses and
  // NANP-style phone numbers with typed placeholder tokens. The patterns
  // are deliberately RE2-compatible (no lookarounds, no backrefs) so the
  // same regex runs in Spark (java.util.regex), DuckDB/RE2 oracles, and
  // stream processors.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val PhoneRe = "\\b\\d{3}-\\d{4}\\b"

  /** Redact in fixed order (emails first: an address contains dots that
    * the IP pattern must not see half-redacted).
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")

  def piiCounts(text: Column): Column =
    struct(
      regexp_count(text, lit(EmailRe)).as("n_emails"),
      regexp_count(text, lit(Ipv4Re)).as("n_ips"),
      regexp_count(text, lit(PhoneRe)).as("n_phones"))

  // --- URL canonicalization ---------------------------------------------

  /** Crawl-dedup URL identity: lowercase scheme and host, strip a default
    * :80 port, strip trailing slashes from the path, sort query parameters
    * and drop the fragment — so cosmetic variants of one resource hash to
    * one canonical string. Pure string/array expressions (regexp_extract /
    * sort_array), RE2-compatible patterns, codegen'd, no shuffle; the
    * downstream dedup is a plain groupBy(canonical).
    */
  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val host = regexp_replace(
      lower(regexp_extract(url, "^[A-Za-z]+://([^/?#]+)", 1)), ":80$", "")
    val path = regexp_replace(
      regexp_extract(url, "^[A-Za-z]+://[^/?#]+([^?#]*)", 1), "/+$", "")
    val sortedQuery = array_join(
      sort_array(filter(split(regexp_extract(url, "\\?([^#]*)", 1), "&"), p => p =!= "")),
      "&")
    concat(scheme, lit("://"), host, path,
      when(sortedQuery =!= "", concat(lit("?"), sortedQuery)).otherwise(lit("")))
  }
}
