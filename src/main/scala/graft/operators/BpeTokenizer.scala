package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** In-engine BPE (byte-pair-encoding) tokenizer TRAINING and application —
  * the real version of what `TextFns.bpeTokenEstimate` approximates.
  *
  * Algorithm (Sennrich et al., arXiv:1508.07909): start from characters,
  * repeatedly merge the most frequent adjacent symbol pair (greedy
  * LEFTMOST occurrence within each word, ties to the lexicographically
  * smallest pair). The distributed shape is the important part:
  *
  *  - training state is the WORD-FREQUENCY table, not the corpus — one
  *    corpus-wide tokenize+count shuffle, then every Lloyd-style merge
  *    round runs on a bounded vocabulary (topWords × ≤maxWordLen symbol
  *    rows). At 100 TB the corpus pass is the only big job; training cost
  *    is corpus-size-INDEPENDENT.
  *  - each merge round is pure relational algebra (lead/row_number/min
  *    windows partitioned by word — the gaps-and-islands trick below), so
  *    a SQL oracle replays every round verbatim; the only driver action
  *    per round is collecting the ONE top-pair row (the kmeans-codebook
  *    pattern).
  *
  * Greedy leftmost semantics, relationally: candidate positions are i
  * with (sym_i, sym_{i+1}) = (L, R). Overlapping candidates (only
  * possible when L = R, e.g. "aaaa") form runs of consecutive positions;
  * within each run exactly the even offsets merge (aaaa → aa,aa — what a
  * sequential left-to-right scan does). Runs = islands by
  * `pos − row_number() among candidates`; merged = even offset from the
  * island's min pos; the row after a merged row is consumed.
  */
object BpeTokenizer {

  final case class Merge(step: Int, left_sym: String, right_sym: String, cnt: Long)

  /** Lowercased purely-alphabetic words (length ≤ maxWordLen) with corpus
    * frequencies, capped to the topWords most frequent (ties to the
    * lexicographically smaller word) — the bounded training vocabulary.
    */
  def wordFrequencies(
      docs: DataFrame,
      text: String,
      maxWordLen: Int,
      topWords: Int): DataFrame =
    docs
      .select(explode(filter(split(lower(trim(col(text))), "\\s+"),
        w => w.rlike("^[a-z]+$") && length(w) <= maxWordLen)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("word"))
      .limit(topWords)

  /** Explode words to the initial per-character symbol state: every input
    * column survives, plus pos (1-based) and sym. posexplode carries the
    * character index — no window, no ordering assumption.
    */
  def charState(words: DataFrame): DataFrame =
    words
      .select(words.columns.map(col) :+ posexplode(transform(
        sequence(lit(1), length(col("word"))),
        i => col("word").substr(i, lit(1)))).as(Seq("p0", "sym")): _*)
      .withColumn("pos", col("p0") + 1)
      .drop("p0")

  /** One greedy-leftmost merge of (l, r) applied to a symbol state.
    * Pure window algebra — the exact relational form the SQL oracle
    * replays (see the scaladoc island argument). `keyCols` scope the
    * per-sequence windows: Seq("word") for vocabulary training,
    * Seq("doc_id","widx") for per-document encoding.
    */
  def applyMerge(st: DataFrame, keyCols: Seq[String], l: String, r: String): DataFrame = {
    val part = keyCols.map(col)
    val wp = Window.partitionBy(part: _*).orderBy(col("pos"))
    val carried = st.columns.filterNot(c => c == "pos" || c == "sym").map(col).toSeq
    st
      .withColumn("nxt", lead(col("sym"), 1).over(wp))
      .withColumn("iscand", col("sym") === l && col("nxt") === r)
      .withColumn("island", when(col("iscand"),
        col("pos") - row_number().over(
          Window.partitionBy(part :+ col("iscand"): _*).orderBy(col("pos")))))
      .withColumn("merged", col("iscand") &&
        ((col("pos") - min(col("pos")).over(
          Window.partitionBy(part :+ col("island"): _*))) % 2 === 0))
      .withColumn("prevm", coalesce(lag(col("merged"), 1).over(wp), lit(false)))
      .filter(!col("prevm"))
      .withColumn("sym", when(col("merged"), concat(col("sym"), col("nxt"))).otherwise(col("sym")))
      .withColumn("pos", row_number().over(wp))
      .select(carried :+ col("pos") :+ col("sym"): _*)
  }

  /** Train `nMerges` BPE merges over a word-frequency table. Returns the
    * merge table (step, left_sym, right_sym, cnt) — `cnt` is the pair's
    * frequency-weighted count at the time it was chosen.
    *
    * The training state is BOUNDED BY CONSTRUCTION (topWords vocabulary
    * rows, ≤ maxWordLen symbols each — [[wordFrequencies]] caps it before
    * this is called), so the merge loop runs driver-side over the collected
    * vocabulary: per round it is O(|vocab|·len) string work — microseconds —
    * where the r14 distributed spelling paid 3 window exchanges + a top-1
    * job PER ROUND just to move ≤6k tiny rows around (measured r15:
    * tx_bpe_train 3.30 s → 0.58 s steady). The corpus-wide tokenize+count
    * shuffle in [[wordFrequencies]] stays distributed — at 100 TB that scan
    * is the only data-sized job, and its output is the same bounded table.
    * This is the kmeans-codebook / ToyData pattern: a ≤topWords collect, not
    * a data-sized one. Semantics are unchanged (greedy LEFTMOST merge,
    * ties to the lexicographically smallest pair; same overlapping-pair
    * counting) — BpeSpec's relational-parity test proves round-for-round
    * equality against the [[applyMerge]] window spelling, and the DuckDB
    * oracle replays all rounds independently.
    */
  def train(spark: SparkSession, words: DataFrame, nMerges: Int): Seq[Merge] = {
    require(nMerges >= 1, "nMerges >= 1")
    // bounded collect: ≤ topWords rows (the vocabulary table, not the corpus)
    val vocab: Array[(Array[String], Long)] = words.select("word", "freq").collect()
      .map(r => (r.getString(0).map(_.toString).toArray, r.getLong(1)))
    var state: Array[(Array[String], Long)] = vocab
    val merges = Seq.newBuilder[Merge]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      // pair counts over EVERY adjacent position (overlaps included — the
      // lead-window spelling counts "aaa" as two (a,a) positions)
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.foreach { case (syms, freq) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts.update(k, counts.getOrElse(k, 0L) + freq)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true // every word fully merged — done
      else {
        // ORDER BY cnt DESC, l, r LIMIT 1 — String.compareTo on the pure
        // a-z symbol alphabet matches Spark's UTF8String byte order
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        merges += Merge(step, l, r, c)
        // greedy leftmost application (the island algebra's sequential twin)
        state = state.map { case (syms, freq) =>
          val out = Array.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
              out += (syms(i) + syms(i + 1)); i += 2
            } else { out += syms(i); i += 1 }
          }
          (out.result(), freq)
        }
        step += 1
      }
    }
    merges.result()
  }

  /** Apply a learned merge list to per-document words: explode docs to
    * (doc_id, widx, word) for alphabetic words, run the same relational
    * merge round per learned step, and return per-doc BPE token counts —
    * alphabetic words contribute their final symbol count, every other
    * whitespace token counts as one (it would be byte-fallback tokens in
    * a production BPE; one is the stable lower bound and keeps the
    * count integer-exact).
    */
  def encodeCounts(
      docs: DataFrame,
      id: String,
      text: String,
      merges: Seq[Merge],
      maxWordLen: Int): DataFrame = {
    val toks = filter(split(lower(trim(col(text))), "\\s+"), w => w =!= "")
    val isBpe = (w: org.apache.spark.sql.Column) =>
      w.rlike("^[a-z]+$") && length(w) <= maxWordLen
    val base = docs.select(col(id), toks.as("toks"))
      .select(col(id),
        size(col("toks")).as("n_toks"),
        size(filter(col("toks"), isBpe)).as("n_alpha"),
        filter(col("toks"), isBpe).as("words"))
    val other = base.select(col(id), (col("n_toks") - col("n_alpha")).as("n_other"))
    val words = base
      .select(col(id), posexplode(col("words")).as(Seq("widx", "word")))
    // lazy checkpoints: each round's plan is cut to a leaf immediately
    // (bounded Catalyst trees), but NOTHING runs until the caller's one
    // action — the whole 12-round encode chain executes as a single job
    // instead of one materialization job per round
    var st = charState(words).localCheckpoint(false)
    merges.foreach { m =>
      st = applyMerge(st, Seq(id, "widx"), m.left_sym, m.right_sym).localCheckpoint(false)
    }
    val bpeCounts = st.groupBy(col(id)).agg(count(lit(1)).as("n_bpe_sym"))
    other
      .join(bpeCounts, Seq(id), "left")
      .select(col(id),
        (coalesce(col("n_bpe_sym"), lit(0L)) + col("n_other")).as("n_bpe_tokens"))
  }
}
