package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.{CorpusPrep, Dedup}

/** OPT-IN 100× scale probe (VERDICT r8 #7): the 10× probes in
  * [[ScaleProbeSpec]] bound the per-decade growth; this pushes the two
  * end-to-end composites across a full 100× span — `sm_corpus_prep`
  * (gate → exact-dedup → global shuffle → shard) at 50k → 5M synthetic
  * docs and `dd_corpus_dedup` (minhash LSH → verify → connected
  * components → keep-best) at 20k → 2M — asserting at-or-below-linear
  * growth (ratio ≤ 250 for 100× data, the same 2.5× contention slack the
  * 10× gate uses) and an unchanged exchange count, with planted-dup
  * recall held at the documented floor at 2M docs.
  *
  * Opt-in because the 2M-doc dedup run is minutes of real compute:
  * `SPARK_GRAFT_SCALE100=1 sbt "testOnly graft.Scale100Spec"`. Measured
  * numbers are recorded in BASELINE.md ("100× scale probe").
  */
class Scale100Spec extends SparkTestBase {

  private def optIn(): Unit =
    if (!sys.env.get("SPARK_GRAFT_SCALE100").contains("1"))
      cancel("opt-in: set SPARK_GRAFT_SCALE100=1 (minutes of compute)")

  // same generator family as ScaleProbeSpec: hash-derived unique vocab,
  // 3% planted exact copies, 3% planted near-copies
  private def syntheticDocs(n: Long): DataFrame = {
    val base = spark.range(n).select(
      col("id").as("doc_id"),
      array_join(
        transform(sequence(lit(1), lit(40)),
          k => substring(md5(concat_ws("-", col("id"), k)), 1, 6)),
        " ").as("text"))
    val exact = base.filter(pmod(col("doc_id"), lit(100)) < 3)
      .select((col("doc_id") + lit(1L << 40)).as("doc_id"), col("text"))
    val near = base
      .filter(pmod(col("doc_id"), lit(100)).between(50, 52))
      .select((col("doc_id") + lit(1L << 41)).as("doc_id"),
        concat(col("text"), lit(" zzextra")).as("text"))
    base.unionByName(exact).unionByName(near)
  }

  private def timed(f: => Long): (Long, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  private def exchanges(df: DataFrame): Int =
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).size

  test("sm_corpus_prep: 100x docs within linear time, same exchange count") {
    optIn()
    val n = 50000L
    def prep(m: Long): DataFrame =
      CorpusPrep.prepare(syntheticDocs(m), "doc_id", "text",
        minTokens = 1, maxTokens = 1000, rowsPerShard = 4096)
    def run(m: Long): (Long, Double) = timed(prep(m).count())
    run(n) // warm
    val (rowsSmall, tSmall) = run(n)
    val (rowsBig, tBig) = run(n * 100)
    assert(rowsSmall == n + (n * 3) / 100)
    assert(rowsBig == n * 100 + (n * 100 * 3) / 100)
    assert(exchanges(prep(n)) == exchanges(prep(n * 100)),
      "corpus-prep plan changed shape at 100x")
    val ratio = tBig / math.max(tSmall, 0.3)
    info(f"sm_corpus_prep 100x: small=$tSmall%.1fs big=$tBig%.1fs ratio=$ratio%.1fx")
    assert(ratio <= 250.0, f"grew $ratio%.1fx on 100x data (linear = 100x)")
  }

  test("dd_corpus_dedup: 100x docs within linear time, recall floor holds at 2M") {
    optIn()
    val n = 20000L
    def run(m: Long): (Long, Double) =
      timed(Dedup.dedupCorpus(syntheticDocs(m), "doc_id", "text").count())
    run(n) // warm
    val (rowsSmall, tSmall) = run(n)
    val (rowsBig, tBig) = run(n * 100)
    def checkRecall(m: Long, survivors: Long): Unit = {
      val planted = (m * 3) / 100 * 2
      val removed = (m + planted) - survivors
      val recall = removed.toDouble / planted
      info(f"dd_corpus_dedup n=$m: planted=$planted removed=$removed recall=$recall%.4f")
      assert(recall >= 0.99, f"planted-dup recall $recall%.4f < 0.99 at n=$m")
      assert(survivors >= m, "dedup must never remove non-duplicates")
    }
    checkRecall(n, rowsSmall)
    checkRecall(n * 100, rowsBig)
    val ratio = tBig / math.max(tSmall, 0.3)
    info(f"dd_corpus_dedup 100x: small=$tSmall%.1fs big=$tBig%.1fs ratio=$ratio%.1fx")
    assert(ratio <= 250.0, f"grew $ratio%.1fx on 100x data (linear = 100x)")
  }
}
