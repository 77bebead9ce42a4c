package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{TextFns, VectorFns}

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: every variant turns the O(N²) pair problem into
  * (1) a per-row signature (narrow, codegen'd),
  * (2) a bucket join that only shuffles candidate pairs,
  * (3) exact verification on the candidates only.
  * That is the shape that survives 100 TB — the only shuffle keys are
  * bucket ids, and skewed buckets (boilerplate text) can be salted or
  * capped without touching the rest of the plan.
  */
object Dedup {

  /** Exact dedup by normalized-text hash: every row keeps its content hash
    * and the canonical (minimum) id of its duplicate class.
    */
  def exactDedup(df: DataFrame, id: String, text: String): DataFrame = {
    val h = md5(lower(trim(col(text))))
    val w = Window.partitionBy(col("text_hash"))
    df.withColumn("text_hash", h)
      .withColumn("canonical_id", min(col(id)).over(w))
      .withColumn("is_dup", col(id) =!= col("canonical_id"))
  }

  /** MinHash + LSH candidate pairs with estimated Jaccard.
    *
    * signature -> split into `bands` bands of `numHashes/bands` rows ->
    * explode (band, bucketHash) -> self-join on equality -> distinct pairs.
    * Two docs surface iff they agree on at least one full band; with
    * (H=64, b=8) the match curve has its sweet spot near j ≈ 0.77.
    */
  /** @param maxBucketSize when > 0, (band, bucket) groups larger than this
    *        are dropped before the self-join. A bucket of size s yields
    *        s²/2 candidate pairs — one boilerplate bucket (repeated
    *        headers, license blocks) can dominate the whole join at corpus
    *        scale. Oversized buckets are near-certain boilerplate clusters;
    *        the exact-dedup pass already catches their identical members,
    *        and capping bounds the worst reducer at cap²/2 pairs.
    */
  /** Banded MinHash working frame (id, __sig, band, bucket) — the shared
    * index shape for self-join dedup ([[minhashLshPairs]]) and cross-table
    * incremental dedup ([[incrementalNearDupPairs]]).
    */
  private def bandedMinhash(
      df: DataFrame,
      id: String,
      text: String,
      shingleSize: Int,
      numHashes: Int,
      bands: Int,
      maxBucketSize: Int): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    // the id column survives into the banded working frame alongside the
    // fixed internal names — an id actually called one of them would be
    // silently clobbered by withColumn
    require(!Set("__toks", "__sig", "__bsz", "band", "bucket").contains(id),
      s"id column '$id' collides with an internal working column name")
    graft.plans.Sketches.ensureRegistered(df.sparkSession)
    val rowsPerBand = numHashes / bands
    val base = df
      .select(col(id), TextFns.tokens(col(text)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .withColumn("__sig", TextFns.minhashSignature(col("__toks"), shingleSize, numHashes))
      .select(col(id), col("__sig"))
    // bucket = md5 hex of "band,slot,slot,..." — an engine-portable join
    // key (DuckDB replays the identical string and md5), unlike the
    // previous xxhash64(band, slice) which no oracle could recompute
    var banded = base
      .withColumn("band", explode(sequence(lit(0), lit(bands - 1))))
      .withColumn("bucket",
        md5(concat_ws(",",
          col("band").cast("string"),
          array_join(transform(
            slice(col("__sig"), col("band") * rowsPerBand + 1, lit(rowsPerBand)),
            v => v.cast("string")), ","))))
    if (maxBucketSize > 0) {
      val w = Window.partitionBy(col("band"), col("bucket"))
      banded = banded
        .withColumn("__bsz", count(lit(1)).over(w))
        .filter(col("__bsz") <= maxBucketSize)
        .drop("__bsz")
    }
    banded
  }

  def minhashLshPairs(
      df: DataFrame,
      id: String,
      text: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 8,
      maxBucketSize: Int = 0): DataFrame = {
    val banded = bandedMinhash(df, id, text, shingleSize, numHashes, bands, maxBucketSize)
    val a = banded.select(col(id).as("id_a"), col("__sig").as("sig_a"), col("band"), col("bucket"))
    val b = banded.select(col(id).as("id_b"), col("__sig").as("sig_b"), col("band"), col("bucket"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        TextFns.minhashJaccard(col("sig_a"), col("sig_b")).as("est_jaccard"))
      .groupBy("id_a", "id_b")
      // est_jaccard identical for every band a pair collides in — max == the value
      .agg(max(col("est_jaccard")).as("est_jaccard"))
  }

  /** SimHash per document (banded) plus candidate pairs sharing >= 1 band
    * (Hamming distance <= 45 of 60 bits guaranteed for surfaced pairs;
    * verify with exact distance downstream if tighter radius needed).
    */
  def simhashPairs(df: DataFrame, id: String, text: String): DataFrame = {
    graft.plans.Sketches.ensureRegistered(df.sparkSession)
    val sig = df
      .select(col(id), col(text))
      .withColumn("__bands", TextFns.simhashBands(TextFns.tokens(col(text))))
      .select(col(id), col("__bands"))
    val banded = sig
      .withColumn("band", explode(sequence(lit(0), lit(3))))
      .withColumn("band_val", element_at(col("__bands"), col("band") + 1))
    val a = banded.select(col(id).as("id_a"), col("band"), col("band_val"))
    val b = banded.select(col(id).as("id_b"), col("band"), col("band_val"))
    a.join(b, Seq("band", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact n-gram Jaccard over candidate pairs (candidates from LSH;
    * exact verification only touches the candidate set).
    */
  def ngramJaccardVerify(
      df: DataFrame,
      pairs: DataFrame,
      id: String,
      text: String,
      shingleSize: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    // compute shingle arrays only for docs that appear in a candidate pair
    // — the expensive HOF projection runs on the candidate subset, not N
    val candidateIds = pairs.select(col("id_a").as(id))
      .union(pairs.select(col("id_b").as(id))).distinct()
    val sh = df.join(candidateIds, Seq(id), "left_semi")
      .select(col(id),
        array_distinct(TextFns.wordShingles(TextFns.tokens(col(text)), shingleSize)).as("__sh"))
    val a = sh.select(col(id).as("id_a"), col("__sh").as("sh_a"))
    val b = sh.select(col(id).as("id_b"), col("__sh").as("sh_b"))
    pairs
      .join(a, "id_a").join(b, "id_b")
      .withColumn("jaccard", TextFns.exactJaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Collapse candidate duplicate PAIRS into clusters: every document gets
    * the minimum reachable id as `canonical_id` (connected components by
    * label propagation). Bounded iterative joins with localCheckpoint to
    * cut lineage — the standard scale pattern when GraphX is unavailable
    * or overkill; duplicate chains in web corpora are shallow, so
    * `maxIter` label hops converge in practice (convergence is checked,
    * not assumed). The pointer-doubling hop gives O(log diameter)
    * rounds, same asymptotics as [[Graph.connectedComponents]]'s
    * alternating large-star/small-star — use that operator when the
    * input is a raw edge list rather than dedup pairs + an id universe
    * (it derives nodes from edge endpoints and needs no maxIter tuning).
    */
  def canonicalize(
      ids: DataFrame,
      pairs: DataFrame,
      id: String,
      // headroom is free (the loop exits the round after labels stop
      // changing, and one observation round is part of the count): 20
      // rounds of path halving cover any graph a dedup pass can produce,
      // while 10 was tight enough that a 30-node random graph needed 11
      // (min-label entry points matter, not just diameter — measured in
      // DifferentialSpec)
      maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
    var labels = ids.select(col(id), col(id).as("canonical_id")).localCheckpoint()
    var iter = 0
    var converged = false
    while (iter < maxIter && !converged) {
      val viaNeighbors = edges
        .join(labels.withColumnRenamed(id, "src")
          .withColumnRenamed("canonical_id", "neighbor_label"), Seq("src"))
        .select(col("dst").as(id), col("neighbor_label").as("canonical_id"))
      // checkpoint the neighbor-min phase: the doubling join below reads
      // it twice (probe + hop side) — without materialization the union+
      // aggregate would execute twice per iteration
      val next0 = labels.union(viaNeighbors)
        .groupBy(col(id)).agg(min(col("canonical_id")).as("canonical_id"))
        .localCheckpoint()
      // pointer doubling: also adopt the label OF my label (path halving).
      // Neighbor-min alone needs O(diameter) rounds — a 100-doc id chain
      // (the dd_cc_chain worst case) took the full iteration budget; with
      // the label-of-label hop the frontier doubles per round, so chains
      // converge in O(log diameter). Labels only ever decrease toward the
      // same min-reachable fixpoint, so the result is unchanged.
      val hop = next0.select(col(id).as("__l_id"), col("canonical_id").as("__l_lbl"))
      val next = next0
        .join(hop, next0("canonical_id") === hop("__l_id"), "left")
        .select(next0(id),
          least(next0("canonical_id"), coalesce(col("__l_lbl"), next0("canonical_id")))
            .as("canonical_id"))
        .localCheckpoint()
      val changed = next.withColumnRenamed("canonical_id", "new_label")
        .join(labels, Seq(id))
        .filter(col("new_label") =!= col("canonical_id")).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    // pointer doubling covers diameter 2^maxIter, so non-convergence means
    // a pathological graph (or too-small maxIter) — fail loudly rather
    // than return partial labels that would silently split a component
    require(converged,
      s"label propagation did not converge within $maxIter pointer-doubling " +
        s"rounds (graph diameter > ${1L << math.min(maxIter, 62)}); raise maxIter")
    labels.withColumn("is_dup", col(id) =!= col("canonical_id"))
  }

  /** End-to-end near-duplicate removal — the composite a corpus owner
    * actually runs: MinHash+LSH candidates → exact n-gram Jaccard verify
    * (candidates only) → connected-component canonicalization → keep one
    * document per cluster (the canonical id). Every stage is the
    * collision-bounded formulation above, so the whole chain never
    * materializes O(N²) work; output is the deduplicated corpus with the
    * original columns.
    */
  def dedupCorpus(
      df: DataFrame,
      id: String,
      text: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 8,
      minJaccard: Double = 0.7): DataFrame = {
    val candidates = minhashLshPairs(df, id, text, shingleSize, numHashes, bands)
    val verified = ngramJaccardVerify(df, candidates, id, text, shingleSize, minJaccard)
    val labels = canonicalize(df.select(id), verified, id)
    df.join(labels.filter(!col("is_dup")).select(id), Seq(id), "left_semi")
  }

  /** One survivor per duplicate cluster by an explicit quality policy:
    * highest `score` wins, ties resolved by `tie` ascending — the
    * production alternative to min-id survivors when duplicate copies
    * differ in quality (boilerplate-stripped vs raw, truncated vs full).
    * One window shuffle on the cluster key.
    */
  def keepBest(df: DataFrame, cluster: Seq[String], score: Column, tie: Seq[Column]): DataFrame = {
    val rn = graft.core.Cols.fresh(df, "__rn")
    val w = Window.partitionBy(graft.ops.Windows.keysOrConstant(cluster.map(col)): _*)
      .orderBy((score.desc +: tie.map(_.asc)): _*)
    df.withColumn(rn, row_number().over(w)).filter(col(rn) === 1).drop(rn)
  }

  /** Benchmark decontamination: flag corpus documents that share any word
    * `n`-gram with a benchmark/eval set (the standard pre-training hygiene
    * check — eval questions leaking into training data inflate scores).
    *
    * Shape: explode both sides to (id, shingle) pairs and equi-join on the
    * shingle string, so only shingle keys shuffle — never document text —
    * and the benchmark side (tiny by construction) broadcasts. Returns
    * (id, n_hits) for contaminated documents only; anti-join the corpus
    * against it to clean.
    */
  def contaminationFlags(
      docs: DataFrame,
      benchmark: DataFrame,
      id: String,
      text: String,
      n: Int = 8): DataFrame = {
    val docSh = docs.select(col(id),
      explode(array_distinct(TextFns.wordShingles(TextFns.tokens(col(text)), n))).as("__sh"))
    val benchSh = benchmark
      .select(explode(array_distinct(TextFns.wordShingles(TextFns.tokens(col(text)), n))).as("__sh"))
      .distinct()
    docSh.join(broadcast(benchSh), Seq("__sh"))
      .groupBy(col(id))
      // shingles are distinct per doc, so a plain count is the hit count
      .agg(count(lit(1)).as("n_hits"))
  }

  // ---- incremental (batch-vs-corpus) dedup ------------------------------
  // Continuous-ingest hygiene: a new batch must be checked against the
  // EXISTING corpus, not just against itself. Both paths below are
  // index-shaped — build the index over the corpus once (persist it in
  // production; it is append-only under ingestion), then every batch joins
  // against it, so per-batch cost scales with the batch, not the corpus.

  /** Exact-dedup index over a corpus: one row per distinct normalized-text
    * hash with the canonical (minimum) id holding it.
    */
  def exactIndex(corpus: DataFrame, id: String, text: String): DataFrame =
    corpus
      .select(md5(lower(trim(col(text)))).as("text_hash"), col(id))
      .groupBy("text_hash")
      .agg(min(col(id)).as("corpus_id"))

  /** Persist [[exactIndex]] as a hash-ordered parquet index with a
    * parquet BLOOM FILTER on `text_hash`: rows are range-partitioned and
    * sorted by the hash, so every file (and row group) covers a narrow
    * hash slice — a selective probe (`text_hash IN (batch hashes)`)
    * prunes by footer min/max to the touched slices, and the bloom
    * filter additionally short-circuits row groups for ABSENT hashes
    * (the common case when most arriving documents are novel) without
    * decoding any pages. At 10^9 index rows that is the difference
    * between touching megabytes and re-reading the whole index per
    * probe. Hash output is uniform, so the range layout is balanced by
    * construction. Read the saved index with `spark.read.parquet`.
    *
    * `expectedNdv` sizes the bloom bitmap PER ROW GROUP (the parquet
    * option's granularity), so set it to the distinct hashes per row
    * group — NOT the corpus total: oversizing it allocates the 1 MB
    * bitmap cap in every row group, which measured 22× the index's disk
    * footprint at fixture scale and made point probes read the bloated
    * bitmaps instead of skipping data (the default fits a 128 MB row
    * group of ~3M hash rows).
    */
  def saveExactIndex(
      corpus: DataFrame,
      id: String,
      text: String,
      path: String,
      nFiles: Int = 16,
      expectedNdv: Long = 4L * 1000 * 1000): Unit = {
    require(nFiles >= 1, "nFiles must be >= 1")
    exactIndex(corpus, id, text)
      .repartitionByRange(nFiles, col("text_hash"))
      .sortWithinPartitions("text_hash")
      .write.mode("overwrite")
      .option("parquet.bloom.filter.enabled#text_hash", "true")
      .option("parquet.bloom.filter.expected.ndv#text_hash", expectedNdv.toString)
      .parquet(path)
  }

  /** Flag batch documents whose normalized text already exists in the
    * corpus index ([[exactIndex]]): batch columns + `exact_dup_of` (the
    * corpus canonical id, null when novel) + `is_known`. One equi-join on
    * the 16-byte hash; the index side is (distinct-hash × 2 columns), which
    * broadcasts for any reasonably sized dictionary and otherwise
    * shuffle-joins on the hash.
    */
  def incrementalExactFlags(
      batch: DataFrame,
      index: DataFrame,
      id: String,
      text: String): DataFrame = {
    val reserved = Set("text_hash", "corpus_id", "exact_dup_of", "is_known")
      .intersect(batch.columns.toSet)
    require(reserved.isEmpty,
      s"batch columns collide with the output contract: ${reserved.mkString(", ")}")
    batch
      .withColumn("text_hash", md5(lower(trim(col(text)))))
      .join(index, Seq("text_hash"), "left")
      .withColumnRenamed("corpus_id", "exact_dup_of")
      .withColumn("is_known", col("exact_dup_of").isNotNull)
      .drop("text_hash")
  }

  /** Banded-MinHash index over a corpus, reusable across batches:
    * (corpus_id, sig_c, band, bucket). Persist/bucket by (band, bucket) in
    * production so batch probes co-locate.
    */
  def minhashIndex(
      corpus: DataFrame,
      id: String,
      text: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 8,
      maxBucketSize: Int = 0): DataFrame =
    bandedMinhash(corpus, id, text, shingleSize, numHashes, bands, maxBucketSize)
      .select(col(id).as("corpus_id"), col("__sig").as("sig_c"), col("band"), col("bucket"))

  /** Persist [[minhashIndex]] as a BUCKETED table on the join key
    * (band, bucket) — the production form of "persist the index". A
    * bucketed save pre-shuffles once at build time; every later probe
    * joins WITHOUT re-shuffling the corpus side (Spark aligns the batch
    * side to the table's bucketing instead), so per-batch cost is
    * shuffle(batch) + read(index), never shuffle(corpus). Pinned by
    * DedupSpec: the probe plan has exactly one Exchange, on the batch side.
    */
  def saveMinhashIndexBucketed(
      corpus: DataFrame,
      id: String,
      text: String,
      table: String,
      numBuckets: Int = 64,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 8,
      bloomNdv: Long = 100000): Unit = {
    val spark = corpus.sparkSession
    // the orphan cleanup below derives the managed-table path as
    // warehouse/<name>; a qualified name (db.tbl) or a non-default current
    // database would make that point at the WRONG directory and delete
    // unrelated data — refuse those outright rather than guess
    require(!table.contains("."),
      s"saveMinhashIndexBucketed takes an unqualified table name; got '$table'")
    require(spark.catalog.currentDatabase == "default",
      s"saveMinhashIndexBucketed persists to the default database; current is " +
        s"'${spark.catalog.currentDatabase}'")
    // a managed-table location can survive a previous JVM whose catalog is
    // gone (fresh in-memory catalog, stale warehouse dir) — overwrite mode
    // cannot recover from that (LOCATION_ALREADY_EXISTS), so clear the
    // orphaned directory first when the catalog does not know the table
    if (!spark.catalog.tableExists(table)) {
      val loc = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + "/" + table.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    minhashIndex(corpus, id, text, shingleSize, numHashes, bands)
      .write.mode("overwrite")
      .bucketBy(numBuckets, "band", "bucket")
      .sortBy("band", "bucket")
      // the sortBy already gives every row group a narrow (band, bucket)
      // range for min/max pruning; the parquet bloom filter on the
      // md5-string bucket adds point pruning for probes of ABSENT buckets
      // — at ingest, most batch buckets hit nothing, and skipping those
      // row groups without decoding pages is the read-side win. bloomNdv
      // sizes the bitmap PER ROW GROUP (see saveExactIndex's measurement:
      // oversizing allocates the 1 MB cap per row group and bloats the
      // index), so set it to distinct buckets per row group
      .option("parquet.bloom.filter.enabled#bucket", "true")
      .option("parquet.bloom.filter.expected.ndv#bucket", bloomNdv.toString)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Probe a bucketed index table saved by [[saveMinhashIndexBucketed]]. */
  def probeMinhashIndexBucketed(
      batch: DataFrame,
      table: String,
      id: String,
      text: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 8): DataFrame =
    incrementalNearDupPairs(batch, batch.sparkSession.table(table),
      id, text, shingleSize, numHashes, bands)

  /** Near-duplicate candidates of a new batch AGAINST a corpus index
    * ([[minhashIndex]]): (batch_id, corpus_id, est_jaccard). Cross-table
    * analogue of [[minhashLshPairs]] — the equi-join key is (band, bucket),
    * so only colliding buckets shuffle; batch rows never compare to the
    * corpus at large. Verify survivors with [[ngramJaccardVerify]]-style
    * exact Jaccard if the estimate is not enough.
    */
  def incrementalNearDupPairs(
      batch: DataFrame,
      index: DataFrame,
      id: String,
      text: String,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 8,
      maxBucketSize: Int = 0): DataFrame = {
    val b = bandedMinhash(batch, id, text, shingleSize, numHashes, bands, maxBucketSize)
      .select(col(id).as("batch_id"), col("__sig").as("sig_b"), col("band"), col("bucket"))
    b.join(index, Seq("band", "bucket"))
      .select(col("batch_id"), col("corpus_id"),
        TextFns.minhashJaccard(col("sig_b"), col("sig_c")).as("est_jaccard"))
      .groupBy("batch_id", "corpus_id")
      .agg(max(col("est_jaccard")).as("est_jaccard"))
  }

  /** Embedding near-duplicate pairs: sign-bit LSH blocks, then exact cosine
    * inside each block — never an all-pairs crossJoin.
    *
    * OR-amplified across `nTables` independent hash tables (each table =
    * `nPlanes` seeded hyperplanes): a pair is a candidate if it collides in
    * ANY table, so recall at a given cosine is 1-(1-p^nPlanes)^nTables
    * instead of a single table's p^nPlanes. The join key is (table, bucket),
    * so candidate generation remains a bucketed equi-join — rows fan out
    * ×nTables (cheap int columns), candidate pairs stay collision-bounded.
    * Same band/bucket shape as the MinHash LSH above.
    */
  /** The candidate stage of [[embeddingNearDupPairs]], exposed so the
    * eval entry (dd_embed_eval) can count blocking work: every (id_a <
    * id_b) pair colliding in ≥ 1 sign-LSH table bucket. Candidate
    * generation is id-only — the (id, table, bucket) rows are three
    * narrow columns, so the ×nTables fan-out and the bucket self-join
    * shuffle cheap rows, never the vectors.
    */
  def embeddingCandidatePairs(
      df: DataFrame,
      id: String,
      vec: String,
      nPlanes: Int = 8,
      dim: Int = 64,
      nTables: Int = 1): DataFrame = {
    require(nTables >= 1, "nTables must be >= 1")
    graft.plans.Sketches.ensureRegistered(df.sparkSession)
    val tables = (0 until nTables).map { t =>
      Similarity.lcgPlanes(t, nPlanes, dim)
    }
    val withBucket = df.select(col(id), col(vec))
      .withColumn("tb", explode(array(tables.zipWithIndex.map { case (planes, t) =>
        struct(lit(t).as("table"), VectorFns.hyperplaneBucket(col(vec), planes).as("bucket"))
      }: _*)))
      .select(col(id), col("tb.table").as("table"), col("tb.bucket").as("bucket"))
    val a = withBucket.select(col(id).as("id_a"), col("table"), col("bucket"))
    val b = withBucket.select(col(id).as("id_b"), col("table"), col("bucket"))
    a.join(b, Seq("table", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct() // score each unique pair ONCE, however many tables it collides in
  }

  def embeddingNearDupPairs(
      df: DataFrame,
      id: String,
      vec: String,
      minCosine: Double = 0.95,
      nPlanes: Int = 8,
      dim: Int = 64,
      nTables: Int = 1): DataFrame = {
    val candidates = embeddingCandidatePairs(df, id, vec, nPlanes, dim, nTables)
    // pre-normalize once per row so the pair score is a single dot product
    // (cosine(a,b) = dot(a/|a|, b/|b|)) instead of three dots + sqrt per pair
    val unit = df.select(col(id), VectorFns.unit(col(vec)).as("__unit"))
    candidates
      .join(unit.select(col(id).as("id_a"), col("__unit").as("unit_a")), Seq("id_a"))
      .join(unit.select(col(id).as("id_b"), col("__unit").as("unit_b")), Seq("id_b"))
      .withColumn("cosine", VectorFns.dot(col("unit_a"), col("unit_b")))
      .filter(col("cosine") >= minCosine)
      .select("id_a", "id_b", "cosine")
  }

  /** Substring-level duplicate-span statistics (Lee et al.,
    * arXiv:2107.06499 "Deduplicating Training Data Makes Language Models
    * Better"): document-level near-dup passes miss documents that embed a
    * copied PASSAGE inside otherwise-novel text, so this scores every
    * `window`-token span instead. A span is duplicated when its rolling
    * window hash appears in more than one distinct document. Returns one
    * row per tokenizable document: (id, total_windows, dup_windows,
    * dup_ratio) — the per-document span-duplication profile a corpus
    * owner thresholds on (and the span hashes themselves are the input a
    * span-CUTTING pass would join back to).
    *
    * Scale shape: the window hashes are one narrow custom-expression
    * projection (one md5 per window, graft.plans.Sketches); the shared-
    * hash dictionary is a hash aggregate on the 8-byte hash key over
    * per-document-DISTINCT hashes (a doc repeating its own span is not
    * cross-document duplication); the flag join keys on the same hash, so
    * AQE broadcasts the dictionary when it is small (boilerplate-bounded)
    * and falls back to a co-partitioned shuffle join when it is not —
    * never O(N²), and document text never shuffles (only 8-byte hashes).
    */
  def spanOverlapStats(
      df: DataFrame,
      id: String,
      text: String,
      window: Int = 16): DataFrame = {
    graft.plans.Sketches.ensureRegistered(df.sparkSession)
    val wh = df
      .select(col(id), TextFns.tokens(col(text)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(id), explode(TextFns.rollingWindowHashes(col("__toks"), window)).as("__h"))
    val shared = wh.select(col(id), col("__h")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__ndocs"))
      .filter(col("__ndocs") > 1)
      .select(col("__h"), lit(1).as("__dup"))
    wh.join(shared, Seq("__h"), "left")
      .groupBy(col(id))
      .agg(
        count(lit(1)).as("total_windows"),
        sum(when(col("__dup").isNotNull, 1L).otherwise(0L)).as("dup_windows"))
      .withColumn("dup_ratio",
        col("dup_windows").cast("double") / col("total_windows"))
  }

  /** Merge each document's duplicated windows into MAXIMAL shared spans
    * (Lee et al., arXiv:2107.06499 — the substring the paper actually
    * removes is the maximal duplicated span, not the ×window fan of
    * 16-token fragments [[spanOverlapStats]] counts): a window is
    * duplicated when its hash appears in >1 distinct document; the token
    * intervals [pos, pos+window−1] of a document's duplicated windows
    * merge while they overlap or touch, yielding one row per maximal
    * span: (id, span_start, span_len, n_windows) with exact token
    * positions (span_start 0-based) and lengths (end clamped to the
    * document). A verbatim copy with a fresh tail reports ONE maximal
    * head span, not head-length − 15 windows.
    *
    * Coverage semantics: adjacent windows may be shared with different
    * partners; the merged span is the contiguous duplicated REGION (what
    * a cutting pass would remove), not a single-source match.
    *
    * Scale shape: same skeleton as the profile (narrow window-hash
    * projection, 8-byte-hash dictionary, hash-keyed dup join — text
    * never shuffles); the merge is gaps-and-islands — a lag + running
    * sum over ONE doc-keyed window (positions within a doc are unique,
    * so the order is total) — and a final (doc, island) aggregate over
    * duplicated windows only.
    */
  def mergeDuplicateSpans(
      df: DataFrame,
      id: String,
      text: String,
      window: Int = 16): DataFrame = {
    graft.plans.Sketches.ensureRegistered(df.sparkSession)
    import org.apache.spark.sql.expressions.Window
    val toks = df
      .select(col(id), TextFns.tokens(col(text)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .withColumn("__n", size(col("__toks")))
    val wh = toks.select(col(id), col("__n"),
      posexplode(TextFns.rollingWindowHashes(col("__toks"), window))
        .as(Seq("__pos", "__h")))
    val shared = wh.select(col(id), col("__h")).distinct()
      .groupBy("__h").agg(count(lit(1)).as("__ndocs"))
      .filter(col("__ndocs") > 1)
      .select(col("__h"))
    val dup = wh.join(shared, Seq("__h"))
    val byDoc = Window.partitionBy(col(id)).orderBy(col("__pos"))
    // islands: a window starts a new span when its interval no longer
    // overlaps or touches the previous one — pos > prev + window
    dup
      .withColumn("__brk",
        when(col("__pos") > lag(col("__pos"), 1).over(byDoc) + window, 1).otherwise(0))
      .withColumn("__isl", sum(col("__brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(id), col("__isl"))
      .agg(
        min(col("__pos")).cast("long").as("span_start"),
        (least(max(col("__pos")) + (window - 1), max(col("__n")) - 1)
          - min(col("__pos")) + 1).cast("long").as("span_len"),
        count(lit(1)).as("n_windows"))
      .select(col(id), col("span_start"), col("span_len"), col("n_windows"))
  }

  /** Cut cross-document duplicated SPANS out of every document — the
    * transform [[spanOverlapStats]] profiles (Lee et al., arXiv:2107.06499
    * remove repeated passages; removing only the extra COPIES is the
    * corpus-size-preserving variant): for every shared `window`-token
    * hash, the minimum doc id holding it is the OWNER and keeps its text;
    * every other document cuts all tokens covered by that window. Tokens
    * survive when no non-owned shared window covers them, and the cleaned
    * document is the surviving tokens in order, space-joined (token-level
    * rebuild — original inter-token whitespace is not preserved). Returns
    * (id, clean_text, n_tokens, n_cut) per tokenizable document; an exact
    * whole-document copy of an earlier document cleans to ''.
    *
    * Scale shape: same collision-bounded skeleton as the profile — window
    * hashes are one narrow expression projection; ownership is one min
    * aggregate on the 8-byte hash; the dup-window join keys on the same
    * hash; coverage fans out ×window but collapses immediately to
    * distinct (doc, token-index) pairs; the rebuild is one groupBy(id)
    * with an order-pinned array_sort. Document text never shuffles.
    */
  def cutDuplicateSpans(
      df: DataFrame,
      id: String,
      text: String,
      window: Int = 16): DataFrame = {
    graft.plans.Sketches.ensureRegistered(df.sparkSession)
    val toks = df
      .select(col(id), TextFns.tokens(col(text)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .withColumn("__n", size(col("__toks")))
    val wh = toks.select(col(id), col("__n"),
      posexplode(TextFns.rollingWindowHashes(col("__toks"), window))
        .as(Seq("__pos", "__h")))
    val owner = wh.groupBy("__h").agg(min(col(id)).as("__owner"))
    val dupWindows = wh.join(owner, Seq("__h")).filter(col("__owner") < col(id))
    // a window at __pos covers tokens [__pos, min(__pos + window - 1, n - 1)]
    // (the clamp only binds for the whole-doc window of short documents)
    val covered = dupWindows
      .select(col(id),
        explode(sequence(col("__pos"),
          least(col("__pos") + (window - 1), col("__n") - 1))).as("__t"))
      .distinct()
    val tokpos = toks.select(col(id), posexplode(col("__toks")).as(Seq("__t", "__tok")))
    val rebuilt = tokpos.join(covered, Seq(id, "__t"), "left_anti")
      .groupBy(col(id))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("__t"), col("__tok")))),
            s => s.getField("__tok")),
          " ").as("clean_text"),
        count(lit(1)).as("__kept"))
    toks.select(col(id), col("__n").cast("long").as("n_tokens"))
      .join(rebuilt, Seq(id), "left")
      .select(col(id),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        col("n_tokens"),
        (col("n_tokens") - coalesce(col("__kept"), lit(0L))).as("n_cut"))
  }

  /** Near-dup quality evaluation — the dedup twin of
    * [[graft.operators.Similarity.rankingMetrics]]: precision and recall
    * of the MinHash-LSH candidate generator ([[minhashLshPairs]]) against
    * the EXACT shingle-Jaccard ground truth at `minJaccard`, measured
    * inside the engine. This is how a corpus owner tunes bands/hashes
    * against a measured recall target instead of folklore.
    *
    * Ground truth is computed relationally, not all-pairs: per-document
    * DISTINCT shingle sets explode to (shingle, doc) and self-join on the
    * shingle, so only pairs sharing ≥ 1 shingle are scored (a pair with
    * no shared shingle has Jaccard 0 < any positive threshold) —
    * intersection counts come from the join, |union| = na + nb − inter.
    * Work is Σ df(shingle)² over shingle document frequencies, not N²;
    * it is still the EVAL path (run over a hash-sampled slice at 100 TB
    * — boilerplate shingles make df² explode on the open web), while the
    * banded LSH side stays the production path.
    *
    * Returns ONE row: (n_exact, n_candidates, n_hits, precision, recall)
    * — integer counts, one IEEE division each; precision/recall are null
    * when their denominator is 0 (no candidates / no true pairs).
    */
  def dedupEval(
      df: DataFrame,
      id: String,
      text: String,
      minJaccard: Double = 0.5,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bands: Int = 8): DataFrame = {
    // the share-a-shingle ground truth is exact only for positive
    // thresholds (a no-shared-shingle pair has Jaccard 0)
    require(minJaccard > 0, "dedupEval needs minJaccard > 0")
    graft.plans.Sketches.ensureRegistered(df.sparkSession)
    val cand = minhashLshPairs(df, id, text, shingleSize, numHashes, bands)
      .select("id_a", "id_b")
    val sh = df
      .select(col(id), TextFns.tokens(col(text)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(id),
        array_distinct(TextFns.wordShingles(col("__toks"), shingleSize)).as("__s"))
    val sizes = sh.select(col(id), size(col("__s")).as("__n"))
    val ex = sh.select(col(id), explode(col("__s")).as("__g"))
    val inter = ex.select(col(id).as("id_a"), col("__g"))
      .join(ex.select(col(id).as("id_b"), col("__g")), Seq("__g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__i"))
    val exact = inter
      .join(sizes.select(col(id).as("id_a"), col("__n").as("__na")), Seq("id_a"))
      .join(sizes.select(col(id).as("id_b"), col("__n").as("__nb")), Seq("id_b"))
      .filter(col("__i").cast("double")
        / (col("__na") + col("__nb") - col("__i")) >= minJaccard)
      .select("id_a", "id_b")
    val hits = cand.join(exact, Seq("id_a", "id_b"))
    cand.agg(count(lit(1)).as("n_candidates"))
      .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
      .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
      .select(
        col("n_exact"), col("n_candidates"), col("n_hits"),
        when(col("n_candidates") > 0,
          col("n_hits").cast("double") / col("n_candidates")).as("precision"),
        when(col("n_exact") > 0,
          col("n_hits").cast("double") / col("n_exact")).as("recall"))
  }

  /** The banding TUNING CURVE of [[dedupEval]]: precision and recall of
    * the MinHash-LSH candidate generator at each requested band count
    * (over the same `numHashes` signature — more bands = shorter band
    * rows = more permissive = recall up, precision down: the LSH S-curve
    * a corpus owner actually chooses an operating point on). The exact
    * ground truth is computed ONCE and shared across curve points
    * (identical subtree — Spark's ReuseExchange serves it once).
    * Returns one row per band count:
    * (bands, n_exact, n_candidates, n_hits, precision, recall).
    */
  def lshTuningCurve(
      df: DataFrame,
      id: String,
      text: String,
      minJaccard: Double = 0.5,
      shingleSize: Int = 3,
      numHashes: Int = 64,
      bandsList: Seq[Int] = Seq(4, 8, 16)): DataFrame = {
    require(minJaccard > 0, "lshTuningCurve needs minJaccard > 0")
    require(bandsList.nonEmpty, "need at least one band count")
    bandsList.foreach(b => require(b >= 1 && numHashes % b == 0,
      s"bands=$b must divide numHashes=$numHashes"))
    graft.plans.Sketches.ensureRegistered(df.sparkSession)
    val sh = df
      .select(col(id), TextFns.tokens(col(text)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col(id),
        array_distinct(TextFns.wordShingles(col("__toks"), shingleSize)).as("__s"))
    val sizes = sh.select(col(id), size(col("__s")).as("__n"))
    val ex = sh.select(col(id), explode(col("__s")).as("__g"))
    val inter = ex.select(col(id).as("id_a"), col("__g"))
      .join(ex.select(col(id).as("id_b"), col("__g")), Seq("__g"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("__i"))
    val exact = inter
      .join(sizes.select(col(id).as("id_a"), col("__n").as("__na")), Seq("id_a"))
      .join(sizes.select(col(id).as("id_b"), col("__n").as("__nb")), Seq("id_b"))
      .filter(col("__i").cast("double")
        / (col("__na") + col("__nb") - col("__i")) >= minJaccard)
      .select("id_a", "id_b")
    bandsList.map { b =>
      val cand = minhashLshPairs(df, id, text, shingleSize, numHashes, b)
        .select("id_a", "id_b")
      val hits = cand.join(exact, Seq("id_a", "id_b"))
      cand.agg(count(lit(1)).as("n_candidates"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
        .select(
          lit(b).as("bands"),
          col("n_exact"), col("n_candidates"), col("n_hits"),
          when(col("n_candidates") > 0,
            col("n_hits").cast("double") / col("n_candidates")).as("precision"),
          when(col("n_exact") > 0,
            col("n_hits").cast("double") / col("n_exact")).as("recall"))
    }.reduce(_.unionByName(_))
  }

  /** Content-defined chunking + cross-document chunk dedup — the
    * storage-dedup technique (Muthitacharoen et al., SOSP '01 LBFS;
    * FastCDC, USENIX ATC '16) applied to corpus text: chunk boundaries
    * are placed where a rolling `window`-token hash is ≡ 0 mod `divisor`,
    * so boundaries depend only on LOCAL content — insert a paragraph at
    * the top of a document and every later chunk still re-aligns
    * (fixed-size chunking would shift every boundary and miss all of
    * them). Expected chunk length is `divisor` tokens.
    *
    * Boundary rule, exactly: token positions are 1-based; a new chunk
    * starts at position p ≥ 2 when the rolling hash of the window
    * STARTING at p (tokens p..p+window−1; documents shorter than
    * `window` hash whole and are single-chunk) satisfies h mod divisor
    * = 0. Tokens past the last window position join the final chunk.
    *
    * Returns one row per chunk: (id, chunk_id 1-based, start_pos 1-based,
    * n_chunk_tokens, chunk_text, dup_of) where dup_of is the minimum
    * document id holding an identical-text chunk when that id is smaller
    * (null on every owner chunk) — the join key a chunk-level dedup or a
    * delta-storage layer consumes.
    *
    * Scale shape: the window hashes are one narrow custom-expression
    * projection ([[graft.plans.Sketches]] md5, same family as
    * [[spanOverlapStats]]); the boundary cumsum is ONE window shuffle
    * keyed on the document id over 8-byte hash rows; chunks materialize
    * as [start, next-start) TOKEN-ARRAY SLICES of the original document
    * (a per-doc equi-join fanning out to ~n/divisor chunk rows) — no
    * per-token row ever shuffles, document text moves exactly once, into
    * its own chunks; ownership is a hash aggregate on the 8-byte h60 of
    * the chunk text.
    */
  def cdcChunks(
      df: DataFrame,
      id: String,
      text: String,
      window: Int = 4,
      divisor: Int = 8): DataFrame = {
    require(window >= 1, "window must be >= 1")
    require(divisor >= 2, "divisor must be >= 2 (1 would cut at every token)")
    graft.plans.Sketches.ensureRegistered(df.sparkSession)
    val toks = df
      .select(col(id), TextFns.tokens(col(text)).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .withColumn("__n", size(col("__toks")))
    // (0-based) window start positions 0..max(n-window, 0); posexplode of
    // the rolling hashes yields exactly that range (short docs: one
    // whole-doc hash at position 0)
    val wh = toks.select(col(id),
      posexplode(TextFns.rollingWindowHashes(col("__toks"), window))
        .as(Seq("__pos", "__h")))
    val byDoc = org.apache.spark.sql.expressions.Window.partitionBy(col(id))
    val cum = wh
      .withColumn("__cut",
        when(col("__pos") >= 1 && pmod(col("__h"), lit(divisor)) === 0, 1L).otherwise(0L))
      .withColumn("__chunk0", sum(col("__cut")).over(byDoc.orderBy(col("__pos"))))
      .select(col(id), col("__pos"), col("__cut"), col("__chunk0"))
    // a chunk covers tokens [its first window position, the next chunk's
    // first window position): a token at (0-based) t belongs to the chunk
    // of window position min(t, n - window), which is exactly this span —
    // tail tokens past the last window ride the final chunk. Chunk starts
    // ARE the cut rows (plus position 0) — a FILTER, not an aggregate —
    // so the lead window runs on the cumsum window's own id partitioning
    // and the whole bounds derivation costs ONE exchange (pinned in
    // PlanSpec); the only row carrying text is the chunk itself, sliced
    // straight out of the per-doc token array.
    val bounds = cum
      .filter(col("__pos") === 0 || col("__cut") === 1L)
      .select(col(id), col("__chunk0"), col("__pos").as("__ws"))
      .withColumn("__we", lead(col("__ws"), 1).over(byDoc.orderBy(col("__ws"))))
    val chunks = bounds.join(toks, Seq(id))
      .withColumn("__end", coalesce(col("__we"), col("__n")))
      .select(col(id),
        (col("__chunk0") + 1).cast("long").as("chunk_id"),
        (col("__ws") + 1).cast("long").as("start_pos"),
        (col("__end") - col("__ws")).cast("long").as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("__ws") + 1, col("__end") - col("__ws")), " ")
          .as("chunk_text"))
    val keyed = chunks.withColumn("__ch",
      conv(substring(md5(col("chunk_text")), 1, 15), 16, 10).cast("long"))
    val owner = keyed.groupBy(col("__ch")).agg(min(col(id)).as("__owner"))
    keyed.join(owner, Seq("__ch"))
      .select(col(id), col("chunk_id"), col("start_pos"), col("n_chunk_tokens"),
        col("chunk_text"),
        when(col("__owner") < col(id), col("__owner")).as("dup_of"))
  }

  /** Deterministic Bloom-filter bitmap over a corpus's normalized-text
    * hashes: `kHashes` bit positions per document from the md5-affine
    * family ([[graft.plans.Sketches]] coefficients at k = 101..), packed
    * into 32-bit words stored as (word, bits) rows. Everything is integer
    * arithmetic below 2^63 on an md5-prefix base hash, so a SQL oracle
    * replays the bitmap — and therefore every membership verdict —
    * bit-for-bit. mBits/32 rows total: a 2^14-bit filter is 512 rows, a
    * production 2^30-bit filter (~128 MB, good for ~10^8 docs at 1% fp)
    * is 2^25 rows of 12 bytes — still broadcastable.
    */
  /** The shared (word, __mask) projection of [[bloomIndex]] and
    * [[bloomPrefilterFlags]] — ONE definition of the md5-affine bit
    * positions, because index and probe disagreeing on the hash family is
    * the exact way a Bloom filter grows the false negatives it promises
    * away. Null text fails loudly (a null would hash to no positions and
    * sail through as "definitively novel" — garbage flagged clean).
    */
  private def bloomWordMasks(
      df: DataFrame,
      keep: Seq[Column],
      text: String,
      mBits: Int,
      kHashes: Int): DataFrame = {
    require(mBits > 0 && mBits % 32 == 0, "mBits must be a positive multiple of 32")
    require(kHashes >= 1, "kHashes must be >= 1")
    val h = when(col(text).isNotNull,
        conv(substring(md5(lower(trim(col(text)))), 1, 8), 16, 10).cast("long"))
      .otherwise(assert_true(col(text).isNotNull,
        lit("bloom filter: null text")).cast("long"))
    df.select(keep :+ explode(array((0 until kHashes).map { i =>
        (((lit(graft.plans.Sketches.minhashA(101 + i)) * h
          + graft.plans.Sketches.minhashB(101 + i)) % graft.plans.Sketches.MinhashP)
          % mBits).as(s"p$i")
      }: _*)).as("__pos"): _*)
      .select(keep ++ Seq(
        floor(col("__pos") / 32).cast("int").as("word"),
        expr("shiftleft(1L, CAST(__pos % 32 AS INT))").as("__mask")): _*)
  }

  def bloomIndex(
      corpus: DataFrame,
      id: String,
      text: String,
      mBits: Int = 1 << 14,
      kHashes: Int = 3): DataFrame =
    bloomWordMasks(corpus, Nil, text, mBits, kHashes)
      .groupBy("word").agg(bit_or(col("__mask")).as("bits"))

  /** Largest bitmap [[bloomPrefilterFlags]] will force-broadcast: 2^26
    * bits = 2^21 (word, bits) rows ≈ 25 MB serialized — comfortably under
    * executor broadcast budgets. The documented production size (2^30
    * bits ≈ 2^25 rows / ~400 MB as rows) sits AT the broadcast ceiling,
    * so beyond this the hint is omitted and the probe joins the bitmap by
    * shuffle on `word` (AQE may still choose broadcast from actual stats
    * — a sparse big-mBits bitmap over a small corpus is tiny); a hard
    * hint would OOM the driver exactly when the filter is sized for a
    * 10^8-doc corpus.
    */
  val BloomBroadcastMaxBits: Int = 1 << 26

  /** Bloom-gated incremental exact dedup — the pre-shuffle pruning shape
    * for continuous ingest: every batch document is first tested against
    * the corpus Bloom bitmap ([[bloomIndex]] — mBits/32 rows, broadcast
    * only below [[BloomBroadcastMaxBits]], shuffle-joined beyond),
    * and ONLY Bloom-positive candidates join the exact-hash index
    * ([[exactIndex]]). A Bloom filter has no false negatives, so
    * bloom-negative documents are definitively novel without ever
    * shuffling toward the corpus index — at a typical ingest profile
    * (most arriving documents novel) the expensive join shrinks to the
    * candidate sliver, and false positives are caught exactly (flagged in
    * `bloom_fp`). Output per batch document, ordered by nothing:
    * (id, bloom_candidate, exact_dup_of, is_known, bloom_fp).
    */
  def bloomPrefilterFlags(
      batch: DataFrame,
      bloom: DataFrame,
      index: DataFrame,
      id: String,
      text: String,
      mBits: Int = 1 << 14,
      kHashes: Int = 3): DataFrame = {
    val probes = bloomWordMasks(batch, Seq(col(id)), text, mBits, kHashes)
    // broadcast only bitmaps provably under the ceiling (see
    // BloomBroadcastMaxBits); bigger filters shuffle-join on `word` unless
    // AQE's runtime stats say otherwise
    val bloomSide = if (mBits <= BloomBroadcastMaxBits) broadcast(bloom) else bloom
    val verdict = probes
      .join(bloomSide, Seq("word"), "left")
      .withColumn("__set",
        col("bits").isNotNull && (col("bits").bitwiseAND(col("__mask")) =!= 0L))
      .groupBy(col(id))
      .agg((sum(when(col("__set"), 1).otherwise(0)) === kHashes).as("bloom_candidate"))
    val flagged = batch.select(col(id), col(text)).join(verdict, Seq(id))
    // only the candidate sliver reaches the index join — that is the point
    val candidates = flagged.filter(col("bloom_candidate"))
      .withColumn("text_hash", md5(lower(trim(col(text)))))
      .join(index, Seq("text_hash"), "left")
      .select(col(id), col("bloom_candidate"),
        col("corpus_id").as("exact_dup_of"),
        col("corpus_id").isNotNull.as("is_known"),
        col("corpus_id").isNull.as("bloom_fp"))
    // the null literal must carry the INDEX's id type — a hardcoded long
    // would silently widen the union (and so the output schema) for a
    // string-keyed corpus
    val novel = flagged.filter(!col("bloom_candidate"))
      .select(col(id), col("bloom_candidate"),
        lit(null).cast(index.schema("corpus_id").dataType).as("exact_dup_of"),
        lit(false).as("is_known"),
        lit(false).as("bloom_fp"))
    candidates.unionByName(novel)
  }

  /** Asymmetric containment pairs (|A ∩ B| / |A| >= minContainment) for
    * "query" documents with at most `maxQueryShingles` distinct shingles —
    * the quote/subset detector Jaccard misses, with EXACT prefix
    * filtering (the PPJoin family's position filter, rarest-first global
    * order): if |A∩B| >= t then A's first |A|−t+1 shingles in
    * (corpus-frequency asc, shingle asc) order must intersect B —
    * pigeonhole, so only those PREFIX shingles seed the inverted-index
    * probe, and common-shingle candidate explosion disappears without
    * changing the result set. Verification then counts FULL matches for
    * candidate pairs only via a (doc, shingle)-keyed join. All counts are
    * integers + one final division: oracle-exact.
    */
  def containmentPairs(
      df: DataFrame,
      id: String,
      text: String,
      shingleN: Int = 3,
      maxQueryShingles: Int = 40,
      minContainment: Double = 0.5): DataFrame = {
    require(minContainment > 0 && minContainment <= 1, "minContainment in (0, 1]")
    // the shingle index is read by SIX consumers (sizes, frequencies,
    // ranking, candidate probe, both verify sides) — materialize it once
    // (index build), or each consumer re-tokenizes the corpus
    val sh = df.select(col(id),
      explode(array_distinct(TextFns.strictWordShingles(TextFns.tokens(col(text)), shingleN)))
        .as("s"))
      .localCheckpoint()
    val sizes = sh.groupBy(col(id)).agg(count(lit(1)).as("n_sh"))
    val freq = sh.groupBy("s").agg(count(lit(1)).as("__f"))
    // query side: short docs, shingles ranked rarest-first
    val qSh = sh.join(sizes.filter(col("n_sh") <= maxQueryShingles), id)
      .join(freq, "s")
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(id)).orderBy(col("__f"), col("s"))))
    // t = ceil(minC·|A|): matches >= t  <=>  containment >= minC (integer matches)
    val prefix = qSh.filter(
      col("__rk") <= col("n_sh") - ceil(lit(minContainment) * col("n_sh")).cast("long") + 1)
    val cand = prefix.select(col(id).as("id_a"), col("s"))
      .join(sh.select(col(id).as("id_b"), col("s")), "s")
      .filter(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b").distinct()
    // verify candidates only: fan A's shingles onto each pair, probe B's
    // index by (id_b, s) — bounded by |cand| × maxQueryShingles
    cand
      .join(sh.select(col(id).as("id_a"), col("s")), Seq("id_a"))
      .join(sh.select(col(id).as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("matches"))
      .join(sizes.select(col(id).as("id_a"), col("n_sh")), "id_a")
      .withColumn("containment", col("matches").cast("double") / col("n_sh"))
      .filter(col("containment") >= minContainment)
      .select("id_a", "id_b", "matches", "containment")
  }

  /** Character-level near-dup pairs by Levenshtein distance over
    * canonicalized prefixes, with length-bucket blocking.
    *
    * Minhash/Jaccard families see token-set similarity; edit distance
    * catches the small-perturbation family (typo farms, template fills)
    * they miss. The O(p²·len²) verify never runs all-pairs: docs block on
    * (lang, ⌊n_chars/bucketWidth⌋), each doc ALSO probes the next bucket
    * (standard neighbor-bucket trick — pairs straddling one boundary stay
    * visible; pairs >bucketWidth apart in length can't be near-dups at
    * these thresholds anyway), and the quadratic work is bounded per
    * block. The distance runs on `prefixLen`-char prefixes: O(prefixLen²)
    * per pair, constant — full-text Levenshtein at corpus scale is a
    * deliberate non-goal (use spanOverlapStats for long-form overlap).
    */
  def editDistancePairs(
      df: DataFrame,
      id: String,
      text: String,
      lang: String,
      sizeCol: String,
      bucketWidth: Int,
      prefixLen: Int,
      maxDist: Int): DataFrame = {
    require(bucketWidth >= 1 && prefixLen >= 1 && maxDist >= 0, "bad blocking params")
    val d0 = df.select(
      col(id), col(lang),
      substring(lower(trim(col(text))), 1, prefixLen).as("pfx"),
      expr(s"$sizeCol DIV $bucketWidth").as("b"))
    val e = d0.unionByName(d0.withColumn("b", col("b") + 1))
    // the block join's INPUT is tiny (docs × 2 rows) but its OUTPUT is the
    // per-block cross product — AQE sizes the join stage by input bytes
    // and would run the whole product on one task. Pre-partitioning both
    // sides on the join keys at the configured width is kept by the join
    // (hash-partitioned children satisfy SMJ's requirement), so block
    // products spread across tasks.
    val width = df.sparkSession.sessionState.conf.numShufflePartitions
    val a = e.select(col(id).as("doc_a"), col(lang).as("__la"),
      col("pfx").as("pa"), col("b"))
      .repartition(width, col("__la"), col("b"))
    val x = e.select(col(id).as("doc_b"), col(lang).as("__lx"),
      col("pfx").as("pb"), col("b"))
      .repartition(width, col("__lx"), col("b"))
    a.join(x, col("__la") === col("__lx") && a("b") === x("b")
        && col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b", "pa", "pb")
      // the verify is CPU-bound, not byte-bound: candidate pairs are ~100
      // bytes each, so AQE's size-based coalescing packs the whole stage
      // onto a handful of tasks and serializes millions of Levenshteins
      // (measured 22 s → 2 s at sf0.1). The explicit partition count pins
      // the verify stage's parallelism — AQE respects a user-specified
      // width — and keys on the pair so the spread is uniform. Placed
      // ABOVE the dedup: hash(doc_a, doc_b) clusters every copy of a pair
      // into one partition, a SUBSET of the distinct's grouping keys, so
      // the aggregate runs partition-local on top of this one exchange
      // (the r15 Abcd exchange-sharing trick) — the distinct-then-
      // repartition spelling shuffled the candidate set twice.
      .repartition(df.sparkSession.sessionState.conf.numShufflePartitions,
        col("doc_a"), col("doc_b"))
      .distinct() // a pair sharing both its buckets would otherwise double
      // banded threshold form: O(prefixLen·maxDist) per pair instead of
      // O(prefixLen²), exact for every distance ≤ maxDist, -1 above it
      .withColumn("lev", levenshtein(col("pa"), col("pb"), maxDist))
      .filter(col("lev") =!= -1)
      .select(col("doc_a"), col("doc_b"), col("lev").cast("int").as("lev"))
  }

  /** Soundex-style PHONETIC key as a pure translate/regexp chain —
    * codegen'd built-ins end to end, and (the point of the chain form)
    * exactly replayable by any SQL engine with translate + regexp_replace
    * (the dd_phonetic oracle re-states it verbatim; DuckDB has no native
    * soundex). Algorithm: letters only, uppercased; consonant classes
    * B F P V→1, C G J K Q S X Z→2, D T→3, L→4, M N→5, R→6; vowels
    * (A E I O U Y)→0 act as run separators; H and W are TRANSPARENT
    * (deleted before run collapsing, so 'Ashcraft' folds S,C into one 2);
    * adjacent equal codes collapse; the first LETTER is kept, its own
    * code dropped, zeros removed, right-padded to 4 chars. Empty input
    * keys to the empty string (callers filter).
    */
  def phoneticKey(word: Column): Column = {
    val u = upper(regexp_replace(word, "[^A-Za-z]", ""))
    val t = translate(u, "AEIOUYBFPVCGJKQSXZDTLMNRHW", "000000111122222222334556")
    // collapse each digit's runs; zeros need no collapsing (removed below)
    val collapsed = (1 to 6).foldLeft(t)((c, dgt) =>
      regexp_replace(c, s"$dgt{2,}", dgt.toString))
    val rest = translate(substring(collapsed, 2, 1000000), "0", "")
    when(u === "", lit(""))
      .otherwise(concat(substring(u, 1, 1), substring(rpad(rest, 3, "0"), 1, 3)))
  }

  /** Phonetic-key dedup profile: each row's leading alphabetic word keyed
    * by [[phoneticKey]], with its phonetic group size — the
    * blocking-key view of the family (homophone candidates = rows
    * sharing a code; the groups feed the same neighbor-bucket verify
    * join as the edit-distance family). One window count over the code —
    * a single keyed shuffle; the key itself is a zero-shuffle projection.
    */
  def phoneticGroups(df: DataFrame, id: String, text: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("code"))
    df.select(col(id), regexp_extract(col(text), "[A-Za-z]+", 0).as("word"))
      .filter(col("word") =!= "")
      .withColumn("code", phoneticKey(col("word")))
      .withColumn("group_n", count(lit(1)).over(w))
      .withColumn("is_dup", col("group_n") > 1)
  }

  /** Near-duplicate IMAGE pairs by banded hamming join over perceptual
    * hashes ([[graft.operators.Multimodal.imagePhash]]'s 64-bit '0'/'1'
    * strings): split each hash into `bands` equal substrings, candidates
    * share at least one (band, value) — an equi-join, never all-pairs —
    * then verify the exact hamming distance on candidates only.
    *
    * Recall is EXACT by pigeonhole, not probabilistic: `maxHamming` <
    * `bands` means the differing bits can touch at most maxHamming bands,
    * so every qualifying pair shares ≥ 1 clean band and is guaranteed a
    * candidate — the output is precisely "all pairs with hamming ≤
    * maxHamming", independent of the banding (which only bounds the work).
    * The verify is 64 fixed substring compares — codegen'd, no UDF.
    * Null hashes (undecodable / sub-grid images) are excluded loudly.
    *
    * Candidate-volume bound (the honest scale math, same as every
    * fixed-band LSH including dd_simhash): uniform hashes put ~n/2^(64/bands)
    * rows in each band bucket, so candidate pairs grow as
    * O(bands · n² / 2^(64/bands)). At corpus scale prefer FEWER, LONGER
    * bands with a tighter radius — `bands = 4` (16-bit bands, 65k bucket
    * space) with `maxHamming ≤ 3` is the Manku-et-al. simhash-dedup
    * operating point; `bands = 8` (8-bit bands) buys radius 6 but only
    * 256 bucket values and is for bounded corpora. The pigeonhole
    * constraint `maxHamming < bands` is enforced either way.
    */
  def phashNearDupPairs(
      hashes: DataFrame,
      id: String,
      phash: String,
      bands: Int = 8,
      maxHamming: Int = 6): DataFrame = {
    require(64 % bands == 0, s"bands must divide 64, got $bands")
    require(bands >= 2,
      "bands=1 is exact-hash equality (maxHamming 0) — group by the hash " +
        "directly instead of a banded join")
    require(maxHamming >= 0 && maxHamming < bands,
      s"pigeonhole recall needs maxHamming < bands, got $maxHamming/$bands")
    val bandLen = 64 / bands
    val base = hashes.select(col(id), col(phash).as("__ph"))
      .filter(
        when(col("__ph").isNotNull && length(col("__ph")) === 64, lit(true))
          .otherwise(assert_true(lit(false),
            lit("phashNearDupPairs: null or non-64-bit phash (decode failed or " +
              "sub-grid image); filter those rows explicitly first"))
            .cast("boolean")))
    // bit-pack the 64-char bit string into two 32-bit words once at the
    // source: band values become integer shift+mask (no 8-char string
    // keys in the join), the candidate distinct carries 4 longs instead
    // of two 64-char strings, and hamming is two bit_count(xor) ops
    // instead of 64 substring compares — the same packing that made
    // ann_binary_quant's scan the cheapest ANN first stage
    val bandsPerHalf = 32 / bandLen // bands divides 64 => bandLen divides 32
    val mask = (1L << bandLen) - 1
    val packed = base.select(col(id),
      conv(substring(col("__ph"), 1, 32), 2, 10).cast("long").as("__hi"),
      conv(substring(col("__ph"), 33, 32), 2, 10).cast("long").as("__lo"))
    val banded = packed
      .select(col(id), col("__hi"), col("__lo"),
        explode(sequence(lit(0), lit(bands - 1))).as("__b"))
      .withColumn("__bv",
        expr(s"shiftright(IF(__b < $bandsPerHalf, __hi, __lo), " +
          s"(${bandsPerHalf - 1} - pmod(__b, $bandsPerHalf)) * $bandLen) & ${mask}L"))
    val a = banded.select(col(id).as("id_a"),
      col("__hi").as("__ha"), col("__lo").as("__la"), col("__b"), col("__bv"))
    val b = banded.select(col(id).as("id_b"),
      col("__hi").as("__hb"), col("__lo").as("__lb"), col("__b"), col("__bv"))
    val cand = a.join(b, Seq("__b", "__bv"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "__ha", "__la", "__hb", "__lb")
      .distinct() // pairs sharing several clean bands would otherwise repeat
    cand
      .withColumn("hamming",
        (bit_count(col("__ha").bitwiseXOR(col("__hb"))) +
          bit_count(col("__la").bitwiseXOR(col("__lb")))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }
}
