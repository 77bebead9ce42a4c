package graft

import org.apache.spark.sql.functions._
import graft.ops.{Aggregates, Joins}

/** Differential testing: each scalable formulation is compared against an
  * independent brute-force reference (plain Scala over the same rows) on
  * seeded random inputs — ties, duplicates, nulls, empty keys and boundary
  * collisions arise by construction rather than by hand-picking.
  * Deterministic seeds keep failures reproducible.
  */
class DifferentialSpec extends SparkTestBase {
  import spark.implicits._

  private val Trials = 8

  test("asofJoin (backward/forward) matches a brute-force reference on random inputs") {
    for (trial <- 0 until Trials; direction <- Seq("backward", "forward")) {
      val rnd = new scala.util.Random(1000 + trial)
      def key() = s"k${rnd.nextInt(4)}"
      def time(): Option[Int] = if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(15))
      val leftRows = (0 until 30).map(i => (i.toLong, key(), time()))
      // right times unique per key (the operator's documented contract)
      val rightRows = (for {
        k <- 0 until 4; t <- 0 until 15 if rnd.nextBoolean()
      } yield (s"k$k", t, rnd.nextDouble())).toVector
      val left = leftRows.toDF("lid", "k", "t")
      val right = rightRows.toDF("k", "qt", "qv")

      val got = Joins.asofJoin(left, right, Seq("k"), "t", "qt", Seq("qt", "qv"), direction)
        .select("lid", "qt", "qv")
        .as[(Long, Option[Int], Option[Double])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap

      val byKey = rightRows.groupBy(_._1)
      val expected = leftRows.map { case (lid, k, t) =>
        val m = t.flatMap { lt =>
          val cands = byKey.getOrElse(k, Vector.empty)
          val qualifying =
            if (direction == "backward") cands.filter(_._2 <= lt)
            else cands.filter(_._2 >= lt)
          if (qualifying.isEmpty) None
          else Some(
            if (direction == "backward") qualifying.maxBy(_._2)
            else qualifying.minBy(_._2))
        }
        lid -> ((m.map(_._2), m.map(_._3)))
      }.toMap
      assert(got == expected, s"trial=$trial direction=$direction")
    }
  }

  test("rangeJoin matches a brute-force BETWEEN filter on random inputs") {
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(2000 + trial)
      val pointRows = (0 until 40).map(i => (i.toLong, rnd.nextDouble() * 100))
      val intervalRows = (0 until 12).map { i =>
        val a = rnd.nextDouble() * 100
        val b = a + (rnd.nextDouble() - 0.2) * 30 // ~20% inverted intervals
        (s"i$i", a, b)
      }
      val bucketSize = Seq(1.0, 7.3, 50.0, 500.0)(trial % 4) // incl. degenerate sizes
      val got = Joins.rangeJoin(
          pointRows.toDF("pid", "v"), "v",
          intervalRows.toDF("name", "lo", "hi"), "lo", "hi", bucketSize)
        .select("pid", "name").as[(Long, String)].collect().toSet
      val expected = (for {
        (pid, v) <- pointRows
        (n, lo, hi) <- intervalRows
        if lo <= v && v <= hi
      } yield (pid, n)).toSet
      assert(got == expected, s"trial=$trial bucketSize=$bucketSize")
    }
  }

  test("zscore matches brute-force moments on random inputs") {
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(4000 + trial)
      val rows = (0 until 50).map(i => (s"g${rnd.nextInt(4)}", (rnd.nextInt(200) / 4.0)))
      val got = graft.ops.Aggregates.zscore(rows.toDF("g", "v"), Seq("g"), "v")
        .select("g", "v", "v_z").as[(String, Double, Option[Double])].collect()
      val stats = rows.groupBy(_._1).map { case (g, vs) =>
        val xs = vs.map(_._2)
        val n = xs.length
        val mean = xs.sum / n
        val std =
          if (n > 1) math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / (n - 1)) else 0.0
        g -> ((mean, std))
      }
      got.foreach { case (g, v, z) =>
        val (mean, std) = stats(g)
        if (std > 0) assert(math.abs(z.get - (v - mean) / std) < 1e-9, s"trial=$trial g=$g v=$v")
        else assert(z.isEmpty, s"trial=$trial zero-variance group $g must have null z")
      }
    }
  }

  test("keySkew matches brute-force counts/shares on random inputs") {
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(5000 + trial)
      val rows = (0 until 80).map(_ => s"k${rnd.nextInt(1 + rnd.nextInt(12))}") // skewed keys
      val topN = 5
      val got = graft.operators.Profile.keySkew(rows.toDF("k"), Seq("k"), topN)
        .as[(String, Long, Double, Double)].collect().toSeq
      val counts = rows.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val nKeys = counts.size.toDouble
      val total = rows.size.toDouble
      val expected = counts.toSeq.sortBy { case (k, c) => (-c, k) }.take(topN)
        .map { case (k, c) => (k, c, c / total, c * nKeys / total) }
      assert(got == expected, s"trial=$trial got=$got expected=$expected")
    }
  }

  test("winsorize bounds match brute-force order statistics on random inputs") {
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(3000 + trial)
      // duplicate-heavy values force rank ties
      val rows = (0 until 60).map(i => (s"g${rnd.nextInt(3)}", rnd.nextInt(10).toDouble))
      val (pLo, pHi) = (0.1, 0.9)
      val got = Aggregates.winsorize(rows.toDF("g", "v"), Seq("g"), "v", pLo, pHi)
        .select("g", "v_lo", "v_hi").distinct()
        .as[(String, Double, Double)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      val expected = rows.groupBy(_._1).map { case (g, vs) =>
        val sorted = vs.map(_._2).sorted
        def at(p: Double) = sorted(math.max(math.ceil(p * sorted.length).toLong, 1L).toInt - 1)
        g -> ((at(pLo), at(pHi)))
      }
      assert(got == expected, s"trial=$trial")
    }
  }

  test("Funnel.reach matches a brute-force ordered scan on random event logs") {
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(5000 + trial)
      val types = Vector("view", "click", "purchase")
      // duplicate timestamps arise by construction (15 slots, ~40 events)
      val events = (0 until 40).map(i =>
        (rnd.nextInt(6).toLong, types(rnd.nextInt(3)), rnd.nextInt(15).toLong, i.toLong))
      val df = events.toDF("u", "et", "t", "eid")
      val steps = Seq(col("et") === "view", col("et") === "click", col("et") === "purchase")
      val got = graft.ops.Funnel.reach(df, "u", "t", steps)
        .select("u", "__t").as[(Long, Long)].collect().toMap

      // brute force: earliest chain per user with strict ordering
      val expected = events.groupBy(_._1).flatMap { case (u, evs) =>
        def earliestAfter(tpe: String, after: Option[Long]): Option[Long] = {
          val c = evs.filter(e => e._2 == tpe && after.forall(a => e._3 > a)).map(_._3)
          // after=None -> first step: earliest overall
          if (c.isEmpty) None else Some(c.min)
        }
        for {
          t1 <- earliestAfter("view", None)
          t2 <- earliestAfter("click", Some(t1))
          t3 <- earliestAfter("purchase", Some(t2))
        } yield u -> t3
      }
      assert(got == expected, s"trial=$trial")
    }
  }

  test("Joins.upsert matches set semantics on random target/source pairs") {
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(6000 + trial)
      val target = (0 until 20).map(i => (i.toLong, s"t$i", rnd.nextInt(100)))
      // source: unique keys, overlapping [10, 30)
      val source = rnd.shuffle((10 until 30).toVector).take(12)
        .map(k => (k.toLong, s"s$k", rnd.nextInt(100)))
      val got = Joins.upsert(target.toDF("k", "tag", "v"), source.toDF("k", "tag", "v"), Seq("k"))
        .as[(Long, String, Int)].collect().toSet
      val srcKeys = source.map(_._1).toSet
      val expected = source.toSet ++ target.filterNot(r => srcKeys(r._1))
      assert(got == expected, s"trial=$trial")
    }
  }

  test("canonicalize (path-halving) matches brute-force connected components on random graphs") {
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(7000 + trial)
      val n = 30
      val ids = (0L until n).toVector
      // sparse random edges + one long chain segment (the doubling worst case)
      val edges = (0 until 12).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b } ++
        (5L until 15L).map(i => (i - 1, i))
      val got = graft.operators.Dedup.canonicalize(
          ids.toDF("doc_id"),
          edges.toDF("id_a", "id_b"), "doc_id")
        .select("doc_id", "canonical_id").as[(Long, Long)].collect().toMap

      // brute-force union-find
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = ids.map { i =>
        // canonical = min id of the component
        val root = find(i)
        i -> ids.filter(j => find(j) == root).min
      }.toMap
      assert(got == expected, s"trial=$trial edges=$edges")
    }
  }

  test("packSequences matches a brute-force sequential stream packer on random inputs") {
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(8000 + trial)
      val L = 1 + rnd.nextInt(40)
      val rows = (0 until 40).map(i =>
        (s"s${rnd.nextInt(3)}", i.toLong, rnd.nextInt(3 * L)))  // includes 0-token docs
      val got = graft.operators.Sampling.packSequences(
          rows.toDF("source", "id", "tc"), col("tc"), Seq("source"), Seq(col("id")), L)
        .select("source", "id", "example_id", "tok_from", "tok_len", "pos_in_example")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSet

      // brute force: walk each source's id-ordered stream token by segment
      val expected = rows.groupBy(_._1).flatMap { case (src, docs) =>
        var off = 0L
        docs.sortBy(_._2).flatMap { case (_, id, tc) =>
          val segs = if (tc == 0) Seq.empty else {
            var segStart = off
            val end = off + tc
            val out = scala.collection.mutable.Buffer[(String, Long, Long, Long, Long, Long)]()
            while (segStart < end) {
              val ex = segStart / L
              val segEnd = math.min(end, (ex + 1) * L)
              out += ((src, id, ex, segStart - off, segEnd - segStart, segStart - ex * L))
              segStart = segEnd
            }
            out.toSeq
          }
          off += tc
          segs
        }
      }.toSet
      assert(got == expected, s"trial=$trial L=$L")
    }
  }

  test("stripBoilerplate matches a brute-force line-frequency reference on random inputs") {
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(7000 + trial)
      def line(): String = rnd.nextInt(5) match {
        case 0 => ""                                   // structural blank
        case 1 => "  shared " + rnd.nextInt(3) + "  "  // poolable, padded
        case 2 => "shared " + rnd.nextInt(3)
        case _ => s"unique t$trial r${rnd.nextInt(1000)} ${rnd.nextInt(1000)}"
      }
      val docs = (0 until 12).map(i => (i.toLong, (0 until 1 + rnd.nextInt(4)).map(_ => line())))
      val minDocs = 3
      val df = docs.map { case (id, ls) => (id, ls.mkString("\n")) }.toDF("doc_id", "text")
      val got = graft.operators.CorpusPrep
        .stripBoilerplate(df, "doc_id", "text", minDocs)
        .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
      // brute force: corpus-wide trimmed-line document frequency
      val dfCount = docs.flatMap { case (id, ls) =>
        ls.map(_.trim).filter(_.nonEmpty).distinct.map(_ -> id)
      }.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).distinct.size }
      val boiler = dfCount.filter(_._2 >= minDocs).keySet
      docs.foreach { case (id, ls) =>
        val kept = ls.filter(l => l.trim.isEmpty || !boiler(l.trim))
        val expected = (id, kept.mkString("\n"), ls.size.toLong, (ls.size - kept.size).toLong)
        assert(got(id) == expected, s"trial=$trial doc=$id: ${got(id)} vs $expected")
      }
    }
  }

  test("cutDuplicateSpans matches a brute-force ownership reference on random inputs") {
    val w = 3
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(8000 + trial)
      // tiny vocab -> heavy genuine window collisions, short docs included
      val docs = (0 until 10).map { i =>
        (i.toLong, (0 until 1 + rnd.nextInt(11)).map(_ => s"t${rnd.nextInt(6)}"))
      }
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      val got = graft.operators.Dedup.cutDuplicateSpans(df, "doc_id", "text", window = w)
        .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
      // brute force: window strings, min-id ownership, covered indices
      def windows(ts: Seq[String]): Seq[(Int, String)] =
        if (ts.size >= w) (0 to ts.size - w).map(i => i -> ts.slice(i, i + w).mkString(" "))
        else Seq(0 -> ts.mkString(" "))
      val owner: Map[String, Long] = docs.flatMap { case (id, ts) =>
        windows(ts).map { case (_, s) => s -> id }
      }.groupBy(_._1).map { case (s, v) => s -> v.map(_._2).min }
      docs.foreach { case (id, ts) =>
        val covered = windows(ts).collect {
          case (i, s) if owner(s) < id => i to math.min(i + w - 1, ts.size - 1)
        }.flatten.toSet
        val kept = ts.zipWithIndex.collect { case (t, i) if !covered(i) => t }
        val expected = (id, kept.mkString(" "), ts.size.toLong, (ts.size - kept.size).toLong)
        assert(got(id) == expected, s"trial=$trial doc=$id: ${got(id)} vs $expected")
      }
    }
  }

  test("cdcChunks matches a brute-force boundary/ownership reference on random inputs") {
    val w = 3
    val d = 4 // aggressive divisor -> boundaries common even on short docs
    def h60(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(9000 + trial)
      // tiny vocab -> repeated chunks across docs; lengths 1..14 cover the
      // sub-window, single-window and multi-boundary regimes
      val docs = (0 until 12).map { i =>
        (i.toLong, (0 until 1 + rnd.nextInt(14)).map(_ => s"t${rnd.nextInt(5)}"))
      }
      val df = docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("doc_id", "text")
      val got = graft.operators.Dedup.cdcChunks(df, "doc_id", "text", window = w, divisor = d)
        .as[(Long, Long, Long, Long, String, Option[Long])].collect()
        .map(r => (r._1, r._2) -> r).toMap
      // brute force: window-start hashes, cut positions, span chunks,
      // min-id ownership of identical chunk text
      def chunksOf(ts: Seq[String]): Seq[(Int, Seq[String])] = {
        val n = ts.size
        val hashes =
          if (n >= w) (0 to n - w).map(i => h60(ts.slice(i, i + w).mkString(" ")))
          else Seq(h60(ts.mkString(" ")))
        val cuts = hashes.indices.filter(p => p >= 1 && hashes(p) % d == 0)
        val starts = 0 +: cuts
        starts.zipWithIndex.map { case (s, k) =>
          val end = if (k + 1 < starts.size) starts(k + 1) else n
          s -> ts.slice(s, end)
        }
      }
      val all = docs.map { case (id, ts) => id -> chunksOf(ts) }
      val owner: Map[String, Long] = all.flatMap { case (id, cs) =>
        cs.map { case (_, c) => c.mkString(" ") -> id }
      }.groupBy(_._1).map { case (s, v) => s -> v.map(_._2).min }
      var expectedRows = 0
      all.foreach { case (id, cs) =>
        cs.zipWithIndex.foreach { case ((start, ctoks), k) =>
          val text = ctoks.mkString(" ")
          val dupOf = Some(owner(text)).filter(_ < id)
          val expected = (id, (k + 1).toLong, (start + 1).toLong, ctoks.size.toLong, text, dupOf)
          assert(got((id, (k + 1).toLong)) == expected,
            s"trial=$trial doc=$id chunk=${k + 1}: ${got((id, (k + 1).toLong))} vs $expected")
          expectedRows += 1
        }
      }
      assert(got.size == expectedRows, s"trial=$trial row count ${got.size} vs $expectedRows")
    }
  }

  test("rocAuc matches brute-force pair counting (midrank ties) on random inputs") {
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(7000 + trial)
      // small value range forces heavy ties; both classes guaranteed
      val rows = (0 until 40).map(_ => (rnd.nextInt(12).toLong, rnd.nextBoolean())) ++
        Seq((3L, true), (4L, false))
      val df = rows.toDF("v", "p")
      val r = graft.ops.Stats.rocAuc(df, col("p"), col("v")).head()
      val pos = rows.filter(_._2).map(_._1)
      val neg = rows.filterNot(_._2).map(_._1)
      // brute force over all pos×neg pairs: win = 2, tie = 1 (the ×2 scale)
      val num = (for (a <- pos; b <- neg)
        yield if (a > b) 2L else if (a == b) 1L else 0L).sum
      assert(r.getLong(0) == pos.size && r.getLong(1) == neg.size, s"trial=$trial counts")
      assert(r.getDouble(2) == num.toDouble, s"trial=$trial num ${r.getDouble(2)} vs $num")
      val expected = num.toDouble / (2.0 * pos.size * neg.size)
      assert(r.getDouble(3) == expected, s"trial=$trial auc ${r.getDouble(3)} vs $expected")
    }
  }

  test("bfsDistances matches brute-force BFS on random graphs") {
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(8000 + trial)
      val n = 25
      val edges = (0 until 40).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val seeds = (0 until 3).map(_ => rnd.nextInt(n).toLong).distinct
      val got = graft.operators.Graph.bfsDistances(
          edges.toDF("src", "dst"), seeds.toDF("v"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // brute force BFS over the cleaned undirected view
      val und = edges.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, e.swap)).groupBy(_._1).map { case (k, v) =>
          k -> v.map(_._2).toSet
        }
      var dist = seeds.map(_ -> 0L).toMap
      var frontier = seeds.toSet
      while (frontier.nonEmpty) {
        val next = frontier.flatMap(v => und.getOrElse(v, Set.empty))
          .filterNot(dist.contains)
        next.foreach(v => dist += v -> (dist(frontier.find(f =>
          und.getOrElse(f, Set.empty).contains(v)).get) + 1))
        frontier = next
      }
      assert(got == dist, s"trial=$trial: $got vs $dist")
    }
  }

  test("commonNeighborCandidates matches brute force on random graphs (cap + full degrees)") {
    for (trial <- 0 until Trials) {
      val rnd = new scala.util.Random(9000 + trial)
      val n = 16
      val cap = 4 + rnd.nextInt(4)
      val edgesRaw = (0 until 30).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val got = graft.operators.Graph.commonNeighborCandidates(
          edgesRaw.toDF("src", "dst"), maxApexDegree = cap, minCommon = 2L)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
      // brute force: canonical edge set, full adjacency, capped apexes
      val e = edgesRaw.filter(p => p._1 != p._2)
        .map(p => (p._1 min p._2, p._1 max p._2)).toSet
      val adj = e.toSeq.flatMap(p => Seq(p, p.swap)).groupBy(_._1)
        .map { case (k, v) => k -> v.map(_._2).toSet }
      val expected = (for {
        a <- adj.keys; b <- adj.keys
        if a < b && !e.contains((a, b))
        shared = adj(a).intersect(adj(b)).count(u => adj(u).size <= cap)
        if shared >= 2
      } yield (a, b) -> ((shared.toLong, adj(a).size.toLong, adj(b).size.toLong,
        shared.toDouble / (adj(a).size + adj(b).size - shared)))).toMap
      assert(got == expected, s"trial=$trial cap=$cap: $got vs $expected")
    }
  }
}
