package graft

import org.apache.spark.sql.functions._
import graft.ops.{Joins, Stats}
import graft.sources.{FixedWidth, Wav}

class StatsSpec extends SparkTestBase {
  import spark.implicits._

  // ---- groupedRank strategy-probe elision ------------------------------

  test("groupedRank: knownGroups hint skips the strategy-probe job, ranks unchanged") {
    val df = (for (g <- 1 to 3; i <- 1 to 40)
      yield (s"g$g", ((g * 31 + i * 17) % 50).toLong, i.toLong))
      .toDF("g", "v", "id")
    val sc = spark.sparkContext
    def ranks(hint: Option[Long], group: String): Seq[(String, Long, Long)] = {
      sc.setJobGroup(group, group, interruptOnCancel = false)
      val out = graft.ops.Stats
        .groupedRank(df, Seq("g"), col("v"), Seq(col("id")), "rk", knownGroups = hint)
        .select("g", "id", "rk").as[(String, Long, Long)].collect()
      sc.clearJobGroup()
      out.sortBy(r => (r._1, r._2)).toSeq
    }
    val unhinted = ranks(None, "gr_probe_unhinted")
    val hinted = ranks(Some(3L), "gr_probe_hinted")
    assert(unhinted == hinted, "the hint must not change a single rank")
    val jobsUnhinted = sc.statusTracker.getJobIdsForGroup("gr_probe_unhinted").length
    val jobsHinted = sc.statusTracker.getJobIdsForGroup("gr_probe_hinted").length
    assert(jobsHinted < jobsUnhinted,
      s"hinted path must skip the distinct-count probe job: $jobsHinted vs $jobsUnhinted")
  }

  test("groupedRank: a large knownGroups hint selects the window fallback probe-free") {
    val df = (for (g <- 1 to 4; i <- 1 to 10)
      yield (s"g$g", i.toLong, i.toLong)).toDF("g", "v", "id")
    // hint above maxDriverRows/buckets forces the per-group-window branch
    val a = graft.ops.Stats
      .groupedRank(df, Seq("g"), col("v"), Seq(col("id")), "rk",
        knownGroups = Some(1L << 40))
      .select("g", "id", "rk").as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val b = graft.ops.Stats
      .groupedRank(df, Seq("g"), col("v"), Seq(col("id")), "rk")
      .select("g", "id", "rk").as[(String, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(a.toSeq == b.toSeq, "both branches must produce identical ranks")
  }

  // ---- EWMA ------------------------------------------------------------

  test("ewma: matches the sequential recursion over the bounded frame") {
    val rows = for (g <- 1 to 3; i <- 1 to 20)
      yield (g.toLong, i.toLong, ((g * 37 + i * 13) % 100).toDouble)
    val df = rows.toDF("g", "i", "x")
    val got = Stats.ewma(df, Seq("g"), Seq("i"), "x", alpha = 0.25, lookback = 8)
      .select("g", "i", "ewma").as[(Long, Long, Double)].collect()
      .map { case (g, i, e) => (g, i) -> e }.toMap
    // brute force: recursive fold over the last-8 slice, per group
    for (g <- 1 to 3) {
      val xs = rows.filter(_._1 == g).sortBy(_._2).map(_._3)
      for (i <- 1 to 20) {
        val frame = xs.slice(math.max(0, i - 8), i)
        val want = frame.tail.foldLeft(frame.head)((acc, v) => (0.25 * v) + (0.75 * acc))
        assert(got((g.toLong, i.toLong)) == want, s"g=$g i=$i")
      }
    }
  }

  test("ewma: plans exactly one exchange (the window shuffle)") {
    val df = spark.range(100).select((col("id") % 5).as("g"), col("id").as("i"),
      (col("id") * 3 % 17).cast("double").as("x"))
    val plan = Stats.ewma(df, Seq("g"), Seq("i"), "x", 0.5, 4)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"want 1 exchange, got $exchanges:\n$plan")
  }

  // ---- CMS heavy hitters ------------------------------------------------

  test("cmsHeavyHitters: estimate never undercounts; exact top-k order") {
    // zipf-ish: key k appears 200/k times, k = 1..40
    val rows = for (k <- 1 to 40; _ <- 1 to (200 / k)) yield Tuple1(k.toLong)
    val df = rows.toDF("k")
    val out = Stats.cmsHeavyHitters(df, "k", depth = 3, width = 64, topK = 10)
      .select("k", "true_n", "cms_n", "overcount", "rk")
      .as[(Long, Long, Long, Long, Int)].collect().sortBy(_._5)
    assert(out.length == 10)
    // top keys by true frequency, rank order correct
    assert(out.map(_._1).take(3).toSeq == Seq(1L, 2L, 3L))
    assert(out.forall { case (_, t, c, o, _) => c >= t && o == c - t && o >= 0 })
    // true counts are the exact frequencies
    assert(out.head._2 == 200)
  }

  test("cmsHeavyHitters: wide sketch on few keys is collision-free (overcount 0)") {
    val df = (1 to 5).flatMap(k => Seq.fill(k * 3)(k.toLong)).map(Tuple1(_)).toDF("k")
    val out = Stats.cmsHeavyHitters(df, "k", depth = 3, width = 4096, topK = 5)
      .select("overcount").as[Long].collect()
    assert(out.forall(_ == 0L), out.mkString(","))
  }

  // ---- sample quantiles --------------------------------------------------

  test("sampleQuantiles: k >= n degenerates to exact order statistics") {
    val df = (1 to 101).map(i => (i.toLong, i.toDouble)).toDF("id", "v")
    val row = Stats.sampleQuantiles(df, Seq("id"), "v", k = 1000, qs = Seq(0.0, 0.5, 1.0))
      .select("n_sample", "p0", "p50", "p100").as[(Long, Double, Double, Double)]
      .collect().head
    // n=101: p0 -> idx 0 -> 1.0; p50 -> idx 50 -> 51.0; p100 -> idx 100 -> 101.0
    assert(row == ((101L, 1.0, 51.0, 101.0)), row.toString)
  }

  // ---- grouped OLS --------------------------------------------------------

  test("groupedOls2: recovers a planted exact linear model per group") {
    // y = b0 + b1*x1 + b2*x2 with centi-exact inputs; two groups with
    // different betas; enough spread that X'X is well-conditioned
    def mk(g: String, b0: Double, b1: Double, b2: Double) =
      for (i <- 1 to 200) yield {
        val x1 = (i % 23).toDouble
        val x2 = ((i * 7) % 11).toDouble / 2.0 // .0 or .5 — centi-exact
        (g, b0 + b1 * x1 + b2 * x2, x1, x2)
      }
    val df = (mk("a", 3.0, 2.0, -0.5) ++ mk("b", -1.0, 0.25, 4.0))
      .toDF("g", "y", "x1", "x2")
    val out = Stats.groupedOls2(df, "g", "y", "x1", "x2")
      .select("g", "beta0", "beta1", "beta2")
      .as[(String, Double, Double, Double)].collect().sortBy(_._1)
    val Seq(a, b) = out.toSeq
    def close(x: Double, y: Double) = math.abs(x - y) < 1e-9
    assert(close(a._2, 3.0) && close(a._3, 2.0) && close(a._4, -0.5), a.toString)
    assert(close(b._2, -1.0) && close(b._3, 0.25) && close(b._4, 4.0), b.toString)
  }

  // ---- nearest join --------------------------------------------------------

  test("nearestJoin: picks the closer side, ties to earlier, nulls when no right") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 10L, 300L), (4L, 99L, 50L))
      .toDF("id", "k", "t")
    val right = Seq((10L, 90L, "a"), (10L, 210L, "b"), (10L, 290L, "c"))
      .toDF("k", "rt", "v")
    val got = Joins.nearestJoin(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
      .select("id", "rt", "v").as[(Long, Option[Long], Option[String])]
      .collect().sortBy(_._1).toSeq
    // id=1: |100-90|=10 vs |210-100|=110 -> a; id=2: |205-210|=5 -> b;
    // id=3: |300-290|=10 vs none fwd -> c; id=4: no rows for k=99 -> null
    assert(got == Seq(
      (1L, Some(90L), Some("a")),
      (2L, Some(210L), Some("b")),
      (3L, Some(290L), Some("c")),
      (4L, None, None)), got.toString)
  }

  test("nearestJoin: exact tie goes to the earlier (backward) right row") {
    val left = Seq((1L, 1L, 100L)).toDF("id", "k", "t")
    val right = Seq((1L, 90L, "early"), (1L, 110L, "late")).toDF("k", "rt", "v")
    val got = Joins.nearestJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("v").as[String].collect().toSeq
    assert(got == Seq("early"))
  }

  test("nearestJoin: brute-force equality on a hash-generated fixture") {
    val left = spark.range(200).select(col("id"),
      (col("id") % 7).as("k"), (xxhash64(col("id")) % 1000).as("t"))
    val right = spark.range(300).select((col("id") % 7).as("k"),
      (xxhash64(col("id") + 5000) % 1000).as("rt"),
      col("id").as("v"))
      // nearestJoin contract: unique (k, rt)
      .groupBy("k", "rt").agg(max("v").as("v"))
    val got = Joins.nearestJoin(left, right, Seq("k"), "t", "rt", Seq("rt", "v"))
      .select("id", "rt", "v").as[(Long, Option[Long], Option[Long])]
      .collect().sortBy(_._1).toSeq
    val ls = left.as[(Long, Long, Long)].collect()
    val rs = right.as[(Long, Long, Long)].collect()
    val want = ls.sortBy(_._1).map { case (id, k, t) =>
      val cands = rs.filter(_._1 == k)
      if (cands.isEmpty) (id, None, None)
      else {
        val (_, rt, v) = cands.minBy { case (_, rt, _) => (math.abs(rt - t), rt) }
        (id, Some(rt), Some(v))
      }
    }.toSeq
    assert(got == want)
  }

  // ---- fixed width -----------------------------------------------------

  test("FixedWidth: lossless roundtrip including nulls") {
    val df = Seq(
      (Some(1L), Some("ALPHA"), Some(10L)),
      (Some(2L), None, Some(20L)),
      (None, Some("GAMMA RAY"), None))
      .toDF("id", "name", "qty")
    val path = java.nio.file.Files.createTempDirectory("fw").toString + "/t"
    val fields = Seq(FixedWidth.Field("id", 6, "bigint"),
      FixedWidth.Field("name", 12, "string"), FixedWidth.Field("qty", 6, "bigint"))
    FixedWidth.write(df, path, fields)
    val got = FixedWidth.read(spark, path, fields)
      .as[(Option[Long], Option[String], Option[Long])].collect().toSet
    assert(got == Set(
      (Some(1L), Some("ALPHA"), Some(10L)),
      (Some(2L), None, Some(20L)),
      (None, Some("GAMMA RAY"), None)))
  }

  test("FixedWidth: overflow and trailing-space values fail loudly at write") {
    val path = java.nio.file.Files.createTempDirectory("fw_bad").toString + "/t"
    val wide = Seq(Tuple1("TOOLONGVALUE")).toDF("name")
    val f = Seq(FixedWidth.Field("name", 4, "string"))
    val e1 = intercept[Exception] { FixedWidth.write(wide, path, f) }
    assert(e1.getMessage != null)
    val padded = Seq(Tuple1("x ")).toDF("name")
    val e2 = intercept[Exception] { FixedWidth.write(padded, path, f) }
    assert(e2.getMessage != null)
  }

  // ---- WAV codec -------------------------------------------------------

  test("Wav: roundtrip is exact including int16 extremes") {
    val samples = Array(0, 1, -1, 32767, -32768, 12345, -12345)
    val bytes = Wav.encodePcm16Mono(8000, samples)
    assert(bytes.length == 44 + samples.length * 2)
    val dec = Wav.decodePcm16Mono(bytes).get
    assert(dec.sampleRate == 8000)
    assert(dec.samples.toSeq == samples.toSeq)
  }

  test("Wav: skips unknown RIFF chunks (word-aligned) before data") {
    val base = Wav.encodePcm16Mono(16000, Array(5, -5, 7))
    // splice an odd-sized LIST chunk (3 bytes + pad) between fmt and data
    val insertAt = 12 + 8 + 16 // after fmt chunk
    val extra = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = base.take(insertAt) ++ extra ++ base.drop(insertAt)
    // patch RIFF size
    val riffLen = spliced.length - 8
    spliced(4) = (riffLen & 0xFF).toByte
    spliced(5) = ((riffLen >> 8) & 0xFF).toByte
    spliced(6) = ((riffLen >> 16) & 0xFF).toByte
    spliced(7) = ((riffLen >> 24) & 0xFF).toByte
    val dec = Wav.decodePcm16Mono(spliced)
    assert(dec.isDefined && dec.get.samples.toSeq == Seq(5, -5, 7))
  }

  test("Wav: corrupt payloads flag as None, never throw") {
    val good = Wav.encodePcm16Mono(16000, Array(1, 2, 3))
    assert(Wav.decodePcm16Mono(Array.emptyByteArray).isEmpty)
    assert(Wav.decodePcm16Mono("notawav".getBytes).isEmpty)
    assert(Wav.decodePcm16Mono(good.take(30)).isEmpty)          // truncated
    val stereo = good.clone; stereo(22) = 2                     // channels=2
    assert(Wav.decodePcm16Mono(stereo).isEmpty)
    val bits8 = good.clone; bits8(34) = 8                       // bits=8
    assert(Wav.decodePcm16Mono(bits8).isEmpty)
  }

  test("Wav: out-of-range samples are rejected at encode") {
    intercept[IllegalArgumentException] {
      Wav.encodePcm16Mono(8000, Array(40000))
    }
  }

  test("decodeWav pipeline: planted corruption flags decoded=false") {
    import graft.operators.Multimodal
    val gen = Seq((1L, 8000, Seq(3, -3, 9)), (2L, 8000, Seq(1, 1))).toDF(
      "media_id", "sample_rate", "samples")
    val wav = Multimodal.encodeWav(spark, gen)
    val corrupted = wav.select(col("media_id"),
      when(col("media_id") === 2L, expr("substring(payload, 1, 20)"))
        .otherwise(col("payload")).as("payload"))
    val out = Multimodal.audioFeatures(Multimodal.decodeWav(spark, corrupted).toDF())
      .select("media_id", "decoded", "n_samples", "energy")
      .as[(Long, Boolean, Option[Int], Option[Long])].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (1L, true, Some(3), Some(9L + 9L + 81L)),
      (2L, false, None, None)), out.toString)
  }

  // ---- global ntile --------------------------------------------------------

  test("globalNtile equals the unpartitioned ntile window bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    // skewed values + ties (v = i*i % 97 repeats) so bucket boundaries,
    // tie-breaks and the uneven fill rule are all exercised
    val df = (1 to 1013).map(i => (i.toLong, ((i * i) % 97).toLong)).toDF("id", "v")
    for (t <- Seq(2, 5, 7, 100)) {
      val got = graft.ops.Stats.globalNtile(df, col("v"), col("id"), t, "tile", buckets = 16)
        .select("id", "tile").as[(Long, Int)].collect().toMap
      val want = df.withColumn("tile",
          ntile(t).over(Window.orderBy(col("v"), col("id"))))
        .select("id", "tile").as[(Long, Int)].collect().toMap
      assert(got == want, s"nTiles=$t mismatch")
    }
  }

  test("globalNtile: fewer rows than tiles degenerates to tile = rank") {
    val df = Seq((10L, 5L), (20L, 1L), (30L, 5L)).toDF("id", "v")
    val got = graft.ops.Stats.globalNtile(df, col("v"), col("id"), 100, "tile")
      .orderBy("v", "id").select("tile").as[Int].collect().toSeq
    assert(got == Seq(1, 2, 3))
  }

  test("globalNtile: no unpartitioned window in the plan") {
    val df = (1 to 100).map(i => (i.toLong, (i % 7).toLong)).toDF("id", "v")
    val exec = graft.ops.Stats.globalNtile(df, col("v"), col("id"), 5, "tile")
      .queryExecution.executedPlan
    val bad = exec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(bad.isEmpty, s"unpartitioned window:\n$exec")
  }

  // ---- grouped two-level rank ---------------------------------------------

  test("groupedRank equals the per-group row_number window bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    // 3 groups, skewed repeated values (ties), plus a decimal value column
    // so the original-typed ordering (not the double bucket image) decides
    val df = (1 to 997).map(i => (i.toLong, s"g${i % 3}", ((i * i) % 53).toLong))
      .toDF("id", "g", "v")
      .withColumn("vd", (col("v") * lit(0.01)).cast("decimal(12,2)"))
    val got = graft.ops.Stats.groupedRank(df, Seq("g"), col("vd"), Seq(col("id")),
        "rk", Some("n"), buckets = 16)
      .select("id", "rk", "n").as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    val w = Window.partitionBy(col("g")).orderBy(col("vd"), col("id"))
    val wn = Window.partitionBy(col("g"))
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .select("id", "rk", "n").as[(Long, Long, Long)].collect().map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == want)
  }

  test("groupedNtile equals the per-group ntile window bit-for-bit") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 1013).map(i => (i.toLong, s"g${i % 4}", ((i * 7) % 29).toLong))
      .toDF("id", "g", "v")
    for (t <- Seq(2, 4, 5, 100)) {
      val got = graft.ops.Stats.groupedNtile(df, Seq("g"), col("v"), Seq(col("id")),
          t, "tile", buckets = 16)
        .select("id", "tile").as[(Long, Int)].collect().toMap
      val want = df.withColumn("tile",
          ntile(t).over(Window.partitionBy(col("g")).orderBy(col("v"), col("id"))))
        .select("id", "tile").as[(Long, Int)].collect().toMap
      assert(got == want, s"nTiles=$t mismatch")
    }
  }

  test("groupedRank: constant group and single-row group stay exact") {
    val df = Seq(
      ("a", 5L, 1L), ("a", 5L, 2L), ("a", 5L, 3L), // constant group
      ("b", 9L, 4L)) // singleton group
      .toDF("g", "v", "id")
    val got = graft.ops.Stats.groupedRank(df, Seq("g"), col("v"), Seq(col("id")),
        "rk", Some("n"))
      .select("g", "id", "rk", "n").as[(String, Long, Long, Long)].collect().toSet
    assert(got == Set(("a", 1L, 1L, 3L), ("a", 2L, 2L, 3L), ("a", 3L, 3L, 3L),
      ("b", 4L, 1L, 1L)))
  }

  test("the order-statistic catalog entries rank on (group, bucket) — never the group key alone") {
    // the VERDICT r9 weak family: each of these sorted a whole group on one
    // reducer via row_number() OVER (PARTITION BY lowCardKey ORDER BY …);
    // pin that every rank window in their plans now partitions on at least
    // two expressions (group + range bucket) and none is unpartitioned —
    // the ev_rfm precedent, generalized per-group
    for (name <- Seq("qt_mad", "qt_winsorize", "qt_ntile", "pf_iqr_outliers")) {
      val exec = SparkEntry.queries(name)(spark, sfDir).queryExecution.executedPlan
      val bad = exec.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.size < 2 => w
      }
      assert(bad.isEmpty, s"$name has a rank window on fewer than 2 partition keys:\n$exec")
    }
  }

  test("groupedRank: multi-key groups with separator bytes in their values cannot collide") {
    // with the r9 cast-and-concat key, ("xy","z") and ("x","yz")
    // built the same composite string and merged into one group — the
    // base64 encoding makes the key injective
    val df = Seq(
      ("xy", "z", 10L, 1L), ("xy", "z", 20L, 2L),
      ("x", "yz", 30L, 3L), ("x", "yz", 40L, 4L),
      (null, "V", 50L, 5L), ("N", null, 60L, 6L)) // null vs the literal sentinels
      .toDF("a", "b", "v", "id")
    val got = graft.ops.Stats.groupedRank(df, Seq("a", "b"), col("v"), Seq(col("id")),
        "rk", Some("n"))
      .select("id", "rk", "n").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    // four distinct groups of two/one rows — never a merged 4-row group
    assert(got == Map(1L -> (1L, 2L), 2L -> (2L, 2L), 3L -> (1L, 2L), 4L -> (2L, 2L),
      5L -> (1L, 1L), 6L -> (1L, 1L)), got.toString)
  }

  test("groupedRank: past the driver cap it falls back to the per-group window, same ranks") {
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 900).map(i => (i.toLong, s"g${i % 300}", ((i * 13) % 97).toLong))
      .toDF("id", "g", "v")
    // 300 groups x 16 buckets = 4800 > 1024: the fallback branch must take
    // over instead of throwing, and produce the identical rank/size pairs
    val got = graft.ops.Stats.groupedRank(df, Seq("g"), col("v"), Seq(col("id")),
        "rk", Some("n"), buckets = 16, maxDriverRows = 1024)
      .select("id", "rk", "n").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    val w = Window.partitionBy(col("g")).orderBy(col("v"), col("id"))
    val want = df.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("g"))))
      .select("id", "rk", "n").as[(Long, Long, Long)].collect()
      .map(t => t._1 -> (t._2, t._3)).toMap
    assert(got == want)
  }

  test("winsorize: null values pass through unclamped, bounds come from non-null rows") {
    val df = Seq(
      ("a", Some(1.0), 1L), ("a", Some(2.0), 2L), ("a", Some(3.0), 3L),
      ("a", Some(4.0), 4L), ("a", None, 5L),
      ("b", None, 6L)) // all-null group: rows survive with null bounds
      .toDF("g", "v", "id")
    val out = graft.ops.Aggregates.winsorize(df, Seq("g"), "v", 0.25, 0.75)
      .select("id", "v_lo", "v_hi", "v_clamped")
      .as[(Long, Option[Double], Option[Double], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L), "no row loss")
    // bounds over the 4 non-null values: rank ceil(.25*4)=1 -> 1.0,
    // ceil(.75*4)=3 -> 3.0; the null row keeps null clamp (greatest/least
    // skip nulls — without the guard it would "clamp" to hi)
    assert(out(5L) == ((Some(1.0), Some(3.0), None)), out(5L).toString)
    assert(out(4L) == ((Some(1.0), Some(3.0), Some(3.0))))
    assert(out(6L) == ((None, None, None)))
  }

  test("winsorize: a NULL group key still gets its bounds (null-safe join back)") {
    // groupedRank groups null keys together; a null-unsafe equi-join back
    // would silently return these rows unclamped with null bounds
    val df = Seq(
      (Option.empty[String], 1.0, 1L), (Option.empty[String], 2.0, 2L),
      (Option.empty[String], 3.0, 3L), (Option.empty[String], 40.0, 4L),
      (Some("a"), 7.0, 5L))
      .toDF("g", "v", "id")
    val out = graft.ops.Aggregates.winsorize(df, Seq("g"), "v", 0.25, 0.75)
      .select("id", "v_lo", "v_hi", "v_clamped")
      .as[(Long, Option[Double], Option[Double], Option[Double])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // null group: ranks over {1,2,3,40}: lo = rank 1 -> 1.0, hi = rank 3 -> 3.0
    assert(out(4L) == ((Some(1.0), Some(3.0), Some(3.0))), out(4L).toString)
    assert(out(1L) == ((Some(1.0), Some(3.0), Some(1.0))))
    assert(out(5L) == ((Some(7.0), Some(7.0), Some(7.0))))
  }

  test("globalNtile: extreme value spans bucket exactly (decimal fallback, no long overflow)") {
    // span > Long.MaxValue / 256 — the old long bucket arithmetic silently
    // overflowed to negative bucket ids here (VERDICT r9 #3)
    val big = Long.MaxValue / 3
    val df = Seq((1L, -big), (2L, -1000L), (3L, 0L), (4L, 1000L), (5L, big))
      .toDF("id", "v")
    val got = graft.ops.Stats.globalNtile(df, col("v"), col("id"), 5, "tile")
      .orderBy("v").select("tile").as[Int].collect().toSeq
    assert(got == Seq(1, 2, 3, 4, 5), got.toString)
  }

  test("rocAuc: hand-computed fixture with heavy ties (midrank), perfect and inverted edges") {
    // scores: pos = {3, 5, 5, 8}, neg = {1, 5, 7}
    // pairs (pos, neg): concordant = pos>neg, tie = 0.5
    //   3: >1                 -> 1
    //   5: >1, =5 (0.5)       -> 1.5  (x2 positives at 5 -> 3)
    //   8: >1, >5, >7         -> 3
    // AUC = (1 + 3 + 3) / (4*3) = 7/12
    val df = Seq(
      (3L, true), (5L, true), (5L, true), (8L, true),
      (1L, false), (5L, false), (7L, false)).toDF("v", "p")
    val r = graft.ops.Stats.rocAuc(df, col("p"), col("v")).head()
    assert(r.getLong(0) == 4 && r.getLong(1) == 3)
    assert(r.getDouble(2) == 14.0, s"auc_num 2*7: ${r.getDouble(2)}")
    assert(r.getDouble(3) == 14.0 / 24.0, s"auc: ${r.getDouble(3)}")

    // a perfect separator scores 1.0; the inverted one 0.0
    val sep = Seq((10L, true), (11L, true), (1L, false), (2L, false)).toDF("v", "p")
    assert(graft.ops.Stats.rocAuc(sep, col("p"), col("v")).head().getDouble(3) == 1.0)
    assert(graft.ops.Stats.rocAuc(sep, !col("p"), col("v")).head().getDouble(3) == 0.0)

    // bucketed two-level path == tiny-bucket path (offsets exercised)
    val wide = (1 to 500).map(i => (i.toLong * 37 % 211, i % 3 == 0)).toDF("v", "p")
    val a = graft.ops.Stats.rocAuc(wide, col("p"), col("v"), buckets = 256).head()
    val b = graft.ops.Stats.rocAuc(wide, col("p"), col("v"), buckets = 3).head()
    assert(a.getDouble(3) == b.getDouble(3) && a.getDouble(2) == b.getDouble(2))
  }

  test("prCurve: hand-computed points, tie handling, bucket-path equality") {
    // scores: pos = {3, 5, 5, 8}, neg = {1, 5, 7}; threshold = each
    // distinct score s, predict positive when v >= s:
    //   s=8: tp=1 fp=0 -> prec 1,    recall 1/4
    //   s=7: tp=1 fp=1 -> prec 1/2,  recall 1/4
    //   s=5: tp=3 fp=2 -> prec 3/5,  recall 3/4
    //   s=3: tp=4 fp=2 -> prec 4/6,  recall 1
    //   s=1: tp=4 fp=3 -> prec 4/7,  recall 1
    val df = Seq(
      (3L, true), (5L, true), (5L, true), (8L, true),
      (1L, false), (5L, false), (7L, false)).toDF("v", "p")
    val got = graft.ops.Stats.prCurve(df, col("p"), col("v"))
      .orderBy(col("score_cents").desc)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (8L, 1L, 0L, 1.0, 0.25),
      (7L, 1L, 1L, 0.5, 0.25),
      (5L, 3L, 2L, 3.0 / 5.0, 0.75),
      (3L, 4L, 2L, 4.0 / 6.0, 1.0),
      (1L, 4L, 3L, 4.0 / 7.0, 1.0)), got.toString)
    // MERGEABILITY: the curve folded from per-slice aucPartials (the
    // aucSink shape) equals the whole-input curve exactly — so a scored
    // stream can maintain a continuously-updated exact PR curve
    val s1 = graft.ops.Stats.aucPartials(df.filter(col("v") <= 4), col("p"), col("v"))
    val s2 = graft.ops.Stats.aucPartials(df.filter(col("v") > 4), col("p"), col("v"))
    val merged = graft.ops.Stats.prCurveFromPartials(s1.unionByName(s2))
      .orderBy(col("score_cents").desc)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(merged == got, "merged-partials curve diverged from the whole-input curve")
    // bucketed two-level path == tiny-bucket path (offsets exercised)
    val wide = (1 to 500).map(i => (i.toLong * 37 % 211, i % 3 == 0)).toDF("v", "p")
    val a = graft.ops.Stats.prCurve(wide, col("p"), col("v"), buckets = 256)
      .orderBy(col("score_cents")).collect().toSeq
    val b = graft.ops.Stats.prCurve(wide, col("p"), col("v"), buckets = 3)
      .orderBy(col("score_cents")).collect().toSeq
    assert(a == b)
  }

  // ---- edit distance dedup ------------------------------------------------

  test("editDistancePairs: catches boundary-straddling near-dups, skips far pairs") {
    val a = "the quick brown fox jumps over the lazy dog " * 2 // 88 chars
    val b = a.dropRight(30)                                    // 58 chars: bucket 0 vs 1 @64
    val far = "completely different content that shares nothing at all with the others"
    val df = Seq(
      (1L, a, "en"), (2L, b, "en"), (3L, far, "en"),
      (4L, a, "de")) // same text, different lang -> blocked apart
      .toDF("doc_id", "text", "lang")
      .withColumn("n_chars", length(col("text")))
    val got = graft.operators.Dedup.editDistancePairs(df, "doc_id", "text", "lang",
        "n_chars", bucketWidth = 64, prefixLen = 40, maxDist = 10)
      .select("doc_a", "doc_b", "lev").as[(Long, Long, Int)].collect().toSet
    // 1 and 2 share a 40-char prefix exactly (lev 0) and straddle the
    // 64-char bucket boundary — caught via the neighbor-bucket probe
    assert(got == Set((1L, 2L, 0)), got.toString)
  }
}
