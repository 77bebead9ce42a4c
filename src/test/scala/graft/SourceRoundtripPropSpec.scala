package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.sources.{Rds, Xlsx}

/** Property-style roundtrip nets for the two in-engine binary sources:
  * scalacheck generates adversarial content (XML metacharacters, CDATA
  * openers, pre-escaped entities, multi-byte/astral unicode, IEEE edge
  * doubles including -0.0 and subnormals), a fixed seed keeps the corpus
  * deterministic, and the whole corpus roundtrips through ONE write+read
  * per format (not one per case — Spark job overhead would dominate).
  *
  * Intentional exclusions, by design of the formats: NaN/Infinity are not
  * valid SpreadsheetML numbers (the xlsx sink writes them as blank cells),
  * R NA round-trips as null (so Double.NaN can't survive an rds trip), and
  * lone surrogates are not valid UTF-8.
  */
class SourceRoundtripPropSpec extends SparkTestBase {

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    Gen.listOfN(n, g).pureApply(Gen.Parameters.default, Seed(seed))

  private val piece = Gen.oneOf(
    "<", ">", "&", "\"", "'", " ", "  ", "é", "ß", "中文", "🙂", "\t",
    "a", "Z", "9", "_", "\\", "/", "=", ".", ",", "-", "]]>", "<![CDATA[",
    "&amp;", "&#60;", "<v>", "</t>", "x y", "trailing ")
  private val weirdString: Gen[String] =
    Gen.chooseNum(1, 12).flatMap(k => Gen.listOfN(k, piece).map(_.mkString))

  private val edgeDouble: Gen[Double] = Gen.frequency(
    3 -> Gen.chooseNum(-1.0e300, 1.0e300),
    1 -> Gen.oneOf(0.0, -0.0, 1.0e-300, java.lang.Double.MIN_VALUE,
      java.lang.Double.MAX_VALUE, -java.lang.Double.MAX_VALUE, 0.1, -0.1,
      1.0 / 3.0, math.Pi))

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = true),
    StructField("score", DoubleType, nullable = true),
    StructField("flag", BooleanType, nullable = true)))

  private def corpus(seed: Long, n: Int): Seq[Row] = {
    val names = sample(Gen.option(weirdString), n, seed)
    val scores = sample(Gen.option(edgeDouble), n, seed + 1)
    val flags = sample(Gen.option(Gen.oneOf(true, false)), n, seed + 2)
    (0 until n).map(i => Row(i.toLong, names(i).orNull,
      scores(i).map(java.lang.Double.valueOf).orNull,
      flags(i).map(java.lang.Boolean.valueOf).orNull))
  }

  private def roundtrip(write: (org.apache.spark.sql.DataFrame, String) => Unit,
      read: String => org.apache.spark.sql.DataFrame, file: String): Unit = {
    val rows = corpus(20260813L, 200)
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJavaList), schema)
    val path = java.nio.file.Files.createTempDirectory("prop").toString + "/" + file
    write(df, path)
    val back = read(path).orderBy("id").collect().toSeq
    val want = df.orderBy("id").collect().toSeq
    assert(back.size == want.size, s"row count ${back.size} != ${want.size}")
    back.zip(want).foreach { case (b, w) =>
      assert(b == w, s"roundtrip diverged:\n  got  $b\n  want $w")
    }
  }

  private implicit class SeqOps(rows: Seq[Row]) {
    def asJavaList: java.util.List[Row] = {
      val l = new java.util.ArrayList[Row](rows.size)
      rows.foreach(l.add)
      l
    }
  }

  test("xlsx roundtrip survives 200 scalacheck-adversarial rows") {
    roundtrip((df, p) => Xlsx.write(df, p, "data", Seq("id")),
      p => Xlsx.read(spark, p, "data", schema), "t.xlsx")
  }

  test("rds roundtrip survives IEEE edge doubles and adversarial strings") {
    roundtrip((df, p) => Rds.write(df, p, Seq("id")),
      p => Rds.read(spark, p, schema), "t.rds")
  }

  test("avro roundtrip survives the same adversarial corpus") {
    roundtrip((df, p) => graft.sources.Avro.write(df, p, Seq("id")),
      p => graft.sources.Avro.read(spark, p, schema), "t.avro")
  }

  test("avro: binary columns round-trip, nested types refuse loudly") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("payload", BinaryType, nullable = true)))
    val rows = Seq(Row(1L, Array[Byte](0, 1, -1, 127, -128)), Row(2L, null))
    val df = spark.createDataFrame(
      new java.util.ArrayList[Row](rows.asJavaList), schema)
    val path = java.nio.file.Files.createTempDirectory("avro").toString + "/b.avro"
    graft.sources.Avro.write(df, path, Seq("id"))
    val back = graft.sources.Avro.read(spark, path, schema).orderBy("id").collect()
    assert(back(0).getAs[Array[Byte]](1).toSeq == Seq[Byte](0, 1, -1, 127, -128))
    assert(back(1).isNullAt(1))
    val nested = StructType(Seq(StructField("a", ArrayType(LongType))))
    val err = intercept[IllegalArgumentException](graft.sources.Avro.avroSchema(nested))
    assert(err.getMessage.contains("flat primitive"))
  }

  test("zip shards roundtrip scalacheck-adversarial names and all-byte payloads") {
    import org.apache.spark.sql.functions._
    // names: adversarial unicode (no '/' — zip paths — and no NUL); payloads:
    // arbitrary bytes including empty, 0x00 runs and high-bit values
    val nameGen = Gen.chooseNum(1, 12).flatMap(k => Gen.listOfN(k, Gen.oneOf(
      "a", "Z", "9", "_", " ", "é", "中", "🙂", ".", "-", "=", "&", "]", "[")).map(_.mkString))
    val payloadGen = Gen.chooseNum(0, 600)
      .flatMap(k => Gen.listOfN(k, Gen.chooseNum(-128, 127).map(_.toByte)).map(_.toArray))
    val n = 120
    val names = sample(nameGen, n, 7L).zipWithIndex.map { case (s, i) => s"$i-$s" } // unique
    val payloads = sample(payloadGen, n, 8L)
    val rows = (0 until n).map(i => Row((i % 5).toLong, names(i), payloads(i)))
    val schema = StructType(Seq(
      StructField("shard", LongType, nullable = false),
      StructField("name", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = false)))
    val df = spark.createDataFrame(new java.util.ArrayList[Row](rows.asJavaList), schema)
    val dir = java.nio.file.Files.createTempDirectory("prop-zip").toString
    graft.sources.Zip.writeShards(df, dir)
    val back = graft.sources.Zip.read(spark, dir)
      .select(col("name"), col("content")).collect()
      .map(r => r.getString(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
    assert(back.size == n)
    (0 until n).foreach(i => assert(back(names(i)) == payloads(i).toSeq,
      s"payload diverged for '${names(i)}'"))
  }

  test("avi gray8 roundtrip survives scalacheck geometries and frame counts") {
    val cases = sample(for {
      w <- Gen.chooseNum(1, 37)
      h <- Gen.chooseNum(1, 23)
      nf <- Gen.chooseNum(1, 5)
      seedPx <- Gen.chooseNum(0, 1000)
    } yield (w, h, nf, seedPx), 60, 11L)
    cases.foreach { case (w, h, nf, seedPx) =>
      val frames = (0 until nf).map(f =>
        Array.tabulate(w * h)(i => (seedPx + f * 41 + i * 7) % 256))
      val v = graft.sources.Avi.decodeGrayFrames(
        graft.sources.Avi.encodeGray8Frames(w, h, 24, frames)).get
      assert(v.width == w && v.height == h && v.frames.size == nf,
        s"geometry/frames diverged at ${w}x$h nf=$nf")
      v.frames.zip(frames).foreach { case (got, want) =>
        assert(got.toSeq == want.toSeq, s"pixels diverged at ${w}x$h nf=$nf")
      }
    }
  }
}
