package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Zip

/** Zip shard source/sink: roundtrip through the engine, retry
  * byte-stability, independent validation with the JDK's own ZipFile
  * (central-directory parser — a code path the streaming reader does not
  * use), and binary-payload fidelity.
  */
class ZipSpec extends SparkTestBase {
  import spark.implicits._

  private def sampleDf = {
    val docs = graft.core.Tables.documents(spark, sfDir).limit(40)
    docs.select(
      (col("doc_id") % 3).as("shard"),
      concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
      col("text").cast("binary").as("payload"),
      col("doc_id"), col("text"))
  }

  test("zip shards roundtrip: every (name, payload) survives, grouped by shard") {
    val dir = Files.createTempDirectory("graft-zip").toString
    val df = sampleDf.cache()
    Zip.writeShards(df.select("shard", "name", "payload"), dir)
    val back = Zip.read(spark, dir)
      .select(col("name"), col("content").cast("string").as("text"))
      .as[(String, String)].collect().toMap
    val expected = df.select(col("name"), col("text")).as[(String, String)].collect().toMap
    assert(back == expected)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(files == Seq("shard-00000.zip", "shard-00001.zip", "shard-00002.zip"))
  }

  test("shards are retry-byte-stable and readable by the JDK central-directory parser") {
    val dirA = Files.createTempDirectory("graft-zip-a").toString
    val dirB = Files.createTempDirectory("graft-zip-b").toString
    val df = sampleDf.select("shard", "name", "payload").cache()
    Zip.writeShards(df, dirA)
    Zip.writeShards(df, dirB)
    val fa = java.nio.file.Paths.get(dirA, "shard-00001.zip")
    val fb = java.nio.file.Paths.get(dirB, "shard-00001.zip")
    assert(java.util.Arrays.equals(Files.readAllBytes(fa), Files.readAllBytes(fb)),
      "two writes of the same shard must be byte-identical (retry stability)")
    // ZipFile parses via the central directory at EOF — independent of
    // the sequential local-header path the streaming reader walks
    val zf = new java.util.zip.ZipFile(fa.toFile)
    try {
      import scala.jdk.CollectionConverters._
      val entries = zf.entries().asScala.toSeq
      assert(entries.nonEmpty)
      entries.foreach { e =>
        assert(e.getMethod == java.util.zip.ZipEntry.STORED)
        val in = zf.getInputStream(e)
        val bytes = in.readAllBytes()
        in.close()
        assert(bytes.length.toLong == e.getSize)
      }
    } finally zf.close()
  }

  test("binary payloads (all 256 byte values) round-trip verbatim") {
    val dir = Files.createTempDirectory("graft-zip-bin").toString
    val payload = Array.tabulate[Byte](512)(i => i.toByte)
    val df = Seq((0L, "blob.bin", payload)).toDF("shard", "name", "payload")
    Zip.writeShards(df, dir)
    val back = Zip.read(spark, dir).select("content").collect()
    assert(back.length == 1)
    assert(java.util.Arrays.equals(back.head.getAs[Array[Byte]](0), payload))
  }

  test("overwrite clears stale shards from a previous run") {
    val dir = Files.createTempDirectory("graft-zip-ow").toString
    Zip.writeShards(Seq((0L, "a", "x".getBytes), (5L, "b", "y".getBytes))
      .toDF("shard", "name", "payload"), dir)
    // second run with fewer shards: shard-00005.zip must disappear
    Zip.writeShards(Seq((0L, "c", "z".getBytes)).toDF("shard", "name", "payload"), dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(files == Seq("shard-00000.zip"), s"stale shards not cleared: $files")
    val back = Zip.read(spark, dir).select("name").as[String].collect().toSeq
    assert(back == Seq("c"))
  }
}
