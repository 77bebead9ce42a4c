package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.Tar

/** WebDataset-style tar shards: roundtrip through the engine, byte
  * determinism, and — because the format must interoperate with real
  * training loaders — independent validation with commons-compress's
  * TarArchiveInputStream (a parser this engine does not implement).
  */
class TarSpec extends SparkTestBase {
  import spark.implicits._

  private def sampleDf = {
    val docs = graft.core.Tables.documents(spark, sfDir).limit(40)
    docs.select(
      (col("doc_id") % 3).as("shard"),
      concat(col("doc_id").cast("string"), lit(".txt")).as("name"),
      col("text").cast("binary").as("payload"),
      col("doc_id"), col("text"))
  }

  test("tar shards roundtrip: every (name, payload) survives, grouped by shard") {
    val dir = Files.createTempDirectory("graft-tar").toString
    val df = sampleDf.cache()
    Tar.writeShards(df.select("shard", "name", "payload"), dir)
    val back = Tar.read(spark, dir)
      .select(col("name"), col("content").cast("string").as("text"))
      .as[(String, String)].collect().toMap
    val expected = df.select(col("name"), col("text")).as[(String, String)].collect().toMap
    assert(back == expected)
    // one tar per shard, shard id in the file name (the local Hadoop FS
    // also writes hidden .crc sidecars — not part of the format)
    val files = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted.toSeq
    assert(files == Seq("shard-00000.tar", "shard-00001.tar", "shard-00002.tar"))
  }

  test("shards are byte-deterministic and readable by commons-compress") {
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    val dirA = Files.createTempDirectory("graft-tar-a").toString
    val dirB = Files.createTempDirectory("graft-tar-b").toString
    val df = sampleDf.select("shard", "name", "payload").cache()
    Tar.writeShards(df, dirA)
    Tar.writeShards(df, dirB)
    val fa = java.nio.file.Paths.get(dirA, "shard-00001.tar")
    val fb = java.nio.file.Paths.get(dirB, "shard-00001.tar")
    // retry-stability: two independent writes produce identical bytes
    assert(java.util.Arrays.equals(Files.readAllBytes(fa), Files.readAllBytes(fb)))
    // independent parser: commons-compress must see the same entries, in
    // name order, with identical payloads and sane metadata
    val tin = new TarArchiveInputStream(new java.io.ByteArrayInputStream(
      Files.readAllBytes(fa)))
    val entries = Iterator.continually(tin.getNextEntry).takeWhile(_ != null).map { e =>
      val buf = new Array[Byte](e.getSize.toInt)
      var read = 0
      while (read < buf.length) read += tin.read(buf, read, buf.length - read)
      (e.getName, buf, e.getLastModifiedDate.getTime, e.isFile)
    }.toSeq
    tin.close()
    val expected = df.filter(col("shard") === 1)
      .select(col("name"), col("payload")).orderBy("name")
      .as[(String, Array[Byte])].collect().toSeq
    assert(entries.map(_._1) == expected.map(_._1), "entry names/order")
    entries.zip(expected).foreach { case ((_, got, mtime, isFile), (_, want)) =>
      assert(java.util.Arrays.equals(got, want), "payload bytes")
      assert(mtime == 0L && isFile, "deterministic metadata, regular files")
    }
  }

  test("a truncated archive fails loudly instead of fabricating zero payloads") {
    val dir = Files.createTempDirectory("graft-tar-t").toString
    Tar.writeShards(Seq((0L, "doc.bin", Array.fill[Byte](700)(42)))
      .toDF("shard", "name", "payload"), dir)
    val whole = Files.readAllBytes(java.nio.file.Paths.get(dir, "shard-00000.tar"))
    // cut mid-payload: header says 700 bytes but only 300 follow. A fresh
    // dir, or Hadoop's local-FS .crc sidecar flags the cut before the
    // parser even runs (also a fine outcome — but not the guard under test)
    val dir2 = Files.createTempDirectory("graft-tar-t2")
    Files.write(dir2.resolve("cut.tar"),
      java.util.Arrays.copyOfRange(whole, 0, 512 + 300))
    val err = intercept[org.apache.spark.SparkException] {
      Tar.read(spark, dir2.toString).count()
    }
    val msg = err.getMessage + Option(err.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("truncated"), s"want truncation error, got: $msg")
    // cut at a BLOCK boundary (entry complete, end marker missing): the
    // size-bounds check cannot see this one — only the end-of-archive
    // requirement does. 512 header + 1024 padded payload = 1536 bytes.
    val dir3 = Files.createTempDirectory("graft-tar-t3")
    Files.write(dir3.resolve("cut2.tar"), java.util.Arrays.copyOfRange(whole, 0, 1536))
    val err2 = intercept[org.apache.spark.SparkException] {
      Tar.read(spark, dir3.toString).count()
    }
    val msg2 = err2.getMessage + Option(err2.getCause).map(_.getMessage).getOrElse("")
    assert(msg2.contains("end-of-archive"), s"want marker error, got: $msg2")
  }

  test("names over 100 bytes are rejected at write; empty payloads roundtrip") {
    val dir = Files.createTempDirectory("graft-tar-e").toString
    val long = Seq((0L, "x" * 101, Array[Byte]())).toDF("shard", "name", "payload")
    val err = intercept[org.apache.spark.SparkException] {
      Tar.writeShards(long, dir)
    }
    assert(err.getMessage.contains("100 bytes") ||
      Option(err.getCause).exists(_.getMessage.contains("100 bytes")))
    val empty = Seq((0L, "empty.bin", Array[Byte]()), (0L, "one.bin", Array[Byte](7)))
      .toDF("shard", "name", "payload")
    Tar.writeShards(empty, dir)
    val back = Tar.read(spark, dir).select("name", "content")
      .as[(String, Array[Byte])].collect().toMap
    assert(back("empty.bin").isEmpty && back("one.bin").toSeq == Seq(7.toByte))
  }
}
