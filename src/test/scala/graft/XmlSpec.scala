package graft

import org.apache.spark.sql.functions._
import graft.sources.Xml
import graft.sources.Xml.Field

class XmlSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("xml_spec").toString + "/t"

  test("roundtrip: escaping, null-vs-empty, multi-partition documents") {
    val fields = Seq(Field("id", "bigint"), Field("s", "string"), Field("v", "double"))
    val rows = Seq(
      (1L, "plain", 1.5),
      (2L, "<tag> & \"quoted\" 'apos'", -0.25),
      (3L, null.asInstanceOf[String], 2.0),
      (4L, "", 3.0),
      (5L, "&amp; already-escaped-looking", 0.0),
      (6L, "unicode é 漢 🎈", 1e300))
    val df = rows.toDF("id", "s", "v").repartition(3)
    val path = tmp()
    Xml.write(df, path, fields)
    val back = Xml.read(spark, path, fields).orderBy("id")
      .as[(Long, String, Double)].collect().toSeq
    assert(back == rows.sortBy(_._1))
    // null and empty are DIFFERENT after the round-trip
    val s3 = Xml.read(spark, path, fields).filter(col("id") === 3).select("s").head()
    val s4 = Xml.read(spark, path, fields).filter(col("id") === 4).select("s").head()
    assert(s3.isNullAt(0) && !s4.isNullAt(0) && s4.getString(0) == "")
  }

  test("each part file is a complete standalone XML document") {
    val fields = Seq(Field("id", "bigint"))
    val path = tmp()
    Xml.write(spark.range(10).select(col("id")).repartition(2), path, fields)
    val parts = new java.io.File(path).listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length == 2)
    parts.foreach { f =>
      val txt = new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      assert(txt.startsWith("<table>") && txt.trim.endsWith("</table>"), f.getName)
      // stdlib parser accepts it standalone
      val n = Xml.parseDocument(txt.getBytes("UTF-8"), Seq("id")).size
      assert(n > 0)
    }
  }

  test("control characters are rejected loudly at write") {
    val fields = Seq(Field("id", "bigint"), Field("s", "string"))
    val df = Seq((1L, "badchar")).toDF("id", "s")
    val e = intercept[Exception] { Xml.write(df, tmp(), fields) }
    assert(e.getMessage != null)
  }

  test("foreign documents: unknown elements skipped, missing fields null") {
    val doc =
      """<table>
        |  <r><id>7</id><extra>ignored</extra><s>hello</s></r>
        |  <r><s>only-s</s></r>
        |</table>""".stripMargin
    val rows = Xml.parseDocument(doc.getBytes("UTF-8"), Seq("id", "s")).toSeq
    assert(rows.size == 2)
    assert(rows(0).getString(0) == "7" && rows(0).getString(1) == "hello")
    assert(rows(1).isNullAt(0) && rows(1).getString(1) == "only-s")
  }

  test("malformed document fails loudly with the file path") {
    val path = tmp()
    new java.io.File(path).mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$path/part-00000"),
      "<table><r><id>1</id>".getBytes("UTF-8")) // truncated
    val e = intercept[Exception] {
      Xml.read(spark, path, Seq(Field("id", "bigint"))).collect()
    }
    assert(e.getMessage.contains("malformed") || e.getCause != null)
  }
}
