package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.TypedCsv

class TypedCsvSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("scenario", StringType),
    StructField("year", IntegerType),
    StructField("value", DoubleType)))

  test("S4 sink + S1 typed scan round-trips with schema and projection") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val df = Seq(("WEO", 2021, 1.5), ("NZE", 2020, 2.5)).toDF("scenario", "year", "value")
    TypedCsv.writeGolden(df, Seq("scenario", "year"), s"$dir/out")
    val back = TypedCsv.read(spark, s"$dir/out", schema, wanted = Seq("scenario", "value"))
    assert(back.columns.toSeq == Seq("scenario", "value"))
    assert(back.schema("value").dataType == DoubleType)
    assert(back.count() == 2)
  }

  test("S2 delimited scan reads `;` files") {
    val dir = Files.createTempDirectory("graft-delim").toString
    Files.writeString(java.nio.file.Paths.get(dir, "d.csv"),
      "scenario;year;value\nIPR;2030;3.25\n")
    val back = TypedCsv.read(spark, s"$dir/d.csv", schema, delimiter = ";")
    assert(back.as[(String, Int, Double)].collect().toSeq == Seq(("IPR", 2030, 3.25)))
  }

  test("lenient scan quarantines malformed rows instead of nulling or failing") {
    val dir = Files.createTempDirectory("graft-lenient").toString
    Files.writeString(java.nio.file.Paths.get(dir, "d.csv"),
      "scenario,year,value\nWEO,2021,1.5\nBROKEN,notayear,xx\nNZE,2020,2.5\n")
    val back = TypedCsv.readLenient(spark, s"$dir/d.csv", schema).cache()
    val good = back.filter(col("_corrupt_record").isNull)
    val bad = back.filter(col("_corrupt_record").isNotNull)
    assert(good.count() == 2)
    assert(bad.count() == 1)
    // the reject carries the raw line for quarantine, not a nulled ghost
    assert(bad.select("_corrupt_record").as[String].head().startsWith("BROKEN"))
  }

  test("golden sink output is deterministically ordered") {
    val dir = Files.createTempDirectory("graft-golden").toString
    val df = Seq(("b", 2, 1.0), ("a", 1, 2.0), ("a", 2, 3.0)).toDF("scenario", "year", "value")
    TypedCsv.writeGolden(df, Seq("scenario", "year"), s"$dir/g")
    val lines = spark.read.text(s"$dir/g").as[String].collect().toSeq
    assert(lines.head.startsWith("scenario"))
    assert(lines.tail == Seq("a,1,2.0", "a,2,3.0", "b,2,1.0"))
  }
}
