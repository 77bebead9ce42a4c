package graft.sources

import java.io.ByteArrayInputStream

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** In-engine Avro container-file scan/sink on the JDK + the avro-core jar
  * Spark already ships (no spark-avro datasource in this deployment —
  * same posture as the Xlsx/Rds sources: the format logic lives in the
  * engine, the DISTRIBUTION comes from Spark's `binaryFile` source, one
  * container file per executor-side parse). The writer is the
  * deterministic driver-side golden twin, row-capped like the Rds sink —
  * at scale the write axis is many files produced upstream; this sink
  * exists to round-trip fixtures and goldens.
  *
  * Type surface: long/int/double/float/string/boolean/binary, each as the
  * standard nullable union `["null", T]`. Nested records/arrays are out of
  * scope (the engine's lake formats for nested data are parquet/orc/jsonl).
  */
object Avro {

  val MaxRows: Int = 1000000

  private def avroType(dt: DataType): String = dt match {
    case LongType    => "long"
    case IntegerType => "int"
    case DoubleType  => "double"
    case FloatType   => "float"
    case StringType  => "string"
    case BooleanType => "boolean"
    case BinaryType  => "bytes"
    case other => throw new IllegalArgumentException(
      s"avro sink supports flat primitive columns, not $other")
  }

  /** The record schema as Avro JSON: every field `["null", T]` (Avro's
    * standard nullable spelling), names taken verbatim.
    */
  def avroSchema(schema: StructType, name: String = "row"): Schema = {
    val fields = schema.fields.map { f =>
      // names interpolate into schema JSON — reject anything outside
      // Avro's name grammar up front instead of throwing an opaque
      // SchemaParseException (or corrupting the JSON) from inside avro
      require(f.name.matches("[A-Za-z_][A-Za-z0-9_]*"),
        s"avro sink requires [A-Za-z_][A-Za-z0-9_]* column names, got '${f.name}'")
      s"""{"name":"${f.name}","type":["null","${avroType(f.dataType)}"]}"""
    }.mkString(",")
    new Schema.Parser().parse(
      s"""{"type":"record","name":"$name","fields":[$fields]}""")
  }

  /** Distributed scan: every `*.avro` container under `path` parses on an
    * executor; the declared `schema` selects and types the columns.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.avro")
      .load(path)
      .select(col("content"))
    val names = schema.fieldNames.toIndexedSeq
    val rows = bin.flatMap { r =>
      val in = new DataFileStream[GenericRecord](
        new ByteArrayInputStream(r.getAs[Array[Byte]](0)),
        new GenericDatumReader[GenericRecord]())
      val it = new Iterator[Row] {
        def hasNext: Boolean = { val h = in.hasNext; if (!h) in.close(); h }
        def next(): Row = {
          val rec = in.next()
          Row.fromSeq(names.map { n =>
            rec.get(n) match {
              case null                        => null
              case u: org.apache.avro.util.Utf8 => u.toString
              case b: java.nio.ByteBuffer      =>
                val a = new Array[Byte](b.remaining()); b.duplicate().get(a); a
              case v                           => v
            }
          })
        }
      }
      it
    }(Encoders.row(schema))
    rows.select(names.map(col).toSeq: _*)
  }

  /** Deterministic golden sink: rows sorted by `sortKeys` into ONE
    * deflate-compressed container file readable by any Avro tooling.
    */
  def write(df: DataFrame, path: String, sortKeys: Seq[String] = Nil): Unit = {
    val sorted = if (sortKeys.isEmpty) df else df.orderBy(sortKeys.map(col): _*)
    val rows = sorted.limit(MaxRows + 1).collect()
    require(rows.length <= MaxRows, s"avro sink capped at $MaxRows rows — use parquet")
    val schema = df.schema
    val avSchema = avroSchema(schema)
    val file = new java.io.File(path)
    Option(file.getParentFile).foreach(_.mkdirs())
    val writer = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](avSchema))
    writer.setCodec(org.apache.avro.file.CodecFactory.deflateCodec(6))
    writer.create(avSchema, file)
    try {
      rows.foreach { row =>
        val rec = new GenericData.Record(avSchema)
        schema.fields.zipWithIndex.foreach { case (f, i) =>
          val v = if (row.isNullAt(i)) null else f.dataType match {
            case BinaryType => java.nio.ByteBuffer.wrap(row.getAs[Array[Byte]](i))
            case _          => row.get(i).asInstanceOf[AnyRef]
          }
          rec.put(f.name, v)
        }
        writer.append(rec)
      }
    } finally writer.close()
  }
}
