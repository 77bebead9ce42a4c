package graft.sources

import java.io.ByteArrayInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** In-engine XML record source/sink (JDK-only: StAX, no external library —
  * the [[Xlsx]] posture applied to bare XML record feeds, the other
  * enterprise interchange format long-lived systems still emit).
  *
  * Layout contract: a DIRECTORY of `part-*.txt` files, each a complete
  * standalone XML document `<table><r><field>…</field>…</r>…</table>`.
  * The sink is fully distributed — each task renders its partition to one
  * document through the native text sink, so Spark's file-commit protocol
  * provides task-attempt atomicity for free (no hand-rolled temp/rename —
  * the failure mode the Tar sink had to solve manually). The reader
  * distributes over files via `binaryFile` (XML is not line-splittable;
  * one document per task is the same bounded-file contract as Xlsx/Avro,
  * with file size governed by the writer's partitioning).
  *
  * Null handling is explicit: a null field OMITS its element, an empty
  * string writes an empty element — the round-trip preserves the
  * null/empty distinction most ad-hoc XML writers destroy.
  */
object Xml {

  final case class Field(name: String, sqlType: String)

  private val RowTag = "r"
  private val RootTag = "table"

  /** Escape the five XML-significant characters (writer side). */
  private[graft] def escape(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&' => sb.append("&amp;")
        case '<' => sb.append("&lt;")
        case '>' => sb.append("&gt;")
        case '"' => sb.append("&quot;")
        case '\'' => sb.append("&apos;")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Distributed sink: each partition becomes one complete XML document in
    * one `part-*` file. Field values render via their string form (cast
    * upstream decides formatting); control characters are rejected loudly
    * — XML 1.0 cannot represent them, and silent stripping would break
    * the lossless round-trip this source promises.
    */
  def write(df: DataFrame, path: String, fields: Seq[Field]): Unit = {
    require(fields.nonEmpty, "xml write needs at least one field")
    val cols = fields.map { f =>
      val c = col(f.name).cast("string")
      when(c.isNull, lit(null))
        .otherwise(when(c.rlike("[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"),
          assert_true(lit(false), lit(s"xml write: control character in ${f.name} " +
            "(not representable in XML 1.0)")).cast("string"))
          .otherwise(c))
        .as(f.name)
    }
    val names = fields.map(_.name)
    val spark = df.sparkSession
    import spark.implicits._
    df.select(cols: _*).mapPartitions { rows =>
      val body = rows.map { r =>
        val sb = new java.lang.StringBuilder(64)
        sb.append('<').append(RowTag).append('>')
        names.zipWithIndex.foreach { case (n, i) =>
          if (!r.isNullAt(i)) {
            sb.append('<').append(n).append('>')
            sb.append(escape(r.getString(i)))
            sb.append("</").append(n).append('>')
          }
        }
        sb.append("</").append(RowTag).append('>')
        sb.toString
      }
      Iterator(s"<$RootTag>") ++ body ++ Iterator(s"</$RootTag>")
    }.write.mode("overwrite").text(path)
  }

  /** Distributed scan: `binaryFile` over the part files, one StAX pull
    * parse per document. Unknown elements inside a row are ignored
    * (forward-compatible schema evolution); a malformed document fails
    * loudly with its file path — a silent skip would drop data.
    */
  def read(spark: SparkSession, path: String, fields: Seq[Field]): DataFrame = {
    require(fields.nonEmpty, "xml read needs at least one field")
    val names = fields.map(_.name)
    val schema = StructType(names.map(StructField(_, StringType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "part-*")
      .load(path)
      .select("path", "content")
    val parsed = bin.flatMap { row =>
      val file = row.getString(0)
      val bytes = row.getAs[Array[Byte]](1)
      try parseDocument(bytes, names)
      catch {
        case e: Exception =>
          throw new IllegalArgumentException(s"xml read: malformed document $file", e)
      }
    }(enc)
    parsed.select(fields.map(f => col(f.name).cast(f.sqlType).as(f.name)): _*)
  }

  /** Parse one document to rows of nullable strings in `names` order. */
  private[graft] def parseDocument(bytes: Array[Byte], names: Seq[String]): Iterator[Row] = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    val r = f.createXMLStreamReader(new ByteArrayInputStream(bytes), "UTF-8")
    val idx = names.zipWithIndex.toMap
    val out = Vector.newBuilder[Row]
    var cur: Array[String] = null
    var curField = -1
    val sb = new java.lang.StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          val n = r.getLocalName
          if (n == RowTag) { cur = new Array[String](names.length); curField = -1 }
          else if (cur != null) {
            curField = idx.getOrElse(n, -1)
            sb.setLength(0)
            // an empty element is the empty string, not null
            if (curField >= 0) cur(curField) = ""
          }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
          if (curField >= 0) sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          val n = r.getLocalName
          if (n == RowTag && cur != null) {
            out += Row.fromSeq(cur.toSeq)
            cur = null
          } else if (curField >= 0 && idx.get(n).contains(curField)) {
            cur(curField) = sb.toString
            curField = -1
          }
        case _ =>
      }
    }
    r.close()
    out.result().iterator
  }
}
