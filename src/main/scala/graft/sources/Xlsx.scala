package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.util.zip.{ZipEntry, ZipInputStream, ZipOutputStream}
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants}

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** In-engine xlsx scan/sink (SURVEY S5).
  *
  * The reference ingests the AR company workbook with
  * `readxl::read_xlsx(path, sheet = ...)` (reference:
  * R/prepare_asset_impact_data.R:7-41, data-raw/prep_datalake.R:119-134).
  * xlsx is just a zip of SpreadsheetML parts, so the scan is implemented
  * directly on the JDK (java.util.zip + StAX) — no external library.
  *
  * Scale shape: one workbook is format-capped at 2^20 rows, so a single
  * file is inherently dimension-scale; the distributed axis is MANY files.
  * The reader loads workbooks through Spark's `binaryFile` source and
  * parses each on an executor (`flatMap`), so a directory of thousands of
  * workbooks scans in parallel with no driver involvement. The writer is
  * an export sink with the same golden-determinism contract as
  * [[TypedCsv.writeGolden]] (sort, then single bounded file).
  *
  * Supported cell types: shared strings (`t="s"`), inline strings
  * (`t="inlineStr"`), formula-cached strings (`t="str"`), booleans
  * (`t="b"`), and numbers (default) — everything the reference's workbooks
  * use. Dates are numeric in xlsx and the reference has none (SURVEY §1.2).
  */
object Xlsx {

  // ---------------------------------------------------------------- read

  /** Read one sheet of every .xlsx under `path` into a DataFrame with the
    * declared schema. The first row is the header (readxl default); schema
    * fields are matched to header names, absent headers yield null columns,
    * and raw cell text is cast to each field's type.
    */
  def read(
      spark: SparkSession,
      path: String,
      sheet: String,
      schema: StructType): DataFrame = {
    val raw = StructType(schema.fields.map(f => StructField(f.name, StringType, nullable = true)))
    val wanted = schema.fieldNames.toSeq
    val bin = spark.read.format("binaryFile")
      // a directory may hold sibling non-workbook files (README, .csv twins);
      // loading them would fail the zip parse on an executor
      .option("pathGlobFilter", "*.xlsx")
      .load(path)
      .select(col("content"))
    val rows = bin.flatMap { r =>
      val bytes = r.getAs[Array[Byte]](0)
      val grid = parseSheet(bytes, sheet)
      if (grid.isEmpty) Iterator.empty
      else {
        val header = grid.head.map(Option(_).getOrElse("")).toIndexedSeq
        val idx: Map[String, Int] = header.zipWithIndex.toMap
        val take: Seq[Int] = wanted.map(n => idx.getOrElse(n, -1))
        grid.iterator.drop(1).map { cells =>
          Row.fromSeq(take.map(i => if (i >= 0 && i < cells.length) cells(i) else null))
        }
      }
    }(Encoders.row(raw))
    rows.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  /** Parse the named sheet of a workbook into rows of raw cell strings
    * (null = absent cell). Exposed for tests.
    */
  def parseSheet(bytes: Array[Byte], sheet: String): Vector[Array[String]] = {
    val parts = readZip(bytes)
    def part(name: String): Array[Byte] =
      parts.getOrElse(name, throw new IllegalArgumentException(s"xlsx missing part $name"))
    val rels = parseRels(part("xl/_rels/workbook.xml.rels"))
    val sheets = parseWorkbookSheets(part("xl/workbook.xml"))
    val rid = sheets.getOrElse(sheet,
      throw new IllegalArgumentException(
        s"sheet '$sheet' not found; have ${sheets.keys.mkString(", ")}"))
    val target0 = rels.getOrElse(rid,
      throw new IllegalArgumentException(s"workbook relationship $rid missing"))
    val target = if (target0.startsWith("/")) target0.drop(1) else "xl/" + target0
    val shared = parts.get("xl/sharedStrings.xml").map(parseSharedStrings).getOrElse(Vector.empty)
    parseWorksheet(part(target), shared)
  }

  private def readZip(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Map.newBuilder[String, Array[Byte]]
    var e: ZipEntry = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += (e.getName -> zin.readAllBytes())
      e = zin.getNextEntry
    }
    zin.close()
    out.result()
  }

  private def xmlReader(bytes: Array[Byte]) = {
    val f = XMLInputFactory.newInstance()
    // hard-disable entity/DTD processing: workbook content is untrusted
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty("javax.xml.stream.isSupportingExternalEntities", false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes), "UTF-8")
  }

  /** workbook.xml: sheet name -> relationship id. */
  private def parseWorkbookSheets(bytes: Array[Byte]): Map[String, String] = {
    val r = xmlReader(bytes)
    val out = Map.newBuilder[String, String]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
        var name: String = null; var rid: String = null
        for (i <- 0 until r.getAttributeCount) {
          r.getAttributeLocalName(i) match {
            case "name" => name = r.getAttributeValue(i)
            case "id"   => rid = r.getAttributeValue(i) // r:id
            case _      => ()
          }
        }
        if (name != null && rid != null) out += (name -> rid)
      }
    }
    r.close()
    out.result()
  }

  /** workbook.xml.rels: relationship id -> target path. */
  private def parseRels(bytes: Array[Byte]): Map[String, String] = {
    val r = xmlReader(bytes)
    val out = Map.newBuilder[String, String]
    while (r.hasNext) {
      if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
        var id: String = null; var tgt: String = null
        for (i <- 0 until r.getAttributeCount) {
          r.getAttributeLocalName(i) match {
            case "Id"     => id = r.getAttributeValue(i)
            case "Target" => tgt = r.getAttributeValue(i)
            case _        => ()
          }
        }
        if (id != null && tgt != null) out += (id -> tgt)
      }
    }
    r.close()
    out.result()
  }

  /** sharedStrings.xml: one entry per `<si>`, concatenating every `<t>`
    * inside it (plain and rich-text runs).
    */
  private def parseSharedStrings(bytes: Array[Byte]): Vector[String] = {
    val r = xmlReader(bytes)
    val out = Vector.newBuilder[String]
    var inSi = false
    var inT = false
    val sb = new StringBuilder
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "si" => inSi = true; sb.clear()
            case "t" if inSi => inT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inT =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "t" => inT = false
            case "si" => inSi = false; out += sb.toString
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    out.result()
  }

  /** Worksheet XML -> dense row grid of raw cell strings. */
  private def parseWorksheet(bytes: Array[Byte], shared: Vector[String]): Vector[Array[String]] = {
    val r = xmlReader(bytes)
    val rows = Vector.newBuilder[Array[String]]
    var cells: scala.collection.mutable.ArrayBuffer[(Int, String)] = null
    var cellCol = -1
    var cellType = "n"
    var seqCol = 0 // fallback when the optional r= attribute is absent
    var inV = false
    var inIsT = false
    val sb = new StringBuilder
    def flushCell(): Unit = {
      if (cellCol >= 0) {
        val txt = sb.toString
        val v = cellType match {
          case "s" =>
            // a styled empty cell can serialize as <c t="s"/> with no <v>
            txt.trim.toIntOption match {
              case Some(i) if i >= 0 && i < shared.length => shared(i)
              case _ => null
            }
          case "b" => if (txt.trim == "1") "true" else "false"
          case _   => txt // n, str, inlineStr already materialized in sb
        }
        cells += ((cellCol, v))
        cellCol = -1
      }
    }
    while (r.hasNext) {
      r.next() match {
        case XMLStreamConstants.START_ELEMENT =>
          r.getLocalName match {
            case "row" =>
              cells = scala.collection.mutable.ArrayBuffer.empty
              seqCol = 0
            case "c" if cells != null =>
              var ref: String = null
              cellType = "n"
              for (i <- 0 until r.getAttributeCount) {
                r.getAttributeLocalName(i) match {
                  case "r" => ref = r.getAttributeValue(i)
                  case "t" => cellType = r.getAttributeValue(i)
                  case _   => ()
                }
              }
              cellCol = if (ref != null) colIndex(ref) else seqCol
              seqCol = cellCol + 1
              sb.clear()
            case "v" => inV = true
            case "t" if cellType == "inlineStr" => inIsT = true
            case _ => ()
          }
        case XMLStreamConstants.CHARACTERS if inV || inIsT =>
          sb.append(r.getText)
        case XMLStreamConstants.END_ELEMENT =>
          r.getLocalName match {
            case "v" => inV = false
            case "t" => inIsT = false
            case "c" => flushCell()
            case "row" =>
              if (cells != null) {
                val width = if (cells.isEmpty) 0 else cells.map(_._1).max + 1
                val arr = new Array[String](width)
                cells.foreach { case (i, v) => arr(i) = v }
                rows += arr
                cells = null
              }
            case _ => ()
          }
        case _ => ()
      }
    }
    r.close()
    rows.result()
  }

  /** "BC12" -> 0-based column index 54. */
  def colIndex(ref: String): Int = {
    var i = 0
    var acc = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      acc = acc * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  /** 0-based column index -> "A".."Z","AA".. */
  def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val rem = (n - 1) % 26
      sb.insert(0, ('A' + rem).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  // --------------------------------------------------------------- write

  /** Format row cap (xlsx sheets hold at most 2^20 rows; one is the
    * header). The writer is an EXPORT sink for dimension-scale tables —
    * large outputs stay parquet (S3).
    */
  val MaxRows: Int = (1 << 20) - 1

  /** Deterministic single-workbook sink: sort by `sortKeys`, then write one
    * sheet with a header row. Strings are written inline (`t="inlineStr"`,
    * no sharedStrings indirection), numerics as number cells via toString
    * (Double.toString round-trips bit-exactly through parseDouble; NaN and
    * ±Infinity are not representable in SpreadsheetML and are written as
    * absent cells), booleans as `t="b"`, nulls as absent cells.
    */
  def write(df: DataFrame, path: String, sheet: String = "Sheet1",
      sortKeys: Seq[String] = Nil): Unit = {
    val sorted = if (sortKeys.isEmpty) df else df.orderBy(sortKeys.map(col): _*)
    val rows = sorted.limit(MaxRows + 1).collect()
    require(rows.length <= MaxRows,
      s"xlsx sheet capped at $MaxRows data rows — export a filtered/aggregated table, or use parquet")
    val schema = df.schema
    val file = new java.io.File(path)
    Option(file.getParentFile).foreach(_.mkdirs())
    val zos = new ZipOutputStream(new java.io.FileOutputStream(file))
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |</Types>""".stripMargin)
    put("_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    put("xl/workbook.xml",
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
         |<sheets><sheet name="${escape(sheet)}" sheetId="1" r:id="rId1"/></sheets>
         |</workbook>""".stripMargin)
    put("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""").append('\n')
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    def strCell(ref: String, s: String): Unit =
      sb.append(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${escape(s)}</t></is></c>""")
    sb.append("""<row r="1">""")
    schema.fieldNames.zipWithIndex.foreach { case (n, i) => strCell(s"${colRef(i)}1", n) }
    sb.append("</row>")
    rows.zipWithIndex.foreach { case (row, ri) =>
      val rn = ri + 2
      sb.append(s"""<row r="$rn">""")
      schema.fields.zipWithIndex.foreach { case (f, ci) =>
        if (!row.isNullAt(ci)) {
          val ref = s"${colRef(ci)}$rn"
          f.dataType match {
            case StringType => strCell(ref, row.getString(ci))
            case BooleanType =>
              sb.append(s"""<c r="$ref" t="b"><v>${if (row.getBoolean(ci)) 1 else 0}</v></c>""")
            case _: NumericType =>
              // NaN/Infinity are not valid SpreadsheetML numbers (Excel would
              // flag the workbook corrupt) — emit an absent cell, like null
              val v = row.get(ci)
              val finite = v match {
                case d: java.lang.Double => !d.isNaN && !d.isInfinite
                case f: java.lang.Float  => !f.isNaN && !f.isInfinite
                case _                   => true
              }
              if (finite) sb.append(s"""<c r="$ref"><v>$v</v></c>""")
            case other =>
              throw new IllegalArgumentException(
                s"xlsx sink supports string/boolean/numeric columns; ${f.name} is $other")
          }
        }
      }
      sb.append("</row>")
    }
    sb.append("</sheetData></worksheet>")
    put("xl/worksheets/sheet1.xml", sb.toString)
    zos.close()
  }

  private def escape(s: String): String =
    s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c   => c.toString
    }
}
