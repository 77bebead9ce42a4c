package graft.sources

import java.io.{ByteArrayInputStream, DataInputStream, DataOutputStream}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** In-engine RDS scan/sink (SURVEY S6).
  *
  * The reference loads `bench_regions.rds` with `readr::read_rds`
  * (reference: data-raw/run_workflow.R:107). RDS is R's serialization
  * format; the XDR layout is publicly documented in the R Internals manual
  * ("Serialization Formats"), so the scan is implemented directly on the
  * JDK — no R runtime, no external library.
  *
  * Coverage: format versions 2 and 3, plain or gzip streams, and the SEXP
  * types a data.frame/tibble of atomic columns uses — VECSXP, STRSXP,
  * INTSXP, REALSXP, LGLSXP, CHARSXP, pairlist attributes, symbols and
  * back-references, plus the ALTREP compact forms R >= 3.5 emits for such
  * columns (compact_intseq/compact_realseq expanded, wrap_* unwrapped;
  * other ALTREP classes fail with a self-explaining error). Factors
  * (INTSXP + levels attribute) decode to their level strings, matching how
  * readr/dplyr present them. R's typed
  * missing values map to SQL NULL: NA_integer_/NA (INT_MIN sentinel) and
  * NA_real_ (the 0x7FF00000000007A2 NaN payload R uses).
  *
  * Scale shape mirrors [[Xlsx]]: one .rds holds one in-memory R object
  * (inherently dimension-scale — R built it single-process), so the
  * distributed axis is many files: the reader goes through `binaryFile`
  * and parses each object on an executor.
  */
object Rds {

  // ---------------------------------------------------------------- read

  /** Read every .rds under `path` (each a data.frame/tibble) into one
    * DataFrame with the declared schema; columns are matched by name,
    * absent names yield nulls, values cast from their R type.
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    readVia(spark, path, schema, parseDataFrame)

  /** Read the NAMED data.frame out of every `.rda` workspace under `path`
    * — the reference's shipped package fixtures (the rda files under `data/`), same
    * executor-distributed binaryFile shape as [[read]].
    */
  def readRda(spark: SparkSession, path: String, objectName: String,
      schema: StructType): DataFrame =
    readVia(spark, path, schema, b => parseRdaDataFrame(b, objectName))

  private def readVia(spark: SparkSession, path: String, schema: StructType,
      parseFn: Array[Byte] => (Seq[String], Seq[IndexedSeq[String]])): DataFrame = {
    val raw = StructType(schema.fields.map(f => StructField(f.name, StringType, nullable = true)))
    val wanted = schema.fieldNames.toSeq
    val bin = spark.read.format("binaryFile").load(path).select(col("content"))
    val rows = bin.flatMap { r =>
      val (names, cols) = parseFn(r.getAs[Array[Byte]](0))
      val idx = names.zipWithIndex.toMap
      val take = wanted.map(n => idx.getOrElse(n, -1))
      val nRows = if (cols.isEmpty) 0 else cols.head.length
      (0 until nRows).iterator.map { i =>
        Row.fromSeq(take.map(c => if (c >= 0) cols(c)(i) else null))
      }
    }(Encoders.row(raw))
    rows.select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
  }

  /** Parse one serialized data.frame: (column names, columns as string
    * cells with null = NA). Factors are decoded to level strings. Exposed
    * for tests.
    */
  def parseDataFrame(bytes: Array[Byte]): (Seq[String], Seq[IndexedSeq[String]]) =
    dataFrameOf(parse(bytes))

  /** [[parseDataFrame]] for one named object of an RDA workspace. */
  def parseRdaDataFrame(bytes: Array[Byte], objectName: String): (Seq[String], Seq[IndexedSeq[String]]) = {
    val objs = parseWorkspace(bytes)
    val obj = objs.collectFirst { case (n, o) if n == objectName => o }.getOrElse(
      throw new IllegalArgumentException(
        s"object '$objectName' not in workspace (has: ${objs.map(_._1).mkString(", ")})"))
    dataFrameOf(obj)
  }

  /** Every object name a workspace binds (for discovery/specs). */
  def rdaObjectNames(bytes: Array[Byte]): Seq[String] = parseWorkspace(bytes).map(_._1)

  private def dataFrameOf(obj: RObj): (Seq[String], Seq[IndexedSeq[String]]) = {
    val df = obj match {
      case v: RVec => v
      case other => throw new IllegalArgumentException(
        s"expected a data.frame (generic vector), got ${other.getClass.getSimpleName}")
    }
    val names = df.attr("names") match {
      case Some(RStrings(vs, _)) => vs.map(v => if (v == null) "" else v)
      case _ => throw new IllegalArgumentException("data.frame has no names attribute")
    }
    val cols = df.items.map {
      case RStrings(vs, _) => vs
      case f: RInts if f.levels.isDefined =>
        val lv = f.levels.get
        f.vs.map(v => if (v == null || v < 1 || v > lv.length) null else lv(v - 1))
      case RInts(vs, _) => vs.map(v => if (v == null) null else v.toString)
      case RDoubles(vs, _) => vs.map(v => if (v == null) null else v.toString)
      case RBools(vs, _)   => vs.map(v => if (v == null) null else v.toString)
      case other => throw new IllegalArgumentException(
        s"unsupported column type ${other.getClass.getSimpleName}")
    }
    require(cols.forall(_.length == cols.headOption.map(_.length).getOrElse(0)),
      "ragged data.frame columns")
    (names, cols)
  }

  // R's NA_real_: an IEEE NaN with payload 1954 (the year; documented in
  // R Internals / arithmetic.c)
  private val NaRealBits = 0x7FF00000000007A2L

  private[sources] sealed trait RObj {
    def attrs: Map[String, RObj] = Map.empty
    def attr(n: String): Option[RObj] = attrs.get(n)
  }
  private[sources] case class RNull() extends RObj
  private[sources] case class RSym(name: String) extends RObj
  private[sources] case class RChar(s: String) extends RObj
  private[sources] case class RStrings(vs: IndexedSeq[String],
      override val attrs: Map[String, RObj] = Map.empty) extends RObj
  private[sources] case class RInts(vs: IndexedSeq[Integer],
      override val attrs: Map[String, RObj] = Map.empty) extends RObj {
    def levels: Option[IndexedSeq[String]] = attrs.get("levels").collect {
      case RStrings(l, _) => l
    }
  }
  private[sources] case class RDoubles(vs: IndexedSeq[java.lang.Double],
      override val attrs: Map[String, RObj] = Map.empty) extends RObj
  private[sources] case class RBools(vs: IndexedSeq[java.lang.Boolean],
      override val attrs: Map[String, RObj] = Map.empty) extends RObj
  private[sources] case class RVec(items: IndexedSeq[RObj],
      override val attrs: Map[String, RObj] = Map.empty) extends RObj

  /** Decompress by MAGIC, not extension: gzip (saveRDS default), bzip2
    * (the R package-data default save(..., compress = "bzip2") — every
    * reference rda fixture ships this way), xz, or plain. bzip2/xz decode
    * via commons-compress/xz, both on Spark's runtime classpath.
    */
  private[sources] def decompressed(bytes: Array[Byte]): java.io.InputStream = {
    val raw = new ByteArrayInputStream(bytes)
    def b(i: Int) = bytes(i) & 0xff
    if (bytes.length >= 2 && b(0) == 0x1f && b(1) == 0x8b) new GZIPInputStream(raw)
    else if (bytes.length >= 3 && b(0) == 'B' && b(1) == 'Z' && b(2) == 'h')
      new org.apache.commons.compress.compressors.bzip2.BZip2CompressorInputStream(raw)
    else if (bytes.length >= 6 && b(0) == 0xfd && b(1) == '7' && b(2) == 'z' &&
      b(3) == 'X' && b(4) == 'Z' && b(5) == 0)
      new org.tukaani.xz.XZInputStream(raw)
    else raw
  }

  private[sources] def parse(bytes: Array[Byte]): RObj = {
    val in = new DataInputStream(new java.io.BufferedInputStream(decompressed(bytes)))
    val m1 = in.read(); val m2 = in.read()
    require(m1 == 'X' && m2 == '\n',
      s"unsupported RDS stream (expected XDR 'X\\n' header, got ${m1.toChar}${m2.toChar}; " +
        "ascii/binary-native formats are not supported)")
    val res = parseStream(in)
    in.close()
    res
  }

  /** Parse an RDA WORKSPACE envelope (`save()` output — `RDX2\n`/`RDX3\n`
    * magic around the same XDR stream, top object a symbol-tagged
    * pairlist of bindings) into its named objects. This is how the
    * reference ships its package fixtures (the rda files under `data/`, R/data.R:7-27).
    */
  private[sources] def parseWorkspace(bytes: Array[Byte]): Seq[(String, RObj)] = {
    val in = new DataInputStream(new java.io.BufferedInputStream(decompressed(bytes)))
    val magic = new Array[Byte](5)
    in.readFully(magic)
    val ms = new String(magic, "US-ASCII")
    require(ms == "RDX2\n" || ms == "RDX3\n",
      s"not an RData workspace (expected RDX2/RDX3 magic, got ${ms.trim})")
    val m1 = in.read(); val m2 = in.read()
    require(m1 == 'X' && m2 == '\n', "unsupported RData stream (XDR only)")
    val top = parseStream(in)
    in.close()
    // bindings pairlist: (attr, tag=RSym(name), car=value, cdr=rest)
    val out = Seq.newBuilder[(String, RObj)]
    var node = top
    var done = false
    while (!done) node match {
      case RNull() => done = true
      case RVec(IndexedSeq(_, RSym(nm), car, cdr), _) =>
        out += (nm -> car)
        node = cdr
      case other =>
        throw new IllegalArgumentException(s"malformed workspace pairlist: $other")
    }
    out.result()
  }

  private def parseStream(in: DataInputStream): RObj = {
    val version = in.readInt()
    in.readInt() // writer R version
    in.readInt() // minimal reader version
    require(version == 2 || version == 3, s"unsupported RDS format version $version")
    if (version == 3) { // native encoding declaration
      val n = in.readInt()
      in.skipBytes(n)
    }
    val refs = scala.collection.mutable.ArrayBuffer.empty[RObj]

    def readItem(): RObj = {
      val flags = in.readInt()
      val tpe = flags & 0xff
      val hasAttr = ((flags >> 9) & 1) == 1
      val hasTag = ((flags >> 10) & 1) == 1
      tpe match {
        case 254 => RNull() // NILVALUE
        case 255 => // REFSXP
          val idx0 = flags >> 8
          val idx = if (idx0 == 0) in.readInt() else idx0
          refs(idx - 1)
        case 1 => // SYMSXP
          val nm = readItem() match {
            case RChar(s) => s
            case other => throw new IllegalArgumentException(s"symbol printname $other")
          }
          val sym = RSym(nm)
          refs += sym
          sym
        case 9 => // CHARSXP
          val n = in.readInt()
          if (n == -1) RChar(null)
          else {
            val b = new Array[Byte](n)
            in.readFully(b)
            RChar(new String(b, "UTF-8"))
          }
        case 2 => // LISTSXP pairlist node
          val nodeAttr = if (hasAttr) readItem() else RNull()
          val tag = if (hasTag) readItem() else RNull()
          val car = readItem()
          val cdr = readItem()
          RVec(IndexedSeq(nodeAttr, tag, car, cdr)) // interpreted by readAttrs
        case 10 => // LGLSXP
          val n = in.readInt()
          val vs = IndexedSeq.fill(n) {
            val v = in.readInt()
            if (v == Int.MinValue) null
            else java.lang.Boolean.valueOf(v != 0)
          }
          RBools(vs, readAttrs(hasAttr))
        case 13 => // INTSXP
          val n = in.readInt()
          val vs = IndexedSeq.fill(n) {
            val v = in.readInt()
            if (v == Int.MinValue) null else Integer.valueOf(v)
          }
          RInts(vs, readAttrs(hasAttr))
        case 14 => // REALSXP
          val n = in.readInt()
          val vs = IndexedSeq.fill(n) {
            val bits = in.readLong()
            if (bits == NaRealBits) null
            else java.lang.Double.valueOf(java.lang.Double.longBitsToDouble(bits))
          }
          RDoubles(vs, readAttrs(hasAttr))
        case 16 => // STRSXP
          val n = in.readInt()
          val vs = IndexedSeq.fill(n) {
            readItem() match {
              case RChar(s) => s
              case other =>
                throw new IllegalArgumentException(s"STRSXP element $other")
            }
          }
          RStrings(vs, readAttrs(hasAttr))
        case 19 => // VECSXP
          val n = in.readInt()
          val vs = IndexedSeq.fill(n)(readItem())
          RVec(vs, readAttrs(hasAttr))
        case 238 => // ALTREP_SXP: class info, serialized state, attributes
          val info = readItem()
          val state = readItem()
          val attrs = pairlistToMap(readItem())
          expandAltrep(info, state, attrs)
        case other =>
          throw new IllegalArgumentException(
            s"unsupported SEXP type $other (RDS scan covers data.frames of atomic columns)")
      }
    }

    // ALTREP payloads (R >= 3.5): expand the compact representations a
    // data.frame column can arrive as. Class info is a tagless pairlist
    // (class symbol, package symbol, base type).
    def expandAltrep(info: RObj, state: RObj, attrs: Map[String, RObj]): RObj = {
      val className = info match {
        case RVec(IndexedSeq(_, _, RSym(nm), _), _) => nm
        case _ => "<unknown>"
      }
      className match {
        case "compact_intseq" => state match {
          // state = REALSXP c(n, start, step)
          case RDoubles(IndexedSeq(n, start, step), _) if n != null && start != null && step != null =>
            RInts((0 until n.toInt).map(i =>
              Integer.valueOf((start.doubleValue + i * step.doubleValue).toInt)), attrs)
          case other => throw new IllegalArgumentException(
            s"malformed compact_intseq state: $other")
        }
        case "compact_realseq" => state match {
          case RDoubles(IndexedSeq(n, start, step), _) if n != null && start != null && step != null =>
            RDoubles((0 until n.toInt).map(i =>
              java.lang.Double.valueOf(start.doubleValue + i * step.doubleValue)), attrs)
          case other => throw new IllegalArgumentException(
            s"malformed compact_realseq state: $other")
        }
        // attribute-wrapper classes: state = CONS(wrapped vector, metadata)
        case "wrap_integer" | "wrap_real" | "wrap_logical" | "wrap_string" => state match {
          case RVec(IndexedSeq(_, _, wrapped, _), _) => withAttrs(wrapped, attrs)
          case other => throw new IllegalArgumentException(
            s"malformed $className state: $other")
        }
        case other => throw new IllegalArgumentException(
          s"unsupported ALTREP class '$other' (RDS scan expands compact_intseq, " +
            "compact_realseq and wrap_* wrappers; re-save with " +
            "saveRDS(as.data.frame(lapply(df, as.vector))) to materialize)")
      }
    }

    def withAttrs(o: RObj, a: Map[String, RObj]): RObj =
      if (a.isEmpty) o else o match {
        case RStrings(vs, a0) => RStrings(vs, a0 ++ a)
        case RInts(vs, a0)    => RInts(vs, a0 ++ a)
        case RDoubles(vs, a0) => RDoubles(vs, a0 ++ a)
        case RBools(vs, a0)   => RBools(vs, a0 ++ a)
        case RVec(vs, a0)     => RVec(vs, a0 ++ a)
        case other            => other
      }

    def pairlistToMap(node0: RObj): Map[String, RObj] = {
      val out = Map.newBuilder[String, RObj]
      var node = node0
      while (node != RNull()) node match {
        case RVec(IndexedSeq(_, RSym(nm), car, cdr), _) =>
          out += (nm -> car)
          node = cdr
        case other =>
          throw new IllegalArgumentException(s"malformed attribute pairlist: $other")
      }
      out.result()
    }

    // attributes arrive as a pairlist after the payload
    def readAttrs(has: Boolean): Map[String, RObj] =
      if (!has) Map.empty
      else pairlistToMap(readItem())

    readItem()
  }

  // --------------------------------------------------------------- write

  /** Driver-side sink cap — an .rds is one in-memory R object; exports
    * beyond this belong in parquet.
    */
  val MaxRows: Int = 10 * 1000 * 1000

  /** Serialize `df` as a version-2 XDR data.frame readable by base R's
    * `readRDS` / readr's `read_rds`. Deterministic: sorts by `sortKeys`
    * first. Long columns are written as REALSXP (R has no int64 in base
    * types); `gzip = true` (default) matches saveRDS's default stream.
    */
  def write(df: DataFrame, path: String, sortKeys: Seq[String] = Nil,
      gzip: Boolean = true): Unit = {
    val sorted = if (sortKeys.isEmpty) df else df.orderBy(sortKeys.map(col): _*)
    val rows = sorted.limit(MaxRows + 1).collect()
    require(rows.length <= MaxRows, s"rds sink capped at $MaxRows rows — use parquet")
    val schema = df.schema
    val file = new java.io.File(path)
    Option(file.getParentFile).foreach(_.mkdirs())
    val fos = new java.io.FileOutputStream(file)
    val out = new DataOutputStream(
      new java.io.BufferedOutputStream(if (gzip) new GZIPOutputStream(fos) else fos))
    out.write('X'); out.write('\n')
    out.writeInt(2)        // format version
    out.writeInt(0x040300) // "written by" R 4.3.0
    out.writeInt(0x020300) // minimum reader 2.3.0
    def flags(tpe: Int, obj: Boolean = false, attr: Boolean = false, tag: Boolean = false,
        levels: Int = 0): Int =
      tpe | (if (obj) 1 << 8 else 0) | (if (attr) 1 << 9 else 0) |
        (if (tag) 1 << 10 else 0) | (levels << 12)
    def writeChar(s: String): Unit =
      if (s == null) { out.writeInt(flags(9)); out.writeInt(-1) }
      else {
        val b = s.getBytes("UTF-8")
        out.writeInt(flags(9, levels = 1 << 3)) // UTF-8 encoding bit
        out.writeInt(b.length)
        out.write(b)
      }
    def writeStrings(vs: Seq[String]): Unit = {
      out.writeInt(flags(16))
      out.writeInt(vs.length)
      vs.foreach(writeChar)
    }
    // a fresh symbol each time (no back-references) — larger but valid,
    // and each symbol is written at most three times per file
    def writeAttr(name: String)(value: => Unit): Unit = {
      out.writeInt(flags(2, tag = true))
      out.writeInt(flags(1)) // SYMSXP
      writeChar(name)
      value
    }
    val n = rows.length
    out.writeInt(flags(19, obj = true, attr = true))
    out.writeInt(schema.length)
    schema.fields.zipWithIndex.foreach { case (f, ci) =>
      f.dataType match {
        case IntegerType =>
          out.writeInt(flags(13)); out.writeInt(n)
          rows.foreach(r => out.writeInt(if (r.isNullAt(ci)) Int.MinValue else r.getInt(ci)))
        case BooleanType =>
          out.writeInt(flags(10)); out.writeInt(n)
          rows.foreach(r => out.writeInt(
            if (r.isNullAt(ci)) Int.MinValue else if (r.getBoolean(ci)) 1 else 0))
        case LongType =>
          out.writeInt(flags(14)); out.writeInt(n)
          rows.foreach(r => out.writeLong(
            if (r.isNullAt(ci)) NaRealBits
            else java.lang.Double.doubleToRawLongBits(r.getLong(ci).toDouble)))
        case DoubleType | FloatType =>
          out.writeInt(flags(14)); out.writeInt(n)
          rows.foreach(r => out.writeLong(
            if (r.isNullAt(ci)) NaRealBits
            else java.lang.Double.doubleToRawLongBits(
              r.get(ci).asInstanceOf[Number].doubleValue())))
        case StringType =>
          writeStrings(rows.map(r => if (r.isNullAt(ci)) null else r.getString(ci)).toSeq)
        case other =>
          throw new IllegalArgumentException(
            s"rds sink supports string/boolean/int/long/double columns; ${f.name} is $other")
      }
    }
    writeAttr("names")(writeStrings(schema.fieldNames.toSeq))
    writeAttr("row.names") { // compact form: c(NA, -n)
      out.writeInt(flags(13)); out.writeInt(2)
      out.writeInt(Int.MinValue); out.writeInt(-n)
    }
    writeAttr("class")(writeStrings(Seq("data.frame")))
    out.writeInt(flags(254)) // NILVALUE terminates the attribute pairlist
    out.close()
  }
}
