package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S14: fixed-width text scan/sink — the mainframe/COBOL interchange
  * layout (every field at a fixed byte offset, records newline-separated)
  * that long-lived enterprise feeds still emit.
  *
  * Both directions are pure Catalyst expressions over Spark's native text
  * source: the sink right-pads each value into its slot (`rpad`) and
  * concatenates; the scan is one `substring` + `rtrim` + cast per field —
  * codegen'd, no per-row interpreter, and column PRUNING still works (an
  * unprojected field's substring is dropped by the optimizer, though the
  * line bytes are necessarily read — fixed-width has no columnar layout;
  * that is the format's cost, not the reader's).
  *
  * Contract (checked loudly at write): values must fit their width and
  * must not carry trailing whitespace — rtrim-on-read could not tell
  * padding from payload. Nulls are written as all-spaces and read back as
  * null (empty-after-rtrim), so round-trips are lossless for the
  * fit-checked domain.
  */
object FixedWidth {

  final case class Field(name: String, width: Int, dataType: String)

  /** Write `df` as fixed-width lines in `fields` order (one text part per
    * task — the sink is Spark's text source, so partitioning/committing
    * behave exactly like any file sink).
    */
  def write(df: DataFrame, path: String, fields: Seq[Field]): Unit = {
    require(fields.nonEmpty, "no fields")
    val slots: Seq[Column] = fields.map { f =>
      val s = col(f.name).cast("string")
      val fits = s.isNull ||
        (length(s) <= f.width && s === rtrim(s))
      val guarded = when(fits, coalesce(s, lit("")))
        .otherwise(raise_error(concat(
          lit(s"fixed-width field ${f.name} (w=${f.width}) overflow/trailing-space: '"),
          s, lit("'"))))
      rpad(guarded, f.width, " ")
    }
    df.select(concat(slots: _*).as("value")).write.mode("overwrite").text(path)
  }

  /** Scan fixed-width lines back into typed columns. Short lines (legacy
    * writers truncate trailing spaces) read as if space-padded; a line
    * LONGER than the layout is a layout mismatch and fails loudly rather
    * than silently truncating payload.
    */
  def read(spark: SparkSession, path: String, fields: Seq[Field]): DataFrame = {
    val total = fields.map(_.width).sum
    val offsets = fields.scanLeft(1)((o, f) => o + f.width)
    val cols = fields.zip(offsets).map { case (f, off) =>
      val raw = rtrim(substring(col("value"), off, f.width))
      when(raw =!= "", raw).otherwise(lit(null)).cast(f.dataType).as(f.name)
    }
    spark.read.text(path)
      .select(
        when(length(col("value")) <= total, col("value"))
          .otherwise(raise_error(concat(
            lit(s"fixed-width line longer than layout ($total): '"),
            col("value"), lit("'")))).as("value"))
      .select(cols: _*)
  }
}
