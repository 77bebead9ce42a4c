package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Data-layout expressions for write-time clustering (beyond-reference).
  *
  * Z-ordering (Morton curve) maps a pair of sort dimensions onto one
  * integer whose ordering preserves locality in BOTH dimensions, so
  * `repartitionByRange(zValue) .sortWithinPartitions(zValue)` before a
  * parquet write clusters rows such that min/max row-group statistics
  * prune scans filtered on EITHER dimension — the standard multi-column
  * data-skipping layout at lake scale. Pure bitwise Column expressions
  * (codegen'd, no shuffle of their own).
  */
object Layout {

  /** Spread the low 16 bits of `v` to the even bit positions of a 32-bit
    * value: the classic mask-shift doubling network (public-domain "Bit
    * Twiddling Hacks" interleave).
    */
  private def spread16(v: Column): Column = {
    val m0 = lit(0x00FF00FFL)
    val m1 = lit(0x0F0F0F0FL)
    val m2 = lit(0x33333333L)
    val m3 = lit(0x55555555L)
    val s0 = (v.bitwiseOR(shiftleft(v, 8))).bitwiseAND(m0)
    val s1 = (s0.bitwiseOR(shiftleft(s0, 4))).bitwiseAND(m1)
    val s2 = (s1.bitwiseOR(shiftleft(s1, 2))).bitwiseAND(m2)
    (s2.bitwiseOR(shiftleft(s2, 1))).bitwiseAND(m3)
  }

  /** 32-bit Morton z-value of the low 16 bits of (x, y): x occupies the
    * even bit positions, y the odd ones.
    */
  def zValue(x: Column, y: Column): Column =
    spread16(x.bitwiseAND(lit(0xFFFFL)))
      .bitwiseOR(shiftleft(spread16(y.bitwiseAND(lit(0xFFFFL))), 1))
}
