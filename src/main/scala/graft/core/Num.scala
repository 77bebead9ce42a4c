package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.WindowSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Numeric helpers for oracle-exact aggregation.
  *
  * Double sums/averages are order-dependent (partial aggregation order differs
  * between any two engines, and between runs under AQE). Casting each input to
  * a fixed-scale decimal makes the reduction exact and therefore
  * order-independent: the same bag of inputs yields bit-identical results in
  * Spark and in any oracle engine that does the same cast. The final cast back
  * to double is a single deterministic conversion.
  *
  * This matters beyond testing: at cluster scale it makes aggregation results
  * reproducible across different partition counts and speculative retries.
  */
object Num {
  /** Scale 6: exact for inputs with <= 6 decimal places, and the scaled
    * int128 of any sum below ~9e9 stays under 2^53 so the final
    * decimal->double cast is the correctly-rounded IEEE value in BOTH
    * engines (DuckDB's cast drifts 1 ulp once the scaled integer exceeds
    * 2^53 — verified empirically at scale 10).
    */
  private val Dec = DecimalType(30, 6)

  /** Order-independent sum of a double column, returned as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Order-independent mean (null-skipping, like R's mean(na.rm=TRUE) /
    * reference R/prepare_price_data_long.R:78-92). All-null group -> null.
    */
  def davg(c: Column): Column = (sum(c.cast(Dec)).cast("double") / count(c))

  /** Order-independent windowed sum (for analytic totals, SURVEY W2).
    * The cast must wrap the windowed aggregate, not the other way round.
    */
  def dsumOver(c: Column, w: WindowSpec): Column = sum(c.cast(Dec)).over(w).cast("double")
}
