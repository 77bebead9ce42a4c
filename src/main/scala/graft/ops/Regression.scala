package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** W9: per-group OLS fit + extrapolation (reference
  * R/prepare_price_data_long.R:725-734 and R/prepare_LCOE_adjusted_price_
  * data.R:197-205 fit lm(price ~ year) on a fit window per group and predict
  * missing years).
  *
  * Closed form, no MLlib: slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²),
  * intercept = (Σy − slope·Σx)/n. The four sums are computed in fixed-scale
  * decimal so the fit is bit-reproducible regardless of partial-aggregation
  * order (see graft.core.Num) — then one broadcast join back onto the frame.
  */
object Regression {
  // scale 6 keeps the scaled sums under 2^53 (see graft.core.Num)
  private val Dec = DecimalType(30, 6)

  /** Returns df grouped by `keys` with columns keys :+ (slope, intercept),
    * fit over rows where `x` in [fitLo, fitHi] and `y` non-null.
    */
  def olsFit(df: DataFrame, keys: Seq[String], x: String, y: String, fitLo: Int, fitHi: Int): DataFrame = {
    val xd = col(x).cast("double")
    val fit = df
      .filter(col(x).between(fitLo, fitHi) && col(y).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(
        count(col(y)).cast("double").as("__n"),
        sum(xd.cast(Dec)).cast("double").as("__sx"),
        sum(col(y).cast(Dec)).cast("double").as("__sy"),
        sum((xd * col(y)).cast(Dec)).cast("double").as("__sxy"),
        sum((xd * xd).cast(Dec)).cast("double").as("__sxx")
      )
    fit
      .withColumn(
        "slope",
        (col("__n") * col("__sxy") - col("__sx") * col("__sy")) /
          (col("__n") * col("__sxx") - col("__sx") * col("__sx")))
      .withColumn("intercept", (col("__sy") - col("slope") * col("__sx")) / col("__n"))
      .select((keys.map(col) :+ col("slope") :+ col("intercept")): _*)
  }

  /** Fill null `y` for x in [predLo, predHi] with the per-group fitted line
    * (reference behavior: observed values win; only missing years predicted).
    */
  def olsExtrapolate(
      df: DataFrame,
      keys: Seq[String],
      x: String,
      y: String,
      fitLo: Int, fitHi: Int,
      predLo: Int, predHi: Int): DataFrame = {
    val fit = olsFit(df, keys, x, y, fitLo, fitHi)
    df.join(broadcast(fit), keys, "left")
      .withColumn(
        y,
        when(
          col(y).isNull && col(x).between(predLo, predHi) && col("slope").isNotNull,
          col("intercept") + col("slope") * col(x).cast("double"))
          .otherwise(col(y)))
      .drop("slope", "intercept")
  }
}
