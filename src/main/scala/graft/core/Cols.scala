package graft.core

import org.apache.spark.sql.DataFrame

/** Column-name utilities shared by operators that add temporary working
  * columns to caller-supplied frames.
  */
object Cols {

  /** A temp-column name guaranteed absent from `df` — operators must not
    * silently overwrite (and then drop) a user column that happens to share
    * the fixed internal name.
    */
  def fresh(df: DataFrame, base: String): String = {
    val existing = df.columns.toSet
    if (!existing.contains(base)) base
    else Iterator.from(0).map(i => s"${base}_$i").find(!existing.contains(_)).get
  }
}
