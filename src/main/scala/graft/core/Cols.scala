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
  def fresh(df: DataFrame, base: String): String = fresh(df.columns, base)

  /** Name-set form for operators whose temp column must be absent from
    * SEVERAL frames at once (e.g. both sides of a join) — pass the union
    * of their columns.
    */
  def fresh(existingCols: Iterable[String], base: String): String = {
    val existing = existingCols.toSet
    if (!existing.contains(base)) base
    else Iterator.from(0).map(i => s"${base}_$i").find(!existing.contains(_)).get
  }
}
