package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis (beyond-reference): how many users complete
  * step 1, then step 2 STRICTLY AFTER their first step-1 event, then step
  * 3 strictly after that, ... — the standard conversion-funnel semantics
  * (each stage anchors on the user's EARLIEST qualifying time, so a
  * click before any view does not count).
  *
  * Scale shape: stage k is one filter + an equi-join on the user key
  * against stage k-1's (user, time) frame + a min-aggregate — every
  * shuffle in the chain keys on the user column, so the exchanges reuse
  * one partitioning. No windows, no per-user state.
  */
object Funnel {

  /** Per-user reach times: the frame of users who completed all `steps`
    * in order, with `__t` = the earliest completion time of the LAST step.
    */
  def reach(
      events: DataFrame,
      user: String,
      ts: String,
      steps: Seq[Column]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step predicate")
    steps.zipWithIndex.foldLeft(null: DataFrame) { case (prev, (pred, i)) =>
      if (i == 0)
        events.filter(pred).groupBy(col(user)).agg(min(col(ts)).as("__t"))
      else
        events.filter(pred).select(col(user), col(ts))
          .join(prev.select(col(user), col("__t")), Seq(user))
          .filter(col(ts) > col("__t"))
          .groupBy(col(user)).agg(min(col(ts)).as("__t"))
    }
  }

  /** Stage-count summary: one row per step with the number of users whose
    * ordered journey reached it. Each stage's count plan contains its
    * prefix chain (k stages cost O(k²) stage-joins in one job) — cache
    * `events` for large k; for the usual 3-5 steps the reuse is marginal.
    */
  def counts(
      events: DataFrame,
      user: String,
      ts: String,
      steps: Seq[(String, Column)]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    steps.indices.map { i =>
      reach(events, user, ts, steps.take(i + 1).map(_._2))
        .agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage"), lit(steps(i)._1).as("step"), col("n_users"))
    }.reduce(_.unionByName(_))
  }
}
