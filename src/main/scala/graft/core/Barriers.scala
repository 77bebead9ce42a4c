package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Plan junction barriers for the composed pipelines.
  *
  * The reference's eager R scripts reuse intermediate frames freely; in
  * lazy Spark every reuse duplicates the upstream LOGICAL SUBTREE, and a
  * chain of stages that each read their input 2-3 times (completion grid:
  * range agg + distinct keys + join side) grows the tree EXPONENTIALLY —
  * the multi-vintage scenario merge alone reaches millions of Catalyst
  * nodes and analysis time dominates execution. A barrier materializes the
  * junction once and replaces the subtree with a leaf.
  *
  * The default (`eager`, `localCheckpoint(true)`) is the fastest on a
  * stable cluster but has real costs (ADVICE r14): it runs a job at plan
  * CONSTRUCTION time even if the result is never consumed, blocks
  * predicate/projection pushdown across the barrier, and the checkpointed
  * blocks are NOT fault-tolerant — an executor loss (dynamic allocation,
  * spot kills) fails the job instead of recomputing. Deployments trade
  * that off via `spark.graft.planBarrier`:
  *
  *  - `eager`   (default): `localCheckpoint(true)` — materialize now,
  *              lineage cut, fastest repeated analysis; not fault-tolerant.
  *  - `lazy`    : `localCheckpoint(false)` — lineage cut on first action,
  *              nothing runs at construction; not fault-tolerant.
  *  - `persist` : `persist(MEMORY_AND_DISK)` — lazy, RECOMPUTABLE on
  *              executor loss (lineage kept), at the price of re-analyzing
  *              the full tree per consumer until cached.
  *  - `off`     : no barrier — pure lazy plans, full pushdown across the
  *              junction; only viable for single-consumer chains.
  */
object Barriers {

  val ModeKey = "spark.graft.planBarrier"

  def barrier(df: DataFrame): DataFrame =
    df.sparkSession.conf.get(ModeKey, "eager") match {
      case "off"     => df
      case "lazy"    => df.localCheckpoint(false)
      case "persist" => df.persist(StorageLevel.MEMORY_AND_DISK)
      case _         => df.localCheckpoint(true)
    }

  /** `df.planBarrier()` chain syntax for the pipeline modules. */
  implicit class BarrierOps(private val df: DataFrame) extends AnyVal {
    def planBarrier(): DataFrame = barrier(df)
  }
}
