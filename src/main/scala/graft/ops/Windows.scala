package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.{Window, WindowSpec}
import org.apache.spark.sql.functions.lit

/** Global-but-BOUNDED window shapes (VERDICT r14 #7).
  *
  * The catalog's few global windows all run over inputs capped by
  * construction — a limit / TakeOrderedAndProject, an aggregate grain, or
  * a driver-local <=256-row frame. A bare `Window.orderBy(...)` there is
  * semantically right but logs WindowExec's "No Partition Defined" WARN on
  * every run, burying the one signal that should stay loud in production
  * logs: a GENUINE unbounded single-reducer window.
  *
  * The constant partition key routes every row to one partition exactly
  * like the empty spec does (same single-reducer execution on the bounded
  * frame), but the runtime stays quiet. This is log hygiene, NOT an
  * exemption: WindowSweepSpec treats constant-key (foldable) partition
  * specs as global windows and holds them to the same bounded-input
  * allowlist, so disguising an unbounded window with `lit(0)` still fails
  * the police.
  */
object Windows {

  /** Ordered global window over a provably bounded frame. */
  def boundedGlobal(order: Column*): WindowSpec =
    Window.partitionBy(lit(0)).orderBy(order: _*)

  /** Unordered global window over a provably bounded frame (whole-frame
    * aggregates like `count(*) over ()`).
    */
  def boundedAll: WindowSpec = Window.partitionBy(lit(0))

  /** Guard for seq-keyed window builders: an EMPTY key list means a global
    * window, which the callers only reach on bounded inputs (a single
    * time series collapsed by its day/bucket aggregate) — substitute the
    * constant key so the benign shape stays out of the WARN stream. The
    * WindowSweepSpec police treats constant-key windows as global, so
    * boundedness is still enforced, not assumed.
    */
  def keysOrConstant(keys: Seq[Column]): Seq[Column] =
    if (keys.isEmpty) Seq(lit(0)) else keys
}
