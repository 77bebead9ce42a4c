package graft.core

/** Scoped log hygiene for the runtime mains (VERDICT r14 #7).
  *
  * Every global window in the catalog is bounded by construction (post-
  * limit top-k, aggregate grain, driver-local <=256-row frames) and the
  * WindowSweepSpec police walks EVERY catalog plan asserting exactly that
  * — including constant-key disguises (the optimizer's folding strips
  * `lit(0)` partition keys back to an empty spec, so runtime silencing via
  * a constant key is impossible). WindowExec's "No Partition Defined" WARN
  * therefore carries zero signal in graft's own runs while burying the one
  * log line that SHOULD stay loud elsewhere.
  *
  * The mains (Smoke/Verify/Bench) and the test session call this to set
  * that ONE logger to ERROR — scoped to the class, never the root logger,
  * and only in graft-owned entry points; library code never touches a
  * user's logging configuration.
  */
object Logs {

  def quietBoundedWindowWarn(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window.WindowExec",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // a non-log4j2 backend: leave as-is
}
