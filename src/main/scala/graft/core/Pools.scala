package graft.core

import java.util.concurrent.{Callable, ExecutionException, Executors}

/** Bounded fan-out over a short-lived pool with drain-all error
  * propagation: every submitted task runs to completion (success or
  * failure) BEFORE the first failure is rethrown. The naive
  * `futures.map(_.get())` unwinds on the first failed future while later
  * siblings are still running — and a sibling that is a Spark job (an
  * eager barrier checkpoint) then races the session's shutdown (a test
  * suite's afterAll `spark.stop()`), dying with a
  * RejectedExecutionException from the local executor pool. Draining
  * guarantees the caller owns all side effects again when the exception
  * surfaces.
  */
object Pools {

  /** Apply `f` to every item on a fresh pool of at most `maxThreads`
    * threads; return results in input order. On failure: waits for ALL
    * tasks, then rethrows the FIRST failure's cause (unwrapped from the
    * ExecutionException) so callers see the original exception type.
    */
  def mapAll[A, B](items: Seq[A], maxThreads: Int)(f: A => B): Seq[B] = {
    if (items.isEmpty) return Seq.empty
    val pool = Executors.newFixedThreadPool(math.min(maxThreads, math.max(1, items.size)))
    try {
      val futs = items.map(a =>
        pool.submit(new Callable[B] { override def call(): B = f(a) }))
      val results: Seq[Either[Throwable, B]] =
        futs.map(fu => try Right(fu.get()) catch { case t: Throwable => Left(t) })
      results.collectFirst { case Left(t) => t }.foreach {
        case e: ExecutionException if e.getCause != null => throw e.getCause
        case t                                           => throw t
      }
      results.collect { case Right(b) => b }
    } finally pool.shutdown()
  }
}
