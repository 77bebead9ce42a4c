package graft

import org.apache.spark.sql.execution.LogicalRDD

import graft.core.Barriers

/** Barrier idempotence: a frame that already IS a checkpoint leaf must
  * pass through barrier/barrierAll unchanged (reference-equal — proof no
  * re-checkpoint job ran). The composed pipelines double-barriered their
  * deepest vintage leg before this (once at its own junction, once in the
  * merge's barrierAll), paying one redundant block-copy job per call.
  */
class BarriersSpec extends SparkTestBase {

  test("barrier materializes once and is idempotent on its own output") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    val b1 = Barriers.barrier(df)
    assert(b1.queryExecution.logical.isInstanceOf[LogicalRDD],
      "eager barrier output should be a checkpoint leaf")
    assert(Barriers.barrier(b1) eq b1, "re-barrier must be a no-op")
    assert(b1.collect().map(_.getInt(0)).sorted === Array(1, 2, 3))
  }

  test("barrierAll passes checkpoint leaves through and barriers the rest") {
    import spark.implicits._
    val leaf = Barriers.barrier(Seq(1, 2).toDF("x"))
    val fresh = Seq(3, 4).toDF("x")
    val out = Barriers.barrierAll(Seq(leaf, fresh))
    assert(out.head eq leaf, "already-barriered leg must pass through")
    assert(out(1).queryExecution.logical.isInstanceOf[LogicalRDD])
    assert(out(1).collect().map(_.getInt(0)).sorted === Array(3, 4))
  }
}
