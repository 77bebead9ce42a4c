package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.core.StagedSwap

/** Crash-window coverage for the staged directory swap under the streaming
  * upsert sink and compaction: at every interruption point at least one
  * complete copy must survive and recover() must restore the layout.
  */
class StagedSwapSpec extends SparkTestBase {
  import spark.implicits._

  private def fs = new Path("/tmp").getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def freshDir(): String =
    java.nio.file.Files.createTempDirectory("graft-swap").toString + "/t"

  private def writeIds(path: String, ids: Range): Unit =
    ids.map(_.toLong).toDF("id").write.mode("overwrite").parquet(path)

  private def readIds(path: String): Seq[Long] =
    spark.read.parquet(path).as[Long].collect().toSeq.sorted

  test("replace: happy path replaces content and leaves no residue") {
    val t = freshDir()
    writeIds(t, 0 until 5)
    StagedSwap.replace(spark, t)(stage => writeIds(stage, 10 until 13))
    assert(readIds(t) == Seq(10L, 11L, 12L))
    assert(!fs.exists(new Path(t + "__staging")) && !fs.exists(new Path(t + "__old")))
  }

  test("recover: crash between set-aside and swap-in finishes the swap") {
    val t = freshDir()
    writeIds(t + "__old", 0 until 5)      // target was set aside...
    writeIds(t + "__staging", 10 until 13) // ...staging complete (_SUCCESS present)
    StagedSwap.recover(spark, t)
    assert(readIds(t) == Seq(10L, 11L, 12L), "complete staging must win")
    assert(!fs.exists(new Path(t + "__staging")) && !fs.exists(new Path(t + "__old")))
  }

  test("recover: incomplete staging never replaces a surviving copy") {
    val t = freshDir()
    writeIds(t + "__old", 0 until 5)
    fs.mkdirs(new Path(t + "__staging")) // partial write: no _SUCCESS marker
    StagedSwap.recover(spark, t)
    assert(readIds(t) == (0L until 5L).toSeq, "the set-aside copy is the data")
    assert(!fs.exists(new Path(t + "__staging")))
  }

  test("recover: leftovers beside an intact target are swept") {
    val t = freshDir()
    writeIds(t, 0 until 5)
    writeIds(t + "__staging", 10 until 13)
    writeIds(t + "__old", 20 until 22)
    StagedSwap.recover(spark, t)
    assert(readIds(t) == (0L until 5L).toSeq, "intact target must be untouched")
    assert(!fs.exists(new Path(t + "__staging")) && !fs.exists(new Path(t + "__old")))
  }

  test("recover: no-op when nothing exists yet (first write)") {
    val t = freshDir()
    StagedSwap.recover(spark, t)
    assert(!fs.exists(new Path(t)))
  }

  test("applyUpsertBatch survives a simulated mid-swap crash without data loss") {
    val t = freshDir()
    // batch 1 establishes the corpus
    graft.streaming.Ingest.applyUpsertBatch(
      Seq((1L, 1L, "a"), (2L, 1L, "b")).toDF("k", "v", "payload"), t, Seq("k"), "v")
    // simulate the old fatal window: target renamed aside, crash before
    // swap-in (the naive delete-then-rename protocol would now read the
    // target as EMPTY and batch 2 would destroy rows 1 and 2)
    assert(fs.rename(new Path(t), new Path(t + "__old")))
    graft.streaming.Ingest.applyUpsertBatch(
      Seq((3L, 1L, "c")).toDF("k", "v", "payload"), t, Seq("k"), "v")
    val rows = spark.read.parquet(t).select("k").as[Long].collect().toSeq.sorted
    assert(rows == Seq(1L, 2L, 3L), "recovery must restore the corpus before merging")
  }

  test("compactParquet recovers an interrupted prior swap before compacting") {
    val dir = freshDir()
    writeIds(dir + "__old", 0 until 100) // crash left only the set-aside copy
    val report = graft.operators.Maintenance.compactParquet(spark, dir, 512L * 1024 * 1024)
    assert(readIds(dir) == (0L until 100L).toSeq)
    assert(report.filesAfter >= 1L)
  }
}
