package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.streaming.Events

/** Streaming semantics: the file-source micro-batch run of the hourly
  * aggregation must agree with its batch twin on the same data.
  */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val eventsDir: String = {
    // re-write the sf0.001 events (nanos ts) as a clean micro-batch source
    val dir = Files.createTempDirectory("graft-events").toString
    graft.core.Tables.events(spark, sfDir).write.mode("overwrite").parquet(dir)
    dir
  }

  test("streaming hourly agg equals the batch twin") {
    val stream = Events.readEventStream(spark, eventsDir)
    assert(stream.isStreaming)
    val q = Events.hourlyAggStream(stream)
      .writeStream.outputMode("complete").format("memory").queryName("hourly_out").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("hourly_out")
      .select(col("hour_start").cast("long").as("h"), col("event_type"), col("n"), col("sum_value"))
    val batch = graft.core.Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).cast("long").as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
    assert(streamed.count() == batch.count())
    assert(streamed.join(batch, Seq("h", "event_type", "n"), "left_anti").count() == 0)
  }

  test("userRunningTotals keeps per-user state across a micro-batch") {
    val stream = Events.readEventStream(spark, eventsDir)
    val q = Events.userRunningTotals(spark, stream)
      .writeStream.outputMode("update").format("memory").queryName("user_out").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("user_out").groupBy("user_id").agg(max("n_events").as("n"))
    val want = graft.core.Tables.events(spark, sfDir).groupBy("user_id").count()
    assert(got.join(want, got("user_id") === want("user_id") && got("n") === want("count")).count()
      == want.count())
  }
}
