package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming surface. The reference is batch-only (SURVEY §2.10)
  * — this module is the beyond-reference extension over the `events` table:
  * the same logical transforms run in batch (oracle-verified via the
  * ev_hourly_agg query) and as a streaming query (watermark + windowed agg,
  * exercised in EventsSpec with a file source).
  */
object Events {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-source stream over a directory of event parquet (new files are
    * discovered per micro-batch — the local twin of a Kafka source).
    */
  def readEventStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling-window aggregation with a watermark: the streaming version
    * of the batch ev_hourly_agg query. Late data beyond 2 hours is dropped
    * and state for closed windows is evicted — bounded state at any scale.
    */
  def hourlyAggStream(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("event_type"), col("n"), col("sum_value"))

  /** Streaming OHLC resampling: the micro-batch twin of the batch ev_ohlc
    * query. open/close are `min_by`/`max_by` on the total (time, event_id)
    * order — declarative aggregates that compose with watermarked windows
    * (no per-key arbitrary state), so closed bars evict exactly like
    * hourlyAggStream's counts. high/low/n are plain aggregates.
    */
  def ohlcStream(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(
        min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
        count(lit(1)).as("n"))
      .select(col("window.start").as("hour_start"), col("event_type"),
        col("open"), col("high"), col("low"), col("close"), col("n"))

  /** Streaming exact dedup on event_id with a bounded state horizon:
    * `dropDuplicatesWithinWatermark` keeps an id only as long as the
    * watermark can still admit a duplicate, then evicts it — state stays
    * proportional to the dedup window, not the stream's lifetime (a plain
    * dropDuplicates on a stream grows state forever, the classic
    * unbounded-state bug). The training-data counterpart of dd_exact_dedup
    * for continuous ingestion.
    */
  def dedupStream(stream: DataFrame, watermarkDelay: String = "2 hours"): DataFrame =
    stream
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream attribution join: every click within `lookbackHours`
    * before a purchase by the same user (the batch twin is oracle-verified
    * as ev_attribution). A watermark on BOTH sides plus the time-interval
    * join condition lets Spark compute how long a click can still match a
    * future purchase, so buffered join state is evicted as the watermark
    * advances — bounded state on unbounded streams. Without the interval
    * condition the engine must buffer both sides forever.
    */
  def attributionStream(events: DataFrame, lookbackHours: Int = 1,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("__cu"),
        col("ts").as("c_ts"), col("value").as("click_value"))
      .withWatermark("c_ts", watermarkDelay)
    purchases.join(clicks,
        col("user_id") === col("__cu") &&
          col("c_ts") <= col("p_ts") &&
          col("c_ts") >= col("p_ts") - expr(s"INTERVAL $lookbackHours HOURS"))
      .select("purchase_id", "user_id", "p_ts", "click_id", "c_ts", "click_value")
  }

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)
  final case class UserRunning(user_id: Long, n_events: Long, total_value: Double)
  final case class SessionState(startMs: Long, lastMs: Long, n: Long, totalValue: Double)
  final case class FunnelState(anchors: List[Long])
  final case class FunnelProgress(user_id: Long, stage: Int, anchor_ms: Long)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** Sessionization with flatMapGroupsWithState + event-time timeout:
    * events closer than `gapMinutes` belong to one session; a session
    * closes when a larger gap arrives in-batch or when the watermark
    * passes last_event + gap (timeout path). State is one small record
    * per open session; eviction is driven by the watermark, so state
    * stays bounded under any key cardinality.
    */
  def sessionize(spark: SparkSession, stream: DataFrame, gapMinutes: Int = 30): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapMinutes * 60 * 1000L
    stream
      .withWatermark("ts", "1 hour")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[SessionState]) =>
          def toSession(s: SessionState): Session =
            Session(uid, new java.sql.Timestamp(s.startMs), new java.sql.Timestamp(s.lastMs),
              s.n, s.totalValue)
          if (state.hasTimedOut) {
            val out = state.getOption.map(toSession).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var current = state.getOption
            val closed = Seq.newBuilder[Session]
            for (e <- sorted) {
              val t = e.ts.getTime
              current match {
                case Some(s) if t - s.lastMs <= gapMs =>
                  current = Some(s.copy(lastMs = math.max(s.lastMs, t), n = s.n + 1,
                    totalValue = s.totalValue + e.value))
                case Some(s) =>
                  closed += toSession(s)
                  current = Some(SessionState(t, t, 1, e.value))
                case None =>
                  current = Some(SessionState(t, t, 1, e.value))
              }
            }
            current.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastMs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming ordered funnel: per-user state machine over
    * mapGroupsWithState — the continuous twin of the batch
    * [[graft.ops.Funnel]]. State is the earliest anchor time of each
    * COMPLETED stage (a few longs per user, bounded); each micro-batch
    * sorts its user's events by (time, id) and greedily advances: stage
    * k+1 completes at the first event of its type strictly after the
    * stage-k anchor — exactly the batch semantics when events arrive
    * per-user in order (the partition-by-user deployment). Honesty note:
    * an out-of-order LATER batch with an earlier qualifying event cannot
    * retroactively lower an anchor (bounded state keeps anchors, not
    * history) — the batch Funnel is the authoritative recompute; add an
    * event-time timeout in production to expire abandoned journeys.
    */
  def funnelStream(
      spark: SparkSession,
      stream: DataFrame,
      steps: Seq[String]): Dataset[FunnelProgress] = {
    import spark.implicits._
    require(steps.nonEmpty, "funnel needs at least one step")
    stream
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState[FunnelState, FunnelProgress](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var anchors = state.getOption.map(_.anchors).getOrElse(List.empty[Long])
          for (e <- sorted) {
            if (anchors.size < steps.size && e.event_type == steps(anchors.size) &&
                (anchors.isEmpty || e.ts.getTime > anchors.last))
              anchors = anchors :+ e.ts.getTime
          }
          state.update(FunnelState(anchors))
          FunnelProgress(uid, anchors.size,
            if (anchors.isEmpty) -1L else anchors.last)
      }
  }

  /** Custom state: per-user running totals via mapGroupsWithState — the
    * KeyValueGroupedDataset state API (SURVEY §2.10 / builder north star).
    * State is one small record per user; timeout-based eviction would be
    * added for unbounded key spaces.
    */
  def userRunningTotals(spark: SparkSession, stream: DataFrame): Dataset[UserRunning] = {
    import spark.implicits._
    stream
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserRunning, UserRunning](GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(uid, 0L, 0.0))
          var n = prev.n_events
          var tot = prev.total_value
          rows.foreach { e => n += 1; tot += e.value }
          val next = UserRunning(uid, n, tot)
          state.update(next)
          next
      }
  }
}
