package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming operators for continuous training-data pipelines.
  * The reference has no streaming at all (SURVEY §2.10) — these are the
  * scale-path additions: watermarked windowed aggregation, streaming exact
  * dedup, and stateful sessionization via flatMapGroupsWithState. All are
  * plain stream-DataFrame transforms so they compose with readStream
  * sources and writeStream sinks.
  */
object StreamingOps {

  /** Watermarked tumbling-window aggregation over an event stream. */
  def windowedEventCounts(events: DataFrame, tsCol: String = "ts",
      keyCol: String = "event_type", window_ : String = "5 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col(keyCol))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))

  /** Streaming exact dedup on a key with bounded state: watermark lets
    * Spark expire seen-keys state (dropDuplicatesWithinWatermark semantics).
    */
  def streamingDedup(events: DataFrame, keyCols: Seq[String], tsCol: String = "ts",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  final case class Event(user_id: Long, ts: java.sql.Timestamp, event_type: String, value: Double)
  final case class SessionSummary(user_id: Long, n_events: Long, total_value: Double)

  /** Stateful per-user session fold: counts and sums per user with a
    * processing-time timeout — the mapGroupsWithState pattern custom
    * streaming state needs.
    */
  def sessionize(events: Dataset[Event], timeout: String = "30 minutes"): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[(Long, Double), SessionSummary](
        OutputMode.Append, GroupStateTimeout.ProcessingTimeTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[(Long, Double)]) =>
          if (state.hasTimedOut) {
            val (n, v) = state.get
            state.remove()
            Iterator.single(SessionSummary(userId, n, v))
          } else {
            val (n0, v0) = state.getOption.getOrElse((0L, 0.0))
            var n = n0; var v = v0
            rows.foreach { e => n += 1; v += e.value }
            state.update((n, v))
            state.setTimeoutDuration(timeout)
            Iterator.empty
          }
      }
  }
}
