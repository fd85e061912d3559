package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time windowing as Structured Streaming — the watermarked
  * streaming form of the batch queries q40/q42 (SURVEY.md §2.7: the
  * reference has no windows or watermarks; this is the extension
  * surface the category implies). Input is any streaming DataFrame
  * with (`ts_us` epoch-micros LongType, `user_id`, `event_type`,
  * `value`) — the events table after the nanos→micros normalization.
  *
  * Scale: state is bounded by the watermark (late data beyond 10 min
  * is dropped and its window state evicted); the aggregation is keyed
  * by (window, type) / session key so state partitions hash-distribute.
  */
object EventWindows {

  private def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_micros(col("ts_us")))

  /** Tumbling 1-hour counts/sums per event type, 10-minute watermark.
    * Batch equivalent: q40/q43. */
  def tumblingHourly(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "10 minutes")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("total_value"))

  /** Session windows per user with a 10-minute gap — the streaming
    * counterpart of q42's gaps-and-islands. */
  def sessions(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "10 minutes")
      .groupBy(session_window(col("event_time"), "10 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .select(col("user_id"), col("n_events"), col("start_us"), col("end_us"))
}
