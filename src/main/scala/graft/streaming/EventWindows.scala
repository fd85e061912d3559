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

  /** Stream-STREAM interval join: pair each right-side event with the
    * same user's left-side events that happened within the preceding
    * `gap` (attribution: "which impression led to this click"). Both
    * sides carry (`user_id`, `ts_us`, `value`).
    *
    * Scale/state: BOTH sides are watermarked and the join condition
    * bounds right-time to [left_time, left_time + gap], so Spark can
    * evict buffered rows once the other side's watermark passes the
    * bound — state is (rate × gap), not the stream's history. An
    * equi-key (user_id) keeps the state hash-partitioned. Without the
    * time bound this join would buffer forever — the property the
    * spec pins by checking the batch-equivalent result. */
  def intervalJoin(left: DataFrame, right: DataFrame, gap: String = "10 minutes"): DataFrame = {
    val l = left
      .withColumn("l_time", timestamp_micros(col("ts_us")))
      .withWatermark("l_time", gap)
      .select(col("user_id"), col("l_time"), col("ts_us").as("l_us"))
    val r = right
      .withColumn("r_time", timestamp_micros(col("ts_us")))
      .withWatermark("r_time", gap)
      .select(col("user_id").as("r_user"), col("r_time"),
        col("ts_us").as("r_us"), col("value"))
    l.join(r, expr(
      s"""user_id = r_user AND
          r_time >= l_time AND r_time <= l_time + interval $gap"""))
      .select(col("user_id"), col("l_us"), col("r_us"), col("value"))
  }
}
