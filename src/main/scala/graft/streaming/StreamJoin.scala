package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked STREAM-STREAM interval join — the last core Structured
  * Streaming primitive next to the windowed aggregations
  * ([[EventWindows]]), arbitrary state ([[Funnel]], [[StatefulStats]],
  * [[SequencePacking]]) and exactly-once sinks ([[Incremental]]):
  * click-to-view attribution, where each click joins every view by
  * the same user in the preceding attribution horizon.
  *
  * State boundedness (the property that lets this run forever): BOTH
  * sides carry an event-time watermark and the join condition bounds
  * each side's event time against the other (`v_ts <= c_ts <= v_ts +
  * horizon`), so Spark derives a state-eviction watermark for each
  * buffer — a view older than (watermark − horizon) can never match a
  * future click and is dropped from the join state. Without the
  * two-sided time bound the view buffer would grow with the stream:
  * that shape throws at analysis, by design.
  *
  * Inner-join semantics emit a match as soon as both rows have
  * arrived (no watermark wait), so a 2-batch replay produces exactly
  * the batch join of the union — the stream ≡ batch law
  * StreamingSpec pins. Reference analog: the reference's
  * matches-to-participants attribution is a batch-side join
  * (transformer_loader/main.py:159-174); this is the streaming form.
  */
object StreamJoin {

  final case class ViewEv(view_id: Long, user_id: Long, ts_us: Long)
  final case class ClickEv(click_id: Long, user_id: Long, ts_us: Long)

  /** Attribution join: (click_id, view_id, user_id, view_ts_us,
    * click_ts_us) for every (click, view) pair of the same user with
    * `v_ts <= c_ts <= v_ts + horizonMin`. Works identically on batch
    * DataFrames (watermarks are no-ops there) — the spec's oracle. */
  def attributed(views: DataFrame, clicks: DataFrame,
      horizonMin: Int = 10, watermark: String = "30 minutes"): DataFrame = {
    val v = views
      .select(col("view_id"), col("user_id").as("v_user"),
        timestamp_micros(col("ts_us")).as("v_ts"))
      .withWatermark("v_ts", watermark)
    val c = clicks
      .select(col("click_id"), col("user_id").as("c_user"),
        timestamp_micros(col("ts_us")).as("c_ts"))
      .withWatermark("c_ts", watermark)
    c.join(v,
        expr(s"c_user = v_user AND v_ts <= c_ts AND c_ts <= v_ts + interval $horizonMin minutes"))
      .select(col("click_id"), col("view_id"), col("c_user").as("user_id"),
        unix_micros(col("v_ts")).as("view_ts_us"),
        unix_micros(col("c_ts")).as("click_ts_us"))
  }

  /** LEFT-OUTER form: every view emits — matched rows as they pair,
    * UNMATCHED views (no same-user click in the horizon) with null
    * click columns once the watermark proves no future click can
    * still match (v_ts + horizon falls behind the joint watermark).
    * The funnel-analysis shape: conversion AND abandonment from one
    * operator. Null-side emission is watermark-driven, so a batch
    * replay must advance event time past the horizon before the
    * abandoned views appear — the spec drives that with a sentinel
    * batch. */
  def attributedOuter(views: DataFrame, clicks: DataFrame,
      horizonMin: Int = 10, watermark: String = "30 minutes"): DataFrame = {
    val v = views
      .select(col("view_id"), col("user_id").as("v_user"),
        timestamp_micros(col("ts_us")).as("v_ts"))
      .withWatermark("v_ts", watermark)
    val c = clicks
      .select(col("click_id"), col("user_id").as("c_user"),
        timestamp_micros(col("ts_us")).as("c_ts"))
      .withWatermark("c_ts", watermark)
    v.join(c,
        expr(s"c_user = v_user AND v_ts <= c_ts AND c_ts <= v_ts + interval $horizonMin minutes"),
        "leftOuter")
      .select(col("view_id"), col("v_user").as("user_id"),
        unix_micros(col("v_ts")).as("view_ts_us"),
        col("click_id"), unix_micros(col("c_ts")).as("click_ts_us"))
  }
}
