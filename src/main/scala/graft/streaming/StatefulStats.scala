package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.domain.Schemas.ChampionStats

/** The reference's `$inc` counter upsert (transformer_loader/main.py:
  * 184-190) as CUSTOM streaming state: keyed by (puuid, champion),
  * state = the running counters. This is the arbitrary-state form (for
  * when the logic outgrows a groupBy().agg()); Incremental.goldStream
  * is the declarative form and both are tested to produce the same
  * table.
  *
  * Two variants:
  *  - [[runningStats]]: mapGroupsWithState, NoTimeout — the minimal
  *    form, state grows with the key universe (matches the reference,
  *    whose counter collection also grows forever).
  *  - [[runningStatsWithTtl]]: flatMapGroupsWithState with an
  *    EVENT-TIME timeout — the 100 TB posture: a key idle longer than
  *    the TTL (by watermark time) has its state evicted, so state size
  *    tracks the ACTIVE key set, not the all-time one. A returning key
  *    restarts from zero (its durable history lives in the gold table,
  *    not executor state).
  */
object StatefulStats {

  /** Input row: (puuid, champion, win, kda). */
  type In = (String, String, Boolean, Double)

  /** Input row with event time, for the TTL form. */
  final case class TimedIn(
      puuid: String, champion: String, win: Boolean, kda: Double,
      ts: java.sql.Timestamp)

  def update(
      key: (String, String),
      rows: Iterator[In],
      state: GroupState[ChampionStats]): ChampionStats = {
    val prev = state.getOption.getOrElse(ChampionStats(key._1, key._2, 0L, 0L, 0.0))
    val next = rows.foldLeft(prev) { (acc, r) =>
      acc.copy(
        games = acc.games + 1,
        wins = acc.wins + (if (r._3) 1 else 0),
        kda_sum = acc.kda_sum + r._4)
    }
    state.update(next)
    next
  }

  /** Streaming (or batch) running stats in update output mode. */
  def runningStats(rows: Dataset[In]): Dataset[ChampionStats] = {
    implicit val outEnc = Encoders.product[ChampionStats]
    implicit val keyEnc = Encoders.product[(String, String)]
    rows.groupByKey(r => (r._1, r._2))
      .mapGroupsWithState(GroupStateTimeout.NoTimeout)(update)
  }

  /** State update with event-time TTL: a timed-out (dormant) key is
    * REMOVED — evicted from the state store — and emits nothing; a
    * live key re-arms its timeout at (max event time in batch + ttl).
    * Timeouts fire for keys with no data once the watermark passes the
    * armed timestamp. */
  def updateWithTtl(ttlMs: Long)(
      key: (String, String),
      rows: Iterator[TimedIn],
      state: GroupState[ChampionStats]): Iterator[ChampionStats] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      val prev = state.getOption.getOrElse(ChampionStats(key._1, key._2, 0L, 0L, 0.0))
      var maxTs = Long.MinValue
      val next = rows.foldLeft(prev) { (acc, r) =>
        maxTs = math.max(maxTs, r.ts.getTime)
        acc.copy(
          games = acc.games + 1,
          wins = acc.wins + (if (r.win) 1 else 0),
          kda_sum = acc.kda_sum + r.kda)
      }
      state.update(next)
      state.setTimeoutTimestamp(maxTs + ttlMs)
      Iterator.single(next)
    }

  /** Running stats with dormant-key eviction (`ts` drives the
    * watermark; `delayThreshold` is the lateness bound, `ttlMs` the
    * idle eviction horizon). */
  def runningStatsWithTtl(
      rows: Dataset[TimedIn],
      ttlMs: Long,
      delayThreshold: String = "0 seconds"): Dataset[ChampionStats] = {
    implicit val outEnc = Encoders.product[ChampionStats]
    implicit val keyEnc = Encoders.product[(String, String)]
    rows.withWatermark("ts", delayThreshold)
      .groupByKey(r => (r.puuid, r.champion))
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.EventTimeTimeout)(
        updateWithTtl(ttlMs))
  }
}
