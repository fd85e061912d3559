package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}
import graft.domain.Schemas.ChampionStats

/** The reference's `$inc` counter upsert (transformer_loader/main.py:
  * 184-190) as CUSTOM streaming state: mapGroupsWithState keyed by
  * (puuid, champion), state = the running counters. This is the
  * arbitrary-state form (for when the logic outgrows a groupBy().agg(),
  * e.g. conditional resets or TTL eviction); Incremental.goldStream is
  * the declarative form and both are tested to produce the same table.
  *
  * Scale: state is per-(player, champion) — hash-partitioned, O(1) per
  * update; a production deployment adds a timeout
  * (GroupStateTimeout.ProcessingTimeTimeout) to evict dormant keys.
  */
object StatefulStats {

  /** Input row: (puuid, champion, win, kda). */
  type In = (String, String, Boolean, Double)

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
}
