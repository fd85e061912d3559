package graft.domain

/** Typed schemas for the reference's data zones (FIXTURES.md §2),
  * declared statically where the reference was schemaless Mongo
  * documents (SURVEY.md §1.3): bronze = matches_raw (nested), silver =
  * matches_clean (flat + participants array), gold = aggregated_stats,
  * dim = summoners. Optional fields model the reference's pervasive
  * `.get(k, default)` access; the fallbacks become explicit
  * `coalesce()` in the transform, not implicit type-system behavior.
  */
object Schemas {

  /** Dimension row: tracked player (upserts at api_service/main.py:146-151,
    * extractor/main.py:221-253). `summonerName` is "Name#Tag". */
  final case class Summoner(
      puuid: String,
      summonerName: String,
      region: String,
      platform: String,
      summonerLevel: Int,
      profileIconId: Int,
      solo_tier: Option[String],
      solo_rank: Option[String],
      solo_lp: Option[Int],
  )

  /** One of the 10 players inside raw.info.participants
    * (fields read at transformer_loader/main.py:27-59,90-157). */
  final case class Participant(
      puuid: Option[String],
      riotIdGameName: Option[String],
      riotIdTagLine: Option[String],
      summonerName: Option[String],
      championName: Option[String],
      teamId: Option[Int],
      win: Option[Boolean],
      kills: Option[Int],
      deaths: Option[Int],
      assists: Option[Int],
      totalMinionsKilled: Option[Int],
      neutralMinionsKilled: Option[Int],
      totalDamageDealtToChampions: Option[Int],
      goldEarned: Option[Int],
      item0: Option[Int], item1: Option[Int], item2: Option[Int],
      item3: Option[Int], item4: Option[Int], item5: Option[Int],
      item6: Option[Int],
  )

  final case class MatchInfo(
      queueId: Option[Int],
      gameDuration: Option[Long],
      gameCreation: Option[Long],
      gameEndTimestamp: Option[Long],
      participants: Option[Seq[Participant]],
  )

  final case class RawPayload(info: Option[MatchInfo])

  /** Bronze row: extractor/main.py:422-428 (`processed` flag kept for
    * batch parity; the streaming pipeline replaces it with checkpoint
    * offsets, SURVEY.md §2.7). `timestamp` is the ingest audit column
    * (:427) — wall-clock, excluded from every oracle comparison per
    * SURVEY.md §5.3, and the natural watermark column for bounding
    * streaming-dedup state (§7.4). */
  final case class RawMatch(
      matchId: String,
      puuid: String,
      processed: Boolean,
      raw: Option[RawPayload],
      timestamp: Option[java.sql.Timestamp] = None,
  )

  /** Silver participant sub-struct (transformer_loader/main.py:48-58). */
  final case class CleanParticipant(
      champion: String,
      summonerName: String,
      teamId: Int,
      win: Boolean,
      kills: Int,
      deaths: Int,
      assists: Int,
      total_damage: Int,
      items: Seq[Int],
  )

  /** Silver row: one flat row per (match, tracked player)
    * (transformer_loader/main.py:159-177). */
  final case class CleanMatch(
      matchId: String,
      puuid: String,
      queue_id: Int,
      champion: String,
      win: Boolean,
      kills: Int,
      deaths: Int,
      assists: Int,
      kda: Double,
      cs: Int,
      cs_min: Double,
      total_damage: Int,
      gold_earned: Int,
      items: Seq[Int],
      game_timestamp: Long,
      participants: Seq[CleanParticipant],
  )

  /** Gold row: running per-(player, champion) counters
    * (transformer_loader/main.py:184-190). */
  final case class ChampionStats(
      puuid: String,
      champion: String,
      games: Long,
      wins: Long,
      kda_sum: Double,
  )
}
