package graft.domain

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.NormalizeNFKC

/** The analytical core of the reference — `run_transform_job`
  * (transformer_loader/main.py:76-192) — as ONE declarative DataFrame
  * program instead of a row-at-a-time poll loop with 2-4 Mongo
  * round-trips per row (SURVEY.md §3 E2).
  *
  * Shape: bronze.filter(unprocessed) → null-guard → posexplode
  * participants → LEFT broadcast-join the summoners dim → 3-tier match
  * scoring → row_number over (matchId, puuid | tier, pos) = 1 → derived
  * projection. The only exchanges are the entity-resolution window
  * (partitioned by match key — bounded partitions at any scale) and the
  * gold group-by; the dim join is broadcast so the bronze fact never
  * shuffles for it.
  *
  * Semantics preserved exactly (reference file:line cited inline):
  * tier 1 = raw PUUID equality (:102); tier 2 = NFKC-normalized Riot ID
  * with "accept missing tag" asymmetry (:117-124); tier 3 = normalized
  * legacy summoner name (:127-131); tiers 2-3 require the dim row to
  * exist with a "Name#Tag" shaped name (:108-113); first participant in
  * array order wins within a tier (`next(...)`); unmatched or malformed
  * rows are dropped-but-consumed (:95-97, :134-145).
  */
object MatchTransform {

  /** Tier column used by tests to assert preference ordering. */
  val TierCol = "match_tier"

  // The 3-tier match predicate, parameterized over a field accessor so
  // the SAME expression serves both the exploded-row form (silver's
  // `col("p.x")`) and the array-lambda form (participantsFlat's
  // `p.getField(x)`) — one source of truth for the reference semantics
  // (:102, :117-124, :127-131).
  private def tierExpr(f: String => Column, masterPuuid: Column,
      sHasTag: Column, sGameNorm: Column, sTagNorm: Column): Column = {
    val nrm = NormalizeNFKC.normCol _
    val hasTag = sHasTag === true
    // Python truthiness: `not p.get("riotIdTagLine")` accepts None OR ""
    // (:122) — the asymmetric null handling SURVEY.md §7.4 warns about.
    val pTag = f("riotIdTagLine")
    val tagOk = (nrm(pTag) === sTagNorm) || pTag.isNull || (pTag === "")
    when(f("puuid") === masterPuuid, 1) // :102 master-PUUID probe
      .when(hasTag && (nrm(f("riotIdGameName")) === sGameNorm) && tagOk, 2) // :117-124
      .when(hasTag && (nrm(f("summonerName")) === sGameNorm), 3) // :127-131
  }

  // STANDARD EXTRACTION of one participant (:158-171), accessor-
  // parameterized like tierExpr. Python `or` chains treat "" as
  // missing, hence nullif; numeric defaults mirror .get(k, 0).
  private def extFields(f: String => Column): Seq[Column] = {
    val name = coalesce(nullif(f("riotIdGameName"), lit("")),
      nullif(f("summonerName"), lit("")), lit("Unknown"))
    val tag = f("riotIdTagLine")
    val fullName = when(tag.isNotNull && tag =!= "", concat(name, lit("#"), tag)).otherwise(name)
    Seq(
      f("championName").as("champion"),
      fullName.as("summonerName"),
      f("teamId").as("teamId"),
      f("win").as("win"),
      coalesce(f("kills"), lit(0)).as("kills"),
      coalesce(f("deaths"), lit(0)).as("deaths"),
      coalesce(f("assists"), lit(0)).as("assists"),
      coalesce(f("totalDamageDealtToChampions"), lit(0)).as("total_damage"),
      array((0 to 6).map(i => coalesce(f(s"item$i"), lit(0))): _*).as("items"),
    )
  }

  // Name#Tag decomposition + NFKC normalization of the summoners dim
  // (:112-114), computed once per dim row before the broadcast — not
  // per exploded fact row. At scale that's thousands of normalizations
  // instead of billions.
  private def dimPrepared(summoners: DataFrame): DataFrame = {
    val nrm = NormalizeNFKC.normCol _
    summoners.select(
      col("puuid").as("s_puuid"),
      (col("summonerName").isNotNull && col("summonerName").contains("#")).as("s_has_tag"),
      nrm(substring_index(col("summonerName"), "#", 1)).as("s_game_norm"),
      nrm(substring_index(col("summonerName"), "#", -1)).as("s_tag_norm"))
  }

  // F1 incremental scan (batch parity for the processed flag; the
  // streaming pipeline replaces it with checkpoint offsets) + F7
  // null-guard (:83, :95-97).
  private def validBronze(bronze: DataFrame): DataFrame =
    bronze
      .filter(col("processed") === false)
      .filter(col("raw").isNotNull && col("raw.info").isNotNull
        && col("raw.info.participants").isNotNull)

  /** Bronze (+ summoners dim) → silver rows (matches_clean shape).
    *
    * `includeParticipants` gates the P2 per-participant array
    * projection — by far the widest column (10 structs × 9 fields per
    * row in the reference shape). Consumers that only need the flat
    * derived metrics (the gold aggregate, serving stats) pass `false`,
    * which is the column-pruning a storage-backed silver table would
    * give those readers automatically: the array is neither built, nor
    * carried through the entity-resolution aggregate, nor shuffled. */
  def silver(bronze: DataFrame, summoners: DataFrame,
      includeParticipants: Boolean = true): DataFrame = {
    val spark = bronze.sparkSession
    NormalizeNFKC.register(spark)

    val valid = validBronze(bronze)

    val exploded = valid.select(
      col("matchId"), col("puuid"),
      col("raw.info.queueId").as("queueId"),
      col("raw.info.gameDuration").as("gameDuration"),
      col("raw.info.gameCreation").as("gameCreation"),
      col("raw.info.gameEndTimestamp").as("gameEndTimestamp"),
      col("raw.info.participants").as("all_participants"),
      posexplode(col("raw.info.participants")).as(Seq("pos", "p")))

    // J1 dim lookup — LEFT join: tier 1 must fire even when the dim row
    // is missing (the reference consults summoners only on fallback).
    val joined = exploded.join(broadcast(dimPrepared(summoners)),
      col("puuid") === col("s_puuid"), "left")

    val tier = tierExpr(name => col(s"p.$name"), col("puuid"),
      col("s_has_tag"), col("s_game_norm"), col("s_tag_norm"))

    // STANDARD EXTRACTION (:147-177), derived per CANDIDATE row so the
    // aggregate below carries only the compact final struct (not the
    // raw 21-field participant + the untransformed array). Python `or`
    // chains treat "" as missing, hence nullif; numeric defaults
    // mirror .get(k, 0).
    val kills = coalesce(col("p.kills"), lit(0))
    val deaths = coalesce(col("p.deaths"), lit(0))
    val assists = coalesce(col("p.assists"), lit(0))
    val cs = coalesce(col("p.totalMinionsKilled"), lit(0)) +
      coalesce(col("p.neutralMinionsKilled"), lit(0))
    val duration = coalesce(col("gameDuration"), lit(1L)) // .get("gameDuration", 1)
    val itemsArr = array((0 to 6).map(i => coalesce(col(s"p.item$i"), lit(0))): _*)

    val participantsExt = transform(col("all_participants"),
      p => struct(extFields(p.getField): _*))

    val scalarFields = Seq(
      coalesce(col("queueId"), lit(0)).as("queue_id"),
      col("p.championName").as("champion"),
      col("p.win").as("win"),
      kills.as("kills"),
      deaths.as("deaths"),
      assists.as("assists"),
      round((kills + assists).cast("double") / greatest(lit(1), deaths), 2).as("kda"), // :153
      cs.as("cs"),
      when(duration > 0, round(cs.cast("double") / (duration.cast("double") / 60.0), 1))
        .otherwise(0.0).as("cs_min"), // :156
      coalesce(col("p.totalDamageDealtToChampions"), lit(0)).as("total_damage"),
      coalesce(col("p.goldEarned"), lit(0)).as("gold_earned"),
      itemsArr.as("items"),
      coalesce(col("gameEndTimestamp"), col("gameCreation")).as("game_timestamp"), // :149
    )
    val derived = struct((scalarFields ++
      (if (includeParticipants) Seq(participantsExt.as("participants")) else Nil) :+
      col(TierCol).as(TierCol)): _*)

    // Best candidate per (matchId, puuid): lowest tier, then first
    // participant in array order. min_by over a (tier, pos) struct key
    // aggregates with map-side partial combine — at scale that shuffles
    // ONE compact candidate row per match instead of sorting all of
    // them the way a row_number window would.
    joined
      .withColumn(TierCol, tier)
      .filter(col(TierCol).isNotNull)
      .groupBy(col("matchId"), col("puuid"))
      .agg(min_by(derived, struct(col(TierCol), col("pos"))).as("best"))
      .select(col("matchId"), col("puuid"), col("best.*"))
  }

  /** P2 per-participant projection as a ZERO-SHUFFLE plan: one output
    * row per (bronze row, participant) — the bronze grain is
    * (matchId, puuid): a match fetched for two tracked players has two
    * bronze rows, and both project here, distinguished by the carried
    * master `puuid` — with the same standard extraction as the silver
    * `participants` array.
    *
    * The wide-silver route (includeParticipants = true → posexplode)
    * carries the 10-struct array through the entity-resolution
    * `min_by` exchange — at scale that shuffles the widest column in
    * the dataset just to rediscover which matches matched. Here the
    * match decision is made IN PLACE: broadcast the prepared dim on
    * the master puuid (one row per match — no explode fan-out on the
    * join), keep rows where `exists(participants, tier != null)`
    * reproduces silver's dropped-but-consumed semantics (:95-97,
    * :134-145), then posexplode and project. The plan is scan →
    * broadcast-join → filter → generate — no exchange at any scale.
    * (The 7-element `exists` lambda is interpreted, but it runs once
    * per match row; the per-participant extraction below it is
    * codegen'd. See memory: single cheap HOF passes are competitive.)
    */
  def participantsFlat(bronze: DataFrame, summoners: DataFrame): DataFrame = {
    NormalizeNFKC.register(bronze.sparkSession)
    val joined = validBronze(bronze).join(broadcast(dimPrepared(summoners)),
      col("puuid") === col("s_puuid"), "left")
    val matched = exists(col("raw.info.participants"),
      p => tierExpr(p.getField, col("puuid"),
        col("s_has_tag"), col("s_game_norm"), col("s_tag_norm")).isNotNull)
    joined
      .filter(matched)
      .select(col("matchId"), col("puuid"),
        posexplode(col("raw.info.participants")).as(Seq("pos", "p")))
      .select(Seq(col("matchId"), col("puuid"), col("pos")) ++
        extFields(name => col(s"p.$name")): _*)
  }

  /** A2 as a batch recompute: gold = groupBy(puuid, champion). The
    * streaming path (graft.streaming.Incremental) produces the same
    * table in update mode; equivalence is property-tested. */
  def goldFromSilver(silver: DataFrame): DataFrame =
    silver.groupBy(col("puuid"), col("champion"))
      .agg(
        count(lit(1)).as("games"),
        sum(when(col("win") === true, 1L).otherwise(0L)).as("wins"), // None → 0 (:187)
        sum(col("kda")).as("kda_sum"))

  /** O1 newest-N trim per player, all players at once: the window form
    * of the serving path's `sort(desc).limit(n)` (api_service/
    * main.py:334-338). `tieBreak` totalizes the order when timestamps
    * collide (callers with numeric match ids pass the numeric cast so
    * the oracle can mirror it). Shuffles once on puuid; row_number
    * needs no full sort of the partition beyond the window's local
    * sort. */
  def recentMatches(silver: DataFrame, limit: Int = 300,
      tieBreak: Column = col("matchId")): DataFrame = {
    val w = Window.partitionBy(col("puuid"))
      .orderBy(col("game_timestamp").desc, tieBreak.desc)
    silver.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= limit)
      .drop("__rn")
  }

  /** E3 per-champion aggregate with derived avg_kda / winrate
    * (api_service/main.py:340-358), grouped by (puuid, champion) so
    * one plan serves both the all-players analytical query and the
    * single-player serving read. Num.fround keeps the rounding
    * bit-identical across engines (the DuckDB oracle mirrors it). */
  def championStats(recent: DataFrame): DataFrame =
    recent
      .groupBy(col("puuid"), col("champion"))
      .agg(
        count(lit(1)).as("games"),
        sum(when(col("win") === true, 1L).otherwise(0L)).as("wins"),
        sum(col("kills")).as("kills"),
        sum(col("deaths")).as("deaths"),
        sum(col("assists")).as("assists"))
      .withColumn("avg_kda",
        graft.functions.Num.fround(
          (col("kills") + col("assists")).cast("double") / greatest(lit(1L), col("deaths")), 2)) // :353
      .withColumn("winrate",
        graft.functions.Num.fround(col("wins") * 100.0 / col("games"), 1)) // :354

  /** E3 serving read path (api_service/main.py:311-373): newest-N
    * matches for a player + per-champion aggregate. The trim here
    * stays `orderBy.limit` (TakeOrdered — for a single player's rows
    * that beats a window exchange); the aggregate is the SAME
    * championStats the driver oracle-checks through q52. */
  def playerStats(silver: DataFrame, puuid: String, limit: Int = 300): (DataFrame, DataFrame) = {
    val recent = silver
      .filter(col("puuid") === puuid)
      // same (timestamp, matchId) DESC tiebreak as recentMatches — the
      // two paths must pick the same rows on timestamp ties
      .orderBy(col("game_timestamp").desc, col("matchId").desc)
      .limit(limit)
    val perChampion = championStats(recent)
      .drop("puuid")
      .orderBy(col("games").desc, col("champion"))
    (recent, perChampion)
  }
}
