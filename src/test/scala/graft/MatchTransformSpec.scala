package graft

import org.apache.spark.sql.functions._
import graft.domain.{MatchTransform, Schemas}
import Schemas._

/** Edge-semantics fixtures from FIXTURES.md §2, each pinned to a
  * reference behavior (file:line in comments). */
class MatchTransformSpec extends SparkSuite {
  import spark.implicits._

  private def p(
      puuid: String = null,
      riotName: String = null,
      riotTag: String = null,
      summName: String = null,
      champ: String = "Ahri",
      win: Boolean = true,
      k: Int = 5, d: Int = 2, a: Int = 7,
      minions: Int = 100, neutral: Int = 20,
      dmg: Int = 10000, gold: Int = 9000,
      items: Seq[Int] = Seq(1, 2, 3, 0, 0, 0, 0)): Participant =
    Participant(Option(puuid), Option(riotName), Option(riotTag), Option(summName),
      Option(champ), Some(100), Some(win), Some(k), Some(d), Some(a),
      Some(minions), Some(neutral), Some(dmg), Some(gold),
      Some(items(0)), Some(items(1)), Some(items(2)), Some(items(3)),
      Some(items(4)), Some(items(5)), Some(items(6)))

  private def raw(
      matchId: String, puuid: String, parts: Seq[Participant],
      duration: Long = 1800L, creation: Long = 1700000000000L,
      endTs: Option[Long] = Some(1700000100000L), queue: Int = 420,
      processed: Boolean = false, info: Boolean = true): RawMatch =
    RawMatch(matchId, puuid, processed,
      if (info) Some(RawPayload(Some(MatchInfo(Some(queue), Some(duration),
        Some(creation), endTs, Some(parts)))))
      else Some(RawPayload(None)))

  private val summoners = Seq(
    Summoner("MASTER-1", "Agurin#EUW", "europe", "euw1", 500, 1, None, None, None),
    Summoner("MASTER-2", "Ferroi Llautó#PUJOL", "europe", "euw1", 400, 2, None, None, None),
    Summoner("MASTER-3", "NoTagName", "europe", "euw1", 300, 3, None, None, None),
  ).toDF()

  private def run(rows: Seq[RawMatch]) =
    MatchTransform.silver(rows.toDF(), summoners)

  test("tier 1: direct PUUID match wins even against a name collision") {
    // transformer_loader/main.py:102 — PUUID probe precedes all fallbacks
    val rows = Seq(raw("M1", "MASTER-1", Seq(
      p(riotName = "Agurin", riotTag = "EUW", champ = "Decoy"), // name-collision (tier 2 candidate)
      p(puuid = "MASTER-1", champ = "Real"),
    )))
    val out = run(rows).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("champion") == "Real")
    assert(r.getAs[Int](MatchTransform.TierCol) == 1)
  }

  test("tier 2: NFKC-normalized Riot ID match incl. accent folding") {
    // :117-124 + norm :62-73; accented fixture utils/check_rank.py:76
    val rows = Seq(raw("M2", "MASTER-2", Seq(
      p(riotName = "FERROI LLAUTÓ", riotTag = "pujol", champ = "Yuumi"),
    )))
    val out = run(rows).collect()
    assert(out.length == 1)
    assert(out.head.getAs[String]("champion") == "Yuumi")
    assert(out.head.getAs[Int](MatchTransform.TierCol) == 2)
  }

  test("tier 2 accepts a missing/empty tag in match data") {
    // :122 `not p.get("riotIdTagLine")` — None and "" both accepted
    val rows = Seq(
      raw("M3", "MASTER-1", Seq(p(riotName = "agurin", riotTag = null, champ = "NullTag"))),
      raw("M4", "MASTER-1", Seq(p(riotName = "AGURIN", riotTag = "", champ = "EmptyTag"))),
      raw("M5", "MASTER-1", Seq(p(riotName = "Agurin", riotTag = "WRONG", champ = "WrongTag"))),
    )
    val out = run(rows).collect().map(r => r.getAs[String]("matchId") -> r.getAs[String]("champion")).toMap
    assert(out == Map("M3" -> "NullTag", "M4" -> "EmptyTag")) // wrong tag rejected
  }

  test("tier 3: legacy summonerName fallback; requires dim name to have a tag") {
    // :127-131 — strategy B; :113 gated on '#' in summoners name
    val rows = Seq(
      raw("M6", "MASTER-1", Seq(p(summName = " AGURIN ", champ = "Legacy"))),
      raw("M7", "MASTER-3", Seq(p(summName = "notagname", champ = "NeverMatched"))),
    )
    val out = run(rows).collect().map(r => r.getAs[String]("matchId") -> r.getAs[Int](MatchTransform.TierCol)).toMap
    assert(out == Map("M6" -> 3)) // M7 dropped: dim name has no '#'
  }

  test("unmatched and malformed rows are dropped (consumed)") {
    // :95-97 missing info; :134-145 no participant match
    val rows = Seq(
      raw("M8", "MASTER-1", Seq(p(riotName = "SomeoneElse", riotTag = "X"))),
      raw("M9", "MASTER-1", Seq(), info = false),
    )
    assert(run(rows).count() == 0)
  }

  test("already-processed rows are skipped (F1)") {
    val rows = Seq(raw("M10", "MASTER-1", Seq(p(puuid = "MASTER-1")), processed = true))
    assert(run(rows).count() == 0)
  }

  test("derived metrics: kda zero-death clamp, cs, cs_min, items, ts fallback") {
    // :153 max(1, deaths); :155-156; :149 gameEndTimestamp→gameCreation
    val rows = Seq(
      raw("D1", "MASTER-1", Seq(p(puuid = "MASTER-1", k = 10, d = 0, a = 5,
        minions = 150, neutral = 30)), duration = 1800L),
      raw("D2", "MASTER-1", Seq(p(puuid = "MASTER-1", k = 1, d = 3, a = 1)),
        duration = 0L, endTs = None, creation = 1600000000000L),
    )
    val out = run(rows).collect().map(r => r.getAs[String]("matchId") -> r).toMap
    val d1 = out("D1")
    assert(d1.getAs[Double]("kda") == 15.0) // (10+5)/max(1,0)
    assert(d1.getAs[Int]("cs") == 180)
    assert(d1.getAs[Double]("cs_min") == 6.0) // 180/(1800/60)
    assert(d1.getAs[scala.collection.Seq[Int]]("items").toSeq == Seq(1, 2, 3, 0, 0, 0, 0))
    val d2 = out("D2")
    assert(d2.getAs[Double]("cs_min") == 0.0) // duration=0 guard
    assert(d2.getAs[Long]("game_timestamp") == 1600000000000L) // fallback to creation
    assert(d2.getAs[Double]("kda") == 0.67) // (1+1)/3 rounded 2
  }

  test("participants array: name coalesce chain and empty-tag concat") {
    // get_participants_extended :27-59 — "" falls through the or-chain
    val rows = Seq(raw("P1", "MASTER-1", Seq(
      p(puuid = "MASTER-1", riotName = "Me", riotTag = "TAG"),
      p(riotName = "", summName = "OldName", riotTag = null, champ = "X"),
      p(riotName = null, summName = null, champ = "Y"),
    )))
    val parts = run(rows).select(explode(col("participants")).as("q"))
      .select("q.summonerName").as[String].collect().toSeq
    assert(parts == Seq("Me#TAG", "OldName", "Unknown"))
  }

  test("gold batch aggregate matches the $inc counter semantics") {
    // :184-190 — games+=1, wins+=win?1:0, kda_sum+=round(kda,2)
    val rows = Seq(
      raw("G1", "MASTER-1", Seq(p(puuid = "MASTER-1", champ = "Ahri", win = true, k = 4, d = 2, a = 2))),
      raw("G2", "MASTER-1", Seq(p(puuid = "MASTER-1", champ = "Ahri", win = false, k = 0, d = 1, a = 1))),
      raw("G3", "MASTER-1", Seq(p(puuid = "MASTER-1", champ = "Zed", win = true, k = 3, d = 0, a = 0))),
    )
    val gold = MatchTransform.goldFromSilver(run(rows))
      .orderBy("champion").collect()
    val ahri = gold(0)
    assert(ahri.getAs[String]("champion") == "Ahri")
    assert(ahri.getAs[Long]("games") == 2 && ahri.getAs[Long]("wins") == 1)
    assert(math.abs(ahri.getAs[Double]("kda_sum") - (3.0 + 1.0)) < 1e-9)
    assert(gold(1).getAs[Long]("games") == 1)
  }

  test("serving read path: newest-N + per-champion aggregate") {
    val rows = (1 to 5).map(i =>
      raw(s"S$i", "MASTER-1", Seq(p(puuid = "MASTER-1", champ = if (i % 2 == 0) "Ahri" else "Zed",
        win = i % 2 == 0, k = i, d = 1, a = 0)),
        endTs = Some(1700000000000L + i * 1000)))
    val silver = run(rows)
    val (recent, perChamp) = MatchTransform.playerStats(silver, "MASTER-1", limit = 3)
    assert(recent.select("matchId").as[String].collect().toSeq == Seq("S5", "S4", "S3"))
    val m = perChamp.collect().map(r => r.getAs[String]("champion") ->
      (r.getAs[Long]("games"), r.getAs[Long]("wins"))).toMap
    assert(m == Map("Ahri" -> ((1L, 1L)), "Zed" -> ((2L, 0L))))
  }
}
