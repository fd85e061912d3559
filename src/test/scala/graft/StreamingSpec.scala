package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.domain.{MatchTransform, Schemas}
import graft.streaming.Incremental
import Schemas._

/** Streaming slice (SURVEY.md §7.2 step 4): exactly-once dedup via
  * streaming dropDuplicates, and update-mode gold aggregation proven
  * equivalent to the batch recompute. */
class StreamingSpec extends SparkSuite {
  import spark.implicits._

  test("streaming gold agg (update mode) == batch groupBy recompute") {
    implicit val sqlCtx = spark.sqlContext
    val rows = Seq(
      SilverLite("A", "Ahri", win = true, 2.0),
      SilverLite("A", "Ahri", win = false, 1.5),
      SilverLite("A", "Zed", win = true, 3.0),
      SilverLite("B", "Ahri", win = true, 4.0),
    )
    val stream = MemoryStream[SilverLite]
    val q = Incremental.goldStream(stream.toDF())
      .writeStream.format("memory").queryName("gold_mem").outputMode("complete").start()
    stream.addData(rows.take(2))
    q.processAllAvailable()
    stream.addData(rows.drop(2)) // second micro-batch updates state
    q.processAllAvailable()
    q.stop()

    val streaming = spark.table("gold_mem")
      .as[(String, String, Long, Long, Double)].collect().toSet
    val batch = rows.toDF()
      .groupBy(col("puuid"), col("champion"))
      .agg(count(lit(1)).as("games"),
        sum(when(col("win") === true, 1L).otherwise(0L)).as("wins"),
        sum(col("kda")).as("kda_sum"))
      .as[(String, String, Long, Long, Double)].collect().toSet
    assert(streaming == batch)
  }

  test("file-based incremental pipeline: bronze -> silver + gold, exactly-once dedup") {
    val tmp = Files.createTempDirectory("graft_stream").toString
    val bronzeDir = s"$tmp/bronze"
    val silverDir = s"$tmp/silver"
    val goldDir = s"$tmp/gold"
    val ckpt = s"$tmp/ckpt"

    def mk(matchId: String, win: Boolean): RawMatch =
      RawMatch(matchId, "MASTER-1", processed = false,
        Some(RawPayload(Some(MatchInfo(Some(420), Some(1800L), Some(1700000000000L),
          Some(1700000100000L), Some(Seq(Participant(
            Some("MASTER-1"), Some("Agurin"), Some("EUW"), None, Some("Ahri"),
            Some(100), Some(win), Some(5), Some(2), Some(5),
            Some(100), Some(0), Some(10000), Some(9000),
            Some(0), Some(0), Some(0), Some(0), Some(0), Some(0), Some(0)))))))))

    val summoners = Seq(
      Summoner("MASTER-1", "Agurin#EUW", "europe", "euw1", 500, 1, None, None, None)).toDF()

    // batch 1: two matches + a duplicate matchId (must dedup)
    Seq(mk("M1", win = true), mk("M2", win = false), mk("M1", win = true))
      .toDF().write.mode("append").parquet(bronzeDir)
    Incremental.runOnce(spark, bronzeDir, summoners, silverDir, goldDir, ckpt)
      .awaitTermination()

    val silver1 = spark.read.parquet(silverDir)
    assert(silver1.select("matchId").as[String].collect().sorted.toSeq == Seq("M1", "M2"))
    val gold1 = spark.read.parquet(goldDir).collect()
    assert(gold1.length == 1)
    assert(gold1.head.getAs[Long]("games") == 2 && gold1.head.getAs[Long]("wins") == 1)

    // batch 2: one new match + replay of M1 (checkpoint + dedup state
    // must drop it — the unique-index exactly-once contract)
    Seq(mk("M3", win = true), mk("M1", win = true))
      .toDF().write.mode("append").parquet(bronzeDir)
    Incremental.runOnce(spark, bronzeDir, summoners, silverDir, goldDir, ckpt)
      .awaitTermination()

    val silver2 = spark.read.parquet(silverDir)
    assert(silver2.select("matchId").as[String].collect().sorted.toSeq == Seq("M1", "M2", "M3"))
    val gold2 = spark.read.parquet(goldDir).collect()
    assert(gold2.head.getAs[Long]("games") == 3 && gold2.head.getAs[Long]("wins") == 2)
  }
}
