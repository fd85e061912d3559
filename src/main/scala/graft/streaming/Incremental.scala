package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.domain.MatchTransform

/** The reference's micro-batch incremental pipeline (SURVEY.md §2.7) as
  * Structured Streaming: the per-document `processed: False→True` flag
  * and 1-minute poll loop (transformer_loader/main.py:83,204-207)
  * become checkpoint offsets + a trigger; the unique-matchId ingest
  * index (extractor/main.py:513) becomes streaming
  * `dropDuplicates("matchId")`; the `$inc` counter upsert
  * (transformer_loader/main.py:184-190) becomes an update-mode
  * aggregation merged in `foreachBatch`.
  *
  * Scale: state is bounded by the dedup watermark; the gold merge is a
  * keyed upsert per micro-batch (on Delta it would be MERGE INTO — here
  * parquet-overwrite per batch keyed by (puuid, champion), which at
  * production scale would be partitioned storage).
  */
object Incremental {

  /** Bronze directory stream → silver append + gold update, one pass
    * (`Trigger.AvailableNow`): processes the current backlog then
    * stops, the streaming equivalent of one reference poll tick. */
  def runOnce(
      spark: SparkSession,
      bronzeDir: String,
      summoners: DataFrame,
      silverDir: String,
      goldDir: String,
      checkpointDir: String): StreamingQuery = {
    val schema = spark.read.parquet(bronzeDir).schema
    val bronze = spark.readStream.schema(schema).parquet(bronzeDir)
      // exactly-once per match: replaces the unique index + exists-check
      .dropDuplicates("matchId")

    val query = bronze.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val silver = MatchTransform.silver(batch.toDF(), summoners)
          .drop(MatchTransform.TierCol)
          .persist()
        try {
          silver.write.mode("append").parquet(silverDir)
          // Gold re-merge: read existing, union new contributions,
          // re-aggregate the touched keys (the $inc upsert, batch form).
          val newGold = MatchTransform.goldFromSilver(silver)
          val merged = loadGold(spark, goldDir) match {
            case Some(old) =>
              old.unionByName(newGold)
                .groupBy(col("puuid"), col("champion"))
                .agg(sum(col("games")).as("games"), sum(col("wins")).as("wins"),
                  sum(col("kda_sum")).as("kda_sum"))
            case None => newGold
          }
          val staged = merged.persist()
          staged.count() // materialize before overwriting the source of the read
          staged.write.mode("overwrite").parquet(goldDir + ".tmp")
          spark.read.parquet(goldDir + ".tmp").write.mode("overwrite").parquet(goldDir)
          staged.unpersist()
        } finally silver.unpersist()
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query
  }

  private def loadGold(spark: SparkSession, dir: String): Option[DataFrame] =
    try {
      val d = spark.read.parquet(dir)
      if (d.columns.contains("puuid")) Some(d) else None
    } catch { case _: Throwable => None }

  /** Streaming update-mode gold aggregation over an arbitrary silver
    * stream (used by the batch≡streaming equivalence test with
    * MemoryStream). */
  def goldStream(silverStream: DataFrame): DataFrame =
    silverStream.groupBy(col("puuid"), col("champion"))
      .agg(
        count(lit(1)).as("games"),
        sum(when(col("win") === true, 1L).otherwise(0L)).as("wins"),
        sum(col("kda")).as("kda_sum"))
}
