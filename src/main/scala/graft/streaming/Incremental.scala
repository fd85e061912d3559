package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.domain.MatchTransform

/** The reference's micro-batch incremental pipeline (SURVEY.md §2.7) as
  * Structured Streaming: the per-document `processed: False→True` flag
  * and 1-minute poll loop (transformer_loader/main.py:83,204-207)
  * become checkpoint offsets + a trigger; the unique-matchId ingest
  * index (extractor/main.py:513) becomes watermark-bounded streaming
  * dedup; the `$inc` counter upsert (transformer_loader/main.py:
  * 184-190) becomes an update-mode merge in `foreachBatch`.
  *
  * Scale + exactly-once design (the parquet-pure MERGE substitute — on
  * Delta/Iceberg this whole dance is one `MERGE INTO`):
  *  - Dedup state is BOUNDED: `dropDuplicatesWithinWatermark` on the
  *    ingest-time column evicts a matchId's dedup state once the
  *    watermark passes its event time + delay (the reference's unique
  *    index grows forever; ours trades unbounded memory for a
  *    documented duplicate-arrival horizon).
  *  - Silver appends are IDEMPOTENT: each micro-batch overwrites its
  *    own `batch=<epochId>` partition, so an at-least-once retry of a
  *    failed batch rewrites the same directory instead of appending
  *    duplicates.
  *  - Gold is a BUCKET-PARTITIONED versioned table:
  *    `goldDir/v=<epochId>/bucket=<hash(puuid) mod N>/`. A batch
  *    rewrites ONLY the buckets its keys touch (not the world), each
  *    epoch's write is an idempotent overwrite of its own `v=` dir,
  *    and the merge reads the latest complete version BEFORE the
  *    current epoch per bucket — so a retried batch recomputes from
  *    pre-batch state instead of double-counting. Readers use
  *    [[readGold]] (newest complete version per bucket). Partial
  *    writes are invisible: versions without `_SUCCESS` are skipped.
  *  - Missing-vs-broken gold is distinguished: a nonexistent directory
  *    means "first batch" (merge starts empty); any OTHER read failure
  *    propagates and fails the batch (round 1 swallowed Throwable and
  *    would have silently reset all counters on a transient IO error).
  *
  * The only driver-side materialization is the ≤ [[NumBuckets]]-row
  * touched-bucket list — bounded metadata, not data.
  */
object Incremental {

  /** Gold hash-bucket fan-out. At 100 TB this is the partition grain a
    * real deployment tunes (buckets ≈ executors × small constant). */
  val NumBuckets = 16

  /** Duplicate-arrival horizon for ingest dedup state. */
  val DedupDelay = "24 hours"

  private def bucketCol: org.apache.spark.sql.Column =
    pmod(hash(col("puuid")), lit(NumBuckets))

  /** Bronze directory stream → silver append + gold update, one pass
    * (`Trigger.AvailableNow`): processes the current backlog then
    * stops, the streaming equivalent of one reference poll tick.
    * `timestamp` (the ingest audit column, extractor/main.py:427) must
    * be populated by the bronze writer — it drives the dedup
    * watermark. */
  def runOnce(
      spark: SparkSession,
      bronzeDir: String,
      summoners: DataFrame,
      silverDir: String,
      goldDir: String,
      checkpointDir: String): StreamingQuery = {
    // Register session extensions BEFORE the query starts: the stream
    // executes on a cloned session whose function registry is copied at
    // start time.
    graft.functions.NormalizeNFKC.register(spark)
    val schema = spark.read.parquet(bronzeDir).schema
    val bronze = spark.readStream.schema(schema).parquet(bronzeDir)
      // exactly-once per match within the watermark horizon: replaces
      // the unique index + exists-check, with state that EVICTS.
      .withWatermark("timestamp", DedupDelay)
      .dropDuplicatesWithinWatermark("matchId")

    val query = bronze.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], epochId: Long) =>
        if (!batch.isEmpty)
          processBatch(spark, batch.toDF(), summoners, silverDir, goldDir, epochId)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    query
  }

  /** One micro-batch: silver staging + bucketed gold merge. IDEMPOTENT
    * per (inputs, epochId) — Spark's at-least-once batch retry re-runs
    * this with the same epochId, so both writes overwrite their own
    * epoch-keyed locations and the merge reads only state from BEFORE
    * this epoch (a completed v=epochId from the failed attempt is
    * ignored, never double-counted). Exposed for the retry spec. */
  def processBatch(
      spark: SparkSession,
      batch: DataFrame,
      summoners: DataFrame,
      silverDir: String,
      goldDir: String,
      epochId: Long): Unit = {
    val silver = MatchTransform.silver(batch, summoners)
      .drop(MatchTransform.TierCol)
      .persist()
    try {
      silver.write.mode("overwrite").parquet(s"$silverDir/batch=$epochId")
      val contrib = MatchTransform.goldFromSilver(silver)
        .withColumn("bucket", bucketCol)
      val touched = contrib.select(col("bucket")).distinct()
        .collect().map(_.getInt(0)).sorted // bounded: <= NumBuckets values
      if (touched.nonEmpty) {
        val prior = readGoldBefore(spark, goldDir, epochId)
          .map(_.withColumn("bucket", bucketCol)
            .filter(col("bucket").isin(touched.map(Int.box): _*)))
        val merged = prior match {
          case Some(old) =>
            old.unionByName(contrib)
              .groupBy(col("puuid"), col("champion"), col("bucket"))
              .agg(sum(col("games")).as("games"), sum(col("wins")).as("wins"),
                sum(col("kda_sum")).as("kda_sum"))
          case None => contrib
        }
        merged.write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$goldDir/v=$epochId")
      }
    } finally silver.unpersist()
  }

  /** Current gold table: newest COMPLETE (`_SUCCESS`) version of each
    * bucket. Columns: puuid, champion, games, wins, kda_sum. */
  def readGold(spark: SparkSession, goldDir: String): Option[DataFrame] =
    readGoldVersions(spark, goldDir, beforeEpoch = None)

  /** Gold state as of before `epochId` — what a (possibly retried)
    * batch must merge onto. */
  private def readGoldBefore(spark: SparkSession, goldDir: String, epochId: Long): Option[DataFrame] =
    readGoldVersions(spark, goldDir, beforeEpoch = Some(epochId))

  private def readGoldVersions(
      spark: SparkSession,
      goldDir: String,
      beforeEpoch: Option[Long]): Option[DataFrame] = {
    val root = new Path(goldDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    // ONLY "does not exist" means empty state; IO errors propagate.
    if (!fs.exists(root)) return None
    val versions = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        if (n.startsWith("v=")) Some((n.drop(2).toLong, p)) else None
      }
      .filter { case (v, p) =>
        beforeEpoch.forall(v < _) && fs.exists(new Path(p, "_SUCCESS"))
      }
      .sortBy { case (v, _) => -v }
    // newest version wins per bucket
    val chosen = scala.collection.mutable.LinkedHashMap.empty[String, Path]
    versions.foreach { case (_, vp) =>
      fs.listStatus(vp).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("bucket="))
        .foreach { bp => if (!chosen.contains(bp.getName)) chosen(bp.getName) = bp }
    }
    if (chosen.isEmpty) None
    else Some(spark.read.parquet(chosen.values.map(_.toString).toSeq: _*))
  }

  /** Retention sweep for the versioned gold layout: each bucket's
    * NEWEST complete version survives; every older bucket directory is
    * deleted, and `v=` directories left without buckets are removed.
    * Old versions exist only so a retried epoch can re-merge from
    * pre-epoch state — once batches have committed they are garbage.
    * Run between pipeline passes, never concurrently with an in-flight
    * batch. */
  def compactGold(spark: SparkSession, goldDir: String): Unit = {
    val root = new Path(goldDir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return
    val versions = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath)
      .flatMap { p =>
        val n = p.getName
        if (n.startsWith("v=")) Some((n.drop(2).toLong, p)) else None
      }
      .sortBy { case (v, _) => -v }
    val seenBuckets = scala.collection.mutable.Set.empty[String]
    versions.foreach { case (_, vp) =>
      val complete = fs.exists(new Path(vp, "_SUCCESS"))
      fs.listStatus(vp).filter(_.isDirectory).map(_.getPath)
        .filter(_.getName.startsWith("bucket="))
        .foreach { bp =>
          if (complete && seenBuckets.add(bp.getName)) () // newest for this bucket — keep
          else fs.delete(bp, true)
        }
      if (fs.listStatus(vp).forall(!_.isDirectory)) fs.delete(vp, true)
    }
  }

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
