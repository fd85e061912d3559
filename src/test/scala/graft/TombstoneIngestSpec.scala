package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.streaming.TombstoneIngest

/** Streaming tombstone ingestion (the q163/q167 maintenance path as a
  * stream): stream-merged flags must equal the batch ground truth,
  * payloads must survive the merge untouched, replays must be
  * idempotent, and the streaming wrapper must survive a restart at a
  * batch boundary (the [[StreamingSpec]] exactly-once stance applied
  * to the index table).
  */
class TombstoneIngestSpec extends SparkSuite {
  import spark.implicits._

  private def baseIndex = (0L until 40L)
    .map(i => (i, i % 4, 1.0 + i))
    .toDF("vec_id", "cell", "nsq")

  test("batched deletes: flags OR in, payloads survive, replay is idempotent") {
    val dir = Files.createTempDirectory("graft_tomb").toString
    TombstoneIngest.seed(spark, dir, baseIndex)
    TombstoneIngest.applyDeletes(spark, dir, Seq(1L, 5L, 9L).toDF("vec_id"), epochId = 1)
    TombstoneIngest.applyDeletes(spark, dir, Seq(5L, 13L).toDF("vec_id"), epochId = 2)

    def state() = TombstoneIngest.serveLive(spark, dir).get
    val deleted = Set(1L, 5L, 9L, 13L)
    val live = state().select("vec_id").collect().map(_.getLong(0)).toSet
    assert(live == (0L until 40L).toSet -- deleted)
    // payloads intact on every surviving row
    val badPayload = state()
      .filter(col("nsq") =!= (col("vec_id") + 1.0) || col("cell") =!= col("vec_id") % 4)
      .count()
    assert(badPayload == 0, "merge altered serving payloads")

    // replay epoch 2 (at-least-once retry): same state after
    TombstoneIngest.applyDeletes(spark, dir, Seq(5L, 13L).toDF("vec_id"), epochId = 2)
    val live2 = state().select("vec_id").collect().map(_.getLong(0)).toSet
    assert(live2 == live, "replayed epoch changed the index")

    // the audit sees the merged flags per cell (deletes 1,5,9,13 all
    // land in cell 1 — 4 dead of 10)
    val audit = TombstoneIngest.cellAudit(spark, dir, threshold = 0.25).get
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getBoolean(4))).toMap
    assert(audit(1L) == ((4L, true)), s"cell-1 audit wrong: ${audit(1L)}")
    assert(audit(0L) == ((0L, false)))
  }

  test("orphan tombstone: a delete for an unknown id never serves") {
    val dir = Files.createTempDirectory("graft_tomb_orphan").toString
    TombstoneIngest.seed(spark, dir, baseIndex)
    TombstoneIngest.applyDeletes(spark, dir, Seq(999L).toDF("vec_id"), epochId = 1)
    val served = TombstoneIngest.serveLive(spark, dir).get
    assert(served.filter(col("vec_id") === 999L).count() == 0)
    assert(served.count() == 40)
  }

  test("index lifecycle: inserts + deletes interleave, serve stays equal to batch truth") {
    val dir = Files.createTempDirectory("graft_tomb_life").toString
    TombstoneIngest.seed(spark, dir, baseIndex)
    // epoch 1: delta inserts (the q162 path) — 10 new ids
    val delta = (40L until 50L).map(i => (i, i % 4, 1.0 + i)).toDF("vec_id", "cell", "nsq")
    TombstoneIngest.applyInserts(spark, dir, delta, epochId = 1)
    // epoch 2: deletes touch both base and delta rows
    TombstoneIngest.applyDeletes(spark, dir, Seq(3L, 42L).toDF("vec_id"), epochId = 2)
    // epoch 3: a duplicate insert of existing ids (one live, one
    // tombstoned) must be dropped — no double rows, no revive
    val dup = Seq((42L, 2L, 99.0), (44L, 0L, 99.0)).toDF("vec_id", "cell", "nsq")
    TombstoneIngest.applyInserts(spark, dir, dup, epochId = 3)

    val served = TombstoneIngest.serveLive(spark, dir).get
    val live = served.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(live == (0L until 50L).toSet -- Set(3L, 42L),
      s"lifecycle serve diverges: $live")
    // no duplicate rows, payloads are the originals (44's nsq stays 45.0)
    assert(served.count() == served.select("vec_id").distinct().count())
    assert(served.filter(col("vec_id") === 44L).head().getDouble(2) == 45.0,
      "duplicate insert overwrote an existing payload")
    // replay the insert epoch (at-least-once retry): unchanged
    TombstoneIngest.applyInserts(spark, dir, delta, epochId = 1)
    val live2 = TombstoneIngest.serveLive(spark, dir).get
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(live2 == live, "replayed insert epoch changed the index")
  }

  test("epoch discipline: a cross-writer epoch collision refuses instead of losing rows") {
    val dir = Files.createTempDirectory("graft_tomb_epoch").toString
    TombstoneIngest.seed(spark, dir, baseIndex)
    TombstoneIngest.applyInserts(spark, dir,
      (40L until 50L).map(i => (i, i % 4, 1.0 + i)).toDF("vec_id", "cell", "nsq"),
      epochId = 1)
    // the r10 hazard: a second maintenance path (its own batch-id
    // counter) re-uses epoch 1 — it would overwrite the inserts' v=1
    // for shared buckets while merging from pre-epoch state that
    // excludes them. Must fail loudly, and leave the index intact.
    val e = intercept[RuntimeException] {
      TombstoneIngest.applyDeletes(spark, dir, Seq(41L).toDF("vec_id"), epochId = 1)
    }
    assert(e.getMessage.contains("single global epoch sequence"), e.getMessage)
    val live = TombstoneIngest.serveLive(spark, dir).get
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(live == (0L until 50L).toSet, "refused write must not mutate the index")
    // the same writer replaying its own epoch stays legal
    TombstoneIngest.applyInserts(spark, dir,
      (40L until 50L).map(i => (i, i % 4, 1.0 + i)).toDF("vec_id", "cell", "nsq"),
      epochId = 1)
  }

  test("epochFor: stable on replay, collision-free across writers, above pre-log layouts") {
    import graft.operators.MergeInto
    val dir = Files.createTempDirectory("graft_tomb_alloc").toString
    TombstoneIngest.seed(spark, dir, baseIndex) // claims e=0
    val d0 = MergeInto.epochFor(spark, dir, "deletes", batchId = 0)
    val i0 = MergeInto.epochFor(spark, dir, "inserts", batchId = 0)
    val d1 = MergeInto.epochFor(spark, dir, "deletes", batchId = 1)
    assert(Set(d0, i0, d1).size == 3, "two checkpoints' batch ids collided on an epoch")
    assert(Seq(d0, i0, d1).forall(_ > 0), "allocations must sit above the seed epoch")
    // replay recovery: the same (writer, batchId) gets ITS epoch back
    assert(MergeInto.epochFor(spark, dir, "deletes", batchId = 0) == d0)
    assert(MergeInto.epochFor(spark, dir, "inserts", batchId = 0) == i0)
    // allocated epochs are merge-usable end to end under their writer
    TombstoneIngest.applyDeletes(spark, dir, Seq(7L).toDF("vec_id"), epochId = d0)
    val live = TombstoneIngest.serveLive(spark, dir).get
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(live == (0L until 40L).toSet - 7L)
  }

  test("compact prunes the epoch log to the replay horizon, allocations stay monotone") {
    import graft.operators.MergeInto
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft_tomb_prune").toString
    TombstoneIngest.seed(spark, dir, baseIndex) // e=0
    (0 to 4).foreach { b =>
      val e = MergeInto.epochFor(spark, dir, "deletes", batchId = b.toLong)
      TombstoneIngest.applyDeletes(spark, dir, Seq(b.toLong).toDF("vec_id"), epochId = e)
    }
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    def logNames() = fs.listStatus(new Path(dir, "_epochs")).map(_.getPath.getName).toSet
    assert(logNames().count(_.startsWith("e=")) == 6) // seed + 5 deletes

    MergeInto.compact(spark, dir)
    val names = logNames()
    // data horizon: each bucket keeps its newest 2 versions; claims and
    // batch mappings strictly below the oldest kept epoch are gone,
    // those at/above survive (the newest epoch may still be replayed)
    val keptEpochs = fs.listStatus(new Path(dir)).map(_.getPath.getName)
      .collect { case n if n.startsWith("v=") => n.drop(2).toLong }
    val horizon = keptEpochs.min
    assert(names.collect { case n if n.startsWith("e=") => n.drop(2).toLong }
      .forall(_ >= horizon), s"stale claims survived: $names")
    assert(names.exists(_.startsWith("w=")), "live batch mappings must survive")
    // a replayed batch at/above the horizon recovers ITS epoch
    val eReplay = MergeInto.epochFor(spark, dir, "deletes", batchId = 4L)
    assert(eReplay == 5L, s"replay of the newest batch must map to its epoch, got $eReplay")
    // fresh allocations stay strictly above everything ever claimed
    val eNext = MergeInto.epochFor(spark, dir, "deletes", batchId = 99L)
    assert(eNext == 6L, s"allocation after pruning must be monotone, got $eNext")
    // serving state is untouched by the sweep
    val live = TombstoneIngest.serveLive(spark, dir).get
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(live == (0L until 40L).toSet -- (0L to 4L).toSet)
  }

  test("compact keeps a lagging writer's newest epoch (per-writer replay horizon)") {
    import graft.operators.MergeInto
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("graft_tomb_lag").toString
    def merge(writer: String, epoch: Long, ids: Seq[Long]): Unit =
      MergeInto.mergeBucketed(spark, dir,
        ids.toDF("k").withColumn("c", lit(1L)),
        keys = Seq("k"), aggs = Seq(sum(col("c")).as("c")), epochId = epoch,
        bucketOn = col("k"), numBuckets = 4, writer = writer)
    // writer A merges its batch 0 but its checkpoint never commits
    // (crash before commit) — its replay must recover THIS epoch
    val eA = MergeInto.epochFor(spark, dir, "laggard", batchId = 0L)
    merge("laggard", eA, Seq(1L))
    // writer B advances EVERY bucket well past A's epoch (full-range
    // batches rewrite all buckets, so the keep-2 data horizon moves)
    (0 to 2).foreach { b =>
      val e = MergeInto.epochFor(spark, dir, "busy", batchId = b.toLong)
      merge("busy", e, 0L until 40L)
    }
    MergeInto.compact(spark, dir)
    val fs = new Path(dir).getFileSystem(spark.sessionState.newHadoopConf())
    val names = fs.listStatus(new Path(dir, "_epochs")).map(_.getPath.getName).toSet
    // A's claim and mapping survive even though the data horizon moved
    // past them — a global-horizon prune would hand A's replay a fresh
    // epoch and double-merge its batch (the r11 ADVICE scenario)
    assert(names.contains(s"e=$eA"), s"laggard's claim swept: $names")
    assert(names.contains("w=laggard,b=0"), s"laggard's mapping swept: $names")
    assert(MergeInto.epochFor(spark, dir, "laggard", batchId = 0L) == eA,
      "replay after compact must recover the laggard's own epoch")
    // B's superseded history still prunes (the log does not grow forever)
    assert(!names.contains("w=busy,b=0"), s"busy writer's stale mapping survived: $names")
  }

  test("streaming wrapper: two event files, restart between passes, equals batch truth") {
    val root = Files.createTempDirectory("graft_tomb_stream")
    val idxDir = root.resolve("idx").toString
    val evDir = root.resolve("events").toString
    val ckpt = root.resolve("ckpt").toString
    TombstoneIngest.seed(spark, idxDir, baseIndex)

    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:00")
    Seq((2L, t0), (6L, t0), (2L, t0)) // duplicate delivery of 2
      .toDF("vec_id", "timestamp")
      .write.mode("append").parquet(evDir)
    TombstoneIngest.runOnce(spark, evDir, idxDir, ckpt).awaitTermination()

    // restart: new backlog file, SAME checkpoint — the first file's
    // offsets are committed, only the new events process
    val t1 = java.sql.Timestamp.valueOf("2026-01-01 01:00:00")
    Seq((10L, t1)).toDF("vec_id", "timestamp")
      .write.mode("append").parquet(evDir)
    TombstoneIngest.runOnce(spark, evDir, idxDir, ckpt).awaitTermination()

    val live = TombstoneIngest.serveLive(spark, idxDir).get
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(live == (0L until 40L).toSet -- Set(2L, 6L, 10L),
      s"stream-merged index diverges from batch truth: $live")
  }
}
