package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: a full JSON line with per-query wall-clock
  * over SPARK_GRAFT_SF_DIR, then a compact summary line LAST (the
  * driver tail-captures stdout; the compact line survives any
  * front-truncation of the full one). Queries run in name order after
  * a short untimed warmup (JVM/codegen/file-index startup otherwise
  * lands on whichever query happens to run first and distorts its
  * number).
  *
  * Between queries every cached relation is dropped: each query's
  * persist() calls are intra-query materializations, and letting 56
  * queries' caches accumulate turns the tail of the bench into a
  * GC/eviction exercise that punishes whichever heavy query runs last
  * (round 1: q54 measured 10× slower under the driver's heap than
  * alone). Cross-query reuse goes through parquet stages (see
  * queries.Domain), never the cache.
  *
  * A query that throws is reported with elapsed -1 and its error class
  * under "errors" — a failure must be distinguishable from a fast
  * query in the JSON.
  *
  * Each query is materialized through the `noop` sink, NOT count():
  * count() lets Catalyst prune every column a pure-projection query
  * computes (a signature query ending in select+orderBy times as a
  * bare scan), while the noop write evaluates every output row in
  * full — the number the user of the query would actually pay.
  *
  * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 2) and the
  * per-query MINIMUM is reported: single-shot numbers on a shared VM
  * swing ±50% (observed same-commit totals of 64 s and 103 s), and
  * the minimum is the standard low-noise estimator of a deterministic
  * computation's cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // ObjectHashAggregate (min_by/collect over struct buffers) falls
      // back to SORT-based aggregation after 128 distinct keys per
      // partition by default — pathological for high-cardinality
      // entity-resolution aggregates (sorts every candidate). 64k keys
      // x ~1KB buffers caps the map at ~64MB/partition: hash stays hash.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "65536")
      // AQE's partition coalescing is byte-driven (parallelismFirst is
      // still floored by minPartitionSize = 1MB), so a CPU-dense
      // small-byte shuffle — candidate-pair scoring, md5 explodes —
      // coalesces to a handful of tasks and serializes on a 32-core
      // executor (q34 ran its whole tail on 4 of 32 slots). A 64k
      // floor keeps small hot shuffles at full parallelism and is
      // invisible at scale, where partitions are GB-sized.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Untimed warmup: JVM + whole-stage-codegen compile + parquet
    // footer reads, so per-query numbers measure the queries.
    try materialize(SparkEntry.entry(spark))
    catch { case _: Throwable => () }

    val maxRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    // Don't let repetition blow the wall-clock budget in a slow
    // environment: further passes run only while cumulative bench time
    // stays under this bound (first pass always runs). Default 420:
    // the round-5 driver artifact showed pass 1 alone consuming the
    // old 240 s bound in the driver environment (133.6 s of measured
    // query time + ~105 s of GC/scheduling overhead — wall_sec in the
    // JSON now makes that split visible), which left the headline
    // total min-of-ONE every round. 420 s admits a complete warm
    // second pass there (~150 s — staged artifacts make pass 2 cheap)
    // while the per-query gate below still cuts an overrunning pass
    // at the bound. Round-7 continuation: default raised 420 → 480 —
    // the suite gained five queries whose pass-1 cost includes staged
    // builds (q122's pair graph ~13 s, q119's weight table ~8 s at
    // sf0.1), so pass 1 grew ~25 s while pass 2 (staged reads) grew
    // only ~4 s; 480 keeps a complete warm second pass inside the
    // budget in the driver environment. Second continuation: 480 →
    // 540 for the eight q125–q132 additions (pass-1 cold cost ~25 s —
    // BPE staged training, CMS/PCA codegen warmup — pass-2 warm cost
    // ~7 s). Third continuation: 540 → 600 for the nine q133–q141
    // learned-curation additions (pass-1 cold ~12 s incl. the staged
    // bigram-LM score and the GD/propagation multi-job queries;
    // pass-2 warm ~7 s). Round 8: 600 → 660 for the seven q156–q162
    // additions (pass-1 cold ~10 s — the cell-partitioned IVF index
    // stages of q103/q154/q162 and q158's 4-dim brute melt; pass-2
    // warm ~5 s). Round 15: 660 → 780 — the registry grew 166 → 200
    // across rounds 10–15 while the budget stayed at 660, and the r14
    // driver artifact showed pass 1 alone consuming 617 s of it at
    // 198 queries (pass 2 was grace-only); 780 re-admits a complete
    // warm second pass at 200 queries (builder-measured: pass 1
    // ~330 s + pass 2 ~200 s on a quiet box; the driver environment
    // historically runs ~1.8× that, and the grace window scales with
    // the budget too).
    val budgetSec = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SEC", "780").toInt
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // Optional subset (the Verify convention): extra args = bench only
    // these queries; unknown names fail loudly.
    val only = args.toSet
    only.foreach(n => require(SparkEntry.queries.contains(n), s"unknown query: $n"))
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.isEmpty || only(n) }

    // Cumulative stop-the-world GC millis across all collectors. The
    // per-query delta is reported next to wall-clock so a reader of
    // the bench JSON can tell a regressed plan from a noisy heap (the
    // driver environment amplifies allocation-heavy queries; gc_sec
    // makes that amplification visible instead of inferred).
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(0L, b.getCollectionTime)).sum
    }

    val benchStart = System.nanoTime()
    def spentSec: Double = (System.nanoTime() - benchStart) / 1e9
    def runOne(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Double) = {
      val gc0 = gcMillis()
      val t0 = System.nanoTime()
      val elapsed =
        try { materialize(fn(spark, sfDir)); (System.nanoTime() - t0) / 1e9 }
        catch {
          case e: Throwable =>
            // class+message, not just the class: round 9 recorded bare
            // "IllegalStateException" and cost a full diagnosis cycle
            // that e.toString ("Recursive update") would have skipped.
            errors += name -> e.toString.take(200)
            -1.0
        }
      val gcSec = (gcMillis() - gc0) / 1e3
      spark.sharedState.cacheManager.clearCache()
      (elapsed, gcSec)
    }

    val samples = scala.collection.mutable.LinkedHashMap(
      sorted.map { case (name, _) => name -> scala.collection.mutable.ListBuffer.empty[(Double, Double)] }: _*)
    var fullPasses = 0
    // Pass 1 always runs in full. Later passes run SLOWEST-FIRST with
    // a per-query budget gate: the queries an outlier distorts most
    // get their second measurement first, and a pass interrupted by
    // the budget still leaves min-of-2 coverage where it matters
    // (runs_per_query in the JSON records exactly what each query
    // got; `runs` reports the number of COMPLETE passes).
    for (run <- 1 to maxRuns if run == 1 || spentSec < budgetSec) {
      val order =
        if (run == 1) sorted
        else sorted.sortBy { case (name, _) =>
          -samples(name).map(_._1).foldLeft(0.0)(math.max) }
      var complete = true
      order.foreach { case (name, fn) =>
        if (run == 1 || spentSec < budgetSec) samples(name) += runOne(name, fn)
        else complete = false
      }
      if (complete) fullPasses += 1
    }
    // Targeted reruns (round-4 verdict: the driver's 26.6 s q61 was a
    // budget-exhausted SINGLE-SHOT reading on a shared VM). When the
    // budget gate stopped full passes after one, the slowest queries —
    // exactly the ones an outlier distorts most — get an individual
    // second measurement inside a bounded grace window, so no headline
    // number is ever min-of-one while time remains.
    // maxRuns > 1 gate: an EXPLICIT SPARK_GRAFT_BENCH_RUNS=1 means
    // single-shot was asked for — grace reruns would both spend time
    // the caller opted out of and report min-of-2 for a subset. The
    // all-size-1 gate skips the grace when a PARTIAL pass 2 already
    // gave the slowest queries their second run (it covers the same
    // queries the grace would).
    if (fullPasses == 1 && maxRuns > 1 && samples.values.forall(_.size == 1)) {
      // The grace window is RELATIVE to when passes stopped (a slow
      // pass 1 must not consume it, or the driver environment — the
      // exact case this exists for — would still emit single-shots).
      val graceEnd = spentSec + budgetSec / 4.0
      val slowestFirst = samples.toSeq
        .filter { case (_, ss) => ss.forall(_._1 >= 0) }
        .sortBy { case (_, ss) => -ss.map(_._1).min }
      val byName = sorted.toMap
      slowestFirst.foreach { case (name, ss) =>
        if (spentSec < graceEnd) ss += runOne(name, byName(name))
      }
    }
    val runs = fullPasses
    // Per query: min wall-clock across its runs, with the gc time of
    // the SAME run (gc of a discarded slow run would overstate the
    // cost of the reported number). A query that failed in ANY run
    // reports -1 (visible in errors).
    val results = sorted.map { case (name, _) =>
      val ts = samples(name)
      name -> (if (ts.exists(_._1 < 0)) (-1.0, -1.0) else ts.minBy(_._1))
    }
    // ---- streaming micro-bench (one AvailableNow pass per path) ----
    // rows/sec for each streaming maintenance path over sf-derived
    // backlogs: the batch queries above never exercise the
    // foreachBatch + versioned-merge machinery, so without this block
    // the bench says nothing about ingest throughput. Skipped for
    // subset runs (the driver's full invocation always records it).
    val streaming = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    if (only.isEmpty) {
      import org.apache.spark.sql.functions._
      def rate(name: String, rows: Long)(run: => Unit): Unit =
        try {
          val t0 = System.nanoTime()
          run
          streaming += name -> rows / ((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable => errors += s"streaming:$name" -> e.toString.take(200) }
      val tmpPath = java.nio.file.Files.createTempDirectory("graft_bench_stream")
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def del(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(del)); f.delete(): Unit
        }
        del(tmpPath.toFile)
      }))
      val tmp = tmpPath.toString
      // 1. match-ingest -> silver -> bucketed gold (Incremental)
      val bronze = graft.queries.Domain.bronzeFromOrders(Tables.orders(spark, sfDir))
        .withColumn("timestamp", to_timestamp(lit(1700000000L)))
      val nBronze = bronze.count()
      bronze.write.parquet(s"$tmp/bronze")
      val summoners = graft.queries.Domain.dimFromCustomer(Tables.customer(spark, sfDir))
      rate("incremental_gold", nBronze) {
        graft.streaming.Incremental.runOnce(spark, s"$tmp/bronze", summoners,
          s"$tmp/silver", s"$tmp/gold", s"$tmp/ckpt_inc").awaitTermination()
      }
      // 2. corpus curation ingest (Gopher gate + fingerprint dedup)
      val docs = Tables.documents(spark, sfDir)
        .select(col("doc_id"), to_timestamp(lit(1700000000L)).as("ingest_ts"),
          col("lang"), col("text"))
      val nDocs = docs.count()
      docs.write.parquet(s"$tmp/docs")
      rate("corpus_ingest", nDocs) {
        val schema = spark.read.parquet(s"$tmp/docs").schema
        val in = spark.readStream.schema(schema).parquet(s"$tmp/docs")
        graft.streaming.CorpusIngest.curatedStream(in)
          .writeStream.format("parquet")
          .option("path", s"$tmp/curated")
          .option("checkpointLocation", s"$tmp/ckpt_corpus")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().awaitTermination()
      }
      // 3. ANN-index tombstone stream (seed excluded from the rate)
      val baseIdx = Tables.embeddings(spark, sfDir)
        .select(col("vec_id"), pmod(col("vec_id"), lit(64)).cast("int").as("cell"))
      graft.streaming.TombstoneIngest.seed(spark, s"$tmp/idx", baseIdx)
      val deletes = Tables.embeddings(spark, sfDir)
        .filter(col("vec_id") % 5 === 0)
        .select(col("vec_id"), to_timestamp(lit(1700000000L)).as("timestamp"))
      val nDel = deletes.count()
      deletes.write.parquet(s"$tmp/deletes")
      rate("tombstone_ingest", nDel) {
        graft.streaming.TombstoneIngest.runOnce(spark, s"$tmp/deletes",
          s"$tmp/idx", s"$tmp/ckpt_tomb").awaitTermination()
      }
      // 4. streaming navigable-graph maintenance: q175's frozen-layer
      // attach as a stream over the delta-vector backlog (seed — the
      // pre-existing base index — excluded from the rate, as with the
      // tombstone path)
      val (baseM, deltaM) = graft.queries.Clustering.navPopulations(spark, sfDir)
      val (bHub, bSH) = graft.queries.Clustering.navFrozenLayers(baseM)
      graft.streaming.GraphIngest.seed(spark, s"$tmp/graph",
        graft.queries.Clustering.navBaseGraph(spark, sfDir, baseM))
      val deltaEv = deltaM.select(col("vec_id"), col("fcid"), col("embedding"))
        .withColumn("timestamp", to_timestamp(lit(1700000000L)))
      val nDelta = deltaEv.count()
      deltaEv.write.parquet(s"$tmp/gdeltas")
      rate("graph_ingest", nDelta) {
        graft.streaming.GraphIngest.runOnce(spark, s"$tmp/gdeltas",
          s"$tmp/graph", s"$tmp/ckpt_graph", baseM, bHub, bSH).awaitTermination()
      }
      // 5. streaming quantile sketch serving (events backlog)
      val ev = Tables.events(spark, sfDir)
        .select(col("event_type"), col("value"))
      val nEv = ev.count()
      ev.write.parquet(s"$tmp/events")
      rate("quantile_serve", nEv) {
        graft.streaming.QuantileServe.runOnce(spark, s"$tmp/events",
          Seq("event_type"), "value", s"$tmp/sketch", s"$tmp/ckpt_q").awaitTermination()
      }
    }

    // 3dp is below measurement noise; keeping the line short matters
    // because the driver captures the TAIL of the output — the
    // wall-time map goes LAST so truncation from the front can never
    // eat it (round 3 lost the per-query times that way).
    def r3(v: Double): String = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val gcs = results.map { case (k, (_, g)) => "\"" + k + "\":" + r3(g) }
      .mkString("{", ",", "}")
    // e.toString carries arbitrary message text — escape it so the
    // JSON line always parses (quotes, backslashes, control chars).
    def jstr(v: String): String = v.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => "\\u%04x".format(c.toInt)
      case c             => c.toString
    }
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + jstr(v) + "\"" }
      .mkString("{", ",", "}")
    val rpq = samples.map { case (k, ss) => "\"" + k + "\":" + ss.size }
      .mkString("{", ",", "}")
    // rows/sec per streaming path (VERDICT r10 #5) and per-stage build
    // seconds (#6: stage builds are engine work the min-of-runs
    // per-query numbers exclude — this map itemizes the wall/total gap).
    val strm = streaming.map { case (k, v) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val stages = graft.operators.Staged.buildTimings.toSeq.sortBy(-_._2)
      .map { case (k, v) => "\"" + jstr(k) + "\":" + r3(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2._1).filter(_ >= 0).sum
    // Pinned scaled-bench protocol (round 15): the 100× total swung
    // +64% between r13 and r14 purely on accounting (RUNS=1 folds
    // first-touch Staged builds into whichever query triggers them;
    // RUNS=2 re-measures warm), so the record now carries BOTH
    // conventions as explicit MEASURED fields every run:
    //   cold_stage_total — Σ of the per-stage build seconds (the
    //     stage_build_sec map summed; engine work the per-query
    //     minimums exclude when a warm pass runs — Staged records
    //     EXCLUSIVE per-stage time since r16, so nested builds are
    //     not double-counted in this sum, ADVICE r15);
    //   warm_serve_total — Σ over queries of the minimum elapsed
    //     among runs AFTER the first (a measured warm pass, never
    //     cold-minus-stage subtraction); warm_covered says how many
    //     queries actually got one (= n for the protocol run:
    //     RUNS=2 with a budget admitting the full second pass).
    // Round-over-round comparisons read warm_serve_total +
    // cold_stage_total, never the mixed `value` total.
    val warmMins = sorted.map { case (name, _) =>
      val later = samples(name).drop(1).map(_._1).filter(_ >= 0)
      if (later.isEmpty) None else Some(later.min)
    }
    val warmCovered = warmMins.count(_.isDefined)
    val warmServeTotal = warmMins.flatten.sum
    val coldStageTotal = graft.operators.Staged.buildTimings.values.sum
    val protoFields = s""""cold_stage_total":${r3(coldStageTotal)},"warm_serve_total":${r3(warmServeTotal)},"warm_covered":$warmCovered"""
    val full = s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":"$sfDir","runs":$runs,"wall_sec":${r3(spentSec)},"n_errors":${errors.size},$protoFields,"errors":$errs,"streaming":$strm,"stage_build_sec":$stages,"runs_per_query":$rpq,"gc_sec":$gcs,"queries":$qs}"""
    println(full)
    // The driver snapshot keeps only a stdout TAIL, which amputated
    // the per-query map from the r11 artifact — so the LOSSLESS line
    // also lands in a file (committed per round as BENCH_full_r<N>),
    // and the compact last line folds in the small streaming/stage
    // maps so the tail alone still carries them.
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_full.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (full + "\n").getBytes("UTF-8")): Unit
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"bench: could not write $outPath: $e") }
    val top10 = results.sortBy { case (_, (v, _)) => -v }.take(10)
      .map { case (k, (v, _)) => "\"" + k + "\":" + r3(v) }
      .mkString("{", ",", "}")
    println(s"""{"metric":"total","value":${r3(total)},"unit":"sec","sf":"$sfDir","runs":$runs,"wall_sec":${r3(spentSec)},"n_errors":${errors.size},$protoFields,"top10":$top10,"streaming":$strm,"stage_build_sec":$stages}""")
    spark.stop()
  }
}
