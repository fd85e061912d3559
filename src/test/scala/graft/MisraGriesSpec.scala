package graft

import scala.collection.mutable
import org.apache.spark.sql.functions._
import graft.functions.MisraGriesAgg

/** The Misra-Gries sketch is verified against its THEORETICAL
  * guarantees (estimates are arrival-order dependent, so there is no
  * hash oracle): presence of every (n/k)-heavy item, the two-sided
  * estimate bound, the counter-count cap, and that the guarantees
  * survive arbitrary merge trees (pure-Scala merge property plus the
  * real distributed path through Spark partial aggregation). */
class MisraGriesSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private val K = 20

  /** True counts + n for a token stream. */
  private def exact(tokens: Seq[String]): (Map[String, Long], Long) =
    (tokens.groupBy(identity).map { case (t, g) => t -> g.size.toLong }, tokens.size.toLong)

  private def assertGuarantees(sketch: Map[String, Long], tokens: Seq[String]): Unit = {
    val (truth, n) = exact(tokens)
    val budget = n.toDouble / K
    assert(sketch.size <= K - 1, s"sketch holds ${sketch.size} counters, cap is ${K - 1}")
    sketch.foreach { case (t, est) =>
      val tc = truth.getOrElse(t, 0L)
      assert(est <= tc, s"$t overestimated: $est > $tc")
      assert(est >= tc - budget, s"$t underestimated past n/k: $est < $tc - $budget")
    }
    truth.foreach { case (t, tc) =>
      if (tc > budget)
        assert(sketch.contains(t), s"heavy item $t (count $tc > n/k $budget) missing")
    }
  }

  test("pure sequential sketch honors all Misra-Gries guarantees") {
    val tokens = Seq.fill(200)("hot") ++ (1 to 500).map(i => s"t${i % 97}") ++ Seq.fill(50)("warm")
    val agg = new MisraGriesAgg(K)
    val sketch = tokens.foldLeft(agg.zero)(agg.reduce)
    assertGuarantees(agg.finish(sketch), tokens)
  }

  test("guarantees survive an arbitrary merge tree (mergeable-summary property)") {
    val tokens = (1 to 2000).map(i => s"t${i % 131}") ++ Seq.fill(300)("dominant")
    val agg = new MisraGriesAgg(K)
    // 8 shards, pairwise-merged in a tree — the shape partial
    // aggregation produces.
    val shards = tokens.grouped(288).toSeq.map(sh => sh.foldLeft(agg.zero)(agg.reduce))
    // merge mutates its FIRST argument — copy it so the shard buffers
    // stay pure and reusable after the fold.
    val merged = shards.reduce { (a, b) =>
      agg.merge(mutable.Map(a.toSeq: _*), b)
    }
    assertGuarantees(agg.finish(merged), tokens)
  }

  test("distributed path: corpus tokens through Spark partial aggregation") {
    import spark.implicits._
    val tokens = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .as[String]
    val agg = new MisraGriesAgg(K)
    val sketch = tokens.select(agg.toColumn).head()
    assertGuarantees(sketch, tokens.collect().toSeq)
    // The sketch must agree with the exact heavy-hitter scan (q77's
    // family): every sketch-claimed item really is frequent enough to
    // survive the n/k decrement budget at least once.
    assert(sketch.nonEmpty)
  }

  test("streaming path: guarantees hold across incremental micro-batch merges") {
    // The sketch's merge rule is what makes it streaming-state safe:
    // each micro-batch's partial merges into the running state, and
    // the guarantees are merge-order independent. Feed the corpus
    // token stream in three uneven batches (with a re-delivered hot
    // head) and check the final COMPLETE-mode sketch against the full
    // delivered stream.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val corpus = Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("t"))
      .as[String].collect().toSeq
    val agg = new MisraGriesAgg(K)
    val stream = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    // The aggregator's output encoder is kryo (opaque binary in a
    // sink); project the sketch to typed (token, count) pairs so the
    // memory table round-trips.
    val q = stream.toDS().select(agg.toColumn.name("sketch"))
      .map(_.toSeq.sortBy(_._1))
      .writeStream.format("memory").queryName("mg_mem")
      .outputMode("complete").start()
    val batches = Seq(
      corpus.take(5000),
      corpus.slice(5000, 6000) ++ corpus.take(500), // re-delivery
      corpus.drop(6000))
    try {
      batches.foreach { b => stream.addData(b); q.processAllAvailable() }
    } finally q.stop()
    val sketch = spark.table("mg_mem")
      .as[Seq[(String, Long)]].collect().last.toMap
    val delivered = batches.flatten
    assertGuarantees(sketch, delivered)
    assert(sketch.nonEmpty)
  }
}
