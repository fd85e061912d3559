package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.PrefixSum

/** Differential check of the distributed prefix scan against the naive
  * per-key window it replaces: exact equality row-for-row, across
  * multiple keys, bucket counts, and tie patterns. */
class PrefixSumSpec extends SparkSuite {

  private def synth = {
    import spark.implicits._
    // 3 keys × 400 rows, deterministic values; ids interleaved across
    // keys so buckets cut mid-key everywhere.
    (0 until 1200)
      .map(i => (i.toLong, s"k${i % 3}", (i * 7 % 13 + 1).toLong))
      .toDF("id", "key", "v")
  }

  private def bucketed = synth.withColumn("b", floor(col("id") / 64).cast("long"))

  test("keyedCumSum equals the single-window cumulative sum exactly") {
    val naive = synth.withColumn("cum",
      sum(col("v")).over(Window.partitionBy(col("key")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, 0)))
    val dist = PrefixSum.keyedCumSum(bucketed, Seq("key"), "b",
      Seq(col("id")), col("v"), "cum").drop("b")
    assert(dist.select("id", "key", "v", "cum").except(naive).isEmpty
      && naive.except(dist.select("id", "key", "v", "cum")).isEmpty)
  }

  test("offsetBudget prunes buckets without changing the kept rows") {
    val budget = 300L
    val full = PrefixSum.keyedCumSum(bucketed, Seq("key"), "b",
      Seq(col("id")), col("v"), "cum")
      .filter(col("cum") <= budget).select("id", "key", "cum")
    val pruned = PrefixSum.keyedCumSum(bucketed, Seq("key"), "b",
      Seq(col("id")), col("v"), "cum", offsetBudget = Some(budget))
      .filter(col("cum") <= budget).select("id", "key", "cum")
    assert(pruned.except(full).isEmpty && full.except(pruned).isEmpty)
    assert(pruned.count() > 0)
  }

  test("property: cumsum ≡ window under seeded random skew, widths, and tie density") {
    import spark.implicits._
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(5)
      val width = Seq(1, 3, 64, 1000)(rnd.nextInt(4)) // incl. degenerate 1-row and one-bucket cases
      val rows = (0 until 500 + rnd.nextInt(1500)).map { i =>
        // Zipf-ish key skew: key 0 takes about half the rows.
        val k = if (rnd.nextBoolean()) 0 else rnd.nextInt(nKeys)
        (i.toLong, s"k$k", rnd.nextInt(5).toLong) // value 0 allowed
      }
      val df = rows.toDF("id", "key", "v")
        .withColumn("b", floor(col("id") / width).cast("long"))
      val dist = PrefixSum.keyedCumSum(df, Seq("key"), "b",
        Seq(col("id")), col("v"), "cum").select("id", "key", "v", "cum")
      val naive = rows.toDF("id", "key", "v").withColumn("cum",
        sum(col("v")).over(Window.partitionBy(col("key")).orderBy(col("id"))
          .rowsBetween(Window.unboundedPreceding, 0)))
      assert(dist.except(naive).isEmpty && naive.except(dist).isEmpty,
        s"seed=$seed nKeys=$nKeys width=$width diverged")
    }
  }

  test("keyedRank reproduces percent_rank bit-for-bit, ties included") {
    // value-range buckets over a column WITH ties (v repeats): equal-v
    // rows share a bucket, ordering disambiguated by id — the q63 shape.
    val vb = synth.withColumn("b", col("v")) // bucket = value: monotone, tied rows share
    val dist = PrefixSum.keyedRank(vb, Seq("key"), "b",
      Seq(col("v"), col("id")), "rk", "n")
      .withColumn("pr",
        when(col("n") === 1, lit(0.0))
          .otherwise((col("rk") - 1).cast("double") / (col("n") - 1).cast("double")))
      .select("id", "key", "pr")
    val naive = synth.withColumn("pr",
      percent_rank().over(Window.partitionBy(col("key")).orderBy(col("v"), col("id"))))
      .select("id", "key", "pr")
    assert(dist.except(naive).isEmpty && naive.except(dist).isEmpty)
  }
}
