package graft

import org.apache.spark.sql.functions._

import graft.operators.ExactMedian

/** Differential check of the bucketed-selection exact median against
  * Spark's own whole-group-buffering `median` aggregate: equality per
  * key across odd/even counts, heavy ties, negatives, singletons,
  * all-equal groups, NULLs, and degenerate bucket counts. */
class ExactMedianSpec extends SparkSuite {
  import spark.implicits._

  private val Eps = 1e-9

  private def check(df: org.apache.spark.sql.DataFrame, buckets: Int = 8192): Unit = {
    val ours = ExactMedian.perGroup(df, "key", "v", "m", buckets)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val ref = df.filter(col("v").isNotNull)
      .groupBy(col("key")).agg(median(col("v")).as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(ours.keySet == ref.keySet, s"key sets differ: $ours vs $ref")
    ref.foreach { case (k, expect) =>
      val got = ours(k)
      assert(math.abs(got - expect) <= Eps * math.max(1.0, math.abs(expect)),
        s"key $k: got $got, expected $expect")
    }
  }

  test("matches median() on odd and even group sizes, negatives included") {
    val rows =
      (0 until 101).map(i => ("odd", (i * 37 % 101 - 50).toDouble)) ++
      (0 until 100).map(i => ("even", (i * 13 % 100).toDouble * 0.5))
    check(rows.toDF("key", "v"))
  }

  test("heavy ties collapse instead of concentrating: hot value holds the median") {
    // Half the group is one repeated value — the selected bucket's
    // distinct-value histogram has ~2 rows where a row-rank sort
    // would hold 500.
    val rows =
      (0 until 500).map(_ => ("t", 42.0)) ++
      (0 until 250).map(i => ("t", i.toDouble)) ++
      (0 until 250).map(i => ("t", 100.0 + i))
    check(rows.toDF("key", "v"))
  }

  test("all-equal group, singleton, and two-row group need no special cases") {
    val rows = Seq(
      ("const", 7.0), ("const", 7.0), ("const", 7.0),
      ("one", 3.5),
      ("two", 1.0), ("two", 2.0))
    check(rows.toDF("key", "v"))
  }

  test("NULL values are ignored; all-NULL keys are absent") {
    val rows = Seq(
      ("k", Some(1.0)), ("k", None), ("k", Some(3.0)), ("k", None),
      ("allnull", None), ("allnull", None))
    val df = rows.toDF("key", "v")
    val out = ExactMedian.perGroup(df, "key", "v", "m")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out == Map("k" -> 2.0))
  }

  test("property: equals median() under seeded random data at several bucket counts") {
    for (seed <- Seq(1, 7, 42); buckets <- Seq(2, 16, 8192)) {
      val rnd = new scala.util.Random(seed)
      val nKeys = 1 + rnd.nextInt(4)
      val rows = (0 until 400 + rnd.nextInt(1200)).map { _ =>
        val k = if (rnd.nextBoolean()) 0 else rnd.nextInt(nKeys) // key skew
        // Mixture of continuous and tie-prone discrete values.
        val v = if (rnd.nextBoolean()) rnd.nextDouble() * 200 - 100
                else rnd.nextInt(10).toDouble
        (s"k$k", v)
      }
      check(rows.toDF("key", "v"), buckets)
    }
  }

  test("quantilesDisc equals sorted-rank brute force (value at ceil(p·n))") {
    val ps = Seq("p10" -> 0.10, "p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75,
      "p99" -> 0.99, "p100" -> 1.0)
    for (seed <- Seq(3, 11); buckets <- Seq(4, 8192)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 300 + rnd.nextInt(900)).map { _ =>
        val k = s"k${rnd.nextInt(3)}"
        // tie-prone: half the values discrete
        val v = if (rnd.nextBoolean()) rnd.nextInt(20).toDouble
                else rnd.nextDouble() * 100
        (k, v)
      }
      val df = rows.toDF("key", "v")
      val got = ExactMedian.quantilesDisc(df, "key", "v", ps, buckets)
        .collect().map(r => r.getString(0) ->
          ps.indices.map(i => r.getDouble(i + 1))).toMap
      val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      byKey.foreach { case (k, sorted) =>
        val expect = ps.map { case (_, p) =>
          sorted(math.max(1, math.ceil(p * sorted.length).toInt) - 1)
        }
        assert(got(k) == expect, s"key $k buckets=$buckets: ${got(k)} vs $expect")
      }
    }
  }

  test("medianAndQuantiles equals perGroup + quantilesDisc through one shared build") {
    val ps = Seq("p25" -> 0.25, "p50" -> 0.50, "p99" -> 0.99)
    for (seed <- Seq(9, 77)) {
      val rnd = new scala.util.Random(seed)
      // odd AND even group sizes so the two-middle-rank interpolation
      // is exercised, plus ties
      val rows = (0 until 301).map(_ => ("odd", rnd.nextDouble() * 50)) ++
        (0 until 200).map(_ => ("even", rnd.nextInt(25).toDouble))
      val df = rows.toDF("key", "v")
      val got = ExactMedian.medianAndQuantiles(df, "key", "v", ps, medianName = "med")
        .collect().map(r => r.getString(0) ->
          (r.getDouble(1), ps.indices.map(i => r.getDouble(i + 2)))).toMap
      val med = ExactMedian.perGroup(df, "key", "v", "med")
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val qd = ExactMedian.quantilesDisc(df, "key", "v", ps)
        .collect().map(r => r.getString(0) ->
          ps.indices.map(i => r.getDouble(i + 1))).toMap
      med.keySet.foreach { k =>
        assert(got(k)._1 == med(k), s"seed $seed key $k: median diverges")
        assert(got(k)._2 == qd(k), s"seed $seed key $k: quantiles diverge")
      }
    }
  }

  test("quantilesDiscSmallDomain equals quantilesDisc and brute force on tie-heavy data") {
    val ps = Seq("p05" -> 0.05, "p33" -> 1.0 / 3, "p50" -> 0.50,
      "p95" -> 0.95, "p100" -> 1.0)
    for (seed <- Seq(5, 23)) {
      val rnd = new scala.util.Random(seed)
      // small value domain (the operator's contract): integer token
      // counts 0..40, heavy ties, uneven key sizes incl. a singleton
      val rows = (0 until 400 + rnd.nextInt(600)).map { _ =>
        (s"k${rnd.nextInt(4)}", rnd.nextInt(41).toDouble)
      } :+ ("solo", 7.0)
      val df = rows.toDF("key", "v")
      val fast = ExactMedian.quantilesDiscSmallDomain(df, "key", "v", ps)
        .collect().map(r => r.getString(0) ->
          ps.indices.map(i => r.getDouble(i + 1))).toMap
      val slow = ExactMedian.quantilesDisc(df, "key", "v", ps)
        .collect().map(r => r.getString(0) ->
          ps.indices.map(i => r.getDouble(i + 1))).toMap
      assert(fast == slow, s"seed $seed: small-domain path diverges from quantilesDisc")
      val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
      byKey.foreach { case (k, sorted) =>
        val expect = ps.map { case (_, p) =>
          sorted(math.max(1, math.ceil(p * sorted.length).toInt) - 1)
        }
        assert(fast(k) == expect, s"key $k: ${fast(k)} vs $expect")
      }
    }
  }

  test("quantilesDiscSmallDomain: NULL values ignored, all-NULL key absent, original type kept") {
    val df = Seq(("a", java.lang.Long.valueOf(3L)), ("a", java.lang.Long.valueOf(9L)),
      ("a", null.asInstanceOf[java.lang.Long]), ("n", null.asInstanceOf[java.lang.Long]))
      .toDF("key", "v")
    val out = ExactMedian.quantilesDiscSmallDomain(df, "key", "v", Seq("p50" -> 0.5))
    assert(out.schema("p50").dataType == org.apache.spark.sql.types.LongType)
    val m = out.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 3L))
  }

  test("quantilesDisc: singleton and all-equal groups return the value at every p") {
    val df = Seq(("one", 5.0), ("const", 2.0), ("const", 2.0), ("const", 2.0))
      .toDF("key", "v")
    val out = ExactMedian.quantilesDisc(df, "key", "v",
      Seq("p01" -> 0.01, "p50" -> 0.5, "p100" -> 1.0))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out == Map("one" -> ((5.0, 5.0, 5.0)), "const" -> ((2.0, 2.0, 2.0))))
  }

  test("concentrated mass: sliver-of-range distributions stay exact through the refinement") {
    // 2000 values in [0, 1e-6] plus an outlier at 1e6: all non-outlier
    // mass lands in top-level bucket 0 AND sub-slice 0 at any bucket
    // count here — maximal concentration, where correctness rests
    // entirely on the distinct-value rank inside one sub-slice (the
    // operator's documented residual regime). Non-zero sub-slice
    // selection and the analytic-lower-bound float guard are
    // exercised by the spread-data property test at buckets=2/16.
    // This pins CORRECTNESS under concentration; the partition-size
    // benefit is a plan property argued in the scaladoc.
    val rnd = new scala.util.Random(99)
    val rows = (0 until 2000).map(_ => ("c", rnd.nextDouble() * 1e-6)) :+ (("c", 1e6))
    check(rows.toDF("key", "v"))
    check(rows.toDF("key", "v"), buckets = 4)
  }

  test("adversarial continuous sliver: 1e6 distinct doubles inside ONE sub-slice stay exact AND bounded") {
    // The round-5 documented residual, now closed by the third
    // analytic level: a million DISTINCT doubles (spacing 1e-14) all
    // inside a single range/buckets² span (span2 ≈ 1.49e-8 for range
    // [0,1] at the default 8192), plus an outlier at 1.0 that pins the
    // range. Before the b3 level, the per-value rank window would hold
    // all 10⁶ values in ONE partition; with it they spread across
    // ~buckets sub-sub-slices.
    val B = 8192
    val df = spark.range(1000000L)
      .select(lit("a").as("key"), (col("id") * lit(1e-14)).as("v"))
      .union(Seq(("a", 1.0)).toDF("key", "v"))
    // Exactness: n = 1000001 (odd) → median = rank 500001's value.
    val got = ExactMedian.perGroup(df, "key", "v", "m", B)
      .collect().head.getDouble(1)
    val expect = 500000L * 1e-14
    assert(math.abs(got - expect) <= Eps * expect, s"got $got, expected $expect")
    // Fixture premise: every non-outlier value shares one (b, b2).
    val width = 1.0 / B
    val w2 = width / B
    val w3 = w2 / B
    val sliced = df.filter(col("v") < 1.0)
      .withColumn("b", least(floor(col("v") / width), lit(B - 1)).cast("int"))
      .withColumn("b2", least(floor((col("v") - col("b") * width) / w2), lit(B - 1)).cast("int"))
      .withColumn("b3", least(floor((col("v") - col("b") * width - col("b2") * w2) / w3), lit(B - 1)).cast("int"))
    assert(sliced.select("b", "b2").distinct().count() == 1,
      "fixture must concentrate in a single sub-slice")
    // Boundedness: the innermost window partition is (key, b, b2, b3)
    // distinct values — the same slicing formulas the operator uses
    // must spread the pack so no partition holds more than a small
    // multiple of n/buckets (~122 here; 4096 is a loose ceiling).
    val maxPart = sliced.groupBy("b", "b2", "b3")
      .agg(countDistinct(col("v")).as("d")).agg(max("d")).first().getLong(0)
    assert(maxPart <= 4096,
      s"sub-sub-slice still concentrates: $maxPart distinct values in one window partition")
  }

  test("both even-n middle ranks can straddle a bucket boundary") {
    // 2 buckets over [0, 3]: values {0,1} land in bucket 0, {2,3} in
    // bucket 1 — ranks 2 and 3 of n=4 sit in different buckets and the
    // median must average across them.
    val rows = Seq(("s", 0.0), ("s", 1.0), ("s", 2.0), ("s", 3.0))
    check(rows.toDF("key", "v"), buckets = 2)
    val out = ExactMedian.perGroup(rows.toDF("key", "v"), "key", "v", "m", 2)
      .collect().head.getDouble(1)
    assert(math.abs(out - 1.5) <= Eps)
  }
}
