package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFns

/** MinHash behaves like MinHash: identical docs collide on every slot;
  * disjoint docs collide on (almost) none; the slot-collision fraction
  * tracks the true shingle-set Jaccard within a loose tolerance — the
  * statistical property LSH banding (q33) relies on. */
class MinHashPropertySpec extends SparkSuite {
  import spark.implicits._

  private val K = 32

  private def sigs(texts: Seq[(Long, String)]): Map[Long, Seq[String]] = {
    val sigCols = (0 until K).map(i => TextFns.minhash("shingles", i).as(s"mh_$i"))
    texts.toDF("doc_id", "text")
      .withColumn("toks", TextFns.tokens(col("text")))
      .withColumn("shingles", TextFns.shingleExpr("toks", 3))
      .select((col("doc_id") +: sigCols): _*)
      .collect()
      .map(r => r.getLong(0) -> (1 to K).map(r.getString)).toMap
  }

  private def trueJaccard(a: String, b: String): Double = {
    def sh(s: String) = s.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("identical docs -> all slots equal; disjoint docs -> no slots equal") {
    val same = "the quick brown fox jumps over the lazy dog near the river bank today"
    val other = "completely different words appear here with zero overlap whatsoever in any shingle"
    val m = sigs(Seq((1L, same), (2L, same), (3L, other)))
    assert(m(1L) == m(2L))
    assert(m(1L).zip(m(3L)).count { case (x, y) => x == y } == 0)
  }

  test("slot-collision fraction approximates true shingle Jaccard") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val edited = ((1 to 30).map(i => s"w$i") ++ (1 to 10).map(i => s"x$i")).mkString(" ")
    val m = sigs(Seq((1L, base), (2L, edited)))
    val est = m(1L).zip(m(2L)).count { case (x, y) => x == y }.toDouble / K
    val truth = trueJaccard(base, edited)
    assert(math.abs(est - truth) < 0.25, s"estimate $est vs true $truth")
  }

  test("fused MinHashSlots expression == composed array_min(transform(md5)) per slot") {
    import graft.functions.MinHashSlots
    MinHashSlots.register(spark)
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river"),
      (2L, "short doc"), // < k tokens -> whole-text shingle fallback
      (3L, (1 to 60).map(i => s"tok$i mixed Content-$i").mkString(" ")),
      (4L, "unicode façade naïve coöperate résumé tokens here for shingles"),
    )
    val df = texts.toDF("doc_id", "text")
      .withColumn("toks", TextFns.tokens(col("text")))
      .withColumn("shingles", TextFns.shingleExpr("toks", 3))
    val nSlots = 8
    val fused = df
      .withColumn("mh", MinHashSlots.slotsCol(col("shingles"), nSlots))
      .select((col("doc_id") +:
        (0 until nSlots).map(i => element_at(col("mh"), i + 1).as(s"f_$i"))): _*)
    val composed = df.select((col("doc_id") +:
      (0 until nSlots).map(i => TextFns.minhash("shingles", i).as(s"c_$i"))): _*)
    val joined = fused.join(composed, "doc_id").collect()
    assert(joined.length == texts.length)
    joined.foreach { r =>
      (0 until nSlots).foreach { i =>
        assert(r.getAs[String](s"f_$i") == r.getAs[String](s"c_$i"),
          s"slot $i mismatch for doc ${r.getLong(0)}")
      }
    }
    // null / empty inputs: null array -> null row value; empty -> null slots
    val edge = spark.sql(s"SELECT minhash_slots(CAST(NULL AS ARRAY<STRING>), 2) AS a, " +
      "minhash_slots(CAST(array() AS ARRAY<STRING>), 2) AS b, " +
      "minhash_slots(array(CAST(NULL AS STRING)), 2) AS c")
      .collect().head
    assert(edge.isNullAt(0))
    assert(edge.getSeq[String](1) == Seq(null, null))
    assert(edge.getSeq[String](2) == Seq(null, null))
    // non-array input is an analysis error, not a runtime failure
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT minhash_slots('not an array', 2)").collect()
    }
  }

  test("incremental pair graph == full rebuild, pair for pair (two-batch corpus)") {
    // The q111 contract checked within one engine: the delta path
    // (staged base artifacts + new-docs-only signatures) must produce
    // exactly the full rebuild's verified pair set, jaccard included.
    val dir = "/root/testdata/sf0.001"
    val full = SparkEntry.queries("q33_minhash_lsh_pairs")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val incr = graft.queries.Text.incrementalPairs(spark, dir, 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(incr == full,
      s"incr-only: ${incr.diff(full)}; full-only: ${full.diff(incr)}")
    // And both phases are genuinely populated (a vacuous delta would
    // pass the equality trivially).
    val byBatch = graft.queries.Text.incrementalPairs(spark, dir, 0.5)
      .groupBy("batch").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byBatch.getOrElse("base", 0L) > 0, s"no base pairs: $byBatch")
    assert(byBatch.getOrElse("delta", 0L) > 0, s"no delta pairs: $byBatch")
  }

  test("q192 license propagation: reps are exactly q70's keeps, taint law, singletons clean") {
    val sfDir = "/root/testdata/sf0.001"
    val out = SparkEntry.queries("q192_license_propagation")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4), r.getBoolean(5)))
    assert(out.nonEmpty)
    val order = Map("cc0" -> 0, "cc-by" -> 1, "cc-by-sa" -> 2, "proprietary" -> 3)
    // one representative per cluster, and it is exactly the doc q70 keeps
    assert(out.map(_._1).distinct.length == out.length, "duplicate reps")
    assert(out.map(_._2).distinct.length == out.length, "a cluster with two reps")
    val q70keeps = SparkEntry.queries("q70_fuzzy_dedup")(spark, sfDir)
      .collect().filter(_.getBoolean(3)).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out.map(t => (t._1, t._2)).toSet == q70keeps,
      "rep set diverged from q70's keep set")
    out.foreach { case (id, _, n, own, eff, tainted) =>
      assert(order.contains(own) && order.contains(eff), s"doc $id unknown tier")
      assert(order(eff) >= order(own), s"doc $id effective below own")
      assert(tainted == (order(eff) > order(own)), s"doc $id taint law")
      if (n == 1) assert(!tainted && own == eff, s"singleton $id tainted")
    }
    // the pass is non-vacuous at this SF: propagation changes at
    // least one representative's license (measured 6 at sf0.001)
    assert(out.exists(_._6), "no tainted representative — vacuous")
  }
}
