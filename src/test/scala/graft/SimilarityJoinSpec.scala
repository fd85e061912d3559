package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SimilarityJoin

/** Differential check of the prefix-filter exact similarity join
  * against the brute-force all-pairs definition. This is the check
  * the q122 DuckDB oracle CANNOT provide: the oracle mirrors the same
  * prefix-filter algorithm, so a recall-losing bug in the lemma
  * arithmetic (prefix length off by one, wrong positional bound)
  * would pass the differential on both engines — here the reference
  * side is the definition itself.
  */
class SimilarityJoinSpec extends SparkSuite {

  /** All pairs with tDen·inter ≥ tNum·uni, by definition. */
  private def brute(sets: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val a = sets.select(col("id").as("da"), col("ta").as("arr_a"))
    val b = sets.select(col("id").as("db"), col("ta").as("arr_b"))
    a.crossJoin(b).filter(col("da") < col("db"))
      .withColumn("inter",
        size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .withColumn("uni",
        size(col("arr_a")) + size(col("arr_b")) - col("inter"))
      .filter(lit(tDen) * col("inter") >= lit(tNum) * col("uni"))
      .select(col("da"), col("db"), col("inter"), col("uni"))
  }

  private def check(sets: DataFrame, tNum: Int, tDen: Int, headK: Int = 64): Unit = {
    val got = SimilarityJoin.exactJaccardPairs(sets, "id", "ta", tNum, tDen, headK)
    val want = brute(sets, tNum, tDen)
    val missing = want.except(got).collect()
    val extra = got.except(want).collect()
    assert(missing.isEmpty && extra.isEmpty,
      s"tau=$tNum/$tDen headK=$headK: missing=${missing.take(5).mkString(";")} " +
        s"extra=${extra.take(5).mkString(";")}")
    assert(want.count() > 0, s"fixture degenerate: no true pairs at $tNum/$tDen")
  }

  /** Deterministic synthetic corpus engineered for the edge cases:
    * near-dup families at graded overlap (some straddling τ), exact
    * dups, a GLOBAL hot element present in every set (head path), a
    * singleton set, and unrelated sets. */
  private def fixture = {
    import spark.implicits._
    def base(seed: Int, n: Int): Seq[Long] =
      (0 until n).map(i => (seed * 10000 + i * 7).toLong)
    val rows: Seq[(Long, Seq[Long])] =
      // 8 disjoint families: original + mutations replacing k elements
      (0 until 8).flatMap { f =>
        val orig = base(f + 1, 20) :+ 999999L // 999999 = global hot element
        Seq.tabulate(4) { k =>
          val mutated = orig.dropRight(3 * k) ++
            (0 until 3 * k).map(i => (900000 + f * 100 + i).toLong)
          ((f * 10 + k).toLong, mutated.distinct)
        }
      } ++ Seq(
        (500L, Seq(999999L)),              // singleton, all-hot
        (501L, base(77, 20) :+ 999999L),   // exact dup pair
        (502L, base(77, 20) :+ 999999L),
        (503L, base(88, 2)),               // tiny set
        (504L, base(88, 2)))               // tiny exact dup
    rows.toDF("id", "ta")
  }

  test("prefix-filter join equals brute force at tau = 3/5") {
    check(fixture, 3, 5)
  }

  test("prefix-filter join equals brute force at tau = 1/2 and 4/5") {
    check(fixture, 1, 2)
    check(fixture, 4, 5)
  }

  test("tiny headK forces real traffic through the head path, still exact") {
    check(fixture, 3, 5, headK = 2)
  }

  test("tau = 1 (exact duplicates only), boundary arithmetic holds") {
    check(fixture, 1, 1)
  }

  /** All ORDERED pairs with tDen·inter ≥ tNum·|A|, by definition. */
  private def bruteContain(sets: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val a = sets.select(col("id").as("da"), col("ta").as("arr_a"))
    val b = sets.select(col("id").as("db"), col("ta").as("arr_b"))
    a.crossJoin(b).filter(col("da") =!= col("db"))
      .withColumn("inter",
        size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
      .withColumn("sa", size(col("arr_a")).cast("long"))
      .withColumn("sb", size(col("arr_b")).cast("long"))
      .filter(lit(tDen) * col("inter") >= lit(tNum) * col("sa"))
      .select(col("da"), col("db"), col("inter"), col("sa"), col("sb"))
  }

  private def checkContain(sets: DataFrame, tNum: Int, tDen: Int, headK: Int = 64): Unit = {
    val got = SimilarityJoin.exactContainmentPairs(sets, "id", "ta", tNum, tDen, headK)
    val want = bruteContain(sets, tNum, tDen)
    val missing = want.except(got).collect()
    val extra = got.except(want).collect()
    assert(missing.isEmpty && extra.isEmpty,
      s"contain tau=$tNum/$tDen headK=$headK: missing=${missing.take(5).mkString(";")} " +
        s"extra=${extra.take(5).mkString(";")}")
    assert(want.count() > 0, s"containment fixture degenerate at $tNum/$tDen")
  }

  test("containment join equals brute force on the engineered fixture (incl. subset pairs)") {
    import spark.implicits._
    // add strict subset pairs — the asymmetric case Jaccard misses:
    // a 5-element excerpt of a 25-element set has C = 1, J = 0.2
    val subsets: Seq[(Long, Seq[Long])] = Seq(
      (600L, (0 until 25).map(i => (60000 + i * 3).toLong)),
      (601L, (0 until 5).map(i => (60000 + i * 3).toLong)),
      (602L, (0 until 4).map(i => (60000 + i * 3).toLong) :+ 777777L))
    val sets = fixture.union(subsets.toDF("id", "ta"))
    checkContain(sets, 4, 5)
    checkContain(sets, 1, 2)
    checkContain(sets, 1, 1)
    checkContain(sets, 4, 5, headK = 2)
  }

  test("containment finds the directed subset pair that the Jaccard join excludes") {
    import spark.implicits._
    val sets = Seq(
      (1L, (0 until 25).map(i => i.toLong)),
      (2L, (0 until 5).map(i => i.toLong))).toDF("id", "ta")
    val contain = SimilarityJoin.exactContainmentPairs(sets, "id", "ta", 4, 5)
      .select(col("da"), col("db")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(contain.toSet == Set((2L, 1L)), s"got ${contain.toSeq}")
    val jac = SimilarityJoin.exactJaccardPairs(sets, "id", "ta", 3, 5).count()
    assert(jac == 0, "Jaccard should exclude the asymmetric pair")
  }

  test("low-tau containment salts with the prefix side as build (fanned)") {
    import spark.implicits._
    // Below tau = 3/4 the head-key candidate join goes through
    // SaltedJoin. The FANNED (build) side must be the A-prefix rows
    // (preHead) — per hot key strictly fewer rows than the full
    // B-postings, since head elements sort LAST in the df-ascending
    // prefix order; fanning the postings side instead would multiply
    // the corpus-linear side 8x. The salt Generate node's child
    // carries the prefix-side rank column __rka iff preHead is the
    // side being fanned.
    val sets = (0 until 20).map(i =>
      (i.toLong, (0 until 10).map(j => ((i + j) % 15).toLong))).toDF("id", "ta")
    val df = SimilarityJoin.exactContainmentPairs(sets, "id", "ta", 1, 2)
    val saltGens = df.queryExecution.analyzed.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate
          if g.generatorOutput.exists(_.name == operators.SaltedJoin.SaltCol) => g
    }
    assert(saltGens.nonEmpty, "low-tau containment plan has no salted join")
    assert(saltGens.forall(_.child.output.exists(_.name == "__rka")),
      "salt fan-out applied to the postings side, not the bounded prefix side")
  }

  test("randomized corpora: equality vs brute force holds across seeds and taus") {
    import spark.implicits._
    for (seed <- Seq(7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      // Sets drawn from a small shared pool (heavy overlap, elements
      // with wildly varying df) plus private elements; sizes 1..30 —
      // the regime where off-by-one prefix/positional arithmetic
      // would actually flip pair membership.
      val originals = (0 until 40).map { i =>
        val n = 1 + rnd.nextInt(30)
        val pool = (0 until n).map(_ => rnd.nextInt(40).toLong)
        val priv = (0 until rnd.nextInt(4)).map(_ => 1000L + rnd.nextInt(1000))
        (i.toLong, (pool ++ priv).distinct)
      }
      // Mutated copies of a third of the sets (replace 0..3 elements)
      // guarantee true pairs straddling every tau under test.
      val mutants = originals.take(13).map { case (id, ta) =>
        val k = rnd.nextInt(4).min(ta.size - 1).max(0)
        (100L + id, (ta.drop(k) ++ (0 until k).map(_ => 5000L + rnd.nextInt(50))).distinct)
      }
      val sets = (originals ++ mutants).toDF("id", "ta")
      for ((tn, td) <- Seq((1, 2), (3, 5), (4, 5))) {
        check(sets, tn, td, headK = 8)
        checkContain(sets, tn, td, headK = 8)
      }
    }
  }

  test("tracked variants: build caches persist during the action and drop on cleanup") {
    import spark.implicits._
    val sets = Seq(
      (1L, Seq(1L, 2L, 3L, 4L, 5L)),
      (2L, Seq(1L, 2L, 3L, 4L, 6L)),
      (3L, Seq(7L, 8L, 9L))).toDF("id", "ta")
    // Baseline persistent-RDD count: other suites share nothing here,
    // but the suite's own earlier tests may have leaked via the
    // untracked overloads — measure the delta, not the absolute.
    def persisted(): Int = spark.sparkContext.getPersistentRDDs.size
    spark.catalog.clearCache()
    val before = persisted()
    val (pairs, done) = SimilarityJoin.exactJaccardPairsTracked(sets, "id", "ta", 3, 5)
    assert(pairs.count() >= 1)
    assert(persisted() > before,
      "build caches should be materialized while the result is consumed")
    done()
    assert(persisted() == before,
      s"cleanup must unpersist every operator cache (before=$before, after=${persisted()})")
    // cleanup without any action is a safe no-op
    val (contain, done2) = SimilarityJoin.exactContainmentPairsTracked(sets, "id", "ta", 4, 5)
    done2()
    assert(persisted() == before)
    assert(contain.count() >= 1, "result stays computable after cleanup (uncached plan)")
  }
}
