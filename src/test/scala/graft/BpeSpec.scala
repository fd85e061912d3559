package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** The BPE trainer's two load-bearing claims, pinned where the q130
  * DuckDB oracle cannot see them (both engines apply merges via the
  * same double-space replace, so an encoding bug would hash-match on
  * both sides):
  *  1. the double-space `replace` merge equals the canonical greedy
  *     left-to-right fold on the adversarial shapes — runs ('aaaa')
  *     and alternations ('abab') — where a single-space encoding
  *     silently drops every second merge;
  *  2. the full training loop reproduces hand-computed merges,
  *     including a lexicographic tie-break and a merged symbol
  *     participating in a later pair.
  */
class BpeSpec extends SparkSuite {

  private def encode(syms: Seq[String]): String = syms.mkString("  ", "  ", "  ")

  private def sparkMerge(s: String, l: String, r: String): Seq[String] = {
    import spark.implicits._
    Seq(s).toDF("s")
      .select(split(trim(expr(s"replace(s, ' $l  $r ', ' $l$r ')")), "  ").as("t"))
      .collect()(0).getSeq[String](0).toSeq
  }

  test("double-space replace equals the canonical greedy fold on runs and alternations") {
    val cases = Seq(
      (Seq("a", "a", "a"), "a", "a"),
      (Seq("a", "a", "a", "a"), "a", "a"),
      (Seq("a", "a", "a", "a", "a"), "a", "a"),
      (Seq("a", "b", "a", "b"), "a", "b"),
      (Seq("a", "b", "a", "b", "a", "b"), "a", "b"),
      (Seq("x", "a", "b", "a", "b", "y"), "a", "b"),
      (Seq("b", "a", "b", "a"), "a", "b"),
      (Seq("aa", "a", "aa"), "aa", "a"),
      (Seq("q"), "a", "b"))
    cases.foreach { case (syms, l, r) =>
      assert(sparkMerge(encode(syms), l, r) == Bpe.foldMerge(syms, l, r),
        s"mismatch for $syms merging ($l,$r)")
    }
  }

  test("randomized sequences: replace-merge equals the fold across seeds") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 60) {
      val syms = Seq.fill(2 + rnd.nextInt(10))(Seq("a", "b", "c")(rnd.nextInt(3)))
      val (l, r) = (Seq("a", "b")(rnd.nextInt(2)), Seq("a", "b")(rnd.nextInt(2)))
      assert(sparkMerge(encode(syms), l, r) == Bpe.foldMerge(syms, l, r),
        s"mismatch for $syms merging ($l,$r)")
    }
  }

  test("training loop reproduces hand-computed merges with tie-break and merged-symbol reuse") {
    import spark.implicits._
    // 3x "abab" + 2x "aaaa": round 1 ties (a,b)=6 with (a,a)=6 ->
    // lexicographic picks (a,a); round 2 (a,b)=6; round 3 the MERGED
    // symbol pair (ab,ab)=3 beats (aa,aa)=2; round 4 (aa,aa)=2.
    val docs = Seq("abab abab abab aaaa aaaa").toDF("text")
    val got = Bpe.train(docs, 4).map(m => (m.rank, m.left, m.right, m.pairCount))
    assert(got == Seq((1, "a", "a", 6L), (2, "a", "b", 6L),
      (3, "ab", "ab", 3L), (4, "aa", "aa", 2L)), s"got $got")
  }

  test("trainer stops cleanly when no pairs remain") {
    import spark.implicits._
    val docs = Seq("a b a b").toDF("text") // single-char words only
    assert(Bpe.train(docs, 3).isEmpty)
  }
}
