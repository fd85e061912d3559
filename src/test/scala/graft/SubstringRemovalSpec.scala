package graft

import org.apache.spark.sql.functions._

/** Semantic fixture check for q116 (exact-substring removal). The
  * DuckDB oracle mirrors the same span-df + mask definition, so a
  * definition-level bug (span window off by one, within-doc repeats
  * counted as cross-doc, mask boundary wrong) would hash-match on
  * both engines — this spec pins the TRANSFORMATION against
  * hand-computed expectations on an engineered corpus. */
class SubstringRemovalSpec extends SparkSuite {

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_q116_fix").toString
    docs.map { case (id, text) => (id, text, "en", "srcT", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    SparkEntry.queries("q116_exact_substring_removal")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
  }

  test("cross-doc duplicated 8-token span is cut from both docs, unique text survives") {
    val shared = (1 to 8).map(i => s"w$i").mkString(" ") // "w1 ... w8"
    val out = run(Seq(
      1L -> s"$shared X Y",        // span at start 0 → tokens 0..7 cut
      2L -> s"p q $shared r",      // span at start 2 → tokens 2..9 cut
      3L -> (1 to 12).map(i => s"z$i").mkString(" "))) // all spans unique
    assert(out(1L) == ((10L, 8L, "X Y")), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((11L, 8L, "p q r")), s"doc 2: ${out(2L)}")
    assert(out(3L) == ((12L, 0L, (1 to 12).map(i => s"z$i").mkString(" "))),
      s"doc 3: ${out(3L)}")
  }

  test("a span repeated WITHIN one doc is not cross-doc duplicated; across docs it is") {
    val span = (1 to 8).map(i => s"a$i").mkString(" ")
    // doc 1 contains the span twice (positions 0 and 9, separated by
    // "sep" so no other 8-window duplicates align) — within-doc only,
    // nothing removed. Adding doc 2 with the same span makes it
    // cross-doc: BOTH occurrences in doc 1 are then covered.
    val within = run(Seq(
      1L -> s"$span sep $span",
      2L -> (1 to 12).map(i => s"u$i").mkString(" ")))
    assert(within(1L)._2 == 0L, s"within-doc repeat must not trigger removal: ${within(1L)}")
    val cross = run(Seq(
      1L -> s"$span sep $span",
      2L -> s"lead $span tail"))
    // doc 1: dup-span starts at 0 and 9 → covers 0..7 and 9..16 → only
    // "sep" (pos 8) survives. doc 2: start 1 → covers 1..8 → "lead tail".
    assert(cross(1L) == ((17L, 16L, "sep")), s"doc 1: ${cross(1L)}")
    assert(cross(2L) == ((10L, 8L, "lead tail")), s"doc 2: ${cross(2L)}")
  }

  test("fully-removed doc lands on the empty string (the array_join('') pin)") {
    val span = (1 to 8).map(i => s"b$i").mkString(" ")
    val out = run(Seq(1L -> span, 2L -> s"x $span y"))
    assert(out(1L) == ((8L, 8L, "")), s"doc 1: ${out(1L)}")
    assert(out(2L) == ((10L, 8L, "x y")), s"doc 2: ${out(2L)}")
  }
}
