package graft

import org.apache.spark.sql.functions._

/** Semantic checks for mirrored-oracle corpus queries on engineered
  * corpora (the SubstringRemovalSpec harness): the DuckDB differential
  * proves Spark ≡ DuckDB, these prove the shared definition does what
  * it claims. */
class CorpusFixtureSpec extends SparkSuite {

  private def docsDir(docs: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fix").toString
    docs.map { case (id, text, source) => (id, text, "en", source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q62 redaction law: zero residual PII, counts match planted instances") {
    // Planted: 2 emails + 1 long number in-text; the query itself
    // synthesizes 1 more email + 1 more long number per doc.
    val dir = docsDir(Seq(
      (1L, "write to jo.doe+x@mail-host.org or ops@a.io card 12345678 ok", "srcT"),
      (2L, "no pii here at all just words", "srcT")))
    val out = SparkEntry.queries("q62_pii_redaction")(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(out(1L) == ((3, 2, 0)), s"doc 1 (emails, nums, residual): ${out(1L)}")
    assert(out(2L) == ((1, 1, 0)), s"doc 2: ${out(2L)}")
    // The redaction law on the real corpus too: nothing survives.
    val real = SparkEntry.queries("q62_pii_redaction")(spark, "/root/testdata/sf0.001")
    assert(real.filter(col("n_residual") =!= 0).count() == 0,
      "residual PII after redaction on the corpus")
  }

  test("q119 DSIR direction: target-vocabulary candidate outranks off-domain candidate") {
    // Target domain (src1) speaks vocabulary A; doc 100 (non-target)
    // also speaks A, doc 101 speaks disjoint vocabulary B. The
    // importance score must prefer 100 — that is the entire point of
    // the log-likelihood-ratio weighting.
    val vocabA = "alpha beta gamma delta epsilon zeta eta theta"
    val vocabB = "zork quux blarg wibble frotz plugh xyzzy grue"
    val dir = docsDir(
      (1L to 8L).map(i => (i, s"$vocabA $vocabA", "src1")) ++ Seq(
        (100L, s"$vocabA $vocabA", "src9"),
        (101L, s"$vocabB $vocabB", "src9")))
    val out = SparkEntry.queries("q119_dsir_importance")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out.keySet == Set(100L, 101L), s"candidates only: ${out.keySet}")
    assert(out(100L) > out(101L),
      s"in-domain candidate must outrank: ${out(100L)} vs ${out(101L)}")
  }

  test("q114 BM25 direction: rare-term match outranks common-term match; idf orders terms") {
    // 'dup' appears in one doc (rare → high idf); 'spark' in ten
    // (common → low idf). Same tf and length everywhere, so the
    // ranking must follow idf alone.
    val filler = (1 to 6).map(i => s"f$i").mkString(" ")
    val dir = docsDir(
      Seq((1L, s"dup $filler", "s")) ++
        (2L to 11L).map(i => (i, s"spark $filler", "s")))
    val rows = SparkEntry.queries("q114_bm25_retrieval")(spark, dir).collect()
    val top = rows.head
    assert(top.getLong(0) == 1L, s"rare-term doc must rank first: ${rows.toSeq}")
    val scores = rows.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(scores(1L) > scores(2L), s"idf ordering violated: $scores")
  }
}
