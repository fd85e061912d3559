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

  test("q146 diversity law: a templated source scores lower entropy than a diverse one") {
    // src_flat repeats one word; src_rich uses all-distinct words of
    // the same volume. Entropy must separate them (0 vs ln 12), and
    // ttr/vocab must reconcile exactly.
    val flat = (0 until 3).map(i => (i.toLong, "spam spam spam spam", "src_flat"))
    val rich = (3 until 6).map(i =>
      (i.toLong, s"w${i}a w${i}b w${i}c w${i}d", "src_rich"))
    val dir = docsDir(flat ++ rich)
    val rows = SparkEntry.queries("q146_corpus_diversity")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val f = rows("src_flat"); val r = rows("src_rich")
    assert(f.getAs[Double]("entropy") == 0.0, s"one-word source entropy ${f.getAs[Double]("entropy")}")
    assert(math.abs(r.getAs[Double]("entropy") - math.log(12.0)) < 1e-3)
    assert(f.getAs[Long]("vocab") == 1L && r.getAs[Long]("vocab") == 12L)
    assert(f.getAs[Long]("n_tokens") == 12L && r.getAs[Long]("n_tokens") == 12L)
    assert(r.getAs[Double]("ttr") > f.getAs[Double]("ttr"))
  }

  test("q147 k-anonymity law: risky groups are exactly the size<5 groups, summary reconciles") {
    val rows = SparkEntry.queries("q147_k_anonymity")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "no risky group at sf0.001 — fixture vacuous")
    rows.foreach(r => assert(r.getAs[Long]("n_docs") < 5))
    val summaryRisk = rows.head.getAs[Long]("n_risky")
    assert(rows.length.toLong == summaryRisk,
      s"${rows.length} emitted rows != summary n_risky $summaryRisk")
    val atRisk = rows.map(_.getAs[Long]("n_docs")).sum
    assert(atRisk == rows.head.getAs[Long]("docs_at_risk"))
    // independent recomputation of one group's count
    val g = rows.head
    val direct = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("lang") === g.getAs[String]("lang")
        && col("source") === g.getAs[String]("source")
        && expr("n_chars div 100") === g.getAs[Long]("size_bucket")).count()
    assert(direct == g.getAs[Long]("n_docs"))
  }

  test("q168 entropy laws: uniform = ln(k) with evenness 1, degenerate = 0, bounds hold") {
    val dir = docsDir(Seq(
      (1L, "a b c d", "srcT"),          // uniform over 4 types
      (2L, "x x x x x", "srcT"),        // single-type support
      (3L, "", "srcT"),                 // empty text → one '' token
      (4L, "a a b b b b", "srcT")))     // skewed two-type
    val out = SparkEntry.queries("q168_entropy_gate")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3), r.getDouble(4), r.getBoolean(5)))).toMap
    assert(out(1L) == ((4, 4, 1.3863, 1.0, false)), s"uniform: ${out(1L)}")
    assert(out(2L) == ((5, 1, 0.0, 0.0, false)), s"degenerate: ${out(2L)}")
    assert(out(3L) == ((1, 1, 0.0, 0.0, false)), s"empty: ${out(3L)}")
    // skewed: H = -(1/3 ln 1/3 + 2/3 ln 2/3) ≈ 0.6365, evenness < 1
    assert(out(4L)._3 == 0.6365 && out(4L)._4 < 1.0, s"skewed: ${out(4L)}")
    // corpus-wide laws: H ∈ [0, ln(n_distinct)], evenness ∈ [0, 1],
    // every kept doc satisfies both gate legs
    val real = SparkEntry.queries("q168_entropy_gate")(spark, "/root/testdata/sf0.001")
    assert(real.filter(col("ent") < 0.0
      || col("ent") > col("norm_ent") * 0.0 + log(col("n_distinct").cast("double")) + 0.0001
      || col("norm_ent") < 0.0 || col("norm_ent") > 1.0001).count() == 0,
      "entropy bounds violated on the corpus")
    assert(real.filter(col("keep") && (col("ent") < 2.5 || col("n_tokens") < 20)).count() == 0,
      "keep gate violated")
    assert(real.filter(col("keep")).count() > 0 && real.filter(!col("keep")).count() > 0,
      "gate vacuous at sf0.001 — both regimes must be non-empty")
  }

  test("q169 zipf laws: perfect 1/r source fits slope -1 r2 1; degenerate sources guard to 0") {
    val dir = docsDir(Seq(
      // counts 12/r for ranks 1..4 (12, 6, 4, 3): ln c = ln 12 - ln r
      // exactly, so OLS slope = -1, r2 = 1, intercept = ln 12
      (1L, ("a " * 12 + "b " * 6 + "c " * 4 + "d " * 3).trim, "srcZ"),
      // uniform counts: varY = 0 -> slope 0 (cov = 0), r2 guard 0,
      // intercept = mean(ln 2) = ln 2
      (2L, "u1 u1 u2 u2 u3 u3", "srcU"),
      // single distinct word: n_top = 1, varX = 0 -> all guards fire
      (3L, "s s s", "srcS")))
    val out = SparkEntry.queries("q169_zipf_slope")(spark, dir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out("srcZ") == ((4L, -1.0, 2.4849, 1.0)), s"zipf: ${out("srcZ")}")
    assert(out("srcU") == ((3L, 0.0, 0.6931, 0.0)), s"uniform: ${out("srcU")}")
    assert(out("srcS") == ((1L, 0.0, 0.0, 0.0)), s"single: ${out("srcS")}")
    // corpus-wide laws: r2 in [0,1]; a templated corpus still slopes
    // DOWN (rank-1 count >= rank-64 count by construction of ranks)
    val real = SparkEntry.queries("q169_zipf_slope")(spark, "/root/testdata/sf0.001")
    assert(real.filter(col("r2") < 0.0 || col("r2") > 1.0001).count() == 0, "r2 out of [0,1]")
    assert(real.filter(col("n_top") > 1 && col("slope") > 0.0).count() == 0,
      "positive slope impossible: counts are non-increasing in rank")
  }

  test("q170 oov laws: head doc 0, tail doc 1, mixed docs straddle the 45% gate") {
    // 16 head words at count >= 20 monopolize the top-16 vocabulary;
    // tail words (counts 3..7) can never displace them, so the OOV
    // set is stable by construction.
    val head = (1 to 16).map(i => f"h$i%02d").flatMap(w => Seq.fill(20)(w))
    val dir = docsDir(Seq(
      (1L, head.mkString(" "), "srcT"),                       // all in-vocab
      (2L, "t1 t1 t1 t2", "srcT"),                            // all OOV
      (3L, "h01 h02 h03 t3 t3 t3 t3 t3 t3 t3", "srcT"),       // 7/10 = 0.70 > 45%
      (4L, "h01 h02 h03 h04 h05 h06 t4 t4 t4 t4", "srcT")))   // 4/10 = 0.40 <= 45%
    val out = SparkEntry.queries("q170_oov_rate")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))).toMap
    assert(out(1L) == ((320L, 0L, 0.0, true)), s"head: ${out(1L)}")
    assert(out(2L) == ((4L, 4L, 1.0, false)), s"tail: ${out(2L)}")
    assert(out(3L) == ((10L, 7L, 0.7, false)), s"mix-reject: ${out(3L)}")
    assert(out(4L) == ((10L, 4L, 0.4, true)), s"mix-keep: ${out(4L)}")
    // corpus-wide laws: counts reconcile with the doc's own tokens,
    // the gate is exactly the cross-multiplied inequality, and both
    // regimes are non-empty at sf0.001
    val real = SparkEntry.queries("q170_oov_rate")(spark, "/root/testdata/sf0.001")
    assert(real.filter(col("n_oov") > col("n_tokens") || col("n_oov") < 0).count() == 0)
    assert(real.filter(col("keep") =!= (col("n_oov") * 100 <= col("n_tokens") * 45)).count() == 0)
    assert(real.filter(col("keep")).count() > 0 && real.filter(!col("keep")).count() > 0,
      "gate vacuous at sf0.001 — both regimes must be non-empty")
  }

  test("q171 robust laws: median ignores the outlier that wrecks a mean; MAD=0 pins z-denominator") {
    def doc(id: Long, n: Int, src: String) = (id, Seq.fill(n)("w").mkString(" "), src)
    val dir = docsDir(Seq(
      // srcA lengths 8,10,12,14,16: med=12, devs {4,2,0,2,4} -> mad=2,
      // outlier iff dev > 6: none (the 16-token doc is NOT flagged)
      doc(1L, 8, "srcA"), doc(2L, 10, "srcA"), doc(3L, 12, "srcA"),
      doc(4L, 14, "srcA"), doc(5L, 16, "srcA"),
      // srcB lengths 10,10,10,10,100: med=10 (a MEAN would be 28 and
      // the z-denominator inflated by the outlier itself), devs
      // {0,0,0,0,90} -> mad=0 -> z-denominator pins to 1; only the
      // 100-token doc flags (90 > 0)
      doc(6L, 10, "srcB"), doc(7L, 10, "srcB"), doc(8L, 10, "srcB"),
      doc(9L, 10, "srcB"), doc(10L, 100, "srcB")))
    val out = SparkEntry.queries("q171_robust_outliers")(spark, dir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getDouble(5), r.getBoolean(6)))).toMap
    assert(out(3L) == ((12L, 2L, 0.0, false)), s"srcA median doc: ${out(3L)}")
    assert(out(5L) == ((12L, 2L, 2.0, false)), s"srcA widest doc: ${out(5L)}")
    assert(out(10L) == ((10L, 0L, 90.0, true)), s"srcB outlier: ${out(10L)}")
    assert(out(6L) == ((10L, 0L, 0.0, false)), s"srcB normal doc: ${out(6L)}")
    // corpus-wide laws: the flag is exactly the integer inequality,
    // and at least half of every source sits within one MAD of its
    // median (the defining property of the median of deviations)
    val real = SparkEntry.queries("q171_robust_outliers")(spark, "/root/testdata/sf0.001")
    assert(real.filter(col("is_outlier") =!=
      (abs(col("n_tokens") - col("med")) > col("mad") * 3)).count() == 0)
    val within = real.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      sum(when(abs(col("n_tokens") - col("med")) <= col("mad"), 1L)
        .otherwise(0L)).as("w"))
    assert(within.filter(col("w") * 2 < col("n")).count() == 0,
      "MAD law violated: fewer than half within one MAD of the median")
  }

  test("q173 temperature law: sqrt flattening boosts the low-resource source") {
    // src-small: 1 doc x 100 tokens; src-big: 1 doc x 10000 tokens.
    // Natural shares 1/101 vs 100/101; tau=0.5 shares sqrt(100):
    // sqrt(10000) = 10:100 -> 1/11 vs 10/11. Exact closed forms:
    // p_small = 1/11, boost_small = (1/11)/(100/10100) = 9.1818...,
    // boost_big = (10/11)/(10000/10100) = 0.9181...
    val dir = docsDir(Seq(
      (1L, Seq.fill(100)("w").mkString(" "), "src-small"),
      (2L, Seq.fill(10000)("w").mkString(" "), "src-big")))
    val out = SparkEntry.queries("q173_temperature_mixture")(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getDouble(3), r.getDouble(5)))).toMap
    val (ntS, pS, bS) = out("src-small")
    val (ntB, pB, bB) = out("src-big")
    assert(ntS == 100L && ntB == 10000L)
    assert(math.abs(pS - 1.0 / 11) < 1e-6 && math.abs(pB - 10.0 / 11) < 1e-6)
    assert(math.abs(bS - (1.0 / 11) / (100.0 / 10100)) < 1e-3, s"small boost $bS")
    assert(math.abs(bB - (10.0 / 11) / (10000.0 / 10100)) < 1e-3, s"big boost $bB")
    assert(bS > 1 && bB < 1, "tau<1 must upsample the low-resource source")
    // conservation laws on the real corpus: probabilities sum to ~1,
    // expected docs sum to ~the 10k budget, and token-weighted boost
    // averages to ~1
    val real = SparkEntry.queries("q173_temperature_mixture")(spark, "/root/testdata/sf0.001")
      .collect()
    val psum = real.map(_.getDouble(3)).sum
    val dsum = real.map(_.getDouble(4)).sum
    assert(math.abs(psum - 1.0) < 1e-3, s"sum p = $psum")
    assert(math.abs(dsum - 10000.0) < 1.0, s"sum expected docs = $dsum")
  }
}
