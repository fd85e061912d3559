package graft

import org.apache.spark.sql.functions._

/** Structural invariants of the corpus-curation family (q75-q84) that
  * the row/hash differential can't express directly: conservation laws
  * of the dedups, windowing/packing coverage, verdict and gate
  * soundness. Value-level equality stays with the DuckDB oracle. */
class CurationSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"
  private def q(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("q75 conservation: total kept chunks == distinct chunks corpus-wide") {
    val out = q("q75_chunk_dedup_corpus")
    val keptTotal = out.agg(sum("n_kept")).first().getLong(0)
    // Independent recount of the same 10-token chunking.
    val toks = split(col("text"), " ")
    val nc = ceil(size(toks).cast("double") / 10.0).cast("int")
    val distinctChunks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), toks.as("ws"), nc.as("nc"))
      .select(explode(expr(
        "transform(sequence(0, nc - 1), i -> array_join(slice(ws, i * 10 + 1, 10), ' '))"))
        .as("chunk"))
      .select(countDistinct("chunk")).first().getLong(0)
    assert(keptTotal == distinctChunks,
      s"kept $keptTotal chunks but corpus has $distinctChunks distinct")
    // Nothing invents chunks: kept never exceeds total per doc.
    assert(out.filter(col("n_kept") > col("n_chunks")).count() == 0)
  }

  test("q78 windows cover every doc exactly: count and tail-size laws") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
    val wins = q("q78_sequence_windows")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("nw"), max("win_idx").as("last_idx"),
        min("n_win_tokens").as("min_tok"), max("n_win_tokens").as("max_tok"),
        sum(when(col("n_win_tokens") =!= 32, 1).otherwise(0)).as("n_short"))
      .join(docs, "doc_id")
    // Window count matches the stride formula; idx is dense 0..nw-1.
    val badCount = wins.filter(
      col("nw") =!= when(col("n") <= 32, lit(1))
        .otherwise(ceil((col("n") - 32).cast("double") / 16.0).cast("int") + 1)
        || col("last_idx") =!= col("nw") - 1)
    assert(badCount.count() == 0)
    // At most the LAST window is shorter than 32, and its length is
    // n - 16*(nw-1) (i.e. stride coverage ends exactly at the doc end).
    val badTail = wins.filter(
      col("n_short") > 1
        || (col("n") > 32 && col("min_tok") =!= least(lit(32), col("n") - (col("nw") - 1) * 16))
        || (col("n") <= 32 && col("min_tok") =!= col("n")))
    assert(badTail.count() == 0)
  }

  test("q76 sampling is deterministic and respects the per-stratum rate") {
    val a = q("q76_stratified_sample")
    assert(a.filter(col("bucket") >= col("rate")).count() == 0)
    // Pure function of doc_id: a second run is set-identical.
    val b = q("q76_stratified_sample")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("q79 gate soundness: every surviving doc is >=5 and under 10%") {
    val out = q("q79_contamination_gate")
    assert(out.filter(col("doc_id") < 5).count() == 0)
    assert(out.filter(col("n_hit") * 10 > col("n_shingles")).count() == 0)
    // hit_frac is consistent with the integer columns it was derived from.
    assert(out.filter(
      abs(col("hit_frac") - col("n_hit").cast("double") / col("n_shingles")) > 0.001)
      .count() == 0)
  }

  test("q81 packing conservation: per-lang token totals survive, sequences dense and full") {
    val totals = Tables.documents(spark, sfDir)
      .groupBy("lang").agg(sum(size(split(col("text"), " "))).as("n_corpus"))
    val packed = q("q81_sequence_packing")
      .groupBy("lang")
      .agg(sum("n_tokens").as("n_packed"), count(lit(1)).as("n_seqs"),
        max("seq_idx").as("last_idx"),
        sum(when(col("n_tokens") =!= 32, 1).otherwise(0)).as("n_partial"))
      .join(totals, "lang")
    // Packing must not invent or drop a single token, sequence ids are
    // dense 0..n-1, and only the final tail sequence may be short.
    val bad = packed.filter(
      col("n_packed") =!= col("n_corpus")
        || col("last_idx") =!= col("n_seqs") - 1
        || col("n_partial") > 1)
    assert(bad.count() == 0, bad.collect().mkString("\n"))
  }

  test("q80 gopher verdict is exactly the conjunction of its emitted metrics") {
    val out = q("q80_gopher_rules")
    val recomputed = col("n_words").between(20, 100000)
      .and(col("mean_word_len").between(3.0, 10.0))
      .and(col("dup_2gram_frac") <= 0.2)
      .and(col("dup_3gram_frac") <= 0.18)
      .and(col("stop_hits") >= 2)
    assert(out.filter(col("keep") =!= recomputed).count() == 0)
    // The filter must be non-degenerate on the corpus: both verdicts occur.
    assert(out.filter(col("keep")).count() > 0)
    assert(out.filter(!col("keep")).count() > 0)
  }

  test("q83 first locations are real span starts and every span recurs") {
    val out = q("q83_repeated_substrings")
    assert(out.filter(col("n_occurrences") < 2).count() == 0)
    val docLens = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("first_doc"), size(split(col("text"), " ")).as("n"))
    // A claimed first occurrence must fit a 20-token window in its doc.
    val bad = out.join(docLens, "first_doc")
      .filter(col("first_pos") < 0 || col("first_pos") > col("n") - 20)
    assert(bad.count() == 0, bad.collect().mkString("\n"))
    // Re-derive the span at each first location and check it hashes to span_fp.
    val spans = Tables.documents(spark, sfDir)
      .select(col("doc_id").as("first_doc"), split(col("text"), " ").as("ws"))
    val mismatch = out.join(spans, "first_doc")
      .filter(md5(concat_ws(" ",
        slice(col("ws"), col("first_pos") + 1, lit(20)))) =!= col("span_fp"))
    assert(mismatch.count() == 0)
  }

  test("streaming corpus ingest == batch curation (filter + first-arrival dedup)") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    // Real corpus rows (so the Gopher filter bites), delivered in
    // doc_id order with cross-batch duplicate re-deliveries.
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("text"))
      .orderBy(col("doc_id")).limit(60)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val stamped = docs.zipWithIndex.map { case ((id, lang, text), i) =>
      (id, new java.sql.Timestamp(1700000000000L + i * 1000L), lang, text)
    }
    val stream = MemoryStream[(Long, java.sql.Timestamp, String, String)]
    val q = graft.streaming.CorpusIngest.curatedStream(
      stream.toDF().toDF("doc_id", "ingest_ts", "lang", "text"))
      .writeStream.format("memory").queryName("curated_mem")
      .outputMode("append").start()
    try {
      stream.addData(stamped.take(30))
      q.processAllAvailable()
      stream.addData(stamped.drop(30) ++ stamped.take(10)) // re-deliver first 10
      q.processAllAvailable()
      stream.addData(stamped.take(5)) // third-batch re-delivery
      q.processAllAvailable()
    } finally q.stop() // leak-proof: a throw above must not strand the stateful query
    // Contract is the FINGERPRINT set (exactly one survivor per fp);
    // which doc_id represents an intra-batch duplicate is arbitrary.
    val streaming = spark.table("curated_mem")
      .select("fp").as[String].collect().toList
    assert(streaming.size == streaming.toSet.size, "duplicate fingerprint emitted")
    val batch = Tables.documents(spark, sfDir)
      .orderBy(col("doc_id")).limit(60)
      .withColumn("toks", split(col("text"), " "))
      .filter(graft.queries.Curation.gopherKeepExpr)
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"))
      .distinct().as[String].collect().toSet
    assert(streaming.toSet == batch,
      s"streaming-only: ${streaming.toSet.diff(batch)}; batch-only: ${batch.diff(streaming.toSet)}")
  }

  test("q77 heavy hitters are ranked and honest counts") {
    val rows = q("q77_ngram_heavy_hitters").collect()
    assert(rows.length == 50)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.zip(ns.tail).forall { case (x, y) => x >= y }, "counts must be non-increasing")
    assert(ns.forall(_ >= 1))
  }

  test("q91 sketch verdicts: non-vacuous heavy set, all guarantees hold") {
    val rows = q("q91_heavy_hitters_sketch").collect()
    assert(rows.nonEmpty, "no heavy hitters — the guarantee check is vacuous")
    // Both verdict bits must be 1 on every row (presence + two-sided
    // estimate bound — the theorems MisraGriesSpec proves on fixtures,
    // here checked over the real corpus stream).
    assert(rows.forall(r => r.getAs[Int]("in_sketch") == 1), "heavy item missing from sketch")
    assert(rows.forall(r => r.getAs[Int]("bounds_ok") == 1), "estimate outside the n/k band")
  }

  test("q92 bloom laws: zero false negatives, hits dominate exact, non-vacuous") {
    val out = q("q92_bloom_decontamination").persist()
    // The Bloom guarantee: contamination can never slip through.
    assert(out.filter(col("n_false_neg") =!= 0).count() == 0, "bloom false negative")
    // Per-shingle soundness implies per-doc dominance.
    assert(out.filter(col("n_bloom_hits") < col("n_exact_hits")).count() == 0)
    // Counts are consistent: bloom = exact + false positives.
    assert(out.filter(col("n_bloom_hits") =!=
      col("n_exact_hits") + col("n_false_pos")).count() == 0)
    // The corpus actually overlaps the benchmark at this SF.
    assert(out.agg(sum("n_exact_hits")).first().getLong(0) > 0, "vacuous: no contamination")
    out.unpersist()
  }

  test("q185 min-k% prob matches an independent driver-side reimplementation") {
    val out = SparkEntry.queries("q185_minkprob_membership")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(out.nonEmpty)

    // independent path: plain Scala maps — same tokenization (split
    // keeps interior AND trailing empties, hence limit -1), same
    // e4 quantization (JVM Math.log == Spark's ln in-process), same
    // integer-exact selection and final division.
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val allToks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val vocab = allToks.flatMap(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = vocab.values.sum.toDouble
    def nll4(w: String): Long =
      math.floor(-math.log(vocab(w) / n) * 10000 + 0.5).toLong
    def fr4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    val expected = allToks.map { case (id, ws) =>
      val m = (ws.length + 4) / 5
      val sel = ws.map(w => (nll4(w), w)).sortBy { case (v, w) => (-v, w) }.take(m)
      (id, ws.length.toLong, m.toLong, fr4(sel.map(_._1).sum.toDouble / (m * 10000.0)))
    }.toSet
    assert(out.toSet == expected,
      s"diverges: extra=${out.toSet -- expected} missing=${expected -- out.toSet}")
    // the statistic orders differently from the full-doc mean for at
    // least some documents (the min-k tail carries signal the q87
    // mean washes out) — non-vacuity of the truncation
    out.foreach { case (_, nTok, m, _) =>
      assert(m == (nTok + 4) / 5, "selection size law")
    }
  }

  test("q189 source drift matches an independent driver-side JSD") {
    val out = SparkEntry.queries("q189_source_token_drift")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))
    assert(out.nonEmpty)
    // independent path: plain Scala maps, same tokenization, same
    // e9 quantization and closed form
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getString(1), r.getString(2)))
    val bySrc = docs.groupBy(_._1).view
      .mapValues(_.flatMap(d => d._2.split(" ", -1))).toMap
    val corpusCounts = bySrc.values.flatten.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val n = corpusCounts.values.sum.toDouble
    // coverage sums per-type e9-quantized q values, so a source
    // covering most of the vocabulary accumulates up to ±0.5e-9 of
    // rounding PER TYPE above the exact ≤1.0 bound — the slack is the
    // statistic's own quantization budget, not a correctness fudge
    val covSlack = corpusCounts.size * 1e-9 + 1e-9
    out.foreach { case (src, nDocs, nToks, cov, jsd) =>
      assert(nDocs > 0 && nToks > 0, s"$src empty")
      assert(cov > 0 && cov <= 1.0 + covSlack, s"$src coverage $cov out of range")
      assert(jsd >= -1e-9 && jsd <= math.log(2) + 1e-9, s"$src jsd $jsd out of [0, ln2]")
    }
    def fr6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val expected = bySrc.map { case (src, ws) =>
      val cs = ws.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val ns = ws.length.toDouble
      var t9 = 0L; var q9 = 0L
      cs.toSeq.foreach { case (w, c) =>
        val p = c / ns; val q = corpusCounts(w) / n
        val t = (p * math.log(2 * p / (p + q)) + q * math.log(2 * q / (p + q))
          - q * math.log(2)) / 2
        t9 += math.floor(t * 1e9 + 0.5).toLong
        q9 += math.floor(q * 1e9 + 0.5).toLong
      }
      src -> (fr6(q9.toDouble / 1e9), fr6(t9.toDouble / 1e9 + math.log(2) / 2))
    }
    out.foreach { case (src, _, _, cov, jsd) =>
      val (ecov, ejsd) = expected(src)
      assert(cov == ecov && jsd == ejsd,
        s"$src diverges: got ($cov,$jsd) expected ($ecov,$ejsd)")
    }
  }

  test("q193 coverage curve: k is MINIMAL against a driver-side Zipf ranking") {
    val out = SparkEntry.queries("q193_vocab_coverage")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq("p90", "p95", "p99"))
    // driver-side truth: full per-type counts, sorted by frequency
    // desc (equal-frequency types are interchangeable, so any
    // tiebreak yields the same cumulative curve)
    val counts = Tables.documents(spark, sfDir)
      .select("text").collect().flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map(_._2.length.toLong).toSeq.sorted.reverse
    val n = counts.sum
    val cum = counts.scanLeft(0L)(_ + _).tail // cum(i) = tokens of top i+1 types
    val targets = Seq("p90" -> (9L, 10L), "p95" -> (19L, 20L), "p99" -> (99L, 100L)).toMap
    out.foreach { case (t, k, share, nTok) =>
      assert(nTok == n, s"$t token total $nTok != $n")
      val (num, den) = targets(t)
      assert(cum(k.toInt - 1) * den >= num * n, s"$t: k=$k does not reach the target")
      if (k > 1) assert(cum(k.toInt - 2) * den < num * n, s"$t: k=$k not minimal")
      assert(share == math.floor(cum(k.toInt - 1).toDouble / n * 1e6 + 0.5) / 1e6,
        s"$t: share law")
    }
    // monotone in the target
    val ks = out.map(_._2)
    assert(ks(0) <= ks(1) && ks(1) <= ks(2), s"k not monotone: ${ks.toSeq}")
  }

  test("q200 water-filling invariants: feasible, cap-respecting, level-consistent, both branches live") {
    // columns: rnk, source, cap, vocab, tier, weight, saturated,
    // alloc, budget, share
    val rows = SparkEntry.queries("q200_token_budget_mixture")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(5), r.getBoolean(6),
        r.getLong(7), r.getLong(8)))
    assert(rows.nonEmpty)
    val budget = rows.head._6
    // feasibility: never exceeds the budget; slack strictly below the
    // unsaturated weight sum (else the level could rise one more unit)
    val allocSum = rows.map(_._5).sum
    assert(allocSum <= budget, s"allocated $allocSum > budget $budget")
    rows.foreach { case (rnk, cap, w, sat, alloc, _) =>
      assert(alloc >= 0 && alloc <= cap, s"rank $rnk: alloc $alloc vs cap $cap")
      if (sat) assert(alloc == cap, s"rank $rnk saturated but alloc $alloc != cap $cap")
      assert(w > 0, s"rank $rnk: nonpositive weight")
    }
    // water level: every unsaturated alloc is floor(w * lambda) for
    // ONE shared rational lambda = remB/remW — check via the exact
    // integer reconstruction
    val unsat = rows.filter(!_._4)
    if (unsat.nonEmpty) {
      val remB = budget - rows.filter(_._4).map(_._5).sum
      val remW = unsat.map(_._3).sum
      unsat.foreach { case (rnk, _, w, _, alloc, _) =>
        assert(alloc == remB * w / remW,
          s"rank $rnk: alloc $alloc != floor($remB * $w / $remW)")
      }
      // saturated sources sit at or below the level: cap <= w * lambda
      rows.filter(_._4).foreach { case (rnk, cap, w, _, _, _) =>
        assert(cap * remW <= remB * w,
          s"rank $rnk saturated above the water level")
      }
    }
    // the md5 tier spread keeps BOTH branches live on this corpus —
    // the degenerate all-proportional output would pass every check
    // above while never exercising the saturation path in the oracle
    assert(rows.exists(_._4), "no saturated source — allocator degenerate")
    assert(unsat.nonEmpty, "every source saturated — budget not binding")
  }
}
