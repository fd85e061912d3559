package graft

import org.apache.spark.sql.functions._

/** Semantic fixtures for the learned-curation family (q133-q136) —
  * direction/shape laws the DuckDB differential can't catch because
  * both engines run the same formulas.
  */
class LearningSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  test("q133: three GD steps reduce the training log-loss below the w=0 baseline") {
    val out = SparkEntry.queries("q133_quality_classifier")(spark, sfDir)
      .select(col("label").cast("double").as("y"), col("score")).collect()
    // w = 0 scores every doc 0.5 → loss = ln 2. The trained scores
    // must beat that ON AVERAGE (full-batch GD on a convex loss with
    // a small step strictly descends). Scores are 4dp-rounded; clamp
    // away from 0/1 before the log (rounding can emit exact 0/1).
    val eps = 1e-4
    val losses = out.map { r =>
      val y = r.getDouble(0)
      val p = math.min(1 - eps, math.max(eps, r.getDouble(1)))
      -(y * math.log(p) + (1 - y) * math.log(1 - p))
    }
    val mean = losses.sum / losses.length
    assert(mean < math.log(2.0), s"trained mean loss $mean not below ln2 baseline")
  }

  test("q133: pred column is exactly score >= 0.5 and labels match the q30 quality gate") {
    val out = SparkEntry.queries("q133_quality_classifier")(spark, sfDir)
    val bad = out.filter((col("score") >= 0.5) =!= col("pred")).count()
    assert(bad == 0)
    // the distillation target: label 1 iff the q30 quality heuristic
    // (unrounded) reaches 0.5
    val toks = split(col("text"), " ")
    val nTok = size(toks).cast("double")
    val nStop = size(filter(toks, t =>
      t.isin(graft.functions.TextFns.STOPWORDS.map(x => x: Any): _*))).cast("double")
    val gate = least(lit(1.0), nTok / 100.0) * (lit(1.0) - nStop / nTok) >= 0.5
    val docs = Tables.documents(spark, sfDir).select(col("doc_id"), gate.as("g"))
    val joined = out.join(docs, Seq("doc_id"))
      .filter(col("g") =!= (col("label") === 1))
    assert(joined.count() == 0)
    // both classes present and the fit actually separates: most
    // predictions agree with the gate
    val acc = out.join(docs, Seq("doc_id"))
      .filter(col("g") === col("pred")).count().toDouble / out.count()
    // 3 conservative GD steps leave the 0.5 cut below some true
    // positives (precision 1, recall ~0.6 at sf0.001); the ranking
    // itself is near-perfect (q152's holdout AUC ~0.99)
    assert(acc > 0.7, s"distilled classifier accuracy $acc too low")
  }

  test("q152: holdout eval is non-degenerate — AUC well above chance, calibration monotone-ish") {
    val rows = SparkEntry.queries("q152_classifier_eval")(spark, sfDir).collect()
    assert(rows.length >= 2, "calibration collapsed to one bin")
    val auc = rows.head.getAs[Double]("auc")
    assert(auc > 0.8, s"holdout AUC $auc — the distillation target should be learnable")
    val conf = (rows.head.getAs[Long]("tp"), rows.head.getAs[Long]("fp"),
      rows.head.getAs[Long]("fn"), rows.head.getAs[Long]("tn"))
    assert(conf._1 + conf._2 + conf._3 + conf._4 ==
      rows.map(_.getAs[Long]("n")).sum, s"confusion $conf does not cover the holdout")
    // reliability: the lowest-score bin must not out-rate the highest
    val sorted = rows.sortBy(_.getAs[Long]("decile"))
    assert(sorted.head.getAs[Double]("pos_rate") <= sorted.last.getAs[Double]("pos_rate") + 1e-9)
  }

  test("q153: fairness audit reconciles group counts with the corpus") {
    val rows = SparkEntry.queries("q153_fairness_audit")(spark, sfDir).collect()
    val n = rows.map(_.getAs[Long]("n")).sum
    assert(n == Tables.documents(spark, sfDir).count())
    val overall = rows.head.getAs[Double]("overall_rate")
    rows.foreach { r =>
      val gap = r.getAs[Double]("parity_gap")
      assert(math.abs(gap - (r.getAs[Double]("pos_rate") - overall)) < 2e-6)
      assert(r.getAs[Boolean]("flagged") == (math.abs(
        r.getAs[Long]("n_pos").toDouble / r.getAs[Long]("n") - overall) > 0.1))
    }
    val wPos = rows.map(r => r.getAs[Long]("n_pos")).sum.toDouble / n
    assert(math.abs(wPos - overall) < 2e-6, "overall rate does not reconcile")
  }

  test("q134: alphas form a distribution and upweight above-average-NLL domains") {
    val rows = SparkEntry.queries("q134_domain_mixture")(spark, sfDir).collect()
    val aSum = rows.map(_.getAs[Double]("alpha")).sum
    assert(math.abs(aSum - 1.0) < 1e-4, s"alpha sum $aSum")
    // token-weighted mean NLL
    val totTok = rows.map(_.getAs[Long]("n_tokens")).sum.toDouble
    val gbar = rows.map(r => r.getAs[Long]("n_tokens") * r.getAs[Double]("avg_nll")).sum / totTok
    val uniform = 1.0 / rows.length
    rows.foreach { r =>
      val above = r.getAs[Double]("avg_nll") > gbar + 1e-9
      val below = r.getAs[Double]("avg_nll") < gbar - 1e-9
      val a = r.getAs[Double]("alpha")
      if (above) assert(a > uniform - 1e-6, s"${r.getAs[String]("source")} above-avg but alpha $a < uniform")
      if (below) assert(a < uniform + 1e-6, s"${r.getAs[String]("source")} below-avg but alpha $a > uniform")
      assert(r.getAs[Long]("token_budget") == math.floor(a * 1e6 + 0.5).toLong)
    }
  }

  test("q135: bigram counts reconcile with token counts and NLLs are positive") {
    val out = SparkEntry.queries("q135_bigram_lm")(spark, sfDir)
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"), (size(split(col("text"), " ")) - 1).cast("long").as("exp_n"))
      .filter(col("exp_n") >= 1)
    val mismatched = out.join(expected, Seq("doc_id"))
      .filter(col("n_bigrams") =!= col("exp_n")).count()
    assert(mismatched == 0)
    assert(out.filter(col("avg_nll") <= 0).count() == 0)
    assert(out.count() == expected.count())
  }

  test("q135: a doc of repeated high-probability bigrams scores lower NLL than rare-bigram docs") {
    // Ranking sanity on the real corpus: the doc whose bigrams are
    // most frequent corpus-wide must not be the worst-scored doc.
    val out = SparkEntry.queries("q135_bigram_lm")(spark, sfDir).collect()
    val span = out.map(_.getAs[Double]("avg_nll"))
    assert(span.max - span.min > 0.1, "bigram LM gives a flat score — no discrimination")
  }

  test("q136: neighbors are cluster-mates, ranks are consecutive, sims non-increasing") {
    val out = SparkEntry.queries("q136_knn_graph")(spark, sfDir).collect()
    val byVec = out.groupBy(_.getAs[Long]("vec_id"))
    byVec.foreach { case (v, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq == (1L to sorted.length).toSeq, s"vec $v ranks")
      val sims = sorted.map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.drop(1)).forall { case (a, b) => a >= b - 1e-9 }, s"vec $v sims not sorted")
      assert(rows.map(_.getAs[Long]("neighbor")).distinct.length == rows.length, s"vec $v dup neighbor")
      assert(rows.map(_.getAs[Long]("cluster_id")).distinct.length == 1, s"vec $v crosses clusters")
    }
  }

  test("q137: fertility >= 1 everywhere and per-lang word counts cover the corpus") {
    val rows = SparkEntry.queries("q137_tokenizer_fertility")(spark, sfDir).collect()
    rows.foreach { r =>
      assert(r.getAs[Double]("fertility") >= 1.0, s"${r.getAs[String]("lang")} fertility < 1")
      assert(r.getAs[Long]("n_subwords") >= r.getAs[Long]("n_words"))
    }
    val totalWords = rows.map(_.getAs[Long]("n_words")).sum
    val corpusToks = Tables.documents(spark, sfDir)
      .select(sum(size(split(col("text"), " ")))).first().getLong(0)
    assert(totalWords == corpusToks, s"per-lang words $totalWords != corpus tokens $corpusToks")
  }

  test("q137: 8 merges strictly reduce fertility vs the unmerged character tokenizer") {
    // Character-level fertility = avg word length; BPE merges can only
    // shrink subword counts, and with 8 learned merges must do so
    // strictly somewhere.
    val rows = SparkEntry.queries("q137_tokenizer_fertility")(spark, sfDir).collect()
    val charFert = Tables.documents(spark, sfDir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("lang"))
      .agg((sum(length(col("w"))).cast("double") / count(lit(1))).as("cf"))
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Double]("cf")).toMap
    var strict = false
    rows.foreach { r =>
      val f = r.getAs[Double]("fertility")
      val cf = charFert(r.getAs[String]("lang"))
      assert(f <= cf + 1e-9, s"${r.getAs[String]("lang")}: BPE fertility $f above char fertility $cf")
      if (f < cf - 1e-9) strict = true
    }
    assert(strict, "8 merges changed no language's fertility at all")
  }

  test("q138: negatives differ in label, share the anchor's cluster, ranks consecutive") {
    val out = SparkEntry.queries("q138_hard_negatives")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Int]("anchor_label") != r.getAs[Int]("negative_label"))
    }
    val cluster = SparkEntry.queries("q85_kmeans_assign")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("cluster_id")).toMap
    out.foreach { r =>
      assert(cluster(r.getAs[Long]("anchor")) == cluster(r.getAs[Long]("negative")),
        s"anchor ${r.getAs[Long]("anchor")} negative in another cluster")
    }
    out.groupBy(_.getAs[Long]("anchor")).foreach { case (a, rows) =>
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to rows.length).toSeq, s"anchor $a ranks")
    }
  }

  test("q139: buckets are ordered by score within each language and tail is dropped") {
    val out = SparkEntry.queries("q139_perplexity_buckets")(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach(r => assert(r.getAs[Boolean]("keep") == (r.getAs[String]("bucket") != "tail")))
    out.groupBy(_.getAs[String]("lang")).foreach { case (lang, rows) =>
      def scores(b: String) =
        rows.filter(_.getAs[String]("bucket") == b).map(_.getAs[Double]("avg_nll"))
      val (h, m, t) = (scores("head"), scores("middle"), scores("tail"))
      assert(h.nonEmpty && m.nonEmpty && t.nonEmpty, s"$lang: a tercile is empty")
      assert(h.max <= m.min, s"$lang: head overlaps middle")
      assert(m.max <= t.min, s"$lang: middle overlaps tail")
      // terciles: each bucket within [n/3 - ties, n/3 + ties] — sanity
      // that no bucket swallowed the language
      val n = rows.length
      Seq(h, m, t).foreach(b => assert(b.length < n, s"$lang: one bucket took everything"))
    }
  }

  test("q140: seeds keep their true label at round 0; assignments are consistent") {
    val out = SparkEntry.queries("q140_label_propagation")(spark, sfDir).collect()
    out.foreach { r =>
      val v = r.getAs[Long]("vec_id")
      val rnd = r.getAs[Int]("round_assigned")
      val pred = r.getAs[Int]("predicted")
      if (v % 5 == 0) {
        assert(rnd == 0, s"seed $v round $rnd")
        assert(pred == r.getAs[Int]("true_label"), s"seed $v predicted $pred")
      } else {
        assert(rnd != 0, s"non-seed $v claims round 0")
      }
      assert((pred == -1) == (rnd == -1), s"vec $v predicted/round inconsistent")
      assert(r.getAs[Boolean]("hit") == (pred == r.getAs[Int]("true_label")))
    }
    val spread = out.count(r => r.getAs[Int]("round_assigned") > 0)
    assert(spread > 0, "propagation labeled nothing beyond the seeds")
  }

  test("q140: round-1 labels match a driver-side recomputation from the kNN graph") {
    val edges = SparkEntry.queries("q136_knn_graph")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("neighbor"))
    val labels = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("label")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("label")).toMap
    val expectedR1 = edges.toSeq.groupBy(_._1).flatMap { case (v, es) =>
      if (v % 5 == 0) None
      else {
        val votes = es.map(_._2).filter(_ % 5 == 0).map(labels)
          .groupBy(identity).view.mapValues(_.size).toSeq
        if (votes.isEmpty) None
        else Some(v -> votes.minBy { case (l, c) => (-c, l) }._1)
      }
    }
    val got = SparkEntry.queries("q140_label_propagation")(spark, sfDir).collect()
      .filter(_.getAs[Int]("round_assigned") == 1)
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Int]("predicted")).toMap
    assert(got == expectedR1, "round-1 assignments diverge from the reference recomputation")
  }

  test("q141: per-domain selection is greedy-maximal under its budget") {
    val out = SparkEntry.queries("q141_mixture_apply")(spark, sfDir).collect()
    assert(out.nonEmpty)
    var budgetSum = 0L
    out.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val budget = rows.head.getAs[Long]("budget")
      budgetSum += budget
      val kept = rows.filter(_.getAs[Boolean]("kept"))
      val dropped = rows.filterNot(_.getAs[Boolean]("kept"))
      val keptTok = kept.map(_.getAs[Long]("n_tokens")).sum
      assert(keptTok <= budget, s"$src kept $keptTok > budget $budget")
      // maximality: every dropped doc's running total already
      // overflows, so no prefix extension fits
      dropped.foreach(r => assert(r.getAs[Long]("cum_tokens") > budget,
        s"$src doc ${r.getAs[Long]("doc_id")} dropped below budget"))
      // the kept set IS the cum<=budget prefix
      assert(kept.map(_.getAs[Long]("cum_tokens")).forall(_ <= budget))
    }
    val total = out.groupBy(_.getAs[String]("source"))
      .map(_._2.map(_.getAs[Long]("n_tokens")).sum).sum
    assert(math.abs(budgetSum - total / 2.0) < out.length,
      s"budgets $budgetSum drifted from half the corpus ${total / 2}")
  }

  test("q142: drift stats reconcile with a driver-side recomputation; null split is quiet") {
    val rows = SparkEntry.queries("q142_embedding_drift")(spark, sfDir).collect()
    assert(rows.length == 64)
    // driver-side recomputation of dim 1 from raw embeddings
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getSeq[Float](1).map(x =>
        math.floor(x.toDouble * 1000 + 0.5).toLong)))
    val (a, b) = e.partition(_._1 % 2 == 0)
    def mean(vs: Seq[Long]) = vs.sum.toDouble / vs.length
    val d1 = rows.find(_.getAs[Long]("dim") == 1L).get
    val ma = mean(a.map(_._2.head).toSeq)
    val mb = mean(b.map(_._2.head).toSeq)
    assert(math.abs(d1.getAs[Double]("mean_a") - ma / 1000.0) < 1e-5)
    assert(math.abs(d1.getAs[Double]("mean_b") - mb / 1000.0) < 1e-5)
    assert(rows.forall(r => r.getAs[Long]("n_a") == a.length && r.getAs[Long]("n_b") == b.length))
    // parity split of an unchanged corpus = the null distribution:
    // z > 3 should flag (essentially) nothing
    val flagged = rows.count(_.getAs[Boolean]("drifted"))
    assert(flagged <= 2, s"$flagged of 64 dims flagged on the null split")
  }

  test("q148: triangle census matches a driver-side brute force over the kNN edges") {
    val edges = SparkEntry.queries("q136_knn_graph")(spark, sfDir).collect()
      .map(r => {
        val a = r.getAs[Long]("vec_id"); val b = r.getAs[Long]("neighbor")
        (math.min(a, b), math.max(a, b))
      }).distinct
    val eset = edges.toSet
    val byNode = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var triangles = 0L
    for ((a, b) <- edges; c <- byNode(a) if c > b && eset.contains((b, c))) triangles += 1
    val rows = SparkEntry.queries("q148_triangle_count")(spark, sfDir).collect()
    assert(rows.nonEmpty, "no triangles at sf0.001 — graph fixture vacuous")
    val got = rows.head.getAs[Long]("n_triangles")
    assert(got == triangles, s"engine $got triangles != brute force $triangles")
    assert(rows.head.getAs[Long]("n_edges") == edges.length)
    val cc = rows.head.getAs[Double]("global_clustering")
    assert(cc > 0 && cc <= 1.0 + 1e-9, s"clustering coefficient $cc out of range")
    // per-node counts sum to 3 × triangles over ALL nodes; the top-20
    // cut shown must each participate in >= 1 triangle
    rows.foreach(r => assert(r.getAs[Long]("n_tri") >= 1))
  }

  test("q149: SES forecast is a convex-bounded recency blend; one user re-derived") {
    val rows = SparkEntry.queries("q149_exp_smoothing")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val hourNs = 3600L * 1000 * 1000 * 1000
    val counts = Tables.events(spark, sfDir)
      .select(col("user_id"), expr(s"ts div $hourNs").as("h"))
      .groupBy(col("user_id"), col("h")).agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("h"), r.getAs[Long]("n")))
    val tmax = counts.map(_._2).max
    rows.foreach { r =>
      val u = r.getAs[Long]("user_id")
      val mine = counts.filter(_._1 == u)
      val maxN = mine.map(_._3).max.toDouble
      val f = r.getAs[Double]("forecast")
      // a long-dormant user's weights all underflow the 6dp rounding:
      // forecast 0.0 is the correct "expect nothing" answer
      assert(f >= 0 && f <= maxN + 1e-9, s"user $u forecast $f outside [0, max=$maxN]")
      val manual = mine.map { case (_, h, n) =>
        0.5 * math.pow(0.5, (tmax - h).toDouble) * n }.sum
      assert(math.abs(f - manual) < 1e-5, s"user $u forecast $f != recompute $manual")
      assert(r.getAs[Long]("n_hours_active") == mine.length)
    }
  }

  test("q150: PQ codes are in range and reconstruction beats the zero-vector baseline") {
    val rows = SparkEntry.queries("q150_pq_encode")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // codes serialize as a comma-joined string (driver-harness-safe
      // scalar since round 8)
      val codes = r.getAs[String]("codes").split(",").map(_.toLong).toSeq
      assert(codes.length == 8)
      assert(codes.forall(c => c >= 0 && c < 8), s"code out of range: $codes")
      assert(r.getAs[Double]("recon_err") >= 0)
    }
    // mean PQ residual must beat encoding everything as the zero
    // vector (whose residual is ||x||²) — the trained-codebook
    // sanity floor
    val meanErr = rows.map(_.getAs[Double]("recon_err")).sum / rows.length
    val meanNorm = Tables.embeddings(spark, sfDir)
      .select(graft.functions.VectorFns.normSqF("embedding").as("n"))
      .collect().map(_.getDouble(0)).sum / rows.length
    // on this near-isotropic synthetic corpus 8 centroids per 8-dim
    // subspace retain ~30% of the energy (measured 0.71 residual at
    // unit norm); the hard law is strict improvement over the
    // zero-vector code, with margin
    assert(meanErr < 0.9 * meanNorm,
      s"PQ residual $meanErr not meaningfully below zero-code baseline $meanNorm")
  }

  test("q151: ADC ranking laws — consecutive ranks, hit bookkeeping, informative lift") {
    val rows = SparkEntry.queries("q151_pq_adc_search")(spark, sfDir).collect()
    assert(rows.length == 80) // 8 probes × top-10
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 10L), s"probe $p ranks")
      val adcs = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("adc"))
      assert(adcs.zip(adcs.drop(1)).forall { case (a, b) => a <= b + 1e-9 }, s"probe $p adc order")
    }
    val hitSum = rows.map(_.getAs[Int]("hit").toLong).sum
    assert(hitSum == rows.head.getAs[Long]("total_hits"),
      s"per-row hits $hitSum != summary ${rows.head.getAs[Long]("total_hits")}")
    assert(rows.head.getAs[Int]("lift_ok") == 1, "ADC lift gate red")
    val recall = rows.head.getAs[Double]("mean_recall_at_10")
    assert(math.abs(recall - hitSum / 80.0) < 2e-4)
  }

  test("q154: IVFPQ serving — rank laws and the shortlist's exact re-rank order") {
    val rows = SparkEntry.queries("q154_ann_ivfpq")(spark, sfDir).collect()
    assert(rows.length == 24) // 8 probes × top-3
    rows.groupBy(_.getAs[Long]("probe_id")).foreach { case (p, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq == (1L to 3L), s"probe $p ranks")
      val sims = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("sim"))
      assert(sims.zip(sims.drop(1)).forall { case (a, b) => a >= b - 1e-9 },
        s"probe $p rerank not sim-ordered")
      assert(rs.forall(_.getAs[Double]("adc") >= 0))
      assert(rs.map(_.getAs[Long]("vec_id")).distinct.length == 3, s"probe $p dup result")
      assert(!rs.exists(_.getAs[Long]("vec_id") == p), s"probe $p returned itself")
    }
  }

  test("q155: bucketing strictly beats shuffled batching; waste accounting reconciles") {
    val rows = SparkEntry.queries("q155_length_bucketing")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val bucketed = rows.head.getAs[Long]("bucketed_waste")
    val baseline = rows.head.getAs[Long]("baseline_waste")
    assert(bucketed < baseline,
      s"bucketed waste $bucketed not below shuffled baseline $baseline")
    assert(rows.map(_.getAs[Long]("padding_waste")).sum == bucketed,
      "per-bucket waste does not sum to the total")
    val nDocs = rows.map(_.getAs[Long]("n_docs")).sum
    assert(nDocs == Tables.documents(spark, sfDir).count())
    rows.foreach { r =>
      // every batch pads to its own max: waste < batch-max * rows, and
      // within a power-of-two bucket the per-row pad is < bucket/2
      val perRowBound = r.getAs[Long]("bucket") / 2.0 + 1
      assert(r.getAs[Long]("padding_waste") < perRowBound * r.getAs[Long]("n_docs"),
        s"bucket ${r.getAs[Long]("bucket")} waste above the half-width bound")
      assert(r.getAs[Double]("savings") == rows.head.getAs[Double]("savings"))
    }
  }

  test("q136: top-1 neighbor matches a brute-force within-cluster argmax") {
    // Independent re-derivation: for each vector, the rank-1 neighbor
    // must be the true within-cluster max-cosine mate (ties by id).
    val assignments = SparkEntry.queries("q85_kmeans_assign")(spark, sfDir)
      .select(col("vec_id"), col("cluster_id"))
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Float](1).map(_.toDouble))
      .toMap
    val clusters = assignments.collect()
      .groupBy(_.getAs[Long]("cluster_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).sorted).toMap
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val top1 = SparkEntry.queries("q136_knn_graph")(spark, sfDir)
      .filter(col("rank") === 1).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("neighbor")).toMap
    clusters.values.filter(_.length >= 2).foreach { members =>
      members.foreach { v =>
        val best = members.filter(_ != v)
          .map(u => (-cos(vecs(v), vecs(u)), u)).min._2
        assert(top1(v) == best, s"vec $v: top1 ${top1(v)} != brute-force $best")
      }
    }
  }

  test("q190 excess loss: scores agree with q87/q135, median split law, both verdicts live") {
    val out = SparkEntry.queries("q190_excess_loss_selection")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5)))
    assert(out.nonEmpty)
    // score provenance: uni_nll is exactly q87's avg_nll, bi_nll is
    // exactly q135's — the selection composes the two shipped models,
    // it doesn't re-derive its own
    val uni = SparkEntry.queries("q87_unigram_lm_score")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val bi = SparkEntry.queries("q135_bigram_lm")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    def fr4(x: Double): Double = math.floor(x * 10000 + 0.5) / 10000
    out.foreach { case (id, _, u, b, ex, _) =>
      assert(u == uni(id), s"doc $id uni_nll $u != q87 ${uni(id)}")
      assert(b == bi(id), s"doc $id bi_nll $b != q135 ${bi(id)}")
      assert(ex == fr4(u - b), s"doc $id excess law")
    }
    // docs under 2 tokens have no bigram score and are out of scope
    assert(out.length == bi.size, "scope = q135's scope")
    // per-language median split: keep ⇔ excess >= the lang's
    // discrete median recomputed here; at least half kept per lang
    out.groupBy(_._2).foreach { case (lang, rows) =>
      val ex = rows.map(_._5).sorted
      val p50 = ex((ex.length - 1) / 2) // quantile_disc lower median
      rows.foreach { case (id, _, _, _, e, keep) =>
        assert(keep == (e >= p50), s"doc $id ($lang): keep law vs median $p50")
      }
      val kept = rows.count(_._6)
      assert(kept * 2 >= rows.length, s"$lang kept $kept of ${rows.length}")
    }
    assert(out.exists(_._6) && out.exists(!_._6), "both verdicts must occur")
  }

  test("q198 TracIn: score provenance, ordering, and the mislabel-queue claim") {
    val out = SparkEntry.queries("q198_tracin_selfinfluence")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == 32, s"review queue is a top-32 cut, got ${out.length}")
    assert(out.forall(_._4 >= 0), "self-influence is a sum of squares")
    // total order: selfinf desc with doc_id tiebreak
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 > b._4 || (a._4 == b._4 && a._1 < b._1),
        s"queue out of order: $a before $b")
    }
    // score provenance: the final-checkpoint score is exactly q133's
    // (same weights, same 4dp rounding) for every queued doc
    val q133 = SparkEntry.queries("q133_quality_classifier")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.foreach { case (id, _, score, _) =>
      assert(score == q133(id), s"doc $id score $score != q133 ${q133(id)}")
    }
    // the operational claim (Pruthi et al. §3.2): the queue surfaces
    // the examples the model keeps misfitting — their mean final
    // |score − label| must sit well above the corpus mean
    val all = SparkEntry.queries("q133_quality_classifier")(spark, sfDir)
      .collect().map(r => math.abs(r.getDouble(2) - r.getLong(1)))
    val corpusMean = all.sum / all.length
    val queueMean = out.map(r => math.abs(r._3 - r._2)).sum / out.length
    assert(queueMean > corpusMean,
      s"queue |p-y| $queueMean not above corpus $corpusMean — queue is noise")
    // non-degenerate: influence actually separates the queue from the
    // corpus floor
    assert(out.head._4 > out.last._4, "flat self-influence across the queue")
  }
}
