package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Num, TextFns}

/** Learned curation operators: the training-data-pipeline steps that
  * FIT something on the corpus (a quality classifier, a domain
  * mixture, a smoothed LM) instead of applying a fixed heuristic.
  * The reference has no learned surface at all (its scoring is
  * row-at-a-time arithmetic, transformer_loader/main.py:75-110);
  * these extend the curation family (SURVEY.md §7.2 step 5) the way
  * production LLM pipelines do: train on an aggregate pass, apply as
  * a narrow map.
  *
  * All three queries keep the house determinism contract (SURVEY.md
  * §5.3): md5/IEEE-only math, every cross-engine-compared double
  * routed through [[Num.fround]], fixed left-to-right association on
  * every inner product, and total output orders.
  */
object Learning {

  /** The classifier's target: the q30 rule-based quality gate
    * (quality >= 0.5) — the DISTILLATION framing of production
    * quality classifiers (FineWeb-Edu/DCLM train fastText on
    * rule/LLM judgments; here the judgment is the shared q30
    * heuristic). The target is a NON-linear function of the surface
    * statistics, so the logistic fit genuinely learns (holdout AUC
    * ~0.99) — unlike metadata labels, which this synthetic corpus
    * generates independently of the text (source/lang labels give
    * AUC ~= chance by construction, measured). */
  private val QualityThreshold = 0.5

  /** Gradient-descent hyperparameters: full-batch steps with a fixed
    * learning rate. 3 steps is enough to move every weight off zero
    * and exercise the iterate-collect-rebroadcast loop; production
    * runs more steps of the SAME shape (driver state stays D+1
    * doubles per step regardless of corpus size). */
  private val Steps = 3
  private val Eta = 2.0
  private val D = 5

  /** q198 review-queue size: the top self-influence cut. */
  private val TracInTopK = 32

  /** Classifier feature frame (doc_id, y, x0..x4), STAGED through
    * parquet once per (JVM, input dir) — the shared input of q133
    * (full-data fit), q152 (holdout eval) and q153 (fairness audit),
    * and re-read by every GD gradient aggregate (3 actions per
    * training run). A stage, not a persist: the feature table is the
    * artifact a training pipeline materializes before fitting, and it
    * stays off the executor heap (the round-10 persist sweep). */
  private def classifierFeatures(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
    graft.operators.Staged.parquet(s, s"clf_features|$dir") {
      val toks = split(col("text"), " ")
      val nTok = size(toks).cast("double")
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(least(lit(1.0), nTok / 100.0)
              * (lit(1.0) - size(filter(toks, t => t.isin(TextFns.STOPWORDS.map(x => x: Any): _*)))
                .cast("double") / nTok) >= QualityThreshold, 1.0)
            .otherwise(0.0).as("y"),
          lit(1.0).as("x0"),
          (size(toks) / lit(128.0)).as("x1"),
          (size(array_distinct(toks)).cast("double") / nTok).as("x2"),
          (size(filter(toks, t => t.isin(TextFns.STOPWORDS.map(x => x: Any): _*)))
            .cast("double") / nTok).as("x3"),
          (col("n_chars") / lit(1024.0)).as("x4"))
    }

  private def margin(w: IndexedSeq[Double]): Column =
    Num.fround((0 until D).map(j => lit(w(j)) * col(s"x$j")).reduce(_ + _), 6)

  private def sigmoid(z: Column): Column = lit(1.0) / (lit(1.0) + exp(-z))

  /** Full-batch GD over the given (possibly filtered) feature frame:
    * [[Steps]] distributed-aggregate steps, weights frounded to 6dp
    * after each — D doubles of driver state per step. Returns the
    * whole checkpoint trajectory (w after step 1 .. [[Steps]]): q133/
    * q152 consume only the final element, q198's TracIn accumulation
    * sums over every checkpoint (the published estimator is defined
    * over the checkpoints saved DURING training, not the final model
    * alone). */
  private def trainTrajectory(feat: org.apache.spark.sql.DataFrame): Seq[IndexedSeq[Double]] = {
    var w: IndexedSeq[Double] = Vector.fill(D)(0.0)
    (1 to Steps).map { _ =>
      val p = sigmoid(margin(w))
      val g = feat.select((0 until D).map(j =>
        avg((p - col("y")) * col(s"x$j")).as(s"g$j")): _*).first()
      w = Vector.tabulate(D)(j =>
        math.floor((w(j) - Eta * g.getDouble(j)) * 1e6 + 0.5) / 1e6)
      w
    }
  }

  private def trainWeights(feat: org.apache.spark.sql.DataFrame): IndexedSeq[Double] =
    trainTrajectory(feat).last

  private def classifierZSql(wTbl: String): String =
    Num.froundSql((0 until D).map(j => s"$wTbl.w$j * x$j").mkString(" + "), 6)

  private def classifierPSql(wTbl: String): String =
    s"(1.0::DOUBLE) / ((1.0::DOUBLE) + exp(-(${classifierZSql(wTbl)})))"

  /** DuckDB CTE list (no leading WITH): `f` features plus the
    * unrolled GD chain `w0..w{Steps}`, with gradients aggregated over
    * `trainFilter`'s subset when given (the holdout-split form). */
  private def classifierSqlCtes(trainFilter: Option[String]): String = {
    val featSql =
      s"""f AS (SELECT doc_id,
             CASE WHEN least(1.0, len(string_split(text, ' ')) / (100.0::DOUBLE))
                    * ((1.0::DOUBLE) - len(list_filter(string_split(text, ' '), t -> t IN ${TextFns.stopListSql}))
                      / len(string_split(text, ' '))::DOUBLE) >= $QualityThreshold
                  THEN 1.0 ELSE 0.0 END AS y,
             (1.0::DOUBLE) AS x0,
             len(string_split(text, ' ')) / (128.0::DOUBLE) AS x1,
             len(list_distinct(string_split(text, ' '))) / len(string_split(text, ' '))::DOUBLE AS x2,
             len(list_filter(string_split(text, ' '), t -> t IN ${TextFns.stopListSql})) / len(string_split(text, ' '))::DOUBLE AS x3,
             n_chars / (1024.0::DOUBLE) AS x4
           FROM documents)"""
    val where = trainFilter.map(f => s"WHERE $f").getOrElse("")
    val w0 = s"w0 AS (SELECT ${(0 until D).map(j => s"(0.0::DOUBLE) AS w$j").mkString(", ")})"
    val steps = (1 to Steps).map { t =>
      val prev = s"w${t - 1}"
      val g = s"""g$t AS (SELECT ${(0 until D).map(j =>
        s"avg((${classifierPSql("w")} - y) * x$j) AS g$j").mkString(", ")}
             FROM f, $prev w $where)"""
      val upd = s"""w$t AS (SELECT ${(0 until D).map(j =>
        Num.froundSql(s"w.w$j - $Eta * g.g$j", 6) + s" AS w$j").mkString(", ")}
             FROM $prev w, g$t g)"""
      s"$g,\n               $upd"
    }.mkString(",\n               ")
    s"""$featSql,
               $w0,
               $steps"""
  }

  /** Per-doc interpolated bigram NLL (doc_id, n_bigrams, avg_nll),
    * STAGED through parquet once per input dir per JVM — the scored
    * corpus is the artifact a curation pipeline persists (CCNet
    * materializes its perplexity column before bucketing), shared by
    * q135 (the listing) and q139 (the bucket cut). See q135's
    * scaladoc for the per-stage scale shape. */
  private def bigramNllStaged(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame =
  {
    // build caches released once the stage is written (the knnRanked
    // scratch pattern); on a warm memoized read the build never runs
    val scratch = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.DataFrame]
    val out = graft.operators.Staged.parquet(s, s"bigram_nll|$dir") {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("t"))
        .filter(size(col("t")) >= 2)
      val bg = docs.select(col("doc_id"),
          explode(expr(
            "transform(sequence(1, size(t) - 1), i -> named_struct('w1', element_at(t, i), 'w2', element_at(t, i + 1)))"))
            .as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .persist()
      scratch += bg
      val toks = Tables.documents(s, dir).select(explode(split(col("text"), " ")).as("w"))
      val uni = toks.groupBy(col("w")).agg(count(lit(1)).as("c")).persist()
      scratch += uni
      val tot = uni.agg(sum(col("c")).cast("double").as("n"))
      val big = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c12"))
      val enriched = big
        .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
        .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
        .crossJoin(broadcast(tot))
        .select(col("w1"), col("w2"),
          (lit(0.75) * (col("c12").cast("double") / col("c1"))
            + lit(0.25) * (col("c2").cast("double") / col("n"))).as("p"))
      bg.join(enriched, Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          Num.fround(avg(-log(col("p"))), 4).as("avg_nll"))
    }
    scratch.foreach(_.unpersist(false))
    out
  }

  /** The DoReMi mixture frame (source, n_docs, n_tokens, avg_nll,
    * alpha) — shared by q134 (the listing with budgets) and q141 (the
    * budget APPLIED as a document selection). avg_nll and alpha are
    * 6dp-frounded, so downstream arithmetic starts from the same grid
    * values on both engines. STAGED through parquet once per input
    * dir per JVM — the mixture table is the artifact a pipeline
    * persists between "weights chosen" and every consumer (q134's
    * listing, q141's selection); the corpus-scan training pass runs
    * once, consumers pay a |domains|-row read. */
  private def domainMixture(s: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    // build cache released once the stage is written (scratch
    // pattern); the trailing persist the build used to carry was
    // redundant with the stage itself
    val scratch = scala.collection.mutable.Buffer.empty[org.apache.spark.sql.DataFrame]
    val out = graft.operators.Staged.parquet(s, s"domain_mixture|$dir")(
      domainMixtureBuild(s, dir, scratch))
    scratch.foreach(_.unpersist(false))
    out
  }

  private def domainMixtureBuild(s: org.apache.spark.sql.SparkSession, dir: String,
      scratch: scala.collection.mutable.Buffer[org.apache.spark.sql.DataFrame])
      : org.apache.spark.sql.DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
    val tot = vocab.agg(sum(col("c")).cast("double").as("n"))
    val nd = Tables.documents(s, dir).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
    val perDom = toks.join(vocab, Seq("w"))
      .crossJoin(broadcast(tot))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        Num.fround(avg(-log(col("c").cast("double") / col("n"))), 6).as("avg_nll"))
      .persist()
    scratch += perDom
    val g = perDom.agg(
      (sum(col("n_tokens") * col("avg_nll")) / sum(col("n_tokens"))).as("gbar"))
    val ex = perDom.crossJoin(broadcast(g))
      .withColumn("ex", col("avg_nll") - col("gbar"))
    val z = ex.agg(sum(exp(col("ex"))).as("zden"))
    ex.crossJoin(broadcast(z))
      .join(broadcast(nd), Seq("source"))
      .select(col("source"), col("n_docs"), col("n_tokens"), col("avg_nll"),
        Num.fround(exp(col("ex")) / col("zden"), 6).as("alpha"))
  }

  /** DuckDB CTE list mirroring [[domainMixture]] (no leading WITH):
    * defines `mix(source, n_docs, n_tokens, avg_nll, alpha)`. */
  private def mixtureSqlCtes: String =
    s"""tok AS (
         SELECT source, unnest(string_split(text, ' ')) AS w FROM documents),
       vocab AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
       tot AS (SELECT sum(c)::DOUBLE AS n FROM vocab),
       nd AS (SELECT source, count(*)::BIGINT AS n_docs FROM documents GROUP BY source),
       pd AS (SELECT source, count(*)::BIGINT AS n_tokens,
                ${Num.froundSql("avg(-ln(c::DOUBLE / n))", 6)} AS avg_nll
              FROM tok JOIN vocab USING (w), tot GROUP BY source),
       g AS (SELECT sum(n_tokens * avg_nll) / sum(n_tokens) AS gbar FROM pd),
       ex AS (SELECT pd.*, avg_nll - gbar AS ex FROM pd, g),
       z AS (SELECT sum(exp(ex)) AS zden FROM ex),
       mix AS MATERIALIZED (
         SELECT ex.source, nd.n_docs, ex.n_tokens, ex.avg_nll,
           ${Num.froundSql("exp(ex) / zden", 6)} AS alpha
         FROM ex CROSS JOIN z JOIN nd ON nd.source = ex.source)"""

  /** DuckDB CTE list mirroring [[bigramNllStaged]] (no leading WITH):
    * defines `scored(doc_id, n_bigrams, avg_nll)`. */
  private def bigramNllSqlCtes: String =
    s"""t AS (
         SELECT doc_id, string_split(text, ' ') AS t FROM documents
         WHERE len(string_split(text, ' ')) >= 2),
       bg AS (SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
              FROM t, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s),
       tok AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       uni AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
       tot AS (SELECT sum(c)::DOUBLE AS n FROM uni),
       big AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY w1, w2),
       enr AS (SELECT big.w1, big.w2,
                 (0.75::DOUBLE) * (big.c12::DOUBLE / u1.c)
                   + (0.25::DOUBLE) * (u2.c::DOUBLE / tot.n) AS p
               FROM big JOIN uni u1 ON u1.w = big.w1
                        JOIN uni u2 ON u2.w = big.w2, tot),
       scored AS (SELECT bg.doc_id, count(*)::BIGINT AS n_bigrams,
                    ${Num.froundSql("avg(-ln(p))", 4)} AS avg_nll
                  FROM bg JOIN enr ON bg.w1 = enr.w1 AND bg.w2 = enr.w2
                  GROUP BY bg.doc_id)"""

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // Distributed logistic regression (fastText-style quality
    // classifier): learn P(doc is from a curated source) from cheap
    // text statistics, by full-batch gradient descent where each step
    // is ONE distributed aggregate.
    //
    // Scale shape: the feature projection is a narrow map (no
    // shuffle); each GD step reduces the corpus to D gradient sums
    // (map-side partial aggregation — one D-double row per partition
    // reaches the driver); the model state that rides in the plan is
    // D literal doubles. Corpus size only changes the scan cost per
    // step — the exact shape a 100 TB classifier-training pass needs
    // (DoReMi/fastText quality filters train this way: few features,
    // full-data gradient passes).
    //
    // Determinism: features are exact IEEE per row (dyadic /128, /1024
    // scalings; ratio features are single correctly-rounded
    // divisions); the margin is frounded to 6dp before the sigmoid so
    // both engines exponentiate bit-identical inputs; weights are
    // frounded to 6dp after every step (the q85 centroid-rounding
    // contract). The only engine-order-dependent op is the gradient
    // SUM (~1e-13 relative noise vs the 1e-6 rounding grid).
    QueryDef(
      "q133_quality_classifier",
      (s, dir) => {
        val feat = classifierFeatures(s, dir)
        val w = trainWeights(feat)
        val p = sigmoid(margin(w))
        feat.select(col("doc_id"), col("y").cast("long").as("label"),
            Num.fround(p, 4).as("score"), (p >= 0.5).as("pred"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${classifierSqlCtes(trainFilter = None)}
               SELECT doc_id, y::BIGINT AS label,
                 ${Num.froundSql(classifierPSql("w"), 4)} AS score,
                 (${classifierPSql("w")} >= 0.5) AS pred
               FROM f, w$Steps w ORDER BY doc_id"""),
    ),

    // ------------------------------------------------------------------
    // DoReMi-style domain mixture reweighting (Xie et al., "DoReMi:
    // Optimizing Data Mixtures Speeds Up Language Model Pretraining",
    // 2023): per-domain excess loss under a reference LM → exponential
    // (softmax) reweighting → per-domain token budgets. Domains whose
    // text the unigram LM finds HARDER (higher avg NLL than the
    // corpus-wide token mean) get upweighted — the multiplicative-
    // weights step of the published recipe with the proxy-model loss
    // stood in by the q87 unigram LM.
    //
    // Scale shape: the corpus collapses to one bounded row per domain
    // (count + avg NLL, map-side combined); everything after runs on
    // the |domains|-row frame (broadcast scalars for the global mean
    // and the softmax normalizer). Domain count is bounded by design
    // (sources/languages), so no stage scales worse than the q87 scan.
    // ------------------------------------------------------------------
    // Classifier EVALUATION on a held-out split — the ML-correct
    // complement of q133's resubstitution listing: train on the even
    // doc_ids, evaluate on the odd (a deterministic 50/50 split),
    // emitting the calibration reliability diagram (score deciles vs
    // empirical positive rate) with the exact confusion counts,
    // precision/recall/F1 and the Mann-Whitney AUC with tie
    // correction — every metric derived from EXACT integer counts
    // over 4dp-rounded scores (ties grouped, so AUC is a ratio of
    // integers; the only doubles are final display roundings).
    //
    // Scale shape: training is q133's bounded-gradient loop over the
    // train half; scoring is a narrow map; the AUC rank accumulation
    // is a window OVER THE per-score AGGREGATE (≤ 10⁴+1 rows by
    // construction of the 4dp grid — never corpus rows); confusion/
    // calibration are plain aggregates with broadcast scalars back.
    QueryDef(
      "q152_classifier_eval",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val feat = classifierFeatures(s, dir)
        val w = trainWeights(feat.filter(col("doc_id") % 2 === 0))
        val p = sigmoid(margin(w))
        // narrow map over the staged feature table (literal weights)
        // — each consumer branch recomputes it off the stage read
        val test = feat.filter(col("doc_id") % 2 === 1)
          .select(col("doc_id"), col("y"), Num.fround(p, 4).as("score"))
        val conf = test.agg(
          sum(when(col("score") >= 0.5 && col("y") === 1.0, 1L).otherwise(0L)).as("tp"),
          sum(when(col("score") >= 0.5 && col("y") === 0.0, 1L).otherwise(0L)).as("fp"),
          sum(when(col("score") < 0.5 && col("y") === 1.0, 1L).otherwise(0L)).as("fn"),
          sum(when(col("score") < 0.5 && col("y") === 0.0, 1L).otherwise(0L)).as("tn"))
        val byScore = test.groupBy(col("score")).agg(
          sum(when(col("y") === 1.0, 1L).otherwise(0L)).as("p_s"),
          sum(when(col("y") === 0.0, 1L).otherwise(0L)).as("n_s"))
        val wCum = Window.orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val aucNum = byScore
          .withColumn("n_below", coalesce(sum(col("n_s")).over(wCum), lit(0L)))
          .agg(sum(col("p_s") * (lit(2L) * col("n_below") + col("n_s"))).as("num2"))
        val cal = test
          .groupBy(least(lit(9L), floor(col("score") * 10).cast("long")).as("decile"))
          .agg(count(lit(1)).as("n"),
            Num.fround(avg(col("score")), 6).as("mean_score"),
            Num.fround(avg(col("y")), 6).as("pos_rate"))
        cal.crossJoin(broadcast(conf)).crossJoin(broadcast(aucNum))
          .select(col("decile"), col("n"), col("mean_score"), col("pos_rate"),
            col("tp"), col("fp"), col("fn"), col("tn"),
            Num.fround(when(col("tp") + col("fp") === 0, lit(0.0))
              .otherwise(col("tp").cast("double") / (col("tp") + col("fp"))), 6).as("precision"),
            Num.fround(when(col("tp") + col("fn") === 0, lit(0.0))
              .otherwise(col("tp").cast("double") / (col("tp") + col("fn"))), 6).as("recall"),
            Num.fround(when(lit(2L) * col("tp") + col("fp") + col("fn") === 0, lit(0.0))
              .otherwise(lit(2.0) * col("tp") / (lit(2L) * col("tp") + col("fp") + col("fn"))), 6).as("f1"),
            Num.fround(col("num2").cast("double")
              / (lit(2.0) * (col("tp") + col("fn")).cast("double")
                * (col("fp") + col("tn")).cast("double")), 6).as("auc"))
          .orderBy(col("decile"))
      },
      Some(s"""WITH ${classifierSqlCtes(trainFilter = Some("doc_id % 2 = 0"))},
               t AS MATERIALIZED (
                 SELECT doc_id, y, ${Num.froundSql(classifierPSql("w"), 4)} AS score
                 FROM f, w$Steps w WHERE doc_id % 2 = 1),
               conf AS (SELECT
                   sum(CASE WHEN score >= 0.5 AND y = 1.0 THEN 1 ELSE 0 END)::BIGINT AS tp,
                   sum(CASE WHEN score >= 0.5 AND y = 0.0 THEN 1 ELSE 0 END)::BIGINT AS fp,
                   sum(CASE WHEN score < 0.5 AND y = 1.0 THEN 1 ELSE 0 END)::BIGINT AS fn,
                   sum(CASE WHEN score < 0.5 AND y = 0.0 THEN 1 ELSE 0 END)::BIGINT AS tn
                 FROM t),
               bs AS (SELECT score,
                        sum(CASE WHEN y = 1.0 THEN 1 ELSE 0 END)::BIGINT AS p_s,
                        sum(CASE WHEN y = 0.0 THEN 1 ELSE 0 END)::BIGINT AS n_s
                      FROM t GROUP BY score),
               cum AS (SELECT *, coalesce(sum(n_s) OVER (ORDER BY score
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS n_below
                       FROM bs),
               an AS (SELECT sum(p_s * (2 * n_below + n_s))::BIGINT AS num2 FROM cum),
               cal AS (SELECT least(9, floor(score * 10)::BIGINT) AS decile,
                         count(*)::BIGINT AS n,
                         ${Num.froundSql("avg(score)", 6)} AS mean_score,
                         ${Num.froundSql("avg(y)", 6)} AS pos_rate
                       FROM t GROUP BY 1)
               SELECT decile, n, mean_score, pos_rate, tp, fp, fn, tn,
                 ${Num.froundSql("CASE WHEN tp + fp = 0 THEN (0.0::DOUBLE) ELSE tp::DOUBLE / (tp + fp) END", 6)} AS precision,
                 ${Num.froundSql("CASE WHEN tp + fn = 0 THEN (0.0::DOUBLE) ELSE tp::DOUBLE / (tp + fn) END", 6)} AS recall,
                 ${Num.froundSql("CASE WHEN 2 * tp + fp + fn = 0 THEN (0.0::DOUBLE) ELSE (2.0::DOUBLE) * tp / (2 * tp + fp + fn) END", 6)} AS f1,
                 ${Num.froundSql("num2::DOUBLE / ((2.0::DOUBLE) * (tp + fn) * (fp + tn))", 6)} AS auc
               FROM cal CROSS JOIN conf CROSS JOIN an ORDER BY decile"""),
    ),

    // ------------------------------------------------------------------
    // Group FAIRNESS audit over the classifier — demographic-parity
    // gaps by language: a quality filter that passes one language at
    // half another's rate silently skews the training mixture (the
    // documented failure mode of English-tuned quality classifiers on
    // multilingual corpora); release gates read exactly this table.
    // Per language: positive-prediction rate vs the corpus-wide rate,
    // the parity gap, and a |gap| > 0.1 flag. Counts exact; the gap
    // compare runs on identical unrounded doubles in both engines.
    QueryDef(
      "q153_fairness_audit",
      (s, dir) => {
        val feat = classifierFeatures(s, dir)
        val w = trainWeights(feat)
        val p = sigmoid(margin(w))
        val scored = feat
          .select(col("doc_id"), (Num.fround(p, 4) >= 0.5).as("pred"))
          .join(Tables.documents(s, dir).select(col("doc_id"), col("source")), Seq("doc_id"))
        val overall = scored.agg(
          (sum(when(col("pred"), 1L).otherwise(0L)).cast("double") / count(lit(1)))
            .as("ov"))
        val rate = col("n_pos").cast("double") / col("n")
        scored.groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("pred"), 1L).otherwise(0L)).as("n_pos"))
          .crossJoin(broadcast(overall))
          .select(col("source"), col("n"), col("n_pos"),
            Num.fround(rate, 6).as("pos_rate"),
            Num.fround(col("ov"), 6).as("overall_rate"),
            Num.fround(rate - col("ov"), 6).as("parity_gap"),
            (abs(rate - col("ov")) > 0.1).as("flagged"))
          .orderBy(col("source"))
      },
      Some(s"""WITH ${classifierSqlCtes(trainFilter = None)},
               t AS MATERIALIZED (
                 SELECT f.doc_id,
                   (${Num.froundSql(classifierPSql("w"), 4)} >= 0.5) AS pred, d.source
                 FROM f, w$Steps w JOIN documents d ON d.doc_id = f.doc_id),
               ov AS (SELECT sum(CASE WHEN pred THEN 1 ELSE 0 END)::DOUBLE / count(*) AS ov
                      FROM t),
               g AS (SELECT source, count(*)::BIGINT AS n,
                       sum(CASE WHEN pred THEN 1 ELSE 0 END)::BIGINT AS n_pos
                     FROM t GROUP BY source)
               SELECT source, n, n_pos,
                 ${Num.froundSql("n_pos::DOUBLE / n", 6)} AS pos_rate,
                 ${Num.froundSql("ov", 6)} AS overall_rate,
                 ${Num.froundSql("n_pos::DOUBLE / n - ov", 6)} AS parity_gap,
                 (abs(n_pos::DOUBLE / n - ov) > 0.1) AS flagged
               FROM g CROSS JOIN ov ORDER BY source"""),
    ),

    QueryDef(
      "q134_domain_mixture",
      (s, dir) =>
        domainMixture(s, dir)
          .select(col("source"), col("n_docs"), col("n_tokens"), col("avg_nll"),
            col("alpha"),
            floor(col("alpha") * 1e6 + 0.5).cast("long").as("token_budget"))
          .orderBy(col("source")),
      Some(s"""WITH $mixtureSqlCtes
               SELECT source, n_docs, n_tokens, avg_nll, alpha,
                 floor(alpha * 1000000 + 0.5)::BIGINT AS token_budget
               FROM mix ORDER BY source"""),
    ),

    // ------------------------------------------------------------------
    // Interpolated bigram LM scoring — the next model up from q87's
    // unigram: per-doc average NLL under
    //   p(w2 | w1) = 0.75 · c(w1,w2)/c(w1) + 0.25 · c(w2)/N
    // (Jelinek-Mercer interpolation with the unigram back-off). The
    // fluency/perplexity filter of classic curation stacks (CCNet
    // buckets by LM perplexity; this is that score with a
    // corpus-trained bigram model).
    //
    // Scale shape: bigram extraction is a NARROW map (1-indexed
    // element_at over the token array — no self-join, no window);
    // c(w1) and c(w2) attach to the bigram VOCAB (distinct bigrams —
    // derived-size vocab ⋈ vocab joins), so the corpus-scale stream
    // takes exactly ONE join, keyed by (w1,w2) — a far flatter key
    // distribution than the raw unigram Zipf (q87's head/tail split
    // is the recipe if a bigram head ever needs it).
    QueryDef(
      "q135_bigram_lm",
      (s, dir) => bigramNllStaged(s, dir).orderBy(col("doc_id")),
      Some(s"""WITH $bigramNllSqlCtes
               SELECT doc_id, n_bigrams, avg_nll FROM scored ORDER BY doc_id"""),
    ),

    // ------------------------------------------------------------------
    // CCNet perplexity-bucket curation (Wenzek et al., "CCNet:
    // Extracting High Quality Monolingual Datasets from Web Crawl
    // Data", 2020): cut each LANGUAGE's documents into head/middle/
    // tail thirds by LM score (lower NLL = more fluent), keep
    // head+middle — the published recipe, with q135's bigram LM as
    // the scorer. Per-language thresholds make the cut
    // language-fair: an absolute global threshold would empty the
    // hardest language (exactly why CCNet buckets per language).
    //
    // Scale shape: the scored corpus is the STAGED q135 artifact (one
    // read); thresholds come from a per-language COUNT-OF-COUNTS
    // cumulative walk (the q144/q165 trick — avg_nll is 4dp-rounded,
    // so the distinct-value table is bounded by |langs| × the value
    // grid at ANY corpus size, and the cumulative window partitions
    // per language over that aggregate; the generic ExactMedian pass
    // paid ~2 s of fixed multi-stage overhead here for the same exact
    // ranks, round-10 measured) joining back as a |languages|-row
    // broadcast. The verdict pass is a narrow map. Rank convention
    // unchanged: smallest value whose cumulative count reaches
    // ceil(n·p) — quantile_disc, float-exact cross-engine.
    QueryDef(
      "q139_perplexity_buckets",
      (s, dir) => {
        val scored = bigramNllStaged(s, dir)
          .join(Tables.documents(s, dir).select(col("doc_id"), col("lang")), Seq("doc_id"))
        val thr = graft.operators.ExactMedian.quantilesDiscSmallDomain(
          scored.select(col("lang"), col("avg_nll")), "lang", "avg_nll",
          Seq("p33" -> 1.0 / 3, "p67" -> 2.0 / 3))
        val bucket = when(col("avg_nll") <= col("p33"), "head")
          .when(col("avg_nll") <= col("p67"), "middle")
          .otherwise("tail")
        scored.join(broadcast(thr), Seq("lang"))
          .select(col("doc_id"), col("lang"), col("avg_nll"),
            bucket.as("bucket"), (bucket =!= "tail").as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH $bigramNllSqlCtes,
               sl AS (SELECT scored.doc_id, d.lang, scored.avg_nll
                      FROM scored JOIN documents d ON d.doc_id = scored.doc_id),
               thr AS (SELECT lang,
                         quantile_disc(avg_nll, (1.0::DOUBLE) / 3) AS p33,
                         quantile_disc(avg_nll, (2.0::DOUBLE) / 3) AS p67
                       FROM sl GROUP BY lang),
               b AS (SELECT sl.doc_id, sl.lang, sl.avg_nll,
                       CASE WHEN sl.avg_nll <= thr.p33 THEN 'head'
                            WHEN sl.avg_nll <= thr.p67 THEN 'middle'
                            ELSE 'tail' END AS bucket
                     FROM sl JOIN thr USING (lang))
               SELECT doc_id, lang, avg_nll, bucket,
                 (bucket <> 'tail') AS keep
               FROM b ORDER BY doc_id"""),
    ),

    // ------------------------------------------------------------------
    // Mixture budgets APPLIED: the q134 DoReMi weights turned into an
    // actual per-domain document selection — each domain gets a token
    // budget α_d · (half the corpus tokens), its documents are laid
    // out in the house RNG-free md5 permutation (the q65/q117
    // deterministic-shuffle key, so the prefix is an unbiased domain
    // sample), and the greedy prefix up to the budget is kept. The
    // train-mixture materialization step between "weights chosen" and
    // "shards written".
    //
    // Scale shape: budgets derive from the |domains|-row mixture frame
    // (broadcast); the per-domain running token total is
    // PrefixSum.keyedCumSum — local windows per (domain, md5-prefix
    // bucket) + a tiny offset table, never a whole-domain window
    // (the q66 contract); the verdict is a narrow map against the
    // broadcast budget row.
    QueryDef(
      "q141_mixture_apply",
      (s, dir) => {
        val mix = domainMixture(s, dir)
        val tot = mix.agg(sum(col("n_tokens")).cast("double").as("t"))
        val budgets = mix.crossJoin(broadcast(tot))
          .select(col("source"),
            floor(col("alpha") * col("t") * 0.5 + 0.5).cast("long").as("budget"))
        val d = Tables.docLens(s, dir)
          .select(col("source"), col("doc_id"),
            md5(concat(lit("mix|"), col("doc_id").cast("string"))).as("u"),
            col("n_tokens").cast("long").as("n_tokens"))
          .withColumn("ub", expr("cast(conv(substring(u, 1, 3), 16, 10) as int)"))
        val cum = graft.operators.PrefixSum.keyedCumSum(
          d, key = Seq("source"), bucket = "ub",
          ord = Seq(col("u"), col("doc_id")),
          value = col("n_tokens"), cumName = "cum_tokens")
        cum.join(broadcast(budgets), Seq("source"))
          .select(col("source"), col("doc_id"), col("n_tokens"),
            col("cum_tokens"), col("budget"),
            (col("cum_tokens") <= col("budget")).as("kept"))
          .orderBy(col("source"), col("doc_id"))
      },
      Some(s"""WITH $mixtureSqlCtes,
               tt AS (SELECT sum(n_tokens)::DOUBLE AS t FROM mix),
               bud AS (SELECT source,
                         floor(alpha * t * (0.5::DOUBLE) + 0.5)::BIGINT AS budget
                       FROM mix, tt),
               d AS (SELECT source, doc_id,
                       md5('mix|' || doc_id::VARCHAR) AS u,
                       len(string_split(text, ' '))::BIGINT AS n_tokens
                     FROM documents),
               c AS (SELECT source, doc_id, n_tokens,
                       sum(n_tokens) OVER (PARTITION BY source ORDER BY u, doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
                     FROM d)
               SELECT c.source, c.doc_id, c.n_tokens, c.cum_tokens, bud.budget,
                 (c.cum_tokens <= bud.budget) AS kept
               FROM c JOIN bud USING (source) ORDER BY c.source, c.doc_id"""),
    ),

    // Temperature-based mixture sampling — the mT5/XLM-R/LLaMA recipe
    // that sits NEXT TO the learned DoReMi weights (q134): sampling
    // probability p_i ∝ n_i^τ flattens the source distribution toward
    // uniform (τ<1 upsamples low-resource sources without learning a
    // proxy model). τ = 0.5 deliberately: sqrt is CORRECTLY ROUNDED
    // per IEEE-754 in both engines, where a general pow(x, 0.3) is
    // libm-dependent in the last ulp and would make the differential
    // flaky at fround boundaries. `boost` = p_i / natural-share is the
    // standard diagnostic (low-resource boost > 1). Scale: one
    // |sources|-row aggregate off the staged docLens table + a
    // broadcast scalar — the corpus is never rescanned or shuffled.
    // The |sources|-term double sum `z` follows the q134 zden
    // contract: ≤ ~20 terms, ordering noise « the fround grid.
    QueryDef(
      "q173_temperature_mixture",
      (s, dir) => {
        val src = Tables.docLens(s, dir)
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_tokens").cast("long")).as("n_tokens"))
        val w = src.withColumn("w", sqrt(col("n_tokens").cast("double")))
        val z = w.agg(sum(col("w")).as("z"),
          sum(col("n_tokens")).cast("double").as("tt"))
        w.crossJoin(broadcast(z))
          .select(col("source"), col("n_docs"), col("n_tokens"),
            Num.fround(col("w") / col("z"), 6).as("p_tau"),
            Num.fround(col("w") / col("z") * 10000, 2).as("exp_docs_10k"),
            Num.fround((col("w") / col("z"))
              / (col("n_tokens").cast("double") / col("tt")), 4).as("boost"))
          .orderBy(col("source"))
      },
      Some(s"""WITH src AS (
                 SELECT source, count(*)::BIGINT AS n_docs,
                        sum(len(string_split(text, ' ')))::BIGINT AS n_tokens
                 FROM documents GROUP BY source),
               w AS (SELECT *, sqrt(n_tokens::DOUBLE) AS w FROM src),
               z AS (SELECT sum(w) AS z, sum(n_tokens)::DOUBLE AS tt FROM w)
               SELECT source, n_docs, n_tokens,
                 ${Num.froundSql("w / z", 6)} AS p_tau,
                 ${Num.froundSql("w / z * 10000", 2)} AS exp_docs_10k,
                 ${Num.froundSql("(w / z) / (n_tokens::DOUBLE / tt)", 4)} AS boost
               FROM w CROSS JOIN z ORDER BY source"""),
    ),

    // Excess-loss data selection — the RHO-loss / learnability axis
    // (Mindermann et al. 2022 shape): score each document by how much
    // a STRONGER reference model improves on a weaker one, excess =
    // NLL_weak − NLL_strong. High excess = structured, learnable text
    // (the strong model exploits word-order the unigram can't see);
    // excess ≈ 0 = the strong model learns nothing extra — boilerplate
    // or noise. Complements the single-model axes: q87/q139 rank by
    // one model's loss (in-distribution-ness), q119 DSIR by domain
    // resemblance; THIS is the two-model difference both of those are
    // blind to. Weak model = q87's corpus-unigram MLE (shared scorer),
    // strong = q135's interpolated bigram LM (shared staged artifact).
    // Selection = per-language median split of excess (the q139
    // ExactMedian device — thresholds are actual data values, exact
    // on both engines). Docs under 2 tokens have no bigram score and
    // are out of scope on both sides (inner join, mirrored).
    //
    // Scale: both scores are per-doc tables; the doc_id equi-joins
    // are key-partitioned (primary-key join — the q127 stance:
    // storage bucketed by doc_id removes the exchange at 100 TB);
    // thresholds are a |langs|-row broadcast.
    QueryDef(
      "q190_excess_loss_selection",
      (s, dir) => {
        val uni = Curation.unigramScored(s, dir)
          .select(col("doc_id"), col("avg_nll").as("uni_nll"))
        val bi = bigramNllStaged(s, dir)
          .select(col("doc_id"), col("avg_nll").as("bi_nll"))
        val scored = uni.join(bi, Seq("doc_id"))
          .join(Tables.documents(s, dir).select(col("doc_id"), col("lang")),
            Seq("doc_id"))
          .withColumn("excess", Num.fround(col("uni_nll") - col("bi_nll"), 4))
        val thr = graft.operators.ExactMedian.quantilesDiscSmallDomain(
          scored.select(col("lang"), col("excess")), "lang", "excess",
          Seq("p50" -> 0.5))
        scored.join(broadcast(thr), Seq("lang"))
          .select(col("doc_id"), col("lang"), col("uni_nll"), col("bi_nll"),
            col("excess"), (col("excess") >= col("p50")).as("keep"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH ${Curation.uniScoreSqlCtes},
               $bigramNllSqlCtes,
               ex AS (
                 SELECT u.doc_id, d.lang, u.avg_nll AS uni_nll,
                   sc.avg_nll AS bi_nll,
                   ${Num.froundSql("u.avg_nll - sc.avg_nll", 4)} AS excess
                 FROM uniscored u JOIN scored sc ON sc.doc_id = u.doc_id
                   JOIN documents d ON d.doc_id = u.doc_id),
               thr AS (SELECT lang, quantile_disc(excess, (1.0::DOUBLE) / 2) AS p50
                       FROM ex GROUP BY lang)
               SELECT ex.doc_id, ex.lang, ex.uni_nll, ex.bi_nll, ex.excess,
                 (ex.excess >= thr.p50) AS keep
               FROM ex JOIN thr USING (lang)
               ORDER BY ex.doc_id"""),
    ),

    // TracIn self-influence (Pruthi et al. 2020, "Estimating Training
    // Data Influence by Tracing Gradient Descent"): the influence of
    // a training example on ITSELF, summed over the checkpoints saved
    // during training — the paper's §3.2 recipe for surfacing
    // mislabeled/outlier examples (they are the ones the model keeps
    // paying a large gradient for at every checkpoint). For logistic
    // loss the per-example gradient is (p − y)·x, so self-influence
    // collapses to a CLOSED FORM over the q133 trajectory:
    // Σ_t (p_t − y)² · ‖x‖² with p_t the sigmoid at checkpoint t —
    // no per-example gradient vectors ever materialize. Completes the
    // learned-curation arc: q133 fits, q152 evaluates, q153 audits
    // groups, q190 selects by excess loss, this audits INDIVIDUAL
    // examples for label noise. Emits the top-32 most self-influential
    // docs — the review queue a curation team would actually read.
    //
    // Scale shape: training is q133's bounded-gradient loop (D+1
    // doubles of driver state per step); scoring is a NARROW MAP over
    // the staged feature table with all Steps checkpoint weights as
    // plan literals; the top-32 cut is TakeOrderedAndProject (per-
    // partition heaps, no full sort, no shuffle of corpus rows).
    //
    // Determinism: margins are 6dp-frounded before each sigmoid (both
    // engines exponentiate identical doubles); the remaining cross-
    // libm exp noise is ~1e-16 relative, absorbed by the 6dp fround
    // on selfinf (boundary width 5e-7 — the q87 argument); the cut
    // ranks the ROUNDED selfinf with doc_id tiebreak on both engines.
    QueryDef(
      "q198_tracin_selfinfluence",
      (s, dir) => {
        val feat = classifierFeatures(s, dir)
        val traj = trainTrajectory(feat)
        val normsq = (0 until D).map(j => col(s"x$j") * col(s"x$j")).reduce(_ + _)
        val sqErrs = traj.map { w =>
          val p = sigmoid(margin(w))
          (p - col("y")) * (p - col("y"))
        }
        feat.select(col("doc_id"), col("y").cast("long").as("label"),
            Num.fround(sigmoid(margin(traj.last)), 4).as("score"),
            Num.fround(normsq * sqErrs.reduce(_ + _), 6).as("selfinf"))
          .orderBy(col("selfinf").desc, col("doc_id"))
          .limit(TracInTopK)
      },
      Some {
        val normsqSql = (0 until D).map(j => s"x$j * x$j").mkString(" + ")
        val sqErrSql = (1 to Steps).map { t =>
          val p = classifierPSql(s"wt$t")
          s"($p - y) * ($p - y)"
        }.mkString(" + ")
        val fromSql = (1 to Steps).map(t => s"w$t wt$t").mkString(", ")
        s"""WITH ${classifierSqlCtes(trainFilter = None)}
            SELECT doc_id, y::BIGINT AS label,
              ${Num.froundSql(classifierPSql(s"wt$Steps"), 4)} AS score,
              ${Num.froundSql(s"($normsqSql) * ($sqErrSql)", 6)} AS selfinf
            FROM f, $fromSql
            ORDER BY selfinf DESC, doc_id LIMIT $TracInTopK"""
      },
    ),
  )
}
