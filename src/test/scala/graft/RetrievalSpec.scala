package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.Retrieval

/** Differential check of the MaxScore-pruned BM25 top-k against the
  * brute-force full-scan definition, on corpora engineered for the
  * regimes the production corpus never exercises: fewer rare-term
  * postings than k (θ₀ uncertifiable → pruning must switch off),
  * zero-score filler documents entering the top-k, and a query whose
  * terms are all common (essential set = everything). The q126 DuckDB
  * oracle proves losslessness on the shipped corpus; this spec proves
  * the switch-off logic on the corpora where pruning would be unsound.
  *
  * The brute side recomputes BM25 from the definition via an
  * explode-based (doc, term) aggregate — a different plan shape from
  * the operator's narrow tf map — with the same scoring formula, and
  * results compare on (doc_id set, 4dp score within 1e-9): floats on
  * both sides are JVM doubles over identical inputs, so any
  * association-order noise is ulp-scale, far inside the tolerance.
  */
class RetrievalSpec extends SparkSuite {

  private val (k1, b) = (1.2, 0.75)

  /** Full-scan BM25 from the definition: explode → (doc, term) tf →
    * df per term → score every document, top-k. */
  private def brute(docs: DataFrame, terms: Seq[String], k: Int): Seq[(Long, Double)] = {
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ")).cast("double").as("dl"),
      explode(split(col("text"), " ")).as("term"))
    val tf = toks.filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).cast("double").as("tf"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2)).toMap
    val base = docs.select(col("doc_id"), size(split(col("text"), " ")).cast("double").as("dl"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val n = base.length.toDouble
    val avgdl = base.map(_._2).sum / n
    val df = terms.map(w => w -> base.count { case (id, _) => tf.contains((id, w)) }.toDouble).toMap
    base.map { case (id, dl) =>
      val score = terms.map { w =>
        val f = tf.getOrElse((id, w), 0.0)
        val idf = math.log((n - df(w) + 0.5) / (df(w) + 0.5) + 1.0)
        idf * f * (k1 + 1.0) / (f + (dl / avgdl * b + (1.0 - b)) * k1)
      }.sum
      (id, math.floor(score * 1e4 + 0.5) / 1e4)
    }.sortBy { case (id, sc) => (-sc, id) }.take(k).toSeq
  }

  private def check(docs: DataFrame, terms: Seq[String], k: Int): Unit = {
    val got = Retrieval.maxscoreTopK(docs, terms, k)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val want = brute(docs, terms, k)
    assert(got.map(_._1) == want.map(_._1),
      s"doc order: got=${got.mkString(",")} want=${want.mkString(",")}")
    got.zip(want).foreach { case ((_, g), (_, w)) =>
      assert(math.abs(g - w) < 1e-9, s"score drift: $g vs $w")
    }
  }

  private def corpus(rows: Seq[(Long, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  test("pruning regime: rare term dominant, >= k postings — result equals full scan") {
    val docs = corpus(
      (0L until 40L).map(i => i -> s"alpha beta common filler pad$i x y") ++
        (100L until 115L).map(i => i -> s"needle alpha row content pad$i extra words here") ++
        Seq(200L -> "needle needle needle dense hit", 201L -> "beta beta beta beta"))
    check(docs, Seq("needle", "alpha", "beta"), 10)
  }

  test("switch-off regime: fewer rare-term postings than k — full scan, zero-score filler kept") {
    val docs = corpus(
      Seq(0L -> "needle one two", 1L -> "needle three four") ++ // only 2 postings, k=10
        (10L until 30L).map(i => i -> s"unrelated tokens pad$i"))
    check(docs, Seq("needle", "one"), 10)
  }

  test("all-common query: essential set is everything, still exact") {
    val docs = corpus((0L until 60L).map(i =>
      i -> (if (i % 2 == 0) s"join batch join pad$i" else s"batch other pad$i words")))
    check(docs, Seq("join", "batch"), 10)
  }

  test("no query term present at all: top-k is the zero-score head by doc_id") {
    val docs = corpus((0L until 25L).map(i => i -> s"nothing matches here pad$i"))
    check(docs, Seq("absent", "missing"), 10)
  }

  test("randomized corpora across seeds match brute force") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val vocab = Seq("rare", "mid", "hot", "a", "b", "c", "d", "e", "f", "g")
      val docs = corpus((0L until 120L).map { i =>
        val len = 3 + rnd.nextInt(12)
        val words = Seq.fill(len) {
          val r = rnd.nextInt(100)
          if (r < 2) "rare" else if (r < 20) "mid" else vocab(3 + rnd.nextInt(7))
        }
        i -> words.mkString(" ")
      })
      check(docs, Seq("rare", "mid", "hot"), 10)
    }
  }

  test("every query term common: essential prefix still engages (strict subset)") {
    // All three terms appear in ~95% of documents, so no term is
    // "rare" in the df sense — the regime where a naive phase 1
    // would score nearly the whole corpus for θ₀. A dozen documents
    // stack tf=10 of each term, pushing θ₀ (k=10) far above the tiny
    // common-term upper bounds, so the essential set must shrink to
    // a strict subset of the query — pruning engages without any
    // genuinely rare term to anchor it.
    val heavy = (0L until 12L).map(i =>
      i -> (Seq.fill(10)("a") ++ Seq.fill(10)("b") ++ Seq.fill(10)("c")).mkString(" "))
    val common = (12L until 190L).map(i =>
      i -> (Seq("a", "b", "c") ++ Seq.fill(27)(s"pad$i")).mkString(" "))
    val filler = (190L until 200L).map(i => i -> s"nothing here pad$i")
    val docs = corpus(heavy ++ common ++ filler)
    val terms = Seq("a", "b", "c")
    val (result, essential) = Retrieval.maxscorePruned(docs, terms, 10)
    assert(essential.size < terms.size,
      s"pruning did not engage: essential=$essential")
    val got = result.collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    val want = brute(docs, terms, 10)
    assert(got.map(_._1) == want.map(_._1),
      s"doc order: got=${got.mkString(",")} want=${want.mkString(",")}")
  }

  test("hot rare term spanning many blocks: block-bounded theta0 stays exact") {
    // The "rarest" term appears in EVERY document, spread over ~60
    // distinct 1024-doc-id blocks — phase 1 must score only its
    // top-k blocks (k x 1024 hard bound) yet the final top-k must
    // still equal the full-scan answer, because theta0 from any
    // document subset is a valid lower bound.
    val rnd = new scala.util.Random(7)
    val docs = corpus((0 until 120).map { i =>
      val id = i.toLong * 500 // blocks 0..58
      val tfHot = 1 + rnd.nextInt(6)
      id -> (Seq.fill(tfHot)("hot") ++ Seq.fill(1 + rnd.nextInt(3))("warm") ++
        Seq.fill(2 + rnd.nextInt(5))(s"pad$i")).mkString(" ")
    })
    check(docs, Seq("hot", "warm"), 10)
  }

  test("q126 on the shipped corpus: pruning engages (essential gate, not full scan)") {
    // On sf0.001 the rare term has ~25 postings >= k=10 and theta0 is
    // far above the common terms' bound sum — the gate must reference
    // ONLY the rare term's tf, visible in the plan as a single
    // pushed-down tf filter (no `true` literal gate).
    val df = SparkEntry.queries("q126_maxscore_topk")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter"), s"expected a pruning filter in:\n$plan")
    assert(df.count() == 10)
  }

  test("q145 nDCG: metric laws — dcg <= idcg, ndcg in (0,1], ideal is the rel-sorted cut") {
    val rows = SparkEntry.queries("q145_ndcg_eval")(spark, "/root/testdata/sf0.001").collect()
    assert(rows.map(_.getAs[Long]("pos")).sorted.toSeq == (1L to 10L))
    val dcg = rows.head.getAs[Double]("dcg")
    val idcg = rows.head.getAs[Double]("idcg")
    val ndcg = rows.head.getAs[Double]("ndcg")
    assert(idcg >= dcg - 1e-9, s"idcg $idcg < dcg $dcg")
    assert(ndcg > 0 && ndcg <= 1.0 + 1e-9, s"ndcg $ndcg out of range")
    assert(math.abs(ndcg - dcg / idcg) < 2e-4)
    // recompute DCG from the per-position rows
    val manual = rows.map { r =>
      val rel = r.getAs[Long]("rel").toDouble
      (math.pow(2.0, rel) - 1.0) / (math.log(r.getAs[Long]("pos") + 1.0) / math.log(2.0))
    }.sum
    assert(math.abs(manual - dcg) < 1e-2, s"per-row gains $manual don't sum to dcg $dcg")
    // an ideal re-derivation from the corpus: top-10 rels sorted desc
    val rels = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(graft.queries.Retrieval.relForTest(col("text")).as("rel")).collect()
      .map(_.getAs[Int]("rel").toLong).sorted(Ordering[Long].reverse).take(10)
    val idealManual = rels.zipWithIndex.map { case (rel, i) =>
      (math.pow(2.0, rel.toDouble) - 1.0) / (math.log(i + 2.0) / math.log(2.0))
    }.sum
    assert(math.abs(idealManual - idcg) < 1e-2, s"ideal recompute $idealManual != idcg $idcg")
  }

  /** q197 against a plain-Scala reimplementation of the whole MaxSim
    * chain — chunking, signed hashing, sparse integer dots, per-chunk
    * max, per-doc sum, top-10 cut — from the corpus text alone. Dots
    * and norms are exact integers on both paths, so the only float
    * ops are one sqrt + one division per pair and the 4dp roundings;
    * rows must agree exactly. */
  test("q197 MaxSim matches an independent driver-side reimplementation") {
    val sfDir = "/root/testdata/sf0.001"
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def fr4(x: Double): Double = math.floor(x * 1e4 + 0.5) / 1e4
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // chunk → sparse signed-bucket vector (bucket -> count) + norm
    def chunkFeats(text: String): Seq[Map[Int, Long]] = {
      val ws = text.split(" ", -1)
      ws.grouped(10).map { chunk =>
        chunk.foldLeft(Map.empty[Int, Long]) { (acc, t) =>
          val h = md5hex("msim|" + t)
          val bucket = Integer.parseInt(h.substring(0, 3), 16) % 16
          val sgn = if (Integer.parseInt(h.substring(3, 4), 16) < 8) 1L else -1L
          acc.updated(bucket, acc.getOrElse(bucket, 0L) + sgn)
        }.filter(_._2 != 0L)
      }.toSeq
    }
    // chunkFeats keeps POSITION (empty maps included): the engine's
    // idx < 8 query cap counts original chunk positions, so an
    // all-zero early chunk must still occupy its slot; empty maps
    // contribute no candidate pairs on either path.
    val feats = docs.map { case (id, t) => id -> chunkFeats(t) }.toMap
    def cos(a: Map[Int, Long], b: Map[Int, Long]): Double = {
      val dot = a.keysIterator.map(k => a(k) * b.getOrElse(k, 0L)).sum.toDouble
      val na = a.valuesIterator.map(v => v * v).sum.toDouble
      val nb = b.valuesIterator.map(v => v * v).sum.toDouble
      if (na == 0d || nb == 0d) 0d else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val expected = (0L until 4L).flatMap { p =>
      val qChunks = feats(p).take(8)
      val scored = docs.map(_._1).filter(_ != p).flatMap { d =>
        val cands = qChunks.map { qc =>
          val sims = feats(d).filter(dc => dc.keySet.intersect(qc.keySet).nonEmpty)
            .map(dc => fr4(cos(qc, dc)))
          if (sims.isEmpty) None else Some(math.max(sims.max, 0.0))
        }.collect { case Some(s) => s }
        if (cands.isEmpty) None
        else Some((d, fr4(cands.sum), cands.length.toLong))
      }
      scored.sortBy { case (d, s, _) => (-s, d) }.take(10).zipWithIndex
        .map { case ((d, s, nq), i) => (p, (i + 1).toLong, d, s, nq) }
    }
    val got = SparkEntry.queries("q197_maxsim_retrieval")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))
    assert(got.length == expected.length,
      s"row count ${got.length} vs driver ${expected.length}")
    got.zip(expected).foreach { case (g, e) =>
      assert(g._1 == e._1 && g._2 == e._2 && g._3 == e._3 && g._5 == e._5,
        s"row diverges: $g vs $e")
      assert(math.abs(g._4 - e._4) < 1e-9, s"score diverges: $g vs $e")
    }
    // the ranking is non-vacuous: some probe's top hit shares real
    // chunk overlap (score meaningfully above the floor)
    assert(got.exists(_._4 > 0.1), "all MaxSim scores near zero — degenerate fixture")
  }
}
