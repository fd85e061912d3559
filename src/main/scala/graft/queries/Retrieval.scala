package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Num, VectorFns}

/** Search-serving index surface: the inverted-index BUILD (the storage
  * artifact a retrieval system precomputes over the corpus) and the
  * MaxScore-PRUNED ranked retrieval that consumes its statistics —
  * extending q114's full-scan BM25 scorer (the reference's analytic
  * read path, `api_service/main.py:311-373`, scaled to ranked search
  * over `documents`) with the two pieces a corpus-scale deployment
  * adds: a blocked index and a lossless candidate-pruning query plan.
  *
  * Scale stance shared by both queries:
  *  - posting lists are built in FIXED-SIZE doc-id blocks, so no
  *    aggregation buffer ever holds more than `BlockSize` ids — a hot
  *    term ("the") has millions of postings at corpus scale, and a
  *    whole-list `collect_list` per term would be exactly the
  *    unbounded-state anti-pattern `PlanHygieneSpec` exists to stop;
  *  - every per-term summary the ranker needs (df, upper bounds) is a
  *    CONSTANT-size aggregate (one row per query term), so pruning
  *    decisions ride as plan literals, never as a corpus-size join.
  */
object Retrieval {

  /** Fixed query-term set for the ranked-retrieval demos: one rare
    * term (df ≈ 5% of the corpus — the discriminative one) and two
    * common terms, so the MaxScore essential/non-essential split is
    * non-trivial at every SF. */
  private val Terms = Seq("dup", "join", "batch")
  private val K1 = 1.2
  private val B = 0.75
  private val TopK = 10

  /** q197 MaxSim knobs: 16 signed hash buckets per chunk vector, 4
    * probe documents, query side capped at 8 chunks, top-10 served. */
  private val MsimBuckets = 16
  private val MsimProbes = 4
  private val MsimQCap = 8
  private val MsimTopK = 10

  /** Graded relevance used by q145 (and its spec's re-derivation):
    * the number of distinct query terms the document contains. */
  private[graft] def relForTest(text: Column): Column =
    Terms.map(w => when(size(filter(split(text, " "), t => t === w)) > 0, 1)
      .otherwise(0)).reduce(_ + _)

  /** Per-document term frequencies for a CONSTANT term set, as a pure
    * narrow map over the token array (q114's shape: one `filter` count
    * per term — no explode, no (doc, term) shuffle). */
  private def perDoc(docs: DataFrame, terms: Seq[String]): DataFrame =
    docs.select(col("doc_id") +: size(split(col("text"), " ")).as("dl") +:
      terms.map(w => expr(s"size(filter(split(text, ' '), t -> t = '$w'))")
        .cast("double").as(s"tf_$w")): _*)

  /** BM25 score column over `perDoc` output, with (n, avgdl, idf_w)
    * supplied as plan literals. Association mirrors the oracle SQL
    * term for term (q114's rule: the only cross-engine noise source
    * left is ln itself, absorbed by the 4dp rounding). */
  private def bm25(terms: Seq[String], n: Double, avgdl: Double, df: Map[String, Double]): Column =
    terms.map { w =>
      val idf = math.log((n - df(w) + 0.5) / (df(w) + 0.5) + 1.0)
      lit(idf) * col(s"tf_$w") * (K1 + 1.0) /
        (col(s"tf_$w") + (col("dl").cast("double") / avgdl * B + (1.0 - B)) * K1)
    }.reduce(_ + _)

  /** Oracle-side full-scan BM25 (q114's SQL shape, parameterized). */
  private def bm25Sql(terms: Seq[String], limit: Int): String = {
    val tfCols = terms.map(w =>
      s"len(list_filter(string_split(text, ' '), t -> t = '$w'))::DOUBLE AS tf_$w")
      .mkString(",\n                   ")
    val dfCols = terms.map(w =>
      s"sum(CASE WHEN tf_$w > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_$w")
      .mkString(",\n                   ")
    val scoreSql = terms.map(w =>
      s"""ln((n - df_$w + 0.5) / (df_$w + 0.5) + 1) * tf_$w * ${K1 + 1.0}
          / (tf_$w + (dl / avgdl * $B + ${1.0 - B}) * $K1)""").mkString(" + ")
    s"""WITH per_doc AS (
           SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS dl,
             $tfCols
           FROM documents),
         stats AS (
           SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl,
             $dfCols
           FROM per_doc)
         SELECT doc_id, dl::BIGINT AS dl,
           ${Num.froundSql(scoreSql, 4)} AS score
         FROM per_doc, stats
         ORDER BY score DESC, doc_id LIMIT $limit"""
  }

  /** MaxScore-pruned exact BM25 top-k over any (doc_id, text) corpus.
    *
    * Phase 1 scores only the rarest term's postings in its TOP-k
    * 1024-doc-id BLOCKS ranked by per-block max-tf (the q125 index
    * statistic), and takes the k-th ROUNDED score as a certified
    * lower bound θ₀ on the final k-th score (a top-k over ANY subset
    * of documents can only under-estimate it — block selection
    * affects only how tight θ₀ is, never its validity). This bounds
    * the θ₀ derivation even when the "rarest" query term is itself
    * hot: at most k blocks × ≤1024 postings are ever scored for the
    * threshold, instead of the term's whole posting list. Terms then split at the analytic per-term bound
    * idf·(k1+1) — the tf→∞ limit, attained by no finite tf — into an
    * essential prefix and a non-essential tail whose bounds sum below
    * θ₀ − 10⁻³: a document containing no essential term scores
    * strictly under every phase-1 candidate and is pruned unscored.
    *
    * Pruning switches OFF (gate = true, plain full scan) whenever its
    * certificate doesn't hold: fewer than k phase-1 candidates, or
    * θ₀ < 10⁻³ (zero-score documents — containing no query term at
    * all — tie with rounded near-zero scores there, and the margin
    * argument needs θ₀ − 10⁻³ ≥ 0 to discard them). The 10⁻³ margin
    * covers the rounded-θ₀ vs true-score gap (5·10⁻⁵) plus any
    * last-ulp ln disagreement between the driver's math.log literals
    * and the engines' ln, so ties at the rounded-4dp boundary cannot
    * resurrect a pruned document. Driver state is bounded by
    * construction: one stats row, k block ids, and k phase-1 rows. */
  private[graft] def maxscoreTopK(docs: DataFrame, terms: Seq[String], k: Int): DataFrame =
    maxscorePruned(docs, terms, k)._1

  /** [[maxscoreTopK]] plus the essential-term set it settled on —
    * `terms.toSet` means the gate fell back to a full scan (no
    * certificate); a strict subset means non-essential terms were
    * pruned. Exposed for the spec that pins "pruning still engages
    * when every query term is common". */
  private[graft] def maxscorePruned(docs: DataFrame, terms: Seq[String], k: Int)
      : (DataFrame, Set[String]) = {
    val pd = perDoc(docs, terms)
    val aggs = Seq(
      count(lit(1)).cast("double").as("n"),
      avg(col("dl").cast("double")).as("avgdl")) ++
      terms.map(w => sum(when(col(s"tf_$w") > 0, 1L).otherwise(0L))
        .cast("double").as(s"df_$w"))
    val statsRow = pd.agg(aggs.head, aggs.tail: _*).head()
    val n = statsRow.getDouble(0)
    val avgdl = statsRow.getDouble(1)
    val df = terms.zipWithIndex.map { case (w, i) => w -> statsRow.getDouble(2 + i) }.toMap
    val ub = terms.map(w =>
      w -> (math.log((n - df(w) + 0.5) / (df(w) + 0.5) + 1.0) * (K1 + 1.0))).toMap
    val score = Num.fround(bm25(terms, n, avgdl, df), 4)
    val rare = terms.minBy(df)
    // Phase 1, block-bounded (the q125 index-statistics shape): rank
    // the rare term's 1024-doc blocks by max-tf and fully score only
    // the top-k blocks' postings. If the rare term has ≥ k non-empty
    // blocks this yields ≥ k candidates (each block contributes ≥ 1);
    // with fewer blocks it degenerates to scoring the whole (small)
    // posting list — same coverage as before, now with a hard bound
    // of k·1024 scored rows however hot the term is.
    val blockTop = pd.filter(col(s"tf_$rare") > 0)
      .groupBy(expr("doc_id div 1024").as("block"))
      .agg(max(col(s"tf_$rare")).as("bmax"))
      .orderBy(col("bmax").desc, col("block"))
      .limit(k).collect().map(_.getAs[Long]("block")).toSeq
    val phase1 =
      if (blockTop.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else pd.filter(col(s"tf_$rare") > 0 &&
          expr("doc_id div 1024").isInCollection(blockTop))
        .select(col("doc_id"), score.as("score"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(k).collect()
    val theta0 = if (phase1.length >= k) phase1.last.getDouble(1) else Double.NegativeInfinity
    val essential = if (theta0 < 1e-3) terms.toSet else {
      // Essential prefix by descending upper bound: extend until the
      // remaining tail's bounds sum below θ₀ − margin.
      val byUb = terms.sortBy(w => -ub(w))
      byUb.indices
        .find(p => byUb.drop(p + 1).map(ub).sum <= theta0 - 1e-3)
        .map(p => byUb.take(p + 1)).getOrElse(byUb).toSet + rare
    }
    val gate = if (theta0 < 1e-3) lit(true)
      else essential.toSeq.sorted.map(w => col(s"tf_$w") > 0).reduce(_ || _)
    val result = pd.filter(gate)
      .select(col("doc_id"), col("dl").cast("long").as("dl"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
    (result, essential)
  }

  val defs: Seq[QueryDef] = Seq(

    // Inverted-index build — the precomputed artifact behind every
    // ranked-retrieval query: for each term, document-frequency /
    // total-tf / max-tf (the WAND/MaxScore upper-bound statistics)
    // plus the posting list itself, delta-encoded (gap compression,
    // the standard postings format) and built in FIXED 1024-doc-id
    // BLOCKS so per-group aggregation state is bounded by
    // construction: a corpus-scale hot term splits into
    // max(doc_id)/1024 independent block builds (each a ≤1024-element
    // sorted list) instead of one multi-million-element buffer, and
    // the per-term rollup folds block DIGESTS (the q84 Merkle shape),
    // never the postings themselves. Output stays bounded at any
    // corpus size: one row per vocabulary term carrying exact integer
    // stats, the block-chained md5 of the delta streams, and the
    // first ≤8 deltas of the lowest block as a readable sample. At
    // 100 TB the block table itself is the index (written
    // partitioned by term-hash, block — here it feeds the rollup);
    // q126 consumes the same statistics for its pruning bounds.
    QueryDef(
      "q125_inverted_index",
      (s, dir) => {
        val occ = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
          .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
        val blocks = occ
          .withColumn("block", expr("doc_id div 1024"))
          .groupBy(col("term"), col("block"))
          .agg(count(lit(1)).as("b_df"), sum(col("tf")).as("b_tf"),
            max(col("tf")).as("b_max_tf"),
            sort_array(collect_list(col("doc_id"))).as("pl"))
          .withColumn("deltas",
            expr("transform(pl, (x, i) -> IF(i = 0, x, x - element_at(pl, i)))"))
          .withColumn("b_digest",
            md5(concat_ws(",", expr("transform(deltas, x -> cast(x as string))"))))
        blocks.groupBy(col("term"))
          .agg(sum(col("b_df")).as("df"), sum(col("b_tf")).as("total_tf"),
            max(col("b_max_tf")).as("max_tf"), count(lit(1)).as("n_blocks"),
            md5(concat_ws(",",
              expr("transform(sort_array(collect_list(struct(block, b_digest))), x -> x.b_digest)")))
              .as("postings_digest"),
            // Serialized to a comma-joined STRING, not array<bigint>:
            // the driver's pandas-based comparer sorts every output
            // column and cannot factorize array cells (round-7 red
            // row). Scalar string is hash-equivalent and harness-safe.
            expr("array_join(transform(min_by(slice(deltas, 1, 8), block)," +
              " x -> cast(x as string)), ',')").as("head_deltas"))
          .orderBy(col("df").desc, col("term"))
      },
      Some("""WITH occ AS (
                SELECT term, doc_id, count(*) AS tf FROM (
                  SELECT doc_id, unnest(string_split(text, ' ')) AS term
                  FROM documents)
                GROUP BY term, doc_id),
              blk AS (
                SELECT term, doc_id // 1024 AS block,
                  count(*) AS b_df, sum(tf) AS b_tf, max(tf) AS b_max_tf,
                  array_agg(doc_id ORDER BY doc_id) AS pl
                FROM occ GROUP BY term, doc_id // 1024),
              blk2 AS (
                SELECT *, [CASE WHEN i = 1 THEN pl[i]
                           ELSE pl[i] - pl[i-1] END
                           for i in generate_series(1, len(pl))] AS deltas
                FROM blk),
              blk3 AS (
                SELECT *, md5(array_to_string(deltas, ',')) AS b_digest
                FROM blk2)
              SELECT term, sum(b_df)::BIGINT AS df,
                sum(b_tf)::BIGINT AS total_tf,
                max(b_max_tf)::BIGINT AS max_tf,
                count(*)::BIGINT AS n_blocks,
                md5(string_agg(b_digest, ',' ORDER BY block)) AS postings_digest,
                array_to_string(min_by(deltas[1:8], block), ',') AS head_deltas
              FROM blk3 GROUP BY term
              ORDER BY df DESC, term"""),
    ),

    // MaxScore-pruned BM25 top-k — the serving-side complement of
    // q114's teaching full scan: identical RESULT, structurally
    // pruned plan (Turtle & Flood's MaxScore, the production WAND
    // family); algorithm and its losslessness certificate in
    // [[maxscoreTopK]]. With this corpus's mixed-df terms the
    // essential set collapses to the rare term and ~95% of documents
    // never reach the scorer.
    //
    // The ORACLE DOES NOT MIRROR THE PRUNING — it runs the full scan
    // (q114's SQL) over all documents: a hash match is an independent
    // proof the pruning is lossless, not a mirrored re-derivation
    // (the q122-vs-brute-force verification stance). The final plan
    // is scan → narrow map → pruning filter → full score →
    // TakeOrderedAndProject — no join, no exchange of the corpus.
    QueryDef(
      "q126_maxscore_topk",
      (s, dir) => maxscoreTopK(Tables.documents(s, dir), Terms, TopK),
      Some(bm25Sql(Terms, TopK)),
    ),

    // nDCG@10 ranking-quality evaluation — the metric a retrieval
    // deployment tracks per release (did the ranker change hurt?):
    // the q114-family BM25 top-10 scored against a deterministic
    // graded relevance (rel = number of distinct query terms the
    // document contains, 0..3 — the judgment a term-match qrel set
    // gives), with the ideal ranking recomputed from the whole
    // corpus. Emits the ranked list (position, doc, rel, discounted
    // gain) plus the DCG/IDCG/nDCG summary on every row.
    //
    // Scale shape: ONE corpus scan (narrow tf maps) feeding two
    // TakeOrderedAndProject cuts (actual top-10 by rounded score,
    // ideal top-10 by rel) — the corpus never hash-shuffles; the
    // position windows see only the constant-K cut rows (the q120
    // contract). Gains 2^rel − 1 are exact integers; discounts
    // ln(pos+1)/ln 2 are per-position constants identical in both
    // engines; rank ties break on doc_id over the 4dp-ROUNDED score
    // (the q69/q114 rule).
    QueryDef(
      "q145_ndcg_eval",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val (k1, b) = (K1, B)
        val perDocF = perDoc(Tables.documents(s, dir), Terms)
        val statCols = avg(col("dl").cast("double")).as("avgdl") +:
          Terms.map(w => sum(when(col(s"tf_$w") > 0, 1L).otherwise(0L))
            .cast("double").as(s"df_$w"))
        val stats = perDocF.agg(count(lit(1)).cast("double").as("n"), statCols: _*)
        val score = Terms.map { w =>
          val idf = log((col("n") - col(s"df_$w") + 0.5) / (col(s"df_$w") + 0.5) + 1.0)
          idf * col(s"tf_$w") * (k1 + 1.0) /
            (col(s"tf_$w") + (col("dl").cast("double") / col("avgdl") * b + (1.0 - b)) * k1)
        }.reduce(_ + _)
        val rel = Terms.map(w => when(col(s"tf_$w") > 0, 1).otherwise(0)).reduce(_ + _)
        // staged scored table — both TakeOrdered cuts (actual + ideal)
        // read the stored narrow rows instead of pinning a cache
        val scored = graft.operators.Staged.parquet(s, s"q145scored|$dir") {
          perDocF.crossJoin(broadcast(stats))
            .select(col("doc_id"), Num.fround(score, 4).as("score"),
              rel.cast("long").as("rel"))
        }
        val ranked = scored.orderBy(col("score").desc, col("doc_id")).limit(10)
          .withColumn("pos",
            row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
        val ideal = scored.orderBy(col("rel").desc, col("doc_id")).limit(10)
          .withColumn("pos",
            row_number().over(Window.orderBy(col("rel").desc, col("doc_id"))).cast("long"))
        def gain(df: org.apache.spark.sql.DataFrame) = df.withColumn("g",
          (pow(lit(2.0), col("rel").cast("double")) - 1.0)
            / (log(col("pos").cast("double") + 1.0) / math.log(2.0)))
        val dcg = gain(ranked).agg(sum(col("g")).as("dcg"))
        val idcg = gain(ideal).agg(sum(col("g")).as("idcg"))
        gain(ranked)
          .crossJoin(broadcast(dcg)).crossJoin(broadcast(idcg))
          .select(col("pos"), col("doc_id"), col("score"), col("rel"),
            Num.fround(col("g"), 4).as("gain"),
            Num.fround(col("dcg"), 4).as("dcg"),
            Num.fround(col("idcg"), 4).as("idcg"),
            Num.fround(col("dcg") / col("idcg"), 4).as("ndcg"))
          .orderBy(col("pos"))
      },
      Some {
        val tfCols = Terms.map(w =>
          s"len(list_filter(string_split(text, ' '), t -> t = '$w'))::DOUBLE AS tf_$w")
          .mkString(",\n                   ")
        val dfCols = Terms.map(w =>
          s"sum(CASE WHEN tf_$w > 0 THEN 1 ELSE 0 END)::DOUBLE AS df_$w")
          .mkString(",\n                   ")
        val scoreSql = Terms.map(w =>
          s"""ln((n - df_$w + 0.5) / (df_$w + 0.5) + 1) * tf_$w * ${K1 + 1.0}
              / (tf_$w + (dl / avgdl * $B + ${1.0 - B}) * $K1)""").mkString(" + ")
        val relSql = Terms.map(w => s"(CASE WHEN tf_$w > 0 THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val gainSql = "(pow(2.0, rel::DOUBLE) - 1.0) / (ln(pos::DOUBLE + 1.0) / ln(2.0))"
        s"""WITH per_doc AS (
               SELECT doc_id, len(string_split(text, ' '))::DOUBLE AS dl,
                 $tfCols
               FROM documents),
             stats AS (
               SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl,
                 $dfCols
               FROM per_doc),
             scored AS (
               SELECT doc_id, ${Num.froundSql(scoreSql, 4)} AS score,
                 ($relSql)::BIGINT AS rel
               FROM per_doc, stats),
             ranked AS (
               SELECT doc_id, score, rel,
                 row_number() OVER (ORDER BY score DESC, doc_id)::BIGINT AS pos
               FROM scored ORDER BY score DESC, doc_id LIMIT 10),
             ideal AS (
               SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id)::BIGINT AS pos
               FROM scored ORDER BY rel DESC, doc_id LIMIT 10),
             d AS (SELECT sum($gainSql) AS dcg FROM ranked),
             i AS (SELECT sum($gainSql) AS idcg FROM ideal)
             SELECT pos, doc_id, score, rel,
               ${Num.froundSql(gainSql, 4)} AS gain,
               ${Num.froundSql("dcg", 4)} AS dcg,
               ${Num.froundSql("idcg", 4)} AS idcg,
               ${Num.froundSql("dcg / idcg", 4)} AS ndcg
             FROM ranked, d, i ORDER BY pos"""
      },
    ),

    // Late-interaction (MaxSim) retrieval — the ColBERT scoring rule
    // (Khattab & Zaharia 2020): score(q, d) = Σ over query units of
    // the MAX similarity against any document unit, instead of one
    // vector per document. The units here are the q75-shape 10-token
    // chunks, each embedded by the hashing trick (Weinberger et al.
    // 2009): every token hashes to one of 16 signed buckets
    // (md5-derived bucket and sign — the q117/q119 device), so a
    // chunk's vector is a SPARSE integer bucket→count map and dot
    // products are EXACT integer sums (the only float op per pair is
    // one sqrt + one division, the normSq/dot house argument). Query
    // side = the 4 RANK-smallest doc_ids (deterministic orderBy+limit
    // over the distinct ids — NOT `doc_id < 4`, which is vacuously
    // empty on a fixture whose id space doesn't start at 0; round-15
    // ADVICE fix) truncated to their first 8 chunks (the published
    // query-length cap). A (q-chunk, doc) pair sharing no
    // bucket scores 0, and the per-q-chunk max is floored at 0 —
    // both engines see the identical sparse semantics.
    //
    // Scale shape: the chunk-feature table is the staged serving
    // artifact (explode → 16-bucket HashAggregate with map-side
    // partials — hot tokens collapse per-mapper; norms ride a
    // (doc, idx)-keyed window, one exchange at build). Serving joins
    // the corpus-side features to a BROADCAST probe-feature table
    // (≤ 4·8·16 rows by construction) on bucket — never a corpus
    // self-join — then two key-narrowing HashAggregates (pair dot →
    // per-q-chunk max → per-doc sum). The rank ≤ 10 filter compiles
    // to WindowGroupLimit (the q184 device), so each partition keeps
    // 10 candidates per probe before the final exchange.
    //
    // Determinism: dot/norms are exact integers; cosine is one
    // correctly-rounded sqrt + one IEEE division of identical
    // operands, frounded to 4dp before max; the per-doc score sums
    // ≤ 8 4dp-quantized terms (association noise ~1e-15 vs the 5e-5
    // boundary) and re-rounds; ranks break ties on doc_id.
    QueryDef(
      "q197_maxsim_retrieval",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val feats = graft.operators.Staged.parquet(s, s"msim_feats|$dir") {
          val toks = split(col("text"), " ")
          val nChunks = ceil(size(toks).cast("double") / 10.0).cast("int")
          val chunks = Tables.documents(s, dir)
            .select(col("doc_id"), toks.as("ws"), nChunks.as("nc"))
            .select(col("doc_id"), posexplode(expr(
              "transform(sequence(0, nc - 1), i -> array_join(slice(ws, i * 10 + 1, 10), ' '))")))
            .withColumnsRenamed(Map("pos" -> "idx", "col" -> "chunk"))
          val hashed = chunks
            .select(col("doc_id"), col("idx"),
              explode(split(col("chunk"), " ")).as("t"))
            .select(col("doc_id"), col("idx"),
              expr(s"cast(conv(substring(md5(concat('msim|', t)), 1, 3), 16, 10) as int) % $MsimBuckets")
                .as("bucket"),
              expr("case when cast(conv(substring(md5(concat('msim|', t)), 4, 1), 16, 10) as int) < 8 then 1L else -1L end")
                .as("sgn"))
          hashed.groupBy(col("doc_id"), col("idx"), col("bucket"))
            .agg(sum(col("sgn")).as("c"))
            .filter(col("c") =!= 0)
            .withColumn("nsq",
              sum(col("c") * col("c"))
                .over(Window.partitionBy(col("doc_id"), col("idx"))))
        }
        // NULL pin (ADVICE r15): Spark orderBy is NULLS FIRST, DuckDB
        // NULLS LAST — a NULL doc_id entering the fixture would eat a
        // Spark probe slot and silently diverge the differential, so
        // the probe pick excludes NULLs explicitly on BOTH engines.
        val probeIds = feats.select(col("doc_id"))
          .filter(col("doc_id").isNotNull).distinct()
          .orderBy(col("doc_id")).limit(MsimProbes)
        val probes = feats.join(broadcast(probeIds), Seq("doc_id"))
          .filter(col("idx") < MsimQCap)
          .select(col("doc_id").as("probe_id"), col("idx").as("q_idx"),
            col("bucket"), col("c").as("pc"), col("nsq").as("pnsq"))
        val sim = Num.fround(VectorFns.cosine(col("dot").cast("double"),
          col("dn").cast("double"), col("pn").cast("double")), 4)
        val best = feats.join(broadcast(probes), Seq("bucket"))
          .filter(col("doc_id") =!= col("probe_id"))
          .groupBy(col("probe_id"), col("q_idx"), col("doc_id"), col("idx"))
          .agg(sum(col("c") * col("pc")).as("dot"),
            max(col("nsq")).as("dn"), max(col("pnsq")).as("pn"))
          .select(col("probe_id"), col("q_idx"), col("doc_id"), sim.as("sim"))
          .groupBy(col("probe_id"), col("q_idx"), col("doc_id"))
          .agg(greatest(max(col("sim")), lit(0.0)).as("qbest"))
        val ranked = Window.partitionBy(col("probe_id"))
          .orderBy(col("score").desc, col("doc_id"))
        best.groupBy(col("probe_id"), col("doc_id"))
          .agg(Num.fround(sum(col("qbest")), 4).as("score"),
            count(lit(1)).as("n_q_matched"))
          .withColumn("rnk", row_number().over(ranked).cast("long"))
          .filter(col("rnk") <= MsimTopK)
          .select(col("probe_id"), col("rnk"), col("doc_id"), col("score"),
            col("n_q_matched"))
          .orderBy(col("probe_id"), col("rnk"))
      },
      Some {
        val cosSql = Num.froundSql(VectorFns.cosineSql(
          "dot::DOUBLE", "dn::DOUBLE", "pn::DOUBLE"), 4)
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            ch AS (SELECT doc_id, g.i AS idx,
                     array_to_string(array_slice(ws, 10 * g.i + 1, 10 * g.i + 10), ' ') AS chunk
                   FROM t, LATERAL (SELECT unnest(generate_series(0,
                     CAST(ceil(len(ws) / 10.0) AS INT) - 1)) AS i) g),
            tok AS (SELECT doc_id, idx, unnest(string_split(chunk, ' ')) AS tk FROM ch),
            ftr AS (SELECT doc_id, idx,
                      ('0x' || substr(md5('msim|' || tk), 1, 3))::INT % $MsimBuckets AS bucket,
                      sum(CASE WHEN ('0x' || substr(md5('msim|' || tk), 4, 1))::INT < 8
                          THEN 1 ELSE -1 END)::BIGINT AS c
                    FROM tok GROUP BY doc_id, idx, bucket),
            fn AS (SELECT doc_id, idx, bucket, c,
                     sum(c * c) OVER (PARTITION BY doc_id, idx)::BIGINT AS nsq
                   FROM ftr WHERE c <> 0),
            pids AS (SELECT DISTINCT doc_id FROM fn
                     WHERE doc_id IS NOT NULL
                     ORDER BY doc_id LIMIT $MsimProbes),
            pf AS (SELECT f.doc_id AS probe_id, f.idx AS q_idx, f.bucket,
                     f.c AS pc, f.nsq AS pnsq
                   FROM fn f JOIN pids USING (doc_id)
                   WHERE f.idx < $MsimQCap),
            pd AS (SELECT p.probe_id, p.q_idx, f.doc_id, f.idx,
                     sum(f.c * p.pc)::BIGINT AS dot,
                     max(f.nsq) AS dn, max(p.pnsq) AS pn
                   FROM fn f JOIN pf p USING (bucket)
                   WHERE f.doc_id <> p.probe_id
                   GROUP BY p.probe_id, p.q_idx, f.doc_id, f.idx),
            bst AS (SELECT probe_id, q_idx, doc_id,
                      greatest(max($cosSql), 0.0) AS qbest
                    FROM pd GROUP BY probe_id, q_idx, doc_id),
            scd AS (SELECT probe_id, doc_id,
                      ${Num.froundSql("sum(qbest)", 4)} AS score,
                      count(*)::BIGINT AS n_q_matched
                    FROM bst GROUP BY probe_id, doc_id),
            rkd AS (SELECT probe_id, doc_id, score, n_q_matched,
                      row_number() OVER (PARTITION BY probe_id
                        ORDER BY score DESC, doc_id)::BIGINT AS rnk
                    FROM scd)
            SELECT probe_id, rnk, doc_id, score, n_q_matched
            FROM rkd WHERE rnk <= $MsimTopK ORDER BY probe_id, rnk"""
      },
    ),
  )
}
