package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Num, TextFns}

/** Corpus-curation operators over the `documents` table — the second
  * wave of the LLM-data-pipeline surface (SURVEY.md §7.2 step 5, same
  * family as [[Text]]): cross-document duplicated-chunk removal
  * (C4-style), stratified deterministic sampling with per-language
  * rates, corpus-wide n-gram heavy hitters, overlapping sequence
  * windowing for training shards, and a per-document contamination
  * gate. The reference has no analog for any of these (its corpus is
  * match JSON, not text); they are the at-scale extension surface the
  * blueprint mandates.
  *
  * Scale design notes, per query, are inline — the shared rule is the
  * same as [[Text]]'s: per-doc projections stay narrow and map-side;
  * anything that crosses documents is either keyed by content hash
  * (chunk dedup), keyed by a broadcast set (contamination), or a
  * partial-aggregate heavy-hitter count — never a corpus self-join.
  */
object Curation {

  /** The q87 unigram-LM document scorer (doc_id, n_tokens, avg_nll) —
    * factored out because q190's excess-loss selection needs the
    * weak-model score next to the bigram model's. The LM is corpus
    * unigram MLE over the staged q87vocab artifact; the score re-join
    * splits the vocabulary into a broadcast HEAD (exact top-HeadK by
    * count — precisely the hot Zipf keys) and a shuffled TAIL whose
    * per-key cardinality is bounded by the head threshold — no heavy
    * key ever enters an exchange (the q87 scaladoc's structural skew
    * fix). ln may differ 1 ulp across libms; the 4dp fround absorbs
    * it (error 1e-16 vs boundary width 5e-5). */
  private[queries] def unigramScored(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    // HeadK: sized so head ∪ tail both carry real traffic at the
    // 31-word test vocab while the production contract (head = every
    // token whose frequency could overload one reducer) holds — at
    // 100 TB this is ~10⁴ entries, trivially broadcast.
    val HeadK = 16
    val toks = Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
    // staged vocab table — head cut, tail anti-join, and the total
    // all read the stored vocab-bounded rows
    val vocab = graft.operators.Staged.parquet(s, s"q87vocab|$dir")(
      toks.groupBy(col("w")).agg(count(lit(1)).as("c")))
    val head = vocab.orderBy(col("c").desc, col("w")).limit(HeadK)
    val tail = vocab.join(broadcast(head.select(col("w"))), Seq("w"), "left_anti")
    val total = vocab.agg(sum(col("c")).cast("double").as("n"))
    val scoredHead = toks.join(broadcast(head), Seq("w"))
    val scoredTail = toks
      .join(broadcast(head.select(col("w"))), Seq("w"), "left_anti")
      .join(tail, Seq("w"))
    scoredHead.unionByName(scoredTail)
      .crossJoin(broadcast(total))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        Num.fround(avg(-log(col("c").cast("double") / col("n"))), 4)
          .as("avg_nll"))
  }

  /** DuckDB CTE list mirroring [[unigramScored]] (no leading WITH):
    * defines `uniscored(doc_id, n_tokens, avg_nll)`. The head/tail
    * split is output-invariant, so the mirror needs no analog. */
  private[queries] def uniScoreSqlCtes: String =
    s"""unitok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
        univocab AS (SELECT w, count(*) AS c FROM unitok GROUP BY w),
        unitot AS (SELECT sum(c)::DOUBLE AS n FROM univocab),
        uniscored AS (
          SELECT doc_id, count(*)::BIGINT AS n_tokens,
            ${Num.froundSql("avg(-ln(c::DOUBLE / n))", 4)} AS avg_nll
          FROM unitok JOIN univocab USING (w), unitot
          GROUP BY doc_id)"""

  private val STOPWORDS = TextFns.STOPWORDS
  private def stopList = TextFns.stopListSql

  // ---- Shared stage logic -------------------------------------------
  // q84 chains the standalone queries' stages; these helpers are the
  // SINGLE definition of each stage's expressions (Spark) and SQL
  // fragments (DuckDB oracle) so an edit to a threshold, rate, or
  // metric cannot silently desynchronize the pipeline from the
  // standalone query — or either engine from the other.

  /** Gopher metrics over a `toks` array column (+ `text`). */
  private def gopherMeanLen =
    Num.fround((length(col("text")) - (size(col("toks")) - 1)).cast("double")
      / size(col("toks")), 4)
  private def gopherDupFrac(k: Int) = {
    val sh = TextFns.shingleExpr("toks", k)
    Num.fround(lit(1.0) - size(array_distinct(sh)).cast("double") / size(sh), 4)
  }
  private def gopherStopHits = size(array_intersect(
    array_distinct(col("toks")), array(STOPWORDS.map(w => lit(w)): _*)))

  /** The verdict conjunction — ONE place for the thresholds. */
  private def gopherVerdict(nWords: org.apache.spark.sql.Column,
      meanLen: org.apache.spark.sql.Column, dup2: org.apache.spark.sql.Column,
      dup3: org.apache.spark.sql.Column, stops: org.apache.spark.sql.Column) =
    nWords.between(20, 100000) && meanLen.between(3.0, 10.0) &&
      dup2 <= 0.2 && dup3 <= 0.18 && stops >= 2

  /** The full q80 verdict over a row carrying `toks` + `text` —
    * package-visible so the STREAMING ingest path
    * ([[graft.streaming.CorpusIngest]]) applies the identical filter
    * definition as the batch queries. */
  private[graft] def gopherKeepExpr: org.apache.spark.sql.Column =
    gopherVerdict(size(col("toks")), gopherMeanLen,
      gopherDupFrac(2), gopherDupFrac(3), gopherStopHits)

  private def gopherMeanLenSql =
    Num.froundSql("(length(text) - (len(ws) - 1)) / len(ws)::DOUBLE", 4)
  private def gopherDupSql(k: Int) = Num.froundSql(
    s"1.0 - len(list_distinct(${TextFns.shingleSql("ws", k)})) / len(${TextFns.shingleSql("ws", k)})::DOUBLE", 4)
  private def gopherStopHitsSql =
    s"len(list_filter(list_distinct(ws), x -> x IN $stopList))"
  private def gopherVerdictSql(nWords: String, meanLen: String, dup2: String,
      dup3: String, stops: String) =
    s"""($nWords BETWEEN 20 AND 100000 AND $meanLen BETWEEN 3.0 AND 10.0
        AND $dup2 <= 0.2 AND $dup3 <= 0.18 AND $stops >= 2)"""

  /** Per-doc contamination stats + the integer 10·hits ≤ shingles
    * gate, over `docs`(doc_id, toks) vs a broadcastable
    * `benchSh`(sh, hit) set. Returns survivors as
    * (doc_id, n_sh, n_hit). Shared by q79 and q84's stage 3. */
  private def contaminationSurvivors(docs: org.apache.spark.sql.DataFrame,
      benchSh: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"),
        explode(array_distinct(TextFns.shingleExpr("toks", 5))).as("sh"))
      .join(broadcast(benchSh), Seq("sh"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_sh"),
        sum(coalesce(col("hit"), lit(0))).cast("long").as("n_hit"))
      .filter(col("n_hit") * 10 <= col("n_sh"))

  /** Stratified-sampling rates + deterministic md5 bucket (q76, q84). */
  private def strataRate = coalesce(element_at(map(
    lit("en"), lit(6), lit("zh"), lit(4), lit("es"), lit(3), lit("fr"), lit(2)),
    col("lang")), lit(1))
  private def strataBucket = expr(
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 4), 16, 10) as int) % 10")
  private val strataRateSql =
    """CASE lang WHEN 'en' THEN 6 WHEN 'zh' THEN 4 WHEN 'es' THEN 3
              WHEN 'fr' THEN 2 ELSE 1 END"""
  private val strataBucketSql =
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 4))::INT % 10"

  private val BpeRounds = 8

  /** DuckDB mirror of [[graft.operators.Bpe]]: wt0 (word types with
    * double-space-encoded symbols) and per-round (p_k pair counts,
    * m_k argmax, wt_k merged) CTEs up to [[BpeRounds]]. Every CTE is
    * MATERIALIZED: DuckDB inlines plain CTEs, and an 8-deep chain
    * where each level references its predecessor ~5 times would
    * otherwise expand to ~5^8 scans. */
  private lazy val bpeSqlCtes: String = {
    val rounds = (1 to BpeRounds).map { k =>
      s"""p$k AS MATERIALIZED (
            SELECT p.l AS l, p.r AS r, sum(cnt)::BIGINT AS pc FROM (
              SELECT cnt, unnest([{'l': toks[i], 'r': toks[i + 1]}
                for i in generate_series(1, len(toks) - 1)]) AS p
              FROM (SELECT cnt, string_split(trim(s), '  ') AS toks FROM wt${k - 1}))
            GROUP BY p.l, p.r),
          m$k AS MATERIALIZED (SELECT l, r, pc FROM p$k ORDER BY pc DESC, l, r LIMIT 1),
          wt$k AS MATERIALIZED (
            SELECT w, cnt,
              replace(s, ' ' || (SELECT l FROM m$k) || '  ' || (SELECT r FROM m$k) || ' ',
                ' ' || (SELECT l FROM m$k) || (SELECT r FROM m$k) || ' ') AS s
            FROM wt${k - 1})"""
    }.mkString(",\n          ")
    s"""wt0 AS MATERIALIZED (
            SELECT w, count(*)::BIGINT AS cnt,
              -- coalesce: DuckDB's array_to_string([], sep) is NULL
              -- (Spark's concat_ws is '') — without it the EMPTY word
              -- type (real corpora: consecutive spaces, empty docs)
              -- silently vanishes from the vocabulary via
              -- replace(NULL)/unnest(NULL), diverging q131/q137
              '  ' || coalesce(array_to_string([w[i] for i in generate_series(1, len(w))], '  '), '') || '  ' AS s
            FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            GROUP BY w),
          $rounds"""
  }

  val defs: Seq[QueryDef] = Seq(

    // Cross-document duplicated-chunk removal — the C4/RefinedWeb
    // "remove repeated paragraphs corpus-wide, keep first occurrence"
    // pass. Docs are cut into consecutive 10-token chunks; a chunk
    // survives iff it is the FIRST occurrence corpus-wide in
    // (doc_id, idx) order. Per doc we emit total/kept chunk counts
    // and the md5 of the surviving text (order-preserved reassembly).
    //
    // Scale: the keep-decision is argmin(doc_id, idx) PER CHUNK as an
    // AGGREGATE, not a window — min(struct) partially aggregates
    // map-side, so a boilerplate chunk repeated a billion times (the
    // exact workload this op models) collapses to one row per mapper
    // before the shuffle; a row_number window over the same key would
    // concentrate every copy of a hot chunk in one partition and sort
    // it. The winners join back on (doc_id, idx) — a unique,
    // skew-free key — and the reassembly aggregate re-partitions by
    // doc_id. Chunk text is re-derived on the probe side instead of
    // riding the dedup shuffle.
    QueryDef(
      "q75_chunk_dedup_corpus",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val nChunks = ceil(size(toks).cast("double") / 10.0).cast("int")
        // Materialized once: both the dedup aggregate and the probe
        // side read it (the minhashPairs signature-table pattern — at
        // production scale this is the chunk table you'd persist to
        // storage rather than tokenize the corpus twice).
        val chunks = graft.operators.Staged.parquet(s, s"q75chunks|$dir") {
          Tables.documents(s, dir)
            .select(col("doc_id"), toks.as("ws"), nChunks.as("nc"))
            .select(col("doc_id"),
              posexplode(expr(
                "transform(sequence(0, nc - 1), i -> array_join(slice(ws, i * 10 + 1, 10), ' '))")))
            .withColumnsRenamed(Map("pos" -> "idx", "col" -> "chunk"))
        }
        val winners = chunks
          .groupBy(col("chunk"))
          .agg(min(struct(col("doc_id"), col("idx"))).as("first"))
          .select(col("first.doc_id").as("doc_id"), col("first.idx").as("idx"),
            lit(true).as("kept"))
        val kept = array_sort(collect_list(struct(col("idx"), col("kept"), col("chunk"))))
        chunks
          .join(winners, Seq("doc_id", "idx"), "left")
          .withColumn("kept", coalesce(col("kept"), lit(false)))
          .groupBy(col("doc_id"))
          .agg(
            count(lit(1)).as("n_chunks"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            md5(array_join(
              transform(filter(kept, c => c.getField("kept")), c => c.getField("chunk")),
              " ")).as("kept_fp"))
          .orderBy(col("doc_id"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              c AS (
                SELECT doc_id, g.i AS idx,
                  array_to_string(array_slice(ws, 10 * g.i + 1, 10 * g.i + 10), ' ') AS chunk
                FROM t, LATERAL (SELECT unnest(generate_series(0,
                  CAST(ceil(len(ws) / 10.0) AS INT) - 1)) AS i) g),
              f AS (
                SELECT doc_id, idx, chunk,
                  row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx) = 1 AS kept
                FROM c)
              SELECT doc_id,
                count(*)::BIGINT AS n_chunks,
                sum(CASE WHEN kept THEN 1 ELSE 0 END)::BIGINT AS n_kept,
                md5(coalesce(string_agg(CASE WHEN kept THEN chunk END, ' ' ORDER BY idx), ''))
                  AS kept_fp
              FROM f GROUP BY doc_id ORDER BY doc_id"""),
    ),

    // Stratified deterministic sampling — per-language rates (the
    // domain-mixture knob of a training-data pipeline: oversample en,
    // downsample the tail). Same md5-bucket mechanism as q65 (pure
    // function of doc_id → reproducible on any engine/partitioning),
    // but the keep-threshold is a per-stratum map lookup with a
    // default. Narrow per-row map, zero shuffles before the sort.
    QueryDef(
      "q76_stratified_sample",
      (s, dir) =>
        Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), strataBucket.as("bucket"),
            strataRate.as("rate"))
          .filter(col("bucket") < col("rate"))
          .orderBy(col("doc_id")),
      Some(s"""WITH b AS (
                 SELECT doc_id, lang,
                   $strataBucketSql AS bucket,
                   $strataRateSql AS rate
                 FROM documents)
               SELECT doc_id, lang, bucket, rate FROM b
               WHERE bucket < rate ORDER BY doc_id"""),
    ),

    // Domain-mixture rebalancing — hit a TARGET source mixture under a
    // fixed output budget (how pretraining corpora set their
    // web/books/code proportions): per-source quotas by
    // largest-remainder apportionment of the weighted target shares
    // (exact: quotas sum to the budget, ties broken deterministically),
    // then EXACT-k selection per source in deterministic md5 order.
    //
    // Scale: counts/weights/quotas are a ~|sources|-row table (windows
    // over it are aggregate-bounded, not corpus-bounded); the exact
    // per-source rank — the part that is naively a single-reducer
    // window per source — is PrefixSum.keyedRank over md5-prefix
    // buckets (monotone in the md5 sort order), so selection
    // distributes like q63. Deterministic on any engine/partitioning:
    // the pick order is md5(doc_id), no RNG state (the q65 contract).
    QueryDef(
      "q105_mixture_rebalance",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val budget = 203L
        val docs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"))
          .withColumn("h", md5(col("doc_id").cast("string")))
        // Target weight per source from its name (1..4 cycling) — a
        // stand-in for the user-supplied mixture map. A source the map
        // doesn't know (non-numeric suffix — the adversarial fixture's
        // 'srcadv') gets the DEFAULT weight 1, not an ANSI cast abort:
        // one unregistered source must not kill the whole mixture pass
        // (round-13 fixture finding; try_cast mirrored in the oracle).
        val weighted = docs.groupBy(col("source")).agg(count(lit(1)).as("cnt"))
          .withColumn("wt",
            expr("coalesce(try_cast(substring(source, 4) AS int) % 4 + 1, 1)")
              .cast("double"))
        val tw = weighted.agg(sum(col("wt")).as("tw"))
        val alloc = weighted.crossJoin(broadcast(tw))
          .withColumn("exact", lit(budget.toDouble) * col("wt") / col("tw"))
          .withColumn("base", floor(col("exact")).cast("long"))
          .withColumn("frac", col("exact") - floor(col("exact")))
        val rem = alloc.agg((lit(budget) - sum(col("base"))).cast("long").as("r"))
        val wRem = Window.orderBy(col("frac").desc, col("source")) // |sources| rows
        val quota = alloc.crossJoin(broadcast(rem))
          .withColumn("rn", row_number().over(wRem))
          .withColumn("quota", col("base") + when(col("rn") <= col("r"), 1L).otherwise(0L))
          .select(col("source"), least(col("quota"), col("cnt")).as("k"))
        val ranked = graft.operators.PrefixSum.keyedRank(
          docs.withColumn("hb", conv(substring(col("h"), 1, 2), 16, 10).cast("int")),
          key = Seq("source"), bucket = "hb",
          ord = Seq(col("h"), col("doc_id")),
          rankName = "rk", totalName = "n_src")
        ranked.join(broadcast(quota), Seq("source"))
          .filter(col("rk") <= col("k"))
          .select(col("source"), col("doc_id"), col("rk").as("pick_rank"))
          .orderBy(col("source"), col("pick_rank"))
      },
      Some("""WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
              w AS (SELECT source, cnt,
                      coalesce(try_cast(substr(source, 4) AS INT) % 4 + 1, 1)::DOUBLE AS wt
                    FROM c),
              tw AS (SELECT sum(wt) AS tw FROM w),
              alloc AS (
                SELECT source, cnt, wt,
                  floor(203.0 * wt / tw)::BIGINT AS base,
                  203.0 * wt / tw - floor(203.0 * wt / tw) AS frac
                FROM w, tw),
              rem AS (SELECT (203 - sum(base))::BIGINT AS r FROM alloc),
              quota AS (
                SELECT source, cnt,
                  base + CASE WHEN row_number() OVER (ORDER BY frac DESC, source)
                    <= (SELECT r FROM rem) THEN 1 ELSE 0 END AS q
                FROM alloc),
              k AS (SELECT source, least(q, cnt) AS k FROM quota),
              ranked AS (
                SELECT source, doc_id,
                  row_number() OVER (PARTITION BY source
                    ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
                FROM documents)
              SELECT r.source, r.doc_id, r.rk AS pick_rank
              FROM ranked r JOIN k USING (source)
              WHERE r.rk <= k.k
              ORDER BY r.source, r.rk"""),
    ),

    // Corpus-wide n-gram heavy hitters — top-50 word bigrams by
    // frequency (vocabulary/boilerplate audit; the exact-count
    // baseline a sketch would approximate). Shape: explode → ONE
    // HashAggregate with map-side partial counts (bigram cardinality
    // ≪ token count, so partials collapse hard) → TakeOrdered 50.
    // The total order (n DESC, ngram) makes the cut deterministic.
    QueryDef(
      "q77_ngram_heavy_hitters",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("toks", TextFns.tokens(col("text")))
          .select(explode(TextFns.shingleExpr("toks", 2)).as("ngram"))
          .groupBy(col("ngram"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("ngram"))
          .limit(50),
      Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
               g AS (SELECT unnest(${TextFns.shingleSql("ws", 2)}) AS ngram FROM t)
               SELECT ngram, count(*)::BIGINT AS n FROM g
               GROUP BY ngram ORDER BY n DESC, ngram LIMIT 50"""),
    ),

    // Bounded-memory heavy hitters — the Misra-Gries sketch
    // ([[graft.functions.MisraGriesAgg]], q77's O(k)-memory sibling)
    // surfaced as a driver-checkable query. Sketch CONTENTS are
    // arrival-order-dependent, but the guarantees are not: with k
    // counters over n items, every item with true count > n/k is
    // present, and each estimate e satisfies true − n/k ≤ e ≤ true
    // (Misra & Gries 1982; mergeable form Agarwal et al. 2013). So the
    // query emits, for every TRUE heavy hitter (exact count > n/k),
    // the exact count (hash-checked cross-engine) plus boolean
    // verdicts that the guarantee held; the oracle computes the same
    // exact heavy set and the verdicts theory proves must be 1 — any
    // violation flips a bit and fails the hash. Same verdict-banding
    // policy as q45's sketches. The stream is corpus CHARACTERS
    // (25 distinct vs k=16): unlike the near-uniform word/bigram
    // distributions of the synthetic corpus, characters are genuinely
    // skewed AND outnumber the counters, so the sketch actually
    // evicts — the regime the guarantee is about.
    //
    // Scale: the sketch is one typed partial aggregate — O(k) state
    // per partition, mergeable, no shuffle of raw items; the driver
    // holds ≤ k-1 (item, count) pairs. The exact side exists only to
    // VERIFY the sketch and pays the full groupBy; a production
    // frequent-items scan ships the sketch alone.
    QueryDef(
      "q91_heavy_hitters_sketch",
      (s, dir) => {
        import s.implicits._
        val SketchK = 16
        // Spark's regex split keeps a trailing "" per doc (Java
        // split(s, -1) semantics); DuckDB's char split does not —
        // drop empties so both engines stream identical items.
        // chars is NOT persisted: caching millions of single-char rows
        // costs more than re-running the codegen'd split/explode; the
        // 25-row exact table is what gets persisted.
        val chars = Tables.documents(s, dir)
          .select(explode(split(col("text"), "")).as("ch"))
          .filter(col("ch") =!= "")
        val sketch: Map[String, Long] = chars.as[String]
          .select(new graft.functions.MisraGriesAgg(SketchK).toColumn)
          .head()
        // staged ≤|alphabet|-row exact table (the total action and the
        // verdict projection both read it; re-running the char explode
        // per consumer is the cost the stage avoids)
        val exact = graft.operators.Staged.parquet(s, s"q91chars|$dir")(
          chars.groupBy(col("ch")).agg(count(lit(1)).as("n")))
        val total = exact.agg(sum(col("n"))).head().getLong(0)
        val thresh = total.toDouble / SketchK
        val est = element_at(typedLit(sketch), col("ch"))
        exact.filter(col("n") > lit(thresh))
          .select(col("ch"), col("n"),
            est.isNotNull.cast("int").as("in_sketch"),
            (est.isNotNull && est <= col("n") && est >= col("n") - lit(thresh))
              .cast("int").as("bounds_ok"))
          .orderBy(col("ch"))
      },
      Some("""WITH g AS (SELECT unnest(string_split(text, '')) AS ch FROM documents),
              c AS (SELECT ch, count(*)::BIGINT AS n FROM g GROUP BY ch),
              tot AS (SELECT sum(n)::DOUBLE AS total FROM c)
              SELECT ch, n, 1::INT AS in_sketch, 1::INT AS bounds_ok
              FROM c, tot WHERE n > total / 16
              ORDER BY ch"""),
    ),

    // Bloom-filter decontamination — the FIXED-SIZE form of q64's
    // benchmark-overlap scan. q64 broadcasts the benchmark's raw
    // shingle set, which works while that set is small; the production
    // decontamination suite (every benchmark ever published) can be
    // billions of shingles, and the Bloom form caps what ships to
    // executors at M bits NO MATTER how big the benchmark grows —
    // false positives only (a flagged doc gets the exact recheck),
    // never false negatives (contamination cannot slip through).
    //
    // Everything is engine-portable arithmetic: position i of shingle
    // s is md5("<i>|"+s) hex → 48-bit int → mod M (the established
    // TextFns md5 idiom), so the DuckDB oracle computes bit-identical
    // positions and the membership answers — including which false
    // positives occur — match EXACTLY, no tolerance banding needed.
    // The Spark side tests the REAL packed form (array<long> literal +
    // element_at/&/shiftleft — all codegen'd built-ins, no UDF); the
    // oracle's positions-in-set formulation is semantically identical
    // by construction (bitmap bit p set ⟺ p ∈ positions).
    //
    // Scale: the bitmap builds in one partial-agg'd distinct over
    // benchmark positions and collapses to M/8 = 2 KiB of driver
    // state; the corpus side is a narrow per-row projection against
    // the broadcast literal — no join, no shuffle of corpus text. The
    // exact-side join here exists only to VERIFY the no-false-negative
    // law; production ships the bitmap alone.
    QueryDef(
      "q92_bloom_decontamination",
      (s, dir) => {
        val M = 16384 // bits (2 KiB packed); ~220 bench shingles, K=3
        val W = M / 64 //   → FP rate ≈ (1-e^(-K·n/M))^K ≈ 2e-5 here
        val K = 3
        def posSpark(i: Int) =
          s"pmod(cast(conv(substring(md5(concat('$i|', sh)), 1, 12), 16, 10) as bigint), $M)"
        val sh = Tables.documents(s, dir)
          .withColumn("toks", TextFns.tokens(col("text")))
          .select(col("doc_id"),
            explode(array_distinct(TextFns.shingleExpr("toks", 3))).as("sh"))
        // staged benchmark shingle set (bounded): the bitmap collect
        // and the exact-recheck broadcast both read it
        val benchSh = graft.operators.Staged.parquet(s, s"q92bench|$dir")(
          sh.filter(col("doc_id") < 5).select(col("sh")).distinct())
        val bits = benchSh
          .select(explode(array((0 until K).map(i => expr(posSpark(i))): _*)).as("p"))
          .distinct().collect().map(_.getLong(0)) // ≤ M values — bounded
        val bm = new Array[Long](W)
        bits.foreach(p => bm((p / 64).toInt) |= (1L << (p % 64).toInt))
        def hitExpr(i: Int) = {
          val p = posSpark(i)
          s"((element_at(bm, cast($p div 64 as int) + 1) & shiftleft(cast(1 as bigint), cast($p % 64 as int))) != 0)"
        }
        sh.filter(col("doc_id") >= 5)
          .withColumn("bm", typedLit(bm.toSeq))
          .join(broadcast(benchSh.withColumn("exact", lit(true))), Seq("sh"), "left")
          .select(col("doc_id"),
            expr((0 until K).map(hitExpr).mkString(" AND ")).as("b"),
            coalesce(col("exact"), lit(false)).as("e"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_shingles"),
            sum(col("b").cast("long")).as("n_bloom_hits"),
            sum(col("e").cast("long")).as("n_exact_hits"),
            sum((col("b") && !col("e")).cast("long")).as("n_false_pos"),
            sum((col("e") && !col("b")).cast("long")).as("n_false_neg"))
          .orderBy(col("doc_id"))
      },
      Some {
        val M = 16384
        val K = 3
        def posSql(i: Int) = s"(('0x' || substr(md5('$i|' || s), 1, 12))::BIGINT % $M)"
        s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            sh AS (SELECT DISTINCT doc_id, s FROM
                     (SELECT doc_id, unnest(${TextFns.shingleSql("ws", 3)}) AS s FROM t)),
            bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 5),
            bits AS (SELECT DISTINCT p FROM bench,
                       UNNEST([${(0 until K).map(posSql).mkString(", ")}]) AS u(p)),
            f AS (SELECT doc_id,
                    (${(0 until K).map(i => s"${posSql(i)} IN (SELECT p FROM bits)").mkString(" AND ")}) AS b,
                    s IN (SELECT s FROM bench) AS e
                  FROM sh WHERE doc_id >= 5)
            SELECT doc_id, count(*)::BIGINT AS n_shingles,
              sum(b::INT)::BIGINT AS n_bloom_hits,
              sum(e::INT)::BIGINT AS n_exact_hits,
              sum((b AND NOT e)::INT)::BIGINT AS n_false_pos,
              sum((e AND NOT b)::INT)::BIGINT AS n_false_neg
            FROM f GROUP BY doc_id ORDER BY doc_id"""
      },
    ),

    // Overlapping sequence windows — cutting documents into
    // fixed-size training sequences (window 32 tokens, stride 16,
    // short tail merged into the last window; short docs → one
    // window). The per-window fingerprint is what a packing stage
    // downstream would dedup/shard on. Pure per-row flatMap: no
    // exchange at all before the output sort, pipelines into the scan
    // at any corpus size.
    QueryDef(
      "q78_sequence_windows",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val n = size(toks)
        val nWin = when(n <= 32, lit(1))
          .otherwise(ceil((n - lit(32)).cast("double") / 16.0).cast("int") + 1)
        Tables.documents(s, dir)
          .select(col("doc_id"), toks.as("ws"), n.as("n"), nWin.as("nw"))
          .select(col("doc_id"), col("n"),
            posexplode(expr(
              "transform(sequence(0, nw - 1), i -> array_join(slice(ws, i * 16 + 1, 32), ' '))")))
          .select(col("doc_id"), col("pos").as("win_idx"),
            // |slice(ws, 16i+1, 32)| = min(32, n - 16i): derived, not
            // re-counted by re-splitting the joined window string.
            least(lit(32), col("n") - col("pos") * 16).as("n_win_tokens"),
            md5(col("col")).as("win_fp"))
          .orderBy(col("doc_id"), col("win_idx"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
              w AS (
                SELECT doc_id, g.i AS win_idx,
                  array_slice(ws, 16 * g.i + 1, 16 * g.i + 32) AS win
                FROM t, LATERAL (SELECT unnest(generate_series(0,
                  CASE WHEN len(ws) <= 32 THEN 0
                       ELSE CAST(ceil((len(ws) - 32) / 16.0) AS INT) END)) AS i) g)
              SELECT doc_id, win_idx,
                len(win)::BIGINT AS n_win_tokens,
                md5(array_to_string(win, ' ')) AS win_fp
              FROM w ORDER BY doc_id, win_idx"""),
    ),

    // Per-document contamination gate — q64's scan turned into the
    // decision a pipeline actually ships: fraction of each corpus
    // doc's DISTINCT 5-shingles that appear in the benchmark set
    // (docs 0-4), keeping docs at or under 10% overlap. The 10% gate
    // is integer math (10·hits ≤ shingles) so no float threshold can
    // diverge between engines. Shape: benchmark shingles broadcast;
    // the corpus explodes once, left-joins the broadcast, and
    // aggregates per doc — one corpus pass, no self-join, the same
    // 100 TB posture as q64.
    QueryDef(
      "q79_contamination_gate",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
          .withColumn("toks", TextFns.tokens(col("text")))
        val benchSh = docs.filter(col("doc_id") < 5)
          .select(explode(array_distinct(TextFns.shingleExpr("toks", 5))).as("sh"))
          .distinct().withColumn("hit", lit(1))
        contaminationSurvivors(docs.filter(col("doc_id") >= 5), benchSh)
          .select(col("doc_id"), col("n_sh").as("n_shingles"), col("n_hit"),
            Num.fround(col("n_hit").cast("double") / col("n_sh"), 4).as("hit_frac"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
               sh AS (SELECT doc_id,
                        unnest(list_distinct(${TextFns.shingleSql("ws", 5)})) AS s
                      FROM t),
               bench AS (SELECT DISTINCT s FROM sh WHERE doc_id < 5),
               per AS (
                 SELECT doc_id, count(*) AS n_shingles,
                   sum(CASE WHEN s IN (SELECT s FROM bench) THEN 1 ELSE 0 END) AS n_hit
                 FROM sh WHERE doc_id >= 5 GROUP BY doc_id)
               SELECT doc_id, n_shingles::BIGINT AS n_shingles, n_hit::BIGINT AS n_hit,
                 ${Num.froundSql("n_hit / n_shingles::DOUBLE", 4)} AS hit_frac
               FROM per WHERE n_hit * 10 <= n_shingles ORDER BY doc_id"""),
    ),

    // Gopher-style rule filter — the published hard-threshold quality
    // rules (Rae et al. 2021 §A1.1 shape): word-count band, mean word
    // length band, duplicate 2-/3-gram fraction caps, minimum
    // stop-word coverage. Emits every metric plus the keep verdict so
    // the filter is auditable. Everything is counting + rational
    // arithmetic (no libm), and the whole query is a narrow per-row
    // map — the cheapest possible 100 TB pass.
    QueryDef(
      "q80_gopher_rules",
      (s, dir) =>
        Tables.documents(s, dir)
          .withColumn("toks", split(col("text"), " "))
          .select(col("doc_id"), size(col("toks")).as("n_words"),
            gopherMeanLen.as("mean_word_len"),
            gopherDupFrac(2).as("dup_2gram_frac"),
            gopherDupFrac(3).as("dup_3gram_frac"),
            gopherStopHits.as("stop_hits"))
          .withColumn("keep", gopherVerdict(col("n_words"), col("mean_word_len"),
            col("dup_2gram_frac"), col("dup_3gram_frac"), col("stop_hits")))
          .orderBy(col("doc_id")),
      Some(
        s"""WITH t AS (SELECT doc_id, text, string_split(text, ' ') AS ws FROM documents),
            m AS (
              SELECT doc_id, len(ws) AS n_words,
                $gopherMeanLenSql AS mean_word_len,
                ${gopherDupSql(2)} AS dup_2gram_frac,
                ${gopherDupSql(3)} AS dup_3gram_frac,
                $gopherStopHitsSql AS stop_hits
              FROM t)
            SELECT doc_id, n_words, mean_word_len, dup_2gram_frac, dup_3gram_frac,
              stop_hits,
              ${gopherVerdictSql("n_words", "mean_word_len", "dup_2gram_frac",
          "dup_3gram_frac", "stop_hits")} AS keep
            FROM m ORDER BY doc_id"""),
    ),

    // Cross-document sequence packing — the actual training-prep cut:
    // concatenate each language's docs (deterministic doc_id order)
    // into one token stream and emit fixed 32-token sequences, with
    // doc-boundary attribution (how many docs feed each sequence).
    // Complements q66 (whole-doc shard budgeting) and q78 (within-doc
    // windows): here sequences CROSS doc boundaries, which is what a
    // packed pretraining shard really looks like.
    //
    // Scale: doc offsets are a DISTRIBUTED prefix sum (sqrt-scaled
    // doc_id buckets + broadcast offset table — PrefixSum; the naive
    // per-language cumsum window was round 4's single-reducer
    // finding); the token explode shuffles by (lang, seq_idx) whose
    // groups are exactly 32 tokens — bounded fan-in, key space grows
    // linearly with corpus tokens, nothing concentrates. That
    // token-granular exchange is the honest cost of producing
    // token-packed output.
    QueryDef(
      "q81_sequence_packing",
      (s, dir) => {
        val toks = split(col("text"), " ")
        val base = Tables.documents(s, dir)
          .select(col("doc_id"), col("lang"), toks.as("ws"), size(toks).cast("long").as("n"))
        val mx = base.agg(max(col("doc_id")).as("__mx"))
        val bucketed = base.crossJoin(broadcast(mx))
          .withColumn("db",
            floor(col("doc_id") / graft.operators.PrefixSum.sqrtWidth(col("__mx"))).cast("long"))
          .drop("__mx")
        val withOff = graft.operators.PrefixSum.keyedCumSum(
          bucketed, key = Seq("lang"), bucket = "db",
          ord = Seq(col("doc_id")), value = col("n"), cumName = "cumn")
          .withColumn("off", col("cumn") - col("n"))
        // ONE collect_list aggregate per 32-token group; n_tokens /
        // n_docs / fp all derive from it post-agg. Mixing countDistinct
        // with other aggregates would plan an Expand duplicating every
        // token row per aggregate family at the exchange (the q45
        // lesson) — here the group is ≤32 rows, so deriving from the
        // collected structs is strictly cheaper than a second family.
        val seq = array_sort(collect_list(struct(col("gpos"), col("tok"), col("doc_id"))))
        withOff
          .select(col("doc_id"), col("lang"), col("off"), posexplode(col("ws")))
          .select(col("doc_id"), col("lang"),
            (col("off") + col("pos")).as("gpos"), col("col").as("tok"))
          .withColumn("seq_idx", floor(col("gpos") / 32).cast("long"))
          .groupBy(col("lang"), col("seq_idx"))
          .agg(seq.as("seq"))
          .select(col("lang"), col("seq_idx"),
            size(col("seq")).cast("long").as("n_tokens"),
            size(array_distinct(expr("transform(seq, t -> t.doc_id)"))).cast("long").as("n_docs"),
            md5(array_join(expr("transform(seq, t -> t.tok)"), " ")).as("seq_fp"))
          .orderBy(col("lang"), col("seq_idx"))
      },
      Some("""WITH t AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
              o AS (
                SELECT doc_id, lang, ws,
                  sum(len(ws)) OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - len(ws) AS off
                FROM t),
              tok AS (
                SELECT lang, doc_id, off + u.i - 1 AS gpos, ws[u.i] AS tok
                FROM o, LATERAL (SELECT unnest(generate_series(1, len(ws))) AS i) u)
              SELECT lang, CAST(floor(gpos / 32.0) AS BIGINT) AS seq_idx,
                count(*)::BIGINT AS n_tokens,
                count(DISTINCT doc_id)::BIGINT AS n_docs,
                md5(string_agg(tok, ' ' ORDER BY gpos)) AS seq_fp
              FROM tok GROUP BY lang, seq_idx
              ORDER BY lang, seq_idx"""),
    ),

    // Repeated-substring detection — the exact-substring dedup core
    // (Lee et al. 2021 run suffix arrays on one machine; the
    // Spark-native equivalent is stride-1 sliding 20-token spans
    // hash-grouped across the corpus). Unlike q75's fixed chunk
    // boundaries, sliding spans catch duplicated passages at ANY
    // offset. Emits every span occurring ≥ 2 times with its count
    // and first location.
    //
    // Scale: one row per corpus token, but each row ships only
    // (md5, packed long) — 24 bytes — to a count/min aggregate with
    // map-side partials; span text never crosses the wire. The first
    // location is an arithmetic min over doc_id*2^20+pos (pos < 2^20
    // by corpus contract), identical in both engines — no struct-min
    // portability concern. Docs shorter than the 20-token window have
    // no spans by definition.
    QueryDef(
      "q83_repeated_substrings",
      (s, dir) => {
        val toks = split(col("text"), " ")
        Tables.documents(s, dir)
          .select(col("doc_id"), toks.as("ws"))
          .filter(size(col("ws")) >= 20)
          .select(col("doc_id"),
            posexplode(expr(
              "transform(sequence(0, size(ws) - 20), p -> md5(array_join(slice(ws, p + 1, 20), ' ')))")))
          .select(col("col").as("span_fp"),
            (col("doc_id") * 1048576L + col("pos")).as("packed"))
          .groupBy(col("span_fp"))
          .agg(count(lit(1)).as("n_occurrences"), min(col("packed")).as("first"))
          .filter(col("n_occurrences") >= 2)
          .select(col("span_fp"), col("n_occurrences"),
            expr("first div 1048576").as("first_doc"),
            (col("first") % 1048576L).as("first_pos"))
          .orderBy(col("span_fp"))
      },
      Some("""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
                         WHERE len(string_split(text, ' ')) >= 20),
              sp AS (
                SELECT doc_id, g.p AS pos,
                  md5(array_to_string(array_slice(ws, g.p + 1, g.p + 20), ' ')) AS span_fp
                FROM t, LATERAL (SELECT unnest(generate_series(0, len(ws) - 20)) AS p) g),
              agg AS (
                SELECT span_fp, count(*) AS n_occurrences,
                  min(doc_id * 1048576 + pos) AS first
                FROM sp GROUP BY span_fp)
              SELECT span_fp, n_occurrences::BIGINT AS n_occurrences,
                (first // 1048576)::BIGINT AS first_doc,
                (first % 1048576)::BIGINT AS first_pos
              FROM agg WHERE n_occurrences >= 2 ORDER BY span_fp"""),
    ),

    // The curation pipeline END-TO-END — what a user of this engine
    // actually runs before training: Gopher rule filter (q80) →
    // exact dedup first-seen-wins (q28) → benchmark-contamination
    // gate (q79) → stratified sampling (q76) → per-language stream
    // assembly for packing (q81's input). Each stage is the exact
    // logic of its standalone query; the output is per-language
    // survivor counts, token totals, the 32-token sequence count the
    // packer would emit, and the md5 of the full concatenated token
    // stream — one hash over everything every stage decided, so ANY
    // divergence anywhere in the chain fails the oracle.
    //
    // Scale: the chain is filter → dedup-aggregate (map-side
    // partials, unique-key re-join) → broadcast-set gate → per-row
    // sample → per-lang aggregate. No stage introduces a shape not
    // already argued scale-safe on its standalone query.
    QueryDef(
      "q84_curation_pipeline",
      (s, dir) => {
        val raw = Tables.documents(s, dir)
          .withColumn("toks", split(col("text"), " "))
        // Stage 1+2a: Gopher rules (the SHARED gopher* helpers — the
        // exact q80 verdict) + content fingerprint, computed ONCE and
        // staged narrow (doc_id, lang, text, fp) THROUGH PARQUET: the
        // survivor table every later stage probes — without it the
        // lazy DAG re-runs the 2-/3-gram metric projection for each
        // downstream consumer (measured 11.6 s → the single evaluation
        // is ~2 s). Parquet, not memory persist: an evicted cache
        // under driver-env heap pressure silently becomes that full
        // recompute (the round-1 q25 incident); the stage cannot be
        // evicted and is what a pipeline would keep in storage anyway.
        val withFp = graft.operators.Staged.parquet(s, s"q84_survivors|$dir") {
          raw.filter(gopherKeepExpr)
            .select(col("doc_id"), col("lang"), col("text"),
              TextFns.fingerprint(col("text")).as("fp"))
        }
        // Stage 2b: exact dedup, first doc_id wins per fingerprint.
        val deduped = withFp.join(
          withFp.groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id")),
          Seq("fp", "doc_id"))
        // Stage 3: contamination gate vs the RAW benchmark docs (0-4)
        // — only those five docs are shingled for the broadcast set;
        // benchmark members themselves leave the corpus here.
        val benchSh = raw.filter(col("doc_id") < 5)
          .select(explode(array_distinct(TextFns.shingleExpr("toks", 5))).as("sh"))
          .distinct().withColumn("hit", lit(1))
        val gateKeep = contaminationSurvivors(
          deduped.filter(col("doc_id") >= 5)
            .withColumn("toks", split(col("text"), " ")),
          benchSh).select(col("doc_id"))
        val gated = deduped.join(gateKeep, Seq("doc_id"), "left_semi")
        // Stage 4: stratified deterministic sample (the SHARED q76
        // strata* helpers).
        val sampled = gated.filter(strataBucket < strataRate)
        // Stage 5: per-lang stream fingerprint — a MERKLE fold, not a
        // whole-language concat (round-4 finding: collect_list of the
        // full per-language survivor text is unbounded executor
        // memory). Level 1 fingerprints sqrt-scaled doc_id chunks
        // (buffer bounded by chunk width); level 2 hashes the ordered
        // chunk-hash list (bounded by chunk COUNT, 32 bytes each).
        // One md5 still catches a divergence in ANY earlier stage —
        // the DuckDB oracle mirrors the same fold exactly.
        // Chunk width derives from the RAW table's max doc_id (a
        // pruned one-column scan), not the survivor set — any
        // deterministic mirrored W works, and aggregating `sampled`
        // would re-run pipeline stages 2b-4 just to size the chunks.
        val nTokSurv = size(split(col("text"), " "))
        val mx5 = Tables.documents(s, dir).agg(max(col("doc_id")).as("__mx"))
        val chunked = sampled.crossJoin(broadcast(mx5))
          .withColumn("ck",
            floor(col("doc_id") / graft.operators.PrefixSum.sqrtWidth(col("__mx"))).cast("long"))
        val chunkStream = array_sort(collect_list(struct(col("doc_id"), col("text"))))
        val chunks = chunked.groupBy(col("lang"), col("ck"))
          .agg(count(lit(1)).as("c_docs"),
            sum(nTokSurv).cast("long").as("c_toks"),
            md5(array_join(transform(chunkStream, d => d.getField("text")), " ")).as("c_fp"))
        val fpList = array_sort(collect_list(struct(col("ck"), col("c_fp"))))
        chunks.groupBy(col("lang"))
          .agg(sum(col("c_docs")).cast("long").as("n_docs"),
            sum(col("c_toks")).cast("long").as("n_tokens"),
            ceil(sum(col("c_toks")).cast("double") / 32.0).cast("long").as("n_seqs"),
            md5(array_join(transform(fpList, x => x.getField("c_fp")), "")).as("stream_fp"))
          .orderBy(col("lang"))
      },
      Some(
        s"""WITH t AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ws FROM documents),
            g AS (
              SELECT * FROM t
              WHERE ${gopherVerdictSql("len(ws)", gopherMeanLenSql,
          gopherDupSql(2), gopherDupSql(3), gopherStopHitsSql)}),
            gf AS (SELECT *, ${TextFns.fingerprintSql} AS fp FROM g),
            d AS (
              SELECT gf.* FROM gf
              JOIN (SELECT fp, min(doc_id) AS doc_id FROM gf GROUP BY fp) w
                ON gf.fp = w.fp AND gf.doc_id = w.doc_id),
            allsh AS (SELECT doc_id, unnest(list_distinct(${TextFns.shingleSql("ws", 5)})) AS s FROM t),
            bench AS (SELECT DISTINCT s FROM allsh WHERE doc_id < 5),
            dsh AS (SELECT doc_id, unnest(list_distinct(${TextFns.shingleSql("ws", 5)})) AS s
                    FROM d WHERE doc_id >= 5),
            per AS (
              SELECT doc_id, count(*) AS n_sh,
                sum(CASE WHEN s IN (SELECT s FROM bench) THEN 1 ELSE 0 END) AS n_hit
              FROM dsh GROUP BY doc_id),
            gated AS (
              SELECT d.* FROM d
              JOIN (SELECT doc_id FROM per WHERE n_hit * 10 <= n_sh) k USING (doc_id)),
            sampled AS (
              SELECT * FROM gated
              WHERE $strataBucketSql < $strataRateSql),
            w5 AS (
              SELECT greatest(64, ceil(sqrt(max(doc_id) + 1))::BIGINT) AS w
              FROM documents),
            chunks AS (
              SELECT lang, doc_id // w AS ck,
                count(*) AS c_docs, sum(len(ws)) AS c_toks,
                md5(string_agg(text, ' ' ORDER BY doc_id)) AS c_fp
              FROM sampled, w5 GROUP BY lang, ck)
            SELECT lang, sum(c_docs)::BIGINT AS n_docs,
              sum(c_toks)::BIGINT AS n_tokens,
              ceil(sum(c_toks) / 32.0)::BIGINT AS n_seqs,
              md5(string_agg(c_fp, '' ORDER BY ck)) AS stream_fp
            FROM chunks GROUP BY lang ORDER BY lang"""),
    ),

    // Unigram-LM quality scoring — the CCNet-style "score each doc by
    // a language model trained on the corpus itself" pass, with the
    // simplest possible LM (corpus unigram MLE). Per doc: token count
    // and mean negative log-likelihood (low = in-distribution, high =
    // unusual/junk — the ranking signal CCNet buckets on). The LM here
    // is self-trained on the same corpus; in production it would be a
    // reference-corpus vocab table, same shapes.
    //
    // Scale: the vocab build is explode → HashAggregate with map-side
    // partials (vocab ≪ token count, partials collapse hard; a hot
    // stop word collapses to one partial row per mapper BEFORE the
    // exchange, so the build is skew-safe by shape); the grand total
    // is a 1-row broadcast. The score re-join is where skew bites:
    // token keys follow a Zipf law, so a single shuffle join on the
    // raw token would pile every "the" into one reducer at 100 TB.
    // The fix is STRUCTURAL, not an AQE config: the vocabulary is
    // split into a broadcast HEAD (exact top-HeadK tokens by count —
    // precisely the keys that are hot) and a shuffled TAIL. Hot
    // tokens join map-side against the broadcast head; the token
    // stream is head-filtered by a broadcast anti-join BEFORE the
    // tail shuffle, so no heavy key ever enters an exchange. The
    // tail's per-key cardinality is ≤ the head threshold count by
    // construction — bounded reducers, no salting needed.
    //
    // Determinism: p(w) = c/N is exact double division; ln may differ
    // by 1 ulp between libm implementations, which the 4dp fround
    // absorbs (error 1e-16 vs boundary width 5e-5). The head/tail
    // split is output-invariant (every token still meets its exact
    // (c, N)), so the oracle needs no mirror of the split.
    QueryDef(
      "q87_unigram_lm_score",
      (s, dir) => unigramScored(s, dir).orderBy(col("doc_id")),
      Some(s"""WITH tok AS (
                 SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
               vocab AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
               tot AS (SELECT sum(c)::DOUBLE AS n FROM vocab)
               SELECT doc_id, count(*)::BIGINT AS n_tokens,
                 ${Num.froundSql("avg(-ln(c::DOUBLE / n))", 4)} AS avg_nll
               FROM tok JOIN vocab USING (w), tot
               GROUP BY doc_id ORDER BY doc_id"""),
    ),

    // Min-K% Prob membership audit (Shi et al. 2023, "Detecting
    // Pretraining Data from Large Language Models"): per document,
    // the mean NLL of its k%=20 LEAST-LIKELY tokens under the corpus
    // LM — the published membership-inference statistic. A document
    // the model has memorized scores low even on its rarest tokens;
    // the full-doc mean (q87) washes that signal out with the easy
    // tokens, which is exactly why the paper truncates to the min-k
    // tail. Here the LM is the same corpus-unigram MLE q87 scores
    // with (shared staged vocab artifact); in production the vocab
    // table comes from the audited model's training corpus.
    //
    // Determinism (the q183 lesson applied): per-token NLL is
    // e4-quantized to a BIGINT the moment it exists (floor(x·10⁴+0.5)
    // — pure IEEE, identical cross-engine; -ln(c/N) ≥ 0 so no NaN/sign
    // traps), the min-k selection ranks by the QUANTIZED value (w
    // tiebreak — a 1-ulp ln flip can't reorder the boundary), the
    // selected multiset sums EXACTLY as integers (order-free), and
    // one division at the end produces the score. k-of-n is integer
    // arithmetic: m = ceil(n/5) = (n+4) div 5 — no 0.2 double.
    //
    // Scale: the vocab join reuses q87's head/tail discipline (hot
    // Zipf keys never enter an exchange); the per-doc rank window
    // partitions by doc_id — per-partition rows bounded by document
    // length, key space grows with the corpus. One token-granular
    // exchange, the honest cost of a per-token statistic.
    QueryDef(
      "q185_minkprob_membership",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val HeadK = 16
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val vocab = graft.operators.Staged.parquet(s, s"q87vocab|$dir")(
          toks.groupBy(col("w")).agg(count(lit(1)).as("c")))
        val head = vocab.orderBy(col("c").desc, col("w")).limit(HeadK)
        val tail = vocab.join(broadcast(head.select(col("w"))), Seq("w"), "left_anti")
        val total = vocab.agg(sum(col("c")).cast("double").as("n"))
        val scoredHead = toks.join(broadcast(head), Seq("w"))
        val scoredTail = toks
          .join(broadcast(head.select(col("w"))), Seq("w"), "left_anti")
          .join(tail, Seq("w"))
        val nll4 = expr(
          "cast(floor(-ln(cast(c as double) / n) * 10000D + 0.5D) as bigint)")
        val wDoc = Window.partitionBy(col("doc_id"))
        val wRank = wDoc.orderBy(col("nll4").desc, col("w"))
        scoredHead.unionByName(scoredTail)
          .crossJoin(broadcast(total))
          .select(col("doc_id"), col("w"), nll4.as("nll4"))
          .withColumn("rn", row_number().over(wRank))
          .withColumn("n", count(lit(1)).over(wDoc))
          .filter(col("rn") <= expr("(n + 4) div 5"))
          .groupBy(col("doc_id"))
          .agg(max(col("n")).as("n_tokens"),
            count(lit(1)).as("m"),
            Num.fround(
              sum(col("nll4")).cast("double") / (count(lit(1)) * lit(10000.0)), 4)
              .as("mink20_nll"))
          .orderBy(col("doc_id"))
      },
      Some(s"""WITH tok AS (
                 SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
               vocab AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
               tot AS (SELECT sum(c)::DOUBLE AS n FROM vocab),
               scored AS (
                 SELECT doc_id, w,
                   floor(-ln(c::DOUBLE / n) * 10000 + 0.5)::BIGINT AS nll4
                 FROM tok JOIN vocab USING (w), tot),
               sel AS (
                 SELECT doc_id, nll4,
                   row_number() OVER (PARTITION BY doc_id ORDER BY nll4 DESC, w) AS rn,
                   count(*) OVER (PARTITION BY doc_id) AS n
                 FROM scored)
               SELECT doc_id, max(n)::BIGINT AS n_tokens, count(*)::BIGINT AS m,
                 ${Num.froundSql("sum(nll4)::DOUBLE / (count(*) * 10000.0)", 4)} AS mink20_nll
               FROM sel WHERE rn <= (n + 4) // 5
               GROUP BY doc_id ORDER BY doc_id"""),
    ),

    // Per-source token-distribution drift — the TEXT-side twin of
    // q142's embedding drift monitor: Jensen-Shannon divergence of
    // each source's unigram distribution against the whole corpus
    // (the "did this scraper/source change what it emits" check a
    // production pipeline runs between snapshots; a source whose JSD
    // jumps is re-audited before it trains). JSD over KL because it
    // is symmetric, bounded by ln 2, and defined when a corpus token
    // is absent from the source.
    //
    // Decomposition: JSD_s = Σ_{w∈s} t(w) + ½·ln2, with t(w) =
    // ½·[p·ln(2p/(p+q)) + q·ln(2q/(p+q)) − q·ln2] — every token the
    // source LACKS contributes exactly ½·q·ln2, so the lack-sum folds
    // into the closed form via the coverage Σq. Per-token terms are
    // e9-quantized to BIGINT the moment they exist and summed exactly
    // (the q183/q185 fp-order discipline: a Σ of thousands of doubles
    // in engine-dependent order WILL flip a rounding boundary), one
    // division + the ½ln2 shift at the end (1-ulp libm ln differences
    // absorbed by 6dp fround).
    //
    // Scale: per-(source, w) counts collapse map-side (the q87 vocab
    // shape — a hot stop word is one partial row per mapper before
    // the exchange); the corpus count c_w comes from a window over
    // the AGGREGATE keyed on w (partition rows ≤ #sources — no vocab
    // join, no Zipf key in any exchange); source totals and the
    // grand total are dim-sized broadcasts.
    QueryDef(
      "q189_source_token_drift",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), explode(split(col("text"), " ")).as("w"))
        val sw = toks.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c_s"))
        val cw = sw.withColumn("c", sum(col("c_s")).over(Window.partitionBy(col("w"))))
        // two separate tiny aggregates, NOT count+countDistinct in one
        // (mixed-distinct plans an Expand duplicating every token row —
        // the q45 lesson); doc counts come off the doc table directly
        val nS = toks.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
          .join(Tables.documents(s, dir).groupBy(col("source"))
            .agg(count(lit(1)).as("n_docs")), Seq("source"))
        val nTot = toks.agg(count(lit(1)).cast("double").as("n"))
        val p = col("c_s").cast("double") / col("n_s")
        val q = col("c").cast("double") / col("n")
        val term = (p * log(lit(2d) * p / (p + q)) +
          q * log(lit(2d) * q / (p + q)) - q * log(lit(2d))) / 2d
        cw.join(broadcast(nS), Seq("source"))
          .crossJoin(broadcast(nTot))
          .select(col("source"), col("n_docs"), col("n_s"),
            floor(term * 1e9 + lit(0.5)).cast("long").as("t9"),
            floor(q * 1e9 + lit(0.5)).cast("long").as("q9"))
          .groupBy(col("source"))
          .agg(first(col("n_docs")).as("n_docs"),
            first(col("n_s")).as("n_tokens"),
            Num.fround(sum(col("q9")).cast("double") / 1e9, 6).as("coverage"),
            Num.fround(sum(col("t9")).cast("double") / 1e9 + log(lit(2d)) / 2d, 6)
              .as("jsd"))
          .orderBy(col("source"))
      },
      Some(s"""WITH tok AS (
                 SELECT doc_id, source, unnest(string_split(text, ' ')) AS w
                 FROM documents),
               sw AS (SELECT source, w, count(*) AS c_s FROM tok GROUP BY source, w),
               cw AS (SELECT source, w, c_s,
                        sum(c_s) OVER (PARTITION BY w) AS c FROM sw),
               ns AS (SELECT tk.source, tk.n_s, nd.n_docs FROM
                        (SELECT source, count(*) AS n_s FROM tok GROUP BY source) tk
                        JOIN (SELECT source, count(*) AS n_docs FROM documents GROUP BY source) nd
                        USING (source)),
               nt AS (SELECT count(*)::DOUBLE AS n FROM tok),
               terms AS (
                 SELECT cw.source, ns.n_docs, ns.n_s,
                   floor(((c_s::DOUBLE / n_s) * ln(2 * (c_s::DOUBLE / n_s) / (c_s::DOUBLE / n_s + c::DOUBLE / n))
                        + (c::DOUBLE / n) * ln(2 * (c::DOUBLE / n) / (c_s::DOUBLE / n_s + c::DOUBLE / n))
                        - (c::DOUBLE / n) * ln(2)) / 2 * 1000000000 + 0.5)::BIGINT AS t9,
                   floor((c::DOUBLE / n) * 1000000000 + 0.5)::BIGINT AS q9
                 FROM cw JOIN ns USING (source), nt)
               SELECT source, max(n_docs)::BIGINT AS n_docs, max(n_s)::BIGINT AS n_tokens,
                 ${Num.froundSql("sum(q9)::DOUBLE / 1000000000", 6)} AS coverage,
                 ${Num.froundSql("sum(t9)::DOUBLE / 1000000000 + ln(2) / 2", 6)} AS jsd
               FROM terms GROUP BY source ORDER BY source"""),
    ),

    // Vocabulary coverage curve — the tokenizer-SIZING decision q130's
    // BPE training presupposes: the smallest number of vocabulary
    // types whose cumulative frequency covers 90/95/99% of corpus
    // tokens (every tokenizer paper's "vocab size vs coverage" table;
    // the knee of this curve is where a deployment puts its vocab
    // budget, everything past it lands in the OOV/byte fallback q170
    // measures).
    //
    // Exactness: Zipf ranking never materializes per-type — the curve
    // is computed on the COUNT-OF-COUNTS table (the q168/q169 device:
    // one row per distinct frequency, bounded ~sqrt(tokens)), where
    // all types of equal frequency are interchangeable, so the exact
    // k within the boundary frequency group is integer arithmetic:
    // m = ceil((num·N − den·cum_before) / (den·c)) with the coverage
    // target as the rational num/den — no float threshold anywhere
    // near a comparison. Windows run over the bounded aggregate, the
    // grand total is a 1-row broadcast; no Zipf key enters an
    // exchange.
    QueryDef(
      "q193_vocab_coverage",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val toks = Tables.documents(s, dir)
          .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        val vocab = graft.operators.Staged.parquet(s, s"q87vocab|$dir")(
          toks.groupBy(col("w")).agg(count(lit(1)).as("c")))
        val cc = vocab.groupBy(col("c")).agg(count(lit(1)).as("n_types"))
        val wD = Window.orderBy(col("c").desc)
        val cum = cc
          .withColumn("cum_toks", sum(col("c") * col("n_types")).over(
            wD.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
          .withColumn("types_before", coalesce(sum(col("n_types")).over(
            wD.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .withColumn("cum_before", col("cum_toks") - col("c") * col("n_types"))
        val tot = vocab.agg(sum(col("c")).cast("long").as("n"))
        val rows = Seq((9L, 10L, "p90"), (19L, 20L, "p95"), (99L, 100L, "p99"))
          .map { case (num, den, nameT) =>
            // boundary group = FIRST (in c-desc order) whose cumulative
            // token mass reaches the target; cum_toks is monotone, so
            // that is the min cum_toks among qualifying groups
            cum.crossJoin(broadcast(tot))
              .filter(col("cum_toks") * den >= col("n") * num)
              .orderBy(col("cum_toks"))
              .limit(1)
              // integer ceil-division (`div`, not `/` — Spark's `/`
              // on longs is DOUBLE division)
              .withColumn("m", expr(
                s"($num * n - $den * cum_before + $den * c - 1) div ($den * c)"))
              .select(lit(nameT).as("target"),
                (col("types_before") + col("m")).as("k_types"),
                Num.fround(
                  (col("cum_before") + col("m") * col("c")).cast("double")
                    / col("n").cast("double"), 6).as("covered_share"),
                col("n").as("n_tokens"))
          }
        rows.reduce(_ unionByName _).orderBy(col("target"))
      },
      Some(s"""WITH tok AS (
                 SELECT unnest(string_split(text, ' ')) AS w FROM documents),
               vocab AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
               cc AS (SELECT c, count(*) AS n_types FROM vocab GROUP BY c),
               cum AS (
                 SELECT c, n_types,
                   sum(c * n_types) OVER (ORDER BY c DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_toks,
                   coalesce(sum(n_types) OVER (ORDER BY c DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT AS types_before
                 FROM cc),
               nn AS (SELECT sum(c)::BIGINT AS n FROM vocab),
               t(num, den, target) AS (VALUES (9, 10, 'p90'), (19, 20, 'p95'), (99, 100, 'p99')),
               b AS (
                 SELECT t.target, t.num, t.den, cum.c, cum.n_types, cum.types_before,
                   cum.cum_toks - cum.c * cum.n_types AS cum_before, nn.n,
                   row_number() OVER (PARTITION BY t.target ORDER BY cum.cum_toks) AS rn
                 FROM cum, nn, t
                 WHERE cum.cum_toks * t.den >= t.num * nn.n),
               sel AS (
                 SELECT target, types_before, cum_before, c, n,
                   (num * n - den * cum_before + den * c - 1) // (den * c) AS m
                 FROM b WHERE rn = 1)
               SELECT target,
                 (types_before + m)::BIGINT AS k_types,
                 ${Num.froundSql("(cum_before + m * c)::DOUBLE / n", 6)} AS covered_share,
                 n AS n_tokens
               FROM sel ORDER BY target"""),
    ),

    // Deterministic training shuffle + sharding — the last step a
    // curation pipeline runs before writing training shards: a global
    // RNG-free permutation (md5 order key, the q65 house pattern) cut
    // into N shards, each doc with its shard id, exact within-shard
    // position, and the shard's total for balance checks. A trainer
    // resumes mid-epoch from (shard, pos); determinism makes the
    // permutation reproducible across reruns and engines.
    //
    // Scale shape: shard assignment is a NARROW MAP (md5 bits — no
    // exchange); within-shard positions come from PrefixSum.keyedRank
    // (local window per (shard, hex-prefix bucket) + tiny offset
    // table), never a whole-shard window — the per-task row bound is
    // corpus/(shards·4096) regardless of corpus size. At 100 TB the
    // writer follows with repartitionByRange(shard, pos) → one sorted
    // parquet file per shard; the ORDER BY here is that presentation
    // sort. Shard bits (hex 29-32) and order bits (hex 1-12 via the
    // bucket prefix + full-u tiebreak) come from DISJOINT digest
    // regions, so shard membership and within-shard order are
    // independent — the property that keeps every shard an unbiased
    // sample of the corpus (what makes per-shard loss curves
    // comparable during training).
    QueryDef(
      "q117_training_shuffle_shards",
      (s, dir) => {
        val NShards = 16
        val d = Tables.documents(s, dir)
          .select(col("doc_id"),
            md5(concat(lit("shuf|"), col("doc_id").cast("string"))).as("u"))
          .withColumn("shard",
            expr(s"cast(conv(substring(u, 29, 4), 16, 10) as int) % $NShards"))
          .withColumn("ub", expr("cast(conv(substring(u, 1, 3), 16, 10) as int)"))
        graft.operators.PrefixSum.keyedRank(
            d, key = Seq("shard"), bucket = "ub",
            ord = Seq(col("u"), col("doc_id")),
            rankName = "pos", totalName = "n_in_shard",
            persistProjection = false)
          .select(col("shard"), col("doc_id"), col("pos"), col("n_in_shard"))
          .orderBy(col("shard"), col("pos"))
      },
      Some("""WITH d AS (
                SELECT doc_id, md5('shuf|' || doc_id::VARCHAR) AS u FROM documents),
              sh AS (
                SELECT doc_id, u,
                  ('0x' || substr(u, 29, 4))::INT % 16 AS shard FROM d)
              SELECT shard, doc_id,
                row_number() OVER (PARTITION BY shard ORDER BY u, doc_id) AS pos,
                count(*) OVER (PARTITION BY shard)::BIGINT AS n_in_shard
              FROM sh ORDER BY shard, pos"""),
    ),

    // DSIR-style hashed-n-gram importance selection (Xie et al.,
    // "Data Selection for Language Models via Importance Resampling",
    // NeurIPS 2023): score every candidate document by how much its
    // hashed-bigram distribution looks like a TARGET domain vs the
    // raw pool, then keep the top scorers. Target here is a fixed
    // source allowlist (stand-in for "Wikipedia+books" in the paper);
    // features are bigrams hashed into B=256 buckets (the paper's
    // 10^4-bucket trick at test-vocab scale); per-bucket weight is
    // the Laplace-smoothed log-likelihood ratio
    // ln p̂_tgt(h) − ln p̂_raw(h), and a document's score is the MEAN
    // weight over its bigram occurrences (mean, not sum, so score is
    // length-invariant). Complements q87 (in-distribution LM score —
    // "is this fluent?") with the cross-domain axis ("is this the
    // domain I want more of?").
    //
    // Scale shape: the feature map is a narrow explode (no exchange);
    // the bucket histogram is a 256-key HashAggregate with map-side
    // partials (hot buckets collapse per-mapper BEFORE the exchange —
    // the bucket space is the skew absorber, same structural move as
    // q87's head/tail vocab); the weight table is 256 rows × 1 double
    // — broadcast, so scoring is explode → map-side broadcast join →
    // per-doc partial agg. One doc-keyed exchange total, nothing
    // keyed by a Zipf token. At 100 TB the weight table would be
    // trained ONCE on a sample and persisted (the paper trains on a
    // held-out slice); self-training it in-query costs one extra
    // corpus scan here but changes no shape.
    //
    // Determinism: counts are exact integers; (c+0.5)/(N+128) is one
    // correctly-rounded IEEE division per engine; ln's cross-libm
    // 1-ulp noise is absorbed by the 4dp fround on the mean (error
    // ~1e-15 vs boundary width 5e-5 — the q87 argument). Top-50 cut
    // orders by the ROUNDED score with doc_id tiebreak on both
    // engines, so the cut is identical.
    QueryDef(
      "q119_dsir_importance",
      (s, dir) => {
        val B = 256
        val tgtSet = Seq("src1", "src2", "src3", "src4")
        val isTgt = col("source").isin(tgtSet: _*)
        val bgs = Tables.documents(s, dir)
          .select(col("doc_id"), col("source"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 2)
          .select(col("doc_id"), col("source"),
            explode(expr("""transform(sequence(1, size(toks) - 1),
                i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1)))"""))
              .as("bg"))
          .withColumn("h", expr(s"cast(conv(substring(md5(bg), 1, 4), 16, 10) as int) % $B"))
        // The weight table is DSIR's "train once" artifact — 256 rows,
        // deterministic per input dir — so it stages through parquet
        // per JVM (the q33/q85 convention): the histogram's corpus
        // scan is paid once, and every later run is scoring-only (the
        // production shape, where weights come pre-trained).
        val weights = graft.operators.Staged.parquet(s, s"q119weights|$dir") {
          val byBucket = bgs.groupBy(col("h")).agg(
            sum(when(isTgt, 1L).otherwise(0L)).as("ct"),
            sum(when(isTgt, 0L).otherwise(1L)).as("cr"))
          val tot = byBucket.agg(
            sum(col("ct")).cast("double").as("nt"), sum(col("cr")).cast("double").as("nr"))
          byBucket.crossJoin(broadcast(tot)).select(col("h"),
            (log((col("ct").cast("double") + 0.5) / (col("nt") + 0.5 * B))
              - log((col("cr").cast("double") + 0.5) / (col("nr") + 0.5 * B))).as("wt"))
        }
        bgs.filter(!isTgt)
          .join(broadcast(weights), Seq("h"))
          .groupBy(col("doc_id"), col("source"))
          .agg(count(lit(1)).as("n_bigrams"),
            Num.fround(avg(col("wt")), 4).as("score"))
          .orderBy(col("score").desc, col("doc_id"))
          .limit(50)
      },
      Some(s"""WITH toks AS (
                 SELECT doc_id, source, string_split(text, ' ') AS toks FROM documents),
               bg AS (
                 SELECT doc_id, source,
                   unnest(list_transform(range(1, len(toks)),
                     i -> toks[i] || ' ' || toks[i + 1])) AS bg
                 FROM toks WHERE len(toks) >= 2),
               h AS (
                 SELECT doc_id, source,
                   ('0x' || substr(md5(bg), 1, 4))::INT % 256 AS h,
                   source IN ('src1', 'src2', 'src3', 'src4') AS is_tgt
                 FROM bg),
               byb AS (
                 SELECT h,
                   sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS ct,
                   sum(CASE WHEN is_tgt THEN 0 ELSE 1 END) AS cr
                 FROM h GROUP BY h),
               tot AS (SELECT sum(ct)::DOUBLE AS nt, sum(cr)::DOUBLE AS nr FROM byb),
               wt AS (
                 SELECT h, ln((ct::DOUBLE + 0.5) / (nt + 128.0))
                         - ln((cr::DOUBLE + 0.5) / (nr + 128.0)) AS wt
                 FROM byb, tot)
               SELECT doc_id, source, count(*)::BIGINT AS n_bigrams,
                 ${Num.froundSql("avg(wt)", 4)} AS score
               FROM h JOIN wt USING (h)
               WHERE NOT is_tgt
               GROUP BY doc_id, source
               ORDER BY score DESC, doc_id LIMIT 50"""),
    ),

    // Distributed BPE tokenizer training (Sennrich et al.) — the
    // tokenizer-construction step every LLM data pipeline runs before
    // token counting/packing (q29/q66/q81 all ASSUME a tokenizer;
    // this trains one). Classic algorithm: collapse the corpus to the
    // word-TYPE table (word, count) — the corpus-scale reduction: all
    // further passes touch vocabulary types, not corpus tokens — then
    // iteratively (a) count adjacent symbol pairs weighted by word
    // count, (b) take the most frequent pair (count desc, then
    // lexicographic — total order), (c) merge it everywhere, 8 rounds.
    // The driver sees ONE row per round (the argmax) — bounded state,
    // the ConnectedComponents loop discipline — and each merge is a
    // narrow map over the persisted type table.
    //
    // The merge step must be canonical GREEDY LEFT-TO-RIGHT
    // non-overlapping (fold semantics) in both engines. Encoding
    // symbol sequences with DOUBLE-space separators makes plain
    // `replace(s, ' l  r ', ' lr ')` exactly that fold: each match
    // consumes only the inner halves of its two separators, so
    // adjacent candidate matches never share characters and the
    // scan-after-match rule = the fold's consume-the-symbol rule.
    // (With single spaces, runs like 'a a a a' drop every second
    // merge — the shared-space bug; the spec pins these fixtures.)
    // All counts are exact integers; ties break lexicographically on
    // pure-ASCII symbols — identical in both engines.
    QueryDef(
      "q130_bpe_merges",
      (s, dir) => graft.operators.Bpe
        .stagedMerges(s, Tables.documents(s, dir), dir, rounds = 8)
        .orderBy(col("rank")),
      Some(s"""WITH $bpeSqlCtes
              ${(1 to BpeRounds).map(k =>
        s"SELECT $k AS rank, l AS \"left\", r AS \"right\", pc AS pair_count FROM m$k")
        .mkString("\n              UNION ALL ")}
              ORDER BY rank"""),
    ),

    // BPE vocabulary / corpus segmentation — the ENCODE side of q130:
    // the 8 learned merges applied back over the whole word-type
    // table (8 chained narrow replaces — at corpus scale this is the
    // tokenizer pass over every shard), then the resulting subword
    // vocabulary with corpus-weighted frequencies. Train + apply in
    // one lineage: the merge table q130 emits is exactly what this
    // query folds in, so a drift between the two (wrong rank order,
    // re-derived merges) breaks the differential. All counts exact
    // integers; the vocabulary is bounded by |chars| + rounds.
    QueryDef(
      "q131_bpe_vocab",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        graft.operators.Bpe.encodedTypes(s, docs, dir, rounds = 8)
          .select(col("cnt"), explode(split(trim(col("s")), "  ")).as("sym"))
          .groupBy(col("sym"))
          .agg(sum(col("cnt")).as("n_tokens"), count(lit(1)).as("n_types"))
          .orderBy(col("n_tokens").desc, col("sym"))
      },
      Some(s"""WITH $bpeSqlCtes
              SELECT sym, sum(cnt)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types
              FROM (SELECT cnt, unnest(string_split(trim(s), '  ')) AS sym
                    FROM wt$BpeRounds)
              GROUP BY sym ORDER BY n_tokens DESC, sym"""),
    ),

    // Tokenizer FERTILITY audit — subwords emitted per word, by
    // language, under the q130-trained BPE: the standard multilingual
    // tokenizer-quality metric (a tokenizer trained on skewed data
    // over-fragments under-represented languages; fertility is the
    // number compression/cost planning reads). Same staged merge
    // lineage as q130/q131.
    //
    // Scale shape: the corpus collapses ONCE to (lang, word, count)
    // — all joins after that are TYPE-level: (lang × vocab) ⋈
    // encoded-vocab on the word, never the corpus token stream (the
    // Bpe word-type reduction applied to the audit too). Per-lang
    // output is bounded by |languages|.
    QueryDef(
      "q137_tokenizer_fertility",
      (s, dir) => {
        val docs = Tables.documents(s, dir)
        val enc = graft.operators.Bpe.encodedTypes(s, docs, dir, rounds = 8)
          .select(col("w"), size(split(trim(col("s")), "  ")).cast("long").as("nsub"))
        val lwc = docs.select(col("lang"), explode(split(col("text"), " ")).as("w"))
          .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("c"))
        lwc.join(enc, Seq("w"))
          .groupBy(col("lang"))
          .agg(sum(col("c")).as("n_words"),
            sum(col("c") * col("nsub")).as("n_subwords"))
          .select(col("lang"), col("n_words"), col("n_subwords"),
            Num.fround(col("n_subwords").cast("double") / col("n_words"), 4)
              .as("fertility"))
          .orderBy(col("lang"))
      },
      Some(s"""WITH $bpeSqlCtes,
              enc AS (SELECT w, len(string_split(trim(s), '  '))::BIGINT AS nsub
                      FROM wt$BpeRounds),
              lwc AS (SELECT lang, w, count(*)::BIGINT AS c FROM (
                        SELECT lang, unnest(string_split(text, ' ')) AS w
                        FROM documents)
                      GROUP BY lang, w),
              agg AS (SELECT lang, sum(c)::BIGINT AS n_words,
                        sum(c * nsub)::BIGINT AS n_subwords
                      FROM lwc JOIN enc USING (w) GROUP BY lang)
              SELECT lang, n_words, n_subwords,
                ${Num.froundSql("n_subwords::DOUBLE / n_words", 4)} AS fertility
              FROM agg ORDER BY lang"""),
    ),

    // K-ANONYMITY audit over quasi-identifiers — the privacy
    // complement of q62's PII redaction: a released corpus where a
    // (lang, source, size-bucket) combination identifies fewer than
    // K documents lets those documents be re-identified by metadata
    // alone (Sweeney's k-anonymity); release gates suppress or
    // generalize the risky groups. Emits every risky group with its
    // size plus the corpus-level exposure summary (group counts and
    // documents at risk) on each row.
    //
    // Scale shape: ONE corpus aggregate to the quasi-identifier
    // group counts (map-side partials; group cardinality is bounded
    // by the identifier domain, not the corpus), then a 1-row
    // summary aggregate over the derived group table broadcast back.
    // Exact integers only.
    QueryDef(
      "q147_k_anonymity",
      (s, dir) => {
        val K = 5
        // staged quasi-identifier group table (bounded by the id
        // domain) — the summary and the risky-group listing read it
        val g = graft.operators.Staged.parquet(s, s"q147groups|$dir") {
          Tables.documents(s, dir)
            .select(col("lang"), col("source"),
              expr("n_chars div 100").as("size_bucket"))
            .groupBy(col("lang"), col("source"), col("size_bucket"))
            .agg(count(lit(1)).as("n_docs"))
        }
        val summary = g.agg(count(lit(1)).as("n_groups"),
          sum(when(col("n_docs") < K, 1L).otherwise(0L)).as("n_risky"),
          sum(when(col("n_docs") < K, col("n_docs")).otherwise(0L)).as("docs_at_risk"))
        g.filter(col("n_docs") < K)
          .crossJoin(broadcast(summary))
          .select(col("lang"), col("source"), col("size_bucket"), col("n_docs"),
            col("n_groups"), col("n_risky"), col("docs_at_risk"))
          .orderBy(col("lang"), col("source"), col("size_bucket"))
      },
      Some("""WITH g AS (
                SELECT lang, source, n_chars // 100 AS size_bucket,
                  count(*)::BIGINT AS n_docs
                FROM documents GROUP BY 1, 2, 3),
              s AS (SELECT count(*)::BIGINT AS n_groups,
                      sum(CASE WHEN n_docs < 5 THEN 1 ELSE 0 END)::BIGINT AS n_risky,
                      sum(CASE WHEN n_docs < 5 THEN n_docs ELSE 0 END)::BIGINT AS docs_at_risk
                    FROM g)
              SELECT lang, source, size_bucket, n_docs,
                n_groups, n_risky, docs_at_risk
              FROM g, s WHERE n_docs < 5
              ORDER BY lang, source, size_bucket"""),
    ),

    // SEQUENCE-LENGTH BUCKETING — the padding-efficiency audit of
    // transformer batch assembly: documents batched in power-of-two
    // length buckets (each batch padded to its own max) vs the naive
    // shuffled batching, with the exact padding-token waste of both.
    // Padding is pure wasted compute at training time; this is the
    // number that justifies bucketed batch samplers.
    //
    // Scale shape: the bucket id is a narrow CASE map; within-bucket
    // positions come from PrefixSum.keyedRank (local windows per
    // (bucket, md5-prefix range) + tiny offset table — never a
    // whole-bucket window, the q117 contract), batch stats are one
    // aggregate per (bucket, batch), and the baseline reuses the
    // same machinery under a constant key. All counts exact
    // integers; the two ratios are display roundings.
    QueryDef(
      "q155_length_bucketing",
      (s, dir) => {
        val B = 8
        // Narrow maps over the staged docLens table — cheap to
        // recompute, so no persist (and no JVM-lifetime cache pin).
        val d = Tables.docLens(s, dir)
          .select(col("doc_id"), col("n_tokens").cast("long").as("len"),
            md5(concat(lit("lb|"), col("doc_id").cast("string"))).as("u"))
          .withColumn("bucket",
            when(col("len") <= 8, 8L).when(col("len") <= 16, 16L)
              .when(col("len") <= 32, 32L).when(col("len") <= 64, 64L)
              .otherwise(128L))
          .withColumn("ub", expr("cast(conv(substring(u, 1, 3), 16, 10) as int)"))
        val ranked = graft.operators.PrefixSum.keyedRank(
          d, key = Seq("bucket"), bucket = "ub",
          ord = Seq(col("u"), col("doc_id")), rankName = "rk", totalName = "nb",
          persistProjection = false)
        // Staged, not persisted: the per-batch table is corpus/8 rows
        // (corpus-linear) and feeds two consumers — a parquet stage
        // serves both without pinning executor memory for the JVM.
        val batches = graft.operators.Staged.parquet(s, s"q155batches|$dir") {
          ranked.withColumn("batch", expr(s"(rk - 1) div $B"))
            .groupBy(col("bucket"), col("batch"))
            .agg(count(lit(1)).as("bn"), max(col("len")).as("mx"), sum(col("len")).as("sm"))
            .withColumn("waste", col("mx") * col("bn") - col("sm"))
        }
        val perBucket = batches.groupBy(col("bucket"))
          .agg(sum(col("bn")).as("n_docs"), count(lit(1)).as("n_batches"),
            sum(col("sm")).as("n_tokens"), sum(col("waste")).as("padding_waste"))
        val tb = batches.agg(sum(col("waste")).as("bucketed_waste"))
        val granked = graft.operators.PrefixSum.keyedRank(
          d.withColumn("g", lit(0L)), key = Seq("g"), bucket = "ub",
          ord = Seq(col("u"), col("doc_id")), rankName = "rk", totalName = "nt",
          persistProjection = false)
        val bl = granked.withColumn("batch", expr(s"(rk - 1) div $B"))
          .groupBy(col("batch"))
          .agg(count(lit(1)).as("bn"), max(col("len")).as("mx"), sum(col("len")).as("sm"))
          .agg(sum(col("mx") * col("bn") - col("sm")).as("baseline_waste"))
        val savings = when(col("baseline_waste") === 0, lit(0.0))
          .otherwise(lit(1.0) - col("bucketed_waste").cast("double") / col("baseline_waste"))
        perBucket.crossJoin(broadcast(tb)).crossJoin(broadcast(bl))
          .select(col("bucket"), col("n_docs"), col("n_batches"), col("n_tokens"),
            col("padding_waste"),
            Num.fround(col("padding_waste").cast("double")
              / (col("n_tokens") + col("padding_waste")), 6).as("waste_frac"),
            col("bucketed_waste"), col("baseline_waste"),
            Num.fround(savings, 6).as("savings"))
          .orderBy(col("bucket"))
      },
      Some(s"""WITH d AS (
                 SELECT doc_id, len(string_split(text, ' '))::BIGINT AS len,
                   md5('lb|' || doc_id::VARCHAR) AS u FROM documents),
               b AS (SELECT *, (CASE WHEN len <= 8 THEN 8 WHEN len <= 16 THEN 16
                                WHEN len <= 32 THEN 32 WHEN len <= 64 THEN 64
                                ELSE 128 END)::BIGINT AS bucket FROM d),
               r AS (SELECT *, row_number() OVER (PARTITION BY bucket ORDER BY u, doc_id) AS rk
                     FROM b),
               bt AS (SELECT bucket, (rk - 1) // 8 AS batch, count(*)::BIGINT AS bn,
                        max(len)::BIGINT AS mx, sum(len)::BIGINT AS sm
                      FROM r GROUP BY 1, 2),
               pb AS (SELECT bucket, sum(bn)::BIGINT AS n_docs, count(*)::BIGINT AS n_batches,
                        sum(sm)::BIGINT AS n_tokens,
                        sum(mx * bn - sm)::BIGINT AS padding_waste
                      FROM bt GROUP BY bucket),
               tb AS (SELECT sum(mx * bn - sm)::BIGINT AS bucketed_waste FROM bt),
               gr AS (SELECT *, row_number() OVER (ORDER BY u, doc_id) AS rk FROM d),
               gb AS (SELECT (rk - 1) // 8 AS batch, count(*)::BIGINT AS bn,
                        max(len)::BIGINT AS mx, sum(len)::BIGINT AS sm
                      FROM gr GROUP BY 1),
               bl AS (SELECT sum(mx * bn - sm)::BIGINT AS baseline_waste FROM gb)
               SELECT bucket, n_docs, n_batches, n_tokens, padding_waste,
                 ${Num.froundSql("padding_waste::DOUBLE / (n_tokens + padding_waste)", 6)} AS waste_frac,
                 bucketed_waste, baseline_waste,
                 ${Num.froundSql(
                   "CASE WHEN baseline_waste = 0 THEN (0.0::DOUBLE) ELSE (1.0::DOUBLE) - bucketed_waste::DOUBLE / baseline_waste END", 6)} AS savings
               FROM pb CROSS JOIN tb CROSS JOIN bl ORDER BY bucket"""),
    ),

    // CURRICULUM schedule — the data-ORDER manifest an annealed
    // training run ships (Bengio et al., "Curriculum Learning", ICML
    // 2009, in its practical easy-to-hard mixing form): documents are
    // quartiled by difficulty (token count — the standard no-model
    // proxy), each quartile's mass is apportioned across 4 training
    // phases by an annealing matrix (easy-heavy early, hard-heavy
    // late; every row sums to 1 so each doc trains exactly once), and
    // each phase's stream is a deterministic md5-shuffled interleave
    // of its quartile allocations. Output: (phase, slot, doc_id,
    // quartile, dl) — resumable from (phase, slot) like q117's
    // shards, reproducible on any engine/partitioning (no RNG state).
    //
    // Scale shape: every corpus-size ranking goes through
    // PrefixSum.keyedRank (difficulty rank bucketed by the length
    // value itself — monotone by construction; md5 ranks bucketed by
    // digest prefix — the q105/q117 contract): no whole-key window
    // anywhere. The apportionment table is 16 rows (4 quartiles × 4
    // phases, largest-remainder exact: allocations sum to n_q), its
    // windows run over that aggregate, and it broadcasts back as
    // range conditions on the within-quartile rank. All decisions are
    // integer comparisons; the only doubles are n_q·w products —
    // bit-identical IEEE in both engines.
    QueryDef(
      "q159_curriculum_schedule",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val P = 4
        val Wm = Seq(
          Seq(0.55, 0.25, 0.15, 0.05),
          Seq(0.25, 0.35, 0.25, 0.15),
          Seq(0.15, 0.25, 0.35, 0.25),
          Seq(0.05, 0.15, 0.25, 0.55))
        // Narrow maps over the staged docLens table — no persist, no
        // JVM-lifetime cache pin (round-8 ADVICE).
        val d = Tables.docLens(s, dir)
          .select(col("doc_id"), col("n_tokens").cast("long").as("dl"),
            md5(concat(lit("cur|"), col("doc_id").cast("string"))).as("h"))
          .withColumn("hb", expr("cast(conv(substring(h, 1, 2), 16, 10) as int)"))
          .withColumn("g", lit(0L))
        // global difficulty rank, bucketed by the length value itself
        val dranked = graft.operators.PrefixSum.keyedRank(
          d, key = Seq("g"), bucket = "dl",
          ord = Seq(col("dl"), col("doc_id")),
          rankName = "drank", totalName = "n_total",
          persistProjection = false)
          .withColumn("quartile",
            least(lit(3L), expr("(4 * (drank - 1)) div n_total")))
        // within-quartile deterministic-shuffle rank
        val mranked = graft.operators.PrefixSum.keyedRank(
          dranked.select(col("doc_id"), col("dl"), col("h"), col("hb"), col("quartile")),
          key = Seq("quartile"), bucket = "hb",
          ord = Seq(col("h"), col("doc_id")),
          rankName = "mrank", totalName = "n_q",
          persistProjection = false)
        // 16-row apportionment: largest-remainder split of each
        // quartile across phases, cumulative thresholds per quartile
        val qcounts = mranked.select(col("quartile"), col("n_q")).distinct()
        val wq = Window.partitionBy(col("quartile"))
        val wRem = Window.partitionBy(col("quartile"))
          .orderBy(col("frac").desc, col("phase"))
        val wCum = Window.partitionBy(col("quartile")).orderBy(col("phase"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val alloc = qcounts
          .select(col("quartile"), col("n_q"),
            explode(array((0 until P).map(p => lit(p.toLong)): _*)).as("phase"))
          .withColumn("w", element_at(
            element_at(typedLit(Wm), col("quartile").cast("int") + 1),
            col("phase").cast("int") + 1))
          .withColumn("exact", col("n_q").cast("double") * col("w"))
          .withColumn("base", floor(col("exact")).cast("long"))
          .withColumn("frac", col("exact") - floor(col("exact")))
          .withColumn("r", (col("n_q") - sum(col("base")).over(wq)).cast("long"))
          .withColumn("rn", row_number().over(wRem))
          .withColumn("alloc",
            col("base") + when(col("rn") <= col("r"), 1L).otherwise(0L))
          .withColumn("cum", sum(col("alloc")).over(wCum))
          .select(col("quartile").as("aq"), col("phase"),
            col("alloc"), col("cum"))
        val phased = mranked.join(broadcast(alloc),
            col("quartile") === col("aq") &&
              col("mrank") <= col("cum") && col("mrank") > col("cum") - col("alloc"))
          .select(col("doc_id"), col("dl"), col("h"), col("hb"),
            col("quartile"), col("phase"))
        // schedule position within the phase: md5 interleave of the
        // phase's quartile allocations
        graft.operators.PrefixSum.keyedRank(
            phased, key = Seq("phase"), bucket = "hb",
            ord = Seq(col("h"), col("doc_id")),
            rankName = "slot", totalName = "n_phase",
            persistProjection = false)
          .select(col("phase"), col("slot"), col("doc_id"),
            col("quartile"), col("dl"), col("n_phase"))
          .orderBy(col("phase"), col("slot"))
      },
      Some("""WITH d AS (
                SELECT doc_id, len(string_split(text, ' '))::BIGINT AS dl,
                  md5('cur|' || doc_id::VARCHAR) AS h
                FROM documents),
              dr AS (
                SELECT *, row_number() OVER (ORDER BY dl, doc_id) AS drank,
                  count(*) OVER ()::BIGINT AS n_total
                FROM d),
              qd AS (
                SELECT *, least(3, (4 * (drank - 1)) // n_total)::BIGINT AS quartile
                FROM dr),
              mr AS (
                SELECT *, row_number() OVER (PARTITION BY quartile ORDER BY h, doc_id) AS mrank,
                  count(*) OVER (PARTITION BY quartile)::BIGINT AS n_q
                FROM qd),
              wmat AS (
                SELECT * FROM (VALUES
                  (0, 0, 0.55), (0, 1, 0.25), (0, 2, 0.15), (0, 3, 0.05),
                  (1, 0, 0.25), (1, 1, 0.35), (1, 2, 0.25), (1, 3, 0.15),
                  (2, 0, 0.15), (2, 1, 0.25), (2, 2, 0.35), (2, 3, 0.25),
                  (3, 0, 0.05), (3, 1, 0.15), (3, 2, 0.25), (3, 3, 0.55))
                  AS t(quartile, phase, w)),
              qc AS (SELECT DISTINCT quartile, n_q FROM mr),
              ab AS (
                SELECT qc.quartile, qc.n_q, wmat.phase::BIGINT AS phase,
                  qc.n_q::DOUBLE * wmat.w AS exact,
                  floor(qc.n_q::DOUBLE * wmat.w)::BIGINT AS base,
                  qc.n_q::DOUBLE * wmat.w - floor(qc.n_q::DOUBLE * wmat.w) AS frac
                FROM qc JOIN wmat ON wmat.quartile = qc.quartile),
              al AS (
                SELECT *,
                  (n_q - sum(base) OVER (PARTITION BY quartile))::BIGINT AS r,
                  row_number() OVER (PARTITION BY quartile ORDER BY frac DESC, phase) AS rn
                FROM ab),
              a2 AS (
                SELECT quartile, phase,
                  (base + CASE WHEN rn <= r THEN 1 ELSE 0 END)::BIGINT AS alloc
                FROM al),
              a3 AS (
                SELECT quartile, phase, alloc,
                  sum(alloc) OVER (PARTITION BY quartile ORDER BY phase
                    ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
                FROM a2),
              ph AS (
                SELECT mr.doc_id, mr.dl, mr.h, mr.quartile, a3.phase
                FROM mr JOIN a3 ON a3.quartile = mr.quartile
                  AND mr.mrank <= a3.cum AND mr.mrank > a3.cum - a3.alloc)
              SELECT phase, row_number() OVER (PARTITION BY phase ORDER BY h, doc_id) AS slot,
                doc_id, quartile, dl,
                count(*) OVER (PARTITION BY phase)::BIGINT AS n_phase
              FROM ph
              ORDER BY phase, slot"""),
    ),

    // POPULATION STABILITY INDEX — the standard between-release drift
    // monitor for a scored corpus (the curation complement of q142's
    // embedding z-test): bucket the CURRENT cohort's metric into the
    // REFERENCE cohort's deciles and fold Σ (p_cur − p_ref)·ln(p_cur/
    // p_ref); PSI < 0.1 is the conventional "no action" band. Cohorts
    // here are the deterministic doc_id-parity split — the monitor's
    // NULL distribution: an unchanged corpus must score ≈ 0 and flag
    // nothing, which is itself the check (the q142 stance).
    //
    // Scale shape: decile thresholds come from a COUNT-OF-COUNTS
    // cumulative walk over the reference cohort (the q144 trick —
    // token lengths have a value domain bounded by max doc length,
    // not corpus size, so the distinct-value count table is tiny and
    // its single cumulative window partitions over ≤|domain| rows;
    // ExactMedian's generic three-pass rank selection paid ~3 s of
    // fixed multi-stage overhead here for the same exact ranks,
    // round-10 measured) and broadcast back as NINE threshold
    // comparisons — a narrow bucket map; per-(cohort, bucket) counts
    // are a ≤20-row aggregate; an explicit 10-bucket spine keeps
    // empty deciles visible (the q158 lesson); Laplace smoothing
    // (c+0.5)/(n+5) keeps every ln finite. Determinism: thresholds
    // are exact discrete quantiles (smallest value whose cumulative
    // count reaches ceil(n·p) — the quantile_disc convention), bucket
    // membership is integer comparisons, ln's 1-ulp cross-libm noise
    // is absorbed by fround (the q87 argument).
    QueryDef(
      "q165_psi_drift",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        // Narrow maps over the staged docLens table — no persist, no
        // JVM-lifetime cache pin (round-8 ADVICE).
        val d = Tables.docLens(s, dir)
          .select(col("doc_id"), col("n_tokens").cast("long").as("v"))
          .withColumn("cohort",
            when(col("doc_id") % 2 === 0, "ref").otherwise("cur"))
        val ref = d.filter(col("cohort") === "ref").withColumn("g", lit(0))
        val th = graft.operators.ExactMedian.quantilesDiscSmallDomain(
          ref, "g", "v", (1 to 9).map(i => s"t$i" -> i / 10.0)).drop("g")
        val bucket = (1 to 9).map(i =>
          when(col("v") > col(s"t$i"), 1L).otherwise(0L)).reduce(_ + _)
        val counts = d.crossJoin(broadcast(th))
          .select(col("cohort"), bucket.as("bucket"))
          .groupBy(col("cohort"), col("bucket"))
          .agg(count(lit(1)).as("c"))
        val spine = s.range(1)
          .select(explode(array((0 until 10).map(b => lit(b.toLong)): _*)).as("bucket"))
        val wide = spine
          .join(broadcast(counts.filter(col("cohort") === "ref")
            .select(col("bucket"), col("c").as("ref_n"))), Seq("bucket"), "left")
          .join(broadcast(counts.filter(col("cohort") === "cur")
            .select(col("bucket"), col("c").as("cur_n"))), Seq("bucket"), "left")
          .select(col("bucket"),
            coalesce(col("ref_n"), lit(0L)).as("ref_n"),
            coalesce(col("cur_n"), lit(0L)).as("cur_n"))
        val tot = wide.agg(sum(col("ref_n")).as("ref_t"), sum(col("cur_n")).as("cur_t"))
        val pr = (col("ref_n").cast("double") + 0.5) / (col("ref_t").cast("double") + 5.0)
        val pc = (col("cur_n").cast("double") + 0.5) / (col("cur_t").cast("double") + 5.0)
        val contrib = Num.fround((pc - pr) * log(pc / pr), 6)
        val perBucket = wide.crossJoin(broadcast(tot))
          .select(col("bucket"), col("ref_n"), col("cur_n"),
            Num.fround(pr, 6).as("ref_share"),
            Num.fround(pc, 6).as("cur_share"),
            contrib.as("contrib"))
        val wAll = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        perBucket
          .withColumn("psi", Num.fround(sum(col("contrib")).over(wAll), 4))
          .withColumn("drifted", col("psi") > 0.1)
          .orderBy(col("bucket"))
      },
      Some {
        val thCols = (1 to 9).map(i =>
          s"quantile_disc(v, 0.${i}) AS t$i").mkString(", ")
        val bucketSql = (1 to 9).map(i =>
          s"CASE WHEN v > t$i THEN 1 ELSE 0 END").mkString(" + ")
        s"""WITH d AS (
                SELECT doc_id, len(string_split(text, ' '))::BIGINT AS v,
                  CASE WHEN doc_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS cohort
                FROM documents),
              th AS (SELECT $thCols FROM d WHERE cohort = 'ref'),
              bk AS (
                SELECT cohort, ($bucketSql)::BIGINT AS bucket
                FROM d CROSS JOIN th),
              cts AS (
                SELECT cohort, bucket, count(*)::BIGINT AS c
                FROM bk GROUP BY cohort, bucket),
              spine AS (SELECT unnest(generate_series(0, 9))::BIGINT AS bucket),
              wide AS (
                SELECT spine.bucket,
                  coalesce(r.c, 0)::BIGINT AS ref_n,
                  coalesce(u.c, 0)::BIGINT AS cur_n
                FROM spine
                  LEFT JOIN (SELECT bucket, c FROM cts WHERE cohort = 'ref') r
                    ON r.bucket = spine.bucket
                  LEFT JOIN (SELECT bucket, c FROM cts WHERE cohort = 'cur') u
                    ON u.bucket = spine.bucket),
              tot AS (SELECT sum(ref_n)::BIGINT AS ref_t, sum(cur_n)::BIGINT AS cur_t
                      FROM wide),
              pb AS (
                SELECT bucket, ref_n, cur_n,
                  (ref_n::DOUBLE + 0.5) / (ref_t::DOUBLE + 5.0) AS pr,
                  (cur_n::DOUBLE + 0.5) / (cur_t::DOUBLE + 5.0) AS pc
                FROM wide CROSS JOIN tot),
              pb2 AS (
                SELECT bucket, ref_n, cur_n,
                  ${Num.froundSql("pr", 6)} AS ref_share,
                  ${Num.froundSql("pc", 6)} AS cur_share,
                  ${Num.froundSql("(pc - pr) * ln(pc / pr)", 6)} AS contrib
                FROM pb)
              SELECT bucket, ref_n, cur_n, ref_share, cur_share, contrib,
                ${Num.froundSql("sum(contrib) OVER ()", 4)} AS psi,
                (${Num.froundSql("sum(contrib) OVER ()", 4)} > 0.1) AS drifted
              FROM pb2
              ORDER BY bucket"""
      },
    ),

    // DATA-CONSTRAINED epoch allocation (Muennighoff et al., "Scaling
    // Data-Constrained Language Models", NeurIPS 2023: repeating data
    // up to ~4 epochs retains most of fresh-data value, decaying
    // beyond): given a training token budget LARGER than the corpus,
    // decide how many epochs of each source to schedule. Epoch e
    // carries utility weight 0.5^(e−1) (the paper's decaying-value
    // shape), so the greedy fill takes every source's epoch 1, then
    // epoch 2, … (within an epoch tier, larger sources first — more
    // tokens at equal marginal utility), clipping the first
    // overflowing item fractionally and dropping the rest. Budget =
    // 2.5× corpus tokens, so the schedule lands MID-tier-3 and every
    // regime shows up: two full epochs everywhere, a full or clipped
    // third epoch for the largest sources, dropped tiers for the
    // rest.
    //
    // Scale shape: the corpus collapses to ONE row per source (map-
    // side combined token sums); everything after — the 4×|sources|
    // epoch items, the greedy cumulative fill, the per-source rollup
    // — is windows over that aggregate, corpus-independent. All
    // decisions are exact integer token counts; utility is display
    // only.
    QueryDef(
      "q166_epoch_allocation",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val MaxEpochs = 4
        val toks = Tables.docLens(s, dir)
          .select(col("source"), col("n_tokens").cast("long").as("dl"))
          .groupBy(col("source")).agg(sum(col("dl")).as("tokens"))
        val budget = toks.agg((sum(col("tokens")) * 5 / 2).cast("long").as("budget"))
        val items = toks
          .select(col("source"), col("tokens"),
            explode(array((1 to MaxEpochs).map(e => lit(e.toLong)): _*)).as("epoch"))
        // greedy order: epoch tier asc (utility desc), bigger sources
        // first inside a tier, source name as the total tiebreak
        val wCum = Window.orderBy(col("epoch"), col("tokens").desc, col("source"))
          .rowsBetween(Window.unboundedPreceding, 0)
        val filled = items.crossJoin(broadcast(budget))
          .withColumn("cum", sum(col("tokens")).over(wCum))
          .withColumn("alloc",
            greatest(lit(0L), least(col("tokens"), col("budget") - (col("cum") - col("tokens")))))
        filled.groupBy(col("source"))
          .agg(first(col("tokens")).as("tokens"),
            sum(when(col("alloc") === col("tokens"), 1L).otherwise(0L)).as("full_epochs"),
            max(when(col("alloc") > 0 && col("alloc") < col("tokens"), col("alloc"))
              .otherwise(lit(0L))).as("partial_tokens"),
            sum(col("alloc")).as("alloc_tokens"),
            first(col("budget")).as("budget"))
          .withColumn("epochs_eff", Num.fround(
            col("alloc_tokens").cast("double") / col("tokens").cast("double"), 4))
          .orderBy(col("source"))
      },
      Some("""WITH t AS (
                SELECT source, sum(len(string_split(text, ' ')))::BIGINT AS tokens
                FROM documents GROUP BY source),
              b AS (SELECT (sum(tokens) * 5 // 2)::BIGINT AS budget FROM t),
              it AS (
                SELECT source, tokens, e.epoch::BIGINT AS epoch
                FROM t, (SELECT unnest(generate_series(1, 4)) AS epoch) e),
              f AS (
                SELECT *,
                  sum(tokens) OVER (ORDER BY epoch, tokens DESC, source
                    ROWS UNBOUNDED PRECEDING)::BIGINT AS cum
                FROM it),
              a AS (
                SELECT f.*, b.budget,
                  greatest(0, least(tokens, b.budget - (cum - tokens)))::BIGINT AS alloc
                FROM f CROSS JOIN b)
              SELECT source,
                max(tokens)::BIGINT AS tokens,
                sum(CASE WHEN alloc = tokens THEN 1 ELSE 0 END)::BIGINT AS full_epochs,
                max(CASE WHEN alloc > 0 AND alloc < tokens THEN alloc ELSE 0 END)::BIGINT
                  AS partial_tokens,
                sum(alloc)::BIGINT AS alloc_tokens,
                max(budget)::BIGINT AS budget,
                floor(sum(alloc)::DOUBLE / max(tokens)::DOUBLE * 10000 + 0.5) / 10000
                  AS epochs_eff
              FROM a GROUP BY source ORDER BY source"""),
    ),
  )

}
