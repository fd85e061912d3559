package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.{Num, VectorFns}

/** Embedding-space clustering for corpus curation: distributed k-means
  * (Lloyd) over the `embeddings` table and the SemDeDup-style
  * cluster-local semantic dedup built on top of it (Abbas et al. 2023:
  * cluster the corpus, then drop near-identical neighbors WITHIN each
  * cluster — the trick that makes embedding dedup sub-quadratic).
  * The reference has no embedding surface at all; this is part of the
  * at-scale extension family (SURVEY.md §7.2 step 5) next to
  * [[Vectors]].
  *
  * Scale design:
  *  - Assignment is a narrow map: the k·64-double centroid set rides
  *    into the plan as a literal (the broadcast-variable pattern), so
  *    the corpus never shuffles to be assigned.
  *  - The centroid update is posexplode(dim) → one HashAggregate with
  *    map-side partial sums — k·64 rows cross the wire per mapper.
  *    The per-iteration driver collect is k·64 doubles (bounded,
  *    corpus-independent): the standard iterative-k-means driver
  *    state, same shape MLlib uses.
  *  - SemDeDup's pair scan is confined WITHIN a cluster, and the
  *    boundedness contract is enforced by construction, not prose:
  *    k = max(8, n / [[Clustering.TargetClusterSize]]) is derived from
  *    the corpus count (the q53 centroid-modulus trick), so expected
  *    cluster size — and with it the per-cluster quadratic pair work —
  *    stays ≈ TargetClusterSize no matter how big the corpus grows.
  *    The flip side is k ∝ n: centroid state (k·DIM doubles of plan
  *    literals / driver memory) grows linearly at fixed target size,
  *    so a 100 TB deployment raises TargetClusterSize (or goes
  *    two-level: cluster a sample, then assign) to keep k ≤ ~10⁴;
  *    what must NOT happen — k pinned constant while n grows, making
  *    the pair scan quadratic — is now impossible by construction.
  *
  * Cross-engine determinism: seeds are vec_id < k (floats cast to
  * double — exact); every updated centroid coordinate is rounded to
  * 6dp with the [[Num.fround]] formula ON BOTH ENGINES before the next
  * assignment, so both engines assign against bit-identical centroids;
  * per-row distance is a fixed-order left fold over the 64 dims;
  * argmin ties break on centroid id. Clusters that lose all members
  * simply disappear from the next round's centroid set (both engines
  * derive the set from the same assignment groups).
  */
object Clustering {

  /** Target expected cluster size; k is DERIVED as
    * max([[MinK]], n / TargetClusterSize) so per-cluster pair-scan work
    * stays bounded as the corpus grows (500-row sf0.001/sf0.01 → k=8,
    * 2000-row sf0.1 → k=13 — the derived path is exercised by the
    * standard test SFs). */
  private val TargetClusterSize = 150L
  private val MinK = 8L
  private val DIM = 64
  /** SemDeDup cosine threshold — calibrated to the synthetic
    * embeddings (max pairwise cosine ≈ 0.51), so the dedup actually
    * drops rows at every sf instead of passing vacuously. */
  private val TAU = 0.35

  /** Corpus with the float embedding, its double-cast array `e`, and
    * the codegen'd squared norm. */
  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.DotProductF.register(s)
    graft.functions.SqDistF.register(s)
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"),
        VectorFns.normSqF("embedding").as("nsq"))
  }

  /** Squared L2 distance from `e` to a constant centroid — the native
    * codegen [[graft.functions.SqDistF]] kernel, whose accumulation is
    * bit-identical to the `aggregate(zip_with(...))` left fold and to
    * the DuckDB list-comprehension mirror (the HOF form would run an
    * interpreted lambda per element × k centroids per row). */
  private def sqDistTo(c: Seq[Double]): Column =
    graft.functions.SqDistF.distCol(col("e"), typedLit(c))

  /** Nearest-centroid assignment: adds `cid` (centroid id) and `dist`.
    * array_min over struct(dist, cid) = argmin with id tie-break,
    * identical to the oracle's ORDER BY dist, cid row_number. */
  private def assign(df: DataFrame, cents: Seq[(Long, Seq[Double])]): DataFrame =
    df.withColumn("best", array_min(array(cents.map { case (cid, c) =>
        struct(sqDistTo(c).as("dist"), lit(cid).as("cid")) }: _*)))
      .withColumn("cid", col("best.cid"))
      .withColumn("dist", col("best.dist"))
      .drop("best")

  /** Element-wise mean per surviving cluster, rounded to 6dp with the
    * exact [[Num.fround]] IEEE formula (floor(x·1e6 + 0.5)/1e6) so the
    * collected literals match the oracle's rounded centroids bit for
    * bit. The collect is ≤ K·DIM rows — bounded driver state. */
  private def updatedCentroids(assigned: DataFrame): Seq[(Long, Seq[Double])] = {
    val p = 1000000d
    assigned.select(col("cid"), posexplode(col("e")).as(Seq("i", "x")))
      .groupBy(col("cid"), col("i")).agg(avg(col("x")).as("m"))
      .collect()
      .groupBy(_.getAs[Long]("cid"))
      .map { case (cid, rows) =>
        cid -> rows.sortBy(_.getAs[Int]("i"))
          .map(r => math.floor(r.getAs[Double]("m") * p + 0.5) / p).toSeq
      }
      .toSeq.sortBy(_._1)
  }

  /** Final k-means state after seed → assign → update → assign:
    * (vec_id, embedding, e, nsq, cid, dist). Shared by q85 and q86.
    * k is derived from the corpus count (one cheap scalar job — the
    * same bounded driver state the seed collect already is); seeds are
    * the k smallest vec_ids, deterministic on both engines. */
  private def kmeansFinal(s: SparkSession, dir: String): DataFrame = {
    val df = emb(s, dir).persist()
    val k = math.max(MinK, df.count() / TargetClusterSize)
    val seeds = df.filter(col("vec_id") < k).select(col("vec_id"), col("e"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1))
      .toSeq.sortBy(_._1)
    assign(df, updatedCentroids(assign(df, seeds)))
  }

  /** DuckDB mirror of [[kmeansFinal]] as CTEs (no leading WITH)
    * defining `e(vec_id, emb, nsq)` and `a2(vec_id, cid, dist)`. */
  private def kmeansSqlCtes: String = {
    def distList(c: String) =
      s"list_sum([(e.emb[i] - $c[i]) * (e.emb[i] - $c[i]) for i in generate_series(1, $DIM)])"
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS emb,
                ${VectorFns.normSqSql("embedding::DOUBLE[]")} AS nsq
              FROM embeddings),
        c0 AS (SELECT vec_id AS cid, emb AS c FROM e
               WHERE vec_id < greatest($MinK, (SELECT count(*) FROM e) // $TargetClusterSize)),
        d1 AS (SELECT e.vec_id, c0.cid, ${distList("c0.c")} AS dist FROM e, c0),
        a1 AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                 FROM d1) WHERE rn = 1),
        upd AS (SELECT a1.cid, t.i,
                  ${Num.froundSql("avg(e.emb[t.i])", 6)} AS x
                FROM a1 JOIN e USING (vec_id),
                  LATERAL (SELECT unnest(generate_series(1, $DIM)) AS i) t
                GROUP BY a1.cid, t.i),
        c1 AS (SELECT cid, list(x ORDER BY i) AS c FROM upd GROUP BY cid),
        d2 AS (SELECT e.vec_id, c1.cid, ${distList("c1.c")} AS dist FROM e, c1),
        a2 AS (SELECT vec_id, cid, dist FROM (
                 SELECT vec_id, cid, dist,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                 FROM d2) WHERE rn = 1)"""
  }

  /** Two-level k-means: train the centroids on a DETERMINISTIC sample
    * (every m-th vec_id, m = max(1, n / (k·32)) — sample size ≈ k·32
    * vectors no matter how big the corpus), then assign the FULL
    * corpus. The complement of [[kmeansFinal]]'s derived-k contract on
    * the other axis of the tradeoff: derived-k bounds CLUSTER SIZE
    * (SemDeDup's pair-scan needs that) at the cost of k ∝ n centroid
    * state; two-level bounds CENTROID STATE (an ANN coarse quantizer
    * needs a broadcastable centroid table) at the cost of cluster
    * size ∝ n. Seeds are the k smallest sampled ids (multiples of m
    * below k·m) — deterministic on both engines. */
  /** Sample-trained centroids + the (persisted) corpus frame: train on
    * the modulus sample, return the corpus to assign. Shared by q97
    * (full assignment) and q104 (trained-quantizer ANN serving). */
  private def twoLevelTrained(s: SparkSession, dir: String): (DataFrame, Seq[(Long, Seq[Double])]) = {
    val df = emb(s, dir).persist()
    val k = MinK
    val m = math.max(1L, df.count() / (k * 32))
    val sample = df.filter(col("vec_id") % m === 0)
    val seeds = sample.filter(col("vec_id") < k * m).select(col("vec_id"), col("e"))
      .collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getSeq[Double](1))
      .toSeq.sortBy(_._1)
    (df, updatedCentroids(assign(sample, seeds)))
  }

  private def kmeansTwoLevel(s: SparkSession, dir: String): DataFrame = {
    val (df, cents) = twoLevelTrained(s, dir)
    assign(df, cents)
  }

  /** DuckDB mirror of [[kmeansTwoLevel]]: train on the modulus sample,
    * assign the full corpus. Defines `e(vec_id, emb)` and
    * `a2(vec_id, cid, dist)`. */
  private def twoLevelSqlCtes: String = {
    def dist(tbl: String, c: String) =
      s"list_sum([($tbl.emb[i] - $c[i]) * ($tbl.emb[i] - $c[i]) for i in generate_series(1, $DIM)])"
    s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
        prm AS (SELECT greatest(1, count(*) // ${MinK * 32}) AS m FROM e),
        smp AS (SELECT e.* FROM e, prm WHERE e.vec_id % prm.m = 0),
        c0 AS (SELECT s.vec_id AS cid, s.emb AS c FROM smp s, prm
               WHERE s.vec_id < $MinK * prm.m),
        d1 AS (SELECT s.vec_id, c0.cid, ${dist("s", "c0.c")} AS dist FROM smp s, c0),
        a1 AS (SELECT vec_id, cid FROM (
                 SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                 FROM d1) WHERE rn = 1),
        upd AS (SELECT a1.cid, t.i, ${Num.froundSql("avg(s.emb[t.i])", 6)} AS x
                FROM a1 JOIN smp s USING (vec_id),
                  LATERAL (SELECT unnest(generate_series(1, $DIM)) AS i) t
                GROUP BY a1.cid, t.i),
        c1 AS (SELECT cid, list(x ORDER BY i) AS c FROM upd GROUP BY cid),
        d2 AS (SELECT e.vec_id, c1.cid, ${dist("e", "c1.c")} AS dist FROM e, c1),
        a2 AS (SELECT vec_id, cid, dist FROM (
                 SELECT vec_id, cid, dist,
                   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                 FROM d2) WHERE rn = 1)"""
  }

  val defs: Seq[QueryDef] = Seq(

    // Distributed k-means (Lloyd): seed with vec_id < k, one rounded
    // centroid refinement, final nearest-centroid assignment. The
    // oracle recomputes both Lloyd steps from scratch in SQL — two
    // independent implementations agreeing on every assignment and
    // (rounded) distance.
    QueryDef(
      "q85_kmeans_assign",
      (s, dir) =>
        kmeansFinal(s, dir)
          .select(col("vec_id"), col("cid").as("cluster_id"),
            Num.fround(col("dist"), 4).as("dist"))
          .orderBy(col("vec_id")),
      Some(s"""WITH $kmeansSqlCtes
               SELECT vec_id, cid AS cluster_id,
                 ${Num.froundSql("dist", 4)} AS dist
               FROM a2 ORDER BY vec_id"""),
    ),

    // SemDeDup: within each k-means cluster, a vector is dropped when
    // a LOWER-id cluster-mate sits within cosine ≥ τ — keep-first
    // dominance, the deterministic core of the published algorithm
    // (which keeps one member per semantic-duplicate neighborhood).
    // Emits every vector with its cluster and survive verdict, so the
    // filter is auditable like q80.
    QueryDef(
      "q86_semantic_dedup",
      (s, dir) => {
        val m = kmeansFinal(s, dir)
          .select(col("vec_id"), col("cid"), col("embedding"), col("nsq"))
          .persist()
        val a = m.select(col("cid"), col("vec_id").as("va"),
          col("embedding").as("ea"), col("nsq").as("na"))
        val b = m.select(col("cid"), col("vec_id").as("vb"),
          col("embedding").as("eb"), col("nsq").as("nb"))
        val drops = a.join(b, Seq("cid"))
          .filter(col("va") < col("vb"))
          .filter(VectorFns.dotF("ea", "eb")
            / (sqrt(col("na")) * sqrt(col("nb"))) >= TAU)
          .select(col("vb").as("vec_id")).distinct()
          .withColumn("dropped", lit(true))
        m.join(drops, Seq("vec_id"), "left")
          .select(col("vec_id"), col("cid").as("cluster_id"),
            col("dropped").isNull.as("keep"))
          .orderBy(col("vec_id"))
      },
      Some(s"""WITH $kmeansSqlCtes,
               mem AS (SELECT a2.vec_id, a2.cid, e.emb, e.nsq
                       FROM a2 JOIN e USING (vec_id)),
               drops AS (
                 SELECT DISTINCT b.vec_id
                 FROM mem a JOIN mem b
                   ON a.cid = b.cid AND a.vec_id < b.vec_id
                 WHERE ${VectorFns.dotSql("a.emb", "b.emb")}
                   / (sqrt(a.nsq) * sqrt(b.nsq)) >= $TAU)
               SELECT m.vec_id, m.cid AS cluster_id,
                 (d.vec_id IS NULL) AS keep
               FROM mem m LEFT JOIN drops d ON m.vec_id = d.vec_id
               ORDER BY m.vec_id"""),
    ),

    // Cluster-balanced representative sampling — per k-means cluster,
    // keep the 16 members closest to the centroid (rank by distance,
    // id tie-break): the "diverse subset selection" curation op — a
    // budget of n·k samples spread across semantic regions instead of
    // dominated by the densest one.
    //
    // Scale: ranking partitions by cluster id; k is derived from the
    // corpus count in kmeansFinal (k = max(8, n / TargetClusterSize)),
    // so per-partition membership is bounded BY CONSTRUCTION — and a
    // top-16 trim would drop into the O2 per-key-top-K aggregate form
    // if it weren't.
    // Rank order uses the UNROUNDED distance (ulp-identical inputs on
    // both engines; vec_id breaks any exact tie).
    QueryDef(
      "q89_cluster_sample",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("cid")).orderBy(col("dist"), col("vec_id"))
        kmeansFinal(s, dir)
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= 16)
          .select(col("cid").as("cluster_id"), col("rank"), col("vec_id"),
            Num.fround(col("dist"), 4).as("dist"))
          .orderBy(col("cluster_id"), col("rank"))
      },
      Some(s"""WITH $kmeansSqlCtes,
               r AS (SELECT vec_id, cid, dist,
                       row_number() OVER (PARTITION BY cid ORDER BY dist, vec_id) AS rank
                     FROM a2)
               SELECT cid AS cluster_id, rank, vec_id,
                 ${Num.froundSql("dist", 4)} AS dist
               FROM r WHERE rank <= 16
               ORDER BY cluster_id, rank"""),
    ),

    // Two-level (sample-trained) k-means — see [[kmeansTwoLevel]]:
    // the production form for a broadcastable coarse quantizer whose
    // centroid/driver state stays CONSTANT as the corpus grows
    // (training cost ∝ sample ≈ k·32 vectors; the corpus pays only
    // the final narrow-map assignment). The axis-complement of q85's
    // derived-k contract; both oracles recompute their full Lloyd
    // chain in SQL.
    QueryDef(
      "q97_kmeans_twolevel",
      (s, dir) =>
        kmeansTwoLevel(s, dir)
          .select(col("vec_id"), col("cid").as("cluster_id"),
            Num.fround(col("dist"), 4).as("dist"))
          .orderBy(col("vec_id")),
      Some(s"""WITH $twoLevelSqlCtes
               SELECT vec_id, cid AS cluster_id,
                 ${Num.froundSql("dist", 4)} AS dist
               FROM a2 ORDER BY vec_id"""),
    ),

    // TRAINED-quantizer ANN — IVF whose cells are q97's sample-trained
    // k-means clusters instead of q53's modulus-picked seed vectors:
    // the production IVF recipe (FAISS trains the coarse quantizer on
    // a sample for exactly this reason — learned cells track the data
    // distribution, so cell populations are balanced and the per-cell
    // scan bound actually holds). Probes rank the trained centroids
    // (a narrow map over the broadcast k-centroid literal set, nprobe
    // = 2 cells each), candidates come only from those cells via the
    // cell equi-join, and the exact cosine runs inside the cells.
    // Training state stays constant-size at any corpus (m = n/(k·32)
    // modulus sample — the q97 contract).
    QueryDef(
      "q104_ann_ivf_trained",
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val NPROBES = 8
        val NPROBE = 2
        val (df, cents) = twoLevelTrained(s, dir)
        val assigned = assign(df, cents).withColumnRenamed("cid", "cell").persist()
        // Probe-side top-NPROBE trained cells: argsort over the k
        // literal centroid distances, per probe row — no join, no
        // shuffle; k structs per probe, sliced to nprobe.
        val ranked = slice(array_sort(array(cents.map { case (cid, c) =>
          struct(sqDistTo(c).as("dist"), lit(cid).as("cid")) }: _*)), 1, NPROBE)
        val probeCells = df.filter(col("vec_id") < NPROBES)
          .select(col("vec_id").as("probe_id"), col("embedding").as("p_emb"),
            col("nsq").as("p_nsq"), explode(ranked).as("cand"))
          .select(col("probe_id"), col("p_emb"), col("p_nsq"), col("cand.cid").as("cell"))
        val sim = Num.fround(
          VectorFns.dotF("p_emb", "embedding") / (sqrt(col("p_nsq")) * sqrt(col("nsq"))), 4)
        val w = Window.partitionBy(col("probe_id")).orderBy(col("sim").desc, col("vec_id"))
        assigned.join(broadcast(probeCells), Seq("cell"))
          .filter(col("vec_id") =!= col("probe_id"))
          .select(col("probe_id"), col("vec_id"), col("cell"), sim.as("sim"))
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= 3)
          .select(col("probe_id"), col("rank"), col("vec_id"), col("cell"), col("sim"))
          .orderBy(col("probe_id"), col("rank"))
      },
      Some(s"""WITH $twoLevelSqlCtes,
               nz AS (
                 SELECT e.vec_id, e.emb, ${VectorFns.normSqSql("e.emb")} AS nsq,
                        a2.cid AS cell
                 FROM e JOIN a2 USING (vec_id)),
               pc AS (
                 SELECT vec_id AS probe_id, cid AS cell FROM (
                   SELECT vec_id, cid,
                     row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
                   FROM d2 WHERE vec_id < 8) WHERE rn <= 2),
               p AS (
                 SELECT pc.probe_id, pc.cell, nz.emb AS p_emb, nz.nsq AS p_nsq
                 FROM pc JOIN nz ON nz.vec_id = pc.probe_id),
               sims AS (
                 SELECT p.probe_id, nz.vec_id, nz.cell,
                   ${Num.froundSql(s"${VectorFns.dotSql("p_emb", "nz.emb")} / (sqrt(p_nsq) * sqrt(nz.nsq))", 4)} AS sim
                 FROM nz JOIN p ON nz.cell = p.cell AND nz.vec_id <> p.probe_id)
               SELECT probe_id,
                 row_number() OVER (PARTITION BY probe_id ORDER BY sim DESC, vec_id)::BIGINT AS rank,
                 vec_id, cell, sim
               FROM sims
               QUALIFY rank <= 3
               ORDER BY probe_id, rank"""),
    ),
  )
}
