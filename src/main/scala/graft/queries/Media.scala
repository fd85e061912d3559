package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal near-dup, ORACLE-CHECKED end to end (the round-13
  * verdict's residual #4): everything downstream of the perceptual
  * hash — banding, Hamming verification, connected components,
  * license governance — is plain integer SQL, so it gets the same
  * DuckDB differential as the text near-dup family instead of living
  * spec-only behind the codec boundary.
  *
  * The device that makes a REAL codec path differentially checkable:
  * each document carries a synthesized media payload whose decoded
  * samples are a DOCUMENTED pure integer function of `doc_id`
  * (md5-keyed, so the pattern has no modular periodicity that would
  * merge unrelated groups at scale). The Spark side goes through the
  * genuine encode → decode → perceptual-hash pipeline — PNG via
  * `javax.imageio` into [[graft.operators.Multimodal.aHash64]], WAV
  * PCM16 via `javax.sound.sampled` into
  * [[graft.operators.Multimodal.audioHash64]] — while the oracle
  * computes the same 64-bit hash from the sample formula in SQL. The
  * synthesis is designed to round-trip losslessly (gray RGB PNG;
  * 16-bit PCM whose low byte is zero), so a hash mismatch means the
  * codec path stopped computing the documented function: the decode
  * itself is IN the differential, not just the integer tail. Decode
  * of arbitrary real-world payloads (where no closed form exists)
  * stays spec-verified in OperatorsSpec — SURVEY §5.3's carve-out now
  * covers ONLY the part no SQL engine can express.
  *
  * Near-dup structure: consecutive doc_ids form variant groups (4
  * image variants, 3 audio variants); variant k perturbs the first k
  * samples of its group's base pattern, so adjacent variants sit a
  * few Hamming bits apart — the re-encoded/lightly-edited duplicates
  * a media corpus actually contains — while distinct groups are
  * md5-independent (~32 bits apart, never within the verify
  * threshold).
  *
  * Scale: the staged hash table is one narrow (doc_id, lo, hi) row
  * per document (the decode runs partition-local, once, inside the
  * stage build); candidates come from the 4×16-bit banded equi-join
  * ([[graft.operators.Multimodal.nearDupHashPairs]] — corpus-linear:
  * within-group collisions are bounded by the variant structure and
  * cross-group 16-bit band collisions are birthday-rare), components
  * are the fixed-round q70 operator, and the governance tail is one
  * cluster-partitioned window pass. The hash halves stay < 2^32 so
  * BIGINT arithmetic never overflows in either engine (the q184
  * lo/hi device).
  */
object Media {

  // ---- synthesis constants (TOP of object: referenced from oracle
  // SQL strings, which `defs` forces at init — see the q184 lesson) --
  private val ImgVariants = 4L
  private val ImgBump = 60L
  private val AudVariants = 3L
  private val AudBump = 47L
  private val SampleMod = 251L
  private val MaxHam = 6
  private val NSamples = 64

  /** First byte of md5(s), as an unsigned int — the cross-engine
    * random oracle (DuckDB mirror: `('0x' || substr(md5(s), 1, 2))::INT`,
    * the q192 tier-map device). */
  private def md5Byte(s: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d(0) & 0xff
  }

  /** The documented sample formula shared by both modalities: sample i
    * of doc `docId` is the md5 byte of (prefix, group, i), bumped on
    * the first `variant` positions, mod 251. */
  private def synthSamples(prefix: String, docId: Long, variants: Long,
      bump: Long): Array[Int] = {
    val g = docId / variants
    val variant = docId % variants
    Array.tabulate(NSamples) { i =>
      ((md5Byte(s"$prefix|$g|$i") + (if (i < variant) bump else 0L))
        % SampleMod).toInt
    }
  }

  /** DuckDB mirror of one [[synthSamples]] value (columns `g`, `i`,
    * `variant` in scope). */
  private def synthSampleSql(prefix: String, variants: Long, bump: Long): String =
    s"""((('0x' || substr(md5('$prefix|' || (d.doc_id // $variants) || '|' || t.i), 1, 2))::INT
        + (CASE WHEN t.i < (d.doc_id % $variants) THEN $bump ELSE 0 END)) % $SampleMod)"""

  /** Synthesized 8×8 gray PNG: sample i is pixel (x=i%8, y=i//8),
    * written as an RGB gray triple (TYPE_INT_RGB round-trips through
    * PNG losslessly, and the Rec.601 integer luminance of (v,v,v) is
    * exactly v — no colorspace gamma, unlike TYPE_BYTE_GRAY). */
  private[graft] def imgPayload(docId: Long): Array[Byte] = {
    val px = synthSamples("img", docId, ImgVariants, ImgBump)
    val img = new java.awt.image.BufferedImage(
      8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val v = px(y * 8 + x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Synthesized 64-sample PCM16 mono WAV: sample i stores
    * ((v − 128) << 8), whose high byte decodeAudio's signed-16 →
    * unsigned-8 truncation maps back to exactly v. */
  private[graft] def wavPayload(docId: Long): Array[Byte] = {
    val smp = synthSamples("aud", docId, AudVariants, AudBump)
    val bb = java.nio.ByteBuffer.allocate(44 + smp.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + smp.length * 2)
      .put("WAVE".getBytes("US-ASCII")).put("fmt ".getBytes("US-ASCII"))
      .putInt(16).putShort(1).putShort(1).putInt(8000).putInt(16000)
      .putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(smp.length * 2)
    smp.foreach(v => bb.putShort(((v - 128) << 8).toShort))
    bb.array()
  }

  /** Staged (doc_id, lo, hi) hash table for one modality: the REAL
    * encode → decode → hash pipeline runs partition-local inside the
    * stage build, once per input dir. `lo`/`hi` are the unsigned
    * 32-bit halves of the 64-bit perceptual hash (cross-engine-safe;
    * bit 63 would flip the sign of a single BIGINT pack). */
  private def hashTable(s: SparkSession, dir: String, kind: String): DataFrame =
    graft.operators.Staged.parquet(s, s"media_${kind}_ahash|$dir") {
      import s.implicits._
      Tables.documents(s, dir).select(col("doc_id"))
        .filter(col("doc_id").isNotNull)
        .as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val hash =
              if (kind == "img") {
                val (lum, w, h) = graft.operators.Multimodal
                  .decodeImageWithDims(imgPayload(id))
                  .getOrElse(sys.error(s"synthesized PNG undecodable for doc $id"))
                graft.operators.Multimodal.aHash64(lum, w, h)
              } else {
                graft.operators.Multimodal.audioHash64(
                  graft.operators.Multimodal.decodeAudio(wavPayload(id)))
              }
            (id, hash & 0xffffffffL, (hash >>> 32) & 0xffffffffL)
          }
        }
        .toDF("doc_id", "lo", "hi")
    }

  /** Verified near-dup edges over a staged hash table, via the shared
    * banded operator (4×16-bit bands, exact Hamming ≤ [[MaxHam]]). */
  private def nearDupEdges(hashes: DataFrame): DataFrame =
    graft.operators.Multimodal.nearDupHashPairs(
      hashes.select(col("doc_id").as("media_id"),
        shiftleft(col("hi"), 32).bitwiseOR(col("lo")).as("ahash")),
      maxHam = MaxHam)
      .select(col("id_a").as("src"), col("id_b").as("dst"))

  /** Staged component labels over one modality's verified near-dup
    * edges (VERDICT r15 #1): q194/q195 each re-ran the label
    * propagation per serve, and q199 ran it THREE times (text + both
    * media legs). Keyed by the hash table's stage key, so a modality's
    * labeling is built once per input dir per JVM and shared across
    * every consumer; q199's legs now read the same artifacts as
    * q194/q195. Labels are deterministic min-ids — oracles unchanged. */
  private def hashClusters(s: SparkSession, dir: String, kind: String): DataFrame =
    graft.operators.ConnectedComponents.clusterStaged(
      s, s"media_${kind}_ahash|$dir")(nearDupEdges(hashTable(s, dir, kind)))

  /** Shared oracle CTE chain: per-doc hash halves from the sample
    * formula, banded candidates, verified pairs, components (q70's
    * recursive-CTE transitive closure). Emits CTE bodies `hh`, `pairs`
    * and `comp`; the caller prepends `WITH RECURSIVE`. `p` prefixes
    * every CTE name so two modality chains (and the text minhash
    * chain, whose names overlap) can coexist in ONE statement —
    * q194/q195 pass "" and their oracle text is byte-identical to the
    * unprefixed original. */
  private def hashCtesSql(prefix: String, variants: Long, bump: Long,
      p: String = ""): String =
    s"""${p}px AS (
         SELECT d.doc_id, t.i,
           ${synthSampleSql(prefix, variants, bump)} AS v
         FROM documents d CROSS JOIN range($NSamples) t(i)
         WHERE d.doc_id IS NOT NULL),
       ${p}ag AS (SELECT doc_id, sum(v) // $NSamples AS thr FROM ${p}px GROUP BY doc_id),
       ${p}hh AS (
         SELECT px.doc_id,
           sum(CASE WHEN px.i < 32 AND px.v > ag.thr
               THEN (1::BIGINT << px.i) ELSE 0 END)::BIGINT AS lo,
           sum(CASE WHEN px.i >= 32 AND px.v > ag.thr
               THEN (1::BIGINT << (px.i - 32)) ELSE 0 END)::BIGINT AS hi
         FROM ${p}px px JOIN ${p}ag ag USING (doc_id) GROUP BY px.doc_id),
       ${p}banded AS (
         SELECT doc_id, lo, hi, b.band,
           CASE b.band WHEN 0 THEN lo % 65536 WHEN 1 THEN lo // 65536
                       WHEN 2 THEN hi % 65536 ELSE hi // 65536 END AS key
         FROM ${p}hh CROSS JOIN range(4) b(band)),
       ${p}pairs AS (
         SELECT DISTINCT a.doc_id AS src, bb.doc_id AS dst
         FROM ${p}banded a JOIN ${p}banded bb
           ON a.band = bb.band AND a.key = bb.key AND a.doc_id < bb.doc_id
         WHERE bit_count(xor(a.lo, bb.lo)) + bit_count(xor(a.hi, bb.hi)) <= $MaxHam),
       ${p}edges AS (
         SELECT src, dst FROM ${p}pairs
         UNION ALL
         SELECT dst, src FROM ${p}pairs),
       ${p}nodes AS (SELECT DISTINCT src AS doc_id FROM ${p}edges),
       ${p}reach AS (
         SELECT doc_id, doc_id AS label FROM ${p}nodes
         UNION
         SELECT e.dst AS doc_id, r.label
         FROM ${p}reach r JOIN ${p}edges e ON e.src = r.doc_id),
       ${p}comp AS (
         SELECT doc_id, min(label) AS cluster_id FROM ${p}reach GROUP BY doc_id)"""

  // q194: the image near-dup GOVERNANCE pipeline — q192's license
  // propagation running on perceptual-hash components instead of
  // MinHash components: per image-bearing document, its verified
  // near-dup cluster and the license taint the cluster's strictest
  // member imposes on it. lo/hi in the output put the decoded hash
  // itself under the differential — a codec regression (colorspace
  // gamma, channel order, grid indexing) fails the hash compare
  // directly.
  private lazy val ImageNearDupDef: QueryDef = QueryDef(
    "q194_image_neardup_license",
    (s, dir) => {
      val hashes = hashTable(s, dir, "img")
      val labels = hashClusters(s, dir, "img")
      val tier = expr(
        "cast(conv(substring(md5(concat('lic|', source)), 1, 2), 16, 10) as int) % 4")
      val docs = Tables.documents(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"), tier.as("tier"))
      val wC = Window.partitionBy(col("cluster_id"))
      val name = (t: org.apache.spark.sql.Column) =>
        when(t === 0, "cc0").when(t === 1, "cc-by")
          .when(t === 2, "cc-by-sa").otherwise("proprietary")
      hashes.join(docs, Seq("doc_id"))
        .join(labels, hashes("doc_id") === labels("node"), "left")
        .withColumn("cluster_id", coalesce(col("label"), col("doc_id")))
        .withColumn("n_members", count(lit(1)).over(wC))
        .withColumn("eff", max(col("tier")).over(wC))
        .select(col("doc_id"), col("lo"), col("hi"), col("cluster_id"),
          col("n_members"),
          name(col("tier")).as("own_license"),
          name(col("eff")).as("effective_license"),
          (col("eff") > col("tier")).as("tainted"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE ${hashCtesSql("img", ImgVariants, ImgBump)},
             dd AS (
               SELECT d.doc_id, hh.lo, hh.hi,
                 ('0x' || substr(md5('lic|' || d.source), 1, 2))::INT % 4 AS tier
               FROM documents d JOIN hh USING (doc_id)),
             j AS (
               SELECT dd.doc_id, dd.lo, dd.hi, dd.tier,
                 coalesce(c.cluster_id, dd.doc_id) AS cluster_id
               FROM dd LEFT JOIN comp c USING (doc_id)),
             g AS (
               SELECT *,
                 count(*) OVER (PARTITION BY cluster_id) AS n_members,
                 max(tier) OVER (PARTITION BY cluster_id) AS eff
               FROM j)
             SELECT doc_id, lo, hi, cluster_id, n_members::BIGINT AS n_members,
               CASE tier WHEN 0 THEN 'cc0' WHEN 1 THEN 'cc-by'
                 WHEN 2 THEN 'cc-by-sa' ELSE 'proprietary' END AS own_license,
               CASE eff WHEN 0 THEN 'cc0' WHEN 1 THEN 'cc-by'
                 WHEN 2 THEN 'cc-by-sa' ELSE 'proprietary' END AS effective_license,
               (eff > tier) AS tainted
             FROM g
             ORDER BY doc_id"""),
  )

  // q195: the audio near-dup GROUPING summary — per verified cluster
  // (singletons included), its size, its distinct-code count (exact
  // dups share a code; near dups differ), and the worst Hamming drift
  // from the representative (the min-id member) — chain-linked
  // members can drift past the pairwise verify threshold, which is
  // exactly what a curation reviewer wants surfaced. The per-doc
  // window pass and the final aggregate share the cluster_id
  // partitioning: one exchange.
  private lazy val AudioNearDupDef: QueryDef = QueryDef(
    "q195_audio_neardup_groups",
    (s, dir) => {
      val hashes = hashTable(s, dir, "aud")
      val labels = hashClusters(s, dir, "aud")
      val wRep = Window.partitionBy(col("cluster_id")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val wCode = Window.partitionBy(col("cluster_id"))
        .orderBy(col("lo"), col("hi"), col("doc_id"))
      hashes
        .join(labels, hashes("doc_id") === labels("node"), "left")
        .withColumn("cluster_id", coalesce(col("label"), col("doc_id")))
        .withColumn("rlo", first(col("lo")).over(wRep))
        .withColumn("rhi", first(col("hi")).over(wRep))
        .withColumn("plo", lag(col("lo"), 1).over(wCode))
        .withColumn("phi", lag(col("hi"), 1).over(wCode))
        .withColumn("new_code",
          when(col("plo").isNull
            .or(col("plo") =!= col("lo")).or(col("phi") =!= col("hi")), 1L)
            .otherwise(0L))
        .withColumn("ham_to_rep", expr(
          "cast(bit_count(lo ^ rlo) + bit_count(hi ^ rhi) as int)"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          sum(col("new_code")).as("n_codes"),
          max(col("ham_to_rep")).as("max_ham_to_rep"))
        .orderBy(col("cluster_id"))
    },
    Some(s"""WITH RECURSIVE ${hashCtesSql("aud", AudVariants, AudBump)},
             pd AS (
               SELECT hh.doc_id, hh.lo, hh.hi,
                 coalesce(c.cluster_id, hh.doc_id) AS cluster_id
               FROM hh LEFT JOIN comp c USING (doc_id)),
             wd AS (
               SELECT *,
                 first_value(lo) OVER (PARTITION BY cluster_id ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS rlo,
                 first_value(hi) OVER (PARTITION BY cluster_id ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS rhi,
                 lag(lo) OVER (PARTITION BY cluster_id ORDER BY lo, hi, doc_id) AS plo,
                 lag(hi) OVER (PARTITION BY cluster_id ORDER BY lo, hi, doc_id) AS phi
               FROM pd)
             SELECT cluster_id,
               count(*)::BIGINT AS n_members,
               sum(CASE WHEN plo IS NULL OR plo <> lo OR phi <> hi
                   THEN 1 ELSE 0 END)::BIGINT AS n_codes,
               max((bit_count(xor(lo, rlo)) + bit_count(xor(hi, rhi)))::INT)
                 AS max_ham_to_rep
             FROM wd
             GROUP BY cluster_id
             ORDER BY cluster_id"""),
  )

  // q199: the CAPSTONE the curation arc implies (r14 verdict #5) —
  // one per-document keep/drop/review verdict unifying all three
  // modality components: the text near-dup component (q70's verified
  // MinHash clusters and its most-tokens keep rule), the image
  // component (q194's perceptual-hash clusters), and the audio
  // component (q195's), under the strictest-license rule ACROSS
  // modalities: a document's effective license is the max tier over
  // every member of every cluster its content belongs to in ANY
  // modality (keeping the text of a post doesn't launder the
  // proprietary image that circulates with a near-dup of it).
  // Verdict: 'drop' if the document is a redundant (non-
  // representative) member of any modality's cluster — its content
  // survives via that cluster's representative; 'review' if it is
  // kept but its effective license is proprietary or propagation
  // tightened it (tainted); 'keep' otherwise. Representatives follow
  // each family's registered convention: most-tokens/min-id for text
  // (q70), min-id for media (q195).
  //
  // Scale shape: pure component-label joins over ALREADY-STAGED
  // artifacts — the q70 staged pair graph and both media hash tables;
  // no new stage build, no pair scan. Each modality pays one
  // cluster-partitioned window exchange (its keep rule and its
  // license max share the partitioning), and the three per-doc
  // verdict frames join on doc_id — corpus ⋈ corpus, allowlisted like
  // q192/q194 (broadcast would be the bug).
  private lazy val MultimodalVerdictDef: QueryDef = QueryDef(
    "q199_multimodal_curation_verdict",
    (s, dir) => {
      val tierE = expr(
        "cast(conv(substring(md5(concat('lic|', source)), 1, 2), 16, 10) as int) % 4")
      val docs = Tables.documents(s, dir)
        .filter(col("doc_id").isNotNull)
        .select(col("doc_id"), tierE.as("tier"),
          size(array_distinct(graft.functions.TextFns.tokens(col("text"))))
            .cast("long").as("ntok"))
      val tLabels = Text.minhashClusters(s, dir, threshold = 0.8)
      val wKeep = Window.partitionBy(col("text_cluster"))
        .orderBy(col("ntok").desc, col("doc_id"))
      val wT = Window.partitionBy(col("text_cluster"))
      val txt = docs.join(tLabels, docs("doc_id") === tLabels("node"), "left")
        .withColumn("text_cluster", coalesce(col("label"), col("doc_id")))
        .withColumn("t_red", row_number().over(wKeep) =!= 1)
        .withColumn("t_eff", max(col("tier")).over(wT))
        .select(col("doc_id"), col("tier"), col("text_cluster"),
          col("t_red"), col("t_eff"))
      def modality(kind: String, cName: String) = {
        val hashes = hashTable(s, dir, kind)
        val labels = hashClusters(s, dir, kind)
        val wC = Window.partitionBy(col(cName))
        hashes.select(col("doc_id"))
          .join(docs.select(col("doc_id"), col("tier").as(s"${kind}_tier")),
            Seq("doc_id"))
          .join(labels, col("doc_id") === labels("node"), "left")
          .withColumn(cName, coalesce(col("label"), col("doc_id")))
          .withColumn(s"${kind}_red",
            col("doc_id") =!= min(col("doc_id")).over(wC))
          .withColumn(s"${kind}_eff", max(col(s"${kind}_tier")).over(wC))
          .select(col("doc_id"), col(cName),
            col(s"${kind}_red"), col(s"${kind}_eff"))
      }
      val img = modality("img", "image_cluster")
      val aud = modality("aud", "audio_cluster")
      val name = (t: org.apache.spark.sql.Column) =>
        when(t === 0, "cc0").when(t === 1, "cc-by")
          .when(t === 2, "cc-by-sa").otherwise("proprietary")
      txt.join(img, Seq("doc_id")).join(aud, Seq("doc_id"))
        .withColumn("eff", greatest(col("t_eff"), col("img_eff"), col("aud_eff")))
        .withColumn("n_dup_modalities",
          col("t_red").cast("long") + col("img_red").cast("long") +
            col("aud_red").cast("long"))
        .withColumn("tainted", col("eff") > col("tier"))
        .select(col("doc_id"), col("text_cluster"), col("image_cluster"),
          col("audio_cluster"), col("n_dup_modalities"),
          name(col("tier")).as("own_license"),
          name(col("eff")).as("effective_license"),
          col("tainted"),
          when(col("n_dup_modalities") > 0, "drop")
            .when(col("eff") === 3 || col("tainted"), "review")
            .otherwise("keep").as("verdict"))
        .orderBy(col("doc_id"))
    },
    Some(s"""WITH RECURSIVE ${Text.minhashPairsSqlCtes(0.8)},
             t_edges AS (
               SELECT doc_a AS src, doc_b AS dst FROM pairs
               UNION ALL
               SELECT doc_b, doc_a FROM pairs),
             t_nodes AS (SELECT DISTINCT src AS doc_id FROM t_edges),
             t_reach AS (
               SELECT doc_id, doc_id AS label FROM t_nodes
               UNION
               SELECT e.dst AS doc_id, r.label
               FROM t_reach r JOIN t_edges e ON e.src = r.doc_id),
             t_comp AS (
               SELECT doc_id, min(label) AS cluster_id
               FROM t_reach GROUP BY doc_id),
             ${hashCtesSql("img", ImgVariants, ImgBump, "im_")},
             ${hashCtesSql("aud", AudVariants, AudBump, "au_")},
             d AS (
               SELECT doc_id,
                 ('0x' || substr(md5('lic|' || source), 1, 2))::INT % 4 AS tier,
                 len(list_distinct(string_split(text, ' ')))::BIGINT AS ntok
               FROM documents WHERE doc_id IS NOT NULL),
             tg AS (
               SELECT d.doc_id, d.tier,
                 coalesce(c.cluster_id, d.doc_id) AS text_cluster, d.ntok
               FROM d LEFT JOIN t_comp c USING (doc_id)),
             tw AS (
               SELECT doc_id, tier, text_cluster,
                 (row_number() OVER (PARTITION BY text_cluster
                    ORDER BY ntok DESC, doc_id) <> 1) AS t_red,
                 max(tier) OVER (PARTITION BY text_cluster) AS t_eff
               FROM tg),
             ig AS (
               SELECT hh.doc_id,
                 coalesce(c.cluster_id, hh.doc_id) AS image_cluster, d.tier
               FROM im_hh hh JOIN d USING (doc_id)
               LEFT JOIN im_comp c USING (doc_id)),
             iw AS (
               SELECT doc_id, image_cluster,
                 (doc_id <> min(doc_id) OVER (PARTITION BY image_cluster)) AS i_red,
                 max(tier) OVER (PARTITION BY image_cluster) AS i_eff
               FROM ig),
             ug AS (
               SELECT hh.doc_id,
                 coalesce(c.cluster_id, hh.doc_id) AS audio_cluster, d.tier
               FROM au_hh hh JOIN d USING (doc_id)
               LEFT JOIN au_comp c USING (doc_id)),
             uw AS (
               SELECT doc_id, audio_cluster,
                 (doc_id <> min(doc_id) OVER (PARTITION BY audio_cluster)) AS a_red,
                 max(tier) OVER (PARTITION BY audio_cluster) AS a_eff
               FROM ug),
             f AS (
               SELECT t.doc_id, t.text_cluster, i.image_cluster, a.audio_cluster,
                 t.tier,
                 greatest(t.t_eff, i.i_eff, a.a_eff) AS eff,
                 (t.t_red::INT + i.i_red::INT + a.a_red::INT)::BIGINT
                   AS n_dup_modalities
               FROM tw t JOIN iw i USING (doc_id) JOIN uw a USING (doc_id))
             SELECT doc_id, text_cluster, image_cluster, audio_cluster,
               n_dup_modalities,
               CASE tier WHEN 0 THEN 'cc0' WHEN 1 THEN 'cc-by'
                 WHEN 2 THEN 'cc-by-sa' ELSE 'proprietary' END AS own_license,
               CASE eff WHEN 0 THEN 'cc0' WHEN 1 THEN 'cc-by'
                 WHEN 2 THEN 'cc-by-sa' ELSE 'proprietary' END AS effective_license,
               (eff > tier) AS tainted,
               CASE WHEN n_dup_modalities > 0 THEN 'drop'
                    WHEN eff = 3 OR eff > tier THEN 'review'
                    ELSE 'keep' END AS verdict
             FROM f ORDER BY doc_id"""),
  )

  def defs: Seq[QueryDef] = Seq(ImageNearDupDef, AudioNearDupDef,
    MultimodalVerdictDef)
}
