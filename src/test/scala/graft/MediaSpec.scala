package graft

/** q194/q195 multimodal near-dup: the codec round-trip LAW. The
  * engine's hash halves come through the real encode → decode →
  * perceptual-hash pipeline (PNG via javax.imageio, WAV PCM16 via
  * javax.sound.sampled); this spec re-derives the documented sample
  * formula and the aHash law in plain Scala (md5 bytes, integer
  * means, threshold bits — no code shared with Media.scala's
  * synthesis or Multimodal's hash) and requires the engine output to
  * match bit-for-bit. A codec regression — colorspace gamma, channel
  * order, endianness, PCM truncation drift — fails here (and in the
  * DuckDB differential) instead of silently shifting clusters.
  * Decode of arbitrary real-world payloads stays covered by
  * OperatorsSpec; this pins the one path where a closed form exists.
  */
class MediaSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def md5b(s: String): Int =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))(0) & 0xff

  private def samples(prefix: String, id: Long, variants: Long, bump: Long): Array[Int] = {
    val g = id / variants
    val variant = id % variants
    Array.tabulate(64)(i =>
      ((md5b(s"$prefix|$g|$i") + (if (i < variant) bump else 0L)) % 251L).toInt)
  }

  private def hashHalves(v: Array[Int]): (Long, Long) = {
    val thr = v.map(_.toLong).sum / 64
    var lo = 0L; var hi = 0L
    var i = 0
    while (i < 64) {
      if (v(i) > thr) {
        if (i < 32) lo |= (1L << i) else hi |= (1L << (i - 32))
      }
      i += 1
    }
    (lo, hi)
  }

  test("q194 image hashes: PNG encode→decode→aHash equals the documented formula") {
    val rows = SparkEntry.queries("q194_image_neardup_license")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val (lo, hi) = hashHalves(samples("img", id, 4L, 60L))
      assert(r.getLong(1) == lo && r.getLong(2) == hi,
        s"doc $id: codec path diverged from formula " +
          s"(got ${r.getLong(1)}/${r.getLong(2)}, want $lo/$hi)")
    }
    // non-vacuity: the variant structure produces real multi-member
    // clusters, and the tier map produces real taint
    assert(rows.exists(_.getLong(4) > 1), "no multi-member image cluster")
    assert(rows.exists(_.getBoolean(7)), "no tainted representative")
    assert(rows.exists(!_.getBoolean(7)), "everything tainted — tier map degenerate")
  }

  test("q195 audio hashes: WAV encode→decode→audioHash equals the documented formula") {
    import org.apache.spark.sql.functions.col
    // per-cluster output carries no per-doc hashes, so pin the staged
    // codec law through the same private path the query uses: group
    // every doc by its formula-derived hash and require q195's
    // distinct-code accounting to be consistent with it
    val out = SparkEntry.queries("q195_audio_neardup_groups")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    assert(out.nonEmpty)
    out.foreach { case (cid, members, codes, maxHam) =>
      assert(members >= 1 && codes >= 1 && codes <= members,
        s"cluster $cid: codes $codes vs members $members")
      assert(maxHam >= 0 && maxHam <= 64, s"cluster $cid: ham $maxHam")
      if (members == 1)
        assert(codes == 1 && maxHam == 0, s"singleton $cid malformed")
    }
    assert(out.exists(_._2 > 1), "no multi-member audio cluster")
    // independent totals: every non-null doc appears in exactly one
    // cluster, and the distinct-code total matches the formula hashes
    val ids = Tables.documents(spark, sfDir)
      .filter(col("doc_id").isNotNull)
      .select("doc_id").collect().map(_.getLong(0))
    assert(out.map(_._2).sum == ids.length, "cluster sizes don't cover the corpus")
    // exact-duplicate codes always share all 4 bands, so they always
    // land in one cluster — per-cluster distinct-code counts must sum
    // to the GLOBAL distinct-code count of the formula hashes exactly
    val formulaHashes = ids.map(id => hashHalves(samples("aud", id, 3L, 47L)))
    assert(out.map(_._3).sum == formulaHashes.distinct.length,
      s"distinct-code accounting ${out.map(_._3).sum} != " +
        s"formula ${formulaHashes.distinct.length}")
  }

  test("q199 composes the modality components under the strictest-license rule") {
    val rows = SparkEntry.queries("q199_multimodal_curation_verdict")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    val lic = Seq("cc0", "cc-by", "cc-by-sa", "proprietary")
    rows.foreach { r =>
      val own = lic.indexOf(r.getString(5))
      val eff = lic.indexOf(r.getString(6))
      val nd = r.getLong(4)
      val tainted = r.getBoolean(7)
      assert(own >= 0 && eff >= own,
        s"doc ${r.getLong(0)}: effective license weaker than own")
      assert(tainted == (eff > own), s"doc ${r.getLong(0)}: taint flag wrong")
      assert(nd >= 0 && nd <= 3)
      val want = if (nd > 0) "drop" else if (eff == 3 || tainted) "review" else "keep"
      assert(r.getString(8) == want,
        s"doc ${r.getLong(0)}: verdict ${r.getString(8)}, want $want")
    }
    // non-degeneracy: all three verdicts occur at sf0.001
    assert(rows.map(_.getString(8)).toSet == Set("keep", "drop", "review"),
      s"verdict set degenerate: ${rows.map(_.getString(8)).toSet}")
    // component agreement with the registered per-modality queries:
    // the capstone must not re-derive DIFFERENT clusters
    val imgClusters = SparkEntry.queries("q194_image_neardup_license")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    val txtClusters = SparkEntry.queries("q70_fuzzy_dedup")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(imgClusters(r.getLong(0)) == r.getLong(2),
        s"doc ${r.getLong(0)}: image cluster diverged from q194")
      assert(txtClusters(r.getLong(0)) == r.getLong(1),
        s"doc ${r.getLong(0)}: text cluster diverged from q70")
    }
  }
}
