package graft

/** Enforced version of the PlanAudit sweep: every registered query's
  * physical plan must be free of the hard anti-patterns — Expand
  * (mixed-distinct aggregates), CartesianProduct (unbroadcast cross),
  * ScalaUDF / BatchEvalPython (codegen black boxes), and the
  * whole-group-buffering exact percentile aggregates — except the
  * known by-design carve-outs. Planning only (no collect): the
  * initial physical plan is inspected, which is where these nodes
  * appear or don't; AQE re-planning never INTRODUCES one of them.
  * Shuffled joins are deliberately not enforced here (legitimate for
  * fact-to-fact work) — PlanAudit prints them for human review.
  */
class PlanHygieneSpec extends SparkSuite {

  private val sfDir = "/root/testdata/sf0.001"

  // flag -> queries allowed to carry it, with the reason pinned where
  // the carve-out is granted.
  private val allowed: Map[String, Set[String]] = Map(
    // ROLLUP/CUBE grouping sets plan an Expand by definition.
    "Expand" -> Set("q44_rollup_pricing", "q55_cube_summary"),
    // Legitimately shuffled joins, pinned per query (round-5 verdict
    // #5: a dim join silently losing its broadcast — threshold
    // drift, stats miss — previously failed nothing; now anything
    // off this list fails the suite):
    //  - q94: the salted-skew-join demonstration, which PlanSpec
    //    REQUIRES to be a real shuffle join;
    //  - q70/q86: corpus ⋈ corpus verdict joins (cluster labels /
    //    dedup drops joined back onto every document or vector) —
    //    both sides scale with the corpus, so a broadcast would be
    //    the bug. Bounded-by-construction sides elsewhere (q72/q103
    //    re-rank top-10, q112 exact top-k) carry explicit broadcast
    //    hints instead; every other join must broadcast a dim.
    //  - q122: the prefix-filter self-join (prefix ⋈ prefix on the
    //    shingle) and the candidate→token-set verification joins —
    //    every side scales with the corpus, so these are the
    //    legitimately-shuffled exact-similarity-join exchanges.
    //  - q127: the snapshot-diff full-outer join — two corpus-scale
    //    snapshots keyed on the primary key; the shuffle disappears
    //    only when snapshots are stored bucketed by key
    //    (storage-partitioned join), never via broadcast.
    //  - q136/q138/q140: the kNN-graph / hard-negative cluster-mate
    //    self-joins and the label-propagation edge ⋈ labels rounds —
    //    the same corpus ⋈ corpus shape as q86 (both sides scale
    //    with the corpus; broadcast would be the bug).
    //  - q143: the containment join's tail candidate join (prefix ⋈
    //    full postings) and payload verification joins — the q122
    //    exact-similarity-join exchanges in directed form.
    //  - q160/q164: the q70 shape reused — cluster labels (one row
    //    per node of the pair graph, scales with the corpus) joined
    //    back onto every document for fold assignment / sampling
    //    weights (q164 additionally joins corpus-scale cluster sizes
    //    back onto the assignment); broadcast would be the bug.
    //  - q183: the bitext cluster-blocked src ⋈ tgt join and the
    //    margin joins (per-src/per-tgt neighborhood means joined back
    //    onto every candidate pair) — the q136/q138 cluster-mate
    //    shape; both sides scale with the corpus.
    //  - q186: the cluster-blocked train ⋈ eval decontamination join
    //    (eval is a fixed FRACTION of the corpus, not a dim) and the
    //    verdict join back onto every train vector — the q86 shape.
    //  - q192: q70's verdict join reused verbatim (component labels —
    //    one row per node of the pair graph, scales with the corpus —
    //    joined back onto every document for license propagation).
    //  - q194/q195: the perceptual-hash twin of the q70/q192 shapes —
    //    the 4×16-bit banded candidate self-join (hash table ⋈ hash
    //    table on the band key; both sides scale with the media
    //    corpus) and the component-label verdict join back onto every
    //    document; broadcast would be the bug.
    //  - q199: the cross-modality capstone — the q192/q194 verdict
    //    joins three times over (text/image/audio component labels
    //    joined back onto every document) plus the final three-way
    //    per-doc join of the modality verdict frames; every side
    //    scales with the corpus.
    "SortMergeJoin" -> Set("q94_salted_skew_join", "q70_fuzzy_dedup",
      "q86_semantic_dedup", "q122_exact_jaccard_join", "q127_snapshot_diff",
      "q136_knn_graph", "q138_hard_negatives", "q140_label_propagation",
      "q143_containment_join", "q148_triangle_count", "q160_leakage_safe_folds",
      "q164_dedup_weights", "q183_bitext_margin_mining",
      "q186_embedding_decontamination", "q192_license_propagation",
      "q194_image_neardup_license", "q195_audio_neardup_groups",
      "q199_multimodal_curation_verdict"),
    "ShuffledHashJoin" -> Set("q94_salted_skew_join", "q70_fuzzy_dedup",
      "q86_semantic_dedup", "q122_exact_jaccard_join", "q127_snapshot_diff",
      "q136_knn_graph", "q138_hard_negatives", "q140_label_propagation",
      "q143_containment_join", "q148_triangle_count", "q160_leakage_safe_folds",
      "q164_dedup_weights", "q183_bitext_margin_mining",
      "q186_embedding_decontamination", "q192_license_propagation",
      "q194_image_neardup_license", "q195_audio_neardup_groups",
      "q199_multimodal_curation_verdict"))

  private val flags = Seq("Expand", "CartesianProduct", "ScalaUDF",
    "BatchEvalPython", "SortMergeJoin", "ShuffledHashJoin",
    "median(", "percentile(")

  test("every registered query plans free of hard anti-patterns") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      flags.filter(f => plan.contains(f) && !allowed.getOrElse(f, Set.empty)(name))
        .map(f => s"$name: $f")
    }
    assert(offenders.isEmpty,
      s"anti-patterns outside the allowlist:\n${offenders.mkString("\n")}")
  }
}
