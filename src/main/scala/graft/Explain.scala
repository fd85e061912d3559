package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the headline queries to a markdown
  * file — the plan evidence for the 100 TB design claims (broadcast dim
  * joins, pushed filters, pruned scans, TakeOrdered, partial
  * aggregation). Usage: tools/run.sh graft.Explain [sfDir] [outFile].
  */
object Explain {
  private val Headline = Seq(
    "q01_flagship_customer_stats", "q03_derived_projection",
    "q05_latest_orders", "q09_region_revenue", "q24_domain_transform",
    "q33_minhash_lsh_pairs",
    // round 11: q34's tail changed (raw-size threshold keeps the
    // fround CASE out of the payload-join condition) — dump the new
    // shape next to its q33 sibling.
    "q34_ngram_jaccard_blocked",
    "q37_cosine_topk_bruteforce", "q51_asof_join",
    "q54_simhash_hamming_pairs", "q58_session_window_native",
    // round 16: q68/q70 were excluded while ConnectedComponents ran
    // eager actions at plan-construction time; the labeling is a
    // staged artifact now (VERDICT r15 #1), so their SERVING plans —
    // staged label scan + window tail, the shape the 100 TB claim
    // rests on — are dumpable like q85's.
    "q68_neardup_clusters", "q70_fuzzy_dedup",
    "q61_participants_projection", "q69_tfidf_topk", "q72_ann_quantized",
    "q75_chunk_dedup_corpus", "q78_sequence_windows", "q82_range_join",
    "q84_curation_pipeline",
    // q85's QUERY plan is the staged-parquet read since round 6 (the
    // hierarchical chain stages once per input dir); the build plan
    // the 100 TB claims rest on is dumped separately below, like
    // q24's.
    "q85_kmeans_assign", "q87_unigram_lm_score", "q88_scd2_intervals",
    "q90_neardup_pagerank",
    // round 4: IVF map-side argmax, Bloom bitmap projection (no join
    // on the corpus path), salted exchange, funnel range frame,
    // generated gap-fill grid, deep broadcast-dim join tree.
    "q53_ann_ivf", "q92_bloom_decontamination", "q94_salted_skew_join",
    "q95_event_funnel", "q98_resample_gapfill", "q100_volume_shipping",
    // round 5: distributed prefix-sum forms (no single-key window over
    // the corpus; q66 additionally prunes budget-exceeded buckets
    // pre-sort), cell-restricted IVF×SQ serving, trained-quantizer
    // ANN, exact-budget mixture rebalancing.
    "q63_training_selection", "q66_token_budget_pack",
    "q103_ann_ivf_sq", "q104_ann_ivf_trained", "q105_mixture_rebalance",
    // late round 5: q56's median rebuilt on ExactMedian (no
    // whole-group percentile buffer anywhere in the plan), q106's
    // shared-histogram quantile profile, q110's map + TakeOrdered
    // priority sample.
    "q56_exact_stats", "q106_exact_quantiles", "q110_priority_sample",
    // round 6: incremental pair-graph delta path (staged base reads +
    // new-docs-only signatures), ANN recall verdict, mergeable
    // log-bucketed quantile sketch.
    "q111_incremental_pairs", "q112_ann_recall", "q113_quantile_sketch",
    // late round 6: zero-shuffle BM25 retrieval (narrow map +
    // TakeOrdered, the q110 shape), duplicated-span coverage (exact-
    // substring dedup, head/tail Zipf-safe df join).
    "q114_bm25_retrieval", "q115_dup_span_coverage",
    // round 7: exact-substring removal over the staged span table —
    // dup set + per-doc start lists broadcast back, token mask is a
    // narrow higher-order projection; training shuffle + shards
    // (narrow-map shard bits + PrefixSum positions, no whole-shard
    // window); multi-band LSH recall verdict (independent md5
    // hyperplanes, broadcast probe keys, id-deduped band union).
    "q116_exact_substring_removal", "q117_training_shuffle_shards",
    "q118_lsh_recall",
    // late round 7: DSIR broadcast-weight scoring (256-bucket
    // histogram, doc-keyed single exchange), RRF fusion (two
    // TakeOrdered cuts + constant-K windows, union-groupBy — no
    // join), Z-order layout audit (narrow 32-term Morton map +
    // 2^8-key HashAggregate), exact prefix-filter similarity join
    // (per-doc windows, prefix-only candidate exchange).
    "q119_dsir_importance", "q120_hybrid_rrf", "q121_zorder_layout",
    "q122_exact_jaccard_join", "q123_grouped_regression",
    "q124_minhash_recall",
    // round-7 continuation: blocked inverted index (bounded
    // collect_list per (term, block), Merkle digest rollup),
    // MaxScore-pruned BM25 (pruning filter + narrow score +
    // TakeOrdered, stats as plan literals), snapshot-diff CDC
    // (key-partitioned full-outer + commutative bit_xor fold),
    // Count-Min probe join (1024-cell broadcast), JL projection
    // (pair aggregate + literal sign table), BPE vocabulary (8
    // chained replaces over the type table), PCA moments (d²-bounded
    // cross-product aggregate).
    "q125_inverted_index", "q126_maxscore_topk", "q127_snapshot_diff",
    "q128_countmin_sketch", "q129_jl_projection", "q131_bpe_vocab",
    "q132_pca_moments",
    // learned-curation wave: logistic-regression scoring (the final
    // apply pass — narrow map with D literal weights; the GD steps
    // run before planning, so the dumped plan is the serving shape),
    // domain mixture reweighting (corpus → one bounded row per
    // domain, broadcast scalars after), bigram LM (single corpus-side
    // join keyed by (w1,w2), vocab ⋈ vocab enrichment), kNN graph
    // (cluster-mate self-join on the staged hierarchical build,
    // bounded per-vector window).
    "q133_quality_classifier", "q134_domain_mixture", "q135_bigram_lm",
    "q136_knn_graph",
    // round 11: plan-unrolled greedy beam search over the navigable
    // graph (fixed hops — no driver iteration; bounded frontier joins
    // against the symmetrized kNN + hub adjacency).
    "q174_ann_graph_search",
    // round 12: the same walk over the MAINTAINED graph (staged base
    // ∪ frozen-layer attach) and the tombstone-masked serve (mask is
    // one narrow filter on the final beam).
    "q176_ann_graph_serve_delta", "q177_ann_graph_tombstone_serve",
    // tokenizer fertility (type-level joins only after the one corpus
    // collapse) and hard-negative mining (cluster-mate self-join,
    // label-filtered).
    "q137_tokenizer_fertility", "q138_hard_negatives",
    // perplexity buckets (staged score read + quantilesDisc broadcast
    // thresholds) and label propagation (fixed-round edge ⋈ labels).
    "q139_perplexity_buckets", "q140_label_propagation",
    // mixture budgets applied as a greedy prefix selection (PrefixSum
    // cum-sum, broadcast budget row).
    "q141_mixture_apply",
    // embedding drift monitor: one exploded integer-moment aggregate,
    // 2d bounded rows, narrow stats map.
    "q142_embedding_drift",
    // directed containment join: A-side-only prefix cut, head
    // candidates broadcast, tail prefix ⋈ postings exchange.
    "q143_containment_join",
    // skew audit (one fact aggregate + derived-table quantiles) and
    // nDCG eval (two TakeOrdered cuts, no corpus shuffle).
    "q144_skew_audit", "q145_ndcg_eval",
    // diversity audit (derived count table + broadcasts) and
    // k-anonymity gate (bounded-cardinality aggregate + summary).
    "q146_corpus_diversity", "q147_k_anonymity",
    // triangle census (degree-ordered wedge join) and SES forecast
    // (one aggregate + broadcast scalar, window-free).
    "q148_triangle_count", "q149_exp_smoothing",
    // PQ encode: trained codebooks as plan literals, narrow argmin
    // map, output sort as the only exchange.
    "q150_pq_encode", "q151_pq_adc_search",
    // classifier holdout eval (per-score-grid AUC window over an
    // aggregate) and fairness audit (group aggregate + broadcast).
    "q152_classifier_eval", "q153_fairness_audit",
    // the complete IVFPQ serving plan: cell-restricted candidates,
    // code-only ADC, bounded broadcast re-rank.
    "q154_ann_ivfpq",
    // length bucketing: CASE-map buckets, PrefixSum positions, two
    // bounded aggregate chains with broadcast scalars.
    "q155_length_bucketing",
    // round 8: three-ranker RRF (three TakeOrdered cuts, union-
    // groupBy, no corpus join), filtered ANN (label predicate inside
    // the nprobe=4 cell scan + exact filtered ground truth),
    // matryoshka ablation (one scan, four prefix kernels),
    // curriculum schedule (PrefixSum ranks + 16-row apportionment
    // broadcast), rerank cascade (top-50 shortlist broadcast to the
    // embeddings scan), incremental IVF (staged base + delta-only
    // argmax), tombstoned serve (NOT is_deleted pushed into the
    // cell scan + per-cell compaction audit).
    "q156_hybrid_rrf3", "q157_filtered_ann", "q158_matryoshka_recall",
    "q159_curriculum_schedule", "q161_rerank_cascade",
    "q162_incremental_ivf", "q163_ann_tombstones",
    // rounds 8-9 tail: dedup-aware weights (component-size weights off
    // the staged near-dup components), PSI drift (ExactMedian decile
    // thresholds broadcast, ≤20-row PSI aggregate), epoch allocation
    // (corpus collapses to one row per source, largest-remainder
    // integer budgets), ANN compaction (median-threshold cell rewrite
    // of the staged tombstoned index; serve plan ≡ q163's).
    "q164_dedup_weights", "q165_psi_drift", "q166_epoch_allocation",
    "q167_ann_compaction",
    // round 13: bidirectional margin mining — cluster-blocked src ⋈
    // tgt exchange, rank-pivoted fixed-order top-4 means joined back,
    // per-src argmax (a new composite next to q136/q138's shapes).
    // The graph-lifecycle serves (q179/q181/q182) share q174/q176/
    // q177's dumped walk family; the new COMPACTION build plan is
    // dumped separately below.
    "q183_bitext_margin_mining",
    // round 13 second wave: binary-quantization serving (16-byte
    // column-pruned code scan × broadcast probes, WindowGroupLimit
    // partial trim, bounded float-payload re-rank — a new kernel
    // family; q187's cell-pruned variant shares q103's dumped layout
    // shape, q191's sweep unrolls this one three times), min-k% prob
    // (head/tail-joined token stream → per-doc rank window selecting
    // an integer-exact tail — a new per-token composite next to
    // q87's plain mean), in-context packing (staged read + ONE fcid
    // window carrying rank AND lead, groupBy — no join anywhere in
    // the serve), source JSD drift (per-(source,w) map-side collapse,
    // corpus counts via a window OVER THE AGGREGATE keyed on w,
    // integer-exact terms — the no-Zipf-key-in-an-exchange shape).
    "q184_ann_binary_hamming", "q185_minkprob_membership",
    "q188_incontext_packing", "q189_source_token_drift",
    // round 14: the vocabulary-coverage curve — windows over the
    // ~sqrt(T)-row count-of-counts aggregate, never the per-type
    // ranking. (q194/q195 are excluded like q68/q70: their component
    // step runs eager actions during construction, so the dumped tail
    // would start at the post-checkpoint labels; their banded-pair
    // shape is q33/q54's, already dumped.)
    "q193_vocab_coverage",
    // round 14 second wave: prototypicality pruning (ONE fcid-hashed
    // exchange carrying both window frames — the cheap member of the
    // selection family), MaxSim late interaction (staged sparse
    // chunk features ⋈ broadcast probe features on bucket, two
    // key-narrowing HashAggregates, WindowGroupLimit top-10 — the
    // multi-vector twin of q184's serving shape), TracIn self-
    // influence (checkpoint weights as plan literals over the staged
    // feature scan, TakeOrderedAndProject — no corpus shuffle at
    // all).
    "q196_prototypicality_prune", "q197_maxsim_retrieval",
    "q198_tracin_selfinfluence",
    // round 15: the water-filling mixture allocator — the plan
    // evidence is the |sources|-row tail (unpartitioned windows over
    // a dim-sized frame, 1-row broadcast scalars) downstream of the
    // shared staged word-count aggregate.
    "q200_token_budget_mixture",
    // round 16: the multimodal governance faces join the dump — all
    // component labelings are staged artifacts now, so q199's serving
    // plan is three label scans + cluster-partitioned windows + the
    // allowlisted doc_id verdict joins, with zero eager actions.
    "q194_image_neardup_license", "q195_audio_neardup_groups",
    "q199_multimodal_curation_verdict")

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("PLANS.md")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // every entry point pins the AQE coalesce floor (the r11 q34
      // lesson) so dumped plan shapes match the benched ones
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append(s"# Physical plans (headline queries, $sfDir)\n\n")
    sb.append("Generated by `graft.Explain`; the properties these plans are\n")
    sb.append("expected to show are asserted in `PlanSpec`.\n\n")
    sb.append("SELECTION RULE: one representative per PHYSICAL PATTERN\n")
    sb.append("FAMILY, chosen when the pattern first ships (the inline\n")
    sb.append("comments in `Explain.Headline` name each family). Queries\n")
    sb.append("sharing a dumped representative's shape (e.g. the ~40\n")
    sb.append("broadcast-dim + hash-agg relational queries shaped like q01/\n")
    sb.append("q09) are not duplicated here; EVERY query's plan is still\n")
    sb.append("machine-checked by the enforced PlanHygieneSpec sweep over\n")
    sb.append("the full registry (Expand / CartesianProduct / ScalaUDF /\n")
    sb.append("shuffled joins / whole-group percentiles, allowlist with\n")
    sb.append("rationale per by-design flag) plus the per-pattern PlanSpec\n")
    sb.append("asserts. Queries whose QUERY plan is a staged-parquet read\n")
    sb.append("dump their stage BUILD plan separately below.\n")
    Headline.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    // The q24 QUERY plan above is the staged-parquet read (the narrow
    // silver is built once per input via operators.Staged); the
    // transform plan the 100 TB claims rest on is what the stage
    // WRITER runs — dumped here so the evidence stays in this file.
    locally {
      val build = graft.queries.Domain.silverBuild(spark, sfDir)
      val plan = build.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## q24_domain_transform (stage build)\n\n```\n$plan```\n")
    }
    // Same for q85: the hierarchical clustering chain (coarse literal
    // assignment -> PrefixSum seed rank -> cell-keyed fine Lloyd) is
    // what the stage writer runs; the fine level must show
    // partial_min_by and no single-key window over raw rows
    // (PlanSpec asserts both).
    locally {
      val build = graft.queries.Clustering.hierBuild(spark, sfDir)
      val plan = build.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## q85_kmeans_assign (hierarchical stage build)\n\n```\n$plan```\n")
    }
    // Same for q158: the staged cut read hides the quadratic pair
    // scan; the build plan must show the prefix-norm folds in a
    // projection BELOW the broadcast pair join — one fold per row,
    // not per pair (PlanSpec asserts it on the optimized plan).
    locally {
      val build = graft.queries.Vectors.matryoshkaCutBuild(spark, sfDir)
      val plan = build.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## q158_matryoshka_recall (cut stage build)\n\n```\n$plan```\n")
    }
    // Same for q178: the query plan reads the staged compacted edge
    // set; the compaction transform itself (analytic liveness splits,
    // repair candidates through two key-partitioned equi-joins on the
    // deleted node, per-(a,d) top-2 window, anti-join vs kept) is
    // what the q178compact stage writer runs.
    locally {
      val build = graft.queries.Clustering.compactBuildPlan(spark, sfDir)
      val plan = build.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## q178_ann_graph_compaction (compaction stage build)\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
