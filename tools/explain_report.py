#!/usr/bin/env python
"""Regenerate PLANS.md: physical-plan evidence for the headline queries.

For each query: exchange/broadcast counts, join strategies, pushed
filters, read schemas (column pruning), and whole-stage-codegen
presence — the properties that decide 100 TB behavior.  Run from the
repo root: ``python tools/explain_report.py``.
"""

from __future__ import annotations

import io
import re
import sys
from contextlib import redirect_stdout
from pathlib import Path

REPORT = [
    "a2_group_counts",
    "a3_tumbling_counts",
    "a6_mapreduce_wordcount",
    "a7_weighted_species_score",
    "a9_percentiles",
    "j1_pricing_summary",
    "j2_star_revenue_by_region",
    "j5_shipping_priority",
    "j7_left_join_order_activity",
    "j9_argmin_supplier_per_part",
    "j12_priority_exists",
    "j13_big_order_customers",
    "j14_returnflag_priority_mix",
    "j15_above_brand_avg",
    "r3_grouping_sets",
    "p1_unpivot_measures",
    "n1_null_semantics",
    "v1_variant_props",
    "u4_intersect_all",
    "w1_running_revenue",
    "w3_gap_sessionize",
    "m1_transition_pairs",
    "m2_markov_probabilities",
    "o1_sort_by_event_time",
    "k4_minhash_jaccard",
    "d1_exact_dedup",
    "d3_minhash_lsh_candidates",
    "sim1_cosine_topk",
    "sim4_ivf_ann",
    "t7_token_counts",
    "t9_contamination_overlap",
    "j16_volume_shipping",
    "j19_returned_revenue",
    "j20_customer_distribution",
    "j23_waiting_orders",
    "j25_important_parts",
    "w4_order_gap_days",
    "w8_weekly_moving_revenue",
    "ts1_gap_fill",
    "str1_fuzzy_part_match",
    "pipeline1_clean_corpus",
    "d5_dedup_clusters",
    "sim5_ivf_kmeans_ann",
    "chunk1_token_windows",
    "split1_train_val_test",
    "shuffle1_training_order",
    "pack1_sequence_packing",
    "samp1_stratified_sample",
    "pipeline2_training_manifest",
    "s7_bucketed_join",
    "d3b_minhash_lsh_md5",
    "sim2_signlsh_ann",
    "d4_simhash",
    "t10_winnowing_fingerprints",
    "k8_cms_heavy_hitters",
    "g5_pagerank_habitats",
    "mm4_png_roundtrip",
    "ql1_domain_quota",
    "t11_tfidf_retrieval",
    "s8_merge_upsert",
    "ql2_gopher_repetition",
    "t12_inverted_index",
    "lm1_bigram_lm",
    "sim6_pq_adc",
    "g6_cooccurrence_triangles",
    "cdc1_scd2_intervals",
    "w9_trailing_30d_revenue",
    "hist1_value_histogram",
    "dq2_zscore_outliers",
    "tk1_salted_topk_orders",
    "rc1_transitive_closure",
    "ts2_rolling_median_deviation",
    "sim8_label_centroids",
    "j28_banded_interval_join",
    "fh1_feature_hash",
    "mm5_wav_roundtrip",
    "sql1_shared_text_pricing",
    "d8_repeated_spans",
    "fs1_minmax_scale",
    "d9_simhash_pairs",
    "drift1_tvd_halves",
    "d5b_dedup_clusters_md5",
    "eval2_ann_recall_ivf",
    "eval3_ann_recall_pq",
    "mm6_jpeg_roundtrip",
    "semdedup1_cluster_prune",
    "qc1_linear_quality",
    "lm2_perplexity_gate",
    "sim9_knn_classify",
    "mm7_video_roundtrip",
    "d10_sparse_cosine_verify",
    "rag1_retrieve_read",
    "mix1_temperature_sampling",
    "kmv1_distinct_estimate",
    "kmv2_intersection_estimate",
    "reg1_normal_equations",
    "lm3_perplexity_buckets",
    "tok1_bpe_apply",
    "d11_priority_dedup",
    "shuffle2_epoch_orders",
    "semdedup2_trained_prune",
    "semdedup3_hierarchical_prune",
    "dsir1_importance_resample",
    "d12_incremental_dedup",
    "ent1_token_entropy_gate",
    "zorder1_layout_stats",
    "semdedup4_two_level_trained",
    "decon1_remove_contaminated",
    "samp2_weighted_wor",
    "pipeline3_curation_manifest",
    "s9_schema_evolution",
    "sim10_hard_negatives",
    "mrl1_matryoshka_recall",
    "mix2_budget_waterfill",
    "pair1_preference_pairs",
    "eval4_lsh_precision",
    "eval5_lsh_recall",
    "mm8_audio_frame_features",
    "fim1_span_corruption",
    "pack2_boundary_masks",
    "s10_encoding_stats",
    "skew1_join_key_diagnostics",
    "roll1_weekly_from_daily",
    "st12_stream_rollup_maintenance",
    "d13_span_removal_dedup",
    "eval6_rouge_overlap",
    "conv1_chat_threads",
    "batch1_length_grouped",
    "anon1_k_anonymity",
    "tok2_vocab_coverage",
    "j29_bloom_semijoin_reduction",
    "id1_global_enumeration",
    "er1_entity_resolution",
    "mm9_ahash_near_dup",
    "t13_bm25_retrieval",
    "st13_late_data_audit",
    "dq3_chi2_independence",
    "dp1_randomized_response",
    "cuped1_adjusted_delta",
    "g8_geo_neighbor_join",
    "attr1_last_touch",
    "auc1_classifier_eval",
    "w10_error_run_detection",
    "eval7_distinct_n",
    "ndcg1_retrieval_quality",
    "tok3_unigram_train",
    "pack3_bfd_packing",
    "sq1_int8_recall",
    "d14_winnowing_pairs",
    "lm4_kneser_ney",
    "t14_pmi_collocations",
    "t15_heaps_curve",
    "funnel1_conversion",
    "dq4_referential_integrity",
    "shard1_rendezvous",
    "cohort1_retention",
    "st14_stream_dedup",
    "ks1_two_sample",
    "g9_kcore_peel",
    "ece1_calibration",
    "ts1_seasonal_outliers",
    "s11_time_travel",
    "roll2_quantile_sketch_serve",
    "st15_stream_quantile_maintenance",
    "sim11_ivf_incremental",
    "m5_transition_heldout",
    "d16_containment_pairs",
    "s12_zonemap_skipping",
    "zipf1_rank_frequency",
    "g10_link_prediction",
    "eval8_bleu",
    "bootstrap1_mean_ci",
    "trend2_theil_sen",
    "kappa1_agreement",
    "dq5_benford_deviation",
    "ewma1_decay_smoothing",
    "g11_label_propagation",
    "g12_modularity",
    "gini1_concentration",
    "surv1_conversion_hazard",
    "m6_stationary_distribution",
    "cusum1_change_point",
    "anon2_l_diversity",
    "seg1_rfm_segments",
    "decon2_semantic_overlap",
    "s13_deletion_vector_read",
    "mw1_mann_whitney",
    "welch1_ttest",
    "srm1_sample_ratio_mismatch",
    "perm1_randomization_test",
    "acf1_autocorrelation",
    "nov1_source_novelty",
    "cov1_embedding_covariance",
    "g13_hits_authorities",
    "d17_ppjoin_prefix_filter",
    "pca1_power_iteration",
    "m7_top_trigram_paths",
    "dq6_column_profile_drift",
    "seq1_sprt_monitor",
    "s14_snapshot_diff",
    "s15_integrity_checksum",
    "t16_keyword_extraction",
    "ess1_weight_diagnostics",
    "trim1_robust_means",
    "ent2_user_diversity",
    "eval9_brier_score",
    "imp1_median_impute",
    "streak1_daily_streaks",
    "sim12_ivfpq_ann",
    "sim13_nsw_greedy_ann",
    "st18_tws_running_counts",
    "rrf1_hybrid_retrieval",
    "g14_personalized_pagerank",
    "s16_incremental_join_view",
    "st19_tws_ttl_expiry",
    "st20_tws_recent_events",
    "cms1_heavy_hitters",
    "g15_k_truss",
    "st21_tws_daily_map",
    "hw1_holt_trend",
    "hw2_holt_winters",
    "roll4_cms_rollup_serve",
    "g16_bfs_hops",
    "st22_stream_cms_maintenance",
    "st23_tws_session_windows",
    "st24_tws_native_ttl",
    "var1_variant_typed_serve",
]


def summarize(name: str, df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    p = buf.getvalue()
    lines = [f"### {name}", ""]
    n_scan = len(
        [l for l in p.splitlines() if l.startswith("(") and "Scan parquet" in l]
    )
    joins = sorted(set(re.findall(r"(\w+Join\w*)", p)))
    lines.append(
        f"- scans: {n_scan} · exchanges: {p.count('Exchange') - p.count('BroadcastExchange')} "
        f"shuffle + {p.count('BroadcastExchange')} broadcast · "
        f"joins: {', '.join(joins) if joins else 'none'}"
    )
    for tag in ("PartitionFilters", "PushedFilters"):
        for m in re.finditer(rf"{tag}: (\[[^\]]*\])", p):
            if m.group(1) != "[]":
                lines.append(f"- {tag}: `{m.group(1)}`")
    for m in re.finditer(r"ReadSchema: (\S+)", p):
        lines.append(f"- ReadSchema: `{m.group(1)[:120]}`")
    notable = [
        t
        for t in (
            "TakeOrderedAndProject",
            "Expand",
            "Window",
            "SortAggregate",
            "HashAggregate",
            "Generate",
        )
        if t in p
    ]
    if notable:
        lines.append(f"- operators: {', '.join(notable)}")
    lines.append("")
    return "\n".join(lines)


def main() -> None:
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import __spark_entry__ as contract
    from ecostream.session import get_spark

    spark = get_spark(app_name="explain-report")
    spark.sparkContext.setLogLevel("ERROR")
    qs = contract.queries()
    sf = "/root/testdata/sf0.01"
    # The hand-written narrative (round notes, measured tables, cross-
    # round performance analysis) lives in PLANS_NARRATIVE.md — NOT in
    # this tool — so a regeneration can never eat a hand edit
    # (VERDICT r11 #5; the literal-block era required syncing edits
    # into this file's string literals).  Edit PLANS_NARRATIVE.md
    # directly; this tool splices it verbatim above the generated
    # per-query plan sections.
    narrative = (
        Path(__file__).resolve().parent.parent / "PLANS_NARRATIVE.md"
    ).read_text()
    out = [narrative.rstrip("\n"), ""]
    for name in REPORT:
        out.append(summarize(name, qs[name](spark, sf)))
    Path("PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(REPORT)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
