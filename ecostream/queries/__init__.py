"""Declared-query inventory (SURVEY.md §2 operator coverage).

Importing this package populates ``QUERIES`` / ``ORACLES`` from every
operator-family module.  ``__spark_entry__.py`` re-exports these for the
driver's correctness gate.
"""

from __future__ import annotations

from .registry import ORACLES, QUERIES, query  # noqa: F401

# Import order mirrors SURVEY §7.2's build order; each import registers
# that family's declared queries.
from . import core  # noqa: F401,E402  (F1-F6, A1/A2/A6, O2)
from . import joins  # noqa: F401,E402  (§2.4 equi/semi/anti/theta joins)
from . import windows  # noqa: F401,E402  (A3-A5, K3, T4)
from . import markov  # noqa: F401,E402  (M1-M4)
from . import scoring  # noqa: F401,E402  (A7, A8)

try:  # families added as the build widens; keep imports resilient
    from . import sketches  # noqa: F401  (K1, K2, K4, K5)
except ImportError:  # pragma: no cover
    pass
try:
    from . import graph  # noqa: F401  (G1-G3)
except ImportError:  # pragma: no cover
    pass
try:
    from . import text  # noqa: F401  (dedup / text analysis)
except ImportError:  # pragma: no cover
    pass
try:
    from . import similarity  # noqa: F401  (ANN / embedding search)
except ImportError:  # pragma: no cover
    pass
try:
    from . import generator_queries  # noqa: F401  (S1)
except ImportError:  # pragma: no cover
    pass
try:
    from . import multimodal_queries  # noqa: F401  (binary columns)
except ImportError:  # pragma: no cover
    pass
try:
    from . import setops  # noqa: F401  (set ops, rollup/cube, as-of join)
except ImportError:  # pragma: no cover
    pass
try:
    from . import analytics  # noqa: F401  (percentiles, having, grouping sets)
except ImportError:  # pragma: no cover
    pass
try:
    from . import streaming_queries  # noqa: F401  (declared streaming T1/T2/T6)
except ImportError:  # pragma: no cover
    pass
try:
    from . import tpch_more  # noqa: F401  (remaining TPC-H shapes J16-J27)
except ImportError:  # pragma: no cover
    pass
try:
    from . import window_fns  # noqa: F401  (lag/lead, ntile, pct_rank, frames)
except ImportError:  # pragma: no cover
    pass
try:
    from . import seriesops  # noqa: F401  (gap-fill, fuzzy match, regex)
except ImportError:  # pragma: no cover
    pass
try:
    from . import storage_queries  # noqa: F401  (S6 write side: compaction)
except ImportError:  # pragma: no cover
    pass
try:
    from . import llm_pipeline  # noqa: F401  (chunk/split/shuffle/pack)
except ImportError:  # pragma: no cover
    pass
try:
    from . import corpus  # noqa: F401  (repetition gates, inverted index, LM)
except ImportError:  # pragma: no cover
    pass
try:
    from . import tokenizer  # noqa: F401  (BPE merge training)
except ImportError:  # pragma: no cover
    pass

# ---------------------------------------------------------------------------
# Declaration-order rotation.
#
# The driver's correctness gate samples the FIRST 50 ``queries()`` keys
# (CORRECTNESS_r01/r02 both cap there), so families declared later never
# receive a driver-signed row even though the full local parity sweep
# (tools/parity_sweep.py) checks all of them.  Each round we rotate the
# never-yet-signed families to the head so that, over rounds, every
# family accumulates a signed green row.  Round 3 leads with the LLM
# dedup/ANN pipelines, streaming, storage layouts, and the TPC-H
# extension shapes (VERDICT r2 "Next round" #1).  Queries already signed
# in earlier rounds keep their coverage via tests/test_oracle_parity.py.
#
# Every head entry is oracle-checked, so all 50 driver-signed rows are
# value-hash comparisons, not rows-only.
#
# ROUND 5: the 50 head slots hold 50 of the 51 oracle-bearing queries
# the driver has never hash-signed (hash_match never true in
# CORRECTNESS_r01..r04) — the round-4 flagship LLM-pipeline operators
# plus the window/rollup/analytics/series families (VERDICT r4 "Next
# round" #1).  The one documented leftover is a9_percentiles_approx
# (the approx variant of a9_percentiles, which IS in this head); it
# plus any round-5 additions rotate in round 6, completing
# driver-signed coverage of the whole oracle-bearing registry.
# ---------------------------------------------------------------------------
_ROUND_HEAD = [
    # ROUND 10 additions (oracle-bearing, entering the head the round
    # they land):
    "sim12_ivfpq_ann",           # composed FAISS IVF-PQ (coarse + residual PQ)
    "sim13_nsw_greedy_ann",      # graph-ANN: kNN graph + greedy beam walk
    "st18_tws_running_counts",   # transformWithStateInPandas through the gate
    "rrf1_hybrid_retrieval",     # reciprocal-rank fusion of lexical+semantic
    "g14_personalized_pagerank", # integer-exact random walk with restart
    "s16_incremental_join_view", # aggregate-join view maintained by delta
    # ROUND 10 re-signs — changed queries re-enter the head:
    "d17_ppjoin_prefix_filter",  # RE-SIGN: positional filter + suffix-only
                                 # verify + two-exchange ordering (VERDICT r9 #1)
    "er1_entity_resolution",     # RE-SIGN: verify-before-distinct, long block
                                 # keys, window-fused survivorship (VERDICT r9 #2)
    "d14_winnowing_pairs",       # RE-SIGN: fingerprint lineage cuts (r9 #6)
    "ess1_weight_diagnostics",   # RE-SIGN: telescoped ESS form (ADVICE overflow)
    "roll3_distinct_sketch_serve",  # RE-SIGN: exact audit over hashed relation
    "st17_stream_distinct_maintenance",  # RE-SIGN: same (serve path shared)
    "kmv1_distinct_estimate",    # RE-SIGN: exact audit over hashed relation
    "s14_snapshot_diff",         # RE-SIGN: insert keys negated out of domain
    "d5b_dedup_clusters_md5",    # RE-SIGN: CC checkpoint-then-symmetrize +
                                 # Arrow union-find (shared functions/cc.py)
    "g7_user_components",        # RE-SIGN: same CC change
    # ROUND 10 oldest-signed rotation (VERDICT r9 #5): these 34 keys
    # were last driver-hash-signed in round 2 while shared helpers
    # kept evolving under them; re-enter them so the trust anchor
    # stays fresh.  (The remaining 11 round-2 keys rotate in round 11.)
    "a1_total_count",
    "a2_group_counts",
    "a3_sliding_counts",
    "a3_tumbling_counts",
    "a4_trend_counts",
    "a5_distinct_per_window",
    "a6_doc_wordcount_topk",
    "a6_mapreduce_wordcount",
    "a7_weighted_species_score",
    "a8_frequency_pct",
    "cal1_hourly_profile",
    "f3_conjunctive_filter",
    "f4_projection",
    "f5_recent_events",
    "f6_full_snapshot",
    "j10_promo_revenue_ratio",
    "j11_forecast_revenue",
    "j12_priority_exists",
    "j13_big_order_customers",
    "j14_returnflag_priority_mix",
    "j15_above_brand_avg",
    "j1_pricing_summary",
    "j2_star_revenue_by_region",
    "j3_semi_customers_with_orders",
    "j4_anti_customers_without_orders",
    "j5_shipping_priority",
    "j6_range_join_value_bands",
    "j7_left_join_order_activity",
    "j8_full_outer_daily_activity",
    "j9_argmin_supplier_per_part",
    "k1_bloom_probe",
    "k1_membership_absent",
    "k1_membership_present",
    "k2_distinct_approx",
]
_ROUND9_HEAD_RETIRED = [
    # ROUND 9 head, retired to history (all signed green in
    # CORRECTNESS_r09.json):
    "decon2_semantic_overlap",   # embedding-level benchmark decontamination
    "s13_deletion_vector_read",  # merge-on-read deletion-vector serving
    "mw1_mann_whitney",          # rank-sum two-sample location test
    "welch1_ttest",              # unequal-variance t statistic per segment
    "srm1_sample_ratio_mismatch",  # chi-square assignment-ratio guardrail
    "perm1_randomization_test",  # hash-seeded permutation null distribution
    "acf1_autocorrelation",      # lag-k autocorrelation of daily series
    "nov1_source_novelty",       # cross-source n-gram novelty audit
    "cov1_embedding_covariance", # embedding covariance/PCA-readiness matrix
    "g13_hits_authorities",      # HITS hub/authority fixed-iteration scores
    "d17_ppjoin_prefix_filter",  # exact prefix-filtered similarity join
    "pca1_power_iteration",      # top principal component, integer waves
    "m7_top_trigram_paths",      # order-2 sequence mining over journeys
    "dq6_column_profile_drift",  # per-column data-contract drift audit
    "st16_stream_welch_maintenance",  # streaming A/B moment-store upkeep
    "seq1_sprt_monitor",         # anytime-valid SPRT conversion monitor
    "s14_snapshot_diff",         # added/removed/changed table diff
    "s15_integrity_checksum",    # order-free replica checksum manifest
    "t16_keyword_extraction",    # per-doc top-3 tf-idf keywords
    "ess1_weight_diagnostics",   # Kish ESS sampling-weight audit
    "trim1_robust_means",        # trimmed/winsorized robust location
    "ent2_user_diversity",       # per-user behaviour entropy buckets
    "eval9_brier_score",         # proper scoring rule + Murphy decomposition
    "imp1_median_impute",        # group-median missing-value imputation
    "streak1_daily_streaks",     # calendar gaps-and-islands streaks
    "roll3_distinct_sketch_serve",  # mergeable KMV distinct rollup
    "st17_stream_distinct_maintenance",  # streaming KMV sketch upkeep
    # ROUND 9 re-signs — changed signed queries re-enter the head:
    "m4c_dtmc_recurrence",       # RE-SIGN: driver collect now ships only
                                 # DISTINCT (cur,nxt) edges (VERDICT r8 #1)
    "sim11_ivf_incremental",     # RE-SIGN: base index persisted to parquet;
                                 # declared query reads it and pays only
                                 # delta-assign + serve (VERDICT r8 #5)
    "g10_link_prediction",       # RE-SIGN: wedge-formation adjacency capped
                                 # per hub-skew stress twin (VERDICT r8 #6)
    # ROUND 8 additions re-confirmed while head space allows:
    "roll2_quantile_sketch_serve",  # mergeable DDSketch-style p50/p95 serve
    "st15_stream_quantile_maintenance",  # streaming sketch upkeep twin
    "m5_transition_heldout",     # Markov next-event heldout accuracy
    "d16_containment_pairs",     # asymmetric shingle-containment near-dup
    "s12_zonemap_skipping",      # zone-map file pruning from a stats manifest
    "zipf1_rank_frequency",      # ln-ln rank-frequency power-law fit
    "eval8_bleu",                # BLEU-2 clipped precision + brevity penalty
    "bootstrap1_mean_ci",        # one-pass Poisson bootstrap error bars
    "trend2_theil_sen",          # median-of-pairwise-slopes robust trend
    "kappa1_agreement",          # Cohen's kappa inter-annotator agreement
    "dq5_benford_deviation",     # first-digit Benford fraud/quality audit
    "ewma1_decay_smoothing",     # half-life EWMA over daily series
    "g11_label_propagation",     # deterministic LPA community detection
    "g12_modularity",            # Newman modularity of the LPA partition
    "gini1_concentration",       # Lorenz/Gini activity-concentration audit
    "surv1_conversion_hazard",   # censored Nelson-Aalen conversion curve
    "m6_stationary_distribution",  # Markov chain long-run state shares
    "cusum1_change_point",       # CUSUM level-shift detection per type
    "anon2_l_diversity",         # homogeneity-attack audit beside anon1
    "seg1_rfm_segments",         # value-based RFM quintile segmentation
]
# (g2_random_walk / g2_walk_distributed / d3 / d5 / d6 / sim5 are
# rows-only by design and never enter the head.)
#
# After round 6 the head is maintenance-only: new queries enter at the
# head the round they are added; everything older is already signed and
# stays covered by tools/parity_sweep.py + tests/test_oracle_parity.py.




def _rotate_head(head: list[str]) -> None:
    # Degrade, don't die: a family module that failed its resilient
    # try/except import above leaves its keys unregistered — rotate the
    # keys that exist instead of crashing the whole driver entrypoint.
    # (tests/test_oracle_parity.py pins the full head when everything
    # imports, so silent drift is still caught in CI.)
    missing = [k for k in head if k not in QUERIES]
    if missing:
        # A degraded head must be VISIBLE in driver logs: a typo'd key
        # or a family import failure would otherwise silently change
        # which queries get driver-signed this round.
        import warnings

        warnings.warn(
            "query-registry head dropped unknown keys (family import "
            f"failure or typo?): {missing}",
            stacklevel=2,
        )
    head = [k for k in head if k in QUERIES]
    ordered = {k: QUERIES[k] for k in head}
    ordered.update((k, v) for k, v in QUERIES.items() if k not in ordered)
    QUERIES.clear()
    QUERIES.update(ordered)
    o_ordered = {k: ORACLES[k] for k in head if k in ORACLES}
    o_ordered.update((k, v) for k, v in ORACLES.items() if k not in o_ordered)
    ORACLES.clear()
    ORACLES.update(o_ordered)


_rotate_head(_ROUND_HEAD)
