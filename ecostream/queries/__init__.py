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
    # round-4 flagship LLM-pipeline operators
    "semdedup1_cluster_prune", "semdedup2_trained_prune",
    "bpe1_merge_train", "tok1_bpe_apply",
    "lm2_perplexity_gate", "lm3_perplexity_buckets",
    "d10_sparse_cosine_verify", "d11_priority_dedup",
    "rag1_retrieve_read", "sim9_knn_classify", "mmr1_diverse_rerank",
    "mix1_temperature_sampling", "shuffle2_epoch_orders",
    "qc1_linear_quality", "reg1_normal_equations",
    "kmv1_distinct_estimate", "kmv2_intersection_estimate",
    "mm6_jpeg_roundtrip", "mm7_video_roundtrip",
    # window-function family
    "w1_running_revenue", "w2_order_rank_per_customer",
    "w3_gap_sessionize", "w4_order_gap_days", "w5_balance_quartiles",
    "w6_price_position", "w7_order_shipping_span",
    "w8_weekly_moving_revenue", "w9_trailing_30d_revenue",
    # rollup / cube / grouping sets
    "r1_rollup_revenue", "r2_cube_counts", "r3_grouping_sets",
    # analytics
    "a9_percentiles", "a10_numeric_stats", "h1_having_active_users",
    "c1_cohort_retention", "c2_funnel_conversion",
    "prof1_profile_events", "dq1_constraint_violations",
    "v1_variant_props", "arr1_user_event_sequences",
    "b1_value_quartile_buckets",
    # series / string / CDC ops
    "fs1_minmax_scale", "ts1_gap_fill", "ts2_rolling_median_deviation",
    "str1_fuzzy_part_match", "str2_name_prefix_counts",
    "cdc1_scd2_intervals",
    # domain quota / sketch / markov stragglers
    "ql1_domain_quota", "k4_minhash_jaccard",
    "m4b_dtmc_classification_distributed",
]
# (g2_random_walk / g2_walk_distributed / d3 / d5 / d6 / sim5 are
# rows-only by design and never enter the head.)
#
# ROUND-6 ROTATION PLAN: once this head is driver-signed, the only
# oracle-bearing queries without a signed hash row are
# a9_percentiles_approx (this round's documented leftover) plus the
# round-5 additions: semdedup3_hierarchical_prune,
# dsir1_importance_resample, d12_incremental_dedup,
# ent1_token_entropy_gate, zorder1_layout_stats,
# st11_stream_outer_join, pipeline3_curation_manifest,
# decon1_remove_contaminated, samp2_weighted_wor,
# s9_schema_evolution, semdedup4_two_level_trained,
# g7_user_components, curr1_curriculum_schedule.  Swap those
# fourteen to the head (the other 36 slots are free for any round-6
# additions);
# that completes driver-signed coverage of every oracle-bearing query.




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
