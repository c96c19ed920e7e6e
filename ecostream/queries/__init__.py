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
    # ROUND 11 additions (oracle-bearing, entering the head the round
    # they land):
    "st19_tws_ttl_expiry",       # TWS event-time timers: purge-as-timer TTL
    "st20_tws_recent_events",    # TWS ListState: bounded per-key recency buffer
    "cms1_heavy_hitters",        # Count-Min sketch grid + min-of-d estimates
    "g15_k_truss",               # 4-truss backbone by bulk edge-peeling
    "st21_tws_daily_map",        # TWS MapState: day->count per event type
    "hw1_holt_trend",            # Holt level+trend integer fold + 7-day forecast
    "hw2_holt_winters",          # Holt-Winters seasonal: 9-slot ring fold
    "roll4_cms_rollup_serve",    # CMS heavy-hitter rollup serve (merge==direct)
    "g16_bfs_hops",              # BFS/SSSP hop labels, recursive-CTE oracle
    "st22_stream_cms_maintenance",  # streaming CMS-store maintenance (roll4 twin)
    "st23_tws_session_windows",  # TWS session windows: one timer per open session
    # ROUND 11 re-signs — the round-10 red row (protobuf .pth shim fix)
    # and the queries whose source changes this round:
    "st18_tws_running_counts",   # RE-SIGN: failed r10 under the driver's
                                 # pre-existing JVM; ensure_protobuf now
                                 # installs a site-packages .pth shim
    "sim13_nsw_greedy_ann",      # RE-SIGN: scale-safe sqrt(n)-capped centroid
                                 # seeding (VERDICT r10 #3)
    "decon2_semantic_overlap",   # RE-SIGN: same centroid-seeding change
    "d14_winnowing_pairs",       # RE-SIGN: per-stage funnel counters pass
                                 # (VERDICT r10 #4)
    "bootstrap1_mean_ci",        # RE-SIGN: the Poisson draw now slices four
                                 # 32-bit uniforms per md5 digest (4x less
                                 # hashing; 13.9 -> 9.1 s at a 10x slice)
    # ROUND 11 oldest-signed rotation, part 1 (VERDICT r10 #2): the 11
    # keys never driver-hash-signed since round 2 — this closes the
    # round-2 rotation debt entirely.
    "k2_distinct_exact",
    "k3_conditional_windowed_count",
    "k4_jaccard_exact",
    "m1_global_transition_pairs",
    "m1_transition_pairs",
    "m2_markov_probabilities",
    "m3_transition_matrix",
    "o1_sort_by_event_time",
    "o2_topk_users_by_value",
    "sk1_salted_cohort_revenue",
    "t4_session_windows",
    # ROUND 11 oldest-signed rotation, part 2: the oldest round-3 cohort
    # (50 keys were last signed in round 3; the first 23 alphabetically
    # re-sign now, the remaining 27 rotate in round 12 — six slots
    # went to the late-round-11 additions hw2/roll4/g16/st22/st23 and
    # the bootstrap1 re-sign, which take precedence because
    # new/changed definitions have no valid signature at all).
    "chunk1_token_windows",
    "d1_exact_dedup",
    "d2_ngram_jaccard_pairs",
    "d3b_minhash_lsh_md5",
    "d4_simhash",
    "g5_pagerank_habitats",
    "j16_volume_shipping",
    "j17_market_share",
    "j18_product_profit",
    "j19_returned_revenue",
    "j20_customer_distribution",
    "j21_parts_supplier_count",
    "j22_disjunctive_revenue",
    "j23_waiting_orders",
    "j24_global_sales_opportunity",
    "j25_important_parts",
    "j26_top_supplier",
    "j27_excess_shippers",
    "m4_dtmc_classification",
    "mm4_png_roundtrip",
    "pack1_sequence_packing",
    "pii1_entity_redaction",
    "pipeline1_clean_corpus",
]
# Retired heads (rounds 3-10) live in git history of this file; each
# retired key keeps full coverage via tools/parity_sweep.py and
# tests/test_oracle_parity.py, and re-enters the head only on re-sign
# or its oldest-signed rotation turn.
#
# (g2_random_walk / g2_walk_distributed / d3 / d5 / d6 / sim5 are
# rows-only by design and never enter the head.)




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
