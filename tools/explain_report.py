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
    out = [
        "# PLANS — physical-plan evidence (generated by tools/explain_report.py)",
        "",
        "Summaries of `.explain(mode='formatted')` at sf0.01 for the",
        "headline + representative queries.  What to look for: filters and",
        "column pruning reach the parquet scans, small sides broadcast,",
        "aggregates are partial→final (map-side combine), sorts with limits",
        "are TakeOrderedAndProject, multi-group-set aggs use one scan +",
        "Expand.  Regenerate after plan-affecting changes.",
        "",
        '## Round-6 scale stress: every production funnel, third generation',
        '',
        '`tools/stress_funnel.py` re-run after the round-6 re-scope with the',
        'three funnels VERDICT r5 #5 asked for added: d12 incremental dedup,',
        'the pipeline3 curation funnel (d11 → ent1 → dsir1), and g7\'s banded',
        'co-presence CC via the cap-free `user_copresence_components`',
        'mechanism over generated events (users AND the hour span scale with',
        'the multiplier — constant per-user activity and bucket occupancy, so',
        'planted co-presence edges grow linearly; components = the planted',
        '6-user communities).  Same protocol: COLD medians of 3, untimed',
        'warm-up first, local[32].  The flat semdedup1/2 rows are RETIRED',
        'from the table — they are now declared capped baselines',
        '(vec_id < 4096), so stressing them would measure the cap constant;',
        'their round-5 quadratic measurements stand below as the evidence',
        'for the re-scope.',
        '',
        '| stage | x1 (s) | x5 (s) | x10 (s) | rows x1→x10 | exponent |',
        '|---|---|---|---|---|---|',
        '| d3 LSH candidates | 2.47 | 4.16 | 6.71 | 1,102 → 48,462 | **0.43** |',
        '| sparse-cosine verify | 3.46 | 6.38 | 10.31 | 1,102 → 48,462 | **0.47** |',
        '| d5 dedup clusters | 3.63 | 6.88 | 10.09 | 1,514 → 32,401 | **0.44** |',
        '| d12 incremental dedup | 0.25 | 0.26 | 0.24 | 1,000 → 10,000 | **~0** |',
        '| pipeline3 curation funnel | 1.03 | 2.15 | 2.05 | 20 (manifest) | **0.30** |',
        '| g7 co-presence CC | 1.08 | 2.25 | 2.72 | 300 → 3,000 users | **0.40** |',
        '| semdedup3 (hierarchical) | 0.95 | 1.81 | 4.17 | 2k → 20k vecs | **0.64** |',
        '| semdedup4 (2-level trained) | 2.69 | 3.76 | 5.21 | 2k → 20k vecs | **0.29** |',
        '',
        'Round-6 findings: every declared funnel now measures ≤ 0.64 — no',
        'stage approaches the ~1.2 bar.  d12 is flat because one fingerprint',
        'shuffle over ≤50k docs is pure overhead at these sizes (its work',
        'term is O(|delta| + |base keys|) by construction); semdedup3 ticked',
        'up from 0.51 to 0.64 as its ~n^1.5/8 assignment term starts to show',
        'through fixed overhead — still the expected two-level curve, and',
        'the sample-trained semdedup4 (0.29) is the flagship path.',
        '',
        '## Round-5 scale stress: dedup/ANN funnel beyond sf0.1',
        '',
        '`tools/stress_funnel.py` (VERDICT r4 #6): deterministic documents/',
        'embeddings slices at 1x/5x/10x the sf0.1 cardinalities (5k/25k/50k',
        'docs, 2k/10k/20k vectors) generated under /tmp with CONSTANT planted',
        'near-duplicate density; each stage timed COLD (CacheManager cleared',
        'before every run, one untimed warm-up pass first), median of 3, on',
        'local[32].  Stages are the UNCAPPED production paths — d3b/d10/d5b',
        'cap documents at 500 only so their full-DuckDB replays stay',
        'affordable, so the mechanism twins that actually run at scale are',
        "what's measured: d3 (banded MinHash LSH), sparse_cosine_verify (d10's",
        "mechanism over d3's candidates), d5 (pair closure into clusters), and",
        'the semdedup family (count-derived k = ceil(n/64) everywhere).',
        '',
        '| stage | x1 (s) | x5 (s) | x10 (s) | rows x1→x10 | exponent |',
        '|---|---|---|---|---|---|',
        '| d3 LSH candidates | 2.47 | 3.82 | 6.19 | 1,102 → 48,462 | **0.40** |',
        '| sparse-cosine verify | 3.10 | 5.71 | 9.15 | 1,102 → 48,462 | **0.47** |',
        '| d5 dedup clusters | 3.70 | 5.56 | 9.03 | 1,514 → 32,401 | **0.39** |',
        '| semdedup1 (flat, first-k) | 0.98 | 8.39 | 40.61 | 2k → 20k vecs | **1.62** |',
        '| semdedup2 (flat, trained) | 3.45 | 35.43 | 162.24 | 2k → 20k vecs | **1.67** |',
        '| semdedup3 (hierarchical) | 0.95 | 1.67 | 3.05 | 2k → 20k vecs | **0.51** |',
        '| semdedup4 (2-level trained) | 2.51 | 3.49 | 5.42 | 2k → 20k vecs | **0.33** |',
        '',
        'exponent = ln(t_x10/t_x1) / ln(10).',
        '',
        'Findings:',
        '',
        '- **The document funnel is comfortably sub-linear in wall time**',
        '  (0.33–0.51, target was ≤ ~1.2): fixed per-job overhead still',
        '  dominates at these sizes, so the work-term (linear by design:',
        '  banded buckets, candidate-bounded verify, log-round star CC) stays',
        '  invisible.  Candidate pairs grew 44x for 10x docs — not an engine',
        "  artifact but the generator's: each planted near-copy attaches to a",
        '  uniform random EARLIER doc, so duplicate components form random',
        '  recursive forests whose sum-of-(size choose 2) grows superlinearly.',
        '  Even with that extra pair load the verify/CC stages held ~0.5.',
        "- **Wiring SemDeDup's k to corpus size (r4 verdict #3) makes the FLAT",
        '  argmax the new bottleneck — measured, not guessed.**  With',
        '  k = ceil(n/64), assignment scores n·k = n²/64 vector-centroid pairs:',
        '  the in-cell prune became linear but the quantizer went quadratic',
        '  (exponents 1.62 / 1.67 per the table above; semdedup2 pays it in all',
        '  4 Lloyd+final assignment passes, 162 s at 20k vectors).  This is',
        '  exactly why the paper assigns with FAISS rather than a flat scan.',
        '  Round-6 consequence: semdedup1/2 are now DECLARED as capped paper',
        '  baselines (vec_id < 4096, non-binding at test/bench scales) and the',
        '  bench headline slot moved semdedup1 → semdedup4.',
        '- **semdedup3_hierarchical_prune is the fix**: route through',
        '  b = ceil(sqrt(k)) super-centroids (n·b dots), then argmax over only',
        "  that branch's centroids (~n·k/b expected) — ~2n·sqrt(k) total,",
        '  n^1.5/8 instead of n²/64.  Measured 0.51 (13x faster than flat at',
        '  x10, 53x vs trained-flat); a depth-d tree generalizes to',
        '  n·d·k^(1/d) ≈ n·log k, the HNSW/annoy regime.  Both argmax levels',
        '  replay in DuckDB (the routing approximation is deterministic), and',
        '  keep-agreement vs the flat form is test-floored at 0.85 on the',
        '  WORST case for routing (near-orthogonal random embeddings measure',
        '  0.91–0.96).',
        '- **semdedup4_two_level_trained closes the TRAINED path too**: the',
        '  b super-centroids train on a bounded 64·b md5-sample (training',
        '  linear in k — the FAISS train-on-sample regime), each branch’s',
        '  leaves are its m = ceil(k/b) lowest members (no second training',
        '  pass), assignment is branch-bounded.  Measured exponent 0.33 —',
        '  30x faster than flat-trained at x10 (162.2 s → 5.4 s) — and the',
        '  ENTIRE pipeline still replays in DuckDB, sample + tower + routing',
        '  + leaves + prune, so trained routing no longer costs oracle',
        '  coverage.  Every funnel stage now measures ≤ 0.51.',
        '- The d5 claim from r4 is now visible in recorded artifacts: the',
        '  cold column in BENCH_r05.json (bench.py clears the CacheManager',
        "  before every cold run) plus the cold x1 median above.  BENCH_r05's",
        '  cold map records d5 at 3.11 s — below even the warm 3.33 s recorded',
        '  in BENCH_r04, so the single-execution pair-pipeline fix is confirmed',
        '  without plan-cache assistance.',
        '- **Round-over-round, FROM THE COMMITTED ARTIFACTS ONLY** (corrected',
        '  in round 6 — the original r5 text here quoted an unrecorded local',
        '  session; VERDICT r5 #2): BENCH_r04 vs BENCH_r05 warm medians over',
        '  the 27 shared headline queries give **31.10 s → 28.18 s = 0.91x**.',
        '  Biggest movers: semdedup1 0.42x (count-derived k), sim1 0.69x,',
        '  m2 0.70x, pipeline2 0.82x; slowest-moving: cdc1 1.30x warm',
        '  (0.94 → 1.21 s; its COLD median is 0.89 s, so machine weather on a',
        '  sub-second query, not a plan change) and rag1 1.15x (0.65 → 0.75 s).',
        '  29-query r5 totals: warm 31.77 s, cold 31.24 s — within 1.7%.',
        "  (BENCH_r05's single JSON line overflowed the driver's 2,000-char",
        '  tail capture — the warm total above is the sum of the recorded',
        '  per-query map; bench.py now prints a compact totals-first line',
        '  under the capture window and writes the full record to',
        '  bench_full.json, VERDICT r5 #3.)',
        "",
        "## Round-4 plan notes",
        "",
        "- **d5_dedup_clusters r3 bench regression (+25%) — diagnosed and",
        "  fixed.**  The r3 form materialized the LSH candidate lineage",
        "  TWICE: an eager `localCheckpoint` on the pair set, then a second",
        "  full execution when connected_components checkpointed its own",
        "  symmetrized edge list; exact pairs additionally re-ran the d1",
        "  aggregate and joined it back.  r4 derives exact pairs with a",
        "  window MIN over the content hash (one shuffle, no join) and lets",
        "  connected_components derive the vertex set from its own edge",
        "  checkpoint (`vertices=None`), so the pair pipeline executes",
        "  exactly once.  Controlled A/B at sf0.1 (same session, 3 runs):",
        "  old min 3.73 s / median 5.27 s → new min 2.68 s / median 2.80 s;",
        "  bench medians under normal machine weather 2.96–3.14 s (vs 3.18",
        "  r3).  Remaining cost is one LSH pipeline execution (≈ d3's",
        "  1.8–2.0 s) + the edge-set checkpoint + the ≤2·|pairs| union-find",
        "  model round-trip; the 1M-edge driver fast path fires at this SF",
        "  (≈1.5k symmetric edges).",
        "- **g6 degree-ordered orientation.**  +2 shuffles (degree",
        "  aggregate + join) vs r3's naive two-path closure, ~+0.1 s at",
        "  sf0.1 — bought: wedge fan-out bounded by arboricity instead of",
        "  Σdeg², the difference between finishing and dying on a",
        "  power-law token graph at 100 TB (hub of degree d no longer",
        "  yields d² wedges).  Equality with the naive form is test-pinned",
        "  on a skewed hub graph (tests/test_graph_ops.py).",
        "- **Bench methodology note.**  Within a bench run, repeated",
        "  invocations of the same query build fresh DataFrames whose",
        "  canonicalized sub-plans hit Spark's CacheManager (the LSH",
        "  bucket persist), so medians reflect steady-state reuse — the",
        "  same behavior in every round, so deltas stay comparable.",
        "  An experiment clearing the cache between runs (fully cold)",
        "  measured d3 2.52 s / d5 4.96 s — the warehouse-scale answer is",
        "  writing the signature table out once and reusing it across",
        "  dedup runs, which the cached path models.",
        "",
    ]
    for name in REPORT:
        out.append(summarize(name, qs[name](spark, sf)))
    Path("PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(REPORT)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
