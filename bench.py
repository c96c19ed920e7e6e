#!/usr/bin/env python
"""Benchmark harness for the ecostream engine.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

``value`` is the total wall-clock seconds across the headline set (after
a session warm-up), so lower is better and the driver can compare rounds
directly. Per-query seconds are reported under ``queries``.
"""

from __future__ import annotations

import json
import os
import sys
import time

# Headline set: one representative per operator family (SURVEY.md §2) plus
# the training-data-pipeline extensions. Chosen to exercise scan→agg,
# windowed agg, broadcast + sort-merge joins, window functions, sketches,
# dedup, similarity search, and text analysis on the largest tables.
HEADLINE = [
    "a2_group_counts",            # A2 four-dim group counts over events
    "a3_tumbling_counts",         # A3 event-time tumbling window agg
    "a6_mapreduce_wordcount",     # A6 explode + partial-agg combiner
    "a7_weighted_species_score",  # A7 scoring + window normalization
    "j1_pricing_summary",         # TPC-H Q1-shape scan-heavy agg on lineitem
    "j2_star_revenue_by_region",  # star-schema broadcast/SMJ join chain
    "j5_shipping_priority",       # TPC-H Q3-shape 3-way join + top-k
    "m2_markov_probabilities",    # M1+M2 lead() pairs + normalized counts
    "k2_distinct_exact",          # exact distinct (oracle twin of HLL)
    "k4_minhash_jaccard",         # 128-perm MinHash signature aggregation
    "d1_exact_dedup",             # exact dedup over documents
    "d3_minhash_lsh_candidates",  # MinHash+LSH near-dup candidate pairs
    "d5_dedup_clusters",          # connected-components dedup clustering
    "sim1_cosine_topk",           # brute-force cosine top-k ANN baseline
    "sim5_ivf_kmeans_ann",        # k-means-trained IVF ANN probe
    "t7_token_counts",            # text analysis over documents
    "t9_contamination_overlap",   # n-gram blocked contamination check
    "pipeline2_training_manifest",  # composed dedup->gate->split->pack funnel
    "sim6_pq_adc",                # product-quantization ADC probe (round 3)
    "t12_inverted_index",         # inverted-index build (round 3)
    "g6_cooccurrence_triangles",  # triangle counting (round 3)
    "cdc1_scd2_intervals",        # SCD2 interval compaction (round 3)
    "semdedup4_two_level_trained",  # scale-shaped semantic dedup (round 6:
                                  # replaces semdedup1, whose flat quantizer
                                  # is a capped paper-baseline now — VERDICT
                                  # r5 #2)
    "d10_sparse_cosine_verify",   # LSH-candidate sparse-cosine verify (round 4)
    "bpe1_merge_train",           # distributed BPE merge training (round 4)
    "lm2_perplexity_gate",        # bigram-LM perplexity filter (round 4)
    "rag1_retrieve_read",         # RAG retrieve-then-read join (round 4)
    "semdedup3_hierarchical_prune",  # two-level quantizer semdedup (round 5)
    "dsir1_importance_resample",  # DSIR data selection (round 5)
    "d13_span_removal_dedup",     # exact-substring span removal (round 6)
    "j29_bloom_semijoin_reduction",  # Bloom runtime-filter join (round 6)
    "er1_entity_resolution",      # record-linkage funnel (round 6)
    "tok3_unigram_train",         # unigram-LM Viterbi-EM trainer (round 7)
    "pack3_bfd_packing",          # best-fit-decreasing packing (round 7)
    "sq1_int8_recall",            # int8 quantization recall eval (round 7)
    "roll2_quantile_sketch_serve",  # mergeable quantile-sketch serve (round 8)
    "sim11_ivf_incremental",      # incremental IVF maintenance (round 8)
    "d16_containment_pairs",      # asymmetric containment dedup (round 8)
    "decon2_semantic_overlap",    # embedding-level decontamination (round 9)
    "s13_deletion_vector_read",   # merge-on-read DV serving (round 9)
    "d17_ppjoin_prefix_filter",   # exact prefix-filtered sim join (round 9)
    "sim12_ivfpq_ann",            # composed IVF-PQ ADC probe (round 10)
    "sim13_nsw_greedy_ann",       # graph-ANN kNN graph + beam walk (round 10)
    "d14_winnowing_pairs",        # winnowing/MOSS fingerprint pairs (round 10)
    "rrf1_hybrid_retrieval",      # reciprocal-rank fusion retrieval (round 10)
    "g14_personalized_pagerank",  # integer-exact PPR iteration (round 10)
    "cms1_heavy_hitters",         # Count-Min grid + min-of-d probe (round 11)
    "hw2_holt_winters",           # Holt-Winters seasonal integer fold (round 11)
    "roll4_cms_rollup_serve",     # CMS rollup serve, merge==direct (round 11)
    "g16_bfs_hops",               # BFS hop labels, frontier-sized rounds (round 11)
    "var1_variant_typed_serve",   # VARIANT persist + typed access (round 12)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import __spark_entry__ as contract
    from ecostream.session import get_spark

    spark = get_spark(app_name="ecostream-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = contract.queries()
    # Warm up the JVM / codegen / parquet footer cache outside the timings.
    t0 = time.perf_counter()
    qs["a1_total_count"](spark, sf_dir).collect()
    warmup = time.perf_counter() - t0

    # Machine-speed calibration: a FIXED pure-JVM job (no IO, no
    # engine code) whose cost depends only on the host.  Recorded in
    # the artifact so cross-round comparisons can separate engine
    # regressions from machine weather — BENCH_r05→r06-era sessions
    # measured uniform 1.3-1.5x inflation on EVERY query (including
    # trivial distincts), which this probe would have attributed to
    # the host in one line.  Compare rounds as value/calib when the
    # calib columns differ materially.
    def _calib_once() -> float:
        t = time.perf_counter()
        spark.range(0, 200_000_000, 1, 32).selectExpr(
            "sum(id * 3 + 1) AS s"
        ).collect()
        return time.perf_counter() - t

    # Second probe, SHUFFLE-side (VERDICT r11 #2): the pure-JVM ALU
    # probe above is provably blind to shuffle/IPC host weather — r11
    # measured two same-session runs of identical code differing 1.13x
    # on the suite while the ALU medians were flat, because this
    # suite's time goes to exchanges, Arrow IPC, and task scheduling,
    # none of which the ALU loop touches.  This probe is a FIXED small
    # groupBy-count (5M rows -> 100k keys -> 32 shuffle partitions,
    # ~0.3-0.5 s): one real hash-exchange write+read per sample, same
    # shuffle machinery the headline queries pay for.  Cross-round
    # suite claims are decidable only when BOTH probes are flat; if
    # either moved more than the claimed effect, the claim is weather.
    def _calib_shuffle_once() -> float:
        t = time.perf_counter()
        (
            spark.range(0, 5_000_000, 1, 32)
            .selectExpr("id % 100000 AS k", "id AS v")
            .groupBy("k")
            .agg({"v": "sum"})
            .selectExpr("count(*) AS n", "sum(`sum(v)`) AS s")
            .collect()
        )
        return time.perf_counter() - t

    # VERDICT r8 #2: a single pre-suite probe scattered ±20% across
    # same-machine runs while per-query medians reproduced within 1% —
    # single-probe normalization can flip the sign of a small
    # cross-round claim.  The probe now samples BEFORE, DURING
    # (interleaved at the 1/3 and 2/3 marks of the headline loop), and
    # AFTER the suite; the artifact records the median, every sample,
    # and the relative spread so normalized cross-round claims carry an
    # uncertainty band (and are dropped when spread exceeds the effect).
    calib_samples: list[float] = []
    calib_sh_samples: list[float] = []
    _calib_once()  # untimed warm-up
    _calib_shuffle_once()  # untimed warm-up
    calib_samples.extend(_calib_once() for _ in range(3))
    calib_sh_samples.extend(_calib_shuffle_once() for _ in range(3))

    # Five timed runs per query, report the MEDIAN: the first run pays
    # one-off codegen/planning, and transient machine contention has
    # been observed to inflate single runs 3x — the median of five is
    # robust to both, so round-over-round deltas are attributable to
    # the engine, not the weather.  N is overridable for quick local
    # iteration via ECOSTREAM_BENCH_RUNS.
    n_runs = max(1, int(os.environ.get("ECOSTREAM_BENCH_RUNS", "5")))
    # Cold column (VERDICT r4 #2): repeated warm runs can hit
    # CacheManager-cached sub-plans (any .persist() inside a query is
    # found again by canonicalized-plan match on the next run), which
    # can mask a per-query regression.  For the cold measurement the
    # CacheManager is cleared BEFORE every run, so each run re-executes
    # the full lineage.  Both medians are recorded; round-over-round
    # comparisons should read warm-vs-warm and cold-vs-cold.
    n_cold = max(1, int(os.environ.get("ECOSTREAM_BENCH_COLD_RUNS", "3")))

    def median(times: list[float]) -> float:
        times = sorted(times)
        mid = len(times) // 2
        return (
            times[mid]
            if len(times) % 2
            else (times[mid - 1] + times[mid]) / 2
        )

    per_query: dict[str, float] = {}
    per_query_cold: dict[str, float] = {}
    _probe_at = {len(HEADLINE) // 3, (2 * len(HEADLINE)) // 3}
    for qi, name in enumerate(HEADLINE):
        if qi in _probe_at:
            calib_samples.append(_calib_once())
            calib_sh_samples.append(_calib_shuffle_once())
        fn = qs[name]
        # The previous query's cold loop ends with the CacheManager
        # cleared, so one UNTIMED priming execution re-populates any
        # persisted shared sub-plans — warm medians then measure a warm
        # cache even with ECOSTREAM_BENCH_RUNS=1 (ADVICE r5).
        fn(spark, sf_dir).collect()
        times = []
        for _ in range(n_runs):
            start = time.perf_counter()
            fn(spark, sf_dir).collect()
            times.append(time.perf_counter() - start)
        per_query[name] = round(median(times), 4)
        cold_times = []
        for _ in range(n_cold):
            spark.catalog.clearCache()
            start = time.perf_counter()
            fn(spark, sf_dir).collect()
            cold_times.append(time.perf_counter() - start)
        per_query_cold[name] = round(median(cold_times), 4)
    spark.catalog.clearCache()
    calib_samples.extend(_calib_once() for _ in range(3))
    calib_sh_samples.extend(_calib_shuffle_once() for _ in range(3))
    calib = round(median(calib_samples), 4)
    calib_spread = round(
        (max(calib_samples) - min(calib_samples)) / calib, 3
    )
    calib_sh = round(median(calib_sh_samples), 4)
    calib_sh_spread = round(
        (max(calib_sh_samples) - min(calib_sh_samples)) / calib_sh, 3
    )

    total = round(sum(per_query.values()), 4)
    sf = None
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            sf = float(tail[2:])
        except ValueError:
            sf = tail
    # The driver records only the LAST ~2000 chars of stdout; r5's
    # single line grew past that (queries + queries_cold) and the
    # recorded artifact became unparseable (VERDICT r5 #3).  The line
    # printed here is COMPACT (totals first, 2-decimal per-query map,
    # no spaces) and asserted under the capture window; the full
    # 4-decimal record including the per-query cold map goes to a
    # sidecar file committed alongside (bench_full.json).
    full = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "value_cold": round(sum(per_query_cold.values()), 4),
        "queries_cold": per_query_cold,
        "sf": sf,
        "warmup_sec": round(warmup, 4),
        "calib_sec": calib,
        "calib_runs": [round(c, 4) for c in calib_samples],
        "calib_spread": calib_spread,
        "calib_shuffle_sec": calib_sh,
        "calib_shuffle_runs": [round(c, 4) for c in calib_sh_samples],
        "calib_shuffle_spread": calib_sh_spread,
        "n_queries": len(per_query),
        "runs_per_query": n_runs,
        "cold_runs_per_query": n_cold,
        "stat": "median",
    }
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
    )
    with open(sidecar, "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    line = json.dumps(
        {
            "metric": "headline_queries_total_wall",
            "value": total,
            "unit": "sec",
            "value_cold": full["value_cold"],
            "calib": calib,
            "calib_spread": calib_spread,
            "calib_sh": calib_sh,
            "calib_sh_spread": calib_sh_spread,
            "sf": sf,
            "n_queries": len(per_query),
            "runs_per_query": n_runs,
            "cold_runs_per_query": n_cold,
            "stat": "median",
            "detail": "bench_full.json",
            "queries": {k: round(v, 2) for k, v in per_query.items()},
        },
        separators=(",", ":"),
    )
    assert len(line) < 1900, (
        f"bench line {len(line)} chars would overflow the driver's "
        "2000-char tail capture — trim the headline map"
    )
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
