#!/usr/bin/env python
"""Scale-stress the dedup/ANN funnel beyond sf0.1 (VERDICT r4 #6).

Generates deterministic documents/embeddings slices at 1x / 5x / 10x
the sf0.1 cardinalities (5k/25k/50k docs, 2k/10k/20k vectors) under
/tmp — NEVER under /root/testdata — with a CONSTANT planted
near-duplicate density, so the honest workload (candidate pairs,
verified pairs, cluster edges, in-cell cosine pairs) grows linearly
with corpus size.  Then times each funnel stage COLD (CacheManager
cleared before every run, after one untimed warm-up pass so JVM/
codegen start-up never pollutes the smallest scale) and reports the
observed scaling exponent  e = ln(t_hi/t_lo) / ln(n_hi/n_lo)  per
stage.  PLANS.md records the table.

Stage selection: the UNCAPPED production paths.  d3b/d10/d5b are the
oracle twins of the same mechanisms but cap documents at 500 so their
full-DuckDB replays stay affordable — stressing a capped query would
measure a constant.  So the funnel here is d3 (full-corpus banded
MinHash LSH) → sparse_cosine_verify (d10's mechanism over d3's
candidates) → d5 (full-corpus pair closure into clusters), plus
semdedup1 (deterministic cells) and semdedup2 (trained cells), both
of which already run the whole corpus with the count-derived
k = ceil(n/64).

Generation model (mirrors the driver's testdata shape):
- documents: 31-word vocabulary, token count uniform in [10, 100];
  with probability DUP_RATE a doc is a near-copy of a random earlier
  doc with ~5% of tokens rewritten — the same per-doc duplicate
  probability at every scale.
- embeddings: 64-dim gaussians (sigma 0.12, the testdata magnitude);
  with probability VEC_DUP_RATE a vector is a prior vector plus small
  noise (cosine ~0.99, safely past the semdedup theta of 0.4).
- events (round 6, for the g7 co-presence mechanism): USERS and the
  hour span BOTH scale with mult while events/user and community size
  stay constant — the honest model of a growing platform (more users,
  more history, same activity density), so planted co-presence edges
  grow linearly.  Users belong to 6-person communities; each community
  owns a disjoint 100-hour window, so components = communities and
  bucket occupancy is scale-invariant.

Round-6 stages (VERDICT r5 #5): d12 incremental dedup, the pipeline3
curation funnel (d11 -> ent1 -> dsir1), and g7's banded co-presence CC
via the cap-free ``user_copresence_components`` mechanism.

Round-7 stages (VERDICT r6 #3): er1 entity resolution (customer-keyed —
the generator now also writes a scaled customer.parquet), g8's
cell-banded geo radius join (the POINT count scales: points are the
distinct users, and the user population grows with mult), and id1's
bucketed global enumeration.  All three end in a presentational
ORDER BY, so their stress wrappers aggregate over the OUTPUT columns
(the d13 device): Catalyst's EliminateSorts drops the final sort —
which a consumer's aggregate would too — while every upstream stage
(blocking join, CC, cell join, bucket ranks + offset join) still runs.

Usage: python tools/stress_funnel.py [--scales 1,5,10] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE_DOCS = 5_000  # sf0.1 cardinalities
BASE_VECS = 2_000
BASE_USERS = 300  # g7's declared cap = the x1 user population
BASE_EVENTS = 100_000  # sf0.1 events cardinality
BASE_CUST = 15_000  # sf0.1 customer cardinality (er1's record source)
COMMUNITY = 6  # planted co-presence community size
COMMUNITY_HOURS = 100  # each community's private hour window
DUP_RATE = 0.10
VEC_DUP_RATE = 0.05
DIM = 64
EVENT_TYPES = [f"et{i}" for i in range(8)]
VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "shuffle", "plan", "stage", "index",
]
LANGS = ["en", "de", "zh", "fr", "es"]


def gen_slice(outdir: str, mult: int, seed: int = 42) -> tuple[int, int]:
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed + mult)
    n_docs, n_vecs = BASE_DOCS * mult, BASE_VECS * mult

    texts: list[str] = []
    for i in range(n_docs):
        if i > 0 and rng.random() < DUP_RATE:
            toks = texts[int(rng.integers(0, i))].split(" ")
            toks = [
                VOCAB[int(rng.integers(0, len(VOCAB)))]
                if rng.random() < 0.05
                else t
                for t in toks
            ]
        else:
            length = int(rng.integers(10, 101))
            toks = [VOCAB[j] for j in rng.integers(0, len(VOCAB), length)]
        texts.append(" ".join(toks))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n_docs), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(
                    [LANGS[int(x)] for x in rng.integers(0, len(LANGS), n_docs)]
                ),
                "source": pa.array(
                    [f"src{int(x)}" for x in rng.integers(0, 20, n_docs)]
                ),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        os.path.join(outdir, "documents.parquet"),
    )

    vecs = rng.normal(0.0, 0.12, size=(n_vecs, DIM)).astype(np.float32)
    for i in range(1, n_vecs):
        if rng.random() < VEC_DUP_RATE:
            j = int(rng.integers(0, i))
            vecs[i] = vecs[j] + rng.normal(0.0, 0.005, DIM).astype(np.float32)
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n_vecs), pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
                "label": pa.array(
                    [int(x) for x in rng.integers(0, 8, n_vecs)], pa.int32()
                ),
            }
        ),
        os.path.join(outdir, "embeddings.parquet"),
    )

    # events: user u lives in community u // COMMUNITY; each community
    # owns hours [cid*COMMUNITY_HOURS, (cid+1)*COMMUNITY_HOURS) — hour
    # span scales with users, so bucket occupancy (and thus pairs per
    # bucket) is constant across scales while total planted edges grow
    # linearly with the user population.
    n_users, n_events = BASE_USERS * mult, BASE_EVENTS * mult
    users = rng.integers(0, n_users, n_events)
    hours = (users // COMMUNITY) * COMMUNITY_HOURS + rng.integers(
        0, COMMUNITY_HOURS, n_events
    )
    epoch_us = (hours * 3600 + rng.integers(0, 3600, n_events)) * 1_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(n_events), pa.int64()),
                "ts": pa.array(epoch_us, pa.timestamp("us")),
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(
                    [
                        EVENT_TYPES[int(x)]
                        for x in rng.integers(0, len(EVENT_TYPES), n_events)
                    ]
                ),
                # value: roll2's sketch input (testdata's 0.01..490
                # range); other stages ignore the extra column.
                "value": pa.array(
                    np.round(rng.uniform(0.01, 490.0, n_events), 2)
                ),
            }
        ),
        os.path.join(outdir, "events.parquet"),
    )
    # customer: er1 reads only c_custkey; variants/blocks derive from
    # the key by md5, so a bare key column is the whole record source.
    n_cust = BASE_CUST * mult
    pq.write_table(
        pa.table({"c_custkey": pa.array(range(n_cust), pa.int64())}),
        os.path.join(outdir, "customer.parquet"),
    )

    # HUB TWIN (VERDICT r8 #6): a sibling events table with ONE planted
    # hub user whose reach scales with the graph — it visits 10% of all
    # communities with enough events (25, vs the ~280 distinct buckets a
    # member occupies) to clear g9's support-4 edge threshold against
    # most members.  Hub degree therefore grows ~6·(n_comms/10) ∝ mult
    # while every other degree stays constant, so the wedge join's
    # hub contribution grows ∝ mult² — exactly the skew the g10/g6
    # docstrings warn about.  Written as a separate dir so the planted
    # giant component can't perturb the other event-driven stress rows.
    hub_dir = outdir + "_hub"
    os.makedirs(hub_dir, exist_ok=True)
    n_comms = n_users // COMMUNITY
    hub_comms = list(range(0, n_comms, 10))
    n_hub_ev = 25 * len(hub_comms)
    hub_users = np.full(n_hub_ev, n_users, dtype=np.int64)
    hub_hours = np.concatenate(
        [
            cid * COMMUNITY_HOURS
            + rng.integers(0, COMMUNITY_HOURS, 25)
            for cid in hub_comms
        ]
    )
    hub_epoch_us = (
        hub_hours * 3600 + rng.integers(0, 3600, n_hub_ev)
    ) * 1_000_000
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(
                    list(range(n_events + n_hub_ev)), pa.int64()
                ),
                "ts": pa.array(
                    np.concatenate([epoch_us, hub_epoch_us]),
                    pa.timestamp("us"),
                ),
                "user_id": pa.array(
                    np.concatenate([users, hub_users]), pa.int64()
                ),
                "event_type": pa.array(
                    [
                        EVENT_TYPES[int(x)]
                        for x in np.concatenate(
                            [
                                rng.integers(
                                    0, len(EVENT_TYPES), n_events
                                ),
                                rng.integers(0, len(EVENT_TYPES), n_hub_ev),
                            ]
                        )
                    ]
                ),
                "value": pa.array(
                    np.round(
                        rng.uniform(0.01, 490.0, n_events + n_hub_ev), 2
                    )
                ),
            }
        ),
        os.path.join(hub_dir, "events.parquet"),
    )
    return n_docs, n_vecs, n_users, n_cust, n_events


def stages():
    """(name, callable(spark, sf_dir) -> DataFrame, size-driver)."""
    from ecostream.queries.similarity import (
        semdedup1_cluster_prune,
        semdedup2_trained_prune,
        semdedup3_hierarchical_prune,
        semdedup4_two_level_trained,
    )
    from ecostream.queries.text import (
        _docs,
        d3_minhash_lsh_candidates,
        d5_dedup_clusters,
        sparse_cosine_verify,
    )

    def verify_full(spark, d):
        cand = d3_minhash_lsh_candidates(spark, d).select("a_id", "b_id")
        return sparse_cosine_verify(_docs(spark, d), cand)

    from ecostream.queries.graph import user_copresence_components
    from ecostream.queries.llm_pipeline import pipeline3_curation_manifest
    from ecostream.queries.text import (
        d12_incremental_dedup,
        d13_span_removal_dedup,
    )
    from ecostream.schema import load_table

    def copresence_full(spark, d):
        return user_copresence_components(load_table(spark, d, "events"))

    def span_removal_full(spark, d):
        # .count() alone lets Catalyst eliminate d13's left-outer join
        # and prune the md5 reassembly (the aggregate's doc_id is unique,
        # so the join can't change cardinality) — aggregate over the
        # OUTPUT columns so the measured plan is the one users run.
        from pyspark.sql import functions as FF

        return (
            d13_span_removal_dedup(spark, d)
            .groupBy()
            .agg(
                FF.sum("n_removed").alias("s"),
                FF.sum(FF.length("clean_hash")).alias("h"),
            )
        )

    from pyspark.sql import functions as FF

    from ecostream.queries.graph import g8_geo_neighbor_join
    from ecostream.queries.llm_pipeline import id1_global_enumeration
    from ecostream.queries.seriesops import er1_entity_resolution

    # er1/g8/id1 end in presentational ORDER BYs; aggregate over their
    # OUTPUT columns (the d13 device) so EliminateSorts drops only the
    # final sort while blocking/CC/cell-join/rank stages all execute.
    def er_full(spark, d):
        return (
            er1_entity_resolution(spark, d)
            .groupBy()
            .agg(
                FF.sum("entity_id").alias("se"),
                FF.sum("n_records").alias("sn"),
                FF.sum(FF.when(FF.col("is_canonical"), 1).otherwise(0)).alias("sc"),
                FF.sum(FF.length("canon_name")).alias("sl"),
            )
        )

    def cms_full(spark, d):
        from ecostream.queries.sketches import cms1_heavy_hitters

        return (
            cms1_heavy_hitters(spark, d)
            .groupBy()
            .agg(
                FF.sum("user_id").alias("su"),
                FF.sum("est_count").alias("se"),
                FF.sum("true_count").alias("st"),
                FF.sum("overcount").alias("so"),
            )
        )

    def truss_full(spark, d):
        from ecostream.queries.graph import g15_k_truss

        return (
            g15_k_truss(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("u").alias("su"),
                FF.sum("w").alias("sw"),
                FF.sum("support").alias("ss"),
            )
        )

    def geo_full(spark, d):
        return (
            g8_geo_neighbor_join(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("user_a").alias("sa"),
                FF.sum("dist_km").alias("sd"),
            )
        )

    def enum_full(spark, d):
        return (
            id1_global_enumeration(spark, d)
            .groupBy()
            .agg(
                FF.sum("global_id").alias("sg"),
                FF.max("global_id").alias("mg"),
                FF.sum("doc_id").alias("sd"),
            )
        )

    # Round-7 additions (stress-measured the round they land, so the
    # next verdict's "measure last round's funnels" ask is pre-paid):
    # tok3's two hard-EM E-steps, pack3's per-shard BFD/NF folds, d14's
    # fingerprint-bucket pair join, and g9's bulk peeling.
    from ecostream.queries.graph import g9_kcore_peel
    from ecostream.queries.llm_pipeline import pack3_bfd_packing
    from ecostream.queries.text import d14_winnowing_pairs
    from ecostream.queries.tokenizer import tok3_unigram_train

    def pack_full(spark, d):
        return (
            pack3_bfd_packing(spark, d)
            .groupBy()
            .agg(
                FF.sum("bfd_bins").alias("sb"),
                FF.sum("nf_bins").alias("sn"),
                FF.sum("bfd_waste_permille").alias("sw"),
            )
        )

    def winnow_full(spark, d):
        return (
            d14_winnowing_pairs(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("n_shared").alias("ss"),
                FF.sum("jaccard_permille").alias("sj"),
            )
        )

    def kcore_full(spark, d):
        return (
            g9_kcore_peel(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("core_degree").alias("sd"),
                FF.max("k").alias("k"),
            )
        )

    # semdedup1/2 are now DECLARED capped baselines (vec_id < 4096 —
    # round-6 re-scope after this harness measured their flat argmax
    # quadratic at 1.62/1.67); stressing them would measure the cap
    # constant, so the flat rows are retired from the table and the
    # scale-path successors (semdedup3/4) remain the measured rows.
    #
    # Round-8 stages: sim11's incremental IVF (delta assignment onto
    # frozen centroids + the rebuild eval tower) and roll2's sketch
    # build + weekly quantile serve.
    from ecostream.queries.similarity import sim11_ivf_incremental
    from ecostream.queries.storage_queries import (
        roll2_quantile_sketch_serve,
    )

    # g11 LPA rides the same co-presence edge set as g9/g7 but adds
    # 4 synchronous label-shuffle rounds — measured the round it
    # lands, like every new graph join.
    from ecostream.queries.graph import g11_label_propagation

    def lpa_full(spark, d):
        return (
            g11_label_propagation(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("size").alias("sz"),
                FF.sum("member_sum").alias("ms"),
            )
        )

    # Round-9 stages: g10's wedge join measured WITH and WITHOUT the
    # planted scale-proportional hub (VERDICT r8 #6 — the quadratic-in-
    # degree caveat gets a number), decon2's bucketed semantic-decon
    # candidate join, and sim11 re-measured in its persisted-index form.
    from ecostream.queries.graph import g10_link_prediction
    from ecostream.queries.similarity import decon2_semantic_overlap

    def linkpred_full(spark, d):
        return (
            g10_link_prediction(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("n_common").alias("sc"),
                FF.sum("u").alias("su"),
                FF.sum("v").alias("sv"),
            )
        )

    def linkpred_hub_full(spark, d):
        return (
            g10_link_prediction(spark, d + "_hub")
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("n_common").alias("sc"),
                FF.sum("u").alias("su"),
                FF.sum("v").alias("sv"),
            )
        )

    def decon_full(spark, d):
        return (
            decon2_semantic_overlap(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("cos_micro").alias("sc"),
                FF.sum("doc_id").alias("sd"),
            )
        )

    # d17's prefix-filtered exact similarity join is an UNCAPPED
    # production path (the whole point is that the prefix postings
    # bound the candidate space); pca1 is cov1's one-pass moment
    # matrix + model-sized waves, so its exponent should be ~1 (the
    # scan) regardless of corpus size.
    from ecostream.queries.similarity import pca1_power_iteration
    from ecostream.queries.text import d17_ppjoin_prefix_filter

    def ppjoin_full(spark, d):
        return (
            d17_ppjoin_prefix_filter(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("n_inter").alias("si"),
                FF.sum("jacc_permille").alias("sj"),
            )
        )

    # sim12 composed IVF-PQ (round 10): the corpus-scaling stages are
    # the coarse assignment and the per-vector encoding (both one
    # broadcast join + map-side argmin collapse); codebooks/LUT are
    # model-sized.  Expect ~linear wall like pca1.
    from ecostream.queries.similarity import sim12_ivfpq_ann

    def ivfpq_full(spark, d):
        return (
            sim12_ivfpq_ann(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("adc_dist").alias("sd"),
                FF.sum("match_id").alias("sm"),
            )
        )

    # sim13 graph ANN (round 10): build cost = two-level routing +
    # cell-keyed kNN graph (~n*occupancy pairs); probe cost is
    # frontier-sized.  Expect ~linear wall.
    from ecostream.queries.similarity import sim13_nsw_greedy_ann

    def nsw_full(spark, d):
        return (
            sim13_nsw_greedy_ann(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("l2q_dist").alias("sd"),
                FF.sum("match_id").alias("sm"),
            )
        )

    # rrf1 hybrid retrieval (round 10): both legs are corpus-linear
    # (one inverted-index join + one broadcast cosine scan); fusion is
    # model-sized.  g14 PPR: one window+groupBy collapse, then
    # model-sized waves.
    from ecostream.queries.similarity import rrf1_hybrid_retrieval
    from ecostream.queries.graph import g14_personalized_pagerank

    def rrf_full(spark, d):
        return (
            rrf1_hybrid_retrieval(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("rrf_micro").alias("sr"),
                FF.sum("match_id").alias("sm"),
            )
        )

    def ppr_full(spark, d):
        return (
            g14_personalized_pagerank(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("ppr_micro").alias("sp"),
            )
        )

    from ecostream.queries.storage_queries import (
        roll3_distinct_sketch_serve,
    )

    def roll3_full(spark, d):
        return (
            roll3_distinct_sketch_serve(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("kmv_est").alias("se"),
                FF.sum("n_exact").alias("sx"),
            )
        )

    from ecostream.queries.storage_queries import roll4_cms_rollup_serve

    def roll4_full(spark, d):
        return (
            roll4_cms_rollup_serve(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("est_count").alias("se"),
                FF.sum("n_cand_days").alias("sc"),
            )
        )

    from ecostream.queries.graph import g16_bfs_hops

    def bfs_full(spark, d):
        return (
            g16_bfs_hops(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.max("hop").alias("mh"),
                FF.sum("hop").alias("sh"),
            )
        )

    def pca_full(spark, d):
        return (
            pca1_power_iteration(spark, d)
            .groupBy()
            .agg(
                FF.count("*").alias("n"),
                FF.sum("loading_micro").alias("sl"),
                FF.max("var_explained_permille").alias("ve"),
            )
        )

    return [
        ("lsh_candidates (d3)", d3_minhash_lsh_candidates, "docs"),
        ("sparse_verify (d10 mech)", verify_full, "docs"),
        ("dedup_clusters (d5)", d5_dedup_clusters, "docs"),
        ("incremental_dedup (d12)", d12_incremental_dedup, "docs"),
        ("span_removal (d13)", span_removal_full, "docs"),
        ("curation_funnel (pipeline3)", pipeline3_curation_manifest, "docs"),
        ("copresence_cc (g7 mech)", copresence_full, "users"),
        ("semdedup3 (hierarchical)", semdedup3_hierarchical_prune, "vecs"),
        ("semdedup4 (2-level trained)", semdedup4_two_level_trained, "vecs"),
        ("entity_resolution (er1)", er_full, "cust"),
        ("geo_radius_join (g8)", geo_full, "users"),
        ("global_enumeration (id1)", enum_full, "docs"),
        ("unigram_train (tok3)", tok3_unigram_train, "docs"),
        ("bfd_packing (pack3)", pack_full, "docs"),
        ("winnowing_pairs (d14)", winnow_full, "docs"),
        ("kcore_peel (g9)", kcore_full, "users"),
        ("k_truss (g15)", truss_full, "users"),
        ("ivf_incremental (sim11)", sim11_ivf_incremental, "vecs"),
        ("quantile_sketch (roll2)", roll2_quantile_sketch_serve, "events"),
        ("label_propagation (g11)", lpa_full, "users"),
        ("link_prediction (g10)", linkpred_full, "users"),
        ("link_prediction_hub (g10)", linkpred_hub_full, "users"),
        ("semantic_decon (decon2)", decon_full, "vecs"),
        ("ppjoin_exact (d17)", ppjoin_full, "docs"),
        ("ivfpq_ann (sim12)", ivfpq_full, "vecs"),
        ("nsw_graph_ann (sim13)", nsw_full, "vecs"),
        ("hybrid_retrieval (rrf1)", rrf_full, "docs"),
        ("personalized_pagerank (g14)", ppr_full, "events"),
        ("pca_power_iteration (pca1)", pca_full, "vecs"),
        ("distinct_sketch_rollup (roll3)", roll3_full, "events"),
        ("cms_topk (cms1)", cms_full, "events"),
        ("cms_rollup_serve (roll4)", roll4_full, "events"),
        ("bfs_hops (g16)", bfs_full, "users"),
    ]


def pair_probes():
    """Per-stage OUTPUT-PAIR counters (VERDICT r7 #5): the d14/er1
    stress exponents are attributed to pair-output growth from the
    generator's dup forests; dividing stage time by these counts turns
    the attribution into a measured per-pair cost.  Probes run
    UNTIMED, once per scale."""
    from ecostream.queries.seriesops import er1_candidate_pairs
    from ecostream.queries.text import (
        d14_winnowing_pairs,
        d17_ppjoin_prefix_filter,
    )

    return {
        "winnowing_pairs (d14)": lambda s, d: d14_winnowing_pairs(
            s, d
        ).count(),
        "entity_resolution (er1)": lambda s, d: er1_candidate_pairs(
            s, d
        ).count(),
        "ppjoin_exact (d17)": lambda s, d: d17_ppjoin_prefix_filter(
            s, d
        ).count(),
    }


def funnel_probes():
    """Per-stage funnel counters (VERDICT r10 #4): run untimed once per
    scale; the full stage-by-stage row volumes that attribute a stress
    exponent to a specific stage rather than to the pipeline at large."""
    from ecostream.queries.text import d14_funnel_counts

    return {
        "winnowing_pairs (d14)": d14_funnel_counts,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,5,10")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--workdir", default="/tmp/ecostream_stress")
    ap.add_argument(
        "--only",
        default=None,
        help="comma-separated substrings; run only matching stages "
        "(for measuring a newly added stage without re-timing the "
        "whole table)",
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from ecostream.session import get_spark

    spark = get_spark(app_name="ecostream-stress")
    spark.sparkContext.setLogLevel("ERROR")
    todo = stages()
    if args.only:
        keys = [k.strip() for k in args.only.split(",")]
        todo = [t for t in todo if any(k in t[0] for k in keys)]

    sizes: dict[int, tuple[int, int, int, int, int]] = {}
    for mult in scales:
        d = os.path.join(args.workdir, f"x{mult}")
        sizes[mult] = gen_slice(d, mult)
    probes = pair_probes()
    stage_probes = funnel_probes()
    stage_counts: dict[str, dict[int, dict]] = {s: {} for s in stage_probes}

    # Untimed warm-up at the smallest scale: JVM, codegen, parquet
    # footer caches, broadcast machinery — all paid before any timing.
    lo = min(scales)
    lo_dir = os.path.join(args.workdir, f"x{lo}")
    for _, fn, _ in todo:
        fn(spark, lo_dir).count()

    results: dict[str, dict[int, float]] = {s: {} for s, _, _ in todo}
    counts: dict[str, dict[int, int]] = {s: {} for s, _, _ in todo}
    pairs: dict[str, dict[int, int]] = {s: {} for s in probes}
    for mult in scales:
        d = os.path.join(args.workdir, f"x{mult}")
        print(f"-- x{mult}: {sizes[mult][0]} docs, {sizes[mult][1]} vecs, "
              f"{sizes[mult][2]} users, {sizes[mult][3]} customers",
              flush=True)
        for name, fn, _ in todo:
            times = []
            for _ in range(args.runs):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                n = fn(spark, d).count()
                times.append(time.perf_counter() - t0)
            times.sort()
            results[name][mult] = times[len(times) // 2]
            counts[name][mult] = n
            print(f"   {name:26s} {results[name][mult]:7.2f}s "
                  f"({n} rows)", flush=True)
            if name in probes:
                pairs[name][mult] = probes[name](spark, d)
                upp = 1e6 * results[name][mult] / max(pairs[name][mult], 1)
                print(f"   {name:26s} pairs={pairs[name][mult]} "
                      f"({upp:.2f} us/pair)", flush=True)
            if name in stage_probes:
                stage_counts[name][mult] = stage_probes[name](spark, d)
                print(f"   {name:26s} stages={stage_counts[name][mult]}",
                      flush=True)

    hi = max(scales)
    print("\nstage                       "
          + "".join(f"x{m:<9}" for m in scales) + "exponent(lo->hi)")
    report = {}
    for name, _, unit in todo:
        row = "".join(f"{results[name][m]:<10.2f}" for m in scales)
        ucol = {"docs": 0, "vecs": 1, "users": 2, "cust": 3, "events": 4}[
            unit
        ]
        n_lo = sizes[lo][ucol]
        n_hi = sizes[hi][ucol]
        if n_hi == n_lo:  # single-scale smoke run: no exponent to fit
            e = float("nan")
        else:
            e = math.log(results[name][hi] / results[name][lo]) / math.log(
                n_hi / n_lo
            )
        print(f"{name:28s}{row}{e:.2f}")
        report[name] = {
            "secs": {str(m): round(results[name][m], 2) for m in scales},
            "rows": counts[name],
            "exponent": round(e, 2),
        }
        if name in pairs and pairs[name]:
            upp = {
                str(m): round(
                    1e6 * results[name][m] / max(pairs[name][m], 1), 2
                )
                for m in scales
            }
            report[name]["pairs"] = {
                str(m): pairs[name][m] for m in scales
            }
            report[name]["us_per_pair"] = upp
            print(f"{name:28s}us/pair: "
                  + "  ".join(f"x{m}={upp[str(m)]}" for m in scales))
        if name in stage_counts and stage_counts[name]:
            report[name]["stages"] = {
                str(m): stage_counts[name][m] for m in scales
            }
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
