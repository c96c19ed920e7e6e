"""Distributed SCC (functions/scc.py) against the driver-local Tarjan.

The coloring algorithm must produce the exact SCC partition of the
iterative Tarjan in ``markov_analysis.py`` on random digraphs, and the
m4b query must classify every state identically to m4 (class + period
+ same grouping) on the real event data.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from ecostream.functions.scc import distributed_scc
from ecostream.markov_analysis import _tarjan_scc

from .conftest import SF_SMOKE


def _random_digraph(n: int, p: float, seed: int):
    rng = random.Random(seed)
    nodes = [f"s{i:02d}" for i in range(n)]
    edges = [
        (a, b)
        for a in nodes
        for b in nodes
        if a != b and rng.random() < p
    ]
    return nodes, edges


def _partition(pairs) -> set[frozenset]:
    by_label: dict[str, set] = {}
    for state, label in pairs:
        by_label.setdefault(label, set()).add(state)
    return {frozenset(s) for s in by_label.values()}


def test_distributed_scc_equals_tarjan_on_random_digraphs(spark):
    for seed, p in [(7, 0.08), (11, 0.15), (13, 0.3)]:
        nodes, edges = _random_digraph(12, p, seed)
        adj = {a: [] for a in nodes}
        for a, b in edges:
            adj[a].append(b)
        want = {frozenset(scc) for scc in _tarjan_scc(adj)}
        vdf = spark.createDataFrame([(v,) for v in nodes], "v string")
        edf = spark.createDataFrame(edges or [("s00", "s00")], "src string, dst string")
        got_rows = distributed_scc(vdf, edf).collect()
        got = _partition((r["state"], r["scc"]) for r in got_rows)
        assert got == want, f"seed={seed} p={p}"


def test_m4b_matches_driver_local_m4(spark):
    from ecostream.queries.markov import (
        m4_dtmc_classification,
        m4b_dtmc_classification_distributed,
    )

    local = m4_dtmc_classification(spark, SF_SMOKE).collect()
    dist = m4b_dtmc_classification_distributed(spark, SF_SMOKE).collect()
    assert sorted((r["state"], r["class"], r["period"]) for r in local) == sorted(
        (r["state"], r["class"], r["period"]) for r in dist
    )
    assert _partition((r["state"], r["scc"]) for r in local) == _partition(
        (r["state"], r["scc"]) for r in dist
    )
