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


def test_dtmc_oracle_periods_on_crafted_chains():
    """The m4 DuckDB oracle must classify adversarial chains the same
    way as the engine's classify_states: a 2-cycle, a 3-cycle, and a
    transient feeder — periods the real event data (period 1) never
    exercises."""
    import duckdb

    from ecostream.markov_analysis import classify_states
    from ecostream.queries.markov import (
        _M4B_EDGES_SQL,
        _canonical_scc_index,
        _dtmc_oracle,
    )

    con = duckdb.connect()
    seqs = {
        1: ["A", "B", "A", "B", "A"],          # 2-cycle
        2: ["C", "D", "E", "C", "D", "E", "C"],  # 3-cycle
        3: ["F", "C"],                           # transient feeder
    }
    rows = []
    i = 0
    for uid, seq in seqs.items():
        for s in seq:
            rows.append((uid, s, i, i))
            i += 1
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(f"({u}, '{t}', {ts}, {eid})" for u, t, ts, eid in rows)
        + ") v(user_id, event_type, ts, event_id)"
    )
    got = con.execute(_dtmc_oracle(_M4B_EDGES_SQL)).fetchall()
    # independent expectation from the engine's own classifier
    pairs = set()
    for seq in seqs.values():
        pairs.update(zip(seq, seq[1:]))
    probs: dict[str, dict[str, float]] = {}
    for cur, nxt in pairs:
        probs.setdefault(cur, {})[nxt] = 1.0
    result = classify_states(probs)
    idx = _canonical_scc_index(result)
    want = [
        (state, info["class"], info["period"], idx[info["scc"]])
        for state, info in sorted(result.items())
    ]
    assert got == want
    assert [(r[0], r[1], r[2]) for r in got] == [
        ("A", "recurrent", 2),
        ("B", "recurrent", 2),
        ("C", "recurrent", 3),
        ("D", "recurrent", 3),
        ("E", "recurrent", 3),
        ("F", "transient", 0),
    ]
