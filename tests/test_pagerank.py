"""PageRank (functions/pagerank.py): equality with a local numpy power
iteration on random digraphs (including dangling nodes), plus the
declared habitat query's invariants."""

from __future__ import annotations

import random

import numpy as np

from .conftest import SF_SMOKE


def _numpy_pagerank(n, edges, damping=0.85, max_iter=40, tol=1e-9):
    A = np.zeros((n, n))
    for s, d in edges:
        A[s, d] += 1.0
    outdeg = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(max_iter):
        inflow = np.zeros(n)
        for s in range(n):
            if outdeg[s] > 0:
                inflow += damping * r[s] * A[s] / outdeg[s]
        dangling = damping * r[outdeg == 0].sum() / n
        new = (1.0 - damping) / n + inflow + dangling
        if np.abs(new - r).sum() < tol:
            r = new
            break
        r = new
    return r


def test_pagerank_matches_numpy_on_random_digraphs(spark):
    from ecostream.functions.pagerank import pagerank

    rng = random.Random(11)
    for trial in range(2):
        n = 12
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(8, 30))
        ]
        expected = _numpy_pagerank(n, edges)
        vdf = spark.createDataFrame([(v,) for v in range(n)], "v long")
        edf = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["v"]: r["rank"]
            for r in pagerank(vdf, edf, max_iter=40, tol=1e-8).collect()
        }
        for v in range(n):
            assert abs(got[v] - expected[v]) < 1e-5, (trial, v, got[v], expected[v])


def test_g5_pagerank_habitats_sums_to_one(spark):
    from ecostream.queries.graph import g5_pagerank_habitats

    rows = g5_pagerank_habitats(spark, SF_SMOKE).collect()
    assert len(rows) >= 2
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-3
    assert all(r["rank"] > 0 for r in rows)
