"""Independent (third-implementation) checks for graph operators: the
oracle pins Spark==DuckDB; these pin both against a from-scratch pure
Python recomputation, so a shared misreading of the semantics cannot
slip through."""

from __future__ import annotations

from itertools import combinations

import duckdb

from ecostream.queries.registry import QUERIES

from .conftest import SF_SMOKE


def test_g6_triangles_match_pure_python(spark):
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    edges: set[tuple[str, str]] = set()
    adj: dict[str, set[str]] = {}
    for _doc_id, text in docs:
        toks = sorted(set(text.split(" ")))
        for a, b in combinations(toks, 2):
            edges.add((a, b))
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts: dict[str, int] = {}
    nodes = sorted(adj)
    for a, b in edges:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c: count each triangle once
                for n in (a, b, c):
                    counts[n] = counts.get(n, 0) + 1
    got = {
        r["node"]: r["n_triangles"]
        for r in QUERIES["g6_cooccurrence_triangles"](spark, SF_SMOKE).collect()
    }
    expected = {n: counts[n] for n in nodes if n in counts}
    assert got == expected
