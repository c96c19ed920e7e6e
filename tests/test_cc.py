"""Connected components (functions/cc.py): equality with a local
union-find on random graphs, and the d5 dedup-cluster pipeline's
invariants over the real documents table."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


class _UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _local_components(vertices, edges):
    uf = _UnionFind()
    for v in vertices:
        uf.find(v)
    for s, d in edges:
        uf.union(s, d)
    return {v: uf.find(v) for v in vertices}


def test_cc_matches_union_find_on_random_graphs(spark):
    from ecostream.functions.cc import connected_components

    rng = random.Random(7)
    for trial in range(3):
        n = 60
        verts = list(range(n))
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randrange(20, 80))
        ]
        expected = _local_components(verts, edges)
        vdf = spark.createDataFrame([(v,) for v in verts], "v long")
        edf = spark.createDataFrame(
            [(s, d) for s, d in edges] or [(0, 0)], "src long, dst long"
        )
        # both execution paths: driver union-find (small-graph default)
        # and forced distributed label propagation must agree
        got = {
            r["v"]: r["component"]
            for r in connected_components(vdf, edf).collect()
        }
        assert got == expected, f"trial {trial} (local path)"
        got_dist = {
            r["v"]: r["component"]
            for r in connected_components(
                vdf, edf, local_threshold=0
            ).collect()
        }
        assert got_dist == expected, f"trial {trial} (distributed path)"


def test_d5_dedup_clusters_invariants(spark):
    """d5 over the real table: every cluster's keeper is its min doc_id,
    labels agree with a local union-find over the SAME pair set, and
    every emitted doc appears in exactly one cluster."""
    from ecostream.queries.text import (
        d1_exact_dedup,
        d5_dedup_clusters,
        minhash_lsh_candidates,
    )
    from ecostream.schema import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    near = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_candidates(docs, max_bucket_size=64).collect()
    }
    exact = d1_exact_dedup(spark, SF_SMOKE)
    dup_hashes = exact.where(F.col("n_copies") > 1).select("content_hash", "keep_id")
    exact_pairs = {
        (r["keep_id"], r["doc_id"])
        for r in docs.select(F.md5("text").alias("content_hash"), "doc_id")
        .join(dup_hashes, "content_hash")
        .where(F.col("doc_id") != F.col("keep_id"))
        .collect()
    }
    pairs = near | exact_pairs
    verts = sorted({x for p in pairs for x in p})
    expected = _local_components(verts, pairs)

    rows = d5_dedup_clusters(spark, SF_SMOKE).collect()
    got = {r["doc_id"]: r["cluster"] for r in rows}
    assert got == expected
    assert len(rows) == len({r["doc_id"] for r in rows})
    by_cluster: dict[int, list] = {}
    for r in rows:
        by_cluster.setdefault(r["cluster"], []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m["doc_id"] for m in members)
        keepers = [m for m in members if m["keep"]]
        assert len(keepers) == 1 and keepers[0]["doc_id"] == cid


def test_cc_paths_agree_on_foreign_endpoints(spark):
    """Edges through endpoints NOT in the vertex set must conduct
    connectivity identically on both execution paths, and the output
    must contain exactly the input vertices."""
    from ecostream.functions.cc import connected_components

    vdf = spark.createDataFrame([(1,), (2,), (5,)], "v long")
    # 1-3, 3-2: vertex 3 is foreign but joins 1 and 2; 5 is isolated
    edf = spark.createDataFrame([(1, 3), (3, 2)], "src long, dst long")
    want = {1: 1, 2: 1, 5: 5}
    for thr in (1_000_000, 0):  # local union-find path, distributed path
        got = {
            r["v"]: r["component"]
            for r in connected_components(vdf, edf, local_threshold=thr).collect()
        }
        assert got == want, (thr, got)


def test_cc_long_chain_converges_in_log_rounds(spark):
    """Adversarial diameter: a 256-node path graph. Hash-min label
    propagation needs ~255 rounds; the two-phase large-star/small-star
    contraction (Kiveris et al. 2014) must label it correctly in
    O(log n) rounds — we allow 3*ceil(log2 n) + 2 = 26."""
    import math

    from pyspark.sql import functions as F

    from ecostream.functions.cc import _two_phase_labels

    n = 256
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels, rounds = _two_phase_labels(sym, max_rounds=64)
    got = {r["v"]: r["component"] for r in labels.collect()}
    assert got == {v: 0 for v in range(n)}
    bound = 3 * math.ceil(math.log2(n)) + 2
    assert rounds <= bound, f"{rounds} rounds > {bound} on a {n}-chain"


def test_cc_zero_edges_on_both_paths(spark):
    """An EMPTY edge relation must yield every vertex as its own
    component on both paths — exercised without the `or [(0, 0)]`
    placeholder the random-graph test substitutes, so a regression in
    empty-DataFrame handling (Arrow round-trip of an empty pandas
    frame, empty createDataFrame with schema) is caught here."""
    import pandas as pd

    from ecostream.functions.cc import connected_components

    vertices = spark.createDataFrame([(v,) for v in range(5)], "v long")
    edges = spark.createDataFrame(
        pd.DataFrame({"src": pd.Series(dtype="int64"),
                      "dst": pd.Series(dtype="int64")}),
        "src long, dst long",
    )
    assert edges.count() == 0
    for threshold in (1_000_000, 0):  # local path, then distributed path
        got = {
            r["v"]: r["component"]
            for r in connected_components(
                vertices, edges, local_threshold=threshold
            ).collect()
        }
        assert got == {v: v for v in range(5)}, (threshold, got)


def test_cc_string_vertex_ids_local_path(spark):
    """String vertex ids through the local union-find path: component
    labels are the lexicographic min of each component."""
    from ecostream.functions.cc import connected_components

    vertices = spark.createDataFrame(
        [("ant",), ("bee",), ("cat",), ("dog",)], "v string"
    )
    edges = spark.createDataFrame(
        [("bee", "cat"), ("cat", "dog")], "src string, dst string"
    )
    got = {
        r["v"]: r["component"]
        for r in connected_components(vertices, edges).collect()
    }
    assert got == {"ant": "ant", "bee": "bee", "cat": "bee", "dog": "bee"}


def test_cc_null_edge_endpoints_ignored_on_both_paths(spark):
    """Edges with a null endpoint carry no connectivity; the local
    union-find and distributed label-propagation paths must agree on
    that instead of one raising and the other silently dropping."""
    from ecostream.functions.cc import connected_components

    vertices = spark.createDataFrame([(v,) for v in range(4)], "v long")
    edges = spark.createDataFrame(
        [(0, 1), (None, 2), (2, None), (None, None)],
        "src long, dst long",
    )
    for threshold in (1_000_000, 0):  # local path, then distributed path
        got = {
            r["v"]: r["component"]
            for r in connected_components(
                vertices, edges, local_threshold=threshold
            ).collect()
        }
        assert got == {0: 0, 1: 0, 2: 2, 3: 3}, (threshold, got)
