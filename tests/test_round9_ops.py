"""Round-9 operator tests: planted-input semantics for the new ops.

decon2: semantic (embedding-level) benchmark decontamination must
recall planted paraphrase pairs — docs whose TEXT shares no n-gram
with the benchmark but whose embedding is a near-copy.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_corpus(tmp_path, texts, sources, vecs, labels=None):
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * n),
                "source": pa.array(sources),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array(labels or [0] * n, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )


def test_decon2_planted_paraphrase_recall(spark, tmp_path):
    """Plant 3 paraphrase pairs: train docs 10/20/30 carry embeddings
    that are tiny perturbations of benchmark docs 0/1/2 (cos > 0.99)
    while their TEXTS share no token with the benchmark — invisible to
    n-gram decon (t9/decon1), exactly the leak decon2 exists to catch.
    All 3 must be flagged (positive margin, correct benchmark match);
    no clean doc may cross the 0.85 bar (random 32-dim vectors sit far
    below it)."""
    from ecostream.queries.similarity import decon2_semantic_overlap

    rng = np.random.default_rng(7)
    n, dim = 60, 32
    vecs = rng.standard_normal((n, dim))
    planted = {10: 0, 20: 1, 30: 2}
    for train_id, bench_id in planted.items():
        vecs[train_id] = vecs[bench_id] + 0.01 * rng.standard_normal(dim)
    texts = [f"bench passage {i} alpha beta" for i in range(5)] + [
        f"train doc {i} totally different words" for i in range(5, n)
    ]
    sources = ["src0"] * 5 + ["src1"] * (n - 5)
    _write_corpus(tmp_path, texts, sources, vecs)

    rows = decon2_semantic_overlap(spark, str(tmp_path)).collect()
    flagged = {r["doc_id"]: r for r in rows if r["is_flagged"]}
    assert set(flagged) == set(planted), (
        f"planted recall failed: flagged={sorted(flagged)}"
    )
    for train_id, bench_id in planted.items():
        r = flagged[train_id]
        assert r["match_id"] == bench_id
        assert r["margin_micro"] > 0
        assert r["cos_micro"] > 990_000
    # the watchlist itself is non-vacuous and carries clean docs with
    # negative margins (the audit evidence)
    clean = [r for r in rows if not r["is_flagged"]]
    assert clean and all(r["margin_micro"] < 0 for r in clean)
