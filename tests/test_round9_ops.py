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


def test_mw1_detects_planted_shift(spark, tmp_path):
    """A planted location shift (view values ~ purchase + 50) must push
    the common-language effect size far below 500000 (purchase tends
    SMALLER), and U1 + U2 must always equal 2*n1*n2 (doubled units)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ecostream.queries.analytics import mw1_mann_whitney

    n = 400
    rows = []
    for i in range(n):
        rows.append((i, "purchase", float(10 + i % 40)))
        rows.append((n + i, "view", float(60 + i % 40)))
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([1_700_000_000_000_000 + i for i in range(2 * n)], pa.timestamp("us")),
                "user_id": pa.array([r[0] % 7 for r in rows], pa.int64()),
                "event_type": pa.array([r[1] for r in rows]),
                "value": pa.array([r[2] for r in rows]),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    r = mw1_mann_whitney(spark, str(tmp_path)).collect()[0]
    assert r["u1_x2"] + r["u2_x2"] == 2 * r["n1"] * r["n2"]
    assert r["auc_micro"] < 100_000  # purchases are stochastically smaller


def test_g13_dominant_type_gets_full_authority(spark, tmp_path):
    """The max-normalized top authority is exactly 1e6, and a type
    touched only by low-activity users ranks below one favored by the
    heavy hitters."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ecostream.queries.graph import g13_hits_authorities

    rows = []
    eid = 0
    # heavy users 0..4: 20 events each on type 'hot'
    for u in range(5):
        for _ in range(20):
            rows.append((eid, u, "hot")); eid += 1
    # the same heavy users also touch 'warm' a little
    for u in range(5):
        rows.append((eid, u, "warm")); eid += 1
    # light users 10..29: one 'cold' event each
    for u in range(10, 30):
        rows.append((eid, u, "cold")); eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([1_700_000_000_000_000 + r[0] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([1.0] * len(rows)),
            }
        ),
        str(tmp_path / "events.parquet"),
    )
    out = {r["event_type"]: r["auth_micro"]
           for r in g13_hits_authorities(spark, str(tmp_path)).collect()}
    assert out["hot"] == 1_000_000
    assert out["warm"] > out["cold"]


def test_cov1_diagonal_and_symmetric_signs(spark, tmp_path):
    """Diagonal correlation is exactly 1e6; a planted perfectly
    anti-correlated dimension pair lands at -1e6."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ecostream.queries.similarity import cov1_embedding_covariance

    rng = np.random.default_rng(3)
    n, dim = 50, 4
    v = rng.standard_normal((n, dim))
    v[:, 1] = -v[:, 0]  # dim 1 = -dim 0: corr exactly -1
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, row)) for row in v],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * n, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    out = {(r["i"], r["j"]): r["corr_micro"]
           for r in cov1_embedding_covariance(spark, str(tmp_path)).collect()}
    assert len(out) == dim * (dim + 1) // 2
    for i in range(dim):
        assert out[(i, i)] == 1_000_000
    assert out[(0, 1)] == -1_000_000


def test_s13_compaction_rewrites_only_flagged_files(spark):
    """Physical MOR property: after the declared query runs, the
    compacted commit contains ONLY the flagged file's partitions, its
    rows carry no deleted ids, and the base files are untouched."""
    import os

    from ecostream.queries.storage_queries import (
        _workdir,
        s13_deletion_vector_read,
    )

    sf_dir = "/root/testdata/sf0.001"
    rows = {r["file_id"]: r for r in
            s13_deletion_vector_read(spark, sf_dir).collect()}
    flagged = [fid for fid, r in rows.items() if r["compacted"]]
    assert flagged == [2]
    root = _workdir("s13_dv")
    comp_parts = [
        d for d in os.listdir(os.path.join(root, "compacted"))
        if d.startswith("file_id=")
    ]
    assert comp_parts == ["file_id=2"]
    base_parts = sorted(
        d for d in os.listdir(os.path.join(root, "base"))
        if d.startswith("file_id=")
    )
    assert base_parts == [f"file_id={i}" for i in range(4)]
    comp = spark.read.parquet(os.path.join(root, "compacted"))
    dv = spark.read.parquet(os.path.join(root, "dv"))
    leaked = comp.join(dv, ["file_id", "event_id"]).count()
    assert leaked == 0
    # n_live + n_deleted == n_base per file (no row lost or duplicated)
    for r in rows.values():
        assert r["n_live"] + r["n_deleted"] == r["n_base"]


def _write_events(tmp_path, rows, props=None):
    """rows: list of (event_id, ts_us, user_id, event_type, value)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    cols = {
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "user_id": pa.array([r[2] for r in rows], pa.int64()),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    }
    if props is not None:
        cols["props"] = pa.array(props)
    pq.write_table(pa.table(cols), str(tmp_path / "events.parquet"))


def test_d17_finds_exactly_planted_near_dups(spark, tmp_path):
    """30 random-soup docs + 2 planted near-copy pairs (one token of
    ~50 rewritten -> shingle Jaccard ~0.84).  The prefix-filtered join
    must return exactly the planted pairs — no false negative (the
    prefix lemma) and no sub-threshold survivor (the exact verify)."""
    from ecostream.queries.text import d17_ppjoin_prefix_filter

    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(200)]
    texts = [
        " ".join(rng.choice(vocab, size=50))
        for _ in range(30)
    ]
    # planted near-copies: docs 30/31 copy 3/7 with ONE token changed
    for src in (3, 7):
        toks = texts[src].split()
        toks[25] = "zz"
        texts.append(" ".join(toks))
    _write_corpus(
        tmp_path, texts, ["s"] * len(texts),
        rng.standard_normal((len(texts), 8)),
    )
    got = {
        (r["a_id"], r["b_id"]): r["jacc_permille"]
        for r in d17_ppjoin_prefix_filter(spark, str(tmp_path)).collect()
    }
    assert set(got) == {(3, 30), (7, 31)}
    assert all(v >= 800 for v in got.values())


def test_pca1_recovers_planted_dominant_direction(spark, tmp_path):
    """Embeddings stretched 20x along dim 0: the top component must
    load maximally on dim 0 (|loading| = 1e6 by max-normalization,
    positive by sign canonicalization) and explain most variance."""
    from ecostream.queries.similarity import pca1_power_iteration

    rng = np.random.default_rng(5)
    n, dim = 300, 8
    vecs = 0.05 * rng.standard_normal((n, dim))
    vecs[:, 0] += 2.0 * rng.standard_normal(n)
    _write_corpus(
        tmp_path, ["x y z"] * n, ["s"] * n, vecs,
    )
    rows = {r["dim"]: r for r in
            pca1_power_iteration(spark, str(tmp_path)).collect()}
    assert rows[0]["loading_micro"] == 1_000_000
    assert all(
        abs(rows[d]["loading_micro"]) < 200_000 for d in range(1, dim)
    )
    assert rows[0]["var_explained_permille"] > 700


def test_m7_top_path_is_the_planted_loop(spark, tmp_path):
    """One user loops a->b->c 50 times; another emits noise.  The top
    trigram must be (a,b,c) and counts must reflect every window."""
    from ecostream.queries.markov import m7_top_trigram_paths

    rows = []
    t = 1_700_000_000_000_000
    for i in range(150):  # a b c a b c ... -> 148 trigrams, (a,b,c) x50
        rows.append((i, t + i, 1, "abc"[i % 3], 0.0))
    rows.append((1000, t + 10_000, 2, "x", 0.0))
    _write_events(tmp_path, rows)
    top = m7_top_trigram_paths(spark, str(tmp_path)).collect()[0]
    assert (top["e1"], top["e2"], top["e3"]) == ("a", "b", "c")
    assert top["n"] == 50


def test_dq6_flags_late_half_null_regression(spark, tmp_path):
    """props goes all-null in the late half: null_pm_late = 1000 while
    null_pm_early = 0 — the broken-producer signature dq6 exists to
    catch; event_type cardinality stays flat (drift 0)."""
    from ecostream.queries.analytics import dq6_column_profile_drift

    n = 200
    rows = [
        (i, 1_700_000_000_000_000 + i * 1_000_000, i % 5, "et" + str(i % 3),
         float(i))
        for i in range(n)
    ]
    props = ["{}" if i < n // 2 else None for i in range(n)]
    _write_events(tmp_path, rows, props=props)
    prof = {r["col"]: r for r in
            dq6_column_profile_drift(spark, str(tmp_path)).collect()}
    assert prof["props"]["null_pm_early"] == 0
    assert prof["props"]["null_pm_late"] == 1000
    assert prof["event_type"]["distinct_drift_permille"] == 0
    assert prof["event_type"]["d_early"] == 3


def test_st16_equals_batch_welch(spark, tmp_path):
    """Micro-batch slicing invariance: the streamed moment store must
    serve bit-identical Welch statistics to the direct batch query."""
    from ecostream.queries.analytics import welch1_ttest
    from ecostream.queries.streaming_queries import (
        st16_stream_welch_maintenance,
    )

    n = 300
    rows = []
    for i in range(n):
        et = "purchase" if i % 3 == 0 else "view"
        rows.append((i, 1_700_000_000_000_000 + i, i % 11, et,
                     float(5 + (i * 7) % 90) / 3.0))
    _write_events(tmp_path, rows)
    got = st16_stream_welch_maintenance(spark, str(tmp_path)).collect()
    want = welch1_ttest(spark, str(tmp_path)).collect()
    assert [r.asDict() for r in got] == [r.asDict() for r in want]


def test_seq1_crosses_at_ninth_straight_conversion(spark, tmp_path):
    """20 straight purchases: the LLR gains 336472 micro-nats per
    observation, so the 2995732 boundary is crossed exactly at n=9."""
    from ecostream.queries.analytics import seq1_sprt_monitor

    rows = [
        (i, 1_700_000_000_000_000 + i * 1000, 1, "purchase", 1.0)
        for i in range(20)
    ]
    _write_events(tmp_path, rows)
    r = seq1_sprt_monitor(spark, str(tmp_path)).collect()[0]
    assert r["rejected_h0"] is True
    assert r["first_cross_n"] == 9
    assert r["final_llr_micro"] == 20 * 336_472


def test_s14_diff_counts_match_mutation_rules(spark, tmp_path):
    """On ids 0..99: removed = #(id%11==5), added = #(id%13==1),
    changed = #(id%7==3 minus overlap with removed)."""
    from ecostream.queries.storage_queries import s14_snapshot_diff

    n = 100
    rows = [
        (i, 1_700_000_000_000_000 + i, i % 5, "et", float(i))
        for i in range(n)
    ]
    _write_events(tmp_path, rows)
    got = {r["change"]: r["n_rows"]
           for r in s14_snapshot_diff(spark, str(tmp_path)).collect()}
    removed = sum(1 for i in range(n) if i % 11 == 5)
    added = sum(1 for i in range(n) if i % 13 == 1)
    changed = sum(1 for i in range(n) if i % 7 == 3 and i % 11 != 5)
    assert got["removed"] == removed
    assert got["added"] == added
    assert got["changed"] == changed
    assert got["unchanged"] == n - removed - changed


def test_s15_flags_only_the_corrupt_bucket(spark, tmp_path):
    """The planted flip on event_id 7 must mark bucket 7 (and only
    bucket 7) corrupt, whatever the physical row order."""
    from ecostream.queries.storage_queries import s15_integrity_checksum

    rows = [
        (i, 1_700_000_000_000_000 + i, i % 3, "et" + str(i % 2), float(i))
        for i in range(64)
    ]
    _write_events(tmp_path, rows)
    flagged = {
        r["bucket"]
        for r in s15_integrity_checksum(spark, str(tmp_path)).collect()
        if r["corrupt_detected"]
    }
    assert flagged == {7}


def test_t16_rare_heavy_token_wins(spark, tmp_path):
    """A token unique to doc 0 and repeated there 5x must be doc 0's
    rank-1 keyword (max tf times max idf)."""
    from ecostream.queries.text import t16_keyword_extraction

    texts = ["rare rare rare rare rare common common"] + [
        "common common common filler" for _ in range(20)
    ]
    rng = np.random.default_rng(3)
    _write_corpus(tmp_path, texts, ["s"] * len(texts),
                  rng.standard_normal((len(texts), 4)))
    rows = t16_keyword_extraction(spark, str(tmp_path)).collect()
    doc0 = [r for r in rows if r["doc_id"] == 0]
    assert doc0[0]["keyword"] == "rare" and doc0[0]["rank"] == 1


def test_ess1_uniform_vs_skewed_weights(spark, tmp_path):
    """Equal-length docs give ESS/n = 1000 exactly; one source with a
    single dominating giant doc must sit far lower with a high top
    share."""
    from ecostream.queries.llm_pipeline import ess1_weight_diagnostics

    texts, sources = [], []
    for i in range(20):
        texts.append("a b c d e")          # 5 tokens each
        sources.append("uniform")
    texts.append(" ".join(["w"] * 500))     # the giant
    sources.append("skewed")
    for i in range(9):
        texts.append("a b")
        sources.append("skewed")
    rng = np.random.default_rng(2)
    _write_corpus(tmp_path, texts, sources,
                  rng.standard_normal((len(texts), 4)))
    rows = {r["source"]: r for r in
            ess1_weight_diagnostics(spark, str(tmp_path)).collect()}
    assert rows["uniform"]["ess_permille"] == 1000
    assert rows["skewed"]["ess_permille"] < 200
    assert rows["skewed"]["top_share_permille"] > 900


def test_trim1_outlier_moves_mean_not_trimmed(spark, tmp_path):
    """99 values of 100 cents + one 1e6-cent outlier: the raw mean
    jumps, the 10%-trimmed mean stays exactly 100, and winsorizing
    clamps the outlier to the boundary value."""
    from ecostream.queries.analytics import trim1_robust_means

    rows = [(i, 1_700_000_000_000_000 + i, 1, "et", 1.0) for i in range(99)]
    rows.append((99, 1_700_000_000_000_099, 1, "et", 10_000.0))
    _write_events(tmp_path, rows)
    r = trim1_robust_means(spark, str(tmp_path)).collect()[0]
    assert r["trimmed_mean_cents"] == 100
    assert r["mean_cents"] > 10_000
    assert r["winsorized_mean_cents"] == 100  # boundary value is 100


def test_ent2_monoculture_user_lands_in_bucket_zero(spark, tmp_path):
    """A user with one event type has H = 0 (bucket 0); a user evenly
    split over 4 types has H = ln 4 ~ 1.386 nats (bucket 6)."""
    from ecostream.queries.corpus import ent2_user_diversity

    rows = []
    for i in range(40):  # user 1: all the same type
        rows.append((i, 1_700_000_000_000_000 + i, 1, "a", 0.0))
    for i in range(40):  # user 2: 4 types evenly
        rows.append((100 + i, 1_700_000_000_000_000 + i, 2,
                     "abcd"[i % 4], 0.0))
    _write_events(tmp_path, rows)
    got = {r["h_bucket"]: r["n_users"]
           for r in ent2_user_diversity(spark, str(tmp_path)).collect()}
    assert got.get(0) == 1
    assert got.get(6) == 1  # ln(4)=1.386294 -> 1386294 // 200000 = 6


def test_eval9_murphy_identity_and_perfect_forecaster(spark, tmp_path):
    """res_micro must satisfy the declared identity REL - BRIER + UNC
    exactly, and a perfectly separable corpus (en docs long, others
    short) must score a tiny Brier."""
    from ecostream.queries.analytics import eval9_brier_score

    texts, langs = [], []
    for i in range(50):
        texts.append("word " * 200)    # long -> high score
        langs.append("en")
        texts.append("w " * 3)          # short -> low score
        langs.append("de")
    rng = np.random.default_rng(4)
    n = len(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(langs),
                "source": pa.array(["s"] * n),
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
                    [list(map(float, v))
                     for v in rng.standard_normal((n, 4))],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * n, pa.int32()),
            }
        ),
        str(tmp_path / "embeddings.parquet"),
    )
    rows = eval9_brier_score(spark, str(tmp_path)).collect()
    r = rows[0]
    assert r["res_micro"] == r["rel_micro"] + r["unc_micro"] - r["brier_micro"]
    assert r["brier_micro"] < 30_000  # near-perfect separation
    assert r["unc_micro"] == 250_000  # base rate exactly 1/2


def test_imp1_median_fills_planted_nulls(spark, tmp_path):
    """Values are 100 cents everywhere; the planted mask (id%13==7)
    nulls some — imputation must restore a 100-cent mean exactly."""
    from ecostream.queries.analytics import imp1_median_impute

    rows = [(i, 1_700_000_000_000_000 + i, 1, "et", 1.0) for i in range(130)]
    _write_events(tmp_path, rows)
    r = imp1_median_impute(spark, str(tmp_path)).collect()[0]
    assert r["n_missing"] == 10
    assert r["median_cents"] == 100
    assert r["imputed_mean_cents"] == 100


def test_streak1_finds_planted_streak(spark, tmp_path):
    """User 1 is active 7 consecutive days then gaps; user 2 has
    alternating days.  The top streak must be user 1's 7-day run."""
    from ecostream.queries.seriesops import streak1_daily_streaks

    rows = []
    us = 86_400_000_000
    for d in range(7):
        rows.append((d, d * us + 5, 1, "a", 0.0))
    rows.append((100, 20 * us + 5, 1, "a", 0.0))
    for d in range(10):
        rows.append((200 + d, (2 * d) * us + 5, 2, "a", 0.0))
    _write_events(tmp_path, rows)
    top = streak1_daily_streaks(spark, str(tmp_path)).collect()[0]
    assert top["user_id"] == 1 and top["len"] == 7
    assert top["start_day"] == 0 and top["end_day"] == 6


def test_roll3_st17_merge_equals_direct_and_small_set_fallback(
    spark, tmp_path
):
    """The streamed store must serve the SAME rows as the batch-built
    one (KMV merge is lossless under deterministic hashing), and a
    group with < k distinct users must fall back to the exact count
    (err_permille 0)."""
    from ecostream.queries.storage_queries import (
        roll3_distinct_sketch_serve,
    )
    from ecostream.queries.streaming_queries import (
        st17_stream_distinct_maintenance,
    )

    rows = []
    us = 86_400_000_000
    for i in range(400):  # 2+ weeks, 2 types, ~40 users
        rows.append(
            (i, (i % 16) * us + i, i % 40, "ab"[i % 2], 0.0)
        )
    _write_events(tmp_path, rows)
    batch = [r.asDict() for r in
             roll3_distinct_sketch_serve(spark, str(tmp_path)).collect()]
    streamed = [r.asDict() for r in
                st17_stream_distinct_maintenance(
                    spark, str(tmp_path)).collect()]
    assert batch == streamed
    # 40 distinct users < k=64 -> exact fallback everywhere here
    assert all(r["err_permille"] == 0 for r in batch)
    assert all(r["kmv_est"] == r["n_exact"] for r in batch)


def test_hw1_matches_pure_python(spark):
    """Third implementation of the Holt fold: a plain-Python integer
    recursion over the same gap-filled daily series must reproduce the
    engine's level/trend/forecast exactly (guards the Spark aggregate()
    and DuckDB list_reduce() against a shared misreading of the
    floor-division or init conventions)."""
    from ecostream.queries.seriesops import (
        _HW1_ALPHA,
        _HW1_BETA,
        _HW1_H,
        hw1_holt_trend,
    )
    from ecostream.schema import load_table
    from tests.conftest import SF_CORRECT

    from pyspark.sql import functions as F

    daily = {
        (r["event_type"], r["d"]): r["y"]
        for r in load_table(spark, SF_CORRECT, "events")
        .groupBy(
            "event_type",
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("d"),
        )
        .agg(F.count("*").alias("y"))
        .collect()
    }
    d0 = min(d for _, d in daily)
    d1 = max(d for _, d in daily)
    types = sorted({t for t, _ in daily})

    def fdiv(x):
        return x // 1000 if x >= 0 else -((999 - x) // 1000)

    expected = {}
    for t in types:
        ys = [daily.get((t, d), 0) for d in range(d0, d1 + 1)]
        l, b = ys[0] * 1_000_000, (ys[1] - ys[0]) * 1_000_000
        for y in ys[2:]:
            lp = l
            l = fdiv(_HW1_ALPHA * y * 1_000_000 + (1000 - _HW1_ALPHA) * (l + b))
            b = fdiv(_HW1_BETA * (l - lp) + (1000 - _HW1_BETA) * b)
        expected[t] = (len(ys), l, b, l + _HW1_H * b)

    got = {
        r["event_type"]: (
            r["n_days"],
            r["level_micro"],
            r["trend_micro"],
            r[f"forecast{_HW1_H}_micro"],
        )
        for r in hw1_holt_trend(spark, SF_CORRECT).collect()
    }
    assert got == expected
