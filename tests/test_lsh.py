"""MinHash+LSH near-dup recall on planted duplicates.

With 16 bands × 4 rows, P(candidate | J) = 1 − (1 − J⁴)¹⁶: for the
planted J ≈ 0.92 pairs the miss probability is ~2e-9, so asserting
100% recall is stable; fully-disjoint docs share no shingles, so any
candidate pair between them would indicate a hash-collision bug.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (fixture import side effects)


def _docs_df(spark):
    rows = []
    for i in range(20):
        words = [f"w{i}_{j}" for j in range(50)]
        rows.append((i, " ".join(words)))
        near = words[:-2] + [f"alt{i}_a", f"alt{i}_b"]  # 47/53 shared bigrams
        rows.append((100 + i, " ".join(near)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_recall_on_planted_near_dups(spark):
    from ecostream.queries.text import minhash_lsh_candidates

    docs = _docs_df(spark)
    cands = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_candidates(docs, num_perm=64, bands=16).collect()
    }
    for i in range(20):
        assert (i, 100 + i) in cands, f"planted near-dup pair {i} missed"
    # Disjoint-vocab docs share zero shingles -> no candidate pairs.
    for (a, b) in cands:
        assert b - a == 100 and a < 20, f"false candidate between disjoint docs: {(a, b)}"


def test_stop_bucket_guard_keeps_planted_pairs(spark):
    """With a bucket-size cap, planted near-dup pairs (bucket size 2)
    must survive; a mass-duplicated boilerplate doc family (one giant
    bucket per band) must be excluded."""
    from pyspark.sql import functions as F
    from ecostream.queries.text import minhash_lsh_candidates

    rows = []
    for i in range(10):
        words = [f"w{i}_{j}" for j in range(50)]
        rows.append((i, " ".join(words)))
        rows.append((100 + i, " ".join(words[:-2] + [f"a{i}", f"b{i}"])))
    boiler = " ".join(f"same_{j}" for j in range(50))
    for i in range(30):  # 30 identical docs -> bucket size 30 in every band
        rows.append((1000 + i, boiler))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    cands = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_candidates(
            docs, num_perm=64, bands=16, max_bucket_size=8
        ).collect()
    }
    for i in range(10):
        assert (i, 100 + i) in cands, f"planted pair {i} dropped by guard"
    assert not any(a >= 1000 for a, _ in cands), "boilerplate bucket not excluded"


def test_ml_minhash_lsh_recall_vs_exact(spark):
    """The library-form LSH (d6) must recover the exact 2-gram Jaccard
    pairs at similarity ≥ 0.5 (its join threshold) on the shared
    doc_id < 200 domain — approxSimilarityJoin filters candidates by
    EXACT distance, so misses can come only from band-bucketing, and 16
    tables at J ≥ 0.5 make those vanishingly rare on this data."""
    from ecostream.queries.registry import QUERIES

    from .conftest import SF_SMOKE

    exact = {
        (r["a_id"], r["b_id"])
        for r in QUERIES["d2_ngram_jaccard_pairs"](spark, SF_SMOKE).collect()
        if r["jaccard"] >= 0.5
    }
    got = {
        (r["a_id"], r["b_id"])
        for r in QUERIES["d6_ml_minhash_lsh_pairs"](spark, SF_SMOKE).collect()
        if r["a_id"] < 200 and r["b_id"] < 200
    }
    assert exact, "exact pair set unexpectedly empty"
    missed = exact - got
    assert not missed, f"LSH missed exact pairs: {sorted(missed)[:10]}"


def test_d9_banding_is_complete_vs_bruteforce(spark):
    """The pigeonhole claim, checked empirically: the banded pair
    search must return EXACTLY the pairs a brute-force hamming scan
    over all fingerprint pairs finds at distance <= 3 — complete
    recall, zero false positives."""
    from .conftest import SF_SMOKE
    from ecostream.queries.registry import QUERIES
    from ecostream.queries.text import _docs, simhash_table

    fps = {
        r["doc_id"]: r["simhash"]
        for r in simhash_table(_docs(spark, SF_SMOKE)).collect()
    }
    ids = sorted(fps)
    expected = {
        (a, b, bin(fps[a] ^ fps[b]).count("1"))
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(fps[a] ^ fps[b]).count("1") <= 3
    }
    got = {
        (r["a_id"], r["b_id"], r["hamming"])
        for r in QUERIES["d9_simhash_pairs"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_d10_verify_consistent_and_candidate_bounded(spark):
    """Every verified pair must be a d3b candidate, the integer
    inequality must agree with the float cosine away from the
    boundary, and the plan must broadcast the candidate-bounded side
    (never the |docs|-sized weight/norm tables)."""
    from ecostream.queries.registry import QUERIES

    from .conftest import SF_SMOKE

    cands = {
        (r["a_id"], r["b_id"])
        for r in QUERIES["d3b_minhash_lsh_md5"](spark, SF_SMOKE).collect()
    }
    rows = QUERIES["d10_sparse_cosine_verify"](spark, SF_SMOKE).collect()
    assert rows, "no candidate pairs to verify at this SF"
    assert len(rows) == len(cands)
    for r in rows:
        assert (r["a_id"], r["b_id"]) in cands
        assert 0.0 < r["cos_sim"] <= 1.0
        if abs(r["cos_sim"] - 0.5) > 1e-6:
            assert r["dup_verified"] == (r["cos_sim"] >= 0.5), r
    plan = (
        QUERIES["d10_sparse_cosine_verify"](spark, SF_SMOKE)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan


def test_eval4_deciles_partition_the_candidate_set(spark):
    """eval4's Jaccard-decile histogram must partition d3b's candidate
    pairs exactly: decile counts sum to |candidates|, deciles lie in
    [0, 10], and the high-decile mass is nonzero at this SF (planted
    near-dups share most shingles)."""
    from ecostream.queries.text import (
        d3b_minhash_lsh_md5,
        eval4_lsh_precision,
    )

    sf = "/root/testdata/sf0.01"
    n_cand = d3b_minhash_lsh_md5(spark, sf).count()
    rows = eval4_lsh_precision(spark, sf).collect()
    assert sum(r["n_pairs"] for r in rows) == n_cand
    assert all(0 <= r["jaccard_decile"] <= 10 for r in rows)
    assert sum(r["n_pairs"] for r in rows if r["jaccard_decile"] >= 8) > 0
