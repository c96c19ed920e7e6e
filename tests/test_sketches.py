"""Property tests for the sketch operators' accuracy budgets
(SURVEY §5 rule 3): K1 zero false negatives + FP ≈ p, K2 HLL within
3·rsd, K4 MinHash Jaccard within 3·σ(128 perms)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_bloom_no_false_negatives_and_fp_rate(spark):
    """Build over half the keyspace, probe all: every present key must
    report possibly_present; absent keys flag at ≈ p (reference budget
    p=0.03, consultas.py:127)."""
    from ecostream.sketches import BloomFilter, bloom_probe_df

    df = spark.range(0, 20000).select(
        F.concat(F.lit("key_"), F.col("id")).alias("key")
    )
    build = df.where(F.col("id") < 10000)
    probe = df
    out = bloom_probe_df(
        build, F.col("key"), probe, F.col("key"), n=10000, p=0.03
    ).collect()
    present = {r["key"]: r["possibly_present"] for r in out}
    false_neg = [k for k in present if int(k.split("_")[1]) < 10000 and not present[k]]
    assert not false_neg, f"bloom false negatives: {false_neg[:5]}"
    absent = [k for k in present if int(k.split("_")[1]) >= 10000]
    fp = sum(1 for k in absent if present[k]) / len(absent)
    assert fp <= 2 * 0.03, f"bloom FP rate {fp:.4f} > 2p"

    # driver-bitset variant agrees with the distributed probe
    bf = BloomFilter.build(build, F.col("key"), n=10000, p=0.03)
    sample = ["key_1", "key_9999", "key_10001", "key_19999"]
    for key, possibly in bf.contains(spark, sample):
        assert possibly == present[key]


def test_hll_error_bound(spark):
    """approx_count_distinct(rsd=0.01625) within 3·1.625% of exact on a
    10k-distinct column (hyperloglog.py budget, SURVEY §5.3)."""
    df = spark.range(0, 100000).select((F.col("id") % 10000).alias("v"))
    est = df.agg(F.approx_count_distinct("v", 0.01625).alias("e")).collect()[0]["e"]
    assert abs(est - 10000) / 10000 <= 3 * 0.01625, est


def test_minhash_jaccard_error_bound(spark):
    """128-perm MinHash estimate within 3·0.0442 of exact Jaccard on
    two overlapping synthetic sets (minwisehashing.py budget)."""
    from ecostream.sketches import minhash_jaccard, minhash_signature

    # set A = 0..999, set B = 500..1499  → J = 500/1500 = 1/3
    a = spark.range(0, 1000).select(F.lit(1).alias("g"), F.col("id"))
    b = spark.range(500, 1500).select(F.lit(2).alias("g"), F.col("id"))
    df = a.unionAll(b).select("g", F.concat(F.lit("x"), F.col("id")).alias("elem"))
    sigs = minhash_signature(df, ["g"], F.col("elem"), num_perm=128)
    est = minhash_jaccard(sigs, sigs, "g", num_perm=128).collect()
    assert len(est) == 1
    j = est[0]["jaccard_est"]
    assert abs(j - 1 / 3) <= 3 * 0.0442, j


def test_dtmc_classification_known_chain(spark):
    """Sanity: absorbing 2-cycle {a,b} is recurrent with period 2;
    state c leaking into it is transient (MarkovChainAnalysis parity)."""
    from ecostream.markov_analysis import classify_states

    probs = {
        "a": {"b": 1.0},
        "b": {"a": 1.0},
        "c": {"a": 0.5, "c": 0.5},
    }
    out = classify_states(probs)
    assert out["a"]["class"] == "recurrent" and out["a"]["period"] == 2
    assert out["b"]["class"] == "recurrent" and out["b"]["period"] == 2
    assert out["c"]["class"] == "transient"


def test_random_walk_paths(spark):
    """Walk respects adjacency, stops at sinks, errors on unknown start
    (random_walk_utils.py:33-47 edge cases per FIXTURES §A)."""
    from ecostream.queries.graph import random_walk

    adj = {"a": [("b", 1.0)], "b": []}
    path = random_walk(adj, "a", steps=10, seed=7)
    assert path == ["a", "b"]  # sink stops early
    with pytest.raises(ValueError):
        random_walk(adj, "zz", steps=3, seed=7)
    # determinism under seed
    adj2 = {"a": [("b", 1.0), ("c", 1.0)], "b": [("a", 1.0)], "c": [("a", 1.0)]}
    assert random_walk(adj2, "a", 20, seed=5) == random_walk(adj2, "a", 20, seed=5)


def test_bloom_probe_query_no_false_negatives(spark):
    """Declared k1_bloom_probe vs its exact twin on real testdata: the
    independently-joined is_member flag must agree with the exact twin,
    and no_false_negative must hold for every key (the Bloom
    invariant the oracle asserts)."""
    from ecostream.queries import QUERIES

    exact = {
        r["key"] for r in QUERIES["k1_membership_present"](spark, SF_SMOKE).collect()
    }
    rows = QUERIES["k1_bloom_probe"](spark, SF_SMOKE).collect()
    assert all(r["no_false_negative"] for r in rows)
    got_members = {r["key"] for r in rows if r["is_member"]}
    assert got_members == exact


def test_minhash_wide_and_long_forms_agree(spark):
    """The wide (num_perm aggregates) and long (explode + one min)
    signature formulations are alternate physical plans for the SAME
    hash family — their signatures must be identical slot-for-slot."""
    from ecostream.sketches import minhash_signature, minhash_signature_long

    df = (
        spark.range(0, 300)
        .select((F.col("id") % 7).alias("g"), F.concat(F.lit("e"), F.col("id")).alias("elem"))
    )
    wide = {
        r["g"]: r["sig"]
        for r in minhash_signature(df, ["g"], F.col("elem"), num_perm=32).collect()
    }
    long_ = {
        r["g"]: r["sig"]
        for r in minhash_signature_long(df, ["g"], F.col("elem"), num_perm=32).collect()
    }
    assert wide == long_


def test_approx_percentile_close_to_exact(spark):
    """approx_percentile(accuracy=10000) rank error <= n/10000 ⇒ on the
    events table the p50 estimate must sit within the exact p45-p55
    band per group."""
    from ecostream.queries.analytics import a9_percentiles_approx
    from ecostream.schema import load_table
    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    bounds = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.45)).alias("lo"),
            F.percentile("value", F.lit(0.55)).alias("hi"),
        )
        .collect()
    }
    # independent estimate (the declared query folds this check into its
    # within_band output, which the oracle asserts; recompute here so the
    # property test doesn't trust the query's own comparison)
    ests = {
        r["event_type"]: r["p50_est"]
        for r in ev.groupBy("event_type")
        .agg(
            F.approx_percentile("value", F.lit(0.5), F.lit(10000)).alias(
                "p50_est"
            )
        )
        .collect()
    }
    for et, (lo, hi) in bounds.items():
        assert lo <= ests[et] <= hi, (et, ests[et], lo, hi)
    for r in a9_percentiles_approx(spark, SF_SMOKE).collect():
        assert r["within_band"] is True, r


def test_distributed_walk_matches_local_simulation(spark):
    """The hash-deterministic distributed walk must equal an
    independent local simulation of the same choice rule (neighbor =
    xxhash64(current, step, seed) % degree over sorted neighbors)."""
    from ecostream.queries.graph import habitat_edges, walk_distributed
    from .conftest import SF_SMOKE

    edges = habitat_edges(spark, SF_SMOKE)
    rows = edges.collect()
    adj: dict[str, list[str]] = {}
    for r in rows:
        adj.setdefault(r["src"], []).append(r["dst"])
        adj.setdefault(r["dst"], []).append(r["src"])
    for k in adj:
        adj[k].sort()
    start = sorted(adj)[0]
    seed, steps = 42, 10
    # Local twin of the hash rule: evaluate pmod(xxhash64, degree) in
    # one batch for every (habitat, step) pair with that node's actual
    # degree (x mod M mod d != x mod d in general, so no intermediate
    # modulus), then walk locally off the lookup table.
    pairs = [(h, t, len(adj[h])) for h in adj for t in range(steps)]
    hdf = spark.createDataFrame(pairs, "habitat string, step int, degree int")
    hv = {
        (r["habitat"], r["step"]): r["h"]
        for r in hdf.select(
            "habitat",
            "step",
            F.pmod(
                F.xxhash64(F.col("habitat"), F.col("step"), F.lit(seed)),
                F.col("degree"),
            ).alias("h"),
        ).collect()
    }
    cur, want = start, [(0, start)]
    for t in range(steps):
        cur = adj[cur][hv[(cur, t)]]
        want.append((t + 1, cur))
    got = [
        (r["step"], r["habitat"])
        for r in walk_distributed(spark, edges, start, steps, seed).collect()
    ]
    assert got == want


def test_hll_sketch_merge_accuracy(spark):
    """Merged per-day HLL sketches must estimate within 3σ (3·1.04/√2^12)
    of the exact distinct count per event_type."""
    from ecostream.queries.sketches import (
        k2_distinct_exact,
        k2_hll_sketch_mergeable,
    )
    from .conftest import SF_SMOKE

    exact = {
        r["event_type"]: r["n_users"]
        for r in k2_distinct_exact(spark, SF_SMOKE).collect()
    }
    rows = k2_hll_sketch_mergeable(spark, SF_SMOKE).collect()
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        assert r["n_users_exact"] == exact[r["event_type"]]
        assert r["within_3rsd"] is True, r


def test_cms_heavy_hitters_invariants(spark):
    """CMS guarantees, recomputed independently: estimates never
    undercount (one-sided error), every TRUE heavy hitter survives the
    estimate-side threshold (no false negatives), and the overcount is
    within the eps*N bound for d=4/w=512 with overwhelming margin."""
    from collections import Counter

    from ecostream.queries.sketches import k8_cms_heavy_hitters
    from ecostream.schema import load_table
    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events")
    truth = Counter(
        f"{r['event_type']}_{r['user_id'] % 50}"
        for r in ev.select("event_type", "user_id").collect()
    )
    n = sum(truth.values())
    rows = k8_cms_heavy_hitters(spark, SF_SMOKE).collect()
    got = {r["key"]: r for r in rows}
    for r in rows:
        assert r["true_count"] == truth[r["key"]]
        assert r["no_underestimate"] is True
        assert r["est_count"] >= r["true_count"]
        # e/w * N classical bound (Markov argument holds per row; the
        # min over d=4 independent rows makes exceeding it astronomically
        # unlikely on this data)
        assert r["est_count"] - r["true_count"] <= max(2, 2.72 / 512 * n * 4)
    # every true heavy hitter (>=0.5% of stream) must be reported:
    # est >= true, so the estimate-side threshold can only ADD keys
    for key, cnt in truth.items():
        if cnt * 200 >= n:
            assert key in got, f"true heavy hitter {key} missing"


def test_kmv1_estimate_accuracy_and_small_set_rule(spark):
    """KMV estimates must land within the ~1/sqrt(k-2) error regime
    (4x slack pinned), and groups smaller than k must fall back to the
    exact count."""
    from ecostream.queries.registry import QUERIES

    from .conftest import SF_SMOKE

    rows = QUERIES["kmv1_distinct_estimate"](spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        n, est = r["n_exact"], r["kmv_est"]
        if n < 64:
            assert est == n, r
        else:
            # rsd ~ 1/sqrt(62) ~ 12.7%; assert within 4 rsd
            assert abs(est - n) <= max(2, 0.51 * n), r


def test_kmv2_intersection_accuracy(spark):
    """Pairwise intersection estimates must track the exact overlap
    within the KMV error regime (generous 0.6 relative slack at k=64
    for the product of two estimators), and the small-union rule must
    return the exact sketch overlap."""
    from ecostream.queries.registry import QUERIES

    from .conftest import SF_SMOKE

    rows = QUERIES["kmv2_intersection_estimate"](spark, SF_SMOKE).collect()
    assert len(rows) >= 3
    for r in rows:
        n, est = r["n_inter_exact"], r["kmv_inter_est"]
        assert abs(est - n) <= max(4, 0.6 * n), tuple(r)
