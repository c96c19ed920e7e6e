"""Probabilistic sketch operators (SURVEY §2.7 K1-K5), Spark-first.

Each sketch follows the reference's semantics but is built with
distributed expressions (hash/pmod/min aggregates), never row-at-a-time
Python.  The *exact twins* used for the oracle gate live in
queries/sketches.py; these classes are the reusable sketch machinery
plus property-tested accuracy bounds.

Hash-family note (SURVEY X6): the reference uses mmh3 with seeds
0..k-1; Spark's ``hash``/``xxhash64`` fix the seed but accept extra
columns, so we vary the *input* (``hash(key, lit(i))``) — the same
pairwise-independence property, documented deviation.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# K1 — Bloom filter (reference bloomfilter.py:6-35)
# ---------------------------------------------------------------------------


def bloom_params(n: int, p: float) -> tuple[int, int]:
    """Classic sizing: m = ceil(-n ln p / ln² 2) bits, k = ceil(m/n ln 2)
    (reference bloomfilter.py:13-17 — arg names swapped there, math same)."""
    m = math.ceil(-n * math.log(p) / (math.log(2) ** 2))
    k = max(1, math.ceil((m / n) * math.log(2)))
    return m, k


@dataclass
class BloomFilter:
    """Driver-held bitset built by a distributed position aggregation.

    Build: each key contributes k positions ``pmod(xxhash64(key, i), m)``
    computed executor-side; only the distinct set positions (≤ n·k ints)
    are collected.  At 100 TB you would instead keep positions as a
    DataFrame and probe via join — ``bloom_probe_df`` does exactly that.
    """

    m: int
    k: int
    bits: int  # arbitrary-precision int as bitset

    @classmethod
    def build(cls, df: DataFrame, key: Column, n: int, p: float) -> "BloomFilter":
        m, k = bloom_params(n, p)
        positions = (
            df.select(
                F.explode(
                    F.array(
                        *[F.pmod(F.xxhash64(key, F.lit(i)), F.lit(m)) for i in range(k)]
                    )
                ).alias("pos")
            )
            .distinct()
            .collect()
        )
        bits = 0
        for row in positions:
            bits |= 1 << row["pos"]
        return cls(m=m, k=k, bits=bits)

    def contains(self, spark, keys: list[str]) -> list[tuple[str, bool]]:
        """Probe keys: True = possibly present, False = definitely absent.
        Positions are computed with the same Spark hash expressions so
        build and probe agree bit-for-bit."""
        kdf = spark.createDataFrame([(x,) for x in keys], "key string")
        rows = kdf.select(
            "key",
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col("key"), F.lit(i)), F.lit(self.m))
                    for i in range(self.k)
                ]
            ).alias("pos"),
        ).collect()
        return [
            (r["key"], all((self.bits >> int(pp)) & 1 for pp in r["pos"]))
            for r in rows
        ]


def bloom_probe_df(
    build_df: DataFrame, build_key: Column, probe_df: DataFrame, probe_key: Column,
    n: int, p: float,
) -> DataFrame:
    """Fully-distributed bloom probe: build positions as a DataFrame,
    probe via left join on position — the scale path (no driver bitset).
    Returns probe rows with ``possibly_present`` (no false negatives;
    false positives ≈ p)."""
    m, k = bloom_params(n, p)
    build_pos = (
        build_df.select(
            F.explode(
                F.array(
                    *[F.pmod(F.xxhash64(build_key, F.lit(i)), F.lit(m)) for i in range(k)]
                )
            ).alias("pos")
        )
        .distinct()
    )
    probe_pos = probe_df.select(
        probe_key.alias("key"),
        F.explode(
            F.array(
                *[F.pmod(F.xxhash64(probe_key, F.lit(i)), F.lit(m)) for i in range(k)]
            )
        ).alias("pos"),
    )
    joined = probe_pos.join(F.broadcast(build_pos.withColumn("hit", F.lit(1))), "pos", "left")
    return (
        joined.groupBy("key")
        .agg((F.count("*") == F.sum(F.coalesce(F.col("hit"), F.lit(0)))).alias("possibly_present"))
    )


# ---------------------------------------------------------------------------
# K4 — MinHash signatures (reference minwisehashing.py:4-36)
# ---------------------------------------------------------------------------


_MERSENNE_31 = 2**31 - 1


def _affine_params(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for the universal hash family
    h_i(x) = (a_i·x + b_i) mod (2^31−1) — a simple seeded LCG keeps the
    params reproducible without the (forbidden-in-workflows) RNG."""
    params = []
    state = 0x9E3779B97F4A7C15
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**64
        a = state % (_MERSENNE_31 - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % 2**64
        b = state % _MERSENNE_31
        params.append((a, b))
    return params


def minhash_signature(
    df: DataFrame, group_cols: list[str], key: Column, num_perm: int = 128
) -> DataFrame:
    """Per-group MinHash signature as ONE ``sig: array<bigint>`` column.

    Hash family: ONE ``xxhash64`` of the key reduced mod the Mersenne
    prime 2^31−1, then num_perm affine permutations ``(a_i·x + b_i) mod
    p`` — the classic universal family.  This replaces num_perm full
    string hashes per row with one string hash + num_perm 64-bit int
    ops (a_i·x ≤ (2^31)² < 2^63, so no overflow under ANSI mode);
    measured ~2.5× faster than per-seed ``hash(key, lit(i))`` on
    shingle-sized inputs.  Same independence property as the
    reference's per-seed mmh3 (minwisehashing.py:11,19, deviation
    documented at SURVEY X6); values stay in [0, 2^31) like its
    ``& 0x7FFFFFFF`` clamp (X8).

    Shape: one hash-agg pass of num_perm ``min`` aggregates (map-side
    combine keeps the shuffle at |groups|·num_perm ints) packed into a
    single array column afterwards."""
    base = F.pmod(F.xxhash64(key), F.lit(_MERSENNE_31))
    with_base = df.select(*group_cols, base.alias("_mh_base"))
    aggs = [
        F.min(
            F.pmod(F.col("_mh_base") * F.lit(a) + F.lit(b), F.lit(_MERSENNE_31))
        ).alias(f"h{i}")
        for i, (a, b) in enumerate(_affine_params(num_perm))
    ]
    wide = with_base.groupBy(*group_cols).agg(*aggs)
    return wide.select(
        *group_cols, F.array(*[f"h{i}" for i in range(num_perm)]).alias("sig")
    )


def minhash_signature_long(
    df: DataFrame, group_cols: list[str], key: Column, num_perm: int = 128
) -> DataFrame:
    """Same signature semantics as ``minhash_signature`` via a LONG
    formulation: explode each row to (group, slot, h) and take one
    ``min`` per (group, slot), repacking to the array afterwards.

    Trade-off: the wide form compiles num_perm aggregate expressions
    (codegen cost ~seconds, amortized over large inputs); the long form
    compiles a handful of expressions but materializes |rows|·num_perm
    exploded rows through two shuffles.  Measured crossover: wide wins
    above ~100k input rows (shingle-scale d3), long wins on
    small-group inputs (k4's ~150 set rows: 1.1s vs 3.3s end-to-end).
    Pick per call site; both produce identical signatures."""
    params = _affine_params(num_perm)
    a_arr = F.array(*[F.lit(a) for a, _ in params])
    b_arr = F.array(*[F.lit(b) for _, b in params])
    base = F.pmod(F.xxhash64(key), F.lit(_MERSENNE_31))
    rows = df.select(*group_cols, base.alias("x")).select(
        *group_cols,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(num_perm - 1)),
                lambda i: F.pmod(
                    F.element_at(a_arr, i + 1) * F.col("x")
                    + F.element_at(b_arr, i + 1),
                    F.lit(_MERSENNE_31),
                ),
            )
        ).alias("slot", "h"),
    )
    agg = rows.groupBy(*group_cols, "slot").agg(F.min("h").alias("mh"))
    return (
        agg.groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list(F.struct("slot", "mh"))).alias("sm"))
        .select(
            *group_cols, F.transform("sm", lambda s: s["mh"]).alias("sig")
        )
    )


def minhash_jaccard(
    sig_a: DataFrame, sig_b: DataFrame, on_distinct: str, num_perm: int = 128
) -> DataFrame:
    """Estimated Jaccard between every pair of signatures (a < b):
    fraction of matching slots (reference minwisehashing.py:32-36),
    computed as one ``zip_with``/``aggregate`` expression over the
    array signatures.  σ ≈ sqrt(J(1-J)/num_perm)."""
    a = sig_a.select(F.col(on_distinct).alias("a_id"), F.col("sig").alias("sig_a"))
    b = sig_b.select(F.col(on_distinct).alias("b_id"), F.col("sig").alias("sig_b"))
    pairs = a.join(b, F.col("a_id") < F.col("b_id"))
    matches = F.aggregate(
        F.zip_with(
            "sig_a", "sig_b", lambda x, y: F.when(x == y, 1).otherwise(0)
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return pairs.select(
        "a_id", "b_id", (matches / F.lit(num_perm)).alias("jaccard_est")
    )


# ---------------------------------------------------------------------------
# K2 — HyperLogLog: use Spark's built-in HLL++ (never reimplement, X7)
# ---------------------------------------------------------------------------

# b=12 → m=4096 registers → relative std error 1.04/sqrt(4096) = 1.625%
HLL_RSD = 0.01625


def approx_distinct(df: DataFrame, col: str, rsd: float = HLL_RSD) -> Column:
    """approx_count_distinct tuned to the reference's b=12 accuracy
    budget (hyperloglog.py:5-8)."""
    return F.approx_count_distinct(col, rsd)
