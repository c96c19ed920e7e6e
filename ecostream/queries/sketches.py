"""Declared sketch queries (SURVEY §2.7 K1-K5).

Pattern per SURVEY §5: every approximate operator has an *exact twin*
declared with a DuckDB oracle (semi/anti join for Bloom, countDistinct
for HLL, pairwise set Jaccard for MinHash); the approximate forms are
declared rows-only and property-tested for their error bounds in
tests/test_sketches.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import load_table
from ..sketches import (
    HLL_RSD,
    bloom_probe_df,
    minhash_jaccard,
    minhash_signature_long,
)
from .registry import query

# The reference's membership key is f"{species}_{role}_{event}"
# (bloomfilter.py:34-35); driver-table analog: event_type_usermod
# (FIXTURES §C).
def _key() -> F.Column:
    return F.concat_ws(
        "_", F.col("event_type"), (F.col("user_id") % 10).cast("string")
    )


_KEY_SQL = "event_type || '_' || CAST(user_id % 10 AS VARCHAR)"


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- K1 exact twins: membership as semi/anti join ---------------------------


@query(
    "k1_membership_present",
    oracle=f"""
    WITH build AS (
        SELECT DISTINCT {_KEY_SQL} AS key FROM events
        WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    ), probe AS (
        SELECT DISTINCT {_KEY_SQL} AS key FROM events
    )
    SELECT probe.key FROM probe WHERE probe.key IN (SELECT key FROM build)
    """,
)
def k1_membership_present(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom "possibly present" branch (consultas.py:137-138) made exact:
    left_semi of the probe keys against the build window's distinct keys.
    The distinct build side broadcasts — the join-side analog of
    shipping a bloom bitset to every executor."""
    ev = _events(spark, sf_dir)
    build = (
        ev.where(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .select(_key().alias("key"))
        .distinct()
    )
    probe = ev.select(_key().alias("key")).distinct()
    return probe.join(F.broadcast(build), "key", "left_semi")


@query(
    "k1_membership_absent",
    oracle=f"""
    WITH build AS (
        SELECT DISTINCT {_KEY_SQL} AS key FROM events
        WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    ), probe AS (
        SELECT DISTINCT {_KEY_SQL} AS key FROM events
    )
    SELECT probe.key FROM probe WHERE probe.key NOT IN (SELECT key FROM build)
    """,
)
def k1_membership_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom "definitely absent" branch (consultas.py:139-140) as
    left_anti — the guarantee the sketch only approximates."""
    ev = _events(spark, sf_dir)
    build = (
        ev.where(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
        .select(_key().alias("key"))
        .distinct()
    )
    probe = ev.select(_key().alias("key")).distinct()
    return probe.join(F.broadcast(build), "key", "left_anti")


# --- K1 true sketch (rows-only: hash-dependent, deterministic) --------------


@query(
    "k1_bloom_probe",
    oracle=f"""
    WITH build AS (
        SELECT DISTINCT {_KEY_SQL} AS key FROM events
        WHERE ts < TIMESTAMP '2024-01-15 00:00:00'
    ), probe AS (
        SELECT DISTINCT {_KEY_SQL} AS key FROM events
    )
    SELECT p.key,
           (b.key IS NOT NULL) AS is_member,
           TRUE AS no_false_negative
    FROM probe p LEFT JOIN build b ON p.key = b.key
    """,
)
def k1_bloom_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Bloom probe with the reference's p=0.03 budget
    (consultas.py:127).  The bitset is hash-family-specific, so the
    oracle-checkable claim is the Bloom INVARIANT: a member key must
    always probe "possibly present" (no false negatives) —
    ``no_false_negative = possibly_present OR NOT is_member`` must be
    TRUE for every key, with exact membership recomputed independently
    on both engines.  The ≈p false-positive rate stays property-tested
    (it depends on the hash family, which DuckDB can't replay)."""
    ev = _events(spark, sf_dir)
    build = ev.where(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
    # One materialized distinct-key set feeds the sizing count, the
    # bloom build, AND the is_member join — otherwise each consumer
    # rescans + re-distincts the filtered events.
    build_keys = (
        build.select(_key().alias("key")).distinct().localCheckpoint(eager=True)
    )
    n = max(16, build_keys.count())
    probe = ev.select(_key().alias("key")).distinct()
    out = bloom_probe_df(build_keys, F.col("key"), probe, F.col("key"), n=n, p=0.03)
    return (
        out.join(
            F.broadcast(build_keys.withColumn("is_member", F.lit(True))),
            "key",
            "left",
        )
        .select(
            "key",
            F.coalesce("is_member", F.lit(False)).alias("is_member"),
            (
                F.col("possibly_present") | ~F.coalesce("is_member", F.lit(False))
            ).alias("no_false_negative"),
        )
        .orderBy("key")
    )


# --- K2: HLL distinct count — approx + built-in HLL sketch -------------------


@query(
    "k2_distinct_exact",
    oracle="""
    SELECT event_type, count(DISTINCT user_id) AS n_users,
           count(DISTINCT user_id % 1000) AS n_user_buckets
    FROM events GROUP BY event_type
    """,
)
def k2_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact twin of the HLL estimate (hyperloglog.py:25-38): two-phase
    distinct aggregation, no driver-side sets."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct(F.col("user_id") % 1000).alias("n_user_buckets"),
    )


@query(
    "k2_distinct_approx",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           TRUE AS within_3rsd
    FROM events GROUP BY event_type
    """,
)
def k2_distinct_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct estimate at the reference's accuracy budget
    (b=12 → rsd=1.625%, hyperloglog.py:5-8).  Mergeable across
    partitions — the property that makes it work at 100 TB.  The raw
    estimate is engine-specific, so the oracle-checkable claim is the
    ERROR BOUND: the estimate must sit within 3·rsd of the exact
    distinct count (which the oracle recomputes exactly).  A drifting
    estimator flips the boolean and fails the hash."""
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact"),
        (
            F.abs(
                F.approx_count_distinct("user_id", HLL_RSD)
                - F.countDistinct("user_id")
            )
            <= 3 * HLL_RSD * F.countDistinct("user_id")
        ).alias("within_3rsd"),
    )


# --- K4: set similarity — exact Jaccard twin + MinHash estimate --------------


@query(
    "k4_jaccard_exact",
    oracle="""
    WITH sets AS (
        SELECT DISTINCT user_id, event_type FROM events WHERE user_id < 30
    ), sizes AS (
        SELECT user_id, count(*) AS sz FROM sets GROUP BY user_id
    ), inter AS (
        SELECT a.user_id AS a_id, b.user_id AS b_id, count(*) AS n_inter
        FROM sets a JOIN sets b
          ON a.event_type = b.event_type AND a.user_id < b.user_id
        GROUP BY a.user_id, b.user_id
    )
    SELECT a_id, b_id,
           ROUND(CAST(n_inter AS DOUBLE)
                 / CAST(sa.sz + sb.sz - n_inter AS DOUBLE), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.user_id = a_id
    JOIN sizes sb ON sb.user_id = b_id
    """,
)
def k4_jaccard_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise Jaccard of per-user event-type sets (the quantity
    MinHash estimates, minwisehashing.py:32-36).  Inverted-index
    self-join on the set element — candidate pairs only, never the
    full |users|² cross product."""
    ev = _events(spark, sf_dir)
    sets = (
        ev.where(F.col("user_id") < 30)
        .select("user_id", "event_type")
        .distinct()
    )
    sizes = sets.groupBy("user_id").agg(F.count("*").alias("sz"))
    a = sets.alias("a")
    b = sets.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("a_id"), F.col("b.user_id").alias("b_id")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sizes.select(F.col("user_id").alias("a_id"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("user_id").alias("b_id"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "a_id")
        .join(sb, "b_id")
        .select(
            "a_id",
            "b_id",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


@query(
    "k4_minhash_jaccard",
    oracle="""
    WITH sets AS (
        SELECT DISTINCT user_id, event_type FROM events WHERE user_id < 30
    ), users AS (
        SELECT DISTINCT user_id FROM sets
    ), sizes AS (
        SELECT user_id, count(*) AS sz FROM sets GROUP BY user_id
    ), inter AS (
        SELECT a.user_id AS a_id, b.user_id AS b_id, count(*) AS n_inter
        FROM sets a JOIN sets b
          ON a.event_type = b.event_type AND a.user_id < b.user_id
        GROUP BY a.user_id, b.user_id
    )
    SELECT ua.user_id AS a_id, ub.user_id AS b_id,
           ROUND(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
                 / CAST(sa.sz + sb.sz - COALESCE(i.n_inter, 0) AS DOUBLE),
                 6) AS jaccard_exact,
           TRUE AS within_4sigma
    FROM users ua JOIN users ub ON ua.user_id < ub.user_id
    JOIN sizes sa ON sa.user_id = ua.user_id
    JOIN sizes sb ON sb.user_id = ub.user_id
    LEFT JOIN inter i ON i.a_id = ua.user_id AND i.b_id = ub.user_id
    """,
)
def k4_minhash_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """128-permutation MinHash Jaccard estimate between per-user sets
    (reference signature semantics: slot = min over set of seeded hash,
    minwisehashing.py:13-25).  The estimate is hash-family-specific, so
    the oracle-checkable claims are the exact Jaccard (recomputed
    independently by both engines) and the ERROR BOUND: every pair's
    estimate must sit within 4·σ_max = 4·0.0442 of exact (σ_max at
    J=0.5 with 128 perms; the per-J 3σ bound is property-tested).  Any
    signature-pipeline regression flips booleans and fails the hash."""
    ev = _events(spark, sf_dir)
    # Materialize the tiny distinct set once: the signature pipeline,
    # the exact-Jaccard verification joins, and the size/user branches
    # all consume it — without this each branch rescans events.
    sets = (
        ev.where(F.col("user_id") < 30)
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sigs = minhash_signature_long(
        sets, ["user_id"], F.col("event_type"), num_perm=128
    )
    est = minhash_jaccard(sigs, sigs, "user_id", num_perm=128)

    users = sets.select("user_id").distinct()
    sizes = sets.groupBy("user_id").agg(F.count("*").alias("sz"))
    inter = (
        sets.alias("a")
        .join(
            sets.alias("b"),
            (F.col("a.event_type") == F.col("b.event_type"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .groupBy(
            F.col("a.user_id").alias("a_id"), F.col("b.user_id").alias("b_id")
        )
        .agg(F.count("*").alias("n_inter"))
    )
    # Every side below is bounded by the user_id < 30 cap (≤ 30 users,
    # ≤ 435 pairs, ≤ 30·|event_types| set rows) REGARDLESS of corpus
    # size, but the checkpointed lineage hides size stats from the
    # planner, so without hints these four joins each planned as
    # sort-merge with two exchanges (24 Exchange total in the r12
    # baseline plan).  Explicit broadcasts are safe at any scale here —
    # the bound is the filter, not the data (guide §3.1: hint when you
    # KNOW a side is small and the estimate is wrong).
    pairs = (
        users.alias("ua")
        .join(users.alias("ub"), F.col("ua.user_id") < F.col("ub.user_id"))
        .select(
            F.col("ua.user_id").alias("a_id"), F.col("ub.user_id").alias("b_id")
        )
        .join(F.broadcast(sizes.withColumnRenamed("user_id", "a_id").withColumnRenamed("sz", "sza")), "a_id")
        .join(F.broadcast(sizes.withColumnRenamed("user_id", "b_id").withColumnRenamed("sz", "szb")), "b_id")
        .join(F.broadcast(inter), ["a_id", "b_id"], "left")
        .select(
            "a_id",
            "b_id",
            (
                F.coalesce("n_inter", F.lit(0)).cast("double")
                / (F.col("sza") + F.col("szb") - F.coalesce("n_inter", F.lit(0)))
            ).alias("jx"),
        )
    )
    return (
        pairs.join(F.broadcast(est), ["a_id", "b_id"])
        .select(
            "a_id",
            "b_id",
            F.round("jx", 6).alias("jaccard_exact"),
            (F.abs(F.col("jaccard_est") - F.col("jx")) <= 4 * 0.0442).alias(
                "within_4sigma"
            ),
        )
        .orderBy("a_id", "b_id")
    )


# --- K5: representative sampling ---------------------------------------------


@query(
    "k5_representative_sample",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events
    ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
    LIMIT 5
    """,
)
def k5_representative_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative sample (minwisehashing.py:27-30 / random.sample
    k=3 → here k=5).  Selection is by md5-hash order of the row id —
    arbitrary-but-fixed, which upgrades the reference's seeded
    ``random.sample`` to something stable across engines, runs, AND
    partitioning (a seeded ``rand()`` changes when data moves), so the
    exact sampled rows are oracle-checked.  Plans as
    TakeOrderedAndProject: per-partition top-k merge, no global sort."""
    ev = _events(spark, sf_dir)
    return (
        ev.select("event_id", "user_id", "event_type", "value")
        .orderBy(F.md5(F.col("event_id").cast("string")), "event_id")
        .limit(5)
    )


# --- K6: approximate frequent items (heavy hitters) --------------------------


@query(
    "k6_freq_items",
    oracle="""
    WITH n AS (SELECT count(*) AS total FROM events),
    he AS (
        SELECT count(*) AS c FROM (
            SELECT event_type FROM events GROUP BY event_type
            HAVING count(*) > 0.05 * (SELECT total FROM n)
        )
    ),
    hb AS (
        SELECT count(*) AS c FROM (
            SELECT user_id % 50 FROM events GROUP BY user_id % 50
            HAVING count(*) > 0.05 * (SELECT total FROM n)
        )
    )
    SELECT CAST(he.c AS BIGINT) AS n_heavy_event_types,
           TRUE AS event_types_covered,
           CAST(hb.c AS BIGINT) AS n_heavy_user_buckets,
           TRUE AS user_buckets_covered
    FROM he, hb
    """,
)
def k6_freq_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate heavy hitters over (event_type, user bucket) pairs —
    the sketch-family answer to A8's exact top-k frequencies
    (single-pass, bounded memory; support 5%).  freqItems' contents are
    engine-specific, but its GUARANTEE is oracle-checkable: every value
    with true frequency > support must appear in the returned set.  The
    query recomputes the exact heavy-hitter sets and emits their counts
    plus the containment booleans; the oracle recomputes the counts
    independently and asserts TRUE."""
    ev = _events(spark, sf_dir)
    pairs = ev.select(
        F.col("event_type"), (F.col("user_id") % 50).alias("user_bucket")
    )
    out = pairs.stat.freqItems(["event_type", "user_bucket"], support=0.05)
    total = pairs.count()
    heavy_e = {
        r["event_type"]
        for r in pairs.groupBy("event_type").count().collect()
        if r["count"] > 0.05 * total
    }
    heavy_b = {
        r["user_bucket"]
        for r in pairs.groupBy("user_bucket").count().collect()
        if r["count"] > 0.05 * total
    }
    row = out.collect()[0]
    covered_e = heavy_e <= set(row["event_type_freqItems"])
    covered_b = heavy_b <= set(row["user_bucket_freqItems"])
    return spark.createDataFrame(
        [(len(heavy_e), covered_e, len(heavy_b), covered_b)],
        "n_heavy_event_types long, event_types_covered boolean, "
        "n_heavy_user_buckets long, user_buckets_covered boolean",
    )


# --- K7: stratified sampling --------------------------------------------------


@query(
    "k7_stratified_sample",
    oracle="""
    SELECT event_type, count(*) AS n_total, TRUE AS within_tolerance
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def k7_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded stratified sample (sampleBy): per-stratum fractions keep
    rare event types represented — the principled version of K5's
    uniform sample for skewed category distributions.  The sampled SET
    is engine-specific (seeded Bernoulli), so the oracle-checked claims
    are the per-stratum totals (exact, both engines) and the
    REALIZATION BOUND: each stratum's sample count within 4σ of n·f."""
    ev = _events(spark, sf_dir)
    fractions = {
        "click": 0.02,
        "view": 0.02,
        "purchase": 0.1,
        "signup": 0.1,
        "error": 0.2,
    }
    sample = ev.sampleBy("event_type", fractions=fractions, seed=42)
    counts = sample.groupBy("event_type").agg(F.count("*").alias("n_sampled"))
    totals = ev.groupBy("event_type").agg(F.count("*").alias("n_total"))
    frac = F.create_map(
        *[F.lit(x) for kv in fractions.items() for x in kv]
    )[F.col("event_type")]
    # Bernoulli tolerance: |n_sampled − n·f| ≤ 4·sqrt(n·f·(1−f)) + 2
    tol = 4 * F.sqrt(F.col("n_total") * frac * (1 - frac)) + 2
    return (
        totals.join(counts, "event_type", "left")
        .select(
            "event_type",
            "n_total",
            (
                F.abs(F.coalesce("n_sampled", F.lit(0)) - F.col("n_total") * frac)
                <= tol
            ).alias("within_tolerance"),
        )
        .orderBy("event_type")
    )


# --- K2b: mergeable HLL sketch columns (the warehouse-scale pattern) ---------


@query(
    "k2_hll_sketch_mergeable",
    oracle="""
    SELECT event_type,
           count(DISTINCT user_id) AS n_users_exact,
           TRUE AS within_3rsd
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def k2_hll_sketch_mergeable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type computed by MERGING per-day HLL
    sketches (hll_sketch_agg per (type, day) → hll_union_agg per type
    → estimate) — the pattern that matters at 100 TB: daily sketch
    tables are tiny, persistable, and unioning them answers any date
    range without rescanning raw events.  lgConfigK=12 matches the
    reference's b=12 register budget (hyperloglog.py:5-8).  The merged
    estimate is sketch-implementation-specific, so the oracle checks
    the exact count (both engines) plus the 3·rsd error-bound boolean —
    the merge property itself: union-of-daily-sketches must estimate
    the global distinct within budget."""
    ev = _events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("n_users_est")
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    return (
        merged.join(exact, "event_type")
        .select(
            "event_type",
            "n_users_exact",
            (
                F.abs(F.col("n_users_est") - F.col("n_users_exact"))
                <= F.greatest(
                    F.lit(2.0), 3 * 0.01625 * F.col("n_users_exact")
                )
            ).alias("within_3rsd"),
        )
        .orderBy("event_type")
    )


# --- K8: Count-Min sketch heavy hitters (engine extension) ------------------

# Portable CMS hash family: md5 hex digits combined with small-prime
# weights (the split1/s1 oracle device), so DuckDB replays the EXACT
# sketch — every cell count, every min-estimate — not just a bound.
_CMS_D = 4  # hash rows
_CMS_W = 512  # buckets per row

def _cms_key() -> F.Column:
    # lazy: Column construction needs an active SparkContext
    return F.concat_ws(
        "_", F.col("event_type"), (F.col("user_id") % 50).cast("string")
    )


_CMS_KEY_SQL = "event_type || '_' || CAST(user_id % 50 AS VARCHAR)"


def _cms_bucket(key: F.Column, i: int) -> F.Column:
    h = F.md5(F.concat_ws(":", F.lit(str(i)), key))
    return (
        F.ascii(F.substring(h, 1, 1)) * 961
        + F.ascii(F.substring(h, 2, 1)) * 31
        + F.ascii(F.substring(h, 3, 1))
    ) % _CMS_W


def _cms_bucket_sql(key_sql: str, i_sql: str) -> str:
    h = f"md5(CAST({i_sql} AS VARCHAR) || ':' || {key_sql})"
    return (
        f"(ascii(substr({h},1,1))*961 + ascii(substr({h},2,1))*31 "
        f"+ ascii(substr({h},3,1))) % {_CMS_W}"
    )


@query(
    "k8_cms_heavy_hitters",
    oracle=f"""
    WITH keyed AS (
        SELECT {_CMS_KEY_SQL} AS key FROM events
    ), dims AS (
        SELECT unnest([0, 1, 2, 3]) AS i
    ), cells AS (
        SELECT i, {_cms_bucket_sql('key', 'i')} AS b, COUNT(*) AS cnt
        FROM keyed CROSS JOIN dims GROUP BY 1, 2
    ), truth AS (
        SELECT key, COUNT(*) AS true_count FROM keyed GROUP BY 1
    ), est AS (
        SELECT t.key, t.true_count, MIN(c.cnt) AS est_count
        FROM truth t CROSS JOIN dims d
        JOIN cells c
          ON c.i = d.i AND c.b = {_cms_bucket_sql('t.key', 'd.i')}
        GROUP BY 1, 2
    ), total AS (
        SELECT COUNT(*) AS n FROM keyed
    )
    SELECT key,
           CAST(est_count AS BIGINT) AS est_count,
           CAST(true_count AS BIGINT) AS true_count,
           est_count >= true_count AS no_underestimate
    FROM est, total
    WHERE est_count * 200 >= n
    ORDER BY key
    """,
)
def k8_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch heavy hitters (Cormode & Muthukrishnan 2005):
    keys whose estimated frequency is ≥0.5% of the stream.  The engine
    extension the reference's sketch family (K1-K5) lacks.

    Dataflow shape, 100-TB-minded: the sketch is a groupBy over
    (hash_row, bucket) — cardinality d*w = 2048 regardless of key
    cardinality, so partial aggregation collapses each map partition
    to ≤2048 rows before the one shuffle; the probe side broadcasts
    the 2048-cell sketch and takes the min across rows.  No driver
    round-trip, merge = the groupBy itself (sketches from disjoint
    shards union then re-aggregate — associative by construction).

    The md5-digit hash family is engine-portable, so the DuckDB oracle
    replays the ENTIRE mechanism — cells, min-estimates, threshold —
    bit-exactly; `no_underestimate` additionally pins the CMS
    one-sided-error invariant per key."""
    ev = _events(spark, sf_dir)
    keyed = ev.select(_cms_key().alias("key"))
    cells = (
        keyed.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("i"),
                            _cms_bucket(F.col("key"), i).alias("b"),
                        )
                        for i in range(_CMS_D)
                    ]
                )
            ).alias("c")
        )
        .groupBy(F.col("c.i").alias("i"), F.col("c.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    truth = keyed.groupBy("key").agg(F.count(F.lit(1)).alias("true_count"))
    probe = truth.select(
        "key",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        _cms_bucket(F.col("key"), i).alias("b"),
                    )
                    for i in range(_CMS_D)
                ]
            )
        ).alias("c"),
    )
    est = (
        probe.join(
            F.broadcast(cells),
            (F.col("c.i") == F.col("i")) & (F.col("c.b") == F.col("b")),
        )
        .groupBy("key", "true_count")
        .agg(F.min("cnt").alias("est_count"))
    )
    # Stream size as its own scan-and-count: reusing the `truth`
    # aggregate here would duplicate its whole shuffle subtree (Spark
    # shares no uncached subplans), which costs more than this
    # column-pruned count.
    total = keyed.agg(F.count(F.lit(1)).alias("n"))
    return (
        est.crossJoin(F.broadcast(total))
        .where(F.col("est_count") * 200 >= F.col("n"))
        .select(
            "key",
            "est_count",
            "true_count",
            (F.col("est_count") >= F.col("true_count")).alias(
                "no_underestimate"
            ),
        )
        .orderBy("key")
    )


# --- KMV: k-minimum-values distinct sketch -----------------------------------

_KMV_K = 64
_KMV_SCALE = 1 << 40  # 40-bit md5-derived hash space


@query(
    "kmv1_distinct_estimate",
    oracle=f"""
    WITH hashed AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 10))
                   ::UBIGINT::BIGINT + 1 AS h
        FROM events
    ),
    ranked AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
               count(*) OVER (PARTITION BY event_type) AS nd
        FROM hashed
    )
    SELECT event_type,
           CAST(max(nd) AS BIGINT) AS n_exact,
           CAST(CASE WHEN max(nd) < {_KMV_K} THEN max(nd)
                ELSE ({_KMV_K - 1} * {_KMV_SCALE})
                     // max(CASE WHEN rn = {_KMV_K} THEN h END)
           END AS BIGINT) AS kmv_est
    FROM ranked WHERE rn <= {_KMV_K}
    GROUP BY event_type ORDER BY event_type
    """,
)
def kmv1_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values distinct sketch (Bar-Yossef et al. 2002; the
    theta-sketch ancestor): hash every element into (0, 1], keep the k
    smallest hashes per group, estimate distinct = (k-1)/u_(k).  The
    third distinct-count device beside the exact twin (k2) and HLL
    (k2_approx/mergeable), and the one whose ESTIMATE is itself
    engine-portable: the md5 hash family and the integer-domain
    estimator (k-1)*2^40 div h_(k) make every digit of the estimate
    reproducible, so the oracle pins the estimate VALUE, not just an
    error bound.  Sketches merge by unioning hash sets and re-taking
    the k smallest — same property HLL is prized for at 100 TB, with
    the bonus that KMV supports set intersection estimates.

    n_exact is the exact count of DISTINCT 40-BIT HASHES per group —
    the quantity KMV estimates — not a user-distinct count: hash
    collisions fold users together identically in both engines
    (~n²/2^41 collision probability at these cardinalities).

    Scale shape: one distinct shuffle on (group, hash), then the
    salted two-stage top-k (functions/topk.py — no skew funnel through
    ≤|groups| partitions), and a ≤|groups|-row exact-count join.
    Small groups (nd < k) fall back to the exact count, the standard
    KMV small-set rule."""
    ev = _events(spark, sf_dir)
    hashed = (
        ev.select(
            "event_type",
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 10),
                    16,
                    10,
                ).cast("long")
                + 1
            ).alias("h"),
        )
        .distinct()
    )
    from ..functions.topk import topk_per_group

    top = topk_per_group(
        hashed, ["event_type"], [F.asc("h")], k=_KMV_K, salt_col=F.col("h")
    )
    # Exact audit over the SAME hashed relation the sketch reads:
    # distinct 40-bit hashes, not distinct user ids — a hash collision
    # inside a group would otherwise make engine and oracle disagree
    # by 1 (and the hash space IS the estimator's true domain).
    exact = hashed.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    kth = top.groupBy("event_type").agg(
        F.max(F.when(F.col("rnk") == _KMV_K, F.col("h"))).alias("hk")
    )
    return (
        exact.join(F.broadcast(kth), "event_type")
        .select(
            "event_type",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.when(F.col("n_exact") < _KMV_K, F.col("n_exact"))
            .otherwise(
                F.expr(f"({_KMV_K - 1} * {_KMV_SCALE}) div hk")
            )
            .cast("long")
            .alias("kmv_est"),
        )
        .orderBy("event_type")
    )


@query(
    "kmv2_intersection_estimate",
    oracle=f"""
    WITH hashed AS (
        SELECT DISTINCT event_type,
               ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 10))
                   ::UBIGINT::BIGINT + 1 AS h
        FROM events
    ),
    sk AS (
        SELECT event_type, h FROM (
            SELECT event_type, h,
                   row_number() OVER (PARTITION BY event_type ORDER BY h)
                       AS rn
            FROM hashed
        ) WHERE rn <= {_KMV_K}
    ),
    pairs AS (
        SELECT a.event_type AS a_type, b.event_type AS b_type
        FROM (SELECT DISTINCT event_type FROM hashed) a
        JOIN (SELECT DISTINCT event_type FROM hashed) b
          ON a.event_type < b.event_type
    ),
    uni AS (
        SELECT p.a_type, p.b_type, s.h,
               row_number() OVER (PARTITION BY p.a_type, p.b_type
                                  ORDER BY s.h) AS rn
        FROM pairs p
        JOIN (SELECT DISTINCT event_type, h FROM sk) s
          ON s.event_type IN (p.a_type, p.b_type)
        GROUP BY p.a_type, p.b_type, s.h
    ),
    topu AS (SELECT * FROM uni WHERE rn <= {_KMV_K}),
    stats AS (
        SELECT t.a_type, t.b_type,
               max(CASE WHEN t.rn = {_KMV_K} THEN t.h END) AS hk,
               CAST(count(*) AS BIGINT) AS nu,
               CAST(SUM(CASE WHEN sa.h IS NOT NULL AND sb.h IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_both
        FROM topu t
        LEFT JOIN sk sa ON sa.event_type = t.a_type AND sa.h = t.h
        LEFT JOIN sk sb ON sb.event_type = t.b_type AND sb.h = t.h
        GROUP BY t.a_type, t.b_type
    ),
    exact AS (
        SELECT a.event_type AS a_type, b.event_type AS b_type,
               CAST(count(*) AS BIGINT) AS n_inter_exact
        FROM (SELECT DISTINCT event_type, user_id FROM events) a
        JOIN (SELECT DISTINCT event_type, user_id FROM events) b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT e.a_type, e.b_type, e.n_inter_exact,
           CAST(CASE WHEN s.nu < {_KMV_K} THEN s.n_both
                ELSE (s.n_both * (({_KMV_K - 1} * {_KMV_SCALE}) // s.hk))
                     // {_KMV_K}
           END AS BIGINT) AS kmv_inter_est
    FROM exact e JOIN stats s USING (a_type, b_type)
    ORDER BY a_type, b_type
    """,
)
def kmv2_intersection_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set-INTERSECTION estimation (the theta-sketch a-priori
    trick, Beyer et al. 2007): for each event-type pair, merge the two
    KMV sketches, re-take the k smallest, and scale the fraction of
    union-sketch hashes present in BOTH sketches by the union estimate
    — |A∩B| ≈ (n_both/k)·est(|A∪B|).  THE capability that separates
    KMV from HLL: sketches of k hashes answer arbitrary pairwise
    overlap questions without rescanning raw data.  Portable md5 hash
    family + integer-domain arithmetic (the kmv1 device, with the
    scale factor computed integer-first) keep every digit of the
    estimate oracle-pinned; pairs whose union fits inside one sketch
    fall back to the exact overlap count.

    Scale shape: sketches are ≤ |groups|·k rows — tiny, broadcast
    everywhere after ONE distinct shuffle + salted top-k over raw
    data; the pair stage touches only sketch rows.  (The exact
    intersection column exists for the oracle/accuracy audit; a
    production run drops it and with it the raw-data self-join.)"""
    ev = _events(spark, sf_dir)
    hashed = (
        ev.select(
            "event_type",
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 10),
                    16,
                    10,
                ).cast("long")
                + 1
            ).alias("h"),
        )
        .distinct()
    )
    from ..functions.topk import topk_per_group

    sk = topk_per_group(
        hashed, ["event_type"], [F.asc("h")], k=_KMV_K, salt_col=F.col("h")
    ).select("event_type", "h")
    types = hashed.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("a_type"))
        .crossJoin(types.select(F.col("event_type").alias("b_type")))
        .where(F.col("a_type") < F.col("b_type"))
    )
    uni = (
        F.broadcast(pairs)
        .join(
            sk.select("event_type", "h"),
            F.col("event_type").isin(F.col("a_type"), F.col("b_type")),
        )
        .select("a_type", "b_type", "h")
        .distinct()
    )
    from pyspark.sql import Window

    wu = Window.partitionBy("a_type", "b_type").orderBy("h")
    topu = (
        uni.withColumn("rn", F.row_number().over(wu))
        .where(F.col("rn") <= _KMV_K)
    )
    sa = sk.select(F.col("event_type").alias("a_type"), "h", F.lit(1).alias("_a"))
    sb = sk.select(F.col("event_type").alias("b_type"), "h", F.lit(1).alias("_b"))
    stats = (
        topu.join(F.broadcast(sa), ["a_type", "h"], "left")
        .join(F.broadcast(sb), ["b_type", "h"], "left")
        .groupBy("a_type", "b_type")
        .agg(
            F.max(F.when(F.col("rn") == _KMV_K, F.col("h"))).alias("hk"),
            F.count("*").alias("nu"),
            F.sum(
                (F.col("_a").isNotNull() & F.col("_b").isNotNull()).cast("long")
            ).alias("n_both"),
        )
    )
    dtypes = ev.select("event_type", "user_id").distinct()
    ea = dtypes.select(F.col("event_type").alias("a_type"), "user_id")
    eb = dtypes.select(F.col("event_type").alias("b_type"), "user_id")
    exact = (
        ea.join(eb, "user_id")
        .where(F.col("a_type") < F.col("b_type"))
        .groupBy("a_type", "b_type")
        .agg(F.count("*").cast("long").alias("n_inter_exact"))
    )
    est = F.when(F.col("nu") < _KMV_K, F.col("n_both")).otherwise(
        F.expr(
            f"(n_both * (({_KMV_K - 1} * {_KMV_SCALE}) div hk)) div {_KMV_K}"
        )
    )
    return (
        exact.join(F.broadcast(stats), ["a_type", "b_type"])
        .select(
            "a_type",
            "b_type",
            "n_inter_exact",
            est.cast("long").alias("kmv_inter_est"),
        )
        .orderBy("a_type", "b_type")
    )


# --- CMS ranking variant (round 11) -------------------------------------------
#
# k8 above reports the CMS keys clearing a SUPPORT threshold (the
# stream-summary contract).  cms1 is the RANKING form of the same
# sketch: probe every distinct user against the grid and rank the
# top-20 by estimate, with the per-key overcount (est - true, provably
# >= 0) as an explicit audit column — the "who are my heaviest keys
# and how wrong is the sketch about each" dashboard question, vs k8's
# "which keys clear s% of the stream".  Distinct hash family on
# purpose (kmv1's md5-prefix integers vs k8's ascii-digit mix) so the
# two queries also cross-check two portable CMS hash constructions.

_CMS1_D = 4
_CMS1_W = 1024


def _cms1_bucket_sql(j: str, key: str) -> str:
    """Portable row-j bucket: first 8 md5 hex digits of 'j:key' mod w
    (the kmv1 hash family — identical integers in Spark and DuckDB)."""
    return (
        f"CAST(conv(substring(md5(concat(CAST({j} AS STRING), ':', "
        f"CAST({key} AS STRING))), 1, 8), 16, 10) AS BIGINT) % {_CMS1_W}"
    )


@query(
    "cms1_heavy_hitters",
    oracle=f"""
    WITH js AS (SELECT unnest([0, 1, 2, 3]) AS j),
    cnt AS MATERIALIZED (
        SELECT j,
               ('0x' || substr(md5(CAST(j AS VARCHAR) || ':'
                    || CAST(user_id AS VARCHAR)), 1, 8))
                   ::UBIGINT::BIGINT % {_CMS1_W} AS bucket,
               CAST(count(*) AS BIGINT) AS c
        FROM events CROSS JOIN js
        GROUP BY 1, 2
    ),
    tru AS (
        SELECT user_id, CAST(count(*) AS BIGINT) AS true_count
        FROM events GROUP BY user_id
    ),
    est AS (
        SELECT t.user_id, CAST(min(c.c) AS BIGINT) AS est_count
        FROM tru t
        CROSS JOIN js
        JOIN cnt c ON c.j = js.j
         AND c.bucket = ('0x' || substr(md5(CAST(js.j AS VARCHAR) || ':'
                 || CAST(t.user_id AS VARCHAR)), 1, 8))
                 ::UBIGINT::BIGINT % {_CMS1_W}
        GROUP BY t.user_id
    )
    SELECT e.user_id, e.est_count, t.true_count,
           e.est_count - t.true_count AS overcount
    FROM est e JOIN tru t USING (user_id)
    ORDER BY e.est_count DESC, e.user_id
    LIMIT 20
    """,
)
def cms1_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch TOP-K ranking (Cormode & Muthukrishnan 2005) —
    the ranking complement of k8 above: k8 answers "which keys clear
    s% of the stream" (the threshold contract); cms1 builds a {d}x{w}
    grid over per-event user updates and RANKS the top-20 users by
    min-of-{d} estimate, with each key's overcount (est - true,
    provably >= 0) as an explicit audit column — and deliberately uses
    a different portable hash family (kmv1's md5-prefix integers vs
    k8's ascii-digit mix), so the two queries cross-check two CMS hash
    constructions end to end.  The sketch is {d}*{w} counters
    REGARDLESS of user cardinality, mergeable by plain addition
    (counters are linear — the roll1 additive-rollup property, so
    per-partition or per-day sketches sum into the global one), and
    its error is one-sided: est >= true always, est <= true + eps*N
    with probability 1-delta (eps = e/w, delta = e^-d).

    Determinism: the hash family is the kmv1 md5-prefix device — row
    j's bucket for key u is the first 8 md5 hex digits of "j:u" mod
    {w}, identical integers in both engines — and every counter is an
    exact BIGINT count, so the oracle replays the grid, the min-of-{d}
    estimates, and the top-20 bit for bit (ties fall to user_id).

    Scale shape: ONE partial-aggregated count shuffle touches the fact
    table; everything after is model-sized.  Counter linearity lets
    the grid absorb the pre-aggregated (user, count) rows — cell =
    sum of counts of the users hashing there, identical integers to
    per-event updates — so the 4 md5s run per USER, not per event
    (the round-11 stress run measured the per-event form at 7.8
    us/event, pure map-side hashing; the weighted form cut the x10
    wall 7.76 -> 1.18 s and the exponent 0.85 -> flat (-0.11)).  The
    probe side joins the same hashed key table against the BROADCAST
    grid (49 KiB of counters at any corpus size); the top-20 is a
    TakeOrderedAndProject."""
    ev = _events(spark, sf_dir).select("user_id")
    js = F.array(*[F.lit(j) for j in range(_CMS1_D)])
    tru = (
        ev.groupBy("user_id")
        .agg(F.count("*").cast("long").alias("true_count"))
        # Three consumers (grid build + probe rows + the final join):
        # one scan, one partial-aggregated shuffle.
        .localCheckpoint(eager=False)
    )
    # Counter LINEARITY is what makes this cheap: the grid absorbs the
    # pre-aggregated (user, count) rows instead of one update per
    # event, so the md5 hashing runs 4x|users| times, not 4x|events| —
    # the round-11 stress run measured the per-event form at 7.8 us/
    # event (exponent 0.85, pure map-side hashing CPU); this weighted
    # form does the identical integer arithmetic (grid cell = sum of
    # counts of the users hashing there) at model-sized cost after the
    # one count shuffle.
    keyed = tru.select(
        "user_id", "true_count", F.explode(js).alias("j")
    ).select(
        "user_id",
        "true_count",
        "j",
        F.expr(_cms1_bucket_sql("j", "user_id")).alias("bucket"),
    ).localCheckpoint(eager=False)
    counters = (
        keyed.groupBy("j", "bucket")
        .agg(F.sum("true_count").cast("long").alias("c"))
    )
    probes = keyed.select("user_id", "j", "bucket")
    est = (
        probes.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy("user_id")
        .agg(F.min("c").cast("long").alias("est_count"))
    )
    return (
        est.join(tru, "user_id")
        .select(
            "user_id",
            "est_count",
            "true_count",
            (F.col("est_count") - F.col("true_count")).alias("overcount"),
        )
        .orderBy(F.desc("est_count"), "user_id")
        .limit(20)
    )


cms1_heavy_hitters.__doc__ = cms1_heavy_hitters.__doc__.format(
    d=_CMS1_D, w=_CMS1_W
)
