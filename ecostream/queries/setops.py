"""Set operations, multi-dimensional aggregation, and as-of join.

The reference's only set op is Python-set dedup (SURVEY §2.6, reference
consumer.py:195-198); union/intersect/except and rollup/cube/grouping
sets come free with Spark and are declared here for oracle coverage
(SURVEY §2.3 "engine gets them free — include a couple").  The as-of
join is the §2.4 optional interval-join capability, expressed with a
RANGE window frame so both engines share exact tie semantics — no
range-join row explosion, one shuffle on the join key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schema import load_table
from .registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- U1-U3: union / intersect / except ------------------------------------


@query(
    "u1_union_distinct",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'error'
    UNION
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def u1_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users that ever errored or purchased — union-distinct is
    one hash-agg over the concatenated scans (both filters pushed)."""
    ev = _events(spark, sf_dir)
    err = ev.where(F.col("event_type") == "error").select("user_id")
    pur = ev.where(F.col("event_type") == "purchase").select("user_id")
    return err.union(pur).distinct()


@query(
    "u2_intersect",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'error'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def u2_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users that both errored AND purchased (INTERSECT ≙ the semi-join
    shape Catalyst plans it as)."""
    ev = _events(spark, sf_dir)
    err = ev.where(F.col("event_type") == "error").select("user_id")
    pur = ev.where(F.col("event_type") == "purchase").select("user_id")
    return err.intersect(pur)


@query(
    "u3_except",
    oracle="""
    SELECT user_id FROM events WHERE event_type = 'error'
    EXCEPT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def u3_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users that errored but never purchased (EXCEPT ≙ left-anti;
    ``subtract`` is set-semantics EXCEPT DISTINCT, unlike ``exceptAll``
    which would keep a user whose error count exceeds their purchases)."""
    ev = _events(spark, sf_dir)
    err = ev.where(F.col("event_type") == "error").select("user_id")
    pur = ev.where(F.col("event_type") == "purchase").select("user_id")
    return err.subtract(pur)


# --- R1/R2: rollup & cube ---------------------------------------------------


@query(
    "r1_rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
           count(*) AS cnt
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def r1_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals over lineitem: (flag, status), (flag), ().
    One scan; Spark expands the rollup into grouping sets inside a single
    aggregate (Expand + partial agg), not one scan per level."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(20,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.count("*").alias("cnt"),
    )


@query(
    "r2_cube_counts",
    oracle="""
    SELECT event_type, CAST(user_id % 4 AS BIGINT) AS user_mod4, count(*) AS cnt
    FROM events
    GROUP BY CUBE (event_type, user_id % 4)
    """,
)
def r2_cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 4 grouping combinations of (event_type, user bucket) in one
    scan — the reference's 4-independent-group-bys pattern (A2)
    generalized to the full lattice."""
    ev = _events(spark, sf_dir).select(
        "event_type", (F.col("user_id") % 4).alias("user_mod4")
    )
    return ev.cube("event_type", "user_mod4").agg(F.count("*").alias("cnt"))


# --- AJ1: as-of join ---------------------------------------------------------


@query(
    "aj1_asof_last_view",
    oracle="""
    WITH tagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN event_type = 'view' THEN ts END AS view_ts
        FROM events
        WHERE event_type IN ('view', 'purchase')
    ), framed AS (
        SELECT user_id, ts, event_id, event_type,
               max(view_ts) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS last_view_ts
        FROM tagged
    )
    SELECT event_id, user_id, ts AS purchase_ts, last_view_ts
    FROM framed WHERE event_type = 'purchase'
    """,
)
def aj1_asof_last_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every purchase, the user's most recent view at or
    before it.  Expressed as a RANGE-framed running max over the union of
    both streams — one shuffle on user_id, no per-row range probe, and
    the RANGE frame (value-based, not row-based) pins the tie rule
    "views at the same timestamp count" identically in both engines.
    This is the scale shape: an as-of join of two 100 TB streams stays
    a single sort-merge pass per key."""
    ev = _events(spark, sf_dir)
    tagged = ev.where(F.col("event_type").isin("view", "purchase")).select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.when(F.col("event_type") == "view", F.col("ts")).alias("view_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    framed = tagged.withColumn("last_view_ts", F.max("view_ts").over(w))
    return framed.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "last_view_ts",
    )


# --- U4/U5: multiset (ALL) variants -----------------------------------------


@query(
    "u4_intersect_all",
    oracle="""
    SELECT cnt FROM (
        SELECT user_id, count(*) AS cnt FROM (
            SELECT user_id FROM events WHERE event_type = 'error'
            INTERSECT ALL
            SELECT user_id FROM events WHERE event_type = 'purchase'
        ) GROUP BY user_id
    )
    """,
)
def u4_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics: each user survives
    min(#errors, #purchases) times (bag intersection), summarized as
    the per-user multiplicity so the oracle hash ignores row identity."""
    ev = _events(spark, sf_dir)
    err = ev.where(F.col("event_type") == "error").select("user_id")
    pur = ev.where(F.col("event_type") == "purchase").select("user_id")
    return (
        err.intersectAll(pur)
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .select("cnt")
    )


@query(
    "u5_except_all",
    oracle="""
    SELECT cnt FROM (
        SELECT user_id, count(*) AS cnt FROM (
            SELECT user_id FROM events WHERE event_type = 'error'
            EXCEPT ALL
            SELECT user_id FROM events WHERE event_type = 'purchase'
        ) GROUP BY user_id
    )
    """,
)
def u5_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — bag difference: a user keeps
    max(#errors − #purchases, 0) rows."""
    ev = _events(spark, sf_dir)
    err = ev.where(F.col("event_type") == "error").select("user_id")
    pur = ev.where(F.col("event_type") == "purchase").select("user_id")
    return (
        err.exceptAll(pur)
        .groupBy("user_id")
        .agg(F.count("*").alias("cnt"))
        .select("cnt")
    )


# --- N1: null semantics (absent from the reference entirely) -----------------


@query(
    "n1_null_semantics",
    oracle="""
    WITH e AS (
        SELECT nullif(event_type, 'error') AS et, user_id, value FROM events
    )
    SELECT COALESCE(et, '<null>') AS et_g,
           count(*) AS n_rows,
           count(et) AS n_nonnull_keys,
           count(value) AS n_values,
           CAST(SUM(CASE WHEN et IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_keys
    FROM e GROUP BY et
    """,
)
def n1_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL null semantics end-to-end: nulls form their own group,
    count(*) vs count(col) differ, and the null group is made hashable
    via COALESCE.  The reference has no null handling at all (absent
    dict keys raise, SURVEY §2.2) — this pins the engine's ANSI
    behavior so it can't silently regress."""
    ev = _events(spark, sf_dir)
    e = ev.select(
        F.nullif("event_type", F.lit("error")).alias("et"), "user_id", "value"
    )
    return (
        e.groupBy("et")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("et").alias("n_nonnull_keys"),
            F.count("value").alias("n_values"),
            F.sum(F.when(F.col("et").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_null_keys"),
        )
        .select(
            F.coalesce("et", F.lit("<null>")).alias("et_g"),
            "n_rows",
            "n_nonnull_keys",
            "n_values",
            "n_null_keys",
        )
    )


# --- P1: unpivot / melt (reshape family; pivot lives in m3) ------------------


@query(
    "p1_unpivot_measures",
    oracle="""
    WITH agg AS (
        SELECT l_returnflag,
               ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_qty,
               ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_price,
               ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE), 6) AS sum_disc
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, val
    FROM agg UNPIVOT (val FOR measure IN (sum_qty, sum_price, sum_disc))
    """,
)
def p1_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-flag measure columns reshaped to long
    (measure, val) rows — the inverse of m3's pivot, completing the
    reshape family.  The unpivot is a zero-shuffle Expand over the
    already-aggregated rows."""
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum(dec("l_quantity")).cast("double"), 6).alias("sum_qty"),
        F.round(F.sum(dec("l_extendedprice")).cast("double"), 6).alias("sum_price"),
        F.round(F.sum(dec("l_discount")).cast("double"), 6).alias("sum_disc"),
    )
    return agg.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price", "sum_disc"],
        variableColumnName="measure",
        valueColumnName="val",
    )
