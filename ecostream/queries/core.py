"""Core relational operators: scans, filters, projections, point lookups,
group-counts, word-count, top-k (SURVEY §2.2 F1-F6, §2.3 A1/A2/A6, §2.5).

Reference parity notes
----------------------
The reference serves these via 7 single-attribute hash indexes over an
in-memory dict store (reference consumer.py:23-29,66-72); in Spark the
indexes disappear — Catalyst pushes the equality predicates into the
parquet scan (PushedFilters) and prunes columns, which is the same
access-path optimization done declaratively.  The reference's
insertion-order limits (consumer.py:175,186-187) become explicit
``ORDER BY ts, event_id LIMIT n`` for determinism (SURVEY §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import load_table
from .registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


# --- F1: point lookup by id (reference consumer.py:218-220) ---------------


@query(
    "f1_point_lookup",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_id = 42
    """,
)
def f1_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O(1) id fetch ≙ ``insects_by_id[id]``; equality predicate pushed to
    the parquet scan (row-group min/max + dictionary pruning at scale)."""
    return (
        _events(spark, sf_dir)
        .where(F.col("event_id") == 42)
        .select("event_id", "user_id", "event_type", "value")
    )


# --- F2: filter by category + limit (reference consumer.py:170-176) -------


@query(
    "f2_filter_by_type_limit",
    oracle="""
    SELECT event_id, user_id, event_type, value
    FROM events WHERE event_type = 'error'
    ORDER BY ts, event_id LIMIT 10
    """,
)
def f2_filter_by_type_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-n events of one category.  The reference returns dict
    insertion order (arrival order); we impose arrival order explicitly
    via ``ORDER BY ts, event_id`` so the limit is deterministic."""
    ev = _events(spark, sf_dir)
    return (
        ev.where(F.col("event_type") == "error")
        .orderBy("ts", "event_id")
        .select("event_id", "user_id", "event_type", "value")
        .limit(10)
    )


# --- F3: conjunctive filter + limit (reference consumer.py:178-188) -------


@query(
    "f3_conjunctive_filter",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(props ->> '$.k' AS INT) AS k
    FROM events
    WHERE event_type = 'purchase' AND CAST(props ->> '$.k' AS INT) > 50
    ORDER BY ts, event_id LIMIT 20
    """,
)
def f3_conjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """habitat ∧ event conjunctive probe ≙ index probe + residual predicate;
    both predicates fold into one scan filter under Catalyst.  The JSON
    ``props`` column plays the reference's nested-document role (X12)."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int").alias("k")
    return (
        ev.select("event_id", "user_id", "event_type", "ts", k)
        .where((F.col("event_type") == "purchase") & (F.col("k") > 50))
        .orderBy("ts", "event_id")
        .drop("ts")
        .limit(20)
    )


# --- F4: projection view (reference consumer.py:222-237) ------------------


@query(
    "f4_projection",
    oracle="""
    SELECT event_id, value, CAST(props ->> '$.k' AS INT) AS density,
           event_type, epoch_us(ts) AS ts_us
    FROM events
    ORDER BY ts, event_id LIMIT 25
    """,
)
def f4_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned view (id, impact, density, species, eventTime analog).
    Only the referenced columns reach the scan (ReadSchema pruning)."""
    ev = _events(spark, sf_dir)
    return (
        ev.orderBy("ts", "event_id")
        .select(
            "event_id",
            "value",
            F.get_json_object("props", "$.k").cast("int").alias("density"),
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
        )
        .limit(25)
    )


# --- F5: relative time-range filter (reference consumer.py:207-216) -------


@query(
    "f5_recent_events",
    oracle="""
    SELECT event_type, count(*) AS cnt
    FROM events
    WHERE ts >= (SELECT max(ts) FROM events) - INTERVAL 24 HOURS
    GROUP BY event_type
    """,
)
def f5_recent_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """"Recent events" lookback.  The reference compares to wall-clock
    ``now``; for determinism "now" is parameterized as max(ts) in the
    data (SURVEY §5 rule 2).  The max is a broadcast scalar, so the
    filter still pushes down to the scan of the big side."""
    ev = _events(spark, sf_dir)
    mx = ev.agg(F.max("ts").alias("now_ts"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .where(F.col("ts") >= F.col("now_ts") - F.expr("INTERVAL 24 HOURS"))
        .groupBy("event_type")
        .agg(F.count("*").alias("cnt"))
    )


# --- A1: global count (reference consumer.py:155) --------------------------


@query(
    "a1_total_count",
    oracle="SELECT count(*) AS total_events FROM events",
)
def a1_total_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``len(insects_by_id)`` → count(*); partial counts per partition,
    one-row final combine (no data shuffle beyond counts)."""
    return _events(spark, sf_dir).agg(F.count("*").alias("total_events"))


# --- A2: group-counts across 4 dimensions (reference consumer.py:156-159) --


@query(
    "a2_group_counts",
    oracle="""
    SELECT 'event_type' AS dim, event_type AS val, count(*) AS cnt
      FROM events GROUP BY event_type
    UNION ALL
    SELECT 'user_mod4' AS dim, CAST(user_id % 4 AS VARCHAR) AS val, count(*) AS cnt
      FROM events GROUP BY user_id % 4
    UNION ALL
    SELECT 'k_bucket' AS dim, CAST(CAST(props ->> '$.k' AS INT) // 25 AS VARCHAR) AS val,
           count(*) AS cnt
      FROM events GROUP BY CAST(props ->> '$.k' AS INT) // 25
    UNION ALL
    SELECT 'day' AS dim, strftime(ts, '%Y-%m-%d') AS val, count(*) AS cnt
      FROM events GROUP BY strftime(ts, '%Y-%m-%d')
    """,
)
def a2_group_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's stats screen: 4 independent single-column
    group-counts (species/role/habitat/event analogs, consumer.py:156-159).
    Computed in ONE scan: each row emits its 4 (dim, val) pairs via
    explode, then a single groupBy — identical output to 4 unioned
    groupBys but 1/4 the table IO and one shuffle (the pairs are
    map-side-combined to ≤ 4·|dim domain| rows before exchange)."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("int")
    pairs = F.array(
        F.struct(F.lit("event_type").alias("dim"), F.col("event_type").alias("val")),
        F.struct(
            F.lit("user_mod4").alias("dim"),
            (F.col("user_id") % 4).cast("string").alias("val"),
        ),
        F.struct(
            F.lit("k_bucket").alias("dim"),
            F.floor(k / 25).cast("string").alias("val"),
        ),
        F.struct(
            F.lit("day").alias("dim"),
            F.date_format("ts", "yyyy-MM-dd").alias("val"),
        ),
    )
    return (
        ev.select(F.explode(pairs).alias("p"))
        .select("p.dim", "p.val")
        .groupBy("dim", "val")
        .agg(F.count("*").alias("cnt"))
    )


# --- A6: MapReduce word-count with combiner (reference mapreduce.py:7-96) --


@query(
    "a6_mapreduce_wordcount",
    oracle="""
    SELECT key, count(*) AS cnt FROM (
        SELECT 'event_type:' || event_type AS key FROM events
        UNION ALL
        SELECT 'user:' || CAST(user_id % 10 AS VARCHAR) AS key FROM events
        UNION ALL
        SELECT 'k:' || (props ->> '$.k') AS key FROM events
    ) GROUP BY key
    """,
)
def a6_mapreduce_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's hand-rolled multiprocessing MapReduce (map 7-15,
    combine 17-21, shuffle-by-queues 59-94) is exactly
    explode → groupBy → count: Spark's partial aggregation
    (HashAggregateExec partial → exchange → final) IS the map-side
    combiner, and ShuffleExchangeExec is the queue shuffle."""
    ev = _events(spark, sf_dir)
    keys = F.array(
        F.concat(F.lit("event_type:"), F.col("event_type")),
        F.concat(F.lit("user:"), (F.col("user_id") % 10).cast("string")),
        F.concat(F.lit("k:"), F.get_json_object("props", "$.k")),
    )
    return (
        ev.select(F.explode(keys).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("cnt"))
    )


# --- A6 at document scale: token word-count ---------------------------------


@query(
    "a6_doc_wordcount_topk",
    oracle="""
    SELECT word, count(*) AS cnt FROM (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ) GROUP BY word
    ORDER BY cnt DESC, word LIMIT 50
    """,
)
def a6_doc_wordcount_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-count over the documents table (the 100-TB-shaped variant of
    A6): tokenize → explode → count → top-k.  Top-k is a TakeOrdered,
    not a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "word")
        .limit(50)
    )


# --- O2: top-k by measure (reference consultas.py:316) ----------------------


@query(
    "o2_topk_users_by_value",
    oracle="""
    SELECT user_id,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 6) AS total_value,
           count(*) AS cnt
    FROM events GROUP BY user_id
    ORDER BY total_value DESC, user_id LIMIT 10
    """,
)
def o2_topk_users_by_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k entities by an exact DECIMAL-summed measure.  The DECIMAL
    cast makes the sum order-independent (hash-stable vs the oracle);
    the final cast back to DOUBLE keeps the output schema portable."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 6
            ).alias("total_value"),
            F.count("*").alias("cnt"),
        )
        .orderBy(F.desc("total_value"), "user_id")
        .limit(10)
    )


# --- F6: full snapshot (reference consumer.py:218-220,320-325) -------------


@query(
    "f6_full_snapshot",
    oracle="""
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
           ROUND(CAST(value AS DOUBLE), 6) AS value, props
    FROM events
    """,
)
def f6_full_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's whole-store snapshot (feeds MapReduce & Markov,
    consumer.py:320-325) — in Spark simply the table itself.  Declared
    over every column so the oracle hash certifies byte-level scan
    fidelity (timestamps as epoch-µs for a stable cross-engine hash)."""
    ev = _events(spark, sf_dir)
    return ev.select(
        "event_id",
        "user_id",
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.round(F.col("value").cast("double"), 6).alias("value"),
        "props",
    )


# --- O1: global sort by event time (reference transition_matrix.py:36) -----


@query(
    "o1_sort_by_event_time",
    oracle="""
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us
    FROM events ORDER BY ts, event_id LIMIT 500
    """,
)
def o1_sort_by_event_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global time ordering (``entries.sort()``).  With a LIMIT Spark
    runs TakeOrderedAndProject — a per-partition top-k then a driver
    merge, never a full global sort shuffle; the unbounded variant is
    a range-partitioned sort (still scale-safe, one skew-aware
    exchange)."""
    ev = _events(spark, sf_dir)
    return (
        ev.orderBy("ts", "event_id")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros("ts").alias("ts_us"),
        )
        .limit(500)
    )


# --- SQL1: one ANSI text, two engines ----------------------------------------

# The ANSI-shared subset: DECIMAL-exact arithmetic, no dialect
# functions.  {table} is the only substitution.
_SQL1_TEXT = """
    SELECT l_returnflag, l_linestatus,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2))))
                      AS DOUBLE), 2) AS revenue
    FROM {table}
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
"""


@query("sql1_shared_text_pricing", oracle=_SQL1_TEXT.format(table="lineitem"))
def sql1_shared_text_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface portability pin: the IDENTICAL query text runs
    through ``spark.sql`` here and through DuckDB as its own oracle —
    no DataFrame translation layer in between (rc1 does the same for
    recursive CTEs; this is the plain-aggregate counterpart).  Sticking
    to the ANSI-shared subset (DECIMAL-exact arithmetic, one trailing
    ROUND) is what makes a query text portable across engines — the
    property a user migrating TO this engine relies on.  Catalyst plans
    it exactly like the DataFrame twin (j1): scan → partial → final
    hash aggregate, one exchange on the two grouping keys."""
    lineitem = load_table(spark, sf_dir, "lineitem")
    lineitem.createOrReplaceTempView("sql1_lineitem")
    return spark.sql(_SQL1_TEXT.format(table="sql1_lineitem"))
