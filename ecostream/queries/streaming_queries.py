"""Declared streaming queries (SURVEY §2.10 T1/T2/T6).

These run a REAL Structured Streaming job inside the declared-query
contract: file-stream source over the same events parquet → watermark →
event-time windowed aggregation → memory sink, drained with
``processAllAvailable``.  Because a bounded stream drained to complete
output equals the batch computation over the same data (the
stream-batch equivalence property the Structured Streaming paper is
built on — PAPERS.md), the result is deterministic and oracle-checkable
with plain SQL: DuckDB sees the batch twin.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import events_stream
from .registry import query


@query(
    "st1_stream_tumbling_counts",
    oracle="""
    SELECT epoch_us(date_trunc('day', ts)) AS day_us,
           event_type, count(*) AS cnt
    FROM events GROUP BY 1, 2
    """,
)
def st1_stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest of the events table (file source, explicit
    schema — no inference in streaming) with a 1-hour watermark (the
    reference's late-data cutoff, consumer.py:82-83) and daily tumbling
    counts per event_type, drained to a complete-mode memory sink.

    Complete mode retains all windows, so draining the bounded stream
    yields exactly the batch answer — the equivalence the oracle
    checks.  At scale this same plan runs unbounded: the watermark
    bounds state, and partial aggregation happens per micro-batch."""
    # File-stream source over the shared sf_dir (pathGlobFilter narrows
    # the listing to the events table); ts normalized as in load_table.
    stream = events_stream(spark, sf_dir)
    counts = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_micros(F.col("w.start")).alias("day_us"),
            "event_type",
            "cnt",
        )
    )
    name = f"st1_{uuid.uuid4().hex[:12]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)


@query(
    "st2_stateful_running_counts",
    oracle="""
    SELECT event_type, count(*) AS n FROM events GROUP BY event_type
    """,
)
def st2_stateful_running_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom stateful operator (T5, ``applyInPandasWithState``
    running sketch — the Spark re-spec of the reference's hand-rolled
    ``InsectDataStore`` keyed state) executed as a real stream and
    reduced to its final per-key state.

    Update mode emits each key's cumulative state every micro-batch;
    the final state's count must equal the batch group-count — that
    deterministic slice is what the oracle checks (the float total and
    MinHash signature state are covered by the stream-batch equivalence
    test, which compares them against the batch twin).  State stays
    O(num_perm) per key no matter how long the stream runs — the
    property that replaces the reference's unbounded dict growth."""
    from ..streaming.stateful import running_sketch

    stream = events_stream(spark, sf_dir)
    sketched = running_sketch(stream.select("event_type", "user_id", "value"))
    name = f"st2_{uuid.uuid4().hex[:12]}"
    q = (
        sketched.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table(name)
        .groupBy("event_type")
        .agg(F.max("n").alias("n"))
    )


@query(
    "st3_stream_sliding_counts",
    oracle="""
    SELECT epoch_us(date_trunc('day', ts) - (i * INTERVAL '1 day')) AS win_us,
           event_type, count(*) AS cnt
    FROM events, (SELECT unnest([0, 1]) AS i)
    GROUP BY 1, 2
    """,
)
def st3_stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows on a real stream: 2-day windows
    sliding by 1 day, so every event lands in exactly two windows (the
    reference's overlapping 1/5/15/60-min counters, consumer.py:86-110,
    are this shape).  The oracle unrolls the slide arithmetic: the two
    windows containing ts start at day(ts) and day(ts)−1 — Spark's
    epoch-aligned window() produces exactly those starts.  Complete-mode
    drain of the bounded stream equals the batch answer; unbounded, the
    watermark caps how many open windows each key holds."""
    stream = events_stream(spark, sf_dir)
    counts = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 days", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_micros(F.col("w.start")).alias("win_us"),
            "event_type",
            "cnt",
        )
    )
    name = f"st3_{uuid.uuid4().hex[:12]}"
    q = (
        counts.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.table(name)
