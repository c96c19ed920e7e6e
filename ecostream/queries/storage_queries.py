"""Declared queries for the storage layer (SURVEY §2.1 S6, write side).

The reference has no file I/O at all (SURVEY S6: Kafka in, stdout out);
the engine's batch substrate is parquet, and its write-side operators —
small-file compaction and clustering re-layout (ecostream/storage.py) —
were previously pytest-only.  These queries put the write path under
the driver's oracle gate: each rewrites a table into a new physical
layout, reads the result back, and aggregates — the oracle runs the
same aggregate over the ORIGINAL table, so any row lost, duplicated, or
mutated by the re-layout fails the hash (row identity across layouts).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import load_table
from .registry import query

_AGG_ORACLE = """
SELECT event_type, count(*) AS n,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2)
           AS total_value,
       CAST(MIN(user_id) AS BIGINT) AS min_user,
       CAST(MAX(user_id) AS BIGINT) AS max_user
FROM events
GROUP BY event_type
"""


def _agg(df: DataFrame) -> DataFrame:
    return df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double"), 2
        ).alias("total_value"),
        F.min("user_id").cast("long").alias("min_user"),
        F.max("user_id").cast("long").alias("max_user"),
    )


def _workdir(name: str) -> str:
    """Stable per-process scratch dir (overwritten each run, so repeated
    driver invocations don't accumulate tmp garbage)."""
    return os.path.join(tempfile.gettempdir(), f"ecostream_{name}")


@query("s6_compact_roundtrip", oracle=_AGG_ORACLE)
def s6_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 write side: fragment the events table into many small files
    (the pathological post-streaming-ingest layout), compact with
    ``storage.compact`` — coalesce path, NO shuffle — and aggregate the
    compacted copy.  Oracle = same aggregate over the original table:
    compaction must be row-identical.

    Scale note: coalesce-based compaction concatenates whole input
    partitions per output task — cost is one linear rewrite with no
    exchange, which is why it's the default maintenance pass for a
    100 TB lake's small-file problem."""
    from ..storage import compact

    ev = load_table(spark, sf_dir, "events")
    frag = _workdir("s6_frag")
    ev.repartition(16).write.mode("overwrite").parquet(frag)
    compacted = _workdir("s6_compacted")
    compact(spark, frag, compacted, target_file_bytes=256 * 1024 * 1024)
    return _agg(spark.read.parquet(compacted))


@query("s6_cluster_roundtrip", oracle=_AGG_ORACLE)
def s6_cluster_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 write side, clustering path: re-layout the events table with
    ``repartitionByRange(user_id) + sortWithinPartitions`` (one range
    shuffle that restores min/max-stat selectivity on the cluster key)
    and aggregate the clustered copy — row identity per the oracle.
    tests/test_storage.py separately asserts the layout property (file
    ranges narrow); here the driver checks the data survived."""
    from ..storage import compact

    ev = load_table(spark, sf_dir, "events")
    frag = _workdir("s6c_frag")
    ev.repartition(16).write.mode("overwrite").parquet(frag)
    clustered = _workdir("s6c_clustered")
    compact(
        spark,
        frag,
        clustered,
        target_file_bytes=64 * 1024 * 1024,
        cluster_cols=["user_id"],
    )
    return _agg(spark.read.parquet(clustered))
