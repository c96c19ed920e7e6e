"""Storage-layout operators: the write-side half of the 100 TB design.

The reference keeps everything in one in-memory dict (consumer.py:21-29)
— at scale the equivalent leverage comes from how data lands on disk:

- ``write_partitioned``: hive-style partition directories on a
  low-cardinality column (e.g. event day / event_type) so equality and
  range predicates prune whole directories before any IO
  (PartitionFilters in the scan), plus optional
  ``sortWithinPartitions`` clustering so row-group min/max statistics
  prune within files.
- ``write_bucketed``: pre-shuffled bucket layout on a join/agg key; two
  tables bucketed the same way join with ZERO exchanges — the physical
  realization of "co-locate joins via bucketing" for repeated
  fact-fact joins.

Both are thin wrappers over the DataFrameWriter — the point is the
declared contract (and the plan tests in tests/test_storage.py that
prove pruning/shuffle-elision actually happens), not abstraction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    cluster_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Partition-pruned parquet layout; ``cluster_cols`` sorts within
    partitions so min/max row-group stats stay selective."""
    out = df
    if cluster_cols:
        out = out.sortWithinPartitions(*cluster_cols)
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) table in the session catalog.
    Joins/aggregations on ``bucket_cols`` between tables bucketed with
    the same ``num_buckets`` need no exchange (and no sort when
    ``sort_cols`` match the join key)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)
