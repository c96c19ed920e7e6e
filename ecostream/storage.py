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


def zorder_value(cols, bits: int = 16):
    """Z-order (Morton) key over ``cols`` as ONE codegen'd expression:
    bit j of column k lands at interleaved position ``j * n_cols + k``.

    Inputs must already be non-negative ints < 2**bits, SCALED TO FILL
    the bit range (rank / bucket / min-max-scale upstream, e.g.
    ``F.ntile``): a dimension that only uses low bits is out-interleaved
    by the other dimensions' high bits and gets no clustering (the
    test demonstrates this).
    The interleave is ~bits × n_cols shift/and/or ops, all inside
    whole-stage codegen — no UDF.

    Why: sorting by (a, b) clusters a perfectly and b not at all; a
    parquet predicate on b alone prunes nothing.  Sorting by the
    interleaved key gives every dimension locality, so row-group
    min/max statistics prune on ANY subset of the z-ordered columns —
    the standard multi-dimensional clustering trick for 100 TB scans
    (the same layout Delta's OPTIMIZE ZORDER BY produces).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    zv = F.lit(0).cast("long")
    for k, c in enumerate(cols):
        col = F.col(c) if isinstance(c, str) else c
        for j in range(bits):
            bit = F.shiftright(col.cast("long"), j).bitwiseAND(F.lit(1))
            zv = zv.bitwiseOR(F.shiftleft(bit, j * n + k))
    return zv


def write_zordered(
    df: DataFrame,
    path: str,
    zcols: list[str],
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write ``df`` clustered by the z-order key of ``zcols``:
    range-partition on the key (contiguous z-ranges per file), sort
    within partitions (contiguous z-ranges per row group), drop the
    helper column.  Every output file then covers a small hyper-rectangle
    of the z-ordered dimensions, so min/max footer stats prune scans on
    any of them."""
    from pyspark.sql import functions as F

    keyed = df.withColumn("_zv", zorder_value(zcols, bits=bits))
    (
        keyed.repartitionByRange(n_files, F.col("_zv"))
        .sortWithinPartitions("_zv")
        .drop("_zv")
        .write.mode("overwrite")
        .parquet(path)
    )


def dir_bytes(spark, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API (works
    for any supported filesystem, not just local)."""
    jvm = spark._jvm
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(p).getLength()


def compact(
    spark,
    src_path: str,
    dst_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_cols: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite ``src_path`` as
    ``ceil(total_bytes / target_file_bytes)`` files at ``dst_path``.

    The small-files problem is the dominant operational failure of big
    parquet lakes (a 100 TB table ingested in 10k micro-batches is
    millions of KB-sized files; every scan pays per-file open cost and
    the driver pays per-file planning cost).  Two rewrite paths:

    - no clustering: ``coalesce(n)`` — NO shuffle; each output task
      concatenates whole input partitions.  This is the cheap path for
      pure file-count reduction.
    - ``cluster_cols``: ``repartitionByRange`` + ``sortWithinPartitions``
      — one range-shuffle that also restores min/max-stat selectivity
      on the cluster key (compaction and re-clustering in one pass).

    Returns the target file count.
    """
    import math

    df = spark.read.parquet(src_path)
    n_files = max(1, math.ceil(dir_bytes(spark, src_path) / target_file_bytes))
    if cluster_cols:
        from pyspark.sql import functions as F

        out = df.repartitionByRange(
            n_files, *[F.col(c) for c in cluster_cols]
        ).sortWithinPartitions(*cluster_cols)
    else:
        out = df.coalesce(n_files)
    out.write.mode("overwrite").parquet(dst_path)
    return n_files
