"""Scale-safe per-group top-k.

A plain ``row_number().over(Window.partitionBy(group))`` shuffles every
candidate row into |groups| partitions — with few groups (e.g. 5 ANN
queries) that is a skew funnel at scale.  ``topk_per_group`` does it in
two stages: rank within (group, salt-bucket) first — same shuffle
volume but |groups|·buckets-way parallel — which cuts survivors to
≤ buckets·k per group, then rank those few rows per group.  Output is
identical to the single-window form (the salt only partitions stage 1;
stage 2 re-ranks globally per group).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F


def topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column],
    k: int,
    salt_col: Column,
    buckets: int = 32,
    rank_alias: str = "rnk",
) -> DataFrame:
    """Top-k rows per group by ``order_cols`` (use F.desc/F.asc cols).

    ``salt_col`` must be a deterministic per-row expression (e.g. a key
    column) — it spreads stage 1 across ``buckets`` partitions per
    group.  The returned frame carries ``rank_alias`` (1-based LongType)."""
    salted = df.withColumn("_tk_salt", F.pmod(F.xxhash64(salt_col), F.lit(buckets)))
    w1 = W.partitionBy(*group_cols, "_tk_salt").orderBy(*order_cols)
    stage1 = (
        salted.withColumn("_tk_r1", F.row_number().over(w1))
        .where(F.col("_tk_r1") <= k)
        .drop("_tk_r1", "_tk_salt")
    )
    w2 = W.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        stage1.withColumn(rank_alias, F.row_number().over(w2).cast("long"))
        .where(F.col(rank_alias) <= k)
    )
