"""Gated scan-spread: repartition a narrow scan to session parallelism
when the input's FILE LAYOUT under-splits it.

The test corpus ships single-row-group parquet files, and a parquet
row group is the minimum split unit — `spark.sql.files.minPartitionNum`
produces only empty extra splits (measured: documents.parquet stays one
non-empty partition under any floor).  Every downstream map-side pass
(n-gram explodes, winnowing folds, Viterbi DP, prefix-filter explodes)
then runs in ONE task regardless of core count (guide §2.5 input skew:
"one huge unsplittable file ... repartition immediately after the
read").

The repartition is GATED on the scan actually being under-split, so at
warehouse scale — where inputs arrive as many files/row groups and the
scan already yields >= cluster-parallelism splits — this is a no-op and
no extra exchange is paid.  Applied per query where an interleaved A/B
measured a win (d13 0.63x, d17 0.70x, d14 0.71x, tok3 0.75x, t9 0.86x);
queries whose downstream work is one cheap partial aggregation (a6,
lm2, dsir1, bpe1, the embeddings family) measured FLAT-TO-WORSE — the
exchange costs more than the serial map — and are left alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_scan(df: DataFrame) -> DataFrame:
    """Round-robin repartition ``df`` to the session's default
    parallelism iff its current (file-layout-derived) partitioning is
    narrower.  Row-to-partition assignment is deterministic under
    retry (sort-before-repartition stays on), and every consumer here
    is order-free (aggregates / hash-pinned outputs), so results are
    unchanged."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df
