"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
every implemented SURVEY §2 operator to a ``(spark, sf_dir) ->
DataFrame`` callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL
for each deterministic query.

Oracle conventions for non-SQL-native operators (COVERAGE.md has the
per-query map):

- Approximate sketches (HLL, MinHash estimate, Bloom probe, freqItems,
  sampleBy) emit their GUARANTEE as oracle-checked columns — the exact
  quantity recomputed independently by both engines plus an error-bound
  boolean — so a drifting estimator fails the hash.
- Hash-dependent pipelines use portable hash families where feasible
  (md5-digit arithmetic / md5-prefix integers shared as literals), so
  DuckDB replays the full mechanism: sign-LSH bucketing+ANN (sim2), IVF
  assignment+probe (sim4, via list_dot_product/list_cosine_similarity),
  SimHash bit votes (d4), LSH banding (d3b), hash-deterministic walks
  (g2_hash_walk, g3 — recursive CTEs), DTMC recurrence (m4c — recursive
  transitive closure).
- The remaining rows-only declarations are the xxhash64 production
  paths (d3/d5/d6 — mechanism verified by the md5 twins + planted-pair
  recall tests), reference-parity seeded walks (g2), float-iteration
  outputs (g5 pagerank, sim5 trained centroids), and DTMC periods
  (m4/m4b — cycle-length gcds; recurrence half is oracle-checked).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (SURVEY §7.1): the reference's marquee "stats"
    screen — counts per event_type per 1-hour tumbling window — over
    sf0.001.  Exercises scan → project → window-assign → hash-agg →
    sort: the spine of the engine."""
    from ecostream.schema import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("cnt"))
        .select(
            F.unix_timestamp(F.col("w.start")).alias("window_start_s"),
            "event_type",
            "cnt",
        )
        .orderBy("window_start_s", "event_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from ecostream.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each deterministic declared query."""
    from ecostream.queries import ORACLES

    return dict(ORACLES)
