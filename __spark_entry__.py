"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
every implemented SURVEY §2 operator to a ``(spark, sf_dir) ->
DataFrame`` callable; ``oracle_sql()`` gives the DuckDB-equivalent SQL
for each deterministic query (approximate/seeded ops are declared
without an oracle → rows-only check).
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
