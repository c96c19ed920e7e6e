"""Weighted scoring + normalization + ranking (SURVEY §2.3 A7/A8, §2.5 O2).

The reference's "PageRank" (pageRank.py:4-30) is not graph PageRank: it
is a per-species weighted score
``(avg(|ecologicalImpact|)/50) * (1000/avg(populationDensity))``
normalized to sum 1 and ranked descending.  Mapped onto the driver
tables: event_type ≙ species, value ≙ ecologicalImpact, props.k ≙
populationDensity (FIXTURES §C).

Hash-stability: sums go through DECIMAL (exact, order-free); every
divide happens on already-exact inputs; the normalization sum runs over
DECIMAL-cast rounded scores so the 5-row window sum cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..schema import load_table
from .registry import query


@query(
    "a7_weighted_species_score",
    oracle="""
    WITH base AS (
        SELECT event_type,
               count(*) AS cnt,
               CAST(SUM(CAST(abs(value) AS DECIMAL(18,2))) AS DOUBLE) AS sum_imp,
               CAST(SUM(CAST(props ->> '$.k' AS INT)) AS DOUBLE) AS sum_den
        FROM events GROUP BY event_type
    ), scored AS (
        SELECT event_type, cnt,
               ROUND(sum_imp / cnt, 6) AS avg_impact,
               ROUND(sum_den / cnt, 6) AS avg_density,
               CAST(ROUND((ROUND(sum_imp / cnt, 6) / 50.0)
                          * (1000.0 / ROUND(sum_den / cnt, 6)), 6)
                    AS DECIMAL(18,6)) AS score_d
        FROM base
    )
    SELECT event_type, cnt, avg_impact, avg_density,
           CAST(score_d AS DOUBLE) AS score,
           ROUND(CAST(score_d AS DOUBLE)
                 / CAST(SUM(score_d) OVER () AS DOUBLE), 6) AS norm_score
    FROM scored
    ORDER BY norm_score DESC, event_type
    """,
)
def a7_weighted_species_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pageRank.py's accumulate→score→normalize→sort pipeline as one
    groupBy + window normalization.  One shuffle (the 5-group agg); the
    window-sum normalization runs over 5 rows."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    base = ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(F.abs(F.col("value")).cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_imp"),
        F.sum(k).cast("double").alias("sum_den"),
    )
    scored = base.select(
        "event_type",
        "cnt",
        F.round(F.col("sum_imp") / F.col("cnt"), 6).alias("avg_impact"),
        F.round(F.col("sum_den") / F.col("cnt"), 6).alias("avg_density"),
    ).withColumn(
        "score_d",
        F.round(
            (F.col("avg_impact") / F.lit(50.0))
            * (F.lit(1000.0) / F.col("avg_density")),
            6,
        ).cast("decimal(18,6)"),
    )
    return (
        scored.withColumn(
            "norm_score",
            F.round(
                F.col("score_d").cast("double")
                / F.sum("score_d").over(W.partitionBy()).cast("double"),
                6,
            ),
        )
        .select(
            "event_type",
            "cnt",
            "avg_impact",
            "avg_density",
            F.col("score_d").cast("double").alias("score"),
            "norm_score",
        )
        .orderBy(F.desc("norm_score"), "event_type")
    )


@query(
    "a8_frequency_pct",
    oracle="""
    SELECT event_type, count(*) AS cnt,
           ROUND(CAST(count(*) AS DOUBLE)
                 / CAST((SELECT count(*) FROM events) AS DOUBLE) * 100, 6) AS pct
    FROM events GROUP BY event_type
    ORDER BY cnt DESC, event_type
    """,
)
def a8_frequency_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency + percentage table (the walk-analysis Counter shape,
    consultas.py:264-285): group-count + window grand total.  Integer
    count ratio → deterministic double division → round."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
    total = F.sum("cnt").over(W.partitionBy())
    return (
        counts.withColumn(
            "pct",
            F.round(F.col("cnt").cast("double") / total.cast("double") * 100, 6),
        )
        .orderBy(F.desc("cnt"), "event_type")
    )
