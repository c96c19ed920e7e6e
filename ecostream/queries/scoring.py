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
               CAST(SUM(CAST(ROUND(abs(value) * 100) AS BIGINT)) AS BIGINT)
                   AS si,
               CAST(SUM(CAST(props ->> '$.k' AS INT)) AS BIGINT) AS sd
        FROM events GROUP BY event_type
    ), scored AS (
        SELECT event_type, cnt,
               (2 * si * 1000000 + 100 * cnt) // (200 * cnt) AS ra,
               (2 * sd * 1000000 + cnt) // (2 * cnt) AS rd
        FROM base
    ), sc2 AS (
        SELECT event_type, cnt, ra, rd,
               (2 * 20 * ra * 1000000 + rd) // (2 * rd) AS rs
        FROM scored
    )
    SELECT event_type, cnt,
           CAST(ra AS DOUBLE) / 1000000 AS avg_impact,
           CAST(rd AS DOUBLE) / 1000000 AS avg_density,
           CAST(rs AS DOUBLE) / 1000000 AS score,
           CAST((2 * rs * 1000000 + SUM(rs) OVER ())
                // (2 * SUM(rs) OVER ()) AS DOUBLE) / 1000000 AS norm_score
    FROM sc2
    ORDER BY norm_score DESC, event_type
    """,
)
def a7_weighted_species_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pageRank.py's accumulate→score→normalize→sort pipeline as one
    groupBy + window normalization.  One shuffle (the 5-group agg); the
    window-sum normalization runs over 5 rows."""
    # Integer-domain round-6 end to end (the lm2/ql2 portability
    # device): cent-scaled impact and integer density sums make every
    # average, the composed score 20*avg_impact/avg_density, and the
    # normalization EXACT rationals, each rounded once by
    # (2a*1e6 + b) div (2b) — no float ROUND anywhere, so no
    # double-rounding boundary can split the engines.  Long arithmetic
    # holds to ~1e12 cent-rows per group; past that, lift the device
    # into decimal(38,0)/HUGEINT (the dq2 bound note).
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    base = ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(F.round(F.abs(F.col("value")) * 100).cast("long")).alias("si"),
        F.sum(k).cast("long").alias("sd"),
    )
    scored = base.select(
        "event_type",
        "cnt",
        F.expr("(2 * si * 1000000 + 100 * cnt) div (200 * cnt)").alias("ra"),
        F.expr("(2 * sd * 1000000 + cnt) div (2 * cnt)").alias("rd"),
    ).withColumn(
        "rs", F.expr("(2 * 20 * ra * 1000000 + rd) div (2 * rd)")
    )
    return (
        scored.withColumn("tot", F.sum("rs").over(W.partitionBy()))
        # true integer `div` — a double `/` then cast would mis-floor
        # quotients that land just under an integer boundary
        .withColumn(
            "norm_score",
            F.expr("(2 * rs * 1000000 + tot) div (2 * tot)")
            .cast("double")
            / 1_000_000,
        )
        .select(
            "event_type",
            "cnt",
            (F.col("ra").cast("double") / 1_000_000).alias("avg_impact"),
            (F.col("rd").cast("double") / 1_000_000).alias("avg_density"),
            (F.col("rs").cast("double") / 1_000_000).alias("score"),
            "norm_score",
        )
        .orderBy(F.desc("norm_score"), "event_type")
    )


@query(
    "a8_frequency_pct",
    oracle="""
    SELECT event_type, count(*) AS cnt,
           CAST((2 * count(*) * 100000000
                 + (SELECT count(*) FROM events))
                // (2 * (SELECT count(*) FROM events)) AS DOUBLE)
               / 1000000 AS pct
    FROM events GROUP BY event_type
    ORDER BY cnt DESC, event_type
    """,
)
def a8_frequency_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency + percentage table (the walk-analysis Counter shape,
    consultas.py:264-285): group-count + window grand total.  The
    percentage is the exact rational cnt*100/total rounded in the
    INTEGER domain, so no float ROUND boundary exists."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
    return (
        counts.withColumn("tot", F.sum("cnt").over(W.partitionBy()))
        # integer-domain round-6 of cnt*100/total (the lm2/ql2 device)
        .withColumn(
            "pct",
            F.expr("(2 * cnt * 100000000 + tot) div (2 * tot)")
            .cast("double")
            / 1_000_000,
        )
        .drop("tot")
        .orderBy(F.desc("cnt"), "event_type")
    )
