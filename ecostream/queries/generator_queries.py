"""Declared generator queries (SURVEY §2.1 S1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..generator import GENERATOR_ORACLE_SQL, insect_events_flat
from .registry import query


@query("s1_seeded_generator", oracle=GENERATOR_ORACLE_SQL)
def s1_seeded_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic insect-event generator: every field a
    pure function of md5(row index), so the generator itself is
    oracle-checkable — reproducibility the reference's ``random``-based
    producer lacks.  Ignores sf_dir (generates 1000 rows like the
    sf0.001 events table)."""
    return insect_events_flat(spark, n=1000)


@query(
    "s2_native_stats",
    oracle=f"""
    WITH gen AS ({GENERATOR_ORACLE_SQL})
    SELECT 'species' AS dim, species AS val, count(*) AS cnt FROM gen GROUP BY species
    UNION ALL
    SELECT 'role', role, count(*) FROM gen GROUP BY role
    UNION ALL
    SELECT 'habitat', habitat, count(*) FROM gen GROUP BY habitat
    UNION ALL
    SELECT 'event', event, count(*) FROM gen GROUP BY event
    UNION ALL
    SELECT 'total', 'all', count(*) FROM gen
    """,
)
def s2_native_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's marquee "stats" screen (consumer.py:151-168) over
    its OWN nested event schema: total + the four group-counts
    (species/role/habitat/event), computed in one scan of the generated
    events via the same explode trick as a2 — each row emits its 5
    (dim, val) pairs, one hash-agg groups them all.  Nested fields are
    pruned through the structs; fully oracle-checked because the
    generator itself is deterministic."""
    from pyspark.sql import functions as F

    from ..generator import insect_events

    ev = insect_events(spark, n=1000)
    pairs = F.array(
        F.struct(F.lit("species").alias("dim"), F.col("insect.species").alias("val")),
        F.struct(F.lit("role").alias("dim"), F.col("insect.role").alias("val")),
        F.struct(F.lit("habitat").alias("dim"), F.col("location.habitat").alias("val")),
        F.struct(F.lit("event").alias("dim"), F.col("event").alias("val")),
        F.struct(F.lit("total").alias("dim"), F.lit("all").alias("val")),
    )
    return (
        ev.select(F.explode(pairs).alias("p"))
        .select("p.dim", "p.val")
        .groupBy("dim", "val")
        .agg(F.count("*").alias("cnt"))
    )


@query(
    "s3_datasource_stats",
    oracle=f"""
    WITH gen AS ({GENERATOR_ORACLE_SQL})
    SELECT species, event, count(*) AS cnt,
           CAST(SUM(ecologicalImpact) AS BIGINT) AS sum_impact
    FROM gen
    GROUP BY species, event
    ORDER BY species, event
    """,
)
def s3_datasource_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same generated events read through the Spark 4 Python
    DataSource (``spark.read.format("insect_events")``, sources.py) —
    the t2 gate then exercises the pluggable source end-to-end: its
    partition planning, Arrow row transport, and bit-exact agreement
    with the expression generator the oracle derives from."""
    from pyspark.sql import functions as F

    from ..sources import register

    register(spark)
    ds = spark.read.format("insect_events").option("n", 1000).load()
    return (
        ds.groupBy("species", "event")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("ecologicalImpact").cast("long")).alias("sum_impact"),
        )
        .orderBy("species", "event")
    )
