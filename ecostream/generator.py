"""S1: synthetic insect-event generator (reference producer.py:13-32).

The reference draws fields uniformly with ``random``; our batch form is
*deterministic*: every field derives from md5 of the row index, which
makes the generator itself oracle-checkable in DuckDB (same md5 →
same fields) and reproducible across runs/cluster sizes — a property
the reference lacks.  The streaming form pins the same derivation onto
a rate source (~3 rows/s to match producer.py:55's pacing).

All derivation is built-in expressions over ``spark.range`` — the
generator is embarrassingly parallel (no shuffle, no driver data).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import EVENTS, HABITATS, ROLES, SPECIES

EPOCH = "2024-03-01 00:00:00"


def _pick(options: list[str], idx_col: F.Column) -> F.Column:
    return F.element_at(F.array(*[F.lit(o) for o in options]), idx_col)


def _a(h: F.Column, k: int) -> F.Column:
    """ascii code of hex digit k (1-based) of the row hash — a cheap
    deterministic uniform-ish source, identical in Spark and DuckDB."""
    return F.ascii(F.substring(h, k, 1))


def insect_events_flat(spark: SparkSession, n: int = 1000) -> DataFrame:
    """Flat deterministic event table (the declared/oracle form)."""
    df = spark.range(n).select(F.col("id").alias("i"))
    h = F.md5(F.col("i").cast("string"))
    df = df.withColumn("h", h)
    a = lambda k: _a(F.col("h"), k)  # noqa: E731
    out = df.select(
        "i",
        F.col("h").alias("event_uid"),
        _pick(SPECIES, a(1) % 4 + 1).alias("species"),
        _pick(ROLES, a(2) % 4 + 1).alias("role"),
        (a(3) % 10 + 1).cast("int").alias("age"),
        _pick(EVENTS, a(4) % 3 + 1).alias("event"),
        _pick(HABITATS, a(5) % 4 + 1).alias("habitat"),
        ((a(6) * 7 + a(7)) % 101 - 50).cast("int").alias("ecologicalImpact"),
        ((a(8) * 31 + a(9)) % 1000 + 1).cast("int").alias("populationDensity"),
        (((a(10) * 256 + a(11)) % 18000) / F.lit(100.0) - 90.0).alias("latitude"),
        (((a(11) * 256 + a(12)) % 36000) / F.lit(100.0) - 180.0).alias("longitude"),
        F.concat(
            F.date_format(
                F.expr(f"timestampadd(SECOND, i, timestamp'{EPOCH}')"),
                "yyyy-MM-dd'T'HH:mm:ss",
            ),
            F.lit(" Z"),
        ).alias("eventTime"),
    )
    return out


GENERATOR_ORACLE_SQL = f"""
    WITH base AS (
        SELECT r.range AS i, md5(CAST(r.range AS VARCHAR)) AS h
        FROM range(0, 1000) r
    )
    SELECT i, h AS event_uid,
           (['ant','bee','butterfly','spider'])[ascii(substr(h,1,1)) % 4 + 1] AS species,
           (['worker','queen','soldier','scout'])[ascii(substr(h,2,1)) % 4 + 1] AS role,
           CAST(ascii(substr(h,3,1)) % 10 + 1 AS INT) AS age,
           (['birth','death','predator attack'])[ascii(substr(h,4,1)) % 3 + 1] AS event,
           (['forest','field','garden','house'])[ascii(substr(h,5,1)) % 4 + 1] AS habitat,
           CAST((ascii(substr(h,6,1)) * 7 + ascii(substr(h,7,1))) % 101 - 50 AS INT)
               AS ecologicalImpact,
           CAST((ascii(substr(h,8,1)) * 31 + ascii(substr(h,9,1))) % 1000 + 1 AS INT)
               AS populationDensity,
           ((ascii(substr(h,10,1)) * 256 + ascii(substr(h,11,1))) % 18000) / 100.0 - 90.0
               AS latitude,
           ((ascii(substr(h,11,1)) * 256 + ascii(substr(h,12,1))) % 36000) / 100.0 - 180.0
               AS longitude,
           strftime(TIMESTAMP '{EPOCH}' + i * INTERVAL 1 SECOND, '%Y-%m-%dT%H:%M:%S')
               || ' Z' AS eventTime
    FROM base
"""


def insect_events(spark: SparkSession, n: int = 1000) -> DataFrame:
    """Native nested-schema form (SURVEY §1.1): the flat generator
    packed into the reference's document shape, plus the canonical
    parsed ``event_ts`` (SURVEY §1.4)."""
    flat = insect_events_flat(spark, n)
    return flat.select(
        F.col("event_uid").alias("_id"),
        F.struct(
            F.col("species"), F.col("role"), F.col("age")
        ).alias("insect"),
        "event",
        "eventTime",
        F.struct(
            F.col("habitat"),
            F.struct(
                F.col("latitude").alias("latitude"),
                F.col("longitude").alias("longitude"),
            ).alias("coordinates"),
        ).alias("location"),
        "ecologicalImpact",
        "populationDensity",
        F.to_timestamp(
            F.regexp_replace("eventTime", " Z$", ""), "yyyy-MM-dd'T'HH:mm:ss"
        ).alias("event_ts"),
    )


def insect_event_stream(spark: SparkSession, rows_per_second: int = 3) -> DataFrame:
    """Streaming variant: rate source paced at ~3 ev/s (producer.py:55),
    same deterministic field derivation keyed on the rate source's
    monotonically-increasing ``value``."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    df = rate.select(F.col("value").alias("i"), F.col("timestamp"))
    h = F.md5(F.col("i").cast("string"))
    df = df.withColumn("h", h)
    a = lambda k: _a(F.col("h"), k)  # noqa: E731
    return df.select(
        F.col("h").alias("_id"),
        F.struct(
            _pick(SPECIES, a(1) % 4 + 1).alias("species"),
            _pick(ROLES, a(2) % 4 + 1).alias("role"),
            (a(3) % 10 + 1).cast("int").alias("age"),
        ).alias("insect"),
        _pick(EVENTS, a(4) % 3 + 1).alias("event"),
        F.col("timestamp").alias("event_ts"),
        F.struct(
            _pick(HABITATS, a(5) % 4 + 1).alias("habitat"),
            F.struct(
                (((a(10) * 256 + a(11)) % 18000) / F.lit(100.0) - 90.0).alias(
                    "latitude"
                ),
                (((a(11) * 256 + a(12)) % 36000) / F.lit(100.0) - 180.0).alias(
                    "longitude"
                ),
            ).alias("coordinates"),
        ).alias("location"),
        ((a(6) * 7 + a(7)) % 101 - 50).cast("int").alias("ecologicalImpact"),
        ((a(8) * 31 + a(9)) % 1000 + 1).cast("int").alias("populationDensity"),
    )
