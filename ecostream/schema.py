"""Canonical schemas and table loaders.

The reference's single fact stream is a nested JSON "insect event"
(reference: producer.py:13-32); its de-facto schema is pinned here as an
explicit ``StructType`` so ``from_json`` never falls back to inference.
The driver testdata (TESTDATA.md) is a TPC-H-ish star schema plus an
``events`` stream table; loaders below register every table as a temp
view so queries can be written in either the DataFrame or SQL API.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Native insect-event schema (reference: producer.py:13-32, SURVEY §1.1/1.3)
# ---------------------------------------------------------------------------

INSECT_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("_id", T.StringType(), False),
        T.StructField(
            "insect",
            T.StructType(
                [
                    T.StructField("species", T.StringType(), True),
                    T.StructField("role", T.StringType(), True),
                    T.StructField("age", T.IntegerType(), True),
                ]
            ),
            True,
        ),
        T.StructField("event", T.StringType(), True),
        T.StructField("eventTime", T.StringType(), True),
        T.StructField(
            "location",
            T.StructType(
                [
                    T.StructField("habitat", T.StringType(), True),
                    T.StructField(
                        "coordinates",
                        T.StructType(
                            [
                                T.StructField("latitude", T.DoubleType(), True),
                                T.StructField("longitude", T.DoubleType(), True),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        ),
        T.StructField("ecologicalImpact", T.IntegerType(), True),
        T.StructField("populationDensity", T.IntegerType(), True),
    ]
)

# Vocabularies (reference: producer.py:8-11)
SPECIES = ["ant", "bee", "butterfly", "spider"]
ROLES = ["worker", "queen", "soldier", "scout"]
EVENTS = ["birth", "death", "predator attack"]
HABITATS = ["forest", "field", "garden", "house"]


def parse_event_ts(col: str = "eventTime") -> F.Column:
    """Canonical timestamp parse for the reference's ``"...T... Z"`` string.

    Mirrors consumer.py:61's ``split(" Z")[0]`` strip: drop the trailing
    ``" Z"`` and parse tz-naive in the (UTC) session zone.  One parse at
    ingest; every downstream operator consumes ``event_ts``.
    """
    return F.to_timestamp(
        F.regexp_replace(F.col(col), " Z$", ""), "yyyy-MM-dd'T'HH:mm:ss"
    )


def with_event_ts(df: DataFrame) -> DataFrame:
    """Attach the canonical ``event_ts`` column to a native-schema frame."""
    return df.withColumn("event_ts", parse_event_ts())


# ---------------------------------------------------------------------------
# Driver testdata star schema (TESTDATA.md / FIXTURES.md §B)
# ---------------------------------------------------------------------------

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table; columnar parquet scan with pushdown.

    The driver's ``events`` parquet stores ``ts`` as TIMESTAMP(NANOS),
    which Spark only reads via the nanosAsLong legacy conf (as a raw
    int64).  We convert to a proper TimestampType by integer-dividing to
    microseconds — integer ``div``, never float math: nanosecond epochs
    exceed 2^53 and would corrupt under a double round-trip.  Flooring
    to µs matches DuckDB, whose TIMESTAMP is µs-precision, so the oracle
    sees identical instants.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize the events table's ``ts`` to zoned TimestampType.

    Two parquet encodings appear in testdata: TIMESTAMP(NANOS) (read as
    raw int64 under nanosAsLong — integer-divide to µs) and
    timestamp[us] without isAdjustedToUTC (read as TIMESTAMP_NTZ in
    Spark 4 — the session zone is UTC, so a cast relabels the same
    instant as zoned TIMESTAMP, required by unix_micros, windows, and
    streaming event-time, without shifting values).  Works on batch and
    streaming DataFrames alike.
    """
    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-stream source over the events parquet (explicit schema — no
    inference in streaming), with ``ts`` normalized exactly as
    ``load_table`` does so stream and batch twins agree."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return normalize_events_ts(stream)


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load all testdata tables and register them as temp views.

    Views let every query use ``spark.sql`` with the exact same table
    names the DuckDB oracle sees.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
