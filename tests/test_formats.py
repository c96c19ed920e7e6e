"""S6 format breadth: the events table survives schema-preserving
roundtrips through JSON and CSV (explicit schemas — no inference —
including the embedded-JSON props column through CSV quoting)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from ecostream.schema import load_table

from .conftest import SF_SMOKE

ROUNDTRIP_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def _events(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    return ev.select(
        "event_id", "ts", "user_id", "event_type", F.round("value", 6).alias("value"), "props"
    )


def _rows(df):
    return sorted(
        (r["event_id"], r["ts"], r["user_id"], r["event_type"], r["value"], r["props"])
        for r in df.select(
            "event_id", "ts", "user_id", "event_type", F.round("value", 6).alias("value"), "props"
        ).collect()
    )


def test_json_roundtrip(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "events_json")
    # Explicit micro-precision timestampFormat: the JSON writer's
    # default truncates to milliseconds.
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"
    ev.write.mode("overwrite").option("timestampFormat", fmt).json(path)
    back = (
        spark.read.schema(ROUNDTRIP_SCHEMA)
        .option("timestampFormat", fmt)
        .json(path)
    )
    assert _rows(back) == _rows(ev)


def test_csv_roundtrip(spark, tmp_path):
    ev = _events(spark)
    path = str(tmp_path / "events_csv")
    (
        ev.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(path)
    )
    back = (
        spark.read.schema(ROUNDTRIP_SCHEMA)
        .option("header", "true")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
        .csv(path)
    )
    assert _rows(back) == _rows(ev)
