"""Live Kafka smoke (SURVEY S2/S3) — the reference's spine
(producer.py:34-55 -> consumer.py:358-407) exercised end to end when a
broker exists.

No broker ships in this sandbox, so these tests SKIP cleanly unless
``ECOSTREAM_KAFKA_BOOTSTRAP`` is set (e.g. ``localhost:9092``).  Run:

    ECOSTREAM_KAFKA_BOOTSTRAP=localhost:9092 python -m pytest -m kafka

The file-stream twin of this path is tested unconditionally in
test_streaming.py (stream-batch equivalence); this adds only the
broker-specific legs: the Kafka sink write and the Kafka source's
offset handling + from_json decode.
"""

from __future__ import annotations

import os
import uuid

import pytest

BOOTSTRAP = os.environ.get("ECOSTREAM_KAFKA_BOOTSTRAP")

pytestmark = [
    pytest.mark.kafka,
    pytest.mark.skipif(
        not BOOTSTRAP,
        reason="set ECOSTREAM_KAFKA_BOOTSTRAP=<host:port> to run Kafka smoke",
    ),
]


def test_kafka_roundtrip_sink_then_source(spark, tmp_path):
    """Generator -> kafka_sink -> broker -> kafka_source -> typed rows:
    every produced event comes back decoded with the full nested
    schema, and the count matches exactly (no loss, no duplication)."""
    from ecostream.generator import insect_events
    from ecostream.streaming.ingest import kafka_sink, kafka_source

    topic = f"insect-events-smoke-{uuid.uuid4().hex[:8]}"
    n = 250

    events = insect_events(spark, n)
    # Batch write via the streaming sink's payload shape: reuse the
    # sink's JSON encoding by writing the bounded frame with a
    # one-batch stream (availableNow) so the checkpointed path is the
    # one exercised.
    src_dir = tmp_path / "src"
    events.write.mode("overwrite").parquet(str(src_dir))
    stream = spark.readStream.schema(events.schema).parquet(str(src_dir))
    q = (
        kafka_sink(
            stream,
            checkpoint=str(tmp_path / "sink_ckpt"),
            bootstrap=BOOTSTRAP,
            topic=topic,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    consumed = kafka_source(spark, bootstrap=BOOTSTRAP, topic=topic)
    out = (
        consumed.writeStream.format("memory")
        .queryName("kafka_smoke")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "src_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination(120)

    got = spark.sql("SELECT * FROM kafka_smoke")
    assert got.count() == n
    # full nested schema survived the JSON round trip
    assert {"insect", "event", "location", "event_ts"} <= set(got.columns)
    species = {r[0] for r in got.select("insect.species").distinct().collect()}
    assert species <= {"ant", "bee", "butterfly", "spider"}
