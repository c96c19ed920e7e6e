"""Spark 4 Python DataSource (sources.py): the pluggable
insect_events source must be bit-identical to the oracle-checked
expression generator, in batch (any partitioning) and as a
micro-batch stream."""

from __future__ import annotations

import time


def _register(spark):
    from ecostream.sources import register

    register(spark)


def test_batch_datasource_equals_expression_generator(spark):
    from ecostream.generator import insect_events_flat

    _register(spark)
    ds = (
        spark.read.format("insect_events")
        .option("n", 400)
        .option("numPartitions", 5)
        .load()
    )
    assert ds.rdd.getNumPartitions() == 5
    got = sorted(map(tuple, ds.collect()))
    exp = sorted(map(tuple, insect_events_flat(spark, 400).collect()))
    assert got == exp


def test_stream_datasource_converges_to_batch(spark, tmp_path):
    from ecostream.generator import insect_events_flat

    _register(spark)
    stream = (
        spark.readStream.format("insect_events")
        .option("n", 300)
        .option("rowsPerBatch", 100)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ds_stream_t")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    # each trigger advances the offset by rowsPerBatch; give it a few
    for _ in range(6):
        q.processAllAvailable()
        time.sleep(0.2)
    q.stop()
    q.awaitTermination(30)
    got = sorted(map(tuple, spark.sql("SELECT * FROM ds_stream_t").collect()))
    exp = sorted(map(tuple, insect_events_flat(spark, 300).collect()))
    assert got == exp


def test_stream_datasource_restart_resumes_from_checkpoint(spark, tmp_path):
    """Restarting from a checkpoint must resume at the committed offset
    with no re-emitted rows: run 1 drains the first 200 indices, run 2
    (same checkpoint, larger n) must append exactly indices 200..300.
    Detector: the parquet sink — a regressed source offset would create
    NEW batch ids for already-emitted ranges, which the file-sink log
    would happily append as duplicates."""
    from ecostream.generator import insect_events_flat

    _register(spark)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    def run(n):
        stream = (
            spark.readStream.format("insect_events")
            .option("n", n)
            .option("rowsPerBatch", 100)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            for _ in range(4):
                q.processAllAvailable()
                time.sleep(0.2)
        finally:
            q.stop()
            q.awaitTermination(30)

    run(200)
    run(300)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    exp = sorted(map(tuple, insect_events_flat(spark, 300).collect()))
    assert got == exp  # no duplicates, no gaps
