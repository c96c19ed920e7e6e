"""Spark 4 Python DataSource for the synthetic insect-event stream (S1).

The reference's producer is a standalone process pushing JSON to Kafka
(producer.py:13-55); the engine's batch generator is pure expressions
(generator.py).  This module adds the third form: a first-class
*pluggable source* via Spark 4's Python DataSource API —
``spark.read.format("insect_events")`` / ``spark.readStream.format(
"insect_events")`` — with real partition planning (batch) and offset
tracking (streaming), so the generator composes with everything a
normal source does (no temp tables, no driver-side materialization).

Determinism contract: rows are derived from md5(row index) with EXACTLY
the same arithmetic as ``generator.insect_events_flat`` — the tests
assert bit-equality between the DataSource and the expression form, and
the expression form is itself DuckDB-oracle-checked (s1).  Partitions
split the index range, so output is identical at any parallelism.

Scale note: each batch-read partition generates its own index slice —
no shuffle, no skew, linear in rows-per-partition.  The STREAM reader
uses ``SimpleDataSourceStreamReader``: its ``read(start)`` receives the
checkpoint-restored offset, so the planned range is always
``[start, start+rowsPerBatch)`` — monotone across restarts by API
construction (a ``DataSourceStreamReader`` whose ``latestOffset`` is
seeded from in-memory state can regress behind the committed offset
after a restart and replay committed ranges).  The driver-side read is
fine here: this is a bounded synthetic generator (rowsPerBatch rows per
trigger), not a throughput path.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from .schema import EVENTS, HABITATS, ROLES, SPECIES

SCHEMA = (
    "i bigint, event_uid string, species string, role string, age int, "
    "event string, habitat string, ecologicalImpact int, "
    "populationDensity int, latitude double, longitude double, "
    "eventTime string"
)

_EPOCH_ISO = "2024-03-01T00:00:00"


def _row(i: int) -> tuple:
    """One event tuple — mirrors generator.insect_events_flat exactly
    (md5 hex digits drive every field; ascii() of digit k, 1-based)."""
    import datetime as dt

    h = hashlib.md5(str(i).encode()).hexdigest()
    a = [ord(c) for c in h]  # a[k-1] == Spark's ascii(substring(h, k, 1))
    ts = dt.datetime.fromisoformat(_EPOCH_ISO) + dt.timedelta(seconds=i)
    return (
        i,
        h,
        SPECIES[a[0] % 4],
        ROLES[a[1] % 4],
        a[2] % 10 + 1,
        EVENTS[a[3] % 3],
        HABITATS[a[4] % 4],
        (a[5] * 7 + a[6]) % 101 - 50,
        (a[7] * 31 + a[8]) % 1000 + 1,
        ((a[9] * 256 + a[10]) % 18000) / 100.0 - 90.0,
        ((a[10] * 256 + a[11]) % 36000) / 100.0 - 180.0,
        ts.strftime("%Y-%m-%dT%H:%M:%S") + " Z",
    )


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class InsectEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.num_partitions = int(options.get("numPartitions", 8))

    def partitions(self):
        per = max(1, -(-self.n // self.num_partitions))
        return [
            _Range(lo, min(lo + per, self.n)) for lo in range(0, self.n, per)
        ]

    def read(self, partition: _Range) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield _row(i)


class InsectEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch source: the offset IS the next row index; each
    trigger advances by ``rowsPerBatch`` until ``n`` (then idles).
    ``read(start)`` derives the batch from the (checkpoint-restored)
    start offset, so restart resumes exactly where the committed offset
    left off — no in-memory offset state to regress."""

    def __init__(self, options: dict):
        self.n = int(options.get("n", 1000))
        self.rows_per_batch = int(options.get("rowsPerBatch", 100))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict) -> tuple[Iterator[tuple], dict]:
        lo = start["i"]
        hi = min(self.n, lo + self.rows_per_batch)
        return iter([_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        return iter([_row(i) for i in range(start["i"], end["i"])])

    def commit(self, end: dict) -> None:
        pass


class InsectEventsDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "insect_events"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> InsectEventsReader:
        return InsectEventsReader(self.options)

    def simpleStreamReader(self, schema) -> InsectEventsStreamReader:
        return InsectEventsStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(InsectEventsDataSource)
