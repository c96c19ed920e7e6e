"""Local mirror of the driver's Spark-vs-DuckDB correctness check.

Runs a declared query on Spark and its oracle SQL on DuckDB over the
same parquet, normalizes both (columns sorted by name, rows sorted by
value), and asserts exact equality — a stricter local version of the
driver's order-insensitive value-hash.
"""

from __future__ import annotations

import math
import time
from decimal import Decimal

import duckdb
import pandas as pd

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


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if df[c].map(lambda v: isinstance(v, Decimal)).any():
            df[c] = df[c].astype(float)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            # Resolution only (ns vs us is a pandas conversion detail,
            # not an engine difference — the driver's typed hash also
            # treats them as one type); int-vs-datetime still fails the
            # dtype assert below.
            df[c] = df[c].astype("datetime64[ns]")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(
    spark_df, con: duckdb.DuckDBPyConnection, sql: str, name: str
) -> dict[str, float]:
    """Assert Spark/DuckDB parity; returns {'engine_s', 'oracle_s'} so
    callers can attribute sweep wall-clock to the side that spent it
    (VERDICT r6 #2: four oracle replay towers dominated the sweep while
    the logs charged the whole time to the query)."""
    t0 = time.time()
    actual = _normalize(spark_df.toPandas())
    t1 = time.time()
    expected = _normalize(con.sql(sql).df())
    t2 = time.time()
    timings = {"engine_s": t1 - t0, "oracle_s": t2 - t1}
    assert list(actual.columns) == list(expected.columns), (
        f"{name}: column mismatch spark={list(actual.columns)} "
        f"duck={list(expected.columns)}"
    )
    # Dtype strictness (VERDICT r7 #1): the driver's value hash is TYPED,
    # so an int64 Spark column vs a float64 oracle column (e.g. DuckDB's
    # HUGEINT `//` quotient surfacing as float) must FAIL locally too —
    # `62 == 62.0` passing under `==` is exactly the hole that let
    # shard1_rendezvous ship driver-red in round 7.  _normalize already
    # canonicalizes int widths to int64 and float widths to float64, so
    # any residual dtype difference is a genuine int-vs-float (or
    # object-vs-numeric) drift between engine and oracle.
    assert list(map(str, actual.dtypes)) == list(map(str, expected.dtypes)), (
        f"{name}: dtype mismatch "
        f"spark={dict(zip(actual.columns, map(str, actual.dtypes)))} "
        f"duck={dict(zip(expected.columns, map(str, expected.dtypes)))}"
    )
    assert len(actual) == len(expected), (
        f"{name}: row count spark={len(actual)} duck={len(expected)}"
    )
    for c in actual.columns:
        a, e = actual[c], expected[c]
        if pd.api.types.is_float_dtype(a):
            bad = [
                i
                for i, (x, y) in enumerate(zip(a, e))
                if not (
                    (pd.isna(x) and pd.isna(y))
                    or x == y
                    or (isinstance(x, float) and math.isclose(x, y, rel_tol=0, abs_tol=0))
                )
            ]
        else:
            bad = [
                i
                for i, (x, y) in enumerate(zip(a, e))
                if not ((pd.isna(x) and pd.isna(y)) or x == y)
            ]
        assert not bad, (
            f"{name}: column {c!r} differs at rows {bad[:5]} "
            f"spark={[a.iloc[i] for i in bad[:5]]} duck={[e.iloc[i] for i in bad[:5]]}"
        )
    return timings
