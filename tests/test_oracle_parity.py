"""Every declared query with an oracle must match DuckDB exactly —
the local mirror of the driver's t2 gate (run at sf0.001 for speed;
the driver runs sf0.01)."""

from __future__ import annotations

import pytest

from .conftest import SF_SMOKE
from .parity import compare, duck_connection


def _declared():
    from ecostream.queries import ORACLES, QUERIES

    return [(name, QUERIES[name], ORACLES[name]) for name in sorted(ORACLES)]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", [n for n, _, _ in _declared()])
def test_oracle_parity(spark, duck, name):
    from ecostream.queries import ORACLES, QUERIES

    compare(QUERIES[name](spark, SF_SMOKE), duck, ORACLES[name], name)


def test_parity_harness_is_dtype_strict(spark, duck):
    """VERDICT r7 #1: an int64 engine column vs a float64 oracle column
    must FAIL locally even when every value compares equal under `==`.
    This is exactly the shard1_rendezvous failure mode — DuckDB's
    HUGEINT `//` quotient surfaces as float64 in pandas (62.0), Spark
    returns BIGINT (62), the driver's TYPED hash rejects it, and the
    round-7 harness let it through.  Both directions are exercised."""
    eng_long = spark.sql("SELECT CAST(62 AS BIGINT) AS v")
    # sum(BIGINT) // in DuckDB is HUGEINT -> float64 in pandas: the
    # literal un-cast-quotient shape that shipped driver-red in r7.
    with pytest.raises(AssertionError, match="dtype mismatch"):
        compare(
            eng_long,
            duck,
            "SELECT (62 * sum(x)) // count(*) AS v FROM (SELECT CAST(1 AS BIGINT) AS x)",
            "dtype_probe_int_vs_hugeint",
        )
    with pytest.raises(AssertionError, match="dtype mismatch"):
        compare(
            eng_long, duck, "SELECT 62.0 AS v", "dtype_probe_int_vs_float"
        )
    # And the straight case still passes (no false positives).
    compare(
        eng_long,
        duck,
        "SELECT CAST(62 AS BIGINT) AS v",
        "dtype_probe_matched",
    )


def test_all_queries_run(spark):
    """Queries without oracles (seeded / non-SQL ops) must still run and
    return a stable schema (the driver's rows-only check)."""
    from ecostream.queries import ORACLES, QUERIES

    for name, fn in sorted(QUERIES.items()):
        if name in ORACLES:
            continue
        df = fn(spark, SF_SMOKE)
        assert df.columns, f"{name}: empty schema"
        assert df.count() >= 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    keys = set(e.queries())
    assert set(e.oracle_sql()) <= keys


def test_rotation_head_is_first_50_and_oracle_checked():
    """The driver signs only the first 50 queries() keys; the rotation
    head must stay exactly at the front and every entry must carry an
    oracle so all signed rows are value-hash comparisons.  From round 6
    the head holds the never-signed stragglers plus this round's new
    queries — it may be shorter than 50 (the driver then signs trailing
    already-signed keys, which is harmless re-confirmation)."""
    from ecostream.queries import ORACLES, QUERIES
    from ecostream.queries import _ROUND_HEAD

    assert 1 <= len(_ROUND_HEAD) <= 50
    assert list(QUERIES)[: len(_ROUND_HEAD)] == _ROUND_HEAD
    missing = [k for k in _ROUND_HEAD if k not in ORACLES]
    assert not missing, f"rows-only keys in signed head: {missing}"


def test_coverage_doc_totals_match_registry():
    """COVERAGE.md's header totals must equal the live registry — the
    doc is the judge's checklist and must not rot as queries land."""
    import re

    from ecostream.queries import ORACLES, QUERIES

    text = open("COVERAGE.md").read()
    m = re.search(
        r"totals: (\d+) declared queries, (\d+) with oracles, (\d+) rows-only",
        text,
    )
    assert m, "COVERAGE.md totals line missing"
    declared, with_oracle, rows_only = map(int, m.groups())
    assert declared == len(QUERIES), (declared, len(QUERIES))
    assert with_oracle == len(ORACLES), (with_oracle, len(ORACLES))
    assert rows_only == len(QUERIES) - len(ORACLES)
