"""Third-implementation checks for the interval-shaped operators
(SCD2 run-length compaction, banded interval-overlap join): pure
Python recomputation over the raw parquet beside the cross-engine
oracle, mirroring tests/test_corpus_ops.py."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from ecostream.queries.registry import QUERIES

from .conftest import SF_SMOKE


def test_cdc1_matches_pure_python(spark):
    rows = duckdb.sql(
        f"SELECT user_id, event_type, ts, event_id "
        f"FROM '{SF_SMOKE}/events.parquet' ORDER BY user_id, ts, event_id"
    ).fetchall()
    by_user: dict[int, list] = defaultdict(list)
    for u, et, ts, eid in rows:
        by_user[u].append((et, ts))
    expected = {}
    for u, seq in by_user.items():
        runs = []  # (state, valid_from, n_events)
        for et, ts in seq:
            if runs and runs[-1][0] == et:
                runs[-1][2] += 1
            else:
                runs.append([et, ts, 1])
        for i, (state, vf, n) in enumerate(runs):
            vt = runs[i + 1][1] if i + 1 < len(runs) else None
            expected[(u, i + 1)] = (state, vf, vt, int(vt is None), n)
    got = {
        (r["user_id"], r["version"]): (
            r["state"],
            r["valid_from"],
            r["valid_to"],
            r["is_current"],
            r["n_events"],
        )
        for r in QUERIES["cdc1_scd2_intervals"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_j28_matches_pure_python(spark):
    spans = duckdb.sql(
        f"SELECT user_id, date_trunc('day', ts) AS day, "
        f"epoch_us(min(ts)) AS a_start, epoch_us(max(ts)) AS a_end "
        f"FROM '{SF_SMOKE}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    (lo,) = duckdb.sql(
        f"SELECT epoch_us(min(ts)) FROM '{SF_SMOKE}/events.parquet'"
    ).fetchone()
    promo = [
        (p, lo + p * 43_200_000_000, lo + p * 43_200_000_000 + 21_600_000_000)
        for p in range(50)
    ]
    counts: dict[int, int] = defaultdict(int)
    for _u, _d, a_start, a_end in spans:
        for pid, b_start, b_end in promo:
            if a_start <= b_end and b_start <= a_end:
                counts[pid] += 1
    got = {
        r["promo_id"]: r["n_user_days"]
        for r in QUERIES["j28_banded_interval_join"](spark, SF_SMOKE).collect()
    }
    assert got == dict(counts)
