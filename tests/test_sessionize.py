"""Property test: the distributed gap-sessionizer (w3's lag-gap flag
form) equals a straightforward local simulation on arbitrary event
sequences (hypothesis drives user counts, timestamp clumping, and
duplicate timestamps)."""

from __future__ import annotations

import datetime as dt

from hypothesis import given, settings, strategies as st
from pyspark.sql import Window as W
from pyspark.sql import functions as F

GAP_S = 1800

rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),          # user
        st.integers(min_value=0, max_value=40_000),     # offset seconds
    ),
    min_size=1,
    max_size=80,
)


def _local_sessions(rows):
    """(user, n_events, n_sessions) by direct simulation."""
    by_user: dict[int, list[int]] = {}
    for u, s in rows:
        by_user.setdefault(u, []).append(s)
    out = {}
    for u, ts in by_user.items():
        ts.sort()
        n_sessions = 1 + sum(
            1 for a, b in zip(ts, ts[1:]) if b - a > GAP_S
        )
        out[u] = (len(ts), n_sessions)
    return out


@settings(max_examples=15, deadline=None)
@given(rows=rows_strategy)
def test_gap_sessionize_matches_simulation(spark, rows):
    # Unique (user, offset) so the order-by is total and the local
    # simulation's sort agrees with Spark's (ts, event_id) ordering.
    rows = sorted(set(rows))
    base = dt.datetime(2024, 1, 1)
    data = [
        (i, u, base + dt.timedelta(seconds=s)) for i, (u, s) in enumerate(rows)
    ]
    df = spark.createDataFrame(data, "event_id long, user_id int, ts timestamp")

    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = F.when(
        prev.isNull() | (F.col("ts") - prev > F.expr(f"INTERVAL {GAP_S} SECONDS")),
        1,
    ).otherwise(0)
    got = {
        r["user_id"]: (r["n_events"], r["n_sessions"])
        for r in df.select("user_id", new_sess.alias("ns"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"), F.sum("ns").alias("n_sessions"))
        .collect()
    }
    assert got == _local_sessions(rows)
