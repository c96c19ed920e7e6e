"""Round-12 operator tests: the hw1/hw2 sub-seed guard (both engines
must exclude short series identically instead of crash-vs-NULL
diverging), st24 native-TTL keep/expire legs, var1 VARIANT typed access
(pure-pandas third implementation + no-Python plan), st22 foreachBatch
idempotence (apply-twice == apply-once), and g16's broadcast-gate
fallback path.
"""

from __future__ import annotations

import json
import os

import duckdb
import pandas as pd

from tests.conftest import SF_SMOKE


def _write_synth_events(spark, tmp_path, days):
    """Write a minimal events.parquet spanning ``days`` distinct days
    (3 rows/day, one event type) into tmp_path; returns the sf_dir."""
    from pyspark.sql import functions as F

    rows = []
    for d in range(days):
        for i in range(3):
            rows.append(
                (
                    d * 3 + i,
                    f"2024-03-{d + 1:02d} 0{i}:00:00",
                    100 + i,
                    "click",
                    1.5,
                    '{"k": 7}',
                )
            )
    df = spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long, event_type string,"
        " value double, props string"
    ).select(
        "event_id",
        F.to_timestamp("ts_s").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    sf_dir = str(tmp_path / f"synth_{days}d")
    df.coalesce(1).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")
    return sf_dir


def _duck_events(sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    return con


def test_hw_sub_seed_series_excluded_identically(spark, tmp_path):
    """ADVICE r11: a series shorter than the seed window used to crash
    Spark (negative slice length / ANSI element_at) while DuckDB
    degraded to NULL rows.  Both engines must now EXCLUDE such series:
    3 days -> hw1 emits the type, hw2 (m=7) emits nothing; 1 day ->
    hw1 emits nothing; always matching the oracle row-for-row."""
    from ecostream.queries.registry import ORACLES
    from ecostream.queries.seriesops import hw1_holt_trend, hw2_holt_winters

    sf3 = _write_synth_events(spark, tmp_path, days=3)
    con3 = _duck_events(sf3)
    hw1_rows = hw1_holt_trend(spark, sf3).collect()
    assert len(hw1_rows) == 1 and hw1_rows[0]["n_days"] == 3
    oracle1 = con3.sql(ORACLES["hw1_holt_trend"]).fetchall()
    assert [tuple(r) for r in hw1_rows] == oracle1
    assert hw2_holt_winters(spark, sf3).count() == 0
    assert con3.sql(ORACLES["hw2_holt_winters"]).fetchall() == []

    sf1 = _write_synth_events(spark, tmp_path, days=1)
    con1 = _duck_events(sf1)
    assert hw1_holt_trend(spark, sf1).count() == 0
    assert con1.sql(ORACLES["hw1_holt_trend"]).fetchall() == []


def test_st24_keep_and_expire_legs_equal_exact_counts(spark):
    """The KEEP leg's running-max and the EXPIRE leg's restart-sum must
    BOTH equal the exact per-user count — the keep side proves state
    survived 24h-TTL batch boundaries, the expire side proves 1ms-TTL
    state lapsed at EVERY boundary (surviving state would overcount
    any user spanning two of the 4 feed batches)."""
    from pyspark.sql import functions as F

    from ecostream.queries.streaming_queries import st24_tws_native_ttl
    from ecostream.schema import load_table

    exact = {
        r["user_id"]: r["n"]
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    rows = st24_tws_native_ttl(spark, SF_SMOKE).collect()
    assert {r["user_id"]: r["n_live"] for r in rows} == exact
    assert {r["user_id"]: r["n_relapsed"] for r in rows} == exact
    # the expire leg is only a proof if some user actually spans >= 2
    # batches (otherwise restart-sum == running-max trivially)
    assert max(exact.values()) >= 2


def test_var1_matches_pure_pandas_and_stays_jvm_side(spark):
    """Third implementation of var1: pandas + json.loads over the raw
    parquet must reproduce every aggregate, and the serving plan must
    contain no Python evaluation node (VARIANT decode is JVM code)."""
    from ecostream.queries.storage_queries import var1_variant_typed_serve

    raw = pd.read_parquet(f"{SF_SMOKE}/events.parquet",
                          columns=["event_type", "props"])
    ks = raw["props"].map(lambda s: int(json.loads(s)["k"]))
    g = pd.DataFrame({"event_type": raw["event_type"], "k": ks}).groupby(
        "event_type", sort=True
    )
    expected = {
        t: (
            int(len(sub)),
            int(sub["k"].sum()),
            int(sub["k"].nunique()),
            int((sub["k"] > 50).sum()),
            0,
            "OBJECT<k: BIGINT>",
        )
        for t, sub in g
    }

    df = var1_variant_typed_serve(spark, SF_SMOKE)
    got = {
        r["event_type"]: (
            r["n"], r["sum_k"], r["n_k"], r["n_hi"], r["n_miss"],
            r["var_schema"],
        )
        for r in df.collect()
    }
    assert got == expected

    plan = df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan, f"Python node in var1 plan: {marker}"


def test_st22_apply_batch_is_idempotent(spark, tmp_path):
    """The foreachBatch idempotence contract (ADVICE r11): re-applying
    the SAME micro-batch id must overwrite, not double-sum — store
    contents after a simulated retry equal the single-apply contents,
    and a later batch built on top still serves the exact totals."""
    from pyspark.sql import functions as F

    from ecostream.queries.storage_queries import (
        roll4_daily_counts,
        roll4_daily_grid,
    )
    from ecostream.queries.streaming_queries import st22_apply_batch
    from ecostream.schema import load_table

    ev = load_table(spark, SF_SMOKE, "events").select("ts", "user_id")
    b0, b1 = [p for p in ev.randomSplit([0.5, 0.5], seed=12)]
    root = str(tmp_path / "st22_idem")
    v = lambda tag: (os.path.join(root, f"grid_{tag}"),
                     os.path.join(root, f"cnt_{tag}"))
    roll4_daily_grid(roll4_daily_counts(ev.limit(0))).write.parquet(v("init")[0])
    roll4_daily_counts(ev.limit(0)).write.parquet(v("init")[1])

    st22_apply_batch(spark, v("init"), v("b0"), b0)
    snap = sorted(
        tuple(r) for r in spark.read.parquet(v("b0")[1]).collect()
    )
    st22_apply_batch(spark, v("init"), v("b0"), b0)  # simulated retry
    assert sorted(
        tuple(r) for r in spark.read.parquet(v("b0")[1]).collect()
    ) == snap
    grid_snap = sorted(
        tuple(r) for r in spark.read.parquet(v("b0")[0]).collect()
    )
    st22_apply_batch(spark, v("init"), v("b0"), b0)  # second retry
    assert sorted(
        tuple(r) for r in spark.read.parquet(v("b0")[0]).collect()
    ) == grid_snap

    st22_apply_batch(spark, v("b0"), v("b1"), b1)
    got = {
        (r["d"], r["user_id"]): r["cnt"]
        for r in spark.read.parquet(v("b1")[1]).collect()
    }
    exact = {
        (r["d"], r["user_id"]): r["cnt"]
        for r in roll4_daily_counts(ev).collect()
    }
    assert got == exact


def test_g16_shuffled_fallback_matches_broadcast_path(spark, monkeypatch):
    """The frontier-size gate (ADVICE r11) must be result-invariant:
    forcing EVERY frontier through the shuffled-join fallback (gate at
    0) yields the same hop labels as the broadcast path."""
    import ecostream.queries.graph as graph

    base = [tuple(r) for r in graph.g16_bfs_hops(spark, SF_SMOKE).collect()]
    monkeypatch.setattr(graph, "_G16_BCAST_FRONTIER_MAX", 0)
    forced = [tuple(r) for r in graph.g16_bfs_hops(spark, SF_SMOKE).collect()]
    assert forced == base and len(base) > 0
