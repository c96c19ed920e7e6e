"""Distributed prefix sum (functions/prefix.py): row-for-row equality
with the single-partition global window, with and without groups, and
the no-single-partition plan property."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import Window, functions as F

from .conftest import SF_SMOKE


def _expected(df, order_cols, value_col, partition_cols=()):
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        "cum_before", F.sum(value_col).over(w) - F.col(value_col)
    )


def test_prefix_sum_equals_global_window(spark):
    from ecostream.functions.prefix import with_prefix_sum
    from ecostream.schema import load_table

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    got = {
        r["event_id"]: r["cum_before"]
        for r in with_prefix_sum(
            ev, ["event_id"], "user_id", num_partitions=7
        ).collect()
    }
    want = {
        r["event_id"]: r["cum_before"]
        for r in _expected(ev, ["event_id"], "user_id").collect()
    }
    assert got == want


def test_prefix_sum_grouped_equals_partitioned_window(spark):
    from ecostream.functions.prefix import with_prefix_sum
    from ecostream.schema import load_table

    ev = load_table(spark, SF_SMOKE, "events").select(
        "event_id", "event_type", "user_id"
    )
    got = {
        (r["event_type"], r["event_id"]): r["cum_before"]
        for r in with_prefix_sum(
            ev,
            ["event_id"],
            "user_id",
            partition_cols=["event_type"],
            num_partitions=5,
        ).collect()
    }
    want = {
        (r["event_type"], r["event_id"]): r["cum_before"]
        for r in _expected(
            ev, ["event_id"], "user_id", partition_cols=["event_type"]
        ).collect()
    }
    assert got == want


def test_prefix_sum_plan_has_no_single_partition_window(spark):
    """The whole point: no 'Window.orderBy with empty partition spec'
    — every window in the plan partitions by the range-partition id."""
    from ecostream.functions.prefix import with_prefix_sum
    from ecostream.schema import load_table

    ev = load_table(spark, SF_SMOKE, "events").select("event_id", "user_id")
    out = with_prefix_sum(ev, ["event_id"], "user_id", num_partitions=7)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain(mode="formatted")
    plan = buf.getvalue()
    assert "Window" in plan
    # a global window would show 'Exchange SinglePartition' feeding it
    assert "SinglePartition" not in plan, plan
