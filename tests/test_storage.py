"""Storage-layout plan proofs: partition pruning reaches the scan and
bucketed joins elide the shuffle — the write-side scale properties."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from ecostream.schema import load_table
from ecostream.storage import write_bucketed, write_partitioned

from .conftest import SF_SMOKE


def plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    ev = load_table(spark, SF_SMOKE, "events")
    path = str(tmp_path / "events_by_type")
    write_partitioned(ev, path, ["event_type"], cluster_cols=["ts"])

    back = spark.read.parquet(path).where(F.col("event_type") == "error")
    p = plan(back)
    assert "PartitionFilters" in p, p
    pf_line = p.split("PartitionFilters:")[1].split("\n")[0]
    assert "event_type" in pf_line, pf_line
    # Pruned read must return exactly the error rows, nothing else.
    assert back.count() == ev.where(F.col("event_type") == "error").count()


def test_bucketed_join_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_SMOKE, "orders")
        customer = load_table(spark, SF_SMOKE, "customer")
        write_bucketed(
            orders.select("o_orderkey", "o_custkey", "o_totalprice"),
            "b_orders", ["o_custkey"], 8, sort_cols=["o_custkey"],
        )
        write_bucketed(
            customer.select("c_custkey", "c_mktsegment"),
            "b_customer", ["c_custkey"], 8, sort_cols=["c_custkey"],
        )
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        p = plan(joined)
        assert "SortMergeJoin" in p, p
        assert "Exchange" not in p, p
        # And the join result is correct vs the unbucketed computation.
        want = orders.join(
            customer, orders.o_custkey == customer.c_custkey
        ).count()
        assert joined.count() == want
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
