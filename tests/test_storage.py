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


def _interleave_py(vals, bits):
    zv = 0
    n = len(vals)
    for k, v in enumerate(vals):
        for j in range(bits):
            zv |= ((v >> j) & 1) << (j * n + k)
    return zv


def test_zorder_value_matches_python_interleave(spark):
    from ecostream.storage import zorder_value

    rows = [(0, 0), (1, 0), (0, 1), (65535, 65535), (12345, 54321), (7, 4095)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [
        r["zv"]
        for r in df.select(zorder_value(["a", "b"]).alias("zv"))
        .orderBy("a", "b")
        .collect()
    ]
    expected = [
        _interleave_py([a, b], 16) for a, b in sorted(rows)
    ]
    assert got == expected


def test_zorder_write_narrows_per_file_ranges(spark, tmp_path):
    """Z-ordered layout must give EVERY file a narrower min/max range on
    BOTH dimensions than the unsorted layout — that range narrowing IS
    the mechanism by which footer stats prune multi-dimensional scans."""
    import pyarrow.parquet as pq
    from pathlib import Path

    from ecostream.schema import load_table
    from ecostream.storage import write_zordered
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    ev = load_table(spark, SF_SMOKE, "events").select(
        # scale BOTH dims to fill the 16-bit range: a dim that uses
        # only low bits gets out-interleaved by the other's high bits
        F.least(F.lit(65535), (F.col("event_id") * 65).cast("long")).alias("u"),
        F.least(
            F.lit(65535), (F.col("value") * 650).cast("long")
        ).alias("v"),
    )
    zpath, plainpath = str(tmp_path / "z"), str(tmp_path / "plain")
    write_zordered(ev, zpath, ["u", "v"], n_files=8)
    ev.repartition(8).write.mode("overwrite").parquet(plainpath)

    def avg_span(path, col):
        spans = []
        for f in Path(path).glob("*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    for col in ("u", "v"):
        z, plain = avg_span(zpath, col), avg_span(plainpath, col)
        assert z < plain * 0.7, (col, z, plain)


def test_compaction_reduces_files_preserving_rows(spark, tmp_path):
    """Small-file compaction: 32 tiny files → few files sized to the
    byte target, same rows; the clustered variant restores per-file
    min/max selectivity on the cluster key."""
    import glob

    from ecostream.storage import compact, dir_bytes

    ev = load_table(spark, SF_SMOKE, "events")
    src = str(tmp_path / "fragmented")
    ev.repartition(32).write.parquet(src)
    n_small = len(glob.glob(f"{src}/part-*.parquet"))
    assert n_small == 32

    total = dir_bytes(spark, src)
    dst = str(tmp_path / "compacted")
    n_target = compact(spark, src, dst, target_file_bytes=total // 2 + 1)
    files = glob.glob(f"{dst}/part-*.parquet")
    assert len(files) == n_target <= 2
    assert spark.read.parquet(dst).count() == ev.count()

    # Clustered compaction: files cover disjoint-ish user_id ranges, so
    # a point predicate's min/max pruning touches few files.
    dst2 = str(tmp_path / "compacted_clustered")
    compact(spark, src, dst2, target_file_bytes=total // 4 + 1,
            cluster_cols=["user_id"])
    spans = []
    for f in sorted(glob.glob(f"{dst2}/part-*.parquet")):
        stats = (
            spark.read.parquet(f)
            .agg(F.min("user_id"), F.max("user_id"))
            .collect()[0]
        )
        spans.append((stats[0], stats[1]))
    spans.sort()
    for (lo1, hi1), (lo2, _) in zip(spans, spans[1:]):
        assert hi1 <= lo2, spans  # range partitioning → non-overlapping
    assert spark.read.parquet(dst2).count() == ev.count()


def test_s8_merge_upsert_semantics(spark):
    """The merged snapshot must contain no deleted keys, exactly the
    doubled totals for updated keys, re-keyed inserts, and untouched
    rows bit-identical — checked against an independent pandas replay
    of the change rules (not the oracle SQL)."""
    import os
    import tempfile

    from ecostream.queries.storage_queries import s8_merge_upsert
    from ecostream.schema import load_table
    from .conftest import SF_SMOKE

    s8_merge_upsert(spark, SF_SMOKE).collect()  # writes the snapshot
    snap = spark.read.parquet(
        os.path.join(tempfile.gettempdir(), f"ecostream_s8_merged_{os.getpid()}")
    )
    orig = load_table(spark, SF_SMOKE, "orders")
    orig_rows = {r["o_orderkey"]: r for r in orig.collect()}
    got = {r["o_orderkey"]: r for r in snap.collect()}
    n_del = sum(1 for k in orig_rows if k % 10 == 7)
    n_ins = sum(1 for k in orig_rows if k % 10 == 1)
    assert len(got) == len(orig_rows) - n_del + n_ins
    for k, r in orig_rows.items():
        if k % 10 == 7:
            assert k not in got
        elif k % 10 == 3:
            assert got[k]["o_orderstatus"] == "U"
            assert abs(got[k]["o_totalprice"] - round(r["o_totalprice"], 2) * 2) < 1e-6
        else:
            assert got[k]["o_orderstatus"] == r["o_orderstatus"]
            assert got[k]["o_totalprice"] == r["o_totalprice"]
        if k % 10 == 1:
            ins = got[k + 1_000_000_000]
            assert ins["o_orderstatus"] == "I"
            assert ins["o_custkey"] == r["o_custkey"]


def test_zorder_buckets_bound_both_dimensions(spark):
    """The whole point of the Morton layout: every top-6-bit prefix
    bucket (3 bits per dimension) must bound BOTH raw dimensions to
    ~1/8 of their global range — a single-column sort can only ever
    bound one.  Bound is range/8 rounded up plus the quantization
    cell (range/256)."""
    from ecostream.queries.storage_queries import zorder1_layout_stats

    rows = zorder1_layout_stats(spark, SF_SMOKE).collect()
    assert len(rows) > 1
    gu = max(r["max_user"] for r in rows)
    gm = max(r["max_minute"] for r in rows)
    for r in rows:
        assert r["max_user"] - r["min_user"] <= gu // 8 + gu // 256 + 2, r
        assert r["max_minute"] - r["min_minute"] <= gm // 8 + gm // 256 + 2, r


def test_roll2_sketch_error_bound_vs_exact(spark):
    """The DDSketch-style guarantee: the served p50/p95 is the upper
    bound of the bucket containing the exact rank value, so
    exact <= served < exact + bucket_width, with bucket_width <=
    max(1, served / 32) at KEEP_BITS=6 (the 2^-5 relative bound)."""
    import duckdb

    from ecostream.queries.storage_queries import (
        roll2_quantile_sketch_serve,
    )

    got = {
        (r["week"], r["event_type"]): r
        for r in roll2_quantile_sketch_serve(spark, SF_SMOKE).collect()
    }
    con = duckdb.connect()
    exact = con.sql(
        f"""
        SELECT CAST(floor(epoch(ts) / 86400) AS BIGINT) // 7 AS week,
               event_type,
               quantile_disc(greatest(CAST(round(value * 100) AS BIGINT),
                                      1), 0.5) AS p50,
               quantile_disc(greatest(CAST(round(value * 100) AS BIGINT),
                                      1), 0.95) AS p95
        FROM read_parquet('{SF_SMOKE}/events.parquet')
        GROUP BY 1, 2
        """
    ).fetchall()
    assert exact
    for week, etype, p50, p95 in exact:
        r = got[(week, etype)]
        for served, ex in ((r["p50_cents"], p50), (r["p95_cents"], p95)):
            assert ex <= served, (week, etype, ex, served)
            width = max(1, served // 32 + 1)
            assert served - ex < width, (week, etype, ex, served)


def test_roll2_merge_equals_direct_sketch(spark):
    """Merge losslessness: serving a week from SUMMED per-day sketches
    must be bit-identical to a sketch built directly over the whole
    week's raw values in one pass (bucket counters are associative
    integers — the property that licenses distributed / incremental
    maintenance, st12's slicing-invariance applied to quantiles)."""
    from pyspark.sql import functions as F

    from ecostream.queries.storage_queries import (
        roll2_bin_exprs,
        roll2_serve_weekly,
    )
    from ecostream.schema import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    b_lo, ub = roll2_bin_exprs()
    day = F.expr("CAST(floor(unix_timestamp(ts) / 86400) AS BIGINT)")
    daily = (
        ev.select(day.alias("day"), "event_type", b_lo, ub)
        .groupBy("day", "event_type", "b_lo", "ub")
        .agg(F.count("*").cast("long").alias("n"))
    )
    merged = roll2_serve_weekly(daily).collect()
    # direct: bucket-count the raw values at WEEK granularity in one
    # aggregation (no daily partials, no merge), same serve.
    direct_daily = (
        ev.select(
            (day - (day % 7)).alias("day"),  # any day within the week
            "event_type",
            b_lo,
            ub,
        )
        .groupBy("day", "event_type", "b_lo", "ub")
        .agg(F.count("*").cast("long").alias("n"))
    )
    direct = roll2_serve_weekly(direct_daily).collect()
    key = lambda r: (r["week"], r["event_type"])  # noqa: E731
    assert sorted(map(tuple, merged), key=str) == sorted(
        map(tuple, direct), key=str
    )
