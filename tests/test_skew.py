"""AQE skew handling proof: a join with one dominant key must be
split by adaptive skew-join optimization instead of serializing the
hot partition through a single task — the behavior that saves a
skewed 100 TB join.  Thresholds are lowered so the ~MB-scale test
input qualifies as 'skewed'."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # 150k fact rows, 60% on key 0; dim side uniform.
        fact = spark.range(0, 150_000).select(
            F.when(F.col("id") % 10 < 6, 0)
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload_"), F.col("id")).alias("payload"),
        )
        dim = spark.range(0, 1000).select(
            F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("attr")
        )
        joined = fact.join(dim, "k")
        # Execute through THIS DataFrame's QueryExecution so AQE
        # finalizes the plan we inspect (count() would plan separately).
        assert len(joined.collect()) == 150_000
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_equals_plain_join(spark):
    """salted_join must produce exactly the plain join's rows on a
    skewed input (90% of the big side on one key), while splitting the
    hot key across salt partitions."""
    from ecostream.functions.salt import salted_join
    from pyspark.sql import functions as F

    big = spark.range(2000).select(
        F.col("id"),
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 50).alias("k"),
        (F.col("id") * 3 % 97).alias("payload"),
    )
    small = spark.range(50).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("label")
    )
    plain = big.join(small, "k", "inner").select("id", "k", "payload", "label")
    salted = salted_join(
        big, small, key="k", salt_src=F.col("id"), n_salt=8
    ).select("id", "k", "payload", "label")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))

    # the salt really spreads the hot key: >1 distinct salt for k=1
    bs = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col("id")), F.lit(8)).cast("int")
    )
    n_salts = bs.where(F.col("k") == 1).select("_salt").distinct().count()
    assert n_salts > 4


def test_salted_join_rejects_outer_small_side(spark):
    """right/full outer would replicate unmatched small-side rows once
    per salt value — salted_join must refuse rather than silently break
    its 'output = plain join' contract."""
    import pytest

    from ecostream.functions.salt import salted_join

    big = spark.range(10).withColumnRenamed("id", "k")
    small = spark.range(3).withColumnRenamed("id", "k")
    for how in ("right", "full", "full_outer", "right_outer"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", F.col("k"), n_salt=4, how=how)


def test_j29_bloom_prefilter_reduces_and_preserves(spark):
    """The Bloom pre-filter must (a) keep every true match — no false
    negatives — and (b) actually reduce the fact side below full size;
    the final result equals the plain join by construction (driver
    oracle), so here we pin the REDUCTION mechanism itself."""
    from ecostream.queries import QUERIES
    from ecostream.schema import load_table
    from tests.conftest import SF_SMOKE

    out = QUERIES["j29_bloom_semijoin_reduction"](spark, SF_SMOKE)
    import pyspark.sql.functions as F

    orders = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem")
    dim = orders.where(
        (F.col("o_orderpriority") == "1-URGENT")
        & (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    plain = (
        li.join(dim, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.date_trunc("month", "o_orderdate").alias("order_month"))
        .agg(F.count("*").alias("n_items"))
    )
    got = {r["order_month"]: r["n_items"] for r in out.collect()}
    want = {r["order_month"]: r["n_items"] for r in plain.collect()}
    assert got == want and len(got) >= 1


def test_er1_transitivity_and_survivorship(spark):
    """Every planted entity must resolve to ONE cluster of exactly its
    3 records, canonical = the clean record (min rec_id = custkey*4),
    and the canonical name stamped on every member."""
    from ecostream.queries import QUERIES
    from tests.conftest import SF_SMOKE

    rows = QUERIES["er1_entity_resolution"](spark, SF_SMOKE).collect()
    by_entity = {}
    for r in rows:
        by_entity.setdefault(r["entity_id"], []).append(r)
    for eid, members in by_entity.items():
        assert eid % 4 == 0  # canonical is always the clean record
        assert len(members) == 3
        canon = [m for m in members if m["is_canonical"]]
        assert len(canon) == 1 and canon[0]["rec_id"] == eid
        assert {m["canon_name"] for m in members} == {canon[0]["raw_name"]}
