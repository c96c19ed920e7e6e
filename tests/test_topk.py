"""Property test: the salted two-stage top-k equals the single-window
form on arbitrary inputs (hypothesis drives group shapes, duplicates,
k, and bucket counts)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from pyspark.sql import Window as W
from pyspark.sql import functions as F


rows_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # group
        st.integers(min_value=-50, max_value=50),   # score
        st.integers(min_value=0, max_value=10**6),  # id (tiebreak/salt)
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=15, deadline=None)
@given(rows=rows_strategy, k=st.integers(min_value=1, max_value=5),
       buckets=st.integers(min_value=1, max_value=8))
def test_topk_equals_single_window(spark, rows, k, buckets):
    from ecostream.functions.topk import topk_per_group

    # Dedup ids within a group so ordering is total (deterministic).
    seen, data = set(), []
    for g, s, i in rows:
        if (g, i) not in seen:
            seen.add((g, i))
            data.append((g, s, i))
    df = spark.createDataFrame(data, "g int, score int, id long")
    order = [F.desc("score"), F.col("id")]
    got = sorted(
        (r["g"], r["id"], r["rnk"])
        for r in topk_per_group(
            df, ["g"], order, k=k, salt_col=F.col("id"), buckets=buckets
        ).collect()
    )
    w = W.partitionBy("g").orderBy(*order)
    want = sorted(
        (r["g"], r["id"], r["rnk"])
        for r in df.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .collect()
    )
    assert got == want
