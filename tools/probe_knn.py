"""A/B the sim13 kNN-build stage: HOF l2sq vs unrolled, SMJ vs SHJ,
coalesced vs spread. Input = the real member table shape (2000 rows,
15 cells, dim-64 long arrays)."""
import os
import sys
import time

sys.path.insert(0, ".")
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ecostream.session import get_spark

spark = get_spark(app_name="probe-knn")
spark.sparkContext.setLogLevel("ERROR")

n, dim, ncell = 2000, 64, 15
member = (
    spark.range(n)
    .select(
        F.col("id").alias("vec_id"),
        (F.col("id") % ncell).alias("cell"),
        F.expr(f"transform(sequence(1,{dim}), i -> (id*31 + i*7) % 2000000)").alias("qv"),
    )
    .localCheckpoint()
)


def l2sq_hof(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def l2sq_unrolled(a, b):
    acc = None
    for i in range(1, dim + 1):
        t = (F.element_at(a, i) - F.element_at(b, i)) * (
            F.element_at(a, i) - F.element_at(b, i)
        )
        acc = t if acc is None else acc + t
    return acc


def build(l2sq, join_hint=None, spread=False):
    mx = member.select(F.col("vec_id").alias("src"), "cell", F.col("qv").alias("xv"))
    my = member.select(F.col("vec_id").alias("dst"), "cell", F.col("qv").alias("yv"))
    if join_hint:
        my = my.hint(join_hint)
    j = mx.join(my, "cell").where(F.col("src") != F.col("dst"))
    if spread:
        j = j.repartition("src")
    pairs = j.select("src", "dst", l2sq(F.col("xv"), F.col("yv")).alias("d"))
    wk = W.partitionBy("src").orderBy("d", "dst")
    return (
        pairs.withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= 6)
        .select("src", "dst")
    )


def timeit(label, df):
    df.write.format("noop").mode("overwrite").save()  # prime
    t0 = time.perf_counter()
    for _ in range(3):
        df.write.format("noop").mode("overwrite").save()
    print(f"{label:34s} {(time.perf_counter()-t0)/3:6.2f}s", flush=True)


timeit("HOF + default join", build(l2sq_hof))
timeit("unrolled + default join", build(l2sq_unrolled))
timeit("HOF + shuffle_hash", build(l2sq_hof, "shuffle_hash"))
timeit("unrolled + shuffle_hash", build(l2sq_unrolled, "shuffle_hash"))
timeit("HOF + repartition(src)", build(l2sq_hof, spread=True))
timeit("unrolled + repartition(src)", build(l2sq_unrolled, spread=True))
timeit("HOF + broadcast", build(l2sq_hof, "broadcast"))
timeit("unrolled + broadcast", build(l2sq_unrolled, "broadcast"))
spark.stop()
