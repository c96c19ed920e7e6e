"""Microbench: HOF zip_with/aggregate L2 vs alternative JVM formulations.

265k pairs x dim-64 longs approximates sim13's kNN-build workload.
"""
import sys
import time

sys.path.insert(0, ".")
from ecostream.session import get_spark
from pyspark.sql import functions as F

spark = get_spark(app_name="probe-l2")
spark.sparkContext.setLogLevel("ERROR")

n = 300_000
dim = 64
base = spark.range(n).select(
    "id",
    F.expr(f"transform(sequence(1,{dim}), i -> (id*31 + i*7) % 1000)").alias("a"),
    F.expr(f"transform(sequence(1,{dim}), i -> (id*17 + i*13) % 1000)").alias("b"),
).localCheckpoint()  # materialize inputs so only the distance is timed


def timeit(label, col):
    df = base.select(F.sum(col).alias("s"))
    df.collect()  # prime codegen
    t0 = time.perf_counter()
    for _ in range(3):
        r = df.collect()[0]["s"]
    dt = (time.perf_counter() - t0) / 3
    print(f"{label:28s} {dt:6.3f}s  sum={r}")


hof = F.aggregate(
    F.zip_with("a", "b", lambda x, y: (x - y) * (x - y)),
    F.lit(0).cast("long"),
    lambda acc, x: acc + x,
)
timeit("zip_with+aggregate (HOF)", hof)

# fully unrolled fixed-dim expression (codegen-able, no lambda)
unrolled = None
for i in range(1, dim + 1):
    term = (F.element_at("a", i) - F.element_at("b", i)) * (
        F.element_at("a", i) - F.element_at("b", i)
    )
    unrolled = term if unrolled is None else unrolled + term
timeit("unrolled element_at x64", unrolled)


# emulate sim13's coalesced-to-2-tasks situation
def timeit2(label, col):
    df = base.coalesce(2).select(F.sum(col).alias("s"))
    df.collect()
    t0 = time.perf_counter()
    for _ in range(3):
        r = df.collect()[0]["s"]
    dt = (time.perf_counter() - t0) / 3
    print(f"{label:28s} {dt:6.3f}s  sum={r}")


timeit2("HOF @2 tasks", hof)
timeit2("unrolled @2 tasks", unrolled)

spark.stop()
