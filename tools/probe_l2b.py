"""Microbench round 2: isolate the cost of the size-guard fallback.

Variants over 300k x dim-64 long rows:
- HOF zip_with/aggregate (the original)
- unrolled left-deep (no guard)
- balanced tree (no guard)
- balanced tree behind when(size==64) with HOF otherwise (the committed form)
- balanced tree via get() + coalesce(HOF) guard
"""
import sys
import time

sys.path.insert(0, ".")
from ecostream.session import get_spark
from pyspark.sql import functions as F

spark = get_spark(app_name="probe-l2b")
spark.sparkContext.setLogLevel("ERROR")

n = 300_000
dim = 64
base = spark.range(n).select(
    "id",
    F.expr(f"transform(sequence(1,{dim}), i -> (id*31 + i*7) % 1000)").alias("a"),
    F.expr(f"transform(sequence(1,{dim}), i -> (id*17 + i*13) % 1000)").alias("b"),
).localCheckpoint()


def timeit(label, col):
    df = base.select(F.sum(col).alias("s"))
    df.collect()
    t0 = time.perf_counter()
    for _ in range(3):
        r = df.collect()[0]["s"]
    dt = (time.perf_counter() - t0) / 3
    print(f"{label:34s} {dt:6.3f}s  sum={r}", flush=True)


hof = F.aggregate(
    F.zip_with("a", "b", lambda x, y: (x - y) * (x - y)),
    F.lit(0).cast("long"),
    lambda acc, x: acc + x,
)

terms = []
for i in range(1, dim + 1):
    d = F.element_at("a", i) - F.element_at("b", i)
    terms.append(d * d)
left = terms[0]
for t in terms[1:]:
    left = left + t

bt = list(terms)
while len(bt) > 1:
    bt = [bt[i] + bt[i + 1] if i + 1 < len(bt) else bt[i] for i in range(0, len(bt), 2)]
balanced = bt[0]

guarded = F.when((F.size("a") == dim) & (F.size("b") == dim), balanced).otherwise(hof)

gterms = []
for i in range(dim):
    d = F.get("a", i) - F.get("b", i)
    gterms.append(d * d)
gbt = list(gterms)
while len(gbt) > 1:
    gbt = [gbt[i] + gbt[i + 1] if i + 1 < len(gbt) else gbt[i] for i in range(0, len(gbt), 2)]
coal = F.coalesce(gbt[0], hof)

timeit("HOF", hof)
timeit("unrolled left-deep", left)
timeit("balanced", balanced)
timeit("balanced + when-guard(HOF)", guarded)
timeit("balanced-get + coalesce(HOF)", coal)
timeit("HOF again", hof)

spark.stop()
