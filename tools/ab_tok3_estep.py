"""Isolated E-step A/B: time ONLY _uni_viterbi_usage (old HOF fold vs
new Arrow DP) over a pre-materialized positions+costs input, noop-style
terminal action (count of the vocabulary-sized output), alternating
within one session."""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ecostream.queries import tokenizer as tk  # noqa: E402
from ecostream.schema import load_table  # noqa: E402
from ecostream.session import get_spark  # noqa: E402

from ab_tok3 import old_usage  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 9
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    from ecostream.functions.spread import spread_scan

    docs = spread_scan(load_table(spark, sf_dir, "documents"))
    pos = tk._uni_positions(docs).localCheckpoint()
    seed_uni = pos.groupBy(F.col("word").alias("piece")).agg(
        F.count("*").cast("long").alias("cnt")
    ).select("piece", F.lit(1).alias("nw"), "cnt")
    seed_bi = (
        pos.where(F.col("bkey").isNotNull())
        .groupBy(F.col("bkey").alias("piece"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .select("piece", F.lit(2).alias("nw"), "cnt")
    )
    seed = seed_uni.unionByName(seed_bi)
    tot0 = seed.agg(F.sum("cnt").cast("long").alias("tot"))
    cost0 = (
        seed.crossJoin(F.broadcast(tot0))
        .select(
            "piece",
            "nw",
            (
                -F.round(
                    F.log(F.col("cnt").cast("double") / F.col("tot"))
                    * 1_000_000
                )
            )
            .cast("long")
            .alias("cost"),
        )
        .localCheckpoint()
    )
    print("pos rows:", pos.count(), "cost rows:", cost0.count())

    def run(fn):
        t0 = time.time()
        # count() on the checkpointed output forces full materialization
        fn(pos, cost0).count()
        return time.time() - t0

    run(old_usage)
    run(tk._uni_viterbi_usage)
    a, b = [], []
    for i in range(n):
        a.append(run(old_usage))
        b.append(run(tk._uni_viterbi_usage))
        print(f"run {i}: old={a[-1]:.3f}s new={b[-1]:.3f}s", flush=True)
    print(
        f"median old={statistics.median(a):.3f}s "
        f"new={statistics.median(b):.3f}s "
        f"speedup={statistics.median(a) / statistics.median(b):.2f}x"
    )


if __name__ == "__main__":
    main()
