"""Scaling evidence for the scale-adaptive gates (VERDICT r12 #6).

Builds a deterministic 10x replica of sf0.1 (documents + embeddings,
text perturbed per copy so pair-generating queries stay ~linear),
written as MULTI-FILE parquet so scans arrive well-split — i.e. the
regime where the spread_scan gate and the _cluster_prune pin must turn
OFF — and times gated queries at the core count in $SPARK_GRAFT_CPUS.

Run once with SPARK_GRAFT_CPUS=8 and once with 32; commit both JSON
lines.  Also prints each gate's observed state so the flip itself is
on record, not inferred.

Usage: SPARK_GRAFT_CPUS=N python tools/scale_probe.py [q1,q2,...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

BASE = "/root/testdata/sf0.1"
COPIES = int(os.environ.get("SCALE_COPIES", "10"))
OUT = f"/tmp/ecostream_scale{COPIES}"
STRIDE = 10_000_000

QUERIES = [
    "d13_span_removal_dedup",
    "t9_contamination_overlap",
    "tok3_unigram_train",
    "sim6_pq_adc",
    "semdedup1_cluster_prune",
    "d14_winnowing_pairs",
]


def build(spark) -> None:
    from pyspark.sql import functions as F

    if os.path.exists(os.path.join(OUT, "_BUILT")):
        return
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    parts = []
    for i in range(COPIES):
        parts.append(
            docs.select(
                (F.col("doc_id") + i * STRIDE).alias("doc_id"),
                # per-copy leading token keeps spans/shingles distinct
                # across copies (pair queries stay ~linear) while the
                # word distribution is unchanged up to 1 token/doc
                F.concat(F.lit(f"c{i} "), F.col("text")).alias("text"),
                "source",
                *[c for c in docs.columns if c not in ("doc_id", "text", "source")],
            )
        )
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big.repartition(64).write.mode("overwrite").parquet(
        f"{OUT}/documents.parquet"
    )
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    parts = [
        emb.select(
            (F.col("vec_id") + i * STRIDE).alias("vec_id"),
            *[c for c in emb.columns if c != "vec_id"],
        )
        for i in range(COPIES)
    ]
    bige = parts[0]
    for p in parts[1:]:
        bige = bige.unionByName(p)
    bige.repartition(64).write.mode("overwrite").parquet(
        f"{OUT}/embeddings.parquet"
    )
    open(os.path.join(OUT, "_BUILT"), "w").close()


def main() -> None:
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else QUERIES
    import __spark_entry__ as contract
    from ecostream.schema import load_table
    from ecostream.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app_name=f"scale-probe-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark)
    par = spark.sparkContext.defaultParallelism

    # gate states on THIS input
    docs_parts = load_table(spark, OUT, "documents").rdd.getNumPartitions()
    emb_parts = load_table(spark, OUT, "embeddings").rdd.getNumPartitions()
    n_emb = load_table(spark, OUT, "embeddings").count()
    k_cells = -(-n_emb // 64)  # semdedup1's ceil(n/64)
    gates = {
        "cpus": int(cpus),
        "docs_scan_partitions": docs_parts,
        "emb_scan_partitions": emb_parts,
        "spread_gate_fires_docs": docs_parts < par,
        "spread_gate_fires_emb": emb_parts < par,
        "semdedup1_k_cells": int(k_cells),
        "cluster_prune_pin_fires": k_cells < 4 * par,
    }
    print("GATES " + json.dumps(gates), flush=True)

    qs = contract.queries()
    load_table(spark, OUT, "documents").count()  # warm
    times = {}
    for name in only:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"scale10:{name}")
        fn(spark, OUT).write.format("noop").mode("overwrite").save()  # prime
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, OUT).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        times[name] = sorted(runs)[1]
        print(f"{name}: median {times[name]}s runs {runs}", flush=True)
    print(
        "RESULT "
        + json.dumps({"cpus": int(cpus), "sf": f"sf0.1x{COPIES}", "queries": times})
    )
    spark.stop()


if __name__ == "__main__":
    main()
