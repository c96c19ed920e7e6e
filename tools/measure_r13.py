"""Round-12 measurement harness (guide §1: measure first).

For each headline query (or an explicit list) this:

- captures ``df.explain("formatted")`` to ``plans/r13/<q>_<tag>.txt``;
- times N isolated runs with the SAME action the bench uses
  (``collect()``) plus one noop-sink run (guide §1.4) so the
  computation-only time is on record;
- counts plan features (Exchange, SortMergeJoin, BroadcastHashJoin,
  BatchEvalPython/ArrowEvalPython, WholeStageCodegen spans) from the
  formatted plan text;
- labels jobs via ``setJobDescription`` (guide §1.5);
- records per-query Spark job/stage/task counts from the status
  tracker so "how many jobs does this tower run" is measured, not
  guessed.

Writes one JSON line per query to ``plans/r13/measure_<tag>.jsonl``.

Usage:
    python tools/measure_r13.py <tag> [q1,q2,...] [--runs=N]
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, ".")


def plan_features(txt: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", txt)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", txt)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", txt)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", txt)),
        "bnlj": len(re.findall(r"\bBroadcastNestedLoopJoin\b", txt)),
        "python": len(
            re.findall(r"BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas", txt)
        ),
        "codegen_spans": len(set(re.findall(r"WholeStageCodegen \((\d+)\)", txt))),
        "sorts": len(re.findall(r"\bSort \[", txt)),
        "plan_lines": txt.count("\n"),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = None
    n_runs = 3
    for a in sys.argv[2:]:
        if a.startswith("--runs="):
            n_runs = int(a.split("=", 1)[1])
        elif not a.startswith("--"):
            only = a.split(",")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as contract
    from ecostream.session import get_spark

    import bench

    names = only or list(bench.HEADLINE)
    spark = get_spark(app_name=f"ecostream-measure-{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = contract.queries()
    os.makedirs("plans/r13", exist_ok=True)
    out_path = f"plans/r13/measure_{tag}.jsonl"
    tracker = spark.sparkContext.statusTracker()

    # Warm up session (JVM, codegen, parquet footers) outside timings.
    qs["a1_total_count"](spark, sf_dir).collect()

    with open(out_path, "a") as out:
        for name in names:
            fn = qs[name]
            spark.sparkContext.setJobDescription(f"{name} [{tag}]")
            df = fn(spark, sf_dir)
            ptxt = df._sc is not None and df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(f"plans/r13/{name}_{tag}.txt", "w") as fh:
                fh.write(ptxt)
            feats = plan_features(ptxt)
            # priming run (codegen/planning one-offs) — untimed
            jobs_before = len(tracker.getJobIdsForGroup(None) or [])
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            prime = time.perf_counter() - t0
            times = []
            for _ in range(n_runs):
                t0 = time.perf_counter()
                fn(spark, sf_dir).collect()
                times.append(round(time.perf_counter() - t0, 4))
            # one noop run (guide §1.4): computation-only timing
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            noop = time.perf_counter() - t0
            jobs_after = len(tracker.getJobIdsForGroup(None) or [])
            med = sorted(times)[len(times) // 2]
            rec = {
                "q": name,
                "tag": tag,
                "prime": round(prime, 4),
                "runs": times,
                "median": med,
                "noop": round(noop, 4),
                "jobs_per_run": round((jobs_after - jobs_before) / (n_runs + 2), 1),
                **feats,
            }
            out.write(json.dumps(rec) + "\n")
            out.flush()
            print(json.dumps(rec), flush=True)
            spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()
