"""Dump the RUNTIME-FINAL (post-AQE) physical plan for queries
(VERDICT r12 #7): execute the query, then explain — after execution,
AdaptiveSparkPlan prints `isFinalPlan=true` with the join strategies
AQE actually chose (e.g. SMJ converted to BroadcastHashJoin at
runtime), which the static before/after plan files cannot show.

Usage: python tools/dump_final_plans.py q1,q2[,...] [tag]
Writes plans/r13/<q>_<tag>_final.txt
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    names = sys.argv[1].split(",")
    tag = sys.argv[2] if len(sys.argv) > 2 else "runtime"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import re

    import __spark_entry__ as contract
    from ecostream.session import get_spark

    spark = get_spark(app_name="dump-final-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = contract.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        df.collect()  # drive AQE to the final plan
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = f"plans/r13/{name}_{tag}_final.txt"
        with open(path, "w") as fh:
            fh.write(txt)
        counts = {
            k: len(re.findall(rf"\b{k}\b", txt))
            for k in (
                "SortMergeJoin",
                "BroadcastHashJoin",
                "ShuffledHashJoin",
                "AQEShuffleRead",
            )
        }
        final = "isFinalPlan=true" in txt
        print(f"{name}: final={final} {counts} -> {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
