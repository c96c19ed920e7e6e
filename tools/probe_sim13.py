"""One-off probe: where does sim13's warm wall go?

Runs sim13 warm under the stock session, printing jobs/stages/tasks and
wall per run; optional env knobs let us A/B codegen and AQE cheaply:
  PROBE_CODEGEN=false  -> spark.sql.codegen.wholeStage=false
  PROBE_AQE=false      -> spark.sql.adaptive.enabled=false
  PROBE_SHUFFLE=N      -> spark.sql.shuffle.partitions=N
  PROBE_QUERY=name     -> probe a different query (default sim13)
"""
import os
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as contract
from ecostream.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qname = os.environ.get("PROBE_QUERY", "sim13_nsw_greedy_ann")

spark = get_spark(app_name="probe")
if os.environ.get("PROBE_CODEGEN") == "false":
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
if os.environ.get("PROBE_AQE") == "false":
    spark.conf.set("spark.sql.adaptive.enabled", "false")
if os.environ.get("PROBE_SHUFFLE"):
    spark.conf.set("spark.sql.shuffle.partitions", os.environ["PROBE_SHUFFLE"])
spark.sparkContext.setLogLevel("ERROR")

qs = contract.queries()
qs["a1_total_count"](spark, sf_dir).collect()

sc = spark.sparkContext
tracker = sc.statusTracker()


def run_once(label):
    jobs0 = set(tracker.getJobIdsForGroup(None) or [])
    t0 = time.perf_counter()
    qs[qname](spark, sf_dir).collect()
    wall = time.perf_counter() - t0
    jobs1 = set(tracker.getJobIdsForGroup(None) or [])
    new_jobs = sorted(jobs1 - jobs0)
    n_stages = n_tasks = 0
    for j in new_jobs:
        ji = tracker.getJobInfo(j)
        if ji is None:
            continue
        for s in ji.stageIds:
            si = tracker.getStageInfo(s)
            if si is not None:
                n_stages += 1
                n_tasks += si.numTasks
    print(
        f"{label}: wall={wall:.2f}s jobs={len(new_jobs)} "
        f"stages={n_stages} tasks={n_tasks}",
        flush=True,
    )
    return wall


run_once("prime")
for i in range(3):
    run_once(f"warm{i}")
spark.stop()
