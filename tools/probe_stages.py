"""Probe: stage-level breakdown (name, duration, task time) of one warm run.

Finds where a query's wall goes: heavy tasks, driver gaps, or scheduling.
"""
import os
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as contract
from ecostream.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qname = os.environ.get("PROBE_QUERY", "sim13_nsw_greedy_ann")

import os as _os
_os.environ.setdefault("ECOSTREAM_UI", "1")
from pyspark.sql import SparkSession
from ecostream.streaming.stateful import ensure_protobuf
ensure_protobuf()
cpus = _os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]").appName("probe-stages")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.ui.enabled", "true")
    .config("spark.driver.memory", "8g")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

qs = contract.queries()
qs["a1_total_count"](spark, sf_dir).collect()
qs[qname](spark, sf_dir).collect()  # prime

t0 = time.perf_counter()
qs[qname](spark, sf_dir).collect()
wall = time.perf_counter() - t0
print(f"wall={wall:.2f}s", flush=True)

import json, urllib.request
base = f"http://localhost:4040/api/v1"
apps = json.load(urllib.request.urlopen(base + "/applications"))
appid = apps[0]["id"]
stages = json.load(urllib.request.urlopen(f"{base}/applications/{appid}/stages?status=complete"))
rows = []
import datetime
def ts(s):
    return datetime.datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fGMT").timestamp()
for s in stages:
    try:
        start = ts(s["firstTaskLaunchedTime"]); end = ts(s["completionTime"])
        sub = ts(s["submissionTime"])
    except (KeyError, ValueError):
        continue
    rows.append((sub, end, s["stageId"], end - sub, s["numCompleteTasks"],
                 s["executorRunTime"]/1000.0, s["name"][:70]))
rows.sort(key=lambda r: r[0])
cutoff = max(r[1] for r in rows) - wall - 0.5
rows = [r for r in rows if r[0] >= cutoff]
prev_end = None
print("stageId  dur_s  gap_s  tasks  runtime_s  name")
total_dur = 0.0; total_gap = 0.0
for start, end, sid, dur, ntasks, rt, name in rows:
    gap = (start - prev_end) if prev_end else 0.0
    prev_end = max(prev_end or end, end)
    total_dur += dur; total_gap += max(gap, 0)
    print(f"{sid:7d} {dur:6.2f} {gap:6.2f} {ntasks:6d} {rt:9.2f}  {name}")
print(f"sum stage dur={total_dur:.2f}s  sum gaps={total_gap:.2f}s  wall={wall:.2f}s")
spark.stop()
