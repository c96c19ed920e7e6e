"""Probe: per-job wall breakdown for one query (guide §1/§7).

Times every Spark job (description, duration, tasks) during warm runs of
PROBE_QUERY so we can see whether a query's wall is a few heavy jobs or
many tiny ones, and how much wall falls BETWEEN jobs (driver-side
planning/codegen/checkpoint bookkeeping).

Usage: PROBE_QUERY=name python tools/probe_jobs.py
"""
import os
import sys
import time

sys.path.insert(0, ".")

import __spark_entry__ as contract
from ecostream.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
qname = os.environ.get("PROBE_QUERY", "sim13_nsw_greedy_ann")

spark = get_spark(app_name="probe-jobs")
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

qs = contract.queries()
qs["a1_total_count"](spark, sf_dir).collect()
qs[qname](spark, sf_dir).collect()  # prime

# Listener: record (jobId, submitted_ns, completed_ns, ntasks)
jobs = []
from pyspark import SparkContext


class Listener:
    def onJobStart(self, jobStart):
        jobs.append([jobStart.jobId(), time.perf_counter(), None, 0])

    def onJobEnd(self, jobEnd):
        for j in jobs:
            if j[0] == jobEnd.jobId():
                j[2] = time.perf_counter()

    class Java:
        implements = ["org.apache.spark.scheduler.SparkListenerInterface"]


# Py4J-callback listeners are fragile; use the status tracker + poll instead.
tracker = sc.statusTracker()

t0 = time.perf_counter()
before = set(tracker.getJobIdsForGroup(None) or [])
qs[qname](spark, sf_dir).collect()
wall = time.perf_counter() - t0
after = set(tracker.getJobIdsForGroup(None) or [])

new = sorted(after - before)
total_job = 0.0
rows = []
for j in new:
    ji = tracker.getJobInfo(j)
    if ji is None:
        continue
    stage_time = 0.0
    ntasks = 0
    nstages = 0
    for s in ji.stageIds:
        si = tracker.getStageInfo(s)
        if si is not None:
            nstages += 1
            ntasks += si.numTasks
    rows.append((j, nstages, ntasks))

print(f"wall={wall:.2f}s jobs={len(new)}")
# Per-job wall via the JVM AppStatusStore (has submission/completion ms).
store = sc._jsc.sc().statusStore()
jlist = store.jobsList(None)
it = jlist.iterator()
jvm_jobs = {}
while it.hasNext():
    j = it.next()
    jid = j.jobId()
    if jid in new:
        sub = j.submissionTime()
        comp = j.completionTime()
        if sub.isDefined() and comp.isDefined():
            dur = (comp.get().getTime() - sub.get().getTime()) / 1000.0
            desc = j.description()
            jvm_jobs[jid] = (dur, str(desc.get())[:60] if desc.isDefined() else "")

tot = sum(d for d, _ in jvm_jobs.values())
print(f"sum of job durations: {tot:.2f}s  (gap/driver-side: {wall - tot:.2f}s)")
for jid in sorted(jvm_jobs, key=lambda x: -jvm_jobs[x][0])[:15]:
    dur, desc = jvm_jobs[jid]
    nst = next((r[1] for r in rows if r[0] == jid), "?")
    ntk = next((r[2] for r in rows if r[0] == jid), "?")
    print(f"  job {jid}: {dur:6.3f}s stages={nst} tasks={ntk} {desc}")
spark.stop()
