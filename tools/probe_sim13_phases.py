"""Phase-by-phase timing of sim13's tower (copy of the query body with
timers around each materialization). One-off measurement probe."""
import math
import os
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ecostream.queries.similarity import _emb, _NSW_NB, _NSW_BEAM, _NSW_ROUNDS, _NSW_NPROBE, dot, norm
from ecostream.queries.similarity import ivf_assign
from ecostream.session import get_spark

sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
from pyspark.sql import SparkSession
from ecostream.streaming.stateful import ensure_protobuf
ensure_protobuf()
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
spark = (
    SparkSession.builder.master(f"local[{cpus}]").appName("probe-sim13-phases")
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

emb = _emb(spark, sf_dir)
emb.count()  # warm


def tick(label, t0):
    t1 = time.perf_counter()
    print(f"{label:24s} {t1 - t0:6.2f}s", flush=True)
    return t1

def phase(label):
    spark.sparkContext.setJobDescription(label)


def noop(df):
    df.write.format("noop").mode("overwrite").save()


for rep in range(2):
    print(f"--- rep {rep}")
    t = time.perf_counter()
    phase("count")
    n = emb.count()
    t = tick("count", t)
    k_cells = max(4, min(n // 128, 4 * math.ceil(math.sqrt(n))))
    b = math.ceil(math.sqrt(k_cells))
    phase("seed")
    init = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k_cells)
        .select("v")
        .collect()
    )
    t = tick("seed collect", t)
    cents = spark.createDataFrame(
        [(i, list(r["v"])) for i, r in enumerate(init)],
        "cent_id long, cv_cent array<double>",
    )
    supers = spark.createDataFrame(
        [(i, list(r["v"])) for i, r in enumerate(init[:b])],
        "cent_id long, cv_cent array<double>",
    )
    cbr = (
        ivf_assign(
            cents.select(F.col("cent_id").alias("vec_id"), F.col("cv_cent").alias("v")),
            supers,
        )
        .select(
            F.col("vec_id").alias("cent_id"),
            F.expr(f"CASE WHEN vec_id < {b} THEN vec_id ELSE cell END").alias("branch"),
        )
        .join(cents, "cent_id")
        .select("branch", "cent_id", "cv_cent")
    )
    vbr = ivf_assign(emb, supers).select("vec_id", "v", F.col("cell").alias("branch"))
    cbr_n = cbr.withColumn("cent_norm", F.greatest(norm(F.col("cv_cent")), F.lit(1e-12)))
    wv = W.partitionBy("vec_id").orderBy(F.desc("cell_sim"), "cell")
    ranked_cells = (
        vbr.join(F.broadcast(cbr_n), "branch")
        .select(
            "vec_id",
            F.col("cent_id").alias("cell"),
            (dot(F.col("v"), F.col("cv_cent")) / F.col("cent_norm")).alias("cell_sim"),
        )
        .withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") <= _NSW_NPROBE)
        .select("vec_id", "cell", "rn")
        .localCheckpoint(eager=False)
    )
    phase("ranked_cells")
    noop(ranked_cells)
    t = tick("ranked_cells", t)
    qq = emb.select(
        "vec_id",
        F.transform("v", lambda x: F.round(x * 1_000_000.0).cast("long")).alias("qv"),
    )
    member = (
        ranked_cells.where(F.col("rn") == 1)
        .join(qq, "vec_id")
        .select("vec_id", "cell", "qv")
        .localCheckpoint(eager=False)
    )
    phase("member")
    noop(member)
    t = tick("member", t)

    def l2sq(a, bcol):
        return F.aggregate(
            F.zip_with(a, bcol, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    mx = member.select(F.col("vec_id").alias("src"), F.col("cell"), F.col("qv").alias("xv"))
    my = member.select(F.col("vec_id").alias("dst"), F.col("cell"), F.col("qv").alias("yv"))
    wk = W.partitionBy("src").orderBy("d", "dst")
    knn = (
        mx.join(my, "cell")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", l2sq("xv", "yv").alias("d"))
        .withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= _NSW_NB)
        .select("src", "dst")
    )
    phase("knn")
    noop(knn)
    t = tick("knn", t)
    edges = (
        knn.union(knn.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    phase("edges")
    noop(edges)
    t = tick("edges(+knn again)", t)
    qv5 = qq.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    we = W.partitionBy("cell").orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    entries = (
        member.withColumn("ern", F.row_number().over(we))
        .where(F.col("ern") == 1)
        .select("cell", F.col("vec_id").alias("entry_id"))
    )
    cand = (
        ranked_cells.where(F.col("vec_id") < 5)
        .join(entries, "cell")
        .select(F.col("vec_id").alias("query_id"), F.col("entry_id").alias("vec_id"))
        .distinct()
    )
    mdist = member.select(F.col("vec_id").alias("vec_id"), F.col("qv").alias("mv"))
    for r in range(_NSW_ROUNDS):
        wb = W.partitionBy("query_id").orderBy("d", "vec_id")
        beam = (
            F.broadcast(cand).join(mdist, "vec_id")
            .join(F.broadcast(qv5), "query_id")
            .select("query_id", "vec_id", l2sq("mv", "qqv").alias("d"))
            .withColumn("rn", F.row_number().over(wb))
            .where(F.col("rn") <= _NSW_BEAM)
            .select("query_id", "vec_id")
        )
        nbrs = F.broadcast(beam).join(edges, beam["vec_id"] == edges["src"]).select(
            "query_id", F.col("dst").alias("vec_id")
        )
        cand = cand.union(nbrs).distinct().localCheckpoint(eager=False)
        phase(f"round{r}")
        noop(cand)
        t = tick(f"round {r}", t)
    wr = W.partitionBy("query_id").orderBy("d", "vec_id")
    final = (
        F.broadcast(cand.where(F.col("vec_id") != F.col("query_id")))
        .join(mdist, "vec_id")
        .join(F.broadcast(qv5), "query_id")
        .select("query_id", "vec_id", l2sq("mv", "qqv").alias("d"))
        .withColumn("rnk", F.row_number().over(wr).cast("long"))
        .where(F.col("rnk") <= 10)
        .select("query_id", F.col("vec_id").alias("match_id"), F.col("d").alias("l2q_dist"), "rnk")
        .orderBy("query_id", "rnk")
    )
    phase("final")
    final.collect()
    t = tick("final", t)

# dump stages of the LAST rep with descriptions
import json, urllib.request, datetime
base = "http://localhost:4040/api/v1"
apps = json.load(urllib.request.urlopen(base + "/applications"))
appid = apps[0]["id"]
stages = json.load(urllib.request.urlopen(f"{base}/applications/{appid}/stages?status=complete&details=false"))
def ts(s):
    return datetime.datetime.strptime(s, "%Y-%m-%dT%H:%M:%S.%fGMT").timestamp()
rows = []
for s in stages:
    try:
        sub = ts(s["submissionTime"]); end = ts(s["completionTime"])
    except (KeyError, ValueError):
        continue
    rows.append((sub, s["stageId"], end - sub, s["numCompleteTasks"], s["executorRunTime"]/1000.0,
                 (s.get("description") or s["name"])[:60]))
rows.sort()
half = rows[len(rows)//2:]
agg = {}
for sub, sid, dur, nt, rt, desc in half:
    a = agg.setdefault(desc, [0.0, 0, 0.0, 0])
    a[0] += dur; a[1] += nt; a[2] += rt; a[3] += 1
print("description: sum_dur_s n_stages n_tasks sum_runtime_s")
for desc, (d, nt, rt, ns) in agg.items():
    print(f"  {desc:30s} dur={d:6.2f} stages={ns:3d} tasks={nt:4d} runtime={rt:6.2f}")
spark.stop()
