"""Interleaved same-session A/B for the ivf_assign narrow-map rewrite
(guide §1.3): OLD = broadcast crossJoin to |cents| rows/vector +
groupBy(vec_id).max(struct) argmax (one full n-row exchange per call);
NEW = 1-row centroid-array broadcast + array_max(transform(...)) narrow
map (no exchange).  Alternates full bench queries A/B/A/B in one
session; collect() terminal like the bench."""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ecostream.queries import similarity as sim  # noqa: E402
from ecostream.queries.registry import QUERIES  # noqa: E402
from ecostream.session import get_spark  # noqa: E402

dot, norm = sim.dot, sim.norm


def old_ivf_assign(emb, centroids):
    cents = centroids.withColumn(
        "cent_norm", F.greatest(norm(F.col("cv_cent")), F.lit(1e-12))
    )
    scored = emb.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "v",
        "cent_id",
        (dot(F.col("v"), F.col("cv_cent")) / F.col("cent_norm")).alias(
            "cent_sim"
        ),
    )
    best = scored.groupBy("vec_id").agg(
        F.first("v").alias("v"),
        F.max(
            F.struct(
                F.col("cent_sim"),
                (-F.col("cent_id")).cast("long").alias("neg_cent"),
            )
        ).alias("m"),
    )
    return best.select("vec_id", "v", (-F.col("m.neg_cent")).alias("cell"))


def old_ivf_assign_within(vec_br, cents_br):
    cents = cents_br.withColumn(
        "cent_norm", F.greatest(norm(F.col("cv_cent")), F.lit(1e-12))
    )
    scored = vec_br.join(F.broadcast(cents), "branch").select(
        "vec_id",
        "v",
        "cent_id",
        (dot(F.col("v"), F.col("cv_cent")) / F.col("cent_norm")).alias(
            "cent_sim"
        ),
    )
    best = scored.groupBy("vec_id").agg(
        F.first("v").alias("v"),
        F.max(
            F.struct(
                F.col("cent_sim"),
                (-F.col("cent_id")).cast("long").alias("neg_cent"),
            )
        ).alias("m"),
    )
    return best.select("vec_id", "v", (-F.col("m.neg_cent")).alias("cell"))


NEW = (sim.ivf_assign, sim.ivf_assign_within)
OLD = (old_ivf_assign, old_ivf_assign_within)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    qnames = (
        sys.argv[2].split(",")
        if len(sys.argv) > 2
        else [
            "sim5_ivf_kmeans_ann",
            "sim5b_ivf_kmeans_md5",
            "sim11_ivf_incremental",
            "semdedup4_two_level_trained",
            "decon2_semantic_overlap",
            "sq1_int8_recall",
        ]
    )
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    def run(q, variant):
        sim.ivf_assign, sim.ivf_assign_within = variant
        spark.sparkContext.setJobDescription(
            f"ab_ivf:{q}:{'new' if variant is NEW else 'old'}"
        )
        t0 = time.time()
        QUERIES[q](spark, sf_dir).collect()
        return time.time() - t0

    try:
        for q in qnames:
            run(q, OLD)
            run(q, NEW)
            a, b = [], []
            for _ in range(n):
                a.append(run(q, OLD))
                b.append(run(q, NEW))
            ma, mb = statistics.median(a), statistics.median(b)
            print(
                f"{q}: old={ma:.3f}s new={mb:.3f}s speedup={ma / mb:.2f}x"
                f"  (old runs {['%.2f' % x for x in a]},"
                f" new runs {['%.2f' % x for x in b]})",
                flush=True,
            )
    finally:
        sim.ivf_assign, sim.ivf_assign_within = NEW


if __name__ == "__main__":
    main()
