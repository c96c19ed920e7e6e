"""Equivalence check: new grouped-pair minhash_lsh_candidates vs the old
self-join formulation, plus d8/d13 rep-predicate equivalence, at two scales."""
import sys
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from ecostream.session import get_spark
from ecostream.queries.text import minhash_lsh_candidates, _docs

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")


def old_pairs(docs, num_perm=64, bands=16, max_bucket_size=64):
    from ecostream.sketches import minhash_signature
    rows_per_band = num_perm // bands
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    shingles = toks.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(size(t) - 1, 1)),"
                    " i -> concat(element_at(t, i), ' ',"
                    " coalesce(element_at(t, i + 1), '')))"
                )
            )
        ).alias("sh"),
    )
    sigs = minhash_signature(shingles, ["doc_id"], F.col("sh"), num_perm=num_perm)
    buckets = sigs.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    b, F.slice("sig", b * rows_per_band + 1, rows_per_band)
                ),
            )
        ).alias("band", "bh"),
    )
    buckets = buckets.persist()
    sizes = buckets.groupBy("band", "bh").agg(F.count("*").alias("_n"))
    buckets = buckets.join(
        F.broadcast(sizes.where(F.col("_n") > max_bucket_size)),
        ["band", "bh"],
        "left_anti",
    )
    a, b_ = buckets.alias("a"), buckets.alias("b")
    return (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .distinct()
    )


for sf in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    docs = _docs(spark, sf)
    new = minhash_lsh_candidates(docs, max_bucket_size=64)
    old = old_pairs(docs)
    n_new = new.count()
    n_old = old.count()
    sym = new.exceptAll(old).count() + old.exceptAll(new).count()
    print(f"{sf}: new={n_new} old={n_old} symdiff={sym}", flush=True)
    assert n_new == n_old and sym == 0, "MISMATCH"

# d8/d13 rep predicate: min!=max vs count_distinct>=2 over the real gram relation
from ecostream.queries.text import _D8_GRAM_SPARK, _D8_N
for sf in ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
    docs = _docs(spark, sf)
    toks = docs.select("doc_id", F.split("text", " ").alias("t")).where(
        F.size("t") >= _D8_N
    )
    g = toks.select("doc_id", F.explode(F.expr(_D8_GRAM_SPARK)).alias("gram"))
    a = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("gram")
    )
    b = (
        g.groupBy("gram")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .where(F.col("d0") != F.col("d1"))
        .select("gram")
    )
    sym = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"{sf}: rep symdiff={sym}", flush=True)
    assert sym == 0
print("ALL OK")
