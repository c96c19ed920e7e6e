"""Interleaved same-session A/B for tok3's E-step rewrite (guide §1.3:
cancel host weather by alternating variants in ONE session).

A = the r12 formulation: groupBy(doc_id) + array_sort(collect_list) +
    interpreted Catalyst `aggregate` fold (_UNI_DP) + explode + count.
B = the r13 formulation: repartition + sortWithinPartitions +
    mapInArrow vectorized int64 DP + partial-count sum.

Both run the FULL tok3 query (two E-steps) with the same noop-style
terminal action the bench uses (collect of the small result), A/B/A/B
x N, printing per-run seconds and medians.
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ecostream.queries import tokenizer as tk  # noqa: E402
from ecostream.session import get_spark  # noqa: E402

_UNI_DP = f"""aggregate(ps,
    named_struct('bp', CAST({tk._UNI_INF} AS BIGINT),
                 'pp', CAST(array() AS array<string>),
                 'bc', CAST(0 AS BIGINT),
                 'pc', CAST(array() AS array<string>)),
    (a, x) -> IF(a.bp + x.bcost < a.bc + x.ucost,
        named_struct('bp', a.bc, 'pp', a.pc,
                     'bc', a.bp + x.bcost,
                     'pc', concat(a.pp, array(x.bkey))),
        named_struct('bp', a.bc, 'pp', a.pc,
                     'bc', a.bc + x.ucost,
                     'pc', concat(a.pc, array(x.word))))).pc"""


def old_usage(pos, costs):
    uni = costs.where(F.col("nw") == 1).select(
        F.col("piece").alias("_up"), F.col("cost").alias("ucost")
    )
    bi = costs.where(F.col("nw") == 2).select(
        F.col("piece").alias("_bp"), F.col("cost").alias("bcost")
    )
    j = (
        pos.join(F.broadcast(uni), pos["word"] == uni["_up"])
        .join(F.broadcast(bi), pos["bkey"] == bi["_bp"], "left")
        .select(
            "doc_id",
            "i",
            "word",
            "ucost",
            F.coalesce("bcost", F.lit(tk._UNI_INF)).cast("long").alias("bcost"),
            F.coalesce("bkey", F.lit("")).alias("bkey"),
        )
    )
    per = j.groupBy("doc_id").agg(
        F.expr("array_sort(collect_list(struct(i, ucost, word, bcost, bkey)))")
        .alias("ps")
    )
    seg = per.select(F.expr(_UNI_DP).alias("pieces"))
    return (
        seg.select(F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.count("*").cast("long").alias("used"))
        .localCheckpoint(eager=False)
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    new_usage = tk._uni_viterbi_usage

    def run(tag, fn):
        tk._uni_viterbi_usage = fn
        spark.sparkContext.setJobDescription(f"ab_tok3:{tag}")
        t0 = time.time()
        tk.tok3_unigram_train(spark, sf_dir).collect()
        return time.time() - t0

    # warmup both paths once (JIT, shuffle service, Arrow init)
    run("warmup_old", old_usage)
    run("warmup_new", new_usage)
    a, b = [], []
    try:
        for i in range(n):
            a.append(run("old", old_usage))
            b.append(run("new", new_usage))
            print(
                f"run {i}: old={a[-1]:.3f}s new={b[-1]:.3f}s", flush=True
            )
    finally:
        tk._uni_viterbi_usage = new_usage
    print(
        f"median old={statistics.median(a):.3f}s "
        f"new={statistics.median(b):.3f}s "
        f"speedup={statistics.median(a) / statistics.median(b):.2f}x"
    )


if __name__ == "__main__":
    main()
