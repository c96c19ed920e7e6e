"""Similarity search over the embeddings table (BASELINE.json north
star): brute-force cosine top-k as the exact baseline, sign-LSH
(random hyperplane) bucketing as the scale path, and embedding-cosine
near-dup detection.

Representation: ``embedding array<float>`` cast element-wise to double
before any arithmetic (float accumulation drifts ~1e-7; double keeps
the Spark-vs-DuckDB difference at ~1e-15, far inside the round(6)
guard).  All vector math is ``zip_with``/``aggregate``/``transform``
expressions — JVM-side, no Python in the loop.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.topk import topk_per_group
from ..schema import load_table
from .registry import query


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )


def dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a) -> F.Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


_COS_SQL = (
    "list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),"
    " CAST(c.embedding AS DOUBLE[]))"
)


# --- SIM1: brute-force cosine top-k (exact ANN baseline) ---------------------


@query(
    "sim1_cosine_topk",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS match_id,
               ROUND({_COS_SQL}, 6) AS cos_sim
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, match_id) AS rnk
        FROM scored
    )
    SELECT query_id, match_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= 10
    """,
)
def sim1_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-10 cosine neighbors for 5 query vectors: broadcast the
    queries, score every corpus row map-side, per-query top-k via
    window rank.  At 100 TB the corpus side stays partition-parallel;
    only |queries|×k rows survive the rank filter."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("match_id"), F.col("v").alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (norm(F.col("qv")) * norm(F.col("cv"))),
                6,
            ).alias("cos_sim"),
        )
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.desc("cos_sim"), F.col("match_id")],
        k=10,
        salt_col=F.col("match_id"),
    )


# --- SIM2: sign-LSH (random hyperplane) bucketed ANN -------------------------


def plane_weight(p: int, i: int) -> float:
    """Deterministic pseudo-random hyperplane weight in [-1, 1] for
    plane ``p``, dimension ``i`` — md5-derived so it is a plain NUMBER
    both engines share (the weights are inlined as literals into the
    Spark expression AND the DuckDB oracle, making the whole sign-LSH
    pipeline oracle-checkable)."""
    import hashlib

    h = hashlib.md5(f"{p}:{i}".encode()).hexdigest()
    return (int(h[:4], 16) % 2001) / 1000.0 - 1.0


def signlsh_buckets(emb: DataFrame, n_planes: int = 16, dim: int = 64) -> DataFrame:
    """Hash each vector to an n_planes-bit sign signature against
    deterministic pseudo-random hyperplanes (plane p, dim i weight =
    :func:`plane_weight`).  Vectors in the same bucket are ANN
    candidates — the shuffle is on the bucket id, never pairwise."""
    planes = [
        F.array(*[F.lit(plane_weight(p, i)) for i in range(dim)])
        for p in range(n_planes)
    ]
    bucket = F.lit(0).cast("long")
    for p, plane in enumerate(planes):
        bucket = bucket + F.when(dot(F.col("v"), plane) > 0, F.lit(2**p).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return emb.withColumn("bucket", bucket)


def _planes_sql(n_planes: int, dim: int = 64) -> str:
    """DuckDB expression computing the same bucket id as
    :func:`signlsh_buckets` over a DOUBLE[] column ``v``."""
    terms = []
    for p in range(n_planes):
        arr = ", ".join(repr(plane_weight(p, i)) for i in range(dim))
        terms.append(
            f"(CASE WHEN list_dot_product(v, [{arr}]) > 0 "
            f"THEN {2 ** p} ELSE 0 END)"
        )
    return " + ".join(terms)


@query(
    "sim2_signlsh_buckets",
    oracle=f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    )
    SELECT CAST({{bucket}} AS BIGINT) AS bucket, count(*) AS n_vectors
    FROM emb GROUP BY 1 ORDER BY bucket
    """.format(bucket=_planes_sql(8)),
)
def sim2_signlsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared sign-LSH bucketing — oracle-checked: the hyperplane
    weights are shared literals (:func:`plane_weight`), so DuckDB
    recomputes every vector's 8-bit sign signature and the full bucket
    histogram must hash-match.  Bucket sizes show the partition
    balance; ANN recall vs sim1 is property-tested."""
    emb = _emb(spark, sf_dir)
    return (
        signlsh_buckets(emb, n_planes=8)
        .groupBy("bucket")
        .agg(F.count("*").alias("n_vectors"))
        .orderBy("bucket")
    )


@query(
    "sim2_signlsh_ann",
    oracle=f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    bucketed AS (
        SELECT vec_id, v, CAST({{bucket}} AS BIGINT) AS bucket FROM emb
    ),
    q AS (
        SELECT vec_id AS query_id, v AS qv, bucket
        FROM bucketed WHERE vec_id < 5
    ),
    scored AS (
        SELECT q.query_id, c.vec_id AS match_id,
               ROUND(list_cosine_similarity(q.qv, c.v), 6) AS cos_sim
        FROM bucketed c JOIN q ON c.bucket = q.bucket
        WHERE c.vec_id <> q.query_id
    )
    SELECT query_id, match_id, cos_sim, CAST(rn AS BIGINT) AS rnk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, match_id
        ) AS rn FROM scored
    ) WHERE rn <= 10
    """.format(bucket=_planes_sql(4)),
)
def sim2_signlsh_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: exact cosine only within shared LSH buckets —
    the IVF-style scale path (candidates ≈ corpus/2^planes per query).
    Oracle-checked end to end (shared hyperplane literals → DuckDB
    replays bucketing, candidate generation, scoring, and the top-10);
    recall vs the brute-force baseline is property-tested.
    4 planes ⇒ 16 coarse cells at test scale; at real scale raise
    planes with corpus size to keep cells ≈ thousands of vectors."""
    emb = signlsh_buckets(_emb(spark, sf_dir), n_planes=4)
    q = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), "bucket"
    )
    c = emb.select(F.col("vec_id").alias("match_id"), F.col("v").alias("cv"), "bucket")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            F.round(
                dot(F.col("qv"), F.col("cv")) / (norm(F.col("qv")) * norm(F.col("cv"))),
                6,
            ).alias("cos_sim"),
        )
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.desc("cos_sim"), F.col("match_id")],
        k=10,
        salt_col=F.col("match_id"),
    )


# --- SIM3: embedding-cosine near-dup pairs ------------------------------------


@query(
    "sim3_embedding_near_dup",
    oracle=f"""
    SELECT q.vec_id AS a_id, c.vec_id AS b_id,
           ROUND({_COS_SQL}, 6) AS cos_sim
    FROM embeddings q JOIN embeddings c ON q.vec_id < c.vec_id
    WHERE q.vec_id < 100 AND c.vec_id < 100
      AND ROUND({_COS_SQL}, 6) >= 0.6
    """,
)
def sim3_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs above 0.6 (declared form
    bounded to vec_id < 100; the unbounded scale path is sim2's
    bucketed join).  Exact, oracle-checked."""
    emb = _emb(spark, sf_dir).where(F.col("vec_id") < 100)
    a = emb.select(F.col("vec_id").alias("a_id"), F.col("v").alias("av"))
    b = emb.select(F.col("vec_id").alias("b_id"), F.col("v").alias("bv"))
    cos = F.round(
        dot(F.col("av"), F.col("bv")) / (norm(F.col("av")) * norm(F.col("bv"))), 6
    )
    return (
        a.join(F.broadcast(b), F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", cos.alias("cos_sim"))
        .where(F.col("cos_sim") >= 0.6)
    )


# --- SIM4: IVF-style coarse-quantizer ANN ------------------------------------


def _cent_structs(centroids: DataFrame) -> F.Column:
    """Per-centroid struct with the norm precomputed ONCE on the tiny
    model side (saves an O(dim) norm per vector×centroid downstream).
    greatest(.., 1e-12) guards the degenerate all-zeros centroid —
    under ANSI mode a 0 divisor is fatal, and a zero centroid should
    simply never win the argmax (its dot is 0 anyway)."""
    return F.struct(
        F.col("cent_id").cast("long").alias("cent_id"),
        F.col("cv_cent").alias("cv_cent"),
        F.greatest(norm(F.col("cv_cent")), F.lit(1e-12)).alias("cent_norm"),
    )


def _argmax_cell(cents_col) -> F.Column:
    """argmax_c dot(v, c)/|c| over an ARRAY of centroid structs as one
    narrow expression: ``array_max(transform(...))`` on
    struct(cent_sim, -cent_id) — identical ordering semantics (ties →
    lowest centroid id, NaN greatest) to the former
    ``max(struct(...))`` aggregate, with NO per-vector exchange.  The
    vector's own norm is constant per row, so it is dropped from the
    score."""
    return F.array_max(
        F.transform(
            cents_col,
            lambda c: F.struct(
                (dot(F.col("v"), c["cv_cent"]) / c["cent_norm"]).alias(
                    "cent_sim"
                ),
                (-c["cent_id"]).alias("neg_cent"),
            ),
        )
    )


def ivf_assign_narrow(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """:func:`ivf_assign` as a pure NARROW MAP — MEASURED AND NOT WIRED
    (r13; guide §1 measure first).  The centroid table collapses to ONE
    row holding the array of centroid structs, and a 1-row broadcast
    cross join + ``array_max(transform(...))`` scores every centroid
    per vector inline: NO per-vector exchange, bit-identical argmax
    (equivalence test + full IVF-family oracle parity both green).

    Measurements (tools/ab_ivf.py, sf0.1 × 32 cores, interleaved):
    full queries 0.86–1.00x (sim5 0.86, decon2 0.86, semdedup4 0.94,
    sim11 0.98, sq1 1.00) — but isolated assigns show the loss is
    PER-CALL FIXED COST (the model-side agg stage feeding the
    broadcast), not per-row: at 16x rows this path is flat (0.53 →
    0.49 s) while the wired exchange formulation grows (0.49 →
    0.65 s), crossing at ~1.33x by 32 k vectors.  Two reasons the
    exchange formulation stays wired at bench scale: (a) the suite's
    inputs are a few thousand vectors, below the crossover; (b) its
    groupBy exchange doubles as a scan-spread for the downstream
    in-cell folds (the bench parquet is single-row-group), which this
    narrow map would leave serial.  At warehouse scale — well-split
    inputs, vector tables that dwarf the per-call stage cost — this is
    the right shape; swap the wired body for this one when (a)/(b)
    invert.  (A ``coalesce(1)`` on the model side to skip its agg
    exchange was also measured: 0.16x — coalesce propagates UP the
    centroid lineage and serializes the upstream scan.  Keep the plain
    agg.)"""
    cents_one = centroids.select(_cent_structs(centroids).alias("c")).agg(
        F.collect_list("c").alias("_cents")
    )
    best = emb.crossJoin(F.broadcast(cents_one)).select(
        "vec_id", "v", _argmax_cell(F.col("_cents")).alias("m")
    )
    # array_max(empty) is NULL: an empty centroid table assigns nothing,
    # exactly as a crossJoin-with-empty produces zero rows.
    return best.where(F.col("m").isNotNull()).select(
        "vec_id", "v", (-F.col("m.neg_cent")).alias("cell")
    )


def ivf_assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """Assign every vector to its nearest centroid (max cosine) — the
    IVF coarse quantizer.  Centroids broadcast; the argmax is a
    ``max(struct(sim, -cent_id))`` aggregate (ties → lowest centroid),
    so partial aggregation collapses the |centroids| scored rows per
    vector map-side — the exchange carries one row per vector, unlike
    a row_number window which would shuffle and sort all of them.
    (:func:`ivf_assign_narrow` is the measured exchange-free
    alternative for well-split at-scale inputs; see its docstring for
    why the exchange formulation wins at bench scale.)"""
    # argmax_c cos(v, c) = argmax_c dot(v, c)/|c|: the vector's own norm
    # is constant per row, so it is dropped from the score (saves a
    # |centroids|-times-redundant O(dim) norm per row), and |c| is
    # precomputed on the tiny centroid side before the broadcast (the
    # greatest(.., 1e-12) zero-centroid guard lives in _cent_structs).
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
                F.col("cent_sim"), (-F.col("cent_id")).cast("long").alias("neg_cent")
            )
        ).alias("m"),
    )
    return best.select("vec_id", "v", (-F.col("m.neg_cent")).alias("cell"))


def ivf_ann_topk(
    emb: DataFrame,
    centroids: DataFrame,
    nprobe: int = 2,
    k: int = 10,
    assigned: DataFrame | None = None,
) -> DataFrame:
    """IVF probe: corpus partitioned into cells by nearest centroid,
    each query probes its ``nprobe`` closest cells and scores exact
    cosine only within them — candidates ≈ nprobe/|cells| of the
    corpus instead of all of it.  At 100 TB the cells become the
    storage partitioning (cluster-by cell at write), so a probe reads
    only its cells' files.

    ``assigned`` lets callers hand in a PRE-BUILT (vec_id, v, cell)
    index instead of re-assigning — sim11's incrementally-maintained
    index is served exactly as a fresh one is."""
    if assigned is None:
        assigned = ivf_assign(emb, centroids)
    queries_df = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    probe_scored = queries_df.crossJoin(F.broadcast(centroids)).select(
        "query_id",
        "qv",
        "cent_id",
        (
            dot(F.col("qv"), F.col("cv_cent"))
            / (norm(F.col("qv")) * norm(F.col("cv_cent")))
        ).alias("cent_sim"),
    )
    wq = W.partitionBy("query_id").orderBy(F.desc("cent_sim"), "cent_id")
    probes = (
        probe_scored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select("query_id", "qv", F.col("cent_id").alias("cell"))
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            F.round(
                dot(F.col("qv"), F.col("v")) / (norm(F.col("qv")) * norm(F.col("v"))),
                6,
            ).alias("cos_sim"),
        )
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.desc("cos_sim"), F.col("match_id")],
        k=k,
        salt_col=F.col("match_id"),
    )


@query(
    "sim4_ivf_ann",
    oracle="""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    cents AS (SELECT vec_id AS cent_id, v AS cv FROM emb WHERE vec_id < 8),
    assigned AS (
        SELECT vec_id, v, cell FROM (
            SELECT e.vec_id, e.v, c.cent_id AS cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, c.cv)
                                / sqrt(list_dot_product(c.cv, c.cv)) DESC,
                                c.cent_id
                   ) AS rn
            FROM emb e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    queries AS (SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 5),
    probes AS (
        SELECT query_id, qv, cell FROM (
            SELECT q.query_id, q.qv, c.cent_id AS cell,
                   row_number() OVER (
                       PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, c.cv) DESC,
                                c.cent_id
                   ) AS rn
            FROM queries q CROSS JOIN cents c
        ) WHERE rn <= 2
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS match_id,
               ROUND(list_cosine_similarity(p.qv, a.v), 6) AS cos_sim
        FROM probes p JOIN assigned a ON a.cell = p.cell
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, match_id, cos_sim, CAST(rn AS BIGINT) AS rnk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, match_id
        ) AS rn FROM scored
    ) WHERE rn <= 10
    """,
)
def sim4_ivf_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a deterministic coarse quantizer (centroids = the
    first 8 vectors) and nprobe=2.  FULLY oracle-checked: DuckDB's
    list_dot_product / list_cosine_similarity replay the entire IVF
    pipeline — cell assignment (dot/|c| argmax, lowest-id ties), probe
    selection (top-2 cells by cosine), in-cell exact scoring, and the
    per-query top-10 — so the driver hash pins the ANN structure
    end to end, not just row counts.  sim5 (k-means-trained) stays
    rows-only: its centroids depend on distributed float-sum order."""
    emb = _emb(spark, sf_dir)
    centroids = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv_cent")
    )
    return ivf_ann_topk(emb, centroids)


# --- SIM5: k-means-trained IVF ------------------------------------------------


def materialize_training_set(emb: DataFrame) -> DataFrame:
    """Right-size and checkpoint an embedding set that iterative passes
    will re-read: ~1M vectors per partition keeps task count
    proportional to data instead of inheriting the scan's layout, and
    the checkpoint stops every pass re-running the scan + array
    parse."""
    n_vec = emb.count()
    parts = max(1, min(emb.rdd.getNumPartitions(), n_vec // 1_000_000 + 1))
    return emb.coalesce(parts).localCheckpoint(eager=True)


def kmeans_centroids(
    spark: SparkSession,
    emb: DataFrame,
    k: int = 8,
    iters: int = 3,
    materialized: bool = False,
) -> DataFrame:
    """Train IVF centroids with distributed Lloyd's iterations.

    Init: the k hash-lowest vec_ids — deterministic and spread across
    the corpus, found by a per-partition top-k merge (TakeOrdered),
    never a global sort.  Each iteration assigns via :func:`ivf_assign`
    (broadcast centroids, map-side argmax collapse) and recomputes the
    cell means as ONE narrow ``(cell, pos) → avg`` aggregate over
    ``posexplode(v)`` — partial aggregation collapses each input
    partition to ≤ |cells|·dim rows before the exchange, and the plan
    stays O(1) wide (a dim-wide ``F.avg`` array aggregate re-pays
    whole-stage codegen compilation on every iteration's new centroid
    literals — measured 3× slower at dim=64).  The k × dim model
    round-trips through the driver between iterations (it IS the
    model, not data — the same shape MLlib's k-means uses).  Empty
    cells keep their previous centroid."""
    # One materialization feeds all Lloyd passes (init + iters scans);
    # without it every iteration re-runs the scan + array parse.  The
    # checkpoint also right-sizes partitioning for the per-iteration
    # jobs: ~1M vectors per partition keeps task count proportional to
    # data instead of inheriting the scan's layout (at bench scale the
    # whole training set is a handful of partitions, so the 3×
    # iteration loop pays 3 small jobs, not 3×32 near-empty tasks).
    # ``materialized=True`` skips this when the caller already did it
    # (sim5 shares one materialization between training and probe).
    if not materialized:
        emb = materialize_training_set(emb)
    init = (
        emb.orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(k)
        .select("v")
        .collect()
    )
    cur = [(cid, list(r["v"])) for cid, r in enumerate(init)]
    dim = len(cur[0][1])
    schema = "cent_id long, cv_cent array<double>"
    for _ in range(iters):
        centroids = spark.createDataFrame(cur, schema)
        means: dict[int, list] = {}
        for r in (
            ivf_assign(emb, centroids)
            .select("cell", F.posexplode("v").alias("pos", "x"))
            .groupBy("cell", "pos")
            .agg(F.avg("x").alias("m"))
            .collect()
        ):
            means.setdefault(int(r["cell"]), [0.0] * dim)[r["pos"]] = r["m"]
        cur = [(cid, means.get(cid, cv)) for cid, cv in cur]
    return spark.createDataFrame(cur, schema)


_KMB_K = 8
_KMB_ITERS = 3
_QSCALE = 1_000_000.0


def kmeans_centroids_portable(
    spark: SparkSession,
    emb: DataFrame,
    k: int = _KMB_K,
    iters: int = _KMB_ITERS,
    materialized: bool = False,
) -> DataFrame:
    """Engine-portable Lloyd's iterations (the sim5b twin of
    :func:`kmeans_centroids`, same twin device as d3 → d3b):

    - init = the ``k`` md5-lowest vec_ids (portable hash order, not
      xxhash64);
    - cell means via INTEGER-quantized sums: each component is rounded
      to ``round(x·1e6)`` as a BIGINT, summed exactly (order-free, no
      float drift), and the mean is re-derived as ``sum/(count·1e6)``
      — one IEEE division both engines perform identically.

    The trained centroids are therefore bit-identical across engines
    and partitionings, which is what lets the DuckDB oracle replay the
    ENTIRE training loop; the float-avg production path (sim5) keeps
    its rows-only declaration."""
    if not materialized:
        emb = materialize_training_set(emb)
    init = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k)
        .select("v")
        .collect()
    )
    cur = [(cid, list(r["v"])) for cid, r in enumerate(init)]
    dim = len(cur[0][1])
    schema = "cent_id long, cv_cent array<double>"
    qx = F.transform("v", lambda x: F.round(x * _QSCALE).cast("long"))
    for _ in range(iters):
        centroids = spark.createDataFrame(cur, schema)
        # DECIMAL(38,0) sum: exact and overflow-proof at any cell size
        # (a long sum wraps past ~9e18); the oracle's HUGEINT matches.
        sums = (
            ivf_assign(emb, centroids)
            .select("cell", F.posexplode(qx).alias("pos", "qx"))
            .groupBy("cell", "pos")
            .agg(
                F.sum(F.col("qx").cast("decimal(38,0)")).alias("s"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        means: dict[int, list] = {}
        for r in sums:
            means.setdefault(int(r["cell"]), [0.0] * dim)[r["pos"]] = (
                float(r["s"]) / (r["n"] * _QSCALE)
            )
        cur = [(cid, means.get(cid, cv)) for cid, cv in cur]
    return spark.createDataFrame(cur, schema)


def _sim5b_oracle(
    k: int = _KMB_K,
    iters: int = _KMB_ITERS,
    k_sql: str | None = None,
    source_sql: str = "embeddings",
) -> str:
    """DuckDB replay of the FULL portable k-means IVF pipeline: init →
    ``iters`` × (assign, exact-quantized mean) → final assignment →
    probe → per-query top-10.  MATERIALIZED CTEs stop DuckDB from
    re-inlining each iteration's inputs exponentially.  ``k_sql``
    (a scalar-subquery string) replaces the literal ``k`` in the init
    LIMIT so callers can derive k from corpus size inside the oracle
    itself (semdedup2's scale-wired k); ``source_sql`` swaps the
    training relation (semdedup4 trains on a bounded md5-sample
    subquery instead of the whole table)."""

    def assign(t: int) -> str:
        return f""",
    a{t} AS MATERIALIZED (
        SELECT vec_id, v, q, cell FROM (
            SELECT e.vec_id, e.v, e.q, c.cent_id AS cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, c.cv)
                                / sqrt(list_dot_product(c.cv, c.cv)) DESC,
                                c.cent_id
                   ) AS rn
            FROM qe e CROSS JOIN c{t - 1} c
        ) WHERE rn = 1
    )"""

    parts = [
        f"""
    WITH emb AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM {source_sql}
    ),
    qe AS MATERIALIZED (
        SELECT vec_id, v,
               list_transform(v, x -> CAST(round(x * 1000000.0) AS BIGINT)) AS q
        FROM emb
    ),
    c0 AS MATERIALIZED (
        SELECT row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) - 1 AS cent_id,
               v AS cv
        FROM emb ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT {k_sql or k}
    )"""
    ]
    for t in range(1, iters + 1):
        parts.append(assign(t))
        parts.append(
            f""",
    c{t} AS MATERIALIZED (
        SELECT c{t - 1}.cent_id, COALESCE(l.cv_new, c{t - 1}.cv) AS cv
        FROM c{t - 1} LEFT JOIN (
            SELECT cell, list(mval ORDER BY pos) AS cv_new FROM (
                SELECT cell, pos,
                       CAST(SUM(qx) AS DOUBLE) / (COUNT(*) * 1000000.0) AS mval
                FROM (
                    SELECT cell, UNNEST(q) AS qx,
                           UNNEST(range(1, len(q) + 1)) AS pos
                    FROM a{t}
                ) GROUP BY cell, pos
            ) GROUP BY cell
        ) l ON l.cell = c{t - 1}.cent_id
    )"""
        )
    parts.append(assign(iters + 1))
    parts.append(
        f""",
    queries AS (SELECT vec_id AS query_id, v AS quv FROM emb WHERE vec_id < 5),
    probes AS (
        SELECT query_id, quv, cell FROM (
            SELECT q2.query_id, q2.quv, c.cent_id AS cell,
                   row_number() OVER (
                       PARTITION BY q2.query_id
                       ORDER BY list_cosine_similarity(q2.quv, c.cv) DESC,
                                c.cent_id
                   ) AS rn
            FROM queries q2 CROSS JOIN c{iters} c
        ) WHERE rn <= 2
    ),
    scored AS (
        SELECT p.query_id, a.vec_id AS match_id,
               ROUND(list_cosine_similarity(p.quv, a.v), 6) AS cos_sim
        FROM probes p JOIN a{iters + 1} a ON a.cell = p.cell
        WHERE a.vec_id <> p.query_id
    )
    SELECT query_id, match_id, cos_sim, CAST(rn AS BIGINT) AS rnk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, match_id
        ) AS rn FROM scored
    ) WHERE rn <= 10
    """
    )
    return "".join(parts)


@query("sim5b_ivf_kmeans_md5", oracle=_sim5b_oracle())
def sim5b_ivf_kmeans_md5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over PORTABLY-trained k-means centroids: identical
    mechanism to sim5 (same Lloyd loop, same probe), with md5-ordered
    init and integer-quantized exact means so the DuckDB oracle replays
    training end to end — init choice, every assignment round, every
    centroid update, probe selection, and the final top-10 are all
    hash-checked.  sim5 remains the xxhash64/float-avg production path
    (rows-only), exactly as d3 keeps xxhash64 beside the d3b md5 twin."""
    emb = materialize_training_set(_emb(spark, sf_dir))
    cents = kmeans_centroids_portable(spark, emb, materialized=True)
    return ivf_ann_topk(emb, cents)


@query("sim5_ivf_kmeans_ann")
def sim5_ivf_kmeans_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over k-means-trained centroids (k=8, 3 Lloyd
    iterations): the full scale path — trained cells balance the
    inverted lists far better than first-K seeding, which is what
    keeps per-probe candidate counts bounded at 100 TB.  rows-only:
    float-sum ordering inside the distributed avg makes exact centroid
    bits run-dependent; structure is pinned by the probed-cell
    equality test and the quantization-objective test."""
    # One shared materialization: training's 3 Lloyd passes AND the
    # probe's assignment pass all read it (the probe otherwise re-runs
    # the scan + array parse a 5th time).
    emb = materialize_training_set(_emb(spark, sf_dir))
    cents = kmeans_centroids(spark, emb, k=8, iters=3, materialized=True)
    return ivf_ann_topk(emb, cents)


# --- SIM6: product quantization + asymmetric-distance (ADC) probe ------------

_PQ_M = 16         # subspaces (dim 64 -> 16 x 4)
_PQ_SUBDIM = 4
_PQ_K = 16         # codewords per subspace (64-bit code per vector)
_PQ_QSCALE = 1_000_000.0


def _pq_oracle(m: int = _PQ_M, sd: int = _PQ_SUBDIM, k: int = _PQ_K) -> str:
    """DuckDB replay of the FULL PQ pipeline: codebook sampling ->
    per-subspace encoding (argmin of exact integer L2^2) -> ADC lookup
    tables -> summed approximate distances -> per-query top-10."""
    return f"""
    WITH emb AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS MATERIALIZED (
        SELECT vec_id,
               list_transform(v, x -> CAST(round(x * {_PQ_QSCALE}) AS BIGINT))
                   AS qv
        FROM emb
    ),
    cb AS (
        SELECT row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) - 1 AS cent_id, qv
        FROM q ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT {k}
    ),
    subs AS (SELECT UNNEST(generate_series(0, {m - 1})) AS sub_id),
    cw AS MATERIALIZED (
        SELECT cent_id, sub_id,
               list_slice(qv, sub_id * {sd} + 1, sub_id * {sd} + {sd}) AS cq
        FROM cb CROSS JOIN subs
    ),
    esub AS MATERIALIZED (
        SELECT vec_id, sub_id,
               list_slice(qv, sub_id * {sd} + 1, sub_id * {sd} + {sd}) AS eq
        FROM q CROSS JOIN subs
    ),
    codes AS MATERIALIZED (
        SELECT vec_id, sub_id, cent_id AS code FROM (
            SELECT e.vec_id, e.sub_id, c.cent_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id, e.sub_id
                       ORDER BY CAST(list_sum(list_transform(
                           generate_series(1, {sd}),
                           i -> (e.eq[i] - c.cq[i]) * (e.eq[i] - c.cq[i])
                       )) AS BIGINT), c.cent_id
                   ) AS rn
            FROM esub e JOIN cw c ON c.sub_id = e.sub_id
        ) WHERE rn = 1
    ),
    lut AS (
        SELECT e.vec_id AS query_id, c.sub_id, c.cent_id,
               CAST(list_sum(list_transform(
                   generate_series(1, {sd}),
                   i -> (e.eq[i] - c.cq[i]) * (e.eq[i] - c.cq[i])
               )) AS BIGINT) AS d
        FROM esub e JOIN cw c ON c.sub_id = e.sub_id
        WHERE e.vec_id < 5
    ),
    adc AS (
        SELECT l.query_id, cd.vec_id AS match_id,
               CAST(SUM(l.d) AS BIGINT) AS adc_dist
        FROM codes cd
        JOIN lut l ON l.sub_id = cd.sub_id AND l.cent_id = cd.code
        GROUP BY l.query_id, cd.vec_id
    )
    SELECT query_id, match_id, adc_dist, CAST(rn AS BIGINT) AS rnk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc_dist, match_id
        ) AS rn
        FROM adc WHERE match_id <> query_id
    ) WHERE rn <= 10
    """


@query("sim6_pq_adc", oracle=_pq_oracle())
def sim6_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization ANN (Jegou et al., "Product Quantization
    for Nearest Neighbor Search", TPAMI 2011): split each vector into
    16 x 4-dim subvectors, encode each against a 16-codeword codebook
    (sampled as the md5-lowest vectors — the portable-init device of
    sim5b), and answer queries by ASYMMETRIC DISTANCE: a 16x16 lookup
    table of exact query-to-codeword distances per query, summed along
    each database vector's 16 codes (a 64-bit code per vector; many
    narrow subspaces beat few wide ones at a fixed bit budget —
    measured recall@10 roughly 4/10 on these UNIFORM random vectors,
    the hardest case for any quantizer, vs 1/10 at 4x16-dim;
    tests/test_similarity.py pins a floor).  PQ is the memory side of the ANN
    trade-off the IVF queries (sim4/sim5) cover on the partition side:
    n vectors compress to n x 16 four-bit codes (64 bits/vector) plus
    a constant codebook.

    Portability: components are integer-quantized (round(x*1e6), the
    sim5b device) so every L2^2 is an exact BIGINT in both engines —
    encoding argmins, LUTs, and ADC sums are bit-identical, which is
    what lets the oracle replay the entire pipeline.

    Plan shape at 100 TB: the codebook is a 256-row broadcast (model,
    not data); encoding is one partial-aggregated shuffle of n x m x k
    candidate rows collapsing to n x m codes (map-side min); the probe
    touches only codes — a broadcast of the 1280-row LUT joined map-side,
    one (query, vec) sum, and a per-query top-10.  No full-precision
    vector is read at query time — that is the point of PQ."""
    from ..functions.spread import spread_scan

    # The n×m×k encode argmin and both LUT joins are map-side work over
    # an under-split scan (guide §2.5): spread it so the quantize +
    # encode fold runs at session width instead of one task (probe:
    # a 0.8 s single-task encode job at sf0.1).  No-op at scale.
    emb = spread_scan(_emb(spark, sf_dir))
    qv = F.transform("v", lambda x: F.round(x * _PQ_QSCALE).cast("long"))
    q = emb.select("vec_id", qv.alias("qv"))

    # Codebook: md5-lowest K vectors, split into per-subspace codewords.
    cb_rows = (
        q.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_PQ_K)
        .select("qv")
        .collect()
    )
    cw_rows = [
        (cid, s, list(r["qv"][s * _PQ_SUBDIM : (s + 1) * _PQ_SUBDIM]))
        for cid, r in enumerate(cb_rows)
        for s in range(_PQ_M)
    ]
    cw = emb.sparkSession.createDataFrame(
        cw_rows, "cent_id long, sub_id int, cq array<long>"
    )

    # Subvector rows: map-side explode, no shuffle.
    esub = q.select(
        "vec_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, {_PQ_M - 1}), s -> "
                f"struct(s AS sub_id, "
                f"slice(qv, s * {_PQ_SUBDIM} + 1, {_PQ_SUBDIM}) AS eq))"
            )
        ).alias("p"),
    ).select("vec_id", F.col("p.sub_id").alias("sub_id"), F.col("p.eq").alias("eq"))

    def l2sq(a: str, b: str) -> F.Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # Encode: argmin codeword per (vector, subspace); min(struct) keeps
    # the (distance, cent_id) tiebreak and partial-aggregates map-side.
    cand = esub.join(F.broadcast(cw), "sub_id").select(
        "vec_id", "sub_id", "cent_id", l2sq("eq", "cq").alias("d")
    )
    codes = (
        cand.groupBy("vec_id", "sub_id")
        .agg(F.min(F.struct("d", "cent_id")).alias("m"))
        .select("vec_id", "sub_id", F.col("m.cent_id").alias("code"))
    )

    # ADC lookup tables for the 5 query vectors: 16 x 16 exact distances.
    lut = (
        esub.where(F.col("vec_id") < 5)
        .withColumnRenamed("vec_id", "query_id")
        .join(F.broadcast(cw), "sub_id")
        .select("query_id", "sub_id", "cent_id", l2sq("eq", "cq").alias("d"))
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes["sub_id"] == lut["sub_id"]) & (codes["code"] == lut["cent_id"]),
        )
        .groupBy("query_id", F.col("vec_id").alias("match_id"))
        .agg(F.sum("d").cast("long").alias("adc_dist"))
        .where(F.col("match_id") != F.col("query_id"))
    )
    w = W.partitionBy("query_id").orderBy("adc_dist", "match_id")
    return (
        adc.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= 10)
        .select("query_id", "match_id", "adc_dist", "rnk")
    )


# --- SIM12: composed IVF-PQ (coarse cells + PQ-coded residuals) ---------------
#
# The production FAISS index (IndexIVFPQ): a coarse quantizer routes
# each vector to a cell, the RESIDUAL vector-minus-centroid is PQ-coded
# against that cell's own codebooks, and a query probes its nprobe
# nearest cells with an ADC table built from the QUERY residual per
# probed cell.  sim4 (flat IVF) and sim6 (flat PQ) are the two halves;
# this composes them.  Residual coding is what makes the composition
# worth it: residuals concentrate near zero, so a fixed bit budget
# quantizes them with far less error than raw vectors (Jegou et al.
# 2011 §IV.B).  Everything runs in the integer-quantized space
# (round(x*1e6) -> BIGINT), so assignments, codes, LUTs, and ADC sums
# are exact and the DuckDB oracle replays the ENTIRE index build +
# probe bit-for-bit.

_IVFPQ_CELLS = 8
_IVFPQ_NPROBE = 2
_IVFPQ_M = 16
_IVFPQ_SD = 4
_IVFPQ_K = 16


def _ivfpq_oracle(
    cells: int = _IVFPQ_CELLS,
    nprobe: int = _IVFPQ_NPROBE,
    m: int = _IVFPQ_M,
    sd: int = _IVFPQ_SD,
    k: int = _IVFPQ_K,
) -> str:
    dim = m * sd
    l2_64 = (
        f"CAST(list_sum(list_transform(generate_series(1, {dim}),"
        f" i -> (a.qv[i] - c.qc[i]) * (a.qv[i] - c.qc[i]))) AS BIGINT)"
    )
    l2_sub = (
        f"CAST(list_sum(list_transform(generate_series(1, {sd}),"
        f" i -> (e.eq[i] - c.cq[i]) * (e.eq[i] - c.cq[i]))) AS BIGINT)"
    )
    return f"""
    WITH emb AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    q AS MATERIALIZED (
        SELECT vec_id,
               list_transform(v, x -> CAST(round(x * {_PQ_QSCALE}) AS BIGINT))
                   AS qv
        FROM emb
    ),
    cents AS MATERIALIZED (
        SELECT vec_id AS cell, qv AS qc FROM q WHERE vec_id < {cells}
    ),
    asg AS MATERIALIZED (
        SELECT vec_id, qv, cell, qc FROM (
            SELECT a.vec_id, a.qv, c.cell, c.qc,
                   row_number() OVER (
                       PARTITION BY a.vec_id ORDER BY {l2_64}, c.cell
                   ) AS rn
            FROM q a CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    res AS MATERIALIZED (
        SELECT vec_id, cell,
               list_transform(generate_series(1, {dim}),
                              i -> qv[i] - qc[i]) AS rv
        FROM asg
    ),
    subs AS (SELECT UNNEST(generate_series(0, {m - 1})) AS sub_id),
    cb AS (
        SELECT cell, rk - 1 AS cent_id, rv FROM (
            SELECT cell, rv,
                   row_number() OVER (
                       PARTITION BY cell
                       ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
                   ) AS rk
            FROM res
        ) WHERE rk <= {k}
    ),
    cw AS MATERIALIZED (
        SELECT cell, cent_id, sub_id,
               list_slice(rv, sub_id * {sd} + 1, sub_id * {sd} + {sd}) AS cq
        FROM cb CROSS JOIN subs
    ),
    esub AS MATERIALIZED (
        SELECT vec_id, cell, sub_id,
               list_slice(rv, sub_id * {sd} + 1, sub_id * {sd} + {sd}) AS eq
        FROM res CROSS JOIN subs
    ),
    codes AS MATERIALIZED (
        SELECT vec_id, cell, sub_id, cent_id AS code FROM (
            SELECT e.vec_id, e.cell, e.sub_id, c.cent_id,
                   row_number() OVER (
                       PARTITION BY e.vec_id, e.sub_id
                       ORDER BY {l2_sub}, c.cent_id
                   ) AS rn
            FROM esub e JOIN cw c ON c.cell = e.cell AND c.sub_id = e.sub_id
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT query_id, cell,
               list_transform(generate_series(1, {dim}),
                              i -> pqv[i] - qc[i]) AS qr
        FROM (
            SELECT a.vec_id AS query_id, a.qv AS pqv, c.cell, c.qc,
                   row_number() OVER (
                       PARTITION BY a.vec_id ORDER BY {l2_64}, c.cell
                   ) AS rn
            FROM q a CROSS JOIN cents c WHERE a.vec_id < 5
        ) WHERE rn <= {nprobe}
    ),
    lut AS (
        SELECT e.query_id, c.cell, c.sub_id, c.cent_id, {l2_sub} AS d
        FROM (
            SELECT query_id, cell, sub_id,
                   list_slice(qr, sub_id * {sd} + 1, sub_id * {sd} + {sd})
                       AS eq
            FROM probes CROSS JOIN subs
        ) e
        JOIN cw c ON c.cell = e.cell AND c.sub_id = e.sub_id
    ),
    adc AS (
        SELECT l.query_id, cd.vec_id AS match_id,
               CAST(SUM(l.d) AS BIGINT) AS adc_dist
        FROM codes cd
        JOIN lut l ON l.cell = cd.cell AND l.sub_id = cd.sub_id
                  AND l.cent_id = cd.code
        GROUP BY 1, 2
    )
    SELECT query_id, match_id, adc_dist, CAST(rn AS BIGINT) AS rnk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY adc_dist, match_id
        ) AS rn
        FROM adc WHERE match_id <> query_id
    ) WHERE rn <= 10
    """


@query("sim12_ivfpq_ann", oracle=_ivfpq_oracle())
def sim12_ivfpq_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed IVF-PQ ANN (FAISS IndexIVFPQ; Jegou et al. 2011 §V):
    a deterministic coarse quantizer (the {cells} lowest vec_ids,
    integer-quantized — sim4's device) routes every vector to its
    exact-L2-nearest cell; the cell RESIDUAL is product-quantized
    against PER-CELL codebooks ({m} x {sd}-dim subspaces, {k}
    codewords each, sampled as the cell's md5-lowest members — sim5b's
    portable-init device); a query probes its {nprobe} L2-nearest
    cells and scores by asymmetric distance with a LUT built from the
    QUERY residual per probed cell, so full-precision vectors are
    never read at probe time.

    All arithmetic is exact BIGINT in the round(x*1e6) space (the
    sim6 device): cell argmins, residuals, code argmins, LUTs, and
    ADC sums are bit-identical across engines, which is what lets the
    oracle replay the whole index — the driver hash pins coarse
    routing, per-cell codebooks, codes, and the probe end to end.

    Plan shape at 100 TB: the coarse table is a {cells}-row broadcast;
    assignment partial-aggregates the per-cell scores map-side (one
    exchange carrying one row per vector); the per-cell codebook is a
    window top-{k} per cell (model-sized result, <= {cells}*{k}*{m}
    rows) that BROADCASTS back; encoding is one broadcast join +
    map-side argmin collapse; the probe touches only codes — a
    model-sized LUT broadcast, one (query, vec) partial-aggregated
    sum, and a per-query top-10.  Cells become the storage
    partitioning at scale (cluster-by cell), exactly as sim4 documents.

    Reference analog: none (extends the similarity family, SURVEY
    §2.13); closes the composed-index gap VERDICT r9 #3 names."""
    # NOTE (r13): the sim6 spread gate was A/B-tested here too and
    # measured WORSE (2.76 → 3.18 s median) — sim12's per-stage work is
    # dominated by the per-cell codebook windows and broadcast builds,
    # not the map-side encode, so the extra exchange only added stages.
    # Left on the scan layout (the a6/lm2/bpe1 verdict).
    emb = _emb(spark, sf_dir)
    qv = F.transform("v", lambda x: F.round(x * _PQ_QSCALE).cast("long"))
    q = emb.select("vec_id", qv.alias("qv"))
    cents = q.where(F.col("vec_id") < _IVFPQ_CELLS).select(
        F.col("vec_id").alias("cell"), F.col("qv").alias("qc")
    )

    def l2sq(a: str, b: str) -> F.Column:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    # Coarse assignment: broadcast cells, narrow min(struct) argmin
    # (exchange carries one (vec, cell) row per vector), then one
    # broadcast rejoin attaches the winning centroid for the residual.
    scored = q.join(F.broadcast(cents)).select(
        "vec_id", "qv", "cell", l2sq("qv", "qc").alias("d")
    )
    best = (
        scored.groupBy("vec_id")
        .agg(F.first("qv").alias("qv"), F.min(F.struct("d", "cell")).alias("m"))
        .select("vec_id", "qv", F.col("m.cell").alias("cell"))
    )
    res = (
        best.join(F.broadcast(cents), "cell")
        .select(
            "vec_id",
            "cell",
            F.zip_with("qv", "qc", lambda a, b: a - b).alias("rv"),
        )
        # Two consumers (codebook window + encoding explode): cut
        # lineage so assignment runs once.
        .localCheckpoint(eager=False)
    )

    # Per-cell codebooks: the cell's K md5-lowest member residuals,
    # split into M subspace codewords.  Model-sized (<= cells*K*M
    # rows) -> broadcast into the encode and LUT joins.
    w_cell = W.partitionBy("cell").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    sub_split = (
        f"transform(sequence(0, {_IVFPQ_M - 1}), s -> struct(s AS sub_id,"
        f" slice(rv, s * {_IVFPQ_SD} + 1, {_IVFPQ_SD}) AS piece))"
    )
    cw = (
        res.withColumn("rk", F.row_number().over(w_cell))
        .where(F.col("rk") <= _IVFPQ_K)
        .select(
            "cell",
            (F.col("rk") - 1).cast("long").alias("cent_id"),
            F.explode(F.expr(sub_split)).alias("p"),
        )
        .select(
            "cell",
            "cent_id",
            F.col("p.sub_id").alias("sub_id"),
            F.col("p.piece").alias("cq"),
        )
    )
    esub = res.select(
        "vec_id",
        "cell",
        F.explode(F.expr(sub_split)).alias("p"),
    ).select(
        "vec_id",
        "cell",
        F.col("p.sub_id").alias("sub_id"),
        F.col("p.piece").alias("eq"),
    )
    codes = (
        esub.join(F.broadcast(cw), ["cell", "sub_id"])
        .select("vec_id", "cell", "sub_id", "cent_id", l2sq("eq", "cq").alias("d"))
        .groupBy("vec_id", "cell", "sub_id")
        .agg(F.min(F.struct("d", "cent_id")).alias("m"))
        .select("vec_id", "cell", "sub_id", F.col("m.cent_id").alias("code"))
    )

    # Probe: nprobe L2-nearest cells per query; LUT from the QUERY
    # residual against each probed cell's codebooks (model-sized).
    qs = q.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("pqv")
    )
    pscored = qs.join(F.broadcast(cents)).select(
        "query_id", "pqv", "cell", "qc", l2sq("pqv", "qc").alias("d")
    )
    wq = W.partitionBy("query_id").orderBy("d", "cell")
    probes = (
        pscored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= _IVFPQ_NPROBE)
        .select(
            "query_id",
            "cell",
            F.zip_with("pqv", "qc", lambda a, b: a - b).alias("rv"),
        )
    )
    lut = (
        probes.select(
            "query_id", "cell", F.explode(F.expr(sub_split)).alias("p")
        )
        .select(
            "query_id",
            "cell",
            F.col("p.sub_id").alias("sub_id"),
            F.col("p.piece").alias("eq"),
        )
        .join(F.broadcast(cw), ["cell", "sub_id"])
        .select(
            "query_id", "cell", "sub_id", "cent_id", l2sq("eq", "cq").alias("d")
        )
    )
    adc = (
        codes.join(
            F.broadcast(lut),
            (codes["cell"] == lut["cell"])
            & (codes["sub_id"] == lut["sub_id"])
            & (codes["code"] == lut["cent_id"]),
        )
        .groupBy("query_id", F.col("vec_id").alias("match_id"))
        .agg(F.sum("d").cast("long").alias("adc_dist"))
        .where(F.col("match_id") != F.col("query_id"))
    )
    wr = W.partitionBy("query_id").orderBy("adc_dist", "match_id")
    return (
        adc.withColumn("rnk", F.row_number().over(wr).cast("long"))
        .where(F.col("rnk") <= 10)
        .select("query_id", "match_id", "adc_dist", "rnk")
    )


sim12_ivfpq_ann.__doc__ = sim12_ivfpq_ann.__doc__.format(
    cells=_IVFPQ_CELLS,
    nprobe=_IVFPQ_NPROBE,
    m=_IVFPQ_M,
    sd=_IVFPQ_SD,
    k=_IVFPQ_K,
)


# --- SIM13: graph-ANN baseline (navigable kNN graph + greedy beam search) ------
#
# The graph family (NSW/HNSW — Malkov & Yashunin 2018) that dominates
# production vector serving: answers come from WALKING a neighbor
# graph toward the query, not from scanning a partition.  The
# deterministic baseline here builds a navigable graph as the in-cell
# exact-kNN graph (count-adaptive cells via the decon2 two-level
# router, so graph build is ~n·occupancy, never all-pairs), routes
# each query to entry points (the md5-min member of its top-2 cells —
# the role HNSW's upper layers play), and runs T unrolled rounds of
# greedy BEAM search: rank the frontier by exact integer-quantized L2
# to the query, expand the top-B's neighbors, accumulate visited.
# Every step is deterministic (integer distances, id tiebreaks), so
# the DuckDB oracle replays graph build, routing, every beam round,
# and the final top-10.

_NSW_NB = 6      # kNN-graph out-degree
_NSW_BEAM = 8    # beam width per expansion round
_NSW_ROUNDS = 3  # unrolled greedy expansion rounds
_NSW_NPROBE = 2  # entry cells per query


def _nsw_oracle(
    nb: int = _NSW_NB,
    beam: int = _NSW_BEAM,
    rounds: int = _NSW_ROUNDS,
    nprobe: int = _NSW_NPROBE,
    dim: int = 64,
) -> str:
    def l2(a: str, b: str) -> str:
        return (
            f"CAST(list_sum(list_transform(generate_series(1, {dim}),"
            f" i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i]))) AS BIGINT)"
        )

    walk_ctes = []
    prev = "c0"
    for t in range(1, rounds + 1):
        walk_ctes.append(
            f"""
    b{t} AS (
        SELECT query_id, vec_id FROM (
            SELECT c.query_id, c.vec_id,
                   row_number() OVER (
                       PARTITION BY c.query_id
                       ORDER BY {l2('m.qv', 'q.qqv')}, c.vec_id
                   ) AS rn
            FROM {prev} c
            JOIN member m ON m.vec_id = c.vec_id
            JOIN qv5 q ON q.query_id = c.query_id
        ) WHERE rn <= {beam}
    ),
    n{t} AS (
        SELECT b.query_id, e.dst AS vec_id
        FROM b{t} b JOIN edges e ON e.src = b.vec_id
    ),
    c{t} AS (
        SELECT query_id, vec_id FROM {prev}
        UNION
        SELECT query_id, vec_id FROM n{t}
    )"""
        )
        prev = f"c{t}"
    walk = ",".join(walk_ctes)
    return f"""
    WITH e AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
    params AS (
        SELECT greatest(4, least(n // 128,
                                 4 * CAST(CEIL(SQRT(n)) AS BIGINT))) AS k,
               CAST(CEIL(SQRT(greatest(4, least(n // 128,
                   4 * CAST(CEIL(SQRT(n)) AS BIGINT))))) AS BIGINT) AS b
        FROM nn
    ),
    cents AS MATERIALIZED (
        SELECT row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) - 1 AS cent_id,
               v AS cv
        FROM e
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT (SELECT k FROM params)
    ),
    supers AS MATERIALIZED (
        SELECT cent_id AS sup_id, cv AS sv FROM cents
        WHERE cent_id < (SELECT b FROM params)
    ),
    cbr AS MATERIALIZED (
        SELECT cent_id, cv,
               CASE WHEN cent_id < (SELECT b FROM params)
                    THEN cent_id ELSE pick END AS branch
        FROM (
            SELECT c.cent_id, c.cv, s.sup_id AS pick,
                   row_number() OVER (
                       PARTITION BY c.cent_id
                       ORDER BY list_dot_product(c.cv, s.sv)
                                / sqrt(list_dot_product(s.sv, s.sv)) DESC,
                                s.sup_id
                   ) AS rn
            FROM cents c CROSS JOIN supers s
        ) WHERE rn = 1
    ),
    vbr AS MATERIALIZED (
        SELECT vec_id, v, pick AS branch FROM (
            SELECT e.vec_id, e.v, s.sup_id AS pick,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, s.sv)
                                / sqrt(list_dot_product(s.sv, s.sv)) DESC,
                                s.sup_id
                   ) AS rn
            FROM e CROSS JOIN supers s
        ) WHERE rn = 1
    ),
    ranked_cells AS MATERIALIZED (
        SELECT vec_id, cell, rn FROM (
            SELECT vb.vec_id, c.cent_id AS cell,
                   row_number() OVER (
                       PARTITION BY vb.vec_id
                       ORDER BY list_dot_product(vb.v, c.cv)
                                / sqrt(list_dot_product(c.cv, c.cv)) DESC,
                                c.cent_id
                   ) AS rn
            FROM vbr vb JOIN cbr c ON c.branch = vb.branch
        ) WHERE rn <= {nprobe}
    ),
    qq AS MATERIALIZED (
        SELECT vec_id,
               list_transform(v, x -> CAST(round(x * 1000000.0) AS BIGINT))
                   AS qv
        FROM e
    ),
    member AS MATERIALIZED (
        SELECT r.vec_id, r.cell, q.qv
        FROM ranked_cells r JOIN qq q USING (vec_id)
        WHERE r.rn = 1
    ),
    knn AS MATERIALIZED (
        SELECT src, dst FROM (
            SELECT x.vec_id AS src, y.vec_id AS dst,
                   row_number() OVER (
                       PARTITION BY x.vec_id
                       ORDER BY {l2('x.qv', 'y.qv')}, y.vec_id
                   ) AS rn
            FROM member x JOIN member y
              ON y.cell = x.cell AND y.vec_id <> x.vec_id
        ) WHERE rn <= {nb}
    ),
    edges AS MATERIALIZED (
        SELECT src, dst FROM knn UNION SELECT dst, src FROM knn
    ),
    qv5 AS (
        SELECT vec_id AS query_id, qv AS qqv FROM qq WHERE vec_id < 5
    ),
    entry_rank AS (
        SELECT cell, vec_id,
               row_number() OVER (
                   PARTITION BY cell
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) AS rn
        FROM member
    ),
    c0 AS (
        SELECT DISTINCT p.vec_id AS query_id, m.vec_id
        FROM ranked_cells p
        JOIN entry_rank m ON m.cell = p.cell AND m.rn = 1
        WHERE p.vec_id < 5
    ),{walk}
    SELECT query_id, match_id, l2q_dist, CAST(rnk AS BIGINT) AS rnk FROM (
        SELECT c.query_id, c.vec_id AS match_id,
               {l2('m.qv', 'q.qqv')} AS l2q_dist,
               row_number() OVER (
                   PARTITION BY c.query_id
                   ORDER BY {l2('m.qv', 'q.qqv')}, c.vec_id
               ) AS rnk
        FROM {prev} c
        JOIN member m ON m.vec_id = c.vec_id
        JOIN qv5 q ON q.query_id = c.query_id
        WHERE c.vec_id <> c.query_id
    ) WHERE rnk <= 10
    ORDER BY query_id, rnk
    """


@query("sim13_nsw_greedy_ann", oracle=_nsw_oracle())
def sim13_nsw_greedy_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph-ANN baseline (the NSW/HNSW family, Malkov & Yashunin
    2018): a navigable neighbor graph answers queries by GREEDY WALK,
    not partition scan.  Build: every vector joins its count-adaptive
    cell (k = max(4, min(n/128, 4*sqrt(n))) md5-lowest centroids —
    sqrt-capped so the seed table never grows linearly — decon2's two-level
    router — ~2n*sqrt(k) routing work, never flat n*k) and links to
    its {nb} exact-nearest in-cell neighbors by integer-quantized L2
    (the graph build is cell-keyed: ~n*occupancy candidate pairs,
    linear in n).  Search: each query enters at the md5-min member of
    its top-{nprobe} routed cells (the role HNSW's upper layers play)
    and runs {rounds} unrolled rounds of beam search — rank visited
    by exact L2 to the query, expand the top-{beam}'s out-edges,
    accumulate — then reports the visited top-10.  Deterministic end
    to end (integer distances, id tiebreaks), so the oracle replays
    routing, graph build, every beam round, and the final ranking.

    Plan shape at 100 TB: routing is two broadcast argmaxes; the kNN
    build is one cell-keyed exchange with a per-vector window top-{nb}
    (the exchange is the index build — run once, persisted in a real
    deployment exactly like sim11's base index); each beam round is a
    model-sized frontier (|queries|*{beam}) broadcast-joined to the
    edge list, i.e. probe cost is independent of corpus size — the
    property that makes graph indexes win at serving time.

    Reference analog: none (extends the similarity family, SURVEY
    §2.13); with sim12 this closes VERDICT r9 #3's two named gaps
    (composed IVF-PQ + a graph-ANN family)."""
    import math

    emb = _emb(spark, sf_dir)
    n = emb.count()
    # Count-adaptive cells, sqrt-CAPPED (VERDICT r10 #3): n/128 keeps
    # cell occupancy flat through the gate scales, but an uncapped
    # k = n/128 makes this seed collect() linear in the corpus — at
    # 1e10 vectors that is an 8e7-row driver materialization.  The cap
    # 4*sqrt(n) (sim5's trained-IVF convention: k ~ sqrt(n) balances
    # n*k/b routing dots against n/k-sized cells) binds only past
    # n = 262144, so every tested scale is unchanged while the driver
    # table is O(sqrt(n)) — ~400k rows at 1e10 vectors, a broadcast,
    # not a bottleneck.  The oracle replays the same formula.
    k_cells = max(4, min(n // 128, 4 * math.ceil(math.sqrt(n))))
    b = math.ceil(math.sqrt(k_cells))
    init = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k_cells)
        .select("v")
        .collect()
    )
    cents = spark.createDataFrame(
        [(i, list(r["v"])) for i, r in enumerate(init)],
        "cent_id long, cv_cent array<double>",
    )
    supers = spark.createDataFrame(
        [(i, list(r["v"])) for i, r in enumerate(init[:b])],
        "cent_id long, cv_cent array<double>",
    )
    # Two-level routing (decon2's device verbatim): centroid -> branch
    # with supers pinned, vector -> branch, in-branch top-nprobe cells.
    cbr = (
        ivf_assign(
            cents.select(
                F.col("cent_id").alias("vec_id"),
                F.col("cv_cent").alias("v"),
            ),
            supers,
        )
        .select(
            F.col("vec_id").alias("cent_id"),
            F.expr(f"CASE WHEN vec_id < {b} THEN vec_id ELSE cell END")
            .alias("branch"),
        )
        .join(cents, "cent_id")
        .select("branch", "cent_id", "cv_cent")
    )
    vbr = ivf_assign(emb, supers).select(
        "vec_id", "v", F.col("cell").alias("branch")
    )
    cbr_n = cbr.withColumn(
        "cent_norm", F.greatest(norm(F.col("cv_cent")), F.lit(1e-12))
    )
    wv = W.partitionBy("vec_id").orderBy(
        F.desc("cell_sim"), "cell"
    )
    ranked_cells = (
        vbr.join(F.broadcast(cbr_n), "branch")
        .select(
            "vec_id",
            F.col("cent_id").alias("cell"),
            (dot(F.col("v"), F.col("cv_cent")) / F.col("cent_norm")).alias(
                "cell_sim"
            ),
        )
        .withColumn("rn", F.row_number().over(wv))
        .where(F.col("rn") <= _NSW_NPROBE)
        .select("vec_id", "cell", "rn")
        # Consumers: member table + query probes.  Lazy cuts measured
        # FASTER end-to-end than eager here (7.6 vs 9.0 s warm at
        # sf0.1): the dominant fixed cost is whole-stage-codegen
        # compilation of the dim-wide zip_with/aggregate expressions
        # (the kmeans_centroids codegen note), which eager
        # materialization pays per cut instead of per consumer chain.
        .localCheckpoint(eager=False)
    )
    qq = emb.select(
        "vec_id",
        F.transform("v", lambda x: F.round(x * 1_000_000.0).cast("long")).alias(
            "qv"
        ),
    )
    member = (
        ranked_cells.where(F.col("rn") == 1)
        .join(qq, "vec_id")
        .select("vec_id", "cell", "qv")
        # Consumers: both kNN sides, entry ranking, beam distance joins.
        .localCheckpoint(eager=False)
    )

    def l2sq(a: str, bcol: str) -> F.Column:
        return F.aggregate(
            F.zip_with(a, bcol, lambda x, y: (x - y) * (x - y)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    mx = member.select(
        F.col("vec_id").alias("src"), F.col("cell").alias("cell"), F.col("qv").alias("xv")
    )
    my = member.select(
        F.col("vec_id").alias("dst"), F.col("cell").alias("cell"), F.col("qv").alias("yv")
    )
    wk = W.partitionBy("src").orderBy("d", "dst")
    # The in-cell all-pairs l2sq is the CPU-heavy leg of the build
    # (~8 core-seconds at sf0.1) but only ~15 distinct join keys, so
    # the cell exchange is SKEWED and AQE coalesces it by bytes — the
    # distance fold ran in one straggler task (guide §2.2/§2.4:
    # partition count must track compute, not bytes; split hot keys).
    # Fix: form the (cheap) pairs on the cell key, then repartition by
    # src BEFORE evaluating the distance — src is ~n-distinct, so the
    # fold spreads evenly across the session's cores, and the window
    # over src reuses the same hash partitioning (no extra exchange).
    # REPARTITION_BY_NUM is never coalesced by AQE; the count is
    # derived from defaultParallelism, so it scales with the cluster.
    # Measured warm at sf0.1/local[32]: knn+edges 4.3 s -> ~2.0 s.
    par = emb.sparkSession.sparkContext.defaultParallelism
    knn = (
        mx.join(my, "cell")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst", "xv", "yv")
        .repartition(par, "src")
        .select("src", "dst", l2sq("xv", "yv").alias("d"))
        .withColumn("rn", F.row_number().over(wk))
        .where(F.col("rn") <= _NSW_NB)
        .select("src", "dst")
    )
    edges = (
        # Both edge orientations in ONE pass over knn (explode of a
        # 2-struct array): the previous union re-evaluated the whole
        # kNN build for the mirrored leg — a second ~4.5 s
        # materialization at sf0.1.  Same bag of rows, so the set
        # after distinct is identical.
        knn.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("src").alias("src"), F.col("dst").alias("dst")
                    ),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
        # Re-read every beam round: materialize the graph once (this
        # IS the index build; a deployment persists it like sim11).
        .localCheckpoint(eager=False)
    )
    qv5 = qq.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("qv").alias("qqv")
    )
    we = W.partitionBy("cell").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    entries = (
        member.withColumn("ern", F.row_number().over(we))
        .where(F.col("ern") == 1)
        .select("cell", F.col("vec_id").alias("entry_id"))
    )
    cand = (
        ranked_cells.where(F.col("vec_id") < 5)
        .join(entries, "cell")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("entry_id").alias("vec_id"),
        )
        .distinct()
    )
    # DRIVER-FOLDED beam search (the g14 model-fold device; VERDICT r12
    # #2 tower job-count reduction): the beam state is MODEL-sized —
    # cand is the visited set of a width-capped beam over a
    # degree-capped graph, ≈ |queries| * (nprobe + rounds*beam*2*nb) =
    # 1450 rows with today's constants, independent of corpus size —
    # while member and edges are corpus-sized.  The former loop ran
    # each round as broadcast joins + distinct + localCheckpoint (~44
    # Spark jobs/run, most of sim13's wall in driver gaps at sf0.1);
    # here the serve phase is TWO bounded broadcast-pruned scans of the
    # distributed index (the probed cells' members; their intra-cell
    # edges) and the beam itself — top-beam selection, dedup, final
    # top-10 — folds on the driver in the SAME exact int64 arithmetic
    # (sum of squared deltas of quantized components; Python ints are
    # exact) with the same (d, vec_id) tiebreak: results bit-identical,
    # oracle green at all three SFs.  The corpus-sized work (routing,
    # kNN build, edge list — the actual index) stays fully distributed
    # and untouched; at 100 TB the two pruned scans are exactly the
    # serving-time probes a deployed graph index runs per query batch.
    from ..functions.guards import bounded_collect

    qvec = {
        r["query_id"]: r["qqv"]
        for r in bounded_collect(qv5, 5, "sim13 query vectors")
    }
    cand = {
        (r["query_id"], r["vid"])
        for r in bounded_collect(
            ranked_cells.where(F.col("vec_id") < 5)
            .join(entries, "cell")
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("entry_id").alias("vid"),
            )
            .distinct(),
            5 * _NSW_NPROBE,
            "sim13 entry candidates",
        )
    }
    # ONE prefetch of everything the beam can possibly touch: the kNN
    # graph is built strictly WITHIN cells (mx ⋈ my on "cell"), so the
    # reachable set of a walk that starts at the probed cells' entry
    # members is contained in those cells' member sets — prefetching
    # the ≤ |queries|·nprobe probed cells' members and their
    # (intra-cell) edges makes the whole serve phase 2 bounded scans.
    # Caps are pathology guards (occupancy is design-bounded at ~128
    # until the sqrt cap; 10 cells of even 100k members fail loudly at
    # the cap rather than OOM the driver).
    probe_cells = sorted(
        r["cell"]
        for r in bounded_collect(
            ranked_cells.where(F.col("vec_id") < 5)
            .select("cell")
            .distinct(),
            5 * _NSW_NPROBE,
            "sim13 probed cells",
        )
    )
    cells_df = spark.createDataFrame([(c,) for c in probe_cells], "cell long")
    mv: dict = {}
    for r in bounded_collect(
        member.join(F.broadcast(cells_df), "cell").select("vec_id", "qv"),
        1_000_000,
        "sim13 probed-cell member prefetch",
    ):
        mv[r["vec_id"]] = r["qv"]
    ids_df = spark.createDataFrame([(i,) for i in sorted(mv)], "src long")
    out: dict = {}
    for r in bounded_collect(
        edges.join(F.broadcast(ids_df), "src"),
        4_000_000,
        "sim13 probed-cell edge prefetch",
    ):
        out.setdefault(r["src"], []).append(r["dst"])

    dist: dict = {}

    def score_cand() -> None:
        for q, v in cand:
            if (q, v) not in dist:
                dist[(q, v)] = sum(
                    (x - y) * (x - y) for x, y in zip(mv[v], qvec[q])
                )

    for _ in range(_NSW_ROUNDS):
        score_cand()
        beam = [
            (q, v)
            for q in qvec
            for _, v in sorted(
                (dist[(q, v)], v) for (qq, v) in cand if qq == q
            )[:_NSW_BEAM]
        ]
        cand |= {
            (q, dst) for q, v in beam for dst in out.get(v, ())
        }
    score_cand()
    result = []
    for q in sorted(qvec):
        ranked = sorted(
            (dist[(q, v)], v) for (qq, v) in cand if qq == q and v != q
        )
        result.extend(
            (q, v, d, rnk)
            for rnk, (d, v) in enumerate(ranked[:10], start=1)
        )
    return spark.createDataFrame(
        result,
        "query_id long, match_id long, l2q_dist long, rnk long",
    ).orderBy("query_id", "rnk")


sim13_nsw_greedy_ann.__doc__ = sim13_nsw_greedy_ann.__doc__.format(
    nb=_NSW_NB, beam=_NSW_BEAM, rounds=_NSW_ROUNDS, nprobe=_NSW_NPROBE
)


# --- SIM8: per-label embedding centroids (exact aggregation) -----------------


@query(
    "sim8_label_centroids",
    oracle="""
    WITH q AS (
        SELECT label,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(round(x * 1000000.0) AS BIGINT)) AS qv
        FROM embeddings
    ),
    ex AS (
        SELECT label, UNNEST(qv) AS qx,
               UNNEST(generate_series(0, len(qv) - 1)) AS pos
        FROM q
    )
    SELECT label, CAST(pos AS INT) AS pos, count(*) AS n_vecs,
           ROUND(CAST(SUM(qx) AS DOUBLE) / (count(*) * 1000000.0), 6) AS mean
    FROM ex GROUP BY label, pos
    """,
)
def sim8_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class embedding centroids — the aggregation behind centroid
    classifiers, cluster drift monitors, and IVF codebook seeding: one
    mean per (label, dimension).  Components are integer-quantized
    (the sim5b device) so the sums are exact and order-free; the one
    float op is the final division, identical in both engines.

    Plan shape: posexplode rewrites the n x dim matrix as rows and the
    (label, pos) groupBy partial-aggregates map-side, so the exchange
    carries at most |labels| x dim rows per task — the same narrow
    aggregate the k-means trainer uses (similarity.py:kmeans_centroids),
    here declared and oracle-checked on its own."""
    emb = _emb(spark, sf_dir)
    qv = F.transform("v", lambda x: F.round(x * _PQ_QSCALE).cast("long"))
    ex = emb.select("label", qv.alias("qv")).select(
        "label", F.posexplode("qv").alias("pos", "qx")
    )
    # Sum in DECIMAL(38,0): a long sum wraps silently past ~9e18
    # (n ~ 1e13 quantized components); DuckDB's BIGINT sum widens to
    # HUGEINT on its own.
    return ex.groupBy("label", "pos").agg(
        F.count("*").alias("n_vecs"),
        F.round(
            F.sum(F.col("qx").cast("decimal(38,0)")).cast("double")
            / (F.count("*") * _PQ_QSCALE),
            6,
        ).alias("mean"),
    )


# --- EVAL1-3: ANN offline evaluation (recall vs exact baseline) --------------


def _recall_oracle(approx_key: str) -> str:
    """Composes the sim1 (exact) oracle with an approximate-ANN oracle
    as CTEs and scores per-query recall@10 — the evaluation itself is
    replayed, not just the pipelines."""
    from .registry import ORACLES

    return f"""
    WITH exact AS ({ORACLES["sim1_cosine_topk"]}),
    approx AS ({ORACLES[approx_key]})
    SELECT exact.query_id,
           CAST(SUM(CASE WHEN approx.match_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           count(*) AS k,
           ROUND(CAST(SUM(CASE WHEN approx.match_id IS NOT NULL
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS recall_at_10
    FROM exact LEFT JOIN approx
      ON approx.query_id = exact.query_id
     AND approx.match_id = exact.match_id
    GROUP BY exact.query_id
    ORDER BY exact.query_id
    """


def _ann_recall(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Per-query recall@k of ``approx`` against ``exact`` — both sides
    (query_id, match_id, ...) result sets already bound to
    |queries| × k rows, so evaluation cost is independent of corpus
    size."""
    exact = exact.select("query_id", F.col("match_id").alias("exact_match"))
    approx = approx.select("query_id", F.col("match_id").alias("approx_match"))
    # Both sides are |queries| × k by construction at ANY corpus scale,
    # but their windowed/checkpointed lineage hides size stats, so the
    # planner falls back to SortMergeJoin (the k4 device): broadcast
    # the probe side of the left join explicitly.
    j = exact.join(
        F.broadcast(approx),
        (exact["query_id"] == approx["query_id"])
        & (exact["exact_match"] == approx["approx_match"]),
        "left",
    ).select(exact["query_id"], "exact_match", "approx_match")
    return (
        j.groupBy("query_id")
        .agg(
            F.sum(
                F.when(F.col("approx_match").isNotNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_hit"),
            F.count("*").alias("k"),
        )
        .select(
            "query_id",
            "n_hit",
            "k",
            F.round(
                F.col("n_hit").cast("double") / F.col("k"), 6
            ).alias("recall_at_10"),
        )
        .orderBy("query_id")
    )


@query("eval1_ann_recall", oracle=_recall_oracle("sim2_signlsh_ann"))
def eval1_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline ANN evaluation as a declared query: per-query recall@10
    of the sign-LSH ANN (sim2) against the exact brute-force baseline
    (sim1), computed by joining the two result sets — the quality
    harness a retrieval team runs after every index rebuild, here a
    first-class dataflow whose oracle replays BOTH pipelines AND the
    scoring join.  eval2/eval3 run the same harness over the IVF and
    PQ-ADC families, so every ANN family in the registry ships with a
    declared, oracle-checked quality report.

    Plan: both sides bound to |queries| x 10 rows before the join —
    evaluation cost is independent of corpus size."""
    return _ann_recall(
        sim1_cosine_topk(spark, sf_dir), sim2_signlsh_ann(spark, sf_dir)
    )


@query("eval2_ann_recall_ivf", oracle=_recall_oracle("sim4_ivf_ann"))
def eval2_ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the IVF ANN (sim4, nprobe=2 of 8 cells) vs the
    exact baseline — the same declared evaluation harness as eval1
    over the partition-pruning ANN family.  The oracle replays exact
    search, the whole IVF pipeline, AND the recall join; a floor on
    the measured recall is pinned by test (tests/test_similarity.py),
    so a silent quantizer regression fails loudly."""
    return _ann_recall(
        sim1_cosine_topk(spark, sf_dir), sim4_ivf_ann(spark, sf_dir)
    )


@query("eval3_ann_recall_pq", oracle=_recall_oracle("sim6_pq_adc"))
def eval3_ann_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """recall@10 of the PQ-ADC ANN (sim6, 16x4 subspaces) vs the exact
    baseline — eval1's harness over the memory-compression ANN family.
    Note the asymmetry being measured: sim6 ranks by approximate L2^2
    over codes while the baseline ranks by exact cosine, so this
    recall captures BOTH quantization loss and the metric gap — the
    honest number an index owner reports."""
    return _ann_recall(
        sim1_cosine_topk(spark, sf_dir), sim6_pq_adc(spark, sf_dir)
    )


# --- SEMDEDUP1: semantic dedup via cluster-then-prune ------------------------

# k is NOT a constant: it is derived from corpus size so the average
# cell holds ~_SEMDEDUP_CELL_TARGET vectors regardless of scale.  The
# in-cell pair term is then n²/k ≈ n·target — LINEAR in corpus size —
# instead of quadratic at fixed k (the paper's regime: 50k clusters
# over LAION grows k with the corpus).  Both engines compute the same
# k = ceil(n / target) from their own COUNT, so the oracle stays a
# bit-exact replay at every sf (k=8 at n=500, k=32 at sf0.1's n=2000).
_SEMDEDUP_CELL_TARGET = 64
_SEMDEDUP_THETA = 0.4
_SEMDEDUP_K_SQL = (
    f"(SELECT CAST(CEIL(COUNT(*) / {_SEMDEDUP_CELL_TARGET}.0) AS BIGINT) "
    "FROM emb)"
)
# semdedup1/2 are PAPER BASELINES, explicitly input-capped (VERDICT r5
# "What's wrong" #1): with k = ceil(n/64) their FLAT argmax scores
# n*k = n^2/64 vector-centroid pairs — tools/stress_funnel.py measured
# exponents 1.62/1.67, i.e. quadratic, so the flat quantizer is NOT the
# 100 TB path.  The declared forms therefore operate on the bounded
# lowest-vec_id slice below (cap >> every test/bench sf: n=500 at
# sf0.01, n=2000 at sf0.1 — the cap never binds there, it only stops
# the quadratic from entering a large-scale plan).  The full-corpus
# scale path is semdedup3 (two-level routing, measured exponents
# 0.51-0.64 across stress generations) and semdedup4 (sample-trained
# tower, 0.29-0.33); the bench headline slot
# moved semdedup1 -> semdedup4 accordingly.
_SEMDEDUP_BASELINE_CAP = 4096


def _semdedup_k(emb: DataFrame) -> int:
    """k = ceil(n / target): one cheap count-only job (the scan prunes
    to zero data columns); the result is a scalar, not a data collect."""
    import math

    return math.ceil(emb.count() / _SEMDEDUP_CELL_TARGET)


@query(
    "semdedup1_cluster_prune",
    oracle=f"""
    WITH emb AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
        WHERE vec_id < {_SEMDEDUP_BASELINE_CAP}
    ),
    cents AS (SELECT vec_id AS cent_id, v AS cv FROM emb
              WHERE vec_id < {_SEMDEDUP_K_SQL}),
    assigned AS (
        SELECT vec_id, v, cell FROM (
            SELECT e.vec_id, e.v, c.cent_id AS cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, c.cv)
                                / sqrt(list_dot_product(c.cv, c.cv)) DESC,
                                c.cent_id
                   ) AS rn
            FROM emb e CROSS JOIN cents c
        ) WHERE rn = 1
    ),
    dropped AS (
        SELECT DISTINCT b.vec_id AS did
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(a.v, b.v), 6) >= {_SEMDEDUP_THETA}
    )
    SELECT s.vec_id, s.cell, (d.did IS NULL) AS keep
    FROM assigned s LEFT JOIN dropped d ON d.did = s.vec_id
    ORDER BY s.vec_id
    """,
)
def semdedup1_cluster_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication by cluster-then-prune (Abbas et al. 2023,
    "SemDeDup: Data-efficient learning at web-scale through semantic
    deduplication"): embed → k-means cells → WITHIN each cell compare
    pairwise cosine → drop all but one of every semantic-duplicate
    group.  Cosine never crosses a cell boundary, which is the whole
    trick: the quadratic term is (n/k)² per cell, not n², and k is
    WIRED to corpus size — k = ceil(n/{_SEMDEDUP_CELL_TARGET}) computed
    from a count in both engines — so total in-cell work stays ~n·64
    (linear) as data grows (the paper runs 50k clusters over LAION).
    Keep rule: the LOWEST vec_id of a qualifying pair
    survives (the engine's d1/d5 keep-min convention; the paper keeps
    the item farthest from the centroid — same mechanism, different
    tiebreak).  θ = {_SEMDEDUP_THETA} is corpus-calibrated (these
    uniform random embeddings peak at ~0.49 within-cell cosine; real
    text embeddings concentrate much higher and use θ ≈ 0.95+).

    Deterministic coarse quantizer (first-k centroids, the sim4
    device) so the ENTIRE pipeline — k derivation, assignment argmax,
    in-cell pair search, drop set, keep flags — replays in DuckDB.
    The k-means-trained path swaps in sim5/sim5b centroids unchanged.

    Plan: centroids broadcast onto one corpus scan (argmax via
    partial-agg min-struct), one shuffle on cell for the self-join,
    one anti-join for the flags — no global pairwise stage anywhere.

    SCOPE (round 6): this is the CAPPED paper baseline.  The FLAT
    argmax scores n·k pairs = n²/64 once k is count-derived — the
    stress harness measured it quadratic (exponent 1.62) — so the
    declared form processes only the vec_id < _SEMDEDUP_BASELINE_CAP
    slice (never
    binding at test/bench scales; identical results there).  For a
    full corpus use semdedup3_hierarchical_prune (measured exponents
    0.51-0.64) or semdedup4_two_level_trained (0.29-0.33)."""
    emb = _emb(spark, sf_dir).where(
        F.col("vec_id") < _SEMDEDUP_BASELINE_CAP
    )
    k = _semdedup_k(emb)
    centroids = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv_cent")
    )
    return _cluster_prune(ivf_assign(emb, centroids), n_cells=k)


def _cluster_prune(assigned: DataFrame, n_cells: int | None = None) -> DataFrame:
    """In-cell cosine prune shared by semdedup1/semdedup2: drop the
    higher id of every same-cell pair with rounded cosine >= theta.

    The assignment is referenced three times (both self-join sides +
    the keep-flag output), so one lazy checkpoint runs the argmax scan
    once (the d10/d5 plan-economy lesson); per-vector norms are
    computed ONCE before the quadratic stage — the in-cell pair join
    then evaluates one dot per pair instead of three array aggregates
    (norm(v) is the identical expression on identical data, so
    dot/(na*nb) is bit-equal to the per-pair form and the round(6)
    oracle boundary cannot move).

    Drop-set shape: ``b_id`` is dropped iff SOME qualifying pair
    reaches theta, i.e. iff ``max(cos) >= theta`` — an aggregation, not
    a filter + distinct.  The aggregate form matters physically: the
    pair join is keyed on ``cell``, whose distinct count at bench
    scales is far below the core count, so AQE coalesces the exchange
    by bytes and the quadratic cosine work ran in ONE task (guide
    §2.2/§2.5 — the sim13 kNN-build lesson).  When cells are scarce
    (n_cells < 4·parallelism) the cheap pair rows are re-partitioned
    by ``b_id`` (~n-distinct) so the dot folds spread over every core
    and the groupBy reuses that exchange; max() is order-independent,
    so the result is bit-identical.  At 100 TB cells outnumber cores
    (k = ceil(n/64) grows linearly) and the gate turns the extra
    pair-payload shuffle OFF — the join's natural cell parallelism
    suffices and only partial-aggregated (b_id, max) rows cross the
    wire."""
    assigned = assigned.localCheckpoint(eager=False)
    with_norm = assigned.withColumn("nv", norm(F.col("v")))
    a = with_norm.select(
        F.col("vec_id").alias("a_id"),
        F.col("v").alias("av"),
        F.col("nv").alias("na"),
        "cell",
    )
    b = with_norm.select(
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"),
        F.col("nv").alias("nb"),
        "cell",
    )
    pairs = a.join(
        b, (a["cell"] == b["cell"]) & (F.col("a_id") < F.col("b_id"))
    ).select("b_id", "av", "bv", "na", "nb")
    par = assigned.sparkSession.sparkContext.defaultParallelism
    if n_cells is None or n_cells < 4 * par:
        pairs = pairs.repartition(par, "b_id")
    cos = F.round(
        dot(F.col("av"), F.col("bv")) / (F.col("na") * F.col("nb")), 6
    )
    dropped = (
        pairs.groupBy("b_id")
        .agg(F.max(cos).alias("_mx"))
        .where(F.col("_mx") >= _SEMDEDUP_THETA)
        .select(F.col("b_id").alias("vec_id"))
    )
    return (
        assigned.select("vec_id", "cell")
        .join(dropped.withColumn("_d", F.lit(1)), "vec_id", "left")
        .select("vec_id", "cell", F.col("_d").isNull().alias("keep"))
        .orderBy("vec_id")
    )


def _semdedup2_oracle() -> str:
    """Compose the sim5b portable-k-means tower (init + every Lloyd
    round + final assignment) with the semdedup prune.  The tower's k
    is the scale-wired ceil(n/{target}) scalar subquery, mirroring the
    engine's count-derived k; the source is the capped baseline slice
    (see _SEMDEDUP_BASELINE_CAP)."""
    tower = _sim5b_oracle(
        k_sql=_SEMDEDUP_K_SQL,
        source_sql=(
            "(SELECT * FROM embeddings "
            f"WHERE vec_id < {_SEMDEDUP_BASELINE_CAP}) AS src"
        ),
    )
    marker = ",\n    queries AS"
    tower = tower[: tower.index(marker)]
    a_final = f"a{_KMB_ITERS + 1}"
    return (
        tower
        + f""",
    dropped AS (
        SELECT DISTINCT b.vec_id AS did
        FROM {a_final} a JOIN {a_final} b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(a.v, b.v), 6)
              >= {_SEMDEDUP_THETA}
    )
    SELECT s.vec_id, s.cell, (d.did IS NULL) AS keep
    FROM {a_final} s LEFT JOIN dropped d ON d.did = s.vec_id
    ORDER BY s.vec_id
    """
    )


@query("semdedup2_trained_prune", oracle=_semdedup2_oracle())
def semdedup2_trained_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with TRAINED cells — the composition semdedup1's
    docstring promises: the coarse quantizer is the portable
    k-means (sim5b's init + Lloyd rounds, integer-quantized mean sums
    so training is bit-portable), and the prune is the shared in-cell
    cosine drop.  Trained cells track the embedding distribution, so
    semantic duplicates land in the same cell far more reliably than
    under the deterministic first-k quantizer — this is the form the
    paper actually runs.  The oracle replays EVERYTHING: init, every
    Lloyd round, the final assignment, the pair search, and the keep
    flags — including the count-derived k = ceil(n/{target}), so the
    cell count grows with the corpus exactly as the engine's does.

    SCOPE (round 6): CAPPED paper baseline, like semdedup1 — full-k
    Lloyd training is itself n·k per round (measured exponent 1.67),
    so the declared form runs on the vec_id < _SEMDEDUP_BASELINE_CAP
    slice (non-binding at test/bench scales).  The trained quantizer
    that scales is semdedup4_two_level_trained (bounded-sample
    training, measured exponents 0.29-0.33)."""
    emb = _emb(spark, sf_dir).where(
        F.col("vec_id") < _SEMDEDUP_BASELINE_CAP
    )
    k = _semdedup_k(emb)
    centroids = kmeans_centroids_portable(spark, emb.select("vec_id", "v"), k=k)
    return _cluster_prune(ivf_assign(emb, centroids), n_cells=k)


def ivf_assign_within_narrow(
    vec_br: DataFrame, cents_br: DataFrame
) -> DataFrame:
    """:func:`ivf_assign_within` as a narrow map — MEASURED AND NOT
    WIRED, same verdict and trade-off as :func:`ivf_assign_narrow`
    (see its docstring): the model side groups to one centroid-array
    row PER BRANCH, a broadcast equi-join attaches the branch's array
    to each vector (one row per vector, never |centroids| rows), and
    ``array_max(transform(...))`` picks the cell inline with no
    ``groupBy(vec_id)`` exchange.  A branch with no centroids drops
    its vectors in BOTH formulations (inner join)."""
    cents = cents_br.select(
        "branch", _cent_structs(cents_br).alias("c")
    ).groupBy("branch").agg(F.collect_list("c").alias("_cents"))
    best = vec_br.join(F.broadcast(cents), "branch").select(
        "vec_id", "v", _argmax_cell(F.col("_cents")).alias("m")
    )
    return best.where(F.col("m").isNotNull()).select(
        "vec_id", "v", (-F.col("m.neg_cent")).alias("cell")
    )


def ivf_assign_within(vec_br: DataFrame, cents_br: DataFrame) -> DataFrame:
    """Second level of the hierarchical quantizer: argmax over ONLY the
    centroids of the vector's own branch (equi-join on branch replaces
    ivf_assign's crossJoin), same max(struct(sim, -cent_id)) partial-agg
    argmax so ties break to the lowest centroid id identically."""
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


_SD3_ARGMAX = """
        SELECT {l}.{lid} AS out_id, {l}.{lv} AS out_v, {r}.{rid} AS pick,
               row_number() OVER (
                   PARTITION BY {l}.{lid}
                   ORDER BY list_dot_product({l}.{lv}, {r}.{rv})
                            / sqrt(list_dot_product({r}.{rv}, {r}.{rv})) DESC,
                            {r}.{rid}
               ) AS rn
        FROM {src}"""


@query(
    "semdedup3_hierarchical_prune",
    oracle=f"""
    WITH emb AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    params AS (
        SELECT CAST(CEIL(COUNT(*) / {_SEMDEDUP_CELL_TARGET}.0) AS BIGINT) AS k,
               CAST(CEIL(SQRT(CEIL(COUNT(*) / {_SEMDEDUP_CELL_TARGET}.0)))
                    AS BIGINT) AS b
        FROM emb
    ),
    cents AS (SELECT vec_id AS cent_id, v AS cv FROM emb, params
              WHERE vec_id < params.k),
    supers AS (SELECT vec_id AS sup_id, v AS sv FROM emb, params
               WHERE vec_id < params.b),
    cent_branch AS (
        -- a super-centroid is ALWAYS a leaf of its own branch (the
        -- CASE pin): every branch a vector can route to is therefore
        -- structurally guaranteed >= 1 centroid, so the level-2 inner
        -- join can never drop a vector (exact-cover guarantee).
        SELECT out_id AS cent_id, out_v AS cv,
               CASE WHEN out_id < params.b THEN out_id ELSE pick END
                   AS branch
        FROM (
            {_SD3_ARGMAX.format(l="c", lid="cent_id", lv="cv",
                                r="s", rid="sup_id", rv="sv",
                                src="cents c CROSS JOIN supers s")}
        ), params WHERE rn = 1
    ),
    vec_branch AS (
        SELECT out_id AS vec_id, out_v AS v, pick AS branch FROM (
            {_SD3_ARGMAX.format(l="e", lid="vec_id", lv="v",
                                r="s", rid="sup_id", rv="sv",
                                src="emb e CROSS JOIN supers s")}
        ) WHERE rn = 1
    ),
    assigned AS (
        SELECT out_id AS vec_id, out_v AS v, pick AS cell FROM (
            {_SD3_ARGMAX.format(l="vb", lid="vec_id", lv="v",
                                r="cb", rid="cent_id", rv="cv",
                                src="vec_branch vb JOIN cent_branch cb"
                                    " ON cb.branch = vb.branch")}
        ) WHERE rn = 1
    ),
    dropped AS (
        SELECT DISTINCT b.vec_id AS did
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(a.v, b.v), 6)
              >= {_SEMDEDUP_THETA}
    )
    SELECT s.vec_id, s.cell, (d.did IS NULL) AS keep
    FROM assigned s LEFT JOIN dropped d ON d.did = s.vec_id
    ORDER BY s.vec_id
    """,
)
def semdedup3_hierarchical_prune(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SemDeDup with a HIERARCHICAL (two-level) coarse quantizer — the
    100 TB refinement the stress harness demanded: with the cell count
    wired to corpus size (k = ceil(n/64)), semdedup1/2's FLAT argmax
    scores n·k = n²/64 vector-centroid pairs, which
    tools/stress_funnel.py measured super-linear.  Here assignment goes
    through b = ceil(sqrt(k)) super-centroids: vector → nearest super
    (n·b dots) → argmax over only that branch's centroids (n·k/b
    expected dots), so assignment work is ~2n·sqrt(k) — n^1.5/8 instead
    of n²/64, and a depth-d tree generalizes to n·d·k^(1/d) → n·log k
    (the HNSW/annoy regime real pipelines use for centroid lookup).
    Branch routing is APPROXIMATE by design (a vector may miss its true
    nearest centroid when that centroid routed to a different branch —
    the paper's own FAISS assignment makes the same trade), but it is
    DETERMINISTIC: both levels use the dot/|c| argmax with
    lowest-id tie-breaks, so the DuckDB oracle replays the k and b
    derivations, both argmax levels, the branch-bounded assignment, and
    the in-cell prune bit-exactly.  Exact cover is STRUCTURAL, not
    probabilistic: each super-centroid is pinned as a leaf of its own
    branch (engine and oracle apply the same CASE), so no branch a
    vector routes to can be leaf-empty and the level-2 inner join
    keeps every vector exactly once (tests assert |assigned| == n).

    Plan: supers (b rows) broadcast onto one corpus scan, centroid→
    branch routing is a k×b flyspeck, the level-2 argmax is an
    equi-join on branch with the (k-row) centroid table broadcast —
    the corpus is scanned once per level and NEVER shuffled until the
    one cell shuffle inside the shared in-cell prune."""
    import math

    emb = _emb(spark, sf_dir)
    k = _semdedup_k(emb)
    b = math.ceil(math.sqrt(k))
    cents = emb.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv_cent")
    )
    supers = emb.where(F.col("vec_id") < b).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv_cent")
    )
    cents_br = ivf_assign(
        cents.select(
            F.col("cent_id").alias("vec_id"), F.col("cv_cent").alias("v")
        ),
        supers,
    ).select(
        F.col("vec_id").alias("cent_id"),
        F.col("v").alias("cv_cent"),
        # Pin each super-centroid to its OWN branch: self-cosine is the
        # argmax in all but exact-tie cases anyway, and the pin makes it
        # structural — every branch has >= 1 leaf centroid, so the
        # level-2 inner join cannot drop a vector (exact cover; the
        # oracle applies the identical CASE).
        F.when(F.col("vec_id") < b, F.col("vec_id"))
        .otherwise(F.col("cell"))
        .alias("branch"),
    )
    vec_br = ivf_assign(emb, supers).withColumnRenamed("cell", "branch")
    return _cluster_prune(ivf_assign_within(vec_br, cents_br), n_cells=k)


def _semdedup4_oracle() -> str:
    """Tower over the bounded md5-sample (trains the b super-centroids),
    then branch routing of the FULL corpus, deterministic per-branch
    leaves, in-branch argmax, and the shared prune — every stage a
    replayable CTE."""
    b_sql = (
        "(SELECT CAST(CEIL(SQRT(CEIL(COUNT(*) / "
        f"{_SEMDEDUP_CELL_TARGET}.0))) AS BIGINT) FROM embeddings)"
    )
    s_sql = (
        f"(SELECT {_SEMDEDUP_CELL_TARGET} * CAST(CEIL(SQRT(CEIL(COUNT(*)"
        f" / {_SEMDEDUP_CELL_TARGET}.0))) AS BIGINT) FROM embeddings)"
    )
    src = (
        "(SELECT vec_id, embedding FROM embeddings "
        "ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id "
        f"LIMIT {s_sql}) AS src"
    )
    tower = _sim5b_oracle(k_sql=b_sql, source_sql=src)
    marker = f",\n    a{_KMB_ITERS + 1} AS MATERIALIZED"
    tower = tower[: tower.index(marker)]
    c_final = f"c{_KMB_ITERS}"
    return (
        tower
        + f""",
    allv AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    p4 AS (
        SELECT CAST(CEIL(COUNT(*) / {_SEMDEDUP_CELL_TARGET}.0) AS BIGINT)
                   AS k,
               CAST(CEIL(SQRT(CEIL(COUNT(*) / {_SEMDEDUP_CELL_TARGET}.0)))
                   AS BIGINT) AS b
        FROM embeddings
    ),
    vec_branch AS MATERIALIZED (
        SELECT vec_id, v, branch FROM (
            SELECT e.vec_id, e.v, c.cent_id AS branch,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, c.cv)
                                / sqrt(list_dot_product(c.cv, c.cv)) DESC,
                                c.cent_id
                   ) AS rn
            FROM allv e CROSS JOIN {c_final} c
        ) WHERE rn = 1
    ),
    leaves AS (
        SELECT vec_id AS cent_id, v AS cv, branch FROM (
            SELECT vb.vec_id, vb.v, vb.branch,
                   row_number() OVER (
                       PARTITION BY vb.branch ORDER BY vb.vec_id
                   ) AS lrn
            FROM vec_branch vb
        ), p4
        WHERE lrn <= CAST(CEIL(p4.k / CAST(p4.b AS DOUBLE)) AS BIGINT)
    ),
    assigned AS (
        SELECT vec_id, v, cell FROM (
            SELECT vb.vec_id, vb.v, lf.cent_id AS cell,
                   row_number() OVER (
                       PARTITION BY vb.vec_id
                       ORDER BY list_dot_product(vb.v, lf.cv)
                                / sqrt(list_dot_product(lf.cv, lf.cv)) DESC,
                                lf.cent_id
                   ) AS rn
            FROM vec_branch vb JOIN leaves lf ON lf.branch = vb.branch
        ) WHERE rn = 1
    ),
    dropped AS (
        SELECT DISTINCT b.vec_id AS did
        FROM assigned a JOIN assigned b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ROUND(list_cosine_similarity(a.v, b.v), 6)
              >= {_SEMDEDUP_THETA}
    )
    SELECT s.vec_id, s.cell, (d.did IS NULL) AS keep
    FROM assigned s LEFT JOIN dropped d ON d.did = s.vec_id
    ORDER BY s.vec_id
    """
    )


@query("semdedup4_two_level_trained", oracle=_semdedup4_oracle())
def semdedup4_two_level_trained(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The fully SCALE-SHAPED SemDeDup: semdedup2's training cost was
    the last super-linear stage the stress harness measured (exponent
    1.62 — every Lloyd round scores n x k pairs with k = ceil(n/64)).
    Here the quantizer is two-level AND cheaply trained:

    - b = ceil(sqrt(k)) SUPER-centroids are trained with the portable
      k-means on a BOUNDED md5-sample of 64*b vectors — training cost
      iters x 64b x b ~ 64k dots, LINEAR in k (FAISS's train-on-sample
      guideline, ~30-256 points per centroid);
    - the full corpus routes to its super branch (n*b dots, ~n^1.25);
    - each branch's leaf centroids are its m = ceil(k/b) LOWEST
      vec_ids (deterministic — no second training pass), and the cell
      argmax scans only the branch's leaves (~n*k/b more dots);
    - the shared in-cell prune finishes the job.

    Exact cover is structural here by construction: leaves ARE routed
    vectors (row_number over each branch's members), so any branch
    holding a vector holds >= 1 leaf and the in-branch inner-join
    argmax keeps every vector exactly once (tests assert it).

    Everything replays in DuckDB: the sample ordering, the whole
    training tower (init + every Lloyd round over the sample), branch
    routing, the per-branch leaf row_numbers, the in-branch argmax,
    and the prune — so trained routing no longer costs oracle
    coverage the way sim5's float-avg training does.

    Plan: the training collects are model-sized (b x dim); supers
    broadcast onto one corpus scan for routing; the routed relation is
    lazily checkpointed once for its two consumers (leaf derivation +
    assignment); leaves broadcast for the equi-join argmax; one cell
    shuffle inside the prune."""
    import math

    emb = _emb(spark, sf_dir)
    k = _semdedup_k(emb)
    b = math.ceil(math.sqrt(k))
    m = math.ceil(k / b)
    sample = (
        emb.select("vec_id", "v")
        .orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(_SEMDEDUP_CELL_TARGET * b)
    )
    supers = kmeans_centroids_portable(spark, sample, k=b)
    vec_br = (
        ivf_assign(emb, supers)
        .withColumnRenamed("cell", "branch")
        .localCheckpoint(eager=False)
    )
    wb = W.partitionBy("branch").orderBy("vec_id")
    cents_br = (
        vec_br.withColumn("lrn", F.row_number().over(wb))
        .where(F.col("lrn") <= m)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.col("v").alias("cv_cent"),
            "branch",
        )
    )
    return _cluster_prune(ivf_assign_within(vec_br, cents_br), n_cells=k)


# --- SIM9: kNN-join classification -------------------------------------------

_KNN_K = 15
_KNN_NQ = 10


@query(
    "sim9_knn_classify",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS match_id, c.label,
               ROUND({_COS_SQL}, 6) AS cos_sim
        FROM embeddings q JOIN embeddings c ON c.vec_id >= {_KNN_NQ}
        WHERE q.vec_id < {_KNN_NQ}
    ), knn AS (
        SELECT * FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos_sim DESC, match_id)
                       AS rnk
            FROM scored
        ) WHERE rnk <= {_KNN_K}
    ), tallied AS (
        SELECT query_id, label, CAST(count(*) AS BIGINT) AS votes
        FROM knn GROUP BY query_id, label
    )
    SELECT query_id, CAST(label AS BIGINT) AS pred_label, votes
    FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY votes DESC, label) AS vr
        FROM tallied
    ) WHERE vr = 1 ORDER BY query_id
    """,
)
def sim9_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN-join classification: label each query vector by the majority
    label of its {k} nearest labeled neighbors (exact cosine; vote ties
    break to the smallest label — deterministic in both engines).  The
    similarity-search primitive applied to labeling/weak-supervision:
    propagate labels from a labeled corpus onto unlabeled points.

    Scale shape: the sim1 pattern — queries broadcast onto one
    partition-parallel corpus scan, salted two-stage top-k (no skew
    funnel through |queries| partitions), then a |queries| x |labels|
    vote tally.  Only |queries| x k rows survive the rank filter; at
    real scale the exact scan swaps for any of the ANN paths
    (sim2/sim4/sim6) unchanged, since the voter is oblivious to how
    the neighbor list was produced."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < _KNN_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = emb.where(F.col("vec_id") >= _KNN_NQ).select(
        F.col("vec_id").alias("match_id"), F.col("label"), F.col("v").alias("cv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "match_id",
        "label",
        F.round(
            dot(F.col("qv"), F.col("cv"))
            / (norm(F.col("qv")) * norm(F.col("cv"))),
            6,
        ).alias("cos_sim"),
    )
    knn = topk_per_group(
        scored,
        ["query_id"],
        [F.desc("cos_sim"), F.col("match_id")],
        k=_KNN_K,
        salt_col=F.col("match_id"),
    )
    tallied = knn.groupBy("query_id", "label").agg(
        F.count("*").alias("votes")
    )
    wv = W.partitionBy("query_id").orderBy(F.desc("votes"), F.asc("label"))
    return (
        tallied.withColumn("vr", F.row_number().over(wv))
        .where(F.col("vr") == 1)
        .select(
            "query_id",
            F.col("label").cast("long").alias("pred_label"),
            "votes",
        )
        .orderBy("query_id")
    )


sim9_knn_classify.__doc__ = sim9_knn_classify.__doc__.format(k=_KNN_K)


# --- RAG1: retrieve-then-read (ANN top-k joined back to documents) -----------


@query(
    "rag1_retrieve_read",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS match_id,
               ROUND({_COS_SQL}, 6) AS cos_sim
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY cos_sim DESC, match_id) AS rnk
        FROM scored
    ), hits AS (
        SELECT query_id, match_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
        FROM ranked WHERE rnk <= 5
    )
    SELECT h.query_id, h.rnk, h.match_id AS doc_id, d.source,
           substring(d.text, 1, 40) AS snippet, h.cos_sim
    FROM hits h JOIN documents d ON d.doc_id = h.match_id
    ORDER BY query_id, rnk
    """,
)
def rag1_retrieve_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-augmented read: the RAG data path as one declared
    dataflow — embed-space top-5 retrieval (sim1's exact scorer; any
    ANN family swaps in unchanged) followed by the READ join that
    fetches each hit's document content (vec_id doubles as doc_id in
    this corpus: every document carries one embedding row).

    Scale shape: retrieval output is |queries| x k rows — it BROADCASTS
    onto the documents scan, so the corpus is read once, filtered by
    the broadcast hash join, and only hit rows ever materialize text.
    The snippet projection keeps the result narrow (chunked serving
    would join chunk1's windows instead of raw text, same plan)."""
    docs = load_table(spark, sf_dir, "documents")
    hits = sim1_cosine_topk(spark, sf_dir).where(F.col("rnk") <= 5)
    return (
        F.broadcast(hits)
        .join(docs, hits["match_id"] == docs["doc_id"])
        .select(
            "query_id",
            "rnk",
            "doc_id",
            "source",
            F.substring("text", 1, 40).alias("snippet"),
            "cos_sim",
        )
        .orderBy("query_id", "rnk")
    )


# --- RRF1: reciprocal-rank fusion of lexical + semantic retrieval -------------

_RRF_K = 60      # the standard RRF damping constant (Cormack et al. 2009)
_RRF_DEPTH = 30  # per-leg candidate depth
_RRF_TOPK = 10


@query(
    "rrf1_hybrid_retrieval",
    oracle=f"""
    WITH sem0 AS (
        SELECT q.vec_id AS query_id, c.vec_id AS match_id,
               ROUND({_COS_SQL}, 6) AS cos_sim
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
    ),
    sem AS (
        SELECT query_id, match_id, CAST(rn AS BIGINT) AS sem_rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY cos_sim DESC, match_id
            ) AS rn FROM sem0
        ) WHERE rn <= {_RRF_DEPTH}
    ),
    dtok AS (
        SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS tok
        FROM documents
    ),
    qtok AS (SELECT doc_id AS query_id, tok FROM dtok WHERE doc_id < 5),
    lex0 AS (
        SELECT q.query_id, d.doc_id AS match_id,
               CAST(count(*) AS BIGINT) AS shared
        FROM qtok q
        JOIN dtok d ON d.tok = q.tok AND d.doc_id <> q.query_id
        GROUP BY 1, 2
    ),
    lex AS (
        SELECT query_id, match_id, CAST(rn AS BIGINT) AS lex_rank FROM (
            SELECT *, row_number() OVER (
                PARTITION BY query_id ORDER BY shared DESC, match_id
            ) AS rn FROM lex0
        ) WHERE rn <= {_RRF_DEPTH}
    ),
    fused AS (
        SELECT coalesce(s.query_id, l.query_id) AS query_id,
               coalesce(s.match_id, l.match_id) AS match_id,
               coalesce(s.sem_rank, 0) AS sem_rank,
               coalesce(l.lex_rank, 0) AS lex_rank,
               CAST(coalesce(1000000 // ({_RRF_K} + s.sem_rank), 0)
                    + coalesce(1000000 // ({_RRF_K} + l.lex_rank), 0)
                    AS BIGINT) AS rrf_micro
        FROM sem s
        FULL OUTER JOIN lex l
          ON l.query_id = s.query_id AND l.match_id = s.match_id
    )
    SELECT query_id, match_id, sem_rank, lex_rank, rrf_micro,
           CAST(rn AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY rrf_micro DESC, match_id
        ) AS rn FROM fused
    ) WHERE rn <= {_RRF_TOPK}
    ORDER BY query_id, rnk
    """,
)
def rrf1_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    2009) — the fusion rule production RAG stacks use to combine a
    lexical and a semantic retriever without score calibration: each
    leg contributes 1/(k + rank) with k = {k}, summed per candidate.
    Leg 1 (semantic): exact-cosine rank of every vector against the 5
    query vectors (sim1's scorer at depth {depth}; any ANN family
    swaps in).  Leg 2 (lexical): distinct-shared-token count with the
    query DOCUMENT (vec_id doubles as doc_id, the rag1 convention)
    through an inverted-index join.  Contributions are exact integer
    micro-units (1e6 div (k + rank)), so fusion and the final top-{t}
    are bit-identical in both engines; a candidate seen by one leg
    only carries the other leg's rank as 0.

    Scale shape: the query token set and query vectors BROADCAST (≤
    |queries| x doc-length rows); the lexical leg is one token-keyed
    inverted-index join + partial-aggregated count; the semantic leg
    is one broadcast scan; both legs end in per-query windows over
    candidate-bounded rows and fusion touches ≤ 2 x {depth} x |queries|
    rows — model-sized regardless of corpus scale.

    Reference analog: none (extends the retrieval family beside rag1 /
    mmr1, SURVEY §2.13)."""
    docs = load_table(spark, sf_dir, "documents")
    emb = _emb(spark, sf_dir)
    qs = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    cos = F.round(
        dot(F.col("v"), F.col("qv")) / (norm(F.col("v")) * norm(F.col("qv"))),
        6,
    )
    w_sem = W.partitionBy("query_id").orderBy(F.desc("cos_sim"), "match_id")
    sem = (
        emb.join(F.broadcast(qs), emb["vec_id"] != qs["query_id"])
        .select(
            "query_id", F.col("vec_id").alias("match_id"), cos.alias("cos_sim")
        )
        .withColumn("rn", F.row_number().over(w_sem))
        .where(F.col("rn") <= _RRF_DEPTH)
        .select("query_id", "match_id", F.col("rn").cast("long").alias("sem_rank"))
    )
    dtok = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
    )
    qtok = dtok.where(F.col("doc_id") < 5).select(
        F.col("doc_id").alias("query_id"), "tok"
    )
    w_lex = W.partitionBy("query_id").orderBy(F.desc("shared"), "match_id")
    lex = (
        dtok.join(F.broadcast(qtok), "tok")
        .where(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", F.col("doc_id").alias("match_id"))
        .agg(F.count("*").cast("long").alias("shared"))
        .withColumn("rn", F.row_number().over(w_lex))
        .where(F.col("rn") <= _RRF_DEPTH)
        .select("query_id", "match_id", F.col("rn").cast("long").alias("lex_rank"))
    )
    # Fusion as union + one grouped max instead of a FULL OUTER join:
    # each leg holds at most one row per (query_id, match_id), so
    # max(rank) recovers exactly the outer join's coalesce(rank, 0) —
    # one exchange on the fusion key instead of the full outer's two
    # sorted exchanges (a full outer join can never broadcast), and an
    # absent leg contributes rank 0 → no rrf term, as before.
    fused = (
        sem.select(
            "query_id", "match_id", "sem_rank", F.lit(0).cast("long").alias("lex_rank")
        )
        .unionByName(
            lex.select(
                "query_id",
                "match_id",
                F.lit(0).cast("long").alias("sem_rank"),
                "lex_rank",
            )
        )
        .groupBy("query_id", "match_id")
        .agg(
            F.max("sem_rank").alias("sem_rank"),
            F.max("lex_rank").alias("lex_rank"),
        )
        .select(
            "query_id",
            "match_id",
            "sem_rank",
            "lex_rank",
            (
                F.when(
                    F.col("sem_rank") > 0,
                    F.expr(f"1000000 div ({_RRF_K} + sem_rank)"),
                ).otherwise(F.lit(0))
                + F.when(
                    F.col("lex_rank") > 0,
                    F.expr(f"1000000 div ({_RRF_K} + lex_rank)"),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("rrf_micro"),
        )
    )
    w_f = W.partitionBy("query_id").orderBy(F.desc("rrf_micro"), "match_id")
    return (
        fused.withColumn("rnk", F.row_number().over(w_f).cast("long"))
        .where(F.col("rnk") <= _RRF_TOPK)
        .select(
            "query_id", "match_id", "sem_rank", "lex_rank", "rrf_micro", "rnk"
        )
        .orderBy("query_id", "rnk")
    )


rrf1_hybrid_retrieval.__doc__ = rrf1_hybrid_retrieval.__doc__.format(
    k=_RRF_K, depth=_RRF_DEPTH, t=_RRF_TOPK
)


# --- MMR1: Maximal Marginal Relevance diversity re-ranking -------------------

_MMR_NQ = 3
_MMR_POOL = 8
_MMR_K = 4
_MMR_LAMBDA = 0.7


def _mmr_oracle() -> str:
    """Unrolled greedy MMR replay: sel{t} picks the argmax of
    lambda*rel - (1-lambda)*max-sim-to-selected among the remaining
    pool, one CTE level per selection step."""
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 6)
    parts = [f"""
    WITH rel0 AS (
        SELECT q.vec_id AS query_id, c.vec_id AS match_id,
               ROUND({_COS_SQL}, 6) AS rel
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {_MMR_NQ}
    ),
    pool AS (
        SELECT query_id, match_id, rel FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY rel DESC, match_id) AS rn
            FROM rel0
        ) WHERE rn <= {_MMR_POOL}
    ),
    sim AS (
        SELECT p1.query_id, p1.match_id AS a, p2.match_id AS b,
               ROUND(list_cosine_similarity(
                   CAST(ea.embedding AS DOUBLE[]),
                   CAST(eb.embedding AS DOUBLE[])), 6) AS s
        FROM pool p1
        JOIN pool p2 ON p1.query_id = p2.query_id
                    AND p1.match_id <> p2.match_id
        JOIN embeddings ea ON ea.vec_id = p1.match_id
        JOIN embeddings eb ON eb.vec_id = p2.match_id
    ),
    sel1 AS (
        SELECT query_id, match_id, rel, 1 AS pick FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY rel DESC, match_id) AS rn
            FROM pool
        ) WHERE rn = 1
    ),
    all1 AS (SELECT * FROM sel1)"""]
    for t in range(2, _MMR_K + 1):
        parts.append(f""",
    sc{t} AS (
        SELECT p.query_id, p.match_id, p.rel,
               {lam} * p.rel - {mu} * max(s.s) AS score
        FROM pool p
        JOIN sim s ON s.query_id = p.query_id AND s.a = p.match_id
        JOIN all{t - 1} sel ON sel.query_id = s.query_id
                           AND sel.match_id = s.b
        WHERE NOT EXISTS (
            SELECT 1 FROM all{t - 1} x
            WHERE x.query_id = p.query_id AND x.match_id = p.match_id
        )
        GROUP BY p.query_id, p.match_id, p.rel
    ),
    sel{t} AS (
        SELECT query_id, match_id, rel, {t} AS pick FROM (
            SELECT *, row_number() OVER (PARTITION BY query_id
                                         ORDER BY score DESC, match_id) AS rn
            FROM sc{t}
        ) WHERE rn = 1
    ),
    all{t} AS (SELECT * FROM all{t - 1} UNION ALL SELECT * FROM sel{t})""")
    parts.append(f"""
    SELECT query_id, CAST(pick AS BIGINT) AS pick, match_id, rel
    FROM all{_MMR_K} ORDER BY query_id, pick""")
    return "".join(parts)


@query("mmr1_diverse_rerank", oracle=_mmr_oracle())
def mmr1_diverse_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity step between retrieval and serving: greedily
    select k = {k} of the top-{p} candidates, each step maximizing
    lambda*relevance - (1-lambda)*max-similarity-to-already-selected,
    so near-duplicate hits don't crowd the result list (the RAG
    counterpart of semantic dedup).

    Distribution of labor: the EXPENSIVE part — corpus-wide relevance
    scoring and the pool's pairwise similarity matrix — is dataflow
    (broadcast queries onto the corpus scan, pool-bounded sim joins);
    the greedy loop runs on the |queries| x pool-sized score model at
    the driver (the bpe1/markov model-sized sanction — at any corpus
    scale only pool x pool floats cross).  All inputs to the greedy
    are round(6) cosines, so driver Python, Spark, and the oracle's
    unrolled CTE replay compute bit-identical selections (same IEEE
    doubles, ties broken by id)."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < _MMR_NQ).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = emb.select(F.col("vec_id").alias("match_id"), F.col("v").alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (norm(F.col("qv")) * norm(F.col("cv"))),
                6,
            ).alias("rel"),
        )
    )
    pool = topk_per_group(
        scored,
        ["query_id"],
        [F.desc("rel"), F.col("match_id")],
        k=_MMR_POOL,
        salt_col=F.col("match_id"),
    ).select("query_id", "match_id", "rel")
    pv = pool.join(
        emb.select(F.col("vec_id").alias("match_id"), F.col("v").alias("mv")),
        "match_id",
    )
    a = pv.select("query_id", F.col("match_id").alias("a"), F.col("mv").alias("av"))
    b = pv.select("query_id", F.col("match_id").alias("b"), F.col("mv").alias("bv"))
    sims = (
        F.broadcast(a)
        .join(b, ["query_id"])
        .where(F.col("a") != F.col("b"))
        .select(
            "query_id",
            "a",
            "b",
            F.round(
                dot(F.col("av"), F.col("bv"))
                / (norm(F.col("av")) * norm(F.col("bv"))),
                6,
            ).alias("s"),
        )
    )
    pool_rows = pool.collect()
    sim_rows = sims.collect()
    rel = {}
    for r in pool_rows:
        rel.setdefault(r["query_id"], {})[r["match_id"]] = r["rel"]
    smap = {(r["query_id"], r["a"], r["b"]): r["s"] for r in sim_rows}
    out = []
    lam, mu = _MMR_LAMBDA, round(1 - _MMR_LAMBDA, 6)
    for qid, cands in rel.items():
        selected = []
        for pick in range(1, _MMR_K + 1):
            remaining = [m for m in cands if m not in selected]
            if pick == 1:
                best = min(remaining, key=lambda m: (-cands[m], m))
            else:
                def score(m):
                    mx = max(smap[(qid, m, s)] for s in selected)
                    return lam * cands[m] - mu * mx
                best = min(remaining, key=lambda m: (-score(m), m))
            selected.append(best)
            out.append((qid, pick, best, cands[best]))
    return spark.createDataFrame(
        out, "query_id bigint, pick bigint, match_id bigint, rel double"
    ).orderBy("query_id", "pick")


mmr1_diverse_rerank.__doc__ = mmr1_diverse_rerank.__doc__.format(
    k=_MMR_K, p=_MMR_POOL
)


# --- SIM10: hard-negative mining (round 6) -----------------------------------

_HN_K = 8
_HN_NQ = 10


@query(
    "sim10_hard_negatives",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, q.label AS query_label,
               c.vec_id AS neg_id, c.label AS neg_label,
               ROUND({_COS_SQL}, 6) AS cos_sim
        FROM embeddings q JOIN embeddings c
          ON c.vec_id <> q.vec_id AND c.label <> q.label
        WHERE q.vec_id < {_HN_NQ}
    )
    SELECT query_id, CAST(query_label AS BIGINT) AS query_label,
           neg_id, CAST(neg_label AS BIGINT) AS neg_label,
           cos_sim, CAST(rn AS BIGINT) AS rnk
    FROM (
        SELECT *, row_number() OVER (
            PARTITION BY query_id ORDER BY cos_sim DESC, neg_id
        ) AS rn FROM scored
    ) WHERE rn <= {_HN_K} ORDER BY query_id, rnk
    """,
)
def sim10_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE mining for contrastive training (the DPR/Contriever
    recipe: a dense retriever trains best against negatives that are
    semantically CLOSE to the anchor but wrong): for each anchor vector,
    the top-{k} highest-cosine vectors whose label DIFFERS — i.e. the
    most confusable out-of-class examples.  The output is the
    (anchor, negative) training-pair manifest a contrastive data loader
    consumes.

    Scale shape: identical to sim9's kNN join — anchors broadcast onto
    one partition-parallel corpus scan, the label-mismatch predicate
    prunes map-side, salted two-stage top-k; at real scale the exact
    scan swaps for any ANN path (sim2/sim4/sim6) unchanged.  Exact and
    fully oracle-checked (label predicate, cosine, rank ties).
    Reference analog: none — ANN-family extension (SURVEY §2.13)."""
    emb = _emb(spark, sf_dir)
    q = emb.where(F.col("vec_id") < _HN_NQ).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").cast("long").alias("query_label"),
        F.col("v").alias("qv"),
    )
    c = emb.select(
        F.col("vec_id").alias("neg_id"),
        F.col("label").cast("long").alias("neg_label"),
        F.col("v").alias("cv"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(
            (F.col("neg_id") != F.col("query_id"))
            & (F.col("neg_label") != F.col("query_label"))
        )
        .select(
            "query_id",
            "query_label",
            "neg_id",
            "neg_label",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (norm(F.col("qv")) * norm(F.col("cv"))),
                6,
            ).alias("cos_sim"),
        )
    )
    return topk_per_group(
        scored,
        ["query_id"],
        [F.desc("cos_sim"), F.col("neg_id")],
        k=_HN_K,
        salt_col=F.col("neg_id"),
    ).orderBy("query_id", "rnk")


sim10_hard_negatives.__doc__ = sim10_hard_negatives.__doc__.format(k=_HN_K)


# --- MRL1: matryoshka-truncation recall (round 6) ----------------------------

_MRL_DIM = 16


@query(
    "mrl1_matryoshka_recall",
    oracle=f"""
    WITH exact AS (
        SELECT query_id, match_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND({_COS_SQL}, 6) DESC, c.vec_id
                   ) AS rn
            FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
            WHERE q.vec_id < 5
        ) WHERE rn <= 10
    ),
    trunc AS (
        SELECT query_id, match_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS match_id,
                   row_number() OVER (
                       PARTITION BY q.vec_id
                       ORDER BY ROUND(list_cosine_similarity(
                           (CAST(q.embedding AS DOUBLE[]))[1:{_MRL_DIM}],
                           (CAST(c.embedding AS DOUBLE[]))[1:{_MRL_DIM}]
                       ), 6) DESC, c.vec_id
                   ) AS rn
            FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
            WHERE q.vec_id < 5
        ) WHERE rn <= 10
    )
    SELECT e.query_id,
           CAST(count(t.match_id) AS BIGINT) AS n_hit,
           CAST(count(*) AS BIGINT) AS k,
           ROUND(count(t.match_id) / CAST(count(*) AS DOUBLE), 6)
               AS recall_at_10
    FROM exact e LEFT JOIN trunc t
      ON t.query_id = e.query_id AND t.match_id = e.match_id
    GROUP BY e.query_id ORDER BY e.query_id
    """,
)
def mrl1_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-truncation recall eval (Kusupati et al. 2022, "
    Matryoshka Representation Learning"): rank by cosine over only the
    FIRST {d} of 64 dimensions and measure recall@10 against the
    full-dimension exact top-10 — the measurement that tells an index
    owner whether truncated (4x cheaper) vectors are servable.  The
    eval1/2/3 harness applied to the dimension-truncation axis instead
    of the quantization axis.

    Scale shape: both arms are the sim1 plan (broadcast queries, one
    corpus scan, salted top-k); truncation is a map-side slice, so the
    cheap arm reads {d}/64ths of the vector bytes — exactly the
    production saving being evaluated.  Fully oracle-checked (DuckDB
    replays both rankings and the recall join)."""
    emb = _emb(spark, sf_dir)
    exact = sim1_cosine_topk(spark, sf_dir)
    tr = emb.select(
        "vec_id", F.slice(F.col("v"), 1, _MRL_DIM).alias("v")
    )
    q = tr.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    c = tr.select(F.col("vec_id").alias("match_id"), F.col("v").alias("cv"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            F.round(
                dot(F.col("qv"), F.col("cv"))
                / (norm(F.col("qv")) * norm(F.col("cv"))),
                6,
            ).alias("cos_sim"),
        )
    )
    trunc = topk_per_group(
        scored,
        ["query_id"],
        [F.desc("cos_sim"), F.col("match_id")],
        k=10,
        salt_col=F.col("match_id"),
    )
    return _ann_recall(exact, trunc).orderBy("query_id")


mrl1_matryoshka_recall.__doc__ = mrl1_matryoshka_recall.__doc__.format(
    d=_MRL_DIM
)


# --- SQ1: int8 scalar-quantization servability eval (round 7) ----------------
#
# mrl1 measures the dimension-truncation axis of embedding-serving
# compression; this measures the other axis every vector index tunes:
# byte-width.  Per-dimension min/max scalar quantization to int8 codes
# (FAISS SQ8 / Lucene scalar quantization), then recall@10 of the
# quantized ranking against exact float cosine.  Verdict r6 #6.

_SQ_LEVELS = 255


def _sq1_approx_sql() -> str:
    """Quantized-arm replay: per-dim stats, int8 codes, integer dot and
    norm, ranking by dot/sqrt(norm).  All ranking inputs are INTEGERS;
    the sort key divides exact-integer-valued doubles with one
    correctly-rounded IEEE sqrt and divide, so both engines produce
    bit-identical keys (no round() needed — the cross-engine-exact
    ranking VERDICT r6 #6 asks for, in sortable-key form: a literal
    cross-multiplied comparison cannot feed a window ORDER BY, and
    dot^2 * norm products overflow BIGINT at 64 dims)."""
    return f"""
    WITH unn AS MATERIALIZED (
        SELECT vec_id, unnest(CAST(embedding AS DOUBLE[])) AS x,
               unnest(range(1, len(embedding) + 1)) AS i
        FROM embeddings
    ),
    st AS MATERIALIZED (
        SELECT i, min(x) AS mn, max(x) AS mx FROM unn GROUP BY i
    ),
    codes AS MATERIALIZED (
        SELECT vec_id, u.i,
               CASE WHEN mx = mn THEN CAST(0 AS BIGINT)
                    ELSE CAST(least({_SQ_LEVELS}, greatest(0,
                         floor(((x - mn) * {_SQ_LEVELS}.0) / (mx - mn))))
                         AS BIGINT)
               END AS code
        FROM unn u JOIN st ON st.i = u.i
    ),
    nb AS (SELECT vec_id, sum(code * code) AS n2 FROM codes GROUP BY vec_id),
    dt AS (
        SELECT q.vec_id AS query_id, c.vec_id AS match_id,
               sum(q.code * c.code) AS d
        FROM codes q JOIN codes c ON c.i = q.i AND c.vec_id <> q.vec_id
        WHERE q.vec_id < 5
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT query_id, match_id,
               CASE WHEN nb.n2 = 0 THEN -2.0
                    ELSE CAST(d AS DOUBLE) / sqrt(CAST(nb.n2 AS DOUBLE))
               END AS s
        FROM dt JOIN nb ON nb.vec_id = dt.match_id
    )
    SELECT query_id, match_id FROM (
        SELECT *, row_number() OVER (PARTITION BY query_id
                                     ORDER BY s DESC, match_id) AS rn
        FROM scored
    ) WHERE rn <= 10
    """


def _sq1_oracle() -> str:
    from .registry import ORACLES

    return f"""
    WITH exact AS ({ORACLES["sim1_cosine_topk"]}),
    approx AS ({_sq1_approx_sql()})
    SELECT exact.query_id,
           CAST(SUM(CASE WHEN approx.match_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           count(*) AS k,
           ROUND(CAST(SUM(CASE WHEN approx.match_id IS NOT NULL
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 6) AS recall_at_10
    FROM exact LEFT JOIN approx
      ON approx.query_id = exact.query_id
     AND approx.match_id = exact.match_id
    GROUP BY exact.query_id
    ORDER BY exact.query_id
    """


@query("sq1_int8_recall", oracle=_sq1_oracle())
def sq1_int8_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar-quantization servability eval: quantize every
    embedding to per-dimension min/max int8 codes (code = floor((x -
    min) * 255 / (max - min)), the FAISS-SQ8 recipe), rank by quantized
    cosine, and report recall@10 against the exact float top-10 (sim1)
    — mrl1's harness applied to byte-width instead of dimension count.
    A passing recall here is the measurement that licenses serving 4x
    smaller vectors.

    Determinism: codes are integers on both engines (the quantizer is
    three exactly-rounded IEEE double ops on identical inputs, then
    floor); dot products and norms are exact BIGINT sums; the ranking
    key dot/sqrt(norm) divides exact-integer-valued doubles with one
    correctly-rounded sqrt and divide, so the keys are bit-identical
    cross-engine and ties fall to match_id.  Zero-norm codes rank at a
    -2.0 sentinel (below any cosine) on both sides.

    Scale shape: the per-dim stats are ONE partial-aggregated shuffle
    collapsing to a 64-row model table (fs1's broadcast-stat device),
    inlined as literals so quantization is a pure map-side ``transform``
    over the vector column; the quantized arm then runs sim1's plan —
    broadcast queries, one corpus scan, salted top-k — on integer
    arithmetic.  At 100 TB the int8 arm reads the same bytes but ships
    4x smaller codes through the top-k exchange, exactly the production
    saving being measured."""
    emb = _emb(spark, sf_dir)
    stats = (
        emb.select(F.posexplode("v").alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    mn = [r["mn"] for r in sorted(stats, key=lambda r: r["i"])]
    mx = [r["mx"] for r in sorted(stats, key=lambda r: r["i"])]
    mn_arr = F.array(*[F.lit(v) for v in mn])
    mx_arr = F.array(*[F.lit(v) for v in mx])

    def quant(col):
        def one(x, i):
            lo = F.element_at(mn_arr, i + 1)
            hi = F.element_at(mx_arr, i + 1)
            code = F.floor(((x - lo) * _SQ_LEVELS) / (hi - lo))
            return (
                F.when(hi == lo, F.lit(0).cast("long"))
                .otherwise(
                    F.least(F.lit(255).cast("long"), F.greatest(F.lit(0).cast("long"), code))
                )
                .cast("long")
            )

        return F.transform(col, one)

    coded = emb.select("vec_id", quant(F.col("v")).alias("cd"))
    idot = lambda a, b: F.aggregate(  # noqa: E731 — integer-exact dot
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    q = coded.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("cd").alias("qc")
    )
    c = coded.select(
        F.col("vec_id").alias("match_id"),
        F.col("cd").alias("cc"),
        idot(F.col("cd"), F.col("cd")).alias("n2"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("match_id") != F.col("query_id"))
        .select(
            "query_id",
            "match_id",
            F.when(F.col("n2") == 0, F.lit(-2.0))
            .otherwise(
                idot(F.col("qc"), F.col("cc")).cast("double")
                / F.sqrt(F.col("n2").cast("double"))
            )
            .alias("s"),
        )
    )
    approx = topk_per_group(
        scored,
        ["query_id"],
        [F.desc("s"), F.col("match_id")],
        k=10,
        salt_col=F.col("match_id"),
    )
    return _ann_recall(sim1_cosine_topk(spark, sf_dir), approx).orderBy(
        "query_id"
    )


# --- SIM11: incremental IVF index maintenance (round 8) ------------------------


def _sim11_tower_sql(p: str, train_pred: str, k: int, iters: int) -> str:
    """CTE fragments for one portable-k-means IVF tower (prefix ``p``):
    init + ``iters`` Lloyd rounds trained on rows matching
    ``train_pred``, then a FINAL assignment of ALL vectors (``{p}af``)
    and the per-query top-10 (``{p}t``).  The sim5b machinery with
    prefixed names so sim11 can stand TWO towers (base-trained vs
    full-retrained) in one oracle."""
    parts = [
        f""",
    {p}c0 AS MATERIALIZED (
        SELECT row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) - 1 AS cent_id,
               v AS cv
        FROM qe WHERE {train_pred}
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT {k}
    )"""
    ]

    def assign(name: str, cents: str, pred: str) -> str:
        return f""",
    {name} AS MATERIALIZED (
        SELECT vec_id, v, q, cell FROM (
            SELECT e.vec_id, e.v, e.q, c.cent_id AS cell,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, c.cv)
                                / sqrt(list_dot_product(c.cv, c.cv)) DESC,
                                c.cent_id
                   ) AS rn
            FROM qe e CROSS JOIN {cents} c WHERE {pred}
        ) WHERE rn = 1
    )"""

    for t in range(1, iters + 1):
        parts.append(assign(f"{p}a{t}", f"{p}c{t - 1}", train_pred))
        parts.append(
            f""",
    {p}c{t} AS MATERIALIZED (
        SELECT {p}c{t - 1}.cent_id, COALESCE(l.cv_new, {p}c{t - 1}.cv) AS cv
        FROM {p}c{t - 1} LEFT JOIN (
            SELECT cell, list(mval ORDER BY pos) AS cv_new FROM (
                SELECT cell, pos,
                       CAST(SUM(qx) AS DOUBLE) / (COUNT(*) * 1000000.0)
                           AS mval
                FROM (
                    SELECT cell, UNNEST(q) AS qx,
                           UNNEST(range(1, len(q) + 1)) AS pos
                    FROM {p}a{t}
                ) GROUP BY cell, pos
            ) GROUP BY cell
        ) l ON l.cell = {p}c{t - 1}.cent_id
    )"""
        )
    parts.append(assign(f"{p}af", f"{p}c{iters}", "TRUE"))
    parts.append(
        f""",
    {p}probes AS (
        SELECT query_id, quv, cell FROM (
            SELECT q2.query_id, q2.quv, c.cent_id AS cell,
                   row_number() OVER (
                       PARTITION BY q2.query_id
                       ORDER BY list_cosine_similarity(q2.quv, c.cv) DESC,
                                c.cent_id
                   ) AS rn
            FROM queries q2 CROSS JOIN {p}c{iters} c
        ) WHERE rn <= 2
    ),
    {p}t AS MATERIALIZED (
        SELECT query_id, match_id FROM (
            SELECT pr.query_id, a.vec_id AS match_id,
                   row_number() OVER (
                       PARTITION BY pr.query_id
                       ORDER BY ROUND(list_cosine_similarity(pr.quv, a.v), 6)
                                    DESC,
                                a.vec_id
                   ) AS rn
            FROM {p}probes pr JOIN {p}af a ON a.cell = pr.cell
            WHERE a.vec_id <> pr.query_id
        ) WHERE rn <= 10
    )"""
    )
    return "".join(parts)


def _sim11_oracle(k: int = _KMB_K, iters: int = _KMB_ITERS) -> str:
    split = "(SELECT split FROM nn)"
    return f"""
    WITH emb AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    qe AS MATERIALIZED (
        SELECT vec_id, v,
               list_transform(v, x -> CAST(round(x * 1000000.0) AS BIGINT))
                   AS q
        FROM emb
    ),
    nn AS (SELECT CAST(count(*) // 2 AS BIGINT) AS split FROM emb),
    queries AS (SELECT vec_id AS query_id, v AS quv FROM emb
                WHERE vec_id < 5)
    {_sim11_tower_sql("b_", f"vec_id < {split}", k, iters)}
    {_sim11_tower_sql("f_", "TRUE", k, iters)},
    growth AS (
        SELECT cell,
               CAST(sum(CASE WHEN vec_id < {split} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_base,
               CAST(sum(CASE WHEN vec_id >= {split} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_delta
        FROM b_af GROUP BY cell
    ),
    rec AS (
        SELECT CAST((1000 * (SELECT CAST(count(*) AS BIGINT)
                             FROM b_t JOIN f_t USING (query_id, match_id)))
                    // (SELECT CAST(count(DISTINCT query_id) * 10 AS BIGINT)
                        FROM f_t) AS BIGINT) AS recall_permille
    )
    SELECT CAST(cell AS BIGINT) AS cell, n_base, n_delta,
           CAST((1000 * n_delta) // greatest(n_base, 1) AS BIGINT)
               AS growth_permille,
           recall_permille
    FROM growth CROSS JOIN rec ORDER BY cell
    """


def _sim11_store_dir(sf_dir: str, split: int) -> str:
    """Per-(corpus, split, process) parquet store for sim11's persisted
    index.  Keyed by the sf_dir digest + base-row count so different
    scale factors never share an index, and pid-suffixed so concurrent
    drivers on one host can't clobber each other mid-build (the
    storage_queries._workdir convention)."""
    digest = hashlib.md5(
        os.path.abspath(sf_dir).encode("utf-8")
    ).hexdigest()[:10]
    return os.path.join(
        tempfile.gettempdir(),
        f"ecostream_sim11_{digest}_{split}_{os.getpid()}",
    )


@query("sim11_ivf_incremental", oracle=_sim11_oracle())
def sim11_ivf_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ANN index maintenance (VERDICT r7 #8), lakehouse
    form (VERDICT r8 #5) — d12's incremental-dedup discipline applied
    to the vector side: the IVF index trained on the BASE half of the
    corpus (portable k-means, sim5b's exactly-replayable trainer)
    absorbs the DELTA half by ASSIGNING the new vectors to the
    existing centroids — no retrain, no touch of the already-indexed
    vectors, which is how a 100 TB vector store actually ingests
    (FAISS add-after-train; Milvus/Vespa segment appends).  Reported
    per cell: base size, delta growth, growth permille — the signal an
    index operator watches to decide when drift justifies a retrain —
    plus recall@10 of the merged (stale-centroid) index against a FULL
    RETRAIN on all vectors, the price-of-staleness measurement.

    THE INDEX IS A STORED TABLE (the roll2/s11 pattern): the first run
    against a corpus trains the base tower, writes {centroids, base
    assignments, retrain-eval centroids} to a parquet store, and every
    later run READS the store — so the declared query pays only
    delta-assign + serve + recall, exactly what a production ingest
    pays.  The retrain tower lives behind the eval: its centroids are
    the stored baseline from the last full rebuild, and only its SERVE
    re-runs per query.  (Training artifacts are 8×64 model tables plus
    one (vec_id, v, cell) base index — parquet round-trips the doubles
    bit-exactly, so stored-index results are identical to
    built-fresh.)

    Exactness: both towers (base-trained and full-retrained) use the
    integer-quantized portable trainer, so the oracle replays init,
    every Lloyd round, both final assignments, both probe top-10s, the
    pair overlap, and the integer permilles — the whole maintenance
    story is hash-pinned, not just row counts.

    Scale shape: the delta assignment is ONE broadcast-centroid
    map-side argmax over only the NEW vectors (the entire point:
    ingest cost tracks delta size, not index size); the merged serve
    is sim4's bucketed probe.  Recall denominator uses the rebuild's
    own result size so partially-filled probe cells can't inflate the
    score."""
    emb = materialize_training_set(_emb(spark, sf_dir))
    n = emb.count()
    split = n // 2
    delta = emb.where(F.col("vec_id") >= split)
    store = _sim11_store_dir(sf_dir, split)
    paths = {
        name: os.path.join(store, name)
        for name in ("cents_base", "base_assign", "cents_full")
    }
    if not all(
        os.path.exists(os.path.join(p, "_SUCCESS")) for p in paths.values()
    ):
        base = emb.where(F.col("vec_id") < split)
        cb = kmeans_centroids_portable(spark, base, materialized=True)
        cb.write.mode("overwrite").parquet(paths["cents_base"])
        ivf_assign(base, cb).write.mode("overwrite").parquet(
            paths["base_assign"]
        )
        kmeans_centroids_portable(
            spark, emb, materialized=True
        ).write.mode("overwrite").parquet(paths["cents_full"])
    cents_base = spark.read.parquet(paths["cents_base"])
    base_assigned = spark.read.parquet(paths["base_assign"])
    cents_full = spark.read.parquet(paths["cents_full"])
    # The incremental op: ONLY the delta rows are assigned against the
    # frozen (stored) centroids; the base assignment is READ from the
    # stored index.
    merged = base_assigned.unionByName(ivf_assign(delta, cents_base))
    ann_merged = ivf_ann_topk(emb, cents_base, assigned=merged)
    ann_rebuild = ivf_ann_topk(emb, cents_full)
    # Both sides are per-query top-10s (≤ 5 queries × k=10 rows at ANY
    # corpus scale — bounded by the vec_id < 5 query set, not the
    # corpus), but their checkpoint-cut lineage hides size stats from
    # the planner, which falls back to SortMergeJoin (the k4 fix):
    # broadcast the rebuild side explicitly.
    overlap = (
        ann_merged.select("query_id", "match_id")
        .join(F.broadcast(ann_rebuild.select("query_id", "match_id")),
              ["query_id", "match_id"])
        .agg(F.count("*").cast("long").alias("overlap"))
    )
    den = ann_rebuild.agg(
        (F.countDistinct("query_id") * 10).cast("long").alias("den")
    )
    recall = (
        overlap.crossJoin(F.broadcast(den))
        .select(
            F.expr("(1000 * overlap) div den")
            .cast("long")
            .alias("recall_permille")
        )
    )
    growth = merged.groupBy("cell").agg(
        F.sum((F.col("vec_id") < split).cast("long"))
        .cast("long")
        .alias("n_base"),
        F.sum((F.col("vec_id") >= split).cast("long"))
        .cast("long")
        .alias("n_delta"),
    )
    return (
        growth.crossJoin(F.broadcast(recall))
        .select(
            F.col("cell").cast("long").alias("cell"),
            "n_base",
            "n_delta",
            F.expr("(1000 * n_delta) div greatest(n_base, 1L)")
            .cast("long")
            .alias("growth_permille"),
            "recall_permille",
        )
        .orderBy("cell")
    )


# --- DECON2: embedding-level (semantic) benchmark decontamination (round 9) --

_DECON2_THR_MICRO = 850_000  # audit bar: cosine 0.85 in micro units


def _decon2_oracle() -> str:
    return f"""
    WITH e AS MATERIALIZED (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    d AS (SELECT doc_id, source FROM documents),
    nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
    params AS (
        SELECT greatest(4, least(n // 128,
                                 4 * CAST(CEIL(SQRT(n)) AS BIGINT))) AS k,
               CAST(CEIL(SQRT(greatest(4, least(n // 128,
                   4 * CAST(CEIL(SQRT(n)) AS BIGINT))))) AS BIGINT) AS b
        FROM nn
    ),
    cents AS MATERIALIZED (
        SELECT row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) - 1 AS cent_id,
               v AS cv
        FROM e
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
        LIMIT (SELECT k FROM params)
    ),
    supers AS MATERIALIZED (
        SELECT cent_id AS sup_id, cv AS sv FROM cents
        WHERE cent_id < (SELECT b FROM params)
    ),
    cbr AS MATERIALIZED (
        SELECT cent_id, cv,
               CASE WHEN cent_id < (SELECT b FROM params)
                    THEN cent_id ELSE pick END AS branch
        FROM (
            SELECT c.cent_id, c.cv, s.sup_id AS pick,
                   row_number() OVER (
                       PARTITION BY c.cent_id
                       ORDER BY list_dot_product(c.cv, s.sv)
                                / sqrt(list_dot_product(s.sv, s.sv)) DESC,
                                s.sup_id
                   ) AS rn
            FROM cents c CROSS JOIN supers s
        ) WHERE rn = 1
    ),
    vbr AS MATERIALIZED (
        SELECT vec_id, v, pick AS branch FROM (
            SELECT e.vec_id, e.v, s.sup_id AS pick,
                   row_number() OVER (
                       PARTITION BY e.vec_id
                       ORDER BY list_dot_product(e.v, s.sv)
                                / sqrt(list_dot_product(s.sv, s.sv)) DESC,
                                s.sup_id
                   ) AS rn
            FROM e CROSS JOIN supers s
        ) WHERE rn = 1
    ),
    asg AS MATERIALIZED (
        SELECT vec_id, v, cell FROM (
            SELECT vb.vec_id, vb.v, c.cent_id AS cell,
                   row_number() OVER (
                       PARTITION BY vb.vec_id
                       ORDER BY list_dot_product(vb.v, c.cv)
                                / sqrt(list_dot_product(c.cv, c.cv)) DESC,
                                c.cent_id
                   ) AS rn
            FROM vbr vb JOIN cbr c ON c.branch = vb.branch
        ) WHERE rn = 1
    ),
    lab AS (
        SELECT a.vec_id, a.v, a.cell, d.source
        FROM asg a JOIN d ON d.doc_id = a.vec_id
    ),
    bench AS (SELECT cell, vec_id AS match_id, v AS bv
              FROM lab WHERE source = 'src0'),
    train AS (SELECT cell, vec_id AS t_doc, v AS tv
              FROM lab WHERE source <> 'src0'),
    scored AS (
        SELECT t.t_doc AS doc_id, b.match_id,
               ROUND(list_cosine_similarity(t.tv, b.bv), 6) AS c
        FROM train t JOIN bench b USING (cell)
    ),
    best AS (
        SELECT doc_id, match_id, c FROM (
            SELECT *, row_number() OVER (
                PARTITION BY doc_id ORDER BY c DESC, match_id
            ) AS rn FROM scored
        ) WHERE rn = 1
    ),
    ranked AS (
        SELECT doc_id, match_id,
               CAST(round(c * 1000000) AS BIGINT) AS cos_micro,
               row_number() OVER (ORDER BY c DESC, doc_id) AS rk
        FROM best
    )
    SELECT doc_id, match_id, cos_micro,
           cos_micro - {_DECON2_THR_MICRO} AS margin_micro,
           cos_micro >= {_DECON2_THR_MICRO} AS is_flagged
    FROM ranked
    WHERE rk <= greatest(10, (SELECT n FROM nn) // 50)
    ORDER BY doc_id
    """


@query("decon2_semantic_overlap", oracle=_decon2_oracle())
def decon2_semantic_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-level benchmark decontamination (VERDICT r8 #3):
    decon1/t9 catch EXACT n-gram contamination; paraphrased leakage —
    reworded benchmark passages whose token n-grams no longer collide —
    needs the embedding axis.  Every train document is scored against
    the benchmark set (source 'src0', vec_id doubles as doc_id — the
    rag1 convention) by cosine in embedding space, and the query emits
    a ranked semantic-overlap WATCHLIST: the top-K most
    benchmark-similar train docs with their closest benchmark doc, the
    cosine in micro units, the signed margin against the 0.85 audit
    bar, and the flag.  Clean corpora yield negative margins (the audit
    evidence: "closest doc is this far BELOW the bar"); planted
    paraphrases surface with positive margin — tests/test_decon2.py
    plants them and asserts 100% recall.

    Candidates are BUCKETED, never all-pairs (the sim4/semdedup
    discipline): all vectors are assigned to their nearest of
    max(4, min(n/128, 4*sqrt(n))) deterministic coarse centroids
    (sqrt-capped seed table — O(sqrt(n)) driver rows; the k md5-lowest
    vectors — portable order, no training) via the TWO-LEVEL
    broadcast-centroid argmax (route through ceil(sqrt(k)) supers,
    then in-branch argmax — the semdedup3 device; the round-9 stress
    run measured the flat n·k assignment at quadratic onset under the
    count-adaptive k), and only same-cell (train, bench) pairs are
    scored.  The cell count GROWS with the corpus (the er1/d14
    count-adaptive-key rule), so candidate volume stays ~linear; the
    bench side of the cell join is broadcast (benchmark suites are
    small by construction at any corpus scale).  The final top-K is a
    TakeOrderedAndProject, K = max(10, n/50) — count-adaptive so the
    signature is non-vacuous at every gate scale (the t14 lesson).

    Exactness: cosine is round(.,6) on identical IEEE op sequences
    (the sim4/rag1 twin device), micro units are its exact integer
    image, and ranking ties fall to doc_id — the oracle replays
    centroid choice, assignment, cell join, argmax, and the top-K."""
    import math

    emb = _emb(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    n = emb.count()
    # sqrt-capped count-adaptive k (VERDICT r10 #3) — see sim13's
    # in-source argument: identical results through n = 262144, and the
    # seed collect is O(sqrt(n)) instead of linear in the corpus.
    k_cells = max(4, min(n // 128, 4 * math.ceil(math.sqrt(n))))
    b = math.ceil(math.sqrt(k_cells))
    init = (
        emb.orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
        .limit(k_cells)
        .select("v")
        .collect()
    )
    cents = spark.createDataFrame(
        [(i, list(r["v"])) for i, r in enumerate(init)],
        "cent_id long, cv_cent array<double>",
    )
    supers = spark.createDataFrame(
        [(i, list(r["v"])) for i, r in enumerate(init[:b])],
        "cent_id long, cv_cent array<double>",
    )
    # Two-level assignment (the semdedup3 device): centroid -> branch
    # (k x b flyspeck, with each super PINNED to its own branch so no
    # routed branch can be leaf-empty), vector -> branch (n x b dots),
    # then the in-branch argmax (n x k/b expected) -- ~2n*sqrt(k)
    # instead of the flat n*k, which the round-9 stress run measured
    # quadratic-onset under the count-adaptive k = n/128.
    cbr = (
        ivf_assign(
            cents.select(
                F.col("cent_id").alias("vec_id"),
                F.col("cv_cent").alias("v"),
            ),
            supers,
        )
        .select(
            F.col("vec_id").alias("cent_id"),
            F.expr(f"CASE WHEN vec_id < {b} THEN vec_id ELSE cell END")
            .alias("branch"),
        )
        .join(cents, "cent_id")
        .select("branch", "cent_id", "cv_cent")
    )
    vbr = ivf_assign(emb, supers).select(
        "vec_id", "v", F.col("cell").alias("branch")
    )
    asg = ivf_assign_within(vbr, cbr)
    # NOTE (r12): a lazy checkpoint here (to cut the two-consumer
    # bench/train split) measured 2.66 → 5.4 s — the two branches'
    # identical upstream subplans already collapse via exchange reuse,
    # so the cut only added a corpus-wide array materialization.
    lab = asg.join(docs, asg["vec_id"] == docs["doc_id"]).select(
        "vec_id", "v", "cell", "source"
    )
    bench = lab.where(F.col("source") == "src0").select(
        "cell", F.col("vec_id").alias("match_id"), F.col("v").alias("bv")
    )
    train = lab.where(F.col("source") != "src0").select(
        "cell", F.col("vec_id").alias("t_doc"), F.col("v").alias("tv")
    )
    scored = train.join(F.broadcast(bench), "cell").select(
        F.col("t_doc").alias("doc_id"),
        "match_id",
        F.round(
            dot(F.col("tv"), F.col("bv"))
            / (norm(F.col("tv")) * norm(F.col("bv"))),
            6,
        ).alias("c"),
    )
    best = scored.groupBy("doc_id").agg(
        F.max(
            F.struct(
                F.col("c").alias("c"),
                (-F.col("match_id")).cast("long").alias("neg_m"),
            )
        ).alias("m")
    )
    k_watch = max(10, n // 50)
    ranked = (
        best.select(
            "doc_id",
            (-F.col("m.neg_m")).cast("long").alias("match_id"),
            F.round(F.col("m.c") * 1_000_000).cast("long").alias("cos_micro"),
        )
        .orderBy(F.desc("cos_micro"), "doc_id")
        .limit(k_watch)
    )
    return ranked.select(
        "doc_id",
        "match_id",
        "cos_micro",
        (F.col("cos_micro") - F.lit(_DECON2_THR_MICRO))
        .cast("long")
        .alias("margin_micro"),
        (F.col("cos_micro") >= _DECON2_THR_MICRO).alias("is_flagged"),
    ).orderBy("doc_id")


# --- COV1: embedding covariance / correlation matrix (round 9) ------------------


@query(
    "cov1_embedding_covariance",
    oracle="""
    WITH q AS MATERIALIZED (
        SELECT vec_id,
               list_transform(embedding::DOUBLE[],
                              x -> CAST(round(x * 1000) AS BIGINT)) AS q
        FROM embeddings
    ),
    flat AS MATERIALIZED (
        SELECT vec_id, UNNEST(q) AS qv, UNNEST(range(0, len(q))) AS i
        FROM q
    ),
    pairs AS MATERIALIZED (
        SELECT a.i AS i, b.i AS j, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(a.qv * b.qv) AS BIGINT) AS m,
               CAST(sum(a.qv) AS BIGINT) AS si,
               CAST(sum(b.qv) AS BIGINT) AS sj
        FROM flat a JOIN flat b ON b.vec_id = a.vec_id AND b.i >= a.i
        GROUP BY a.i, b.i
    ),
    diag AS (
        SELECT i, CAST(n * m - si * si AS BIGINT) AS v
        FROM pairs WHERE i = j
    )
    SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j, p.n,
           CAST(p.n * p.m - p.si * p.sj AS BIGINT) AS cov_num,
           CASE WHEN di.v > 0 AND dj.v > 0
                THEN CAST(round(1000000.0
                     * (CAST(p.n * p.m - p.si * p.sj AS DOUBLE)
                        / sqrt(CAST(di.v AS DOUBLE)
                               * CAST(dj.v AS DOUBLE)))) AS BIGINT)
                ELSE 0 END AS corr_micro
    FROM pairs p JOIN diag di ON di.i = p.i JOIN diag dj ON dj.i = p.j
    ORDER BY i, j
    """,
)
def cov1_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding covariance/correlation matrix — the one-pass moment
    precursor to PCA, whitening, and dimension-collapse audits (an
    embedding column whose dimensions correlate strongly wastes index
    bytes; MRL truncation (mrl1) assumes leading-dim energy this
    matrix measures).  Components quantize to exact milli integers;
    per (i ≤ j) cell the moments n, Σqi, Σqj, Σqiqj are exact BIGINT
    sums, the covariance numerator is the cross-multiplied
    n·Σqiqj − Σqi·Σqj (no mean ever divides), and Pearson r lands as
    ONE exactly-rounded double division per cell (the sq1 device),
    micro-quantized with a zero-variance guard.

    Scale shape: the dim² expansion happens ENTIRELY map-side — each
    vector row flat-maps to its dim·(dim+1)/2 upper-triangle terms
    in-row (posexplode + slice: no self-join, no shuffle of vector
    rows) — and partial aggregation collapses every partition to the
    2,080-cell model before the single exchange.  The output is the
    dim² model table at any corpus scale; a 100 TB run shuffles
    2,080 partial rows per partition, nothing else."""
    e = _emb(spark, sf_dir).select(
        F.expr("transform(v, x -> CAST(round(x * 1000) AS BIGINT))").alias(
            "q"
        )
    )
    ii = e.select(F.posexplode("q").alias("i", "qi"), "q")
    pairs_raw = ii.select(
        "i",
        "qi",
        F.posexplode(F.expr("slice(q, i + 1, size(q) - i)")).alias(
            "jj", "qj"
        ),
    ).select(
        "i",
        (F.col("i") + F.col("jj")).alias("j"),
        "qi",
        "qj",
    )
    pairs = pairs_raw.groupBy("i", "j").agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col("qi") * F.col("qj")).cast("long").alias("m"),
        F.sum("qi").cast("long").alias("si"),
        F.sum("qj").cast("long").alias("sj"),
    )
    diag = pairs.where(F.col("i") == F.col("j")).select(
        F.col("i").alias("di"),
        (F.col("n") * F.col("m") - F.col("si") * F.col("si"))
        .cast("long")
        .alias("v"),
    )
    d1 = diag.select(F.col("di").alias("d1i"), F.col("v").alias("vi"))
    d2 = diag.select(F.col("di").alias("d2i"), F.col("v").alias("vj"))
    return (
        pairs.join(F.broadcast(d1), pairs["i"] == d1["d1i"])
        .join(F.broadcast(d2), pairs["j"] == d2["d2i"])
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            "n",
            (F.col("n") * F.col("m") - F.col("si") * F.col("sj"))
            .cast("long")
            .alias("cov_num"),
            F.when(
                (F.col("vi") > 0) & (F.col("vj") > 0),
                F.expr(
                    "CAST(round(1000000.0"
                    " * (CAST(n * m - si * sj AS DOUBLE)"
                    "    / sqrt(CAST(vi AS DOUBLE) * CAST(vj AS DOUBLE))))"
                    " AS BIGINT)"
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("corr_micro"),
        )
        .orderBy("i", "j")
    )


# --- PCA1: top principal component by integer power iteration (round 9) ---------
#
# cov1 measures the moment matrix; this extracts the dominant
# eigenvector of the COVARIANCE (cov1's exact cov_num numerators, all
# sharing the same n^2 denominator, so they ARE the covariance up to
# one positive scalar — eigenvectors unchanged) by m6's device: a
# fixed number of synchronous power-iteration waves whose iterates are
# floor-quantized integers, so no float ever crosses engines and the
# oracle replays every wave as an unrolled CTE.  The matrix is first
# divide-scaled into micro range by its own max (divide-first: no
# BIGINT product can overflow whatever the corpus variance is);
# iterations run at MILLI scale (|v| <= 1000: the matvec product
# 64 * 2e6 * 1e3 = 1.3e11 stays far inside BIGINT); the final wave
# re-normalizes to MICRO loadings.  Truncating integer division is
# portable: Spark `div` and DuckDB `//` both round toward zero.

_PCA1_ITERS = 8


def _pca1_oracle() -> str:
    from .registry import ORACLES

    cov = ORACLES["cov1_embedding_covariance"]
    parts = [
        f"""
    WITH cov AS MATERIALIZED ({cov}),
    full_m AS MATERIALIZED (
        SELECT i, j, cov_num FROM cov
        UNION ALL
        SELECT j AS i, i AS j, cov_num FROM cov WHERE i < j
    ),
    m AS MATERIALIZED (
        SELECT i, j,
               CAST(cov_num // greatest(
                   (SELECT max(abs(cov_num)) FROM full_m) // 1000000, 1)
                   AS BIGINT) AS c
        FROM full_m
    ),
    tr AS (SELECT CAST(sum(c) AS BIGINT) AS trace FROM m WHERE i = j),
    v0 AS MATERIALIZED (SELECT DISTINCT i, CAST(1000 AS BIGINT) AS v FROM m)"""
    ]
    for k in range(1, _PCA1_ITERS + 1):
        parts.append(
            f""",
    r{k} AS MATERIALIZED (
        SELECT m.i, CAST(sum(m.c * v.v) AS BIGINT) AS raw
        FROM m JOIN v{k - 1} v ON v.i = m.j GROUP BY 1
    ),
    v{k} AS MATERIALIZED (
        SELECT i, CAST((raw * 1000)
               // greatest((SELECT max(abs(raw)) FROM r{k}), 1) AS BIGINT)
            AS v
        FROM r{k}
    )"""
        )
    k = _PCA1_ITERS
    parts.append(
        f""",
    rf AS MATERIALIZED (
        SELECT m.i, CAST(sum(m.c * v.v) AS BIGINT) AS raw
        FROM m JOIN v{k} v ON v.i = m.j GROUP BY 1
    ),
    vf AS MATERIALIZED (
        SELECT i, CAST((raw * 1000000)
               // greatest((SELECT max(abs(raw)) FROM rf), 1) AS BIGINT)
            AS v
        FROM rf
    ),
    sgn AS (
        SELECT CASE WHEN v >= 0 THEN 1 ELSE -1 END AS s FROM vf
        WHERE v != 0 ORDER BY i LIMIT 1
    ),
    loading AS MATERIALIZED (
        SELECT i, CAST(v * s AS BIGINT) AS loading_micro FROM vf, sgn
    ),
    lm AS MATERIALIZED (
        SELECT i, CAST(loading_micro // 1000 AS BIGINT) AS l FROM loading
    ),
    rray AS MATERIALIZED (
        SELECT m.i, CAST(sum(m.c * lm.l) AS BIGINT) AS raw
        FROM m JOIN lm ON lm.i = m.j GROUP BY 1
    ),
    ray AS (
        SELECT CAST(CAST(sum(lm.l * rray.raw) AS BIGINT)
               // greatest(CAST(sum(lm.l * lm.l) AS BIGINT), 1) AS BIGINT)
            AS lambda_micro
        FROM lm JOIN rray ON rray.i = lm.i
    )
    SELECT loading.i AS dim, loading.loading_micro, ray.lambda_micro,
           CAST((1000 * ray.lambda_micro) // tr.trace AS BIGINT)
               AS var_explained_permille
    FROM loading, ray, tr
    ORDER BY dim"""
    )
    return "".join(parts)


@query("pca1_power_iteration", oracle=_pca1_oracle())
def pca1_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding covariance matrix by
    {K} synchronous power-iteration waves — the dominant direction of
    variation, the quantity MRL truncation (mrl1) and dimension-
    collapse audits assume and cov1 only tabulates.  Exactness: the
    matrix is cov1's exact integer cov_num grid (covariance times the
    positive scalar n^2 — same eigenvectors), divide-scaled into micro
    range by its own max; every iterate is floor-quantized (milli
    during iteration, micro at the final wave), the sign is
    canonicalized by the first nonzero loading, and the Rayleigh
    quotient lambda = (v·Mv) div (v·v) with variance-explained =
    1000*lambda div trace(M) are single integer divisions — the
    declared statistic is the quantized iterate (the m6 convention),
    so both engines replay bit-identical waves.

    Scale shape: the corpus is touched ONCE (cov1's map-side
    upper-triangle moment pass); everything after is a dim^2 = 4,096-
    cell model table — localCheckpointed, then {K} model-sized join +
    aggregate waves (the m6 shape).  At 100 TB the added cost over
    cov1 is {K} joins over a 4k-row table.

    Reference analog: none — extends the embedding-analytics family
    (SURVEY §2.13) beside cov1/mrl1/sim-family."""
    cells = (
        cov1_embedding_covariance(spark, sf_dir)
        .select("i", "j", F.col("cov_num").alias("c"))
    )
    full_m = cells.unionByName(
        cells.where(F.col("i") < F.col("j")).select(
            F.col("j").alias("i"), F.col("i").alias("j"), "c"
        )
    )
    # Pre-scale the covariance numerators into micro range by the
    # matrix's own max: divide-first (never multiply) so no BIGINT
    # product can overflow whatever the corpus variance is.
    mxc = full_m.agg(
        F.expr(
            "CAST(greatest(max(abs(c)) div 1000000, 1L) AS BIGINT)"
        ).alias("mxc")
    )
    m = (
        full_m.crossJoin(F.broadcast(mxc))
        .select("i", "j", F.expr("CAST(c div mxc AS BIGINT)").alias("c"))
        .localCheckpoint(eager=True)
    )
    trace = m.where(F.col("i") == F.col("j")).agg(
        F.sum("c").cast("long").alias("trace")
    )
    v = m.select("i").distinct().select(
        "i", F.lit(1000).cast("long").alias("v")
    )

    def matvec(vec: DataFrame) -> DataFrame:
        vv = vec.select(F.col("i").alias("j"), F.col("v").alias("vj"))
        return (
            m.join(F.broadcast(vv), "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("vj")).cast("long").alias("raw"))
        )

    def normalize(raw: DataFrame, scale: int) -> DataFrame:
        mx = raw.agg(F.max(F.abs(F.col("raw"))).cast("long").alias("mx"))
        return raw.crossJoin(F.broadcast(mx)).select(
            "i",
            F.expr(f"CAST((raw * {scale}) div greatest(mx, 1L) AS BIGINT)")
            .alias("v"),
        )

    for _ in range(_PCA1_ITERS):
        # Each wave is a 64-row table; eagerly checkpointing it keeps
        # the cumulative plan linear (9 shallow plans instead of one
        # 9-wave nest whose optimization time explodes).
        v = normalize(matvec(v), 1000).localCheckpoint(eager=True)
    vf = normalize(matvec(v), 1_000_000)
    sgn = (
        vf.where(F.col("v") != 0)
        .orderBy("i")
        .limit(1)
        .select(
            F.when(F.col("v") >= 0, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("s")
        )
    )
    loading = vf.crossJoin(F.broadcast(sgn)).select(
        "i", (F.col("v") * F.col("s")).cast("long").alias("loading_micro")
    )
    lm = loading.select(
        "i", F.expr("CAST(loading_micro div 1000 AS BIGINT)").alias("l")
    )
    r2 = (
        m.join(
            F.broadcast(
                lm.select(F.col("i").alias("j"), F.col("l").alias("lj"))
            ),
            "j",
        )
        .groupBy("i")
        .agg(F.sum(F.col("c") * F.col("lj")).cast("long").alias("raw"))
    )
    ray = (
        lm.join(r2, "i")
        .agg(
            F.expr(
                "CAST(CAST(sum(l * raw) AS BIGINT)"
                " div greatest(CAST(sum(l * l) AS BIGINT), 1L) AS BIGINT)"
            ).alias("lambda_micro")
        )
    )
    return (
        loading.crossJoin(F.broadcast(ray))
        .crossJoin(F.broadcast(trace))
        .select(
            F.col("i").alias("dim"),
            "loading_micro",
            "lambda_micro",
            F.expr(
                "CAST((1000 * lambda_micro) div trace AS BIGINT)"
            ).alias("var_explained_permille"),
        )
        .orderBy("dim")
    )


pca1_power_iteration.__doc__ = pca1_power_iteration.__doc__.format(
    K=_PCA1_ITERS
)
