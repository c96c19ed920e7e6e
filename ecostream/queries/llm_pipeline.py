"""Training-data preparation operators (BASELINE.json north-star set).

The reference has nothing like these (it is a streaming simulation);
they are the operators a 100 TB pretraining pipeline runs between "raw
corpus" and "training batches", each declared with a DuckDB oracle so
the driver hash-checks the exact semantics:

- chunk1: overlapping token-window chunking (context-window shaping)
- split1: deterministic hash-based train/val/test assignment
- shuffle1: deterministic global training order (seeded-shuffle analog)
- pack1: contiguous sequence packing into fixed token budgets

All are pure built-in expressions — split/slice/sequence/md5/window —
so they stay inside whole-stage codegen; no Python touches the rows.

Cross-engine determinism notes: token arrays come from a single-space
split (identical in Spark ``split`` and DuckDB ``string_split``); the
"random" orders/buckets come from md5-hex-digit arithmetic (the same
device the s1 generator oracle uses) rather than engine-specific hash
functions, so both engines compute bit-identical values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schema import load_table
from .registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --- CHUNK1: overlapping token-window chunking ------------------------------

_CHUNK_LEN = 64
_CHUNK_STRIDE = 48


@query(
    "chunk1_token_windows",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tokens
        FROM documents
    )
    SELECT doc_id,
           CAST(start / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(len(list_slice(tokens, start + 1, start + {_CHUNK_LEN}))
                AS BIGINT) AS n_tokens,
           md5(array_to_string(
               list_slice(tokens, start + 1, start + {_CHUNK_LEN}), ' '
           )) AS chunk_hash
    FROM toks,
         unnest(generate_series(0, len(tokens) - 1, {_CHUNK_STRIDE}))
             AS u(start)
    """,
)
def chunk1_token_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk every document into 64-token windows with stride
    48 (16-token overlap) — the context-window shaping pass
    before tokenized training.  One ``sequence`` + ``explode`` per doc
    (no self-join, no shuffle: chunking is embarrassingly parallel);
    the chunk text is md5-fingerprinted so the result stays narrow while
    the oracle still pins the exact chunk CONTENT, boundaries included.
    At 100 TB the same plan applies per partition — output ≈ n_tokens /
    stride rows per doc, each derived map-side."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    return (
        docs.select(
            "doc_id",
            "tokens",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.size("tokens") - 1,
                    F.lit(_CHUNK_STRIDE),
                )
            ).alias("start"),
        )
        .select(
            "doc_id",
            (F.col("start") / _CHUNK_STRIDE).cast("long").alias("chunk_idx"),
            F.size(
                F.slice("tokens", F.col("start") + 1, _CHUNK_LEN)
            ).cast("long").alias("n_tokens"),
            F.md5(
                F.array_join(
                    F.slice("tokens", F.col("start") + 1, _CHUNK_LEN), " "
                )
            ).alias("chunk_hash"),
        )
    )


# --- SPLIT1: deterministic train/val/test assignment ------------------------

# Two md5 hex digits of the doc id -> 0..99 bucket; 90/5/5 split.  The
# (a*31+b) % 100 device matches the s1 generator oracle's derivations.
_BUCKET_SPARK = (
    "pmod(ascii(substring(md5(cast(doc_id as string)), 1, 1)) * 31 "
    "+ ascii(substring(md5(cast(doc_id as string)), 2, 1)), 100)"
)
_BUCKET_DUCK = (
    "((ascii(substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)) * 31 "
    "+ ascii(substring(md5(CAST(doc_id AS VARCHAR)), 2, 1))) % 100)"
)


@query(
    "split1_train_val_test",
    oracle=f"""
    SELECT CASE WHEN {_BUCKET_DUCK} < 90 THEN 'train'
                WHEN {_BUCKET_DUCK} < 95 THEN 'val'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def split1_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split: the bucket is a pure
    function of doc_id (two md5 hex digits), so membership is stable
    across runs, machines, and engines — the property a data split MUST
    have (a seeded ``rand()`` split changes under repartitioning).
    Assignment is map-side; only the per-split totals aggregate."""
    docs = _docs(spark, sf_dir)
    bucket = F.expr(_BUCKET_SPARK)
    split = (
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
    )


# --- SHUFFLE1: deterministic global training order --------------------------


@query(
    "shuffle1_training_order",
    oracle="""
    SELECT CAST(row_number() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS pos,
           doc_id
    FROM documents
    ORDER BY pos
    LIMIT 500
    """,
)
def shuffle1_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle: training-epoch order = sort by a
    hash of the id (md5 — engine-portable), the reproducible version of
    'shuffle the corpus before each epoch'.

    ``pos`` is a global rank, but it is NOT computed with
    ``row_number().over(Window.orderBy(...))`` — an unpartitioned window
    plans ``Exchange SinglePartition`` (the whole corpus through one
    task).  Instead pos = 1 + the distributed exclusive prefix COUNT
    (functions/prefix.py): range-partition on the hash order, count
    locally per partition, add driver-merged per-partition offsets.
    The final ORDER BY pos LIMIT then plans TakeOrderedAndProject
    (per-partition top-k + driver merge of 500-row heads), so every
    stage stays partition-parallel at 100 TB."""
    from ..functions.prefix import with_prefix_sum

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string")).alias("h"),
        F.lit(1).alias("one"),
    )
    run = with_prefix_sum(docs, ["h", "doc_id"], "one", out_col="rank0")
    return (
        run.select((F.col("rank0") + 1).cast("long").alias("pos"), "doc_id")
        .orderBy("pos")
        .limit(500)
    )


# --- PACK1: contiguous sequence packing -------------------------------------

_PACK_BUDGET = 512


@query(
    "pack1_sequence_packing",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    run AS (
        SELECT doc_id, n_tok,
               SUM(n_tok) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - n_tok AS cum_before
        FROM toks
    )
    -- explicit floor: DuckDB's double->BIGINT cast ROUNDS, Spark's
    -- truncates; floor() agrees everywhere for non-negative input
    SELECT CAST(floor(cum_before / {_PACK_BUDGET}) AS BIGINT) AS bin,
           count(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM run
    GROUP BY 1
    """,
)
def pack1_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: stream the corpus in doc_id order
    and cut a new bin every 512 tokens (concatenative
    pretraining batches; documents straddling a boundary belong to the
    bin where they start).  The running total is a DISTRIBUTED prefix
    sum (functions/prefix.py): range-partition on doc_id, per-partition
    local cumsum, driver-merged per-partition offsets — NOT a global
    ``Window.orderBy``, which would move the whole corpus to one task.
    Each bin's doc count / token total is the packing manifest the
    training loader consumes."""
    from ..functions.prefix import with_prefix_sum

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    run = with_prefix_sum(docs, ["doc_id"], "n_tok")
    return (
        run.select(
            F.floor(F.col("cum_before") / _PACK_BUDGET).cast("long").alias("bin"),
            "n_tok",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


# --- SAMP1: deterministic stratified sampling --------------------------------


@query(
    "samp1_stratified_sample",
    oracle="""
    WITH flagged AS (
        SELECT event_type,
               CASE WHEN ((ascii(substring(md5(CAST(event_id AS VARCHAR)), 1, 1)) * 31
                         + ascii(substring(md5(CAST(event_id AS VARCHAR)), 2, 1))) % 100)
                         < 10
                    THEN 1 ELSE 0 END AS in_sample
        FROM events
    )
    SELECT event_type,
           CAST(SUM(in_sample) AS BIGINT) AS n_sampled,
           count(*) AS n_total,
           ROUND(CAST(SUM(in_sample) AS DOUBLE) / count(*), 6) AS sample_rate
    FROM flagged
    GROUP BY event_type
    """,
)
def samp1_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% stratified sample per class: membership is a
    pure md5-bucket function of event_id (the portable-hash device of
    split1), so the SAME rows are sampled on every run, engine, and
    partitioning — what `df.sampleBy` (seeded Bernoulli per stratum)
    cannot promise once data moves.  Output reports per-class sampled /
    total / realized-rate; the class-conditional rates concentrate
    around 10% because the hash is independent of event_type.  One scan,
    map-side membership, single aggregation."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.expr(
        "pmod(ascii(substring(md5(cast(event_id as string)), 1, 1)) * 31 "
        "+ ascii(substring(md5(cast(event_id as string)), 2, 1)), 100)"
    )
    flagged = ev.select(
        "event_type", (bucket < 10).cast("int").alias("in_sample")
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.sum("in_sample").cast("long").alias("n_sampled"),
            F.count("*").alias("n_total"),
        )
        .select(
            "event_type",
            "n_sampled",
            "n_total",
            F.round(
                F.col("n_sampled").cast("double") / F.col("n_total"), 6
            ).alias("sample_rate"),
        )
    )


# --- PIPELINE2: end-to-end training-set manifest -----------------------------


@query(
    "pipeline2_training_manifest",
    oracle=f"""
    WITH kept AS (
        -- exact dedup: keep the lowest doc_id per content hash
        SELECT doc_id, text, lang, n_chars
        FROM (
            SELECT doc_id, text, lang, n_chars,
                   row_number() OVER (PARTITION BY md5(text)
                                      ORDER BY doc_id) AS rn
            FROM documents
        ) WHERE rn = 1
    ),
    quality AS (
        -- quality gate: t6's thresholds (token count + type-token ratio)
        SELECT doc_id, text, n_chars,
               len(string_split(text, ' ')) AS n_tok
        FROM kept
        WHERE len(string_split(text, ' ')) BETWEEN 10 AND 1000
          AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
              / len(string_split(text, ' ')) > 0.1
    ),
    assigned AS (
        SELECT doc_id, n_tok,
               CASE WHEN {_BUCKET_DUCK} < 90 THEN 'train'
                    WHEN {_BUCKET_DUCK} < 95 THEN 'val'
                    ELSE 'test' END AS split
        FROM quality
    ),
    packed AS (
        SELECT split, n_tok,
               SUM(n_tok) OVER (PARTITION BY split ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) - n_tok
                   AS cum_before
        FROM assigned
    )
    SELECT split,
           CAST(floor(cum_before / {_PACK_BUDGET}) AS BIGINT) AS bin,
           count(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens
    FROM packed
    GROUP BY split, 2
    """,
)
def pipeline2_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed training-set build: exact dedup (keep-min per
    content hash) → quality gate (t6's token-count + type-token-ratio
    thresholds) → deterministic split assignment → per-split sequence
    packing.  One declared query exercising the whole preparation
    funnel so the driver pins every stage boundary at once (a row lost
    in dedup, mis-gated on quality, mis-bucketed, or packed into the
    wrong bin all flip the manifest hash).

    Plan shape at 100 TB: one shuffle for the dedup window
    (hash(md5(text))), map-side gating and split assignment, and a
    distributed per-split prefix sum for packing (functions/prefix.py —
    range partitions within each split, never a per-split
    single-partition window) — each stage's output feeds the next
    without re-scanning the corpus."""
    from pyspark.sql import Window as W

    from ..functions.prefix import with_prefix_sum

    docs = _docs(spark, sf_dir)
    wd = W.partitionBy(F.md5("text")).orderBy("doc_id")
    kept = (
        docs.withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
    toks = F.split("text", " ")
    quality = kept.select(
        "doc_id",
        F.size(toks).alias("n_tok"),
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("ttr"),
    ).where(
        F.col("n_tok").between(10, 1000) & (F.col("ttr") > 0.1)
    )
    bucket = F.expr(_BUCKET_SPARK)
    assigned = quality.select(
        "doc_id",
        "n_tok",
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    )
    packed = with_prefix_sum(
        assigned, ["doc_id"], "n_tok", partition_cols=["split"]
    )
    return (
        packed.select(
            "split",
            F.floor(F.col("cum_before") / _PACK_BUDGET)
            .cast("long")
            .alias("bin"),
            "n_tok",
        )
        .groupBy("split", "bin")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
    )


# --- QL1: per-source quota capping (corpus domain balancing) ----------------


@query(
    "ql1_domain_quota",
    oracle="""
    WITH ranked AS (
        SELECT source, doc_id,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS pos
        FROM documents
    )
    SELECT source, doc_id, CAST(pos AS BIGINT) AS pos
    FROM ranked WHERE pos <= 10
    ORDER BY source, pos
    """,
)
def ql1_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap-based domain balancing: keep at most K=10 documents per
    source, selected in md5-hash order — the pretraining-mix op that
    stops one crawl domain from dominating the corpus (the complement
    of samp1's fraction-based stratified sample: quotas bound the
    ABSOLUTE contribution).

    Scale shape: one shuffle on ``source``, then a per-partition
    window; hash order makes the kept set deterministic and
    repartition-stable, and the md5 device makes it engine-portable.
    A pathologically hot source makes a single big window task — the
    two-stage salted top-k helper (functions/topk.py) is the documented
    upgrade; at K=10 the window state is trivially small either way."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        docs.select(
            "source", "doc_id", F.row_number().over(w).alias("pos")
        )
        .where(F.col("pos") <= 10)
        .select("source", "doc_id", F.col("pos").cast("long").alias("pos"))
    )


# --- MIX1: temperature-scaled source mixing ----------------------------------

_MIX1_BUDGET = 100  # target corpus size after mixing


@query(
    "mix1_temperature_sampling",
    oracle=f"""
    WITH counts AS (
        SELECT source, CAST(count(*) AS BIGINT) AS c
        FROM documents GROUP BY source
    ),
    wts AS (
        SELECT source, c,
               CAST(ROUND(sqrt(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) AS w
        FROM counts
    ),
    tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tw FROM wts),
    quota AS (
        SELECT source, c, w, ({_MIX1_BUDGET} * w) // tw AS q
        FROM wts CROSS JOIN tot
    ),
    ranked AS (
        SELECT d.source, d.doc_id, q.q,
               row_number() OVER (
                   PARTITION BY d.source
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS pos
        FROM documents d JOIN quota q USING (source)
    )
    SELECT source, CAST(q AS BIGINT) AS quota, doc_id,
           CAST(pos AS BIGINT) AS pos
    FROM ranked WHERE pos <= q ORDER BY source, pos
    """,
)
def mix1_temperature_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multinomial-with-alpha
    rebalancing of XLM-R / GPT-3 data recipes, alpha = 0.5): each
    source's share of the mixed corpus is proportional to c_s^alpha,
    which up-weights small sources relative to raw proportional
    sampling — THE standard knob against head-domain domination.
    Selection within a source is md5-hash order (the ql1/samp1 device:
    deterministic, repartition-stable, engine-portable).

    Float discipline: sqrt is IEEE-754 correctly-rounded (identical in
    both engines, unlike ln/exp), and each sqrt is quantized to integer
    MICRO-units before the sum (the lm2 device) — so the weight total
    is an exact BIGINT, quotas are integer floor-division, and no
    boundary document can flip between engines.

    Scale shape: a |sources|-row count aggregate, quota arithmetic on
    that tiny table (broadcast back), one shuffle on source for the
    per-source hash-order window.  A hot source is one window task —
    the salted two-stage top-k is the documented upgrade, same as
    ql1."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").cast("long").alias("c"))
    wts = counts.select(
        "source",
        "c",
        F.round(F.sqrt(F.col("c").cast("double")) * 1_000_000)
        .cast("long")
        .alias("w"),
    )
    tot = wts.agg(F.sum("w").cast("long").alias("tw"))
    quota = wts.crossJoin(F.broadcast(tot)).select(
        "source", F.expr(f"({_MIX1_BUDGET} * w) div tw").alias("q")
    )
    w_ord = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = (
        docs.join(F.broadcast(quota), "source")
        .select(
            "source",
            "doc_id",
            "q",
            F.row_number().over(w_ord).alias("pos"),
        )
        .where(F.col("pos") <= F.col("q"))
    )
    return ranked.select(
        "source",
        F.col("q").cast("long").alias("quota"),
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
    ).orderBy("source", "pos")


# --- SHUFFLE2: per-epoch reshuffling -----------------------------------------

_SHUFFLE2_EPOCHS = 3
_SHUFFLE2_HEAD = 100


@query(
    "shuffle2_epoch_orders",
    oracle=f"""
    WITH epochs AS (
        SELECT unnest(generate_series(0, {_SHUFFLE2_EPOCHS - 1})) AS epoch
    ),
    ranked AS (
        SELECT e.epoch, d.doc_id,
               row_number() OVER (
                   PARTITION BY e.epoch
                   ORDER BY md5(CAST(e.epoch AS VARCHAR) || ':'
                                || CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS pos
        FROM documents d CROSS JOIN epochs e
    )
    SELECT CAST(epoch AS BIGINT) AS epoch, CAST(pos AS BIGINT) AS pos,
           doc_id
    FROM ranked WHERE pos <= {_SHUFFLE2_HEAD}
    ORDER BY epoch, pos
    """,
)
def shuffle2_epoch_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-EPOCH reshuffling (shuffle1's multi-epoch form): epoch e's
    training order ranks by md5(e || ':' || doc_id), so every epoch
    sees a different — but individually reproducible and
    engine-portable — permutation, which is exactly the contract a
    training loop needs from 'reshuffle each epoch' (distinct orders:
    test-pinned; same corpus membership per epoch: by construction).

    Scale shape: the epoch spine is a {e}-row broadcast cross join
    (each epoch's ranking is an independent partition of the work);
    the per-epoch rank is a PARTITIONED window — never the
    single-partition global window (the shuffle1 lesson; partitioning
    by epoch bounds each window task at one epoch's order, and real
    epoch counts are single digits so the per-task volume equals the
    shuffle1 prefix-sum variant's).  Declared head of {h} rows per
    epoch keeps the pinned result bounded."""
    docs = _docs(spark, sf_dir).select("doc_id")
    epochs = spark.range(_SHUFFLE2_EPOCHS).select(
        F.col("id").cast("long").alias("epoch")
    )
    ranked = docs.crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat(
                F.col("epoch").cast("string"),
                F.lit(":"),
                F.col("doc_id").cast("string"),
            )
        ).alias("h"),
    )
    w = Window.partitionBy("epoch").orderBy("h", "doc_id")
    return (
        ranked.withColumn("pos", F.row_number().over(w).cast("long"))
        .where(F.col("pos") <= _SHUFFLE2_HEAD)
        .select("epoch", "pos", "doc_id")
        .orderBy("epoch", "pos")
    )


shuffle2_epoch_orders.__doc__ = shuffle2_epoch_orders.__doc__.format(
    e=_SHUFFLE2_EPOCHS, h=_SHUFFLE2_HEAD
)


# --- PIPELINE3: the round-5 curation funnel ----------------------------------


def _pipeline3_oracle() -> str:
    from .corpus import _ENT1_MIN_MICRO, _dsir_oracle_tail
    from .text import _D11_CASE

    return f"""
    WITH fp AS (
        SELECT doc_id, source, text,
               md5(array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ')) AS h
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, text,
               row_number() OVER (
                   PARTITION BY h ORDER BY {_D11_CASE}, doc_id
               ) AS rn
        FROM fp
    ),
    dedup AS (SELECT doc_id, source, text FROM ranked WHERE rn = 1),
    etoks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM dedup
    ),
    ec AS (
        SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        FROM etoks GROUP BY doc_id, tok
    ),
    es AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT)
                   * CAST(ROUND(ln(CAST(SUM(c) AS DOUBLE)) * 1000000)
                          AS BIGINT)
               - CAST(SUM(c * CAST(ROUND(ln(CAST(c AS DOUBLE)) * 1000000)
                                   AS BIGINT)) AS BIGINT) AS s_micro
        FROM ec GROUP BY doc_id
    ),
    gate AS (
        SELECT d.doc_id, d.source, d.text
        FROM dedup d JOIN es ON es.doc_id = d.doc_id
        WHERE es.s_micro >= {_ENT1_MIN_MICRO} * es.n
    ),
    dsel_docs AS (
        SELECT doc_id, source, string_split(text, ' ') AS tokens FROM gate
    ),{_dsir_oracle_tail()},
    inp AS (SELECT source, CAST(count(*) AS BIGINT) AS n_input
            FROM documents GROUP BY source),
    dcnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_dedup
             FROM dedup GROUP BY source),
    gcnt AS (SELECT source, CAST(count(*) AS BIGINT) AS n_gate
             FROM gate GROUP BY source),
    scnt AS (SELECT g.source, CAST(count(*) AS BIGINT) AS n_selected
             FROM selected sel JOIN gate g ON g.doc_id = sel.doc_id
             GROUP BY g.source)
    SELECT inp.source, inp.n_input,
           COALESCE(dcnt.n_dedup, 0) AS n_dedup,
           COALESCE(gcnt.n_gate, 0) AS n_gate,
           COALESCE(scnt.n_selected, 0) AS n_selected
    FROM inp
    LEFT JOIN dcnt USING (source)
    LEFT JOIN gcnt USING (source)
    LEFT JOIN scnt USING (source)
    ORDER BY source
    """


@query("pipeline3_curation_manifest", oracle=_pipeline3_oracle())
def pipeline3_curation_manifest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The composed ROUND-5 curation funnel, manifest-pinned the way
    pipeline2 pins the training-set build: provenance-priority dedup
    (d11's keep rule) → token-entropy quality gate (ent1's integer
    micro-nat inequality) → DSIR importance selection over the
    survivors (dsir1's mechanism, with the target/raw models and the
    ceil(n/5) budget refit to the gated pool — selection pools in real
    pipelines are always post-cleaning).  The declared result is the
    per-source funnel manifest (n_input → n_dedup → n_gate →
    n_selected), so a row lost or mis-gated at ANY stage boundary
    flips the driver hash; the oracle replays all three stages plus
    the manifest joins end to end.

    Scale shape: each stage is its own one-or-two-shuffle plan
    (fingerprint window; (doc,token) count + doc agg; broadcast-λ
    scoring + TakeOrdered) and stages hand off doc_id/source/text
    columns without re-scanning the corpus; the manifest is four
    source-keyed partial aggregates joined on a 20-value key."""
    from pyspark.sql import Window as W

    from .corpus import _ENT1_MIN_MICRO, dsir_select
    from .text import _D11_CASE

    docs = _docs(spark, sf_dir).select("doc_id", "source", "text")
    fpc = F.md5(
        F.array_join(
            F.array_sort(F.array_distinct(F.split("text", " "))), " "
        )
    )
    wd = W.partitionBy(fpc).orderBy(F.expr(_D11_CASE), F.col("doc_id"))
    dedup = (
        docs.withColumn("rn", F.row_number().over(wd))
        .where(F.col("rn") == 1)
        .drop("rn")
        .localCheckpoint(eager=False)
    )
    c = (
        dedup.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("c"))
    )
    q = lambda col: F.round(F.log(col.cast("double")) * 1_000_000).cast(
        "long"
    )
    es = c.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        (
            F.sum("c").cast("long") * q(F.sum("c"))
            - F.sum(F.col("c") * q(F.col("c"))).cast("long")
        ).alias("s_micro"),
    )
    gate = (
        dedup.join(
            es.where(
                F.col("s_micro") >= _ENT1_MIN_MICRO * F.col("n")
            ).select("doc_id"),
            "doc_id",
        )
        .localCheckpoint(eager=False)
    )
    selected = dsir_select(
        gate.select("doc_id", "source", F.split("text", " ").alias("tokens"))
    )
    inp = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_input")
    )
    dcnt = dedup.groupBy("source").agg(
        F.count("*").cast("long").alias("n_dedup")
    )
    gcnt = gate.groupBy("source").agg(
        F.count("*").cast("long").alias("n_gate")
    )
    scnt = (
        selected.select("doc_id")
        .join(gate.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_selected"))
    )
    return (
        inp.join(dcnt, "source", "left")
        .join(gcnt, "source", "left")
        .join(scnt, "source", "left")
        .select(
            "source",
            "n_input",
            F.coalesce("n_dedup", F.lit(0)).cast("long").alias("n_dedup"),
            F.coalesce("n_gate", F.lit(0)).cast("long").alias("n_gate"),
            F.coalesce("n_selected", F.lit(0))
            .cast("long")
            .alias("n_selected"),
        )
        .orderBy("source")
    )


# --- SAMP2: weighted sampling without replacement (Efraimidis-Spirakis) ------

_SAMP2_K_FRAC = 10  # keep ceil(n / 10)
_SAMP2_U_DEN = float(1 << 61)  # (md5-60-bit + 1) / 2^61 in (0, 0.5]


@query(
    "samp2_weighted_wor",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
               -- ES key u^(1/w): rank by q/w ascending where
               -- q = round(-ln(u)*1e9) is an exact positive BIGINT,
               -- so the integer division is engine-identical.
               CAST(ROUND(-ln(
                   (('0x' || substr(md5('samp2:' || CAST(doc_id AS VARCHAR)),
                                    1, 15))::UBIGINT::BIGINT + 1)
                   / {_SAMP2_U_DEN!r}) * 1000000000) AS BIGINT)
               // CAST(n_chars AS BIGINT) AS es_key
        FROM documents
    ),
    kk AS (SELECT CAST(CEIL(COUNT(*) / {_SAMP2_K_FRAC}.0) AS BIGINT) AS k
           FROM documents)
    SELECT doc_id, weight, es_key
    FROM (SELECT *, row_number() OVER (ORDER BY es_key, doc_id) AS rn
          FROM keyed), kk
    WHERE rn <= kk.k
    ORDER BY doc_id
    """,
)
def samp2_weighted_wor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis & Spirakis
    2006, the A-ES algorithm — THE distributed weighted reservoir
    method): each document draws a deterministic uniform u from an
    md5-derived 60-bit integer and is ranked by key u^(1/w) with
    w = n_chars; the top ceil(n/10) keys are the sample, and inclusion
    probability is proportional to weight.  This is how a training
    pipeline takes a size-weighted corpus subsample in ONE distributed
    pass — per-partition top-k then a global k-merge, no global sort,
    no sequential reservoir.

    Exactness discipline: maximizing u^(1/w) == minimizing
    (-ln u)/w; q = round(-ln(u)*1e9) is an exact POSITIVE BIGINT, so
    es_key = q div w is an integer both engines compute identically
    (positive operands — no floor-vs-truncate divergence), and the
    selection is a pure integer sort with doc_id tie-breaks.

    Scale shape: map-only key derivation on the scan, then
    TakeOrderedAndProject — partition-local heads, k-merge on the
    driver side of the exchange; the count-only job sets k."""
    import math

    docs = load_table(spark, sf_dir, "documents")
    # conv() returns STRING: cast to BIGINT BEFORE the +1 (the dsir_select
    # discipline) so both engines compute double(h+1)/2^61 identically —
    # string + 1 would coerce to DOUBLE first and could land an ulp off
    # the oracle when the 60-bit hash sits on a double rounding midpoint.
    keyed = docs.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("weight"),
        F.expr(
            f"CAST(ROUND(-ln((CAST(conv(substring(md5(concat('samp2:', "
            f"CAST(doc_id AS STRING))), 1, 15), 16, 10) AS BIGINT) + 1) "
            f"/ {_SAMP2_U_DEN!r}) * 1000000000) AS BIGINT) "
            "div CAST(n_chars AS BIGINT)"
        ).alias("es_key"),
    )
    k = math.ceil(docs.count() / _SAMP2_K_FRAC)
    return (
        keyed.orderBy("es_key", "doc_id").limit(k).orderBy("doc_id")
    )


# --- MIX2: token-budget waterfill allocation (round 6) -----------------------

# budget = floor(3 * total / 4).  Calibration note (honest limits of
# this corpus): the testdata's 20 sources are near-UNIFORM (spread a
# few % around the mean), and a waterlevel can only saturate a source
# when B/k exceeds the smallest availability — impossible here for any
# budget meaningfully below the total, at ANY tested sf.  So the
# declared query's correct answer is the all-capped allocation
# (alloc = B div k for every source), and the SATURATING branch —
# small sources taken whole, remainder re-spread — is pinned instead
# by tests/test_llm_pipeline.py on a skewed synthetic table against a
# brute-force waterlevel (the d3b mechanism-twin discipline: the
# declared form hash-checks the plumbing, the test pins the regime the
# corpus cannot reach).
_MIX2_BUDGET_NUM, _MIX2_BUDGET_DEN = 3, 4


@query(
    "mix2_budget_waterfill",
    oracle=f"""
    WITH s AS (
        SELECT source, CAST(SUM(n_chars) AS BIGINT) AS avail
        FROM documents GROUP BY source
    ),
    b AS (
        SELECT CAST((SUM(avail) * {_MIX2_BUDGET_NUM})
                    // {_MIX2_BUDGET_DEN} AS BIGINT) AS budget,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM s
    ),
    r AS (
        SELECT source, avail,
               CAST(row_number() OVER (ORDER BY avail, source) AS BIGINT)
                   AS i,
               CAST(COALESCE(SUM(avail) OVER (
                   ORDER BY avail, source
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ), 0) AS BIGINT) AS cum
        FROM s
    ),
    lvl AS (
        SELECT MAX(LEAST(
                   GREATEST(b.budget - r.cum, 0) // (b.k - r.i + 1),
                   r.avail)) AS t
        FROM r, b
    )
    SELECT source, avail AS avail_chars,
           CAST(LEAST(avail, lvl.t) AS BIGINT) AS alloc_chars,
           (avail <= lvl.t) AS saturated
    FROM s, lvl ORDER BY source
    """,
)
def mix2_budget_waterfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget WATERFILL across sources — the allocation step of
    mixture design (mix1 picks temperature-scaled PROPORTIONS; this
    answers the dual question every epoch planner hits: given a hard
    token budget B and per-source availability, how much of each source
    can be taken uniformly without exhausting small sources?).  The
    classic waterfilling solution: a common per-source level T — the
    largest integer with sum(min(avail, T)) <= B — with each source
    allocated min(avail, T); sources below the waterlevel are taken
    whole ("saturated"), the rest capped at T.  B = {num}·total/{den}
    here (see the calibration note above).

    Exactness: all-BIGINT — availability sums, the closed-form
    per-segment candidate T_i = (B - cum_before) div (k - i + 1)
    (numerator clamped at 0 BEFORE dividing: Spark's div truncates
    toward zero while DuckDB's // floors, so a negative numerator
    would diverge), clamped at the segment bound and maximized across
    segments (validated against a brute-force waterlevel on 20k random
    instances).  The <k leftover tokens below B spill to the next
    epoch, so no fractional or remainder-distribution rule is needed.

    Scale shape: one partial-aggregated shuffle for the per-source
    sums, then all windows run over the |sources|-row model-sized
    relation (20 rows here; domains are bounded in any real corpus) —
    the corpus itself is scanned once, projected to two columns.
    Reference analog: none — dataset-assembly extension (SURVEY
    §2.13)."""
    s = (
        load_table(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.sum("n_chars").cast("long").alias("avail"))
    )
    return waterfill_allocation(s, _MIX2_BUDGET_NUM, _MIX2_BUDGET_DEN)


def waterfill_allocation(s: DataFrame, num: int, den: int) -> DataFrame:
    """Integer waterfill over an (source, avail) relation with budget
    B = (num·total) div den — the mix2 mechanism, callable on any
    availability table (tests feed a skewed synthetic one to pin the
    saturating regime the near-uniform corpus cannot reach)."""
    wo = Window.orderBy("avail", "source")
    wall = Window.partitionBy()
    r = s.select(
        "source",
        "avail",
        F.row_number().over(wo).cast("long").alias("i"),
        F.coalesce(
            F.sum("avail").over(wo.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("cum"),
        F.expr(f"(sum(avail) OVER () * {num}L) div {den}")
        .cast("long")
        .alias("budget"),
        F.count("*").over(wall).cast("long").alias("k"),
    )
    lvl = r.agg(
        F.max(
            F.least(
                F.expr("greatest(budget - cum, 0L) div (k - i + 1)"),
                F.col("avail"),
            )
        ).alias("t")
    )
    return (
        s.crossJoin(F.broadcast(lvl))
        .select(
            "source",
            F.col("avail").alias("avail_chars"),
            F.least(F.col("avail"), F.col("t")).cast("long").alias("alloc_chars"),
            (F.col("avail") <= F.col("t")).alias("saturated"),
        )
        .orderBy("source")
    )


mix2_budget_waterfill.__doc__ = mix2_budget_waterfill.__doc__.format(
    num=_MIX2_BUDGET_NUM, den=_MIX2_BUDGET_DEN
)


# --- FIM1: T5-style span-corruption manifest (round 6) -----------------------

_FIM_RATE = 15  # percent of token positions corrupted

# Per-position corruption flag: two md5 hex digits of "doc_id:i" -> a
# 0..99 bucket (the split1 device, position edition), corrupted iff
# bucket < rate.  Stateless, so a position's flag AND its predecessor's
# are both recomputable in the same row — span starts need no window.
_FIM_C_SPARK = (
    "pmod(ascii(substring(md5(concat(cast(doc_id as string), ':', "
    "cast({i} as string))), 1, 1)) * 31 "
    "+ ascii(substring(md5(concat(cast(doc_id as string), ':', "
    "cast({i} as string))), 2, 1)), 100) < " + str(_FIM_RATE)
)
_FIM_C_DUCK = (
    "((ascii(substring(md5(CAST(doc_id AS VARCHAR) || ':' || "
    "CAST({i} AS VARCHAR)), 1, 1)) * 31 "
    "+ ascii(substring(md5(CAST(doc_id AS VARCHAR) || ':' || "
    "CAST({i} AS VARCHAR)), 2, 1))) % 100) < " + str(_FIM_RATE)
)


@query(
    "fim1_span_corruption",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents
    ),
    pos AS (
        SELECT doc_id, n, UNNEST(generate_series(1, n)) AS i FROM toks
    ),
    flags AS (
        SELECT doc_id, n, i,
               CASE WHEN {_FIM_C_DUCK.format(i="i")} THEN 1 ELSE 0 END AS c,
               CASE WHEN {_FIM_C_DUCK.format(i="i")}
                     AND (i = 1 OR NOT ({_FIM_C_DUCK.format(i="(i - 1)")}))
                    THEN 1 ELSE 0 END AS starts
        FROM pos
    )
    SELECT doc_id, CAST(MIN(n) AS BIGINT) AS n_tokens,
           CAST(SUM(c) AS BIGINT) AS n_corrupted,
           CAST(SUM(starts) AS BIGINT) AS n_spans,
           CAST((1000 * SUM(c)) // MIN(n) AS BIGINT) AS corruption_permille
    FROM flags GROUP BY doc_id ORDER BY doc_id
    """,
)
def fim1_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5/UL2-style SPAN-CORRUPTION manifest (Raffel et al. 2020): mark
    ~{rate}% of token positions for corruption via a deterministic
    per-position hash, and report per document the corrupted-token
    count, the number of contiguous corruption SPANS (= sentinel tokens
    the denoising target needs), and the realized corruption rate in
    exact permille.  Adjacent marked positions merge into one span
    exactly as T5's span merging does, so n_spans is the sentinel
    budget a span-corruption data loader must reserve.

    Stateless span detection: a position's flag and its predecessor's
    flag are BOTH pure hash functions of (doc_id, i), so span starts
    (marked AND predecessor unmarked) need no window — the whole
    manifest is explode + map-side flags + one partial-aggregated
    groupBy on doc_id.  Deterministic across engines, partitionings,
    and runs — what a seeded rand() corruption cannot promise.
    Reference analog: none — dataset-assembly extension (SURVEY
    §2.13)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    pos = docs.select(
        "doc_id", "n", F.explode(F.sequence(F.lit(1), F.col("n"))).alias("i")
    )
    c = F.expr(_FIM_C_SPARK.format(i="i"))
    c_prev = F.expr(_FIM_C_SPARK.format(i="(i - 1)"))
    flags = pos.select(
        "doc_id",
        "n",
        c.cast("int").alias("c"),
        (c & ((F.col("i") == 1) | ~c_prev)).cast("int").alias("starts"),
    )
    return (
        flags.groupBy("doc_id")
        .agg(
            F.min("n").cast("long").alias("n_tokens"),
            F.sum("c").cast("long").alias("n_corrupted"),
            F.sum("starts").cast("long").alias("n_spans"),
            F.expr("(1000 * sum(c)) div min(n)")
            .cast("long")
            .alias("corruption_permille"),
        )
        .orderBy("doc_id")
    )


fim1_span_corruption.__doc__ = fim1_span_corruption.__doc__.format(
    rate=_FIM_RATE
)


# --- PACK2: packed-sequence boundary masks (round 6) -------------------------


@query(
    "pack2_boundary_masks",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    run AS (
        SELECT doc_id, n_tok,
               SUM(n_tok) OVER (ORDER BY doc_id
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) - n_tok AS cum_before
        FROM toks
    )
    SELECT doc_id,
           CAST(floor(cum_before / {_PACK_BUDGET}) AS BIGINT) AS bin,
           CAST(cum_before % {_PACK_BUDGET} AS BIGINT) AS bin_offset,
           CAST(n_tok AS BIGINT) AS n_tok,
           CAST(floor((cum_before % {_PACK_BUDGET} + n_tok - 1)
                      / {_PACK_BUDGET}) + 1 AS BIGINT) AS n_bins_spanned,
           (cum_before % {_PACK_BUDGET} + n_tok > {_PACK_BUDGET})
               AS crosses_boundary
    FROM run ORDER BY doc_id
    """,
)
def pack2_boundary_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document BOUNDARY MASKS for pack1's concatenative packing —
    what the training loader actually needs to build block-diagonal
    attention masks and per-bin loss masks: each document's bin, its
    token offset within the bin, how many bins it spans, and whether it
    crosses a bin boundary (straddlers get split or masked depending on
    loader policy; either way the loader needs exactly these fields).
    pack1 reports the per-bin manifest; this is the per-document dual —
    same prefix sum, document-level projection instead of bin-level
    aggregation.

    Scale shape: the running total is the DISTRIBUTED prefix sum
    (functions/prefix.py — range-partition, local cumsum, driver-merged
    offsets; never a global Window.orderBy), and everything after it is
    a map-side projection.  All-integer: offsets, spans, and the
    boundary predicate are exact in both engines."""
    from ..functions.prefix import with_prefix_sum

    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    run = with_prefix_sum(docs, ["doc_id"], "n_tok")
    off = F.col("cum_before") % _PACK_BUDGET
    return run.select(
        "doc_id",
        F.floor(F.col("cum_before") / _PACK_BUDGET).cast("long").alias("bin"),
        off.cast("long").alias("bin_offset"),
        F.col("n_tok").cast("long").alias("n_tok"),
        (F.floor((off + F.col("n_tok") - 1) / _PACK_BUDGET) + 1)
        .cast("long")
        .alias("n_bins_spanned"),
        (off + F.col("n_tok") > _PACK_BUDGET).alias("crosses_boundary"),
    ).orderBy("doc_id")


# --- CONV1: multi-turn conversation assembly (round 6) -----------------------
#
# Instruction-tuning datasets are built by THREADING raw interaction
# logs into ordered multi-turn conversations (ShareGPT/OASST-style):
# sessionize, order turns, alternate roles, render a chat template,
# and pin the rendered bytes.  The session device is w3's (lag +
# gap-flag + running sum — per-user windows, never global); the value
# channel rides as exact integer cents so no float ever reaches the
# rendered string.

_CONV1_GAP_US = 30 * 60 * 1_000_000  # 30-minute gap, epoch-microseconds


@query(
    "conv1_chat_threads",
    oracle=f"""
    WITH ev AS (
        SELECT user_id, event_id, CAST(epoch_us(ts) AS BIGINT) AS us,
               event_type, CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    flagged AS (
        SELECT *,
               CASE WHEN lag(us) OVER w IS NULL
                         OR us - lag(us) OVER w > {_CONV1_GAP_US}
                    THEN 1 ELSE 0 END AS new_sess
        FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    sess AS (
        SELECT *,
               SUM(new_sess) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id) AS thread_id,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY us, event_id) AS rn
        FROM flagged
    ),
    turns AS (
        SELECT user_id, thread_id, us, event_id,
               row_number() OVER (PARTITION BY user_id, thread_id
                                  ORDER BY us, event_id) AS turn_no,
               event_type, cents
        FROM sess
    ),
    rendered AS (
        SELECT user_id, CAST(thread_id AS BIGINT) AS thread_id,
               CAST(count(*) AS BIGINT) AS n_turns,
               CAST(min(us) AS BIGINT) AS start_us,
               CAST(max(us) - min(us) AS BIGINT) AS span_us,
               string_agg(
                   CASE WHEN turn_no % 2 = 1 THEN 'user' ELSE 'assistant'
                        END || ': ' || event_type || ' #' || cents,
                   chr(10) ORDER BY turn_no) AS txt
        FROM turns GROUP BY user_id, thread_id
    )
    SELECT user_id, thread_id, n_turns, start_us, span_us,
           CAST(len(txt) AS BIGINT) AS n_chars,
           md5(txt) AS rendered_hash
    FROM rendered
    """,
)
def conv1_chat_threads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-turn conversation assembly (the ShareGPT/OASST data-prep
    shape): sessionize each user's event log on a 30-minute gap,
    order the turns within each thread, alternate user/assistant
    roles by turn parity, and render the chat-template text —
    ``role: event_type #cents`` lines — whose length and md5 pin the
    exact assembled bytes.  This is how raw interaction logs become
    instruction-tuning conversations.

    Determinism: timestamps ride as epoch-microsecond BIGINTs with
    event_id tiebreaks; the money channel is exact integer cents; the
    rendered string is built inside an ORDER BY'd aggregation on both
    engines, so a turn-order or template slip fails the per-thread
    hash.  Plan shape: ONE user_id-keyed exchange serves the gap
    window, the running session sum, the turn numbering, and the
    final (user_id, thread_id) aggregation — per-user sorts inside
    shuffle partitions, never a global order (w3_gap_sessionize's
    scale argument; contrast t4's built-in session_window form).  At
    100 TB conversation assembly is exactly this plan with user_id as
    the natural partition key."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.expr("CAST(unix_micros(ts) AS BIGINT)").alias("us"),
        "event_type",
        F.expr("CAST(ROUND(value * 100) AS BIGINT)").alias("cents"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    prev = F.lag("us").over(w)
    flagged = ev.withColumn(
        "new_sess",
        F.when(prev.isNull() | (F.col("us") - prev > _CONV1_GAP_US), 1).otherwise(0),
    )
    sess = flagged.withColumn("thread_id", F.sum("new_sess").over(w))
    wt = Window.partitionBy("user_id", "thread_id").orderBy("us", "event_id")
    turns = sess.withColumn("turn_no", F.row_number().over(wt))
    line = F.concat(
        F.when(F.col("turn_no") % 2 == 1, F.lit("user")).otherwise(
            F.lit("assistant")
        ),
        F.lit(": "),
        F.col("event_type"),
        F.lit(" #"),
        F.col("cents").cast("string"),
    )
    rendered = (
        turns.select("user_id", "thread_id", "turn_no", "us", line.alias("line"))
        .groupBy("user_id", "thread_id")
        .agg(
            F.count("*").cast("long").alias("n_turns"),
            F.min("us").cast("long").alias("start_us"),
            (F.max("us") - F.min("us")).cast("long").alias("span_us"),
            F.concat_ws(
                "\n",
                F.expr(
                    "transform(array_sort(collect_list(struct(turn_no, line)))"
                    ", x -> x.line)"
                ),
            ).alias("txt"),
        )
    )
    return rendered.select(
        "user_id",
        F.col("thread_id").cast("long").alias("thread_id"),
        "n_turns",
        "start_us",
        "span_us",
        F.length("txt").cast("long").alias("n_chars"),
        F.md5("txt").alias("rendered_hash"),
    )


# --- BATCH1: length-grouped batch planning (round 6) -------------------------
#
# Trainers batch fixed counts of sequences and pad every sequence to
# the batch max; grouping by length first (HF's LengthGroupedSampler,
# Megatron's sorted batching) collapses the padding waste.  This
# declared query PLANS both strategies per source shard and measures
# the waste each would pay, all-integer.

_BATCH1_SIZE = 32


def _batch1_oracle_arm(order: str, strategy: str) -> str:
    return f"""
    SELECT source, '{strategy}' AS strategy,
           (rn - 1) // {_BATCH1_SIZE} AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tok) AS BIGINT) AS max_len,
           CAST(sum(n_tok) AS BIGINT) AS sum_len,
           CAST(count(*) * max(n_tok) - sum(n_tok) AS BIGINT) AS pad_tokens,
           CAST(1000 * (count(*) * max(n_tok) - sum(n_tok)) AS BIGINT)
               // CAST(count(*) * max(n_tok) AS BIGINT) AS pad_permille
    FROM (
        SELECT source, n_tok,
               row_number() OVER (PARTITION BY source ORDER BY {order})
                   AS rn
        FROM lens
    )
    GROUP BY source, (rn - 1) // {_BATCH1_SIZE}
    """


@query(
    "batch1_length_grouped",
    oracle=f"""
    WITH lens AS (
        SELECT source, doc_id,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    )
    {_batch1_oracle_arm("doc_id", "arrival")}
    UNION ALL
    {_batch1_oracle_arm("n_tok DESC, doc_id", "length")}
    """,
)
def batch1_length_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-grouped batch planning (HF LengthGroupedSampler /
    sorted batching): within each source shard, pack documents into
    32-sequence batches two ways — arrival (doc_id) order and
    length-descending order — and measure per batch the padding each
    strategy pays (every sequence pads to the batch max).  The
    length-grouped arm's pad_permille collapsing toward 0 versus the
    arrival arm IS the measured argument for sorted batching, the
    same measurement-before-strategy shape as skew1.

    All-integer: lengths, pad tokens, and permilles are BIGINT floor
    divisions (positive operands).  Plan shape: one map computes
    lengths (never carrying text past the scan), then each arm is a
    source-partitioned window + (source, batch_id) aggregation —
    per-shard sorts inside shuffle partitions, NO global order (the
    shard-local batching real loaders run); the two arms union
    map-side.  At 100 TB source shards are the loader's natural
    parallel unit and this plan is per-shard linear."""
    lens = _docs(spark, sf_dir).select(
        "source",
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tok"),
    )

    def arm(order_cols: list, strategy: str) -> DataFrame:
        w = Window.partitionBy("source").orderBy(*order_cols)
        return (
            lens.withColumn("rn", F.row_number().over(w))
            .withColumn("batch_id", F.expr(f"(rn - 1) div {_BATCH1_SIZE}"))
            .groupBy("source", "batch_id")
            .agg(
                F.count("*").cast("long").alias("n_docs"),
                F.max("n_tok").cast("long").alias("max_len"),
                F.sum("n_tok").cast("long").alias("sum_len"),
            )
            .select(
                "source",
                F.lit(strategy).alias("strategy"),
                F.col("batch_id").cast("long").alias("batch_id"),
                "n_docs",
                "max_len",
                "sum_len",
                (F.col("n_docs") * F.col("max_len") - F.col("sum_len"))
                .cast("long")
                .alias("pad_tokens"),
                F.expr(
                    "(1000 * (n_docs * max_len - sum_len)) div (n_docs * max_len)"
                )
                .cast("long")
                .alias("pad_permille"),
            )
        )

    return arm([F.col("doc_id")], "arrival").unionByName(
        arm([F.col("n_tok").desc(), F.col("doc_id")], "length")
    )


# --- ID1: scalable global enumeration (dense ids, no global sort) ------------


@query(
    "id1_global_enumeration",
    oracle="""
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
               ORDER BY md5(CAST(doc_id AS VARCHAR))) AS BIGINT) AS global_id
    FROM documents
    ORDER BY doc_id
    """,
)
def id1_global_enumeration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense global ids 1..N in a deterministic (md5-keyed) order —
    the sharding/enumeration primitive every training run needs for
    example ids and resumable iteration — WITHOUT a single global
    sort: rows hash into 256 buckets by their key's first byte, rank
    locally inside each bucket (one hash shuffle, partition-local
    window), and add the bucket's base offset — exclusive prefix sums
    over the 256 bucket counts, a driver-side model-sized table
    (the two-phase zipWithIndex scheme as pure DataFrame ops).
    Because the hex bucket prefix IS the leading key byte, bucket
    order concatenated with in-bucket order equals the total md5
    order, so the oracle is a plain ROW_NUMBER over the global sort.
    At 100 TB the bucket fan-out widens (2-3 prefix chars) but the
    plan is unchanged: no stage ever sees more than one bucket's rows."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.md5(F.col("doc_id").cast("string")).alias("k")
    )
    keyed = docs.withColumn("bucket", F.substring("k", 1, 2))
    counts = {
        r["bucket"]: r["n"]
        for r in keyed.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    offsets, acc = {}, 0
    for b in sorted(counts):
        offsets[b] = acc
        acc += counts[b]
    off = F.create_map(
        *[x for b in sorted(offsets) for x in (F.lit(b), F.lit(offsets[b]))]
    )
    w = Window.partitionBy("bucket").orderBy("k")
    return (
        keyed.select(
            "doc_id",
            (
                F.element_at(off, F.col("bucket"))
                + F.row_number().over(w)
            ).cast("long").alias("global_id"),
        )
        .orderBy("doc_id")
    )


# --- PACK3: best-fit-decreasing packing (round 7) ----------------------------
#
# pack1 packs concatenatively (documents split across bin boundaries:
# zero padding, but examples lose integrity); real trainers that must
# keep documents whole run a bin-packing heuristic instead and pay
# padding for it.  pack3 PLANS that tradeoff per source shard: best-fit
# decreasing (the classic 11/9-OPT heuristic: sort by length
# descending, place each doc in the fullest open bin that still fits)
# against next-fit in arrival order (the zero-sort streaming loader),
# with pack1's split-packing bin count as the exact lower bound
# ceil(tokens/budget).  Verdict r6 #5.


@query(
    "pack3_bfd_packing",
    oracle=f"""
    WITH RECURSIVE lens AS MATERIALIZED (
        SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    srt AS MATERIALIZED (
        SELECT source, n_tok,
               row_number() OVER (PARTITION BY source
                                  ORDER BY n_tok DESC, doc_id) AS r
        FROM lens
    ),
    arr AS MATERIALIZED (
        SELECT source, n_tok,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS r
        FROM lens
    ),
    bfd AS (
        SELECT source, CAST(0 AS BIGINT) AS r, CAST([] AS BIGINT[]) AS caps
        FROM (SELECT DISTINCT source FROM lens)
        UNION ALL
        SELECT b.source, s.r,
            CASE WHEN len(list_filter(b.caps, c -> c >= s.n_tok)) = 0
                 THEN list_append(b.caps,
                                  CAST({_PACK_BUDGET} - s.n_tok AS BIGINT))
                 ELSE list_transform(range(1, len(b.caps) + 1),
                      i -> CASE WHEN i = list_position(b.caps,
                             list_min(list_filter(b.caps,
                                                  c -> c >= s.n_tok)))
                           THEN b.caps[i] - s.n_tok ELSE b.caps[i] END)
            END AS caps
        FROM bfd b JOIN srt s ON s.source = b.source AND s.r = b.r + 1
    ),
    nf AS (
        SELECT source, CAST(0 AS BIGINT) AS r,
               CAST(0 AS BIGINT) AS bins, CAST(0 AS BIGINT) AS rem
        FROM (SELECT DISTINCT source FROM lens)
        UNION ALL
        SELECT n.source, a.r,
               CASE WHEN a.n_tok <= n.rem THEN n.bins ELSE n.bins + 1 END,
               CASE WHEN a.n_tok <= n.rem THEN n.rem - a.n_tok
                    ELSE CAST({_PACK_BUDGET} - a.n_tok AS BIGINT) END
        FROM nf n JOIN arr a ON a.source = n.source AND a.r = n.r + 1
    ),
    bfd_fin AS (
        SELECT source, CAST(len(caps) AS BIGINT) AS bfd_bins
        FROM (SELECT *, max(r) OVER (PARTITION BY source) AS mr FROM bfd)
        WHERE r = mr
    ),
    nf_fin AS (
        SELECT source, bins AS nf_bins
        FROM (SELECT *, max(r) OVER (PARTITION BY source) AS mr FROM nf)
        WHERE r = mr
    ),
    base AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens
        FROM lens GROUP BY source
    )
    SELECT b.source, b.n_docs, b.n_tokens,
           (b.n_tokens + {_PACK_BUDGET} - 1) // {_PACK_BUDGET} AS lb_bins,
           f.bfd_bins, n.nf_bins,
           (1000 * (f.bfd_bins * {_PACK_BUDGET} - b.n_tokens))
               // (f.bfd_bins * {_PACK_BUDGET}) AS bfd_waste_permille,
           (1000 * (n.nf_bins * {_PACK_BUDGET} - b.n_tokens))
               // (n.nf_bins * {_PACK_BUDGET}) AS nf_waste_permille
    FROM base b JOIN bfd_fin f USING (source) JOIN nf_fin n USING (source)
    ORDER BY source
    """,
)
def pack3_bfd_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-document bin packing per source shard: best-fit-decreasing
    (sort docs by token count descending, place each in the open bin
    with the LEAST remaining capacity that still fits, lowest bin index
    on capacity ties) versus next-fit in arrival order (cut a new bin
    whenever the current one can't take the next doc), both against the
    concatenative lower bound ceil(tokens/512) that pack1 achieves by
    splitting documents.  Waste is exact integer permille of bin
    capacity — the padding budget a trainer pays to keep documents
    whole, and the measured argument for sorting before packing.

    Both packers are inherently sequential, so they run as per-shard
    folds (batch1's device): ONE source-keyed exchange collects each
    shard's (length, doc_id) list, and `aggregate` higher-order
    expressions fold BFD's open-bin capacity array / next-fit's
    (bins, remainder) pair inside whole-stage codegen — no Python, no
    global sort, shard-sized state only (open-bin count is bounded by
    shard tokens / 512).  At 100 TB, shards are the loader's parallel
    unit and each fold stays partition-local; the oracle replays both
    folds exactly as per-source recursive CTEs over the same orders.
    Ties and fits are integer comparisons, so both engines walk
    identical placements.  Docs longer than the budget would open
    their own over-full bin on both sides (none exist in this corpus;
    chunk1 is the upstream that enforces the cap in practice)."""
    B = _PACK_BUDGET
    lens = _docs(spark, sf_dir).select(
        "source", "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    per = lens.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tok").cast("long").alias("n_tokens"),
        F.expr("array_sort(collect_list(struct(-n_tok AS neg, doc_id, n_tok)))")
        .alias("by_len"),
        F.expr("array_sort(collect_list(struct(doc_id, n_tok)))").alias("by_id"),
    )
    bfd_caps = F.expr(
        f"""aggregate(by_len, CAST(array() AS array<bigint>), (caps, x) ->
            CASE WHEN size(filter(caps, c -> c >= x.n_tok)) = 0
                 THEN concat(caps, array(CAST({B} - x.n_tok AS bigint)))
                 ELSE transform(caps, (c, i) ->
                      IF(CAST(i + 1 AS bigint) = array_position(caps,
                           array_min(filter(caps, c2 -> c2 >= x.n_tok))),
                         c - x.n_tok, c))
            END)"""
    )
    nf_state = F.expr(
        f"""aggregate(by_id,
            named_struct('bins', CAST(0 AS bigint), 'rem', CAST(0 AS bigint)),
            (a, x) -> IF(x.n_tok <= a.rem,
                named_struct('bins', a.bins,
                             'rem', a.rem - CAST(x.n_tok AS bigint)),
                named_struct('bins', a.bins + 1L,
                             'rem', CAST({B} - x.n_tok AS bigint))))"""
    )
    packed = per.select(
        "source",
        "n_docs",
        "n_tokens",
        F.expr(f"(n_tokens + {B} - 1) div {B}").cast("long").alias("lb_bins"),
        F.size(bfd_caps).cast("long").alias("bfd_bins"),
        nf_state.getField("bins").cast("long").alias("nf_bins"),
    )
    return packed.select(
        "*",
        F.expr(f"(1000 * (bfd_bins * {B} - n_tokens)) div (bfd_bins * {B})")
        .cast("long")
        .alias("bfd_waste_permille"),
        F.expr(f"(1000 * (nf_bins * {B} - n_tokens)) div (nf_bins * {B})")
        .cast("long")
        .alias("nf_waste_permille"),
    ).orderBy("source")


# --- ESS1: sampling-weight effective-sample-size diagnostics (round 9) ----------


@query(
    "ess1_weight_diagnostics",
    oracle="""
    WITH w AS (
        SELECT source,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS w
        FROM documents
    ),
    agg AS (
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(w) AS BIGINT) AS sum_w,
               CAST(sum(w * w) AS BIGINT) AS sum_w2,
               CAST(max(w) AS BIGINT) AS max_w
        FROM w GROUP BY source
    )
    SELECT source, n_docs, sum_w,
           CAST(((1000 * sum_w) // n_docs) // (sum_w2 // sum_w) AS BIGINT)
               AS ess_permille,
           CAST((1000 * max_w) // sum_w AS BIGINT) AS top_share_permille
    FROM agg ORDER BY source
    """,
)
def ess1_weight_diagnostics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective-sample-size diagnostics for length-proportional
    sampling, per source — the audit run BEFORE any weighted sampler
    (samp2's A-ES, dsir1's importance resample) ships: Kish's
    ESS = (Σw)²/Σw² says how many EFFECTIVE documents a weighted draw
    really carries; ESS/n far below 1000‰ means a few long documents
    dominate the sample and the weighting needs tempering.  Weights
    are the exact integer token counts and the permille is the
    TELESCOPED floor form ((1000·Σw) div n) div (Σw² div Σw) — the
    squared-sum form 1000·(Σw)² overflows BIGINT once a source holds
    ~9.6e7 tokens (a loud ANSI failure at any real scale), while the
    telescoped form is safe to Σw ≤ 9.2e15 and within 1‰ + 1/(Σw²/Σw)
    of the rational Kish value; identical integer ops in both engines,
    so no float crosses.  Residual bound: Σw² itself still sums
    per-document w², so one document of ~3e9 tokens (or any source
    whose Σw² exceeds 2^63) would overflow — documents are bounded far
    below that in any real tokenizer pipeline, but a defensive
    deployment would cap w at ingest (ql2's length gate runs first).

    Scale shape: ONE scan, a map-side token count per row (in-row
    split, no explode), and a partial-aggregated 4-moment collapse per
    source — the cheapest possible per-group diagnostic.

    Reference analog: none — extends the LLM-pipeline sampling family
    (SURVEY §2.13) beside samp1/samp2/dsir1/mix1."""
    docs = _docs(spark, sf_dir).select(
        "source",
        F.size(F.split("text", " ")).cast("long").alias("w"),
    )
    agg = docs.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("w").cast("long").alias("sum_w"),
        F.sum(F.col("w") * F.col("w")).cast("long").alias("sum_w2"),
        F.max("w").cast("long").alias("max_w"),
    )
    return agg.select(
        "source",
        "n_docs",
        "sum_w",
        F.expr(
            "CAST(((1000 * sum_w) div n_docs) div (sum_w2 div sum_w)"
            " AS BIGINT)"
        ).alias("ess_permille"),
        F.expr("CAST((1000 * max_w) div sum_w AS BIGINT)").alias(
            "top_share_permille"
        ),
    ).orderBy("source")
