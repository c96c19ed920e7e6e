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
    'shuffle the corpus before each epoch'.  Declared with a LIMIT so
    the driver compares a bounded slice; the full-order plan is a
    range-partitioned sort (Spark's TakeOrderedAndProject for the
    limited form — no single-partition global sort materializes)."""
    docs = _docs(spark, sf_dir)
    w = Window.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id")
    return (
        docs.select(
            F.row_number().over(w).cast("long").alias("pos"), "doc_id"
        )
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
    bin where they start).  The running total is a window cumulative
    sum — at scale this is the one sort the pass needs, and it's a
    range-partitioned sort on the already-sorted storage key, not a
    single-partition window.  Each bin's doc count / token total is the
    packing manifest the training loader consumes."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.size(F.split("text", " ")).alias("n_tok")
    )
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = docs.select(
        "doc_id",
        "n_tok",
        (F.sum("n_tok").over(w) - F.col("n_tok")).alias("cum_before"),
    )
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
