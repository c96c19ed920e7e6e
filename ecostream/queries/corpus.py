"""Corpus-statistics operators: repetition-based quality filtering,
inverted-index construction, and n-gram language-model estimation.

The reference has no text layer at all (its corpus is the insect-event
stream, consumer.py:407); these extend the engine's training-data
pipeline family (BASELINE.json north-star) with the three corpus passes
every pretraining build runs after cleaning:

- ``ql2_gopher_repetition``: Gopher-style repetition gates (Rae et al.
  2021 §A1.1 re-expressed token-level) — fraction of tokens that are the
  single most-frequent token, and fraction of duplicate 2-grams.
- ``t12_inverted_index``: term -> (document frequency, collection
  frequency, posting-list head) — the retrieval index build.
- ``lm1_bigram_lm``: add-one-smoothed bigram conditional probabilities
  — the classic count-based LM estimation pass (feeds perplexity-based
  quality scoring at corpus scale).

All three are pure built-in expressions (split / transform / filter /
explode / window) so they stay inside whole-stage codegen; the oracles
replay the identical lambda pipelines with DuckDB list functions, so the
driver hash-checks every count, fraction, and posting head bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schema import load_table
from .registry import query


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


# --- QL2: Gopher-style repetition quality gates ------------------------------

# Thresholds calibrated on the synthetic corpus so the gate genuinely
# splits it (~80% keep at sf0.01); the published Gopher rules use char
# fractions over 2-grams — token-level analogs keep the arithmetic
# exact-integer so both engines agree bit-for-bit before rounding.
_TOP_TOK_MAX = 0.12
_DUP_BIGRAM_MAX = 0.08

# Bigrams i=1..n-1 as "tok_i tok_{i+1}" strings.  The CASE guard matters:
# Spark's sequence(1, 0) yields a DESCENDING [1, 0] (step auto-negates),
# while DuckDB's generate_series(1, 0) yields [] — so never build the
# index list for a sub-2-token doc.
_BIGRAMS_SPARK = (
    "CASE WHEN size(tokens) >= 2 THEN "
    "transform(sequence(1, size(tokens) - 1), "
    "i -> concat(element_at(tokens, i), ' ', "
    "element_at(tokens, CAST(i + 1 AS INT)))) "
    "ELSE array() END"
)
_BIGRAMS_DUCK = (
    "CASE WHEN len(tokens) >= 2 THEN "
    "list_transform(generate_series(1, len(tokens) - 1), "
    "i -> tokens[i] || ' ' || tokens[i + 1]) "
    "ELSE [] END"
)


@query(
    "ql2_gopher_repetition",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tokens
        FROM documents
    ),
    stats AS (
        SELECT doc_id,
               len(tokens) AS n_tok,
               list_max(list_transform(
                   list_distinct(tokens),
                   t -> len(list_filter(tokens, x -> x = t))
               )) AS top_cnt,
               {_BIGRAMS_DUCK} AS bg
        FROM toks
    )
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tok,
           CAST((2 * top_cnt * 1000000 + n_tok) // (2 * n_tok) AS DOUBLE)
               / 1000000 AS top_tok_frac,
           CASE WHEN len(bg) = 0 THEN 0.0
                ELSE CAST((2 * (len(bg) - len(list_distinct(bg))) * 1000000
                           + len(bg)) // (2 * len(bg)) AS DOUBLE) / 1000000
           END AS dup_bigram_frac,
           CASE WHEN top_cnt * 100 <= 12 * n_tok
                 AND (len(bg) = 0 OR
                      (len(bg) - len(list_distinct(bg))) * 100 <= 8 * len(bg))
                THEN 1 ELSE 0 END AS keep
    FROM stats
    """,
)
def ql2_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality gate (the Gopher rules, token-level):
    drop documents dominated by one token (top_tok_frac > 0.12) or by
    repeated 2-grams (dup_bigram_frac > 0.08) — the standard filter for
    boilerplate / template / degenerate-generation text.

    Plan shape: ZERO shuffles — every statistic is computed inside the
    row with array lambdas (``transform``/``filter``/``array_distinct``),
    so the whole gate is a map over the corpus scan.  The per-row cost is
    O(distinct_tokens x n_tok) for the top-token count; for very long
    documents the explode -> groupBy(doc_id, token) form (one shuffle on
    doc_id) trades the quadratic scan for an exchange — at 100 TB pick
    per partition by average doc length.  Fractions are derived from
    exact integer counts and rounded once, so both engines agree."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.split("text", " ").alias("tokens")
    )
    stats = docs.select(
        "doc_id",
        F.size("tokens").alias("n_tok"),
        F.array_max(
            F.expr(
                "transform(array_distinct(tokens), "
                "t -> size(filter(tokens, x -> x = t)))"
            )
        ).alias("top_cnt"),
        F.expr(_BIGRAMS_SPARK).alias("bg"),
    )
    # ROUND(ratio, 6) of a small-denominator count ratio is NOT
    # engine-portable (the lm2 double-rounding trap: Spark's BigDecimal
    # HALF_UP vs DuckDB's multiply-by-1e6 can disagree when the true
    # ratio lands on a 7-digit terminating decimal like c/640).  Round
    # in the INTEGER domain instead — (2*a*1e6 + b) div (2*b) is exact
    # half-away-up for non-negative ratios — then one exact-operand
    # division back to double.  The gate itself is the cross-multiplied
    # integer inequality, so no boundary doc can flip either.
    top_frac_r = F.expr(
        "CAST((2 * top_cnt * 1000000 + n_tok) div (2 * n_tok) AS DOUBLE)"
        " / 1000000"
    )
    dup_r = F.when(F.size("bg") == 0, F.lit(0.0)).otherwise(
        F.expr(
            "CAST((2 * (size(bg) - size(array_distinct(bg))) * 1000000"
            " + size(bg)) div (2 * size(bg)) AS DOUBLE) / 1000000"
        )
    )
    keep = (F.col("top_cnt") * 100 <= 12 * F.col("n_tok")) & (
        (F.size("bg") == 0)
        | (
            (F.size("bg") - F.size(F.array_distinct("bg"))) * 100
            <= 8 * F.size("bg")
        )
    )
    return stats.select(
        "doc_id",
        F.col("n_tok").cast("long").alias("n_tok"),
        top_frac_r.alias("top_tok_frac"),
        dup_r.alias("dup_bigram_frac"),
        keep.cast("int").alias("keep"),
    )


# --- T12: inverted index construction ---------------------------------------

_POSTINGS_HEAD = 20


@query(
    "t12_inverted_index",
    oracle=f"""
    WITH tf AS (
        SELECT term, doc_id, count(*) AS cnt
        FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM documents
        )
        GROUP BY term, doc_id
    )
    SELECT term,
           count(*) AS df_docs,
           CAST(SUM(cnt) AS BIGINT) AS cf,
           md5(array_to_string(list_transform(
               list_slice(list_sort(list(doc_id)), 1, {_POSTINGS_HEAD}),
               x -> CAST(x AS VARCHAR)), ',')) AS postings_head_hash
    FROM tf
    GROUP BY term
    """,
)
def t12_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index build: per term, the document frequency, the
    collection frequency, and an md5 fingerprint of the first 20 doc_ids
    of the sorted posting list (the list head a top-k retrieval engine
    serves hot).  Two shuffles — (term, doc_id) for tf, then term for
    the merge — both with map-side partial aggregation; collect_list is
    bounded per term only by df, so the declared form caps the PINNED
    content at the head while df/cf stay exact over the whole list.  At
    100 TB the full postings are written out partitioned by a term-hash
    bucket instead of collected; the index build itself is this exact
    plan."""
    docs = _docs(spark, sf_dir)
    tf = (
        docs.select(
            "doc_id", F.explode(F.split("text", " ")).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count("*").alias("cnt"))
    )
    return tf.groupBy("term").agg(
        F.count("*").alias("df_docs"),
        F.sum("cnt").cast("long").alias("cf"),
        F.md5(
            F.concat_ws(
                ",",
                F.expr(
                    f"transform(slice(array_sort(collect_list(doc_id)), 1, "
                    f"{_POSTINGS_HEAD}), x -> CAST(x AS STRING))"
                ),
            )
        ).alias("postings_head_hash"),
    )


# --- LM1: add-one-smoothed bigram language model -----------------------------


@query(
    "lm1_bigram_lm",
    oracle="""
    WITH toks AS (
        SELECT string_split(text, ' ') AS tokens FROM documents
    ),
    bg AS (
        SELECT tokens[i] AS cur, tokens[i + 1] AS nxt
        FROM toks, unnest(generate_series(1, len(tokens) - 1)) AS u(i)
        WHERE len(tokens) >= 2
    ),
    cnts AS (
        SELECT cur, nxt, count(*) AS cnt FROM bg GROUP BY cur, nxt
    ),
    tot AS (
        SELECT cur, nxt, cnt,
               SUM(cnt) OVER (PARTITION BY cur) AS cur_total
        FROM cnts
    ),
    v AS (
        SELECT count(DISTINCT term) AS vocab
        FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
    )
    SELECT cur, nxt, CAST(cnt AS BIGINT) AS cnt,
           CAST((2 * (cnt + 1) * 1000000 + (cur_total + vocab))
                // (2 * (cur_total + vocab)) AS DOUBLE) / 1000000 AS p_add1
    FROM tot, v
    ORDER BY cnt DESC, cur, nxt
    LIMIT 200
    """,
)
def lm1_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-based bigram LM estimation with add-one smoothing:
    P(next | cur) = (c(cur, next) + 1) / (c(cur) + |V|) — the corpus
    pass behind n-gram perplexity quality scoring.  Token pairs are
    built in-row (transform over an index sequence — the M1 lead/lag
    device applied WITHIN an array instead of across rows), exploded,
    and counted once; the conditional totals reuse that shuffle via a
    cur-partitioned window, and |V| arrives as a broadcast 1-row cross
    join, so the whole estimation is two aggregations and one window
    over co-partitioned data.  Probabilities derive from exact integer
    counts, rounded once; top-200 with a total tiebreaker keeps the
    declared result bounded."""
    docs = _docs(spark, sf_dir).select(F.split("text", " ").alias("tokens"))
    bg = (
        docs.where(F.size("tokens") >= 2)
        .select(F.explode(F.expr(_BIGRAMS_SPARK)).alias("bg"))
        .select(
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("cur"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("nxt"),
        )
    )
    cnts = bg.groupBy("cur", "nxt").agg(F.count("*").alias("cnt"))
    tot = cnts.withColumn(
        "cur_total", F.sum("cnt").over(Window.partitionBy("cur"))
    )
    vocab = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("term"))
        .agg(F.countDistinct("term").alias("vocab"))
    )
    return (
        tot.crossJoin(F.broadcast(vocab))
        .select(
            "cur",
            "nxt",
            F.col("cnt").cast("long").alias("cnt"),
            # integer-domain round-6 (the ql2/lm2 portability device):
            # the probability is a small-denominator count ratio, where
            # a float ROUND(x, 6) can double-round differently per engine
            F.expr(
                "CAST((2 * (cnt + 1) * 1000000 + (cur_total + vocab))"
                " div (2 * (cur_total + vocab)) AS DOUBLE) / 1000000"
            ).alias("p_add1"),
        )
        .orderBy(F.desc("cnt"), "cur", "nxt")
        .limit(200)
    )


# --- FH1: hashing-trick vectorization ----------------------------------------

_FH_BUCKETS = 64

_FH_SPARK = (
    "pmod(ascii(substring(md5(term), 1, 1)) * 31 "
    f"+ ascii(substring(md5(term), 2, 1)), {_FH_BUCKETS})"
)
_FH_DUCK = (
    "((ascii(substring(md5(term), 1, 1)) * 31 "
    f"+ ascii(substring(md5(term), 2, 1))) % {_FH_BUCKETS})"
)


@query(
    "fh1_feature_hash",
    oracle=f"""
    SELECT doc_id,
           CAST({_FH_DUCK} AS BIGINT) AS bucket,
           count(*) AS cnt
    FROM (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term
        FROM documents
    )
    GROUP BY doc_id, 2
    """,
)
def fh1_feature_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick vectorization (HashingTF re-expressed as portable
    dataflow): every token hashes into one of 64 feature buckets via
    the md5-digit device, and the sparse (doc_id, bucket, count) triple
    is the document's feature vector — the fixed-width, vocabulary-free
    text representation downstream ML consumes (d6's ml.MinHashLSH
    pipeline uses the library's HashingTF; this is the engine-portable
    twin the oracle can replay).  One explode + one partial-aggregated
    shuffle on (doc_id, bucket); no vocabulary state, which is the
    point of feature hashing at 100 TB."""
    docs = _docs(spark, sf_dir)
    terms = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    )
    return terms.groupBy(
        "doc_id", F.expr(_FH_SPARK).cast("long").alias("bucket")
    ).agg(F.count("*").alias("cnt"))


# --- QC1: linear quality classifier (fasttext-style scoring pass) ------------


def _qc_weight(name: str) -> int:
    """Deterministic md5-derived integer weight in [-1000, 1000]
    milli-units — the plane_weight device: a plain NUMBER both engines
    inline as a literal, so the whole scoring pass is oracle-checkable.
    (A trained classifier would ship its weights the same way: as a
    broadcast constant vector.)"""
    import hashlib

    return (int(hashlib.md5(name.encode()).hexdigest()[:4], 16) % 2001) - 1000


_QC_W = {
    n: _qc_weight(n)
    for n in ("n_tokens", "n_distinct", "n_stop", "n_chars", "bias")
}
# Calibrated operating point: the md5-derived weights are all negative
# on this corpus (scores ~[-287k, -25k] at sf0.01), so the accept
# threshold sits near the score median — exactly how a real quality
# classifier is deployed (threshold tuned on a histogram, cf. CCNet's
# per-bucket perplexity cutoffs).
_QC_THRESHOLD = -160_000


@query(
    "qc1_linear_quality",
    oracle=f"""
    WITH f AS (
        SELECT doc_id,
               len(string_split(text, ' ')) AS nt,
               len(list_distinct(string_split(text, ' '))) AS nd,
               len(list_filter(string_split(text, ' '),
                               t -> t IN ('a', 'the'))) AS ns,
               length(text) AS nc
        FROM documents
    )
    SELECT doc_id,
           CAST({_QC_W["n_tokens"]} * nt + {_QC_W["n_distinct"]} * nd
                + {_QC_W["n_stop"]} * ns + {_QC_W["n_chars"]} * nc
                + {_QC_W["bias"]} AS BIGINT) AS score_milli,
           ({_QC_W["n_tokens"]} * nt + {_QC_W["n_distinct"]} * nd
            + {_QC_W["n_stop"]} * ns + {_QC_W["n_chars"]} * nc
            + {_QC_W["bias"]} >= {_QC_THRESHOLD}) AS accept
    FROM f ORDER BY doc_id
    """,
)
def qc1_linear_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering as a scoring pass (the
    fasttext-classifier gate of CCNet/GPT-3-style pipelines, Wenzek et
    al. 2020): a linear model over cheap per-doc features — token
    count, type count, stopword count, char length — scored map-side
    and thresholded into an accept flag.  Weights are integer
    milli-units and features are integer counts, so every score is an
    exact BIGINT: both engines agree on every boundary document, which
    a float dot product could not promise (the dq2/fs1 exactness
    discipline applied to model inference).

    Plan: zero shuffles — the features, dot product, and threshold are
    one map-side projection over the scan; the 'model' is five literal
    integers (a broadcast constant at real scale).  Ordering is for
    the oracle only; the production form drops it."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    f = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("nt"),
        F.size(F.array_distinct(toks)).cast("long").alias("nd"),
        F.size(F.filter(toks, lambda t: t.isin("a", "the"))).cast("long").alias("ns"),
        F.length("text").cast("long").alias("nc"),
    )
    score = (
        _QC_W["n_tokens"] * F.col("nt")
        + _QC_W["n_distinct"] * F.col("nd")
        + _QC_W["n_stop"] * F.col("ns")
        + _QC_W["n_chars"] * F.col("nc")
        + _QC_W["bias"]
    )
    return f.select(
        "doc_id",
        score.cast("long").alias("score_milli"),
        (score >= _QC_THRESHOLD).alias("accept"),
    ).orderBy("doc_id")


# --- LM2: perplexity-based quality filtering ---------------------------------

# Accept threshold in MICRO-nats — calibrated to the corpus median
# (sf0.01 cross-entropy spans 3.26..3.61 nats, median ~3.387) so the
# gate genuinely splits it, the way a deployed LM filter's cutoff is
# tuned on a held-out score histogram (CCNet picks per-bucket
# perplexity cutoffs the same way).  Integer units keep the decision
# -sum(q) <= threshold * n an EXACT BIGINT inequality.
_LM2_CE_MAX_MICRO = 3_387_000

_LM2_DUCK_Q = (
    "CAST(ROUND(ln(CAST(cnt + 1 AS DOUBLE) / (cur_total + vocab)) * 1000000)"
    " AS BIGINT)"
)


@query(
    "lm2_perplexity_gate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS tokens FROM documents
    ),
    doc_bg AS (
        SELECT doc_id, string_split(bg, ' ')[1] AS cur,
               string_split(bg, ' ')[2] AS nxt
        FROM (SELECT doc_id, unnest({_BIGRAMS_DUCK}) AS bg FROM toks)
    ),
    cnts AS (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt,
               CAST(SUM(count(*)) OVER (PARTITION BY cur) AS BIGINT)
                   AS cur_total
        FROM doc_bg GROUP BY cur, nxt
    ),
    v AS (
        SELECT CAST(count(DISTINCT tok) AS BIGINT) AS vocab
        FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
    ),
    scored AS (
        SELECT d.doc_id, {_LM2_DUCK_Q} AS q
        FROM doc_bg d JOIN cnts USING (cur, nxt) CROSS JOIN v
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(ROUND(CAST(-SUM(q) AS DOUBLE) / count(*)) AS BIGINT)
               AS ce_micro_nats,
           (-SUM(q) <= {_LM2_CE_MAX_MICRO} * count(*)) AS keep
    FROM scored GROUP BY doc_id ORDER BY doc_id
    """,
)
def lm2_perplexity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-based quality filtering (the CCNet/GPT-3 LM gate,
    Wenzek et al. 2020, here with lm1's add-one bigram LM as the scorer
    instead of a pretrained KenLM): per-document cross-entropy
    -avg ln P(next|cur), thresholded into a keep flag — high-perplexity
    (surprising, likely low-quality) documents are dropped.

    Float discipline: each bigram's ln-probability is quantized to
    integer MICRO-NATS before summing (the sim5b/sim8 device), so the
    per-doc sum is an exact BIGINT — immune to float summation order —
    and the keep decision is the EXACT integer inequality
    -sum(q) <= threshold_micro * n.  The reported score is also integer
    micro-nats: a scale-6 ROUND of the float average is NOT portable
    (Spark's BigDecimal HALF_UP vs DuckDB's multiply-by-1e6 disagreed
    on 2 of 5000 docs at sf0.1 — found by the full-scale sweep), while
    round-to-INTEGER of one exact-operand division is, because .5
    boundaries are exactly representable doubles that both engines
    round away from zero.

    Scale shape: the bigram count table is vocab-squared-bounded (join
    it broadcast when small, shuffle on the bigram key when not); the
    doc-side explode reuses the same key for a co-partitioned join; one
    final partial-agg on doc_id.  |V| is a broadcast scalar."""
    docs = _docs(spark, sf_dir).select("doc_id", F.split("text", " ").alias("tokens"))
    doc_bg = (
        docs.where(F.size("tokens") >= 2)
        .select("doc_id", F.explode(F.expr(_BIGRAMS_SPARK)).alias("bg"))
        .select(
            "doc_id",
            F.split_part(F.col("bg"), F.lit(" "), F.lit(1)).alias("cur"),
            F.split_part(F.col("bg"), F.lit(" "), F.lit(2)).alias("nxt"),
        )
    )
    cnts = (
        doc_bg.groupBy("cur", "nxt")
        .agg(F.count("*").alias("cnt"))
        .withColumn(
            "cur_total", F.sum("cnt").over(Window.partitionBy("cur"))
        )
    )
    vocab = (
        _docs(spark, sf_dir)
        .select(F.explode(F.split("text", " ")).alias("tok"))
        .agg(F.countDistinct("tok").cast("long").alias("vocab"))
    )
    q = F.round(
        F.log(
            (F.col("cnt") + 1).cast("double")
            / (F.col("cur_total") + F.col("vocab"))
        )
        * 1_000_000
    ).cast("long")
    scored = (
        doc_bg.join(cnts, ["cur", "nxt"])
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", q.alias("q"))
    )
    neg_s = -F.sum("q")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(neg_s.cast("double") / F.count("*"))
            .cast("long")
            .alias("ce_micro_nats"),
            (neg_s <= _LM2_CE_MAX_MICRO * F.count("*")).alias("keep"),
        )
        .orderBy("doc_id")
    )


# --- LM3: CCNet-style perplexity buckets -------------------------------------


def _lm3_oracle() -> str:
    """Tercile thresholds from the exact integer score distribution,
    applied as CASE cutoffs — composed over the lm2 oracle."""
    from .registry import ORACLES

    lm2 = ORACLES["lm2_perplexity_gate"]
    return f"""
    WITH lm2 AS ({lm2}),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lm2),
    sc AS (SELECT ce_micro_nats AS ce, CAST(count(*) AS BIGINT) AS c
           FROM lm2 GROUP BY 1),
    cum AS (SELECT ce, CAST(SUM(c) OVER (ORDER BY ce) AS BIGINT) AS cum
            FROM sc),
    t AS (SELECT
        (SELECT min(ce) FROM cum, n WHERE cum * 3 >= n) AS t1,
        (SELECT min(ce) FROM cum, n WHERE cum * 3 >= 2 * n) AS t2)
    SELECT doc_id, ce_micro_nats,
           CAST(CASE WHEN ce_micro_nats <= t1 THEN 1
                     WHEN ce_micro_nats <= t2 THEN 2
                     ELSE 3 END AS BIGINT) AS bucket
    FROM lm2, t ORDER BY doc_id
    """


@query("lm3_perplexity_buckets", oracle=_lm3_oracle())
def lm3_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020 §4.3): rank
    the corpus by LM cross-entropy and cut it into terciles — bucket 1
    (head, lowest perplexity) is the cleanest third, the tail is
    usually dropped or down-sampled.  The deployed form of perplexity
    filtering: thresholds learned from the score DISTRIBUTION, not a
    hand-picked constant (lm2's single cutoff is the simpler gate).

    Scale shape — deliberately NOT a global ntile(): a global-order
    window funnels the corpus through one partition (the shuffle1
    lesson).  Instead the tercile CUTOFFS come from the aggregated
    score table (|distinct scores| rows, window-scanned once — at
    100 TB you histogram scores first, same plan one level coarser),
    cross-multiplied against n so the boundary is an exact integer
    decision (cum*3 >= n ⟺ cum >= ceil(n/3)), then broadcast back
    onto the per-doc scores as a map-side CASE.  Ties share a bucket
    by construction — threshold semantics, identical in both
    engines."""
    lm2 = lm2_perplexity_gate(spark, sf_dir).select(
        "doc_id", "ce_micro_nats"
    )
    n = lm2.agg(F.count("*").cast("long").alias("n"))
    sc = lm2.groupBy(F.col("ce_micro_nats").alias("ce")).agg(
        F.count("*").cast("long").alias("c")
    )
    cum = sc.select(
        "ce", F.sum("c").over(Window.orderBy("ce")).alias("cum")
    )
    t = (
        cum.crossJoin(F.broadcast(n))
        .agg(
            F.min(F.when(F.col("cum") * 3 >= F.col("n"), F.col("ce"))).alias(
                "t1"
            ),
            F.min(
                F.when(F.col("cum") * 3 >= 2 * F.col("n"), F.col("ce"))
            ).alias("t2"),
        )
    )
    return (
        lm2.crossJoin(F.broadcast(t))
        .select(
            "doc_id",
            "ce_micro_nats",
            F.when(F.col("ce_micro_nats") <= F.col("t1"), 1)
            .when(F.col("ce_micro_nats") <= F.col("t2"), 2)
            .otherwise(3)
            .cast("long")
            .alias("bucket"),
        )
        .orderBy("doc_id")
    )


# --- DSIR: data selection via importance resampling --------------------------

# Hashed-n-gram feature space (the paper uses 10k buckets over
# unigrams+bigrams; 1024 keeps the oracle light while exercising the
# identical mechanism), target slice = the curated provenance tier
# (d11's priority sources), and a 20% selection budget derived from a
# count so the operator is scale-free.
_DSIR_B = 1024
_DSIR_TARGET_SRC = ("src0", "src1", "src2")
_DSIR_KEEP_FRAC = 5  # keep ceil(n / 5)
# (md5-60-bit + 1) / 2^61 is a u in (0, 0.5] — strictly inside (0, 1)
# even at h's extremes (2^60+2 would ROUND to 2^60 as a double, ulp is
# 128 up there, letting u reach exactly 1.0 and the Gumbel hit ln(0)),
# so the double-log never sees 0 or 1 in either engine.
_DSIR_U_DEN = float(1 << 61)


def _dsir_oracle_tail(docs_cte: str = "dsel_docs") -> str:
    """The DSIR CTE chain from (doc_id, source, tokens) rows to the
    selected (doc_id, weight_micro, score_micro) set — parameterized
    on the input CTE name so pipeline3 can run the identical selection
    over its gate's survivors instead of the whole table."""
    return f"""
    grams AS (
        SELECT doc_id, source,
               ('0x' || substr(md5(g), 1, 15))::UBIGINT::BIGINT
                   % {_DSIR_B} AS b
        FROM (
            SELECT doc_id, source,
                   unnest(list_concat(tokens, {_BIGRAMS_DUCK})) AS g
            FROM {docs_cte}
        )
    ),
    raw AS (SELECT b, CAST(count(*) AS BIGINT) AS cr FROM grams GROUP BY b),
    tgt AS (SELECT b, CAST(count(*) AS BIGINT) AS ct FROM grams
            WHERE source IN {_DSIR_TARGET_SRC} GROUP BY b),
    tot AS (SELECT (SELECT SUM(cr) FROM raw) AS tr,
                   (SELECT COALESCE(SUM(ct), 0) FROM tgt) AS tt),
    lam AS (
        SELECT raw.b,
               CAST(ROUND((
                   ln(CAST(COALESCE(ct, 0) + 1 AS DOUBLE)
                      / CAST(tt + {_DSIR_B} AS DOUBLE))
                 - ln(CAST(cr + 1 AS DOUBLE)
                      / CAST(tr + {_DSIR_B} AS DOUBLE))
               ) * 1000000) AS BIGINT) AS lam
        FROM raw LEFT JOIN tgt ON tgt.b = raw.b CROSS JOIN tot
    ),
    w AS (
        SELECT doc_id, CAST(SUM(lam) AS BIGINT) AS weight_micro
        FROM grams JOIN lam USING (b) GROUP BY doc_id
    ),
    keyed AS (
        SELECT doc_id, weight_micro,
               weight_micro + CAST(ROUND(-ln(-ln(
                   (('0x' || substr(md5('dsir:' || CAST(doc_id AS VARCHAR)),
                                    1, 15))::UBIGINT::BIGINT + 1)
                   / {_DSIR_U_DEN!r})) * 1000000) AS BIGINT) AS score_micro
        FROM w
    ),
    kk AS (SELECT CAST(CEIL(COUNT(*) / {_DSIR_KEEP_FRAC}.0) AS BIGINT) AS k
           FROM {docs_cte}),
    selected AS (
        SELECT doc_id, weight_micro, score_micro
        FROM (SELECT *, row_number() OVER (ORDER BY score_micro DESC,
                                           doc_id) AS rn
              FROM keyed), kk
        WHERE rn <= kk.k
    )"""


@query(
    "dsir1_importance_resample",
    oracle=f"""
    WITH dsel_docs AS (
        SELECT doc_id, source, string_split(text, ' ') AS tokens
        FROM documents
    ),{_dsir_oracle_tail()}
    SELECT doc_id, weight_micro, score_micro FROM selected
    ORDER BY doc_id
    """,
)
def dsir1_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling"):
    fit two hashed-n-gram bag models — p over a small TARGET slice
    (here the curated provenance tier) and q over the RAW corpus —
    weight every raw document by log p(x) - log q(x), add per-document
    Gumbel noise, and keep the top ceil(n/5): Gumbel-top-k over
    log-weights IS sampling-without-replacement proportional to the
    importance weights, so the selected sample is distributed like the
    target even though every step is a deterministic dataflow.

    Exactness discipline: per-bucket log-ratios are quantized to
    integer MICRO-NATS once (lm2's device), so each document's weight
    is an exact BIGINT sum (order-free); the Gumbel key derives u from
    an md5-60-bit integer — (h+1)/2^61, strictly inside (0,1) — and
    both engines compute the identical double -ln(-ln(u)), rounded
    to micro-units and ADDED as integers.  Selection is a pure integer
    sort, so no boundary document can flip between engines.

    Scale shape: the λ table is feature-space-bounded ({B} rows) and
    BROADCAST onto one gram scan; the gram relation is lazily
    checkpointed so its three consumers (raw counts, target counts,
    per-doc scoring) run the explode once; totals come from the
    1024-row count tables, never a second corpus pass; the top-k is
    TakeOrderedAndProject (per-partition heads, no global sort); and
    the selection budget k = ceil(n/{frac}) comes from a count-only
    job.  Reference analog: none — the reference has no data-selection
    surface; this extends the LLM-pipeline family (SURVEY §2.13)."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", "source", F.split("text", " ").alias("tokens")
    )
    return dsir_select(docs).orderBy("doc_id")


dsir1_importance_resample.__doc__ = dsir1_importance_resample.__doc__.format(
    B=_DSIR_B, frac=_DSIR_KEEP_FRAC
)


def dsir_select(docs: DataFrame) -> DataFrame:
    """DSIR selection over ANY (doc_id, source, tokens) relation —
    returns the selected (doc_id, weight_micro, score_micro) rows,
    unordered.  dsir1 runs it over the whole documents table;
    pipeline3 over its quality gate's survivors."""
    import math

    bucket = (
        F.conv(F.substring(F.md5(F.col("g")), 1, 15), 16, 10).cast("long")
        % _DSIR_B
    )
    grams = (
        docs.select(
            "doc_id",
            "source",
            F.explode(
                F.concat(F.col("tokens"), F.expr(_BIGRAMS_SPARK))
            ).alias("g"),
        )
        .select("doc_id", "source", bucket.alias("b"))
        .localCheckpoint(eager=False)
    )
    raw = grams.groupBy("b").agg(F.count("*").cast("long").alias("cr"))
    tgt = grams.where(F.col("source").isin(*_DSIR_TARGET_SRC)).groupBy(
        "b"
    ).agg(F.count("*").cast("long").alias("ct"))
    tot = raw.agg(F.sum("cr").alias("tr")).crossJoin(
        tgt.agg(F.coalesce(F.sum("ct"), F.lit(0)).alias("tt"))
    )
    lam = (
        raw.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                (
                    F.log(
                        (F.coalesce(F.col("ct"), F.lit(0)) + 1).cast("double")
                        / (F.col("tt") + _DSIR_B).cast("double")
                    )
                    - F.log(
                        (F.col("cr") + 1).cast("double")
                        / (F.col("tr") + _DSIR_B).cast("double")
                    )
                )
                * 1_000_000
            )
            .cast("long")
            .alias("lam"),
        )
    )
    w = (
        grams.join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(F.sum("lam").cast("long").alias("weight_micro"))
    )
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dsir:"), F.col("doc_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        + 1
    ) / F.lit(_DSIR_U_DEN)
    keyed = w.select(
        "doc_id",
        "weight_micro",
        (
            F.col("weight_micro")
            + F.round(-F.log(-F.log(u)) * 1_000_000).cast("long")
        ).alias("score_micro"),
    )
    k = math.ceil(docs.count() / _DSIR_KEEP_FRAC)
    return keyed.orderBy(F.desc("score_micro"), "doc_id").limit(k)


# --- ENT1: token-entropy quality gate -----------------------------------------

# Keep threshold in MICRO-nats, calibrated so the gate genuinely
# splits this corpus (doc entropy spans 1.64..3.35 nats at sf0.01,
# median ~3.09): low-entropy documents are repetitive/templated text
# (boilerplate, keyword stuffing, generation loops) — the same signal
# family as Gopher's repetition rules (ql2) but measured as one
# distribution statistic instead of per-n-gram ratios.
_ENT1_MIN_MICRO = 3_000_000


@query(
    "ent1_token_entropy_gate",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS c
        FROM toks GROUP BY doc_id, tok
    ),
    s AS (
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(c) AS BIGINT)
                   * CAST(ROUND(ln(CAST(SUM(c) AS DOUBLE)) * 1000000)
                          AS BIGINT)
               - CAST(SUM(c * CAST(ROUND(ln(CAST(c AS DOUBLE)) * 1000000)
                                   AS BIGINT)) AS BIGINT) AS s_micro
        FROM c GROUP BY doc_id
    )
    SELECT doc_id, n AS n_tokens,
           CAST(ROUND(CAST(s_micro AS DOUBLE) / n) AS BIGINT)
               AS entropy_micro_nats,
           (s_micro >= {_ENT1_MIN_MICRO} * n) AS keep
    FROM s ORDER BY doc_id
    """,
)
def ent1_token_entropy_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon-entropy quality gate over the per-document token
    distribution: H = ln(n) - (1/n)·Σ c·ln(c) — low entropy flags
    repetitive/templated documents (boilerplate, keyword stuffing,
    decoder loops), the distributional cousin of Gopher's per-n-gram
    repetition rules (ql2).

    Exactness discipline (lm2's device, applied twice): ln(c) and
    ln(n) are each quantized to integer MICRO-NATS once, so
    s = n·q(ln n) - Σ c·q(ln c) is an exact BIGINT (order-free sums),
    the keep decision is the EXACT integer inequality
    s >= threshold·n, and the reported score is round-to-integer of
    one exact-operand division — no float accumulation anywhere.

    Scale shape: one shuffle on (doc_id, token) for the counts, one
    partial-agg on doc_id — map-side combine on both; no joins, no
    second corpus pass."""
    docs = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    )
    c = docs.groupBy("doc_id", "tok").agg(
        F.count("*").cast("long").alias("c")
    )
    q = lambda col: F.round(F.log(col.cast("double")) * 1_000_000).cast(
        "long"
    )
    s = c.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        (
            F.sum("c").cast("long") * q(F.sum("c"))
            - F.sum(F.col("c") * q(F.col("c"))).cast("long")
        ).alias("s_micro"),
    )
    return s.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        F.round(F.col("s_micro").cast("double") / F.col("n"))
        .cast("long")
        .alias("entropy_micro_nats"),
        (F.col("s_micro") >= _ENT1_MIN_MICRO * F.col("n")).alias("keep"),
    ).orderBy("doc_id")


# --- CURR1: curriculum training schedule --------------------------------------


def _curr1_oracle() -> str:
    """lm3's tercile tower composed with the per-phase deterministic
    ordering — the whole schedule replays."""
    from .registry import ORACLES

    lm3 = ORACLES["lm3_perplexity_buckets"]
    return f"""
    WITH lm3r AS ({lm3})
    SELECT doc_id, bucket AS phase,
           CAST(row_number() OVER (
               PARTITION BY bucket
               ORDER BY md5('curr:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS pos
    FROM lm3r ORDER BY doc_id
    """


@query("curr1_curriculum_schedule", oracle=_curr1_oracle())
def curr1_curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning schedule (Bengio et al. 2009, the
    perplexity-ordered variant CCNet's buckets were built for): train
    on the cleanest tercile first, then middle, then tail — phase =
    lm3's integer-exact perplexity bucket, and WITHIN each phase a
    deterministic md5 shuffle (shuffle1's device, keyed 'curr:' so the
    order is independent of every other declared permutation).  The
    emitted (doc_id, phase, pos) is the complete training order: sort
    by (phase, pos) and feed batches.

    Scale shape: no global sort anywhere — the position window is
    PHASE-partitioned (3 partitions of ~n/3, the lm3/shuffle2 device,
    never a single-partition global row_number), and the phase
    assignment itself is lm3's broadcast-CASE over an aggregated score
    distribution.  The oracle replays lm2's micro-nat scoring, lm3's
    cutoffs, and the per-phase ordering end to end."""
    from pyspark.sql import Window as W

    lm3 = lm3_perplexity_buckets(spark, sf_dir)
    wp = W.partitionBy("bucket").orderBy(
        F.md5(F.concat(F.lit("curr:"), F.col("doc_id").cast("string"))),
        "doc_id",
    )
    return lm3.select(
        "doc_id",
        F.col("bucket").alias("phase"),
        F.row_number().over(wp).cast("long").alias("pos"),
    ).orderBy("doc_id")


# --- PAIR1: preference-pair assembly (round 6) -------------------------------

_PAIR1_M = 3  # pairs per source

_PAIR1_SCORE_DUCK = f"""
    SELECT doc_id, source,
           CAST({_QC_W["n_tokens"]} * len(string_split(text, ' '))
                + {_QC_W["n_distinct"]}
                  * len(list_distinct(string_split(text, ' ')))
                + {_QC_W["n_stop"]} * len(list_filter(
                      string_split(text, ' '), t -> t IN ('a', 'the')))
                + {_QC_W["n_chars"]} * length(text)
                + {_QC_W["bias"]} AS BIGINT) AS score
    FROM documents
"""


@query(
    "pair1_preference_pairs",
    oracle=f"""
    WITH scored AS ({_PAIR1_SCORE_DUCK}),
    ranked AS (
        SELECT doc_id, source, score,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY score DESC, doc_id
               ) AS BIGINT) AS rb,
               CAST(row_number() OVER (
                   PARTITION BY source ORDER BY score, doc_id DESC
               ) AS BIGINT) AS rw,
               CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
        FROM scored
    )
    SELECT b.source AS source, b.rb AS pair_rank,
           b.doc_id AS chosen_id, w.doc_id AS rejected_id,
           b.score - w.score AS margin_milli
    FROM ranked b JOIN ranked w
      ON w.source = b.source AND w.rw = b.rb
    WHERE b.rb <= {_PAIR1_M} AND 2 * b.rb <= b.n
      AND b.score - w.score > 0
    ORDER BY b.source, pair_rank
    """,
)
def pair1_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PREFERENCE-PAIR assembly — the data-side half of DPO/RLHF reward
    modeling: within each source, pair the {m} highest-quality
    documents (qc1's exact integer linear score) with the {m} lowest as
    (chosen, rejected) examples, keeping only pairs with a strictly
    positive score margin.  The worst-side rank is the EXACT mirror
    ordering (score asc, doc_id desc) of the best side's
    (score desc, doc_id asc), so chosen-i and rejected-i are the i-th
    and (n-i+1)-th elements of one deterministic order, and the
    2·i <= n guard keeps them distinct in small groups — both engines
    agree on every pair including score ties.

    Scale shape: one score projection over the scan (zero-shuffle,
    qc1's plan), one shuffle on source for both rank windows computed
    over the SAME partitioning, and a source-co-partitioned self-join
    on (source, rank) that carries only 2·{m} rows per source.
    Reference analog: none — dataset-assembly extension (SURVEY
    §2.13)."""
    docs = _docs(spark, sf_dir)
    toks = F.split("text", " ")
    score = (
        _QC_W["n_tokens"] * F.size(toks).cast("long")
        + _QC_W["n_distinct"] * F.size(F.array_distinct(toks)).cast("long")
        + _QC_W["n_stop"]
        * F.size(F.filter(toks, lambda t: t.isin("a", "the"))).cast("long")
        + _QC_W["n_chars"] * F.length("text").cast("long")
        + F.lit(_QC_W["bias"]).cast("long")
    )
    scored = docs.select("doc_id", "source", score.alias("score"))
    wb = Window.partitionBy("source").orderBy(F.desc("score"), F.asc("doc_id"))
    ww = Window.partitionBy("source").orderBy(F.asc("score"), F.desc("doc_id"))
    # Both join sides consume `ranked`; the lazy checkpoint runs the
    # score scan + rank windows once instead of per-side (the d10/d5
    # plan-economy lesson).
    ranked = scored.select(
        "doc_id",
        "source",
        "score",
        F.row_number().over(wb).cast("long").alias("rb"),
        F.row_number().over(ww).cast("long").alias("rw"),
        F.count("*").over(Window.partitionBy("source")).cast("long").alias("n"),
    ).localCheckpoint(eager=False)
    b = ranked.where(F.col("rb") <= _PAIR1_M).select(
        "source",
        F.col("rb").alias("pair_rank"),
        F.col("doc_id").alias("chosen_id"),
        F.col("score").alias("b_score"),
        "n",
    )
    w = ranked.select(
        F.col("source").alias("w_source"),
        F.col("rw").alias("w_rank"),
        F.col("doc_id").alias("rejected_id"),
        F.col("score").alias("w_score"),
    )
    return (
        b.join(
            w,
            (F.col("w_source") == F.col("source"))
            & (F.col("w_rank") == F.col("pair_rank")),
        )
        .where(
            (2 * F.col("pair_rank") <= F.col("n"))
            & (F.col("b_score") - F.col("w_score") > 0)
        )
        .select(
            "source",
            "pair_rank",
            "chosen_id",
            "rejected_id",
            (F.col("b_score") - F.col("w_score")).alias("margin_milli"),
        )
        .orderBy("source", "pair_rank")
    )


pair1_preference_pairs.__doc__ = pair1_preference_pairs.__doc__.format(
    m=_PAIR1_M
)


# --- LM4: interpolated Kneser-Ney bigram LM (round 7) --------------------------
#
# lm1's add-one smoothing is the teaching baseline; the smoother every
# deployed n-gram LM actually shipped (KenLM, SRILM defaults) is
# interpolated Kneser-Ney: absolute discounting plus a CONTINUATION
# back-off (how many distinct contexts a word follows, not how often it
# occurs).  With discount D = 3/4 the whole model is exact rational
# arithmetic — no floats, no ln:
#
#   P_KN(b|a) = max(c(ab) - 3/4, 0)/c(a) + (3/4)·N1+(a·)/c(a) · cc(b)/T
#             = [ T·max(4·c(ab) - 3, 0) + 3·N1+(a·)·cc(b) ]
#               / ( 4·c(a)·T )
#
# where N1+(a·) = distinct successors of a, cc(b) = distinct
# predecessors of b (the continuation count), T = distinct bigram types.


@query(
    "lm4_kneser_ney",
    oracle="""
    WITH toks AS (
        SELECT string_split(text, ' ') AS tokens FROM documents
    ),
    bg AS (
        SELECT tokens[i] AS cur, tokens[i + 1] AS nxt
        FROM toks, unnest(generate_series(1, len(tokens) - 1)) AS u(i)
        WHERE len(tokens) >= 2
    ),
    cnts AS (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS cnt
        FROM bg GROUP BY cur, nxt
    ),
    stats AS (
        SELECT cur, nxt, cnt,
               SUM(cnt) OVER (PARTITION BY cur) AS c_a,
               COUNT(*) OVER (PARTITION BY cur) AS n1p_a,
               COUNT(*) OVER (PARTITION BY nxt) AS cc_b,
               COUNT(*) OVER () AS t
        FROM cnts
    )
    SELECT cur, nxt, cnt,
           CAST(t * greatest(4 * cnt - 3, 0) + 3 * n1p_a * cc_b AS BIGINT)
               AS p_num,
           CAST(4 * c_a * t AS BIGINT) AS p_den,
           CAST((1000000 * (t * greatest(4 * cnt - 3, 0) + 3 * n1p_a * cc_b))
                // (4 * c_a * t) AS BIGINT) AS p_kn_micro
    FROM stats
    ORDER BY cnt DESC, cur, nxt
    LIMIT 200
    """,
)
def lm4_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram LM (the production n-gram
    smoother, Kneser & Ney 1995 / Chen & Goodman 1998) with discount
    D = 3/4, which makes every probability an exact rational: the
    numerator T·max(4c(ab)−3, 0) + 3·N1+(a·)·cc(b) and denominator
    4·c(a)·T are BIGINTs, reported with the floor-micro probability —
    no floats anywhere, so the oracle is bit-exact (contrast lm1's
    add-one baseline).  cc(b) is the continuation count — distinct
    LEFT contexts of b — the insight that makes KN beat frequency
    back-off ("francisco" is frequent but follows only "san").

    Scale shape: ONE (cur, nxt) pair-count shuffle; c(a), N1+(a·),
    cc(b), and T are windows over the TYPE table (vocabulary², not
    corpus, sized), the same exchange reused by partition; top-200 by
    count via TakeOrderedAndProject.  At 100 TB the type table is the
    model and everything after the first aggregation is model-sized."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(F.split("text", " ").alias("tokens")).where(
        F.size("tokens") >= 2
    )
    bg = toks.select(
        F.explode(
            F.expr(
                "transform(sequence(1, size(tokens) - 1), "
                "i -> struct(element_at(tokens, i) AS cur, "
                "element_at(tokens, CAST(i + 1 AS INT)) AS nxt))"
            )
        ).alias("p")
    ).select("p.cur", "p.nxt")
    cnts = bg.groupBy("cur", "nxt").agg(F.count("*").cast("long").alias("cnt"))
    # c(a) and N1+(a·) ride one cur-keyed window; cc(b) is a nxt-keyed
    # aggregate joined back; T broadcasts as a 1-row table — no global
    # window funnels the type table through a single partition.
    wa = Window.partitionBy("cur")
    ccs = cnts.groupBy("nxt").agg(F.count("*").cast("long").alias("cc_b"))
    tdf = cnts.agg(F.count("*").cast("long").alias("t"))
    stats = (
        cnts.withColumn("c_a", F.sum("cnt").over(wa))
        .withColumn("n1p_a", F.count("*").over(wa))
        .join(ccs, "nxt")
        .crossJoin(F.broadcast(tdf))
    )
    num = F.expr("t * greatest(4 * cnt - 3, 0L) + 3 * n1p_a * cc_b")
    den = F.expr("4 * c_a * t")
    return (
        stats.select(
            "cur",
            "nxt",
            "cnt",
            num.cast("long").alias("p_num"),
            den.cast("long").alias("p_den"),
            F.expr(
                "(1000000 * (t * greatest(4 * cnt - 3, 0L) + 3 * n1p_a * cc_b))"
                " div (4 * c_a * t)"
            )
            .cast("long")
            .alias("p_kn_micro"),
        )
        .orderBy(F.desc("cnt"), "cur", "nxt")
        .limit(200)
    )


# --- ENT2: per-user behavioural diversity entropy (round 9) ---------------------


@query(
    "ent2_user_diversity",
    oracle="""
    WITH c AS (
        SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
               CAST(count(*) AS BIGINT) AS k
        FROM c GROUP BY 1
    ),
    ent AS (
        SELECT c.user_id,
               CAST(sum(c.c * (CAST(round(1000000 * ln(t.n)) AS BIGINT)
                               - CAST(round(1000000 * ln(c.c)) AS BIGINT)))
                    // t.n AS BIGINT) AS h_micro,
               max(t.n) AS n, max(t.k) AS k
        FROM c JOIN tot t USING (user_id)
        GROUP BY c.user_id, t.n
    ),
    b AS (
        SELECT CAST(h_micro // 200000 AS BIGINT) AS h_bucket,
               n, k
        FROM ent
    )
    SELECT h_bucket, CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(n) AS BIGINT) AS n_events,
           CAST(sum(k) AS BIGINT) AS sum_types,
           CAST(max(k) AS BIGINT) AS max_types
    FROM b GROUP BY h_bucket ORDER BY h_bucket
    """,
)
def ent2_user_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioural diversity — Shannon entropy of each user's
    event-type distribution in integer MICRO-NATS (ent1's device
    pointed at the BEHAVIOUR axis: ent1 scores token repetition inside
    documents, this scores action repetition inside user timelines —
    the bot/power-user/monoculture segmentation signal), rolled up
    into 0.2-nat entropy buckets with user counts, event mass, and
    type-count extremes per bucket.  H = (Σ c·(q(ln n) − q(ln c)))/n
    with each ln quantized to micro-nats BEFORE the sum (lm2's
    portability rule), so per-user entropy is an exact BIGINT and no
    boundary user can flip buckets between engines.

    Scale shape: one partial-aggregated (user, type) count shuffle, a
    user-keyed rollup, then map-side integer arithmetic and a
    bucket-sized final aggregate — the libm ln rides the two-scale
    sweep's regression net like every micro-nat op.

    Reference analog: none — extends the corpus/stats families
    (SURVEY §2.13) beside ent1/seg1/anon1."""
    ev = load_table(spark, sf_dir, "events")
    c = ev.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("c")
    )
    tot = c.groupBy("user_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    ent = (
        c.join(tot, "user_id")
        .select(
            "user_id",
            "n",
            "k",
            F.expr(
                "c * (CAST(round(1000000 * ln(n)) AS BIGINT)"
                " - CAST(round(1000000 * ln(c)) AS BIGINT))"
            ).alias("term"),
        )
        .groupBy("user_id", "n")
        .agg(
            F.expr("CAST(sum(term) div max(n) AS BIGINT)").alias("h_micro"),
            F.max("k").cast("long").alias("k"),
        )
    )
    return (
        ent.select(
            F.expr("CAST(h_micro div 200000 AS BIGINT)").alias("h_bucket"),
            "n",
            "k",
        )
        .groupBy("h_bucket")
        .agg(
            F.count("*").cast("long").alias("n_users"),
            F.sum("n").cast("long").alias("n_events"),
            F.sum("k").cast("long").alias("sum_types"),
            F.max("k").cast("long").alias("max_types"),
        )
        .orderBy("h_bucket")
    )
