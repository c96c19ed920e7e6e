"""Third-implementation checks for the corpus-statistics operators:
the oracle pins Spark==DuckDB; these recompute the same statistics in
plain Python over the raw parquet, so a shared misreading of the
semantics (an off-by-one in bigram bounds, a miscounted posting) can't
slip through both engines unnoticed."""

from __future__ import annotations

import hashlib
from collections import Counter

import duckdb

from ecostream.queries.registry import QUERIES

from .conftest import SF_SMOKE


def _docs():
    return duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()


def test_ql2_matches_pure_python(spark):
    got = {
        r["doc_id"]: (
            r["n_tok"],
            r["top_tok_frac"],
            r["dup_bigram_frac"],
            r["keep"],
        )
        for r in QUERIES["ql2_gopher_repetition"](spark, SF_SMOKE).collect()
    }
    def iround6(a: int, b: int) -> float:
        # integer-domain round-half-up at scale 6 (the engine's device)
        return ((2 * a * 1_000_000 + b) // (2 * b)) / 1_000_000

    for doc_id, text in _docs():
        toks = text.split(" ")
        n = len(toks)
        top = max(Counter(toks).values())
        bgs = [f"{toks[i]} {toks[i+1]}" for i in range(n - 1)]
        n_dup = len(bgs) - len(set(bgs))
        exp = (
            n,
            iround6(top, n),
            0.0 if not bgs else iround6(n_dup, len(bgs)),
            int(
                top * 100 <= 12 * n
                and (not bgs or n_dup * 100 <= 8 * len(bgs))
            ),
        )
        assert got[doc_id] == exp, (doc_id, got[doc_id], exp)


def test_t12_matches_pure_python(spark):
    postings: dict[str, list[int]] = {}
    cf: Counter = Counter()
    for doc_id, text in _docs():
        c = Counter(text.split(" "))
        for term, n in c.items():
            postings.setdefault(term, []).append(doc_id)
            cf[term] += n
    got = {
        r["term"]: (r["df_docs"], r["cf"], r["postings_head_hash"])
        for r in QUERIES["t12_inverted_index"](spark, SF_SMOKE).collect()
    }
    assert set(got) == set(postings)
    for term, docs in postings.items():
        head = ",".join(str(d) for d in sorted(docs)[:20])
        exp = (
            len(docs),
            cf[term],
            hashlib.md5(head.encode()).hexdigest(),
        )
        assert got[term] == exp, (term, got[term], exp)


def test_lm1_matches_pure_python(spark):
    bigrams: Counter = Counter()
    vocab: set[str] = set()
    for _doc_id, text in _docs():
        toks = text.split(" ")
        vocab.update(toks)
        bigrams.update(zip(toks, toks[1:]))
    cur_tot: Counter = Counter()
    for (cur, _nxt), n in bigrams.items():
        cur_tot[cur] += n
    # replicate the query's top-200 (cnt desc, cur, nxt) selection
    ordered = sorted(bigrams.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    expected = {
        (cur, nxt): (
            n,
            (
                (2 * (n + 1) * 1_000_000 + (cur_tot[cur] + len(vocab)))
                // (2 * (cur_tot[cur] + len(vocab)))
            )
            / 1_000_000,
        )
        for (cur, nxt), n in ordered
    }
    got = {
        (r["cur"], r["nxt"]): (r["cnt"], r["p_add1"])
        for r in QUERIES["lm1_bigram_lm"](spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_lm2_matches_pure_python(spark):
    """Replay the perplexity gate end-to-end in Python: add-one bigram
    LM, per-bigram micro-nat quantization (half-away-from-zero, the
    engines' ROUND), exact integer sum, single final division."""
    import math

    from ecostream.queries.corpus import _LM2_CE_MAX_MICRO

    def round_half_away(x: float) -> int:
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    docs = _docs()
    counts: Counter = Counter()
    cur_tot: Counter = Counter()
    vocab = set()
    doc_bgs = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        vocab.update(toks)
        bgs = [(toks[i], toks[i + 1]) for i in range(len(toks) - 1)]
        doc_bgs[doc_id] = bgs
        counts.update(bgs)
        cur_tot.update(b[0] for b in bgs)
    V = len(vocab)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["ce_micro_nats"], r["keep"])
        for r in QUERIES["lm2_perplexity_gate"](spark, SF_SMOKE).collect()
    }
    assert len(got) == len(docs)
    for doc_id, bgs in doc_bgs.items():
        s = sum(
            round_half_away(
                math.log((counts[b] + 1) / (cur_tot[b[0]] + V)) * 1_000_000
            )
            for b in bgs
        )
        n, ce_micro, keep = got[doc_id]
        assert n == len(bgs)
        assert ce_micro == round_half_away(-s / len(bgs))
        assert keep == (-s <= _LM2_CE_MAX_MICRO * len(bgs))


def test_lm2_gate_splits_corpus(spark):
    rows = QUERIES["lm2_perplexity_gate"](spark, SF_SMOKE).collect()
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows), f"degenerate gate: {kept}/{len(rows)}"


def test_qc1_gate_splits_corpus(spark):
    rows = QUERIES["qc1_linear_quality"](spark, SF_SMOKE).collect()
    kept = sum(r["accept"] for r in rows)
    assert 0 < kept < len(rows), f"degenerate gate: {kept}/{len(rows)}"


def test_lm3_buckets_are_ordered_terciles(spark):
    """Bucket scores must be totally ordered (max(b1) <= min(b2) <=
    ... modulo shared-score ties, which by construction share a
    bucket), and each bucket holds roughly a third of the corpus."""
    rows = QUERIES["lm3_perplexity_buckets"](spark, SF_SMOKE).collect()
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r["bucket"], []).append(r["ce_micro_nats"])
    assert set(by_bucket) == {1, 2, 3}
    assert max(by_bucket[1]) <= min(by_bucket[2])
    assert max(by_bucket[2]) <= min(by_bucket[3])
    n = len(rows)
    for b in (1, 2, 3):
        assert abs(len(by_bucket[b]) - n / 3) <= max(4, 0.05 * n), (
            b,
            len(by_bucket[b]),
            n,
        )


def test_d11_priority_beats_doc_id(spark):
    """Within every duplicate group the kept doc must be from the
    best-priority source present (not merely the min doc_id — the d1
    rule it refines)."""
    from collections import defaultdict

    from ecostream.queries.text import _D11_PRIORITY

    from .conftest import SF_CORRECT

    # sf0.001 has no exact-duplicate groups; the dedup behavior needs
    # the sf0.01 corpus (the driver's correctness scale)
    rows = QUERIES["d11_priority_dedup"](spark, SF_CORRECT).collect()
    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF_CORRECT}/documents.parquet'"
        ).fetchall()
    )
    groups = defaultdict(list)
    for r in rows:
        import hashlib

        fp = " ".join(sorted(set(docs[r["doc_id"]].split(" "))))
        groups[hashlib.md5(fp.encode()).hexdigest()].append(r)
    assert any(len(g) > 1 for g in groups.values())
    for g in groups.values():
        assert len(g) == g[0]["group_size"]
        kept = [r for r in g if r["keep"]]
        assert len(kept) == 1
        best = min(
            (_D11_PRIORITY.get(r["source"], 99), r["doc_id"]) for r in g
        )
        assert (
            _D11_PRIORITY.get(kept[0]["source"], 99),
            kept[0]["doc_id"],
        ) == best


def test_dsir_selects_target_like_documents(spark, tmp_path):
    """DSIR's whole purpose, verified on a PLANTED distribution shift:
    target-tier sources (src0-2) write with vocabulary A, most raw
    docs with vocabulary B, and 50 raw docs with vocabulary A.  The
    importance weights must pull the A-vocabulary docs into the
    selected 20% almost exclusively — the Gumbel noise (O(1) nat) is
    orders below the planted log-ratio gap (~45 nats/doc)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ecostream.queries.corpus import dsir1_importance_resample

    rng = np.random.default_rng(7)
    va = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    vb = ["omega", "psi", "chi", "phi", "upsilon", "tau"]
    rows = []
    for i in range(200):
        if i < 30:
            vocab, source = va, f"src{i % 3}"          # target tier, A
        elif i < 80:
            vocab, source = va, "src10"                 # raw, A-like
        else:
            vocab, source = vb, "src10"                 # raw, B
        toks = [vocab[j] for j in rng.integers(0, len(vocab), 50)]
        rows.append((i, " ".join(toks), "en", source))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
                "lang": pa.array([r[2] for r in rows]),
                "source": pa.array([r[3] for r in rows]),
                "n_chars": pa.array(
                    [len(r[1]) for r in rows], pa.int64()
                ),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = dsir1_importance_resample(spark, str(tmp_path)).collect()
    assert len(got) == 40  # ceil(200/5)
    a_ids = set(range(80))
    n_a = sum(1 for r in got if r["doc_id"] in a_ids)
    assert n_a >= 38, (n_a, sorted(r["doc_id"] for r in got))


def test_d12_incremental_dedup_planted(spark, tmp_path):
    """Incremental-dedup semantics on a PLANTED corpus: delta docs that
    token-shuffle a base doc must be flagged dup_of_base, duplicate
    fingerprints WITHIN the delta keep only their lowest doc_id, and
    novel delta docs survive.  80 base docs + 20 delta docs (ids
    80..99): 81/84/87 copy base docs, 90 and 93 share a fresh
    fingerprint, the rest are unique."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ecostream.queries.text import d12_incremental_dedup

    base = [f"tok{i} alpha beta gamma delta w{i % 7}" for i in range(80)]
    delta = []
    for i in range(80, 100):
        if i in (81, 84, 87):  # token-shuffled copy of a base doc
            delta.append(" ".join(reversed(base[i - 80].split(" "))))
        elif i in (90, 93):  # in-delta duplicate pair
            delta.append("omega psi chi phi")
        else:
            delta.append(f"fresh{i} upsilon tau sigma rho")
    texts = base + delta
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(100), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * 100),
                "source": pa.array(["src1"] * 100),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        r["doc_id"]: (r["dup_of_base"], r["keep"])
        for r in d12_incremental_dedup(spark, str(tmp_path)).collect()
    }
    assert set(got) == set(range(80, 100))
    for i in (81, 84, 87):
        assert got[i] == (True, False), (i, got[i])
    assert got[90] == (False, True)
    assert got[93] == (False, False)  # loses the in-delta keep-min
    for i in set(range(80, 100)) - {81, 84, 87, 90, 93}:
        assert got[i] == (False, True), (i, got[i])


def test_ent1_entropy_gate_planted(spark, tmp_path):
    """The entropy gate's purpose on constructed extremes: a one-token
    loop (entropy exactly 0) must be dropped, an all-distinct doc of
    30 tokens (entropy ln(30) = 3.40 > the 3.0-nat threshold) must
    pass, and the reported micro-nat scores must match the closed
    forms."""
    import math

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ecostream.queries.corpus import ent1_token_entropy_gate

    texts = [
        " ".join(["loop"] * 40),                       # H = 0
        " ".join(f"t{i}" for i in range(30)),          # H = ln 30
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en", "en"]),
                "source": pa.array(["src1", "src1"]),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = {
        r["doc_id"]: r
        for r in ent1_token_entropy_gate(spark, str(tmp_path)).collect()
    }
    assert got[0]["keep"] is False and got[0]["entropy_micro_nats"] == 0
    assert got[1]["keep"] is True
    assert got[1]["entropy_micro_nats"] == round(math.log(30) * 1_000_000)


def test_d13_span_removal_matches_pure_python(spark, tmp_path):
    """Span-removal semantics on a PLANTED corpus, third-implemented in
    pure Python: docs 0 and 1 share an identical 5-token run (so its
    two 4-gram windows are cross-doc repeated and positions 3..7 of
    each are cut), doc 2 is unique (nothing cut), doc 3 is a verbatim
    copy of doc 2 (everything cut), and doc 4 is shorter than a gram
    (kept whole)."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ecostream.queries.text import _D8_N, d13_span_removal_dedup

    texts = [
        "a0 b0 shared one two three four z0 y0",
        "a1 b1 shared one two three four z1 y1",
        "u0 u1 u2 u3 u4 u5 u6",
        "u0 u1 u2 u3 u4 u5 u6",
        "tiny doc here",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["src1"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )

    # pure-Python replay of the declared semantics
    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    gram_docs: dict[str, set[int]] = {}
    for i, t in toks.items():
        for s in range(len(t) - _D8_N + 1):
            gram_docs.setdefault(" ".join(t[s : s + _D8_N]), set()).add(i)
    rep = {g for g, ds in gram_docs.items() if len(ds) >= 2}
    expected = {}
    for i, t in toks.items():
        covered: set[int] = set()
        for s in range(len(t) - _D8_N + 1):
            if " ".join(t[s : s + _D8_N]) in rep:
                covered.update(range(s, s + _D8_N))
        kept = [tok for p, tok in enumerate(t) if p not in covered]
        expected[i] = (
            len(t),
            len(t) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )

    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["clean_hash"])
        for r in d13_span_removal_dedup(spark, str(tmp_path)).collect()
    }
    assert got == expected
    # the planted shape itself: shared run cut, unique doc untouched,
    # verbatim copies fully cut, sub-gram doc kept whole
    assert got[0][1] == 5 and got[1][1] == 5
    assert got[2][1] == len(toks[2]) and got[3][1] == len(toks[3])
    assert got[4][1] == 0


def test_eval6_rouge_extremes(spark, tmp_path):
    """ROUGE pair scoring on planted extremes: an identical pair scores
    1000 permille on every measure, a token-disjoint pair scores 0,
    and a half-overlapping pair matches the hand-computed clipped
    counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ecostream.queries.text import eval6_rouge_overlap

    texts = [
        "alpha beta gamma delta",   # pair 0: identical
        "alpha beta gamma delta",
        "one two three four",       # pair 1: disjoint
        "five six seven eight",
        "x y p q",                  # pair 2: half unigram overlap
        "x y r s",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["src1"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    rows = {
        r["pair_id"]: r
        for r in eval6_rouge_overlap(spark, str(tmp_path)).collect()
    }
    assert rows[0]["r1_f1_permille"] == 1000
    assert rows[0]["r2_f1_permille"] == 1000
    assert rows[1]["r1_f1_permille"] == 0 and rows[1]["r2_clip"] == 0
    # pair 2: unigrams clip 2/4 -> p = r = 500, f1 = 500; the single
    # shared bigram 'x y' clips 1/3 -> 333 permille both ways
    assert rows[2]["r1_clip"] == 2 and rows[2]["r1_f1_permille"] == 500
    assert rows[2]["r2_clip"] == 1
    assert rows[2]["r2_recall_permille"] == 333
    assert rows[2]["r2_f1_permille"] == 333


def test_t13_bm25_length_normalization(spark):
    """BM25's defining property over t11's tf-idf: equal tf, shorter
    doc wins.  Synthesized corpus via a temp view is overkill here —
    instead pin the closed-form integer score on hand values."""
    # score_term = idf * 22*tf*S div (10*tf*S + 3*S + 9*L*N), with
    # idf = (1000*(2N-2df+1)) div (2df+1).  Two docs, same tf=2,
    # lengths 10 vs 100: shorter must score strictly higher.
    N, S, df, tf = 1000, 50_000, 10, 2
    idf = (1000 * (2 * N - 2 * df + 1)) // (2 * df + 1)
    score = lambda L: idf * (22 * tf * S) // (  # noqa: E731
        10 * tf * S + 3 * S + 9 * L * N
    )
    assert score(10) > score(100)
    # Saturation: doubling tf must NOT double the score.
    s1 = idf * (22 * 1 * S) // (10 * 1 * S + 3 * S + 9 * 50 * N)
    s2 = idf * (22 * 2 * S) // (10 * 2 * S + 3 * S + 9 * 50 * N)
    assert s2 < 2 * s1


def test_st13_detects_planted_late_event(spark):
    """An event arriving AFTER a later-timestamped one must be counted
    late by exactly the gap; a >10-minute gap lands in n_dropped_10m."""
    from pyspark.sql import functions as F

    rows = [
        # user 7: arrival order e0(ts=1000s), e1(ts=2000s),
        # e2(ts=2000s - 700s = late by 700s > 600s watermark)
        (0, 7, 1_000_000_000),
        (1, 7, 2_000_000_000),
        (2, 7, 1_300_000_000),
        # user 8: strictly in order, nothing late
        (3, 8, 1_000_000_000),
        (4, 8, 1_100_000_000),
    ]
    df = spark.createDataFrame(
        [(e, u, ts) for e, u, ts in rows], "event_id long, user_id long, us long"
    ).select("event_id", "user_id", F.timestamp_micros("us").alias("ts"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(d + "/events.parquet")
        from ecostream.queries import QUERIES

        out = {
            r["user_id"]: r
            for r in QUERIES["st13_late_data_audit"](spark, d).collect()
        }
    assert out[7]["n_late"] == 1
    assert out[7]["max_late_us"] == 700_000_000
    assert out[7]["n_dropped_10m"] == 1
    assert out[8]["n_late"] == 0 and out[8]["n_dropped_10m"] == 0


def test_w10_planted_runs(spark):
    """A 4-run and a 3-run for one user, split by a non-error; a
    2-run for another user must NOT surface."""
    import tempfile

    from pyspark.sql import functions as F

    from ecostream.queries import QUERIES

    types = {
        # user 1: e e e e | view | e e e   -> runs of 4 and 3
        1: ["error"] * 4 + ["view"] + ["error"] * 3,
        # user 2: e e view e                -> max run 2, below threshold
        2: ["error", "error", "view", "error"],
    }
    rows, eid = [], 0
    for u, seq in types.items():
        for t in seq:
            rows.append((eid, u, t))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string"
    ).select(
        "event_id", "user_id",
        F.timestamp_micros(F.col("event_id") * 1_000_000).alias("ts"),
        "event_type",
        F.lit(1.0).alias("value"),
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(d + "/events.parquet")
        out = QUERIES["w10_error_run_detection"](spark, d).collect()
    got = [(r["user_id"], r["run_len"], r["first_event_id"], r["last_event_id"]) for r in out]
    assert got == [(1, 4, 0, 3), (1, 3, 5, 7)]
