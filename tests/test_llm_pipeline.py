"""Training-data preparation operators (queries/llm_pipeline.py):
semantic invariants the oracle hash can't express directly, plus the
plan shapes that decide 100 TB behavior."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def test_chunk1_covers_every_token_with_fixed_overlap(spark):
    """Chunk windows must tile each document completely: first chunk
    starts at 0, consecutive chunks overlap by len-stride tokens, and
    summed coverage equals n_tokens + overlap·(n_chunks−1)."""
    from ecostream.queries.llm_pipeline import (
        _CHUNK_LEN,
        _CHUNK_STRIDE,
        chunk1_token_windows,
        _docs,
    )

    chunks = chunk1_token_windows(spark, SF_SMOKE)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_tokens").alias("covered"),
            F.min("chunk_idx").alias("first_idx"),
            F.max("chunk_idx").alias("last_idx"),
        )
        .collect()
    )
    n_tok = {
        r["doc_id"]: r["n"]
        for r in _docs(spark, SF_SMOKE)
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .collect()
    }
    assert per_doc and len(per_doc) == len(n_tok)
    for r in per_doc:
        n = n_tok[r["doc_id"]]
        assert r["first_idx"] == 0
        assert r["n_chunks"] == (n + _CHUNK_STRIDE - 1) // _CHUNK_STRIDE
        assert r["last_idx"] == r["n_chunks"] - 1
        expected_cover = sum(
            min(_CHUNK_LEN, n - s) for s in range(0, n, _CHUNK_STRIDE)
        )
        assert r["covered"] == expected_cover
        assert r["covered"] >= n  # complete coverage


def test_chunk1_no_shuffle(spark):
    """Chunking is embarrassingly parallel — the plan must contain NO
    exchange (map-side Generate only)."""
    from ecostream.queries.llm_pipeline import chunk1_token_windows

    p = _plan(chunk1_token_windows(spark, SF_SMOKE))
    assert "Exchange" not in p, p


def test_split1_deterministic_and_disjoint(spark):
    """Every doc lands in exactly one split, repeat runs are identical,
    and proportions are within a loose band of 90/5/5."""
    from ecostream.queries.llm_pipeline import split1_train_val_test

    a = {r["split"]: r for r in split1_train_val_test(spark, SF_SMOKE).collect()}
    b = {r["split"]: r for r in split1_train_val_test(spark, SF_SMOKE).collect()}
    assert set(a) == {"train", "val", "test"}
    assert {k: (v["n_docs"], v["total_chars"]) for k, v in a.items()} == {
        k: (v["n_docs"], v["total_chars"]) for k, v in b.items()
    }
    total = sum(v["n_docs"] for v in a.values())
    assert 0.80 <= a["train"]["n_docs"] / total <= 0.97


def test_shuffle1_no_global_sort_materialized(spark):
    """The bounded training-order slice must plan as a top-k
    (TakeOrderedAndProject), not a full global Sort of the corpus —
    and, since pos comes from the distributed prefix count, NOTHING in
    the plan may move the corpus through one task (an unpartitioned
    row_number window would show 'Exchange SinglePartition')."""
    from ecostream.queries.llm_pipeline import shuffle1_training_order

    p = _plan(shuffle1_training_order(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in p, p
    assert "SinglePartition" not in p, p


def test_shuffle1_pos_is_dense_global_rank(spark):
    """pos must equal the 1-based rank in (md5(doc_id), doc_id) order —
    the distributed prefix count must agree with a straight sort."""
    from ecostream.queries.llm_pipeline import _docs, shuffle1_training_order
    from pyspark.sql import functions as F

    got = [
        (r["pos"], r["doc_id"])
        for r in shuffle1_training_order(spark, SF_SMOKE).collect()
    ]
    want = [
        (i + 1, r["doc_id"])
        for i, r in enumerate(
            _docs(spark, SF_SMOKE)
            .select("doc_id", F.md5(F.col("doc_id").cast("string")).alias("h"))
            .orderBy("h", "doc_id")
            .limit(500)
            .collect()
        )
    ]
    assert got == want


def test_pack1_bins_are_contiguous_and_budgeted(spark):
    """Bin ids must be a gapless 0..B-1 range and every bin except the
    last must hold ≥ the budget once its straddling doc is counted
    (each bin ends with the doc that crosses the boundary)."""
    from ecostream.queries.llm_pipeline import (
        _PACK_BUDGET,
        pack1_sequence_packing,
    )

    rows = sorted(
        pack1_sequence_packing(spark, SF_SMOKE).collect(),
        key=lambda r: r["bin"],
    )
    bins = [r["bin"] for r in rows]
    assert bins == list(range(len(bins)))
    # cumulative totals must cross each bin boundary in order
    cum = 0
    for r in rows[:-1]:
        cum += r["n_tokens"]
        assert cum >= (r["bin"] + 1) * _PACK_BUDGET


def test_pipeline2_manifest_matches_python_recomputation(spark):
    """Recompute the ENTIRE training manifest in plain Python over the
    collected corpus (dedup keep-min → t6 gate → md5 split buckets →
    per-split 512-token packing) and compare bin-for-bin — an
    independent implementation, not a re-run of the Spark code."""
    import hashlib
    from collections import defaultdict

    from ecostream.queries.llm_pipeline import (
        _PACK_BUDGET,
        pipeline2_training_manifest,
        _docs,
    )

    rows = _docs(spark, SF_SMOKE).select("doc_id", "text").collect()

    # dedup: keep lowest doc_id per content hash
    best = {}
    for r in sorted(rows, key=lambda r: r["doc_id"]):
        h = hashlib.md5(r["text"].encode()).hexdigest()
        best.setdefault(h, r)
    kept = sorted(best.values(), key=lambda r: r["doc_id"])

    # quality gate: token count in [10, 1000], type-token ratio > 0.1
    gated = []
    for r in kept:
        toks = r["text"].split(" ")
        if 10 <= len(toks) <= 1000 and len(set(toks)) / len(toks) > 0.1:
            gated.append((r["doc_id"], len(toks)))

    # split assignment: two md5 hex digits of doc_id -> 0..99
    def split_of(doc_id):
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        b = (ord(h[0]) * 31 + ord(h[1])) % 100
        return "train" if b < 90 else ("val" if b < 95 else "test")

    # per-split contiguous packing by doc_id order
    expected = defaultdict(lambda: [0, 0])  # (split, bin) -> [docs, tokens]
    cum = defaultdict(int)
    for doc_id, n_tok in gated:  # already doc_id-ordered
        sp = split_of(doc_id)
        b = cum[sp] // _PACK_BUDGET
        expected[(sp, b)][0] += 1
        expected[(sp, b)][1] += n_tok
        cum[sp] += n_tok

    got = {
        (r["split"], r["bin"]): [r["n_docs"], r["n_tokens"]]
        for r in pipeline2_training_manifest(spark, SF_SMOKE).collect()
    }
    assert got == dict(expected)


def test_ql1_domain_quota_cap_and_stability(spark):
    """Quota capping: ≤10 docs kept per source, the kept set is a
    subset of that source's docs, and it is invariant under input
    repartitioning (hash order, not partition order)."""
    from ecostream.queries.llm_pipeline import ql1_domain_quota
    from ecostream.schema import load_table
    from .conftest import SF_SMOKE

    rows = ql1_domain_quota(spark, SF_SMOKE).collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    docs = load_table(spark, SF_SMOKE, "documents")
    totals = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").count().withColumnRenamed("count", "n").collect()
    }
    for src, kept in by_src.items():
        assert len(kept) <= 10
        assert len(kept) == min(10, totals[src])
        assert sorted(r["pos"] for r in kept) == list(range(1, len(kept) + 1))
    # repartition stability: same kept (source, doc_id) set
    import ecostream.queries.llm_pipeline as m
    from pyspark.sql import functions as F, Window

    shuffled = docs.repartition(13)
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    again = {
        (r["source"], r["doc_id"])
        for r in shuffled.select(
            "source", "doc_id", F.row_number().over(w).alias("pos")
        ).where(F.col("pos") <= 10).collect()
    }
    assert again == {(r["source"], r["doc_id"]) for r in rows}


def test_mix1_matches_pure_python(spark):
    """Replay temperature mixing in Python: sqrt weights quantized to
    micro-units, integer quota floor-division, md5-order selection —
    and check the alpha<1 property (smaller sources get a LARGER
    sampled fraction than bigger ones, pre-flooring)."""
    import hashlib
    import math
    from collections import defaultdict

    import duckdb

    from ecostream.queries.llm_pipeline import (
        _MIX1_BUDGET,
        mix1_temperature_sampling,
    )
    from .conftest import SF_SMOKE

    rows = duckdb.sql(
        f"SELECT doc_id, source FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchall()
    by_src = defaultdict(list)
    for doc_id, src in rows:
        by_src[src].append(doc_id)
    w = {
        s: int(math.floor(abs(math.sqrt(len(ids)) * 1_000_000) + 0.5))
        for s, ids in by_src.items()
    }
    tw = sum(w.values())
    quota = {s: (_MIX1_BUDGET * w[s]) // tw for s in by_src}
    expected = set()
    for s, ids in by_src.items():
        ordered = sorted(
            ids, key=lambda d: (hashlib.md5(str(d).encode()).hexdigest(), d)
        )
        for pos, d in enumerate(ordered[: quota[s]], start=1):
            expected.add((s, quota[s], d, pos))
    got = {
        (r["source"], r["quota"], r["doc_id"], r["pos"])
        for r in mix1_temperature_sampling(spark, SF_SMOKE).collect()
    }
    assert got == expected
    # alpha = 0.5 property on the raw weights: sampled fraction
    # w_s/c_s is strictly decreasing in source size
    sizes = sorted((len(ids), s) for s, ids in by_src.items())
    for (c1, s1), (c2, s2) in zip(sizes, sizes[1:]):
        if c1 < c2:
            assert w[s1] * c2 > w[s2] * c1


def test_shuffle2_epochs_are_distinct_permutation_heads(spark):
    """Each epoch's order head must be a duplicate-free id list, and
    the three epochs must produce pairwise DIFFERENT orders (the point
    of per-epoch reshuffling)."""
    from ecostream.queries.llm_pipeline import (
        _SHUFFLE2_EPOCHS,
        _SHUFFLE2_HEAD,
        shuffle2_epoch_orders,
    )
    from .conftest import SF_SMOKE

    rows = shuffle2_epoch_orders(spark, SF_SMOKE).collect()
    orders = {}
    for r in rows:
        orders.setdefault(r["epoch"], []).append((r["pos"], r["doc_id"]))
    assert set(orders) == set(range(_SHUFFLE2_EPOCHS))
    for e, o in orders.items():
        o.sort()
        assert [p for p, _ in o] == list(range(1, _SHUFFLE2_HEAD + 1))
        ids = [d for _, d in o]
        assert len(set(ids)) == len(ids)
    seqs = [tuple(d for _, d in sorted(orders[e])) for e in sorted(orders)]
    for i in range(len(seqs)):
        for j in range(i + 1, len(seqs)):
            assert seqs[i] != seqs[j], (i, j)


def test_samp2_selection_is_weight_proportional(spark):
    """A-ES sampling must visibly skew toward heavy documents:
    inclusion probability is proportional to n_chars, and with weights
    spanning ~60..600 the selected mean measures ~1.55x the corpus
    mean — 1.3x is a safe regression floor that still fails for any
    uniform-sampling bug."""
    import duckdb

    from ecostream.queries.llm_pipeline import samp2_weighted_wor

    rows = samp2_weighted_wor(spark, SF_SMOKE).collect()
    mean_sel = sum(r["weight"] for r in rows) / len(rows)
    mean_all = duckdb.sql(
        f"SELECT avg(n_chars) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    assert mean_sel >= 1.3 * mean_all, (mean_sel, mean_all)


def test_waterfill_saturating_regime_matches_brute_force(spark):
    """The corpus's near-uniform sources can never saturate under a
    sub-total budget (see the mix2 calibration note), so the saturating
    branch — small sources taken whole, the level re-spread over the
    rest — is pinned here on a SKEWED synthetic availability table
    against a brute-force integer waterlevel, across several budget
    fractions including edge cases (zero budget, budget >= total)."""
    from ecostream.queries.llm_pipeline import waterfill_allocation

    avail = {
        "tiny": 3,
        "small": 40,
        "mid": 500,
        "big": 6_000,
        "huge": 70_000,
        "whale": 800_000,
    }
    s = spark.createDataFrame(
        [(k, v) for k, v in avail.items()], "source string, avail long"
    )

    def brute_level(budget: int) -> int:
        t = 0
        # cap at max(avail): past it sum(min(a, t)) is constant and a
        # budget >= total would otherwise loop forever
        while t < max(avail.values()) and (
            sum(min(a, t + 1) for a in avail.values()) <= budget
        ):
            t += 1
        return t

    total = sum(avail.values())
    for num, den in ((0, 1), (1, 4), (3, 4), (99, 100), (1, 1), (5, 4)):
        budget = (total * num) // den
        t = brute_level(budget)
        want = {k: min(a, t) for k, a in avail.items()}
        got = {
            r["source"]: (r["alloc_chars"], r["saturated"])
            for r in waterfill_allocation(s, num, den).collect()
        }
        assert set(got) == set(avail)
        for k in avail:
            assert got[k] == (want[k], avail[k] <= t), (num, den, k, t, got)
        assert sum(a for a, _ in got.values()) <= budget
    # the 3/4 fraction must exercise BOTH branches on this table
    budget = (total * 3) // 4
    t = brute_level(budget)
    sat = [k for k, a in avail.items() if a <= t]
    assert sat and len(sat) < len(avail)


def test_conv1_threads_match_pure_python(spark):
    """Conversation threading third-implemented in Python from the raw
    events: same 30-minute gap sessionization, same turn ordering and
    role alternation, same rendered bytes (hash-compared per thread)."""
    import hashlib

    from ecostream.queries.llm_pipeline import (
        _CONV1_GAP_US,
        conv1_chat_threads,
    )
    from ecostream.schema import load_table

    ev = [
        (
            r["user_id"],
            r["event_id"],
            int(r["ts"].timestamp() * 1_000_000)
            if not hasattr(r["ts"], "value")
            else r["ts"].value // 1000,
            r["event_type"],
            round(r["value"] * 100),
        )
        for r in load_table(spark, SF_SMOKE, "events").collect()
    ]
    by_user: dict[int, list] = {}
    for u, eid, us, et, cents in ev:
        by_user.setdefault(u, []).append((us, eid, et, cents))
    expected = {}
    for u, rows in by_user.items():
        rows.sort()
        thread, prev = 0, None
        turns: dict[int, list] = {}
        for us, eid, et, cents in rows:
            if prev is None or us - prev > _CONV1_GAP_US:
                thread += 1
            prev = us
            turns.setdefault(thread, []).append((us, eid, et, cents))
        for t, tr in turns.items():
            txt = "\n".join(
                f"{'user' if i % 2 == 0 else 'assistant'}: {et} #{cents}"
                for i, (_, _, et, cents) in enumerate(tr)
            )
            expected[(u, t)] = (
                len(tr),
                tr[0][0],
                tr[-1][0] - tr[0][0],
                len(txt),
                hashlib.md5(txt.encode()).hexdigest(),
            )
    got = {
        (r["user_id"], r["thread_id"]): (
            r["n_turns"],
            r["start_us"],
            r["span_us"],
            r["n_chars"],
            r["rendered_hash"],
        )
        for r in conv1_chat_threads(spark, SF_SMOKE).collect()
    }
    assert got == expected


def test_batch1_length_grouping_reduces_padding(spark):
    """Per source, the length-grouped arm must never pay more total
    padding than the arrival arm (sorted-contiguous grouping minimizes
    the sum of batch maxima for fixed batch sizes), and one source's
    batches must match a pure-Python replay of both arms."""
    from ecostream.queries.llm_pipeline import (
        _BATCH1_SIZE,
        batch1_length_grouped,
    )
    from ecostream.schema import load_table

    rows = batch1_length_grouped(spark, SF_SMOKE).collect()
    pad: dict[tuple, int] = {}
    for r in rows:
        pad[(r["source"], r["strategy"])] = pad.get(
            (r["source"], r["strategy"]), 0
        ) + r["pad_tokens"]
    sources = {s for s, _ in pad}
    assert sources and all(
        pad[(s, "length")] <= pad[(s, "arrival")] for s in sources
    )

    docs = [
        (r["doc_id"], r["source"], len(r["text"].split(" ")))
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    ]
    src = sorted(sources)[0]
    mine = [(d, n) for d, s, n in docs if s == src]

    def replay(ordered):
        out = {}
        for b in range(0, len(ordered), _BATCH1_SIZE):
            batch = ordered[b : b + _BATCH1_SIZE]
            lens = [n for _, n in batch]
            out[b // _BATCH1_SIZE] = (
                len(batch),
                max(lens),
                sum(lens),
                len(batch) * max(lens) - sum(lens),
            )
        return out

    exp = {
        "arrival": replay(sorted(mine)),
        "length": replay(sorted(mine, key=lambda x: (-x[1], x[0]))),
    }
    for r in rows:
        if r["source"] != src:
            continue
        assert (
            r["n_docs"],
            r["max_len"],
            r["sum_len"],
            r["pad_tokens"],
        ) == exp[r["strategy"]][r["batch_id"]], (r["strategy"], r["batch_id"])


def test_id1_ids_dense_and_unique(spark):
    """Global enumeration must be a bijection onto 1..N."""
    from ecostream.queries import QUERIES

    out = QUERIES["id1_global_enumeration"](spark, SF_SMOKE).collect()
    ids = sorted(r["global_id"] for r in out)
    assert ids == list(range(1, len(out) + 1))


def test_id1_order_matches_key_order(spark):
    """Bucketed two-phase rank must equal the true global md5 order."""
    import hashlib

    from ecostream.queries import QUERIES

    out = QUERIES["id1_global_enumeration"](spark, SF_SMOKE).collect()
    key = {
        r["doc_id"]: hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        for r in out
    }
    by_id = sorted(out, key=lambda r: r["global_id"])
    keys = [key[r["doc_id"]] for r in by_id]
    assert keys == sorted(keys)


def test_pack3_bfd_dominates_and_matches_python(spark):
    """pack3: best-fit-decreasing must (a) never beat the concatenative
    lower bound, (b) dominate next-fit on this corpus (the measured
    argument for sorting before packing, VERDICT r6 #5), and (c) match
    an independent pure-Python replay of both folds placement by
    placement."""
    import duckdb

    from ecostream.queries.llm_pipeline import _PACK_BUDGET, pack3_bfd_packing

    rows = {r["source"]: r for r in pack3_bfd_packing(spark, SF_SMOKE).collect()}
    docs = duckdb.sql(
        f"SELECT source, doc_id, len(string_split(text, ' ')) FROM "
        f"'{SF_SMOKE}/documents.parquet' ORDER BY source, doc_id"
    ).fetchall()
    by_src: dict = {}
    for src, doc_id, n in docs:
        by_src.setdefault(src, []).append((doc_id, n))
    B = _PACK_BUDGET
    for src, items in by_src.items():
        # python BFD over (n desc, doc_id asc)
        caps: list = []
        for _, n in sorted(items, key=lambda x: (-x[1], x[0])):
            fits = [c for c in caps if c >= n]
            if not fits:
                caps.append(B - n)
            else:
                caps[caps.index(min(fits))] -= n
        # python next-fit over doc_id order
        bins, rem = 0, 0
        for _, n in items:
            if n <= rem:
                rem -= n
            else:
                bins, rem = bins + 1, B - n
        r = rows[src]
        total = sum(n for _, n in items)
        assert r["bfd_bins"] == len(caps)
        assert r["nf_bins"] == bins
        assert r["n_tokens"] == total
        assert r["lb_bins"] == (total + B - 1) // B
        assert r["lb_bins"] <= r["bfd_bins"] <= r["nf_bins"]
        assert r["bfd_waste_permille"] <= r["nf_waste_permille"]
        assert (
            r["bfd_waste_permille"]
            == 1000 * (len(caps) * B - total) // (len(caps) * B)
        )
