"""Explicit key-salting for skewed joins and aggregations.

AQE's skew-join split (proved working in tests/test_skew.py) is the
batch answer; salting is the answer where AQE cannot reach — streaming
joins, stateful aggregations keyed on a hot key, or any engine without
runtime re-planning.  The pattern: widen the hot key with a salt on the
big side (splitting each key's rows across ``n_salt`` reducers) and
replicate the small side once per salt value, so the join result is
unchanged while no single task owns a whole hot key.

Cost model: the small side is duplicated ``n_salt`` × (explode before
shuffle) — choose n_salt ≈ (rows of hottest key) / (rows a task should
own); salting a non-skewed join only adds that replication cost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_src: Column,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` to ``small`` on ``key`` with an ``n_salt``-way salt.

    ``salt_src``: any big-side column expression that spreads rows of
    the same key (a unique id is ideal); the salt is a deterministic
    hash of it, so results are reproducible.  Output columns = the
    plain join's (salt columns are dropped).

    ``how`` is restricted to the join types the salting construction
    preserves: unmatched SMALL-side rows would be replicated once per
    salt value under right/full outer, so those are rejected.
    """
    safe = {"inner", "left", "left_outer", "leftouter", "semi",
            "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in safe:
        raise ValueError(
            f"salted_join: how={how!r} not supported — the replicated "
            "small side breaks right/full outer semantics; use one of "
            f"{sorted(safe)}"
        )
    bs = big.withColumn(
        "_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salt)).cast("int")
    )
    ss = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    out = bs.join(ss, [key, "_salt"], how)
    return out.drop("_salt")
