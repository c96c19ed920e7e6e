"""Driver-collect guards: model-sized relations (transition matrices,
centroid tables, candidate frontiers) legitimately round-trip through
the driver — but "model-sized by the data model" is an assumption, not
an invariant the engine enforces.  ``bounded_collect`` makes every such
collect fail LOUDLY at ``cap`` instead of OOMing the driver on a
pathological input (VERDICT r12 #3): the ``limit(cap + 1)`` bounds what
the executors ship regardless of the true cardinality, and the
over-cap check raises before anything downstream trusts the rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Row


def bounded_collect(df: DataFrame, cap: int, what: str) -> list[Row]:
    """Collect ``df``, asserting it holds at most ``cap`` rows.

    Ships at most ``cap + 1`` rows to the driver (the probe row only
    proves the violation), so driver memory is bounded by ``cap`` even
    when the input is pathologically large.
    """
    rows = df.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"{what}: collect exceeded the model-size bound ({cap} rows); "
            "refusing a driver-unbounded collect"
        )
    return rows
