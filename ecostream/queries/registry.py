"""Declared-query registry.

Every operator from SURVEY.md §2 that we implement is declared here as a
named query: a callable ``(spark, sf_dir) -> DataFrame`` plus (when the
semantics are deterministic and SQL-expressible) an ANSI-SQL oracle that
DuckDB runs on the same parquet for the driver's correctness gate.

Determinism discipline (SURVEY §5/§7.3):
- alias every computed column identically in Spark and oracle SQL;
- exact integer arithmetic wherever possible; money/measure sums go
  through DECIMAL casts so partial-aggregation order cannot perturb the
  result; floats are rounded AFTER exact arithmetic;
- explicit ORDER BY + unique tiebreaker before any LIMIT;
- seeded/nondeterministic ops are declared WITHOUT an oracle (the
  driver then performs a rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a declared query, optionally with its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
