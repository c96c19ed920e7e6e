"""Declared generator queries (SURVEY §2.1 S1)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..generator import GENERATOR_ORACLE_SQL, insect_events_flat
from .registry import query


@query("s1_seeded_generator", oracle=GENERATOR_ORACLE_SQL)
def s1_seeded_generator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic synthetic insect-event generator: every field a
    pure function of md5(row index), so the generator itself is
    oracle-checkable — reproducibility the reference's ``random``-based
    producer lacks.  Ignores sf_dir (generates 1000 rows like the
    sf0.001 events table)."""
    return insect_events_flat(spark, n=1000)
