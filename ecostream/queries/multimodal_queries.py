"""Declared multimodal queries: binary-column metadata extraction
(oracle-checkable — the decode stub itself is exercised in tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..multimodal import docs_as_media
from ..schema import load_table
from .registry import query


@query(
    "mm1_binary_metadata",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           hex(encode(substring(text, 1, 4))) AS header_hex,
           md5(text) AS content_hash,
           source
    FROM documents
    """,
)
def mm1_binary_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata over an opaque binary media column: byte length, header
    bytes (magic-number sniffing shape), content hash.  All built-ins —
    the binary column itself is pruned when only metadata is queried."""
    docs = load_table(spark, sf_dir, "documents")
    media = docs_as_media(docs).join(
        docs.select(F.col("doc_id").alias("media_id"), "text"), "media_id"
    )
    return media.select(
        "media_id",
        F.col("meta.byte_len").alias("byte_len"),
        F.hex(F.encode(F.substring("text", 1, 4), "UTF-8")).alias("header_hex"),
        F.md5("text").alias("content_hash"),
        F.col("meta.source").alias("source"),
    )
