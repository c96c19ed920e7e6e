"""Multimodal plumbing tests: binary columns, Arrow-batched decode
stub, frame sampling — the Spark-side contract is real even though the
codec is stubbed (no media libs in the runtime)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_media_decode_stub_roundtrip(spark):
    from ecostream.multimodal import decode_media, docs_as_media, frame_sample
    from ecostream.schema import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(50)
    media = docs_as_media(docs)
    assert dict(media.dtypes)["content"] == "binary"

    decoded = decode_media(media, codec="fake")
    rows = decoded.collect()
    assert len(rows) == 50
    for r in rows[:5]:
        assert 1 <= r["width"] <= 640
        assert len(r["feature"]) == 8
        assert all(0.0 <= x <= 1.0 for x in r["feature"])

    frames = frame_sample(decoded, every_n=5)
    fcounts = frames.groupBy("media_id").count().collect()
    assert all(r["count"] >= 1 for r in fcounts)

    # deterministic across runs (stable fake decode)
    again = decode_media(media, codec="fake").collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_real_codec_raises(spark):
    from ecostream.multimodal import decode_media, docs_as_media
    from ecostream.schema import load_table

    media = docs_as_media(load_table(spark, SF_SMOKE, "documents"))
    with pytest.raises(NotImplementedError):
        decode_media(media, codec="jpeg")


def test_metadata_query_prunes_binary(spark):
    """Metadata-only access must not scan the binary column (column
    pruning through the struct)."""
    from ecostream.multimodal import docs_as_media
    from ecostream.schema import load_table

    media = docs_as_media(load_table(spark, SF_SMOKE, "documents"))
    meta_only = media.select("media_id", "meta.byte_len")
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan
