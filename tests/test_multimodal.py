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
    """Only VIDEO decode remains stubbed (png/jpeg/wav are real)."""
    from ecostream.multimodal import decode_media, docs_as_media
    from ecostream.schema import load_table

    media = docs_as_media(load_table(spark, SF_SMOKE, "documents"))
    with pytest.raises(NotImplementedError):
        decode_media(media, codec="h264")


def test_metadata_query_prunes_binary(spark):
    """Metadata-only access must not scan the binary column (column
    pruning through the struct)."""
    from ecostream.multimodal import docs_as_media
    from ecostream.schema import load_table

    media = docs_as_media(load_table(spark, SF_SMOKE, "documents"))
    meta_only = media.select("media_id", "meta.byte_len")
    plan = meta_only._jdf.queryExecution().executedPlan().toString()
    assert "content" not in plan


def test_png_roundtrip_all_channels_and_filters():
    """decode(encode(x)) == x for gray/RGB/RGBA across sizes that hit
    every scanline filter (encoder cycles row % 5) and the width-1
    stride-smaller-than-channels edge."""
    import hashlib

    from ecostream.png import decode_png, encode_png

    for channels in (1, 3, 4):
        for w, h in [(1, 1), (1, 7), (5, 6), (13, 11), (32, 3)]:
            n = w * h * channels
            dig = hashlib.md5(f"{w}x{h}x{channels}".encode()).digest()
            pixels = (dig * (n // 16 + 1))[:n]
            blob = encode_png(w, h, pixels, channels)
            dw, dh, dc, out = decode_png(blob)
            assert (dw, dh, dc) == (w, h, channels)
            assert out == pixels, (w, h, channels)


def test_png_decoder_rejects_corruption():
    import pytest as _pytest

    from ecostream.png import decode_png, encode_png

    blob = bytearray(encode_png(4, 3, bytes(range(36)), 3))
    with _pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a" + bytes(blob))
    blob[20] ^= 0xFF  # flip a byte inside IHDR -> CRC mismatch
    with _pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(blob))


def test_decode_media_png_matches_local_decode(spark):
    """The mapInPandas png stage must agree with a driver-local decode
    of the same synthesized payloads."""
    import hashlib

    from ecostream.multimodal import decode_media, synth_png_media

    ids = spark.createDataFrame([(i,) for i in range(30)], "media_id long")
    rows = {
        r["media_id"]: r
        for r in decode_media(synth_png_media(ids), codec="png").collect()
    }
    chan_of = {0: 1, 1: 3, 2: 4}
    for mid in range(30):
        w, h, c = mid % 13 + 4, mid % 11 + 3, chan_of[mid % 3]
        dig = hashlib.md5(str(mid).encode()).digest()
        n = w * h * c
        pixels = (dig * (n // 16 + 1))[:n]
        r = rows[mid]
        assert (r["width"], r["height"]) == (w, h)
        assert r["pix_sum"] == sum(pixels)
        assert r["n_frames"] == 1


def test_decode_png_bad_input_raises_valueerror():
    """The documented error contract: truncated or corrupt payloads
    raise ValueError (not struct.error / zlib.error), so a decode stage
    can quarantine bad media rows with one except clause."""
    import pytest
    import zlib

    from ecostream.png import _SIG, decode_png, encode_png

    good = encode_png(4, 3, bytes(range(36)), 3)
    for bad in (
        _SIG + b"\x00\x00",                     # truncated chunk header
        good[: len(good) - 6],                  # truncated mid-chunk
        _SIG + good[8:20] + b"junk" + good[20:],  # corrupt CRC region
    ):
        with pytest.raises(ValueError):
            decode_png(bad)
    # corrupt IDAT: flip a byte inside the compressed stream, fix CRC
    import struct

    pos = 8
    out = bytearray(good)
    while pos < len(out):
        (length,) = struct.unpack(">I", out[pos : pos + 4])
        tag = bytes(out[pos + 4 : pos + 8])
        if tag == b"IDAT":
            out[pos + 8 + length // 2] ^= 0xFF
            body = bytes(out[pos + 8 : pos + 8 + length])
            out[pos + 8 + length : pos + 12 + length] = struct.pack(
                ">I", zlib.crc32(tag + body) & 0xFFFFFFFF
            )
            break
        pos += 12 + length
    with pytest.raises(ValueError):
        decode_png(bytes(out))


# --- JPEG codec (ecostream/jpeg.py) ------------------------------------------


def test_jpeg_roundtrip_error_bound_and_dims():
    """Encode→decode over the mm6 fixture family: dims/channels exact,
    max per-sample error ≤ 3 at all-ones quant tables (the measured
    worst case over the full id range; mm6's oracle boolean allows 4
    for libm margin)."""
    from ecostream.jpeg import decode_jpeg, encode_jpeg
    from ecostream.multimodal import _jpeg_pixels

    worst = 0
    for mid in range(0, 200):
        w, h, c, pix = _jpeg_pixels(mid)
        dw, dh, dc, got = decode_jpeg(
            encode_jpeg(w, h, pix, channels=c, quality=None)
        )
        assert (dw, dh, dc) == (w, h, c)
        worst = max(worst, max(abs(a - b) for a, b in zip(pix, got)))
    assert worst <= 3, worst


def test_jpeg_container_structure():
    """The emitted bytes are a structurally valid JFIF baseline file:
    SOI/APP0-JFIF/DQT/SOF0/DHT/SOS/EOI all present, entropy data
    byte-stuffed (no bare 0xFF followed by a non-marker byte)."""
    from ecostream.jpeg import encode_jpeg

    blob = encode_jpeg(
        16, 12,
        bytes((i * 7) % 256 for i in range(16 * 12 * 3)),
        channels=3, quality=75,
    )
    assert blob[:2] == b"\xff\xd8" and blob[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in blob[:32]
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xc4", b"\xff\xda"):
        assert marker in blob, marker


def test_jpeg_lossy_quality_mode_decodes_smooth_image():
    """IJG-scaled Annex K tables at quality 50 must still round-trip a
    smooth gradient within a loose lossy bound — the honest behavior
    of a real lossy codec, not a disguised lossless one."""
    import math

    from ecostream.jpeg import decode_jpeg, encode_jpeg

    w, h = 24, 17
    smooth = bytes(
        int(127 + 100 * math.sin(x / 5.0) * math.cos(y / 4.0))
        for y in range(h)
        for x in range(w)
    )
    dw, dh, dc, got = decode_jpeg(encode_jpeg(w, h, smooth, 1, quality=50))
    assert (dw, dh, dc) == (w, h, 1)
    err = max(abs(a - b) for a, b in zip(smooth, got))
    assert err <= 32, err
    # and on an image big enough to amortize the fixed table segments
    # (~350 bytes of APP0+DQT+DHT) the lossy file genuinely compresses
    big_w = big_h = 64
    big = bytes(
        int(127 + 100 * math.sin(x / 5.0) * math.cos(y / 4.0))
        for y in range(big_h)
        for x in range(big_w)
    )
    assert len(encode_jpeg(big_w, big_h, big, 1, quality=50)) < big_w * big_h


def test_jpeg_decoder_rejects_corruption():
    from ecostream.jpeg import decode_jpeg, encode_jpeg

    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")
    blob = bytearray(encode_jpeg(8, 8, bytes(64), 1))
    blob[3] = 0xC2  # SOF0 -> progressive SOF2 marker id byte
    # flipping a marker to out-of-scope or corrupting structure raises
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob.replace(b"\xff\xc0", b"\xff\xc2")))


def test_decode_media_jpeg_spark_stage(spark):
    """The Spark jpeg decode stage returns the same dims the local
    codec produces, end to end through Arrow batches."""
    from ecostream.multimodal import decode_media, synth_jpeg_media
    from ecostream.schema import load_table

    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .where(F.col("doc_id") < 40)
        .select(F.col("doc_id").alias("media_id"))
    )
    rows = decode_media(synth_jpeg_media(docs), codec="jpeg").collect()
    assert len(rows) == 40
    for r in rows:
        mid = r["media_id"]
        assert r["width"] == mid % 13 + 4
        assert r["height"] == mid % 11 + 3
        assert r["n_frames"] == 1
        assert 0.0 <= r["feature"][0] <= 1.0


def test_avi_container_roundtrip_and_structure():
    """Pure-local AVI checks: byte-exact frame payload recovery,
    header fields, even-padding handling (odd-length frames), and
    loud failure on corrupt input."""
    import struct

    import pytest

    from ecostream.avi import decode_avi_mjpeg, encode_avi_mjpeg

    frames = [b"frame-one-jfif!", b"f2", b"odd"]  # odd lengths force pads
    data = encode_avi_mjpeg(frames, 12, 7, fps=10)
    w, h, fps, got = decode_avi_mjpeg(data)
    assert (w, h, fps) == (12, 7, 10)
    assert got == frames

    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFX" + data[4:])
    # corrupt idx1 count (one extra entry) must raise, not reorder
    bad = bytearray(data)
    i = bad.rfind(b"idx1")
    (sz,) = struct.unpack("<I", bad[i + 4 : i + 8])
    bad[i + 4 : i + 8] = struct.pack("<I", sz + 16)
    bad.extend(b"\x00" * 16)
    bad[4:8] = struct.pack("<I", len(bad) - 8)
    with pytest.raises(ValueError):
        decode_avi_mjpeg(bytes(bad))


def test_video_roundtrip_error_bound_local():
    """Per-frame JPEG loss through the AVI path stays within the mm6
    bound (measured <= 2 on the id range; assert the documented <= 4)."""
    from ecostream.avi import decode_avi_mjpeg, encode_avi_mjpeg
    from ecostream.jpeg import decode_jpeg, encode_jpeg
    from ecostream.multimodal import _video_frame_pixels, _video_geometry

    for mid in (0, 1, 7, 12, 255, 299):
        w, h, c, n = _video_geometry(mid)
        enc = [
            encode_jpeg(
                w, h, _video_frame_pixels(mid, k), channels=c, quality=None
            )
            for k in range(n)
        ]
        dw, dh, fps, dec = decode_avi_mjpeg(encode_avi_mjpeg(enc, w, h, 10))
        assert (dw, dh, fps, len(dec)) == (w, h, 10, n)
        for k, fb in enumerate(dec):
            jw, jh, jc, got = decode_jpeg(fb)
            assert (jw, jh, jc) == (w, h, c)
            exp = _video_frame_pixels(mid, k)
            assert max(abs(a - g) for a, g in zip(exp, got)) <= 2


def test_mm7_video_roundtrip_spark(spark):
    """End-to-end Spark stage: every video within bound, container
    fields exact."""
    from ecostream.queries.registry import QUERIES

    rows = QUERIES["mm7_video_roundtrip"](spark, SF_SMOKE).collect()
    assert len(rows) == 300
    for r in rows:
        mid = r["media_id"]
        assert r["width"] == mid % 13 + 4
        assert r["height"] == mid % 11 + 3
        assert r["n_frames"] == mid % 4 + 2
        assert r["fps"] == 10
        assert r["within_bound"]


def test_avi_roundtrip_property():
    """Property: ANY list of frame payloads round-trips byte-exactly
    through the container, whatever the lengths (odd sizes exercise
    RIFF even-padding; empty frames are legal 0-byte chunks)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from ecostream.avi import decode_avi_mjpeg, encode_avi_mjpeg

    @settings(max_examples=50, deadline=None)
    @given(
        frames=st.lists(st.binary(min_size=0, max_size=64), max_size=12),
        w=st.integers(min_value=1, max_value=4096),
        h=st.integers(min_value=1, max_value=4096),
        fps=st.integers(min_value=1, max_value=120),
    )
    def check(frames, w, h, fps):
        dw, dh, dfps, got = decode_avi_mjpeg(
            encode_avi_mjpeg(frames, w, h, fps=fps)
        )
        assert (dw, dh, dfps) == (w, h, fps)
        assert got == frames

    check()


def test_mm9_ahash_brightness_invariance(spark):
    """The planted brightness variants (media_id % 3) must hash
    IDENTICALLY (the perceptual property) while their PNG payloads
    differ byte-for-byte (what byte-level dedup sees)."""
    from ecostream.multimodal import ahash_media, synth_png_group_media

    ids = spark.range(0, 192).select(F.col("id").alias("media_id"))
    media = synth_png_group_media(ids)
    hashed = ahash_media(media).withColumn(
        "grp", F.col("media_id") % 64
    )
    # Within a group: one distinct aHash across all 3 brightness deltas.
    per_group = hashed.groupBy("grp").agg(
        F.count_distinct("ahash").alias("nh"),
        F.count("*").alias("n"),
    )
    rows = per_group.collect()
    assert all(r["nh"] == 1 for r in rows)
    assert all(r["n"] == 3 for r in rows)
    # The payloads themselves are NOT byte-identical within a group
    # (delta really changes the bytes; aHash sees through it).
    payloads = media.withColumn("grp", F.col("media_id") % 64).groupBy(
        "grp"
    ).agg(F.count_distinct(F.md5(F.col("content"))).alias("np"))
    assert all(r["np"] == 3 for r in payloads.collect())


def test_mm9_ahash_distinct_across_groups(spark):
    """Different content groups should (for this id range) produce
    different hashes — the hash carries 64 bits of content."""
    from ecostream.multimodal import ahash_media, synth_png_group_media

    ids = spark.range(0, 64).select(F.col("id").alias("media_id"))
    hashed = ahash_media(synth_png_group_media(ids))
    n = hashed.select("ahash").distinct().count()
    assert n == 64
