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


@query(
    "mm2_decode_frame_sample",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               octet_length(encode(text)) AS bl,
               ascii(substring(text, 1, 1)) AS b0
        FROM documents
    )
    SELECT media_id,
           CAST(bl % 640 + 1 AS INT) AS width,
           CAST(bl % 480 + 1 AS INT) AS height,
           CAST(bl % 30 + 1 AS INT) AS n_frames,
           CAST((bl % 30) // 5 + 1 AS BIGINT) AS n_sampled_frames,
           CAST(b0 AS BIGINT) AS f0_byte
    FROM m
    """,
)
def mm2_decode_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full multimodal pipeline, oracle-checked: binary payload →
    Arrow-batched ``mapInPandas`` decode (the stub codec derives
    deterministic dims/features from the bytes) → expression-level
    frame sampling (every 5th frame) → per-media rollup.  The decoded
    feature's first slot is folded back to its source byte
    (``round(f0·255)``) so the check is integer-exact through the
    float32 Arrow round-trip.  Map-only except the final tiny
    aggregate.  (The REAL image decode path is mm4_png_roundtrip —
    pure-stdlib PNG; codecs that genuinely need external libraries,
    jpeg/audio/video, still raise NotImplementedError.)"""
    from ..multimodal import decode_media, frame_sample

    docs = load_table(spark, sf_dir, "documents")
    decoded = decode_media(docs_as_media(docs), codec="fake")
    sampled = frame_sample(decoded, every_n=5).groupBy("media_id").agg(
        F.count("*").alias("n_sampled_frames")
    )
    return (
        decoded.join(sampled, "media_id")
        .select(
            "media_id",
            "width",
            "height",
            "n_frames",
            "n_sampled_frames",
            F.round(F.element_at("feature", 1) * 255)
            .cast("long")
            .alias("f0_byte"),
        )
    )


@query(
    "mm3_resize_dims",
    oracle="""
    WITH m AS (
        SELECT doc_id AS media_id,
               octet_length(encode(text)) AS bl
        FROM documents
    ),
    d AS (
        SELECT media_id,
               bl % 640 + 1 AS w,
               bl % 480 + 1 AS h
        FROM m
    )
    SELECT media_id,
           CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           CAST(CASE WHEN w * 240 <= h * 320
                     THEN greatest(1, w * least(h, 240) // h)
                     ELSE least(w, 320) END AS INT) AS new_w,
           CAST(CASE WHEN w * 240 <= h * 320
                     THEN least(h, 240)
                     ELSE greatest(1, h * least(w, 320) // w) END AS INT) AS new_h,
           CAST(greatest(1, (CASE WHEN w * 240 <= h * 320
                     THEN greatest(1, w * least(h, 240) // h)
                     ELSE least(w, 320) END)
                * (CASE WHEN w * 240 <= h * 320
                     THEN least(h, 240)
                     ELSE greatest(1, h * least(w, 320) // w) END) // 256)
               AS BIGINT) AS thumb_len
    FROM d
    """,
)
def mm3_resize_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage end-to-end: fake-decode dims from the payload, then
    the aspect-preserving fit-to-(320,240) in mapInPandas
    (multimodal.resize_media).  The oracle re-derives the geometry in
    pure integer SQL — proving the Arrow batch plumbing computes
    exactly the declared transform; the pixel resample inside is the
    stubbed codec part."""
    from ..multimodal import decode_media, resize_media

    docs = load_table(spark, sf_dir, "documents")
    media = docs_as_media(docs)
    decoded = decode_media(media).select("media_id", "width", "height")
    with_content = decoded.join(
        media.select("media_id", "content"), "media_id"
    )
    resized = resize_media(with_content)
    return resized.select(
        "media_id",
        "width",
        "height",
        "new_w",
        "new_h",
        F.octet_length("thumb").cast("long").alias("thumb_len"),
    )


def _md5_byte(j: int) -> str:
    """SQL for byte j (0-based) of md5(doc_id-as-string) — the portable
    hex→int device (two hex chars per byte)."""
    return (
        f"CAST(CAST(('0x' || substring(h, {2 * j + 1}, 2)) AS UBIGINT) AS BIGINT)"
    )


_MM4_SUM16 = " + ".join(_md5_byte(j) for j in range(16))
_MM4_PREFIX = " + ".join(
    f"(CASE WHEN {j} < rem THEN {_md5_byte(j)} ELSE 0 END)" for j in range(16)
)


@query(
    "mm4_png_roundtrip",
    oracle=f"""
    WITH m AS (
        SELECT doc_id AS media_id,
               md5(CAST(doc_id AS VARCHAR)) AS h,
               doc_id % 13 + 4 AS w,
               doc_id % 11 + 3 AS ht,
               CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS c
        FROM documents
    ),
    r AS (
        SELECT media_id, h, w, ht,
               (w * ht * c) // 16 AS cycles,
               (w * ht * c) % 16 AS rem
        FROM m
    )
    SELECT media_id,
           CAST(w AS INT) AS width,
           CAST(ht AS INT) AS height,
           {_md5_byte(0)} AS f0_byte,
           CAST(cycles * ({_MM4_SUM16}) + {_MM4_PREFIX} AS BIGINT) AS pix_sum
    FROM r
    """,
)
def mm4_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL codec path, oracle-checked end to end: deterministic PNGs
    (md5-cycled pixels, per-row filter cycling through all five PNG
    filters, gray/RGB/RGBA by id) are ENCODED in one Arrow stage and
    DECODED by the pure-stdlib zlib codec (ecostream/png.py) in
    another.  The oracle predicts the decoded dims, first pixel byte,
    and whole-buffer checksum purely from doc_id arithmetic — if the
    encoder or any unfilter path is wrong, the hash fails.  Replaces
    the former NotImplementedError stub for image decode; both stages
    are map-only (no shuffle), so the pipeline scales with partitions."""
    from ..multimodal import decode_media, synth_png_media

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    decoded = decode_media(synth_png_media(docs), codec="png")
    return decoded.select(
        "media_id",
        "width",
        "height",
        F.round(F.element_at("feature", 1) * 255).cast("long").alias("f0_byte"),
        "pix_sum",
    )


# --- MM5: REAL WAV audio round-trip ------------------------------------------


@query(
    "mm5_wav_roundtrip",
    oracle="""
    WITH r AS (
        SELECT doc_id AS media_id, doc_id % 500 + 100 AS n
        FROM documents
    ),
    ex AS (
        SELECT media_id, n, UNNEST(generate_series(0, n - 1)) AS i
        FROM r
    )
    SELECT media_id,
           CAST(MIN(n) AS INTEGER) AS n_samples,
           CAST(8000 AS INTEGER) AS sample_rate,
           CAST(MIN(n) // 8 AS BIGINT) AS duration_ms,
           CAST(SUM(((media_id * 31 + i * 17) % 4096) - 2048) AS BIGINT)
               AS sample_sum
    FROM ex GROUP BY media_id
    """,
)
def mm5_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio codec path, oracle-checked end to end: deterministic
    mono 16-bit/8 kHz PCM (pure id arithmetic) is ENCODED into RIFF/WAV
    containers by the stdlib ``wave`` module in one Arrow stage and
    DECODED back in another (explicit little-endian unpack).  The
    oracle predicts frame count, rate, duration, and the exact integer
    sample sum from doc_id arithmetic alone — a wrong header field,
    sample width, or byte order fails the hash.  The audio sibling of
    mm4's PNG round-trip: both stages map-only, no shuffle, binary
    payloads never leave the partition."""
    from ..multimodal import decode_wav, synth_wav_media

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    decoded = decode_wav(synth_wav_media(docs))
    return decoded.select(
        "media_id",
        "n_samples",
        "sample_rate",
        F.expr("CAST(n_samples div 8 AS BIGINT)").alias("duration_ms"),
        "sample_sum",
    )


# --- MM6: REAL JPEG (lossy) round-trip ---------------------------------------


@query(
    "mm6_jpeg_roundtrip",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(doc_id % 13 + 4 AS INT) AS width,
           CAST(doc_id % 11 + 3 AS INT) AS height,
           CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 3 END AS INT)
               AS channels,
           true AS within_bound
    FROM documents WHERE doc_id < 500
    ORDER BY media_id
    """,
)
def mm6_jpeg_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL lossy codec path, oracle-checked: deterministic images
    (md5-cycled pixels, gray/RGB by id parity) are ENCODED as baseline
    JFIF by the from-scratch pure-Python JPEG codec (ecostream/jpeg.py
    — DCT, quantization, zigzag, canonical Huffman, byte stuffing) in
    one Arrow stage and DECODED + verified in another.  JPEG being
    lossy, the oracle pins what IS exactly predictable — dimensions
    and channel count from id arithmetic — plus the round-trip ERROR
    BOUND as a boolean (all-ones quant tables: measured max |err| = 3
    across the id range, asserted ≤ 4 here for libm-rounding margin;
    the exact ≤ 3 figure is pinned by tests/test_multimodal.py).  A
    structural failure (bad marker, wrong Huffman table, mis-parsed
    SOF) surfaces as wrong dims or err = -1 and fails the hash.
    Replaces the final image branch of the former decode stub; both
    stages map-only, payloads never leave the partition.  Bounded at
    500 docs (the d3b device) so evaluation cost is sf-independent."""
    from ..multimodal import jpeg_roundtrip_check, synth_jpeg_media

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 500)
        .select(F.col("doc_id").alias("media_id"))
    )
    checked = jpeg_roundtrip_check(synth_jpeg_media(docs))
    return checked.select(
        "media_id",
        "width",
        "height",
        "channels",
        ((F.col("max_err") >= 0) & (F.col("max_err") <= 4)).alias(
            "within_bound"
        ),
    ).orderBy("media_id")


# --- MM7: REAL MJPEG AVI video round-trip ------------------------------------


@query(
    "mm7_video_roundtrip",
    oracle="""
    SELECT doc_id AS media_id,
           CAST(doc_id % 13 + 4 AS INT) AS width,
           CAST(doc_id % 11 + 3 AS INT) AS height,
           CAST(doc_id % 4 + 2 AS INT) AS n_frames,
           CAST(10 AS INT) AS fps,
           true AS within_bound
    FROM documents WHERE doc_id < 300
    ORDER BY media_id
    """,
)
def mm7_video_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video path, oracle-checked — the last branch of the
    round-1 decode stub closed: deterministic per-frame RGB images are
    encoded as baseline JFIF by the from-scratch JPEG codec, wrapped
    in a from-scratch RIFF/AVI MJPEG container (ecostream/avi.py:
    hdrl/avih/strh/strf headers, movi 00dc chunks, idx1 index), then
    DECODED — container walk plus a real JPEG decode of EVERY frame —
    and verified sample-by-sample in a second Arrow stage.  The oracle
    pins what is exactly predictable from id arithmetic (dims, frame
    count, fps) plus the lossy round-trip error bound as a boolean
    (measured max |err| 2 across the id range, asserted <= 4 for
    libm-rounding margin); a structural failure — bad RIFF tree,
    idx1/movi count mismatch, frame-dim drift — surfaces as err = -1
    or wrong counts and fails the hash.  Only INTER-frame codecs
    (h264...) remain gated.  Both stages map-only, payloads never
    leave the partition; bounded at 300 docs (the d3b device) so
    evaluation cost is sf-independent."""
    from ..multimodal import avi_roundtrip_check, synth_avi_media

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 300)
        .select(F.col("doc_id").alias("media_id"))
    )
    checked = avi_roundtrip_check(synth_avi_media(docs))
    return checked.select(
        "media_id",
        "width",
        "height",
        "n_frames",
        "fps",
        ((F.col("max_err") >= 0) & (F.col("max_err") <= 4)).alias(
            "within_bound"
        ),
    ).orderBy("media_id")


# --- MM8: audio frame-feature extraction (round 6) ---------------------------


@query(
    "mm8_audio_frame_features",
    oracle="""
    WITH r AS (
        SELECT doc_id AS media_id, doc_id % 500 + 100 AS n
        FROM documents WHERE doc_id < 300
    ),
    ex AS (
        SELECT media_id, UNNEST(generate_series(0, n - 1)) AS i FROM r
    ),
    s AS (
        SELECT media_id, i, CAST(i // 64 AS BIGINT) AS frame,
               ((media_id * 31 + i * 17) % 4096) - 2048 AS x
        FROM ex
    ),
    zc AS (
        SELECT media_id, frame, x,
               lag(x) OVER (PARTITION BY media_id, frame ORDER BY i) AS px
        FROM s
    )
    SELECT media_id, frame,
           CAST(count(*) AS BIGINT) AS n_in_frame,
           CAST(SUM(ABS(x)) AS BIGINT) AS energy,
           CAST(SUM(CASE WHEN px IS NOT NULL AND px * x < 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
    FROM zc GROUP BY media_id, frame
    ORDER BY media_id, frame
    """,
)
def mm8_audio_frame_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-level audio FEATURES from real WAV payloads — the stage a
    multimodal training pipeline runs between raw bytes and model
    input: encode deterministic PCM into RIFF/WAV containers (the mm5
    synth stage), then DECODE and window into 64-sample frames with
    integer L1 energy and zero-crossing counts per frame
    (ecostream/multimodal.py wav_frame_features — an Arrow mapInPandas
    fan-out of ceil(n/64) rows per media, payloads never leaving the
    partition).  The oracle predicts every frame's sample membership,
    energy, and crossing count from id arithmetic alone, so a wrong
    frame boundary, endianness slip, or off-by-one in the windowing
    fails the per-frame hash.  Bounded at 300 media (the mm7 device)
    so oracle cost is sf-independent; the mechanism is cap-free.
    Reference analog: none — multimodal-pipeline extension (SURVEY
    §2.13)."""
    from ..multimodal import synth_wav_media, wav_frame_features

    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("doc_id") < 300)
        .select(F.col("doc_id").alias("media_id"))
    )
    return wav_frame_features(synth_wav_media(docs)).orderBy(
        "media_id", "frame"
    )


# --- MM9: perceptual-hash (aHash) image near-dup -----------------------------

_MM9_BASES = ", ".join(f"({_md5_byte(j)}) // 2 + delta" for j in range(16))


@query(
    "mm9_ahash_near_dup",
    oracle=f"""
    WITH m AS (
        SELECT doc_id AS media_id,
               md5(CAST(doc_id % 64 AS VARCHAR)) AS h,
               (doc_id % 64) % 13 + 4 AS w,
               (doc_id % 64) % 11 + 3 AS ht,
               CASE CAST((doc_id % 64) % 3 AS INT)
                    WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS c,
               doc_id % 3 AS delta
        FROM documents
    ),
    b AS (
        SELECT media_id, w, ht, w * ht * c AS npix,
               list_value({_MM9_BASES}) AS bases
        FROM m
    ),
    s AS (
        SELECT media_id, w, ht, npix, bases,
               (npix // 16) * list_sum(list_transform(range(0, 16),
                    i -> bases[i + 1]))
               + COALESCE(list_sum(list_transform(range(0, npix % 16),
                    i -> bases[i + 1])), 0) AS pixsum
        FROM b
    ),
    sel AS (
        SELECT media_id, w, ht,
               array_to_string(list_transform(range(0, 64),
                    j -> CASE WHEN bases[((j % npix) % 16) + 1] * npix
                              > pixsum THEN '1' ELSE '0' END), '') AS ahash
        FROM s
    )
    SELECT media_id, CAST(w AS INT) AS width, CAST(ht AS INT) AS height,
           ahash,
           CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_dups,
           media_id = min(media_id) OVER (PARTITION BY ahash) AS keep
    FROM sel ORDER BY media_id
    """,
)
def mm9_ahash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image dedup over the REAL codec path: planted
    image variants (same content, three brightness offsets per group)
    are PNG-ENCODED, PNG-DECODED (ecostream/png.py, all five unfilter
    paths), and average-hashed — 64 bits of strictly-above-mean pixel
    tests in exact integer cross-multiplied arithmetic (pix·npix >
    sum), so a constant brightness shift moves every pixel and the
    mean together and the aHash is provably invariant while any
    byte-level hash (d1/t8) sees three distinct payloads.  Hash-equal
    groups then collapse with the usual keep-min rule.  The oracle
    predicts every aHash bit purely from doc_id arithmetic — if the
    encoder, any unfilter path, or the hash disagrees on a single
    pixel, 64 bits of hash and the group structure shatter.  Plan:
    two Arrow map-only stages, one window shuffle on the 64-bit hash;
    at 100 TB the hash groupBy replaces pairwise image comparison
    exactly the way SimHash banding replaces pairwise text diffs."""
    from ..multimodal import ahash_media, synth_png_group_media

    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id")
    )
    hashed = ahash_media(synth_png_group_media(docs))
    from pyspark.sql import Window as W

    wh = W.partitionBy("ahash")
    return (
        hashed.select(
            "media_id",
            "width",
            "height",
            "ahash",
            F.count("*").over(wh).cast("long").alias("n_dups"),
            (F.col("media_id") == F.min("media_id").over(wh)).alias("keep"),
        )
        .orderBy("media_id")
    )
