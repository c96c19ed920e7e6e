"""Multimodal (image/audio/video) column plumbing.

Design: media is an opaque ``binary`` column plus a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages (the only sanctioned Python hot
path — decoding is genuinely not expressible in SQL expressions).

The container has no image/audio/video libraries, so the codecs are
implemented from scratch against the public specs: PNG (ecostream.png,
lossless, zlib), baseline JPEG (ecostream.jpeg, lossy, numpy DCT),
WAV (stdlib ``wave``), and MJPEG AVI video (ecostream.avi, RIFF
container + per-frame JPEG).  Only INTER-frame video codecs remain
gated (``decode_media`` raises NotImplementedError for codec names
like h264 — motion compensation is a codec project, not an analytics
engine's); a deterministic fake decoder is kept for the plumbing-only
metadata queries — the Spark-side contract (schemas, batch iteration,
partition parallelism) is real and tested end-to-end in all cases.

Scale notes: binary payloads ride in the same parquet row groups;
``spark.sql.files.maxPartitionBytes`` bounds scan partitions, and the
mapInPandas stages are map-only (no shuffle).  Metadata-only queries
never touch the binary column (column pruning).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("byte_len", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        # sum of all decoded 8-bit samples: a cheap whole-buffer
        # checksum the oracle can recompute without the codec
        T.StructField("pix_sum", T.LongType(), True),
    ]
)


def docs_as_media(docs: DataFrame) -> DataFrame:
    """Stand-in media table: document text bytes as the opaque binary
    payload (the container ships no real media fixtures)."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.octet_length(F.encode("text", "UTF-8")).cast("long").alias("byte_len"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_media(df: DataFrame, codec: str = "fake") -> DataFrame:
    """Decode stage as mapInPandas: Arrow batches in, decoded rows out.

    ``codec="png"`` decodes REAL PNG payloads with the pure-stdlib
    codec (ecostream.png — zlib inflate + unfilter, no third-party
    libraries): width/height from IHDR, feature = first 8 samples of
    the raw pixel buffer, ``pix_sum`` = sum of every 8-bit sample.

    ``codec="jpeg"`` decodes REAL baseline JPEG payloads with the
    pure-Python codec (ecostream.jpeg — markers, Huffman, zigzag,
    dequantize, numpy IDCT): width/height from SOF0, feature = first
    8 decoded samples, ``pix_sum`` = sum of every decoded 8-bit sample
    (JPEG being lossy, pix_sum is pinned by round-trip ERROR-BOUND
    checks — jpeg_roundtrip_check — rather than exact-sum oracles).

    ``codec="fake"`` derives deterministic pseudo-dimensions/features
    from the payload bytes (plumbing-only twin, kept for the
    metadata-shaped queries); video codecs (h264...) raise
    NotImplementedError until their libraries ship in the image.
    """
    if codec == "jpeg":

        def _decode_jpeg_batches(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            from .jpeg import decode_jpeg

            for pdf in batches:
                widths, heights, feats, sums = [], [], [], []
                for b in pdf["content"]:
                    w, h, ch, pix = decode_jpeg(bytes(b))
                    widths.append(w)
                    heights.append(h)
                    feats.append(
                        [pix[i] / 255.0 if i < len(pix) else 0.0 for i in range(8)]
                    )
                    sums.append(sum(pix))
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": pd.Series(widths, dtype="int32"),
                        "height": pd.Series(heights, dtype="int32"),
                        "n_frames": pd.Series([1] * len(widths), dtype="int32"),
                        "feature": feats,
                        "pix_sum": pd.Series(sums, dtype="int64"),
                    }
                )

        return df.mapInPandas(_decode_jpeg_batches, schema=DECODED_SCHEMA)

    if codec == "png":

        def _decode_batches(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            from .png import decode_png

            for pdf in batches:
                widths, heights, feats, sums = [], [], [], []
                for b in pdf["content"]:
                    w, h, ch, pix = decode_png(bytes(b))
                    widths.append(w)
                    heights.append(h)
                    feats.append(
                        [pix[i] / 255.0 if i < len(pix) else 0.0 for i in range(8)]
                    )
                    sums.append(sum(pix))
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": pd.Series(widths, dtype="int32"),
                        "height": pd.Series(heights, dtype="int32"),
                        "n_frames": pd.Series([1] * len(widths), dtype="int32"),
                        "feature": feats,
                        "pix_sum": pd.Series(sums, dtype="int64"),
                    }
                )

        return df.mapInPandas(_decode_batches, schema=DECODED_SCHEMA)

    if codec != "fake":
        raise NotImplementedError(
            f"codec {codec!r}: media libraries not present in this runtime; "
            "wire the real decoder into _decode_batches"
        )

    def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            byte_len = content.map(lambda b: len(b) if b is not None else 0)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": (byte_len % 640 + 1).astype("int32"),
                    "height": (byte_len % 480 + 1).astype("int32"),
                    "n_frames": (byte_len % 30 + 1).astype("int32"),
                    "feature": [
                        [float(b[i % max(len(b), 1)]) / 255.0 for i in range(8)]
                        if b is not None and len(b) > 0
                        else [0.0] * 8
                        for b in content
                    ],
                    "pix_sum": pd.Series(
                        [
                            sum(b) if b is not None else 0
                            for b in content
                        ],
                        dtype="int64",
                    ),
                }
            )
            yield out

    return df.mapInPandas(_decode_batches, schema=DECODED_SCHEMA)


def synth_png_media(df: DataFrame) -> DataFrame:
    """Deterministic REAL-PNG payloads derived from ``media_id`` alone:
    ``w = id%13+4``, ``h = id%11+3``, channels from ``id%3`` mapped to
    {gray, RGB, RGBA}, pixel bytes = the md5 digest of ``str(id)``
    cycled to fill the buffer.  Every quantity is pure arithmetic over
    the id, so a SQL oracle can predict the decoded dims and the
    whole-buffer pixel checksum WITHOUT running any codec — which is
    what pins the encoder→decoder round-trip end to end.  Map-only
    Arrow stage; the per-row filter cycling inside encode_png makes
    the decoder exercise all five unfilter paths."""

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from .png import encode_png

        chan_of = {0: 1, 1: 3, 2: 4}
        for pdf in batches:
            blobs = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w = mid % 13 + 4
                h = mid % 11 + 3
                c = chan_of[mid % 3]
                dig = hashlib.md5(str(mid).encode()).digest()
                npix = w * h * c
                pixels = (dig * (npix // 16 + 1))[:npix]
                blobs.append(encode_png(w, h, pixels, c))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "content": blobs}
            )

    return df.select("media_id").mapInPandas(_synth, schema=schema)


def frame_sample(df: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame-sampling contract: one row per kept frame index — pure
    expressions (sequence + explode), no Python."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("new_w", T.IntegerType(), True),
        T.StructField("new_h", T.IntegerType(), True),
        T.StructField("thumb", T.BinaryType(), True),
    ]
)


def resize_media(
    decoded_with_content: DataFrame, max_w: int = 320, max_h: int = 240
) -> DataFrame:
    """Aspect-preserving resize-to-fit as a mapInPandas stage.

    The geometry (integer-exact aspect-fit, so every engine agrees
    bit-for-bit) is real; the pixel resample is the stubbed codec part
    — the emitted ``thumb`` is a deterministic byte-truncation stand-in
    sized to the new dims.  Input needs (media_id, width, height,
    content).  Map-only: no shuffle, Arrow both directions, and the
    binary column never leaves the executor."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            # height-limited iff w*max_h <= h*max_w; all-integer math
            height_limited = w * max_h <= h * max_w
            new_h_hl = h.clip(upper=max_h)
            new_w_hl = (w * new_h_hl // h).clip(lower=1)
            new_w_wl = w.clip(upper=max_w)
            new_h_wl = (h * new_w_wl // w).clip(lower=1)
            new_w = new_w_hl.where(height_limited, new_w_wl)
            new_h = new_h_hl.where(height_limited, new_h_wl)
            thumb_len = (new_w * new_h // 256).clip(lower=1)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w.astype("int32"),
                    "height": h.astype("int32"),
                    "new_w": new_w.astype("int32"),
                    "new_h": new_h.astype("int32"),
                    "thumb": [
                        (b or b"")[:n] for b, n in zip(pdf["content"], thumb_len)
                    ],
                }
            )

    return decoded_with_content.mapInPandas(_resize, schema=RESIZED_SCHEMA)


# --- JPEG: REAL from-scratch lossy codec (ecostream.jpeg) --------------------


def _jpeg_pixels(mid: int) -> tuple[int, int, int, bytes]:
    """Deterministic (w, h, channels, pixels) fixture for id ``mid``:
    ``w = id%13+4``, ``h = id%11+3``, grayscale for even ids / RGB for
    odd, pixel bytes = md5(str(id)) cycled — the mm4 device.  Dims and
    channels are pure id arithmetic, so a SQL oracle predicts them
    without any codec; the PIXELS are only bounded (JPEG is lossy), so
    the round-trip check pins an error bound instead of an exact sum."""
    import hashlib

    w = mid % 13 + 4
    h = mid % 11 + 3
    c = 1 if mid % 2 == 0 else 3
    npix = w * h * c
    dig = hashlib.md5(str(mid).encode()).digest()
    return w, h, c, (dig * (npix // 16 + 1))[:npix]


def synth_jpeg_media(df: DataFrame) -> DataFrame:
    """Encode REAL baseline JFIF payloads from the id-derived fixture
    (all-ones quantization tables: the tightest honest round trip a
    lossy codec offers).  Map-only Arrow stage — the lossy sibling of
    synth_png_media."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import encode_jpeg

        for pdf in batches:
            blobs = []
            for mid in pdf["media_id"]:
                w, h, c, pixels = _jpeg_pixels(int(mid))
                blobs.append(encode_jpeg(w, h, pixels, channels=c, quality=None))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "content": blobs}
            )

    return df.select("media_id").mapInPandas(_synth, schema=schema)


JPEG_VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("max_err", T.LongType(), True),
    ]
)


def jpeg_roundtrip_check(df: DataFrame) -> DataFrame:
    """Decode (media_id, content) JPEG payloads and compare every
    sample against the re-synthesized id-derived source pixels,
    emitting the per-image max absolute error — the lossy-codec
    verification stage: dims/channels must be EXACT, samples within
    the codec's bound (≤2 at all-ones quant tables; the DC/AC float
    rounding is the only loss).  Map-only Arrow stage; payloads never
    leave the partition."""

    def _check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .jpeg import decode_jpeg

        for pdf in batches:
            widths, heights, chans, errs = [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                w, h, c, expected = _jpeg_pixels(int(mid))
                dw, dh, dc, got = decode_jpeg(bytes(b))
                widths.append(dw)
                heights.append(dh)
                chans.append(dc)
                if (dw, dh, dc) != (w, h, c):
                    errs.append(-1)  # structural mismatch, never bounded
                else:
                    errs.append(
                        max(abs(a - b_) for a, b_ in zip(expected, got))
                    )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "channels": pd.Series(chans, dtype="int32"),
                    "max_err": pd.Series(errs, dtype="int64"),
                }
            )

    return df.mapInPandas(_check, schema=JPEG_VERIFY_SCHEMA)


# --- WAV audio: REAL stdlib codec (wave module) ------------------------------

WAV_SR = 8000

WAV_DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("sample_sum", T.LongType(), True),
    ]
)


def _wav_samples(mid: int) -> list[int]:
    """Deterministic 16-bit PCM derived from the id alone (pure integer
    arithmetic, so a SQL oracle predicts every sample without running
    any codec — the mm4 device, audio edition)."""
    n = mid % 500 + 100
    return [((mid * 31 + i * 17) % 4096) - 2048 for i in range(n)]


def synth_wav_media(df: DataFrame) -> DataFrame:
    """Encode REAL mono 16-bit/8 kHz WAV payloads (RIFF container via
    the stdlib ``wave`` module) from id-derived PCM.  Map-only Arrow
    stage — the audio twin of synth_png_media."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            blobs = []
            for mid in pdf["media_id"]:
                samples = _wav_samples(int(mid))
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_SR)
                    w.writeframes(
                        struct.pack(f"<{len(samples)}h", *samples)
                    )
                blobs.append(buf.getvalue())
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "content": blobs}
            )

    return df.select("media_id").mapInPandas(_synth, schema=schema)


def decode_wav(df: DataFrame) -> DataFrame:
    """Decode stage for WAV payloads: frame count and rate from the
    RIFF header, exact integer sum over the PCM samples.  Explicitly
    little-endian unpack (WAV is LE by spec; ``array('h')`` would
    inherit platform endianness)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            ns, srs, sums = [], [], []
            for b in pdf["content"]:
                with wave.open(io.BytesIO(bytes(b)), "rb") as w:
                    n = w.getnframes()
                    sr = w.getframerate()
                    raw = w.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                ns.append(n)
                srs.append(sr)
                sums.append(sum(samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "sample_rate": pd.Series(srs, dtype="int32"),
                    "sample_sum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(_decode, schema=WAV_DECODED_SCHEMA)


# --- MJPEG AVI video: REAL from-scratch container + lossy frames -------------

VIDEO_FPS = 10


def _video_geometry(mid: int) -> tuple[int, int, int, int]:
    """(w, h, channels, n_frames) from id arithmetic alone — the mm4
    device, video edition (channels = 3 always: MJPEG AVI declares
    24-bit frames in BITMAPINFOHEADER)."""
    return mid % 13 + 4, mid % 11 + 3, 3, mid % 4 + 2


def _video_frame_pixels(mid: int, k: int) -> bytes:
    """Deterministic RGB pixels for frame ``k`` of video ``mid``:
    md5(f"{mid}:{k}") cycled to fill w*h*3 bytes."""
    import hashlib

    w, h, c, _ = _video_geometry(mid)
    npix = w * h * c
    dig = hashlib.md5(f"{mid}:{k}".encode()).digest()
    return (dig * (npix // 16 + 1))[:npix]


def synth_avi_media(df: DataFrame) -> DataFrame:
    """Encode REAL MJPEG AVI payloads from id-derived frames: each
    frame is a baseline JFIF image produced by the from-scratch JPEG
    codec, wrapped in the from-scratch RIFF/AVI container
    (ecostream.avi).  Map-only Arrow stage — the video sibling of
    synth_png_media/synth_jpeg_media."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi import encode_avi_mjpeg
        from .jpeg import encode_jpeg

        for pdf in batches:
            blobs = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h, c, n = _video_geometry(mid)
                frames = [
                    encode_jpeg(
                        w,
                        h,
                        _video_frame_pixels(mid, k),
                        channels=c,
                        quality=None,
                    )
                    for k in range(n)
                ]
                blobs.append(encode_avi_mjpeg(frames, w, h, fps=VIDEO_FPS))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "content": blobs}
            )

    return df.select("media_id").mapInPandas(_synth, schema=schema)


VIDEO_VERIFY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_frames", T.IntegerType(), True),
        T.StructField("fps", T.IntegerType(), True),
        T.StructField("max_err", T.LongType(), True),
    ]
)


def avi_roundtrip_check(df: DataFrame) -> DataFrame:
    """Decode (media_id, content) MJPEG AVI payloads — container walk,
    then the real JPEG decoder on EVERY frame — and compare every
    sample of every frame against the re-synthesized id-derived source
    pixels, emitting the per-video max absolute error.  Container
    fields (dims, frame count, fps) must be EXACT; frame samples are
    bounded by the lossy JPEG codec's error (≤4, the mm6 bound).  A
    structural failure — bad RIFF tree, idx1/movi mismatch, frame-dim
    drift — surfaces as max_err = -1 or wrong counts and fails the
    hash.  Map-only Arrow stage; payloads never leave the partition."""

    def _check(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .avi import decode_avi_mjpeg
        from .jpeg import decode_jpeg

        for pdf in batches:
            ws, hs, nfs, fpss, errs = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                mid = int(mid)
                ew, eh, ec, en = _video_geometry(mid)
                w, h, fps, frames = decode_avi_mjpeg(bytes(b))
                ws.append(w)
                hs.append(h)
                nfs.append(len(frames))
                fpss.append(fps)
                err = -1
                if (w, h, len(frames)) == (ew, eh, en):
                    err = 0
                    for k, fb in enumerate(frames):
                        dw, dh, dc, got = decode_jpeg(fb)
                        if (dw, dh, dc) != (ew, eh, ec):
                            err = -1
                            break
                        expected = _video_frame_pixels(mid, k)
                        err = max(
                            err,
                            max(
                                abs(a - g) for a, g in zip(expected, got)
                            ),
                        )
                errs.append(err)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_frames": pd.Series(nfs, dtype="int32"),
                    "fps": pd.Series(fpss, dtype="int32"),
                    "max_err": pd.Series(errs, dtype="int64"),
                }
            )

    return df.mapInPandas(_check, schema=VIDEO_VERIFY_SCHEMA)


WAV_FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame", T.LongType(), False),
        T.StructField("n_in_frame", T.LongType(), False),
        T.StructField("energy", T.LongType(), False),
        T.StructField("n_zero_cross", T.LongType(), False),
    ]
)


def wav_frame_features(df: DataFrame, frame_len: int = 64) -> DataFrame:
    """Frame-level audio FEATURE EXTRACTION over decoded WAV payloads —
    the Arrow stage a multimodal training pipeline runs between "raw
    audio bytes" and "model features": decode the RIFF container,
    window the PCM into ``frame_len``-sample frames (final partial
    frame kept), and emit per-frame integer features:

    - ``energy``       = sum of |sample| over the frame (exact BIGINT
                         L1 energy — no float windowing, so the DuckDB
                         oracle replays it from id arithmetic);
    - ``n_zero_cross`` = count of adjacent pairs within the frame with
                         strictly negative product (zero samples are
                         not crossings — an exact integer predicate).

    One row per (media, frame); map-only — payloads and samples never
    leave the partition, and the fan-out is bounded by
    n_samples / frame_len rows per media."""

    def _features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import struct
        import wave

        for pdf in batches:
            mids, frames, nin, energies, zcs = [], [], [], [], []
            for mid, b in zip(pdf["media_id"], pdf["content"]):
                with wave.open(io.BytesIO(bytes(b)), "rb") as w:
                    n = w.getnframes()
                    raw = w.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                for f0 in range(0, n, frame_len):
                    fr = samples[f0 : f0 + frame_len]
                    mids.append(int(mid))
                    frames.append(f0 // frame_len)
                    nin.append(len(fr))
                    energies.append(sum(abs(x) for x in fr))
                    zcs.append(
                        sum(
                            1
                            for a, b2 in zip(fr, fr[1:])
                            if a * b2 < 0
                        )
                    )
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(mids, dtype="int64"),
                    "frame": pd.Series(frames, dtype="int64"),
                    "n_in_frame": pd.Series(nin, dtype="int64"),
                    "energy": pd.Series(energies, dtype="int64"),
                    "n_zero_cross": pd.Series(zcs, dtype="int64"),
                }
            )

    return df.mapInPandas(_features, schema=WAV_FRAME_FEATURES_SCHEMA)


def synth_png_group_media(df: DataFrame, groups: int = 64) -> DataFrame:
    """Deterministic REAL-PNG payloads with PLANTED near-duplicates:
    image content derives from ``group = media_id % groups`` (md5-cycled
    base bytes halved to ≤127), then a per-doc brightness offset
    ``media_id % 3`` is added to every pixel — the variant that a
    perceptual average-hash must see through (a constant offset shifts
    every pixel AND the mean equally, so above/below-mean bits are
    unchanged), while any byte-level hash sees three distinct payloads
    per group.  All quantities are pure integer arithmetic over the id,
    so a SQL oracle predicts the aHash without running a codec."""

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("content", T.BinaryType(), True),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        from .png import encode_png

        chan_of = {0: 1, 1: 3, 2: 4}
        for pdf in batches:
            blobs = []
            for mid in pdf["media_id"]:
                mid = int(mid)
                g = mid % groups
                w = g % 13 + 4
                h = g % 11 + 3
                c = chan_of[g % 3]
                delta = mid % 3
                dig = hashlib.md5(str(g).encode()).digest()
                base = bytes(b // 2 + delta for b in dig)
                npix = w * h * c
                pixels = (base * (npix // 16 + 1))[:npix]
                blobs.append(encode_png(w, h, pixels, c))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"].astype("int64"), "content": blobs}
            )

    return df.select("media_id").mapInPandas(_synth, schema=schema)


def ahash_media(df: DataFrame) -> DataFrame:
    """Average-hash over REAL decoded PNG pixels: 64 bits, bit j set iff
    pixel ``j % npix`` is strictly above the image mean — compared in
    exact integers (``pix * npix > sum``) so the hash is bit-for-bit
    reproducible by a SQL oracle.  Arrow mapInPandas, map-only."""

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("ahash", T.StringType(), True),
        ]
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .png import decode_png

        for pdf in batches:
            widths, heights, hashes = [], [], []
            for b in pdf["content"]:
                w, h, ch, pix = decode_png(bytes(b))
                npix = len(pix)
                s = sum(pix)
                bits = "".join(
                    "1" if pix[j % npix] * npix > s else "0" for j in range(64)
                )
                widths.append(w)
                heights.append(h)
                hashes.append(bits)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "ahash": hashes,
                }
            )

    return df.mapInPandas(_hash, schema=schema)
