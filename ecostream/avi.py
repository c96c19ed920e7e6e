"""From-scratch AVI (RIFF) container codec for MJPEG video.

Public-spec implementation (Microsoft AVI RIFF form, msdn
``AVIMAINHEADER``/``AVISTREAMHEADER``/``BITMAPINFOHEADER``; OpenDML
extensions not needed at these sizes): an AVI file is a RIFF tree —
``hdrl`` (main header + one video stream header) and ``movi`` (one
``00dc`` chunk per compressed frame) plus the ``idx1`` index.  With
the ``MJPG`` fourcc each ``00dc`` payload is a standalone baseline
JFIF image, which the engine's own from-scratch JPEG codec
(ecostream.jpeg) encodes and decodes — so the whole video path runs
with zero third-party libraries, closing the final branch of the
round-1 multimodal decode stub.  Only INTER-frame codecs (h264...)
remain gated: they need entropy/motion machinery that would be a
codec project of its own, not an analytics engine's.

Closes the reference's media scope the Spark-first way (the reference
has no media layer; SURVEY §2.10 scopes multimodal columns from the
brief): payloads stay opaque ``binary`` columns, codecs run inside
Arrow ``mapInPandas`` stages, and nothing here touches a shuffle.
"""

from __future__ import annotations

import struct

_AVIIF_KEYFRAME = 0x10


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk: fourcc + little-endian size + data, padded to even
    length (the pad byte is NOT counted in the size — RIFF spec)."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Build an MJPEG AVI from per-frame JFIF payloads."""
    n = len(frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        max((len(f) for f in frames), default=0),  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<10I4h",
            0,  # dwFlags
            0,  # wPriority + wLanguage packed
            0,  # dwInitialFrames
            1,  # dwScale
            fps,  # dwRate (fps = rate/scale)
            0,  # dwStart
            n,  # dwLength (in frames)
            max((len(f) for f in frames), default=0),
            0xFFFFFFFF,  # dwQuality (-1 = default)
            0,  # dwSampleSize (0: variable-size samples)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40,  # biSize
        width,
        height,
        1,  # biPlanes
        24,  # biBitCount
        b"MJPG",  # biCompression
        width * height * 3,  # biSizeImage (uncompressed estimate)
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    # movi chunks + idx1 offsets (offsets are relative to the 'movi'
    # fourcc position, the widespread convention players expect)
    movi_payload = b""
    idx_entries = []
    for f in frames:
        offset = 4 + len(movi_payload)  # after the 'movi' type fourcc
        idx_entries.append(
            b"00dc" + struct.pack("<3I", _AVIIF_KEYFRAME, offset, len(f))
        )
        movi_payload += _chunk(b"00dc", f)
    movi = _list(b"movi", movi_payload)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def decode_avi_mjpeg(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Parse an MJPEG AVI -> (width, height, fps, frame payloads).

    Walks the RIFF tree by chunk sizes (never trusts idx1 for the
    frames — the index is cross-checked instead, so a corrupt index
    raises rather than silently reordering frames)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI file")
    width = height = fps = None
    frames: list[bytes] = []
    idx_count = None

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal width, height, fps, idx_count
        while pos + 8 <= end:
            fourcc = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            body_start = pos + 8
            body_end = body_start + size
            if fourcc == b"LIST":
                walk(buf, body_start + 4, body_end)
            elif fourcc == b"avih":
                vals = struct.unpack("<14I", buf[body_start : body_start + 56])
                width, height = vals[8], vals[9]
            elif fourcc == b"strh":
                if buf[body_start : body_start + 4] == b"vids":
                    vals = struct.unpack(
                        "<10I4h", buf[body_start + 8 : body_start + 56]
                    )
                    scale, rate = vals[3], vals[4]
                    fps = rate // max(scale, 1)
            elif fourcc == b"00dc":
                frames.append(buf[body_start:body_end])
            elif fourcc == b"idx1":
                idx_count = size // 16
            pos = body_end + (size % 2)  # skip the even-padding byte

    walk(data, 12, 8 + struct.unpack("<I", data[4:8])[0])
    if width is None or fps is None:
        raise ValueError("missing avih/strh headers")
    if idx_count is not None and idx_count != len(frames):
        raise ValueError(
            f"idx1 entries ({idx_count}) != movi frames ({len(frames)})"
        )
    return width, height, fps, frames
