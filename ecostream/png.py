"""Pure-stdlib PNG codec (``zlib`` + ``struct``), no third-party deps.

Supports the subset a training-data pipeline actually meets in bulk:
8-bit depth, color types 0 (grayscale), 2 (RGB), 6 (RGBA),
non-interlaced, all five scanline filters (None/Sub/Up/Average/Paeth).
The PNG container format is public (RFC 2083 / the W3C PNG spec);
this is a from-scratch implementation of it, written so the
multimodal decode stage (multimodal.decode_media) runs REAL image
bytes in containers that ship no codec libraries.

The encoder exists to build deterministic fixtures: it deliberately
cycles the filter type per scanline (row % 5) so a round-trip
exercises every unfilter path.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel (8-bit depth only)
_CHANNELS_OF_COLOR = {0: 1, 2: 3, 6: 4}
_COLOR_OF_CHANNELS = {1: 0, 3: 2, 4: 6}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*channels``
    bytes) as a valid non-interlaced PNG.  Scanline ``r`` uses filter
    ``r % 5``, so decoders must implement every filter to read it."""
    if channels not in _COLOR_OF_CHANNELS:
        raise ValueError(f"unsupported channel count: {channels}")
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {stride * height}"
        )
    ihdr = struct.pack(
        ">IIBBBBB", width, height, 8, _COLOR_OF_CHANNELS[channels], 0, 0, 0
    )
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        row = pixels[r * stride : (r + 1) * stride]
        f = r % 5
        raw.append(f)
        if f == 0:
            raw += row
        elif f == 1:  # Sub
            raw += bytes(
                (row[i] - (row[i - channels] if i >= channels else 0)) & 0xFF
                for i in range(stride)
            )
        elif f == 2:  # Up
            raw += bytes((row[i] - prev[i]) & 0xFF for i in range(stride))
        elif f == 3:  # Average
            raw += bytes(
                (
                    row[i]
                    - ((row[i - channels] if i >= channels else 0) + prev[i]) // 2
                )
                & 0xFF
                for i in range(stride)
            )
        else:  # Paeth
            raw += bytes(
                (
                    row[i]
                    - _paeth(
                        row[i - channels] if i >= channels else 0,
                        prev[i],
                        prev[i - channels] if i >= channels else 0,
                    )
                )
                & 0xFF
                for i in range(stride)
            )
        prev = row
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG to ``(width, height, channels, pixels)`` with
    ``pixels`` the raw row-major 8-bit buffer.  Validates the
    signature and every chunk CRC; raises ``ValueError`` on anything
    outside the supported subset (bit depth != 8, palette color,
    interlacing)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = channels = -1
    idat = bytearray()
    while pos < len(data):
        # Truncated input makes the unpacks see < 4 bytes — surface that
        # as the documented ValueError, not struct.error, so callers can
        # quarantine bad media rows with one except clause.
        if pos + 12 > len(data):
            raise ValueError("truncated PNG: incomplete chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        if pos + 12 + length > len(data):
            raise ValueError(f"truncated PNG: incomplete {tag!r} chunk")
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            if len(body) != 13:
                raise ValueError(f"malformed IHDR (len {len(body)})")
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color not in _CHANNELS_OF_COLOR:
                raise ValueError(f"unsupported color type {color}")
            if comp != 0 or filt != 0:
                raise ValueError("unsupported compression/filter method")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
            channels = _CHANNELS_OF_COLOR[color]
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if width < 0:
        raise ValueError("missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:  # corrupt IDAT -> documented error type
        raise ValueError(f"corrupt IDAT stream: {e}") from e
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("decompressed size mismatch")
    out = bytearray(stride * height)
    prev = bytes(stride)
    for r in range(height):
        f = raw[r * (stride + 1)]
        line = bytearray(raw[r * (stride + 1) + 1 : (r + 1) * (stride + 1)])
        if f == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"unknown filter type {f} on row {r}")
        out[r * stride : (r + 1) * stride] = line
        prev = bytes(line)
    return width, height, channels, bytes(out)
