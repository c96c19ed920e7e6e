"""Pure-Python baseline JPEG (JFIF) codec — no third-party codec libs.

From-scratch implementation of the public JPEG standard (ITU-T T.81 /
ISO 10918-1, baseline sequential DCT, SOF0) plus the JFIF container
(APP0).  Written so the multimodal decode stage
(multimodal.decode_media) can run REAL image bytes for the lossy-codec
family in containers that ship no image libraries — the JPEG sibling
of the lossless PNG codec in ecostream/png.py.

Scope (the subset a bulk training-data pipeline meets): 8-bit baseline,
1 component (grayscale) or 3 components (YCbCr 4:4:4, no chroma
subsampling), one interleaved scan, no restart markers, no progressive
mode.  numpy (public, already a hard dep of pandas/pyarrow) provides
the 8×8 DCT as two matrix multiplies; everything else — markers,
quantization, zigzag, canonical Huffman coding, byte stuffing — is
stdlib.

Huffman design: the encoder emits FIXED-LENGTH canonical tables (all
12 DC categories at 4 bits, all 162 AC run/size symbols at 8 bits) and
declares them in DHT segments, as the format requires; the decoder
builds its tables FROM the DHT segments (never from assumptions), so
it reads any baseline file including ones using the ITU Annex K
example tables.  Compression ratio is not the point of this codec —
structural validity and a verified encode→decode round trip are.

JPEG is lossy: a round trip reproduces dimensions exactly and pixels
to within a small error bound (float DCT + integer quantization).
With all-ones quantization tables the measured max per-sample error is
≤ 2 for grayscale and ≤ 4 for color (the extra ±2 from the YCbCr
transform round trip); tests pin these bounds.
"""

from __future__ import annotations

import struct

import numpy as np

# Zigzag scan order (T.81 Figure 5): zigzag index -> raster index.
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Annex K.1 example luminance quantization table (raster
# order), scaled by the public IJG quality formula in quant_tables().
_K1_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_K1_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]


def quant_tables(quality: int | None) -> tuple[list[int], list[int]]:
    """(luma, chroma) quantization tables in raster order.

    ``quality=None`` -> all-ones tables (maximum fidelity: the only
    round-trip loss is float-DCT rounding).  Otherwise the public IJG
    scaling of the Annex K examples: scale = 5000/Q (Q<50) else
    200-2Q; q = clamp(1..255, (base*scale+50)//100).
    """
    if quality is None:
        return [1] * 64, [1] * 64
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    mk = lambda base: [min(255, max(1, (b * scale + 50) // 100)) for b in base]
    return mk(_K1_LUMA), mk(_K1_CHROMA)


# --- canonical Huffman tables -------------------------------------------------

# DC: 12 categories (0..11), all 4-bit codes.  AC: the 162 legal
# run/size symbols, all 8-bit codes.  BITS[i] = #codes of length i+1.
_DC_BITS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))
_AC_VALS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_VALS), 0, 0, 0, 0, 0, 0, 0, 0]


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the canonical generation of
    T.81 Annex C: codes of each length are consecutive, lengths
    ascending."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_DC = _canonical_codes(_DC_BITS, _DC_VALS)
_ENC_AC = _canonical_codes(_AC_BITS, _AC_VALS)

# DCT-II orthonormal basis: F = C @ X @ C.T, inverse X = C.T @ F @ C.
_C = np.array(
    [
        [
            (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
            * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            b = (self._acc >> self._n) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing: 0xFF in entropy data -> FF 00
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # pad with 1-bits per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    # marker inside entropy data (e.g. EOI reached via
                    # padding) — feed 1-bits, do not consume the marker
                    self.pos -= 1
                    self._acc, self._n = 1, 1
                    return 1
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits value) for a DC diff / AC coefficient
    per T.81 F.1.2.1: negatives are stored as value + 2^size - 1."""
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    if bits < (1 << (s - 1)):
        return bits - (1 << s) + 1
    return bits


def _dqt_segment(tid: int, table: list[int]) -> bytes:
    zz = bytes(table[ZIGZAG[i]] for i in range(64))
    return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz


def _dht_segment(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
    payload = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(payload)) + payload


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 1,
    quality: int | None = None,
) -> bytes:
    """Encode raw 8-bit pixels (row-major, ``width*height*channels``)
    as a valid baseline JFIF JPEG.  ``channels`` 1 (grayscale) or 3
    (RGB, stored as YCbCr 4:4:4).  ``quality=None`` uses all-ones
    quantization tables (tightest round trip); 1..100 uses the IJG
    scaling of the Annex K example tables."""
    if channels not in (1, 3):
        raise ValueError(f"unsupported channel count: {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * channels}"
        )
    luma_q, chroma_q = quant_tables(quality)
    img = np.frombuffer(pixels, dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    planes = (
        [img[..., 0]]
        if channels == 1
        else [ _rgb_to_ycbcr(img)[..., i] for i in range(3) ]
    )
    qtabs = [luma_q] + ([chroma_q, chroma_q] if channels == 3 else [])

    bw = 0xFFFF & ((width + 7) // 8)
    bh = 0xFFFF & ((height + 7) // 8)
    # Edge-replicate pad each plane to full blocks.
    padded = []
    for p in planes:
        pp = np.pad(
            p, ((0, bh * 8 - height), (0, bw * 8 - width)), mode="edge"
        )
        padded.append(pp - 128.0)

    writer = _BitWriter()
    prev_dc = [0] * len(planes)
    for by in range(bh):
        for bx in range(bw):
            for ci, p in enumerate(padded):
                block = p[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _C @ block @ _C.T
                qt = np.array(qtabs[ci], dtype=np.float64).reshape(8, 8)
                q = np.rint(coef / qt).astype(np.int64)
                # Baseline AC magnitudes cap at 10 bits (±1023); only
                # pathological basis-aligned inputs can exceed it.
                q = np.clip(q, -1023, 1023)
                zz = [int(q.flat[ZIGZAG[i]]) for i in range(64)]
                diff = zz[0] - prev_dc[ci]
                prev_dc[ci] = zz[0]
                s, bits = _magnitude(diff) if diff else (0, 0)
                code, ln = _ENC_DC[s]
                writer.write(code, ln)
                if s:
                    writer.write(bits, s)
                run = 0
                last_nz = max(
                    (i for i in range(1, 64) if zz[i]), default=0
                )
                for i in range(1, last_nz + 1):
                    v = zz[i]
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, ln = _ENC_AC[0xF0]  # ZRL
                        writer.write(code, ln)
                        run -= 16
                    s, bits = _magnitude(v)
                    code, ln = _ENC_AC[(run << 4) | s]
                    writer.write(code, ln)
                    writer.write(bits, s)
                    run = 0
                if last_nz < 63:
                    code, ln = _ENC_AC[0x00]  # EOB
                    writer.write(code, ln)
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00"
        + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + bytes([0, 0])
    )
    out += _dqt_segment(0, luma_q)
    if channels == 3:
        out += _dqt_segment(1, chroma_q)
    # SOF0 baseline
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, height, width, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += _dht_segment(0, 0, _DC_BITS, _DC_VALS)
    out += _dht_segment(1, 0, _AC_BITS, _AC_VALS)
    if channels == 3:
        out += _dht_segment(0, 1, _DC_BITS, _DC_VALS)
        out += _dht_segment(1, 1, _AC_BITS, _AC_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _build_decoder_table(
    bits: list[int], vals: list[int]
) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, from a DHT segment's BITS/VALS."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code in entropy stream")


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG produced by any encoder within this
    codec's scope (8-bit, 1 or 3 components, 4:4:4, one scan).
    Returns ``(width, height, channels, pixels)`` with pixels row-major
    8-bit (RGB for 3 components)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: dict[int, list[int]] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    width = height = 0
    comps: list[tuple[int, int]] = []  # (comp_id, quant table id)
    scan_tables: list[tuple[int, int]] = []  # (dc table, ac table)
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables not in scope")
                zz = seg[i + 1 : i + 65]
                t = [0] * 64
                for j in range(64):
                    t[ZIGZAG[j]] = zz[j]
                qtabs[tq] = t
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                bits = list(seg[i + 1 : i + 17])
                n = sum(bits)
                vals = list(seg[i + 17 : i + 17 + n])
                htabs[(tc, th)] = _build_decoder_table(bits, vals)
                i += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            for c in range(ncomp):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                if samp != 0x11:
                    raise ValueError("subsampling not in scope (4:4:4 only)")
                comps.append((cid, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline SOF not in scope")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for c in range(ns):
                _cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_tables.append((tt >> 4, tt & 0xF))
            pos += seglen
            break
        pos += seglen
    if not comps or not scan_tables:
        raise ValueError("missing SOF/SOS")

    br = _BitReader(data, pos)
    ncomp = len(comps)
    bw, bh = (width + 7) // 8, (height + 7) // 8
    planes = [np.zeros((bh * 8, bw * 8)) for _ in range(ncomp)]
    prev_dc = [0] * ncomp
    for by in range(bh):
        for bx in range(bw):
            for ci in range(ncomp):
                dc_t = htabs[(0, scan_tables[ci][0])]
                ac_t = htabs[(1, scan_tables[ci][1])]
                qt = np.array(qtabs[comps[ci][1]], dtype=np.float64)
                zz = [0] * 64
                s = _read_symbol(br, dc_t)
                diff = _extend(br.read_bits(s), s) if s else 0
                prev_dc[ci] += diff
                zz[0] = prev_dc[ci]
                i = 1
                while i < 64:
                    sym = _read_symbol(br, ac_t)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        i += 16
                        continue
                    run, size = sym >> 4, sym & 0xF
                    i += run
                    if i > 63:
                        raise ValueError("AC run past end of block")
                    zz[i] = _extend(br.read_bits(size), size)
                    i += 1
                coef = np.zeros(64)
                for j in range(64):
                    coef[ZIGZAG[j]] = zz[j]
                coef = coef * qt
                block = _C.T @ coef.reshape(8, 8) @ _C
                planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = block

    planes = [p[:height, :width] + 128.0 for p in planes]
    if ncomp == 1:
        out = np.clip(np.rint(planes[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    ycc = np.stack(planes, axis=-1)
    rgb = np.clip(np.rint(_ycbcr_to_rgb(ycc)), 0, 255).astype(np.uint8)
    return width, height, 3, rgb.tobytes()
