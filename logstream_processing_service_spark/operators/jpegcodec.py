"""Baseline sequential GRAYSCALE JPEG codec — pure stdlib + numpy.

Closes the JPEG half of the multimodal content-decode gap the same way
decode_png closed PNG's: a real codec (forward/inverse 8×8 DCT, IJG
quality-scaled quantization, canonical Huffman entropy coding with byte
stuffing, full JFIF marker framing) verified against a closed-form pixel
oracle. Scope is stated honestly: baseline sequential, 8-bit,
grayscale, 4:4:4 YCbCr color, and 4:2:0 subsampled color (interleaved
MCUs with per-component sampling factors ≤ 2, Annex-K chroma tables,
JFIF BT.601 transform, 2×2 box-averaged chroma). Restart intervals (DRI/RSTn) are
handled on both sides. Sampling factors beyond 2×2 and progressive
scans raise loudly — the PIL-gated remainder — but the hard parts (DCT,
Huffman, color transform, MCU layout, marker machinery) are real and
exercised end-to-end.

Why a closed-form oracle is possible for a LOSSY codec: a block-constant
image at quality 100 is DC-only — the constant c encodes as the exact
integer 8·(c−128) with zero AC energy, so encode→decode reproduces every
pixel EXACTLY and DuckDB can recompute the stats analytically
(`jpeg_pixel_stats`). Lossy behavior on non-constant content is bounded
separately in tests (quality-100 gradients round-trip within ±3 levels).

Huffman/quant constants are the public JPEG Annex K tables.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd

# ---------------------------------------------------------------------------
# Annex K tables + zigzag
# ---------------------------------------------------------------------------

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_VALS = list(range(12))

AC_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

_C = np.array([1.0 / np.sqrt(2.0)] + [1.0] * 7)
_M = np.array(
    [
        [_C[u] / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16.0) for x in range(8)]
        for u in range(8)
    ]
)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical JPEG Huffman assignment."""
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


def scaled_quant(quality: int) -> np.ndarray:
    """IJG quality scaling; quality=100 → all-ones (DC-exact)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (QUANT_LUMA * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def finish(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << s) - 1
    return s, bits


def encode_jpeg_gray(
    pixels: np.ndarray, quality: int = 100, restart_interval: int = 0
) -> bytes:
    """Baseline JFIF, one luminance component, h1v1. ``restart_interval``
    > 0 emits a DRI segment and RSTn markers every that-many MCUs
    (byte-aligned, DC predictors reset) — the error-resilience layout
    most camera/web encoders produce."""
    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w = pixels.shape
    q = scaled_quant(quality)
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(pixels, ((0, ph - h), (0, pw - w)), mode="edge").astype(
        np.float64
    )
    blocks = (
        padded.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) - 128.0
    )
    coeffs = np.einsum("ux,bcxy,vy->bcuv", _M, blocks, _M)
    quant = np.round(coeffs / q).astype(np.int64)
    flat = quant.reshape(-1, 64)[:, ZIGZAG]

    dc_codes = _canonical_codes(DC_BITS, DC_VALS)
    ac_codes = _canonical_codes(AC_BITS, AC_VALS)
    bw = _BitWriter()
    chunks: list[bytes] = []
    prev_dc = 0
    rst = 0
    for mcu_no, zz in enumerate(flat):
        if restart_interval and mcu_no and mcu_no % restart_interval == 0:
            chunks.append(bw.finish())
            chunks.append(bytes([0xFF, 0xD0 + rst]))
            rst = (rst + 1) % 8
            bw = _BitWriter()
            prev_dc = 0
        prev_dc = _encode_block(bw, zz, prev_dc, dc_codes, ac_codes)
    chunks.append(bw.finish())
    data = b"".join(chunks)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(q.reshape(-1)[ZIGZAG].astype(np.uint8)))
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    if restart_interval:
        out += seg(0xFFDD, struct.pack(">H", restart_interval))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    out += data + b"\xff\xd9"
    return out


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        while self.n <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) | 0xFF  # spec: pad with 1s
                self.n += 8
                continue
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # unstuff
                else:
                    # marker: behave as end-of-data (pad 1s)
                    self.pos = len(self.data)
                    self.acc = (self.acc << 8) | 0xFF
                    self.n += 8
                    continue
            self.acc = (self.acc << 8) | b
            self.n += 8

    def peek16(self) -> int:
        self._fill()
        return (self.acc >> (self.n - 16)) & 0xFFFF

    def skip(self, k: int) -> None:
        self.n -= k
        self.acc &= (1 << self.n) - 1

    def take(self, k: int) -> int:
        if k == 0:
            return 0
        self._fill()
        v = (self.acc >> (self.n - k)) & ((1 << k) - 1)
        self.skip(k)
        return v


def _decode_table(bits: list[int], vals: list[int]):
    """(first_code, first_index, maxcode) per length for fast decode."""
    codes = _canonical_codes(bits, vals)
    by_len: dict[int, dict[int, int]] = {}
    for val, (code, ln) in codes.items():
        by_len.setdefault(ln, {})[code] = val
    return by_len


def _read_code(br: _BitReader, table) -> int:
    word = br.peek16()
    for ln in range(1, 17):
        cand = word >> (16 - ln)
        hit = table.get(ln, {}).get(cand)
        if hit is not None:
            br.skip(ln)
            return hit
    raise ValueError("invalid Huffman code in entropy stream")


def _extend(bits: int, s: int) -> int:
    if s == 0:
        return 0
    return bits if bits >= (1 << (s - 1)) else bits - (1 << s) + 1


def decode_jpeg_gray(b: bytes) -> np.ndarray:
    """Decode a baseline sequential grayscale JFIF produced by any
    conforming encoder. Color / progressive / restart-interval streams
    raise loudly (the documented PIL-gated remainder)."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    dims = None
    comp_q = 0
    scan_dc = scan_ac = 0
    data_start = None
    while i < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        if i + 4 > len(b):
            raise ValueError("truncated JPEG stream")
        marker = b[i + 1]
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (ln,) = struct.unpack(">H", b[i + 2 : i + 4])
        seg = b[i + 4 : i + 2 + ln]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline")
            if ncomp != 1:
                raise NotImplementedError(
                    "grayscale only — color JPEG decode stays PIL-gated"
                )
            if seg[7] != 0x11:
                raise NotImplementedError("subsampled single component")
            dims = (h, w)
            comp_q = seg[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nval = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nval])
                tbl = _decode_table(bits, vals)
                (ac_tables if tc else dc_tables)[th] = tbl
                j += 17 + nval
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals")
        elif marker == 0xDA:
            scan_dc, scan_ac = seg[2] >> 4, seg[2] & 0x0F
            data_start = i + 2 + ln
            break
        i += 2 + ln
    if dims is None or data_start is None:
        raise ValueError("missing SOF0/SOS")
    h, w = dims
    q = qt[comp_q]
    dct = dc_tables[scan_dc]
    act = ac_tables[scan_ac]
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    n_blocks = (ph // 8) * (pw // 8)
    br = _BitReader(b[data_start:])
    flat = np.zeros((n_blocks, 64), dtype=np.int64)
    prev_dc = 0
    for nb in range(n_blocks):
        s = _read_code(br, dct)
        prev_dc += _extend(br.take(s), s)
        flat[nb, 0] = prev_dc
        k = 1
        while k < 64:
            sym = _read_code(br, act)
            if sym == 0x00:  # EOB
                break
            if sym == 0xF0:  # ZRL
                k += 16
                continue
            run, s = sym >> 4, sym & 0x0F
            k += run
            if k > 63:
                raise ValueError("AC run past block end")
            flat[nb, k] = _extend(br.take(s), s)
            k += 1
    blocks = (flat[:, UNZIGZAG].reshape(-1, 8, 8) * q).astype(np.float64)
    spatial = np.einsum("xu,buv,yv->bxy", _M.T, blocks, _M.T) + 128.0
    img = (
        spatial.reshape(ph // 8, pw // 8, 8, 8)
        .transpose(0, 2, 1, 3)
        .reshape(ph, pw)
    )
    return np.clip(np.round(img), 0, 255).astype(np.uint8)[:h, :w]


# ---------------------------------------------------------------------------
# Closed-form fixture + Spark operator (same contract as image_pixel_stats)
# ---------------------------------------------------------------------------


def synthetic_jpeg_blocks(width: int, height: int, seed: int = 0) -> bytes:
    """Block-constant grayscale at quality 100: block (bx,by) has value
    (3·bx + 7·by + seed) % 256 — DC-only, so the decode is EXACT and the
    oracle recomputes every pixel analytically."""
    if width % 8 or height % 8:
        raise ValueError("block fixture needs multiples of 8")
    bx = np.arange(width // 8)
    by = np.arange(height // 8)
    v = (3 * bx[None, :] + 7 * by[:, None] + seed) % 256
    px = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1).astype(np.uint8)
    return encode_jpeg_gray(px, quality=100)


def with_blocky_jpeg_payload(documents, n_parts: int = 32):
    from pyspark.sql import functions as F

    @F.pandas_udf("binary")
    def make_jpeg(doc_id: pd.Series) -> pd.Series:
        return doc_id.map(
            lambda d: synthetic_jpeg_blocks(
                8 * (int(d) % 6 + 2), 8 * (int(d) % 4 + 2), int(d) % 256
            )
        )

    # codec work is CPU-bound Python: spread it across tasks BEFORE the
    # UDFs (a doc_id-only shuffle costs ~8 bytes/row; the local testdata
    # parquet is one row group, so without this every encode+decode runs
    # serially in a single task — and at 100 TB this is how a media
    # pipeline bounds per-task batch bytes anyway, cf. extract_features)
    return documents.select("doc_id").repartition(n_parts, "doc_id").select(
        "doc_id", make_jpeg(F.col("doc_id")).alias("payload")
    )


def jpeg_pixel_stats(media):
    """Decode every payload with the native codec; emit pixel stats the
    closed-form oracle recomputes without any decoder."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                px = decode_jpeg_gray(bytes(payload))
                rows.append(
                    {
                        "doc_id": int(doc_id),
                        "n_px": int(px.size),
                        "mean_px": round(float(px.astype(np.float64).mean()), 6),
                        "min_px": int(px.min()),
                        "max_px": int(px.max()),
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_px", "mean_px", "min_px", "max_px"]
            )

    return media.mapInPandas(
        run, "doc_id bigint, n_px bigint, mean_px double, min_px bigint, max_px bigint"
    )


# ---------------------------------------------------------------------------
# Color (YCbCr 4:4:4) extension: interleaved 3-component MCUs with the
# Annex K chroma quant/Huffman tables and the JFIF full-range BT.601
# color transform. Chroma subsampling (h2v2 etc.) and progressive scans
# remain the loud gates.
# ---------------------------------------------------------------------------

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

DC_BITS_C = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_VALS_C = list(range(12))

AC_BITS_C = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_VALS_C = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range BT.601; returns float64 (H, W, 3), unrounded."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


def _component_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(n_blocks, 64) zigzagged quantized coefficients for one plane."""
    ph, pw = plane.shape
    blocks = plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3) - 128.0
    coeffs = np.einsum("ux,bcxy,vy->bcuv", _M, blocks, _M)
    return np.round(coeffs / q).astype(np.int64).reshape(-1, 64)[:, ZIGZAG]


def _encode_block(bw, zz, prev_dc, dc_codes, ac_codes) -> int:
    s, bits = _magnitude(int(zz[0]) - prev_dc)
    c, ln = dc_codes[s]
    bw.put(c, ln)
    if s:
        bw.put(bits, s)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            c, ln = ac_codes[0xF0]
            bw.put(c, ln)
            run -= 16
        s, bits = _magnitude(v)
        c, ln = ac_codes[(run << 4) | s]
        bw.put(c, ln)
        bw.put(bits, s)
        run = 0
    if last_nz < 63:
        c, ln = ac_codes[0x00]
        bw.put(c, ln)
    return int(zz[0])


def encode_jpeg_color(
    rgb: np.ndarray, quality: int = 100, subsampling: str = "444"
) -> bytes:
    """Baseline JFIF, 3 interleaved YCbCr components — 4:4:4 (h1v1) or
    4:2:0 (luma h2v2, 2×2 box-averaged chroma, the web-standard layout)."""
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, _ = rgb.shape
    ycc = np.clip(np.round(rgb_to_ycbcr(rgb.astype(np.float64))), 0, 255)
    ql = scaled_quant(quality)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    qc = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255).astype(np.int64)
    dc_l = _canonical_codes(DC_BITS, DC_VALS)
    ac_l = _canonical_codes(AC_BITS, AC_VALS)
    dc_c = _canonical_codes(DC_BITS_C, DC_VALS_C)
    ac_c = _canonical_codes(AC_BITS_C, AC_VALS_C)
    bw = _BitWriter()
    prev = [0, 0, 0]
    if subsampling == "444":
        ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
        planes = [
            np.pad(ycc[..., c], ((0, ph - h), (0, pw - w)), mode="edge")
            for c in range(3)
        ]
        zz = [
            _component_blocks(planes[0], ql),
            _component_blocks(planes[1], qc),
            _component_blocks(planes[2], qc),
        ]
        for mcu in range(zz[0].shape[0]):
            prev[0] = _encode_block(bw, zz[0][mcu], prev[0], dc_l, ac_l)
            prev[1] = _encode_block(bw, zz[1][mcu], prev[1], dc_c, ac_c)
            prev[2] = _encode_block(bw, zz[2][mcu], prev[2], dc_c, ac_c)
        luma_hv = b"\x11"
    else:
        ph, pw = -(-h // 16) * 16, -(-w // 16) * 16
        planes = [
            np.pad(ycc[..., c], ((0, ph - h), (0, pw - w)), mode="edge")
            for c in range(3)
        ]
        half = [
            p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3)).round()
            for p in planes[1:]
        ]
        zzy = _component_blocks(planes[0], ql)  # (ph/8 * pw/8) row-major
        zzb = _component_blocks(half[0], qc)
        zzr = _component_blocks(half[1], qc)
        ybc = pw // 8  # luma blocks per row
        cbc = pw // 16
        for my in range(ph // 16):
            for mx in range(pw // 16):
                for by, bx in ((0, 0), (0, 1), (1, 0), (1, 1)):
                    idx = (2 * my + by) * ybc + 2 * mx + bx
                    prev[0] = _encode_block(bw, zzy[idx], prev[0], dc_l, ac_l)
                cidx = my * cbc + mx
                prev[1] = _encode_block(bw, zzb[cidx], prev[1], dc_c, ac_c)
                prev[2] = _encode_block(bw, zzr[cidx], prev[2], dc_c, ac_c)
        luma_hv = b"\x22"
    data = bw.finish()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    out = b"\xff\xd8"
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += seg(0xFFDB, b"\x00" + bytes(ql.reshape(-1)[ZIGZAG].astype(np.uint8)))
    out += seg(0xFFDB, b"\x01" + bytes(qc.reshape(-1)[ZIGZAG].astype(np.uint8)))
    out += seg(
        0xFFC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + b"\x01" + luma_hv + b"\x00" + b"\x02\x11\x01" + b"\x03\x11\x01",
    )
    out += seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    out += seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
    out += seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C))
    out += seg(0xFFDA, b"\x03\x01\x00\x02\x11\x03\x11\x00\x3f\x00")
    out += data + b"\xff\xd9"
    return out


def decode_jpeg(b: bytes) -> np.ndarray:
    """General baseline decoder: (H, W) for grayscale, (H, W, 3) RGB for
    YCbCr color at 4:4:4 or subsampled layouts with factors ≤ 2 (incl.
    the web-standard 4:2:0), with or without restart intervals (DRI/RSTn
    resynchronization). Factors beyond 2×2 and progressive scans raise
    loudly."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    i = 2
    qt: dict[int, np.ndarray] = {}
    dc_tables: dict[int, dict] = {}
    ac_tables: dict[int, dict] = {}
    dims = None
    comps: list[tuple[int, int]] = []  # (component id, quant table id)
    scan: list[tuple[int, int, int]] = []  # (comp index, dc table, ac table)
    data_start = None
    restart_interval = 0
    while i < len(b):
        if b[i] != 0xFF:
            i += 1
            continue
        if i + 4 > len(b):
            raise ValueError("truncated JPEG stream")
        marker = b[i + 1]
        if marker == 0xD9:
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        (ln,) = struct.unpack(">H", b[i + 2 : i + 4])
        seg = b[i + 4 : i + 2 + ln]
        if marker == 0xDB:
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 0x0F
                if pq != 0:
                    raise NotImplementedError("16-bit quant tables")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[j + 1 : j + 65], dtype=np.uint8)
                qt[tq] = tbl.reshape(8, 8)
                j += 65
        elif marker == 0xC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise NotImplementedError("only 8-bit baseline")
            if ncomp not in (1, 3):
                raise NotImplementedError("1 or 3 components only")
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise NotImplementedError(
                        "sampling factors beyond 2x2 not supported"
                    )
                comps.append((cid, hi, vi, tq))
            dims = (h, w)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError("only baseline sequential (SOF0)")
        elif marker == 0xC4:
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 0x0F
                bits = list(seg[j + 1 : j + 17])
                nval = sum(bits)
                vals = list(seg[j + 17 : j + 17 + nval])
                (ac_tables if tc else dc_tables)[th] = _decode_table(bits, vals)
                j += 17 + nval
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:
            ns = seg[0]
            by_id = {cid: k for k, (cid, _hi, _vi, _tq) in enumerate(comps)}
            for c in range(ns):
                cid, tda = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((by_id[cid], tda >> 4, tda & 0x0F))
            data_start = i + 2 + ln
            break
        i += 2 + ln
    if dims is None or data_start is None:
        raise ValueError("missing SOF0/SOS")
    h, w = dims
    h_max = max(hi for _, hi, _, _ in comps)
    v_max = max(vi for _, _, vi, _ in comps)
    nmx = -(-w // (8 * h_max))  # MCUs across
    nmy = -(-h // (8 * v_max))
    # restart intervals: entropy data is split at RSTn markers into
    # independently byte-aligned segments with fresh DC predictors. A
    # real 0xFF in entropy data is always stuffed (FF 00), so FF D0-D7
    # is unambiguously a restart marker.
    if restart_interval:
        import re as _re

        segments = _re.split(b"\xff[\xd0-\xd7]", b[data_start:])
    else:
        segments = [b[data_start:]]
    seg_iter = iter(segments)
    br = _BitReader(next(seg_iter))
    # per-component block grids: (block_rows, block_cols, 64)
    grids = [
        np.zeros((nmy * vi, nmx * hi, 64), dtype=np.int64)
        for _, hi, vi, _ in comps
    ]
    prev = [0] * len(comps)
    mcu_no = 0
    for my in range(nmy):
        for mx in range(nmx):
            if restart_interval and mcu_no and mcu_no % restart_interval == 0:
                try:
                    br = _BitReader(next(seg_iter))
                except StopIteration:
                    raise ValueError("missing restart marker") from None
                prev = [0] * len(comps)
            mcu_no += 1
            for ci, td, ta in scan:
                _, hi, vi, _ = comps[ci]
                for by in range(vi):
                    for bx in range(hi):
                        blk = grids[ci][my * vi + by, mx * hi + bx]
                        s = _read_code(br, dc_tables[td])
                        prev[ci] += _extend(br.take(s), s)
                        blk[0] = prev[ci]
                        k = 1
                        while k < 64:
                            sym = _read_code(br, ac_tables[ta])
                            if sym == 0x00:
                                break
                            if sym == 0xF0:
                                k += 16
                                continue
                            run, s = sym >> 4, sym & 0x0F
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            blk[k] = _extend(br.take(s), s)
                            k += 1
    planes = []
    for ci, (cid, hi, vi, tq) in enumerate(comps):
        brows, bcols, _ = grids[ci].shape
        blocks = (
            grids[ci].reshape(-1, 64)[:, UNZIGZAG].reshape(-1, 8, 8) * qt[tq]
        ).astype(np.float64)
        spatial = np.einsum("xu,buv,yv->bxy", _M.T, blocks, _M.T) + 128.0
        plane = (
            spatial.reshape(brows, bcols, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(brows * 8, bcols * 8)
        )
        # crop to this component's true resolution, then upsample to full
        ch = -(-h * vi // v_max)
        cw = -(-w * hi // h_max)
        plane = plane[:ch, :cw]
        if vi != v_max or hi != h_max:
            plane = np.repeat(
                np.repeat(plane, v_max // vi, axis=0), h_max // hi, axis=1
            )[:h, :w]
        else:
            plane = plane[:h, :w]
        planes.append(plane)
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    rgb = ycbcr_to_rgb(np.stack(planes, axis=-1))
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)
