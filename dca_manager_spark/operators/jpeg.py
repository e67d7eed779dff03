"""Baseline-sequential JPEG codec, stdlib + numpy only (ITU-T.81).

The r13 honest gap was JPEG *pixel* decode (headers parsed, pixels
stubbed) — real multimodal corpora are JPEG-first, so this module
implements the baseline DCT process end to end with no codec library:

- ``decode_jpeg_baseline``: full marker walk (DQT/DHT/SOF0/DRI/SOS,
  APP14 Adobe color-transform flag), entropy decode with byte
  stuffing and restart markers, Huffman DC-differential + AC
  run/size coding, dequantize, dezigzag, 8x8 IDCT (numpy matrix
  form), chroma upsampling for sampling factors {1,2}x{1,2},
  YCbCr->RGB unless grayscale or Adobe transform=0 says the
  components are raw, level clamp, edge crop. Everything the
  baseline process needs and nothing silent: progressive (SOF2),
  arithmetic coding, 12-bit precision, 16-bit quant tables,
  unsupported sampling factors, truncated scans and malformed
  markers all raise ValueError.
- ``encode_jpeg_baseline``: the matching writer (quality-scaled or
  custom quant tables, standard Annex K Huffman tables, 4:4:4 or
  4:2:0, optional restart intervals, optional Adobe APP14 so
  3-component images can carry raw RGB) — exists so the decoder can
  be exercised against every feature it claims, the same
  encoder/decoder pairing strategy as operators/multimodal.encode_png.
- ``jpeg_pixels`` / ``jpeg_image_decoder``: the Spark plumbing —
  mapInPandas Arrow-batched decode to a samples array, and a real
  decode-backed feature vector for ``extract_features``.

Exactness corner the oracle query rides on (plans/queries.py
``multimodal_jpeg_pixels``): a block-constant test card (every 8x8
tile one value) has EXACTLY one nonzero DCT coefficient — the DC —
so with all-ones quant tables the lossy pipeline is bit-exact and a
SQL oracle can recompute every decoded sample closed-form with
floor(x/8) arithmetic. The AC/zigzag/subsampling/restart paths are
pinned by tests/test_multimodal.py against an independent float
reference and planted-constant MCUs.

Reference parity: the reference repo has no media path at all; this
belongs to the training-data-pipeline surface the build brief makes
first-class (multimodal decode stage).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# -- public Annex K tables (ITU-T.81, K.1/K.2) ---------------------------

STD_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

STD_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K.3-K.5 Huffman specs: (BITS[1..16], HUFFVAL)
STD_HUFF_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_HUFF_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
STD_HUFF_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
STD_HUFF_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# zigzag order: index i of the scan -> (row, col) flat offset
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# 1-D DCT-II basis matrix M[u, n] = C(u)/2 * cos((2n+1) u pi / 16):
# forward coef = M @ block @ M.T, inverse block = M.T @ coef @ M.
_M = np.array(
    [
        [
            (np.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * np.cos((2 * n + 1) * u * np.pi / 16.0)
            for n in range(8)
        ]
        for u in range(8)
    ]
)


def _build_huffman_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical per ITU-T.81 C.2."""
    codes: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _build_huffman_lut(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(code, length) -> value, for the decoder's bit-at-a-time walk."""
    return {
        (code, length): v
        for v, (code, length) in _build_huffman_codes(bits, vals).items()
    }


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC diff / AC coefficient value —
    negative values store value-1 in category low bits (F.1.2.1)."""
    if v == 0:
        return 0, 0
    cat = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return cat, v if v > 0 else v + (1 << cat) - 1


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill


def _seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload


def scale_quant_table(base: list[int], quality: int) -> list[int]:
    """IJG-style quality scaling (public libjpeg formula): 50 = base
    tables, 100 -> all ones, 1 -> coarsest. Clamps to [1, 255]."""
    if not (1 <= quality <= 100):
        raise ValueError(f"quality must be in [1, 100], got {quality}")
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return [max(1, min(255, (q * s + 50) // 100)) for q in base]


def encode_jpeg_baseline(
    width: int,
    height: int,
    ncomp: int,
    pixels: bytes,
    *,
    quality: int | None = None,
    quant_luma: list[int] | None = None,
    quant_chroma: list[int] | None = None,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
    adobe_rgb: bool = False,
) -> bytes:
    """Baseline-sequential JPEG writer. ``pixels`` is row-major
    interleaved ``height x width x ncomp`` bytes (ncomp 1 or 3).

    3-component input is converted RGB->YCbCr (BT.601, the JFIF
    convention) unless ``adobe_rgb=True``, which emits an Adobe APP14
    marker with transform=0 and stores the components UNCONVERTED —
    the spec-legal path a bit-exact round trip needs (color-space
    rounding is otherwise lossy by construction). ``subsampling`` is
    "4:4:4" or "4:2:0" (chroma box-averaged over 2x2). ``quality``
    scales the Annex K tables (IJG formula); explicit quant tables
    override. All-ones tables + block-constant input -> bit-exact
    decode (see module doc)."""
    if ncomp not in (1, 3):
        raise ValueError(f"ncomp must be 1 or 3, got {ncomp}")
    if len(pixels) != width * height * ncomp:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, expected "
            f"{height}x{width}x{ncomp} = {width * height * ncomp}"
        )
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"subsampling must be '4:4:4' or '4:2:0', got {subsampling!r}")
    if subsampling == "4:2:0" and ncomp == 1:
        subsampling = "4:4:4"  # grayscale has no chroma to subsample
    # `is not None`, not truthiness: quality=0 must hit the loud [1,100]
    # validation in scale_quant_table, never silently alias quality=None
    qly = list(quant_luma or (
        scale_quant_table(STD_QUANT_LUMA, quality)
        if quality is not None else STD_QUANT_LUMA
    ))
    qch = list(quant_chroma or (
        scale_quant_table(STD_QUANT_CHROMA, quality)
        if quality is not None else STD_QUANT_CHROMA
    ))

    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, ncomp)
    planes: list[np.ndarray] = []
    if ncomp == 1:
        planes = [arr[:, :, 0].astype(np.float64)]
    elif adobe_rgb:
        planes = [arr[:, :, c].astype(np.float64) for c in range(3)]
    else:
        r = arr[:, :, 0].astype(np.float64)
        g = arr[:, :, 1].astype(np.float64)
        b = arr[:, :, 2].astype(np.float64)
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, np.clip(cb, 0, 255), np.clip(cr, 0, 255)]

    # sampling factors per component (h, v)
    if ncomp == 1:
        samp = [(1, 1)]
    elif subsampling == "4:4:4":
        samp = [(1, 1)] * 3
    else:
        samp = [(2, 2), (1, 1), (1, 1)]
    hmax = max(h for h, _ in samp)
    vmax = max(v for _, v in samp)

    comp_planes = []
    for ci, plane in enumerate(planes):
        h_i, v_i = samp[ci]
        if (h_i, v_i) != (hmax, vmax):
            # box-average downsample by (hmax/h, vmax/v) with edge
            # replication to even dims first
            fy, fx = vmax // v_i, hmax // h_i
            ph = -plane.shape[0] % fy
            pw = -plane.shape[1] % fx
            p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
            p = p.reshape(p.shape[0] // fy, fy, p.shape[1] // fx, fx)
            plane = p.mean(axis=(1, 3))
        comp_planes.append(plane)

    # pad each plane to a whole number of blocks ALIGNED to the MCU grid
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-width // mcu_w)
    mcus_y = -(-height // mcu_h)
    blocks: list[np.ndarray] = []
    for ci, plane in enumerate(comp_planes):
        h_i, v_i = samp[ci]
        th, tw = mcus_y * 8 * v_i, mcus_x * 8 * h_i
        p = np.pad(
            plane,
            ((0, th - plane.shape[0]), (0, tw - plane.shape[1])),
            mode="edge",
        )
        blocks.append(p)

    qtabs = [qly] + ([qch] if ncomp == 3 else [])
    comp_qsel = [0] + [1, 1][: max(0, ncomp - 1)]
    dc_specs = [STD_HUFF_DC_LUMA] + (
        [STD_HUFF_DC_CHROMA] if ncomp == 3 else []
    )
    ac_specs = [STD_HUFF_AC_LUMA] + (
        [STD_HUFF_AC_CHROMA] if ncomp == 3 else []
    )
    comp_hsel = comp_qsel
    dc_codes = [_build_huffman_codes(*s) for s in dc_specs]
    ac_codes = [_build_huffman_codes(*s) for s in ac_specs]

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x48\x00\x48\x00\x00")
    if adobe_rgb and ncomp == 3:
        # Adobe APP14, transform byte 0 = components are raw (RGB)
        out += _seg(0xEE, b"Adobe\x00\x64\x00\x00\x00\x00\x00")
    for ti, q in enumerate(qtabs):
        out += _seg(0xDB, bytes([ti]) + bytes(q[ZIGZAG[i]] for i in range(64)))
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([ncomp])
    for ci in range(ncomp):
        h_i, v_i = samp[ci]
        sof += bytes([ci + 1, (h_i << 4) | v_i, comp_qsel[ci]])
    out += _seg(0xC0, sof)
    for ti, spec in enumerate(dc_specs):
        out += _seg(0xC4, bytes([ti]) + bytes(spec[0]) + bytes(spec[1]))
    for ti, spec in enumerate(ac_specs):
        out += _seg(0xC4, bytes([0x10 | ti]) + bytes(spec[0]) + bytes(spec[1]))
    if restart_interval:
        out += _seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, (comp_hsel[ci] << 4) | comp_hsel[ci]])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    w = _BitWriter()
    pred = [0] * ncomp
    qarrs = [
        np.array(qtabs[comp_qsel[ci]], dtype=np.float64).reshape(8, 8)
        for ci in range(ncomp)
    ]
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                w.pad_to_byte()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * ncomp
            for ci in range(ncomp):
                h_i, v_i = samp[ci]
                for by in range(v_i):
                    for bx in range(h_i):
                        y0 = (my * v_i + by) * 8
                        x0 = (mx * h_i + bx) * 8
                        blk = blocks[ci][y0:y0 + 8, x0:x0 + 8] - 128.0
                        coef = _M @ blk @ _M.T
                        q = np.rint(coef / qarrs[ci]).astype(np.int64)
                        zz = [int(q.flat[ZIGZAG[i]]) for i in range(64)]
                        cat, bitsv = _magnitude(zz[0] - pred[ci])
                        pred[ci] = zz[0]
                        c, ln = dc_codes[comp_hsel[ci]][cat]
                        w.write(c, ln)
                        if cat:
                            w.write(bitsv, cat)
                        run = 0
                        actab = ac_codes[comp_hsel[ci]]
                        for k in range(1, 64):
                            if zz[k] == 0:
                                run += 1
                                continue
                            while run > 15:
                                c, ln = actab[0xF0]  # ZRL
                                w.write(c, ln)
                                run -= 16
                            cat, bitsv = _magnitude(zz[k])
                            c, ln = actab[(run << 4) | cat]
                            w.write(c, ln)
                            w.write(bitsv, cat)
                            run = 0
                        if run:
                            c, ln = actab[0x00]  # EOB
                            w.write(c, ln)
            mcu_index += 1
    w.pad_to_byte()
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-segment bit reader: unstuffs FF00, stops AT restart /
    terminating markers (the caller consumes them)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy segment")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            elif nxt is None:
                raise ValueError("truncated JPEG entropy segment")
            else:
                # a real marker: decoder hit it mid-symbol
                raise ValueError(
                    f"JPEG entropy data ended at marker FF{nxt:02X} mid-decode"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if not self.n:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def align_and_expect_restart(self, idx: int) -> None:
        self.n = 0  # drop pad bits
        if (
            self.pos + 2 > len(self.data)
            or self.data[self.pos] != 0xFF
            or self.data[self.pos + 1] != 0xD0 + (idx % 8)
        ):
            got = self.data[self.pos:self.pos + 2].hex()
            raise ValueError(
                f"expected restart marker RST{idx % 8}, got 0x{got}"
            )
        self.pos += 2


def _huff_decode(reader: _BitReader, lut: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.bit()
        length += 1
        v = lut.get((code, length))
        if v is not None:
            return v
    raise ValueError("invalid JPEG Huffman code (no match within 16 bits)")


def _extend(v: int, cat: int) -> int:
    """Inverse of _magnitude (F.2.2.1 EXTEND)."""
    return v if v >= (1 << (cat - 1)) else v - (1 << cat) + 1


def decode_jpeg_baseline(content: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline-sequential JPEG to raw interleaved samples.
    Returns (width, height, ncomp, row-major ``height x width x ncomp``
    bytes — grayscale or RGB). Loud (ValueError) on: progressive /
    extended / arithmetic SOFs, 12-bit precision, 16-bit quant tables,
    sampling factors outside {1,2}, missing tables, truncated or
    malformed segments, bad restart markers."""
    b = bytes(content) if content is not None else b""
    if len(b) < 2 or b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    dc_luts: dict[int, dict] = {}
    ac_luts: dict[int, dict] = {}
    sof = None
    restart_interval = 0
    adobe_transform: int | None = None
    UNSUPPORTED_SOF = {
        0xC2: "progressive DCT (SOF2)",
        0xC1: None,  # extended sequential, Huffman: same layout as SOF0
        0xC3: "lossless (SOF3)",
        0xC5: "differential sequential (SOF5)",
        0xC6: "differential progressive (SOF6)",
        0xC7: "differential lossless (SOF7)",
        0xC9: "arithmetic sequential (SOF9)",
        0xCA: "arithmetic progressive (SOF10)",
        0xCB: "arithmetic lossless (SOF11)",
        0xCD: "differential arithmetic sequential (SOF13)",
        0xCE: "differential arithmetic progressive (SOF14)",
        0xCF: "differential arithmetic lossless (SOF15)",
    }
    while True:
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG: no SOS before EOF")
        if b[pos] != 0xFF:
            raise ValueError(f"corrupt JPEG: no marker at offset {pos}")
        while pos + 1 < len(b) and b[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        if pos + 1 >= len(b):
            # stream ends in fill bytes — truncated, and the contract is
            # ValueError for every malformed payload, never IndexError
            raise ValueError("truncated JPEG: stream ends in fill bytes")
        marker = b[pos + 1]
        pos += 2
        if marker == 0xD9:
            raise ValueError("JPEG ended (EOI) before any scan")
        if marker in (0x01, *range(0xD0, 0xD8)):
            continue  # standalone
        if pos + 2 > len(b):
            raise ValueError("truncated JPEG segment header")
        seg_len = int.from_bytes(b[pos:pos + 2], "big")
        seg = b[pos + 2:pos + seg_len]
        if len(seg) != seg_len - 2:
            raise ValueError("truncated JPEG segment payload")
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0x0F
                if pq != 0:
                    raise ValueError(
                        "16-bit quantization tables are not baseline (Pq=1)"
                    )
                if i + 65 > len(seg):
                    raise ValueError("truncated DQT table")
                tab = np.zeros(64, dtype=np.float64)
                for k in range(64):
                    tab[ZIGZAG[k]] = seg[i + 1 + k]
                qtabs[tq] = tab.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT — possibly several tables
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1:i + 17])
                if len(bits) != 16:
                    raise ValueError("truncated DHT table (BITS array)")
                n = sum(bits)
                vals = list(seg[i + 17:i + 17 + n])
                if len(vals) != n:
                    raise ValueError("truncated DHT table")
                lut = _build_huffman_lut(bits, vals)
                (dc_luts if tc == 0 else ac_luts)[th] = lut
                i += 17 + n
        elif marker in (0xC0, 0xC1):
            precision = seg[0]
            if precision != 8:
                raise ValueError(
                    f"unsupported JPEG sample precision {precision} (8 only)"
                )
            height = int.from_bytes(seg[1:3], "big")
            width = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {ncomp}")
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                h_i, v_i = hv >> 4, hv & 0x0F
                if h_i not in (1, 2) or v_i not in (1, 2):
                    raise ValueError(
                        f"unsupported sampling factors {h_i}x{v_i} "
                        "(1 and 2 only)"
                    )
                comps.append({"id": cid, "h": h_i, "v": v_i, "tq": tq})
            sof = {"w": width, "h": height, "comps": comps}
        elif marker in UNSUPPORTED_SOF and UNSUPPORTED_SOF[marker]:
            raise ValueError(f"unsupported JPEG process: {UNSUPPORTED_SOF[marker]}")
        elif marker == 0xDD:
            restart_interval = int.from_bytes(seg[:2], "big")
        elif marker == 0xEE and seg[:5] == b"Adobe":
            adobe_transform = seg[11] if len(seg) >= 12 else None
        elif marker == 0xDA:
            if sof is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan_sel = []
            for si in range(ns):
                cs, tdta = seg[1 + 2 * si:3 + 2 * si]
                scan_sel.append((cs, tdta >> 4, tdta & 0x0F))
            pos += seg_len
            break
        pos += seg_len

    comps = sof["comps"]
    width, height = sof["w"], sof["h"]
    ncomp = len(comps)
    if len(scan_sel) != ncomp:
        raise ValueError("multi-scan JPEGs unsupported (baseline interleaved only)")
    by_id = {c["id"]: c for c in comps}
    order = []
    for cs, td, ta in scan_sel:
        if cs not in by_id:
            raise ValueError(f"SOS references unknown component id {cs}")
        c = by_id[cs]
        if c["tq"] not in qtabs:
            raise ValueError(f"missing quantization table {c['tq']}")
        if td not in dc_luts or ta not in ac_luts:
            raise ValueError(f"missing Huffman table (DC {td} / AC {ta})")
        order.append({**c, "dc": dc_luts[td], "ac": ac_luts[ta],
                      "q": qtabs[c["tq"]]})

    if len(order) == 1:
        # Single-component scans are NON-INTERLEAVED per ITU-T.81
        # (A.2.2): the MCU is ONE 8x8 data unit in raster order and the
        # declared sampling factors do not apply — a grayscale file
        # carrying h=v=2 (e.g. a color JPEG converted with its factors
        # left in place) must decode as plain raster blocks, not be
        # scrambled into (or spuriously fail) a 2x2-MCU walk.
        order[0] = {**order[0], "h": 1, "v": 1}

    hmax = max(c["h"] for c in order)
    vmax = max(c["v"] for c in order)
    mcus_x = -(-width // (8 * hmax))
    mcus_y = -(-height // (8 * vmax))
    planes = [
        np.zeros((mcus_y * 8 * c["v"], mcus_x * 8 * c["h"]), dtype=np.float64)
        for c in order
    ]
    reader = _BitReader(b, pos)
    pred = [0] * ncomp
    rst_idx = 0
    for m in range(mcus_x * mcus_y):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_and_expect_restart(rst_idx)
            rst_idx += 1
            pred = [0] * ncomp
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(order):
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.float64)
                    cat = _huff_decode(reader, c["dc"])
                    diff = _extend(reader.bits(cat), cat) if cat else 0
                    pred[ci] += diff
                    zz[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = _huff_decode(reader, c["ac"])
                        run, cat = rs >> 4, rs & 0x0F
                        if cat == 0:
                            if run == 15:
                                k += 16  # ZRL
                                continue
                            break  # EOB
                        k += run
                        if k > 63:
                            raise ValueError("JPEG AC run past end of block")
                        zz[k] = _extend(reader.bits(cat), cat)
                        k += 1
                    coef = np.zeros(64, dtype=np.float64)
                    coef[ZIGZAG] = zz
                    coef = coef.reshape(8, 8) * c["q"]
                    blk = _M.T @ coef @ _M + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = blk
    # upsample to full resolution (sample replication), crop
    full = []
    for ci, c in enumerate(order):
        p = planes[ci]
        if c["h"] != hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] != vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        full.append(p[:height, :width])
    if ncomp == 1:
        out = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    if adobe_transform == 0:
        rgb = np.stack(full, axis=-1)
    else:  # JFIF YCbCr -> RGB (BT.601)
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        rgb = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=-1,
        )
    out = np.clip(np.rint(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, out.tobytes()


JPEG_PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("channels", T.LongType(), True),
        T.StructField("pixels", T.ArrayType(T.LongType()), True),
    ]
)


def jpeg_pixels(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """JPEG twin of operators/multimodal.png_pixels: Arrow-batched
    mapInPandas decode to a samples array; stats stay JVM-side
    (F.aggregate / array_min / array_max in the caller). Decode
    failures raise (task error) — no silent null-fill. 100-TB shape:
    repartition_by_bytes -> this stage -> codegen aggregates."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("media_id", "width", "height", "channels", "pixels")}
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                w, h, ch, raw = decode_jpeg_baseline(content)
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["pixels"].append(list(raw))
            yield pd.DataFrame(rows)

    return df.mapInPandas(_decode, schema=JPEG_PIXELS_SCHEMA)


def jpeg_image_decoder(content: bytes) -> list[float]:
    """Decode-backed feature vector for JPEG content (drop-in
    ``decoder`` for operators/multimodal.extract_features): per-channel
    mean sample (RGBA-aligned, absent channels 0.0) + dims + channel
    count — same contract as png_image_decoder."""
    width, height, ch, raw = decode_jpeg_baseline(content)
    n_px = width * height
    arr = np.frombuffer(raw, dtype=np.uint8).reshape(n_px, ch)
    means = [float(m) / 255.0 for m in arr.mean(axis=0)] + [0.0] * (4 - ch)
    return means + [float(width), float(height), float(ch)]
