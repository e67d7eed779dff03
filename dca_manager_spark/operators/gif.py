"""GIF87a/89a pixel codec, stdlib-only (LZW, public GIF spec).

Completes the image-codec trio (r13 PNG, r14 JPEG → r14 GIF): real
pixel decode for the third container ``parse_image_header`` already
recognizes, with no codec library anywhere.

- ``decode_gif_pixels``: header + logical-screen walk, global/local
  color tables, extension-block skip (0x21), first image descriptor,
  variable-width LSB-first LZW decompression (clear/EOI codes, 4096-
  entry dictionary, the KwKwK corner), interlace passes (8/8, 8/8+4,
  4/2, 2/1), palette mapping to interleaved RGB. Loud (ValueError) on
  bad magic, truncated sub-blocks, out-of-range codes, missing color
  table, index past palette, or a stream ending before EOI/trailer.
- ``encode_gif``: the matching writer — real LZW compression with
  dictionary reset at 4096, optional interlace, arbitrary power-of-two
  palettes — so the decoder is exercised against every feature it
  claims (same encoder/decoder pairing as encode_png /
  encode_jpeg_baseline).
- ``gif_pixels``: the mapInPandas Spark stage, same contract as
  png_pixels / jpeg_pixels.

GIF is LOSSLESS (palette indices round-trip exactly), so the oracle
query plants a closed-form index pattern and a closed-form palette and
recomputes every decoded RGB sample in SQL — no exactness trick needed,
unlike JPEG's block-constant cards.

Reference parity: the reference repo has no media path; this belongs to
the training-data-pipeline multimodal surface the build brief makes
first-class.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (start row, step)


def _interlace_order(height: int) -> list[int]:
    """Row order in which an interlaced GIF stores the image."""
    return [
        y for start, step in _INTERLACE_PASSES for y in range(start, height, step)
    ]


def encode_gif(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    indices: bytes,
    *,
    interlace: bool = False,
    version: bytes = b"89a",
) -> bytes:
    """Minimal single-frame GIF writer. ``palette`` length must be a
    power of two in [2, 256]; ``indices`` is row-major ``height x
    width`` palette indices. Real LZW compression (variable code
    width, dictionary reset at 4096 entries)."""
    n = len(palette)
    if n < 2 or n > 256 or n & (n - 1):
        raise ValueError(f"palette size must be a power of two in [2,256], got {n}")
    if len(indices) != width * height:
        raise ValueError(
            f"index buffer is {len(indices)} bytes, expected "
            f"{height}x{width} = {width * height}"
        )
    if max(indices, default=0) >= n:
        raise ValueError("palette index out of range")
    depth = max(1, (n - 1).bit_length())
    out = bytearray(b"GIF" + version)
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | (depth - 1) << 4 | (depth - 1), 0, 0])  # GCT flag
    for r, g, b in palette:
        out += bytes([r, g, b])
    out += b"\x2c" + (0).to_bytes(2, "little") * 2
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x40 if interlace else 0x00])  # no local table

    if interlace:
        rows = _interlace_order(height)
        data = b"".join(indices[y * width:(y + 1) * width] for y in rows)
    else:
        data = indices

    mcs = max(2, depth)  # LZW minimum code size
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    out += bytes([mcs])

    # LZW compress, codes packed LSB-first
    bitbuf = bitlen = 0
    packed = bytearray()

    def emit(code: int, size: int) -> None:
        nonlocal bitbuf, bitlen
        bitbuf |= code << bitlen
        bitlen += size
        while bitlen >= 8:
            packed.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitlen -= 8

    # The code WIDTH must track the DECODER's table, not the encoder's:
    # the decoder grows its table one code behind (it learns an entry
    # only from the following code) and still adds an entry on the
    # FINAL data code, where the encoder's flush adds none — so an
    # independent encoder-side counter desyncs the width exactly when
    # a flush straddles a 2^size boundary (observed: EOI written at
    # width s, read at s+1). Mirror the decoder's bookkeeping
    # (dec_len/first-code flag) and emit every code at ITS width.
    base_len = (1 << mcs) + 2
    table = {bytes([i]): i for i in range(1 << mcs)}
    next_code = eoi + 1
    dec_len = base_len
    size = mcs + 1
    first = True  # decoder adds no entry on the first code after clear

    def emit_data(code: int) -> None:
        nonlocal dec_len, size, first
        emit(code, size)
        if not first and dec_len < 4096:
            dec_len += 1
            if dec_len == (1 << size) and size < 12:
                size += 1
        first = False

    emit(clear, size)
    seq = b""
    for byte in data:
        cand = seq + bytes([byte])
        if cand in table:
            seq = cand
            continue
        emit_data(table[seq])
        if next_code < 4096:  # 12-bit codes: 0..4095
            table[cand] = next_code
            next_code += 1
        else:
            emit(clear, size)
            table = {bytes([i]): i for i in range(1 << mcs)}
            next_code = eoi + 1
            dec_len = base_len
            size = mcs + 1
            first = True
        seq = bytes([byte])
    if seq:
        emit_data(table[seq])
    emit(eoi, size)
    if bitlen:
        packed.append(bitbuf & 0xFF)

    for i in range(0, len(packed), 255):
        block = packed[i:i + 255]
        out += bytes([len(block)]) + block
    out += b"\x00\x3b"  # block terminator + trailer
    return bytes(out)


def decode_gif_pixels(content: bytes) -> tuple[int, int, int, bytes]:
    """Decode the FIRST frame of a GIF to interleaved RGB. Returns
    (width, height, 3, row-major ``height x width x 3`` bytes —
    deinterlaced if the frame is interlaced). Loud on every corruption
    the docstring lists; later frames/animation are out of scope (the
    metadata path reports only logical-screen dims too)."""
    b = bytes(content) if content is not None else b""
    if len(b) < 13 or b[:4] != b"GIF8" or b[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF (bad magic)")
    flags = b[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        if pos + 3 * n > len(b):
            raise ValueError("truncated GIF global color table")
        gct = [(b[pos + 3 * i], b[pos + 3 * i + 1], b[pos + 3 * i + 2])
               for i in range(n)]
        pos += 3 * n

    def skip_subblocks(p: int) -> int:
        while True:
            if p >= len(b):
                raise ValueError("truncated GIF sub-blocks")
            ln = b[p]
            p += 1
            if ln == 0:
                return p
            p += ln
            if p > len(b):
                raise ValueError("truncated GIF sub-block payload")

    while True:
        if pos >= len(b):
            raise ValueError("GIF ended before any image descriptor")
        block = b[pos]
        pos += 1
        if block == 0x3B:
            raise ValueError("GIF trailer before any image descriptor")
        if block == 0x21:  # extension: label + sub-blocks
            if pos >= len(b):
                raise ValueError("truncated GIF extension")
            pos = skip_subblocks(pos + 1)
            continue
        if block == 0x2C:
            break
        raise ValueError(f"unknown GIF block 0x{block:02x} at offset {pos - 1}")

    if pos + 9 > len(b):
        raise ValueError("truncated GIF image descriptor")
    width = int.from_bytes(b[pos + 4:pos + 6], "little")
    height = int.from_bytes(b[pos + 6:pos + 8], "little")
    iflags = b[pos + 8]
    pos += 9
    table = gct
    if iflags & 0x80:
        n = 2 << (iflags & 0x07)
        if pos + 3 * n > len(b):
            raise ValueError("truncated GIF local color table")
        table = [(b[pos + 3 * i], b[pos + 3 * i + 1], b[pos + 3 * i + 2])
                 for i in range(n)]
        pos += 3 * n
    if table is None:
        raise ValueError("GIF frame has no color table (global or local)")
    interlaced = bool(iflags & 0x40)

    if pos >= len(b):
        raise ValueError("truncated GIF: missing LZW minimum code size")
    mcs = b[pos]
    pos += 1
    if not (2 <= mcs <= 11):
        raise ValueError(f"invalid GIF LZW minimum code size {mcs}")

    # concatenate data sub-blocks
    data = bytearray()
    while True:
        if pos >= len(b):
            raise ValueError("truncated GIF image data")
        ln = b[pos]
        pos += 1
        if ln == 0:
            break
        if pos + ln > len(b):
            raise ValueError("truncated GIF data sub-block")
        data += b[pos:pos + ln]
        pos += ln

    clear, eoi = 1 << mcs, (1 << mcs) + 1
    dict_init = [bytes([i]) for i in range(1 << mcs)] + [b"", b""]
    codes = list(dict_init)
    size = mcs + 1
    out = bytearray()
    prev: bytes | None = None
    bitbuf = bitlen = 0
    di = 0
    ended = False
    while not ended:
        while bitlen < size:
            if di >= len(data):
                raise ValueError("GIF LZW stream ended before EOI code")
            bitbuf |= data[di] << bitlen
            di += 1
            bitlen += 8
        code = bitbuf & ((1 << size) - 1)
        bitbuf >>= size
        bitlen -= size
        if code == clear:
            codes = list(dict_init)
            size = mcs + 1
            prev = None
            continue
        if code == eoi:
            ended = True
            continue
        if code < len(codes):
            entry = codes[code]
        elif code == len(codes) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} out of range")
        out += entry
        if prev is not None and len(codes) < 4096:
            codes.append(prev + entry[:1])
            if len(codes) == (1 << size) and size < 12:
                size += 1
        prev = entry
    if len(out) != width * height:
        raise ValueError(
            f"GIF pixel data is {len(out)} indices, expected "
            f"{width}x{height} = {width * height}"
        )

    if interlaced:
        ordered = bytearray(len(out))
        for src, y in enumerate(_interlace_order(height)):
            ordered[y * width:(y + 1) * width] = out[src * width:(src + 1) * width]
        out = ordered

    npal = len(table)
    rgb = bytearray(width * height * 3)
    for i, idx in enumerate(out):
        if idx >= npal:
            raise ValueError(f"GIF pixel index {idx} past palette size {npal}")
        r, g, bl = table[idx]
        rgb[3 * i] = r
        rgb[3 * i + 1] = g
        rgb[3 * i + 2] = bl
    return width, height, 3, bytes(rgb)


GIF_PIXELS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
        T.StructField("channels", T.LongType(), True),
        T.StructField("pixels", T.ArrayType(T.LongType()), True),
    ]
)


def gif_pixels(
    df: DataFrame,
    content_col: str = "content",
    id_col: str = "media_id",
) -> DataFrame:
    """GIF sibling of png_pixels / jpeg_pixels: Arrow-batched
    mapInPandas decode to a samples array; stats stay JVM-side in the
    caller. Decode failures raise — no silent null-fill."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in
                    ("media_id", "width", "height", "channels", "pixels")}
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                w, h, ch, raw = decode_gif_pixels(content)
                rows["media_id"].append(mid)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(ch)
                rows["pixels"].append(list(raw))
            yield pd.DataFrame(rows)

    return df.mapInPandas(_decode, schema=GIF_PIXELS_SCHEMA)
