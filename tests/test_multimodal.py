"""Multimodal plumbing tests: schema, Arrow-batched extraction with the
deterministic fake decoder, stub behavior, frame-sample plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dca_manager_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    extract_features,
    fake_image_decoder,
    frame_sample_plan,
    repartition_by_bytes,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytes(range(64)), ("image", "png", 8, 8, None, None)),
        (2, b"\x00" * 100, ("image", "png", 10, 10, None, None)),
        (3, None, ("image", "png", None, None, None, None)),
        (4, b"vid", ("video", "mp4", 640, 480, 3500, None)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decoder_stub_raises(media):
    with pytest.raises(NotImplementedError, match="decoder"):
        extract_features(media, decoder=None)


def test_extract_features_fake_decoder(media):
    out = {r.media_id: r for r in extract_features(media, fake_image_decoder).collect()}
    assert out[1].n_bytes == 64
    # 64 bytes 0..63 -> uniform histogram: 4/64 per bucket
    assert all(abs(v - 0.0625) < 1e-6 for v in out[1].feature)
    assert out[2].feature[0] == 1.0 and sum(out[2].feature) == 1.0
    assert out[3].n_bytes == 0 and out[3].feature == []


def test_repartition_by_bytes(media):
    df = repartition_by_bytes(media, target_partition_bytes=100)
    # 167 payload bytes / 100 -> 2 partitions
    assert df.rdd.getNumPartitions() == 2


def test_frame_sample_plan(media):
    frames = frame_sample_plan(media, every_ms=1000).collect()
    assert {r.media_id for r in frames} == {4}
    assert sorted(r.frame_ts_ms for r in frames) == [0, 1000, 2000, 3000]


def test_parse_image_header_formats_and_truncation():
    """Real header layouts round-trip exactly; recognized-but-truncated
    payloads fail LOUDLY; unknown payloads yield nulls."""
    import pytest

    from dca_manager_spark.operators.multimodal import parse_image_header

    png = (b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\x0dIHDR"
           + (640).to_bytes(4, "big") + (480).to_bytes(4, "big")
           + b"\x08\x06\x00\x00\x00")
    assert parse_image_header(png) == ("png", 640, 480)

    gif = (b"GIF89a" + (320).to_bytes(2, "little")
           + (200).to_bytes(2, "little") + b"\xf7\x00\x00")
    assert parse_image_header(gif) == ("gif", 320, 200)

    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
    sof0 = (b"\xff\xc0\x00\x11\x08" + (1080).to_bytes(2, "big")
            + (1920).to_bytes(2, "big") + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01")
    assert parse_image_header(b"\xff\xd8" + app0 + sof0) == ("jpeg", 1920, 1080)

    assert parse_image_header(None) == (None, None, None)
    assert parse_image_header(b"not an image") == (None, None, None)

    with pytest.raises(ValueError, match="truncated PNG"):
        parse_image_header(png[:20])
    with pytest.raises(ValueError, match="truncated GIF"):
        parse_image_header(gif[:8])
    with pytest.raises(ValueError, match="no SOF"):
        parse_image_header(b"\xff\xd8" + app0)  # headers end before SOF
    with pytest.raises(ValueError, match="corrupt PNG"):
        parse_image_header(png[:12] + b"XXXX" + png[16:])


def test_jvm_blobs_parse_back_exactly(spark):
    """The JVM-expression blob builders and the Python parser agree on
    every byte: build blobs for assorted dims (incl. >255 to exercise
    both endiannesses and multi-byte values), parse, compare."""
    from pyspark.sql import functions as F

    from dca_manager_spark.operators.multimodal import (
        gif_blob_col,
        image_dims,
        jpeg_blob_col,
        png_blob_col,
    )

    rows = [(i, w, h) for i, (w, h) in enumerate(
        [(1, 1), (255, 256), (257, 499), (999, 65535), (640, 480)]
    )]
    df = spark.createDataFrame(rows, "i int, w int, h int")
    media = df.select(
        "i", "w", "h",
        F.when(F.col("i") % 3 == 0, png_blob_col(F.col("w"), F.col("h")))
        .when(F.col("i") % 3 == 1, gif_blob_col(F.col("w"), F.col("h")))
        .otherwise(jpeg_blob_col(F.col("w"), F.col("h")))
        .alias("content"),
    )
    got = image_dims(media, "content").select("i", "w", "h", "img.*").collect()
    fmts = {0: "png", 1: "gif", 2: "jpeg"}
    for r in got:
        assert r["format"] == fmts[r["i"] % 3]
        assert (r["width"], r["height"]) == (r["w"], r["h"]), r


def test_parse_wav_header_walk_and_truncation():
    import pytest

    from dca_manager_spark.operators.multimodal import parse_wav_header

    def le(x, n):
        return int(x).to_bytes(n, "little")

    ch, sr, bits, frames = 2, 44100, 16, 44100 * 3  # 3 seconds stereo
    block = ch * bits // 8
    data_size = frames * block
    fmt = b"fmt " + le(16, 4) + le(1, 2) + le(ch, 2) + le(sr, 4) \
        + le(sr * block, 4) + le(block, 2) + le(bits, 2)
    junk = b"JUNK" + le(4, 4) + b"\x00" * 4
    wav = (b"RIFF" + le(36 + data_size, 4) + b"WAVE"
           + junk + fmt + b"data" + le(data_size, 4))
    assert parse_wav_header(wav) == ("wav", 2, 44100, 16, 3000)

    assert parse_wav_header(b"not riff") == (None,) * 5
    assert parse_wav_header(None) == (None,) * 5
    with pytest.raises(ValueError, match="no fmt chunk"):
        parse_wav_header(b"RIFF" + le(4, 4) + b"WAVE")
    with pytest.raises(ValueError, match="truncated WAV fmt"):
        parse_wav_header(b"RIFF" + le(100, 4) + b"WAVE" + b"fmt " + le(16, 4) + b"\x01\x00")
    with pytest.raises(ValueError, match="no data chunk"):
        parse_wav_header(b"RIFF" + le(36, 4) + b"WAVE" + fmt)


def test_wav_blob_round_trip(spark):
    from pyspark.sql import functions as F

    from dca_manager_spark.operators.multimodal import audio_meta, wav_blob_col

    rows = [(1, 1, 8000, 8000), (2, 2, 44100, 132300), (3, 1, 16000, 1)]
    df = spark.createDataFrame(rows, "i int, ch int, sr int, frames long")
    media = df.select(
        "i", "ch", "sr", "frames",
        wav_blob_col(F.col("ch"), F.col("sr"), F.lit(16), F.col("frames")).alias("content"),
    )
    got = audio_meta(media, "content").select("i", "ch", "sr", "frames", "audio.*").collect()
    for r in got:
        assert r["format"] == "wav"
        assert r["channels"] == r["ch"]
        assert r["sample_rate"] == r["sr"]
        assert r["bits"] == 16
        block = r["ch"] * 2
        assert r["duration_ms"] == r["frames"] * block * 1000 // (r["sr"] * block)


def test_jpeg_walk_handles_fill_bytes_and_standalone_markers():
    """Review finding (r9): spec-legal FF padding between segments and
    length-less standalone markers (TEM, RSTn) must not derail the SOF
    walk."""
    from dca_manager_spark.operators.multimodal import parse_image_header

    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
    sof0 = (b"\xff\xc0\x00\x11\x08" + (480).to_bytes(2, "big")
            + (640).to_bytes(2, "big") + b"\x03\x01\x11\x00\x02\x11\x01\x03\x11\x01")
    # FF fill bytes before APP0 and before SOF0, plus a TEM standalone
    blob = (b"\xff\xd8" + b"\xff\xff" + app0 + b"\xff\x01"
            + b"\xff\xff\xff" + sof0)
    assert parse_image_header(blob) == ("jpeg", 640, 480)


def test_jpeg_eoi_before_sof_raises_loudly():
    """ADVICE (r9): EOI (FFD9) carries no length field; the walk must
    terminate on it instead of reading two garbage "length" bytes and
    skipping arbitrarily far."""
    import pytest

    from dca_manager_spark.operators.multimodal import parse_image_header

    app0 = b"\xff\xe0\x00\x10JFIF\x00\x01\x01\x00\x00H\x00H\x00\x00"
    with pytest.raises(ValueError, match="EOI"):
        parse_image_header(b"\xff\xd8" + app0 + b"\xff\xd9" + b"\x00" * 32)
    # EOI immediately after SOI — still a loud terminator, not a
    # garbage-length read.
    with pytest.raises(ValueError, match="EOI"):
        parse_image_header(b"\xff\xd8\xff\xd9")


def test_blob_builders_raise_on_u16_overflow(spark):
    """ADVICE (r9): fixed-width header fields must RAISE on out-of-range
    values, never truncate modulo 2^16 — a 70000-px width silently
    becoming 4464 px is corrupt metadata at corpus scale."""
    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.utils import AnalysisException

    from dca_manager_spark.operators.multimodal import gif_blob_col, wav_blob_col

    df = spark.createDataFrame([(70000, 10)], "w int, h int")
    with pytest.raises(Exception, match="GIF width out of u16 range"):
        df.select(gif_blob_col(F.col("w"), F.col("h")).alias("b")).collect()
    with pytest.raises(Exception, match="out of u16 range"):
        df.select(
            wav_blob_col(F.lit(70000), F.lit(8000), F.lit(16), F.lit(100)).alias("b")
        ).collect()
    # In-range values still build fine after the guard.
    ok = df.select(gif_blob_col(F.lit(65535), F.lit(1)).alias("b")).collect()
    assert ok[0]["b"][:6] == b"GIF89a"


def test_mp4_blob_round_trip(spark):
    """The JVM ISO-BMFF builder and the Python box-walk parser agree on
    every byte: assorted dims/durations (incl. >255 for multi-byte
    fields) round-trip exactly; box sizes are internally consistent."""
    from pyspark.sql import functions as F

    from dca_manager_spark.operators.multimodal import mp4_blob_col, video_meta

    rows = [(1, 1, 1, 1), (2, 640, 480, 1000), (3, 1920, 1080, 3_600_000),
            (4, 65535, 257, 4_000_000_000)]
    df = spark.createDataFrame(rows, "i int, w int, h int, d long")
    media = df.select(
        "i", "w", "h", "d",
        mp4_blob_col(F.col("w"), F.col("h"), F.col("d")).alias("content"),
    )
    got = video_meta(media, "content").select("i", "w", "h", "d", "video.*").collect()
    for r in got:
        assert r["format"] == "mp4"
        assert (r["width"], r["height"], r["duration_ms"]) == (r["w"], r["h"], r["d"]), r
    # declared top-level sizes tile the blob exactly
    blob = media.filter(F.col("i") == 2).select("content").collect()[0][0]
    assert len(blob) == 20 + 216
    assert int.from_bytes(blob[0:4], "big") == 20 and blob[4:8] == b"ftyp"
    assert int.from_bytes(blob[20:24], "big") == 216 and blob[24:28] == b"moov"


def test_parse_mp4_header_walk_and_truncation():
    """Loudness contract + structural variants: non-MP4 -> all None;
    recognized-but-truncated raises; v1 (64-bit) mvhd/tkhd parse; a
    largesize moov box parses; missing mvhd or tkhd raises."""
    import pytest

    from dca_manager_spark.operators.multimodal import parse_mp4_header

    def be(x, n):
        return int(x).to_bytes(n, "big")

    assert parse_mp4_header(None) == (None,) * 4
    assert parse_mp4_header(b"RIFF not mp4") == (None,) * 4

    ftyp = be(20, 4) + b"ftypisom" + be(0, 4) + b"isom"
    matrix = be(0x00010000, 4) + b"\0" * 12 + be(0x00010000, 4) + b"\0" * 12 + be(0x40000000, 4)
    # v1 mvhd: 64-bit times/duration, timescale 90000
    mvhd1 = (be(120, 4) + b"mvhd" + b"\x01\0\0\0" + be(0, 8) + be(0, 8)
             + be(90000, 4) + be(90000 * 7 + 45000, 8)  # 7.5s
             + be(0x00010000, 4) + be(0x0100, 2) + b"\0" * 10 + matrix
             + b"\0" * 24 + be(2, 4))
    assert len(mvhd1) == 120
    tkhd1 = (be(104, 4) + b"tkhd" + b"\x01\0\0\x07" + be(0, 8) + be(0, 8)
             + be(1, 4) + be(0, 4) + be(675000, 8) + b"\0" * 8 + b"\0" * 8
             + matrix + be(800, 2) + b"\0\0" + be(600, 2) + b"\0\0")
    assert len(tkhd1) == 104
    trak = be(8 + len(tkhd1), 4) + b"trak" + tkhd1
    inner = mvhd1 + trak
    # largesize moov: size==1 + 64-bit size
    moov = be(1, 4) + b"moov" + be(16 + len(inner), 8) + inner
    got = parse_mp4_header(ftyp + moov)
    assert got == ("mp4", 800, 600, 7500)

    plain_moov = be(8 + len(inner), 4) + b"moov" + inner
    # truncation inside tkhd raises loudly
    with pytest.raises(ValueError, match="truncated MP4"):
        parse_mp4_header((ftyp + plain_moov)[:-30])
    # moov without mvhd / without tkhd raises
    moov_no_mvhd = be(8 + len(trak), 4) + b"moov" + trak
    with pytest.raises(ValueError, match="no moov/mvhd"):
        parse_mp4_header(ftyp + moov_no_mvhd)
    moov_no_trak = be(8 + len(mvhd1), 4) + b"moov" + mvhd1
    with pytest.raises(ValueError, match="no trak/tkhd"):
        parse_mp4_header(ftyp + moov_no_trak)


def test_mp4_builder_raises_on_out_of_range_fields(spark):
    """Width/height guard to the 16.16 integer domain (u16); duration to
    u32 ms — out-of-range raises instead of truncating."""
    import pytest
    from pyspark.sql import functions as F

    from dca_manager_spark.operators.multimodal import mp4_blob_col

    df = spark.createDataFrame([(1,)], "i int")
    with pytest.raises(Exception, match="MP4 width out of u16"):
        df.select(mp4_blob_col(F.lit(70000), F.lit(10), F.lit(1000))).collect()
    with pytest.raises(Exception, match="MP4 duration_ms out of u32"):
        df.select(mp4_blob_col(F.lit(10), F.lit(10), F.lit(1 << 33))).collect()


def test_null_fields_build_null_blobs_not_crashes(spark):
    """Review finding (r11): a NULL width/height/duration is a MISSING
    value, not a corrupt one — the builders must produce a NULL blob
    (parsers return all-None), never a message-less raise."""
    from pyspark.sql import functions as F

    from dca_manager_spark.operators.multimodal import (
        gif_blob_col,
        image_dims,
        mp4_blob_col,
        wav_blob_col,
    )

    df = spark.createDataFrame(
        [(1, 320, 200), (2, None, 200)], "i int, w int, h int"
    )
    got = {r["i"]: r["b"] for r in df.select(
        "i", gif_blob_col(F.col("w"), F.col("h")).alias("b")).collect()}
    assert got[1][:6] == b"GIF89a" and got[2] is None
    parsed = image_dims(
        df.select("i", gif_blob_col(F.col("w"), F.col("h")).alias("content")),
        "content",
    ).select("i", "img.*").collect()
    by_i = {r["i"]: r for r in parsed}
    assert by_i[1]["width"] == 320 and by_i[2]["format"] is None
    # WAV and MP4 builders share the guard
    wav = df.select(wav_blob_col(F.col("w"), F.lit(8000), F.lit(16),
                                 F.lit(100)).alias("b")).collect()
    assert wav[0]["b"] is not None and wav[1]["b"] is None
    mp4 = df.select(mp4_blob_col(F.col("w"), F.col("h"),
                                 F.lit(1000)).alias("b")).collect()
    assert mp4[0]["b"] is not None and mp4[1]["b"] is None


# -- PNG pixel codec (r13) -------------------------------------------------


def _card(w, h, ch, seed=0):
    return bytes(
        (seed + x * 3 + y * 7 + c * 11) % 256
        for y in range(h) for x in range(w) for c in range(ch)
    )


def test_png_roundtrip_all_color_types_and_filters():
    from dca_manager_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    # h >= 6 so the writer's y%5 filter cycle exercises ALL five spec
    # filters (0..4) inside a single image, per color type.
    for ct, ch in ((0, 1), (2, 3), (4, 2), (6, 4)):
        px = _card(5, 7, ch, seed=ct)
        w, h, ch2, raw = decode_png_pixels(encode_png(5, 7, ct, px))
        assert (w, h, ch2) == (5, 7, ch)
        assert raw == px


def test_png_decode_is_loud_on_corruption():
    from dca_manager_spark.operators.multimodal import (
        decode_png_pixels,
        encode_png,
    )

    blob = encode_png(4, 4, 2, _card(4, 4, 3))
    with pytest.raises(ValueError, match="magic"):
        decode_png_pixels(b"\x00" + blob[1:])
    with pytest.raises(ValueError, match="truncated"):
        decode_png_pixels(blob[:-6])
    # flip one IDAT payload byte -> CRC must catch it
    idx = blob.index(b"IDAT") + 5
    corrupt = blob[:idx] + bytes([blob[idx] ^ 0xFF]) + blob[idx + 1:]
    with pytest.raises(ValueError, match="CRC"):
        decode_png_pixels(corrupt)


def test_png_decode_rejects_unsupported_shapes():
    import struct
    import zlib

    from dca_manager_spark.operators.multimodal import (
        _PNG_MAGIC,
        _png_chunk,
        decode_png_pixels,
    )

    def make(depth=8, ct=2, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 1, 1, depth, ct, 0, 0, interlace)
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ct]
        raw = bytes(1 + ch)
        return (
            _PNG_MAGIC
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(raw))
            + _png_chunk(b"IEND", b"")
        )

    with pytest.raises(ValueError, match="bit depth"):
        decode_png_pixels(make(depth=16))
    with pytest.raises(ValueError, match="color type"):
        decode_png_pixels(make(ct=3))  # palette
    with pytest.raises(ValueError, match="interlaced"):
        decode_png_pixels(make(interlace=1))


def test_png_pixels_spark_stage(spark):
    from dca_manager_spark.operators.multimodal import encode_png, png_pixels

    rows = [
        (1, encode_png(3, 4, 2, _card(3, 4, 3, seed=5))),
        (2, encode_png(2, 2, 0, _card(2, 2, 1, seed=9))),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r for r in png_pixels(df).collect()}
    assert (got[1].width, got[1].height, got[1].channels) == (3, 4, 3)
    assert got[1].pixels == list(_card(3, 4, 3, seed=5))
    assert got[2].pixels == list(_card(2, 2, 1, seed=9))


def test_png_image_decoder_features():
    from dca_manager_spark.operators.multimodal import (
        encode_png,
        png_image_decoder,
    )

    px = bytes([10, 200] * 16)  # 4x4 gray+alpha
    f = png_image_decoder(encode_png(4, 4, 4, px))
    assert abs(f[0] - 10 / 255) < 1e-9 and abs(f[1] - 200 / 255) < 1e-9
    assert f[2] == 0.0 and f[3] == 0.0
    assert f[4:] == [4.0, 4.0, 2.0]


# -- baseline JPEG codec (r14: operators/jpeg.py) -----------------------


def _card(w, h, ch, seed=5, block=8):
    """Block-constant test card: every block x block tile one value."""
    return bytes(
        (seed + 3 * (x // block) + 5 * (y // block) + 11 * c) % 256
        for y in range(h)
        for x in range(w)
        for c in range(ch)
    )


def test_jpeg_block_constant_bit_exact_gray_and_rgb():
    """All-ones quant + block-constant input -> the lossy pipeline has
    exactly one nonzero DCT coefficient per block and round-trips
    BIT-EXACT, including partial edge blocks (19x13) and Adobe raw-RGB
    (no color-space rounding)."""
    from dca_manager_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    for ch, adobe in ((1, False), (3, True)):
        px = _card(19, 13, ch)
        blob = encode_jpeg_baseline(
            19, 13, ch, px,
            quant_luma=[1] * 64, quant_chroma=[1] * 64, adobe_rgb=adobe,
        )
        w, h, c, raw = decode_jpeg_baseline(blob)
        assert (w, h, c) == (19, 13, ch)
        assert raw == px


def test_jpeg_420_subsampling_bit_exact_on_mcu_constant_chroma():
    """4:2:0: luma constant per 8x8, chroma constant per 16x16 MCU ->
    the 2x2 box average is the value itself and the subsampled path
    round-trips bit-exact (exercises the MCU walk: 4 luma blocks + 2
    chroma blocks per MCU, replication upsample, edge crop)."""
    from dca_manager_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    w, h = 21, 18

    def val(x, y, c):
        if c == 0:
            return (9 + 3 * (x // 8) + 5 * (y // 8)) % 256
        return (40 + 17 * (x // 16) + 23 * (y // 16) + 11 * c) % 256

    px = bytes(
        val(x, y, c) for y in range(h) for x in range(w) for c in range(3)
    )
    blob = encode_jpeg_baseline(
        w, h, 3, px,
        quant_luma=[1] * 64, quant_chroma=[1] * 64,
        subsampling="4:2:0", adobe_rgb=True,
    )
    ww, hh, cc, raw = decode_jpeg_baseline(blob)
    assert (ww, hh, cc) == (w, h, 3)
    assert raw == px


def test_jpeg_restart_intervals_reset_dc_predictor():
    from dca_manager_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    px = _card(40, 24, 1)  # 5x3 = 15 MCUs
    for ri in (1, 2, 7):
        blob = encode_jpeg_baseline(
            40, 24, 1, px, quant_luma=[1] * 64, restart_interval=ri
        )
        assert decode_jpeg_baseline(blob)[3] == px


def test_jpeg_ac_zigzag_path_vs_independent_idct():
    """Random images exercise the FULL AC path (runs, ZRL, zigzag,
    every IDCT basis function). The decoder's output must match an
    INDEPENDENT direct-cosine-sum reconstruction of the quantized
    coefficients to the last bit — catching transposed zigzag, wrong
    basis normalization, or run/size miscoding that a smooth image
    would hide."""
    import numpy as np

    from dca_manager_spark.operators import jpeg as J

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (16, 24), dtype=np.uint8)
    blob = J.encode_jpeg_baseline(24, 16, 1, img.tobytes(), quality=75)
    w, h, c, raw = J.decode_jpeg_baseline(blob)
    got = np.frombuffer(raw, np.uint8).reshape(16, 24).astype(np.float64)

    # independent reference: re-derive the quantized coefficients by
    # forward-transforming with a DIRECT cosine double sum (not the
    # module's matrix identity), then invert the same way
    q = np.array(J.scale_quant_table(J.STD_QUANT_LUMA, 75),
                 dtype=np.float64).reshape(8, 8)

    def cu(u):
        return np.sqrt(0.5) if u == 0 else 1.0

    ref = np.zeros((16, 24))
    for by in range(2):
        for bx in range(3):
            blk = img[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8].astype(float) - 128.0
            coef = np.zeros((8, 8))
            for u in range(8):
                for v in range(8):
                    s = sum(
                        blk[y, x]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                        for y in range(8) for x in range(8)
                    )
                    coef[u, v] = 0.25 * cu(u) * cu(v) * s
            qc = np.rint(coef / q) * q
            out = np.zeros((8, 8))
            for y in range(8):
                for x in range(8):
                    out[y, x] = 0.25 * sum(
                        cu(u) * cu(v) * qc[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                        for u in range(8) for v in range(8)
                    )
            ref[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8] = out + 128.0
    ref = np.clip(np.rint(ref), 0, 255)
    assert np.array_equal(got, ref)


def test_jpeg_ycbcr_smooth_roundtrip_close():
    """JFIF YCbCr color path (lossy by construction): a smooth gradient
    at quality 90 must come back within a few levels — a channel swap,
    wrong BT.601 constant, or chroma misalignment blows this up."""
    import numpy as np

    from dca_manager_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    yy, xx = np.mgrid[0:32, 0:32]
    img = np.stack(
        [(yy * 4) % 256, (xx * 4) % 256, ((xx + yy) * 2) % 256], axis=-1
    ).astype(np.uint8)
    for sub in ("4:4:4", "4:2:0"):
        blob = encode_jpeg_baseline(
            32, 32, 3, img.tobytes(), quality=90, subsampling=sub
        )
        w, h, c, raw = decode_jpeg_baseline(blob)
        out = np.frombuffer(raw, np.uint8).reshape(32, 32, 3).astype(int)
        assert np.abs(out - img.astype(int)).max() <= 12


def test_jpeg_decoder_loud_on_unsupported_and_corrupt():
    from dca_manager_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    px = _card(16, 8, 1)
    blob = encode_jpeg_baseline(16, 8, 1, px, quant_luma=[1] * 64)

    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_baseline(b"\x00\x01")
    with pytest.raises(ValueError, match="progressive"):
        decode_jpeg_baseline(
            b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
        )
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg_baseline(blob[: len(blob) // 2])
    # 16-bit quant table (Pq=1) is not baseline
    i = blob.index(b"\xff\xdb")
    bad = bytearray(blob)
    bad[i + 4] |= 0x10
    with pytest.raises(ValueError, match="16-bit"):
        decode_jpeg_baseline(bytes(bad))
    # wrong restart marker index
    rblob = encode_jpeg_baseline(
        40, 8, 1, _card(40, 8, 1), quant_luma=[1] * 64, restart_interval=1
    )
    j = rblob.index(b"\xff\xd0")
    bad = bytearray(rblob)
    bad[j + 1] = 0xD3
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg_baseline(bytes(bad))


def test_jpeg_pixels_spark_plumbing(spark):
    """jpeg_pixels mapInPandas stage + jpeg_image_decoder feature twin
    against planted cards — the Spark-side shape of the codec."""
    from dca_manager_spark.operators.jpeg import (
        encode_jpeg_baseline,
        jpeg_image_decoder,
        jpeg_pixels,
    )

    rows = []
    for i in range(6):
        ch = 1 if i % 2 == 0 else 3
        w, h = 8 + i, 5 + i
        px = _card(w, h, ch, seed=i)
        rows.append(
            (i, encode_jpeg_baseline(
                w, h, ch, px,
                quant_luma=[1] * 64, quant_chroma=[1] * 64,
                adobe_rgb=(ch == 3),
            ), px, w, h, ch)
        )
    df = spark.createDataFrame(
        [(i, b) for i, b, *_ in rows], "media_id long, content binary"
    )
    got = {r.media_id: r for r in jpeg_pixels(df).collect()}
    for i, _, px, w, h, ch in rows:
        r = got[i]
        assert (r.width, r.height, r.channels) == (w, h, ch)
        assert bytes(r.pixels) == px
    # feature twin: per-channel means of the planted card
    i, blob, px, w, h, ch = rows[1]
    feat = jpeg_image_decoder(blob)
    assert feat[3:] == [0.0, float(w), float(h), float(ch)]
    for c in range(3):
        mean = sum(px[c::3]) / (w * h) / 255.0
        assert abs(feat[c] - mean) < 1e-9


# -- GIF LZW codec (r14: operators/gif.py) ------------------------------


def _pal(n):
    return [((3 * i) % 256, (7 * i) % 256, (11 * i) % 256) for i in range(n)]


def test_gif_round_trip_exact_plain_and_interlaced():
    """GIF is lossless: encode->decode must reproduce every RGB sample
    exactly, plain and interlaced (deinterlace pass reordering), across
    palette sizes and non-multiple-of-8 dims."""
    from dca_manager_spark.operators.gif import decode_gif_pixels, encode_gif

    import random

    rng = random.Random(3)
    for (w, h, npal, inter) in [
        (19, 13, 64, False), (33, 27, 256, True), (5, 37, 2, True),
        (1, 1, 2, False), (300, 5, 16, False),
    ]:
        pal = _pal(npal)
        idx = bytes(rng.randrange(npal) for _ in range(w * h))
        blob = encode_gif(w, h, pal, idx, interlace=inter)
        ww, hh, cc, raw = decode_gif_pixels(blob)
        assert (ww, hh, cc) == (w, h, 3)
        assert raw == b"".join(bytes(pal[i]) for i in idx)


def test_gif_dictionary_reset_and_width_boundaries():
    """A 300x300 mixed-pattern image forces the LZW dictionary past
    4096 (clear-code reset) and crosses every code-width boundary; the
    flush-at-boundary desync (encoder width counter vs the decoder's
    one-behind table — found during r14 bring-up) is covered by the
    planted sweep sizes 23x16 which straddle the 256-entry boundary at
    the final flush."""
    from dca_manager_spark.operators.gif import decode_gif_pixels, encode_gif

    pal = [(i, i, i) for i in range(256)]
    w, h = 300, 300
    idx = bytes(((x * y) ^ (x + y)) % 256 for y in range(h) for x in range(w))
    blob = encode_gif(w, h, pal, idx)
    assert decode_gif_pixels(blob)[3] == b"".join(bytes(pal[i]) for i in idx)
    # the exact boundary-flush regression shape (doc_id 91 in bring-up)
    pal64 = _pal(64)
    idx = bytes((91 % 251 + 3 * x + 5 * y) % 64 for y in range(16) for x in range(23))
    blob = encode_gif(23, 16, pal64, idx, interlace=True)
    assert decode_gif_pixels(blob)[3] == b"".join(bytes(pal64[i]) for i in idx)


def test_gif_decoder_loud_on_corrupt():
    from dca_manager_spark.operators.gif import decode_gif_pixels, encode_gif

    pal = _pal(16)
    idx = bytes((x + y) % 16 for y in range(9) for x in range(11))
    blob = encode_gif(11, 9, pal, idx)

    with pytest.raises(ValueError, match="magic"):
        decode_gif_pixels(b"NOTGIF")
    with pytest.raises(ValueError, match="truncated"):
        decode_gif_pixels(blob[:20])
    # header + full 16-entry color table, then an immediate trailer
    with pytest.raises(ValueError, match="trailer"):
        decode_gif_pixels(blob[:13 + 48] + b"\x3b")
    bad = bytearray(blob)
    bad[-12] ^= 0xFF  # corrupt the LZW stream tail
    with pytest.raises(ValueError):
        decode_gif_pixels(bytes(bad))
    # encoder guards
    with pytest.raises(ValueError, match="palette size"):
        encode_gif(2, 2, _pal(3), b"\x00" * 4)
    with pytest.raises(ValueError, match="index buffer"):
        encode_gif(2, 2, pal, b"\x00" * 3)
    with pytest.raises(ValueError, match="out of range"):
        encode_gif(2, 2, _pal(4), bytes([0, 1, 2, 9]))


def test_gif_pixels_spark_plumbing(spark):
    from dca_manager_spark.operators.gif import encode_gif, gif_pixels

    pal = _pal(64)
    rows = []
    for i in range(5):
        w, h = 7 + i, 4 + i
        idx = bytes((i + 3 * x + 5 * y) % 64 for y in range(h) for x in range(w))
        rows.append(
            (i, encode_gif(w, h, pal, idx, interlace=bool(i % 2)), idx, w, h)
        )
    df = spark.createDataFrame(
        [(i, b) for i, b, *_ in rows], "media_id long, content binary"
    )
    got = {r.media_id: r for r in gif_pixels(df).collect()}
    for i, _, idx, w, h in rows:
        r = got[i]
        assert (r.width, r.height, r.channels) == (w, h, 3)
        assert bytes(r.pixels) == b"".join(bytes(pal[j]) for j in idx)


def test_media_image_decoder_dispatches_all_three_formats(spark):
    """r14: the magic-byte dispatcher feeds extract_features a REAL
    decode for a MIXED PNG/JPEG/GIF corpus — per-channel means of the
    planted pixels, loud on unknown payloads."""
    from dca_manager_spark.operators.gif import encode_gif
    from dca_manager_spark.operators.jpeg import encode_jpeg_baseline
    from dca_manager_spark.operators.multimodal import (
        encode_png,
        extract_features,
        media_image_decoder,
    )

    png = encode_png(4, 4, 0, bytes([10] * 16))            # grayscale 10s
    jpg = encode_jpeg_baseline(8, 8, 1, bytes([50]) * 64,  # constant 50s
                               quant_luma=[1] * 64)
    gif = encode_gif(2, 2, [(0, 0, 0), (255, 255, 255)], bytes([1, 1, 1, 1]))
    df = spark.createDataFrame(
        [(1, png, None), (2, jpg, None), (3, gif, None)], MEDIA_SCHEMA
    )
    out = {
        r.media_id: r.feature
        for r in extract_features(df, media_image_decoder).collect()
    }
    assert abs(out[1][0] - 10 / 255) < 1e-6 and out[1][4:] == [4.0, 4.0, 1.0]
    assert abs(out[2][0] - 50 / 255) < 1e-6 and out[2][4:] == [8.0, 8.0, 1.0]
    assert out[3][:3] == [1.0, 1.0, 1.0] and out[3][4:] == [2.0, 2.0, 3.0]
    with pytest.raises(ValueError, match="unrecognized"):
        media_image_decoder(b"junk")


def test_jpeg_single_component_scan_is_non_interleaved():
    """Review regression (r14): per ITU-T.81 A.2.2 a single-component
    scan is NON-interleaved (MCU = one 8x8 data unit, raster order,
    sampling factors ignored) — a grayscale file whose SOF still
    carries h=v=2 (color converted with factors left in place) must
    decode as raster blocks, byte-identical to its 1x1 twin."""
    from dca_manager_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    px = _card(24, 24, 1, seed=7)
    blob = encode_jpeg_baseline(24, 24, 1, px, quant_luma=[1] * 64)
    i = blob.index(b"\xff\xc0")
    hv_off = i + 2 + 2 + 1 + 2 + 2 + 1 + 1  # SOF0: marker len P Y X Nf Cid -> HV
    assert blob[hv_off] == 0x11
    patched = blob[:hv_off] + b"\x22" + blob[hv_off + 1:]
    assert decode_jpeg_baseline(patched)[3] == px


def test_jpeg_malformed_payloads_raise_valueerror_never_indexerror():
    """Review regression (r14): the loudness CONTRACT is ValueError for
    every malformed payload — fill-byte tails and truncated DHT BITS
    arrays used to escape as IndexError; quality=0 used to silently
    alias quality=None through a falsy check."""
    from dca_manager_spark.operators.jpeg import (
        decode_jpeg_baseline,
        encode_jpeg_baseline,
    )

    with pytest.raises(ValueError, match="fill bytes"):
        decode_jpeg_baseline(b"\xff\xd8\xff\xff")
    with pytest.raises(ValueError, match="BITS"):
        decode_jpeg_baseline(b"\xff\xd8\xff\xc4\x00\x05\x00\x01\x02")
    with pytest.raises(ValueError, match="quality"):
        encode_jpeg_baseline(8, 8, 1, bytes(64), quality=0)


# -- PCM WAV sample decode (r14) -----------------------------------------


def test_wav_sample_round_trip_all_depths():
    """PCM is lossless: every depth (8 unsigned / 16 / 24 / 32 signed
    LE) round-trips exactly, including the extreme values."""
    import random

    from dca_manager_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav,
    )

    rng = random.Random(5)
    for bits in (8, 16, 24, 32):
        lo = 0 if bits == 8 else -(1 << (bits - 1))
        hi = 255 if bits == 8 else (1 << (bits - 1)) - 1
        for ch in (1, 2):
            samples = [rng.randint(lo, hi) for _ in range(60 * ch)]
            samples[0], samples[1] = lo, hi
            blob = encode_wav(ch, 8000, bits, samples)
            assert decode_wav_samples(blob) == (ch, 8000, bits, samples)


def test_wav_sample_decode_loudness():
    from dca_manager_spark.operators.multimodal import (
        decode_wav_samples,
        encode_wav,
    )

    blob = encode_wav(1, 8000, 16, [1, 2, 3])
    i = blob.index(b"fmt ")
    bad = bytearray(blob)
    bad[i + 8] = 3  # IEEE-float format tag
    with pytest.raises(ValueError, match="PCM"):
        decode_wav_samples(bytes(bad))
    with pytest.raises(ValueError, match="sample 300"):
        encode_wav(1, 8000, 8, [300])
    with pytest.raises(ValueError, match="tile"):
        encode_wav(2, 8000, 16, [1, 2, 3])


def test_wav_samples_spark_plumbing(spark):
    from dca_manager_spark.operators.multimodal import encode_wav, wav_samples

    rows = []
    for i, bits in enumerate((8, 16, 24)):
        lo = 0 if bits == 8 else -(1 << (bits - 1))
        samples = [lo + j for j in range(20)]
        rows.append((i, encode_wav(1, 16000, bits, samples), bits, samples))
    df = spark.createDataFrame(
        [(i, b) for i, b, *_ in rows], "media_id long, content binary"
    )
    got = {r.media_id: r for r in wav_samples(df).collect()}
    for i, _, bits, samples in rows:
        r = got[i]
        assert (r.channels, r.sample_rate, r.bits) == (1, 16000, bits)
        assert list(r.samples) == samples


# -- MP3 frame walk (r15) ---------------------------------------------------


def test_mp3_walk_cbr_exact_and_id3_skip():
    from dca_manager_spark.operators.multimodal import (
        _mp3_frame_len,
        encode_mp3_frames,
        parse_mp3_meta,
    )

    blob = encode_mp3_frames(3, 44100, 2, [128] * 10, id3_payload=b"t" * 300)
    assert parse_mp3_meta(blob) == (
        "mp3", "MPEG1", 44100, 2, 10,
        10 * 1152 * 1000 // 44100,
        10 * _mp3_frame_len(3, 128, 44100, 0),
        128, False,
    )
    # the walk measures every frame: trailing garbage is loud, not ignored
    import pytest as _pt

    with _pt.raises(ValueError, match="sync|trailing"):
        parse_mp3_meta(blob + b"\x00\x01")


def test_mp3_walk_vbr_duration_is_frame_exact():
    """A first-frame-only estimator reads a 64/128 VBR stream as all-64;
    the walk must sum real frame sizes and samples."""
    from dca_manager_spark.operators.multimodal import (
        encode_mp3_frames,
        parse_mp3_meta,
    )

    blob = encode_mp3_frames(2, 16000, 1, [64, 128] * 5, protection=True)
    fmt, ver, rate, ch, n, dur, nbytes, kbps, vbr = parse_mp3_meta(blob)
    assert (ver, rate, ch, n, vbr) == ("MPEG2", 16000, 1, 10, True)
    assert dur == 10 * 576 * 1000 // 16000  # LSF: 576 samples/frame
    s64, s128 = 72 * 64000 // 16000, 72 * 128000 // 16000
    assert nbytes == 5 * s64 + 5 * s128
    assert kbps == int((64 * s64 * 5 + 128 * s128 * 5) / nbytes + 0.5)


def test_mp3_walk_is_loud_on_corruption():
    import pytest as _pt

    from dca_manager_spark.operators.multimodal import (
        encode_mp3_frames,
        parse_mp3_meta,
    )

    good = encode_mp3_frames(3, 48000, 2, [192] * 4)
    with _pt.raises(ValueError, match="truncated"):
        parse_mp3_meta(good[:-5])
    with _pt.raises(ValueError, match="sync"):
        parse_mp3_meta(b"\x12\x34" + good)
    with _pt.raises(ValueError, match="no MP3 frames"):
        parse_mp3_meta(b"ID3" + bytes([4, 0, 0, 0, 0, 0, 4]) + b"abcd")
    # mid-stream sample-rate flip: two valid streams concatenated
    other = encode_mp3_frames(3, 32000, 2, [192] * 2)
    with _pt.raises(ValueError, match="mid-stream"):
        parse_mp3_meta(good + other)
    with _pt.raises(ValueError, match="not syncsafe"):
        parse_mp3_meta(b"ID3" + bytes([4, 0, 0, 0x80, 0, 0, 0]))


def test_mp3_meta_operator(spark):
    from dca_manager_spark.operators.multimodal import (
        encode_mp3_frames,
        mp3_meta,
    )

    rows = [
        (1, encode_mp3_frames(3, 44100, 2, [128] * 6)),
        (2, encode_mp3_frames(3, 32000, 1, [320, 128] * 4, id3_payload=b"z" * 64)),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r.media_id: r.audio for r in mp3_meta(df).collect()}
    assert got[1].n_frames == 6 and got[1].is_vbr is False
    assert got[2].n_frames == 8 and got[2].is_vbr is True
    assert got[2].channels == 1 and got[2].sample_rate == 32000


def test_audio_media_stats_dispatch_unified_contract():
    import pytest as _pt

    from dca_manager_spark.operators.flac import encode_flac
    from dca_manager_spark.operators.multimodal import (
        audio_media_stats,
        encode_mp3_frames,
        encode_wav,
    )

    sig = [(7 * i) % 65536 - 32768 for i in range(20)]
    wav = audio_media_stats(encode_wav(2, 16000, 16, sig))
    flac = audio_media_stats(encode_flac(2, 16000, 16, sig, block_size=16))
    assert wav == ("wav", 2, 16000, 20, 0, sum(sig), True)
    assert flac == ("flac", 2, 16000, 20, 0, sum(sig), True)
    mp3 = audio_media_stats(encode_mp3_frames(3, 44100, 2, [128] * 4))
    assert mp3 == ("mp3", 2, 44100, 4 * 1152 * 2,
                   4 * 1152 * 1000 // 44100, None, True)
    # bare-sync MP3 (no ID3) dispatches too
    assert audio_media_stats(
        encode_mp3_frames(3, 44100, 1, [128] * 2)
    )[0] == "mp3"
    with _pt.raises(ValueError, match="unrecognized audio"):
        audio_media_stats(b"OggS whatever")
    with _pt.raises(ValueError, match="null audio"):
        audio_media_stats(None)


# -- MP4 sample tables (r16: per-track exact metrics, no codec) -----------


def test_mp4_sample_walk_round_trip():
    """encode_mp4_sampled -> parse_mp4_samples re-derives every planted
    number: two-run stts summed (not first-delta-multiplied), variable
    stsz, ragged final chunk counted."""
    from dca_manager_spark.operators.multimodal import (
        encode_mp4_sampled,
        parse_mp4_samples,
    )

    sizes = [100 + (j * 17) % 900 for j in range(17)]
    blob = encode_mp4_sampled([
        dict(track_id=1, timescale=12800, stts=[(10, 512), (7, 256)],
             sizes=sizes, samples_per_chunk=4),
        dict(track_id=7, timescale=48000, stts=[(5, 1024)],
             sizes=[64] * 5, samples_per_chunk=8),
    ])
    got = parse_mp4_samples(blob)
    units = 10 * 512 + 7 * 256
    assert got[0] == (1, 12800, 17, units * 1000 // 12800,
                      17 * 12800 * 1000 // units, sum(sizes), max(sizes), 5)
    assert got[1] == (7, 48000, 5, 5 * 1024 * 1000 // 48000,
                      5 * 48000 * 1000 // (5 * 1024), 320, 64, 1)
    # the plain header walk still reads the same container's duration
    from dca_manager_spark.operators.multimodal import parse_mp4_header

    fmt, _, _, dur = parse_mp4_header(blob)
    assert fmt == "mp4" and dur == units * 1000 // 12800


def test_mp4_sample_walk_fixed_size_shortcut():
    """stsz with sample_size != 0 (all samples equal) has NO size array;
    the walk must use the fixed-size shortcut, not read absent bytes."""
    from dca_manager_spark.operators.multimodal import (
        _box, _full_box, encode_mp4_sampled, parse_mp4_samples,
    )

    blob = encode_mp4_sampled([
        dict(track_id=1, timescale=1000, stts=[(6, 100)],
             sizes=[50] * 6, samples_per_chunk=3)])
    # rewrite stsz to the fixed-size form
    i = blob.find(b"stsz") - 4
    size = int.from_bytes(blob[i:i + 4], "big")
    fixed = _full_box(b"stsz", (50).to_bytes(4, "big") + (6).to_bytes(4, "big"))
    patched = blob[:i] + fixed + blob[i + size:]
    # fix enclosing box sizes (stbl, minf, mdia, trak, moov shrink)
    delta = size - len(fixed)
    out = bytearray(patched)
    for tag in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        j = out.find(tag) - 4
        out[j:j + 4] = (int.from_bytes(out[j:j + 4], "big") - delta
                        ).to_bytes(4, "big")
    got = parse_mp4_samples(bytes(out))
    assert got[0][2] == 6 and got[0][5] == 300 and got[0][6] == 50


def test_mp4_sample_walk_is_loud_on_inconsistent_tables():
    import pytest

    from dca_manager_spark.operators.multimodal import (
        encode_mp4_sampled, parse_mp4_samples,
    )

    blob = encode_mp4_sampled([
        dict(track_id=1, timescale=1000, stts=[(6, 100)],
             sizes=[50] * 6, samples_per_chunk=3)])
    cnt_off = blob.find(b"stsz") + 12
    under = bytearray(blob)
    under[cnt_off:cnt_off + 4] = (5).to_bytes(4, "big")
    with pytest.raises(ValueError, match="stts declares"):
        parse_mp4_samples(bytes(under))
    over = bytearray(blob)
    over[cnt_off:cnt_off + 4] = (7).to_bytes(4, "big")
    with pytest.raises(ValueError, match="truncated MP4 sample table"):
        parse_mp4_samples(bytes(over))
    with pytest.raises(ValueError, match="truncated MP4"):
        parse_mp4_samples(blob[:60])
    # stco chunk count out of step with stsc coverage
    co_off = blob.find(b"stco") + 8
    badco = bytearray(blob)
    badco[co_off:co_off + 4] = (1).to_bytes(4, "big")
    with pytest.raises(ValueError, match="stsc/stco"):
        parse_mp4_samples(bytes(badco))
    # non-MP4 payloads pass through silently (shared contract)
    assert parse_mp4_samples(b"not a video") == []
    assert parse_mp4_samples(None) == []


def test_mp4_samples_operator(spark):
    """mapInPandas explode: one row per track, carry-through columns
    preserved, Arrow-batched."""
    from dca_manager_spark.operators.multimodal import (
        encode_mp4_sampled, mp4_samples,
    )

    rows = []
    for mid in range(4):
        n_tracks = 1 + mid % 2
        blob = encode_mp4_sampled([
            dict(track_id=k + 1, timescale=1000, stts=[(4 + mid, 250)],
                 sizes=[10 * (k + 1)] * (4 + mid), samples_per_chunk=2)
            for k in range(n_tracks)
        ])
        rows.append((mid, f"tag{mid}", bytearray(blob)))
    df = spark.createDataFrame(rows, "media_id int, tag string, content binary")
    got = mp4_samples(df, "content").orderBy("media_id", "track_id").collect()
    assert len(got) == 1 + 2 + 1 + 2
    assert got[1].media_id == 1 and got[1].tag == "tag1"
    assert got[2].track_id == 2 and got[2].total_sample_bytes == 20 * 5
    assert all(r.duration_ms == (4 + r.media_id) * 250 for r in got)
