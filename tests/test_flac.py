"""FLAC codec (operators/flac.py): spec pinning against hand-computed
bytes, decode-only streams the encoder cannot produce (breaking
round-trip symmetry), property-based round trips, loud corruption
handling, and the Spark mapInPandas operator."""

from __future__ import annotations

import hashlib
import struct

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dca_manager_spark.operators.flac import (
    _BitReader,
    _BitWriter,
    _crc8,
    _crc16,
    _encode_coded_number,
    decode_flac_samples,
    encode_flac,
    flac_samples,
)


# -- spec pinning (hand-computed, independent of the codec) ----------------


def test_crc8_known_vector():
    # x^8+x^2+x+1 over "123456789" is the standard CRC-8/SMBUS check value
    assert _crc8(b"123456789") == 0xF4


def test_crc16_known_vector():
    # x^16+x^15+x^2+1 init 0, MSB-first ("CRC-16/BUYPASS" check value)
    assert _crc16(b"123456789") == 0xFEE8


def test_coded_number_utf8_parity_and_extension():
    # below 0x80: identity byte; above: UTF-8 bit patterns (RFC 9639 §9.1.5)
    assert _encode_coded_number(0x41) == b"\x41"
    assert _encode_coded_number(0x80) == "".encode("utf-8")
    assert _encode_coded_number(0x7FF) == "߿".encode("utf-8")
    assert _encode_coded_number(0xFFFF) == "￿".encode("utf-8")
    for v in (0, 1, 0x7F, 0x80, 0x81, 0x7FF, 0x800, 0xFFFF, 0x10000,
              (1 << 31) - 1, (1 << 36) - 1):
        r = _BitReader(_encode_coded_number(v))
        assert r.read_coded_number() == v


def test_streaminfo_layout_hand_decoded():
    samples = [0, 100, -100, 50]
    blob = encode_flac(1, 44100, 16, samples, block_size=16)
    assert blob[:4] == b"fLaC"
    assert blob[4] == 0x80  # last-metadata flag + type 0 (STREAMINFO)
    assert int.from_bytes(blob[5:8], "big") == 34
    si = blob[8:42]
    assert struct.unpack(">H", si[0:2])[0] == 16   # min block size
    assert struct.unpack(">H", si[2:4])[0] == 16   # max block size
    # bytes 10-17: sr(20) ch-1(3) bps-1(5) total(36), big-endian bitfield
    field = int.from_bytes(si[10:18], "big")
    assert field >> 44 == 44100                      # sample rate
    assert (field >> 41) & 0b111 == 0                # channels - 1
    assert (field >> 36) & 0b11111 == 15             # bps - 1
    assert field & ((1 << 36) - 1) == 4              # total samples
    md5 = hashlib.md5(
        b"".join(int(s).to_bytes(2, "little", signed=True) for s in samples)
    ).digest()
    assert si[18:34] == md5


def test_frame_header_layout_hand_decoded():
    blob = encode_flac(1, 44100, 16, [1, 2, 3, 4], block_size=16)
    frame = blob[42:]
    # sync(14)=11111111111110, reserved 0, fixed-blocksize strategy 0
    assert frame[0] == 0xFF and frame[1] == 0xF8
    # blocksize code 0b0111 (16-bit at end), sample-rate code 0b0000
    assert frame[2] == 0b01110000
    # channels 0b0000 (1ch), bps 0b100 (16), reserved 0
    assert frame[3] == 0b00001000
    assert frame[4] == 0x00                       # frame number 0
    assert struct.unpack(">H", frame[5:7])[0] == 3  # blocksize - 1
    assert frame[7] == _crc8(frame[:7])           # header CRC-8


# -- decode-only streams (hand-assembled; encoder cannot produce these) ----


def _hand_stream(frame_payload_bits, channels=1, bits=8, total=4,
                 sample_rate=8000, md5=b"\x00" * 16, bs_code=0b0110,
                 bs_tail=(3, 8), sr_code=0b0100):
    """Assemble a minimal FLAC stream around a hand-built subframe
    bitstring: STREAMINFO + one frame. ``bs_tail`` = (value, nbits)
    appended for uncommon-blocksize codes; sr_code 0b0100 = 8 kHz fixed
    table entry (the encoder always emits 0b0111/0b0000 — these paths
    only exist in hand streams)."""
    si = _BitWriter()
    si.write(16, 16)
    si.write(16, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(total, 36)
    head = b"fLaC" + bytes([0x80]) + (34).to_bytes(3, "big") + si.bytes() + md5

    w = _BitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(bs_code, 4)
    w.write(sr_code, 4)
    w.write(channels - 1, 4)
    w.write({8: 0b001, 16: 0b100}[bits], 3)
    w.write(0, 1)
    header = w.bytes() + b"\x00"  # frame number 0
    if bs_tail:
        t = _BitWriter()
        t.write(*bs_tail)
        header += t.bytes()
    header += bytes([_crc8(header)])
    body = _BitWriter()
    for value, nbits in frame_payload_bits:
        body.write(value, nbits)
    body.align()
    frame = header + body.bytes()
    frame += _crc16(frame).to_bytes(2, "big")
    return head + frame


def test_decode_wasted_bits_subframe():
    # verbatim subframe with 2 wasted bits: samples stored at depth 6,
    # decoder must left-shift by 2. Stored [1, -2, 3, 0] -> [4, -8, 12, 0]
    payload = [
        (0, 1), (0b000001, 6),      # reserved, VERBATIM
        (1, 1), (0, 1), (1, 1),     # wasted flag, unary(1) = 2 wasted bits
        (1 & 0x3F, 6), (-2 & 0x3F, 6), (3 & 0x3F, 6), (0, 6),
    ]
    blob = _hand_stream(payload)
    ch, sr, bits, out, md5_ok = decode_flac_samples(blob)
    assert (ch, sr, bits) == (1, 8000, 8)
    assert out == [4, -8, 12, 0]
    assert md5_ok is False  # zero MD5 in STREAMINFO = unverifiable


def test_decode_common_blocksize_and_samplerate_table_codes():
    # blocksize code 0b1000 = 256 samples from the fixed table; constant
    # subframe so the payload stays tiny
    payload = [(0, 1), (0b000000, 6), (0, 1), (7 & 0xFF, 8)]
    blob = _hand_stream(payload, total=256, bs_code=0b1000, bs_tail=None)
    ch, sr, bits, out, _ = decode_flac_samples(blob)
    assert sr == 8000 and out == [7] * 256


def test_decode_five_bit_rice_method():
    # method 01 (5-bit params): fixed order 0, one partition, param 0
    # residuals zigzag: 0->0, -1->1, 1->2, -2->3
    payload = [
        (0, 1), (0b001000, 6), (0, 1),          # FIXED order 0
        (0b01, 2), (0, 4),                       # method 1, porder 0
        (0, 5),                                  # rice param 0
        (1, 1),                                  # zz 0 -> q0
        (0, 1), (1, 1),                          # zz 1 -> q1
        (0, 2), (1, 1),                          # zz 2 -> q2
        (0, 3), (1, 1),                          # zz 3 -> q3
    ]
    blob = _hand_stream(payload)
    _, _, _, out, _ = decode_flac_samples(blob)
    assert out == [0, -1, 1, -2]


def test_decode_corruption_is_loud():
    good = encode_flac(1, 8000, 16, [10, 20, 30, 40], block_size=16)
    with pytest.raises(ValueError, match="magic"):
        decode_flac_samples(b"fLaX" + good[4:])
    # flip a bit inside the frame body -> CRC-16 mismatch
    bad = bytearray(good)
    bad[-3] ^= 0x01
    with pytest.raises(ValueError, match="CRC"):
        decode_flac_samples(bytes(bad))
    # header corruption -> CRC-8 (or sync) failure
    bad2 = bytearray(good)
    bad2[44] ^= 0x40
    with pytest.raises(ValueError):
        decode_flac_samples(bytes(bad2))
    with pytest.raises(ValueError, match="truncated"):
        decode_flac_samples(good[:30])


def test_md5_mismatch_reports_false_not_crash():
    good = bytearray(encode_flac(1, 8000, 16, [10, 20, 30, 40]))
    good[8 + 18] ^= 0xFF  # tamper STREAMINFO md5
    _, _, _, out, md5_ok = decode_flac_samples(bytes(good))
    assert out == [10, 20, 30, 40] and md5_ok is False


# -- round-trip properties --------------------------------------------------


@settings(max_examples=120, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    data=st.data(),
    channels=st.sampled_from([1, 2]),
    bits=st.sampled_from([8, 16, 24]),
    n_frames=st.integers(min_value=1, max_value=200),
)
def test_round_trip_any_signal(data, channels, bits, n_frames):
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    samples = data.draw(
        st.lists(st.integers(lo, hi), min_size=n_frames * channels,
                 max_size=n_frames * channels)
    )
    blob = encode_flac(channels, 16000, bits, samples, block_size=16)
    ch, sr, b2, out, md5_ok = decode_flac_samples(blob)
    assert (ch, sr, b2) == (channels, 16000, bits)
    assert out == samples
    assert md5_ok


def test_round_trip_extreme_values_all_depths():
    for bits in (8, 12, 16, 20, 24, 32):
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        sig = [lo, hi, lo, hi, 0, -1, 1, lo, hi, 0] * 10
        blob = encode_flac(2, 48000, bits, sig, block_size=16)
        _, _, _, out, md5_ok = decode_flac_samples(blob)
        assert out == sig and md5_ok


def test_encoder_actually_compresses_smooth_signals():
    smooth = [1000 + 200 * (i % 50) for i in range(5000)]
    blob = encode_flac(1, 44100, 16, smooth, block_size=4096)
    assert len(blob) < 2 * len(smooth) * 0.8


def test_encoder_validation_is_loud():
    with pytest.raises(ValueError, match="tile"):
        encode_flac(2, 8000, 16, [1, 2, 3])
    with pytest.raises(ValueError, match="outside"):
        encode_flac(1, 8000, 8, [128])
    with pytest.raises(ValueError, match="bits"):
        encode_flac(1, 8000, 13, [0])  # not a FLAC header depth
    with pytest.raises(ValueError, match="block_size"):
        encode_flac(1, 8000, 16, [0], block_size=8)


# -- Spark operator ---------------------------------------------------------


def test_flac_samples_operator(spark):
    rows = []
    for mid in range(6):
        channels = mid % 2 + 1
        bits = [8, 16, 24][mid % 3]
        lo = -(1 << (bits - 1))
        sig = [(lo + 7 * i) % (1 << bits) + lo for i in range(40 * channels)]
        sig = [s if s >= lo else s + (1 << bits) for s in sig]
        sig = [((7 * i + mid) % (1 << bits)) + lo for i in range(40 * channels)]
        rows.append((mid, channels, bits, sig,
                     encode_flac(channels, 16000, bits, sig, block_size=16)))
    df = spark.createDataFrame(
        [(m, blob) for m, _, _, _, blob in rows], "media_id long, content binary"
    )
    got = {r.media_id: r for r in flac_samples(df).collect()}
    assert len(got) == 6
    for mid, channels, bits, sig, _ in rows:
        r = got[mid]
        assert (r.channels, r.sample_rate, r.bits) == (channels, 16000, bits)
        assert list(r.samples) == sig
        assert r.md5_ok


def test_fixed_orders_three_and_four_selected_and_decoded():
    """Polynomial signals make the high fixed orders win (an order-k
    predictor annihilates degree k-1), so these round trips execute the
    order-3/4 encode AND decode paths that random/wrapped signals never
    select."""
    from dca_manager_spark.operators.flac import _residuals

    quad = [3 * i * i + 5 * i + 7 for i in range(96)]       # order 3 exact
    cubic = [i ** 3 - 7 * i * i for i in range(96)]         # order 4 exact
    for sig, want in ((quad, 3), (cubic, 4)):
        costs = [sum(abs(e) for e in _residuals(sig[:32], o))
                 for o in range(5)]
        assert costs.index(min(costs)) == want, costs
        blob = encode_flac(1, 44100, 24, sig, block_size=32)
        _, _, _, out, md5_ok = decode_flac_samples(blob)
        assert out == sig and md5_ok


def test_escape_width_over_31_bits_fails_at_encode():
    """ADVICE r15: the raw-escape width field is 5 bits; a residual
    needing >31 bits used to be silently masked (width % 32), producing
    a corrupt stream caught only by CRC/MD5 downstream. The encoder must
    raise at the source instead."""
    import pytest

    from dca_manager_spark.operators.flac import _BitWriter, _write_residual

    w = _BitWriter()
    # 32-bit-depth residual: abs().bit_length()+1 == 32 > 31
    huge = [-(1 << 31), (1 << 31) - 1, 0, 0]
    with pytest.raises(ValueError, match="31 bits"):
        _write_residual(w, huge, 0, len(huge), 0, force_escape=True)
    # boundary: exactly 31 bits still encodes
    ok = [-(1 << 29), (1 << 30) - 1, 0, 0]  # bit_length 30 -> width 31
    _write_residual(_BitWriter(), ok, 0, len(ok), 0, force_escape=True)
