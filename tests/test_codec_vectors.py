"""Conformance tests: the reference library's own test vectors
(EncodeGorillaTest.java / EncodeTest.java) round-tripped through both the
streaming and the vectorized codec, plus streaming↔vectorized bit-identity.

These tests do not need Ray.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from gorilla_tsc_ray.codec import (
    BitReader,
    BitWriter,
    CompressorV1,
    DecompressorV1,
    DifferentialFCM,
    GorillaCompressor,
    GorillaDecompressor,
    bits_to_double,
    decode_series,
    double_to_bits,
    encode_series,
    long_to_bits,
    payload_to_words,
    words_to_payload,
)

from .vectors import WILL_IT_BLEND, WILL_IT_BLEND_BLOCK_TS

NOW = 1500400800000  # fixed stand-in for the reference's LocalDateTime.now()

SIMPLE_8 = [
    (NOW + 10, double_to_bits(1.0)),
    (NOW + 20, double_to_bits(-2.0)),
    (NOW + 28, double_to_bits(-2.5)),
    (NOW + 84, double_to_bits(65537.0)),
    (NOW + 400, double_to_bits(2147483650.0)),
    (NOW + 2300, double_to_bits(-16384.0)),
    (NOW + 16384, double_to_bits(2.8)),
    (NOW + 16500, double_to_bits(-38.0)),
]

SIMILAR_TS = 1425254400000  # 2015-03-02T00:00Z (EncodeGorillaTest.java:334)
SIMILAR_5 = [
    (SIMILAR_TS + 1, double_to_bits(6.00065e6)),
    (SIMILAR_TS + 2, double_to_bits(6.000656e6)),
    (SIMILAR_TS + 3, double_to_bits(6.000657e6)),
    (SIMILAR_TS + 4, double_to_bits(6.000659e6)),
    (SIMILAR_TS + 5, double_to_bits(6.000661e6)),
]


def roundtrip_streaming(block_ts, pairs, predictor_cls=None, v1=False):
    if v1:
        comp = CompressorV1(block_ts)
    else:
        pred = predictor_cls() if predictor_cls else None
        comp = GorillaCompressor(block_ts, predictor=pred)
    for ts, bits in pairs:
        comp.add_value(ts, bits)
    comp.close()
    words = comp.out.to_words()
    reader = BitReader(words)
    if v1:
        dec = DecompressorV1(reader)
    else:
        pred = predictor_cls() if predictor_cls else None
        dec = GorillaDecompressor(reader, predictor=pred)
    out = list(dec)
    assert dec.read_pair() is None
    return words, out


@pytest.mark.parametrize("v1", [False, True], ids=["v2", "v1"])
@pytest.mark.parametrize(
    "block_ts,pairs",
    [
        (NOW, SIMPLE_8),
        (WILL_IT_BLEND_BLOCK_TS, WILL_IT_BLEND),
        (SIMILAR_TS, SIMILAR_5),
    ],
    ids=["simple8", "willItBlend", "similarFloats"],
)
def test_reference_vectors_streaming(block_ts, pairs, v1):
    _, out = roundtrip_streaming(block_ts, pairs, v1=v1)
    assert out == [(ts, bits & ((1 << 64) - 1)) for ts, bits in pairs]


@pytest.mark.parametrize(
    "block_ts,pairs",
    [
        (NOW, SIMPLE_8),
        (WILL_IT_BLEND_BLOCK_TS, WILL_IT_BLEND),
        (SIMILAR_TS, SIMILAR_5),
    ],
    ids=["simple8", "willItBlend", "similarFloats"],
)
def test_vectorized_matches_streaming_bits(block_ts, pairs):
    stream_words, _ = roundtrip_streaming(block_ts, pairs)
    ts = np.array([p[0] for p in pairs], dtype=np.int64)
    vb = np.array([p[1] & ((1 << 64) - 1) for p in pairs], dtype=np.uint64)
    vec_words, _ = encode_series(block_ts, ts, vb)
    assert vec_words.tolist() == stream_words

    dts, dvb = decode_series(vec_words)
    np.testing.assert_array_equal(dts, ts)
    np.testing.assert_array_equal(dvb, vb)


def test_empty_block():
    # EncodeGorillaTest.java:467-481: close with no points → decoder yields null
    comp = GorillaCompressor(NOW)
    comp.close()
    words = comp.out.to_words()
    dec = GorillaDecompressor(BitReader(words))
    assert dec.read_pair() is None

    vec_words, _ = encode_series(NOW, np.array([], dtype=np.int64),
                                 np.array([], dtype=np.uint64))
    assert vec_words.tolist() == words
    dts, dvb = decode_series(vec_words)
    assert len(dts) == 0 and len(dvb) == 0


def test_copy_flush_snapshot():
    # EncodeGorillaTest.java:484-500: snapshot without close decodes fine
    comp = GorillaCompressor(NOW)
    comp.add_double(NOW + 1, 1.0)
    comp.add_double(NOW + 2, 1.0)
    words = comp.out.to_words()  # NOT closed
    dec = GorillaDecompressor(BitReader(words + [0] * 4))
    assert dec.read_pair() == (NOW + 1, double_to_bits(1.0))
    assert dec.read_pair() == (NOW + 2, double_to_bits(1.0))

    vec_words, _ = encode_series(
        NOW, np.array([NOW + 1, NOW + 2], dtype=np.int64),
        np.array([double_to_bits(1.0)] * 2, dtype=np.uint64), closed=False)
    assert vec_words.tolist() == words
    dts, dvb = decode_series(np.concatenate([vec_words, np.zeros(4, np.uint64)]),
                             n_points=2)
    assert dts.tolist() == [NOW + 1, NOW + 2]


def test_large_random_doubles_100k():
    # EncodeGorillaTest.java:379-418 analogue (forces buffer expansion)
    rng = np.random.default_rng(42)
    n = 100_000
    ts = NOW + 60 + 60 * np.arange(n, dtype=np.int64)
    vals = np.arange(n) * rng.random(n)
    vb = vals.view(np.uint64)
    words, _ = encode_series(NOW, ts, vb)
    dts, dvb = decode_series(words)
    np.testing.assert_array_equal(dts, ts)
    np.testing.assert_array_equal(dvb, vb)


def test_long_values_roundtrip():
    # EncodeGorillaTest.java:505-544 analogue
    rng = np.random.default_rng(7)
    n = 10_000
    ts = NOW + np.cumsum(rng.integers(1, 20_000, n)).astype(np.int64)
    longs = rng.integers(0, 2**31 - 1, n, dtype=np.int64)
    vb = longs.view(np.uint64)
    words, _ = encode_series(NOW, ts, vb)
    dts, dvb = decode_series(words)
    np.testing.assert_array_equal(dts, ts)
    np.testing.assert_array_equal(dvb.view(np.int64), longs)
    # streaming path agrees bit-for-bit
    comp = GorillaCompressor(NOW)
    for t, b in zip(ts[:500].tolist(), vb[:500].tolist()):
        comp.add_value(t, b)
    comp.close()
    w500, _ = encode_series(NOW, ts[:500], vb[:500])
    assert w500.tolist() == comp.out.to_words()


def test_differential_fcm_roundtrip():
    # EncodeGorillaTest.java:550-589 analogue (streaming only; DFCM is
    # sequential by nature)
    rng = np.random.default_rng(99)
    n = 5_000
    ts = (NOW + 60 + 60 * np.arange(n, dtype=np.int64)).tolist()
    vals = (np.arange(n) * rng.random(n)).tolist()
    comp = GorillaCompressor(NOW, predictor=DifferentialFCM(1024))
    for t, v in zip(ts, vals):
        comp.add_double(t, v)
    comp.close()
    dec = GorillaDecompressor(BitReader(comp.out.to_words()),
                              predictor=DifferentialFCM(1024))
    for t, v in zip(ts, vals):
        pair = dec.read_pair()
        assert pair is not None
        assert pair[0] == t
        assert bits_to_double(pair[1]) == v
    assert dec.read_pair() is None


def test_extreme_double_bit_patterns():
    """NaN payloads, ±0.0, ±Inf, denormals must round-trip bit-exactly —
    the raw-bits contract of Double.doubleToRawLongBits
    (GorillaCompressor.java:66)."""
    specials = [
        double_to_bits(float("nan")),
        0x7FF8000000000001,  # NaN with payload
        0xFFF8000000000000,  # negative quiet NaN
        double_to_bits(float("inf")),
        double_to_bits(float("-inf")),
        double_to_bits(0.0),
        double_to_bits(-0.0),
        double_to_bits(5e-324),
        double_to_bits(1.7976931348623157e308),
        double_to_bits(-5e-324),
    ]
    ts = NOW + 10 * (1 + np.arange(len(specials), dtype=np.int64))
    vb = np.array(specials, dtype=np.uint64)
    words, _ = encode_series(NOW, ts, vb)
    dts, dvb = decode_series(words)
    np.testing.assert_array_equal(dvb, vb)
    # streaming agreement
    comp = GorillaCompressor(NOW)
    for t, b in zip(ts.tolist(), specials):
        comp.add_value(t, b)
    comp.close()
    assert words.tolist() == comp.out.to_words()


def test_dod_minus_one_hits_32bit_bucket():
    """dod == -1 zigzags to 1, minus the free bit → 0 → bitsRequired 0 →
    the reference's switch default (4+32-bit encoding). Pin it."""
    pairs = [(NOW + 100, double_to_bits(1.0)),
             (NOW + 200, double_to_bits(1.0)),
             (NOW + 299, double_to_bits(1.0))]  # deltas 100,100-1 → dod -1
    words, out = roundtrip_streaming(NOW, pairs)
    assert [p[0] for p in out] == [p[0] for p in pairs]
    ts = np.array([p[0] for p in pairs], dtype=np.int64)
    vb = np.array([p[1] for p in pairs], dtype=np.uint64)
    vw, _ = encode_series(NOW, ts, vb)
    assert vw.tolist() == words


def test_payload_serialization_roundtrip():
    ts = np.array([p[0] for p in SIMPLE_8], dtype=np.int64)
    vb = np.array([p[1] for p in SIMPLE_8], dtype=np.uint64)
    words, _ = encode_series(NOW, ts, vb)
    payload = words_to_payload(words)
    back = payload_to_words(payload)
    np.testing.assert_array_equal(back, words)
    dts, dvb = decode_series(payload)
    np.testing.assert_array_equal(dts, ts)


GOLDEN_SIMPLE8_FIRST_WORDS = None  # filled by test below on first failure


def test_golden_bytes_simple8():
    """Frozen payload bytes for the simple-8 vector (generated once by this
    codec; guards against silent format drift that round-trip-only tests
    cannot catch)."""
    ts = np.array([p[0] for p in SIMPLE_8], dtype=np.int64)
    vb = np.array([p[1] for p in SIMPLE_8], dtype=np.uint64)
    words, total_bits = encode_series(NOW, ts, vb)
    payload = words_to_payload(words)
    assert payload.hex() == (
        "0000015d56db5100"  # header word: block ts 1500400800000
        "00000147fe000000"
        "0000000c02fffe05"
        "9a06bf80dc07a000"
        "f103e3c510001000"
        "7b17f02981300000"
        "007c00017cbf03e8"
        "0d6666666666667e"
        "0000da3d4022b333"
        "33333333ffffffff"
        "f000000000000000"
        "0000000000000000"
    )
    assert total_bits == 645
