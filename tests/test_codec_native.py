"""Native C kernel equivalence: every codec variant (v2 LastValue, v1,
v2+DifferentialFCM) produces bit-identical blocks to the streaming reference
classes, and decodes them back exactly — including empty blocks, snapshot
(unclosed) word layout, and extreme double bit patterns.

The native kernels are an optional fast path (compiled on demand via the
system cc, ``codec/native.py``); these tests are skipped where no compiler
exists and the pure-Python paths remain the tested contract there.
"""

from __future__ import annotations

import numpy as np
import pytest

from gorilla_tsc_ray.codec import (
    BitReader,
    CompressorV1,
    DecompressorV1,
    DifferentialFCM,
    GorillaCompressor,
    GorillaDecompressor,
    native,
)

pytestmark = pytest.mark.skipif(not native.AVAILABLE,
                                reason="no C compiler available")

T0 = 1500400800000
CODECS = ["gorilla2", "gorilla1", "gorilla2_dfcm"]


def _stream_encode(block_ts, ts, vb, codec):
    if codec == "gorilla1":
        c = CompressorV1(block_ts)
    elif codec == "gorilla2_dfcm":
        c = GorillaCompressor(block_ts, predictor=DifferentialFCM(1024))
    else:
        c = GorillaCompressor(block_ts)
    for t, b in zip(ts.tolist(), vb.tolist()):
        c.add_value(int(t), int(b))
    c.close()
    return np.array(c.out.to_words(), dtype=np.uint64)


def _stream_decode(words, n, codec):
    if codec == "gorilla1":
        d = DecompressorV1(BitReader(words.tolist()))
    elif codec == "gorilla2_dfcm":
        d = GorillaDecompressor(BitReader(words.tolist()),
                                predictor=DifferentialFCM(1024))
    else:
        d = GorillaDecompressor(BitReader(words.tolist()))
    out_ts, out_v = [], []
    for _ in range(n):
        pair = d.read_pair()
        assert pair is not None
        out_ts.append(pair[0])
        out_v.append(pair[1] & ((1 << 64) - 1))
    return (np.array(out_ts, dtype=np.int64),
            np.array(out_v, dtype=np.uint64))


@pytest.mark.parametrize("codec", CODECS)
@pytest.mark.parametrize("seed", range(6))
def test_native_matches_streaming(codec, seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 1500))
    gaps = rng.choice([1, 7, 60, 1000, 60_000, 5_000_000],
                      p=[.2, .2, .3, .2, .05, .05], size=n)
    ts = T0 + 1 + np.cumsum(gaps).astype(np.int64)
    kind = seed % 3
    if kind == 0:
        vb = rng.normal(1e4, 5e3, n).view(np.uint64)
    elif kind == 1:
        vb = np.repeat(rng.normal(0, 1, n // 3 + 1), 3)[:n].view(np.uint64)
    else:
        vb = rng.integers(0, 2**63 - 1, n, dtype=np.int64).view(np.uint64)
    ref = _stream_encode(T0, ts, vb, codec)
    got, total_bits = native.encode(T0, ts, vb, True, codec)
    assert got.tolist() == ref.tolist()
    dts, dvb = native.decode(ref, n, codec)
    rts, rvb = _stream_decode(ref, n, codec)
    np.testing.assert_array_equal(dts, rts)
    np.testing.assert_array_equal(dvb, rvb)


@pytest.mark.parametrize("codec", CODECS)
def test_native_extreme_doubles(codec):
    vals = np.array([0.0, -0.0, np.inf, -np.inf, np.nan, 5e-324,
                     1.7976931348623157e308, 1.0, 1.0])
    vb = vals.view(np.uint64)
    ts = np.arange(1, len(vb) + 1, dtype=np.int64) * 1000 + 10
    ref = _stream_encode(10, ts, vb, codec)
    got, _ = native.encode(10, ts, vb, True, codec)
    assert got.tolist() == ref.tolist()
    dts, dvb = native.decode(ref, len(vb), codec)
    np.testing.assert_array_equal(dts, ts)
    np.testing.assert_array_equal(dvb, vb)


@pytest.mark.parametrize("codec", CODECS)
def test_native_empty_block(codec):
    ref = _stream_encode(T0, np.array([], dtype=np.int64),
                         np.array([], dtype=np.uint64), codec)
    got, _ = native.encode(T0, np.array([], dtype=np.int64),
                           np.array([], dtype=np.uint64), True, codec)
    assert got.tolist() == ref.tolist()
    dts, dvb = native.decode(ref, 10, codec)
    assert len(dts) == 0 and len(dvb) == 0


def test_native_snapshot_word_layout():
    """Unclosed (snapshot) encode matches the streaming getLongArray
    mid-stream snapshot (EncodeGorillaTest.java:484-500 semantics)."""
    rng = np.random.default_rng(11)
    n = 300
    ts = T0 + 1 + np.cumsum(rng.integers(1, 5000, n)).astype(np.int64)
    vb = rng.normal(0, 1e4, n).view(np.uint64)
    comp = GorillaCompressor(T0)
    for t, b in zip(ts.tolist(), vb.tolist()):
        comp.add_value(int(t), int(b))
    ref = comp.out.to_words()          # snapshot, no close
    ref_bits = comp.out.bit_count
    got, bits = native.encode(T0, ts, vb, False)
    assert got.tolist() == ref
    assert bits == ref_bits
    # a snapshot decodes with an explicit point bound
    dts, dvb = native.decode(got, n)
    np.testing.assert_array_equal(dts, ts)
    np.testing.assert_array_equal(dvb, vb)


def test_native_decode_truncated_block_raises():
    rng = np.random.default_rng(5)
    n = 200
    ts = T0 + 1 + np.cumsum(rng.integers(1, 5000, n)).astype(np.int64)
    vb = rng.normal(0, 1e4, n).view(np.uint64)
    words, _ = native.encode(T0, ts, vb, True)
    with pytest.raises(ValueError):
        native.decode(words[: max(2, len(words) // 2)], n)
