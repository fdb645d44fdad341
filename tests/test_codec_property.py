"""Property tests: streaming and vectorized codecs are bit-identical on
randomized series, and every series round-trips exactly.

Mirrors the reference's random-data strategy
(EncodeGorillaTest.java:379-418, :505-544) plus hypothesis-driven edge
exploration over timestamps/values the reference never exercises.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from gorilla_tsc_ray.codec import (
    BitReader,
    GorillaCompressor,
    GorillaDecompressor,
    decode_series,
    encode_series,
)
from gorilla_tsc_ray.codec import native

T0 = 1500400800000


def _roundtrip_and_compare(block_ts: int, ts: np.ndarray, vb: np.ndarray):
    words, _ = encode_series(block_ts, ts, vb)
    comp = GorillaCompressor(block_ts)
    for t, b in zip(ts.tolist(), vb.tolist()):
        comp.add_value(t, b)
    comp.close()
    assert words.tolist() == comp.out.to_words(), "vectorized != streaming bits"
    dts, dvb = decode_series(words, use_native=False)
    np.testing.assert_array_equal(dts, ts)
    np.testing.assert_array_equal(dvb, vb)
    # streaming decoder agrees too
    dec = GorillaDecompressor(BitReader(words.tolist()))
    out = list(dec)
    assert [p[0] for p in out] == ts.tolist()
    assert [p[1] for p in out] == vb.tolist()
    # native C kernels (when a compiler is present) are bit-identical too
    if native.AVAILABLE:
        nw, nb = native.encode(block_ts, ts, vb, True)
        assert nw.tolist() == words.tolist(), "native != streaming bits"
        nts, nvb = native.decode(words, len(ts))
        np.testing.assert_array_equal(nts, ts)
        np.testing.assert_array_equal(nvb, vb)


@pytest.mark.parametrize("seed", range(8))
def test_random_irregular_series(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 2000))
    # irregular gaps incl. occasional huge jumps (32-bit dod bucket)
    gaps = rng.choice([1, 7, 60, 1000, 60_000, 5_000_000],
                      p=[.2, .2, .3, .2, .05, .05], size=n)
    ts = T0 + 1 + np.cumsum(gaps).astype(np.int64)
    kind = rng.integers(0, 3)
    if kind == 0:
        vals = rng.normal(1e4, 5e3, n)
        vb = vals.view(np.uint64)
    elif kind == 1:
        # counter-like with repeats (zero-xor path)
        vals = np.repeat(rng.normal(0, 1, n // 3 + 1), 3)[:n]
        vb = vals.view(np.uint64)
    else:
        vb = rng.integers(0, 2**63 - 1, n, dtype=np.int64).view(np.uint64)
    _roundtrip_and_compare(T0, ts, vb)


@settings(max_examples=40, deadline=None)
@given(
    gaps=st.lists(st.integers(min_value=1, max_value=2**26), min_size=1, max_size=60),
    raw=st.lists(st.integers(min_value=0, max_value=2**64 - 1), min_size=1, max_size=60),
)
def test_hypothesis_arbitrary_bits(gaps, raw):
    n = min(len(gaps), len(raw))
    ts = T0 + 1 + np.cumsum(np.array(gaps[:n], dtype=np.int64))
    vb = np.array(raw[:n], dtype=np.uint64)
    _roundtrip_and_compare(T0, ts, vb)


def test_first_delta_bounds():
    # first delta of exactly 2**27 - 2 is the largest legal value
    ts = np.array([T0 + (1 << 27) - 2], dtype=np.int64)
    vb = np.array([123], dtype=np.uint64)
    _roundtrip_and_compare(T0, ts, vb)


def test_single_point():
    _roundtrip_and_compare(T0, np.array([T0 + 1], dtype=np.int64),
                           np.array([0], dtype=np.uint64))


@pytest.mark.parametrize("n", [5, 255, 256, 400])
def test_auto_encode_matches_vectorized(n):
    from gorilla_tsc_ray.codec import encode_series_auto

    rng = np.random.default_rng(n)
    ts = T0 + 1 + np.cumsum(rng.integers(1, 5000, n)).astype(np.int64)
    vb = rng.normal(0, 1e4, n).view(np.uint64)
    for closed in (True, False):
        wv, bv = encode_series(T0, ts, vb, closed=closed)
        wa, ba = encode_series_auto(T0, ts, vb, closed=closed)
        assert wa.tolist() == wv.tolist()
        assert ba == bv


def test_window_thrash():
    """Adversarial series for the run-vectorized window machine: every point
    violates the previous window (alternating huge/tiny XOR shapes)."""
    n = 4000
    ts = T0 + 1 + 10 * np.arange(n, dtype=np.int64)
    vb = np.empty(n, dtype=np.uint64)
    vb[0::4] = np.uint64(0x0000_0000_0000_00FF)
    vb[1::4] = np.uint64(0xFF00_0000_0000_0000)
    vb[2::4] = np.uint64(0x0000_FFFF_0000_0000)
    vb[3::4] = np.uint64(0x0000_0000_0001_0000)
    _roundtrip_and_compare(T0, ts, vb)


def test_long_existing_window_run():
    """Opposite extreme: one window change then thousands of fitting points."""
    n = 10_000
    ts = T0 + 1 + 7 * np.arange(n, dtype=np.int64)
    rng = np.random.default_rng(3)
    # xors confined to a fixed bit window → existing-window path throughout
    base = np.uint64(1) << np.uint64(30)
    vb = np.bitwise_xor.accumulate(
        (rng.integers(1, 255, n, dtype=np.int64).astype(np.uint64)
         << np.uint64(20)) | base)
    _roundtrip_and_compare(T0, ts, vb)
