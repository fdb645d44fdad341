"""gorilla2e (entropy-coded dod stream) codec tests.

Pins: native↔pure-Python bit-identity (both directions), exact
round-trip over adversarial dod/value shapes, frozen golden bytes
(format stability across rounds), byte-size sanity vs v2 on irregular
timestamps, and raw-value-bit transparency through the transcode
maintenance op (v2 → gorilla2e → v2 must reproduce the original v2
payload exactly — the ``transcripts_transcode_serve`` discipline).
"""

import numpy as np
import pytest

from gorilla_tsc_ray.codec import entropy, native
from gorilla_tsc_ray.codec.vectorized import encode_series


def _random_series(rng, n, long_kind=False):
    bts = int(rng.integers(1_500_000_000_000, 1_700_000_000_000))
    deltas = rng.choice(
        [1, 997, 1000, 1000, 1003, 60_000, 2_000_000, 80_000_000], size=n)
    ts = bts + np.cumsum(deltas).astype(np.int64)
    if long_kind:
        vb = rng.integers(-2**62, 2**62, n).astype(np.int64).view(np.uint64)
    else:
        vals = np.where(rng.random(n) < .5, 42.0, rng.normal(100, 30, n))
        vb = vals.astype(np.float64).view(np.uint64)
    return bts, ts, vb


def test_roundtrip_python():
    rng = np.random.default_rng(3)
    for n in (0, 1, 2, 7, 100, 400):
        bts, ts, vb = _random_series(rng, n)
        pay = entropy.encode_block_e_py(bts, ts, vb)
        out_ts, out_v = entropy.decode_block_e_py(pay, n)
        assert (out_ts == ts).all()
        assert (out_v == vb).all()


@pytest.mark.skipif(not native.AVAILABLE, reason="no C compiler")
def test_native_python_parity():
    rng = np.random.default_rng(11)
    for trial in range(25):
        n = int(rng.integers(0, 300))
        bts, ts, vb = _random_series(rng, n, long_kind=bool(trial % 2))
        p_c = native.encode_e(bts, ts, vb)
        p_p = entropy.encode_block_e_py(bts, ts, vb)
        assert p_c == p_p, f"encode mismatch at trial {trial} (n={n})"
        for dec in (native.decode_e, entropy.decode_block_e_py):
            out_ts, out_v = dec(p_c, n)
            assert (out_ts == ts).all() and (out_v == vb).all()


@pytest.mark.skipif(not native.AVAILABLE, reason="no C compiler")
def test_batch_matches_single():
    rng = np.random.default_rng(5)
    series = [_random_series(rng, int(rng.integers(1, 120)))
              for _ in range(17)]
    bts = np.array([s[0] for s in series], dtype=np.int64)
    bounds = np.concatenate(
        ([0], np.cumsum([len(s[1]) for s in series]))).astype(np.int64)
    ts_c = np.concatenate([s[1] for s in series])
    vb_c = np.concatenate([s[2] for s in series])
    data, b_off = native.encode_e_batch(bts, ts_c, vb_c, bounds)
    for i, (b, ts, vb) in enumerate(series):
        single = native.encode_e(b, ts, vb)
        assert data[b_off[i]:b_off[i + 1]].tobytes() == single
    npts = np.diff(bounds)
    out_ts, out_v, out_off = native.decode_e_batch(data, b_off, npts)
    assert (out_ts == ts_c).all() and (out_v == vb_c).all()


def test_golden_bytes_frozen():
    # Format stability pin: these bytes must NEVER change (stores written
    # in earlier rounds must stay readable).  Regenerate ONLY with a
    # deliberate, documented format bump.
    ts = np.array([1001, 2001, 3002, 3003, 250_000], dtype=np.int64)
    vb = np.array([4611686018427387904, 4611686018427387904,
                   4616189618054758400, 13835058055282163712,
                   1], dtype=np.uint64)
    pay = entropy.encode_block_e_py(1000, ts, vb)
    assert pay.hex() == (
        "0000001000000000000003e8000000003cb9abfd564a86b3cc51a800"
        "40000000000000006581c02e00703fc000000000000001")
    out_ts, out_v = entropy.decode_block_e_py(pay, 5)
    assert (out_ts == ts).all() and (out_v == vb).all()


def test_empty_and_single_point():
    e0 = entropy.encode_block_e_py(777, np.array([], np.int64),
                                   np.array([], np.uint64))
    assert len(e0) == 12
    t, v = entropy.decode_block_e_py(e0, 0)
    assert len(t) == 0 and len(v) == 0
    e1 = entropy.encode_block_e_py(777, np.array([778], np.int64),
                                   np.array([99], np.uint64))
    t, v = entropy.decode_block_e_py(e1, 1)
    assert t[0] == 778 and v[0] == 99


def test_size_beats_v2_on_irregular():
    rng = np.random.default_rng(9)
    n = 20_000
    bts = 1_600_000_000_000
    gaps = np.maximum(1, rng.exponential(30_000, n)).astype(np.int64)
    ts = bts + np.cumsum(gaps)
    vb = np.maximum(0, rng.normal(200, 80, n)).round().astype(
        np.float64).view(np.uint64)
    w, _ = encode_series(bts, ts, vb)
    pe = entropy.encode_block_e(bts, ts, vb)
    assert len(pe) < 0.85 * len(w) * 8, (len(pe), len(w) * 8)


def test_transcode_bit_transparency():
    """v2 → gorilla2e → v2 through the transcode maintenance kernel must
    reproduce the ORIGINAL v2 payload bytes (raw-value-bit path, exact
    for long kind past 2^53)."""
    import pyarrow as pa

    from gorilla_tsc_ray.pipelines.retention import _transcode_table

    rng = np.random.default_rng(21)
    rows = []
    for i in range(6):
        bts, ts, vb = _random_series(rng, int(rng.integers(1, 200)),
                                     long_kind=bool(i % 2))
        w, _ = encode_series(bts, ts, vb)
        rows.append({
            "key": f"k{i}", "metric": "m", "block_start": bts,
            "n_points": len(ts), "codec": "gorilla2",
            "value_kind": "long" if i % 2 else "double",
            "payload": np.ascontiguousarray(w).astype(">u8").tobytes(),
        })
    tbl = pa.Table.from_pylist(rows)
    as_e, k1 = _transcode_table(tbl, "gorilla2e")
    assert k1 == 6
    assert all(c == "gorilla2e" for c in as_e.column("codec").to_pylist())
    back, k2 = _transcode_table(as_e, "gorilla2")
    assert k2 == 6
    assert back.column("payload").to_pylist() == \
        tbl.column("payload").to_pylist()
