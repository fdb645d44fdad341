"""decode_blocks_batch_arrow must be pinned equal to the pandas twin.

The Arrow path consumes payload bytes straight from the Arrow binary
buffer (zero-copy slice when every row takes the native fast path); any
divergence from the row-wise pandas kernel is a correctness bug, not a
perf trade.  Covers: all three codecs, mixed-codec batches, long values,
sliced tables (non-zero Arrow offset), empty batches.
"""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gorilla_tsc_ray.stages.series import (decode_blocks_batch,
                                           decode_blocks_batch_arrow,
                                           encode_partition,
                                           encode_partition_arrow)


def _points(n=50_000, seed=7, int_values=False):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 20, n).astype(np.int64),
        "ts_ms": np.sort(rng.integers(0, 86_400_000 * 3, n)).astype(np.int64),
        "value": (rng.integers(-1000, 1000, n).astype(np.int64)
                  if int_values else rng.normal(size=n)),
    })
    df["block_start"] = (df["ts_ms"] // 86_400_000) * 86_400_000
    return df


def _assert_equal(blocks: pd.DataFrame, tbl: pa.Table = None):
    out_pd = decode_blocks_batch(blocks, key_cols=["user_id"])
    if tbl is None:
        tbl = pa.Table.from_pandas(blocks, preserve_index=False)
    out_ar = decode_blocks_batch_arrow(tbl, key_cols=["user_id"]).to_pandas()
    for o in (out_pd, out_ar):
        o.sort_values(["user_id", "ts_ms", "value"], inplace=True,
                      kind="stable")
        o.reset_index(drop=True, inplace=True)
    pd.testing.assert_frame_equal(out_pd, out_ar)
    return out_ar


@pytest.mark.parametrize("codec", ["gorilla2", "gorilla1", "gorilla2_dfcm"])
def test_arrow_decode_matches_pandas(codec):
    blocks = encode_partition(_points(), key_cols=["user_id"], codec=codec,
                              metric_col=None)
    out = _assert_equal(blocks)
    assert len(out) == 50_000


def test_arrow_decode_mixed_codec_batch():
    df = _points()
    b1 = encode_partition(df.iloc[:20_000], key_cols=["user_id"],
                          codec="gorilla2", metric_col=None)
    b2 = encode_partition(df.iloc[20_000:], key_cols=["user_id"],
                          codec="gorilla1", metric_col=None)
    mix = (pd.concat([b1, b2]).sample(frac=1, random_state=3)
           .reset_index(drop=True))
    out = _assert_equal(mix)
    assert len(out) == 50_000


def test_arrow_decode_long_values():
    blocks = encode_partition(_points(int_values=True), key_cols=["user_id"],
                              metric_col=None, value_kind="long")
    _assert_equal(blocks)


def test_arrow_decode_sliced_table():
    df = _points()
    b1 = encode_partition(df.iloc[:20_000], key_cols=["user_id"],
                          codec="gorilla2", metric_col=None)
    b2 = encode_partition(df.iloc[20_000:], key_cols=["user_id"],
                          codec="gorilla1", metric_col=None)
    mix = (pd.concat([b1, b2]).sample(frac=1, random_state=3)
           .reset_index(drop=True))
    # non-zero Arrow offset: the offsets/data buffer bookkeeping must hold
    sl = pa.Table.from_pandas(mix, preserve_index=False).slice(5, 40)
    _assert_equal(mix.iloc[5:45].reset_index(drop=True), tbl=sl)


def test_arrow_decode_empty():
    blocks = encode_partition(_points(), key_cols=["user_id"],
                              metric_col=None)
    tbl = pa.Table.from_pandas(blocks, preserve_index=False).slice(0, 0)
    out = decode_blocks_batch_arrow(tbl, key_cols=["user_id"])
    assert out.num_rows == 0
    assert out.schema.names == ["user_id", "ts_ms", "value"]


def _assert_blocks_equal(a: pd.DataFrame, b: pd.DataFrame, keys):
    a = a.sort_values(keys, kind="stable").reset_index(drop=True)
    b = b.sort_values(keys, kind="stable").reset_index(drop=True)
    assert len(a) == len(b)
    for c in a.columns:
        if c == "payload":
            assert all(x == y for x, y in zip(a[c], b[c])), "payload bytes"
        else:
            assert (a[c].to_numpy() == b[c].to_numpy()).all(), c


def _dup_points(**kw):
    """Points with duplicate timestamps carrying DIFFERENT values — the
    dedup keep-first semantics depend on sort stability, which is exactly
    what the Arrow kernel's pc.sort_indices must preserve."""
    df = _points(**kw)
    dup = df.iloc[:700].copy()
    dup["value"] = dup["value"].to_numpy() + 99.25
    return pd.concat([df, dup], ignore_index=True)


@pytest.mark.parametrize("codec", ["gorilla2", "gorilla1", "gorilla2_dfcm"])
def test_arrow_encode_matches_pandas(codec):
    df = _dup_points()
    a = encode_partition(df, key_cols=["user_id"], metric_col=None,
                         codec=codec)
    b = encode_partition_arrow(
        pa.Table.from_pandas(df, preserve_index=False),
        key_cols=["user_id"], metric_col=None, codec=codec).to_pandas()
    _assert_blocks_equal(a, b, ["user_id", "block_start"])


def test_arrow_encode_long_values():
    df = _dup_points(int_values=True)
    df["value"] = df["value"].to_numpy().astype(np.int64)
    a = encode_partition(df, key_cols=["user_id"], metric_col=None,
                         value_kind="long")
    b = encode_partition_arrow(
        pa.Table.from_pandas(df, preserve_index=False),
        key_cols=["user_id"], metric_col=None,
        value_kind="long").to_pandas()
    _assert_blocks_equal(a, b, ["user_id", "block_start"])


def test_arrow_encode_metric_and_string_key():
    df = _dup_points()
    df["metric"] = np.where(np.arange(len(df)) % 3 == 0, "rate", "lat")
    df["user_id"] = np.char.add("u", df["user_id"].to_numpy().astype(str))
    a = encode_partition(df, key_cols=["user_id"], metric_col="metric")
    b = encode_partition_arrow(
        pa.Table.from_pandas(df, preserve_index=False),
        key_cols=["user_id"], metric_col="metric").to_pandas()
    _assert_blocks_equal(a, b, ["user_id", "metric", "block_start"])


def test_arrow_encode_sliced_table():
    df = _points(n=5_000)
    tbl = pa.Table.from_pandas(df, preserve_index=False).slice(123, 4000)
    a = encode_partition(df.iloc[123:4123].reset_index(drop=True),
                         key_cols=["user_id"], metric_col=None)
    b = encode_partition_arrow(tbl, key_cols=["user_id"],
                               metric_col=None).to_pandas()
    _assert_blocks_equal(a, b, ["user_id", "block_start"])


def test_arrow_encode_empty():
    tbl = pa.Table.from_pandas(_points(n=100),
                               preserve_index=False).slice(0, 0)
    out = encode_partition_arrow(tbl, key_cols=["user_id"], metric_col=None)
    assert out.num_rows == 0
    assert out.schema.names == ["user_id", "metric", "block_start",
                                "n_points", "codec", "value_kind", "payload"]


def test_arrow_encode_roundtrips_through_arrow_decode():
    df = _dup_points()
    blocks = encode_partition_arrow(
        pa.Table.from_pandas(df, preserve_index=False),
        key_cols=["user_id"], metric_col=None)
    pts = decode_blocks_batch_arrow(blocks, key_cols=["user_id"]).to_pandas()
    exp = (df.drop_duplicates(subset=["user_id", "block_start", "ts_ms"])
           .sort_values(["user_id", "ts_ms"]).reset_index(drop=True))
    got = pts.sort_values(["user_id", "ts_ms"]).reset_index(drop=True)
    assert np.array_equal(exp["ts_ms"].to_numpy(), got["ts_ms"].to_numpy())
    assert np.array_equal(exp["value"].to_numpy(), got["value"].to_numpy())


def test_arrow_encode_property_random_partitions():
    """Random partitions (seeds, user counts, codecs, dup-ts injection) —
    the Arrow encode kernel must emit bit-identical payloads to the pandas
    kernel on every draw."""
    import hypothesis.strategies as st
    from hypothesis import given, settings

    @settings(max_examples=20, deadline=None)
    @given(st.integers(0, 2**32 - 1), st.integers(1, 8),
           st.sampled_from(["gorilla2", "gorilla1", "gorilla2_dfcm"]),
           st.booleans())
    def run(seed, n_users, codec, with_dups):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(1, 3000))
        df = pd.DataFrame({
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "ts_ms": rng.integers(1, 86_400_000 * 2, n).astype(np.int64),
            "value": rng.normal(size=n),
        })
        df["block_start"] = (df["ts_ms"] // 86_400_000) * 86_400_000
        if with_dups:
            dup = df.iloc[: max(1, n // 5)].copy()
            dup["value"] = dup["value"].to_numpy() * 2 + 1
            df = pd.concat([df, dup], ignore_index=True)
        a = encode_partition(df, key_cols=["user_id"], metric_col=None,
                             codec=codec)
        b = encode_partition_arrow(
            pa.Table.from_pandas(df, preserve_index=False),
            key_cols=["user_id"], metric_col=None, codec=codec).to_pandas()
        _assert_blocks_equal(a, b, ["user_id", "block_start"])

    run()


def test_arrow_decode_property_random_blocks():
    """Random block compositions (codec mix, value kinds, duplicate-ts
    dedup at encode, tiny and empty series) — arrow decode must equal the
    pandas kernel on every draw."""
    import hypothesis.strategies as st
    from hypothesis import given, settings

    @settings(max_examples=25, deadline=None)
    @given(st.integers(0, 2**32 - 1), st.integers(2, 6),
           st.sampled_from(["gorilla2", "gorilla1", "gorilla2_dfcm"]),
           st.sampled_from(["gorilla2", "gorilla1"]))
    def run(seed, n_users, codec_a, codec_b):
        rng = np.random.default_rng(seed)
        n = int(rng.integers(2, 4000))
        df = pd.DataFrame({
            "user_id": rng.integers(0, n_users, n).astype(np.int64),
            "ts_ms": np.sort(rng.integers(0, 86_400_000 * 2, n)).astype(
                np.int64),
            "value": rng.normal(size=n),
        })
        df["block_start"] = (df["ts_ms"] // 86_400_000) * 86_400_000
        half = n // 2
        b1 = encode_partition(df.iloc[:half], key_cols=["user_id"],
                              codec=codec_a, metric_col=None)
        b2 = encode_partition(df.iloc[half:], key_cols=["user_id"],
                              codec=codec_b, metric_col=None)
        mix = (pd.concat([b1, b2])
               .sample(frac=1, random_state=seed % 2**31)
               .reset_index(drop=True))
        _assert_equal(mix)

    run()


def test_gorilla2z_roundtrip_and_parity():
    """Archival codec: pandas and Arrow encode paths emit IDENTICAL
    DEFLATE payloads (zlib is deterministic at a fixed level), both
    decode paths restore the exact points, and the wrapped payload is
    strictly smaller than the raw v2 payload on a realistic block."""
    import zlib

    import pandas as pd
    import pyarrow as pa

    from gorilla_tsc_ray.stages import series as se

    rng = np.random.default_rng(11)
    n = 4000
    ts = (86_400_000 + np.cumsum(rng.integers(500, 1500, n))).astype(np.int64)
    vals = np.round(rng.normal(100, 5, n), 2)
    df = pd.DataFrame({
        "user_id": np.full(n, 7, dtype=np.int64),
        "metric": "value", "ts_ms": ts, "value": vals,
        "block_start": np.full(n, 86_400_000, dtype=np.int64)})

    enc_pd = se.encode_partition(df, key_cols=["user_id"], codec="gorilla2z")
    enc_ar = se.encode_partition_arrow(
        pa.Table.from_pandas(df), key_cols=["user_id"], codec="gorilla2z")
    assert enc_pd["codec"].iloc[0] == "gorilla2z"
    pay_pd = enc_pd["payload"].iloc[0]
    pay_ar = enc_ar.column("payload").to_pylist()[0]
    assert pay_pd == pay_ar

    raw = se.encode_partition(df, key_cols=["user_id"], codec="gorilla2")
    assert len(pay_pd) < len(raw["payload"].iloc[0])

    dec_pd = se.decode_blocks_batch(enc_pd, key_cols=["user_id"])
    dec_ar = se.decode_blocks_batch_arrow(
        enc_ar, key_cols=["user_id"]).to_pandas()
    for dec in (dec_pd, dec_ar):
        dec = dec.sort_values("ts_ms").reset_index(drop=True)
        np.testing.assert_array_equal(dec["ts_ms"].to_numpy(), ts)
        np.testing.assert_array_equal(dec["value"].to_numpy(), vals)

    # the wrapper is a pure zlib layer over the v2 payload
    assert zlib.decompress(pay_pd) == raw["payload"].iloc[0]


def test_gorilla2e_roundtrip_and_parity():
    """Entropy codec through the partition kernels: pandas and Arrow
    encode paths emit IDENTICAL payloads, both decode paths restore the
    exact points (including a MIXED v2+e batch), and the payload is
    smaller than raw v2 on an irregular-timestamp block."""
    import pandas as pd
    import pyarrow as pa

    from gorilla_tsc_ray.stages import series as se

    rng = np.random.default_rng(13)
    n = 4000
    ts = (86_400_000 + np.cumsum(
        rng.choice([500, 1000, 30_000, 300_000], n))).astype(np.int64)
    vals = np.round(rng.normal(100, 5, n), 2)
    df = pd.DataFrame({
        "user_id": np.full(n, 7, dtype=np.int64),
        "metric": "value", "ts_ms": ts, "value": vals,
        "block_start": np.full(n, 86_400_000, dtype=np.int64)})

    enc_pd = se.encode_partition(df, key_cols=["user_id"], codec="gorilla2e")
    enc_ar = se.encode_partition_arrow(
        pa.Table.from_pandas(df), key_cols=["user_id"], codec="gorilla2e")
    assert enc_pd["codec"].iloc[0] == "gorilla2e"
    pay_pd = enc_pd["payload"].iloc[0]
    pay_ar = enc_ar.column("payload").to_pylist()[0]
    assert pay_pd == pay_ar

    raw = se.encode_partition(df, key_cols=["user_id"], codec="gorilla2")
    assert len(pay_pd) < len(raw["payload"].iloc[0])

    dec_pd = se.decode_blocks_batch(enc_pd, key_cols=["user_id"])
    dec_ar = se.decode_blocks_batch_arrow(
        enc_ar, key_cols=["user_id"]).to_pandas()
    mix = pd.concat([raw, enc_pd], ignore_index=True)
    dec_mix = se.decode_blocks_batch_arrow(
        pa.Table.from_pandas(mix), key_cols=["user_id"]).to_pandas()
    assert len(dec_mix) == 2 * n
    for dec in (dec_pd, dec_ar):
        dec = dec.sort_values("ts_ms").reset_index(drop=True)
        np.testing.assert_array_equal(dec["ts_ms"].to_numpy(), ts)
        np.testing.assert_array_equal(dec["value"].to_numpy(), vals)
