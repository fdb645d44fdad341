"""The per-group pandas kernels are the *reference semantics*; the
partition-level and Arrow-native kernels are the production paths.  These
tests pin all three levels to identical results on randomized partitions
(no Ray needed)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gorilla_tsc_ray.stages.metrics import (
    derive_metrics_group,
    derive_metrics_partition,
    encode_turns_arrow,
    rollup_turns_arrow,
    rollup_turns_partition,
)
from gorilla_tsc_ray.stages.rollup import partial_rollup
from gorilla_tsc_ray.stages.series import encode_partition

T0 = 1_500_400_800_000


def _random_partition(seed: int, n_convs: int = 25,
                      dup_frac: float = 0.1) -> pd.DataFrame:
    """Turn frame for several whole conversations incl. verbatim dups."""
    rng = np.random.default_rng(seed)
    frames = []
    for c in range(n_convs):
        n = int(rng.integers(2, 60))
        ts = T0 + int(rng.integers(0, 10**7)) + np.cumsum(
            rng.integers(1, 300_000, n)).astype(np.int64)
        frames.append(pd.DataFrame({
            "conv_id": f"conv-{rng.integers(0, 10**6):07d}",
            "turn_idx": np.arange(n, dtype=np.int32),
            "ts_ms": ts,
            "text": ["x" * int(k) for k in rng.integers(0, 400, n)],
            "tool": np.where(rng.random(n) < 0.2, "exec", ""),
        }))
    df = pd.concat(frames, ignore_index=True)
    dup = df.sample(frac=dup_frac, random_state=seed)
    return pd.concat([df, dup], ignore_index=True).sample(
        frac=1.0, random_state=seed + 1).reset_index(drop=True)


def _lean(df: pd.DataFrame) -> pd.DataFrame:
    """The pre-shuffle shrink the production pipeline applies."""
    out = df.drop(columns=["text", "tool"])
    out["text_len"] = df["text"].str.len().astype(np.float64)
    out["tool_call"] = (df["tool"].to_numpy() != "").astype(np.float64)
    return out


def _to_arrow(df: pd.DataFrame) -> pa.Table:
    return pa.Table.from_pandas(df, preserve_index=False)


def _sorted(df, cols):
    # dictionary-encoded Arrow outputs arrive as pandas Categorical, which
    # sorts by category order — normalize to plain strings for lexicographic
    # row alignment with the pandas-kernel outputs
    df = df.copy()
    for c in df.columns:
        if isinstance(df[c].dtype, pd.CategoricalDtype):
            df[c] = df[c].astype(str)
    return df.sort_values(cols).reset_index(drop=True)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_derive_partition_equals_per_group(seed):
    part = _random_partition(seed)
    got = _sorted(derive_metrics_partition(part),
                  ["conv_id", "metric", "ts_ms"])
    exp_frames = [derive_metrics_group(g)
                  for _, g in part.groupby("conv_id", sort=False)]
    exp = _sorted(pd.concat(exp_frames, ignore_index=True),
                  ["conv_id", "metric", "ts_ms"])
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["ts_ms"].to_numpy(),
                                  exp["ts_ms"].to_numpy())
    for m in ["turn_count", "text_len", "tool_call", "turn_gap_ms"]:
        g = got[got["metric"] == m]["value"].to_numpy()
        e = exp[exp["metric"] == m]["value"].to_numpy()
        np.testing.assert_array_equal(g, e, err_msg=m)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("bucket_ms", [60_000, 3_600_000])
def test_rollup_pandas_equals_arrow(seed, bucket_ms):
    part = _random_partition(seed)
    key = ["conv_id", "metric", "bucket_ms"]
    a = _sorted(rollup_turns_partition(_lean(part), bucket_ms), key)
    b = _sorted(rollup_turns_arrow(_to_arrow(_lean(part)), bucket_ms)
                .to_pandas(), key)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False,
                                  atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1])
def test_rollup_equals_longformat_partial(seed):
    """Arrow fused rollup == long-format derive → partial_rollup (the
    original two-step semantics)."""
    part = _random_partition(seed)
    key = ["conv_id", "metric", "bucket_ms"]
    a = _sorted(rollup_turns_arrow(_to_arrow(_lean(part)), 60_000)
                .to_pandas(), key)
    pts = derive_metrics_partition(part)
    b = _sorted(partial_rollup(pts, key_cols=["conv_id", "metric"],
                               bucket_ms=60_000), key)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False,
                                  atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1])
def test_encode_arrow_equals_longformat_encode(seed):
    """Arrow fused encode == long-format derive → encode_partition: same
    blocks, same payload bytes."""
    part = _random_partition(seed)
    a = encode_turns_arrow(_to_arrow(_lean(part)), metric=None,
                           day_ms=86_400_000).to_pandas()
    pts = derive_metrics_partition(part).copy()
    pts["block_start"] = (pts["ts_ms"].to_numpy() // 86_400_000) * 86_400_000
    b = encode_partition(pts, key_cols=["conv_id"])
    key = ["conv_id", "metric", "block_start"]
    a = _sorted(a, key)
    b = _sorted(b, key)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a["n_points"].to_numpy(),
                                  b["n_points"].to_numpy())
    assert (a["payload"].to_numpy() == b["payload"].to_numpy()).all()


@pytest.mark.parametrize("seed", [0, 1])
def test_reaggregate_arrow_equals_pandas(seed):
    """Arrow-native tier cascade == the pandas reaggregate_partials."""
    from gorilla_tsc_ray.stages.metrics import reaggregate_arrow
    from gorilla_tsc_ray.stages.rollup import reaggregate_partials

    part = _random_partition(seed)
    one_m = rollup_turns_arrow(_to_arrow(_lean(part)), 60_000)
    key = ["conv_id", "metric", "bucket_ms"]
    a = _sorted(reaggregate_arrow(one_m, bucket_ms=3_600_000).to_pandas(), key)
    b = _sorted(reaggregate_partials(one_m.to_pandas(),
                                     key_cols=["conv_id", "metric"],
                                     bucket_ms=3_600_000), key)
    pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=False,
                                  atol=1e-9)


@pytest.mark.parametrize("seed", [0, 1])
def test_derive_arrow_equals_pandas(seed):
    from gorilla_tsc_ray.stages.metrics import derive_metrics_arrow

    part = _random_partition(seed)
    key = ["conv_id", "metric", "ts_ms", "value"]
    a = _sorted(derive_metrics_arrow(_to_arrow(_lean(part))).to_pandas(), key)
    b = _sorted(derive_metrics_partition(part), key)
    assert len(a) == len(b)
    np.testing.assert_array_equal(a["ts_ms"].to_numpy(), b["ts_ms"].to_numpy())
    np.testing.assert_array_equal(a["value"].to_numpy(), b["value"].to_numpy())
    np.testing.assert_array_equal(a["conv_id"].to_numpy(),
                                  b["conv_id"].to_numpy())


@pytest.mark.parametrize("seed", [0, 1])
def test_canonical_arrow_equals_pandas(seed):
    from gorilla_tsc_ray.stages.metrics import (canonical_turns_arrow,
                                                canonical_turns_partition)

    part = _random_partition(seed)
    part = part.assign(ts_ms=part["ts_ms"].astype(np.int64),
                       role=np.where(part["turn_idx"] % 2 == 0,
                                     "user", "assistant"))
    key = ["conv_id", "turn_idx"]
    a = _sorted(canonical_turns_arrow(_to_arrow(part)).to_pandas(), key)
    b = _sorted(canonical_turns_partition(part), key)
    pd.testing.assert_frame_equal(a, b[a.columns].reset_index(drop=True),
                                  check_dtype=False)


def test_minhasher_unique_path_bit_identical():
    """The signer permutes UNIQUE shingles and drops intra-doc duplicates
    (min over a multiset == min over its support); the banded output must
    be bit-identical to the straightforward occurrence-based signature."""
    import numpy as np
    import pandas as pd

    from gorilla_tsc_ray.stages import dedup as dd

    rng = np.random.default_rng(5)
    vocab = ["tok%d" % i for i in range(12)]
    texts = [" ".join(rng.choice(vocab, rng.integers(1, 60)))
             for _ in range(200)] + ["", "one", "one two"]
    df = pd.DataFrame({"doc_id": np.arange(203, dtype=np.int64),
                       "text": texts})
    mh = dd.MinHasher()
    got = mh(df).reset_index(drop=True)

    sh, bounds = dd._doc_shingle_hashes(df["text"])
    n = len(df)
    sigs = np.empty((n, mh.num_perm), dtype=np.uint64)
    for p0 in range(0, mh.num_perm, 16):
        seeds = mh.seeds[p0:p0 + 16]
        vals = dd.splitmix64(sh[:, None] ^ seeds[None, :])
        sigs[:, p0:p0 + len(seeds)] = np.minimum.reduceat(
            vals, bounds[:-1], axis=0)
    bh = np.empty((n, mh.bands), dtype=np.uint64)
    for b in range(mh.bands):
        seg = sigs[:, b * mh.rows_per_band:(b + 1) * mh.rows_per_band]
        h = np.zeros(n, dtype=np.uint64)
        for j in range(mh.rows_per_band):
            h = h * dd._U(1_000_003) + seg[:, j]
        bh[:, b] = dd.splitmix64(h)
    want = pd.DataFrame({
        "doc_id": np.repeat(df["doc_id"].to_numpy(), mh.bands),
        "band": np.tile(np.arange(mh.bands, dtype=np.int32), n),
        "band_hash": bh.reshape(-1)})
    pd.testing.assert_frame_equal(want, got)


def test_word_packed_tokenizer_bit_identical():
    """_token_hash_flat / _md5_token_hash_flat run the byte-run + packed-
    word tokenizer; hashes and per-doc counts must be bit-identical to the
    historical findall+factorize path on the real corpus + adversarial
    strings (empty docs, unicode, >8- and >16-byte tokens, trailing
    token at buffer end)."""
    import numpy as np
    import pandas as pd

    from gorilla_tsc_ray.stages import dedup as dd

    df = pd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["text"])
    texts = pd.concat([df["text"], pd.Series([
        "", "   ", "one", "one two", "l'école—déjà 3.14 ¡hola! K2 a1b2",
        "x" * 300, "superlongtoken9chars andmore café", "trailingtok",
    ])], ignore_index=True)
    for new, old in [(dd._token_hash_flat, dd._token_hash_flat_objects),
                     (dd._md5_token_hash_flat,
                      dd._md5_token_hash_flat_objects)]:
        h_new, l_new = new(texts)
        h_old, l_old = old(texts)
        assert np.array_equal(l_new, l_old)
        assert np.array_equal(h_new, h_old)
