"""partial_rollup_arrow / reaggregate_partials_arrow pinned equal to the
pandas kernels (incl. the ts-sorted ``last`` tie semantics — Arrow's
stable sort_by + use_threads=False scan order must reproduce pandas'
stable sort_values + groupby().last())."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gorilla_tsc_ray.stages.rollup import (PARTIAL_COLS, partial_rollup,
                                           partial_rollup_arrow,
                                           reaggregate_partials,
                                           reaggregate_partials_arrow)

MINUTE = 60_000


def _pts(n=80_000, seed=11, dup_ts=True):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 86_400_000, n).astype(np.int64)
    if dup_ts:  # force last-value ties at equal ts within a bucket
        ts[rng.integers(0, n, n // 10)] = ts[rng.integers(0, n, n // 10)]
    return pd.DataFrame({
        "user_id": rng.integers(0, 50, n).astype(np.int64),
        "event_type": rng.choice(["a", "b", "c"], n),
        "ts_ms": ts,
        "value": rng.normal(size=n),
    })


def _norm(df: pd.DataFrame, key_cols):
    df = df.sort_values(key_cols + ["bucket_ms"], kind="stable")
    return df.reset_index(drop=True)[key_cols + ["bucket_ms"] + PARTIAL_COLS]


@pytest.mark.parametrize("key_cols", [["user_id"],
                                      ["user_id", "event_type"]])
def test_partial_rollup_arrow_matches_pandas(key_cols):
    df = _pts()
    out_pd = _norm(partial_rollup(df, key_cols=key_cols, bucket_ms=MINUTE),
                   key_cols)
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    out_ar = _norm(partial_rollup_arrow(tbl, key_cols=key_cols,
                                        bucket_ms=MINUTE).to_pandas(),
                   key_cols)
    pd.testing.assert_frame_equal(out_pd, out_ar, check_dtype=False)
    # dtype agreement matters downstream (driver hash is dtype-sensitive)
    assert out_ar["cnt"].dtype == out_pd["cnt"].dtype
    assert out_ar["last_ts"].dtype == np.int64


def test_reaggregate_arrow_matches_pandas():
    df = _pts()
    part = partial_rollup(df, key_cols=["user_id"], bucket_ms=MINUTE)
    out_pd = _norm(reaggregate_partials(part, key_cols=["user_id"],
                                        bucket_ms=60 * MINUTE), ["user_id"])
    tbl = pa.Table.from_pandas(part, preserve_index=False)
    out_ar = _norm(reaggregate_partials_arrow(
        tbl, key_cols=["user_id"], bucket_ms=60 * MINUTE).to_pandas(),
        ["user_id"])
    pd.testing.assert_frame_equal(out_pd, out_ar, check_dtype=False)


def test_partial_rollup_arrow_empty():
    tbl = pa.Table.from_pandas(_pts(64), preserve_index=False).slice(0, 0)
    out = partial_rollup_arrow(tbl, key_cols=["user_id"], bucket_ms=MINUTE)
    assert out.num_rows == 0
    assert out.schema.names == ["user_id", "bucket_ms"] + PARTIAL_COLS
