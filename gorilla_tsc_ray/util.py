"""Small shared helpers."""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 6):
    """Round half away from zero — matches SQL ``round()`` semantics
    (DuckDB/ANSI), unlike numpy's round-half-even.  Vectorized."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def hash_u64(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer over an integer array — the zero-copy exchange
    key hash for int64/uint64 key columns (VERDICT r3 #3: replaces
    ``pd.util.hash_pandas_object``'s Arrow→pandas round-trip on the hot
    key paths).  Deterministic across worker processes; int64 inputs are
    reinterpreted (``view``), not copied."""
    x = np.asarray(x)
    x = x.view(np.uint64) if x.dtype == np.int64 else x.astype(np.uint64)
    z = x + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def arrow_col_hash(tbl, col: str) -> np.ndarray:
    """Deterministic uint64 hash of one Arrow column without a full
    to_pandas round-trip: integer columns hash their zero-copy buffer via
    :func:`hash_u64`; string/other columns dictionary-encode (vectorized C)
    and hash only the tiny dictionary with pandas' seed-fixed hash, then
    gather by code.  Python ``hash()`` is per-process salted and must never
    be used here — blocks of one exchange hash in different workers."""
    import pandas as pd
    import pyarrow as pa

    arr = tbl.column(col)
    if pa.types.is_integer(arr.type):
        return hash_u64(arr.to_numpy(zero_copy_only=False))
    if pa.types.is_floating(arr.type):
        return hash_u64(
            arr.to_numpy(zero_copy_only=False).view(np.uint64))
    if pa.types.is_timestamp(arr.type) or pa.types.is_date(arr.type):
        return hash_u64(arr.cast(pa.int64()).to_numpy(zero_copy_only=False))
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    if pa.types.is_dictionary(arr.type):
        enc = arr
    else:
        enc = arr.dictionary_encode()
    codes = enc.indices.fill_null(-1).to_numpy(zero_copy_only=False)
    uniq = enc.dictionary
    dict_hash = np.concatenate([
        pd.util.hash_pandas_object(uniq.to_pandas(), index=False).to_numpy(),
        np.array([np.uint64(0x9E3779B97F4A7C15)])])  # null sentinel slot
    return dict_hash[codes]


def arrow_key_ids(tbl, cols: list[str], n_parts: int) -> np.ndarray:
    """Partition ids in ``[0, n_parts)`` from key columns of an Arrow
    table — the exchange ``key_fn`` body (multi-column combine matches
    :func:`hash_partition_ids`' shape: ``h*1_000_003 + h_next``)."""
    h = arrow_col_hash(tbl, cols[0])
    for c in cols[1:]:
        h = h * np.uint64(1_000_003) + arrow_col_hash(tbl, c)
    return (h % np.uint64(n_parts)).astype(np.int64)


def hash_partition_ids(df, cols: list[str], n_parts: int) -> np.ndarray:
    """Deterministic vectorized partition id from key columns (stable across
    worker processes — pandas' hashing is seed-fixed, unlike ``hash()``)."""
    import pandas as pd

    h = pd.util.hash_pandas_object(df[cols[0]], index=False).to_numpy()
    for c in cols[1:]:
        h = h * np.uint64(1_000_003) + pd.util.hash_pandas_object(
            df[c], index=False).to_numpy()
    return (h % np.uint64(n_parts)).astype(np.int64)
