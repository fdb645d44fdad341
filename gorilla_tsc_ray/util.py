"""Small shared helpers."""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 6):
    """Round half away from zero — matches SQL ``round()`` semantics
    (DuckDB/ANSI), unlike numpy's round-half-even.  Vectorized."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale


def hash_partition_ids(df, cols: list[str], n_parts: int) -> np.ndarray:
    """Deterministic vectorized partition id from key columns (stable across
    worker processes — pandas' hashing is seed-fixed, unlike ``hash()``)."""
    import pandas as pd

    h = pd.util.hash_pandas_object(df[cols[0]], index=False).to_numpy()
    for c in cols[1:]:
        h = h * np.uint64(1_000_003) + pd.util.hash_pandas_object(
            df[c], index=False).to_numpy()
    return (h % np.uint64(n_parts)).astype(np.int64)
