"""Small shared helpers."""

from __future__ import annotations

import numpy as np


def round_half_away(x, decimals: int = 6):
    """Round half away from zero — matches SQL ``round()`` semantics
    (DuckDB/ANSI), unlike numpy's round-half-even.  Vectorized."""
    x = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    return np.sign(x) * np.floor(np.abs(x) * scale + 0.5) / scale
