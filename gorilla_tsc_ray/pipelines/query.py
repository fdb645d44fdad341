"""Query/decode path over a materialized block store.

Mirrors the reference's read path (``GorillaDecompressor`` streaming
iteration) lifted to Ray Data: Parquet-level pruning first (hive ``day``
partitions + ``block_start`` row filters — the block header timestamp is
the prune key, as implied by the 64-bit header at
``GorillaCompressor.java:39-41``), then stateless vectorized decode, then
exact time-range trim on the decoded points.
"""

from __future__ import annotations

import pandas as pd

from ..context import tune_context
from ..stages.series import DAY_MS, decode_blocks_batch_arrow


def scan_points(blocks_root: str, *, t_lo: int | None = None,
                t_hi: int | None = None, conv_ids: list[str] | None = None,
                metric: str | None = None, key_cols=("conv_id", "metric")):
    """Decode points from a block store with pruning.

    - ``t_lo``/``t_hi``: epoch-ms range; blocks are pruned by
      ``block_start`` overlap BEFORE decode (a block spans at most one day).
    - ``conv_ids`` / ``metric``: pushed into the Parquet scan.
    """
    import pyarrow.dataset as pads
    import ray.data

    tune_context()
    flt = None

    def _and(a, b):
        return b if a is None else a & b

    if t_lo is not None:
        flt = _and(flt, pads.field("block_start") > (t_lo - DAY_MS))
    if t_hi is not None:
        flt = _and(flt, pads.field("block_start") <= t_hi)
    if conv_ids is not None:
        flt = _and(flt, pads.field("conv_id").isin(conv_ids))
    if metric is not None:
        flt = _and(flt, pads.field("metric") == metric)

    ds = ray.data.read_parquet(blocks_root, filter=flt)
    pts = ds.map_batches(decode_blocks_batch_arrow, batch_format="pyarrow",
                         fn_kwargs={"key_cols": list(key_cols)})

    if t_lo is None and t_hi is None:
        return pts

    def trim(df: pd.DataFrame) -> pd.DataFrame:
        m = pd.Series(True, index=df.index)
        if t_lo is not None:
            m &= df["ts_ms"] >= t_lo
        if t_hi is not None:
            m &= df["ts_ms"] <= t_hi
        return df[m]

    return pts.map_batches(trim, batch_format="pandas")
