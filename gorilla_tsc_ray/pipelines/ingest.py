"""Flagship ingest/rollup pipeline over conversation transcripts.

DAG (SURVEY.md §3.4):
    read_parquet(transcripts)                 — column-pruned, streaming
    → map_batches(ts → int64 ms)              — zero-copy Arrow
    → groupby(conv_id).map_groups(dedup + sort + derive metrics)
    → tee:
        a) rollup tiers 1m → (cascade) 1h → 1d   [partial+final combiners]
        b) (conv_id, metric, day)-keyed Gorilla blocks → Parquet block store
        c) canonical turns table (per-turn text-equality invariant)

Per-series state never leaves a single grouped call; the only all-to-all
exchanges are the conv_id groupby and the (key, bucket) groupby over partial
rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..context import tune_context
from ..sources.transcripts import transcripts_dir
from ..stages.metrics import canonical_turns_group, derive_metrics_group
from ..stages.rollup import TIER_MS, cascade_dataset, gapfill_group, rollup_dataset
from ..stages.series import DAY_MS, add_block_key, decode_blocks_batch, encode_group

TRANSCRIPT_KEYS = ["conv_id", "metric"]


def read_transcripts(sf_dir: str, columns: list[str] | None = None):
    """Transcript Dataset with ``ts`` as int64 epoch-ms (``ts_ms``)."""
    import pyarrow.compute as pc
    import ray.data

    tune_context()
    path = transcripts_dir(sf_dir)
    ds = ray.data.read_parquet(path, columns=columns)

    def to_ms(batch):
        ts_ms = pc.cast(batch["ts"], "int64")  # timestamp[ms] → epoch ms
        return batch.drop_columns(["ts"]).append_column("ts_ms", ts_ms)

    return ds.map_batches(to_ms, batch_format="pyarrow")


def metric_points(sf_dir: str):
    """Long-format metric points (dedup + derive fused in one conv_id pass)."""
    ds = read_transcripts(sf_dir,
                          columns=["conv_id", "turn_idx", "text", "tool", "ts"])
    return ds.groupby("conv_id").map_groups(derive_metrics_group,
                                            batch_format="pandas")


def canonical_turns(sf_dir: str):
    """Deduplicated turns under stable (conv_id, turn_idx) ordering — the
    end-to-end text-equality gate."""
    ds = read_transcripts(sf_dir)
    return ds.groupby("conv_id").map_groups(canonical_turns_group,
                                            batch_format="pandas")


def _finalize(ds):
    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=["last_ts"])
        out["sum_v"] = np.round(out["sum_v"].to_numpy(), 6)
        return out

    return ds.map_batches(fin, batch_format="pandas")


ROLLUP_COLS = ["conv_id", "metric", "bucket_ms", "sum_v", "cnt",
               "min_v", "max_v", "last_v"]


def rollup_tier(sf_dir: str, tier: str):
    pts = metric_points(sf_dir)
    rolled = rollup_dataset(pts, key_cols=TRANSCRIPT_KEYS, tier=tier)
    return _finalize(rolled).select_columns(ROLLUP_COLS)


def rollup_cascade(sf_dir: str, tier: str = "1h"):
    """1m tier re-aggregated to a coarser tier without re-reading turns."""
    pts = metric_points(sf_dir)
    one_m = rollup_dataset(pts, key_cols=TRANSCRIPT_KEYS, tier="1m")
    coarse = cascade_dataset(one_m, key_cols=TRANSCRIPT_KEYS, tier=tier)
    return _finalize(coarse).select_columns(ROLLUP_COLS)


def gorilla_blocks(sf_dir: str, metric: str | None = "text_len"):
    """(conv_id, metric, day)-keyed Gorilla block store."""
    pts = metric_points(sf_dir)
    if metric is not None:
        expr = metric

        def only(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["metric"] == expr]

        pts = pts.map_batches(only, batch_format="pandas")
    keyed = pts.map_batches(add_block_key, batch_format="pyarrow")

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        return encode_group(df, key_cols=["conv_id"],
                            metric=str(df["metric"].iloc[0]))

    return keyed.groupby(["conv_id", "metric", "block_start"]).map_groups(
        enc, batch_format="pandas")


def blocks_roundtrip(sf_dir: str, metric: str = "text_len"):
    """Block store decoded back to points — must equal the metric stream."""
    blocks = gorilla_blocks(sf_dir, metric)
    return blocks.map_batches(
        decode_blocks_batch, batch_format="pandas",
        fn_kwargs={"key_cols": ["conv_id", "metric"]},
    ).select_columns(["conv_id", "metric", "ts_ms", "value"])


def gapfill_tier(sf_dir: str, tier: str = "1h", metric: str = "turn_count"):
    pts = metric_points(sf_dir)

    def only(df: pd.DataFrame) -> pd.DataFrame:
        return df[df["metric"] == metric]

    rolled = rollup_dataset(pts.map_batches(only, batch_format="pandas"),
                            key_cols=TRANSCRIPT_KEYS, tier=tier)
    filled = rolled.groupby(TRANSCRIPT_KEYS).map_groups(
        gapfill_group, batch_format="pandas",
        fn_kwargs={"bucket_ms": TIER_MS[tier], "key_cols": TRANSCRIPT_KEYS},
    )

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sum_v"] = np.round(df["sum_v"].to_numpy(), 6)
        return df

    return filled.map_batches(fin, batch_format="pandas").select_columns(
        ["conv_id", "metric", "bucket_ms", "sum_v", "cnt", "last_v", "filled"])


def ingest_to_store(sf_dir: str, out_root: str):
    """Materialize the full store: block Parquet + rollup tiers + canonical
    turns, written as partitioned Parquet (resumable layout — one directory
    per output, deterministic file naming via Ray's task-indexed parts)."""
    import ray.data  # noqa: F401

    results = {}
    blocks = gorilla_blocks(sf_dir, metric=None)
    blocks.write_parquet(f"{out_root}/blocks")
    results["blocks"] = f"{out_root}/blocks"
    one_m = rollup_tier(sf_dir, "1m")
    one_m.write_parquet(f"{out_root}/rollup_1m")
    results["rollup_1m"] = f"{out_root}/rollup_1m"
    turns = canonical_turns(sf_dir)
    turns.write_parquet(f"{out_root}/turns")
    results["turns"] = f"{out_root}/turns"
    return results
