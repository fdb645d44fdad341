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

from ..util import round_half_away

from ..context import tune_context
from ..sources.transcripts import transcripts_dir
from ..stages.metrics import canonical_turns_partition, derive_metrics_partition
from ..stages.rollup import TIER_MS, cascade_dataset, gapfill_group, rollup_dataset
from ..stages.series import (DAY_MS, add_block_key, decode_blocks_batch,
                             encode_partition)

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


N_CONV_PARTS = 64  # conv-hash shuffle width; at cluster scale set ≫ cores


def _by_conv_partition(ds, kernel, n_parts: int = N_CONV_PARTS):
    """Hash-partition whole conversations, run a vectorized partition-level
    kernel per partition.  ONE bounded-cardinality shuffle replaces the
    per-conversation groupby (per-group Python calls don't survive 10^8
    conversations)."""
    from ..util import hash_partition_ids

    def add_part(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["_cpart"] = hash_partition_ids(out, ["conv_id"], n_parts)
        return out

    def run(df: pd.DataFrame) -> pd.DataFrame:
        return kernel(df.drop(columns=["_cpart"]))

    return (ds.map_batches(add_part, batch_format="pandas")
            .groupby("_cpart").map_groups(run, batch_format="pandas"))


def metric_points(sf_dir: str):
    """Long-format metric points (dedup + derive fused in one conv-hash
    partition pass)."""
    ds = read_transcripts(sf_dir,
                          columns=["conv_id", "turn_idx", "text", "tool", "ts"])
    return _by_conv_partition(ds, derive_metrics_partition)


def canonical_turns(sf_dir: str):
    """Deduplicated turns under stable (conv_id, turn_idx) ordering — the
    end-to-end text-equality gate."""
    ds = read_transcripts(sf_dir)
    return _by_conv_partition(ds, canonical_turns_partition)


def _finalize(ds):
    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=["last_ts"])
        out["sum_v"] = round_half_away(out["sum_v"].to_numpy(), 6)
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
        return encode_partition(df, key_cols=["conv_id"])

    return _by_conv_partition(keyed, enc)


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
        df["sum_v"] = round_half_away(df["sum_v"].to_numpy(), 6)
        return df

    return filled.map_batches(fin, batch_format="pandas").select_columns(
        ["conv_id", "metric", "bucket_ms", "sum_v", "cnt", "last_v", "filled"])


def _with_day(ds, src_col: str):
    def add(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["day"] = (out[src_col].to_numpy() // DAY_MS) * DAY_MS
        return out

    return ds.map_batches(add, batch_format="pandas")


def ingest_to_store(sf_dir: str, out_root: str, resume: bool = True):
    """Materialize the full store as day-partitioned Parquet (hive layout
    ``day=<ms>``), with per-partition lineage rows and prune-on-resume:
    a rerun skips day partitions whose lineage says ``complete`` *before*
    the shuffle (SURVEY.md §3.4)."""
    from ..state.lineage import (completed_partitions, new_run_id,
                                 partition_key_for_day, write_lineage)

    run_id = new_run_id()
    done = completed_partitions(out_root) if resume else set()

    def not_done(df: pd.DataFrame, col: str) -> pd.DataFrame:
        if not done:
            return df
        day = (df[col].to_numpy() // DAY_MS) * DAY_MS
        keys = pd.Series(day).map(partition_key_for_day)
        return df[~keys.isin(done).to_numpy()]

    results = {}
    blocks = _with_day(gorilla_blocks(sf_dir, metric=None), "block_start")
    blocks = blocks.map_batches(lambda df: not_done(df, "block_start"),
                                batch_format="pandas")
    blocks.write_parquet(f"{out_root}/blocks", partition_cols=["day"])
    results["blocks"] = f"{out_root}/blocks"

    for tier in ("1m", "1h", "1d"):
        rolled = _with_day(rollup_tier(sf_dir, tier), "bucket_ms")
        rolled.write_parquet(f"{out_root}/rollup_{tier}",
                             partition_cols=["day"])
        results[f"rollup_{tier}"] = f"{out_root}/rollup_{tier}"

    turns = canonical_turns(sf_dir)
    turns.write_parquet(f"{out_root}/turns")
    results["turns"] = f"{out_root}/turns"

    # lineage: one row per block-store day partition of THIS run
    import pyarrow.dataset as pads

    blk = pads.dataset(f"{out_root}/blocks", partitioning="hive").to_table(
        columns=["day", "n_points", "payload"])
    dfb = blk.to_pandas()
    rows = []
    for day, g in dfb.groupby("day"):
        rows.append({
            "partition_key": partition_key_for_day(int(day)),
            "input_files": [transcripts_dir(sf_dir)],
            "rows_in": int(g["n_points"].sum()),
            "rows_out": len(g),
            "bytes_payload": int(g["payload"].map(len).sum()),
            "watermark": int(day) + DAY_MS - 1,
            "status": "complete",
        })
    if rows:
        write_lineage(out_root, rows, run_id)
    results["lineage_rows"] = len(rows)
    results["run_id"] = run_id
    return results
