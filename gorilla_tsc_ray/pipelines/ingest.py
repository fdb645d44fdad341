"""Flagship ingest/rollup pipeline over conversation transcripts.

Topology (SURVEY.md §3.4, tightened): the engine performs exactly ONE
all-to-all exchange for the whole ingest — a conv-hash shuffle — because
dedup, per-turn ordering, gap derivation, rollup buckets, gap-fill and
day-block encode are all conversation-local once whole conversations are
co-located:

    read_parquet(transcripts)                    column-pruned, streaming
    → map_batches: ts→ms, text→text_len, tool→tool_call   (full text never
      rides the shuffle — ~10× smaller exchange)
    → groupby(hash(conv_id) % P)                  THE shuffle
    → per-partition vectorized kernel: dedup + sort + derive + rollup /
      gap-fill / Gorilla day-block encode          (no further exchange)

Rollup output is FINAL after the kernel (a (conv, metric, bucket) group
lives in exactly one partition), so no partial/final merge pass is needed
here — that machinery (stages/rollup.py) serves sources that aren't
pre-partitioned (see pipelines/events.py) and cross-partition cascades.
``canonical_turns`` keeps the text column (it IS the output).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..context import tune_context
from ..sources.transcripts import transcripts_dir
from ..stages.metrics import canonical_turns_partition, derive_metrics_partition
from ..stages.rollup import (TIER_MS, gapfill_group, partial_rollup,
                             reaggregate_partials)
from ..stages.series import DAY_MS, decode_blocks_batch, encode_partition
from ..util import round_half_away

TRANSCRIPT_KEYS = ["conv_id", "metric"]
N_CONV_PARTS = 32  # conv-hash shuffle width ≈ local cores; at cluster
                   # scale set ≫ total cores (shuffle-task overhead is
                   # per-block, so blocks should stay ~100MB+)

ROLLUP_COLS = ["conv_id", "metric", "bucket_ms", "sum_v", "cnt",
               "min_v", "max_v", "last_v"]


def read_transcripts(sf_dir: str, columns: list[str] | None = None):
    """Transcript Dataset with ``ts`` as int64 epoch-ms (``ts_ms``).

    Read parallelism is capped at ``N_CONV_PARTS`` blocks: Ray otherwise
    splits small inputs into hundreds of ~100 KB blocks and per-task
    scheduling overhead dominates the shuffle (at real scale blocks are
    ~128 MB and the cap is a no-op)."""
    import pyarrow.compute as pc
    import ray.data

    tune_context()
    path = transcripts_dir(sf_dir)
    ds = ray.data.read_parquet(path, columns=columns,
                               override_num_blocks=N_CONV_PARTS)

    def to_ms(batch):
        ts_ms = pc.cast(batch["ts"], "int64")  # timestamp[ms] → epoch ms
        return batch.drop_columns(["ts"]).append_column("ts_ms", ts_ms)

    return ds.map_batches(to_ms, batch_format="pyarrow")


def _lean_turns(sf_dir: str):
    """Shuffle-lean turn stream: text/tool reduced to the derived columns
    BEFORE the exchange (prune at the map, not after the shuffle)."""
    import pyarrow.compute as pc

    ds = read_transcripts(sf_dir,
                          columns=["conv_id", "turn_idx", "text", "tool", "ts"])

    def shrink(batch):
        text_len = pc.cast(pc.utf8_length(batch["text"]), "float64")
        tool_call = pc.cast(pc.not_equal(batch["tool"], ""), "float64")
        return (batch.drop_columns(["text", "tool"])
                .append_column("text_len", text_len)
                .append_column("tool_call", tool_call))

    return ds.map_batches(shrink, batch_format="pyarrow")


def _by_conv_partition(ds, kernel, n_parts: int = N_CONV_PARTS,
                       fmt: str = "pandas"):
    """Hash-partition whole conversations, run a vectorized partition-level
    kernel per partition.  ONE bounded-cardinality shuffle; per-group Python
    calls don't survive 10^8 conversations."""
    def add_part(batch):
        # Arrow-native: only the key column is materialized for hashing; the
        # batch itself stays a zero-copy shm-backed Arrow table through the
        # shuffle (anonymous-memory traffic is the bottleneck, not CPU)
        import pyarrow as pa

        key = batch.column("conv_id").to_pandas()
        ids = (pd.util.hash_pandas_object(key, index=False).to_numpy()
               % np.uint64(n_parts)).astype(np.int64)
        return batch.append_column("_cpart", pa.array(ids))

    if fmt == "pyarrow":
        def run(batch):
            return kernel(batch.drop_columns(["_cpart"]))
    else:
        def run(df: pd.DataFrame) -> pd.DataFrame:
            return kernel(df.drop(columns=["_cpart"]))

    return (ds.map_batches(add_part, batch_format="pyarrow")
            .groupby("_cpart").map_groups(run, batch_format=fmt))


def _derive_kernel():
    """Snapshot the custom-metric registry at pipeline-build time — worker
    processes import the module fresh, so the registry must travel inside
    the serialized closure, not as module state."""
    from ..stages.metrics import CUSTOM_METRICS

    custom = dict(CUSTOM_METRICS)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        return derive_metrics_partition(df, custom=custom)

    return kernel


def metric_points(sf_dir: str):
    """Long-format metric points (dedup + derive fused in one conv-hash
    partition pass)."""
    return _by_conv_partition(_lean_turns(sf_dir), _derive_kernel())


def canonical_turns(sf_dir: str):
    """Deduplicated turns under stable (conv_id, turn_idx) ordering — the
    end-to-end text-equality gate."""
    return _by_conv_partition(read_transcripts(sf_dir),
                              canonical_turns_partition)


def _rollup_in_partition(pts: pd.DataFrame, tier: str) -> pd.DataFrame:
    """Complete rollup of one conv partition (the partition holds whole
    conversations, so this IS the final aggregate for its keys)."""
    return partial_rollup(pts, key_cols=TRANSCRIPT_KEYS,
                          bucket_ms=TIER_MS[tier])


def _finalize_df(df: pd.DataFrame) -> pd.DataFrame:
    out = df.drop(columns=["last_ts"])
    out["sum_v"] = round_half_away(out["sum_v"].to_numpy(), 6)
    return out


def rollup_tier(sf_dir: str, tier: str):
    from ..stages.metrics import CUSTOM_METRICS, rollup_turns_arrow

    custom = dict(CUSTOM_METRICS)
    bucket_ms = TIER_MS[tier]

    def kernel(batch):
        # Arrow-native fused dedup+derive+rollup (reduceat over runs) —
        # no pandas conversion, no long-format materialization
        return _finalize_df(rollup_turns_arrow(batch, bucket_ms, custom))

    return _by_conv_partition(_lean_turns(sf_dir), kernel,
                              fmt="pyarrow").select_columns(ROLLUP_COLS)


def rollup_cascade(sf_dir: str, tier: str = "1h"):
    """1m tier re-aggregated to a coarser tier without re-reading turns
    (decomposable partial+final re-aggregation, conv-local)."""

    from ..stages.metrics import CUSTOM_METRICS, rollup_turns_arrow

    custom = dict(CUSTOM_METRICS)

    def kernel(batch):
        one_m = rollup_turns_arrow(batch, TIER_MS["1m"], custom)
        coarse = reaggregate_partials(one_m, key_cols=TRANSCRIPT_KEYS,
                                      bucket_ms=TIER_MS[tier])
        return _finalize_df(coarse)

    return _by_conv_partition(_lean_turns(sf_dir), kernel,
                              fmt="pyarrow").select_columns(ROLLUP_COLS)


def gorilla_blocks(sf_dir: str, metric: str | None = "text_len"):
    """(conv_id, metric, day)-keyed Gorilla block store — derive + encode in
    the same conv partition pass."""

    from ..stages.metrics import CUSTOM_METRICS, encode_turns_arrow

    custom = dict(CUSTOM_METRICS)

    def kernel(batch):
        return encode_turns_arrow(batch, metric=metric, day_ms=DAY_MS,
                                  custom=custom)

    return _by_conv_partition(_lean_turns(sf_dir), kernel, fmt="pyarrow")


def build_store_combined(sf_dir: str, tier: str = "1m"):
    """ONE shuffle → BOTH store outputs: each conv partition emits its
    rollup rows AND its Gorilla block rows in a single kernel pass (union
    schema with a ``kind`` column; split downstream with cheap output-sized
    filters).  This is the real ingest cost model: the exchange is paid
    once, not once per output."""
    from ..stages.metrics import (CUSTOM_METRICS, encode_turns_arrow,
                                  rollup_turns_arrow)

    custom = dict(CUSTOM_METRICS)
    bucket_ms = TIER_MS[tier]

    def kernel(batch):
        rolled = _finalize_df(rollup_turns_arrow(batch, bucket_ms, custom))
        blocks = encode_turns_arrow(batch, metric=None, day_ms=DAY_MS,
                                    custom=custom)
        rolled.insert(0, "kind", "rollup")
        blocks.insert(0, "kind", "block")
        return pd.concat([rolled, blocks], ignore_index=True)

    return _by_conv_partition(_lean_turns(sf_dir), kernel, fmt="pyarrow")


def split_store_outputs(combined):
    """Split the union-schema store build into (rollup_ds, blocks_ds)."""
    def only(kind, cols, int_cols):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df.loc[df["kind"] == kind, cols].copy()
            for c in int_cols:  # union-schema NaNs upcast ints to float
                out[c] = out[c].astype(np.int64)
            return out
        return f

    rollup = combined.map_batches(
        only("rollup", ROLLUP_COLS, ["bucket_ms", "cnt"]),
        batch_format="pandas")
    blocks = combined.map_batches(
        only("block", ["conv_id", "metric", "block_start", "n_points",
                       "codec", "value_kind", "payload"],
             ["block_start", "n_points"]),
        batch_format="pandas")
    return rollup, blocks


def blocks_roundtrip(sf_dir: str, metric: str = "text_len"):
    """Block store decoded back to points — must equal the metric stream."""
    blocks = gorilla_blocks(sf_dir, metric)
    return blocks.map_batches(
        decode_blocks_batch, batch_format="pandas",
        fn_kwargs={"key_cols": ["conv_id", "metric"]},
    ).select_columns(["conv_id", "metric", "ts_ms", "value"])


def gapfill_tier(sf_dir: str, tier: str = "1h", metric: str = "turn_count"):
    bucket_ms = TIER_MS[tier]
    out_cols = TRANSCRIPT_KEYS + ["bucket_ms", "sum_v", "cnt", "last_v",
                                  "filled"]

    derive = _derive_kernel()

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        pts = derive(df)
        pts = pts[pts["metric"] == metric]
        rolled = _rollup_in_partition(pts, tier)
        if len(rolled) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        filled = (rolled.groupby(TRANSCRIPT_KEYS, sort=False, group_keys=False)
                  .apply(gapfill_group, bucket_ms=bucket_ms,
                         key_cols=TRANSCRIPT_KEYS))
        filled = filled.reset_index(drop=True)
        filled["sum_v"] = round_half_away(filled["sum_v"].to_numpy(), 6)
        return filled[out_cols]

    return _by_conv_partition(_lean_turns(sf_dir), kernel)


def _with_day(ds, src_col: str):
    def add(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(day=(df[src_col].to_numpy() // DAY_MS) * DAY_MS)

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

    from ..stages.rollup import cascade_dataset

    results = {}
    # ONE shuffle produces both the block store and the 1m tier; coarser
    # tiers re-aggregate the (much smaller) 1m output — raw turns are read
    # exactly once for the numeric store
    combined = build_store_combined(sf_dir, "1m").materialize()
    rollup_1m, blocks = split_store_outputs(combined)
    blocks = _with_day(blocks, "block_start")
    blocks = blocks.map_batches(lambda df: not_done(df, "block_start"),
                                batch_format="pandas")
    blocks.write_parquet(f"{out_root}/blocks", partition_cols=["day"])
    results["blocks"] = f"{out_root}/blocks"

    rollup_1m = rollup_1m.materialize()
    _with_day(rollup_1m, "bucket_ms").write_parquet(
        f"{out_root}/rollup_1m", partition_cols=["day"])
    results["rollup_1m"] = f"{out_root}/rollup_1m"

    def _with_last_ts(ds):
        # cascade needs last_ts to pick the latest value; reconstruct it as
        # the bucket end (within-1m ordering is already folded into last_v)
        def add(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(last_ts=df["bucket_ms"].astype(np.int64))
        return ds.map_batches(add, batch_format="pandas")

    finer = _with_last_ts(rollup_1m)
    for tier in ("1h", "1d"):
        coarse = cascade_dataset(finer, key_cols=TRANSCRIPT_KEYS, tier=tier)

        def drop_lts(df: pd.DataFrame) -> pd.DataFrame:
            out = df.drop(columns=["last_ts"])
            out["sum_v"] = round_half_away(out["sum_v"].to_numpy(), 6)
            return out

        out_ds = coarse.map_batches(drop_lts, batch_format="pandas")
        _with_day(out_ds, "bucket_ms").write_parquet(
            f"{out_root}/rollup_{tier}", partition_cols=["day"])
        results[f"rollup_{tier}"] = f"{out_root}/rollup_{tier}"
        finer = coarse

    turns = canonical_turns(sf_dir)
    turns.write_parquet(f"{out_root}/turns")
    results["turns"] = f"{out_root}/turns"

    # lineage: one row per block-store day partition of THIS run.  The
    # per-day aggregates are computed INSIDE the dataset (map_batches
    # partials over the already-materialized shuffle output) so the driver
    # only ever sees summary rows — never payload bytes.  Re-reading the
    # whole store to the driver here was round 1's #2 scale-killer
    # (guaranteed OOM at 100 TB).
    def day_partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["day", "rows_in", "rows_out", "bytes_payload"]
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                                 for c in cols})
        w = pd.DataFrame({
            "day": df["day"].to_numpy(),
            "rows_in": df["n_points"].to_numpy(),
            "rows_out": np.ones(len(df), dtype=np.int64),
            "bytes_payload": df["payload"].str.len().to_numpy(),
        })
        return w.groupby("day", as_index=False).sum()

    parts = blocks.map_batches(day_partial,
                               batch_format="pandas").to_pandas()
    rows = []
    if len(parts):
        agg = parts.groupby("day", as_index=False).sum()
        for r in agg.itertuples(index=False):
            rows.append({
                "partition_key": partition_key_for_day(int(r.day)),
                "input_files": [transcripts_dir(sf_dir)],
                "rows_in": int(r.rows_in),
                "rows_out": int(r.rows_out),
                "bytes_payload": int(r.bytes_payload),
                "watermark": int(r.day) + DAY_MS - 1,
                "status": "complete",
            })
    if rows:
        write_lineage(out_root, rows, run_id)
    results["lineage_rows"] = len(rows)
    results["run_id"] = run_id
    return results
