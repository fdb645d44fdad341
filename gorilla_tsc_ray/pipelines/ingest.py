"""Flagship ingest/rollup pipeline over conversation transcripts.

Topology (SURVEY.md §3.4, round-2): dedup, per-turn ordering, gap
derivation, rollup buckets, gap-fill and day-block encode are all
conversation-local once whole conversations are co-located, so the whole
ingest needs AT MOST one exchange — and with a conv-bucketed lake layout,
NONE:

  bucketed input (``_BUCKETED_BY`` marker; how a real transcript lake is
  written):
    per-file-group map task: pruned parquet read (conv_id as dictionary,
    materialized f32 stats columns — text bytes never read) → fused
    dedup+derive+rollup/gap-fill/encode kernel.  Zero exchange; LPT-packed
    ≤64 tasks.

  unbucketed input (driver tables, foreign lakes):
    read → shrink → raw-Ray hash exchange on hash(conv_id) % P
    (stages/exchange.py) → the same fused kernel per partition.

Rollup output is FINAL after the kernel (a (conv, metric, bucket) group
lives in exactly one partition/bucket), so no partial/final merge pass is
needed here — that machinery (stages/rollup.py) serves sources that are
not conv-partitioned (see pipelines/events.py) and cross-partition
cascades.  ``canonical_turns`` keeps the text column (it IS the output).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..context import tune_context
from ..sources.transcripts import transcripts_dir
from ..stages.rollup import TIER_MS, gapfill_partition
from ..stages.series import (DAY_MS, decode_blocks_batch,
                             decode_blocks_batch_arrow, encode_partition)
from ..util import round_half_away

TRANSCRIPT_KEYS = ["conv_id", "metric"]
N_CONV_PARTS = 32  # conv-hash shuffle width ≈ local cores; at cluster
                   # scale set ≫ total cores (shuffle-task overhead is
                   # per-block, so blocks should stay ~100MB+)

ROLLUP_COLS = ["conv_id", "metric", "bucket_ms", "sum_v", "cnt",
               "min_v", "max_v", "last_v"]

# append merge: broadcast the delta's (conv, day) supersession pairs up
# to this many bytes (one ray.put, read per task); above it, fall back
# to the conv-hash co-partitioned exchange
_APPEND_PAIR_BROADCAST_CAP = 64 << 20


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


MIN_BUCKET_TASKS = 32   # floor so small sessions still pipeline
LEAN_COLS = ["conv_id", "turn_idx", "text", "tool", "ts"]
FULL_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _map_over_buckets(files: list[str], kernel, *, lean: bool, fmt: str):
    """Shuffle-FREE conv partitioning for bucketed inputs: each bucket file
    already holds whole conversations (``sources/transcripts.py`` layout
    marker), so the fused dedup+derive+rollup/encode kernel runs as pure
    map work — one task per bucket, no exchange.  This is the 100 TB path:
    a real transcript lake is written conv-clustered, and the engine's
    scaling is then bounded by map throughput, not by an all-to-all."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data

    import pyarrow as pa

    tune_context()
    # if the lake materialized the derived stats columns, the lean read
    # skips the text bytes entirely (columns= pushes the prune into the
    # parquet scan)
    have_derived = lean and {"text_len", "tool_call"}.issubset(
        pq.read_schema(files[0]).names)
    if lean:
        cols = (["conv_id", "turn_idx", "ts", "text_len", "tool_call"]
                if have_derived else LEAN_COLS)
    else:
        cols = FULL_COLS

    # Arrow-path reads keep conv_id DICTIONARY-encoded straight from the
    # parquet pages (4 B/row indices instead of materialized strings, and
    # the kernel skips its own dictionary_encode pass).  pandas-path
    # kernels need plain strings (their query outputs are the dtype-stable
    # driver surface), so they read normally.
    read_dict = ["conv_id"] if fmt == "pyarrow" else None

    def run(batch: pd.DataFrame):
        paths = [p for group in batch["paths"] for p in group]
        t = pa.concat_tables([pq.read_table(p, columns=cols,
                                            read_dictionary=read_dict)
                              for p in paths])
        ts_ms = pc.cast(t["ts"], "int64")
        t = t.drop_columns(["ts"]).append_column("ts_ms", ts_ms)
        if lean and not have_derived:
            text_len = pc.cast(pc.utf8_length(t["text"]), "float64")
            tool_call = pc.cast(pc.not_equal(t["tool"], ""), "float64")
            t = (t.drop_columns(["text", "tool"])
                 .append_column("text_len", text_len)
                 .append_column("tool_call", tool_call))
        return kernel(t if fmt == "pyarrow" else t.to_pandas())

    # task count: ~4 tasks per session CPU, floored at MIN_BUCKET_TASKS,
    # never more than files; scheduling is per-task, so the count must not
    # grow with input size.  Files are LPT-bin-packed by byte size so
    # every wave is balanced (zipf conv lengths make bucket sizes vary
    # ~3×).  Each task concatenates its (conv-complete) files and runs the
    # kernel once.  2 tasks/CPU was the round-2 setting; after the
    # encode-wave kernels the per-task runtime spread (byte-balanced ≠
    # time-balanced: 149 ms–1.78 s measured at 64 tasks) made one
    # straggler own ~half the wall — 4 waves measured best at every level
    # (4/16/32 CPUs: 3.6/1.14/1.22 s vs 4.5/1.43/1.35 s at 2 waves; 8
    # waves regresses to 1.52 s at 16, dispatch overhead).
    import heapq
    import os

    import ray

    try:
        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        cpus = 16
    n_tasks = min(len(files), max(MIN_BUCKET_TASKS, 4 * cpus))
    heap = [(0, i) for i in range(n_tasks)]  # (assigned bytes, group)
    heapq.heapify(heap)
    groups: list[list[str]] = [[] for _ in range(n_tasks)]
    for f in sorted(files, key=os.path.getsize, reverse=True):
        sz, g = heapq.heappop(heap)
        groups[g].append(f)
        heapq.heappush(heap, (sz + os.path.getsize(f), g))
    ds = ray.data.from_items([{"paths": g} for g in groups if g],
                             override_num_blocks=n_tasks)
    return ds.map_batches(run, batch_size=None, batch_format="pandas")


def _conv_partitioned(sf_dir: str, kernel, *, lean: bool = True,
                      fmt: str = "pandas"):
    """Dispatch: bucketed input → per-bucket map (no exchange); otherwise
    the general conv-hash shuffle path."""
    from ..sources.transcripts import bucketed_files

    files = bucketed_files(transcripts_dir(sf_dir))
    if files is not None:
        return _map_over_buckets(files, kernel, lean=lean, fmt=fmt)
    ds = _lean_turns(sf_dir) if lean else read_transcripts(sf_dir)
    return _by_conv_partition(ds, kernel, fmt=fmt)


def _by_conv_partition(ds, kernel, n_parts: int = N_CONV_PARTS,
                       fmt: str = "pandas"):
    """Hash-partition whole conversations, run a vectorized partition-level
    kernel per partition.  ONE bounded-cardinality exchange (raw-Ray hash
    exchange — the sort-based groupby was round 1's measured single-node
    cap); per-group Python calls don't survive 10^8 conversations."""
    from ..stages.exchange import hash_exchange

    def key_fn(tbl):
        from ..util import arrow_col_hash
        return (arrow_col_hash(tbl, "conv_id")
                % np.uint64(n_parts)).astype(np.int64)

    return hash_exchange(ds, key_fn=key_fn, n_parts=n_parts,
                         kernel=kernel, fmt=fmt)


def metric_points(sf_dir: str):
    """Long-format metric points (dedup + derive fused in one conv
    partition pass; Arrow-native kernel — strings via C++ takes)."""
    from ..stages.metrics import CUSTOM_METRICS, derive_metrics_arrow

    custom = dict(CUSTOM_METRICS)

    def kernel(batch):
        return derive_metrics_arrow(batch, custom)

    return _conv_partitioned(sf_dir, kernel, fmt="pyarrow")


def _ts_window_filter(ts_lo, ts_hi, col: str = "ts_ms"):
    """Batch-level event-time window ``[ts_lo, ts_hi)`` (either side
    open) — the ingest-batch boundary of the continuous-aggregate append
    path.  Applied BEFORE dedup, so the exactly-once contract is: rows
    duplicated ACROSS batches must be byte-identical (same ts), which the
    upstream watermark split guarantees."""
    import pyarrow.compute as pc

    def f(batch):
        m = None
        if ts_lo is not None:
            m = pc.greater_equal(batch[col], ts_lo)
        if ts_hi is not None:
            hi = pc.less(batch[col], ts_hi)
            m = hi if m is None else pc.and_(m, hi)
        return batch if m is None else batch.filter(m)

    return f


def canonical_turns(sf_dir: str, ts_lo: int | None = None,
                    ts_hi: int | None = None):
    """Deduplicated turns under stable (conv_id, turn_idx) ordering — the
    end-to-end text-equality gate.  ``ts_lo``/``ts_hi`` restrict to an
    event-time window (the append-batch boundary)."""
    from ..stages.metrics import canonical_turns_arrow

    win = _ts_window_filter(ts_lo, ts_hi)

    def kernel(batch):
        return canonical_turns_arrow(win(batch))

    return _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")


def _finalize_tbl(tbl, plain_strings: bool = False):
    """Arrow finalize: drop the internal last_ts, round sum_v to 6 decimals
    (numpy half-away — must stay bit-identical to the pandas finalizer).
    ``plain_strings`` casts the dictionary-encoded key columns to plain
    strings — the driver-facing query surface stays dtype-stable while the
    store build keeps the 4-byte/row dictionary representation."""
    import pyarrow as pa
    import pyarrow.compute as pc

    sum_v = round_half_away(tbl["sum_v"].to_numpy(zero_copy_only=False), 6)
    i = tbl.schema.get_field_index("sum_v")
    tbl = tbl.set_column(i, "sum_v", pa.array(sum_v)).drop_columns(["last_ts"])
    if plain_strings:
        for name in ("conv_id", "metric"):
            j = tbl.schema.get_field_index(name)
            tbl = tbl.set_column(j, name, pc.cast(tbl[name], pa.string()))
    return tbl


def rollup_tier(sf_dir: str, tier: str):
    from ..stages.metrics import CUSTOM_METRICS, rollup_turns_arrow

    custom = dict(CUSTOM_METRICS)
    bucket_ms = TIER_MS[tier]

    def kernel(batch):
        # Arrow-native fused dedup+derive+rollup (reduceat over runs) —
        # no pandas conversion, no long-format materialization
        return _finalize_tbl(rollup_turns_arrow(batch, bucket_ms, custom),
                             plain_strings=True)

    return _conv_partitioned(sf_dir, kernel,
                             fmt="pyarrow").select_columns(ROLLUP_COLS)


def rollup_cascade(sf_dir: str, tier: str = "1h"):
    """1m tier re-aggregated to a coarser tier without re-reading turns
    (decomposable partial+final re-aggregation, conv-local, Arrow-native
    end to end)."""

    from ..stages.metrics import (CUSTOM_METRICS, reaggregate_arrow,
                                  rollup_turns_arrow)

    custom = dict(CUSTOM_METRICS)

    def kernel(batch):
        one_m = rollup_turns_arrow(batch, TIER_MS["1m"], custom)
        coarse = reaggregate_arrow(one_m, bucket_ms=TIER_MS[tier])
        return _finalize_tbl(coarse, plain_strings=True)

    return _conv_partitioned(sf_dir, kernel,
                             fmt="pyarrow").select_columns(ROLLUP_COLS)


def gorilla_blocks(sf_dir: str, metric: str | None = "text_len"):
    """(conv_id, metric, day)-keyed Gorilla block store — derive + encode in
    the same conv partition pass."""

    from ..stages.metrics import CUSTOM_METRICS, encode_turns_arrow

    custom = dict(CUSTOM_METRICS)

    def kernel(batch):
        return encode_turns_arrow(batch, metric=metric, day_ms=DAY_MS,
                                  custom=custom)

    return _conv_partitioned(sf_dir, kernel, fmt="pyarrow")


BLOCK_OUT_COLS = ["conv_id", "metric", "block_start", "n_points",
                  "codec", "value_kind", "payload"]

# ONE union schema for the combined store build: Arrow nullable columns keep
# their types (no int→float NaN upcast) and every batch shares the exact
# same schema, which kills the per-batch "Failed to hash the schemas"
# re-serialization Ray otherwise does on pandas blocks.
# Union layout for the one-pass store build.  Typed Arrow nulls allocate
# full-width buffers (8 B/row for an int64 of nulls), so a naive
# rollup ∪ block wide schema costs ~30 extra bytes on EVERY rollup row.
# Instead block rows REUSE the rollup columns (block_start rides bucket_ms,
# n_points rides cnt) and the constant codec/value_kind pair is folded into
# the `kind` dictionary value ("block:<codec>:<value_kind>" — dictionary
# encoded, so ~free).  Only `payload` is genuinely extra (4 B offsets on
# rollup rows).
_UNION_COLS = ["kind", "conv_id", "metric", "bucket_ms", "sum_v", "cnt",
               "min_v", "max_v", "last_v", "payload"]


def _union_rollup(rolled):
    import pyarrow as pa

    from ..stages.metrics import _const_dict

    n = rolled.num_rows
    return pa.table({
        "kind": _const_dict("rollup", n),
        "conv_id": rolled["conv_id"], "metric": rolled["metric"],
        "bucket_ms": rolled["bucket_ms"], "sum_v": rolled["sum_v"],
        "cnt": rolled["cnt"], "min_v": rolled["min_v"],
        "max_v": rolled["max_v"], "last_v": rolled["last_v"],
        "payload": pa.nulls(n, pa.binary()),
    })


def _union_blocks(blocks):
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.metrics import _const_dict

    n = blocks.num_rows
    cvals = pc.unique(pc.cast(blocks["codec"], pa.string())).to_pylist()
    kvals = pc.unique(pc.cast(blocks["value_kind"], pa.string())).to_pylist()
    assert len(cvals) <= 1 and len(kvals) <= 1, "mixed-codec kernel output"
    kind = f"block:{cvals[0]}:{kvals[0]}" if n else "block:none:none"
    return pa.table({
        "kind": _const_dict(kind, n),
        "conv_id": blocks["conv_id"], "metric": blocks["metric"],
        "bucket_ms": blocks["block_start"], "sum_v": pa.nulls(n, pa.float64()),
        "cnt": blocks["n_points"], "min_v": pa.nulls(n, pa.float64()),
        "max_v": pa.nulls(n, pa.float64()), "last_v": pa.nulls(n, pa.float64()),
        "payload": blocks["payload"],
    })


def build_store_combined(sf_dir: str, tier: str = "1m",
                         ts_lo: int | None = None,
                         ts_hi: int | None = None):
    """ONE input pass → BOTH store outputs: each conv partition emits its
    rollup rows AND its Gorilla block rows in a single kernel pass (union
    Arrow schema with a ``kind`` column; split downstream with cheap
    output-sized filters).  This is the real ingest cost model: the input
    is read (and, for unbucketed inputs, shuffled) once, not once per
    output."""
    import pyarrow as pa

    from ..stages.metrics import (CUSTOM_METRICS, encode_turns_arrow,
                                  rollup_turns_arrow)

    custom = dict(CUSTOM_METRICS)
    bucket_ms = TIER_MS[tier]
    # ``ts_hi`` cuts FUTURE rows before the kernel; ``ts_lo`` does NOT cut
    # the input — the conv bucket's full history stays visible so
    # adjacency-derived metrics (turn_gap_ms) are exact across the batch
    # boundary — it restricts the EMITTED groups to (conv, day) pairs
    # that contain at least one new row (the append-delta contract).
    win = _ts_window_filter(None, ts_hi)

    def kernel(batch):
        batch = win(batch)
        if ts_lo is not None:
            batch = _append_prune_batch(batch, ts_lo)
        out = pa.concat_tables([
            _union_rollup(_finalize_tbl(
                rollup_turns_arrow(batch, bucket_ms, custom))),
            _union_blocks(encode_turns_arrow(batch, metric=None,
                                             day_ms=DAY_MS, custom=custom)),
        ])
        if ts_lo is not None:
            out = _filter_new_conv_days(out, batch, ts_lo)
        return out

    return _conv_partitioned(sf_dir, kernel, fmt="pyarrow")


def _append_prune_batch(batch, ts_lo: int):
    """Delta-input pruning for the append path: keep rows of the boundary
    day onward (``>= day_floor(ts_lo)`` — a recomputed (conv, day) group
    needs ALL of that day's rows) plus ONE carry row per conv — the last
    turn before the boundary day, whose timestamp anchors the first new
    turn's ``turn_gap_ms``.  The carry row's own groups land on old days
    and are dropped by ``_filter_new_conv_days``.  Kernel compute becomes
    O(delta + convs) instead of O(history)."""
    import pyarrow as pa

    ts = batch["ts_ms"].to_numpy(zero_copy_only=False)
    day0 = (ts_lo // DAY_MS) * DAY_MS
    keep = ts >= day0
    if keep.all() or not keep.any():
        return batch if keep.all() else batch.slice(0, 0)
    old = np.flatnonzero(~keep)
    codes, _ = pd.factorize(batch["conv_id"].to_pandas(), sort=False)
    tidx = batch["turn_idx"].to_numpy(
        zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ts[old], tidx[old], codes[old]))
    o = old[order]
    last_of_conv = np.concatenate((codes[o][1:] != codes[o][:-1], [True]))
    keep[o[last_of_conv]] = True
    return batch.filter(pa.array(keep))


def _filter_new_conv_days(out, batch, ts_lo: int):
    """Keep only output groups whose (conv, day) contains at least one
    input row with ``ts_ms >= ts_lo`` — the append delta.  Both rollup
    rows (``bucket_ms``) and block rows (``bucket_ms`` = day-aligned
    ``block_start``) floor to the same day key.  Group-sized work only."""
    import pyarrow as pa

    ts = batch["ts_ms"].to_numpy(zero_copy_only=False)
    newm = ts >= ts_lo
    if not newm.any():
        return out.slice(0, 0)
    conv_in = batch["conv_id"].to_pandas().astype(str).to_numpy()[newm]
    day_in = (ts[newm] // DAY_MS) * DAY_MS
    out_day = (out["bucket_ms"].to_numpy(zero_copy_only=False)
               // DAY_MS) * DAY_MS
    out_conv = out["conv_id"].to_pandas().astype(str).to_numpy()
    keep = pd.MultiIndex.from_arrays([out_conv, out_day]).isin(
        pd.MultiIndex.from_arrays([conv_in, day_in]))
    return out.filter(pa.array(keep))


def _kind_mask(tbl, pred):
    """Boolean mask over rows by predicate on the `kind` DICTIONARY VALUES
    (evaluated once per distinct value, fanned out by indices — no n-sized
    string materialization)."""
    import pyarrow as pa

    c = tbl["kind"].chunk(0)
    vals = c.dictionary.to_pylist()
    sel = np.array([bool(pred(v)) for v in vals], dtype=bool)
    idx = c.indices.to_numpy(zero_copy_only=False)
    return pa.array(sel[idx])


def split_store_outputs(combined):
    """Split the union-schema store build into (rollup_ds, blocks_ds),
    undoing the column reuse of :func:`_union_rollup`/:func:`_union_blocks`."""
    import pyarrow as pa

    from ..stages.metrics import _empty_block_table

    def rollup_f(tbl):
        tbl = tbl.combine_chunks()
        if tbl.num_rows == 0:
            return tbl.select(ROLLUP_COLS)
        return tbl.filter(_kind_mask(tbl, lambda v: v == "rollup")).select(
            ROLLUP_COLS)

    def blocks_f(tbl):
        tbl = tbl.combine_chunks()
        if tbl.num_rows == 0:
            return _empty_block_table()
        out = tbl.filter(_kind_mask(tbl, lambda v: v.startswith("block:")))
        out = out.combine_chunks()
        if out.num_rows == 0:
            return _empty_block_table()
        kc = out["kind"].chunk(0)
        parts = [v.split(":") if v.startswith("block:") else ["", "", ""]
                 for v in kc.dictionary.to_pylist()]
        codec = pa.DictionaryArray.from_arrays(
            kc.indices, pa.array([p[1] for p in parts]))
        value_kind = pa.DictionaryArray.from_arrays(
            kc.indices, pa.array([p[2] for p in parts]))
        return pa.table({
            "conv_id": out["conv_id"], "metric": out["metric"],
            "block_start": out["bucket_ms"], "n_points": out["cnt"],
            "codec": codec, "value_kind": value_kind,
            "payload": out["payload"],
        })

    rollup = combined.map_batches(rollup_f, batch_format="pyarrow")
    blocks = combined.map_batches(blocks_f, batch_format="pyarrow")
    return rollup, blocks


def blocks_roundtrip(sf_dir: str, metric: str = "text_len"):
    """Block store decoded back to points — must equal the metric stream."""
    blocks = gorilla_blocks(sf_dir, metric)
    return blocks.map_batches(
        decode_blocks_batch_arrow, batch_format="pyarrow",
        fn_kwargs={"key_cols": ["conv_id", "metric"]},
    ).select_columns(["conv_id", "metric", "ts_ms", "value"])


def gapfill_tier(sf_dir: str, tier: str = "1h", metric: str = "turn_count"):
    bucket_ms = TIER_MS[tier]
    out_cols = TRANSCRIPT_KEYS + ["bucket_ms", "sum_v", "cnt", "last_v",
                                  "filled"]

    from ..stages.metrics import CUSTOM_METRICS, rollup_turns_arrow

    custom = dict(CUSTOM_METRICS)

    def kernel(batch):
        import pyarrow as pa
        import pyarrow.compute as pc

        rolled = rollup_turns_arrow(batch, bucket_ms, custom)
        rolled = rolled.combine_chunks()
        if rolled.num_rows == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        mc = rolled["metric"].chunk(0)
        sel = np.array([v == metric for v in mc.dictionary.to_pylist()])
        sub = rolled.filter(pa.array(
            sel[mc.indices.to_numpy(zero_copy_only=False)]))
        df = sub.to_pandas()
        for c in TRANSCRIPT_KEYS:  # dictionary → plain (driver surface)
            df[c] = df[c].astype(str)
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in out_cols})
        filled = gapfill_partition(df, bucket_ms=bucket_ms,
                                   key_cols=TRANSCRIPT_KEYS)
        filled["sum_v"] = round_half_away(filled["sum_v"].to_numpy(), 6)
        return filled[out_cols]

    return _conv_partitioned(sf_dir, kernel, fmt="pyarrow")


def _with_day(ds, src_col: str):
    def add(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(day=(df[src_col].to_numpy() // DAY_MS) * DAY_MS)

    return ds.map_batches(add, batch_format="pandas")


def ingest_to_store(sf_dir: str, out_root: str, resume: bool = True,
                    ts_lo: int | None = None, ts_hi: int | None = None):
    """Materialize the full store as day-partitioned Parquet (hive layout
    ``day=<ms>``), with per-partition lineage rows and prune-on-resume:
    a rerun skips day partitions whose lineage says ``complete`` *before*
    the shuffle (SURVEY.md §3.4).  ``ts_lo``/``ts_hi`` restrict the build
    to an event-time window — the first batch of a continuous-aggregate
    ingest (later batches arrive via :func:`append_to_store`)."""
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
    combined = build_store_combined(sf_dir, "1m", ts_lo, ts_hi).materialize()
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

    turns = canonical_turns(sf_dir, ts_lo, ts_hi)
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


def gap_quantiles(sf_dir: str, qs=(0.5, 0.95, 0.99)):
    """Per-conversation response-latency percentiles: exact quantiles of
    the ``turn_gap_ms`` metric, fused dedup → derive → quantile in ONE
    conv-partitioned pass (bucketed lake → shuffle-free map tasks; the
    quantile math is the shared switched-lerp kernel that bit-matches
    DuckDB ``quantile_cont`` after the 6-decimal round).  Conversations
    with a single turn have no gap and are absent, matching the SQL."""
    import pyarrow.compute as pc

    from ..stages.metrics import CUSTOM_METRICS, derive_metrics_arrow
    from ..stages.rollup import quantiles_by_key

    custom = dict(CUSTOM_METRICS)

    def kernel(batch):
        m = derive_metrics_arrow(batch, custom)
        m = m.filter(pc.equal(pc.cast(m["metric"], "string"), "turn_gap_ms"))
        df = pd.DataFrame({
            "conv_id": m["conv_id"].to_pandas().astype(str),
            "value": m["value"].to_numpy(zero_copy_only=False),
        })
        return quantiles_by_key(df, key_col="conv_id", qs=qs)

    return _conv_partitioned(sf_dir, kernel, fmt="pyarrow")


def rollup_wide(sf_dir: str, tier: str = "1h"):
    """Long→wide PIVOT of the metric rollup: one row per (conv, bucket)
    with one summed column per standard metric — the reshape operator,
    fused into the same conv-partitioned pass (whole conversations per
    block ⇒ whole (conv, bucket) groups per task; no exchange).  Metric
    absent in a bucket → 0.0, matching the SQL ``coalesce(sum(...)
    FILTER ...)``."""
    from ..stages.metrics import CUSTOM_METRICS, rollup_turns_arrow

    bucket_ms = TIER_MS[tier]
    metrics = ["turn_count", "text_len", "tool_call", "turn_gap_ms"]
    custom = dict(CUSTOM_METRICS)

    def kernel(batch):
        t = _finalize_tbl(rollup_turns_arrow(batch, bucket_ms, custom),
                          plain_strings=True)
        df = t.select(["conv_id", "metric", "bucket_ms",
                       "sum_v"]).to_pandas()
        wide = (df.set_index(["conv_id", "bucket_ms", "metric"])["sum_v"]
                .unstack("metric").reindex(columns=metrics)
                .fillna(0.0).reset_index())
        wide.columns.name = None
        return wide

    return _conv_partitioned(sf_dir, kernel, fmt="pyarrow")


def conv_stats(sf_dir: str):
    """Conversation-level feature table — the per-document feature
    extraction a transcript-filtering pipeline keys on: turn count, total
    text length, tool-call ratio, wall duration, mean turn gap.  Fused
    dedup → aggregate in ONE conv-partitioned pass (shuffle-free on the
    bucketed lake)."""
    import pyarrow.compute as pc

    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        t = canonical_turns_arrow(batch)
        df = pd.DataFrame({
            "conv_id": t["conv_id"].to_pandas().astype(str),
            "ts_ms": t["ts_ms"].to_numpy(zero_copy_only=False),
            "text_len": pc.utf8_length(
                pc.cast(t["text"], "string")).to_numpy(
                    zero_copy_only=False).astype(np.float64),
            "tool": (pc.not_equal(pc.cast(t["tool"], "string"), "")
                     .to_numpy(zero_copy_only=False).astype(np.float64)),
        })
        g = df.groupby("conv_id", sort=False)
        out = g.agg(n_turns=("ts_ms", "size"),
                    total_text_len=("text_len", "sum"),
                    tool_ratio=("tool", "mean"),
                    t_min=("ts_ms", "min"), t_max=("ts_ms", "max"))
        out = out.reset_index()
        out["n_turns"] = out["n_turns"].astype(np.int64)
        out["total_text_len"] = out["total_text_len"].astype(np.int64)
        out["tool_ratio"] = round_half_away(out["tool_ratio"].to_numpy(), 6)
        out["duration_ms"] = (out["t_max"] - out["t_min"]).astype(np.int64)
        return out[["conv_id", "n_turns", "total_text_len", "tool_ratio",
                    "duration_ms"]]

    return _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")


def role_transitions(sf_dir: str):
    """Role bigrams over canonical turn order (user→assistant patterns):
    per-conv shift-compare inside the shuffle-free conv pass, tiny (cur,
    next) cells merged in one small exchange."""
    from ..stages.exchange import hash_exchange
    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        t = canonical_turns_arrow(batch)
        df = pd.DataFrame({
            "conv_id": t["conv_id"].to_pandas().astype(str),
            "role": t["role"].to_pandas().astype(str),
        })
        # canonical order within conv is (turn_idx) — already sorted
        conv = df["conv_id"].to_numpy()
        role = df["role"].to_numpy()
        same = conv[1:] == conv[:-1]
        out = pd.DataFrame({"cur_role": role[:-1][same],
                            "next_role": role[1:][same]})
        return (out.groupby(["cur_role", "next_role"], sort=False)
                .size().rename("cnt").reset_index())

    partials = _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")

    def key_fn(tbl):
        from ..util import arrow_col_hash
        return (arrow_col_hash(tbl, "cur_role")
                % np.uint64(4)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["cur_role", "next_role"], sort=False)["cnt"]
               .sum().reset_index())
        out["cnt"] = out["cnt"].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=key_fn, n_parts=4, kernel=merge,
                         fmt="pandas")


def response_latency(sf_dir: str):
    """Assistant response latency — the agent-quality metric a transcript
    pipeline monitors: for every canonical user turn whose NEXT turn (in
    turn_idx order) is an assistant turn, latency = the ts gap, and each
    conversation reports count / total / max / median.  Exact integer
    milliseconds end-to-end (median = the lower order statistic at rank
    ``(n−1)//2``, the winsorize discipline — no float averaging).

    Conversations live whole inside one bucket file, so the entire
    computation is the shuffle-free conv pass; convs without a
    user→assistant adjacency emit nothing (SQL inner-filter shape)."""
    import pyarrow.compute as pc

    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        cols = ["conv_id", "n_responses", "total_latency_ms",
                "max_latency_ms", "med_latency_ms"]
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str).to_numpy()
        role = t["role"].to_pandas().astype(str).to_numpy()
        ts = t["ts_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(conv) == 0:
            return pd.DataFrame({c: np.array(
                [], dtype=object if c == "conv_id" else np.int64)
                for c in cols})
        same = conv[1:] == conv[:-1]
        pick = same & (role[:-1] == "user") & (role[1:] == "assistant")
        lat = (ts[1:] - ts[:-1])[pick]
        cv = conv[:-1][pick]
        if len(cv) == 0:
            return pd.DataFrame({c: np.array(
                [], dtype=object if c == "conv_id" else np.int64)
                for c in cols})
        order = np.lexsort((lat, cv))
        cv, lat = cv[order], lat[order]
        change = np.concatenate(([True], cv[1:] != cv[:-1]))
        starts = np.flatnonzero(change)
        n = np.diff(np.append(starts, len(cv))).astype(np.int64)
        csum = np.concatenate(([0], np.cumsum(lat)))
        bounds = np.append(starts, len(cv))
        return pd.DataFrame({
            "conv_id": cv[starts], "n_responses": n,
            "total_latency_ms": csum[bounds[1:]] - csum[starts],
            "max_latency_ms": lat[bounds[1:] - 1],
            "med_latency_ms": lat[starts + (n - 1) // 2]})[cols]

    return _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")


def tool_chains(sf_dir: str):
    """Agent tool-loop detection: per conversation the RUNS of consecutive
    tool-calling turns (``tool <> ''`` in canonical order) — how many
    distinct runs, the longest one, and the total tool-turn count.  A
    long max run is the "agent stuck in a tool loop" signal.  Vectorized
    RLE (edge mask → run ids → reduceat), shuffle-free conv pass; convs
    with zero tool turns emit nothing."""
    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        import pyarrow.compute as pc

        cols = ["conv_id", "n_tool_turns", "n_runs", "max_run_len"]
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str).to_numpy()
        is_tool = pc.not_equal(
            pc.cast(t["tool"], "string"), "").to_numpy(
                zero_copy_only=False).astype(bool)
        if len(conv) == 0 or not is_tool.any():
            return pd.DataFrame({c: np.array(
                [], dtype=object if c == "conv_id" else np.int64)
                for c in cols})
        new_conv = np.concatenate(([True], conv[1:] != conv[:-1]))
        prev_tool = np.concatenate(([False], is_tool[:-1]))
        run_start = is_tool & (new_conv | ~prev_tool)
        # run id per tool turn (non-tool rows get a dummy id, masked out)
        rid = np.cumsum(run_start) - 1
        starts = np.flatnonzero(run_start)
        run_len = np.bincount(rid[is_tool],
                              minlength=len(starts)).astype(np.int64)
        rc = conv[starts]
        change = np.concatenate(([True], rc[1:] != rc[:-1]))
        ustarts = np.flatnonzero(change)
        return pd.DataFrame({
            "conv_id": rc[ustarts],
            "n_tool_turns": np.add.reduceat(run_len, ustarts),
            "n_runs": np.diff(
                np.append(ustarts, len(rc))).astype(np.int64),
            "max_run_len": np.maximum.reduceat(run_len, ustarts)})[cols]

    return _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")


def tool_summary(sf_dir: str):
    """Per-tool usage rollup over canonical turns: call count, distinct
    conversations, total text length of the tool turns.  Conv-pass
    partials (a conv never spans buckets, so per-bucket distinct-conv
    counts add exactly) merged in one tiny tool-keyed exchange."""
    from ..stages.exchange import hash_exchange
    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        import pyarrow.compute as pc

        t = canonical_turns_arrow(batch)
        tool = t["tool"].to_pandas().astype(str)
        mask = (tool != "").to_numpy()
        df = pd.DataFrame({
            "tool": tool.to_numpy()[mask],
            "conv_id": t["conv_id"].to_pandas().astype(str)
            .to_numpy()[mask],
            "text_len": pc.utf8_length(
                pc.cast(t["text"], "string")).to_numpy(
                    zero_copy_only=False)[mask].astype(np.int64),
        })
        g = df.groupby("tool", sort=False)
        out = g.agg(calls=("conv_id", "size"),
                    n_convs=("conv_id", "nunique"),
                    total_text_len=("text_len", "sum")).reset_index()
        return out

    partials = _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")

    def key_fn(tbl):
        from ..util import arrow_col_hash
        return (arrow_col_hash(tbl, "tool") % np.uint64(4)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("tool", sort=False)
               .agg(calls=("calls", "sum"), n_convs=("n_convs", "sum"),
                    total_text_len=("total_text_len", "sum"))
               .reset_index())
        for c in ("calls", "n_convs", "total_text_len"):
            out[c] = out[c].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=key_fn, n_parts=4, kernel=merge,
                         fmt="pandas")


def sub_sessions(sf_dir: str, gap_ms: int = 1_800_000):
    """Conversation sub-sessionization: split each conversation at turn
    gaps above ``gap_ms`` (30 min default) — the "one conversation, many
    sittings" structure a transcript pipeline models.  Per conv: number
    of sittings, the longest sitting (turns), and the total idle time
    swallowed by the splits.  Vectorized gaps-and-islands inside the
    shuffle-free conv pass; exact integer milliseconds."""
    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        cols = ["conv_id", "n_turns", "n_sessions", "max_session_turns",
                "idle_ms"]
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str).to_numpy()
        ts = t["ts_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(conv) == 0:
            return pd.DataFrame({c: np.array(
                [], dtype=object if c == "conv_id" else np.int64)
                for c in cols})
        new_conv = np.concatenate(([True], conv[1:] != conv[:-1]))
        gap = np.concatenate(([0], ts[1:] - ts[:-1]))
        split = new_conv | (gap > gap_ms)
        sess_starts = np.flatnonzero(split)
        sess_len = np.diff(np.append(sess_starts, len(conv))).astype(
            np.int64)
        idle = np.where(split & ~new_conv, gap, 0)
        sc = conv[sess_starts]
        uchange = np.concatenate(([True], sc[1:] != sc[:-1]))
        ustarts = np.flatnonzero(uchange)
        conv_starts = np.flatnonzero(new_conv)
        conv_bounds = np.append(conv_starts, len(conv))
        icum = np.concatenate(([0], np.cumsum(idle)))
        return pd.DataFrame({
            "conv_id": sc[ustarts],
            "n_turns": np.diff(conv_bounds).astype(np.int64),
            "n_sessions": np.diff(
                np.append(ustarts, len(sc))).astype(np.int64),
            "max_session_turns": np.maximum.reduceat(sess_len, ustarts),
            "idle_ms": (icum[conv_bounds[1:]]
                        - icum[conv_starts]).astype(np.int64)})[cols]

    return _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")


def context_budget(sf_dir: str, budget_chars: int = 1_000):
    """Context-window budget audit — the truncation planning step an
    LLM-training transcript pipeline runs before packing conversations
    into fixed-size contexts: per conversation, how many leading turns
    (canonical order) fit a ``budget_chars`` running total, how many
    characters those turns hold, and the overflow beyond the budget.
    Exact integer arithmetic (char counts); a token budget swaps in the
    tokenizer's counts without touching the dataflow.  Vectorized prefix
    sums inside the shuffle-free conv pass."""
    import pyarrow.compute as pc

    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        cols = ["conv_id", "n_turns", "turns_in_budget",
                "chars_in_budget", "overflow_chars"]
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str).to_numpy()
        if len(conv) == 0:
            return pd.DataFrame({c: np.array(
                [], dtype=object if c == "conv_id" else np.int64)
                for c in cols})
        lens = pc.utf8_length(pc.cast(t["text"], "string")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        new_conv = np.concatenate(([True], conv[1:] != conv[:-1]))
        starts = np.flatnonzero(new_conv)
        bounds = np.append(starts, len(conv))
        n_turns = np.diff(bounds).astype(np.int64)
        cum = np.cumsum(lens)
        seg_off = np.repeat(cum[starts] - lens[starts], n_turns)
        run = cum - seg_off  # inclusive running total within conv
        fit = (run <= budget_chars).astype(np.int64)
        fits = np.add.reduceat(fit, starts).astype(np.int64)
        # run is monotone non-decreasing within a conv, so the budgeted
        # prefix is exactly the first `fits` turns of each segment
        last_fit = starts + fits - 1
        chars_in = np.where(fits > 0, run[np.maximum(last_fit, 0)], 0)
        total = run[bounds[1:] - 1]
        return pd.DataFrame({
            "conv_id": conv[starts],
            "n_turns": n_turns,
            "turns_in_budget": fits,
            "chars_in_budget": chars_in.astype(np.int64),
            "overflow_chars": (total - chars_in).astype(np.int64)})[cols]

    return _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")


def dialogue_audit(sf_dir: str):
    """Dialogue-structure audit — the schema-sanity gate an LLM-training
    transcript pipeline runs before packing chat templates: per
    conversation, turn counts by role, adjacent same-role repeats
    (alternation violations), and the first/last role.  All exact
    integers; one shuffle-free conv pass of reduceat kernels."""
    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        cols = ["conv_id", "n_turns", "n_user", "n_assistant", "n_tool",
                "n_role_repeats", "first_role", "last_role"]
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str).to_numpy()
        if len(conv) == 0:
            return pd.DataFrame({c: np.array(
                [], dtype=object if c in ("conv_id", "first_role",
                                          "last_role") else np.int64)
                for c in cols})
        role = t["role"].to_pandas().to_numpy()
        rcodes, runiq = pd.factorize(role)
        new_conv = np.concatenate(([True], conv[1:] != conv[:-1]))
        starts = np.flatnonzero(new_conv)
        bounds = np.append(starts, len(conv))

        def count_role(name):
            mask = np.zeros(len(conv), np.int64)
            w = np.flatnonzero(runiq == name)
            if len(w):
                mask[rcodes == w[0]] = 1
            return np.add.reduceat(mask, starts).astype(np.int64)

        rep = np.zeros(len(conv), np.int64)
        rep[1:] = (~new_conv[1:]) & (rcodes[1:] == rcodes[:-1])
        return pd.DataFrame({
            "conv_id": conv[starts],
            "n_turns": np.diff(bounds).astype(np.int64),
            "n_user": count_role("user"),
            "n_assistant": count_role("assistant"),
            "n_tool": count_role("tool"),
            "n_role_repeats": np.add.reduceat(rep, starts).astype(np.int64),
            "first_role": role[starts],
            "last_role": role[bounds[1:] - 1]})[cols]

    return _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")


def conv_digest(sf_dir: str):
    """Conversation-level exact-dedup surface: one md5 digest per conv
    over the canonical serialized turns (``role|tool|text`` joined with
    US, chr(31)).  The per-turn pieces build as ONE Arrow
    ``binary_join_element_wise`` column, every turn's bytes land
    contiguously in the value buffer, so each conv digest is a single
    md5 over one buffer slice — no per-turn Python, no string
    materialization.  Digest hex matches DuckDB ``md5(string_agg(...))``
    byte-for-byte."""
    import hashlib

    import pyarrow as pa
    import pyarrow.compute as pc

    from ..stages.dedup import _as_string_array
    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        cols = ["conv_id", "conv_digest", "n_turns", "n_chars"]
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str).to_numpy()
        if len(conv) == 0:
            return pd.DataFrame({c: np.array(
                [], dtype=np.int64 if c in ("n_turns", "n_chars")
                else object) for c in cols})
        piece = pc.binary_join_element_wise(
            pc.cast(t["role"], pa.string()), pc.cast(t["tool"], pa.string()),
            pc.cast(t["text"], pa.string()), "|")
        piece = pc.binary_join_element_wise(piece, "\x1f", "")
        arr = _as_string_array(piece)
        n = len(arr)
        off_dtype = (np.int64 if pa.types.is_large_string(arr.type)
                     else np.int32)
        offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
            arr.offset: arr.offset + n + 1].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
        new_conv = np.concatenate(([True], conv[1:] != conv[:-1]))
        starts = np.flatnonzero(new_conv)
        bounds = np.append(starts, len(conv))
        mv = memoryview(data)
        digests = [hashlib.md5(mv[offs[s]:offs[e] - 1]).hexdigest()
                   for s, e in zip(starts.tolist(), bounds[1:].tolist())]
        lens = pc.utf8_length(pc.cast(t["text"], pa.string())).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pd.DataFrame({
            "conv_id": conv[starts],
            "conv_digest": np.asarray(digests, dtype=object),
            "n_turns": np.diff(bounds).astype(np.int64),
            "n_chars": np.add.reduceat(lens, starts).astype(np.int64)})[cols]

    return _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")


def vocab_stats(sf_dir: str):
    """Per-conversation vocabulary audit (type/token counts — the
    lexical-diversity signal a pretraining mix uses to down-weight
    template-generated chats): total ``[A-Za-z0-9]+`` tokens and
    case-sensitive distinct tokens per conv.  Tokens come from the shared
    byte-run tokenizer as integer codes (no object token arrays);
    per-conv distincts are a packed (conv, code) uint64 unique."""
    from ..stages.dedup import _unique_token_reps
    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        cols = ["conv_id", "n_tokens", "n_distinct_tokens"]
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str).to_numpy()
        if len(conv) == 0:
            return pd.DataFrame({c: np.array(
                [], dtype=object if c == "conv_id" else np.int64)
                for c in cols})
        _, codes, doc_lens = _unique_token_reps(t["text"])
        new_conv = np.concatenate(([True], conv[1:] != conv[:-1]))
        starts = np.flatnonzero(new_conv)
        conv_idx = np.cumsum(new_conv) - 1
        n_tokens = np.add.reduceat(doc_lens, starts).astype(np.int64)
        if len(codes):
            key = (np.repeat(conv_idx, doc_lens).astype(np.uint64)
                   << np.uint64(32)) | codes.astype(np.uint64)
            distinct = np.bincount(
                (np.unique(key) >> np.uint64(32)).astype(np.int64),
                minlength=len(starts)).astype(np.int64)
        else:
            distinct = np.zeros(len(starts), np.int64)
        return pd.DataFrame({
            "conv_id": conv[starts],
            "n_tokens": n_tokens,
            "n_distinct_tokens": distinct})[cols]

    return _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")


def turn_window(sf_dir: str, w: int = 5):
    """Trailing ``w``-turn window per turn (ROWS ``w-1`` PRECEDING →
    CURRENT) over the canonical conv order: window row count and exact
    integer char-sum — the smoothing signal a transcript-quality monitor
    plots per turn.  One cumsum difference per conv partition, no
    per-conv loop."""
    import pyarrow.compute as pc

    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        cols = ["conv_id", "turn_idx", "win_n", "win_chars"]
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str).to_numpy()
        if len(conv) == 0:
            return pd.DataFrame({
                "conv_id": np.array([], dtype=object),
                "turn_idx": np.array([], np.int32),
                "win_n": np.array([], np.int64),
                "win_chars": np.array([], np.int64)})
        tidx = t["turn_idx"].to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(pc.cast(t["text"], "string")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        new_conv = np.concatenate(([True], conv[1:] != conv[:-1]))
        starts = np.flatnonzero(new_conv)
        conv_idx = np.cumsum(new_conv) - 1
        pos = np.arange(len(conv), dtype=np.int64) - starts[conv_idx]
        lo = np.maximum(pos - (w - 1), 0) + starts[conv_idx]
        cum = np.concatenate(([0], np.cumsum(lens)))
        i = np.arange(len(conv), dtype=np.int64)
        return pd.DataFrame({
            "conv_id": conv,
            "turn_idx": tidx,
            "win_n": (i - lo + 1).astype(np.int64),
            "win_chars": (cum[i + 1] - cum[lo]).astype(np.int64)})[cols]

    return _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")


def append_to_store(sf_dir: str, out_root: str,
                    ts_lo: int | None = None, ts_hi: int | None = None,
                    keep_history: bool = False):
    """Continuous-aggregate APPEND: fold one new event-time batch of
    turns into an existing store WITHOUT rebuilding it — the north-rule
    continuous-aggregates path.  Only the day partitions the delta
    touches are rewritten, at (conv, metric, day) group granularity:

    1. the delta builds like a fresh ingest (one conv pass → 1m rollup
       rows + day blocks) over the conv bucket's FULL history cut at
       ``ts_hi``, then keeps only groups whose (conv, day) saw a new row
       (``_filter_new_conv_days``).  Deriving from history makes
       adjacency metrics (turn_gap_ms) exact across the batch boundary —
       the conv-clustered lake file IS the carry state, and the bucket
       read loads it anyway,
    2. affected-day ``rollup_1m``/``blocks`` partitions merge by
       REPLACEMENT: an old group whose (conv, day) appears in the delta
       is superseded by the recomputed group (bit-exact vs a single-shot
       build — no partial-sum drift, no watermark ordering assumption,
       idempotent on replay); untouched groups pass through
       bit-identical,
    3. ``rollup_1h``/``rollup_1d`` recompute from the merged 1m rows of
       the affected days only (1m buckets never cross a day boundary),
    4. canonical turns for the ``[ts_lo, ts_hi)`` window append as new
       parquet files and a lineage row records the run per affected day.

    Replacement supersession is sound because group emission is monotone
    in the input: any (conv, metric, day) group the old build emitted
    still has rows under the recompute, so no stale group can survive.

    With ``keep_history=True`` the append is NON-DESTRUCTIVE: every
    rewritten day partition's pre-append copy MOVES (an O(1) directory
    rename, never a data rewrite) under ``_history/v{N}/``, newly created
    days are recorded, and a version manifest row per (tier, day) makes
    any earlier store version reconstructible
    (:func:`~gorilla_tsc_ray.state.lineage.resolve_asof` — MVCC by
    supersession; the :func:`timetravel_serve` gate proves as-of-v1 reads
    are bit-equal to the pre-append store).
    """
    import os
    import shutil

    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data

    from ..stages.exchange import hash_exchange
    from ..stages.rollup import cascade_dataset
    from ..state.lineage import (new_run_id, partition_key_for_day,
                                 write_lineage)
    from ..util import arrow_key_ids

    tune_context()
    run_id = new_run_id()
    BLOCK_COLS = ["conv_id", "metric", "block_start", "n_points",
                  "codec", "value_kind", "payload"]

    combined = build_store_combined(sf_dir, "1m", ts_lo, ts_hi).materialize()
    r1m_delta, blocks_delta = split_store_outputs(combined)

    def plain(t: pa.Table) -> pa.Table:
        for name in ("conv_id", "metric", "codec", "value_kind"):
            if name in t.schema.names:
                i = t.schema.get_field_index(name)
                if pa.types.is_dictionary(t.schema.field(i).type):
                    t = t.set_column(i, name, pc.cast(t[name], pa.string()))
        return t

    r1m_delta = r1m_delta.map_batches(plain, batch_format="pyarrow")
    r1m_delta = _with_day(r1m_delta, "bucket_ms").materialize()
    blocks_delta = blocks_delta.map_batches(plain, batch_format="pyarrow")
    blocks_delta = _with_day(blocks_delta, "block_start").materialize()

    days = sorted({int(d) for d in r1m_delta.unique("day")}
                  | {int(d) for d in blocks_delta.unique("day")})
    results = {"days": days, "run_id": run_id}
    if not days:
        return results

    from ..state.lineage import (archive_path, next_store_version,
                                 write_version_manifest)

    ver = next_store_version(out_root) if keep_history else None
    hist_rows: list[dict] = []

    def _retire(path: str, tier_name: str):
        """Delete a superseded day dir — or, under ``keep_history``, move
        it into the version archive and record the supersession."""
        day = int(os.path.basename(path).split("=", 1)[1])
        if keep_history:
            dst = archive_path(out_root, ver, tier_name, day)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            shutil.move(path, dst)
            hist_rows.append({"version": ver, "tier": tier_name,
                              "day": day, "action": "archived"})
        else:
            shutil.rmtree(path)

    def existing(tier: str, cols: list[str]):
        import glob

        dirs = [f"{out_root}/{tier}/day={d}" for d in days]
        dirs = [p for p in dirs if os.path.isdir(p)]
        if not dirs:
            return None, []
        # a LIST of directories is not a supported read_parquet input
        # (single dir str only) — expand to the member files
        files = [f for p in dirs
                 for f in sorted(glob.glob(os.path.join(p, "*.parquet")))]
        # parquet round-trips the Arrow schema, so dictionary-encoded key
        # columns come back dictionary-typed — normalize like the delta
        ds = ray.data.read_parquet(files, columns=cols).map_batches(
            plain, batch_format="pyarrow")
        return ds, dirs

    # The supersession set is GROUP-sized — unique (conv, day) pairs of
    # the delta — so the default merge is a map-side anti-join against a
    # broadcast pair index + a union with the delta: NO exchange.  Above
    # the ≤64 MB broadcast cap (same selector rationale as
    # ``relational._attach_dim``) it falls back to the conv-hash
    # co-partitioned exchange where old and delta rows of one conv meet
    # in one task and supersession is decided locally.
    def pair_partial(t: pa.Table) -> pd.DataFrame:
        return pd.DataFrame({
            "conv_id": t["conv_id"].to_pandas().astype(str),
            "day": t["day"].to_numpy(zero_copy_only=False),
        }).drop_duplicates()

    pairs = pd.concat([
        r1m_delta.select_columns(["conv_id", "day"]).map_batches(
            pair_partial, batch_format="pyarrow").to_pandas(),
        blocks_delta.select_columns(["conv_id", "day"]).map_batches(
            pair_partial, batch_format="pyarrow").to_pandas(),
    ], ignore_index=True).drop_duplicates()
    pair_bytes = pairs.memory_usage(deep=True).sum()
    broadcast = pair_bytes <= _APPEND_PAIR_BROADCAST_CAP
    pairs_ref = ray.put(pd.MultiIndex.from_frame(pairs)) if broadcast \
        else None

    def drop_superseded(day_col: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            day = (df[day_col].to_numpy() // DAY_MS) * DAY_MS
            hit = pd.MultiIndex.from_arrays(
                [df["conv_id"].to_numpy(), day]).isin(ray.get(pairs_ref))
            return df.loc[~hit]
        return f

    def tag(src: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column("src", pa.array(
                np.full(t.num_rows, src, dtype=np.int8)))
        return f

    def key_fn(tbl):
        return arrow_key_ids(tbl, TRANSCRIPT_KEYS, N_CONV_PARTS)

    def replace_groups(df: pd.DataFrame, cols: list[str], day_col: str):
        """Exchange-route kernel: old rows whose (conv, day) pair the
        co-partitioned delta recomputed are superseded; delta rows and
        untouched old rows pass through."""
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        day = (df[day_col].to_numpy() // DAY_MS) * DAY_MS
        new = df["src"].to_numpy() == 1
        keep_old = ~pd.MultiIndex.from_arrays(
            [df["conv_id"].to_numpy()[~new], day[~new]]).isin(
            pd.MultiIndex.from_arrays(
                [df["conv_id"].to_numpy()[new], day[new]]))
        old_rows = df.loc[~new].loc[keep_old, cols]
        return pd.concat([old_rows, df.loc[new, cols]], ignore_index=True)

    def merge_tier(tier: str, delta, cols: list[str], day_col: str):
        old, old_dirs = existing(tier, cols)
        delta = delta.drop_columns(["day"])
        if old is None:
            merged = delta
        elif broadcast:
            merged = old.map_batches(drop_superseded(day_col),
                                     batch_format="pandas").union(delta)
        else:
            union = (old.map_batches(tag(0), batch_format="pyarrow")
                     .union(delta.map_batches(tag(1),
                                              batch_format="pyarrow")))
            merged = hash_exchange(
                union, key_fn=key_fn, n_parts=N_CONV_PARTS,
                kernel=lambda df: replace_groups(df, cols, day_col),
                fmt="pandas")
        merged = _with_day(merged, day_col).materialize()
        had = {int(os.path.basename(p).split("=", 1)[1])
               for p in old_dirs}
        for p in old_dirs:
            _retire(p, tier)
        if keep_history:
            for d in days:
                if d not in had:
                    hist_rows.append({"version": ver, "tier": tier,
                                      "day": d, "action": "created"})
        merged.write_parquet(f"{out_root}/{tier}", partition_cols=["day"])
        results[tier] = f"{out_root}/{tier}"
        return merged

    merged_r = merge_tier("rollup_1m", r1m_delta, ROLLUP_COLS, "bucket_ms")
    merged_b = merge_tier("blocks", blocks_delta, BLOCK_COLS, "block_start")

    # ---- coarser tiers recompute from the merged 1m (affected days) --
    def add_lts(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(last_ts=df["bucket_ms"].astype(np.int64))

    finer = (merged_r.drop_columns(["day"])
             .map_batches(add_lts, batch_format="pandas"))
    for tier in ("1h", "1d"):
        coarse = cascade_dataset(finer, key_cols=TRANSCRIPT_KEYS, tier=tier)

        def drop_lts(df: pd.DataFrame) -> pd.DataFrame:
            out = df.drop(columns=["last_ts"])
            out["sum_v"] = round_half_away(out["sum_v"].to_numpy(), 6)
            return out

        out_ds = _with_day(coarse.map_batches(drop_lts,
                                              batch_format="pandas"),
                           "bucket_ms").materialize()
        for d in days:
            p = f"{out_root}/rollup_{tier}/day={d}"
            if os.path.isdir(p):
                _retire(p, f"rollup_{tier}")
            elif keep_history:
                hist_rows.append({"version": ver, "tier": f"rollup_{tier}",
                                  "day": d, "action": "created"})
        out_ds.write_parquet(f"{out_root}/rollup_{tier}",
                             partition_cols=["day"])
        results[f"rollup_{tier}"] = f"{out_root}/rollup_{tier}"
        finer = coarse

    # ---- turns append + lineage --------------------------------------
    canonical_turns(sf_dir, ts_lo, ts_hi).write_parquet(f"{out_root}/turns")

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

    parts = merged_b.map_batches(day_partial,
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
    if keep_history and hist_rows:
        write_version_manifest(out_root, hist_rows, run_id)
        results["version"] = ver
    # keep the bloom point-lookup sidecar COHERENT: rebuild the affected
    # days' bitmaps (scan_points treats unknown days as survivors, so a
    # stale sidecar can only over-read — but refreshing here keeps the
    # index's pruning power after appends)
    if rows and os.path.isfile(os.path.join(out_root, "_index",
                                            "conv_bloom.parquet")):
        from .query import build_conv_bloom

        build_conv_bloom(out_root)
        results["bloom_index"] = "rebuilt"
    results["lineage_rows"] = len(rows)
    return results


def incremental_serve(sf_dir: str, tier: str = "1h"):
    """Driver-facing continuous-aggregate gate: ingest the FIRST
    event-time half of the transcripts into a fresh scratch store, fold
    the second half in with :func:`append_to_store` (group-wise rollup
    merge + block compaction across the mid-day split), then serve the
    full range from the appended store's coarser tier.  The oracle is
    the plain 1h rollup over ALL turns — the appended store must be
    indistinguishable from a single-shot build.  The split point comes
    from the parquet footer min/max of ``ts`` (a metadata read)."""
    import glob
    import os
    import shutil

    import pyarrow.parquet as pq
    import ray.data

    from ..sources.transcripts import CACHE_ROOT

    tune_context()
    tdir = transcripts_dir(sf_dir)
    lo, hi = None, None
    for f in glob.glob(os.path.join(tdir, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        ts_i = md.schema.to_arrow_schema().get_field_index("ts")
        for g in range(md.num_row_groups):
            st = md.row_group(g).column(ts_i).statistics
            if st is None or not st.has_min_max:
                raise RuntimeError(f"no ts statistics in {f}")
            mn = int(st.min.timestamp() * 1000)
            mx = int(st.max.timestamp() * 1000)
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
    split = (lo + hi) // 2

    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(CACHE_ROOT, f"incr_store_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    ingest_to_store(sf_dir, store, resume=False, ts_hi=split)
    append_to_store(sf_dir, store, ts_lo=split)

    ds = ray.data.read_parquet(
        os.path.join(store, f"rollup_{tier}"), columns=ROLLUP_COLS)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["conv_id"] = out["conv_id"].astype(str)
        out["metric"] = out["metric"].astype(str)
        return out[ROLLUP_COLS]

    return ds.map_batches(finalize, batch_format="pandas")


def conv_length_histogram(sf_dir: str):
    """Conversation-length distribution: how many conversations have
    exactly n canonical turns (the transcripts Q13 shape — the corpus
    profile a context-window planner reads).  Per-conv counts fold inside
    the shuffle-free conv pass (convs never span buckets, so histogram
    partials add exactly); one tiny n_turns exchange merges."""
    from ..stages.exchange import hash_exchange
    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str)
        per = conv.groupby(conv, sort=False).size()
        out = (per.groupby(per, sort=False).size()
               .rename("n_convs").reset_index()
               .rename(columns={"index": "n_turns"}))
        out.columns = ["n_turns", "n_convs"]
        out["n_turns"] = out["n_turns"].astype(np.int64)
        out["n_convs"] = out["n_convs"].astype(np.int64)
        return out

    partials = _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")

    def key_fn(tbl):
        return (tbl.column("n_turns").to_numpy().astype(np.uint64)
                % np.uint64(4)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("n_turns", sort=False)["n_convs"].sum()
               .reset_index())
        out["n_turns"] = out["n_turns"].astype(np.int64)
        out["n_convs"] = out["n_convs"].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=key_fn, n_parts=4, kernel=merge,
                         fmt="pandas")


def len_drift(sf_dir: str, cap: int = 64):
    """Per-conversation Theil–Sen drift of message length over the first
    ``cap`` canonical turns: the median pairwise slope (len_j − len_i) /
    (j − i) over canonical-order positions, reported as the EXACT
    (numerator, denominator) int64 pair (the events theil_sen
    discipline) — a positive drift is the "assistant messages keep
    growing" context-bloat signal, negative the truncation signal.
    Selection is deterministic: order by (IEEE double value, num, den),
    take the lower median; the division is the same IEEE op both sides.

    Shuffle-free conv pass (conversations live whole inside one bucket
    file); the pair grid is C(min(n, cap), 2) per conv, vectorized
    ACROSS conversations via a shared triu template + validity mask."""
    import pyarrow.compute as pc

    from ..stages.metrics import canonical_turns_arrow

    ii, jj = np.triu_indices(cap, 1)

    def kernel(batch):
        cols = ["conv_id", "n_pairs", "med_num", "med_den"]
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str).to_numpy()
        xlen = pc.utf8_length(pc.cast(t["text"], "string")).to_numpy(
            zero_copy_only=False).astype(np.int64)
        empty = pd.DataFrame({
            "conv_id": np.array([], dtype=object),
            **{c: np.array([], np.int64) for c in cols[1:]}})
        if len(conv) == 0:
            return empty
        new = np.concatenate(([True], conv[1:] != conv[:-1]))
        starts = np.flatnonzero(new)
        lens = np.diff(np.append(starts, len(conv)))
        n = np.minimum(lens, cap)
        keep = n >= 2
        starts, n = starts[keep], n[keep]
        if not len(starts):
            return empty
        X = np.zeros((len(starts), cap), np.int64)
        rep = np.repeat(np.arange(len(starts)), n)
        within = (np.arange(int(n.sum()))
                  - np.repeat(np.concatenate(([0], np.cumsum(n)[:-1])), n))
        X[rep, within] = xlen[starts[rep] + within]
        num = X[:, jj] - X[:, ii]
        den = np.broadcast_to((jj - ii).astype(np.int64), num.shape)
        valid = jj[None, :] < n[:, None]
        val = np.where(valid, num.astype(np.float64) / den, np.inf)
        nn = np.where(valid, num, np.iinfo(np.int64).max)
        order = np.lexsort((den, nn, val), axis=-1)
        m = (n * (n - 1) // 2).astype(np.int64)
        sel = order[np.arange(len(starts)), (m - 1) // 2]
        rows = np.arange(len(starts))
        return pd.DataFrame({
            "conv_id": conv[starts], "n_pairs": m,
            "med_num": num[rows, sel].astype(np.int64),
            "med_den": den[rows, sel].astype(np.int64)})[cols]

    return _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")


def tool_retry_runs(sf_dir: str):
    """Tool RETRY-RUN audit per tool: a run = maximal stretch of
    consecutive canonical turns (turn_idx order, within one conv) calling
    the SAME non-empty tool — back-to-back same-tool calls are the retry
    smell an agent-transcript pipeline monitors.  Per tool: run count,
    total calls and the longest run, all exact ints.  Runs never span
    conversations; convs live whole inside one bucket, so run detection
    is the shuffle-free conv pass (one shift-compare), and only ≤
    #tools cells ride the final exchange."""
    from ..stages.exchange import hash_exchange
    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str).to_numpy()
        tool = t["tool"].to_pandas().astype(str).to_numpy()
        cols = ["tool", "n_runs", "n_calls", "max_run"]
        called = tool != ""
        if not called.any():
            return pd.DataFrame({
                "tool": np.array([], dtype=object),
                "n_runs": np.array([], np.int64),
                "n_calls": np.array([], np.int64),
                "max_run": np.array([], np.int64)})
        same_prev = np.concatenate(
            ([False], (conv[1:] == conv[:-1]) & (tool[1:] == tool[:-1])))
        start = called & ~same_prev
        rid = np.cumsum(start) - 1          # run id for called rows
        run_tool = tool[start]
        run_len = np.bincount(rid[called], minlength=int(start.sum()))
        g = (pd.DataFrame({"tool": run_tool, "len": run_len})
             .groupby("tool", sort=False)
             .agg(n_runs=("len", "size"), n_calls=("len", "sum"),
                  max_run=("len", "max")).reset_index())
        for c in cols[1:]:
            g[c] = g[c].astype(np.int64)
        return g[cols]

    partials = _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")

    def key_fn(tbl):
        from ..util import arrow_col_hash

        return (arrow_col_hash(tbl, "tool") % np.uint64(4)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("tool", sort=False)
               .agg(n_runs=("n_runs", "sum"), n_calls=("n_calls", "sum"),
                    max_run=("max_run", "max")).reset_index())
        for c in ("n_runs", "n_calls", "max_run"):
            out[c] = out[c].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=key_fn, n_parts=4, kernel=merge,
                         fmt="pandas")


def workflow_near_dups(sf_dir: str, threshold: float = 0.5):
    """Conversation pairs with NEAR-DUPLICATE TOOL WORKFLOWS — the dedup
    family applied to the transcripts payload: each conversation's
    non-empty tool calls (canonical turn order) join into one
    space-separated workflow string, and the exact word-3-shingle Jaccard
    prefix join (:func:`~gorilla_tsc_ray.pipelines.docs
    .shingle_jaccard_pairs`, the payload-agnostic seam) finds conv pairs
    whose tool-TRIGRAM sets overlap ≥ 0.5 — the "same agent loop"
    detector.  Tool names are pure-alnum tokens, so the shared tokenizer
    reproduces the sequence exactly, and sub-3-call convs take the same
    ''-padded shingle the SQL mirror builds.  The tiny tool vocabulary
    makes every prefix bucket hot by construction — candidate volume ≈
    the true output (inherent to threshold joins over low-entropy sets);
    the machinery's hot-bucket 2D blocking bounds any one task.  Conv
    identity is the numeric conv suffix; workflow assembly is the
    shuffle-free conv pass."""
    from .docs import shingle_jaccard_pairs
    from ..stages.metrics import canonical_turns_arrow

    def conv_workflow(batch) -> pd.DataFrame:
        t = canonical_turns_arrow(batch)
        df = pd.DataFrame({
            "conv_id": t["conv_id"].to_pandas().astype(str),
            "tool": t["tool"].to_pandas().astype(str)})
        df = df.loc[df["tool"] != ""]
        if not len(df):
            return pd.DataFrame({"doc_id": np.array([], np.int64),
                                 "text": np.array([], dtype=object)})
        g = (df.groupby("conv_id", sort=True)["tool"]
             .agg(" ".join).reset_index())
        return pd.DataFrame({
            "doc_id": g["conv_id"].str.slice(5).astype(np.int64),
            "text": g["tool"]})

    ds = _conv_partitioned(sf_dir, conv_workflow, lean=False, fmt="pyarrow")
    return shingle_jaccard_pairs(ds, threshold=threshold,
                                 sim_col="workflow_jaccard")


def _canonical_ts_minmax_ms(sf_dir: str) -> tuple[int, int]:
    """(min, max) ``ts_ms`` over CANONICAL (deduped) turns, computed
    distributed — one lean conv-partitioned pass emits one (lo, hi) row
    per partition; only scalars reach the driver.  The timetravel split
    must name the same cut as the oracle's midpoint over DEDUPED turns:
    raw parquet footer stats include superseded turn versions, and a
    superseded row holding the global min/max would silently diverge the
    two cuts (round-4 ADVICE)."""
    from ..stages.metrics import _sorted_keep_index

    def kernel(t):
        if t.num_rows == 0:
            return pd.DataFrame({"lo": pd.Series([], dtype=np.int64),
                                 "hi": pd.Series([], dtype=np.int64)})
        _, _, ts_kept, _, _ = _sorted_keep_index(t.combine_chunks())
        return pd.DataFrame({"lo": [np.int64(ts_kept.min())],
                             "hi": [np.int64(ts_kept.max())]})

    parts = _conv_partitioned(sf_dir, kernel, lean=True,
                              fmt="pyarrow").to_pandas()
    return int(parts["lo"].min()), int(parts["hi"].max())


def timetravel_serve(sf_dir: str, tier: str = "1h"):
    """Driver-facing TIME-TRAVEL gate: ingest the first event-time half
    into a fresh scratch store (version 1), fold the second half in with
    ``append_to_store(keep_history=True)`` (version 2 — superseded day
    partitions MOVE to the version archive instead of dying), then serve
    the coarser tier AS OF VERSION 1 through the manifest resolution
    (:func:`~gorilla_tsc_ray.state.lineage.resolve_asof`).  The oracle is
    the plain rollup over ONLY the first-half turns — the as-of read must
    be indistinguishable from the pre-append store (archived boundary-day
    copies are bit-identical renamed files; days created by the append
    are excluded by their manifest rows; untouched days pass through).
    The split point is the midpoint of the CANONICAL (deduped) turn
    stream's min/max — the same population the SQL mirror's
    ``(min(ts_ms) + max(ts_ms)) // 2 FROM d`` ranges over, so both
    sides name the same cut by construction (footer stats would include
    superseded turn versions)."""
    import os
    import shutil

    import ray.data

    from ..sources.transcripts import CACHE_ROOT
    from ..state.lineage import resolve_asof

    tune_context()
    lo, hi = _canonical_ts_minmax_ms(sf_dir)
    split = (lo + hi) // 2

    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(CACHE_ROOT, f"ttravel_store_{tag}")
    shutil.rmtree(store, ignore_errors=True)
    ingest_to_store(sf_dir, store, resume=False, ts_hi=split)
    append_to_store(sf_dir, store, ts_lo=split, keep_history=True)

    import glob

    paths = resolve_asof(store, 1, f"rollup_{tier}")
    if not paths:
        raise RuntimeError("as-of-v1 resolution found no partitions")
    files = [f for p in paths
             for f in sorted(glob.glob(os.path.join(p, "*.parquet")))]
    ds = ray.data.read_parquet(files, columns=ROLLUP_COLS)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["conv_id"] = out["conv_id"].astype(str)
        out["metric"] = out["metric"].astype(str)
        return out[ROLLUP_COLS]

    return ds.map_batches(finalize, batch_format="pandas")


def tool_context(sf_dir: str):
    """Backward AS-OF context join WITHIN transcripts: for every
    canonical tool-call turn, the most recent PRIOR user-role turn of the
    same conversation (the context a tool invocation acted on; −1 when
    the tool call opens the conv with no user turn before it).  The
    as-of is a grouped running max of user-turn indices in canonical
    order — vectorized across convs, shuffle-free (convs live whole in
    one bucket)."""

    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str).to_numpy()
        role = t["role"].to_pandas().astype(str).to_numpy()
        tool = t["tool"].to_pandas().astype(str).to_numpy()
        tidx = t["turn_idx"].to_numpy().astype(np.int64)
        cols = ["conv_id", "turn_idx", "ctx_turn_idx"]
        if not len(conv):
            return pd.DataFrame({
                "conv_id": np.array([], dtype=object),
                "turn_idx": np.array([], np.int64),
                "ctx_turn_idx": np.array([], np.int64)})
        first = np.concatenate(([True], conv[1:] != conv[:-1]))
        gidx = np.cumsum(first) - 1
        # last PRIOR user turn: shift the user-turn indices down one
        # row, floor group starts and non-user rows at -1, grouped cummax
        prev_user = np.concatenate(
            ([-1], np.where(role[:-1] == "user", tidx[:-1], -1)))
        prev_user[first] = -1
        ctx = (pd.Series(prev_user).groupby(gidx).cummax()
               .to_numpy(dtype=np.int64))
        hit = tool != ""
        return pd.DataFrame({
            "conv_id": conv[hit], "turn_idx": tidx[hit],
            "ctx_turn_idx": ctx[hit]})[cols]

    return _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")


def fsck_store(store_root: str, tiers=("1h", "1d")) -> pd.DataFrame:
    """Store CONSISTENCY CHECK (fsck): recompute each coarse rollup tier
    from the stored 1m rows (the exact cascade the build/append paths
    run) and compare group-by-group against what the store serves —
    the invariant every maintenance op (append, compact, retention,
    transcode) must preserve.  Comparison is co-partitioned on the
    (conv, metric, bucket) hash — stored and recomputed rows of one
    group meet in one task; only per-tier counters leave it.  Returns
    one row per tier: groups checked, missing (in store), extra
    (stale), value mismatches."""
    import glob

    import ray.data

    from ..stages.exchange import hash_exchange_multi
    from ..stages.rollup import cascade_dataset
    from ..util import arrow_key_ids, round_half_away

    tune_context()
    f1m = sorted(glob.glob(f"{store_root}/rollup_1m/day=*/*.parquet"))
    if not f1m:
        raise RuntimeError(f"no rollup_1m under {store_root}")
    finer = ray.data.read_parquet(f1m, columns=ROLLUP_COLS)

    def add_lts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["conv_id"] = df["conv_id"].astype(str)
        df["metric"] = df["metric"].astype(str)
        return df.assign(last_ts=df["bucket_ms"].astype(np.int64))

    finer = finer.map_batches(add_lts, batch_format="pandas")

    rows = []
    for tier in tiers:
        coarse = cascade_dataset(finer, key_cols=TRANSCRIPT_KEYS,
                                 tier=tier)

        def drop_lts(df: pd.DataFrame) -> pd.DataFrame:
            out = df.drop(columns=["last_ts"])
            out["sum_v"] = round_half_away(out["sum_v"].to_numpy(), 6)
            return out

        recomputed = coarse.map_batches(drop_lts, batch_format="pandas")
        fst = sorted(glob.glob(
            f"{store_root}/rollup_{tier}/day=*/*.parquet"))
        if not fst:
            rows.append({"tier": tier, "n_groups": 0, "n_missing": -1,
                         "n_extra": -1, "n_mismatch": -1})
            continue
        stored = ray.data.read_parquet(fst, columns=ROLLUP_COLS)

        def plain(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["conv_id"] = df["conv_id"].astype(str)
            df["metric"] = df["metric"].astype(str)
            return df

        stored = stored.map_batches(plain, batch_format="pandas")

        def key_fn(tbl):
            return arrow_key_ids(tbl, ["conv_id", "metric"],
                                 N_CONV_PARTS)

        def compare(r: pd.DataFrame, s: pd.DataFrame) -> pd.DataFrame:
            keys = ["conv_id", "metric", "bucket_ms"]
            m = r.merge(s, on=keys, how="outer", indicator=True,
                        suffixes=("_r", "_s"))
            missing = int((m["_merge"] == "left_only").sum())
            extra = int((m["_merge"] == "right_only").sum())
            both = m.loc[m["_merge"] == "both"]
            bad = 0
            for c in ("sum_v", "cnt", "min_v", "max_v", "last_v"):
                bad += int((both[f"{c}_r"] != both[f"{c}_s"]).sum())
            return pd.DataFrame({
                "n_groups": [np.int64(len(r))],
                "n_missing": [np.int64(missing)],
                "n_extra": [np.int64(extra)],
                "n_mismatch": [np.int64(bad)]})

        parts = hash_exchange_multi(
            [(recomputed, key_fn), (stored, key_fn)],
            n_parts=N_CONV_PARTS, kernel=compare, fmt="pandas").to_pandas()
        rows.append({"tier": tier,
                     "n_groups": int(parts["n_groups"].sum()),
                     "n_missing": int(parts["n_missing"].sum()),
                     "n_extra": int(parts["n_extra"].sum()),
                     "n_mismatch": int(parts["n_mismatch"].sum())})
    return pd.DataFrame(rows)


def shard_assignment(sf_dir: str, shard_chars: int = 100_000):
    """Deterministic TRAINING-SHARD assignment: conversations in conv_id
    order pack into contiguous character-budget shards — shard = (total
    chars of all PRIOR convs) // budget, the next-fit-by-offset rule a
    pretraining pipeline uses to cut a corpus into equal-work files.
    A GLOBAL ORDERED PREFIX SCAN, which the Dataset API cannot express:
    per-conv totals fold in the shuffle-free conv pass, the distributed
    sort range-partitions by conv_id, one tiny task per sorted block
    emits its (rows, chars) partial, the driver folds ≤ #blocks scalars
    into exclusive offsets, and a second task wave assigns shards from
    pure offset arithmetic (the pareto_curve route, SURVEY §2 custom-
    operator route (c))."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    from ..stages.metrics import canonical_turns_arrow

    def per_conv(batch) -> pd.DataFrame:
        t = canonical_turns_arrow(batch)
        df = pd.DataFrame({
            "conv_id": t["conv_id"].to_pandas().astype(str),
            "n": pc.utf8_length(t["text"]).to_numpy(
                zero_copy_only=False).astype(np.int64)})
        g = df.groupby("conv_id", sort=False)["n"].sum().rename("chars")
        out = g.reset_index()
        out["chars"] = out["chars"].astype(np.int64)
        return out

    totals = _conv_partitioned(sf_dir, per_conv, lean=False, fmt="pyarrow")
    ordered = totals.sort("conv_id").materialize()
    refs = ordered.to_arrow_refs()

    @ray.remote
    def block_sum(tbl):
        return int(np.sum(tbl.column("chars").to_numpy(
            zero_copy_only=False)))

    sums = ray.get([block_sum.remote(r) for r in refs])
    offs = np.concatenate(([0], np.cumsum(sums)[:-1])).astype(np.int64)

    @ray.remote
    def assign(tbl, c0: int):
        import pyarrow as _pa

        chars = tbl.column("chars").to_numpy(zero_copy_only=False)
        start = (np.cumsum(chars) - chars) + np.int64(c0)
        return _pa.table({
            "conv_id": tbl.column("conv_id"),
            "chars": _pa.array(chars.astype(np.int64)),
            "shard": _pa.array((start // shard_chars).astype(np.int64))})

    return ray.data.from_arrow_refs(
        [assign.remote(r, int(o)) for r, o in zip(refs, offs)])


def fsck_deep(store_root: str) -> pd.DataFrame:
    """CROSS-TIER deep consistency check: DECODE the raw ``blocks`` tier
    and recompute the 1m rollup from the points themselves, comparing
    group-by-group against the stored ``rollup_1m``.
    :func:`fsck_store` checks the coarse tiers against 1m; this closes
    the verification loop by checking 1m against the blocks GROUND TRUTH
    (payloads decode to exactly the canonical metric points, so every
    stored tier is now transitively verifiable from the codec layer).
    Same co-partitioned compare discipline — stored and recomputed rows
    of one (conv, metric) meet in one task, only per-partition counters
    reach the driver.  Returns one row (tier ``1m_vs_blocks``)."""
    import glob

    import ray.data

    from ..stages.exchange import hash_exchange_multi
    from ..stages.rollup import rollup_dataset
    from ..stages.series import decode_blocks_batch_arrow
    from ..util import arrow_key_ids, round_half_away

    tune_context()
    fb = sorted(glob.glob(f"{store_root}/blocks/day=*/*.parquet"))
    f1m = sorted(glob.glob(f"{store_root}/rollup_1m/day=*/*.parquet"))
    if not fb or not f1m:
        return pd.DataFrame([{
            "tier": "1m_vs_blocks", "n_groups": 0, "n_missing": -1,
            "n_extra": -1, "n_mismatch": -1}])
    pts = ray.data.read_parquet(fb).map_batches(
        decode_blocks_batch_arrow, batch_format="pyarrow",
        fn_kwargs={"key_cols": ["conv_id", "metric"]})
    recomputed = rollup_dataset(pts, key_cols=TRANSCRIPT_KEYS, tier="1m")

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["conv_id"] = df["conv_id"].astype(str)
        df["metric"] = df["metric"].astype(str)
        df["sum_v"] = round_half_away(df["sum_v"].to_numpy(np.float64), 6)
        return df[ROLLUP_COLS]

    recomputed = recomputed.map_batches(norm, batch_format="pandas")
    stored = ray.data.read_parquet(f1m, columns=ROLLUP_COLS).map_batches(
        norm, batch_format="pandas")

    def key_fn(tbl):
        return arrow_key_ids(tbl, ["conv_id", "metric"], N_CONV_PARTS)

    def compare(r: pd.DataFrame, s: pd.DataFrame) -> pd.DataFrame:
        keys = ["conv_id", "metric", "bucket_ms"]
        m = r.merge(s, on=keys, how="outer", indicator=True,
                    suffixes=("_r", "_s"))
        missing = int((m["_merge"] == "left_only").sum())
        extra = int((m["_merge"] == "right_only").sum())
        both = m.loc[m["_merge"] == "both"]
        bad = 0
        for c in ("sum_v", "cnt", "min_v", "max_v", "last_v"):
            bad += int((both[f"{c}_r"] != both[f"{c}_s"]).sum())
        return pd.DataFrame({
            "n_groups": [np.int64(len(r))],
            "n_missing": [np.int64(missing)],
            "n_extra": [np.int64(extra)],
            "n_mismatch": [np.int64(bad)]})

    parts = hash_exchange_multi(
        [(recomputed, key_fn), (stored, key_fn)],
        n_parts=N_CONV_PARTS, kernel=compare, fmt="pandas").to_pandas()
    return pd.DataFrame([{
        "tier": "1m_vs_blocks",
        "n_groups": int(parts["n_groups"].sum()),
        "n_missing": int(parts["n_missing"].sum()),
        "n_extra": int(parts["n_extra"].sum()),
        "n_mismatch": int(parts["n_mismatch"].sum())}])


def repair_store(store_root: str, tiers=("1h", "1d")) -> pd.DataFrame:
    """Self-healing counterpart of :func:`fsck_store`: rebuild every
    coarse-tier day partition from the stored 1m rows (the one source of
    truth below it) — corruption, partial writes or stale partitions in
    1h/1d are all repaired by the same cascade the build path runs.
    Rewrites ONLY the listed tiers' day dirs; 1m and blocks are never
    touched (they have no finer tier to rebuild from — fsck can only
    detect there).  Returns per-tier day counts written."""
    import glob
    import os
    import shutil

    import ray.data

    from ..stages.rollup import cascade_dataset
    from ..util import round_half_away

    tune_context()
    f1m = sorted(glob.glob(f"{store_root}/rollup_1m/day=*/*.parquet"))
    if not f1m:
        raise RuntimeError(f"no rollup_1m under {store_root}")
    finer = ray.data.read_parquet(f1m, columns=ROLLUP_COLS)

    def add_lts(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["conv_id"] = df["conv_id"].astype(str)
        df["metric"] = df["metric"].astype(str)
        return df.assign(last_ts=df["bucket_ms"].astype(np.int64))

    finer = finer.map_batches(add_lts, batch_format="pandas")
    rows = []
    for tier in tiers:
        coarse = cascade_dataset(finer, key_cols=TRANSCRIPT_KEYS,
                                 tier=tier)

        def drop_lts(df: pd.DataFrame) -> pd.DataFrame:
            out = df.drop(columns=["last_ts"])
            out["sum_v"] = round_half_away(out["sum_v"].to_numpy(), 6)
            return out

        out_ds = _with_day(coarse.map_batches(drop_lts,
                                              batch_format="pandas"),
                           "bucket_ms").materialize()
        tier_dir = f"{store_root}/rollup_{tier}"
        old = glob.glob(f"{tier_dir}/day=*")
        for p in old:
            shutil.rmtree(p)
        out_ds.write_parquet(tier_dir, partition_cols=["day"])
        rows.append({"tier": tier,
                     "n_days": len(glob.glob(f"{tier_dir}/day=*"))})
    return pd.DataFrame(rows)


def tool_latency(sf_dir: str):
    """Per-TOOL response latency: for every canonical tool-call turn
    whose next turn is an assistant turn, the ts gap — aggregated per
    tool as count / total / max (the mergeable subset of the
    :func:`response_latency` stats: a cross-conversation median would
    not fold across partitions, so it stays per-conv there).  Conv pass
    + one tiny tool exchange."""
    from ..stages.exchange import hash_exchange
    from ..stages.metrics import canonical_turns_arrow

    def kernel(batch):
        cols = ["tool", "n_responses", "total_latency_ms",
                "max_latency_ms"]
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str).to_numpy()
        role = t["role"].to_pandas().astype(str).to_numpy()
        tool = t["tool"].to_pandas().astype(str).to_numpy()
        ts = t["ts_ms"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pd.DataFrame({
            "tool": np.array([], dtype=object),
            "n_responses": np.array([], np.int64),
            "total_latency_ms": np.array([], np.int64),
            "max_latency_ms": np.array([], np.int64)})
        if len(conv) < 2:
            return empty
        same = conv[1:] == conv[:-1]
        pick = same & (tool[:-1] != "") & (role[1:] == "assistant")
        if not pick.any():
            return empty
        lat = (ts[1:] - ts[:-1])[pick]
        g = (pd.DataFrame({"tool": tool[:-1][pick], "lat": lat})
             .groupby("tool", sort=False)
             .agg(n_responses=("lat", "size"),
                  total_latency_ms=("lat", "sum"),
                  max_latency_ms=("lat", "max")).reset_index())
        for c in cols[1:]:
            g[c] = g[c].astype(np.int64)
        return g[cols]

    partials = _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")

    def key_fn(tbl):
        from ..util import arrow_col_hash

        return (arrow_col_hash(tbl, "tool") % np.uint64(4)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("tool", sort=False)
               .agg(n_responses=("n_responses", "sum"),
                    total_latency_ms=("total_latency_ms", "sum"),
                    max_latency_ms=("max_latency_ms", "max"))
               .reset_index())
        for c in ("n_responses", "total_latency_ms", "max_latency_ms"):
            out[c] = out[c].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=key_fn, n_parts=4, kernel=merge,
                         fmt="pandas")


def tool_mix_by_len(sf_dir: str, bands=(10, 20, 40)):
    """Tool-usage intensity BY CONVERSATION-LENGTH BAND: conversations
    bucket into fixed turn-count bands (<10, <20, <40, ≥40) and each
    band reports conv count, total turns and tool-call turns — the
    "do longer agent runs lean harder on tools?" diagnostic.  Fixed
    band edges are a schema contract (the PIVOT_TYPES discipline);
    per-conv pairs fold in the conv pass, band cells in a tiny
    exchange."""
    from ..stages.exchange import hash_exchange
    from ..stages.metrics import canonical_turns_arrow

    edges = list(bands)

    def kernel(batch):
        t = canonical_turns_arrow(batch)
        conv = t["conv_id"].to_pandas().astype(str)
        tool = t["tool"].to_pandas().astype(str).to_numpy()
        cols = ["band", "n_convs", "n_turns", "n_tool_turns"]
        if not len(conv):
            return pd.DataFrame({
                "band": np.array([], np.int64),
                "n_convs": np.array([], np.int64),
                "n_turns": np.array([], np.int64),
                "n_tool_turns": np.array([], np.int64)})
        g = pd.DataFrame({"conv": conv, "tool_turn": tool != ""})
        per = (g.groupby("conv", sort=False)
               .agg(n=("tool_turn", "size"), nt=("tool_turn", "sum"))
               .reset_index())
        band = np.searchsorted(np.asarray(edges, np.int64),
                               per["n"].to_numpy(np.int64),
                               side="right").astype(np.int64)
        out = (pd.DataFrame({"band": band,
                             "n": per["n"].to_numpy(np.int64),
                             "nt": per["nt"].to_numpy(np.int64)})
               .groupby("band", sort=False)
               .agg(n_convs=("n", "size"), n_turns=("n", "sum"),
                    n_tool_turns=("nt", "sum")).reset_index())
        for c in cols[1:]:
            out[c] = out[c].astype(np.int64)
        return out[cols]

    partials = _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")

    def key_fn(tbl):
        return (tbl.column("band").to_numpy().astype(np.uint64)
                % np.uint64(4)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("band", sort=False)
               .agg(n_convs=("n_convs", "sum"), n_turns=("n_turns", "sum"),
                    n_tool_turns=("n_tool_turns", "sum")).reset_index())
        for c in ("band", "n_convs", "n_turns", "n_tool_turns"):
            out[c] = out[c].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=key_fn, n_parts=4, kernel=merge,
                         fmt="pandas")


def streaming_roundtrip(sf_dir: str, n_actors: int = 4):
    """STREAMING ingest gate on the TRANSCRIPTS table (the events
    streaming gates' sibling — streaming × transcripts was the one
    uncovered cell): canonical text_len metric points derive in the
    shuffle-free conv pass, materialize as a point-stream parquet
    (deterministic /tmp cache), then flow through the SAME distributed
    per-router feed the events gates use (one reader task per encoder
    actor, conv-keyed) into streaming Gorilla encoders; sealed blocks
    decode back on the Dataset API and must value-hash-match the batch
    oracle (canonical (conv, ts) pairs are unique at the shipped sfs, so
    the strictly-increasing append precondition holds).  Exercises
    arrival-order watermarks, per-conv series routing and block sealing
    end-to-end on the store's own payload."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from ..sources.transcripts import CACHE_ROOT
    from ..stages.series import decode_blocks_batch
    from ..state.streaming import StreamingRouter, feed_parquet_distributed

    tune_context()
    tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(CACHE_ROOT, f"tstream_points_{tag}.parquet")
    if not os.path.exists(path):
        from ..stages.metrics import canonical_turns_arrow

        def kernel(batch):
            import pyarrow.compute as pc

            t = canonical_turns_arrow(batch)
            return pa.table({
                "conv_id": pc.cast(t["conv_id"], pa.string()),
                "ts": pc.multiply(t["ts_ms"], 1000),  # µs, the feed's unit
                "value": pc.cast(pc.utf8_length(
                    pc.cast(t["text"], "string")), "float64")})

        pts = _conv_partitioned(sf_dir, kernel, lean=False, fmt="pyarrow")
        tbl = pa.concat_tables([r for r in
                                (ray.get(x) for x in pts.to_arrow_refs())
                                if r.num_rows])
        tmp = f"{path}.tmp-{uuid.uuid4().hex[:8]}"
        pq.write_table(tbl, tmp)
        os.replace(tmp, path)

    router = StreamingRouter(n_actors=n_actors)
    feed_parquet_distributed(router, path, order_cols=("ts_ms",),
                             key_col="conv_id", metric="text_len")
    blocks = pd.DataFrame(router.seal())

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        out = decode_blocks_batch(df, key_cols=["key", "metric"])
        return pd.DataFrame({
            "conv_id": out["key"].astype(str),
            "metric": out["metric"].astype(str),
            "ts_ms": out["ts_ms"],
            "value": out["value"]})

    if len(blocks) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "conv_id": pd.Series([], dtype=object),
            "metric": pd.Series([], dtype=object),
            "ts_ms": pd.Series([], dtype=np.int64),
            "value": pd.Series([], dtype=np.float64)}))
    return ray.data.from_pandas(blocks).map_batches(
        decode, batch_format="pandas")
