"""Per-conversation metric derivation (the engine's map/parse stage).

The reference has no per-record operators (SURVEY.md §2b) — this stage is
the engine-level front door: each transcript turn yields long-format metric
points ``(conv_id, ts_ms, metric, value)``:

- ``turn_count``   = 1 per turn
- ``text_len``     = len(text)
- ``tool_call``    = 1.0 if tool != '' else 0.0
- ``turn_gap_ms``  = ts - lag(ts) within the conversation (first turn emits
                     no point — a gap is an *absent* point in the Gorilla
                     data model, SURVEY.md §1.1)

Exact duplicate turns (replayed input on resume) are dropped on
``(conv_id, turn_idx)`` keep-first *inside the same grouped pass* — the
dedup shares the conv_id shuffle instead of adding one (SURVEY.md §2b
"Set ops / dedup").  Group size is bounded because conversation length is
clipped upstream; the rollup that follows uses partial+final aggregation so
no salting is required for the aggregate shuffle itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

METRICS = ["turn_count", "text_len", "tool_call", "turn_gap_ms"]

# --- user-extension surface -------------------------------------------------
# The reference exposes its seams as interfaces (``Predictor.java:22-37``,
# ``BitInput``/``BitOutput``); the engine's equivalent pipeline-step hook is
# this metric registry: name → vectorized fn(sorted turns df) → float64
# ndarray (one value per turn).  Registered metrics flow through rollups,
# gap-fill and Gorilla blocks with no further wiring.

CUSTOM_METRICS: dict = {}


def register_metric(name: str, fn) -> None:
    """Register a derived per-turn metric.

    ``fn(df)`` receives the deduplicated, (conv_id, turn_idx)-ordered turn
    frame of one partition and returns a float64 array aligned with it.
    """
    if name in METRICS:
        raise ValueError(f"{name} is a built-in metric")
    CUSTOM_METRICS[name] = fn


def unregister_metric(name: str) -> None:
    CUSTOM_METRICS.pop(name, None)


def dedup_sort_conv(df: pd.DataFrame) -> pd.DataFrame:
    """Stable (ts, turn_idx) order + keep-first dedup on turn_idx for ONE
    conversation."""
    df = df.sort_values(["turn_idx", "ts_ms"], kind="stable")
    keep = np.concatenate(([True], np.diff(df["turn_idx"].to_numpy()) > 0))
    return df[keep]


def derive_metrics_group(df: pd.DataFrame) -> pd.DataFrame:
    """map_groups UDF: ONE conversation → long-format metric points."""
    df = dedup_sort_conv(df)
    n = len(df)
    conv = df["conv_id"].iloc[0]
    ts = df["ts_ms"].to_numpy()
    text_len = df["text"].str.len().to_numpy().astype(np.float64)
    tool_call = (df["tool"].to_numpy() != "").astype(np.float64)

    parts = [
        pd.DataFrame({"ts_ms": ts, "metric": "turn_count",
                      "value": np.ones(n)}),
        pd.DataFrame({"ts_ms": ts, "metric": "text_len", "value": text_len}),
        pd.DataFrame({"ts_ms": ts, "metric": "tool_call", "value": tool_call}),
    ]
    if n > 1:
        parts.append(pd.DataFrame({
            "ts_ms": ts[1:], "metric": "turn_gap_ms",
            "value": np.diff(ts).astype(np.float64)}))
    out = pd.concat(parts, ignore_index=True)
    out.insert(0, "conv_id", conv)
    return out


def canonical_turns_group(df: pd.DataFrame) -> pd.DataFrame:
    """map_groups UDF: deduplicated, stably-ordered turns for ONE
    conversation — the per-turn text-equality invariant surface."""
    df = dedup_sort_conv(df)
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts_ms"]]


# ---- partition-level kernels ----------------------------------------------
# One hash partition holds MANY whole conversations; these kernels process
# the partition in a handful of vectorized numpy/pandas operations instead
# of one Python call per conversation (which costs ~5 ms/conv — milliseconds
# × 10^8 conversations at design scale).

def _dedup_sort_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Stable (conv_id, turn_idx, ts) order + keep-first dedup on
    (conv_id, turn_idx) across a whole partition.

    Sorts on factorized int codes — an object-string lexsort is Python
    comparisons per element and dominates the kernel at millions of rows."""
    df, _ = _dedup_sort_partition_codes(df)
    return df


def _dedup_sort_partition_codes(df: pd.DataFrame):
    codes, _ = pd.factorize(df["conv_id"], sort=True)
    order = np.lexsort((df["ts_ms"].to_numpy(),
                        df["turn_idx"].to_numpy(),
                        codes))
    df = df.iloc[order]
    conv_c = codes[order]
    tidx = df["turn_idx"].to_numpy()
    same = np.concatenate(([False],
                           (conv_c[1:] == conv_c[:-1]) & (tidx[1:] == tidx[:-1])))
    keep = ~same
    return df[keep], conv_c[keep]


def derive_metrics_partition(df: pd.DataFrame,
                             custom: dict | None = None) -> pd.DataFrame:
    """Vectorized dedup + metric derivation for a whole hash partition of
    conversations (same semantics as :func:`derive_metrics_group` applied
    per conversation).

    Accepts either a raw ``text`` column or a pre-computed ``text_len``
    (computed before the shuffle so full text never rides it)."""
    df, conv_c = _dedup_sort_partition_codes(df)
    n = len(df)
    if n == 0:
        return pd.DataFrame({"conv_id": [], "ts_ms": [], "metric": [],
                             "value": []})
    conv = df["conv_id"].to_numpy()
    ts = df["ts_ms"].to_numpy()
    if "text_len" in df.columns:
        text_len = df["text_len"].to_numpy().astype(np.float64)
    else:
        text_len = df["text"].str.len().to_numpy().astype(np.float64)
    if "tool_call" in df.columns:
        tool_call = df["tool_call"].to_numpy().astype(np.float64)
    else:
        tool_call = (df["tool"].to_numpy() != "").astype(np.float64)
    # gaps: diff within conversation (first turn of each conv emits nothing)
    same_conv = np.concatenate(([False], conv_c[1:] == conv_c[:-1]))
    gaps = np.empty(n, dtype=np.float64)
    gaps[0] = np.nan
    gaps[1:] = np.diff(ts).astype(np.float64)
    parts = [
        pd.DataFrame({"conv_id": conv, "ts_ms": ts, "metric": "turn_count",
                      "value": np.ones(n)}),
        pd.DataFrame({"conv_id": conv, "ts_ms": ts, "metric": "text_len",
                      "value": text_len}),
        pd.DataFrame({"conv_id": conv, "ts_ms": ts, "metric": "tool_call",
                      "value": tool_call}),
        pd.DataFrame({"conv_id": conv[same_conv], "ts_ms": ts[same_conv],
                      "metric": "turn_gap_ms", "value": gaps[same_conv]}),
    ]
    for name, fn in (custom if custom is not None else {}).items():
        vals = np.asarray(fn(df), dtype=np.float64)
        parts.append(pd.DataFrame({"conv_id": conv, "ts_ms": ts,
                                   "metric": name, "value": vals}))
    return pd.concat(parts, ignore_index=True)


def canonical_turns_partition(df: pd.DataFrame) -> pd.DataFrame:
    return _dedup_sort_partition(df)[
        ["conv_id", "turn_idx", "role", "text", "tool", "ts_ms"]]


# ---- Arrow-native partition kernels ---------------------------------------
# The pandas kernels above convert every string cell to a PyObject and pay
# for it in anonymous-memory page faults (the measured global bottleneck in
# this sandbox: ~0.5-1 GB/s of fresh pages regardless of cores).  These
# kernels take the partition as a pyarrow Table, dictionary-encode the conv
# key to int codes, and aggregate over contiguous runs with ufunc.reduceat —
# zero hash tables, zero object strings, allocations ≈ output size.

def _sorted_turn_arrays(batch):
    """pa.Table partition → dedup/sorted numpy arrays (all numeric).

    Fast path: if the partition is ALREADY (conv, turn_idx, ts)-sorted —
    the bucketed lake layout writes files that way — the lexsort and its
    5-column gather (the kernel's biggest memory churn) are skipped
    entirely; dedup reduces to an adjacent-equality mask.  Unsorted inputs
    take the general sort path (same results, tested)."""
    import pyarrow.compute as pc

    batch = batch.combine_chunks()
    col = batch["conv_id"]
    if batch.num_rows == 0 or col.num_chunks == 0:
        return (np.array([], dtype=np.int64), pa.array([], pa.string()),
                np.array([], dtype=np.int64), np.array([], dtype=np.int64), {})
    chunk = col.chunk(0)
    enc = (chunk if pa.types.is_dictionary(chunk.type)
           else pc.dictionary_encode(chunk))
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    conv_dict = enc.dictionary  # small pa.StringArray
    ts = batch["ts_ms"].to_numpy(zero_copy_only=False)
    tidx = batch["turn_idx"].to_numpy(zero_copy_only=False)

    dc = np.diff(codes)
    is_sorted = bool((dc >= 0).all()) and bool(
        ((dc > 0) | (np.diff(tidx.astype(np.int64)) > 0)
         | ((np.diff(tidx.astype(np.int64)) == 0) & (np.diff(ts) >= 0))).all())
    if not is_sorted:
        order = np.lexsort((ts, tidx, codes))
        codes = codes[order]
        ts = ts[order]
        tidx = tidx[order]
    same = np.concatenate(([False],
                           (codes[1:] == codes[:-1]) & (tidx[1:] == tidx[:-1])))
    keep = ~same
    if not is_sorted:
        order_kept = order[keep]  # ONE gather for the payload columns
    cols = {}
    for name in batch.column_names:
        if name in ("conv_id", "ts_ms", "turn_idx"):
            continue
        arr = batch[name].to_numpy(zero_copy_only=False)
        cols[name] = arr[keep] if is_sorted else arr[order_kept]
    return codes[keep], conv_dict, ts[keep], tidx[keep], cols


def _run_bounds(key: np.ndarray) -> np.ndarray:
    """Start indices of contiguous equal-key runs (key must be sorted)."""
    if len(key) == 0:
        return np.array([], dtype=np.int64)
    change = np.concatenate(([True], key[1:] != key[:-1]))
    return np.flatnonzero(change)


LONG_COLS = ["conv_id", "metric", "bucket_ms", "sum_v", "cnt",
             "min_v", "max_v", "last_ts", "last_v"]


def _const_str(value: str, n: int) -> "pa.Array":
    """Length-n constant string column without touching Python objects
    (one C++ take over a 1-element dictionary)."""
    import pyarrow.compute as pc

    return pc.take(pa.array([value]), pa.array(np.zeros(n, dtype=np.int32)))


DICT_STR = None  # set below once pa is imported


def _const_dict(value: str, n: int) -> "pa.Array":
    """Length-n constant string column as a dictionary array — 4 bytes/row
    of fresh memory instead of a materialized string per row (fresh
    anonymous pages are globally serialized in this environment, so output
    width IS the scaling ceiling of the map stages)."""
    return pa.DictionaryArray.from_arrays(
        pa.array(np.zeros(n, dtype=np.int32)), pa.array([value]))


def _dict_col(indices: np.ndarray, dictionary: "pa.Array") -> "pa.Array":
    return pa.DictionaryArray.from_arrays(
        pa.array(indices.astype(np.int32)), dictionary)


def _empty_long_table() -> "pa.Table":
    return pa.table({
        "conv_id": pa.array([], DICT_STR),
        "metric": pa.array([], DICT_STR),
        "bucket_ms": pa.array([], pa.int64()),
        "sum_v": pa.array([], pa.float64()),
        "cnt": pa.array([], pa.int64()),
        "min_v": pa.array([], pa.float64()),
        "max_v": pa.array([], pa.float64()),
        "last_ts": pa.array([], pa.int64()),
        "last_v": pa.array([], pa.float64()),
    })


def rollup_turns_arrow(batch, bucket_ms: int,
                       custom: dict | None = None) -> "pa.Table":
    """Arrow-native fused dedup+derive+rollup for one conv partition.

    Rows are (conv, ts)-sorted, so the combined (conv_code, bucket) key is
    non-decreasing → groups are contiguous runs → all five aggregates are
    single ``reduceat``/indexing passes.  Output is a pa.Table built from
    numpy buffers + Arrow string takes — zero Python string objects (fresh
    anonymous pages are the measured bottleneck here, BASELINE.md).
    Semantics identical to :func:`rollup_turns_partition` (tested)."""
    codes, conv_dict, ts, tidx, cols = _sorted_turn_arrays(batch)
    n = len(ts)
    if n == 0:
        return _empty_long_table()

    # keep float32 stats columns as-is: sums accumulate in f64 inside
    # reduceat (exact — values are integers < 2^24), min/max/last cast to
    # f64 at GROUP size, so no n-sized f64 temporaries are materialized
    value_cols = {}
    value_cols["text_len"] = cols["text_len"]
    value_cols["tool_call"] = cols["tool_call"]
    if custom:
        frame = pd.DataFrame({"turn_idx": tidx, "ts_ms": ts, **cols})
        for name, fn in custom.items():
            value_cols[name] = np.asarray(fn(frame), dtype=np.float64)

    bucket = (ts // bucket_ms) * bucket_ms
    span_idx = (bucket - bucket.min()) // bucket_ms
    key = codes * np.int64(span_idx.max() + 1) + span_idx

    starts = _run_bounds(key)
    ends = np.append(starts[1:], n)
    cnt = ends - starts
    last_ts = ts[ends - 1]

    tables = []

    def _agg_table(metric, vals, starts, ends, cnt, last_ts, codes, bucket):
        ng = len(starts)
        return pa.table({
            "conv_id": _dict_col(codes[starts], conv_dict),
            "metric": _const_dict(metric, ng),
            "bucket_ms": pa.array(bucket[starts]),
            "sum_v": pa.array(np.add.reduceat(vals, starts,
                                               dtype=np.float64)),
            "cnt": pa.array(cnt),
            "min_v": pa.array(np.minimum.reduceat(vals, starts)
                              .astype(np.float64, copy=False)),
            "max_v": pa.array(np.maximum.reduceat(vals, starts)
                              .astype(np.float64, copy=False)),
            "last_ts": pa.array(last_ts),
            "last_v": pa.array(vals[ends - 1].astype(np.float64,
                                                     copy=False)),
        })

    # turn_count is the constant-1 metric: its aggregates are closed-form
    # (sum = cnt, min = max = last = 1.0) — no n-sized ones array, no
    # reduceat passes, one shared group-sized ones buffer for 3 columns
    ones_g = pa.array(np.ones(len(starts)))
    tables.append(pa.table({
        "conv_id": _dict_col(codes[starts], conv_dict),
        "metric": _const_dict("turn_count", len(starts)),
        "bucket_ms": pa.array(bucket[starts]),
        "sum_v": pa.array(cnt.astype(np.float64)),
        "cnt": pa.array(cnt),
        "min_v": ones_g,
        "max_v": ones_g,
        "last_ts": pa.array(last_ts),
        "last_v": ones_g,
    }))
    for m, vals in value_cols.items():
        tables.append(_agg_table(m, vals, starts, ends, cnt, last_ts,
                                 codes, bucket))

    same_conv = np.concatenate(([False], codes[1:] == codes[:-1]))
    if same_conv.any():
        gaps = np.empty(n, dtype=np.float64)
        gaps[0] = 0
        gaps[1:] = np.diff(ts).astype(np.float64)
        sub = np.flatnonzero(same_conv)
        g_key = key[sub]
        g_starts = _run_bounds(g_key)
        g_ends = np.append(g_starts[1:], len(sub))
        tables.append(_agg_table(
            "turn_gap_ms", gaps[sub], g_starts, g_ends,
            g_ends - g_starts, ts[sub][g_ends - 1],
            codes[sub], bucket[sub]))

    return pa.concat_tables(t.select(LONG_COLS) for t in tables)


BLOCK_COLS = ["conv_id", "metric", "block_start", "n_points", "codec",
              "value_kind", "payload"]


def _empty_block_table() -> "pa.Table":
    return pa.table({
        "conv_id": pa.array([], DICT_STR),
        "metric": pa.array([], DICT_STR),
        "block_start": pa.array([], pa.int64()),
        "n_points": pa.array([], pa.int64()),
        "codec": pa.array([], DICT_STR),
        "value_kind": pa.array([], DICT_STR),
        "payload": pa.array([], pa.binary()),
    })


def encode_turns_arrow(batch, *, metric: str | None, day_ms: int,
                       custom: dict | None = None) -> "pa.Table":
    """Arrow-native fused dedup+derive+Gorilla-encode for one conv
    partition: per (conv, metric, day-block) series, boundaries from run
    detection on int codes; every series of a metric family encodes in ONE
    native batch call (per-series encode_series_auto fallback without a
    compiler)."""
    from .series import CODEC_NAME, payload_binary_from_words
    from ..codec import encode_series_auto

    codes, conv_dict, ts, tidx, cols = _sorted_turn_arrays(batch)
    n = len(ts)
    if n == 0:
        return _empty_block_table()

    value_cols = {}
    if metric in (None, "turn_count"):
        value_cols["turn_count"] = np.ones(n)
    if metric in (None, "text_len"):
        value_cols["text_len"] = cols["text_len"].astype(np.float64,
                                                         copy=False)
    if metric in (None, "tool_call"):
        value_cols["tool_call"] = cols["tool_call"].astype(np.float64,
                                                           copy=False)
    if custom:
        frame = pd.DataFrame({"turn_idx": tidx, "ts_ms": ts, **cols})
        for name, fn in custom.items():
            if metric in (None, name):
                value_cols[name] = np.asarray(fn(frame), dtype=np.float64)

    block = (ts // day_ms) * day_ms
    day_idx = (block - block.min()) // day_ms
    key = codes * np.int64(day_idx.max() + 1) + day_idx
    starts = _run_bounds(key)

    # per-series duplicate-ts dedup (keep-first), vectorized over the whole
    # partition: a row survives if it opens a series or strictly advances
    # the series timestamp
    change = np.zeros(n, dtype=bool)
    change[starts] = True
    gkeep = change.copy()
    gkeep[1:] |= ts[1:] > ts[:-1]
    ts_k = ts[gkeep]
    starts_k = np.flatnonzero(change[gkeep])
    bounds_k = np.append(starts_k, len(ts_k)).astype(np.int64)
    bts = block[starts].astype(np.int64)
    codes_s = codes[starts]

    def family(metric_name, ts_c, vb_c, bounds, bts_f, codes_f):
        """One metric's blocks for the whole partition → one pa.Table.
        Native: ONE ctypes call encodes every series of the family
        (encode_batch_v2) and the payload column is built from the word
        stream without per-series bytes objects."""
        from ..codec import native

        nb = len(bts_f)
        if native.AVAILABLE:
            words, w_off = native.encode_batch_v2(bts_f, ts_c, vb_c, bounds)
            payload = payload_binary_from_words(words, w_off)
        else:
            parts, w_off = [], np.zeros(nb + 1, dtype=np.int64)
            for s in range(nb):
                w, _ = encode_series_auto(int(bts_f[s]),
                                          ts_c[bounds[s]:bounds[s + 1]],
                                          vb_c[bounds[s]:bounds[s + 1]])
                parts.append(np.asarray(w, dtype=np.uint64))
                w_off[s + 1] = w_off[s] + len(parts[-1])
            payload = payload_binary_from_words(
                np.concatenate(parts) if parts
                else np.empty(0, dtype=np.uint64), w_off)
        return pa.table({
            "conv_id": _dict_col(codes_f, conv_dict),
            "metric": _const_dict(metric_name, nb),
            "block_start": pa.array(bts_f),
            "n_points": pa.array(np.diff(bounds)),
            "codec": _const_dict(CODEC_NAME, nb),
            "value_kind": _const_dict("double", nb),
            "payload": payload,
        })

    tables = [family(m, ts_k, vals[gkeep].view(np.uint64), bounds_k,
                     bts, codes_s)
              for m, vals in value_cols.items()]

    if metric in (None, "turn_gap_ms"):
        same_conv = np.concatenate(([False], codes[1:] == codes[:-1]))
        sub = np.flatnonzero(same_conv)
        if len(sub):
            gaps = np.diff(ts).astype(np.float64)  # gaps[i-1] for row i
            g_ts = ts[sub]
            g_vb = gaps[sub - 1].view(np.uint64)
            g_starts = _run_bounds(key[sub])
            g_change = np.zeros(len(sub), dtype=bool)
            g_change[g_starts] = True
            g_k = g_change.copy()
            g_k[1:] |= g_ts[1:] > g_ts[:-1]
            g_bounds = np.append(np.flatnonzero(g_change[g_k]),
                                 int(g_k.sum())).astype(np.int64)
            tables.append(family("turn_gap_ms", g_ts[g_k], g_vb[g_k],
                                 g_bounds, block[sub][g_starts].astype(
                                     np.int64), codes[sub][g_starts]))

    return pa.concat_tables(tables) if len(tables) > 1 else tables[0]


def _sorted_keep_index(batch):
    """Shared dedup/sort plan for a conv partition table: returns
    ``(enc, codes_kept, ts_kept, tidx_kept, selector)`` where ``selector``
    is either a boolean mask (already-sorted input) or an int index array —
    both applied with one Arrow C++ filter/take, no Python row objects."""
    import pyarrow.compute as pc

    chunk = batch["conv_id"].chunk(0)
    enc = (chunk if pa.types.is_dictionary(chunk.type)
           else pc.dictionary_encode(chunk))
    codes = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    ts = batch["ts_ms"].to_numpy(zero_copy_only=False)
    tidx = batch["turn_idx"].to_numpy(zero_copy_only=False)
    dc = np.diff(codes)
    dt = np.diff(tidx.astype(np.int64))
    is_sorted = bool((dc >= 0).all()) and bool(
        ((dc > 0) | (dt > 0) | ((dt == 0) & (np.diff(ts) >= 0))).all())
    if not is_sorted:
        order = np.lexsort((ts, tidx, codes))
        codes, ts, tidx = codes[order], ts[order], tidx[order]
    same = np.concatenate(([False],
                           (codes[1:] == codes[:-1]) & (tidx[1:] == tidx[:-1])))
    keep = ~same
    selector = keep if is_sorted else order[keep]
    return enc, codes[keep], ts[keep], tidx[keep], selector


def canonical_turns_arrow(batch) -> "pa.Table":
    """Arrow-native dedup + stable (conv, turn_idx, ts) ordering for one
    conv partition — the text-equality surface.  Strings move through ONE
    Arrow filter/take (C++), never through Python objects; semantics
    identical to :func:`canonical_turns_partition` (tested)."""
    import pyarrow.compute as pc

    batch = batch.combine_chunks()
    if batch.num_rows == 0:
        return pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "role": pa.array([], pa.string()),
            "text": pa.array([], pa.string()),
            "tool": pa.array([], pa.string()),
            "ts_ms": pa.array([], pa.int64()),
        })
    enc, codes, ts, tidx, selector = _sorted_keep_index(batch)
    if selector.dtype == bool:
        out = batch.filter(pa.array(selector))
    else:
        out = batch.take(pa.array(selector))
    out = out.select(["conv_id", "turn_idx", "role", "text", "tool", "ts_ms"])
    i = out.schema.get_field_index("conv_id")
    if pa.types.is_dictionary(out.schema.field(i).type):
        out = out.set_column(i, "conv_id", pc.cast(out["conv_id"],
                                                   pa.string()))
    return out


def derive_metrics_arrow(batch, custom: dict | None = None) -> "pa.Table":
    """Arrow-native dedup + long-format metric derivation for one conv
    partition — same semantics as :func:`derive_metrics_partition`
    (tested), with conv_id strings produced by Arrow takes instead of
    per-row Python objects (plain strings on the output: this is a
    driver-facing query surface)."""
    import pyarrow.compute as pc

    batch = batch.combine_chunks()
    if batch.num_rows == 0:
        return pa.table({"conv_id": pa.array([], pa.string()),
                         "ts_ms": pa.array([], pa.int64()),
                         "metric": pa.array([], pa.string()),
                         "value": pa.array([], pa.float64())})
    enc, codes, ts, tidx, selector = _sorted_keep_index(batch)
    conv_dict = enc.dictionary
    n = len(ts)

    def col(name):
        arr = batch[name].to_numpy(zero_copy_only=False)
        return arr[selector] if selector.dtype == bool else arr[selector]

    value_cols = {"turn_count": np.ones(n)}
    value_cols["text_len"] = (col("text_len").astype(np.float64)
                              if "text_len" in batch.column_names else
                              pc.utf8_length(batch["text"]).to_numpy(
                                  zero_copy_only=False)[selector]
                              .astype(np.float64))
    if "tool_call" in batch.column_names:
        value_cols["tool_call"] = col("tool_call").astype(np.float64)
    else:
        value_cols["tool_call"] = (col("tool") != "").astype(np.float64)
    if custom:
        cols_np = {name: col(name) for name in batch.column_names
                   if name not in ("conv_id",)}
        frame = pd.DataFrame({"turn_idx": tidx, "ts_ms": ts, **{
            k: v for k, v in cols_np.items() if k not in ("turn_idx", "ts_ms")}})
        for name, fn in custom.items():
            value_cols[name] = np.asarray(fn(frame), dtype=np.float64)

    conv_plain = pc.take(conv_dict, pa.array(codes))
    tables = []
    for m, vals in value_cols.items():
        tables.append(pa.table({
            "conv_id": conv_plain,
            "ts_ms": pa.array(ts),
            "metric": _const_dict(m, n),
            "value": pa.array(vals),
        }))
    same_conv = np.concatenate(([False], codes[1:] == codes[:-1]))
    if same_conv.any():
        gaps = np.empty(n, dtype=np.float64)
        gaps[0] = np.nan
        gaps[1:] = np.diff(ts).astype(np.float64)
        sub = np.flatnonzero(same_conv)
        tables.append(pa.table({
            "conv_id": pc.take(conv_dict, pa.array(codes[sub])),
            "ts_ms": pa.array(ts[sub]),
            "metric": _const_dict("turn_gap_ms", len(sub)),
            "value": pa.array(gaps[sub]),
        }))
    out = pa.concat_tables(tables)
    i = out.schema.get_field_index("metric")
    return out.set_column(i, "metric", pc.cast(out["metric"], pa.string()))


def reaggregate_arrow(tbl: "pa.Table", *, bucket_ms: int) -> "pa.Table":
    """Arrow-native tier cascade: re-bucket finer-tier rollup rows
    ``(conv_id, metric)`` to a coarser bucket and merge decomposably
    (sum/sum, cnt/sum, min/min, max/max, argmax-last_ts for ``last_v``).
    Same semantics as :func:`..stages.rollup.reaggregate_partials`
    (tested), zero Python string objects."""
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return _empty_long_table()
    tbl = tbl.combine_chunks()

    def enc(chunk):
        if pa.types.is_dictionary(chunk.type):
            return chunk
        return pc.dictionary_encode(chunk)

    conv_enc = enc(tbl["conv_id"].chunk(0))
    met_enc = enc(tbl["metric"].chunk(0))
    ccode = conv_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    mcode = met_enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    nm = int(mcode.max()) + 1
    key0 = ccode * nm + mcode
    bucket = tbl["bucket_ms"].to_numpy(zero_copy_only=False)
    bucket = (bucket // bucket_ms) * bucket_ms
    last_ts = tbl["last_ts"].to_numpy(zero_copy_only=False)
    order = np.lexsort((last_ts, bucket, key0))
    key0 = key0[order]
    bucket = bucket[order]
    last_ts = last_ts[order]
    span = bucket - bucket.min()
    span_idx = span // bucket_ms
    key = key0 * np.int64(span_idx.max() + 1) + span_idx
    starts = _run_bounds(key)
    ends = np.append(starts[1:], len(key))

    sum_v = tbl["sum_v"].to_numpy(zero_copy_only=False)[order]
    cnt = tbl["cnt"].to_numpy(zero_copy_only=False)[order]
    min_v = tbl["min_v"].to_numpy(zero_copy_only=False)[order]
    max_v = tbl["max_v"].to_numpy(zero_copy_only=False)[order]
    last_v = tbl["last_v"].to_numpy(zero_copy_only=False)[order]

    g_codes = key0[starts]
    return pa.table({
        "conv_id": _dict_col(g_codes // nm, conv_enc.dictionary),
        "metric": _dict_col(g_codes % nm, met_enc.dictionary),
        "bucket_ms": pa.array(bucket[starts]),
        "sum_v": pa.array(np.add.reduceat(sum_v, starts)),
        "cnt": pa.array(np.add.reduceat(cnt, starts)),
        "min_v": pa.array(np.minimum.reduceat(min_v, starts)),
        "max_v": pa.array(np.maximum.reduceat(max_v, starts)),
        "last_ts": pa.array(last_ts[ends - 1]),
        "last_v": pa.array(last_v[ends - 1]),
    }).select(LONG_COLS)


import pyarrow as pa  # noqa: E402  (used by the arrow kernels above)

DICT_STR = pa.dictionary(pa.int32(), pa.string())


def rollup_turns_partition(df: pd.DataFrame, bucket_ms: int,
                           custom: dict | None = None) -> pd.DataFrame:
    """Fused dedup + derive + rollup for one conv partition WITHOUT
    materializing the 4× long-format point table: one wide groupby over the
    turn frame, melted to the long rollup schema afterwards.  Anonymous
    allocations are the scarce resource (sandboxed kernels serialize
    first-touch faults), so peak memory ≈ input + output here.

    Semantics identical to ``derive_metrics_partition`` → ``partial_rollup``
    (tested)."""
    df, conv_c = _dedup_sort_partition_codes(df)
    n = len(df)
    value_cols = {}
    conv = df["conv_id"].to_numpy()
    ts = df["ts_ms"].to_numpy()
    value_cols["turn_count"] = np.ones(n)
    value_cols["text_len"] = (df["text_len"].to_numpy().astype(np.float64)
                              if "text_len" in df.columns
                              else df["text"].str.len().to_numpy().astype(np.float64))
    value_cols["tool_call"] = (df["tool_call"].to_numpy().astype(np.float64)
                               if "tool_call" in df.columns
                               else (df["tool"].to_numpy() != "").astype(np.float64))
    for name, fn in (custom or {}).items():
        value_cols[name] = np.asarray(fn(df), dtype=np.float64)

    out_frames = []
    long_cols = ["conv_id", "metric", "bucket_ms", "sum_v", "cnt",
                 "min_v", "max_v", "last_ts", "last_v"]
    if n:
        bucket = (ts // bucket_ms) * bucket_ms
        wide = pd.DataFrame({"conv_id": conv, "bucket_ms": bucket, "ts": ts})
        aggs = {"cnt": ("ts", "count"), "last_ts": ("ts", "last")}
        for m in value_cols:
            wide[m] = value_cols[m]
            aggs[f"{m}__sum"] = (m, "sum")
            aggs[f"{m}__min"] = (m, "min")
            aggs[f"{m}__max"] = (m, "max")
            aggs[f"{m}__last"] = (m, "last")  # rows are ts-ordered per conv
        g = wide.groupby(["conv_id", "bucket_ms"], sort=False).agg(**aggs)
        g = g.reset_index()
        for m in value_cols:
            out_frames.append(pd.DataFrame({
                "conv_id": g["conv_id"], "metric": m,
                "bucket_ms": g["bucket_ms"],
                "sum_v": g[f"{m}__sum"], "cnt": g["cnt"],
                "min_v": g[f"{m}__min"], "max_v": g[f"{m}__max"],
                "last_ts": g["last_ts"], "last_v": g[f"{m}__last"],
            }))
        # turn_gap_ms rides a separate (smaller) groupby: its rows exclude
        # each conversation's first turn
        same_conv = np.concatenate(([False], conv_c[1:] == conv_c[:-1]))
        if same_conv.any():
            gaps = np.empty(n, dtype=np.float64)
            gaps[0] = 0
            gaps[1:] = np.diff(ts).astype(np.float64)
            gw = pd.DataFrame({"conv_id": conv[same_conv],
                               "bucket_ms": bucket[same_conv],
                               "ts": ts[same_conv], "v": gaps[same_conv]})
            gg = gw.groupby(["conv_id", "bucket_ms"], sort=False).agg(
                sum_v=("v", "sum"), cnt=("v", "count"), min_v=("v", "min"),
                max_v=("v", "max"), last_ts=("ts", "last"),
                last_v=("v", "last")).reset_index()
            gg.insert(1, "metric", "turn_gap_ms")
            out_frames.append(gg[long_cols])
    if not out_frames:
        return pd.DataFrame({c: [] for c in long_cols})
    return pd.concat([f[long_cols] for f in out_frames], ignore_index=True)
