"""Ray Data stages: per-series Gorilla block encode / decode.

The reference codec is single-threaded per block with all state
instance-scoped (``GorillaCompressor.java:13-26``) — blocks are
embarrassingly parallel, which is exactly the grain Ray Data wants:
columnar Arrow between stages, per-series sequential only inside one
grouped call.

Partitioning contract (documented per SURVEY.md §2b): series are keyed by
``(key, block_start)`` where ``block_start = ts - ts % block_span_ms`` and
``block_span_ms <= 2**27 - 2`` (the 27-bit first-delta limit,
``GorillaCompressor.java:18``) — so one group is bounded to one series-day
regardless of how long the underlying series is, which bounds group
materialization and tames skew before the groupby shuffle.
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd

from ..codec import (BitReader, CompressorV1, DecompressorV1, DifferentialFCM,
                     GorillaCompressor, GorillaDecompressor, decode_series,
                     encode_series_auto, payload_to_words, words_to_payload)
from ..codec import native
from ..codec.entropy import decode_block_e, encode_block_e


# Archival block wrapper: DEFLATE over the finished v2 word stream.  The
# Gorilla bitstream keeps ~18-39% byte-level slack on real stores (measured
# in BASELINE.md), so the cold/retention tier can trade encode throughput
# (zlib ~20-30 MB/s/core vs ~1.4 GB/s native v2) for that space.  Level 6:
# archival is ratio-bound, not latency-bound.
ZLIB_LEVEL = 6


def encode_series_v1(block_ts: int, ts: np.ndarray, vb: np.ndarray):
    """v1 (legacy) block (``Compressor.java``); kept for format parity —
    v2 is the default (``README.adoc:39-40``).  Native C kernel when
    available, streaming fallback (bit-identical, tested)."""
    if native.AVAILABLE:
        words, _ = native.encode(int(block_ts), ts, vb, True, "gorilla1")
        return words
    comp = CompressorV1(int(block_ts))
    for t, b in zip(ts.tolist(), vb.tolist()):
        comp.add_value(int(t), int(b))
    comp.close()
    return np.array(comp.out.to_words(), dtype=np.uint64)


def encode_series_dfcm(block_ts: int, ts: np.ndarray, vb: np.ndarray,
                       table_size: int = 1024):
    """v2 block with the DifferentialFCM predictor
    (``predictors/DifferentialFCM.java``) — sequential by nature; native C
    kernel when available, streaming fallback.  Decoder must be constructed
    with the same predictor (``README.adoc:76-77``)."""
    if native.AVAILABLE:
        words, _ = native.encode(int(block_ts), ts, vb, True,
                                 "gorilla2_dfcm", table_size)
        return words
    comp = GorillaCompressor(int(block_ts),
                             predictor=DifferentialFCM(table_size))
    for t, b in zip(ts.tolist(), vb.tolist()):
        comp.add_value(int(t), int(b))
    comp.close()
    return np.array(comp.out.to_words(), dtype=np.uint64)


def decode_series_dfcm(words, n_points: int, table_size: int = 1024):
    if native.AVAILABLE:
        return native.decode(np.asarray(words, dtype=np.uint64), n_points,
                             "gorilla2_dfcm", table_size)
    dec = GorillaDecompressor(
        BitReader(np.asarray(words, dtype=np.uint64).tolist()),
        predictor=DifferentialFCM(table_size))
    out_ts = np.empty(n_points, dtype=np.int64)
    out_v = np.empty(n_points, dtype=np.uint64)
    for i in range(n_points):
        pair = dec.read_pair()
        assert pair is not None, "short dfcm block"
        out_ts[i], out_v[i] = pair
    return out_ts, out_v


def decode_series_v1(words, n_points: int):
    """v1 decode (``Decompressor.java``) → (ts, value_bits) arrays."""
    if native.AVAILABLE:
        return native.decode(np.asarray(words, dtype=np.uint64), n_points,
                             "gorilla1")
    dec = DecompressorV1(BitReader(np.asarray(words, dtype=np.uint64).tolist()))
    out_ts = np.empty(n_points, dtype=np.int64)
    out_v = np.empty(n_points, dtype=np.uint64)
    for i in range(n_points):
        pair = dec.read_pair()
        assert pair is not None, "short v1 block"
        out_ts[i], out_v[i] = pair
    return out_ts, out_v


DAY_MS = 86_400_000
CODEC_NAME = "gorilla2"

# Block-store schema (SURVEY.md §1.2): one row per (key, block_start) block.
BLOCK_COLUMNS = ["key", "metric", "block_start", "n_points", "codec", "payload"]


def add_block_key(batch, ts_col: str = "ts_ms", block_span_ms: int = DAY_MS):
    """pyarrow map_batches UDF: add ``block_start`` from an int64 epoch-ms
    column.  Vectorized, zero-copy in."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ts = batch[ts_col]
    block_start = pc.multiply(pc.divide(ts, block_span_ms), block_span_ms)
    return batch.append_column("block_start", block_start)


def encode_group(df: pd.DataFrame, *, key_cols: list[str], ts_col: str = "ts_ms",
                 value_col: str = "value", metric: str = "value",
                 value_kind: str = "double") -> pd.DataFrame:
    """map_groups UDF: one (key..., block_start) group → one block row.

    Sorts by timestamp in-group (per-series order is restored here, never via
    a global sort — SURVEY.md §4), deduplicates exact-duplicate timestamps
    (keep first), and encodes with the vectorized codec.
    """
    block_start = int(df["block_start"].iloc[0])
    order = np.argsort(df[ts_col].to_numpy(), kind="stable")
    ts = df[ts_col].to_numpy()[order].astype(np.int64)
    if value_kind == "double":
        vb = df[value_col].to_numpy()[order].astype(np.float64).view(np.uint64)
    else:
        vb = df[value_col].to_numpy()[order].astype(np.int64).view(np.uint64)
    # drop duplicate timestamps (strict in-order append is a format
    # precondition, README.adoc:150)
    keep = np.concatenate(([True], np.diff(ts) > 0))
    ts, vb = ts[keep], vb[keep]
    # the zero-timestamp sentinel (GorillaCompressor.java:50): a first point
    # exactly at the block boundary is fine (delta 0), ts==0 is not.
    if len(ts) and ts[0] == 0:
        raise ValueError("timestamp 0 is not representable (reserved sentinel)")
    words, _ = encode_series_auto(block_start, ts, vb)
    row = {c: [df[c].iloc[0]] for c in key_cols}
    row.update({
        "metric": [metric],
        "block_start": [block_start],
        "n_points": [len(ts)],
        "codec": [CODEC_NAME],
        "value_kind": [value_kind],
        "payload": [words_to_payload(words)],
    })
    return pd.DataFrame(row)


def encode_partition(df: pd.DataFrame, *, key_cols: list[str],
                     ts_col: str = "ts_ms", value_col: str = "value",
                     metric_col: str | None = "metric",
                     value_kind: str = "double",
                     codec: str = CODEC_NAME) -> pd.DataFrame:
    """Partition-level encode: one hash partition holds many whole
    (key..., block_start) series; lexsort + boundary split + per-series
    encode (adaptive codec) — a few vectorized ops plus one cheap encode
    call per series, instead of one map_groups UDF invocation per series."""
    if len(df) == 0:
        return pd.DataFrame({c: [] for c in
                             key_cols + ["metric", "block_start", "n_points",
                                         "codec", "value_kind", "payload"]})
    sort_keys = [df[ts_col].to_numpy(), df["block_start"].to_numpy()]
    group_cols = ([metric_col] if metric_col else []) + key_cols
    group_codes = []
    for c in group_cols:
        a = df[c].to_numpy()
        if a.dtype.kind in "OUS":  # factorize strings: object lexsort is
            a, _ = pd.factorize(df[c], sort=True)  # Python-level compares
        group_codes.append(a)
        sort_keys.append(a)
    order = np.lexsort(tuple(sort_keys))
    df = df.iloc[order]
    # boundaries where any group column or block_start changes
    change = np.zeros(len(df), dtype=bool)
    for a in group_codes:
        a = a[order]  # codes were computed pre-sort
        change[1:] |= a[1:] != a[:-1]
    bs_sorted = df["block_start"].to_numpy()
    change[1:] |= bs_sorted[1:] != bs_sorted[:-1]
    change[0] = True
    starts = np.flatnonzero(change)
    bounds = np.append(starts, len(df))

    ts_all = df[ts_col].to_numpy().astype(np.int64)
    if value_kind == "double":
        vb_all = df[value_col].to_numpy().astype(np.float64).view(np.uint64)
    else:
        vb_all = df[value_col].to_numpy().astype(np.int64).view(np.uint64)
    bs_all = df["block_start"].to_numpy()

    out: dict[str, list] = {c: [] for c in key_cols}
    out_metric, out_bs, out_np, out_payload = [], [], [], []
    for i in range(len(starts)):
        lo, hi = bounds[i], bounds[i + 1]
        ts = ts_all[lo:hi]
        vb = vb_all[lo:hi]
        keep = np.concatenate(([True], np.diff(ts) > 0))
        if not keep.all():
            ts, vb = ts[keep], vb[keep]
        if codec == "gorilla2e":
            pay = encode_block_e(int(bs_all[lo]), ts, vb)
        else:
            if codec == "gorilla1":
                words = encode_series_v1(int(bs_all[lo]), ts, vb)
            elif codec == "gorilla2_dfcm":
                words = encode_series_dfcm(int(bs_all[lo]), ts, vb)
            else:
                words, _ = encode_series_auto(int(bs_all[lo]), ts, vb)
            pay = words_to_payload(words)
            if codec == "gorilla2z":
                pay = zlib.compress(pay, ZLIB_LEVEL)
        for c in key_cols:
            out[c].append(df[c].iloc[lo])
        out_metric.append(df[metric_col].iloc[lo] if metric_col else "value")
        out_bs.append(int(bs_all[lo]))
        out_np.append(len(ts))
        out_payload.append(pay)
    res = pd.DataFrame(out)
    res["metric"] = out_metric
    res["block_start"] = out_bs
    res["n_points"] = out_np
    res["codec"] = codec
    res["value_kind"] = value_kind
    res["payload"] = out_payload
    return res


def payload_binary_from_words(words: np.ndarray, w_off: np.ndarray):
    """One concatenated uint64 word stream + per-block word offsets → an
    Arrow binary payload column: one byteswap of the whole stream becomes
    the data buffer, offsets are word offsets × 8 (big-endian on-disk word
    order, ``LongArrayOutput.getLongArray``).  No per-block Python bytes
    objects — the batch-encode output feeds Arrow directly."""
    import pyarrow as pa

    n = len(w_off) - 1
    data = np.ascontiguousarray(words).astype(">u8").view(np.uint8)
    byte_off64 = np.asarray(w_off, dtype=np.int64) * 8
    if n and int(byte_off64[-1]) > np.iinfo(np.int32).max:  # >2 GB partition
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n, [None, pa.py_buffer(byte_off64),
                                   pa.py_buffer(data)])
    return pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(byte_off64.astype(np.int32)),
                         pa.py_buffer(data)])


def payload_binary_from_bytes(data: np.ndarray, b_off: np.ndarray):
    """One concatenated uint8 byte stream + per-block byte offsets → an
    Arrow binary payload column (the byte-granular twin of
    :func:`payload_binary_from_words` — gorilla2e payloads are bytes, not
    big-endian words, so no byteswap)."""
    import pyarrow as pa

    n = len(b_off) - 1
    data = np.ascontiguousarray(data, dtype=np.uint8)
    off64 = np.asarray(b_off, dtype=np.int64)
    if n and int(off64[-1]) > np.iinfo(np.int32).max:  # >2 GB partition
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n, [None, pa.py_buffer(off64),
                                   pa.py_buffer(data)])
    return pa.BinaryArray.from_buffers(
        pa.binary(), n, [None, pa.py_buffer(off64.astype(np.int32)),
                         pa.py_buffer(data)])


def encode_partition_arrow(tbl, *, key_cols: list[str],
                           ts_col: str = "ts_ms", value_col: str = "value",
                           metric_col: str | None = "metric",
                           value_kind: str = "double",
                           codec: str = CODEC_NAME):
    """Arrow-in/Arrow-out twin of :func:`encode_partition` (pinned equal by
    ``tests/test_series_arrow.py``): the partition arrives zero-copy from
    the exchange, numeric columns are consumed as zero-copy numpy views,
    string group columns via their dictionary codes, and — on the default
    v2/native path — ALL series of the partition encode in ONE
    ``native.encode_batch_v2`` call.  The payload column is built from one
    byteswap of the concatenated word stream + the word offsets
    (``pa.BinaryArray.from_buffers``): no per-series Python bytes objects,
    no per-series ctypes round-trips.

    Why this exists: the pandas form materializes object-dtype key/payload
    columns per batch and pays one Python+ctypes call per series; this was
    the last pandas-in leg of the ``events_roundtrip`` headline pipeline
    (CLAUDE.md round-5 candidate #2)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    out_names = (key_cols + ["metric", "block_start", "n_points", "codec",
                             "value_kind", "payload"])
    if tbl.num_rows == 0:
        cols = {}
        for c in key_cols:
            cols[c] = pa.chunked_array([[]], type=tbl.schema.field(c).type)
        cols["metric"] = pa.array([], pa.string())
        cols["block_start"] = pa.array([], pa.int64())
        cols["n_points"] = pa.array([], pa.int64())
        cols["codec"] = pa.array([], pa.string())
        cols["value_kind"] = pa.array([], pa.string())
        cols["payload"] = pa.array([], pa.binary())
        return pa.table({n: cols[n] for n in out_names})

    group_cols = ([metric_col] if metric_col else []) + key_cols
    # Arrow's sort_indices is a STABLE multi-key sort and measures ~25%
    # faster than np.lexsort on this shape; stability is load-bearing —
    # duplicate-timestamp dedup below keeps the FIRST occurrence, matching
    # the pandas kernel (pinned with differing-value duplicates in
    # tests/test_series_arrow.py).
    order_arr = pc.sort_indices(
        tbl.select(group_cols + ["block_start", ts_col]),
        sort_keys=[(c, "ascending")
                   for c in group_cols + ["block_start", ts_col]])
    order = order_arr.to_numpy()

    ts_s = tbl.column(ts_col).to_numpy()[order]
    bs_s = tbl.column("block_start").to_numpy()[order]
    change = np.zeros(tbl.num_rows, dtype=bool)
    for c in group_cols:
        col = tbl.column(c)
        if pa.types.is_string(col.type) or pa.types.is_large_string(col.type) \
                or pa.types.is_dictionary(col.type):
            enc = col if pa.types.is_dictionary(col.type) \
                else pc.dictionary_encode(col.combine_chunks())
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            codes = enc.indices.to_numpy().astype(np.int64)
        else:
            codes = col.to_numpy()
        cs = codes[order]
        change[1:] |= cs[1:] != cs[:-1]
    change[1:] |= bs_s[1:] != bs_s[:-1]
    change[0] = True
    # drop duplicate timestamps within a series (strict in-order append is
    # a format precondition, README.adoc:150); the first row of each series
    # is a change row, so it always survives
    keep = change.copy()
    keep[1:] |= ts_s[1:] > ts_s[:-1]

    vals = tbl.column(value_col).to_numpy()
    if value_kind == "double":
        vb_s = vals.astype(np.float64, copy=False).view(np.uint64)[order]
    else:
        vb_s = vals.astype(np.int64, copy=False).view(np.uint64)[order]

    first_idx = np.flatnonzero(change)          # per-series first sorted row
    ts_k = ts_s[keep]
    vb_k = vb_s[keep]
    starts_k = np.flatnonzero(change[keep])
    bounds = np.append(starts_k, len(ts_k)).astype(np.int64)
    n_points = np.diff(bounds)
    bts = bs_s[first_idx].astype(np.int64)

    if codec == "gorilla2e":
        if native.AVAILABLE:
            data, b_off = native.encode_e_batch(bts, ts_k, vb_k, bounds)
            payload = payload_binary_from_bytes(data, b_off)
        else:
            payload = pa.array(
                [encode_block_e(int(bts[s]), ts_k[bounds[s]:bounds[s + 1]],
                                vb_k[bounds[s]:bounds[s + 1]])
                 for s in range(len(bts))], pa.binary())
        take = pa.array(order[first_idx])
        cols = {c: pc.take(tbl.column(c), take) for c in key_cols}
        cols["metric"] = (pc.take(tbl.column(metric_col), take) if metric_col
                          else pa.repeat(pa.scalar("value"), len(bts)))
        cols["block_start"] = pa.array(bts)
        cols["n_points"] = pa.array(n_points.astype(np.int64))
        cols["codec"] = pa.repeat(pa.scalar(codec), len(bts))
        cols["value_kind"] = pa.repeat(pa.scalar(value_kind), len(bts))
        cols["payload"] = payload
        return pa.table({n: cols[n] for n in out_names})

    if codec in ("gorilla2", "gorilla2z") and native.AVAILABLE:
        words, w_off = native.encode_batch_v2(bts, ts_k, vb_k, bounds)
    else:
        parts, w_off = [], np.zeros(len(bts) + 1, dtype=np.int64)
        for s in range(len(bts)):
            ts_i = ts_k[bounds[s]:bounds[s + 1]]
            vb_i = vb_k[bounds[s]:bounds[s + 1]]
            if codec == "gorilla1":
                w = encode_series_v1(int(bts[s]), ts_i, vb_i)
            elif codec == "gorilla2_dfcm":
                w = encode_series_dfcm(int(bts[s]), ts_i, vb_i)
            else:
                w, _ = encode_series_auto(int(bts[s]), ts_i, vb_i)
            parts.append(np.asarray(w, dtype=np.uint64))
            w_off[s + 1] = w_off[s] + len(parts[-1])
        words = (np.concatenate(parts) if parts
                 else np.empty(0, dtype=np.uint64))

    if codec == "gorilla2z":
        data = np.ascontiguousarray(words).astype(">u8").view(np.uint8)
        off8 = np.asarray(w_off, dtype=np.int64) * 8
        payload = pa.array(
            [zlib.compress(data[off8[i]:off8[i + 1]].tobytes(), ZLIB_LEVEL)
             for i in range(len(bts))], pa.binary())
    else:
        payload = payload_binary_from_words(words, w_off)

    take = pa.array(order[first_idx])
    cols = {c: pc.take(tbl.column(c), take) for c in key_cols}
    cols["metric"] = (pc.take(tbl.column(metric_col), take) if metric_col
                      else pa.repeat(pa.scalar("value"), len(bts)))
    cols["block_start"] = pa.array(bts)
    cols["n_points"] = pa.array(n_points.astype(np.int64))
    cols["codec"] = pa.repeat(pa.scalar(codec), len(bts))
    cols["value_kind"] = pa.repeat(pa.scalar(value_kind), len(bts))
    cols["payload"] = payload
    return pa.table({n: cols[n] for n in out_names})


def decode_blocks_batch(df: pd.DataFrame, *, key_cols: list[str],
                        ts_out: str = "ts_ms", value_out: str = "value") -> pd.DataFrame:
    """map_batches UDF (stateless tasks): decode each block row back into
    its points.  Mirrors the streaming read path
    (``GorillaDecompressor.java:42-49``) but emits whole Arrow-backed
    columns per block batch.

    All default-codec (v2 double) rows decode in ONE native batch call —
    payloads are concatenated, byte-swapped once, and fanned out in C; the
    per-block Python loop only survives for legacy/dfcm rows.  Key columns
    fan out via a single ``np.repeat``."""
    n_rows = len(df)
    if n_rows == 0:
        out = {c: [] for c in key_cols}
        out[ts_out] = np.array([], dtype=np.int64)
        out[value_out] = np.array([], dtype=np.float64)
        return pd.DataFrame(out)
    codecs = (df["codec"].to_numpy() if "codec" in df.columns
              else np.full(n_rows, "gorilla2", dtype=object))
    kinds = (df["value_kind"].to_numpy() if "value_kind" in df.columns
             else np.full(n_rows, "double", dtype=object))
    n_points = df["n_points"].to_numpy().astype(np.int64)
    fast = ((codecs == "gorilla2") & (kinds == "double")
            if native.AVAILABLE else np.zeros(n_rows, dtype=bool))

    parts_ts: list[np.ndarray] = []
    parts_v: list[np.ndarray] = []
    parts_rep: list[np.ndarray] = []  # row index per output point

    if fast.any():
        idx = np.flatnonzero(fast)
        payloads = df["payload"].to_numpy()[idx]
        blob = b"".join(payloads)
        words = np.frombuffer(blob, dtype=">u8").astype(np.uint64)
        lens = np.fromiter((len(p) // 8 for p in payloads),
                           dtype=np.int64, count=len(idx))
        w_off = np.concatenate(([0], np.cumsum(lens)))
        ts, vb, out_off = native.decode_batch_v2(words, w_off, n_points[idx])
        parts_ts.append(ts)
        parts_v.append(vb.view(np.float64))
        parts_rep.append(np.repeat(idx, n_points[idx]))

    for i in np.flatnonzero(~fast):
        payload = df["payload"].iloc[i]
        n = int(n_points[i])
        if codecs[i] == "gorilla2e":
            ts, vb = decode_block_e(payload, n)
        else:
            if codecs[i] == "gorilla2z":
                payload = zlib.decompress(payload)
            words = payload_to_words(payload)
            if codecs[i] == "gorilla1":
                ts, vb = decode_series_v1(words, n)
            elif codecs[i] == "gorilla2_dfcm":
                ts, vb = decode_series_dfcm(words, n)
            else:
                ts, vb = decode_series(words, n_points=n)
        parts_ts.append(ts)
        if kinds[i] == "double":
            parts_v.append(vb.view(np.float64))
        else:
            parts_v.append(vb.view(np.int64).astype(np.float64))
        parts_rep.append(np.full(len(ts), i, dtype=np.int64))

    rep = np.concatenate(parts_rep)
    out = {c: df[c].to_numpy()[rep] for c in key_cols}
    out[ts_out] = np.concatenate(parts_ts)
    out[value_out] = np.concatenate(parts_v)
    return pd.DataFrame(out)


def decode_blocks_batch_arrow(tbl, *, key_cols: list[str],
                              ts_out: str = "ts_ms", value_out: str = "value"):
    """Arrow-in/Arrow-out twin of :func:`decode_blocks_batch` (pinned equal
    by ``tests/test_series_arrow.py``): the block batch arrives zero-copy
    from the object store and the payload bytes are consumed straight from
    the Arrow binary buffer.

    Why this exists: with ``batch_format="pandas"`` every binary payload is
    materialized as a Python ``bytes`` object and re-joined with
    ``b"".join`` before the native batch decode.  Arrow binary arrays
    already store row values CONTIGUOUSLY in one data buffer, so when every
    row takes the native fast path the concatenated word stream is a
    zero-copy slice of that buffer — no per-row bytes objects, no join.
    Mixed-codec batches gather only the fast rows' byte ranges with one
    vectorized fancy-index."""
    import pyarrow as pa
    import pyarrow.compute as pc

    n_rows = tbl.num_rows
    if n_rows == 0:
        cols = {c: tbl.column(c) for c in key_cols}
        cols[ts_out] = pa.array([], type=pa.int64())
        cols[value_out] = pa.array([], type=pa.float64())
        return pa.table(cols)

    names = tbl.schema.names
    codecs = (tbl.column("codec").to_numpy(zero_copy_only=False)
              if "codec" in names else np.full(n_rows, "gorilla2", dtype=object))
    kinds = (tbl.column("value_kind").to_numpy(zero_copy_only=False)
             if "value_kind" in names else np.full(n_rows, "double", dtype=object))
    n_points = tbl.column("n_points").to_numpy().astype(np.int64)

    pay = tbl.column("payload").combine_chunks()
    if isinstance(pay, pa.ChunkedArray):
        pay = pay.chunk(0)
    off_dtype = np.int64 if pa.types.is_large_binary(pay.type) else np.int32
    offsets = np.frombuffer(pay.buffers()[1], dtype=off_dtype)[
        pay.offset: pay.offset + n_rows + 1].astype(np.int64)
    data = np.frombuffer(pay.buffers()[2], dtype=np.uint8)

    fast = ((codecs == "gorilla2") & (kinds == "double")
            if native.AVAILABLE else np.zeros(n_rows, dtype=bool))

    parts_ts: list[np.ndarray] = []
    parts_v: list[np.ndarray] = []
    parts_rep: list[np.ndarray] = []

    if fast.any():
        idx = np.flatnonzero(fast)
        starts = offsets[idx]
        lens = offsets[idx + 1] - starts
        if len(idx) == n_rows:
            # all rows fast: the word stream IS the data buffer (binary
            # values are stored back-to-back) — zero-copy slice
            blob = data[offsets[0]:offsets[-1]]
        else:
            cl = np.concatenate(([0], np.cumsum(lens)))
            blob = data[np.arange(cl[-1]) + np.repeat(starts - cl[:-1], lens)]
        try:
            words = blob.view(">u8").astype(np.uint64)
        except ValueError:  # unaligned slice start — one copy, still no
            words = np.frombuffer(blob.tobytes(), dtype=">u8").astype(np.uint64)
        w_off = np.concatenate(([0], np.cumsum(lens // 8)))
        ts, vb, _ = native.decode_batch_v2(words, w_off, n_points[idx])
        parts_ts.append(ts)
        parts_v.append(vb.view(np.float64))
        parts_rep.append(np.repeat(idx, n_points[idx]))

    # gorilla2e double rows: gather byte ranges, one native batch call
    easy = ((codecs == "gorilla2e") & (kinds == "double")
            if native.AVAILABLE else np.zeros(n_rows, dtype=bool))
    if easy.any():
        idx = np.flatnonzero(easy)
        starts = offsets[idx]
        lens = offsets[idx + 1] - starts
        cl = np.concatenate(([0], np.cumsum(lens)))
        if len(idx) == n_rows:
            blob = data[offsets[0]:offsets[-1]]
        else:
            blob = data[np.arange(cl[-1]) + np.repeat(starts - cl[:-1], lens)]
        ts, vb, _ = native.decode_e_batch(blob, cl, n_points[idx])
        parts_ts.append(ts)
        parts_v.append(vb.view(np.float64))
        parts_rep.append(np.repeat(idx, n_points[idx]))

    for i in np.flatnonzero(~fast & ~easy):
        payload = data[offsets[i]:offsets[i + 1]].tobytes()
        n = int(n_points[i])
        if codecs[i] == "gorilla2e":
            ts, vb = decode_block_e(payload, n)
        else:
            if codecs[i] == "gorilla2z":
                payload = zlib.decompress(payload)
            words = payload_to_words(payload)
            if codecs[i] == "gorilla1":
                ts, vb = decode_series_v1(words, n)
            elif codecs[i] == "gorilla2_dfcm":
                ts, vb = decode_series_dfcm(words, n)
            else:
                ts, vb = decode_series(words, n_points=n)
        parts_ts.append(ts)
        if kinds[i] == "double":
            parts_v.append(vb.view(np.float64))
        else:
            parts_v.append(vb.view(np.int64).astype(np.float64))
        parts_rep.append(np.full(len(ts), i, dtype=np.int64))

    rep = pa.array(np.concatenate(parts_rep))
    cols = {c: pc.take(tbl.column(c), rep) for c in key_cols}
    cols[ts_out] = pa.array(np.concatenate(parts_ts))
    cols[value_out] = pa.array(np.concatenate(parts_v))
    return pa.table(cols)


def compressed_stats(block_df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch compression metrics: bytes of payload and point counts
    (drives the bytes/point benchmark figure)."""
    return pd.DataFrame({
        "payload_bytes": [int(block_df["payload"].str.len().sum())],
        "n_points": [int(block_df["n_points"].sum())],
        "n_blocks": [len(block_df)],
    })
