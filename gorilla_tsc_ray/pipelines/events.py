"""Event-stream pipelines over the driver's ``events`` table
(``event_id, ts: timestamp[us], user_id, event_type, value, props``).

These are the DuckDB-oracle-checked query surface: each function takes
``sf_dir`` and returns a Ray ``Dataset`` whose rows match the corresponding
SQL in ``__ray_entry__.oracle_sql()``.

Timestamps are truncated to epoch milliseconds for the codec path (the
reference format stores millisecond epochs, ``README.adoc:146``; the 27-bit
first delta bounds a block to ≤ 2**27-2 ms, hence day-bounded blocks).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..util import arrow_col_hash, round_half_away

from ..context import tune_context
from ..stages.exchange import hash_exchange, hash_exchange_multi
from ..stages.rollup import (HOUR_MS, TIER_MS, cascade_dataset,
                             gapfill_partition, partial_rollup,
                             partial_rollup_arrow, reaggregate_partials,
                             reaggregate_partials_arrow, rollup_dataset)
from ..stages.rollup import finalize_by_partition
from ..stages.series import (DAY_MS, decode_blocks_batch,
                             decode_blocks_batch_arrow, encode_partition,
                             encode_partition_arrow)
from ..util import hash_partition_ids

EVENT_COLS = ["user_id", "ts", "value"]
N_PARTS = 64
_PART_BYTES = 128 << 10


def _n_parts(sf_dir: str) -> int:
    """Exchange/read partition count, adaptive to the events table size:
    one partition per ~128 KB of input, floor 8, cap ``N_PARTS`` (≈2
    reduce waves on a 32-cpu session; scale-out beyond one node comes from
    node count, not a larger per-table constant).  At small scale exchange
    cost is pure task scheduling, not compute — 64 fixed partitions
    measured 2.8× slower than 16 on the 2 MB sf0.1 events table."""
    import os

    for ext in ("parquet", "csv", "jsonl"):
        try:
            sz = os.path.getsize(f"{sf_dir.rstrip('/')}/events.{ext}")
            return min(N_PARTS, max(8, int(sz // _PART_BYTES)))
        except OSError:
            continue
    return N_PARTS


def _count_partial_arrow(keys: list[str]):
    """In-batch (keys) → cnt combiner as one Arrow ``group_by`` C kernel
    (pinned equal to the pandas ``.size()`` partial by the downstream
    oracles; 152 → 46 ms per 1M-row batch measured)."""

    def fn(tbl):
        out = tbl.group_by(keys, use_threads=False).aggregate(
            [([], "count_all")])
        idx = out.schema.get_field_index("count_all")
        return out.rename_columns(
            [c if i != idx else "cnt" for i, c in enumerate(out.schema.names)])

    return fn


def _user_key_fn(n_parts: int):
    """Partition id per row from the user hash (exchange key)."""

    def key_fn(tbl):
        return (arrow_col_hash(tbl, "user_id")
                % np.uint64(n_parts)).astype(np.int64)

    return key_fn


def _read_events(sf_dir: str, columns: list[str],
                 n_blocks: int | None = None):
    """Format-autodetecting events read (parquet > csv > jsonl) with the
    canonical column types enforced (non-parquet readers infer e.g.
    string-typed timestamps)."""
    import pyarrow as pa

    from ..sources.tables import read_table_auto

    tune_context()
    return read_table_auto(
        sf_dir, "events", columns=columns,
        override_num_blocks=n_blocks or _n_parts(sf_dir),
        cast={"ts": pa.timestamp("us"), "user_id": pa.int64(),
              "event_id": pa.int64(), "value": pa.float64()})


def _read_points(sf_dir: str, n_blocks: int | None = None):
    """Column-pruned read + vectorized ms-epoch derivation."""
    import pyarrow.compute as pc
    import ray.data

    ds = _read_events(sf_dir, EVENT_COLS, n_blocks)

    def to_ms(batch):
        ts_us = pc.cast(batch["ts"], "int64")  # timestamp[us] → int64 us
        ts_ms = pc.divide(ts_us, 1000)
        batch = batch.drop_columns(["ts"]).append_column("ts_ms", ts_ms)
        return batch

    return ds.map_batches(to_ms, batch_format="pyarrow")


def _encode_by_partition(keyed_ds, codec: str = "gorilla2",
                         n_parts: int = N_PARTS):
    """Hash (user, day-block) series into bounded partitions; encode every
    series of a partition in one vectorized kernel (one Python call per
    partition, not per series).

    SALTING (SURVEY §4 north-rule requirement): the partition key includes
    ``block_start``, so a pathological hot user — one key with millions of
    rows — spreads across partitions day-by-day instead of melting one
    task.  This is safe precisely because the encode grain is the
    day-bounded block (``GorillaCompressor.java:18`` 27-bit first delta):
    every (user, day) group stays whole.  Skew test:
    ``tests/test_events_pipelines.py::test_hot_user_skew_salting``."""

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "user_id")
        bs = tbl.column("block_start").to_numpy(zero_copy_only=False)
        # salt with the DAY INDEX (bs is a multiple of DAY_MS, which shares
        # factors with the power-of-two partition count)
        h = h * np.uint64(1_000_003) + (bs // DAY_MS).astype(np.uint64)
        return (h % np.uint64(n_parts)).astype(np.int64)

    def enc(tbl):
        # Arrow-in encode: zero-copy columns, one native batch-encode call
        # per partition (pinned equal to the pandas kernel —
        # tests/test_series_arrow.py)
        return encode_partition_arrow(tbl, key_cols=["user_id"],
                                      metric_col=None, codec=codec)

    return hash_exchange(keyed_ds, key_fn=key_fn, n_parts=n_parts,
                         kernel=enc, fmt="pyarrow")


def points_roundtrip_dfcm(sf_dir: str):
    """Round-trip with the DifferentialFCM predictor on both ends."""
    import pyarrow.compute as pc

    ds = _read_points(sf_dir)

    def add_block(batch):
        bs = pc.multiply(pc.divide(batch["ts_ms"], DAY_MS), DAY_MS)
        return batch.append_column("block_start", bs)

    blocks = _encode_by_partition(ds.map_batches(add_block,
                                                 batch_format="pyarrow"),
                                  codec="gorilla2_dfcm",
                                  n_parts=_n_parts(sf_dir))
    return blocks.map_batches(
        decode_blocks_batch_arrow, batch_format="pyarrow",
        fn_kwargs={"key_cols": ["user_id"]},
    ).select_columns(["user_id", "ts_ms", "value"])


def points_roundtrip_zlib(sf_dir: str):
    """Round-trip through the ARCHIVAL codec (``gorilla2z``): v2 Gorilla
    blocks DEFLATE-wrapped after encode — the cold/retention-tier format
    (the Gorilla bitstream keeps ~18–39% byte-level slack on real stores,
    measured in BASELINE.md; zlib trades encode throughput for that
    space).  The native batch encoder still produces the word stream in
    one C call; only the per-block compress/decompress is Python-zlib."""
    import pyarrow.compute as pc

    ds = _read_points(sf_dir)

    def add_block(batch):
        bs = pc.multiply(pc.divide(batch["ts_ms"], DAY_MS), DAY_MS)
        return batch.append_column("block_start", bs)

    blocks = _encode_by_partition(ds.map_batches(add_block,
                                                 batch_format="pyarrow"),
                                  codec="gorilla2z",
                                  n_parts=_n_parts(sf_dir))
    return blocks.map_batches(
        decode_blocks_batch_arrow, batch_format="pyarrow",
        fn_kwargs={"key_cols": ["user_id"]},
    ).select_columns(["user_id", "ts_ms", "value"])


def points_roundtrip_entropy(sf_dir: str):
    """Round-trip through the ENTROPY-CODED stream-split codec
    (``gorilla2e``): the delta-of-delta stream goes through an adaptive
    binary range coder (LZMA-style bit models + per-bucket bit-trees +
    a bit-length-coded 32-bit escape), values keep the exact v2 XOR
    coding, packed at byte granularity with no EOF/word padding
    (``codec/_native.c`` ``gtsc_encode_e``; round-4 verdict item #2 — the
    mixed store is timestamp-entropy-bound, and only recoding the dod
    stream moves it).  Both encode and decode run as one native batch
    call per partition."""
    import pyarrow.compute as pc

    ds = _read_points(sf_dir)

    def add_block(batch):
        bs = pc.multiply(pc.divide(batch["ts_ms"], DAY_MS), DAY_MS)
        return batch.append_column("block_start", bs)

    blocks = _encode_by_partition(ds.map_batches(add_block,
                                                 batch_format="pyarrow"),
                                  codec="gorilla2e",
                                  n_parts=_n_parts(sf_dir))
    return blocks.map_batches(
        decode_blocks_batch_arrow, batch_format="pyarrow",
        fn_kwargs={"key_cols": ["user_id"]},
    ).select_columns(["user_id", "ts_ms", "value"])


def points_roundtrip_v1(sf_dir: str):
    """Same round-trip through the LEGACY v1 codec (``Compressor.java`` /
    ``Decompressor.java``) — format parity for the reference's older
    format."""
    import pyarrow.compute as pc

    ds = _read_points(sf_dir)

    def add_block(batch):
        bs = pc.multiply(pc.divide(batch["ts_ms"], DAY_MS), DAY_MS)
        return batch.append_column("block_start", bs)

    blocks = _encode_by_partition(ds.map_batches(add_block,
                                                 batch_format="pyarrow"),
                                  codec="gorilla1",
                                  n_parts=_n_parts(sf_dir))
    return blocks.map_batches(
        decode_blocks_batch_arrow, batch_format="pyarrow",
        fn_kwargs={"key_cols": ["user_id"]},
    ).select_columns(["user_id", "ts_ms", "value"])


def points_roundtrip(sf_dir: str):
    """Flagship codec gate: events → per-(user, day) Gorilla blocks →
    decode → points.  The result must equal the input points exactly
    (bit-exact value round-trip through the compressed representation)."""
    import pyarrow.compute as pc

    ds = _read_points(sf_dir)

    def add_block(batch):
        bs = pc.multiply(pc.divide(batch["ts_ms"], DAY_MS), DAY_MS)
        return batch.append_column("block_start", bs)

    blocks = _encode_by_partition(ds.map_batches(add_block,
                                                 batch_format="pyarrow"),
                                  n_parts=_n_parts(sf_dir))
    points = blocks.map_batches(
        decode_blocks_batch_arrow, batch_format="pyarrow",
        fn_kwargs={"key_cols": ["user_id"]},
    )
    return points.select_columns(["user_id", "ts_ms", "value"])


def points_roundtrip_long(sf_dir: str):
    """Round-trip through the LONG value path (``Pair.getLongValue`` /
    ``addValue(long,long)`` semantics): values stored as raw int64 bit
    patterns instead of doubles.  Input floats are scaled to integer cents
    so the oracle is exact."""
    import pyarrow.compute as pc

    ds = _read_points(sf_dir)

    def to_cents(batch):
        import pyarrow as pa

        v = batch["value"].to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(np.int64)
        bs = pc.multiply(pc.divide(batch["ts_ms"], DAY_MS), DAY_MS)
        return (batch.drop_columns(["value"])
                .append_column("value", pa.array(cents))
                .append_column("block_start", bs))

    P = _n_parts(sf_dir)

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "user_id")
        bs = tbl.column("block_start").to_numpy(zero_copy_only=False)
        h = h * np.uint64(1_000_003) + (bs // DAY_MS).astype(np.uint64)
        return (h % np.uint64(P)).astype(np.int64)

    def enc(tbl):
        return encode_partition_arrow(tbl, key_cols=["user_id"],
                                      metric_col=None, value_kind="long")

    blocks = hash_exchange(ds.map_batches(to_cents, batch_format="pyarrow"),
                           key_fn=key_fn, n_parts=P, kernel=enc,
                           fmt="pyarrow")
    pts = blocks.map_batches(decode_blocks_batch_arrow, batch_format="pyarrow",
                             fn_kwargs={"key_cols": ["user_id"]})

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["user_id", "ts_ms"]].copy()
        out["cents"] = df["value"].to_numpy().astype(np.int64)
        return out

    return pts.map_batches(fin, batch_format="pandas")


def encode_blocks(sf_dir: str):
    """The block store itself (schema per SURVEY.md §1.2) — used by bench
    and by the compression-ratio metric."""
    import pyarrow.compute as pc

    ds = _read_points(sf_dir)

    def add_block(batch):
        bs = pc.multiply(pc.divide(batch["ts_ms"], DAY_MS), DAY_MS)
        return batch.append_column("block_start", bs)

    return _encode_by_partition(ds.map_batches(add_block,
                                               batch_format="pyarrow"),
                                n_parts=_n_parts(sf_dir))


def _finalize_rollup(ds):
    """Shared projection: round sum_v to 6 decimals (cross-engine float-sum
    association differences), drop the internal last_ts column."""

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=["last_ts"])
        out["sum_v"] = round_half_away(out["sum_v"].to_numpy(), 6)
        return out

    return ds.map_batches(fin, batch_format="pandas")


def rollup(sf_dir: str, tier: str):
    ds = _read_points(sf_dir)
    rolled = rollup_dataset(ds, key_cols=["user_id"], tier=tier,
                            n_parts=_n_parts(sf_dir))
    return _finalize_rollup(
        rolled).select_columns(["user_id", "bucket_ms", "sum_v", "cnt",
                                "min_v", "max_v", "last_v"])


def rollup_by_type(sf_dir: str, tier: str = "1h"):
    """Multi-key rollup: (user_id, event_type, bucket) — same partial+final
    machinery with a composite series key."""
    import pyarrow.compute as pc
    import ray.data

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "ts", "value"], P)

    def to_ms(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"), 1000)
        return batch.drop_columns(["ts"]).append_column("ts_ms", ts_ms)

    pts = ds.map_batches(to_ms, batch_format="pyarrow")
    rolled = rollup_dataset(pts, key_cols=["user_id", "event_type"], tier=tier,
                            n_parts=P)
    return _finalize_rollup(rolled).select_columns(
        ["user_id", "event_type", "bucket_ms", "sum_v", "cnt",
         "min_v", "max_v", "last_v"])


def rollup_1h_via_cascade(sf_dir: str):
    """1m → 1h re-aggregation (partial+final over the finer tier; never
    re-reads raw points).  Must equal the direct 1h rollup — the oracle SQL
    is the same as ``rollup(sf_dir, "1h")``'s."""
    ds = _read_points(sf_dir)
    P = _n_parts(sf_dir)
    one_m = rollup_dataset(ds, key_cols=["user_id"], tier="1m", n_parts=P)
    one_h = cascade_dataset(one_m, key_cols=["user_id"], tier="1h", n_parts=P)
    return _finalize_rollup(
        one_h).select_columns(["user_id", "bucket_ms", "sum_v", "cnt",
                               "min_v", "max_v", "last_v"])


def rollup_hopping(sf_dir: str, window_ms: int = HOUR_MS,
                   hop_ms: int = 900_000):
    """Hopping (sliding) window aggregate: one row per (user, window-start)
    for every window ``[s, s + window_ms)`` that contains ≥1 event, with
    window starts advancing every ``hop_ms`` (default 1 h windows every
    15 min — each event lands in 4 overlapping windows).

    Pane ("slicing") optimization: points are first combined to
    NON-overlapping ``hop_ms`` panes with the same in-batch partial kernel
    the tumbling tiers use; each pane partial is then replicated to the
    ``window_ms / hop_ms`` windows containing it and merged by the one
    finalize exchange.  Raw points never multiply across the shuffle —
    only pane partials do (bounded: users × panes/batch × k rows), because
    sum/cnt/min/max/last all decompose over panes that lie entirely inside
    each window.
    """
    if window_ms % hop_ms:
        raise ValueError("window_ms must be a multiple of hop_ms")
    k = window_ms // hop_ms
    ds = _read_points(sf_dir)
    P = _n_parts(sf_dir)

    panes = ds.map_batches(
        partial_rollup_arrow,
        fn_kwargs={"key_cols": ["user_id"], "bucket_ms": hop_ms},
        batch_format="pyarrow")

    def expand(t):
        import pyarrow as pa
        if t.num_rows == 0:
            return t
        n = t.num_rows
        rep = t.take(pa.array(np.repeat(np.arange(n, dtype=np.int64), k)))
        shift = np.tile(np.arange(k, dtype=np.int64) * hop_ms, n)
        nb = pa.array(rep.column("bucket_ms").to_numpy() - shift)
        rep = rep.set_column(rep.schema.get_field_index("bucket_ms"),
                             "bucket_ms", nb)
        # window starts are hop-aligned, so re-bucketing at hop_ms is the
        # identity — this call only merges same-(user, window) pane rows
        # within the batch before the shuffle
        return reaggregate_partials_arrow(rep, key_cols=["user_id"],
                                          bucket_ms=hop_ms)

    expanded = panes.map_batches(expand, batch_format="pyarrow")
    final = finalize_by_partition(expanded, key_cols=["user_id"], n_parts=P)
    return _finalize_rollup(final).select_columns(
        ["user_id", "bucket_ms", "sum_v", "cnt", "min_v", "max_v", "last_v"])


def rollup_delta(sf_dir: str, tier: str = "1h"):
    """Per-series derivative of a rollup (PromQL ``delta``/``rate`` shape):
    for each user's bucket, the change in ``sum_v`` vs the user's previous
    EXISTING bucket and the per-second rate over the elapsed bucket span
    (NaN on each user's first bucket).  One user-hash exchange after the
    rollup; the lag is a vectorized per-partition groupby shift."""
    bucket_ms = TIER_MS[tier]
    ds = _read_points(sf_dir)
    P = _n_parts(sf_dir)
    rolled = rollup_dataset(ds, key_cols=["user_id"], tier=tier, n_parts=P)

    def delta_kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in
                                 ["user_id", "bucket_ms", "sum_v",
                                  "delta_sum", "rate_per_s"]})
        df = df.sort_values(["user_id", "bucket_ms"], kind="stable")
        sum_v = round_half_away(df["sum_v"].to_numpy(), 6)
        g = df.groupby("user_id", sort=False)
        prev_sum = round_half_away(
            g["sum_v"].shift(1).to_numpy(), 6)
        prev_bucket = g["bucket_ms"].shift(1).to_numpy()
        delta = round_half_away(sum_v - prev_sum, 6)
        span_s = (df["bucket_ms"].to_numpy() - prev_bucket) / 1000.0
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "bucket_ms": df["bucket_ms"].to_numpy(),
            "sum_v": sum_v,
            "delta_sum": delta,
            "rate_per_s": round_half_away(delta / span_s, 9),
        })

    return hash_exchange(rolled, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=delta_kernel, fmt="pandas")


def top_types_per_user(sf_dir: str, k: int = 2):
    """Top-k event types per user by event count (ties broken by type
    name) — nested aggregation + per-group top-k.  In-batch partial counts
    per (user, type) ride ONE user-hash exchange; rank is a vectorized
    sort + cumcount per partition, never a per-group Python call."""
    import ray.data

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type"], P)

    partial = ds.map_batches(_count_partial_arrow(["user_id", "event_type"]),
                             batch_format="pyarrow")

    def topk_kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "event_type", "cnt", "rnk"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        merged = (df.groupby(["user_id", "event_type"], sort=False,
                             observed=True)["cnt"].sum().reset_index())
        merged = merged.sort_values(
            ["user_id", "cnt", "event_type"],
            ascending=[True, False, True], kind="stable")
        merged["rnk"] = merged.groupby("user_id", sort=False).cumcount() + 1
        out = merged[merged["rnk"] <= k].reset_index(drop=True)
        out["cnt"] = out["cnt"].astype(np.int64)
        out["rnk"] = out["rnk"].astype(np.int64)
        return out[cols]

    return hash_exchange(partial, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=topk_kernel, fmt="pandas")


def twa(sf_dir: str, tier: str = "1h"):
    """Time-weighted average per (user, bucket) with LOCF interpolation —
    the TimescaleDB ``time_weight('LOCF')`` shape.  Each consecutive-point
    segment ``[t_i, t_{i+1})`` carries ``v_i``; a bucket's TWA is the
    integral of the carried value over the bucket divided by the covered
    time.  Only buckets containing ≥1 point are emitted (a bucket whose
    only point is the user's final sample and has no carry-in covers zero
    time → NULL).

    Exactness argument for the two-piece decomposition: a segment contains
    no interior points, so every bucket strictly between its endpoints'
    buckets is point-free and never emitted — a segment therefore
    contributes to at most TWO emitted buckets: a tail piece in its start
    bucket and a head piece in its end bucket.  Both sides (this kernel
    and the SQL oracle) enumerate exactly those pieces in integer ms, so
    the sums agree bit-for-bit before the one final division.
    """
    W = TIER_MS[tier]
    ds = _read_points(sf_dir)
    P = _n_parts(sf_dir)

    def twa_kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"user_id": [], "bucket_ms": [], "twa": []})
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        uid = df["user_id"].to_numpy()
        ts = df["ts_ms"].to_numpy()
        v = df["value"].to_numpy()
        bs = (ts // W) * W
        # consecutive-point segments within each user
        has_next = np.empty(len(df), dtype=bool)
        has_next[:-1] = uid[:-1] == uid[1:]
        has_next[-1] = False
        i = np.flatnonzero(has_next)
        nxt = ts[i + 1]
        nxt_bs = (nxt // W) * W
        # piece 1: [t_i, min(t_{i+1}, bucket_end)) in the start bucket
        len1 = np.minimum(nxt, bs[i] + W) - ts[i]
        # piece 2: [bucket_start(t_{i+1}), t_{i+1}) when the segment crosses
        cross = nxt_bs > bs[i]
        j = i[cross]
        len2 = nxt[cross] - nxt_bs[cross]
        contrib = pd.DataFrame({
            "user_id": np.concatenate([uid[i], uid[j]]),
            "bucket_ms": np.concatenate([bs[i], nxt_bs[cross]]),
            "wv": np.concatenate([v[i] * len1, v[j] * len2]),
            "w": np.concatenate([len1, len2]).astype(np.float64),
        })
        sums = (contrib.groupby(["user_id", "bucket_ms"], sort=True)
                [["wv", "w"]].sum().reset_index())
        # emitted groups = every (user, bucket) containing a point
        pts = (pd.DataFrame({"user_id": uid, "bucket_ms": bs})
               .drop_duplicates())
        out = pts.merge(sums, how="left", on=["user_id", "bucket_ms"])
        wv = out["wv"].to_numpy()
        w = out["w"].to_numpy()
        out_twa = np.divide(wv, w, out=np.full(len(out), np.nan),
                            where=w > 0)
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy(),
            "bucket_ms": out["bucket_ms"].to_numpy(),
            "twa": round_half_away(out_twa, 6),
        })

    return hash_exchange(ds, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=twa_kernel, fmt="pandas")


def counter_increase(sf_dir: str, tier: str = "1h"):
    """PromQL-style ``increase`` with counter-reset detection: per user in
    microsecond-timestamp order, each point with a predecessor contributes
    ``v - prev_v`` when the counter moved forward, else ``v`` (the counter
    reset and re-accumulated).  Aggregated per (user, bucket of the
    observing point); a user's first point contributes nothing.  One
    user-hash exchange, vectorized shift/clamp kernel."""
    import pyarrow.compute as pc
    import ray.data

    W = TIER_MS[tier]
    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, EVENT_COLS, P)

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "bucket_ms", "increase", "n_resets"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        uid = df["user_id"].to_numpy()
        v = df["value"].to_numpy()
        has_prev = np.empty(len(df), dtype=bool)
        has_prev[0] = False
        has_prev[1:] = uid[1:] == uid[:-1]
        prev_v = np.empty_like(v)
        prev_v[1:] = v[:-1]
        i = np.flatnonzero(has_prev)
        reset = v[i] < prev_v[i]
        contrib = np.where(reset, v[i], v[i] - prev_v[i])
        bucket = (df["ts_us"].to_numpy()[i] // 1000 // W) * W
        out = (pd.DataFrame({"user_id": uid[i], "bucket_ms": bucket,
                             "c": contrib, "r": reset.astype(np.int64)})
               .groupby(["user_id", "bucket_ms"], sort=True)
               .agg(increase=("c", "sum"), n_resets=("r", "sum"))
               .reset_index())
        out["increase"] = round_half_away(out["increase"].to_numpy(), 6)
        return out[cols]

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def _streaming_gate(sf_dir: str, n_actors: int, order_cols):
    """Shared streaming-ingest gate body: distributed per-router feed
    (``feed_parquet_distributed`` — one reader task per encoder actor, no
    driver-side point loop, VERDICT r3 #8) when the events parquet
    exists; the driver ``iter_batches`` loop remains only as the
    format-autodetect fallback (csv/jsonl inputs).  Seal → decode back on
    the Dataset API."""
    import os

    import ray.data

    from ..state.streaming import StreamingRouter, feed_parquet_distributed

    tune_context()
    router = StreamingRouter(n_actors=n_actors)
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    if os.path.exists(path):
        feed_parquet_distributed(router, path, order_cols=order_cols)
    else:  # pragma: no cover - csv/jsonl fallback seam
        ds = _read_points(sf_dir).sort(
            order_cols if len(order_cols) > 1 else order_cols[0])
        for batch in ds.iter_batches(batch_format="pandas",
                                     batch_size=16384):
            keys = batch["user_id"].to_numpy()
            bits = batch["value"].to_numpy().view(np.uint64)
            router.append_batch(keys.astype(str).tolist(),
                                ["value"] * len(batch),
                                batch["ts_ms"].to_numpy(), bits)
    blocks = pd.DataFrame(router.seal())

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        out = decode_blocks_batch(df, key_cols=["key"])
        return pd.DataFrame({
            "user_id": out["key"].astype(np.int64),
            "ts_ms": out["ts_ms"],
            "value": out["value"],
        })

    if len(blocks) == 0:
        return ray.data.from_pandas(pd.DataFrame(
            {"user_id": pd.Series([], dtype=np.int64),
             "ts_ms": pd.Series([], dtype=np.int64),
             "value": pd.Series([], dtype=np.float64)}))
    return ray.data.from_pandas(blocks).map_batches(
        decode, batch_format="pandas")


def streaming_roundtrip(sf_dir: str, n_actors: int = 4):
    """Stream-batch equivalence gate for the streaming ingest operator:
    events flow through the ``StreamingBlockEncoder`` actor pool in
    event-time arrival order (per-slice ts sort — per-series order is all
    the append watermark requires, and a series lives wholly in one
    reader's hash slice), blocks are sealed and decoded back — the result
    must equal the batch round-trip exactly, so the oracle is the same
    SQL as ``events_roundtrip``.

    The feed is DISTRIBUTED (one reader task per router actor, r4); the
    actor pool itself remains the documented raw-actor last resort (an
    unbounded source with watermarks is the one shape the Dataset API
    can't express).  Decode runs back on the Dataset API."""
    return _streaming_gate(sf_dir, n_actors, ["ts_ms"])


def purchase_window_join(sf_dir: str, window_ms: int = 300_000,
                         match_type: str = "purchase"):
    """Range (interval) join: for each purchase, aggregate the SAME user's
    events in the following ``window_ms`` (strictly after the purchase,
    inclusive at the window end) — the event-correlation shape as-of can't
    express.  Both roles ride ONE user-hash exchange; the per-partition
    kernel is a composite-key (user, ts) double ``searchsorted`` for the
    window bounds plus a cumulative-sum difference for the aggregate — no
    per-purchase Python, no pair materialization."""
    import pyarrow.compute as pc
    import ray.data

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir,
                      ["event_id", "user_id", "ts", "event_type", "value"], P)

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")
    W_us = window_ms * 1000

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "event_id", "pts_ms", "n_follow", "sum_follow"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        uid_codes, _ = pd.factorize(df["user_id"], sort=False)
        ts = df["ts_us"].to_numpy()
        # composite sort key with a dataset-relative stride: users are
        # separated by more than any window, so the double searchsorted
        # never crosses a user boundary.  stride = span + W + 2 keeps the
        # product exact for ~1e5 users/partition/year of span (vs 2^51
        # scaling which overflows at ~4k users/partition).
        rel = ts - ts.min()
        stride = np.int64(rel.max()) + np.int64(W_us) + 2
        key = uid_codes.astype(np.int64) * stride + rel
        csum = np.concatenate(([0.0], np.cumsum(df["value"].to_numpy())))
        is_p = (df["event_type"] == match_type).to_numpy()
        pk = key[is_p]
        lo = np.searchsorted(key, pk, side="right")
        hi = np.searchsorted(key, pk + W_us, side="right")
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy()[is_p],
            "event_id": df["event_id"].to_numpy()[is_p],
            "pts_ms": ts[is_p] // 1000,
            "n_follow": (hi - lo).astype(np.int64),
            "sum_follow": round_half_away(csum[hi] - csum[lo], 6),
        })

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def gapfill(sf_dir: str, tier: str = "1h"):
    """Gap-filled rollup: every bucket between a user's min and max bucket,
    cnt=0 / sum_v=0 / LOCF last_v on filled buckets.  Partition-level:
    users hash into bounded partitions, one vectorized multi-series
    gap-fill kernel per partition."""
    ds = _read_points(sf_dir)
    P = _n_parts(sf_dir)
    rolled = rollup_dataset(ds, key_cols=["user_id"], tier=tier, n_parts=P)

    filled = hash_exchange(
        rolled, key_fn=_user_key_fn(P), n_parts=P,
        kernel=lambda df: gapfill_partition(df, bucket_ms=TIER_MS[tier],
                                            key_cols=["user_id"]),
        fmt="pandas")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sum_v"] = round_half_away(df["sum_v"].to_numpy(), 6)
        return df

    return filled.map_batches(fin, batch_format="pandas").select_columns(
        ["user_id", "bucket_ms", "sum_v", "cnt", "last_v", "filled"])


def sessionize(sf_dir: str, gap_ms: int = 1_800_000,
               slice_ms: int | None = None):
    """Sessionization: split each user's event stream into sessions at
    inactivity gaps > ``gap_ms`` and aggregate per session — the classic
    event-time windowing operator (tumbling windows are the rollup tiers;
    this is the data-driven variant).  Per-user streams are partition-local
    after the hash shuffle; session ids are deterministic
    (user_id, session_seq).

    ``slice_ms`` enables the TIME-SLICED path for users too hot for one
    partition (VERDICT r2 "What's missing" #3): the shuffle key salts the
    user hash with ``ts_ms // slice_ms``, each partition sessionizes its
    (user, slice) streams locally, and a second (tiny — one row per local
    session) user-keyed exchange stitches sessions across slice
    boundaries.  Stitching is EXACT: local sessions are maximal ≤gap runs
    cut at slice boundaries, so two boundary-adjacent locals belong to the
    same global session iff ``next.start − prev.end ≤ gap_ms`` — the merge
    rule below."""
    ds = _read_points(sf_dir)
    P = _n_parts(sf_dir)
    if slice_ms is None:
        return hash_exchange(
            ds, key_fn=_user_key_fn(P), n_parts=P,
            kernel=_sessions_kernel, fmt="pandas",
            kernel_kwargs={"gap_ms": gap_ms, "finalize": True})

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "user_id")
        sl = (tbl.column("ts_ms").to_numpy(zero_copy_only=False)
              // slice_ms).astype(np.uint64)
        return ((h * np.uint64(1_000_003) + sl)
                % np.uint64(P)).astype(np.int64)

    local = hash_exchange(
        ds, key_fn=key_fn, n_parts=P, kernel=_sessions_kernel,
        fmt="pandas",
        kernel_kwargs={"gap_ms": gap_ms, "finalize": False,
                       "slice_ms": slice_ms})

    def stitch(df: pd.DataFrame) -> pd.DataFrame:
        user = df["user_id"].to_numpy()
        st = df["session_start"].to_numpy()
        en = df["session_end"].to_numpy()
        cnt = df["n_events"].to_numpy()
        sv = df["sum_value"].to_numpy()
        order = np.lexsort((st, user))
        user, st, en, cnt, sv = (user[order], st[order], en[order],
                                 cnt[order], sv[order])
        new_user = np.concatenate(([True], user[1:] != user[:-1]))
        # per-user sessions are pairwise disjoint in time (slices are
        # disjoint; in-slice sessions are disjoint), so sorted-by-start ⇒
        # ends are increasing and prev row's end is the merged end
        brk = new_user | np.concatenate(
            ([True], (st[1:] - en[:-1]) > gap_ms))
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(user))
        cum = np.cumsum(brk)
        first_of_user = np.flatnonzero(new_user)
        base = np.repeat(cum[first_of_user],
                         np.diff(np.append(first_of_user, len(user))))
        seq = (cum - base)[starts]  # 0-based within user
        out = pd.DataFrame({
            "user_id": user[starts],
            "session_seq": seq.astype(np.int64),
            "session_start": st[starts],
            "session_end": en[ends - 1],
            # reduceat: each run sums independently (cumsum differences
            # lose precision against the 6-decimal rounding on long
            # partitions)
            "n_events": np.add.reduceat(cnt, starts).astype(np.int64),
            "sum_value": round_half_away(np.add.reduceat(sv, starts), 6),
        })
        out["duration_ms"] = out["session_end"] - out["session_start"]
        return out

    return hash_exchange(local, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=stitch, fmt="pandas")


def _sessions_kernel(df: pd.DataFrame, *, gap_ms: int, finalize: bool,
                     slice_ms: int | None = None) -> pd.DataFrame:
    """Vectorized multi-series sessionization of one partition.  With
    ``slice_ms``, streams additionally split at slice boundaries (local
    sessions, stitched downstream); ``finalize`` controls the output shape
    (final query columns vs stitch-input partials)."""
    user = df["user_id"].to_numpy()
    ts = df["ts_ms"].to_numpy()
    v = df["value"].to_numpy()
    if slice_ms is not None:
        sl = ts // slice_ms
        order = np.lexsort((ts, sl, user))
        user, ts, v, sl = user[order], ts[order], v[order], sl[order]
        new_key = np.concatenate(([True], (user[1:] != user[:-1])
                                  | (sl[1:] != sl[:-1])))
    else:
        order = np.lexsort((ts, user))
        user, ts, v = user[order], ts[order], v[order]
        new_key = np.concatenate(([True], user[1:] != user[:-1]))
    gap_break = np.concatenate(([True], np.diff(ts) > gap_ms))
    new_sess = new_key | gap_break
    starts = np.flatnonzero(new_sess)
    ends = np.append(starts[1:], len(user))
    out = pd.DataFrame({
        "user_id": user[starts],
        "session_start": ts[starts],
        "session_end": ts[ends - 1],
        "n_events": (ends - starts).astype(np.int64),
        "sum_value": np.add.reduceat(v, starts),
    })
    if not finalize:
        return out
    new_user = np.concatenate(([True], user[1:] != user[:-1]))
    cum = np.cumsum(new_sess)
    first_of_user = np.flatnonzero(new_user)
    base = np.repeat(cum[first_of_user],
                     np.diff(np.append(first_of_user, len(user))))
    out.insert(1, "session_seq", (cum - base)[starts].astype(np.int64))
    out["duration_ms"] = out["session_end"] - out["session_start"]
    out["sum_value"] = round_half_away(out["sum_value"].to_numpy(), 6)
    return out


def asof_last_match(sf_dir: str, match_type: str = "purchase",
                    slice_ms: int | None = None):
    """AS-OF JOIN: attach to every event the timestamp and value of the
    same user's most recent ``match_type`` event at-or-before it (−1
    sentinels when none — nullable ints decay to float64 in pandas and the
    driver hash is dtype-sensitive).

    Ray-Data-first shape for an operator the Dataset API lacks: hash whole
    users into bounded partitions (ONE shuffle), then a vectorized
    partition kernel — sort by (user, ts_us), ``maximum.accumulate`` over
    the match positions, same-user guard.  The comparison runs at the
    input's MICROSECOND granularity, matching the DuckDB ``ASOF LEFT
    JOIN`` oracle exactly (ms was a latent tie hazard, ADVICE r2); at
    equal (user, ts_us) the match sorts first so a same-instant purchase
    is visible, as ``e.ts >= p.ts`` includes it.

    ``slice_ms`` enables the TIME-SLICED path for users too hot for one
    partition: the shuffle key salts the user hash with the time slice,
    the kernel resolves matches inside each (user, slice), and unmatched
    events take a carry-in computed from per-(user, slice) purchase
    summaries (tiny user-keyed exchange), joined back co-partitioned —
    boundary stitching in two small passes, no per-user concentration."""
    import pyarrow.compute as pc
    import ray.data

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir,
                      ["event_id", "user_id", "event_type", "ts", "value"], P)

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")  # timestamp[us] -> int64 us
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")

    def local_asof(df: pd.DataFrame, *, sliced: bool) -> pd.DataFrame:
        n = len(df)
        user = df["user_id"].to_numpy()
        us = df["ts_us"].to_numpy()
        eid = df["event_id"].to_numpy()
        etype = df["event_type"].to_numpy()
        is_match = etype == match_type
        # matches first at equal (user, ts_us): np.lexsort is ascending,
        # so sort on (user[, slice], ts_us, NOT-match, event_id)
        if sliced:
            sl = us // (slice_ms * 1000)
            order = np.lexsort((eid, ~is_match, us, sl, user))
        else:
            sl = None
            order = np.lexsort((eid, ~is_match, us, user))
        user, us, eid = user[order], us[order], eid[order]
        is_match = is_match[order]
        value = df["value"].to_numpy()[order]
        pos = np.where(is_match, np.arange(n), -1)
        src = np.maximum.accumulate(pos) if n else pos
        ok = src >= 0
        safe = np.where(ok, src, 0)
        ok &= user[safe] == user  # never cross a user boundary
        if sliced:
            sl = sl[order]
            ok &= sl[safe] == sl  # ...or a slice boundary (carry-in later)
        out = pd.DataFrame({
            "event_id": eid,
            "user_id": user,
            "ts_ms": us // 1000,
            "last_match_ts": np.where(ok, us[safe] // 1000,
                                      -1).astype(np.int64),
            "last_match_value": np.where(ok, value[safe], -1.0),
        })
        if sliced:
            out["slice_idx"] = sl.astype(np.int64)
        return out

    if slice_ms is None:
        return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=local_asof, fmt="pandas",
                             kernel_kwargs={"sliced": False})

    def sliced_key(cols_slice_from_us=True):
        def key_fn(tbl):
            h = arrow_col_hash(tbl, "user_id")
            if cols_slice_from_us:
                sl = (tbl.column("ts_us").to_numpy(zero_copy_only=False)
                      // (slice_ms * 1000)).astype(np.uint64)
            else:
                sl = tbl.column("slice_idx").to_numpy(
                    zero_copy_only=False).astype(np.uint64)
            return ((h * np.uint64(1_000_003) + sl)
                    % np.uint64(P)).astype(np.int64)
        return key_fn

    local = hash_exchange(pts, key_fn=sliced_key(True), n_parts=P,
                          kernel=local_asof, fmt="pandas",
                          kernel_kwargs={"sliced": True})

    # per-(user, slice) purchase summaries: latest purchase in the slice
    def summarize(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == match_type]
        if not len(df):
            return pd.DataFrame({
                "user_id": np.array([], dtype=df["user_id"].dtype),
                "slice_idx": np.array([], dtype=np.int64),
                "p_ts_ms": np.array([], dtype=np.int64),
                "p_value": np.array([], dtype=np.float64)})
        user = df["user_id"].to_numpy()
        us = df["ts_us"].to_numpy()
        eid = df["event_id"].to_numpy()
        v = df["value"].to_numpy()
        sl = us // (slice_ms * 1000)
        order = np.lexsort((eid, us, sl, user))
        user, us, v, sl = user[order], us[order], v[order], sl[order]
        last = np.concatenate(((user[1:] != user[:-1])
                               | (sl[1:] != sl[:-1]), [True]))
        return pd.DataFrame({"user_id": user[last],
                             "slice_idx": sl[last].astype(np.int64),
                             "p_ts_ms": (us[last] // 1000).astype(np.int64),
                             "p_value": v[last]})

    summaries = hash_exchange(pts, key_fn=sliced_key(True), n_parts=P,
                              kernel=summarize, fmt="pandas")

    # distinct (user, slice) pairs that still need a carry-in
    def needs(df: pd.DataFrame) -> pd.DataFrame:
        d = df[df["last_match_ts"] == -1]
        return d[["user_id", "slice_idx"]].drop_duplicates(
            ignore_index=True)

    need_ds = local.map_batches(needs, batch_format="pandas")

    # user-keyed stitch: carry-in per needed (user, slice) = the latest
    # summary from any EARLIER slice (prefix scan over tiny summary rows)
    def carry_kernel(need_df: pd.DataFrame,
                     summ_df: pd.DataFrame) -> pd.DataFrame:
        need_df = need_df.drop_duplicates(["user_id", "slice_idx"])
        if not len(need_df):
            return pd.DataFrame({
                "user_id": need_df["user_id"],
                "slice_idx": np.array([], dtype=np.int64),
                "c_ts_ms": np.array([], dtype=np.int64),
                "c_value": np.array([], dtype=np.float64)})
        # merge-sort needs and summaries per user by slice; a need at
        # slice s takes the running latest summary with slice < s
        nu = need_df["user_id"].to_numpy()
        ns = need_df["slice_idx"].to_numpy()
        su = summ_df["user_id"].to_numpy()
        ss = summ_df["slice_idx"].to_numpy()
        st = summ_df["p_ts_ms"].to_numpy()
        sv = summ_df["p_value"].to_numpy()
        # summaries must be in (user, slice) order BEFORE payload indices
        # are assigned: the accumulate below picks the max INDEX, which is
        # "latest slice" only if indices ascend with slice
        sorder = np.lexsort((ss, su))
        su, ss, st, sv = su[sorder], ss[sorder], st[sorder], sv[sorder]
        # combined stream: summaries sort BEFORE needs at the same slice?
        # No: a need at slice s must NOT see a summary at slice s (same
        # slice is already resolved locally) → needs first at equal slice.
        u = np.concatenate([su, nu])
        s = np.concatenate([ss, ns])
        kind = np.concatenate([np.ones(len(su), dtype=np.int8),
                               np.zeros(len(nu), dtype=np.int8)])
        order = np.lexsort((kind, s, u))
        u, s, kind = u[order], s[order], kind[order]
        payload = np.concatenate([np.arange(len(su)),
                                  np.full(len(nu), -1)])[order]
        pos = np.where(kind == 1, payload, -1)
        src = np.maximum.accumulate(pos) if len(u) else pos
        ok = src >= 0
        safe = np.where(ok, src, 0)
        # src holds SUMMARY-array indices — guard with su, not the
        # combined stream (no summaries ⇒ ok is already all-False)
        if len(su):
            ok &= su[safe] == u
        # ok means: a prior summary row of the same user exists at an
        # earlier slice (kind ordering excludes same-slice summaries)
        sel = kind == 0
        return pd.DataFrame({
            "user_id": u[sel],
            "slice_idx": s[sel].astype(np.int64),
            "c_ts_ms": np.where(ok[sel], st[safe[sel]], -1).astype(np.int64),
            "c_value": np.where(ok[sel], sv[safe[sel]], -1.0),
        })

    carry = hash_exchange_multi(
        [(need_ds, lambda t: (arrow_col_hash(t, "user_id")
                              % np.uint64(P)).astype(np.int64)),
         (summaries, lambda t: (arrow_col_hash(t, "user_id")
                                % np.uint64(P)).astype(np.int64))],
        n_parts=P, kernel=carry_kernel, fmt="pandas")

    # co-partitioned fill: rows and carries keyed by (user, slice)
    def fill_kernel(rows: pd.DataFrame, car: pd.DataFrame) -> pd.DataFrame:
        out = rows.drop(columns=["slice_idx"])
        unm = rows["last_match_ts"].to_numpy() == -1
        if unm.any() and len(car):
            key_r = pd.MultiIndex.from_arrays(
                [rows["user_id"], rows["slice_idx"]])
            lut = car.set_index(["user_id", "slice_idx"])
            m = lut.reindex(key_r[unm])
            ts = m["c_ts_ms"].to_numpy()
            vv = m["c_value"].to_numpy()
            got = ~np.isnan(ts.astype(np.float64))
            lm = out["last_match_ts"].to_numpy().copy()
            lv = out["last_match_value"].to_numpy().copy()
            idx = np.flatnonzero(unm)[got]
            lm[idx] = ts[got].astype(np.int64)
            lv[idx] = vv[got]
            out["last_match_ts"] = lm
            out["last_match_value"] = lv
        return out

    return hash_exchange_multi(
        [(local, sliced_key(False)), (carry, sliced_key(False))],
        n_parts=P, kernel=fill_kernel, fmt="pandas")


# Heavy-key auto-route (VERDICT r3 #9 / CLAUDE r4 #7): the exact quantile
# kernel holds one partition's RAW values in one reduce task — its
# documented partitioning assumption.  When the estimated rows-per-
# partition exceeds this bound, the query auto-flips to its bounded-state
# KLL sketch sibling (exact below capacity; compaction rank error gated in
# tests/test_sketch.py).  5M rows ≈ 120 MB of (user, ts, value) per reduce
# task — comfortable worker-heap territory with headroom for skew.
HEAVY_PARTITION_ROWS = 5_000_000


def _est_rows(sf_dir: str) -> int:
    """Row-count estimate from parquet metadata (no scan); 0 when the
    input is csv/jsonl (the exact route then keeps its assumption)."""
    import pyarrow.parquet as pq

    try:
        return pq.ParquetFile(
            f"{sf_dir.rstrip('/')}/events.parquet").metadata.num_rows
    except Exception:
        return 0


def user_quantiles(sf_dir: str, qs=(0.5, 0.95, 0.99),
                   heavy_partition_rows: int | None = None):
    """Exact per-user value quantiles (p50/p95/p99) — the windowed
    percentile operator monitoring stacks expect.  Partition-level
    vectorized: sort (user, value) once per partition, then every user's
    quantiles come from index arithmetic over run bounds (numpy's switched
    lerp replicated exactly → bit-matches DuckDB ``quantile_cont`` after
    6-decimal rounding).

    AUTO-ROUTES to :func:`user_quantiles_sketch` when the estimated
    rows-per-partition exceeds ``HEAVY_PARTITION_ROWS`` — beyond that the
    exact kernel's one-partition-per-task assumption breaks, and the KLL
    sibling's exchange carries ≤ k·log(n/k) weighted rows per (user,
    block) instead of every raw value."""
    from ..stages.rollup import quantiles_by_key

    limit = (HEAVY_PARTITION_ROWS if heavy_partition_rows is None
             else heavy_partition_rows)
    if _est_rows(sf_dir) > limit * _n_parts(sf_dir):
        return user_quantiles_sketch(sf_dir, qs=qs)
    ds = _read_points(sf_dir)
    return hash_exchange(
        ds, key_fn=_user_key_fn(_n_parts(sf_dir)),
        n_parts=_n_parts(sf_dir),
        kernel=lambda df: quantiles_by_key(df, key_col="user_id", qs=qs),
        fmt="pandas")


def event_gaps(sf_dir: str):
    """Per-user inter-event gap derivation (ts - lag(ts)); computed
    PARTITION-level: users are hashed into bounded partitions and one
    vectorized kernel derives every user's gaps (sort by (user, ts), diff,
    NaN at user boundaries) — no per-user Python call (a per-group UDF is
    ms × users at scale, VERDICT r1 "What's wrong" #8)."""
    ds = _read_points(sf_dir)

    def gaps_partition(df: pd.DataFrame) -> pd.DataFrame:
        user = df["user_id"].to_numpy()
        order = np.lexsort((df["ts_ms"].to_numpy(), user))
        user = user[order]
        ts = df["ts_ms"].to_numpy()[order]
        gap = np.empty(len(ts), dtype=np.float64)
        if len(ts):
            gap[0] = np.nan
            gap[1:] = np.diff(ts).astype(np.float64)
            first = np.concatenate(([True], user[1:] != user[:-1]))
            gap[first] = np.nan
        return pd.DataFrame({"user_id": user, "ts_ms": ts, "gap_ms": gap})

    return hash_exchange(ds, key_fn=_user_key_fn(_n_parts(sf_dir)),
                         n_parts=_n_parts(sf_dir),
                         kernel=gaps_partition, fmt="pandas")


def burstiness(sf_dir: str):
    """Goh–Barabási burstiness index per user: B = (σ−μ)/(σ+μ) over the
    user's inter-event gaps (B→−1 periodic, 0 Poisson, →1 bursty) — the
    behavioral-features aggregate built on the gap derivation.  One
    user-hash exchange; the gap multiset is tie-order invariant (gaps of
    a SORTED sequence depend only on the sorted values), so the lag-window
    oracle matches exactly.  Centered moments (the user_stats discipline);
    users with fewer than 2 gaps or σ+μ = 0 drop like the SQL guards."""
    P = _n_parts(sf_dir)
    ds = _read_points(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_gaps", "mean_gap_ms", "std_gap_ms",
                "burstiness"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        user = df["user_id"].to_numpy()
        order = np.lexsort((df["ts_ms"].to_numpy(), user))
        user = user[order]
        ts = df["ts_ms"].to_numpy()[order]
        gap = np.diff(ts).astype(np.float64)
        same = user[1:] == user[:-1]
        gap, guser = gap[same], user[1:][same]
        if not len(gap):
            return pd.DataFrame({c: [] for c in cols})
        codes, users = pd.factorize(guser, sort=False)
        n = np.bincount(codes)
        mu = np.bincount(codes, weights=gap) / n
        dv = gap - mu[codes]
        with np.errstate(invalid="ignore", divide="ignore"):
            sd = np.sqrt(np.bincount(codes, weights=dv * dv)
                         / np.maximum(n - 1, 1))
            b = (sd - mu) / (sd + mu)
        keep = (n >= 2) & ((sd + mu) > 0)
        return pd.DataFrame({
            "user_id": users[keep],
            "n_gaps": n[keep].astype(np.int64),
            # 3 decimals: at ms-gap magnitudes (~1e7) a 6-decimal round
            # sits at 14 significant digits, inside f64 summation-order
            # noise between engine and oracle — measured one boundary flip
            "mean_gap_ms": round_half_away(mu[keep], 3),
            "std_gap_ms": round_half_away(sd[keep], 3),
            "burstiness": round_half_away(b[keep], 6),
        })

    return hash_exchange(ds, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def sliding_window(sf_dir: str, window_ms: int = HOUR_MS):
    """Sliding (RANGE) window aggregate: for EVERY event, the count/sum of
    the same user's events in the trailing ``[ts − W, ts]`` interval —
    SQL ``RANGE BETWEEN W PRECEDING AND CURRENT ROW`` semantics, so
    equal-timestamp peers share one window.  Completes the window-type
    family (tumbling/hopping = ``rollup`` / ``rollup_hopping``, session =
    ``sessionize``).  One user-hash exchange; the per-partition kernel is a
    composite-key double ``searchsorted`` against a prefix sum (same
    dataset-relative-stride construction as :func:`purchase_window_join`)
    — no per-event Python, no self-join pair materialization."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"], P)

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")
    W_us = window_ms * 1000

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "user_id", "ts_ms", "w_cnt", "w_sum"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        uid_codes, _ = pd.factorize(df["user_id"], sort=False)
        ts = df["ts_us"].to_numpy()
        rel = ts - ts.min()
        # users separated by more than any window → the left bound can
        # never cross a user boundary (see purchase_window_join)
        stride = np.int64(rel.max()) + np.int64(W_us) + 2
        key = uid_codes.astype(np.int64) * stride + rel
        csum = np.concatenate(([0.0], np.cumsum(df["value"].to_numpy())))
        lo = np.searchsorted(key, key - W_us, side="left")
        hi = np.searchsorted(key, key, side="right")
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "user_id": df["user_id"].to_numpy(),
            "ts_ms": ts // 1000,
            "w_cnt": (hi - lo).astype(np.int64),
            "w_sum": round_half_away(csum[hi] - csum[lo], 6),
        })

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def value_histogram(sf_dir: str, bin_width: float = 10.0):
    """Fixed-width value histogram per event type.  Partial (type, bin)
    cells combine INSIDE each map batch (pandas hash groupby), so the
    exchange carries ~types × bins rows per input block, never raw events
    (pre-aggregate-before-shuffle, SURVEY §4)."""
    tune_context()
    P = 8  # types × bins is tiny; a handful of reduce tasks suffice
    ds = _read_events(sf_dir, ["event_type", "value"], _n_parts(sf_dir))

    def partial(tbl):
        # Arrow-native partial (VERDICT r3 #3): no pandas object-dtype
        # round-trip for the string key; group_by is a vectorized C kernel
        import pyarrow as pa

        v = tbl.column("value").to_numpy(zero_copy_only=False)
        bins = np.floor(v / bin_width).astype(np.int64)
        t = tbl.append_column("bin", pa.array(bins))
        out = t.group_by(["event_type", "bin"]).aggregate(
            [("value", "count"), ("value", "sum")])
        return pa.table({"event_type": out["event_type"],
                         "bin": out["bin"],
                         "cnt": out["value_count"],
                         "sum_v": out["value_sum"]})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        h = h * np.uint64(1_000_003) + tbl.column("bin").to_numpy().astype(
            np.uint64)
        return (h % np.uint64(P)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["event_type", "bin"], as_index=False, sort=False)
               .agg(cnt=("cnt", "sum"), sum_v=("sum_v", "sum")))
        out["cnt"] = out["cnt"].astype(np.int64)
        out["sum_v"] = round_half_away(out["sum_v"].to_numpy(), 6)
        return out

    return hash_exchange(partials, key_fn=key_fn, n_parts=P, kernel=merge,
                         fmt="pandas")


def user_stats(sf_dir: str):
    """Per-user statistical aggregates: count, mean, sample stddev and the
    value↔time Pearson correlation.  Moments are CENTERED per partition —
    raw (Σt², Σv·t) sums over epoch-ms timestamps lose ~8 digits to
    cancellation; centering keeps ~1e-12 agreement with DuckDB's stable
    aggregates, comfortably inside the 6-decimal round.  (Correlation is
    shift-invariant, so centering at the partition's own per-user means is
    exact.)"""
    P = _n_parts(sf_dir)
    pts = _read_points(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "cnt", "mean_v", "std_v", "corr_ts"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        codes, users = pd.factorize(df["user_id"], sort=False)
        v = df["value"].to_numpy(dtype=np.float64)
        t = df["ts_ms"].to_numpy(dtype=np.float64)
        n = np.bincount(codes)
        mv = np.bincount(codes, weights=v) / n
        mt = np.bincount(codes, weights=t) / n
        dv = v - mv[codes]
        dt = t - mt[codes]
        m2v = np.bincount(codes, weights=dv * dv)
        m2t = np.bincount(codes, weights=dt * dt)
        cvt = np.bincount(codes, weights=dv * dt)
        with np.errstate(invalid="ignore", divide="ignore"):
            std = np.where(n > 1, np.sqrt(m2v / np.maximum(n - 1, 1)), np.nan)
            corr = np.where((m2v > 0) & (m2t > 0),
                            cvt / np.sqrt(m2v * m2t), np.nan)
        return pd.DataFrame({
            "user_id": users, "cnt": n.astype(np.int64),
            "mean_v": round_half_away(mv, 6),
            "std_v": round_half_away(std, 6),
            "corr_ts": round_half_away(corr, 6),
        })

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def seasonal_anomalies(sf_dir: str, z_thresh: float = 3.0):
    """Seasonal-baseline anomaly detection: events whose value deviates
    more than ``z_thresh`` sample standard deviations from the
    (event_type, hour-of-day) diurnal profile — a value normal at 14:00
    can be anomalous at 03:00.  Two passes, no shuffle of raw rows: the
    baseline is ≤ types×24 cells, folded from per-batch Arrow partials on
    the driver (the SQ8 min/max pattern) and broadcast into a map-only
    flag pass.  Raw (Σv, Σv²) moments are safe here: values are O(100)
    with μ≈σ, so the (Σv² − (Σv)²/n) subtraction loses ~1 digit — the
    catastrophic-cancellation warning applies to epoch-ms magnitudes,
    not these."""
    import pyarrow as pa
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "ts", "value"], P)

    def to_ms(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"), 1000)
        return batch.drop_columns(["ts"]).append_column("ts_ms", ts_ms)

    pts = ds.map_batches(to_ms, batch_format="pyarrow")

    def partial(t: pa.Table) -> pa.Table:
        # pyarrow.compute has no mod kernel — numpy on the zero-copy view
        hr = pa.array((t.column("ts_ms").to_numpy() // 3_600_000) % 24)
        v = t.column("value")
        work = pa.table({"event_type": t.column("event_type"), "hr": hr,
                         "v": v, "v2": pc.multiply(v, v)})
        agg = work.group_by(["event_type", "hr"],
                            use_threads=False).aggregate(
            [("v", "sum"), ("v2", "sum"), ("v", "count")])
        ren = {"v_sum": "s", "v2_sum": "ss", "v_count": "n"}
        return agg.rename_columns(
            [ren.get(c, c) for c in agg.schema.names])

    cells = (pts.map_batches(partial, batch_format="pyarrow")
             .to_pandas())  # bounded: ≤ types×24 rows per block
    g = cells.groupby(["event_type", "hr"], sort=False).agg(
        s=("s", "sum"), ss=("ss", "sum"), n=("n", "sum"))
    n = g["n"].to_numpy().astype(np.float64)
    mu = g["s"].to_numpy() / n
    with np.errstate(invalid="ignore", divide="ignore"):
        sd = np.sqrt((g["ss"].to_numpy() - g["s"].to_numpy() * mu)
                     / np.maximum(n - 1, 1))
    base = {k: (m, d, int(c)) for k, m, d, c in
            zip(g.index, mu, sd, n)}

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "ts_ms", "event_type", "value", "zscore"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        hr = (df["ts_ms"].to_numpy() // 3_600_000) % 24
        et = df["event_type"].to_numpy()
        # baseline lookup once per UNIQUE (type, hour) cell (≤ types×24)
        tcodes, ttypes = pd.factorize(et, sort=False)
        cell = tcodes.astype(np.int64) * 24 + hr
        ucell, ccodes = np.unique(cell, return_inverse=True)
        stats = np.array([base.get((ttypes[int(c // 24)], int(c % 24)),
                                   (0.0, 0.0, 0)) for c in ucell])
        mu_r, sd_r, n_r = (stats[ccodes, 0], stats[ccodes, 1],
                           stats[ccodes, 2])
        v = df["value"].to_numpy(dtype=np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            z = (v - mu_r) / sd_r
        keep = (n_r > 1) & (sd_r > 0) & (np.abs(z) > z_thresh)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy()[keep],
            "ts_ms": df["ts_ms"].to_numpy()[keep],
            "event_type": et[keep],
            "value": v[keep],
            "zscore": round_half_away(z[keep], 6),
        })

    return pts.map_batches(flag, batch_format="pandas")


def seasonal_decompose(sf_dir: str, half_window: int = 12):
    """STL-lite additive decomposition of each user's hourly series, in
    EXACT integer arithmetic: ``trend`` = centered moving average over 25
    consecutive hourly buckets (interior rows only — STL's own edge
    discipline), ``seasonal`` = per (user, hour-of-day) mean of the
    detrended series, ``resid`` = v − trend − seasonal.

    Value-hash discipline: ``value`` carries exactly 2 decimals, so mean
    columns land EXACTLY on round-decimal midpoints whenever the divisor
    has enough factors of 2 (measured: 63/90/80 rounding flips vs DuckDB
    at 4 decimals) — no rounding width is robust.  So the query emits the
    decomposition as exact int64-scaled columns instead: with ``c`` the
    bucket cents, ``T`` the 25-bucket window sum, ``D = 25·c − T``
    (detrended × 2500), ``S = Σ_cell D`` and ``N`` the cell size, the
    real-valued components are trend = T/2500, detrended = D/2500,
    seasonal = S/(2500·N), resid = (N·D − S)/(2500·N).  Every column is
    an integer both engines compute exactly.

    Scale shape: per-batch Arrow partials collapse raw events to
    (user, bucket) int64 cent sums BEFORE the one user-hash exchange; the
    kernel's window sums are two cumsum gathers, the cell sums one
    bincount — no per-series Python."""
    import pyarrow as pa

    tune_context()
    P = _n_parts(sf_dir)
    pts = _read_points(sf_dir, P)
    hour = 3_600_000
    w = 2 * half_window + 1

    def partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        b = pc.multiply(pc.divide(t.column("ts_ms"), hour), hour)
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = pa.array((np.sign(v) * np.floor(np.abs(v) * 100 + 0.5))
                         .astype(np.int64))
        work = pa.table({"user_id": t.column("user_id"), "bucket_ms": b,
                         "c": cents})
        agg = work.group_by(["user_id", "bucket_ms"],
                            use_threads=False).aggregate([("c", "sum")])
        return agg.rename_columns(
            ["c" if c == "c_sum" else c for c in agg.schema.names])

    partials = pts.map_batches(partial, batch_format="pyarrow")

    def decomp(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "bucket_ms", "v_cents", "trend_sum_cents",
                "detr_num", "hod", "cell_n", "seasonal_num", "resid_num"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        g = (df.groupby(["user_id", "bucket_ms"], sort=True, as_index=False)
             ["c"].sum())
        u = g["user_id"].to_numpy()
        b = g["bucket_ms"].to_numpy()
        c = g["c"].to_numpy().astype(np.int64)
        n = len(g)
        codes, _ = pd.factorize(g["user_id"], sort=False)  # sorted → runs
        change = np.concatenate(([True], codes[1:] != codes[:-1]))
        starts = np.flatnonzero(change)
        counts = np.diff(np.append(starts, n))
        idx = np.arange(n)
        s0 = np.repeat(starts, counts)
        s1 = s0 + np.repeat(counts, counts)
        full = (idx - half_window >= s0) & (idx + half_window + 1 <= s1)
        csum = np.concatenate(([0], np.cumsum(c)))
        fi = np.flatnonzero(full)
        t_sum = csum[fi + half_window + 1] - csum[fi - half_window]
        u, b, c, codes = u[fi], b[fi], c[fi], codes[fi]
        d = w * c - t_sum
        hod = (b // hour) % 24
        cell = codes.astype(np.int64) * 24 + hod
        ucell, cinv = np.unique(cell, return_inverse=True)
        cell_n = np.bincount(cinv).astype(np.int64)[cinv]
        s_num = np.bincount(cinv, weights=d).astype(np.int64)[cinv]
        return pd.DataFrame({
            "user_id": u, "bucket_ms": b, "v_cents": c,
            "trend_sum_cents": t_sum, "detr_num": d,
            "hod": hod.astype(np.int64), "cell_n": cell_n,
            "seasonal_num": s_num,
            "resid_num": cell_n * d - s_num})[cols]

    return hash_exchange(partials, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=decomp, fmt="pandas")


def winsorize(sf_dir: str, lo_pct: int = 5, hi_pct: int = 95):
    """Per-user winsorized summary — the robust-statistics cleaning step
    (clip each user's values at their own P5/P95 before aggregating).
    Bounds are EXACT order statistics on the integer-cent scale: with a
    user's n values sorted ascending (0-indexed), lo = value at rank
    ``(n−1)·5 // 100`` and hi = value at rank ``ceil((n−1)·95 / 100)`` —
    pure selection + integer sums, so every output column is hash-exact
    (no float arithmetic anywhere; the seasonal-decompose discipline).

    Scale shape: one user-hash exchange of (user, cents) rows; the kernel
    is one sort + rank gathers + clip-sum per partition, vectorized over
    all its users at once."""
    import pyarrow as pa

    tune_context()
    P = _n_parts(sf_dir)
    pts = _read_points(sf_dir, P)

    def to_cents(t: pa.Table) -> pa.Table:
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = pa.array((np.sign(v) * np.floor(np.abs(v) * 100 + 0.5))
                         .astype(np.int64))
        return pa.table({"user_id": t.column("user_id"), "c": cents})

    rows = pts.map_batches(to_cents, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "lo_cents", "hi_cents", "n_clip_lo",
                "n_clip_hi", "wsum_cents"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        u = df["user_id"].to_numpy()
        c = df["c"].to_numpy().astype(np.int64)
        order = np.lexsort((c, u))
        u, c = u[order], c[order]
        change = np.concatenate(([True], u[1:] != u[:-1]))
        starts = np.flatnonzero(change)
        n = np.diff(np.append(starts, len(u))).astype(np.int64)
        k_lo = (n - 1) * lo_pct // 100
        # ceil with positive operands only — DuckDB's // truncates
        # toward zero on negatives while numpy floors (measured)
        k_hi = ((n - 1) * hi_pct + 99) // 100
        lo = c[starts + k_lo]
        hi = c[starts + k_hi]
        grp = np.cumsum(change) - 1
        lo_r, hi_r = lo[grp], hi[grp]
        clipped = np.minimum(np.maximum(c, lo_r), hi_r)
        csum = np.concatenate(([0], np.cumsum(clipped)))
        bounds = np.append(starts, len(u))
        return pd.DataFrame({
            "user_id": u[starts], "n": n,
            "lo_cents": lo, "hi_cents": hi,
            "n_clip_lo": np.bincount(grp, weights=c < lo_r)
            .astype(np.int64),
            "n_clip_hi": np.bincount(grp, weights=c > hi_r)
            .astype(np.int64),
            "wsum_cents": csum[bounds[1:]] - csum[starts]})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def ewma_last(sf_dir: str, alpha: float = 0.2):
    """Final EWMA per user — the recursive ``y ← (1−α)·y + α·x`` fold over
    event-time order (seeded with the first value).  pandas' grouped
    ``ewm(adjust=False)`` is a Cython kernel evaluating exactly
    ``old_wt·y + new_wt·x`` with ``old_wt + new_wt = 1`` — measured
    bit-identical to an explicit fold AND to DuckDB's ``list_reduce``
    lambda, so the 6-decimal round is a formality."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "value"], P)

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "ewma"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        ew = (df.groupby("user_id", sort=False)["value"]
              .ewm(alpha=alpha, adjust=False).mean().to_numpy())
        uid = df["user_id"].to_numpy()
        last = np.concatenate((uid[1:] != uid[:-1], [True]))
        return pd.DataFrame({"user_id": uid[last],
                             "ewma": round_half_away(ew[last], 6)})

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def gapfill_interp(sf_dir: str, tier: str = "1h"):
    """Gap-filled rollup with LINEAR interpolation (vs :func:`gapfill`'s
    LOCF): a filled bucket takes the straight line between the nearest
    present buckets on each side (both always exist — each user's grid is
    bounded by its own min/max present bucket)."""
    from ..stages.rollup import interp_partition

    ds = _read_points(sf_dir)
    P = _n_parts(sf_dir)
    # interp only needs sum_v — slim the exchange to 3 columns
    rolled = rollup_dataset(ds, key_cols=["user_id"], tier=tier,
                            n_parts=P).select_columns(
                                ["user_id", "bucket_ms", "sum_v"])

    filled = hash_exchange(
        rolled, key_fn=_user_key_fn(P), n_parts=P,
        kernel=lambda df: interp_partition(df, bucket_ms=TIER_MS[tier],
                                           key_cols=["user_id"]),
        fmt="pandas")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["v"] = round_half_away(df["v"].to_numpy(), 6)
        return df

    return filled.map_batches(fin, batch_format="pandas").select_columns(
        ["user_id", "bucket_ms", "v", "filled"])


def signup_purchase_funnel(sf_dir: str, window_ms: int = HOUR_MS):
    """Funnel step (sequential event pattern): for each signup, did the
    SAME user purchase within the following window (strictly after,
    inclusive end), and when first — the conversion shape of event
    analytics.  One user-hash exchange; the per-partition kernel finds
    each signup's first following purchase with a composite-key
    ``searchsorted`` against the purchase stream (no per-signup Python)."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "event_type"], P)

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")
    W_us = window_ms * 1000

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "user_id", "ts_ms", "first_purchase_ms",
                "converted"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        uid_codes, _ = pd.factorize(df["user_id"], sort=False)
        ts = df["ts_us"].to_numpy()
        rel = ts - ts.min()
        stride = np.int64(rel.max()) + np.int64(W_us) + 2
        key = uid_codes.astype(np.int64) * stride + rel
        is_p = (df["event_type"] == "purchase").to_numpy()
        is_s = (df["event_type"] == "signup").to_numpy()
        pkey = key[is_p]
        pts_us = ts[is_p]
        # first purchase strictly after the signup; same-user guaranteed
        # within [key, key+W] by the stride construction
        pos = np.searchsorted(pkey, key[is_s], side="right")
        hit = np.zeros(is_s.sum(), dtype=bool)
        first = np.full(is_s.sum(), -1, dtype=np.int64)
        valid = pos < len(pkey)
        inwin = np.zeros_like(hit)
        inwin[valid] = pkey[pos[valid]] <= key[is_s][valid] + W_us
        hit = valid & inwin
        first[hit] = pts_us[pos[hit]] // 1000
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy()[is_s],
            "user_id": df["user_id"].to_numpy()[is_s],
            "ts_ms": ts[is_s] // 1000,
            "first_purchase_ms": first,
            "converted": hit,
        })

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def daily_distinct_types(sf_dir: str):
    """Per-(user, day) distinct-count aggregate: in-batch triple dedup
    (the combiner — at most types×users×days rows leave a block), one
    (user, day)-hash exchange, vectorized per-partition dedup +
    ``nunique``."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "event_type"], P)

    def to_day(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"), 1000)
        day_ms = pc.multiply(pc.divide(ts_ms, DAY_MS), DAY_MS)
        return batch.drop_columns(["ts"]).append_column("day_ms", day_ms)

    def uniq(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["user_id", "day_ms", "event_type"],
                                  ignore_index=True)

    triples = ds.map_batches(to_day, batch_format="pyarrow").map_batches(
        uniq, batch_format="pandas")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "user_id")
        h = (h * np.uint64(1_000_003)
             + tbl.column("day_ms").to_numpy().astype(np.uint64))
        return (h % np.uint64(P)).astype(np.int64)

    def count_distinct(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day_ms", "event_type"])
        out = (df.groupby(["user_id", "day_ms"], sort=False)["event_type"]
               .nunique().rename("n_types").reset_index())
        out["n_types"] = out["n_types"].astype(np.int64)
        return out

    return hash_exchange(triples, key_fn=key_fn, n_parts=P,
                         kernel=count_distinct, fmt="pandas")


def running_total(sf_dir: str):
    """Cumulative running total per user in event-time order (ROWS
    UNBOUNDED PRECEDING window): one user-hash exchange, per-partition
    sort + segmented cumsum (subtract each user's pre-segment offset) —
    the classic prefix-scan window function, fully vectorized."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"], P)

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "user_id", "ts_ms", "running_sum"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        uid = df["user_id"].to_numpy()
        v = df["value"].to_numpy()
        csum = np.cumsum(v)
        first = np.concatenate(([True], uid[1:] != uid[:-1]))
        starts = np.flatnonzero(first)
        # offset = cumulative sum BEFORE each user's segment
        seg_off = np.concatenate(([0.0], csum[starts[1:] - 1]))
        run = csum - np.repeat(seg_off, np.diff(np.append(starts, len(uid))))
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "user_id": uid,
            "ts_ms": df["ts_us"].to_numpy() // 1000,
            "running_sum": round_half_away(run, 6),
        })

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def value_percent_rank(sf_dir: str):
    """Rank-family window function: SQL ``rank()`` (ties share the rank of
    their first equal value, gaps after) and ``percent_rank()`` =
    (rank−1)/(n−1) per user.  One user-hash exchange; per partition a
    single (user, value) lexsort gives every row's rank as
    first-equal-run index − segment start + 1 — no per-user Python."""
    tune_context()
    P = _n_parts(sf_dir)
    pts = _read_points(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "ts_ms", "value", "rnk", "dense_rnk",
                "pct_rank"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        codes, _ = pd.factorize(df["user_id"], sort=False)
        val = df["value"].to_numpy()
        order = np.lexsort((val, codes))
        c, v = codes[order], val[order]
        n = len(c)
        idx = np.arange(n)
        seg_first = np.concatenate(([True], c[1:] != c[:-1]))
        run_first = np.concatenate(([True], (c[1:] != c[:-1])
                                    | (v[1:] != v[:-1])))
        seg_start = idx[seg_first][np.cumsum(seg_first) - 1]
        run_start = idx[run_first][np.cumsum(run_first) - 1]
        seg_sizes = np.diff(np.append(idx[seg_first], n))
        n_seg = np.repeat(seg_sizes, seg_sizes)
        rnk = run_start - seg_start + 1
        # dense_rank: count of value runs up to this one within the segment
        run_id = np.cumsum(run_first)
        dense = run_id - run_id[seg_start] + 1
        with np.errstate(invalid="ignore", divide="ignore"):
            pct = np.where(n_seg > 1, (rnk - 1) / (n_seg - 1), 0.0)
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy()[order],
            "ts_ms": df["ts_ms"].to_numpy()[order],
            "value": v,
            "rnk": rnk.astype(np.int64),
            "dense_rnk": dense.astype(np.int64),
            "pct_rank": round_half_away(pct, 6),
        })
        return out

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def props_k_stats(sf_dir: str):
    """Semi-structured extraction + aggregate: parse the integer ``k`` out
    of the JSON ``props`` column and aggregate per event type.  Extraction
    is a vectorized regex (the column is flat single-key JSON; a general
    nested path would swap in a per-batch JSON parser at the same seam);
    per-batch partials combine before the one small exchange.  Null /
    unparseable props are skipped, matching SQL's NULL-skipping
    aggregates."""
    tune_context()
    P = 8
    ds = _read_events(sf_dir, ["event_type", "props"], _n_parts(sf_dir))

    def partial(tbl):
        # Arrow-native partial: RE2 extract + C group_by, no object dtypes
        import pyarrow as pa
        import pyarrow.compute as pc

        m = pc.extract_regex(tbl.column("props"), r'"k"\s*:\s*(?P<k>-?\d+)')
        ks = pc.struct_field(m, "k")
        sub = pa.table({"event_type": tbl.column("event_type"),
                        "k": ks}).filter(pc.is_valid(ks))
        sub = sub.set_column(1, "k", pc.cast(sub["k"], pa.int64()))
        out = sub.group_by("event_type").aggregate(
            [("k", "count"), ("k", "sum"), ("k", "min"), ("k", "max")])
        return pa.table({"event_type": out["event_type"],
                         "cnt": out["k_count"], "sum_k": out["k_sum"],
                         "min_k": out["k_min"], "max_k": out["k_max"]})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        return (h % np.uint64(P)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False)
        out = g.agg(cnt=("cnt", "sum"), sum_k=("sum_k", "sum"),
                    min_k=("min_k", "min"), max_k=("max_k", "max")
                    ).reset_index()
        for c in ("cnt", "sum_k", "min_k", "max_k"):
            out[c] = out[c].astype(np.int64)
        out["avg_k"] = round_half_away(
            out["sum_k"].to_numpy() / out["cnt"].to_numpy(), 6)
        return out

    return hash_exchange(partials, key_fn=key_fn, n_parts=P, kernel=merge,
                         fmt="pandas")


def user_quantiles_sketch(sf_dir: str, qs=(0.5, 0.95, 0.99),
                          k: int = 200):
    """Per-user quantiles via the mergeable KLL-style sketch
    (``stages/sketch.py``) — the 100 TB shape: the exchange carries ≤
    k·log(n/k) weighted rows per (user, block) instead of every raw value,
    so a pathological hot key can no longer melt its reduce task.  EXACT
    whenever a user's count stays ≤ k (no compaction → all weights 1 → the
    weighted estimator reduces bit-exactly to ``quantiles_by_key``), which
    holds at the driver's correctness scale — hence the `quantile_cont`
    oracle; the compaction path's rank error is gated in
    ``tests/test_sketch.py``."""
    from ..stages.sketch import quantiles_from_sketch, sketch_batch

    P = _n_parts(sf_dir)
    pts = _read_points(sf_dir, P)

    partials = pts.map_batches(
        lambda df: sketch_batch(df, key_col="user_id", k=k),
        batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        merged = sketch_batch(df, key_col="user_id", k=k,
                              weight_col="weight")
        return quantiles_from_sketch(merged, key_col="user_id", qs=qs)

    return hash_exchange(partials, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=final, fmt="pandas")


def type_user_counts_sketch(sf_dir: str, k: int = 1024):
    """Distinct users per event type via the mergeable KMV sketch
    (``stages/sketch.py``) — the bounded-state sibling of
    :func:`daily_distinct_types`'s exact dedup: the exchange carries ≤ k
    hash rows per (type, block) however many distinct users exist.  EXACT
    below capacity (every hash kept), which holds at driver scale — hence
    the ``count(DISTINCT)`` oracle; the estimator's relative error is
    gated in ``tests/test_sketch.py``."""
    from ..stages.sketch import kmv_estimate, kmv_rows

    tune_context()
    P = 8
    ds = _read_events(sf_dir, ["event_type", "user_id"], _n_parts(sf_dir))

    partials = ds.map_batches(
        lambda df: kmv_rows(df, key_col="event_type", value_col="user_id",
                            k=k),
        batch_format="pandas")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        return (h % np.uint64(P)).astype(np.int64)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        merged = kmv_rows(df, key_col="event_type", value_col="h",
                          k=k, hashed=True)
        return kmv_estimate(merged, key_col="event_type", k=k)

    return hash_exchange(partials, key_fn=key_fn, n_parts=P, kernel=final,
                         fmt="pandas")


def ohlc(sf_dir: str, tier: str = "1h"):
    """OHLC bars (finance-style rollup): per (user, bucket) the FIRST,
    max, min and LAST value in event-time order.  Decomposable
    partial+final shape: each batch keeps one (first_ts, first_v, last_ts,
    last_v, min, max) row per (user, bucket) (rows pre-sorted by ts →
    first/last are head/tail), the exchange merges partials by
    arg-min/arg-max over the boundary timestamps.  Microsecond order (ms
    ties cannot flip open/close)."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "value"], P)
    bucket_ms = TIER_MS[tier]

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")

    def partial(t):
        # Arrow twin of the pandas combiner (stable sort_by + ordered
        # first/last, same semantics as the rollup twins)
        import pyarrow as pa

        cols = ["user_id", "bucket_ms", "first_ts", "open_v", "last_ts",
                "close_v", "high_v", "low_v"]
        if t.num_rows == 0:
            return pa.table({"user_id": t.column("user_id"),
                             **{c: pa.array([], pa.int64()) if "ts" in c
                                or c == "bucket_ms"
                                else pa.array([], pa.float64())
                                for c in cols[1:]}})
        t = t.sort_by("ts_us")
        ts_us = t.column("ts_us")
        bucket = pc.multiply(pc.divide(pc.divide(ts_us, 1000), bucket_ms),
                             bucket_ms)
        work = pa.table({"user_id": t.column("user_id"),
                         "bucket_ms": bucket, "ts_us": ts_us,
                         "v": t.column("value")})
        agg = work.group_by(["user_id", "bucket_ms"],
                            use_threads=False).aggregate(
            [("ts_us", "first"), ("v", "first"), ("ts_us", "last"),
             ("v", "last"), ("v", "max"), ("v", "min")])
        ren = {"ts_us_first": "first_ts", "v_first": "open_v",
               "ts_us_last": "last_ts", "v_last": "close_v",
               "v_max": "high_v", "v_min": "low_v"}
        agg = agg.rename_columns([ren.get(c, c) for c in agg.schema.names])
        return agg.select(cols)

    partials = pts.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "user_id")
        h = (h * np.uint64(1_000_003)
             + tbl.column("bucket_ms").to_numpy().astype(np.uint64))
        return (h % np.uint64(P)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("first_ts", kind="stable")
        g = df.groupby(["user_id", "bucket_ms"], sort=False)
        head = g.agg(open_v=("open_v", "first"),
                     high_v=("high_v", "max"), low_v=("low_v", "min"))
        tail = (df.sort_values("last_ts", kind="stable")
                .groupby(["user_id", "bucket_ms"], sort=False)
                .agg(close_v=("close_v", "last")))
        out = head.join(tail).reset_index()
        for c in ("open_v", "close_v", "high_v", "low_v"):
            out[c] = round_half_away(out[c].to_numpy(), 6)
        return out

    return hash_exchange(partials, key_fn=key_fn, n_parts=P, kernel=merge,
                         fmt="pandas")


def vwap(sf_dir: str, tier: str = "1h"):
    """Weighted-average rollup (VWAP shape): per (user, bucket),
    sum(value·w)/sum(w) with the weight extracted from the JSON props
    column — weighted aggregates + semi-structured extraction in one
    decomposable partial+final pass.  Rows with missing weight drop on
    both sides (SQL NULL-skipping sums)."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "value", "props"], P)
    bucket_ms = TIER_MS[tier]

    def partial(t):
        # Arrow twin: RE2 extract_regex (named group) + one group_by —
        # the JSON props column never becomes object-dtype strings
        import pyarrow as pa

        k = pc.struct_field(
            pc.extract_regex(t.column("props"), r'"k"\s*:\s*(?P<k>-?\d+)'),
            "k")
        k = pc.cast(k, pa.int64())
        keep = pc.is_valid(k)
        t2 = t.append_column("_k", k).filter(keep)
        ts_ms = pc.divide(pc.cast(t2.column("ts"), "int64"), 1000)
        bucket = pc.multiply(pc.divide(ts_ms, bucket_ms), bucket_ms)
        work = pa.table({
            "user_id": t2.column("user_id"),
            "bucket_ms": bucket,
            "vk": pc.multiply(t2.column("value"),
                              pc.cast(t2.column("_k"), pa.float64())),
            "k": t2.column("_k"),
        })
        agg = work.group_by(["user_id", "bucket_ms"],
                            use_threads=False).aggregate(
            [("vk", "sum"), ("k", "sum")])
        ren = {"vk_sum": "sum_vk", "k_sum": "sum_w"}
        agg = agg.rename_columns([ren.get(c, c) for c in agg.schema.names])
        return agg.select(["user_id", "bucket_ms", "sum_vk", "sum_w"])

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "user_id")
        h = (h * np.uint64(1_000_003)
             + tbl.column("bucket_ms").to_numpy().astype(np.uint64))
        return (h % np.uint64(P)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "bucket_ms"], sort=False)
        out = g.agg(sum_vk=("sum_vk", "sum"),
                    sum_w=("sum_w", "sum")).reset_index()
        out["vwap"] = round_half_away(
            out["sum_vk"].to_numpy() / out["sum_w"].to_numpy(), 6)
        out["sum_w"] = out["sum_w"].astype(np.int64)
        return out[["user_id", "bucket_ms", "vwap", "sum_w"]]

    return hash_exchange(partials, key_fn=key_fn, n_parts=P, kernel=merge,
                         fmt="pandas")


def next_gaps(sf_dir: str):
    """LEAD-window complement of :func:`event_gaps`: per-user gap to the
    NEXT event (NaN at each user's last event) — same one-exchange
    partition kernel, diff shifted the other way."""
    ds = _read_points(sf_dir)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        user = df["user_id"].to_numpy()
        order = np.lexsort((df["ts_ms"].to_numpy(), user))
        user = user[order]
        ts = df["ts_ms"].to_numpy()[order]
        gap = np.empty(len(ts), dtype=np.float64)
        if len(ts):
            gap[-1] = np.nan
            gap[:-1] = np.diff(ts).astype(np.float64)
            last = np.concatenate((user[1:] != user[:-1], [True]))
            gap[last] = np.nan
        return pd.DataFrame({"user_id": user, "ts_ms": ts,
                             "next_gap_ms": gap})

    return hash_exchange(ds, key_fn=_user_key_fn(_n_parts(sf_dir)),
                         n_parts=_n_parts(sf_dir),
                         kernel=kernel, fmt="pandas")


def type_share(sf_dir: str):
    """Two-level global aggregate: each type's share of ALL events.  Type
    counts combine per batch; the final kernel needs the global total, so
    the (tiny, bounded-cardinality) count rows land in ONE partition —
    the share division must see every type, and 'types' is a small
    domain by schema, unlike user-cardinality keys."""
    tune_context()
    ds = _read_events(sf_dir, ["event_type"], _n_parts(sf_dir))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("event_type", sort=False).size()
                .rename("cnt").reset_index())

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("event_type", sort=False)["cnt"].sum().reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        out["share"] = round_half_away(
            out["cnt"].to_numpy() * 1.0 / out["cnt"].sum(), 6)
        return out

    return hash_exchange(partials, key_fn=lambda tbl: np.zeros(
        tbl.num_rows, dtype=np.int64), n_parts=1, kernel=merge,
        fmt="pandas")


def hourly_profile(sf_dir: str):
    """Calendar-dimension aggregate: events and mean value by (type,
    UTC hour-of-day) — the activity-profile shape.  Hour derivation is
    integer arithmetic on the ms epoch; partial cells combine per batch."""
    import pyarrow.compute as pc

    tune_context()
    P = 8
    ds = _read_events(sf_dir, ["event_type", "ts", "value"],
                      _n_parts(sf_dir))

    def partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({
            "event_type": batch["event_type"].to_pandas(),
            # no mod kernel in this pyarrow — numpy on the zero-copy int64s
            "hour": (ts_ms // 3_600_000) % 24,
            "value": batch["value"].to_numpy(zero_copy_only=False),
        })
        g = df.groupby(["event_type", "hour"], sort=False)["value"]
        return g.agg(cnt="size", sum_v="sum").reset_index()

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        h = h * np.uint64(31) + tbl.column("hour").to_numpy().astype(
            np.uint64)
        return (h % np.uint64(P)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["event_type", "hour"], sort=False)
        out = g.agg(cnt=("cnt", "sum"), sum_v=("sum_v", "sum")).reset_index()
        out["cnt"] = out["cnt"].astype(np.int64)
        out["mean_v"] = round_half_away(
            out["sum_v"].to_numpy() / out["cnt"].to_numpy(), 6)
        return out[["event_type", "hour", "cnt", "mean_v"]]

    return hash_exchange(partials, key_fn=key_fn, n_parts=P, kernel=merge,
                         fmt="pandas")


def grouping_sets(sf_dir: str):
    """GROUPING SETS ((user, type), (user), (type), ()) from ONE pass of
    shared partials: the in-batch combiner emits (user, type) cells once;
    every coarser granularity re-aggregates those cells, never raw events.
    (user,type)+(user) finalize on the user-hash exchange, (type) on a
    type-hash exchange over the same partials, the grand total folds the
    tiny per-type cells.  Sentinels (-1, 'ALL') mark rolled-up dimensions
    (user ids are ≥ 0 by schema)."""
    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "value"], P)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["user_id", "event_type"], sort=False)["value"]
        return g.agg(cnt="size", sum_v="sum").reset_index()

    partials = ds.map_batches(partial, batch_format="pandas").materialize()

    def fin_cols(out):
        out["cnt"] = out["cnt"].astype(np.int64)
        out["sum_v"] = round_half_away(out["sum_v"].to_numpy(), 6)
        return out[["user_id", "event_type", "cnt", "sum_v"]]

    def by_user(df: pd.DataFrame) -> pd.DataFrame:
        fine = (df.groupby(["user_id", "event_type"], sort=False)
                .agg(cnt=("cnt", "sum"), sum_v=("sum_v", "sum"))
                .reset_index())
        coarse = (fine.groupby("user_id", sort=False)
                  .agg(cnt=("cnt", "sum"), sum_v=("sum_v", "sum"))
                  .reset_index().assign(event_type="ALL"))
        return fin_cols(pd.concat([fine, coarse], ignore_index=True))

    user_cells = hash_exchange(partials, key_fn=_user_key_fn(P), n_parts=P,
                               kernel=by_user, fmt="pandas")

    def type_key(tbl):
        h = arrow_col_hash(tbl, "event_type")
        return (h % np.uint64(8)).astype(np.int64)

    def by_type(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("event_type", sort=False)
               .agg(cnt=("cnt", "sum"), sum_v=("sum_v", "sum"))
               .reset_index().assign(user_id=np.int64(-1)))
        return fin_cols(out)

    type_cells = hash_exchange(partials, key_fn=type_key, n_parts=8,
                               kernel=by_type, fmt="pandas")

    def grand(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"user_id": [np.int64(-1)],
                            "event_type": ["ALL"],
                            "cnt": [np.int64(df["cnt"].sum())],
                            "sum_v": [df["sum_v"].sum()]})
        # re-round: the grand total folds UNROUNDED per-type sums
        return out

    def by_type_raw(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("event_type", sort=False)
               .agg(cnt=("cnt", "sum"), sum_v=("sum_v", "sum"))
               .reset_index())
        return out

    type_raw = hash_exchange(partials, key_fn=type_key, n_parts=8,
                             kernel=by_type_raw, fmt="pandas")
    grand_cell = hash_exchange(
        type_raw, key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1,
        kernel=lambda df: fin_cols(grand(df)), fmt="pandas")

    return user_cells.union(type_cells).union(grand_cell)


def above_user_mean(sf_dir: str):
    """Correlated-aggregate filter: events strictly above their OWN user's
    mean value — the aggregate-then-rejoin shape (SQL correlated subquery /
    join against a grouped aggregate).  One user-hash exchange; the kernel
    computes each user's mean and filters its rows in the same pass."""
    P = _n_parts(sf_dir)
    pts = _read_points(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "ts_ms", "value"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        codes, _ = pd.factorize(df["user_id"], sort=False)
        v = df["value"].to_numpy()
        mean = np.bincount(codes, weights=v) / np.bincount(codes)
        keep = v > mean[codes]
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy()[keep],
            "ts_ms": df["ts_ms"].to_numpy()[keep],
            "value": v[keep],
        })

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def retention_cohorts(sf_dir: str):
    """Cohort retention matrix: users grouped by FIRST-event day, counted
    as active per week offset since their cohort day — the product-
    analytics shape.  One user-hash exchange derives each user's cohort +
    deduped (cohort, week) activity (a user lives in exactly one
    partition, so the per-partition dedup is globally exact and the second
    exchange only sums tiny (cohort, week, cnt) cells)."""
    P = _n_parts(sf_dir)
    pts = _read_points(sf_dir, P)
    WEEK_MS = 7 * DAY_MS

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["cohort_day", "week_offset", "cnt"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        codes, _ = pd.factorize(df["user_id"], sort=False)
        day = (df["ts_ms"].to_numpy() // DAY_MS) * DAY_MS
        order = np.lexsort((day, codes))
        c, d = codes[order], day[order]
        seg_first = np.concatenate(([True], c[1:] != c[:-1]))
        cohort = d[np.flatnonzero(seg_first)][np.cumsum(seg_first) - 1]
        off = (d - cohort) // WEEK_MS
        cells = pd.DataFrame({"cohort_day": cohort, "week_offset": off,
                              "u": c}).drop_duplicates()
        out = (cells.groupby(["cohort_day", "week_offset"], sort=False)
               .size().rename("cnt").reset_index())
        return out

    partials = hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=per_user, fmt="pandas")

    def key_fn(tbl):
        h = (tbl.column("cohort_day").to_numpy().astype(np.uint64)
             * np.uint64(1_000_003)
             + tbl.column("week_offset").to_numpy().astype(np.uint64))
        return (h % np.uint64(8)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["cohort_day", "week_offset"], sort=False)["cnt"]
               .sum().reset_index())
        out["n_users"] = out.pop("cnt").astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=key_fn, n_parts=8, kernel=merge,
                         fmt="pandas")


def outliers(sf_dir: str, n_sigma: float = 2.0):
    """Per-series anomaly flagging: events whose value deviates more than
    ``n_sigma`` sample standard deviations from their OWN user's mean —
    the z-score outlier shape.  Same fused aggregate-then-filter kernel as
    :func:`above_user_mean` (centered moments, one exchange)."""
    P = _n_parts(sf_dir)
    pts = _read_points(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "ts_ms", "value", "zscore"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        codes, _ = pd.factorize(df["user_id"], sort=False)
        v = df["value"].to_numpy()
        n = np.bincount(codes)
        mean = np.bincount(codes, weights=v) / n
        d = v - mean[codes]
        with np.errstate(invalid="ignore", divide="ignore"):
            std = np.sqrt(np.bincount(codes, weights=d * d)
                          / np.maximum(n - 1, 1))
            z = d / std[codes]
        keep = (n[codes] > 1) & (np.abs(d) > n_sigma * std[codes])
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy()[keep],
            "ts_ms": df["ts_ms"].to_numpy()[keep],
            "value": v[keep],
            "zscore": round_half_away(z[keep], 6),
        })

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def user_type_entropy(sf_dir: str):
    """Information-theoretic aggregate: Shannon entropy (nats) of each
    user's event-type distribution — the behavioral-diversity feature.
    In-batch (user, type) count partials; entropy per user in the merge."""
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type"], P)

    partials = ds.map_batches(_count_partial_arrow(["user_id", "event_type"]),
                              batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_events", "entropy"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        g = (df.groupby(["user_id", "event_type"], sort=False)["cnt"]
             .sum().reset_index())
        codes, users = pd.factorize(g["user_id"], sort=False)
        cnt = g["cnt"].to_numpy(dtype=np.float64)
        tot = np.bincount(codes, weights=cnt)
        p = cnt / tot[codes]
        ent = -np.bincount(codes, weights=p * np.log(p))
        return pd.DataFrame({
            "user_id": np.asarray(users),
            "n_events": tot.astype(np.int64),
            "entropy": round_half_away(ent, 6),
        })

    return hash_exchange(partials, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=merge, fmt="pandas")


def latest_event_per_user(sf_dir: str):
    """Row-level arg-max: each user's LATEST event with its full payload
    (the current-state lookup shape) — per-partition sort, take each user
    segment's tail; microsecond order."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir,
                      ["event_id", "user_id", "ts", "event_type", "value"],
                      P)

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "event_id", "ts_ms", "event_type", "value"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        uid = df["user_id"].to_numpy()
        last = np.concatenate((uid[1:] != uid[:-1], [True]))
        out = df.loc[last].reset_index(drop=True)
        return pd.DataFrame({
            "user_id": out["user_id"], "event_id": out["event_id"],
            "ts_ms": out["ts_us"].to_numpy() // 1000,
            "event_type": out["event_type"], "value": out["value"],
        })

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def type_transitions(sf_dir: str):
    """Sequence bigrams (Markov transitions): counts and row-conditional
    probability of each (current type → next type) step within a user's
    event-time-ordered stream.  Per-partition shift-compare (one sort),
    (a, b) cell partials, tiny merge."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "event_type"], P)

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["cur_type", "next_type", "cnt"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        uid = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        out = pd.DataFrame({"cur_type": et[:-1][same],
                            "next_type": et[1:][same]})
        return (out.groupby(["cur_type", "next_type"], sort=False)
                .size().rename("cnt").reset_index())

    partials = hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=pairs, fmt="pandas")

    def key_fn(tbl):
        return (arrow_col_hash(tbl, "cur_type")
                % np.uint64(8)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["cur_type", "next_type"], sort=False)["cnt"]
               .sum().reset_index())
        out["cnt"] = out["cnt"].astype(np.int64)
        tot = out.groupby("cur_type", sort=False)["cnt"].transform("sum")
        out["p_next"] = round_half_away(
            out["cnt"].to_numpy() / tot.to_numpy(), 6)
        return out

    return hash_exchange(partials, key_fn=key_fn, n_parts=8, kernel=merge,
                         fmt="pandas")


def time_in_state(sf_dir: str):
    """State-duration aggregate: total milliseconds each user spends 'in'
    each event type under LOCF semantics (a state lasts until the next
    event; the last event of a user is open-ended and contributes
    nothing).  Same one-sort shift kernel as :func:`type_transitions`."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "event_type"], P)

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "event_type", "total_ms", "n_stays"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        uid = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy()
        et = df["event_type"].to_numpy()
        same = uid[1:] == uid[:-1]
        dur = pd.DataFrame({
            "user_id": uid[:-1][same],
            "event_type": et[:-1][same],
            "ms": (ts[1:][same] - ts[:-1][same]) // 1000,
        })
        out = (dur.groupby(["user_id", "event_type"], sort=False)["ms"]
               .agg(total_ms="sum", n_stays="size").reset_index())
        out["total_ms"] = out["total_ms"].astype(np.int64)
        out["n_stays"] = out["n_stays"].astype(np.int64)
        return out

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def value_ntile(sf_dir: str, k: int = 4):
    """ntile window function: SQL tile assignment (first ``n % k`` tiles
    get the extra row) per user over (value, event_id) deterministic
    order; one lexsort + segment position arithmetic per partition."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "user_id", "value"], P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "user_id", "value", "tile"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        codes, _ = pd.factorize(df["user_id"], sort=False)
        order = np.lexsort((df["event_id"].to_numpy(),
                            df["value"].to_numpy(), codes))
        c = codes[order]
        n_all = len(c)
        idx = np.arange(n_all)
        seg_first = np.concatenate(([True], c[1:] != c[:-1]))
        seg_start = idx[seg_first][np.cumsum(seg_first) - 1]
        seg_sizes = np.diff(np.append(idx[seg_first], n_all))
        n = np.repeat(seg_sizes, seg_sizes)
        pos = idx - seg_start
        base, rem = n // k, n % k
        big = rem * (base + 1)
        tile = np.where(pos < big, pos // np.maximum(base + 1, 1),
                        rem + (pos - big) // np.maximum(base, 1)) + 1
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy()[order],
            "user_id": df["user_id"].to_numpy()[order],
            "value": df["value"].to_numpy()[order],
            "tile": tile.astype(np.int64),
        })

    return hash_exchange(ds, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def session_conversion(sf_dir: str, gap_ms: int = 1_800_000):
    """Session-level conversion rate: the share of each user's sessions
    (same 30-min-gap rule as :func:`sessionize`) containing ≥1 purchase.
    One user-hash exchange; the kernel re-derives session ids (vectorized
    gap-break cumsum), flags converting sessions with a segment max, and
    emits per-user counts."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "event_type"], P)

    def to_ms(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"), 1000)
        return batch.drop_columns(["ts"]).append_column("ts_ms", ts_ms)

    pts = ds.map_batches(to_ms, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_sessions", "n_converting", "conv_rate"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        uid = df["user_id"].to_numpy()
        ts = df["ts_ms"].to_numpy()
        new_user = np.concatenate(([True], uid[1:] != uid[:-1]))
        brk = new_user | np.concatenate(([True],
                                         (ts[1:] - ts[:-1]) > gap_ms))
        sess = np.cumsum(brk) - 1            # global session id
        is_p = (df["event_type"] == "purchase").to_numpy()
        conv = np.bincount(sess, weights=is_p) > 0
        sess_user = uid[brk]                 # one row per session
        codes, users = pd.factorize(sess_user, sort=False)
        n_sessions = np.bincount(codes)
        n_conv = np.bincount(codes, weights=conv).astype(np.int64)
        return pd.DataFrame({
            "user_id": np.asarray(users),
            "n_sessions": n_sessions.astype(np.int64),
            "n_converting": n_conv,
            "conv_rate": round_half_away(n_conv / n_sessions, 6),
        })

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def rollup_multi_tier(sf_dir: str):
    """Shared-scan multi-output: the 1m/1h/1d tiers from ONE read — 1m
    partials are computed once per batch; the coarser tiers re-aggregate
    those partials (decomposable cascade), never raw points.  Output is
    the union with a ``tier`` label column."""
    ds = _read_points(sf_dir)
    P = _n_parts(sf_dir)
    partials = ds.map_batches(
        partial_rollup_arrow,
        fn_kwargs={"key_cols": ["user_id"], "bucket_ms": TIER_MS["1m"]},
        batch_format="pyarrow").materialize()

    outs = []
    for tier in ("1m", "1h", "1d"):
        if tier == "1m":
            rolled = finalize_by_partition(partials, key_cols=["user_id"],
                                           n_parts=P)
        else:
            rolled = cascade_dataset(partials, key_cols=["user_id"],
                                     tier=tier, n_parts=P)

        def tag(df: pd.DataFrame, tier=tier) -> pd.DataFrame:
            df = df.copy()
            df["sum_v"] = round_half_away(df["sum_v"].to_numpy(), 6)
            df["tier"] = tier
            return df[["tier", "user_id", "bucket_ms", "sum_v", "cnt",
                       "min_v", "max_v", "last_v"]]

        outs.append(rolled.map_batches(tag, batch_format="pandas"))
    return outs[0].union(outs[1]).union(outs[2])


def busy_user_days(sf_dir: str, min_events: int = 3):
    """Post-aggregation filter (HAVING shape): (user, day) cells with at
    least ``min_events`` events — partial counts combine per batch, the
    merge applies the HAVING predicate after the final sum."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts"], P)

    def partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"), 1000)
        day_ms = pc.multiply(pc.divide(ts_ms, DAY_MS), DAY_MS)
        df = pd.DataFrame({
            "user_id": batch["user_id"].to_numpy(zero_copy_only=False),
            "day_ms": day_ms.to_numpy(zero_copy_only=False),
        })
        return (df.groupby(["user_id", "day_ms"], sort=False).size()
                .rename("cnt").reset_index())

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "user_id")
        h = (h * np.uint64(1_000_003)
             + tbl.column("day_ms").to_numpy().astype(np.uint64))
        return (h % np.uint64(P)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["user_id", "day_ms"], sort=False)["cnt"]
               .sum().reset_index())
        out["cnt"] = out["cnt"].astype(np.int64)
        return out.loc[out["cnt"] >= min_events].reset_index(drop=True)

    return hash_exchange(partials, key_fn=key_fn, n_parts=P, kernel=merge,
                         fmt="pandas")


def asof_next_match(sf_dir: str, match_type: str = "purchase"):
    """FORWARD as-of join: for every event, the same user's NEXT match
    strictly after it (direction complement of :func:`asof_last_match`);
    −1 sentinels keep the columns non-nullable.  One user-hash exchange,
    composite-key searchsorted against the match stream."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir,
                      ["event_id", "user_id", "ts", "event_type", "value"],
                      P)

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "user_id", "ts_ms", "next_match_ts",
                "next_match_value"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        uid_codes, _ = pd.factorize(df["user_id"], sort=False)
        ts = df["ts_us"].to_numpy()
        rel = ts - ts.min()
        stride = np.int64(rel.max()) + 2
        key = uid_codes.astype(np.int64) * stride + rel
        is_m = (df["event_type"] == match_type).to_numpy()
        mkey = key[is_m]
        mts = ts[is_m]
        mval = df["value"].to_numpy()[is_m]
        pos = np.searchsorted(mkey, key, side="right")
        ok = pos < len(mkey)
        # same-user check: the stride separates users, so a hit in the
        # next user's segment differs in key // stride
        same = np.zeros(len(key), dtype=bool)
        same[ok] = (mkey[pos[ok]] // stride) == (key[ok] // stride)
        nts = np.full(len(key), -1, dtype=np.int64)
        nval = np.full(len(key), -1.0)
        nts[same] = mts[pos[same]] // 1000
        nval[same] = mval[pos[same]]
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(),
            "user_id": df["user_id"].to_numpy(),
            "ts_ms": ts // 1000,
            "next_match_ts": nts,
            "next_match_value": nval,
        })

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def streaming_out_of_order(sf_dir: str, n_actors: int = 4):
    """Out-of-order streaming ingest gate: events arrive in a DETERMINISTIC
    scrambled order (sorted by (value, ts) — thoroughly out of time order),
    so the per-series watermark DROPS every point at-or-behind the running
    max of earlier arrivals.  The accepted subset is exactly SQL-expressible
    (running max over the same arrival order), making the late-data path —
    not just the in-order happy path of :func:`streaming_roundtrip` —
    oracle-checkable end to end.  The feed is distributed (per-router
    reader tasks sort their own slice by (value, ts) — per-series arrival
    order matches the global sort exactly since a series lives wholly in
    one slice).  Decode runs back on the Dataset API."""
    return _streaming_gate(sf_dir, n_actors, ["value", "ts_ms"])


def streaming_window_late(sf_dir: str, n_actors: int = 4,
                          tier: str = "1h",
                          lateness_ms: int = 1_800_000):
    """ALLOWED-LATENESS streaming window gate: same scrambled arrival
    order as :func:`streaming_window_out_of_order`, but windows stay
    open ``lateness_ms`` past the per-series watermark — the
    grace-period semantics a production streaming engine exposes
    (Flink's allowedLateness).  A row drops only when its window lies
    before the LATENESS-ADJUSTED boundary floor((max(wm−L, 0))/W)·W of
    the running max over prior arrivals; the rule stays sequential and
    batch-size-invariant, so the accepted set is exactly
    SQL-expressible.  The gate asserts lateness actually engages: fewer
    drops than the zero-lateness run would take, but still > 0 (the
    scramble outruns any 30-min grace)."""
    import ray.data

    from ..state.streaming import (StreamingRouter, _WindowAggCore,
                                   feed_parquet_distributed)

    tune_context()
    window_ms = TIER_MS[tier]
    router = StreamingRouter(n_actors=n_actors,
                             actor_core=_WindowAggCore,
                             core_args=(window_ms, lateness_ms))
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    feed_parquet_distributed(router, path, order_cols=["value", "ts_ms"])
    rows = pd.DataFrame(router.seal())
    stats = router.stats()
    if len(rows) and stats["late"] == 0:
        raise RuntimeError("scrambled arrival produced no late drops — "
                           "the lateness boundary did not engage")

    if len(rows) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "window_ms": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
            "cnt": pd.Series([], dtype=np.int64)}))
    out = pd.DataFrame({
        "user_id": rows["key"].astype(np.int64),
        "window_ms": rows["window_ms"].astype(np.int64),
        "sum_cents": rows["sum_cents"].astype(np.int64),
        "cnt": rows["cnt"].astype(np.int64)})
    return ray.data.from_pandas(out)


def m4_downsample(sf_dir: str, tier: str = "1h"):
    """M4 visualization-driven downsampling (Jugel et al., VLDB 2014):
    per (user, bucket) the four extremum POINTS — first/last in event
    time, min/max by value — each kept as its full ``(ts_us, value)``
    pair, so a line plot drawn from ≤4 points per pixel column is
    pixel-identical to the full-resolution series.  Unlike :func:`ohlc`
    (values only) the ARG timestamps ride along; value ties break to the
    EARLIEST microsecond, making every selected point deterministic
    (total order, no sort-stability assumption).

    Decomposable partial+final: each batch keeps the four candidate
    points per (user, bucket) via Arrow sort+group_by C kernels; the
    exchange merge re-runs the same arg-selection over the candidates."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, EVENT_COLS, P)
    bucket_ms = TIER_MS[tier]
    cols = ["user_id", "bucket_ms", "first_ts_us", "first_v",
            "last_ts_us", "last_v", "min_ts_us", "min_v",
            "max_ts_us", "max_v"]

    def to_us(batch):
        ts_us = pc.cast(batch["ts"], "int64")
        return batch.drop_columns(["ts"]).append_column("ts_us", ts_us)

    pts = ds.map_batches(to_us, batch_format="pyarrow")

    def partial(t):
        import pyarrow as pa

        if t.num_rows == 0:
            return pa.table({c: pa.array(
                [], pa.float64() if c.endswith("_v") else pa.int64())
                for c in cols})
        ts_us = t.column("ts_us")
        bucket = pc.multiply(pc.divide(pc.divide(ts_us, 1000), bucket_ms),
                             bucket_ms)
        work = pa.table({"user_id": t.column("user_id"),
                         "bucket_ms": bucket, "ts_us": ts_us,
                         "v": t.column("value")})

        def arg_first(sorted_tbl, ts_name, v_name):
            a = sorted_tbl.group_by(["user_id", "bucket_ms"],
                                    use_threads=False).aggregate(
                [("ts_us", "first"), ("v", "first")])
            ren = {"ts_us_first": ts_name, "v_first": v_name}
            return a.rename_columns(
                [ren.get(c, c) for c in a.schema.names])

        by_ts = work.sort_by("ts_us")
        ft = by_ts.group_by(["user_id", "bucket_ms"],
                            use_threads=False).aggregate(
            [("ts_us", "first"), ("v", "first"),
             ("ts_us", "last"), ("v", "last")])
        ren = {"ts_us_first": "first_ts_us", "v_first": "first_v",
               "ts_us_last": "last_ts_us", "v_last": "last_v"}
        ft = ft.rename_columns([ren.get(c, c) for c in ft.schema.names])
        mn = arg_first(work.sort_by([("v", "ascending"),
                                     ("ts_us", "ascending")]),
                       "min_ts_us", "min_v")
        mx = arg_first(work.sort_by([("v", "descending"),
                                     ("ts_us", "ascending")]),
                       "max_ts_us", "max_v")
        out = ft.join(mn, keys=["user_id", "bucket_ms"]).join(
            mx, keys=["user_id", "bucket_ms"])
        return out.select(cols)

    partials = pts.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "user_id")
        h = (h * np.uint64(1_000_003)
             + tbl.column("bucket_ms").to_numpy().astype(np.uint64))
        return (h % np.uint64(P)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        keys = ["user_id", "bucket_ms"]
        first = (df.sort_values("first_ts_us", kind="stable")
                 .groupby(keys, sort=False)
                 .agg(first_ts_us=("first_ts_us", "first"),
                      first_v=("first_v", "first")))
        last = (df.sort_values("last_ts_us", kind="stable")
                .groupby(keys, sort=False)
                .agg(last_ts_us=("last_ts_us", "last"),
                     last_v=("last_v", "last")))
        mn = (df.sort_values(["min_v", "min_ts_us"], kind="stable")
              .groupby(keys, sort=False)
              .agg(min_ts_us=("min_ts_us", "first"),
                   min_v=("min_v", "first")))
        mx = (df.sort_values(["max_v", "max_ts_us"],
                             ascending=[False, True], kind="stable")
              .groupby(keys, sort=False)
              .agg(max_ts_us=("max_ts_us", "first"),
                   max_v=("max_v", "first")))
        out = first.join([last, mn, mx]).reset_index()
        for c in ("first_v", "last_v", "min_v", "max_v"):
            out[c] = round_half_away(out[c].to_numpy(), 6)
        return out[cols]

    return hash_exchange(partials, key_fn=key_fn, n_parts=P, kernel=merge,
                         fmt="pandas")


def cusum(sf_dir: str, h_cents: int = 500):
    """One-sided CUSUM drift detector per user (Page 1954) over the
    integer-cent scale.  The recursive form ``s_i = max(0, s_{i-1} +
    d_i)`` has the closed form ``s_i = P_i − min(0, min_{j≤i} P_j)``
    with ``P`` the prefix sum of ``d_i = cents_i − target`` — i.e. one
    grouped cumsum plus one grouped cummin, fully vectorized AND fully
    window-expressible in SQL.  The target is the user's LOWER MEDIAN
    cents (exact order statistic at rank ``(n−1)//2``), so every output
    is an exact integer — the winsorize/seasonal-decompose discipline:
    no float arithmetic, no rounding-midpoint hazard.

    Outputs per user: n, the target, the final and max CUSUM statistic,
    and how many samples sat at-or-above the alarm threshold ``h``."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "target_cents", "final_s", "max_s",
                "n_alarms"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        u = df["user_id"].to_numpy()
        c = df["c"].to_numpy().astype(np.int64)
        # per-user lower median: value-sorted rank gather (groups appear
        # in the same ascending-user order as the event-time frame)
        order = np.lexsort((c, u))
        us, cs = u[order], c[order]
        vchange = np.concatenate(([True], us[1:] != us[:-1]))
        vstarts = np.flatnonzero(vchange)
        n = np.diff(np.append(vstarts, len(us))).astype(np.int64)
        target = cs[vstarts + (n - 1) // 2]

        change = np.concatenate(([True], u[1:] != u[:-1]))
        starts = np.flatnonzero(change)
        grp = np.cumsum(change) - 1
        d = c - target[grp]
        work = pd.DataFrame({"user_id": u, "d": d})
        g = work.groupby("user_id", sort=False)
        pref = g["d"].cumsum().to_numpy()
        runmin = (pd.DataFrame({"user_id": u, "p": pref})
                  .groupby("user_id", sort=False)["p"].cummin().to_numpy())
        s = pref - np.minimum(runmin, 0)
        bounds = np.append(starts, len(u))
        return pd.DataFrame({
            "user_id": u[starts], "n": n, "target_cents": target,
            "final_s": s[bounds[1:] - 1],
            "max_s": np.maximum.reduceat(s, starts),
            "n_alarms": np.bincount(
                grp, weights=s >= h_cents).astype(np.int64)})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def active_intervals(sf_dir: str, window_ms: int = 60_000):
    """Per-user interval union (gaps-and-islands): each event opens an
    activity interval ``[ts_ms, ts_ms + window)``; overlapping-or-touching
    intervals merge, and the user's summary reports how many merged
    intervals remain, their total coverage and the longest one — the
    classic "total active time" operator.  Vectorized island detection:
    a row starts a new island iff its start exceeds the grouped running
    max of earlier ends (one grouped cummax + reduceat aggregates);
    exact integer milliseconds end-to-end."""
    tune_context()
    P = _n_parts(sf_dir)
    pts = _read_points(sf_dir, P).select_columns(["user_id", "ts_ms"])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_intervals", "active_ms", "max_interval_ms"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy()
        s = df["ts_ms"].to_numpy().astype(np.int64)
        e = s + window_ms
        cme = (pd.DataFrame({"user_id": u, "e": e})
               .groupby("user_id", sort=False)["e"].cummax().to_numpy())
        change = np.concatenate(([True], u[1:] != u[:-1]))
        pme = np.empty_like(cme)
        pme[1:] = cme[:-1]
        new = change | (s > pme)
        isl_starts = np.flatnonzero(new)
        st = s[isl_starts]
        en = np.maximum.reduceat(e, isl_starts)
        lengths = en - st
        iu = u[isl_starts]
        uchange = np.concatenate(([True], iu[1:] != iu[:-1]))
        ustarts = np.flatnonzero(uchange)
        return pd.DataFrame({
            "user_id": iu[ustarts],
            "n_intervals": np.diff(
                np.append(ustarts, len(iu))).astype(np.int64),
            "active_ms": np.add.reduceat(lengths, ustarts),
            "max_interval_ms": np.maximum.reduceat(lengths, ustarts),
        })[cols]

    return hash_exchange(pts, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def _cents_rows(sf_dir: str, P: int):
    """(user_id, ts_us, c) rows — half-away integer cents (the exact-
    arithmetic input shared by cusum/mad/autocorr/rle kernels)."""
    import pyarrow.compute as pc

    ds = _read_events(sf_dir, EVENT_COLS, P)

    def to_cents(t):
        import pyarrow as pa

        ts_us = pc.cast(t["ts"], "int64")
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(
            np.int64)
        return pa.table({"user_id": t.column("user_id"), "ts_us": ts_us,
                         "c": pa.array(cents)})

    return ds.map_batches(to_cents, batch_format="pyarrow")


def autocorr_moments(sf_dir: str):
    """Per-user lag-1 serial-correlation moments over event-time order:
    for every consecutive pair (x=cents_i, y=cents_{i+1}) the exact
    integer moments n, Σx, Σy, Σxy, Σx², Σy² — everything Pearson's r
    needs, kept as int64 so the result is hash-exact (callers divide at
    presentation time; the engine never rounds a float)."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_pairs", "sx", "sy", "sxy", "sx2", "sy2"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        u = df["user_id"].to_numpy()
        c = df["c"].to_numpy().astype(np.int64)
        same = u[1:] == u[:-1]
        x, y, uu = c[:-1][same], c[1:][same], u[:-1][same]
        if len(uu) == 0:
            return pd.DataFrame({c_: np.array([], dtype=np.int64)
                                 for c_ in cols})
        change = np.concatenate(([True], uu[1:] != uu[:-1]))
        starts = np.flatnonzero(change)
        return pd.DataFrame({
            "user_id": uu[starts],
            "n_pairs": np.diff(
                np.append(starts, len(uu))).astype(np.int64),
            "sx": np.add.reduceat(x, starts),
            "sy": np.add.reduceat(y, starts),
            "sxy": np.add.reduceat(x * y, starts),
            "sx2": np.add.reduceat(x * x, starts),
            "sy2": np.add.reduceat(y * y, starts)})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def mad_outliers(sf_dir: str, k: int = 3):
    """Robust outlier counts per user: med = lower-median cents, MAD =
    lower median of |cents − med|, outlier iff |cents − med| > k·MAD.
    Pure order statistics + integer comparisons — the robust sibling of
    the stddev-based :func:`outliers`, immune to the very outliers it
    counts.  Two rank gathers per partition, vectorized over all users."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "med_cents", "mad_cents", "n_outliers"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        u = df["user_id"].to_numpy()
        c = df["c"].to_numpy().astype(np.int64)
        order = np.lexsort((c, u))
        us, cs = u[order], c[order]
        change = np.concatenate(([True], us[1:] != us[:-1]))
        starts = np.flatnonzero(change)
        n = np.diff(np.append(starts, len(us))).astype(np.int64)
        med = cs[starts + (n - 1) // 2]
        grp = np.cumsum(change) - 1
        dev = np.abs(cs - med[grp])
        order2 = np.lexsort((dev, us))
        dev_s = dev[order2]
        mad = dev_s[starts + (n - 1) // 2]
        n_out = np.bincount(grp, weights=dev > mad[grp] * k).astype(
            np.int64)
        return pd.DataFrame({
            "user_id": us[starts], "n": n, "med_cents": med,
            "mad_cents": mad, "n_outliers": n_out})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def rle_segments(sf_dir: str):
    """Value run-length profile per user (event-time order): how many
    runs of consecutive EQUAL cents, the longest run, and the implied
    duplicate-point count ``n − n_runs`` — the direct predictor of the
    Gorilla XOR zero-bit path (equal consecutive values encode in one
    bit), surfaced as a queryable operator."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "n_runs", "max_run_len"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        u = df["user_id"].to_numpy()
        c = df["c"].to_numpy().astype(np.int64)
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        run_start = new_user | np.concatenate(([True], c[1:] != c[:-1]))
        starts = np.flatnonzero(run_start)
        run_len = np.diff(np.append(starts, len(u))).astype(np.int64)
        ru = u[starts]
        uchange = np.concatenate(([True], ru[1:] != ru[:-1]))
        ustarts = np.flatnonzero(uchange)
        bounds = np.append(np.flatnonzero(new_user), len(u))
        return pd.DataFrame({
            "user_id": ru[ustarts],
            "n": np.diff(bounds).astype(np.int64),
            "n_runs": np.diff(
                np.append(ustarts, len(ru))).astype(np.int64),
            "max_run_len": np.maximum.reduceat(run_len, ustarts)})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def quantile_bands(sf_dir: str, tier: str = "1h"):
    """Percentile time series per (event_type, bucket): p50/p95 exact
    order statistics on the integer-cent scale plus the count — the
    monitoring dashboard shape (latency bands over time).  Lower-median
    discipline for p50, ceil-rank for p95 (the winsorize convention),
    so every column is an exact integer.  One (type, bucket)-hash
    exchange of (type, bucket, cents) rows; the kernel is one lexsort +
    rank gathers vectorized over all its groups."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_type", "ts", "value"], P)
    bucket_ms = TIER_MS[tier]

    def to_rows(t):
        import pyarrow as pa

        ts_us = pc.cast(t["ts"], "int64")
        bucket = pc.multiply(pc.divide(pc.divide(ts_us, 1000), bucket_ms),
                             bucket_ms)
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(
            np.int64)
        return pa.table({"event_type": pc.cast(t["event_type"], "string"),
                         "bucket_ms": bucket, "c": pa.array(cents)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_type", "bucket_ms", "n", "p50_cents", "p95_cents"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array(
                [], dtype=object if c == "event_type" else np.int64)
                for c in cols})
        et = df["event_type"].to_numpy()
        b = df["bucket_ms"].to_numpy().astype(np.int64)
        c = df["c"].to_numpy().astype(np.int64)
        order = np.lexsort((c, b, et))
        et, b, c = et[order], b[order], c[order]
        change = np.concatenate(
            ([True], (et[1:] != et[:-1]) | (b[1:] != b[:-1])))
        starts = np.flatnonzero(change)
        n = np.diff(np.append(starts, len(c))).astype(np.int64)
        k50 = (n - 1) * 50 // 100
        k95 = ((n - 1) * 95 + 99) // 100  # ceil with positive operands
        return pd.DataFrame({
            "event_type": et[starts], "bucket_ms": b[starts], "n": n,
            "p50_cents": c[starts + k50],
            "p95_cents": c[starts + k95]})[cols]

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        h = (h * np.uint64(1_000_003)
             + tbl.column("bucket_ms").to_numpy().astype(np.uint64))
        return (h % np.uint64(P)).astype(np.int64)

    return hash_exchange(rows, key_fn=key_fn, n_parts=P, kernel=kernel,
                         fmt="pandas")


def drawdown(sf_dir: str):
    """Maximum drawdown per user — the largest peak-to-trough drop of the
    cents series in event-time order (``max_i (runmax_i − c_i)``), plus
    the running-max peak itself.  One grouped cummax + subtract + grouped
    max; exact integers, window-expressible in SQL (the CUSUM closed-form
    discipline applied to the mirror statistic)."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "peak_cents", "max_drawdown_cents"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        u = df["user_id"].to_numpy()
        c = df["c"].to_numpy().astype(np.int64)
        runmax = (pd.DataFrame({"u": u, "c": c})
                  .groupby("u", sort=False)["c"].cummax().to_numpy())
        dd_ = runmax - c
        change = np.concatenate(([True], u[1:] != u[:-1]))
        starts = np.flatnonzero(change)
        bounds = np.append(starts, len(u))
        return pd.DataFrame({
            "user_id": u[starts],
            "n": np.diff(bounds).astype(np.int64),
            "peak_cents": runmax[bounds[1:] - 1],
            "max_drawdown_cents": np.maximum.reduceat(dd_, starts)})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def rolling_window(sf_dir: str, k: int = 5):
    """Bounded-frame window features per event — the ML feature-extraction
    shape (``ROWS BETWEEN k−1 PRECEDING AND CURRENT ROW``): trailing
    count / sum / min / max of the cent series per user in event-time
    order.  Sums of cents stay < 2^53 so the pandas rolling kernel's
    float64 accumulator is EXACT and casts back to int64 losslessly;
    every output column is an exact integer."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "ts_us", "n_w", "sum_w", "min_w", "max_w"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        g = df.groupby("user_id", sort=False)["c"].rolling(
            k, min_periods=1)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "ts_us": df["ts_us"].to_numpy().astype(np.int64),
            "n_w": g.count().to_numpy().astype(np.int64),
            "sum_w": g.sum().to_numpy().astype(np.int64),
            "min_w": g.min().to_numpy().astype(np.int64),
            "max_w": g.max().to_numpy().astype(np.int64)})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def bollinger(sf_dir: str, k: int = 5):
    """Bollinger-band numerators per event: the trailing mean/variance of
    the cent series over a ``k``-row frame, emitted as EXACT integers —
    ``n·Σv² − (Σv)²`` alongside ``n`` and ``Σv`` (the consumer divides by
    n² for the population variance and adds ±m·σ bands).  Emitting the
    integer numerators instead of rounded floats is the repo's
    fixed-decimal-input rule (CLAUDE.md seasonal_decompose/winsorize
    precedent: window means of 2-decimal cents land exactly on rounding
    midpoints, where no rounding width is robust).  Magnitudes: cents ≤
    49 002, Σv² over 5 rows ≤ 1.2e10, n·Σv² ≤ 6e10 — exact in float64
    rolling accumulators and in int64."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "ts_us", "n_w", "sum_w", "var_num"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        c = df["c"].to_numpy().astype(np.int64)
        df = df.assign(c2=c * c)
        g = df.groupby("user_id", sort=False)
        roll = g["c"].rolling(k, min_periods=1)
        n_w = roll.count().to_numpy().astype(np.int64)
        sum_w = roll.sum().to_numpy().astype(np.int64)
        sumsq = (g["c2"].rolling(k, min_periods=1).sum()
                 .to_numpy().astype(np.int64))
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "ts_us": df["ts_us"].to_numpy().astype(np.int64),
            "n_w": n_w,
            "sum_w": sum_w,
            "var_num": n_w * sumsq - sum_w * sum_w})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def spc_flags(sf_dir: str, k: int = 5):
    """Statistical-process-control (control-chart) outlier flags per
    event, computed ENTIRELY in integers: a point violates the 3σ rule
    against its trailing baseline (the ``k`` PRIOR events, current point
    excluded) iff ``(n·v − Σv)² > 9·(n·Σv² − (Σv)²)`` — the
    mean/variance comparison multiplied through by n², so no float σ
    ever exists to disagree about (the fixed-decimal midpoint rule, cf.
    :func:`bollinger`).  Emits the exact deviation and variance
    numerators alongside the flag; magnitudes ≤ 5.4e11 fit int64.
    Baseline windows shorter than 2 points cannot flag."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "ts_us", "n_base", "dev_sq", "var9", "flag3"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        c = df["c"].to_numpy().astype(np.int64)
        g0 = df.groupby("user_id", sort=False)
        prev = g0["c"].shift(1)          # NaN at each user's first row
        df = df.assign(cp=prev, cp2=prev * prev)
        g = df.groupby("user_id", sort=False)
        # rolling over the SHIFTED series = frame [k PRECEDING, 1 PRECEDING]
        n_b = (g["cp"].rolling(k, min_periods=1).count()
               .to_numpy())             # count ignores the NaN head
        s_b = g["cp"].rolling(k, min_periods=1).sum().to_numpy()
        q_b = g["cp2"].rolling(k, min_periods=1).sum().to_numpy()
        n_b = np.nan_to_num(n_b).astype(np.int64)
        s_b = np.nan_to_num(s_b).astype(np.int64)
        q_b = np.nan_to_num(q_b).astype(np.int64)
        dev = n_b * c - s_b
        dev_sq = dev * dev
        var9 = 9 * (n_b * q_b - s_b * s_b)
        flag = ((n_b >= 2) & (dev_sq > var9)).astype(np.int64)
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy(),
            "ts_us": df["ts_us"].to_numpy().astype(np.int64),
            "n_base": n_b, "dev_sq": dev_sq, "var9": var9,
            "flag3": flag})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def records(sf_dir: str):
    """Running-max record ladder per user: how many times the cents
    series set a new all-time high (the first event counts), when the
    last record fell, and the record value itself.  Strict ``>`` against
    the running max of all PRIOR events; (user_id, ts) is unique by
    schema so event-time order is total.  Exact integers throughout."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "n_records", "last_record_ts_us",
                "record_cents"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        u = df["user_id"].to_numpy()
        t = df["ts_us"].to_numpy().astype(np.int64)
        c = df["c"].to_numpy().astype(np.int64)
        runmax = (pd.DataFrame({"u": u, "c": c})
                  .groupby("u", sort=False)["c"].cummax().to_numpy())
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        # record iff value exceeds the running max of PRIOR rows: the
        # running max changed here (or it's the user's first event)
        is_rec = new_user | np.concatenate(([False], runmax[1:] > runmax[:-1]))
        starts = np.flatnonzero(new_user)
        bounds = np.append(starts, len(u))
        grp = np.cumsum(new_user) - 1
        n_rec = np.bincount(grp, weights=is_rec).astype(np.int64)
        # records are increasing in ts within a user -> last one wins
        last_ts = np.maximum.reduceat(np.where(is_rec, t, np.int64(-1)),
                                      starts)
        return pd.DataFrame({
            "user_id": u[starts],
            "n": np.diff(bounds).astype(np.int64),
            "n_records": n_rec,
            "last_record_ts_us": last_ts,
            "record_cents": runmax[bounds[1:] - 1]})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def velocity_window(sf_dir: str, window_us: int = 600_000_000):
    """Trailing TIME-range window per event (``RANGE BETWEEN 10 MINUTES
    PRECEDING AND CURRENT ROW``) — the fraud/rate-limit velocity shape:
    events and cents volume within the last ``window_us`` microseconds,
    per user in event-time order.  The kernel is fully vectorized across
    every user in the partition: per-user timestamps are embedded into
    one strictly user-separated composite axis (spacing > range+window
    so a lower bound can never bleed into the previous user), then both
    frame edges come from two ``np.searchsorted`` calls and the sum from
    one prefix-cumsum difference — no per-user loop."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)
    W = int(window_us)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "ts_us", "n_w", "sum_w"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        u = df["user_id"].to_numpy()
        t = df["ts_us"].to_numpy().astype(np.int64)
        c = df["c"].to_numpy().astype(np.int64)
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        uidx = (np.cumsum(new_user) - 1).astype(np.int64)
        rel = t - t.min()
        span = int(rel.max()) + W + 2
        if (int(uidx[-1]) + 1) * span >= 2**62:  # composite would overflow
            raise ValueError("velocity_window: ts span too large for the "
                             "composite axis; shard the partition finer")
        comp = uidx * span + rel
        left = np.searchsorted(comp, comp - W, side="left")
        right = np.searchsorted(comp, comp, side="right")
        csum = np.concatenate(([0], np.cumsum(c)))
        return pd.DataFrame({
            "user_id": u, "ts_us": t,
            "n_w": (right - left).astype(np.int64),
            "sum_w": (csum[right] - csum[left]).astype(np.int64)})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def type_concentration(sf_dir: str):
    """Per-user event-type concentration: n, distinct types, and the
    exact integer HHI numerator ``sum(cnt_t^2)`` (HHI = hhi_num / n^2 at
    presentation time — the engine never rounds a float).  In-batch
    Arrow count partials (cells, not raw events) ride the user-hash
    exchange; the kernel folds cells and squares."""
    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type"], P)
    partials = ds.map_batches(
        _count_partial_arrow(["user_id", "event_type"]),
        batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "n_types", "hhi_num"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        cell = (df.groupby(["user_id", "event_type"], sort=False)["cnt"]
                .sum().reset_index())
        g = cell.groupby("user_id", sort=False)["cnt"]
        out = g.agg(n="sum", n_types="size").reset_index()
        out["hhi_num"] = (cell.assign(sq=cell["cnt"] ** 2)
                          .groupby("user_id", sort=False)["sq"].sum()
                          .to_numpy())
        for c in ("n", "n_types", "hhi_num"):
            out[c] = out[c].astype(np.int64)
        return out[cols]

    return hash_exchange(partials, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def gini(sf_dir: str):
    """Per-user dispersion: the exact integer sum of pairwise absolute
    cent differences ``sum_{i<j} |c_i - c_j|`` via the sorted closed form
    ``sum_k c_(k) * (2k - n + 1)`` (0-indexed; tie order is irrelevant —
    equal values occupy a contiguous rank range whose coefficient total
    is fixed).  Gini = pairdiff_sum / (n^2 * mean) at presentation time.
    One lexsort + reduceat, vectorized over all users."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "sum_cents", "pairdiff_sum"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        u = df["user_id"].to_numpy()
        c = df["c"].to_numpy().astype(np.int64)
        order = np.lexsort((c, u))
        us, cs = u[order], c[order]
        change = np.concatenate(([True], us[1:] != us[:-1]))
        starts = np.flatnonzero(change)
        grp = np.cumsum(change) - 1
        n = np.diff(np.append(starts, len(us))).astype(np.int64)
        k = np.arange(len(cs), dtype=np.int64) - starts[grp]  # in-user rank
        coef = 2 * k - n[grp] + 1
        return pd.DataFrame({
            "user_id": us[starts], "n": n,
            "sum_cents": np.add.reduceat(cs, starts),
            "pairdiff_sum": np.add.reduceat(cs * coef, starts)})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def benford(sf_dir: str):
    """First-significant-digit audit per event type (Benford's-law data
    quality check): counts of the leading digit of ``|cents|`` (zero
    cents excluded — no leading digit).  The digit falls out of a
    vectorized halving loop (<= 13 iterations for int64 cents), partial
    cells combine per batch, and a tiny type-hash exchange folds them."""
    import pyarrow.compute as pc

    tune_context()
    ds = _read_events(sf_dir, ["event_type", "value"], _n_parts(sf_dir))
    P = 8

    def partial(t):
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(
            np.int64)
        d = np.abs(cents)
        keep = d > 0
        d = d[keep]
        while True:
            big = d >= 10
            if not big.any():
                break
            d[big] //= 10
        df = pd.DataFrame({
            "event_type": pc.cast(t["event_type"],
                                  "string").to_pandas()[keep],
            "digit": d})
        return (df.groupby(["event_type", "digit"], sort=False)
                .size().rename("cnt").reset_index())

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        h = h * np.uint64(31) + tbl.column("digit").to_numpy().astype(
            np.uint64)
        return (h % np.uint64(P)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_type", "digit", "cnt"]
        if len(df) == 0:
            return pd.DataFrame({
                "event_type": np.array([], dtype=object),
                "digit": np.array([], dtype=np.int64),
                "cnt": np.array([], dtype=np.int64)})[cols]
        out = (df.groupby(["event_type", "digit"], sort=False)["cnt"]
               .sum().reset_index())
        out["digit"] = out["digit"].astype(np.int64)
        out["cnt"] = out["cnt"].astype(np.int64)
        return out[cols]

    return hash_exchange(partials, key_fn=key_fn, n_parts=P, kernel=merge,
                         fmt="pandas")


def interarrival_hist(sf_dir: str):
    """Log2-bucketed inter-arrival histogram per event type: successive
    gaps between events of the same (user, type) in event-time order,
    bucket = floor(log2(gap_us)) (gap 0 excluded).  The bucket comes from
    ``np.frexp`` on the exact float64 image of the int64 gap (gaps are
    far below 2^53, and frexp's exponent is exact even AT powers of two
    where ``floor(log2(x))`` would be one ulp away).  User-hash exchange
    computes gaps; a tiny type-hash exchange folds the bucket cells."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "ts"], P)

    def to_rows(t):
        import pyarrow as pa

        return pa.table({
            "user_id": t.column("user_id"),
            "event_type": pc.cast(t["event_type"], "string"),
            "ts_us": pc.cast(t["ts"], "int64")})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def gaps_kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_type", "bucket", "cnt"]
        empty = pd.DataFrame({
            "event_type": np.array([], dtype=object),
            "bucket": np.array([], dtype=np.int64),
            "cnt": np.array([], dtype=np.int64)})[cols]
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "event_type", "ts_us"],
                            kind="stable")
        u = df["user_id"].to_numpy()
        et = df["event_type"].to_numpy()
        t = df["ts_us"].to_numpy().astype(np.int64)
        same = (u[1:] == u[:-1]) & (et[1:] == et[:-1])
        gap = (t[1:] - t[:-1])[same]
        ety = et[1:][same]
        pos = gap > 0
        gap, ety = gap[pos], ety[pos]
        if len(gap) == 0:
            return empty
        bucket = (np.frexp(gap.astype(np.float64))[1] - 1).astype(np.int64)
        out = (pd.DataFrame({"event_type": ety, "bucket": bucket})
               .groupby(["event_type", "bucket"], sort=False)
               .size().rename("cnt").reset_index())
        return out[cols]

    partials = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=gaps_kernel, fmt="pandas")
    P2 = 8

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        h = h * np.uint64(31) + tbl.column("bucket").to_numpy().astype(
            np.uint64)
        return (h % np.uint64(P2)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_type", "bucket", "cnt"]
        if len(df) == 0:
            return pd.DataFrame({
                "event_type": np.array([], dtype=object),
                "bucket": np.array([], dtype=np.int64),
                "cnt": np.array([], dtype=np.int64)})[cols]
        out = (df.groupby(["event_type", "bucket"], sort=False)["cnt"]
               .sum().reset_index())
        out["bucket"] = out["bucket"].astype(np.int64)
        out["cnt"] = out["cnt"].astype(np.int64)
        return out[cols]

    return hash_exchange(partials, key_fn=key_fn, n_parts=P2,
                         kernel=merge, fmt="pandas")


def peaks(sf_dir: str):
    """Per-user local-extrema census over the cents series in event-time
    order: interior points strictly above (peak) or below (valley) both
    neighbors.  Exact integer comparisons on half-away cents; one
    vectorized shift pass per partition, no per-user loop."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "n_peaks", "n_valleys"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        u = df["user_id"].to_numpy()
        c = df["c"].to_numpy().astype(np.int64)
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        starts = np.flatnonzero(new_user)
        bounds = np.append(starts, len(u))
        # interior = has a prev and a next row in the SAME user series
        interior = np.zeros(len(u), dtype=bool)
        interior[1:-1] = ~new_user[1:-1] & ~new_user[2:]
        pk = np.zeros(len(u), np.int64)
        vl = np.zeros(len(u), np.int64)
        ii = np.flatnonzero(interior)
        pk[ii] = (c[ii] > c[ii - 1]) & (c[ii] > c[ii + 1])
        vl[ii] = (c[ii] < c[ii - 1]) & (c[ii] < c[ii + 1])
        return pd.DataFrame({
            "user_id": u[starts],
            "n": np.diff(bounds).astype(np.int64),
            "n_peaks": np.add.reduceat(pk, starts).astype(np.int64),
            "n_valleys": np.add.reduceat(vl, starts).astype(np.int64),
        })[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def stickiness(sf_dir: str):
    """Monthly DAU/MAU stickiness audit in exact integers: per month, the
    sum of daily distinct users (``sum_dau``), the distinct users of the
    month (``mau``) and the active-day count — DAU/MAU is a presentation-
    time division.  Distinct (day, user) pairs dedupe partition-locally
    after the user-hash exchange (a user's rows co-locate, so partition
    counts ADD globally); day identity rides as (month, day) rows that
    the tiny month-hash final merge re-dedupes."""
    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["ts", "user_id"], P)

    def pair_partial(t):
        import pyarrow as pa

        day = (t.column("ts").to_numpy(zero_copy_only=False)
               .astype("datetime64[D]").astype(np.int64))
        uid = t.column("user_id").to_numpy(zero_copy_only=False)
        key = np.stack([day, uid])
        uniq = np.unique(key, axis=1)
        return pa.table({"day": uniq[0], "user_id": uniq[1]})

    pairs = ds.map_batches(pair_partial, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["month", "day", "du", "mu"]
        if len(df) == 0:
            return pd.DataFrame({"month": np.array([], dtype=object),
                                 "day": np.array([], np.int64),
                                 "du": np.array([], np.int64),
                                 "mu": np.array([], np.int64)})
        pair = df[["day", "user_id"]].drop_duplicates()
        month = (pd.to_datetime(pair["day"].to_numpy(), unit="D")
                 .strftime("%Y-%m"))
        pair = pd.DataFrame({"month": month, "day": pair["day"].to_numpy(),
                             "user_id": pair["user_id"].to_numpy()})
        du = (pair.groupby(["month", "day"], sort=False)["user_id"]
              .size().rename("du").reset_index())
        du["mu"] = 0
        mu = (pair[["month", "user_id"]].drop_duplicates()
              .groupby("month", sort=False)["user_id"].size()
              .rename("mu").reset_index())
        mu["day"] = -1
        mu["du"] = 0
        out = pd.concat([du, mu[["month", "day", "du", "mu"]]],
                        ignore_index=True)
        for c in ("day", "du", "mu"):
            out[c] = out[c].astype(np.int64)
        return out[cols]

    per_part = hash_exchange(pairs, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=kernel, fmt="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["month", "sum_dau", "mau", "n_days"]
        if len(df) == 0:
            return pd.DataFrame({"month": np.array([], dtype=object),
                                 **{c: np.array([], np.int64)
                                    for c in cols[1:]}})
        days = df.loc[df["day"] >= 0]
        g = days.groupby("month", sort=False)
        out = pd.DataFrame({
            "month": np.asarray(list(g.groups), dtype=object),
            "sum_dau": g["du"].sum().to_numpy(),
            "n_days": g["day"].nunique().to_numpy()})
        mau = (df.loc[df["day"] < 0].groupby("month", sort=False)["mu"]
               .sum())
        out["mau"] = out["month"].map(mau).to_numpy()
        for c in ("sum_dau", "mau", "n_days"):
            out[c] = out[c].astype(np.int64)
        return out[cols]

    def month_key(tbl):
        from ..util import arrow_key_ids

        return arrow_key_ids(tbl, ["month"], N_PARTS)

    return hash_exchange(per_part, key_fn=month_key, n_parts=N_PARTS,
                         kernel=merge, fmt="pandas")


def paa(sf_dir: str, k: int = 8):
    """Piecewise Aggregate Approximation (Keogh et al.): each user's
    event-time-ordered value series splits into ``k`` equal-count
    positional segments (``seg = idx·k // n`` — the ntile convention) and
    each segment reports its exact integer cent sum and count.  Callers
    divide for the classic PAA mean; the engine never rounds a float.
    One user-hash exchange of (user, ts, cents) rows; the kernel is one
    stable sort + reduceat over contiguous (user, seg) groups."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "seg", "n_pts", "sum_cents"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        u = df["user_id"].to_numpy()
        c = df["c"].to_numpy().astype(np.int64)
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        ustarts = np.flatnonzero(new_user)
        n_per = np.diff(np.append(ustarts, len(u))).astype(np.int64)
        start_of = np.repeat(ustarts, n_per)
        n_of = np.repeat(n_per, n_per)
        idx = np.arange(len(u), dtype=np.int64) - start_of
        seg = idx * k // n_of
        gstart = np.concatenate(
            ([True], new_user[1:] | (seg[1:] != seg[:-1])))
        gs = np.flatnonzero(gstart)
        return pd.DataFrame({
            "user_id": u[gs],
            "seg": seg[gs],
            "n_pts": np.diff(np.append(gs, len(u))).astype(np.int64),
            "sum_cents": np.add.reduceat(c, gs).astype(np.int64)})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def haar_8(sf_dir: str):
    """Unnormalized Haar wavelet decomposition of each user's 8-segment
    PAA sum vector (users with ≥ 8 events so every segment is non-empty):
    the approximation coefficient is the total, the detail coefficients
    are pairwise block differences at the three dyadic levels — all exact
    int64 sums/differences of cents (the usual 1/√2 scaling is a
    presentation-time constant).  Shares the :func:`paa` kernel shape;
    one user-hash exchange, per-user coefficients fold from the 8
    contiguous segment sums."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "a0", "d1", "d2_0", "d2_1",
                "d3_0", "d3_1", "d3_2", "d3_3"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        u = df["user_id"].to_numpy()
        c = df["c"].to_numpy().astype(np.int64)
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        ustarts = np.flatnonzero(new_user)
        n_per = np.diff(np.append(ustarts, len(u))).astype(np.int64)
        keep = n_per >= 8
        if not keep.any():
            return pd.DataFrame({col: np.array([], dtype=np.int64)
                                 for col in cols})
        start_of = np.repeat(ustarts, n_per)
        n_of = np.repeat(n_per, n_per)
        idx = np.arange(len(u), dtype=np.int64) - start_of
        seg = idx * 8 // n_of
        gstart = np.concatenate(
            ([True], new_user[1:] | (seg[1:] != seg[:-1])))
        gs = np.flatnonzero(gstart)
        sums = np.add.reduceat(c, gs)
        gu = u[gs]
        # users with ≥8 events contribute exactly 8 segment rows, in
        # seg order — reshape their contiguous block
        guserstart = np.concatenate(([True], gu[1:] != gu[:-1]))
        per_user_segs = np.diff(
            np.append(np.flatnonzero(guserstart), len(gu)))
        full = np.repeat(per_user_segs == 8, per_user_segs)
        s = sums[full].reshape(-1, 8)
        uid = gu[full][::8]
        b4 = s.reshape(-1, 4, 2).sum(axis=2)      # 4 blocks of 2
        b2 = b4.reshape(-1, 2, 2).sum(axis=2)     # 2 blocks of 4
        return pd.DataFrame({
            "user_id": uid,
            "a0": s.sum(axis=1),
            "d1": b2[:, 0] - b2[:, 1],
            "d2_0": b4[:, 0] - b4[:, 1],
            "d2_1": b4[:, 2] - b4[:, 3],
            "d3_0": s[:, 0] - s[:, 1],
            "d3_1": s[:, 2] - s[:, 3],
            "d3_2": s[:, 4] - s[:, 5],
            "d3_3": s[:, 6] - s[:, 7]})[cols].astype(np.int64)

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def sax_symbols(sf_dir: str, a: int = 4):
    """SAX-style symbolic discretization with rank (empirical-CDF)
    breakpoints instead of the classic Gaussian ones: each event's symbol
    is its value-rank quartile within the user (``sym = rank·a // n``,
    ties broken by timestamp so the order is total and exact), then per
    (user, symbol) the count and the number of time-order runs — the
    symbol histogram plus the temporal clustering signal.  Rank
    breakpoints keep every comparison on int64 (z-normalized Gaussian
    breakpoints would put values exactly on float boundaries).  One
    user-hash exchange; rank assignment is one lexsort scatter."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "sym", "n_pts", "n_runs"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        u = df["user_id"].to_numpy()
        ts = df["ts_us"].to_numpy().astype(np.int64)
        c = df["c"].to_numpy().astype(np.int64)
        new_user = np.concatenate(([True], u[1:] != u[:-1]))
        ustarts = np.flatnonzero(new_user)
        n_per = np.diff(np.append(ustarts, len(u))).astype(np.int64)
        start_of = np.repeat(ustarts, n_per)
        n_of = np.repeat(n_per, n_per)
        # value rank within user, ties by ts (rows are already in
        # (user, ts) order so the lexsort is stable on ties)
        vorder = np.lexsort((ts, c, u))
        rank = np.empty(len(u), dtype=np.int64)
        rank[vorder] = np.arange(len(u), dtype=np.int64) - start_of
        sym = rank * a // n_of
        # time-order runs of equal consecutive symbols per user
        run_start = new_user | np.concatenate(([True], sym[1:] != sym[:-1]))
        key = u * np.int64(a) + sym
        out = pd.DataFrame({"user_id": u, "sym": sym,
                            "rs": run_start.astype(np.int64), "key": key})
        g = out.groupby("key", sort=False)
        first = g[["user_id", "sym"]].first()
        return pd.DataFrame({
            "user_id": first["user_id"].to_numpy(),
            "sym": first["sym"].to_numpy(),
            "n_pts": g.size().to_numpy().astype(np.int64),
            "n_runs": g["rs"].sum().to_numpy().astype(np.int64)})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def pareto_curve(sf_dir: str):
    """Global Pareto (cumulative-share) curve: users ranked by total
    cents descending with the running cumulative total — "the top k users
    carry X % of volume".  This is an ORDERED GLOBAL PREFIX-SCAN, which
    the Dataset API cannot express, so after the per-user totals fold and
    the distributed sort it drops to raw Ray tasks (SURVEY §2 custom-
    operator route (c)): one tiny task per sorted block emits its (rows,
    sum) partial, the driver folds ≤ #blocks scalars into exclusive
    offsets (bounded driver materialization — one pair per BLOCK, never
    per row), and a second task wave adds rank/cumsum columns shifted by
    the block offset.  Partitioning assumption: `Dataset.sort` emits
    range-partitioned blocks whose concatenation IS the total order
    (ties broken by user_id, so the order is unique)."""
    import ray
    import ray.data

    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("user_id", sort=False)["c"].sum()
                .rename("tot_cents").reset_index())

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("user_id", sort=False)["tot_cents"].sum()
               .reset_index())
        out["tot_cents"] = out["tot_cents"].astype(np.int64)
        return out

    totals = hash_exchange(
        rows.map_batches(partial, batch_format="pandas"),
        key_fn=_user_key_fn(P), n_parts=P, kernel=merge, fmt="pandas")
    ordered = totals.sort(["tot_cents", "user_id"],
                          descending=[True, False]).materialize()
    refs = ordered.to_arrow_refs()

    @ray.remote
    def block_stats(tbl):
        import pyarrow.compute as _pc

        return (tbl.num_rows,
                int(_pc.sum(tbl["tot_cents"]).as_py() or 0))

    stats = ray.get([block_stats.remote(r) for r in refs])
    rank_off = np.concatenate(([0], np.cumsum([s[0] for s in stats])[:-1]))
    sum_off = np.concatenate(([0], np.cumsum([s[1] for s in stats])[:-1]))

    @ray.remote
    def with_scan(tbl, r0: int, s0: int):
        import pyarrow as _pa

        tot = tbl.column("tot_cents").to_numpy(zero_copy_only=False)
        rnk = np.arange(1, len(tot) + 1, dtype=np.int64) + np.int64(r0)
        cum = np.cumsum(tot, dtype=np.int64) + np.int64(s0)
        return _pa.table({
            "user_id": tbl.column("user_id"),
            "rnk": _pa.array(rnk),
            "tot_cents": tbl.column("tot_cents"),
            "cum_cents": _pa.array(cum)})

    out_refs = [with_scan.remote(r, int(ro), int(so))
                for r, ro, so in zip(refs, rank_off, sum_off)]
    return ray.data.from_arrow_refs(out_refs)


def user_lifecycle(sf_dir: str, churn_days: int = 30):
    """User lifecycle audit: first/last event time, active span, distinct
    active days and a churn flag (no activity in the trailing
    ``churn_days`` before the corpus max) — the lifecycle segmentation a
    growth dashboard runs.  Per-batch (user, min, max, day-set partials)
    fold through one user exchange; the corpus max folds from one row per
    partition (bounded driver scalar, the q15 discipline)."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts"], P)

    def to_rows(t):
        import pyarrow as pa

        ts_us = pc.cast(t["ts"], "int64")
        return pa.table({"user_id": t.column("user_id"), "ts_us": ts_us})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "first_ts_us", "last_ts_us", "n_events",
                "n_active_days"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        u = df["user_id"].to_numpy()
        t = df["ts_us"].to_numpy().astype(np.int64)
        day = t // np.int64(86_400_000_000)
        order = np.lexsort((day, u))
        us, ds_ = u[order], day[order]
        new_u = np.concatenate(([True], us[1:] != us[:-1]))
        new_day = new_u | np.concatenate(([True], ds_[1:] != ds_[:-1]))
        grp = np.cumsum(new_u) - 1
        g = pd.DataFrame({"u": u, "t": t}).groupby("u", sort=False)["t"]
        agg = g.agg(["min", "max", "size"]).reset_index()
        n_days = np.bincount(grp, weights=new_day).astype(np.int64)
        return pd.DataFrame({
            "user_id": us[new_u],
            "first_ts_us": agg.set_index("u").loc[us[new_u], "min"]
            .to_numpy().astype(np.int64),
            "last_ts_us": agg.set_index("u").loc[us[new_u], "max"]
            .to_numpy().astype(np.int64),
            "n_events": agg.set_index("u").loc[us[new_u], "size"]
            .to_numpy().astype(np.int64),
            "n_active_days": n_days})[cols]

    per_user = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=kernel, fmt="pandas").materialize()

    part_max = per_user.map_batches(
        lambda df: pd.DataFrame(
            {"m": [df["last_ts_us"].max() if len(df) else -1]}),
        batch_format="pandas")
    corpus_max = max(r["m"] for r in part_max.take_all())
    cut = np.int64(corpus_max) - np.int64(churn_days) * 86_400_000_000

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy()
        out["churned"] = (out["last_ts_us"].to_numpy()
                          < cut).astype(np.int64)
        return out

    return per_user.map_batches(flag, batch_format="pandas")


def type_counts_cms(sf_dir: str, d: int = 4, w: int = 256):
    """Event-type counts via a COUNT-MIN sketch — the fourth mergeable
    sketch family (after KLL quantiles, KMV distinct, Misra-Gries heavy
    hitters): each batch folds to ≤ d·w flat (r, c, cnt) cells, partials
    merge by plain addition (CMS is linear), and the point query takes
    the min over rows.  EXACT whenever an item has ≥1 collision-free row
    — which w ≫ distinct types guarantees here (deterministic seeds, so
    exactness is a property of the key set, verified by the count(*)
    oracle); the εN overestimate bound is gated in tests."""
    from ..stages.sketch import cms_estimate, cms_rows

    tune_context()
    ds = _read_events(sf_dir, ["event_type"], _n_parts(sf_dir))

    partials = ds.map_batches(
        lambda df: cms_rows(df, item_col="event_type", d=d, w=w),
        batch_format="pandas")
    types = ds.map_batches(
        lambda df: pd.DataFrame(
            {"event_type": pd.unique(df["event_type"])}),
        batch_format="pandas")

    def kernel(cms: pd.DataFrame, ty: pd.DataFrame) -> pd.DataFrame:
        merged = (cms.groupby(["r", "c"], sort=False)["cnt"].sum()
                  .reset_index())
        items = np.unique(ty["event_type"].to_numpy())
        est = cms_estimate(merged, items, d=d, w=w)
        return pd.DataFrame({"event_type": items,
                             "est_count": est.astype(np.int64)})

    from ..stages.exchange import hash_exchange_multi

    zero = lambda t: np.zeros(t.num_rows, dtype=np.int64)  # noqa: E731
    return hash_exchange_multi(
        [(partials, zero), (types, zero)], n_parts=1, kernel=kernel,
        fmt="pandas")


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def type_pivot(sf_dir: str):
    """PIVOT reshape: one row per user with one count column per event
    type (the wide feature-matrix layout a model-training join wants).
    The pivot column set is a FIXED schema contract (``PIVOT_TYPES``) —
    at 100 TB a discover-then-pivot would need a driver round-trip for
    the column universe, so the engine pins it like any other schema.
    Per-batch (user, type) count partials fold through one user exchange;
    the kernel scatters counts into the fixed columns vectorized."""
    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type"], P)

    def partial(tbl):
        import pyarrow as pa

        out = tbl.group_by(["user_id", "event_type"]).aggregate(
            [("user_id", "count")])
        return pa.table({"user_id": out["user_id"],
                         "event_type": out["event_type"],
                         "n": out["user_id_count"]})

    rows = ds.map_batches(partial, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id"] + [f"n_{t}" for t in PIVOT_TYPES]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in cols})
        g = (df.groupby(["user_id", "event_type"], sort=False)["n"].sum()
             .reset_index())
        users, uinv = np.unique(g["user_id"].to_numpy(), return_inverse=True)
        out = {"user_id": users}
        et = g["event_type"].to_numpy()
        n = g["n"].to_numpy()
        for t in PIVOT_TYPES:
            m = et == t
            col = np.zeros(len(users), dtype=np.int64)
            np.add.at(col, uinv[m], n[m])
            out[f"n_{t}"] = col
        return pd.DataFrame(out)[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def streaming_window_agg(sf_dir: str, n_actors: int = 4,
                         tier: str = "1h"):
    """STREAMING WINDOWED AGGREGATION gate — the emit-on-watermark
    semantics the encode gates don't exercise: events stream through a
    ``_WindowAggCore`` actor pool in event-time order; each tumbling
    window FINALIZES (and leaves actor memory) the moment its series'
    watermark passes the window end, so open state is bounded by
    windows-in-flight, never stream length.  A runtime assert proves
    most windows really emitted early (watermark-triggered, not at
    seal); with in-order arrival nothing can be late (asserted too).
    The sealed result must equal the batch tumbling aggregate — exact
    integer cents, same SQL oracle shape as the rollup family."""
    import ray.data

    from ..state.streaming import (StreamingRouter, _WindowAggCore,
                                   feed_parquet_distributed)

    tune_context()
    window_ms = TIER_MS[tier]
    router = StreamingRouter(n_actors=n_actors,
                             actor_core=_WindowAggCore,
                             core_args=(window_ms, 0))
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    feed_parquet_distributed(router, path, order_cols=["ts_ms"])
    rows = pd.DataFrame(router.seal())
    stats = router.stats()
    if stats["late"] != 0:
        raise RuntimeError(
            f"in-order feed must drop nothing, got {stats['late']} late")
    if len(rows) and stats["early_emitted"] == 0:
        raise RuntimeError("no window emitted on watermark — the "
                           "streaming semantics did not engage")

    if len(rows) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "window_ms": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
            "cnt": pd.Series([], dtype=np.int64),
            "min_c": pd.Series([], dtype=np.int64),
            "max_c": pd.Series([], dtype=np.int64)}))
    out = pd.DataFrame({
        "user_id": rows["key"].astype(np.int64),
        "window_ms": rows["window_ms"].astype(np.int64),
        "sum_cents": rows["sum_cents"].astype(np.int64),
        "cnt": rows["cnt"].astype(np.int64),
        "min_c": rows["min_c"].astype(np.int64),
        "max_c": rows["max_c"].astype(np.int64)})
    return ray.data.from_pandas(out)


def streaming_window_out_of_order(sf_dir: str, n_actors: int = 4,
                                  tier: str = "1h"):
    """Out-of-order STREAMING WINDOW gate: events arrive in the
    deterministic scrambled order (sorted by (value, ts) — thoroughly out
    of time order), so the window-agg watermark DROPS every row whose
    window lies before the running-max-timestamp boundary of its series'
    earlier arrivals.  The drop rule is SEQUENTIAL (batch-size-invariant,
    pytest-pinned), so the accepted set — and therefore the sealed
    aggregate — is exactly SQL-expressible with a running max over the
    same arrival order.  This gates the late-data path of the windowed
    aggregation the way ``events_streaming_out_of_order`` gates the
    encoder's."""
    import ray.data

    from ..state.streaming import (StreamingRouter, _WindowAggCore,
                                   feed_parquet_distributed)

    tune_context()
    window_ms = TIER_MS[tier]
    router = StreamingRouter(n_actors=n_actors,
                             actor_core=_WindowAggCore,
                             core_args=(window_ms, 0))
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    feed_parquet_distributed(router, path, order_cols=["value", "ts_ms"])
    rows = pd.DataFrame(router.seal())
    stats = router.stats()
    if len(rows) and stats["late"] == 0:
        raise RuntimeError("scrambled arrival produced no late drops — "
                           "the out-of-order path did not engage")

    if len(rows) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "window_ms": pd.Series([], dtype=np.int64),
            "sum_cents": pd.Series([], dtype=np.int64),
            "cnt": pd.Series([], dtype=np.int64)}))
    out = pd.DataFrame({
        "user_id": rows["key"].astype(np.int64),
        "window_ms": rows["window_ms"].astype(np.int64),
        "sum_cents": rows["sum_cents"].astype(np.int64),
        "cnt": rows["cnt"].astype(np.int64)})
    return ray.data.from_pandas(out)


def session_paths(sf_dir: str, gap_ms: int = 1_800_000, k_path: int = 3):
    """Session PATH analysis (the Sankey / user-journey shape): sessions
    are 30-min-gap islands (the :func:`sessionize` discipline), each
    session's path is its first ``k_path`` event types joined by ``>``,
    and the output counts sessions per path.  Users are partition-
    disjoint after the user exchange, so per-partition path counts add;
    path building is vectorized (np.select over the ≤3 gathered type
    columns — no per-session Python)."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "ts"], P)

    def to_rows(t):
        import pyarrow as pa

        return pa.table({
            "user_id": t.column("user_id"),
            "event_type": pc.cast(t["event_type"], "string"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["path", "n_sessions"]
        if len(df) == 0:
            return pd.DataFrame({"path": np.array([], dtype=object),
                                 "n_sessions": np.array([], np.int64)})
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy()
        t = df["ts_ms"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        new_u = np.concatenate(([True], u[1:] != u[:-1]))
        brk = new_u | np.concatenate(([True], (t[1:] - t[:-1]) > gap_ms))
        starts = np.flatnonzero(brk)
        sizes = np.diff(np.append(starts, len(u))).astype(np.int64)
        take = np.minimum(sizes, k_path)
        t0 = et[starts]
        t1 = np.where(take >= 2, et[np.minimum(starts + 1, len(u) - 1)],
                      "")
        t2 = np.where(take >= 3, et[np.minimum(starts + 2, len(u) - 1)],
                      "")
        s0 = pd.Series(t0, dtype=object)
        paths = np.select(
            [take >= 3, take == 2],
            [s0 + ">" + pd.Series(t1, dtype=object)
             + ">" + pd.Series(t2, dtype=object),
             s0 + ">" + pd.Series(t1, dtype=object)],
            default=s0)
        out = (pd.DataFrame({"path": paths})
               .groupby("path", sort=False).size().rename("n_sessions")
               .reset_index())
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        return out[cols]

    partials = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=kernel, fmt="pandas")

    def path_key(tbl):
        from ..util import arrow_key_ids

        return arrow_key_ids(tbl, ["path"], 8)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("path", sort=False)["n_sessions"].sum()
               .reset_index())
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=path_key, n_parts=8,
                         kernel=merge, fmt="pandas")


def markov_transitions(sf_dir: str, gap_ms: int = 1_800_000):
    """First-order Markov model of the event stream: counts of consecutive
    ``from_type → to_type`` transitions WITHIN a session (same user, gap ≤
    ``gap_ms``).  Output carries exact integers only — ``n`` (pair count)
    and ``row_total`` (all transitions leaving ``from_type``), so the
    transition probability ``n / row_total`` is a consumer-side rational
    and the oracle never compares floats.  Users are partition-disjoint
    after the user exchange so per-partition pair counts add; the merge
    exchange is keyed on ``from_type`` alone, which co-locates each row of
    the transition matrix and makes ``row_total`` a local sum."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "ts"], P)

    def to_rows(t):
        import pyarrow as pa

        return pa.table({
            "user_id": t.column("user_id"),
            "event_type": pc.cast(t["event_type"], "string"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["from_type", "to_type", "n"]
        if len(df) == 0:
            return pd.DataFrame({"from_type": np.array([], dtype=object),
                                 "to_type": np.array([], dtype=object),
                                 "n": np.array([], np.int64)})
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy()
        t = df["ts_ms"].to_numpy().astype(np.int64)
        codes, types = pd.factorize(df["event_type"].to_numpy())
        # adjacent pair is a transition iff same user AND gap within session
        ok = (u[1:] == u[:-1]) & ((t[1:] - t[:-1]) <= gap_ms)
        if not ok.any():
            return pd.DataFrame({"from_type": np.array([], dtype=object),
                                 "to_type": np.array([], dtype=object),
                                 "n": np.array([], np.int64)})
        k = len(types)
        pair = codes[:-1][ok].astype(np.int64) * k + codes[1:][ok]
        cnt = np.bincount(pair, minlength=k * k).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({
            "from_type": types[nz // k],
            "to_type": types[nz % k],
            "n": cnt[nz]})[cols]

    partials = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=kernel, fmt="pandas")

    def from_key(tbl):
        from ..util import arrow_key_ids

        return arrow_key_ids(tbl, ["from_type"], 8)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["from_type", "to_type"], sort=False)["n"].sum()
               .reset_index())
        out["n"] = out["n"].astype(np.int64)
        # every pair with this from_type is in this partition: local sum
        out["row_total"] = (out.groupby("from_type", sort=False)["n"]
                            .transform("sum").astype(np.int64))
        return out

    return hash_exchange(partials, key_fn=from_key, n_parts=8,
                         kernel=merge, fmt="pandas")


def cooccurrence_pairs(sf_dir: str, gap_ms: int = 1_800_000):
    """Market-basket co-occurrence over sessions: each 30-min-gap session
    is a basket of DISTINCT event types; the output counts, for every
    unordered type pair ``(type_a < type_b)``, the number of sessions
    containing both (``support``).  Pair expansion is vectorized by
    stride: for each offset ``d`` the pair ``(x[i], x[i+d])`` is emitted
    where both land in the same session's sorted-unique type list — the
    loop runs over d ≤ max basket size (≤ #types, a constant), never over
    sessions or rows."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "ts"], P)

    def to_rows(t):
        import pyarrow as pa

        return pa.table({
            "user_id": t.column("user_id"),
            "event_type": pc.cast(t["event_type"], "string"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"type_a": np.array([], dtype=object),
                              "type_b": np.array([], dtype=object),
                              "support": np.array([], np.int64)})
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy()
        t = df["ts_ms"].to_numpy().astype(np.int64)
        # SORTED codes (np.unique, not factorize): code order must be
        # lexicographic so the emitted (type_a < type_b) orientation is
        # identical in every partition — factorize's first-appearance
        # order would flip pairs between partitions and break the merge.
        types, codes = np.unique(df["event_type"].to_numpy(),
                                 return_inverse=True)
        brk = np.concatenate(([True], (u[1:] != u[:-1])
                              | ((t[1:] - t[:-1]) > gap_ms)))
        sess = np.cumsum(brk) - 1
        # distinct (session, code), sorted by code within session
        key = sess.astype(np.int64) * len(types) + codes
        uk = np.unique(key)
        s_id, c_id = uk // len(types), uk % len(types)
        # stride-d pair expansion within each session's sorted code run
        parts_a, parts_b = [], []
        d = 1
        while True:
            same = s_id[d:] == s_id[:-d] if d < len(s_id) else np.array(
                [], dtype=bool)
            if not same.any():
                break
            parts_a.append(c_id[:-d][same])
            parts_b.append(c_id[d:][same])
            d += 1
        if not parts_a:
            return empty
        a = np.concatenate(parts_a)
        b = np.concatenate(parts_b)
        pair = a * len(types) + b
        cnt = np.bincount(pair, minlength=len(types) ** 2).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pd.DataFrame({"type_a": types[nz // len(types)],
                             "type_b": types[nz % len(types)],
                             "support": cnt[nz]})

    partials = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=kernel, fmt="pandas")

    def pair_key(tbl):
        from ..util import arrow_key_ids

        return arrow_key_ids(tbl, ["type_a", "type_b"], 8)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["type_a", "type_b"], sort=False)["support"]
               .sum().reset_index())
        out["support"] = out["support"].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=pair_key, n_parts=8,
                         kernel=merge, fmt="pandas")


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Branchless vectorized bit length of uint64 (0 → 0).  float log2 is
    NOT safe here: the register suffix has up to 55 bits > the 53-bit
    double mantissa, so boundary values round the wrong way."""
    w = w.astype(np.uint64, copy=True)
    n = np.zeros(w.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        big = w >= (np.uint64(1) << np.uint64(s))
        n += np.where(big, s, 0)
        w = np.where(big, w >> np.uint64(s), w)
    return n + (w > 0)


def hll_distinct_users(sf_dir: str, p: int = 9):
    """HyperLogLog registers for distinct users per event type — the fifth
    mergeable sketch family (KLL / KMV / Misra-Gries / count-min are the
    others).  Output is the exact register table ``(event_type, bucket,
    max_rho)``: bucket = top ``p`` hash bits, rho = leading-zero count of
    the remaining ``64-p`` bits + 1.  The hash is md5 of the decimal
    user_id (little-endian first 8 digest bytes == DuckDB
    ``md5_number_upper``), so the oracle reproduces every register
    exactly; the float ESTIMATE is a consumer-side formula checked in
    pytest against the exact distinct count.  Registers are idempotent
    max-mergeable, so the partial per batch is a ≤ types×2^p row table no
    matter the input size — the whole point of the sketch at 100 TB:
    distinct-count with no id shuffle."""
    import hashlib

    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type"], P)
    shift = np.uint64(64 - p)
    mask = (np.uint64(1) << shift) - np.uint64(1)

    def partial(t) -> pd.DataFrame:
        uid = t.column("user_id").to_numpy()
        # np.unique keeps types/codes aligned by construction —
        # dictionary_encode indices vs pc.unique value order are NOT
        # guaranteed to agree when the parquet column arrives
        # dictionary-encoded.
        et_np = np.asarray(
            pc.cast(t.column("event_type"), "string").combine_chunks())
        types, codes = np.unique(et_np, return_inverse=True)
        # md5 only the unique users of the batch, then gather
        uniq, inv = np.unique(uid, return_inverse=True)
        h_uniq = np.fromiter(
            (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8],
                            "little") for v in uniq),
            dtype=np.uint64, count=len(uniq))
        h = h_uniq[inv]
        bucket = (h >> shift).astype(np.int64)
        rho = (int(shift) + 1 - _bitlen_u64(h & mask)).astype(np.int64)
        reg = np.zeros((len(types), 1 << p), np.int64)
        np.maximum.at(reg, (codes.astype(np.int64), bucket), rho)
        tc, bc = np.nonzero(reg)
        return pd.DataFrame({"event_type": types[tc], "bucket": bc,
                             "max_rho": reg[tc, bc]})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def type_key(tbl):
        from ..util import arrow_key_ids

        return arrow_key_ids(tbl, ["event_type"], 8)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["event_type", "bucket"], sort=False)["max_rho"]
               .max().reset_index())
        out["bucket"] = out["bucket"].astype(np.int64)
        out["max_rho"] = out["max_rho"].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=type_key, n_parts=8,
                         kernel=merge, fmt="pandas")


def hll_estimate(reg_df: "pd.DataFrame", p: int = 9) -> "pd.DataFrame":
    """Consumer-side HLL estimate from :func:`hll_distinct_users` register
    rows (Flajolet et al. 2007 with the standard small-range linear
    counting correction).  Kept OUT of the oracle-checked surface — the
    harmonic-mean float sum is summation-order-sensitive cross-engine."""
    m = 1 << p
    alpha = 0.7213 / (1 + 1.079 / m)
    out = []
    for et, g in reg_df.groupby("event_type", sort=False):
        regs = np.zeros(m, np.int64)
        regs[g["bucket"].to_numpy()] = g["max_rho"].to_numpy()
        e = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if e <= 2.5 * m and zeros:
            e = m * np.log(m / zeros)
        out.append((et, float(e)))
    return pd.DataFrame(out, columns=["event_type", "estimate"])


def crosscorr_1h(sf_dir: str, max_lag: int = 3):
    """Lagged cross-correlation NUMERATORS between hourly event-count
    series: for every ordered type pair and lag ``k ∈ [0, max_lag]``,
    ``dot = Σ_t cnt_a(t)·cnt_b(t+k)`` over epoch hours.  Counts (not
    values) keep the products exact in int64; the normalized correlation
    is a consumer-side division.  The distributed phase reduces the
    stream to the (type, hour) count table — bounded by calendar span ×
    type cardinality, NOT input size — so the final T×T×lag matmul runs
    on a one-partition kernel over a tiny table.  Pairs whose series
    never overlap within the lag (dot = 0) are omitted, matching the SQL
    join."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_type", "ts"], P)

    def partial(t) -> pd.DataFrame:
        h = np.asarray(pc.cast(t["ts"], "int64")) // 3_600_000_000
        et = np.asarray(pc.cast(t["event_type"], "string").combine_chunks())
        types, codes = np.unique(et, return_inverse=True)
        h0 = h.min()
        key = codes.astype(np.int64) * (h.max() - h0 + 1) + (h - h0)
        uk, cnt = np.unique(key, return_counts=True)
        span = h.max() - h0 + 1
        return pd.DataFrame({"event_type": types[uk // span],
                             "h": (uk % span) + h0,
                             "n": cnt.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def th_key(tbl):
        from ..util import arrow_key_ids

        return arrow_key_ids(tbl, ["event_type", "h"], 8)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["event_type", "h"], sort=False)["n"].sum()
               .reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    counts = hash_exchange(partials, key_fn=th_key, n_parts=8,
                           kernel=merge, fmt="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["type_a", "type_b", "lag", "dot"]
        if len(df) == 0:
            return pd.DataFrame({"type_a": np.array([], dtype=object),
                                 "type_b": np.array([], dtype=object),
                                 "lag": np.array([], np.int64),
                                 "dot": np.array([], np.int64)})
        piv = (df.pivot_table(index="h", columns="event_type", values="n",
                              aggfunc="sum", fill_value=0)
               .sort_index())
        H = piv.to_numpy().astype(np.int64)          # hours × types
        # reindex to a dense hour axis so lag k really means k HOURS
        hours = piv.index.to_numpy().astype(np.int64)
        dense = np.zeros((hours.max() - hours.min() + 1, H.shape[1]),
                         np.int64)
        dense[hours - hours.min()] = H
        types = np.asarray(piv.columns, dtype=object)
        out = {"type_a": [], "type_b": [], "lag": [], "dot": []}
        for k in range(max_lag + 1):
            D = (dense[:-k].T @ dense[k:]) if k else (dense.T @ dense)
            ia, ib = np.nonzero(D)
            out["type_a"].extend(types[ia])
            out["type_b"].extend(types[ib])
            out["lag"].extend([k] * len(ia))
            out["dot"].extend(D[ia, ib])
        res = pd.DataFrame(out)
        res["lag"] = res["lag"].astype(np.int64)
        res["dot"] = res["dot"].astype(np.int64)
        return res[cols]

    return hash_exchange(
        counts, key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1, kernel=final, fmt="pandas")


def user_day_bitmaps(sf_dir: str):
    """Per-user activity BITMAP INDEX (the roaring-bitmap audience-
    segmentation shape): each user's active epoch-days pack into 32-bit
    words — ``word_idx = day // 32``, ``bits = OR of 1 << (day % 32)``.
    32-bit words (not 64) keep every value below DuckDB's BIGINT bit-63
    overflow (CLAUDE.md gotcha).  Bitmaps are idempotent OR-mergeable, so
    per-batch partials are bounded by users × active-words regardless of
    event volume, and the user-keyed exchange merges with a plain
    group-OR."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts"], P)

    def partial(t) -> pd.DataFrame:
        uid = t.column("user_id").to_numpy()
        day = np.asarray(pc.cast(t["ts"], "int64")) // 86_400_000_000
        # distinct (user, day): epoch day < 2**21 forever-practical,
        # user_id < 2**42 — pack injectively
        key = uid.astype(np.int64) * (1 << 21) + day
        uk = np.unique(key)
        u, d = uk >> 21, uk & ((1 << 21) - 1)
        word, bit = d >> 5, (d & 31).astype(np.int64)
        cell = (u << 16) | word          # word_idx < 2**16 (epoch day/32)
        order = np.argsort(cell, kind="stable")
        cell, bitv = cell[order], (np.int64(1) << bit[order])
        starts = np.flatnonzero(
            np.concatenate(([True], cell[1:] != cell[:-1])))
        bits = np.bitwise_or.reduceat(bitv, starts)
        cu = cell[starts]
        return pd.DataFrame({"user_id": cu >> 16,
                             "word_idx": (cu & 0xFFFF).astype(np.int64),
                             "bits": bits.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["user_id", "word_idx"], sort=False)["bits"]
               .agg(lambda s: np.bitwise_or.reduce(s.to_numpy()))
               .reset_index())
        out["bits"] = out["bits"].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def streaming_sessionize(sf_dir: str, n_actors: int = 4,
                         gap_ms: int = 1_800_000):
    """STREAMING SESSION-WINDOW gate — the data-dependent-boundary case
    tumbling windows don't exercise: events stream through a
    ``_SessionWindowCore`` actor pool in event-time order; a session
    FINALIZES the moment an arrival's gap exceeds ``gap_ms`` (emit-on-
    arrival), so each series holds at most ONE open session regardless
    of stream length.  Runtime asserts: in-order feed drops nothing, and
    most sessions emitted early (on arrival, not at seal).  The sealed
    result must equal the batch 30-min sessionize."""
    import ray.data

    from ..state.streaming import (StreamingRouter, _SessionWindowCore,
                                   feed_parquet_distributed)

    tune_context()
    router = StreamingRouter(n_actors=n_actors,
                             actor_core=_SessionWindowCore,
                             core_args=(gap_ms,))
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    feed_parquet_distributed(router, path, order_cols=["ts_ms"])
    rows = pd.DataFrame(router.seal())
    stats = router.stats()
    if stats["late"] != 0:
        raise RuntimeError(
            f"in-order feed must drop nothing, got {stats['late']} late")
    if len(rows) > 2 * stats["open_blocks"] and stats["early_emitted"] == 0:
        raise RuntimeError("no session emitted on arrival — the "
                           "streaming semantics did not engage")

    if len(rows) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "user_id": pd.Series([], dtype=np.int64),
            "session_seq": pd.Series([], dtype=np.int64),
            "session_start": pd.Series([], dtype=np.int64),
            "session_end": pd.Series([], dtype=np.int64),
            "n_events": pd.Series([], dtype=np.int64)}))
    out = pd.DataFrame({
        "user_id": rows["key"].astype(np.int64),
        "session_seq": rows["session_seq"].astype(np.int64),
        "session_start": rows["session_start"].astype(np.int64),
        "session_end": rows["session_end"].astype(np.int64),
        "n_events": rows["n_events"].astype(np.int64)})
    return ray.data.from_pandas(out)


def kmv_set_ops(sf_dir: str, k: int = 1024):
    """KMV sketch SET ALGEBRA — the composability payoff of mergeable
    sketches: per unordered type pair, distinct-user estimates for the
    UNION (merge both sketches, keep k smallest) and the INTERSECTION
    (inclusion–exclusion over the three estimates).  splitmix64 is a
    bijection, so below capacity every estimate is EXACT (distinct hashes
    ↔ distinct users) — which holds at driver scale, hence the
    ``count(DISTINCT)``/INTERSECT oracle (the ``type_user_counts_sketch``
    discipline); above capacity the (k−1)/U_(k) estimator takes over.
    The exchange carries ≤ k hash rows per type regardless of user count
    — set operations over 100 TB of ids without ever shuffling ids."""
    from ..stages.sketch import kmv_rows

    tune_context()
    P = 8
    ds = _read_events(sf_dir, ["event_type", "user_id"], _n_parts(sf_dir))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(event_type=df["event_type"].astype(str))
        return kmv_rows(df, key_col="event_type", value_col="user_id",
                        k=k)

    partials = ds.map_batches(partial, batch_format="pandas")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        return (h % np.uint64(P)).astype(np.int64)

    merged = hash_exchange(
        partials, key_fn=key_fn, n_parts=P,
        kernel=lambda df: kmv_rows(df, key_col="event_type", value_col="h",
                                   k=k, hashed=True),
        fmt="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["type_a", "type_b", "n_a", "n_b", "n_union", "n_inter"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array(
                [], dtype=object if c.startswith("type") else np.int64)
                for c in cols})
        types = np.sort(df["event_type"].unique())
        regs = {t: np.sort(df.loc[df["event_type"] == t, "h"]
                           .to_numpy(dtype=np.uint64)) for t in types}

        def est(h: np.ndarray) -> int:
            if len(h) < k:
                return int(len(h))
            u = (h[k - 1].astype(np.float64) + 1.0) / 2.0 ** 64
            return int(round((k - 1) / u))

        out = {c: [] for c in cols}
        for i in range(len(types)):
            for j in range(i + 1, len(types)):
                a, b = regs[types[i]], regs[types[j]]
                union = np.union1d(a, b)[:k]
                na, nb, nu = est(a), est(b), est(union)
                out["type_a"].append(types[i])
                out["type_b"].append(types[j])
                out["n_a"].append(na)
                out["n_b"].append(nb)
                out["n_union"].append(nu)
                out["n_inter"].append(max(na + nb - nu, 0))
        res = pd.DataFrame(out)
        for c in cols[2:]:
            res[c] = res[c].astype(np.int64)
        return res[cols]

    return hash_exchange(
        merged, key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1, kernel=final, fmt="pandas")


def attribution_last_touch(sf_dir: str, gap_ms: int = 1_800_000,
                           target: str = "purchase"):
    """LAST-TOUCH revenue attribution: every ``target`` event's cents are
    credited to the event type immediately preceding it in the same
    30-min session (``'direct'`` when the purchase opens its session).
    Exact integer cents; users are partition-disjoint after the user
    exchange so per-partition credit sums add."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "ts", "value"], P)

    def to_rows(t):
        import pyarrow as pa

        val = t.column("value").to_numpy()
        cents = (np.sign(val)
                 * np.floor(np.abs(val) * 100 + 0.5)).astype(np.int64)
        return pa.table({
            "user_id": t.column("user_id"),
            "event_type": pc.cast(t["event_type"], "string"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000),
            "cents": pa.array(cents)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["attr_type", "n_purchases", "cents"]
        empty = pd.DataFrame({"attr_type": np.array([], dtype=object),
                              "n_purchases": np.array([], np.int64),
                              "cents": np.array([], np.int64)})
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy()
        t = df["ts_ms"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        cents = df["cents"].to_numpy()
        in_sess = np.concatenate(([False], (u[1:] == u[:-1])
                                  & ((t[1:] - t[:-1]) <= gap_ms)))
        prev = np.concatenate(([""], et[:-1]))
        attr = np.where(in_sess, prev, "direct").astype(object)
        hit = et == target
        if not hit.any():
            return empty
        g = (pd.DataFrame({"attr_type": attr[hit], "cents": cents[hit]})
             .groupby("attr_type", sort=False)
             .agg(n_purchases=("cents", "size"), cents=("cents", "sum"))
             .reset_index())
        g["n_purchases"] = g["n_purchases"].astype(np.int64)
        g["cents"] = g["cents"].astype(np.int64)
        return g[cols]

    partials = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=kernel, fmt="pandas")

    def attr_key(tbl):
        from ..util import arrow_key_ids

        return arrow_key_ids(tbl, ["attr_type"], 8)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("attr_type", sort=False)
               .agg(n_purchases=("n_purchases", "sum"),
                    cents=("cents", "sum")).reset_index())
        out["n_purchases"] = out["n_purchases"].astype(np.int64)
        out["cents"] = out["cents"].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=attr_key, n_parts=8,
                         kernel=merge, fmt="pandas")


def lttb(sf_dir: str, n_buckets: int = 8):
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013) —
    the visualization downsampler M4 doesn't cover: per user, the first
    and last points anchor the series, the interior splits into
    ``n_buckets`` equal-COUNT buckets, and each bucket keeps the point
    maximizing the triangle area against the PREVIOUS SELECTION and the
    next bucket's average — an inherently SEQUENTIAL per-series
    recurrence (like the DFCM predictor), parallel ACROSS series via the
    user exchange.  Exactness discipline: x = seconds rebased to the
    series start, y = cents, the area comparison is the exact integer
    cross product scaled by the next bucket's count (avoids the rational
    average), ties break to the smallest x — so the selection mirrors to
    a recursive SQL CTE verbatim.  int64 area bound: span_sec × cents ×
    bucket_count must stay below 2^63 (holds through sf8 by ~4 orders;
    the SQL side is HUGEINT-exact regardless).  Output: the 8 interior
    selections per series (b = 0..7); series with ≤ 2 points have no
    interior and emit nothing."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "value"], P)

    def to_rows(t):
        import pyarrow as pa

        val = t.column("value").to_numpy()
        cents = (np.sign(val)
                 * np.floor(np.abs(val) * 100 + 0.5)).astype(np.int64)
        return pa.table({
            "user_id": t.column("user_id"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000),
            "cents": pa.array(cents)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "b", "sel_x", "sel_y"]
        empty = pd.DataFrame({c: np.array([], np.int64) for c in cols})
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy()
        t = df["ts_ms"].to_numpy().astype(np.int64)
        y = df["cents"].to_numpy().astype(np.int64)
        starts = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        ends = np.append(starts[1:], len(u))
        out = {c: [] for c in cols}
        for s0, s1 in zip(starts, ends):
            n = s1 - s0
            if n <= 2:
                continue
            x = (t[s0:s1] - t[s0]) // 1000
            yy = y[s0:s1]
            # interior indices 1..n-2 -> bucket ((rn-2)*B)//(n-2), rn=i+1
            ii = np.arange(1, n - 1)
            b = ((ii - 1) * n_buckets) // (n - 2)
            bs = np.searchsorted(b, np.arange(n_buckets))
            be = np.searchsorted(b, np.arange(n_buckets), side="right")
            ax, ay = int(x[0]), int(yy[0])
            for bi in range(n_buckets):
                lo, hi = bs[bi], be[bi]
                if lo == hi:
                    break                      # chain stops, like the CTE
                if bi + 1 < n_buckets:
                    if be[bi + 1] == bs[bi + 1]:
                        break   # empty NEXT bucket stops the chain too
                    nx = ii[bs[bi + 1]:be[bi + 1]]
                    sx, sy = int(x[nx].sum()), int(yy[nx].sum())
                    cnt = len(nx)
                else:
                    sx, sy, cnt = int(x[-1]), int(yy[-1]), 1
                cx = x[ii[lo:hi]].astype(np.int64)
                cy = yy[ii[lo:hi]].astype(np.int64)
                area = np.abs((ax * cnt - sx) * (cy - ay)
                              - (ax - cx) * (sy - ay * cnt))
                j = int(np.argmax(area))       # first max = smallest x
                ax, ay = int(cx[j]), int(cy[j])
                out["user_id"].append(int(u[s0]))
                out["b"].append(bi)
                out["sel_x"].append(ax)
                out["sel_y"].append(ay)
        if not out["user_id"]:
            return empty
        res = pd.DataFrame(out)
        for c in cols:
            res[c] = res[c].astype(np.int64)
        return res

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def running_distinct(sf_dir: str):
    """Cumulative distinct users per active day — the "total audience so
    far" growth curve.  Running COUNT(DISTINCT) is a prefix scan over
    sets, but it collapses to pure map/fold work because a user joins the
    distinct set exactly once, on their FIRST day: the user exchange
    folds min(day) per user, a day-keyed exchange counts first-joins per
    day (union-ed with 0-weight markers so active days with no new users
    still emit), and the cumulative sum runs in ONE final partition —
    bounded by the CALENDAR (≤ 36.6k rows per century), never by the
    event volume, so the single-partition scan is scale-safe."""
    import pyarrow as pa
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts"], P)

    def to_days(t):
        day = pc.divide(pc.cast(t["ts"], "int64"),
                        np.int64(86_400_000_000))
        return pa.table({"user_id": t.column("user_id"), "day": day})

    rows = ds.map_batches(to_days, batch_format="pyarrow")

    def first_day(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("user_id", sort=False)["day"].min()
               .rename("day").reset_index())
        return pd.DataFrame({"day": out["day"].astype(np.int64),
                             "w": np.ones(len(out), dtype=np.int64)})

    firsts = hash_exchange(
        rows.map_batches(
            lambda df: df.groupby("user_id", sort=False)["day"].min()
            .reset_index(), batch_format="pandas"),
        key_fn=_user_key_fn(P), n_parts=P, kernel=first_day, fmt="pandas")

    def day_markers(df: pd.DataFrame) -> pd.DataFrame:
        d = df["day"].unique()
        return pd.DataFrame({"day": d.astype(np.int64),
                             "w": np.zeros(len(d), dtype=np.int64)})

    markers = rows.map_batches(day_markers, batch_format="pandas")

    def day_key(tbl):
        return (arrow_col_hash(tbl, "day")
                % np.uint64(P)).astype(np.int64)

    per_day = hash_exchange(
        firsts.union(markers), key_fn=day_key, n_parts=P,
        kernel=lambda df: df.groupby("day", sort=False)["w"].sum()
        .rename("new_users").reset_index(), fmt="pandas")

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("day", kind="stable")
        return pd.DataFrame({
            "day": df["day"].to_numpy().astype(np.int64),
            "new_users": df["new_users"].to_numpy().astype(np.int64),
            "cum_users": np.cumsum(
                df["new_users"].to_numpy()).astype(np.int64)})

    return hash_exchange(per_day, key_fn=lambda t: np.zeros(
        t.num_rows, dtype=np.int64), n_parts=1, kernel=scan, fmt="pandas")


def user_skyline(sf_dir: str):
    """2-D SKYLINE (Pareto-dominance front) over per-user totals: users
    not dominated in (n_events, tot_cents) — no other user with ≥ both
    coordinates and > at least one.  The distributed shape is the classic
    two-phase skyline: per-user totals fold through the user exchange,
    each partition prunes to its LOCAL skyline (dominated-in-partition ⇒
    dominated-globally, so pruning is lossless), and the survivors — a
    front, ~O(sqrt) of users in practice — merge in one final partition
    for the exact global front.  Tie law: equal (n, c) points dominate
    neither way, so duplicated optima all survive."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False)["c"].agg(["sum", "size"])
        return pd.DataFrame({"user_id": g.index.to_numpy(),
                             "tot_cents": g["sum"].to_numpy(np.int64),
                             "n_events": g["size"].to_numpy(np.int64)})

    def _front(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_events", "tot_cents"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        n = df["n_events"].to_numpy().astype(np.int64)
        c = df["tot_cents"].to_numpy().astype(np.int64)
        order = np.lexsort((-n, -c))           # c desc, then n desc
        ns, cs = n[order], c[order]
        new_c = np.concatenate(([True], cs[1:] != cs[:-1]))
        gid = np.cumsum(new_c) - 1             # equal-c group id
        gmax = ns[new_c]                       # first-in-group = max n
        run = np.concatenate(
            ([np.iinfo(np.int64).min],
             np.maximum.accumulate(gmax)[:-1]))  # max n over greater c
        alive_grp = gmax > run
        keep = alive_grp[gid] & (ns == gmax[gid])
        idx = order[keep]
        return pd.DataFrame({
            "user_id": df["user_id"].to_numpy()[idx].astype(np.int64),
            "n_events": n[idx], "tot_cents": c[idx]})[cols]

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False)[["tot_cents", "n_events"]]
        out = g.sum().reset_index()
        for col in ("tot_cents", "n_events"):
            out[col] = out[col].astype(np.int64)
        return _front(out)

    local = hash_exchange(
        rows.map_batches(partial, batch_format="pandas"),
        key_fn=_user_key_fn(P), n_parts=P, kernel=fold, fmt="pandas")
    return hash_exchange(
        local, key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1, kernel=_front, fmt="pandas")


def rate_limit(sf_dir: str, cap_tokens: int = 3, refill_ms: int = 30_000):
    """Per-user TOKEN-BUCKET rate limiter replay — the admission-control
    primitive (capacity ``cap_tokens``, one millitoken per full
    ``refill_ms`` elapsed, cost 1000 millitokens per event, bucket starts
    full).  The accept decision is an inherently SEQUENTIAL per-user
    recurrence with two barriers (cap clamp above, no-consume-on-reject
    below), so — like LTTB and the DFCM predictor — it runs as a
    per-series loop inside the user exchange, parallel ACROSS users.
    All-integer state (millitokens, floor-divided refills) keeps the
    replay bit-equal to the recursive-CTE SQL mirror."""
    import pyarrow as pa
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "event_id"], P)

    def to_rows(t):
        return pa.table({
            "user_id": t.column("user_id"),
            "event_id": t.column("event_id"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")
    cap_m = int(cap_tokens) * 1000

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "event_id", "ts_ms", "accepted", "tokens_m"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        df = df.sort_values(["user_id", "ts_ms", "event_id"],
                            kind="stable")
        u = df["user_id"].to_numpy()
        t = df["ts_ms"].to_numpy().astype(np.int64)
        acc = np.zeros(len(u), dtype=np.int64)
        tok_out = np.zeros(len(u), dtype=np.int64)
        new_u = np.concatenate(([True], u[1:] != u[:-1]))
        tok = 0
        for i in range(len(u)):
            tok = cap_m if new_u[i] else min(
                cap_m, tok + int(t[i] - t[i - 1]) // refill_ms)
            if tok >= 1000:
                tok -= 1000
                acc[i] = 1
            tok_out[i] = tok
        return pd.DataFrame({
            "user_id": u.astype(np.int64),
            "event_id": df["event_id"].to_numpy().astype(np.int64),
            "ts_ms": t, "accepted": acc, "tokens_m": tok_out})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def sliding_distinct(sf_dir: str, window_days: int = 7):
    """Sliding-window COUNT DISTINCT — distinct users active in the
    trailing ``window_days`` ending at each calendar day.  Distinct-over-
    overlapping-windows normally forces either window-key replication
    (×7 shuffle volume) or a sketch; the exact scale-safe shape used here
    is the INTERVAL-DELTA decomposition: per user the active-day set
    folds once through the user exchange, each user's membership in
    window-end days is a union of intervals [day, day+W-1] whose overlaps
    merge in-kernel to ±1 boundary deltas, a day-keyed exchange sums the
    deltas, and one final CALENDAR-bounded partition (≤366 rows/year —
    never event-volume) prefix-sums them into the counts."""
    import pyarrow as pa
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts"], P)
    W = int(window_days)

    def to_days(t):
        day = pc.divide(pc.cast(t["ts"], "int64"),
                        np.int64(86_400_000_000))
        tbl = pa.table({"user_id": t.column("user_id"), "day": day})
        return tbl.group_by(["user_id", "day"],
                            use_threads=False).aggregate([])

    rows = ds.map_batches(to_days, batch_format="pyarrow")

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["day", "delta"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        u = df["user_id"].to_numpy()
        d = df["day"].to_numpy().astype(np.int64)
        order = np.lexsort((d, u))
        us, dsrt = u[order], d[order]
        dup = np.concatenate(
            ([False], (us[1:] == us[:-1]) & (dsrt[1:] == dsrt[:-1])))
        us, dsrt = us[~dup], dsrt[~dup]
        # interval [day, day+W-1]; merge when next start <= prev end + 1
        same_u = np.concatenate(([False], us[1:] == us[:-1]))
        joins = same_u & (dsrt <= np.concatenate(([0], dsrt[:-1])) + W)
        starts = dsrt[~joins]
        # each merged run's end = last member's day + W - 1
        run_last = np.concatenate((np.flatnonzero(~joins)[1:] - 1,
                                   [len(dsrt) - 1]))
        ends = dsrt[run_last] + W - 1
        return pd.DataFrame({
            "day": np.concatenate((starts, ends + 1)).astype(np.int64),
            "delta": np.concatenate((
                np.ones(len(starts), dtype=np.int64),
                -np.ones(len(ends), dtype=np.int64)))})

    per_user = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=deltas, fmt="pandas")

    def day_key(tbl):
        return (arrow_col_hash(tbl, "day")
                % np.uint64(P)).astype(np.int64)

    summed = hash_exchange(
        per_user, key_fn=day_key, n_parts=P,
        kernel=lambda df: df.groupby("day", sort=False)["delta"].sum()
        .astype(np.int64).reset_index(), fmt="pandas")

    # calendar span [min active day, max active day] from one tiny
    # per-partition (min,max) fold — the q15 bounded-scalar discipline
    span = rows.map_batches(
        lambda df: pd.DataFrame(
            {"lo": [df["day"].min() if len(df) else np.iinfo(np.int64).max],
             "hi": [df["day"].max() if len(df) else np.iinfo(np.int64).min]}),
        batch_format="pandas")
    lo = hi = None
    for r in span.take_all():
        lo = r["lo"] if lo is None else min(lo, r["lo"])
        hi = r["hi"] if hi is None else max(hi, r["hi"])
    lo, hi = int(lo), int(hi)

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        days = np.arange(lo, hi + 1, dtype=np.int64)
        delta = np.zeros(len(days), dtype=np.int64)
        d = df["day"].to_numpy().astype(np.int64)
        keep = (d >= lo) & (d <= hi)   # end-deltas past the span fall off
        np.add.at(delta, d[keep] - lo,
                  df["delta"].to_numpy().astype(np.int64)[keep])
        return pd.DataFrame({"day": days,
                             "n_users_7d": np.cumsum(delta)})

    return hash_exchange(
        summed, key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1, kernel=scan, fmt="pandas")


def _global_ntile(per_user, metric: str, k: int, out_col: str):
    """(user_id, ``out_col``) global ntile over ``metric`` — SQL tile
    assignment (the first ``n % k`` tiles take the extra row) under the
    unique total order (metric, user_id).  A global ntile is an ORDERED
    GLOBAL RANK, which the Dataset API cannot express, so it reuses the
    :func:`pareto_curve` route: distributed ``sort`` → one tiny
    row-count task per sorted block → the driver folds ≤ #blocks scalars
    into exclusive rank offsets → a second task wave assigns tiles from
    pure rank arithmetic.  Partitioning assumption: `Dataset.sort` emits
    range-partitioned blocks whose concatenation IS the total order."""
    import ray
    import ray.data

    ordered = (per_user.select_columns(["user_id", metric])
               .sort([metric, "user_id"]).materialize())
    refs = ordered.to_arrow_refs()

    @ray.remote
    def nrows(tbl):
        return tbl.num_rows

    counts = ray.get([nrows.remote(r) for r in refs])
    n = int(sum(counts))
    offs = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)

    @ray.remote
    def tile_block(tbl, r0: int):
        import pyarrow as _pa

        r = np.arange(tbl.num_rows, dtype=np.int64) + np.int64(r0)
        q, rem = divmod(n, k)
        big = rem * (q + 1)
        tile = np.where(r < big, r // max(q + 1, 1),
                        rem + (r - big) // max(q, 1)) + 1
        return _pa.table({"user_id": tbl.column("user_id"),
                          out_col: _pa.array(tile.astype(np.int64))})

    return ray.data.from_arrow_refs(
        [tile_block.remote(r, int(o)) for r, o in zip(refs, offs)])


def rfm_segments(sf_dir: str, k: int = 4):
    """RFM segmentation: users quartiled independently on Recency (last
    event time), Frequency (event count) and Monetary (exact half-away
    cents total — the :func:`_cents_rows` discipline, so the ntile order
    is EXACT integer on all three axes), then counted per (r, f, m)
    cell.  Per-user aggregates fold through ONE user exchange; each axis
    runs the :func:`_global_ntile` sort + offset fold; the three tile
    streams re-align in ONE 3-way user co-partition whose kernel also
    pre-counts cells, and the ≤ k³ cell rows fold through a final tiny
    exchange."""
    from ..stages.exchange import hash_exchange_multi

    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": np.array([], np.int64),
                "r": np.array([], np.int64),
                "f": np.array([], np.int64),
                "m": np.array([], np.int64)})
        g = df.groupby("user_id", sort=False)
        out = g.agg(r=("ts_us", "max"), f=("ts_us", "size"),
                    m=("c", "sum")).reset_index()
        for c in ("user_id", "r", "f", "m"):
            out[c] = out[c].astype(np.int64)
        return out

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "recency_ms", "freq", "cents"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        g = df.groupby("user_id", sort=False)
        out = g.agg(r=("r", "max"), f=("f", "sum"),
                    m=("m", "sum")).reset_index()
        return pd.DataFrame({
            "user_id": out["user_id"].to_numpy().astype(np.int64),
            "recency_ms": (out["r"].to_numpy().astype(np.int64)
                           // 1000),
            "freq": out["f"].to_numpy().astype(np.int64),
            "cents": out["m"].to_numpy().astype(np.int64)})

    per_user = hash_exchange(
        rows.map_batches(partial, batch_format="pandas"),
        key_fn=_user_key_fn(P), n_parts=P, kernel=merge,
        fmt="pandas").materialize()

    tiles = [_global_ntile(per_user, m, k, c) for m, c in
             (("recency_ms", "r_q"), ("freq", "f_q"), ("cents", "m_q"))]

    def cell_partial(r: pd.DataFrame, f: pd.DataFrame,
                     m: pd.DataFrame) -> pd.DataFrame:
        cols = ["r_q", "f_q", "m_q", "n_users"]
        if len(r) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        t = r.merge(f, on="user_id").merge(m, on="user_id")
        out = (t.groupby(["r_q", "f_q", "m_q"], sort=False)
               .size().rename("n_users").reset_index())
        for c in cols:
            out[c] = out[c].astype(np.int64)
        return out

    cells = hash_exchange_multi(
        [(t, _user_key_fn(P)) for t in tiles],
        n_parts=P, kernel=cell_partial, fmt="pandas")

    def cell_merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["r_q", "f_q", "m_q", "n_users"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        out = (df.groupby(["r_q", "f_q", "m_q"], sort=False)["n_users"]
               .sum().reset_index())
        for c in cols:
            out[c] = out[c].astype(np.int64)
        return out

    from ..util import arrow_key_ids

    n_cell_parts = 4                      # ≤ k³ rows total
    def cell_key(tbl):
        return arrow_key_ids(tbl, ["r_q", "f_q", "m_q"], n_cell_parts)

    folded = hash_exchange(cells, key_fn=cell_key,
                           n_parts=n_cell_parts, kernel=cell_merge,
                           fmt="pandas")
    return folded.sort(["r_q", "f_q", "m_q"])


def ks_pairs(sf_dir: str):
    """Two-sample Kolmogorov–Smirnov distance between the value
    distributions of every (unordered) pair of event types, computed
    ENTIRELY in integers.  With ``F_t(v)`` = count of type-``t`` events at
    or below cent value ``v``, the statistic ``D = max_v |F1/n1 − F2/n2|``
    is multiplied through by the common denominator: the engine emits
    ``d_num = max_v |F1·n2 − F2·n1|`` (so ``D = d_num/(n1·n2)``) plus the
    smallest cent achieving it — no float CDF ever exists to disagree
    about (the fixed-decimal midpoint rule, cf. :func:`spc_flags`).

    Scale shape: partials are (type, cents) histogram cells folded inside
    each map batch, so the exchange carries ≤ |types| × |distinct cents|
    rows regardless of event count — the value DOMAIN bounds the shuffle.
    The final fold is one tiny single-partition kernel over that
    histogram (the KS sweep itself is O(types² × support))."""
    import pyarrow as pa

    tune_context()
    ds = _read_events(sf_dir, ["event_type", "value"], _n_parts(sf_dir))

    def partial(tbl: pa.Table) -> pa.Table:
        v = tbl.column("value").to_numpy(zero_copy_only=False)
        c = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(np.int64)
        t = pa.table({"event_type": tbl.column("event_type"),
                      "c": pa.array(c),
                      "one": pa.array(np.ones(len(c), np.int64))})
        out = t.group_by(["event_type", "c"]).aggregate([("one", "sum")])
        return pa.table({"event_type": out["event_type"], "c": out["c"],
                         "cnt": out["one_sum"]})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["t1", "t2", "n1", "n2", "d_num", "at_c"]
        if len(df) == 0:
            out = pd.DataFrame({c: np.array([], np.int64) for c in cols})
            out["t1"] = out["t1"].astype(object)
            out["t2"] = out["t2"].astype(object)
            return out[cols]
        g = (df.groupby(["event_type", "c"], as_index=False, sort=False)
             ["cnt"].sum())
        types = np.sort(g["event_type"].unique())
        support, inv = np.unique(g["c"].to_numpy(), return_inverse=True)
        tmap = {t: i for i, t in enumerate(types)}
        ti = g["event_type"].map(tmap).to_numpy()
        F = np.zeros((len(types), len(support)), np.int64)
        np.add.at(F, (ti, inv), g["cnt"].to_numpy().astype(np.int64))
        F = np.cumsum(F, axis=1)
        n = F[:, -1]
        rows = []
        for i in range(len(types)):          # |types|² is domain-bounded
            for j in range(i + 1, len(types)):
                d = np.abs(F[i] * n[j] - F[j] * n[i])
                k = int(np.argmax(d))        # first max = smallest cent
                rows.append((types[i], types[j], int(n[i]), int(n[j]),
                             int(d[k]), int(support[k])))
        out = pd.DataFrame(rows, columns=cols)
        for c in cols[2:]:
            out[c] = out[c].astype(np.int64)
        return out

    def one_part(tbl):
        return np.zeros(tbl.num_rows, dtype=np.int64)

    return hash_exchange(partials, key_fn=one_part, n_parts=1,
                         kernel=merge, fmt="pandas")


def stratified_sample(sf_dir: str, k: int = 20):
    """Deterministic stratified sample: the ``k`` events per type with the
    smallest md5-derived hash of their event_id (LITTLE-endian first 8
    digest bytes == DuckDB ``md5_number_upper`` — the dedup.py
    ``_md5_token_hash_flat`` precedent).  Hash-ranked bottom-k is a
    MERGEABLE sample: every block keeps only its own bottom-k partial, the
    per-type exchange merges ≤ k rows per block, and the result is
    reproducible on any partitioning and append-stable (a new shard can
    displace survivors but never reshuffle the ordering) — the property
    that makes it the right sampling primitive for a 100 TB corpus where
    "random" must also mean "re-runnable"."""
    import hashlib
    import pyarrow as pa

    tune_context()
    P = 4                                    # ≤ |types| × k rows total
    ds = _read_events(sf_dir, ["event_type", "event_id"], _n_parts(sf_dir))

    def _bottom_k(types: np.ndarray, ids: np.ndarray, hv: np.ndarray):
        codes, uniq = pd.factorize(types)
        order = np.lexsort((ids, hv, codes))
        c_s = codes[order]
        rank = np.arange(len(c_s)) - np.concatenate(
            ([0], np.cumsum(np.bincount(c_s))[:-1]))[c_s]
        keep = order[rank < k]
        return uniq, codes, keep

    def partial(tbl: pa.Table) -> pa.Table:
        ids = tbl.column("event_id").to_numpy(zero_copy_only=False)
        # md5 has no vectorized kernel; the per-id loop is the documented
        # price of a SQL-reproducible hash (unique ids, one digest each)
        hv = np.fromiter(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8],
                            "little") for i in ids),
            dtype=np.uint64, count=len(ids))
        types = tbl.column("event_type").to_numpy(zero_copy_only=False)
        _, _, keep = _bottom_k(types, ids, hv)
        return pa.table({"event_type": pa.array(types[keep]),
                         "event_id": pa.array(ids[keep]),
                         "hv": pa.array(hv[keep])})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        return (arrow_col_hash(tbl, "event_type")
                % np.uint64(P)).astype(np.int64)

    def merge(tbl: pa.Table) -> pd.DataFrame:
        cols = ["event_type", "rn", "event_id"]
        if tbl.num_rows == 0:
            out = pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                "rn": np.array([], np.int64),
                                "event_id": np.array([], np.int64)})
            return out[cols]
        types = tbl.column("event_type").to_numpy(zero_copy_only=False)
        ids = tbl.column("event_id").to_numpy(zero_copy_only=False)
        hv = tbl.column("hv").to_numpy(zero_copy_only=False)
        uniq, codes, keep = _bottom_k(types, ids, hv)
        order = np.lexsort((ids[keep], hv[keep], codes[keep]))
        keep = keep[order]
        c_s = codes[keep]
        rn = np.arange(len(c_s)) - np.concatenate(
            ([0], np.cumsum(np.bincount(c_s, minlength=len(uniq)))[:-1])
        )[c_s] + 1
        return pd.DataFrame({"event_type": types[keep],
                             "rn": rn.astype(np.int64),
                             "event_id": ids[keep].astype(np.int64)})[cols]

    return hash_exchange(partials, key_fn=key_fn, n_parts=P,
                         kernel=merge, fmt="pyarrow")


def holt_linear(sf_dir: str, alpha: float = 0.2, beta: float = 0.3):
    """Holt double-exponential smoothing per user (level + trend), the
    classic short-horizon forecaster: ``l_t = α·v_t + (1−α)(l_{t−1} +
    b_{t−1})``, ``b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}`` with the
    textbook init ``l_1 = v_1, b_1 = v_2 − v_1`` (users with a single
    event are excluded by the contract).  Emits the final level/trend and
    the one-step forecast ``l + b``.

    Cross-engine float discipline (the :func:`ewma_last` precedent): the
    recurrence touches each point exactly once in event-time order with
    the SAME scalar expression the SQL oracle's recursive CTE evaluates —
    no cross-row float sums exist, so both engines walk identical
    double-precision paths; round(6) on output is belt only.  The kernel
    is vectorized ACROSS users (one masked step per position, never a
    per-user Python loop): O(max series length) numpy steps."""
    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "value"], P)

    def project(tbl):
        import pyarrow as pa
        import pyarrow.compute as pc

        return pa.table({"user_id": tbl.column("user_id"),
                         "ts_us": pc.cast(tbl.column("ts"), "int64"),
                         "v": tbl.column("value")})

    rows = ds.map_batches(project, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "level", "trend", "forecast1"]
        if len(df) == 0:
            out = pd.DataFrame({c: np.array([], np.float64) for c in cols})
            out["user_id"] = out["user_id"].astype(np.int64)
            out["n"] = out["n"].astype(np.int64)
            return out[cols]
        df = df.sort_values(["user_id", "ts_us"], kind="stable")
        v = df["v"].to_numpy()
        uid = df["user_id"].to_numpy()
        starts = np.flatnonzero(np.diff(uid, prepend=uid[0] - 1))
        lens = np.diff(np.append(starts, len(uid)))
        has2 = lens >= 2
        l = v[starts].copy()
        b = np.zeros(len(starts))
        b[has2] = v[starts[has2] + 1] - v[starts[has2]]
        L = int(lens.max())
        for t in range(1, L):           # one masked step per position
            act = lens > t
            idx = starts[act] + t
            vt, la, ba = v[idx], l[act], b[act]
            tmp = alpha * vt + (1.0 - alpha) * (la + ba)
            b[act] = beta * (tmp - la) + (1.0 - beta) * ba
            l[act] = tmp
        out = pd.DataFrame({
            "user_id": uid[starts[has2]].astype(np.int64),
            "n": lens[has2].astype(np.int64),
            "level": round_half_away(l[has2], 6),
            "trend": round_half_away(b[has2], 6),
            "forecast1": round_half_away(l[has2] + b[has2], 6)})
        return out[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def dtw_pairs(sf_dir: str, k: int = 40):
    """Dynamic-time-warping distances between the top-``k`` most-active
    users' 24-hour activity profiles (all C(k,2) pairs): profile =
    integer event counts per UTC hour-of-day, cost = |a−b|, full-window
    DTW over the 24×24 grid — all-int DP, so the oracle is bit-equal.
    The behavioral-similarity shape (which heavy users keep the same
    daily rhythm up to time warping?).

    Scale shape: per-batch (user, hour) count partials → one user-keyed
    exchange building 24-wide vectors; each partition forwards only its
    LOCAL top-``k`` rows, so the driver merge is bounded by k·P rows —
    never the user count.  The C(k,2) pair grid rides one task; the DP
    is vectorized ACROSS pairs (576 vector ops — the edit_pairs
    discipline: the in-row dependency is the only sequential axis)."""
    import pyarrow.compute as pc
    import ray.data

    tune_context()
    P = 8
    ds = _read_events(sf_dir, ["user_id", "ts"], _n_parts(sf_dir))
    vcols = [f"v{i}" for i in range(24)]

    def partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        key = u * 24 + (ts_ms // 3_600_000) % 24
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({"user_id": uk // 24, "hour": uk % 24,
                             "cnt": cnt.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "total"] + vcols
        if not len(df):
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        g = df.groupby(["user_id", "hour"], sort=True)["cnt"].sum()
        ui = g.index.get_level_values(0).to_numpy()
        hi = g.index.get_level_values(1).to_numpy()
        uniq, inv = np.unique(ui, return_inverse=True)
        vec = np.zeros((len(uniq), 24), np.int64)
        vec[inv, hi] = g.to_numpy()
        tot = vec.sum(axis=1)
        order = np.lexsort((uniq, -tot))[:k]
        out = pd.DataFrame({"user_id": uniq[order].astype(np.int64),
                            "total": tot[order]})
        for i in range(24):
            out[vcols[i]] = vec[order, i]
        return out[cols]

    top_tbl = hash_exchange(partials, key_fn=_user_key_fn(P), n_parts=P,
                            kernel=local_top, fmt="pandas").to_pandas()
    # bounded driver merge: ≤ k rows per partition
    top_tbl = top_tbl.sort_values(
        ["total", "user_id"], ascending=[False, True],
        kind="stable").head(k).sort_values("user_id")
    users = top_tbl["user_id"].to_numpy(np.int64)
    V = top_tbl[vcols].to_numpy(np.int64)
    ia, ib = np.triu_indices(len(users), 1)
    pair_df = pd.DataFrame({"user_a": users[ia], "user_b": users[ib]})
    for i in range(24):
        pair_df[f"a{i}"] = V[ia, i]
        pair_df[f"b{i}"] = V[ib, i]

    def dtw_kernel(df: pd.DataFrame) -> pd.DataFrame:
        out_cols = ["user_a", "user_b", "dtw"]
        if not len(df):
            return pd.DataFrame({c: np.array([], np.int64)
                                 for c in out_cols})
        A = df[[f"a{i}" for i in range(24)]].to_numpy(np.int64)
        B = df[[f"b{i}" for i in range(24)]].to_numpy(np.int64)
        prev = np.cumsum(np.abs(A[:, 0:1] - B), axis=1)
        for i in range(1, 24):
            cur = np.empty_like(prev)
            cur[:, 0] = np.abs(A[:, i] - B[:, 0]) + prev[:, 0]
            best_prev = np.minimum(prev[:, 1:], prev[:, :-1])
            for j in range(1, 24):
                cur[:, j] = (np.abs(A[:, i] - B[:, j])
                             + np.minimum(best_prev[:, j - 1],
                                          cur[:, j - 1]))
            prev = cur
        return pd.DataFrame({"user_a": df["user_a"].to_numpy(np.int64),
                             "user_b": df["user_b"].to_numpy(np.int64),
                             "dtw": prev[:, 23]})[out_cols]

    return ray.data.from_pandas(pair_df).map_batches(
        dtw_kernel, batch_format="pandas")


def changepoints(sf_dir: str, beta: int = 2000):
    """Optimal-partitioning changepoint segmentation of each event
    type's DAILY count series over the global calendar span (missing
    days count 0): minimize Σ_seg [cost(seg) + β] where cost(s,t] =
    (t−s)·Σx² − (Σx)² — the n²·variance numerator (the spc_flags
    discipline: multiply the SSE through by the segment length so every
    comparison is int64-exact), β in the same units.  Exact DP (the
    textbook O(T²) optimal-partitioning recursion, ties → smallest
    split), so both engines reconstruct the identical segmentation —
    no pruning heuristics to mismatch.

    Scale shape: per-batch (type, day) count partials → one type-keyed
    exchange; the DP state is (series × T) with T = calendar days, so a
    partition's work is bounded by the day span, never the event count.
    The DP is vectorized ACROSS series; the only sequential axis is t
    (T iterations of O(t)-vector candidate mins)."""
    import pyarrow.compute as pc

    tune_context()
    P = 4
    DAY = 86_400_000
    ds = _read_events(sf_dir, ["event_type", "ts"], _n_parts(sf_dir))

    def mm_partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        if not len(ts_ms):
            return pd.DataFrame({"lo": np.array([], np.int64),
                                 "hi": np.array([], np.int64)})
        return pd.DataFrame({"lo": [ts_ms.min() // DAY],
                             "hi": [ts_ms.max() // DAY]})

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    d0, d1 = int(mm["lo"].min()), int(mm["hi"].max())
    T = d1 - d0 + 1

    def partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": batch["event_type"].to_pandas(),
                           "day": ts_ms // DAY - d0})
        g = (df.groupby(["event_type", "day"], sort=False)
             .size().rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        return (h % np.uint64(P)).astype(np.int64)

    out_cols = ["event_type", "seg_start_ms", "seg_end_ms", "n_days",
                "sum_cnt", "cost_num"]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                **{c: np.array([], np.int64) for c in out_cols[1:]}})
        g = df.groupby(["event_type", "day"], sort=True)["cnt"].sum()
        types_lvl = g.index.get_level_values(0)
        uniq, inv = np.unique(types_lvl, return_inverse=True)
        n = len(uniq)
        X = np.zeros((n, T), np.int64)
        X[inv, g.index.get_level_values(1).to_numpy(np.int64)] = (
            g.to_numpy(np.int64))
        pre = np.zeros((n, T + 1), np.int64)
        sq = np.zeros((n, T + 1), np.int64)
        np.cumsum(X, axis=1, out=pre[:, 1:])
        np.cumsum(X * X, axis=1, out=sq[:, 1:])
        F = np.zeros((n, T + 1), np.int64)
        arg = np.zeros((n, T + 1), np.int64)
        for t in range(1, T + 1):
            seg_n = t - np.arange(t)
            cand = (F[:, :t] + seg_n * (sq[:, t:t + 1] - sq[:, :t])
                    - (pre[:, t:t + 1] - pre[:, :t]) ** 2 + beta)
            arg[:, t] = np.argmin(cand, axis=1)      # first = smallest s
            F[:, t] = cand[np.arange(n), arg[:, t]]
        rows = []
        for i in range(n):
            t = T
            while t > 0:
                s = int(arg[i, t])
                c = int((t - s) * (sq[i, t] - sq[i, s])
                        - (pre[i, t] - pre[i, s]) ** 2)
                rows.append((uniq[i], (d0 + s) * DAY,
                             (d0 + t - 1) * DAY, t - s,
                             int(pre[i, t] - pre[i, s]), c))
                t = s
        out = pd.DataFrame(rows, columns=out_cols)
        for c in out_cols[1:]:
            out[c] = out[c].astype(np.int64)
        return out[out_cols]

    return hash_exchange(partials, key_fn=key_fn, n_parts=P,
                         kernel=kernel, fmt="pandas")


# 2·cos(2π/24) as a SHARED decimal literal: both engines parse the same
# double, so the Goertzel recurrence walks identical IEEE-754 paths
# (the holt_linear discipline — never call cos() on either side).
GOERTZEL_C24 = 1.9318516525781366


def spectral_daily(sf_dir: str):
    """Goertzel power at the 1/24h frequency of each event type's HOURLY
    count series over the global calendar span (missing hours count 0) —
    the "how diurnal is this signal" scalar that seasonal_decompose's
    cell means don't give.  Recurrence s_t = x_t + C·s₁ − s₂ with C the
    shared literal above; power = s₁² + s₂² − C·s₁·s₂ after the last
    sample.  Float64 end-to-end but ORDER-DETERMINISTIC: the only
    sequential axis is the hour index, and both engines evaluate the
    same expression tree per step, so the oracle is bit-equal.

    Scale shape: per-batch (type, hour) count partials → one type-keyed
    exchange; recurrence state is 2 doubles per series, T iterations
    vectorized across series."""
    import pyarrow.compute as pc

    tune_context()
    P = 4
    HOUR = 3_600_000
    ds = _read_events(sf_dir, ["event_type", "ts"], _n_parts(sf_dir))

    def mm_partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        if not len(ts_ms):
            return pd.DataFrame({"lo": np.array([], np.int64),
                                 "hi": np.array([], np.int64)})
        return pd.DataFrame({"lo": [ts_ms.min() // HOUR],
                             "hi": [ts_ms.max() // HOUR]})

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    h0, h1 = int(mm["lo"].min()), int(mm["hi"].max())
    T = h1 - h0 + 1

    def partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": batch["event_type"].to_pandas(),
                           "hour": ts_ms // HOUR - h0})
        g = (df.groupby(["event_type", "hour"], sort=False)
             .size().rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        return (h % np.uint64(P)).astype(np.int64)

    out_cols = ["event_type", "n_hours", "power"]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                 "n_hours": np.array([], np.int64),
                                 "power": np.array([], np.float64)})
        g = df.groupby(["event_type", "hour"], sort=True)["cnt"].sum()
        uniq, inv = np.unique(g.index.get_level_values(0),
                              return_inverse=True)
        X = np.zeros((len(uniq), T), np.float64)
        X[inv, g.index.get_level_values(1).to_numpy(np.int64)] = (
            g.to_numpy(np.int64))
        C = GOERTZEL_C24
        s1 = np.zeros(len(uniq), np.float64)
        s2 = np.zeros(len(uniq), np.float64)
        for t in range(T):
            s = X[:, t] + C * s1 - s2
            s2 = s1
            s1 = s
        power = s1 * s1 + s2 * s2 - C * s1 * s2
        return pd.DataFrame({"event_type": uniq,
                             "n_hours": np.full(len(uniq), T, np.int64),
                             "power": power})[out_cols]

    return hash_exchange(partials, key_fn=key_fn, n_parts=P,
                         kernel=kernel, fmt="pandas")


def theil_sen(sf_dir: str):
    """Theil–Sen robust trend of each user's DAILY count series over the
    global calendar span (missing days count 0): the median of all
    C(T,2) pairwise slopes (x_j − x_i)/(j − i), reported as the EXACT
    (numerator, denominator) int64 pair of the selected element — the
    rational-output discipline (collocations/seasonal_decompose):
    nothing lossy rides the gate.  Selection is deterministic on both
    engines: order by (IEEE double value, num, den) — the double is the
    same division of the same ints on both sides — and take the lower
    median (index (m−1)//2).

    Scale shape: per-batch (user, day) partials → one user-keyed
    exchange; the pair grid is per-series C(T,2) with T = calendar days
    (never event count), vectorized across users in each partition."""
    import pyarrow.compute as pc

    tune_context()
    P = 8
    DAY = 86_400_000
    ds = _read_events(sf_dir, ["user_id", "ts"], _n_parts(sf_dir))

    def mm_partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        if not len(ts_ms):
            return pd.DataFrame({"lo": np.array([], np.int64),
                                 "hi": np.array([], np.int64)})
        return pd.DataFrame({"lo": [ts_ms.min() // DAY],
                             "hi": [ts_ms.max() // DAY]})

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    d0, d1 = int(mm["lo"].min()), int(mm["hi"].max())
    T = d1 - d0 + 1
    ii, jj = np.triu_indices(T, 1)
    dens = (jj - ii).astype(np.int64)

    def partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        key = u * T + (ts_ms // DAY - d0)
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({"user_id": uk // T, "day": uk % T,
                             "cnt": cnt.astype(np.int64)})

    partials = ds.map_batches(partial, batch_format="pyarrow")
    out_cols = ["user_id", "n_pairs", "med_num", "med_den"]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: np.array([], np.int64)
                                 for c in out_cols})
        g = df.groupby(["user_id", "day"], sort=True)["cnt"].sum()
        uniq, inv = np.unique(g.index.get_level_values(0),
                              return_inverse=True)
        X = np.zeros((len(uniq), T), np.int64)
        X[inv, g.index.get_level_values(1).to_numpy(np.int64)] = (
            g.to_numpy(np.int64))
        num = X[:, jj] - X[:, ii]                      # (nU, m)
        den = np.broadcast_to(dens, num.shape)
        val = num.astype(np.float64) / den
        order = np.lexsort((den, num, val), axis=-1)
        mid = (num.shape[1] - 1) // 2
        sel = order[:, mid]
        rows = np.arange(len(uniq))
        return pd.DataFrame({
            "user_id": uniq.astype(np.int64),
            "n_pairs": np.full(len(uniq), num.shape[1], np.int64),
            "med_num": num[rows, sel].astype(np.int64),
            "med_den": den[rows, sel].astype(np.int64)})[out_cols]

    return hash_exchange(partials, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def discords(sf_dir: str, bucket_ms: int = 10_800_000, m: int = 8):
    """Matrix-profile discord table per event type: over the type's
    3h-bucket count series (global span, zeros filled), every length-"""\
    """``m`` sliding window gets its exact nearest-neighbor squared
    distance mp = min over |i−j| ≥ m of Σ(w_i − w_j)² (the trivial-match
    exclusion zone) and the argmin window — the discord/motif primitive
    (a high mp is an anomalous day-shape, a low one a repeated motif).
    All-int arithmetic (counts → squared diffs), ties → smallest j, so
    the oracle is bit-equal.

    Scale shape: (type, bucket) count partials → one type-keyed
    exchange; per-series work is O(W²·m) on the BUCKET grid (W = span /
    bucket − m + 1, independent of event count), via one integer
    Gram-matrix matmul per series."""
    import pyarrow.compute as pc

    tune_context()
    P = 4
    ds = _read_events(sf_dir, ["event_type", "ts"], _n_parts(sf_dir))

    def mm_partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        if not len(ts_ms):
            return pd.DataFrame({"lo": np.array([], np.int64),
                                 "hi": np.array([], np.int64)})
        return pd.DataFrame({"lo": [ts_ms.min() // bucket_ms],
                             "hi": [ts_ms.max() // bucket_ms]})

    mm = ds.map_batches(mm_partial, batch_format="pyarrow").to_pandas()
    b0, b1 = int(mm["lo"].min()), int(mm["hi"].max())
    T = b1 - b0 + 1
    W = T - m + 1

    def partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": batch["event_type"].to_pandas(),
                           "bucket": ts_ms // bucket_ms - b0})
        g = (df.groupby(["event_type", "bucket"], sort=False)
             .size().rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        return (h % np.uint64(P)).astype(np.int64)

    out_cols = ["event_type", "win_start_ms", "mp_num", "nn_start_ms"]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df) or W < 2:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                **{c: np.array([], np.int64) for c in out_cols[1:]}})
        g = df.groupby(["event_type", "bucket"], sort=True)["cnt"].sum()
        uniq, inv = np.unique(g.index.get_level_values(0),
                              return_inverse=True)
        rows = []
        big = np.iinfo(np.int64).max
        for i, et in enumerate(uniq):
            x = np.zeros(T, np.int64)
            sel = inv == i
            x[g.index.get_level_values(1).to_numpy(np.int64)[sel]] = (
                g.to_numpy(np.int64)[sel])
            Wm = np.lib.stride_tricks.sliding_window_view(x, m)  # (W, m)
            Wm = np.ascontiguousarray(Wm, dtype=np.int64)
            ssq = (Wm * Wm).sum(axis=1)
            D = ssq[:, None] + ssq[None, :] - 2 * (Wm @ Wm.T)
            off = np.abs(np.arange(W)[:, None] - np.arange(W)[None, :])
            D[off < m] = big
            nn = np.argmin(D, axis=1)                 # first = smallest j
            mp = D[np.arange(W), nn]
            rows.append(pd.DataFrame({
                "event_type": et,
                "win_start_ms": (b0 + np.arange(W)) * bucket_ms,
                "mp_num": mp,
                "nn_start_ms": (b0 + nn) * bucket_ms}))
        out = pd.concat(rows, ignore_index=True)
        for c in out_cols[1:]:
            out[c] = out[c].astype(np.int64)
        return out[out_cols]

    return hash_exchange(partials, key_fn=key_fn, n_parts=P,
                         kernel=kernel, fmt="pandas")


def survival_km(sf_dir: str, etype: str = "purchase"):
    """Kaplan–Meier survival TABLE of inter-purchase gaps: per user the
    day-floored gaps between consecutive '"""\
    """purchase' events are complete
    observations and the gap from the last purchase to the global max ts
    is right-CENSORED; for every event time t (a duration with ≥1
    complete observation) emit exact integer (n_events, n_censored_at_t,
    n_at_risk) — the survival curve Π(1 − d/n) is a consumer-side
    product of rationals (the rational-output discipline; nothing lossy
    rides the gate).

    Scale shape: one user-keyed exchange computes per-user gap lists
    (sequential axis = a user's own purchases); duration counts then
    reduce on a t-keyed exchange BOUNDED by the day span — at_risk is a
    suffix sum over that bounded domain, never a per-user scan."""
    import pyarrow.compute as pc

    tune_context()
    P = 8
    DAY = 86_400_000
    ds = _read_events(sf_dir, ["user_id", "ts", "event_type"],
                      _n_parts(sf_dir))

    def mm_partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        if not len(ts_ms):
            return pd.DataFrame({"hi": np.array([], np.int64)})
        return pd.DataFrame({"hi": [int(ts_ms.max())]})

    hi = int(ds.map_batches(mm_partial, batch_format="pyarrow")
             .to_pandas()["hi"].max())

    def purchases(batch):
        import pyarrow as pa

        m = pc.equal(pc.cast(batch["event_type"], "string"), etype)
        sub = batch.filter(m)
        ts_ms = pc.divide(pc.cast(sub["ts"], "int64"), 1000)
        return pa.table({"user_id": sub["user_id"], "ts_ms": ts_ms})

    rows = ds.map_batches(purchases, batch_format="pyarrow")

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["t_days", "ev", "cen"]
        if not len(df):
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_ms"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        comp = (ts[1:] - ts[:-1])[same] // DAY
        last = np.concatenate((~same, [True]))
        cen = (hi - ts[last]) // DAY
        tt = np.concatenate((comp, cen))
        kind = np.concatenate((np.zeros(len(comp), np.int64),
                               np.ones(len(cen), np.int64)))
        key = tt * 2 + kind
        uk, cnt = np.unique(key, return_counts=True)
        return pd.DataFrame({
            "t_days": uk // 2,
            "ev": np.where(uk % 2 == 0, cnt, 0).astype(np.int64),
            "cen": np.where(uk % 2 == 1, cnt, 0).astype(np.int64)})[cols]

    partials = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=gaps, fmt="pandas")

    out_cols = ["t_days", "n_events", "n_censored", "n_at_risk"]

    def km(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: np.array([], np.int64)
                                 for c in out_cols})
        g = df.groupby("t_days", sort=True)[["ev", "cen"]].sum()
        t = g.index.to_numpy(np.int64)
        ev = g["ev"].to_numpy(np.int64)
        cen = g["cen"].to_numpy(np.int64)
        total = int(ev.sum() + cen.sum())
        before = np.concatenate(([0], np.cumsum(ev + cen)[:-1]))
        at_risk = total - before
        keep = ev > 0
        return pd.DataFrame({
            "t_days": t[keep], "n_events": ev[keep],
            "n_censored": cen[keep],
            "n_at_risk": at_risk[keep]})[out_cols]

    return hash_exchange(partials,
                         key_fn=lambda t: np.zeros(t.num_rows, np.int64),
                         n_parts=1, kernel=km, fmt="pandas")


def rolling_median_5(sf_dir: str):
    """Trailing-5-row median of event value per user (ROWS window, cents
    precision): for each event the lower median of the last ≤5 values in
    (ts, event_id) order — the robust sibling of rolling_5's mean, an
    exact ORDER STATISTIC (rank (n−1)//2) over round-half-away cents so
    the oracle is int-equal (the ks_pairs cents discipline).

    Scale shape: one user-keyed exchange; per partition the window is a
    (rows × 5) strided gather masked at user starts — no per-row Python,
    no cross-partition window state (a user's rows co-locate)."""
    import pyarrow.compute as pc

    tune_context()
    P = 8
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"],
                      _n_parts(sf_dir))

    def rows(batch):
        import pyarrow as pa

        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"), 1000)
        return pa.table({"event_id": batch["event_id"],
                         "user_id": batch["user_id"],
                         "ts_ms": ts_ms, "value": batch["value"]})

    rows_ds = ds.map_batches(rows, batch_format="pyarrow")
    out_cols = ["event_id", "n_window", "med_cents"]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: np.array([], np.int64)
                                 for c in out_cols})
        df = df.sort_values(["user_id", "ts_ms", "event_id"],
                            kind="stable")
        u = df["user_id"].to_numpy(np.int64)
        cents = round_half_away(df["value"].to_numpy() * 100.0, 0)
        cents = cents.astype(np.int64)
        n = len(df)
        start_of = np.flatnonzero(
            np.concatenate(([True], u[1:] != u[:-1])))
        run_start = np.repeat(start_of, np.diff(np.append(start_of, n)))
        idx = np.arange(n)
        big = np.iinfo(np.int64).max
        w = np.full((n, 5), big, np.int64)
        for k in range(5):
            src = idx - k
            ok = src >= run_start
            w[ok, k] = cents[src[ok]]
        nw = np.minimum(idx - run_start + 1, 5).astype(np.int64)
        w.sort(axis=1)
        med = w[idx, (nw - 1) // 2]
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "n_window": nw, "med_cents": med})[out_cols]

    return hash_exchange(rows_ds, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def streaming_topk(sf_dir: str, n_actors: int = 4, k: int = 3,
                   tier: str = "1h"):
    """STREAMING top-k heavy hitters per tumbling window: events stream
    through the ``_WindowAggCore`` actor pool keyed by EVENT TYPE (the
    same emit-on-watermark machinery as the rollup gate — per-type
    windows finalize and leave memory as the type's watermark passes),
    then each sealed window ranks its types by (count desc, type) and
    keeps the top ``k`` — the streaming heavy-hitters shape.  Counts are
    exact (types are low-cardinality; the MG-sketch sibling
    ``docs_top_tokens_sketch`` covers the unbounded-key case).  The
    final rank step runs over (types × windows) rows — bounded by the
    calendar, never the stream."""
    import ray.data

    from ..state.streaming import (StreamingRouter, _WindowAggCore,
                                   feed_parquet_distributed)

    tune_context()
    window_ms = TIER_MS[tier]
    router = StreamingRouter(n_actors=n_actors,
                             actor_core=_WindowAggCore,
                             core_args=(window_ms, 0))
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    feed_parquet_distributed(router, path, order_cols=["ts_ms"],
                             key_col="event_type")
    rows = pd.DataFrame(router.seal())
    stats = router.stats()
    if stats["late"] != 0:
        raise RuntimeError(
            f"in-order feed must drop nothing, got {stats['late']} late")
    cols = ["window_ms", "rk", "event_type", "cnt"]
    if len(rows) == 0:
        return ray.data.from_pandas(pd.DataFrame({
            "window_ms": pd.Series([], dtype=np.int64),
            "rk": pd.Series([], dtype=np.int64),
            "event_type": pd.Series([], dtype=object),
            "cnt": pd.Series([], dtype=np.int64)}))
    out = pd.DataFrame({
        "window_ms": rows["window_ms"].astype(np.int64),
        "event_type": rows["key"].astype(str),
        "cnt": rows["cnt"].astype(np.int64)})
    out = out.sort_values(["window_ms", "cnt", "event_type"],
                          ascending=[True, False, True], kind="stable")
    out["rk"] = out.groupby("window_ms").cumcount() + 1
    out = out[out["rk"] <= k].reset_index(drop=True)
    out["rk"] = out["rk"].astype(np.int64)
    return ray.data.from_pandas(out[cols])


def cohort_ltv(sf_dir: str):
    """Cohort LTV matrix — the revenue sibling of
    :func:`retention_cohorts`: users grouped by FIRST-event day; for
    every week offset with ≥1 purchase by the cohort, the cohort's
    purchase revenue that week and the RUNNING cumulative (exact cents,
    round-half-away — the ks_pairs discipline), plus the cohort size as
    the per-user-LTV denominator (consumer-side rational).

    Scale shape: one user-keyed exchange derives cohorts and per-
    (cohort, week) revenue partials + per-cohort size partials (a user
    lives whole in one partition, so both are exact); the final exchange
    keys by COHORT so the cumulative is an in-partition prefix sum over
    that cohort's few weeks — never a global ordered scan."""
    import pyarrow.compute as pc

    tune_context()
    P = 8
    WEEK_MS = 7 * 86_400_000
    DAY = 86_400_000
    ds = _read_events(sf_dir, ["user_id", "ts", "event_type", "value"],
                      _n_parts(sf_dir))

    def rows(batch):
        import pyarrow as pa

        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"), 1000)
        return pa.table({"user_id": batch["user_id"], "ts_ms": ts_ms,
                         "event_type": batch["event_type"],
                         "value": batch["value"]})

    rows_ds = ds.map_batches(rows, batch_format="pyarrow")
    part_cols = ["cohort_day", "week_offset", "rev_cents", "users"]

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: np.array([], np.int64)
                                 for c in part_cols})
        codes, _ = pd.factorize(df["user_id"], sort=False)
        day = (df["ts_ms"].to_numpy(np.int64) // DAY) * DAY
        cohort_of = np.full(codes.max() + 1, np.iinfo(np.int64).max,
                            np.int64)
        np.minimum.at(cohort_of, codes, day)
        sz = pd.DataFrame({
            "cohort_day": cohort_of,
            "week_offset": np.full(len(cohort_of), -1, np.int64),
            "rev_cents": np.zeros(len(cohort_of), np.int64),
            "users": np.ones(len(cohort_of), np.int64)})
        sz = (sz.groupby(["cohort_day", "week_offset"], as_index=False,
                         sort=False).sum())
        isp = df["event_type"].to_numpy() == "purchase"
        if isp.any():
            cents = round_half_away(
                df["value"].to_numpy()[isp] * 100.0, 0).astype(np.int64)
            coh = cohort_of[codes[isp]]
            week = (day[isp] - coh) // WEEK_MS
            rev = pd.DataFrame({
                "cohort_day": coh, "week_offset": week,
                "rev_cents": cents,
                "users": np.zeros(isp.sum(), np.int64)})
            rev = (rev.groupby(["cohort_day", "week_offset"],
                               as_index=False, sort=False).sum())
            sz = pd.concat([sz, rev], ignore_index=True)
        for c in part_cols:
            sz[c] = sz[c].astype(np.int64)
        return sz[part_cols]

    partials = hash_exchange(rows_ds, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=per_user, fmt="pandas")

    def coh_key(tbl):
        h = tbl.column("cohort_day").to_numpy().astype(np.uint64)
        return ((h // np.uint64(86_400_000)) % np.uint64(4)).astype(
            np.int64)

    out_cols = ["cohort_day", "week_offset", "cohort_size", "rev_cents",
                "cum_rev_cents"]

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({c: np.array([], np.int64)
                                 for c in out_cols})
        g = (df.groupby(["cohort_day", "week_offset"], sort=True)
             [["rev_cents", "users"]].sum())
        g = g.reset_index()
        sizes = g[g["week_offset"] == -1].set_index("cohort_day")["users"]
        rev = g[g["week_offset"] >= 0].copy()
        rev["cum_rev_cents"] = rev.groupby("cohort_day")[
            "rev_cents"].cumsum()
        rev["cohort_size"] = sizes.reindex(
            rev["cohort_day"].to_numpy()).to_numpy()
        for c in out_cols:
            rev[c] = rev[c].astype(np.int64)
        return rev[out_cols]

    return hash_exchange(partials, key_fn=coh_key, n_parts=4,
                         kernel=merge, fmt="pandas")


def type_movers(sf_dir: str):
    """Week-over-week movers table: per (event_type, ISO-floored week)
    the event count, the previous calendar week's count (0 when absent —
    a LAG over the dense week grid, not over present rows), and the
    signed delta — the "what changed this week" analytics shape, exact
    integers end-to-end.

    Scale shape: (type, week) count partials per batch → one type-keyed
    exchange whose kernel densifies each type's week axis (bounded by
    the calendar) and differences adjacent cells."""
    import pyarrow.compute as pc

    tune_context()
    P = 4
    WEEK = 7 * 86_400_000
    ds = _read_events(sf_dir, ["event_type", "ts"], _n_parts(sf_dir))

    def partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"event_type": batch["event_type"].to_pandas(),
                           "week": (ts_ms // WEEK) * WEEK})
        g = (df.groupby(["event_type", "week"], sort=False)
             .size().rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        return (h % np.uint64(P)).astype(np.int64)

    out_cols = ["event_type", "week_ms", "cnt", "prev_cnt", "delta"]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                **{c: np.array([], np.int64) for c in out_cols[1:]}})
        g = df.groupby(["event_type", "week"], sort=True)["cnt"].sum()
        uniq, inv = np.unique(g.index.get_level_values(0),
                              return_inverse=True)
        weeks = g.index.get_level_values(1).to_numpy(np.int64)
        rows = []
        for i, et in enumerate(uniq):
            sel = inv == i
            w, c = weeks[sel], g.to_numpy(np.int64)[sel]
            grid = np.arange(w.min(), w.max() + WEEK, WEEK)
            dense = np.zeros(len(grid), np.int64)
            dense[(w - w.min()) // WEEK] = c
            prev = np.concatenate(([0], dense[:-1]))
            rows.append(pd.DataFrame({
                "event_type": et, "week_ms": grid, "cnt": dense,
                "prev_cnt": prev, "delta": dense - prev}))
        out = pd.concat(rows, ignore_index=True)
        for c in out_cols[1:]:
            out[c] = out[c].astype(np.int64)
        return out[out_cols]

    return hash_exchange(partials, key_fn=key_fn, n_parts=P,
                         kernel=kernel, fmt="pandas")


def dow_hour_profile(sf_dir: str):
    """Calendar heatmap cells: exact event counts per (event_type,
    day-of-week, hour-of-day) — the ops-dashboard shape that completes
    the calendar family (hourly_profile = hour axis only).  Epoch day 0
    is a Thursday, so dow = (days + 4) % 7 with Sunday = 0, mirrored
    exactly in SQL.  Partials fold per batch; the exchange carries at
    most types × 168 cells."""
    import pyarrow.compute as pc

    tune_context()
    P = 4
    ds = _read_events(sf_dir, ["event_type", "ts"], _n_parts(sf_dir))

    def partial(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"),
                          1000).to_numpy(zero_copy_only=False)
        days = ts_ms // 86_400_000
        df = pd.DataFrame({"event_type": batch["event_type"].to_pandas(),
                           "dow": (days + 4) % 7,
                           "hour": (ts_ms // 3_600_000) % 24})
        g = (df.groupby(["event_type", "dow", "hour"], sort=False)
             .size().rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        return (h % np.uint64(P)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["event_type", "dow", "hour"], sort=False)
               ["cnt"].sum().reset_index())
        for c in ("dow", "hour", "cnt"):
            out[c] = out[c].astype(np.int64)
        return out[["event_type", "dow", "hour", "cnt"]]

    return hash_exchange(partials, key_fn=key_fn, n_parts=P,
                         kernel=merge, fmt="pandas")


def rs_range(sf_dir: str):
    """Rescaled-range (Hurst R/S analysis) INTEGER NUMERATORS per
    (user, day): for the day's cent series c_1..c_n in ts order,
    ``r_num = max_k(n·P_k − k·S) − min_k(n·P_k − k·S)`` over the
    cumulative-deviation walk (P_k = prefix sum, S = day total — the
    classic R statistic scaled by n to stay integral) and
    ``var_num = n·Σc² − S²`` (n²·variance).  Consumers divide
    r_num/(n·√(var_num/n²)) for the R/S ratio; the engine emits only the
    exact int64 numerators so the oracle comparison never touches a
    square root (the SPC/bollinger discipline, CLAUDE.md).  One user
    exchange; the per-(user, day) walk is a grouped cumsum — vectorized
    with reduceat over group starts, no per-group Python."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "value"], P)

    def to_rows(t):
        import pyarrow as pa

        val = t.column("value").to_numpy()
        cents = (np.sign(val)
                 * np.floor(np.abs(val) * 100 + 0.5)).astype(np.int64)
        ts_ms = pc.divide(pc.cast(t["ts"], "int64"), 1000)
        day_ms = pc.multiply(pc.divide(ts_ms, DAY_MS), DAY_MS)
        return pa.table({"user_id": t.column("user_id"),
                         "ts_ms": ts_ms, "day_ms": day_ms,
                         "cents": pa.array(cents)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "day_ms", "n", "r_num", "var_num"]
        empty = pd.DataFrame({c: np.array([], np.int64) for c in cols})
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "day_ms", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy(dtype=np.int64)
        d = df["day_ms"].to_numpy(dtype=np.int64)
        c = df["cents"].to_numpy(dtype=np.int64)
        new = np.concatenate(
            ([True], (u[1:] != u[:-1]) | (d[1:] != d[:-1])))
        starts = np.flatnonzero(new)
        gidx = np.cumsum(new) - 1
        counts = np.diff(np.append(starts, len(u))).astype(np.int64)
        cs = np.cumsum(c)
        base = (cs[starts] - c[starts])[gidx]
        pre = cs - base                       # P_k within group
        k = np.arange(len(u), dtype=np.int64) - starts[gidx] + 1
        tot = np.add.reduceat(c, starts).astype(np.int64)
        dev = counts[gidx] * pre - k * tot[gidx]
        r_num = (np.maximum.reduceat(dev, starts)
                 - np.minimum.reduceat(dev, starts))
        sumsq = np.add.reduceat(c * c, starts).astype(np.int64)
        var_num = counts * sumsq - tot * tot
        keep = counts >= 2
        return pd.DataFrame({
            "user_id": u[starts][keep], "day_ms": d[starts][keep],
            "n": counts[keep], "r_num": r_num[keep],
            "var_num": var_num[keep]})

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def attribution_linear(sf_dir: str, gap_ms: int = 1_800_000,
                       target: str = "purchase"):
    """LINEAR (even-split) multi-touch attribution — the fan-out
    complement of :func:`attribution_last_touch`: every ``target``
    event's cents split evenly across ALL events preceding it in its
    30-min session; division is exact-integer with the remainder cents
    going +1 each to the EARLIEST touches (deterministic, so the credit
    table mirrors to SQL verbatim: touch j of k gets ``cents//k +
    (j < cents%k)``, j 0-based in ts order; cents ≥ 0 in this lake so
    ``//``/``%`` agree across engines).  A purchase opening its session
    credits 'direct' in full.  The per-purchase preceding-run fan-out is
    the counts/starts repeat construction (reach_2hop pattern) — session
    lengths bound the blow-up."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "ts", "value"], P)

    def to_rows(t):
        import pyarrow as pa

        val = t.column("value").to_numpy()
        cents = (np.sign(val)
                 * np.floor(np.abs(val) * 100 + 0.5)).astype(np.int64)
        return pa.table({
            "user_id": t.column("user_id"),
            "event_type": pc.cast(t["event_type"], "string"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000),
            "cents": pa.array(cents)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["attr_type", "n_touches", "cents"]
        empty = pd.DataFrame({"attr_type": np.array([], dtype=object),
                              "n_touches": np.array([], np.int64),
                              "cents": np.array([], np.int64)})
        if len(df) == 0:
            return empty
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy()
        t = df["ts_ms"].to_numpy().astype(np.int64)
        et = df["event_type"].to_numpy()
        cents = df["cents"].to_numpy().astype(np.int64)
        brk = np.concatenate(([True], (u[1:] != u[:-1])
                              | ((t[1:] - t[:-1]) > gap_ms)))
        sid = np.cumsum(brk) - 1
        sess_start = np.flatnonzero(brk)[sid]   # session start index/row
        hit = np.flatnonzero(et == target)
        if hit.size == 0:
            return empty
        k = (hit - sess_start[hit]).astype(np.int64)
        direct = hit[k == 0]
        frames = []
        if direct.size:
            frames.append(pd.DataFrame({
                "attr_type": np.repeat("direct", direct.size),
                "cr": cents[direct]}))
        fan = hit[k > 0]
        if fan.size:
            kk = k[k > 0]
            offs = np.cumsum(kk) - kk
            j = np.arange(int(kk.sum()), dtype=np.int64) - np.repeat(
                offs, kk)
            src = np.repeat(sess_start[fan], kk) + j
            c_rep = np.repeat(cents[fan], kk)
            k_rep = np.repeat(kk, kk)
            cr = c_rep // k_rep + (j < (c_rep % k_rep))
            frames.append(pd.DataFrame({"attr_type": et[src], "cr": cr}))
        g = (pd.concat(frames, ignore_index=True)
             .groupby("attr_type", sort=False)
             .agg(n_touches=("cr", "size"), cents=("cr", "sum"))
             .reset_index())
        g["n_touches"] = g["n_touches"].astype(np.int64)
        g["cents"] = g["cents"].astype(np.int64)
        return g[cols]

    partials = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=kernel, fmt="pandas")

    def attr_key(tbl):
        from ..util import arrow_key_ids

        return arrow_key_ids(tbl, ["attr_type"], 8)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("attr_type", sort=False)
               .agg(n_touches=("n_touches", "sum"),
                    cents=("cents", "sum")).reset_index())
        out["n_touches"] = out["n_touches"].astype(np.int64)
        out["cents"] = out["cents"].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=attr_key, n_parts=8,
                         kernel=merge, fmt="pandas")


def runs_test(sf_dir: str):
    """Wald–Wolfowitz runs-test INTEGER table per user: n, n_above (cents
    strictly above the user's LOWER MEDIAN — sorted cents at index
    (n−1)//2, the deterministic selection both engines can name) and the
    run count of the above/not-above sequence in ts order.  The z
    statistic needs a sqrt, so the engine emits only the exact integers
    (SPC discipline).  Two grouped lexsorts per partition: one by value
    for the median selection, one by time for the run-change count."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "value"], P)

    def to_rows(t):
        import pyarrow as pa

        val = t.column("value").to_numpy()
        cents = (np.sign(val)
                 * np.floor(np.abs(val) * 100 + 0.5)).astype(np.int64)
        return pa.table({
            "user_id": t.column("user_id"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000),
            "cents": pa.array(cents)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "n_above", "runs"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        u = df["user_id"].to_numpy(dtype=np.int64)
        c = df["cents"].to_numpy(dtype=np.int64)
        t = df["ts_ms"].to_numpy(dtype=np.int64)
        # median selection: value order within user
        ov = np.lexsort((c, u))
        uv = u[ov]
        new = np.concatenate(([True], uv[1:] != uv[:-1]))
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(u))).astype(np.int64)
        med = c[ov][starts + (counts - 1) // 2]
        users = uv[starts]
        # run counting: time order within user
        ot = np.lexsort((t, u))
        ut, ct = u[ot], c[ot]
        gidx = np.cumsum(np.concatenate(([True], ut[1:] != ut[:-1]))) - 1
        ab = ct > med[gidx]
        first = np.concatenate(([True], ut[1:] != ut[:-1]))
        chg = first | np.concatenate(([True], ab[1:] != ab[:-1]))
        n_above = np.bincount(gidx[ab], minlength=len(users))
        runs = np.bincount(gidx[chg], minlength=len(users))
        return pd.DataFrame({
            "user_id": users, "n": counts,
            "n_above": n_above.astype(np.int64),
            "runs": runs.astype(np.int64)})

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def user_overlap(sf_dir: str, top: int = 20):
    """Pairwise ACTIVE-DAY overlap between the top-``top`` users by event
    count: for each user pair (a < b), |days_a ∩ days_b| and
    |days_a ∪ days_b| — the co-activity numerators (Jaccard at
    presentation time, never a float in the gate).  Per-user day sets and
    counts fold through the user exchange; the global top-20 folds
    partition heads (deterministic (n DESC, user_id) order); only the 20
    winners' day rows — a bounded broadcast by construction — reach the
    single pairwise partition, where the intersection is one self-merge
    on day."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts"], P)

    def to_rows(t):
        import pyarrow as pa

        ts_ms = pc.divide(pc.cast(t["ts"], "int64"), 1000)
        return pa.table({"user_id": t.column("user_id"),
                         "day": pc.divide(ts_ms, DAY_MS)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def per_user(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_events", "day"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        n = df.groupby("user_id", sort=False).size().rename("n_events")
        d = df.drop_duplicates(["user_id", "day"])
        out = d.merge(n.reset_index(), on="user_id")
        for c in cols:
            out[c] = out[c].astype(np.int64)
        return out[cols]

    per = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                        kernel=per_user, fmt="pandas").materialize()

    def heads(df: pd.DataFrame) -> pd.DataFrame:
        u = (df.drop_duplicates("user_id")[["user_id", "n_events"]]
             .sort_values(["n_events", "user_id"],
                          ascending=[False, True]).head(top))
        u["user_id"] = u["user_id"].astype(np.int64)
        u["n_events"] = u["n_events"].astype(np.int64)
        return u

    def top_merge(df: pd.DataFrame) -> pd.DataFrame:
        return heads(df)

    winners = hash_exchange(
        per.map_batches(heads, batch_format="pandas"),
        key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1, kernel=top_merge, fmt="pandas").to_pandas()
    top_ids = np.sort(winners["user_id"].to_numpy(dtype=np.int64))

    def filt(df: pd.DataFrame) -> pd.DataFrame:
        m = np.isin(df["user_id"].to_numpy(dtype=np.int64), top_ids)
        return df.loc[m, ["user_id", "day"]]

    def pairwise(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["id_a", "id_b", "inter", "uni"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        nd = df.groupby("user_id", sort=False).size()
        m = df.merge(df, on="day")
        m = m.loc[m["user_id_x"] < m["user_id_y"]]
        it = (m.groupby(["user_id_x", "user_id_y"], sort=False)
              .size().rename("inter").reset_index())
        ua, ub = np.meshgrid(top_ids, top_ids, indexing="ij")
        keep = ua < ub
        allp = pd.DataFrame({"user_id_x": ua[keep], "user_id_y": ub[keep]})
        allp = allp.merge(it, on=["user_id_x", "user_id_y"], how="left")
        inter = allp["inter"].fillna(0).to_numpy(np.int64)
        na = nd.reindex(allp["user_id_x"]).fillna(0).to_numpy(np.int64)
        nb = nd.reindex(allp["user_id_y"]).fillna(0).to_numpy(np.int64)
        return pd.DataFrame({
            "id_a": allp["user_id_x"].to_numpy(np.int64),
            "id_b": allp["user_id_y"].to_numpy(np.int64),
            "inter": inter, "uni": na + nb - inter})

    return hash_exchange(
        per.map_batches(filt, batch_format="pandas"),
        key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1, kernel=pairwise, fmt="pandas")


def late_histogram(sf_dir: str, bucket_ms: int = 60_000):
    """Late-data OBSERVABILITY for the out-of-order streaming gate: the
    per-minute histogram of how late the DROPPED points were — lateness =
    per-user watermark (running max of ts over PRIOR arrivals in the
    deterministic scrambled (value, ts) arrival order, exactly
    :func:`streaming_out_of_order`'s drop rule) minus the point's ts.
    The monitoring panel a streaming deployment sizes its
    allowed-lateness from.  One user exchange; the watermark walk is a
    grouped ``np.maximum.accumulate`` over arrival order — the sequential
    rule, vectorized across users."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "value"], P)

    def to_rows(t):
        import pyarrow as pa

        return pa.table({
            "user_id": t.column("user_id"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000),
            "value": t.column("value")})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["late_bucket", "n_dropped"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        df = df.sort_values(["user_id", "value", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy(dtype=np.int64)
        t = df["ts_ms"].to_numpy(dtype=np.int64)
        first = np.concatenate(([True], u[1:] != u[:-1]))
        gidx = np.cumsum(first) - 1
        # watermark BEFORE each row = grouped running max of the previous
        # row's ts; 0 floors group starts (ts_ms > 0, so a floored wm
        # never flags a drop — exactly the oracle's wm-IS-NULL accept)
        shifted = np.concatenate(([0], t[:-1]))
        shifted[first] = 0
        wm = (pd.Series(shifted).groupby(gidx).cummax()
              .to_numpy(dtype=np.int64))
        late = wm - t
        drop = late >= 0
        if not drop.any():
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        g = np.unique(late[drop] // bucket_ms, return_counts=True)
        return pd.DataFrame({"late_bucket": g[0].astype(np.int64),
                             "n_dropped": g[1].astype(np.int64)})

    partials = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=kernel, fmt="pandas")

    def bkey(tbl):
        return (tbl.column("late_bucket").to_numpy().astype(np.uint64)
                % np.uint64(8)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("late_bucket", sort=False)["n_dropped"].sum()
               .reset_index())
        out["late_bucket"] = out["late_bucket"].astype(np.int64)
        out["n_dropped"] = out["n_dropped"].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=bkey, n_parts=8, kernel=merge,
                         fmt="pandas")


def trend_ols(sf_dir: str):
    """Ordinary-least-squares daily-count trend per event type as EXACT
    INTEGER numerators (the non-robust complement of
    :func:`theil_sen`): over the type's (day index, daily count) points,
    ``sxy_num = n·Σxy − Σx·Σy`` and ``sxx_num = n·Σx² − (Σx)²`` — the
    slope is sxy_num/sxx_num at presentation time, never a float in the
    gate.  x = epoch day number (small ints), so all products stay far
    inside int64.  Daily counts fold through one (type, day) exchange;
    the OLS moments are a per-type fold of five scalar sums."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_type", "ts"], P)

    def partial(t):
        ts_ms = pc.divide(pc.cast(t["ts"], "int64"), 1000)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas().astype(str),
            "day": pc.divide(ts_ms, DAY_MS).to_numpy(
                zero_copy_only=False).astype(np.int64)})
        g = (df.groupby(["event_type", "day"], sort=False)
             .size().rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        return (h % np.uint64(8)).astype(np.int64)

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_type", "n", "sxy_num", "sxx_num"]
        if len(df) == 0:
            return pd.DataFrame({
                "event_type": np.array([], dtype=object),
                "n": np.array([], np.int64),
                "sxy_num": np.array([], np.int64),
                "sxx_num": np.array([], np.int64)})
        d = (df.groupby(["event_type", "day"], sort=False)["cnt"].sum()
             .reset_index())
        x = d["day"].to_numpy(np.int64)
        y = d["cnt"].to_numpy(np.int64)
        d = d.assign(x=x, y=y, xy=x * y, xx=x * x)
        g = (d.groupby("event_type", sort=False)
             .agg(n=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
                  sxy=("xy", "sum"), sxx=("xx", "sum")).reset_index())
        n = g["n"].to_numpy(np.int64)
        out = pd.DataFrame({
            "event_type": g["event_type"],
            "n": n,
            "sxy_num": n * g["sxy"].to_numpy(np.int64)
            - g["sx"].to_numpy(np.int64) * g["sy"].to_numpy(np.int64),
            "sxx_num": n * g["sxx"].to_numpy(np.int64)
            - g["sx"].to_numpy(np.int64) ** 2})
        return out[cols]

    return hash_exchange(partials, key_fn=key_fn, n_parts=8,
                         kernel=moments, fmt="pandas")


def wape_seasonal(sf_dir: str, lag_hours: int = 24):
    """Seasonal-naive FORECAST-ERROR numerators per event type: predict
    each hour's count with the count ``lag_hours`` earlier and emit
    n_hours, Σ|actual − pred| and Σactual over the hours where both
    sides exist (inner-join semantics) — WAPE = abs_err/actual_sum at
    presentation time, exact ints in the gate.  The evaluation metric a
    forecasting pipeline tracks next to the model family
    (:func:`holt_linear` / :func:`trend_ols` / :func:`theil_sen`).
    Hourly counts fold through one type-keyed exchange; the lag join is
    a per-type searchsorted."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_type", "ts"], P)

    def partial(t):
        ts_ms = pc.divide(pc.cast(t["ts"], "int64"), 1000)
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas().astype(str),
            "hour": pc.divide(ts_ms, HOUR_MS).to_numpy(
                zero_copy_only=False).astype(np.int64)})
        g = (df.groupby(["event_type", "hour"], sort=False)
             .size().rename("c").reset_index())
        g["c"] = g["c"].astype(np.int64)
        return g

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        h = arrow_col_hash(tbl, "event_type")
        return (h % np.uint64(8)).astype(np.int64)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_type", "n_hours", "abs_err", "actual_sum"]
        if len(df) == 0:
            return pd.DataFrame({
                "event_type": np.array([], dtype=object),
                "n_hours": np.array([], np.int64),
                "abs_err": np.array([], np.int64),
                "actual_sum": np.array([], np.int64)})
        d = (df.groupby(["event_type", "hour"], sort=False)["c"].sum()
             .reset_index().sort_values(["event_type", "hour"],
                                        kind="stable"))
        et, _ = pd.factorize(d["event_type"], sort=False)
        hr = d["hour"].to_numpy(np.int64)
        c = d["c"].to_numpy(np.int64)
        key = (et.astype(np.int64) << 32) | (hr & np.int64(0xFFFFFFFF))
        want = (et.astype(np.int64) << 32) | ((hr - lag_hours)
                                              & np.int64(0xFFFFFFFF))
        pos = np.searchsorted(key, want)
        hit = (pos < len(key)) & (key[np.minimum(pos, len(key) - 1)]
                                  == want)
        actual = c[hit]
        pred = c[pos[hit]]
        g = (pd.DataFrame({"event_type": d["event_type"].to_numpy()[hit],
                           "ae": np.abs(actual - pred), "a": actual})
             .groupby("event_type", sort=False)
             .agg(n_hours=("ae", "size"), abs_err=("ae", "sum"),
                  actual_sum=("a", "sum")).reset_index())
        for col in ("n_hours", "abs_err", "actual_sum"):
            g[col] = g[col].astype(np.int64)
        return g[cols]

    return hash_exchange(partials, key_fn=key_fn, n_parts=8,
                         kernel=kernel, fmt="pandas")


def range_frame_5m(sf_dir: str, half_ms: int = 300_000):
    """VALUE-RANGE window frame (the frame family row-based rolling
    windows can't express): per event, the count and cent sum of the
    same user's events within ±5 minutes of it — SQL's ``RANGE BETWEEN
    300000 PRECEDING AND 300000 FOLLOWING``.  Two searchsorteds against
    the user's sorted ts array turn the frame into a prefix-sum
    difference — O(n log n) per partition, vectorized."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"], P)

    def to_rows(t):
        import pyarrow as pa

        val = t.column("value").to_numpy()
        cents = (np.sign(val)
                 * np.floor(np.abs(val) * 100 + 0.5)).astype(np.int64)
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000),
            "cents": pa.array(cents)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "n_frame", "cents_frame"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy(np.int64)
        t = df["ts_ms"].to_numpy(np.int64)
        c = df["cents"].to_numpy(np.int64)
        first = np.concatenate(([True], u[1:] != u[:-1]))
        gidx = np.cumsum(first) - 1
        starts = np.flatnonzero(first)
        counts = np.diff(np.append(starts, len(u)))
        # composite key keeps frames inside the user segment
        stride = np.int64(t.max() - t.min() + 2 * half_ms + 2)
        rel = t - t.min() + half_ms + 1     # > half_ms away from edges
        key = gidx * stride + rel
        pre = np.cumsum(c)
        lo = np.searchsorted(key, key - half_ms, side="left")
        hi = np.searchsorted(key, key + half_ms, side="right")
        n_frame = (hi - lo).astype(np.int64)
        csum = np.concatenate(([0], pre))
        cents_frame = csum[hi] - csum[lo]
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "n_frame": n_frame, "cents_frame": cents_frame})

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def session_concurrency_1h(sf_dir: str, gap_ms: int = 1_800_000):
    """Cross-user session CONCURRENCY per hour: how many sessions (the
    30-min-gap rule of :func:`sessionize`) overlap each hour bucket —
    the capacity-planning view of the session table.  Sessions derive
    per user inside the exchange; each session emits its covered hour
    buckets (bounded by session span), and hour counts fold on a tiny
    bucket exchange."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts"], P)

    def to_rows(t):
        import pyarrow as pa

        return pa.table({
            "user_id": t.column("user_id"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["hour_ms", "n_sessions"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy(np.int64)
        t = df["ts_ms"].to_numpy(np.int64)
        brk = np.concatenate(([True], (u[1:] != u[:-1])
                              | ((t[1:] - t[:-1]) > gap_ms)))
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(t)) - 1
        s_ms, e_ms = t[starts], t[ends]
        h0 = s_ms // HOUR_MS
        h1 = e_ms // HOUR_MS
        span = (h1 - h0 + 1).astype(np.int64)
        base = np.repeat(h0, span)
        k = np.arange(int(span.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(span) - span, span)
        hours = (base + k) * HOUR_MS
        hv, cnt = np.unique(hours, return_counts=True)
        return pd.DataFrame({"hour_ms": hv.astype(np.int64),
                             "n_sessions": cnt.astype(np.int64)})

    partials = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=kernel, fmt="pandas")

    def hkey(tbl):
        return (tbl.column("hour_ms").to_numpy().astype(np.uint64)
                % np.uint64(8)).astype(np.int64)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("hour_ms", sort=False)["n_sessions"].sum()
               .reset_index())
        out["hour_ms"] = out["hour_ms"].astype(np.int64)
        out["n_sessions"] = out["n_sessions"].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=hkey, n_parts=8, kernel=merge,
                         fmt="pandas")


def peak_concurrency(sf_dir: str, gap_ms: int = 1_800_000):
    """GLOBAL peak session concurrency: the maximum number of sessions
    (30-min gap rule) simultaneously open across all users, and the
    earliest millisecond it is reached — the exact sweep-line answer the
    per-hour view (:func:`session_concurrency_1h`) approximates.  An
    ORDERED GLOBAL PREFIX SCAN (the pareto_curve custom-operator route):
    per-user sessions emit ±1 boundary deltas, a ts-keyed exchange
    pre-sums deltas per instant (so every sorted row is a real
    concurrency value — no intra-instant partial prefixes), the
    distributed sort range-partitions by ts, per-block tasks emit
    (sum, max-prefix, earliest argmax ts) scalars, and the driver folds
    ≤ #blocks triples.  Output: one row (peak, at_ts)."""
    import pyarrow.compute as pc
    import ray
    import ray.data

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts"], P)

    def to_rows(t):
        import pyarrow as pa

        return pa.table({
            "user_id": t.column("user_id"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def deltas(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["ts", "delta"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy(np.int64)
        t = df["ts_ms"].to_numpy(np.int64)
        brk = np.concatenate(([True], (u[1:] != u[:-1])
                              | ((t[1:] - t[:-1]) > gap_ms)))
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(t)) - 1
        return pd.DataFrame({
            "ts": np.concatenate([t[starts], t[ends] + 1]),
            "delta": np.concatenate([
                np.ones(len(starts), np.int64),
                -np.ones(len(starts), np.int64)])})

    per_user = hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                             kernel=deltas, fmt="pandas")

    def ts_key(tbl):
        return (tbl.column("ts").to_numpy().astype(np.uint64)
                % np.uint64(P)).astype(np.int64)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("ts", sort=False)["delta"].sum().reset_index()
        out = out.loc[out["delta"] != 0]
        out["ts"] = out["ts"].astype(np.int64)
        out["delta"] = out["delta"].astype(np.int64)
        return out

    per_ts = hash_exchange(per_user, key_fn=ts_key, n_parts=P,
                           kernel=combine, fmt="pandas")
    ordered = per_ts.sort("ts").materialize()
    refs = ordered.to_arrow_refs()

    @ray.remote
    def block_scan(tbl):
        d = tbl.column("delta").to_numpy(zero_copy_only=False)
        t = tbl.column("ts").to_numpy(zero_copy_only=False)
        if len(d) == 0:
            return 0, None, None
        pre = np.cumsum(d)
        mx = int(pre.max())
        at = int(t[int(np.argmax(pre))])   # argmax = first occurrence
        return int(pre[-1]), mx, at

    scans = ray.get([block_scan.remote(r) for r in refs])
    offset, peak, at_ts = 0, None, None
    for tot, mx, at in scans:
        if mx is not None:
            cand = offset + mx
            if peak is None or cand > peak:
                peak, at_ts = cand, at
        offset += tot
    out = pd.DataFrame({"peak": [np.int64(peak or 0)],
                        "at_ts": [np.int64(at_ts or 0)]})
    return ray.data.from_pandas(out)


def type_unpivot(sf_dir: str):
    """UNPIVOT reshape — the melt inverse of :func:`type_pivot`: the wide
    per-user count matrix back to (user_id, event_type, n) long rows,
    zero-count cells dropped (sparse long form).  Composes the pivot
    (one exchange) with a map-only vectorized melt — the round-trip
    pair a feature pipeline needs in both directions."""
    wide = type_pivot(sf_dir)

    def melt(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "event_type", "n"]
        if len(df) == 0:
            return pd.DataFrame({
                "user_id": np.array([], np.int64),
                "event_type": np.array([], dtype=object),
                "n": np.array([], np.int64)})
        out = []
        for t in PIVOT_TYPES:
            n = df[f"n_{t}"].to_numpy(np.int64)
            keep = n > 0
            out.append(pd.DataFrame({
                "user_id": df["user_id"].to_numpy(np.int64)[keep],
                "event_type": t, "n": n[keep]}))
        return pd.concat(out, ignore_index=True)[cols]

    return wide.map_batches(melt, batch_format="pandas")


def percentile_cont_p90(sf_dir: str):
    """Interpolated (CONTINUOUS) percentile — the quantile flavor the
    exact-order-statistic family (:func:`user_quantiles`) doesn't cover:
    per user, p90 of cents by linear interpolation, emitted as the EXACT
    integer numerator ``p90_num = (100−rem)·v_i + rem·v_{i+1}`` with
    den = 100 (rank = 90·(n−1); i = rank//100; rem = rank%100) — the
    SQL mirror selects the same two order statistics from a sorted
    array, so no float interpolation crosses the gate."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts", "value"], P)

    def to_rows(t):
        import pyarrow as pa

        val = t.column("value").to_numpy()
        cents = (np.sign(val)
                 * np.floor(np.abs(val) * 100 + 0.5)).astype(np.int64)
        return pa.table({"user_id": t.column("user_id"),
                         "cents": pa.array(cents)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n", "p90_num"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        ov = np.lexsort((df["cents"].to_numpy(np.int64),
                         df["user_id"].to_numpy(np.int64)))
        u = df["user_id"].to_numpy(np.int64)[ov]
        c = df["cents"].to_numpy(np.int64)[ov]
        new = np.concatenate(([True], u[1:] != u[:-1]))
        starts = np.flatnonzero(new)
        n = np.diff(np.append(starts, len(u))).astype(np.int64)
        rank = 90 * (n - 1)
        i = rank // 100
        rem = rank % 100
        v_i = c[starts + i]
        v_next = c[np.minimum(starts + i + 1, starts + n - 1)]
        p90 = (100 - rem) * v_i + rem * v_next
        return pd.DataFrame({"user_id": u[starts], "n": n,
                             "p90_num": p90})

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def funnel_3step(sf_dir: str, gap_ms: int = 1_800_000,
                 steps=("view", "click", "purchase")):
    """ORDERED 3-step funnel within sessions: a session converts when it
    contains a view, then a click strictly after that view, then a
    purchase strictly after that click (first-occurrence semantics at
    each step — the classic ordered-subsequence funnel the 2-step
    signup gate doesn't cover).  Per user: session count and converting
    count.  Each step is one composite-key searchsorted against the
    next event type's sorted stream — sequential semantics, vectorized
    across sessions."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "ts"], P)

    def to_rows(t):
        import pyarrow as pa

        return pa.table({
            "user_id": t.column("user_id"),
            "event_type": pc.cast(t["event_type"], "string"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_sessions", "n_funnel"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy(np.int64)
        t = df["ts_ms"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        brk = np.concatenate(([True], (u[1:] != u[:-1])
                              | ((t[1:] - t[:-1]) > gap_ms)))
        sid = (np.cumsum(brk) - 1).astype(np.int64)
        stride = np.int64(t.max() - t.min() + 2)
        rel = t - t.min()
        key = sid * stride + rel

        def first_after(step: str, base_sid, base_t):
            """min ts of `step` rows strictly after base_t in base_sid."""
            m = et == step
            sk, st_ = key[m], t[m]
            ssid = sid[m]
            probe = base_sid * stride + (base_t - t.min()) + 1
            pos = np.searchsorted(sk, probe)
            ok = (pos < len(sk)) & (ssid[np.minimum(pos, max(len(sk) - 1,
                                                             0))]
                                    == base_sid) if len(sk) else \
                np.zeros(len(base_sid), dtype=bool)
            nt = np.where(ok, st_[np.minimum(pos, max(len(sk) - 1, 0))],
                          -1)
            return ok, nt

        # step 1: first 'view' per session = grouped min over view rows
        mv = et == steps[0]
        if mv.any():
            vs, vt = sid[mv], t[mv]
            first = np.concatenate(([True], vs[1:] != vs[:-1]))
            s1_sid, s1_t = vs[first], vt[first]
        else:
            s1_sid = np.array([], np.int64)
            s1_t = np.array([], np.int64)
        ok2, t2 = first_after(steps[1], s1_sid, s1_t)
        ok3, _ = first_after(steps[2], s1_sid[ok2], t2[ok2])
        conv_sids = s1_sid[ok2][ok3]
        sess_user = u[np.flatnonzero(brk)]     # user per session id
        n_sessions = (pd.Series(sess_user).groupby(sess_user, sort=False)
                      .size())
        conv_users = sess_user[conv_sids]
        n_funnel = (pd.Series(conv_users).groupby(conv_users, sort=False)
                    .size())
        out = pd.DataFrame({
            "user_id": n_sessions.index.to_numpy(np.int64),
            "n_sessions": n_sessions.to_numpy(np.int64)})
        out["n_funnel"] = (n_funnel.reindex(out["user_id"]).fillna(0)
                           .to_numpy(np.int64))
        return out[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def cume_dist_cents(sf_dir: str):
    """CUME_DIST numerators per event: within its user's cent
    distribution, how many of the user's events have cents ≤ this one
    (ties counted, SQL RANGE-frame semantics) and the user total —
    cume_dist = n_le/n at presentation, exact ints in the gate.  One
    sorted searchsorted per partition."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_id", "user_id", "ts", "value"], P)

    def to_rows(t):
        import pyarrow as pa

        val = t.column("value").to_numpy()
        cents = (np.sign(val)
                 * np.floor(np.abs(val) * 100 + 0.5)).astype(np.int64)
        return pa.table({"event_id": t.column("event_id"),
                         "user_id": t.column("user_id"),
                         "cents": pa.array(cents)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_id", "n_le", "n"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        u = df["user_id"].to_numpy(np.int64)
        c = df["cents"].to_numpy(np.int64)
        ov = np.lexsort((c, u))
        us, cs = u[ov], c[ov]
        new = np.concatenate(([True], us[1:] != us[:-1]))
        starts = np.flatnonzero(new)
        gidx = np.cumsum(new) - 1
        counts = np.diff(np.append(starts, len(us))).astype(np.int64)
        # n_le for each sorted row = index of the LAST tie within group
        idx = np.arange(len(us), dtype=np.int64)
        # rightmost occurrence of each (user, cents) run
        run_end = np.concatenate((
            np.flatnonzero((us[1:] != us[:-1]) | (cs[1:] != cs[:-1])),
            [len(us) - 1]))
        run_id = np.cumsum(np.concatenate(
            ([True], (us[1:] != us[:-1]) | (cs[1:] != cs[:-1])))) - 1
        n_le = run_end[run_id] - starts[gidx] + 1
        out = pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64)[ov],
            "n_le": n_le.astype(np.int64),
            "n": counts[gidx]})
        return out[["event_id", "n_le", "n"]]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def signup_to_purchase(sf_dir: str):
    """Conversion LATENCY: per user with a signup, the gap from the
    FIRST signup to the first purchase strictly after it (−1 when never
    converted) — the activation metric growth teams track.  Exact ms;
    one user exchange, two grouped first-occurrence selections."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "ts"], P)

    def to_rows(t):
        import pyarrow as pa

        return pa.table({
            "user_id": t.column("user_id"),
            "event_type": pc.cast(t["event_type"], "string"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "signup_ts", "latency_ms"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        u = df["user_id"].to_numpy(np.int64)
        t = df["ts_ms"].to_numpy(np.int64)
        et = df["event_type"].to_numpy()
        ms = et == "signup"
        if not ms.any():
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        su, st_ = u[ms], t[ms]
        first = np.concatenate(([True], su[1:] != su[:-1]))
        fu, ft = su[first], st_[first]
        mp = et == "purchase"
        pu, pt = u[mp], t[mp]
        stride = np.int64(t.max() - t.min() + 2)
        pkey = pu * stride + (pt - t.min())
        probe = fu * stride + (ft - t.min()) + 1
        pos = np.searchsorted(pkey, probe)
        ok = ((pos < len(pkey))
              & (pu[np.minimum(pos, max(len(pkey) - 1, 0))] == fu)
              if len(pkey) else np.zeros(len(fu), dtype=bool))
        lat = np.where(
            ok, pt[np.minimum(pos, max(len(pkey) - 1, 0))] - ft, -1)
        return pd.DataFrame({"user_id": fu, "signup_ts": ft,
                             "latency_ms": lat.astype(np.int64)})

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def activity_streaks(sf_dir: str):
    """Longest CONSECUTIVE-DAY activity streak per user (plus active-day
    count) — the engagement metric behind streak badges.  Islands over
    the sorted distinct day numbers: a streak break is any diff > 1;
    exact ints, one user exchange."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "ts"], P)

    def to_rows(t):
        import pyarrow as pa

        ts_ms = pc.divide(pc.cast(t["ts"], "int64"), 1000)
        return pa.table({"user_id": t.column("user_id"),
                         "day": pc.divide(ts_ms, DAY_MS)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "n_days", "max_streak"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        d = df.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="stable")
        u = d["user_id"].to_numpy(np.int64)
        day = d["day"].to_numpy(np.int64)
        brk = np.concatenate(([True], (u[1:] != u[:-1])
                              | ((day[1:] - day[:-1]) > 1)))
        rid = np.cumsum(brk) - 1
        rlen = np.bincount(rid)
        run_user = u[np.flatnonzero(brk)]
        g = (pd.DataFrame({"user_id": run_user, "len": rlen})
             .groupby("user_id", sort=False)["len"]
             .agg(["sum", "max"]).reset_index())
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy(np.int64),
            "n_days": g["sum"].to_numpy(np.int64),
            "max_streak": g["max"].to_numpy(np.int64)})[cols]

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")
