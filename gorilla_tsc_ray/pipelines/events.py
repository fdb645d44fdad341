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

from ..util import round_half_away

from ..context import tune_context
from ..stages.exchange import hash_exchange
from ..stages.rollup import (TIER_MS, cascade_dataset, gapfill_partition,
                             rollup_dataset)
from ..stages.series import DAY_MS, decode_blocks_batch, encode_partition
from ..util import hash_partition_ids

EVENT_COLS = ["user_id", "ts", "value"]
N_PARTS = 64


def _user_key_fn(tbl):
    """Partition id per row from the user hash (exchange key)."""
    key = tbl.column("user_id").to_pandas()
    return (pd.util.hash_pandas_object(key, index=False).to_numpy()
            % np.uint64(N_PARTS)).astype(np.int64)


def _read_points(sf_dir: str):
    """Column-pruned read + vectorized ms-epoch derivation."""
    import pyarrow.compute as pc
    import ray.data

    tune_context()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet", columns=EVENT_COLS,
                               override_num_blocks=N_PARTS)

    def to_ms(batch):
        ts_us = pc.cast(batch["ts"], "int64")  # timestamp[us] → int64 us
        ts_ms = pc.divide(ts_us, 1000)
        batch = batch.drop_columns(["ts"]).append_column("ts_ms", ts_ms)
        return batch

    return ds.map_batches(to_ms, batch_format="pyarrow")


def _encode_by_partition(keyed_ds, codec: str = "gorilla2"):
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
        key = tbl.column("user_id").to_pandas()
        h = pd.util.hash_pandas_object(key, index=False).to_numpy()
        bs = tbl.column("block_start").to_numpy(zero_copy_only=False)
        # salt with the DAY INDEX (bs is a multiple of DAY_MS, which shares
        # factors with the power-of-two partition count)
        h = h * np.uint64(1_000_003) + (bs // DAY_MS).astype(np.uint64)
        return (h % np.uint64(N_PARTS)).astype(np.int64)

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        return encode_partition(df, key_cols=["user_id"], metric_col=None,
                                codec=codec)

    return hash_exchange(keyed_ds, key_fn=key_fn, n_parts=N_PARTS,
                         kernel=enc, fmt="pandas")


def points_roundtrip_dfcm(sf_dir: str):
    """Round-trip with the DifferentialFCM predictor on both ends."""
    import pyarrow.compute as pc

    ds = _read_points(sf_dir)

    def add_block(batch):
        bs = pc.multiply(pc.divide(batch["ts_ms"], DAY_MS), DAY_MS)
        return batch.append_column("block_start", bs)

    blocks = _encode_by_partition(ds.map_batches(add_block,
                                                 batch_format="pyarrow"),
                                  codec="gorilla2_dfcm")
    return blocks.map_batches(
        decode_blocks_batch, batch_format="pandas",
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
                                  codec="gorilla1")
    return blocks.map_batches(
        decode_blocks_batch, batch_format="pandas",
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
                                                  batch_format="pyarrow"))
    points = blocks.map_batches(
        decode_blocks_batch, batch_format="pandas",
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

    def key_fn(tbl):
        key = tbl.column("user_id").to_pandas()
        h = pd.util.hash_pandas_object(key, index=False).to_numpy()
        bs = tbl.column("block_start").to_numpy(zero_copy_only=False)
        h = h * np.uint64(1_000_003) + (bs // DAY_MS).astype(np.uint64)
        return (h % np.uint64(N_PARTS)).astype(np.int64)

    def enc(df: pd.DataFrame) -> pd.DataFrame:
        return encode_partition(df, key_cols=["user_id"], metric_col=None,
                                value_kind="long")

    blocks = hash_exchange(ds.map_batches(to_cents, batch_format="pyarrow"),
                           key_fn=key_fn, n_parts=N_PARTS, kernel=enc,
                           fmt="pandas")
    pts = blocks.map_batches(decode_blocks_batch, batch_format="pandas",
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
                                                batch_format="pyarrow"))


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
    rolled = rollup_dataset(ds, key_cols=["user_id"], tier=tier)
    return _finalize_rollup(
        rolled).select_columns(["user_id", "bucket_ms", "sum_v", "cnt",
                                "min_v", "max_v", "last_v"])


def rollup_by_type(sf_dir: str, tier: str = "1h"):
    """Multi-key rollup: (user_id, event_type, bucket) — same partial+final
    machinery with a composite series key."""
    import pyarrow.compute as pc
    import ray.data

    tune_context()
    ds = ray.data.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["user_id", "event_type", "ts", "value"],
                               override_num_blocks=N_PARTS)

    def to_ms(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"), 1000)
        return batch.drop_columns(["ts"]).append_column("ts_ms", ts_ms)

    pts = ds.map_batches(to_ms, batch_format="pyarrow")
    rolled = rollup_dataset(pts, key_cols=["user_id", "event_type"], tier=tier)
    return _finalize_rollup(rolled).select_columns(
        ["user_id", "event_type", "bucket_ms", "sum_v", "cnt",
         "min_v", "max_v", "last_v"])


def rollup_1h_via_cascade(sf_dir: str):
    """1m → 1h re-aggregation (partial+final over the finer tier; never
    re-reads raw points).  Must equal the direct 1h rollup — the oracle SQL
    is the same as ``rollup(sf_dir, "1h")``'s."""
    ds = _read_points(sf_dir)
    one_m = rollup_dataset(ds, key_cols=["user_id"], tier="1m")
    one_h = cascade_dataset(one_m, key_cols=["user_id"], tier="1h")
    return _finalize_rollup(
        one_h).select_columns(["user_id", "bucket_ms", "sum_v", "cnt",
                               "min_v", "max_v", "last_v"])


def gapfill(sf_dir: str, tier: str = "1h"):
    """Gap-filled rollup: every bucket between a user's min and max bucket,
    cnt=0 / sum_v=0 / LOCF last_v on filled buckets.  Partition-level:
    users hash into bounded partitions, one vectorized multi-series
    gap-fill kernel per partition."""
    ds = _read_points(sf_dir)
    rolled = rollup_dataset(ds, key_cols=["user_id"], tier=tier)

    filled = hash_exchange(
        rolled, key_fn=_user_key_fn, n_parts=N_PARTS,
        kernel=lambda df: gapfill_partition(df, bucket_ms=TIER_MS[tier],
                                            key_cols=["user_id"]),
        fmt="pandas")

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["sum_v"] = round_half_away(df["sum_v"].to_numpy(), 6)
        return df

    return filled.map_batches(fin, batch_format="pandas").select_columns(
        ["user_id", "bucket_ms", "sum_v", "cnt", "last_v", "filled"])


def sessionize(sf_dir: str, gap_ms: int = 1_800_000):
    """Sessionization: split each user's event stream into sessions at
    inactivity gaps > ``gap_ms`` and aggregate per session — the classic
    event-time windowing operator (tumbling windows are the rollup tiers;
    this is the data-driven variant).  Per-user streams are partition-local
    after the hash shuffle; session ids are deterministic
    (user_id, session_seq)."""
    ds = _read_points(sf_dir)

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts_ms"], kind="stable")
        user = df["user_id"].to_numpy()
        ts = df["ts_ms"].to_numpy()
        v = df["value"].to_numpy()
        new_user = np.concatenate(([True], user[1:] != user[:-1]))
        gap_break = np.concatenate(([True], np.diff(ts) > gap_ms))
        new_sess = new_user | gap_break
        sess_seq = np.empty(len(df), dtype=np.int64)
        # per-user session counter: cumulative new-session count minus the
        # cumulative count at the user's first row
        cum = np.cumsum(new_sess)
        first_of_user = np.where(new_user)[0]
        base = np.repeat(cum[first_of_user],
                         np.diff(np.append(first_of_user, len(df))))
        sess_seq = cum - base  # 0-based within user
        w = pd.DataFrame({"user_id": user, "session_seq": sess_seq,
                          "ts": ts, "v": v})
        g = w.groupby(["user_id", "session_seq"], sort=False)
        out = g.agg(session_start=("ts", "min"), session_end=("ts", "max"),
                    n_events=("ts", "count"), sum_value=("v", "sum"))
        out = out.reset_index()
        out["duration_ms"] = out["session_end"] - out["session_start"]
        out["sum_value"] = round_half_away(out["sum_value"].to_numpy(), 6)
        return out

    return hash_exchange(ds, key_fn=_user_key_fn, n_parts=N_PARTS,
                         kernel=sessions, fmt="pandas")


def asof_last_match(sf_dir: str, match_type: str = "purchase"):
    """AS-OF JOIN: attach to every event the timestamp and value of the
    same user's most recent ``match_type`` event at-or-before it (−1
    sentinels when none — nullable ints decay to float64 in pandas and the
    driver hash is dtype-sensitive).

    Ray-Data-first shape for an operator the Dataset API lacks: hash whole
    users into bounded partitions (ONE shuffle), then a vectorized
    partition kernel — sort by (user, ts), ``maximum.accumulate`` over the
    match positions, same-user guard.  The right side never builds an
    index structure; the partitioning assumption is that one user's stream
    fits a partition (salt by time range like the encode path if a user
    outgrows it).  Oracle: DuckDB ``ASOF LEFT JOIN``."""
    import pyarrow.compute as pc
    import ray.data

    tune_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "user_id", "event_type", "ts", "value"],
        override_num_blocks=N_PARTS)

    def to_ms(batch):
        ts_ms = pc.divide(pc.cast(batch["ts"], "int64"), 1000)
        return batch.drop_columns(["ts"]).append_column("ts_ms", ts_ms)

    def asof_partition(df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        user = df["user_id"].to_numpy()
        ts = df["ts_ms"].to_numpy()
        eid = df["event_id"].to_numpy()
        order = np.lexsort((eid, ts, user))
        user, ts, eid = user[order], ts[order], eid[order]
        etype = df["event_type"].to_numpy()[order]
        value = df["value"].to_numpy()[order]
        pos = np.where(etype == match_type, np.arange(n), -1)
        src = np.maximum.accumulate(pos) if n else pos
        ok = src >= 0
        safe = np.where(ok, src, 0)
        ok &= user[safe] == user  # never cross a user boundary
        return pd.DataFrame({
            "event_id": eid,
            "user_id": user,
            "ts_ms": ts,
            "last_match_ts": np.where(ok, ts[safe], -1).astype(np.int64),
            "last_match_value": np.where(ok, value[safe], -1.0),
        })

    return hash_exchange(ds.map_batches(to_ms, batch_format="pyarrow"),
                         key_fn=_user_key_fn, n_parts=N_PARTS,
                         kernel=asof_partition, fmt="pandas")


def user_quantiles(sf_dir: str, qs=(0.5, 0.95, 0.99)):
    """Exact per-user value quantiles (p50/p95/p99) — the windowed
    percentile operator monitoring stacks expect.  Partition-level
    vectorized: sort (user, value) once per partition, then every user's
    quantiles come from index arithmetic over run bounds (numpy's switched
    lerp replicated exactly → bit-matches DuckDB ``quantile_cont`` after
    6-decimal rounding)."""
    ds = _read_points(sf_dir)

    def quant_partition(df: pd.DataFrame) -> pd.DataFrame:
        user = df["user_id"].to_numpy()
        val = df["value"].to_numpy()
        order = np.lexsort((val, user))
        user, val = user[order], val[order]
        change = np.concatenate(([True], user[1:] != user[:-1]))
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(user))
        cnt = ends - starts
        out = {"user_id": user[starts]}
        for q in qs:
            h = q * (cnt - 1)
            f = np.floor(h).astype(np.int64)
            t = h - f
            a = val[starts + f]
            b = val[np.minimum(starts + f + 1, ends - 1)]
            # numpy _lerp: switched form above t=0.5 for accuracy
            lerp = np.where(t < 0.5, a + t * (b - a), b - (1 - t) * (b - a))
            out[f"p{int(q * 100)}"] = round_half_away(lerp, 6)
        return pd.DataFrame(out)

    return hash_exchange(ds, key_fn=_user_key_fn, n_parts=N_PARTS,
                         kernel=quant_partition, fmt="pandas")


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

    return hash_exchange(ds, key_fn=_user_key_fn, n_parts=N_PARTS,
                         kernel=gaps_partition, fmt="pandas")
