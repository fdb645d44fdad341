"""Shared helpers for the events_* pipeline family (split from the
round-4 events.py monolith; public surface unchanged via the events
facade): table readers, partition sizing, exchange key functions, the
salted encode partitioner, rollup finalization and the cents-row
normalizer every family module builds on."""

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


def _finalize_rollup(ds):
    """Shared projection: round sum_v to 6 decimals (cross-engine float-sum
    association differences), drop the internal last_ts column."""

    def fin(df: pd.DataFrame) -> pd.DataFrame:
        out = df.drop(columns=["last_ts"])
        out["sum_v"] = round_half_away(out["sum_v"].to_numpy(), 6)
        return out

    return ds.map_batches(fin, batch_format="pandas")


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


PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


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


# 2·cos(2π/24) as a SHARED decimal literal: both engines parse the same
# double, so the Goertzel recurrence walks identical IEEE-754 paths
# (the holt_linear discipline — never call cos() on either side).
GOERTZEL_C24 = 1.9318516525781366
