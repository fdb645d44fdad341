"""Events pipelines: codec round-trips, block encode, rollup tiers, streaming ingest gates, window joins, sessionization, as-of joins.

Split from the round-4 events.py monolith (round-5 verdict #9); every
function is re-exported unchanged through the ``events`` facade."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..util import arrow_col_hash, round_half_away

from ..context import tune_context
from ..stages.exchange import hash_exchange, hash_exchange_multi
from ..stages.rollup import (HOUR_MS, TIER_MS, cascade_dataset,
                             gapfill_partition, partial_rollup_arrow, reaggregate_partials_arrow, rollup_dataset)
from ..stages.rollup import finalize_by_partition
from ..stages.series import (DAY_MS, decode_blocks_batch,
                             decode_blocks_batch_arrow, encode_partition_arrow)

from .events_shared import (  # noqa: F401
    EVENT_COLS,
    HEAVY_PARTITION_ROWS,
    _count_partial_arrow,
    _encode_by_partition,
    _est_rows,
    _finalize_rollup,
    _n_parts,
    _read_events,
    _read_points,
    _sessions_kernel,
    _streaming_gate,
    _user_key_fn,
)



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


def streaming_replay(sf_dir: str, n_actors: int = 4):
    """REPLAY-IDEMPOTENCY gate for the streaming ingest operator — the
    at-least-once-delivery story: the whole event stream feeds the
    router TWICE (an upstream retry replaying the entire source), and
    the sealed output must STILL equal the batch round-trip exactly —
    every replayed point arrives at-or-behind its series watermark and
    is rejected, so duplicate delivery cannot corrupt sealed blocks.
    A runtime assert proves the second pass was fully rejected (late
    count == stream length)."""
    import os

    from ..state.streaming import feed_parquet_distributed

    tune_context()
    from ..state.streaming import StreamingRouter

    router = StreamingRouter(n_actors=n_actors)
    path = f"{sf_dir.rstrip('/')}/events.parquet"
    if not os.path.exists(path):
        raise FileNotFoundError(path)
    n1 = feed_parquet_distributed(router, path, order_cols=["ts_ms"])
    n2 = feed_parquet_distributed(router, path, order_cols=["ts_ms"])
    stats = router.stats()
    if n2 != 0 or stats["late"] < n1:
        raise RuntimeError(
            f"replay was not fully rejected: second pass accepted {n2}, "
            f"late={stats['late']} of {n1}")
    blocks = pd.DataFrame(router.seal())

    import ray.data

    def decode(df: pd.DataFrame) -> pd.DataFrame:
        out = decode_blocks_batch(df, key_cols=["key"])
        return pd.DataFrame({
            "user_id": out["key"].astype(np.int64),
            "ts_ms": out["ts_ms"],
            "value": out["value"]})

    return ray.data.from_pandas(blocks).map_batches(
        decode, batch_format="pandas")
