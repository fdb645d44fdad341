"""Continuous-aggregate rollup stages (1m / 1h / 1d tiers).

The reference library has no aggregation operators (it is a storage codec);
these stages implement the north-rule tier cascade Ray-Data-first:

- **partial** aggregation inside ``map_batches`` (a combiner: one output row
  per (key, bucket) per input batch) so the all-to-all groupby shuffle moves
  partial rows, not raw points;
- **final** merge per group after ``groupby`` — sum of sums, min of mins,
  max of maxes, last by max last_ts.  ``last`` is not expressible with Ray's
  built-in aggregates, hence the explicit partial/final kernels
  (SURVEY.md §2b "Aggregations").
- **cascade**: the 1h/1d tiers re-aggregate the 1m partials — coarser tiers
  never re-read raw points (partial+final re-aggregation; retention can drop
  raw blocks once coarser tiers are materialized).

All kernels are vectorized pandas/numpy; no Python row loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

MINUTE_MS = 60_000
HOUR_MS = 3_600_000
DAY_MS = 86_400_000
TIER_MS = {"1m": MINUTE_MS, "1h": HOUR_MS, "1d": DAY_MS}

PARTIAL_COLS = ["sum_v", "cnt", "min_v", "max_v", "last_ts", "last_v"]


def partial_rollup(df: pd.DataFrame, *, key_cols: list[str], bucket_ms: int,
                   ts_col: str = "ts_ms", value_col: str = "value") -> pd.DataFrame:
    """Combiner: per-batch partial aggregate, one row per (key, bucket)."""
    if len(df) == 0:
        cols = {c: [] for c in key_cols + ["bucket_ms"] + PARTIAL_COLS}
        return pd.DataFrame(cols)
    df = df.sort_values(ts_col, kind="stable")
    bucket = (df[ts_col].to_numpy() // bucket_ms) * bucket_ms
    work = pd.DataFrame({
        "bucket_ms": bucket,
        "v": df[value_col].to_numpy(),
        "ts": df[ts_col].to_numpy(),
    })
    for c in key_cols:
        work[c] = df[c].to_numpy()
    g = work.groupby(key_cols + ["bucket_ms"], sort=False, observed=True)
    out = g["v"].agg(sum_v="sum", cnt="count", min_v="min", max_v="max")
    tail = g[["ts", "v"]].last()  # rows are ts-sorted → last = latest
    out["last_ts"] = tail["ts"]
    out["last_v"] = tail["v"]
    return out.reset_index()


_PARTIAL_RENAME = {"v_sum": "sum_v", "v_count": "cnt", "v_min": "min_v",
                   "v_max": "max_v", "ts_last": "last_ts", "v_last": "last_v"}


def partial_rollup_arrow(tbl, *, key_cols: list[str], bucket_ms: int,
                         ts_col: str = "ts_ms", value_col: str = "value"):
    """Arrow-in/Arrow-out twin of :func:`partial_rollup` (pinned equal by
    ``tests/test_rollup_arrow.py``): one ``Table.group_by`` C kernel per
    batch instead of a pandas groupby over object-dtype keys.  ``last``
    semantics match the pandas kernel because Arrow's ``sort_by`` is
    stable and ``use_threads=False`` keeps hash-aggregate scan order."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        cols = {c: tbl.column(c) for c in key_cols}
        cols["bucket_ms"] = pa.array([], pa.int64())
        for c, t in (("sum_v", pa.float64()), ("cnt", pa.int64()),
                     ("min_v", pa.float64()), ("max_v", pa.float64()),
                     ("last_ts", pa.int64()), ("last_v", pa.float64())):
            cols[c] = pa.array([], t)
        return pa.table(cols)
    work = pa.table({**{c: tbl.column(c) for c in key_cols},
                     "ts": tbl.column(ts_col), "v": tbl.column(value_col)})
    work = work.sort_by("ts")
    bucket = pc.multiply(pc.divide(work.column("ts"), bucket_ms), bucket_ms)
    work = work.append_column("bucket_ms", bucket)
    agg = work.group_by(key_cols + ["bucket_ms"], use_threads=False).aggregate(
        [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max"),
         ("ts", "last"), ("v", "last")])
    agg = agg.rename_columns([_PARTIAL_RENAME.get(c, c)
                              for c in agg.schema.names])
    return agg.select(key_cols + ["bucket_ms"] + PARTIAL_COLS)


def reaggregate_partials_arrow(tbl, *, key_cols: list[str], bucket_ms: int):
    """Arrow twin of :func:`reaggregate_partials` (pinned equal by test)."""
    import pyarrow.compute as pc

    if tbl.num_rows == 0:
        return tbl
    bucket = pc.multiply(pc.divide(tbl.column("bucket_ms"), bucket_ms),
                         bucket_ms)
    tbl = tbl.set_column(tbl.schema.get_field_index("bucket_ms"),
                         "bucket_ms", bucket)
    tbl = tbl.sort_by("last_ts")
    agg = tbl.group_by(key_cols + ["bucket_ms"], use_threads=False).aggregate(
        [("sum_v", "sum"), ("cnt", "sum"), ("min_v", "min"),
         ("max_v", "max"), ("last_ts", "last"), ("last_v", "last")])
    ren = {"sum_v_sum": "sum_v", "cnt_sum": "cnt", "min_v_min": "min_v",
           "max_v_max": "max_v", "last_ts_last": "last_ts",
           "last_v_last": "last_v"}
    agg = agg.rename_columns([ren.get(c, c) for c in agg.schema.names])
    return agg.select(key_cols + ["bucket_ms"] + PARTIAL_COLS)


def merge_partials(df: pd.DataFrame) -> pd.DataFrame:
    """Final merge of partial rows for ONE (key, bucket) group."""
    i_last = int(np.argmax(df["last_ts"].to_numpy()))
    first = df.iloc[:1]
    out = {c: first[c].to_numpy() for c in df.columns
           if c not in PARTIAL_COLS}
    out.update({
        "sum_v": [float(df["sum_v"].sum())],
        "cnt": [int(df["cnt"].sum())],
        "min_v": [float(df["min_v"].min())],
        "max_v": [float(df["max_v"].max())],
        "last_ts": [int(df["last_ts"].iloc[i_last])],
        "last_v": [float(df["last_v"].iloc[i_last])],
    })
    return pd.DataFrame(out)


def merge_partials_partition(df: pd.DataFrame, *, key_cols: list[str]) -> pd.DataFrame:
    """Vectorized final merge for a whole HASH PARTITION of (key, bucket)
    groups — one pandas groupby call per partition instead of one Python
    call per group (a per-group UDF at 1m granularity would mean millions
    of interpreter calls at scale).  Equivalent to :func:`merge_partials`
    applied per group."""
    if len(df) == 0:
        return df.drop(columns=["_part"], errors="ignore")
    df = df.sort_values("last_ts", kind="stable")
    g = df.groupby(key_cols + ["bucket_ms"], sort=False, observed=True)
    out = g.agg(sum_v=("sum_v", "sum"), cnt=("cnt", "sum"),
                min_v=("min_v", "min"), max_v=("max_v", "max"),
                last_ts=("last_ts", "last"), last_v=("last_v", "last"))
    return out.reset_index()


def _hash_cols(df: pd.DataFrame, cols: list[str], n_parts: int) -> np.ndarray:
    """Deterministic partition id from string/int key columns."""
    from ..util import hash_partition_ids

    return hash_partition_ids(df, cols, n_parts)


def finalize_by_partition(partial_ds, *, key_cols: list[str],
                          n_parts: int = 64):
    """Hash-partitioned final merge: ONE exchange on hash(key, bucket)
    (bounded cardinality, skew-resistant — hot (key,bucket) groups are
    still tiny after the in-batch combiner), vectorized merge per
    partition.  Uses the raw-Ray hash exchange (``stages/exchange.py``)
    instead of the sort-based groupby."""
    from .exchange import hash_exchange

    def key_fn(tbl):
        df = tbl.select(key_cols + ["bucket_ms"]).to_pandas()
        return _hash_cols(df, key_cols + ["bucket_ms"], n_parts)

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        return merge_partials_partition(df, key_cols=key_cols)

    return hash_exchange(partial_ds, key_fn=key_fn, n_parts=n_parts,
                         kernel=merge, fmt="pandas")


def reaggregate_partials(df: pd.DataFrame, *, key_cols: list[str],
                         bucket_ms: int) -> pd.DataFrame:
    """Tier cascade combiner: re-bucket finer-tier partial/final rows to a
    coarser bucket and merge decomposably (sum/sum, min/min, max/max,
    argmax-last_ts) — runs inside map_batches before the coarse groupby."""
    if len(df) == 0:
        return df
    df = df.copy()
    df["bucket_ms"] = (df["bucket_ms"].to_numpy() // bucket_ms) * bucket_ms
    # order by last_ts so .last() picks the argmax within each group
    df = df.sort_values("last_ts", kind="stable")
    g = df.groupby(key_cols + ["bucket_ms"], sort=False, observed=True)
    out = g.agg(sum_v=("sum_v", "sum"), cnt=("cnt", "sum"),
                min_v=("min_v", "min"), max_v=("max_v", "max"),
                last_ts=("last_ts", "last"), last_v=("last_v", "last"))
    return out.reset_index()


def rollup_dataset(points_ds, *, key_cols: list[str], tier: str,
                   ts_col: str = "ts_ms", value_col: str = "value",
                   n_parts: int = 64):
    """points Dataset → finalized rollup Dataset for one tier.

    Shuffle economics: the only all-to-all exchange is the groupby on
    (key, bucket) over *partial* rows; the combiner has already collapsed
    each input block to ≤ one row per (key, bucket).
    """
    bucket_ms = TIER_MS[tier]
    partial = points_ds.map_batches(
        partial_rollup_arrow,
        fn_kwargs={"key_cols": key_cols, "bucket_ms": bucket_ms,
                   "ts_col": ts_col, "value_col": value_col},
        batch_format="pyarrow",
    )
    return finalize_by_partition(partial, key_cols=key_cols, n_parts=n_parts)


def cascade_dataset(finer_rollup_ds, *, key_cols: list[str], tier: str,
                    n_parts: int = 64):
    """1m rollup Dataset → coarser tier via partial+final re-aggregation."""
    bucket_ms = TIER_MS[tier]
    partial = finer_rollup_ds.map_batches(
        reaggregate_partials_arrow,
        fn_kwargs={"key_cols": key_cols, "bucket_ms": bucket_ms},
        batch_format="pyarrow",
    )
    return finalize_by_partition(partial, key_cols=key_cols, n_parts=n_parts)


def gapfill_partition(df: pd.DataFrame, *, bucket_ms: int,
                      key_cols: list[str]) -> pd.DataFrame:
    """Vectorized gap-fill for MANY series in one partition — identical
    semantics to :func:`gapfill_group` applied per series (tested), with
    one numpy pass instead of one Python call per series (per-group UDFs
    are ms × series-count at scale)."""
    out_cols = key_cols + ["bucket_ms", "sum_v", "cnt", "last_v", "filled"]
    if len(df) == 0:
        return pd.DataFrame({c: [] for c in out_cols})
    codes = np.zeros(len(df), dtype=np.int64)
    for c in key_cols:
        cc, _ = pd.factorize(df[c], sort=False)
        codes = codes * np.int64(cc.max() + 1) + cc
    bucket = df["bucket_ms"].to_numpy()
    order = np.lexsort((bucket, codes))
    codes = codes[order]
    bucket = bucket[order]
    sum_v = df["sum_v"].to_numpy()[order]
    cnt = df["cnt"].to_numpy()[order]
    last_v = df["last_v"].to_numpy()[order]

    change = np.concatenate(([True], codes[1:] != codes[:-1]))
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(codes))
    lo = bucket[starts]
    hi = bucket[ends - 1]
    counts = (hi - lo) // bucket_ms + 1
    total = int(counts.sum())
    g_off = np.concatenate(([0], np.cumsum(counts)[:-1]))
    rep = np.repeat(np.arange(len(starts)), counts)
    within = np.arange(total) - np.repeat(g_off, counts)
    grid_bucket = lo[rep] + within * bucket_ms

    row_series = np.repeat(np.arange(len(starts)), ends - starts)
    gpos = g_off[row_series] + (bucket - lo[row_series]) // bucket_ms

    o_sum = np.zeros(total, dtype=np.float64)
    o_cnt = np.zeros(total, dtype=np.int64)
    o_last = np.zeros(total, dtype=np.float64)
    filled = np.ones(total, dtype=bool)
    o_sum[gpos] = sum_v
    o_cnt[gpos] = cnt
    o_last[gpos] = last_v
    filled[gpos] = False
    # LOCF: most recent present grid index ≤ each point; every series'
    # first grid point is present (lo comes from its own data), so the
    # global accumulate resets naturally at series boundaries
    src = np.maximum.accumulate(np.where(filled, -1, np.arange(total)))
    o_last = o_last[src]

    out = {c: df[c].to_numpy()[order][starts][rep] for c in key_cols}
    out["bucket_ms"] = grid_bucket
    out["sum_v"] = o_sum
    out["cnt"] = o_cnt
    out["last_v"] = o_last
    out["filled"] = filled
    return pd.DataFrame(out)[out_cols]


def quantiles_by_key(df: pd.DataFrame, *, key_col: str,
                     value_col: str = "value",
                     qs=(0.5, 0.95, 0.99)) -> pd.DataFrame:
    """Exact per-key quantiles for MANY keys in one partition: sort
    (key, value) once, then every key's quantiles come from index
    arithmetic over run bounds.  The lerp replicates numpy's switched form
    exactly, which bit-matches DuckDB ``quantile_cont`` after the 6-decimal
    round (shared by events.user_quantiles and ingest.gap_quantiles)."""
    from ..util import round_half_away

    cols = [key_col] + [f"p{int(q * 100)}" for q in qs]
    if len(df) == 0:
        return pd.DataFrame({c: [] for c in cols})
    codes, keys = pd.factorize(df[key_col], sort=False)
    val = df[value_col].to_numpy()
    order = np.lexsort((val, codes))
    k, v = codes[order], val[order]
    change = np.concatenate(([True], k[1:] != k[:-1]))
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(k))
    cnt = ends - starts
    out = {key_col: np.asarray(keys)[k[starts]]}
    for q in qs:
        h = q * (cnt - 1)
        f = np.floor(h).astype(np.int64)
        t = h - f
        a = v[starts + f]
        b = v[np.minimum(starts + f + 1, ends - 1)]
        lerp = np.where(t < 0.5, a + t * (b - a), b - (1 - t) * (b - a))
        out[f"p{int(q * 100)}"] = round_half_away(lerp, 6)
    return pd.DataFrame(out)[cols]


def interp_partition(df: pd.DataFrame, *, bucket_ms: int,
                     key_cols: list[str]) -> pd.DataFrame:
    """Linear-interpolation gap-fill for MANY series in one partition
    (vs :func:`gapfill_partition`'s LOCF): a filled bucket's ``v`` is the
    straight line between the nearest PRESENT buckets on each side.  Both
    neighbours always exist — each series' grid is bounded by its own
    min/max present bucket — and can never belong to another series, so one
    global accumulate pass per direction serves every series at once."""
    out_cols = key_cols + ["bucket_ms", "v", "filled"]
    if len(df) == 0:
        return pd.DataFrame({c: [] for c in out_cols})
    codes = np.zeros(len(df), dtype=np.int64)
    for c in key_cols:
        cc, _ = pd.factorize(df[c], sort=False)
        codes = codes * np.int64(cc.max() + 1) + cc
    bucket = df["bucket_ms"].to_numpy()
    order = np.lexsort((bucket, codes))
    codes = codes[order]
    bucket = bucket[order]
    sum_v = df["sum_v"].to_numpy()[order]

    change = np.concatenate(([True], codes[1:] != codes[:-1]))
    starts = np.flatnonzero(change)
    ends = np.append(starts[1:], len(codes))
    lo = bucket[starts]
    hi = bucket[ends - 1]
    counts = (hi - lo) // bucket_ms + 1
    total = int(counts.sum())
    g_off = np.concatenate(([0], np.cumsum(counts)[:-1]))
    rep = np.repeat(np.arange(len(starts)), counts)
    within = np.arange(total) - np.repeat(g_off, counts)
    grid_bucket = lo[rep] + within * bucket_ms

    row_series = np.repeat(np.arange(len(starts)), ends - starts)
    gpos = g_off[row_series] + (bucket - lo[row_series]) // bucket_ms

    o_sum = np.zeros(total, dtype=np.float64)
    filled = np.ones(total, dtype=bool)
    o_sum[gpos] = sum_v
    filled[gpos] = False
    idx = np.arange(total)
    prev_src = np.maximum.accumulate(np.where(filled, -1, idx))
    # next present index ≥ i: accumulate over REVERSED positions (idx is the
    # reversed position there), then map back with total-1-·
    next_src = total - 1 - np.maximum.accumulate(
        np.where(filled[::-1], -1, idx))[::-1]
    pv, pb = o_sum[prev_src], grid_bucket[prev_src]
    nv, nb = o_sum[next_src], grid_bucket[next_src]
    with np.errstate(invalid="ignore", divide="ignore"):
        v = np.where(filled,
                     pv + (nv - pv) * (grid_bucket - pb) / (nb - pb), o_sum)

    out = {c: df[c].to_numpy()[order][starts][rep] for c in key_cols}
    out["bucket_ms"] = grid_bucket
    out["v"] = v
    out["filled"] = filled
    return pd.DataFrame(out)[out_cols]


def gapfill_group(df: pd.DataFrame, *, bucket_ms: int,
                  key_cols: list[str]) -> pd.DataFrame:
    """map_groups UDF: fill empty buckets for ONE series between its min and
    max bucket.  Filled rows get cnt=0, sum_v=0.0, last_v carried forward
    (LOCF), ``filled=True``.  A gap in the reference's data model is simply
    an absent point (SURVEY.md §1.1); gap-fill is an engine-level feature.
    """
    df = df.sort_values("bucket_ms", kind="stable")
    lo = int(df["bucket_ms"].iloc[0])
    hi = int(df["bucket_ms"].iloc[-1])
    grid = np.arange(lo, hi + bucket_ms, bucket_ms, dtype=np.int64)
    present = pd.Index(df["bucket_ms"].to_numpy())
    pos = present.get_indexer(grid)  # -1 where missing
    missing = pos < 0
    out = pd.DataFrame({"bucket_ms": grid})
    for c in key_cols:
        out[c] = df[c].iloc[0]
    take = np.where(missing, 0, pos)
    out["sum_v"] = np.where(missing, 0.0, df["sum_v"].to_numpy()[take])
    out["cnt"] = np.where(missing, 0, df["cnt"].to_numpy()[take])
    # LOCF for last_v: index of the most recent present bucket ≤ grid point
    src = np.maximum.accumulate(np.where(missing, -1, np.arange(len(grid))))
    src_pos = pos[src]  # src >= 0 always (first grid point is present)
    out["last_v"] = df["last_v"].to_numpy()[src_pos]
    out["filled"] = missing
    return out[key_cols + ["bucket_ms", "sum_v", "cnt", "last_v", "filled"]]
