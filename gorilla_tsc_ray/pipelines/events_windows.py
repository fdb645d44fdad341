"""Events pipelines: per-user aggregates, quantiles/sketches, seasonal analysis, OHLC/VWAP, grouping sets, cohort/window analytics.

Split from the round-4 events.py monolith (round-5 verdict #9); every
function is re-exported unchanged through the ``events`` facade."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..util import arrow_col_hash, round_half_away

from ..context import tune_context
from ..stages.exchange import hash_exchange
from ..stages.rollup import (TIER_MS, cascade_dataset,
                             partial_rollup_arrow)
from ..stages.rollup import finalize_by_partition
from ..stages.series import (DAY_MS)

from .events_shared import (  # noqa: F401
    EVENT_COLS,
    N_PARTS,
    _cents_rows,
    _count_partial_arrow,
    _n_parts,
    _read_events,
    _read_points,
    _streaming_gate,
    _user_key_fn,
)



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
