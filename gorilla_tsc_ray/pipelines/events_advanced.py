"""Events pipelines: advanced analytics: RFM, KS/runs tests, DTW, matrix profile, survival, attribution, concurrency sweeps, funnels, streaks.

Split from the round-4 events.py monolith (round-5 verdict #9); every
function is re-exported unchanged through the ``events`` facade."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..util import arrow_col_hash, round_half_away

from ..context import tune_context
from ..stages.exchange import hash_exchange
from ..stages.rollup import (HOUR_MS, TIER_MS)
from ..stages.series import (DAY_MS)

from .events_shared import (  # noqa: F401
    GOERTZEL_C24,
    PIVOT_TYPES,
    _cents_rows,
    _n_parts,
    _read_events,
    _user_key_fn,
)
from .events_tsa import type_pivot



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


def drift_chi2(sf_dir: str, bin_cents: int = 2000):
    """Distribution DRIFT surface per event type: the value histogram of
    the FIRST event-time half vs the SECOND (cut = global
    ``(min_ts + max_ts) // 2`` epoch-ms), with the exact integer
    chi-square building block per bin — ``diff_num = c1·n2 − c2·n1``
    (the χ² term's signed numerator; squares and divisions stay
    consumer-side per the SPC integer discipline — squaring would pass
    2^63 at large sf).  Bins are ``(cents − min_cents) // bin_cents``,
    anchored at the global min so both engines floor a NON-NEGATIVE
    operand (DuckDB ``//`` truncates toward zero on negatives).

    Two passes: a per-block (min_ts, max_ts, min_c) scalar fold (the
    driver sees three ints per block), then one map pass emitting
    (type, bin, half-count) partials folded by a bounded-cardinality
    groupby; per-type half totals attach as a tiny broadcast dim."""
    import pyarrow.compute as pc

    import ray

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_type", "ts", "value"], P)

    def to_rows(t):
        import pyarrow as pa

        ts_ms = pc.divide(pc.cast(t["ts"], "int64"), 1000)
        v = t.column("value").to_numpy(zero_copy_only=False)
        cents = (np.sign(v) * np.floor(np.abs(v) * 100 + 0.5)).astype(
            np.int64)
        return pa.table({"event_type": t.column("event_type"),
                         "ts_ms": ts_ms, "c": pa.array(cents)})

    rows = ds.map_batches(to_rows, batch_format="pyarrow").materialize()

    def fold(t):
        if t.num_rows == 0:
            return pd.DataFrame({"lo": pd.Series([], dtype=np.int64),
                                 "hi": pd.Series([], dtype=np.int64),
                                 "c0": pd.Series([], dtype=np.int64)})
        ts = t.column("ts_ms").to_numpy()
        c = t.column("c").to_numpy()
        return pd.DataFrame({"lo": [np.int64(ts.min())],
                             "hi": [np.int64(ts.max())],
                             "c0": [np.int64(c.min())]})

    scal = rows.map_batches(fold, batch_format="pyarrow").to_pandas()
    cut = (int(scal["lo"].min()) + int(scal["hi"].max())) // 2
    c0 = int(scal["c0"].min())

    def partial(t):
        if t.num_rows == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "bin": pd.Series([], dtype=np.int64),
                "c1": pd.Series([], dtype=np.int64),
                "c2": pd.Series([], dtype=np.int64)})
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().astype(str),
            "bin": (t.column("c").to_numpy() - c0) // bin_cents,
            "h1": (t.column("ts_ms").to_numpy() < cut).astype(np.int64),
        })
        g = (df.groupby(["event_type", "bin"], sort=False)["h1"]
             .agg(c1="sum", c2=lambda s: np.int64(len(s)) - s.sum())
             .reset_index())
        g["c1"] = g["c1"].astype(np.int64)
        g["c2"] = g["c2"].astype(np.int64)
        return g

    parts = rows.map_batches(partial, batch_format="pyarrow")

    def key_fn(tbl):
        from ..util import arrow_key_ids

        return arrow_key_ids(tbl, ["event_type"], 8)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_type", "bin", "c1", "c2", "n1", "n2", "diff_num"]
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(
                [], dtype=object if c == "event_type" else np.int64)
                for c in cols})
        g = (df.groupby(["event_type", "bin"], sort=False)[["c1", "c2"]]
             .sum().reset_index())
        tot = g.groupby("event_type", sort=False)[["c1", "c2"]].sum()
        g["n1"] = g["event_type"].map(tot["c1"]).astype(np.int64)
        g["n2"] = g["event_type"].map(tot["c2"]).astype(np.int64)
        g["c1"] = g["c1"].astype(np.int64)
        g["c2"] = g["c2"].astype(np.int64)
        g["bin"] = g["bin"].astype(np.int64)
        g["diff_num"] = g["c1"] * g["n2"] - g["c2"] * g["n1"]
        return g[cols]

    return hash_exchange(parts, key_fn=key_fn, n_parts=8, kernel=final,
                         fmt="pandas")


def interval_overlap_join(sf_dir: str, gap_session_ms: int = 86_400_000,
                          gap_burst_ms: int = 172_800_000):
    """INTERVAL OVERLAP JOIN between two derived interval sets — the
    maintenance-window/incident shape Jaccard-style equijoins cannot
    express: per user, gap-based activity SESSIONS over non-error events
    (30 min) joined to ERROR BURSTS (5 min gaps over error events) on
    interval overlap (``s_start ≤ b_end AND b_start ≤ s_end``), emitting
    the exact overlap length in ms.

    Distribution: users co-partition (one hash exchange); inside a
    partition both interval lists derive from two grouped scans, and the
    join is TWO searchsorteds on a (user-code, relative-ts) composite
    key — sessions are disjoint and sorted within a user, so each
    burst's overlapping sessions form a contiguous index range (no
    nested loop, no cross product).  The composite is exact: relative
    timestamps bound the per-user span, user codes shift above it."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["user_id", "event_type", "ts"], P)

    def to_rows(t):
        import pyarrow as pa

        return pa.table({
            "user_id": t.column("user_id"),
            "ts_ms": pc.divide(pc.cast(t["ts"], "int64"), 1000),
            "is_err": pc.equal(t["event_type"], "error")})

    rows = ds.map_batches(to_rows, batch_format="pyarrow")

    def _intervals(u, ts, gap):
        """Sorted (user, ts) arrays → per-interval (user, start, end)."""
        if not len(u):
            e = np.array([], np.int64)
            return e, e, e
        new = np.concatenate(([True], (u[1:] != u[:-1])
                              | (np.diff(ts) > gap)))
        starts = np.flatnonzero(new)
        ends = np.append(starts[1:], len(u)) - 1
        return u[starts], ts[starts], ts[ends]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "s_start", "s_end", "b_start", "b_end",
                "overlap_ms"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        u = df["user_id"].to_numpy(np.int64)
        ts = df["ts_ms"].to_numpy(np.int64)
        err = df["is_err"].to_numpy(bool)
        order = np.lexsort((ts, u))
        u, ts, err = u[order], ts[order], err[order]
        su, ss, se = _intervals(u[~err], ts[~err], gap_session_ms)
        bu, bs, be = _intervals(u[err], ts[err], gap_burst_ms)
        if not len(su) or not len(bu):
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        lo = int(ts.min())
        K = np.int64(int(ts.max()) - lo + 2)
        users = np.unique(np.concatenate((su, bu)))
        cs = np.searchsorted(users, su).astype(np.int64)
        cb = np.searchsorted(users, bu).astype(np.int64)
        # sessions disjoint per user → (user, end) sorted like (user, start)
        comp_end = cs * K + (se - lo)
        comp_start = cs * K + (ss - lo)
        first = np.searchsorted(comp_end, cb * K + (bs - lo), side="left")
        last = np.searchsorted(comp_start, cb * K + (be - lo),
                               side="right")
        counts = np.maximum(last - first, 0)
        total = int(counts.sum())
        if total == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        b_idx = np.repeat(np.arange(len(bu)), counts)
        offs = np.concatenate(([0], np.cumsum(counts)))[:-1]
        s_idx = (np.arange(total)
                 + np.repeat(first - offs, counts)).astype(np.int64)
        ov = (np.minimum(se[s_idx], be[b_idx])
              - np.maximum(ss[s_idx], bs[b_idx]))
        return pd.DataFrame({
            "user_id": su[s_idx], "s_start": ss[s_idx],
            "s_end": se[s_idx], "b_start": bs[b_idx],
            "b_end": be[b_idx], "overlap_ms": ov.astype(np.int64)})

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def spearman_pairs(sf_dir: str):
    """SPEARMAN RANK CORRELATION between every event-type pair's hourly
    count series — the tie-safe form (Pearson over average ranks), with
    every emitted column an exact integer: double-ranks ``R2 = 2·minrank
    + ties − 1`` (average ranks are half-integers, so doubling keeps
    them integral), numerator ``n·ΣR2S2 − ΣR2·ΣS2`` and the two
    variance numerators; the consumer divides by the square roots
    (the SPC integer discipline — both engines never touch a float).

    Series align on the FULL global hour grid (zeros filled): rank
    correlation needs identical support.  Shuffle shape: per-block
    (type, hour) count partials → ONE tiny reduce (the series table is
    bounded by types × hours, not events) where ranks and all 10 pair
    sums are vectorized."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_type", "ts"], P)

    def partial(t):
        import pyarrow as pa

        if t.num_rows == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "hour": pd.Series([], dtype=np.int64),
                "cnt": pd.Series([], dtype=np.int64)})
        hour = pc.divide(pc.divide(pc.cast(t["ts"], "int64"), 1000),
                         3_600_000)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().astype(str),
            "hour": hour.to_numpy()})
        g = (df.groupby(["event_type", "hour"], sort=False).size()
             .rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def _double_ranks(c: np.ndarray) -> np.ndarray:
        """Average ranks ×2 as exact ints (1-based min-rank form)."""
        order = np.argsort(c, kind="stable")
        cs = c[order]
        new = np.concatenate(([True], cs[1:] != cs[:-1]))
        starts = np.flatnonzero(new)
        ties = np.diff(np.append(starts, len(cs)))
        gid = np.cumsum(new) - 1
        r2_sorted = 2 * (starts[gid] + 1) + ties[gid] - 1
        out = np.empty(len(c), np.int64)
        out[order] = r2_sorted
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["type_a", "type_b", "n", "num", "den_a", "den_b"]
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(
                [], dtype=object if c in ("type_a", "type_b")
                else np.int64) for c in cols})
        g = (df.groupby(["event_type", "hour"], sort=False)["cnt"]
             .sum().reset_index())
        h0, h1 = int(g["hour"].min()), int(g["hour"].max())
        grid = np.arange(h0, h1 + 1, dtype=np.int64)
        types = sorted(g["event_type"].unique())
        series = {}
        for ty in types:
            s = np.zeros(len(grid), np.int64)
            sub = g[g["event_type"] == ty]
            s[sub["hour"].to_numpy(np.int64) - h0] = \
                sub["cnt"].to_numpy(np.int64)
            series[ty] = _double_ranks(s)
        n = np.int64(len(grid))
        out = {c: [] for c in cols}
        for i, ta in enumerate(types):
            for tb in types[i + 1:]:
                r, s = series[ta], series[tb]
                sr, ss = r.sum(), s.sum()
                out["type_a"].append(ta)
                out["type_b"].append(tb)
                out["n"].append(n)
                out["num"].append(n * np.dot(r, s) - sr * ss)
                out["den_a"].append(n * np.dot(r, r) - sr * sr)
                out["den_b"].append(n * np.dot(s, s) - ss * ss)
        res = pd.DataFrame(out)
        for c in ("n", "num", "den_a", "den_b"):
            res[c] = res[c].astype(np.int64)
        return res

    return hash_exchange(
        parts, key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1, kernel=final, fmt="pandas")


def ma_crossover(sf_dir: str, w_short: int = 3, w_long: int = 8):
    """Moving-average CROSSOVER detection per user (the golden/death-
    cross signal shape): trailing w_short- vs w_long-row mean over cents
    in time order, compared EXACTLY by cross-multiplication
    (``s_short·w_long  vs  s_long·w_short`` — no float means), emitting
    one row per sign change once both windows are full.  ``direction``
    = +1 when the short mean crosses above (fast regime), −1 below.
    Per-user rolling sums are two prefix-sum differences inside the
    co-partitioned kernel; the SQL mirror is two ROWS-frame window sums
    plus a lag."""
    tune_context()
    P = _n_parts(sf_dir)
    rows = _cents_rows(sf_dir, P)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["user_id", "ts_ms", "direction", "s_short", "s_long"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        u = df["user_id"].to_numpy(np.int64)
        ts = (df["ts_us"].to_numpy(np.int64) // 1000)
        c = df["c"].to_numpy(np.int64)
        order = np.lexsort((ts, u))
        u, ts, c = u[order], ts[order], c[order]
        first = np.concatenate(([True], u[1:] != u[:-1]))
        gstart = np.flatnonzero(first)
        glen = np.diff(np.append(gstart, len(u)))
        # per-user row index
        ridx = np.arange(len(u)) - np.repeat(gstart, glen)
        pre = np.cumsum(c)
        base = np.concatenate(([0], pre[:-1]))  # prefix EXCLUSIVE
        # rolling sums valid where ridx >= w-1; window start is the same
        # user by construction when valid

        def rsum(w):
            lo = np.maximum(np.arange(len(u)) - w + 1, 0)
            s = pre - base[lo]
            return np.where(ridx >= w - 1, s, np.int64(0))

        s_s, s_l = rsum(w_short), rsum(w_long)
        valid = ridx >= w_long - 1
        above = (s_s * w_long > s_l * w_short) & valid
        # sign change vs the previous VALID row of the same user
        prev_valid = np.concatenate(([False], valid[:-1])) & ~first
        chg = valid & prev_valid & (
            above != np.concatenate(([False], above[:-1])))
        if not chg.any():
            return pd.DataFrame({c_: np.array([], np.int64)
                                 for c_ in cols})
        idx = np.flatnonzero(chg)
        return pd.DataFrame({
            "user_id": u[idx], "ts_ms": ts[idx],
            "direction": np.where(above[idx], 1, -1).astype(np.int64),
            "s_short": s_s[idx], "s_long": s_l[idx]})

    return hash_exchange(rows, key_fn=_user_key_fn(P), n_parts=P,
                         kernel=kernel, fmt="pandas")


def fano_dispersion(sf_dir: str):
    """Poisson OVERDISPERSION audit per event type (the burst detector's
    statistical cousin): the Fano factor variance/mean of the hourly
    count series over the full global hour grid (zeros filled), emitted
    as exact integer numerators — ``fano_num = n·Σx² − (Σx)²``,
    ``fano_den = n·Σx`` — so Fano = num/den stays consumer-side (a
    Poisson process has Fano ≈ 1; bursty types blow past it).  Same
    bounded shuffle as :func:`spearman_pairs`: per-block (type, hour)
    partials, one types×hours-bounded reduce."""
    import pyarrow.compute as pc

    tune_context()
    P = _n_parts(sf_dir)
    ds = _read_events(sf_dir, ["event_type", "ts"], P)

    def partial(t):
        if t.num_rows == 0:
            return pd.DataFrame({
                "event_type": pd.Series([], dtype=object),
                "hour": pd.Series([], dtype=np.int64),
                "cnt": pd.Series([], dtype=np.int64)})
        hour = pc.divide(pc.divide(pc.cast(t["ts"], "int64"), 1000),
                         3_600_000)
        df = pd.DataFrame({
            "event_type": t.column("event_type").to_pandas().astype(str),
            "hour": hour.to_numpy()})
        g = (df.groupby(["event_type", "hour"], sort=False).size()
             .rename("cnt").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["event_type", "n_hours", "sum_c", "sum_c2", "fano_num",
                "fano_den"]
        if len(df) == 0:
            return pd.DataFrame({c: pd.Series(
                [], dtype=object if c == "event_type" else np.int64)
                for c in cols})
        g = (df.groupby(["event_type", "hour"], sort=False)["cnt"]
             .sum().reset_index())
        n = np.int64(int(g["hour"].max()) - int(g["hour"].min()) + 1)
        agg = g.groupby("event_type", sort=False)["cnt"].agg(
            sum_c="sum", sum_c2=lambda s: np.int64(
                (s.to_numpy(np.int64) ** 2).sum())).reset_index()
        agg["n_hours"] = n
        agg["sum_c"] = agg["sum_c"].astype(np.int64)
        agg["sum_c2"] = agg["sum_c2"].astype(np.int64)
        agg["fano_num"] = n * agg["sum_c2"] - agg["sum_c"] ** 2
        agg["fano_den"] = n * agg["sum_c"]
        return agg[cols]

    return hash_exchange(
        parts, key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1, kernel=final, fmt="pandas")
