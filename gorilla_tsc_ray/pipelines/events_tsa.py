"""Events pipelines: time-series mining: downsampling (M4/PAA/SAX/Haar/LTTB), control charts, changepoints, sketch families, session journeys, bitmaps.

Split from the round-4 events.py monolith (round-5 verdict #9); every
function is re-exported unchanged through the ``events`` facade."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..util import arrow_col_hash, round_half_away

from ..context import tune_context
from ..stages.exchange import hash_exchange, hash_exchange_multi
from ..stages.rollup import (TIER_MS)

from .events_shared import (  # noqa: F401
    PIVOT_TYPES,
    _bitlen_u64,
    _cents_rows,
    _global_ntile,
    _n_parts,
    _read_events,
    _user_key_fn,
)



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
