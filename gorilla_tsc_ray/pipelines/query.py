"""Query/decode path over a materialized block store.

Mirrors the reference's read path (``GorillaDecompressor`` streaming
iteration) lifted to Ray Data: Parquet-level pruning first (hive ``day``
partitions + ``block_start`` row filters — the block header timestamp is
the prune key, as implied by the 64-bit header at
``GorillaCompressor.java:39-41``), then stateless vectorized decode, then
exact time-range trim on the decoded points.
"""

from __future__ import annotations

import pandas as pd

import numpy as np

from ..context import tune_context
from ..stages.series import DAY_MS, decode_blocks_batch_arrow


BLOOM_M_BITS = 1 << 17       # 16 KiB per day partition
BLOOM_K = 4


def _bloom_positions(conv_ids, m_bits: int = BLOOM_M_BITS,
                     k: int = BLOOM_K) -> np.ndarray:
    """Deterministic bloom bit positions per conv id: md5 double hashing
    (h1 + i·h2 mod m, the standard Kirsch–Mitzenmacher construction) —
    no library dependence, identical bits on every node."""
    import hashlib

    out = np.empty((len(conv_ids), k), dtype=np.int64)
    for r, cid in enumerate(conv_ids):
        d = hashlib.md5(str(cid).encode()).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:], "little") | 1
        for i in range(k):
            out[r, i] = (h1 + i * h2) % m_bits
    return out


def build_conv_bloom(store_root: str, m_bits: int = BLOOM_M_BITS,
                     k: int = BLOOM_K) -> str:
    """Build the PER-DAY conv-id BLOOM sidecar for a block store — the
    point-lookup index: one bitmap per ``blocks/day=D`` partition over
    the distinct conv_ids it holds, so a conv-filtered scan can skip
    whole day partitions whose bloom proves absence (false positives
    only cost a wasted read; never a wrong row).  Distributed build —
    one Ray task per day partition (reads ONLY the conv_id column);
    the sidecar is day-count × 16 KiB, a metadata-scale artifact."""
    import glob
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    tune_context()

    @ray.remote
    def one_day(pdir: str, day: int):
        import pyarrow.parquet as _pq

        convs = set()
        for f in sorted(glob.glob(os.path.join(pdir, "*.parquet"))):
            col = _pq.read_table(f, columns=["conv_id"]).column("conv_id")
            convs.update(col.to_pylist())
        bits = np.zeros(m_bits // 64, dtype=np.uint64)
        if convs:
            pos = _bloom_positions(sorted(convs), m_bits, k).ravel()
            np.bitwise_or.at(bits, pos // 64,
                             np.uint64(1) << (pos % 64).astype(np.uint64))
        return day, bits.tobytes()

    days = []
    for name in sorted(os.listdir(os.path.join(store_root, "blocks"))):
        if name.startswith("day="):
            days.append((os.path.join(store_root, "blocks", name),
                         int(name.split("=", 1)[1])))
    rows = ray.get([one_day.remote(p, d) for p, d in days])
    tbl = pa.table({
        "day": pa.array([d for d, _ in rows], pa.int64()),
        "m_bits": pa.array([m_bits] * len(rows), pa.int64()),
        "k": pa.array([k] * len(rows), pa.int64()),
        "bits": pa.array([b for _, b in rows], pa.binary()),
    })
    idx_dir = os.path.join(store_root, "_index")
    os.makedirs(idx_dir, exist_ok=True)
    path = os.path.join(idx_dir, "conv_bloom.parquet")
    pq.write_table(tbl, path)
    return path


def _bloom_surviving_days(blocks_root: str, conv_ids):
    """``(known_days, surviving_days)`` from the bloom sidecar, or
    ``None`` when no index exists.  A day the index does NOT cover (e.g.
    appended after the index build) must be treated as a survivor by the
    caller — only a bloom that has SEEN a day may rule it out."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(os.path.dirname(blocks_root.rstrip("/")),
                        "_index", "conv_bloom.parquet")
    if not os.path.isfile(path):
        return None
    idx = pq.read_table(path)
    days = idx.column("day").to_pylist()
    m_bits = int(idx.column("m_bits")[0].as_py())
    k = int(idx.column("k")[0].as_py())
    pos = _bloom_positions(list(conv_ids), m_bits, k)
    word, bit = pos // 64, pos % 64
    surviving = []
    for row, day in enumerate(days):
        bits = np.frombuffer(idx.column("bits")[row].as_py(),
                             dtype=np.uint64)
        hit = ((bits[word] >> bit.astype(np.uint64))
               & np.uint64(1)).all(axis=1).any()
        if hit:
            surviving.append(day)
    return set(days), surviving


def scan_points(blocks_root: str, *, t_lo: int | None = None,
                t_hi: int | None = None, conv_ids: list[str] | None = None,
                metric: str | None = None, key_cols=("conv_id", "metric"),
                value_lo: float | None = None, value_hi: float | None = None,
                zone_root: str | None = None,
                zone_keep_cap: int = 200_000,
                prune_stats: dict | None = None):
    """Decode points from a block store with pruning.

    - ``t_lo``/``t_hi``: epoch-ms range; blocks are pruned by
      ``block_start`` overlap BEFORE decode (a block spans at most one day).
    - ``conv_ids`` / ``metric``: pushed into the Parquet scan.
    - ``value_lo``/``value_hi``: VALUE predicate.  The stored 1m rollup
      tier doubles as the block store's ZONE MAP — its per-(conv, metric,
      minute) min_v/max_v are exact, and a raw block covers exactly one
      (conv, metric, day), so folding the tier to day granularity gives
      every block's value envelope WITHOUT decoding anything.  Blocks
      whose envelope cannot intersect [value_lo, value_hi] never reach
      the decode stage; survivors decode and trim exactly, so the result
      is identical with or without the prune (pytest-pinned).  The
      surviving key set broadcasts via ``ray.put`` only below
      ``zone_keep_cap`` keys — an UNSELECTIVE predicate (or a store
      without a 1m tier, e.g. ``zone_root=None`` + no sibling) skips the
      prune and the exact trim alone decides; the cap is counted
      DISTRIBUTED before anything is collected (the broadcast-probe
      discipline of ``_verify_id_pairs``)."""
    import os

    import pyarrow.dataset as pads
    import ray
    import ray.data

    tune_context()
    flt = None

    def _and(a, b):
        return b if a is None else a & b

    if t_lo is not None:
        flt = _and(flt, pads.field("block_start") > (t_lo - DAY_MS))
    if t_hi is not None:
        flt = _and(flt, pads.field("block_start") <= t_hi)
    if conv_ids is not None:
        flt = _and(flt, pads.field("conv_id").isin(conv_ids))
    if metric is not None:
        flt = _and(flt, pads.field("metric") == metric)

    keep_ref = None
    if value_lo is not None or value_hi is not None:
        if zone_root is None:
            zone_root = os.path.join(
                os.path.dirname(blocks_root.rstrip("/")), "rollup_1m")
        if os.path.isdir(zone_root):
            zflt = None
            if t_lo is not None:
                zflt = _and(zflt, pads.field("bucket_ms") > (t_lo - DAY_MS))
            if t_hi is not None:
                zflt = _and(zflt, pads.field("bucket_ms") <= t_hi)
            if conv_ids is not None:
                zflt = _and(zflt, pads.field("conv_id").isin(conv_ids))
            if metric is not None:
                zflt = _and(zflt, pads.field("metric") == metric)
            zone = ray.data.read_parquet(
                zone_root,
                columns=["conv_id", "metric", "bucket_ms",
                         "min_v", "max_v"], filter=zflt)

            def zone_partial(tbl):
                import pyarrow as pa

                if tbl.num_rows == 0:
                    return pd.DataFrame({
                        "conv_id": pd.Series([], dtype=object),
                        "metric": pd.Series([], dtype=object),
                        "day": pd.Series([], dtype=np.int64),
                        "v_min": pd.Series([], dtype=np.float64),
                        "v_max": pd.Series([], dtype=np.float64)})
                df = pd.DataFrame({
                    "conv_id": tbl["conv_id"].to_pandas().astype(str),
                    "metric": tbl["metric"].to_pandas().astype(str),
                    "day": (tbl["bucket_ms"].to_numpy(
                        zero_copy_only=False) // DAY_MS) * DAY_MS,
                    "v_min": tbl["min_v"].to_numpy(zero_copy_only=False),
                    "v_max": tbl["max_v"].to_numpy(zero_copy_only=False)})
                return (df.groupby(["conv_id", "metric", "day"],
                                   as_index=False, sort=False)
                        .agg(v_min=("v_min", "min"),
                             v_max=("v_max", "max")))

            from ..stages.exchange import hash_exchange
            from ..util import arrow_key_ids

            def survivors(df: pd.DataFrame) -> pd.DataFrame:
                cols = ["conv_id", "metric", "day"]
                if not len(df):
                    return df.reindex(columns=cols)
                g = (df.groupby(cols, as_index=False, sort=False)
                     .agg(v_min=("v_min", "min"), v_max=("v_max", "max")))
                keep = np.ones(len(g), dtype=bool)
                if value_lo is not None:
                    keep &= g["v_max"].to_numpy() >= value_lo
                if value_hi is not None:
                    keep &= g["v_min"].to_numpy() <= value_hi
                return g.loc[keep, cols]

            surv = hash_exchange(
                zone.map_batches(zone_partial, batch_format="pyarrow"),
                key_fn=lambda t: arrow_key_ids(t, ["conv_id"], 8),
                n_parts=8, kernel=survivors, fmt="pandas").materialize()
            n_surv = surv.count()
            if prune_stats is not None:
                prune_stats["zone_survivors"] = int(n_surv)
            if n_surv <= zone_keep_cap:
                keys = surv.to_pandas()
                keep_ref = ray.put(set(zip(keys["conv_id"], keys["metric"],
                                           keys["day"].astype(np.int64))))

    read_src = blocks_root
    if conv_ids is not None:
        bloom = _bloom_surviving_days(blocks_root, conv_ids)
        if bloom is not None:
            import glob as _glob

            known, surv_days = bloom
            all_days = [n for n in sorted(os.listdir(blocks_root))
                        if n.startswith("day=")]
            keep = {f"day={d}" for d in surv_days}
            # a day the index never saw (appended after the build) is
            # always kept — only a bloom that has SEEN a day may rule
            # it out
            keep |= {n for n in all_days
                     if int(n.split("=", 1)[1]) not in known}
            files = [f for n in all_days if n in keep
                     for f in sorted(_glob.glob(
                         os.path.join(blocks_root, n, "*.parquet")))]
            if prune_stats is not None:
                prune_stats["bloom_days_total"] = len(all_days)
                prune_stats["bloom_days_kept"] = len(keep
                                                     & set(all_days))
            if files:
                # read the surviving days' MEMBER FILES (a list of dirs
                # is not a supported read_parquet input); a bloom false
                # positive only costs a wasted read — the pushed isin
                # filter still decides exactly
                read_src = files
            # no surviving day: fall through to the full read — the
            # pushed filter returns the same (empty) result
    ds = ray.data.read_parquet(read_src, filter=flt)
    if prune_stats is not None:
        prune_stats["blocks_scanned"] = ds.count()
    if keep_ref is not None:
        def zone_prune(tbl):
            import pyarrow as pa

            if tbl.num_rows == 0:
                return tbl
            keep_set = ray.get(keep_ref)
            conv = tbl["conv_id"].to_pandas().astype(str).to_numpy()
            met = tbl["metric"].to_pandas().astype(str).to_numpy()
            day = (tbl["block_start"].to_numpy(zero_copy_only=False)
                   // DAY_MS) * DAY_MS
            mask = np.fromiter(
                (t in keep_set for t in zip(conv, met, day)),
                dtype=bool, count=len(conv))
            return tbl.filter(pa.array(mask))

        ds = ds.map_batches(zone_prune, batch_format="pyarrow")
        if prune_stats is not None:
            prune_stats["blocks_decoded"] = ds.count()
    pts = ds.map_batches(decode_blocks_batch_arrow, batch_format="pyarrow",
                         fn_kwargs={"key_cols": list(key_cols)})

    if (t_lo is None and t_hi is None and value_lo is None
            and value_hi is None):
        return pts

    def trim(df: pd.DataFrame) -> pd.DataFrame:
        m = pd.Series(True, index=df.index)
        if t_lo is not None:
            m &= df["ts_ms"] >= t_lo
        if t_hi is not None:
            m &= df["ts_ms"] <= t_hi
        if value_lo is not None:
            m &= df["value"] >= value_lo
        if value_hi is not None:
            m &= df["value"] <= value_hi
        return df[m]

    return pts.map_batches(trim, batch_format="pandas")


def value_scan_serve(sf_dir: str, metric: str = "text_len",
                     value_lo: float = 400.0):
    """Driver-facing VALUE-PREDICATE scan gate: build (or reuse) a store,
    then answer "per conversation, how many turns have ``metric`` ≥
    ``value_lo`` and their exact sum" straight from the BLOCK tier with
    the zone-map prune engaged — a runtime assert proves blocks were
    actually skipped before decode (the 1m rollup tier acting as the
    store's own value index).  Exact integer outputs (text_len values
    are whole numbers < 2^24, so int64 casts are lossless); oracle = the
    same filter over the raw canonical transcripts."""
    import os
    import shutil

    import numpy as np

    from ..sources.transcripts import CACHE_ROOT
    from .ingest import ingest_to_store

    tune_context()
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(CACHE_ROOT, f"valuescan_store_{tag}")
    if not os.path.isdir(os.path.join(store, "blocks")):
        shutil.rmtree(store, ignore_errors=True)
        ingest_to_store(sf_dir, store, resume=False)

    stats: dict = {}
    pts = scan_points(os.path.join(store, "blocks"), metric=metric,
                      value_lo=value_lo, prune_stats=stats)
    if "blocks_decoded" not in stats:
        raise RuntimeError(
            f"zone-map prune did not engage: {stats}")
    if not stats["blocks_decoded"] < stats["blocks_scanned"]:
        raise RuntimeError(
            f"zone map pruned nothing ({stats}) — predicate {value_lo} "
            f"is not selective on this data; the gate must prove skips")

    def agg(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["conv_id", "cnt", "sum_len"]
        if not len(df):
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype=object),
                "cnt": pd.Series([], dtype=np.int64),
                "sum_len": pd.Series([], dtype=np.int64)})
        # decode emits dictionary-encoded keys → pandas CATEGORICAL;
        # groupby would emit every category (empty groups included) —
        # cast to str first (the _finalize_tbl plain-strings discipline)
        g = (df.assign(conv_id=df["conv_id"].astype(str))
             .groupby("conv_id", sort=False)["value"]
             .agg(cnt="size", sum_len="sum").reset_index())
        g["cnt"] = g["cnt"].astype(np.int64)
        g["sum_len"] = g["sum_len"].astype(np.int64)
        return g[cols]

    from ..stages.exchange import hash_exchange
    from ..util import arrow_key_ids

    partials = pts.map_batches(agg, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("conv_id", as_index=False, sort=False)
               [["cnt", "sum_len"]].sum())
        out["cnt"] = out["cnt"].astype(np.int64)
        out["sum_len"] = out["sum_len"].astype(np.int64)
        return out[["conv_id", "cnt", "sum_len"]]

    return hash_exchange(
        partials, key_fn=lambda t: arrow_key_ids(t, ["conv_id"], 8),
        n_parts=8, kernel=merge, fmt="pandas")


def point_lookup_serve(sf_dir: str,
                       conv_ids=("conv-00000003", "conv-00000055",
                                 "conv-00000404"),
                       metric: str = "text_len"):
    """Driver-facing POINT-LOOKUP gate for the bloom day index: build
    (or reuse) a store, build the per-day conv-id bloom sidecar
    (:func:`build_conv_bloom`), then serve three conversations' metric
    points straight from the block tier — a runtime assert proves whole
    DAY PARTITIONS were skipped by the bloom before any parquet read
    (the needle-in-haystack access pattern a time-series store must not
    answer with a full scan).  Oracle: the same metric points from the
    raw canonical transcripts restricted to those conversations."""
    import os
    import shutil

    import numpy as np

    from ..sources.transcripts import CACHE_ROOT
    from .ingest import ingest_to_store

    tune_context()
    tag = os.path.basename(os.path.normpath(sf_dir))
    store = os.path.join(CACHE_ROOT, f"valuescan_store_{tag}")
    if not os.path.isdir(os.path.join(store, "blocks")):
        shutil.rmtree(store, ignore_errors=True)
        ingest_to_store(sf_dir, store, resume=False)
    idx = os.path.join(store, "_index", "conv_bloom.parquet")
    if not os.path.isfile(idx):
        build_conv_bloom(store)

    stats: dict = {}
    pts = scan_points(os.path.join(store, "blocks"),
                      conv_ids=list(conv_ids), metric=metric,
                      prune_stats=stats)
    if "bloom_days_kept" not in stats:
        raise RuntimeError(f"bloom index did not engage: {stats}")
    if not stats["bloom_days_kept"] < stats["bloom_days_total"]:
        raise RuntimeError(
            f"bloom pruned no day partitions ({stats}) — the gate must "
            "prove skips")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["conv_id", "ts_ms", "value"]
        if not len(df):
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype=object),
                "ts_ms": pd.Series([], dtype=np.int64),
                "value": pd.Series([], dtype=np.float64)})
        out = df.assign(conv_id=df["conv_id"].astype(str))
        return out[cols]

    return pts.map_batches(finalize, batch_format="pandas")
