"""Mergeable KLL-style quantile sketch — the 100 TB path for per-key
percentiles.

The exact quantile kernels (``rollup.quantiles_by_key``) ship every raw
value of a key into one partition; correct, but a pathological key with
10^9 points melts its reduce task.  This sketch bounds per-key state to
``k·log(n/k)`` weighted items with KLL's compaction rule: items live on
levels of weight 2^h; when a key's level overflows ``k``, the level is
sorted and every other item (deterministic parity from a hash of
(key, level)) is promoted with doubled weight, the rest discarded.

Three properties the pipelines rely on:

- **Mergeable**: a sketch is just (key, value, weight=2^h) rows; merging =
  concatenating rows and re-compacting.  Partial sketches combine inside
  map batches, the exchange carries ≤ k·levels rows per (key, block).
- **Exact below capacity**: a key whose total count never exceeds ``k``
  never compacts, every weight stays 1, and the weighted quantile below
  reduces EXACTLY to the switched-lerp of ``quantiles_by_key`` — which is
  what makes the driver-scale oracle (`quantile_cont`) an exact gate while
  the compaction path is rank-error-gated in tests at larger n.
- **Vectorized across keys**: compaction loops over LEVELS only (≤ ~40);
  within a level every key compacts in one lexsort + segment-parity pass.

Rank error of the every-other rule is the classic KLL bound
O(log(n/k)/k) (Karnin-Lang-Liberty, FOCS'16 — public algorithm);
``tests/test_sketch.py`` gates it empirically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

K_DEFAULT = 200
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _parity(keys: np.ndarray, level: int) -> np.ndarray:
    """Deterministic 0/1 offset per (key, level) — stable across runs and
    partitions (splitmix-style avalanche of the raw key value)."""
    z = keys.astype(np.uint64) + _MIX * np.uint64(level + 1)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return ((z >> np.uint64(31)) & np.uint64(1)).astype(np.int64)


def compact(key: np.ndarray, val: np.ndarray, w: np.ndarray,
            k: int = K_DEFAULT):
    """Compact weighted items until every (key, level) holds ≤ k items.
    Returns new (key, val, w) arrays.  One lexsort per touched level."""
    key = np.asarray(key, dtype=np.int64)
    val = np.asarray(val, dtype=np.float64)
    w = np.asarray(w, dtype=np.int64)
    level = 0
    while True:
        wl = np.int64(1) << level
        on = w == wl
        if not on.any():
            if (w >= (wl << 1)).any():
                level += 1
                continue
            break
        kk, vv = key[on], val[on]
        order = np.lexsort((vv, kk))
        kk, vv = kk[order], vv[order]
        seg_first = np.concatenate(([True], kk[1:] != kk[:-1]))
        seg_id = np.cumsum(seg_first) - 1
        sizes = np.bincount(seg_id)
        over = sizes > k
        if not over.any():
            if (w > wl).any():
                level += 1
                continue
            break
        starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        pos = np.arange(len(kk)) - starts[seg_id]
        par = _parity(kk[starts], level)[seg_id]
        in_over = over[seg_id]
        promote = in_over & (pos % 2 == par)
        keep_lvl = ~in_over
        # untouched levels + under-capacity segments + promoted items
        rest = ~on
        new_key = np.concatenate((key[rest], kk[keep_lvl], kk[promote]))
        new_val = np.concatenate((val[rest], vv[keep_lvl], vv[promote]))
        new_w = np.concatenate((w[rest], np.full(keep_lvl.sum(), wl),
                                np.full(promote.sum(), wl << 1)))
        key, val, w = new_key, new_val, new_w.astype(np.int64)
        level += 1
    return key, val, w


def sketch_batch(df: pd.DataFrame, *, key_col: str,
                 value_col: str = "value", k: int = K_DEFAULT,
                 weight_col: str | None = None) -> pd.DataFrame:
    """Batch → compacted sketch rows (key, value, weight).  With
    ``weight_col`` set the input is itself sketch rows (the merge path)."""
    if len(df) == 0:
        return pd.DataFrame({key_col: [], value_col: [], "weight": []})
    codes = df[key_col].to_numpy(dtype=np.int64)
    w = (df[weight_col].to_numpy(dtype=np.int64) if weight_col
         else np.ones(len(df), dtype=np.int64))
    key, val, w = compact(codes, df[value_col].to_numpy(dtype=np.float64),
                          w, k=k)
    return pd.DataFrame({key_col: key, value_col: val, "weight": w})


def quantiles_from_sketch(df: pd.DataFrame, *, key_col: str,
                          value_col: str = "value",
                          qs=(0.5, 0.95, 0.99)) -> pd.DataFrame:
    """Weighted quantiles per key from sketch rows.  An item of weight w
    covers w consecutive ranks; the estimator lerps between the items
    covering floor(h) and floor(h)+1 at h = q·(W−1) — with all weights 1
    this is bit-identical to ``rollup.quantiles_by_key``."""
    from ..util import round_half_away

    cols = [key_col] + [f"p{int(q * 100)}" for q in qs]
    if len(df) == 0:
        return pd.DataFrame({c: [] for c in cols})
    kk = df[key_col].to_numpy(dtype=np.int64)
    vv = df[value_col].to_numpy(dtype=np.float64)
    ww = df["weight"].to_numpy(dtype=np.int64)
    order = np.lexsort((vv, kk))
    kk, vv, ww = kk[order], vv[order], ww[order]
    seg_first = np.concatenate(([True], kk[1:] != kk[:-1]))
    seg_id = np.cumsum(seg_first) - 1
    n_seg = seg_id[-1] + 1
    cum = np.cumsum(ww)
    # total weight per segment and each item's LOCAL start rank
    seg_w = np.bincount(seg_id, weights=ww).astype(np.int64)
    seg_off = np.concatenate(([0], np.cumsum(seg_w)[:-1]))
    start_local = (cum - ww) - seg_off[seg_id]
    # composite monotone rank key: segment stride exceeds any local rank
    big = np.int64(seg_w.max()) + 2
    start_key = seg_id * big + start_local
    starts_idx = np.flatnonzero(seg_first)
    out = {key_col: kk[starts_idx]}
    segs = np.arange(n_seg)
    for q in qs:
        h = q * (seg_w - 1).astype(np.float64)
        f = np.floor(h).astype(np.int64)
        t = h - f
        lo = np.searchsorted(start_key, segs * big + f, side="right") - 1
        hi = np.searchsorted(start_key, segs * big + np.minimum(
            f + 1, seg_w - 1), side="right") - 1
        a, b = vv[lo], vv[hi]
        lerp = np.where(t < 0.5, a + t * (b - a), b - (1 - t) * (b - a))
        out[f"p{int(q * 100)}"] = round_half_away(lerp, 6)
    return pd.DataFrame(out)[cols]


# ---------- KMV distinct-count sketch ----------

def _splitmix(x: np.ndarray) -> np.ndarray:
    z = x.astype(np.uint64) + _MIX
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def kmv_rows(df: pd.DataFrame, *, key_col: str, value_col: str,
             k: int = 1024, hashed: bool = False) -> pd.DataFrame:
    """K-minimum-values distinct sketch rows: per key, the ≤ k smallest
    splitmix hashes of the values — DETERMINISTIC (no sampling), mergeable
    (union + keep k smallest = the same kernel, self-merging), and EXACT
    below capacity (fewer than k distinct values → every hash kept →
    count is exact).  ``hashed=True`` is the merge path (input rows are
    already (key, h))."""
    if len(df) == 0:
        return pd.DataFrame({key_col: [], "h": []})
    key = df[key_col].to_numpy()
    h = (df["h"].to_numpy(dtype=np.uint64) if hashed
         else _splitmix(df[value_col].to_numpy(dtype=np.int64)))
    codes, uniq = pd.factorize(key, sort=False)
    order = np.lexsort((h, codes))
    c, hh = codes[order], h[order]
    dup = np.concatenate(([False], (c[1:] == c[:-1]) & (hh[1:] == hh[:-1])))
    c, hh = c[~dup], hh[~dup]
    seg_first = np.concatenate(([True], c[1:] != c[:-1]))
    starts = np.flatnonzero(seg_first)
    pos = np.arange(len(c)) - starts[np.cumsum(seg_first) - 1]
    keep = pos < k
    return pd.DataFrame({key_col: np.asarray(uniq)[c[keep]], "h": hh[keep]})


def kmv_estimate(df: pd.DataFrame, *, key_col: str,
                 k: int = 1024) -> pd.DataFrame:
    """Distinct-count estimate per key from KMV rows: exact (= kept count)
    below capacity; (k−1)/U_(k) above, with U_(k) the k-th smallest hash
    normalized to (0, 1)."""
    cols = [key_col, "n_distinct"]
    if len(df) == 0:
        return pd.DataFrame({c: [] for c in cols})
    key = df[key_col].to_numpy()
    h = df["h"].to_numpy(dtype=np.uint64)
    codes, uniq = pd.factorize(key, sort=False)
    order = np.lexsort((h, codes))
    c, hh = codes[order], h[order]
    seg_first = np.concatenate(([True], c[1:] != c[:-1]))
    starts = np.flatnonzero(seg_first)
    sizes = np.diff(np.append(starts, len(c)))
    kth = hh[np.minimum(starts + k - 1, starts + sizes - 1)]
    u = (kth.astype(np.float64) + 1.0) / 2.0 ** 64
    est = np.where(sizes < k, sizes.astype(np.float64), (k - 1) / u)
    return pd.DataFrame({key_col: np.asarray(uniq)[c[starts]],
                         "n_distinct": np.round(est).astype(np.int64)})


# ---------- Misra-Gries heavy-hitters sketch ----------

def misra_gries(df: pd.DataFrame, *, item_col: str, count_col: str | None,
                k: int = 4096) -> pd.DataFrame:
    """Batch Misra-Gries: count items (or sum incoming partial counters),
    and if more than k distinct items remain, subtract the (k+1)-th
    largest count from all and drop the non-positive — the classic
    frequent-items guarantee (per-item undercount ≤ n/(k+1), additive
    across merges).  DETERMINISTIC, self-merging, and EXACT whenever the
    distinct-item count never exceeds k (no subtraction ever fires)."""
    if len(df) == 0:
        return pd.DataFrame({item_col: [], "cnt": []})
    codes, uniq = pd.factorize(df[item_col].to_numpy(), sort=False)
    w = (df[count_col].to_numpy(dtype=np.int64) if count_col
         else np.ones(len(df), dtype=np.int64))
    cnt = np.bincount(codes, weights=w).astype(np.int64)
    if len(cnt) > k:
        thresh = np.partition(cnt, len(cnt) - k - 1)[len(cnt) - k - 1]
        cnt = cnt - thresh
    keep = cnt > 0
    return pd.DataFrame({item_col: np.asarray(uniq)[keep],
                         "cnt": cnt[keep]})


# ---------- count-min sketch ----------

_CMS_SEEDS = np.array([0xA076_1D64_78BD_642F, 0xE703_7ED1_A0B4_28DB,
                       0x8EBC_6AF0_9C88_C6E3, 0x5899_65CC_7537_4CC3],
                      dtype=np.uint64)


def cms_rows(df: pd.DataFrame, *, item_col: str, d: int = 4,
             w: int = 256) -> pd.DataFrame:
    """Per-batch COUNT-MIN sketch as flat ``(r, c, cnt)`` rows — ≤ d·w
    rows per batch however many items arrive.  CMS is LINEAR, so partials
    from any batch split merge by PLAIN ADDITION (a groupby-sum exchange
    kernel) — the mergeability discipline shared with KLL/KMV/MG.  Items
    hash via the md5-prefix discipline (one md5 per UNIQUE string per
    batch, then a code gather)."""
    import hashlib

    vals = df[item_col].astype(str)
    uniq, codes = np.unique(vals.to_numpy(), return_inverse=True)
    lut = np.fromiter(
        (int.from_bytes(hashlib.md5(u.encode()).digest()[:8], "big")
         for u in uniq), dtype=np.uint64, count=len(uniq))
    base = lut[codes]
    out_r, out_c, out_n = [], [], []
    for r in range(d):
        col = (_splitmix(base ^ _CMS_SEEDS[r]) % np.uint64(w)).astype(
            np.int64)
        cnt = np.bincount(col, minlength=w)
        nz = np.flatnonzero(cnt)
        out_r.append(np.full(len(nz), r, dtype=np.int64))
        out_c.append(nz.astype(np.int64))
        out_n.append(cnt[nz].astype(np.int64))
    return pd.DataFrame({"r": np.concatenate(out_r),
                         "c": np.concatenate(out_c),
                         "cnt": np.concatenate(out_n)})


def cms_estimate(cms: pd.DataFrame, items: np.ndarray, *, d: int = 4,
                 w: int = 256) -> np.ndarray:
    """Point-query the merged sketch: est(item) = min over rows of the
    hashed cell — exact when the item collides with nothing in at least
    one row (guaranteed-ish at driver scale: w ≫ distinct items; the
    overestimate bound εN otherwise)."""
    import hashlib

    grid = np.zeros((d, w), dtype=np.int64)
    grid[cms["r"].to_numpy(), cms["c"].to_numpy()] = (
        cms["cnt"].to_numpy())
    base = np.fromiter(
        (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8], "big")
         for i in items), dtype=np.uint64, count=len(items))
    est = np.full(len(items), np.iinfo(np.int64).max, dtype=np.int64)
    for r in range(d):
        col = (_splitmix(base ^ _CMS_SEEDS[r]) % np.uint64(w)).astype(
            np.int64)
        est = np.minimum(est, grid[r, col])
    return est
