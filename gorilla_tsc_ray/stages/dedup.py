"""Deduplication operators for large-scale training-data pipelines.

All operators follow the same scale pattern: a cheap vectorized
*fingerprint* stage inside ``map_batches`` (no shuffle), then ONE
hash-partitioned ``groupby`` on the fingerprint/bucket key, with per-group
work bounded by bucket size.  Full documents never ride the shuffle unless
the semantics need them — fingerprints/signatures do.

Operators:
- exact dedup     — md5(text) digest → groupby digest → keep-first
- MinHash + LSH   — word shingles → 64-perm minhash → banded LSH buckets
                    → candidate pairs + signature-estimated Jaccard
- SimHash         — 64-bit simhash + segment blocking → near pairs by
                    Hamming distance
- char-set Jaccard— DuckDB-`jaccard`-compatible exact similarity on blocked
                    pairs (SQL-oracle-checkable)

Determinism: all hashing is seeded polynomial / crc-free (no PYTHONHASHSEED
dependence) so results are identical across workers and runs.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

from ..util import round_half_away

MERSENNE = (1 << 61) - 1
_WORD_RE = r"[A-Za-z0-9]+"


def _md5_u64(texts: pd.Series) -> np.ndarray:
    """First 8 bytes of md5 as uint64 — deterministic content digest."""
    return np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
         for t in texts),
        dtype=np.uint64, count=len(texts))


def add_digest(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    out = df.copy()
    out["digest"] = _md5_u64(out[text_col]).astype("uint64")
    return out


def exact_dedup_group(df: pd.DataFrame, *, id_col: str) -> pd.DataFrame:
    """One digest group → representative row (min id) + duplicate count."""
    i = int(np.argmin(df[id_col].to_numpy()))
    return pd.DataFrame({id_col: [df[id_col].iloc[i]],
                         "n_dups": [len(df)]})


def _token_arrays(texts: pd.Series) -> list[list[str]]:
    return texts.str.findall(_WORD_RE).tolist()


def _shingle_hashes(tokens: list[str], k: int = 3) -> np.ndarray:
    """Deterministic 61-bit polynomial hashes of word k-shingles."""
    if len(tokens) < k:
        tokens = tokens + ["\x00"] * (k - len(tokens))
    hs = []
    for i in range(len(tokens) - k + 1):
        h = 0
        for w in tokens[i:i + k]:
            hw = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            h = (h * 1_000_003 + hw) % MERSENNE
        hs.append(h)
    return np.unique(np.array(hs, dtype=np.uint64))


class MinHasher:
    """Stateful minhash signer — an actor-pool stage: the permutation
    parameters are derived once per actor in ``__init__`` (seeded), each
    ``__call__`` signs a batch (SURVEY.md §2b "stateful stages")."""

    def __init__(self, num_perm: int = 64, seed: int = 7,
                 text_col: str = "text", id_col: str = "doc_id") -> None:
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.text_col = text_col
        self.id_col = id_col

    def sign(self, shingles: np.ndarray) -> np.ndarray:
        # (n_shingles, num_perm) permuted values — min over shingles
        x = shingles.astype(object)[:, None]  # object to dodge uint64 overflow
        vals = (x * self.a.astype(object) + self.b.astype(object)) % MERSENNE
        return vals.min(axis=0).astype(np.uint64)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        toks = _token_arrays(df[self.text_col])
        sigs = np.stack([self.sign(_shingle_hashes(t)) for t in toks])
        out = pd.DataFrame({self.id_col: df[self.id_col].to_numpy()})
        out["sig"] = list(sigs.astype(np.uint64))
        return out


def lsh_band_rows(df: pd.DataFrame, *, bands: int = 16,
                  id_col: str = "doc_id") -> pd.DataFrame:
    """Explode signatures into (band, band_hash, id) rows — the LSH bucket
    key for the single dedup shuffle."""
    sigs = np.stack(df["sig"].to_numpy())
    n, num_perm = sigs.shape
    rows_per_band = num_perm // bands
    out_id, out_band, out_hash, out_sig = [], [], [], []
    for b in range(bands):
        seg = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
        h = np.zeros(n, dtype=np.uint64)
        for j in range(rows_per_band):
            h = (h.astype(object) * 1_000_003 + seg[:, j].astype(object)) % MERSENNE
        out_id.append(df[id_col].to_numpy())
        out_band.append(np.full(n, b, dtype=np.int32))
        out_hash.append(h.astype(np.uint64))
        out_sig.extend(list(sigs))
    return pd.DataFrame({
        id_col: np.concatenate(out_id),
        "band": np.concatenate(out_band),
        "band_hash": np.concatenate(out_hash),
        "sig": out_sig,
    })


def lsh_bucket_pairs(df: pd.DataFrame, *, id_col: str = "doc_id",
                     threshold: float = 0.5, max_bucket: int = 200) -> pd.DataFrame:
    """One (band, band_hash) bucket → candidate pairs with
    signature-estimated Jaccard ≥ threshold.  Buckets larger than
    ``max_bucket`` are truncated by id order (logged via the dropped count
    column rather than silently)."""
    df = df.sort_values(id_col, kind="stable")
    n = len(df)
    empty = pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                          "id_b": np.array([], dtype=np.int64),
                          "est_jaccard": np.array([], dtype=np.float64)})
    if n < 2:
        return empty
    if n > max_bucket:
        df = df.iloc[:max_bucket]
        n = max_bucket
    sigs = np.stack(df["sig"].to_numpy())
    ids = df[id_col].to_numpy()
    ia, ib = np.triu_indices(n, k=1)
    est = (sigs[ia] == sigs[ib]).mean(axis=1)
    keep = est >= threshold
    if not keep.any():
        return empty
    return pd.DataFrame({
        "id_a": ids[ia[keep]].astype(np.int64),
        "id_b": ids[ib[keep]].astype(np.int64),
        "est_jaccard": est[keep],
    })


def simhash_batch(df: pd.DataFrame, *, text_col: str = "text",
                  id_col: str = "doc_id") -> pd.DataFrame:
    """64-bit SimHash over word hashes + 4×16-bit segment keys for
    Hamming-distance blocking (two docs within distance 3 share ≥1 of the
    4 segments by pigeonhole)."""
    toks = _token_arrays(df[text_col])
    out_hash = np.empty(len(df), dtype=np.uint64)
    for i, ts in enumerate(toks):
        acc = np.zeros(64, dtype=np.int64)
        for w in ts:
            hw = int.from_bytes(hashlib.md5(w.encode()).digest()[:8], "big")
            bits = (hw >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
            acc += np.where(bits.astype(bool), 1, -1)
        h = np.uint64(0)
        for j in range(64):
            if acc[j] > 0:
                h |= np.uint64(1) << np.uint64(j)
        out_hash[i] = h
    out = pd.DataFrame({id_col: df[id_col].to_numpy(), "simhash": out_hash})
    for s in range(4):
        out[f"seg{s}"] = ((out_hash >> np.uint64(16 * s)) & np.uint64(0xFFFF)).astype(np.int64)
    return out


def simhash_segment_pairs(df: pd.DataFrame, *, id_col: str = "doc_id",
                          max_hamming: int = 3) -> pd.DataFrame:
    """One segment bucket → pairs within Hamming distance ≤ max_hamming."""
    df = df.sort_values(id_col, kind="stable")
    n = len(df)
    empty = pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                          "id_b": np.array([], dtype=np.int64),
                          "hamming": np.array([], dtype=np.int64)})
    if n < 2:
        return empty
    h = df["simhash"].to_numpy().astype(np.uint64)
    ids = df[id_col].to_numpy()
    ia, ib = np.triu_indices(n, k=1)
    x = h[ia] ^ h[ib]
    ham = np.zeros(len(x), dtype=np.int64)
    for shift in range(64):
        ham += ((x >> np.uint64(shift)) & np.uint64(1)).astype(np.int64)
    keep = ham <= max_hamming
    if not keep.any():
        return empty
    return pd.DataFrame({
        "id_a": ids[ia[keep]].astype(np.int64),
        "id_b": ids[ib[keep]].astype(np.int64),
        "hamming": ham[keep],
    })


def token_jaccard_pairs(df: pd.DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text",
                        threshold: float = 0.5) -> pd.DataFrame:
    """Exact token-SET Jaccard for all pairs in ONE block (word unigrams;
    k-shingle similarity is covered by the MinHash estimator).  Semantics
    match the DuckDB list_intersect/list_distinct oracle, so this one is
    SQL-checkable."""
    df = df.sort_values(id_col, kind="stable")
    n = len(df)
    empty = pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                          "id_b": np.array([], dtype=np.int64),
                          "token_jaccard": np.array([], dtype=np.float64)})
    if n < 2:
        return empty
    token_sets = [frozenset(t) for t in _token_arrays(df[text_col])]
    vocab = {w: i for i, w in enumerate(sorted(set().union(*token_sets)))}
    m = np.zeros((n, len(vocab)), dtype=bool)
    for i, tset in enumerate(token_sets):
        m[i, [vocab[w] for w in tset]] = True
    inter = m.astype(np.int32) @ m.astype(np.int32).T
    sizes = m.sum(axis=1)
    union = np.maximum(sizes[:, None] + sizes[None, :] - inter, 1)
    sim = inter / union
    ia, ib = np.triu_indices(n, k=1)
    keep = sim[ia, ib] >= threshold
    if not keep.any():
        return empty
    ids = df[id_col].to_numpy()
    return pd.DataFrame({
        "id_a": ids[ia[keep]].astype(np.int64),
        "id_b": ids[ib[keep]].astype(np.int64),
        "token_jaccard": round_half_away(sim[ia, ib][keep], 6),
    })


def charset_jaccard_pairs(df: pd.DataFrame, *, id_col: str = "doc_id",
                          text_col: str = "text",
                          threshold: float = 0.0) -> pd.DataFrame:
    """Exact character-set Jaccard for all pairs in ONE block — semantics
    identical to DuckDB's ``jaccard(s1, s2)`` (distinct-character sets), so
    the result is SQL-oracle-checkable."""
    df = df.sort_values(id_col, kind="stable")
    n = len(df)
    if n < 2:
        return pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                             "id_b": np.array([], dtype=np.int64),
                             "jaccard_sim": np.array([], dtype=np.float64)})
    # bitset per doc over observed characters
    charsets = [frozenset(t) for t in df[text_col]]
    vocab = {c: i for i, c in enumerate(sorted(set().union(*charsets)))}
    m = np.zeros((n, len(vocab)), dtype=bool)
    for i, cs in enumerate(charsets):
        m[i, [vocab[c] for c in cs]] = True
    inter = m.astype(np.int32) @ m.astype(np.int32).T
    sizes = m.sum(axis=1)
    union = sizes[:, None] + sizes[None, :] - inter
    sim = inter / np.maximum(union, 1)
    ia, ib = np.triu_indices(n, k=1)
    keep = sim[ia, ib] >= threshold
    ids = df[id_col].to_numpy()
    return pd.DataFrame({
        "id_a": ids[ia[keep]].astype(np.int64),
        "id_b": ids[ib[keep]].astype(np.int64),
        "jaccard_sim": round_half_away(sim[ia, ib][keep], 6),
    })
