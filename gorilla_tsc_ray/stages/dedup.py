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


_U = np.uint64


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain mix; wrapping uint64
    arithmetic — numpy unsigned overflow is defined)."""
    x = x + _U(0x9E3779B97F4A7C15)
    x = (x ^ (x >> _U(30))) * _U(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> _U(27))) * _U(0x94D049BB133111EB)
    return x ^ (x >> _U(31))


def _token_hash_flat(texts: pd.Series):
    """Vectorized batch tokenization + 64-bit token hashing.

    Returns ``(tok_h, lens)``: one uint64 hash per token occurrence
    (flattened doc-major) and the per-doc token counts.  Hashing is
    ``pd.util.hash_pandas_object`` over the UNIQUE tokens only (the vocab is
    tiny next to the occurrence count), fanned out by factorize codes —
    no per-token Python, no md5."""
    import itertools

    tok_lists = texts.str.findall(_WORD_RE)
    lens = tok_lists.str.len().to_numpy().astype(np.int64)
    flat = list(itertools.chain.from_iterable(tok_lists))
    if not flat:
        return np.array([], dtype=np.uint64), lens
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
    uh = splitmix64(
        pd.util.hash_pandas_object(pd.Series(uniq), index=False).to_numpy())
    return uh[codes], lens


def _md5_token_hash_flat(texts: pd.Series):
    """Like :func:`_token_hash_flat` but with md5 token hashes
    (little-endian first 8 digest bytes == DuckDB ``md5_number_upper``),
    still md5-ing only the unique tokens — used where a SQL oracle must
    reproduce the hash exactly."""
    import itertools

    tok_lists = texts.str.findall(_WORD_RE)
    lens = tok_lists.str.len().to_numpy().astype(np.int64)
    flat = list(itertools.chain.from_iterable(tok_lists))
    if not flat:
        return np.array([], dtype=np.uint64), lens
    codes, uniq = pd.factorize(np.asarray(flat, dtype=object))
    uh = np.fromiter(
        (int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "little")
         for t in uniq), dtype=np.uint64, count=len(uniq))
    return uh[codes], lens


def _doc_shingle_hashes(texts: pd.Series, k: int = 3):
    """Word k-shingle hashes per doc, flattened doc-major.

    Returns ``(sh, starts)``: uint64 shingle hashes and the per-doc start
    offsets into ``sh`` (every doc gets ≥1 shingle; docs shorter than k
    hash their zero-padded token window).  Fully vectorized: shingle hash =
    splitmix64 over a weighted combination of the k token hashes."""
    tok_h, lens = _token_hash_flat(texts)
    n_docs = len(lens)
    n_sh = np.maximum(lens - (k - 1), 1)
    starts = np.concatenate(([0], np.cumsum(n_sh)[:-1]))
    total = int(n_sh.sum())
    doc_of = np.repeat(np.arange(n_docs), n_sh)
    within = np.arange(total) - np.repeat(starts, n_sh)
    tok_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    base = tok_starts[doc_of] + within

    padded = np.concatenate([tok_h, np.zeros(k, dtype=np.uint64)])
    acc = np.zeros(total, dtype=np.uint64)
    weights = (_U(0x9E3779B97F4A7C15), _U(0xC2B2AE3D27D4EB4F),
               _U(0x165667B19E3779F9))
    for j in range(k):
        # token j of the shingle; out-of-range (short docs) reads the
        # zero pad, matching a fixed-pad semantics
        idx = np.minimum(base + j, len(padded) - 1)
        valid = within + j < lens[doc_of]  # empty/short docs read zero pad
        tj = np.where(valid, padded[idx], _U(0))
        acc ^= tj * weights[j % len(weights)]
    return splitmix64(acc), np.append(starts, total)


class MinHasher:
    """Stateful minhash signer — an actor-pool stage: the per-permutation
    seeds are derived once per actor in ``__init__``, each ``__call__``
    signs a whole batch in a handful of vectorized ops (SURVEY.md §2b
    "stateful stages").

    Permutation p of shingle s = ``splitmix64(s ^ seed[p])`` — the standard
    xor-seed minhash family; signature = column-wise min over the doc's
    shingles via ``minimum.reduceat`` on the flat shingle matrix."""

    def __init__(self, num_perm: int = 64, seed: int = 7,
                 text_col: str = "text", id_col: str = "doc_id") -> None:
        rng = np.random.default_rng(seed)
        self.seeds = rng.integers(0, 2**63, num_perm, dtype=np.int64).view(np.uint64)
        self.num_perm = num_perm
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        sh, bounds = _doc_shingle_hashes(df[self.text_col])
        starts = bounds[:-1]
        # (n_shingles, num_perm) in perm chunks to bound the temp
        sigs = np.empty((len(df), self.num_perm), dtype=np.uint64)
        CH = 16
        for p0 in range(0, self.num_perm, CH):
            seeds = self.seeds[p0:p0 + CH]
            vals = splitmix64(sh[:, None] ^ seeds[None, :])
            sigs[:, p0:p0 + len(seeds)] = np.minimum.reduceat(vals, starts,
                                                              axis=0)
        out = pd.DataFrame({self.id_col: df[self.id_col].to_numpy()})
        out["sig"] = list(sigs)
        return out


def lsh_band_rows(df: pd.DataFrame, *, bands: int = 16,
                  id_col: str = "doc_id") -> pd.DataFrame:
    """Explode signatures into (band, band_hash, id) rows — the LSH bucket
    key for the single dedup shuffle.  Band hash = wrapping-uint64
    polynomial over the band's signature rows (vectorized; no object
    dtype)."""
    sigs = np.stack(df["sig"].to_numpy())
    n, num_perm = sigs.shape
    rows_per_band = num_perm // bands
    out_id, out_band, out_hash, out_sig = [], [], [], []
    for b in range(bands):
        seg = sigs[:, b * rows_per_band:(b + 1) * rows_per_band]
        h = np.zeros(n, dtype=np.uint64)
        for j in range(rows_per_band):
            h = h * _U(1_000_003) + seg[:, j]  # wrapping mix
        out_id.append(df[id_col].to_numpy())
        out_band.append(np.full(n, b, dtype=np.int32))
        out_hash.append(splitmix64(h))
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
    ``max_bucket`` are truncated by id order; the truncation is logged
    (worker log) — a giant LSH bucket means the band hash degenerated
    (e.g. all-identical docs) and all-pairs inside it would be O(n²)."""
    df = df.sort_values(id_col, kind="stable")
    n = len(df)
    empty = pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                          "id_b": np.array([], dtype=np.int64),
                          "est_jaccard": np.array([], dtype=np.float64)})
    if n < 2:
        return empty
    if n > max_bucket:
        import logging

        logging.getLogger(__name__).warning(
            "lsh bucket truncated: %d -> %d docs (%d dropped)",
            n, max_bucket, n - max_bucket)
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
    4 segments by pigeonhole).

    Vectorized: one (token-occurrences × 64) ±1 bit matrix per batch,
    summed per doc via prefix-sum differences — no per-doc/per-word Python.
    Token hash is md5 (unique tokens only), so the whole operator is
    reproducible in SQL (``md5_number_upper`` + bit arithmetic — see the
    ``docs_simhash_pairs`` oracle)."""
    tok_h, lens = _md5_token_hash_flat(df[text_col])
    n_docs = len(df)
    out_hash = np.zeros(n_docs, dtype=np.uint64)
    if len(tok_h):
        shifts = np.arange(64, dtype=np.uint64)
        bits = ((tok_h[:, None] >> shifts[None, :]) & _U(1)).astype(np.int8)
        pm = (2 * bits.astype(np.int32) - 1)  # ±1 per bit
        # per-doc bit sums via prefix-sum differences (robust to empty docs)
        csum = np.zeros((len(tok_h) + 1, 64), dtype=np.int64)
        np.cumsum(pm, axis=0, out=csum[1:])
        ends = np.cumsum(lens)
        starts = ends - lens
        acc = csum[ends] - csum[starts]
        pos = acc > 0
        out_hash = (pos.astype(np.uint64) <<
                    np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1,
                                                                 dtype=np.uint64)
    out = pd.DataFrame({id_col: df[id_col].to_numpy(), "simhash": out_hash})
    for s in range(4):
        out[f"seg{s}"] = ((out_hash >> np.uint64(16 * s)) & np.uint64(0xFFFF)).astype(np.int64)
    return out


def simhash_segment_pairs(df: pd.DataFrame, *, id_col: str = "doc_id",
                          max_hamming: int = 3,
                          max_bucket: int = 2000) -> pd.DataFrame:
    """One segment bucket → pairs within Hamming distance ≤ max_hamming.
    Buckets beyond ``max_bucket`` are truncated by id order (logged):
    a degenerate 16-bit segment (e.g. a constant prefix across the corpus)
    must not trigger an all-pairs blow-up."""
    df = df.sort_values(id_col, kind="stable")
    n = len(df)
    empty = pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                          "id_b": np.array([], dtype=np.int64),
                          "hamming": np.array([], dtype=np.int64)})
    if n < 2:
        return empty
    if n > max_bucket:
        import logging

        logging.getLogger(__name__).warning(
            "simhash segment bucket truncated: %d -> %d docs", n, max_bucket)
        df = df.iloc[:max_bucket]
        n = max_bucket
    h = df["simhash"].to_numpy().astype(np.uint64)
    ids = df[id_col].to_numpy()
    ia, ib = np.triu_indices(n, k=1)
    x = h[ia] ^ h[ib]
    # vectorized popcount via the classic SWAR bit tricks
    x = x - ((x >> _U(1)) & _U(0x5555555555555555))
    x = (x & _U(0x3333333333333333)) + ((x >> _U(2)) & _U(0x3333333333333333))
    x = (x + (x >> _U(4))) & _U(0x0F0F0F0F0F0F0F0F)
    ham = ((x * _U(0x0101010101010101)) >> _U(56)).astype(np.int64)
    keep = ham <= max_hamming
    if not keep.any():
        return empty
    return pd.DataFrame({
        "id_a": ids[ia[keep]].astype(np.int64),
        "id_b": ids[ib[keep]].astype(np.int64),
        "hamming": ham[keep],
    })


# ---- exact set-similarity join via prefix filtering -----------------------
# The AllPairs/PPJoin family (Bayardo et al., WWW'07; public knowledge):
# for Jaccard ≥ t, any qualifying pair must share at least one token among
# each doc's PREFIX — the first (n - ceil(t·n) + 1) tokens under ONE global
# token order.  Blocking on (lang, prefix-token) therefore has 100% recall
# (outputs stay EXACTLY equal to the all-pairs SQL oracle) while candidate
# buckets shrink to the docs sharing a rare token: subquadratic in practice
# and shuffle-friendly at 100 TB, unlike blocking on a 4-value lang column.
# The global order ranks tokens by (batch-estimated frequency, hash) — ANY
# consistent total order preserves exactness; frequency ordering just makes
# prefixes rare tokens, which keeps buckets small.

def _distinct_sorted_sets(texts: pd.Series, order_rank: dict | None,
                          charset: bool):
    """Per doc: distinct element hashes, sorted by the global order key.
    Returns a list of uint64 arrays."""
    out = []
    if charset:
        elem_lists = [sorted(set(t)) for t in texts]
    else:
        elem_lists = [sorted(set(toks))
                      for toks in texts.str.findall(_WORD_RE)]
    # hash unique elements once per batch
    all_elems = sorted({e for lst in elem_lists for e in lst})
    eh = {e: int(h) for e, h in zip(
        all_elems,
        splitmix64(pd.util.hash_pandas_object(
            pd.Series(all_elems, dtype=object), index=False).to_numpy()))}

    def key(e):
        h = eh[e]
        r = order_rank.get(e) if order_rank else None
        # ranked (frequent) elements sort AFTER all unranked (rare) ones
        return (1, r, h) if r is not None else (0, h, 0)

    for lst in elem_lists:
        ordered = sorted(lst, key=key)
        out.append(np.array([eh[e] for e in ordered], dtype=np.uint64))
    return out


def prefix_rows(df: pd.DataFrame, *, threshold: float,
                id_col: str = "doc_id", text_col: str = "text",
                block_col: str | None = "lang",
                order_rank: dict | None = None,
                charset: bool = False) -> pd.DataFrame:
    """map_batches stage: one row per (doc, prefix element) carrying the
    doc's full (order-sorted) element-hash set for in-bucket verification."""
    sets = _distinct_sorted_sets(df[text_col], order_rank, charset)
    ids = df[id_col].to_numpy()
    blocks = (df[block_col].to_numpy() if block_col
              else np.zeros(len(df), dtype=np.int64))
    lens = np.fromiter((len(s) for s in sets), dtype=np.int64,
                       count=len(sets))
    prefix = np.where(lens > 0,
                      lens - np.ceil(threshold * lens).astype(np.int64) + 1,
                      0)
    rep = np.repeat(np.arange(len(sets)), prefix)
    toks = (np.concatenate([s[:p] for s, p in zip(sets, prefix) if p])
            if rep.size else np.array([], dtype=np.uint64))
    # the elems column repeats array OBJECTS, not their contents
    set_objs = np.empty(len(sets), dtype=object)
    set_objs[:] = sets
    return pd.DataFrame({
        id_col: ids[rep],
        "block": blocks[rep],
        "tok": toks,
        "elems": set_objs[rep],
    })


def prefix_bucket_pairs(df: pd.DataFrame, *, threshold: float,
                        id_col: str = "doc_id",
                        sim_col: str = "sim") -> pd.DataFrame:
    """One (block, prefix-token) bucket → exact-Jaccard pairs ≥ threshold
    (vectorized: per-bucket element vocab → boolean matrix → one matmul)."""
    df = df.drop_duplicates(id_col).sort_values(id_col, kind="stable")
    n = len(df)
    empty = pd.DataFrame({"id_a": np.array([], dtype=np.int64),
                          "id_b": np.array([], dtype=np.int64),
                          sim_col: np.array([], dtype=np.float64)})
    if n < 2:
        return empty
    # element sets may arrive as numpy arrays or (post-Arrow) Python lists
    sets = [np.asarray(s, dtype=np.uint64).tolist()
            for s in df["elems"].to_numpy()]
    vocab: dict[int, int] = {}
    for s in sets:
        for e in s:
            if e not in vocab:
                vocab[e] = len(vocab)
    m = np.zeros((n, len(vocab)), dtype=bool)
    for i, s in enumerate(sets):
        m[i, [vocab[e] for e in s]] = True
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
        sim_col: round_half_away(sim[ia, ib][keep], 6),
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
