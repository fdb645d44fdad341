"""Docs pipelines: text analysis (TF-IDF/BM25/collocations/TTR/RAKE/BPE), graph suite (PageRank/k-core/triangles/BFS/modularity), winnowing, edit pairs, coverage/fertility/fusion analytics.

Split from the round-4 docs.py monolith (round-5 verdict #9); every
function is re-exported unchanged through the ``docs`` facade."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from ..context import tune_context
from ..stages import dedup as dd
from ..stages.exchange import hash_exchange, hash_exchange_multi
from ..stages import similarity as sim
from ..stages import text as tx

from .docs_shared import (  # noqa: F401
    N_DOC_PARTS,
    PAGERANK_SCALE,
    RAKE_STOPWORDS,
    _dedup_pairs,
    _global_rank,
    _levenshtein_pairs,
    _md5_bucket,
    _padded_prefix_bytes,
    _pair_hash_key,
    _presplit_graph_edges,
    _read,
    _read_emb_head,
    _verify_id_pairs,
    ngram_jaccard,
)
from .docs_dedup import chunk_documents, cluster_pairs, dup_clusters, knn, simhash_clusters, simhash_pairs, token_jaccard, top_tokens, ttr_hapax  # noqa: E501



def collocations(sf_dir: str):
    """Adjacent-bigram collocation counts with unigram totals: for every
    consecutive token pair in the positional token stream, ``n_pair``
    (corpus occurrences of the bigram) plus ``n_w1``/``n_w2`` (corpus
    occurrences of each word) — PMI / log-likelihood-ratio become
    consumer-side rationals over exact integers.  Pair counting runs on
    integer token codes (no object arrays in the hot path); the bigram
    exchange is keyed on the pair.  Unigram totals ride a separate tiny
    exchange and broadcast into the merge kernel — the unigram table is
    vocabulary-bounded, not corpus-bounded, which is what makes the
    broadcast legitimate at 100 TB (same rationale as the top-k vocab in
    :func:`token_cooccurrence`)."""
    from ..util import arrow_key_ids

    ds = _read(sf_dir, "documents", ["text"])

    def uni_partial(df: pd.DataFrame) -> pd.DataFrame:
        uniq, codes, _lens = dd.unique_tokens(df["text"])
        if not len(codes):
            return pd.DataFrame({"w": np.array([], dtype=object),
                                 "n": np.array([], np.int64)})
        cnt = np.bincount(codes, minlength=len(uniq))
        return pd.DataFrame({"w": uniq, "n": cnt.astype(np.int64)})

    uni = hash_exchange(
        ds.map_batches(uni_partial, batch_format="pandas"),
        key_fn=lambda t: arrow_key_ids(t, ["w"], 8), n_parts=8,
        kernel=lambda df: df.groupby("w", sort=False)["n"].sum()
                            .astype(np.int64).reset_index(),
        fmt="pandas").to_pandas()
    n_of = dict(zip(uni["w"], uni["n"]))

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"w1": np.array([], dtype=object),
                              "w2": np.array([], dtype=object),
                              "n_pair": np.array([], np.int64)})
        uniq, codes, lens = dd.unique_tokens(df["text"])
        if len(codes) < 2:
            return empty
        # adjacency mask: position i pairs with i+1 unless i is a doc's
        # last token (doc ends at cumsum(lens)-1)
        ends = np.cumsum(lens)
        ok = np.ones(len(codes) - 1, dtype=bool)
        ok[ends[ends < len(codes)] - 1] = False
        if not ok.any():
            return empty
        K = len(uniq)
        pair = codes[:-1][ok].astype(np.int64) * K + codes[1:][ok]
        uk, cnt = np.unique(pair, return_counts=True)
        return pd.DataFrame({"w1": uniq[uk // K], "w2": uniq[uk % K],
                             "n_pair": cnt.astype(np.int64)})

    pairs = ds.map_batches(pair_partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["w1", "w2"], sort=False)["n_pair"].sum()
               .reset_index())
        out["n_pair"] = out["n_pair"].astype(np.int64)
        out["n_w1"] = out["w1"].map(n_of).astype(np.int64)
        out["n_w2"] = out["w2"].map(n_of).astype(np.int64)
        return out

    return hash_exchange(
        pairs, key_fn=lambda t: arrow_key_ids(t, ["w1", "w2"], 8),
        n_parts=8, kernel=merge, fmt="pandas")


def vocab_growth(sf_dir: str):
    """Heaps-law vocabulary-growth curve: for every doc (in doc_id order)
    the cumulative number of DISTINCT tokens seen so far.  Distributed as
    two exact reductions, never a stateful scan: (1) per token, the
    minimum doc_id containing it (token-keyed exchange, min-mergeable);
    (2) tokens-per-first-doc counts fold into a cumulative sum over the
    distinct doc_id axis in a one-partition kernel — the fold input is
    vocabulary/doc-count bounded, the same per-block offset-fold shape as
    ``events_pareto_curve``."""
    from ..util import arrow_key_ids

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def first_partial(df: pd.DataFrame) -> pd.DataFrame:
        uniq, codes, lens = dd.unique_tokens(df["text"])
        if not len(codes):
            return pd.DataFrame({"w": np.array([], dtype=object),
                                 "first_doc": np.array([], np.int64)})
        doc_ids = np.repeat(df["doc_id"].to_numpy(), lens)
        # min doc_id per token code
        first = np.full(len(uniq), np.iinfo(np.int64).max, np.int64)
        np.minimum.at(first, codes, doc_ids)
        return pd.DataFrame({"w": uniq, "first_doc": first})

    firsts = hash_exchange(
        ds.map_batches(first_partial, batch_format="pandas"),
        key_fn=lambda t: arrow_key_ids(t, ["w"], 8), n_parts=8,
        kernel=lambda df: df.groupby("w", sort=False)["first_doc"].min()
                            .astype(np.int64).reset_index(),
        fmt="pandas")

    def count_new(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("first_doc", sort=False).size().rename("k")
               .reset_index())
        out["k"] = out["k"].astype(np.int64)
        return out

    new_at = hash_exchange(
        firsts, key_fn=lambda t: arrow_key_ids(t, ["first_doc"], 8),
        n_parts=8, kernel=count_new, fmt="pandas")

    doc_ids = _read(sf_dir, "documents", ["doc_id"])

    def fold(counts: pd.DataFrame, docs: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(docs["doc_id"].to_numpy().astype(np.int64))
        k = np.zeros(len(d), np.int64)
        if len(counts):
            pos = np.searchsorted(d, counts["first_doc"].to_numpy())
            np.add.at(k, pos, counts["k"].to_numpy())
        return pd.DataFrame({"doc_id": d,
                             "vocab_size": np.cumsum(k).astype(np.int64)})

    return hash_exchange_multi(
        [(new_at, lambda t: np.zeros(t.num_rows, dtype=np.int64)),
         (doc_ids, lambda t: np.zeros(t.num_rows, dtype=np.int64))],
        n_parts=1, kernel=fold, fmt="pandas")


def degree_hist(sf_dir: str, threshold: float = 0.5):
    """Degree distribution of the n-gram near-dup graph: for each degree,
    how many docs have exactly that many near-duplicate neighbors — the
    one-number-per-node summary that separates clique-heavy corpora
    (dup factories) from chains.  Same edge truth as
    :func:`triangle_counts`; degrees fold in a node-keyed exchange,
    the histogram in a degree-keyed one (both mergeable sums)."""
    tune_context()

    pairs = ngram_jaccard(sf_dir, threshold=threshold)

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        nodes = np.concatenate([df["id_a"].to_numpy(dtype=np.int64),
                                df["id_b"].to_numpy(dtype=np.int64)])
        u, c = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": u, "deg": c.astype(np.int64)})

    degs = hash_exchange(
        pairs.map_batches(deg_partial, batch_format="pandas"),
        key_fn=_pair_hash_key(["node"]), n_parts=N_DOC_PARTS,
        kernel=lambda df: df.groupby("node", sort=False)["deg"].sum()
        .astype(np.int64).reset_index(), fmt="pandas")

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("deg", sort=False).size().rename("n_docs")
               .reset_index())
        return pd.DataFrame({"degree": out["deg"].astype(np.int64),
                             "n_docs": out["n_docs"].astype(np.int64)})

    return hash_exchange(
        degs, key_fn=_pair_hash_key(["deg"], 8), n_parts=8,
        kernel=hist, fmt="pandas")


def reach_2hop(sf_dir: str, threshold: float = 0.5):
    """Two-hop reachability census over the n-gram near-dup graph (the
    same edge truth as :func:`triangle_counts` / :func:`degree_hist`):
    for each doc in the graph, how many OTHER docs sit within ≤ 2 hops —
    the local-neighborhood-size signal that separates a doc inside a dup
    factory from one with a single accidental twin.  One mid-keyed
    exchange expands each node's neighbor list into its wedge pairs
    (volume Σ deg(mid)² is inherent to the semantics; pairs dedup inside
    the partition before they ship — on clique-shaped dup clusters that
    collapses most of the blow-up), one src-keyed exchange unions wedges
    with the direct edges and counts distinct destinations.  All
    vectorized: the wedge cross-product is the counts/starts index
    construction, dedup is lexsort + edge mask (3× drop_duplicates,
    CLAUDE.md)."""
    tune_context()

    pairs = ngram_jaccard(sf_dir, threshold=threshold)

    def both(df: pd.DataFrame) -> pd.DataFrame:
        a = df["id_a"].to_numpy(dtype=np.int64)
        b = df["id_b"].to_numpy(dtype=np.int64)
        return pd.DataFrame({"mid": np.concatenate([a, b]),
                             "nbr": np.concatenate([b, a])})

    edges = pairs.map_batches(both, batch_format="pandas")

    def _dedup_pairs(src: np.ndarray, dst: np.ndarray):
        if len(src) == 0:
            return src, dst
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        keep = np.concatenate(
            ([True], (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])))
        return src[keep], dst[keep]

    def wedges(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"src": np.array([], dtype=np.int64),
                                 "dst": np.array([], dtype=np.int64)})
        df = df.sort_values(["mid", "nbr"], kind="stable")
        mid = df["mid"].to_numpy(dtype=np.int64)
        nbr = df["nbr"].to_numpy(dtype=np.int64)
        new = np.concatenate(([True], mid[1:] != mid[:-1]))
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(mid)))
        # all (i, j) index pairs within each mid's neighbor run
        tot = counts * counts
        base = np.repeat(starts, tot)
        k = np.arange(int(tot.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(tot) - tot, tot)
        cc = np.repeat(counts, tot)
        left, right = base + k // cc, base + k % cc
        m = left != right   # neighbor lists are deduped -> src != dst
        src, dst = _dedup_pairs(nbr[left[m]], nbr[right[m]])
        return pd.DataFrame({"src": src, "dst": dst})

    hop2 = hash_exchange(edges, key_fn=_pair_hash_key(["mid"]),
                         n_parts=N_DOC_PARTS, kernel=wedges, fmt="pandas")

    def direct(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"src": df["mid"].to_numpy(dtype=np.int64),
                             "dst": df["nbr"].to_numpy(dtype=np.int64)})

    allp = hop2.union(edges.map_batches(direct, batch_format="pandas"))

    def count_kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"doc_id": np.array([], dtype=np.int64),
                                 "reach2": np.array([], dtype=np.int64)})
        src = df["src"].to_numpy(dtype=np.int64)
        dst = df["dst"].to_numpy(dtype=np.int64)
        m = src != dst
        src, dst = _dedup_pairs(src[m], dst[m])
        if len(src) == 0:
            return pd.DataFrame({"doc_id": np.array([], dtype=np.int64),
                                 "reach2": np.array([], dtype=np.int64)})
        starts = np.flatnonzero(
            np.concatenate(([True], src[1:] != src[:-1])))
        return pd.DataFrame({
            "doc_id": src[starts],
            "reach2": np.diff(np.append(starts, len(src)))
            .astype(np.int64)})

    return hash_exchange(allp, key_fn=_pair_hash_key(["src"]),
                         n_parts=N_DOC_PARTS, kernel=count_kernel,
                         fmt="pandas")


def dedup_eval(sf_dir: str, threshold: float = 0.5, max_hamming: int = 3):
    """Candidate-quality audit of SimHash blocking against the exact
    token-Jaccard truth — the dedup-pipeline acceptance test a data
    curator runs before trusting a cheaper heuristic: precision/recall
    NUMERATORS as exact integers (``n_cand``, ``n_truth``, ``n_hit``;
    the ratios are consumer-side rationals, the fixed-decimal rule).
    Both pair sets are the already-oracle-checked pipelines
    (:func:`simhash_pairs` at Hamming ≤ 3, :func:`token_jaccard` ≥
    ``threshold``, which blocks by lang — simhash may propose cross-lang
    pairs, a real precision cost the audit should see).  Pairs carry a
    side marker through ONE pair-keyed exchange (hit = both sides
    present in the co-partition), per-partition counts fold in a
    single-row final exchange — pair payloads never leave their
    partition."""
    tune_context()

    cand = simhash_pairs(sf_dir, max_hamming=max_hamming)
    truth = token_jaccard(sf_dir, threshold=threshold)

    def mark(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "id_a": df["id_a"].to_numpy(dtype=np.int64),
                "id_b": df["id_b"].to_numpy(dtype=np.int64),
                "side": np.full(len(df), side, dtype=np.int64)})
        return fn

    both = (cand.map_batches(mark(0), batch_format="pandas")
            .union(truth.map_batches(mark(1), batch_format="pandas")))

    def part_counts(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], dtype=np.int64)
                                 for c in ["n_cand", "n_truth", "n_hit"]})
        g = (df.groupby(["id_a", "id_b"], sort=False)["side"]
             .agg(["min", "max", "count"]))
        hit = ((g["min"] == 0) & (g["max"] == 1)).sum()
        n_cand = (df["side"].to_numpy() == 0).sum()
        n_truth = (df["side"].to_numpy() == 1).sum()
        return pd.DataFrame({"n_cand": [np.int64(n_cand)],
                             "n_truth": [np.int64(n_truth)],
                             "n_hit": [np.int64(hit)]})

    parts = hash_exchange(both, key_fn=_pair_hash_key(["id_a", "id_b"]),
                          n_parts=N_DOC_PARTS, kernel=part_counts,
                          fmt="pandas")
    return hash_exchange(
        parts, key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1,
        kernel=lambda d: pd.DataFrame(
            {"n_cand": [np.int64(d["n_cand"].sum())],
             "n_truth": [np.int64(d["n_truth"].sum())],
             "n_hit": [np.int64(d["n_hit"].sum())]}),
        fmt="pandas")


def cluster_size_hist(sf_dir: str, threshold: float = 0.5):
    """Histogram of duplicate-cluster SIZES — the dedup-audit companion
    to :func:`degree_hist` (connected-component structure instead of
    node degrees): for each cluster size, how many clusters have it.
    Sizes fold in a cluster-keyed exchange over :func:`dup_clusters`'
    assignments, the histogram in a size-keyed one."""
    tune_context()

    assign = dup_clusters(sf_dir, threshold=threshold)

    def size_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("cluster_id", sort=False).size().rename("n")
               .reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    sizes = hash_exchange(
        assign.map_batches(size_partial, batch_format="pandas"),
        key_fn=_pair_hash_key(["cluster_id"]), n_parts=N_DOC_PARTS,
        kernel=lambda df: df.groupby("cluster_id", sort=False)["n"].sum()
        .astype(np.int64).reset_index(), fmt="pandas")

    def hist(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("n", sort=False).size().rename("n_clusters")
               .reset_index())
        return pd.DataFrame({
            "cluster_size": out["n"].astype(np.int64),
            "n_clusters": out["n_clusters"].astype(np.int64)})

    return hash_exchange(
        sizes, key_fn=_pair_hash_key(["n"], 8), n_parts=8,
        kernel=hist, fmt="pandas")


def boolean_search(sf_dir: str,
                   terms: tuple = ("spark", "window", "merge")):
    """Boolean multi-term retrieval: per doc, the bitmask / count of
    query terms present and the AND-hit flag — the fixed-query scan a
    search layer runs before ranking.  The K query terms broadcast in
    the task closure (K is query-sized, never corpus-sized), each batch
    resolves them against its LOCAL vocab from the shared byte-run
    tokenizer and ORs per-doc bits with one bounded pass per term —
    map-only, no exchange: every doc decides its own membership."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    term_list = [str(t) for t in terms]

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["doc_id", "match_mask", "n_matched", "all_terms"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        uniq, codes, lens = dd.unique_tokens(df["text"])
        n_docs = len(lens)
        mask = np.zeros(n_docs, dtype=np.int64)
        if len(codes):
            doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
            code_of = {t: i for i, t in enumerate(uniq)}
            for k, term in enumerate(term_list):
                c = code_of.get(term)
                if c is None:
                    continue
                hit_docs = np.unique(doc_of[codes == c])
                mask[hit_docs] |= np.int64(1 << k)
        # popcount over K query bits, vectorized (K is query-sized)
        n_matched = np.zeros(n_docs, dtype=np.int64)
        for k in range(len(term_list)):
            n_matched += (mask >> np.int64(k)) & np.int64(1)
        keep = mask > 0
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy()[keep].astype(np.int64),
            "match_mask": mask[keep],
            "n_matched": n_matched[keep],
            "all_terms": (n_matched[keep]
                          == len(term_list)).astype(np.int64)})

    return (ds.map_batches(kernel, batch_format="pandas")
            .sort("doc_id"))


def phrase_count(sf_dir: str, w1: str = "fast", w2: str = "sort"):
    """Exact-phrase (adjacent-bigram) occurrence counts per doc — the
    phrase-retrieval primitive.  Counts EVERY adjacent occurrence
    (overlapping repeats included, which single-pass regex extraction
    under-counts — the oracle enumerates token positions instead).
    Runs on integer token codes from the shared byte-run tokenizer with
    the collocations adjacency mask; map-only."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["doc_id", "n_occ"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        uniq, codes, lens = dd.unique_tokens(df["text"])
        n_docs = len(lens)
        code_of = {t: i for i, t in enumerate(uniq)}
        c1, c2 = code_of.get(w1), code_of.get(w2)
        if c1 is None or c2 is None or len(codes) < 2:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        ends = np.cumsum(lens)
        ok = np.ones(len(codes) - 1, dtype=bool)
        ok[ends[ends < len(codes)] - 1] = False   # no cross-doc pairs
        hits = ok & (codes[:-1] == c1) & (codes[1:] == c2)
        if not hits.any():
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        n_occ = np.bincount(doc_of[:-1][hits], minlength=n_docs)
        keep = n_occ > 0
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy()[keep].astype(np.int64),
            "n_occ": n_occ[keep].astype(np.int64)})

    return (ds.map_batches(kernel, batch_format="pandas")
            .sort("doc_id"))


def edit_pairs(sf_dir: str, block_chars: int = 8, prefix_chars: int = 64,
               max_len_diff: int = 16):
    """Edit-distance near-dup candidates: document pairs sharing language
    and their first ``block_chars`` characters, with |n_chars| difference
    ≤ ``max_len_diff``, scored by the exact Levenshtein distance between
    their first ``prefix_chars`` characters.  The blocking rule IS the
    operator's contract (mirrored verbatim by the SQL oracle), the scale
    story of every dedup family member here: candidates are generated
    inside (lang, prefix) buckets only — never all-pairs — and only
    (doc_id, 64-byte prefix, n_chars) rides the exchange, never documents.
    The verify kernel is the pair-vectorized DP of
    :func:`_levenshtein_pairs` (O(64) numpy steps per partition)."""
    import pyarrow as pa

    P = 8
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang", "n_chars"])

    def project(tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        key = pc.binary_join_element_wise(
            tbl.column("lang"),
            pc.utf8_slice_codeunits(tbl.column("text"), 0, block_chars),
            "\x01")
        pre = pc.utf8_slice_codeunits(tbl.column("text"), 0, prefix_chars)
        return pa.table({"doc_id": tbl.column("doc_id"), "key": key,
                         "pre": pre, "n_chars": tbl.column("n_chars")})

    rows = ds.map_batches(project, batch_format="pyarrow")

    def key_fn(tbl):
        from ..util import arrow_col_hash

        return (arrow_col_hash(tbl, "key") % np.uint64(P)).astype(np.int64)

    def kernel(tbl: pa.Table) -> pd.DataFrame:
        cols = ["doc_id1", "doc_id2", "dist"]
        empty = pd.DataFrame({c: np.array([], np.int64) for c in cols})
        if tbl.num_rows == 0:
            return empty
        keys = tbl.column("key").to_numpy(zero_copy_only=False)
        ids = tbl.column("doc_id").to_numpy(zero_copy_only=False)
        nch = tbl.column("n_chars").to_numpy(zero_copy_only=False)
        codes, _ = pd.factorize(keys)
        order = np.lexsort((ids, codes))
        bounds = np.flatnonzero(np.diff(codes[order], prepend=-1,
                                        append=-2))
        ii, jj = [], []
        for s, e in zip(bounds[:-1], bounds[1:]):   # per-bucket pairs;
            m = e - s                               # buckets are small by
            if m < 2:                               # construction (blocked)
                continue
            a, b = np.triu_indices(m, k=1)
            ii.append(order[s:e][a])
            jj.append(order[s:e][b])
        if not ii:
            return empty
        i = np.concatenate(ii)
        j = np.concatenate(jj)
        keep = np.abs(nch[i] - nch[j]) <= max_len_diff
        i, j = i[keep], j[keep]
        if not len(i):
            return empty
        lo = np.where(ids[i] < ids[j], i, j)
        hi = np.where(ids[i] < ids[j], j, i)
        mat, lens = _padded_prefix_bytes(tbl.column("pre"), prefix_chars)
        dist = _levenshtein_pairs(mat[lo], lens[lo], mat[hi], lens[hi])
        out = pd.DataFrame({"doc_id1": ids[lo].astype(np.int64),
                            "doc_id2": ids[hi].astype(np.int64),
                            "dist": dist.astype(np.int64)})
        return out[cols]

    return hash_exchange(rows, key_fn=key_fn, n_parts=P, kernel=kernel,
                         fmt="pyarrow")


# ---------- k-core decomposition ----------

def kcore(sf_dir: str, ks=(2, 3), threshold: float = 0.5,
          n_parts: int = N_DOC_PARTS, max_iters: int = 64):
    """k-core decomposition of the n-gram near-dup graph (the same edge
    truth as :func:`triangle_counts` / :func:`degree_hist`): for each
    ``k`` in ``ks``, the maximal subgraph where every surviving doc keeps
    ≥ k surviving near-dup neighbors, emitted as (k, doc_id,
    deg_in_core).  The dup-pipeline reading: a 2-core member sits inside
    a duplication STRUCTURE (cycles/cliques), not just a chain of
    accidental twins; rising k isolates the dup factories.

    Distributed DELTA PEELING, the :func:`cluster_pairs` discipline:
    edges (both directions) are pre-split ONCE by src hash, so every
    node's degree is partition-local.  Each round a partition deletes the
    edges named by incoming removal notices, recomputes local degrees,
    and removes nodes that fell below k — shipping each removed node's
    remaining edges as (neighbor, removed) notices PRE-SPLIT by the
    neighbor's hash (the propose_split fusion).  Every edge's notice
    ships at most once over the whole peel (total traffic ≤ |E|); a
    partition with no incoming notices runs NO task (frozen region); the
    driver only ever sees per-round notice counts.  ``ks`` must ascend —
    the (k+1)-core ⊆ k-core, so each level resumes peeling from the
    previous level's survivors instead of restarting."""
    import pyarrow as pa
    import ray
    import ray.data

    from ..stages.exchange import concat_clean, split_table_by_ids

    assert tuple(ks) == tuple(sorted(ks)), "ks must ascend (core nesting)"
    tune_context()
    _, edges_pre, key_src = _presplit_graph_edges(
        ngram_jaccard(sf_dir, threshold=threshold), n_parts)

    def _pack(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
        # composite edge key for notice membership (doc ids < 2^31)
        return (src.astype(np.uint64) << np.uint64(32)) | dst.astype(
            np.uint64)

    @ray.remote
    def init_part(*edge_parts):
        t = concat_clean(edge_parts)
        if t is None:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return t

    @ray.remote
    def peel_part(edge_tbl, k: int, *notice_parts):
        e_src = edge_tbl.column("src").to_numpy(zero_copy_only=False)
        e_dst = edge_tbl.column("dst").to_numpy(zero_copy_only=False)
        notes = [t for t in notice_parts if t is not None and t.num_rows]
        if notes:
            nt = pa.concat_tables(notes)
            bad = np.unique(_pack(
                nt.column("src").to_numpy(zero_copy_only=False),
                nt.column("dst").to_numpy(zero_copy_only=False)))
            keep = ~np.isin(_pack(e_src, e_dst), bad, assume_unique=False)
            e_src, e_dst = e_src[keep], e_dst[keep]
        # local degrees (all of a src's edges live here by construction)
        u, counts = np.unique(e_src, return_counts=True)
        gone = counts < k
        if not gone.any():
            out = pa.table({"src": pa.array(e_src), "dst": pa.array(e_dst)})
            return (out, *[None] * n_parts, 0)
        removed = u[gone]
        drop_src = np.isin(e_src, removed)
        # notices: each removed node's still-alive edges, addressed to the
        # NEIGHBOR's partition (reverse-edge owner), pre-split by its hash
        n_src, n_dst = e_dst[drop_src], e_src[drop_src]
        note = pa.table({"src": pa.array(n_src), "dst": pa.array(n_dst)})
        slices, _ = split_table_by_ids(note, key_src(note), n_parts)
        keep2 = ~drop_src & ~np.isin(e_dst, removed)
        out = pa.table({"src": pa.array(e_src[keep2]),
                        "dst": pa.array(e_dst[keep2])})
        return (out, *slices, int(removed.size))

    # level init: concat each partition's edge slices once
    edge_refs: list = []
    for p in range(n_parts):
        parts = edges_pre.part_refs(p)
        edge_refs.append(init_part.remote(*parts) if parts else None)

    import ray as _ray
    results = []
    for k in ks:
        # kick the level: every live partition re-checks deg < k
        pending = {p: [] for p in range(n_parts) if edge_refs[p] is not None}
        for _ in range(max_iters):
            if not pending:
                break
            outs = {p: peel_part.options(num_returns=n_parts + 2)
                    .remote(edge_refs[p], k, *notices)
                    for p, notices in pending.items()}
            nxt: dict = {}
            for p, ret in outs.items():
                edge_refs[p] = ret[0]
                n_rm = _ray.get(ret[n_parts + 1])
                if n_rm:
                    for q in range(n_parts):
                        nxt.setdefault(q, []).append(ret[1 + q])
            pending = {q: v for q, v in nxt.items()
                       if edge_refs[q] is not None}
        live = [r for r in edge_refs if r is not None]
        if live:
            lvl = ray.data.from_arrow_refs(list(live))

            def deg(df: pd.DataFrame, _k=k) -> pd.DataFrame:
                if not len(df):
                    return pd.DataFrame({
                        "k": np.array([], np.int64),
                        "doc_id": np.array([], np.int64),
                        "deg_in_core": np.array([], np.int64)})
                u, c = np.unique(df["src"].to_numpy(np.int64),
                                 return_counts=True)
                return pd.DataFrame({
                    "k": np.full(len(u), _k, np.int64), "doc_id": u,
                    "deg_in_core": c.astype(np.int64)})

            results.append(lvl.map_batches(deg, batch_format="pandas"))
    if not results:
        import pandas as _pd

        return ray.data.from_pandas(_pd.DataFrame({
            "k": np.array([], np.int64),
            "doc_id": np.array([], np.int64),
            "deg_in_core": np.array([], np.int64)}))
    out = results[0]
    for r in results[1:]:
        out = out.union(r)
    return out


# ---------- tokenizer statistics & fingerprint selection ----------

def bpe_pairs(sf_dir: str):
    """BPE merge-candidate statistics: corpus-wide counts of adjacent
    CHARACTER pairs inside ``[A-Za-z0-9]+`` tokens — the table byte-pair
    encoding's first merge step ranks.  Pure map-side byte kernel (the
    byte-run tokenizer's mask trick: a pair counts iff both bytes are in
    the alnum class, which can never span a token boundary; row
    boundaries invalidated explicitly); partials are ≤ 62² cells folded
    per batch, so the exchange is bounded by the ALPHABET, not the
    corpus.  Exact under UTF-8 — multibyte sequences never contain ASCII
    bytes."""
    import pyarrow as pa

    P = 1                              # ≤ 62² rows total
    ds = _read(sf_dir, "documents", ["text"])

    def partial(tbl: pa.Table) -> pa.Table:
        arr = tbl.column("text")
        arr = (arr.combine_chunks() if isinstance(arr, pa.ChunkedArray)
               else arr)
        n = len(arr)
        if n == 0 or arr.buffers()[2] is None:
            return pa.table({"code": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        off_dtype = (np.int64 if pa.types.is_large_string(arr.type)
                     else np.int32)
        offs = np.frombuffer(arr.buffers()[1], dtype=off_dtype)[
            arr.offset: arr.offset + n + 1].astype(np.int64)
        data = np.frombuffer(arr.buffers()[2], np.uint8)[offs[0]:offs[-1]]
        offs = offs - offs[0]
        if len(data) < 2:
            return pa.table({"code": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        lo = data | np.uint8(0x20)
        m = (((lo >= 97) & (lo <= 122))
             | ((data >= 48) & (data <= 57)))
        valid = m[:-1] & m[1:]
        row_starts = offs[1:-1]        # a pair never spans two rows
        valid[row_starts[row_starts > 0] - 1] = False
        left = data[:-1][valid].astype(np.int64)
        right = data[1:][valid].astype(np.int64)
        cnt = np.bincount(left * 256 + right, minlength=0)
        nz = np.flatnonzero(cnt)
        return pa.table({"code": pa.array(nz.astype(np.int64)),
                         "cnt": pa.array(cnt[nz].astype(np.int64))})

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["c1", "c2", "cnt"]
        if len(df) == 0:
            out = pd.DataFrame({"c1": pd.Series([], dtype=object),
                                "c2": pd.Series([], dtype=object),
                                "cnt": np.array([], np.int64)})
            return out[cols]
        g = df.groupby("code", sort=True)["cnt"].sum()
        codes = g.index.to_numpy()
        return pd.DataFrame({
            "c1": [chr(c >> 8) for c in codes],
            "c2": [chr(c & 255) for c in codes],
            "cnt": g.to_numpy().astype(np.int64)})[cols]

    return hash_exchange(partials,
                         key_fn=lambda t: np.zeros(t.num_rows, np.int64),
                         n_parts=P, kernel=merge, fmt="pandas")


def winnowing(sf_dir: str, w: int = 4):
    """Winnowed document fingerprints (Schleimer et al., the MOSS
    algorithm): over each doc's word-3-shingle md5 sequence, every window
    of ``w`` consecutive shingles selects its RIGHTMOST minimal hash; the
    distinct selected (doc_id, pos, h) rows are the fingerprint set —
    the guarantee-bearing substring-dedup primitive (any shared run of
    w+2 tokens shares a fingerprint).  Docs with fewer than ``w``
    shingles winnow their single full window, so every doc emits ≥ 1
    fingerprint.  Map-only (no shuffle): selection is per-doc, windows
    are a (n_windows × w) gather off the flat shingle array, rightmost
    argmin = numpy first-argmin over leftward offsets.  Shingle identity
    is the SQL oracle's own chr(1)-joined md5 (exact_dedup
    discipline)."""
    import pyarrow as pa

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    UMAX = np.uint64(0xFFFFFFFFFFFFFFFF)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["doc_id", "pos", "h"]
        if len(df) == 0:
            return pd.DataFrame({"doc_id": np.array([], np.int64),
                                 "pos": np.array([], np.int64),
                                 "h": np.array([], np.uint64)})[cols]
        doc_of, sh = dd.doc_shingle_md5_seq(df["text"])
        ids = df["doc_id"].to_numpy()
        m = np.bincount(doc_of, minlength=len(df)).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(m)[:-1]))
        n_win = np.maximum(m - w + 1, 1)
        w_doc = np.repeat(np.arange(len(df)), n_win)
        offs_w = np.concatenate(([0], np.cumsum(n_win)[:-1]))
        t = np.arange(int(n_win.sum())) - np.repeat(offs_w, n_win)
        j = np.minimum(w - 1 + t, m[w_doc] - 1)     # window end (in-doc)
        end_flat = starts[w_doc] + j
        k = np.arange(w)                             # 0 = window end
        idx = end_flat[:, None] - k
        valid = k <= j[:, None]
        vals = np.where(valid, sh[np.maximum(idx, 0)], UMAX)
        k_sel = np.argmin(vals, axis=1)              # first = rightmost
        wmin = vals[np.arange(len(vals)), k_sel]
        pos = j - k_sel + 1                          # 1-based, SQL substr
        d = w_doc
        order = np.lexsort((pos, d))
        ds_, ps_, hs_ = d[order], pos[order], wmin[order]
        keep = np.concatenate(([True], (ds_[1:] != ds_[:-1])
                               | (ps_[1:] != ps_[:-1])))
        return pd.DataFrame({"doc_id": ids[ds_[keep]].astype(np.int64),
                             "pos": ps_[keep].astype(np.int64),
                             "h": hs_[keep]})[cols]

    return ds.map_batches(kernel, batch_format="pandas")


def rake(sf_dir: str):
    """RAKE keyword statistics (Rose et al. 2010): split each doc's token
    stream into candidate phrases at stopwords (and doc boundaries), then
    for every non-stop word emit its corpus ``freq`` (occurrences inside
    phrases) and ``deg`` (sum of the containing phrase's length over those
    occurrences, self included) — the RAKE score ``deg/freq`` is a
    consumer-side rational over exact ints (collocations discipline).
    Map-side: phrase segmentation is a cumsum over the stop mask on
    integer token codes (stopword lookup is vocab-bounded, not
    corpus-bounded); the exchange carries one (w, freq, deg) row per
    distinct word per batch."""
    from ..util import arrow_key_ids

    ds = _read(sf_dir, "documents", ["text"])
    stop_set = frozenset(RAKE_STOPWORDS)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["w", "freq", "deg"]
        empty = pd.DataFrame({"w": np.array([], dtype=object),
                              "freq": np.array([], np.int64),
                              "deg": np.array([], np.int64)})[cols]
        uniq, codes, lens = dd.unique_tokens(df["text"])
        if not len(codes):
            return empty
        is_stop = np.fromiter((t.lower() in stop_set for t in uniq),
                              bool, len(uniq))
        st = is_stop[codes]
        nk = ~st
        if not nk.any():
            return empty
        doc_of = np.repeat(np.arange(len(lens)), lens)
        # stops strictly before each position, within its doc: exclusive
        # global cumsum minus the doc-start offset
        cst = np.cumsum(st).astype(np.int64)
        excl = cst - st
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pid = excl - excl[starts][doc_of]
        seg = doc_of.astype(np.int64) * (int(lens.max()) + 1) + pid
        segs, cds = seg[nk], codes[nk]
        _, sidx = np.unique(segs, return_inverse=True)
        plen = np.bincount(sidx).astype(np.int64)
        freq = np.bincount(cds, minlength=len(uniq)).astype(np.int64)
        deg = np.zeros(len(uniq), np.int64)
        np.add.at(deg, cds, plen[sidx])
        nz = freq > 0
        return pd.DataFrame({"w": uniq[nz], "freq": freq[nz],
                             "deg": deg[nz]})[cols]

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("w", sort=False)[["freq", "deg"]].sum()
               .reset_index())
        out["freq"] = out["freq"].astype(np.int64)
        out["deg"] = out["deg"].astype(np.int64)
        return out[["w", "freq", "deg"]]

    return hash_exchange(partials,
                         key_fn=lambda t: arrow_key_ids(t, ["w"], 8),
                         n_parts=8, kernel=merge, fmt="pandas")


def pagerank(sf_dir: str, threshold: float = 0.5, rounds: int = 5,
             n_parts: int = N_DOC_PARTS, scale: int = PAGERANK_SCALE):
    """Integer-exact PageRank over the n-gram near-dup graph (the same
    edge truth as :func:`kcore` / :func:`triangle_counts`): ``rounds``
    power-iteration steps with damping 17/20 over int64 numerators at
    ``scale`` — the dup-pipeline reading of a high score is "this doc
    sits at the center of a duplication structure", the natural survivor
    pick.  ALL arithmetic is integer with explicitly floored divisions
    (``pr // deg`` per out-edge, ``(17 * Σ) // 20`` on the damped sum,
    base mass ``(3·scale) // (20·N)``) so contribution sums are
    order-independent and the SQL oracle is bit-equal — the float-sum
    trap that keeps classic PageRank off exact gates never arises.

    Distribution is the :func:`cluster_pairs` shape: both-direction
    edges pre-split ONCE by src hash (degrees and contribution scans are
    partition-local), one task wave per round; a round ships only
    per-(partition, dst) partial contribution sums, pre-split by the
    dst's owner hash — traffic per round is bounded by the distinct-dst
    count per partition, never the edge count.  The driver sees node
    counts (one int per partition) and round numbers only.
    """
    import pyarrow as pa
    import ray
    import ray.data

    from ..stages.exchange import concat_clean, split_table_by_ids

    tune_context()
    _, edges_pre, key_src = _presplit_graph_edges(
        ngram_jaccard(sf_dir, threshold=threshold), n_parts)

    @ray.remote
    def init_part(*edge_parts):
        """Concat this partition's edge slices; emit static per-node
        state (node ids ascending, local out-degrees) once."""
        tbl = concat_clean(edge_parts)
        if tbl is None:
            empty = pa.table({"src": pa.array([], pa.int64()),
                              "dst": pa.array([], pa.int64())})
            return empty, np.array([], np.int64), np.array([], np.int64), 0
        src = tbl.column("src").to_numpy(zero_copy_only=False)
        nodes, deg = np.unique(src, return_counts=True)
        return (tbl, nodes.astype(np.int64), deg.astype(np.int64),
                int(nodes.size))

    inits = [init_part.options(num_returns=4).remote(*edges_pre.part_refs(p))
             for p in range(n_parts)]
    n_total = int(sum(ray.get([i[3] for i in inits])))
    if n_total == 0:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "deg": pa.array([], pa.int64()),
            "pr_num": pa.array([], pa.int64())}))
    base = (3 * scale) // (20 * n_total)
    pr0 = scale // n_total

    @ray.remote
    def contrib_part(edge_tbl, nodes, deg, pr, *incoming):
        """Apply last round's partial sums (if any), then emit this
        round's per-dst partial contributions pre-split by dst hash."""
        if incoming:
            sums = np.zeros(len(nodes), np.int64)
            for t in incoming:
                if t is None or not t.num_rows:
                    continue
                d = t.column("dst").to_numpy(zero_copy_only=False)
                s = t.column("s").to_numpy(zero_copy_only=False)
                sums[np.searchsorted(nodes, d)] += s
            pr = base + (17 * sums) // 20
        if pr is None:
            pr = np.full(len(nodes), pr0, np.int64)
        if not len(nodes):
            return (pr, *[None] * n_parts)
        src = edge_tbl.column("src").to_numpy(zero_copy_only=False)
        dst = edge_tbl.column("dst").to_numpy(zero_copy_only=False)
        c = (pr // deg)[np.searchsorted(nodes, src)]
        ud, inv = np.unique(dst, return_inverse=True)
        part_sum = np.zeros(len(ud), np.int64)   # int64 add: exact sums
        np.add.at(part_sum, inv, c)
        note = pa.table({"dst": pa.array(ud), "s": pa.array(part_sum)})
        ids = key_src(pa.table({"src": pa.array(ud)}))
        slices, _ = split_table_by_ids(note, ids, n_parts)
        return (pr, *slices)

    @ray.remote
    def final_part(nodes, deg, pr, *incoming):
        sums = np.zeros(len(nodes), np.int64)
        for t in incoming:
            if t is None or not t.num_rows:
                continue
            d = t.column("dst").to_numpy(zero_copy_only=False)
            s = t.column("s").to_numpy(zero_copy_only=False)
            sums[np.searchsorted(nodes, d)] += s
        pr = base + (17 * sums) // 20
        return pa.table({"doc_id": pa.array(nodes),
                         "deg": pa.array(deg),
                         "pr_num": pa.array(pr.astype(np.int64))})

    pr_refs: list = [None] * n_parts
    notices: list = [[] for _ in range(n_parts)]
    for r in range(rounds):
        outs = [contrib_part.options(num_returns=n_parts + 1)
                .remote(inits[p][0], inits[p][1], inits[p][2],
                        pr_refs[p], *notices[p])
                for p in range(n_parts)]
        pr_refs = [o[0] for o in outs]
        if r < rounds - 1:
            notices = [[outs[p][1 + q] for p in range(n_parts)]
                       for q in range(n_parts)]
        else:
            finals = [final_part.remote(
                inits[p][1], inits[p][2], pr_refs[p],
                *[outs[s][1 + p] for s in range(n_parts)])
                for p in range(n_parts)]
            return ray.data.from_arrow_refs(finals)


def containment_pairs(sf_dir: str, threshold: float = 0.8, k: int = 3):
    """Asymmetric set-CONTAINMENT join over word-3-shingle sets: directed
    pairs (A, B) with |A∩B| / |A| ≥ τ — the superset/quote-detection
    shape Jaccard misses (a doc fully quoted inside a much longer one has
    high containment but arbitrarily low Jaccard).  Same shingle identity
    as :func:`ngram_jaccard`'s SQL truth; output is the exact integer
    (inter, sz_a) pair per the rational-output discipline.

    Scale shape: A-side ships only prefix rows (the containment prefix
    theorem: ⌈τ|A|⌉−1 elements sit outside the prefix, so a true pair
    always collides); B-side is the full-element inverted index — bounded
    by corpus token volume, the TF-IDF exchange's cost envelope, with
    near-unique shingle hashes keeping buckets short.  One tok-keyed
    exchange generates directed candidates with the positional upper
    bound filter; the broadcast-vs-shuffle verify selector finishes."""
    import pyarrow as pa

    tune_context()
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    sets = ds.map_batches(dd.shingle_sets_table, batch_format="pyarrow",
                          fn_kwargs={"k": k}).materialize()

    def _mark(side):
        def add(tbl):
            return tbl.append_column(
                "side", pa.array(np.full(tbl.num_rows, side, np.int8)))
        return add

    a_rows = sets.map_batches(
        dd.prefix_token_rows, batch_format="pyarrow",
        fn_kwargs={"threshold": threshold}).map_batches(
        _mark(0), batch_format="pyarrow")
    b_rows = sets.map_batches(
        dd.all_token_rows, batch_format="pyarrow").map_batches(
        _mark(1), batch_format="pyarrow")
    cands = hash_exchange(
        a_rows.union(b_rows), key_fn=_pair_hash_key(["tok"]),
        n_parts=N_DOC_PARTS, kernel=dd.containment_candidates_partition,
        fmt="pandas", kernel_kwargs={"threshold": threshold})
    cands = _dedup_pairs(cands, ["id_a", "id_b"])
    return _verify_id_pairs(
        cands, sets.select_columns(["doc_id", "elems"]),
        payload_id="doc_id", payload_col="elems", attach_out="elems_a",
        verify_kernel=dd.set_containment_verify,
        verify_kwargs={"threshold": threshold})


def dedup_savings(sf_dir: str, threshold: float = 0.5):
    """Per-source dedup SAVINGS report — the pipeline-health table a
    training-data run publishes after cluster dedup: for every document
    ``source``, how many docs and characters the corpus holds before and
    after keep-min-per-cluster dedup (survivor = cluster keeper or
    unpaired singleton).  Exact integers off the oracle-checked cluster
    truth (:func:`dup_clusters`).

    Scale shape: the label table (only docs that appear in a near-dup
    pair — pair-bounded, not corpus-bounded) co-partitions with the
    documents' (doc_id, source, n_chars) rows on one doc-keyed exchange
    that emits per-partition (source, counts) partials; a final
    source-keyed exchange sums them.  Nothing corpus-sized leaves the
    partitions."""
    from ..stages.exchange import hash_exchange_multi
    from ..util import arrow_key_ids

    tune_context()
    docs_rows = _read(sf_dir, "documents",
                      ["doc_id", "source", "n_chars"])
    labels = dup_clusters(sf_dir, threshold=threshold)

    part_cols = ["source", "n_docs", "n_survivors",
                 "chars_before", "chars_after"]

    def partial(d: pd.DataFrame, lab: pd.DataFrame) -> pd.DataFrame:
        if not len(d):
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                **{c: np.array([], np.int64) for c in part_cols[1:]}})
        lab_idx = pd.Series(
            lab["cluster_id"].to_numpy(np.int64),
            index=lab["doc_id"].to_numpy(np.int64))
        ids = d["doc_id"].to_numpy(np.int64)
        clu = lab_idx.reindex(ids)
        surv = clu.isna().to_numpy() | (clu.to_numpy() == ids)
        nch = d["n_chars"].to_numpy(np.int64)
        g = pd.DataFrame({
            "source": d["source"].to_numpy(),
            "n_docs": np.ones(len(d), np.int64),
            "n_survivors": surv.astype(np.int64),
            "chars_before": nch,
            "chars_after": np.where(surv, nch, 0).astype(np.int64),
        }).groupby("source", as_index=False, sort=False).sum()
        return g[part_cols]

    partials = hash_exchange_multi(
        [(docs_rows, _pair_hash_key(["doc_id"])),
         (labels, _pair_hash_key(["doc_id"]))],
        n_parts=N_DOC_PARTS, kernel=partial, fmt="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("source", as_index=False, sort=False)
               [part_cols[1:]].sum())
        for c in part_cols[1:]:
            out[c] = out[c].astype(np.int64)
        return out[part_cols]

    return hash_exchange(partials,
                         key_fn=lambda t: arrow_key_ids(t, ["source"], 4),
                         n_parts=4, kernel=merge, fmt="pandas")


def bfs_hops(sf_dir: str, threshold: float = 0.5):
    """BFS hop distance from every doc to its duplicate-cluster ROOT (the
    min doc_id of its component — :func:`dup_clusters`'s cluster_id) over
    the exact n-gram near-dup graph.  The distances come FREE from the
    label-propagation rounds :func:`cluster_pairs` already runs: a node's
    label at round r is the min id within r hops, so the round of its
    LAST label change is exactly its BFS distance from the root
    (``with_hops=True`` threads one extra int column through the frozen
    per-partition label refs — zero extra rounds or shuffles).  The SQL
    mirror is a bounded-depth path enumeration + min(hop) to the
    component min — exact while the true eccentricity stays under the
    cap, which near-dup clusters (shallow, clique-heavy) always do."""

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"doc_id": df["node"].astype(np.int64),
                             "cluster_id": df["label"].astype(np.int64),
                             "hop": df["hop"].astype(np.int64)})

    return cluster_pairs(ngram_jaccard(sf_dir, threshold=threshold),
                         with_hops=True
                         ).map_batches(rename, batch_format="pandas")


def lang_modularity(sf_dir: str, threshold: float = 0.5):
    """Newman MODULARITY of the language partition over the exact n-gram
    near-dup graph, as EXACT INTEGER numerators: per language c,
    ``mod_num = 4m·e_c − d_c²`` where m = total edges, e_c = intra-lang
    edges, d_c = degree sum of lang-c nodes (Q = Σ_c mod_num / 4m² —
    the consumer divides; the oracle never sees a float).  Answers "are
    near-duplicates language-bound?" — Q near its maximum means dup
    clusters never cross languages.  Langs ride the id-keyed exchanges
    (two attach rounds, one per endpoint — the doc→lang map is
    fact-scale, never a driver dict, per the round-3 verdict's
    broadcast-guard rule); every aggregate after that is a (lang_a,
    lang_b) cell table, ≤ 25 rows per partition."""
    pairs = ngram_jaccard(sf_dir, threshold=threshold).materialize()
    docs = _read(sf_dir, "documents", ["doc_id", "lang"])

    def att_a(pt: pd.DataFrame, dt: pd.DataFrame) -> pd.DataFrame:
        m = pt.merge(dt, left_on="id_a", right_on="doc_id", how="left")
        return pd.DataFrame({
            "id_a": m["id_a"].to_numpy(np.int64),
            "id_b": m["id_b"].to_numpy(np.int64),
            "lang_a": m["lang"].astype(str)})

    def key_on(col, n=N_DOC_PARTS):
        return _pair_hash_key([col], n)

    e1 = hash_exchange_multi(
        [(pairs, key_on("id_a")), (docs, key_on("doc_id"))],
        n_parts=N_DOC_PARTS, kernel=att_a, fmt="pandas")

    def att_b(pt: pd.DataFrame, dt: pd.DataFrame) -> pd.DataFrame:
        m = pt.merge(dt, left_on="id_b", right_on="doc_id", how="left")
        g = (pd.DataFrame({"lang_a": m["lang_a"].astype(str),
                           "lang_b": m["lang"].astype(str)})
             .groupby(["lang_a", "lang_b"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        g["kind"] = "e"
        return g[["kind", "lang_a", "lang_b", "n"]]

    epart = hash_exchange_multi(
        [(e1, key_on("id_b")), (docs, key_on("doc_id"))],
        n_parts=N_DOC_PARTS, kernel=att_b, fmt="pandas")

    def both(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"node": np.concatenate(
            [df["id_a"].to_numpy(np.int64),
             df["id_b"].to_numpy(np.int64)])})

    nodes = pairs.map_batches(both, batch_format="pandas")

    def node_kernel(nt: pd.DataFrame, dt: pd.DataFrame) -> pd.DataFrame:
        u = pd.unique(nt["node"])   # node-hash partition -> globally unique
        m = (pd.DataFrame({"doc_id": u})
             .merge(dt, on="doc_id", how="left"))
        g = (m.groupby("lang", sort=False).size().rename("n")
             .reset_index())
        return pd.DataFrame({"kind": "n", "lang_a": g["lang"].astype(str),
                             "lang_b": "", "n": g["n"].astype(np.int64)})

    npart = hash_exchange_multi(
        [(nodes, key_on("node")), (docs, key_on("doc_id"))],
        n_parts=N_DOC_PARTS, kernel=node_kernel, fmt="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["lang", "n_nodes", "d_sum", "e_in", "mod_num"]
        e = df.loc[df["kind"] == "e"]
        nn = (df.loc[df["kind"] == "n"]
              .groupby("lang_a", sort=False)["n"].sum())
        if not len(e):
            return pd.DataFrame({c: np.array([], np.int64) if c != "lang"
                                 else np.array([], object) for c in cols})
        ecell = (e.groupby(["lang_a", "lang_b"], sort=False)["n"].sum()
                 .reset_index())
        m = int(ecell["n"].sum())
        langs = sorted(nn.index)
        la = ecell["lang_a"].to_numpy()
        lb = ecell["lang_b"].to_numpy()
        n = ecell["n"].to_numpy(dtype=np.int64)
        out = []
        for c in langs:
            e_in = int(n[(la == c) & (lb == c)].sum())
            d_sum = int(n[la == c].sum() + n[lb == c].sum())
            out.append((c, int(nn[c]), d_sum, e_in,
                        4 * m * e_in - d_sum * d_sum))
        r = pd.DataFrame(out, columns=cols)
        for c in cols[1:]:
            r[c] = r[c].astype(np.int64)
        return r

    return hash_exchange(
        epart.union(npart),
        key_fn=lambda tbl: np.zeros(tbl.num_rows, dtype=np.int64),
        n_parts=1, kernel=final, fmt="pandas")


def cluster_depth(sf_dir: str, threshold: float = 0.5):
    """Per-duplicate-cluster DEPTH profile from the free BFS hops
    (:func:`bfs_hops`): n_docs, the root's eccentricity (max hop) and the
    total root distance (hop_sum — the Wiener-index-to-root that says
    whether a cluster is a tight clique, ecc 1, or a drift chain).  One
    cluster-keyed exchange over the (doc, cluster, hop) rows."""
    hops = bfs_hops(sf_dir, threshold=threshold)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["cluster_id", "n_docs", "ecc", "hop_sum"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        g = (df.groupby("cluster_id", sort=False)
             .agg(n_docs=("hop", "size"), ecc=("hop", "max"),
                  hop_sum=("hop", "sum")).reset_index())
        for c in cols:
            g[c] = g[c].astype(np.int64)
        return g[cols]

    return hash_exchange(hops, key_fn=_pair_hash_key(["cluster_id"], 8),
                         n_parts=8, kernel=kernel, fmt="pandas")


def rrf_fusion(sf_dir: str, k_rrf: int = 60, top: int = 20):
    """Reciprocal-rank fusion of two document rankings — the retrieval
    combiner (Cormack 2009) in exact FIXED-POINT integers: docs ranked by
    total token count and by distinct token count (both exact-int axes
    from the shared tokenizer), fused as ``rrf_num = Σ 10⁹ // (60 + r)``
    (floor division with positive operands, so numpy and DuckDB agree —
    never a float reciprocal).  Global ranks use the distributed
    sort + offset-fold route (:func:`_global_rank`); the two rank streams
    re-align in one doc-keyed co-partition; the global top-20 folds
    partition-level heads through one tiny merge."""
    stats = ttr_hapax(sf_dir).materialize()

    r1 = _global_rank(stats, "n_tokens", "r_len")
    r2 = _global_rank(stats, "n_distinct", "r_uniq")

    def fuse(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        cols = ["doc_id", "r_len", "r_uniq", "rrf_num"]
        if len(a) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        m = a.merge(b, on="doc_id")
        rl = m["r_len"].to_numpy(dtype=np.int64)
        ru = m["r_uniq"].to_numpy(dtype=np.int64)
        rrf = (np.int64(10**9) // (k_rrf + rl)
               + np.int64(10**9) // (k_rrf + ru))
        out = pd.DataFrame({"doc_id": m["doc_id"].to_numpy(np.int64),
                            "r_len": rl, "r_uniq": ru, "rrf_num": rrf})
        # partition-level head: only candidates for the global top ride on
        return out.sort_values(["rrf_num", "doc_id"],
                               ascending=[False, True]).head(top)

    key = _pair_hash_key(["doc_id"])
    heads = hash_exchange_multi([(r1, key), (r2, key)],
                                n_parts=N_DOC_PARTS, kernel=fuse,
                                fmt="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(["rrf_num", "doc_id"],
                             ascending=[False, True]).head(top)
        for c in ("doc_id", "r_len", "r_uniq", "rrf_num"):
            out[c] = out[c].astype(np.int64)
        return out.reset_index(drop=True)

    return hash_exchange(
        heads, key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1, kernel=final, fmt="pandas")


def lm_coverage(sf_dir: str, train_pct: int = 90):
    """Bigram language-model COVERAGE of the validation split against the
    train split (the deterministic md5 split of :func:`hash_split`): per
    val doc, token count, OOV token count (token string unseen in train),
    bigram count and unseen-bigram count — the integer numerators of the
    add-k-smoothed-LM score a data-quality pipeline ranks by.  N-gram
    identity is the md5-prefix digest of the SQL oracle's own strings
    (token, and ``t1 + chr(1) + t2``), md5-ing only each batch's UNIQUE
    grams (vocab-bounded Python, the tokenizer discipline).  Membership
    is scale-right: the TRAIN n-gram set is never collected — train
    distinct rows and val occurrence rows co-partition on one gram-hash
    exchange (sorted-array membership per partition), and per-doc counts
    fold back through a doc-keyed exchange."""
    import hashlib

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).materialize()

    def _md5_u64_le(strings):
        return np.fromiter(
            (int.from_bytes(hashlib.md5(s.encode()).digest()[:8],
                            "little") for s in strings),
            dtype=np.uint64, count=len(strings))

    def _gram_rows(df: pd.DataFrame, side: str) -> pd.DataFrame:
        cols = ["doc_id", "kind", "h"]
        empty = pd.DataFrame({
            "doc_id": np.array([], np.int64),
            "kind": np.array([], dtype=object),
            "h": np.array([], np.uint64)})
        bucket = _md5_bucket(df["doc_id"].to_numpy())
        sel = bucket < train_pct if side == "train" else bucket >= train_pct
        sub = df.loc[sel]
        if not len(sub):
            return empty
        uniq, codes, lens = dd.unique_tokens(sub["text"])
        if not len(codes):
            return empty
        uniq = np.asarray(uniq, dtype=object)
        uh = _md5_u64_le(uniq)
        ids = np.repeat(sub["doc_id"].to_numpy(np.int64), lens)
        u_h = uh[codes]
        doc_of = np.repeat(np.arange(len(sub), dtype=np.int64), lens)
        adj = doc_of[1:] == doc_of[:-1]
        frames = [pd.DataFrame({"doc_id": ids, "kind": "u", "h": u_h})]
        if adj.any():
            c1 = codes[:-1][adj].astype(np.int64)
            c2 = codes[1:][adj].astype(np.int64)
            pk = c1 * np.int64(len(uniq)) + c2
            up, inv = np.unique(pk, return_inverse=True)
            bh = _md5_u64_le(
                [uniq[int(a)] + "\x01" + uniq[int(b)]
                 for a, b in zip(up // len(uniq), up % len(uniq))])
            frames.append(pd.DataFrame({
                "doc_id": ids[:-1][adj], "kind": "b", "h": bh[inv]}))
        out = pd.concat(frames, ignore_index=True)
        if side == "train":   # distinct per batch: only identity ships
            out = out.drop_duplicates(["kind", "h"])[["kind", "h"]].copy()
            out["doc_id"] = np.int64(-1)
            out = out[cols]
        return out[cols]

    val = ds.map_batches(lambda df: _gram_rows(df, "val"),
                         batch_format="pandas")
    train = ds.map_batches(lambda df: _gram_rows(df, "train"),
                           batch_format="pandas")

    def h_key(tbl):
        h = tbl.column("h").to_numpy(zero_copy_only=False).astype(np.uint64)
        return (h % np.uint64(N_DOC_PARTS)).astype(np.int64)

    def member(vt: pd.DataFrame, tt: pd.DataFrame) -> pd.DataFrame:
        cols = ["doc_id", "kind", "n_occ", "n_miss"]
        if len(vt) == 0:
            return pd.DataFrame({
                "doc_id": np.array([], np.int64),
                "kind": np.array([], dtype=object),
                "n_occ": np.array([], np.int64),
                "n_miss": np.array([], np.int64)})
        out = []
        for kind in ("u", "b"):
            v = vt.loc[vt["kind"] == kind]
            if not len(v):
                continue
            tset = np.unique(tt.loc[tt["kind"] == kind, "h"]
                             .to_numpy().astype(np.uint64))
            vh = v["h"].to_numpy().astype(np.uint64)
            pos = np.searchsorted(tset, vh)
            hit = ((pos < len(tset))
                   & (tset[np.minimum(pos, max(len(tset) - 1, 0))] == vh)
                   if len(tset) else np.zeros(len(vh), dtype=bool))
            g = (pd.DataFrame({"doc_id": v["doc_id"].to_numpy(np.int64),
                               "miss": (~hit).astype(np.int64)})
                 .groupby("doc_id", sort=False)
                 .agg(n_occ=("miss", "size"), n_miss=("miss", "sum"))
                 .reset_index())
            g["kind"] = kind
            out.append(g)
        r = pd.concat(out, ignore_index=True)
        for c in ("doc_id", "n_occ", "n_miss"):
            r[c] = r[c].astype(np.int64)
        return r[cols]

    partials = hash_exchange_multi([(val, h_key), (train, h_key)],
                                   n_parts=N_DOC_PARTS, kernel=member,
                                   fmt="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["doc_id", "n_tokens", "n_oov", "n_bigrams", "n_unseen"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        g = (df.groupby(["doc_id", "kind"], sort=False)
             .agg(n_occ=("n_occ", "sum"), n_miss=("n_miss", "sum"))
             .reset_index())
        u = g.loc[g["kind"] == "u"].set_index("doc_id")
        b = g.loc[g["kind"] == "b"].set_index("doc_id")
        idx = u.index
        out = pd.DataFrame({
            "doc_id": idx.to_numpy(np.int64),
            "n_tokens": u["n_occ"].to_numpy(np.int64),
            "n_oov": u["n_miss"].to_numpy(np.int64),
            "n_bigrams": b["n_occ"].reindex(idx).fillna(0)
            .to_numpy(np.int64),
            "n_unseen": b["n_miss"].reindex(idx).fillna(0)
            .to_numpy(np.int64)})
        return out[cols]

    return hash_exchange(partials, key_fn=_pair_hash_key(["doc_id"]),
                         n_parts=N_DOC_PARTS, kernel=fold, fmt="pandas")


def label_margins(sf_dir: str, n_anchors: int = 50):
    """Metric-learning AUDIT over the labeled embedding table: for each
    anchor (vec_id < ``n_anchors``), the best cosine to any OTHER vector
    of the SAME label and the best cosine to any vector of a DIFFERENT
    label — the per-anchor margin a contrastive-training pipeline
    monitors (separable anchors have best_same > best_other).  Anchors
    (a bounded broadcast by construction) ride into a stateless matmul
    stage; per-batch maxima are mergeable partials, so nothing but
    (anchor, kind, best) scalars ever leaves a task.  Cosines round to 6
    at the gate (the emb_near_dups discipline)."""
    q = _read_emb_head(sf_dir, ["vec_id", "embedding", "label"],
                       n_anchors)
    A = np.stack([np.asarray(v, np.float64) for v in q["embedding"]])
    A = A / np.linalg.norm(A, axis=1, keepdims=True)
    a_ids = q["vec_id"].to_numpy(np.int64)
    a_labels = q["label"].to_numpy()

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["query_id", "label", "best_same", "best_other"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        M = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
        M = M / np.linalg.norm(M, axis=1, keepdims=True)
        cos = A @ M.T                      # (n_anchors, batch)
        ids = df["vec_id"].to_numpy(np.int64)
        same = a_labels[:, None] == df["label"].to_numpy()[None, :]
        self_pair = a_ids[:, None] == ids[None, :]
        neg = np.float64(-2.0)
        best_same = np.where(same & ~self_pair, cos, neg).max(axis=1)
        best_other = np.where(~same, cos, neg).max(axis=1)
        return pd.DataFrame({
            "query_id": a_ids, "label": a_labels.astype(np.int64),
            "best_same": best_same, "best_other": best_other})

    parts = ds.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        from ..util import round_half_away

        g = (df.groupby(["query_id", "label"], sort=False)
             .agg(best_same=("best_same", "max"),
                  best_other=("best_other", "max")).reset_index())
        keep = (g["best_same"] > -2.0) & (g["best_other"] > -2.0)
        g = g.loc[keep].reset_index(drop=True)
        g["query_id"] = g["query_id"].astype(np.int64)
        g["label"] = g["label"].astype(np.int64)
        g["best_same"] = round_half_away(g["best_same"].to_numpy(), 6)
        g["best_other"] = round_half_away(g["best_other"].to_numpy(), 6)
        return g[["query_id", "label", "best_same", "best_other"]]

    return hash_exchange(
        parts, key_fn=_pair_hash_key(["query_id"], 8), n_parts=8,
        kernel=merge, fmt="pandas")


def term_proximity(sf_dir: str, term_a: str = "spark",
                   term_b: str = "table"):
    """Phrase-proximity audit: for every doc containing BOTH query terms,
    the minimum token-position distance between an occurrence of each —
    the proximity signal a retrieval ranker boosts by — plus both term
    frequencies.  The minimizing pair is always adjacent in the merged
    position order, so the kernel is one mask + one adjacent-difference
    over the doc-major token stream (map-only, no shuffle; exact ints)."""
    tune_context()

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["doc_id", "min_gap", "n_a", "n_b"]
        empty = pd.DataFrame({c: np.array([], np.int64) for c in cols})
        n_docs = len(df)
        if n_docs == 0:
            return empty
        uniq, codes, lens = dd.unique_tokens(df["text"])
        if not len(codes):
            return empty
        lut = {t: i for i, t in enumerate(uniq)}
        ca, cb = lut.get(term_a, -1), lut.get(term_b, -2)
        doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        isa = codes == ca
        isb = codes == cb
        n_a = np.bincount(doc_of[isa], minlength=n_docs)
        n_b = np.bincount(doc_of[isb], minlength=n_docs)
        both = (n_a > 0) & (n_b > 0)
        if not both.any():
            return empty
        sel = isa | isb
        d = doc_of[sel]
        pos = np.arange(len(codes), dtype=np.int64)[sel]
        kind = isa[sel]
        adj = (d[1:] == d[:-1]) & (kind[1:] != kind[:-1])
        gd = d[1:][adj]
        gaps = (pos[1:] - pos[:-1])[adj]
        out = (pd.DataFrame({"doc": gd, "gap": gaps})
               .groupby("doc", sort=False)["gap"].min())
        rows = np.sort(out.index.to_numpy())
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64)[rows],
            "min_gap": out.reindex(rows).to_numpy(np.int64),
            "n_a": n_a[rows].astype(np.int64),
            "n_b": n_b[rows].astype(np.int64)})[cols]

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        kernel, batch_format="pandas")


def centroid_shift(sf_dir: str):
    """Embedding DRIFT audit per label: cosine between the centroid of
    the even-vec_id half and the odd-vec_id half — the
    distribution-shift monitor an embedding pipeline alarms on (a
    healthy static corpus shows shift_cosine ≈ 1).  Partial (label,
    half, dim) sums fold through one label-keyed exchange as FLAT rows
    (the emb_centroids discipline — nothing list-typed rides the
    exchange); the belt-only round(6) absorbs partial-sum order, as the
    oracle-green emb_centroids established."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["label", "half", "dim", "s", "n"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        M = np.stack([np.asarray(v, np.float64) for v in df["embedding"]])
        lab = df["label"].to_numpy(np.int64)
        half = (df["vec_id"].to_numpy(np.int64) % 2).astype(np.int64)
        key = lab * 2 + half
        uk, inv = np.unique(key, return_inverse=True)
        sums = np.zeros((len(uk), M.shape[1]), np.float64)
        np.add.at(sums, inv, M)
        cnt = np.bincount(inv).astype(np.int64)
        n_dim = M.shape[1]
        return pd.DataFrame({
            "label": np.repeat(uk // 2, n_dim),
            "half": np.repeat(uk % 2, n_dim),
            "dim": np.tile(np.arange(n_dim, dtype=np.int64), len(uk)),
            "s": sums.ravel(),
            "n": np.repeat(cnt, n_dim)})

    parts = ds.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        from ..util import round_half_away

        cols = ["label", "n_even", "n_odd", "shift_cosine"]
        if len(df) == 0:
            return pd.DataFrame({c: [] for c in cols})
        g = (df.groupby(["label", "half", "dim"], sort=True)
             .agg(s=("s", "sum"), n=("n", "sum")).reset_index())
        out = []
        for lab, sub in g.groupby("label", sort=True):
            e = sub.loc[sub["half"] == 0].sort_values("dim")
            o = sub.loc[sub["half"] == 1].sort_values("dim")
            if not len(e) or not len(o):
                continue
            ce = e["s"].to_numpy() / e["n"].to_numpy()
            co = o["s"].to_numpy() / o["n"].to_numpy()
            cosv = float(ce @ co / np.sqrt((ce @ ce) * (co @ co)))
            out.append((int(lab), int(e["n"].iloc[0]),
                        int(o["n"].iloc[0]),
                        float(round_half_away(np.array([cosv]), 6)[0])))
        r = pd.DataFrame(out, columns=cols)
        r["label"] = r["label"].astype(np.int64)
        r["n_even"] = r["n_even"].astype(np.int64)
        r["n_odd"] = r["n_odd"].astype(np.int64)
        return r

    return hash_exchange(parts, key_fn=_pair_hash_key(["label"], 8),
                         n_parts=8, kernel=merge, fmt="pandas")


def df_hist(sf_dir: str):
    """Shingle DOCUMENT-FREQUENCY histogram: for each df (number of docs
    containing a given word-3-shingle), how many distinct shingles have
    exactly that df — the corpus-redundancy fingerprint (a fat df tail
    = boilerplate; df=1 mass = unique content).  Shingle identity is
    the md5-prefix digest of the SQL oracle's own shingle string
    (doc_shingle_md5_sets); per-doc distinct (doc, shingle) rows fold
    df counts on a shingle-hash exchange, the histogram on a tiny df
    exchange — both mergeable sums."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def sh_rows(df: pd.DataFrame) -> pd.DataFrame:
        _, sh = dd.doc_shingle_md5_sets(df["text"])
        return pd.DataFrame({"sh": sh})

    rows = ds.map_batches(sh_rows, batch_format="pandas")

    def sh_key(tbl):
        h = tbl.column("sh").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        return (h % np.uint64(N_DOC_PARTS)).astype(np.int64)

    def df_kernel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({"df": np.array([], np.int64),
                                 "n_shingles": np.array([], np.int64)})
        _, counts = np.unique(df["sh"].to_numpy().astype(np.uint64),
                              return_counts=True)
        dfv, nsh = np.unique(counts, return_counts=True)
        return pd.DataFrame({"df": dfv.astype(np.int64),
                             "n_shingles": nsh.astype(np.int64)})

    partials = hash_exchange(rows, key_fn=sh_key, n_parts=N_DOC_PARTS,
                             kernel=df_kernel, fmt="pandas")

    def hist_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("df", sort=False)["n_shingles"].sum()
               .reset_index())
        out["df"] = out["df"].astype(np.int64)
        out["n_shingles"] = out["n_shingles"].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=_pair_hash_key(["df"], 8),
                         n_parts=8, kernel=hist_merge, fmt="pandas")


def lang_vocab_overlap(sf_dir: str):
    """Cross-lingual VOCABULARY overlap: for every language pair, how
    many distinct token types the two sub-corpora share (plus each
    side's vocabulary size) — the corpus-comparison table a mixing
    planner reads before reweighting.  Token identity is the md5-prefix
    digest (SQL-string-identical); per-(token, lang) distinct rows fold
    on one token-hash exchange whose kernel emits bounded (lang_a,
    lang_b) cells — the pair space is |langs|², never the vocab."""
    ds = _read(sf_dir, "documents", ["text", "lang"])

    def tok_rows(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"h": np.array([], np.uint64),
                                 "lang": np.array([], dtype=object)})
        h, lens = dd._md5_token_hash_flat(df["text"])
        lang = np.repeat(df["lang"].to_numpy(), lens)
        out = pd.DataFrame({"h": h, "lang": lang}).drop_duplicates()
        return out

    rows = ds.map_batches(tok_rows, batch_format="pandas")

    def h_key(tbl):
        h = tbl.column("h").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        return (h % np.uint64(N_DOC_PARTS)).astype(np.int64)

    def cells(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["lang_a", "lang_b", "n"]
        if not len(df):
            return pd.DataFrame({
                "lang_a": np.array([], dtype=object),
                "lang_b": np.array([], dtype=object),
                "n": np.array([], np.int64)})
        d = df.drop_duplicates(["h", "lang"])
        # vocab sizes: (lang, lang) diagonal cells
        diag = (d.groupby("lang", sort=False).size().rename("n")
                .reset_index())
        diag = pd.DataFrame({"lang_a": diag["lang"],
                             "lang_b": diag["lang"],
                             "n": diag["n"].astype(np.int64)})
        m = d.merge(d, on="h")
        m = m.loc[m["lang_x"] < m["lang_y"]]
        pair = (m.groupby(["lang_x", "lang_y"], sort=False)
                .size().rename("n").reset_index()
                .rename(columns={"lang_x": "lang_a", "lang_y": "lang_b"}))
        pair["n"] = pair["n"].astype(np.int64)
        return pd.concat([diag, pair], ignore_index=True)[cols]

    partials = hash_exchange(rows, key_fn=h_key, n_parts=N_DOC_PARTS,
                             kernel=cells, fmt="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["lang_a", "lang_b"], sort=False)["n"].sum()
               .reset_index())
        out["n"] = out["n"].astype(np.int64)
        return out

    return hash_exchange(partials, key_fn=_pair_hash_key(["lang_a"], 4),
                         n_parts=4, kernel=merge, fmt="pandas")


def length_diversity_corr(sf_dir: str):
    """Pearson correlation NUMERATORS between document length (tokens)
    and lexical diversity (distinct tokens) across the corpus: one row
    with n, n·Σxy−ΣxΣy and the two variance numerators — r² =
    sxy²/(sxx·syy) at presentation time, exact ints in the gate.  The
    five scalar sums are classic mergeable partials; one single-cell
    exchange folds them."""
    stats = ttr_hapax(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["n_tokens"].to_numpy(np.int64)
        y = df["n_distinct"].to_numpy(np.int64)
        return pd.DataFrame({
            "n": [np.int64(len(df))], "sx": [x.sum()], "sy": [y.sum()],
            "sxy": [(x * y).sum()], "sxx": [(x * x).sum()],
            "syy": [(y * y).sum()]})

    parts = stats.map_batches(partial, batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        n = np.int64(df["n"].sum())
        sx, sy = np.int64(df["sx"].sum()), np.int64(df["sy"].sum())
        sxy = np.int64(df["sxy"].sum())
        sxx, syy = np.int64(df["sxx"].sum()), np.int64(df["syy"].sum())
        return pd.DataFrame({
            "n": [n], "sxy_num": [n * sxy - sx * sy],
            "sxx_num": [n * sxx - sx * sx],
            "syy_num": [n * syy - sy * sy]}).astype(np.int64)

    return hash_exchange(
        parts, key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1, kernel=merge, fmt="pandas")


def fertility_by_lang(sf_dir: str):
    """Tokenizer FERTILITY table per language: total BPE-pretokenizer
    tokens, total word tokens and doc count — fertility (BPE per word,
    the classic multilingual-tokenizer equity metric) is the division at
    presentation time; the gate sees only exact ints.  Per-batch counts
    come from the shared byte-class/RE2 kernels (token_stats_arrow);
    per-lang partial sums fold on a tiny lang exchange."""
    import pyarrow.compute as pc

    from ..stages import text as tx

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(t) -> pd.DataFrame:
        stats = tx.token_stats_arrow(t)
        df = pd.DataFrame({
            "lang": t["lang"].to_pandas().astype(str),
            "w": stats["n_tokens"].to_numpy(zero_copy_only=False),
            "b": stats["n_bpe_tokens"].to_numpy(zero_copy_only=False)})
        g = (df.groupby("lang", sort=False)
             .agg(n_docs=("w", "size"), words=("w", "sum"),
                  bpe=("b", "sum")).reset_index())
        for c in ("n_docs", "words", "bpe"):
            g[c] = g[c].astype(np.int64)
        return g

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("lang", sort=False)
               .agg(n_docs=("n_docs", "sum"), words=("words", "sum"),
                    bpe=("bpe", "sum")).reset_index())
        for c in ("n_docs", "words", "bpe"):
            out[c] = out[c].astype(np.int64)
        return out

    return hash_exchange(parts, key_fn=_pair_hash_key(["lang"], 4),
                         n_parts=4, kernel=merge, fmt="pandas")


def source_dup_matrix(sf_dir: str, threshold: float = 0.5):
    """PROVENANCE of near-duplication: the (source, source) matrix of
    exact n-gram near-dup pairs — which feeds copy from which (diagonal
    = intra-source duplication).  Cells orient canonically
    (lexicographically sorted source pair) so the matrix is
    partition-invariant.  Same two attach exchanges as
    :func:`lang_modularity`; cells are |sources|²-bounded."""
    pairs = ngram_jaccard(sf_dir, threshold=threshold).materialize()
    dsrc = _read(sf_dir, "documents", ["doc_id", "source"])

    def key_on(col, n=N_DOC_PARTS):
        return _pair_hash_key([col], n)

    def att_a(pt: pd.DataFrame, dt: pd.DataFrame) -> pd.DataFrame:
        m = pt.merge(dt, left_on="id_a", right_on="doc_id", how="left")
        return pd.DataFrame({
            "id_a": m["id_a"].to_numpy(np.int64),
            "id_b": m["id_b"].to_numpy(np.int64),
            "src_a": m["source"].astype(str)})

    e1 = hash_exchange_multi(
        [(pairs, key_on("id_a")), (dsrc, key_on("doc_id"))],
        n_parts=N_DOC_PARTS, kernel=att_a, fmt="pandas")

    def att_b(pt: pd.DataFrame, dt: pd.DataFrame) -> pd.DataFrame:
        m = pt.merge(dt, left_on="id_b", right_on="doc_id", how="left")
        sa = m["src_a"].astype(str).to_numpy()
        sb = m["source"].astype(str).to_numpy()
        lo = np.minimum(sa, sb)
        hi = np.maximum(sa, sb)
        g = (pd.DataFrame({"source_a": lo, "source_b": hi})
             .groupby(["source_a", "source_b"], sort=False)
             .size().rename("n_pairs").reset_index())
        g["n_pairs"] = g["n_pairs"].astype(np.int64)
        return g

    cells = hash_exchange_multi(
        [(e1, key_on("id_b")), (dsrc, key_on("doc_id"))],
        n_parts=N_DOC_PARTS, kernel=att_b, fmt="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby(["source_a", "source_b"], sort=False)
               ["n_pairs"].sum().reset_index())
        out["n_pairs"] = out["n_pairs"].astype(np.int64)
        return out

    return hash_exchange(cells, key_fn=_pair_hash_key(["source_a"], 4),
                         n_parts=4, kernel=merge, fmt="pandas")


def clustering_agreement(sf_dir: str):
    """Pair-counting AGREEMENT between the exact n-gram dup clustering
    and the simhash clustering — the Rand-index numerators (n_docs,
    same-pair counts in each, and in both) a dedup-pipeline owner uses
    to decide whether the cheap sketch can replace the exact join.
    Docs in only one pair graph count as singletons in the other; docs
    in neither are out of the universe on both sides.  NO pair set is
    ever materialized: everything reduces from the (label_a, label_b)
    CONTINGENCY cells — ΣC(c,2) over cells (both-same), over label_a
    row sums (A-same) and label_b column sums (B-same) — three
    mergeable folds."""
    def tag(side):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            out = df.copy()
            out["side"] = side
            return out
        return f

    # single tagged union (NOT the multi-input exchange: its contract
    # drops partitions where the DRIVING input is empty, which would
    # silently lose docs present in only the other clustering)
    both = (dup_clusters(sf_dir).map_batches(tag("a"),
                                             batch_format="pandas")
            .union(simhash_clusters(sf_dir).map_batches(
                tag("b"), batch_format="pandas")))

    def cells_partial(df: pd.DataFrame) -> pd.DataFrame:
        a = df.loc[df["side"] == "a", ["doc_id", "cluster_id"]]
        b = df.loc[df["side"] == "b", ["doc_id", "cluster_id"]]
        m = a.merge(b, on="doc_id", how="outer", suffixes=("_a", "_b"))
        ids = m["doc_id"].to_numpy(np.int64)
        laa = m["cluster_id_a"].fillna(pd.Series(ids, index=m.index))
        lbb = m["cluster_id_b"].fillna(pd.Series(ids, index=m.index))
        g = (pd.DataFrame({"la": laa.astype(np.int64),
                           "lb": lbb.astype(np.int64)})
             .groupby(["la", "lb"], sort=False)
             .size().rename("c").reset_index())
        g["c"] = g["c"].astype(np.int64)
        return g

    cells = hash_exchange(both, key_fn=_pair_hash_key(["doc_id"]),
                          n_parts=N_DOC_PARTS, kernel=cells_partial,
                          fmt="pandas")

    def la_fold(df: pd.DataFrame) -> pd.DataFrame:
        # partition holds ALL cells of its la values (la-keyed)
        g = (df.groupby(["la", "lb"], sort=False)["c"].sum()
             .reset_index())
        c = g["c"].to_numpy(np.int64)
        s11 = int((c * (c - 1) // 2).sum())
        n = int(c.sum())
        row = g.groupby("la", sort=False)["c"].sum().to_numpy(np.int64)
        sa = int((row * (row - 1) // 2).sum())
        colp = g.groupby("lb", sort=False)["c"].sum().reset_index()
        out = pd.DataFrame({
            "kind": "col", "key": colp["lb"].astype(np.int64),
            "v": colp["c"].astype(np.int64)})
        scal = pd.DataFrame({
            "kind": ["s11", "n", "sa"],
            "key": np.zeros(3, np.int64),
            "v": np.array([s11, n, sa], np.int64)})
        return pd.concat([scal, out], ignore_index=True)

    folded = hash_exchange(cells, key_fn=_pair_hash_key(["la"]),
                           n_parts=N_DOC_PARTS, kernel=la_fold,
                           fmt="pandas")

    def col_fold(df: pd.DataFrame) -> pd.DataFrame:
        col = df.loc[df["kind"] == "col"]
        g = col.groupby("key", sort=False)["v"].sum().to_numpy(np.int64)
        sb = int((g * (g - 1) // 2).sum())
        keep = df.loc[df["kind"] != "col", ["kind", "v"]]
        return pd.concat(
            [keep, pd.DataFrame({"kind": ["sb"], "v": [np.int64(sb)]})],
            ignore_index=True)

    # column sums need lb co-location: one more tiny exchange over the
    # (kind, key, v) rows — 'col' rows key by lb, scalars pass through
    def mixed_key(tbl):
        k = tbl.column("key").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        return (k % np.uint64(8)).astype(np.int64)

    folded2 = hash_exchange(folded, key_fn=mixed_key, n_parts=8,
                            kernel=col_fold, fmt="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        v = df.groupby("kind", sort=False)["v"].sum()
        return pd.DataFrame({
            "n_docs": [np.int64(v.get("n", 0))],
            "same_both": [np.int64(v.get("s11", 0))],
            "same_a": [np.int64(v.get("sa", 0))],
            "same_b": [np.int64(v.get("sb", 0))]})

    return hash_exchange(
        folded2, key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1, kernel=final, fmt="pandas")


def chunk_dedup(sf_dir: str, chunk_tokens: int = 64):
    """CHUNK-level exact dedup — the granularity a pretraining pipeline
    actually dedups at (whole-doc dedup misses shared passages): every
    64-token chunk digest occurring more than once, with its copy count,
    distinct-doc count and keeper (min doc_id).  Composes
    :func:`chunk_documents` (map-only, digest per chunk) with one
    digest-keyed exchange — the exact_dedup shape one level down."""
    ch = chunk_documents(sf_dir, chunk_tokens=chunk_tokens)

    def rows(df: pd.DataFrame) -> pd.DataFrame:
        return df[["digest", "doc_id"]]

    def dkey(tbl):
        h = tbl.column("digest").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        return (h % np.uint64(N_DOC_PARTS)).astype(np.int64)

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["digest", "n_copies", "n_docs", "keeper_doc"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64)
                                 if c != "digest"
                                 else np.array([], np.uint64)
                                 for c in cols})
        g = (df.groupby("digest", sort=False)
             .agg(n_copies=("doc_id", "size"),
                  n_docs=("doc_id", "nunique"),
                  keeper_doc=("doc_id", "min")).reset_index())
        g = g.loc[g["n_copies"] > 1].reset_index(drop=True)
        for c in ("n_copies", "n_docs", "keeper_doc"):
            g[c] = g[c].astype(np.int64)
        return g[cols]

    return hash_exchange(ch.map_batches(rows, batch_format="pandas"),
                         key_fn=dkey, n_parts=N_DOC_PARTS, kernel=kernel,
                         fmt="pandas")


def knn_graph_mutual(sf_dir: str, n_anchors: int = 200,
                     k_nbrs: int = 9):
    """kNN-GRAPH construction audit over the anchor set (vec_id <
    ``n_anchors``): each anchor's top-9 non-self cosine neighbors form
    the directed kNN graph (the structure SemDeDup-style clustering and
    graph-ANN indexes build on); per anchor, how many of its neighbors
    are themselves anchors (n_in_set) and how many of those RECIPROCATE
    (n_mutual — mutual-kNN edges are the reliable ones).  The top-k
    reuses the broadcast-anchor brute-force scorer; dropping self from
    a (k+1) head equals top-k-non-self because self can only displace
    one slot.  Edge volume is anchors × k — the mutual join runs in one
    tiny partition."""
    kn = knn(sf_dir, k=k_nbrs + 1, n_queries=n_anchors)

    def edges(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["a", "b"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        df = df.loc[df["query_id"] != df["vec_id"]]
        df = (df.sort_values(["query_id", "score", "vec_id"],
                             ascending=[True, False, True], kind="stable")
              .groupby("query_id", sort=False).head(k_nbrs))
        return pd.DataFrame({
            "a": df["query_id"].to_numpy(np.int64),
            "b": df["vec_id"].to_numpy(np.int64)})

    e = kn.map_batches(edges, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["vec_id", "n_in_set", "n_mutual"]
        anchors = np.arange(n_anchors, dtype=np.int64)
        if len(df) == 0:
            return pd.DataFrame({
                "vec_id": anchors,
                "n_in_set": np.zeros(n_anchors, np.int64),
                "n_mutual": np.zeros(n_anchors, np.int64)})
        ein = df.loc[df["b"].to_numpy(np.int64) < n_anchors]
        n_in = (ein.groupby("a", sort=False).size()
                .reindex(anchors).fillna(0).to_numpy(np.int64))
        rev = ein.rename(columns={"a": "b", "b": "a"})
        mut = ein.merge(rev, on=["a", "b"])
        n_mut = (mut.groupby("a", sort=False).size()
                 .reindex(anchors).fillna(0).to_numpy(np.int64))
        return pd.DataFrame({"vec_id": anchors, "n_in_set": n_in,
                             "n_mutual": n_mut})[cols]

    return hash_exchange(
        e, key_fn=lambda t: np.zeros(t.num_rows, dtype=np.int64),
        n_parts=1, kernel=final, fmt="pandas")


def winnow_pairs(sf_dir: str, w: int = 4, min_shared: int = 2):
    """MOSS pair detection: doc pairs sharing ≥ ``min_shared`` distinct
    winnowed fingerprints (:func:`winnowing` — any common w+2-token run
    guarantees a shared fingerprint, so this is the sampled
    substring-plagiarism join).  One fingerprint-hash exchange expands
    each hash's doc list into pairs (volume Σ df(h)² — inherent to the
    semantics, the reach_2hop wedge shape; dup factories concentrate
    df); one pair-keyed exchange sums shared counts and applies the
    threshold."""
    fp = winnowing(sf_dir, w=w)

    def dh(df: pd.DataFrame) -> pd.DataFrame:
        return df[["doc_id", "h"]].drop_duplicates()

    rows = fp.map_batches(dh, batch_format="pandas")

    def h_key(tbl):
        h = tbl.column("h").to_numpy(zero_copy_only=False).astype(
            np.uint64)
        return (h % np.uint64(N_DOC_PARTS)).astype(np.int64)

    def pairs_kernel(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["id_a", "id_b", "n"]
        if len(df) == 0:
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        d = df.drop_duplicates(["doc_id", "h"]).sort_values(
            ["h", "doc_id"], kind="stable")
        hh = d["h"].to_numpy(np.uint64)
        ids = d["doc_id"].to_numpy(np.int64)
        new = np.concatenate(([True], hh[1:] != hh[:-1]))
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(hh)))
        # full per-run cross product, then keep the upper triangle — the
        # reach_2hop index construction (ids sorted within a run, so
        # left < right index implies id_a < id_b)
        tot = counts * counts
        if not tot.sum():
            return pd.DataFrame({c: np.array([], np.int64) for c in cols})
        base = np.repeat(starts, tot)
        k = np.arange(int(tot.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(tot) - tot, tot)
        cc = np.repeat(counts, tot)
        left, right = base + k // cc, base + k % cc
        m = left < right
        a, b = ids[left[m]], ids[right[m]]
        g = (pd.DataFrame({"id_a": a, "id_b": b})
             .groupby(["id_a", "id_b"], sort=False)
             .size().rename("n").reset_index())
        g["n"] = g["n"].astype(np.int64)
        return g[cols]

    partials = hash_exchange(rows, key_fn=h_key, n_parts=N_DOC_PARTS,
                             kernel=pairs_kernel, fmt="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        cols = ["id_a", "id_b", "n_shared"]
        out = (df.groupby(["id_a", "id_b"], sort=False)["n"].sum()
               .rename("n_shared").reset_index())
        out = out.loc[out["n_shared"] >= min_shared].reset_index(drop=True)
        for c in cols:
            out[c] = out[c].astype(np.int64)
        return out[cols]

    return hash_exchange(partials, key_fn=_pair_hash_key(["id_a"]),
                         n_parts=N_DOC_PARTS, kernel=merge, fmt="pandas")


def hapax_by_source(sf_dir: str):
    """Lexical-diversity totals BY SOURCE: per source the doc count and
    the sums of per-doc token / distinct / hapax counts (the
    :func:`ttr_hapax` integers one aggregation up) — which feeds carry
    rich vocabulary vs repetitive boilerplate.  Per-doc rows attach
    source via a doc-keyed co-partition; band cells fold in a tiny
    source exchange."""
    stats = ttr_hapax(sf_dir)
    src = _read(sf_dir, "documents", ["doc_id", "source"])

    def attach(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        m = a.merge(b, on="doc_id", how="left")
        g = (m.groupby("source", sort=False)
             .agg(n_docs=("n_tokens", "size"),
                  tokens=("n_tokens", "sum"),
                  distincts=("n_distinct", "sum"),
                  hapax=("n_hapax", "sum")).reset_index())
        for c in ("n_docs", "tokens", "distincts", "hapax"):
            g[c] = g[c].astype(np.int64)
        return g

    key = _pair_hash_key(["doc_id"])
    cells = hash_exchange_multi([(stats, key), (src, key)],
                                n_parts=N_DOC_PARTS, kernel=attach,
                                fmt="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        out = (df.groupby("source", sort=False)
               .agg(n_docs=("n_docs", "sum"), tokens=("tokens", "sum"),
                    distincts=("distincts", "sum"),
                    hapax=("hapax", "sum")).reset_index())
        for c in ("n_docs", "tokens", "distincts", "hapax"):
            out[c] = out[c].astype(np.int64)
        return out

    return hash_exchange(cells, key_fn=_pair_hash_key(["source"], 4),
                         n_parts=4, kernel=merge, fmt="pandas")


def textrank(sf_dir: str, v: int = 20, rounds: int = 5,
             scale: int = PAGERANK_SCALE):
    """TextRank keyword scores: integer-exact PageRank over the top-``v``
    token CO-OCCURRENCE graph (distinct adjacent-token pairs inside the
    vocabulary, canonicalized by STRING order, self-pairs dropped) — the
    :func:`docs_dedup.pagerank` integer discipline (damping 17/20 over
    int64 numerators at ``scale``, floored divisions, order-free sums)
    applied at WORD granularity, so the SQL mirror is bit-equal.

    Scale shape: the heavy corpus part (adjacent-pair extraction) is
    distributed — per-batch distinct pairs on integer token codes,
    folded by a pair-keyed exchange; the graph itself is
    VOCABULARY-bounded (≤ v² edges), so the driver-side power iteration
    only ever sees a bounded table, never corpus data."""
    from ..util import arrow_key_ids

    tune_context()
    vocab = set(top_tokens(sf_dir, k=v).to_pandas()["tok"])
    ds = _read(sf_dir, "documents", ["text"])

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"a": np.array([], dtype=object),
                              "b": np.array([], dtype=object)})
        uniq, codes, lens = dd.unique_tokens(df["text"])
        if len(codes) < 2:
            return empty
        ends = np.cumsum(lens)
        ok = np.ones(len(codes) - 1, dtype=bool)
        ok[ends[ends < len(codes)] - 1] = False   # never span documents
        inv = np.fromiter((t in vocab for t in uniq), dtype=bool,
                          count=len(uniq))
        c1, c2 = codes[:-1][ok], codes[1:][ok]
        m = inv[c1] & inv[c2] & (c1 != c2)
        if not m.any():
            return empty
        t1, t2 = uniq[c1[m]], uniq[c2[m]]
        # canonical orientation by STRING order (factorize codes are
        # batch-local and would dedupe inconsistently across batches)
        a = np.where(t1 < t2, t1, t2)
        b = np.where(t1 < t2, t2, t1)
        return pd.DataFrame({"a": a, "b": b}).drop_duplicates()

    pairs = hash_exchange(
        ds.map_batches(pair_partial, batch_format="pandas"),
        key_fn=lambda t: arrow_key_ids(t, ["a", "b"], 8), n_parts=8,
        kernel=lambda d: d.drop_duplicates(["a", "b"]),
        fmt="pandas").to_pandas()
    cols = ["tok", "deg", "pr_num"]
    if not len(pairs):
        return pd.DataFrame({
            "tok": pd.Series([], dtype=object),
            "deg": pd.Series([], dtype=np.int64),
            "pr_num": pd.Series([], dtype=np.int64)})
    src = np.concatenate((pairs["a"].to_numpy(),
                          pairs["b"].to_numpy()))
    dst = np.concatenate((pairs["b"].to_numpy(),
                          pairs["a"].to_numpy()))
    nodes, src_idx = np.unique(src, return_inverse=True)
    n = len(nodes)
    deg = np.bincount(src_idx, minlength=n).astype(np.int64)
    dst_idx = np.searchsorted(nodes, dst)
    pr = np.full(n, scale // n, dtype=np.int64)
    base = (3 * scale) // (20 * n)
    for _ in range(rounds):
        contrib = (pr // deg)[src_idx]
        s = np.zeros(n, dtype=np.int64)
        np.add.at(s, dst_idx, contrib)
        pr = base + (17 * s) // 20
    return pd.DataFrame({"tok": nodes, "deg": deg,
                         "pr_num": pr.astype(np.int64)})[cols]


def clustering_coeff(sf_dir: str, threshold: float = 0.5):
    """GLOBAL clustering-coefficient numerators of the n-gram near-dup
    graph — the transitivity audit a dedup pipeline runs to separate
    tight duplicate cliques (coefficient → 1) from chainy
    false-positive paths (→ 0): one row of exact ints (n_nodes,
    n_edges, n_wedges = Σ d(d−1)/2, n_triangles); the coefficient is
    consumer-side 3·triangles / wedges (SPC integer discipline).

    Composition shape: triangles reuse the degree-ordered
    :func:`~.docs_dedup.triangle_counts` operator (wedge volume ≤
    m^1.5); wedges and degrees fold DISTRIBUTED — per-partition scalar
    partials, never a node table on the driver."""
    from .docs_dedup import triangle_counts

    tune_context()
    pairs = ngram_jaccard(sf_dir, threshold=threshold)

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        a = df["id_a"].to_numpy(dtype=np.int64)
        b = df["id_b"].to_numpy(dtype=np.int64)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pd.DataFrame({"a": lo, "b": hi}).drop_duplicates()

    edges = pairs.map_batches(orient, batch_format="pandas")

    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        nodes = np.concatenate([df["a"].to_numpy(np.int64),
                                df["b"].to_numpy(np.int64)])
        u, c = np.unique(nodes, return_counts=True)
        return pd.DataFrame({"node": u, "deg": c.astype(np.int64)})

    def deg_final(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({
                "n_nodes": pd.Series([], dtype=np.int64),
                "n_wedges": pd.Series([], dtype=np.int64)})
        d = (df.groupby("node", sort=False)["deg"].sum()
             .to_numpy(np.int64))
        return pd.DataFrame({
            "n_nodes": [np.int64(len(d))],
            "n_wedges": [np.int64((d * (d - 1) // 2).sum())]})

    folds = hash_exchange(
        edges.map_batches(deg_partial, batch_format="pandas"),
        key_fn=_pair_hash_key(["node"], 8), n_parts=8,
        kernel=deg_final, fmt="pandas").to_pandas()
    n_edges = int(edges.count())

    tri = triangle_counts(sf_dir, threshold=threshold)

    def tri_partial(df: pd.DataFrame) -> pd.DataFrame:
        col = [c for c in df.columns if c != "doc_id"][0]
        return pd.DataFrame({
            "t3": [np.int64(df[col].to_numpy(np.int64).sum())]})

    t3 = int(tri.map_batches(tri_partial, batch_format="pandas")
             .to_pandas()["t3"].sum())
    return pd.DataFrame({
        "n_nodes": [np.int64(folds["n_nodes"].sum())],
        "n_edges": [np.int64(n_edges)],
        "n_wedges": [np.int64(folds["n_wedges"].sum())],
        "n_triangles": [np.int64(t3 // 3)]})
