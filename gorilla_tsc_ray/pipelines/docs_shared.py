"""Shared infrastructure of the docs_* pipeline family (split from the
round-4 docs.py monolith; public surface unchanged via the docs facade):
format-autodetect reads, the pair-exchange toolkit (bucketed candidates,
PPJoin prefix filters, broadcast-vs-exchange verify selector, pair dedup),
the presplit graph-edge builder, and the exact n-gram Jaccard truth
(``ngram_jaccard`` / ``shingle_jaccard_pairs``) every dedup/graph
operator builds on."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from ..context import tune_context
from ..stages import dedup as dd
from ..stages.exchange import hash_exchange, hash_exchange_multi
from ..stages import similarity as sim
from ..stages import text as tx



def _read(sf_dir: str, table: str, columns=None):
    """Format-autodetecting table read (parquet > csv > jsonl — the
    events-table convention) with canonical types enforced on the
    non-parquet paths (JSONL infers int64/float64; embeddings re-cast to
    the parquet-canonical list<float32> so every downstream kernel sees
    one value space)."""
    import pyarrow as pa

    from ..sources.tables import read_table_auto

    tune_context()
    cast = {
        "documents": {"doc_id": pa.int64(), "n_chars": pa.int64()},
        "embeddings": {"vec_id": pa.int64(), "label": pa.int32(),
                       "embedding": pa.list_(pa.float32())},
    }.get(table)
    return read_table_auto(sf_dir, table, columns=columns, cast=cast)


def _read_emb_head(sf_dir: str, columns, vec_id_lt: int) -> pd.DataFrame:
    """Bounded embedding rows (``vec_id < n``) through the SAME
    format-autodetect path as the corpus reads: parquet gets the pushed
    row filter, CSV/JSONL fall back to a filtered Dataset collect
    (bounded by construction — anchor/query/train sets are capped).
    Direct ``pq.read_table`` here broke JSONL-only tables (round-4
    ADVICE)."""
    import os

    p = f"{sf_dir.rstrip('/')}/embeddings.parquet"
    if os.path.exists(p):
        return pq.read_table(
            p, columns=columns,
            filters=[("vec_id", "<", vec_id_lt)]).to_pandas()

    import pyarrow.compute as pc

    ds = _read(sf_dir, "embeddings", columns)

    def keep(tbl):
        return tbl.filter(pc.less(tbl["vec_id"], vec_id_lt))

    return ds.map_batches(keep, batch_format="pyarrow").to_pandas()


N_DOC_PARTS = 32


def _pool_size(sf_dir: str, table: str, per_actor_mb: float = 0.25,
               lo: int = 2) -> int:
    """FIXED actor-pool size for a CPU-heavy half-cpu stage, scaled to
    the INPUT VOLUME (≈ one actor per 0.25 MB of source parquet — text
    decompresses ~10×) and clamped to 2×CPUs.  Measured (round 5,
    BASELINE.md): AUTOSCALING (2, cap) pools pay their ramp on every
    invocation — sf0.1 minhash wall 2.6 s under (2, 8) and (2, 64)
    alike vs 1.8 s with a fixed 4 — and a pool larger than the data
    splits a sub-second stage across actor startups (fixed 32 = 1.4 s).
    A fixed volume-scaled pool is both the small-sf and the 100 TB
    answer: tiny inputs get a couple of warm actors, petabyte inputs
    clamp to every core."""
    import glob
    import os

    import ray

    mb = sum(os.path.getsize(p) for p in
             glob.glob(os.path.join(sf_dir, f"{table}.*"))) / 1e6
    try:
        cpus = int(ray.cluster_resources().get("CPU", 16))
    except Exception:
        cpus = 16
    return int(max(lo, min(2 * cpus, mb // per_actor_mb + lo)))


def _pair_hash_key(cols, n_parts: int = N_DOC_PARTS):
    from ..util import arrow_key_ids

    def key_fn(tbl):
        return arrow_key_ids(tbl, cols, n_parts)
    return key_fn


def _dedup_pairs(pairs_ds, out_cols):
    # (id_a, id_b) dedup: ONE hash exchange + vectorized drop_duplicates
    # per partition (a per-group UDF on pair-cardinality keys would cost
    # ms per pair).  drop_duplicates is self-merging → chunked reduce
    # (spill-aware: a skewed pair partition streams through in chunks).
    return hash_exchange(
        pairs_ds, key_fn=_pair_hash_key(["id_a", "id_b"]),
        n_parts=N_DOC_PARTS,
        kernel=lambda df: df.drop_duplicates(["id_a", "id_b"],
                                             ignore_index=True)[out_cols],
        fmt="pandas", chunk_rows=1 << 20)


def _bucketed_pairs(rows_ds, bucket_cols, per_bucket_kernel):
    # group candidate rows by bucket INSIDE hash partitions: one exchange,
    # then a pandas groupby loop per partition (buckets are small by
    # construction; the loop replaces one Ray group-task per bucket)
    def kernel(df):
        parts = [per_bucket_kernel(g)
                 for _, g in df.groupby(bucket_cols, sort=False,
                                        observed=True)]
        if not parts:
            return per_bucket_kernel(df)
        return pd.concat(parts, ignore_index=True)

    return hash_exchange(rows_ds, key_fn=_pair_hash_key(bucket_cols),
                         n_parts=N_DOC_PARTS, kernel=kernel, fmt="pandas")


# payload tables at or below this size verify via ONE broadcast exchange
# instead of the two co-partitioned payload exchanges (a ray.put'd payload
# is fetched zero-copy once per task; the a-side payload column otherwise
# rides the verify exchange once per PAIR, the dominant volume on
# near-dup-heavy data).  64 MB is comfortable worker-heap territory;
# corpus-scale payloads always exceed it and take the exchange route.
BROADCAST_PAYLOAD_BYTES = 64 << 20


def _verify_id_pairs(cands_ds, payload_ds, *, payload_id: str,
                     payload_col: str, attach_out: str, verify_kernel,
                     verify_kwargs: dict, n_parts: int = N_DOC_PARTS):
    """Slim pair-verify: candidate (id_a, id_b) rows → exact verification,
    broadcast-or-shuffle selected by payload size.

    Small payload (≤ ``BROADCAST_PAYLOAD_BYTES``): ONE exchange on
    hash(id_a, id_b) dedups the pairs and probes both sides' payloads from
    a broadcast table (:func:`...stages.dedup.pair_verify_bcast`).

    Large payload: two co-partitioned exchanges — exchange A (pairs by
    hash(id_a) × payload by hash(id)) dedups the pairs and attaches a's
    payload; exchange B (by id_b) attaches b's and runs the vectorized
    verify kernel.  Payload rows ride each exchange once per doc/vector,
    never once per candidate row."""
    import pyarrow as pa
    import ray

    size = payload_ds.size_bytes() or 0
    if 0 < size <= BROADCAST_PAYLOAD_BYTES:
        blocks = [t.replace_schema_metadata(None)
                  for t in ray.get(payload_ds.to_arrow_refs())]
        ref = ray.put(pa.concat_tables(
            [b.select([payload_id, payload_col]) for b in blocks]))
        return hash_exchange(
            cands_ds, key_fn=_pair_hash_key(["id_a", "id_b"]),
            n_parts=n_parts, kernel=dd.pair_verify_bcast, fmt="pyarrow",
            kernel_kwargs={
                "payload_ref": ref, "id_col": payload_id,
                "payload_col": payload_col, "attach_out": attach_out,
                "verify_kernel": verify_kernel,
                "verify_kwargs": {**verify_kwargs, "id_col": payload_id}})
    paired = hash_exchange_multi(
        [(cands_ds, _pair_hash_key(["id_a"])),
         (payload_ds, _pair_hash_key([payload_id]))],
        n_parts=n_parts, kernel=dd.attach_payload_a, fmt="pyarrow",
        kernel_kwargs={"id_col": payload_id, "payload_col": payload_col,
                       "out_col": attach_out})
    return hash_exchange_multi(
        [(paired, _pair_hash_key(["id_b"])),
         (payload_ds, _pair_hash_key([payload_id]))],
        n_parts=n_parts, kernel=verify_kernel, fmt="pyarrow",
        kernel_kwargs={**verify_kwargs, "id_col": payload_id})


def _common_rank(ds, *, text_col: str = "text", charset: bool = False,
                 top_k: int = 65536, sample_rows: int = 1_000_000) -> dict:
    """Estimate the most frequent elements (tokens or characters) and
    return element → rank.  The rank's sole job is to push frequent
    elements OUT of the prefix window — ANY consistent order keeps the
    join exact — so the estimate is BOUNDED by construction (round 3):
    at most ``sample_rows`` docs are read (deterministic limit), each
    batch contributes a vectorized factorize+bincount truncated to its
    local top-k, and only ≤ batches×top_k (element, count) rows reach the
    driver — never a full corpus vocabulary."""

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        codes, uniq, lens = dd._element_codes(df[text_col], charset)
        if len(codes) == 0:
            return pd.DataFrame({"e": np.array([], dtype=object),
                                 "n": np.array([], dtype=np.int64)})
        # distinct per doc (set semantics, matching the join's sets)
        _, c = dd._distinct_doc_pairs(codes, lens, len(uniq))
        n = np.bincount(c, minlength=len(uniq)).astype(np.int64)
        if len(uniq) > top_k:
            sel = np.argpartition(-n, top_k - 1)[:top_k]
            return pd.DataFrame({"e": uniq[sel], "n": n[sel]})
        return pd.DataFrame({"e": uniq, "n": n})

    agg = ds.limit(sample_rows).map_batches(
        counts, batch_format="pandas").to_pandas()
    top = agg.groupby("e", sort=False)["n"].sum().nlargest(top_k)
    return {e: i for i, e in enumerate(top.index)}


def _prefix_candidates(rows, *, bucket_cols, threshold: float,
                       hot_bucket: int | None = None,
                       n_groups: int = 8):
    """Candidate id pairs from prefix rows: ONE (bucket)-hash exchange with
    the in-loop PPJoin filters — plus, behind the opt-in ``hot_bucket``
    trigger, 2D triangle blocking for buckets whose row count exceeds the
    cap (VERDICT r3 #9 / CLAUDE r4 #1).

    With ``hot_bucket`` set, an exact count pre-pass finds hot buckets
    (only buckets OVER the cap reach the driver — a bounded set by
    construction), hot rows triangle-expand so the exchange spreads one
    bucket's n²/2 pairs over g(g+1)/2 cells/tasks, and cold rows take the
    normal route.  Hot-cell enumeration skips the PPJoin positional filter
    (a superset — the exact verify downstream keeps only true pairs), so
    the union is exactly the un-truncated flat enumeration (test-pinned).
    Default ``None`` = off: zero overhead, and the count pre-pass over
    near-unique shingle tokens would otherwise double the dominant
    shuffle — enable it for workloads with known hot keys."""
    flat = hash_exchange(
        rows, key_fn=_pair_hash_key(bucket_cols), n_parts=N_DOC_PARTS,
        kernel=dd.candidate_pairs_partition, fmt="pandas",
        kernel_kwargs={"bucket_cols": bucket_cols,
                       "jaccard_threshold": threshold})
    if hot_bucket is None:
        return flat

    import pyarrow as pa
    import ray

    def cnt_partial(tbl):
        out = tbl.group_by(bucket_cols).aggregate([("doc_id", "count")])
        return out.rename_columns(list(bucket_cols) + ["n"])

    def cnt_merge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(list(bucket_cols), sort=False)["n"].sum()
        out = out[out > hot_bucket].reset_index()
        return out

    hot = hash_exchange(
        rows.map_batches(cnt_partial, batch_format="pyarrow"),
        key_fn=_pair_hash_key(bucket_cols), n_parts=N_DOC_PARTS,
        kernel=cnt_merge, fmt="pandas").to_pandas()
    if len(hot) == 0:
        return flat

    hot_keys = set(map(tuple, hot[list(bucket_cols)].itertuples(
        index=False, name=None)))
    ref = ray.put(hot_keys)

    def split_mask(tbl):
        keys = ray.get(ref)
        cols = [tbl.column(c).to_numpy(zero_copy_only=False)
                for c in bucket_cols]
        mask = np.fromiter(
            (t in keys for t in zip(*cols)), dtype=bool, count=len(cols[0]))
        return mask

    def cold_rows(tbl):
        return tbl.filter(pa.array(~split_mask(tbl)))

    def hot_rows(tbl):
        sub = tbl.filter(pa.array(split_mask(tbl)))
        if sub.num_rows == 0:
            return dd.triangle_expand(sub, id_col="doc_id",
                                      n_groups=n_groups)
        return dd.triangle_expand(sub, id_col="doc_id", n_groups=n_groups)

    cold = hash_exchange(
        rows.map_batches(cold_rows, batch_format="pyarrow"),
        key_fn=_pair_hash_key(bucket_cols), n_parts=N_DOC_PARTS,
        kernel=dd.candidate_pairs_partition, fmt="pandas",
        kernel_kwargs={"bucket_cols": bucket_cols,
                       "jaccard_threshold": threshold})
    tri_cols = list(bucket_cols) + ["ci", "cj"]
    hot_cands = hash_exchange(
        rows.map_batches(hot_rows, batch_format="pyarrow"),
        key_fn=_pair_hash_key(tri_cols), n_parts=N_DOC_PARTS,
        kernel=dd.triangle_pairs_partition, fmt="pandas",
        kernel_kwargs={"bucket_cols": bucket_cols, "id_col": "doc_id",
                       "n_groups": n_groups})
    return cold.union(hot_cands)


def _prefix_filtered_pairs(sf_dir: str, *, threshold: float, charset: bool,
                           sim_col: str, hot_bucket: int | None = None):
    """Exact set-similarity join: prefix-token blocking (100% recall at the
    threshold — outputs equal the all-pairs SQL oracle) + exact verify via
    the id-keyed payload exchanges.

    Round-3 shape: the candidate exchange ships (doc_id, block, tok) rows
    only; the order-sorted element-hash sets (explicit ``list<uint64>`` —
    no pandas→Arrow tensor inference, the round-2 schema flake) are
    materialized once and ride the two verify exchanges once per doc."""
    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    rank = _common_rank(ds, charset=charset)
    sets = ds.map_batches(
        dd.doc_sets_table, batch_format="pyarrow",
        fn_kwargs={"order_rank": rank, "charset": charset,
                   "block_col": "lang"}).materialize()
    rows = sets.map_batches(dd.prefix_token_rows, batch_format="pyarrow",
                            fn_kwargs={"threshold": threshold})
    cands = _prefix_candidates(rows, bucket_cols=["block", "tok"],
                               threshold=threshold, hot_bucket=hot_bucket)
    return _verify_id_pairs(
        cands, sets.select_columns(["doc_id", "elems"]),
        payload_id="doc_id", payload_col="elems", attach_out="elems_a",
        verify_kernel=dd.set_jaccard_verify,
        verify_kwargs={"threshold": threshold, "sim_col": sim_col})


def ngram_jaccard(sf_dir: str, threshold: float = 0.5, k: int = 3,
                  hot_bucket: int | None = None):
    """Exact word-k-gram (shingle) set-Jaccard join — DETERMINISTIC 100%
    recall via the AllPairs/PPJoin prefix filter over hash-sorted shingle
    sets (no LSH probability argument, unlike :func:`minhash_pairs` which
    shares the same SQL truth but generates candidates via banded LSH).
    Shingle hashes are near-unique, so hash order serves as the global
    prefix order and no frequency-rank estimation pass is needed; there is
    no block column — blocking comes entirely from shared prefix shingles."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return shingle_jaccard_pairs(ds, threshold=threshold, k=k,
                                 hot_bucket=hot_bucket)


def shingle_jaccard_pairs(ds, threshold: float = 0.5, k: int = 3,
                          hot_bucket: int | None = None,
                          sim_col: str = "ngram_jaccard"):
    """:func:`ngram_jaccard`'s machinery over ANY ``(doc_id, text)``
    dataset — the payload-agnostic seam that lets the dedup family run on
    derived corpora (e.g. conversation-level transcripts,
    :func:`~gorilla_tsc_ray.pipelines.ingest.near_dup_convs`)."""
    sets = ds.map_batches(dd.shingle_sets_table, batch_format="pyarrow",
                          fn_kwargs={"k": k}).materialize()
    rows = sets.map_batches(dd.prefix_token_rows, batch_format="pyarrow",
                            fn_kwargs={"threshold": threshold})
    cands = _prefix_candidates(rows, bucket_cols=["tok"],
                               threshold=threshold, hot_bucket=hot_bucket)
    return _verify_id_pairs(
        cands, sets.select_columns(["doc_id", "elems"]),
        payload_id="doc_id", payload_col="elems", attach_out="elems_a",
        verify_kernel=dd.set_jaccard_verify,
        verify_kwargs={"threshold": threshold, "sim_col": sim_col})


# ---------- similarity search ----------

def _query_vectors(sf_dir: str, n_queries: int = 5) -> dict[int, list[float]]:
    """Query rows only — the predicate is pushed into the parquet scan so
    the driver never materializes the corpus (round-1 scale bug)."""
    df = _read_emb_head(sf_dir, ["vec_id", "embedding"], n_queries)
    return {int(r.vec_id): list(r.embedding) for r in df.itertuples()}


# ---------- dedup clustering (connected components) ----------

def _presplit_graph_edges(pairs_ds, n_parts: int, *, id_a: str = "id_a",
                          id_b: str = "id_b"):
    """Shared entry of every iterative graph operator (cluster_pairs,
    kcore, pagerank): undirected pairs → BOTH-direction edge rows,
    pre-split ONCE by src hash (:class:`PresplitInput`), so a node's
    out-edges are partition-local — degrees, contribution scans and
    removal checks never shuffle, and each round reuses the same
    co-partitioned refs.  Returns ``(edges_ds, edges_pre, key_src)``."""
    from ..stages.exchange import PresplitInput

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        a = df[id_a].to_numpy(dtype=np.int64)
        b = df[id_b].to_numpy(dtype=np.int64)
        return pd.DataFrame({"src": np.concatenate((a, b)),
                             "dst": np.concatenate((b, a))})

    edges = (pairs_ds.materialize()
             .map_batches(both_dirs, batch_format="pandas").materialize())
    key_src = _pair_hash_key(["src"], n_parts)
    return edges, PresplitInput(edges, key_src, n_parts), key_src


def _md5_bucket(ids: np.ndarray) -> np.ndarray:
    """DuckDB-identical `md5_number_upper(CAST(id AS VARCHAR)) % 100`
    (little-endian first 8 digest bytes — the hash_split convention)."""
    import hashlib

    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8],
                        "little") % 100 for i in ids),
        count=len(ids), dtype=np.int64)


MIX_RATES = (("en", 40), ("de", 70))  # percent kept; other langs 100


# ---------- edit-distance near-dup ----------

def _padded_prefix_bytes(col, width: int):
    """(n, width) uint8 matrix of each string's first ``width`` UTF-8
    bytes, zero-padded — one gather over the contiguous Arrow values
    buffer, no per-row Python.  The corpus is ASCII (the fingerprint
    gate's one-scan check precedent), so byte slicing == character
    slicing == what DuckDB ``substr``/``levenshtein`` see."""
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pc.utf8_slice_codeunits(col, 0, width)
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    n = len(arr)
    off = np.frombuffer(arr.buffers()[1], np.int32)[
        arr.offset: arr.offset + n + 1].astype(np.int64)
    data = np.frombuffer(arr.buffers()[2], np.uint8)
    lens = off[1:] - off[:-1]
    idx = off[:-1, None] + np.arange(width)
    valid = np.arange(width) < lens[:, None]
    safe = np.minimum(idx, max(len(data) - 1, 0))
    mat = np.where(valid, data[safe] if len(data) else 0, 0).astype(np.uint8)
    return mat, lens


def _levenshtein_pairs(a_mat, la, b_mat, lb):
    """Exact unit-cost Levenshtein distance for n (a, b) pairs at once.

    Classic DP vectorized ACROSS the pair axis; the in-row left-to-right
    dependency (``row[j] = min(cand[j], row[j-1]+1)``) collapses to one
    ``np.minimum.accumulate`` because unrolling gives ``row[j] =
    min_{k<=j}(cand[k] + (j-k))`` — i.e. ``row - j = running-min of
    (cand - j)``.  O(maxlen) vectorized steps, no per-pair Python."""
    n, L = a_mat.shape
    jr = np.arange(L + 1, dtype=np.int64)
    prev = np.broadcast_to(jr, (n, L + 1)).copy()
    res = lb.astype(np.int64).copy()          # D[0, lb] = lb (la == 0)
    cc = np.empty((n, L + 1), dtype=np.int64)
    mx = int(la.max()) if n else 0
    for i in range(1, mx + 1):
        cost = (a_mat[:, i - 1:i] != b_mat).astype(np.int64)
        cc[:, 0] = i
        np.minimum(prev[:, 1:] + 1, prev[:, :-1] + cost, out=cc[:, 1:])
        prev = np.minimum.accumulate(cc - jr, axis=1) + jr
        hit = la == i
        if hit.any():
            res[hit] = prev[hit, lb[hit]]
    return res


# RAKE stopword list: the classic Lucene/Fox English function-word core —
# fixed here because the oracle SQL embeds the identical IN-list.
RAKE_STOPWORDS = (
    "a", "an", "and", "are", "as", "at", "be", "but", "by", "for", "if",
    "in", "into", "is", "it", "no", "not", "of", "on", "or", "such",
    "that", "the", "their", "then", "there", "these", "they", "this",
    "to", "was", "will", "with")


# ---------- graph ranking ----------

PAGERANK_SCALE = 10 ** 12


def _global_rank(per_doc, metric: str, out_col: str,
                 id_col: str = "doc_id"):
    """(id, ``out_col``) global 1-based rank by (``metric`` DESC, id ASC)
    — the events ``_global_ntile`` route (distributed sort → per-block
    row counts → driver offset fold → rank arithmetic tasks); descending
    order comes from sorting the negated (non-negative int) metric, so
    the total order is exact integer."""
    import pyarrow as pa
    import ray
    import ray.data

    def neg(t):
        return pa.table({
            id_col: t.column(id_col),
            "_neg": pa.array(-t.column(metric).to_numpy(
                zero_copy_only=False).astype(np.int64))})

    ordered = (per_doc.map_batches(neg, batch_format="pyarrow")
               .sort(["_neg", id_col]).materialize())
    refs = ordered.to_arrow_refs()

    @ray.remote
    def nrows(tbl):
        return tbl.num_rows

    counts = ray.get([nrows.remote(r) for r in refs])
    offs = np.concatenate(([0], np.cumsum(counts)[:-1])).astype(np.int64)

    @ray.remote
    def rank_block(tbl, r0: int):
        import pyarrow as _pa

        r = np.arange(tbl.num_rows, dtype=np.int64) + np.int64(r0) + 1
        return _pa.table({id_col: tbl.column(id_col),
                          out_col: _pa.array(r)})

    return ray.data.from_arrow_refs(
        [rank_block.remote(r, int(o)) for r, o in zip(refs, offs)])
