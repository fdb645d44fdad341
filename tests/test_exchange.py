"""Tests for the raw hash exchange: multi-input co-partitioning, the
chunked (spill-aware) reduce, and the round-2 tensor-extension schema
regression (mixed uniform/ragged list batches through the exchange)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gorilla_tsc_ray.stages import dedup as dd
from gorilla_tsc_ray.stages.exchange import hash_exchange, hash_exchange_multi

N_PARTS = 8


def _key(cols):
    def key_fn(tbl):
        h = pd.util.hash_pandas_object(
            tbl.column(cols[0]).to_pandas(), index=False).to_numpy()
        for c in cols[1:]:
            h = h * np.uint64(1_000_003) + pd.util.hash_pandas_object(
                tbl.column(c).to_pandas(), index=False).to_numpy()
        return (h % np.uint64(N_PARTS)).astype(np.int64)
    return key_fn


def test_chunked_reduce_equals_unchunked(ray_session):
    """chunk_rows must not change a self-merging kernel's result — forced
    tiny chunks so every partition streams through several kernel calls."""
    import ray.data

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "digest": rng.integers(0, 40, 500).astype(np.uint64),
        "doc_id": rng.permutation(500).astype(np.int64),
        "n_dups": np.ones(500, dtype=np.int64),
    })
    ds = ray.data.from_pandas([df.iloc[i:i + 50] for i in range(0, 500, 50)])

    def dedup_partial(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("digest", sort=False).agg(
            doc_id=("doc_id", "min"), n_dups=("n_dups", "sum"))
        return g.reset_index()[["digest", "doc_id", "n_dups"]]

    def run(chunk_rows):
        out = hash_exchange(
            ds, key_fn=_key(["digest"]), n_parts=N_PARTS,
            kernel=dedup_partial, fmt="pandas", chunk_rows=chunk_rows,
            final_kernel=lambda d: d[["doc_id", "n_dups"]])
        return out.to_pandas().sort_values("doc_id").reset_index(drop=True)

    a = run(None)
    b = run(7)  # << any partition size: forces many chunked kernel calls
    pd.testing.assert_frame_equal(a, b)
    # ground truth
    exp = (df.groupby("digest").agg(doc_id=("doc_id", "min"),
                                    n_dups=("n_dups", "sum"))
           .reset_index()[["doc_id", "n_dups"]]
           .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(a, exp)


def test_multi_input_copartitioning(ray_session):
    """Pairs keyed by id_a + payload keyed by id must meet in the same
    partition; the kernel sees exactly the payload rows it needs."""
    import ray.data

    ids = np.arange(100, dtype=np.int64)
    payload = pd.DataFrame({"doc_id": ids, "val": ids * 10})
    pairs = pd.DataFrame({"id_a": ids[:-1], "id_b": ids[1:]})
    pairs_ds = ray.data.from_pandas(
        [pairs.iloc[i:i + 25] for i in range(0, len(pairs), 25)])
    pay_ds = ray.data.from_pandas(
        [payload.iloc[i:i + 30] for i in range(0, 100, 30)])

    def kernel(p: pd.DataFrame, pay: pd.DataFrame) -> pd.DataFrame:
        lut = dict(zip(pay["doc_id"], pay["val"]))
        out = p.copy()
        out["val_a"] = [lut[a] for a in p["id_a"]]  # KeyError if missing
        return out

    got = hash_exchange_multi(
        [(pairs_ds, _key(["id_a"])), (pay_ds, _key(["doc_id"]))],
        n_parts=N_PARTS, kernel=kernel, fmt="pandas",
    ).to_pandas().sort_values("id_a").reset_index(drop=True)
    assert len(got) == 99
    np.testing.assert_array_equal(got["val_a"], got["id_a"] * 10)


def test_multi_input_empty_driving_input(ray_session):
    """An empty driving input yields the kernel's (empty) output schema."""
    import ray.data

    pairs_ds = ray.data.from_pandas(pd.DataFrame(
        {"id_a": np.array([], dtype=np.int64),
         "id_b": np.array([], dtype=np.int64)}))
    pay_ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": np.arange(5, dtype=np.int64)}))

    def kernel(p, pay):
        return pd.DataFrame({"id_a": p["id_a"], "n": p["id_a"]})

    got = hash_exchange_multi(
        [(pairs_ds, _key(["id_a"])), (pay_ds, _key(["doc_id"]))],
        n_parts=N_PARTS, kernel=kernel, fmt="pandas")
    # (to_pandas() on a 0-row Dataset drops columns — check the schema)
    assert got.schema().names == ["id_a", "n"]
    assert got.count() == 0


def test_mixed_uniform_and_ragged_list_blocks(ray_session):
    """Round-2 regression (docs_charset_jaccard flake): one block whose
    element sets all have EQUAL length and one ragged block used to get
    different inferred tensor-extension types and crash pa.concat_tables
    inside the exchange reduce.  Explicit list<uint64> columns must concat
    regardless of per-block shape."""
    import ray.data

    def tbl(ids, sets):
        offs = np.concatenate(([0], np.cumsum([len(s) for s in sets])))
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "elems": pa.ListArray.from_arrays(
                pa.array(offs, pa.int32()),
                pa.array(np.concatenate(sets).astype(np.uint64),
                         pa.uint64())),
        })

    uniform = tbl([0, 1, 2], [np.array([1, 2]), np.array([2, 3]),
                              np.array([1, 3])])
    ragged = tbl([3, 4], [np.array([1, 2, 3, 4]), np.array([9])])
    sets_ds = ray.data.from_arrow([uniform, ragged])
    pairs = pd.DataFrame({"id_a": [0, 0, 1, 3], "id_b": [1, 2, 2, 4]})
    pairs_ds = ray.data.from_pandas(pairs)

    paired = hash_exchange_multi(
        [(pairs_ds, _key(["id_a"])), (sets_ds, _key(["doc_id"]))],
        n_parts=N_PARTS, kernel=dd.attach_payload_a, fmt="pyarrow")
    out = hash_exchange_multi(
        [(paired, _key(["id_b"])), (sets_ds, _key(["doc_id"]))],
        n_parts=N_PARTS, kernel=dd.set_jaccard_verify, fmt="pyarrow",
        kernel_kwargs={"threshold": 0.0, "sim_col": "sim"},
    ).to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # jaccards: (0,1): {1,2}∩{2,3}=1/3; (0,2): 1/3; (1,2): {2,3}∩{1,3}=1/3;
    # (3,4): {1,2,3,4}∩{9}=0/5
    np.testing.assert_allclose(out["sim"], [1 / 3, 1 / 3, 1 / 3, 0.0],
                               atol=1e-6)


def test_candidate_pairs_partition_matches_naive():
    """Triangular-decode pair enumeration == per-bucket triu reference."""
    rng = np.random.default_rng(11)
    n = 400
    df = pd.DataFrame({
        "block": rng.choice(["x", "y", "z"], n),
        "tok": rng.integers(0, 25, n).astype(np.uint64),
        "doc_id": rng.permutation(10_000)[:n].astype(np.int64),
    })
    # a doc may appear at most once per bucket (prefix elements distinct)
    df = df.drop_duplicates(["block", "tok", "doc_id"])
    got = dd.candidate_pairs_partition(df, bucket_cols=["block", "tok"])
    got = set(zip(got["id_a"], got["id_b"]))
    exp = set()
    for _, g in df.groupby(["block", "tok"]):
        ids = np.sort(g["doc_id"].to_numpy())
        ia, ib = np.triu_indices(len(ids), k=1)
        exp |= set(zip(ids[ia], ids[ib]))
    assert got == exp


def test_candidate_pairs_native_matches_numpy():
    """The native enumeration+filter and the numpy fallback must be
    bit-identical, with and without the PPJoin filter columns."""
    import gorilla_tsc_ray.codec.native as native

    if not native.AVAILABLE:
        import pytest

        pytest.skip("no C compiler")
    rng = np.random.default_rng(23)
    n = 600
    df = pd.DataFrame({
        "block": rng.choice(["x", "y"], n),
        "tok": rng.integers(0, 12, n).astype(np.uint64),
        "doc_id": rng.permutation(10_000)[:n].astype(np.int64),
        "sz": rng.integers(1, 40, n).astype(np.int32),
    }).drop_duplicates(["block", "tok", "doc_id"])
    df["pos"] = (rng.integers(0, 40, len(df)) % df["sz"]).astype(np.int32)

    def both(**kw):
        got_native = dd.candidate_pairs_partition(df, **kw)
        orig = native.AVAILABLE
        native.AVAILABLE = False
        try:
            got_numpy = dd.candidate_pairs_partition(df, **kw)
        finally:
            native.AVAILABLE = orig
        pd.testing.assert_frame_equal(got_native, got_numpy)
        return got_native

    unfiltered = both(bucket_cols=["block", "tok"])
    filtered = both(bucket_cols=["block", "tok"], jaccard_threshold=0.5)
    assert len(filtered) < len(unfiltered)  # the filter actually prunes
    # truncation path parity too
    both(bucket_cols=["block", "tok"], max_bucket=20)


def test_distinct_sorted_sets_flat_matches_naive():
    """Vectorized set builder == the round-2 per-element reference order."""
    texts = pd.Series(["the cat sat on the mat", "a b a b c",
                       "", "zzz zzz", "cat mat the"])
    rank = {"the": 0, "a": 1, "cat": 2}
    vals, offs = dd.distinct_sorted_sets_flat(texts, rank, charset=False)

    # naive reference (round-2 semantics)
    import itertools
    lists = [sorted(set(t)) for t in texts.str.findall(r"[A-Za-z0-9]+")]
    all_elems = sorted(set(itertools.chain.from_iterable(lists)))
    eh = {e: int(h) for e, h in zip(all_elems, dd.splitmix64(
        pd.util.hash_pandas_object(pd.Series(all_elems, dtype=object),
                                   index=False).to_numpy()))}

    def key(e):
        r = rank.get(e)
        return (1, r, eh[e]) if r is not None else (0, eh[e], 0)

    for i, lst in enumerate(lists):
        exp = np.array([eh[e] for e in sorted(lst, key=key)],
                       dtype=np.uint64)
        np.testing.assert_array_equal(vals[offs[i]:offs[i + 1]], exp)


def test_set_jaccard_verify_kernel():
    """Flatten-lexsort intersection == per-pair python sets."""
    rng = np.random.default_rng(5)
    sets = [np.unique(rng.integers(0, 30, rng.integers(1, 20)))
            .astype(np.uint64) for _ in range(40)]
    offs = np.concatenate(([0], np.cumsum([len(s) for s in sets])))
    payload = pa.table({
        "doc_id": pa.array(np.arange(40), pa.int64()),
        "elems": pa.ListArray.from_arrays(
            pa.array(offs, pa.int32()),
            pa.array(np.concatenate(sets), pa.uint64())),
    })
    ia = rng.integers(0, 40, 60).astype(np.int64)
    ib = rng.integers(0, 40, 60).astype(np.int64)
    keep = ia != ib
    ia, ib = ia[keep], ib[keep]
    elems_col = payload.column("elems").combine_chunks()
    pairs = pa.table({
        "id_a": pa.array(ia, pa.int64()),
        "id_b": pa.array(ib, pa.int64()),
        "elems_a": elems_col.take(pa.array(ia)),
    })
    got = dd.set_jaccard_verify(pairs, payload, threshold=0.0,
                                sim_col="sim")
    for k in range(len(ia)):
        a, b = set(sets[ia[k]].tolist()), set(sets[ib[k]].tolist())
        exp = len(a & b) / max(len(a | b), 1)
        assert got["sim"].iloc[k] == pytest.approx(exp, abs=1e-6)


def test_triangle_blocking_equals_flat_enumeration():
    """2D triangle blocking: the union of per-cell pair enumerations over
    the g×g grid must EQUAL the flat per-bucket enumeration — every pair in
    exactly one cell — while each cell holds only ~2/g of the bucket."""
    rng = np.random.default_rng(31)
    hot = pd.DataFrame({          # one hot bucket + a few cold ones
        "table": np.int32(0),
        "bucket": np.int64(7),
        "vec_id": rng.permutation(100_000)[:500].astype(np.int64)})
    cold = pd.DataFrame({
        "table": rng.integers(1, 4, 60).astype(np.int32),
        "bucket": rng.integers(0, 3, 60).astype(np.int64),
        "vec_id": rng.permutation(100_000)[:60].astype(np.int64)})
    df = pd.concat([hot, cold], ignore_index=True)
    df = df.drop_duplicates(["table", "bucket", "vec_id"])
    tbl = pa.Table.from_pandas(df, preserve_index=False)

    g = 4
    ex = dd.triangle_expand(tbl, id_col="vec_id", n_groups=g)
    assert ex.num_rows == tbl.num_rows * g
    exdf = ex.to_pandas()
    # per-cell row bound: a cell holds at most two groups of the bucket
    cell_sizes = exdf[(exdf["table"] == 0) & (exdf["bucket"] == 7)] \
        .groupby(["ci", "cj"]).size()
    assert len(cell_sizes) == g * (g + 1) // 2
    assert cell_sizes.max() < 2 * len(hot) / g * 1.8  # ~2n/g with slack

    got = dd.triangle_pairs_partition(
        exdf, bucket_cols=["table", "bucket"], id_col="vec_id", n_groups=g)
    flat = dd.candidate_pairs_partition(
        df, bucket_cols=["table", "bucket"], id_col="vec_id")
    assert (set(zip(got["id_a"], got["id_b"]))
            == set(zip(flat["id_a"], flat["id_b"])))
    # no duplicate pair generation across cells (each pair in ONE cell)
    assert not got.duplicated(["id_a", "id_b"]).any()


def test_triangle_pairs_cells_disjoint():
    """Each (id_a, id_b) pair of a bucket is generated by exactly one cell
    even when cells are evaluated in separate partitions."""
    rng = np.random.default_rng(5)
    df = pd.DataFrame({
        "table": np.int32(0), "bucket": np.int64(1),
        "vec_id": np.arange(80, dtype=np.int64)})
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    g = 3
    exdf = dd.triangle_expand(tbl, id_col="vec_id", n_groups=g).to_pandas()
    all_pairs = []
    for _, cell in exdf.groupby(["ci", "cj"]):  # one partition per cell
        p = dd.triangle_pairs_partition(
            cell, bucket_cols=["table", "bucket"], id_col="vec_id",
            n_groups=g)
        all_pairs.append(p)
    allp = pd.concat(all_pairs, ignore_index=True)
    assert not allp.duplicated(["id_a", "id_b"]).any()
    assert len(allp) == 80 * 79 // 2


def test_out_of_range_partition_ids_rejected(ray_session):
    """A key_fn whose modulus disagrees with n_parts must fail loudly in
    the split task, not silently corrupt partition slicing."""
    import ray
    import ray.data

    ds = ray.data.from_pandas(pd.DataFrame({"k": np.arange(20)}))
    # the split counts are fetched eagerly, so the exchange call itself
    # surfaces the error
    with pytest.raises(Exception, match="outside"):
        hash_exchange(
            ds, key_fn=lambda t: t.column("k").to_numpy() % 16,  # ids ≤ 15
            n_parts=4, kernel=lambda df: df, fmt="pandas")


def test_presplit_input_reuse(ray_session):
    """A PresplitInput reused across two multi-exchanges gives identical
    results to fresh (ds, key_fn) splits; n_parts mismatch is loud."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from gorilla_tsc_ray.stages.exchange import (PresplitInput,
                                                 hash_exchange_multi)

    edges = pd.DataFrame({"src": np.arange(40, dtype=np.int64) % 7,
                          "dst": np.arange(40, dtype=np.int64) % 5})
    vals = pd.DataFrame({"node": np.arange(7, dtype=np.int64),
                         "label": np.arange(7, dtype=np.int64) * 10})

    def key_of(col, P):
        def key_fn(tbl):
            return (tbl.column(col).to_numpy().astype(np.uint64)
                    % np.uint64(P)).astype(np.int64)
        return key_fn

    def join(e, v):
        m = e.merge(v, left_on="src", right_on="node")
        return m[["dst", "label"]]

    P = 4
    e_ds = ray.data.from_pandas(edges)
    v_ds = ray.data.from_pandas(vals)
    fresh = hash_exchange_multi(
        [(e_ds, key_of("src", P)), (v_ds, key_of("node", P))],
        n_parts=P, kernel=join).to_pandas()
    pre = PresplitInput(e_ds, key_of("src", P), P)
    for _ in range(2):                       # reuse across rounds
        got = hash_exchange_multi(
            [pre, (v_ds, key_of("node", P))],
            n_parts=P, kernel=join).to_pandas()
        s = ["dst", "label"]
        pd.testing.assert_frame_equal(
            got.sort_values(s).reset_index(drop=True),
            fresh.sort_values(s).reset_index(drop=True))
    with pytest.raises(ValueError, match="n_parts"):
        hash_exchange_multi([pre, (v_ds, key_of("node", 8))],
                            n_parts=8, kernel=join)
