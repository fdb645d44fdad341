"""Raw-Ray hash exchange for partition-local kernels.

Used where the input is NOT pre-partitioned (driver tables, unbucketed
lakes).  Ray Data's ``groupby(...).map_groups`` runs a sort-based exchange
whose single-node concurrency caps well below the core count (measured,
BASELINE.md round 1); this exchange is the classic two-stage hash shuffle
instead:

    map:    one task per input block — hash the key columns, stable-sort by
            partition id, slice into P zero-copy sub-tables
            (``num_returns = P + 1``; the +1 is the per-partition row-count
            vector, so empty partitions are skipped without fetching data)
    reduce: one task per non-empty partition — concat its sub-tables, run
            the partition kernel once, return an Arrow table

Two variants:

- :func:`hash_exchange` — one input dataset.  With ``chunk_rows`` set, the
  reduce is SPILL-AWARE: sub-tables stream through the kernel in bounded
  chunks instead of one concat of the whole partition, so an oversized
  partition never has to fit a task at once.  Chunking requires the kernel
  to be SELF-MERGING — ``kernel(concat(kernel(X), Y)) == kernel(concat(X,
  Y))`` with identical input/output schema (dedup keep-first, pair dedup,
  rollup partial merges all are); an optional ``final_kernel`` projects the
  last partial to the output schema.
- :func:`hash_exchange_multi` — N co-partitioned inputs (each with its own
  key function); the kernel receives one table per input.  This is the
  fetch-side of the slim pair-verify pattern: candidate ID pairs ride one
  input, per-id payloads (element sets, embeddings) ride the other exactly
  once, and the kernel joins them partition-locally — full payloads never
  multiply across candidate rows (VERDICT r2 "What's wrong" #4/#5).

The result is a materialized Dataset (a shuffle is a pipeline barrier
anyway).  Partitioning assumption — same as ``map_groups``: one partition's
rows fit one reduce task (or one chunk, when chunked); size ``n_parts``
accordingly and salt hot keys into the partition id (see
``pipelines/events.py`` day-index salting).

This is the documented "raw Ray as a last resort" seam: everything above
and below it stays on the Dataset API.
"""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd

# Split outputs pinned for reconstruction: if a reduce block is evicted
# later, Ray reconstructs it from these inputs.  A pin on the returned
# Dataset object alone dies as soon as a caller derives a new Dataset from
# it (ADVICE r2), so recent exchanges' splits are ALSO held in this bounded
# module-level registry — old entries roll off, bounding the pinned
# object-store footprint to one pipeline's worth of shuffles (the deepest
# shipped pipeline chains 5 exchanges).
_KEEPALIVE: deque = deque(maxlen=8)


def _to_arrow(out):
    import pyarrow as pa

    if isinstance(out, pd.DataFrame):
        return pa.Table.from_pandas(out, preserve_index=False)
    return out


def _block_refs(ds):
    return [ref for bundle in ds.iter_internal_ref_bundles()
            for ref in bundle.block_refs]


def _empty_table(ds):
    """Schema-bearing empty pa.Table for ``ds`` (handles both Arrow and
    pandas block schemas)."""
    import pyarrow as pa

    schema = ds.schema()
    base = getattr(schema, "base_schema", schema)
    if isinstance(base, pa.Schema):
        return pa.table({f.name: pa.array([], f.type) for f in base})
    cols = {}
    for name, typ in zip(schema.names, schema.types):
        if not isinstance(typ, pa.DataType):
            typ = pa.from_numpy_dtype(typ)
        cols[name] = pa.array([], typ)
    return pa.table(cols)


def _split_remote():
    import ray

    @ray.remote
    def split_block(block, n_parts, key_fn):
        import pyarrow as pa

        tbl = (pa.Table.from_pandas(block, preserve_index=False)
               if isinstance(block, pd.DataFrame) else block)
        if tbl.num_rows == 0:  # empty block (e.g. a filter that drops all)
            return (*([tbl] * n_parts),
                    np.zeros(n_parts, dtype=np.int64))
        ids = np.asarray(key_fn(tbl), dtype=np.int64)
        if ids.size and (ids.min() < 0 or ids.max() >= n_parts):
            raise ValueError(
                f"key_fn produced partition ids in "
                f"[{ids.min()}, {ids.max()}] outside [0, {n_parts}) — "
                "a key function with a baked-in modulus was paired with a "
                "different n_parts")
        order = np.argsort(ids, kind="stable")
        tbl = tbl.take(pa.array(order))  # block-sized take: safe
        counts = np.bincount(ids, minlength=n_parts).astype(np.int64)
        bounds = np.concatenate(([0], np.cumsum(counts)))
        parts = [tbl.slice(int(bounds[p]), int(counts[p]))
                 for p in range(n_parts)]
        return (*parts, counts)

    return split_block


def hash_exchange(ds, *, key_fn, n_parts: int, kernel, fmt: str = "pandas",
                  kernel_kwargs: dict | None = None,
                  chunk_rows: int | None = None, final_kernel=None):
    """``ds`` → Dataset of per-partition kernel outputs.

    ``key_fn(table) -> int64 ndarray`` assigns each row a partition in
    ``[0, n_parts)`` (runs inside map tasks; must be deterministic).
    ``kernel`` receives one whole partition as a pa.Table (``fmt=
    "pyarrow"``) or DataFrame and returns either.

    ``chunk_rows``: stream the reduce through the kernel in ≈chunk_rows-row
    chunks (kernel must be self-merging, see module docstring).
    ``final_kernel``: applied once to the partition result (projection to
    the output schema) — applied in both chunked and unchunked mode so
    semantics don't depend on chunking.
    """
    import ray
    import ray.data

    kernel_kwargs = kernel_kwargs or {}
    split_block = _split_remote()

    @ray.remote
    def reduce_part(*parts):
        import pyarrow as pa

        # strip pandas schema metadata: blocks from different upstream
        # tasks can carry conflicting pandas-dtype annotations that make
        # to_pandas raise after concat (the embedding/sig list columns)
        tables = [p.replace_schema_metadata(None) for p in parts
                  if p.num_rows]

        def apply(acc, buf):
            ts = ([acc] if acc is not None else []) + buf
            # permissive promotion: blocks from different upstream tasks
            # can carry different dictionary index widths for the same
            # column (pandas Categorical -> Arrow picks the narrowest
            # per block); permissive unifies them instead of raising
            merged = pa.concat_tables(
                ts, promote_options="permissive").combine_chunks()
            data = merged if fmt == "pyarrow" else merged.to_pandas()
            return _to_arrow(
                kernel(data, **kernel_kwargs)).replace_schema_metadata(None)

        if chunk_rows is None:
            result = apply(None, tables)
        else:
            acc, buf, buffered = None, [], 0
            for t in tables:
                buf.append(t)
                buffered += t.num_rows
                if buffered >= chunk_rows:
                    acc = apply(acc, buf)
                    buf, buffered = [], 0
            result = apply(acc, buf) if (buf or acc is None) else acc
        if final_kernel is not None:
            data = result if fmt == "pyarrow" else result.to_pandas()
            result = _to_arrow(final_kernel(data))
        return result

    def _empty_result():
        # run the kernel once on an empty input so the result carries the
        # KERNEL's output schema, not the input's
        import pyarrow as pa

        try:
            empty = _empty_table(ds)
            data = empty if fmt == "pyarrow" else empty.to_pandas()
            out = _to_arrow(kernel(data, **kernel_kwargs))
            if final_kernel is not None:
                fdata = out if fmt == "pyarrow" else out.to_pandas()
                out = _to_arrow(final_kernel(fdata))
            return ray.data.from_arrow(out)
        except Exception:
            return ds.limit(0)

    block_refs = _block_refs(ds)
    if not block_refs:
        return _empty_result()

    splits = [split_block.options(num_returns=n_parts + 1)
              .remote(ref, n_parts, key_fn) for ref in block_refs]
    counts = np.stack(ray.get([s[n_parts] for s in splits]))
    part_rows = counts.sum(axis=0)

    out_refs = []
    for p in np.flatnonzero(part_rows):
        out_refs.append(reduce_part.remote(
            *[splits[i][p] for i in np.flatnonzero(counts[:, p])]))
    if not out_refs:
        # all blocks were empty: run the kernel on one (schema-bearing)
        # empty part so the result still has the kernel's output schema
        try:
            sample = ray.get(splits[0][0])
            data = sample if fmt == "pyarrow" else sample.to_pandas()
            out = _to_arrow(kernel(data, **kernel_kwargs))
            if final_kernel is not None:
                fdata = out if fmt == "pyarrow" else out.to_pandas()
                out = _to_arrow(final_kernel(fdata))
            return ray.data.from_arrow(out)
        except Exception:
            return _empty_result()
    out = ray.data.from_arrow_refs(out_refs)
    out._gtsc_exchange_keepalive = splits
    _KEEPALIVE.append(splits)
    return out


class PresplitInput:
    """Split-once handle for :func:`hash_exchange_multi`: an iterative
    algorithm that co-partitions a CONSTANT input every round (label
    propagation's edge set) pays the hash + zero-copy-slice task fan-out
    each time — pre-splitting amortizes it to one pass.  Holds the split
    refs (keepalive) for its own lifetime; pass the instance in place of a
    ``(ds, key_fn)`` tuple."""

    def __init__(self, ds, key_fn, n_parts: int):
        import ray

        self.n_parts = n_parts
        self.ds = ds
        split_block = _split_remote()
        refs = _block_refs(ds)
        self.splits = [split_block.options(num_returns=n_parts + 1)
                       .remote(ref, n_parts, key_fn) for ref in refs]
        self.counts = (np.stack(
            ray.get([s[n_parts] for s in self.splits]))
            if self.splits else np.zeros((0, n_parts), dtype=np.int64))
        self.empty_ref = (None if self.splits
                          else ray.put(_empty_table(ds)))

    def part_refs(self, p: int) -> list:
        """The NON-EMPTY block-slice refs of partition ``p`` (skipping
        empty slices keeps the per-round task arg lists short)."""
        nz = (np.flatnonzero(self.counts[:, p])
              if len(self.counts) else np.array([], dtype=np.int64))
        return [self.splits[b][p] for b in nz]


def split_table_by_ids(tbl, ids: np.ndarray, n_parts: int):
    """The map side of an IN-TASK exchange: sort one Arrow table by
    precomputed partition ids and slice it into ``n_parts`` zero-copy
    pieces.  Returns ``(slices, counts)``.  Shared by every iterative
    graph round task (label-propagation proposals, k-core removal
    notices, PageRank contribution partials) — fusing the split into the
    producing task is what lets the driver ship round outputs straight
    to their destination partitions without a Dataset shuffle."""
    import pyarrow as pa

    ids = np.asarray(ids, dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    tbl = tbl.take(pa.array(order))
    counts = np.bincount(ids, minlength=n_parts).astype(np.int64)
    bounds = np.concatenate(([0], np.cumsum(counts)))
    return ([tbl.slice(int(bounds[p]), int(counts[p]))
             for p in range(n_parts)], counts)


def concat_clean(parts):
    """Concat non-empty Arrow tables with schema metadata stripped
    (slices arriving from different writers carry mismatched pandas
    metadata that breaks ``pa.concat_tables``).  ``None`` when nothing
    survives."""
    import pyarrow as pa

    ts = [t.replace_schema_metadata(None) for t in parts
          if t is not None and t.num_rows]
    if not ts:
        return None
    return pa.concat_tables(ts).combine_chunks()


def hash_exchange_multi(inputs, *, n_parts: int, kernel,
                        fmt: str = "pandas",
                        kernel_kwargs: dict | None = None):
    """Co-partitioned multi-input exchange.

    ``inputs`` is a list of ``(ds, key_fn)``; every dataset is hash-split
    with its own key function into the SAME ``n_parts`` partition space,
    and ``kernel(t0, t1, ..., **kernel_kwargs)`` runs once per partition
    where the FIRST (driving) input has rows.  Non-driving inputs arrive as
    schema-bearing (possibly empty) tables.  Partitions where the driving
    input is empty produce nothing — the pattern's contract is that output
    rows are derived from input 0 (candidate pairs) with inputs 1..N as
    lookup payloads.
    """
    import pyarrow as pa
    import ray
    import ray.data

    kernel_kwargs = kernel_kwargs or {}
    split_block = _split_remote()

    @ray.remote
    def reduce_multi(sizes, *parts):
        import pyarrow as pa

        groups, i = [], 0
        for sz in sizes:
            grp = parts[i:i + sz]
            i += sz
            tables = [t for t in grp if t.num_rows] or [grp[0]]
            groups.append(pa.concat_tables(
                [t.replace_schema_metadata(None) for t in tables],
                promote_options="permissive").combine_chunks())
        datas = [g if fmt == "pyarrow" else g.to_pandas() for g in groups]
        return _to_arrow(kernel(*datas, **kernel_kwargs))

    all_splits, all_counts, empty_refs, all_ds = [], [], [], []
    for item in inputs:
        if isinstance(item, PresplitInput):
            if item.n_parts != n_parts:
                raise ValueError(
                    f"PresplitInput built for n_parts={item.n_parts}, "
                    f"exchange runs with {n_parts}")
            all_splits.append(item.splits)
            all_counts.append(item.counts)
            empty_refs.append(item.empty_ref)
            all_ds.append(item.ds)
            continue
        ds, key_fn = item
        all_ds.append(ds)
        refs = _block_refs(ds)
        splits = [split_block.options(num_returns=n_parts + 1)
                  .remote(ref, n_parts, key_fn) for ref in refs]
        counts = (np.stack(ray.get([s[n_parts] for s in splits]))
                  if splits else np.zeros((0, n_parts), dtype=np.int64))
        all_splits.append(splits)
        all_counts.append(counts)
        if splits:
            empty_refs.append(None)
        else:  # input with no blocks at all: one empty schema-bearing table
            empty_refs.append(ray.put(_empty_table(ds)))

    part_rows0 = (all_counts[0].sum(axis=0) if len(all_counts[0])
                  else np.zeros(n_parts, dtype=np.int64))

    def _empty_result():
        try:
            datas = []
            for ds in all_ds:
                empty = _empty_table(ds)
                datas.append(empty if fmt == "pyarrow" else empty.to_pandas())
            return ray.data.from_arrow(_to_arrow(kernel(*datas,
                                                        **kernel_kwargs)))
        except Exception:
            return all_ds[0].limit(0)

    if not part_rows0.any():
        return _empty_result()

    out_refs = []
    for p in np.flatnonzero(part_rows0):
        args, sizes = [], []
        for splits, counts, empty_ref in zip(all_splits, all_counts,
                                             empty_refs):
            nz = (np.flatnonzero(counts[:, p]) if len(counts)
                  else np.array([], dtype=np.int64))
            if nz.size:
                grp = [splits[b][p] for b in nz]
            elif splits:
                grp = [splits[0][p]]  # empty slice, carries the schema
            else:
                grp = [empty_ref]
            args.extend(grp)
            sizes.append(len(grp))
        out_refs.append(reduce_multi.remote(sizes, *args))

    out = ray.data.from_arrow_refs(out_refs)
    out._gtsc_exchange_keepalive = all_splits
    _KEEPALIVE.append(all_splits)
    return out
