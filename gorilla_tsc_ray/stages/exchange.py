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

The result is a materialized Dataset (a shuffle is a pipeline barrier
anyway).  Partitioning assumption — same as ``map_groups``: one partition's
rows fit one reduce task; size ``n_parts`` accordingly and salt hot keys
into the partition id (see ``pipelines/events.py`` day-index salting).

This is the documented "raw Ray as a last resort" seam: everything above
and below it stays on the Dataset API.
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def _to_arrow(out):
    import pyarrow as pa

    if isinstance(out, pd.DataFrame):
        return pa.Table.from_pandas(out, preserve_index=False)
    return out


def hash_exchange(ds, *, key_fn, n_parts: int, kernel, fmt: str = "pandas",
                  kernel_kwargs: dict | None = None):
    """``ds`` → Dataset of per-partition kernel outputs.

    ``key_fn(table) -> int64 ndarray`` assigns each row a partition in
    ``[0, n_parts)`` (runs inside map tasks; must be deterministic).
    ``kernel`` receives one whole partition as a pa.Table (``fmt=
    "pyarrow"``) or DataFrame and returns either.
    """
    import ray
    import ray.data

    kernel_kwargs = kernel_kwargs or {}

    @ray.remote
    def split_block(block, n_parts):
        import pyarrow as pa

        tbl = (pa.Table.from_pandas(block, preserve_index=False)
               if isinstance(block, pd.DataFrame) else block)
        if tbl.num_rows == 0:  # empty block (e.g. a filter that drops all)
            return (*([tbl] * n_parts),
                    np.zeros(n_parts, dtype=np.int64))
        ids = np.asarray(key_fn(tbl), dtype=np.int64)
        order = np.argsort(ids, kind="stable")
        tbl = tbl.take(pa.array(order))  # block-sized take: safe
        counts = np.bincount(ids, minlength=n_parts).astype(np.int64)
        bounds = np.concatenate(([0], np.cumsum(counts)))
        parts = [tbl.slice(int(bounds[p]), int(counts[p]))
                 for p in range(n_parts)]
        return (*parts, counts)

    @ray.remote
    def reduce_part(*parts):
        import pyarrow as pa

        tables = [p for p in parts if p.num_rows]
        # strip pandas schema metadata: blocks from different upstream
        # tasks can carry conflicting pandas-dtype annotations that make
        # to_pandas raise after concat (the embedding/sig list columns)
        merged = pa.concat_tables(
            t.replace_schema_metadata(None) for t in tables).combine_chunks()
        data = merged if fmt == "pyarrow" else merged.to_pandas()
        return _to_arrow(kernel(data, **kernel_kwargs))

    def _empty_result():
        # run the kernel once on an empty input so the result carries the
        # KERNEL's output schema, not the input's
        import pyarrow as pa

        try:
            schema = ds.schema().base_schema
            empty = pa.table({f.name: pa.array([], f.type)
                              for f in schema})
            data = empty if fmt == "pyarrow" else empty.to_pandas()
            out = _to_arrow(kernel(data, **kernel_kwargs))
            return ray.data.from_arrow(out)
        except Exception:
            return ds.limit(0)

    block_refs = [ref for bundle in ds.iter_internal_ref_bundles()
                  for ref in bundle.block_refs]
    if not block_refs:
        return _empty_result()

    splits = [split_block.options(num_returns=n_parts + 1)
              .remote(ref, n_parts) for ref in block_refs]
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
            return ray.data.from_arrow(
                _to_arrow(kernel(data, **kernel_kwargs)))
        except Exception:
            return _empty_result()
    out = ray.data.from_arrow_refs(out_refs)
    # pin the split outputs for the dataset's lifetime: if a reduce block
    # is evicted later, Ray reconstructs it from these inputs — without the
    # pin they are released when this function returns and reconstruction
    # fails with object-lost errors under memory pressure
    out._gtsc_exchange_keepalive = splits
    return out
