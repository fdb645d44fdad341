"""Format-autodetecting table source.

The reference is a codec library with no file formats at all; the engine's
canonical lake format is Parquet (column-pruned, row-group-predicate
reads).  Real ingestion feeds arrive as CSV / JSONL exports too, so the
same pipelines accept ``<name>.parquet`` > ``<name>.csv`` > ``<name>.jsonl``
(first match wins).  Non-parquet formats are an interchange convenience:
they cannot prune columns at the scan (the whole row must be parsed), so
the requested projection is applied immediately after the read and a
schema normalization step casts columns to the canonical types (CSV/JSON
readers infer e.g. second- or string-typed timestamps).
"""

from __future__ import annotations

import os


def read_table_auto(base: str, name: str, *, columns: list[str] | None = None,
                    override_num_blocks: int | None = None,
                    cast: dict | None = None):
    """``{base}/{name}.{parquet|csv|jsonl}`` → Ray Dataset.

    ``columns``: projection — pushed into the parquet scan, applied
    post-read for CSV/JSONL.  ``cast``: {column: pyarrow type} applied
    after non-parquet reads (parquet files already carry canonical types).
    """
    import ray.data

    pq_path = f"{base.rstrip('/')}/{name}.parquet"
    if os.path.exists(pq_path):
        return ray.data.read_parquet(pq_path, columns=columns,
                                     override_num_blocks=override_num_blocks)

    csv_path = f"{base.rstrip('/')}/{name}.csv"
    jsonl_path = f"{base.rstrip('/')}/{name}.jsonl"
    if os.path.exists(csv_path):
        ds = ray.data.read_csv(csv_path,
                               override_num_blocks=override_num_blocks)
    elif os.path.exists(jsonl_path):
        ds = ray.data.read_json(jsonl_path,
                                override_num_blocks=override_num_blocks)
    else:
        raise FileNotFoundError(
            f"no {name}.parquet/.csv/.jsonl under {base}")
    if columns:
        ds = ds.select_columns(columns)
    if cast:
        def normalize(batch):
            import pyarrow.compute as pc

            for col, typ in cast.items():
                if col in batch.column_names and batch.schema.field(
                        col).type != typ:
                    i = batch.column_names.index(col)
                    batch = batch.set_column(
                        i, col, pc.cast(batch[col], typ))
            return batch

        ds = ds.map_batches(normalize, batch_format="pyarrow")
    return ds
