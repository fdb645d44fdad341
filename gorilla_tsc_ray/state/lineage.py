"""Per-partition lineage + checkpoint/resume bookkeeping.

Every materializing run emits one lineage row per partition key
(schema per FIXTURES.md §4): ``run_id, partition_key, input_files,
rows_in, rows_out, bytes_payload, watermark, status`` written as a Parquet
sidecar under ``<store>/_lineage/``.  A resumed run loads the sidecar and
prunes completed partition keys from the input *before* the shuffle, so
finished partitions are never recomputed (Ray's task retries cover
in-flight failures; the sidecar covers driver death).
"""

from __future__ import annotations

import os
import uuid

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

LINEAGE_SCHEMA = pa.schema([
    ("run_id", pa.string()),
    ("partition_key", pa.string()),
    ("input_files", pa.list_(pa.string())),
    ("rows_in", pa.int64()),
    ("rows_out", pa.int64()),
    ("bytes_payload", pa.int64()),
    ("watermark", pa.int64()),
    ("status", pa.string()),
])


def new_run_id() -> str:
    return uuid.uuid4().hex[:12]


def lineage_dir(store_root: str) -> str:
    return os.path.join(store_root, "_lineage")


def write_lineage(store_root: str, rows: list[dict], run_id: str) -> str:
    os.makedirs(lineage_dir(store_root), exist_ok=True)
    df = pd.DataFrame(rows)
    df["run_id"] = run_id
    table = pa.Table.from_pandas(df, preserve_index=False).select(
        [f.name for f in LINEAGE_SCHEMA]).cast(LINEAGE_SCHEMA)
    path = os.path.join(lineage_dir(store_root), f"lineage-{run_id}.parquet")
    pq.write_table(table, path)
    return path


def load_lineage(store_root: str) -> pd.DataFrame:
    d = lineage_dir(store_root)
    if not os.path.isdir(d):
        return pd.DataFrame(columns=[f.name for f in LINEAGE_SCHEMA])
    parts = [pq.read_table(os.path.join(d, f)).to_pandas()
             for f in sorted(os.listdir(d)) if f.endswith(".parquet")]
    if not parts:
        return pd.DataFrame(columns=[f.name for f in LINEAGE_SCHEMA])
    return pd.concat(parts, ignore_index=True)


def completed_partitions(store_root: str) -> set[str]:
    df = load_lineage(store_root)
    return set(df.loc[df["status"] == "complete", "partition_key"])


def partition_key_for_day(day_ms: int) -> str:
    return f"day={day_ms}"
