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


# ---------- store version manifests (time-travel reads) ----------
#
# A mutating append run with ``keep_history=True`` SUPERSEDES day
# partitions instead of deleting them: the pre-append copy of every
# rewritten day moves (an O(1) rename, never a rewrite) under
# ``_history/v{N}/{tier}/day={d}`` and one manifest row records the
# action.  Store version 1 is the initial build; each history-keeping
# append increments it.  ``resolve_asof`` reconstructs any version's
# day→path mapping from the manifest alone — MVCC by supersession.

VERSION_SCHEMA = pa.schema([
    ("version", pa.int64()),
    ("tier", pa.string()),
    ("day", pa.int64()),
    ("action", pa.string()),     # 'archived' (pre-state moved) | 'created'
    ("run_id", pa.string()),
])


def history_dir(store_root: str) -> str:
    return os.path.join(store_root, "_history")


def archive_path(store_root: str, version: int, tier: str,
                 day: int) -> str:
    return os.path.join(history_dir(store_root), f"v{version}", tier,
                        f"day={day}")


def next_store_version(store_root: str) -> int:
    df = load_version_manifest(store_root)
    return (int(df["version"].max()) if len(df) else 1) + 1


def write_version_manifest(store_root: str, rows: list[dict],
                           run_id: str) -> str:
    os.makedirs(history_dir(store_root), exist_ok=True)
    df = pd.DataFrame(rows)
    df["run_id"] = run_id
    table = pa.Table.from_pandas(df, preserve_index=False).select(
        [f.name for f in VERSION_SCHEMA]).cast(VERSION_SCHEMA)
    ver = int(df["version"].iloc[0])
    path = os.path.join(history_dir(store_root),
                        f"manifest-v{ver}.parquet")
    pq.write_table(table, path)
    return path


def load_version_manifest(store_root: str) -> pd.DataFrame:
    d = history_dir(store_root)
    cols = [f.name for f in VERSION_SCHEMA]
    if not os.path.isdir(d):
        return pd.DataFrame(columns=cols)
    parts = [pq.read_table(os.path.join(d, f)).to_pandas()
             for f in sorted(os.listdir(d))
             if f.startswith("manifest-") and f.endswith(".parquet")]
    if not parts:
        return pd.DataFrame(columns=cols)
    return pd.concat(parts, ignore_index=True)


def floor_path(store_root: str) -> str:
    return os.path.join(history_dir(store_root), "floor")


def vacuum_floor(store_root: str) -> int:
    """Lowest store version still resolvable after vacuums (1 if no
    vacuum ever ran)."""
    p = floor_path(store_root)
    if not os.path.isfile(p):
        return 1
    with open(p) as fh:
        return int(fh.read().strip())


def resolve_asof(store_root: str, version: int, tier: str) -> list[str]:
    """Day-partition paths composing ``tier`` AS OF store ``version``:
    current day dirs, minus days created after ``version``, with days
    archived after ``version`` substituted by their EARLIEST archived
    copy (= the state they had at ``version``).

    Raises for versions below the vacuum floor: their archived day dirs
    AND their 'created' manifest rows are gone, so the reconstruction
    would silently include later-created days (wrong data) instead of
    the correct historical set."""
    if version < vacuum_floor(store_root):
        raise ValueError(
            f"store version {version} is below the vacuum floor "
            f"{vacuum_floor(store_root)} — history was vacuumed; "
            "as-of reads this old are unresolvable")
    man = load_version_manifest(store_root)
    later = man.loc[(man["tier"] == tier) & (man["version"] > version)]
    created_after = set(later.loc[later["action"] == "created", "day"]
                        .astype(int))
    arch = later.loc[later["action"] == "archived"]
    subst = (arch.groupby("day")["version"].min().astype(int).to_dict()
             if len(arch) else {})
    tier_dir = os.path.join(store_root, tier)
    paths = []
    if os.path.isdir(tier_dir):
        for name in sorted(os.listdir(tier_dir)):
            if not name.startswith("day="):
                continue
            day = int(name.split("=", 1)[1])
            if day in created_after or day in subst:
                continue
            paths.append(os.path.join(tier_dir, name))
    for day, ver in sorted(subst.items()):
        if day in created_after:
            continue
        paths.append(archive_path(store_root, ver, tier, day))
    return paths


def vacuum_history(store_root: str, keep_from_version: int) -> dict:
    """Drop archived store versions OLDER than ``keep_from_version``:
    as-of reads below the cut become unresolvable (their day dirs and
    manifest rows are deleted); reads at or above it are untouched.
    Metadata-only — current tier data never moves.  Returns what was
    reclaimed."""
    import shutil

    d = history_dir(store_root)
    dropped_dirs, dropped_manifests, freed = 0, 0, 0
    if not os.path.isdir(d):
        return {"dropped_versions": 0, "freed_bytes": 0}
    versions = set()
    for name in sorted(os.listdir(d)):
        ver = None
        if name.startswith("v") and name[1:].isdigit():
            ver = int(name[1:])
        elif name.startswith("manifest-v") and name.endswith(".parquet"):
            ver = int(name[len("manifest-v"):-len(".parquet")])
        if ver is None or ver >= keep_from_version:
            continue
        path = os.path.join(d, name)
        if os.path.isdir(path):
            freed += sum(os.path.getsize(os.path.join(r, f))
                         for r, _, fs in os.walk(path) for f in fs)
            shutil.rmtree(path)
            dropped_dirs += 1
        else:
            os.remove(path)
            dropped_manifests += 1
        versions.add(ver)
    # Record the floor so resolve_asof can REFUSE versions whose
    # manifest rows were just deleted (their 'created' rows are gone —
    # a reconstruction below the floor would include wrong days).
    if versions:
        new_floor = max(vacuum_floor(store_root), keep_from_version)
        with open(floor_path(store_root), "w") as fh:
            fh.write(str(new_floor))
    return {"dropped_versions": len(versions), "freed_bytes": int(freed)}
