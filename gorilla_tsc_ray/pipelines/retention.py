"""Retention / downsampling job over the materialized store.

The tier cascade (raw day-blocks → 1m → 1h → 1d) makes retention a pure
metadata + file operation: expired fine-tier day partitions are deleted
only after verifying the coarser tier covering that day is materialized
(the cascade never re-reads raw turns, so dropping raw blocks loses nothing
the policy wants kept).  Deterministic ``now_ms`` is an explicit argument —
no wall clock — so runs are reproducible and testable.

Emits one metrics row per partition examined (deleted or kept, with the
reason), appended to the store's lineage sidecar.
"""

from __future__ import annotations

import os
import shutil

import pandas as pd

from ..state.lineage import new_run_id, write_lineage

DAY_MS = 86_400_000

# tier name → (store subdir, coarser tier that must exist before delete)
TIER_LAYOUT = {
    "blocks": ("blocks", "rollup_1m"),
    "rollup_1m": ("rollup_1m", "rollup_1h"),
    "rollup_1h": ("rollup_1h", "rollup_1d"),
    "rollup_1d": ("rollup_1d", None),
}


def _day_partitions(tier_dir: str) -> dict[int, str]:
    """day_ms → partition directory (hive-style ``day=<ms>`` layout)."""
    out = {}
    if not os.path.isdir(tier_dir):
        return out
    for name in os.listdir(tier_dir):
        if name.startswith("day="):
            try:
                out[int(float(name.split("=", 1)[1]))] = os.path.join(tier_dir, name)
            except ValueError:
                continue
    return out


def _dir_bytes(path: str) -> int:
    total = 0
    for root, _, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def apply_retention(store_root: str, policy_days: dict[str, int],
                    now_ms: int, dry_run: bool = False) -> pd.DataFrame:
    """Apply a retention policy: ``policy_days[tier]`` = keep partitions
    whose day is within that many days of ``now_ms``.

    Returns the per-partition metrics frame (also persisted to lineage).
    """
    run_id = new_run_id()
    records = []
    for tier, keep_days in policy_days.items():
        subdir, coarser = TIER_LAYOUT[tier]
        tier_dir = os.path.join(store_root, subdir)
        coarser_parts = (_day_partitions(os.path.join(store_root, TIER_LAYOUT[coarser][0]))
                         if coarser else {})
        cutoff = now_ms - keep_days * DAY_MS
        for day_ms, pdir in sorted(_day_partitions(tier_dir).items()):
            expired = day_ms < cutoff - (cutoff % DAY_MS)
            if not expired:
                status = "kept"
            elif coarser and day_ms not in coarser_parts:
                status = "kept_no_coarser_tier"
            else:
                status = "deleted" if not dry_run else "would_delete"
            nbytes = _dir_bytes(pdir)
            if status == "deleted":
                shutil.rmtree(pdir)
            records.append({
                "partition_key": f"{tier}/day={day_ms}",
                "input_files": [pdir],
                "rows_in": 0, "rows_out": 0,
                "bytes_payload": nbytes,
                "watermark": day_ms,
                "status": status,
            })
    df = pd.DataFrame(records)
    if len(df):
        write_lineage(store_root, records, run_id)
    return df
