"""Deterministic synthetic multi-turn conversation transcripts.

The engine's primary input table (BASELINE.json input_hint):
``conv_id: string, turn_idx: int32, role: string, text: string,
tool: string, ts: timestamp[ms]``.  No external data: tables are
synthesised exactly per FIXTURES.md §1 (seed=42, fixed epoch
T0 = 1500400800000 ms — the willItBlend block timestamp,
``EncodeGorillaTest.java:68``), with conversation lengths drawn from a
clipped Zipf so a few conversations are very long (the skew the north rule's
salting requirement targets), and 5% of rows duplicated verbatim into a
second Parquet file to exercise exact dedup on (conv_id, turn_idx).

Generation is fully vectorized and cached under /tmp keyed by scale tag;
the cache directory is written atomically (tmp dir + rename) so concurrent
callers race safely.
"""

from __future__ import annotations

import os
import shutil
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

T0 = 1_500_400_800_000  # 2017-07-18T18:00:00Z
SEED = 42
MAX_TURNS = 20_000
CACHE_ROOT = "/tmp/gorilla_tsc_ray_cache"

TRANSCRIPT_SCHEMA = pa.schema([
    ("conv_id", pa.string()),
    ("turn_idx", pa.int32()),
    ("role", pa.string()),
    ("text", pa.string()),
    ("tool", pa.string()),
    ("ts", pa.timestamp("ms")),
])


def n_convs_for_sf_dir(sf_dir: str) -> int:
    """50 convs at sf0.001, 500 at sf0.01, 5000 at sf0.1 (FIXTURES.md §1)."""
    base = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(base.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(10, int(round(sf * 50_000)))


def generate_transcripts(n_convs: int, seed: int = SEED) -> pa.Table:
    """Build the full transcripts table (including flagging nothing — the
    duplicate rows are selected by the caller)."""
    rng = np.random.default_rng(seed)
    lengths = np.clip(rng.zipf(1.5, n_convs), 2, MAX_TURNS).astype(np.int64)
    n = int(lengths.sum())
    conv_ord = np.repeat(np.arange(n_convs), lengths)

    # per-conv turn_idx: global arange minus each conv's start offset
    starts = np.concatenate(([0], np.cumsum(lengths)[:-1]))
    turn_idx = (np.arange(n) - np.repeat(starts, lengths)).astype(np.int32)

    # roles: cycle user/assistant, every 7th turn is a tool turn
    base_role = np.where(turn_idx % 2 == 0, "user", "assistant")
    is_tool = turn_idx % 7 == 6
    role = np.where(is_tool, "tool", base_role)
    tool_names = np.array(["search", "exec", "browse"])
    tool = np.where(is_tool, tool_names[rng.integers(0, 3, n)], "")

    # timestamps: per-conv start in [T0, T0+1d), lognormal gaps (ms)
    conv_start = T0 + rng.integers(0, 86_400_000, n_convs)
    gaps = np.maximum(1, np.round(rng.lognormal(np.log(8000), 1.0, n))).astype(np.int64)
    gaps[starts] = conv_start  # absolute value at each conv's first turn
    cs = np.cumsum(gaps)
    ts = cs - np.repeat(cs[starts] - gaps[starts], lengths)

    # text: deterministic `conv:turn:` prefix + variable x-padding.
    # (Python-level join, NOT np.char: fixed-width U-dtype intermediates
    # would be ~1.6 KB/row and page-fault for minutes at millions of rows.)
    pad = rng.integers(0, 400, n)
    conv_names = [f"conv-{i:08d}" for i in range(n_convs)]
    xs = ["x" * k for k in range(400)]
    conv_ids = np.array(conv_names, dtype=object)[conv_ord]
    text = np.array(
        [f"{c}:{t}:{xs[p]}" for c, t, p in
         zip(conv_ids.tolist(), turn_idx.tolist(), pad.tolist())],
        dtype=object)

    return pa.table({
        "conv_id": pa.array(conv_ids),
        "turn_idx": pa.array(turn_idx, pa.int32()),
        "role": pa.array(role.astype(object), pa.string()),
        "text": pa.array(text),
        "tool": pa.array(tool.astype(object), pa.string()),
        "ts": pa.array(ts, pa.timestamp("ms")),
    }).cast(TRANSCRIPT_SCHEMA)


def transcripts_dir(sf_dir: str) -> str:
    """Materialize (cached) the transcript Parquet dataset for a scale dir;
    returns the directory containing part files.

    Layout: ``part-000.parquet`` (full table, row-group-sized for parallel
    reads) + ``part-dup.parquet`` (5% verbatim duplicates).
    """
    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(CACHE_ROOT, f"transcripts_{tag}")
    if os.path.isdir(out_dir) and os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir

    table = generate_transcripts(n_convs_for_sf_dir(sf_dir))
    rng = np.random.default_rng(SEED + 1)
    dup_idx = rng.choice(len(table), max(1, len(table) // 20), replace=False)
    # boolean-mask filter, not take(): take concatenates chunks and blows
    # the 32-bit string-offset limit on multi-million-row tables
    mask = np.zeros(len(table), dtype=bool)
    mask[dup_idx] = True
    dup = table.filter(pa.array(mask))

    tmp = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    # shard into multiple part files (whole conversations per shard) so the
    # Parquet read parallelizes — one file would serialize the scan
    n_shards = max(1, min(32, table.num_rows // 40_000))
    cuts = np.linspace(0, table.num_rows, n_shards + 1).astype(np.int64)
    for i in range(n_shards):
        pq.write_table(table.slice(cuts[i], cuts[i + 1] - cuts[i]),
                       os.path.join(tmp, f"part-{i:03d}.parquet"),
                       row_group_size=64_000)
    pq.write_table(dup, os.path.join(tmp, "part-dup.parquet"))
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    try:
        os.rename(tmp, out_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # another process won the race
    return out_dir
