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


BUCKET_MARKER = "_BUCKETED_BY"


def _n_buckets(n_rows: int) -> int:
    """Bucket-count heuristic: ~90k turns (~18 MB) per bucket, floor 32 so
    a 32-core node always has full map parallelism, cap 512 (block count ≈
    a small multiple of partition count — hundreds of tiny blocks drown the
    scheduler in per-task overhead)."""
    return int(np.clip(n_rows // 90_000, 32, 512))


def transcripts_dir(sf_dir: str) -> str:
    """Materialize (cached) the transcript Parquet dataset for a scale dir;
    returns the directory containing part files.

    Layout: conv-hash-BUCKETED part files (``part-<b>.parquet`` holds every
    turn — including the 5% verbatim duplicate rows — of the conversations
    with ``conv_index % n_buckets == b``), plus a ``_BUCKETED_BY`` marker
    recording the bucketing contract.  A bucketed layout is how a real
    100 TB transcript lake would be written (upstream writers cluster by
    conversation), and it lets the ingest pipelines run shuffle-free:
    every bucket file is a self-contained conv partition, so dedup /
    derive / rollup / encode are all file-local map work
    (``pipelines/ingest.py`` falls back to the conv-hash shuffle for
    inputs without the marker).
    """
    tag = os.path.basename(os.path.normpath(sf_dir))
    out_dir = os.path.join(CACHE_ROOT, f"transcripts_{tag}")
    if os.path.isdir(out_dir) and os.path.exists(os.path.join(out_dir, "_SUCCESS")):
        return out_dir

    n_convs = n_convs_for_sf_dir(sf_dir)
    table = generate_transcripts(n_convs)
    rng = np.random.default_rng(SEED + 1)
    dup_idx = rng.choice(len(table), max(1, len(table) // 20), replace=False)
    dup_mask = np.zeros(len(table), dtype=bool)
    dup_mask[dup_idx] = True

    # conv index per row (re-derived from the deterministic layout: rows are
    # written conv-contiguous by generate_transcripts)
    conv_change = np.empty(len(table), dtype=bool)
    tidx = table["turn_idx"].to_numpy()
    conv_change[0] = True
    conv_change[1:] = tidx[1:] <= tidx[:-1]
    conv_ord = np.cumsum(conv_change) - 1

    tmp = f"{out_dir}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(tmp, exist_ok=True)
    nb = _n_buckets(table.num_rows)
    # buckets are CONTIGUOUS conv ranges cut at conv boundaries nearest to
    # equal row counts: each bucket is a zero-copy table.slice (a per-bucket
    # boolean filter over the whole table would be O(nb · n) — minutes at
    # tens of millions of rows)
    conv_starts = np.flatnonzero(conv_change)
    targets = (np.arange(1, nb) * len(table)) // nb
    cut_rows = conv_starts[np.searchsorted(conv_starts, targets)]
    bounds = np.unique(np.concatenate(([0], cut_rows, [len(table)])))
    for b in range(len(bounds) - 1):
        r0, r1 = int(bounds[b]), int(bounds[b + 1])
        part = table.slice(r0, r1 - r0)
        local_dups = np.flatnonzero(dup_mask[r0:r1])
        dmask = np.zeros(r1 - r0, dtype=bool)
        dmask[local_dups] = True
        dup_part = part.filter(pa.array(dmask))  # verbatim copies
        out = pa.concat_tables([part, dup_part])
        # write each bucket SORTED by (conv, turn_idx, ts): a sorted lake
        # layout lets the ingest kernels skip their lexsort+gather pass
        # (detected, with a full-sort fallback for unsorted inputs)
        codes, _ = __import__("pandas").factorize(
            out["conv_id"].to_pandas(), sort=True)
        order = np.lexsort((out["ts"].to_numpy().view(np.int64),
                            out["turn_idx"].to_numpy(), codes))
        out = out.take(pa.array(order))  # bucket-sized: take is safe here
        # materialized derived columns (standard lake practice: lightweight
        # stats columns next to the payload) — the metric pipelines then
        # never read the text bytes at all, which at this host's serialized
        # page-fault wall is the difference between reading ~2 GB and
        # ~200 MB per sf1 pass
        import pyarrow.compute as pc
        # float32: both stats are integer-valued and < 2^24, so f32 is
        # exact and halves the bytes every metric pass reads
        out = (out.append_column(
                   "text_len", pc.cast(pc.utf8_length(out["text"]),
                                       "float32"))
               .append_column(
                   "tool_call", pc.cast(pc.not_equal(out["tool"], ""),
                                        "float32")))
        pq.write_table(out, os.path.join(tmp, f"part-{b:03d}.parquet"),
                       row_group_size=64_000)
    with open(os.path.join(tmp, BUCKET_MARKER), "w") as f:
        f.write(f"conv_id:{nb}\n")
    open(os.path.join(tmp, "_SUCCESS"), "w").close()
    try:
        os.rename(tmp, out_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # another process won the race
    return out_dir


def bucketed_files(path: str) -> list[str] | None:
    """If ``path`` carries the conv-bucket marker, return its bucket part
    files (each holds only whole conversations); else ``None`` — callers
    must then treat conversations as scattered and shuffle."""
    if not os.path.exists(os.path.join(path, BUCKET_MARKER)):
        return None
    return sorted(os.path.join(path, f) for f in os.listdir(path)
                  if f.endswith(".parquet"))
