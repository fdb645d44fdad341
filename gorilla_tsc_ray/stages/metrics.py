"""Per-conversation metric derivation (the engine's map/parse stage).

The reference has no per-record operators (SURVEY.md §2b) — this stage is
the engine-level front door: each transcript turn yields long-format metric
points ``(conv_id, ts_ms, metric, value)``:

- ``turn_count``   = 1 per turn
- ``text_len``     = len(text)
- ``tool_call``    = 1.0 if tool != '' else 0.0
- ``turn_gap_ms``  = ts - lag(ts) within the conversation (first turn emits
                     no point — a gap is an *absent* point in the Gorilla
                     data model, SURVEY.md §1.1)

Exact duplicate turns (replayed input on resume) are dropped on
``(conv_id, turn_idx)`` keep-first *inside the same grouped pass* — the
dedup shares the conv_id shuffle instead of adding one (SURVEY.md §2b
"Set ops / dedup").  Group size is bounded because conversation length is
clipped upstream; the rollup that follows uses partial+final aggregation so
no salting is required for the aggregate shuffle itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

METRICS = ["turn_count", "text_len", "tool_call", "turn_gap_ms"]


def dedup_sort_conv(df: pd.DataFrame) -> pd.DataFrame:
    """Stable (ts, turn_idx) order + keep-first dedup on turn_idx for ONE
    conversation."""
    df = df.sort_values(["turn_idx", "ts_ms"], kind="stable")
    keep = np.concatenate(([True], np.diff(df["turn_idx"].to_numpy()) > 0))
    return df[keep]


def derive_metrics_group(df: pd.DataFrame) -> pd.DataFrame:
    """map_groups UDF: ONE conversation → long-format metric points."""
    df = dedup_sort_conv(df)
    n = len(df)
    conv = df["conv_id"].iloc[0]
    ts = df["ts_ms"].to_numpy()
    text_len = df["text"].str.len().to_numpy().astype(np.float64)
    tool_call = (df["tool"].to_numpy() != "").astype(np.float64)

    parts = [
        pd.DataFrame({"ts_ms": ts, "metric": "turn_count",
                      "value": np.ones(n)}),
        pd.DataFrame({"ts_ms": ts, "metric": "text_len", "value": text_len}),
        pd.DataFrame({"ts_ms": ts, "metric": "tool_call", "value": tool_call}),
    ]
    if n > 1:
        parts.append(pd.DataFrame({
            "ts_ms": ts[1:], "metric": "turn_gap_ms",
            "value": np.diff(ts).astype(np.float64)}))
    out = pd.concat(parts, ignore_index=True)
    out.insert(0, "conv_id", conv)
    return out


def canonical_turns_group(df: pd.DataFrame) -> pd.DataFrame:
    """map_groups UDF: deduplicated, stably-ordered turns for ONE
    conversation — the per-turn text-equality invariant surface."""
    df = dedup_sort_conv(df)
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts_ms"]]


# ---- partition-level kernels ----------------------------------------------
# One hash partition holds MANY whole conversations; these kernels process
# the partition in a handful of vectorized numpy/pandas operations instead
# of one Python call per conversation (which costs ~5 ms/conv — milliseconds
# × 10^8 conversations at design scale).

def _dedup_sort_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Stable (conv_id, turn_idx, ts) order + keep-first dedup on
    (conv_id, turn_idx) across a whole partition."""
    order = np.lexsort((df["ts_ms"].to_numpy(),
                        df["turn_idx"].to_numpy(),
                        df["conv_id"].to_numpy()))
    df = df.iloc[order]
    conv = df["conv_id"].to_numpy()
    tidx = df["turn_idx"].to_numpy()
    same = np.concatenate(([False],
                           (conv[1:] == conv[:-1]) & (tidx[1:] == tidx[:-1])))
    return df[~same]


def derive_metrics_partition(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized dedup + metric derivation for a whole hash partition of
    conversations (same semantics as :func:`derive_metrics_group` applied
    per conversation).

    Accepts either a raw ``text`` column or a pre-computed ``text_len``
    (computed before the shuffle so full text never rides it)."""
    df = _dedup_sort_partition(df)
    n = len(df)
    if n == 0:
        return pd.DataFrame({"conv_id": [], "ts_ms": [], "metric": [],
                             "value": []})
    conv = df["conv_id"].to_numpy()
    ts = df["ts_ms"].to_numpy()
    if "text_len" in df.columns:
        text_len = df["text_len"].to_numpy().astype(np.float64)
    else:
        text_len = df["text"].str.len().to_numpy().astype(np.float64)
    if "tool_call" in df.columns:
        tool_call = df["tool_call"].to_numpy().astype(np.float64)
    else:
        tool_call = (df["tool"].to_numpy() != "").astype(np.float64)
    # gaps: diff within conversation (first turn of each conv emits nothing)
    same_conv = np.concatenate(([False], conv[1:] == conv[:-1]))
    gaps = np.empty(n, dtype=np.float64)
    gaps[0] = np.nan
    gaps[1:] = np.diff(ts).astype(np.float64)
    parts = [
        pd.DataFrame({"conv_id": conv, "ts_ms": ts, "metric": "turn_count",
                      "value": np.ones(n)}),
        pd.DataFrame({"conv_id": conv, "ts_ms": ts, "metric": "text_len",
                      "value": text_len}),
        pd.DataFrame({"conv_id": conv, "ts_ms": ts, "metric": "tool_call",
                      "value": tool_call}),
        pd.DataFrame({"conv_id": conv[same_conv], "ts_ms": ts[same_conv],
                      "metric": "turn_gap_ms", "value": gaps[same_conv]}),
    ]
    return pd.concat(parts, ignore_index=True)


def canonical_turns_partition(df: pd.DataFrame) -> pd.DataFrame:
    return _dedup_sort_partition(df)[
        ["conv_id", "turn_idx", "role", "text", "tool", "ts_ms"]]
