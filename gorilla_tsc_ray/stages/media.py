"""Multimodal-column plumbing (image/audio/video as opaque binary).

The decode step itself is STUBBED: the real image/audio libraries are not in
this container, so ``RealDecoder`` raises ``NotImplementedError`` and the
default ``FakeDecoder`` derives deterministic pseudo-features from the raw
bytes.  Everything around it — binary column schema, actor-pool stage shape,
small batch sizing for large payloads, typed metadata output — is the real
Ray-side plumbing and is tested.

At scale: binary payloads are large, so the stage runs with small
``batch_size`` (payload × batch × concurrency must fit worker heap) and as
an actor pool so model/codec initialisation happens once per actor.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),          # image | audio | video
    ("payload", pa.large_binary()),  # opaque encoded bytes
    ("meta_width", pa.int32()),      # typed metadata travels beside payload
    ("meta_height", pa.int32()),
])


def synthesize_media_table(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake media rows (no external data): payload bytes are
    seeded random, metadata consistent."""
    rng = np.random.default_rng(seed)
    kinds = np.array(["image", "audio", "video"])[rng.integers(0, 3, n)]
    sizes = rng.integers(200, 4000, n)
    payloads = [rng.integers(0, 256, s, dtype=np.uint8).tobytes() for s in sizes]
    w = rng.integers(16, 512, n).astype(np.int32)
    h = rng.integers(16, 512, n).astype(np.int32)
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array(kinds.astype(object), pa.string()),
        "payload": pa.array(payloads, pa.large_binary()),
        "meta_width": pa.array(w, pa.int32()),
        "meta_height": pa.array(h, pa.int32()),
    })


class RealDecoder:
    """Where a real decoder would load its codec/model once per actor."""

    def __init__(self) -> None:
        raise NotImplementedError(
            "image/audio codecs are not available in this environment; "
            "use FakeDecoder (deterministic) — the Ray plumbing is identical")


class FakeDecoder:
    """Actor-pool stage: deterministic pseudo 'decode + feature extract'.

    __init__ = once-per-actor setup (stands in for model load);
    __call__ = per-batch vectorized feature derivation from raw bytes.
    """

    def __init__(self, n_features: int = 8) -> None:
        self.n_features = n_features

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        n = len(df)
        feats = np.empty((n, self.n_features), dtype=np.float64)
        sizes = np.empty(n, dtype=np.int64)
        digests = []
        for i, payload in enumerate(df["payload"]):
            b = np.frombuffer(payload, dtype=np.uint8)
            sizes[i] = len(b)
            # deterministic "features": byte-histogram moments
            hist = np.bincount(b, minlength=256).astype(np.float64)
            hist /= max(1, len(b))
            feats[i] = [
                hist.mean(), hist.std(), hist.max(),
                float(b.mean()) / 255.0, float(b.std()) / 255.0,
                float(b[:16].sum()), float(b[-16:].sum()),
                float(len(b) % 251),
            ][: self.n_features]
            digests.append(hashlib.md5(payload).hexdigest())
        out = pd.DataFrame({
            "media_id": df["media_id"].to_numpy(),
            "kind": df["kind"].to_numpy(),
            "n_bytes": sizes,
            "digest": digests,
            "aspect": np.round(df["meta_width"].to_numpy()
                               / np.maximum(df["meta_height"].to_numpy(), 1), 6),
        })
        for j in range(self.n_features):
            out[f"f{j}"] = np.round(feats[:, j], 6)
        return out


def frame_sample_plan(df: pd.DataFrame, *, every_n: int = 10) -> pd.DataFrame:
    """Video 'frame sampling' plumbing: expand each video row into frame
    descriptors (no actual decode — indices + deterministic offsets)."""
    vids = df[df["kind"] == "video"]
    out_id, out_frame, out_off = [], [], []
    for mid, payload in zip(vids["media_id"], vids["payload"]):
        n_frames = max(1, len(payload) // 100)
        idx = np.arange(0, n_frames, every_n, dtype=np.int64)
        out_id.append(np.full(len(idx), mid, dtype=np.int64))
        out_frame.append(idx)
        out_off.append(idx * 100)
    if not out_id:
        return pd.DataFrame({"media_id": np.array([], dtype=np.int64),
                             "frame_idx": np.array([], dtype=np.int64),
                             "byte_offset": np.array([], dtype=np.int64)})
    return pd.DataFrame({
        "media_id": np.concatenate(out_id),
        "frame_idx": np.concatenate(out_frame),
        "byte_offset": np.concatenate(out_off),
    })
