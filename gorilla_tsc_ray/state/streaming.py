"""Streaming ingest: actor pool holding open Gorilla blocks + watermarks.

Batch-mode encode uses ``groupby(...).map_groups`` (Dataset API).  True
streaming append — an unbounded source with late data — is one of the few
things the Dataset API can't express, so this module drops to raw Ray
actors (the documented last resort, SURVEY.md §2b "custom operators"):

- ``StreamingBlockEncoder`` actors each own a disjoint hash partition of
  series keys.  Per (key, metric, block_start) they hold an open
  ``GorillaCompressor`` (mid-stream snapshots are legal — the reference's
  ``getLongArray`` works without ``close()``, ``LongArrayOutput.java:141-145``,
  test ``EncodeGorillaTest.java:484-500``) plus a per-partition watermark.
- Points older than the partition watermark are rejected to a late-data
  side count instead of corrupting a sealed stream (the format forbids
  out-of-order appends, ``README.adoc:150``).
- ``snapshot()`` returns decodable open-block payloads → checkpointing;
  ``seal()`` closes blocks and emits final rows.

The router hash-partitions on the series key so a series always lands on
the same actor — the partitioning assumption this operator relies on.
"""

from __future__ import annotations

import zlib

import numpy as np

from ..codec import GorillaCompressor, words_to_bytes

DAY_MS = 86_400_000


def _hash_key(key: str) -> int:
    return zlib.crc32(key.encode())


class _EncoderCore:
    """Plain-Python core (testable without Ray); the Ray actor wraps it."""

    def __init__(self, block_span_ms: int = DAY_MS,
                 allowed_lateness_ms: int = 0) -> None:
        self.block_span_ms = block_span_ms
        self.allowed_lateness_ms = allowed_lateness_ms
        self.open: dict[tuple, GorillaCompressor] = {}
        self.meta: dict[tuple, dict] = {}
        self.watermark: dict[tuple, int] = {}  # per (key, metric)
        self.late_count = 0
        self.rows_in = 0

    def append(self, key: str, metric: str, ts: int, value_bits: int) -> bool:
        series = (key, metric)
        wm = self.watermark.get(series, -1)
        if ts <= wm - self.allowed_lateness_ms or (ts <= wm):
            self.late_count += 1
            return False
        block_start = ts - ts % self.block_span_ms
        bkey = (key, metric, block_start)
        comp = self.open.get(bkey)
        if comp is None:
            comp = GorillaCompressor(block_start)
            self.open[bkey] = comp
            self.meta[bkey] = {"n_points": 0}
        comp.add_value(ts, value_bits)
        self.meta[bkey]["n_points"] += 1
        self.watermark[series] = ts
        self.rows_in += 1
        return True

    def append_batch(self, keys, metrics, ts_arr, bits_arr) -> int:
        accepted = 0
        for k, m, t, b in zip(keys, metrics, ts_arr, bits_arr):
            accepted += self.append(k, m, int(t), int(b))
        return accepted

    def snapshot(self) -> list[dict]:
        """Open-block checkpoint: decodable payloads WITHOUT closing."""
        rows = []
        for (key, metric, block_start), comp in self.open.items():
            rows.append({
                "key": key, "metric": metric, "block_start": block_start,
                "n_points": self.meta[(key, metric, block_start)]["n_points"],
                "payload": words_to_bytes(comp.out.to_words()),
                "closed": False,
                "watermark": self.watermark.get((key, metric), -1),
            })
        return rows

    def seal(self) -> list[dict]:
        """Close all open blocks and emit final rows (EOF-terminated)."""
        rows = []
        for bkey, comp in list(self.open.items()):
            key, metric, block_start = bkey
            comp.close()
            rows.append({
                "key": key, "metric": metric, "block_start": block_start,
                "n_points": self.meta[bkey]["n_points"],
                "payload": words_to_bytes(comp.out.to_words()),
                "closed": True,
                "watermark": self.watermark.get((key, metric), -1),
            })
            del self.open[bkey]
            del self.meta[bkey]
        return rows

    def stats(self) -> dict:
        return {"rows_in": self.rows_in, "late": self.late_count,
                "open_blocks": len(self.open)}

    # -- checkpoint / restore -------------------------------------------
    # The codec classes are pure Python state (bit buffer + a few scalars +
    # predictor table), so a pickle of the core IS a complete encoder
    # checkpoint: a restored core continues appending mid-block and seals
    # bit-identical streams.  (The snapshot() above is the *read-side*
    # checkpoint — decodable without close, per EncodeGorillaTest.java:484-500;
    # this is the write-side one.)

    def checkpoint(self) -> bytes:
        import pickle

        return pickle.dumps({
            "block_span_ms": self.block_span_ms,
            "allowed_lateness_ms": self.allowed_lateness_ms,
            "open": self.open, "meta": self.meta,
            "watermark": self.watermark,
            "late_count": self.late_count, "rows_in": self.rows_in,
        })

    @classmethod
    def restore(cls, blob: bytes) -> "_EncoderCore":
        import pickle

        state = pickle.loads(blob)
        core = cls(state["block_span_ms"], state["allowed_lateness_ms"])
        core.open = state["open"]
        core.meta = state["meta"]
        core.watermark = state["watermark"]
        core.late_count = state["late_count"]
        core.rows_in = state["rows_in"]
        return core


def feed_parquet_distributed(router, path: str, *, order_cols,
                             metric: str = "value",
                             key_col: str = "user_id",
                             batch_rows: int = 16384) -> int:
    """Distributed feed for the streaming gates (VERDICT r3 #8): one
    reader TASK per encoder actor replaces the driver-side
    ``iter_batches`` loop — the driver never touches point data, only the
    accepted counts.

    Each reader scans the pruned (user_id, ts, value) columns, filters to
    the series whose hash owns its actor, sorts ITS slice by
    ``order_cols`` (the arrival order), and appends batches directly to
    the actor.  Per-series arrival order is the only thing the watermark
    semantics depend on, and a series lives wholly in one slice, so a
    per-slice sort reproduces the global arrival order exactly — no
    cross-reader coordination.  The price is n_actors× read fan-out of
    three pruned columns (embarrassingly parallel; at scale each reader
    would take the row groups of its own bucketed files instead).

    Actor tasks from one submitter run in submission order, so the
    sequential ``append_batch`` stream per actor stays in-order.
    """
    import ray

    @ray.remote
    def slice_reader(actor, part: int, n: int) -> int:
        import pyarrow as pa
        import pyarrow.parquet as pq

        tbl = pq.read_table(path, columns=[key_col, "ts", "value"])
        uid = tbl.column(key_col).to_numpy(zero_copy_only=False)
        uu, codes = np.unique(uid, return_inverse=True)
        owner = np.array([_hash_key(str(u)) % n for u in uu])
        mask = owner[codes] == part
        if not mask.any():
            return 0
        uid = uid[mask]
        ts_ms = (tbl.column("ts").cast(pa.int64())
                 .to_numpy(zero_copy_only=False)[mask] // 1000)
        val = tbl.column("value").to_numpy(zero_copy_only=False)[mask]
        arrays = {"ts_ms": ts_ms, "value": val}
        order = np.lexsort(tuple(arrays[c]
                                 for c in reversed(list(order_cols))))
        uid, ts_ms = uid[order], ts_ms[order]
        bits = val[order].view(np.uint64)
        keys = uid.astype(str).tolist()
        futs = []
        for i in range(0, len(keys), batch_rows):
            j = min(i + batch_rows, len(keys))
            futs.append(actor.append_batch.remote(
                keys[i:j], [metric] * (j - i), ts_ms[i:j], bits[i:j]))
        return int(sum(ray.get(futs)))

    return int(sum(ray.get([
        slice_reader.remote(a, i, router.n)
        for i, a in enumerate(router.actors)])))


class StreamingRouter:
    """Driver-side facade: hash-routes point batches to a fixed actor pool.

    Uses fractional-CPU actors (repo convention: a full-CPU pool can
    consume every slot of a small session and starve the Dataset tasks
    feeding it — measured deadlock with 4×num_cpus=1 actors plus a lazy
    upstream sort on a 4-cpu test session); batches are pre-partitioned
    locally (vectorized) so each actor receives only its own series.
    """

    def __init__(self, n_actors: int = 4, block_span_ms: int = DAY_MS,
                 num_cpus: float = 0.5, actor_core: type | None = None,
                 core_args: tuple | None = None) -> None:
        import ray

        core = actor_core or _EncoderCore
        args = core_args if core_args is not None else (block_span_ms,)
        self._actor_cls = ray.remote(num_cpus=num_cpus)(core)
        self.actors = [self._actor_cls.remote(*args)
                       for _ in range(n_actors)]
        self.n = n_actors

    def append_batch(self, keys: list[str], metrics: list[str],
                     ts: np.ndarray, bits: np.ndarray) -> int:
        import ray

        part = np.array([_hash_key(k) % self.n for k in keys])
        futures = []
        for a in range(self.n):
            idx = np.flatnonzero(part == a)
            if len(idx) == 0:
                continue
            futures.append(self.actors[a].append_batch.remote(
                [keys[i] for i in idx], [metrics[i] for i in idx],
                ts[idx], bits[idx]))
        return sum(ray.get(futures))

    def snapshot(self) -> list[dict]:
        import ray

        rows: list[dict] = []
        for part in ray.get([a.snapshot.remote() for a in self.actors]):
            rows.extend(part)
        return rows

    def seal(self) -> list[dict]:
        import ray

        rows: list[dict] = []
        for part in ray.get([a.seal.remote() for a in self.actors]):
            rows.extend(part)
        return rows

    def stats(self) -> dict:
        import ray

        parts = ray.get([a.stats.remote() for a in self.actors])
        return {k: sum(p[k] for p in parts) for k in parts[0]}


class _WindowAggCore:
    """Watermark-triggered TUMBLING-WINDOW aggregation core — the
    streaming-aggregate sibling of ``_EncoderCore`` (which streams
    ENCODE state): per series, open windows accumulate exact integer
    cent partials; when the per-series watermark passes a window's end
    (plus allowed lateness) the window FINALIZES and leaves actor memory
    — the emit-on-watermark semantics of a streaming SQL engine, so open
    state is bounded by (series × windows-in-flight), never the stream
    length.  Late rows for already-finalized windows are dropped and
    counted (the out-of-order gate discipline).  Plain-Python core
    (testable without Ray); batch work is vectorized per series."""

    def __init__(self, window_ms: int = 3_600_000,
                 allowed_lateness_ms: int = 0) -> None:
        self.window_ms = window_ms
        self.lateness = allowed_lateness_ms
        self.open: dict[tuple, list] = {}      # (k, m, w) -> [s, n, lo, hi]
        self.final: list[dict] = []
        self.watermark: dict[tuple, int] = {}
        self.frontier: dict[tuple, int] = {}   # first non-finalized window
        self.n_early = 0
        self.late_count = 0
        self.rows_in = 0

    def _finalize_upto(self, series, boundary_win: int,
                       early: bool) -> None:
        k, m = series
        for (kk, mm, w) in [b for b in self.open
                            if (b[0], b[1]) == series
                            and b[2] < boundary_win]:
            s, n, lo, hi = self.open.pop((kk, mm, w))
            self.final.append({"key": kk, "metric": mm, "window_ms": w,
                               "sum_cents": s, "cnt": n,
                               "min_c": lo, "max_c": hi})
            if early:
                self.n_early += 1
        self.frontier[series] = max(self.frontier.get(series, 0),
                                    boundary_win)

    def append_batch(self, keys, metrics, ts_arr, bits_arr) -> int:
        ts = np.asarray(ts_arr, dtype=np.int64)
        vals = np.asarray(bits_arr, dtype=np.uint64).view(np.float64)
        cents = (np.sign(vals)
                 * np.floor(np.abs(vals) * 100 + 0.5)).astype(np.int64)
        win = ts // self.window_ms * self.window_ms
        karr = np.asarray(keys, dtype=object)
        marr = np.asarray(metrics, dtype=object)
        accepted = 0
        for series in {(k, m) for k, m in zip(keys, metrics)}:
            sel = np.flatnonzero((karr == series[0]) & (marr == series[1]))
            sw, sc, sts = win[sel], cents[sel], ts[sel]
            # SEQUENTIAL drop rule (batch-size-invariant, so the accepted
            # set is exactly SQL-expressible): row i drops iff its window
            # lies before the lateness-adjusted boundary of the running
            # max timestamp over all PRIOR arrivals of its series
            carry = self.watermark.get(series)
            run = np.maximum.accumulate(sts)
            wm_prior = np.concatenate(
                ([-1 if carry is None else carry], run[:-1]))
            if carry is not None:
                wm_prior = np.maximum(wm_prior, carry)
            has_prior = wm_prior >= 0
            boundary = np.where(
                has_prior,
                (np.maximum(wm_prior - self.lateness, 0)
                 // self.window_ms * self.window_ms),
                np.iinfo(np.int64).min)
            ok = sw >= boundary
            self.late_count += int((~ok).sum())
            if ok.any():
                sw, sc, sts = sw[ok], sc[ok], sts[ok]
                order = np.argsort(sw, kind="stable")
                sw, sc = sw[order], sc[order]
                starts = np.flatnonzero(
                    np.concatenate(([True], sw[1:] != sw[:-1])))
                bounds = np.append(starts, len(sw))
                for i, st in enumerate(starts):
                    seg = sc[st:bounds[i + 1]]
                    bkey = (series[0], series[1], int(sw[st]))
                    cell = self.open.get(bkey)
                    if cell is None:
                        self.open[bkey] = [int(seg.sum()), len(seg),
                                           int(seg.min()), int(seg.max())]
                    else:
                        cell[0] += int(seg.sum())
                        cell[1] += len(seg)
                        cell[2] = min(cell[2], int(seg.min()))
                        cell[3] = max(cell[3], int(seg.max()))
                accepted += len(sw)
                self.rows_in += len(sw)
                wm = max(self.watermark.get(series, -1), int(sts.max()))
                self.watermark[series] = wm
                boundary = ((wm - self.lateness) // self.window_ms
                            * self.window_ms)
                self._finalize_upto(series, boundary, early=True)
        return accepted

    def seal(self) -> list[dict]:
        for series in list({(k, m) for (k, m, _w) in self.open}):
            self._finalize_upto(series, np.iinfo(np.int64).max,
                                early=False)
        out, self.final = self.final, []
        return out

    def snapshot(self) -> list[dict]:
        return [dict(f) for f in self.final]

    def stats(self) -> dict:
        return {"rows_in": self.rows_in, "late": self.late_count,
                "open_blocks": len(self.open),
                "early_emitted": self.n_early}


class _SessionWindowCore:
    """Watermark-triggered SESSION-WINDOW core — the gap-based sibling of
    ``_WindowAggCore`` (tumbling).  Session windows are the hard
    streaming case: boundaries are data-dependent (a session stays open
    while events keep arriving within ``gap_ms``), so a session FINALIZES
    the moment an accepted arrival's gap exceeds ``gap_ms`` — emit-on-
    arrival, one open session per series ever held in memory.

    Out-of-order arrivals use the strictest SEQUENTIAL rule: row i is
    accepted iff ``ts >= running max over PRIOR arrivals`` of its series
    (batch-size-invariant — mirrors exactly to SQL as a running-max
    filter over the same arrival order, the ``_WindowAggCore`` ooo
    discipline).  A looser rule (accept anything inside the open
    session's span) would admit order-dependent merges and stop being
    SQL-expressible."""

    def __init__(self, gap_ms: int = 1_800_000) -> None:
        self.gap = gap_ms
        # series -> [start_ms, last_ms, n_events, session_seq]
        self.open: dict[str, list] = {}
        self.seq: dict[str, int] = {}
        self.watermark: dict[str, int] = {}
        self.final: list[dict] = []
        self.n_early = 0
        self.late_count = 0
        self.rows_in = 0

    def _emit(self, key: str, cell: list, early: bool) -> None:
        self.final.append({"key": key, "session_seq": cell[3],
                           "session_start": cell[0],
                           "session_end": cell[1], "n_events": cell[2]})
        if early:
            self.n_early += 1

    def append_batch(self, keys, metrics, ts_arr, bits_arr) -> int:
        ts = np.asarray(ts_arr, dtype=np.int64)
        karr = np.asarray(keys, dtype=object)
        accepted = 0
        for key in dict.fromkeys(keys):          # preserve arrival order
            sel = np.flatnonzero(karr == key)
            sts = ts[sel]
            carry = self.watermark.get(key)
            run = np.maximum.accumulate(sts)
            wm_prior = np.concatenate(
                ([-1 if carry is None else carry], run[:-1]))
            if carry is not None:
                wm_prior = np.maximum(wm_prior, carry)
            ok = sts >= wm_prior                   # sequential accept rule
            self.late_count += int((~ok).sum())
            if not ok.any():
                continue
            sts = sts[ok]                          # non-decreasing now
            accepted += len(sts)
            self.rows_in += len(sts)
            self.watermark[key] = int(sts[-1])
            cell = self.open.get(key)
            brk = np.flatnonzero(np.diff(sts) > self.gap) + 1
            seg_starts = np.concatenate(([0], brk))
            seg_ends = np.concatenate((brk, [len(sts)]))
            first_extends = (cell is not None
                             and int(sts[0]) - cell[1] <= self.gap)
            for s0, s1 in zip(seg_starts, seg_ends):
                if s0 == 0 and first_extends:
                    cell[1] = int(sts[s1 - 1])
                    cell[2] += int(s1 - s0)
                    continue
                if cell is not None:
                    self._emit(key, cell, early=True)
                seq = self.seq.get(key, 0)
                self.seq[key] = seq + 1
                cell = [int(sts[s0]), int(sts[s1 - 1]), int(s1 - s0), seq]
            self.open[key] = cell
        return accepted

    def seal(self) -> list[dict]:
        for key, cell in list(self.open.items()):
            self._emit(key, cell, early=False)
        self.open.clear()
        out, self.final = self.final, []
        return out

    def snapshot(self) -> list[dict]:
        return [dict(f) for f in self.final]

    def stats(self) -> dict:
        return {"rows_in": self.rows_in, "late": self.late_count,
                "open_blocks": len(self.open),
                "early_emitted": self.n_early}
