"""Tests: streaming encoder actors (open blocks, watermarks, late data,
snapshot checkpointing), lineage + resume, retention job, media plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from gorilla_tsc_ray.codec import bytes_to_words, decode_series, double_to_bits
from gorilla_tsc_ray.state.streaming import _EncoderCore, StreamingRouter
from gorilla_tsc_ray.state import lineage as lin
from gorilla_tsc_ray.pipelines.retention import apply_retention
from gorilla_tsc_ray.stages import media

T0 = 1_500_400_800_000
DAY = 86_400_000


class TestEncoderCore:
    def test_append_and_seal(self):
        core = _EncoderCore()
        for i in range(10):
            core.append("c1", "m", T0 + 1000 + i * 500, double_to_bits(float(i)))
        rows = core.seal()
        assert len(rows) == 1
        ts, vb = decode_series(bytes_to_words(rows[0]["payload"]))
        assert ts.tolist() == [T0 + 1000 + i * 500 for i in range(10)]
        np.testing.assert_array_equal(vb.view(np.float64), np.arange(10.0))

    def test_late_data_rejected(self):
        core = _EncoderCore()
        assert core.append("c1", "m", T0 + 2000, 1)
        assert not core.append("c1", "m", T0 + 1000, 2)  # behind watermark
        assert core.late_count == 1
        # other series unaffected
        assert core.append("c2", "m", T0 + 1000, 3)

    def test_day_block_splitting(self):
        core = _EncoderCore()
        core.append("c1", "m", T0 + 1000, 1)
        core.append("c1", "m", T0 + DAY + 1000, 2)  # next day → new block
        rows = core.seal()
        assert len(rows) == 2
        assert sorted(r["block_start"] for r in rows) == [
            T0 - T0 % DAY, (T0 + DAY) - (T0 + DAY) % DAY]

    def test_snapshot_mid_stream_decodes(self):
        core = _EncoderCore()
        for i in range(5):
            core.append("c1", "m", T0 + 1000 + i, double_to_bits(1.0))
        snap = core.snapshot()
        assert len(snap) == 1 and not snap[0]["closed"]
        words = bytes_to_words(snap[0]["payload"]) + [0] * 4
        ts, vb = decode_series(np.array(words, dtype=np.uint64), n_points=5)
        assert len(ts) == 5
        assert core.stats()["open_blocks"] == 1  # stream still open


def test_streaming_router(ray_session):
    router = StreamingRouter(n_actors=2)
    n = 200
    keys = [f"conv-{i % 7}" for i in range(n)]
    metrics = ["m"] * n
    ts = T0 + 1000 + np.arange(n, dtype=np.int64) * 100
    bits = np.arange(n, dtype=np.uint64)
    accepted = router.append_batch(keys, metrics, ts, bits)
    assert accepted == n
    rows = router.seal()
    assert sum(r["n_points"] for r in rows) == n
    got = {}
    for r in rows:
        t, v = decode_series(bytes_to_words(r["payload"]))
        got[r["key"]] = (t, v)
    # per-series points are in order and complete
    for k in set(keys):
        idx = [i for i, kk in enumerate(keys) if kk == k]
        np.testing.assert_array_equal(got[k][0], ts[idx])
        np.testing.assert_array_equal(got[k][1], bits[idx])
    assert router.stats()["late"] == 0


class TestLineage:
    def test_roundtrip(self, tmp_path):
        rows = [{"partition_key": "day=1", "input_files": ["a"],
                 "rows_in": 10, "rows_out": 2, "bytes_payload": 100,
                 "watermark": 99, "status": "complete"},
                {"partition_key": "day=2", "input_files": ["a"],
                 "rows_in": 5, "rows_out": 1, "bytes_payload": 50,
                 "watermark": 199, "status": "failed"}]
        lin.write_lineage(str(tmp_path), rows, "run1")
        df = lin.load_lineage(str(tmp_path))
        assert len(df) == 2
        assert lin.completed_partitions(str(tmp_path)) == {"day=1"}


class TestRetention:
    def _mk_store(self, root):
        import os
        for tier, days in [("blocks", [0, 1, 2, 3]), ("rollup_1m", [0, 1, 2, 3]),
                           ("rollup_1h", [0, 1, 2, 3]), ("rollup_1d", [0, 1, 2, 3])]:
            for d in days:
                p = root / tier / f"day={T0 - T0 % DAY + d * DAY}"
                os.makedirs(p, exist_ok=True)
                (p / "part-0.parquet").write_bytes(b"x" * 10)
        return str(root)

    def test_expired_deleted_only_with_coarser(self, tmp_path):
        store = self._mk_store(tmp_path)
        now = T0 - T0 % DAY + 4 * DAY
        df = apply_retention(store, {"blocks": 2}, now_ms=now)
        deleted = df[df["status"] == "deleted"]["partition_key"].tolist()
        day0 = T0 - T0 % DAY
        assert f"blocks/day={day0}" in deleted
        assert f"blocks/day={day0 + DAY}" in deleted
        kept = df[df["status"] == "kept"]["partition_key"].tolist()
        assert f"blocks/day={day0 + 3 * DAY}" in kept

    def test_retention_serve_expired_range(self, ray_session):
        """Driver-facing gate: raw blocks expired, the expired range is
        served from the 1h tier and equals the live cascade's output."""
        from gorilla_tsc_ray.pipelines.ingest import rollup_cascade
        from gorilla_tsc_ray.pipelines.retention import retention_serve

        sf = "/root/testdata/sf0.001"  # spans 2 days -> keep only the last
        got = retention_serve(sf, keep_days=1, tier="1h").to_pandas()
        assert len(got) > 0
        live = rollup_cascade(sf, "1h").to_pandas()
        cutoff = (live["bucket_ms"].max() // DAY) * DAY
        exp = live[live["bucket_ms"] < cutoff]
        key = ["conv_id", "metric", "bucket_ms"]
        g = got.sort_values(key).reset_index(drop=True)
        e = exp.sort_values(key).reset_index(drop=True)[g.columns]
        pd.testing.assert_frame_equal(g, e, check_exact=False, atol=1e-9)

    def test_no_delete_without_coarser_tier(self, tmp_path):
        import os, shutil
        store = self._mk_store(tmp_path)
        shutil.rmtree(os.path.join(store, "rollup_1m"))
        now = T0 - T0 % DAY + 10 * DAY
        df = apply_retention(store, {"blocks": 1}, now_ms=now)
        assert (df["status"] == "kept_no_coarser_tier").any()
        assert not (df["status"] == "deleted").any()

    @pytest.mark.parametrize("archive_codec", ["gorilla2e", "gorilla2z"])
    def test_archive_demotes_to_archival_codec(self, tmp_path,
                                               archive_codec):
        """archive=True re-encodes expired raw blocks into the archival
        codec with FULL point fidelity: the archived partition decodes to
        exactly the original points, the raw partition is gone, and the
        archive works even without a coarser tier (it preserves
        everything).  gorilla2e is the default; gorilla2z (round 4) stays
        supported for stores already written."""
        import os
        import shutil

        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from gorilla_tsc_ray.stages import series as se

        root = tmp_path
        day0 = T0 - T0 % DAY
        rng = np.random.default_rng(3)
        n = 500
        ts = (day0 + np.sort(rng.choice(np.arange(1, DAY), n, replace=False))
              ).astype(np.int64)
        vals = np.round(rng.normal(50, 4, n), 2)
        df = pd.DataFrame({
            "conv_id": "c1", "metric": "value", "ts_ms": ts, "value": vals,
            "block_start": np.full(n, day0, dtype=np.int64)})
        blocks = se.encode_partition(df, key_cols=["conv_id"])
        pdir = root / "blocks" / f"day={day0}"
        os.makedirs(pdir)
        pq.write_table(pa.Table.from_pandas(blocks), pdir / "part-0.parquet")
        # no coarser tier on purpose: archive preserves everything
        now = day0 + 10 * DAY
        out = apply_retention(str(root), {"blocks": 1}, now_ms=now,
                              archive=True, archive_codec=archive_codec)
        assert (out["status"] == "archived").all()
        assert not os.path.isdir(pdir)
        adir = root / "blocks_archive" / f"day={day0}"
        archived = pq.read_table(adir / "part-0.parquet").to_pandas()
        assert (archived["codec"] == archive_codec).all()
        dec = se.decode_blocks_batch(archived, key_cols=["conv_id"])
        dec = dec.sort_values("ts_ms").reset_index(drop=True)
        np.testing.assert_array_equal(dec["ts_ms"].to_numpy(), ts)
        np.testing.assert_array_equal(dec["value"].to_numpy(), vals)

    def test_archive_serve_points_equal_raw(self, ray_session):
        """Driver-facing archive gate at sf0.001: points decoded from
        the archival tier equal the raw metric stream on the expired
        days."""
        import duckdb

        from gorilla_tsc_ray.pipelines.retention import archive_serve
        from gorilla_tsc_ray.sources.transcripts import transcripts_dir

        sf = "/root/testdata/sf0.001"
        got = (archive_serve(sf, keep_days=1, metric="text_len")
               .to_pandas().sort_values(["conv_id", "ts_ms"])
               .reset_index(drop=True))
        path = transcripts_dir(sf)
        sql = """
WITH t AS (
  SELECT conv_id, turn_idx, text, epoch_ms(ts) AS ts_ms,
         row_number() OVER (PARTITION BY conv_id, turn_idx
                            ORDER BY ts, turn_idx) AS rn
  FROM read_parquet('{path}/*.parquet')
), d AS (SELECT * FROM t WHERE rn = 1)
SELECT conv_id, 'text_len' AS metric, ts_ms,
       CAST(length(text) AS DOUBLE) AS value FROM d
WHERE ts_ms < (SELECT (max(ts_ms) // 86400000) * 86400000 FROM d)
""".format(path=path)
        exp = (duckdb.connect().execute(sql).df()
               .sort_values(["conv_id", "ts_ms"]).reset_index(drop=True))
        assert len(got) == len(exp) > 0
        pd.testing.assert_frame_equal(got[exp.columns], exp)

    def test_dry_run(self, tmp_path):
        import os
        store = self._mk_store(tmp_path)
        now = T0 - T0 % DAY + 10 * DAY
        df = apply_retention(store, {"blocks": 1}, now_ms=now, dry_run=True)
        assert (df["status"] == "would_delete").any()
        day0 = T0 - T0 % DAY
        assert os.path.isdir(os.path.join(store, "blocks", f"day={day0}"))


class TestMedia:
    def test_fake_decoder_plumbing(self, ray_session):
        import ray.data

        table = media.synthesize_media_table(60)
        ds = ray.data.from_arrow(table)
        out = ds.map_batches(media.FakeDecoder, batch_format="pandas",
                             batch_size=16, concurrency=2).to_pandas()
        assert len(out) == 60
        assert {"media_id", "kind", "n_bytes", "digest", "aspect",
                "f0"}.issubset(out.columns)
        # deterministic across runs
        out2 = ds.map_batches(media.FakeDecoder, batch_format="pandas",
                              batch_size=16, concurrency=2).to_pandas()
        a = out.sort_values("media_id").reset_index(drop=True)
        b = out2.sort_values("media_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_real_avi_decode(self):
        """Video path (round-5 un-stub): RealDecoder's RIFF chunk walk
        must recover exactly the frames the AVI writer packed — compare
        against independently recomputed per-frame pixel sums, and
        against the writer's FIXED frame-offset arithmetic (the SQL
        oracle's contract: frame f data at 232 + f*(8 + stride*h))."""
        import struct

        df = media.synthesize_media_table(60).to_pandas()
        vids = df[df["kind"] == "video"].reset_index(drop=True)
        assert len(vids) > 0
        out = media.RealDecoder(kind="video")(vids)
        for i in range(len(vids)):
            payload = vids["payload"][i]
            w = int(vids["meta_width"][i])
            h = int(vids["meta_height"][i])
            row = w * 3
            stride = row + (4 - row % 4) % 4
            fsize = stride * h
            nf = int(out["n_frames"][i])
            assert struct.unpack_from("<I", payload, 48)[0] == nf  # avih
            sums = []
            for f in range(nf):
                off = 232 + f * (8 + fsize)
                fourcc, size = struct.unpack_from("<4sI", payload, off - 8)
                assert fourcc == b"00db" and size == fsize
                frame = np.frombuffer(payload, np.uint8, count=fsize,
                                      offset=off)
                sums.append(int(frame.reshape(h, stride)[:, :row]
                                .sum(dtype=np.int64)))
            assert out["sum_rgb"][i] == sum(sums)
            assert out["f0_sum"][i] == sums[0]
            assert out["flast_sum"][i] == sums[-1]
            assert out["n_pixels"][i] == w * h * nf

    def test_video_rejects_non_avi(self):
        df = pd.DataFrame({"media_id": [1], "payload": [b"not an avi!!"]})
        with pytest.raises(ValueError):
            media.RealDecoder(kind="video")(df)

    def test_real_wav_decode(self):
        """RealDecoder must recover the exact synthesized samples: rebuild
        the generator's RNG stream and compare hand-computed features."""
        df = media.synthesize_media_table(40).to_pandas()
        audio = df[df["kind"] == "audio"].reset_index(drop=True)
        assert len(audio) > 0
        out = media.RealDecoder(kind="audio")(audio)
        import io
        import wave

        for i, payload in enumerate(audio["payload"]):
            w = wave.open(io.BytesIO(payload), "rb")
            s = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
            assert out["n_samples"][i] == len(s)
            assert out["sum_samples"][i] == s.sum(dtype=np.int64)
            assert out["max_abs"][i] == np.abs(s.astype(np.int64)).max()
            assert out["sample_rate"][i] == w.getframerate()
            assert out["n_channels"][i] == 1

    def test_real_bmp_decode(self):
        """BMP path: a hand-built 3×2 image with known pixel bytes."""
        import struct

        w, h = 3, 2
        rows = [bytes([1, 2, 3, 4, 5, 6, 7, 8, 9]),
                bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])]
        pad = b"\x00" * ((4 - (w * 3) % 4) % 4)
        body = rows[0] + pad + rows[1] + pad
        payload = (struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
                   + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                                 len(body), 2835, 2835, 0, 0) + body)
        df = pd.DataFrame({"media_id": [5], "payload": [payload]})
        out = media.RealDecoder(kind="image")(df)
        assert out["width"][0] == 3 and out["height"][0] == 2
        assert out["sum_rgb"][0] == sum(rows[0]) + sum(rows[1])
        assert out["max_byte"][0] == 90
        assert out["n_pixels"][0] == 6

    def test_frame_sample_plan(self):
        df = media.synthesize_media_table(30).to_pandas()
        plan = media.frame_sample_plan(df, every_n=5)
        vids = df[df["kind"] == "video"]
        assert set(plan["media_id"]) == set(vids["media_id"])
        assert (plan["frame_idx"] % 5 == 0).all()


class TestEncoderCheckpoint:
    def test_restore_continues_bit_identically(self):
        """Write-side checkpoint: a restored encoder continues mid-block and
        seals the SAME bit stream as an uninterrupted one."""
        from gorilla_tsc_ray.state.streaming import _EncoderCore

        pts = [(T0 + 1000 + i * 700, double_to_bits(float(i) * 1.3))
               for i in range(50)]
        # uninterrupted
        a = _EncoderCore()
        for t, v in pts:
            a.append("c1", "m", t, v)
        rows_a = a.seal()
        # checkpoint after 20 points, restore, continue
        b = _EncoderCore()
        for t, v in pts[:20]:
            b.append("c1", "m", t, v)
        blob = b.checkpoint()
        del b
        c = _EncoderCore.restore(blob)
        for t, v in pts[20:]:
            c.append("c1", "m", t, v)
        rows_c = c.seal()
        assert len(rows_a) == len(rows_c) == 1
        assert rows_a[0]["payload"] == rows_c[0]["payload"]
        # restored watermark still rejects late data
        d = _EncoderCore.restore(blob)
        assert not d.append("c1", "m", pts[0][0], 1)
        assert d.stats()["late"] == 1


def test_window_agg_core_watermark_semantics():
    """Plain-Python core: in-order points finalize windows on watermark
    (early), late rows for finalized windows drop, lateness grace keeps
    them, and seal flushes the rest."""
    import numpy as np

    from gorilla_tsc_ray.state.streaming import _WindowAggCore

    W = 100
    core = _WindowAggCore(window_ms=W, allowed_lateness_ms=0)

    def feed(ts_list, vals):
        bits = np.asarray(vals, dtype=np.float64).view(np.uint64)
        return core.append_batch(["u"] * len(ts_list),
                                 ["value"] * len(ts_list),
                                 np.asarray(ts_list, dtype=np.int64), bits)

    # window [0,100) gets 2 points, then ts=150 advances the watermark
    # past its end -> it finalizes EARLY
    assert feed([10, 20], [1.0, 2.0]) == 2
    assert core.n_early == 0
    assert feed([150], [5.0]) == 1
    assert core.n_early == 1
    # a late row for the finalized window drops
    assert feed([30], [9.0]) == 0
    assert core.late_count == 1
    rows = core.seal()
    assert core.stats()["open_blocks"] == 0
    got = {r["window_ms"]: r for r in rows}
    assert got[0]["sum_cents"] == 300 and got[0]["cnt"] == 2
    assert got[0]["min_c"] == 100 and got[0]["max_c"] == 200
    assert got[100]["sum_cents"] == 500 and got[100]["cnt"] == 1

    # allowed lateness keeps a within-grace row
    core2 = _WindowAggCore(window_ms=W, allowed_lateness_ms=100)
    bits = np.asarray([1.0, 2.0, 3.0], dtype=np.float64).view(np.uint64)
    core2.append_batch(["u"] * 3, ["value"] * 3,
                       np.asarray([10, 150, 90], dtype=np.int64), bits)
    assert core2.late_count == 0        # 90 is within the 100ms grace
    rows2 = {r["window_ms"]: r for r in core2.seal()}
    assert rows2[0]["cnt"] == 2 and rows2[0]["sum_cents"] == 400


def test_window_agg_core_batch_invariance():
    """The sequential drop rule makes the accepted set independent of how
    the arrival stream is split into batches."""
    import numpy as np

    from gorilla_tsc_ray.state.streaming import _WindowAggCore

    rng = np.random.default_rng(11)
    ts = rng.integers(0, 1000, size=300).astype(np.int64)
    vals = rng.normal(size=300)

    def run(splits):
        core = _WindowAggCore(window_ms=100, allowed_lateness_ms=0)
        for lo, hi in splits:
            bits = vals[lo:hi].view(np.uint64)
            core.append_batch(["u"] * (hi - lo), ["value"] * (hi - lo),
                              ts[lo:hi], bits)
        rows = sorted((r["window_ms"], r["sum_cents"], r["cnt"])
                      for r in core.seal())
        return rows, core.late_count

    whole = run([(0, 300)])
    chunks = run([(0, 7), (7, 100), (100, 101), (101, 300)])
    assert whole == chunks


def test_session_core_emit_on_arrival_and_seal():
    import numpy as np

    from gorilla_tsc_ray.state.streaming import _SessionWindowCore

    core = _SessionWindowCore(gap_ms=100)
    ts = np.array([0, 50, 120, 400, 450, 460], np.int64)
    bits = np.zeros(6, np.uint64)
    core.append_batch(["u"] * 6, ["value"] * 6, ts, bits)
    # the 400 arrival closes session 0 (0..120) on arrival
    assert core.n_early == 1
    assert core.stats()["open_blocks"] == 1
    rows = core.seal()
    got = sorted((r["session_seq"], r["session_start"], r["session_end"],
                  r["n_events"]) for r in rows)
    assert got == [(0, 0, 120, 3), (1, 400, 460, 3)]
    assert core.stats()["open_blocks"] == 0


def test_session_core_ooo_batch_invariance():
    """Sequential accept rule (ts >= running max of prior arrivals) makes
    the sealed session set independent of batch splits under scrambled
    arrival."""
    import numpy as np

    from gorilla_tsc_ray.state.streaming import _SessionWindowCore

    rng = np.random.default_rng(23)
    ts = rng.integers(0, 5000, size=400).astype(np.int64)
    users = rng.choice(["a", "b", "c"], size=400).tolist()
    bits = np.zeros(400, np.uint64)

    def run(splits):
        core = _SessionWindowCore(gap_ms=150)
        for lo, hi in splits:
            core.append_batch(users[lo:hi], ["value"] * (hi - lo),
                              ts[lo:hi], bits[lo:hi])
        rows = sorted((r["key"], r["session_seq"], r["session_start"],
                       r["session_end"], r["n_events"])
                      for r in core.seal())
        return rows, core.late_count

    whole = run([(0, 400)])
    chunks = run([(0, 13), (13, 77), (77, 200), (200, 201), (201, 400)])
    assert whole == chunks
    assert whole[1] > 0  # scrambled arrival must actually drop rows


def test_session_core_accepted_set_is_sql_expressible():
    """Accepted rows == rows where ts >= running max of prior arrivals,
    then sessions == gap islands over that subsequence."""
    import numpy as np

    from gorilla_tsc_ray.state.streaming import _SessionWindowCore

    rng = np.random.default_rng(5)
    ts = rng.integers(0, 3000, size=200).astype(np.int64)
    core = _SessionWindowCore(gap_ms=120)
    core.append_batch(["u"] * 200, ["value"] * 200, ts,
                      np.zeros(200, np.uint64))
    rows = sorted((r["session_seq"], r["session_start"], r["session_end"],
                   r["n_events"]) for r in core.seal())
    # reference: sequential accept + gap islands
    acc, wm = [], -1
    for t in ts:
        if t >= wm:
            acc.append(int(t))
            wm = t
    acc = np.array(acc)
    brk = np.flatnonzero(np.diff(acc) > 120) + 1
    starts = np.concatenate(([0], brk))
    ends = np.concatenate((brk, [len(acc)]))
    exp = [(i, int(acc[s]), int(acc[e - 1]), int(e - s))
           for i, (s, e) in enumerate(zip(starts, ends))]
    assert rows == exp


def test_resolve_asof_day_resolution(tmp_path):
    """MVCC day resolution: archived days substitute their EARLIEST
    later archive; created-after days are excluded; untouched days pass
    through from the current tier dir."""
    import os

    from gorilla_tsc_ray.state.lineage import (archive_path, resolve_asof,
                                               write_version_manifest)

    store = str(tmp_path / "store")
    tier = "rollup_1h"
    # current store: days 10, 20, 30, 40 (40 was created by v2; 20 was
    # rewritten at v2 and again at v3; 30 rewritten at v3 only)
    for d in (10, 20, 30, 40):
        os.makedirs(os.path.join(store, tier, f"day={d}"))
    for ver, day in ((2, 20), (3, 20), (3, 30)):
        os.makedirs(archive_path(store, ver, tier, day))
    write_version_manifest(store, [
        {"version": 2, "tier": tier, "day": 20, "action": "archived"},
        {"version": 2, "tier": tier, "day": 40, "action": "created"},
    ], run_id="r2")
    write_version_manifest(store, [
        {"version": 3, "tier": tier, "day": 20, "action": "archived"},
        {"version": 3, "tier": tier, "day": 30, "action": "archived"},
    ], run_id="r3")

    def days_of(paths):
        return sorted((("hist", p.split("/_history/")[1])
                       if "/_history/" in p
                       else ("cur", os.path.basename(p))) for p in paths)

    # as of v1: day 20 from its v2 archive (pre-v2 state), day 30 from
    # v3 archive, day 40 excluded, day 10 current
    assert days_of(resolve_asof(store, 1, tier)) == [
        ("cur", "day=10"),
        ("hist", f"v2/{tier}/day=20"),
        ("hist", f"v3/{tier}/day=30")]
    # as of v2: day 20 from the v3 archive (its state AT v2), 40 included
    assert days_of(resolve_asof(store, 2, tier)) == [
        ("cur", "day=10"), ("cur", "day=40"),
        ("hist", f"v3/{tier}/day=20"),
        ("hist", f"v3/{tier}/day=30")]
    # as of v3 (latest): everything current
    assert days_of(resolve_asof(store, 3, tier)) == [
        ("cur", "day=10"), ("cur", "day=20"), ("cur", "day=30"),
        ("cur", "day=40")]


def test_vacuum_history_drops_below_cut(tmp_path):
    import os

    from gorilla_tsc_ray.state.lineage import (archive_path,
                                               load_version_manifest,
                                               resolve_asof, vacuum_history,
                                               write_version_manifest)

    store = str(tmp_path / "store")
    tier = "blocks"
    os.makedirs(os.path.join(store, tier, "day=10"))
    for ver in (2, 3):
        p = archive_path(store, ver, tier, 10 * ver)
        os.makedirs(p)
        with open(os.path.join(p, "x.parquet"), "wb") as f:
            f.write(b"0" * 64)
        write_version_manifest(store, [
            {"version": ver, "tier": tier, "day": 10 * ver,
             "action": "archived"}], run_id=f"r{ver}")
    res = vacuum_history(store, keep_from_version=3)
    assert res["dropped_versions"] == 1 and res["freed_bytes"] >= 64
    man = load_version_manifest(store)
    assert set(man["version"]) == {3}
    # v2's manifest rows (including 'created' exclusions) are gone — an
    # as-of read below the vacuum floor must REFUSE, not silently
    # reconstruct from the surviving rows (it could include days created
    # after v2 whose manifest rows were just deleted)
    import pytest

    with pytest.raises(ValueError, match="vacuum floor"):
        resolve_asof(store, 2, tier)
    # at/above the floor still resolves: as-of v3 = the current tier
    paths = resolve_asof(store, 3, tier)
    assert os.path.join(store, tier, "day=10") in paths
    assert not any("v2" in p for p in paths)


def test_fsck_deep_detects_1m_corruption(ray_session, tmp_path):
    """fsck_deep recomputes the 1m tier from DECODED block points; a
    corrupted stored 1m value must surface as a mismatch, and a clean
    store must pass with zeros."""
    import glob

    import pyarrow.parquet as pq

    from gorilla_tsc_ray.pipelines.ingest import fsck_deep, ingest_to_store

    store = str(tmp_path / "store")
    ingest_to_store("/root/testdata/sf0.001", store, resume=False)
    clean = fsck_deep(store)
    assert (clean[["n_missing", "n_extra", "n_mismatch"]]
            .to_numpy() == 0).all()
    assert clean["n_groups"].iloc[0] > 0

    f = sorted(glob.glob(f"{store}/rollup_1m/day=*/*.parquet"))[0]
    t = pq.read_table(f).to_pandas()
    t.loc[0, "sum_v"] = t.loc[0, "sum_v"] + 1.0
    import pyarrow as pa

    pq.write_table(pa.Table.from_pandas(t, preserve_index=False), f)
    sick = fsck_deep(store)
    assert sick["n_mismatch"].iloc[0] >= 1
