"""Query/decode path over a materialized store: pruning + exact trim."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from gorilla_tsc_ray.pipelines import ingest, query
from gorilla_tsc_ray.sources.transcripts import transcripts_dir

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def store(ray_session, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("store"))
    ingest.ingest_to_store(SF, root)
    return root


def _expected_points(t_lo=None, t_hi=None, metric="text_len", conv=None):
    path = transcripts_dir(SF)
    conds = []
    if t_lo is not None:
        conds.append(f"ts_ms >= {t_lo}")
    if t_hi is not None:
        conds.append(f"ts_ms <= {t_hi}")
    if conv is not None:
        conds.append(f"conv_id = '{conv}'")
    where = ("WHERE " + " AND ".join(conds)) if conds else ""
    return duckdb.sql(f"""
        WITH t AS (
          SELECT conv_id, turn_idx, text, epoch_ms(ts) AS ts_ms,
                 row_number() OVER (PARTITION BY conv_id, turn_idx
                                    ORDER BY ts) AS rn
          FROM read_parquet('{path}/*.parquet')
        ), d AS (SELECT conv_id, ts_ms,
                        CAST(length(text) AS DOUBLE) AS value
                 FROM t WHERE rn = 1)
        SELECT * FROM d {where}
    """).df()


def test_full_scan(store):
    got = query.scan_points(f"{store}/blocks", metric="text_len").to_pandas()
    exp = _expected_points()
    assert len(got) == len(exp)


def test_time_range_scan(store):
    t0 = 1_500_400_800_000
    lo, hi = t0 + 3_600_000, t0 + 40 * 3_600_000
    got = query.scan_points(f"{store}/blocks", t_lo=lo, t_hi=hi,
                            metric="text_len").to_pandas()
    exp = _expected_points(lo, hi)
    assert len(got) == len(exp)
    g = got.sort_values(["conv_id", "ts_ms"]).reset_index(drop=True)
    e = exp.sort_values(["conv_id", "ts_ms"]).reset_index(drop=True)
    np.testing.assert_array_equal(g["ts_ms"], e["ts_ms"])
    np.testing.assert_array_equal(g["value"], e["value"])


def test_conv_filter_scan(store):
    got = query.scan_points(f"{store}/blocks", conv_ids=["conv-00000001"],
                            metric="text_len").to_pandas()
    exp = _expected_points(conv="conv-00000001")
    assert len(got) == len(exp)
    assert set(got["conv_id"]) <= {"conv-00000001"}


def test_compaction_bit_transparent(ray_session, tmp_path):
    """compact_store merges each day partition to ONE file and the
    decoded point stream is unchanged (bit-exact rows)."""
    import glob
    import os

    import pandas as pd

    from gorilla_tsc_ray.pipelines.ingest import ingest_to_store
    from gorilla_tsc_ray.pipelines.query import scan_points
    from gorilla_tsc_ray.pipelines.retention import compact_store

    store = str(tmp_path / "store")
    ingest_to_store("/root/testdata/sf0.001", store, resume=False)
    before = (scan_points(f"{store}/blocks").to_pandas()
              .sort_values(["conv_id", "metric", "ts_ms"])
              .reset_index(drop=True))
    n_files_before = len(glob.glob(f"{store}/blocks/day=*/*.parquet"))

    df = compact_store(store, tiers=("blocks",))
    assert len(df) > 0 and (df["rows_in"] == df["rows_out"]).all()
    for pdir in glob.glob(f"{store}/blocks/day=*"):
        assert len(glob.glob(os.path.join(pdir, "*.parquet"))) == 1
    n_files_after = len(glob.glob(f"{store}/blocks/day=*/*.parquet"))
    assert n_files_after <= n_files_before

    after = (scan_points(f"{store}/blocks").to_pandas()
             .sort_values(["conv_id", "metric", "ts_ms"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(before, after[before.columns])
    # lineage recorded the maintenance run
    lin = glob.glob(f"{store}/_lineage/*")
    assert lin


def test_transcode_table_all_codecs_and_kinds():
    """_transcode_table round-trips every codec from raw value BITS —
    exact for long-kind values past 2^53 where a float64 detour would
    corrupt."""
    import numpy as np
    import pyarrow as pa

    from gorilla_tsc_ray.codec.vectorized import (decode_series,
                                                  encode_series,
                                                  payload_to_words)
    from gorilla_tsc_ray.pipelines.retention import _transcode_table
    from gorilla_tsc_ray.stages.series import (encode_series_dfcm,
                                               encode_series_v1)
    import zlib

    bts = 1_600_000_000_000
    ts = bts + np.arange(1, 9, dtype=np.int64) * 60_000
    dbl = np.array([1.5, 1.5, 2.25, -3.0, 2.25, 0.0, 7.5, 1.5]).view(
        np.uint64)
    # long-kind values beyond float53 precision
    lng = (np.int64(2)**62 + np.arange(8, dtype=np.int64)).view(np.uint64)

    def pay(words):
        return np.asarray(words, np.uint64).astype(">u8").tobytes()

    rows = [
        ("gorilla1", "double", pay(encode_series_v1(bts, ts, dbl)), dbl),
        ("gorilla2", "double", pay(encode_series(bts, ts, dbl)[0]), dbl),
        ("gorilla2_dfcm", "double",
         pay(encode_series_dfcm(bts, ts, dbl)), dbl),
        ("gorilla2z", "double",
         zlib.compress(pay(encode_series(bts, ts, dbl)[0])), dbl),
        ("gorilla1", "long", pay(encode_series_v1(bts, ts, lng)), lng),
    ]
    tbl = pa.table({
        "conv_id": pa.array(["c"] * len(rows)),
        "metric": pa.array(["m"] * len(rows)),
        "block_start": pa.array([bts] * len(rows), pa.int64()),
        "n_points": pa.array([8] * len(rows), pa.int64()),
        "codec": pa.array([r[0] for r in rows]),
        "value_kind": pa.array([r[1] for r in rows]),
        "payload": pa.array([r[2] for r in rows], pa.binary())})
    out, n_rw = _transcode_table(tbl, "gorilla2")
    assert n_rw == 4
    assert set(out["codec"].to_pylist()) == {"gorilla2"}
    for i, (_c, _k, _p, bits) in enumerate(rows):
        words = payload_to_words(out["payload"][i].as_py())
        dts, dvb = decode_series(words, n_points=8)
        np.testing.assert_array_equal(dts, ts)
        np.testing.assert_array_equal(dvb, bits)
    # idempotent: second pass rewrites nothing
    out2, n2 = _transcode_table(out, "gorilla2")
    assert n2 == 0 and out2.equals(out)


def test_value_scan_zone_map_prune(store):
    """Zone-map prune (1m tier as the value index): pruned == unpruned
    point-for-point, strictly fewer blocks decode, and the cap-skip path
    (zone_keep_cap=0) returns the identical result."""
    lo = 400.0
    stats: dict = {}
    pruned = query.scan_points(f"{store}/blocks", metric="text_len",
                               value_lo=lo, prune_stats=stats).to_pandas()
    assert "blocks_decoded" in stats
    assert stats["blocks_decoded"] < stats["blocks_scanned"]
    assert stats["zone_survivors"] == stats["blocks_decoded"]
    skipped = query.scan_points(f"{store}/blocks", metric="text_len",
                                value_lo=lo,
                                zone_keep_cap=0).to_pandas()
    key = ["conv_id", "metric", "ts_ms", "value"]

    def norm(df):
        out = df.copy()
        out["conv_id"] = out["conv_id"].astype(str)
        out["metric"] = out["metric"].astype(str)
        return out.sort_values(key).reset_index(drop=True)

    import pandas as pd
    pd.testing.assert_frame_equal(norm(pruned), norm(skipped))
    assert (pruned["value"] >= lo).all()
    # two-sided predicate also exact
    both = query.scan_points(f"{store}/blocks", metric="text_len",
                             value_lo=200.0, value_hi=300.0).to_pandas()
    assert ((both["value"] >= 200.0) & (both["value"] <= 300.0)).all()


def test_bloom_index_prunes_and_is_exact(store):
    """The conv-id bloom sidecar must (a) change NOTHING about results
    and (b) actually skip day partitions for a conv that lives in few
    days.  False positives are allowed; false negatives are not — every
    conv's own scan must survive its bloom."""
    import pandas as pd

    from gorilla_tsc_ray.pipelines.query import build_conv_bloom

    cid = "conv-00000001"
    before = (query.scan_points(f"{store}/blocks", conv_ids=[cid])
              .to_pandas().sort_values(["metric", "ts_ms"])
              .reset_index(drop=True))
    assert len(before) > 0
    path = build_conv_bloom(store)
    assert path.endswith("conv_bloom.parquet")
    stats: dict = {}
    after = (query.scan_points(f"{store}/blocks", conv_ids=[cid],
                               prune_stats=stats)
             .to_pandas().sort_values(["metric", "ts_ms"])
             .reset_index(drop=True))
    pd.testing.assert_frame_equal(before[after.columns], after)
    assert stats["bloom_days_total"] > stats["bloom_days_kept"] > 0

    # a day the index has never seen (appended after the build) must be
    # treated as a survivor — only a bloom that has SEEN a day may rule
    # it out (a stale sidecar may over-read, never drop rows)
    import glob
    import shutil

    import pyarrow.parquet as pq

    src_file = next(
        f for f in sorted(glob.glob(f"{store}/blocks/day=*/*.parquet"))
        if (pq.read_table(f, columns=["conv_id"]).column("conv_id")
            .to_pandas().astype(str) == cid).any())
    days = sorted(glob.glob(f"{store}/blocks/day=*"))
    new_day = int(days[-1].rsplit("=", 1)[1]) + 86_400_000
    import os

    os.makedirs(f"{store}/blocks/day={new_day}")
    shutil.copy(src_file, f"{store}/blocks/day={new_day}/part-0.parquet")
    try:
        stats2: dict = {}
        got = (query.scan_points(f"{store}/blocks", conv_ids=[cid],
                                 prune_stats=stats2)
               .to_pandas())
        # the copied file duplicates the source day's rows for cid
        assert len(got) > len(before)
        # the unknown day counts as kept (it bypasses the bloom)
        assert stats2["bloom_days_kept"] == stats["bloom_days_kept"] + 1
    finally:
        shutil.rmtree(f"{store}/blocks/day={new_day}")
