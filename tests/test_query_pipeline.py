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
