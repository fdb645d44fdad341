"""End-to-end tests for the events pipelines against a DuckDB oracle —
the same comparison the external driver performs (row count + sorted
value equality)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from gorilla_tsc_ray.pipelines import events as ev


def _cmp(ray_ds, sql: str, sf_dir: str, sort_cols: list[str],
         float_cols: tuple = (), atol: float = 0.0):
    got = ray_ds.to_pandas().sort_values(sort_cols).reset_index(drop=True)
    con = duckdb.connect()
    for t in ["events", "documents", "embeddings", "lineitem", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    exp = con.execute(sql).df().sort_values(sort_cols).reset_index(drop=True)
    assert len(got) == len(exp), f"rows {len(got)} != {len(exp)}"
    assert sorted(got.columns) == sorted(exp.columns)
    exp = exp[got.columns]
    for c in got.columns:
        g, e = got[c].to_numpy(), exp[c].to_numpy()
        if c in float_cols or g.dtype.kind == "f":
            np.testing.assert_allclose(g.astype(float), e.astype(float),
                                       atol=atol, rtol=0, equal_nan=True,
                                       err_msg=f"column {c}")
        else:
            np.testing.assert_array_equal(g, e, err_msg=f"column {c}")


def test_points_roundtrip(ray_session, sf_small):
    _cmp(
        ev.points_roundtrip(sf_small),
        "SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events",
        sf_small, ["user_id", "ts_ms"],
    )


@pytest.mark.parametrize("tier", ["1m", "1h", "1d"])
def test_rollup_tiers(ray_session, sf_small, tier):
    ms = {"1m": 60_000, "1h": 3_600_000, "1d": 86_400_000}[tier]
    _cmp(
        ev.rollup(sf_small, tier),
        f"""
        SELECT user_id,
               epoch_ms(ts) - epoch_ms(ts) % {ms} AS bucket_ms,
               round(sum(value), 6) AS sum_v,
               count(*) AS cnt,
               min(value) AS min_v,
               max(value) AS max_v,
               arg_max(value, ts) AS last_v
        FROM events GROUP BY 1, 2
        """,
        sf_small, ["user_id", "bucket_ms"], float_cols=("sum_v",), atol=1e-6,
    )


def test_cascade_equals_direct(ray_session, sf_small):
    direct = ev.rollup(sf_small, "1h").to_pandas().sort_values(
        ["user_id", "bucket_ms"]).reset_index(drop=True)
    cascade = ev.rollup_1h_via_cascade(sf_small).to_pandas().sort_values(
        ["user_id", "bucket_ms"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(direct, cascade[direct.columns],
                                  check_exact=False, atol=1e-9)


def test_gapfill(ray_session, sf_small):
    _cmp(
        ev.gapfill(sf_small, "1h"),
        """
        WITH r AS (
          SELECT user_id,
                 epoch_ms(ts) - epoch_ms(ts) % 3600000 AS bucket_ms,
                 round(sum(value), 6) AS sum_v,
                 count(*) AS cnt,
                 arg_max(value, ts) AS last_v
          FROM events GROUP BY 1, 2
        ), bounds AS (
          SELECT user_id, min(bucket_ms) AS lo, max(bucket_ms) AS hi FROM r GROUP BY 1
        ), grid AS (
          SELECT b.user_id, gs.g AS bucket_ms
          FROM bounds b, LATERAL (SELECT unnest(generate_series(b.lo, b.hi, 3600000)) AS g) gs
        )
        SELECT g.user_id, g.bucket_ms,
               coalesce(r.sum_v, 0.0) AS sum_v,
               coalesce(r.cnt, 0) AS cnt,
               last_value(r.last_v IGNORE NULLS)
                 OVER (PARTITION BY g.user_id ORDER BY g.bucket_ms) AS last_v,
               r.user_id IS NULL AS filled
        FROM grid g LEFT JOIN r ON g.user_id = r.user_id AND g.bucket_ms = r.bucket_ms
        """,
        sf_small, ["user_id", "bucket_ms"], float_cols=("sum_v",), atol=1e-6,
    )


def test_event_gaps(ray_session, sf_small):
    _cmp(
        ev.event_gaps(sf_small),
        """
        SELECT user_id, epoch_ms(ts) AS ts_ms,
               CAST(epoch_ms(ts) - lag(epoch_ms(ts))
                    OVER (PARTITION BY user_id ORDER BY ts) AS DOUBLE) AS gap_ms
        FROM events
        """,
        sf_small, ["user_id", "ts_ms"],
    )


def test_block_store_compression(ray_session, sf_small):
    blocks = ev.encode_blocks(sf_small).to_pandas()
    assert (blocks["codec"] == "gorilla2").all()
    n_points = int(blocks["n_points"].sum())
    con = duckdb.connect()
    n_raw = con.execute(
        f"SELECT count(*) FROM '{sf_small}/events.parquet'").fetchone()[0]
    assert n_points == n_raw
    # bytes/point is only meaningful on dense series (sparse user-days pay
    # the fixed header+EOF overhead); dense-series ratio is covered by
    # test_dense_series_compression below.
    assert blocks["payload"].map(len).gt(0).all()


def test_dense_series_compression():
    """A dense regular series (benchmark shape, EncodingBenchmark.java:60-69)
    compresses far below raw 16 bytes/point."""
    import numpy as np
    from gorilla_tsc_ray.codec import encode_series, words_to_payload

    n = 100_000
    t0 = 1500400800000
    ts = t0 + 60 + 60 * np.arange(n, dtype=np.int64)
    vb = np.arange(n, dtype=np.float64).view(np.uint64)
    words, _ = encode_series(t0, ts, vb)
    bytes_pp = len(words_to_payload(words)) / n
    assert bytes_pp < 3.0  # ~16 bits/pt on the counter-shaped bench series


def test_empty_selection_is_robust(ray_session, sf_small):
    """Pipelines must tolerate empty intermediate results (no groups)."""
    import pyarrow.compute as pc
    from gorilla_tsc_ray.pipelines.events import _read_points

    ds = _read_points(sf_small).map_batches(
        lambda t: t.filter(pc.less(t["ts_ms"], 0)), batch_format="pyarrow")
    assert ds.count() == 0
