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


def test_rollup_hopping(ray_session, sf_small):
    # 1 h windows hopping every 15 min: each event lands in 4 windows;
    # the pane-expansion path must equal the naive expand-then-group SQL
    _cmp(
        ev.rollup_hopping(sf_small),
        """
        WITH p AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events),
        e AS (
          SELECT user_id, ts_ms, value,
                 ts_ms - ts_ms % 900000 - i.i * 900000 AS bucket_ms
          FROM p CROSS JOIN (SELECT unnest(range(4)) AS i) i
        )
        SELECT user_id, bucket_ms,
               round(sum(value), 6) AS sum_v, count(*) AS cnt,
               min(value) AS min_v, max(value) AS max_v,
               arg_max(value, ts_ms) AS last_v
        FROM e GROUP BY ALL
        """,
        sf_small, ["user_id", "bucket_ms"], float_cols=("sum_v",), atol=1e-6,
    )
    # every tumbling 1h row must appear as the hop-aligned window whose
    # start equals the tumbling bucket (hopping ⊇ tumbling at hop | window)
    hop = ev.rollup_hopping(sf_small).to_pandas()
    tumb = ev.rollup(sf_small, "1h").to_pandas()
    merged = tumb.merge(hop, on=["user_id", "bucket_ms"],
                        suffixes=("_t", "_h"))
    assert len(merged) == len(tumb)
    np.testing.assert_allclose(merged["sum_v_t"], merged["sum_v_h"],
                               atol=1e-6, rtol=0)
    np.testing.assert_array_equal(merged["cnt_t"], merged["cnt_h"])


def test_rollup_delta(ray_session, sf_small):
    _cmp(
        ev.rollup_delta(sf_small, "1h"),
        """
        WITH p AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events),
        r AS (
          SELECT user_id, ts_ms - ts_ms % 3600000 AS bucket_ms,
                 round(sum(value), 6) AS sum_v
          FROM p GROUP BY 1, 2
        )
        SELECT user_id, bucket_ms, sum_v, delta_sum,
               round(delta_sum / span_s, 9) AS rate_per_s
        FROM (
          SELECT user_id, bucket_ms, sum_v,
                 round(sum_v - lag(sum_v) OVER w, 6) AS delta_sum,
                 (bucket_ms - lag(bucket_ms) OVER w) / 1000.0 AS span_s
          FROM r WINDOW w AS (PARTITION BY user_id ORDER BY bucket_ms)
        )
        """,
        sf_small, ["user_id", "bucket_ms"],
        float_cols=("sum_v", "delta_sum", "rate_per_s"), atol=1e-9,
    )


def test_top_types_per_user(ray_session, sf_small):
    _cmp(
        ev.top_types_per_user(sf_small),
        """
        SELECT user_id, event_type, count(*) AS cnt,
               CAST(row_number() OVER (PARTITION BY user_id
                                       ORDER BY count(*) DESC, event_type)
                    AS BIGINT) AS rnk
        FROM events GROUP BY user_id, event_type
        QUALIFY rnk <= 2
        """,
        sf_small, ["user_id", "rnk"],
    )


def test_twa_oracle(ray_session, sf_small):
    _cmp(
        ev.twa(sf_small, "1h"),
        """
        WITH p AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value FROM events),
        s AS (
          SELECT user_id, ts_ms, value,
                 lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms)
                   AS next_ts
          FROM p
        ), contrib AS (
          SELECT user_id, ts_ms - ts_ms % 3600000 AS bucket_ms,
                 value * (least(next_ts, ts_ms - ts_ms % 3600000 + 3600000)
                          - ts_ms) AS wv,
                 CAST(least(next_ts, ts_ms - ts_ms % 3600000 + 3600000)
                      - ts_ms AS DOUBLE) AS w
          FROM s WHERE next_ts IS NOT NULL
          UNION ALL
          SELECT user_id, next_ts - next_ts % 3600000,
                 value * (next_ts - (next_ts - next_ts % 3600000)),
                 CAST(next_ts - (next_ts - next_ts % 3600000) AS DOUBLE)
          FROM s
          WHERE next_ts IS NOT NULL
            AND next_ts - next_ts % 3600000 > ts_ms - ts_ms % 3600000
        ), sums AS (
          SELECT user_id, bucket_ms, sum(wv) AS wv, sum(w) AS w
          FROM contrib GROUP BY 1, 2
        ), pts AS (
          SELECT DISTINCT user_id, ts_ms - ts_ms % 3600000 AS bucket_ms
          FROM p
        )
        SELECT pts.user_id, pts.bucket_ms,
               round(CASE WHEN s.w > 0 THEN s.wv / s.w END, 6) AS twa
        FROM pts LEFT JOIN sums s USING (user_id, bucket_ms)
        """,
        sf_small, ["user_id", "bucket_ms"], float_cols=("twa",), atol=1e-6,
    )


def test_twa_edge_cases(ray_session, tmp_path):
    """Crafted input: boundary-aligned points, a segment spanning 3 buckets
    (middle bucket point-free → never emitted), a constant-value user, and
    a single-point user (zero covered time → NULL)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    H = 3_600_000
    t0 = 1_600_000_000_000 - 1_600_000_000_000 % H  # bucket-aligned
    rows = [
        # user 1: v=2 for 30 min, then v=4 exactly at the next boundary,
        # then a 2.5-bucket gap to t0+3h+30m (head piece lands in bucket 3)
        (1, t0, 2.0),
        (1, t0 + 30 * 60_000, 4.0),
        (1, t0 + H, 6.0),
        (1, t0 + 3 * H + 30 * 60_000, 8.0),
        # user 2: constant value → twa == value in every bucket
        (2, t0 + 10, 5.0),
        (2, t0 + H + 10, 5.0),
        (2, t0 + 2 * H + 10, 5.0),
        # user 3: single point → NULL twa
        (3, t0 + 42, 9.0),
    ]
    uid, ts, val = map(np.array, zip(*rows))
    pq.write_table(pa.table({
        "user_id": pa.array(uid.astype(np.int64)),
        "ts": pa.array(ts.astype(np.int64),
                       pa.timestamp("ms")).cast(pa.timestamp("us")),
        "value": pa.array(val.astype(np.float64)),
    }), str(tmp_path / "events.parquet"))

    got = (ev.twa(str(tmp_path), "1h").to_pandas()
           .sort_values(["user_id", "bucket_ms"]).reset_index(drop=True))

    # user 1 bucket 0: v=2 for 30m then v=4 for 30m → 3.0 over full cover
    # user 1 bucket 1: v=6 carried from t0+H for the full bucket → 6.0
    #   (the segment to t0+3.5H covers bucket 1 fully, bucket 2 is
    #   point-free and NOT emitted, bucket 3 gets a 30m head of v=6)
    # user 1 bucket 3: only the 30m head piece carrying 6.0 → 6.0
    u1 = got[got.user_id == 1]
    assert list(u1.bucket_ms) == [t0, t0 + H, t0 + 3 * H]
    np.testing.assert_allclose(u1.twa.to_numpy(), [3.0, 6.0, 6.0])
    u2 = got[got.user_id == 2]
    np.testing.assert_allclose(u2.twa.to_numpy(), [5.0, 5.0, 5.0])
    u3 = got[got.user_id == 3]
    assert len(u3) == 1 and np.isnan(u3.twa.iloc[0])


def test_counter_increase(ray_session, sf_small):
    _cmp(
        ev.counter_increase(sf_small, "1h"),
        """
        WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
        s AS (
          SELECT user_id, ts_us, value,
                 lag(value) OVER (PARTITION BY user_id ORDER BY ts_us)
                   AS prev_v
          FROM p
        )
        SELECT user_id, (ts_us // 1000 // 3600000) * 3600000 AS bucket_ms,
               round(sum(CASE WHEN value >= prev_v THEN value - prev_v
                              ELSE value END), 6) AS increase,
               CAST(sum(CASE WHEN value < prev_v THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_resets
        FROM s WHERE prev_v IS NOT NULL
        GROUP BY 1, 2
        """,
        sf_small, ["user_id", "bucket_ms"], float_cols=("increase",),
        atol=1e-6,
    )


def test_counter_increase_resets(ray_session, tmp_path):
    """Monotone ramps with explicit resets: increase must count forward
    motion only and n_resets the drops."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    H = 3_600_000
    t0 = 1_600_000_000_000 - 1_600_000_000_000 % H
    # counter: 0→10→25 | reset → 3→9 (same bucket) | next bucket 9→12
    ts = np.array([t0 + k * 60_000 for k in range(5)] + [t0 + H + 60_000])
    vals = np.array([0.0, 10.0, 25.0, 3.0, 9.0, 12.0])
    pq.write_table(pa.table({
        "user_id": pa.array(np.full(len(ts), 1, dtype=np.int64)),
        "ts": pa.array(ts.astype(np.int64),
                       pa.timestamp("ms")).cast(pa.timestamp("us")),
        "value": pa.array(vals),
    }), str(tmp_path / "events.parquet"))
    got = (ev.counter_increase(str(tmp_path), "1h").to_pandas()
           .sort_values("bucket_ms").reset_index(drop=True))
    # bucket 0: +10 +15 | reset contributes 3 | +6  → 34, one reset
    np.testing.assert_allclose(got["increase"], [34.0, 3.0])
    np.testing.assert_array_equal(got["n_resets"], [1, 0])


def test_streaming_equals_batch_roundtrip(ray_session, sf_small):
    key = ["user_id", "ts_ms"]
    stream = (ev.streaming_roundtrip(sf_small).to_pandas()
              .sort_values(key).reset_index(drop=True))
    batch = (ev.points_roundtrip(sf_small).to_pandas()
             .sort_values(key).reset_index(drop=True))
    pd.testing.assert_frame_equal(stream, batch[stream.columns])


def test_purchase_window_join(ray_session, sf_small):
    _cmp(
        ev.purchase_window_join(sf_small),
        """
        WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value,
                          event_type FROM events),
        p AS (SELECT * FROM e WHERE event_type = 'purchase')
        SELECT p.user_id, p.event_id, p.ts_us // 1000 AS pts_ms,
               CAST(count(f.event_id) AS BIGINT) AS n_follow,
               round(coalesce(sum(f.value), 0), 6) AS sum_follow
        FROM p LEFT JOIN e f
          ON f.user_id = p.user_id
         AND f.ts_us > p.ts_us AND f.ts_us <= p.ts_us + 300000000
        GROUP BY 1, 2, 3
        """,
        sf_small, ["user_id", "event_id"], float_cols=("sum_follow",),
        atol=1e-6,
    )


def test_purchase_window_join_boundaries(ray_session, tmp_path):
    """Window semantics: strict > at the purchase instant, inclusive at
    purchase+W; neighbors' events never leak across users."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    W = 300_000  # ms
    t0 = 1_600_000_000_000
    rows = [
        # user 1: purchase at t0; events at t0 (excluded), t0+1 (in),
        # t0+W (inclusive end, in), t0+W+1 (out)
        (10, 1, t0, "purchase", 100.0),
        (11, 1, t0, "view", 1.0),
        (12, 1, t0 + 1, "view", 2.0),
        (13, 1, t0 + W, "view", 4.0),
        (14, 1, t0 + W + 1, "view", 8.0),
        # user 2: an event inside user 1's window must not count
        (20, 2, t0 + 2, "view", 16.0),
    ]
    eid, uid, ts, et, val = map(np.array, zip(*rows))
    pq.write_table(pa.table({
        "event_id": pa.array(eid.astype(np.int64)),
        "user_id": pa.array(uid.astype(np.int64)),
        "ts": pa.array(ts.astype(np.int64),
                       pa.timestamp("ms")).cast(pa.timestamp("us")),
        "event_type": pa.array(et.astype(str)),
        "value": pa.array(val.astype(np.float64)),
    }), str(tmp_path / "events.parquet"))
    got = ev.purchase_window_join(str(tmp_path)).to_pandas()
    assert len(got) == 1
    assert got["n_follow"].iloc[0] == 2          # t0+1 and t0+W only
    assert got["sum_follow"].iloc[0] == 6.0      # 2 + 4


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


def test_gapfill_partition_equals_per_group():
    """Multi-series vectorized gap-fill == per-series reference kernel."""
    from gorilla_tsc_ray.stages.rollup import gapfill_group, gapfill_partition

    rng = np.random.default_rng(4)
    frames = []
    for u in range(17):
        buckets = np.unique(rng.choice(200, rng.integers(1, 30))) * 3_600_000
        frames.append(pd.DataFrame({
            "user_id": u, "bucket_ms": buckets.astype(np.int64),
            "sum_v": rng.normal(0, 10, len(buckets)),
            "cnt": rng.integers(1, 9, len(buckets)),
            "last_v": rng.normal(0, 10, len(buckets)),
        }))
    df = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=1)
    got = gapfill_partition(df, bucket_ms=3_600_000, key_cols=["user_id"])
    exp = pd.concat([gapfill_group(g, bucket_ms=3_600_000,
                                   key_cols=["user_id"])
                     for _, g in df.groupby("user_id")], ignore_index=True)
    key = ["user_id", "bucket_ms"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = exp.sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ["sum_v", "cnt", "last_v", "filled"]:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy(),
                                      err_msg=c)


def test_hot_user_skew_salting(ray_session, tmp_path):
    """North-rule salting: one pathological user with 60 day-blocks must
    spread across many encode partitions (no single straggler) and still
    round-trip bit-exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from gorilla_tsc_ray.pipelines.events import N_PARTS

    rng = np.random.default_rng(7)
    day = 86_400_000
    t0 = 1_600_000_000_000
    # hot user: 12k points over 60 days; 19 cold users with 50 points each
    hot_ts = np.sort(t0 + rng.choice(60 * day, 12_000, replace=False))
    users = [np.full(len(hot_ts), 1)]
    tss = [hot_ts]
    for u in range(2, 21):
        ts = np.sort(t0 + rng.choice(60 * day, 50, replace=False))
        users.append(np.full(len(ts), u))
        tss.append(ts)
    user_id = np.concatenate(users).astype(np.int64)
    ts_ms = np.concatenate(tss).astype(np.int64)
    value = np.round(rng.uniform(0, 100, len(ts_ms)), 2)
    pq.write_table(pa.table({
        "user_id": pa.array(user_id),
        "ts": pa.array(ts_ms, pa.timestamp("ms")).cast(pa.timestamp("us")),
        "value": pa.array(value),
    }), str(tmp_path / "events.parquet"))

    # salted partition ids for the hot user's day blocks: must hit MANY
    # partitions (the unsalted user-hash would hit exactly one)
    hot_days = np.unique((hot_ts // day) * day)
    h = pd.util.hash_pandas_object(pd.Series(np.full(len(hot_days), 1)),
                                   index=False).to_numpy()
    parts = ((h * np.uint64(1_000_003)
              + (hot_days // day).astype(np.uint64))
             % np.uint64(N_PARTS))
    assert len(np.unique(parts)) > N_PARTS // 3

    got = ev.points_roundtrip(str(tmp_path)).to_pandas()
    key = ["user_id", "ts_ms"]
    got = got.sort_values(key).reset_index(drop=True)
    exp = pd.DataFrame({"user_id": user_id, "ts_ms": ts_ms, "value": value}
                       ).sort_values(key).reset_index(drop=True)
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["ts_ms"], exp["ts_ms"])
    np.testing.assert_array_equal(got["value"], exp["value"])


def test_asof_last_purchase(ray_session, sf_small):
    _cmp(
        ev.asof_last_match(sf_small),
        """
        WITH e AS (SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, ts
                   FROM events),
             p AS (SELECT user_id, epoch_ms(ts) AS pts_ms, value AS pvalue, ts
                   FROM events WHERE event_type = 'purchase')
        SELECT e.event_id, e.user_id, e.ts_ms,
               coalesce(p.pts_ms, -1) AS last_match_ts,
               coalesce(p.pvalue, -1.0) AS last_match_value
        FROM e ASOF LEFT JOIN p
          ON e.user_id = p.user_id AND e.ts >= p.ts
        """,
        sf_small, ["user_id", "ts_ms"],
    )


def test_user_quantiles(ray_session, sf_small):
    _cmp(
        ev.user_quantiles(sf_small),
        """
        SELECT user_id,
               round(quantile_cont(value, 0.5), 6) AS p50,
               round(quantile_cont(value, 0.95), 6) AS p95,
               round(quantile_cont(value, 0.99), 6) AS p99
        FROM events GROUP BY 1
        """,
        sf_small, ["user_id"],
    )


def test_points_roundtrip_long(ray_session, sf_small):
    _cmp(
        ev.points_roundtrip_long(sf_small),
        """
        SELECT user_id, epoch_ms(ts) AS ts_ms,
               CAST(round(value * 100) AS BIGINT) AS cents
        FROM events
        """,
        sf_small, ["user_id", "ts_ms"],
    )


def test_sessionize_time_sliced_equals_unsliced(ray_session, sf_small):
    """Time-sliced sessionization (hot-user path) must equal the
    single-partition-per-user result exactly — boundary stitching is an
    exact reconstruction, not an approximation."""
    key = ["user_id", "session_seq"]
    base = ev.sessionize(sf_small).to_pandas().sort_values(
        key).reset_index(drop=True)
    sliced = ev.sessionize(sf_small, slice_ms=6 * 3_600_000).to_pandas(
    ).sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(sliced[base.columns], base)


def test_asof_time_sliced_equals_unsliced(ray_session, sf_small):
    sliced = ev.asof_last_match(sf_small, slice_ms=6 * 3_600_000
                                ).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    base = ev.asof_last_match(sf_small).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(sliced[base.columns], base)


def test_hot_user_time_sliced_boundary_stitching(ray_session, tmp_path):
    """One user dominating the table, sessions and purchases crossing many
    slice boundaries: the sliced paths must agree with the unsliced ones
    (which are themselves oracle-proven) — including sessions that span
    several empty-slice gaps and events whose nearest purchase is many
    slices back."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(13)
    day_us = 86_400_000_000
    t0 = 1_600_000_000_000_000
    # hot user: bursts every ~2h over 30 days (sessions often cross the
    # 6h slice cuts); purchases only in the first week → later events
    # carry across many slices
    n_hot = 20_000
    ts = np.sort(t0 + rng.choice(30 * day_us, n_hot, replace=False))
    etype = np.where(
        (ts < t0 + 7 * day_us) & (rng.uniform(size=n_hot) < 0.02),
        "purchase", "view")
    users = [np.full(n_hot, 1)]
    tss, types = [ts], [etype]
    for u in range(2, 7):
        t = np.sort(t0 + rng.choice(30 * day_us, 200, replace=False))
        users.append(np.full(200, u))
        tss.append(t)
        types.append(np.where(rng.uniform(size=200) < 0.1,
                              "purchase", "view"))
    user_id = np.concatenate(users).astype(np.int64)
    ts_us = np.concatenate(tss).astype(np.int64)
    event_type = np.concatenate(types)
    n = len(ts_us)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(user_id),
        "event_type": pa.array(event_type),
        "ts": pa.array(ts_us, pa.timestamp("us")),
        "value": pa.array(np.round(rng.uniform(0, 100, n), 2)),
    }), str(tmp_path / "events.parquet"))
    sf = str(tmp_path)

    base = ev.asof_last_match(sf).to_pandas().sort_values(
        "event_id").reset_index(drop=True)
    sliced = ev.asof_last_match(sf, slice_ms=6 * 3_600_000).to_pandas(
    ).sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(sliced[base.columns], base)
    # the carry path actually fired: some event matched a purchase from an
    # earlier slice
    assert (base["last_match_ts"] >= 0).any()
    assert ((base["ts_ms"] - base["last_match_ts"])[
        base["last_match_ts"] >= 0] > 6 * 3_600_000).any()

    key = ["user_id", "session_seq"]
    b = ev.sessionize(sf).to_pandas().sort_values(key).reset_index(drop=True)
    s = ev.sessionize(sf, slice_ms=6 * 3_600_000).to_pandas().sort_values(
        key).reset_index(drop=True)
    pd.testing.assert_frame_equal(s[b.columns], b)
    # sessions really cross slice cuts (stitching fired)
    cut = 6 * 3_600_000
    assert ((b["session_start"] // cut) != (b["session_end"] // cut)).any()


def test_multi_format_source_equivalence(ray_session, tmp_path, sf_small):
    """The same pipeline over events.csv / events.jsonl must equal the
    parquet result exactly (format-autodetecting source + canonical-type
    normalization)."""
    import duckdb

    csv_dir = tmp_path / "csv"
    jsonl_dir = tmp_path / "jsonl"
    csv_dir.mkdir()
    jsonl_dir.mkdir()
    con = duckdb.connect()
    con.execute(f"""
        COPY (SELECT * FROM '{sf_small}/events.parquet')
        TO '{csv_dir}/events.csv' (HEADER, DELIMITER ',')""")
    con.execute(f"""
        COPY (SELECT * FROM '{sf_small}/events.parquet')
        TO '{jsonl_dir}/events.jsonl' (FORMAT JSON)""")

    key = ["user_id", "bucket_ms"]
    base = (ev.rollup(sf_small, "1h").to_pandas()
            .sort_values(key).reset_index(drop=True))
    for d in (csv_dir, jsonl_dir):
        got = (ev.rollup(str(d), "1h").to_pandas()
               .sort_values(key).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, base, check_exact=False,
                                      atol=1e-9)


def test_sliding_window_oracle(ray_session, sf_small):
    _cmp(
        ev.sliding_window(sf_small),
        """
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
                   FROM events)
        SELECT event_id, user_id, ts_us // 1000 AS ts_ms,
               CAST(count(*) OVER w AS BIGINT) AS w_cnt,
               round(sum(value) OVER w, 6) AS w_sum
        FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                            RANGE BETWEEN 3600000000 PRECEDING
                                  AND CURRENT ROW)
        """,
        sf_small, ["event_id"], atol=1e-9,
    )


def test_sliding_window_boundaries(ray_session, tmp_path):
    """RANGE window semantics: [ts−W, ts] inclusive both ends; equal-ts
    peers share one window; users never leak into each other."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    W = 3_600_000  # ms
    t0 = 1_600_000_000_000
    rows = [
        # user 1: a at t0, b at t0+W (a is exactly at b's left bound → IN),
        # c at t0+W+1 (a is OUT of c's window), d/e equal-ts peers
        (1, 1, t0, 1.0),
        (2, 1, t0 + W, 2.0),
        (3, 1, t0 + W + 1, 4.0),
        (4, 1, t0 + 2 * W + 2, 8.0),
        (5, 1, t0 + 2 * W + 2, 16.0),
        # user 2 inside user 1's span
        (6, 2, t0 + 1, 32.0),
    ]
    eid, uid, ts, val = map(np.array, zip(*rows))
    pq.write_table(pa.table({
        "event_id": pa.array(eid.astype(np.int64)),
        "user_id": pa.array(uid.astype(np.int64)),
        "ts": pa.array(ts.astype(np.int64),
                       pa.timestamp("ms")).cast(pa.timestamp("us")),
        "event_type": pa.array(np.full(len(eid), "view")),
        "value": pa.array(val.astype(np.float64)),
    }), str(tmp_path / "events.parquet"))
    got = (ev.sliding_window(str(tmp_path)).to_pandas()
           .set_index("event_id").sort_index())
    assert got.loc[1, "w_cnt"] == 1 and got.loc[1, "w_sum"] == 1.0
    assert got.loc[2, "w_cnt"] == 2 and got.loc[2, "w_sum"] == 3.0
    assert got.loc[3, "w_cnt"] == 2 and got.loc[3, "w_sum"] == 6.0
    # equal-ts peers: both rows see both values (plus nothing else in range)
    assert got.loc[4, "w_cnt"] == 2 and got.loc[4, "w_sum"] == 24.0
    assert got.loc[5, "w_cnt"] == 2 and got.loc[5, "w_sum"] == 24.0
    assert got.loc[6, "w_cnt"] == 1 and got.loc[6, "w_sum"] == 32.0


def test_value_histogram(ray_session, sf_small):
    _cmp(
        ev.value_histogram(sf_small),
        """
        SELECT event_type, CAST(floor(value / 10.0) AS BIGINT) AS bin,
               count(*) AS cnt, round(sum(value), 6) AS sum_v
        FROM events GROUP BY 1, 2
        """,
        sf_small, ["event_type", "bin"], atol=1e-6,
    )


def test_user_stats(ray_session, sf_small):
    _cmp(
        ev.user_stats(sf_small),
        """
        SELECT user_id, count(*) AS cnt,
               round(avg(value), 6) AS mean_v,
               round(stddev_samp(value), 6) AS std_v,
               round(corr(value, epoch_ms(ts)), 6) AS corr_ts
        FROM events GROUP BY 1
        """,
        sf_small, ["user_id"], atol=1e-9,
    )


def test_user_stats_single_point_user(ray_session, tmp_path):
    """A single-point user gets NULL stddev/corr (sample moments undefined)
    — NaN on the engine side, matching SQL NULL semantics."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "event_id": pa.array([1, 2, 3], pa.int64()),
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "ts": pa.array([1_600_000_000_000_000 + i * 1_000_000
                        for i in range(3)], pa.timestamp("us")),
        "event_type": pa.array(["view"] * 3),
        "value": pa.array([1.0, 3.0, 7.0]),
    }), str(tmp_path / "events.parquet"))
    got = (ev.user_stats(str(tmp_path)).to_pandas()
           .set_index("user_id").sort_index())
    assert got.loc[1, "cnt"] == 2 and got.loc[1, "mean_v"] == 2.0
    assert got.loc[2, "cnt"] == 1
    assert np.isnan(got.loc[2, "std_v"]) and np.isnan(got.loc[2, "corr_ts"])


def test_ewma(ray_session, sf_small):
    _cmp(
        ev.ewma_last(sf_small),
        """
        WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events),
        l AS (SELECT user_id, list(value ORDER BY ts_us) AS vs
              FROM p GROUP BY 1)
        SELECT user_id,
               round(list_reduce(vs, (acc, x) -> acc * 0.8 + 0.2 * x), 6)
                 AS ewma
        FROM l
        """,
        sf_small, ["user_id"], atol=0.0,
    )


def test_gapfill_interp(ray_session, sf_small):
    _cmp(
        ev.gapfill_interp(sf_small, "1h"),
        """
        WITH r AS (
          SELECT user_id,
                 epoch_ms(ts) - epoch_ms(ts) % 3600000 AS bucket_ms,
                 sum(value) AS sum_v
          FROM events GROUP BY 1, 2
        ), bounds AS (
          SELECT user_id, min(bucket_ms) AS lo, max(bucket_ms) AS hi
          FROM r GROUP BY 1
        ), grid AS (
          SELECT b.user_id, gs.g AS bucket_ms
          FROM bounds b, LATERAL
            (SELECT unnest(generate_series(b.lo, b.hi, 3600000)) AS g) gs
        ), j AS (
          SELECT g.user_id, g.bucket_ms, r.sum_v, r.user_id IS NULL AS filled
          FROM grid g LEFT JOIN r
            ON g.user_id = r.user_id AND g.bucket_ms = r.bucket_ms
        ), w AS (
          SELECT *,
            last_value(sum_v IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY bucket_ms) AS pv,
            last_value(CASE WHEN NOT filled THEN bucket_ms END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY bucket_ms) AS pb,
            first_value(sum_v IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY bucket_ms
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
            first_value(CASE WHEN NOT filled THEN bucket_ms END IGNORE NULLS)
              OVER (PARTITION BY user_id ORDER BY bucket_ms
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nb
          FROM j
        )
        SELECT user_id, bucket_ms,
               round(CASE WHEN filled
                          THEN pv + (nv - pv) * (bucket_ms - pb) / (nb - pb)
                          ELSE sum_v END, 6) AS v,
               filled
        FROM w
        """,
        sf_small, ["user_id", "bucket_ms"], atol=1e-6,
    )


def test_interp_partition_matches_np_interp():
    """The multi-series vectorized interpolation kernel equals per-series
    np.interp on the filled positions."""
    from gorilla_tsc_ray.stages.rollup import interp_partition

    rng = np.random.default_rng(7)
    frames = []
    for uid in range(5):
        n = rng.integers(2, 12)
        buckets = np.sort(rng.choice(np.arange(30), size=n, replace=False))
        frames.append(pd.DataFrame({
            "user_id": uid, "bucket_ms": buckets * 100,
            "sum_v": rng.uniform(-5, 5, n)}))
    df = pd.concat(frames, ignore_index=True).sample(frac=1, random_state=3)
    got = interp_partition(df, bucket_ms=100, key_cols=["user_id"])
    for uid, g in got.groupby("user_id"):
        src = df[df["user_id"] == uid].sort_values("bucket_ms")
        exp = np.interp(g["bucket_ms"].to_numpy(),
                        src["bucket_ms"].to_numpy(), src["sum_v"].to_numpy())
        np.testing.assert_allclose(g["v"].to_numpy(), exp, atol=1e-12)
        present = set(src["bucket_ms"])
        assert (~g["filled"]).sum() == len(present)
        assert set(g.loc[~g["filled"], "bucket_ms"]) == present


def test_signup_funnel_boundaries(ray_session, tmp_path):
    """Strictly-after start, inclusive window end, first purchase wins,
    other users' purchases never convert a signup."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    W = 3_600_000
    t0 = 1_600_000_000_000
    rows = [
        (1, 1, t0, "signup", 0.0),          # converts: purchase at t0+W
        (2, 1, t0, "purchase", 1.0),        # same instant → does NOT count
        (3, 1, t0 + W, "purchase", 2.0),    # inclusive end → counts
        (4, 1, t0 + W + 1, "purchase", 3.0),
        (5, 1, t0 + 2 * W, "signup", 0.0),  # no purchase after → no convert
        (6, 2, t0 + 1, "purchase", 4.0),    # other user
        (7, 2, t0 + 2, "signup", 0.0),      # user 2: no purchase after
    ]
    eid, uid, ts, et, val = map(np.array, zip(*rows))
    pq.write_table(pa.table({
        "event_id": pa.array(eid.astype(np.int64)),
        "user_id": pa.array(uid.astype(np.int64)),
        "ts": pa.array(ts.astype(np.int64),
                       pa.timestamp("ms")).cast(pa.timestamp("us")),
        "event_type": pa.array(et.astype(str)),
        "value": pa.array(val.astype(np.float64)),
    }), str(tmp_path / "events.parquet"))
    got = (ev.signup_purchase_funnel(str(tmp_path)).to_pandas()
           .set_index("event_id").sort_index())
    assert bool(got.loc[1, "converted"]) is True
    assert got.loc[1, "first_purchase_ms"] == t0 + W
    assert bool(got.loc[5, "converted"]) is False
    assert got.loc[5, "first_purchase_ms"] == -1
    assert bool(got.loc[7, "converted"]) is False


def test_daily_distinct_types(ray_session, sf_small):
    _cmp(
        ev.daily_distinct_types(sf_small),
        """
        SELECT user_id,
               epoch_ms(ts) - epoch_ms(ts) % 86400000 AS day_ms,
               CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        FROM events GROUP BY 1, 2
        """,
        sf_small, ["user_id", "day_ms"],
    )


def test_running_total(ray_session, sf_small):
    _cmp(
        ev.running_total(sf_small),
        """
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
                   FROM events)
        SELECT event_id, user_id, ts_us // 1000 AS ts_ms,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_us
                                      ROWS UNBOUNDED PRECEDING), 6)
                 AS running_sum
        FROM p
        """,
        sf_small, ["event_id"], atol=1e-9,
    )


def test_percent_rank_ties(ray_session, tmp_path):
    """SQL rank() semantics: ties share the first-equal rank, gaps after;
    percent_rank = (rank-1)/(n-1)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = 1_600_000_000_000
    vals = [5.0, 1.0, 5.0, 3.0, 7.0]  # sorted 1,3,5,5,7 → rank 1,2,3,3,5
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(5, dtype=np.int64)),
        "user_id": pa.array(np.ones(5, dtype=np.int64)),
        "ts": pa.array([t0 + i for i in range(5)],
                       pa.timestamp("ms")).cast(pa.timestamp("us")),
        "event_type": pa.array(["view"] * 5),
        "value": pa.array(vals),
    }), str(tmp_path / "events.parquet"))
    got = (ev.value_percent_rank(str(tmp_path)).to_pandas()
           .sort_values(["value", "ts_ms"]).reset_index(drop=True))
    assert list(got["rnk"]) == [1, 2, 3, 3, 5]
    assert list(got["dense_rnk"]) == [1, 2, 3, 3, 4]
    np.testing.assert_allclose(got["pct_rank"],
                               [0.0, 0.25, 0.5, 0.5, 1.0], atol=1e-6)


@pytest.mark.parametrize("op", [
    lambda sf: ev.sliding_window(sf),
    lambda sf: ev.value_histogram(sf),
    lambda sf: ev.user_stats(sf),
    lambda sf: ev.ewma_last(sf),
    lambda sf: ev.signup_purchase_funnel(sf),
    lambda sf: ev.daily_distinct_types(sf),
    lambda sf: ev.running_total(sf),
    lambda sf: ev.value_percent_rank(sf),
])
def test_new_ops_empty_input(ray_session, tmp_path, op):
    """Every new operator returns an empty result (not an error) on an
    empty events table."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.table({
        "event_id": pa.array([], pa.int64()),
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "event_type": pa.array([], pa.string()),
        "value": pa.array([], pa.float64()),
    }), str(tmp_path / "events.parquet"))
    assert op(str(tmp_path)).count() == 0


def test_props_k_stats(ray_session, sf_small):
    _cmp(
        ev.props_k_stats(sf_small),
        """
        WITH e AS (
          SELECT event_type, CAST(props->>'$.k' AS BIGINT) AS k FROM events
        )
        SELECT event_type,
               CAST(count(k) AS BIGINT) AS cnt,
               CAST(sum(k) AS BIGINT) AS sum_k,
               min(k) AS min_k, max(k) AS max_k,
               round(CAST(sum(k) AS DOUBLE) / count(k), 6) AS avg_k
        FROM e GROUP BY 1
        """,
        sf_small, ["event_type"], atol=1e-9,
    )


def test_props_k_stats_malformed(ray_session, tmp_path):
    """NULL / unparseable props are skipped like SQL NULL aggregates."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = 1_600_000_000_000
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(4, dtype=np.int64)),
        "user_id": pa.array(np.ones(4, dtype=np.int64)),
        "ts": pa.array([t0 + i for i in range(4)],
                       pa.timestamp("ms")).cast(pa.timestamp("us")),
        "event_type": pa.array(["view"] * 4),
        "value": pa.array([1.0] * 4),
        "props": pa.array(['{"k": 5}', "not json", None, '{"k": -2}']),
    }), str(tmp_path / "events.parquet"))
    got = ev.props_k_stats(str(tmp_path)).to_pandas()
    assert len(got) == 1
    row = got.iloc[0]
    assert row["cnt"] == 2 and row["sum_k"] == 3
    assert row["min_k"] == -2 and row["max_k"] == 5


def test_ohlc(ray_session, sf_small):
    _cmp(
        ev.ohlc(sf_small, "1h"),
        """
        WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events)
        SELECT user_id, (ts_us // 1000 // 3600000) * 3600000 AS bucket_ms,
               round(arg_min(value, ts_us), 6) AS open_v,
               round(max(value), 6) AS high_v,
               round(min(value), 6) AS low_v,
               round(arg_max(value, ts_us), 6) AS close_v
        FROM p GROUP BY 1, 2
        """,
        sf_small, ["user_id", "bucket_ms"], atol=1e-9,
    )


def test_vwap(ray_session, sf_small):
    _cmp(
        ev.vwap(sf_small, "1h"),
        """
        WITH p AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, value,
                 CAST(props->>'$.k' AS BIGINT) AS k
          FROM events
        )
        SELECT user_id, ts_ms - ts_ms % 3600000 AS bucket_ms,
               round(sum(value * k) / sum(k), 6) AS vwap,
               CAST(sum(k) AS BIGINT) AS sum_w
        FROM p WHERE k IS NOT NULL GROUP BY 1, 2
        """,
        sf_small, ["user_id", "bucket_ms"], atol=1e-9,
    )


def test_type_share(ray_session, sf_small):
    _cmp(
        ev.type_share(sf_small),
        """
        SELECT event_type, count(*) AS cnt,
               round(count(*) * 1.0 / (SELECT count(*) FROM events), 6)
                 AS share
        FROM events GROUP BY 1
        """,
        sf_small, ["event_type"], atol=1e-9,
    )


def test_hourly_profile(ray_session, sf_small):
    _cmp(
        ev.hourly_profile(sf_small),
        """
        WITH p AS (
          SELECT event_type, (epoch_ms(ts) // 3600000) % 24 AS hour, value
          FROM events
        )
        SELECT event_type, hour, count(*) AS cnt,
               round(sum(value) / count(*), 6) AS mean_v
        FROM p GROUP BY 1, 2
        """,
        sf_small, ["event_type", "hour"], atol=1e-9,
    )


def test_grouping_sets(ray_session, sf_small):
    _cmp(
        ev.grouping_sets(sf_small),
        """
        SELECT coalesce(user_id, -1) AS user_id,
               coalesce(event_type, 'ALL') AS event_type,
               count(*) AS cnt, round(sum(value), 6) AS sum_v
        FROM events
        GROUP BY GROUPING SETS ((user_id, event_type), (user_id),
                                (event_type), ())
        """,
        sf_small, ["user_id", "event_type"], atol=1e-6,
    )


def test_above_user_mean(ray_session, sf_small):
    _cmp(
        ev.above_user_mean(sf_small),
        """
        WITH m AS (SELECT user_id, avg(value) AS mv FROM events GROUP BY 1)
        SELECT e.user_id, epoch_ms(e.ts) AS ts_ms, e.value
        FROM events e JOIN m USING (user_id) WHERE e.value > m.mv
        """,
        sf_small, ["user_id", "ts_ms"], atol=0.0,
    )


def test_retention_cohorts(ray_session, sf_small):
    _cmp(
        ev.retention_cohorts(sf_small),
        """
        WITH d AS (
          SELECT user_id, epoch_ms(ts) - epoch_ms(ts) % 86400000 AS day_ms
          FROM events
        ), f AS (
          SELECT user_id, min(day_ms) AS cohort_day FROM d GROUP BY 1
        )
        SELECT f.cohort_day,
               (d.day_ms - f.cohort_day) // 604800000 AS week_offset,
               CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users
        FROM d JOIN f USING (user_id)
        GROUP BY 1, 2
        """,
        sf_small, ["cohort_day", "week_offset"],
    )


def test_outliers(ray_session, sf_small):
    _cmp(
        ev.outliers(sf_small),
        """
        WITH m AS (
          SELECT user_id, avg(value) AS mv, stddev_samp(value) AS sv
          FROM events GROUP BY 1
        )
        SELECT e.user_id, epoch_ms(e.ts) AS ts_ms, e.value,
               round((e.value - m.mv) / m.sv, 6) AS zscore
        FROM events e JOIN m USING (user_id)
        WHERE abs(e.value - m.mv) > 2.0 * m.sv
        """,
        sf_small, ["user_id", "ts_ms"], atol=1e-9,
    )


def test_user_type_entropy(ray_session, sf_small):
    _cmp(
        ev.user_type_entropy(sf_small),
        """
        WITH c AS (
          SELECT user_id, event_type, count(*) AS cnt
          FROM events GROUP BY 1, 2
        ), t AS (
          SELECT user_id, sum(cnt) AS tot FROM c GROUP BY 1
        )
        SELECT c.user_id, CAST(t.tot AS BIGINT) AS n_events,
               round(-sum((c.cnt * 1.0 / t.tot)
                          * ln(c.cnt * 1.0 / t.tot)), 6) AS entropy
        FROM c JOIN t USING (user_id) GROUP BY 1, 2
        """,
        sf_small, ["user_id"], atol=1e-9,
    )


def test_latest_event_per_user(ray_session, sf_small):
    _cmp(
        ev.latest_event_per_user(sf_small),
        """
        SELECT user_id, event_id, epoch_us(ts) // 1000 AS ts_ms,
               event_type, value
        FROM events
        QUALIFY row_number() OVER (PARTITION BY user_id
                                   ORDER BY epoch_us(ts) DESC) = 1
        """,
        sf_small, ["user_id"],
    )


def test_type_transitions(ray_session, sf_small):
    _cmp(
        ev.type_transitions(sf_small),
        """
        WITH s AS (
          SELECT user_id, event_type AS cur_type,
                 lead(event_type) OVER (PARTITION BY user_id
                                        ORDER BY epoch_us(ts)) AS next_type
          FROM events
        ), c AS (
          SELECT cur_type, next_type, count(*) AS cnt FROM s
          WHERE next_type IS NOT NULL GROUP BY 1, 2
        )
        SELECT cur_type, next_type, cnt,
               round(cnt * 1.0 / sum(cnt) OVER (PARTITION BY cur_type), 6)
                 AS p_next
        FROM c
        """,
        sf_small, ["cur_type", "next_type"], atol=1e-9,
    )


def test_time_in_state(ray_session, sf_small):
    _cmp(
        ev.time_in_state(sf_small),
        """
        WITH s AS (
          SELECT user_id, event_type, epoch_us(ts) AS ts_us,
                 lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                          ORDER BY epoch_us(ts)) AS next_us
          FROM events
        )
        SELECT user_id, event_type,
               CAST(sum((next_us - ts_us) // 1000) AS BIGINT) AS total_ms,
               CAST(count(*) AS BIGINT) AS n_stays
        FROM s WHERE next_us IS NOT NULL GROUP BY 1, 2
        """,
        sf_small, ["user_id", "event_type"],
    )


def test_value_ntile(ray_session, sf_small):
    _cmp(
        ev.value_ntile(sf_small),
        """
        SELECT event_id, user_id, value,
               CAST(ntile(4) OVER (PARTITION BY user_id
                                   ORDER BY value, event_id) AS BIGINT)
                 AS tile
        FROM events
        """,
        sf_small, ["event_id"],
    )


def test_sliding_window_matches_bruteforce_random(ray_session, tmp_path):
    """Property: the searchsorted sliding kernel equals an O(n²) brute
    force on random event layouts (ties, bursts, singleton users)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(17)
    n = 400
    uid = rng.integers(1, 6, n)
    t0 = 1_600_000_000_000
    ts = t0 + np.sort(rng.integers(0, 20 * 3_600_000, n))
    ts[rng.random(n) < 0.1] = ts[0]          # deliberate equal-ts peers
    val = rng.uniform(0, 10, n).round(3)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(uid.astype(np.int64)),
        "ts": pa.array(ts.astype(np.int64),
                       pa.timestamp("ms")).cast(pa.timestamp("us")),
        "event_type": pa.array(np.full(n, "view")),
        "value": pa.array(val.astype(np.float64)),
    }), str(tmp_path / "events.parquet"))
    got = (ev.sliding_window(str(tmp_path)).to_pandas()
           .set_index("event_id").sort_index())
    W_us = 3_600_000_000
    ts_us = ts * 1000
    for i in range(n):
        mask = ((uid == uid[i]) & (ts_us >= ts_us[i] - W_us)
                & (ts_us <= ts_us[i]))
        assert got.loc[i, "w_cnt"] == mask.sum()
        np.testing.assert_allclose(got.loc[i, "w_sum"],
                                   round(val[mask].sum(), 6), atol=1e-6)


def test_windowed_ops_hot_user(ray_session, tmp_path):
    """Skew correctness: one user owning 95% of events still gets exact
    running totals and tiles (the per-user-sequential ops are documented
    as partition-bounded; this pins correctness, not speed)."""
    import duckdb as _dd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(23)
    n = 2000
    uid = np.where(rng.random(n) < 0.95, 7, rng.integers(1, 4, n))
    t0 = 1_600_000_000_000_000
    ts = t0 + np.sort(rng.choice(np.arange(10_000_000), n, replace=False))
    val = rng.uniform(0, 100, n)
    pq.write_table(pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "user_id": pa.array(uid.astype(np.int64)),
        "ts": pa.array(ts.astype(np.int64), pa.timestamp("us")),
        "event_type": pa.array(np.full(n, "view")),
        "value": pa.array(val.astype(np.float64)),
    }), str(tmp_path / "events.parquet"))
    got = (ev.running_total(str(tmp_path)).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    con = _dd.connect()
    exp = con.execute(f"""
        WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS ts_us, value
                   FROM '{tmp_path}/events.parquet')
        SELECT event_id, user_id, ts_us // 1000 AS ts_ms,
               round(sum(value) OVER (PARTITION BY user_id ORDER BY ts_us
                                      ROWS UNBOUNDED PRECEDING), 6)
                 AS running_sum
        FROM p ORDER BY event_id
    """).df()
    np.testing.assert_allclose(got["running_sum"], exp["running_sum"],
                               atol=1e-6)


def test_session_conversion(ray_session, sf_small):
    got = (ev.session_conversion(sf_small).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    # cross-check against the oracle-green sessionize output: session
    # counts must agree
    sessions = ev.sessionize(sf_small).to_pandas()
    n_per_user = (sessions.groupby("user_id")["session_seq"].nunique()
                  .sort_index())
    assert (got.set_index("user_id")["n_sessions"].sort_index()
            == n_per_user).all()
    assert ((got["n_converting"] >= 0)
            & (got["n_converting"] <= got["n_sessions"])).all()
    np.testing.assert_allclose(
        got["conv_rate"],
        (got["n_converting"] / got["n_sessions"]).round(6), atol=1e-9)


def test_rollup_multi_tier(ray_session, sf_small):
    multi = ev.rollup_multi_tier(sf_small).to_pandas()
    for tier in ("1m", "1h", "1d"):
        part = (multi.loc[multi["tier"] == tier]
                .drop(columns="tier")
                .sort_values(["user_id", "bucket_ms"])
                .reset_index(drop=True))
        single = (ev.rollup(sf_small, tier).to_pandas()
                  .sort_values(["user_id", "bucket_ms"])
                  .reset_index(drop=True))
        pd.testing.assert_frame_equal(part[single.columns], single,
                                      check_exact=False, atol=1e-9)


def test_busy_user_days(ray_session, sf_small):
    _cmp(
        ev.busy_user_days(sf_small),
        """
        SELECT user_id,
               epoch_ms(ts) - epoch_ms(ts) % 86400000 AS day_ms,
               count(*) AS cnt
        FROM events GROUP BY 1, 2 HAVING count(*) >= 3
        """,
        sf_small, ["user_id", "day_ms"],
    )


def test_asof_next_purchase(ray_session, sf_small):
    _cmp(
        ev.asof_next_match(sf_small),
        """
        WITH e AS (
          SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, ts FROM events
        ), p AS (
          SELECT user_id, epoch_ms(ts) AS pts_ms, value AS pvalue, ts
          FROM events WHERE event_type = 'purchase'
        )
        SELECT e.event_id, e.user_id, e.ts_ms,
               coalesce(p.pts_ms, -1) AS next_match_ts,
               coalesce(p.pvalue, -1.0) AS next_match_value
        FROM e ASOF LEFT JOIN p
          ON e.user_id = p.user_id AND e.ts < p.ts
        """,
        sf_small, ["event_id"],
    )


def test_streaming_out_of_order(ray_session, sf_small):
    _cmp(
        ev.streaming_out_of_order(sf_small),
        """
        WITH p AS (SELECT user_id, epoch_ms(ts) AS ts_ms, value
                   FROM events),
        a AS (
          SELECT *, max(ts_ms) OVER (PARTITION BY user_id
                                     ORDER BY value, ts_ms
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND 1 PRECEDING) AS wm
          FROM p
        )
        SELECT user_id, ts_ms, value FROM a WHERE wm IS NULL OR ts_ms > wm
        """,
        sf_small, ["user_id", "ts_ms"],
    )


def test_seasonal_anomalies(ray_session):
    """Flags match the DuckDB (event_type, hour-of-day) baseline mirror;
    every flagged row exceeds the threshold."""
    sf = "/root/testdata/sf0.001"
    ds = ev.seasonal_anomalies(sf)
    got = ds.to_pandas()
    if len(got):
        assert (got["zscore"].abs() > 3).all()
    _cmp(ds, """
WITH e AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, value,
         (epoch_ms(ts) // 3600000) % 24 AS hr
  FROM events
), s AS (
  SELECT event_type, hr, avg(value) AS mu, stddev_samp(value) AS sd,
         count(*) AS n
  FROM e GROUP BY 1, 2
)
SELECT e.user_id, e.ts_ms, e.event_type, e.value,
       round((e.value - s.mu) / s.sd, 6) AS zscore
FROM e JOIN s ON e.event_type = s.event_type AND e.hr = s.hr
WHERE s.n > 1 AND s.sd > 0 AND abs((e.value - s.mu) / s.sd) > 3
""", sf, ["user_id", "ts_ms", "event_type"], atol=1e-9)


def test_burstiness(ray_session):
    """Gap-CV burstiness matches the lag-window SQL mirror; B is within
    (-1, 1) by construction."""
    sf = "/root/testdata/sf0.001"
    ds = ev.burstiness(sf)
    got = ds.to_pandas()
    assert got["burstiness"].between(-1, 1).all()
    _cmp(ds, """
WITH g AS (
  SELECT user_id,
         CAST(epoch_ms(ts) - lag(epoch_ms(ts))
              OVER (PARTITION BY user_id ORDER BY ts) AS DOUBLE) AS gap
  FROM events
), s AS (
  SELECT user_id, count(gap) AS n_gaps, avg(gap) AS mu,
         stddev_samp(gap) AS sd
  FROM g WHERE gap IS NOT NULL GROUP BY 1
)
SELECT user_id, CAST(n_gaps AS BIGINT) AS n_gaps,
       round(mu, 3) AS mean_gap_ms, round(sd, 3) AS std_gap_ms,
       round((sd - mu) / (sd + mu), 6) AS burstiness
FROM s WHERE n_gaps >= 2 AND (sd + mu) > 0
""", sf, ["user_id"], atol=1e-9)


def test_seasonal_decompose_vs_duckdb(ray_session):
    """Integer-scaled STL-lite decomposition equals the SQL mirror, and the
    scaled columns reconstruct v exactly: 25*N*c == N*T + S + resid_num +
    N*(25c - T) identity aside, check the real-valued reconstruction."""
    sf = "/root/testdata/sf0.001"
    _cmp(ev.seasonal_decompose(sf), """
WITH p AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), h AS (
  SELECT user_id, ts_ms - ts_ms % 3600000 AS bucket_ms, sum(c) AS bc
  FROM p GROUP BY user_id, bucket_ms
), w AS (
  SELECT user_id, bucket_ms, bc,
         sum(bc) OVER win AS t, count(*) OVER win AS wn
  FROM h WINDOW win AS (PARTITION BY user_id ORDER BY bucket_ms
                        ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
), f AS (
  SELECT user_id, bucket_ms, bc, t, 25 * bc - t AS d,
         (bucket_ms // 3600000) % 24 AS hod
  FROM w WHERE wn = 25
), se AS (
  SELECT *, sum(d) OVER (PARTITION BY user_id, hod) AS s_num,
         count(*) OVER (PARTITION BY user_id, hod) AS cell_n
  FROM f
)
SELECT user_id, bucket_ms, CAST(bc AS BIGINT) AS v_cents,
       CAST(t AS BIGINT) AS trend_sum_cents, CAST(d AS BIGINT) AS detr_num,
       CAST(hod AS BIGINT) AS hod, CAST(cell_n AS BIGINT) AS cell_n,
       CAST(s_num AS BIGINT) AS seasonal_num,
       CAST(cell_n * d - s_num AS BIGINT) AS resid_num
FROM se
""", sf, ["user_id", "bucket_ms"])
    got = ev.seasonal_decompose(sf).to_pandas()
    assert len(got)
    # additive reconstruction: v == trend + seasonal + resid exactly in
    # the scaled rational arithmetic
    n = got["cell_n"].to_numpy()
    lhs = 25 * n * got["v_cents"].to_numpy()
    rhs = (n * got["trend_sum_cents"].to_numpy()
           + got["seasonal_num"].to_numpy() + got["resid_num"].to_numpy())
    np.testing.assert_array_equal(lhs, rhs)
    # seasonal numerators sum to zero within each (user, hod) cell:
    # sum(resid_num) over a cell == 0 by construction
    grp = got.groupby(["user_id", "hod"])["resid_num"].sum()
    assert (grp == 0).all()


def test_mix_sample_vs_duckdb(ray_session):
    from gorilla_tsc_ray.pipelines import docs
    sf = "/root/testdata/sf0.001"
    got = (docs.mix_sample(sf).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    exp = con.execute("""
SELECT doc_id, lang,
       CAST(md5_number_upper(CAST(doc_id AS VARCHAR)) % 100
            AS BIGINT) AS bucket
FROM documents
WHERE md5_number_upper(CAST(doc_id AS VARCHAR)) % 100 <
      CASE lang WHEN 'en' THEN 40 WHEN 'de' THEN 70 ELSE 100 END
ORDER BY doc_id""").df().reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp)
    # en is downsampled harder than the rest
    full = con.execute(
        "SELECT lang, count(*) n FROM documents GROUP BY 1").df()
    kept = got.groupby("lang").size()
    fr = {r["lang"]: kept.get(r["lang"], 0) / r["n"]
          for _, r in full.iterrows()}
    assert fr["en"] < 0.55


def test_winsorize_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.winsorize(sf), """
WITH p AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c FROM events
), r AS (
  SELECT user_id, c,
         row_number() OVER (PARTITION BY user_id ORDER BY c) - 1 AS rk,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM p
), b AS (
  SELECT user_id, n,
         max(CASE WHEN rk = ((n - 1) * 5) // 100 THEN c END) AS lo_c,
         max(CASE WHEN rk = ((n - 1) * 95 + 99) // 100 THEN c END) AS hi_c
  FROM r GROUP BY user_id, n
)
SELECT r.user_id, CAST(b.n AS BIGINT) AS n,
       CAST(b.lo_c AS BIGINT) AS lo_cents,
       CAST(b.hi_c AS BIGINT) AS hi_cents,
       CAST(sum(CASE WHEN r.c < b.lo_c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clip_lo,
       CAST(sum(CASE WHEN r.c > b.hi_c THEN 1 ELSE 0 END)
            AS BIGINT) AS n_clip_hi,
       CAST(sum(least(greatest(r.c, b.lo_c), b.hi_c))
            AS BIGINT) AS wsum_cents
FROM r JOIN b USING (user_id)
GROUP BY r.user_id, b.n, b.lo_c, b.hi_c
""", sf, ["user_id"])
    got = ev.winsorize(sf).to_pandas()
    # clip invariants: bounds ordered, clipped mass within [n*lo, n*hi]
    assert (got["lo_cents"] <= got["hi_cents"]).all()
    assert (got["wsum_cents"] >= got["n"] * got["lo_cents"]).all()
    assert (got["wsum_cents"] <= got["n"] * got["hi_cents"]).all()


def test_m4_downsample_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.m4_downsample(sf, "1h"), """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS ts_us, value,
         (epoch_us(ts) // 1000 // 3600000) * 3600000 AS bucket_ms
  FROM events
), rk AS (
  SELECT *,
    row_number() OVER (PARTITION BY user_id, bucket_ms
                       ORDER BY ts_us) AS r_first,
    row_number() OVER (PARTITION BY user_id, bucket_ms
                       ORDER BY ts_us DESC) AS r_last,
    row_number() OVER (PARTITION BY user_id, bucket_ms
                       ORDER BY value, ts_us) AS r_min,
    row_number() OVER (PARTITION BY user_id, bucket_ms
                       ORDER BY value DESC, ts_us) AS r_max
  FROM p
)
SELECT user_id, bucket_ms,
  max(CASE WHEN r_first = 1 THEN ts_us END) AS first_ts_us,
  round(max(CASE WHEN r_first = 1 THEN value END), 6) AS first_v,
  max(CASE WHEN r_last = 1 THEN ts_us END) AS last_ts_us,
  round(max(CASE WHEN r_last = 1 THEN value END), 6) AS last_v,
  max(CASE WHEN r_min = 1 THEN ts_us END) AS min_ts_us,
  round(max(CASE WHEN r_min = 1 THEN value END), 6) AS min_v,
  max(CASE WHEN r_max = 1 THEN ts_us END) AS max_ts_us,
  round(max(CASE WHEN r_max = 1 THEN value END), 6) AS max_v
FROM rk GROUP BY user_id, bucket_ms
""", sf, ["user_id", "bucket_ms"])
    got = ev.m4_downsample(sf, "1h").to_pandas()
    # M4 invariants: the four points bound each other and sit in-bucket
    assert (got["min_v"] <= got[["first_v", "last_v", "max_v"]]
            .min(axis=1)).all()
    assert (got["max_v"] >= got[["first_v", "last_v", "min_v"]]
            .max(axis=1)).all()
    assert (got["first_ts_us"] <= got["last_ts_us"]).all()
    for c in ("first_ts_us", "min_ts_us", "max_ts_us", "last_ts_us"):
        assert ((got[c] // 1000 // 3600000 * 3600000)
                == got["bucket_ms"]).all()


def test_cusum_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.cusum(sf), """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS c FROM events
), r AS (
  SELECT user_id, c,
         row_number() OVER (PARTITION BY user_id ORDER BY c) - 1 AS rk,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM p
), t AS (
  SELECT user_id, n,
         max(CASE WHEN rk = (n - 1) // 2 THEN c END) AS target
  FROM r GROUP BY user_id, n
), s AS (
  SELECT p.user_id, p.ts_us, t.n, t.target,
         sum(p.c - t.target) OVER (PARTITION BY p.user_id ORDER BY p.ts_us
             ROWS UNBOUNDED PRECEDING) AS pref
  FROM p JOIN t USING (user_id)
), cu AS (
  SELECT user_id, n, target, pref
         - least(0, min(pref) OVER (PARTITION BY user_id ORDER BY ts_us
                  ROWS UNBOUNDED PRECEDING)) AS s_stat,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts_us DESC) AS rdesc
  FROM s
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CAST(target AS BIGINT) AS target_cents,
       CAST(max(CASE WHEN rdesc = 1 THEN s_stat END) AS BIGINT) AS final_s,
       CAST(max(s_stat) AS BIGINT) AS max_s,
       CAST(sum(CASE WHEN s_stat >= 500 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_alarms
FROM cu GROUP BY user_id, n, target
""", sf, ["user_id"])
    got = ev.cusum(sf).to_pandas()
    # CUSUM invariants: statistic is non-negative, alarms bounded by n
    assert (got["max_s"] >= 0).all() and (got["final_s"] >= 0).all()
    assert (got["max_s"] >= got["final_s"]).all()
    assert (got["n_alarms"] <= got["n"]).all()


def test_cusum_closed_form_equals_recursion():
    # the grouped-cummin closed form IS Page's recursion
    rng = np.random.default_rng(7)
    for _ in range(20):
        d = rng.integers(-50, 50, size=rng.integers(1, 200))
        s, out = 0, []
        for x in d:
            s = max(0, s + int(x))
            out.append(s)
        pref = np.cumsum(d)
        closed = pref - np.minimum(np.minimum.accumulate(pref), 0)
        np.testing.assert_array_equal(np.array(out), closed)


def test_active_intervals_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.active_intervals(sf), """
WITH p AS (
  SELECT user_id, epoch_us(ts) // 1000 AS s,
         epoch_us(ts) // 1000 + 60000 AS e FROM events
), w AS (
  SELECT user_id, s, e,
         max(e) OVER (PARTITION BY user_id ORDER BY s, e
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pme
  FROM p
), isl AS (
  SELECT user_id, s, e,
         sum(CASE WHEN pme IS NULL OR s > pme THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY s, e
                 ROWS UNBOUNDED PRECEDING) AS island
  FROM w
), g AS (
  SELECT user_id, island, min(s) AS st, max(e) AS en
  FROM isl GROUP BY 1, 2
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(sum(en - st) AS BIGINT) AS active_ms,
       CAST(max(en - st) AS BIGINT) AS max_interval_ms
FROM g GROUP BY user_id
""", sf, ["user_id"])
    got = ev.active_intervals(sf).to_pandas()
    # interval-union invariants: each merged interval >= one window;
    # total coverage between one window and n_intervals * longest
    assert (got["max_interval_ms"] >= 60000).all()
    assert (got["active_ms"] >= got["n_intervals"] * 60000).all()
    assert (got["active_ms"]
            <= got["n_intervals"] * got["max_interval_ms"]).all()


def test_autocorr_moments_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.autocorr_moments(sf), """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS c FROM events
), s AS (
  SELECT user_id, c AS x,
         lead(c) OVER (PARTITION BY user_id ORDER BY ts_us) AS y
  FROM p
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       CAST(sum(x * y) AS BIGINT) AS sxy,
       CAST(sum(x * x) AS BIGINT) AS sx2,
       CAST(sum(y * y) AS BIGINT) AS sy2
FROM s WHERE y IS NOT NULL GROUP BY user_id
""", sf, ["user_id"])
    got = ev.autocorr_moments(sf).to_pandas()
    # Cauchy-Schwarz on the raw moments (float to avoid int64 overflow)
    sxy = got["sxy"].to_numpy(dtype=np.float64)
    assert (sxy * sxy <= got["sx2"].to_numpy(dtype=np.float64)
            * got["sy2"].to_numpy(dtype=np.float64) * (1 + 1e-12)).all()


def test_mad_outliers_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.mad_outliers(sf), """
WITH p AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c FROM events
), r AS (
  SELECT user_id, c,
         row_number() OVER (PARTITION BY user_id ORDER BY c) - 1 AS rk,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM p
), m AS (
  SELECT user_id, n, max(CASE WHEN rk = (n - 1) // 2 THEN c END) AS med
  FROM r GROUP BY user_id, n
), d AS (
  SELECT p.user_id, m.n, m.med, abs(p.c - m.med) AS dev
  FROM p JOIN m USING (user_id)
), dr AS (
  SELECT user_id, n, med, dev,
         row_number() OVER (PARTITION BY user_id ORDER BY dev) - 1 AS rk
  FROM d
), mad AS (
  SELECT user_id, n, med,
         max(CASE WHEN rk = (n - 1) // 2 THEN dev END) AS mad
  FROM dr GROUP BY user_id, n, med
)
SELECT d.user_id, CAST(d.n AS BIGINT) AS n,
       CAST(d.med AS BIGINT) AS med_cents,
       CAST(mad.mad AS BIGINT) AS mad_cents,
       CAST(sum(CASE WHEN d.dev > 3 * mad.mad THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outliers
FROM d JOIN mad USING (user_id)
GROUP BY d.user_id, d.n, d.med, mad.mad
""", sf, ["user_id"])
    got = ev.mad_outliers(sf).to_pandas()
    # at least half the points sit within the MAD band by construction
    assert (got["n_outliers"] * 2 <= got["n"]).all()


def test_rle_segments_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.rle_segments(sf), """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS c FROM events
), s AS (
  SELECT user_id, ts_us, c,
         lag(c) OVER (PARTITION BY user_id ORDER BY ts_us) AS pc
  FROM p
), isl AS (
  SELECT user_id, ts_us,
         sum(CASE WHEN pc IS NULL OR c <> pc THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts_us
                 ROWS UNBOUNDED PRECEDING) AS run_id
  FROM s
), runs AS (
  SELECT user_id, run_id, count(*) AS run_len
  FROM isl GROUP BY 1, 2
)
SELECT user_id, CAST(sum(run_len) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_runs,
       CAST(max(run_len) AS BIGINT) AS max_run_len
FROM runs GROUP BY user_id
""", sf, ["user_id"])
    got = ev.rle_segments(sf).to_pandas()
    assert (got["n_runs"] <= got["n"]).all()
    assert (got["max_run_len"] * got["n_runs"] >= got["n"]).all()


def test_quantile_bands_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.quantile_bands(sf, "1h"), """
WITH p AS (
  SELECT event_type,
         (epoch_us(ts) // 1000 // 3600000) * 3600000 AS bucket_ms,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
), r AS (
  SELECT event_type, bucket_ms, c,
         row_number() OVER (PARTITION BY event_type, bucket_ms
                            ORDER BY c) - 1 AS rk,
         count(*) OVER (PARTITION BY event_type, bucket_ms) AS n
  FROM p
)
SELECT event_type, bucket_ms, CAST(n AS BIGINT) AS n,
       CAST(max(CASE WHEN rk = (n - 1) * 50 // 100 THEN c END)
            AS BIGINT) AS p50_cents,
       CAST(max(CASE WHEN rk = ((n - 1) * 95 + 99) // 100 THEN c END)
            AS BIGINT) AS p95_cents
FROM r GROUP BY event_type, bucket_ms, n
""", sf, ["event_type", "bucket_ms"])
    got = ev.quantile_bands(sf, "1h").to_pandas()
    assert (got["p50_cents"] <= got["p95_cents"]).all()


def test_drawdown_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.drawdown(sf), """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS c FROM events
), s AS (
  SELECT user_id, c,
         max(c) OVER (PARTITION BY user_id ORDER BY ts_us
                      ROWS UNBOUNDED PRECEDING) AS rm
  FROM p
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(max(c) AS BIGINT) AS peak_cents,
       CAST(max(rm - c) AS BIGINT) AS max_drawdown_cents
FROM s GROUP BY user_id
""", sf, ["user_id"])
    got = ev.drawdown(sf).to_pandas()
    assert (got["max_drawdown_cents"] >= 0).all()


def test_rolling_window_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.rolling_window(sf, 5), """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS c FROM events
)
SELECT user_id, ts_us,
       CAST(count(*) OVER w AS BIGINT) AS n_w,
       CAST(sum(c) OVER w AS BIGINT) AS sum_w,
       CAST(min(c) OVER w AS BIGINT) AS min_w,
       CAST(max(c) OVER w AS BIGINT) AS max_w
FROM p
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
""", sf, ["user_id", "ts_us"])
    got = ev.rolling_window(sf, 5).to_pandas()
    assert got["n_w"].between(1, 5).all()
    assert (got["min_w"] * got["n_w"] <= got["sum_w"]).all()
    assert (got["max_w"] * got["n_w"] >= got["sum_w"]).all()


def test_records_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.records(sf), """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS c FROM events
), s AS (
  SELECT user_id, ts_us, c,
         max(c) OVER (PARTITION BY user_id ORDER BY ts_us
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS pm
  FROM p
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN pm IS NULL OR c > pm THEN 1 ELSE 0 END)
            AS BIGINT) AS n_records,
       CAST(max(CASE WHEN pm IS NULL OR c > pm THEN ts_us END)
            AS BIGINT) AS last_record_ts_us,
       CAST(max(c) AS BIGINT) AS record_cents
FROM s GROUP BY user_id
""", sf, ["user_id"])
    got = ev.records(sf).to_pandas()
    assert (got["n_records"] >= 1).all()
    assert (got["n_records"] <= got["n"]).all()


def test_velocity_window_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.velocity_window(sf), """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS c FROM events
)
SELECT user_id, ts_us,
       CAST(count(*) OVER w AS BIGINT) AS n_w,
       CAST(sum(c) OVER w AS BIGINT) AS sum_w
FROM p
WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
""", sf, ["user_id", "ts_us"])
    got = ev.velocity_window(sf).to_pandas()
    assert (got["n_w"] >= 1).all()


def test_type_concentration_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.type_concentration(sf), """
WITH c AS (
  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2
)
SELECT user_id, CAST(sum(cnt) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_types,
       CAST(sum(cnt * cnt) AS BIGINT) AS hhi_num
FROM c GROUP BY user_id
""", sf, ["user_id"])
    got = ev.type_concentration(sf).to_pandas()
    # HHI bounds: n^2/n_types <= hhi_num <= n^2
    assert (got["hhi_num"] * got["n_types"] >= got["n"] ** 2).all()
    assert (got["hhi_num"] <= got["n"] ** 2).all()


def test_gini_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.gini(sf), """
WITH p AS (
  SELECT user_id, CAST(round(value * 100) AS BIGINT) AS c FROM events
), r AS (
  SELECT user_id, c,
         row_number() OVER (PARTITION BY user_id ORDER BY c) - 1 AS rk,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM p
)
SELECT user_id, CAST(any_value(n) AS BIGINT) AS n,
       CAST(sum(c) AS BIGINT) AS sum_cents,
       CAST(sum(c * (2 * rk - n + 1)) AS BIGINT) AS pairdiff_sum
FROM r GROUP BY user_id
""", sf, ["user_id"])
    got = ev.gini(sf).to_pandas()
    assert (got["pairdiff_sum"] >= 0).all()


def test_benford_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.benford(sf), """
WITH p AS (
  SELECT event_type,
         abs(CAST(round(value * 100) AS BIGINT)) AS d FROM events
)
SELECT event_type,
       CAST(substring(CAST(d AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       CAST(count(*) AS BIGINT) AS cnt
FROM p WHERE d > 0 GROUP BY 1, 2
""", sf, ["event_type", "digit"])
    got = ev.benford(sf).to_pandas()
    assert got["digit"].between(1, 9).all()


def test_interarrival_hist_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.interarrival_hist(sf), """
WITH p AS (
  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
), g AS (
  SELECT event_type,
         ts_us - lag(ts_us) OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts_us) AS gap
  FROM p
)
SELECT event_type, CAST(length(bin(gap)) - 1 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt
FROM g WHERE gap > 0 GROUP BY 1, 2
""", sf, ["event_type", "bucket"])
    got = ev.interarrival_hist(sf).to_pandas()
    assert (got["bucket"] >= 0).all()


def test_frexp_bucket_exact_at_powers_of_two():
    g = np.array([1, 2, 3, 4, 1023, 1024, 1025, 2**40, 2**40 - 1],
                 dtype=np.int64)
    bucket = np.frexp(g.astype(np.float64))[1] - 1
    expect = np.array([len(bin(int(x))) - 3 for x in g])  # '0b' prefix
    np.testing.assert_array_equal(bucket, expect)


def test_peaks_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.peaks(sf), """
WITH p AS (
  SELECT user_id, epoch_us(ts) AS ts_us,
         CAST(round(value * 100) AS BIGINT) AS c FROM events
), w AS (
  SELECT user_id, c,
         lag(c) OVER (PARTITION BY user_id ORDER BY ts_us) AS pc,
         lead(c) OVER (PARTITION BY user_id ORDER BY ts_us) AS nc
  FROM p
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CASE WHEN pc IS NOT NULL AND nc IS NOT NULL
                     AND c > pc AND c > nc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_peaks,
       CAST(sum(CASE WHEN pc IS NOT NULL AND nc IS NOT NULL
                     AND c < pc AND c < nc THEN 1 ELSE 0 END) AS BIGINT)
         AS n_valleys
FROM w GROUP BY user_id
""", sf, ["user_id"])
    got = ev.peaks(sf).to_pandas()
    # peaks and valleys alternate: counts differ by at most 1 per user
    assert (np.abs(got["n_peaks"] - got["n_valleys"]) <= 1).all()


def test_stickiness_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.stickiness(sf), """
WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id
            FROM events),
mu AS (SELECT DISTINCT strftime(ts, '%Y-%m') AS month, user_id
       FROM events),
a AS (SELECT strftime(d, '%Y-%m') AS month,
             CAST(count(*) AS BIGINT) AS sum_dau,
             CAST(count(DISTINCT d) AS BIGINT) AS n_days
      FROM du GROUP BY 1),
b AS (SELECT month, CAST(count(*) AS BIGINT) AS mau FROM mu GROUP BY 1)
SELECT a.month, a.sum_dau, b.mau, a.n_days FROM a JOIN b USING (month)
""", sf, ["month"])
    got = ev.stickiness(sf).to_pandas()
    assert (got["mau"] <= got["sum_dau"]).all()  # every user has >=1 day
    assert (got["sum_dau"] <= got["mau"] * got["n_days"]).all()


def test_paa_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.paa(sf), """
WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events),
r AS (SELECT user_id, c,
             row_number() OVER (PARTITION BY user_id ORDER BY ts_us) - 1
               AS idx,
             count(*) OVER (PARTITION BY user_id) AS n FROM p)
SELECT user_id, CAST(idx * 8 // n AS BIGINT) AS seg,
       CAST(count(*) AS BIGINT) AS n_pts,
       CAST(sum(c) AS BIGINT) AS sum_cents
FROM r GROUP BY user_id, seg
""", sf, ["user_id", "seg"])
    got = ev.paa(sf).to_pandas()
    # segment counts per user differ by at most 1 (equal-count split)
    spread = got.groupby("user_id")["n_pts"].agg(["min", "max"])
    assert (spread["max"] - spread["min"] <= 1).all()


def test_haar_vs_duckdb_and_invertible(ray_session):
    sf = "/root/testdata/sf0.001"
    got = ev.haar_8(sf).to_pandas().sort_values("user_id")
    paa = ev.paa(sf).to_pandas()
    # every user with >=8 events appears exactly once
    n_users = (paa.groupby("user_id")["n_pts"].sum() >= 8).sum()
    assert len(got) == n_users
    # invertibility: the coefficient pyramid reconstructs the segment sums
    segs = (paa.pivot(index="user_id", columns="seg", values="sum_cents")
            .loc[got["user_id"]])
    b2_0 = (got["a0"] + got["d1"]) // 2
    b2_1 = (got["a0"] - got["d1"]) // 2
    b4_0 = (b2_0 + got["d2_0"]) // 2
    b4_1 = (b2_0 - got["d2_0"]) // 2
    s0 = (b4_0 + got["d3_0"]) // 2
    s1 = (b4_0 - got["d3_0"]) // 2
    np.testing.assert_array_equal(s0.to_numpy(), segs[0].to_numpy())
    np.testing.assert_array_equal(s1.to_numpy(), segs[1].to_numpy())
    np.testing.assert_array_equal(
        (b4_1 + got["d3_1"]).to_numpy() // 2, segs[2].to_numpy())
    # s4 = (b2_1 + d2_1 + 2·d3_2) / 4  (b2_1+d2_1 = 2(s4+s5))
    np.testing.assert_array_equal(
        (b2_1 + got["d2_1"] + 2 * got["d3_2"]).to_numpy() // 4,
        segs[4].to_numpy())
    # total conservation
    np.testing.assert_array_equal(
        got["a0"].to_numpy(),
        segs.sum(axis=1).to_numpy().astype(np.int64))


def test_sax_symbols_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.sax_symbols(sf), """
WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events),
r AS (SELECT user_id, ts_us,
             row_number() OVER (PARTITION BY user_id ORDER BY c, ts_us)
               - 1 AS rk,
             count(*) OVER (PARTITION BY user_id) AS n FROM p),
s AS (SELECT user_id, ts_us, rk * 4 // n AS sym FROM r),
t AS (SELECT user_id, ts_us, sym,
             lag(sym) OVER (PARTITION BY user_id ORDER BY ts_us) AS ps
      FROM s)
SELECT user_id, CAST(sym AS BIGINT) AS sym,
       CAST(count(*) AS BIGINT) AS n_pts,
       CAST(sum(CASE WHEN ps IS NULL OR sym <> ps THEN 1 ELSE 0 END)
            AS BIGINT) AS n_runs
FROM t GROUP BY user_id, sym
""", sf, ["user_id", "sym"])
    got = ev.sax_symbols(sf).to_pandas()
    assert (got["n_runs"] >= 1).all() and (
        got["n_runs"] <= got["n_pts"]).all()
    # rank quartiles: per-user symbol counts differ by at most 1
    spread = got.groupby("user_id")["n_pts"].agg(["min", "max", "count"])
    full = spread["count"] == 4
    assert (spread.loc[full, "max"] - spread.loc[full, "min"] <= 1).all()


def test_pareto_curve_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.pareto_curve(sf), """
WITH t AS (SELECT user_id,
                  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                    AS tot_cents
           FROM events GROUP BY 1)
SELECT user_id,
       CAST(row_number() OVER (ORDER BY tot_cents DESC, user_id)
            AS BIGINT) AS rnk,
       tot_cents,
       CAST(sum(tot_cents) OVER (ORDER BY tot_cents DESC, user_id
                                 ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cum_cents
FROM t
""", sf, ["rnk"])
    got = ev.pareto_curve(sf).to_pandas().sort_values("rnk")
    # prefix-scan invariants: ranks are 1..n, cumsum is the running total
    assert (got["rnk"].to_numpy() == np.arange(1, len(got) + 1)).all()
    np.testing.assert_array_equal(
        got["cum_cents"].to_numpy(),
        np.cumsum(got["tot_cents"].to_numpy()))
    # sorted descending by total
    assert (np.diff(got["tot_cents"].to_numpy()) <= 0).all()


def test_user_lifecycle_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.user_lifecycle(sf), """
WITH p AS (SELECT user_id, epoch_us(ts) AS ts_us FROM events),
agg AS (
  SELECT user_id, CAST(min(ts_us) AS BIGINT) AS first_ts_us,
         CAST(max(ts_us) AS BIGINT) AS last_ts_us,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(count(DISTINCT ts_us // 86400000000) AS BIGINT)
           AS n_active_days
  FROM p GROUP BY 1)
SELECT user_id, first_ts_us, last_ts_us, n_events, n_active_days,
       CAST(CASE WHEN last_ts_us < (SELECT max(ts_us) FROM p)
                      - 30 * 86400000000 THEN 1 ELSE 0 END AS BIGINT)
         AS churned
FROM agg
""", sf, ["user_id"])
    got = ev.user_lifecycle(sf).to_pandas()
    assert (got["first_ts_us"] <= got["last_ts_us"]).all()
    assert (got["n_active_days"] <= got["n_events"]).all()


def test_type_pivot_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.type_pivot(sf), """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_view
FROM events GROUP BY 1
""", sf, ["user_id"])
    got = ev.type_pivot(sf).to_pandas()
    # unpivot conservation: per-user row sums = total events
    import duckdb as _d
    total = _d.connect().execute(
        "SELECT count(*) FROM "
        "read_parquet('/root/testdata/sf0.001/events.parquet')"
    ).fetchone()[0]
    assert got[[c for c in got.columns if c != "user_id"]].to_numpy(
    ).sum() == total


def test_streaming_window_agg_equals_batch(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.streaming_window_agg(sf), """
WITH p AS (SELECT user_id, epoch_us(ts) // 1000 AS ts_ms,
                  CAST(round(value * 100) AS BIGINT) AS c FROM events)
SELECT user_id, (ts_ms // 3600000) * 3600000 AS window_ms,
       CAST(sum(c) AS BIGINT) AS sum_cents,
       CAST(count(*) AS BIGINT) AS cnt,
       CAST(min(c) AS BIGINT) AS min_c,
       CAST(max(c) AS BIGINT) AS max_c
FROM p GROUP BY 1, 2
""", sf, ["user_id", "window_ms"])


def test_session_paths_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.session_paths(sf), """
WITH p AS (
  SELECT user_id, ts, event_type,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                   OVER (PARTITION BY user_id ORDER BY ts) > 1800000
              OR lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                 IS NULL
              THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts, event_type,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM p
), r AS (
  SELECT user_id, session_seq, event_type,
         row_number() OVER (PARTITION BY user_id, session_seq
                            ORDER BY ts) AS rn
  FROM s
), paths AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY rn) AS path
  FROM r WHERE rn <= 3 GROUP BY 1, 2
)
SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY 1
""", sf, ["path"])
    got = ev.session_paths(sf).to_pandas()
    # total sessions equals the sessionize operator's session count
    n_sessions = len(ev.sessionize(sf).to_pandas())
    assert got["n_sessions"].sum() == n_sessions


def test_markov_transitions_vs_duckdb(ray_session):
    sf = "/root/testdata/sf0.001"
    _cmp(ev.markov_transitions(sf), """
WITH e AS (
  SELECT user_id, CAST(event_type AS VARCHAR) AS event_type,
         epoch_ms(ts) AS ts_ms
  FROM events
), p AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts_ms)
           AS to_type,
         lead(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms) - ts_ms
           AS gap
  FROM e
), c AS (
  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
  FROM p WHERE to_type IS NOT NULL AND gap <= 1800000
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS row_total
FROM c
""", sf, ["from_type", "to_type"])


def test_cooccurrence_pairs_canonical_order(ray_session):
    sf = "/root/testdata/sf0.001"
    got = ev.cooccurrence_pairs(sf).to_pandas()
    # every pair emitted in canonical orientation exactly once
    assert (got["type_a"] < got["type_b"]).all()
    assert not got.duplicated(["type_a", "type_b"]).any()


def test_hll_estimate_tracks_exact_distinct(ray_session):
    sf = "/root/testdata/sf0.001"
    regs = ev.hll_distinct_users(sf).to_pandas()
    est = ev.hll_estimate(regs)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exact = con.execute("""
SELECT CAST(event_type AS VARCHAR) AS event_type,
       count(DISTINCT user_id) AS n FROM events GROUP BY 1""").df()
    m = est.merge(exact, on="event_type")
    assert len(m) == len(exact)
    # p=9 -> 512 registers, standard error ~4.6%; allow 3 sigma
    rel = np.abs(m["estimate"] - m["n"]) / m["n"]
    assert (rel < 0.14).all(), rel.describe()


def test_crosscorr_lag0_is_symmetric(ray_session):
    sf = "/root/testdata/sf0.001"
    got = ev.crosscorr_1h(sf).to_pandas()
    lag0 = got[got["lag"] == 0]
    sym = lag0.merge(lag0, left_on=["type_a", "type_b"],
                     right_on=["type_b", "type_a"], suffixes=("", "_t"))
    assert len(sym) == len(lag0)
    assert (sym["dot"] == sym["dot_t"]).all()


def test_user_day_bitmaps_popcount_equals_active_days(ray_session):
    sf = "/root/testdata/sf0.001"
    got = ev.user_day_bitmaps(sf).to_pandas()
    pop = (got.assign(
        p=[bin(b).count("1") for b in got["bits"].to_numpy()])
        .groupby("user_id")["p"].sum())
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    exp = con.execute("""
SELECT user_id, count(DISTINCT epoch_us(ts) // 86400000000) AS d
FROM events GROUP BY 1""").df().set_index("user_id")["d"]
    assert pop.sort_index().equals(exp.sort_index().astype(np.int64))


def test_kmv_set_ops_above_capacity_estimates(ray_session):
    """With k far below the distinct-user count, the (k-1)/U_(k)
    estimator takes over — union/intersection estimates must stay within
    the KMV error envelope (~1/sqrt(k))."""
    sf = "/root/testdata/sf0.001"
    got = ev.kmv_set_ops(sf, k=64).to_pandas()
    exact = ev.kmv_set_ops(sf, k=1 << 20).to_pandas()  # exact registers
    m = got.merge(exact, on=["type_a", "type_b"], suffixes=("", "_x"))
    assert len(m) == len(exact)
    for c in ("n_a", "n_b", "n_union"):
        rel = np.abs(m[c] - m[f"{c}_x"]) / np.maximum(m[f"{c}_x"], 1)
        assert (rel < 0.5).all(), (c, rel.max())
    # inclusion-exclusion stays consistent within the sketch
    assert (got["n_inter"] == np.maximum(
        got["n_a"] + got["n_b"] - got["n_union"], 0)).all()


def test_lttb_sparse_series_matches_recursive_cte(ray_session, tmp_path):
    """Crafted series with n-2 < 8 interior points: floor bucketing leaves
    EMPTY buckets and the selection chain must stop at the first one on
    both sides (engine loop == recursive CTE join failure)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from gorilla_tsc_ray.pipelines import events as _ev

    rng = np.random.default_rng(3)
    rows = []
    for uid, n in [(1, 5), (2, 3), (3, 2), (4, 40)]:
        ts = np.sort(rng.choice(10**9, size=n, replace=False)) * 1000
        for t, v in zip(ts, rng.uniform(-50, 50, n)):
            rows.append((uid, t, float(np.round(v, 2))))
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([r[1] * 1000 for r in rows],
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([r[2] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows))})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))

    got = (_ev.lttb(str(tmp_path)).to_pandas()
           .sort_values(["user_id", "b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    import __ray_entry__ as entry
    exp = (con.execute(entry.oracle_sql()["events_lttb"]).df()
           .sort_values(["user_id", "b"]).reset_index(drop=True))
    assert len(got) == len(exp) == 8
    # the dense series selects all 8 buckets; every sparse series'
    # chain dies at its first empty bucket on BOTH sides
    assert set(got["user_id"]) == set(exp["user_id"]) == {4}
    for c in ("user_id", "b", "sel_x", "sel_y"):
        np.testing.assert_array_equal(got[c].to_numpy(),
                                      exp[c].to_numpy(), err_msg=c)


def test_running_distinct_vs_duckdb(ray_session, sf_small):
    import __ray_entry__ as entry

    _cmp(ev.running_distinct(sf_small),
         entry.oracle_sql()["events_running_distinct"],
         sf_small, ["day"])
    got = ev.running_distinct(sf_small).to_pandas().sort_values("day")
    # the cumulative column is a monotone prefix sum of new_users
    np.testing.assert_array_equal(
        got["cum_users"].to_numpy(),
        np.cumsum(got["new_users"].to_numpy()))


def test_user_skyline_vs_duckdb(ray_session, sf_small):
    import __ray_entry__ as entry

    _cmp(ev.user_skyline(sf_small),
         entry.oracle_sql()["events_user_skyline"], sf_small, ["user_id"])


def test_user_skyline_ties_survive(ray_session, tmp_path):
    """Equal (n_events, tot_cents) optima dominate neither way — BOTH
    must survive the front; a point dominated on one axis with equality
    on the other must NOT."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # users 1,2: two events of 5.00 each (tied optimum on both axes);
    # user 3: two events of 4.00 (dominated, equal n); user 4: one event
    # of 10.00 (equal cents to the optima, fewer events -> dominated)
    rows = [(1, 5.0), (1, 5.0), (2, 5.0), (2, 5.0),
            (3, 4.0), (3, 4.0), (4, 10.0)]
    tbl = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "ts": pa.array([i * 10**6 for i in range(len(rows))],
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "value": pa.array([r[1] for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows))})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = ev.user_skyline(str(tmp_path)).to_pandas()
    assert sorted(got["user_id"]) == [1, 2]


def test_rate_limit_vs_duckdb(ray_session, sf_small):
    import __ray_entry__ as entry

    _cmp(ev.rate_limit(sf_small),
         entry.oracle_sql()["events_rate_limit"],
         sf_small, ["user_id", "ts_ms", "event_id"])


def test_rate_limit_both_classes_and_invariants(ray_session, sf_mid):
    got = ev.rate_limit(sf_mid).to_pandas()
    # params chosen so sf0.01 exercises BOTH decision classes
    assert (got["accepted"] == 1).any() and (got["accepted"] == 0).any()
    assert got["tokens_m"].between(0, 3000).all()
    # a rejected event never consumes: tokens stay < 1000 at emission
    assert (got.loc[got["accepted"] == 0, "tokens_m"] < 1000).all()


def test_full_outer_vs_duckdb(ray_session, sf_small):
    import __ray_entry__ as entry
    from gorilla_tsc_ray.pipelines import relational as rel

    got = (rel.user_order_full_outer(sf_small).to_pandas()
           .sort_values("id").reset_index(drop=True))
    con = duckdb.connect()
    for t in ["events", "orders"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'/root/testdata/sf0.001/{t}.parquet'")
    exp = (con.execute(entry.oracle_sql()["rel_full_outer"]).df()
           .sort_values("id").reset_index(drop=True))
    assert len(got) == len(exp)
    exp = exp[got.columns]
    for c in got.columns:
        np.testing.assert_array_equal(
            got[c].to_numpy(), exp[c].to_numpy(), err_msg=c)
    # full-outer semantics: at least one side-exclusive row each way or
    # the flags column proves both sides were preserved
    assert (got["has_orders"] & ~got["has_events"]).any()


def test_sliding_distinct_vs_duckdb(ray_session, sf_small):
    import __ray_entry__ as entry

    _cmp(ev.sliding_distinct(sf_small),
         entry.oracle_sql()["events_sliding_distinct_7d"],
         sf_small, ["day"])


def test_sliding_distinct_interval_merge(ray_session, tmp_path):
    """Gapped activity: a user active on days {0, 3, 20} with W=7 covers
    windows 0..9 (merged run — day 3 joins day 0's interval) and 20..26;
    the merge must not bridge the 10..19 gap."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    days = [0, 3, 20]
    tbl = pa.table({
        "event_id": pa.array(range(len(days)), pa.int64()),
        "ts": pa.array([d * 86_400_000_000 for d in days],
                       pa.int64()).cast(pa.timestamp("us")),
        "user_id": pa.array([1] * len(days), pa.int64()),
        "event_type": pa.array(["view"] * len(days)),
        "value": pa.array([1.0] * len(days), pa.float64()),
        "props": pa.array(["{}"] * len(days))})
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = (ev.sliding_distinct(str(tmp_path)).to_pandas()
           .sort_values("day").reset_index(drop=True))
    assert list(got["day"]) == list(range(0, 21))
    exp = [1] * 10 + [0] * 10 + [1]
    assert list(got["n_users_7d"]) == exp


def test_bollinger_numerators_exact(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (ev.bollinger(sf).to_pandas()
           .sort_values(["user_id", "ts_us"]).reset_index(drop=True))
    # var numerator n·Σv²−(Σv)² is non-negative and zero iff window const
    v = got["var_num"].to_numpy()
    assert (v >= 0).all()
    # exact recompute for one user from the raw table
    import duckdb
    con = duckdb.connect()
    raw = con.execute(
        f"""SELECT user_id, epoch_us(ts) AS ts_us,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM '{sf}/events.parquet' ORDER BY user_id, ts_us""").df()
    u0 = raw["user_id"].iloc[0]
    c = raw.loc[raw["user_id"] == u0, "c"].to_numpy()
    g0 = got[got["user_id"] == u0]
    for i in range(len(c)):
        w = c[max(0, i - 4):i + 1]
        assert g0["n_w"].iloc[i] == len(w)
        assert g0["sum_w"].iloc[i] == w.sum()
        assert g0["var_num"].iloc[i] == len(w) * (w * w).sum() - w.sum() ** 2


def test_spc_flags_integer_identity(ray_session):
    sf = "/root/testdata/sf0.001"
    got = (ev.spc_flags(sf).to_pandas()
           .sort_values(["user_id", "ts_us"]).reset_index(drop=True))
    # the flag is exactly the integer inequality it claims to be
    n, dev, var9 = (got["n_base"].to_numpy(), got["dev_sq"].to_numpy(),
                    got["var9"].to_numpy())
    assert ((got["flag3"].to_numpy() == 1)
            == ((n >= 2) & (dev > var9))).all()
    assert (var9 >= 0).all() and (dev >= 0).all()
    # brute-force one user against the raw table
    import duckdb
    con = duckdb.connect()
    raw = con.execute(
        f"""SELECT user_id, epoch_us(ts) AS ts_us,
                   CAST(round(value * 100) AS BIGINT) AS c
            FROM '{sf}/events.parquet' ORDER BY user_id, ts_us""").df()
    u0 = raw["user_id"].iloc[0]
    c = raw.loc[raw["user_id"] == u0, "c"].to_numpy()
    g0 = got[got["user_id"] == u0]
    for i in range(len(c)):
        w = c[max(0, i - 5):i]          # 5 PRECEDING .. 1 PRECEDING
        nb = len(w)
        assert g0["n_base"].iloc[i] == nb
        assert g0["dev_sq"].iloc[i] == (nb * c[i] - w.sum()) ** 2
        assert g0["var9"].iloc[i] == 9 * (nb * (w * w).sum() - w.sum() ** 2)


def test_rfm_segments(ray_session, sf_small):
    """RFM quartile cells match the SQL ntile oracle exactly (unique
    (metric, user_id) order on every axis; monetary is exact half-away
    cents so no float ordering ambiguity exists)."""
    got = ev.rfm_segments(sf_small).to_pandas()
    con = duckdb.connect()
    exp = con.execute(f"""
        WITH u AS (
          SELECT user_id, epoch_ms(max(ts)) AS recency_ms,
                 count(*) AS freq,
                 CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM '{sf_small}/events.parquet' GROUP BY 1),
        q AS (SELECT user_id,
            ntile(4) OVER (ORDER BY recency_ms, user_id) AS r_q,
            ntile(4) OVER (ORDER BY freq, user_id) AS f_q,
            ntile(4) OVER (ORDER BY cents, user_id) AS m_q FROM u)
        SELECT r_q, f_q, m_q, CAST(count(*) AS BIGINT) AS n_users
        FROM q GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""").df()
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns].reset_index(drop=True),
                                  exp)
    # every tile populated and user total preserved
    n_users = con.execute(
        f"SELECT count(DISTINCT user_id) FROM "
        f"'{sf_small}/events.parquet'").fetchone()[0]
    assert got["n_users"].sum() == n_users


def test_global_ntile_boundaries(ray_session):
    """The sort + offset-fold ntile reproduces SQL tile sizing when n is
    NOT divisible by k (the first n % k tiles take the extra row), across
    block boundaries."""
    import ray.data

    n, k = 23, 4
    df = pd.DataFrame({"user_id": np.arange(n, dtype=np.int64),
                       "v": np.arange(n, dtype=np.int64)[::-1].copy()})
    ds = ray.data.from_pandas([df.iloc[:7], df.iloc[7:15], df.iloc[15:]])
    got = (ev._global_ntile(ds, "v", k, "tile").to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    con = duckdb.connect()
    exp = con.execute("""
        SELECT user_id, ntile(4) OVER (ORDER BY v, user_id) AS tile
        FROM df ORDER BY user_id""").df()
    assert (got["tile"].to_numpy()
            == exp["tile"].to_numpy().astype(np.int64)).all()


def test_ks_pairs_exact(ray_session, sf_small):
    """KS numerators match a brute-force scipy-free computation from the
    raw table, and D = d_num/(n1·n2) ∈ [0, 1]."""
    got = (ev.ks_pairs(sf_small).to_pandas()
           .sort_values(["t1", "t2"]).reset_index(drop=True))
    con = duckdb.connect()
    raw = con.execute(
        f"""SELECT event_type AS t, CAST(round(value*100) AS BIGINT) AS c
            FROM '{sf_small}/events.parquet'""").df()
    types = sorted(raw["t"].unique())
    assert len(got) == len(types) * (len(types) - 1) // 2
    support = np.sort(raw["c"].unique())
    for _, r in got.iterrows():
        c1 = np.sort(raw.loc[raw["t"] == r["t1"], "c"].to_numpy())
        c2 = np.sort(raw.loc[raw["t"] == r["t2"], "c"].to_numpy())
        assert r["n1"] == len(c1) and r["n2"] == len(c2)
        f1 = np.searchsorted(c1, support, side="right")
        f2 = np.searchsorted(c2, support, side="right")
        d = np.abs(f1 * len(c2) - f2 * len(c1))
        assert r["d_num"] == d.max()
        assert r["at_c"] == support[int(np.argmax(d))]
        assert 0 <= r["d_num"] <= len(c1) * len(c2)


def test_stratified_sample_deterministic(ray_session, sf_small):
    """Bottom-k hash sample: k rows per type, reproducible across runs
    and partitionings, and exactly the k smallest md5 hashes per type."""
    import hashlib

    got = (ev.stratified_sample(sf_small).to_pandas()
           .sort_values(["event_type", "rn"]).reset_index(drop=True))
    again = (ev.stratified_sample(sf_small).to_pandas()
             .sort_values(["event_type", "rn"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, again)
    con = duckdb.connect()
    raw = con.execute(
        f"""SELECT event_type, event_id
            FROM '{sf_small}/events.parquet'""").df()
    for t, grp in raw.groupby("event_type"):
        ids = grp["event_id"].to_numpy()
        hv = np.fromiter(
            (int.from_bytes(hashlib.md5(str(i).encode()).digest()[:8],
                            "little") for i in ids),
            dtype=np.uint64, count=len(ids))
        order = np.lexsort((ids, hv))[:20]
        g = got[got["event_type"] == t]
        assert list(g["event_id"]) == list(ids[order])
        assert list(g["rn"]) == list(range(1, len(order) + 1))


def test_holt_linear_recurrence(ray_session, sf_small):
    """Engine Holt == a plain per-user Python recurrence (same init,
    same op order), users with <2 events excluded."""
    got = (ev.holt_linear(sf_small).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    con = duckdb.connect()
    raw = con.execute(
        f"""SELECT user_id, epoch_us(ts) AS ts_us, value
            FROM '{sf_small}/events.parquet'
            ORDER BY user_id, ts_us""").df()
    exp = {}
    for u, grp in raw.groupby("user_id"):
        v = grp["value"].to_numpy()
        if len(v) < 2:
            continue
        l, b = v[0], v[1] - v[0]
        for t in range(1, len(v)):
            tmp = 0.2 * v[t] + 0.8 * (l + b)
            b = 0.3 * (tmp - l) + 0.7 * b
            l = tmp
        exp[u] = (len(v), l, b)
    assert set(got["user_id"]) == set(exp)
    for _, r in got.iterrows():
        n, l, b = exp[r["user_id"]]
        assert r["n"] == n
        assert abs(r["level"] - l) < 1e-6
        assert abs(r["trend"] - b) < 1e-6
        assert abs(r["forecast1"] - (l + b)) < 1e-6


def test_dtw_pairs_brute(ray_session, sf_small):
    """Vectorized-across-pairs DP == per-pair scalar DTW; zero distance
    iff identical profiles; symmetric in the pair orientation."""
    got = (ev.dtw_pairs(sf_small, k=12).to_pandas()
           .sort_values(["user_a", "user_b"]).reset_index(drop=True))
    assert len(got) == 12 * 11 // 2

    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_small}/events.parquet'")
    vec = con.execute("""
        WITH hp AS (SELECT user_id,
                           (epoch_ms(ts) // 3600000) % 24 AS h FROM events),
        top AS (SELECT user_id FROM
                  (SELECT user_id, count(*) c FROM hp GROUP BY 1)
                QUALIFY row_number() OVER (ORDER BY c DESC, user_id) <= 12)
        SELECT user_id, h, count(*) AS c FROM hp
        WHERE user_id IN (SELECT user_id FROM top) GROUP BY 1, 2
    """).df()
    prof = {}
    for u in sorted(vec["user_id"].unique()):
        v = np.zeros(24, np.int64)
        sub = vec[vec["user_id"] == u]
        v[sub["h"].to_numpy(np.int64)] = sub["c"].to_numpy(np.int64)
        prof[int(u)] = v

    def dtw(a, b):
        D = np.full((24, 24), np.iinfo(np.int64).max, np.int64)
        for i in range(24):
            for j in range(24):
                c = abs(int(a[i]) - int(b[j]))
                if i == 0 and j == 0:
                    D[i, j] = c
                elif i == 0:
                    D[i, j] = c + D[0, j - 1]
                elif j == 0:
                    D[i, j] = c + D[i - 1, 0]
                else:
                    D[i, j] = c + min(D[i - 1, j], D[i, j - 1],
                                      D[i - 1, j - 1])
        return int(D[23, 23])

    for r in got.itertuples():
        a, b = prof[int(r.user_a)], prof[int(r.user_b)]
        assert r.dtw == dtw(a, b) == dtw(b, a)
        if np.array_equal(a, b):
            assert r.dtw == 0


def test_changepoints_optimal_partitioning(ray_session, sf_small):
    """Vectorized DP == scalar reference DP per type; segments tile the
    global span exactly; every reported cost matches its segment."""
    got = (ev.changepoints(sf_small, beta=2000).to_pandas()
           .sort_values(["event_type", "seg_start_ms"])
           .reset_index(drop=True))
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_small}/events.parquet'")
    day = con.execute("""
        SELECT event_type, epoch_ms(ts) // 86400000 AS d, count(*) c
        FROM events GROUP BY 1, 2""").df()
    d0, d1 = int(day["d"].min()), int(day["d"].max())
    T = d1 - d0 + 1
    DAY = 86_400_000
    for et, sub in day.groupby("event_type"):
        x = np.zeros(T, np.int64)
        x[sub["d"].to_numpy(np.int64) - d0] = sub["c"].to_numpy(np.int64)
        pre = np.concatenate(([0], np.cumsum(x)))
        sq = np.concatenate(([0], np.cumsum(x * x)))

        def cost(s, t):
            return int((t - s) * (sq[t] - sq[s]) - (pre[t] - pre[s]) ** 2)

        F = [0] * (T + 1)
        arg = [0] * (T + 1)
        for t in range(1, T + 1):
            cands = [F[s] + cost(s, t) + 2000 for s in range(t)]
            F[t] = min(cands)
            arg[t] = cands.index(F[t])
        segs = []
        t = T
        while t > 0:
            s = arg[t]
            segs.append(((d0 + s) * DAY, (d0 + t - 1) * DAY, t - s,
                         int(pre[t] - pre[s]), cost(s, t)))
            t = s
        segs.sort()
        g = got[got["event_type"] == et]
        eng = list(zip(g["seg_start_ms"], g["seg_end_ms"], g["n_days"],
                       g["sum_cnt"], g["cost_num"]))
        assert eng == segs
        # segments tile the span
        assert g["n_days"].sum() == T
        assert int(g["seg_start_ms"].min()) == d0 * DAY
        assert int(g["seg_end_ms"].max()) == d1 * DAY


def test_spectral_daily_scalar_path(ray_session, sf_small):
    """Vectorized Goertzel == scalar per-type recurrence, bit-equal."""
    got = ev.spectral_daily(sf_small).to_pandas().set_index("event_type")
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_small}/events.parquet'")
    hr = con.execute("""
        SELECT event_type, epoch_ms(ts) // 3600000 AS h, count(*) c
        FROM events GROUP BY 1, 2""").df()
    h0, h1 = int(hr["h"].min()), int(hr["h"].max())
    T = h1 - h0 + 1
    C = ev.GOERTZEL_C24
    for et, sub in hr.groupby("event_type"):
        x = np.zeros(T, np.float64)
        x[sub["h"].to_numpy(np.int64) - h0] = sub["c"].to_numpy(np.int64)
        s1 = s2 = 0.0
        for t in range(T):
            s = x[t] + C * s1 - s2
            s2, s1 = s1, s
        power = s1 * s1 + s2 * s2 - C * s1 * s2
        row = got.loc[et]
        assert int(row["n_hours"]) == T
        assert row["power"] == power          # bit-equal, no tolerance


def test_theil_sen_brute(ray_session, sf_small):
    """Median-pair selection == brute-force per user; den ≥ 1 and the
    reported fraction is one of the actual pairwise slopes."""
    got = (ev.theil_sen(sf_small).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_small}/events.parquet'")
    day = con.execute("""
        SELECT user_id, epoch_ms(ts) // 86400000 AS d, count(*) c
        FROM events GROUP BY 1, 2""").df()
    d0, d1 = int(day["d"].min()), int(day["d"].max())
    T = d1 - d0 + 1
    assert (got["med_den"] >= 1).all()
    for uid, sub in day.groupby("user_id"):
        x = np.zeros(T, np.int64)
        x[sub["d"].to_numpy(np.int64) - d0] = sub["c"].to_numpy(np.int64)
        cands = []
        for i in range(T):
            for j in range(i + 1, T):
                n, dd = int(x[j] - x[i]), j - i
                cands.append((n / dd, n, dd))
        cands.sort()
        v, n, dd = cands[(len(cands) - 1) // 2]
        row = got[got["user_id"] == uid].iloc[0]
        assert (int(row["med_num"]), int(row["med_den"])) == (n, dd)
        assert int(row["n_pairs"]) == len(cands)


def test_discords_brute(ray_session, sf_small):
    """Gram-matrix kernel == scalar window scan; exclusion zone honored;
    mp symmetric consistency (nn's distance back to i is ≥ its own mp)."""
    got = ev.discords(sf_small).to_pandas()
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_small}/events.parquet'")
    hr = con.execute("""
        SELECT event_type, epoch_ms(ts) // 10800000 AS b, count(*) c
        FROM events GROUP BY 1, 2""").df()
    b0, b1 = int(hr["b"].min()), int(hr["b"].max())
    T = b1 - b0 + 1
    m = 8
    BK = 10_800_000
    for et, sub in hr.groupby("event_type"):
        x = np.zeros(T, np.int64)
        x[sub["b"].to_numpy(np.int64) - b0] = sub["c"].to_numpy(np.int64)
        Wn = T - m + 1
        g = got[got["event_type"] == et].set_index("win_start_ms")
        assert len(g) == Wn
        for i in range(Wn):
            best, bj = None, None
            for j in range(Wn):
                if abs(i - j) < m:
                    continue
                d = int(((x[i:i + m] - x[j:j + m]) ** 2).sum())
                if best is None or d < best:
                    best, bj = d, j
            row = g.loc[(b0 + i) * BK]
            assert int(row["mp_num"]) == best
            assert int(row["nn_start_ms"]) == (b0 + bj) * BK
        # exclusion: nn at least m buckets away
        assert (abs(g.index.to_numpy() - g["nn_start_ms"].to_numpy())
                >= m * BK).all()


def test_survival_km_invariants(ray_session, sf_small):
    """KM table sanity: at_risk strictly decreasing over event times,
    first at_risk = total observations, events ≤ at_risk, and the
    complete/censored split accounts for every purchase."""
    got = (ev.survival_km(sf_small).to_pandas()
           .sort_values("t_days").reset_index(drop=True))
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_small}/events.parquet'")
    n_purch, n_users = con.execute("""
        SELECT count(*), count(DISTINCT user_id) FROM events
        WHERE event_type = 'purchase'""").fetchone()
    if n_purch == 0:
        assert len(got) == 0
        return
    ar = got["n_at_risk"].to_numpy()
    assert (np.diff(ar) < 0).all()
    assert (got["n_events"] <= got["n_at_risk"]).all()
    assert (got["n_events"] >= 1).all()
    # total observations = gaps (purchases - users) + censored (users)
    assert int(ar[0]) <= n_purch
    assert int(got["n_events"].sum()) <= n_purch - n_users + 1


def test_rolling_median_5_brute(ray_session, sf_small):
    """Strided-window median == per-user scalar scan."""
    from gorilla_tsc_ray.util import round_half_away
    got = ev.rolling_median_5(sf_small).to_pandas().set_index("event_id")
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_small}/events.parquet'")
    p = con.execute("""
        SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, value
        FROM events ORDER BY user_id, ts_ms, event_id""").df()
    for _, sub in p.groupby("user_id"):
        cents = round_half_away(
            sub["value"].to_numpy() * 100.0, 0).astype(np.int64)
        eids = sub["event_id"].to_numpy(np.int64)
        for i in range(len(sub)):
            w = sorted(cents[max(0, i - 4):i + 1])
            row = got.loc[eids[i]]
            assert int(row["n_window"]) == len(w)
            assert int(row["med_cents"]) == w[(len(w) - 1) // 2]


def test_cohort_ltv_reconciles(ray_session, sf_small):
    """LTV matrix reconciles: cumulative is a prefix sum per cohort, and
    total revenue equals the corpus purchase total in cents."""
    from gorilla_tsc_ray.util import round_half_away
    got = (ev.cohort_ltv(sf_small).to_pandas()
           .sort_values(["cohort_day", "week_offset"]))
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_small}/events.parquet'")
    vals = con.execute("SELECT value FROM events WHERE event_type = "
                       "'purchase'").df()["value"].to_numpy()
    total = int(round_half_away(vals * 100.0, 0).astype(np.int64).sum())
    assert int(got["rev_cents"].sum()) == total
    for _, g in got.groupby("cohort_day"):
        assert (g["cum_rev_cents"].to_numpy()
                == np.cumsum(g["rev_cents"].to_numpy())).all()
        assert g["cohort_size"].nunique() == 1


def test_type_movers_grid(ray_session, sf_small):
    """Movers table: dense week grid per type, prev = shifted cnt,
    delta = cnt − prev, totals reconcile with the event count."""
    got = (ev.type_movers(sf_small).to_pandas()
           .sort_values(["event_type", "week_ms"]))
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_small}/events.parquet'")
    n = con.execute("SELECT count(*) FROM events").fetchone()[0]
    assert int(got["cnt"].sum()) == n
    WEEK = 7 * 86_400_000
    for _, g in got.groupby("event_type"):
        w = g["week_ms"].to_numpy(np.int64)
        assert (np.diff(w) == WEEK).all()
        c = g["cnt"].to_numpy(np.int64)
        assert (g["prev_cnt"].to_numpy()
                == np.concatenate(([0], c[:-1]))).all()
        assert (g["delta"].to_numpy()
                == c - g["prev_cnt"].to_numpy()).all()


def test_rs_range_brute(ray_session, sf_small):
    """R/S numerators vs a scalar per-group reference."""
    import duckdb

    got = (ev.rs_range(sf_small).to_pandas()
           .sort_values(["user_id", "day_ms"]).reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_small}/events.parquet'")
    raw = con.execute("""
        SELECT user_id, epoch_ms(ts) AS ts_ms,
               CAST(round(value*100) AS BIGINT) AS c FROM events
        ORDER BY user_id, ts_ms""").df()
    DAY = 86_400_000
    rows = []
    for (u, d), g in raw.assign(
            day=(raw["ts_ms"] // DAY) * DAY).groupby(["user_id", "day"]):
        c = g["c"].to_numpy(np.int64)
        n = len(c)
        if n < 2:
            continue
        pre = np.cumsum(c)
        k = np.arange(1, n + 1)
        dev = n * pre - k * c.sum()
        rows.append((u, d, n, int(dev.max() - dev.min()),
                     int(n * (c * c).sum() - c.sum() ** 2)))
    exp = (pd.DataFrame(rows, columns=["user_id", "day_ms", "n",
                                       "r_num", "var_num"])
           .sort_values(["user_id", "day_ms"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got.astype(np.int64), exp.astype(np.int64))


def test_funnel_3step_brute(ray_session, sf_small):
    """Ordered-funnel counts vs a scalar per-session scan."""
    import duckdb

    got = (ev.funnel_3step(sf_small).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_small}/events.parquet'")
    raw = con.execute("""
        SELECT user_id, CAST(event_type AS VARCHAR) AS et,
               epoch_ms(ts) AS ts_ms FROM events
        ORDER BY user_id, ts_ms""").df()
    GAP = 1_800_000
    rows = {}
    for u, g in raw.groupby("user_id"):
        t = g["ts_ms"].to_numpy(np.int64)
        et = g["et"].to_numpy()
        brk = np.concatenate(([True], (t[1:] - t[:-1]) > GAP))
        sid = np.cumsum(brk)
        n_sessions = int(sid.max())
        n_funnel = 0
        for s in range(1, n_sessions + 1):
            m = sid == s
            st, se = t[m], et[m]
            t1 = next((x for x, e in zip(st, se) if e == "view"), None)
            if t1 is None:
                continue
            t2 = next((x for x, e in zip(st, se)
                       if e == "click" and x > t1), None)
            if t2 is None:
                continue
            if any(e == "purchase" and x > t2
                   for x, e in zip(st, se)):
                n_funnel += 1
        rows[int(u)] = (n_sessions, n_funnel)
    exp = pd.DataFrame(
        [(u, a, b) for u, (a, b) in sorted(rows.items())],
        columns=["user_id", "n_sessions", "n_funnel"])
    pd.testing.assert_frame_equal(
        got.astype(np.int64), exp.astype(np.int64))


def test_peak_concurrency_brute(ray_session, sf_small):
    """Sweep-line peak vs a scalar reference over all sessions."""
    import duckdb

    got = ev.peak_concurrency(sf_small).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_small}/events.parquet'")
    raw = con.execute("""
        SELECT user_id, epoch_ms(ts) AS ts_ms FROM events
        ORDER BY user_id, ts_ms""").df()
    GAP = 1_800_000
    deltas = {}
    for _, g in raw.groupby("user_id"):
        t = g["ts_ms"].to_numpy(np.int64)
        brk = np.concatenate(([True], (t[1:] - t[:-1]) > GAP))
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(t)) - 1
        for s, e in zip(t[starts], t[ends]):
            deltas[s] = deltas.get(s, 0) + 1
            deltas[e + 1] = deltas.get(e + 1, 0) - 1
    conc, peak, at = 0, -1, None
    for ts in sorted(deltas):
        conc += deltas[ts]
        if conc > peak:
            peak, at = conc, ts
    assert int(got["peak"].iloc[0]) == peak
    assert int(got["at_ts"].iloc[0]) == at


def test_interval_overlap_matches_bruteforce(ray_session):
    """The searchsorted interval join must equal the O(sessions×bursts)
    per-user brute force on the real table."""
    sf = "/root/testdata/sf0.001"
    got = (ev.interval_overlap_join(sf).to_pandas()
           .sort_values(["user_id", "s_start", "b_start"])
           .reset_index(drop=True))

    pts = duckdb.sql(f"""
        SELECT user_id, event_type, epoch_ms(ts) AS ts_ms
        FROM read_parquet('{sf}/events.parquet') ORDER BY user_id, ts_ms
    """).df()

    def intervals(df, gap):
        out = []
        for u, g in df.groupby("user_id"):
            ts = g["ts_ms"].to_numpy()
            start = prev = None
            for t in ts:
                if start is None:
                    start = prev = t
                elif t - prev > gap:
                    out.append((u, start, prev))
                    start = prev = t
                else:
                    prev = t
            if start is not None:
                out.append((u, start, prev))
        return out

    sess = intervals(pts[pts["event_type"] != "error"], 86_400_000)
    burst = intervals(pts[pts["event_type"] == "error"], 172_800_000)
    rows = []
    for (u, s0, s1) in sess:
        for (ub, b0, b1) in burst:
            if u == ub and s0 <= b1 and b0 <= s1:
                rows.append((u, s0, s1, b0, b1,
                             min(s1, b1) - max(s0, b0)))
    exp = (pd.DataFrame(rows, columns=["user_id", "s_start", "s_end",
                                       "b_start", "b_end", "overlap_ms"])
           .sort_values(["user_id", "s_start", "b_start"])
           .reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp[got.columns],
                                  check_dtype=False)


def test_spearman_double_ranks_bruteforce(ray_session):
    """spearman_pairs' numerators must equal a brute scipy-free
    recomputation (average ranks ×2) on the real hourly series."""
    sf = "/root/testdata/sf0.001"
    got = (ev.spearman_pairs(sf).to_pandas()
           .sort_values(["type_a", "type_b"]).reset_index(drop=True))

    cnt = duckdb.sql(f"""
        SELECT event_type, epoch_ms(ts) // 3600000 AS h, count(*) AS c
        FROM read_parquet('{sf}/events.parquet') GROUP BY 1, 2
    """).df()
    h0, h1 = int(cnt["h"].min()), int(cnt["h"].max())
    grid = np.arange(h0, h1 + 1)
    types = sorted(cnt["event_type"].unique())

    def dranks(series):
        order = np.argsort(series, kind="stable")
        r2 = np.empty(len(series), np.int64)
        i = 0
        srt = series[order]
        while i < len(srt):
            j = i
            while j < len(srt) and srt[j] == srt[i]:
                j += 1
            # average of 1-based ranks i+1..j, doubled
            r2[order[i:j]] = (i + 1) + j
            i = j
        return r2

    ser = {}
    for ty in types:
        s = np.zeros(len(grid), np.int64)
        sub = cnt[cnt["event_type"] == ty]
        s[sub["h"].to_numpy(np.int64) - h0] = sub["c"].to_numpy(np.int64)
        ser[ty] = dranks(s)
    n = len(grid)
    for _, row in got.iterrows():
        r, s = ser[row["type_a"]], ser[row["type_b"]]
        assert row["n"] == n
        assert row["num"] == n * int(np.dot(r, s)) - int(r.sum()) * int(s.sum())
        assert row["den_a"] == n * int(np.dot(r, r)) - int(r.sum()) ** 2
        assert row["den_b"] == n * int(np.dot(s, s)) - int(s.sum()) ** 2


def test_ma_crossover_bruteforce(ray_session):
    """ma_crossover must equal a per-user rolling-loop brute force."""
    sf = "/root/testdata/sf0.001"
    got = (ev.ma_crossover(sf).to_pandas()
           .sort_values(["user_id", "ts_ms"]).reset_index(drop=True))
    pts = duckdb.sql(f"""
        SELECT user_id, epoch_ms(ts) AS ts_ms,
               CAST(round(value * 100) AS BIGINT) AS c
        FROM read_parquet('{sf}/events.parquet')
        ORDER BY user_id, ts_ms
    """).df()
    rows = []
    for u, g in pts.groupby("user_id"):
        c = g["c"].to_numpy(np.int64)
        ts = g["ts_ms"].to_numpy(np.int64)
        prev_above = None
        for i in range(len(c)):
            if i < 7:
                continue
            s3 = int(c[i - 2:i + 1].sum())
            s8 = int(c[i - 7:i + 1].sum())
            above = s3 * 8 > s8 * 3
            if prev_above is not None and above != prev_above:
                rows.append((u, ts[i], 1 if above else -1, s3, s8))
            prev_above = above
    exp = (pd.DataFrame(rows, columns=["user_id", "ts_ms", "direction",
                                       "s_short", "s_long"])
           .sort_values(["user_id", "ts_ms"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp[got.columns],
                                  check_dtype=False)
