"""Benchmark harness — headline pipelines at $GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "turns_per_sec": ..., "bytes_per_point": ..., "codec": {...}}

Modes:
  python bench.py               # timed run at $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling     # same headline job in two fresh processes
                                # (8 then 32 CPUs) → scaling efficiency

Owns its Ray session (the only scripts allowed to call ray.init are this
file, CLI entry points and the test fixture).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_tag(sf_dir: str) -> float:
    try:
        return float(os.path.basename(os.path.normpath(sf_dir)).replace("sf", ""))
    except ValueError:
        return -1.0


def codec_microbench(n: int = 1_000_000) -> dict:
    """Reference-shaped single-series micro-bench
    (EncodingBenchmark.java:60-69: regular 60 ms spacing, value = index)."""
    import numpy as np

    from gorilla_tsc_ray.codec import decode_series, encode_series_auto

    t0 = 1_500_400_800_000
    ts = t0 + 60 + 60 * np.arange(n, dtype=np.int64)
    vb = np.arange(n, dtype=np.float64).view(np.uint64)
    # full-size warm-up: first-touch page faults on fresh arenas are ~100×
    # steady-state in this sandboxed kernel; report the warm number (the
    # pipeline runs in long-lived workers, which see the warm path).
    # These are the DISPATCHED paths the pipelines use (native C kernel when
    # a compiler exists, NumPy/streaming otherwise).
    enc_s = dec_s = float("inf")
    for _ in range(3):
        t = time.perf_counter()
        words, bits = encode_series_auto(t0, ts, vb)
        enc_s = min(enc_s, time.perf_counter() - t)
        t = time.perf_counter()
        dts, _ = decode_series(words, n_points=n)
        dec_s = min(dec_s, time.perf_counter() - t)
    assert len(dts) == n
    out = {
        "encode_mpoints_per_sec": round(n / enc_s / 1e6, 3),
        "decode_mpoints_per_sec": round(n / dec_s / 1e6, 3),
        "bytes_per_point_dense": round(len(words) * 8 / n, 3),
    }
    # Kernel-capability decode (buffer reuse): the end-to-end number above
    # allocates fresh 16 MB outputs per call, and fresh-page first-touch is
    # globally serialized on this host class — under tenancy it swings
    # 35–137 M pts/s within ONE build (r4 same-session bisect, BASELINE.md)
    # and is what BENCH_r03's apparent decode drop measured.  Reusing the
    # buffers isolates the actual bit-unpacking kernel.
    from gorilla_tsc_ray.codec import native as _native
    if _native.AVAILABLE:
        w = np.ascontiguousarray(words, dtype=np.uint64)
        out_ts = np.empty(n, dtype=np.int64)
        out_vb = np.empty(n, dtype=np.uint64)
        k_s = float("inf")
        for _ in range(4):
            t = time.perf_counter()
            kts, _kv = _native.decode(w, n, out_ts=out_ts, out_v=out_vb)
            k_s = min(k_s, time.perf_counter() - t)
        assert len(kts) == n
        out["decode_kernel_mpoints_per_sec"] = round(n / k_s / 1e6, 3)
        # gorilla2e (entropy-coded dod stream): same series, native path
        vb = np.arange(n, dtype=np.float64).view(np.uint64)
        e_enc = e_dec = float("inf")
        for _ in range(3):
            t = time.perf_counter()
            pay_e = _native.encode_e(t0, ts, vb)
            e_enc = min(e_enc, time.perf_counter() - t)
            t = time.perf_counter()
            ets, _ev = _native.decode_e(pay_e, n)
            e_dec = min(e_dec, time.perf_counter() - t)
        assert len(ets) == n
        out["encode_e_mpoints_per_sec"] = round(n / e_enc / 1e6, 3)
        out["decode_e_mpoints_per_sec"] = round(n / e_dec / 1e6, 3)
        out["bytes_per_point_dense_e"] = round(len(pay_e) / n, 3)
    return out


def run_pipelines(sf_dir: str, num_cpus: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from gorilla_tsc_ray.context import tune_context
    from gorilla_tsc_ray.pipelines import events as ev
    from gorilla_tsc_ray.pipelines import ingest
    from gorilla_tsc_ray.sources.transcripts import transcripts_dir

    tune_context()
    # materialize the transcript cache BEFORE timing (input prep, not engine)
    tdir = transcripts_dir(sf_dir)
    import duckdb
    n_turns = duckdb.sql(
        f"select count(*) from read_parquet('{tdir}/*.parquet')").fetchone()[0]

    # warm the cluster (worker spawn + import + allocator first-touch) on a
    # tiny input so timings measure throughput, not one-time cold start
    ingest.rollup_tier("/root/testdata/sf0.001", "1m").count()
    ev.points_roundtrip("/root/testdata/sf0.001").count()

    queries = {}

    def timed(name, fn):
        # min of 2 runs: the FIRST substantial pipeline at a given scale
        # pays per-worker first-touch on fresh allocator arenas (~0.5 s
        # across the pool on this host, measured: sf0.1 rollup_1m runs
        # 0.75/0.70/0.15/0.15 s in sequence) — the sf0.001 warm-up above
        # spawns the workers but touches arenas far too small.  Same warm-
        # number policy as codec_microbench (and as the reference's own JMH
        # harness: warmup iterations, then measured ones).  3 runs because
        # the arena warm-up takes ~2 passes to complete on a fresh pool.
        best, out = float("inf"), None
        for _ in range(3):
            t = time.perf_counter()
            out = fn()
            best = min(best, time.perf_counter() - t)
        queries[name] = round(best, 3)
        return out

    # headline: ingest → dedup+derive → 1m rollup (consumed via count)
    timed("transcripts_rollup_1m",
          lambda: ingest.rollup_tier(sf_dir, "1m").count())
    # tier cascade 1m→1h
    timed("transcripts_rollup_1h_cascade",
          lambda: ingest.rollup_cascade(sf_dir, "1h").count())
    # gorilla block store (all metrics) + compression ratio
    blocks = timed("transcripts_encode_blocks",
                   lambda: ingest.gorilla_blocks(sf_dir, metric=None)
                   .materialize())
    import pandas as pd
    bstats = blocks.map_batches(
        lambda df: pd.DataFrame({
            "payload_bytes": [df["payload"].map(len).sum()],
            "n_points": [df["n_points"].sum()]}),
        batch_format="pandas").to_pandas().sum()
    bytes_per_point = float(bstats["payload_bytes"]) / max(1, int(bstats["n_points"]))
    # decode the store back (query path)
    from gorilla_tsc_ray.stages.series import decode_blocks_batch_arrow
    timed("transcripts_decode_blocks",
          lambda: blocks.map_batches(
              decode_blocks_batch_arrow, batch_format="pyarrow",
              fn_kwargs={"key_cols": ["conv_id", "metric"]}).count())
    # events codec round-trip (driver tables path)
    timed("events_roundtrip", lambda: ev.points_roundtrip(sf_dir).count())

    total = round(sum(queries.values()), 3)
    ingest_sec = (queries["transcripts_rollup_1m"]
                  + queries["transcripts_encode_blocks"])

    # training-data ops (dedup/similarity family, round-3 slim-shuffle
    # shapes) — timed into a SEPARATE section so the headline `value`
    # stays comparable across rounds
    from gorilla_tsc_ray.pipelines import docs
    from gorilla_tsc_ray.pipelines import relational
    docs_queries = {}

    def timed_docs(name, fn):
        # min of 2 (not 3): these run 3-20 s each and first-touch is a
        # smaller fraction; two runs mostly de-noises the ±25-40% host
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t)
        docs_queries[name] = round(best, 3)

    timed_docs("docs_exact_dedup", lambda: docs.exact_dedup(sf_dir).count())
    timed_docs("docs_token_jaccard",
               lambda: docs.token_jaccard(sf_dir).count())
    timed_docs("docs_minhash_pairs",
               lambda: docs.minhash_pairs(sf_dir).count())
    timed_docs("emb_near_dups_lsh",
               lambda: docs.embedding_near_dups_lsh(sf_dir).count())

    # late-round-3 operators — separate section so headline/docs sums stay
    # comparable across rounds
    extra_queries = {}

    def timed_extra(name, fn):
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t)
        extra_queries[name] = round(best, 3)

    timed_extra("events_sliding_1h", lambda: ev.sliding_window(sf_dir).count())
    timed_extra("events_gapfill_1h_interp",
                lambda: ev.gapfill_interp(sf_dir, "1h").count())
    timed_extra("transcripts_gap_quantiles",
                lambda: ingest.gap_quantiles(sf_dir).count())
    timed_extra("docs_dup_clusters", lambda: docs.dup_clusters(sf_dir).count())
    timed_extra("events_user_quantiles_sketch",
                lambda: ev.user_quantiles_sketch(sf_dir).count())
    timed_extra("events_ohlc_1h", lambda: ev.ohlc(sf_dir, "1h").count())
    timed_extra("events_vwap_1h", lambda: ev.vwap(sf_dir, "1h").count())
    timed_extra("docs_tfidf", lambda: docs.tfidf(sf_dir).count())
    # late-round-4 operator families
    timed_extra("events_m4_1h", lambda: ev.m4_downsample(sf_dir).count())
    timed_extra("events_cusum", lambda: ev.cusum(sf_dir).count())
    timed_extra("events_rolling_5",
                lambda: ev.rolling_window(sf_dir).count())
    timed_extra("transcripts_response_latency",
                lambda: ingest.response_latency(sf_dir).count())
    timed_extra("docs_dsir_weights",
                lambda: docs.dsir_weights(sf_dir).count())
    timed_extra("emb_pq_codes", lambda: docs.emb_pq_codes(sf_dir).count())
    # round-4 continuation families
    timed_extra("events_paa_8", lambda: ev.paa(sf_dir).count())
    timed_extra("events_sax_symbols",
                lambda: ev.sax_symbols(sf_dir).count())
    timed_extra("events_pareto_curve",
                lambda: ev.pareto_curve(sf_dir).count())
    timed_extra("docs_incremental_dedup",
                lambda: docs.incremental_dedup(sf_dir).count())
    timed_extra("q21_waiting_suppliers",
                lambda: relational.q21_waiting_suppliers(sf_dir).count())
    # round-4 late-wave families (sketch algebra, bitmap index, bloom
    # semi-join, sequential downsampler, streaming session windows)
    timed_extra("events_hll_registers",
                lambda: ev.hll_distinct_users(sf_dir).count())
    timed_extra("events_user_day_bitmaps",
                lambda: ev.user_day_bitmaps(sf_dir).count())
    timed_extra("events_kmv_set_ops",
                lambda: ev.kmv_set_ops(sf_dir).count())
    timed_extra("events_lttb", lambda: ev.lttb(sf_dir).count())
    timed_extra("rel_bloom_semijoin",
                lambda: relational.bloom_semijoin_urgent_revenue(
                    sf_dir).count())
    timed_extra("docs_collocations",
                lambda: docs.collocations(sf_dir).count())
    timed_extra("events_streaming_sessionize",
                lambda: ev.streaming_sessionize(sf_dir).count())
    # round-4 final wave (full outer, interval-delta sliding distinct,
    # sequential token-bucket replay)
    timed_extra("rel_full_outer",
                lambda: relational.user_order_full_outer(sf_dir).count())
    timed_extra("events_sliding_distinct_7d",
                lambda: ev.sliding_distinct(sf_dir).count())
    timed_extra("events_rate_limit",
                lambda: ev.rate_limit(sf_dir).count())
    # round-5 families (graph ranking, exact time-series mining,
    # asymmetric containment, streaming heavy hitters)
    timed_extra("docs_pagerank", lambda: docs.pagerank(sf_dir).count())
    timed_extra("events_dtw_pairs",
                lambda: ev.dtw_pairs(sf_dir).count())
    timed_extra("events_changepoints",
                lambda: ev.changepoints(sf_dir).count())
    timed_extra("events_discords", lambda: ev.discords(sf_dir).count())
    timed_extra("events_theil_sen", lambda: ev.theil_sen(sf_dir).count())
    timed_extra("events_survival_km",
                lambda: ev.survival_km(sf_dir).count())
    timed_extra("docs_containment_pairs",
                lambda: docs.containment_pairs(sf_dir).count())
    timed_extra("events_streaming_topk",
                lambda: ev.streaming_topk(sf_dir).count())
    timed_extra("transcripts_len_drift",
                lambda: ingest.len_drift(sf_dir).count())

    # continuous-aggregate append: fold the second event-time half into a
    # first-half store vs rebuilding from scratch (single run each — store
    # mutation is not idempotent-timeable; delta touches ~half the days)
    import glob as _glob
    import shutil as _shutil

    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    bounds = [( _pc.min(t["ts"]).value, _pc.max(t["ts"]).value)
              for t in (_pq.read_table(f, columns=["ts"])
                        for f in _glob.glob(f"{tdir}/*.parquet"))]
    split = (min(b[0] for b in bounds) + max(b[1] for b in bounds)) // 2
    incr_root = "/tmp/bench_incr_store"
    _shutil.rmtree(incr_root, ignore_errors=True)
    ingest.ingest_to_store(sf_dir, incr_root, resume=False, ts_hi=split)
    t = time.perf_counter()
    ingest.append_to_store(sf_dir, incr_root, ts_lo=split)
    extra_queries["transcripts_append_delta"] = round(
        time.perf_counter() - t, 3)
    full_root = "/tmp/bench_full_store"
    _shutil.rmtree(full_root, ignore_errors=True)
    t = time.perf_counter()
    ingest.ingest_to_store(sf_dir, full_root, resume=False)
    extra_queries["transcripts_full_rebuild"] = round(
        time.perf_counter() - t, 3)
    _shutil.rmtree(incr_root, ignore_errors=True)
    _shutil.rmtree(full_root, ignore_errors=True)

    # round-5 representatives — separate section so earlier rounds' sums
    # stay comparable
    r5_queries = {}

    def timed_r5(name, fn):
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t)
        r5_queries[name] = round(best, 3)

    timed_r5("events_peak_concurrency",
             lambda: ev.peak_concurrency(sf_dir).count())
    timed_r5("events_range_frame_5m",
             lambda: ev.range_frame_5m(sf_dir).count())
    timed_r5("docs_lm_coverage", lambda: docs.lm_coverage(sf_dir).count())
    timed_r5("transcripts_shard_assignment",
             lambda: ingest.shard_assignment(sf_dir).count())
    # round-5 entropy codec: roundtrip wall + archival B/pt on the real
    # mixed store (vs 5.487 raw v2 / 4.526 gorilla2z, BASELINE.md)
    timed_r5("events_roundtrip_entropy",
             lambda: ev.points_roundtrip_entropy(sf_dir).count())
    from gorilla_tsc_ray.pipelines.retention import _transcode_table
    import pyarrow as _pa

    _parts = [ray.get(r) for r in blocks.to_arrow_refs()]
    _parts = [p for p in _parts if p.num_rows]
    _tbl = _pa.concat_tables(_parts)
    _as_e, _ = _transcode_table(_tbl, "gorilla2e")
    _e_bytes = sum(len(x) for x in _as_e.column("payload").to_pylist())
    bytes_per_point_e = _e_bytes / max(1, int(bstats["n_points"]))

    # Rotating tail-coverage section (round-4 verdict item 3): each round
    # benches a deterministic 12-query slice of the queries() surface the
    # fixed sections above do NOT time, rotated by the round index (count
    # of BENCH_r*.json artifacts in the repo root), so every untimed
    # query gets a wall at least every ~20 rounds and a silent regression
    # in the tail cannot hide indefinitely.  Budgeted at ~90 s: the slice
    # stops early rather than blowing up the per-round bench wall.
    rotated = {}
    try:
        import glob as _glob
        import importlib
        import sys as _sys

        here = os.path.dirname(os.path.abspath(__file__))
        if here not in _sys.path:
            _sys.path.insert(0, here)
        _entry = importlib.import_module("__ray_entry__")
        allq = _entry._all_queries()
        timed_names = (set(queries) | set(docs_queries)
                       | set(extra_queries) | set(r5_queries))
        untimed = [k for k in allq if k not in timed_names]
        rnd = len(_glob.glob(os.path.join(here, "BENCH_r*.json")))
        k_slice = 12
        off = (rnd * k_slice) % max(1, len(untimed))
        budget_t0 = time.perf_counter()
        for name in (untimed + untimed)[off:off + k_slice]:
            if time.perf_counter() - budget_t0 > 90:
                rotated["_budget_exhausted_after"] = len(rotated)
                break
            t = time.perf_counter()
            try:
                res = allq[name](sf_dir)
                if hasattr(res, "count"):
                    res.count()
                elif hasattr(res, "num_rows"):
                    pass
                else:
                    len(res)
                rotated[name] = round(time.perf_counter() - t, 3)
            except Exception as e:  # never fail the whole bench
                rotated[name] = f"ERR:{type(e).__name__}"
    except Exception as e:
        rotated["_error"] = str(e)[:200]

    result = {
        "queries": queries,
        "total_sec": total,
        "docs_queries": docs_queries,
        "docs_sec": round(sum(docs_queries.values()), 3),
        "extra_queries": extra_queries,
        "extra_sec": round(sum(extra_queries.values()), 3),
        "r5_queries": r5_queries,
        "r5_sec": round(sum(r5_queries.values()), 3),
        "rotated_queries": rotated,
        "n_turns": int(n_turns),
        "turns_per_sec": round(n_turns / max(ingest_sec, 1e-9), 1),
        "bytes_per_point": round(bytes_per_point, 3),
        "bytes_per_point_gorilla2e": round(bytes_per_point_e, 3),
    }
    ray.shutdown()
    return result


def run_scaling_pipeline(sf_dir: str, num_cpus: int) -> dict:
    """The scaling headline: transcripts ingest (dedup+derive+1m rollup)
    plus day-block Gorilla encode — the two consuming passes of the store
    build — on one fixed input."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from gorilla_tsc_ray.context import tune_context
    from gorilla_tsc_ray.pipelines import ingest
    from gorilla_tsc_ray.sources.transcripts import transcripts_dir

    tune_context()
    tdir = transcripts_dir(sf_dir)
    import duckdb
    n_turns = duckdb.sql(
        f"select count(*) from read_parquet('{tdir}/*.parquet')").fetchone()[0]
    # warm the cluster on a tiny input first (cold start is not throughput)
    ingest.rollup_tier("/root/testdata/sf0.001", "1m").count()

    # best-of-2 per stage: host noise is ±30-40%; throughput capability is
    # what the cluster-size criterion compares
    queries = {"store_build": float("inf")}
    for _ in range(3):
        t = time.perf_counter()
        # ONE pass: 1m rollup + all Gorilla day blocks from a single shuffle
        ingest.build_store_combined(sf_dir, "1m").count()
        queries["store_build"] = round(
            min(queries["store_build"], time.perf_counter() - t), 3)
    total = sum(queries.values())
    ray.shutdown()
    # single-core tenancy probe (BASELINE: quiet window = 163-226 M
    # pts/s): stamps every level run so the artifact self-documents the
    # host window it was measured in
    probe = codec_microbench()["encode_mpoints_per_sec"]
    return {
        "queries": queries, "num_cpus": num_cpus, "n_turns": int(n_turns),
        "turns_per_sec": round(n_turns / total, 1),
        "probe_mpoints": round(probe, 1),
    }


def main() -> None:
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

    if "--scaling-single" in sys.argv:
        n = num_cpus
        res = run_scaling_pipeline(os.environ["GRAFT_SCALING_SF"], n)
        print(json.dumps(res))
        return

    if "--scaling" in sys.argv:
        # the scaling criterion needs a compute-bound input: the sf0.1 table
        # leaves 32 cores starved by fixed per-stage costs, so scale the
        # deterministic transcript generator up (same input for both
        # levels).  sf8 (91.8M turns) amortizes the fixed ~0.5 s session
        # component that capped sf2 pairs at ~0.80 (measured 0.886 median
        # at 4→16, BASELINE.md)
        scaling_sf = os.environ.get("GRAFT_SCALING_SF", "/root/testdata/sf8")
        from gorilla_tsc_ray.sources.transcripts import transcripts_dir
        transcripts_dir(scaling_sf)  # materialize cache once, outside timing
        # host timing noise is ±30-40% (BASELINE.md): run PAIRS of fresh
        # 8/32-cpu processes in alternating order and report the median
        # per-pair efficiency plus best-of walls
        def one(n):
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n),
                       GRAFT_SCALING_SF=scaling_sf)
            out = subprocess.run(
                [sys.executable, __file__, "--scaling-single"],
                env=env, capture_output=True, text=True, check=True)
            return json.loads(out.stdout.strip().splitlines()[-1])

        lo, hi = (int(x) for x in os.environ.get(
            "GRAFT_SCALING_LEVELS", "4,16").split(","))
        pairs = []
        for i in range(3):
            order = (lo, hi) if i % 2 == 0 else (hi, lo)
            got = {n: one(n) for n in order}
            pairs.append(got)
        effs = sorted((p[hi]["turns_per_sec"] / p[lo]["turns_per_sec"])
                      / (hi / lo) for p in pairs)
        # headline statistic (`value`): MEDIAN of the per-pair efficiencies
        # — the noise-robust estimator (ADVICE r2: best-of-runs is biased
        # upward under one-sided host noise).  The best-of-all-walls
        # capability estimate is reported alongside as best_of_efficiency
        # (min wall per level; host noise only ever ADDS time).
        runs = {lo: max((p[lo] for p in pairs),
                        key=lambda r: r["turns_per_sec"]),
                hi: max((p[hi] for p in pairs),
                        key=lambda r: r["turns_per_sec"])}
        tps8 = runs[lo]["turns_per_sec"]
        tps32 = runs[hi]["turns_per_sec"]
        best_eff = (tps32 / tps8) / (hi / lo)
        print(json.dumps({
            "metric": f"scaling efficiency (turns/s, {lo}→{hi} CPUs, "
                      "pair-median)",
            "value": round(effs[len(effs) // 2], 3), "unit": "efficiency",
            "efficiency_runs": [round(e, 3) for e in effs],
            "pair_median_efficiency": round(effs[len(effs) // 2], 3),
            "best_of_efficiency": round(best_eff, 3),
            "sf": _sf_tag(scaling_sf),
            "n_turns": runs[lo]["n_turns"],
            "throughput_locpu": tps8, "throughput_hicpu": tps32,
            "levels": [lo, hi],
            "queries_locpu": runs[lo]["queries"],
            "queries_hicpu": runs[hi]["queries"],
            # per-run single-core tenancy probes, pair order (quiet
            # window = 163-226 M pts/s — BASELINE.md): a pair whose
            # probes sit far below that range was measured in a degraded
            # host window and undershoots capability
            "probes_mpoints": [
                {str(n): p[n].get("probe_mpoints") for n in p}
                for p in pairs],
        }))
        return

    pipe = run_pipelines(sf_dir, num_cpus)
    codec = codec_microbench()
    print(json.dumps({
        "metric": "rollup+encode wall time (headline pipelines)",
        "value": pipe["total_sec"], "unit": "sec",
        "queries": pipe["queries"],
        "docs_queries": pipe["docs_queries"],
        "docs_sec": pipe["docs_sec"],
        "extra_queries": pipe["extra_queries"],
        "extra_sec": pipe["extra_sec"],
        "r5_queries": pipe["r5_queries"],
        "r5_sec": pipe["r5_sec"],
        "rotated_queries": pipe["rotated_queries"],
        "sf": _sf_tag(sf_dir), "num_cpus": num_cpus,
        "n_turns": pipe["n_turns"],
        "turns_per_sec": pipe["turns_per_sec"],
        "bytes_per_point": pipe["bytes_per_point"],
        "bytes_per_point_gorilla2e": pipe["bytes_per_point_gorilla2e"],
        "codec": codec,
    }))


if __name__ == "__main__":
    main()
