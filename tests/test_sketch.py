"""KLL-style quantile sketch: exact-below-capacity equivalence, merge
associativity, and the compaction rank-error gate."""

from __future__ import annotations

import numpy as np
import pandas as pd

from gorilla_tsc_ray.stages.rollup import quantiles_by_key
from gorilla_tsc_ray.stages.sketch import (compact, quantiles_from_sketch,
                                           sketch_batch)


def _exact_rank_error(est: float, values: np.ndarray) -> float:
    """|rank of estimate − target rank| / n for the quantile it answers."""
    return np.searchsorted(np.sort(values), est) / len(values)


def test_exact_below_capacity_matches_quantiles_by_key():
    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "user_id": np.repeat(np.arange(20, dtype=np.int64), 150),
        "value": rng.normal(0, 100, 3000),
    })
    sk = sketch_batch(df, key_col="user_id", k=200)
    assert (sk["weight"] == 1).all()          # never compacted
    got = quantiles_from_sketch(sk, key_col="user_id")
    exp = quantiles_by_key(df, key_col="user_id")
    got = got.sort_values("user_id").reset_index(drop=True)
    exp = exp.sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp[got.columns])


def test_merge_equals_single_pass_when_exact():
    rng = np.random.default_rng(5)
    df = pd.DataFrame({"user_id": np.zeros(120, dtype=np.int64),
                       "value": rng.uniform(-1, 1, 120)})
    whole = sketch_batch(df, key_col="user_id", k=200)
    a = sketch_batch(df.iloc[:70], key_col="user_id", k=200)
    b = sketch_batch(df.iloc[70:], key_col="user_id", k=200)
    merged = sketch_batch(pd.concat([a, b], ignore_index=True),
                          key_col="user_id", k=200, weight_col="weight")
    q1 = quantiles_from_sketch(whole, key_col="user_id")
    q2 = quantiles_from_sketch(merged, key_col="user_id")
    pd.testing.assert_frame_equal(q1, q2)


def test_compaction_preserves_total_weight():
    rng = np.random.default_rng(3)
    n = 50_000
    key = np.zeros(n, dtype=np.int64)
    k2, v2, w2 = compact(key, rng.normal(size=n),
                         np.ones(n, dtype=np.int64), k=128)
    # each odd-sized compaction drifts total weight by ±2^level (inherent
    # to KLL); the drift stays a vanishing fraction of n
    assert abs(int(w2.sum()) - n) < 0.01 * n
    # bounded state: ≤ k items per level
    for lvl in np.unique(w2):
        assert (w2 == lvl).sum() <= 128


def test_compaction_rank_error_gate():
    """Rank error of p50/p95/p99 stays within ~2.5·log2(n/k)/k on heavy
    compaction (KLL bound with slack for the deterministic parity)."""
    rng = np.random.default_rng(7)
    n, k = 200_000, 200
    for dist in (rng.normal(size=n), rng.lognormal(size=n),
                 np.sort(rng.uniform(size=n))):
        df = pd.DataFrame({"user_id": np.zeros(n, dtype=np.int64),
                           "value": dist})
        sk = sketch_batch(df, key_col="user_id", k=k)
        assert len(sk) < 30 * k               # bounded state
        got = quantiles_from_sketch(sk, key_col="user_id")
        tol = 2.5 * np.log2(n / k) / k
        for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
            est = got[col].iloc[0]
            rank = np.searchsorted(np.sort(dist), est) / n
            assert abs(rank - q) < tol, (col, rank, q, tol)


def test_pipeline_matches_exact_at_small_scale(ray_session, sf_small):
    from gorilla_tsc_ray.pipelines import events as ev

    exact = (ev.user_quantiles(sf_small).to_pandas()
             .sort_values("user_id").reset_index(drop=True))
    sk = (ev.user_quantiles_sketch(sf_small).to_pandas()
          .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(sk[exact.columns], exact)


def test_kmv_exact_below_capacity_and_merge():
    rng = np.random.default_rng(2)
    from gorilla_tsc_ray.stages.sketch import kmv_estimate, kmv_rows

    df = pd.DataFrame({
        "g": np.repeat(["a", "b"], 500),
        "v": np.concatenate((rng.integers(0, 200, 500),      # ~200 distinct
                             rng.integers(0, 40, 500))),     # ~40 distinct
    })
    sk = kmv_rows(df, key_col="g", value_col="v", k=1024)
    est = kmv_estimate(sk, key_col="g", k=1024).set_index("g")["n_distinct"]
    exact = df.groupby("g")["v"].nunique()
    assert (est == exact).all()                   # below capacity → exact
    # split + merge == single pass
    a = kmv_rows(df.iloc[:300], key_col="g", value_col="v", k=1024)
    b = kmv_rows(df.iloc[300:], key_col="g", value_col="v", k=1024)
    merged = kmv_rows(pd.concat([a, b], ignore_index=True), key_col="g",
                      value_col="v", k=1024, hashed=True)
    est2 = kmv_estimate(merged, key_col="g",
                        k=1024).set_index("g")["n_distinct"]
    assert (est2 == exact).all()


def test_kmv_estimator_error_gate():
    """Relative error above capacity ~ 1/sqrt(k) (KMV standard bound)."""
    from gorilla_tsc_ray.stages.sketch import kmv_estimate, kmv_rows

    rng = np.random.default_rng(9)
    n_distinct = 100_000
    df = pd.DataFrame({"g": np.zeros(n_distinct, dtype=np.int64),
                       "v": np.arange(n_distinct, dtype=np.int64)})
    for k in (256, 1024):
        sk = kmv_rows(df, key_col="g", value_col="v", k=k)
        assert len(sk) == k                       # bounded state
        est = kmv_estimate(sk, key_col="g", k=k)["n_distinct"].iloc[0]
        rel = abs(est - n_distinct) / n_distinct
        assert rel < 4 / np.sqrt(k), (k, est, rel)


def test_misra_gries_exact_and_undercount_bound():
    from gorilla_tsc_ray.stages.sketch import misra_gries

    rng = np.random.default_rng(4)
    # exact when distinct ≤ k
    small = pd.DataFrame({"tok": rng.choice(list("abcde"), 1000)})
    mg = misra_gries(small, item_col="tok", count_col=None, k=64)
    exact = small["tok"].value_counts()
    got = mg.set_index("tok")["cnt"]
    assert (got.sort_index() == exact.sort_index()).all()
    # heavy compaction: undercount ≤ n/(k+1), heavy items survive
    n, k = 100_000, 128
    zipf = np.minimum(rng.zipf(1.5, n), 10_000)
    df = pd.DataFrame({"tok": zipf.astype(str)})
    mg = misra_gries(df, item_col="tok", count_col=None, k=k)
    assert len(mg) <= k
    truth = df["tok"].value_counts()
    est = mg.set_index("tok")["cnt"]
    for tok in truth.index[:10]:                  # the heavy hitters
        assert tok in est.index
        under = truth[tok] - est[tok]
        assert 0 <= under <= n / (k + 1), (tok, truth[tok], est[tok])


def test_sketch_property_random():
    """Hypothesis-style property over random shapes: for arbitrary key
    layouts and value distributions, every estimated quantile's true rank
    stays within the KLL bound of its target."""
    from gorilla_tsc_ray.stages.sketch import (quantiles_from_sketch,
                                               sketch_batch)

    rng = np.random.default_rng(123)
    for trial in range(6):
        n_keys = int(rng.integers(1, 6))
        sizes = rng.integers(1, 30_000, n_keys)
        k = int(rng.choice([64, 128, 256]))
        frames = []
        for u, n in enumerate(sizes):
            dist = rng.choice([0, 1, 2])
            v = (rng.normal(size=n) if dist == 0
                 else rng.lognormal(size=n) if dist == 1
                 else rng.integers(0, 5, n).astype(float))  # heavy ties
            frames.append(pd.DataFrame({
                "user_id": np.full(n, u, dtype=np.int64), "value": v}))
        df = pd.concat(frames, ignore_index=True)
        sk = sketch_batch(df, key_col="user_id", k=k)
        got = quantiles_from_sketch(sk, key_col="user_id")
        for u, n in enumerate(sizes):
            vals = np.sort(df.loc[df["user_id"] == u, "value"].to_numpy())
            tol = (3.0 * np.log2(max(n / k, 2)) / k) + 2.0 / n
            row = got.loc[got["user_id"] == u].iloc[0]
            for q, col in ((0.5, "p50"), (0.95, "p95"), (0.99, "p99")):
                est = row[col]
                lo = np.searchsorted(vals, est, side="left") / n
                hi = np.searchsorted(vals, est, side="right") / n
                # with ties the estimate covers a rank RANGE [lo, hi)
                dist_to_q = max(lo - q, q - hi, 0.0)
                assert dist_to_q < tol, (trial, u, col, lo, hi, q, tol)


def test_user_quantiles_heavy_key_auto_route(ray_session):
    """Forcing the heavy-partition threshold to 0 must flip user_quantiles
    to the KLL sketch sibling, and at this scale (every user below sketch
    capacity -> exact) the flipped output equals the exact kernel's."""
    from gorilla_tsc_ray.pipelines import events as ev

    sf = "/root/testdata/sf0.001"
    exact = (ev.user_quantiles(sf).to_pandas()
             .sort_values("user_id").reset_index(drop=True))
    routed = (ev.user_quantiles(sf, heavy_partition_rows=0).to_pandas()
              .sort_values("user_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(exact, routed[exact.columns],
                                  check_exact=False, atol=1e-9)


def test_cms_linearity_and_bound():
    """CMS partials from any batch split merge by addition to the
    whole-input sketch; point estimates never underestimate and respect
    the eN/w overestimate bound."""
    import pandas as pd

    from gorilla_tsc_ray.stages.sketch import cms_estimate, cms_rows

    rng = np.random.default_rng(3)
    items = rng.choice([f"k{i}" for i in range(40)], size=5000,
                       p=np.linspace(1, 40, 40) / np.linspace(1, 40, 40).sum())
    df = pd.DataFrame({"x": items})
    whole = cms_rows(df, item_col="x", d=4, w=64)
    parts = pd.concat([cms_rows(df.iloc[:1700], item_col="x", d=4, w=64),
                       cms_rows(df.iloc[1700:], item_col="x", d=4, w=64)])
    merged = parts.groupby(["r", "c"], sort=False)["cnt"].sum().reset_index()
    w_sorted = whole.sort_values(["r", "c"]).reset_index(drop=True)
    m_sorted = merged.sort_values(["r", "c"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(w_sorted, m_sorted[w_sorted.columns])

    keys = np.unique(items)
    true = pd.Series(items).value_counts()
    est = cms_estimate(merged, keys, d=4, w=64)
    for k, e in zip(keys, est):
        assert e >= true[k]                       # never underestimates
        assert e <= true[k] + 2 * len(items) / 64  # CM bound (eps=2/w)


def test_cms_exact_when_sparse(ray_session):
    import duckdb

    from gorilla_tsc_ray.pipelines import events as ev

    got = (ev.type_counts_cms("/root/testdata/sf0.001").to_pandas()
           .sort_values("event_type").reset_index(drop=True))
    exp = duckdb.connect().execute("""
        SELECT event_type, CAST(count(*) AS BIGINT) AS est_count
        FROM read_parquet('/root/testdata/sf0.001/events.parquet')
        GROUP BY 1 ORDER BY 1""").df()
    pd.testing.assert_frame_equal(got, exp[got.columns])
