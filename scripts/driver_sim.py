"""Local simulation of the external driver's correctness gate.

Runs every ``queries()[name](sf_dir)`` and the matching ``oracle_sql()``
via DuckDB with the testdata tables pre-registered as views, then compares
row count, column-name sets, and order-insensitive values (columns sorted
by name, rows sorted, float-tolerant at 1e-9 / exact for ints+strings).

Usage: python scripts/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa
        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()  # ray Dataset


def compare(got: pd.DataFrame, exp: pd.DataFrame) -> list[str]:
    problems = []
    if len(got) != len(exp):
        problems.append(f"rows: ray={len(got)} oracle={len(exp)}")
    if sorted(got.columns) != sorted(exp.columns):
        problems.append(f"cols: ray={sorted(got.columns)} oracle={sorted(exp.columns)}")
        return problems
    cols = sorted(got.columns)
    g = got[cols].sort_values(cols).reset_index(drop=True)
    e = exp[cols].sort_values(cols).reset_index(drop=True)
    if len(g) != len(e):
        return problems
    for c in cols:
        gv, evv = g[c].to_numpy(), e[c].to_numpy()
        if gv.dtype != evv.dtype:
            # the real driver's value-hash is DTYPE-SENSITIVE (CLAUDE.md:
            # round 1's only red row was an equal-valued int64-vs-float64
            # mismatch this tolerant compare silently passed) — flag it
            problems.append(f"col {c} dtype: ray={gv.dtype} "
                            f"oracle={evv.dtype} (driver hash is "
                            f"dtype-sensitive)")
        if gv.dtype.kind == "f" or evv.dtype.kind == "f":
            ok = np.allclose(gv.astype(float), evv.astype(float),
                             atol=1e-9, rtol=0, equal_nan=True)
        else:
            ok = bool(np.array_equal(gv, evv))
        if not ok:
            bad = None
            try:
                if gv.dtype.kind == "f":
                    diffs = ~np.isclose(gv.astype(float), evv.astype(float),
                                        atol=1e-9, rtol=0, equal_nan=True)
                else:
                    diffs = gv != evv
                i = int(np.flatnonzero(diffs)[0])
                bad = f" first diff row {i}: ray={gv[i]!r} oracle={evv[i]!r}"
            except Exception:
                pass
            problems.append(f"col {c} values differ{bad or ''}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: ray error: {exc}")
            failures += 1
            continue
        t1 = time.time()
        if name not in oracles:
            print(f"ok?  {name}: rows={len(got)} (no oracle, rows-only) "
                  f"[{t1-t0:.1f}s]")
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: oracle error: {exc}")
            failures += 1
            continue
        problems = compare(got, exp)
        if problems:
            failures += 1
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            print(f"PASS {name}: rows={len(got)} [{t1-t0:.1f}s ray, "
                  f"{time.time()-t1:.1f}s oracle]")
    ray.shutdown()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
