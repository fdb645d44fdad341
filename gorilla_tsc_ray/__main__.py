"""CLI entry points — the ``ray job submit`` surface.

    python -m gorilla_tsc_ray ingest    --sf-dir DIR --out STORE [--no-resume]
    python -m gorilla_tsc_ray append    --sf-dir DIR --store S [--ts-lo MS]
                                        [--ts-hi MS] [--keep-history]
    python -m gorilla_tsc_ray query     --store STORE [--metric M] [--t-lo MS]
                                        [--t-hi MS] [--conv ID ...]
                                        [--value-lo V] [--value-hi V] --out DIR
    python -m gorilla_tsc_ray retention --store STORE --now-ms N
                                        [--keep tier=days ...] [--dry-run]
                                        [--archive [--archive-codec C]]
    python -m gorilla_tsc_ray compact   --store STORE [--tiers ...]
    python -m gorilla_tsc_ray fsck      --store STORE [--repair] [--deep]
    python -m gorilla_tsc_ray transcode --store STORE --to-codec C
    python -m gorilla_tsc_ray index     --store STORE
    python -m gorilla_tsc_ray vacuum    --store STORE --keep-from N
    python -m gorilla_tsc_ray dedup     --sf-dir DIR --out DIR
                                        [--threshold 0.5]
    python -m gorilla_tsc_ray clean     --sf-dir DIR --out DIR

Owns its Ray session (library code never calls ``ray.init``); on a cluster,
drop ``address="local"`` via ``--address auto``.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(args) -> None:
    import ray

    kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                  logging_level="ERROR")
    if args.num_cpus:
        kwargs["num_cpus"] = args.num_cpus
    if not ray.is_initialized():
        ray.init(address=args.address, **kwargs)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="gorilla_tsc_ray")
    p.add_argument("--address", default="local")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="transcripts → block store + rollups")
    pi.add_argument("--sf-dir", required=True)
    pi.add_argument("--out", required=True)
    pi.add_argument("--no-resume", action="store_true")

    pa_ = sub.add_parser(
        "append", help="continuous-aggregate append: fold an event-time "
        "window of new turns into an existing store (affected day "
        "partitions only)")
    pa_.add_argument("--sf-dir", required=True)
    pa_.add_argument("--store", required=True)
    pa_.add_argument("--ts-lo", type=int, default=None,
                     help="window start (epoch ms, inclusive)")
    pa_.add_argument("--keep-history", action="store_true",
                     help="archive superseded day partitions under "
                          "_history/v{N}/ for as-of-version reads")
    pa_.add_argument("--ts-hi", type=int, default=None,
                     help="window end (epoch ms, exclusive)")

    pq = sub.add_parser("query", help="pruned block scan → decoded points")
    pq.add_argument("--store", required=True)
    pq.add_argument("--metric", default=None)
    pq.add_argument("--t-lo", type=int, default=None)
    pq.add_argument("--t-hi", type=int, default=None)
    pq.add_argument("--conv", nargs="*", default=None)
    pq.add_argument("--value-lo", type=float, default=None,
                    help="value predicate (zone-map pruned via the 1m "
                         "tier before any block decodes)")
    pq.add_argument("--value-hi", type=float, default=None)
    pq.add_argument("--out", required=True)

    pd_ = sub.add_parser(
        "dedup", help="near-dup dedup: clusters + surviving doc ids")
    pd_.add_argument("--sf-dir", required=True)
    pd_.add_argument("--out", required=True)
    pd_.add_argument("--threshold", type=float, default=0.5)

    pc_ = sub.add_parser(
        "clean", help="end-to-end corpus clean: train split + exact-dedup "
        "survivor + decontaminated + quality floor")
    pc_.add_argument("--sf-dir", required=True)
    pc_.add_argument("--out", required=True)
    pc_.add_argument("--min-alpha", type=float, default=0.55)

    pr = sub.add_parser("retention", help="apply retention policy to a store")
    pr.add_argument("--store", required=True)
    pr.add_argument("--now-ms", type=int, required=True)
    pr.add_argument("--keep", nargs="*", default=["blocks=7", "rollup_1m=30"],
                    metavar="tier=days")
    pr.add_argument("--dry-run", action="store_true")
    pr.add_argument("--archive", action="store_true",
                    help="demote expired raw blocks to the archival "
                         "tier instead of deleting them")
    pr.add_argument("--archive-codec", default="gorilla2e",
                    choices=["gorilla2e", "gorilla2z"],
                    help="archival codec (gorilla2e: entropy-coded "
                         "stream-split, 0.635x; gorilla2z: DEFLATE "
                         "wrapper, 0.825x)")

    pm = sub.add_parser("compact", help="merge each day partition's "
                        "small files into one (bit-exact rows)")
    pm.add_argument("--store", required=True)
    pm.add_argument("--tiers", nargs="*", default=["blocks"])

    pf = sub.add_parser("fsck", help="store consistency check: coarse "
                        "rollup tiers must equal the cascade of the "
                        "stored 1m rows")
    pf.add_argument("--store", required=True)
    pf.add_argument("--tiers", nargs="*", default=["1h", "1d"])
    pf.add_argument("--repair", action="store_true",
                    help="rebuild inconsistent coarse-tier days from the "
                         "stored 1m rows, then re-check")
    pf.add_argument("--deep", action="store_true",
                    help="also decode the blocks tier and verify the "
                         "stored 1m rollup against the points (cross-"
                         "tier ground-truth check)")

    pt = sub.add_parser("transcode", help="store-wide codec migration "
                        "(bit-exact through raw value bits; resumable "
                        "via lineage)")
    pt.add_argument("--store", required=True)
    pt.add_argument("--to-codec", default="gorilla2",
                    choices=["gorilla2", "gorilla1", "gorilla2_dfcm",
                             "gorilla2z", "gorilla2e"])
    pt.add_argument("--tiers", nargs="*", default=["blocks"])

    px = sub.add_parser("index", help="build the per-day conv-id bloom "
                        "sidecar (point-lookup day pruning)")
    px.add_argument("--store", required=True)

    ps_ = sub.add_parser("stats", help="store summary: per-tier days, "
                         "rows, bytes, points, B/pt and codec mix")
    ps_.add_argument("--store", required=True)

    pv = sub.add_parser("vacuum", help="drop archived store versions "
                        "below --keep-from (frees _history/ space)")
    pv.add_argument("--store", required=True)
    pv.add_argument("--keep-from", type=int, required=True,
                    help="oldest store version that must stay "
                         "as-of-readable")

    args = p.parse_args(argv)
    _init_ray(args)
    import ray

    try:
        if args.cmd == "ingest":
            from .pipelines.ingest import ingest_to_store

            res = ingest_to_store(args.sf_dir, args.out,
                                  resume=not args.no_resume)
            print(json.dumps(res))
        elif args.cmd == "append":
            from .pipelines.ingest import append_to_store

            res = append_to_store(args.sf_dir, args.store,
                                  ts_lo=args.ts_lo, ts_hi=args.ts_hi,
                                  keep_history=args.keep_history)
            print(json.dumps(res))
        elif args.cmd == "query":
            from .pipelines.query import scan_points

            stats: dict = {}
            ds = scan_points(f"{args.store}/blocks", t_lo=args.t_lo,
                             t_hi=args.t_hi, conv_ids=args.conv,
                             metric=args.metric, value_lo=args.value_lo,
                             value_hi=args.value_hi, prune_stats=stats)
            ds.write_parquet(args.out)
            print(json.dumps({"rows": ds.count(), "out": args.out,
                              **stats}))
        elif args.cmd == "dedup":
            from .pipelines.docs import dedup_survivors, dup_clusters

            clusters = dup_clusters(args.sf_dir, threshold=args.threshold)
            clusters.write_parquet(f"{args.out}/clusters")
            survivors = dedup_survivors(args.sf_dir,
                                        threshold=args.threshold)
            survivors.write_parquet(f"{args.out}/survivors")
            print(json.dumps({"clustered": clusters.count(),
                              "survivors": survivors.count(),
                              "out": args.out}))
        elif args.cmd == "clean":
            from .pipelines.docs import clean_corpus

            kept = clean_corpus(args.sf_dir, min_alpha=args.min_alpha)
            kept.write_parquet(args.out)
            print(json.dumps({"kept": kept.count(), "out": args.out}))
        elif args.cmd == "compact":
            from .pipelines.retention import compact_store

            df = compact_store(args.store, tiers=tuple(args.tiers))
            print(df.groupby("status").size().to_json())
        elif args.cmd == "fsck":
            from .pipelines.ingest import fsck_store, repair_store

            def n_bad(df):
                # -1 is the missing-tier sentinel from fsck_store: an
                # absent tier dir is a FAILURE (repair can rebuild it
                # from 1m), not a clean pass — count nonzero-ness of
                # the raw values, never clip the sentinel away.
                return int((df[["n_missing", "n_extra", "n_mismatch"]]
                            .to_numpy() != 0).sum())

            df = fsck_store(args.store, tiers=tuple(args.tiers))
            if args.deep:
                import pandas as pd

                from .pipelines.ingest import fsck_deep

                df = pd.concat([fsck_deep(args.store), df],
                               ignore_index=True)
            print(df.to_json(orient="records"))
            bad = n_bad(df)
            if bad and args.repair:
                sick = [r.tier for r in df.itertuples(index=False)
                        if r.n_missing or r.n_extra or r.n_mismatch]
                repair_store(args.store, tiers=tuple(sick))
                df = fsck_store(args.store, tiers=tuple(args.tiers))
                print(df.to_json(orient="records"))
                bad = n_bad(df)
            return 0 if bad == 0 else 3
        elif args.cmd == "transcode":
            from .pipelines.retention import transcode_store

            df = transcode_store(args.store, to_codec=args.to_codec,
                                 tiers=tuple(args.tiers))
            print(df.to_json(orient="records"))
        elif args.cmd == "index":
            from .pipelines.query import build_conv_bloom

            path = build_conv_bloom(args.store)
            print(json.dumps({"index": path}))
        elif args.cmd == "stats":
            import glob
            import os

            import pyarrow.parquet as pqt

            out = []
            for tier in sorted(os.listdir(args.store)):
                tdir = os.path.join(args.store, tier)
                if tier.startswith("_") or not os.path.isdir(tdir):
                    continue
                files = sorted(glob.glob(os.path.join(
                    tdir, "day=*", "*.parquet"))) or sorted(
                    glob.glob(os.path.join(tdir, "*.parquet")))
                days = {f.split("day=")[1].split("/")[0]
                        for f in files if "day=" in f}
                rows = pay = pts = 0
                codecs: dict = {}
                for f in files:
                    md = pqt.ParquetFile(f)
                    rows += md.metadata.num_rows
                    names = md.schema_arrow.names
                    if "payload" in names:
                        t = pqt.read_table(
                            f, columns=["payload", "n_points", "codec"])
                        pay += sum(len(x)
                                   for x in t.column("payload").to_pylist())
                        pts += sum(t.column("n_points").to_pylist())
                        for c in t.column("codec").to_pylist():
                            codecs[c] = codecs.get(c, 0) + 1
                rec = {"tier": tier, "days": len(days), "rows": rows,
                       "files": len(files)}
                if pts:
                    rec.update({"points": pts, "payload_bytes": pay,
                                "bytes_per_point": round(pay / pts, 3),
                                "codecs": codecs})
                out.append(rec)
            print(json.dumps(out))
        elif args.cmd == "vacuum":
            from .state.lineage import vacuum_history

            print(json.dumps(vacuum_history(args.store, args.keep_from)))
        elif args.cmd == "retention":
            from .pipelines.retention import apply_retention

            policy = {}
            for kv in args.keep:
                tier, days = kv.split("=", 1)
                policy[tier] = int(days)
            df = apply_retention(args.store, policy, now_ms=args.now_ms,
                                 dry_run=args.dry_run, archive=args.archive,
                                 archive_codec=args.archive_codec)
            print(df.groupby("status").size().to_json())
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
