#!/usr/bin/env python
"""Per-query optimization profiler (guide §1: measure first).

For each named query (default: all registered), runs the same
fn+noop-sink protocol as bench.py but splits the wall time into
  build_s  — Python-side DataFrame construction (plan building; any
             eager actions like checkpoints/collects land here)
  exec_s   — the noop-sink execution of the returned plan
and counts the Spark jobs each phase launched (statusTracker deltas).
Optionally dumps .explain('formatted') to plans/r10/<name>_<tag>.txt.

Usage:
    python tools/profile_queries.py [--plans TAG] [--repeat N] [names...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakehouse_weather_spark.registry import load_all  # noqa: E402
from lakehouse_weather_spark.session import default_sf_dir, get_spark  # noqa: E402


def _dump_plan(df, plans_dir: str, name: str, tag: str) -> None:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    with open(os.path.join(plans_dir, f"{name}_{tag}.txt"), "w") as fh:
        fh.write(buf.getvalue())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--plans", default=None, help="dump plans with this tag")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--out", default=None, help="write JSON rows here")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument(
        "--plans-only",
        action="store_true",
        help="dump plans without the timed noop execution",
    )
    args = ap.parse_args()

    sf_dir = default_sf_dir()
    specs = load_all()
    names = args.names or list(specs)
    spark = get_spark("profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # same warmup as bench.py so numbers are comparable
    spark.range(1).collect()
    if not args.no_warm:
        specs["q_agg_basic"].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        try:
            from lakehouse_weather_spark.operators.tpch import (
                ensure_bucketed_facts,
            )

            ensure_bucketed_facts(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"WARN warmup bucketed: {exc!r}", file=sys.stderr)
        try:
            from lakehouse_weather_spark.operators.dedup import (
                warm_dedup_substrate,
            )

            warm_dedup_substrate(spark, sf_dir)
        except Exception as exc:  # noqa: BLE001
            print(f"WARN warmup substrate: {exc!r}", file=sys.stderr)
        try:
            from lakehouse_weather_spark.session import warm_python_workers

            warm_python_workers(spark)
        except Exception as exc:  # noqa: BLE001
            print(f"WARN warmup python workers: {exc!r}", file=sys.stderr)

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_DIR", "r11"),
    )
    if args.plans_only and not args.plans:
        args.plans = "before"
    if args.plans:
        os.makedirs(plans_dir, exist_ok=True)

    rows = []
    for name in names:
        spec = specs.get(name)
        if spec is None:
            print(f"SKIP unknown {name}", file=sys.stderr)
            continue
        if args.plans_only:
            _dump_plan(spec.fn(spark, sf_dir), plans_dir, name, args.plans)
            print(f"plan     {name}")
            continue
        best = None
        for _ in range(max(1, args.repeat)):
            j0 = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}:build")
            t0 = time.time()
            df = spec.fn(spark, sf_dir)
            t1 = time.time()
            j1 = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"profile:{name}:exec")
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = len(tracker.getJobIdsForGroup(None) or [])
            sc.setJobDescription(None)
            row = {
                "name": name,
                "build_s": round(t1 - t0, 3),
                "exec_s": round(t2 - t1, 3),
                "total_s": round(t2 - t0, 3),
                "build_jobs": j1 - j0,
                "exec_jobs": j2 - j1,
            }
            if best is None or row["total_s"] < best["total_s"]:
                best = row
        rows.append(best)
        print(
            f"{best['total_s']:8.3f} = build {best['build_s']:7.3f}"
            f" ({best['build_jobs']:3d} jobs) + exec {best['exec_s']:7.3f}"
            f" ({best['exec_jobs']:3d} jobs)  {name}"
        )
        if args.plans:
            _dump_plan(spec.fn(spark, sf_dir), plans_dir, name, args.plans)
    if args.out:
        with open(args.out, "w") as fh:
            json.dump(rows, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
