#!/usr/bin/env python
"""Local mirror of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle over the same
parquet tables, then compares row count, schema, and (order-insensitive)
values. Usage:

    python tools/check_oracle.py [--sf-dir /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from lakehouse_weather_spark.registry import load_all  # noqa: E402
from lakehouse_weather_spark.session import get_spark  # noqa: E402
from lakehouse_weather_spark.sources.tables import TABLES  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _canon_cell(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "␀"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def canonize(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    rows = [
        tuple(_canon_cell(v) for v in row)
        for row in pdf[cols].itertuples(index=False, name=None)
    ]
    rows.sort()
    return rows


def compare_one(name: str, spec, spark, con, sf_dir: str) -> dict:
    out: dict = {"name": name}
    t0 = time.time()
    sdf = spec.fn(spark, sf_dir)
    spdf = sdf.toPandas()
    out["spark_sec"] = round(time.time() - t0, 2)
    out["spark_rows"] = len(spdf)
    out["spark_schema"] = [(f.name, f.dataType.simpleString()) for f in sdf.schema.fields]
    if spec.oracle is None:
        out["status"] = "ROWS_ONLY" if len(spdf) >= 0 else "FAIL"
        return out
    t0 = time.time()
    ddf = con.execute(spec.oracle).fetchdf()
    out["duck_sec"] = round(time.time() - t0, 2)
    out["duck_rows"] = len(ddf)
    out["duck_dtypes"] = [(c, str(ddf[c].dtype)) for c in ddf.columns]
    if sorted(spdf.columns) != sorted(ddf.columns):
        out["status"] = "COLUMN_MISMATCH"
        out["detail"] = f"spark={sorted(spdf.columns)} duck={sorted(ddf.columns)}"
        return out
    if len(spdf) != len(ddf):
        out["status"] = "ROWCOUNT_MISMATCH"
        return out
    srows, drows = canonize(spdf), canonize(ddf)
    if srows == drows:
        out["status"] = "OK"
    else:
        out["status"] = "VALUE_MISMATCH"
        diffs = [(a, b) for a, b in zip(srows, drows) if a != b]
        out["detail"] = f"{len(diffs)} differing rows; first: {diffs[0] if diffs else ''}"
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument(
        "--json",
        metavar="PATH",
        help="also write per-query results as a JSON record (the local"
        " mirror of the driver's CORRECTNESS file, but over the FULL"
        " registry)",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    specs = load_all()
    names = args.names or list(specs)
    spark = get_spark("check_oracle", shuffle_partitions=8)
    con = duck_con(args.sf_dir)
    failures = 0
    record: dict[str, dict] = {}
    for name in names:
        if name not in specs:
            print(f"?? unknown query {name}")
            failures += 1
            continue
        try:
            res = compare_one(name, specs[name], spark, con, args.sf_dir)
            record[name] = {
                k: res.get(k)
                for k in ("status", "spark_rows", "duck_rows", "spark_sec", "detail")
                if res.get(k) is not None
            }
        except Exception as e:  # noqa: BLE001
            print(f"ERROR      {name}: {type(e).__name__}: {e}")
            record[name] = {"status": "ERROR", "detail": f"{type(e).__name__}: {e}"}
            failures += 1
            continue
        ok = res["status"] in ("OK", "ROWS_ONLY")
        if not ok:
            failures += 1
        line = f"{res['status']:<18} {name:<24} rows={res.get('spark_rows')}"
        if not ok:
            line += f"\n    spark_schema={res.get('spark_schema')}"
            line += f"\n    duck_dtypes={res.get('duck_dtypes')}"
            line += f"\n    {res.get('detail', '')}"
        print(line)
    print(f"\n{len(names) - failures}/{len(names)} passed")
    if args.json:
        import json

        summary = {
            "sf_dir": args.sf_dir,
            "n_queries": len(names),
            "n_passed": len(names) - failures,
            "queries": record,
        }
        with open(args.json, "w") as fh:
            json.dump(summary, fh, indent=1, sort_keys=True)
        print(f"wrote {args.json}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
