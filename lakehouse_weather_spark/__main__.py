"""CLI entry point — the engine's equivalent of triggering the
reference's Airflow DAGs (``dags/bronze.py:133-145`` etc.), minus the
orchestrator:

    python -m lakehouse_weather_spark pipeline --sf-dir DIR --out DIR
    python -m lakehouse_weather_spark query NAME [--sf-dir DIR]
    python -m lakehouse_weather_spark list
    python -m lakehouse_weather_spark search "query text" --out DIR [-k 5]
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="lakehouse_weather_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_pipe = sub.add_parser("pipeline", help="run bronze->silver->gold rebuild")
    p_pipe.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_pipe.add_argument("--out", required=True)

    p_q = sub.add_parser("query", help="run a registered query, print 20 rows")
    p_q.add_argument("name")
    p_q.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    sub.add_parser("list", help="list registered queries")

    p_s = sub.add_parser("search", help="vector search over gold embeddings")
    p_s.add_argument("text")
    p_s.add_argument("--out", required=True, help="pipeline output dir")
    p_s.add_argument("-k", type=int, default=5)

    p_sql = sub.add_parser(
        "sql", help="run ad-hoc SQL over the test tables (registered as views)"
    )
    p_sql.add_argument("statement")
    p_sql.add_argument("--sf-dir", default="/root/testdata/sf0.01")

    p_c = sub.add_parser(
        "crawl", help="BFS-crawl live URLs with the real fetch backend"
    )
    p_c.add_argument("seeds", nargs="+")
    p_c.add_argument("--depth", type=int, default=1)
    p_c.add_argument("--out", help="optional parquet output dir")

    args = ap.parse_args(argv)

    from lakehouse_weather_spark.registry import load_all

    if args.cmd == "list":
        for name, spec in sorted(load_all().items()):
            kind = "oracle" if spec.oracle else "rows-only"
            print(f"{name:<24} [{kind}] {spec.doc.split('.')[0]}")
        return 0

    from lakehouse_weather_spark.session import get_spark

    spark = get_spark("cli")
    try:
        if args.cmd == "pipeline":
            from lakehouse_weather_spark.pipeline.medallion import run_pipeline

            counts = run_pipeline(spark, args.sf_dir, args.out)
            print(counts)
        elif args.cmd == "query":
            spec = load_all().get(args.name)
            if spec is None:
                print(f"unknown query {args.name!r}; see `list`", file=sys.stderr)
                return 2
            spec.fn(spark, args.sf_dir).show(20, truncate=80)
        elif args.cmd == "search":
            from lakehouse_weather_spark.pipeline.medallion import vector_search

            vector_search(spark, args.out, args.text, k=args.k).show(
                args.k, truncate=60
            )
        elif args.cmd == "sql":
            from lakehouse_weather_spark.sources.tables import register_views

            register_views(spark, args.sf_dir)
            spark.sql(args.statement).show(50, truncate=80)
        elif args.cmd == "crawl":
            from lakehouse_weather_spark.pipeline.crawl import crawl

            pages = crawl(spark, args.seeds, args.depth)
            if args.out:
                pages.write.mode("overwrite").parquet(args.out)
            pages.select("url", "content_type", "crawl_depth").show(
                50, truncate=80
            )
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
