"""CLI entry point: list and run catalog queries.

    python -m logstream_processing_service_spark list [--tag TAG]
    python -m logstream_processing_service_spark run QUERY [QUERY ...]
        [--sf-dir DIR] [--limit N] [--explain]

A user of the reference service gets the same "run a query, see rows"
loop without writing any Spark code; ``--explain`` prints the formatted
physical plan instead of rows (the plan-reading workflow this repo's
scale posture is built on).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="logstream_processing_service_spark")
    sub = p.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list", help="list catalog queries")
    p_list.add_argument("--tag", help="filter by tag substring")
    p_run = sub.add_parser("run", help="run queries and print rows")
    p_run.add_argument("queries", nargs="+")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--limit", type=int, default=20)
    p_run.add_argument("--explain", action="store_true")
    args = p.parse_args(argv)

    from .catalog import all_specs

    specs = {s.name: s for s in all_specs()}

    if args.cmd == "list":
        for s in specs.values():
            if args.tag and not any(args.tag in t for t in s.tags):
                continue
            kind = "oracle" if s.oracle else "rows-only"
            print(f"{s.name:36s} {kind:9s} {','.join(s.tags)}")
        return 0

    unknown = [q for q in args.queries if q not in specs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        return 2
    from .session import get_spark

    spark = get_spark(app_name="logstream-cli")
    spark.sparkContext.setLogLevel("ERROR")
    for q in args.queries:
        df = specs[q].fn(spark, args.sf_dir)
        print(f"== {q} ==")
        if args.explain:
            df.explain("formatted")
        else:
            df.show(args.limit, truncate=40)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
