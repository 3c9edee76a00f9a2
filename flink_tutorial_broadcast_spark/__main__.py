"""CLI entry point: run any registered query by name.

    python -m flink_tutorial_broadcast_spark q_tpch_q1 \
        [--sf-dir /root/testdata/sf0.01] [--show 20] [--explain]
    python -m flink_tutorial_broadcast_spark --list [pattern]

Uses the engine session (AQE, Arrow, UTC — session.py); `--explain`
prints the formatted physical plan instead of rows, which is the
one-liner for eyeballing pushdown/broadcast on any operator.
"""
from __future__ import annotations

import argparse
import fnmatch
import os
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="flink_tutorial_broadcast_spark")
    ap.add_argument("query", nargs="?", help="registered query key")
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("--show", type=int, default=20,
                    help="rows to print (collect cap)")
    ap.add_argument("--explain", action="store_true",
                    help="print the formatted plan instead of rows")
    ap.add_argument("--list", action="store_true", dest="list_queries",
                    help="list registered keys (query arg = glob filter)")
    args = ap.parse_args(argv)

    from flink_tutorial_broadcast_spark import load_all_queries
    queries = load_all_queries()

    if args.list_queries:
        pat = args.query or "*"
        for name in queries:
            if fnmatch.fnmatch(name, pat):
                print(name)
        return 0

    if not args.query:
        ap.error("query name required (or --list)")
    if args.query not in queries:
        close = [n for n in queries if args.query in n][:5]
        hint = f" (did you mean: {', '.join(close)}?)" if close else ""
        print(f"unknown query: {args.query}{hint}", file=sys.stderr)
        return 2

    from flink_tutorial_broadcast_spark.session import get_spark
    spark = get_spark("cli")
    spark.sparkContext.setLogLevel("ERROR")
    df = queries[args.query](spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.show, truncate=False)
        print(f"[{df.count()} rows total]")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
