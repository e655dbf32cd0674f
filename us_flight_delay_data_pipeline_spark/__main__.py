"""Command-line entry point: run, list, explain, and inspect the
registered queries the way a user of the engine would.

    python -m us_flight_delay_data_pipeline_spark list [substr]
    python -m us_flight_delay_data_pipeline_spark run <query>
        [--sf-dir DIR] [--show N] [--explain]
    python -m us_flight_delay_data_pipeline_spark oracle <query>

``run`` executes one registered query against a testdata directory
and prints the first rows; ``--explain`` prints the formatted
physical plan instead (the thing to read before trusting a query at
scale). ``oracle`` prints the query's DuckDB differential SQL.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="us_flight_delay_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    p_list = sub.add_parser("list", help="list registered queries")
    p_list.add_argument("substr", nargs="?", default="",
                        help="case-insensitive name filter")

    p_run = sub.add_parser("run", help="run one query")
    p_run.add_argument("query")
    p_run.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    p_run.add_argument("--show", type=int, default=20,
                       help="rows to print (0 = just count)")
    p_run.add_argument("--explain", action="store_true",
                       help="print the formatted physical plan instead")

    p_or = sub.add_parser("oracle", help="print a query's DuckDB SQL")
    p_or.add_argument("query")

    args = p.parse_args(argv)

    from .queries import load_registry
    reg = load_registry()

    if args.cmd == "list":
        needle = args.substr.lower()
        for name in sorted(reg):
            if needle in name.lower():
                gate = "oracle" if reg[name].oracle else "rows-only"
                doc = " ".join((reg[name].doc or "").split())
                print(f"{name}  [{gate}]  {doc[:100]}")
        return 0

    if args.query not in reg:
        close = [n for n in sorted(reg) if args.query.lower() in n.lower()]
        print(f"unknown query {args.query!r}; did you mean: {close[:8]}",
              file=sys.stderr)
        return 2

    if args.cmd == "oracle":
        sql = reg[args.query].oracle
        if sql is None:
            print(f"{args.query} is rows-only (no oracle)", file=sys.stderr)
            return 1
        print(sql.strip())
        return 0

    from .session import get_spark
    spark = get_spark(app_name=f"cli-{args.query}")
    df = reg[args.query].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    elif args.show:
        df.show(args.show, truncate=False)
    else:
        print(df.count())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
