"""Run any registry query by name and print its result (dev CLI).

Usage:
    PYTHONPATH=. python tools/run_query.py <name> [--sf DIR] [-n ROWS]
    PYTHONPATH=. python tools/run_query.py --list [--grep PAT]
    PYTHONPATH=. python tools/run_query.py <name> --explain
    PYTHONPATH=. python tools/run_query.py <name> --oracle   # print SQL twin
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("name", nargs="?")
    p.add_argument("--sf", default="/root/testdata/sf0.01")
    p.add_argument("-n", type=int, default=20, help="rows to show")
    p.add_argument("--list", action="store_true")
    p.add_argument("--grep", default=None, help="filter --list by substring")
    p.add_argument("--explain", action="store_true", help="formatted plan only")
    p.add_argument("--oracle", action="store_true", help="print the SQL twin")
    args = p.parse_args(argv)

    from covid19_etl_pipeline_spark.plans.queries import REGISTRY

    if args.list or not args.name:
        for name, spec in REGISTRY.items():
            if args.grep and args.grep not in name:
                continue
            tag = "" if spec.oracle else "  [rows-only]"
            print(f"{name}{tag}")
        return 0
    if args.name not in REGISTRY:
        print(f"unknown query {args.name!r}; try --list", file=sys.stderr)
        return 2
    spec = REGISTRY[args.name]
    if args.oracle:
        print(spec.oracle or "(no oracle — rows-only streaming query)")
        return 0

    from covid19_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"run-{args.name}")
    df = spec.fn(spark, args.sf)
    if args.explain:
        df.explain("formatted")
    else:
        df.show(args.n, truncate=False)
        print(f"-- {args.name}: {df.count()} rows at {args.sf}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
