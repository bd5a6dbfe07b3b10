"""Run any registered query from the command line — the ad-hoc entry a
user reaches for before wiring the engine into a scheduler:

    python -m drug_target_discovery_spark.run_query <query> \
        [--sf-dir /root/testdata/sf0.01] [--limit 20] [--explain] \
        [--out PATH (parquet)]

``--list`` prints the catalog (name + tags). ``--explain`` prints the
formatted physical plan instead of rows — the plan-audit loop in script
form.
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="drug_target_discovery_spark.run_query")
    ap.add_argument("query", nargs="?", help="registered query name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=20)
    ap.add_argument("--explain", action="store_true")
    ap.add_argument("--out", help="write full result as parquet to this path")
    ap.add_argument("--list", action="store_true", help="list queries and exit")
    args = ap.parse_args(argv)

    from drug_target_discovery_spark.queries.registry import all_queries

    reg = all_queries()
    if args.list or not args.query:
        for name in sorted(reg):
            q = reg[name]
            oracle = "oracle" if q.oracle else "rows-only"
            print(f"{name:42s} [{oracle}] {', '.join(q.tags)}")
        return 0
    if args.query not in reg:
        import difflib

        near = difflib.get_close_matches(args.query, reg, n=3)
        print(f"unknown query {args.query!r}; close: {near}", file=sys.stderr)
        return 2

    from drug_target_discovery_spark.session import get_spark

    spark = get_spark("run-query")
    df = reg[args.query].fn(spark, args.sf_dir)
    if args.explain:
        df.explain("formatted")
    elif args.out:
        df.write.mode("overwrite").parquet(args.out)
        print(f"wrote {args.out}")
    else:
        df.show(args.limit, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
