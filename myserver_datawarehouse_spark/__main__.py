"""Command-line entry point: the operational surface the reference
exposes through Airflow task invocations, re-expressed as a CLI.

    python -m myserver_datawarehouse_spark list [--section SUBSTR]
    python -m myserver_datawarehouse_spark run QUERY [--sf-dir DIR]
        [--limit N] [--output PATH]
    python -m myserver_datawarehouse_spark explain QUERY [--sf-dir DIR]
    python -m myserver_datawarehouse_spark oracle QUERY

`run` prints the first N rows (default 20) to stdout, or writes the
full result as parquet when --output is given (the distributed path —
nothing is collected to the driver). `explain` prints the formatted
physical plan, the artifact every scale review in SCALE.md starts from.
"""

from __future__ import annotations

import argparse
import os
import sys


def _build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="myserver_datawarehouse_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    ls = sub.add_parser("list", help="list registry queries")
    ls.add_argument("--section", default=None, help="filter by section substring")

    for name in ("run", "explain"):
        sp = sub.add_parser(name)
        sp.add_argument("query")
        sp.add_argument(
            "--sf-dir",
            default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        )
        if name == "run":
            sp.add_argument("--limit", type=int, default=20)
            sp.add_argument("--output", default=None, help="write parquet here")

    orc = sub.add_parser("oracle", help="print the DuckDB oracle SQL")
    orc.add_argument("query")

    vf = sub.add_parser(
        "verify", help="differential-check queries vs their DuckDB oracles"
    )
    vf.add_argument("queries", nargs="*", help="default: every query")
    vf.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    return p


def main(argv: list[str] | None = None) -> int:
    args = _build_parser().parse_args(argv)
    from myserver_datawarehouse_spark import registry

    if args.cmd == "list":
        for spec in sorted(registry.specs(), key=lambda s: s.name):
            if args.section and args.section.lower() not in spec.section.lower():
                continue
            oracle = "sql-oracle" if spec.oracle else "rows-only"
            print(f"{spec.name:40s} [{oracle}] {spec.section}")
        return 0

    if args.cmd == "verify":
        import tools.verify_local as V

        sys.argv = ["verify_local", args.sf_dir, *args.queries]
        return V.main()

    if args.cmd == "oracle":
        sql = registry.oracle_sql().get(args.query)
        if sql is None:
            print(f"no oracle for {args.query!r} (unknown or rows-only)", file=sys.stderr)
            return 1
        print(sql.strip())
        return 0

    fn = registry.queries().get(args.query)
    if fn is None:
        print(f"unknown query {args.query!r} — try `list`", file=sys.stderr)
        return 1

    from myserver_datawarehouse_spark.session import get_spark

    spark = get_spark(f"cli-{args.cmd}")
    spark.sparkContext.setLogLevel("ERROR")
    df = fn(spark, args.sf_dir)
    if args.cmd == "explain":
        df.explain("formatted")
        return 0
    if args.output:
        df.write.mode("overwrite").parquet(args.output)
        print(f"wrote {args.output}")
    else:
        df.show(args.limit, truncate=False)
    return 0


if __name__ == "__main__":
    sys.exit(main())
