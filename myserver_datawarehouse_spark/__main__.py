"""Command-line entry point: the operational surface the reference
exposes through Airflow task invocations, re-expressed as a CLI.

    python -m myserver_datawarehouse_spark list [--section SUBSTR]
    python -m myserver_datawarehouse_spark run QUERY [--sf-dir DIR]
        [--limit N] [--output PATH]
    python -m myserver_datawarehouse_spark explain QUERY [--sf-dir DIR]
    python -m myserver_datawarehouse_spark oracle QUERY
    python -m myserver_datawarehouse_spark table \
        {versions|compact|vacuum|travel|stats} PATH [--version vN]
        [--column COL]

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

    tb = sub.add_parser(
        "table",
        help="maintain a WAP-committed path table "
        "(versions / compact / vacuum / travel / stats / delete / "
        "evolve / bloom / prune)",
    )
    tb.add_argument(
        "action",
        choices=(
            "versions", "compact", "vacuum", "travel", "stats",
            "delete", "evolve", "bloom", "prune"
        ),
    )
    tb.add_argument("path", help="table path (or versions root for WAP "
                                 "manifest tables)")
    tb.add_argument("--version", default=None,
                    help="version name for `travel` (e.g. v1)")
    tb.add_argument("--column", default=None,
                    help="column for `stats` (per-file zone map) / "
                         "`bloom` / `prune`")
    tb.add_argument("--probe-keys", default=None,
                    help="comma-separated keys for `prune` (bloom "
                         "point-lookup candidates)")
    tb.add_argument("--where", default=None,
                    help="SQL predicate for `delete` (merge-on-read)")
    tb.add_argument("--keys", default=None,
                    help="comma-separated key columns for `delete`")
    tb.add_argument("--partition-by", default=None,
                    help="comma-separated partition columns for `evolve`")
    tb.add_argument("--limit", type=int, default=20)
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

    if args.cmd == "table":
        from myserver_datawarehouse_spark.operators import merge as M

        # A plain path table keeps its versions in the hidden sibling
        # root; a publish_overwrite table IS its versions root. Accept
        # either: prefer the sibling root when it exists.
        vroot = M._versions_root(args.path)
        root = vroot if os.path.isdir(vroot) else args.path
        if args.action == "versions":
            versions, current = M.published_versions(root)
            for v in versions:
                mark = " *current" if v == current else ""
                print(f"{v}{mark}")
            return 0
        if args.action == "vacuum":
            removed = M.vacuum_versions(root)
            print(f"removed {removed}" if removed else "nothing to vacuum")
            return 0
        from myserver_datawarehouse_spark.session import get_spark as _gs

        spark = _gs("cli-table")
        spark.sparkContext.setLogLevel("ERROR")
        if args.action == "compact":
            before = M.data_file_count(args.path)
            M.compact_table(spark, args.path)
            print(f"compacted: {before} -> {M.data_file_count(args.path)} "
                  "data files")
            return 0
        if args.action == "bloom":
            if not args.column:
                print("bloom needs --column", file=sys.stderr)
                return 1
            from myserver_datawarehouse_spark.sources.files import (
                write_bloom_sidecar,
            )

            cur = M._published_version(root)
            snap = os.path.join(root, cur) if cur else args.path
            if os.path.isfile(os.path.join(snap, "_SPECS.json")):
                # write_bloom_sidecar's plain parquet scan cannot see
                # data under the underscore-hidden _layout-* subtrees
                # and would die with an opaque schema-inference error.
                print(
                    f"{snap} is an evolved multi-layout snapshot; run "
                    "'table compact' (compact_evolved) first — evolved "
                    "merges/appends then maintain the rebuilt sidecar "
                    "incrementally",
                    file=sys.stderr,
                )
                return 1
            sidecar = write_bloom_sidecar(spark, snap, args.column)
            print(f"wrote {sidecar} (per-file point-lookup blooms; "
                  "merges carry it incrementally, compaction rebuilds "
                  "it)")
            return 0
        if args.action == "prune":
            if not args.column or not args.probe_keys:
                print("prune needs --column and --probe-keys",
                      file=sys.stderr)
                return 1
            from myserver_datawarehouse_spark.sources.files import (
                bloom_prune_files,
            )

            cur = M._published_version(root)
            snap = os.path.join(root, cur) if cur else args.path
            # keys pass as strings; bloom_prune_files casts them to the
            # column type recorded in the sidecar meta (and raises on a
            # key that does not fit — never a silent NULL hash).
            keys = [k.strip() for k in args.probe_keys.split(",")]
            keep, total = bloom_prune_files(spark, snap, args.column, keys)
            print(f"{len(keep)}/{total} candidate files")
            for pth in keep[: args.limit]:
                print(f"  {pth}")
            return 0
        if args.action == "stats":
            if not args.column:
                print("stats needs --column", file=sys.stderr)
                return 1
            from myserver_datawarehouse_spark.sources.files import file_stats

            file_stats(spark, args.path, args.column).show(
                args.limit, truncate=False
            )
            return 0
        if args.action == "evolve":
            if not getattr(args, "partition_by", None):
                print("evolve needs --partition-by", file=sys.stderr)
                return 1
            from myserver_datawarehouse_spark.operators import (
                evolution as EV,
            )

            version = EV.evolve_partition_spec(
                spark, root,
                [c.strip() for c in args.partition_by.split(",")],
            )
            print(f"published {version} (partition-spec evolution; zero "
                  "data bytes written — new writes follow the new spec, "
                  "`compact` folds old layouts in)")
            return 0
        if args.action == "delete":
            if not args.where or not args.keys:
                print("delete needs --where and --keys", file=sys.stderr)
                return 1
            from pyspark.sql import functions as F

            version = M.delete_where(
                spark, root, F.expr(args.where),
                keys=[k.strip() for k in args.keys.split(",")],
            )
            print(f"published {version} (merge-on-read; no data files "
                  "rewritten — `compact` folds the deletes in)")
            return 0
        if not args.version:
            print("travel needs --version", file=sys.stderr)
            return 1
        M.read_version(spark, root, args.version).show(
            args.limit, truncate=False
        )
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
