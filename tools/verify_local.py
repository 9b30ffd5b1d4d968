"""Pre-flight differential harness: run every registry query on Spark AND
its oracle on DuckDB, compare row count / column names / values, mimicking
the driver's CORRECTNESS gate (order-insensitive, columns sorted by name).

Usage: python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys

import duckdb

sys.path.insert(0, "/root/repo")

from myserver_datawarehouse_spark import registry
from myserver_datawarehouse_spark.session import get_spark
from myserver_datawarehouse_spark.sources.tables import TESTDATA_TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "<NaN>"
        return repr(v)  # full precision — exact match required
    # pandas NaT / numpy nan objects (e.g. NULL timestamps through
    # toPandas) — normalize like SQL NULL so both engines agree.
    try:
        import pandas as pd

        if pd.isna(v):
            return "<NULL>"
    except (TypeError, ValueError):
        pass
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [cols[i] for i in order], out


def compare(name: str, spark_df, con, sql: str) -> list[str]:
    problems: list[str] = []
    pdf = spark_df.toPandas()
    s_cols = list(pdf.columns)
    s_rows = [tuple(r) for r in pdf.itertuples(index=False, name=None)]
    o = con.execute(sql)
    o_cols = [d[0] for d in o.description]
    o_rows = o.fetchall()

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    _, sn = norm_rows(s_cols, s_rows)
    _, on = norm_rows(o_cols, o_rows)
    mism = 0
    for a, b in zip(sn, on):
        if a != b:
            mism += 1
            if mism <= 3:
                problems.append(f"row diff:\n  spark : {a}\n  oracle: {b}")
    if mism:
        problems.append(f"total mismatched rows: {mism}/{len(sn)}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("verify-local")
    con = duck_connect(sf_dir)
    failed = []
    ran = 0
    for spec in registry.specs():
        if only and spec.name not in only:
            continue
        ran += 1
        try:
            df = spec.spark(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                print(f"[rows-only] {spec.name}: {n} rows")
                continue
            probs = compare(spec.name, df, con, spec.oracle)
        except Exception as e:  # noqa: BLE001
            probs = [f"EXCEPTION: {type(e).__name__}: {e}"]
        if probs:
            failed.append(spec.name)
            print(f"[FAIL] {spec.name} ({spec.section})")
            for p in probs:
                print(f"       {p}")
        else:
            print(f"[ ok ] {spec.name} ({spec.section})")
    print(f"\n{ran - len(failed)}/{ran} passing")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
