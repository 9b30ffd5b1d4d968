"""Benchmark harness: run every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized through Spark's `noop` sink — full execution of
the plan (scan → shuffle → agg) with no driver-side collect bottleneck, so
the timing reflects what a cluster would do, not a toPandas() transfer.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from myserver_datawarehouse_spark import registry
from myserver_datawarehouse_spark.session import get_spark


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the session once (executor spin-up, first-job scheduling, noop
    # sink classloading) so the first measured query isn't charged ~5s of
    # fixed JVM startup that no steady-state deployment pays per query.
    # Per-plan codegen/compile stays inside each query's timing.
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    # Touch each table once (footer read + page-cache warm): steady-state
    # deployments read hot storage; whichever query happens to scan a table
    # first shouldn't be charged its cold first-touch.
    from myserver_datawarehouse_spark.sources.tables import (
        TESTDATA_TABLES,
        load_table,
    )

    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode(
            "overwrite"
        ).save()
    # Spin up the Python worker pool + Arrow serializers once (workers are
    # reused across jobs in steady state; first pandas-UDF query shouldn't
    # be charged daemon startup).
    spark.range(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}
    for spec in registry.specs():
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        timings[spec.name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "registry_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_of(sf_dir),
            }
        )
    )


if __name__ == "__main__":
    main()
