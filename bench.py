"""Benchmark harness: run every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

The external driver records only the last 2000 chars of stdout, so a
full 106-query map (~4 KB) can never parse from its capture (BENCH_r02/
r03 both show parsed:null with the line's head truncated). The printed
line is therefore kept compact — total wall, per-family rollup, and the
slowest individual queries — and asserted < 1900 chars; the COMPLETE
per-query map goes to bench_full.json next to this script.

Each query is materialized through Spark's `noop` sink — full execution of
the plan (scan → shuffle → agg) with no driver-side collect bottleneck, so
the timing reflects what a cluster would do, not a toPandas() transfer.

Median-of-N protocol (round 5, per the round-4 advice): SCALE.md
documents ±0.5–1.5 s cross-run drift on unchanged plans, which drowned
round-over-round per-query diffs. Each query now runs
$SPARK_GRAFT_BENCH_REPS times (default 3) inside the ONE warm JVM; the
reported time is the median and bench_full.json carries every rep plus
the spread (max−min), so a diff bigger than the recorded spread is
signal, not noise. Eagerly-executing queries (streaming_upsert_merge,
orc_roundtrip_pricing) re-run their side effects every rep — their
medians stay honest end-to-end costs.
"""

from __future__ import annotations

import json
import os
import statistics
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


def build_line(
    timings: dict[str, float],
    families: dict[str, float],
    sf: float,
    reps: int = 1,
    spreads: dict[str, float] | None = None,
) -> str:
    """The ONE stdout line the driver records. Contract (tested in
    tests/test_plan_shapes.py): valid JSON, < 1900 chars — the driver
    keeps only the last 2000 chars of stdout, so a full per-query map
    can never parse from its capture; the 20 slowest + family rollup
    fit, and the complete map lives in bench_full.json."""
    total = round(sum(timings.values()), 3)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:20])
    payload = {
        "metric": "registry_total_wall",
        "value": total,
        "unit": "sec",
        "queries": slowest,  # 20 slowest medians; full map in per_query_file
        "families": families,
        "n_queries": len(timings),
        "reps": reps,
        "per_query_file": "bench_full.json",
        "sf": sf,
    }
    if spreads:
        # Aggregate noise disclosure; per-query spreads live in the file.
        payload["spread_median"] = round(
            statistics.median(spreads.values()), 3
        )
        payload["spread_max"] = round(max(spreads.values()), 3)
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) < 1900, f"bench line {len(line)} chars, driver tail is 2000"
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
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
    # Warm the window-exec + grouped-map paths too: whichever query happens
    # to sit at the registry head otherwise pays their first-use codegen /
    # worker-path cost (~1-2 s), which skews cross-round per-query
    # comparisons whenever the registry order rotates.
    warm = spark.range(1000).selectExpr("id % 7 AS k", "id AS v")
    warm.selectExpr(
        "k", "row_number() OVER (PARTITION BY k ORDER BY v) AS rn"
    ).write.format("noop").mode("overwrite").save()
    warm.groupBy("k").applyInPandas(
        lambda pdf: pdf, "k long, v long"
    ).write.format("noop").mode("overwrite").save()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    all_reps: dict[str, list[float]] = {}
    families: dict[str, float] = {}
    for spec in registry.specs():
        times: list[float] = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        med = round(statistics.median(times), 3)
        timings[spec.name] = med
        spreads[spec.name] = round(max(times) - min(times), 3)
        all_reps[spec.name] = times
        fam = spec.spark.__module__.rsplit(".", 1)[-1]
        families[fam] = round(families.get(fam, 0.0) + med, 3)

    total = round(sum(timings.values()), 3)
    sf = _sf_of(sf_dir)
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_full.json"
    )
    with open(full_path, "w") as fh:
        json.dump(
            {
                "metric": "registry_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,  # medians of `reps` warm-JVM runs
                "spreads": spreads,  # per-query max-min across reps
                "reps_detail": all_reps,
                "reps": reps,
                "families": families,
                "sf": sf,
            },
            fh,
        )
    line = build_line(timings, families, sf, reps=reps, spreads=spreads)
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
