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
round-over-round per-query diffs. Each query runs inside the ONE warm
JVM; the reported time is the median of the timed reps and
bench_full.json carries every rep plus the spread (max−min), so a diff
bigger than the recorded spread is signal, not noise. Eagerly-executing
queries (streaming_upsert_merge, orc_roundtrip_pricing) re-run their
side effects every rep — their medians stay honest end-to-end costs.

Warm-rep protocol (round 6): each query gets $SPARK_GRAFT_BENCH_WARM_REPS
(default 1) UNTIMED executions before its $SPARK_GRAFT_BENCH_REPS
(default 2) timed ones. The discard pre-pays the query's own
whole-stage-codegen compile — a first-run-only cost (~1–1.5 s for the
widest composed plans; measured on ranking_report, whose r5 reps were
[4.31, 4.05, 1.57] purely from compile + JIT warm-up) that a
steady-state deployment pays once per plan shape, not per execution.
No generic warm-up can pre-pay it because codegen is per-plan. Default
1 warm + 2 timed keeps total executions per query at 3, so bench wall
is unchanged vs the round-5 protocol while the medians now measure
steady state.

Adaptive reps (round 7, CENTRAL-GAP criterion since round 9): when the
median's central gap — for even n the distance between the two middle
reps, for odd n the median's distance to its nearest neighbor — exceeds
$SPARK_GRAFT_BENCH_SPREAD_RETRY (default 0.3 s), up to
$SPARK_GRAFT_BENCH_MAX_EXTRA (default 4) additional timed reps run.
The round-7 rule retried on max-min spread, which on a BIMODAL query
(host noise doubling some reps) could exhaust the budget on an even
rep count whose median straddles the two modes (star_join_revenue r8:
reps [3.64,1.48,1.16,4.15] → 2.56 s recorded for a ~1.3 s plan). If
the gap never closes, the LOWER central rep is reported and the query
is disclosed in the stdout line's `noisy` map (name → [min, max]):
the fast mode is the plan's cost, the slow mode is the host. Steady
queries still pay exactly 2 reps. A query whose central gap DOES close
but whose total rep RANGE still exceeds
$SPARK_GRAFT_BENCH_RANGE_DISCLOSE (default 1.0 s) also lands in
`noisy` (round-9 verdict #6: a trustworthy median does not excuse an
undisclosed 2.6 s min-max spread — the range is the host-bimodality
evidence a reader comparing rounds needs).

Sharding: `python bench.py --family plans_a,plans_b` (or
$SPARK_GRAFT_BENCH_FAMILY) restricts the run to the named query
families (the plan module basename, as recorded in the `families`
rollup) — so a slow family can be re-measured alone as the registry
grows, without paying a full-registry run.

Pinned execution order (round 13, per the round-12 verdict #2): the
registry's public order is staleness-sorted for the external
adjudication gate and therefore ROTATES every round — and twice in
round 12 that rotation alone produced multi-second phantom swings on
unchanged queries (JIT/codegen warmth follows run position; see
PARITY.md round-12 §order-artifacts). Bench now runs queries in
NAME-SORTED order, which is invariant under any registry re-sort, so
a per-query diff across rounds compares like-warmth positions.
`bench_order()` is the single source of that order and is pinned by
tests/test_plan_shapes.py (stable under a simulated registry re-sort).

Spread disclosure: in a full-registry run, the EAGERLY-executing
queries (the streaming drains, the round-trip writers, the composed
pipelines) occasionally absorb a neighbor's async cleanup (state-store
maintenance threads, shuffle/GC) into one rep — e.g.
corpus_build_pipeline measured reps [8.4, 3.2] mid-registry but
[~4.0 ± 0.4] when its family runs alone. A spread-flagged eager query
should be re-measured with --family before reading its median as a
regression.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _cpu_ticks() -> list[int]:
    """Aggregate /proc/stat cpu ticks (user nice system idle iowait irq
    softirq steal ...). Used to attribute per-rep wall time to host
    phases: this sandbox is a VM whose hypervisor STEALS cpu in bursts
    (measured 0-16% of a 32-core box for tens of seconds, with matching
    kernel-time spikes), which is the mechanism behind the 'hot host'
    bimodal reps every round since r12 disclosed as noise. Recording
    steal alongside each rep turns that from a guess into data."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()[1:]
        return [int(x) for x in parts]
    except (OSError, ValueError):
        return []


def _steal_pct(c0: list[int], c1: list[int]) -> float:
    """% of total cpu ticks stolen by the hypervisor between snapshots."""
    if not c0 or not c1 or len(c0) < 8 or len(c1) < 8:
        return -1.0
    d = [b - a for a, b in zip(c0, c1)]
    tot = sum(d)
    return round(100.0 * d[7] / tot, 2) if tot > 0 else -1.0

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from myserver_datawarehouse_spark import registry
from myserver_datawarehouse_spark.session import get_spark


def bench_order(specs) -> list:
    """The pinned bench execution order: name-sorted, independent of
    the registry's staleness rotation. Every query name is unique
    (asserted by the registry tests), so this order is a pure function
    of the registry's MEMBERSHIP — adding/removing a query shifts only
    its alphabetic neighbors' positions, and an adjudication-fold
    re-sort shifts nothing."""
    return sorted(specs, key=lambda s: s.name)


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
    warm_reps: int = 0,
    noisy: dict[str, list[float]] | None = None,
    steal_max: float | None = None,
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
        "warm_reps": warm_reps,
        "per_query_file": "bench_full.json",
        "sf": sf,
    }
    if spreads:
        # Aggregate noise disclosure; per-query spreads live in the file.
        payload["spread_median"] = round(
            statistics.median(spreads.values()), 3
        )
        payload["spread_max"] = round(max(spreads.values()), 3)
    if steal_max is not None and steal_max >= 0:
        # Worst hypervisor steal% seen over any timed rep — the host-
        # phase disclosure for the whole run (per-rep map in the file).
        payload["steal_pct_max"] = steal_max
    if noisy:
        # Queries whose central gap never closed: host-noise-bound, the
        # recorded time is the lower central rep (worst 5 by gap).
        # Cap raised 5 → 10 after the round-10 near-miss: 6 queries
        # exceeded the 1 s disclosure rule but the map only held 5
        # (streaming_session_windows escaped). Line-length budget is
        # checked by the assert below either way.
        payload["noisy"] = dict(
            sorted(noisy.items(), key=lambda kv: kv[1][1] - kv[1][0])[-10:]
        )
    line = json.dumps(payload, separators=(",", ":"))
    assert len(line) < 1900, f"bench line {len(line)} chars, driver tail is 2000"
    return line


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--family",
        default=os.environ.get("SPARK_GRAFT_BENCH_FAMILY", ""),
        help="comma-separated plan-module families to run (default all)",
    )
    args = ap.parse_args()
    wanted = {f.strip() for f in args.family.split(",") if f.strip()}

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

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))
    SPREAD_RETRY_SEC = float(
        os.environ.get("SPARK_GRAFT_BENCH_SPREAD_RETRY", "0.3")
    )
    MAX_EXTRA_REPS = int(os.environ.get("SPARK_GRAFT_BENCH_MAX_EXTRA", "4"))
    RANGE_DISCLOSE_SEC = float(
        os.environ.get("SPARK_GRAFT_BENCH_RANGE_DISCLOSE", "1.0")
    )
    warm_reps = max(
        0, int(os.environ.get("SPARK_GRAFT_BENCH_WARM_REPS", "1"))
    )
    timings: dict[str, float] = {}
    spreads: dict[str, float] = {}
    noisy: dict[str, list[float]] = {}
    all_reps: dict[str, list[float]] = {}
    all_steals: dict[str, list[float]] = {}
    families: dict[str, float] = {}
    specs = bench_order(registry.specs())
    if wanted:
        specs = [
            s for s in specs
            if s.spark.__module__.rsplit(".", 1)[-1] in wanted
        ]
        if not specs:
            raise SystemExit(f"no queries in families {sorted(wanted)}")
    for spec in specs:
        for _ in range(warm_reps):
            # Untimed: pre-pays this plan's codegen compile + JIT.
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        times: list[float] = []
        steals: list[float] = []
        for _ in range(reps):
            c0 = _cpu_ticks()
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
            steals.append(_steal_pct(c0, _cpu_ticks()))
        # Adaptive extra reps, CENTRAL-GAP criterion (round 9, per the
        # round-8 verdict #6): the round-7 rule retried on max-min
        # spread, which on a BIMODAL query (host noise doubling some
        # reps) kept adding reps until the budget ran out on an EVEN
        # count whose median is the mean of a fast and a slow rep —
        # star_join_revenue's r8 reps [3.64,1.48,1.16,4.15] recorded a
        # 2.56 s median for a ~1.3 s plan. The estimator is only
        # trustworthy when the median has a close NEIGHBOR, so the
        # retry criterion is the central gap: for even n the distance
        # between the two middle reps (the median is their mean); for
        # odd n the median's distance to its nearest neighbor. Reps
        # are added until the gap closes or the budget (default 4
        # extra) runs out; if it never closes, the LOWER central rep
        # is reported (the fast mode is the plan's true cost — the
        # slow mode is the host interloper) and the query lands in
        # the stdout line's `noisy` map with its min for disclosure.
        def central_gap(ts: list[float]) -> float:
            s = sorted(ts)
            n = len(s)
            if n < 2:
                return 0.0
            if n % 2 == 0:
                return s[n // 2] - s[n // 2 - 1]
            mid = n // 2
            return min(s[mid] - s[mid - 1], s[mid + 1] - s[mid])

        extra = 0
        while (
            len(times) > 1
            and central_gap(times) > SPREAD_RETRY_SEC
            and extra < MAX_EXTRA_REPS
        ):
            c0 = _cpu_ticks()
            t0 = time.perf_counter()
            spec.spark(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            times.append(round(time.perf_counter() - t0, 3))
            steals.append(_steal_pct(c0, _cpu_ticks()))
            extra += 1
        if central_gap(times) > SPREAD_RETRY_SEC:
            noisy[spec.name] = [round(min(times), 3), round(max(times), 3)]
            if len(times) % 2 == 0:
                ts = sorted(times)
                med = round(ts[len(ts) // 2 - 1], 3)  # lower central rep
            else:
                med = round(statistics.median(times), 3)
        else:
            med = round(statistics.median(times), 3)
            if max(times) - min(times) > RANGE_DISCLOSE_SEC:
                # Median converged, but the run saw a host phase wide
                # enough to matter cross-round: disclose the range.
                noisy[spec.name] = [
                    round(min(times), 3), round(max(times), 3)
                ]
        timings[spec.name] = med
        spreads[spec.name] = round(max(times) - min(times), 3)
        all_reps[spec.name] = times
        all_steals[spec.name] = steals
        fam = spec.spark.__module__.rsplit(".", 1)[-1]
        families[fam] = round(families.get(fam, 0.0) + med, 3)

    total = round(sum(timings.values()), 3)
    sf = _sf_of(sf_dir)
    # A family-sharded run writes a sibling artifact so it can never
    # clobber the committed full-registry bench_full.json that
    # bench_diff compares across rounds.
    artifact = (
        "bench_family_" + "_".join(sorted(wanted)) + ".json"
        if wanted
        else "bench_full.json"
    )
    full_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), artifact
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
                # hypervisor steal% per timed rep (aligned with
                # reps_detail): a slow rep with high steal is a host
                # phase, not a plan regression — r14 measured the
                # recurring 'hot host' tails at 6-16% steal while a
                # steady rep sits under 1%.
                "steal_pct_detail": all_steals,
                "reps": reps,
                "warm_reps": warm_reps,
                "families": families,
                "noisy": noisy,  # central gap never closed; med = lower central
                "sf": sf,
            },
            fh,
        )
    steal_vals = [s for ss in all_steals.values() for s in ss if s >= 0]
    line = build_line(
        timings, families, sf, reps=reps, spreads=spreads,
        warm_reps=warm_reps, noisy=noisy,
        steal_max=(round(max(steal_vals), 2) if steal_vals else None),
    )
    sys.stdout.flush()
    print(line, flush=True)


if __name__ == "__main__":
    main()
