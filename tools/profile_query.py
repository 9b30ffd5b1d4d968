"""Per-query profiler for the optimization rounds: run named registry
queries through the bench's noop-sink protocol and report, for each,

  - wall seconds (median of reps, after a warm rep),
  - Spark job count / stage count / task count / summed task time
    (from the status tracker, scoped by job group),
  - Exchange / BroadcastExchange / *EvalPython node counts and the join
    strategies in the FINAL executed plan (via explain after AQE),

so an optimization can be judged by plan shape + scheduler load, not
wall-clock alone (guide §1: measure first; §7.2: read the plan).

Usage: python tools/profile_query.py [--sf DIR] [--reps N] query ...
       python tools/profile_query.py --family llm_text
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from myserver_datawarehouse_spark import registry
from myserver_datawarehouse_spark.session import get_spark
from bench import _cpu_ticks, _steal_pct


def plan_counts(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    txt = buf.getvalue()
    counts = {
        "exchange": len(re.findall(r"\bExchange\b", txt))
        - len(re.findall(r"BroadcastExchange", txt)),
        "broadcast_exchange": len(re.findall(r"BroadcastExchange", txt)),
        "smj": len(re.findall(r"SortMergeJoin", txt)),
        "bhj": len(re.findall(r"BroadcastHashJoin", txt)),
        "shj": len(re.findall(r"ShuffledHashJoin", txt)),
        "bnlj": len(re.findall(r"BroadcastNestedLoopJoin", txt)),
        "python": len(re.findall(r"EvalPython|MapInPandas|MapInArrow|FlatMapGroupsInPandas", txt)),
        "sort": len(re.findall(r"\bSort\b", txt)),
        "window": len(re.findall(r"\bWindow\b", txt)),
    }
    return counts


def profile_one(spark, spec, sf_dir: str, reps: int, warm: int) -> dict:
    sc = spark.sparkContext
    for _ in range(warm):
        spec.spark(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    group = f"profile_{spec.name}"
    times = []
    steals = []
    sc.setJobGroup(group, spec.name)
    t_jobs0 = set(sc.statusTracker().getJobIdsForGroup(group))
    for _ in range(reps):
        c0 = _cpu_ticks()
        t0 = time.perf_counter()
        df = spec.spark(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        times.append(time.perf_counter() - t0)
        steals.append(_steal_pct(c0, _cpu_ticks()))
    tracker = sc.statusTracker()
    job_ids = [
        j for j in tracker.getJobIdsForGroup(group) if j not in t_jobs0
    ]
    n_stages = 0
    n_tasks = 0
    for j in job_ids:
        ji = tracker.getJobInfo(j)
        if ji is None:
            continue
        for st in ji.stageIds:
            si = tracker.getStageInfo(st)
            if si is not None:
                n_stages += 1
                n_tasks += si.numTasks
    sc.setJobGroup(None, None)
    # plan shape of the (lazily rebuilt) frame
    try:
        counts = plan_counts(spec.spark(spark, sf_dir))
    except Exception as e:  # eager queries may not re-explain cheaply
        counts = {"err": str(e)[:80]}
    times.sort()
    med = times[len(times) // 2] if len(times) % 2 else (
        times[len(times) // 2 - 1]
    )
    return {
        "name": spec.name,
        "wall_med": round(med, 3),
        "reps": [round(t, 3) for t in times],
        "jobs_per_rep": round(len(job_ids) / max(1, reps), 1),
        "stages_per_rep": round(n_stages / max(1, reps), 1),
        "tasks_per_rep": round(n_tasks / max(1, reps), 1),
        # hypervisor steal% per rep: >2-3% means the rep is a host
        # phase, not the plan (see bench.py:_cpu_ticks).
        "steal_pct": steals,
        **counts,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--warm", type=int, default=1)
    ap.add_argument("--family", default="")
    args = ap.parse_args()

    spark = get_spark(
        "profile", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same session warm-up as bench.py so first query is not charged
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    from myserver_datawarehouse_spark.sources.tables import (
        TESTDATA_TABLES,
        load_table,
    )

    for t in TESTDATA_TABLES:
        load_table(spark, args.sf, t).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.range(32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    specs = registry.specs()
    if args.family:
        fams = {f.strip() for f in args.family.split(",")}
        specs = [
            s for s in specs
            if s.spark.__module__.rsplit(".", 1)[-1] in fams
        ]
    if args.queries:
        by_name = {s.name: s for s in specs}
        specs = [by_name[q] for q in args.queries]
    specs = sorted(specs, key=lambda s: s.name)

    out = []
    for spec in specs:
        r = profile_one(spark, spec, args.sf, args.reps, args.warm)
        out.append(r)
        print(json.dumps(r), flush=True)
    out.sort(key=lambda r: -r["wall_med"])
    print("\n== slowest ==")
    for r in out[:15]:
        print(
            f"{r['wall_med']:7.2f}s  jobs={r.get('jobs_per_rep')} "
            f"stages={r.get('stages_per_rep')} tasks={r.get('tasks_per_rep')} "
            f"ex={r.get('exchange')} bx={r.get('broadcast_exchange')} "
            f"py={r.get('python')}  {r['name']}"
        )


if __name__ == "__main__":
    main()
