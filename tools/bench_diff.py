"""Round-over-round bench comparison with spread awareness.

Compares two bench_full.json files (the per-query artifact bench.py
writes) and reports only the differences that are SIGNAL: a query whose
|delta| exceeds the larger of the two runs' recorded rep spreads plus a
floor. Everything inside spread is cross-run noise by the repo's own
measurement discipline (SCALE.md §0) and is summarized, not listed.

Usage: python tools/bench_diff.py OLD.json NEW.json [--floor 0.3]
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--floor",
        type=float,
        default=0.3,
        help="minimum |delta| (s) to ever report, on top of spreads",
    )
    args = ap.parse_args()

    with open(args.old) as f:
        old = json.load(f)
    with open(args.new) as f:
        new = json.load(f)

    for field in ("sf", "reps", "warm_reps"):
        if old.get(field) != new.get(field):
            print(
                f"warning: artifacts differ on {field!r} "
                f"({old.get(field)} vs {new.get(field)}) — per-query "
                "deltas are NOT comparable (measurement discipline: "
                "only back-to-back same-protocol pairs are signal)"
            )

    qo, qn = old["queries"], new["queries"]
    so, sn = old.get("spreads", {}), new.get("spreads", {})

    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    common = sorted(set(qo) & set(qn))

    signal = []
    noise = 0
    for q in common:
        delta = qn[q] - qo[q]
        tol = max(so.get(q, 0.0), sn.get(q, 0.0), args.floor)
        if abs(delta) > tol:
            signal.append((delta, q, qo[q], qn[q], tol))
        else:
            noise += 1
    signal.sort(key=lambda t: -abs(t[0]))

    to = sum(qo[q] for q in common)
    tn = sum(qn[q] for q in common)
    print(
        f"common {len(common)} queries: {to:.1f}s -> {tn:.1f}s "
        f"({tn - to:+.1f}s); {noise} within spread (not listed)"
    )
    if added:
        t = sum(qn[q] for q in added)
        print(f"added {len(added)} ({t:.1f}s): {', '.join(added)}")
    if removed:
        print(f"removed {len(removed)}: {', '.join(removed)}")
    for delta, q, a, b, tol in signal:
        print(f"  {delta:+6.2f}s  {q:45} {a:6.2f} -> {b:6.2f} (tol {tol:.2f})")
    return 0


if __name__ == "__main__":
    try:
        code = main()
    except BrokenPipeError:  # e.g. piped into head
        import os
        import sys

        # Point stdout at devnull so the interpreter-shutdown flush of
        # the broken pipe can't raise again (noise + exit 120).
        os.dup2(os.open(os.devnull, os.O_WRONLY), sys.stdout.fileno())
        code = 0
    raise SystemExit(code)
