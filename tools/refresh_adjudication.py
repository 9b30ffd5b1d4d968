"""Round-boundary maintenance helper: derive the registry's adjudication
sets from the driver's CORRECTNESS_r*.json records.

Prints, for pasting into registry.py at the start of a new round:
  - one frozenset per round containing the queries whose MOST RECENT
    driver verdict (rows+schema+hash all true) came in that round,
  - the list of registry queries with no green verdict in any round
    (these stay out of every set and therefore sort to the head).

A query re-checked in a later round moves to that round's set
automatically (latest verdict wins), which is exactly the staleness
semantics `registry._staleness` wants. Run:
    python tools/refresh_adjudication.py
"""

from __future__ import annotations

import glob
import json
import re
import sys

sys.path.insert(0, "/root/repo")

from myserver_datawarehouse_spark import registry


def latest_green_round(pattern: str = "/root/repo/CORRECTNESS_r*.json") -> dict[str, int]:
    latest: dict[str, int] = {}
    # Sort by PARSED round number, not filename: lexicographic order
    # breaks on unpadded/three-digit rounds (r2 vs r10, r100 vs r02)
    # and could resurrect an invalidated verdict.
    paths = sorted(
        glob.glob(pattern),
        key=lambda p: int(re.search(r"_r(\d+)\.json$", p).group(1)),
    )
    for path in paths:
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            data = json.load(fh)
        for name, res in data.items():
            rows = res.get("rows_match")
            schema = res.get("schema_match")
            hashm = res.get("hash_match")
            # rows-only entries (no oracle) count as green on rows_match;
            # full entries need all three.
            green = bool(rows) and (
                (schema is None and hashm is None)
                or (bool(schema) and bool(hashm))
            )
            if green:
                latest[name] = rnd  # later files overwrite: latest wins
            elif name in latest and latest[name] < rnd:
                # a later FAIL invalidates the standing verdict
                del latest[name]
    return latest


def main() -> None:
    latest = latest_green_round()
    names = [s.name for s in registry.specs()]
    by_round: dict[int, list[str]] = {}
    never: list[str] = []
    for n in names:
        if n in latest:
            by_round.setdefault(latest[n], []).append(n)
        else:
            never.append(n)
    for rnd in sorted(by_round):
        print(f"_ADJUDICATED_R{rnd} = frozenset(")
        print("    {")
        for n in sorted(by_round[rnd]):
            print(f'        "{n}",')
        print("    }")
        print(")")
        print()
    print("# CAVEAT: a green verdict stands only while the query's OUTPUT")
    print("# is unchanged — if you changed semantics without renaming,")
    print("# remove that name from its set by hand (registry.py comment).")
    print(f"# never driver-adjudicated in current form ({len(never)}):")
    for n in never:
        print(f"#   {n}")


if __name__ == "__main__":
    main()
