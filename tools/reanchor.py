#!/usr/bin/env python3
"""Rebuild BASELINE_BENCH.json anchors from fleet-protocol evidence.

Anchors exist to make the driver's per-round regression gate
(judged > anchor*1.25 AND judged > anchor+0.5s) fire on REAL regressions
only. Isolated min-of-2 dev runs systematically undershoot the driver's
fleet steady-state by ~1.5-2x on sub-second queries (JVM/fleet residue),
which generated phantom flags every round. Policy (round 7):

  anchor[q] = max(driver_fleet[q], min(local_run1[q], local_run2[q]))

i.e. the driver's own last full-precision fleet value for that query,
floored up by the local min-of-2 when the local machine is slower that
day; queries whose implementation changed since the driver run take the
local min-of-2 alone (the driver value measured the old code).

Usage: reanchor.py <driver_fleet.json> <run1.json> <run2.json>
           [--changed q1,q2,...] [--round rN]
Writes BASELINE_BENCH.json in place.
"""
import json
import sys


def main():
    argv = sys.argv[1:]
    changed = set()
    rnd = "r7"
    if "--changed" in argv:
        i = argv.index("--changed")
        changed = set(argv[i + 1].split(","))
        del argv[i:i + 2]
    if "--round" in argv:
        i = argv.index("--round")
        rnd = argv[i + 1]
        del argv[i:i + 2]
    driver = json.load(open(argv[0]))["queries"]
    r1full = json.load(open(argv[1]))
    r2full = json.load(open(argv[2]))
    run1, run2 = r1full["queries"], r2full["queries"]
    stage1 = r1full.get("stage", {})
    stage2 = r2full.get("stage", {})
    old = json.load(open("BASELINE_BENCH.json"))

    names = sorted(set(run1) | set(run2))
    queries, stage = {}, {}
    for q in names:
        local = min(run1.get(q, 1e9), run2.get(q, 1e9))
        if q in changed or q not in driver:
            queries[q] = round(local, 6)
        else:
            queries[q] = round(max(driver[q], local), 6)
        # stage protocol tag of the anchored value, so the gate can compare
        # cold-vs-cold / warm-vs-warm (a stage-cold anchor must not gate a
        # stage-warm judged run and vice versa). Runs are protocol-
        # consistent (stages wiped at start), so the tags should agree;
        # record 'cold' if either run paid the build inside this query.
        tags = {t for t in (stage1.get(q), stage2.get(q)) if t}
        if tags:
            stage[q] = "cold" if "cold" in tags else "warm"

    out = {
        "round": rnd,
        "sf": old.get("sf", 0.1),
        "cpus": old.get("cpus", 32),
        "note": ("per-query seconds at fleet steady-state: max(driver's "
                 "last full-precision fleet dump, min of 2 consecutive "
                 "clean local[32] full-fleet runs); queries changed since "
                 "the driver run use the local min-of-2 alone. "
                 f"Changed this round: {sorted(changed)}"),
        "queries": queries,
        "stage": stage,
    }
    json.dump(out, open("BASELINE_BENCH.json", "w"), indent=1, sort_keys=True)
    drops = [(q, old["queries"][q], queries[q]) for q in queries
             if q in old["queries"]]
    up = sum(1 for _, a, b in drops if b > a)
    down = sum(1 for _, a, b in drops if b < a)
    print(f"anchors: {len(queries)} total, {up} raised, {down} lowered, "
          f"sum {sum(old['queries'].values()):.1f} -> "
          f"{sum(queries.values()):.1f}s")


if __name__ == "__main__":
    main()
