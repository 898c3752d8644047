#!/usr/bin/env python3
"""Rebuild BASELINE_BENCH.json from two [bench-full] stderr dumps (min-of-2).

Usage: reanchor.py run1.txt run2.txt
Each input holds a line containing `[bench-full] {"name":secs,...}`.
"""
import json, re, sys

def parse(path):
    with open(path) as f:
        txt = f.read()
    m = re.search(r"\[bench-full\] (\{.*?\})", txt)
    if not m:
        raise SystemExit(f"no [bench-full] line in {path}")
    return json.loads(m.group(1))

a, b = parse(sys.argv[1]), parse(sys.argv[2])
if set(a) != set(b):
    print(f"WARN: query sets differ: {set(a) ^ set(b)}", file=sys.stderr)
queries = {k: round(min(a[k], b.get(k, a[k])), 6) for k in sorted(a)}
out = {
    "round": "r5",
    "sf": 0.1,
    "cpus": 32,
    "note": ("per-query seconds, min of 2 consecutive clean local[32] runs at "
             "sf0.1 (each run itself retries regressed queries up to 2x and "
             "reports the min); dd_dup_clusters/dd_survivors share a staged "
             "clustering - run 1 stages cold, run 2 reuses, so their anchor "
             "is the warm path"),
    "queries": queries,
}
with open("BASELINE_BENCH.json", "w") as f:
    json.dump(out, f, indent=1)
print(f"anchored {len(queries)} queries")
