#!/usr/bin/env python3
"""Merge full-fleet graft.Bench dumps into BENCH_FULL_LOCAL.json under the
min-of-2 protocol, with the 0.0-stage guard the subset protocol already has
(dev tooling only).

Hazard this guards (round-13 verdict #5): in a FULL fleet run the untimed
stream warm-up builds the streaming-scaffold stages (stage:pq,
stage:doc_stream, stage:doc_evict, stage:emb_stream, stage:emb_evict)
before the timed stage walk, so their walk rows measure a warm re-read and
round to 0.0 — which then OVERWRITES a committed cold-build number if
merged blindly. Here any row whose min lands at/below the guard threshold
is taken from the --stages runs (isolated subset runs WITHOUT stream
queries, where the walk builds those stages cold) when present, and
otherwise dropped with a warning — a 0.0 never replaces a real cold row.

  python3 tools/fullmerge.py run1.json run2.json \
      [--stages iso1.json iso2.json] [--out BENCH_FULL_LOCAL.json]
"""
import json
import sys

GUARD_SEC = 0.05  # below this a "build" row is a warm re-read, not a build


def main():
    argv = sys.argv[1:]
    out = "BENCH_FULL_LOCAL.json"
    stage_paths = []
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        del argv[i:i + 2]
    if "--stages" in argv:
        i = argv.index("--stages")
        j = i + 1
        while j < len(argv) and not argv[j].startswith("--"):
            j += 1
        stage_paths = argv[i + 1:j]
        del argv[i:j]
    runs = [json.load(open(p)) for p in argv]
    iso = [json.load(open(p)) for p in stage_paths]
    assert runs, "need at least one full-fleet run dump"

    def minof(rs, q):
        vals = [r["queries"][q] for r in rs if q in r.get("queries", {})]
        return round(min(vals), 3) if vals else None

    names = sorted({q for r in runs for q in r["queries"]})
    merged_q, dropped = {}, []
    for q in names:
        t = minof(runs, q)
        if q.startswith("stage:") and t is not None and t <= GUARD_SEC:
            t_iso = minof(iso, q)
            if t_iso is not None and t_iso > GUARD_SEC:
                t = t_iso
            else:
                dropped.append(q)
                continue
        merged_q[q] = t
    # isolated-run stage rows not present in the fleet dumps still merge
    # (a stage the fleet warm-up always hides can only be measured there)
    for q in sorted({q for r in iso for q in r["queries"]}):
        if q.startswith("stage:") and q not in merged_q:
            t_iso = minof(iso, q)
            if t_iso is not None and t_iso > GUARD_SEC:
                merged_q[q] = t_iso

    rec = {"sf": runs[0].get("sf"), "queries": merged_q}
    tags = {}
    for r in runs + iso:
        tags.update(r.get("stage", {}))
    if tags:
        rec["stage"] = {q: tags[q] for q in sorted(tags) if q in merged_q}
    if dropped:
        rec["note_stage_guard"] = (
            "warm-up-built stage rows dropped (no isolated cold run "
            "supplied): " + ",".join(dropped))
        print("[fullmerge] WARNING dropped warm 0.0 stage rows:",
              ",".join(dropped))
    json.dump(rec, open(out, "w"), indent=1, sort_keys=True)
    print(f"[fullmerge] {out}: {len(merged_q)} rows from {len(runs)} fleet "
          f"+ {len(iso)} isolated run(s)")


if __name__ == "__main__":
    main()
