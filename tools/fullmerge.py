#!/usr/bin/env python3
"""Merge full-fleet graft.Bench dumps into BENCH_FULL_LOCAL.json under the
min-of-2 protocol (dev tooling only).

Hazard this guards (round-13 verdict #5): in a FULL fleet run the untimed
stream warm-up builds the streaming-scaffold stages (stage:pq,
stage:doc_stream, stage:doc_evict, stage:emb_stream, stage:emb_evict)
before the timed stage walk, so their walk rows measure a warm re-read —
which must never overwrite a committed cold-build number. Since r14
graft.Bench tags every stage row ("cold"/"warm") and DROPS warm rows from
its own artifacts, so the guard here keys on those TAGS, not a wall-clock
threshold (r14 advice: a 0.05 s floor also rejected genuinely-fast cold
builds like stage:corpus_bands at 0.003 s, silently losing their rows).
A stage row absent from the fleet dumps is taken from the --stages runs
(isolated subset runs WITHOUT stream queries, where the walk builds those
stages cold); rows anchored in BASELINE_BENCH.json but absent from the
merged record are listed in note_stage_missing so evidence never vanishes
silently.

  python3 tools/fullmerge.py run1.json run2.json \
      [--stages iso1.json iso2.json] [--out BENCH_FULL_LOCAL.json] \
      [--baseline BASELINE_BENCH.json]
"""
import json
import os
import sys


def main():
    argv = sys.argv[1:]
    out = "BENCH_FULL_LOCAL.json"
    baseline_path = "BASELINE_BENCH.json"
    stage_paths = []
    if "--out" in argv:
        i = argv.index("--out")
        out = argv[i + 1]
        del argv[i:i + 2]
    if "--baseline" in argv:
        i = argv.index("--baseline")
        baseline_path = argv[i + 1]
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

    def tag_of(r, q):
        return r.get("stage", {}).get(q)

    def minof(rs, q):
        """(value, tag) of the minimum valid measurement of q in rs.

        Only STAGE rows reject warm-tagged measurements (a warm stage row
        is a re-read, not a build); a warm-tagged QUERY row is the normal
        protocol — the stage walk paid the build, the query row measures
        query cost — and must merge. A stage row with NO tag comes from a
        legacy (pre-r14) dump that can't distinguish warm from cold — fall
        back to the old 0.05 s wall-clock screen for those rows only, so an
        untagged warm ~0.0 s re-read can't overwrite a committed cold
        anchor (r15 advice)."""

        def ok(r, q):
            if not q.startswith("stage:"):
                return True
            t = tag_of(r, q)
            if t is None:
                return r["queries"][q] >= 0.05
            return t != "warm"

        vals = [(r["queries"][q], tag_of(r, q)) for r in rs
                if q in r.get("queries", {}) and ok(r, q)]
        if not vals:
            return None, None
        v, t = min(vals, key=lambda p: p[0])
        return round(v, 3), t

    names = sorted({q for r in runs for q in r["queries"]})
    merged_q, tags = {}, {}
    for q in names:
        t, tag = minof(runs, q)
        if t is None:
            continue
        merged_q[q] = t
        if tag:
            tags[q] = tag
    # stage rows the fleet warm-up always hides (Bench drops their warm
    # rows) merge from the isolated cold runs — tag taken from THAT run,
    # so the recorded tag always describes the measurement's protocol
    for q in sorted({q for r in iso for q in r.get("queries", {})}):
        if q.startswith("stage:") and q not in merged_q:
            t, tag = minof(iso, q)
            if t is not None:
                merged_q[q] = t
                tags[q] = tag or "cold"

    rec = {"sf": runs[0].get("sf"), "queries": merged_q}
    if tags:
        rec["stage"] = {q: tags[q] for q in sorted(tags) if q in merged_q}
    # evidence guard: every stage row the committed anchors know about must
    # either be in this record or be called out as missing
    if os.path.exists(baseline_path):
        anchors = json.load(open(baseline_path)).get("queries", {})
        missing = sorted(q for q in anchors
                         if q.startswith("stage:") and q not in merged_q)
        if missing:
            rec["note_stage_missing"] = (
                "baseline-anchored stage rows absent from this merge "
                "(no cold measurement in any supplied run): "
                + ",".join(missing))
            print("[fullmerge] WARNING anchored stage rows missing:",
                  ",".join(missing))
    json.dump(rec, open(out, "w"), indent=1, sort_keys=True)
    print(f"[fullmerge] {out}: {len(merged_q)} rows from {len(runs)} fleet "
          f"+ {len(iso)} isolated run(s)")


if __name__ == "__main__":
    main()
