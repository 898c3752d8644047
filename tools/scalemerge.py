#!/usr/bin/env python3
"""Merge scale-probe subset runs into the committed BENCH_F30 / BENCH_F100
records (dev tooling only).

Inputs are BENCH_SUBSET_LOCAL.json-style dumps ({"sf":…, "queries":{…},
"stage":{…}}) copied aside from graft.Bench subset runs — two per scale
(min-of-2 protocol, memory: isolated runs need their own min, anchors are
NOT comparable across protocols).

  python3 tools/scalemerge.py --f30 r1.json r2.json --sf01 s1.json s2.json \
      [--f100 h1.json h2.json] [--note "..."]

Updates, in place:
  BENCH_F30.json  — per-query f30_sec (min-of-2), sf0.1_sec (min-of-2 from
                    the same-day sf0.1 subset runs), growth_x, exponent
                    (log(growth)/log(30)), stage tags.
  BENCH_F100.json — decade entries f30_sec → f100_sec with decade_exponent
                    log(f100/f30)/log(100/30) for queries present in both.
Existing rows for queries NOT in these runs are preserved.
"""
import json
import math
import sys

NOTE_KEY = "note_r16"  # bump per round — never silently clobber an older
                       # round's committed evidence note


def minof(runs, q):
    vals = [r["queries"][q] for r in runs if q in r.get("queries", {})]
    return round(min(vals), 3) if vals else None


def load(paths):
    return [json.load(open(p)) for p in paths]


def main():
    argv = sys.argv[1:]
    groups = {}
    note = None
    i = 0
    while i < len(argv):
        if argv[i] == "--note":
            note = argv[i + 1]
            i += 2
            continue
        assert argv[i].startswith("--"), argv[i]
        key = argv[i][2:]
        j = i + 1
        while j < len(argv) and not argv[j].startswith("--"):
            j += 1
        groups[key] = load(argv[i + 1:j])
        i = j

    f30runs = groups.get("f30", [])
    sf01runs = groups.get("sf01", [])
    f100runs = groups.get("f100", [])

    names = sorted({q for r in f30runs for q in r["queries"]})

    if f30runs:
        rec = json.load(open("BENCH_F30.json"))
        for q in names:
            t30 = minof(f30runs, q)
            t01 = minof(sf01runs, q)
            if t30 is None:
                continue
            rec["f30_sec"][q] = t30
            tag = next((r["stage"].get(q) for r in f30runs
                        if q in r.get("stage", {})), None)
            if tag is not None:
                rec.setdefault("stage", {})[q] = tag
            # `is not None`, not truthiness: a sub-millisecond run rounds to
            # a legitimate 0.0 that must still land in the record. Ratios
            # and logs need strictly positive operands on BOTH sides.
            if t01 is not None:
                rec["sf0.1_sec"][q] = t01
                if t01 > 0 and t30 > 0:
                    rec["growth_x"][q] = round(t30 / t01, 2)
                    rec["growth_exponent"][q] = round(
                        math.log(t30 / t01) / math.log(30), 2)
        if note:
            rec[NOTE_KEY] = note
        json.dump(rec, open("BENCH_F30.json", "w"), indent=1, sort_keys=True)
        print("BENCH_F30.json updated:", len(names), "queries")

    if f100runs:
        rec = json.load(open("BENCH_F100.json"))
        for q in sorted({q for r in f100runs for q in r["queries"]}):
            t100 = minof(f100runs, q)
            t30 = minof(f30runs, q)
            if t100 is None:
                continue
            entry = {"f100_sec": t100}
            if t30 is not None:
                entry["f30_sec"] = t30
                if t30 > 0 and t100 > 0:
                    entry["decade_exponent"] = round(
                        math.log(t100 / t30) / math.log(100 / 30), 2)
            rec["decade"][q] = entry
        if note:
            rec[NOTE_KEY] = note
        json.dump(rec, open("BENCH_F100.json", "w"), indent=1, sort_keys=True)
        print("BENCH_F100.json updated")


if __name__ == "__main__":
    main()
