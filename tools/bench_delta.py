#!/usr/bin/env python3
"""Round-over-round bench comparison on ANCHOR-NORMALIZED numbers.

Usage: tools/bench_delta.py OLD_bench.json NEW_bench.json [threshold]

Reads two bench_full.json files and prints per-query deltas computed on
`queries_normalized` (raw / (anchor_measured / anchor_ref)) when both
files carry it, falling back to raw `queries` otherwise — with the raw
numbers printed alongside so nothing is hidden. Queries whose
normalized ratio exceeds `threshold` (default 1.25, the r15 verdict's
attribution floor) are listed; everything else is summarized.

The point (round-15 verdict item 4): the anchor job is identical work
every round, so dividing by the anchor ratio removes box contention —
r15's own anchor moved 0.521 -> 0.667 s same-day, which made every
sub-1.3x raw delta unattributable by eye.
"""
import json
import sys


def load(path):
    with open(path) as f:
        d = json.loads(f.read().strip().splitlines()[-1])
    return d


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        sys.exit(2)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    key = ("queries_normalized"
           if "queries_normalized" in old and "queries_normalized" in new
           else "queries")
    print(f"comparing on: {key}")
    for tag, d in (("old", old), ("new", new)):
        env = d.get("env", {})
        print(f"  {tag}: total={d.get('value')} s  anchor="
              f"{env.get('anchor_cpu_shuffle_sec')} s  load={env.get('load_avg_1m')}")
    qo, qn = old[key], new[key]
    ro, rn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    flagged, ok = [], 0
    for q in shared:
        a, b = qo[q], qn[q]
        if a <= 0 or b <= 0:  # -1 = failed run; surface it
            flagged.append((q, a, b, float("inf")))
            continue
        ratio = b / a
        if ratio > thresh or ratio < 1 / thresh:
            flagged.append((q, a, b, ratio))
        else:
            ok += 1
    print(f"{ok}/{len(shared)} shared queries within {thresh}x (normalized)")
    only_old = sorted(set(qo) - set(qn))
    only_new = sorted(set(qn) - set(qo))
    if only_new:
        print(f"new queries: {', '.join(only_new)}")
    if only_old:
        print(f"removed queries: {', '.join(only_old)}")
    for q, a, b, r in sorted(flagged, key=lambda t: -t[3]):
        raw = f" (raw {ro.get(q, '?')} -> {rn.get(q, '?')})"
        print(f"  {q:34s} norm {a:7.3f} -> {b:7.3f}  x{r:5.2f}{raw}")


if __name__ == "__main__":
    main()
