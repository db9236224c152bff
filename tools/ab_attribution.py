"""Attribute per-query bench deltas between two trees timed on the SAME
machine, interleaved (r3 r4 r3 r4), vs the driver artifacts.

Usage: python tools/ab_attribution.py r3_1.json r4_1.json r3_2.json r4_2.json
Prints a markdown table: query | r3-today | r4-today | today-ratio |
driver-r3 | driver-r4 | driver-ratio, for every query whose driver ratio
was >= 1.3 — plus summary rows.  today-ratio ~1.0 with driver-ratio high
=> machine state; today-ratio high => code.
"""
from __future__ import annotations

import json
import sys


def load(p):
    return json.load(open(p))["queries"]


def main():
    r3a, r4a, r3b, r4b = (load(p) for p in sys.argv[1:5])
    r3 = {k: min(r3a[k], r3b.get(k, r3a[k])) for k in r3a}
    r4 = {k: min(r4a[k], r4b.get(k, r4a[k])) for k in r4a}

    # driver artifacts: parse the truncated tails
    def tail(path):
        t = json.load(open(path))["tail"]
        # tail is the end of a JSON line; recover the queries dict by
        # scanning "name": value pairs
        import re
        out = {}
        for m in re.finditer(r'"([a-z0-9_]+)": ([0-9.]+)', t):
            out[m.group(1)] = float(m.group(2))
        out.pop("sf", None)
        return out

    d3, d4 = tail("BENCH_r03.json"), tail("BENCH_r04.json")

    # truncation losses must be visible (round-5 advice): the recovery
    # regex silently drops entries cut mid-token or serialized in
    # scientific notation — report recovered-vs-expected and the names
    # missing from each driver tail so skewed sums can't pass unnoticed
    expected = set(r3) | set(r4)
    for label, d in (("driver-r3", d3), ("driver-r4", d4)):
        missing = sorted(expected - set(d))
        print(f"# {label}: recovered {len(d)}/{len(expected)} query "
              f"timings from the truncated tail"
              + (f"; missing: {', '.join(missing)}" if missing else ""))

    common = sorted(set(r3) & set(r4) & set(d3) & set(d4))
    rows = []
    for q in common:
        dr = d4[q] / d3[q] if d3[q] else float("inf")
        tr = r4[q] / r3[q] if r3[q] else float("inf")
        rows.append((q, r3[q], r4[q], tr, d3[q], d4[q], dr))

    flagged = [r for r in rows if r[6] >= 1.3]
    flagged.sort(key=lambda r: -r[6])
    print("| query | r3 today | r4 today | today x | r3 driver |"
          " r4 driver | driver x | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for q, a, b, tr, c, d, dr in flagged:
        verdict = ("machine-state" if tr <= 1.2 else
                   "code" if tr >= 1.3 else "mixed")
        print(f"| {q} | {a:.2f} | {b:.2f} | {tr:.2f} | {c:.2f} | {d:.2f} |"
              f" {dr:.2f} | {verdict} |")
    s3t = sum(r3[q] for q in common)
    s4t = sum(r4[q] for q in common)
    s3d = sum(d3[q] for q in common)
    s4d = sum(d4[q] for q in common)
    print(f"\nSum over {len(common)} common queries: today r3={s3t:.1f}s "
          f"r4={s4t:.1f}s (x{s4t / s3t:.2f}); driver r3={s3d:.1f}s "
          f"r4={s4d:.1f}s (x{s4d / s3d:.2f})")


if __name__ == "__main__":
    main()
