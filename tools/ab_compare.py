#!/usr/bin/env python
"""Compare two interleaved A/B bench runs (old tree vs new tree, each
min over its runs) and print per-query deltas sorted by absolute
saving.  Usage: ab_compare.py old1.json new1.json [old2.json new2.json ...]
Odd positions = old-tree runs, even = new-tree runs."""
from __future__ import annotations

import json
import sys


def main() -> None:
    paths = sys.argv[1:]
    olds = [json.load(open(p))["queries"] for p in paths[0::2]]
    news = [json.load(open(p))["queries"] for p in paths[1::2]]
    # union keys across ALL runs (ADVICE r10): a query present only in
    # later runs would otherwise silently drop from the table and totals
    okeys = {k for d in olds for k in d}
    nkeys = {k for d in news for k in d}
    old = {k: min(d[k] for d in olds if k in d) for k in okeys}
    new = {k: min(d[k] for d in news if k in d) for k in nkeys}
    common = sorted(set(old) & set(new))
    rows = [(q, old[q], new[q], old[q] - new[q]) for q in common]
    rows.sort(key=lambda r: -abs(r[3]))
    to, tn = sum(old[q] for q in common), sum(new[q] for q in common)
    print(f"sum old={to:.1f}s new={tn:.1f}s delta={to - tn:+.1f}s "
          f"({(tn / to - 1) * 100:+.1f}%) over {len(common)} queries")
    print(f"{'query':28s} {'old':>7} {'new':>7} {'delta':>7}")
    for q, o, n, d in rows:
        if abs(d) >= 0.1:
            print(f"{q:28s} {o:7.2f} {n:7.2f} {d:+7.2f}")


if __name__ == "__main__":
    main()
