"""Entry-name glob matching for multi-entry queries.

Python port of the reference's matcher semantics (reference:
reductstore/src/storage/entry/pattern.rs:4-76 and the include/exclude
resolution of storage/bucket/query.rs:96-154):

* ``*`` matches within a path segment,
* a pattern without ``/`` ending in a single ``*`` is a raw prefix match
  (crosses segments: ``cam*`` matches ``cam1/front``),
* ``**`` matches zero or more whole segments,
* ``!pattern`` excludes,
* an exact name match always includes.

At scale, patterns are resolved against the (small) entry list — mirroring
the reference's entry registry — and become an ``isin`` filter that prunes
``entry`` partitions; records are never glob-matched row-by-row.
"""

from __future__ import annotations

import re as _re
from typing import Iterable, List, Sequence


def _segment_matches(entry_seg: str, pattern_seg: str) -> bool:
    if pattern_seg == "**":
        return True
    rest = entry_seg
    parts = pattern_seg.split("*")
    first = parts[0]
    if first:
        if not rest.startswith(first):
            return False
        rest = rest[len(first):]
    middle = [p for p in parts[1:] if p]
    for idx, part in enumerate(middle):
        last = idx == len(middle) - 1
        if last and not pattern_seg.endswith("*"):
            return rest.endswith(part)
        i = rest.find(part)
        if i < 0:
            return False
        rest = rest[i + len(part):]
    return pattern_seg.endswith("*") or rest == ""


def _matches_from(entry_parts: Sequence[str], pattern_parts: Sequence[str]) -> bool:
    if not pattern_parts:
        return not entry_parts
    head, tail = pattern_parts[0], pattern_parts[1:]
    if head == "**":
        if _matches_from(entry_parts, tail):
            return True
        return bool(entry_parts) and _matches_from(entry_parts[1:], pattern_parts)
    if not entry_parts:
        return False
    return _segment_matches(entry_parts[0], head) and _matches_from(entry_parts[1:], tail)


def entry_matches_pattern(entry: str, pattern: str) -> bool:
    pattern = pattern.lstrip("/")
    if "*" not in pattern:
        return entry == pattern
    if "/" not in pattern and pattern.endswith("*"):
        # pattern.rs strip_suffix('*') prefix rule applies to ANY no-slash
        # pattern ending in '*': interior '*' are literal ("a*b*" requires
        # the entry to literally start with "a*b")
        return entry.startswith(pattern[:-1])
    return _matches_from(entry.split("/"), pattern.split("/"))


def filter_entries(names: Iterable[str], patterns: Sequence[str] | None) -> List[str]:
    """Resolve include/exclude patterns against an entry list
    (bucket/query.rs:96-154). ``None`` or ``["*"]`` selects everything;
    hidden system entries (``$``-prefixed, e.g. ``x/$meta``) are only
    matched by exact name."""
    names = list(names)
    if patterns is None:
        return [n for n in names if _wildcard_queryable(n)]
    include = [p for p in patterns if not (p.startswith("!") and len(p) > 1)]
    exclude = [p[1:] for p in patterns if p.startswith("!") and len(p) > 1]
    out = []
    for name in names:
        if any(p == "*" for p in include) or not include:
            included = _wildcard_queryable(name)
        elif any(p == name for p in include):
            included = True
        else:
            included = any(entry_matches_pattern(name, p) for p in include) and \
                _wildcard_queryable(name)
        if included and not any(
            p == name or entry_matches_pattern(name, p) for p in exclude
        ):
            out.append(name)
    return out


def _wildcard_queryable(name: str) -> bool:
    """System entries like ``<entry>/$meta`` are hidden from wildcard
    queries (reference: storage/entry/system.rs:10-42)."""
    return not any(seg.startswith("$") for seg in name.split("/"))


# ---------------------------------------------------------------------------
# JVM predicate compilation — multi-entry queries resolve patterns without
# a driver round-trip (VERDICT r1 finding #2): the glob becomes a regex /
# equality filter on the ``entry`` column that Catalyst evaluates row-side
# (and prunes entry partitions with, on a partitioned store layout).
# ---------------------------------------------------------------------------

def pattern_to_regex(pattern: str) -> str:
    """Anchored-regex equivalent of ``entry_matches_pattern`` for one
    pattern.  Mirrors pattern.rs exactly: no-slash patterns ending in '*'
    are raw prefix matches; '*' matches within a segment; '**' matches
    zero or more whole segments."""
    pattern = pattern.lstrip("/")
    if "*" not in pattern:
        return _re.escape(pattern)
    if "/" not in pattern and pattern.endswith("*"):
        return _re.escape(pattern[:-1]) + ".*"
    regex = ""
    need_sep = False
    segs = pattern.split("/")
    for idx, seg in enumerate(segs):
        last = idx == len(segs) - 1
        if seg == "**":
            if last:
                if need_sep:
                    regex += "(?:/[^/]+)*"  # the slash lives inside the group
                else:
                    # at the start, or right after another '**' group
                    regex += "(?:[^/]+(?:/[^/]+)*)?"
                need_sep = False
            else:
                if need_sep:
                    regex += "/"
                regex += "(?:[^/]+/)*"  # each skipped segment brings its slash
                need_sep = False
        else:
            if need_sep:
                regex += "/"
            regex += "".join("[^/]*" if ch == "*" else _re.escape(ch)
                             for ch in seg)
            need_sep = True
    return regex


def patterns_to_column(patterns: Sequence[str], entry_col):
    """Boolean Column over ``entry_col`` equivalent to membership in
    ``filter_entries(all_names, patterns)`` — include/exclude resolution
    entirely JVM-side (bucket/query.rs:96-154 semantics)."""
    from pyspark.sql import functions as F

    hidden_ok = ~entry_col.rlike(r"(^|/)\$")
    if patterns is None:
        return hidden_ok
    include = [p for p in patterns if not (p.startswith("!") and len(p) > 1)]
    exclude = [p[1:] for p in patterns if p.startswith("!") and len(p) > 1]

    def one(p):
        if "*" not in p:
            return entry_col == p  # exact name matches even hidden entries
        rx = "^(?:" + pattern_to_regex(p) + ")$"
        return (entry_col == p) | (entry_col.rlike(rx) & hidden_ok)

    if any(p == "*" for p in include) or not include:
        inc = hidden_ok
    else:
        inc = F.lit(False)
        for p in include:
            inc = inc | one(p)
    exc = F.lit(False)
    for p in exclude:
        # exclusion: exact name or glob, hidden entries excludable too
        if "*" not in p:
            exc = exc | (entry_col == p)
        else:
            exc = exc | (entry_col == p) | entry_col.rlike(
                "^(?:" + pattern_to_regex(p) + ")$")
    return inc & ~exc
