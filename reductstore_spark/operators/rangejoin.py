"""Banded range join: time-interval pairing without a cross join.

Spark has no native range/interval join (DuckDB and kdb+ do); writing the
naive ``lower <= r.ts - l.ts < upper`` as a join condition plans as a
BroadcastNestedLoopJoin / per-key cartesian — O(|L|x|R|) and hopeless at
100 TB.  The standard scale shape is *band bucketing*: quantize time into
buckets exactly as wide as the interval, equi-join on (keys, bucket), and
refine with the exact predicate afterwards.  Each left row covers at most
two buckets, so the join expands the left side by <= 2x and stays an
ordinary shuffled (or AQE-broadcast) hash join.

Reference has no join surface at all (SURVEY.md §2.D); this is part of the
"standard analytics over the same data model" scope the driver's north
star adds on top.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fdiv(col, width: int):
    """Exact floor division of a long column by a positive int literal.

    (col - pmod(col, w)) is divisible by w, so the double division is
    exact for any |quotient| < 2^53 — unlike floor(col / w), whose double
    quotient can round across a bucket boundary at large magnitudes.
    """
    w = F.lit(width)
    return ((col - F.pmod(col, w)) / w).cast("long")


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: Sequence[str],
    left_on: str = "ts",
    right_on: str = "ts",
    lower: int = 0,
    upper: int = 1,
    suffix: str = "_r",
) -> DataFrame:
    """Pairs (l, r) with equal ``by`` keys and
    ``lower <= r[right_on] - l[left_on] < upper`` (integer units, µs by
    convention).  ``upper`` must exceed ``lower``.

    Right-side non-key columns are suffixed to avoid collisions; the
    output carries every left column plus the suffixed right columns.
    """
    if upper <= lower:
        raise ValueError("range_join requires lower < upper")
    width = upper - lower
    by = list(by)

    rmap = {c: (c if c in by else c + suffix) for c in right.columns}
    r = right.select([F.col(c).alias(a) for c, a in rmap.items()])
    r_on = rmap[right_on]

    # left row l matches right ts in [l+lower, l+upper): that span covers
    # buckets fdiv(l+lower) .. fdiv(l+upper-1) — at most two of width W
    lo_b = _fdiv(F.col(left_on) + F.lit(lower), width)
    hi_b = _fdiv(F.col(left_on) + F.lit(upper - 1), width)
    l = left.withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b)))
    r = r.withColumn("__bucket", _fdiv(F.col(r_on), width))

    delta = F.col(r_on) - F.col(left_on)
    return (
        l.join(r, by + ["__bucket"])
        .where((delta >= F.lit(lower)) & (delta < F.lit(upper)))
        .drop("__bucket")
    )
