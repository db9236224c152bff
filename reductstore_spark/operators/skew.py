"""Skew mitigation: salted equi-joins for hot keys.

AQE's skew-join handles sort-merge skew by splitting oversized
partitions at runtime, and broadcasting removes the shuffle entirely
when one side is small — prefer both.  The remaining case is a
fact-fact join where one side has a handful of pathologically hot keys
(a boilerplate shingle, a null-ish default id): every row of a hot key
lands in one task.  Salting fixes the shape statically: the skewed side
gets a uniform salt in [0, n), the other side is replicated n times,
and the join key becomes (key, salt) — each hot key now spreads over n
tasks at the cost of replicating the (smaller) right side n times.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on`` with an n-way salt.

    ``skewed`` rows get ``pmod(hash(whole row), salt)`` — deterministic,
    uniform, no RNG (reproducible across retries, which a `rand()` salt
    is not: a recomputed task would re-salt differently and double-count
    rows under speculative execution).  ``other`` is replicated
    ``salt``x via an exploded literal range, so keep it the smaller
    side.  Result equals the unsalted join exactly (helper columns are
    dropped)."""
    on = list(on)
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]),
                   F.lit(salt))
    left = skewed.withColumn("__salt", lsalt.cast("int"))
    right = other.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return left.join(right, on + ["__salt"], how).drop("__salt")
