"""As-of join: align each left row with the most recent right row.

The classic time-series primitive (kdb+ ``aj``, pandas ``merge_asof``,
DuckDB ``ASOF JOIN``) that Spark lacks as a built-in.  Expressed as the
merge-join formulation — union the two tagged streams, one window pass
partitioned by the join keys ordered by (ts, side), and propagate the
last-seen right-side values onto each left row with
``last(..., ignorenulls=True)``.

Scale shape: ONE shuffle on the ``by`` keys (the window), never a
range/inequality cross-join (a naive ``l.ts >= r.ts`` join is
O(|L|x|R|) per key and explodes at 100 TB).  Skewed keys behave like
any windowed aggregation (salting applies if one key dominates).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: Optional[Sequence[str]] = None,
    tolerance: Optional[int] = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: for each left row, the right row with the
    greatest ``on`` <= left.``on`` (ties: right row at the same instant
    matches), within the same ``by`` group.

    ``tolerance`` (same unit as ``on``, typically µs) nulls the matched
    columns when the right row is older than ``on - tolerance`` —
    pandas ``merge_asof(tolerance=...)`` semantics.  Right-side value
    columns are suffixed; the matched right timestamp is ``{on}{suffix}``.
    Left rows with no match keep nulls (left-join semantics).
    """
    by = list(by or [])
    if not by:
        # Window.partitionBy() with no keys funnels the whole union
        # through ONE task — a silent scale-killer.  A global as-of join
        # needs an explicit opt-in via a constant key.
        raise ValueError(
            "asof_join requires at least one `by` key: an un-keyed as-of "
            "join puts the entire dataset through a single partition. "
            "For a genuinely global join, add a constant key column "
            "(lit(1)) explicitly — and expect it not to scale.")
    rcols = [c for c in right.columns if c not in by and c != on]

    # tagged union: side 0 sorts before side 1 at equal ts, so a right
    # row at exactly left.ts is visible to that left row
    rt = right.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in rcols],
        *[F.lit(None).cast(t.dataType).alias(c)
          for c, t in zip(left.columns, left.schema)
          if c not in by and c != on],
    )
    lt = left.select(
        *by,
        F.col(on).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias(f"{on}{suffix}"),
        *[F.lit(None).cast(t.dataType).alias(f"{c}{suffix}")
          for c, t in zip(rcols, (right.schema[c] for c in rcols))],
        *[F.col(c) for c in left.columns if c not in by and c != on],
    )
    u = rt.unionByName(lt)

    w = (Window.partitionBy(*by) if by else Window.partitionBy()) \
        .orderBy("__ts", "__side") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    filled = [F.last(f"{c}{suffix}", ignorenulls=True).over(w)
              .alias(f"{c}{suffix}") for c in [on, *rcols]]
    out = (
        u.select(*by, "__ts", "__side",
                 *[c for c in left.columns if c not in by and c != on],
                 *filled)
        .where(F.col("__side") == 1)
        .withColumnRenamed("__ts", on)
        .drop("__side")
    )
    if tolerance is not None:
        stale = F.col(f"{on}{suffix}") < F.col(on) - F.lit(tolerance)
        out = out.select(
            *by, on,
            *[c for c in left.columns if c not in by and c != on],
            *[F.when(~F.coalesce(stale, F.lit(True)), F.col(f"{c}{suffix}"))
              .alias(f"{c}{suffix}") for c in [on, *rcols]],
        )
    return out
