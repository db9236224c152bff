"""Scale-safe global top-k.

A global ``row_number() OVER (ORDER BY ...)`` window forces every input
row through a single partition — the whole corpus in one task at scale.
``orderBy(...).limit(k)`` instead compiles to ``TakeOrderedAndProject``:
each partition keeps its local top-k and the driver merges k·p candidate
rows, so the plan survives a 100x scale-up.  The rank column is then
derived by a window over the <= k surviving rows, which is free.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def global_top_k(df: DataFrame, k: int, order: Sequence[Column],
                 rank_col: str = "rnk") -> DataFrame:
    """Deterministic global top-k of ``df`` by ``order`` with a 1-based
    ``rank_col``.  ``order`` must be a total order (include a unique
    tiebreak column) for reproducible results."""
    top = df.orderBy(*order).limit(k)
    # constant partition key: identical single-partition execution over
    # the <= k survivors, but silences Spark's "No Partition Defined"
    # warning that an empty partitionBy triggers
    w = Window.partitionBy(F.lit(1)).orderBy(*order)
    return top.withColumn(rank_col, F.row_number().over(w))
