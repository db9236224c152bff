"""Time-bucket rollup with gap filling — the continuous-aggregate /
``time_bucket_gapfill`` primitive of time-series stores, expressed
Spark-first.

The dense per-key time grid is generated *distributed*: one
``sequence(min_bucket, max_bucket)`` array per key, exploded on the
executors (never a driver loop or a collected calendar).  The global
bucket span is a 1-row aggregate broadcast into the key list; actual
aggregates left-join onto the grid; missing buckets fill with zero
counts and LOCF (last observation carried forward) via
``last(..., ignorenulls=True)`` over a per-key window.

Scale shape: the grid is |keys| x |buckets| rows but is built from a
|keys|-row frame — the explode happens after the key list is reduced, so
nothing rescans the fact table.  The LOCF window partitions by key
(parallel across keys, never a global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .rangejoin import _fdiv


def time_bucket_gapfill(
    df: DataFrame,
    key: str,
    ts_col: str,
    width: int,
    value_col: Column,
    value_name: str = "sum_value",
) -> DataFrame:
    """Per (key, bucket) rollup over a dense bucket grid spanning the
    global [min, max] of ``ts_col`` (integer units; bucket = floor
    division by ``width``).

    Output: ``key``, ``bucket`` (long), ``n_rows`` (0 on gaps),
    ``value_name`` (null on gaps), ``locf_<value_name>`` (gap filled with
    the key's previous value).
    """
    bucketed = df.withColumn("__bucket", _fdiv(F.col(ts_col), width))
    actual = (bucketed.groupBy(key, "__bucket")
              .agg(F.count(F.lit(1)).alias("n_rows"),
                   value_col.alias(value_name)))
    span = actual.agg(F.min("__bucket").alias("__mn"),
                      F.max("__bucket").alias("__mx"))
    keys = df.select(key).distinct()
    grid = (keys.crossJoin(F.broadcast(span))
            .select(key, F.explode(
                F.sequence(F.col("__mn"), F.col("__mx"))).alias("__bucket")))
    w = (Window.partitionBy(key).orderBy("__bucket")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(actual, [key, "__bucket"], "left")
            .select(key,
                    F.col("__bucket").alias("bucket"),
                    F.coalesce("n_rows", F.lit(0)).alias("n_rows"),
                    F.col(value_name),
                    F.last(value_name, ignorenulls=True).over(w)
                     .alias(f"locf_{value_name}")))
