"""Streaming windowed rollups with late-data tolerance.

The hypertable-rollup pattern over the record stream: per (entry,
time-bucket) aggregates maintained incrementally by Structured
Streaming, with a watermark bounding how late a belated write may
arrive and still be folded into its bucket (the reference accepts
belated writes into old blocks, storage/entry/write_record.rs:61-199;
a streaming consumer needs an explicit lateness bound to keep state
finite).

Scale shape: the aggregation state is partitioned by (entry, window) —
the same key the shuffle uses — and the watermark evicts closed
windows from the state store, so memory is O(open windows), not
O(stream length).  In append output mode a bucket is emitted exactly
once, when the watermark passes its end: downstream sinks get
insert-only rollup rows (no upserts needed).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_rollup(
    records: DataFrame,
    window_duration: str = "1 day",
    watermark_delay: str = "1 hour",
    value_label: Optional[str] = None,
) -> DataFrame:
    """Per-(entry, window) rollup of a records stream (or batch frame —
    watermarks are a no-op in batch execution, so the same code serves
    both).

    Returns ``entry, win_start, win_end`` (epoch µs) with ``n``,
    ``first_ts``/``last_ts``, and — when ``value_label`` is given —
    ``v_sum``/``v_min``/``v_max`` over that label parsed as double
    (records whose label is missing or non-numeric count toward ``n``
    but not the value aggregates, matching the condition language's
    dynamic parse-don't-fail posture for aggregation).
    """
    ev = records.withColumn("__event_time", F.timestamp_micros(F.col("ts")))
    if ev.isStreaming:
        ev = ev.withWatermark("__event_time", watermark_delay)
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    ]
    if value_label is not None:
        v = F.try_element_at("labels", F.lit(value_label)).cast("double")
        ev = ev.withColumn("__v", v)
        aggs += [F.sum("__v").alias("v_sum"),
                 F.min("__v").alias("v_min"),
                 F.max("__v").alias("v_max")]
    win = F.window("__event_time", window_duration)
    return (
        ev.groupBy(F.col("entry"), win.alias("__win"))
        .agg(*aggs)
        .select(
            "entry",
            F.unix_micros("__win.start").alias("win_start"),
            F.unix_micros("__win.end").alias("win_end"),
            *[c for c in ["n", "first_ts", "last_ts"]
              + (["v_sum", "v_min", "v_max"] if value_label else [])],
        )
    )
