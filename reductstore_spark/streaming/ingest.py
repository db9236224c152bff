"""Streaming ingest dedup: the write path's upsert-by-(entry, ts)
semantics (reference storage/entry/write_record.rs:61-199 — a write at an
existing timestamp replaces the record) applied to a record *stream*.

A batch writer can shadow duplicates with a window over the whole table;
a stream cannot, so duplicates are dropped within a watermark bound:
``dropDuplicatesWithinWatermark`` keys state on (entry, ts) and the event
-time watermark evicts keys once no belated duplicate can still arrive —
state stays O(records inside the lateness window), not O(stream length).

First-wins note: streaming dedup keeps the FIRST arrival of each
(entry, ts) rather than the last (the batch upsert keeps the newest
``__seq``).  That is the only causally-consistent choice inside one
trigger window — "latest" is undefined while more duplicates may still
arrive — and matches at-least-once redelivery semantics (retransmits are
byte-identical, so which copy survives is immaterial).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def deduped_ingest(
    records: DataFrame,
    watermark_delay: str = "1 hour",
    event_time_col: str = "ts",
) -> DataFrame:
    """Drop duplicate (entry, ts) records from a streaming frame, keeping
    state only within ``watermark_delay`` of the stream's max event time.

    ``event_time_col`` holds epoch µs (the records model); it is projected
    to a timestamp column ``__evt`` for the watermark and dropped again —
    the output schema equals the input schema.
    """
    evt = F.timestamp_micros(F.col(event_time_col).cast("long"))
    out = (records.withColumn("__evt", evt)
           .withWatermark("__evt", watermark_delay))
    if records.isStreaming:
        out = out.dropDuplicatesWithinWatermark(["entry", event_time_col])
    else:
        # batch execution: watermarks are a no-op; plain dedup gives the
        # same first-wins answer deterministically
        out = out.dropDuplicates(["entry", event_time_col])
    return out.drop("__evt")
