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
from pyspark.sql.window import Window


def _orderable(dt) -> bool:
    """True iff a column of this type can appear in an orderBy: no
    MapType anywhere in the tree (Spark's TypeUtils.checkForOrderingExpr
    rejects nested maps too)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


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
        # batch execution: watermarks are a no-op.  dropDuplicates keeps
        # an ARBITRARY row per key, so when duplicate (entry, ts) rows
        # are not byte-identical the survivor would be nondeterministic;
        # pick the winner explicitly instead.  ``__seq`` (the store's
        # arrival counter) gives first-wins like the streaming path; a
        # seq-less frame falls back to an all-column sort, which is
        # still deterministic (identical duplicates collapse anyway).
        if "__seq" in records.columns:
            order = [F.col("__seq").asc()]
        else:
            # maps are not orderable in Spark — anywhere in the type, not
            # just top-level (array<map>, struct with a map field all
            # fail analysis); sort on every orderable column (duplicates
            # differing ONLY in an unorderable column remain ambiguous —
            # document over pretend-determinism)
            order = [F.col(f.name).asc_nulls_first()
                     for f in records.schema.fields
                     if f.name not in ("entry", event_time_col)
                     and _orderable(f.dataType)]
        if not order:
            out = out.dropDuplicates(["entry", event_time_col])
        else:
            w = (F.row_number().over(
                Window.partitionBy("entry", event_time_col).orderBy(*order)))
            out = (out.withColumn("__rn", w)
                   .where(F.col("__rn") == 1).drop("__rn"))
    return out.drop("__evt")
