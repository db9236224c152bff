"""Stateful condition operators on continuous queries.

$each_t / $gate / $each_n / $limit carry per-entry mutable state; on a
stream that state must survive micro-batch boundaries.  Spark mapping:
``applyInPandasWithState`` grouped by (bucket, entry) with the exact
interpreter's state pickled into the group state (reference semantics:
operators/aggregation/*.rs; continuous scan continuous.rs:16-84).

Rows are processed in ts order *within* each micro-batch; an append-only
ingest path delivers batches in arrival order, matching the reference's
continuous query (which also processes in arrival order and resets
stateful ops when time goes backwards).
"""

from __future__ import annotations

import json
import pickle
from typing import Dict, Iterable, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..condition.parser import parse_when

_STATE_SCHEMA = StructType([StructField("blob", BinaryType(), True)])

_OUT_SCHEMA = StructType([
    StructField("bucket", StringType(), False),
    StructField("entry", StringType(), False),
    StructField("ts", LongType(), False),
    StructField("labels_json", StringType(), True),
])


def stateful_stream(stream_df: DataFrame, when, strict: bool = False) -> DataFrame:
    """Apply a stateful and/or ctx-padded `when` condition to a records
    stream — the streaming form of the reference's full WhenFilter
    (filters/when.rs:60-107): condition state, the #ctx_before buffer,
    and the #ctx_after latch all survive micro-batch boundaries in the
    group state, so a match early in one batch drains context rows
    buffered in the previous batch, exactly like the reference's
    sequential tail scan.

    Returns (bucket, entry, ts, labels_json) of matching records —
    payloads can be re-joined downstream by (bucket, entry, ts)."""
    from ..condition.interpreter import FilterRecord, WhenFilter

    node, directives = parse_when(when)
    unsupported = {k for k in directives
                   if k not in ("#ctx_before", "#ctx_after",
                                "#select_labels")}
    if unsupported:
        raise NotImplementedError(
            f"directives on stateful streams: {sorted(unsupported)}")
    # validate directive values at plan time, not in the executor
    WhenFilter(node, directives, strict)

    ser = stream_df.selectExpr(
        "bucket", "entry", "ts", "to_json(labels) AS labels_json")

    def fn(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        wf = WhenFilter(node, directives, strict)
        interrupted = False
        if state.exists:
            blob = state.get[0]
            st = pickle.loads(blob)
            interrupted = st["interrupted"]
            wf.set_state(st["wf"])
        out: List[Dict] = []
        bucket, entry = key
        for pdf in pdf_iter:
            if interrupted:
                break
            pdf = pdf.sort_values("ts", kind="mergesort")
            for row in pdf.itertuples(index=False):
                labels = json.loads(row.labels_json) if row.labels_json else {}
                emitted = wf.feed(FilterRecord(int(row.ts), labels, {},
                                               extra=row.labels_json))
                if emitted is None:  # $limit Interrupt — scan over
                    interrupted = True
                    break
                for r in emitted:
                    # untouched labels pass the original JSON through;
                    # #select_labels re-serializes the filtered map
                    lj = r.extra if wf.select_labels is None \
                        else json.dumps(r.labels)
                    out.append({"bucket": bucket, "entry": entry,
                                "ts": r.timestamp, "labels_json": lj})
        state.update((pickle.dumps({"wf": wf.get_state(),
                                    "interrupted": interrupted}),))
        if out:
            yield pd.DataFrame(out)

    return (
        ser.groupBy("bucket", "entry")
        .applyInPandasWithState(
            fn, outputStructType=_OUT_SCHEMA, stateStructType=_STATE_SCHEMA,
            outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout)
    )
