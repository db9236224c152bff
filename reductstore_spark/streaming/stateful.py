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

from ..condition.ast import Node
from ..condition.interpreter import Context, Evaluator
from ..condition.parser import parse_when
from ..condition.values import CondError, Interrupt
from ..condition import values as V

_STATE_SCHEMA = StructType([StructField("blob", BinaryType(), True)])

_OUT_SCHEMA = StructType([
    StructField("bucket", StringType(), False),
    StructField("entry", StringType(), False),
    StructField("ts", LongType(), False),
    StructField("labels_json", StringType(), True),
])


def stateful_stream(stream_df: DataFrame, when, strict: bool = False) -> DataFrame:
    """Apply a stateful `when` condition to a records stream.

    Returns (bucket, entry, ts, labels_json) of matching records —
    payloads can be re-joined downstream by (bucket, entry, ts)."""
    node, directives = parse_when(when)
    if directives:
        raise NotImplementedError("directives on stateful streams")

    ser = stream_df.selectExpr(
        "bucket", "entry", "ts", "to_json(labels) AS labels_json")

    def fn(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        ev = Evaluator(node)
        interrupted = False
        if state.exists:
            blob = state.get[0]
            st = pickle.loads(blob)
            interrupted = st["interrupted"]
            ev.set_state(st["ops"])
        out: List[Dict] = []
        for pdf in pdf_iter:
            if interrupted:
                break
            pdf = pdf.sort_values("ts", kind="mergesort")
            for row in pdf.itertuples(index=False):
                labels = json.loads(row.labels_json) if row.labels_json else {}
                try:
                    ok = V.as_bool(ev.apply(Context(int(row.ts), labels, {})))
                except Interrupt:
                    interrupted = True
                    break
                except CondError:
                    if strict:
                        raise
                    ok = False
                if ok:
                    out.append({"bucket": row.bucket, "entry": row.entry,
                                "ts": int(row.ts), "labels_json": row.labels_json})
        state.update((pickle.dumps({"ops": ev.get_state(),
                                    "interrupted": interrupted}),))
        if out:
            yield pd.DataFrame(out)

    return (
        ser.groupBy("bucket", "entry")
        .applyInPandasWithState(
            fn, outputStructType=_OUT_SCHEMA, stateStructType=_STATE_SCHEMA,
            outputMode="append", timeoutConf=GroupStateTimeout.NoTimeout)
    )
