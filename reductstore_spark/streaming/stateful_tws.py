"""transformWithState form of the stateful stream operator (Spark 4).

Same contract and semantics as ``stateful.stateful_stream`` — the full
WhenFilter (filters/when.rs:60-107: condition state, #ctx_before
buffer, #ctx_after latch, $limit Interrupt) surviving micro-batch
boundaries per (bucket, entry) group — but expressed with the newer
``transformWithStateInPandas`` API (SPARK-49564): a ``StatefulProcessor``
with a typed ``ValueState`` instead of a pickled ``GroupState`` tuple.

Why both exist: ``applyInPandasWithState`` is the proven path and stays
the default; this form gives typed state encoding, a state-store schema
the engine can evolve, and (for future use) event-time timers — the
reference's gate deadline is data-time driven, so no timer is
registered here, keeping the two paths bit-identical.  A pinned test
runs the same scenario through both and compares.

Gate on availability: importing this module raises ImportError when the
runtime can't execute TWS — either the Spark build lacks
``transformWithStateInPandas`` (< 4.0) or ``google.protobuf`` is not
installed (the TWS state protocol is protobuf-encoded;
``transform_with_state_driver_worker`` crashes without it, observed in
this container).  Callers feature-detect with a plain try/except import;
the equivalence test skips via ``pytest.importorskip`` where the
dependency is missing and pins both paths identical where it isn't.
"""

from __future__ import annotations

import json
import pickle
from typing import Dict, Iterable, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.group import GroupedData
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from ..condition.parser import parse_when
from .stateful import _OUT_SCHEMA

if not hasattr(GroupedData, "transformWithStateInPandas"):  # pragma: no cover
    raise ImportError("transformWithStateInPandas requires Spark >= 4.0")
# the TWS driver worker speaks a protobuf-encoded state protocol; without
# the package it exits -2 at query start, so fail at import time instead
from google.protobuf import descriptor as _pb_descriptor  # noqa: E402,F401


class _WhenFilterProcessor(StatefulProcessor):
    """Per-(bucket, entry) WhenFilter state machine as a TWS processor.

    State is one binary column: the pickled (WhenFilter state,
    interrupted) pair — the same payload the applyInPandasWithState path
    stores, so the two paths can never drift in what they persist."""

    def __init__(self, node, directives, strict):
        self._node = node
        self._directives = directives
        self._strict = strict

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("when_state", "blob binary")

    def handleInputRows(self, key, rows: Iterable[pd.DataFrame],
                        timerValues) -> Iterable[pd.DataFrame]:
        from ..condition.interpreter import FilterRecord, WhenFilter

        wf = WhenFilter(self._node, self._directives, self._strict)
        interrupted = False
        if self._state.exists():
            st = pickle.loads(self._state.get()[0])
            interrupted = st["interrupted"]
            wf.set_state(st["wf"])
        out: List[Dict] = []
        bucket, entry = key
        for pdf in rows:
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
                    lj = r.extra if wf.select_labels is None \
                        else json.dumps(r.labels)
                    out.append({"bucket": bucket, "entry": entry,
                                "ts": r.timestamp, "labels_json": lj})
        self._state.update((pickle.dumps({"wf": wf.get_state(),
                                          "interrupted": interrupted}),))
        if out:
            yield pd.DataFrame(out)

    def close(self) -> None:
        pass


def stateful_stream_tws(stream_df: DataFrame, when,
                        strict: bool = False) -> DataFrame:
    """``stateful.stateful_stream`` with transformWithStateInPandas.

    Identical signature, output schema (bucket, entry, ts, labels_json)
    and semantics; see the module docstring for when to prefer it."""
    from ..condition.interpreter import WhenFilter

    node, directives = parse_when(when)
    unsupported = {k for k in directives
                   if k not in ("#ctx_before", "#ctx_after",
                                "#select_labels")}
    if unsupported:
        raise NotImplementedError(
            f"directives on stateful streams: {sorted(unsupported)}")
    WhenFilter(node, directives, strict)  # plan-time validation

    ser = stream_df.selectExpr(
        "bucket", "entry", "ts", "to_json(labels) AS labels_json")
    return (
        ser.groupBy("bucket", "entry")
        .transformWithStateInPandas(
            statefulProcessor=_WhenFilterProcessor(node, directives, strict),
            outputStructType=_OUT_SCHEMA,
            outputMode="append",
            timeMode="none")
    )
