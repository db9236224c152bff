"""Stateful `when` execution: the ordered per-entry interpreter path.

The stateful condition operators ($each_n / $each_t / $gate / $limit) and
the context-padding directives carry mutable state across records of one
ordered scan, per entry (reference builds one filter chain per entry
query: storage/query/historical.rs:72-118, storage/bucket/query.rs:156-185).

Spark mapping: ``groupBy(bucket, entry).applyInPandas`` with rows sorted
by ``ts`` inside each group, running the exact WhenFilter interpreter.
This is the general/correct path; the planner uses Column/window rewrites
whenever the AST allows (see plans/planner.py) because a Python pass over
an entry is the slow path at scale.

Labels travel through Arrow as JSON strings (MapType round-trips through
pandas inconsistently across Arrow versions).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..condition.ast import Node
from ..condition.interpreter import FilterRecord, WhenFilter
from ..condition.values import Value


def apply_when_stateful(
    df: DataFrame,
    node: Node,
    directives: Dict[str, List[Value]],
    strict: bool = False,
) -> DataFrame:
    """Run the full WhenFilter pipeline (condition + ctx padding +
    select_labels + interrupt) over each (bucket, entry) group in ts order.

    ``df`` must have columns: bucket, entry, ts, labels, computed_labels
    (+ any payload columns, which are carried through untouched).
    """
    out_schema = df.schema
    cols = df.columns
    ser = df.withColumn("__labels_json", F.to_json(F.col("labels"))) \
            .withColumn("__computed_json", F.to_json(F.col("computed_labels")))

    def run(pdf):
        import pandas as pd

        pdf = pdf.sort_values("ts", kind="mergesort").reset_index(drop=True)
        wf = WhenFilter(node, directives, strict)
        keep_rows: List[int] = []
        new_labels: List[Optional[dict]] = []
        for i in range(len(pdf)):
            labels = json.loads(pdf["__labels_json"].iat[i]) if pdf["__labels_json"].iat[i] else {}
            computed = json.loads(pdf["__computed_json"].iat[i]) if pdf["__computed_json"].iat[i] else {}
            rec = FilterRecord(int(pdf["ts"].iat[i]), labels, computed, extra=i)
            emitted = wf.feed(rec)
            if emitted is None:  # $limit Interrupt — stop this entry's scan
                break
            for r in emitted:
                keep_rows.append(r.extra)
                new_labels.append(r.labels)
        out = pdf.iloc[keep_rows].copy() if keep_rows else pdf.iloc[0:0].copy()
        out["__labels_json"] = [json.dumps(lb) for lb in new_labels]
        return out[[*cols, "__labels_json", "__computed_json"]]

    ser_schema = ser.schema
    grouped = ser.groupBy("bucket", "entry").applyInPandas(run, schema=ser_schema)
    return (
        grouped
        .withColumn("labels", F.from_json(F.col("__labels_json"), "map<string,string>"))
        .select(*cols)
    )
