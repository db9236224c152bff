"""Generic ingestion: map ANY tabular DataFrame into the records model.

The reference ingests opaque blobs + labels over HTTP; a Spark-native
engine ingests whatever Spark can read (Parquet/CSV/JSON/JDBC/stream)
and needs one mapping into the canonical record shape
(bucket, entry, ts-µs, payload, content_type, state, labels).  This is
that mapping, factored out of the events-specific adapter
(schema.events_as_records) into a reusable API:

    records = records_from_table(
        spark.read.json(path),
        entry="device_type",            # column name or literal via lit()
        ts_col="created_at",            # timestamp / timestamp_ntz / µs long
        label_cols=["severity", "site"],
        payload_col="body",             # optional str/binary column
        bucket="ingest")
    RecordStore(spark, root).write(records)

Works identically on streaming frames (all expressions are per-row), so
the same mapping serves `readStream` ingest pipelines.
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, LongType, StringType

from ..schema import STATE_FINISHED, raw_ts_us


def records_from_table(
    df: DataFrame,
    entry: Union[str, Column],
    ts_col: str,
    label_cols: Sequence[str] = (),
    payload_col: Optional[str] = None,
    content_type: str = "application/octet-stream",
    bucket: str = "default",
) -> DataFrame:
    """Project ``df`` into the records model.

    * ``entry``: a column NAME (per-row entry) or any Column expression.
    * ``ts_col``: timestamp / timestamp_ntz / epoch-µs long column —
      converted via the same dispatch the events adapter uses.
    * ``label_cols``: stringified into the labels map; NULLs become
      missing labels (the condition language's absent-label semantics),
      matching the reference where a label either exists or does not.
    * ``payload_col``: string (utf-8 encoded) or binary column; omitted
      -> NULL payload (metadata-only records, as the events mapping).
    """
    e = F.col(entry) if isinstance(entry, str) else entry
    pairs = []
    for c in label_cols:
        pairs.extend([F.lit(c), F.col(c).cast("string")])
    labels = (F.map_filter(F.create_map(*pairs),
                           lambda k, v: v.isNotNull())
              if pairs else F.expr("cast(map() as map<string,string>)"))
    if payload_col is None:
        payload = F.lit(None).cast(BinaryType())
    else:
        dt = df.schema[payload_col].dataType
        payload = (F.col(payload_col) if isinstance(dt, BinaryType)
                   else F.encode(F.col(payload_col).cast("string"), "utf-8"))
    # long columns are taken as epoch µs directly (the records-model
    # unit); timestamp[_ntz] goes through the same dispatch the events
    # adapter uses (raw_ts_us's long branch is the corpus-specific
    # TIMESTAMP(NANOS) reading — wrong default for a public API)
    dt = df.schema[ts_col].dataType
    ts = (F.col(ts_col) if isinstance(dt, LongType)
          else raw_ts_us(df, ts_col))
    return df.select(
        F.lit(bucket).alias("bucket"),
        e.cast(StringType()).alias("entry"),
        ts.cast(LongType()).alias("ts"),
        payload.alias("payload"),
        F.lit(content_type).alias("content_type"),
        F.lit(STATE_FINISHED).alias("state"),
        labels.alias("labels"),
        F.lit(None).cast("map<string,string>").alias("computed_labels"),
    )
