"""Multimodal columns: images/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real — binary payload columns, typed metadata
structs, Arrow-batched mapInPandas decode stages with bounded batch
sizes — while the actual media decoding is STUBBED (image/audio libs are
not available in this environment): ``decode_stub`` derives
deterministic fake dimensions from the payload's sha256 so tests and
oracles are exact.  Swapping in a real decoder only changes the body of
``_decode_batch``.

At 100 TB: payloads stay columnar (never projected unless the stage
needs bytes); decode stages scale per-partition with
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounding memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("content_type", StringType(), False),
    StructField("n_bytes", LongType(), False),
    StructField("sha256", StringType(), False),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Demo source: treat encoded text as the binary payload (the driver
    corpus has no real media; the pipeline shape is what matters)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")) \
             .withColumn("content_type", F.lit("application/octet-stream"))


def decode_stub(payload: bytes):
    """Deterministic fake decode: dimensions derived from content hash.

    A real implementation would call PIL/ffmpeg here; the signature and
    batch shape are identical."""
    digest = hashlib.sha256(payload).hexdigest()
    width = 16 + int(digest[:2], 16) % 240
    height = 16 + int(digest[2:4], 16) % 240
    return digest, width, height


def extract_media_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas decode stage: payload binary -> typed metadata rows."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            out = []
            for i in range(len(pdf)):
                payload = pdf["payload"].iat[i]
                digest, width, height = decode_stub(bytes(payload))
                out.append({
                    "doc_id": int(pdf[id_col].iat[i]),
                    "content_type": str(pdf["content_type"].iat[i]),
                    "n_bytes": len(bytes(payload)),
                    "sha256": digest,
                    "width": width,
                    "height": height,
                })
            yield pd.DataFrame(out)

    return df.select(id_col, "payload", "content_type").mapInPandas(
        run, schema=MEDIA_META_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int, id_col: str = "doc_id") -> DataFrame:
    """Frame-sampling shape: 1->N expansion per media payload (stubbed:
    one 'frame' per every_n 256-byte chunk, identified by offset)."""
    n_frames = F.greatest(
        (F.length("payload") / F.lit(256 * every_n)).cast("int"), F.lit(1))
    return (
        df.select(id_col, "payload", F.posexplode(
            F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_"))
        .select(
            id_col, "frame_idx",
            F.sha2(F.concat(F.col("payload"),
                            F.encode(F.col("frame_idx").cast("string"), "utf-8")),
                   256).alias("frame_key"),
        )
    )
