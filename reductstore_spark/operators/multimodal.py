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

from .text import spread_python_stage
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

    return spread_python_stage(
        df.select(id_col, "payload", "content_type")).mapInPandas(
        run, schema=MEDIA_META_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int,
                id_col: str = "doc_id") -> DataFrame:
    """Resize shape: payload -> payload' with target dimensions recorded.

    Stubbed: the output payload is the input truncated/cycled to
    ``width*height`` bytes (deterministic); a real implementation calls
    PIL/opencv inside the same batch loop.  Output schema/row-count
    contract (1:1, payload stays binary, dims in metadata) is the real
    thing."""
    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("payload", BinaryType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
    ])
    target = width * height

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for i in range(len(pdf)):
                raw = bytes(pdf["payload"].iat[i])
                n = max(1, len(raw))
                resized = (raw * (target // n + 1))[:target]
                rows.append({"doc_id": int(pdf[id_col].iat[i]),
                             "payload": resized,
                             "width": width, "height": height})
            yield pd.DataFrame(rows)

    return spread_python_stage(df.select(id_col, "payload")).mapInPandas(
        run, schema=schema)


def feature_vector_stub(df: DataFrame, dim: int = 16,
                        id_col: str = "doc_id") -> DataFrame:
    """Feature-extraction shape: payload -> array<float> embedding,
    numpy-vectorized per Arrow batch (the batch loop a real encoder
    would fill; the stub derives the vector from the content digest so
    it is deterministic and unit-norm).  Feeds directly into the
    similarity/ANN operators."""
    from pyspark.sql.types import ArrayType, FloatType

    schema = StructType([
        StructField("doc_id", LongType(), False),
        StructField("embedding", ArrayType(FloatType(), False), False),
    ])

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            ids, vecs = [], []
            for i in range(len(pdf)):
                digest = hashlib.sha256(bytes(pdf["payload"].iat[i])).digest()
                seed = np.frombuffer((digest * (dim * 4 // len(digest) + 1))
                                     [:dim * 4], dtype=np.uint32)
                v = (seed.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
                v /= np.linalg.norm(v) or 1.0
                ids.append(int(pdf[id_col].iat[i]))
                vecs.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({"doc_id": ids, "embedding": vecs})

    return spread_python_stage(df.select(id_col, "payload")).mapInPandas(
        run, schema=schema)


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
