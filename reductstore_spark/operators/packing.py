"""Sequence packing and document chunking — training-data preparation.

LLM pre-training consumes fixed-length token sequences; the two standard
corpus transforms between "documents" and "training sequences" are:

* **Greedy sequence packing** (`pack_sequences`): concatenate documents
  in a deterministic order into packs of at most ``budget`` tokens,
  starting a new pack when the next document would overflow.  Packing is
  *group-local* (here per ``group_col``; at cluster scale per shard) —
  packs never cross groups, so the operation is embarrassingly parallel
  across groups and needs no global coordination.  The running
  "cumulative tokens with reset" state makes this a stateful scan, the
  same shape as the engine's `$each_t` operator: an `applyInPandas` per
  group over a deterministic order.  Only (id, n_tokens) rides through
  Arrow — the token counting itself stays JVM-side.

* **Sliding-window chunking** (`chunk_documents`): split each document
  into windows of ``window`` tokens every ``stride`` tokens (RAG /
  retrieval indexing, long-doc truncation).  Stateless and per-row: a
  `posexplode` over the window starts, everything in built-in functions,
  no shuffle.

Both are deterministic and engine-portable (token = whitespace word of
the lower-cased text, exactly `dedup.normalized_words`), so the DuckDB
oracles in entry_queries replay them term-for-term.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import normalized_words


def pack_sequences(
    docs: DataFrame,
    budget: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy token-budget packing of documents into training sequences.

    Within each group (ordered by ``id_col``): keep a running token
    count; when adding the next document would exceed ``budget`` and the
    current pack is non-empty, start a new pack.  A document larger than
    the budget occupies a pack of its own.  Returns one row per document:

        group_col, id_col, n_tokens, pack_id (0-based per group),
        pack_offset (token offset inside its pack)

    Scale: one shuffle on ``group_col`` (choose shard-sized groups —
    salt a huge corpus into `hash(id) % n_shards` groups first); the
    Python stage only sees two int64 columns per row via Arrow.
    """
    if budget <= 0:
        raise ValueError("pack budget must be positive")
    toks = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.size(normalized_words(F.col(text_col))).cast("long").alias("n_tokens"),
    )

    def run(pdf):
        import numpy as np

        pdf = pdf.sort_values("id", kind="mergesort").reset_index(drop=True)
        nt = pdf["n_tokens"].to_numpy()
        pack = np.empty(len(nt), dtype=np.int64)
        off = np.empty(len(nt), dtype=np.int64)
        cur, cum = 0, 0
        for i, t in enumerate(nt):
            if cum > 0 and cum + t > budget:
                cur += 1
                cum = 0
            pack[i] = cur
            off[i] = cum
            cum += t
        pdf["pack_id"] = pack
        pdf["pack_offset"] = off
        return pdf

    out = toks.groupBy("grp").applyInPandas(
        run, schema="grp string, id bigint, n_tokens bigint, "
                    "pack_id bigint, pack_offset bigint")
    return out.select(
        F.col("grp").alias(group_col), F.col("id").alias(id_col),
        "n_tokens", "pack_id", "pack_offset")


def chunk_documents(
    docs: DataFrame,
    window: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window token chunks per document.

    Chunk starts are 1, 1+stride, 1+2*stride, ...; the final start is
    clamped to ``n - window + 1`` so the last window always reaches the
    end of the document — every token lands in at least one chunk, with
    the tail chunk overlapping its predecessor by more than the usual
    stride when the stride doesn't divide (n - window).  A document
    shorter than ``window`` yields one (short) chunk.  Returns one row
    per chunk:

        id_col, chunk_id (0-based), chunk_tokens, chunk_hash (md5 of the
        space-joined chunk text)

    Pure built-in functions (sequence + posexplode + slice), no Python,
    no shuffle — a narrow per-row transform that scales with partitions.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    words = normalized_words(F.col(text_col))
    df = docs.select(F.col(id_col), words.alias("__ws"))
    n = F.size("__ws")
    last = F.greatest(n - (window - 1), F.lit(1))
    starts = F.transform(
        F.sequence(F.lit(1), F.greatest(n - window + stride, F.lit(1)),
                   F.lit(stride)),
        lambda s: F.least(s, last))
    ex = df.select(
        id_col, "__ws",
        F.posexplode(starts).alias("chunk_id", "__start"))
    chunk = F.slice("__ws", F.col("__start"), window)
    return ex.select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.size(chunk).cast("long").alias("chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )
