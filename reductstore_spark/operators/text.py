"""Text-analysis operators beyond the inline registry queries.

Winnowing document fingerprints (Schleimer/Wilkerson/Aiken style): hash
every character k-gram, slide a window of w hashes, keep each window's
minimum — the classic plagiarism/near-dup fingerprint that is robust to
insertions.  Built purely from md5 + integer arithmetic so any engine
reproduces it bit-for-bit (DuckDB oracle in entry_queries).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _let(expr: Column, body) -> Column:
    """Bind ``expr`` to a lambda variable so ``body`` can reference it
    many times without re-evaluation (an expression embedded in a HOF
    lambda is otherwise recomputed per element — O(n^2) blowup here)."""
    return F.transform(F.array(expr), body).getItem(0)


def winnow_fingerprints(text: Column, k: int = 8, w: int = 4) -> Column:
    """Distinct winnowed fingerprint hashes (sorted array<long>)."""
    norm_expr = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")

    def with_norm(norm: Column) -> Column:
        n = F.length(norm)
        gram_idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
        hashes_expr = F.transform(
            gram_idx,
            lambda i: F.conv(
                F.substring(F.md5(F.substring(norm, i, k)), 1, 8), 16, 10
            ).cast("long"),
        )

        def with_hashes(hs: Column) -> Column:
            nh = F.size(hs)
            win_idx = F.sequence(F.lit(1), F.greatest(nh - (w - 1), F.lit(1)))
            mins = F.transform(win_idx, lambda j: F.array_min(F.slice(hs, j, w)))
            return F.array_sort(F.array_distinct(mins))

        return _let(hashes_expr, with_hashes)

    return _let(norm_expr, with_norm)


def fingerprint_digest(fps: Column) -> Column:
    """Stable digest of a fingerprint set (md5 of the joined sorted list)."""
    return F.md5(F.concat_ws(",", F.transform(fps, lambda x: x.cast("string"))))


def spread_python_stage(df):
    """Decouple a CPU-bound Arrow/Python stage from byte-based scan
    splits.  Spark sizes scan partitions by BYTES (maxPartitionBytes),
    tuned for JVM columnar scans; per-character Python work (md5
    k-grams, media decode) costs ~10^3 more per byte, so a compact
    table — one split — runs the whole stage on ONE core at any data
    size (round-5 sf3 soak: winnow_fingerprint went 4.2x for 3x data,
    single-core).  Repartition the slim projection up to the session's
    parallelism when the scan yields fewer splits; a no-op at real
    scale, where splits >> cores.

    Streaming frames pass through untouched: micro-batch partitioning is
    the source's concern (and ``.rdd`` is illegal on them); wrapped
    operators (extract_media_meta, winnow_*_pandas, resize/feature
    stubs) stay streaming-composable via foreachBatch or direct
    mapInPandas."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    # rdd.getNumPartitions forces physical planning once; that cost is
    # accepted here because skipping the check would force a shuffle on
    # every call — worse for the multi-file scans that dominate at scale,
    # where splits >= cores makes this the no-op branch
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def winnow_digests_pandas(df, id_col: str = "doc_id", text_col: str = "text",
                          k: int = 8, w: int = 4):
    """(id, n_fps, fp_digest) via an Arrow-batched mapInPandas stage.

    Bit-identical to ``winnow_fingerprints`` + ``fingerprint_digest`` (a
    test pins the equivalence) but ~5x faster: nested HOF lambdas
    (transform over sequence + array_min(slice)) evaluate interpreted
    per element in Catalyst, while here the k-gram md5s run in C
    (hashlib) and the window minimum is one numpy sliding-window view.
    A narrow transformation — no shuffle, scales out per partition.

    Exactness notes mirroring the Column version: trim strips SPACES
    only (Spark/DuckDB trim), Java ``\\s`` == Python ``\\s`` under
    re.ASCII, substring semantics for texts shorter than k/w collapse
    to the whole string / whole hash list.
    """
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    ws_re = _re.compile(r"\s+", _re.ASCII)

    def run(batches):
        for pdf in batches:
            n_fps = np.empty(len(pdf), dtype=np.int64)
            digests = []
            # per-batch gram->hash cache: natural-language character
            # k-grams repeat heavily across a batch, so most lookups hit
            # (measured ~2-3x fewer md5 calls on the synthetic corpus)
            cache: dict = {}

            def h(g: str) -> int:
                v = cache.get(g)
                if v is None:
                    v = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)
                    cache[g] = v
                return v

            for row, text in enumerate(pdf[text_col].astype(str)):
                t = ws_re.sub(" ", text.strip(" ").lower())
                n = len(t)
                grams = ([t[i:i + k] for i in range(n - k + 1)]
                         if n > k else [t[:k]])
                hs = np.fromiter((h(g) for g in grams), dtype=np.int64,
                                 count=len(grams))
                mins = (sliding_window_view(hs, w).min(axis=1)
                        if len(hs) > w else hs.min(keepdims=True))
                fp = np.unique(mins)  # sorted distinct
                n_fps[row] = len(fp)
                digests.append(hashlib.md5(
                    ",".join(map(str, fp)).encode("utf-8")).hexdigest())
            yield pd.DataFrame({
                id_col: pdf[id_col].to_numpy(),
                "n_fps": n_fps,
                "fp_digest": digests,
            })

    return spread_python_stage(df.select(id_col, text_col)).mapInPandas(
        run, schema=f"{id_col} bigint, n_fps bigint, fp_digest string")


def winnow_fp_rows_pandas(df, id_col: str = "doc_id",
                          text_col: str = "text",
                          k: int = 8, w: int = 4):
    """Exploded (id, fp) winnowing fingerprint rows — the posting-list
    form that pair-overlap detection joins on.  Same hash pipeline as
    ``winnow_digests_pandas`` (bit-identical fingerprints), emitted one
    row per distinct fingerprint per document."""
    import hashlib
    import re as _re

    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    ws_re = _re.compile(r"\s+", _re.ASCII)

    def run(batches):
        for pdf in batches:
            ids, fps = [], []
            cache: dict = {}

            def h(g: str) -> int:
                v = cache.get(g)
                if v is None:
                    v = int(hashlib.md5(g.encode("utf-8")).hexdigest()[:8], 16)
                    cache[g] = v
                return v

            for row, text in enumerate(pdf[text_col].astype(str)):
                t = ws_re.sub(" ", text.strip(" ").lower())
                n = len(t)
                grams = ([t[i:i + k] for i in range(n - k + 1)]
                         if n > k else [t[:k]])
                hs = np.fromiter((h(g) for g in grams), dtype=np.int64,
                                 count=len(grams))
                mins = (sliding_window_view(hs, w).min(axis=1)
                        if len(hs) > w else hs.min(keepdims=True))
                fp = np.unique(mins)
                ids.extend([pdf[id_col].iat[row]] * len(fp))
                fps.extend(fp.tolist())
            yield pd.DataFrame({id_col: np.asarray(ids, dtype=np.int64),
                                "fp": np.asarray(fps, dtype=np.int64)})

    return spread_python_stage(df.select(id_col, text_col)).mapInPandas(
        run, schema=f"{id_col} bigint, fp bigint")
