"""Tracked DataFrame caching.

``DataFrame.persist()`` registers the plan in Spark's CacheManager, which
holds it until an explicit ``unpersist`` — dropping the Python reference
does NOT release executor memory (unlike raw RDDs, cached plans are not
cleaned by ContextCleaner on GC).  Queries that persist intermediates
(MinHash candidate sets, shingle tables) therefore leak storage across a
long-lived session: 40+ queries in one bench/serving session accumulate
every candidate cache.

``persist_tracked`` records each persisted DataFrame; callers that own
the session lifecycle (bench loop, serving layer, tests) call
``release_caches()`` once the query's results are materialized.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame

_LIVE: List[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    out = df.persist()
    _LIVE.append(out)
    return out


def release_caches() -> int:
    """Unpersist every tracked cache; returns how many were released."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            df.unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
