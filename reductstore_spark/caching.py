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
_LIVE_CKPT: List[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    out = df.persist()
    _LIVE.append(out)
    return out


def release_local_checkpoint(df: DataFrame) -> bool:
    """Free a ``localCheckpoint``-ed DataFrame's storage blocks NOW.

    ``localCheckpoint`` persists the physical RDD directly in the block
    manager — it never registers with the SQL CacheManager, so neither
    ``df.unpersist()`` nor ``spark.catalog.clearCache()`` touches it,
    and ContextCleaner only reclaims it after BOTH the Python wrapper
    and the JVM Dataset are garbage collected (py4j keeps the latter
    alive until a Python GC cycle), which under allocation pressure lags
    far behind need — measured: a 4-SF soak accumulated enough orphaned
    checkpoint blocks to fail a later broadcast build with
    "Not enough memory to build and broadcast".  The checkpointed plan
    is a ``LogicalRDD`` whose ``rdd()`` IS the persisted RDD; unpersist
    it directly."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
        return True
    except Exception:  # not a checkpoint plan / session stopped
        return False


def localcheckpoint_tracked(df: DataFrame, eager: bool = True,
                            materialized_by: str = None) -> DataFrame:
    """``localCheckpoint`` whose blocks ``release_caches()`` frees.

    ``eager=False`` defers materialization to the first downstream
    action (the plan is truncated at call time either way), folding the
    checkpoint's dedicated job into a job the caller runs anyway.  The
    contract: that action must run before any branch divergence that
    would recompute the tree, and the caller must NAME it in
    ``materialized_by`` (refusing the silent form keeps the contract
    visible at every call site); ``tests/test_caching_contract.py``
    verifies the claim with :func:`cached_fraction` — a lazy checkpoint
    whose blocks are not fully cached after the named action is a
    silent-recompute bug, exactly the double-execution the lazy form
    exists to remove."""
    if not eager and not materialized_by:
        raise ValueError(
            "localcheckpoint_tracked(eager=False) requires materialized_by="
            "'<the downstream action that materializes the blocks>'")
    out = df.localCheckpoint(eager=eager)
    _LIVE_CKPT.append(out)
    return out


def cached_fraction(df: DataFrame) -> float:
    """Fraction of a checkpointed DataFrame's RDD partitions currently in
    the block manager (0.0 when none, or when ``df`` is not a checkpoint
    plan).  The probe behind the lazy-checkpoint contract: after the
    call site's ``materialized_by`` action has run, this must be 1.0 —
    anything less means a branch diverged before the first action and
    the checkpoint tree is being recomputed per branch."""
    try:
        rdd = df._jdf.queryExecution().analyzed().rdd()
    except Exception:  # not a checkpoint plan
        return 0.0
    rid = rdd.id()
    sc = df.sparkSession.sparkContext
    for info in sc._jsc.sc().getRDDStorageInfo():
        if info.id() == rid:
            total = info.numPartitions()
            return info.numCachedPartitions() / total if total else 1.0
    return 0.0


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
    while _LIVE_CKPT:
        if release_local_checkpoint(_LIVE_CKPT.pop()):
            n += 1
    return n
