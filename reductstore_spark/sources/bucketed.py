"""Bucketed tables: shuffle-free co-located joins and aggregations.

At the 100 TB design point the dominant cost of a fact-fact join
(e.g. orders ⋈ lineitem) is the shuffle of both sides.  Writing both
tables bucketed **and sorted** by the join key makes the join a
per-bucket sort-merge with NO exchange on either side — Spark matches
the ``HashPartitioning(key, n)`` output partitioning of the bucketed
scans against the join's requirement, and the sort is satisfied by the
bucket files themselves.  The same bucketing also serves repeated
``groupBy(key)`` aggregations shuffle-free.

This is the Spark-native analogue of the reference's per-entry block
layout (records co-located and time-sorted per entry,
reductstore/src/storage/block_manager.rs) generalised to any key.

Usage:
    write_bucketed(orders, "orders_b", ["o_orderkey"], 64, path)
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], 64, path2)
    spark.table("orders_b").join(
        spark.table("lineitem_b"),
        F.col("o_orderkey") == F.col("l_orderkey"))   # zero Exchange

Bucket counts must match on both sides (or divide evenly under
``spark.sql.bucketing.coalesceBucketsInJoin.enabled``).  To also drop
the read-side per-task Sort, set
``spark.sql.legacy.bucketedTableScan.outputOrdering=true`` — the scan
then reports its sort order, which is valid because ``write_bucketed``
guarantees one (sorted) file per bucket.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    num_buckets: int,
    path: Optional[str] = None,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and, by default, sorted) table.

    ``path`` makes it an external table (data at ``path``, metadata in
    the session catalog) — bucketing metadata lives in the catalog, so
    ``saveAsTable`` is required; a bare ``parquet(path)`` write cannot
    record bucket spec.  Sorting within buckets is what lets a
    sort-merge join skip its per-task sort, so keep ``sort=True``
    unless the write-side sort cost matters more than read-side joins.
    """
    keys = list(keys)
    if sort:
        # one file per bucket: Spark drops the read-side Sort only when
        # every bucket is a single (sorted) file — hash-repartitioning on
        # the bucket keys into num_buckets partitions aligns write tasks
        # 1:1 with buckets.  Skewed buckets inherit the key skew; keep
        # num_buckets high enough that one bucket fits one task.
        df = df.repartition(num_buckets, *keys)
    w = df.write.mode(mode).bucketBy(num_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)
