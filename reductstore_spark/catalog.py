"""SQL surface: register the data model as queryable views.

The reference has no SQL (SURVEY §2.D); the driver's added scope is
that standard DataFrame/SQL analytics over the same tables come from
Spark itself rather than being reimplemented.  This module is that
surface made concrete: one call registers the corpus tables and the
records model as temp views, after which ``spark.sql(...)`` — joins,
grouped aggregates, window ranking, set ops — works over exactly the
data the condition-language queries see.

Views are lazy: registration costs nothing; every query still plans
through Catalyst with full pushdown/pruning into the parquet scans.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession

CORPUS_TABLES = ("region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings")


def register_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: Sequence[str] = CORPUS_TABLES,
    records_view: Optional[str] = "records",
) -> None:
    """Create temp views for the corpus parquet tables under their own
    names, plus (by default) a ``records`` view exposing the reference's
    record model (entry / ts-µs / labels / state) derived from the
    events table — so SQL can query the same shape the condition
    language filters."""
    for t in tables:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    if records_view is not None:
        from .schema import events_as_records
        events_as_records(spark, sf_dir).createOrReplaceTempView(records_view)


def register_store(spark: SparkSession, store_root: str,
                   view: str = "records") -> None:
    """Expose a RecordStore's live records (upsert-resolved, FINISHED and
    hidden entries included — filter in SQL as needed) as a temp view."""
    from .sources.store import RecordStore
    RecordStore(spark, store_root).read().createOrReplaceTempView(view)


def sql_over(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot convenience: register the corpus views and run ``query``."""
    register_tables(spark, sf_dir)
    return spark.sql(query)
