"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` maps
every implemented operator from SURVEY.md §2 (+ analytics and
LLM-pipeline scope) to a (spark, sf_dir) -> DataFrame callable;
``oracle_sql()`` provides the DuckDB-equivalent SQL for each.
Implementation lives in reductstore_spark/entry_queries.py.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from reductstore_spark.entry_queries import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: conditional multi-entry query over the records model —
    dynamic-typed label predicate + decimation + merge order."""
    from reductstore_spark.entry_queries import _records
    from reductstore_spark.query import QueryEngine

    records = _records(spark, "/root/testdata/sf0.001")
    return QueryEngine().query(
        records,
        entries=["*"],
        when={"$and": [{"&value": {"$gt": 50}}, {"$each_n": 2}]},
    ).select("entry", "ts", "labels")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in QUERIES.items() if sql is not None}
