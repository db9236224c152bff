"""reductstore_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ReductStore (reference study:
/root/reference, reductstore/reductstore ~1.18), re-expressed Spark-first.

Public surface:
    session.get_session / configure   -- tuned SparkSession
    schema                            -- records data model
    condition                         -- JSON `when` language (parser,
                                         Column compiler, interpreter)
    query.QueryEngine                 -- scans, multi-entry, mutation
    catalog                           -- SQL views over corpus + stores
    sources.store.RecordStore         -- partitioned Parquet storage
    sources.bucketed                  -- shuffle-free co-located joins
    operators.*                       -- stateful ops, dedup, similarity,
                                         text analysis, multimodal,
                                         as-of join, top-k
    streaming.*                       -- continuous queries, replication,
                                         watermarked rollups
"""

__version__ = "0.1.0"
