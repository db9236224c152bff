"""SparkSession factory with the engine's required configuration.

The condition language needs non-ANSI (wrapping/try) SQL semantics and a
UTC session timezone (timestamps are UNIX µs instants; date operators
shift explicitly via from_utc_timestamp).  AQE is enabled for runtime
re-planning (skew joins, partition coalescing) — essential at the
100 TB design point.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def configure(builder: SparkSession.Builder) -> SparkSession.Builder:
    """Apply engine-required confs to any builder (usable on a real cluster)."""
    return (
        builder
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.parquet.filterPushdown", "true")
        # testdata timestamp physical types drift between rounds (long
        # TIMESTAMP(NANOS) vs timestamp[us]); nanosAsLong keeps the nanos
        # form readable and schema.raw_ts_us dispatches on the actual type
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # label upserts are last-wins everywhere (update_labels, computed
        # labels); lets map_concat BE the upsert without a codegen-killing
        # map_filter strip of the old key
        .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    )


def get_session(app_name: str = "reductstore-spark", master: str | None = None,
                shuffle_partitions: int | None = None) -> SparkSession:
    """Local-mode session for tests/bench; cluster deployments call
    ``configure`` on their own builder instead."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    builder = configure(builder)
    builder = builder.config(
        "spark.sql.shuffle.partitions",
        str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
    )
    # local test corpora are single small parquet files; without this every
    # scan is one task on one core.  Cluster deployments with properly
    # sized files keep the 128 MB default (this is only in get_session,
    # not configure()).
    builder = builder.config("spark.sql.files.maxPartitionBytes", "4m")
    builder = builder.config("spark.sql.files.openCostInBytes", "512k")
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
    # the UI listener bus lags badly across many small jobs (benchmark
    # pattern) and causes multi-second stalls; headless anyway
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config("spark.ui.showConsoleProgress", "false")
    # a workload of many distinct queries overflows the 100-entry codegen
    # class cache -> Janino recompilation stalls on revisit
    builder = builder.config("spark.sql.codegen.cache.maxEntries", "2000")
    return builder.getOrCreate()
