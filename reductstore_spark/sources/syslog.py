"""System events: the ``$system`` bucket.

Reference model (1.20 line: reductstore/src/syslog/ unified in PR-1496;
lifecycle diagnostics PR-1399, usage events PR-1474, log capture
PR-1481): engine operations emit *records* into a provisioned
``$system`` bucket —

* ``usage/<instance>``            instance totals
* ``usage/<instance>/<bucket>``   per-bucket usage statistics with
                                  ``record_count`` / ``size`` /
                                  ``written_entries`` style labels
* ``lifecycle_run/...``           lifecycle action diagnostics with
                                  ``status`` / ``message`` labels
* ``logs/<instance>/messages``    captured log messages with a ``level``
                                  severity label

Because system events are ordinary records, the full query surface
(time ranges, the ``when`` condition language, context padding) works on
them — e.g. ``{"&status": {"$ne": "ok"}}`` over lifecycle runs.  The
bucket is provisioned: it cannot be renamed away, and its retention is a
FIFO quota (``RS_SYSTEM_EVENTS_QUOTA_SIZE`` analog, default 10 GB).

Scale note: event volume is O(operations), written through the same
partitioned store path as data records (one tiny append per batch of
events); queries prune to the ``$system`` bucket partition.
"""

from __future__ import annotations

import json
from typing import Dict, Iterable, Optional, Tuple

from pyspark.sql import functions as F

from ..schema import RECORDS_SCHEMA

SYSTEM_BUCKET = "$system"
DEFAULT_QUOTA_BYTES = 10 * 1024**3  # RS_SYSTEM_EVENTS_QUOTA_SIZE default

_LEVELS = {"TRACE": 0, "DEBUG": 1, "INFO": 2, "WARN": 3, "ERROR": 4,
           "OFF": 99}


class SystemEventLog:
    """Writer/reader for ``$system`` event records over a RecordStore."""

    def __init__(self, store, instance: str = "local",
                 log_level: str = "WARN"):
        self.store = store
        self.instance = instance
        if log_level not in _LEVELS:
            raise ValueError(f"unknown log level '{log_level}'")
        self.log_level = log_level

    # -- emission --------------------------------------------------------
    def emit(self, events: Iterable[Tuple[str, int, Dict[str, str]]],
             payloads: Optional[Dict[int, bytes]] = None) -> int:
        """Write events as records; each is (entry, ts_us, labels).
        Returns the number of events written."""
        rows = []
        for i, (entry, ts_us, labels) in enumerate(events):
            payload = (payloads or {}).get(i)
            rows.append((SYSTEM_BUCKET, entry, int(ts_us), payload, "", 1,
                         {k: str(v) for k, v in labels.items()}, {}))
        if not rows:
            return 0
        df = self.store.spark.createDataFrame(rows, RECORDS_SCHEMA)
        self.store.write(df)
        return len(rows)

    def log_usage(self, ts_us: int) -> int:
        """Snapshot per-bucket + instance-total usage statistics
        (PR-1474 fields: record_count, size, written_entries)."""
        raw = self.store.read().where(F.col("bucket") != SYSTEM_BUCKET)
        per_bucket = (
            raw.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("record_count"),
                 F.sum(F.coalesce(F.length("payload"), F.lit(0))).alias("size"),
                 F.countDistinct("entry").alias("written_entries"))
            .collect())
        events = []
        tot_records = tot_size = tot_entries = 0
        for r in per_bucket:
            events.append((f"usage/{self.instance}/{r['bucket']}", ts_us, {
                "record_count": r["record_count"],
                "size": r["size"] or 0,
                "written_entries": r["written_entries"],
            }))
            tot_records += r["record_count"]
            tot_size += r["size"] or 0
            tot_entries += r["written_entries"]
        events.append((f"usage/{self.instance}", ts_us, {
            "record_count": tot_records, "size": tot_size,
            "written_entries": tot_entries,
        }))
        return self.emit(events)

    def log_lifecycle_run(self, ts_us: int, bucket: str, action: str,
                          status: str, message: str = "",
                          processed_records: int = 0,
                          processed_blocks: int = 0) -> int:
        """Lifecycle action diagnostics (PR-1399/PR-1470: canonical
        top-level status/message + processed record AND block counts)."""
        return self.emit([(f"lifecycle_run/{self.instance}/{bucket}", ts_us, {
            "action": action, "status": status, "message": message,
            "processed_records": processed_records,
            "processed_blocks": processed_blocks,
        })])

    def log_message(self, ts_us: int, level: str, message: str) -> int:
        """Captured engine log message (PR-1481): stored under
        ``logs/<instance>/messages`` with a ``level`` label; messages
        below the configured severity are dropped."""
        if level not in _LEVELS:
            raise ValueError(f"unknown log level '{level}'")
        if _LEVELS[level] < _LEVELS[self.log_level]:
            return 0
        return self.emit(
            [(f"logs/{self.instance}/messages", ts_us, {"level": level})],
            payloads={0: message.encode("utf-8")})

    # -- retention / protection -----------------------------------------
    def apply_quota(self, quota_bytes: int = DEFAULT_QUOTA_BYTES) -> int:
        """FIFO-evict oldest ``$system`` day partitions over the quota
        (reapplied on startup in the reference, PR-1557)."""
        return self.store.evict_fifo(SYSTEM_BUCKET, quota_bytes)

    # -- reading ---------------------------------------------------------
    def events(self, entry_patterns=None):
        """System-event records DataFrame (optionally glob-filtered),
        queryable through QueryEngine like any records source."""
        df = self.store.read().where(F.col("bucket") == SYSTEM_BUCKET)
        if entry_patterns:
            from ..operators.glob import patterns_to_column
            df = df.where(patterns_to_column(list(entry_patterns),
                                             F.col("entry")))
        return df
