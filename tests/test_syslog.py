"""$system events bucket: usage / lifecycle diagnostics / log capture,
provisioned-bucket protection, FIFO retention, replication compression.
Reference: the 1.20-line syslog unification (PR-1496) with usage events
(PR-1474), lifecycle_run diagnostics (PR-1399/1470), log capture
(PR-1481), provisioned $system (PR-1557)."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from reductstore_spark.query import QueryEngine
from reductstore_spark.sources.lifecycle import LifecyclePolicy, run_delete_action
from reductstore_spark.sources.store import RecordStore
from reductstore_spark.sources.syslog import SYSTEM_BUCKET, SystemEventLog

SCHEMA = ("bucket string, entry string, ts long, payload binary, "
          "content_type string, state int, labels map<string,string>, "
          "computed_labels map<string,string>")

US_DAY = 86_400_000_000


def mk_store(spark, tmp_path, payload=b"x" * 64):
    store = RecordStore(spark, str(tmp_path / "s"))
    rows = [("b1", "e1", i * 1_000_000, payload, "", 1, {"k": str(i)}, {})
            for i in range(10)]
    rows += [("b2", "e2", i * 1_000_000, payload, "", 1, {}, {})
             for i in range(5)]
    store.write(spark.createDataFrame(rows, SCHEMA))
    return store


def test_usage_events_are_queryable_records(spark, tmp_path):
    store = mk_store(spark, tmp_path)
    log = SystemEventLog(store, instance="inst")
    assert log.log_usage(ts_us=123) == 3  # b1, b2, instance total

    ev = log.events()
    rows = {r["entry"]: r["labels"] for r in ev.collect()}
    assert rows["usage/inst/b1"]["record_count"] == "10"
    assert rows["usage/inst/b1"]["written_entries"] == "1"
    assert rows["usage/inst/b1"]["size"] == str(10 * 64)
    assert rows["usage/inst"]["record_count"] == "15"

    # the full condition language works over system events
    out = QueryEngine().query(
        ev, when={"$gt": [{"$cast": ["&record_count", "int"]}, 10]},
        ordered=False)
    assert [r["entry"] for r in out.collect()] == ["usage/inst"]

    # glob filtering on the event stream
    assert log.events(["usage/inst/*"]).count() == 2


def test_lifecycle_run_diagnostics(spark, tmp_path):
    store = mk_store(spark, tmp_path)
    log = SystemEventLog(store, instance="inst")
    policy = LifecyclePolicy(bucket="b1", older_than_us=0)
    removed = run_delete_action(store, policy, now_us=5_000_000, syslog=log)
    assert removed == 5  # ts < 5e6

    ev = log.events(["lifecycle_run/**"]).collect()
    assert len(ev) == 1
    lb = ev[0]["labels"]
    assert lb["action"] == "delete" and lb["status"] == "ok"
    assert lb["processed_records"] == "5"

    # failures carry status/message as the canonical metadata
    bad = LifecyclePolicy(bucket="b1", older_than_us=0,
                          when={"$unknown_op": [1]})
    with pytest.raises(Exception):
        run_delete_action(store, bad, now_us=9_000_000, syslog=log)
    err = [r for r in log.events(["lifecycle_run/**"]).collect()
           if r["labels"]["status"] == "error"]
    assert len(err) == 1 and err[0]["labels"]["message"]


def test_log_capture_respects_level(spark, tmp_path):
    store = mk_store(spark, tmp_path)
    log = SystemEventLog(store, instance="inst", log_level="WARN")
    assert log.log_message(1, "INFO", "noise") == 0   # below threshold
    assert log.log_message(2, "ERROR", "boom") == 1
    ev = log.events(["logs/**"]).collect()
    assert len(ev) == 1
    assert ev[0]["labels"]["level"] == "ERROR"
    assert bytes(ev[0]["payload"]) == b"boom"
    with pytest.raises(ValueError):
        SystemEventLog(store, log_level="NOPE")


def test_system_bucket_provisioned_and_quota(spark, tmp_path):
    store = mk_store(spark, tmp_path, payload=b"y" * 4096)
    log = SystemEventLog(store, instance="inst")
    # events across several days so FIFO has partitions to drop
    for day in range(4):
        log.emit([(f"logs/inst/messages", day * US_DAY + 1, {"level": "WARN"})],
                 payloads={0: b"z" * 2048})
    assert store.rename_bucket.__doc__  # sanity
    with pytest.raises(ValueError, match="provisioned"):
        store.rename_bucket(SYSTEM_BUCKET, "stolen")

    before = log.events().count()
    assert before == 4
    dropped = log.apply_quota(quota_bytes=4096)
    assert dropped >= 1
    after = log.events().count()
    assert after < before
    # newest event survives (FIFO drops oldest days first)
    remaining = [r["ts"] for r in log.events().collect()]
    assert 3 * US_DAY + 1 in remaining


def test_replication_compression_codec(spark, tmp_path):
    from reductstore_spark.streaming.replication import ReplicationSettings, \
        start_replication

    store = RecordStore(spark, str(tmp_path / "z"))
    rows = [("b", "e", 1, b"p", "", 1, {}, {})]
    store.write(spark.createDataFrame(rows, SCHEMA), compression="zstd")
    files = glob.glob(str(tmp_path / "z") + "/**/*.parquet", recursive=True)
    assert files and all(".zstd." in os.path.basename(f) for f in files), files
    back = store.read().collect()
    assert len(back) == 1 and bytes(back[0]["payload"]) == b"p"

    with pytest.raises(ValueError, match="compression"):
        start_replication(
            spark, str(tmp_path / "z"), str(tmp_path / "d"),
            ReplicationSettings(src_bucket="b", dst_bucket="b",
                                compression="lz77"),
            checkpoint=str(tmp_path / "ck"))


def test_replication_diagnostics_events(spark, tmp_path):
    """Replication runs emit per-batch diagnostics under
    replications/<instance>/<name> (PR-1417)."""
    from reductstore_spark.streaming.replication import (ReplicationSettings,
                                                         start_replication)

    src = RecordStore(spark, str(tmp_path / "src"))
    rows = [("b", "e", i, b"p", "", 1, {}, {}) for i in range(3)]
    src.write(spark.createDataFrame(rows, SCHEMA))
    log = SystemEventLog(src, instance="inst")
    q = start_replication(
        spark, str(tmp_path / "src"), str(tmp_path / "dst"),
        ReplicationSettings(src_bucket="b", dst_bucket="b"),
        checkpoint=str(tmp_path / "ck"), available_now=True,
        syslog=log, name="rep1")
    q.awaitTermination(120)
    ev = log.events(["replications/**"]).collect()
    assert ev, "no replication diagnostics emitted"
    lb = ev[0]["labels"]
    assert lb["status"] == "ok" and int(lb["records"]) == 3
    dst = RecordStore(spark, str(tmp_path / "dst"))
    assert dst.read().count() == 3
