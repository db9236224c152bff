"""Lifecycle actions, namespace renames, quotas, single-record reads."""

import pytest
from pyspark.sql import functions as F

from reductstore_spark.query import QueryEngine
from reductstore_spark.schema import US_PER_DAY
from reductstore_spark.sources.lifecycle import (
    LifecyclePolicy,
    run_compress_action,
    run_delete_action,
)
from reductstore_spark.sources.store import QuotaExceeded, RecordStore

SCHEMA = ("bucket string, entry string, ts long, payload binary, "
          "content_type string, state int, labels map<string,string>, "
          "computed_labels map<string,string>")


def day_rows(entry, days, per_day=4):
    rows = []
    for d in days:
        for i in range(per_day):
            ts = d * US_PER_DAY + i * 1_000_000
            rows.append(("b1", entry, ts, b"x" * 64, "", 1,
                         {"i": str(i), "day": str(d)}, {}))
    return rows


@pytest.fixture()
def store(spark, tmp_path):
    s = RecordStore(spark, str(tmp_path / "store"))
    s.write(spark.createDataFrame(day_rows("e1", [0, 1, 2, 3]), SCHEMA))
    return s


def test_delete_action_older_than_with_when(spark, store):
    now = 4 * US_PER_DAY
    policy = LifecyclePolicy(bucket="b1", older_than_us=2 * US_PER_DAY,
                             when={"&i": {"$lt": 2}})
    would = run_delete_action(store, policy, now_us=now, dry_run=True)
    assert would == 4  # days 0,1 x i in {0,1}
    removed = run_delete_action(store, policy, now_us=now)
    assert removed == 4
    assert store.read().count() == 12


def test_compress_action_rewrites_old_partitions(spark, store):
    # add shadow versions on day 0 -> compaction should drop them
    store.write(spark.createDataFrame(day_rows("e1", [0]), SCHEMA))
    raw_before = spark.read.parquet(store.root).where(F.col("ts_day") == 0).count()
    assert raw_before == 8
    n = run_compress_action(store, "b1", older_than_us=2 * US_PER_DAY,
                            now_us=4 * US_PER_DAY)
    assert n == 2  # days 0 and 1
    raw_after = spark.read.parquet(store.root).where(F.col("ts_day") == 0).count()
    assert raw_after == 4
    assert store.read().count() == 16


def test_rename_entry(spark, store):
    store.rename_entry("b1", "e1", "e2")
    got = store.read()
    assert {r["entry"] for r in got.select("entry").distinct().collect()} == {"e2"}
    assert got.count() == 16
    with pytest.raises(ValueError):
        store.rename_entry("b1", "nope", "x")


def test_rename_bucket(spark, store):
    store.rename_bucket("b1", "b2")
    got = store.read()
    assert {r["bucket"] for r in got.select("bucket").distinct().collect()} == {"b2"}


def test_hard_quota_rejects(spark, store):
    big = spark.createDataFrame(day_rows("e1", [9]), SCHEMA)
    with pytest.raises(QuotaExceeded):
        store.write_with_quota(big, quota_type="HARD", quota_bytes=10)
    # generous quota passes
    store.write_with_quota(big, quota_type="NONE")
    assert store.read().count() == 20


def test_read_one(spark, store):
    qe = QueryEngine()
    rec = qe.read_one(store.read(), "b1", "e1", ts=2 * US_PER_DAY).collect()
    assert len(rec) == 1 and rec[0]["labels"]["day"] == "2"
    latest = qe.read_one(store.read(), "b1", "e1").collect()
    assert latest[0]["ts"] == 3 * US_PER_DAY + 3_000_000
    missing = qe.read_one(store.read(), "b1", "e1", ts=12345).collect()
    assert missing == []


def test_lifecycle_delete_entry_globs(spark, tmp_path):
    """PR-1526 parity: lifecycle task filters accept glob-like entry
    patterns including exclusions — only matching entries are deleted."""
    from reductstore_spark.sources.lifecycle import (LifecyclePolicy,
                                                     run_delete_action)

    store = RecordStore(spark, str(tmp_path / "s"))
    B = 1_700_000_000_000_000
    rows = []
    for entry in ["cam1/front", "cam2/front", "logs"]:
        rows += [("b1", entry, B + i * 1_000_000, None, "", 1, {}, {})
                 for i in range(3)]
    store.write(spark.createDataFrame(rows, SCHEMA))

    policy = LifecyclePolicy(bucket="b1", older_than_us=1,
                             entries=["cam*", "!cam2/**"])
    n = run_delete_action(store, policy, now_us=B + 10_000_000_000)
    assert n == 3  # only cam1/front's records
    left = {(r["entry"], r["ts"]) for r in
            store.read().select("entry", "ts").collect()}
    assert {e for e, _ in left} == {"cam2/front", "logs"}
    assert len(left) == 6
