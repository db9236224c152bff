"""Query-cursor serving shim: id monotonicity, TTL expiry, batch paging.

Mirrors the reference's integration_tests/api/entry_api/query_test.py
(test_query_entry_ok / _next / _ttl) and the entry.rs unit test
keep_finished_query_until_ttl, with an injected clock instead of sleeps.
"""

import pytest

from reductstore_spark.functions.cursor import (
    IoSettings,
    NoContent,
    QueryNotFound,
    QueryRegistry,
)
from reductstore_spark.schema import RECORDS_SCHEMA, STATE_FINISHED


def _records(spark, n=3, payload=b"some_data"):
    rows = [
        ("b", "entry", 1000 + 100 * i, bytearray(payload), "text/plain",
         STATE_FINISHED, {"k": f"v{i}"}, {"score": str(i)})
        for i in range(n)
    ]
    return spark.createDataFrame(rows, RECORDS_SCHEMA).coalesce(1).orderBy("ts")


class Clock:
    def __init__(self):
        self.now = 0.0

    def __call__(self):
        return self.now


def test_query_ids_increment(spark):
    reg = QueryRegistry()
    df = _records(spark, 1)
    ids = [reg.register(df) for _ in range(3)]
    assert ids == sorted(ids) and len(set(ids)) == 3
    assert ids[0] >= 1  # 0 is reserved (query.rs:34)


def test_fetch_record_sequence_then_no_content(spark):
    """test_query_entry_next: records stream in ts order, then 204 —
    repeatedly, since a drained handle survives until TTL."""
    reg = QueryRegistry()
    qid = reg.register(_records(spark, 3))
    seen = []
    for _ in range(3):
        rec, payload = reg.fetch_record(qid)
        assert payload == b"some_data"
        assert rec.header.labels["k"].startswith("v")
        assert rec.header.labels["@score"] == rec.header.labels["k"][1:]
        seen.append(rec.timestamp)
    assert seen == [1000, 1100, 1200]
    for _ in range(2):
        with pytest.raises(NoContent):
            reg.fetch_record(qid)
    assert len(reg) == 1  # still registered (keep_finished_query_until_ttl)


def test_zero_ttl_expires_immediately(spark):
    """test_query_ttl: ttl=0 means the first fetch already 404s."""
    clock = Clock()
    reg = QueryRegistry(clock=clock)
    qid = reg.register(_records(spark, 1), ttl=0)
    with pytest.raises(QueryNotFound):
        reg.fetch_record(qid)
    assert len(reg) == 0


def test_ttl_expiry_and_refresh(spark):
    clock = Clock()
    reg = QueryRegistry(clock=clock)
    qid = reg.register(_records(spark, 3), ttl=10.0)

    clock.now = 9.0
    reg.fetch_record(qid)          # refreshes last_access
    clock.now = 18.0               # 9s since last access: alive
    reg.fetch_record(qid)
    clock.now = 28.5               # 10.5s idle: expired
    with pytest.raises(QueryNotFound):
        reg.fetch_record(qid)
    assert len(reg) == 0


def test_drained_handle_kept_until_ttl(spark):
    """keep_finished_query_until_ttl (entry.rs:805-855): a finished query
    answers 204 until the TTL lapses, 404 after."""
    clock = Clock()
    reg = QueryRegistry(clock=clock)
    qid = reg.register(_records(spark, 1), ttl=1.0)
    reg.fetch_record(qid)
    clock.now = 0.5
    with pytest.raises(NoContent):
        reg.fetch_record(qid)
    clock.now = 2.0
    with pytest.raises(QueryNotFound):
        reg.fetch_record(qid)


def test_batch_paging_record_limit(spark):
    reg = QueryRegistry()
    io = IoSettings(batch_max_records=2)
    qid = reg.register(_records(spark, 5), io=io)

    headers, payloads, last = reg.fetch_batch(qid)
    assert len(payloads) == 2 and not last
    assert set(headers) == {"x-reduct-time-1000", "x-reduct-time-1100"}
    assert headers["x-reduct-time-1000"].startswith("9, text/plain")

    _, payloads, last = reg.fetch_batch(qid)
    assert len(payloads) == 2 and not last

    _, payloads, last = reg.fetch_batch(qid)
    assert len(payloads) == 1 and last  # drained inside this page

    with pytest.raises(NoContent):
        reg.fetch_batch(qid)


def test_batch_paging_body_size_limit(spark):
    """Limits are checked AFTER appending (read_batched.rs:186-194): the
    record that trips batch_max_size stays in the page."""
    # frozen clock: batch_timeout_s must not trip the page under machine
    # load (it did once in a loaded full-suite run) — this test is about
    # the SIZE limit only
    reg = QueryRegistry(clock=Clock())
    io = IoSettings(batch_max_size=10)  # each payload is 9 bytes
    qid = reg.register(_records(spark, 3), io=io)
    _, payloads, last = reg.fetch_batch(qid)
    assert len(payloads) == 2 and not last  # 9 ok, 18 > 10 trips after append
    _, payloads, last = reg.fetch_batch(qid)
    assert len(payloads) == 1 and last


def test_batch_head_only_ignores_body_limit(spark):
    reg = QueryRegistry()
    io = IoSettings(batch_max_size=1)
    qid = reg.register(_records(spark, 3), io=io)
    headers, payloads, last = reg.fetch_batch(qid, head_only=True)
    assert len(payloads) == 3 and last


def test_batch_metadata_size_limit(spark):
    reg = QueryRegistry(clock=Clock())  # size limit only, not timeout
    io = IoSettings(batch_max_metadata_size=40)  # one header is ~45 bytes
    qid = reg.register(_records(spark, 3), io=io)
    _, payloads, last = reg.fetch_batch(qid)
    assert len(payloads) == 1 and not last


def test_io_settings_from_directives():
    """Mirrors io_cfg.rs test_merge_io_config_from_directives: ints pass
    through, '15ms' is an exact duration, '1MB' is decimal-SI bytes."""
    from reductstore_spark.condition.parser import parse_when
    from reductstore_spark.functions.cursor import io_settings_from_directives

    _, dirs = parse_when({
        "#batch_size": 2048,
        "#batch_timeout": "15ms",
        "#batch_records": 100,
        "#batch_metadata_size": "1MB",
        "#io_timeout": 30,
    })
    io = io_settings_from_directives(dirs, IoSettings(
        batch_max_size=1024, batch_max_records=50,
        batch_max_metadata_size=512, batch_timeout_s=5.0))
    assert io.batch_max_size == 2048
    assert io.batch_timeout_s == 0.015
    assert io.batch_max_records == 100
    assert io.batch_max_metadata_size == 1_000_000


def test_io_settings_defaults_and_kib():
    from reductstore_spark.condition.parser import parse_when
    from reductstore_spark.functions.cursor import io_settings_from_directives

    _, dirs = parse_when({"#batch_size": "4KiB"})
    io = io_settings_from_directives(dirs)
    assert io.batch_max_size == 4096
    assert io.batch_max_records == 85          # cfg/io.rs defaults
    assert io.batch_max_metadata_size == 512_000
    assert io.batch_timeout_s == 5.0


def test_io_settings_invalid_values():
    from reductstore_spark.condition.parser import parse_when
    from reductstore_spark.functions.cursor import (
        UnprocessableEntity,
        io_settings_from_directives,
    )

    _, dirs = parse_when({"#batch_size": 2.5})
    with pytest.raises(UnprocessableEntity):
        io_settings_from_directives(dirs)
    _, dirs = parse_when({"#batch_records": "many"})
    with pytest.raises(UnprocessableEntity):
        io_settings_from_directives(dirs)
    _, dirs = parse_when({"#batch_timeout": "soon"})
    with pytest.raises(UnprocessableEntity):
        io_settings_from_directives(dirs)


def _multi_part_records(spark, n=40, parts=8):
    rows = [
        ("b", "entry", 1000 + 100 * i, bytearray(b"p%d" % i), "text/plain",
         STATE_FINISHED, {"k": f"v{i}"}, {})
        for i in range(n)
    ]
    return (spark.createDataFrame(rows, RECORDS_SCHEMA)
            .repartition(parts).sortWithinPartitions("ts"))


def test_two_cursors_interleaved_over_multipartition_result(spark):
    """toLocalIterator holds one partition at a time; two concurrently
    registered cursors over multi-partition results must drain fully and
    independently under interleaved fetches (round-2 verdict #7, mirrors
    query_test.py cursor cases)."""
    clock = Clock()
    reg = QueryRegistry(clock=clock)
    df = _multi_part_records(spark, n=40, parts=8).orderBy("ts")
    qa = reg.register(df, ttl=600)
    qb = reg.register(df, ttl=600)
    got_a, got_b = [], []
    for i in range(40):
        rec_a, _ = reg.fetch_record(qa)
        got_a.append(rec_a.timestamp)
        rec_b, _ = reg.fetch_record(qb)
        got_b.append(rec_b.timestamp)
    want = [1000 + 100 * i for i in range(40)]
    assert got_a == want and got_b == want
    with pytest.raises(NoContent):
        reg.fetch_record(qa)
    with pytest.raises(NoContent):
        reg.fetch_record(qb)


def test_ttl_expiry_mid_drain_other_cursor_survives(spark):
    """A cursor expiring mid-drain 404s on next touch; a fresher cursor
    over the same result keeps draining from its own position."""
    clock = Clock()
    reg = QueryRegistry(clock=clock)
    df = _multi_part_records(spark, n=12, parts=4).orderBy("ts")
    old = reg.register(df, ttl=10)
    clock.now = 5.0
    fresh = reg.register(df, ttl=100)
    for _ in range(3):
        reg.fetch_record(old)
        reg.fetch_record(fresh)
    clock.now = 16.0  # old's ttl lapsed (fetches refresh from their time)
    with pytest.raises(QueryNotFound):
        reg.fetch_record(old)
    remaining = []
    while True:
        try:
            rec, _ = reg.fetch_record(fresh)
        except NoContent:
            break
        remaining.append(rec.timestamp)
    assert remaining == [1000 + 100 * i for i in range(3, 12)]
