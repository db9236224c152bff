"""Signed query links: roundtrip, tamper rejection, expiry."""

import pytest

from reductstore_spark.functions.query_links import (
    LinkError,
    create_query_link,
    parse_query_link,
)

SECRET = b"test-secret"
QUERY = {"entries": ["cam*"], "when": {"&v": {"$gt": 5}}, "start": 100}


def test_roundtrip():
    tok = create_query_link(QUERY, expire_at_us=10_000, secret=SECRET)
    assert parse_query_link(tok, SECRET, now_us=9_999) == QUERY


def test_expired():
    tok = create_query_link(QUERY, expire_at_us=10_000, secret=SECRET)
    with pytest.raises(LinkError, match="expired"):
        parse_query_link(tok, SECRET, now_us=10_000)


def test_tampered_signature():
    tok = create_query_link(QUERY, expire_at_us=10_000, secret=SECRET)
    body, sig = tok.split(".")
    with pytest.raises(LinkError, match="signature"):
        parse_query_link(body + "." + sig[:-2] + "xx", SECRET, now_us=0)
    with pytest.raises(LinkError, match="signature"):
        parse_query_link(tok, b"other-secret", now_us=0)


def test_malformed():
    with pytest.raises(LinkError):
        parse_query_link("garbage", SECRET, now_us=0)


def test_record_link_strict_identity(spark):
    """Single-record links pin the record by (entry, timestamp) identity
    — no index-based selection (1.19.2 / PR-1334)."""
    from reductstore_spark.functions.query_links import (
        LinkError, create_query_link, parse_query_link_full,
        resolve_link_record)

    rows = [("b", "e1", 10, b"a", "", 1, {}, {}),
            ("b", "e1", 20, b"b", "", 1, {}, {})]
    df = spark.createDataFrame(
        rows, "bucket string, entry string, ts long, payload binary, "
              "content_type string, state int, labels map<string,string>, "
              "computed_labels map<string,string>")
    secret = b"k"
    tok = create_query_link({}, 1000, secret, record_entry="e1",
                            record_timestamp=20)
    payload = parse_query_link_full(tok, secret, now_us=5)
    assert payload["rec"] == {"entry": "e1", "ts": 20}
    got = resolve_link_record(df, "b", tok, secret, now_us=5).collect()
    assert len(got) == 1 and bytes(got[0]["payload"]) == b"b"

    with pytest.raises(LinkError, match="both"):
        create_query_link({}, 1000, secret, record_entry="e1")
    plain = create_query_link({"when": {}}, 1000, secret)
    with pytest.raises(LinkError, match="record link"):
        resolve_link_record(df, "b", plain, secret, now_us=5)
