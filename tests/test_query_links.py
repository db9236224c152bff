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
