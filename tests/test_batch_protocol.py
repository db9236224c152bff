"""Batch protocol v1/v2 codec (pure Python, no Spark).

Golden cases from reference tests (reduct_base/src/batch/v1.rs:102-120)
plus roundtrip properties for the v2 delta encoding."""

import pytest

from reductstore_spark.functions.batch_protocol import (
    EntryRecord,
    ProtocolError,
    RecordHeader,
    decode_batch_v2,
    decode_entry_name,
    encode_batch_v2,
    encode_entry_name,
    format_batched_header,
    parse_batched_header,
    sort_v1_headers,
)


class TestV1:
    def test_parse_golden(self):
        h = parse_batched_header("123, text/plain, label1=value1, label2=value2")
        assert h.content_length == 123
        assert h.content_type == "text/plain"
        assert h.labels == {"label1": "value1", "label2": "value2"}

    def test_parse_quoted_comma_value(self):
        h = parse_batched_header('10, text/plain, a="x,y", b=z')
        assert h.labels == {"a": "x,y", "b": "z"}

    def test_default_content_type(self):
        h = parse_batched_header("5, , a=1")
        assert h.content_type == "application/octet-stream"

    def test_roundtrip(self):
        orig = RecordHeader(42, "image/png", {"k": "v", "c": "a,b"})
        assert parse_batched_header(format_batched_header(orig)) == orig

    def test_invalid(self):
        with pytest.raises(ProtocolError):
            parse_batched_header("nocomma")
        with pytest.raises(ProtocolError):
            parse_batched_header("abc, text/plain")

    def test_sort_headers(self):
        hs = {"x-reduct-time-200": "b", "x-reduct-time-100": "a", "other": "x"}
        assert sort_v1_headers(hs) == [(100, "a"), (200, "b")]


class TestEntryNames:
    def test_roundtrip(self):
        # NB: '%' is a tchar in the reference encoder, so names containing
        # a literal '%' are not representable (same limitation upstream)
        for name in ["cam1", "cam1/front", "mötör/head", "a b"]:
            assert decode_entry_name(encode_entry_name(name)) == name

    def test_tchar_passthrough(self):
        assert encode_entry_name("abc-1.2_x") == "abc-1.2_x"
        assert encode_entry_name("a/b") == "a%2Fb"


class TestV2:
    RECORDS = [
        EntryRecord("cam1/front", 1000, RecordHeader(10, "image/jpeg", {"q": "90"})),
        EntryRecord("cam1/front", 2000, RecordHeader(11, "image/jpeg", {"q": "90"})),
        EntryRecord("cam1/front", 3000, RecordHeader(12, "image/jpeg",
                                                     {"q": "80", "new": "x,y"})),
        EntryRecord("logs", 1500, RecordHeader(5, "text/plain", {})),
        EntryRecord("logs", 2500, RecordHeader(6, "text/plain", {"lvl": "warn"})),
    ]

    def test_roundtrip(self):
        headers = encode_batch_v2(self.RECORDS)
        assert headers["x-reduct-start-ts"] == "1000"
        decoded = decode_batch_v2(headers)
        want = sorted(self.RECORDS, key=lambda r: (r.entry, r.timestamp))
        got = sorted(decoded, key=lambda r: (r.entry, r.timestamp))
        assert got == want

    def test_delta_reuse_compresses(self):
        headers = encode_batch_v2(self.RECORDS)
        # second cam1 record reuses content-type and labels: bare length
        assert headers["x-reduct-0-1000"] == "11"

    def test_label_unset(self):
        recs = [
            EntryRecord("e", 0, RecordHeader(1, "t", {"a": "1", "b": "2"})),
            EntryRecord("e", 1, RecordHeader(1, "t", {"a": "1"})),  # b removed
        ]
        decoded = decode_batch_v2(encode_batch_v2(recs))
        assert decoded[1].header.labels == {"a": "1"}

    def test_no_label_index_mode(self):
        decoded = decode_batch_v2(encode_batch_v2(self.RECORDS, use_label_index=False))
        assert sorted(decoded, key=lambda r: (r.entry, r.timestamp)) == \
            sorted(self.RECORDS, key=lambda r: (r.entry, r.timestamp))

    def test_missing_headers_rejected(self):
        with pytest.raises(ProtocolError):
            decode_batch_v2({"x-reduct-0-0": "1"})
