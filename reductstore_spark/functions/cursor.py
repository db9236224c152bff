"""Query-cursor serving shim: query id -> live result iterator with TTL.

Completes the HTTP-parity surface started by ``batch_protocol`` (wire
codec) and ``query_links`` (signed handles): the reference registers
every query in a per-entry handle map keyed by a process-wide monotonic
id and serves it record-by-record or batch-by-batch until the iterator
drains or the handle's TTL lapses (reference: storage/entry.rs:150-212
``query``/``get_query_receiver``, storage/query.rs:33-35
``next_query_id``, entry.rs:416-429 ``remove_expired_query``,
api/http/entry/read_batched.rs:120-226 batch paging limits).

Spark mapping: the handle wraps ``df.toLocalIterator(prefetchPartitions
=True)`` — partitions stream into the serving process one at a time (the
analogue of the reference's spawned query task feeding a bounded
channel), so a cursor over a 100 TB result holds one partition of rows,
never the whole result.  Expiry is lazy-on-access exactly like the
reference (no background reaper); ``last_access`` refreshes on every
successful lookup, so an actively-consumed cursor never expires.
"""

from __future__ import annotations

import itertools
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, Iterator, List, Optional, Tuple

from .batch_protocol import EntryRecord, RecordHeader, format_batched_header

DEFAULT_TTL_S = 60.0          # QueryOptions::default (query/base.rs:84)


@dataclass(frozen=True)
class IoSettings:
    """Batch paging limits (cfg/io.rs:9-13 defaults)."""
    batch_max_size: int = 8_000_000
    batch_max_records: int = 85
    batch_max_metadata_size: int = 512_000
    batch_timeout_s: float = 5.0


class QueryError(Exception):
    status = 500


class UnprocessableEntity(QueryError):
    """422 — malformed #batch_* directive value (io_cfg.rs errors)."""
    status = 422


class QueryNotFound(QueryError):
    """404 — unknown or TTL-expired query id."""
    status = 404


class NoContent(QueryError):
    """204 — the cursor is drained (read_batched.rs:207)."""
    status = 204


_SIZE_UNITS = {
    "": 1, "b": 1,
    "kb": 1000, "mb": 1000**2, "gb": 1000**3, "tb": 1000**4, "pb": 1000**5,
    "kib": 1024, "mib": 1024**2, "gib": 1024**3, "tib": 1024**4,
    "pib": 1024**5,
}


def _parse_size(directive: str, values, default: int) -> int:
    """Single int, or a ByteSize string like '1MB'/'4KiB' (decimal SI vs
    binary units, case-insensitive — bytesize::ByteSize::from_str)."""
    if values is None:
        return default
    if len(values) != 1:
        raise UnprocessableEntity(
            f"{directive} must be a single integer or string value")
    from ..condition import values as V
    v = values[0]
    if v.kind == V.INT and v.val >= 0:
        return int(v.val)
    if v.kind == V.STRING:
        import re
        m = re.fullmatch(r"\s*(\d+(?:\.\d+)?)\s*([a-zA-Z]*)\s*", v.val)
        unit = _SIZE_UNITS.get(m.group(2).lower()) if m else None
        if unit is None:
            raise UnprocessableEntity(
                f"{directive} must be a positive integer or string")
        return int(float(m.group(1)) * unit)
    raise UnprocessableEntity(
        f"{directive} must be a positive integer or string "
        "representing a positive integer")


def _parse_duration_s(directive: str, values, default: float) -> float:
    """Bare ints are SECONDS, duration literals ('15ms') are exact µs
    (io_cfg.rs parse_duration)."""
    if values is None:
        return default
    if len(values) != 1:
        raise UnprocessableEntity(
            f"{directive} must be a single integer or duration value")
    from ..condition import values as V
    v = values[0]
    if v.kind == V.INT and v.val >= 0:
        return float(v.val)
    if v.kind == V.DURATION and v.val >= 0:
        return v.val / 1e6
    raise UnprocessableEntity(
        f"{directive} must be a positive integer or duration")


def _parse_number(directive: str, values, default: int) -> int:
    if values is None:
        return default
    if len(values) != 1:
        raise UnprocessableEntity(
            f"{directive} must be a single integer value")
    from ..condition import values as V
    v = values[0]
    if v.kind == V.INT and v.val >= 0:
        return int(v.val)
    raise UnprocessableEntity(f"{directive} must be a positive integer")


def io_settings_from_directives(directives,
                                default: Optional[IoSettings] = None,
                                ) -> IoSettings:
    """Merge a query's ``#batch_*`` transport directives over the process
    defaults (filters/when/io_cfg.rs merge_io_config_from_directives):
    ``#batch_size``/``#batch_metadata_size`` accept ints or ByteSize
    strings, ``#batch_timeout`` ints-as-seconds or duration literals,
    ``#batch_records`` a plain count.  ``#record_timeout``/``#io_timeout``
    are parsed for validation parity but have no Spark-side effect (the
    iterator has no per-record channel recv to time out)."""
    d = default or IoSettings()
    g = directives.get
    out = IoSettings(
        batch_max_size=_parse_size(
            "#batch_size", g("#batch_size"), d.batch_max_size),
        batch_max_records=_parse_number(
            "#batch_records", g("#batch_records"), d.batch_max_records),
        batch_max_metadata_size=_parse_size(
            "#batch_metadata_size", g("#batch_metadata_size"),
            d.batch_max_metadata_size),
        batch_timeout_s=_parse_duration_s(
            "#batch_timeout", g("#batch_timeout"), d.batch_timeout_s),
    )
    _parse_duration_s("#record_timeout", g("#record_timeout"), 1.0)
    _parse_duration_s("#io_timeout", g("#io_timeout"), 1.0)
    return out


_id_lock = threading.Lock()
_ids = itertools.count(1)  # 0 may confuse with false (query.rs:34)


def next_query_id() -> int:
    with _id_lock:
        return next(_ids)


def row_to_record(row) -> Tuple[EntryRecord, bytes]:
    """Default records-schema row -> (wire record, payload) mapping."""
    labels = dict(row["labels"] or {}) if "labels" in row.__fields__ else {}
    if "computed_labels" in row.__fields__ and row["computed_labels"]:
        labels.update({f"@{k}": v for k, v in row["computed_labels"].items()})
    payload = (bytes(row["payload"])
               if "payload" in row.__fields__ and row["payload"] is not None
               else b"")
    ct = (row["content_type"] if "content_type" in row.__fields__ and
          row["content_type"] else "application/octet-stream")
    rec = EntryRecord(
        entry=row["entry"], timestamp=int(row["ts"]),
        header=RecordHeader(len(payload), ct, labels))
    return rec, payload


@dataclass
class _Handle:
    it: Iterator
    ttl: float
    last_access: float
    io: IoSettings = field(default_factory=IoSettings)
    convert: Callable = row_to_record


class QueryRegistry:
    """id -> cursor map with lazy TTL expiry; one per serving process.

    ``clock`` is injectable so expiry is unit-testable without sleeps.
    """

    def __init__(self, clock: Callable[[], float] = time.monotonic):
        self._clock = clock
        self._lock = threading.Lock()
        self._handles: Dict[int, _Handle] = {}

    # -- lifecycle --------------------------------------------------------
    def register(self, df, ttl: float = DEFAULT_TTL_S,
                 io: Optional[IoSettings] = None,
                 convert: Callable = row_to_record) -> int:
        """Start serving ``df``; returns the (monotonic) query id."""
        qid = next_query_id()
        it = df.toLocalIterator(prefetchPartitions=True)
        with self._lock:
            self._handles[qid] = _Handle(
                it=it, ttl=float(ttl), last_access=self._clock(),
                io=io or IoSettings(), convert=convert)
        return qid

    def remove_expired(self) -> None:
        """Drop every handle idle >= its TTL (entry.rs:416-429; runs
        before each lookup, so a ttl=0 query 404s on first fetch —
        integration_tests/.../query_test.py::test_query_ttl)."""
        now = self._clock()
        with self._lock:
            dead = [q for q, h in self._handles.items()
                    if now - h.last_access >= h.ttl]
            for q in dead:
                del self._handles[q]

    def remove(self, qid: int) -> bool:
        with self._lock:
            return self._handles.pop(qid, None) is not None

    def __len__(self) -> int:
        with self._lock:
            return len(self._handles)

    def _get(self, qid: int) -> _Handle:
        self.remove_expired()
        with self._lock:
            h = self._handles.get(qid)
            if h is None:
                raise QueryNotFound(
                    f"Query {qid} not found and it might have expired. "
                    "Check TTL in your query request.")
            h.last_access = self._clock()
            return h

    # -- consumption ------------------------------------------------------
    def fetch_record(self, qid: int) -> Tuple[EntryRecord, bytes]:
        """Next single record (GET ?q=<id>); NoContent when drained."""
        h = self._get(qid)
        try:
            return h.convert(next(h.it))
        except StopIteration:
            # a drained handle stays registered until its TTL lapses
            # (entry.rs test keep_finished_query_until_ttl): repeated
            # fetches keep answering 204, never 404
            raise NoContent("No more records")

    def fetch_batch(self, qid: int, head_only: bool = False,
                    ) -> Tuple[Dict[str, str], List[bytes], bool]:
        """Next page (GET /batch?q=<id>): ``(headers, payloads, last)``.

        Appends records and breaks once any limit trips — record count,
        body bytes (skipped for HEAD), metadata bytes, or elapsed time —
        mirroring the fetch loop of read_batched.rs:141-194 (limits are
        checked AFTER appending, so a page may exceed a limit by the
        record that tripped it, exactly as the reference does).
        ``last`` means the cursor drained inside this page.
        """
        h = self._get(qid)
        io = h.io
        t0 = self._clock()
        headers: Dict[str, str] = {}
        payloads: List[bytes] = []
        header_size = body_size = 0
        last = False
        while True:
            try:
                rec, payload = h.convert(next(h.it))
            except StopIteration:
                last = True
                break
            name = f"x-reduct-time-{rec.timestamp}"
            value = format_batched_header(rec.header)
            headers[name] = value
            payloads.append(payload)
            header_size += len(name) + len(value) + 2
            body_size += rec.header.content_length
            if (header_size > io.batch_max_metadata_size
                    or (not head_only and body_size > io.batch_max_size)
                    or len(payloads) >= io.batch_max_records
                    or self._clock() - t0 > io.batch_timeout_s):
                break
        if last and not payloads:
            # drained handle is kept until TTL (see fetch_record)
            raise NoContent("No more records")
        return headers, payloads, last
