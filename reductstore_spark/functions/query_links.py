"""Shareable signed query links.

Mirrors the reference's query-link surface (reference:
reduct_base/src/msg/query_link_api.rs:10-44, api/http/links/): a link
wraps a query spec (bucket, entry, QueryEntry JSON) plus an expiry,
signed so the server can hand out time-limited read access without a
token.  Serving-layer shim: the payload feeds QueryEngine.query directly.
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
from typing import Optional


class LinkError(ValueError):
    pass


def create_query_link(query: dict, expire_at_us: int, secret: bytes,
                      record_entry: Optional[str] = None,
                      record_timestamp: Optional[int] = None) -> str:
    """Sign {query, expire_at_us[, record identity]} into a URL-safe token.

    Single-record links carry a strict record identity — BOTH
    ``record_entry`` and ``record_timestamp`` (1.19.2 / PR-1334 removed
    index-based link selection: the record a link serves must be pinned
    by identity, not by its position in a result set)."""
    payload = {"q": query, "exp": int(expire_at_us)}
    if (record_entry is None) != (record_timestamp is None):
        raise LinkError(
            "Record links require both record_entry and record_timestamp")
    if record_entry is not None:
        payload["rec"] = {"entry": record_entry,
                          "ts": int(record_timestamp)}
    body = json.dumps(payload, sort_keys=True,
                      separators=(",", ":")).encode()
    sig = hmac.new(secret, body, hashlib.sha256).digest()
    return (base64.urlsafe_b64encode(body).decode().rstrip("=") + "." +
            base64.urlsafe_b64encode(sig).decode().rstrip("="))


def parse_query_link(token: str, secret: bytes, now_us: int) -> dict:
    """Verify signature + expiry; returns the query spec dict."""
    return parse_query_link_full(token, secret, now_us)["q"]


def parse_query_link_full(token: str, secret: bytes, now_us: int) -> dict:
    """Verify signature + expiry; returns the whole payload
    ({"q": query, "exp": µs[, "rec": {"entry", "ts"}]})."""
    try:
        body_b64, sig_b64 = token.split(".", 1)
        body = base64.urlsafe_b64decode(body_b64 + "=" * (-len(body_b64) % 4))
        sig = base64.urlsafe_b64decode(sig_b64 + "=" * (-len(sig_b64) % 4))
    except Exception:
        raise LinkError("Malformed query link")
    want = hmac.new(secret, body, hashlib.sha256).digest()
    if not hmac.compare_digest(sig, want):
        raise LinkError("Invalid query link signature")
    payload = json.loads(body)
    if now_us >= payload["exp"]:
        raise LinkError("Query link expired")
    return payload


def resolve_link_record(records, bucket: str, token: str, secret: bytes,
                        now_us: int):
    """Serve a single-record link: the record is selected strictly by
    its (entry, timestamp) identity from the link payload."""
    from ..query import QueryEngine

    payload = parse_query_link_full(token, secret, now_us)
    rec = payload.get("rec")
    if rec is None:
        raise LinkError("Not a record link")
    return QueryEngine().read_one(records, bucket, rec["entry"],
                                  ts=int(rec["ts"]))
