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


def create_query_link(query: dict, expire_at_us: int, secret: bytes) -> str:
    """Sign {query, expire_at_us} into a URL-safe token."""
    body = json.dumps({"q": query, "exp": int(expire_at_us)},
                      sort_keys=True, separators=(",", ":")).encode()
    sig = hmac.new(secret, body, hashlib.sha256).digest()
    return (base64.urlsafe_b64encode(body).decode().rstrip("=") + "." +
            base64.urlsafe_b64encode(sig).decode().rstrip("="))


def parse_query_link(token: str, secret: bytes, now_us: int) -> dict:
    """Verify signature + expiry; returns the query spec dict."""
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
    return payload["q"]
