"""Zenoh API: pub/sub ingest + queryable reads over a fixed bucket.

Mirrors the reference's minimal Zenoh integration (single-bucket mode):

* runtime spawn / disabled-by-default gate  — ``api/zenoh.rs:24-41``
* subscriber pipeline (sample -> record)    — ``api/zenoh/subscriber.rs:23-143``
* queryable pipeline (selector -> records)  — ``api/zenoh/queryable.rs:25-216``
* session orchestration, config + credential
  injection, reply building, NTP64 rules    — ``api/zenoh/session.rs:41-770``
* JSON attachment codecs                    — ``api/zenoh/attachments.rs:8-27``
* env-var config surface + defaults         — ``cfg/zenoh.rs`` (RS_ZENOH_*)

What the engine owns — key-expression routing, label-attachment codecs,
label merge order, timestamp derivation (NTP64 labels preferred, record
microseconds + fallback source id otherwise), selector parameter parsing
with the reference's exact error strings, batched reply streaming, bucket
auto-create, and the disabled/enabled gate — is implemented in full and
tested.  The one thing NOT implemented is the Zenoh *wire protocol*: in
the reference that lives entirely inside the ``zenoh`` crate (TCP/TLS
transport, scouting, routing).  Here the transport is
:class:`InProcZenohSession`, an in-process bus with the same
``declare_subscriber`` / ``declare_queryable`` / ``put`` / ``get``
surface; a networked deployment would swap it for the ``zenoh-python``
library (``eclipse-zenoh`` on PyPI, absent from this container) behind
the identical ``Sample`` / ``Query`` / ``Reply`` shapes.

**Wire-seam conformance map** (checked by the import-gated
``test_zenoh_python_wire_seam_conformance`` wherever ``zenoh`` is
installed — same pattern as the transformWithStateInPandas protobuf
gate):

====================================  =======================================
this module (in-proc seam)            ``zenoh-python`` (eclipse-zenoh 1.x)
====================================  =======================================
``InProcZenohSession()``              ``zenoh.open(zenoh.Config…)``
``.declare_subscriber(ke, handler)``  ``Session.declare_subscriber(ke,
                                      handler)``
``.declare_queryable(ke, handler,     ``Session.declare_queryable(ke,
allowed_origin=…)``                   handler)`` + ``allowed_origin`` on the
                                      builder (Rust) / kwargs
``.put(ke, payload, encoding=…,       ``Session.put(ke, payload,
attachment=…, timestamp=…)``          encoding=…, attachment=…)``; the
                                      sample timestamp comes from the
                                      session's HLC (the reference stamps
                                      replies explicitly, session.rs:700+)
``.get(selector, attachment=…)``      ``Session.get(selector,
→ ``List[Reply | ReplyError]``        attachment=…)`` → receiver of
                                      ``zenoh.Reply`` (``.ok``/``.err``)
``.undeclare(handle)`` / ``.close()`` ``Subscriber/Queryable.undeclare()``
                                      / ``Session.close()``
``Sample(key_expr, payload,           ``zenoh.Sample`` fields
encoding, attachment, timestamp)``    ``.key_expr .payload .encoding
                                      .attachment .timestamp``
``Query(key_expr, params,             ``zenoh.Query`` ``.key_expr``
attachment)``; handler RETURNS the    ``.parameters .attachment``; replies
reply list                            are PUSHED via ``Query.reply(ke,
                                      payload, encoding=…, attachment=…,
                                      timestamp=…)`` / ``Query.reply_err``
``Reply(key_expr, payload, encoding,  the ``Sample`` inside ``Reply.ok``
attachment, timestamp)``              (same five fields)
``ReplyError(payload)``               ``Reply.err`` → ``ReplyError.payload``
``ZenohTimestamp`` (NTP64 ↔ µs)       ``zenoh.Timestamp`` (NTP64; a zenoh
                                      ``TimestampId`` replaces the bare
                                      ``source_id`` int here)
====================================  =======================================

The two deliberate shape differences, both at the swap layer and
invisible to the engine: (1) queryable handlers here *return* the reply
list while zenoh pushes replies through ``Query.reply`` — the swap
wraps the returned list in that callback; (2) ``get`` here returns an
eager list while zenoh hands back a receiver to drain.

Spark stays the storage/query engine: every ingested sample lands in the
partitioned :class:`~reductstore_spark.sources.store.RecordStore` (so the
tailing replication stream picks it up without an explicit notify — the
reference's ``notify_replication``, subscriber.rs:105-127, maps to
Structured Streaming's source offset tracking), and every queryable read
is a :class:`~reductstore_spark.query.QueryEngine` plan with the time
range and ``when`` condition pushed into the Parquet scan.
"""

from __future__ import annotations

import json
import logging
import os
import re
import tempfile
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

log = logging.getLogger(__name__)

DEFAULT_BUCKET = "zenoh"

# labels the subscriber attaches when a sample carries a Zenoh timestamp,
# and the reply builder prefers when answering (session.rs:709-710)
ZENOH_TS_LABEL = "zenoh_ts_ntp64"
ZENOH_SOURCE_ID_LABEL = "zenoh_source_id"
FALLBACK_ZENOH_SOURCE_ID = 1  # session.rs:711

_LOCALITIES = ("SessionLocal", "Remote", "Any")


class InvalidZenohConfig(Exception):
    """SessionError::InvalidConfig (session.rs:779, Display ':790')."""

    def __str__(self):  # match the reference Display prefix
        return f"Invalid Zenoh configuration: {self.args[0]}"


class IngestError(Exception):
    """Subscriber-side storage failure (subscriber.rs:145-158)."""

    def __str__(self):
        return f"Storage error: {self.args[0]}"


class QueryError(Exception):
    """Queryable-side failure; ``kind`` is 'storage' or 'param'
    (queryable.rs:126-140)."""

    def __init__(self, message: str, kind: str = "storage"):
        super().__init__(message)
        self.kind = kind

    def __str__(self):
        if self.kind == "storage":
            return f"Storage error: {self.args[0]}"
        return str(self.args[0])


# ---------------------------------------------------------------------------
# configuration (cfg/zenoh.rs)
# ---------------------------------------------------------------------------

@dataclass
class ZenohApiConfig:
    """RS_ZENOH_* environment surface (cfg/zenoh.rs docstring).

    ``enabled`` defaults to False — ``spawn_runtime`` returns ``None``
    for a default config, exactly like the reference (zenoh.rs:28-30).
    """

    enabled: bool = False
    config_inline: Optional[str] = None
    config_path: Optional[str] = None
    bucket: str = DEFAULT_BUCKET
    sub_keyexprs: Optional[str] = None
    query_keyexprs: Optional[str] = None
    query_locality: str = "Any"
    tls_root_ca_cert: Optional[str] = None
    tls_connect_cert: Optional[str] = None
    tls_connect_key: Optional[str] = None
    auth_dictionary: Optional[str] = None

    @classmethod
    def from_env(cls, env=None) -> "ZenohApiConfig":
        env = os.environ if env is None else env

        def get(name):
            v = env.get(name)
            return v if v not in (None, "") else None

        locality = get("RS_ZENOH_QUERY_LOCALITY") or "Any"
        return cls(
            enabled=str(env.get("RS_ZENOH_ENABLED", "")).strip().lower()
            in ("1", "true", "yes"),
            config_inline=get("RS_ZENOH_CONFIG"),
            config_path=get("RS_ZENOH_CONFIG_PATH"),
            bucket=get("RS_ZENOH_BUCKET") or DEFAULT_BUCKET,
            sub_keyexprs=get("RS_ZENOH_SUB_KEYEXPRS"),
            query_keyexprs=get("RS_ZENOH_QUERY_KEYEXPRS"),
            query_locality=parse_locality(locality),
            tls_root_ca_cert=get("RS_ZENOH_TLS_ROOT_CA"),
            tls_connect_cert=get("RS_ZENOH_TLS_CONNECT_CERT"),
            tls_connect_key=get("RS_ZENOH_TLS_CONNECT_KEY"),
            auth_dictionary=get("RS_ZENOH_AUTH_DICTIONARY"),
        )


def parse_locality(raw: str) -> str:
    """cfg/zenoh.rs FromStr: case-insensitive, default Any."""
    for name in _LOCALITIES:
        if raw.strip().lower() == name.lower():
            return name
    raise InvalidZenohConfig(
        f"Invalid RS_ZENOH_QUERY_LOCALITY '{raw}', expected one of "
        f"SessionLocal, Remote, Any")


def _config_insert(cfg: dict, path: str, value) -> None:
    """Nested insert for slash paths, the ``insert_json5`` analogue."""
    node = cfg
    keys = [k for k in path.split("/") if k]
    for k in keys[:-1]:
        node = node.setdefault(k, {})
        if not isinstance(node, dict):
            raise InvalidZenohConfig(
                f"Invalid config '{path}': '{k}' is not a section")
    node[keys[-1]] = value


def parse_inline_config(inline: str) -> dict:
    """``RS_ZENOH_CONFIG`` parser (session.rs:297-349): JSON5 object when
    it starts with '{', else ``key=value;key=value`` with the reference's
    scalar typing rules (bool/number stay raw, ``[a, b]`` arrays quote
    each element as a string, everything else is a string)."""
    trimmed = inline.strip()
    if trimmed.startswith("{"):
        try:
            return _loads_json5(trimmed)
        except ValueError as err:
            raise InvalidZenohConfig(f"Invalid JSON5 config: {err}")

    cfg: dict = {}
    for part in trimmed.split(";"):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise InvalidZenohConfig(
                f"Invalid config part '{part}', expected key=value")
        key, value = part.split("=", 1)
        key, value = key.strip(), value.strip()
        parsed: object
        if value in ("true", "false"):
            parsed = value == "true"
        elif _is_number(value):
            parsed = int(value) if re.fullmatch(r"[+-]?\d+", value) \
                else float(value)
        elif value.startswith("[") and value.endswith("]"):
            parsed = [e.strip() for e in value[1:-1].split(",")]
        else:
            parsed = value
        try:
            _config_insert(cfg, key, parsed)
        except InvalidZenohConfig:
            raise
        except Exception as err:  # pragma: no cover - defensive
            raise InvalidZenohConfig(
                f"Invalid config '{key}={value}': {err}")
    return cfg


def _is_number(value: str) -> bool:
    try:
        float(value)
        return True
    except ValueError:
        return False


def _loads_json5(text: str) -> dict:
    """Just enough JSON5 for Zenoh config files: bare keys, single
    quotes, trailing commas, ``//`` line comments.  (The reference
    delegates to the zenoh crate's JSON5 parser.)"""
    try:
        return json.loads(text)
    except ValueError:
        pass
    no_comments = re.sub(r"//[^\n]*", "", text)
    quoted_keys = re.sub(
        r"([{,]\s*)([A-Za-z_][A-Za-z0-9_/-]*)(\s*:)", r'\1"\2"\3',
        no_comments)
    single_to_double = re.sub(r"'([^'\\]*)'", r'"\1"', quoted_keys)
    no_trailing = re.sub(r",(\s*[}\]])", r"\1", single_to_double)
    return json.loads(no_trailing)


@dataclass
class CredentialFiles:
    """Temp files holding inline credentials (session.rs:33-39); paths
    stay valid until :meth:`cleanup`."""

    tls_root_ca: Optional[str] = None
    tls_connect_cert: Optional[str] = None
    tls_connect_key: Optional[str] = None
    auth_dictionary: Optional[str] = None

    def cleanup(self) -> None:
        for p in (self.tls_root_ca, self.tls_connect_cert,
                  self.tls_connect_key, self.auth_dictionary):
            if p and os.path.exists(p):
                os.unlink(p)


def write_credential_file(prefix: str, suffix: str, content: str) -> str:
    """session.rs:265-295 — content to a named temp file, path returned."""
    fd, path = tempfile.mkstemp(prefix=prefix, suffix=suffix)
    try:
        with os.fdopen(fd, "w") as fh:
            fh.write(content)
    except OSError as err:  # pragma: no cover - defensive
        raise InvalidZenohConfig(
            f"Failed to write credential content for {prefix}: {err}")
    log.debug("Created credential temp file: %s", path)
    return path


_CREDENTIAL_KEYS = (
    ("tls_root_ca_cert", "zenoh_root_ca", ".pem",
     "transport/link/tls/root_ca_certificate", "tls_root_ca"),
    ("tls_connect_cert", "zenoh_connect_cert", ".pem",
     "transport/link/tls/connect_certificate", "tls_connect_cert"),
    ("tls_connect_key", "zenoh_connect_key", ".pem",
     "transport/link/tls/connect_private_key", "tls_connect_key"),
    ("auth_dictionary", "zenoh_auth_dict", ".txt",
     "transport/auth/usrpwd/dictionary_file", "auth_dictionary"),
)


def inject_credentials(zenoh_config: dict,
                       config: ZenohApiConfig) -> CredentialFiles:
    """session.rs:187-263 — write each inline credential to a temp file
    and point the transport config at it.  A failure mid-way (a later
    ``_config_insert`` raising) must not strand the secret files already
    on disk — the reference's ``NamedTempFile`` auto-deletes on drop, so
    any partially-built set is cleaned up before the error propagates."""
    cred = CredentialFiles()
    try:
        for attr, prefix, suffix, cfg_path, slot in _CREDENTIAL_KEYS:
            content = getattr(config, attr)
            if content is None:
                continue
            path = write_credential_file(prefix, suffix, content)
            setattr(cred, slot, path)
            _config_insert(zenoh_config, cfg_path, path)
    except Exception:
        cred.cleanup()
        raise
    return cred


def build_zenoh_config(
        config: ZenohApiConfig) -> Tuple[dict, CredentialFiles]:
    """session.rs:169-185: inline takes precedence over the file path;
    one of the two must be set."""
    if config.config_inline is not None:
        zenoh_config = parse_inline_config(config.config_inline)
    elif config.config_path is not None:
        if not os.path.exists(config.config_path):
            raise InvalidZenohConfig(
                f"Config file does not exist: {config.config_path}")
        with open(config.config_path) as fh:
            try:
                zenoh_config = _loads_json5(fh.read())
            except ValueError as err:
                raise InvalidZenohConfig(
                    f"Failed to load config file '{config.config_path}': "
                    f"{err}")
    else:
        raise InvalidZenohConfig(
            "Either RS_ZENOH_CONFIG or RS_ZENOH_CONFIG_PATH must be set")
    return zenoh_config, inject_credentials(zenoh_config, config)


# ---------------------------------------------------------------------------
# attachments (api/zenoh/attachments.rs)
# ---------------------------------------------------------------------------

def serialize_labels(labels: Dict[str, str]) -> bytes:
    return json.dumps(labels, separators=(",", ":")).encode()


def deserialize_labels(payload: bytes) -> Dict[str, str]:
    """Labels = map<string,string>; anything else is a decode error the
    subscriber downgrades to a warning (subscriber.rs:49-58)."""
    obj = json.loads(payload)
    if not isinstance(obj, dict) or not all(
            isinstance(k, str) and isinstance(v, str)
            for k, v in obj.items()):
        raise ValueError("labels must be a map of string to string")
    return obj


@dataclass
class QueryAttachments:
    """attachments.rs:17-21: optional ``when`` condition JSON."""

    when: Optional[object] = None


def deserialize_query_attachments(payload: bytes) -> QueryAttachments:
    obj = json.loads(payload)
    if not isinstance(obj, dict):
        raise ValueError("query attachments must be a JSON object")
    return QueryAttachments(when=obj.get("when"))


# ---------------------------------------------------------------------------
# NTP64 timestamps (session.rs:709-770)
# ---------------------------------------------------------------------------

_U64 = (1 << 64) - 1
_U128 = (1 << 128) - 1


def ntp64_from_micros(us: int) -> int:
    """zenoh NTP64: seconds in the high 32 bits, a 2^-32 fraction in the
    low 32.  Exact enough that µs -> NTP64 -> µs roundtrips losslessly
    (the fraction error is < 0.24 ns)."""
    secs, rem_us = divmod(int(us), 1_000_000)
    frac = (rem_us * 1000 << 32) // 1_000_000_000
    return ((secs << 32) | frac) & _U64


def ntp64_to_micros(ntp: int) -> int:
    secs = ntp >> 32
    frac = ntp & 0xFFFFFFFF
    nanos = (frac * 1_000_000_000 + (1 << 31)) >> 32
    return secs * 1_000_000 + nanos // 1000


@dataclass(frozen=True)
class ZenohTimestamp:
    """(NTP64 time, source id) pair.  The id's wire formatting belongs to
    the zenoh library; here it is the decimal string of a non-zero u128,
    which is all the label roundtrip (session.rs:718-745) needs."""

    ntp64: int
    source_id: str

    @classmethod
    def from_micros(cls, us: int,
                    source_id: int = FALLBACK_ZENOH_SOURCE_ID
                    ) -> "ZenohTimestamp":
        return cls(ntp64_from_micros(us), str(_validate_id(source_id)))

    def to_micros(self) -> int:
        return ntp64_to_micros(self.ntp64)


def _validate_id(raw) -> int:
    value = int(raw)
    if not 1 <= value <= _U128:
        raise ValueError(f"invalid zenoh timestamp id: {raw}")
    return value


def parse_timestamp_from_labels(
        labels: Dict[str, str]) -> Optional[ZenohTimestamp]:
    """session.rs:718-745: both labels must parse or the pair is ignored
    (debug-logged), falling through to the microsecond path."""
    ntp_raw = labels.get(ZENOH_TS_LABEL)
    id_raw = labels.get(ZENOH_SOURCE_ID_LABEL)
    if ntp_raw is None or id_raw is None:
        return None
    try:
        ntp = int(ntp_raw)
        if not 0 <= ntp <= _U64:
            raise ValueError(ntp_raw)
    except ValueError:
        log.debug("Failed to parse label '%s'='%s' as NTP64",
                  ZENOH_TS_LABEL, ntp_raw)
        return None
    try:
        source_id = _validate_id(id_raw)
    except ValueError:
        log.debug("Failed to parse label '%s'='%s' as zenoh ID",
                  ZENOH_SOURCE_ID_LABEL, id_raw)
        return None
    return ZenohTimestamp(ntp, str(source_id))


def timestamp_from_microseconds(
        labels: Dict[str, str],
        record_timestamp_us: int) -> Optional[ZenohTimestamp]:
    """session.rs:747-770: source id from the label when it parses, else
    the fallback id 1; time always from the record's microseconds."""
    raw = labels.get(ZENOH_SOURCE_ID_LABEL)
    source_id = FALLBACK_ZENOH_SOURCE_ID
    if raw is not None:
        try:
            source_id = _validate_id(raw)
        except ValueError:
            log.debug("Failed to parse label '%s'='%s' as zenoh ID",
                      ZENOH_SOURCE_ID_LABEL, raw)
    return ZenohTimestamp(ntp64_from_micros(record_timestamp_us),
                          str(source_id))


def build_reply_timestamp(labels: Dict[str, str],
                          record_timestamp_us: int) -> ZenohTimestamp:
    """session.rs:713-716: label pair wins, microseconds otherwise."""
    return (parse_timestamp_from_labels(labels)
            or timestamp_from_microseconds(labels, record_timestamp_us))


def current_time_us() -> int:
    return int(time.time() * 1_000_000)


# ---------------------------------------------------------------------------
# key expressions
# ---------------------------------------------------------------------------

def _chunk_matches(pat: str, chunk: str) -> bool:
    if pat == "*":
        return bool(chunk)
    if "$*" in pat:
        rx = "^" + ".*".join(re.escape(p) for p in pat.split("$*")) + "$"
        return re.match(rx, chunk) is not None
    return pat == chunk


def keyexpr_matches(declared: str, key: str) -> bool:
    """Zenoh key-expression inclusion of a concrete key: ``*`` matches
    one chunk, ``**`` any number (including zero), ``$*`` any substring
    within a chunk.  This is the routing the zenoh library performs for
    declared subscribers/queryables; the pipelines themselves only ever
    see concrete sample/query keys (subscriber.rs:46, queryable.rs:76)."""
    dp = [c for c in declared.strip("/").split("/") if c != ""]
    kp = [c for c in key.strip("/").split("/") if c != ""]

    from functools import lru_cache

    @lru_cache(maxsize=None)
    def m(i: int, j: int) -> bool:
        if i == len(dp):
            return j == len(kp)
        if dp[i] == "**":
            return m(i + 1, j) or (j < len(kp) and m(i, j + 1))
        if j == len(kp):
            return False
        return _chunk_matches(dp[i], kp[j]) and m(i + 1, j + 1)

    return m(0, 0)


# ---------------------------------------------------------------------------
# in-process transport double
# ---------------------------------------------------------------------------

@dataclass
class Sample:
    key_expr: str
    payload: bytes
    encoding: str = "application/octet-stream"
    attachment: Optional[bytes] = None
    timestamp: Optional[ZenohTimestamp] = None


@dataclass
class Query:
    key_expr: str
    params: Dict[str, str]
    attachment: Optional[bytes] = None


@dataclass
class Reply:
    key_expr: str
    payload: bytes
    encoding: str
    attachment: Optional[bytes] = None
    timestamp: Optional[ZenohTimestamp] = None


@dataclass
class ReplyError:
    payload: bytes

    @property
    def message(self) -> str:
        return self.payload.decode(errors="replace")


def parse_selector(selector: str) -> Tuple[str, Dict[str, str]]:
    """``key/expr?a=1&b=2`` -> key + params (zenoh Selector/Parameters;
    session.rs:558-563 expand_query_params)."""
    key, _, raw = selector.partition("?")
    params: Dict[str, str] = {}
    if raw:
        for pair in raw.split("&"):
            if not pair:
                continue
            k, _, v = pair.partition("=")
            params[k] = v
    return key, params


class InProcZenohSession:
    """Transport double with the zenoh session surface the reference
    uses: declare_subscriber / declare_queryable / put / get.  Delivery
    is synchronous and in-process; swap for zenoh-python for a network."""

    def __init__(self):
        self._subscribers: List[Tuple[str, Callable[[Sample], None]]] = []
        self._queryables: List[
            Tuple[str, str, Callable[[Query], List[object]]]] = []
        self.closed = False

    def declare_subscriber(self, keyexpr: str,
                           handler: Callable[[Sample], None]):
        entry = (keyexpr, handler)
        self._subscribers.append(entry)
        return entry

    def declare_queryable(self, keyexpr: str,
                          handler: Callable[[Query], List[object]],
                          allowed_origin: str = "Any"):
        entry = (keyexpr, allowed_origin, handler)
        self._queryables.append(entry)
        return entry

    def undeclare(self, entry) -> None:
        for pool in (self._subscribers, self._queryables):
            if entry in pool:
                pool.remove(entry)

    def put(self, key_expr: str, payload: bytes, *,
            encoding: str = "application/octet-stream",
            attachment: Optional[bytes] = None,
            timestamp: Optional[ZenohTimestamp] = None) -> int:
        """Deliver a sample to every matching subscriber; returns the
        number of deliveries.  Handler errors are logged, not raised —
        a publisher never observes a subscriber failure
        (session.rs:389-406)."""
        sample = Sample(key_expr, bytes(payload), encoding, attachment,
                        timestamp)
        delivered = 0
        for keyexpr, handler in list(self._subscribers):
            if not keyexpr_matches(keyexpr, key_expr):
                continue
            delivered += 1
            try:
                handler(sample)
            except Exception as err:
                log.warning("Failed to handle Zenoh sample on '%s': %s",
                            keyexpr, err)
        return delivered

    def get(self, selector: str, *,
            attachment: Optional[bytes] = None,
            origin: str = "SessionLocal") -> List[object]:
        """Route a query to every matching queryable and collect its
        replies.  ``origin`` models where the query came from so the
        queryable's allowed_origin (locality) filter is honest
        (session.rs:478-481, 550-556)."""
        key, params = parse_selector(selector)
        replies: List[object] = []
        for keyexpr, allowed, handler in list(self._queryables):
            if not keyexpr_matches(keyexpr, key):
                continue
            if allowed != "Any" and allowed != origin:
                continue
            replies.extend(handler(Query(key, params, attachment)))
        return replies

    def close(self) -> None:
        self._subscribers.clear()
        self._queryables.clear()
        self.closed = True


# ---------------------------------------------------------------------------
# subscriber pipeline (api/zenoh/subscriber.rs)
# ---------------------------------------------------------------------------

def _noop():
    return None


class SubscriberPipeline:
    """Samples -> records in the fixed bucket; the full key expression
    (slash-trimmed) becomes the entry name (subscriber.rs:19-46).

    ``check_api_request`` / ``check_ingress`` are the injectable
    equivalents of the reference's limits component
    (subscriber.rs:69-76) — no-ops by default, raise to reject."""

    def __init__(self, config: ZenohApiConfig, store, *,
                 check_api_request: Callable[[], None] = None,
                 check_ingress: Callable[[int], None] = None,
                 now_us: Callable[[], int] = current_time_us):
        self.config = config
        self.store = store
        self.bucket = config.bucket
        self._check_api_request = check_api_request or (lambda: None)
        self._check_ingress = check_ingress or (lambda n: None)
        self._now_us = now_us

    def handle_sample(self, key_expr: str, payload: bytes,
                      attachment: Optional[bytes] = None,
                      timestamp: Optional[int] = None,
                      content_type: str = "application/octet-stream",
                      source_labels: Optional[Dict[str, str]] = None
                      ) -> dict:
        """subscriber.rs:37-103; returns the stored record's coordinates.

        Label precedence: attachment labels first, then source labels
        overwrite (the reference inserts source labels after the decode,
        subscriber.rs:62-64).  A malformed attachment downgrades to a
        warning and empty labels, never a rejection."""
        row, content_size = self._decode_sample(
            key_expr, payload, attachment, timestamp, content_type,
            source_labels)
        self._write_rows([row])
        # replication notify (subscriber.rs:105-127): the tailing
        # replication stream reads the store as a streaming source, so
        # the new partition IS the notification.
        return {"bucket": self.bucket, "entry": row[1], "ts": row[2],
                "size": content_size}

    def _decode_sample(self, key_expr: str, payload: bytes,
                       attachment: Optional[bytes],
                       timestamp: Optional[int], content_type: str,
                       source_labels: Optional[Dict[str, str]]):
        """Shared decode + per-sample guards for the single and batched
        ingest paths; returns the RECORDS_SCHEMA row tuple + size."""
        from ..schema import STATE_FINISHED
        entry_name = key_expr.strip("/")

        labels: Dict[str, str] = {}
        if attachment is not None:
            try:
                labels = deserialize_labels(attachment)
            except ValueError as err:
                log.warning("Failed to decode labels for %s:%s (%s): %s",
                            self.bucket, entry_name, key_expr, err)
        for key, value in (source_labels or {}).items():
            labels[key] = value

        ts = timestamp if timestamp is not None else self._now_us()
        content_size = len(payload)

        try:
            self._check_api_request()
            self._check_ingress(content_size)
        except Exception as err:
            raise IngestError(str(err))

        log.debug(
            "Ingesting Zenoh sample bucket=%s entry=%s timestamp=%s "
            "bytes=%s content_type=%s", self.bucket, entry_name, ts,
            content_size, content_type)
        return ((self.bucket, entry_name, int(ts), bytes(payload),
                 content_type, STATE_FINISHED, labels, {}), content_size)

    def _write_rows(self, rows: list) -> None:
        from ..schema import RECORDS_SCHEMA
        df = self.store.spark.createDataFrame(rows, RECORDS_SCHEMA)
        try:
            self.store.write(df)
        except Exception as err:
            raise IngestError(str(err))

    def handle_samples(self, samples: List[Sample],
                       on_error: str = "abort") -> dict:
        """Batch-ingest helper — NOT a reference surface: the reference
        handles one sample per zenoh callback (subscriber.rs:37-103) and
        :meth:`handle_zenoh_sample` mirrors that per-sample write, which
        is a production footgun at high publish rates (one parquet write
        job per sample).  This variant decodes N wire samples with the
        EXACT per-sample semantics (api-request + ingress guards run per
        sample, malformed attachments downgrade per sample, zenoh
        timestamps become the NTP64/source-id label pair) and lands them
        in ONE ``store.write``.

        Per-sample LAST-WINS is preserved inside the batch: two samples
        landing on the same (entry, ts) — e.g. untimestamped samples to
        one entry stamped with the same current-time microsecond — are
        disambiguated BEFORE the write, keeping only the later sample,
        exactly what N sequential :meth:`handle_zenoh_sample` calls
        would store (each write gets a fresh ``__seq``, newest wins).
        The returned ``records``/``bytes`` count what the store will
        actually serve, never the raw batch size.

        ``on_error`` picks the failure mode: ``"abort"`` (default) is
        all-or-nothing — a guard rejecting any sample aborts the batch
        before anything is written; ``"skip"`` is reject-and-continue —
        guard-rejected samples land in the returned ``rejected`` list
        (``{"index", "key_expr", "error"}`` each) and the rest still
        ingest in one write.  Returns ``{"bucket", "records", "bytes",
        "rejected"}``."""
        if on_error not in ("abort", "skip"):
            raise ValueError(
                f"on_error must be 'abort' or 'skip', got {on_error!r}")
        # A failing api-request guard (auth/token/limits) is batch-GLOBAL:
        # probe it once up front so skip mode raises instead of rejecting
        # every sample individually and returning a success-shaped dict
        # with records=0 — silent total data loss for a caller that
        # ignores the rejected list (r9 ADVICE).  The per-sample guard in
        # _decode_sample still runs (reference parity: subscriber.rs
        # checks per callback), so a guard that starts failing MID-batch
        # is still caught sample-by-sample.
        try:
            self._check_api_request()
        except Exception as err:
            raise IngestError(str(err))
        kept: Dict[tuple, tuple] = {}  # (bucket, entry, ts) -> (row, size)
        rejected = []
        for idx, sample in enumerate(samples):
            timestamp_us = None
            source_labels: Dict[str, str] = {}
            if sample.timestamp is not None:
                timestamp_us = sample.timestamp.to_micros()
                source_labels[ZENOH_SOURCE_ID_LABEL] = \
                    sample.timestamp.source_id
                source_labels[ZENOH_TS_LABEL] = str(sample.timestamp.ntp64)
            try:
                row, size = self._decode_sample(
                    sample.key_expr, sample.payload, sample.attachment,
                    timestamp_us, sample.encoding, source_labels)
            except IngestError as err:
                if on_error == "abort":
                    raise
                rejected.append({"index": idx,
                                 "key_expr": sample.key_expr,
                                 "error": str(err)})
                continue
            # last-wins within the batch: a later same-key sample
            # replaces the earlier one (dict insertion order keeps the
            # first-seen position, value the newest sample)
            kept[(row[0], row[1], row[2])] = (row, size)
        if samples and not kept:
            # nothing survived a non-empty batch (e.g. ingress guard
            # rejecting every sample): loud, because skip-mode callers
            # that only read `records` would otherwise see silent loss
            log.warning(
                "Zenoh batch ingest: all %d samples rejected for "
                "bucket='%s' (first: %s)", len(samples), self.bucket,
                rejected[0]["error"] if rejected else "n/a")
        if kept:
            self._write_rows([row for row, _size in kept.values()])
        return {"bucket": self.bucket, "records": len(kept),
                "bytes": sum(size for _row, size in kept.values()),
                "rejected": rejected}

    def handle_zenoh_sample(self, sample: Sample) -> dict:
        """session.rs:413-461 — unpack a wire sample: encoding becomes
        the content type; a zenoh timestamp becomes the record µs AND the
        NTP64/source-id label pair the reply path prefers."""
        timestamp_us = None
        source_labels: Dict[str, str] = {}
        if sample.timestamp is not None:
            timestamp_us = sample.timestamp.to_micros()
            source_labels[ZENOH_SOURCE_ID_LABEL] = sample.timestamp.source_id
            source_labels[ZENOH_TS_LABEL] = str(sample.timestamp.ntp64)
        return self.handle_sample(
            sample.key_expr, sample.payload, sample.attachment,
            timestamp_us, sample.encoding, source_labels)

    def bootstrap(self) -> str:
        info = self.store.bucket_info(self.bucket)
        msg = (f"Zenoh subscriber ready: bucket='{self.bucket}' "
               f"({info['record_count']} records)")
        log.info(msg)
        return msg


# ---------------------------------------------------------------------------
# queryable pipeline (api/zenoh/queryable.rs)
# ---------------------------------------------------------------------------

def parse_timestamp_param(params: Dict[str, str]) -> Optional[int]:
    raw = params.get("ts")
    if raw is None:
        return None
    if not re.fullmatch(r"\d+", raw):
        raise QueryError("'ts' must be an unsigned integer", "param")
    return int(raw)


def parse_last_param(params: Dict[str, str]) -> bool:
    raw = params.get("last")
    if raw is None:
        return False
    if raw not in ("true", "false"):
        raise QueryError("'last' must be a boolean value", "param")
    return raw == "true"


def parse_strict_param(params: Dict[str, str]) -> Optional[bool]:
    raw = params.get("strict")
    if raw is None:
        return None
    if raw not in ("true", "false"):
        raise QueryError("'strict' must be a boolean value", "param")
    return raw == "true"


def parse_time_range_params(
        params: Dict[str, str]) -> Tuple[Optional[int], Optional[int]]:
    out = []
    for name in ("start", "stop"):
        raw = params.get(name)
        if raw is None:
            out.append(None)
            continue
        if not re.fullmatch(r"\d+", raw):
            raise QueryError(f"'{name}' must be an unsigned integer",
                             "param")
        out.append(int(raw))
    return out[0], out[1]


@dataclass
class RecordResult:
    """QueryResult::Record — a single resolved record row."""

    row: object


@dataclass
class StreamResult:
    """QueryResult::Stream — a lazy records plan plus the batch knobs
    governing how many records one reply burst carries."""

    df: object
    io: object


class QueryablePipeline:
    """Selector -> records in the fixed bucket; the full key expression
    (slash-trimmed) is the entry name (queryable.rs:21-116)."""

    def __init__(self, config: ZenohApiConfig, store, engine=None, *,
                 check_api_request: Callable[[], None] = None,
                 check_egress: Callable[[int], None] = None):
        from ..query import QueryEngine
        self.config = config
        self.store = store
        self.engine = engine or QueryEngine()
        self.bucket = config.bucket
        self.check_api_request = check_api_request or (lambda: None)
        self.check_egress = check_egress or (lambda n: None)

    def handle_query(self, key_expr: str, params: Dict[str, str],
                     attachments: QueryAttachments):
        """queryable.rs:70-116: ``ts`` -> exact single read, ``last`` ->
        latest record, else a ranged/conditioned query stream."""
        entry_name = key_expr.strip("/")
        records = self.store.read()

        # queryable.rs:89 resolves bucket.get_entry() BEFORE any of the
        # three branches: a selector naming a non-existent entry replies
        # the storage not-found error (bucket.rs:123-134 message shape),
        # never an empty stream or a misleading record-not-found.
        # Existence is a filtered limit-1 probe on the compacted-read
        # path (bucket/entry are partition columns, so the scan prunes
        # to the one entry and stops at the first row) — NOT a
        # distinct+collect over every entry in the store, which would
        # put a full enumeration on every serving-path query.
        probe = self.store.read(assume_compacted=True)
        if not (probe.where((probe["bucket"] == self.bucket)
                            & (probe["entry"] == entry_name)).take(1)):
            raise QueryError(
                f"Entry '{entry_name}' not found in bucket "
                f"'{self.bucket}'")

        ts = parse_timestamp_param(params)
        if ts is not None:
            rows = self.engine.read_one(
                records, self.bucket, entry_name, ts).collect()
            if not rows:
                # read_record.rs:72-79 not_found shape
                raise QueryError(
                    f"Record {ts} not found in entry "
                    f"{self.bucket}/{entry_name}")
            return RecordResult(rows[0])

        if parse_last_param(params):
            info = self.store.entry_info(self.bucket, entry_name)
            if info["record_count"] == 0:
                raise QueryError(f"No records in entry {entry_name}")
            latest = info["latest_record"]
            rows = self.engine.read_one(
                records, self.bucket, entry_name, latest).collect()
            if not rows:
                # entry.info() counts records of EVERY state while
                # read_one serves only FINISHED ones — mirror the
                # begin_read errors (read_record.rs:44-60) instead of
                # surfacing an opaque IndexError to the client
                from ..schema import STATE_ERRORED, STATE_STARTED
                st = (records.where(
                    (records["bucket"] == self.bucket)
                    & (records["entry"] == entry_name)
                    & (records["ts"] == latest))
                    .select("state").collect())
                state = st[0]["state"] if st else None
                if state == STATE_STARTED:
                    raise QueryError(
                        f"Record with timestamp {latest} in "
                        f"{self.bucket}/{entry_name} is still being "
                        f"written")
                if state == STATE_ERRORED:
                    raise QueryError(
                        f"Record with timestamp {latest} in "
                        f"{self.bucket}/{entry_name} is broken")
                raise QueryError(
                    f"Record {latest} not found in entry "
                    f"{self.bucket}/{entry_name}")
            return RecordResult(rows[0])

        start, stop = parse_time_range_params(params)
        strict = parse_strict_param(params)
        from ..functions.cursor import IoSettings
        df = (records
              .where((records["bucket"] == self.bucket)))
        df = self.engine.query(
            df, entries=[entry_name], start=start, stop=stop,
            when=attachments.when, strict=bool(strict))
        return StreamResult(df, IoSettings())

    def reply_for(self, result, key_expr: Optional[str] = None, *,
                  clock=time.monotonic) -> List[Reply]:
        """session.rs:580-707 send_query_reply: record payload + label
        attachment + rebuilt timestamp per reply; streams stop at
        ``batch_max_records`` or the batch timeout.  Replies carry the
        QUERY's key expression verbatim (session.rs:606,681 clone
        ``query.key_expr()``), not the record's entry name — the two
        differ when the selector had surrounding slashes.  The
        ``toLocalIterator`` drain is per-record by design — it mirrors
        the reference's per-reply send loop and is capped at
        ``batch_max_records``, so it lives on the serving layer, never
        on a scan path (the ingest-side analogue of this note is
        :meth:`SubscriberPipeline.handle_samples`)."""
        if isinstance(result, RecordResult):
            return [self._row_to_reply(result.row, key_expr)]
        replies: List[Reply] = []
        t0 = clock()
        for row in result.df.toLocalIterator():
            if clock() - t0 > result.io.batch_timeout_s:
                log.debug("Batch timeout reached after %d records",
                          len(replies))
                break
            replies.append(self._row_to_reply(row, key_expr))
            if len(replies) >= result.io.batch_max_records:
                break
        return replies

    def _row_to_reply(self, row, key_expr: Optional[str] = None) -> Reply:
        data = bytes(row["payload"]) if row["payload"] is not None else b""
        self.check_egress(len(data))
        labels = dict(row["labels"] or {})
        return Reply(
            key_expr=key_expr if key_expr is not None else row["entry"],
            payload=data,
            encoding=row["content_type"] or "application/octet-stream",
            attachment=serialize_labels(labels),
            timestamp=build_reply_timestamp(labels, row["ts"]))

    def bootstrap(self) -> str:
        info = self.store.bucket_info(self.bucket)
        msg = (f"Zenoh queryable ready: bucket='{self.bucket}' "
               f"({info['record_count']} records)")
        log.info(msg)
        return msg


# ---------------------------------------------------------------------------
# runtime (api/zenoh.rs + session.rs orchestration)
# ---------------------------------------------------------------------------

class ZenohRuntimeHandle:
    """zenoh.rs:12-22 — holds the declared endpoints; shutdown
    undeclares them and closes the session."""

    def __init__(self, session: InProcZenohSession, handles: list,
                 credentials: CredentialFiles,
                 subscriber: Optional[SubscriberPipeline],
                 queryable: Optional[QueryablePipeline],
                 owns_session: bool):
        self.session = session
        self._handles = handles
        self._credentials = credentials
        self.subscriber = subscriber
        self.queryable = queryable
        self._owns_session = owns_session

    def shutdown(self) -> None:
        for h in self._handles:
            self.session.undeclare(h)
        self._handles.clear()
        self._credentials.cleanup()
        if self._owns_session:
            self.session.close()
        log.info("Zenoh API runtime terminated gracefully")


def ensure_bucket_exists(store, bucket: str) -> None:
    """session.rs:139-167 — auto-create the target bucket with default
    settings when missing (existence = a persisted settings file or any
    entry already in the bucket)."""
    try:
        with open(store._settings_file()) as fh:
            has_settings = bucket in json.load(fh)
    except (FileNotFoundError, ValueError):
        has_settings = False
    has_entries = bool(store.entries(bucket))
    if not (has_settings or has_entries):
        log.info("Zenoh target bucket '%s' does not exist, creating...",
                 bucket)
        store.set_bucket_settings(bucket)


def spawn_runtime(config: ZenohApiConfig, store, *,
                  session: Optional[InProcZenohSession] = None,
                  engine=None,
                  now_us: Callable[[], int] = current_time_us
                  ) -> Optional[ZenohRuntimeHandle]:
    """zenoh.rs:24-41 + session.rs:41-137: ``None`` when disabled, else
    validate the config (credential injection included), ensure the
    bucket, and declare the subscriber/queryable endpoints that were
    configured.  Endpoints with an unset key expression stay disabled
    (session.rs:100-110)."""
    if not config.enabled:
        return None

    # bucket first, then transport config — the reference resolves
    # storage state before it touches zenoh config (session.rs:53-78)
    ensure_bucket_exists(store, config.bucket)

    _zcfg, credentials = build_zenoh_config(config)

    owns_session = session is None
    session = session or InProcZenohSession()
    handles = []

    try:
        subscriber = None
        if config.sub_keyexprs is not None:
            subscriber = SubscriberPipeline(config, store, now_us=now_us)
            subscriber.bootstrap()
            handles.append(session.declare_subscriber(
                config.sub_keyexprs, subscriber.handle_zenoh_sample))

        queryable = None
        if config.query_keyexprs is not None:
            queryable = QueryablePipeline(config, store, engine)
            queryable.bootstrap()

            def _handle(query: Query, _q=queryable) -> List[object]:
                try:
                    _q.check_api_request()
                except Exception as err:
                    log.warning("Query request limit exceeded for "
                                "'%s': %s", query.key_expr, err)
                    return [ReplyError(str(err).encode())]
                try:
                    attachments = (deserialize_query_attachments(
                        query.attachment) if query.attachment is not None
                        else QueryAttachments())
                except ValueError as err:
                    log.debug("Failed to parse query attachments: %s", err)
                    attachments = QueryAttachments()
                try:
                    result = _q.handle_query(query.key_expr, query.params,
                                             attachments)
                    return _q.reply_for(result, query.key_expr)
                except Exception as err:
                    log.warning("Query handler error for '%s': %s",
                                query.key_expr, err)
                    return [ReplyError(str(err).encode())]

            handles.append(session.declare_queryable(
                config.query_keyexprs, _handle,
                allowed_origin=config.query_locality))
    except Exception:
        # the reference's credential NamedTempFiles drop (auto-delete)
        # when the spawn fails after the config build (session.rs:41-137)
        # — mirror that so TLS keys / auth dictionaries never outlive a
        # failed bootstrap/declare
        for h in handles:
            session.undeclare(h)
        credentials.cleanup()
        if owns_session:
            session.close()
        raise

    log.info("Zenoh API runtime started: %d subscribers, %d queryables",
             1 if subscriber else 0, 1 if queryable else 0)
    return ZenohRuntimeHandle(session, handles, credentials,
                              subscriber, queryable, owns_session)
