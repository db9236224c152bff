"""Batched read/write header protocol (v1 + v2) — the HTTP serving shim.

Pure-Python re-expression of the reference's wire format so a serving
layer in front of the Spark engine can speak the same protocol
(reference: reduct_base/src/batch/v1.rs:26-100, v2.rs:1-470):

v1: per-record header ``x-reduct-time-<ts>`` whose value is
    ``<content_length>, <content_type>, k1=v1, k2="v,2" ...``
    (content type defaults to application/octet-stream; values with
    commas are double-quoted).

v2 adds multi-entry batches + delta compression:
    ``x-reduct-entries``: comma-separated percent-encoded entry names,
    ``x-reduct-labels`` (optional): label-name dictionary,
    ``x-reduct-start-ts``: first timestamp,
    per record ``x-reduct-<ENTRY-INDEX>-<TIME-DELTA-uS>`` with value
    ``<len>[,<ct>[,<label-delta>]]`` where omitted parts reuse the
    entry's previous record, the label delta lists only changed labels
    (``k=`` unsets), and label names may be replaced by dictionary
    indexes.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

DEFAULT_CONTENT_TYPE = "application/octet-stream"
HEADER_PREFIX = "x-reduct-"
ENTRIES_HEADER = "x-reduct-entries"
LABELS_HEADER = "x-reduct-labels"
START_TS_HEADER = "x-reduct-start-ts"

_TCHAR_EXTRA = set(b"!#$%&'*+-.^_`|~")


class ProtocolError(ValueError):
    pass


def _is_tchar(b: int) -> bool:
    return (48 <= b <= 57) or (65 <= b <= 90) or (97 <= b <= 122) or b in _TCHAR_EXTRA


def encode_entry_name(entry: str) -> str:
    out = []
    for b in entry.encode():
        out.append(chr(b) if _is_tchar(b) else f"%{b:02X}")
    return "".join(out)


def decode_entry_name(encoded: str) -> str:
    out = bytearray()
    i = 0
    while i < len(encoded):
        if encoded[i] == "%":
            if i + 3 > len(encoded):
                raise ProtocolError(f"Invalid entry encoding: '{encoded}'")
            try:
                out.append(int(encoded[i + 1:i + 3], 16))
            except ValueError:
                raise ProtocolError(f"Invalid entry encoding: '{encoded}'")
            i += 3
        else:
            out.append(ord(encoded[i]))
            i += 1
    return out.decode()


@dataclass
class RecordHeader:
    content_length: int
    content_type: str = DEFAULT_CONTENT_TYPE
    labels: Dict[str, str] = field(default_factory=dict)


# ---------------------------------------------------------------------------
# v1
# ---------------------------------------------------------------------------

def parse_batched_header(header: str) -> RecordHeader:
    """v1 value: '<len>, <ct>, k=v, k2="v,2"' (v1.rs:26-73)."""
    if "," not in header:
        raise ProtocolError("Invalid batched header")
    length_s, rest = header.split(",", 1)
    try:
        content_length = int(length_s.strip())
    except ValueError:
        raise ProtocolError("Invalid content length")
    if "," in rest:
        content_type, rest = rest.split(",", 1)
    else:
        content_type, rest = rest, ""
    content_type = content_type.strip() or DEFAULT_CONTENT_TYPE
    labels: Dict[str, str] = {}
    rest = rest.strip()
    while "=" in rest:
        key, value = rest.split("=", 1)
        key = key.strip()
        if value.startswith('"'):
            value = value[1:]
            if '"' not in value:
                raise ProtocolError("Invalid batched header")
            value, rest = value.split('"', 1)
            labels[key] = value.strip()
            rest = rest.lstrip(",").strip()
        elif "," in value:
            value, rest = value.split(",", 1)
            labels[key] = value.strip()
            rest = rest.strip()
        else:
            labels[key] = value.strip()
            break
    return RecordHeader(content_length, content_type, labels)


def format_batched_header(h: RecordHeader) -> str:
    parts = [str(h.content_length), h.content_type]
    for k in sorted(h.labels):
        v = h.labels[k]
        parts.append(f'{k}="{v}"' if "," in v else f"{k}={v}")
    return ", ".join(parts)


def sort_v1_headers(headers: Dict[str, str]) -> List[Tuple[int, str]]:
    """Extract and time-sort x-reduct-time-<ts> headers (v1.rs:75-100)."""
    out = []
    for name, value in headers.items():
        if name.startswith("x-reduct-time-"):
            ts_s = name[len("x-reduct-time-"):]
            try:
                out.append((int(ts_s), value))
            except ValueError:
                raise ProtocolError(
                    f"Invalid header '{name}': must be a unix timestamp in microseconds")
    return sorted(out)


# ---------------------------------------------------------------------------
# v2
# ---------------------------------------------------------------------------

@dataclass
class EntryRecord:
    entry: str
    timestamp: int
    header: RecordHeader


def _fmt_label_value(v: str) -> str:
    return f'"{v}"' if "," in v else v


def encode_batch_v2(records: List[EntryRecord],
                    use_label_index: bool = True) -> Dict[str, str]:
    """Encode records (sorted by entry then ts) into v2 headers with
    content-type/label delta reuse (v2.rs:228-318)."""
    if not records:
        return {}
    records = sorted(records, key=lambda r: (r.entry, r.timestamp))
    entries: List[str] = []
    label_names: List[str] = []
    label_idx: Dict[str, int] = {}
    start_ts = min(r.timestamp for r in records)
    headers: Dict[str, str] = {}

    prev_ct: Dict[str, str] = {}
    prev_labels: Dict[str, Dict[str, str]] = {}

    def label_key(name: str) -> str:
        if not use_label_index:
            return name
        if name not in label_idx:
            label_idx[name] = len(label_names)
            label_names.append(name)
        return str(label_idx[name])

    for rec in records:
        if rec.entry not in entries:
            entries.append(rec.entry)
        eidx = entries.index(rec.entry)
        delta = rec.timestamp - start_ts

        parts = [str(rec.header.content_length)]
        ct = ""
        if rec.entry not in prev_ct:
            ct = rec.header.content_type
        elif prev_ct[rec.entry] != rec.header.content_type:
            ct = rec.header.content_type

        deltas: List[Tuple[str, str]] = []
        prev = prev_labels.get(rec.entry)
        if prev is None:
            for k in sorted(rec.header.labels):
                deltas.append((label_key(k), _fmt_label_value(rec.header.labels[k])))
        else:
            for k in sorted(set(prev) | set(rec.header.labels)):
                p, c = prev.get(k), rec.header.labels.get(k)
                if p == c:
                    continue
                deltas.append((label_key(k), "" if c is None else _fmt_label_value(c)))
        label_delta = ",".join(f"{k}={v}" for k, v in deltas)

        if ct or label_delta:
            parts.append(ct)
        if label_delta:
            parts.append(label_delta)
        headers[f"{HEADER_PREFIX}{eidx}-{delta}"] = ",".join(parts)
        prev_ct[rec.entry] = rec.header.content_type
        prev_labels[rec.entry] = dict(rec.header.labels)

    headers[ENTRIES_HEADER] = ",".join(encode_entry_name(e) for e in entries)
    headers[START_TS_HEADER] = str(start_ts)
    if use_label_index and label_names:
        headers[LABELS_HEADER] = ",".join(encode_entry_name(n) for n in label_names)
    return headers


def decode_batch_v2(headers: Dict[str, str]) -> List[EntryRecord]:
    """Decode v2 headers back into records, applying reuse/delta rules."""
    if ENTRIES_HEADER not in headers:
        raise ProtocolError(f"Missing {ENTRIES_HEADER} header")
    entries = [decode_entry_name(e) for e in headers[ENTRIES_HEADER].split(",")]
    try:
        start_ts = int(headers[START_TS_HEADER])
    except (KeyError, ValueError):
        raise ProtocolError(f"Missing or invalid {START_TS_HEADER} header")
    label_names = None
    if LABELS_HEADER in headers:
        label_names = [decode_entry_name(n) for n in headers[LABELS_HEADER].split(",")]

    recs: List[Tuple[int, int, str]] = []  # (entry_idx, delta, value)
    for name, value in headers.items():
        if not name.startswith(HEADER_PREFIX):
            continue
        suffix = name[len(HEADER_PREFIX):]
        if suffix in ("entries", "labels", "start-ts") or suffix.startswith("error-"):
            continue
        try:
            eidx_s, delta_s = suffix.split("-", 1)
            recs.append((int(eidx_s), int(delta_s), value))
        except ValueError:
            continue
    recs.sort()

    out: List[EntryRecord] = []
    prev_ct: Dict[int, str] = {}
    prev_labels: Dict[int, Dict[str, str]] = {}
    for eidx, delta, value in recs:
        if eidx >= len(entries):
            raise ProtocolError(f"Entry index {eidx} out of range")
        parts = value.split(",", 2)
        try:
            content_length = int(parts[0].strip())
        except ValueError:
            raise ProtocolError("Invalid content length")
        ct = parts[1].strip() if len(parts) > 1 else ""
        if not ct:
            ct = prev_ct.get(eidx, DEFAULT_CONTENT_TYPE)
        labels = dict(prev_labels.get(eidx, {}))
        if len(parts) > 2 and parts[2]:
            for k, v in _parse_label_delta(parts[2]):
                if label_names is not None and k.isdigit() and int(k) < len(label_names):
                    k = label_names[int(k)]
                if v == "":
                    labels.pop(k, None)
                else:
                    labels[k] = v
        out.append(EntryRecord(entries[eidx], start_ts + delta,
                               RecordHeader(content_length, ct, labels)))
        prev_ct[eidx] = ct
        prev_labels[eidx] = dict(labels)
    return out


def _parse_label_delta(s: str) -> List[Tuple[str, str]]:
    out = []
    rest = s.strip()
    while "=" in rest:
        key, value = rest.split("=", 1)
        key = key.strip()
        if value.startswith('"'):
            value = value[1:]
            if '"' not in value:
                raise ProtocolError("Invalid label delta")
            value, rest = value.split('"', 1)
            out.append((key, value))
            rest = rest.lstrip(",").strip()
        elif "," in value:
            value, rest = value.split(",", 1)
            out.append((key, value.strip()))
            rest = rest.strip()
        else:
            out.append((key, value.strip()))
            break
    return out
