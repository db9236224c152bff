"""Row-at-a-time AST interpreter with exact reference semantics.

This is the ground-truth evaluator: it replicates ``Node::apply`` of every
operator including the stateful aggregation ops ($each_n / $each_t /
$gate / $limit — reference: reductstore/src/storage/query/condition/
operators/aggregation/*.rs) and the WhenFilter record pipeline with
#ctx_before / #ctx_after buffers, #select_labels projection, strict mode
and $limit Interrupt (reference: filters/when.rs:25-107,
filters/when/ctx_before.rs:60-82, ctx_after.rs:52-70).

Used (a) inside ``applyInPandas`` for stateful queries (per entry, rows
sorted by ts) and (b) as the oracle for unit tests of the Column compiler.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone
from typing import Dict, List, Optional
from zoneinfo import ZoneInfo

from . import values as V
from .ast import ComputedRef, Const, LabelRef, Node, Op
from .values import CondError, Interrupt, Value


@dataclass
class Context:
    """Evaluation context for one record (reference: condition.rs:19-36)."""
    timestamp: int = 0  # UNIX µs (u64 in reference)
    labels: Dict[str, str] = field(default_factory=dict)
    computed_labels: Dict[str, str] = field(default_factory=dict)


_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)


def _dt_from_us(us: int) -> datetime:
    return _EPOCH + timedelta(microseconds=us)


_US_PER_DAY = 86_400_000_000


def _tz_offset_us(tz, ts_us: int) -> int:
    """UTC offset (µs) of ``tz`` at the instant ``ts_us``.

    Beyond Python's datetime range the instant is mapped to a proxy year
    with the same position in the 400-year Gregorian cycle (146097 days is
    divisible by 7, so month/day/weekday all match) — tz rules are either
    periodic (extrapolated last rule, as chrono-tz does) or constant (LMT
    for the far past), so the proxy offset is exact.
    """
    try:
        off = _dt_from_us(ts_us).astimezone(tz).utcoffset()
        return int(off.total_seconds() * 1_000_000)
    except (OverflowError, OSError, ValueError):
        days = ts_us // _US_PER_DAY
        rem = ts_us - days * _US_PER_DAY
        from .values import _civil_from_days, _days_from_civil
        y, m, d = _civil_from_days(days)
        # only the first/last hours of years 1/9999 can land here besides
        # out-of-range years (astimezone under/overflows at datetime.min/
        # max with a UTC-/+ zone).  The near-max corner must take the
        # extrapolated-modern-rule proxy (chrono-tz's last rule); the
        # near-min corner and the far past take the LMT-era proxy
        # (chrono-tz's first timespan).
        proxy_y = 2400 + (y - 2400) % 400 if y >= 9999 else 400 + y % 400
        proxy_us = _days_from_civil(proxy_y, m, d) * _US_PER_DAY + rem
        off = _dt_from_us(proxy_us).astimezone(tz).utcoffset()
        return int(off.total_seconds() * 1_000_000)


class Evaluator:
    """Stateful evaluator instance for one AST node.

    A fresh Evaluator tree must be built per (query, entry) since stateful
    operators carry mutable counters across records of one ordered scan.
    """

    def __init__(self, node: Node):
        self.node = node
        if isinstance(node, Op):
            self.children = [Evaluator(o) for o in node.operands]
            # per-instance operator state
            self._count = 0  # $each_n / $limit
            self._last_ts: Optional[int] = None  # $each_t / $gate
            self._gate_deadline: Optional[int] = None
            self._prev_input = False
            self._reset_required = False
        else:
            self.children = []

    # -- state (for streaming checkpoints) -------------------------------
    def get_state(self) -> list:
        """Collect mutable operator state in DFS order (for
        applyInPandasWithState across micro-batches)."""
        out = []
        if isinstance(self.node, Op):
            out.append((self._count, self._last_ts, self._gate_deadline,
                        self._prev_input, self._reset_required))
            for c in self.children:
                out.extend(c.get_state())
        return out

    def set_state(self, state: list) -> None:
        self._restore(iter(state))

    def _restore(self, it) -> None:
        if isinstance(self.node, Op):
            (self._count, self._last_ts, self._gate_deadline,
             self._prev_input, self._reset_required) = next(it)
            for c in self.children:
                c._restore(it)

    # -- public ----------------------------------------------------------
    def apply(self, ctx: Context) -> Value:
        node = self.node
        if isinstance(node, Const):
            return node.value
        if isinstance(node, LabelRef):
            if node.name not in ctx.labels:
                raise CondError(f"Reference '&{node.name}' not found")
            return V.parse_str_value(ctx.labels[node.name])
        if isinstance(node, ComputedRef):
            if node.name not in ctx.computed_labels:
                raise CondError(f"Reference '@{node.name}' not found")
            return V.parse_str_value(ctx.computed_labels[node.name])
        return self._apply_op(node, ctx)

    # -- operators -------------------------------------------------------
    def _apply_op(self, node: Op, ctx: Context) -> Value:
        name = node.name
        ch = self.children

        # logical (short-circuiting exactly like all_of.rs / any_of.rs)
        if name == "$and":
            for c in ch:
                if not V.as_bool(c.apply(ctx)):
                    return V.vbool(False)
            return V.vbool(True)
        if name == "$or":
            for c in ch:
                if V.as_bool(c.apply(ctx)):
                    return V.vbool(True)
            return V.vbool(False)
        if name == "$not":
            for c in ch:
                if V.as_bool(c.apply(ctx)):
                    return V.vbool(False)
            return V.vbool(True)
        if name == "$xor":
            count = sum(1 for c in ch if V.as_bool(c.apply(ctx)))
            return V.vbool(count == 1)
        if name == "$in":
            head = ch[0].apply(ctx)
            return V.vbool(any(V.val_eq(c.apply(ctx), head) for c in ch[1:]))
        if name == "$nin":
            head = ch[0].apply(ctx)
            return V.vbool(not any(V.val_eq(c.apply(ctx), head) for c in ch[1:]))

        # comparison
        if name == "$eq":
            return V.vbool(V.val_eq(ch[0].apply(ctx), ch[1].apply(ctx)))
        if name == "$ne":
            return V.vbool(not V.val_eq(ch[0].apply(ctx), ch[1].apply(ctx)))
        # orderings are Rust PartialOrd: unordered (string-vs-non-string,
        # NaN) -> partial_cmp None -> FALSE, not an error (gt.rs et al.)
        if name == "$gt":
            c = V.val_cmp(ch[0].apply(ctx), ch[1].apply(ctx))
            return V.vbool(c is not None and c > 0)
        if name == "$gte":
            c = V.val_cmp(ch[0].apply(ctx), ch[1].apply(ctx))
            return V.vbool(c is not None and c >= 0)
        if name == "$lt":
            c = V.val_cmp(ch[0].apply(ctx), ch[1].apply(ctx))
            return V.vbool(c is not None and c < 0)
        if name == "$lte":
            c = V.val_cmp(ch[0].apply(ctx), ch[1].apply(ctx))
            return V.vbool(c is not None and c <= 0)

        # arithmetic
        if name == "$add":
            return V.val_add(ch[0].apply(ctx), ch[1].apply(ctx))
        if name == "$sub":
            return V.val_sub(ch[0].apply(ctx), ch[1].apply(ctx))
        if name == "$mult":
            return V.val_mult(ch[0].apply(ctx), ch[1].apply(ctx))
        if name == "$div":
            return V.val_div(ch[0].apply(ctx), ch[1].apply(ctx))
        if name == "$div_num":
            return V.val_div_num(ch[0].apply(ctx), ch[1].apply(ctx))
        if name == "$rem":
            return V.val_rem(ch[0].apply(ctx), ch[1].apply(ctx))
        if name == "$abs":
            return V.val_abs(ch[0].apply(ctx))

        # string
        if name == "$contains":
            return V.vbool(V.val_contains(ch[0].apply(ctx), ch[1].apply(ctx)))
        if name == "$starts_with":
            return V.vbool(V.val_starts_with(ch[0].apply(ctx), ch[1].apply(ctx)))
        if name == "$ends_with":
            return V.vbool(V.val_ends_with(ch[0].apply(ctx), ch[1].apply(ctx)))

        # date (operators/date/*.rs; weekday 0=Monday)
        if name in ("$second", "$minute", "$hour", "$day", "$month", "$year", "$weekday"):
            return self._apply_date(name, ctx)

        # misc
        if name == "$exists":
            for c in ch:
                v = c.apply(ctx)
                if V.to_display(v) not in ctx.labels:
                    return V.vbool(False)
            return V.vbool(True)
        if name == "$cast":
            val = ch[0].apply(ctx)
            type_name = V.to_display(ch[1].apply(ctx))
            return V.val_cast(val, type_name)
        if name == "$ref":
            label = V.to_display(ch[0].apply(ctx))
            if label not in ctx.labels:
                raise CondError(f"Reference '&{label}' not found")
            return V.parse_str_value(ctx.labels[label])
        if name == "$timestamp":
            return V.vint(ctx.timestamp)

        # stateful aggregation
        if name == "$each_n":
            return self._apply_each_n(ctx)
        if name == "$each_t":
            return self._apply_each_t(ctx)
        if name == "$gate":
            return self._apply_gate(ctx)
        if name == "$limit":
            return self._apply_limit(ctx)

        raise CondError(f"Operator '{name}' not supported")

    def _apply_date(self, name: str, ctx: Context) -> Value:
        ts = V.as_int(self.children[0].apply(ctx))
        if not (V.TS_US_MIN <= ts <= V.TS_US_MAX):
            # date.rs:40-46 — from_timestamp_micros returns None
            raise CondError(
                f"{name} requires a valid timestamp in microseconds, got {ts}")
        if len(self.children) == 2:
            tzv = self.children[1].apply(ctx)
            if tzv.kind != V.STRING:
                raise CondError(f"{name} requires timezone to be a string")
            try:
                tz = ZoneInfo(tzv.val)
            except Exception:
                raise CondError(f"Invalid timezone: '{tzv.val}'")
        else:
            tz = None  # UTC fast path, offset 0
        # Civil fields are computed arithmetically (Hinnant) so the whole
        # chrono range (years +/-262144) works even beyond Python's
        # datetime limits — matching chrono and the compiled tiers.
        local = ts if tz is None else ts + _tz_offset_us(tz, ts)
        days = local // _US_PER_DAY
        rem = local - days * _US_PER_DAY
        if name == "$second":
            return V.vint((rem // 1_000_000) % 60)
        if name == "$minute":
            return V.vint((rem // 60_000_000) % 60)
        if name == "$hour":
            return V.vint(rem // 3_600_000_000)
        if name == "$weekday":
            # 1970-01-01 was Thursday; Monday == 0 (num_days_from_monday)
            return V.vint((days + 3) % 7)
        y, m, d = V._civil_from_days(days)
        if name == "$day":
            return V.vint(d)
        if name == "$month":
            return V.vint(m)
        return V.vint(y)  # $year

    # -- stateful ops (aggregation/*.rs) ---------------------------------
    def _apply_each_n(self, ctx: Context) -> Value:
        # each_n.rs:33-49 — counter pre-increments, so records n, 2n, ... pass
        self._count += 1
        n = V.as_int(self.children[0].apply(ctx))
        if n == 0:
            raise CondError("Value '0' is not a valid operand for $each_n")
        return V.vbool(self._count % n == 0)

    def _apply_each_t(self, ctx: Context) -> Value:
        # each_t.rs:36-66 — first record primes last_timestamp (emits False
        # unless period <= 0); resets when time goes backwards
        if self._last_ts is None:
            self._last_ts = ctx.timestamp
        value = self.children[0].apply(ctx)
        if value.kind == V.DURATION:
            s = V.as_float(value) / 1_000_000.0
        else:
            s = V.as_float(value)
        if ctx.timestamp < self._last_ts:
            self._last_ts = ctx.timestamp
            return V.vbool(False)
        # (s * 1e6) as u64 in Rust: truncate, negatives/NaN -> 0,
        # inf -> u64::MAX ("inf"/"1e309" label values parse to f64 inf)
        thresh_us = V._f64_as_u64(s * 1_000_000.0)
        ret = ctx.timestamp - self._last_ts >= thresh_us
        if ret:
            self._last_ts = ctx.timestamp
        return V.vbool(ret)

    def _apply_gate(self, ctx: Context) -> Value:
        # gate.rs:78-121 — edge-triggered gate with reset latch
        if self._last_ts is not None and ctx.timestamp < self._last_ts:
            self._gate_deadline = None
            self._prev_input = False
            self._reset_required = False
        self._last_ts = ctx.timestamp

        dval = self.children[0].apply(ctx)
        if dval.kind == V.DURATION:
            duration = V.as_int(dval)
        else:
            # gate.rs:50 `(f * 1e6) as i64`: saturating Rust cast — a
            # float inf duration must not raise (Python int(inf) would)
            duration = V._f64_as_i64(V.as_float(dval) * 1_000_000.0)
        duration = max(0, duration)
        inp = V.as_bool(self.children[1].apply(ctx))

        # 1) expire active window, arm reset latch
        if self._gate_deadline is not None and ctx.timestamp >= self._gate_deadline:
            self._gate_deadline = None
            self._reset_required = True

        # 2) after timeout, force false until input seen false once
        if self._reset_required:
            if not inp:
                self._reset_required = False
            self._prev_input = inp
            return V.vbool(False)

        # 3) open a new window only on a rising edge
        if self._gate_deadline is None and not self._prev_input and inp:
            self._gate_deadline = ctx.timestamp + duration

        # 4) while open, mirror input; else force false
        if self._gate_deadline is not None and ctx.timestamp < self._gate_deadline:
            out = inp
        else:
            out = False
        self._prev_input = inp
        return V.vbool(out)

    def _apply_limit(self, ctx: Context) -> Value:
        # limit.rs:31-40 — pass first N, then Interrupt aborts the scan
        self._count += 1
        n = V.as_int(self.children[0].apply(ctx))
        if self._count > n:
            raise Interrupt()
        return V.vbool(True)


# ---------------------------------------------------------------------------
# WhenFilter pipeline (filters/when.rs) — record-stream semantics with
# context padding, label selection, strict mode, and Interrupt.
# ---------------------------------------------------------------------------

@dataclass
class Padding:
    is_duration: bool
    value: int  # records count or µs


def _parse_padding(directive: Optional[List[Value]], key: str) -> Padding:
    if directive is None:
        return Padding(False, 0)
    if len(directive) != 1:
        raise CondError(f"{key} must be a single value")
    v = directive[0]
    try:
        val = V.as_int(v)
    except CondError as e:
        raise CondError(f"{key} must be an integer or duration: {e}")
    if val < 0:
        raise CondError(f"{key} must be non-negative")
    return Padding(v.kind == V.DURATION, val)


class WhenFilter:
    """Record-by-record filter with the full WhenFilter contract.

    ``feed(record)`` returns a list of records to emit (possibly empty);
    raises StopIteration-like termination by returning None on Interrupt
    (reference: filters/when.rs:60-107).
    """

    def __init__(self, node: Node, directives: Dict[str, List[Value]], strict: bool = False):
        self.evaluator = Evaluator(node)
        self.strict = strict
        self.ctx_before = _parse_padding(directives.get("#ctx_before"), "#ctx_before")
        self.ctx_after = _parse_padding(directives.get("#ctx_after"), "#ctx_after")
        sel = directives.get("#select_labels")
        if sel is not None:
            if not sel:
                raise CondError("#select_labels must contain at least one label")
            for s in sel:
                if s.kind != V.STRING:
                    raise CondError("#select_labels must contain only string values")
            self.select_labels = {s.val for s in sel}
        else:
            self.select_labels = None
        self._buffer: deque = deque()
        self._after_count = 0
        self._after_last_ts: Optional[int] = None

    # ctx_before.rs:60-82
    def _queue(self, record) -> None:
        self._buffer.append(record)
        if not self.ctx_before.is_duration:
            if len(self._buffer) > self.ctx_before.value + 1:
                self._buffer.popleft()
        else:
            last_ts = self._buffer[-1].timestamp
            while self._buffer and last_ts - self._buffer[0].timestamp > self.ctx_before.value:
                self._buffer.popleft()

    # ctx_after.rs:52-70
    def _check_after(self, condition: bool, ts: int) -> bool:
        if not self.ctx_after.is_duration:
            self._after_count -= 1
            if condition:
                self._after_count = self.ctx_after.value
            return self._after_count >= 0
        else:
            if condition:
                self._after_last_ts = ts
            return self._after_last_ts is not None and self._after_last_ts + self.ctx_after.value >= ts

    def _select(self, record):
        if self.select_labels is None:
            return record
        return record.with_labels(
            {k: v for k, v in record.labels.items() if k in self.select_labels}
        )

    # -- state (for streaming checkpoints) -------------------------------
    def get_state(self) -> dict:
        """Everything that must survive a micro-batch boundary: operator
        state, the ctx_before buffer, and the after-latch counters."""
        return {
            "ops": self.evaluator.get_state(),
            "buffer": [(r.timestamp, r.labels, r.computed_labels, r.extra)
                       for r in self._buffer],
            "after_count": self._after_count,
            "after_last_ts": self._after_last_ts,
        }

    def set_state(self, st: dict) -> None:
        self.evaluator.set_state(st["ops"])
        self._buffer = deque(FilterRecord(t, lb, cp, x)
                             for t, lb, cp, x in st["buffer"])
        self._after_count = st["after_count"]
        self._after_last_ts = st["after_last_ts"]

    def feed(self, record) -> Optional[list]:
        """Returns records to emit, or None to stop the scan (Interrupt)."""
        self._queue(record)
        rec = self._buffer[-1]
        ctx = Context(rec.timestamp, rec.labels, rec.computed_labels)
        try:
            result = V.as_bool(self.evaluator.apply(ctx))
        except Interrupt:
            return None
        except CondError:
            if self.strict:
                raise
            result = False
        if self._check_after(result, rec.timestamp):
            out = [self._select(r) for r in self._buffer]
            self._buffer.clear()
            return out
        return []


class FilterRecord:
    """Minimal record for the WhenFilter pipeline."""

    __slots__ = ("timestamp", "labels", "computed_labels", "extra")

    def __init__(self, timestamp: int, labels=None, computed_labels=None, extra=None):
        self.timestamp = timestamp
        self.labels = labels or {}
        self.computed_labels = computed_labels or {}
        self.extra = extra  # opaque payload (e.g. original row index)

    def with_labels(self, labels):
        return FilterRecord(self.timestamp, labels, self.computed_labels, self.extra)
