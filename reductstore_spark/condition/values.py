"""Dynamic value model of the ReductStore condition language.

Re-implements, in pure Python, the value semantics of the reference's
``Value`` enum (reference: reductstore/src/storage/query/condition/value.rs:33-39)
with kinds Bool | Int | Float | String | Duration(µs).

Label values are stored as strings and parsed dynamically at evaluation
time with try-order bool -> i64 -> f64 -> string (value.rs:51-61).

This module is the single source of truth for coercion rules; both the
row-at-a-time interpreter (stateful operators) and the Catalyst Column
compiler (stateless fast path) mirror it.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Union

# value kinds
BOOL = 0
INT = 1
FLOAT = 2
STRING = 3
DURATION = 4

_KIND_NAMES = {BOOL: "bool", INT: "int", FLOAT: "float", STRING: "string", DURATION: "duration"}

I64_MIN = -(2**63)
I64_MAX = 2**63 - 1


class CondError(Exception):
    """Condition evaluation error (reference: ReductError unprocessable_entity)."""


class Interrupt(Exception):
    """Raised by $limit to abort the scan (reference: ErrorCode::Interrupt,
    limit.rs:33-40, filters/when.rs:84-86)."""


@dataclass(frozen=True)
class Value:
    kind: int
    val: Union[bool, int, float, str]

    def __repr__(self) -> str:  # pragma: no cover - debug aid
        return f"Value({_KIND_NAMES[self.kind]}, {self.val!r})"


def vbool(v: bool) -> Value:
    return Value(BOOL, bool(v))


def vint(v: int) -> Value:
    return Value(INT, _wrap_i64(int(v)))


def vfloat(v: float) -> Value:
    return Value(FLOAT, float(v))


def vstr(v: str) -> Value:
    return Value(STRING, v)


def vdur(v: int) -> Value:
    return Value(DURATION, _wrap_i64(int(v)))


def _wrap_i64(v: int) -> int:
    """Keep ints in i64 range (Rust release-mode wrapping arithmetic)."""
    return (v - I64_MIN) % (2**64) + I64_MIN


def _trunc_div_i64(x: int, d: int) -> int:
    """Rust i64 `/`: exact division truncating toward zero."""
    q = abs(x) // abs(d)
    return -q if (x < 0) != (d < 0) else q


def _parse_i64(s: str) -> int:
    """Rust ``str::parse::<i64>`` equivalent: optional sign + digits only."""
    t = s
    if not t:
        raise ValueError("empty")
    body = t[1:] if t[0] in "+-" else t
    if not body or not body.isascii() or not body.isdigit():
        raise ValueError(f"invalid i64: {s!r}")
    v = int(t)
    if v < I64_MIN or v > I64_MAX:
        raise ValueError("out of i64 range")
    return v


def _parse_f64(s: str) -> float:
    """Rust ``str::parse::<f64>`` equivalent (no whitespace, inf/NaN ok)."""
    t = s
    if not t or t != t.strip():
        raise ValueError(f"invalid f64: {s!r}")
    low = t.lower()
    if low in ("inf", "+inf", "-inf", "infinity", "+infinity", "-infinity", "nan", "+nan", "-nan"):
        return float(low.replace("infinity", "inf"))
    # Python float() accepts '_' separators and surrounding space; Rust doesn't.
    if "_" in t or " " in t:
        raise ValueError(f"invalid f64: {s!r}")
    return float(t)


def parse_str_value(s: str) -> Value:
    """Dynamic parse of a label string: bool -> i64 -> f64 -> string
    (reference value.rs:51-61; bool parse accepts exactly 'true'/'false')."""
    if s == "true":
        return Value(BOOL, True)
    if s == "false":
        return Value(BOOL, False)
    try:
        return Value(INT, _parse_i64(s))
    except ValueError:
        pass
    try:
        return Value(FLOAT, _parse_f64(s))
    except ValueError:
        pass
    return Value(STRING, s)


# ---------------------------------------------------------------------------
# Coercions (value.rs:64-112)
# ---------------------------------------------------------------------------

def as_bool(v: Value) -> bool:
    if v.kind == BOOL:
        return v.val
    if v.kind in (INT, DURATION):
        return v.val != 0
    if v.kind == FLOAT:
        return v.val != 0.0
    return len(v.val) != 0  # string: non-empty


def as_int(v: Value) -> int:
    if v.kind == BOOL:
        return 1 if v.val else 0
    if v.kind in (INT, DURATION):
        return v.val
    if v.kind == FLOAT:
        return _f64_as_i64(v.val)
    try:
        return _parse_i64(v.val)
    except ValueError:
        raise CondError(f"Value '{v.val}' could not be parsed as integer")


def as_float(v: Value) -> float:
    if v.kind == BOOL:
        return 1.0 if v.val else 0.0
    if v.kind in (INT, DURATION):
        return float(v.val)
    if v.kind == FLOAT:
        return v.val
    try:
        return _parse_f64(v.val)
    except ValueError:
        raise CondError(f"Value '{v.val}' could not be parsed as float")


def _days_from_civil(y: int, m: int, d: int) -> int:
    """Proleptic-Gregorian days since 1970-01-01 (Hinnant's algorithm) —
    no datetime range limits, used only for the chrono-bound constants."""
    y -= m <= 2
    # Hinnant's C++ uses truncating division and compensates with (y - 399)
    # for negative years; Python's // already floors, so the compensation
    # must be dropped or the era is double-adjusted (off-by-one-day at the
    # negative chrono bound).
    era = y // 400
    yoe = y - era * 400
    doy = (153 * (m + (-3 if m > 2 else 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _civil_from_days(z: int) -> tuple:
    """Inverse of _days_from_civil: (y, m, d) for days-since-epoch —
    valid over the whole chrono range, no datetime limits."""
    z += 719468
    era = z // 146097  # Python // floors; no truncation compensation
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + (3 if mp < 10 else -9)
    return y + (m <= 2), m, d


# chrono DateTime::from_timestamp_micros range (NaiveDate MIN/MAX years
# -262144 / 262143): outside it the reference's date operators error
# ("requires a valid timestamp in microseconds", operators/date.rs:40-46)
TS_US_MAX = (_days_from_civil(262143, 12, 31) * 86400 + 86399) * 1_000_000 + 999_999
TS_US_MIN = _days_from_civil(-262144, 1, 1) * 86400 * 1_000_000


def _f64_as_i64(f: float) -> int:
    """Rust ``f64 as i64``: truncate toward zero, saturate, NaN -> 0."""
    if f != f:  # NaN
        return 0
    if f <= I64_MIN:
        return I64_MIN
    if f >= I64_MAX:
        return I64_MAX
    return int(f)  # Python int() truncates toward zero


U64_MAX = 2**64 - 1


def _f64_as_u64(f: float) -> int:
    """Rust ``f64 as u64``: truncate toward zero, saturate, NaN -> 0
    (negatives and NaN clamp to the 0 bound; inf to u64::MAX)."""
    if f != f or f <= 0:
        return 0
    if f >= 2**64:
        return U64_MAX
    return int(f)


def _fmt_float(f: float) -> str:
    """Rust ``{}`` Display for f64: 1.0 -> '1', 0.5 -> '0.5'.

    Rust's Display never uses scientific notation — it prints the
    shortest-roundtrip digits expanded to plain decimal ('0.00000015',
    '10000000000000000'), and renders negative zero as '-0'."""
    if f != f:
        return "NaN"
    if f == float("inf"):
        return "inf"
    if f == float("-inf"):
        return "-inf"
    if f == 0.0:
        import math
        return "-0" if math.copysign(1.0, f) < 0 else "0"
    if f == int(f) and abs(f) < 1e16:
        return str(int(f))
    return _expand_sci(repr(f))


def _expand_sci(s: str) -> str:
    """Expand Python's shortest-roundtrip repr to plain decimal (Rust {})."""
    if "e" not in s and "E" not in s:
        return s
    m, e = s.replace("E", "e").split("e")
    exp = int(e)
    sign = "-" if m.startswith("-") else ""
    m = m.lstrip("+-")
    ip, _, fp = m.partition(".")
    digits = (ip + fp).rstrip("0") or "0"
    point = len(ip) + exp  # decimal point position within `digits`
    if point <= 0:
        return sign + "0." + "0" * (-point) + digits
    if point >= len(digits):
        return sign + digits + "0" * (point - len(digits))
    return sign + digits[:point] + "." + digits[point:]


def to_display(v: Value) -> str:
    """Reference Display impl (value.rs:131-140)."""
    if v.kind == BOOL:
        return "true" if v.val else "false"
    if v.kind == INT:
        return str(v.val)
    if v.kind == FLOAT:
        return _fmt_float(v.val)
    if v.kind == STRING:
        return v.val
    return fmt_duration(v.val)


# ---------------------------------------------------------------------------
# Comparison (value/cmp.rs:6-71)
# ---------------------------------------------------------------------------

def _is_num(v: Value) -> bool:
    return v.kind != STRING


def _numeric_pair(a: Value, b: Value):
    """Return (x, y) as comparable numbers, promoting to float if either is
    float, else both i64 (bool as 0/1, duration == int)."""
    if a.kind == FLOAT or b.kind == FLOAT:
        return as_float(a), as_float(b)
    return as_int(a), as_int(b)


def val_eq(a: Value, b: Value) -> bool:
    if a.kind == STRING or b.kind == STRING:
        if a.kind == STRING and b.kind == STRING:
            return a.val == b.val
        return False  # string vs non-string: never equal
    x, y = _numeric_pair(a, b)
    return x == y


def val_cmp(a: Value, b: Value) -> Optional[int]:
    """Returns -1/0/1, or None for unordered pairs.

    The reference's comparison operators are Rust PartialOrd:
    `Ok(Value::Bool(value_1 > value_2))` (operators/comparison/gt.rs),
    where partial_cmp yields None for string-vs-non-string (cmp.rs
    String arms) and for NaN (f64 PartialOrd) — so $gt/$gte/$lt/$lte on
    an unordered pair evaluate to FALSE, never to an error (round-4
    correction: rounds 1-3 wrongly raised here)."""
    if a.kind == STRING or b.kind == STRING:
        if a.kind == STRING and b.kind == STRING:
            return (a.val > b.val) - (a.val < b.val)
        return None  # partial_cmp None
    x, y = _numeric_pair(a, b)
    if x != x or y != y:  # NaN: partial_cmp None
        return None
    return (x > y) - (x < y)


# ---------------------------------------------------------------------------
# Arithmetic (value/arithmetic/*.rs)
# ---------------------------------------------------------------------------

_ADD_ERRS = {
    (BOOL, STRING): "Cannot add boolean to string",
    (INT, STRING): "Cannot add integer to string",
    (DURATION, STRING): "Cannot add duration to string",
    (FLOAT, STRING): "Cannot add float to string",
    (STRING, BOOL): "Cannot add string to boolean",
    (STRING, INT): "Cannot add string to integer",
    (STRING, FLOAT): "Cannot add string to float",
    (STRING, DURATION): "Cannot add string to duration",
}


def val_add(a: Value, b: Value) -> Value:
    if a.kind == STRING and b.kind == STRING:
        return vstr(a.val + b.val)
    if a.kind == STRING or b.kind == STRING:
        raise CondError(_ADD_ERRS[(a.kind, b.kind)])
    if a.kind == FLOAT or b.kind == FLOAT:
        return vfloat(as_float(a) + as_float(b))
    return vint(as_int(a) + as_int(b))


def val_sub(a: Value, b: Value) -> Value:
    if a.kind == STRING or b.kind == STRING:
        raise CondError("Cannot subtract string")
    if a.kind == FLOAT or b.kind == FLOAT:
        return vfloat(as_float(a) - as_float(b))
    return vint(as_int(a) - as_int(b))


def val_mult(a: Value, b: Value) -> Value:
    if a.kind == STRING or b.kind == STRING:
        raise CondError("Cannot multiply string")
    if a.kind == FLOAT or b.kind == FLOAT:
        return vfloat(as_float(a) * as_float(b))
    return vint(as_int(a) * as_int(b))


def val_div(a: Value, b: Value) -> Value:
    """True division -> Float always (div.rs: [3,2] -> 1.5)."""
    if a.kind == STRING:
        raise CondError("Cannot divide string")
    if b.kind == STRING:
        raise CondError("Cannot divide by string")
    d = as_float(b)
    if d == 0.0:
        raise CondError("Cannot divide by zero")
    return vfloat(as_float(a) / d)


def val_div_num(a: Value, b: Value) -> Value:
    """Integer division, truncating toward zero (Rust i64 `/`)."""
    if a.kind == STRING:
        raise CondError("Cannot divide string")
    if b.kind == STRING:
        raise CondError("Cannot divide by string")
    d = as_int(b)
    if d == 0:
        raise CondError("Cannot divide by zero")
    return vint(_trunc_div_i64(as_int(a), d))


def val_rem(a: Value, b: Value) -> Value:
    """Remainder with sign of dividend (Rust `%`): [-10,6] -> -4."""
    if a.kind == STRING or b.kind == STRING:
        raise CondError("Cannot divide by string")
    if a.kind == FLOAT or b.kind == FLOAT:
        x, y = as_float(a), as_float(b)
        import math
        # Rust f64 % follows IEEE: x % 0.0 and inf % y are NaN (Python's
        # fmod raises instead)
        if y == 0.0 or math.isinf(x) or math.isnan(x) or math.isnan(y):
            return vfloat(float("nan"))
        return vfloat(math.fmod(x, y))
    x, y = as_int(a), as_int(b)
    if y == 0:
        raise CondError("Cannot divide by zero")
    # truncated remainder, sign of dividend (exact integer math — going
    # through float division loses precision above 2**53)
    return vint(x - _trunc_div_i64(x, y) * y)


def val_abs(v: Value) -> Value:
    if v.kind == STRING:
        raise CondError("Cannot calculate absolute value of a string")
    if v.kind == BOOL:
        return vint(1 if v.val else 0)
    if v.kind == FLOAT:
        return vfloat(abs(v.val))
    return vint(abs(v.val))


# ---------------------------------------------------------------------------
# String ops (value/string/*.rs) -- operate on Display strings
# ---------------------------------------------------------------------------

def val_contains(a: Value, b: Value) -> bool:
    return to_display(b) in to_display(a)


def val_starts_with(a: Value, b: Value) -> bool:
    return to_display(a).startswith(to_display(b))


def val_ends_with(a: Value, b: Value) -> bool:
    return to_display(a).endswith(to_display(b))


# ---------------------------------------------------------------------------
# Cast (value/misc/cast.rs:22-36)
# ---------------------------------------------------------------------------

def val_cast(v: Value, type_name: str) -> Value:
    if type_name == "bool":
        return vbool(as_bool(v))
    if type_name == "int":
        return vint(as_int(v))
    if type_name == "float":
        return vfloat(as_float(v))
    if type_name == "string":
        return vstr(to_display(v))
    if type_name == "duration":
        return vdur(as_int(v))
    raise CondError(f"Unknown type '{type_name}'")


# ---------------------------------------------------------------------------
# Duration literals (core/duration.rs:11-49)
# ---------------------------------------------------------------------------

_DUR_UNITS = {
    "us": 1,
    "ms": 1_000,
    "s": 1_000_000,
    "m": 60_000_000,
    "h": 3_600_000_000,
    "d": 86_400_000_000,
}


def parse_duration_us(s: str) -> int:
    """Parse a duration literal ('1h -30m', '100ms 500us') to µs.

    Raises ValueError on invalid input (caller decides whether a plain
    string constant falls back to Value::String)."""
    if not s.strip():
        raise ValueError("Duration literal cannot be empty")
    total = 0
    for part in s.split():
        num = "".join(c for c in part if c.isdigit() or c in ".-")
        unit = "".join(c for c in part if not (c.isdigit() or c in ".-"))
        if unit not in _DUR_UNITS:
            raise ValueError(f"Invalid duration unit: {unit}")
        try:
            v = _parse_i64(num)
        except ValueError:
            raise ValueError(f"Invalid duration value: {part}")
        # the reference's `value * unit` and `total += part` are release
        # i64 ops (core/duration.rs:17-44): out-of-range literals like
        # '106751991168d' wrap rather than widen
        total = _wrap_i64(total + _wrap_i64(v * _DUR_UNITS[unit]))
    return total


_DUR_FMT_UNITS = [
    ("d", 86_400_000_000),
    ("h", 3_600_000_000),
    ("m", 60_000_000),
    ("s", 1_000_000),
    ("ms", 1_000),
    ("us", 1),
]


def fmt_duration(us: int) -> str:
    """Display formatting for Duration values
    (condition/value/duration_format.rs:29-50)."""
    parts = []
    rest = us
    for unit, size in _DUR_FMT_UNITS:
        if abs(rest) >= size:
            # i64 division truncating toward zero (duration_format.rs uses
            # pure integer ops; float division drifts above 2^53 µs)
            value = abs(rest) // size
            if rest < 0:
                value = -value
            parts.append(f"{value}{unit}")
            rest -= value * size
    if not parts:
        parts.append("0us")
    return " ".join(parts)
