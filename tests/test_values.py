"""Pure-Python semantics tests: value coercions, duration literals, and the
reference's operator truth table run through the interpreter.

Golden cases ported from reference tests:
condition/parser.rs:699-781 (operator truth table),
condition/value/cmp.rs:73+ (coercion matrices),
core/duration.rs:51-70 (duration literals).
"""

import json

import pytest

from reductstore_spark.condition import values as V
from reductstore_spark.condition.interpreter import Context, Evaluator
from reductstore_spark.condition.parser import parse_when
from reductstore_spark.condition.values import (
    CondError,
    fmt_duration,
    parse_duration_us,
    parse_str_value,
    vbool,
    vdur,
    vfloat,
    vint,
    vstr,
)


def evaluate(cond, ts=0, labels=None):
    node, _ = parse_when(json.loads(cond) if isinstance(cond, str) else cond)
    return V.as_bool(Evaluator(node).apply(Context(ts, labels or {})))


CTX_LABELS = {"label": "10"}

# one case per operator: {"$eq": [expected, {op: operands}]} must be truthy
# (parser.rs:699-781)
TRUTH_TABLE = [
    '{"$eq":[3.0, {"$add": [1, 2.0]}]}',
    '{"$eq":[-1, {"$sub": [1, 2]}]}',
    '{"$eq":[6, {"$mult": [2, 3]}]}',
    '{"$eq":[1.5, {"$div": [3, 2]}]}',
    '{"$eq":[1, {"$div_num": [3, 2]}]}',
    '{"$eq":[-4, {"$rem": [-10, 6]}]}',
    '{"$eq":[10, {"$abs": [-10]}]}',
    '{"$eq":[false, {"$and": [true, false]}]}',
    '{"$eq":[false, {"$all_of": [true, false]}]}',
    '{"$eq":[true, {"$or": [true, false]}]}',
    '{"$eq":[true, {"$any_of": [true, false]}]}',
    '{"$eq":[false, {"$not": [true]}]}',
    '{"$eq":[false, {"$none_of": [true, true]}]}',
    '{"$eq":[false, {"$xor": [true, true]}]}',
    '{"$eq":[false, {"$one_of": [true, true]}]}',
    '{"$in": ["a", "a", "b"]}',
    '{"$eq":[false, {"$nin": ["a", "a", "b"]}]}',
    '{"$eq":[10, 10]}',
    '{"$gt":[20, 10]}',
    '{"$gte":[20, 10]}',
    '{"$eq":[false, {"$lt": [20, 10]}]}',
    '{"$eq":[false, {"$lte": [20, 10]}]}',
    '{"$ne":[-10, 10]}',
    '{"$eq":[0, {"$second": [1704067200123456]}]}',
    '{"$eq":[0, {"$second": [1704067200123456, "Europe/Berlin"]}]}',
    '{"$eq":[0, {"$minute": [1704067200123456]}]}',
    '{"$eq":[0, {"$minute": [1704067200123456, "Europe/Berlin"]}]}',
    '{"$eq":[0, {"$hour": [1704067200123456]}]}',
    '{"$eq":[1, {"$hour": [1704067200123456, "Europe/Berlin"]}]}',
    '{"$eq":[1, {"$day": [1704067200123456]}]}',
    '{"$eq":[31, {"$day": [1704067200123456, "America/New_York"]}]}',
    '{"$eq":[1, {"$month": [1704067200123456]}]}',
    '{"$eq":[12, {"$month": [1704067200123456, "America/New_York"]}]}',
    '{"$eq":[2024, {"$year": [1704067200123456]}]}',
    '{"$eq":[2023, {"$year": [1704067200123456, "America/New_York"]}]}',
    '{"$eq":[0, {"$weekday": [1704067200123456]}]}',
    '{"$eq":[6, {"$weekday": [1704067200123456, "America/New_York"]}]}',
    '{"$contains": ["abc", "b"]}',
    '{"$starts_with": ["abc", "ab"]}',
    '{"$ends_with": ["abc", "bc"]}',
    '{"$exists": ["label"]}',
    '{"$has": ["label"]}',
    '{"$eq":[10, {"$cast": [10.0, "int"]}]}',
    '{"$eq":[10, {"$ref": ["label"]}]}',
    '{"$eq":[0, "$timestamp"]}',
    '{"$eq":[0, "$id"]}',
]


@pytest.mark.parametrize("cond", TRUTH_TABLE)
def test_truth_table(cond):
    assert evaluate(cond, labels=CTX_LABELS) is True


def test_dynamic_parse_order():
    assert parse_str_value("true") == vbool(True)
    assert parse_str_value("false") == vbool(False)
    assert parse_str_value("10") == vint(10)
    assert parse_str_value("-3") == vint(-3)
    assert parse_str_value("1.5") == vfloat(1.5)
    assert parse_str_value("abc") == vstr("abc")
    assert parse_str_value("") == vstr("")
    assert parse_str_value("1e3") == vfloat(1000.0)
    # whitespace defeats numeric parse (Rust parse has no trimming)
    assert parse_str_value(" 5") == vstr(" 5")


def test_cross_type_eq():
    assert V.val_eq(vbool(True), vint(1))
    assert not V.val_eq(vbool(True), vint(-1))
    assert V.val_eq(vint(1), vfloat(1.0))
    assert V.val_eq(vint(1), vdur(1))
    assert not V.val_eq(vstr("1"), vint(1))  # string vs number: never equal
    assert not V.val_eq(vbool(True), vstr("true"))
    assert V.val_eq(vstr("x"), vstr("x"))


def test_string_number_ordering_is_false_not_error():
    """Rust PartialOrd: partial_cmp None for string-vs-non-string and
    NaN; the comparison operators wrap it as Bool(v1 > v2) so an
    unordered pair is FALSE, never an error (gt.rs; cmp.rs String/None
    arms).  Round-4 correction — rounds 1-3 wrongly raised here."""
    assert V.val_cmp(vstr("abc"), vint(1)) is None
    assert V.val_cmp(vfloat(float("nan")), vint(1)) is None
    node, _ = parse_when({"$or": [{"$gt": ["abc", 1]}, True]})
    assert V.as_bool(Evaluator(node).apply(Context(0, {})))  # no error
    for op in ("$gt", "$gte", "$lt", "$lte"):
        node, _ = parse_when({op: ["abc", 1]})
        assert not V.as_bool(Evaluator(node).apply(Context(0, {})))


def test_arithmetic_promotion():
    assert V.val_add(vint(1), vint(2)) == vint(3)
    assert V.val_add(vint(1), vfloat(2.0)) == vfloat(3.0)
    assert V.val_add(vbool(True), vbool(True)) == vint(2)
    assert V.val_add(vstr("a"), vstr("b")) == vstr("ab")
    with pytest.raises(CondError):
        V.val_add(vstr("a"), vint(1))
    assert V.val_div(vint(3), vint(2)) == vfloat(1.5)
    with pytest.raises(CondError):
        V.val_div(vint(1), vint(0))
    assert V.val_div_num(vint(-3), vint(2)) == vint(-1)  # trunc toward zero
    assert V.val_rem(vint(-10), vint(6)) == vint(-4)  # sign of dividend


def test_truthiness():
    assert V.as_bool(vint(5)) and not V.as_bool(vint(0))
    assert V.as_bool(vfloat(0.1)) and not V.as_bool(vfloat(0.0))
    assert V.as_bool(vstr("x")) and not V.as_bool(vstr(""))
    assert V.as_bool(vdur(1)) and not V.as_bool(vdur(0))


def test_duration_literals():
    assert parse_duration_us("100ms 500us") == 100_500
    assert parse_duration_us("1h -30m") == 1_800_000_000
    assert parse_duration_us("2d 3h") == 183_600_000_000
    assert parse_duration_us("15us") == 15
    assert parse_duration_us("-2s") == -2_000_000
    for bad in ["", "100xyz", "abc", "2.5m", "1h,2m"]:
        with pytest.raises(ValueError):
            parse_duration_us(bad)


def test_duration_format():
    assert fmt_duration(0) == "0us"
    assert fmt_duration(1) == "1us"
    assert fmt_duration(-1) == "-1us"
    assert fmt_duration(100_500) == "100ms 500us"
    assert fmt_duration(3_660_000_000) == "1h 1m"
    # i64-exact above 2^53 µs: float division would drift the us term
    big = 2**60 + 3
    assert fmt_duration(big) == (
        f"{big // 86_400_000_000}d "
        f"{big % 86_400_000_000 // 3_600_000_000}h "
        f"{big % 3_600_000_000 // 60_000_000}m "
        f"{big % 60_000_000 // 1_000_000}s "
        f"{big % 1_000_000 // 1_000}ms "
        f"{big % 1_000}us")


def test_string_escape_and_duration_constants():
    # "$$x" -> literal "$x"; bare "10s" -> Duration
    assert evaluate('{"$eq": ["$$x", "$$x"]}')
    node, _ = parse_when({"$eq": [{"$cast": ["10s", "int"]}, 10_000_000]})
    assert V.as_bool(Evaluator(node).apply(Context(0, {})))


def test_strict_vs_nonstrict_missing_label():
    node, _ = parse_when({"&missing": {"$gt": 1}})
    with pytest.raises(CondError):
        Evaluator(node).apply(Context(0, {}))  # raw evaluation errors


def test_object_vs_array_syntax_equivalent():
    a = evaluate('{"&label": {"$gt": 5}}', labels=CTX_LABELS)
    b = evaluate('{"$gt": ["&label", 5]}', labels=CTX_LABELS)
    assert a is True and b is True


def test_days_from_civil_hinnant_negative_years():
    """Python // floors already; the C++ (y-399) compensation must not be
    applied on top or the negative chrono bound is one day too low
    (round-3 ADVICE: _days_from_civil(-262144,1,1) was -96465659)."""
    from reductstore_spark.condition.values import _days_from_civil
    import datetime
    assert _days_from_civil(-262144, 1, 1) == -96465658
    assert _days_from_civil(262143, 12, 31) == 95026601
    # consistency with datetime across the representable range
    for y, m, d in [(1, 1, 1), (400, 2, 29), (1970, 1, 1), (2000, 3, 1),
                    (9999, 12, 31)]:
        assert _days_from_civil(y, m, d) == (
            datetime.date(y, m, d) - datetime.date(1970, 1, 1)).days
    # era boundaries around year 0 (proleptic): adjacent days differ by 1
    prev = None
    for y in range(-801, -797):
        v = _days_from_civil(y, 3, 1)
        if prev is not None:
            assert v - prev in (365, 366)
        prev = v


def test_chrono_bound_timestamps_interpreter_vs_bounds():
    """Exactly TS_US_MIN/MAX evaluate date fields; one past raises —
    in all three tiers (compiled tiers share the same constants)."""
    node, _ = parse_when({"$gte": [{"$year": ["&t"]}, -999999]})
    for ts, ok in [(V.TS_US_MIN, True), (V.TS_US_MAX, True),
                   (V.TS_US_MIN - 1, False), (V.TS_US_MAX + 1, False)]:
        ctx = Context(0, {"t": str(ts)})
        if ok:
            V.as_bool(Evaluator(node).apply(ctx))
        else:
            with pytest.raises(CondError):
                Evaluator(node).apply(ctx)


def test_overflow_digit_run_is_float_kind_display():
    """A digit run that overflows i64 parses as Float (value.rs parse
    order), so its Display is the float rendering, not the raw digits
    (fuzz-found via $contains)."""
    node, _ = parse_when(
        {"$contains": [{"$cast": ["&a", "string"]}, "9223372036854776000"]})
    assert V.as_bool(Evaluator(node).apply(
        Context(0, {"a": "9223372036854775808"})))
    node2, _ = parse_when(
        {"$contains": [{"$cast": ["&a", "string"]}, "9223372036854775808"]})
    assert not V.as_bool(Evaluator(node2).apply(
        Context(0, {"a": "9223372036854775808"})))


def test_add_display_is_exact_at_i64_edge():
    """Display of an Int-kind $add result uses exact i64 digits — the
    double lane rounds above 2**53 (fuzz-found via $contains)."""
    node, _ = parse_when({"$eq": [
        {"$cast": [{"$add": ["&c", "&b"]}, "string"]},
        "-8334632851199999999"]})
    labels = {"c": "1", "b": "-8334632851200000000"}
    assert V.as_bool(Evaluator(node).apply(Context(0, labels)))


def test_tz_offset_proxy_edges():
    """The astimezone-overflow proxy picks the rule era by which end of
    the datetime range overflowed: the last hours of year 9999 under a
    UTC+ zone take the extrapolated modern rule (chrono-tz's last rule),
    the first hours of year 1 under a UTC- zone and the far past take
    the LMT-era first timespan (ADVICE r3)."""
    from zoneinfo import ZoneInfo

    from reductstore_spark.condition.interpreter import _tz_offset_us

    ts_max = 253402300799999999   # 9999-12-31T23:59:59.999999Z
    y1 = -62135596800000000       # 0001-01-01T00:00:00Z
    tokyo = ZoneInfo("Asia/Tokyo")
    ny = ZoneInfo("America/New_York")
    # near-max overflow: modern +09:00, NOT Tokyo's LMT +09:18:59
    assert _tz_offset_us(tokyo, ts_max) == 9 * 3600 * 1_000_000
    # near-min underflow: New York LMT -04:56:02, NOT the modern rule
    assert _tz_offset_us(ny, y1) == -17762 * 1_000_000
    # near-max under a UTC- zone (no overflow): December -> EST
    assert _tz_offset_us(ny, ts_max) == -5 * 3600 * 1_000_000
    # far past stays LMT
    assert _tz_offset_us(ny, y1 - 400 * 146097 // 400 * 86_400_000_000) \
        == -17762 * 1_000_000


def test_duration_parse_wraps_like_release_i64():
    """core/duration.rs computes `value * unit` and `total += part` in
    release i64: an out-of-range literal wraps rather than widening
    (Python bigint would otherwise keep growing)."""
    max_days = (2**63 - 1) // 86_400_000_000  # 106751991
    assert parse_duration_us(f"{max_days}d") == max_days * 86_400_000_000
    over = (max_days + 1) * 86_400_000_000
    wrapped = (over + 2**63) % 2**64 - 2**63
    assert parse_duration_us(f"{max_days + 1}d") == wrapped
    assert parse_duration_us(f"{max_days + 1}d") < 0
    # the multi-part sum wraps too
    two = (2 * (max_days * 86_400_000_000) + 2**63) % 2**64 - 2**63
    assert parse_duration_us(f"{max_days}d {max_days}d") == two


def test_parse_when_does_not_mutate_caller_dict():
    """Directive parsing consumes '#' keys from an internal copy, not
    the caller's dict: re-planning with the same `when` (second query
    run, stream re-registration) must see the directives again (r4
    find: the second parse silently lost #ctx_before/#select_labels)."""
    when = {"#ctx_before": 2, "#select_labels": ["v"], "&v": {"$gte": 10}}
    snapshot = {"#ctx_before": 2, "#select_labels": ["v"],
                "&v": {"$gte": 10}}
    _, d1 = parse_when(when)
    _, d2 = parse_when(when)
    assert when == snapshot
    assert sorted(d1) == sorted(d2) == ["#ctx_before", "#select_labels"]
