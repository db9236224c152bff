"""Stateful operator sequences + WhenFilter pipeline, pure Python.

Golden sequences ported from reference tests: each_n.rs:60-90,
each_t.rs:78-140, gate.rs:125-260, limit.rs:55-65,
filters/when.rs:109-393 (ctx padding), ctx_before.rs / ctx_after.rs.
"""

import pytest

from reductstore_spark.condition import values as V
from reductstore_spark.condition.ast import Const, Op
from reductstore_spark.condition.interpreter import (
    Context,
    Evaluator,
    FilterRecord,
    WhenFilter,
)
from reductstore_spark.condition.parser import parse_when
from reductstore_spark.condition.values import CondError, Interrupt, vbool, vdur, vfloat, vint


def seq(ev, timestamps, labels=None):
    out = []
    for ts in timestamps:
        out.append(V.as_bool(ev.apply(Context(ts, labels or {}))))
    return out


class TestEachN:
    def test_keeps_every_nth(self):
        ev = Evaluator(Op("$each_n", [Const(vint(2))]))
        assert seq(ev, [0, 0, 0]) == [False, True, False]

    def test_zero_is_error(self):
        ev = Evaluator(Op("$each_n", [Const(vint(0))]))
        with pytest.raises(CondError):
            ev.apply(Context(0, {}))

    def test_string_operand_error(self):
        ev = Evaluator(Op("$each_n", [Const(V.vstr("foo"))]))
        with pytest.raises(CondError):
            ev.apply(Context(0, {}))


class TestEachT:
    @pytest.mark.parametrize("operand", [vfloat(0.1), vdur(100_000)])
    def test_emit_suppress_sequence(self, operand):
        ev = Evaluator(Op("$each_t", [Const(operand)]))
        assert seq(ev, [0, 1, 100_001, 100_002]) == [False, False, True, False]

    def test_zero_always_true(self):
        ev = Evaluator(Op("$each_t", [Const(vint(0))]))
        assert seq(ev, [0]) == [True]

    def test_time_backwards_resets(self):
        ev = Evaluator(Op("$each_t", [Const(vfloat(0.1))]))
        assert seq(ev, [200_000, 100_000, 200_000]) == [False, False, True]


class TestGate:
    def test_duration_literal_window(self):
        # gate.rs:137-158: open at 100, deadline 10_000_100
        ev = Evaluator(Op("$gate", [Const(vdur(10_000_000)), Const(vbool(True))]))
        assert seq(ev, [100, 9_999_999, 10_000_100, 10_000_101]) == \
            [True, True, False, False]

    def test_float_seconds(self):
        ev = Evaluator(Op("$gate", [Const(vfloat(0.1)), Const(vbool(True))]))
        assert seq(ev, [0, 99_999, 100_000]) == [True, True, False]

    def test_reset_cycle(self):
        node = Op("$gate", [Const(vdur(1)), Const(vbool(True))])
        ev = Evaluator(node)
        assert seq(ev, [0, 1, 2]) == [True, False, False]
        # input false once -> reset latch clears
        ev.children[1] = Evaluator(Const(vbool(False)))
        assert seq(ev, [3]) == [False]
        ev.children[1] = Evaluator(Const(vbool(True)))
        assert seq(ev, [4]) == [True]

    def test_time_backwards_resets(self):
        ev = Evaluator(Op("$gate", [Const(vdur(100_000)), Const(vbool(True))]))
        assert seq(ev, [200_000, 100_000]) == [True, True]


class TestLimit:
    def test_interrupt_after_n(self):
        ev = Evaluator(Op("$limit", [Const(vint(2))]))
        assert seq(ev, [0, 1]) == [True, True]
        with pytest.raises(Interrupt):
            ev.apply(Context(2, {}))


def run_filter(when, records, strict=False):
    node, dirs = parse_when(when)
    wf = WhenFilter(node, dirs, strict)
    out = []
    for ts, labels in records:
        emitted = wf.feed(FilterRecord(ts, labels, {}))
        if emitted is None:
            break
        out.extend((r.timestamp, r.labels) for r in emitted)
    return out


class TestWhenFilterPipeline:
    RECORDS = [(i * 1000, {"v": str(i)}) for i in range(10)]

    def test_plain(self):
        got = run_filter({"&v": {"$eq": 5}}, self.RECORDS)
        assert [ts for ts, _ in got] == [5000]

    def test_ctx_before_records(self):
        got = run_filter({"#ctx_before": 2, "&v": {"$eq": 5}}, self.RECORDS)
        assert [ts for ts, _ in got] == [3000, 4000, 5000]

    def test_ctx_after_records(self):
        got = run_filter({"#ctx_after": 2, "&v": {"$eq": 5}}, self.RECORDS)
        assert [ts for ts, _ in got] == [5000, 6000, 7000]

    def test_ctx_before_duration(self):
        got = run_filter({"#ctx_before": "1500us", "&v": {"$eq": 5}}, self.RECORDS)
        assert [ts for ts, _ in got] == [4000, 5000]

    def test_ctx_no_duplicates_on_adjacent_matches(self):
        # NB: $in only supports array syntax — object syntax with an array
        # operand is rejected (parser.rs parse_recursively: Array error)
        got = run_filter({"#ctx_before": 2, "$in": ["&v", 4, 5]}, self.RECORDS)
        assert [ts for ts, _ in got] == [2000, 3000, 4000, 5000]

    def test_limit_interrupts_scan(self):
        got = run_filter({"$and": [{"$limit": 3}]}, self.RECORDS)
        assert [ts for ts, _ in got] == [0, 1000, 2000]

    def test_select_labels(self):
        recs = [(0, {"a": "1", "b": "2"})]
        got = run_filter({"#select_labels": ["a"], "&a": {"$eq": 1}}, recs)
        assert got == [(0, {"a": "1"})]

    def test_strict_raises_nonstrict_skips(self):
        recs = [(0, {"a": "1"}), (1, {})]
        got = run_filter({"&a": {"$eq": 1}}, recs)
        assert [ts for ts, _ in got] == [0]
        with pytest.raises(CondError):
            run_filter({"&a": {"$eq": 1}}, recs, strict=True)

    # direct ports of the reference's WhenFilter goldens
    # (filters/when.rs:131-319)
    def test_ref_golden_ctx_before_with_limit(self):
        # {"#ctx_before": 2, "$and": [true, "&label"], "$limit": [1]}:
        # $limit is only evaluated when the preceding conjunct passes; the
        # second match interrupts the scan (when.rs:164-196)
        node, dirs = parse_when({"#ctx_before": 2,
                                 "$and": [True, "&label"], "$limit": [1]})
        wf = WhenFilter(node, dirs)
        f = {"label": "false"}
        t = {"label": "true"}
        seq_records = [(0, f), (1, f), (2, f), (3, t), (4, t)]
        results = []
        for ts, labels in seq_records:
            r = wf.feed(FilterRecord(ts, dict(labels), {}))
            results.append(None if r is None else [rec.timestamp for rec in r])
        assert results == [[], [], [], [1, 2, 3], None]

    def test_ref_golden_ctx_before_n(self):
        node, dirs = parse_when({"#ctx_before": 2, "$and": [True, "&label"]})
        wf = WhenFilter(node, dirs)
        f, t = {"label": "false"}, {"label": "true"}
        out = []
        for ts, labels in [(0, f), (1, f), (2, f), (3, t), (4, t)]:
            out.append([r.timestamp for r in wf.feed(FilterRecord(ts, dict(labels), {}))])
        assert out == [[], [], [], [1, 2, 3], [4]]

    def test_ref_golden_ctx_before_duration(self):
        # "2ms" keeps records within 2000µs inclusive (when.rs:228-252)
        node, dirs = parse_when({"#ctx_before": "2ms", "$and": [True, "&label"]})
        wf = WhenFilter(node, dirs)
        out = []
        for ts, labels in [(3000, {"label": "false"}), (4000, {"label": "false"}),
                           (5000, {"label": "true"})]:
            out.append([r.timestamp for r in wf.feed(FilterRecord(ts, dict(labels), {}))])
        assert out == [[], [], [3000, 4000, 5000]]

    def test_ref_golden_ctx_after_duration(self):
        node, dirs = parse_when({"#ctx_after": "2ms", "$and": [True, "&label"]})
        wf = WhenFilter(node, dirs)
        out = []
        for ts, labels in [(5000, {"label": "true"}), (6000, {"label": "false"}),
                           (7000, {"label": "false"}), (7001, {"label": "false"})]:
            out.append([r.timestamp for r in wf.feed(FilterRecord(ts, dict(labels), {}))])
        assert out == [[5000], [6000], [7000], []]

    def test_ctx_padding_validation(self):
        with pytest.raises(CondError):
            run_filter({"#ctx_before": -1, "&v": {"$eq": 1}}, self.RECORDS)
        with pytest.raises(CondError):
            run_filter({"#ctx_before": "invalid", "&v": {"$eq": 1}}, self.RECORDS)
        with pytest.raises(CondError):
            run_filter({"#select_labels": [1], "&v": {"$eq": 1}}, self.RECORDS)
        with pytest.raises(CondError):
            run_filter({"#bogus": 1, "&v": {"$eq": 1}}, self.RECORDS)


def test_gate_and_each_t_duration_saturates_like_rust_casts():
    """gate.rs:50 `(f * 1e6) as i64` and each_t.rs:59 `(s * 1e6) as u64`
    are SATURATING Rust casts: a float inf duration ("inf"/"1e309" label
    values parse to f64 inf) clamps to the integer max, NaN to 0 —
    Python's int(inf) would raise instead (round-5 audit find).  Pinned
    on the interpreter tier; the planner mirrors via _f64_as_i64/u64."""
    from reductstore_spark.condition.interpreter import Context, Evaluator
    from reductstore_spark.condition.parser import parse_when

    def run(when, rows):
        node, _ = parse_when(when)
        ev = Evaluator(node)
        return [bool(V.as_bool(ev.apply(Context(ts, lb)))) for ts, lb in rows]

    # inf gate duration: window opens on the rising edge and never expires
    rows = [(1, {"d": "inf", "x": "1"}), (10**15, {"d": "inf", "x": "1"})]
    assert run({"$gate": ["&d", {"&x": {"$eq": 1}}]}, rows) == [True, True]
    # NaN gate duration -> 0: deadline = ts, never inside the window
    rows = [(1, {"d": "nan", "x": "1"}), (2, {"d": "nan", "x": "1"})]
    assert run({"$gate": ["&d", {"&x": {"$eq": 1}}]}, rows) == [False, False]
    # inf each_t period -> u64::MAX: first primes, nothing ever elapses
    rows = [(1, {"p": "1e309"}), (10**15, {"p": "1e309"})]
    assert run({"$each_t": "&p"}, rows) == [False, False]
    # NaN each_t period -> 0: every record elapses
    rows = [(1, {"p": "nan"}), (2, {"p": "nan"})]
    assert run({"$each_t": "&p"}, rows) == [True, True]


def test_gate_constant_inf_duration_through_planner(spark):
    """The planner's plan-time derivation for a CONSTANT "inf" gate
    duration must saturate, not crash, and match the interpreter replay:
    every input-true record after the rising edge stays kept."""
    from reductstore_spark.query import QueryEngine

    rows = [("b", "e", t, None, "", 1, {"v": str(50 + t % 100)}, None)
            for t in range(1, 2_000_000, 100_000)]
    df = spark.createDataFrame(
        rows, "bucket string, entry string, ts long, payload binary, "
              "content_type string, state int, labels map<string,string>, "
              "computed_labels map<string,string>")
    got = QueryEngine().query(df, when={"$gate": ["inf", {"&v": {"$gt": 0}}]},
                              ordered=False).count()
    assert got == len(rows)  # window never expires, input always true
