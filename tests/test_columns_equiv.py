"""Column compiler vs interpreter equivalence on Spark.

The interpreter is the exact reference semantics; the Catalyst compiler
must agree on every record (non-strict: evaluation errors -> excluded).
All conditions are evaluated in a single Spark job for speed.
"""

import json

import pytest
from pyspark.sql import functions as F

from reductstore_spark.condition import values as V
from reductstore_spark.condition.columns import ColumnCompiler, compile_filter
from reductstore_spark.condition.interpreter import Context, Evaluator
from reductstore_spark.condition.parser import parse_when

ROWS = [
    (0, {"label": "10", "flag": "true", "score": "55.5", "status": "ok"}),
    (1704067200123456, {"label": "-3", "flag": "false", "score": "0.0", "status": "error"}),
    (5, {"label": "abc", "score": "100.0"}),
    (1000, {"flag": "true", "k": "87"}),
    (2000, {"label": "1e3", "score": "-55.5", "status": ""}),
    (3000, {"label": "+42", "weird": " 5", "status": "o k"}),
]

CONDS = [
    '{"&label": {"$gt": 5}}',
    '{"&score": {"$gte": 55.5}}',
    '{"$and": [{"&flag": {"$eq": true}}, {"&score": {"$lt": 100}}]}',
    '{"$or": ["&flag", {"&label": {"$eq": "abc"}}]}',
    '{"$exists": ["flag", "score"]}',
    '{"$in": ["&status", "ok", "warn"]}',
    '{"$contains": ["&status", "rr"]}',
    '{"$eq": [{"$add": ["&label", 5]}, 15]}',
    '{"$eq": [{"$div": ["&label", 4]}, 2.5]}',
    '{"$eq": [{"$rem": ["&label", 6]}, 4]}',
    '{"$gt": [{"$abs": ["&label"]}, 2]}',
    '{"$eq": [{"$hour": ["$timestamp", "Europe/Berlin"]}, 1]}',
    '{"$eq": [{"$weekday": ["$timestamp"]}, 0]}',
    '{"$eq": [{"$cast": ["&score", "int"]}, 55]}',
    '{"$eq": [{"$ref": ["status"]}, "ok"]}',
    '{"$starts_with": ["&status", "o"]}',
    '{"$ne": ["&label", "abc"]}',
    '{"$nin": ["&status", "error", "warn"]}',
    '{"$xor": ["&flag", {"&score": {"$gt": 50}}]}',
    '{"$eq": [{"$sub": ["1h", "30m"]}, "30m"]}',
    '{"$lte": ["&label", 10]}',
    '{"$not": [{"$exists": ["nope"]}]}',
    '{"$eq": [{"$mult": ["&k", 2]}, 174]}',
    '{"$eq": [{"$div_num": [-3, 2]}, -1]}',
    '{"$gt": ["&label", "5"]}',
    '{"$ends_with": ["&status", "k"]}',
    # dynamic-typing edge cases
    '{"&label": {"$eq": 1000.0}}',        # "1e3" parses as float
    '{"&label": {"$eq": 42}}',            # "+42" parses as int
    '{"&weird": {"$eq": " 5"}}',          # " 5" stays a string
    '{"$eq": ["&status", "o k"]}',
    '{"$or": [{"$exists": ["weird"]}, {"&score": {"$lt": 0}}]}',
    '{"$and": []}', '{"$or": []}',
    '{"$gt": [{"$cast": ["&label", "float"]}, -100]}',
    '{"$eq": [{"$add": ["&status", "!"]}, "ok!"]}',
    # $add string concat in the fast path (ADVICE r1: runtime string-kind
    # labels must concat, not error) + signed-int display normalization
    '{"$eq": [{"$add": ["&status", "&status"]}, "okok"]}',
    '{"$eq": [{"$add": ["&status", "1"]}, "ok1"]}',
    '{"$eq": [{"$add": ["&weird", "&status"]}, " 5ok"]}',
    '{"$eq": [{"$add": ["&label", "&score"]}, 65.5]}',
    '{"$contains": [{"$add": ["&status", "&status"]}, "ko"]}',
    '{"$or": [{"$eq": [{"$add": ["&label", "&status"]}, 1]}, true]}',
    '{"$starts_with": ["&label", "4"]}',
    '{"$ends_with": ["&label", "2"]}',
    # $cast of string-kind text parses it (cast.rs via value.rs as_int/
    # as_float) — regression: the flat tier used to error on these
    '{"$eq": [{"$cast": ["77", "int"]}, 77]}',
    '{"$eq": [{"$cast": ["7.5", "float"]}, 7.5]}',
    '{"$eq": [{"$cast": [{"$add": ["12", "34"]}, "int"]}, 1234]}',
    '{"$eq": [{"$cast": ["&status", "string"]}, "ok"]}',
    '{"$eq": [{"$cast": ["&score", "string"]}, "55.5"]}',
    '{"$eq": [{"$cast": ["&label", "string"]}, "10"]}',
    '{"$eq": [{"$cast": [{"$cast": ["&label", "string"]}, "int"]}, 10]}',
    '{"$contains": [{"$cast": ["&score", "string"]}, "."]}',
    '{"$gt": [{"$cast": ["&status", "int"]}, 1]}',   # parse error -> false
    '{"$eq": [{"$cast": ["&flag", "string"]}, "true"]}',
    # $exists error gating: later-operand evaluation stops at the first
    # missing name (exists.rs fold)
    '{"$not": [{"$exists": ["nope", "flag"]}]}',
    '{"$exists": ["flag", "nope"]}',
]


def interp_expected(node):
    out = []
    for ts, lb in ROWS:
        ev = Evaluator(node)
        try:
            out.append(V.as_bool(ev.apply(Context(ts, lb))))
        except V.CondError:
            out.append(False)
    return out


def test_equivalence_matrix(spark):
    df = spark.createDataFrame(
        ROWS, "ts long, labels map<string,string>"
    ).coalesce(1)
    cols = []
    parsed = []
    for i, cond in enumerate(CONDS):
        node, _ = parse_when(json.loads(cond))
        parsed.append(node)
        cc = ColumnCompiler(F.col("ts"), F.col("labels"))
        cols.append(cc.predicate(node).alias(f"c{i}"))
    res = df.select(*cols).collect()
    mismatches = []
    for i, cond in enumerate(CONDS):
        got = [r[i] for r in res]
        want = interp_expected(parsed[i])
        if got != want:
            mismatches.append((cond, got, want))
    assert not mismatches, mismatches


def test_flat_compiler_equivalence(spark):
    from reductstore_spark.condition.fastcols import FlatCompiler, Unsupported

    df = spark.createDataFrame(
        ROWS, "ts long, labels map<string,string>"
    ).coalesce(1)
    cols, parsed, covered = [], [], []
    for i, cond in enumerate(CONDS):
        node, _ = parse_when(json.loads(cond))
        try:
            pred = FlatCompiler(F.col("ts"), F.col("labels")).predicate(node)
        except Unsupported:
            continue
        covered.append(cond)
        parsed.append(node)
        cols.append(pred.alias(f"c{len(cols)}"))
    # the fast path must cover the overwhelming majority of shapes
    assert len(covered) >= len(CONDS) * 2 // 3, covered
    res = df.select(*cols).collect()
    mismatches = []
    for i, cond in enumerate(covered):
        got = [r[i] for r in res]
        want = interp_expected(parsed[i])
        if got != want:
            mismatches.append((cond, got, want))
    assert not mismatches, mismatches


def test_strict_mode_raises_jvm_side(spark):
    df = spark.createDataFrame(ROWS, "ts long, labels map<string,string>")
    node, _ = parse_when({"&nope": {"$gt": 1}})
    with pytest.raises(Exception, match="not found"):
        compile_filter(df, node, strict=True, computed_col=None).count()
    assert compile_filter(df, node, computed_col=None).count() == 0


# strict cases: (condition, expected error-message fragment or None)
STRICT_CASES = [
    ({"&nope": {"$gt": 1}}, "Reference '&nope' not found"),
    ({"&label": {"$gt": 1}}, None),
    # PartialOrd None (string-vs-number) -> Bool(false), never an error,
    # even in strict mode (gt.rs Ok(Bool(v1 > v2)); round-4 correction)
    ({"$gt": ["&status", 1]}, None),
    ({"$eq": [{"$div": ["&label", 0]}, 1]}, "Cannot divide by zero"),
    ({"$eq": [{"$add": ["&status", "&label"]}, 1]}, "Cannot add string"),
    ({"$eq": [{"$sub": ["&status", 1]}, 1]}, "Cannot subtract string"),
    ({"$eq": [{"$cast": ["&status", "int"]}, 1]},
     "Value 'ok' could not be parsed as integer"),
    ({"$gt": [{"$abs": ["&status"]}, 1]},
     "Cannot calculate absolute value of a string"),
    ({"$eq": [{"$ref": ["missing"]}, 1]}, "Reference '&missing' not found"),
    # short-circuit: the erroring operand is never evaluated
    ({"$and": [False, {"&nope": {"$gt": 1}}]}, None),
    ({"$or": [True, {"$div": [1, 0]}]}, None),
]


def test_strict_flat_tier_matches_struct_tier(spark):
    """Strict mode on the FLAT (whole-stage-codegen) tier must raise for
    exactly the same conditions as the struct tier, with the same
    message (filters/when.rs:81-95 error policy)."""
    from reductstore_spark.condition.fastcols import FlatCompiler, Unsupported

    # a row where 'status' is a plain string and 'label' is numeric
    df = spark.createDataFrame(
        [(0, {"label": "10", "status": "ok", "flag": "true"})],
        "ts long, labels map<string,string>").coalesce(1)

    for when, frag in STRICT_CASES:
        node, _ = parse_when(when)
        pred = FlatCompiler(F.col("ts"), F.col("labels"),
                            strict=True).predicate(node)

        def outcome(p):
            try:
                df.select(p.alias("p")).collect()
                return None
            except Exception as e:  # noqa: BLE001
                return str(e)

        flat_err = outcome(pred)
        struct_err = outcome(
            ColumnCompiler(F.col("ts"), F.col("labels"))
            .predicate(node, strict=True))
        if frag is None:
            assert flat_err is None, (when, flat_err)
            assert struct_err is None, (when, struct_err)
        else:
            assert flat_err and frag in flat_err, (when, flat_err)
            assert struct_err and frag in struct_err, (when, struct_err)


def test_hostile_value_matrix_three_tiers(spark):
    """Deterministic regression for the fuzz-found divergences: Rust
    parse semantics (no whitespace trim, signed NaN spellings), NaN
    equality (equals nothing), chrono timestamp-range errors, and exact
    duration display — all three backends must agree row-for-row."""
    import json

    from reductstore_spark.condition.columns import ColumnCompiler
    from reductstore_spark.condition.fastcols import FlatCompiler, Unsupported
    from reductstore_spark.condition.interpreter import Context, Evaluator
    from reductstore_spark.condition import values as V
    from reductstore_spark.condition.parser import parse_when

    conds = [
        {"$gte": [{"$cast": ["&v", "float"]}, 0]},
        {"$eq": ["&v", "&w"]},
        {"$ne": ["&v", "&w"]},
        {"$contains": ["90m", "&v"]},
        {"$eq": [{"$cast": ["&v", "float"]}, "&w"]},
        {"$gte": [{"$hour": ["&v", "Europe/Berlin"]}, 0]},
        {"$gte": [{"$hour": ["&v"]}, 0]},
        # display of parsed inf must be Rust's 'inf', not Spark 'Infinity'
        {"$ends_with": [" inf", "&v"]},
        {"$contains": ["&v", "&w"]},
    ]
    vals = [" 5", "5", "+nan", "nan", "-nan", "inf", " inf", "-infinity",
            "1h", "abc", "3.5", "0"]
    rows = [(i, {"v": a, "w": b})
            for i, (a, b) in enumerate((a, b) for a in vals for b in vals[:4])]
    df = spark.createDataFrame(rows, "ts long, labels map<string,string>").coalesce(1)

    def interp(node, ts, labels):
        ev = Evaluator(node)
        try:
            return bool(V.as_bool(ev.apply(Context(ts, labels, {}))))
        except V.CondError:
            return False

    for c in conds:
        node, _ = parse_when(json.loads(json.dumps(c)))
        cols = [ColumnCompiler(F.col("ts"), F.col("labels")).predicate(node).alias("s")]
        flat_ok = True
        try:
            cols.append(FlatCompiler(F.col("ts"), F.col("labels")).predicate(node).alias("f"))
        except Unsupported:
            flat_ok = False
        res = df.select(*cols).collect()
        for (ts, labels), r in zip(rows, res):
            want = interp(node, ts, labels)
            assert r["s"] == want, (c, labels, "struct", r["s"], want)
            if flat_ok:
                assert r["f"] == want, (c, labels, "flat", r["f"], want)


def test_display_edges_all_tiers_i64_overflow_and_exact_add(spark):
    """Two fuzz-found display divergences pinned across compiled tiers:
    (a) an i64-overflowing digit run is Float kind — displays as
    '9223372036854776000', not the raw digits; (b) Int-kind $add results
    display exact i64 digits (the double lane rounds past 2**53)."""
    from pyspark.sql import functions as F
    from reductstore_spark.condition.columns import ColumnCompiler
    from reductstore_spark.condition.fastcols import FlatCompiler
    from reductstore_spark.condition.parser import parse_when

    cases = [
        ({"$contains": [{"$cast": ["&a", "string"]}, "9223372036854776000"]},
         {"a": "9223372036854775808"}, True),
        ({"$contains": [{"$cast": ["&a", "string"]}, "9223372036854775808"]},
         {"a": "9223372036854775808"}, False),
        ({"$contains": [{"$add": ["&c", "&b"]}, "&b"]},
         {"c": "1", "b": "-8334632851200000000"}, False),
        ({"$eq": [{"$cast": [{"$add": ["&c", "&b"]}, "string"]},
                  "-8334632851199999999"]},
         {"c": "1", "b": "-8334632851200000000"}, True),
    ]
    for cond, labels, want in cases:
        node, _ = parse_when(cond)
        df = spark.createDataFrame([(0, labels)],
                                   "ts long, labels map<string,string>")
        for mk in (FlatCompiler, ColumnCompiler):
            pred = mk(F.col("ts"), F.col("labels")).predicate(node)
            got = df.select(pred.alias("p")).collect()[0]["p"]
            assert got == want, (mk.__name__, cond, got, want)


def test_unordered_comparisons_false_all_tiers(spark):
    """Round-4 fuzz finds pinned: (a) const-folded NaN ($rem[MIN, 0.0])
    must not leak into Spark's NaN-is-greatest ordering (seed 2009);
    (b) struct div_num at near-2^63 magnitudes must use exact i64
    division, not decimal rounding (MAX div MIN = 0, not 1; seed 2014);
    plus the corrected PartialOrd semantics: unordered pairs compare
    FALSE, never error, so nested negations see them."""
    from reductstore_spark.condition.fastcols import FlatCompiler
    from reductstore_spark.condition.interpreter import Context, Evaluator
    from reductstore_spark.condition import values as V

    cases = [
        ({"$gt": [{"$rem": [-9223372036854775808, 0.0]},
                  {"$gte": ["&c", "1"]}]}, {"c": "1_000"}, False),
        ({"$div_num": ["&b", {"$mult": ["&a", 9223372036854775807]}]},
         {"a": "-infinity", "b": "1.7976931348623157e308"}, False),
        ({"$eq": [{"$div_num": ["&b", {"$mult": ["&a",
                                                 9223372036854775807]}]}, 0]},
         {"a": "-infinity", "b": "1.7976931348623157e308"}, True),
        ({"$gt": ["&s", 1]}, {"s": "abc"}, False),
        ({"$not": [{"$gt": ["&s", 1]}]}, {"s": "abc"}, True),
        ({"$lte": [{"$rem": [1.5, 0.0]}, 99]}, {}, False),
        ({"$xor": [{"$lt": ["&s", 0]}, True]}, {"s": "x"}, True),
    ]
    for cond, labels, want in cases:
        node, _ = parse_when(cond)
        assert bool(V.as_bool(Evaluator(node).apply(Context(0, labels)))) \
            == want, ("interp", cond)
        df = spark.createDataFrame([(0, labels)],
                                   "ts long, labels map<string,string>")
        for mk in (FlatCompiler, ColumnCompiler):
            pred = mk(F.col("ts"), F.col("labels")).predicate(node)
            got = df.select(pred.alias("p")).collect()[0]["p"]
            assert got == want, (mk.__name__, cond, got, want)


def test_date_parse_error_message_carries_value_all_tiers(spark):
    """value.rs:87 — as_int on an unparseable string reports
    "Value '<text>' could not be parsed as integer"; both column tiers
    must thread the ORIGINAL text into the strict message exactly like
    the interpreter (round-5 strict fuzz find, seed 5000: the date
    operators dropped the "Value '...'" prefix)."""
    from reductstore_spark.condition import values as V
    from reductstore_spark.condition.fastcols import FlatCompiler
    from reductstore_spark.condition.interpreter import Context, Evaluator

    cond = {"$gte": [{"$day": ["&b", "Europe/Berlin"]}, 10]}
    node, _ = parse_when(cond)
    want = "Value '1h30m' could not be parsed as integer"

    try:
        Evaluator(node).apply(Context(0, {"b": "1h30m"}))
        raise AssertionError("interpreter should raise")
    except V.CondError as e:
        assert str(e) == want, str(e)

    df = spark.createDataFrame([(0, {"b": "1h30m"})],
                               "ts long, labels map<string,string>")
    for mk, kw in ((FlatCompiler, {"strict": True}), (ColumnCompiler, {})):
        c = mk(F.col("ts"), F.col("labels"), **kw)
        pred = c.predicate(node) if kw else c.predicate(node, strict=True)
        try:
            df.select(pred.alias("p")).collect()
            raise AssertionError(f"{mk.__name__} should raise")
        except Exception as e:  # noqa: BLE001
            assert want in str(e), (mk.__name__, str(e))


def test_negative_zero_display_all_tiers(spark):
    """Rust Display renders f64 -0.0 as '-0'; the Column tiers' signbit
    probe (1/x == -inf) never fired because Spark's non-ANSI division
    NULLs zero divisors, so a runtime-computed -0.0 displayed '0'
    (round-5 fuzz, seeds 3079/3100 — $contains saw the wrong text)."""
    from reductstore_spark.condition import values as V
    from reductstore_spark.condition.fastcols import FlatCompiler, Unsupported
    from reductstore_spark.condition.interpreter import Context, Evaluator

    cases = [
        # seed 3100: display($div[0, -1]) must be '-0'; '0.5' contains it? no
        ({"$contains": ["&a", {"$div": [0, "&b"]}]},
         {"a": ".5", "b": "-1"}, False),
        # seed 3079: duration/float -0.0 display under $contains
        ({"$contains": [{"$add": ["&sparse", "&c"]},
                        {"$div": ["0s", "&sparse"]}]},
         {"a": "0s", "b": "0", "c": "007.5",
          "sparse": "-9223372036854775809"}, False),
        # positive pin of the display itself
        ({"$eq": [{"$cast": [{"$div": [0, "&b"]}, "string"]}, "-0"]},
         {"b": "-1"}, True),
        # positive zero stays '0'
        ({"$eq": [{"$cast": [{"$div": [0, "&pos"]}, "string"]}, "0"]},
         {"pos": "1"}, True),
    ]
    for cond, labels, want in cases:
        node, _ = parse_when(cond)
        assert bool(V.as_bool(Evaluator(node).apply(Context(0, labels)))) \
            == want, ("interp", cond)
        df = spark.createDataFrame([(0, labels)],
                                   "ts long, labels map<string,string>")
        for mk in (FlatCompiler, ColumnCompiler):
            try:
                pred = mk(F.col("ts"), F.col("labels")).predicate(node)
            except Unsupported:
                continue
            got = df.select(pred.alias("p")).collect()[0]["p"]
            assert got == want, (mk.__name__, cond, got, want)


def test_const_folded_comparison_keeps_boolean_kind(spark):
    """A comparison of two CONSTANTS const-folds in the flat tier; the
    fold must produce a Bool-kind constant, not an anonymous numeric —
    $add of a string to it reports "Cannot add string to boolean" like
    value.rs / the interpreter (round-6 strict fuzz, seed 6000: the fold
    dropped the kind and the message said "integer")."""
    from reductstore_spark.condition import values as V
    from reductstore_spark.condition.fastcols import FlatCompiler, _emsg

    df = spark.createDataFrame([(0, {"a": "1"})],
                               "ts long, labels map<string,string>")
    cases = [
        ({"$add": ["5.", {"$lt": ["0s", "xyz"]}]},
         "Cannot add string to boolean"),       # unordered fold -> False
        ({"$add": ["5.", {"$gte": [3, 2]}]},
         "Cannot add string to boolean"),       # ordered fold -> True
        ({"$add": [{"$lte": ["1h", "2h"]}, "abc"]},
         "Cannot add boolean to string"),       # folded const on the left
    ]
    for cond, want in cases:
        node, _ = parse_when(json.loads(json.dumps(cond)))
        try:
            Evaluator(node).apply(Context(0, {"a": "1"}))
            raise AssertionError("interpreter should raise")
        except V.CondError as e:
            assert str(e) == want, str(e)
        fv = FlatCompiler(F.col("ts"), F.col("labels"),
                          strict=True).compile(node)
        got = df.select(_emsg(fv).alias("e")).collect()[0]["e"]
        assert got == want, (cond, got, want)
        sv = ColumnCompiler(F.col("ts"), F.col("labels")).value(node)
        got_s = df.select(sv["e"].alias("e")).collect()[0]["e"]
        assert got_s == want, (cond, got_s, want)


def test_in_result_keeps_boolean_kind(spark):
    """$in / $nin results are Bool-kind; the flat tier's FV must carry
    skind="boolean" like every other comparison, or the strict message
    for $add[string, $in(...)] reports the runtime numeric word
    ("integer") instead of "boolean" (round-7 strict fuzz, seed 8008:
    {"$add": ["$$esc", {"$in": ["", ".5"]}]})."""
    from reductstore_spark.condition import values as V
    from reductstore_spark.condition.fastcols import FlatCompiler, _emsg

    df = spark.createDataFrame([(0, {"a": "-.5"})],
                               "ts long, labels map<string,string>")
    cases = [
        ({"$add": ["$$esc", {"$in": ["", ".5"]}]},
         "Cannot add string to boolean"),          # the finding seed shape
        ({"$add": [{"$nin": ["&a", "x", "y"]}, "abc"]},
         "Cannot add boolean to string"),          # label head, $nin, left
        ({"$sub": ["1.5", {"$in": ["&a", "-.5"]}]},
         "Cannot subtract string"),                # string-side msg intact
    ]
    for cond, want in cases:
        node, _ = parse_when(json.loads(json.dumps(cond)))
        try:
            Evaluator(node).apply(Context(0, {"a": "-.5"}))
            raise AssertionError("interpreter should raise")
        except V.CondError as e:
            assert str(e) == want, str(e)
        fv = FlatCompiler(F.col("ts"), F.col("labels"),
                          strict=True).compile(node)
        got = df.select(_emsg(fv).alias("e")).collect()[0]["e"]
        assert got == want, (cond, got, want)
        sv = ColumnCompiler(F.col("ts"), F.col("labels")).value(node)
        got_s = df.select(sv["e"].alias("e")).collect()[0]["e"]
        assert got_s == want, (cond, got_s, want)
