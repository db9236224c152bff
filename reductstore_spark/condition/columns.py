"""Stateless condition -> Catalyst Column compiler (the JVM fast path).

The condition language is dynamically typed: label values are strings
parsed per record as bool -> i64 -> f64 -> string (reference:
reductstore/src/storage/query/condition/value.rs:51-61).  To keep
evaluation JVM-side (whole-stage codegen, no Python), every expression
compiles to a *tagged struct* column::

    struct<t:int, b:boolean, i:long, f:double, s:string, e:string>

``t`` is the runtime kind (0 bool, 1 int, 2 float, 3 string, 4 duration),
exactly one payload field is meaningful, and ``e`` carries an evaluation
error (missing label, string-vs-number comparison, divide-by-zero ...).
Errors propagate through operators like the reference's ``Result``; the
top-level predicate maps them to ``false`` (non-strict,
filters/when.rs:88-95) or ``raise_error`` (strict).

Requires a session with ``spark.sql.ansi.enabled=false`` and
``spark.sql.session.timeZone=UTC`` (see reductstore_spark.session).

Stateless operators only — the planner routes ASTs containing
$each_n/$each_t/$gate/$limit to the ordered interpreter instead.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F

from . import values as V
from .ast import ComputedRef, Const, LabelRef, Node, Op
from .values import CondError

TBOOL, TINT, TFLOAT, TSTR, TDUR = 0, 1, 2, 3, 4

_INT_RE = r"^[+-]?[0-9]+$"
_FLOAT_RE = r"^[+-]?([0-9]+\.?[0-9]*|\.[0-9]+)([eE][+-]?[0-9]+)?$"
_FLOAT_SPECIAL = ["inf", "+inf", "-inf", "infinity", "+infinity", "-infinity", "nan", "+nan", "-nan"]


def _null(dtype: str) -> Column:
    return F.lit(None).cast(dtype)


def _mk(t: Column, b: Optional[Column] = None, i: Optional[Column] = None,
        f: Optional[Column] = None, s: Optional[Column] = None,
        e: Optional[Column] = None) -> Column:
    return F.struct(
        t.cast("int").alias("t"),
        (b if b is not None else _null("boolean")).alias("b"),
        (i.cast("long") if i is not None else _null("long")).alias("i"),
        (f.cast("double") if f is not None else _null("double")).alias("f"),
        (s if s is not None else _null("string")).alias("s"),
        (e if e is not None else _null("string")).alias("e"),
    )


def _const_struct(value: V.Value) -> Column:
    k = value.kind
    if k == V.BOOL:
        return _mk(F.lit(TBOOL), b=F.lit(bool(value.val)))
    if k == V.INT:
        return _mk(F.lit(TINT), i=F.lit(int(value.val)))
    if k == V.FLOAT:
        return _mk(F.lit(TFLOAT), f=F.lit(float(value.val)))
    if k == V.DURATION:
        return _mk(F.lit(TDUR), i=F.lit(int(value.val)))
    return _mk(F.lit(TSTR), s=F.lit(value.val))


def _parse_dynamic(raw: Column, err_when_missing: Column) -> Column:
    """String label value -> tagged struct via the bool->i64->f64->string
    try-order. ``raw`` may be null (missing label) -> error struct."""
    from .fastcols import parse_double

    is_bool = raw.isin("true", "false")
    as_long = F.when(raw.rlike(_INT_RE), raw.try_cast("long"))
    is_int = as_long.isNotNull()
    # Rust-f64 semantics: specials (incl. signed NaN) map explicitly —
    # Spark's cast rejects '+nan' and trims whitespace (fuzz-found)
    as_double = parse_double(raw)
    is_float = as_double.isNotNull()
    return F.when(raw.isNull(), _mk(F.lit(TBOOL), e=err_when_missing)).otherwise(
        F.when(is_bool, _mk(F.lit(TBOOL), b=raw == "true"))
        .when(is_int, _mk(F.lit(TINT), i=as_long))
        .when(is_float, _mk(F.lit(TFLOAT), f=as_double))
        .otherwise(_mk(F.lit(TSTR), s=raw))
    )


# ---- struct accessors ------------------------------------------------------

def _is_num(x: Column) -> Column:
    return x["t"] != TSTR


def _to_f(x: Column) -> Column:
    """as_float for non-string kinds."""
    return (
        F.when(x["t"] == TBOOL, x["b"].cast("double"))
        .when(x["t"].isin(TINT, TDUR), x["i"].cast("double"))
        .otherwise(x["f"])
    )


def _to_i(x: Column) -> Column:
    """as_int for bool/int/duration; float truncates toward zero."""
    return (
        F.when(x["t"] == TBOOL, x["b"].cast("long"))
        .when(x["t"] == TFLOAT,
              F.when(F.isnan(x["f"]), F.lit(0))
              .when(x["f"] >= F.lit(float(V.I64_MAX)), F.lit(V.I64_MAX))
              .when(x["f"] <= F.lit(float(V.I64_MIN)), F.lit(V.I64_MIN))
              .otherwise(x["f"].cast("long")))
        .otherwise(x["i"])
    )


def _as_bool(x: Column) -> Column:
    """Truthiness (value.rs:66-73); null-safe false on error handled by caller."""
    return (
        F.when(x["t"] == TBOOL, x["b"])
        .when(x["t"].isin(TINT, TDUR), x["i"] != 0)
        .when(x["t"] == TFLOAT, x["f"] != 0.0)
        .otherwise(F.length(x["s"]) != 0)
    )


def _dur_display(us: Column) -> Column:
    """Duration Display as a Column — exact integer replica of
    values.fmt_duration (duration_format.rs:29-50): greatest-to-least
    unit terms, each signed like the remainder, joined with spaces.

    Because every unit size divides the previous one, each term derives
    from abs(us) with two mods — no remainder chaining (a chained form
    grows the tree exponentially / overruns analyzer iterations when
    lambda-bound).  The one division goes through decimal(38,0) so it is
    exact for the full i64 range (double drifts above 2^53)."""
    a = F.abs(us)
    neg = us < 0
    pieces = []
    prev_size = None
    for unit, size in V._DUR_FMT_UNITS:
        r = a if prev_size is None else F.pmod(a, F.lit(prev_size))
        if size == 1:
            q = r
        else:
            q = ((r - F.pmod(r, F.lit(size))).cast("decimal(38,0)")
                 / F.lit(size)).cast("long")
        signed = F.when(neg, -q).otherwise(q)
        pieces.append(F.when(r >= F.lit(size),
                             F.concat(signed.cast("string"), F.lit(unit))))
        prev_size = size
    joined = F.concat_ws(" ", *pieces)  # concat_ws skips nulls
    out = F.when(joined == "", F.lit("0us")).otherwise(joined)
    # i64::MIN: Spark's abs wraps to MIN itself — emit the precomputed
    # exact rendering instead
    return F.when(us == F.lit(-(2 ** 63)),
                  F.lit(V.fmt_duration(-(2 ** 63)))).otherwise(out)


def _display(x: Column) -> Column:
    """Rust Display (value.rs:131-140). Floats use trimmed formatting
    ('1' for 1.0); Duration renders through the exact fmt_duration
    replica (a '3600000000us' approximation diverged under $contains —
    fuzz-found)."""
    from .fastcols import _expand_sci_col, _neg_zero
    f = x["f"]
    int_like = (~F.isnan(f)) & (f == F.floor(f)) & (F.abs(f) < 1e16)
    return (
        F.when(x["t"] == TBOOL, F.when(x["b"], "true").otherwise("false"))
        .when(x["t"] == TINT, x["i"].cast("string"))
        .when(x["t"] == TFLOAT,
              F.when(_neg_zero(f), F.lit("-0"))
              .when(int_like, f.cast("long").cast("string"))
              .when(f == F.lit(float("inf")), F.lit("inf"))
              .when(f == F.lit(float("-inf")), F.lit("-inf"))
              .otherwise(_expand_sci_col(f)))
        .when(x["t"] == TDUR, _dur_display(x["i"]))
        .otherwise(x["s"])
    )


def _first_err(*xs: Column) -> Column:
    return F.coalesce(*[x["e"] for x in xs], _null("string"))


def _bool_result(b: Column, e: Column) -> Column:
    return _mk(F.lit(TBOOL), b=b, e=e)


# Struct-tier analysis budget (round 10).  The let-binding keeps the
# COMPILED tree O(ast), but Catalyst's resolution of nested
# LambdaFunctions is super-linear in let-nesting: measured on this
# host, a plain $and chain 4 deep (estimate ~27) analyzes in 42 s, 8
# deep stalls >100 s, ~12 deep fails with the analyzer's
# max-iterations error — and the cost is NOT a clean function of path
# depth alone (one depth-4 fuzz shape at estimate 23 stalled >60 s
# while a nested-$in chain at 25 analyzed in 4.6 s), so the budget is
# set conservatively LOW rather than modeled finely.  Everything past
# it routes to the per-row interpreter tier (condition/rowtier.py),
# which is the reference's own execution model (condition.rs applies
# the AST per record) and costs about the same as interpreted struct
# lambdas anyway — the struct tier's edge over it only matters for
# shallow shapes, which the budget keeps.  Realistic conditions never
# reach this gate at all: the FLAT tier compiles them, and the struct
# tier is only consulted on flat fallback (odd shapes, fuzz output).
# ``lambda_depth_estimate`` models the deepest let-chain the compiler
# emits: one let per operand on the path + one per fold step for the
# scanning ops.
STRUCT_LAMBDA_BUDGET = 15

_FOLDING_OPS = ("$and", "$or", "$not", "$xor", "$in", "$nin", "$exists")


def lambda_depth_estimate(node: Node) -> int:
    if isinstance(node, Const):
        return 0
    if isinstance(node, (LabelRef, ComputedRef)):
        return 1
    assert isinstance(node, Op)
    fold_steps = len(node.operands) if node.name in _FOLDING_OPS else 0
    deepest = max((lambda_depth_estimate(o) for o in node.operands),
                  default=0)
    return deepest + len(node.operands) + 1 + fold_steps


class ColumnCompiler:
    """Compiles a stateless AST to a tagged-struct Column expression.

    Sub-expressions are *let-bound* with higher-order-function lambdas::

        transform(array(<expr>), v -> <body using v>)[0]

    A lambda variable is a true binding in Catalyst — the optimizer never
    substitutes it away, unlike alias columns which filter-pushdown /
    CollapseProject inline once per reference (exponential tree growth and
    driver OOM at nesting depth >= 3).  The cost is that lambda bodies are
    interpreted rather than whole-stage-codegen'd; still JVM-side and
    orders of magnitude faster than a Python UDF.
    """

    def __init__(self, ts: Column, labels: Column, computed_labels: Optional[Column] = None):
        self.ts = ts
        self.labels = labels
        self.computed = computed_labels if computed_labels is not None else F.lit(None).cast(
            "map<string,string>"
        )

    # -- let-binding machinery -------------------------------------------
    @staticmethod
    def _let(expr: Column, k) -> Column:
        """let v = expr in k(v) — lambda-variable binding via transform()."""
        return F.transform(F.array(expr), k).getItem(0)

    def _c(self, node: Node, k) -> Column:
        """Compile ``node``; continuation ``k`` receives a *cheap* Column
        (lambda var or literal struct) holding the node's tagged value."""
        if isinstance(node, Const):
            return k(_const_struct(node.value))
        if isinstance(node, LabelRef):
            raw = F.element_at(self.labels, F.lit(node.name))
            expr = _parse_dynamic(raw, F.lit(f"Reference '&{node.name}' not found"))
            return self._let(expr, k)
        if isinstance(node, ComputedRef):
            raw = F.element_at(self.computed, F.lit(node.name))
            expr = _parse_dynamic(raw, F.lit(f"Reference '@{node.name}' not found"))
            return self._let(expr, k)
        assert isinstance(node, Op)
        return self._cseq(node.operands, lambda vs: self._op(node, vs, k))

    def _cseq(self, nodes, k) -> Column:
        # NB: continuations must take exactly one parameter — F.transform
        # passes an index argument to two-parameter callables.
        acc: list = []

        def go(i: int) -> Column:
            if i == len(nodes):
                return k(acc)

            def make(j: int):
                def cont(v):
                    acc.append(v)
                    return go(j + 1)
                return cont

            return self._c(nodes[i], make(i))

        return go(0)

    # -- entry point -----------------------------------------------------
    def predicate(self, node: Node, strict: bool = False) -> Column:
        """Compile to a self-contained boolean filter Column (top-level
        as_bool + error policy of filters/when.rs:81-95)."""
        def top(x: Column) -> Column:
            ok = _as_bool(x)
            if strict:
                return F.when(x["e"].isNotNull(), F.raise_error(x["e"])).otherwise(ok)
            return F.when(x["e"].isNotNull(), F.lit(False)).otherwise(
                F.coalesce(ok, F.lit(False)))
        body = lambda: self._c(node, lambda v: self._let(F.struct(top(v).alias("p")),
                                                         lambda r: r["p"]))
        return self._bind_inputs(body)

    def value(self, node: Node) -> Column:
        """Compile to the raw tagged-struct value (for tests/projections)."""
        return self._bind_inputs(lambda: self._c(node, lambda v: v))

    def _bind_inputs(self, body) -> Column:
        """Let-bind the labels maps once per row before compiling.

        The maps are often *derived* expressions (create_map + JSON
        extraction over a source table); without this binding every label
        reference re-evaluates the whole map construction per row — a
        30x slowdown on conditions with many references."""
        outer_labels, outer_computed = self.labels, self.computed

        def with_labels(lv: Column) -> Column:
            self.labels = lv

            def with_computed(cv: Column) -> Column:
                self.computed = cv
                try:
                    return body()
                finally:
                    self.labels, self.computed = outer_labels, outer_computed

            return self._let(F.struct(outer_computed.alias("m")),
                             lambda s: with_computed(s["m"]))

        return self._let(F.struct(outer_labels.alias("m")),
                         lambda s: with_labels(s["m"]))

    # -- operators -------------------------------------------------------
    def _op(self, node: Op, vs, k) -> Column:
        """Build the operator expression over child vars ``vs`` and pass a
        bound var for the result to ``k``."""
        name = node.name
        if name in ("$and", "$or", "$not"):
            return self._fold_logical(name, vs, k)
        if name in ("$in", "$nin"):
            return self._fold_in(name, vs, k)
        if name == "$exists":
            return self._fold_exists(vs, k)
        expr = self._simple_op(name, vs)
        return self._let(expr, k)

    def _simple_op(self, name: str, ops) -> Column:
        if name == "$xor":
            # one_of.rs evaluates every operand — first error in order wins
            total = F.lit(0)
            for x in ops:
                total = total + F.coalesce(_as_bool(x).cast("int"), F.lit(0))
            return _bool_result(total == 1, _first_err(*ops) if ops else _null("string"))
        if name in ("$eq", "$ne"):
            eq = self._eq_raw(ops[0], ops[1])
            e = _first_err(*ops)
            return _bool_result(eq if name == "$eq" else ~eq, e)
        if name in ("$gt", "$gte", "$lt", "$lte"):
            return self._ordering(name, ops[0], ops[1])
        if name in ("$add", "$sub", "$mult"):
            return self._arith(name, ops[0], ops[1])
        if name == "$div":
            return self._div(ops[0], ops[1])
        if name == "$div_num":
            return self._div_num(ops[0], ops[1])
        if name == "$rem":
            return self._rem(ops[0], ops[1])
        if name == "$abs":
            return self._abs(ops[0])
        if name in ("$contains", "$starts_with", "$ends_with"):
            a, b = _display(ops[0]), _display(ops[1])
            res = {
                "$contains": a.contains(b),
                "$starts_with": a.startswith(b),
                "$ends_with": a.endswith(b),
            }[name]
            return _bool_result(res, _first_err(*ops))
        if name in ("$second", "$minute", "$hour", "$day", "$month", "$year", "$weekday"):
            return self._date(name, ops)
        if name == "$cast":
            return self._cast(ops[0], ops[1])
        if name == "$ref":
            raw = F.element_at(self.labels, _display(ops[0]))
            parsed = _parse_dynamic(
                raw, F.concat(F.lit("Reference '&"), _display(ops[0]), F.lit("' not found"))
            )
            return F.when(ops[0]["e"].isNotNull(),
                          _mk(F.lit(TBOOL), e=ops[0]["e"])).otherwise(parsed)
        if name == "$timestamp":
            return _mk(F.lit(TINT), i=self.ts)
        raise CondError(
            f"Operator '{name}' is stateful or unsupported in the Column fast path"
        )

    # -- sequential folds (short-circuit error semantics) ----------------
    def _fold_logical(self, name: str, vs, k) -> Column:
        """Left-to-right scan like all_of.rs/any_of.rs/none_of.rs: an
        operand's error only propagates if evaluation reaches it (no
        earlier operand already decided the result)."""
        if not vs:
            # AllOf([])==true, AnyOf([])==false, NoneOf([])==true
            base = name in ("$and", "$not")
            return self._let(_mk(F.lit(TBOOL), b=F.lit(base)), k)
        conj = name == "$and"

        def step(i: int, val: Column, err: Column) -> Column:
            if i == len(vs):
                out = val if name in ("$and", "$or") else ~val
                return self._let(_bool_result(out, err), k)
            x = vs[i]
            if conj:
                active = val & err.isNull()
            else:
                active = ~val & err.isNull()
            new_err = F.when(active, x["e"]).otherwise(err)
            new_val = F.when(active & x["e"].isNull(), _as_bool(x)).otherwise(val)
            st = F.struct(new_val.alias("v"), new_err.alias("e"))
            return self._let(st, lambda s: step(i + 1, s["v"], s["e"]))

        return step(0, F.lit(conj), _null("string"))

    def _fold_in(self, name: str, vs, k) -> Column:
        """in.rs: scan items in order, stop at first match; an error in an
        item evaluated before a match propagates, after a match doesn't."""
        head, rest = vs[0], vs[1:]

        def step(i: int, hit: Column, err: Column) -> Column:
            if i == len(rest):
                out = hit if name == "$in" else ~hit
                return self._let(_bool_result(out, err), k)
            x = rest[i]
            active = ~hit & err.isNull()
            new_err = F.when(active, x["e"]).otherwise(err)
            new_hit = F.when(active & x["e"].isNull(),
                             hit | self._eq_raw(head, x)).otherwise(hit)
            st = F.struct(new_hit.alias("v"), new_err.alias("e"))
            return self._let(st, lambda s: step(i + 1, s["v"], s["e"]))

        return step(0, F.lit(False), head["e"])

    def _fold_exists(self, vs, k) -> Column:
        """exists.rs: names checked in order; first missing label returns
        false before later operands are evaluated."""

        def step(i: int, present: Column, err: Column) -> Column:
            if i == len(vs):
                return self._let(_bool_result(present, err), k)
            x = vs[i]
            active = present & err.isNull()
            new_err = F.when(active, x["e"]).otherwise(err)
            contained = F.coalesce(
                F.map_contains_key(self.labels, _display(x)), F.lit(False))
            new_present = F.when(active & x["e"].isNull(), contained).otherwise(present)
            st = F.struct(new_present.alias("v"), new_err.alias("e"))
            return self._let(st, lambda s: step(i + 1, s["v"], s["e"]))

        return step(0, F.lit(True), _null("string"))

    # -- expression families ---------------------------------------------
    def _eq_raw(self, a: Column, b: Column) -> Column:
        both_str = (a["t"] == TSTR) & (b["t"] == TSTR)
        any_str = (a["t"] == TSTR) | (b["t"] == TSTR)
        either_f = (a["t"] == TFLOAT) | (b["t"] == TFLOAT)
        fa, fb = _to_f(a), _to_f(b)
        nan = F.when(either_f, F.isnan(fa) | F.isnan(fb)).otherwise(F.lit(False))
        return (
            F.when(both_str, a["s"] == b["s"])
            .when(any_str, F.lit(False))
            .when(nan, F.lit(False))  # IEEE: NaN equals nothing (Spark would say NaN==NaN)
            .when(either_f, fa == fb)
            .otherwise(_to_i(a) == _to_i(b))
        )

    def _ordering(self, name: str, a: Column, b: Column) -> Column:
        both_str = (a["t"] == TSTR) & (b["t"] == TSTR)
        any_str = (a["t"] == TSTR) | (b["t"] == TSTR)
        either_f = (a["t"] == TFLOAT) | (b["t"] == TFLOAT)
        fa, fb = _to_f(a), _to_f(b)
        ia, ib = _to_i(a), _to_i(b)
        nan = F.when(either_f, F.isnan(fa) | F.isnan(fb)).otherwise(F.lit(False))
        cmps = {
            "$gt": (a["s"] > b["s"], fa > fb, ia > ib),
            "$gte": (a["s"] >= b["s"], fa >= fb, ia >= ib),
            "$lt": (a["s"] < b["s"], fa < fb, ia < ib),
            "$lte": (a["s"] <= b["s"], fa <= fb, ia <= ib),
        }[name]
        # unordered pairs (string-vs-non-string, NaN): Rust PartialOrd
        # partial_cmp None -> Bool(false), never an error (gt.rs
        # Ok(Bool(v1 > v2)); round-4 correction)
        e = F.coalesce(a["e"], b["e"])
        res = (
            F.when(both_str, cmps[0])
            .when(any_str | nan, F.lit(False))
            .when(either_f, cmps[1])
            .otherwise(cmps[2])
        )
        return _bool_result(res, e)

    def _arith(self, name: str, a: Column, b: Column) -> Column:
        both_str = (a["t"] == TSTR) & (b["t"] == TSTR)
        any_str = (a["t"] == TSTR) | (b["t"] == TSTR)
        either_f = (a["t"] == TFLOAT) | (b["t"] == TFLOAT)
        fa, fb = _to_f(a), _to_f(b)
        ia, ib = _to_i(a), _to_i(b)
        fop = {"$add": fa + fb, "$sub": fa - fb, "$mult": fa * fb}[name]
        iop = {"$add": ia + ib, "$sub": ia - ib, "$mult": ia * ib}[name]
        verb = {"$add": "add", "$sub": "subtract", "$mult": "multiply"}[name]
        if name == "$add":
            # value.rs Add names both kinds: "Cannot add duration to
            # string", "Cannot add string to float", ...
            def _word(x):
                return (F.when(x["t"] == TBOOL, F.lit("boolean"))
                        .when(x["t"] == TINT, F.lit("integer"))
                        .when(x["t"] == TFLOAT, F.lit("float"))
                        .when(x["t"] == TDUR, F.lit("duration"))
                        .otherwise(F.lit("string")))
            str_err = F.when(
                any_str & ~both_str,
                F.when(a["t"] == TSTR,
                       F.concat(F.lit("Cannot add string to "), _word(b)))
                .otherwise(F.concat(F.lit("Cannot add "), _word(a),
                                    F.lit(" to string"))))
            e = F.coalesce(a["e"], b["e"], str_err)
            return (
                F.when(both_str, _mk(F.lit(TSTR), s=F.concat(a["s"], b["s"]), e=_first_err(a, b)))
                .when(any_str, _mk(F.lit(TBOOL), e=e))
                .when(either_f, _mk(F.lit(TFLOAT), f=fop, e=e))
                .otherwise(_mk(F.lit(TINT), i=iop, e=e))
            )
        str_err = F.when(any_str, F.lit(f"Cannot {verb} string"))
        e = F.coalesce(a["e"], b["e"], str_err)
        return (
            F.when(any_str, _mk(F.lit(TBOOL), e=e))
            .when(either_f, _mk(F.lit(TFLOAT), f=fop, e=e))
            .otherwise(_mk(F.lit(TINT), i=iop, e=e))
        )

    def _div(self, a: Column, b: Column) -> Column:
        any_str = (a["t"] == TSTR) | (b["t"] == TSTR)
        fb = _to_f(b)
        zero = fb == 0.0
        e = F.coalesce(
            a["e"], b["e"],
            F.when(a["t"] == TSTR, F.lit("Cannot divide string")),
            F.when(b["t"] == TSTR, F.lit("Cannot divide by string")),
            F.when(zero, F.lit("Cannot divide by zero")),
        )
        return F.when(any_str | zero, _mk(F.lit(TBOOL), e=e)).otherwise(
            _mk(F.lit(TFLOAT), f=_to_f(a) / fb, e=e)
        )

    def _div_num(self, a: Column, b: Column) -> Column:
        any_str = (a["t"] == TSTR) | (b["t"] == TSTR)
        ia, ib = _to_i(a), _to_i(b)
        zero = ib == 0
        e = F.coalesce(
            a["e"], b["e"],
            F.when(a["t"] == TSTR, F.lit("Cannot divide string")),
            F.when(b["t"] == TSTR, F.lit("Cannot divide by string")),
            F.when(zero, F.lit("Cannot divide by zero")),
        )
        # exact i64 division truncating toward zero (Spark `div`, like the
        # flat tier).  The old decimal route rounded |a|/|b| at reduced
        # scale for near-2^63 magnitudes (MAX div MIN came out 1, not 0 —
        # fuzz-found seed 2014)
        q = F.call_function("div", ia, ib)
        return F.when(any_str | zero, _mk(F.lit(TBOOL), e=e)).otherwise(
            _mk(F.lit(TINT), i=q, e=e)
        )

    def _rem(self, a: Column, b: Column) -> Column:
        any_str = (a["t"] == TSTR) | (b["t"] == TSTR)
        either_f = (a["t"] == TFLOAT) | (b["t"] == TFLOAT)
        ia, ib = _to_i(a), _to_i(b)
        fa, fb = _to_f(a), _to_f(b)
        int_zero = (~either_f) & (ib == 0)
        e = F.coalesce(
            a["e"], b["e"],
            F.when(any_str, F.lit("Cannot divide by string")),
            F.when(int_zero, F.lit("Cannot divide by zero")),
        )
        # Spark % on longs/doubles keeps the dividend's sign (Java %), like
        # Rust; but Spark yields NULL for float % 0.0 where IEEE (and Rust)
        # yield NaN — patch that case explicitly
        f_rem = F.when(fb == 0.0, F.lit(float("nan"))).otherwise(fa % fb)
        return (
            F.when(any_str | int_zero, _mk(F.lit(TBOOL), e=e))
            .when(either_f, _mk(F.lit(TFLOAT), f=f_rem, e=e))
            .otherwise(_mk(F.lit(TINT), i=ia % ib, e=e))
        )

    def _abs(self, a: Column) -> Column:
        e = F.coalesce(a["e"], F.when(a["t"] == TSTR,
                                      F.lit("Cannot calculate absolute value of a string")))
        return (
            F.when(a["t"] == TSTR, _mk(F.lit(TBOOL), e=e))
            .when(a["t"] == TFLOAT, _mk(F.lit(TFLOAT), f=F.abs(a["f"]), e=e))
            .when(a["t"] == TBOOL, _mk(F.lit(TINT), i=a["b"].cast("long"), e=e))
            .otherwise(_mk(F.lit(TINT), i=F.abs(a["i"]), e=e))
        )

    def _date(self, name: str, ops) -> Column:
        ts_us = _to_i(ops[0])
        ts_err = F.when(
            (ops[0]["t"] == TSTR),
            # value.rs:87 as_int error carries the text
            F.concat(F.lit("Value '"), ops[0]["s"],
                     F.lit("' could not be parsed as integer")),
        )
        # date.rs:40-46 — chrono rejects timestamps outside its range
        oob = (ts_us > F.lit(V.TS_US_MAX)) | (ts_us < F.lit(V.TS_US_MIN))
        oob_err = F.when(
            oob,
            F.concat(F.lit(f"{name} requires a valid timestamp in "
                           f"microseconds, got "), ts_us.cast("string")))
        # clamp when out of range: from_utc_timestamp on i64::MAX throws
        # at runtime even though the error channel masks the result
        instant = F.timestamp_micros(
            F.when(F.coalesce(oob, F.lit(False)), F.lit(0)).otherwise(ts_us))
        if len(ops) == 2:
            tz_e = F.when(ops[1]["t"] != TSTR, F.lit(f"{name} requires timezone to be a string"))
            local = F.from_utc_timestamp(instant, ops[1]["s"])
            e = F.coalesce(ops[0]["e"], ops[1]["e"], ts_err, oob_err, tz_e)
        else:
            local = instant  # session timezone is pinned to UTC
            e = F.coalesce(ops[0]["e"], ts_err, oob_err)
        fld = {
            "$second": F.second(local),
            "$minute": F.minute(local),
            "$hour": F.hour(local),
            "$day": F.dayofmonth(local),
            "$month": F.month(local),
            "$year": F.year(local),
            "$weekday": (F.dayofweek(local) + 5) % 7,  # 0=Monday like chrono
        }[name]
        return _mk(F.lit(TINT), i=fld, e=e)

    def _cast(self, a: Column, t: Column) -> Column:
        tn = _display(t)
        parse_i_err = F.when(
            (a["t"] == TSTR) & ~a["s"].rlike(_INT_RE),
            F.concat(F.lit("Value '"), a["s"], F.lit("' could not be parsed as integer")),
        )
        # Rust-parse semantics, not Spark cast: no whitespace trimming,
        # signed NaN spellings accepted (fuzz-found)
        from .fastcols import parse_double
        str_as_f = parse_double(a["s"])
        parse_f_err = F.when(
            (a["t"] == TSTR) & str_as_f.isNull(),
            F.concat(F.lit("Value '"), a["s"], F.lit("' could not be parsed as float")),
        )
        str_as_i = F.when(a["s"].rlike(_INT_RE), a["s"].try_cast("long"))
        to_int = F.when(a["t"] == TSTR, str_as_i).otherwise(_to_i(a))
        to_float = F.when(a["t"] == TSTR, str_as_f).otherwise(_to_f(a))
        e0 = F.coalesce(a["e"], t["e"])
        return (
            F.when(tn == "bool", _mk(F.lit(TBOOL), b=_as_bool(a), e=e0))
            .when(tn == "int", _mk(F.lit(TINT), i=to_int, e=F.coalesce(e0, parse_i_err)))
            .when(tn == "float", _mk(F.lit(TFLOAT), f=to_float, e=F.coalesce(e0, parse_f_err)))
            .when(tn == "string", _mk(F.lit(TSTR), s=_display(a), e=e0))
            .when(tn == "duration", _mk(F.lit(TDUR), i=to_int, e=F.coalesce(e0, parse_i_err)))
            .otherwise(_mk(F.lit(TBOOL), e=F.coalesce(e0, F.concat(F.lit("Unknown type '"), tn, F.lit("'")))))
        )


def compile_predicate(node: Node, strict: bool = False,
                      ts_col: str = "ts", labels_col: str = "labels",
                      computed_col: Optional[str] = "computed_labels") -> Column:
    """Compile a stateless condition AST to a self-contained boolean Column."""
    computed = F.col(computed_col) if computed_col else None
    cc = ColumnCompiler(F.col(ts_col), F.col(labels_col), computed)
    return cc.predicate(node, strict=strict)


def compile_filter(df, node: Node, strict: bool = False,
                   ts_col: str = "ts", labels_col: str = "labels",
                   computed_col: Optional[str] = "computed_labels"):
    """Filter ``df`` by a stateless condition AST, JVM-side."""
    has_computed = computed_col and computed_col in df.columns
    pred = compile_predicate(node, strict, ts_col, labels_col,
                             computed_col if has_computed else None)
    return df.where(pred)
