"""Expression-string fast path for the flat condition tier (r11).

The flat compiler (``fastcols.py``) is semantically exact but builds its
result as pyspark ``Column`` objects — every ``F.xxx`` call and Column
operator is a py4j round-trip, and a registry-typical ``when`` condition
costs hundreds to thousands of them.  That driver-side construction cost
was measured at ~0.5 s per query across the ~85 records-model bench
entries (guide §1.2: the distributed algorithm includes the driver).

This module eliminates the boundary without forking the compiler logic:
``fastcols.py`` is re-executed as a second module instance whose ``F``
and ``Column`` globals are replaced by a pure-Python SQL-text expression
builder (``SF`` / ``SCol``).  The EXACT SAME compiler code then emits
one SQL string per predicate/lane, and the only py4j calls left are the
final ``selectExpr``/``F.expr`` — ~2 per query instead of ~10^3.

Equivalence argument: the compiled expression TREE is produced by the
same Python control flow, so the string form can only diverge from the
Column form through the substrate mapping itself (operator rendering,
literal formatting, escaping).  Each mapping below targets the exact
Catalyst expression the pyspark API builds:

* operators render with precedence-aware MINIMAL parentheses (see the
  level table below — full parenthesization provoked superlinear ANTLR
  ``adaptivePredict`` cost: ~39 s to parse one 28 KB predicate);
* string literals escape ``\\`` and ``'`` (plus control chars) for the
  default ``escapedStringLiterals=false`` parser mode the engine pins;
* float literals use ``repr()`` (shortest-roundtrip) + ``D`` suffix so
  they parse via Java ``Double.parseDouble`` to the identical double;
  non-finite values render as ``CAST('Infinity'/'NaN' AS DOUBLE)``;
* int literals are plain digits (the SQL parser types them INT/BIGINT
  by magnitude, matching ``F.lit``'s int32/int64 split);
* ``F.call_function("div", a, b)`` renders as the ``a DIV b`` operator
  (same ``IntegralDivide`` expression).

The three-layer compile-size budget is preserved: layer 1 (AST guard)
and layer 2 (the pure-Python screen) run unchanged inside the reloaded
module; a condition the screen flags is raised as ``Unsupported`` HERE
(before compiling), routing it to the Column-based flat tier whose
layer-3 exact JVM tree measurement still applies.  The struct tier and
interpreter fallbacks behind it are untouched.
"""

from __future__ import annotations

import importlib.util
from typing import Dict, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import fastcols as _fc
from . import values as V
from .ast import ComputedRef, Const, LabelRef, Node, Op

# -- SQL text fragments -------------------------------------------------

_CTRL = {"\n": "\\n", "\r": "\\r", "\t": "\\t", "\0": "\\0",
         "\x1a": "\\Z"}


def sql_str(s: str) -> str:
    """SQL string literal for the default (escape-processing) parser."""
    out = s.replace("\\", "\\\\").replace("'", "\\'")
    for ch, rep in _CTRL.items():
        out = out.replace(ch, rep)
    return "'" + out + "'"


def sql_ident(name: str) -> str:
    """Backtick-quoted identifier; embedded backticks double (ADVICE r10)."""
    return "`" + name.replace("`", "``") + "`"


_TYPES = {"double": "DOUBLE", "long": "BIGINT", "int": "INT",
          "string": "STRING", "boolean": "BOOLEAN", "timestamp": "TIMESTAMP"}


def _lit_text(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        if v != v:
            return "CAST('NaN' AS DOUBLE)"
        if v == float("inf"):
            return "CAST('Infinity' AS DOUBLE)"
        if v == float("-inf"):
            return "CAST('-Infinity' AS DOUBLE)"
        return repr(v) + "D"
    if isinstance(v, str):
        return sql_str(v)
    raise _fc.Unsupported(f"literal type {type(v).__name__}")


# Operator precedence levels (bigger binds tighter), mirroring Spark's
# SQL grammar: atoms (identifiers, literals, function calls, CASE..END,
# CAST) never need parentheses; unary minus; multiplicative (* / % DIV);
# additive (+ -); predicates/comparisons (= != < <= > >=, IN, RLIKE,
# IS [NOT] NULL); NOT; AND; OR.
#
# Parentheses are emitted ONLY where the parse would otherwise regroup:
# Spark's ANTLR parser exhibits superlinear `adaptivePredict` cost on
# deeply nested parentheses (each "(" may open a scalar subquery, so
# prediction closures compound per level -- observed ~39 s to parse one
# fully-parenthesized 28 KB predicate vs milliseconds minimal-paren),
# so minimal rendering is a cost requirement, not style.
_P_ATOM = 9
_P_NEG = 8
_P_MUL = 7
_P_ADD = 6
_P_CMP = 5
_P_NOT = 4
_P_AND = 3
_P_OR = 2


class SCol:
    """SQL-text expression node quacking like the pyspark Column subset
    ``fastcols`` uses.  ``s`` is the expression text; ``p`` its top-level
    operator precedence (for minimal-parenthesis embedding)."""

    __slots__ = ("s", "p")

    def __init__(self, s: str, p: int = _P_ATOM):
        self.s = s
        self.p = p

    # -- helpers --
    @staticmethod
    def _c(o) -> "SCol":
        if isinstance(o, SCol):
            return o
        t = _lit_text(o)
        # a leading "-" is a unary-minus parse, not part of the literal
        return SCol(t, _P_NEG if t.startswith("-") else _P_ATOM)

    def _at(self, lvl: int) -> str:
        """Text, parenthesized iff this node binds looser than ``lvl``."""
        return f"({self.s})" if self.p < lvl else self.s

    def _bin(self, op: str, lvl: int, o, flip: bool = False) -> "SCol":
        a, b = self, SCol._c(o)
        if flip:
            a, b = b, a
        # left-associative grammar: the left child may sit at the same
        # level unparenthesized (re-parses to the same tree), the right
        # child must bind strictly tighter
        return SCol(f"{a._at(lvl)} {op} {b._at(lvl + 1)}", lvl)

    # -- comparison / logic --
    def __eq__(self, o):  # noqa: D105
        return self._bin("=", _P_CMP, o)

    def __ne__(self, o):  # noqa: D105
        return self._bin("!=", _P_CMP, o)

    def __lt__(self, o):
        return self._bin("<", _P_CMP, o)

    def __le__(self, o):
        return self._bin("<=", _P_CMP, o)

    def __gt__(self, o):
        return self._bin(">", _P_CMP, o)

    def __ge__(self, o):
        return self._bin(">=", _P_CMP, o)

    __hash__ = object.__hash__

    def __and__(self, o):
        return self._bin("AND", _P_AND, o)

    def __rand__(self, o):
        return self._bin("AND", _P_AND, o, flip=True)

    def __or__(self, o):
        return self._bin("OR", _P_OR, o)

    def __ror__(self, o):
        return self._bin("OR", _P_OR, o, flip=True)

    def __invert__(self):
        return SCol(f"NOT {self._at(_P_NOT)}", _P_NOT)

    # -- arithmetic --
    def __add__(self, o):
        return self._bin("+", _P_ADD, o)

    def __radd__(self, o):
        return self._bin("+", _P_ADD, o, flip=True)

    def __sub__(self, o):
        return self._bin("-", _P_ADD, o)

    def __rsub__(self, o):
        return self._bin("-", _P_ADD, o, flip=True)

    def __mul__(self, o):
        return self._bin("*", _P_MUL, o)

    def __rmul__(self, o):
        return self._bin("*", _P_MUL, o, flip=True)

    def __truediv__(self, o):
        return self._bin("/", _P_MUL, o)

    def __rtruediv__(self, o):
        return self._bin("/", _P_MUL, o, flip=True)

    def __mod__(self, o):
        return self._bin("%", _P_MUL, o)

    def __rmod__(self, o):
        return self._bin("%", _P_MUL, o, flip=True)

    def __neg__(self):
        return SCol(f"- {self._at(_P_NEG + 1)}", _P_NEG)

    def __bool__(self):
        raise _fc.Unsupported("SCol in boolean context")

    # -- methods --
    def cast(self, t: str) -> "SCol":
        return SCol(f"CAST({self.s} AS {_TYPES[t]})")

    def try_cast(self, t: str) -> "SCol":
        return SCol(f"TRY_CAST({self.s} AS {_TYPES[t]})")

    # predicates (IS NULL, IN, RLIKE) attach to a valueExpression at the
    # `predicated` grammar level: they may NOT themselves appear as a
    # comparison operand without parentheses, so their RESULT level is
    # _P_NOT (below comparisons — forces parens there, none under AND/OR)
    def isNull(self) -> "SCol":
        return SCol(f"{self._at(_P_CMP + 1)} IS NULL", _P_NOT)

    def isNotNull(self) -> "SCol":
        return SCol(f"{self._at(_P_CMP + 1)} IS NOT NULL", _P_NOT)

    def isin(self, *vals) -> "SCol":
        items = ", ".join(SCol._c(v).s for v in vals)
        return SCol(f"{self._at(_P_CMP + 1)} IN ({items})", _P_NOT)

    def rlike(self, pat: str) -> "SCol":
        return SCol(f"{self._at(_P_CMP + 1)} RLIKE {sql_str(pat)}", _P_NOT)

    def contains(self, o) -> "SCol":
        return SCol(f"contains({self.s}, {SCol._c(o).s})")

    def startswith(self, o) -> "SCol":
        return SCol(f"startswith({self.s}, {SCol._c(o).s})")

    def endswith(self, o) -> "SCol":
        return SCol(f"endswith({self.s}, {SCol._c(o).s})")


class SCaseCol(SCol):
    """CASE WHEN chain; usable as an expression at any point (no ELSE =>
    NULL, exactly like an un-``otherwise``d pyspark ``when``).  The
    CASE..END keywords delimit every operand, so branches embed at any
    precedence without parentheses -- each CASE is an atom."""

    __slots__ = ("_branches", "_else")

    def __init__(self, branches, els=None):
        self._branches = branches
        self._else = els
        super().__init__(self._render(), _P_ATOM)

    def _render(self) -> str:
        parts = ["CASE"]
        for c, v in self._branches:
            parts.append(f"WHEN {c} THEN {v}")
        if self._else is not None:
            parts.append(f"ELSE {self._else}")
        parts.append("END")
        return " ".join(parts)

    def when(self, cond, value) -> "SCaseCol":
        return SCaseCol(self._branches
                        + [(SCol._c(cond).s, SCol._c(value).s)], self._else)

    def otherwise(self, value) -> "SCaseCol":
        return SCaseCol(self._branches, SCol._c(value).s)


def _fn(name):
    def call(*args):
        return SCol(f"{name}({', '.join(SCol._c(a).s for a in args)})")
    return call


class SF:
    """``pyspark.sql.functions`` shim over SQL text (fastcols' subset)."""

    @staticmethod
    def lit(v):
        return SCol._c(v)

    @staticmethod
    def col(name):
        return SCol(sql_ident(name))

    @staticmethod
    def expr(text):
        return SCol(f"({text})")

    @staticmethod
    def when(cond, value):
        return SCaseCol([(SCol._c(cond).s, SCol._c(value).s)])

    @staticmethod
    def call_function(name, *args):
        if name == "div":
            a, b = args
            return SCol(f"({SCol._c(a).s} DIV {SCol._c(b).s})")
        return _fn(name)(*args)

    coalesce = staticmethod(_fn("coalesce"))
    concat = staticmethod(_fn("concat"))
    isnan = staticmethod(_fn("isnan"))
    abs = staticmethod(_fn("abs"))
    substr = staticmethod(_fn("substr"))
    element_at = staticmethod(_fn("element_at"))
    regexp_extract = staticmethod(_fn("regexp_extract"))
    regexp_replace = staticmethod(_fn("regexp_replace"))
    length = staticmethod(_fn("length"))
    lower = staticmethod(_fn("lower"))
    floor = staticmethod(_fn("floor"))
    ceil = staticmethod(_fn("ceil"))
    year = staticmethod(_fn("year"))
    month = staticmethod(_fn("month"))
    dayofmonth = staticmethod(_fn("dayofmonth"))
    dayofweek = staticmethod(_fn("dayofweek"))
    hour = staticmethod(_fn("hour"))
    minute = staticmethod(_fn("minute"))
    second = staticmethod(_fn("second"))
    timestamp_micros = staticmethod(_fn("timestamp_micros"))
    from_utc_timestamp = staticmethod(_fn("from_utc_timestamp"))
    raise_error = staticmethod(_fn("raise_error"))
    map_contains_key = staticmethod(_fn("map_contains_key"))


def _load_text_compiler():
    """Second instance of fastcols with the SQL-text substrate injected.

    The module executes normally (its top-level only defines constants,
    the FV dataclass and the compiler), then ``F``/``Column`` are
    rebound so every function body resolves them to the shim.
    ``Unsupported`` is rebound to the REAL fastcols class so callers'
    ``except Unsupported`` handlers see one exception type."""
    import sys
    spec = importlib.util.spec_from_file_location(
        "reductstore_spark.condition._fastcols_sqltext", _fc.__file__)
    mod = importlib.util.module_from_spec(spec)
    # dataclass creation resolves sys.modules[cls.__module__] at exec time
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    mod.F = SF
    mod.Column = SCol
    mod.Unsupported = _fc.Unsupported
    return mod


_M = _load_text_compiler()

# hard cap on emitted text per query (parser cost guard): the AST-size
# and screen budgets bound the EXPANDED tree, but text renders shared
# subtrees by copy, so cap the concrete bytes the SQL parser will see.
# 64 KiB: >2x the largest registry condition (~28 KB), while routing
# adversarial sharing-heavy shapes — where the layer-2 estimate badly
# under-counts and this tier has no layer-3 JVM measurement — to the
# Column ladder.  Measured necessity: a depth-3 fuzz shape (fuzz seed
# 5008) emitted a 1.3 MB text that passed the old 2 MB cap and OOM'd
# the driver in parse/codegen; the Column tiers route the same shape
# to the interpreter.
_MAX_TEXT = 65_536


def _collect_refs(node: Node, labels, computed):
    if isinstance(node, LabelRef):
        labels.add(node.name)
    elif isinstance(node, ComputedRef):
        computed.add(node.name)
    elif isinstance(node, Op):
        if (node.name == "$ref" and len(node.operands) == 1
                and isinstance(node.operands[0], Const)):
            labels.add(V.to_display(node.operands[0].value))
            return
        for o in node.operands:
            _collect_refs(o, labels, computed)


def _screen(node: Node, strict: bool) -> None:
    """Layer-2 screen, applied BEFORE compiling: over-estimate shapes
    need the Column tier's exact layer-3 JVM measurement, which the
    text substrate cannot run."""
    if _M._est_size(node, strict) > _M._SCREEN_EST:
        raise _fc.Unsupported("string tier: over compile-size screen")


def flat_bound_sql(df: DataFrame, nodes: List[Node],
                   label_columns: Optional[Dict[str, str]] = None,
                   strict: bool = False):
    """String-substrate mirror of ``planner._flat_bound``.

    ``label_columns`` values must be SQL TEXT (virtual-label expressions,
    e.g. from ``schema.events_label_columns``); any pyspark Column value
    raises ``Unsupported`` so the caller falls back to the Column tier.

    Returns ``(bound_df, [predicate Column per node], added_col_names)``
    with exactly TWO py4j surfaces: one ``selectExpr`` for the leaf
    projection (+ pushdown barrier) and one ``F.expr`` per predicate.
    """
    label_columns = label_columns or {}
    for v in label_columns.values():
        if not isinstance(v, str):
            raise _fc.Unsupported("string tier: Column-valued label_columns")
    computed_col = ("computed_labels" if "computed_labels" in df.columns
                    else None)
    lnames, cnames = set(), set()
    for n in nodes:
        _screen(n, strict)
        _collect_refs(n, lnames, cnames)

    adds = []  # (alias, sql_text)
    label_fvs, computed_fvs = {}, {}

    def bind(name, raw_s, prefix, i):
        ra, nu, fl, lg = (f"__{prefix}r{i}", f"__{prefix}n{i}",
                          f"__{prefix}f{i}", f"__{prefix}l{i}")
        num, flt, lng = _M.label_parts(SCol(raw_s))
        adds.extend([(ra, raw_s), (nu, num.s), (fl, flt.s), (lg, lng.s)])
        return (SF.col(ra), SF.col(nu), SF.col(fl), SF.col(lg))

    for i, name in enumerate(sorted(lnames)):
        raw_s = (f"({label_columns[name]})" if name in label_columns
                 else f"element_at({sql_ident('labels')}, {sql_str(name)})")
        label_fvs[name] = bind(name, raw_s, "lb", i)
    if computed_col:
        for i, name in enumerate(sorted(cnames)):
            raw_s = (f"element_at({sql_ident(computed_col)}, "
                     f"{sql_str(name)})")
            computed_fvs[name] = bind(name, raw_s, "cb", i)

    comp = SF.col(computed_col) if computed_col else None
    compiler = _M.FlatCompiler(
        SF.col("ts"), SF.col("labels"), comp,
        label_columns={k: SCol(f"({v})") for k, v in label_columns.items()},
        label_fvs=label_fvs, computed_fvs=computed_fvs, strict=strict)

    def compile_pred(n):
        # wide top-level conjunctions: bind each operand's (truthy, err
        # [, emsg]) as attributes — same shape as planner._flat_bound
        inner = n
        while (isinstance(inner, Op) and inner.name == "$and"
               and len(inner.operands) == 1):
            inner = inner.operands[0]
        if not (isinstance(inner, Op) and inner.name in ("$and", "$or")
                and len(inner.operands) >= 3):
            return compiler.predicate(n).s
        ops = []
        for j, o in enumerate(inner.operands):
            fv = compiler.compile(o)  # may raise Unsupported
            t, e = f"__cj{j}t{len(adds)}", f"__cj{j}e{len(adds)}"
            adds.append((t, SF.coalesce(_M._truthy(fv), SF.lit(False)).s))
            adds.append((e, SF.coalesce(_M._err(fv), SF.lit(False)).s))
            nfv = _M.FV(num=SF.col(t).cast("double"), err=SF.col(e),
                        numeric_only=True, bound=1, skind="boolean")
            if strict:
                m = f"__cj{j}m{len(adds)}"
                adds.append((m, _M._emsg(fv).s))
                nfv.emsg = SF.col(m)
            ops.append(nfv)
        combined = compiler._logical(inner.name, ops)
        if strict:
            em = _M._emsg(combined)
            return SF.when(em.isNotNull(), SF.raise_error(em)).otherwise(
                SF.coalesce(_M._truthy(combined), SF.lit(False))).s
        return SF.coalesce(_M._truthy(combined) & ~_M._err(combined),
                           SF.lit(False)).s

    texts = [compile_pred(n) for n in nodes]  # may raise Unsupported

    total = sum(len(t) for t in texts) + sum(len(t) for _, t in adds)
    if total > _MAX_TEXT:
        raise _fc.Unsupported(f"string tier: {total} chars of SQL text")

    if not adds:
        return df, [F.expr(t) for t in texts], []
    bound = df.selectExpr(
        "*", *[f"({t}) AS {sql_ident(a)}" for a, t in adds],
        "monotonically_increasing_id() AS __lb_barrier")
    # pushdown barrier, identical to planner._flat_bound: the project
    # carries a nondeterministic field and every predicate references it
    # through an always-false disjunct
    texts = [f"(({t}) OR (`__lb_barrier` < -1))" for t in texts]
    return (bound, [F.expr(t) for t in texts],
            [a for a, _ in adds] + ["__lb_barrier"])


def truthy_err_sql(node: Node, computed_col: Optional[str] = None,
                   label_columns: Optional[Dict[str, str]] = None):
    """(truthy_text, err_text) of a non-strict compiled FV, null-safe —
    the string analog of ``coalesce(_truthy(fv), F) / coalesce(_err(fv),
    F)`` used by the vectorized time-stateful tier."""
    label_columns = label_columns or {}
    for v in label_columns.values():
        if not isinstance(v, str):
            raise _fc.Unsupported("string tier: Column-valued label_columns")
    _screen(node, False)
    comp = SF.col(computed_col) if computed_col else None
    compiler = _M.FlatCompiler(
        SF.col("ts"), SF.col("labels"), comp,
        label_columns={k: SCol(f"({v})") for k, v in label_columns.items()})
    fv = compiler.compile(node)
    t = SF.coalesce(_M._truthy(fv), SF.lit(False)).s
    e = SF.coalesce(_M._err(fv), SF.lit(False)).s
    if len(t) + len(e) > _MAX_TEXT:
        raise _fc.Unsupported("string tier: oversized SQL text")
    return t, e


def truthy_emsg_sql(node: Node, computed_col: Optional[str] = None,
                    label_columns: Optional[Dict[str, str]] = None):
    """STRICT-mode (coalesce(truthy, false), emsg) texts — the string
    analog of the message-parity fuzz lanes."""
    label_columns = label_columns or {}
    for v in label_columns.values():
        if not isinstance(v, str):
            raise _fc.Unsupported("string tier: Column-valued label_columns")
    _screen(node, True)
    comp = SF.col(computed_col) if computed_col else None
    compiler = _M.FlatCompiler(
        SF.col("ts"), SF.col("labels"), comp,
        label_columns={k: SCol(f"({v})") for k, v in label_columns.items()},
        strict=True)
    fv = compiler.compile(node)
    t = SF.coalesce(_M._truthy(fv), SF.lit(False)).s
    e = _M._emsg(fv).s
    if len(t) + len(e) > _MAX_TEXT:
        raise _fc.Unsupported("string tier: oversized SQL text")
    return t, e


def predicate_sql(node: Node, computed_col: Optional[str] = None,
                  label_columns: Optional[Dict[str, str]] = None,
                  strict: bool = False) -> str:
    """Whole-predicate SQL text with UNBOUND leaves (labels-map lookups
    inline) — the no-projection analog of ``FlatCompiler.predicate`` for
    callers that cannot add bind columns.  Same screen + fallback rules
    as ``flat_bound_sql``."""
    label_columns = label_columns or {}
    for v in label_columns.values():
        if not isinstance(v, str):
            raise _fc.Unsupported("string tier: Column-valued label_columns")
    _screen(node, strict)
    comp = SF.col(computed_col) if computed_col else None
    compiler = _M.FlatCompiler(
        SF.col("ts"), SF.col("labels"), comp,
        label_columns={k: SCol(f"({v})") for k, v in label_columns.items()},
        strict=strict)
    text = compiler.predicate(node).s
    if len(text) > _MAX_TEXT:
        raise _fc.Unsupported(f"string tier: {len(text)} chars of SQL text")
    return text
