"""Query planner: choose the fastest correct execution for a `when` plan.

Tiers (fastest first):

1. **Column path** — stateless AST, no context padding: a single Catalyst
   predicate (whole plan stays in the JVM; filters get pushed toward the
   scan where possible).
2. **Window path** — stateless AST with #ctx_before/#ctx_after: match
   propagation with a window aggregate (ROWS frame for counts, RANGE on
   µs for durations) per entry.  Emission set proof: a record r is
   emitted iff some match m has r in [m - before, m + after] — the drain
   semantics of the reference's ctx buffer/latch produce exactly the
   union of those intervals (filters/when/ctx_before.rs:60-82,
   ctx_after.rs:52-70).
3. **Windowed counter rewrite** — top-level $and with exactly one
   stateful conjunct that is $each_n(const) or $limit(const) and no ctx
   padding: the counter increments only when the preceding conjuncts are
   truthy (AllOf short-circuits, all_of.rs), so a running
   sum-of-prefix-matches over a ts-ordered per-entry window replays it.
4. **Interpreter path** — anything else ($each_t, $gate, stateful ops
   nested under non-conjunctive logic, ctx+$limit interplay): exact
   per-entry ordered replay via applyInPandas (operators/stateful.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..condition import values as V
from ..condition.ast import Const, Node, Op, is_stateful
from ..condition.columns import ColumnCompiler, compile_predicate
from ..condition.fastcols import FlatCompiler, Unsupported
from ..condition.parser import parse_when
from ..condition.values import CondError, Value
from ..operators.stateful import apply_when_stateful

_PARTITION_COLS = ("bucket", "entry")


def plan_when(df: DataFrame, when, strict: bool = False) -> DataFrame:
    """Apply a `when` condition (JSON dict/string or pre-parsed AST tuple)
    to a records DataFrame with exact reference semantics."""
    if isinstance(when, tuple):
        node, directives = when
    else:
        node, directives = parse_when(when)
    return plan_parsed(df, node, directives, strict)


def plan_parsed(df: DataFrame, node: Node, directives: Dict[str, List[Value]],
                strict: bool = False, label_columns=None) -> DataFrame:
    ctx_before = directives.get("#ctx_before")
    ctx_after = directives.get("#ctx_after")
    has_ctx = ctx_before is not None or ctx_after is not None

    if not is_stateful(node):
        if not has_ctx:
            out = df.where(_predicate(df, node, strict, label_columns))
        else:
            out = _window_ctx(df, node, directives, strict, label_columns)
        return _select_labels(out, directives)

    if not has_ctx:
        rewritten = _rewrite_counter_conjunct(df, node, strict, label_columns)
        if rewritten is not None:
            return _select_labels(rewritten, directives)

    return apply_when_stateful(df, node, directives, strict)


def _predicate(df: DataFrame, node: Node, strict: bool, label_columns=None):
    computed = "computed_labels" if "computed_labels" in df.columns else None
    if not strict:
        # flat codegen-able compiler for the common shapes (~100x faster);
        # strict mode needs error messages -> struct compiler only
        try:
            comp = F.col(computed) if computed else None
            return FlatCompiler(F.col("ts"), F.col("labels"), comp,
                                label_columns=label_columns).predicate(node)
        except Unsupported:
            pass
    return compile_predicate(node, strict=strict, computed_col=computed)


def _select_labels(df: DataFrame, directives: Dict[str, List[Value]]) -> DataFrame:
    sel = directives.get("#select_labels")
    if sel is None:
        return df
    if not sel:
        raise CondError("#select_labels must contain at least one label")
    for s in sel:
        if s.kind != V.STRING:
            raise CondError("#select_labels must contain only string values")
    names = [s.val for s in sel]
    keep = F.array(*[F.lit(n) for n in names])
    return df.withColumn(
        "labels", F.map_filter("labels", lambda k, v: F.array_contains(keep, k))
    )


def _padding(directive: Optional[List[Value]], key: str) -> Tuple[bool, int]:
    """(is_duration, value); mirrors ctx_before.rs/ctx_after.rs validation."""
    if directive is None:
        return (False, 0)
    if len(directive) != 1:
        raise CondError(f"{key} must be a single value")
    v = directive[0]
    val = V.as_int(v)
    if val < 0:
        raise CondError(f"{key} must be non-negative")
    return (v.kind == V.DURATION, val)


def _window_ctx(df: DataFrame, node: Node, directives, strict: bool,
                label_columns=None) -> DataFrame:
    before_dur, before = _padding(directives.get("#ctx_before"), "#ctx_before")
    after_dur, after = _padding(directives.get("#ctx_after"), "#ctx_after")

    marked = df.withColumn(
        "__match", _predicate(df, node, strict, label_columns).cast("int"))
    base = Window.partitionBy(*_PARTITION_COLS).orderBy("ts")

    # emit r iff a match exists within `before` after it OR `after` before it
    if before_dur:
        w_b = base.rangeBetween(0, before)
    else:
        w_b = base.rowsBetween(0, before)
    if after_dur:
        w_a = base.rangeBetween(-after, 0)
    else:
        w_a = base.rowsBetween(-after, 0)

    keep = (F.max("__match").over(w_b) == 1) | (F.max("__match").over(w_a) == 1)
    return (
        marked.withColumn("__keep", keep)
        .where(F.col("__keep")).drop("__match", "__keep")
    )


def _rewrite_counter_conjunct(df: DataFrame, node: Node, strict: bool,
                              label_columns=None) -> Optional[DataFrame]:
    """Window rewrite for a single top-level $each_n/$limit conjunct."""
    if not (isinstance(node, Op) and node.name == "$and"):
        return None
    stateful_idx = [i for i, c in enumerate(node.operands) if is_stateful(c)]
    if len(stateful_idx) != 1:
        return None
    i = stateful_idx[0]
    sf = node.operands[i]
    if not (isinstance(sf, Op) and sf.name in ("$each_n", "$limit")
            and len(sf.operands) == 1 and isinstance(sf.operands[0], Const)):
        return None
    try:
        n = V.as_int(sf.operands[0].value)
    except CondError:
        return None
    if sf.name == "$each_n" and n == 0:
        raise CondError("Value '0' is not a valid operand for $each_n")

    prefix = node.operands[:i]
    rest = node.operands[i + 1:]

    pref_pred = (_predicate(df, Op("$and", list(prefix)), strict, label_columns)
                 if prefix else F.lit(True))
    rest_pred = (_predicate(df, Op("$and", list(rest)), strict, label_columns)
                 if rest else F.lit(True))

    w = (Window.partitionBy(*_PARTITION_COLS).orderBy("ts")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    marked = df.withColumn("__pref", pref_pred)
    cnt = F.sum(F.col("__pref").cast("long")).over(w)
    if sf.name == "$each_n":
        sf_pass = (cnt % F.lit(n)) == 0
    else:  # $limit: pass while counter <= n, Interrupt afterwards
        sf_pass = cnt <= F.lit(n)
    return (
        marked.withColumn("__sf", sf_pass)
        .where(F.col("__pref") & F.col("__sf") & rest_pred)
        .drop("__pref", "__sf")
    )
