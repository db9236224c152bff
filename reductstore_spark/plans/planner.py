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
4. **Vectorized time-stateful walk** — top-level $and with exactly one
   stateful conjunct that is $each_t(const) or $gate(const, stateless
   input) and no ctx padding: stateless parts compile to JVM Columns,
   the per-entry walk sees only (ts, pref[, inp, ierr]) primitives, and
   kept keys semi-join back on (bucket, entry, ts) — the record ID.
5. **Interpreter path** — anything else (stateful ops nested under
   non-conjunctive logic, non-const operands, ctx+stateful interplay):
   exact per-entry ordered replay via applyInPandas
   (operators/stateful.py).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..condition import values as V
from ..condition.ast import ComputedRef, Const, LabelRef, Node, Op, is_stateful
from ..condition.columns import ColumnCompiler, compile_predicate
from ..condition.fastcols import FlatCompiler, Unsupported, label_parts
from ..condition.parser import parse_when
from ..condition.values import CondError, Value
from ..operators.stateful import apply_when_stateful, apply_when_stateful_slim

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
    node = _flatten_and(node)
    ctx_before = directives.get("#ctx_before")
    ctx_after = directives.get("#ctx_after")
    has_ctx = ctx_before is not None or ctx_after is not None

    if not is_stateful(node):
        if not has_ctx:
            df2, pred, added = _bound_or_struct(df, node, strict, label_columns)
            out = df2.where(pred)
            if added:
                out = out.drop(*added)
        else:
            out = _window_ctx(df, node, directives, strict, label_columns)
        return _select_labels(out, directives)

    if not has_ctx:
        rewritten = _rewrite_counter_conjunct(df, node, strict, label_columns)
        if rewritten is not None:
            return _select_labels(rewritten, directives)
        rewritten = _rewrite_time_stateful(df, node, strict, label_columns)
        if rewritten is not None:
            return _select_labels(rewritten, directives)
    else:
        # ctx + $each_n: the counter is ctx-independent, so the match
        # flags come from the counter window and the paddings propagate
        # them — both stages stay JVM-side
        flagged = _rewrite_counter_conjunct(df, node, strict, label_columns,
                                            as_flags=True)
        if flagged is not None:
            marked, added = flagged
            return _select_labels(_propagate_ctx(marked, directives, added),
                                  directives)

    # slim interpreter: exact WhenFilter over precomputed (ts, p0..pk)
    # primitives — covers ctx+stateful interplay without shipping whole
    # records through Arrow
    slim = apply_when_stateful_slim(df, node, directives, strict,
                                    label_columns)
    if slim is not None:
        return _select_labels(slim, directives)

    return apply_when_stateful(df, node, directives, strict)


def _flatten_and(node: Node) -> Node:
    """Splice nested $and conjuncts: ``$and[$and[a,b],c] -> $and[a,b,c]``.

    Semantics-preserving — AllOf's left-to-right short-circuit/error fold
    is associative (a falsy/erroring operand stops evaluation at the same
    point either way), and the parser's implicit root AllOf wraps every
    user-written $and in exactly this shape (parser.rs:54-59), which
    otherwise hides the single-stateful-conjunct pattern from the window
    and walk rewrite tiers."""
    if not (isinstance(node, Op) and node.name == "$and"):
        return node
    ops: List[Node] = []
    for o in node.operands:
        o2 = _flatten_and(o)
        if isinstance(o2, Op) and o2.name == "$and":
            ops.extend(o2.operands)
        else:
            ops.append(o2)
    return Op("$and", ops)


def _predicate(df: DataFrame, node: Node, strict: bool, label_columns=None):
    computed = "computed_labels" if "computed_labels" in df.columns else None
    # expression-string tier first (r11), then the Column tiers
    if all(isinstance(v, str) for v in (label_columns or {}).values()):
        from ..condition.strtier import predicate_sql
        try:
            return F.expr(predicate_sql(node, computed, label_columns,
                                        strict))
        except Unsupported:
            pass
    # flat codegen-able compiler for the common shapes (~100x faster);
    # strict mode threads error messages through the flat tier (FV.emsg)
    # so it stays on this path too
    try:
        comp = F.col(computed) if computed else None
        return FlatCompiler(F.col("ts"), F.col("labels"), comp,
                            label_columns=label_columns,
                            strict=strict).predicate(node)
    except Unsupported:
        pass
    # struct tier unless its nested-lambda analysis would stall (deep
    # conditions past the flat compile-size budget land here) — then the
    # bounded per-row interpreter tier (reference parity: condition.rs
    # applies the AST per record)
    from ..condition.columns import STRUCT_LAMBDA_BUDGET, lambda_depth_estimate
    if lambda_depth_estimate(node) > STRUCT_LAMBDA_BUDGET:
        from ..condition.rowtier import interpreter_predicate
        return interpreter_predicate(node, strict, computed_col=computed)
    return compile_predicate(node, strict=strict, computed_col=computed)


def _collect_refs(node: Node, labels=None, computed=None):
    """Distinct &label / @computed names referenced by the AST."""
    if labels is None:
        labels, computed = set(), set()
    if isinstance(node, LabelRef):
        labels.add(node.name)
    elif isinstance(node, ComputedRef):
        computed.add(node.name)
    elif isinstance(node, Op):
        if (node.name == "$ref" and len(node.operands) == 1
                and isinstance(node.operands[0], Const)):
            # constant-name $ref binds like &name (fastcols $ref branch)
            labels.add(V.to_display(node.operands[0].value))
            return labels, computed
        for o in node.operands:
            _collect_refs(o, labels, computed)
    return labels, computed


def _lc_col(v):
    """label_columns values may be SQL text (r11) or Columns."""
    return F.expr(v) if isinstance(v, str) else v


def _flat_bound(df: DataFrame, nodes: List[Node], label_columns=None,
                strict: bool = False):
    """Compile ``nodes`` with the flat compiler over PRE-BOUND leaves.

    Every distinct referenced label gets its (raw, num, flt) derivation
    materialized once in a projection; predicates then reference those
    attributes, keeping generated methods small (a condition tree embeds
    each operand a constant number of times per level — with full leaf
    derivations inlined at every reference, whole-stage codegen blew past
    Janino's 64 KB method limit; see BENCH_r01 tail).

    The projection carries a non-deterministic dummy column as a
    predicate-pushdown barrier: PushPredicateThroughNonJoin would inline
    the aliases once per reference and re-explode the expression.  The
    time-range / state / entry filters are applied BELOW this projection
    (query.py _scan), so Parquet pushdown and partition pruning are
    unaffected; `when` label predicates never reach the scan anyway
    (map lookups / JSON extraction aren't pushable).

    Returns (bound_df, [predicate Column per node], added_col_names);
    raises Unsupported if any node is outside the flat subset.
    """
    # expression-string tier first (r11): the same compiler logic over a
    # SQL-text substrate — ~2 py4j calls per query instead of ~10^3 of
    # Column construction (guide §1.2, the measured ~0.5 s/query driver
    # floor).  Falls back here on any Unsupported (incl. the compile-
    # size screen, whose exact layer-3 measurement needs Columns).
    if all(isinstance(v, str) for v in (label_columns or {}).values()):
        from ..condition.strtier import flat_bound_sql
        try:
            return flat_bound_sql(df, nodes, label_columns, strict)
        except Unsupported:
            pass

    computed_col = "computed_labels" if "computed_labels" in df.columns else None
    label_columns = label_columns or {}
    lnames, cnames = set(), set()
    for n in nodes:
        _collect_refs(n, lnames, cnames)

    adds = []          # (alias, Column)
    label_fvs = {}
    computed_fvs = {}

    def bind(name, raw, prefix, i):
        ra, nu, fl, lg = (f"__{prefix}r{i}", f"__{prefix}n{i}",
                          f"__{prefix}f{i}", f"__{prefix}l{i}")
        num, flt, lng = label_parts(raw)
        adds.extend([(ra, raw), (nu, num), (fl, flt), (lg, lng)])
        return (F.col(ra), F.col(nu), F.col(fl), F.col(lg))

    for i, name in enumerate(sorted(lnames)):
        raw = (_lc_col(label_columns[name]) if name in label_columns
               else F.element_at(F.col("labels"), F.lit(name)))
        label_fvs[name] = bind(name, raw, "lb", i)
    if computed_col:
        for i, name in enumerate(sorted(cnames)):
            raw = F.element_at(F.col(computed_col), F.lit(name))
            computed_fvs[name] = bind(name, raw, "cb", i)

    comp = F.col(computed_col) if computed_col else None
    compiler = FlatCompiler(F.col("ts"), F.col("labels"), comp,
                            label_columns=label_columns,
                            label_fvs=label_fvs, computed_fvs=computed_fvs,
                            strict=strict)

    def compile_pred(n):
        # Wide top-level conjunctions additionally bind each operand's
        # (truthy, err[, emsg]) as attributes: _logical's flat fold
        # references every operand O(n) times, and with heavy operand
        # trees (five date extractions in when_date2) the inlined
        # expression blew past Janino's 64 KB method limit even with
        # leaves bound — the count-aggregate stage then ran interpreted.
        # Bound conjuncts make the fold a combination of attribute reads.
        from ..condition.ast import Op as _Op
        from ..condition.fastcols import FV as _FV
        from ..condition.fastcols import _emsg, _err, _truthy
        inner = n
        # parse_when wraps everything in a root $and; descend single-
        # child $and chains (identical truthy/error semantics)
        while (isinstance(inner, _Op) and inner.name == "$and"
               and len(inner.operands) == 1):
            inner = inner.operands[0]
        if not (isinstance(inner, _Op) and inner.name in ("$and", "$or")
                and len(inner.operands) >= 3):
            return compiler.predicate(n)
        ops = []
        for j, o in enumerate(inner.operands):
            fv = compiler.compile(o)  # may raise Unsupported
            t, e = f"__cj{j}t{len(adds)}", f"__cj{j}e{len(adds)}"
            adds.append((t, F.coalesce(_truthy(fv), F.lit(False))))
            adds.append((e, F.coalesce(_err(fv), F.lit(False))))
            nfv = _FV(num=F.col(t).cast("double"), err=F.col(e),
                      numeric_only=True, bound=1, skind="boolean")
            if strict:
                m = f"__cj{j}m{len(adds)}"
                adds.append((m, _emsg(fv)))
                nfv.emsg = F.col(m)
            ops.append(nfv)
        combined = compiler._logical(inner.name, ops)
        if strict:
            em = _emsg(combined)
            return F.when(em.isNotNull(), F.raise_error(em)).otherwise(
                F.coalesce(_truthy(combined), F.lit(False)))
        return F.coalesce(_truthy(combined) & ~_err(combined), F.lit(False))

    preds = [compile_pred(n) for n in nodes]  # may raise Unsupported

    if not adds:
        return df, preds, []
    bound = df.select(
        "*", *[c.alias(a) for a, c in adds],
        F.monotonically_increasing_id().alias("__lb_barrier"))
    # the barrier only works if (a) a project field is nondeterministic —
    # PushPredicateThroughNonJoin skips such projects entirely — and (b)
    # the predicate references it, or ColumnPruning strips the field and
    # re-enables the push.  OR-ing an always-false comparison on the
    # nondeterministic id satisfies (b) without changing any result.
    never = F.col("__lb_barrier") < F.lit(-1)
    preds = [p | never for p in preds]
    return bound, preds, [a for a, _ in adds] + ["__lb_barrier"]


def _bound_or_struct(df: DataFrame, node: Node, strict: bool,
                     label_columns=None):
    """(df2, predicate, added_cols): flat compiler over bound leaves when
    possible (strict included — it threads error messages), struct
    compiler otherwise (unsupported shapes)."""
    try:
        bound, preds, added = _flat_bound(df, [node], label_columns,
                                          strict=strict)
        return bound, preds[0], added
    except Unsupported:
        pass
    computed = "computed_labels" if "computed_labels" in df.columns else None
    from ..condition.columns import STRUCT_LAMBDA_BUDGET, lambda_depth_estimate
    if lambda_depth_estimate(node) > STRUCT_LAMBDA_BUDGET:
        from ..condition.rowtier import interpreter_predicate
        return df, interpreter_predicate(node, strict,
                                         computed_col=computed), []
    return df, compile_predicate(node, strict=strict, computed_col=computed), []


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
    df2, pred, added = _bound_or_struct(df, node, strict, label_columns)
    marked = df2.withColumn("__match", pred.cast("int"))
    return _propagate_ctx(marked, directives, added)


def _propagate_ctx(marked: DataFrame, directives, added) -> DataFrame:
    """Emit r iff a match (``__match`` = 1) exists within `before`
    records/µs after it OR `after` records/µs before it — the union-of-
    intervals equivalent of the reference's ctx buffer/latch drain."""
    before_dur, before = _padding(directives.get("#ctx_before"), "#ctx_before")
    after_dur, after = _padding(directives.get("#ctx_after"), "#ctx_after")
    base = Window.partitionBy(*_PARTITION_COLS).orderBy("ts")

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
        .where(F.col("__keep")).drop("__match", "__keep", *added)
    )


def _rewrite_counter_conjunct(df: DataFrame, node: Node, strict: bool,
                              label_columns=None,
                              as_flags: bool = False):
    """Window rewrite for a single top-level $each_n/$limit conjunct.

    ``as_flags=True`` returns ``(marked_df, added_cols)`` with an
    ``__match`` int column instead of filtering — the ctx-padding
    composition path (the counter is ctx-independent: it increments on
    prefix-truthy records whether or not ctx later emits them)."""
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
    if as_flags and sf.name != "$each_n":
        # ctx + $limit has buffer-flush interplay (when.rs:62-106) that
        # the union-of-intervals form does not model — interpreter only
        return None
    try:
        n = V.as_int(sf.operands[0].value)
    except CondError:
        return None
    if sf.name == "$each_n" and n == 0:
        raise CondError("Value '0' is not a valid operand for $each_n")

    prefix = node.operands[:i]
    rest = node.operands[i + 1:]

    pref_node = Op("$and", list(prefix))
    rest_node = Op("$and", list(rest))
    added = []
    try:
        df, (pref_pred, rest_pred), added = _flat_bound(
            df, [pref_node, rest_node], label_columns, strict=strict)
    except Unsupported:
        pref_pred = rest_pred = None
    if pref_pred is None:
        # struct-tier lambda-analysis budget (condition/columns.py): a
        # too-deep prefix/rest falls back to the interpreter stateful
        # pipeline (return None) rather than stalling the analyzer here
        from ..condition.columns import (
            STRUCT_LAMBDA_BUDGET,
            lambda_depth_estimate,
        )
        if max(lambda_depth_estimate(pref_node),
               lambda_depth_estimate(rest_node)) > STRUCT_LAMBDA_BUDGET:
            return None
        computed = "computed_labels" if "computed_labels" in df.columns else None
        pref_pred = compile_predicate(pref_node, strict=strict, computed_col=computed)
        rest_pred = compile_predicate(rest_node, strict=strict, computed_col=computed)

    w = (Window.partitionBy(*_PARTITION_COLS).orderBy("ts")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    marked = df.withColumn("__pref", pref_pred)
    cnt = F.sum(F.col("__pref").cast("long")).over(w)
    if sf.name == "$each_n":
        sf_pass = (cnt % F.lit(n)) == 0
    else:  # $limit: pass while counter <= n, Interrupt afterwards
        sf_pass = cnt <= F.lit(n)
    marked = marked.withColumn("__sf", sf_pass)
    if as_flags:
        match = (F.col("__pref") & F.col("__sf") & rest_pred).cast("int")
        return (marked.withColumn("__match", match),
                ["__pref", "__sf", *added])
    return (
        marked.where(F.col("__pref") & F.col("__sf") & rest_pred)
        .drop("__pref", "__sf", *added)
    )


def _rewrite_time_stateful(df: DataFrame, node: Node, strict: bool,
                           label_columns=None) -> Optional[DataFrame]:
    """Vectorized tier for a single top-level $each_t/$gate conjunct.

    The interpreter tier ships whole records through Arrow and JSON-parses
    labels per row; for the dominant shape — ``$and`` whose only stateful
    member is ``$each_t(const)`` or ``$gate(const, stateless-input)`` —
    the stateless parts compile to JVM Columns and the per-entry walk
    (operators/stateful.py each_t_keys/gate_keys) only sees
    (ts, pref[, inp, ierr]) primitives; the kept keys then semi-join
    back against the full rows on (bucket, entry, ts) — exact because
    the timestamp IS the record ID within an entry (storage.proto:38).

    Evaluation-order parity with the reference's AllOf short-circuit:

    * ``__pref`` (all earlier conjuncts truthy and error-free) gates the
      state machine — the stateful node's state mutates only when
      evaluation reaches it;
    * the trailing conjuncts apply as a filter AFTER the semi-join, so
      they are (strictly or not) evaluated only for records where the
      stateful op passed — exactly when the reference evaluates them.
    """
    if not (isinstance(node, Op) and node.name == "$and"):
        return None
    stateful_idx = [i for i, c in enumerate(node.operands) if is_stateful(c)]
    if len(stateful_idx) != 1:
        return None
    i = stateful_idx[0]
    sf = node.operands[i]
    if not (isinstance(sf, Op) and sf.name in ("$each_t", "$gate")):
        return None
    if not (sf.operands and isinstance(sf.operands[0], Const)):
        return None
    inp_node = None
    if sf.name == "$gate":
        if len(sf.operands) != 2:
            return None
        inp_node = sf.operands[1]
        if is_stateful(inp_node):
            return None

    # plan-time period derivation, mirroring interpreter._apply_each_t /
    # _apply_gate exactly (Rust `as u64` saturation for each_t)
    v = sf.operands[0].value
    try:
        if sf.name == "$each_t":
            s = V.as_float(v) / 1e6 if v.kind == V.DURATION else V.as_float(v)
            # Rust `as u64`: NaN/negative -> 0, inf -> u64::MAX
            period_us = V._f64_as_u64(s * 1e6)
        else:
            # gate.rs:50 `as i64` saturating cast, then the 0 clamp
            dur = V.as_int(v) if v.kind == V.DURATION \
                else V._f64_as_i64(V.as_float(v) * 1e6)
            period_us = max(0, dur)
    except CondError:
        return None  # operand errors per-record -> interpreter replays it

    computed = "computed_labels" if "computed_labels" in df.columns else None
    comp = F.col(computed) if computed else None
    pref_node = Op("$and", list(node.operands[:i]))
    rest_node = Op("$and", list(node.operands[i + 1:]))
    cols = None
    if all(isinstance(v, str) for v in (label_columns or {}).values()):
        # expression-string fast path (r11) — same fallback ladder
        from ..condition.strtier import predicate_sql, truthy_err_sql
        try:
            pref_text = predicate_sql(pref_node, computed, label_columns,
                                      strict)
            cols = [F.col("bucket"), F.col("entry"), F.col("ts"),
                    F.expr(pref_text).alias("__pref")]
            if inp_node is not None:
                if strict:
                    # input errors raise — but only for records the gate
                    # actually evaluates (When short-circuits per row)
                    inp_text = predicate_sql(inp_node, computed,
                                             label_columns, True)
                    inp_col = F.expr(f"CASE WHEN ({pref_text}) THEN "
                                     f"({inp_text}) ELSE FALSE END")
                    ierr_col = F.lit(False)
                else:
                    t, e = truthy_err_sql(inp_node, computed, label_columns)
                    inp_col, ierr_col = F.expr(t), F.expr(e)
                cols += [inp_col.alias("__inp"), ierr_col.alias("__ierr")]
        except Unsupported:
            cols = None
    if cols is None:
        try:
            fc = FlatCompiler(F.col("ts"), F.col("labels"), comp,
                              label_columns=label_columns, strict=strict)
            pref_pred = fc.predicate(pref_node)
            cols = [F.col("bucket"), F.col("entry"), F.col("ts"),
                    pref_pred.alias("__pref")]
            if inp_node is not None:
                if strict:
                    # input errors raise — but only for records the gate
                    # actually evaluates (When short-circuits per row)
                    inp_col = F.when(pref_pred, fc.predicate(inp_node)) \
                        .otherwise(F.lit(False))
                    ierr_col = F.lit(False)
                else:
                    nfc = FlatCompiler(F.col("ts"), F.col("labels"), comp,
                                       label_columns=label_columns)
                    fv = nfc.compile(inp_node)
                    from ..condition.fastcols import _err, _truthy
                    inp_col = F.coalesce(_truthy(fv), F.lit(False))
                    ierr_col = F.coalesce(_err(fv), F.lit(False))
                cols += [inp_col.alias("__inp"), ierr_col.alias("__ierr")]
        except Unsupported:
            return None

    from ..operators.stateful import each_t_keys, gate_keys
    keys = df.select(*cols)
    kept = (each_t_keys(keys, period_us) if sf.name == "$each_t"
            else gate_keys(keys, period_us))
    joined = df.join(kept, ["bucket", "entry", "ts"], "left_semi")
    df2, rest_pred, added = _bound_or_struct(joined, rest_node, strict,
                                             label_columns)
    out = df2.where(rest_pred)
    return out.drop(*added) if added else out
