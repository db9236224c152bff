"""Randomized equivalence: flat compiler vs struct compiler vs interpreter.

Generates random condition ASTs and random label rows (seeded,
deterministic), evaluates all three backends, and requires identical
keep/drop decisions per row (non-strict semantics: errors -> excluded).
One Spark job evaluates the whole matrix.
"""

import json
import random

import pytest
from pyspark.sql import functions as F

from reductstore_spark.condition import values as V
from reductstore_spark.condition.columns import (
    STRUCT_LAMBDA_BUDGET,
    ColumnCompiler,
    lambda_depth_estimate,
)
from reductstore_spark.condition.fastcols import FlatCompiler, Unsupported
from reductstore_spark.condition.interpreter import Context, Evaluator
from reductstore_spark.condition.strtier import predicate_sql, truthy_err_sql
from reductstore_spark.condition.parser import parse_when

LABELS = ["a", "b", "c", "sparse"]
VALUES = ["1", "-7", "3.5", "0", "true", "false", "abc", "", "1e2",
          "0.0", "-0.5", "99", "xyz", " 5", "1704067200123456", "+42",
          # Rust-parse edge spellings: whitespace (stays String), signed
          # NaN/inf specials (parse Float; NaN equals nothing)
          "nan", "+nan", "-nan", "inf", "-infinity", " inf",
          # chrono from_timestamp_micros MIN/MAX boundary +/-1: the exact
          # bounds yield date fields, one past raises (date.rs:40-46)
          str(V.TS_US_MIN), str(V.TS_US_MIN - 1),
          str(V.TS_US_MAX), str(V.TS_US_MAX + 1),
          # i64 limits and one-past (one-past fails i64 parse, falls to f64)
          "9223372036854775807", "-9223372036854775808",
          "9223372036854775808", "-9223372036854775809",
          # r4 hostile pool: Rust float-parse edge spellings ('5.'/'.5'
          # parse, '1_000'/'0x10' stay String), overflow-to-inf, the
          # f64 extremes, leading zeros, and -1 (the $div/$rem i64::MIN
          # partner)
          "5.", ".5", "+.5", "-.5", "1e309", "-1e309", "5e-324",
          "1.7976931348623157e308", "2.2250738585072014e-308",
          "00042", "007.5", "0x10", "1_000", "-1",
          # duration spellings at the u64-µs edge (core/duration.rs)
          "1h30m", "0s", "106751991166d", "106751991167d"]


def gen_rows(rng, n):
    rows = []
    for i in range(n):
        labels = {}
        for name in LABELS:
            if name == "sparse" and rng.random() < 0.6:
                continue
            labels[name] = rng.choice(VALUES)
        rows.append((i * 1000 + rng.randrange(1000), labels))
    return rows


def gen_operand(rng, depth):
    r = rng.random()
    if depth <= 0 or r < 0.35:
        kind = rng.random()
        if kind < 0.45:
            return "&" + rng.choice(LABELS)
        if kind < 0.6:
            return rng.choice([1, -3, 0, 2.5, 0.0, 10, -1,
                               -9223372036854775808, 9223372036854775807])
        if kind < 0.7:
            return rng.choice([True, False])
        # incl. duration literals (parse to Duration constants) and the
        # "$$" escape for a literal $-string; r4 adds compound and
        # u64-µs-edge duration spellings plus Rust float-parse edges
        return rng.choice(["abc", "1", "true", "", "xyz", "1h", "300ms",
                           "$$esc", "1h30m", "0s", "106751991166d",
                           "5.", ".5", "1e309"])
    return gen_cond(rng, depth - 1)


def gen_cond(rng, depth):
    op = rng.choice([
        "$eq", "$ne", "$gt", "$gte", "$lt", "$lte",
        "$and", "$or", "$not", "$xor", "$in", "$nin",
        "$add", "$sub", "$mult", "$div", "$div_num", "$rem", "$abs",
        "$contains", "$starts_with", "$ends_with",
        "$exists", "$cast", "$timestamp", "$ref", "$date",
    ])
    if op in ("$and", "$or", "$not", "$xor"):
        n = rng.randint(1, 3)
        return {op: [gen_operand(rng, depth - 1) for _ in range(n)]}
    if op in ("$in", "$nin"):
        n = rng.randint(2, 4)
        return {op: [gen_operand(rng, depth - 1) for _ in range(n)]}
    if op == "$abs":
        return {op: [gen_operand(rng, depth - 1)]}
    if op == "$exists":
        return {op: [rng.choice(LABELS)]}
    if op == "$cast":
        target = rng.choice(["bool", "int", "float", "string", "duration"])
        cmp_to = ("1" if target == "string"
                  else rng.choice([0, 1, 2.5, 1_000_000]))
        return {"$eq": [{"$cast": [gen_operand(rng, depth - 1), target]},
                        cmp_to]}
    if op == "$ref":
        return {"$eq": [{"$ref": [rng.choice(LABELS)]},
                        gen_operand(rng, depth - 1)]}
    if op == "$date":
        fld = rng.choice(["$second", "$minute", "$hour", "$day", "$month",
                          "$year", "$weekday"])
        src = rng.choice(["$timestamp", "&" + rng.choice(LABELS),
                          1704067200123456])
        args = [src]
        if rng.random() < 0.3:
            args.append("Europe/Berlin")
        return {"$gte": [{fld: args}, rng.randrange(0, 30)]}
    if op == "$timestamp":
        return {"$gt": ["$timestamp", rng.randrange(20000)]}
    return {op: [gen_operand(rng, depth - 1), gen_operand(rng, depth - 1)]}


def interp_row(node, ts, labels):
    try:
        return V.as_bool(Evaluator(node).apply(Context(ts, labels)))
    except V.CondError:
        return False


@pytest.mark.parametrize("seed", [211, 223, 227])  # rotated per round (r11)
def test_fuzz_three_backends_agree(spark, seed):
    rng = random.Random(seed)
    rows = gen_rows(rng, 25)
    conds = []
    while len(conds) < 40:
        c = gen_cond(rng, 3)
        try:
            node, _ = parse_when(json.loads(json.dumps(c)))
        except V.CondError:
            continue
        conds.append((c, node))

    df = spark.createDataFrame(rows, "ts long, labels map<string,string>").coalesce(1)
    cols = []
    meta = []  # (cond, node, struct_supported, flat_supported)
    for i, (c, node) in enumerate(conds):
        # struct-tier lambda-analysis gate (r10): same routing the
        # planner applies — deep let-chains stall the analyzer, so past
        # the budget only the flat tier (its own budget inside) runs
        struct_ok = lambda_depth_estimate(node) <= STRUCT_LAMBDA_BUDGET
        if struct_ok:
            struct_pred = ColumnCompiler(
                F.col("ts"), F.col("labels")).predicate(node)
            cols.append(struct_pred.alias(f"s{i}"))
        try:
            flat_pred = FlatCompiler(F.col("ts"), F.col("labels")).predicate(node)
            cols.append(flat_pred.alias(f"f{i}"))
            flat_ok = True
        except Unsupported:
            flat_ok = False
        # fourth backend (r11): the expression-string tier — the same
        # compiler logic over SQL text; must agree wherever it compiles
        try:
            cols.append(F.expr(predicate_sql(node)).alias(f"x{i}"))
            str_ok = True
        except Unsupported:
            str_ok = False
        meta.append((c, node, struct_ok, flat_ok, str_ok))
    res = df.select(*cols).collect()

    n_flat = sum(1 for _, _, _, ok, _ in meta if ok)
    assert n_flat >= len(conds) * 0.6, f"flat path covers only {n_flat}/{len(conds)}"
    n_str = sum(1 for _, _, _, _, ok in meta if ok)
    assert n_str >= len(conds) * 0.5, f"string path covers only {n_str}/{len(conds)}"

    failures = []
    for i, (c, node, struct_ok, flat_ok, str_ok) in enumerate(meta):
        want = [interp_row(node, ts, labels) for ts, labels in rows]
        if struct_ok:
            got_struct = [r[f"s{i}"] for r in res]
            if got_struct != want:
                failures.append(("struct", c, got_struct, want))
        if flat_ok:
            got_flat = [r[f"f{i}"] for r in res]
            if got_flat != want:
                failures.append(("flat", c, got_flat, want))
        if str_ok:
            got_str = [r[f"x{i}"] for r in res]
            if got_str != want:
                failures.append(("string", c, got_str, want))
    assert not failures, failures[:3]


def gen_adversarial_cond(rng, depth):
    """Generator biased to the WORST compile-expansion shapes: nested
    $in/$nin (the head FV re-embeds once per item), $contains over
    derived operands, and $cast chains.  The uniform gen_cond rarely
    nests $in inside $in, which is exactly the family that expands to
    multi-million-node trees and motivated the fastcols compile-size
    budget — this generator exercises that seam on purpose."""
    if depth <= 0:
        return gen_operand(rng, 0)
    op = rng.choice(["$in", "$in", "$nin", "$contains", "$cast", "$add"])
    if op in ("$in", "$nin"):
        n = rng.randint(2, 3)
        return {op: [gen_adversarial_cond(rng, depth - 1),
                     *[gen_adversarial_cond(rng, depth - 2)
                       for _ in range(n)]]}
    if op == "$contains":
        return {op: [gen_adversarial_cond(rng, depth - 1),
                     gen_operand(rng, 0)]}
    if op == "$cast":
        return {"$eq": [{"$cast": [gen_adversarial_cond(rng, depth - 1),
                                   rng.choice(["string", "float", "int"])]},
                        rng.choice(["1", 0, 2.5])]}
    return {op: [gen_adversarial_cond(rng, depth - 1), gen_operand(rng, 0)]}


@pytest.mark.parametrize("seed", [7010])
def test_fuzz_adversarial_expansion_shapes(spark, seed):
    """The budget seam end-to-end: deliberately expansion-hostile
    conditions (nested $in chains at depth 4) must either compile on
    the flat tier within the budget or fall back through the planner to
    the struct tier — and in BOTH cases match the interpreter row for
    row, with the whole batch completing in bounded time (pre-budget,
    one such condition could pin the driver for an hour)."""
    import time

    from reductstore_spark.plans.planner import _predicate

    rng = random.Random(seed)
    rows = gen_rows(rng, 20)
    conds = []
    while len(conds) < 6:
        c = gen_adversarial_cond(rng, 4)
        if not isinstance(c, dict):
            continue
        try:
            node, _ = parse_when(json.loads(json.dumps(c)))
        except V.CondError:
            continue
        conds.append((c, node))
    df = spark.createDataFrame(
        rows, "ts long, labels map<string,string>").coalesce(1)
    t0 = time.time()
    failures = []
    for c, node in conds:
        pred = _predicate(df, node, strict=False)
        got = sorted(r["ts"] for r in df.filter(pred).collect())
        want = sorted(ts for ts, lb in rows if interp_row(node, ts, lb))
        if got != want:
            failures.append((c, got, want))
    elapsed = time.time() - t0
    assert not failures, failures[:2]
    # bounded: 6 hostile conditions end-to-end.  Generous for slow CI
    # hosts, but far below the single-condition stall this guards.
    assert elapsed < 600, f"adversarial batch took {elapsed:.0f}s"


@pytest.mark.parametrize("seed", [197, 199])  # rotated per round (r11)
def test_fuzz_strict_flat_vs_struct(spark, seed):
    """Strict mode: the flat (codegen) tier and the struct tier must
    raise for exactly the same (condition, row) pairs with the same
    message, and must raise exactly when the interpreter errors."""
    rng = random.Random(seed)
    rows = gen_rows(rng, 30)
    cases = []  # (cond, node, row)
    while len(cases) < 16:
        c = gen_cond(rng, 2)
        try:
            node, _ = parse_when(json.loads(json.dumps(c)))
        except V.CondError:
            continue
        try:
            FlatCompiler(F.col("ts"), F.col("labels"),
                         strict=True).predicate(node)
        except Unsupported:
            continue
        cases.append((c, node, rows[rng.randrange(len(rows))]))

    def norm(msg: str) -> str:
        # strip engine wrapping down to the raised text
        m = msg.split("[USER_RAISED_EXCEPTION]", 1)[-1]
        return m.split("SQLSTATE", 1)[0].strip()

    failures = []
    for c, node, (ts, labels) in cases:
        df = spark.createDataFrame([(ts, labels)],
                                   "ts long, labels map<string,string>")

        def outcome(pred):
            try:
                return ("ok", df.select(pred.alias("p")).collect()[0]["p"])
            except Exception as e:  # noqa: BLE001
                return ("raise", norm(str(e)))

        flat = outcome(FlatCompiler(F.col("ts"), F.col("labels"),
                                    strict=True).predicate(node))
        struct = outcome(ColumnCompiler(F.col("ts"), F.col("labels"))
                         .predicate(node, strict=True))
        try:
            stext = predicate_sql(node, strict=True)
        except Unsupported:
            stext = None
        if stext is not None:
            sres = outcome(F.expr(stext))
            if sres != flat:
                failures.append(("string-vs-flat", c, labels, sres, flat))
        try:
            iv = ("ok", V.as_bool(Evaluator(node).apply(Context(ts, labels))))
        except V.CondError:
            iv = ("raise", None)
        if flat[0] != iv[0] or struct[0] != iv[0]:
            failures.append(("raise-mismatch", c, labels, flat, struct, iv))
        elif flat != struct and flat[0] == "ok":
            failures.append(("value-mismatch", c, labels, flat, struct))
        elif flat[0] == "raise" and flat[1] != struct[1]:
            failures.append(("message-mismatch", c, labels, flat, struct))
    assert not failures, failures[:3]


# one seed per round that FOUND a real divergence (5000: r5 date-prefix
# drop; 6000: r6 const-fold kind loss) — each runs the full three-tier
# (value, emsg) comparison, ~2.5 min apiece, so the list stays short;
# breadth hunting lives in tools/fuzz_hunt_strict.py out-of-band
@pytest.mark.parametrize("seed", [5000, 6000])
def test_strict_fuzz_three_tiers_message_parity(spark, seed):
    """CI form of tools/fuzz_hunt_strict.py (round 5): both column tiers
    compiled in message-threading form, the per-row (value, emsg) pair
    SELECTED (not raised) and compared against the interpreter's
    try/except outcome — (errored?, exact message, value) must agree on
    every row.  Seed 5000 found the date-operator Value-prefix drop."""
    from reductstore_spark.condition.columns import _as_bool
    from reductstore_spark.condition.fastcols import _emsg, _truthy

    rng = random.Random(seed)
    rows = gen_rows(rng, 25)
    conds = []
    while len(conds) < 20:
        c = gen_cond(rng, 3)
        try:
            node, _ = parse_when(json.loads(json.dumps(c)))
        except V.CondError:
            continue
        conds.append((c, node))
    df = spark.createDataFrame(
        rows, "ts long, labels map<string,string>").coalesce(1)
    cols, meta = [], []
    for i, (c, node) in enumerate(conds):
        struct_ok = lambda_depth_estimate(node) <= STRUCT_LAMBDA_BUDGET
        if struct_ok:
            sv = ColumnCompiler(F.col("ts"), F.col("labels")).value(node)
            cols.append(_as_bool(sv).alias(f"s{i}v"))
            cols.append(sv["e"].alias(f"s{i}e"))
        try:
            fv = FlatCompiler(F.col("ts"), F.col("labels"),
                              strict=True).compile(node)
            cols.append(F.coalesce(_truthy(fv), F.lit(False)).alias(f"f{i}v"))
            cols.append(_emsg(fv).alias(f"f{i}e"))
            flat_ok = True
        except Unsupported:
            flat_ok = False
        # string tier (r11): same strict (value, emsg) lanes from text
        try:
            from reductstore_spark.condition.strtier import truthy_emsg_sql
            t, e = truthy_emsg_sql(node)
            cols.append(F.expr(t).alias(f"x{i}v"))
            cols.append(F.expr(e).alias(f"x{i}e"))
            str_ok = True
        except Unsupported:
            str_ok = False
        meta.append((c, node, struct_ok, flat_ok, str_ok))
    res = df.select(*cols).collect()

    def interp(node, ts, labels):
        try:
            return V.as_bool(Evaluator(node).apply(Context(ts, labels))), None
        except V.CondError as e:
            return None, str(e)

    failures = []
    for i, (c, node, struct_ok, flat_ok, str_ok) in enumerate(meta):
        want = [interp(node, ts, lb) for ts, lb in rows]
        for tier, vcol, ecol, on in (("struct", f"s{i}v", f"s{i}e", struct_ok),
                                     ("flat", f"f{i}v", f"f{i}e", flat_ok),
                                     ("string", f"x{i}v", f"x{i}e", str_ok)):
            if not on:
                continue
            for r, (wv, we), (ts, lb) in zip(res, want, rows):
                gv, ge = r[vcol], r[ecol]
                if we is not None:
                    if ge != we:
                        failures.append((tier, c, lb, "msg", ge, we))
                        break
                elif ge is not None or bool(gv) != bool(wv):
                    failures.append((tier, c, lb, "val", (gv, ge), wv))
                    break
    assert not failures, failures[:3]
