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
from reductstore_spark.condition.columns import ColumnCompiler
from reductstore_spark.condition.fastcols import FlatCompiler, Unsupported
from reductstore_spark.condition.interpreter import Context, Evaluator
from reductstore_spark.condition.parser import parse_when

LABELS = ["a", "b", "c", "sparse"]
VALUES = ["1", "-7", "3.5", "0", "true", "false", "abc", "", "1e2",
          "0.0", "-0.5", "99", "xyz", " 5"]


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
            return rng.choice([1, -3, 0, 2.5, 0.0, 10])
        if kind < 0.7:
            return rng.choice([True, False])
        return rng.choice(["abc", "1", "true", "", "xyz"])
    return gen_cond(rng, depth - 1)


def gen_cond(rng, depth):
    op = rng.choice([
        "$eq", "$ne", "$gt", "$gte", "$lt", "$lte",
        "$and", "$or", "$not", "$xor", "$in", "$nin",
        "$add", "$sub", "$mult", "$div", "$div_num", "$rem", "$abs",
        "$contains", "$starts_with", "$ends_with",
        "$exists", "$cast", "$timestamp",
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
        return {"$eq": [{"$cast": [gen_operand(rng, depth - 1),
                                   rng.choice(["bool", "int", "float"])]},
                        rng.choice([0, 1, 2.5])]}
    if op == "$timestamp":
        return {"$gt": ["$timestamp", rng.randrange(20000)]}
    return {op: [gen_operand(rng, depth - 1), gen_operand(rng, depth - 1)]}


def interp_row(node, ts, labels):
    try:
        return V.as_bool(Evaluator(node).apply(Context(ts, labels)))
    except V.CondError:
        return False


@pytest.mark.parametrize("seed", [11, 23, 37])
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
    meta = []  # (cond, node, flat_supported)
    for i, (c, node) in enumerate(conds):
        struct_pred = ColumnCompiler(F.col("ts"), F.col("labels")).predicate(node)
        cols.append(struct_pred.alias(f"s{i}"))
        try:
            flat_pred = FlatCompiler(F.col("ts"), F.col("labels")).predicate(node)
            cols.append(flat_pred.alias(f"f{i}"))
            meta.append((c, node, True))
        except Unsupported:
            meta.append((c, node, False))
    res = df.select(*cols).collect()

    n_flat = sum(1 for _, _, ok in meta if ok)
    assert n_flat >= len(conds) * 0.6, f"flat path covers only {n_flat}/{len(conds)}"

    failures = []
    for i, (c, node, flat_ok) in enumerate(meta):
        want = [interp_row(node, ts, labels) for ts, labels in rows]
        got_struct = [r[f"s{i}"] for r in res]
        if got_struct != want:
            failures.append(("struct", c, got_struct, want))
        if flat_ok:
            got_flat = [r[f"f{i}"] for r in res]
            if got_flat != want:
                failures.append(("flat", c, got_flat, want))
    assert not failures, failures[:3]
