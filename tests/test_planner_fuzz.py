"""Randomized planner-tier equivalence: QueryEngine (window rewrites,
ctx windows, interpreter fallback) vs a pure-Python WhenFilter replay.

Exercises random combinations of stateful operators, context padding and
stateless predicates — the planner must route each to SOME correct tier.
"""

import json
import random

import pytest

from reductstore_spark.condition.interpreter import FilterRecord, WhenFilter
from reductstore_spark.condition.parser import parse_when
from reductstore_spark.query import QueryEngine

SCHEMA = ("bucket string, entry string, ts long, payload binary, "
          "content_type string, state int, labels map<string,string>, "
          "computed_labels map<string,string>")


def build_rows(rng):
    rows = []
    for e in ("e1", "e2"):
        ts = 0
        for _ in range(30):
            ts += rng.randrange(50_000, 400_000)
            rows.append(("b", e, ts, None, "", 1,
                         {"f": rng.choice(["true", "false"]),
                          "v": str(rng.randrange(0, 100))}, None))
    return rows


def gen_when(rng):
    preds = [
        {"&f": {"$eq": True}},
        {"&v": {"$gt": rng.randrange(10, 90)}},
        {"&v": {"$lte": rng.randrange(10, 90)}},
    ]
    stateful = [
        {"$each_n": rng.randrange(2, 5)},
        {"$each_t": round(rng.uniform(0.1, 1.0), 2)},
        {"$each_t": f"{rng.randrange(100, 800)}ms"},
        {"$limit": rng.randrange(3, 12)},
        {"$gate": [f"{rng.randrange(200, 900)}ms", rng.choice(preds)]},
        # erroring input: &nolbl is missing on every record, so the gate's
        # input evaluation fails per record (record excluded, partial
        # state update) — exercises the __ierr path of the walk tier
        {"$gate": [f"{rng.randrange(200, 900)}ms",
                   {"$or": [{"&v": {"$gt": 50}}, {"&nolbl": {"$gt": 1}}]}]},
    ]
    shape = rng.random()
    when = {}
    if shape < 0.3:  # stateless + ctx
        when = dict(rng.choice(preds))
        if rng.random() < 0.8:
            when["#ctx_before"] = rng.choice([1, 2, "300ms"])
        if rng.random() < 0.8:
            when["#ctx_after"] = rng.choice([1, 2, "250ms"])
    elif shape < 0.65:  # conjunct with one stateful op (rewrite tier)
        when = {"$and": [rng.choice(preds), rng.choice(stateful)]}
    else:  # general stateful (interpreter tier), maybe with ctx
        when = {"$and": [rng.choice(stateful), rng.choice(preds)]}
        if rng.random() < 0.5:
            when["#ctx_before"] = rng.choice([1, "200ms"])
    return when


def oracle(rows, when):
    node, dirs = parse_when(json.loads(json.dumps(when)))
    out = []
    for e in sorted({r[1] for r in rows}):
        wf = WhenFilter(node, dirs)
        ers = sorted((r for r in rows if r[1] == e), key=lambda r: r[2])
        for r in ers:
            res = wf.feed(FilterRecord(r[2], dict(r[6]), {}, extra=r))
            if res is None:
                break
            out.extend((rec.extra[1], rec.extra[2]) for rec in res)
    return sorted(out)


@pytest.mark.parametrize("seed", [31, 43])  # rotated per round (r10)
def test_planner_tiers_match_oracle(spark, seed):
    rng = random.Random(seed)
    rows = build_rows(rng)
    df = spark.createDataFrame(rows, SCHEMA)
    qe = QueryEngine()
    failures = []
    for _case in range(12):
        when = gen_when(rng)
        got = sorted(
            (r["entry"], r["ts"])
            for r in qe.query(df, when=json.loads(json.dumps(when)),
                              ordered=False).select("entry", "ts").collect())
        want = oracle(rows, when)
        if got != want:
            failures.append((when, len(got), len(want)))
    assert not failures, failures
