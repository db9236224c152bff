"""Extension pipeline: computed labels, per-step when filters, chaining,
@label references (reference: ext_repository.rs:262-533)."""

import pytest

from reductstore_spark.operators.ext import apply_ext_pipeline, register_extension
from reductstore_spark.query import QueryEngine

SCHEMA = ("bucket string, entry string, ts long, payload binary, "
          "content_type string, state int, labels map<string,string>, "
          "computed_labels map<string,string>")


@pytest.fixture(scope="module")
def records(spark):
    rows = [("b", "e1", i * 1000, f"hello world {i}".encode(), "text/plain", 1,
             {"i": str(i)}, {}) for i in range(10)]
    return spark.createDataFrame(rows, SCHEMA)


def test_label_expr_computes_labels(records):
    out = apply_ext_pipeline(records, {"label_expr": {
        "labels": {"double_i": {"$mult": ["&i", 2]}}}})
    got = {r["ts"]: r["computed_labels"]["double_i"] for r in out.collect()}
    assert got[3000] == "6" and len(got) == 10


def test_per_step_when_over_computed_labels(records):
    # step when references @computed label (computed_reference.rs)
    spec = {"label_expr": {"labels": {"double_i": {"$mult": ["&i", 2]}}},
            "when": {"@double_i": {"$gte": 10}}}
    out = apply_ext_pipeline(records, spec)
    assert sorted(r["ts"] for r in out.collect()) == [5000, 6000, 7000, 8000, 9000]


def test_chained_steps(records):
    spec = [
        {"text_stats": {}},
        {"label_expr": {"labels": {"big": {"&i": {"$gt": 6}}}}},
        {"when": {"@words": {"$eq": 3}, "@big": {"$eq": True}},
         "label_expr": {"labels": {}}},
    ]
    out = apply_ext_pipeline(records, spec)
    assert sorted(r["ts"] for r in out.collect()) == [7000, 8000, 9000]


def test_ext_via_query_directive(records):
    qe = QueryEngine()
    out = qe.query(records, when={
        "#ext": {"text_stats": {}},
        "&i": {"$gte": 5},
    })
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["computed_labels"]["words"] == "3" for r in rows)


def test_label_expr_is_not_python_eval(records):
    # a Python escape-attempt string is an inert String constant in the
    # condition AST — never executed (no eval of query-supplied text)
    evil = "().__class__.__bases__[0].__subclasses__()"
    out = apply_ext_pipeline(records, {"label_expr": {"labels": {"x": evil}}})
    assert out.collect()[0]["computed_labels"]["x"] == evil


def test_unknown_extension_rejected(records):
    from reductstore_spark.condition.values import CondError
    with pytest.raises(CondError, match="not registered"):
        apply_ext_pipeline(records, {"nope": {}})
