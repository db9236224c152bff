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


def test_label_expr_compiled_matches_pandas_path(records):
    """The Column-compiled label_expr must agree with the interpreter
    (mapInPandas) path exactly — values, error-skips, upsert/overwrite,
    chained @refs — and must actually stay JVM-side."""
    spec = [
        {"label_expr": {"labels": {
            "d": {"$mult": ["&i", 2]},
            "bad": {"$div": ["&i", "&missing"]},     # error -> label skipped
            "s": {"$add": ["&i", "x"]},              # string concat
            "half": {"$div_num": [{"$cast": ["@d", "int"]}, 4]},  # @ref chain
        }}},
        {"label_expr": {"labels": {"d": {"$add": ["&i", 100]}}}},  # overwrite
    ]
    compiled = apply_ext_pipeline(records, spec, compile_builtin=True)
    pandas = apply_ext_pipeline(records, spec, compile_builtin=False)

    def snap(df):
        return {r["ts"]: dict(r["computed_labels"]) for r in df.collect()}

    assert snap(compiled) == snap(pandas)
    plan = compiled._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in plan and "EvalPython" not in plan, plan[:400]


def test_label_expr_compiled_null_computed_and_error_keep(spark):
    """Fresh records carry a NULL computed_labels map (not {}): the
    compiled upsert must still take (a NULL base swallowed the whole map
    via map_concat in an earlier version).  And an erroring re-compute
    must keep the label's previous value, like the interpreter's
    try/except."""
    rows = [("b", "e1", 1000, None, "", 1, {"i": "7"}, None)]
    records = spark.createDataFrame(rows, SCHEMA)
    spec = [
        {"label_expr": {"labels": {"x": {"$mult": ["&i", 3]}}}},
        {"label_expr": {"labels": {"x": {"$div": ["&i", "&missing"]}}}},
    ]
    for compile_builtin in (True, False):
        out = apply_ext_pipeline(records, spec, compile_builtin=compile_builtin)
        got = dict(out.collect()[0]["computed_labels"])
        assert got == {"x": "21"}, (compile_builtin, got)


EXPR_MATRIX = [
    {"$mult": ["&i", 2]},
    {"$add": ["&i", "&s"]},              # mixed kinds -> error -> skip
    {"$add": ["&s", "&s2"]},             # string concat
    {"$add": ["&f", 1]},                 # float arithmetic
    {"$div": ["&i", 4]},
    {"$div_num": ["&i", 4]},
    {"$rem": ["&i", 3]},
    {"$abs": ["&neg"]},
    {"&i": {"$gt": 3}},                  # bool display true/false
    {"$and": [{"&i": {"$gte": 0}}, {"&f": {"$lt": 100}}]},
    {"$xor": [{"&i": {"$gt": 2}}, {"&f": {"$gt": 2}}]},
    {"$exists": ["&maybe"]},
    {"$contains": ["&s", "el"]},
    {"$cast": ["&f", "int"]},
    {"$cast": ["&i", "float"]},
    {"$cast": ["&i", "bool"]},
    {"$hour": [{"$timestamp": []}]},
    {"$ref": ["&name"]},
    "&signed",                            # "+42" -> canonical "42"
    {"$div": ["&i", "&zero"]},            # error -> skip
    {"$add": ["&missing", 1]},            # missing label -> skip
]


def test_label_expr_compiled_equivalence_matrix(spark):
    """Every expression shape the flat/struct display tiers claim must
    produce byte-identical computed labels to the interpreter path,
    over labels of every runtime kind (int/float/string/bool/signed/
    missing)."""
    rows = [("b", "e", 3_600_000_000 * i + 1000 * i, None, "", 1,
             {"i": str(i), "f": f"{i}.5", "s": "hello", "s2": "world",
              "neg": str(-i), "signed": "+42", "zero": "0",
              "name": "i" if i % 2 else "f",
              **({"maybe": "1"} if i % 2 else {})}, None)
            for i in range(8)]
    records = spark.createDataFrame(rows, SCHEMA)
    spec = {"label_expr": {
        "labels": {f"x{j}": e for j, e in enumerate(EXPR_MATRIX)}}}
    compiled = apply_ext_pipeline(records, spec, compile_builtin=True)
    pandas = apply_ext_pipeline(records, spec, compile_builtin=False)
    got_c = {r["ts"]: dict(r["computed_labels"]) for r in compiled.collect()}
    got_p = {r["ts"]: dict(r["computed_labels"]) for r in pandas.collect()}
    assert got_c == got_p, {
        ts: (got_c[ts], got_p[ts]) for ts in got_c if got_c[ts] != got_p[ts]}


def test_label_expr_fuzz_compiled_vs_interpreter(spark):
    """Seeded random expressions over random label rows: the compiled
    tiers must reproduce the interpreter's computed maps exactly,
    including which labels are skipped on evaluation errors."""
    import random

    from tests.test_condition_fuzz import gen_cond, gen_rows

    rng = random.Random(7)
    rows = gen_rows(rng, 60)
    rec = spark.createDataFrame(
        [("b", "e", ts, None, "", 1, labels, None) for ts, labels in rows],
        SCHEMA)
    spec = {"label_expr": {
        "labels": {f"x{i}": gen_cond(rng, 2) for i in range(25)}}}
    compiled = apply_ext_pipeline(rec, spec, compile_builtin=True)
    pandas = apply_ext_pipeline(rec, spec, compile_builtin=False)
    got_c = {r["ts"]: dict(r["computed_labels"]) for r in compiled.collect()}
    got_p = {r["ts"]: dict(r["computed_labels"]) for r in pandas.collect()}
    bad = {ts: (got_c[ts], got_p[ts]) for ts in got_p if got_c[ts] != got_p[ts]}
    assert not bad, list(bad.items())[:2]


def test_label_expr_duration_falls_back_to_exact_path(records):
    # duration-valued expressions ($cast to duration / duration consts)
    # display via fmt_duration ("1m 40s"), which only the interpreter
    # path implements — compile must decline
    spec = {"label_expr": {"labels": {
        "w": {"$cast": [{"$mult": ["&i", 10_000_000]}, "duration"]}}}}
    out = apply_ext_pipeline(records, spec, compile_builtin=True)
    got = {r["ts"]: r["computed_labels"]["w"] for r in out.collect()}
    assert got[0] == "0us" and got[9000] == "1m 30s", got
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan  # really took the pandas path


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


def test_multi_extension_object_shorthand(spark):
    """Unconditional multi-extension objects expand into ordered steps
    (decode_ext_steps, PR-1367); with a `when` key the object stays a
    single step — and >1 extension in one step is rejected with the
    reference's message."""
    from reductstore_spark.condition.values import CondError
    from reductstore_spark.operators.ext import apply_ext_pipeline

    df = spark.createDataFrame(
        [("b", "e", 1, None, "", 1, {"i": "3"}, None)],
        "bucket string, entry string, ts long, payload binary, "
        "content_type string, state int, labels map<string,string>, "
        "computed_labels map<string,string>")

    # two label_expr steps in object shorthand: the second sees the
    # first's computed label (ordered execution)
    spec = {
        "label_expr": {"labels": {"a": {"$mult": ["&i", 2]}}},
        # a second step re-registered under the same built-in name would
        # collide in a dict; use the pipeline-array equivalence instead
    }
    out = apply_ext_pipeline(df, spec)
    row = out.collect()[0]
    assert row["computed_labels"]["a"] == "6"

    # multi-extension shorthand expands; unknown second name errors at
    # its own step, proving it became a separate step
    with pytest.raises(CondError, match="not registered"):
        apply_ext_pipeline(df, {
            "label_expr": {"labels": {"a": {"$mult": ["&i", 2]}}},
            "no_such_ext": {},
        })

    # with `when`, the object is ONE step -> multiple extensions rejected
    with pytest.raises(CondError, match="Multiple extensions"):
        apply_ext_pipeline(df, {
            "label_expr": {"labels": {"a": 1}},
            "other_ext": {},
            "when": {"@a": {"$gt": 0}},
        })

    # empty array: no pipeline at all
    assert apply_ext_pipeline(df, []) is df

    with pytest.raises(CondError, match="JSON object"):
        apply_ext_pipeline(df, [42])


def test_lifecycle_excludes_system_meta_entries(spark, tmp_path):
    """Lifecycle delete never touches $meta attachment metadata even
    when patterns would cover it (PR-1395)."""
    from reductstore_spark.sources.lifecycle import (LifecyclePolicy,
                                                     run_delete_action)
    from reductstore_spark.sources.store import RecordStore

    store = RecordStore(spark, str(tmp_path / "s"))
    rows = [("b", "e1", 1, None, "", 1, {}, {})]
    store.write(spark.createDataFrame(
        rows, "bucket string, entry string, ts long, payload binary, "
              "content_type string, state int, labels map<string,string>, "
              "computed_labels map<string,string>"))
    store.write_meta("b", "e1", "ext_defaults", {"img": "rgb"})
    removed = run_delete_action(
        store, LifecyclePolicy(bucket="b", older_than_us=0,
                               entries=["e1/**", "e1"]),
        now_us=10)
    assert removed == 1  # the data record only
    assert store.read_meta("b", "e1") == {"ext_defaults": {"img": "rgb"}}
