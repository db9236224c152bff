"""Extension (UDF) pipeline: the reference's IoExtension surface.

Reference model (reduct_base/src/ext.rs:20-95, pipeline execution
ext/ext_repository.rs:262-533): a dynamically-registered processor
transforms the record stream 1->N and emits *computed labels*
(``@label`` references); each pipeline step carries an optional ``when``
condition evaluated over the computed labels; a commiter rebatches.

Spark mapping: an extension is a registered Python class whose
``process`` receives an iterator of Arrow-backed pandas batches
(mapInPandas — 1->N comes free since output row counts are unconstrained)
and returns batches with a ``computed_labels`` JSON column; per-step
``when`` filters compile to Column predicates over the resulting map.
The pipeline spec is the ``#ext`` directive: an object (single step) or
array of step objects ``{ext_name: params, when?: condition}``.
"""

from __future__ import annotations

import json
from typing import Callable, Dict, Iterator, List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..condition.values import CondError

# registry of extensions: name -> factory(params) -> batch transform
_REGISTRY: Dict[str, Callable] = {}


def register_extension(name: str, factory: Callable) -> None:
    """Register ``factory(params) -> fn(Iterator[pd.DataFrame]) ->
    Iterator[pd.DataFrame]``.  Batches carry the records schema with
    ``labels_json`` / ``computed_json`` string columns in place of maps."""
    _REGISTRY[name] = factory


def extension_names() -> List[str]:
    return sorted(_REGISTRY)


def apply_ext_pipeline(df: DataFrame, ext_spec, strict: bool = False) -> DataFrame:
    """Run the extension pipeline over a records DataFrame.

    ``ext_spec``: dict (one step) or list of step dicts; each step is
    ``{ext_name: params, "when": cond?}`` (ext_repository.rs:339-470).
    """
    steps = ext_spec if isinstance(ext_spec, list) else [ext_spec]
    for step in steps:
        if isinstance(step, str):
            step = json.loads(step)
        step = dict(step)
        when = step.pop("when", None)
        if len(step) != 1:
            raise CondError("Extension step must have exactly one extension name")
        (name, params), = step.items()
        if name not in _REGISTRY:
            raise CondError(f"Extension '{name}' is not registered")
        df = _apply_one(df, _REGISTRY[name](params))
        if when is not None:
            from ..plans.planner import plan_parsed
            from ..condition.parser import parse_when
            node, directives = parse_when(when)
            # per-step when filters are ALWAYS strict in the reference
            # (ext_repository.rs:140-147 builds WhenFilter with strict=true;
            # an evaluation error fails the query, not just the record)
            df = plan_parsed(df, node, directives, strict=True)
    return df


def _apply_one(df: DataFrame, transform) -> DataFrame:
    cols = df.columns
    ser = (
        df.withColumn("__labels_json", F.to_json("labels"))
        .withColumn("__computed_json", F.to_json("computed_labels"))
        .drop("labels", "computed_labels")
    )
    out_schema = ser.schema

    def run(batches: Iterator) -> Iterator:
        yield from transform(batches)

    transformed = ser.mapInPandas(run, schema=out_schema)
    return transformed.select(
        *[c for c in cols if c not in ("labels", "computed_labels")],
        F.from_json("__labels_json", "map<string,string>").alias("labels"),
        F.from_json("__computed_json", "map<string,string>").alias("computed_labels"),
    ).select(*cols)


# ---------------------------------------------------------------------------
# built-in extensions
# ---------------------------------------------------------------------------

def _label_expr_factory(params):
    """`label_expr`: compute labels from existing ones with condition-language
    expressions. params: {"labels": {name: when_expr_json}} where each value
    is a condition-AST expression (same JSON grammar as ``when``, e.g.
    ``{"$mult": ["&i", 2]}``) evaluated per record over its labels.

    Security note: expressions are interpreted by the condition-AST
    evaluator — never Python ``eval`` — because ``#ext`` params arrive from
    untrusted query JSON.  This mirrors the reference, which only dispatches
    JSON params to pre-registered compiled extensions
    (ext/ext_repository.rs:262-533)."""
    from ..condition.parser import _parse_recursively
    from ..condition.interpreter import Context, Evaluator
    from ..condition import values as V

    specs = {}
    for k, expr in params.get("labels", {}).items():
        nodes = _parse_recursively(expr)
        if len(nodes) != 1:
            raise CondError(
                f"label_expr '{k}' must be a single condition expression")
        specs[k] = nodes[0]

    def transform(batches):
        evals = {k: Evaluator(node) for k, node in specs.items()}
        for pdf in batches:
            computed_col = []
            for i in range(len(pdf)):
                lj = pdf["__labels_json"].iat[i]
                cj = pdf["__computed_json"].iat[i]
                labels = json.loads(lj) if lj else {}
                computed = dict(json.loads(cj) or {}) if cj else {}
                ctx = Context(int(pdf["ts"].iat[i]), labels, computed)
                for k, ev in evals.items():
                    try:
                        computed[k] = V.to_display(ev.apply(ctx))
                    except Exception:
                        pass
                computed_col.append(json.dumps(computed))
            pdf = pdf.copy()
            pdf["__computed_json"] = computed_col
            yield pdf

    return transform


def _payload_text_stats_factory(params):
    """`text_stats`: computed labels with payload text statistics
    (length, word count) — the LLM-pipeline flavored demo extension."""
    encoding = params.get("encoding", "utf-8")

    def transform(batches):
        for pdf in batches:
            out = []
            for i in range(len(pdf)):
                cj = pdf["__computed_json"].iat[i]
                computed = dict(json.loads(cj) or {}) if cj else {}
                payload = pdf["payload"].iat[i]
                if payload is not None:
                    try:
                        text = bytes(payload).decode(encoding, errors="replace")
                        computed["len"] = str(len(text))
                        computed["words"] = str(len(text.split()))
                    except Exception:
                        pass
                out.append(json.dumps(computed))
            pdf = pdf.copy()
            pdf["__computed_json"] = out
            yield pdf

    return transform


register_extension("label_expr", _label_expr_factory)
register_extension("text_stats", _payload_text_stats_factory)
