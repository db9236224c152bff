"""JSON ``when`` condition -> AST parser + directive extraction.

Re-implements the reference's recursive-descent parser semantics
(reference: reductstore/src/storage/query/condition/parser.rs:54-240):

* top level of a ``when`` object is an implicit ``$and`` over all keys,
* two syntaxes produce the same tree: array ``{"$gt": [a, b]}`` and
  object ``{"&label": {"$gt": 10}}``,
* string literals: ``&x`` label ref, ``@x`` computed ref, ``$$x`` escaped
  string ``$x``, bare ``$op`` zero-operand operator, duration literals
  ("1h -30m") parse to Duration, everything else is a String constant,
* ``#directives`` are split out of the object before parsing.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Tuple

from .ast import ALIASES, ARITY, ComputedRef, Const, LabelRef, Node, Op
from .values import (
    CondError,
    Value,
    parse_duration_us,
    vbool,
    vdur,
    vfloat,
    vint,
    vstr,
)

DIRECTIVES = (
    "#ctx_before",
    "#ctx_after",
    "#select_labels",
    "#ext",
    "#batch_size",
    "#batch_records",
    "#batch_metadata_size",
    "#batch_timeout",
    "#record_timeout",
    "#io_timeout",
)


def parse_when(when: Any) -> Tuple[Node, Dict[str, List[Value]]]:
    """Parse a ``when`` JSON value into (root AllOf node, directives).

    ``when`` may be a dict (already-decoded JSON) or a JSON string.
    """
    if isinstance(when, str):
        when = json.loads(when)
    elif isinstance(when, dict):
        # _parse_directives strips '#' keys as it goes (mirroring the
        # reference's directives.remove on an OWNED map, parser.rs) — a
        # shallow copy keeps that consumption off the CALLER's dict, so
        # re-planning with the same `when` (a second query run, a stream
        # restart) sees the directives again (r4 fuzz-drive find: the
        # second parse silently lost #ctx_before/#select_labels)
        when = dict(when)
    directives = _parse_directives(when)
    try:
        expressions = _parse_recursively(when)
    except RecursionError:
        # absurdly deep JSON blows the Python stack before the size cap
        # below can run — surface the same bounded-condition error the
        # serving layers expect instead of an internal error
        raise CondError(
            f"Condition exceeds maximum nesting depth "
            f"{MAX_CONDITION_DEPTH}")
    root = Op("$and", expressions)
    _check_size(root)
    return root, directives


# Parse-time condition-size cap (round 10): every serving path that
# accepts `when` JSON from outside (query cursor, zenoh queryable,
# signed query links) funnels through parse_when, so a hostile or
# runaway-generated condition is rejected HERE — before any compile
# tier sees it.  The compiled flat tier additionally self-limits
# (fastcols compile-size budget) because its expanded tree can be
# exponential in nesting depth; this cap is the outer defense that
# keeps even the O(ast) struct/interpreter tiers bounded.  The bounds
# are far above anything the reference's own tests or clients produce
# (realistic conditions nest <= 3 deep; the deepest in-repo fuzz
# generation is ~8 including wrappers).
MAX_CONDITION_DEPTH = 16
MAX_CONDITION_NODES = 2048


def _check_size(root: Op) -> None:
    def walk(node, depth):
        if depth > MAX_CONDITION_DEPTH:
            raise CondError(
                f"Condition exceeds maximum nesting depth "
                f"{MAX_CONDITION_DEPTH}")
        if not isinstance(node, Op):
            return 1
        n = 1
        for o in node.operands:
            n += walk(o, depth + 1)
        return n

    if walk(root, 0) > MAX_CONDITION_NODES:
        raise CondError(
            f"Condition exceeds maximum size of "
            f"{MAX_CONDITION_NODES} nodes")


def _parse_directive_primitive(key: str, v: Any) -> Value:
    if isinstance(v, bool):
        return vbool(v)
    if isinstance(v, int):
        if not (-(2**63) <= v < 2**63):
            raise CondError(f"Directive '{key}' contains integer value out of range: {v}")
        return vint(v)
    if isinstance(v, float):
        return vfloat(v)
    if isinstance(v, str):
        try:
            return vdur(parse_duration_us(v))
        except ValueError:
            return vstr(v)
    raise CondError(f"Directive '{key}' contains unsupported value type: {v}")


def _parse_directives(when: Any) -> Dict[str, List[Value]]:
    directives: Dict[str, List[Value]] = {}
    if not isinstance(when, dict):
        return directives
    for key in [k for k in when if k.startswith("#")]:
        if key not in DIRECTIVES:
            raise CondError(f"Directive '{key}' is not supported")
        value = when.pop(key)
        parsed: List[Value] = []
        if value is None:
            raise CondError(f"Directive '{key}' cannot be null")
        elif isinstance(value, dict):
            parsed.append(vstr(json.dumps(value)))
        elif isinstance(value, list):
            for item in value:
                if isinstance(item, dict):
                    if key == "#ext":
                        parsed.append(vstr(json.dumps(item)))
                    else:
                        raise CondError(
                            f"Directive '{key}' does not support object items in arrays"
                        )
                else:
                    parsed.append(_parse_directive_primitive(key, item))
        else:
            parsed.append(_parse_directive_primitive(key, value))
        directives[key] = parsed
    return directives


def _parse_recursively(value: Any) -> List[Node]:
    if isinstance(value, dict):
        return _parse_object(value)
    if isinstance(value, bool):
        return [Const(vbool(value))]
    if isinstance(value, int):
        return [Const(vint(value))]
    if isinstance(value, float):
        return [Const(vfloat(value))]
    if isinstance(value, str):
        return _parse_literal(value)
    if isinstance(value, list):
        raise CondError(f"Array type is not supported: {value}")
    raise CondError(f"Null type is not supported: {value}")


def _parse_object(obj: Dict[str, Any]) -> List[Node]:
    expressions: List[Node] = []
    for key, value in obj.items():
        if isinstance(value, list):
            # array syntax: {"$and": [a, b, ...]}
            operands: List[Node] = []
            for operand in value:
                operands.extend(_parse_recursively(operand))
            expressions.append(_make_op(key, operands))
        elif isinstance(value, dict):
            # object syntax: {"&label": {"$gt": 10}}
            left = _parse_literal_or_node(key)
            if len(value) != 1:
                raise CondError("Object notation must have exactly one operator")
            (operator, operand), = value.items()
            operands = left + _parse_recursively(operand)
            expressions.append(_make_op(operator, operands))
        else:
            operands = _parse_recursively(value)
            expressions.append(_make_op(key, operands))
    return expressions


def _parse_literal_or_node(key: str) -> List[Node]:
    return _parse_recursively(key)


def _parse_literal(value: str) -> List[Node]:
    if value.startswith("&"):
        return [LabelRef(value[1:])]
    if value.startswith("@"):
        return [ComputedRef(value[1:])]
    if value.startswith("$$"):
        return [Const(vstr("$" + value[2:]))]
    if value.startswith("$"):
        try:
            return [_make_op(value, [])]
        except CondError:
            raise CondError(
                f"Unknown '$' literal '{value}'; use '$$' to escape a string value"
            )
    try:
        return [Const(vdur(parse_duration_us(value)))]
    except ValueError:
        return [Const(vstr(value))]


def _make_op(operator: str, operands: List[Node]) -> Op:
    if not operator.startswith("$"):
        raise CondError(f"Operator '{operator}' must start with '$'")
    name = ALIASES.get(operator, operator)
    if name not in ARITY:
        raise CondError(f"Operator '{operator}' not supported")
    lo, hi = ARITY[name]
    n = len(operands)
    if n < lo or (hi is not None and n > hi):
        raise CondError(f"Operator '{operator}' got {n} operands, expects [{lo}, {hi}]")
    return Op(name, operands)
