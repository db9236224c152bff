"""Condition-language AST.

Mirrors the reference's node zoo (reference:
reductstore/src/storage/query/condition/parser.rs:250-305) as plain data;
evaluation lives in ``interpreter`` (stateful, exact) and ``columns``
(stateless Catalyst fast path).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List

from .values import Value


class Node:
    __slots__ = ()


@dataclass(frozen=True)
class Const(Node):
    value: Value


@dataclass(frozen=True)
class LabelRef(Node):
    """``&name`` — raw label reference (reference.rs:10-37)."""
    name: str


@dataclass(frozen=True)
class ComputedRef(Node):
    """``@name`` — computed label reference (computed_reference.rs:10-38)."""
    name: str


@dataclass(frozen=True)
class Op(Node):
    name: str  # canonical operator name, e.g. "$eq"
    operands: List[Node] = field(default_factory=list)


# canonical-name aliases (parser.rs:265-299)
ALIASES = {
    "$all_of": "$and",
    "$any_of": "$or",
    "$none_of": "$not",
    "$one_of": "$xor",
    "$has": "$exists",
    "$id": "$timestamp",
}

STATEFUL_OPS = {"$each_n", "$each_t", "$gate", "$limit"}

# operator -> (min_arity, max_arity); None = unbounded
ARITY = {
    "$each_n": (1, 1),
    "$each_t": (1, 1),
    "$gate": (2, 2),
    "$limit": (1, 1),
    "$add": (2, 2),
    "$sub": (2, 2),
    "$mult": (2, 2),
    "$div": (2, 2),
    "$div_num": (2, 2),
    "$rem": (2, 2),
    "$abs": (1, 1),
    "$and": (0, None),
    "$or": (0, None),
    "$not": (0, None),
    "$xor": (0, None),
    "$in": (1, None),
    "$nin": (1, None),
    "$eq": (2, 2),
    "$ne": (2, 2),
    "$gt": (2, 2),
    "$gte": (2, 2),
    "$lt": (2, 2),
    "$lte": (2, 2),
    "$second": (1, 2),
    "$minute": (1, 2),
    "$hour": (1, 2),
    "$day": (1, 2),
    "$month": (1, 2),
    "$year": (1, 2),
    "$weekday": (1, 2),
    "$contains": (2, 2),
    "$starts_with": (2, 2),
    "$ends_with": (2, 2),
    "$exists": (1, None),
    "$cast": (2, 2),
    "$ref": (1, 1),
    "$timestamp": (0, 0),
}


def is_stateful(node: Node) -> bool:
    """True if the subtree contains any order-dependent operator."""
    if isinstance(node, Op):
        if node.name in STATEFUL_OPS:
            return True
        return any(is_stateful(o) for o in node.operands)
    return False


def references(node: Node, out=None):
    """Collect all &label names referenced in the subtree."""
    if out is None:
        out = set()
    if isinstance(node, LabelRef):
        out.add(node.name)
    elif isinstance(node, Op):
        for o in node.operands:
            references(o, out)
    return out
