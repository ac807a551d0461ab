"""Path-DSL lexer (M1): re-expression of `builder/pathlex.py:5-39`.

Grammar: a sequence of NODE codes, optionally separated by EDGE tokens
``(min-max)``. NODE codes (`builder/builder.py:535-543` + ``W`` from the
lexer `builder/pathlex.py:10`):

    S=drug G=gene P=biological_process C=cell A=anatomical_entity
    T=phenotypic_feature D=disease X=genetic_condition W=drug_class
    ?=unspecified

``tokenize_path("SG(1-2)D")`` -> [Step('S',1,1), Step('G',1,2), Step('D',..)]
— each Step carries the node code and the min/max path length of the edge
LEADING INTO it (first step always (1,1), mirroring the reference where the
edge token precedes the node it reaches). A trailing edge token is rejected
(`builder/pathlex.py:36-38`).
"""

from __future__ import annotations

import re
from typing import NamedTuple

NODE_CODES = "SGPCATDXW?"

NODE_TYPE_BY_CODE = {
    "S": "chemical_substance",
    "G": "gene",
    "P": "biological_process",
    "C": "cell",
    "A": "anatomical_entity",
    "T": "phenotypic_feature",
    "D": "disease",
    "X": "genetic_condition",
    "W": "drug_class",
    "?": "unspecified",
}


class Step(NamedTuple):
    nodetype: str
    min_path_length: int
    max_path_length: int


_TOKEN_RE = re.compile(r"([SGPCATDXW?])|\((\d+)-(\d+)\)|(\s+)|(.)")


def generate_concept_cypher(steps: list["Step"],
                            anchor_both_ends: bool = False) -> str:
    """M11: concept-level cypher for a DSL path — re-expression of
    `builder/userquery.py:26-36` (per-transition pathstring: `--` for
    direct hops, `-[:translation*min..max]-` for ranged ones) and
    `builder/userquery.py:115-130` (MATCH/WHERE traversable/EXISTS(r.op)/
    RETURN framing; end anchored only when an end value was looked up).

    The Ray engine executes paths natively (``kg_build.path_filter``), so
    this is a PLANNER ARTIFACT kept for parity with the reference's
    neo4j-planning surface, not an execution path."""
    types = [NODE_TYPE_BY_CODE[s.nodetype] for s in steps]
    if len(types) < 2:
        raise ValueError("cypher generation needs at least two steps")
    buf = ["MATCH p=\n"]
    for i, step in enumerate(steps[1:]):
        if i == 0:
            buf.append(f'(c0:Concept {{name: "{types[0]}" }})\n')
        if step.max_path_length > 1:
            buf.append(
                f"-[:translation*{step.min_path_length}.."
                f"{step.max_path_length}]-\n"
            )
        else:
            buf.append("--\n")
        buf.append(f'(c{i + 1}:Concept {{name: "{types[i + 1]}" }})\n')
    last = len(steps) - 1
    if anchor_both_ends:
        buf.append(
            f"WHERE robokop.traversable(nodes(p), relationships(p), "
            f"[c0,c{last}])\n"
        )
    else:
        buf.append("WHERE robokop.traversable(nodes(p), relationships(p), [c0])\n")
    buf.append("AND ALL( r in relationships(p) WHERE EXISTS(r.op) )")
    buf.append("RETURN p\n")
    return "".join(buf)


def step_type_pairs(steps: list["Step"]) -> list[tuple[str, str]]:
    """Adjacent (node_type, node_type) pairs a path implies — the query
    shape the reference's run() derives from the DSL
    (`builder/builder.py:497-521`). ``?`` maps to 'unspecified' (wildcard
    for consumers)."""
    types = [NODE_TYPE_BY_CODE[s.nodetype] for s in steps]
    return list(zip(types[:-1], types[1:]))


def tokenize_path(path: str) -> list[Step]:
    """Lex a path DSL string into Steps; raises ValueError on bad input."""
    steps: list[Step] = []
    pending: tuple[int, int] | None = None
    for m in _TOKEN_RE.finditer(path):
        node, emin, emax, ws, bad = m.groups()
        if ws:
            continue
        if bad:
            raise ValueError(f"illegal character {bad!r} in path {path!r}")
        if node:
            lo, hi = pending if pending is not None else (1, 1)
            steps.append(Step(node, lo, hi))
            pending = None
        else:
            if pending is not None:
                raise ValueError("two consecutive edge tokens")
            if not steps:
                raise ValueError("path cannot start with an edge token")
            lo, hi = int(emin), int(emax)
            if lo > hi or lo < 1:
                raise ValueError(f"bad edge bounds ({lo}-{hi})")
            pending = (lo, hi)
    if pending is not None:
        # trailing edge token rejected, `builder/pathlex.py:36-38`
        raise ValueError("path cannot end with an edge token")
    if not steps:
        raise ValueError("empty path")
    return steps
