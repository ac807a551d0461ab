"""Round-4 additions: path-position-scoped support pairs
(`builder/builder.py:372-407` parity) and the scale-safe Lorenz/Gini
primitives' integration points."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _reference_walk_pairs(edges: list[tuple[str, str]],
                          types: dict[str, str],
                          path_types: list[str]) -> set[tuple[str, str]]:
    """Literal driver reimplementation of the reference's
    generate_links_from_paths (`builder/builder.py:372-407`): walk the
    undirected graph position by position, accumulate per-node ancestor
    sets, emit (key, ancestor) pairs; normalized (a < b), self pairs
    dropped (the reference's (v, v) entries carry no support work)."""
    nbrs: dict[str, set[str]] = {}
    for a, b in edges:
        if a == b:
            continue
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    ancestors: dict[str, set[str]] = {}
    current = {n for n in nbrs if types.get(n) == path_types[0]}
    for next_type in path_types[1:]:
        nxt: set[str] = set()
        for node in current:
            for other in nbrs.get(node, ()):
                if types.get(other) == next_type:
                    anc = ancestors.setdefault(other, set())
                    anc.add(node)
                    anc.update(ancestors.get(node, ()))
                    nxt.add(other)
        current = nxt
    pairs = set()
    for key, anc in ancestors.items():
        for a in anc:
            if a != key:
                pairs.add((min(a, key), max(a, key)))
    return pairs


def test_path_scoped_pairs_matches_reference_walk(ray_session):
    from robokop_build_ray.pipelines.kg_build import path_scoped_pairs

    types = {
        "CHEM:1": "chemical_substance", "CHEM:2": "chemical_substance",
        "GENE:1": "gene", "GENE:2": "gene", "GENE:3": "gene",
        "DIS:1": "disease", "DIS:2": "disease",
        "CELL:1": "cell",
    }
    rng = np.random.default_rng(5)
    nodes = sorted(types)
    for trial in range(12):
        n_edges = int(rng.integers(3, 14))
        edges = []
        for _ in range(n_edges):
            a, b = rng.choice(len(nodes), size=2, replace=False)
            edges.append((nodes[a], nodes[b]))
        canonical = rd.from_pandas(pd.DataFrame({
            "subj_id": [e[0] for e in edges],
            "obj_id": [e[1] for e in edges],
        }))
        info_ref = ray.put({k: ("name", v) for k, v in types.items()})
        got = {(r["id_a"], r["id_b"])
               for r in path_scoped_pairs(canonical, "SGD",
                                          info_ref).take_all()}
        want = _reference_walk_pairs(
            edges, types, ["chemical_substance", "gene", "disease"])
        assert got == want, (trial, sorted(edges),
                             sorted(got ^ want))


def test_path_scoped_pairs_two_positions(ray_session):
    from robokop_build_ray.pipelines.kg_build import path_scoped_pairs

    types = {"CHEM:1": "chemical_substance", "GENE:1": "gene",
             "DIS:1": "disease"}
    canonical = rd.from_pandas(pd.DataFrame({
        "subj_id": ["CHEM:1", "GENE:1", "CHEM:1"],
        "obj_id": ["GENE:1", "DIS:1", "DIS:1"],
    }))
    info_ref = ray.put({k: ("n", v) for k, v in types.items()})
    got = {(r["id_a"], r["id_b"])
           for r in path_scoped_pairs(canonical, "SG", info_ref).take_all()}
    assert got == {("CHEM:1", "GENE:1")}

    import pytest

    with pytest.raises(ValueError, match="direct hops"):
        path_scoped_pairs(canonical, "S(1-2)D", info_ref)
    with pytest.raises(ValueError, match="2- or 3-position"):
        path_scoped_pairs(canonical, "SGDT", info_ref)
