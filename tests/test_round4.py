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


def test_support_coded_path_equivalence(ray_session):
    """The int32-coded support fast path (ConvEntityEncoder +
    _fused_conv_merge_coded + fused _SumScoreBucket) emits EXACTLY the
    string path's scored rows — including cap behavior, which depends on
    entity sort order (int code order == lex order by construction)."""
    from robokop_build_ray.stages.support import support_stage

    rng = np.random.default_rng(13)
    ents = sorted(f"E:{chr(65 + i)}{i}" for i in range(17))
    rows = []
    for c in range(60):
        for _ in range(int(rng.integers(1, 12))):
            s, o = rng.choice(len(ents), size=2, replace=False)
            rows.append({"conv_id": f"c{c}", "turn_idx": 0,
                         "subj_id": ents[s], "obj_id": ents[o]})
    canonical = rd.from_pandas(pd.DataFrame(rows)).repartition(5)
    codes_ref = ray.put({e: i for i, e in enumerate(ents)})

    def table(ds):
        return sorted(
            tuple(r.values())
            for r in ds.take_all())

    # cap=3 exercises the lexicographic-first truncation on both paths
    a = table(support_stage(canonical, 60, max_entities_per_conv=3,
                            n_buckets=8))
    b = table(support_stage(canonical, 60, max_entities_per_conv=3,
                            n_buckets=8, entity_codes_ref=codes_ref))
    assert a == b
    assert len(a) > 0


def test_path_scoped_pairs_general_k_matches_reference_walk(ray_session):
    """The general-k (>3 positions) DISTRIBUTED branch equals the
    per-position prefix-instance closure — including WILDCARD positions,
    where a node can realize multiple path positions. The reference's
    single global ancestor dict (`builder.py:396-399`) is iteration-
    ORDER-DEPENDENT in exactly that case (in-round feedback; ~12.6% of
    random wildcard graphs change pair sets across set orders), so the
    pinned contract is the well-defined per-position completion: A_i(v)
    = union over edges (u, v), u realized at i-1, of {u} + A_{i-1}(u);
    identical to the reference loop on distinct-type paths."""
    from robokop_build_ray.pipelines.kg_build import path_scoped_pairs

    types = {
        "CHEM:1": "chemical_substance", "CHEM:2": "chemical_substance",
        "GENE:1": "gene", "GENE:2": "gene",
        "PROC:1": "biological_process", "PROC:2": "biological_process",
        "DIS:1": "disease", "DIS:2": "disease",
    }
    universe = sorted(set(types.values()))
    rng = np.random.default_rng(17)
    nodes = sorted(types)

    def walk(edges, path_tsets):
        nbrs = {}
        for a, b in edges:
            if a == b:
                continue
            nbrs.setdefault(a, set()).add(b)
            nbrs.setdefault(b, set()).add(a)
        cur = {n for n in nbrs if types.get(n) in path_tsets[0]}
        anc_prev: dict = {}
        pairs = set()
        for ts in path_tsets[1:]:
            anc_i: dict = {}
            for u in cur:
                for v in nbrs.get(u, ()):
                    if types.get(v) in ts:
                        s = anc_i.setdefault(v, set())
                        s.add(u)
                        s.update(anc_prev.get(u, ()))
            for key, s in anc_i.items():
                for a in s:
                    if a != key:
                        pairs.add((min(a, key), max(a, key)))
            cur = set(anc_i)
            anc_prev = anc_i
        return pairs

    from robokop_build_ray.functions.pathdsl import (NODE_TYPE_BY_CODE,
                                                     tokenize_path)

    for path in ("SGPD", "SG?D", "S?PDT"):
        tsets = [
            frozenset(universe)
            if NODE_TYPE_BY_CODE[s.nodetype] == "unspecified"
            else frozenset([NODE_TYPE_BY_CODE[s.nodetype]])
            for s in tokenize_path(path)]
        # 2 trials x small n_buckets: each trial is a full multi-round
        # distributed run — 12 trials at n_buckets=64 cost ~6 min on the
        # 4-CPU test cluster for identical coverage
        for trial in range(2):
            n_edges = int(rng.integers(4, 16))
            edges = []
            for _ in range(n_edges):
                a, b = rng.choice(len(nodes), size=2, replace=False)
                edges.append((nodes[a], nodes[b]))
            canonical = rd.from_pandas(pd.DataFrame({
                "subj_id": [e[0] for e in edges],
                "obj_id": [e[1] for e in edges]}))
            info_ref = ray.put({k: ("n", v) for k, v in types.items()})
            got = {(r["id_a"], r["id_b"])
                   for r in path_scoped_pairs(canonical, path, info_ref,
                                              n_buckets=4).take_all()}
            want = walk(edges, tsets)
            assert got == want, (path, trial, sorted(got ^ want))


def test_incremental_lsh_touching_new_only(ray_session):
    """incremental_lsh_pairs emits exactly the minhash_lsh_pairs subset
    touching the new shard — base-vs-base near-dups never appear."""
    from robokop_build_ray.stages import dedup

    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        {"doc_id": 1, "text": base},                      # base
        {"doc_id": 2, "text": base + " extra"},           # base near-dup of 1
        {"doc_id": 3, "text": base + " tail words"},      # new (3 % 3 == 0)
        {"doc_id": 6, "text": "completely different text about ray data"},
        {"doc_id": 4, "text": "unrelated filler content nothing shared"},
    ]
    ds = rd.from_items(rows)
    full = {(r["id_a"], r["id_b"])
            for r in dedup.minhash_lsh_pairs(ds, threshold=0.5).take_all()}
    inc = {(r["id_a"], r["id_b"])
           for r in dedup.incremental_lsh_pairs(ds, mod=3,
                                                threshold=0.5).take_all()}
    want = {p for p in full if p[0] % 3 == 0 or p[1] % 3 == 0}
    assert inc == want
    assert (1, 2) in full and (1, 2) not in inc  # base-base excluded
    assert any(3 in p for p in inc)              # new doc's dup found


def test_linker_arrow_matches_pandas_reference(ray_session):
    """The arrow-native EntityLinker (dictionary-encode + take, rare
    multi-id cartesian branch) emits exactly the multiset the original
    pandas double-explode produced — including multi-CURIE surfaces,
    unmatched drops, and fused canonicalization."""
    import pyarrow as pa

    from robokop_build_ray.stages.link import EntityLinker

    lexicon = {
        "aspirin": ("CHEBI:1",),
        "ibuprofen": ("CHEBI:2", "MESH:2"),   # multi-source union
        "tylenol": ("CHEBI:3", "MESH:3", "X:3"),
        "headache": ("HP:1",),
    }
    canon = {"MESH:2": "CHEBI:2", "X:3": "CHEBI:3"}
    rng = np.random.default_rng(3)
    surfaces = ["Aspirin", "Ibuprofen", "Tylenol", "Headache", "nonsense"]
    rows = {
        "conv_id": [], "turn_idx": [], "subj": [], "pred": [], "obj": [],
    }
    for i in range(400):
        rows["conv_id"].append(f"c{i % 7}")
        rows["turn_idx"].append(i)
        rows["subj"].append(surfaces[rng.integers(len(surfaces))])
        rows["pred"].append("treats")
        rows["obj"].append(surfaces[rng.integers(len(surfaces))])
    batch = pa.table({**{k: pa.array(v) for k, v in rows.items()},
                      "turn_idx": pa.array(rows["turn_idx"], pa.int32())})

    def reference(df: pd.DataFrame, linker) -> list[tuple]:
        uniq = pd.unique(np.concatenate([df["subj"].values,
                                         df["obj"].values]))
        table = {s: linker._ids_for(s) for s in uniq}
        out = pd.DataFrame({
            "conv_id": df["conv_id"].values,
            "turn_idx": df["turn_idx"].values,
            "subj_id": df["subj"].map(table),
            "pred_id": "PRED:" + df["pred"],
            "obj_id": df["obj"].map(table),
        })
        out = out.explode("subj_id", ignore_index=True)
        out = out.explode("obj_id", ignore_index=True)
        out = out.dropna(subset=["subj_id", "obj_id"])
        return sorted(map(tuple, out.to_numpy()))

    for canon_ref in (None, ray.put(canon)):
        linker = EntityLinker(ray.put(lexicon), canon_ref=canon_ref)
        got = sorted(map(tuple, linker(batch).to_pandas().to_numpy()))
        ref = EntityLinker(ray.put(lexicon), canon_ref=canon_ref)
        want = reference(batch.to_pandas(), ref)
        assert got == want
        assert len(got) > 400  # multi-id surfaces exploded


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
    # >3 positions route through the general-k driver walk: the chain
    # C-G-D realizes the SGD prefix of SGDT (no phenotype position), so
    # all three prefix-ancestor pairs emerge
    got4 = {(r["id_a"], r["id_b"])
            for r in path_scoped_pairs(canonical, "SGDT",
                                       info_ref).take_all()}
    assert got4 == {("CHEM:1", "GENE:1"), ("DIS:1", "GENE:1"),
                    ("CHEM:1", "DIS:1")}
