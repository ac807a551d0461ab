"""Path-DSL lexer (M1) and typed lookup dispatch (M2-M5/D1/D5) semantics."""

from __future__ import annotations

import pytest

from robokop_build_ray.functions.lookup import (
    filter_identifiers_by_prefix,
    lookup_disease_by_name,
    lookup_drug_by_name,
    lookup_identifier,
    lookup_phenotype_by_name,
)
from robokop_build_ray.functions.pathdsl import Step, tokenize_path


def test_tokenize_simple():
    assert tokenize_path("SGD") == [
        Step("S", 1, 1), Step("G", 1, 1), Step("D", 1, 1)
    ]


def test_tokenize_with_edges():
    assert tokenize_path("S(1-2)G(2-3)D") == [
        Step("S", 1, 1), Step("G", 1, 2), Step("D", 2, 3)
    ]


def test_tokenize_all_codes():
    assert len(tokenize_path("SGPCATDXW?")) == 10


def test_tokenize_rejects_bad_input():
    for bad in ["SGD(1-2)", "S(1-2)(2-3)G", "(1-2)S", "SZ", "", "S(3-2)G"]:
        with pytest.raises(ValueError):
            tokenize_path(bad)


def test_generate_concept_cypher():
    """M11 planner artifact: `builder/userquery.py:26-36,115-130` shape."""
    from robokop_build_ray.functions.pathdsl import generate_concept_cypher

    cy = generate_concept_cypher(tokenize_path("S(1-2)D"))
    assert cy.startswith("MATCH p=\n")
    assert '(c0:Concept {name: "chemical_substance" })' in cy
    assert "-[:translation*1..2]-" in cy
    assert '(c1:Concept {name: "disease" })' in cy
    assert "robokop.traversable(nodes(p), relationships(p), [c0])" in cy
    assert "EXISTS(r.op)" in cy and cy.endswith("RETURN p\n")
    # direct hop renders as `--`, both-ends anchor names the last concept
    cy2 = generate_concept_cypher(tokenize_path("SGD"), anchor_both_ends=True)
    assert "--\n" in cy2 and "[c0,c2]" in cy2
    with pytest.raises(ValueError):
        generate_concept_cypher(tokenize_path("S"))


def test_step_type_pairs():
    from robokop_build_ray.functions.pathdsl import step_type_pairs

    assert step_type_pairs(tokenize_path("S(1-2)D")) == [
        ("chemical_substance", "disease")
    ]
    assert step_type_pairs(tokenize_path("SGD")) == [
        ("chemical_substance", "gene"), ("gene", "disease")
    ]
    assert step_type_pairs(tokenize_path("?D")) == [("unspecified", "disease")]


def test_cli_question_path_conflict_and_mapping():
    """`builder/builder.py:574-602` canned questions: -q maps to a path,
    and -q with -p is rejected before any work starts."""
    from robokop_build_ray.cli import main

    with pytest.raises(SystemExit):
        main(["build", "--out", "/tmp/_x", "--path", "SD", "-q", "1"])


def test_path_filter_scopes_triples(smoke_corpus):
    """M1 consumer: the DSL drives which triples reach the graph."""
    from robokop_build_ray.pipelines.kg_build import build_graph

    full = build_graph("sf0.001", include_support=False)
    scoped = build_graph("sf0.001", include_support=False, path="S(1-2)D")
    types = {k: v[1] for k, v in
             __import__("ray").get(full["state"].nodeinfo_ref).items()}
    rows = scoped["canonical"].take_all()
    n_full = full["canonical"].count()
    assert 0 < len(rows) < n_full
    for r in rows:
        assert {types[r["subj_id"]], types[r["obj_id"]]} == \
            {"chemical_substance", "disease"}
    # wildcard keeps every typed triple
    wild = build_graph("sf0.001", include_support=False, path="??")
    assert wild["canonical"].count() == n_full


LEX = {
    "allergic asthma": ("MONDO:1", "HP:9", "MESH:5"),
    "aspirin": ("MESH:2", "CHEBI:3", "MESH:2"),
}


def test_disease_excludes_phenotype_prefix():
    assert lookup_disease_by_name("Asthma, Allergic", LEX) == ["MONDO:1", "MESH:5"]


def test_phenotype_keeps_only_hp():
    assert lookup_phenotype_by_name("allergic asthma", LEX) == ["HP:9"]


def test_drug_union_order_preserving_distinct():
    assert lookup_drug_by_name("Aspirin", LEX) == ["MESH:2", "CHEBI:3"]


def test_dispatch():
    assert lookup_identifier("aspirin", "chemical_substance", LEX) == [
        "MESH:2", "CHEBI:3"
    ]
    with pytest.raises(ValueError):
        lookup_identifier("x", "gene", LEX)


def test_prefix_filter():
    assert filter_identifiers_by_prefix(
        ["MESH:1", "HP:2", "MESH:3"], "MESH"
    ) == ["MESH:1", "MESH:3"]


def test_path_filter_varlen_2hop():
    """S(2-2)D keeps exactly the triples on 2-hop chem--*--disease paths."""
    import ray
    import ray.data as rd

    from robokop_build_ray.pipelines.kg_build import path_filter_varlen

    # graph: C1 -- G1 -- D1 (2-path), C2 -- D2 (direct only), G2 -- D3
    types = {
        "C1": ("C1", "chemical_substance", []),
        "C2": ("C2", "chemical_substance", []),
        "G1": ("G1", "gene", []), "G2": ("G2", "gene", []),
        "D1": ("D1", "disease", []), "D2": ("D2", "disease", []),
        "D3": ("D3", "disease", []),
    }
    triples = [
        {"conv_id": "c", "turn_idx": 1, "subj_id": "C1",
         "pred_id": "PRED:binds", "obj_id": "G1"},
        {"conv_id": "c", "turn_idx": 2, "subj_id": "G1",
         "pred_id": "PRED:causes", "obj_id": "D1"},
        {"conv_id": "c", "turn_idx": 3, "subj_id": "C2",
         "pred_id": "PRED:treats", "obj_id": "D2"},
        {"conv_id": "c", "turn_idx": 4, "subj_id": "G2",
         "pred_id": "PRED:causes", "obj_id": "D3"},
    ]
    ds = rd.from_items(triples)
    ref = ray.put(types)
    got = {(r["subj_id"], r["obj_id"])
           for r in path_filter_varlen(ds, "S(2-2)D", ref).take_all()}
    # both hops of the C1-G1-D1 path qualify; the direct C2-D2 edge does
    # NOT (min bound 2 excludes direct hops); G2-D3 is on no chem path
    assert got == {("C1", "G1"), ("G1", "D1")}
    # S(1-2)D additionally admits the direct chem-disease edge
    got12 = {(r["subj_id"], r["obj_id"])
             for r in path_filter_varlen(ds, "S(1-2)D", ref).take_all()}
    assert got12 == {("C1", "G1"), ("G1", "D1"), ("C2", "D2")}


def test_synonym_expander_gated_types():
    """M9 dynamic expansion: xref codes fold into equivalent_identifiers
    for gated node types only; nodes without xrefs are untouched."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    from robokop_build_ray.stages.canonicalize import expand_synonyms_stage

    nodes = rd.from_arrow(pa.table({
        "id": ["MONDO:1", "HGNC:2", "HP:3"],
        "name": ["d", "g", "p"],
        "node_type": ["disease", "gene", "phenotypic_feature"],
        "equivalent_identifiers": [["ALT1:1", "MONDO:1"], ["HGNC:2"],
                                   ["HP:3"]],
    }))
    xref = ray.put({"MONDO:1": ("ICD9:001.1",), "HGNC:2": ("ICD9:999.9",)})
    got = {r["id"]: r["equivalent_identifiers"]
           for r in expand_synonyms_stage(nodes, xref).take_all()}
    assert got["MONDO:1"] == ["ALT1:1", "ICD9:001.1", "MONDO:1"]  # expanded
    assert got["HGNC:2"] == ["HGNC:2"]  # gene: gated OUT despite xref
    assert got["HP:3"] == ["HP:3"]      # gated type, no xref -> unchanged
