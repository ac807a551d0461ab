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
