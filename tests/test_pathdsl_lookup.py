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
