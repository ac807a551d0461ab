"""Typed name -> CURIE lookup dispatch (M2-M5): re-expression of
`builder/lookup_utils.py:4-77` over the gazetteer lexicon.

- phenotype: case-insensitive exact match with comma inversion
  (`lookup_phenotype_by_name`, :4-13); empty result is reported by the
  caller, not an error.
- disease: same lookup then FILTER OUT phenotype ids (``HP:`` prefix
  exclusion, `lookup_disease_by_name` :17-31 / D5).
- drug (chemical_substance): union over all matching dictionary entries,
  order-preserving first-seen (multi-source union semantics,
  `lookup_drug_by_name` :50-66 / D1).
- dispatch on type; unknown type -> ValueError (`lookup_identifier`
  :69-77).
"""

from __future__ import annotations

from .text import get_curie_prefix, normalize_name

PHENOTYPE_PREFIX = "HP"


def _matches(lexicon: dict[str, tuple[str, ...]], name: str) -> list[str]:
    ids = lexicon.get(normalize_name(name), ())
    out: list[str] = []
    for i in ids:  # order-preserving distinct (D1)
        if i not in out:
            out.append(i)
    return out


def lookup_phenotype_by_name(name: str, lexicon) -> list[str]:
    return [i for i in _matches(lexicon, name)
            if get_curie_prefix(i) == PHENOTYPE_PREFIX]


def lookup_disease_by_name(name: str, lexicon) -> list[str]:
    """Phenotype exclusion: drop HP-prefixed ids (`lookup_utils.py:26`)."""
    return [i for i in _matches(lexicon, name)
            if get_curie_prefix(i) != PHENOTYPE_PREFIX]


def lookup_drug_by_name(name: str, lexicon) -> list[str]:
    return _matches(lexicon, name)


def lookup_identifier(name: str, node_type: str, lexicon) -> list[str]:
    """Type-switch dispatch (`lookup_utils.py:69-77`)."""
    if node_type == "phenotypic_feature":
        return lookup_phenotype_by_name(name, lexicon)
    if node_type in ("disease", "genetic_condition"):
        return lookup_disease_by_name(name, lexicon)
    if node_type in ("chemical_substance", "drug"):
        return lookup_drug_by_name(name, lexicon)
    raise ValueError(f"unsupported lookup type: {node_type}")


def filter_identifiers_by_prefix(ids: list[str], prefix: str) -> list[str]:
    """Synonym prefix projection (M8/D6: MeSH / ICD9 filters,
    `builder/chemotext.py:27-31`, `builder/cdw.py:75-76`)."""
    return [i for i in ids if get_curie_prefix(i) == prefix]
