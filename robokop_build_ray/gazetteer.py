"""Deterministic gazetteer: the entity-linking dictionary for the KG pipeline.

Plays the role of the reference's federated name-lookup services
(`builder/lookup_utils.py:4-77`: HPO/MONDO/CTD/Pharos/PubChem searches) and its
synonym universe (`builder/builder.py:136-167,249-264` node_map/merge): a fixed,
seedless (pure index arithmetic) entity table with

- one primary CURIE per record (typed prefix, e.g. ``MONDO:0000123``),
- a display name (some two-word names with comma-inverted written forms,
  exercising `builder/lookup_utils.py:7,23` normalization),
- a synonym CURIE list (overlapping across records to force canonicalization
  merges, the analog of `builder/builder.py:249-264`),
- deliberate name ambiguity (one surface -> multiple CURIEs), mirroring the
  multi-source union semantics of `builder/lookup_utils.py:50-66`.

Everything here is small (reference-data scale, not corpus scale): it is
broadcast to linking actors via ``ray.put`` and written once as parquet so the
DuckDB oracle can join against the identical dictionary.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa

from .functions.text import normalize_name

_SYLLABLES = [
    "alba", "beri", "cora", "dela", "enti", "fero", "gala", "heli", "ixo",
    "jura", "kelo", "lumi", "mira", "noxa", "orin", "pexa", "quil", "rava",
    "sero", "tixo", "ulma", "vexa", "wira", "xeno", "yora", "zemi",
]

# node types + CURIE prefixes, codes per `builder/builder.py:535-543`
_TYPES = [
    ("disease", "MONDO", ["itis", "oma", "osis", "emia", "pathy"]),
    ("gene", "HGNC", ["gene", "kin", "rase", "fax", "zyme"]),
    ("chemical_substance", "MESH", ["mab", "nib", "olol", "micin", "statin"]),
    ("phenotypic_feature", "HP", ["algia", "penia", "trophy", "plasia", "rrhea"]),
    ("anatomical_entity", "UBERON", ["duct", "lobe", "plexus", "fossa", "crest"]),
    ("cell", "CL", ["cyte", "blast", "phage", "clast", "oid"]),
    ("biological_process", "GO", ["genesis", "lysis", "flux", "cycling", "uptake"]),
]

_QUALIFIERS = ["Familial", "Acute", "Allergic", "Juvenile", "Chronic"]


@dataclass(frozen=True)
class Entity:
    curie: str
    name: str          # display form (may be comma-inverted two-word name)
    node_type: str
    synonyms: tuple[str, ...]  # alt CURIEs, primary NOT included


def _type_of(i: int, n: int) -> tuple[str, str, list[str]]:
    return _TYPES[i * len(_TYPES) // n]


def build_entities(n: int = 400) -> list[Entity]:
    """Pure-arithmetic deterministic entity universe of size ``n``."""
    ents: list[Entity] = []
    for i in range(n):
        node_type, prefix, suffixes = _type_of(i, n)
        s1 = _SYLLABLES[i % len(_SYLLABLES)]
        s2 = _SYLLABLES[(i * 7 + 3) % len(_SYLLABLES)]
        base = (s1 + s2 + suffixes[i % len(suffixes)]).capitalize()
        if i % 3 == 0:  # two-word name, written comma-inverted half the time
            qual = _QUALIFIERS[i % len(_QUALIFIERS)]
            name = f"{base}, {qual}" if i % 6 == 0 else f"{qual} {base}"
        else:
            name = base
        curie = f"{prefix}:{i:07d}"
        syns = [f"ALT{(i % 3) + 1}:{i:07d}", f"UMLS:C{i:07d}"]
        ents.append(Entity(curie, name, node_type, tuple(syns)))
    return ents


def build_bridges(ents: list[Entity]) -> list[tuple[str, str]]:
    """Synonym-equivalence edges between records (same-type neighbors), the
    input of the canonicalization closure (`builder/builder.py:136-167`).

    Every 5th record bridges to its successor (2-chains); every 15th extends
    to a 3-chain. Bridges only join records of the same node_type.
    """
    pairs: list[tuple[str, str]] = []
    n = len(ents)
    for i in range(0, n - 1, 5):
        if ents[i].node_type == ents[i + 1].node_type:
            pairs.append((ents[i].curie, ents[i + 1].curie))
        if i % 15 == 0 and i + 2 < n and ents[i + 1].node_type == ents[i + 2].node_type:
            pairs.append((ents[i + 1].curie, ents[i + 2].curie))
    return pairs


def build_lexicon_rows(ents: list[Entity]) -> list[tuple[str, str, str]]:
    """(surface_norm, curie, node_type) rows — every normalized written surface.

    Ambiguity: every 37th record's name is *also* a surface for the following
    record (one name -> two CURIEs), matching the union-of-sources behavior of
    `builder/lookup_utils.py:50-66`; the linker emits ALL matches.
    """
    rows: list[tuple[str, str, str]] = []
    seen: set[tuple[str, str]] = set()

    def add(surface: str, e: Entity) -> None:
        key = (normalize_name(surface), e.curie)
        if key not in seen:
            seen.add(key)
            rows.append((key[0], e.curie, e.node_type))

    for i, e in enumerate(ents):
        add(e.name, e)
        if i % 37 == 0 and i + 1 < len(ents):
            add(e.name, ents[i + 1])
    return sorted(rows)


def build_xrefs(ents: list[Entity]) -> list[tuple[str, str]]:
    """OXO-analog coded-synonym xref rows (curie -> ICD9-like code) for the
    DYNAMIC expansion operator (M9, `builder/cdw.py:19-34`
    ``CDWSupport.prepare``: disease/genetic-condition nodes hit OXO for
    ICD9CM codes at build time and add them to ``node.synonyms``).

    Deterministic arithmetic, disease/phenotype records only (the analog of
    the reference's DISEASE/GENETIC_CONDITION gate); every 7th eligible
    record has NO xref (the reference's 'No ICD9 found' warn path,
    `cdw.py:25-26`) and every 5th carries TWO codes (multi-result loop,
    `cdw.py:28-32`)."""
    rows: list[tuple[str, str]] = []
    for i, e in enumerate(ents):
        if e.node_type not in ("disease", "phenotypic_feature"):
            continue
        if i % 7 == 0:
            continue
        rows.append((e.curie, f"ICD9:{(i * 13) % 999:03d}.{i % 10}"))
        if i % 5 == 0:
            rows.append((e.curie, f"ICD9:{(i * 17) % 999:03d}.{(i * 3) % 10}"))
    return rows


def canonical_map(ents: list[Entity], bridges: list[tuple[str, str]]) -> dict[str, str]:
    """Union-find closure over bridge edges; canonical id = lexicographic min
    primary CURIE of the component.

    Deterministic replacement for the reference's order-dependent merge
    (`builder/builder.py:136-167`, SURVEY §7.4.1). The gazetteer is reference
    data (small side) so this runs on the driver and is broadcast; the general
    distributed equivalent is `stages.components.connected_components`.
    """
    parent: dict[str, str] = {e.curie: e.curie for e in ents}

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in bridges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra <= rb else (rb, ra)
            parent[hi] = lo
    return {e.curie: find(e.curie) for e in ents}


# ---------------------------------------------------------------- Arrow views

def gazetteer_table(ents: list[Entity]) -> pa.Table:
    return pa.table(
        {
            "curie": [e.curie for e in ents],
            "name": [e.name for e in ents],
            "node_type": [e.node_type for e in ents],
            "synonyms": [list(e.synonyms) for e in ents],
        },
        schema=pa.schema(
            [
                ("curie", pa.string()),
                ("name", pa.string()),
                ("node_type", pa.string()),
                ("synonyms", pa.list_(pa.string())),
            ]
        ),
    )


def lexicon_table(ents: list[Entity]) -> pa.Table:
    rows = build_lexicon_rows(ents)
    return pa.table(
        {
            "surface_norm": [r[0] for r in rows],
            "curie": [r[1] for r in rows],
            "node_type": [r[2] for r in rows],
        }
    )


def bridges_table(ents: list[Entity]) -> pa.Table:
    pairs = build_bridges(ents)
    return pa.table(
        {"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]},
        schema=pa.schema([("a", pa.string()), ("b", pa.string())]),
    )


def xrefs_table(ents: list[Entity]) -> pa.Table:
    rows = build_xrefs(ents)
    return pa.table(
        {"curie": [r[0] for r in rows], "code": [r[1] for r in rows]},
        schema=pa.schema([("curie", pa.string()), ("code", pa.string())]),
    )
