"""Generator + gazetteer determinism and shape (FIXTURES.md F1/F2)."""

from __future__ import annotations

import pyarrow as pa

from robokop_build_ray.functions.text import normalize_name
from robokop_build_ray.gazetteer import (
    build_bridges,
    build_entities,
    build_lexicon_rows,
    canonical_map,
)
from robokop_build_ray.textgen import generate_transcripts


def test_schema_matches_input_hint():
    t = generate_transcripts(500)
    assert t.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert t.schema.field("turn_idx").type == pa.int32()
    assert t.schema.field("ts").type == pa.timestamp("us")


def test_deterministic():
    a = generate_transcripts(1000)
    b = generate_transcripts(1000)
    assert a.equals(b)


def test_turn_idx_contiguous_per_conversation():
    t = generate_transcripts(1000).to_pandas()
    for _, g in t.groupby("conv_id"):
        idx = sorted(g["turn_idx"])
        assert idx == list(range(len(idx)))
        # ts monotone within conversation under turn order
        assert g.sort_values("turn_idx")["ts"].is_monotonic_increasing


def test_rows_are_shuffled_across_conversations():
    t = generate_transcripts(2000)
    keys = list(zip(t["conv_id"].to_pylist(), t["turn_idx"].to_pylist()))
    assert keys != sorted(keys)


def test_gazetteer_normalization_and_ambiguity():
    ents = build_entities(100)
    rows = build_lexicon_rows(ents)
    surfaces = {}
    for surf, curie, _ in rows:
        surfaces.setdefault(surf, []).append(curie)
    # comma-inverted display names normalize to the plain form
    assert normalize_name("Albaberiitis, Familial") == "familial albaberiitis"
    # at least one ambiguous surface (multi-CURIE union semantics)
    assert any(len(v) > 1 for v in surfaces.values())


def test_canonical_map_is_min_of_component():
    ents = build_entities(100)
    bridges = build_bridges(ents)
    canon = canonical_map(ents, bridges)
    assert len(bridges) > 0
    for a, b in bridges:
        assert canon[a] == canon[b]
        assert canon[a] <= min(a, b)
    # canonical ids are fixed points
    for root in set(canon.values()):
        assert canon[root] == root
