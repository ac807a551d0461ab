"""Supporter plugin registry + phrase-similarity supporter (chemotext2
analog) + scalar text functions."""

from __future__ import annotations

import pytest

from robokop_build_ray.functions.text import (
    generate_phrases,
    get_curie_prefix,
    normalize_name,
    pair_key,
    sanitize_predicate_label,
    un_curie,
)
from robokop_build_ray.pipelines.kg_build import build_graph, run_supporters
from robokop_build_ray.stages.supporters import SUPPORTERS, get_supporter


def test_scalar_functions():
    assert get_curie_prefix("MONDO:0005136") == "MONDO"
    assert un_curie("MESH:C032942") == "C032942"
    assert sanitize_predicate_label("PRED:treats") == "PRED_treats"
    assert normalize_name("Asthma, Allergic") == "allergic asthma"
    assert normalize_name("  Foo   Bar ") == "foo bar"
    assert pair_key("B:1", "A:2") == ("A:2", "B:1")
    # single word maps to itself even if short/stoplisted
    assert generate_phrases("ab") == ["ab"]
    # multi-word: stoplist + len>2 filter (`builder/chemotext2.py:30-42`)
    assert generate_phrases("Familial Albatross Disease, type 2") == ["Albatross"]


def test_registry():
    assert set(SUPPORTERS) >= {"cooccur", "phrase_sim", "shared_pubs"}
    with pytest.raises(KeyError):
        get_supporter("nope")


def test_shared_pubs_supporter(smoke_corpus):
    """omnicorp/chemotext analog: per-pair sorted shared CONV lists."""
    g = build_graph("sf0.001", materialize_intermediate=True,
                    include_support=False)
    out = run_supporters(g, ["shared_pubs"])["shared_pubs"].take_all()
    assert len(out) > 0
    # ground truth from the canonical triples themselves
    convs: dict[str, set] = {}
    for r in g["canonical"].take_all():
        for e in (r["subj_id"], r["obj_id"]):
            convs.setdefault(e, set()).add(r["conv_id"])
    for r in out[:50]:
        a, b = r["id_a"], r["id_b"]
        assert a < b
        shared = sorted("CONV:" + c for c in convs[a] & convs[b])
        assert list(r["publications"]) == shared
        assert r["n_pubs"] == len(shared)
        assert r["edge_source"] == "shared_pubs.term_to_term"


def test_phrase_sim_is_token_jaccard():
    """T3/A6: similarity is TOKEN-set Jaccard, not character-set Jaccard —
    'dog park' vs 'grok pad' share every letter but zero tokens."""
    from robokop_build_ray.stages.supporters import PhraseSimScorer

    sim = PhraseSimScorer._sim
    assert sim(frozenset("dog park".split()), frozenset("grok pad".split())) == 0.0
    assert sim(frozenset("dog park".split()), frozenset("dog beach".split())) \
        == pytest.approx(1.0 / 3.0)
    assert sim(frozenset("dog park".split()), frozenset("park dog".split())) == 1.0
    assert sim(frozenset(), frozenset("x".split())) == 0.0


def test_phrase_sim_supporter(smoke_corpus):
    g = build_graph("sf0.001", materialize_intermediate=True,
                    include_support=False)
    out = run_supporters(g, ["phrase_sim"])["phrase_sim"].take_all()
    assert len(out) > 0
    for r in out[:20]:
        assert r["is_support"] is True or r["is_support"] == True  # noqa: E712
        assert r["edge_source"] == "phrase_sim.term_to_term"
        assert 0.0 < r["similarity"] <= 1.0
        assert r["id_a"] < r["id_b"]


def test_pairs_all_matches_per_conv_reference():
    """The vectorized within-conv pair generator (_pairs_all, the support
    critical path) emits exactly the multiset the per-conversation
    reference (_pairs_group) does, across random conv sizes and caps."""
    import numpy as np
    import pandas as pd

    from robokop_build_ray.stages.support import _pairs_all, _pairs_group

    rng = np.random.default_rng(7)
    for _ in range(40):
        rows = []
        for c in range(int(rng.integers(1, 25))):
            for e in rng.choice(15, size=int(rng.integers(0, 12)),
                                replace=True):
                rows.append({"conv_id": f"c{c}", "entity": f"E{e}"})
        if not rows:
            continue
        d = pd.DataFrame(rows).drop_duplicates()
        cap = int(rng.integers(1, 8))
        got = sorted(map(tuple, _pairs_all(d, cap).to_numpy()))
        want = sorted(
            (a, b)
            for _, sub in d.groupby("conv_id")
            for a, b in _pairs_group(sub, cap).to_numpy())
        assert got == want
    empty = _pairs_all(pd.DataFrame({"conv_id": [], "entity": []}), 5)
    assert len(empty) == 0 and list(empty.columns) == ["id_a", "id_b"]


def test_pairs_all_with_conv_matches_per_conv_reference():
    """with_conv=True (the shared_publications grain) emits exactly the
    per-conversation reference multiset with the owning conv_id on every
    pair — the conv_pairs loop-retirement equivalence pin."""
    import numpy as np
    import pandas as pd

    from robokop_build_ray.stages.support import _pairs_all, _pairs_group

    rng = np.random.default_rng(11)
    for _ in range(40):
        rows = []
        for c in range(int(rng.integers(1, 25))):
            for e in rng.choice(15, size=int(rng.integers(0, 12)),
                                replace=True):
                rows.append({"conv_id": f"c{c}", "entity": f"E{e}"})
        if not rows:
            continue
        d = pd.DataFrame(rows).drop_duplicates()
        cap = int(rng.integers(1, 8))
        got = sorted(map(tuple,
                         _pairs_all(d, cap, with_conv=True).to_numpy()))
        want = sorted(
            (a, b, conv)
            for conv, sub in d.groupby("conv_id")
            for a, b in _pairs_group(sub, cap).to_numpy())
        assert got == want
    empty = _pairs_all(pd.DataFrame({"conv_id": [], "entity": []}), 5,
                       with_conv=True)
    assert len(empty) == 0
    assert list(empty.columns) == ["id_a", "id_b", "conv_id"]


def test_turn_window_pairs_hand_values():
    import ray.data as rd

    from robokop_build_ray.stages.support import turn_window_pairs

    # conv c1: A@0 (subj) with B@0 (obj) -> same-turn pair; A@0 with C@3
    # is OUTSIDE window 2; B@0 with C@3 outside too; C@3 with D@4 inside.
    # conv c2: A@0 with B@1 inside -> (A,B) counted again.
    rows = [
        {"conv_id": "c1", "turn_idx": 0, "subj_id": "A",
         "pred_id": "p", "obj_id": "B"},
        {"conv_id": "c1", "turn_idx": 3, "subj_id": "C",
         "pred_id": "p", "obj_id": "C"},
        {"conv_id": "c1", "turn_idx": 4, "subj_id": "D",
         "pred_id": "p", "obj_id": "D"},
        {"conv_id": "c2", "turn_idx": 0, "subj_id": "A",
         "pred_id": "p", "obj_id": "A"},
        {"conv_id": "c2", "turn_idx": 1, "subj_id": "B",
         "pred_id": "p", "obj_id": "B"},
    ]
    got = {(r["id_a"], r["id_b"]): r["n_windows"]
           for r in turn_window_pairs(rd.from_items(rows), window=2,
                                      n_buckets=4).take_all()}
    assert got == {("A", "B"): 2, ("C", "D"): 1}


def test_turn_window_cap_bounds_pairs():
    import ray.data as rd

    from robokop_build_ray.stages.support import turn_window_pairs

    # 4 entities same turn; cap=2 keeps lexicographic {A, B} only
    rows = [{"conv_id": "c", "turn_idx": 0, "subj_id": s,
             "pred_id": "p", "obj_id": o}
            for s, o in (("A", "B"), ("C", "D"))]
    got = {(r["id_a"], r["id_b"]) for r in turn_window_pairs(
        rd.from_items(rows), window=1, max_entities_per_conv=2,
        n_buckets=4).take_all()}
    assert got == {("A", "B")}


def test_support_triples_hand_values(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from robokop_build_ray.stages.support import support_triples_stage

    # conv1 and conv2 share triple (A,B,C); conv3 has only a pair
    rows = [
        ("c1", "A", "B"), ("c1", "B", "C"),
        ("c2", "A", "C"), ("c2", "B", "C"),
        ("c3", "A", "B"),
        ("c4", "A", "D"), ("c4", "B", "C"),  # c4 set {A,B,C,D}
    ]
    canon = rd.from_arrow(pa.table({
        "conv_id": pa.array([r[0] for r in rows]),
        "subj_id": pa.array([r[1] for r in rows]),
        "obj_id": pa.array([r[2] for r in rows]),
    }))
    got = {(r["id_a"], r["id_b"], r["id_c"]): r["n_convs"]
           for r in support_triples_stage(canon, n_buckets=4).take_all()}
    # (A,B,C) in c1, c2 AND c4 (whose set {A,B,C,D} contains it);
    # c4's D-triples stay below min_sup=2
    assert got == {("A", "B", "C"): 3}
    # cap honored: with cap=2 no conversation can form any triple
    got2 = support_triples_stage(canon, cap=2, n_buckets=4).take_all()
    assert got2 == []
