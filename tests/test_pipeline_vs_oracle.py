"""Exact table equality: Ray pipeline vs pure-Python oracle at smoke tier
(SURVEY §5: the golden layer the reference never had)."""

from __future__ import annotations

import math

import pyarrow.parquet as pq
import pytest

from robokop_build_ray.gazetteer import build_entities
from robokop_build_ray.oracle import OracleKG, extract
from robokop_build_ray.pipelines.kg_build import build_graph
from robokop_build_ray.sources.corpus import N_ENTITIES


@pytest.fixture(scope="module")
def graph(smoke_corpus):
    g = build_graph("sf0.001", materialize_intermediate=True)
    for k in ("triples", "linked", "canonical", "nodes", "edges", "support"):
        g[k] = g[k].materialize()  # execute each output chain exactly once
    return g


@pytest.fixture(scope="module")
def oracle(smoke_corpus):
    tr = pq.read_table(smoke_corpus["transcripts"])
    ok = OracleKG(build_entities(N_ENTITIES))
    raw = extract(tr)
    linked = ok.link(raw)
    canonical = ok.canonical_triples(linked)
    n_convs = len(set(tr["conv_id"].to_pylist()))
    return {
        "table": tr,
        "ok": ok,
        "raw": raw,
        "linked": linked,
        "canonical": canonical,
        "n_convs": n_convs,
    }


def _rows(ds, cols):
    return sorted(tuple(r[c] for c in cols) for r in ds.take_all())


def test_extract_matches_oracle(graph, oracle):
    got = _rows(graph["triples"], ["conv_id", "turn_idx", "subj", "pred", "obj"])
    assert got == oracle["raw"]


def test_link_matches_oracle(graph, oracle):
    got = _rows(graph["linked"], ["conv_id", "turn_idx", "subj_id", "pred_id", "obj_id"])
    assert got == oracle["linked"]


def test_canonical_matches_oracle(graph, oracle):
    got = _rows(
        graph["canonical"], ["conv_id", "turn_idx", "subj_id", "pred_id", "obj_id"]
    )
    assert got == oracle["canonical"]


def test_nodes_match_oracle(graph, oracle):
    got = sorted(
        (r["id"], r["name"], r["node_type"], tuple(r["equivalent_identifiers"]))
        for r in graph["nodes"].take_all()
    )
    want = [
        (i, n, t, tuple(eq)) for i, n, t, eq in oracle["ok"].nodes(oracle["canonical"])
    ]
    assert got == want


def test_edges_match_oracle(graph, oracle):
    got = sorted(
        (
            r["subj_id"],
            r["pred_id"],
            r["standard_label"],
            r["obj_id"],
            r["edge_source"],
            tuple(r["publications"]),
            r["n_mentions"],
            r["is_support"],
        )
        for r in graph["edges"].take_all()
    )
    want = [
        (s, p, lbl, o, src, tuple(pubs), n, sup)
        for s, p, lbl, o, src, pubs, n, sup in oracle["ok"].edges(oracle["canonical"])
    ]
    assert got == want


def test_support_matches_oracle(graph, oracle):
    got = sorted(
        (
            r["id_a"], r["id_b"], r["c1"], r["c2"], r["c"],
            r["expected"], r["chi2"], r["p"], r["suppressed"],
        )
        for r in graph["support"].take_all()
    )
    want = oracle["ok"].support(oracle["canonical"], oracle["n_convs"])
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g[:5] == tuple(w[:5])
        for gi, wi in zip(g[5:8], w[5:8]):
            assert math.isclose(gi, wi, rel_tol=1e-9, abs_tol=1e-12)
        assert g[8] == w[8]


def test_triple_precision_recall_gate(graph, oracle):
    """BASELINE metric: P/R >= 0.95 (here exact, so P = R = 1.0)."""
    got = set(
        _rows(graph["canonical"], ["conv_id", "turn_idx", "subj_id", "pred_id", "obj_id"])
    )
    want = set(oracle["canonical"])
    tp = len(got & want)
    assert tp / max(1, len(got)) >= 0.95
    assert tp / max(1, len(want)) >= 0.95


def test_per_turn_text_equality_under_stable_order(graph, smoke_corpus):
    """input_hint invariant: per-turn text equality under stable
    (conv_id, turn_idx) ordering after the round trip through Ray."""
    got = graph["transcripts"].sort(["conv_id", "turn_idx"]).to_pandas()
    want = (
        pq.read_table(smoke_corpus["transcripts"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert got["text"].tolist() == want["text"].tolist()
    assert got["conv_id"].tolist() == want["conv_id"].tolist()
    assert got["turn_idx"].tolist() == want["turn_idx"].tolist()
