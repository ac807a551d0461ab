"""Quantized-integer PageRank: hand-checkable values, and the distributed
bucketed path pinned bit-identical to the driver-local path."""

from __future__ import annotations

import numpy as np
import ray.data as rd

from robokop_build_ray.stages.pagerank import SCALE, pagerank


def _star_edges():
    # hub <- a, b, c ; hub -> a (so hub has out-degree and a gets mass back)
    return rd.from_items([
        {"subj_id": "a", "obj_id": "hub"},
        {"subj_id": "b", "obj_id": "hub"},
        {"subj_id": "c", "obj_id": "hub"},
        {"subj_id": "hub", "obj_id": "a"},
    ])


def test_pagerank_hand_values_one_iter():
    got = {r["id"]: r["rank_units"]
           for r in pagerank(_star_edges(), iters=1).take_all()}
    n, r0 = 4, SCALE // 4
    base = (SCALE * 15 // 100) // n
    # hub receives r0//1 from each of a,b,c; a receives r0//1 from hub
    assert got["hub"] == base + (85 * 3 * r0) // 100
    assert got["a"] == base + (85 * r0) // 100
    assert got["b"] == base  # no in-edges
    assert got["c"] == base
    assert set(got) == {"a", "b", "c", "hub"}


def test_pagerank_distributed_matches_local():
    rng = np.random.default_rng(7)
    edges = rd.from_items([
        {"subj_id": f"n{int(a)}", "obj_id": f"n{int(b)}"}
        for a, b in rng.integers(0, 40, size=(300, 2)) if a != b
    ])
    local = sorted((r["id"], r["rank_units"])
                   for r in pagerank(edges, iters=3).take_all())
    dist = sorted((r["id"], r["rank_units"])
                  for r in pagerank(edges, iters=3, local_threshold=0,
                                    n_buckets=8).take_all())
    assert local == dist  # bit-identical integer math on both paths


def test_pagerank_mass_conserved_without_dangling():
    # cycle graph: no dangling nodes -> total rank stays ~SCALE (floor-div
    # losses only), and symmetry makes every rank equal
    edges = rd.from_items([
        {"subj_id": f"n{i}", "obj_id": f"n{(i + 1) % 5}"} for i in range(5)
    ])
    got = [r["rank_units"] for r in pagerank(edges, iters=4).take_all()]
    assert len(set(got)) == 1
    assert abs(sum(got) - SCALE) < 100  # integer floor losses only


def test_hits_hand_values_one_iter():
    from robokop_build_ray.stages.pagerank import hits

    got = {r["id"]: (r["hub_units"], r["auth_units"])
           for r in hits(_star_edges(), iters=1).take_all()}
    h0 = SCALE // 4
    # a-pass raw: hub <- h0*3, a <- h0; sum = 4*h0 = SCALE -> div 1
    a_hub, a_a = 3 * h0, h0
    # h-pass raw: a,b,c <- a_hub; hub <- a_a; sum = 9*h0+h0 = 2.5e12
    s_h = 3 * a_hub + a_a
    div_h = max(1, s_h // SCALE)
    assert got["hub"] == (a_a // div_h, a_hub)
    assert got["a"] == (a_hub // div_h, a_a)
    assert got["b"] == (a_hub // div_h, 0)  # no in-edges: authority 0
    assert got["c"] == (a_hub // div_h, 0)


def test_hits_distributed_matches_local():
    rng = np.random.default_rng(5)
    edges = rd.from_items([
        {"subj_id": f"n{a}", "obj_id": f"n{b}"}
        for a, b in rng.integers(0, 30, size=(150, 2)) if a != b
    ]).repartition(5)
    from robokop_build_ray.stages.pagerank import hits

    local = sorted((r["id"], r["hub_units"], r["auth_units"])
                   for r in hits(edges).take_all())
    dist = sorted((r["id"], r["hub_units"], r["auth_units"])
                  for r in hits(edges, local_threshold=0,
                                n_buckets=4).take_all())
    assert local == dist  # hybrid paths bit-identical


def test_ppr_hand_values_and_zero_rank_unreachable():
    from robokop_build_ray.stages.pagerank import personalized_pagerank

    # seed set (2 smallest) = {a, b}; z is upstream of the seeds only:
    # z -> a, so z gets NO mass (teleport restricted to seeds)
    edges = rd.from_items([
        {"subj_id": "a", "obj_id": "c"},
        {"subj_id": "b", "obj_id": "c"},
        {"subj_id": "z", "obj_id": "a"},
    ])
    got = {r["id"]: r["rank_units"]
           for r in personalized_pagerank(edges, n_seeds=2,
                                          iters=1).take_all()}
    r0 = SCALE // 2
    base = (SCALE * 15 // 100) // 2
    # c <- r0 from a and r0 from b; a <- 0 from z (z rank 0)
    assert got["c"] == (85 * 2 * r0) // 100  # non-seed: no base mass
    assert got["a"] == base  # seed, no inbound mass from rank-0 z
    assert got["b"] == base
    assert got["z"] == 0  # unreachable from the seed set: exactly 0


def test_ppr_distributed_matches_local():
    rng = np.random.default_rng(13)
    edges = rd.from_items([
        {"subj_id": f"n{a}", "obj_id": f"n{b}"}
        for a, b in rng.integers(0, 30, size=(150, 2)) if a != b
    ]).repartition(5)
    from robokop_build_ray.stages.pagerank import personalized_pagerank

    local = sorted((r["id"], r["rank_units"])
                   for r in personalized_pagerank(edges).take_all())
    dist = sorted((r["id"], r["rank_units"])
                  for r in personalized_pagerank(
                      edges, local_threshold=0, n_buckets=4).take_all())
    assert local == dist  # hybrid paths bit-identical
