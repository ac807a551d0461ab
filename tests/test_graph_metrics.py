"""Graph metrics: hand-checkable triangle / Jaccard / metapath values on
tiny graphs, plus brute-force equivalence on a random graph."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import ray.data as rd

from robokop_build_ray.stages.graph_metrics import (
    kcore,
    metapath_2hop,
    neighbor_jaccard_topk,
    triangles_per_node,
)


def _edges(pairs):
    return rd.from_items([{"subj_id": a, "obj_id": b} for a, b in pairs])


def test_triangles_hand_values():
    # K4 on a,b,c,d (4 triangles, each node in 3) + pendant e + a self-loop
    # + a duplicated/reversed edge (must collapse)
    k4 = list(combinations("abcd", 2))
    ds = _edges(k4 + [("b", "a"), ("d", "e"), ("e", "e")])
    got = {r["id"]: r["n_triangles"]
           for r in triangles_per_node(ds, n_buckets=8).take_all()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_triangles_match_bruteforce_random():
    rng = np.random.default_rng(5)
    pairs = {tuple(sorted((f"n{int(a)}", f"n{int(b)}")))
             for a, b in rng.integers(0, 30, size=(150, 2)) if a != b}
    nodes = sorted({x for p in pairs for x in p})
    nbrs = {n: {b for p in pairs for b in p if n in p and b != n}
            for n in nodes}
    want = {}
    for trio in combinations(nodes, 3):
        if all(tuple(sorted(e)) in pairs for e in combinations(trio, 2)):
            for n in trio:
                want[n] = want.get(n, 0) + 1
    got = {r["id"]: r["n_triangles"]
           for r in triangles_per_node(_edges(sorted(pairs)),
                                       n_buckets=8).take_all()}
    assert got == want


def test_neighbor_jaccard_hand_values():
    # path graph a-b-c-d: (a,c) share {b}, deg 1+2 -> J=1/2; (b,d) share
    # {c} -> J=1/2 ; no other pair shares a neighbor
    ds = _edges([("a", "b"), ("b", "c"), ("c", "d")])
    rows = neighbor_jaccard_topk(ds, k=10, n_buckets=4).take_all()
    got = {(r["id_a"], r["id_b"]): (r["common"], r["jaccard"], r["rk"])
           for r in rows}
    assert got == {("a", "c"): (1, 0.5, 1), ("b", "d"): (1, 0.5, 2)}


def test_kcore_hand_values():
    # K4 (abcd) + tail d-e-f: e,f die (deg<3), then d keeps deg 3 in K4;
    # 3-core = K4 with degree 3 each
    k4 = list(combinations("abcd", 2))
    ds = _edges(k4 + [("d", "e"), ("e", "f")])
    got = {r["id"]: r["core_degree"]
           for r in kcore(ds, k=3, rounds=4, n_buckets=4).take_all()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}


def test_kcore_cascade_and_distributed_match():
    # path graph: every node degree <=2, so the 2-core of a pure path
    # cascades empty; add a cycle that survives
    path = [(f"p{i}", f"p{i+1}") for i in range(6)]
    cyc = [(f"c{i}", f"c{(i+1) % 5}") for i in range(5)]
    ds = _edges(path + cyc)
    local = sorted((r["id"], r["core_degree"])
                   for r in kcore(ds, k=2, rounds=8).take_all())
    assert local == sorted((f"c{i}", 2) for i in range(5))
    dist = sorted((r["id"], r["core_degree"])
                  for r in kcore(ds, k=2, rounds=8, local_threshold=0,
                                 n_buckets=4).take_all())
    assert local == dist  # hybrid paths bit-identical


def test_metapath_2hop_hand_values():
    # chem1 - g1 - dis1, chem1 - g2 - dis1 (2 mids), chem2 - g1 - dis1,
    # and a direct chem-dis edge (1 hop, must NOT count as 2-hop unless a
    # mid exists)
    ds = _edges([
        ("chem1", "g1"), ("g1", "dis1"),
        ("chem1", "g2"), ("g2", "dis1"),
        ("chem2", "g1"),
        ("chem2", "dis2"),
    ])
    tm = {"chem1": "chemical_substance", "chem2": "chemical_substance",
          "g1": "gene", "g2": "gene", "dis1": "disease", "dis2": "disease"}
    got = {(r["id_a"], r["id_b"]): r["n_paths"]
           for r in metapath_2hop(ds, tm, "chemical_substance", "disease",
                                  n_buckets=4).take_all()}
    # chem2-dis2 has no intermediate (direct edge only); chem1/chem2 reach
    # dis1 through g1 (and g2 for chem1)
    assert got == {("chem1", "dis1"): 2, ("chem2", "dis1"): 1}


def test_bfs_distances_hand_values():
    # star: s1 - m - far1 - far2 ; s2 isolated-in-graph via edge to m too;
    # unreachable island x-y
    from robokop_build_ray.stages.graph_metrics import bfs_distances

    ds = _edges([("s1", "m"), ("s2", "m"), ("m", "far1"),
                 ("far1", "far2"), ("x", "y")])
    tm = {"s1": "chem", "s2": "chem", "m": "gene", "far1": "gene",
          "far2": "gene", "x": "gene", "y": "gene"}
    got = {r["id"]: r["dist"]
           for r in bfs_distances(ds, tm, "chem", rounds=2,
                                  n_buckets=4).take_all()}
    # rounds=2 cap: far2 (3 hops) not reached; island never reached
    assert got == {"s1": 0, "s2": 0, "m": 1, "far1": 2}


def test_bfs_distances_distributed_matches_local():
    rng = np.random.default_rng(7)
    pairs = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, 40, size=(120, 2)) if a != b]
    tm = {f"n{i}": ("chem" if i % 7 == 0 else "gene") for i in range(40)}
    ds = _edges(pairs)
    from robokop_build_ray.stages.graph_metrics import bfs_distances

    local = sorted((r["id"], r["dist"])
                   for r in bfs_distances(ds, tm, "chem", rounds=3).take_all())
    dist = sorted((r["id"], r["dist"])
                  for r in bfs_distances(ds, tm, "chem", rounds=3,
                                         local_threshold=0,
                                         n_buckets=4).take_all())
    assert local == dist and len(local) > 0  # hybrid paths bit-identical


def test_weighted_sssp_hand_values():
    # s -(x3: wt 1)- a -(x1: wt 3)- t ; s -(x1: wt 3)- b -(x2: wt 2)- t
    # cheapest s->t = 1 + 3 = 4 through a (hop count alone would tie)
    from robokop_build_ray.stages.graph_metrics import weighted_sssp

    ds = _edges([("s", "a")] * 3 + [("a", "t"), ("s", "b")]
                + [("b", "t")] * 2)
    tm = {"s": "chem", "a": "gene", "b": "gene", "t": "disease"}
    got = {r["id"]: r["dist"]
           for r in weighted_sssp(ds, tm, "chem", rounds=4,
                                  n_buckets=4).take_all()}
    assert got == {"s": 0, "a": 1, "b": 3, "t": 4}


def test_weighted_sssp_rounds_cap_and_relaxation():
    # chain s -1- a -1- b -1- c needs 3 rounds for c; rounds=2 stops at b;
    # the direct heavy edge s -3- c must be RELAXED down once the cheap
    # 3-edge path is in range
    from robokop_build_ray.stages.graph_metrics import weighted_sssp

    chain = [("s", "a")] * 3 + [("a", "b")] * 3 + [("b", "c")] * 3
    heavy = [("s", "c")]
    tm = {"s": "chem", "a": "g", "b": "g", "c": "g"}
    capped = {r["id"]: r["dist"]
              for r in weighted_sssp(_edges(chain + heavy), tm, "chem",
                                     rounds=2, n_buckets=4).take_all()}
    assert capped == {"s": 0, "a": 1, "b": 2, "c": 3}  # via heavy edge
    full = {r["id"]: r["dist"]
            for r in weighted_sssp(_edges(chain + heavy), tm, "chem",
                                   rounds=4, n_buckets=4).take_all()}
    assert full["c"] == 3  # 3-edge path (1+1+1) ties heavy edge (3)
    assert full == {"s": 0, "a": 1, "b": 2, "c": 3}


def test_weighted_sssp_distributed_matches_local():
    rng = np.random.default_rng(11)
    pairs = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, 30, size=(200, 2)) if a != b]
    tm = {f"n{i}": ("chem" if i % 6 == 0 else "gene") for i in range(30)}
    from robokop_build_ray.stages.graph_metrics import weighted_sssp

    local = sorted((r["id"], r["dist"])
                   for r in weighted_sssp(_edges(pairs), tm, "chem",
                                          rounds=3).take_all())
    dist = sorted((r["id"], r["dist"])
                  for r in weighted_sssp(_edges(pairs), tm, "chem",
                                         rounds=3, local_threshold=0,
                                         n_buckets=4).take_all())
    assert local == dist and len(local) > 0  # hybrid paths bit-identical


def test_random_walks_match_direct_evaluation(ray_session):
    """Walks over a small hand graph must equal a direct sequential
    evaluation of the md5 next-step rule (backtracking allowed)."""
    import hashlib

    import ray.data as rd

    from robokop_build_ray.stages.graph_metrics import random_walks

    edges = [("A", "B"), ("B", "C"), ("C", "D"), ("D", "A"), ("B", "D")]
    ds = rd.from_items(
        [{"subj_id": a, "obj_id": b} for a, b in edges]).repartition(3)
    got = {(r["id"], r["walk"], r["step"]): r["node"]
           for r in random_walks(ds, n_walks=2, walk_len=3).take_all()}

    nbrs: dict[str, set] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    for start in nbrs:
        for w in range(2):
            cur = start
            assert got[(start, w, 0)] == start
            for step in (1, 2, 3):
                cur = min(nbrs[cur], key=lambda v: hashlib.md5(
                    f"{cur}|{v}|{w}|{step}".encode()).hexdigest())
                assert got[(start, w, step)] == cur, (start, w, step)
    # different walks from the same start genuinely diverge somewhere
    assert any(got[(s, 0, 1)] != got[(s, 1, 1)] for s in nbrs)


def test_label_prop_hand_values():
    # two triangles joined by one bridge edge: after round 1 every node
    # holds its triangle's min label (a / d); the bridge endpoints a,d see
    # neighbor multisets {b,c,d-side...} — hand-rolled:
    #   round1: a<-min-mode{b,c,d}=b? counts all 1 -> tie -> min = b
    # deterministic either way; the test pins the SPEC semantics by
    # comparing to an independent numpy reference below.
    from robokop_build_ray.stages.graph_metrics import label_propagation

    tri1 = [("a", "b"), ("b", "c"), ("a", "c")]
    tri2 = [("d", "e"), ("e", "f"), ("d", "f")]
    ds = _edges(tri1 + tri2 + [("c", "d")])

    def reference(pairs, rounds):
        nodes = sorted({x for p in pairs for x in p})
        nbrs = {n: sorted({b if a == n else a for a, b in pairs
                           if n in (a, b)}) for n in nodes}
        lab = {n: n for n in nodes}
        for _ in range(rounds):
            nxt = {}
            for n in nodes:
                cnt = {}
                for m in nbrs[n]:
                    cnt[lab[m]] = cnt.get(lab[m], 0) + 1
                best = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
                nxt[n] = best[0][0]
            lab = nxt
        return lab

    want = reference(tri1 + tri2 + [("c", "d")], 3)
    got = {r["id"]: r["label"]
           for r in label_propagation(ds, rounds=3, n_buckets=4).take_all()}
    assert got == want
    # the two triangles must resolve to (at most two) shared labels
    assert len(set(got.values())) <= 2


def test_label_prop_distributed_matches_local():
    rng = np.random.default_rng(11)
    pairs = sorted({tuple(sorted((f"n{int(a)}", f"n{int(b)}")))
                    for a, b in rng.integers(0, 25, size=(60, 2)) if a != b})
    from robokop_build_ray.stages.graph_metrics import label_propagation

    ds = _edges(pairs)
    local = sorted((r["id"], r["label"])
                   for r in label_propagation(ds, rounds=3).take_all())
    dist = sorted((r["id"], r["label"])
                  for r in label_propagation(
                      ds, rounds=3, local_threshold=0,
                      n_buckets=4).take_all())
    assert local == dist  # hybrid paths bit-identical


def test_harmonic_hand_values():
    # path a-b-c-d-e; all 5 nodes are seeds (n_seeds=8 > 5) so the sampled
    # estimator is exact: h12 = sum over other nodes of 12/d (rounds=4)
    from robokop_build_ray.stages.graph_metrics import harmonic_centrality

    ds = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    got = {r["id"]: (r["h12"], r["harmonic"])
           for r in harmonic_centrality(ds, n_buckets=4).take_all()}
    assert got == {"a": (25, 25 / 12), "b": (34, 34 / 12),
                   "c": (36, 3.0), "d": (34, 34 / 12), "e": (25, 25 / 12)}


def test_harmonic_sampled_seeds():
    # n_seeds=2 -> only a and b contribute (lexicographically smallest)
    from robokop_build_ray.stages.graph_metrics import harmonic_centrality

    ds = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    got = {r["id"]: r["h12"]
           for r in harmonic_centrality(ds, n_seeds=2,
                                        n_buckets=4).take_all()}
    assert got == {"a": 12, "b": 12, "c": 18, "d": 10, "e": 7}


def test_harmonic_distributed_matches_local():
    rng = np.random.default_rng(11)
    pairs = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, 40, size=(120, 2)) if a != b]
    ds = _edges(pairs)
    from robokop_build_ray.stages.graph_metrics import harmonic_centrality

    local = sorted((r["id"], r["h12"], r["harmonic"])
                   for r in harmonic_centrality(ds).take_all())
    dist = sorted((r["id"], r["h12"], r["harmonic"])
                  for r in harmonic_centrality(ds, local_threshold=0,
                                               n_buckets=4).take_all())
    # 39: one of the 40 labels is never drawn as a non-self-loop endpoint
    assert local == dist and len(local) == 39  # hybrid paths bit-identical


def test_bfs_distances_explicit_seeds():
    # seeds override skips the type derivation; unknown seed ids are
    # dropped (anchored-path contract: anchor must be in the graph)
    from robokop_build_ray.stages.graph_metrics import bfs_distances

    ds = _edges([("a", "b"), ("b", "c"), ("x", "y")])
    got = {r["id"]: r["dist"]
           for r in bfs_distances(ds, None, "", rounds=2,
                                  seeds={"a", "ghost"},
                                  n_buckets=4).take_all()}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_ktruss_hand_values():
    # K4 on abcd: every edge lies in 2 triangles -> survives k=4.
    # A lone triangle xyz (support 1 each) and a pendant edge are peeled.
    from robokop_build_ray.stages.graph_metrics import ktruss

    k4 = list(combinations("abcd", 2))
    ds = _edges(k4 + [("x", "y"), ("y", "z"), ("x", "z"), ("d", "p")])
    got = {(r["a"], r["b"]): r["support"]
           for r in ktruss(ds, k=4, rounds=3, n_buckets=4).take_all()}
    assert got == {(a, b): 2 for a, b in k4}


def test_ktruss_cascade():
    # triangle strip: peeling the weakest edge can cascade; with k=4 and
    # enough rounds a strip of single-support triangles empties entirely
    from robokop_build_ray.stages.graph_metrics import ktruss

    strip = [("n0", "n1"), ("n1", "n2"), ("n0", "n2"),
             ("n2", "n3"), ("n1", "n3")]
    got = ktruss(_edges(strip), k=4, rounds=3, n_buckets=4).take_all()
    assert got == []  # every edge has support <= 1 after first peel


def test_ktruss_distributed_matches_local():
    rng = np.random.default_rng(13)
    pairs = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, 25, size=(160, 2)) if a != b]
    from robokop_build_ray.stages.graph_metrics import ktruss

    ds = _edges(pairs)
    local = sorted((r["a"], r["b"], r["support"])
                   for r in ktruss(ds, k=4, rounds=2).take_all())
    dist = sorted((r["a"], r["b"], r["support"])
                  for r in ktruss(ds, k=4, rounds=2, local_threshold=0,
                                  n_buckets=4).take_all())
    assert local == dist and len(local) > 0  # hybrid paths bit-identical


def _brute_stress(pairs, n_seeds=8, rounds=3):
    """Independent reference: enumerate ALL shortest paths (BFS DAG + DFS)
    per (seed, target), count interior-node passages."""
    from collections import deque

    adj = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    ids = sorted(adj)
    seeds = ids[:n_seeds]
    stress = {i: 0 for i in ids}
    for s in seeds:
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= rounds:
                continue
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)

        def paths(t):
            if t == s:
                return [[s]]
            out = []
            for u in adj[t]:
                if dist.get(u, 99) == dist[t] - 1:
                    out.extend(p + [t] for p in paths(u))
            return out

        for t, d in dist.items():
            if 0 < d <= rounds:
                for p in paths(t):
                    for v in p[1:-1]:
                        stress[v] += 1
    return stress


def test_stress_hand_path_graph():
    from robokop_build_ray.stages.graph_metrics import stress_centrality

    ds = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    got = {r["id"]: r["stress"]
           for r in stress_centrality(ds, n_buckets=4).take_all()}
    # interior passages within 3 hops, all 5 nodes as sources
    assert got == {"a": 0, "b": 4, "c": 6, "d": 4, "e": 0}


def test_stress_hand_diamond_sigma():
    # diamond a-b-d / a-c-d plus tail d-e: multiple shortest paths, so
    # sigma > 1 exercises the path-COUNT (not node-count) semantics
    from robokop_build_ray.stages.graph_metrics import stress_centrality

    ds = _edges([("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"),
                 ("d", "e")])
    got = {r["id"]: r["stress"]
           for r in stress_centrality(ds, n_buckets=4).take_all()}
    assert got == {"a": 2, "b": 4, "c": 4, "d": 10, "e": 0}
    assert got == _brute_stress([("a", "b"), ("a", "c"), ("b", "d"),
                                 ("c", "d"), ("d", "e")])


def test_stress_sampled_seeds():
    from robokop_build_ray.stages.graph_metrics import stress_centrality

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    got = {r["id"]: r["stress"]
           for r in stress_centrality(_edges(pairs), n_seeds=2,
                                      n_buckets=4).take_all()}
    assert got == _brute_stress(pairs, n_seeds=2)


def test_stress_distributed_matches_local_and_brute():
    rng = np.random.default_rng(7)
    pairs = [(f"n{a:02d}", f"n{b:02d}")
             for a, b in rng.integers(0, 24, size=(60, 2)) if a != b]
    from robokop_build_ray.stages.graph_metrics import stress_centrality

    ds = _edges(pairs)
    local = sorted((r["id"], r["stress"])
                   for r in stress_centrality(ds).take_all())
    dist = sorted((r["id"], r["stress"])
                  for r in stress_centrality(ds, local_threshold=0,
                                             n_buckets=4).take_all())
    assert local == dist  # hybrid paths bit-identical
    assert dict(local) == _brute_stress(sorted(set(
        (min(a, b), max(a, b)) for a, b in pairs)))


def test_resource_allocation_hand_values():
    # star center z(deg 3) + triangle a-b: common neighbor structure:
    #   a-z, b-z, c-z, a-b  => deg z=3, a=2, b=2, c=1
    # pairs sharing a neighbor: (a,b) via z: w=Q//3; (a,c) via z: Q//3;
    # (b,c) via z: Q//3; (b,z) via a: Q//2; (a,z) via b: Q//2
    from robokop_build_ray.stages.graph_metrics import (
        resource_allocation_topk,
    )

    ds = _edges([("a", "z"), ("b", "z"), ("c", "z"), ("a", "b")])
    got = {(r["id_a"], r["id_b"]): (r["ra_q"], r["ra"])
           for r in resource_allocation_topk(ds, n_buckets=4).take_all()}
    q = 1_000_000
    assert got == {
        ("a", "b"): (q // 3, (q // 3) / q),
        ("a", "c"): (q // 3, (q // 3) / q),
        ("b", "c"): (q // 3, (q // 3) / q),
        ("a", "z"): (q // 2, (q // 2) / q),
        ("b", "z"): (q // 2, (q // 2) / q),
    }


def test_resource_allocation_topk_rank_determinism():
    from robokop_build_ray.stages.graph_metrics import (
        resource_allocation_topk,
    )

    ds = _edges([("a", "z"), ("b", "z"), ("c", "z"), ("a", "b")])
    rows = resource_allocation_topk(ds, k=3, n_buckets=4).take_all()
    assert [(r["rk"], r["id_a"], r["id_b"]) for r in rows] == [
        (1, "a", "z"), (2, "b", "z"), (3, "a", "b")]


def test_adamic_adar_hand_values():
    # same graph as the RA hand test; weights are floor(Q/ln(deg)):
    # center z deg 3 -> w3 = int(Q/ln 3); centers a,b deg 2 -> int(Q/ln 2)
    import math

    from robokop_build_ray.stages.graph_metrics import adamic_adar_topk

    ds = _edges([("a", "z"), ("b", "z"), ("c", "z"), ("a", "b")])
    got = {(r["id_a"], r["id_b"]): (r["aa_q"], r["aa"])
           for r in adamic_adar_topk(ds, n_buckets=4).take_all()}
    q = 1_000_000
    w3, w2 = int(q / math.log(3)), int(q / math.log(2))
    assert got == {
        ("a", "b"): (w3, w3 / q),
        ("a", "c"): (w3, w3 / q),
        ("b", "c"): (w3, w3 / q),
        ("a", "z"): (w2, w2 / q),
        ("b", "z"): (w2, w2 / q),
    }
    # AA ranks the deg-2-center pairs first (1/ln2 > 1/ln3), same as RA
    rows = adamic_adar_topk(ds, k=3, n_buckets=4).take_all()
    assert [(r["rk"], r["id_a"], r["id_b"]) for r in rows] == [
        (1, "a", "z"), (2, "b", "z"), (3, "a", "b")]


def test_local_bridges_hand_values():
    from robokop_build_ray.stages.graph_metrics import local_bridges

    # triangle a-b-c plus pendant edge c-d: only c-d is a local bridge
    ds = _edges([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    got = sorted((r["id_a"], r["id_b"])
                 for r in local_bridges(ds, n_buckets=4).take_all())
    assert got == [("c", "d")]
    # pure path graph: every edge is a local bridge
    ds2 = _edges([("a", "b"), ("b", "c"), ("c", "d")])
    got2 = sorted((r["id_a"], r["id_b"])
                  for r in local_bridges(ds2, n_buckets=4).take_all())
    assert got2 == [("a", "b"), ("b", "c"), ("c", "d")]


def test_distance_profile_hand_and_distributed():
    from robokop_build_ray.stages.graph_metrics import distance_profile

    # path a-b-c-d-e, all 5 as seeds: pairs at d=1: 8 (4 edges x 2 dirs),
    # d=2: 6, d=3: 4, d=4: 2
    ds = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")])
    got = {r["dist"]: r["n_pairs"]
           for r in distance_profile(ds, n_buckets=4).take_all()}
    assert got == {1: 8, 2: 6, 3: 4, 4: 2}
    dist = {r["dist"]: r["n_pairs"]
            for r in distance_profile(ds, local_threshold=0,
                                      n_buckets=4).take_all()}
    assert dist == got  # hybrid paths bit-identical


def test_mis_properties_and_hand_structure():
    # path a-b-c-d-e plus isolated-pair x-y: winners must be independent,
    # every unselected decided node must neighbor a winner
    from robokop_build_ray.stages.graph_metrics import (
        maximal_independent_set)

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")]
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = maximal_independent_set(_edges(pairs), rounds=3,
                                   n_buckets=4).take_all()
    sel = {r["id"]: r["mis_round"] for r in rows}
    # independence: no two selected nodes adjacent
    for s in sel:
        assert not (adj[s] & sel.keys())
    # exactly one of x / y wins, in round 0 (local minimum immediately)
    assert len({"x", "y"} & sel.keys()) == 1
    assert all(r >= 0 for r in sel.values())
    # maximality over decided nodes: any node NOT selected and not
    # active after 3 rounds must neighbor a winner — with 3 rounds on a
    # 5-path everything is decided
    for n in adj:
        if n not in sel:
            assert adj[n] & sel.keys(), n


def test_mis_distributed_matches_local():
    rng = np.random.default_rng(29)
    pairs = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, 40, size=(120, 2)) if a != b]
    from robokop_build_ray.stages.graph_metrics import (
        maximal_independent_set)

    ds = _edges(pairs)
    local = sorted((r["id"], r["mis_round"])
                   for r in maximal_independent_set(ds).take_all())
    dist = sorted((r["id"], r["mis_round"])
                  for r in maximal_independent_set(
                      ds, local_threshold=0, n_buckets=4).take_all())
    assert local == dist and len(local) > 0


def test_community_stats_matches_direct_recompute():
    from robokop_build_ray.stages.graph_metrics import (
        community_stats, label_propagation)

    rng = np.random.default_rng(41)
    pairs = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, 30, size=(90, 2)) if a != b]
    ds = _edges(pairs)
    lbl = {r["id"]: r["label"]
           for r in label_propagation(ds, n_buckets=4).take_all()}
    und = {tuple(sorted(p)) for p in pairs}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for n, l in lbl.items():
        w = want.setdefault(l, [0, 0, 0])
        w[0] += 1
        w[1] += len(adj[n])
    for a, b in und:
        if lbl[a] == lbl[b]:
            want[lbl[a]][2] += 1
    got = {r["label"]: [r["n_nodes"], r["degree_sum"], r["intra_edges"]]
           for r in community_stats(ds, n_buckets=4).take_all()}
    assert got == want
    assert sum(v[1] for v in got.values()) == 2 * len(und)


def test_two_hop_ball_hand_values():
    from robokop_build_ray.stages.graph_metrics import two_hop_ball

    # path a-b-c-d plus triangle chord a-c:
    #   a: {b, c, d(via c)}=3  b: {a, c, d(via c)}=3
    #   c: {a, b, d}=3         d: {c, a(via c), b(via c)}=3
    ds = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")])
    got = {r["id"]: r["ball_size"]
           for r in two_hop_ball(ds, n_buckets=4).take_all()}
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3}
    # star: center sees all leaves (1 hop); leaves see center + others
    ds2 = _edges([("z", "a"), ("z", "b"), ("z", "c")])
    got2 = {r["id"]: r["ball_size"]
            for r in two_hop_ball(ds2, n_buckets=4).take_all()}
    assert got2 == {"z": 3, "a": 3, "b": 3, "c": 3}
    # brute-force cross-check on a random graph
    rng = np.random.default_rng(43)
    pairs = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, 25, size=(60, 2)) if a != b]
    adj: dict[str, set] = {}
    for a, b in {tuple(sorted(p)) for p in pairs}:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {v: len((ns | {w for u in ns for w in adj[u]}) - {v})
            for v, ns in adj.items()}
    got3 = {r["id"]: r["ball_size"]
            for r in two_hop_ball(_edges(pairs), n_buckets=4).take_all()}
    assert got3 == want


def test_metapath_3hop_hand_values():
    from robokop_build_ray.stages.graph_metrics import metapath_3hop

    # chain A1-g1-g2-D1 plus chord g1-D1 (2-hop path A1-g1-D1 must NOT
    # count; the 3-hop A1-g1-g2-D1 does). A2-g2 adds A2-g2-g1-D1.
    tm = {"A1": "chem", "A2": "chem", "D1": "dis",
          "g1": "gene", "g2": "gene"}
    ds = _edges([("A1", "g1"), ("g1", "g2"), ("g2", "D1"),
                 ("g1", "D1"), ("A2", "g2")])
    got = {(r["id_a"], r["id_b"]): r["n_paths"]
           for r in metapath_3hop(ds, tm, "chem", "dis",
                                  n_buckets=4).take_all()}
    # A1 paths: A1-g1-g2-D1 ok; A1-g1-D1-? no (2-hop);
    # A2 paths: A2-g2-g1-D1 ok; A2-g2-D1-? d=D1 via g2? A2-g2-D1 is
    # 2-hop; 3-hop A2-g2-D1-g1 ends at gene (not dis).
    assert got == {("A1", "D1"): 1, ("A2", "D1"): 1}


def test_directed_common_topk_hand_values():
    from robokop_build_ray.stages.graph_metrics import directed_common_topk

    # m1->a, m1->b, m2->a, m2->b, a->t, b->t
    ds = _edges([("m1", "a"), ("m1", "b"), ("m2", "a"), ("m2", "b"),
                 ("a", "t"), ("b", "t")])
    co = {(r["id_a"], r["id_b"]): r["common"]
          for r in directed_common_topk(ds, "cocitation",
                                        n_buckets=4).take_all()}
    assert co == {("a", "b"): 2}  # cited together by m1 and m2
    cp = {(r["id_a"], r["id_b"]): r["common"]
          for r in directed_common_topk(ds, "coupling",
                                        n_buckets=4).take_all()}
    # coupling: pairs sharing an out-target: (a,b) via t; (m1,m2) via a,b
    assert cp == {("m1", "m2"): 2, ("a", "b"): 1}


def test_reciprocal_best_jaccard_hand_values():
    from robokop_build_ray.stages.graph_metrics import (
        reciprocal_best_jaccard,
    )

    # two 4-cycles sharing node c: within cycle a-b-c-d, (a,c) and (b,d)
    # are perfect jaccard-1 opposite pairs -> mutual best
    ds = _edges([("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")])
    got = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in reciprocal_best_jaccard(ds, n_buckets=4).take_all()}
    assert got == {("a", "c"): 1.0, ("b", "d"): 1.0}
    # star: every leaf's best is another leaf (jaccard 1 via center),
    # ties -> smallest partner: best(x)=y for all -> only (x,y) mutual?
    ds2 = _edges([("z", "x"), ("z", "y"), ("z", "w")])
    got2 = sorted(reciprocal_best_jaccard(ds2, n_buckets=4).take_all(),
                  key=lambda r: r["id_a"])
    # best(w)=x, best(x)=w, best(y)=w -> only (w, x) is mutual
    assert [(r["id_a"], r["id_b"]) for r in got2] == [("w", "x")]


def test_type_inference_hand_values():
    from robokop_build_ray.stages.graph_metrics import type_inference

    # eval node X:1 (odd) has seed neighbors A:2 (drug), B:4 (drug),
    # C:6 (gene) -> majority drug; truth drug -> correct.
    # eval node Y:3 (odd) has one seed neighbor C:6 (gene); truth drug
    # -> wrong. Z:5 has no seed neighbor (only odd W:7) -> excluded.
    tm = {"X:1": "drug", "Y:3": "drug", "Z:5": "gene",
          "A:2": "drug", "B:4": "drug", "C:6": "gene", "W:7": "gene"}
    ds = _edges([("X:1", "A:2"), ("X:1", "B:4"), ("X:1", "C:6"),
                 ("Y:3", "C:6"), ("Z:5", "W:7")])
    got = {r["node_type"]: (r["n_eval"], r["n_correct"], r["accuracy"])
           for r in type_inference(ds, tm, n_buckets=4).take_all()}
    assert got == {"drug": (2, 1, 0.5)}


def test_transitivity_hand_values():
    from robokop_build_ray.stages.graph_metrics import transitivity

    # triangle a-b-c + pendant c-d: wedges = 1+1+3+0 = 5? degs a=2,b=2,
    # c=3,d=1 -> C(2,2)... wedges = 1+1+3+0 = 5; closed = 3 (one
    # triangle counted at each corner)
    ds = _edges([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    (row,) = transitivity(ds, n_buckets=4).take_all()
    assert (row["n_wedges"], row["n_closed"]) == (5, 3)
    assert row["transitivity"] == 3.0 / 5.0


def test_mention_trend_hand_values():
    import pandas as pd

    from robokop_build_ray.stages.graph_metrics import mention_trend

    # entity A mentioned hour0 x1, hour2 x3 (rising); B hour0 x2 only
    # span H=3 (hours 0..2), Sx=3, Sxx=5, den=3*5-9=6
    tr = rd.from_items([
        {"conv_id": "c", "turn_idx": i,
         "ts": pd.Timestamp("2025-01-01") + pd.Timedelta(hours=h)}
        for i, h in enumerate([0, 0, 2, 2, 2])])
    canon = rd.from_items(
        [{"conv_id": "c", "turn_idx": 0, "subj_id": "A", "obj_id": "B"},
         {"conv_id": "c", "turn_idx": 1, "subj_id": "B", "obj_id": "A"}]
        + [{"conv_id": "c", "turn_idx": i, "subj_id": "A", "obj_id": "A"}
           for i in (2, 3)]
        + [{"conv_id": "c", "turn_idx": 4, "subj_id": "A",
            "obj_id": "A"}])
    got = {r["id"]: (r["n_mentions"], r["slope"])
           for r in mention_trend(canon, tr, n_buckets=4).take_all()}
    # A: y0=2 (two mentions hr0), y2=6 (3 self-triples = 6 endpoints)
    #    Sy=8, Sxy=12 -> slope=(3*12-3*8)/6 = 2.0
    # B: y0=2 -> Sy=2, Sxy=0 -> slope=(0-6)/6 = -1.0
    assert got["A"] == (8, 2.0)
    assert got["B"] == (2, -1.0)


def test_triad_motifs_hand_values():
    from robokop_build_ray.stages.graph_metrics import triad_motifs

    # feed-forward a->b->c with shortcut a->c, plus 3-cycle x->y->z->x
    ds = _edges([("a", "b"), ("b", "c"), ("a", "c"),
                 ("x", "y"), ("y", "z"), ("z", "x")])
    (row,) = triad_motifs(ds, n_buckets=4).take_all()
    # paths: a->b->c, x->y->z, y->z->x, z->x->y = 4
    assert row["n_paths"] == 4
    assert row["n_transitive"] == 1  # only a->b->c closes via a->c
    assert row["n_cyclic"] == 1      # one 3-cycle (3 rotations / 3)


def test_growth_trace_hand_values():
    import pandas as pd

    from robokop_build_ray.stages.graph_metrics import growth_trace

    # hour 0: triple (A,P,B) -> 2 new nodes, 1 new edge
    # hour 1: same edge again (no news) + (A,P,C) -> 1 new node, 1 edge
    tr = rd.from_items([
        {"conv_id": "c1", "turn_idx": 0,
         "ts": pd.Timestamp("2025-01-01 00:10:00")},
        {"conv_id": "c1", "turn_idx": 1,
         "ts": pd.Timestamp("2025-01-01 01:10:00")},
        {"conv_id": "c2", "turn_idx": 0,
         "ts": pd.Timestamp("2025-01-01 01:20:00")},
    ])
    canon = rd.from_items([
        {"conv_id": "c1", "turn_idx": 0,
         "subj_id": "A", "pred_id": "P", "obj_id": "B"},
        {"conv_id": "c1", "turn_idx": 1,
         "subj_id": "A", "pred_id": "P", "obj_id": "B"},
        {"conv_id": "c2", "turn_idx": 0,
         "subj_id": "A", "pred_id": "P", "obj_id": "C"},
    ])
    rows = growth_trace(canon, tr, n_buckets=4).take_all()
    h0 = int(pd.Timestamp("2025-01-01").value // 10**3
             // 3_600_000_000)
    got = {r["hour"] - h0: (r["new_nodes"], r["new_edges"],
                            r["cum_nodes"], r["cum_edges"]) for r in rows}
    assert got == {0: (2, 1, 2, 1), 1: (1, 1, 3, 2)}


def test_rich_club_hand_values():
    from robokop_build_ray.stages.graph_metrics import rich_club

    # triangle a-b-c (all deg 2) + pendant c-d (d deg 1, c deg 3)
    ds = _edges([("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    rows = {r["k"]: (r["n_nodes"], r["n_edges"], r["phi"])
            for r in rich_club(ds, n_buckets=4).take_all()}
    # k=0: all 4 nodes, 4 edges -> 8/12; k=1: {a,b,c} deg>1, 3 edges -> 1.0
    # k=2: {c} only -> filtered (club < 2)
    assert rows == {0: (4, 4, float(8) / float(12)), 1: (3, 3, 1.0)}


def test_powerlaw_alpha_hand_values():
    import math

    from robokop_build_ray.stages.graph_metrics import powerlaw_alpha

    # star z-(a,b,c): degrees z=3, a=b=c=1 -> lnsum = floor(Q ln 3)
    ds = _edges([("z", "a"), ("z", "b"), ("z", "c")])
    (row,) = powerlaw_alpha(ds, n_buckets=4).take_all()
    q = 1_000_000
    s = int(q * math.log(3))
    assert (row["n_nodes"], row["deg_max"], row["lnsum_q"]) == (4, 3, s)
    assert row["alpha"] == 1.0 + float(q * 4) / float(s)
    # degenerate matching graph (all degree 1): alpha = 0.0 guard
    (row2,) = powerlaw_alpha(_edges([("a", "b"), ("c", "d")]),
                             n_buckets=4).take_all()
    assert row2["lnsum_q"] == 0 and row2["alpha"] == 0.0


def test_modularity_summary_matches_stats_fold():
    from robokop_build_ray.stages.graph_metrics import (
        community_stats, modularity_summary)

    rng = np.random.default_rng(41)
    pairs = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, 30, size=(90, 2)) if a != b]
    ds = _edges(pairs)
    stats = community_stats(ds, n_buckets=4).take_all()
    m = sum(r["degree_sum"] for r in stats) // 2
    intra = sum(r["intra_edges"] for r in stats)
    dss = sum(r["degree_sum"] ** 2 for r in stats)
    (row,) = modularity_summary(ds, n_buckets=4).take_all()
    assert row["n_communities"] == len(stats)
    assert row["n_edges"] == m
    assert row["intra_edges"] == intra
    assert row["deg_sq_sum"] == dss
    assert row["modularity"] == float(4 * m * intra - dss) / float(
        4 * m * m)
    assert -0.5 <= row["modularity"] <= 1.0


def test_bfs_tree_parents_reconstruct_shortest_paths():
    from robokop_build_ray.stages.graph_metrics import bfs_tree

    pairs = [("s1", "a"), ("s1", "b"), ("a", "c"), ("b", "c"),
             ("c", "d"), ("x", "y")]
    tm = {n: ("seed" if n == "s1" else "other")
          for n in "s1 a b c d x y".split()}
    rows = {r["id"]: (r["dist"], r["parent"])
            for r in bfs_tree(_edges(pairs), tm, "seed",
                              n_buckets=4).take_all()}
    assert rows["s1"] == (0, "")
    assert rows["a"] == (1, "s1") and rows["b"] == (1, "s1")
    assert rows["c"] == (2, "a")  # min-parent rule: a < b
    assert rows["d"] == (3, "c")
    assert "x" not in rows and "y" not in rows  # unreachable component
    # every non-seed parent is exactly one hop closer
    for n, (d, p) in rows.items():
        if d > 0:
            assert rows[p][0] == d - 1


def test_scc_labels_cycle_vs_dag():
    from robokop_build_ray.stages.graph_metrics import scc_labels

    # a->b->c->a is a 3-cycle (one SCC); d->e is a DAG tail
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"), ("d", "e")]
    rows = {r["id"]: (r["fwd_label"], r["bwd_label"], r["settled"])
            for r in scc_labels(_edges(pairs), rounds=4,
                                n_buckets=4).take_all()}
    # cycle members all see 'a' both ways -> settled, same root
    for n in "abc":
        assert rows[n] == ("a", "a", True)
    # DAG nodes: fwd sees the cycle min, bwd only themselves
    assert rows["d"][0] == "a" and rows["d"][1] == "d"
    assert not rows["d"][2] and not rows["e"][2]


def test_scc_labels_distributed_matches_local():
    rng = np.random.default_rng(53)
    pairs = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, 30, size=(100, 2)) if a != b]
    from robokop_build_ray.stages.graph_metrics import scc_labels

    ds = _edges(pairs)
    local = sorted((r["id"], r["fwd_label"], r["bwd_label"])
                   for r in scc_labels(ds).take_all())
    dist = sorted((r["id"], r["fwd_label"], r["bwd_label"])
                  for r in scc_labels(ds, local_threshold=0,
                                      n_buckets=4).take_all())
    assert local == dist and len(local) > 0


def test_topo_levels_dag_and_cycle():
    from robokop_build_ray.stages.graph_metrics import topo_levels

    # chain a->b->c->d (levels 0,1,2,3) + 2-cycle x<->y (both climb to R)
    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y"), ("y", "x")]
    got = {r["id"]: r["level"]
           for r in topo_levels(_edges(pairs), rounds=3,
                                n_buckets=4).take_all()}
    assert got == {"a": 0, "b": 1, "c": 2, "d": 3, "x": 3, "y": 3}
    ds = _edges(pairs)
    dist = {r["id"]: r["level"]
            for r in topo_levels(ds, rounds=3, local_threshold=0,
                                 n_buckets=4).take_all()}
    assert dist == got


def test_matching_properties_and_hand_structure():
    # path a-b-c-d-e plus isolated pair x-y: winners must be node-disjoint
    # (a matching), x-y must match immediately, and after 3 rounds the
    # matching is maximal — every unmatched edge touches a matched node
    from robokop_build_ray.stages.graph_metrics import maximal_matching

    pairs = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")]
    rows = maximal_matching(_edges(pairs), rounds=3, n_buckets=4).take_all()
    got = {(r["a"], r["b"]): r["match_round"] for r in rows}
    nodes: list[str] = []
    for a, b in got:
        nodes.extend([a, b])
    assert len(nodes) == len(set(nodes))  # node-disjoint
    assert got[("x", "y")] == 0           # no competition -> round 0
    matched = set(nodes)
    for a, b in pairs:                    # maximality
        if (a, b) not in got:
            assert a in matched or b in matched, (a, b)


def test_coloring_proper_and_classes_disjoint():
    # colors of adjacent nodes must differ; each round's class is an
    # independent set; a triangle needs >= 3 colors (with 4 rounds all
    # three nodes of K3 plus the pendant get colored)
    from robokop_build_ray.stages.graph_metrics import greedy_coloring

    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
    rows = greedy_coloring(_edges(pairs), rounds=4, n_buckets=4).take_all()
    col = {r["id"]: r["color"] for r in rows}
    assert set(col) == {"a", "b", "c", "d"}
    for a, b in pairs:
        assert col[a] != col[b], (a, b)
    assert len({col["a"], col["b"], col["c"]}) == 3  # triangle


def test_coloring_distributed_matches_local():
    rng = np.random.default_rng(37)
    pairs = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, 40, size=(120, 2)) if a != b]
    from robokop_build_ray.stages.graph_metrics import greedy_coloring

    ds = _edges(pairs)
    local = sorted((r["id"], r["color"])
                   for r in greedy_coloring(ds).take_all())
    dist = sorted((r["id"], r["color"])
                  for r in greedy_coloring(
                      ds, local_threshold=0, n_buckets=4).take_all())
    assert local == dist and len(local) > 0


def test_matching_distributed_matches_local():
    rng = np.random.default_rng(31)
    pairs = [(f"n{a}", f"n{b}")
             for a, b in rng.integers(0, 40, size=(120, 2)) if a != b]
    from robokop_build_ray.stages.graph_metrics import maximal_matching

    ds = _edges(pairs)
    local = sorted((r["a"], r["b"], r["match_round"])
                   for r in maximal_matching(ds).take_all())
    dist = sorted((r["a"], r["b"], r["match_round"])
                  for r in maximal_matching(
                      ds, local_threshold=0, n_buckets=4).take_all())
    assert local == dist and len(local) > 0


def test_sgns_embeddings_partition_invariant_and_learns():
    """The quantized-gradient scheme must be bit-identical at any input
    partitioning, and on two loosely-bridged cliques the trained dots of
    within-clique skip-gram positives should exceed cross-clique ones."""
    from robokop_build_ray.stages.embedding_train import (
        DIM, Q, sgns_embeddings)

    cl1 = list(combinations(["a1", "a2", "a3", "a4"], 2))
    cl2 = list(combinations(["b1", "b2", "b3", "b4"], 2))
    pairs = cl1 + cl2 + [("a1", "b1")]
    one = sorted(tuple(r.values())
                 for r in sgns_embeddings(_edges(pairs)).take_all())
    many = sorted(tuple(r.values())
                  for r in sgns_embeddings(
                      _edges(pairs).repartition(7)).take_all())
    assert one == many and len(one) == 8
    emb = {r[0]: np.array(r[1:], dtype=np.int64) for r in one}
    assert all(len(v) == DIM for v in emb.values())
    # in-test sequential fit over the SAME labeled table: the engine must
    # reproduce it bit-for-bit, and full-batch GD must DESCEND the BCE
    from robokop_build_ray.stages.embedding_train import (
        C_SALTS, SGNS_ITERS, SGNS_LR, W_SALTS, _fixed_order_dot,
        _labeled_pairs, init_matrix)

    lab = _labeled_pairs(_edges(pairs), 2, 3, 2, 2).to_pandas()
    uni = np.array(sorted(emb), dtype=object)
    n = len(uni)
    ci = np.searchsorted(uni, lab["center"].to_numpy(dtype=object))
    xi = np.searchsorted(uni, lab["ctx"].to_numpy(dtype=object))
    y = lab["y"].to_numpy(dtype=np.float64)

    def bce(W, C):
        p = 1.0 / (1.0 + np.exp(-_fixed_order_dot(W, C, ci, xi)))
        return -np.mean(y * np.log(p) + (1 - y) * np.log(1 - p))

    W, C = init_matrix(n, W_SALTS), init_matrix(n, C_SALTS)
    loss0 = bce(W, C)
    for _ in range(SGNS_ITERS):
        err = 1.0 / (1.0 + np.exp(-_fixed_order_dot(W, C, ci, xi))) - y
        gW = np.zeros((n, DIM), dtype=np.int64)
        gC = np.zeros((n, DIM), dtype=np.int64)
        for j in range(DIM):
            np.add.at(gW[:, j], ci, np.floor(err * C[xi, j] * Q)
                      .astype(np.int64))
            np.add.at(gC[:, j], xi, np.floor(err * W[ci, j] * Q)
                      .astype(np.int64))
        W = W - SGNS_LR * (gW / Q) / len(y)
        C = C - SGNS_LR * (gC / Q) / len(y)
    assert bce(W, C) < loss0
    seq_q = np.floor(W * Q).astype(np.int64)
    got_q = np.stack([emb[u] for u in uni])
    assert np.array_equal(seq_q, got_q)
