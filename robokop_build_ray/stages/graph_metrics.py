"""Distributed graph metrics over the built KG edge list.

Third member of the graph-analytics family next to ``components``
(min-label propagation) and ``pagerank`` (fixed-point rank): structural
metrics the reference defers to its neo4j sink (graph queries over builder
output — `builder/builder.py:497-521` run() ships edges to a graph DB and
answers path/centrality questions there). Engine-native equivalents:

- :func:`triangles_per_node` — exact triangle participation counts via
  degree-ordered wedge generation + one bucketed edge-membership join.
- :func:`neighbor_jaccard_topk` — common-neighbor Jaccard link prediction
  (chemotext2-style "how similar are two entities" rephrased structurally,
  `builder/userquery.py` similarity semantics at graph grain).
- :func:`metapath_2hop` — typed 2-hop path counts (the Path-DSL's
  ``S(1-2)D`` two-hop leg, `builder/lookup_utils.py` type dispatch).

Scale shape: every corpus-scale exchange is a bucketed salted shuffle
(``functions/bucketing``); the only driver-sized state is the per-entity
degree map (entity-bounded — the gazetteer universe, same bound as the
canonicalization closure broadcast). Wedge generation from a center node is
O(deg^2): triangles bound it by degree-ordered orientation (each edge
points low-degree -> high-degree, so per-center work is out-degree^2, the
classic distributed-triangle bound); the Jaccard pass needs TRUE common
-neighbor counts so its wedge fan-out is inherent — cap with
``max_center_degree`` (hubs above the cap are skipped and logged, the
standard approximation in link-prediction at scale; None = exact for the
oracle-checked tier).

Determinism: all counts are int64; jaccard is ONE float64 division of two
exact integers (repo float invariant), bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from ..functions.bucketing import (
    bucketed_apply,
    bucketed_attach,
    bucketed_count,
    bucketed_distinct,
    bucketed_group_pairs,
    bucketed_min,
    coalesced_count,
)

_SEP = "\x1f"  # key-join separator (never appears in CURIEs)


def undirected_pairs(edges, src: str = "subj_id", dst: str = "obj_id",
                     n_buckets: int = 64):
    """Distinct undirected (a < b) endpoint pairs, self-loops dropped —
    the simple-graph view of the deduped edge table (pred multiplicity
    collapses)."""

    def canon(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t[src].combine_chunks().cast(pa.string())
        o = t[dst].combine_chunks().cast(pa.string())
        lo = pc.min_element_wise(s, o)
        hi = pc.max_element_wise(s, o)
        keep = pc.not_equal(lo, hi)
        return pa.table({"a": lo.filter(keep), "b": hi.filter(keep)})

    return bucketed_distinct(
        edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"],
        n_buckets)


def _adjacency(und):
    """Both directions of the undirected pair table: one row per
    (node, distinct neighbor)."""

    def both(t: pa.Table) -> pa.Table:
        a = t["a"].combine_chunks().cast(pa.string())
        b = t["b"].combine_chunks().cast(pa.string())
        return pa.table({"id": pa.concat_arrays([a, b]),
                         "nb": pa.concat_arrays([b, a])})

    return und.map_batches(both, batch_format="pyarrow")


def degree_map(und, coalesce: int = 16) -> dict[str, int]:
    """Driver-side distinct-neighbor degree dict. Entity-bounded (the
    canonical id universe is the gazetteer's, the same bound the
    canonicalization broadcast already relies on); collected from the
    COALESCED partial counts, never from a corpus-scale stream."""
    parts = coalesced_count(_adjacency(und), ["id"], name="deg",
                            coalesce=coalesce)
    frames = list(parts.iter_batches(batch_format="pandas", batch_size=None))
    if not frames:
        return {}
    df = pd.concat(frames, ignore_index=True)
    return df.groupby("id", sort=False)["deg"].sum().to_dict()


def triangles_per_node(edges, src: str = "subj_id", dst: str = "obj_id",
                       n_buckets: int = 64):
    """Exact per-node triangle counts: Dataset(id, n_triangles), one row
    per node in >= 1 triangle.

    Degree-ordered orientation (edge points to the (deg, id)-larger
    endpoint) makes the orientation acyclic, so each triangle is generated
    exactly once — as the wedge of its (deg, id)-minimal vertex — and
    per-center wedge work is out-degree^2 (bounded even at hub nodes)."""
    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    deg_ref = ray.put(degree_map(und))

    class Orient:
        """Degree map deserialized ONCE per actor, not per batch."""

        def __init__(self):
            self.deg = ray.get(deg_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame({"id": pd.Series([], dtype=object),
                                     "nb": pd.Series([], dtype=object)})
            da = b["a"].map(self.deg).to_numpy(np.int64)
            db = b["b"].map(self.deg).to_numpy(np.int64)
            # a < b lexicographically, so (deg, id) order reduces to deg
            # comparison with the lexicographic tiebreak already encoded
            a_first = (da < db) | (da == db)
            return pd.DataFrame({
                "id": np.where(a_first, b["a"], b["b"]),
                "nb": np.where(a_first, b["b"], b["a"]),
            })

    oriented = und.map_batches(Orient, batch_format="pandas",
                               concurrency=(1, 4))

    def wedge_fn(sub: pd.DataFrame) -> pd.DataFrame:
        nbs = np.sort(sub["nb"].to_numpy(dtype=object))
        if len(nbs) < 2:
            return pd.DataFrame({"mid": pd.Series([], dtype=object),
                                 "_kk": pd.Series([], dtype=object)})
        i, j = np.triu_indices(len(nbs), k=1)
        x, y = nbs[i], nbs[j]
        lo = np.minimum(x, y)
        hi = np.maximum(x, y)
        return pd.DataFrame({"mid": sub["id"].iloc[0],
                             "_kk": lo + _SEP + hi})

    wedges = bucketed_group_pairs(oriented, ["id"], wedge_fn, n_buckets)

    def key_edges(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"_kk": b["a"] + _SEP + b["b"],
                             "hit": np.ones(len(b), dtype=np.int64)})

    closed = bucketed_attach(
        wedges, und.map_batches(key_edges, batch_format="pandas"),
        left_on="_kk", right_on="_kk", left_cols=["mid", "_kk"],
        payload={"hit": "hit"}, n_buckets=n_buckets,
        payload_fill=np.int64(0))

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"id": pd.Series([], dtype=object)})
        xy = b["_kk"].str.split(_SEP, expand=True)
        return pd.DataFrame({"id": np.concatenate([
            b["mid"].to_numpy(dtype=object),
            xy[0].to_numpy(dtype=object),
            xy[1].to_numpy(dtype=object)])})

    tri_ids = closed.map_batches(explode, batch_format="pandas")
    counts = bucketed_count(tri_ids, ["id"], name="n_triangles",
                            n_buckets=min(n_buckets, 16))
    return counts.map_batches(
        lambda b: pd.DataFrame({"id": b["id"],
                                "n_triangles": b["n_triangles"].astype("int64")}),
        batch_format="pandas")


def neighbor_jaccard_topk(edges, src: str = "subj_id", dst: str = "obj_id",
                          k: int = 50, n_buckets: int = 64,
                          max_center_degree: int | None = None):
    """Top-k entity pairs by neighborhood Jaccard |N(a) ∩ N(b)| /
    |N(a) ∪ N(b)| over pairs sharing >= 1 common neighbor:
    Dataset(rk, id_a, id_b, jaccard). Pairs need not be directly connected
    (link-prediction semantics)."""
    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    deg = degree_map(und)
    deg_ref = ray.put(deg)

    def wedge_fn(sub: pd.DataFrame) -> pd.DataFrame:
        nbs = np.sort(sub["nb"].to_numpy(dtype=object))
        if len(nbs) < 2 or (max_center_degree is not None
                            and len(nbs) > max_center_degree):
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object)})
        i, j = np.triu_indices(len(nbs), k=1)
        return pd.DataFrame({"id_a": nbs[i], "id_b": nbs[j]})

    common = bucketed_count(
        bucketed_group_pairs(_adjacency(und), ["id"], wedge_fn, n_buckets),
        ["id_a", "id_b"], name="common", n_buckets=n_buckets)

    by, asc = ["jaccard", "id_a", "id_b"], [False, True, True]

    class Score:
        """Degree map deserialized ONCE per actor, not per batch."""

        def __init__(self):
            self.deg = ray.get(deg_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return pd.DataFrame(
                    {"id_a": pd.Series([], dtype=object),
                     "id_b": pd.Series([], dtype=object),
                     "common": pd.Series([], dtype="int64"),
                     "jaccard": pd.Series([], dtype="float64")})
            c = b["common"].to_numpy(np.int64)
            da = b["id_a"].map(self.deg).to_numpy(np.int64)
            db = b["id_b"].map(self.deg).to_numpy(np.int64)
            out = b[["id_a", "id_b"]].copy()
            out["common"] = c
            # ONE division of exact ints (repo float invariant)
            out["jaccard"] = c / (da + db - c)
            return out.sort_values(by, ascending=asc,
                                   kind="mergesort").head(k)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(by, ascending=asc, kind="mergesort").head(k)
        b = b.reset_index(drop=True)
        b["rk"] = np.arange(1, len(b) + 1)
        return b[["rk", "id_a", "id_b", "common", "jaccard"]]

    return (common.map_batches(Score, batch_format="pandas",
                               concurrency=(1, 4))
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def degree_topk(edges, k: int = 20, src: str = "subj_id",
                dst: str = "obj_id", n_buckets: int = 64):
    """Undirected distinct-neighbor degree per entity, global top-k ->
    Dataset(rk, id, degree) — the hub census of the built graph. One
    id-bucketed exchange (dedup + count fused per bucket), per-bucket
    top-k, tiny final cut."""

    def both_dirs(t: pa.Table) -> pa.Table:
        s = t[src].combine_chunks().cast(pa.string())
        o = t[dst].combine_chunks().cast(pa.string())
        return pa.table({"id": pa.concat_arrays([s, o]),
                         "nb": pa.concat_arrays([o, s])})

    by, asc = ["degree", "id"], [False, True]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["id", "nb"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        d = (g.drop_duplicates(["id", "nb"]).groupby("id", sort=False)
             .size().rename("degree").reset_index())
        return d.sort_values(by, ascending=asc, kind="mergesort").head(k)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(by, ascending=asc, kind="mergesort").head(k)
        b = b.reset_index(drop=True)
        b["rk"] = np.arange(1, len(b) + 1)
        b["degree"] = b["degree"].astype("int64")
        return b[["rk", "id", "degree"]]

    from ..functions.bucketing import bucketed_apply

    return (
        bucketed_apply(edges.map_batches(both_dirs, batch_format="pyarrow"),
                       ["id"], merge, partial, n_buckets)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


KCORE_K = 30
KCORE_ROUNDS = 8


def _local_kcore(und, k: int, rounds: int):
    """Driver numpy peeling for an edge list under the gate — identical
    round semantics to the distributed path and the SQL oracle."""
    import ray.data as rd

    frames = list(und.iter_batches(batch_format="pandas", batch_size=65536))
    df = (pd.concat(frames, ignore_index=True) if frames
          else pd.DataFrame({"a": [], "b": []}))
    nodes = np.unique(np.concatenate([df["a"].to_numpy(dtype=object),
                                      df["b"].to_numpy(dtype=object)]))
    n = len(nodes)
    empty = pa.table({"id": pa.array([], pa.string()),
                      "core_degree": pa.array([], pa.int64())})
    if n == 0:
        return rd.from_arrow(empty)
    ai = np.searchsorted(nodes, df["a"].to_numpy(dtype=object))
    bi = np.searchsorted(nodes, df["b"].to_numpy(dtype=object))
    alive = np.ones(n, dtype=bool)
    for _ in range(rounds):
        em = alive[ai] & alive[bi]
        deg = (np.bincount(ai[em], minlength=n)
               + np.bincount(bi[em], minlength=n))
        alive = deg >= k
    em = alive[ai] & alive[bi]
    deg = (np.bincount(ai[em], minlength=n)
           + np.bincount(bi[em], minlength=n)).astype(np.int64)
    out = deg >= 1
    if not out.any():
        return rd.from_arrow(empty)
    return rd.from_arrow(pa.table({
        "id": pa.array(nodes[out], pa.string()),
        "core_degree": pa.array(deg[out], pa.int64()),
    }))


def kcore(edges, k: int = KCORE_K, rounds: int = KCORE_ROUNDS,
          src: str = "subj_id", dst: str = "obj_id", n_buckets: int = 64,
          local_threshold: int = 1_000_000):
    """Fixed-round k-core peeling over the undirected simple graph:
    Dataset(id, core_degree) for nodes still carrying an edge after
    ``rounds`` rounds of "drop every node whose current degree < k".

    ``rounds`` is a spec constant (like ``PAGERANK_ITERS``): both engine
    paths and the SQL oracle unroll exactly this many peels, so results
    are bit-identical whether or not the peeling has converged. Hybrid
    scale shape (same gate as components/pagerank): under the edge gate
    the loop is one driver numpy pass; above it, each round is one
    coalesced degree count (entity-bounded) + one broadcast-filtered edge
    pass — the corpus-scale edge list never leaves the cluster."""
    import ray.data as rd

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    if und.count() <= local_threshold:
        return _local_kcore(und, k, rounds)

    # ---- distributed path (pinned by tests with local_threshold=0) ----
    e = und
    for _ in range(rounds):
        degs = degree_map(e)
        keep_ref = ray.put({i for i, d in degs.items() if d >= k})

        def filt(b: pd.DataFrame, _ref=keep_ref) -> pd.DataFrame:
            s = ray.get(_ref)
            m = b["a"].isin(s).to_numpy() & b["b"].isin(s).to_numpy()
            return b[m]

        e = e.map_batches(filt, batch_format="pandas").materialize()
    final = degree_map(e)
    if not final:
        return rd.from_arrow(pa.table({
            "id": pa.array([], pa.string()),
            "core_degree": pa.array([], pa.int64())}))
    ids = sorted(final)
    return rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.string()),
        "core_degree": pa.array([int(final[i]) for i in ids], pa.int64()),
    }))


def metapath_2hop(edges, type_map: dict[str, str], type_a: str, type_b: str,
                  src: str = "subj_id", dst: str = "obj_id",
                  n_buckets: int = 64):
    """Typed 2-hop path counts over the undirected simple graph:
    Dataset(id_a, id_b, n_paths) where id_a has node type ``type_a``, id_b
    has ``type_b``, and n_paths = number of distinct intermediate nodes —
    the Path-DSL's two-hop leg (``S(1-2)D``) made queryable. ``type_map``
    is the gazetteer's curie -> node_type dict (lexicon-bounded
    broadcast)."""
    und = undirected_pairs(edges, src, dst, n_buckets)
    types_ref = ray.put(type_map)

    def pair_fn(sub: pd.DataFrame) -> pd.DataFrame:
        tm = ray.get(types_ref)
        nbs = sub["nb"].to_numpy(dtype=object)
        kinds = np.array([tm.get(x, "") for x in nbs], dtype=object)
        aa = nbs[kinds == type_a]
        bb = nbs[kinds == type_b]
        if len(aa) == 0 or len(bb) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object)})
        return pd.DataFrame({"id_a": np.repeat(aa, len(bb)),
                             "id_b": np.tile(bb, len(aa))})

    pairs = bucketed_group_pairs(_adjacency(und), ["id"], pair_fn, n_buckets)
    counts = bucketed_count(pairs, ["id_a", "id_b"], name="n_paths",
                            n_buckets=n_buckets)
    return counts.map_batches(
        lambda b: pd.DataFrame({"id_a": b["id_a"], "id_b": b["id_b"],
                                "n_paths": b["n_paths"].astype("int64")}),
        batch_format="pandas")


# -------------------------------------------------------- BFS distances

BFS_ROUNDS = 4


def _local_bfs(und, seeds: set[str], rounds: int):
    """Driver numpy BFS for an edge list under the gate — identical
    round semantics to the distributed path and the SQL oracle."""
    frames = list(und.iter_batches(batch_format="pandas", batch_size=65536))
    df = (pd.concat(frames, ignore_index=True) if frames
          else pd.DataFrame({"a": [], "b": []}))
    dist: dict[str, int] = {s: 0 for s in seeds}
    frontier = set(seeds)
    a = df["a"].to_numpy(dtype=object)
    b = df["b"].to_numpy(dtype=object)
    for r in range(1, rounds + 1):
        if not frontier:
            break
        in_f = np.fromiter((x in frontier for x in a), bool, len(a))
        in_b = np.fromiter((x in frontier for x in b), bool, len(b))
        reached = set(b[in_f]) | set(a[in_b])
        frontier = {x for x in reached if x not in dist}
        for x in frontier:
            dist[x] = r
    return _dist_table(dist)


def _dist_table(dist: dict[str, int]):
    import ray.data as rd

    ids = sorted(dist)
    return rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.string()),
        "dist": pa.array([dist[i] for i in ids], pa.int64()),
    }))


def bfs_distances(edges, type_map: dict[str, str] | None, seed_type: str,
                  rounds: int = BFS_ROUNDS,
                  src: str = "subj_id", dst: str = "obj_id",
                  n_buckets: int = 64, local_threshold: int = 1_000_000,
                  seeds: set[str] | None = None):
    """Multi-source BFS hop distances over the undirected simple graph:
    Dataset(id, dist) for every node within ``rounds`` hops of any node
    whose gazetteer type is ``seed_type`` (graph-reachability analytics the
    reference defers to its neo4j sink's shortest-path queries,
    `builder/userquery.py` path semantics at graph grain).

    Seeds are the graph nodes (edge endpoints) of the given type; ``rounds``
    is a spec constant both engine paths and the SQL oracle unroll, so the
    output is bit-identical whether or not the frontier has emptied.

    Scale shape (same hybrid gate as kcore/components): under the gate the
    whole BFS is one driver numpy pass; above it each round broadcasts the
    frontier (node-bounded — the same gazetteer-universe bound as the
    canonicalization closure) and runs ONE vectorized membership pass over
    the adjacency plus one coalesced distinct, so the corpus-scale edge
    list never leaves the cluster and per-round exchange size is bounded
    by the new frontier, not the graph."""
    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    node_deg = degree_map(und)  # node-bounded (gazetteer universe)
    if seeds is None:
        seeds = {i for i in node_deg if type_map.get(i) == seed_type}
    else:
        seeds = {s for s in seeds if s in node_deg}
    if und.count() <= local_threshold:
        return _local_bfs(und, seeds, rounds)

    # ---- distributed path (pinned by tests with local_threshold=0) ----
    adj = _adjacency(und).materialize()
    dist: dict[str, int] = {s: 0 for s in seeds}
    for r in range(1, rounds + 1):
        if not dist:
            break
        frontier_ref = ray.put({i for i, d in dist.items() if d == r - 1})

        def expand(batch: pd.DataFrame, _ref=frontier_ref) -> pd.DataFrame:
            fr = ray.get(_ref)
            m = batch["id"].isin(fr).to_numpy()
            return pd.DataFrame({"nb": batch["nb"].to_numpy()[m]})

        reached = bucketed_distinct(
            adj.map_batches(expand, batch_format="pandas"), ["nb"],
            n_buckets)
        for row in reached.take_all():  # new-frontier-bounded, not corpus
            if row["nb"] not in dist:
                dist[row["nb"]] = r
    return _dist_table(dist)


# --------------------------------------------------- weighted shortest paths

SSSP_ROUNDS = 4


def _mention_weight(m: np.ndarray) -> np.ndarray:
    """Evidence-discounted edge weight — SPEC shared with the SQL oracle:
    pairs co-mentioned >= 3 times cost 1, twice cost 2, once cost 3 (a
    strongly-evidenced association is a 'shorter' semantic hop)."""
    return np.where(m >= 3, 1, np.where(m == 2, 2, 3)).astype(np.int64)


def weighted_sssp(canonical, type_map: dict[str, str], seed_type: str,
                  rounds: int = SSSP_ROUNDS,
                  src: str = "subj_id", dst: str = "obj_id",
                  n_buckets: int = 64, local_threshold: int = 1_000_000):
    """Multi-source WEIGHTED shortest paths (Bellman-Ford, ``rounds``
    relaxation rounds) over the mention-weighted undirected KG ->
    Dataset(id, dist): min total weight over any path of <= ``rounds``
    edges from a ``seed_type`` node. The weighted sibling of
    :func:`bfs_distances` (hop counts treat a once-mentioned pair and a
    thousand-times pair alike; evidence weighting is what the reference's
    support scores exist for, `builder/builder.py:364-370`).

    ``rounds`` is a SPEC constant all three paths (local, distributed,
    SQL recursive-CTE) unroll identically: after R rounds every dist is
    exactly min over <= R-edge paths, so outputs are bit-identical at any
    parallelism whether or not relaxation has converged.

    Scale shape: per-pair mention counts fold in ONE bucketed exchange
    over the canonical triple stream (the corpus-scale pass). Under the
    gate the relaxation itself is one driver pandas loop; above it each
    round broadcasts the dist dict (node-bounded — the gazetteer-universe
    bound every KG broadcast here relies on), emits tentative distances
    in a vectorized adjacency pass, and folds them with one bucketed min
    per round — exchange size is bounded by the reached node set, never
    the corpus."""
    from ..functions.bucketing import bucketed_count, bucketed_min

    def canon_pairs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t[src].combine_chunks().cast(pa.string())
        o = t[dst].combine_chunks().cast(pa.string())
        lo = pc.min_element_wise(s, o)
        hi = pc.max_element_wise(s, o)
        keep = pc.not_equal(lo, hi)
        return pa.table({"a": lo.filter(keep), "b": hi.filter(keep)})

    mentions = bucketed_count(
        canonical.map_batches(canon_pairs, batch_format="pyarrow"),
        ["a", "b"], name="m", n_buckets=n_buckets)

    def weigh(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "a": b["a"], "b": b["b"],
            "wt": _mention_weight(b["m"].to_numpy(dtype=np.int64))})

    wund = mentions.map_batches(weigh, batch_format="pandas").materialize()
    node_deg = degree_map(wund)  # node-bounded (gazetteer universe)
    seeds = {i for i in node_deg if type_map.get(i) == seed_type}

    if wund.count() <= local_threshold:
        frames = list(wund.iter_batches(batch_format="pandas",
                                        batch_size=65536))
        df = (pd.concat(frames, ignore_index=True) if frames
              else pd.DataFrame({"a": [], "b": [], "wt": []}))
        adj = pd.concat([
            df.rename(columns={"a": "id", "b": "nb"}),
            df.rename(columns={"b": "id", "a": "nb"}),
        ], ignore_index=True)[["id", "nb", "wt"]]
        dist: dict[str, int] = {s: 0 for s in seeds}
        for _ in range(rounds):
            if not dist:
                break
            cur = pd.Series(dist, name="d")
            j = adj.merge(cur, left_on="id", right_index=True)
            cand = (j.assign(nd=j["d"] + j["wt"])
                    .groupby("nb", sort=False)["nd"].min())
            for node, nd in cand.items():
                if node not in dist or nd < dist[node]:
                    dist[node] = int(nd)
        return _dist_table(dist)

    # ---- distributed path (pinned by tests with local_threshold=0) ----
    def wadj(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "id": np.concatenate([b["a"].to_numpy(dtype=object),
                                  b["b"].to_numpy(dtype=object)]),
            "nb": np.concatenate([b["b"].to_numpy(dtype=object),
                                  b["a"].to_numpy(dtype=object)]),
            "wt": np.concatenate([b["wt"].to_numpy()] * 2),
        })

    adj_ds = wund.map_batches(wadj, batch_format="pandas").materialize()
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        if not dist:
            break
        dist_ref = ray.put(dict(dist))

        def relax(batch: pd.DataFrame, _ref=dist_ref) -> pd.DataFrame:
            d = ray.get(_ref)
            cur = batch["id"].map(d)
            m = cur.notna().to_numpy()
            return pd.DataFrame({
                "nb": batch["nb"].to_numpy()[m],
                "nd": (cur.to_numpy()[m]
                       + batch["wt"].to_numpy()[m]).astype(np.int64)})

        tentative = bucketed_min(
            adj_ds.map_batches(relax, batch_format="pandas"),
            ["nb"], "nd", n_buckets)
        for row in tentative.take_all():  # reached-set-bounded, not corpus
            node, nd = row["nb"], int(row["nd"])
            if node not in dist or nd < dist[node]:
                dist[node] = nd
    return _dist_table(dist)


# --------------------------------------------------- deterministic walks

def random_walks(edges, n_walks: int = 2, walk_len: int = 3,
                 src: str = "subj_id", dst: str = "obj_id",
                 n_buckets: int = 64):
    """DeepWalk-style walk corpus over the undirected simple graph:
    Dataset(id, walk, step, node) — ``n_walks`` walks of ``walk_len``
    steps from EVERY graph node (the sequence-generation pass feeding
    skip-gram graph-embedding training).

    Deterministic "randomness": at step s of walk w standing on u, the
    next node is the neighbor v minimizing ``md5(f"{u}|{v}|{w}|{s}")`` —
    a pure function of the edge and position, so walks are identical at
    any parallelism AND exactly recomputable by the DuckDB oracle
    (row_number over md5). Backtracking is allowed (true uniform walk).

    Scale shape: per step, ONE pass over the adjacency emits candidate
    rows only for currently-occupied nodes with a PER-BATCH partial
    argmin (shuffle volume capped at positions x batches, not edges),
    then one bucketed argmin per (start, walk). Driver state is the
    position map — node x n_walks bounded, the same gazetteer-universe
    bound as BFS/components. At 10^9-node scale the accumulated walk
    table would stream to lineage-committed parquet per step instead of
    a driver list (BFS's frontier story applies unchanged)."""
    import hashlib

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    adj = _adjacency(und).materialize()
    nodes = sorted(degree_map(und))

    # position map: node -> list of (start, walk) standing there
    cur: dict[str, list[tuple[str, int]]] = {}
    rows: list[tuple[str, int, int, str]] = []
    for s in nodes:
        for w in range(n_walks):
            cur.setdefault(s, []).append((s, w))
            rows.append((s, w, 0, s))

    def argmin_partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "start": pd.Series([], dtype=object),
                "walk": pd.Series([], dtype="int64"),
                "nb": pd.Series([], dtype=object),
                "key": pd.Series([], dtype=object)})
        return (b.sort_values(["start", "walk", "key"], kind="mergesort")
                 .drop_duplicates(["start", "walk"]))

    for step in range(1, walk_len + 1):
        pos_ref = ray.put(cur)

        def cand(batch: pd.DataFrame, _ref=pos_ref,
                 _step=step) -> pd.DataFrame:
            pos = ray.get(_ref)
            m = batch["id"].isin(pos.keys()).to_numpy()
            starts, walks, nbs, keys = [], [], [], []
            for u, v in zip(batch["id"].to_numpy()[m],
                            batch["nb"].to_numpy()[m]):
                for (s, w) in pos[u]:
                    starts.append(s)
                    walks.append(w)
                    nbs.append(v)
                    keys.append(hashlib.md5(
                        f"{u}|{v}|{w}|{_step}".encode()).hexdigest())
            out = pd.DataFrame({"start": starts, "walk": walks,
                                "nb": nbs, "key": keys})
            return argmin_partial(out)

        chosen = bucketed_apply(
            adj.map_batches(cand, batch_format="pandas"),
            ["start", "walk"], argmin_partial, n_buckets=n_buckets,
        ).to_pandas()  # positions-bounded (node x n_walks), not corpus

        cur = {}
        for s, w, v in zip(chosen["start"], chosen["walk"], chosen["nb"]):
            cur.setdefault(v, []).append((s, int(w)))
            rows.append((s, int(w), step, v))

    import ray.data as rd

    return rd.from_arrow(pa.table({
        "id": pa.array([r[0] for r in rows], pa.string()),
        "walk": pa.array([r[1] for r in rows], pa.int64()),
        "step": pa.array([r[2] for r in rows], pa.int64()),
        "node": pa.array([r[3] for r in rows], pa.string()),
    }))


def walk_skipgrams(walks, window: int = 2, n_buckets: int = 64):
    """Skip-gram training pairs over a walk corpus: for every walk
    sequence, all (center, context) node pairs within ``window`` steps ->
    Dataset(id, walk, center_step, context_step, center, context) — the
    pair-generation pass that turns the DeepWalk corpus into word2vec
    input (Perozzi et al. 2014, public method).

    Scale shape: all rows of one (start, walk) sequence co-locate through
    ONE bucketed exchange keyed on the sequence id; pairing is the
    repeat+offset numpy pattern (sort by step once, compare arrays shifted
    by d for d in 1..window — no per-sequence Python loop), identical to
    the vectorized support pair generator (``support._pairs_all``).
    Shuffle volume is the walk corpus itself; output is corpus x
    ~2*window rows, streamed — never collected."""

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        cols = ["id", "walk", "center_step", "context_step",
                "center", "context"]
        if len(g) == 0:
            return pd.DataFrame({
                "id": pd.Series([], dtype=object),
                "walk": pd.Series([], dtype="int64"),
                "center_step": pd.Series([], dtype="int64"),
                "context_step": pd.Series([], dtype="int64"),
                "center": pd.Series([], dtype=object),
                "context": pd.Series([], dtype=object)})
        g = g.sort_values(["id", "walk", "step"], kind="mergesort")
        ids = g["id"].to_numpy()
        wk = g["walk"].to_numpy(np.int64)
        st = g["step"].to_numpy(np.int64)
        nd = g["node"].to_numpy()
        outs = []
        for d in range(1, window + 1):
            if d >= len(g):
                break
            m = ((ids[:-d] == ids[d:]) & (wk[:-d] == wk[d:])
                 & (st[d:] - st[:-d] == d))
            # both directions: center before context and after
            outs.append(pd.DataFrame({
                "id": ids[:-d][m], "walk": wk[:-d][m],
                "center_step": st[:-d][m], "context_step": st[d:][m],
                "center": nd[:-d][m], "context": nd[d:][m]}))
            outs.append(pd.DataFrame({
                "id": ids[:-d][m], "walk": wk[:-d][m],
                "center_step": st[d:][m], "context_step": st[:-d][m],
                "center": nd[d:][m], "context": nd[:-d][m]}))
        outs = [o for o in outs if len(o)]
        if not outs:
            return pairs(g.iloc[0:0])
        return pd.concat(outs, ignore_index=True)[cols]

    return bucketed_apply(walks, ["id", "walk"], pairs,
                          n_buckets=n_buckets)


class _NegSampler:
    """MODULE-LEVEL actor UDF (CLAUDE.md rule); the node universe arrives
    via ``fn_constructor_kwargs`` as an object-store ref — read once per
    actor, never re-shipped per batch."""

    def __init__(self, nodes_ref, k: int):
        import ray as _ray

        self.nodes = np.asarray(_ray.get(nodes_ref), dtype=object)
        self.k = k

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        reps = b.loc[b.index.repeat(self.k)].reset_index(drop=True)
        ranks = np.tile(np.arange(self.k, dtype=np.int64), len(b))
        # md5 positional hash — the walks' determinism convention
        # (recomputable bit-for-bit by the DuckDB oracle; same
        # O(corpus x k) cost class as the parity fingerprint ops)
        idx = np.fromiter(
            (int(hashlib.md5(f"{i}|{w}|{cs}|{xs}|{r}".encode())
                 .hexdigest()[:8], 16)
             for i, w, cs, xs, r in zip(
                 reps["id"], reps["walk"], reps["center_step"],
                 reps["context_step"], ranks)),
            dtype=np.int64, count=len(reps)) % len(self.nodes)
        reps["neg_rank"] = ranks
        reps["negative"] = self.nodes[idx]
        return reps


def walk_skipgram_negatives(pairs, k: int = 2, n_buckets: int = 64):
    """Negative sampling for skip-gram training (Mikolov et al. 2013,
    public method): each (center, context) pair gains ``k`` deterministic
    negatives -> the input columns plus (neg_rank, negative).

    The negative for (pair, i) is the node at index
    ``md5(id|walk|center_step|context_step|i)[:8] mod N`` in the SORTED
    node universe — a pure function of the pair, so identical at any
    parallelism and recomputable by the oracle. Standard word2vec does
    not exclude accidental positives; neither does this (documented
    contract, matches the oracle exactly).

    Scale shape: the universe is the pair-bearing walk-start node set —
    entity-bounded (gazetteer components, the same bound as BFS /
    components driver state) — broadcast once via ``ray.put``; the pair
    stream maps through an actor pool with O(corpus x k) hashing and no
    shuffle at all. The pairs dataset is consumed twice (universe +
    sampling), so callers pass a materialized/checkpointed pairs input
    at real scale."""
    pairs = pairs.materialize()  # entity x window-bounded, read twice
    ids = bucketed_distinct(
        pairs.select_columns(["id"]), ["id"], n_buckets).take_all()
    universe = sorted(r["id"] for r in ids)
    nodes_ref = ray.put(universe)
    return pairs.map_batches(
        _NegSampler, batch_format="pandas", concurrency=(1, 2),
        fn_constructor_kwargs={"nodes_ref": nodes_ref, "k": k})


LABELPROP_ROUNDS = 3  # SPEC constant — oracle unrolls exactly this many


def _local_label_prop(und, rounds: int):
    """Driver numpy rounds for a pair table under the gate — identical
    round semantics to the distributed path and the SQL oracle."""
    import ray.data as rd

    frames = list(und.iter_batches(batch_format="pandas", batch_size=65536))
    df = (pd.concat(frames, ignore_index=True) if frames
          else pd.DataFrame({"a": [], "b": []}))
    empty = pa.table({"id": pa.array([], pa.string()),
                      "label": pa.array([], pa.string())})
    if len(df) == 0:
        return rd.from_arrow(empty)
    nodes = np.unique(np.concatenate([df["a"].to_numpy(dtype=object),
                                      df["b"].to_numpy(dtype=object)]))
    n = len(nodes)
    ai = np.searchsorted(nodes, df["a"].to_numpy(dtype=object))
    bi = np.searchsorted(nodes, df["b"].to_numpy(dtype=object))
    # label as an index into the SORTED node array: index order IS
    # lexicographic label order, so the min-label tie-break is an int min
    lab = np.arange(n, dtype=np.int64)
    centers = np.concatenate([ai, bi]).astype(np.int64)
    others = np.concatenate([bi, ai]).astype(np.int64)
    for _ in range(rounds):
        key = centers * n + lab[others]
        uk, cnt = np.unique(key, return_counts=True)
        c, l = uk // n, uk % n
        # per center: count desc, then label asc — first row after lexsort
        order = np.lexsort((l, -cnt, c))
        c_s, l_s = c[order], l[order]
        first = np.ones(len(c_s), dtype=bool)
        first[1:] = c_s[1:] != c_s[:-1]
        nxt = lab.copy()
        nxt[c_s[first]] = l_s[first]
        lab = nxt
    return rd.from_arrow(pa.table({
        "id": pa.array(nodes, pa.string()),
        "label": pa.array(nodes[lab], pa.string()),
    }))


def label_propagation(edges, rounds: int = LABELPROP_ROUNDS,
                      src: str = "subj_id", dst: str = "obj_id",
                      n_buckets: int = 64, local_threshold: int = 1_000_000):
    """Synchronous label-propagation community detection (Raghavan et al.
    2007, public method) over the undirected simple graph:
    Dataset(id, label) after exactly ``rounds`` synchronous rounds of
    "adopt the label most frequent among my neighbors, ties broken by the
    lexicographically smallest label", starting from label(v) = v.

    ``rounds`` is a SPEC constant like ``KCORE_ROUNDS``: the fully
    deterministic synchronous variant (no random visit order) is what
    makes the result oracle-checkable — both engine paths and the SQL
    unroll the identical rounds, converged or not.

    Hybrid scale shape (same gate as kcore/pagerank/components): under
    the edge gate one driver numpy pass; above it, each round is one
    corpus-scale adjacency map attaching the broadcast label dict + one
    coalesced (id, label) count whose driver collect is bounded by
    per-node distinct NEIGHBOR labels (<= |adjacency|, shrinking each
    round as communities coalesce; the label dict itself is
    entity-bounded, the components/BFS bound)."""
    import ray.data as rd

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    if und.count() <= local_threshold:
        return _local_label_prop(und, rounds)

    # ---- distributed path (pinned by tests with local_threshold=0) ----
    adj = _adjacency(und).materialize()  # read once per round
    labels = {i: i for i in degree_map(und)}
    for _ in range(rounds):
        ref = ray.put(labels)

        def attach(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            lbl = ray.get(_ref)
            return pd.DataFrame({"id": b["id"],
                                 "label": b["nb"].map(lbl)})

        counted = coalesced_count(
            adj.map_batches(attach, batch_format="pandas"),
            ["id", "label"], name="c")
        frames = list(counted.iter_batches(batch_format="pandas",
                                           batch_size=None))
        if not frames:
            break
        df = (pd.concat(frames, ignore_index=True)
              .groupby(["id", "label"], sort=False)["c"].sum()
              .reset_index()
              .sort_values(["id", "c", "label"],
                           ascending=[True, False, True], kind="mergesort")
              .drop_duplicates("id"))
        labels = dict(zip(df["id"], df["label"]))
    ids = sorted(labels)
    return rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.string()),
        "label": pa.array([labels[i] for i in ids], pa.string()),
    }))


def clustering_coefficient(edges, src: str = "subj_id",
                           dst: str = "obj_id", n_buckets: int = 64):
    """Local clustering coefficient per node (Watts-Strogatz 1998):
    Dataset(id, deg, n_triangles, coeff) over the undirected simple
    graph, coeff = triangles / C(deg, 2) (0.0 when deg < 2).

    Composition, not new machinery: the exact triangle counts
    (:func:`triangles_per_node`) and the distinct-neighbor degree table
    union into ONE bucketed exchange keyed by node — the LEFT semantics
    (every node gets a row; no-triangle nodes get 0) come from summing
    typed zero-filled sides, not a join. The coefficient is ONE float64
    division of two exact ints (repo float invariant), bit-identical to
    the DuckDB oracle."""
    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    deg = bucketed_count(_adjacency(und), ["id"], name="deg", n_buckets=n_buckets)
    tri = triangles_per_node(edges, src, dst, n_buckets)

    def tag_deg(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": b["id"],
                             "deg": b["deg"].astype(np.int64),
                             "tri": np.zeros(len(b), dtype=np.int64)})

    def tag_tri(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": b["id"],
                             "deg": np.zeros(len(b), dtype=np.int64),
                             "tri": b["n_triangles"].astype(np.int64)})

    u = deg.map_batches(tag_deg, batch_format="pandas").union(
        tri.map_batches(tag_tri, batch_format="pandas"))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "id" not in g.columns:
            return pd.DataFrame({
                "id": pd.Series([], dtype=object),
                "deg": pd.Series([], dtype=np.int64),
                "n_triangles": pd.Series([], dtype=np.int64),
                "coeff": pd.Series([], dtype=np.float64)})
        m = g.groupby("id", sort=False, as_index=False)[["deg", "tri"]].sum()
        d = m["deg"].to_numpy(np.int64)
        t = m["tri"].to_numpy(np.int64)
        denom = d * (d - 1)
        coeff = np.divide(2.0 * t, denom, out=np.zeros(len(m)),
                          where=denom > 0)
        return pd.DataFrame({"id": m["id"], "deg": d, "n_triangles": t,
                             "coeff": coeff})

    return bucketed_apply(u, ["id"], final, None, n_buckets)


# ------------------------------------------------- harmonic centrality (sampled)

HARMONIC_SEEDS = 8


def _multi_seed_dists(und, seeds, rounds, n_buckets,
                     local_threshold):
    """dist[(seed, node)] = hop distance for every seed at once —
    harmonic/stress/distance-profile share this frontier loop. Under the
    gate one numpy pass per seed; above it all seeds advance TOGETHER in
    one broadcast-frontier adjacency pass per round (k x node bound)."""
    dist: dict[tuple[str, str], int] = {(s, s): 0 for s in seeds}

    if und.count() <= local_threshold:
        frames = list(und.iter_batches(batch_format="pandas",
                                       batch_size=65536))
        df = (pd.concat(frames, ignore_index=True) if frames
              else pd.DataFrame({"a": [], "b": []}))
        a = df["a"].to_numpy(dtype=object)
        b = df["b"].to_numpy(dtype=object)
        for s in seeds:
            frontier = {s}
            reach = {s: 0}
            for r in range(1, rounds + 1):
                if not frontier:
                    break
                in_a = np.fromiter((x in frontier for x in a), bool, len(a))
                in_b = np.fromiter((x in frontier for x in b), bool, len(b))
                reached = set(b[in_a]) | set(a[in_b])
                frontier = {x for x in reached if x not in reach}
                for x in frontier:
                    reach[x] = r
            for x, d in reach.items():
                dist[(s, x)] = d
    else:
        # ---- distributed path (pinned by tests with local_threshold=0):
        # every seed's frontier advances in the SAME adjacency pass.
        adj = _adjacency(und).materialize()
        for r in range(1, rounds + 1):
            fr_map: dict[str, list[str]] = {}
            for (s, node), d in dist.items():
                if d == r - 1:
                    fr_map.setdefault(node, []).append(s)
            if not fr_map:
                break
            fr_ref = ray.put(fr_map)

            def expand(batch: pd.DataFrame, _ref=fr_ref) -> pd.DataFrame:
                fm = ray.get(_ref)
                node = batch["id"].to_numpy(dtype=object)
                nb = batch["nb"].to_numpy(dtype=object)
                m = batch["id"].isin(fm).to_numpy()  # vectorized hash probe
                if not m.any():
                    return pd.DataFrame({"s": pd.Series([], dtype=object),
                                         "nb": pd.Series([], dtype=object)})
                hit_nb = nb[m]
                slists = [fm[x] for x in node[m]]
                counts = np.fromiter((len(x) for x in slists), np.int64,
                                     len(slists))
                return pd.DataFrame({
                    "s": np.concatenate([np.asarray(x, dtype=object)
                                         for x in slists]),
                    "nb": np.repeat(hit_nb, counts)})

            reached = bucketed_distinct(
                adj.map_batches(expand, batch_format="pandas"),
                ["s", "nb"], n_buckets)
            for row in reached.take_all():  # frontier-bounded, not corpus
                key = (row["s"], row["nb"])
                if key not in dist:
                    dist[key] = r

    return dist


def harmonic_centrality(edges, n_seeds: int = HARMONIC_SEEDS,
                        rounds: int = BFS_ROUNDS,
                        src: str = "subj_id", dst: str = "obj_id",
                        n_buckets: int = 64,
                        local_threshold: int = 1_000_000):
    """Sampled harmonic centrality (Eppstein & Wang 2004 estimator shape):
    Dataset(id, h12, harmonic) over every graph node, where the sample is
    the ``n_seeds`` lexicographically-smallest node ids (a SPEC constant —
    deterministic and SQL-expressible, unlike a random sample) and

        h12      = sum over seeds s with 0 < d(s, v) <= rounds of LCM // d
        harmonic = h12 / LCM        (LCM = lcm(1..rounds), 12 for rounds=4)

    The LCM trick keeps the accumulation INTEGER-exact so the float is ONE
    division (repo float invariant — bit-identical to the DuckDB oracle
    regardless of summation order). Centrality analytics the reference
    defers to its neo4j sink's graph algos (`builder/userquery.py` grain).

    Scale shape: identical doctrine to :func:`bfs_distances` — under the
    gate one driver numpy pass per seed (seed count is a small spec
    constant); above it all seeds advance TOGETHER, one broadcast frontier
    map (node -> seeds, node-bounded x n_seeds) and one vectorized
    adjacency membership pass per round, so per-round exchange size is
    bounded by the new (seed, node) frontier, never the corpus-scale edge
    list."""
    import math

    lcm = math.lcm(*range(1, rounds + 1))
    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    node_deg = degree_map(und)  # node-bounded (gazetteer universe)
    ids = sorted(node_deg)
    seeds = ids[:n_seeds]
    dist = _multi_seed_dists(und, seeds, rounds, n_buckets,
                             local_threshold)

    h12: dict[str, int] = {}
    for (s, node), d in dist.items():
        if d > 0:
            h12[node] = h12.get(node, 0) + lcm // d
    vals = np.array([h12.get(i, 0) for i in ids], dtype=np.int64)
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.string()),
        "h12": pa.array(vals, pa.int64()),
        "harmonic": pa.array(vals / float(lcm), pa.float64()),
    }))


# --------------------------------------------------- degree assortativity

def degree_assortativity(edges, src: str = "subj_id", dst: str = "obj_id",
                         n_buckets: int = 64):
    """Graph-level degree assortativity (Newman 2002): Pearson correlation
    of endpoint degrees over every directed orientation of the undirected
    simple graph -> ONE row (n_pairs, assortativity).

    Same exactness contract as relational.lineitem_qty_price_corr: the
    five moment sums accumulate as exact int64 per-batch partials (the
    degree map is node-bounded broadcast state), the driver folds
    arbitrary-precision Python ints (== the oracle's HUGEINT), and the
    final float conversion uses the identical operation order, so the
    double is bit-for-bit the oracle's."""
    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    degs = degree_map(und)  # node-bounded (gazetteer universe)
    ref = ray.put(degs)

    def partial(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        d = ray.get(_ref)
        x = b["id"].map(d).to_numpy(np.int64)
        y = b["nb"].map(d).to_numpy(np.int64)
        return pd.DataFrame({
            "n": [np.int64(len(b))],
            "sx": [x.sum()], "sy": [y.sum()],
            "sxy": [(x * y).sum()],
            "sxx": [(x * x).sum()], "syy": [(y * y).sum()],
        })

    rows = (_adjacency(und).map_batches(partial, batch_format="pandas")
            .take_all())  # batch-count-bounded partials, exact ints
    import math

    import ray.data as rd

    n = sum(int(r["n"]) for r in rows)
    sx = sum(int(r["sx"]) for r in rows)
    sy = sum(int(r["sy"]) for r in rows)
    sxy = sum(int(r["sxy"]) for r in rows)
    sxx = sum(int(r["sxx"]) for r in rows)
    syy = sum(int(r["syy"]) for r in rows)
    num = n * sxy - sx * sy
    dxx, dyy = n * sxx - sx * sx, n * syy - sy * sy
    r = float(num) / (math.sqrt(float(dxx)) * math.sqrt(float(dyy)))
    return rd.from_arrow(pa.table({
        "n_pairs": pa.array([n], pa.int64()),
        "assortativity": pa.array([r], pa.float64()),
    }))


# ------------------------------------------------------------------ k-truss

KTRUSS_K = 4
KTRUSS_ROUNDS = 3


class _TrussOrient:
    """MODULE-LEVEL actor UDF (CLAUDE.md pickling rule): orient each
    undirected edge toward its (deg, id)-larger endpoint so every
    triangle is generated once, as the wedge of its minimal vertex."""

    def __init__(self, deg_ref):
        self.deg = ray.get(deg_ref)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"id": pd.Series([], dtype=object),
                                 "nb": pd.Series([], dtype=object)})
        da = b["a"].map(self.deg).to_numpy(np.int64)
        db = b["b"].map(self.deg).to_numpy(np.int64)
        a_first = (da < db) | (da == db)
        return pd.DataFrame({"id": np.where(a_first, b["a"], b["b"]),
                             "nb": np.where(a_first, b["b"], b["a"])})


def _edge_support(und, n_buckets: int):
    """Dataset(a, b, t): per-edge triangle support |N(a) n N(b)| over the
    CURRENT undirected simple edge set (t=0 edges included). One wedge
    cycle: degree-ordered wedges -> INNER closure attach -> credit each
    triangle to its THREE edges -> one edge-keyed count exchange -> LEFT
    attach back (fill 0)."""
    deg_ref = ray.put(degree_map(und))
    oriented = und.map_batches(_TrussOrient, batch_format="pandas",
                               concurrency=(1, 4),
                               fn_constructor_kwargs={"deg_ref": deg_ref})

    def wedge_fn(sub: pd.DataFrame) -> pd.DataFrame:
        nbs = np.sort(sub["nb"].to_numpy(dtype=object))
        if len(nbs) < 2:
            return pd.DataFrame({"mid": pd.Series([], dtype=object),
                                 "_kk": pd.Series([], dtype=object)})
        i, j = np.triu_indices(len(nbs), k=1)
        lo = np.minimum(nbs[i], nbs[j])
        hi = np.maximum(nbs[i], nbs[j])
        return pd.DataFrame({"mid": sub["id"].iloc[0],
                             "_kk": lo + _SEP + hi})

    wedges = bucketed_group_pairs(oriented, ["id"], wedge_fn, n_buckets)

    def key_edges(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"_kk": b["a"] + _SEP + b["b"],
                             "hit": np.ones(len(b), dtype=np.int64)})

    closed = bucketed_attach(  # INNER: only true triangles survive
        wedges, und.map_batches(key_edges, batch_format="pandas"),
        left_on="_kk", right_on="_kk", left_cols=["mid", "_kk"],
        payload={"hit": "hit"}, n_buckets=n_buckets,
        payload_fill=np.int64(0))

    def edge_keys(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"ek": pd.Series([], dtype=object)})
        xy = b["_kk"].str.split(_SEP, expand=True)
        mid = b["mid"].to_numpy(dtype=object)
        x = xy[0].to_numpy(dtype=object)
        y = xy[1].to_numpy(dtype=object)
        e1 = np.minimum(mid, x) + _SEP + np.maximum(mid, x)
        e2 = np.minimum(mid, y) + _SEP + np.maximum(mid, y)
        return pd.DataFrame({"ek": np.concatenate(
            [e1, e2, b["_kk"].to_numpy(dtype=object)])})

    sup = bucketed_count(closed.map_batches(edge_keys,
                                            batch_format="pandas"),
                         ["ek"], name="t", n_buckets=min(n_buckets, 16))

    def und_key(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"a": b["a"], "b": b["b"],
                             "ek": b["a"] + _SEP + b["b"]})

    out = bucketed_attach(
        und.map_batches(und_key, batch_format="pandas"), sup,
        left_on="ek", right_on="ek", left_cols=["a", "b"],
        payload={"t": "t"}, payload_fill=np.int64(0),
        n_buckets=n_buckets,
        empty_dtypes={"a": object, "b": object, "t": "int64"})
    return out.map_batches(
        lambda b: b.assign(t=b["t"].astype("int64")),
        batch_format="pandas")


def _support_df(df: pd.DataFrame) -> pd.DataFrame:
    """Pandas per-edge support (|N(a) n N(b)|) — the oracle's exact merge
    shape, used by the under-gate local path."""
    if len(df) == 0:
        return pd.DataFrame({"a": pd.Series([], dtype=object),
                             "b": pd.Series([], dtype=object),
                             "t": pd.Series([], dtype="int64")})
    adj = pd.concat([
        df.rename(columns={"a": "id", "b": "nb"})[["id", "nb"]],
        df.rename(columns={"b": "id", "a": "nb"})[["id", "nb"]],
    ], ignore_index=True)
    m = df.merge(adj.rename(columns={"id": "a", "nb": "c"}), on="a")
    m = m.merge(adj.rename(columns={"id": "b", "nb": "c"}), on=["b", "c"])
    t = m.groupby(["a", "b"]).size().rename("t").reset_index()
    out = df.merge(t, on=["a", "b"], how="left")
    out["t"] = out["t"].fillna(0).astype("int64")
    return out


def ktruss(edges, k: int = KTRUSS_K, rounds: int = KTRUSS_ROUNDS,
           src: str = "subj_id", dst: str = "obj_id", n_buckets: int = 64,
           local_threshold: int = 1_000_000):
    """Fixed-round k-TRUSS peeling (Cohen 2008) — the EDGE-grain cohesion
    sibling of :func:`kcore`: per round, drop every edge lying in fewer
    than (k-2) triangles of the CURRENT edge set; after ``rounds``
    (a SPEC constant unrolled in the oracle, like KCORE_ROUNDS) report
    the surviving edges with their support recomputed ON the survivor
    set -> Dataset(a, b, support).

    Hybrid scale shape: under the gate the loop is driver pandas merges
    (the oracle's exact shape); above it each round is ONE wedge cycle —
    degree-ordered wedge generation (per-center out-degree^2 bound), an
    INNER closure attach, a 3-edge triangle credit, one edge-keyed count
    exchange, and a LEFT support attach — all bucketed, with the edge
    set re-materialized per round (entity-pair-bounded, the same class
    as every ``und.materialize()`` here)."""
    import ray.data as rd

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    if und.count() <= local_threshold:
        frames = list(und.iter_batches(batch_format="pandas",
                                       batch_size=65536))
        df = (pd.concat(frames, ignore_index=True) if frames
              else pd.DataFrame({"a": pd.Series([], dtype=object),
                                 "b": pd.Series([], dtype=object)}))
        for _ in range(rounds):
            s = _support_df(df)
            df = s.loc[s["t"] >= k - 2, ["a", "b"]]
        fin = _support_df(df).sort_values(["a", "b"], kind="mergesort")
        return rd.from_arrow(pa.table({
            "a": pa.array(fin["a"].tolist(), pa.string()),
            "b": pa.array(fin["b"].tolist(), pa.string()),
            "support": pa.array(fin["t"].tolist(), pa.int64())}))

    # ---- distributed path (pinned by tests with local_threshold=0) ----
    cur = und
    for _ in range(rounds):
        s = _edge_support(cur, n_buckets)
        cur = s.map_batches(
            lambda b, _k=k: b.loc[b["t"] >= _k - 2, ["a", "b"]],
            batch_format="pandas").materialize()
    fin = _edge_support(cur, n_buckets)
    return fin.map_batches(
        lambda b: pd.DataFrame({"a": b["a"], "b": b["b"],
                                "support": b["t"].astype("int64")}),
        batch_format="pandas")


# ------------------------------------------------------ stress centrality

STRESS_SEEDS = 8
STRESS_ROUNDS = 3


def stress_centrality(edges, n_seeds: int = STRESS_SEEDS,
                      rounds: int = STRESS_ROUNDS,
                      src: str = "subj_id", dst: str = "obj_id",
                      n_buckets: int = 64,
                      local_threshold: int = 1_000_000):
    """Sampled hop-bounded stress centrality (Shimbel 1953): Dataset
    (id, stress) over every graph node, where stress(v) = the number of
    shortest paths that pass THROUGH v (v an interior node), summed over
    source seeds s (the ``n_seeds`` lexicographically-smallest ids — a
    SPEC constant, deterministic and SQL-expressible) and all targets t
    with 0 < d(s, t) <= ``rounds``.

    Computed with the two Brandes (2001) passes kept INTEGER-exact — the
    reason this variant is chosen over sigma-ratio betweenness, whose
    per-pair divisions cannot meet the repo's bit-identical-float oracle
    rule: a forward BFS accumulating path counts sigma(s, v), then a
    backward pass over the shortest-path DAG computing
    f(v) = sum over DAG successors w of (1 + f(w)) — the number of
    DAG paths from v to any later target — so stress(v) = sigma * f.
    Centrality analytics the reference defers to its neo4j sink's graph
    algos (`builder/userquery.py` grain).

    Scale shape: same doctrine as :func:`harmonic_centrality` — under the
    gate one vectorized pandas pass per seed; above it all seeds advance
    TOGETHER (one broadcast frontier map and one adjacency pass per
    round), per-round exchange bounded by the (seed, DAG-edge) frontier.
    Both the forward sigma table and the backward fold are
    (seeds x node)-bounded driver state — the entity-bounded budget the
    canonicalization broadcast already relies on."""
    import ray
    import ray.data as rd

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    node_deg = degree_map(und)  # entity-bounded
    ids = sorted(node_deg)
    seeds = ids[:n_seeds]

    dist: dict[tuple[str, str], int] = {(s, s): 0 for s in seeds}
    sigma: dict[tuple[str, str], int] = {(s, s): 1 for s in seeds}
    # DAG edges per (seed, depth of v): dag[r] holds (s, v@r, w@r+1)
    dag: dict[int, list[tuple[str, str, str]]] = {
        r: [] for r in range(rounds)}

    if und.count() <= local_threshold:
        frames = list(und.iter_batches(batch_format="pandas",
                                       batch_size=65536))
        df = (pd.concat(frames, ignore_index=True) if frames
              else pd.DataFrame({"a": [], "b": []}))
        v_all = np.concatenate([df["a"].to_numpy(dtype=object),
                                df["b"].to_numpy(dtype=object)])
        w_all = np.concatenate([df["b"].to_numpy(dtype=object),
                                df["a"].to_numpy(dtype=object)])
        for s in seeds:
            reach = {s: 0}
            level_sig = {s: 1}
            for r in range(1, rounds + 1):
                in_l = np.fromiter((x in level_sig for x in v_all),
                                   bool, len(v_all))
                if not in_l.any():
                    break
                vs, ws = v_all[in_l], w_all[in_l]
                new = np.fromiter((w not in reach for w in ws),
                                  bool, len(ws))
                vs, ws = vs[new], ws[new]
                if len(ws) == 0:
                    break
                contrib = np.fromiter((level_sig[v] for v in vs),
                                      np.int64, len(vs))
                nxt = (pd.Series(contrib).groupby(ws, sort=False).sum()
                       .to_dict())
                dag[r - 1].extend(zip([s] * len(vs), vs, ws))
                for w, c in nxt.items():
                    reach[w] = r
                    dist[(s, w)] = r
                    sigma[(s, w)] = int(c)
                level_sig = nxt
    else:
        # ---- distributed path (pinned by tests with local_threshold=0):
        # every seed's frontier advances in the SAME adjacency pass.
        adj = _adjacency(und).materialize()
        for r in range(1, rounds + 1):
            fr_map: dict[str, list[tuple[str, int]]] = {}
            for (s, node), d in dist.items():
                if d == r - 1:
                    fr_map.setdefault(node, []).append(
                        (s, sigma[(s, node)]))
            if not fr_map:
                break
            fr_ref = ray.put(fr_map)

            def expand(batch: pd.DataFrame, _ref=fr_ref) -> pd.DataFrame:
                fm = ray.get(_ref)
                node = batch["id"].to_numpy(dtype=object)
                nb = batch["nb"].to_numpy(dtype=object)
                m = batch["id"].isin(fm).to_numpy()
                empty = pd.DataFrame({
                    "s": pd.Series([], dtype=object),
                    "v": pd.Series([], dtype=object),
                    "nb": pd.Series([], dtype=object),
                    "sig": pd.Series([], dtype="int64")})
                if not m.any():
                    return empty
                hit_v, hit_nb = node[m], nb[m]
                pairs = [fm[x] for x in hit_v]
                counts = np.fromiter((len(x) for x in pairs), np.int64,
                                     len(pairs))
                return pd.DataFrame({
                    "s": np.concatenate(
                        [np.asarray([p[0] for p in x], dtype=object)
                         for x in pairs]),
                    "v": np.repeat(hit_v, counts),
                    "nb": np.repeat(hit_nb, counts),
                    "sig": np.concatenate(
                        [np.asarray([p[1] for p in x], dtype=np.int64)
                         for x in pairs])})

            reached = bucketed_distinct(
                adj.map_batches(expand, batch_format="pandas"),
                ["s", "v", "nb", "sig"], n_buckets)
            # frontier/DAG-bounded collect, not corpus-bounded
            rows = reached.take_all()
            for row in rows:
                key = (row["s"], row["nb"])
                if key not in dist:
                    dist[key] = r
                    sigma[key] = 0
            for row in rows:
                key = (row["s"], row["nb"])
                if dist[key] == r:
                    sigma[key] += int(row["sig"])
                    dag[r - 1].append((row["s"], row["v"], row["nb"]))

    # backward pass over the shortest-path DAG: (seeds x node)-bounded
    f: dict[tuple[str, str], int] = {}
    for r in range(rounds - 1, 0, -1):
        for s, v, w in dag[r]:
            f[(s, v)] = f.get((s, v), 0) + 1 + f.get((s, w), 0)
    stress: dict[str, int] = {}
    for (s, v), d in dist.items():
        if d > 0:
            c = sigma[(s, v)] * f.get((s, v), 0)
            if c:
                stress[v] = stress.get(v, 0) + c
    vals = np.array([stress.get(i, 0) for i in ids], dtype=np.int64)
    return rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.string()),
        "stress": pa.array(vals, pa.int64()),
    }))


# --------------------------------------------- resource-allocation index

RA_QUANT = 1_000_000


def metapath_3hop(edges, type_map: dict[str, str], type_a: str,
                  type_b: str, src: str = "subj_id",
                  dst: str = "obj_id", n_buckets: int = 64):
    """Typed 3-hop path counts (the Path-DSL ``S(1-3)D`` leg):
    Dataset(id_a, id_b, n_paths) — non-backtracking undirected paths
    a-m1-m2-b with type(a)=type_a, type(b)=type_b, a != m2, m1 != b,
    a != b, counted per endpoint pair.

    Scale shape: two path-expansion exchanges (the triad_motifs
    in x out per-center pattern, the typed side pruned BEFORE the
    cross), then one bucketed count on the endpoint pair. Path rows are
    the sum-of-deg^3 envelope bounded by the typed source fan-in — the
    metapath cost profile; salt/cap hubs if a corpus grows super-hubs."""
    import ray
    import ray.data as rd

    from ..functions.bucketing import bucketed_count

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    adj = _adjacency(und).materialize()
    tm_ref = ray.put(type_map)

    def tag_stage1(b: pd.DataFrame, _ref=tm_ref) -> pd.DataFrame:
        tm = ray.get(_ref)
        nbs = b["nb"].to_numpy(dtype=object)
        is_a = np.array([tm.get(n) == type_a for n in nbs], dtype=bool)
        out = pd.DataFrame({"key": b["id"], "v1": b["nb"],
                            "v2": "", "kind": np.int64(0)})
        src_rows = pd.DataFrame({"key": b["id"][is_a],
                                 "v1": b["nb"][is_a],
                                 "v2": "", "kind": np.int64(1)})
        return pd.concat([out, src_rows], ignore_index=True)

    def expand1(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"key": pd.Series([], dtype=object),
                              "v1": pd.Series([], dtype=object),
                              "v2": pd.Series([], dtype=object),
                              "kind": pd.Series([], dtype="int64")})
        if len(g) == 0 or "kind" not in g.columns:
            return empty
        srcs = g.loc[g["kind"] == 1, "v1"].to_numpy(dtype=object)
        outs = g.loc[g["kind"] == 0, "v1"].to_numpy(dtype=object)
        if len(srcs) == 0 or len(outs) == 0:
            return empty
        center = g["key"].iloc[0]
        a = np.repeat(srcs, len(outs))
        m2 = np.tile(outs, len(srcs))
        keep = a != m2
        # partial paths keyed by m2, carrying (a, m1) for constraints
        return pd.DataFrame({"key": m2[keep], "v1": a[keep],
                             "v2": np.full(keep.sum(), center,
                                           dtype=object),
                             "kind": np.full(keep.sum(), 2,
                                             dtype=np.int64)})

    def tag_stage2(b: pd.DataFrame, _ref=tm_ref) -> pd.DataFrame:
        tm = ray.get(_ref)
        nbs = b["nb"].to_numpy(dtype=object)
        is_b = np.array([tm.get(n) == type_b for n in nbs], dtype=bool)
        return pd.DataFrame({"key": b["id"][is_b], "v1": b["nb"][is_b],
                             "v2": "", "kind": np.int64(3)})

    def expand2(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                              "id_b": pd.Series([], dtype=object)})
        if len(g) == 0 or "kind" not in g.columns:
            return empty
        paths = g.loc[g["kind"] == 2, ["v1", "v2"]]
        dsts = g.loc[g["kind"] == 3, "v1"].to_numpy(dtype=object)
        if len(paths) == 0 or len(dsts) == 0:
            return empty
        a = np.repeat(paths["v1"].to_numpy(dtype=object), len(dsts))
        m1 = np.repeat(paths["v2"].to_numpy(dtype=object), len(dsts))
        d = np.tile(dsts, len(paths))
        keep = (d != m1) & (d != a)
        return pd.DataFrame({"id_a": a[keep], "id_b": d[keep]})

    stage1 = bucketed_group_pairs(
        adj.map_batches(tag_stage1, batch_format="pandas"),
        ["key"], expand1, n_buckets)
    stage2_in = stage1.union(
        adj.map_batches(tag_stage2, batch_format="pandas"))
    pairs = bucketed_group_pairs(stage2_in, ["key"], expand2, n_buckets)
    counted = bucketed_count(pairs, ["id_a", "id_b"], name="n_paths",
                             n_buckets=n_buckets)

    seed = rd.from_arrow(pa.table({
        "id_a": pa.array([], pa.string()),
        "id_b": pa.array([], pa.string()),
        "n_paths": pa.array([], pa.int64()),
    }))

    def typed(b: pd.DataFrame) -> pa.Table:
        return pa.table({
            "id_a": pa.array(b["id_a"], pa.string()),
            "id_b": pa.array(b["id_b"], pa.string()),
            "n_paths": pa.array(b["n_paths"].astype("int64"),
                                pa.int64())})

    return (counted.map_batches(typed, batch_format="pandas")
            .union(seed))


def directed_common_topk(edges, mode: str = "cocitation",
                         src: str = "subj_id", dst: str = "obj_id",
                         k: int = 50, n_buckets: int = 64):
    """Co-citation / bibliographic coupling top-k over the distinct
    directed simple digraph (Small 1973 / Kessler 1963):
    Dataset(rk, id_a, id_b, common) — ``cocitation`` counts nodes m
    with m->a AND m->b (pairs of each node's OUT-neighbors),
    ``coupling`` counts m with a->m AND b->m (pairs of IN-neighbors).
    The directed-graph similarity pair citation/provenance analytics
    rank related entities by.

    Scale shape: the triangles/RA wedge machinery on ONE orientation of
    the adjacency — per-center pair generation, one bucketed count, a
    per-block top-k cap before the single-block final sort."""
    from ..functions.bucketing import bucketed_distinct

    assert mode in ("cocitation", "coupling")

    def depairs(b: pd.DataFrame) -> pd.DataFrame:
        m = (b[src] != b[dst]).to_numpy()
        return pd.DataFrame({"a": b[src][m], "b": b[dst][m]})

    de = bucketed_distinct(
        edges.select_columns([src, dst]).map_batches(
            depairs, batch_format="pandas"),
        ["a", "b"], n_buckets)

    ctr, nbr = ("a", "b") if mode == "cocitation" else ("b", "a")

    def orient(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": b[ctr], "nb": b[nbr]})

    def wedge_fn(sub: pd.DataFrame) -> pd.DataFrame:
        nbs = np.sort(sub["nb"].to_numpy(dtype=object))
        if len(nbs) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object)})
        i, j = np.triu_indices(len(nbs), k=1)
        return pd.DataFrame({"id_a": nbs[i], "id_b": nbs[j]})

    common = bucketed_count(
        bucketed_group_pairs(
            de.map_batches(orient, batch_format="pandas"),
            ["id"], wedge_fn, n_buckets),
        ["id_a", "id_b"], name="common", n_buckets=n_buckets)

    by, asc = ["common", "id_a", "id_b"], [False, True, True]

    def cap(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object),
                                 "common": pd.Series([], dtype="int64")})
        return b.sort_values(by, ascending=asc, kind="mergesort").head(k)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(by, ascending=asc, kind="mergesort").head(k)
        b = b.reset_index(drop=True)
        b["rk"] = np.arange(1, len(b) + 1)
        return b[["rk", "id_a", "id_b", "common"]]

    return (common.map_batches(cap, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def reciprocal_best_jaccard(edges, src: str = "subj_id",
                            dst: str = "obj_id", n_buckets: int = 64):
    """Reciprocal best matches by neighborhood Jaccard (the mutual-
    nearest-neighbor rule entity-alignment / ontology-matching pipelines
    accept pairs by): Dataset(id_a, id_b, jaccard) — pairs where each is
    the other's single best Jaccard partner (ties -> lexicographically
    smallest partner). The high-precision subset of the jaccard top-k.

    Scale shape: the full co-neighbor pair table (same wedge exchange as
    neighbor_jaccard_topk), oriented both ways into ONE per-node argmax
    bucket exchange, then ONE unordered-pair-key exchange where
    mutuality = the key appearing from both sides."""
    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    deg = degree_map(und)
    deg_ref = ray.put(deg)

    def wedge_fn(sub: pd.DataFrame) -> pd.DataFrame:
        nbs = np.sort(sub["nb"].to_numpy(dtype=object))
        if len(nbs) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object)})
        i, j = np.triu_indices(len(nbs), k=1)
        return pd.DataFrame({"id_a": nbs[i], "id_b": nbs[j]})

    common = bucketed_count(
        bucketed_group_pairs(_adjacency(und), ["id"], wedge_fn, n_buckets),
        ["id_a", "id_b"], name="common", n_buckets=n_buckets)

    def orient(b: pd.DataFrame, _ref=deg_ref) -> pd.DataFrame:
        dm = ray.get(_ref)
        c = b["common"].to_numpy(np.int64)
        da = b["id_a"].map(dm).to_numpy(np.int64)
        db = b["id_b"].map(dm).to_numpy(np.int64)
        jac = c / (da + db - c)  # ONE division of exact ints
        return pd.DataFrame({
            "id": np.concatenate([b["id_a"].to_numpy(dtype=object),
                                  b["id_b"].to_numpy(dtype=object)]),
            "p": np.concatenate([b["id_b"].to_numpy(dtype=object),
                                 b["id_a"].to_numpy(dtype=object)]),
            "jaccard": np.concatenate([jac, jac])})

    def argmax(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"id": pd.Series([], dtype=object),
                                 "p": pd.Series([], dtype=object),
                                 "jaccard": pd.Series([],
                                                      dtype="float64")})
        return (g.sort_values(["id", "jaccard", "p"],
                              ascending=[True, False, True],
                              kind="mergesort")
                .drop_duplicates("id")[["id", "p", "jaccard"]])

    best = bucketed_apply(
        common.map_batches(orient, batch_format="pandas"),
        ["id"], argmax, None, n_buckets)

    def pair_key(b: pd.DataFrame) -> pd.DataFrame:
        a = b["id"].to_numpy(dtype=object)
        p = b["p"].to_numpy(dtype=object)
        lo = np.minimum(a, p)
        hi = np.maximum(a, p)
        return pd.DataFrame({"k": lo + _SEP + hi, "id_a": lo, "id_b": hi,
                             "jaccard": b["jaccard"]})

    def mutual(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object),
                                 "jaccard": pd.Series([],
                                                      dtype="float64")})
        n = g.groupby("k", sort=False)["k"].transform("size")
        out = g.loc[(n == 2)].drop_duplicates("k")
        return out[["id_a", "id_b", "jaccard"]]

    import ray.data as rd

    seed = rd.from_arrow(pa.table({
        "id_a": pa.array([], pa.string()),
        "id_b": pa.array([], pa.string()),
        "jaccard": pa.array([], pa.float64()),
    }))
    return bucketed_apply(
        best.map_batches(pair_key, batch_format="pandas"),
        ["k"], mutual, None, n_buckets).union(seed)


def _wedge_weight_topk(edges, weight_for_deg, qcol: str, fcol: str,
                       src: str = "subj_id", dst: str = "obj_id",
                       k: int = 50, n_buckets: int = 64,
                       quant: int = RA_QUANT):
    """Shared core of the degree-weighted common-neighbor link-prediction
    indices (Resource Allocation, Adamic-Adar): score(a, b) = sum over
    common neighbors z of weight(deg(z)), with ``weight_for_deg(deg) ->
    int64`` quantizing each term so the accumulation is an order-free
    INTEGER sum (the lm_score trick) and the float is ONE division.

    Scale shape: per-center wedge generation weighted at the source (the
    weight is a function of the CENTER's own degree, known inside its
    group — no degree broadcast at all, unlike jaccard's), one bucketed
    integer sum over pairs, per-block top-k cap before the single-block
    final sort."""
    import ray.data as rd  # noqa: F401 (parity with sibling ops)

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()

    def wedge_fn(sub: pd.DataFrame) -> pd.DataFrame:
        nbs = np.sort(sub["nb"].to_numpy(dtype=object))
        if len(nbs) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object),
                                 "w": pd.Series([], dtype="int64")})
        i, j = np.triu_indices(len(nbs), k=1)
        return pd.DataFrame({"id_a": nbs[i], "id_b": nbs[j],
                             "w": np.full(len(i),
                                          weight_for_deg(len(nbs)),
                                          dtype=np.int64)})

    from ..functions.bucketing import bucketed_sum

    scored = bucketed_sum(
        bucketed_group_pairs(_adjacency(und), ["id"], wedge_fn, n_buckets),
        ["id_a", "id_b"], "w", n_buckets=n_buckets)

    by, asc = [qcol, "id_a", "id_b"], [False, True, True]

    def cap(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object),
                                 qcol: pd.Series([], dtype="int64")})
        b = b.rename(columns={"w": qcol})
        return b.sort_values(by, ascending=asc, kind="mergesort").head(k)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(by, ascending=asc, kind="mergesort").head(k)
        b = b.reset_index(drop=True)
        b["rk"] = np.arange(1, len(b) + 1)
        b[fcol] = b[qcol] / float(quant)  # ONE division
        return b[["rk", "id_a", "id_b", qcol, fcol]]

    return (scored.map_batches(cap, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def resource_allocation_topk(edges, src: str = "subj_id",
                             dst: str = "obj_id", k: int = 50,
                             n_buckets: int = 64, quant: int = RA_QUANT):
    """Top-k entity pairs by the Resource Allocation link-prediction index
    (Zhou, Lü & Zhang 2009): RA(a, b) = sum over common neighbors z of
    1/deg(z) — Dataset(rk, id_a, id_b, ra_q, ra). Each term quantizes to
    ``quant // deg(z)``, an EXACT integer on both engine and oracle
    sides; see :func:`_wedge_weight_topk` for the scale shape."""
    return _wedge_weight_topk(
        edges, lambda d: quant // d, "ra_q", "ra",
        src=src, dst=dst, k=k, n_buckets=n_buckets, quant=quant)


def adamic_adar_topk(edges, src: str = "subj_id", dst: str = "obj_id",
                     k: int = 50, n_buckets: int = 64,
                     quant: int = RA_QUANT):
    """Top-k entity pairs by the Adamic-Adar link-prediction index
    (Adamic & Adar 2003): AA(a, b) = sum over common neighbors z of
    1/ln(deg(z)) — Dataset(rk, id_a, id_b, aa_q, aa). Each term
    quantizes to ``floor(quant / ln(deg))`` — ``math.log`` is the same
    libm ``log(double)`` DuckDB's ``LN`` calls, the division and floor
    are IEEE-exact, so the per-term integers (and hence the order-free
    sum) are bit-identical to the SQL oracle. deg >= 2 inside every
    wedge group, so ln(deg) > 0 always. Shares
    :func:`_wedge_weight_topk`'s one-exchange scale shape with RA."""
    import math

    return _wedge_weight_topk(
        edges, lambda d: int(quant / math.log(d)), "aa_q", "aa",
        src=src, dst=dst, k=k, n_buckets=n_buckets, quant=quant)


# ----------------------------------------------------------- local bridges

def local_bridges(edges, src: str = "subj_id", dst: str = "obj_id",
                  n_buckets: int = 64):
    """Local bridges (Easley & Kleinberg 2010 §3.2): undirected edges
    whose endpoints share NO common neighbor — triangle support 0, the
    weak-tie edges whose removal lengthens every a-b path. Dataset
    (id_a, id_b).

    Computed as the undirected edge set ANTI-semi the >=1-support edge
    keys from :func:`_edge_support`'s wedge cycle — one wedge exchange +
    one anti exchange, no per-edge neighbor-set intersection anywhere."""
    from ..functions.bucketing import bucketed_semi

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    sup = _edge_support(und, n_buckets)

    def tri_keys(b: pd.DataFrame) -> pd.DataFrame:
        m = b["t"].to_numpy(np.int64) >= 1
        return pd.DataFrame({"ek": (b["a"][m] + _SEP + b["b"][m])})

    def und_keys(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id_a": b["a"], "id_b": b["b"],
                             "ek": b["a"] + _SEP + b["b"]})

    return bucketed_semi(
        und.map_batches(und_keys, batch_format="pandas"),
        sup.map_batches(tri_keys, batch_format="pandas"),
        left_on="ek", right_on="ek", left_cols=["id_a", "id_b"],
        n_buckets=n_buckets, anti=True,
        empty_dtypes={"id_a": object, "id_b": object})


# ------------------------------------------------ distance profile

def distance_profile(edges, n_seeds: int = HARMONIC_SEEDS,
                     rounds: int = BFS_ROUNDS,
                     src: str = "subj_id", dst: str = "obj_id",
                     n_buckets: int = 64,
                     local_threshold: int = 1_000_000):
    """Sampled graph distance profile (the ANF / effective-diameter
    estimator grain, Palmer et al. 2002): Dataset(dist, n_pairs) —
    how many (seed, node) pairs sit at each hop distance 1..rounds from
    the ``n_seeds`` lexicographically-smallest seeds. The cumulative
    curve is the sampled hop plot; its 90th percentile is the effective
    diameter. Shares :func:`_multi_seed_dists` (and its hybrid
    local/distributed scale shape) with harmonic/stress; output is
    rounds-bounded."""
    import ray.data as rd

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    ids = sorted(degree_map(und))
    seeds = ids[:n_seeds]
    dist = _multi_seed_dists(und, seeds, rounds, n_buckets,
                             local_threshold)
    counts = {r: 0 for r in range(1, rounds + 1)}
    for (_s, _v), d in dist.items():
        if d > 0:
            counts[d] += 1
    return rd.from_arrow(pa.table({
        "dist": pa.array(sorted(counts), pa.int64()),
        "n_pairs": pa.array([counts[r] for r in sorted(counts)],
                            pa.int64()),
    }))


# ------------------------------------------- maximal independent set

MIS_ROUNDS = 3


def _mis_key(h: str, i: str) -> str:
    # fixed-width md5 hex prefix -> lexicographic compare on the
    # concatenation equals (h, id) tuple compare; '|' only breaks ties
    return h + "|" + i


def _mis_priorities(ids) -> dict[str, str]:
    import hashlib

    return {i: hashlib.md5(i.encode("utf-8")).hexdigest() for i in ids}


def maximal_independent_set(edges, rounds: int = MIS_ROUNDS,
                            src: str = "subj_id", dst: str = "obj_id",
                            n_buckets: int = 64,
                            local_threshold: int = 1_000_000):
    """Fixed-round deterministic Luby-style maximal independent set
    (Luby 1986 with hash priorities instead of coin flips):
    Dataset(id, mis_round) — per round, every still-active node whose
    priority key md5(id) is strictly smallest in its active closed
    neighborhood joins the set, then it and its neighbors deactivate.
    ``rounds`` is a SPEC constant unrolled identically in the SQL
    oracle (like KCORE_ROUNDS), so the result is bit-identical whether
    or not the peeling has converged; undecided nodes after ``rounds``
    are simply absent. Priorities are md5 hex (DuckDB ``md5()`` parity)
    with an id tie-break; independence is structural — two active
    neighbors can never both hold the local minimum.

    Independent-set grain the reference defers to its neo4j sink's
    graph algos (`builder/userquery.py`). Hybrid scale shape (gate as
    kcore): under the gate one driver pandas/dict loop; above it each
    round is one broadcast-filtered min-key exchange over the adjacency
    (entity-bounded winner map on the driver) plus one winner-blocked
    neighbor pass — the corpus-scale edge list never leaves the
    cluster, driver state is node-bounded (the canonicalization
    broadcast's budget)."""
    import ray.data as rd

    empty = pa.table({"id": pa.array([], pa.string()),
                      "mis_round": pa.array([], pa.int64())})

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    if und.count() <= local_threshold:
        frames = list(und.iter_batches(batch_format="pandas",
                                       batch_size=65536))
        if not frames:
            return rd.from_arrow(empty)
        df = pd.concat(frames, ignore_index=True)
        adj: dict[str, set] = {}
        for a, b in zip(df["a"].to_numpy(dtype=object),
                        df["b"].to_numpy(dtype=object)):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        pr = _mis_priorities(adj)
        key = {i: _mis_key(h, i) for i, h in pr.items()}
        active = set(adj)
        out_id: list[str] = []
        out_round: list[int] = []
        for r in range(rounds):
            winners = {x for x in active
                       if all(key[x] < key[y]
                              for y in adj[x] if y in active)}
            for w in sorted(winners):
                out_id.append(w)
                out_round.append(r)
            blocked = set()
            for w in winners:
                blocked |= adj[w]
            active -= winners | blocked
        return rd.from_arrow(pa.table({
            "id": pa.array(out_id, pa.string()),
            "mis_round": pa.array(out_round, pa.int64())}))

    # ---- distributed path (pinned by tests with local_threshold=0) ----
    ids = sorted(degree_map(und))  # entity-bounded
    pr = _mis_priorities(ids)
    key = {i: _mis_key(h, i) for i, h in pr.items()}
    adj_ds = _adjacency(und).materialize()
    active = set(ids)
    selected: dict[str, int] = {}
    for r in range(rounds):
        act_ref = ray.put(active)
        key_ref = ray.put(key)

        def min_nb(t: pa.Table, _a=act_ref, _k=key_ref) -> pd.DataFrame:
            act = ray.get(_a)
            km = ray.get(_k)
            i = t["id"].to_pylist()
            n = t["nb"].to_pylist()
            rows_i, rows_k = [], []
            for x, y in zip(i, n):
                if x in act and y in act:
                    rows_i.append(x)
                    rows_k.append(km[y])
            return pd.DataFrame({"id": pd.Series(rows_i, dtype=object),
                                 "k": pd.Series(rows_k, dtype=object)})

        mins = bucketed_min(
            adj_ds.map_batches(min_nb, batch_format="pyarrow"),
            ["id"], "k", n_buckets=min(n_buckets, 16))
        # node-bounded driver fold (degree_map's budget)
        mmap: dict[str, str] = {}
        for b in mins.iter_batches(batch_format="pandas",
                                   batch_size=None):
            for x, kk in zip(b["id"], b["k"]):
                if x not in mmap or kk < mmap[x]:
                    mmap[x] = kk
        winners = {x for x in active
                   if x not in mmap or key[x] < mmap[x]}
        win_ref = ray.put(winners)

        def blocked_fn(t: pa.Table, _a=act_ref,
                       _w=win_ref) -> pd.DataFrame:
            act = ray.get(_a)
            win = ray.get(_w)
            i = t["id"].to_pylist()
            n = t["nb"].to_pylist()
            hit = {x for x, y in zip(i, n)
                   if y in win and x in act and x not in win}
            return pd.DataFrame({"id": pd.Series(sorted(hit),
                                                 dtype=object)})

        blocked = set()
        for b in adj_ds.map_batches(
                blocked_fn, batch_format="pyarrow").iter_batches(
                batch_format="pandas", batch_size=None):
            blocked.update(b["id"].tolist())
        for w in winners:
            selected[w] = r
        active -= winners | blocked
    if not selected:
        return rd.from_arrow(empty)
    out = sorted(selected)
    return rd.from_arrow(pa.table({
        "id": pa.array(out, pa.string()),
        "mis_round": pa.array([selected[i] for i in out], pa.int64())}))


# ------------------------------------------- community modularity stats

def community_stats(edges, rounds: int = LABELPROP_ROUNDS,
                    src: str = "subj_id", dst: str = "obj_id",
                    n_buckets: int = 64,
                    local_threshold: int = 1_000_000):
    """Exact integer modularity components of the label-propagation
    partition (Newman 2006 grain): Dataset(label, n_nodes, degree_sum,
    intra_edges) per community after exactly LABELPROP_ROUNDS synchronous
    rounds. Modularity Q = sum_c [ intra/m - (degree_sum/2m)^2 ] is one
    reader-side float; the exported columns are the exact integers, so
    the repo's bit-identical oracle rule holds with no float at all.

    Scale shape: the partition itself comes from
    :func:`label_propagation` (hybrid local/distributed); its label map
    and the distinct-neighbor degree map are entity-bounded driver dicts
    (the canonicalization-broadcast budget), so n_nodes / degree_sum fold
    on the driver; intra_edges is ONE broadcast-label pass over the
    undirected pair list with per-batch label-bounded partials — no
    shuffle beyond the und distinct."""
    import ray.data as rd

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    labels = {r["id"]: r["label"]
              for r in label_propagation(
                  edges, rounds, src, dst, n_buckets,
                  local_threshold).take_all()}  # entity-bounded
    deg = degree_map(und)

    n_nodes: dict[str, int] = {}
    degree_sum: dict[str, int] = {}
    for i, lbl in labels.items():
        n_nodes[lbl] = n_nodes.get(lbl, 0) + 1
        degree_sum[lbl] = degree_sum.get(lbl, 0) + int(deg.get(i, 0))

    lbl_ref = ray.put(labels)

    def intra_partial(b: pd.DataFrame, _ref=lbl_ref) -> pd.DataFrame:
        lbl = ray.get(_ref)
        la = b["a"].map(lbl)
        lb = b["b"].map(lbl)
        same = (la == lb).to_numpy()
        if not same.any():
            return pd.DataFrame({"label": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        vc = la[same].value_counts()
        return pd.DataFrame({"label": vc.index.to_numpy(dtype=object),
                             "n": vc.to_numpy(np.int64)})

    intra: dict[str, int] = {}
    for b in und.map_batches(intra_partial,
                             batch_format="pandas").iter_batches(
            batch_format="pandas", batch_size=None):
        for lbl, n in zip(b["label"], b["n"]):
            intra[lbl] = intra.get(lbl, 0) + int(n)

    out = sorted(n_nodes)
    return rd.from_arrow(pa.table({
        "label": pa.array(out, pa.string()),
        "n_nodes": pa.array([n_nodes[x] for x in out], pa.int64()),
        "degree_sum": pa.array([degree_sum[x] for x in out], pa.int64()),
        "intra_edges": pa.array([intra.get(x, 0) for x in out],
                                pa.int64()),
    }))


def two_hop_ball(edges, src: str = "subj_id", dst: str = "obj_id",
                 n_buckets: int = 64):
    """Per-node 2-hop ball size: Dataset(id, ball_size) — the number of
    DISTINCT nodes within <=2 hops (excluding the node itself) in the
    undirected simple graph. The neighborhood-explosion statistic a
    GNN-sampling / feature-propagation pipeline budgets fan-out by.

    Scale shape: the <=2-hop partner set of v is exactly neighbors(v)
    UNION {wedge mates of v} — both orientations of every per-center
    neighbor pair (the RA/jaccard wedge machinery) unioned with the
    adjacency, then ONE bucketed distinct + ONE bucketed count keyed by
    node. Cost is sum(deg^2) wedge rows, the same envelope as
    triangles/jaccard; no BFS rounds, no frontier state."""
    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    adj = _adjacency(und).materialize()  # read twice: direct + wedges

    def direct(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": b["id"], "p": b["nb"]})

    def wedges(sub: pd.DataFrame) -> pd.DataFrame:
        nbs = np.sort(sub["nb"].to_numpy(dtype=object))
        if len(nbs) < 2:
            return pd.DataFrame({"id": pd.Series([], dtype=object),
                                 "p": pd.Series([], dtype=object)})
        i, j = np.triu_indices(len(nbs), k=1)
        return pd.DataFrame({
            "id": np.concatenate([nbs[i], nbs[j]]),
            "p": np.concatenate([nbs[j], nbs[i]])})

    pairs = adj.map_batches(direct, batch_format="pandas").union(
        bucketed_group_pairs(adj, ["id"], wedges, n_buckets))
    dp = bucketed_distinct(pairs, ["id", "p"], n_buckets)
    return bucketed_count(dp, ["id"], name="ball_size",
                          n_buckets=n_buckets)


def modularity_summary(edges, rounds: int = LABELPROP_ROUNDS,
                       src: str = "subj_id", dst: str = "obj_id",
                       n_buckets: int = 64,
                       local_threshold: int = 1_000_000):
    """Global Newman modularity (Newman 2006) of the label-propagation
    partition: ONE row (n_communities, n_edges, intra_edges, deg_sq_sum,
    modularity) where Q = sum_c [intra_c/m - (D_c/2m)^2] is evaluated as
    the exact integer rational (4*m*intra - sum D_c^2) / (4*m^2) — all
    partial sums are order-free int64, the float is ONE double division
    (float(num)/float(den), the same double-cast-then-divide the oracle's
    CAST(...AS DOUBLE)/den performs). m falls out of the partition stats
    themselves (sum of degree sums = 2m), so no extra edge pass.

    Scale shape: everything heavy lives in :func:`community_stats`
    (hybrid label-prop + one broadcast-label pass over und); the fold
    here is over the community-bounded stats table in a single block."""
    stats = community_stats(edges, rounds, src, dst, n_buckets,
                            local_threshold)

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        ds = b["degree_sum"].to_numpy(np.int64)
        intra = int(b["intra_edges"].sum())
        dss = int((ds * ds).sum())
        m = int(ds.sum()) // 2
        num, den = 4 * m * intra - dss, 4 * m * m
        q = float(num) / float(den) if m else 0.0  # ONE division
        return pd.DataFrame({
            "n_communities": pd.Series([len(b)], dtype="int64"),
            "n_edges": pd.Series([m], dtype="int64"),
            "intra_edges": pd.Series([intra], dtype="int64"),
            "deg_sq_sum": pd.Series([dss], dtype="int64"),
            "modularity": pd.Series([q], dtype="float64")})

    return (stats.repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def degree_histogram(edges, src: str = "subj_id", dst: str = "obj_id",
                     n_buckets: int = 64):
    """Degree distribution of the undirected simple graph:
    Dataset(deg, n_nodes) — the power-law tail report. One exact
    bucketed per-node count, then per-batch value_counts partials folded
    in a single degree-domain-bounded block (max-degree keys, never
    node-scale)."""
    und = undirected_pairs(edges, src, dst, n_buckets)
    deg = bucketed_count(_adjacency(und), ["id"], name="deg",
                         n_buckets=n_buckets)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["deg"].value_counts()
        return pd.DataFrame({"deg": vc.index.to_numpy(np.int64),
                             "n_nodes": vc.to_numpy(np.int64)})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("deg", sort=True, as_index=False)["n_nodes"].sum()
        return out.astype({"deg": "int64", "n_nodes": "int64"})

    return (deg.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def type_inference(edges, type_map: dict[str, str],
                   src: str = "subj_id", dst: str = "obj_id",
                   n_buckets: int = 64):
    """Semi-supervised node-type inference eval (the KG-completion
    probe): hold out the types of nodes whose CURIE numeric suffix is
    ODD, predict each held-out node's type by MAJORITY VOTE over its
    SEED (even-suffix) neighbors' true types (ties -> lexicographically
    smallest type), and score against the ground truth —
    Dataset(node_type, n_eval, n_correct, accuracy) per TRUE type over
    eval nodes with at least one seed neighbor.

    Scale shape: the type map is entity-bounded broadcast state (the
    canonicalization budget); votes are ONE bucketed count exchange on
    (id, type) with the argmax inside the bucket; scoring folds in an
    enum-bounded block. One division per row."""
    import ray
    import ray.data as rd

    from ..functions.bucketing import bucketed_apply

    import re as _re

    def _suffix(curie: str) -> int | None:
        """Trailing digit run of the CURIE (None when absent) — the
        deterministic seed/eval split key, mirrored by the oracle's
        regexp_extract('([0-9]+)$')."""
        m = _re.search(r"(\d+)$", curie)
        return int(m.group(1)) if m else None

    def suffix_odd(curie: str) -> bool:
        s = _suffix(curie)
        return s is not None and s % 2 == 1

    def suffix_even(curie: str) -> bool:
        s = _suffix(curie)
        return s is not None and s % 2 == 0

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    tm_ref = ray.put(type_map)

    def vote_partial(b: pd.DataFrame, _ref=tm_ref) -> pd.DataFrame:
        tm = ray.get(_ref)
        frames = []
        for idc, nbc in (("a", "b"), ("b", "a")):
            ids = b[idc].to_numpy(dtype=object)
            nbs = b[nbc].to_numpy(dtype=object)
            keep = np.array([suffix_odd(i) and suffix_even(n)
                             and n in tm for i, n in zip(ids, nbs)],
                            dtype=bool)
            if keep.any():
                frames.append(pd.DataFrame({
                    "id": ids[keep],
                    "t": [tm[n] for n in nbs[keep]]}))
        if not frames:
            return pd.DataFrame({"id": pd.Series([], dtype=object),
                                 "t": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype="int64")})
        out = (pd.concat(frames, ignore_index=True)
               .groupby(["id", "t"], sort=False).size()
               .rename("c").reset_index())
        out["c"] = out["c"].astype("int64")
        return out

    def predict(g: pd.DataFrame, _ref=tm_ref) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"tt": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64"),
                                 "ok": pd.Series([], dtype="int64")})
        tm = ray.get(_ref)
        g = (g.groupby(["id", "t"], sort=False, as_index=False)["c"]
             .sum()
             .sort_values(["id", "c", "t"],
                          ascending=[True, False, True],
                          kind="mergesort")
             .drop_duplicates("id"))
        truth = g["id"].map(tm)
        keep = truth.notna()
        g, truth = g[keep], truth[keep]
        out = pd.DataFrame({"tt": truth.to_numpy(dtype=object),
                            "ok": (g["t"].to_numpy(dtype=object)
                                   == truth.to_numpy(
                                       dtype=object)).astype(np.int64)})
        agg = out.groupby("tt", sort=False).agg(
            n=("ok", "size"), ok=("ok", "sum")).reset_index()
        return agg.astype({"n": "int64", "ok": "int64"})

    partials = bucketed_apply(
        und.map_batches(vote_partial, batch_format="pandas"),
        ["id"], predict, None, n_buckets)

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("tt", as_index=False)[["n", "ok"]].sum()
        return pd.DataFrame({
            "node_type": g["tt"].astype(object),
            "n_eval": g["n"].astype("int64"),
            "n_correct": g["ok"].astype("int64"),
            "accuracy": (g["ok"].to_numpy(np.int64)
                         / g["n"].to_numpy(np.int64).astype(
                             np.float64))})

    seed = rd.from_arrow(pa.table({
        "node_type": pa.array([], pa.string()),
        "n_eval": pa.array([], pa.int64()),
        "n_correct": pa.array([], pa.int64()),
        "accuracy": pa.array([], pa.float64()),
    }))
    return (partials.repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None)
            .union(seed))


def transitivity(edges, src: str = "subj_id", dst: str = "obj_id",
                 n_buckets: int = 64):
    """Global transitivity (Newman 2003): ONE row (n_wedges,
    n_closed, transitivity) over the undirected simple graph —
    n_wedges = sum C(deg, 2), n_closed = sum per-node triangle counts
    (= 3x the triangle total), transitivity their single division.
    The whole-graph companion of the per-node clustering coefficient.

    Scale shape: composition only — the exact per-node triangle counts
    and the degree histogram both exist; their scalar sums fold from
    degree-domain / node-bounded outputs."""
    import ray.data as rd

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    deg = bucketed_count(_adjacency(und), ["id"], name="deg",
                         n_buckets=n_buckets)
    tri = triangles_per_node(edges, src, dst, n_buckets)

    def wedge_partial(b: pd.DataFrame) -> pd.DataFrame:
        d = b["deg"].to_numpy(np.int64)
        return pd.DataFrame({"w": [int((d * (d - 1) // 2).sum())],
                             "t": [0]})

    def tri_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"w": [0], "t": [int(b["n_triangles"].sum())]})

    u = deg.map_batches(wedge_partial, batch_format="pandas").union(
        tri.map_batches(tri_partial, batch_format="pandas"))

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        w, t = int(b["w"].sum()), int(b["t"].sum())
        return pd.DataFrame({
            "n_wedges": pd.Series([w], dtype="int64"),
            "n_closed": pd.Series([t], dtype="int64"),
            "transitivity": pd.Series(
                [float(t) / float(w) if w else 0.0], dtype="float64")})

    return (u.repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def triad_motifs(edges, src: str = "subj_id", dst: str = "obj_id",
                 n_buckets: int = 64):
    """Directed triad motif counts over the distinct (s -> o) simple
    digraph: ONE row (n_paths, n_transitive, n_cyclic) — length-2
    directed paths a->m->c (a != c), how many close transitively
    (a->c present) and how many close cyclically (c->a present; each
    3-cycle closes at all three rotations, so the count divides by 3).
    The feed-forward-vs-feedback structure signal (Milo et al. 2002).

    Scale shape: per-mid path generation is one bucketed group exchange
    over the union of in- and out-adjacency (sum(in_deg x out_deg)
    rows — the directed wedge envelope; salt/cap hubs if a corpus ever
    grows super-hubs), then each closure test is ONE bucketed semi of
    path rows against the edge-key set. Counts fold driver-side from
    block counts; no driver-scale state."""
    import ray.data as rd

    from ..functions.bucketing import (bucketed_distinct,
                                       bucketed_group_pairs, bucketed_semi)

    def depairs(b: pd.DataFrame) -> pd.DataFrame:
        m = (b[src] != b[dst]).to_numpy()
        return pd.DataFrame({"a": b[src][m], "b": b[dst][m]})

    de = bucketed_distinct(
        edges.select_columns([src, dst]).map_batches(
            depairs, batch_format="pandas"),
        ["a", "b"], n_buckets).materialize()  # read three times

    def tag_in(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"mid": b["b"], "nb": b["a"],
                             "is_in": np.ones(len(b), dtype=np.int64)})

    def tag_out(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"mid": b["a"], "nb": b["b"],
                             "is_in": np.zeros(len(b), dtype=np.int64)})

    def paths_fn(sub: pd.DataFrame) -> pd.DataFrame:
        ins = sub.loc[sub["is_in"] == 1, "nb"].to_numpy(dtype=object)
        outs = sub.loc[sub["is_in"] == 0, "nb"].to_numpy(dtype=object)
        empty = pd.DataFrame({"x": pd.Series([], dtype=object),
                              "y": pd.Series([], dtype=object)})
        if len(ins) == 0 or len(outs) == 0:
            return empty
        x = np.repeat(ins, len(outs))
        y = np.tile(outs, len(ins))
        keep = x != y
        return pd.DataFrame({"x": x[keep], "y": y[keep]})

    adj2 = de.map_batches(tag_in, batch_format="pandas").union(
        de.map_batches(tag_out, batch_format="pandas"))
    paths = bucketed_group_pairs(adj2, ["mid"], paths_fn,
                                 n_buckets).materialize()  # read twice

    def pkey(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["x"] + _SEP + b["y"]})

    def pkey_rev(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["y"] + _SEP + b["x"]})

    def ekey(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["a"] + _SEP + b["b"]})

    ek = de.map_batches(ekey, batch_format="pandas")
    closed_t = bucketed_semi(
        paths.map_batches(pkey, batch_format="pandas"), ek,
        left_on="k", right_on="k", left_cols=["k"], n_buckets=n_buckets,
        empty_dtypes={"k": object})
    closed_c = bucketed_semi(
        paths.map_batches(pkey_rev, batch_format="pandas"), ek,
        left_on="k", right_on="k", left_cols=["k"], n_buckets=n_buckets,
        empty_dtypes={"k": object})

    n_paths = paths.count()
    n_trans = closed_t.count()
    cx3 = closed_c.count()
    return rd.from_arrow(pa.table({
        "n_paths": pa.array([n_paths], pa.int64()),
        "n_transitive": pa.array([n_trans], pa.int64()),
        "n_cyclic": pa.array([cx3 // 3], pa.int64()),
    }))


GROWTH_HOUR_US = 3_600_000_000


def growth_trace(canonical, transcripts, n_buckets: int = 64):
    """Temporal KG densification trace (Leskovec et al. 2005 grain):
    Dataset(hour, new_nodes, new_edges, cum_nodes, cum_edges) — per hour
    of transcript time, how many nodes / distinct (s,p,o) edges are seen
    for the FIRST time, plus the cumulative curves. The audit a
    continuously-ingesting KG build watches for densification /
    ingestion stalls.

    Scale shape: turn timestamps attach to triples through ONE bucketed
    exchange keyed by (conv, turn) — both sides fact-scale, no driver
    state; first-seen times are two bucketed mins (edge key, node id);
    the hour histogram folds in one hour-domain-bounded block where the
    cumulative sums are a prefix scan over sorted hours. All integers."""
    from ..functions.bucketing import bucketed_attach, bucketed_min

    def prep_turns(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "tkey": (b["conv_id"].astype(str) + _SEP
                     + b["turn_idx"].astype("int64").astype(str)),
            "t": b["ts"].astype("datetime64[us]").astype("int64")})

    def prep_triples(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "tkey": (b["conv_id"].astype(str) + _SEP
                     + b["turn_idx"].astype("int64").astype(str)),
            "subj_id": b["subj_id"], "pred_id": b["pred_id"],
            "obj_id": b["obj_id"]})

    turns = transcripts.map_batches(prep_turns, batch_format="pandas")
    # materialize the actor-pool lineage before the union+groupby inside
    # bucketed_attach (live actor lineage + union stalls the streaming
    # executor — CLAUDE.md invariant; triples are the smaller branch)
    trips = canonical.map_batches(prep_triples,
                                  batch_format="pandas").materialize()
    timed = bucketed_attach(
        trips, turns, left_on="tkey", right_on="tkey",
        left_cols=["subj_id", "pred_id", "obj_id"], payload={"t": "t"},
        payload_fill=0, n_buckets=n_buckets,
        empty_dtypes={"subj_id": object, "pred_id": object,
                      "obj_id": object, "t": "int64"})

    def ekey(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": b["subj_id"] + _SEP + b["pred_id"] + _SEP + b["obj_id"],
            "t": b["t"].astype("int64")})

    def nkey(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": np.concatenate([b["subj_id"].to_numpy(dtype=object),
                                 b["obj_id"].to_numpy(dtype=object)]),
            "t": np.concatenate([b["t"].to_numpy(np.int64)] * 2)})

    efirst = bucketed_min(timed.map_batches(ekey, batch_format="pandas"),
                          ["k"], "t", n_buckets=n_buckets)
    nfirst = bucketed_min(timed.map_batches(nkey, batch_format="pandas"),
                          ["k"], "t", n_buckets=n_buckets)

    def hist(b: pd.DataFrame, col: str) -> pd.DataFrame:
        vc = (b["t"].to_numpy(np.int64) // GROWTH_HOUR_US)
        s = pd.Series(vc).value_counts()
        out = pd.DataFrame({"hour": s.index.to_numpy(np.int64),
                            "nn": np.zeros(len(s), dtype=np.int64),
                            "ne": np.zeros(len(s), dtype=np.int64)})
        out[col] = s.to_numpy(np.int64)
        return out

    import functools

    h = nfirst.map_batches(functools.partial(hist, col="nn"),
                           batch_format="pandas").union(
        efirst.map_batches(functools.partial(hist, col="ne"),
                           batch_format="pandas"))

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("hour", as_index=False)[["nn", "ne"]].sum()
        g = g.sort_values("hour").reset_index(drop=True)
        return pd.DataFrame({
            "hour": g["hour"].astype("int64"),
            "new_nodes": g["nn"].astype("int64"),
            "new_edges": g["ne"].astype("int64"),
            "cum_nodes": g["nn"].cumsum().astype("int64"),
            "cum_edges": g["ne"].cumsum().astype("int64")})

    return (h.repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def mention_trend(canonical, transcripts, n_buckets: int = 64):
    """Rising-entity detection: Dataset(id, n_mentions, slope) — per
    canonical entity, the OLS slope of its hourly mention-count series
    over the GLOBAL mention-hour span (missing hours count 0; hours
    re-based to the span start so moments stay small). slope =
    (H*Sxy - Sx*Sy) / (H*Sxx - Sx^2): every moment is an exact int64
    (zero-hours contribute nothing to Sy/Sxy, and H, Sx, Sxx are span
    constants), the slope is ONE double division — the trend audit a
    continuously-ingesting KG watches for emerging entities.

    Scale shape: shares :func:`growth_trace`'s single (conv, turn)
    bucketed timestamp attach; mention counts are ONE bucketed count on
    (id, hour); the per-entity fold is entity-bounded."""
    import ray.data as rd

    from ..functions.bucketing import bucketed_attach, bucketed_count

    def prep_turns(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "tkey": (b["conv_id"].astype(str) + _SEP
                     + b["turn_idx"].astype("int64").astype(str)),
            "t": b["ts"].astype("datetime64[us]").astype("int64")})

    def prep_triples(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "tkey": (b["conv_id"].astype(str) + _SEP
                     + b["turn_idx"].astype("int64").astype(str)),
            "subj_id": b["subj_id"], "obj_id": b["obj_id"]})

    turns = transcripts.map_batches(prep_turns, batch_format="pandas")
    trips = canonical.map_batches(prep_triples,
                                  batch_format="pandas").materialize()
    timed = bucketed_attach(
        trips, turns, left_on="tkey", right_on="tkey",
        left_cols=["subj_id", "obj_id"], payload={"t": "t"},
        payload_fill=0, n_buckets=n_buckets,
        empty_dtypes={"subj_id": object, "obj_id": object, "t": "int64"})

    def mention_rows(b: pd.DataFrame) -> pd.DataFrame:
        h = b["t"].to_numpy(np.int64) // GROWTH_HOUR_US
        return pd.DataFrame({
            "id": np.concatenate([b["subj_id"].to_numpy(dtype=object),
                                  b["obj_id"].to_numpy(dtype=object)]),
            "hour": np.concatenate([h, h])})

    counts = bucketed_count(
        timed.map_batches(mention_rows, batch_format="pandas"),
        ["id", "hour"], name="c", n_buckets=n_buckets).materialize()

    hmin = int(counts.min("hour"))
    hmax = int(counts.max("hour"))
    span = hmax - hmin + 1  # H
    sx = span * (span - 1) // 2
    sxx = (span - 1) * span * (2 * span - 1) // 6
    den = span * sxx - sx * sx

    def per_entity(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"id": pd.Series([], dtype=object),
                                 "n_mentions": pd.Series([], dtype="int64"),
                                 "slope": pd.Series([], dtype="float64")})
        x = g["hour"].to_numpy(np.int64) - hmin
        c = g["c"].to_numpy(np.int64)
        g = pd.DataFrame({"id": g["id"], "c": c, "xc": x * c})
        agg = g.groupby("id", sort=False, as_index=False)[
            ["c", "xc"]].sum()
        sy = agg["c"].to_numpy(np.int64)
        sxy = agg["xc"].to_numpy(np.int64)
        num = span * sxy - sx * sy
        slope = (num.astype(np.float64) / float(den) if den
                 else np.zeros(len(agg)))
        return pd.DataFrame({"id": agg["id"],
                             "n_mentions": sy,
                             "slope": slope})

    from ..functions.bucketing import bucketed_apply

    return bucketed_apply(counts, ["id"], per_entity, None, n_buckets)


def rich_club(edges, src: str = "subj_id", dst: str = "obj_id",
              n_buckets: int = 64):
    """Rich-club coefficient curve (Colizza et al. 2006):
    Dataset(k, n_nodes, n_edges, phi) for k = 0..deg_max-1 where the
    >k-degree club has >= 2 members — phi(k) = 2*E_k / (N_k*(N_k-1)),
    the density of the subgraph induced by nodes of degree > k. The
    hub-interconnection diagnostic for scale-free graphs.

    Scale shape: per-node degrees (one bucketed count) attach to both
    endpoints of every undirected edge through TWO bucketed exchanges;
    each edge then reduces to min(deg_a, deg_b) and both the edge-min
    and node-degree histograms fold in one degree-domain-bounded block
    where E_k / N_k are suffix sums. The float is ONE division per
    output row of two exact ints."""
    from ..functions.bucketing import bucketed_attach

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    deg = bucketed_count(_adjacency(und), ["id"], name="deg",
                         n_buckets=n_buckets)

    def deg_src(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": b["id"],
                             "deg": b["deg"].astype(np.int64)})

    degs = deg.map_batches(deg_src, batch_format="pandas").materialize()

    e1 = bucketed_attach(
        und, degs, left_on="a", right_on="id",
        left_cols=["a", "b"], payload={"deg": "deg_a"},
        payload_fill=0, n_buckets=n_buckets,
        empty_dtypes={"a": object, "b": object, "deg_a": "int64"})
    e2 = bucketed_attach(
        e1, degs, left_on="b", right_on="id",
        left_cols=["a", "b", "deg_a"], payload={"deg": "deg_b"},
        payload_fill=0, left_fill={"deg_a": 0}, n_buckets=n_buckets,
        empty_dtypes={"a": object, "b": object, "deg_a": "int64",
                      "deg_b": "int64"})

    def edge_min_hist(b: pd.DataFrame) -> pd.DataFrame:
        m = np.minimum(b["deg_a"].to_numpy(np.int64),
                       b["deg_b"].to_numpy(np.int64))
        vc = pd.Series(m).value_counts()
        return pd.DataFrame({"d": vc.index.to_numpy(np.int64),
                             "n_e": vc.to_numpy(np.int64),
                             "n_v": np.zeros(len(vc), dtype=np.int64)})

    def node_hist(b: pd.DataFrame) -> pd.DataFrame:
        vc = b["deg"].value_counts()
        return pd.DataFrame({"d": vc.index.to_numpy(np.int64),
                             "n_e": np.zeros(len(vc), dtype=np.int64),
                             "n_v": vc.to_numpy(np.int64)})

    hist = e2.map_batches(edge_min_hist, batch_format="pandas").union(
        deg.map_batches(node_hist, batch_format="pandas"))

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("d", as_index=False)[["n_e", "n_v"]].sum()
        g = g.sort_values("d")
        ds_, ne, nv = (g["d"].to_numpy(np.int64),
                       g["n_e"].to_numpy(np.int64),
                       g["n_v"].to_numpy(np.int64))
        dmax = int(ds_.max()) if len(ds_) else 0
        ks, nks, eks, phis = [], [], [], []
        for k in range(dmax):
            nk = int(nv[ds_ > k].sum())
            if nk < 2:
                continue
            ek = int(ne[ds_ > k].sum())
            ks.append(k); nks.append(nk); eks.append(ek)
            phis.append(float(2 * ek) / float(nk * (nk - 1)))
        return pd.DataFrame({
            "k": pd.Series(ks, dtype="int64"),
            "n_nodes": pd.Series(nks, dtype="int64"),
            "n_edges": pd.Series(eks, dtype="int64"),
            "phi": pd.Series(phis, dtype="float64")})

    return (hist.repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def powerlaw_alpha(edges, src: str = "subj_id", dst: str = "obj_id",
                   n_buckets: int = 64, quant: int = RA_QUANT):
    """Continuous power-law MLE exponent over the degree distribution
    (Clauset, Shalizi & Newman 2009, eq. 3.1 with x_min = 1):
    alpha = 1 + n / sum_i ln(d_i) — ONE row (n_nodes, deg_max,
    lnsum_q, alpha). Each ln(d) term is quantized to
    ``floor(quant * ln(d))`` (libm log on both sides, the Adamic-Adar
    trick) so the degree-weighted sum is an order-free int64 and the
    float is one division plus one add, bit-identical to the oracle.
    Degenerate all-degree-1 graphs (lnsum 0) report alpha = 0.0.

    Scale shape: rides :func:`degree_histogram` (one bucketed count +
    degree-domain-bounded fold); this fold touches max-degree rows."""
    import math

    hist = degree_histogram(edges, src, dst, n_buckets)

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        degs = b["deg"].to_numpy(np.int64)
        ns = b["n_nodes"].to_numpy(np.int64)
        t = np.fromiter((int(quant * math.log(int(d))) for d in degs),
                        np.int64, len(degs))
        n, s = int(ns.sum()), int((ns * t).sum())
        alpha = 1.0 + float(quant * n) / float(s) if s else 0.0
        return pd.DataFrame({
            "n_nodes": pd.Series([n], dtype="int64"),
            "deg_max": pd.Series([int(degs.max()) if len(degs) else 0],
                                 dtype="int64"),
            "lnsum_q": pd.Series([s], dtype="int64"),
            "alpha": pd.Series([alpha], dtype="float64")})

    return hist.repartition(1).map_batches(fold, batch_format="pandas",
                                           batch_size=None)


def bfs_tree(edges, type_map: dict[str, str] | None, seed_type: str,
             rounds: int = BFS_ROUNDS,
             src: str = "subj_id", dst: str = "obj_id",
             n_buckets: int = 64, local_threshold: int = 1_000_000):
    """BFS spanning FOREST with parent pointers (path reconstruction —
    the piece :func:`bfs_distances` omits): Dataset(id, dist, parent)
    where parent is the lexicographically smallest neighbor one hop
    closer to the seed set ('' for the dist-0 seeds). Walking parent
    links reconstructs one canonical shortest path per node.

    Scale shape: distances come from :func:`bfs_distances` (hybrid
    local/distributed, node-bounded result — the gazetteer-universe
    budget); parents are ONE broadcast-distance candidate pass over the
    adjacency + one id-bucketed string-min exchange. Deterministic by
    construction: the min-parent rule needs no tie order."""
    import ray.data as rd

    dist = {r["id"]: int(r["dist"])
            for r in bfs_distances(edges, type_map, seed_type, rounds,
                                   src, dst, n_buckets,
                                   local_threshold).take_all()}
    empty = pa.table({"id": pa.array([], pa.string()),
                      "dist": pa.array([], pa.int64()),
                      "parent": pa.array([], pa.string())})
    if not dist:
        return rd.from_arrow(empty)
    und = undirected_pairs(edges, src, dst, n_buckets)
    dist_ref = ray.put(dist)

    def cand(b: pd.DataFrame, _ref=dist_ref) -> pd.DataFrame:
        d = ray.get(_ref)
        i = b["id"].to_numpy(dtype=object)
        n = b["nb"].to_numpy(dtype=object)
        rows_i, rows_p = [], []
        for x, y in zip(i, n):
            dx = d.get(x)
            if dx is not None and d.get(y) == dx - 1:
                rows_i.append(x)
                rows_p.append(y)
        return pd.DataFrame({"id": pd.Series(rows_i, dtype=object),
                             "parent": pd.Series(rows_p, dtype=object)})

    parent: dict[str, str] = {}
    for b in bucketed_min(
            _adjacency(und).map_batches(cand, batch_format="pandas"),
            ["id"], "parent", n_buckets=min(n_buckets, 16)).iter_batches(
            batch_format="pandas", batch_size=None):
        for x, p in zip(b["id"], b["parent"]):
            if x not in parent or p < parent[x]:
                parent[x] = p
    ids = sorted(dist)
    return rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.string()),
        "dist": pa.array([dist[i] for i in ids], pa.int64()),
        "parent": pa.array([parent.get(i, "") for i in ids], pa.string()),
    }))


# -------------------------------------------- directed min-label (SCC)

SCC_ROUNDS = 3


def directed_pairs(edges, src: str = "subj_id", dst: str = "obj_id",
                   n_buckets: int = 64):
    """Distinct DIRECTED (a -> b) pairs, self-loops dropped — unlike
    :func:`undirected_pairs`, orientation is preserved (the subj -> obj
    assertion direction every other graph op here collapses)."""

    def canon(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t[src].combine_chunks().cast(pa.string())
        o = t[dst].combine_chunks().cast(pa.string())
        keep = pc.not_equal(s, o)
        return pa.table({"a": s.filter(keep), "b": o.filter(keep)})

    return bucketed_distinct(
        edges.map_batches(canon, batch_format="pyarrow"), ["a", "b"],
        n_buckets)


def _min_label_rounds(de, ids, rounds: int, reverse: bool,
                      local: bool) -> dict[str, str]:
    """``rounds`` synchronous rounds of label(v) = min(label(v),
    min over incoming edges u->v of label(u)), labels initialized to the
    node's own id; ``reverse`` propagates against edge direction."""
    labels = {i: i for i in ids}
    if local:
        frames = list(de.iter_batches(batch_format="pandas",
                                      batch_size=65536))
        df = (pd.concat(frames, ignore_index=True) if frames
              else pd.DataFrame({"a": [], "b": []}))
        srcs = df["b" if reverse else "a"].to_numpy(dtype=object)
        dsts = df["a" if reverse else "b"].to_numpy(dtype=object)
        for _ in range(rounds):
            nxt = dict(labels)
            for u, v in zip(srcs, dsts):
                lu = labels[u]
                if lu < nxt[v]:
                    nxt[v] = lu
            labels = nxt
        return labels
    for _ in range(rounds):
        ref = ray.put(labels)

        def push(b: pd.DataFrame, _ref=ref, _rev=reverse) -> pd.DataFrame:
            lbl = ray.get(_ref)
            u = b["b" if _rev else "a"]
            v = b["a" if _rev else "b"]
            return pd.DataFrame({"id": v.to_numpy(dtype=object),
                                 "l": u.map(lbl).to_numpy(dtype=object)})

        parts = coalesced_count(de.map_batches(push,
                                               batch_format="pandas"),
                                ["id", "l"], name="c")
        nxt = dict(labels)
        for b in parts.iter_batches(batch_format="pandas",
                                    batch_size=None):
            for v, l in zip(b["id"], b["l"]):
                if l < nxt[v]:
                    nxt[v] = l
        labels = nxt
    return labels


def scc_labels(edges, rounds: int = SCC_ROUNDS,
               src: str = "subj_id", dst: str = "obj_id",
               n_buckets: int = 64, local_threshold: int = 1_000_000):
    """Fixed-round forward/backward min-label propagation over the
    DIRECTED simple graph (the ColorMin / FW-BW SCC grain, Orzan 2004):
    Dataset(id, fwd_label, bwd_label, settled) — after exactly
    ``rounds`` synchronous rounds each node carries the smallest id that
    reaches it along edges (fwd) and against them (bwd);
    ``settled = (fwd == bwd)`` marks nodes whose strongly-connected
    component root is already decided (equal min-ancestor and
    min-descendant witness). ``rounds`` is a SPEC constant like
    KCORE_ROUNDS — converged or not, both engine paths and the unrolled
    oracle agree bit-for-bit. The first DIRECTED-graph analytic here:
    every other metric collapses the subj -> obj orientation.

    Hybrid scale shape: under the gate two driver passes; above it each
    round is one broadcast-label edge pass + one coalesced (id, label)
    fold per direction (label dict node-bounded, the components/BFS
    budget)."""
    import ray.data as rd

    de = directed_pairs(edges, src, dst, n_buckets).materialize()
    ids = set(degree_map(de))  # node-bounded coalesced collect
    local = de.count() <= local_threshold
    fwd = _min_label_rounds(de, ids, rounds, False, local)
    bwd = _min_label_rounds(de, ids, rounds, True, local)
    out = sorted(ids)
    return rd.from_arrow(pa.table({
        "id": pa.array(out, pa.string()),
        "fwd_label": pa.array([fwd[i] for i in out], pa.string()),
        "bwd_label": pa.array([bwd[i] for i in out], pa.string()),
        "settled": pa.array([fwd[i] == bwd[i] for i in out], pa.bool_()),
    }))


def reciprocity(edges, src: str = "subj_id", dst: str = "obj_id",
                n_buckets: int = 64):
    """Directed-graph reciprocity (Newman 2002 grain): one row
    (n_directed, n_mutual, reciprocity) — how many distinct a -> b
    assertions have the reverse b -> a also asserted. n_mutual counts
    DIRECTED edges in mutual pairs (both directions counted, the
    standard r = L_bidir / L definition); the share is ONE division of
    exact ints. One composite-key bucketed semi-join (edge vs reversed
    edge), two scalar folds — no driver edge state."""
    import ray.data as rd

    from ..functions.bucketing import bucketed_semi

    de = directed_pairs(edges, src, dst, n_buckets).materialize()

    def fwd_key(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["a"] + _SEP + b["b"]})

    def rev_key(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": b["b"] + _SEP + b["a"]})

    mutual = bucketed_semi(
        de.map_batches(fwd_key, batch_format="pandas"),
        de.map_batches(rev_key, batch_format="pandas"),
        left_on="k", right_on="k", left_cols=["k"],
        n_buckets=n_buckets, empty_dtypes={"k": object})

    def count_of(ds) -> int:
        n = 0
        for b in ds.map_batches(
                lambda g: pd.DataFrame({"n": [len(g)]}),
                batch_format="pandas").iter_batches(
                batch_format="pandas", batch_size=None):
            n += int(b["n"].sum())
        return n

    n_dir = count_of(de)
    n_mut = count_of(mutual)
    return rd.from_arrow(pa.table({
        "n_directed": pa.array([n_dir], pa.int64()),
        "n_mutual": pa.array([n_mut], pa.int64()),
        "reciprocity": pa.array(
            [n_mut / n_dir if n_dir else 0.0], pa.float64()),
    }))


def in_out_degree(edges, src: str = "subj_id", dst: str = "obj_id",
                  n_buckets: int = 64):
    """Per-node DIRECTED degrees: Dataset(id, out_deg, in_deg) over the
    distinct subj -> obj pairs — source/sink asymmetry the undirected
    degree map erases. Two key-bucketed counts reconciled by ONE
    `bucketing.bucketed_outer_unique` exchange (nodes appearing only as
    subject or only as object keep a typed 0 on the absent side)."""
    from ..functions.bucketing import bucketed_count, bucketed_outer_unique

    de = directed_pairs(edges, src, dst, n_buckets).materialize()

    def col(name_in: str, name_out: str):
        def pick(b: pd.DataFrame, _c=name_in, _o=name_out) -> pd.DataFrame:
            return pd.DataFrame({"id": b[_c]})

        return bucketed_count(
            de.map_batches(pick, batch_format="pandas"), ["id"],
            name=name_out, n_buckets=n_buckets)

    return bucketed_outer_unique(
        col("a", "out_deg"), col("b", "in_deg"), on="id",
        left_vals=["out_deg"], right_vals=["in_deg"],
        fills={"out_deg": np.int64(0), "in_deg": np.int64(0)},
        n_buckets=n_buckets)


TOPO_ROUNDS = 3


def topo_levels(edges, rounds: int = TOPO_ROUNDS,
                src: str = "subj_id", dst: str = "obj_id",
                n_buckets: int = 64, local_threshold: int = 1_000_000):
    """Fixed-round longest-path layering of the DIRECTED simple graph
    (topological levels on the DAG part): Dataset(id, level) where after
    exactly ``rounds`` synchronous rounds level(v) = max(level(v),
    1 + max over incoming u -> v of level(u)), levels starting at 0 —
    sources stay 0, a node's level is the longest incoming path seen so
    far, and members of cycles climb to ``rounds`` (the unconverged
    marker, spec'd like every fixed-round metric here). Same hybrid
    shape as :func:`scc_labels`: per round one broadcast-level edge pass
    + one coalesced (id, level) max fold, node-bounded driver state."""
    import ray.data as rd

    de = directed_pairs(edges, src, dst, n_buckets).materialize()
    ids = set(degree_map(de))  # node-bounded coalesced collect
    empty = pa.table({"id": pa.array([], pa.string()),
                      "level": pa.array([], pa.int64())})
    if not ids:
        return rd.from_arrow(empty)
    levels = {i: 0 for i in ids}
    if de.count() <= local_threshold:
        frames = list(de.iter_batches(batch_format="pandas",
                                      batch_size=65536))
        df = (pd.concat(frames, ignore_index=True) if frames
              else pd.DataFrame({"a": [], "b": []}))
        aa = df["a"].to_numpy(dtype=object)
        bb = df["b"].to_numpy(dtype=object)
        for _ in range(rounds):
            nxt = dict(levels)
            for u, v in zip(aa, bb):
                c = levels[u] + 1
                if c > nxt[v]:
                    nxt[v] = c
            levels = nxt
    else:
        # ---- distributed path (pinned by tests, local_threshold=0) ----
        for _ in range(rounds):
            ref = ray.put(levels)

            def push(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
                lv = ray.get(_ref)
                return pd.DataFrame({
                    "id": b["b"].to_numpy(dtype=object),
                    "l": (b["a"].map(lv) + 1).to_numpy(np.int64)})

            parts = coalesced_count(
                de.map_batches(push, batch_format="pandas"), ["id", "l"],
                name="c")
            nxt = dict(levels)
            for b in parts.iter_batches(batch_format="pandas",
                                        batch_size=None):
                for v, l in zip(b["id"], b["l"]):
                    if l > nxt[v]:
                        nxt[v] = int(l)
            levels = nxt
    out = sorted(levels)
    return rd.from_arrow(pa.table({
        "id": pa.array(out, pa.string()),
        "level": pa.array([levels[i] for i in out], pa.int64())}))


# --------------------------------------------- maximal matching (Luby grain)

MATCHING_ROUNDS = 3


def _match_key(a: str, b: str) -> str:
    import hashlib

    # md5 over the canonical "a|b" pair (DuckDB md5() parity); the pair
    # suffix only breaks the astronomically-unlikely digest collision, so
    # every edge key is unique and "min of both endpoints" needs no ties
    return (hashlib.md5((a + "|" + b).encode("utf-8")).hexdigest()
            + "|" + a + "|" + b)


def maximal_matching(edges, rounds: int = MATCHING_ROUNDS,
                     src: str = "subj_id", dst: str = "obj_id",
                     n_buckets: int = 64,
                     local_threshold: int = 1_000_000):
    """Fixed-round deterministic Luby-style MAXIMAL MATCHING over the
    undirected simple graph: Dataset(a, b, match_round) — per round,
    every still-active edge whose key md5(a|b) is the minimum among the
    active edges incident to BOTH its endpoints joins the matching, then
    its endpoints (and thus every edge touching them) deactivate.
    ``rounds`` is a SPEC constant unrolled identically in the SQL oracle
    (like MIS_ROUNDS); edges still undecided after ``rounds`` are simply
    absent. Keys are unique (digest + pair tie-break), so two winners can
    never share a node — matching validity is structural.

    The graph-coarsening primitive (multilevel partitioners contract a
    maximal matching per level); the reference defers this grain to its
    neo4j sink (`builder/builder.py:497-521`). Hybrid scale shape (gate
    as MIS): under the gate one driver pandas fold; above it each round
    is ONE bucketed min-key exchange over the exploded incidence list
    (edge-grain, never all-pairs) plus a broadcast-winner filter pass.
    Driver state is node-bounded (per-node min key + matched set — the
    canonicalization broadcast's budget); winner edges per round are
    <= nodes/2, inside the same bound."""
    import ray.data as rd

    empty = pa.table({"a": pa.array([], pa.string()),
                      "b": pa.array([], pa.string()),
                      "match_round": pa.array([], pa.int64())})

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()

    def with_key(t: pa.Table) -> pd.DataFrame:
        a = t["a"].to_pylist()
        b = t["b"].to_pylist()
        return pd.DataFrame({
            "a": pd.Series(a, dtype=object),
            "b": pd.Series(b, dtype=object),
            "k": pd.Series([_match_key(x, y) for x, y in zip(a, b)],
                           dtype=object),
        })

    if und.count() <= local_threshold:
        frames = list(und.map_batches(with_key, batch_format="pyarrow")
                      .iter_batches(batch_format="pandas",
                                    batch_size=None))
        if not frames:
            return rd.from_arrow(empty)
        df = pd.concat(frames, ignore_index=True)
        matched: set[str] = set()
        out_a: list[str] = []
        out_b: list[str] = []
        out_r: list[int] = []
        for r in range(rounds):
            act = df[~df["a"].isin(matched) & ~df["b"].isin(matched)]
            if not len(act):
                break
            mn: dict[str, str] = {}
            for x, y, k in zip(act["a"], act["b"], act["k"]):
                if x not in mn or k < mn[x]:
                    mn[x] = k
                if y not in mn or k < mn[y]:
                    mn[y] = k
            win = act[(act["k"] == act["a"].map(mn))
                      & (act["k"] == act["b"].map(mn))]
            win = win.sort_values(["a", "b"], kind="mergesort")
            out_a.extend(win["a"])
            out_b.extend(win["b"])
            out_r.extend([r] * len(win))
            matched.update(win["a"])
            matched.update(win["b"])
        return rd.from_arrow(pa.table({
            "a": pa.array(out_a, pa.string()),
            "b": pa.array(out_b, pa.string()),
            "match_round": pa.array(out_r, pa.int64())}))

    # ---- distributed path (pinned by tests with local_threshold=0) ----
    undk = und.map_batches(with_key, batch_format="pyarrow").materialize()
    matched_set: set[str] = set()
    out_a, out_b, out_r = [], [], []
    for r in range(rounds):
        m_ref = ray.put(matched_set)

        def active_fn(b: pd.DataFrame, _m=m_ref) -> pd.DataFrame:
            mm = ray.get(_m)
            keep = (~b["a"].isin(mm) & ~b["b"].isin(mm))
            out = b[keep]
            return out if len(out) else pd.DataFrame({
                "a": pd.Series([], dtype=object),
                "b": pd.Series([], dtype=object),
                "k": pd.Series([], dtype=object)})

        def explode_fn(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "id": pd.concat([b["a"], b["b"]], ignore_index=True)
                .astype(object),
                "k": pd.concat([b["k"], b["k"]], ignore_index=True)
                .astype(object)})

        act = undk.map_batches(active_fn, batch_format="pandas")
        mins = bucketed_min(
            act.map_batches(explode_fn, batch_format="pandas"),
            ["id"], "k", n_buckets=min(n_buckets, 16))
        # node-bounded driver fold (degree_map's budget)
        mn: dict[str, str] = {}
        for b in mins.iter_batches(batch_format="pandas",
                                   batch_size=None):
            for x, k in zip(b["id"], b["k"]):
                if x not in mn or k < mn[x]:
                    mn[x] = k
        if not mn:
            break
        mn_ref = ray.put(mn)

        def winners_fn(b: pd.DataFrame, _m=mn_ref) -> pd.DataFrame:
            m = ray.get(_m)
            w = b[(b["k"] == b["a"].map(m)) & (b["k"] == b["b"].map(m))]
            return w[["a", "b"]] if len(w) else pd.DataFrame({
                "a": pd.Series([], dtype=object),
                "b": pd.Series([], dtype=object)})

        # winner edges are <= active-nodes/2 rows: node-bounded collect
        wins: list[tuple[str, str]] = []
        for b in (act.map_batches(winners_fn, batch_format="pandas")
                  .iter_batches(batch_format="pandas", batch_size=None)):
            wins.extend(zip(b["a"], b["b"]))
        if not wins:
            break
        for x, y in sorted(wins):
            out_a.append(x)
            out_b.append(y)
            out_r.append(r)
            matched_set.add(x)
            matched_set.add(y)
    if not out_a:
        return rd.from_arrow(empty)
    return rd.from_arrow(pa.table({
        "a": pa.array(out_a, pa.string()),
        "b": pa.array(out_b, pa.string()),
        "match_round": pa.array(out_r, pa.int64())}))


# ------------------------------------- greedy coloring (Jones-Plassmann)

COLORING_ROUNDS = 4


def greedy_coloring(edges, rounds: int = COLORING_ROUNDS,
                    src: str = "subj_id", dst: str = "obj_id",
                    n_buckets: int = 64,
                    local_threshold: int = 1_000_000):
    """Fixed-round Jones-Plassmann greedy coloring with static md5
    priorities: Dataset(id, color) — per round, every still-UNCOLORED
    node whose key md5(id) is strictly smallest among its uncolored
    neighbors takes color = round. Differs from MIS in the deactivation
    rule: only the winners retire (their neighbors stay active and
    compete next round), so successive rounds emit disjoint independent
    sets that together properly color the priority-ordered graph.
    ``rounds`` is a SPEC constant unrolled identically in the SQL
    oracle; nodes uncolored after ``rounds`` are simply absent. Two
    adjacent nodes can never win the same round (strict local minimum),
    so color-class validity is structural.

    The conflict-resolution grain (parallel scheduling / register
    allocation shape) the reference defers to its neo4j sink
    (`builder/builder.py:497-521`). Hybrid scale shape (gate as MIS):
    under the gate one driver dict loop; above it each round is ONE
    bucketed min-key exchange over the active adjacency plus a
    node-bounded driver winner fold — the edge list never leaves the
    cluster, driver state is node-bounded (the canonicalization
    broadcast's budget)."""
    import ray.data as rd

    empty = pa.table({"id": pa.array([], pa.string()),
                      "color": pa.array([], pa.int64())})

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    if und.count() <= local_threshold:
        frames = list(und.iter_batches(batch_format="pandas",
                                       batch_size=65536))
        if not frames:
            return rd.from_arrow(empty)
        df = pd.concat(frames, ignore_index=True)
        adj: dict[str, set] = {}
        for a, b in zip(df["a"].to_numpy(dtype=object),
                        df["b"].to_numpy(dtype=object)):
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        pr = _mis_priorities(adj)
        key = {i: _mis_key(h, i) for i, h in pr.items()}
        active = set(adj)
        colored: dict[str, int] = {}
        for r in range(rounds):
            winners = {x for x in active
                       if all(key[x] < key[y]
                              for y in adj[x] if y in active)}
            if not winners:
                break
            for w in winners:
                colored[w] = r
            active -= winners
        if not colored:
            return rd.from_arrow(empty)
        out = sorted(colored)
        return rd.from_arrow(pa.table({
            "id": pa.array(out, pa.string()),
            "color": pa.array([colored[i] for i in out], pa.int64())}))

    # ---- distributed path (pinned by tests with local_threshold=0) ----
    ids = sorted(degree_map(und))  # entity-bounded
    pr = _mis_priorities(ids)
    key = {i: _mis_key(h, i) for i, h in pr.items()}
    adj_ds = _adjacency(und).materialize()
    active = set(ids)
    colored = {}
    for r in range(rounds):
        act_ref = ray.put(active)
        key_ref = ray.put(key)

        def min_nb(t: pa.Table, _a=act_ref, _k=key_ref) -> pd.DataFrame:
            act = ray.get(_a)
            km = ray.get(_k)
            i = t["id"].to_pylist()
            n = t["nb"].to_pylist()
            rows_i, rows_k = [], []
            for x, y in zip(i, n):
                if x in act and y in act:
                    rows_i.append(x)
                    rows_k.append(km[y])
            return pd.DataFrame({"id": pd.Series(rows_i, dtype=object),
                                 "k": pd.Series(rows_k, dtype=object)})

        mins = bucketed_min(
            adj_ds.map_batches(min_nb, batch_format="pyarrow"),
            ["id"], "k", n_buckets=min(n_buckets, 16))
        # node-bounded driver fold (degree_map's budget)
        mmap: dict[str, str] = {}
        for b in mins.iter_batches(batch_format="pandas",
                                   batch_size=None):
            for x, kk in zip(b["id"], b["k"]):
                if x not in mmap or kk < mmap[x]:
                    mmap[x] = kk
        winners = {x for x in active
                   if x not in mmap or key[x] < mmap[x]}
        if not winners:
            break
        for w in winners:
            colored[w] = r
        active -= winners
    if not colored:
        return rd.from_arrow(empty)
    out = sorted(colored)
    return rd.from_arrow(pa.table({
        "id": pa.array(out, pa.string()),
        "color": pa.array([colored[i] for i in out], pa.int64())}))


WL_ROUNDS = 2


def _wl_digest_bucket(g: pd.DataFrame, colors_ref) -> pd.DataFrame:
    """Digest one id-bucket of (id, neighbor-color, partial-count) rows:
    per node, md5(own_color || '|' || sorted 'color x count' multiset)."""
    import hashlib

    col = ray.get(colors_ref)
    if len(g) == 0:
        return pd.DataFrame({"id": pd.Series(dtype=object),
                             "c": pd.Series(dtype=object)})
    rows_id, rows_c = [], []
    for v, sub in g.groupby("id", sort=False):
        cnt = sub.groupby("l", sort=False)["n"].sum()
        s = (col[v] + "|"
             + ",".join(f"{l}x{int(c)}" for l, c in sorted(cnt.items())))
        rows_id.append(v)
        rows_c.append(hashlib.md5(s.encode("utf-8")).hexdigest())
    return pd.DataFrame({"id": pd.Series(rows_id, dtype=object),
                         "c": pd.Series(rows_c, dtype=object)})


def wl_colors(edges, rounds: int = WL_ROUNDS,
              src: str = "subj_id", dst: str = "obj_id",
              n_buckets: int = 64):
    """Weisfeiler-Lehman color refinement (1-WL; Shervashidze et al. 2011
    WL-kernel grain) over the undirected simple graph. Colors start as the
    CURIE prefix (the node's vocabulary); each synchronous round rehashes
    ``c_r(v) = md5(c_{r-1}(v) || '|' || join(sorted(color x count)))`` over
    the multiset of neighbor colors. After ``rounds`` (a SPEC constant like
    KCORE_ROUNDS — engine and unrolled oracle agree bit-for-bit, converged
    or not) two nodes share a color iff 1-WL cannot distinguish their
    ``rounds``-hop neighborhoods — the structural-role fingerprint behind
    WL graph kernels and GNN expressivity checks. Returns
    Dataset(id, wl1..wl{rounds}) — the refinement trajectory, not just the
    final class, so downstream can see where roles split.

    Scale shape: per round ONE broadcast-color edge pass (the color dict is
    node-bounded — the components/BFS budget) feeding ONE id-bucketed
    exchange whose per-batch partial pre-counts (id, neighbor-color) pairs;
    the multiset digest runs inside the bucket (all rows of a node meet in
    exactly one bucket), and only the node-bounded (id, digest) table comes
    back to the driver for the next broadcast. No edge-bounded driver
    state, no global sort."""
    import ray.data as rd

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    adj = _adjacency(und)
    ids = set(degree_map(und))
    if not ids:
        return rd.from_arrow(pa.table(
            {"id": pa.array([], pa.string())}
            | {f"wl{r}": pa.array([], pa.string())
               for r in range(1, rounds + 1)}))
    colors = {i: i.split(":", 1)[0] for i in ids}
    history = []
    for _ in range(rounds):
        ref = ray.put(colors)

        def push(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
            col = ray.get(_ref)
            return pd.DataFrame({
                "id": b["id"].to_numpy(dtype=object),
                "l": b["nb"].map(col).to_numpy(dtype=object)})

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            return (b.groupby(["id", "l"], sort=False).size()
                    .rename("n").reset_index())

        digested = bucketed_apply(
            adj.map_batches(push, batch_format="pandas"), ["id"],
            lambda g, _r=ref: _wl_digest_bucket(g, _r), partial,
            n_buckets=min(n_buckets, 16))
        nxt: dict[str, str] = {}
        for b in digested.iter_batches(batch_format="pandas",
                                       batch_size=None):
            nxt.update(zip(b["id"], b["c"]))
        colors = nxt
        history.append(colors)
    out = sorted(ids)
    cols = {"id": pa.array(out, pa.string())}
    for r, h in enumerate(history, 1):
        cols[f"wl{r}"] = pa.array([h[i] for i in out], pa.string())
    return rd.from_arrow(pa.table(cols))


# --------------------------------------------------- minimum spanning forest

MST_MAX_ROUNDS = 32  # safety cap; Boruvka needs ceil(log2 V) rounds


def minimum_spanning_forest(canonical, src: str = "subj_id",
                            dst: str = "obj_id", n_buckets: int = 64):
    """Deterministic Borůvka minimum spanning forest over the
    mention-weighted undirected KG -> Dataset(a, b, wt) of forest edges.

    The total edge order (wt, a, b) makes every weight distinct, so the
    MSF is UNIQUE — which is the correctness contract: the oracle runs an
    independent sequential KRUSKAL over the same weighted edge list and
    must produce the identical edge set (two different algorithms, one
    mathematical object; no unrolled-round coupling needed).

    Scale shape (Borůvka is the distributed-MST classic precisely
    because each round is embarrassingly parallel): per round ONE
    broadcast-label vectorized pass over the edge table emits each
    cross-component edge keyed by both endpoint components with a
    map-side per-component lexicographic-min partial, then one bucketed
    exchange finishes the argmin — shuffle volume is bounded by
    components x batches, never edges. Selected edges are
    component-bounded (< V per round), so the driver union-find fold is
    node-bounded state, the same gazetteer-universe bound every KG
    broadcast here relies on; components at least halve per round, so
    rounds = O(log V)."""
    import ray
    import ray.data as rd

    from ..functions.bucketing import bucketed_apply, bucketed_count

    def canon_pairs(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        s = t[src].combine_chunks().cast(pa.string())
        o = t[dst].combine_chunks().cast(pa.string())
        lo = pc.min_element_wise(s, o)
        hi = pc.max_element_wise(s, o)
        keep = pc.not_equal(lo, hi)
        return pa.table({"a": lo.filter(keep), "b": hi.filter(keep)})

    mentions = bucketed_count(
        canonical.map_batches(canon_pairs, batch_format="pyarrow"),
        ["a", "b"], name="m", n_buckets=n_buckets)

    def weigh(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "a": b["a"], "b": b["b"],
            "wt": _mention_weight(b["m"].to_numpy(dtype=np.int64))})

    wund = mentions.map_batches(weigh, batch_format="pandas").materialize()

    # node-bounded driver state: every endpoint starts as its own component
    labels: dict[str, str] = {n: n for n in degree_map(wund)}
    parent: dict[str, str] = dict(labels)

    def find(x: str) -> str:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    _empty = {"comp": pd.Series([], dtype=object),
              "wt": pd.Series([], dtype="int64"),
              "a": pd.Series([], dtype=object),
              "b": pd.Series([], dtype=object)}

    def comp_min(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "comp" not in g.columns:
            return pd.DataFrame(_empty)
        return (g.sort_values(["wt", "a", "b"], kind="mergesort")
                .drop_duplicates("comp", keep="first"))

    forest: list[tuple[str, str, int]] = []
    for _ in range(MST_MAX_ROUNDS):
        lab_ref = ray.put(dict(labels))

        def cand(b: pd.DataFrame, _ref=lab_ref) -> pd.DataFrame:
            lab = ray.get(_ref)
            la = b["a"].map(lab).to_numpy(dtype=object)
            lb = b["b"].map(lab).to_numpy(dtype=object)
            keep = la != lb
            a = b["a"].to_numpy(dtype=object)[keep]
            bb = b["b"].to_numpy(dtype=object)[keep]
            wt = b["wt"].to_numpy(np.int64)[keep]
            out = pd.DataFrame({
                "comp": np.concatenate([la[keep], lb[keep]]),
                "wt": np.concatenate([wt, wt]),
                "a": np.concatenate([a, a]),
                "b": np.concatenate([bb, bb])})
            return comp_min(out)  # map-side per-component partial

        sel = bucketed_apply(
            wund.map_batches(cand, batch_format="pandas"),
            ["comp"], comp_min, None, n_buckets)
        # component-bounded (< V rows), never edge-scale
        picked = {(r["a"], r["b"], int(r["wt"]))
                  for b_ in sel.iter_batches(batch_format="pandas",
                                             batch_size=None)
                  for r in b_.to_dict("records")}
        merged = 0
        for a, b_, wt in sorted(picked, key=lambda e: (e[2], e[0], e[1])):
            ra, rb = find(a), find(b_)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
                forest.append((a, b_, wt))
                merged += 1
        if merged == 0:
            break
        labels = {n: find(n) for n in labels}

    forest.sort(key=lambda e: (e[2], e[0], e[1]))
    return rd.from_arrow(pa.table({
        "a": pa.array([e[0] for e in forest], pa.string()),
        "b": pa.array([e[1] for e in forest], pa.string()),
        "wt": pa.array([e[2] for e in forest], pa.int64())}))


# -------------------------------------------------- densest subgraph

DENSEST_ROUNDS = 8


def densest_subgraph(edges, rounds: int = DENSEST_ROUNDS,
                     src: str = "subj_id", dst: str = "obj_id",
                     n_buckets: int = 64):
    """Greedy densest-subgraph PEEL trace (Charikar 1999 / the Bahmani
    et al. 2012 MapReduce variant): per round report (v_count, e_count,
    density = E/V) of the surviving subgraph, then remove every node
    whose distinct-neighbor degree is <= the average (keep iff
    deg * V > 2 * E — integer cross-multiplication, so the peel decision
    never forms a float). At least the min-degree node always peels, so
    the trace shrinks monotonically; the densest prefix row is
    Charikar's 2-approximation witness. ``rounds`` is a SPEC constant
    like KCORE_ROUNDS; the trace stops early when the graph empties.

    Scale shape (the kcore budget): per round ONE coalesced degree count
    (entity-bounded driver dict), a broadcast keep-set, and a map-side
    edge filter — the edge list streams, never collects. ``density`` is
    the row's single float division of exact ints."""
    import ray.data as rd

    und = undirected_pairs(edges, src, dst, n_buckets).materialize()
    e = und
    out = []
    for r in range(rounds):
        degs = degree_map(e)
        if not degs:
            break
        v_cnt = len(degs)
        e_cnt = int(e.count())
        out.append((r, v_cnt, e_cnt, e_cnt / v_cnt))
        keep_ref = ray.put(
            {i for i, d in degs.items() if d * v_cnt > 2 * e_cnt})

        def filt(b: pd.DataFrame, _ref=keep_ref) -> pd.DataFrame:
            s = ray.get(_ref)
            m = b["a"].isin(s).to_numpy() & b["b"].isin(s).to_numpy()
            return b[m]

        e = e.map_batches(filt, batch_format="pandas").materialize()
    return rd.from_arrow(pa.table({
        "round": pa.array([r for r, _, _, _ in out], pa.int64()),
        "v_count": pa.array([v for _, v, _, _ in out], pa.int64()),
        "e_count": pa.array([c for _, _, c, _ in out], pa.int64()),
        "density": pa.array([d for _, _, _, d in out], pa.float64()),
    }))


# ----------------------------------------------- bipartite components

def bipartite_components(edges, src: str = "subj_id",
                         dst: str = "obj_id", n_buckets: int = 64):
    """Per-component BIPARTITENESS audit (odd-cycle detection): for every
    connected component of the undirected simple graph, (component =
    min member id, n_nodes, is_bipartite 1/0) — the 2-colorability
    sanity gate for graphs expected to be bipartite (e.g. doc-term,
    user-item) and a structural profile otherwise.

    Engine: the distinct-pair stream folds into a PARITY union-find on
    the driver — node state is entity-bounded (the same gazetteer-
    universe bound degree_map and the canonicalization broadcast already
    rely on); bipartiteness and membership are edge-order-independent,
    so the fold needs no ordering guarantee. At a node universe beyond
    driver bounds this becomes the components-style min-label
    propagation carrying (root, parity) per round — same exchange
    budget as connected_components."""
    import ray.data as rd

    und = undirected_pairs(edges, src, dst, n_buckets)
    parent: dict[str, str] = {}
    par: dict[str, int] = {}   # parity of node relative to its parent
    odd: set[str] = set()      # roots of components with an odd cycle

    def find(x: str) -> tuple[str, int]:
        path = []
        p = 0
        while parent.get(x, x) != x:
            path.append((x, par[x]))
            p ^= par[x]
            x = parent[x]
        # path compression, re-rooting parities to the root
        acc = p
        for n, pr in path:
            parent[n] = x
            old = par[n]
            par[n] = acc
            acc ^= old
        return x, p

    def union(a: str, b: str) -> None:
        for n in (a, b):
            parent.setdefault(n, n)
            par.setdefault(n, 0)
        ra, pa_ = find(a)
        rb, pb = find(b)
        if ra == rb:
            if pa_ == pb:  # same side joined by an edge -> odd cycle
                odd.add(ra)
            return
        # attach lexicographically-larger root under the smaller
        # (deterministic; rank-free is fine at entity scale)
        if rb < ra:
            ra, rb, pa_, pb = rb, ra, pb, pa_
        parent[rb] = ra
        par[rb] = pa_ ^ pb ^ 1  # edge flips sides
        if rb in odd:
            odd.discard(rb)
            odd.add(ra)

    for b in und.iter_batches(batch_format="pandas", batch_size=65536):
        for a_, b_ in zip(b["a"].to_numpy(dtype=object),
                          b["b"].to_numpy(dtype=object)):
            union(a_, b_)

    members: dict[str, list[str]] = {}
    for n in parent:
        r, _ = find(n)
        members.setdefault(r, []).append(n)
    rows = sorted((min(v), len(v), 0 if r in odd else 1)
                  for r, v in members.items())
    return rd.from_arrow(pa.table({
        "component": pa.array([c for c, _, _ in rows], pa.string()),
        "n_nodes": pa.array([n for _, n, _ in rows], pa.int64()),
        "is_bipartite": pa.array([f for _, _, f in rows], pa.int64()),
    }))
