"""Distributed PageRank over the KG edge list (quantized-integer, exact).

The second iterative graph algorithm next to ``components`` (min-label
propagation) and ``clustering`` (Lloyd's k-means) — the "rank the entities
of the built graph" analysis the reference runs downstream of its builds
(graph analytics over builder output; the reference itself defers analytics
to its neo4j sink — this is the engine-native equivalent).

Determinism contract (repo invariant): all rank arithmetic is int64
fixed-point (``SCALE`` units) with only associative integer adds and floor
divisions, so the result is bit-identical at any batch boundary,
parallelism, or merge order — the same trick as ``clustering.QUANT`` — and
the DuckDB oracle re-derives it with integer `//` unrolled per iteration.

Semantics (documented simplifications, shared by engine and oracle):
- damping 85/100, fixed ``iters`` sweeps (no convergence test — rank
  deltas are not cheaply computable without another exchange);
- dangling-node mass (nodes with no out-edges) is dropped, not
  redistributed — ranks sum to < SCALE; ordering is unaffected for the
  usual use (top-entity ranking);
- the edge list is DISTINCT (multi-edges collapse, like the reference's
  edge dedup sink).

Hybrid scale shape (same gate as ``connected_components``): rank state is
node-bounded but the per-iteration messages are edge-scale, so when the
distinct edge list fits ``local_threshold`` the loop runs as one driver
numpy pass (zero AllToAlls per sweep); beyond it, each sweep is exactly two
bucketed exchanges — attach rank/degree to edges by src, then fold
contributions by dst with a zeros-union that re-seats every node (including
in-degree-0 nodes) and re-carries its static out-degree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.bucketing import bucketed_apply, bucketed_attach, bucketed_distinct, bucketed_sum

SCALE = 1_000_000_000_000  # 1e12 fixed-point rank units
DAMP_NUM, DAMP_DEN = 85, 100
BASE_TOTAL = SCALE * (DAMP_DEN - DAMP_NUM) // DAMP_DEN  # (1-d) mass
PAGERANK_ITERS = 3


def _local_pagerank(e, iters: int):
    """Driver numpy sweeps for a distinct edge list under the gate —
    identical integer math to the distributed path and the SQL oracle."""
    import ray.data as rd

    frames = list(e.iter_batches(batch_format="pandas", batch_size=65536))
    df = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        {"src": [], "dst": []})
    nodes = np.unique(np.concatenate([df["src"].to_numpy(dtype=object),
                                      df["dst"].to_numpy(dtype=object)]))
    n = len(nodes)
    if n == 0:
        return rd.from_arrow(pa.table({"id": pa.array([], pa.string()),
                                       "rank_units": pa.array([], pa.int64())}))
    si = np.searchsorted(nodes, df["src"].to_numpy(dtype=object))
    di = np.searchsorted(nodes, df["dst"].to_numpy(dtype=object))
    deg = np.bincount(si, minlength=n).astype(np.int64)
    r = np.full(n, SCALE // n, dtype=np.int64)
    base = BASE_TOTAL // n
    for _ in range(iters):
        contrib = np.where(deg > 0, r // np.maximum(deg, 1), 0)
        inb = np.zeros(n, dtype=np.int64)
        np.add.at(inb, di, contrib[si])
        r = base + (DAMP_NUM * inb) // DAMP_DEN
    return rd.from_arrow(pa.table({
        "id": pa.array(nodes, pa.string()),
        "rank_units": pa.array(r, pa.int64()),
    }))


def pagerank(edges, src: str = "subj_id", dst: str = "obj_id",
             iters: int = PAGERANK_ITERS, n_buckets: int = 64,
             local_threshold: int = 1_000_000):
    """edges Dataset (two castable-to-string endpoint columns)
    -> Dataset(id, rank_units int64)."""

    def to_sd(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t[src].combine_chunks().cast(pa.string()),
            "dst": t[dst].combine_chunks().cast(pa.string()),
        })

    e = bucketed_distinct(edges.map_batches(to_sd, batch_format="pyarrow"),
                          ["src", "dst"], n_buckets).materialize()
    if e.count() <= local_threshold:
        return _local_pagerank(e, iters)

    # ---- distributed path (pinned by tests with local_threshold=0) ----
    # static per-node state: out-degree (0 for sink-only nodes)
    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("src", sort=False).size().rename("deg").reset_index()
        s = s.rename(columns={"src": "id"})
        d = pd.DataFrame({"id": b["dst"].unique()})
        d["deg"] = 0
        return pd.concat([s, d], ignore_index=True)

    deg = bucketed_sum(
        e.map_batches(deg_partial, batch_format="pandas"), ["id"], "deg",
        n_buckets).materialize()
    n = deg.count()
    r0, base = SCALE // n, BASE_TOTAL // n

    def seed(b: pd.DataFrame) -> pd.DataFrame:
        out = b.copy()
        out["r"] = np.int64(r0)
        return out[["id", "r", "deg"]]

    state = deg.map_batches(seed, batch_format="pandas")
    zeros = deg.map_batches(
        lambda b: pd.DataFrame({
            "id": b["id"],
            "inb": np.zeros(len(b), dtype=np.int64),
            "deg": b["deg"].astype("int64"),
        }), batch_format="pandas")

    for _ in range(iters):
        attached = bucketed_attach(
            e, state, left_on="src", right_on="id",
            left_cols=["dst"], payload={"r": "r", "deg": "deg"},
            n_buckets=n_buckets, payload_fill=np.int64(0))

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            d = b["deg"].to_numpy(np.int64)
            return pd.DataFrame({
                "id": b["dst"],
                "inb": b["r"].to_numpy(np.int64) // np.maximum(d, 1),
                "deg": np.zeros(len(b), dtype=np.int64),
            })

        msgs = attached.map_batches(contrib, batch_format="pandas")

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            agg = g.groupby("id", sort=False).agg(
                inb=("inb", "sum"), deg=("deg", "max")).reset_index()
            agg["r"] = base + (DAMP_NUM * agg["inb"].to_numpy(np.int64)
                               ) // DAMP_DEN
            return agg[["id", "r", "deg"]]

        state = bucketed_apply(msgs.union(zeros), ["id"], fold, None,
                               n_buckets).materialize()

    return state.map_batches(
        lambda b: pd.DataFrame({"id": b["id"],
                                "rank_units": b["r"].astype("int64")}),
        batch_format="pandas")


# ------------------------------------------------------------------- HITS

HITS_ITERS = 2


def _local_hits(e, iters: int):
    """Driver numpy sweeps under the gate — identical integer math to the
    distributed path and the SQL oracle."""
    import ray.data as rd

    frames = list(e.iter_batches(batch_format="pandas", batch_size=65536))
    df = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame(
        {"src": [], "dst": []})
    nodes = np.unique(np.concatenate([df["src"].to_numpy(dtype=object),
                                      df["dst"].to_numpy(dtype=object)]))
    n = len(nodes)
    if n == 0:
        return rd.from_arrow(pa.table({
            "id": pa.array([], pa.string()),
            "hub_units": pa.array([], pa.int64()),
            "auth_units": pa.array([], pa.int64())}))
    si = np.searchsorted(nodes, df["src"].to_numpy(dtype=object))
    di = np.searchsorted(nodes, df["dst"].to_numpy(dtype=object))
    h = np.full(n, SCALE // n, dtype=np.int64)
    a = np.zeros(n, dtype=np.int64)
    for _ in range(iters):
        araw = np.zeros(n, dtype=np.int64)
        np.add.at(araw, di, h[si])
        a = araw // max(1, int(araw.sum()) // SCALE)
        hraw = np.zeros(n, dtype=np.int64)
        np.add.at(hraw, si, a[di])
        h = hraw // max(1, int(hraw.sum()) // SCALE)
    return rd.from_arrow(pa.table({
        "id": pa.array(nodes, pa.string()),
        "hub_units": pa.array(h, pa.int64()),
        "auth_units": pa.array(a, pa.int64()),
    }))


def hits(edges, src: str = "subj_id", dst: str = "obj_id",
         iters: int = HITS_ITERS, n_buckets: int = 64,
         local_threshold: int = 1_000_000):
    """HITS hubs/authorities (Kleinberg 1999) over the DIRECTED distinct
    edge list -> Dataset(id, hub_units, auth_units), int64 fixed-point.

    Determinism contract (same as :func:`pagerank`): all arithmetic is
    associative integer adds and floor divisions. The classic L2
    normalization is replaced by an L1 rescale to ~``SCALE`` units —
    ``x // max(1, sum(x) // SCALE)`` — a pure-integer spec both engine
    paths and the DuckDB oracle reproduce bit-for-bit (rank ORDER is what
    HITS is used for; the norm choice does not change it). Fixed
    ``iters`` sweeps; nodes with no in-edges hold authority 0, no
    out-edges hub 0.

    Scale shape: hybrid like pagerank — under the gate one driver numpy
    pass; beyond it each sweep is two attach+fold exchange pairs
    (edge-scale messages, node-bounded state) plus one streaming scalar
    aggregate per half-sweep for the rescale divisor. Raw sums are
    bounded by n * SCALE — int64-safe to ~9e6 nodes at SCALE 1e12; at
    larger node universes drop SCALE a decade per 10x nodes (spec
    constant, oracle moves with it)."""
    import ray.data as rd  # noqa: F401

    def to_sd(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t[src].combine_chunks().cast(pa.string()),
            "dst": t[dst].combine_chunks().cast(pa.string()),
        })

    e = bucketed_distinct(edges.map_batches(to_sd, batch_format="pyarrow"),
                          ["src", "dst"], n_buckets).materialize()
    if e.count() <= local_threshold:
        return _local_hits(e, iters)

    # ---- distributed path (pinned by tests with local_threshold=0) ----
    def node_partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"id": np.unique(np.concatenate(
            [b["src"].to_numpy(dtype=object),
             b["dst"].to_numpy(dtype=object)]))})

    nodes = bucketed_distinct(
        e.map_batches(node_partial, batch_format="pandas"), ["id"],
        n_buckets).materialize()
    n = nodes.count()
    h0 = SCALE // max(1, n)

    state_h = nodes.map_batches(
        lambda b: pd.DataFrame({"id": b["id"],
                                "v": np.full(len(b), h0, dtype=np.int64)}),
        batch_format="pandas").materialize()
    state_a = None

    def _half_sweep(state, edge_key, emit_key):
        """attach state to edges by ``edge_key``, fold sums by the other
        endpoint, rescale to ~SCALE units. Returns the new state."""
        attached = bucketed_attach(
            e, state, left_on=edge_key, right_on="id",
            left_cols=[emit_key], payload={"v": "v"},
            n_buckets=n_buckets, payload_fill=np.int64(0))
        msgs = attached.map_batches(
            lambda b, k=emit_key: pd.DataFrame(
                {"id": b[k], "v": b["v"].astype("int64")}),
            batch_format="pandas")
        raw = bucketed_sum(msgs, ["id"], "v", n_buckets).materialize()
        total = raw.sum("v") or 0
        div = max(1, int(total) // SCALE)
        return raw.map_batches(
            lambda b, d=div: pd.DataFrame(
                {"id": b["id"],
                 "v": b["v"].to_numpy(np.int64) // d}),
            batch_format="pandas").materialize()

    for _ in range(iters):
        state_a = _half_sweep(state_h, "src", "dst")
        state_h = _half_sweep(state_a, "dst", "src")

    # zeros-union fold (the pagerank pattern): bucketed_attach is an
    # INNER join, so attaching states to nodes would drop hub-0/auth-0
    # nodes (no out-/in-edges) from the output entirely
    zeros = nodes.map_batches(
        lambda b: pd.DataFrame({
            "id": b["id"],
            "hub_units": np.zeros(len(b), dtype=np.int64),
            "auth_units": np.zeros(len(b), dtype=np.int64)}),
        batch_format="pandas")
    h_rows = state_h.map_batches(
        lambda b: pd.DataFrame({
            "id": b["id"],
            "hub_units": b["v"].astype("int64"),
            "auth_units": np.zeros(len(b), dtype=np.int64)}),
        batch_format="pandas")
    a_rows = state_a.map_batches(
        lambda b: pd.DataFrame({
            "id": b["id"],
            "hub_units": np.zeros(len(b), dtype=np.int64),
            "auth_units": b["v"].astype("int64")}),
        batch_format="pandas")

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("id", sort=False).agg(
            hub_units=("hub_units", "sum"),
            auth_units=("auth_units", "sum")).reset_index()

    return bucketed_apply(zeros.union(h_rows).union(a_rows), ["id"],
                          fold, None, n_buckets)


# -------------------------------------------------- personalized pagerank

PPR_SEEDS = 4
PPR_ITERS = 3


def personalized_pagerank(edges, src: str = "subj_id",
                          dst: str = "obj_id", n_seeds: int = PPR_SEEDS,
                          iters: int = PPR_ITERS, n_buckets: int = 64,
                          local_threshold: int = 1_000_000):
    """Personalized PageRank (Page et al. 1999 §6; the random-walk-with-
    restart used for 'related entities to THIS seed set' ranking):
    identical integer fixed-point spec to :func:`pagerank` except the
    (1-d) teleport mass lands ONLY on the ``n_seeds``
    lexicographically-smallest nodes (the SPEC sample rule shared with
    harmonic/stress), and rank is seeded there too — nodes unreachable
    from the seed set hold rank 0 exactly. Same hybrid scale shape as
    pagerank; the distributed path reuses its attach+fold sweeps via a
    per-node base-mass column instead of the global scalar."""
    import ray.data as rd

    def to_sd(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t[src].combine_chunks().cast(pa.string()),
            "dst": t[dst].combine_chunks().cast(pa.string()),
        })

    e = bucketed_distinct(edges.map_batches(to_sd, batch_format="pyarrow"),
                          ["src", "dst"], n_buckets).materialize()

    frames_gate = e.count() <= local_threshold
    if frames_gate:
        frames = list(e.iter_batches(batch_format="pandas",
                                     batch_size=65536))
        df = pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame({"src": [], "dst": []})
        nodes = np.unique(np.concatenate(
            [df["src"].to_numpy(dtype=object),
             df["dst"].to_numpy(dtype=object)]))
        n = len(nodes)
        if n == 0:
            return rd.from_arrow(pa.table({
                "id": pa.array([], pa.string()),
                "rank_units": pa.array([], pa.int64())}))
        k = min(n_seeds, n)
        si = np.searchsorted(nodes, df["src"].to_numpy(dtype=object))
        di = np.searchsorted(nodes, df["dst"].to_numpy(dtype=object))
        deg = np.bincount(si, minlength=n).astype(np.int64)
        is_seed = np.zeros(n, dtype=bool)
        is_seed[:k] = True  # nodes sorted -> first k are the seed set
        r = np.where(is_seed, SCALE // k, 0).astype(np.int64)
        base = np.where(is_seed, BASE_TOTAL // k, 0).astype(np.int64)
        for _ in range(iters):
            contrib = np.where(deg > 0, r // np.maximum(deg, 1), 0)
            inb = np.zeros(n, dtype=np.int64)
            np.add.at(inb, di, contrib[si])
            r = base + (DAMP_NUM * inb) // DAMP_DEN
        return rd.from_arrow(pa.table({
            "id": pa.array(nodes, pa.string()),
            "rank_units": pa.array(r, pa.int64()),
        }))

    # ---- distributed path (pinned by tests with local_threshold=0) ----
    def deg_partial(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("src", sort=False).size().rename("deg").reset_index()
        s = s.rename(columns={"src": "id"})
        d = pd.DataFrame({"id": b["dst"].unique()})
        d["deg"] = 0
        return pd.concat([s, d], ignore_index=True)

    deg = bucketed_sum(
        e.map_batches(deg_partial, batch_format="pandas"), ["id"], "deg",
        n_buckets).materialize()
    # seed ids: k smallest — k is a tiny spec constant, so a driver sort
    # of the per-bucket minima is node-bounded and cheap
    ids_min = sorted(r["id"] for r in deg.select_columns(["id"]).take_all())
    k = min(n_seeds, len(ids_min))
    seeds = set(ids_min[:k])
    r0, base_seed = SCALE // max(1, k), BASE_TOTAL // max(1, k)

    def seed_state(b: pd.DataFrame) -> pd.DataFrame:
        m = b["id"].isin(seeds).to_numpy()
        out = b.copy()
        out["r"] = np.where(m, np.int64(r0), np.int64(0))
        out["base"] = np.where(m, np.int64(base_seed), np.int64(0))
        return out[["id", "r", "deg", "base"]]

    state = deg.map_batches(seed_state, batch_format="pandas")
    zeros = deg.map_batches(
        lambda b: pd.DataFrame({
            "id": b["id"],
            "inb": np.zeros(len(b), dtype=np.int64),
            "deg": b["deg"].astype("int64"),
            "base": np.where(b["id"].isin(seeds).to_numpy(),
                             np.int64(base_seed), np.int64(0)),
        }), batch_format="pandas").materialize()

    for _ in range(iters):
        attached = bucketed_attach(
            e, state, left_on="src", right_on="id",
            left_cols=["dst"], payload={"r": "r", "deg": "deg"},
            n_buckets=n_buckets, payload_fill=np.int64(0))

        def contrib(b: pd.DataFrame) -> pd.DataFrame:
            d = b["deg"].to_numpy(np.int64)
            return pd.DataFrame({
                "id": b["dst"],
                "inb": b["r"].to_numpy(np.int64) // np.maximum(d, 1),
                "deg": np.zeros(len(b), dtype=np.int64),
                "base": np.zeros(len(b), dtype=np.int64),
            })

        msgs = attached.map_batches(contrib, batch_format="pandas")

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            agg = g.groupby("id", sort=False).agg(
                inb=("inb", "sum"), deg=("deg", "max"),
                base=("base", "max")).reset_index()
            agg["r"] = agg["base"].to_numpy(np.int64) + (
                DAMP_NUM * agg["inb"].to_numpy(np.int64)) // DAMP_DEN
            return agg[["id", "r", "deg", "base"]]

        state = bucketed_apply(msgs.union(zeros), ["id"], fold, None,
                               n_buckets).materialize()

    return state.map_batches(
        lambda b: pd.DataFrame({"id": b["id"],
                                "rank_units": b["r"].astype("int64")}),
        batch_format="pandas")
