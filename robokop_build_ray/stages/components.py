"""Distributed connected components (min-label propagation).

The general, corpus-scale replacement for the reference's sequential
``node_map``/``merge`` union-find (`builder/builder.py:110-113,136-167`,
SURVEY D2/J1): when the equivalence graph is itself data-scale (e.g. synonym
pairs discovered from the corpus rather than from a small gazetteer), the
closure must be computed as a shuffle, not on the driver.

Algorithm: iterative min-label propagation — each round every node's label
becomes min(own label, neighbors' labels); converges in O(component
diameter) rounds. All exchanges use the repo's bucketed-shuffle primitives
(functions.bucketing) rather than ``Dataset.join``: pyarrow's acero join
fails on empty hash partitions (sparse key sets), and the bucketed pandas
merge is also the measured fast path for string keys (BASELINE.md §2.5).

Deterministic: final label = min node id of the component, independent of
partitioning and arrival order (fixes the reference's order-dependent merge
semantics, SURVEY §7.4.1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.bucketing import bucketed_apply, bucketed_min


def _edges_to_adj(edges, col_a: str, col_b: str):
    return edges.map_batches(
        lambda t: pa.table(
            {
                "src": pa.concat_arrays(
                    [t[col_a].combine_chunks().cast(pa.string()),
                     t[col_b].combine_chunks().cast(pa.string())]
                ),
                "dst": pa.concat_arrays(
                    [t[col_b].combine_chunks().cast(pa.string()),
                     t[col_a].combine_chunks().cast(pa.string())]
                ),
            }
        ),
        batch_format="pyarrow",
    )


def _initial_labels(adj):
    def ids(t: pa.Table) -> pa.Table:
        u = np.unique(t["src"].to_numpy(zero_copy_only=False))
        arr = pa.array(u, pa.string())
        return pa.table({"id": arr, "lbl": arr})

    partial = adj.map_batches(ids, batch_format="pyarrow")
    return bucketed_min(partial, ["id"], "lbl")


def _propagate(adj, labels, n_buckets: int):
    """One round: (dst, lbl[src]) messages via a bucketed hash join on the
    node id — adjacency and label rows co-bucket, one pandas merge per
    bucket."""
    a = adj.map_batches(
        lambda t: pa.table(
            {"node": t["src"], "other": t["dst"],
             "lbl": pa.nulls(t.num_rows, pa.string())}
        ),
        batch_format="pyarrow",
    )
    l = labels.map_batches(
        lambda t: pa.table(
            {"node": t["id"].combine_chunks().cast(pa.string()),
             "other": pa.nulls(t.num_rows, pa.string()),
             "lbl": t["lbl"].combine_chunks().cast(pa.string())}
        ),
        batch_format="pyarrow",
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        lab = g[g["lbl"].notna()][["node", "lbl"]]
        ad = g[g["lbl"].isna()][["node", "other"]]
        if len(lab) == 0 or len(ad) == 0:
            return pd.DataFrame({"id": pd.Series([], dtype=object),
                                 "lbl": pd.Series([], dtype=object)})
        m = ad.merge(lab, on="node")
        return pd.DataFrame({"id": m["other"], "lbl": m["lbl"]})

    return bucketed_apply(a.union(l), ["node"], merge, None, n_buckets)


def _min_with_changed(labels, msgs, n_buckets: int):
    """Fused round finisher: ONE exchange computes both the new label
    (min over own + neighbor labels) AND a per-node changed flag, replacing
    the separate min-merge + tagged-diff exchanges (2 AllToAlls -> 1).
    Convergence then reads ``sum(changed)`` — a tree aggregate, no shuffle."""
    tagged_old = labels.map_batches(
        lambda t: pa.table({"id": t["id"], "lbl": t["lbl"],
                            "is_old": pa.array([1] * t.num_rows, pa.int8())}),
        batch_format="pyarrow",
    )
    tagged_msgs = msgs.map_batches(
        lambda t: pa.table({"id": t["id"], "lbl": t["lbl"],
                            "is_old": pa.array([0] * t.num_rows, pa.int8())}),
        batch_format="pyarrow",
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("id", sort=False)["lbl"].min()
        old = g.loc[g["is_old"] == 1].set_index("id")["lbl"].reindex(new.index)
        changed = (new.to_numpy() != old.to_numpy()) | old.isna().to_numpy()
        return pd.DataFrame({"id": new.index.to_numpy(), "lbl": new.to_numpy(),
                             "changed": changed.astype(np.int64)})

    return bucketed_apply(tagged_old.union(tagged_msgs), ["id"], merge,
                          None, n_buckets)


def _local_components(adj):
    """Driver union-find for a graph that fits the ``local_threshold``
    gate: min-string root, path compression. Bit-identical labels to the
    distributed propagation (both converge to min node id per component)."""
    import ray.data as rd

    parent: dict[str, str] = {}

    def find(x: str) -> str:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:
            parent[x], x = r, parent[x]
        return r

    for batch in adj.iter_batches(batch_format="pandas", batch_size=65536):
        for s, d in zip(batch["src"], batch["dst"]):
            rs, rd_ = find(s), find(d)
            if rs != rd_:
                lo, hi = (rs, rd_) if rs < rd_ else (rd_, rs)
                parent[hi] = lo
    nodes = sorted(set(parent) | {v for v in parent.values()})
    table = pa.table({
        "id": pa.array(nodes, pa.string()),
        "component": pa.array([find(n) for n in nodes], pa.string()),
    })
    return rd.from_arrow(table)


def connected_components(
    edges,
    col_a: str = "a",
    col_b: str = "b",
    num_partitions: int = 16,
    max_iters: int = 30,
    local_threshold: int = 1_000_000,
):
    """edges Dataset (two endpoint columns, any castable-to-string type)
    -> Dataset(id, component).

    Hybrid: when the (directed) adjacency is at most ``local_threshold``
    rows — an explicit driver-sized gate, same pattern as
    events_value_median's collect_cap — the closure finishes with local
    union-find (one pass, zero AllToAlls) instead of paying ~2 fixed-cost
    exchanges per propagation round; the distributed min-label loop below
    is the corpus-scale path (and is pinned by tests with
    ``local_threshold=0``). Real CC engines do the same shrink-then-local
    finish once the frontier fits one machine."""
    adj = _edges_to_adj(edges, col_a, col_b).materialize()
    if adj.count() <= local_threshold:
        return _local_components(adj)
    labels = _initial_labels(adj).materialize()

    for _ in range(max_iters):
        msgs = _propagate(adj, labels, num_partitions)
        combined = _min_with_changed(labels, msgs, num_partitions).materialize()
        changed = combined.sum("changed")
        labels = combined.drop_columns(["changed"])
        if not changed:
            break
    from ..functions.ray_utils import rename

    return rename(labels, {"lbl": "component"})
