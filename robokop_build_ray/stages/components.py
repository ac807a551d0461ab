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


def _n_changed(old, new, n_buckets: int) -> int:
    tagged_old = old.map_batches(
        lambda t: pa.table({"id": t["id"], "lbl": t["lbl"],
                            "gen": pa.array([0] * t.num_rows, pa.int8())}),
        batch_format="pyarrow",
    )
    tagged_new = new.map_batches(
        lambda t: pa.table({"id": t["id"], "lbl": t["lbl"],
                            "gen": pa.array([1] * t.num_rows, pa.int8())}),
        batch_format="pyarrow",
    )

    def diff(g: pd.DataFrame) -> pd.DataFrame:
        p = g.pivot_table(index="id", columns="gen", values="lbl",
                          aggfunc="first")
        changed = int((p.get(0) != p.get(1)).sum()) if p.shape[1] == 2 else len(p)
        return pd.DataFrame({"n": [changed]})

    parts = bucketed_apply(tagged_old.union(tagged_new), ["id"], diff,
                           None, n_buckets).take_all()
    return sum(r["n"] for r in parts)


def connected_components(
    edges,
    col_a: str = "a",
    col_b: str = "b",
    num_partitions: int = 16,
    max_iters: int = 30,
):
    """edges Dataset (two endpoint columns, any castable-to-string type)
    -> Dataset(id, component)."""
    adj = _edges_to_adj(edges, col_a, col_b).materialize()
    labels = _initial_labels(adj).materialize()

    for _ in range(max_iters):
        msgs = _propagate(adj, labels, num_partitions)
        new_labels = bucketed_min(labels.union(msgs), ["id"], "lbl",
                                  num_partitions).materialize()
        changed = _n_changed(labels, new_labels, num_partitions)
        labels = new_labels
        if changed == 0:
            break
    from ..functions.ray_utils import rename

    return rename(labels, {"lbl": "component"})
