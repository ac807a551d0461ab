"""Distributed connected components (min-label propagation).

The general, corpus-scale replacement for the reference's sequential
``node_map``/``merge`` union-find (`builder/builder.py:110-113,136-167`,
SURVEY D2/J1): when the equivalence graph is itself data-scale (e.g. synonym
pairs discovered from the corpus rather than from a small gazetteer), the
closure must be computed as a shuffle, not on the driver.

Algorithm: iterative min-label propagation — each round every node's label
becomes min(own label, neighbors' labels) via a hash join + groupby-min;
converges in O(component diameter) rounds (conversation-scale components in
a few, SURVEY §2.4 J1). Deterministic: final label = min node id of the
component, independent of partitioning and arrival order (fixes the
reference's order-dependent merge semantics, SURVEY §7.4.1).
"""

from __future__ import annotations

import pyarrow as pa


def _dedup_ids_batch(col_a: str, col_b: str):
    def fn(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = np.unique(
            np.concatenate(
                [batch[col_a].to_numpy(zero_copy_only=False),
                 batch[col_b].to_numpy(zero_copy_only=False)]
            )
        )
        arr = pa.array(ids, pa.string())
        return pa.table({"id": arr, "lbl": arr})

    return fn


def connected_components(
    edges,
    col_a: str = "a",
    col_b: str = "b",
    num_partitions: int = 16,
    max_iters: int = 30,
):
    """edges Dataset (two string endpoint columns) -> Dataset(id, component).

    Every iteration is two all-to-all exchanges (join on id, groupby-min);
    both sides stay partitioned on the node id so the same key is reused
    across rounds.
    """
    adj = edges.map_batches(
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
    ).materialize()

    labels = (
        edges.map_batches(_dedup_ids_batch(col_a, col_b), batch_format="pyarrow")
        .groupby("id")
        .min("lbl")
        .rename_columns({"min(lbl)": "lbl"})
        .materialize()
    )

    for _ in range(max_iters):
        msgs = adj.join(
            labels,
            join_type="inner",
            num_partitions=num_partitions,
            on=("src",),
            right_on=("id",),
        ).select_columns(["dst", "lbl"]).rename_columns({"dst": "id"})
        new_labels = (
            labels.union(msgs)
            .groupby("id")
            .min("lbl")
            .rename_columns({"min(lbl)": "lbl"})
            .materialize()
        )
        changed = (
            new_labels.join(
                labels,
                join_type="inner",
                num_partitions=num_partitions,
                on=("id",),
                right_suffix="_old",
            )
            .filter(expr="lbl != lbl_old")
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.rename_columns({"lbl": "component"})
