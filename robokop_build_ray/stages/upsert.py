"""Run-over-run node-table merge with the reference's neo4j upsert semantics.

Re-expresses `builder/builder.py:76-96` (``export_node``) — asserted by the
reference's only test file `builder/test/test_graphdb_update.py:33-82` — as a
table operation over successive run outputs:

- create: a node seen once appears with exactly its type (:33-39)
- label union: same id seen with another type -> type-label set grows (:41-51)
- synonym overwrite: the LATER run's synonym set replaces the earlier one
  (last-writer-wins), always re-including the id itself (:53-68)
- name overwrite: the later non-null name wins (:70-82)

Distributed shape: tag each run's node table with its ordinal, union, one
hash-shuffle groupby(id), per-group reduce in run order.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

MERGED_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("name", pa.string()),
        ("node_types", pa.list_(pa.string())),
        ("equivalent_identifiers", pa.list_(pa.string())),
    ]
)


def _merge_group(g: pd.DataFrame) -> pa.Table:
    g = g.sort_values("_run")
    node_id = g["id"].iloc[0]
    types = sorted(set(g["node_type"]))
    name = None
    for v in g["name"]:
        if v is not None and v == v:  # non-null, non-NaN
            name = v  # later rows overwrite (last-writer-wins)
    eq = sorted(set(g["equivalent_identifiers"].iloc[-1]) | {node_id})
    return pa.table(
        {
            "id": pa.array([node_id], pa.string()),
            "name": pa.array([name], pa.string()),
            "node_types": pa.array([types], pa.list_(pa.string())),
            "equivalent_identifiers": pa.array([eq], pa.list_(pa.string())),
        },
        schema=MERGED_SCHEMA,
    )


def merge_node_runs(runs):
    """``runs``: node Datasets (id, name, node_type, equivalent_identifiers)
    in write order -> merged Dataset with MERGED_SCHEMA."""
    tagged = None
    for i, ds in enumerate(runs):
        t = ds.map_batches(
            lambda b, run=i: b.append_column(
                "_run", pa.array([run] * len(b), pa.int32())
            ),
            batch_format="pyarrow",
        )
        tagged = t if tagged is None else tagged.union(t)
    return tagged.groupby("id").map_groups(_merge_group, batch_format="pandas")


def merge_edge_runs(runs, n_buckets: int = 64):
    """Run-over-run EDGE upsert with the reference's neo4j semantics
    (`builder/builder.py:16-41` ``export_edge``): an edge is keyed by
    (subj, obj, edge_source) and a later run DELETES the old edge and
    replaces it IN WHOLE — no payload merging, and every predicate the
    earlier run emitted for that key vanishes when the later run writes
    the key at all. Keys only the earlier run emitted persist.

    Distributed shape: tag run ordinal, union, ONE bucketed exchange on
    the edge key (edge tables are fact-scale: never a driver fold), then
    a vectorized per-bucket max-run filter."""
    from ..functions.bucketing import bucketed_apply

    tagged = None
    for i, ds in enumerate(runs):
        t = ds.map_batches(
            lambda b, run=i: b.append_column(
                "_run", pa.array([run] * len(b), pa.int32())
            ),
            batch_format="pyarrow",
        )
        tagged = t if tagged is None else tagged.union(t)

    key = ["subj_id", "obj_id", "edge_source"]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "_run" not in g.columns:
            return g.iloc[0:0] if len(g.columns) else pd.DataFrame()
        mx = g.groupby(key, sort=False)["_run"].transform("max")
        return g[g["_run"] == mx.to_numpy()].drop(columns=["_run"])

    return bucketed_apply(tagged, key, merge, None, n_buckets)
