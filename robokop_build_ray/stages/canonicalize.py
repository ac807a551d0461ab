"""Stage 3 — CANONICALIZE: synonym-closure merge + node/edge aggregation.

Replaces the reference's sequential, order-dependent ``node_map`` + ``merge``
(`builder/builder.py:110-113,136-167,249-264`) with a deterministic parallel
equivalent (SURVEY §7.4.1): canonical id = lexicographic min primary CURIE of
the synonym connected component. The component closure runs over *reference
data* (the gazetteer bridge graph — small side), so it is computed once with
driver-side union-find (`gazetteer.canonical_map`) and broadcast via
``ray.put``; the corpus-scale work is a pure broadcast map join inside
``map_batches`` — NO shuffle to rewrite a trillion triple endpoints. (The
general distributed closure for corpus-derived equivalence graphs is
``stages.components.connected_components``.)

Node aggregation mirrors the neo4j node upsert (`builder/builder.py:76-96`):
synonym-set union, sorted ``equivalent_identifiers`` (`:81-82`); edge
aggregation mirrors edge dedup by (src, dst, source) identity
(`builder/builder.py:24-25,216-226`) with the ``:``->``_`` label sanitization
(`:36`) and the per-pair publication cap (`builder/chemotext.py:42,53`).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

EDGE_SOURCE = "extractor.triple_pattern"
PUBLICATION_CAP = 10_000

NODES_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("name", pa.string()),
        ("node_type", pa.string()),
        ("equivalent_identifiers", pa.list_(pa.string())),
    ]
)
EDGES_SCHEMA = pa.schema(
    [
        ("subj_id", pa.string()),
        ("pred_id", pa.string()),
        ("standard_label", pa.string()),
        ("obj_id", pa.string()),
        ("edge_source", pa.string()),
        ("publications", pa.list_(pa.string())),
        ("n_mentions", pa.int64()),
        ("is_support", pa.bool_()),
    ]
)


class CanonicalRewriter:
    """Broadcast map join: rewrite subj_id/obj_id to canonical ids."""

    def __init__(self, canon_ref):
        self.canon: dict[str, str] = ray.get(canon_ref)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        for col in ("subj_id", "obj_id"):
            mapped = batch[col].map(self.canon)
            batch[col] = mapped.where(mapped.notna(), batch[col])
        return batch


def canonicalize_stage(linked, canon_ref, concurrency: int | None = None,
                       batch_size: int = 16_384):
    return linked.map_batches(
        CanonicalRewriter,
        fn_constructor_args=(canon_ref,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency or (1, 4),
        num_cpus=1,
    )


# ------------------------------------------------------------------- nodes

def _used_ids_batch(batch: pa.Table) -> pa.Table:
    ids = np.unique(
        np.concatenate(
            [batch["subj_id"].to_numpy(zero_copy_only=False),
             batch["obj_id"].to_numpy(zero_copy_only=False)]
        )
    )
    return pa.table({"id": pa.array(ids, pa.string())})


class NodeInfoAttacher:
    """info: canon_id -> (name, node_type, sorted equivalent_identifiers)."""

    def __init__(self, nodeinfo_ref):
        self.info = ray.get(nodeinfo_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch["id"].to_pylist()
        rows = [self.info.get(i, (i, "named_thing", [i])) for i in ids]
        return pa.table(
            {
                "id": pa.array(ids, pa.string()),
                "name": pa.array([r[0] for r in rows], pa.string()),
                "node_type": pa.array([r[1] for r in rows], pa.string()),
                "equivalent_identifiers": pa.array(
                    [r[2] for r in rows], pa.list_(pa.string())
                ),
            },
            schema=NODES_SCHEMA,
        )


def nodes_stage(canonical, nodeinfo_ref):
    """Distinct used canonical ids (partial dedup per batch -> groupby) with
    gazetteer-derived labels/synonyms attached via broadcast dict — the node
    table analog of `builder/builder.py:76-96` with the label fallback chain
    of `builder/builder.py:424-445` resolved at gazetteer build time."""
    ids = canonical.map_batches(_used_ids_batch, batch_format="pyarrow")
    distinct = ids.groupby("id").map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )
    return distinct.map_batches(
        NodeInfoAttacher,
        fn_constructor_args=(nodeinfo_ref,),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )


# ------------------------------------------------------------------- edges

def _edge_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch combiner: collapse duplicate (subj,pred,obj) before the
    shuffle — the 'pre-aggregate inside map_batches' pattern."""
    if len(batch) == 0:
        return pd.DataFrame({"subj_id": [], "pred_id": [], "obj_id": [],
                             "pubs": [], "n": []})
    batch = batch.assign(
        pub="CONV:" + batch["conv_id"] + "#" + batch["turn_idx"].astype(str)
    )
    g = (
        batch.groupby(["subj_id", "pred_id", "obj_id"], sort=False)
        .agg(pubs=("pub", lambda s: sorted(set(s))), n=("pub", "size"))
        .reset_index()
    )
    return g


def _edge_final(group: pd.DataFrame) -> pa.Table:
    pubs: set[str] = set()
    for lst in group["pubs"]:
        pubs.update(lst)
    pred = group["pred_id"].iloc[0]
    return pa.table(
        {
            "subj_id": pa.array([group["subj_id"].iloc[0]], pa.string()),
            "pred_id": pa.array([pred], pa.string()),
            "standard_label": pa.array([pred.replace(":", "_")], pa.string()),
            "obj_id": pa.array([group["obj_id"].iloc[0]], pa.string()),
            "edge_source": pa.array([EDGE_SOURCE], pa.string()),
            "publications": pa.array([sorted(pubs)[:PUBLICATION_CAP]],
                                     pa.list_(pa.string())),
            "n_mentions": pa.array([int(group["n"].sum())], pa.int64()),
            "is_support": pa.array([False], pa.bool_()),
        },
        schema=EDGES_SCHEMA,
    )


def edges_stage(canonical, batch_size: int = 16_384):
    partial = canonical.map_batches(
        _edge_partial, batch_format="pandas", batch_size=batch_size
    )
    return partial.groupby(["subj_id", "pred_id", "obj_id"]).map_groups(
        _edge_final, batch_format="pandas"
    )
