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
# Deterministic build timestamp. The reference stamps wall-clock ctime on
# every edge (`builder/builder.py:32-41` `calendar.timegm(ke.ctime...)`); a
# reproducible pipeline cannot hash-verify wall clocks, so ctime is injected
# as a build constant (runners may pass the real build epoch via
# ``set_build_ctime``) — same payload slot, deterministic value.
BUILD_CTIME = 0


def set_build_ctime(epoch_s: int) -> None:
    global BUILD_CTIME
    BUILD_CTIME = int(epoch_s)


NODES_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("name", pa.string()),
        ("node_type", pa.string()),
        ("equivalent_identifiers", pa.list_(pa.string())),
    ]
)
# Edge payload mirrors the reference sink row (`builder/builder.py:32-41`):
# edge_source, ctime, standard_label, publications, input_identifiers; plus
# n_mentions (aggregation count) and the is_support flag.
EDGES_SCHEMA = pa.schema(
    [
        ("subj_id", pa.string()),
        ("pred_id", pa.string()),
        ("standard_label", pa.string()),
        ("obj_id", pa.string()),
        ("edge_source", pa.string()),
        ("ctime", pa.int64()),
        ("input_identifiers", pa.string()),
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


def canonicalize_stage(linked, canon_ref, concurrency=None,
                       batch_size: int = 16_384):
    if concurrency is None:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        concurrency = (1, max(4, cpus // 2))
    return linked.map_batches(
        CanonicalRewriter,
        fn_constructor_args=(canon_ref,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
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
    """Distinct used canonical ids (partial dedup per batch -> vectorized
    count-aggregate distinct) with gazetteer-derived labels/synonyms attached
    via broadcast dict — the node table analog of `builder/builder.py:76-96`
    with the label fallback chain of `builder/builder.py:424-445` resolved at
    gazetteer build time."""
    ids = canonical.map_batches(_used_ids_batch, batch_format="pyarrow")
    # the id universe is gazetteer-bounded (reference data, small): after
    # per-batch dedup the blocks are tiny, so coalesce to one block and
    # finish the distinct there — no AllToAll shuffle needed
    distinct = ids.repartition(1).map_batches(
        lambda t: pa.table(
            {"id": pa.array(np.unique(t["id"].to_numpy(zero_copy_only=False)),
                            pa.string())}
        ),
        batch_format="pyarrow",
        batch_size=None,
    )
    return distinct.map_batches(
        NodeInfoAttacher,
        fn_constructor_args=(nodeinfo_ref,),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )


# ------------------------------------------- dynamic coded-synonym expansion

# the reference gates expansion on DISEASE / GENETIC_CONDITION
# (`builder/cdw.py:20-21`); this corpus' analog pair:
EXPAND_TYPES = ("disease", "phenotypic_feature")


class SynonymExpander:
    """M9 — DYNAMIC coded-synonym expansion (OXO analog,
    `builder/cdw.py:19-34` ``CDWSupport.prepare``): at node-build time,
    nodes of the gated types look up every equivalent identifier in a
    SECOND reference table (curie -> coded synonym, e.g. ICD9-like) and
    fold the found codes into ``equivalent_identifiers`` — a runtime
    enrichment operator, unlike the static ALT/UMLS lists baked in at
    gazetteer build. The xref table is reference data (small side):
    broadcast once via ``ray.put``, looked up per batch."""

    def __init__(self, xref_ref):
        self.xref: dict[str, tuple[str, ...]] = ray.get(xref_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        eq = batch["equivalent_identifiers"].to_pylist()
        types = batch["node_type"].to_pylist()
        out = []
        for t, lst in zip(types, eq):
            if t in EXPAND_TYPES:
                extra = [c for m in lst for c in self.xref.get(m, ())]
                if extra:
                    lst = sorted(set(lst) | set(extra))
            out.append(lst)
        i = batch.schema.get_field_index("equivalent_identifiers")
        return batch.set_column(
            i, "equivalent_identifiers", pa.array(out, pa.list_(pa.string()))
        )


def expand_synonyms_stage(nodes, xref_ref, concurrency=(1, 2)):
    return nodes.map_batches(
        SynonymExpander, fn_constructor_args=(xref_ref,),
        batch_format="pyarrow", concurrency=concurrency,
    )


# ------------------------------------------------------------------- edges

_EDGE_KEYS = ["subj_id", "pred_id", "obj_id"]


def _edge_partial(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-batch projection to (edge key, provenance, count) rows. No
    per-batch combiner on purpose: the provenance string (pub) is per-turn
    unique, so a (s,p,o,pub) groupby would shuffle ~the same row count
    while burning CPU. Bucket assignment, Arrow conversion and sentinel
    padding happen inside ``bucketed_apply``."""
    return pd.DataFrame(
        {
            "subj_id": batch["subj_id"],
            "pred_id": batch["pred_id"],
            "obj_id": batch["obj_id"],
            "pub": "CONV:" + batch["conv_id"] + "#" + batch["turn_idx"].astype(str),
            "n": np.ones(len(batch), dtype=np.int64),
        }
    )


def _edge_merge_bucket(g: pd.DataFrame) -> pa.Table:
    """One Python call per BUCKET (not per edge): merge pub counts, then
    build the sorted publication lists as an Arrow ListArray directly from
    group offsets — no per-edge Python list construction."""
    if len(g) == 0:
        return EDGES_SCHEMA.empty_table()
    # ONE concatenated sort key replaces the 4-object-column lexsort AND
    # the (s,p,o,pub) hash groupby: '\x00' separators make concatenated
    # order == tuple order, a single argsort orders the bucket, and
    # since pub is per-turn unique the (s,p,o,pub) merge is a boundary
    # reduceat over the sorted run (duplicate mentions sum, like the
    # groupby did) — measured cheaper than groupby+lexsort per bucket
    full = (g["subj_id"] + "\x00" + g["pred_id"] + "\x00" + g["obj_id"]
            + "\x00" + g["pub"]).to_numpy()
    order = np.argsort(full, kind="stable")
    g = g.iloc[order]
    fv = full[order]
    b4 = np.empty(len(g), dtype=bool)
    b4[0] = True
    b4[1:] = fv[1:] != fv[:-1]
    s4 = np.flatnonzero(b4)
    n4 = np.add.reduceat(g["n"].to_numpy(dtype=np.int64), s4)
    g = g.iloc[s4].copy()
    g["n"] = n4
    key = g["subj_id"] + "\x00" + g["pred_id"] + "\x00" + g["obj_id"]
    # group boundaries over the sorted frame (vectorized)
    boundary = np.empty(len(g), dtype=bool)
    boundary[0] = True
    kv = key.to_numpy()
    boundary[1:] = kv[1:] != kv[:-1]
    starts = np.flatnonzero(boundary)
    offsets = np.append(starts, len(g)).astype(np.int64)
    lengths = np.diff(offsets)
    if (lengths > PUBLICATION_CAP).any():
        # rare: rebuild offending lists with the cap (`chemotext.py:42,53`)
        pubs_vals = g["pub"].to_numpy()
        pub_lists = [
            pubs_vals[a:b][:PUBLICATION_CAP].tolist()
            for a, b in zip(offsets[:-1], offsets[1:])
        ]
        publications = pa.array(pub_lists, pa.list_(pa.string()))
    else:
        publications = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(g["pub"], pa.string())
        )
    n_mentions = np.add.reduceat(g["n"].to_numpy(dtype=np.int64), starts)
    head = g.iloc[starts]
    pred = head["pred_id"]
    n = len(starts)
    return pa.table(
        {
            "subj_id": pa.array(head["subj_id"], pa.string()),
            "pred_id": pa.array(pred, pa.string()),
            "standard_label": pa.array(pred.str.replace(":", "_", regex=False),
                                       pa.string()),
            "obj_id": pa.array(head["obj_id"], pa.string()),
            "edge_source": pa.array([EDGE_SOURCE] * n, pa.string()),
            "ctime": pa.array([BUILD_CTIME] * n, pa.int64()),
            # `builder/chemotext.py:53` / `omnicorp.py:27` input_id formula
            "input_identifiers": pa.array(
                head["subj_id"] + "," + head["obj_id"], pa.string()
            ),
            "publications": publications,
            "n_mentions": pa.array(n_mentions, pa.int64()),
            "is_support": pa.array([False] * n, pa.bool_()),
        },
        schema=EDGES_SCHEMA,
    )


def _edge_partial_coded(batch: pd.DataFrame, codes_ref=None) -> pd.DataFrame:
    """Coded projection: (subj, obj) ride the exchange as ONE packed
    ``(s_code << 32) | o_code`` int64 (codes = rank in the sorted
    canonical universe, the shared coded-exchange contract) and the
    provenance string is NOT built yet — conv_id + turn_idx ship raw and
    the merge reconstructs ``CONV:<conv>#<turn>`` per bucket. ~60% fewer
    exchange bytes than the string projection (no 80-byte concat keys,
    no ones column)."""
    from .support import encoder_index

    idx = encoder_index(codes_ref)
    s = idx.get_indexer(batch["subj_id"].to_numpy()).astype(np.int64)
    o = idx.get_indexer(batch["obj_id"].to_numpy()).astype(np.int64)
    if len(s) and (s.min() < 0 or o.min() < 0):
        raise ValueError(
            "canonical id outside the coded universe — the entity code "
            "map must cover every linker output (coded-exchange contract)")
    return pd.DataFrame(
        {
            "so": (s << 32) | o,
            "pred_id": batch["pred_id"],
            "conv_id": batch["conv_id"],
            "turn_idx": batch["turn_idx"].astype(np.int32),
        }
    )


def _edge_merge_bucket_coded(g: pd.DataFrame, inv_ref=None) -> pa.Table:
    """Coded variant of :func:`_edge_merge_bucket`: int-major
    ``np.lexsort((pub, pred, so))`` replaces the concatenated string
    argsort, boundaries come from component-wise compares, and the
    code->curie decode runs on the AGGREGATE (edge-bounded) head rows
    only. Group contents, within-group publication order (ascending pub
    string) and all mention counts are identical to the string path
    (pinned by tests/test_round5.py equivalence)."""
    import ray as _ray

    if len(g) == 0 or "so" not in g.columns:
        return EDGES_SCHEMA.empty_table()
    pub = ("CONV:" + g["conv_id"] + "#"
           + g["turn_idx"].astype(str)).to_numpy()
    so = g["so"].to_numpy(dtype=np.int64)
    pred = g["pred_id"].to_numpy()
    order = np.lexsort((pub, pred, so))
    so, pred, pub = so[order], pred[order], pub[order]
    # (so, pred, pub) run boundaries: duplicate mentions collapse, counted
    b4 = np.empty(len(so), dtype=bool)
    b4[0] = True
    b4[1:] = ((so[1:] != so[:-1]) | (pred[1:] != pred[:-1])
              | (pub[1:] != pub[:-1]))
    s4 = np.flatnonzero(b4)
    n4 = np.diff(np.append(s4, len(so)))
    so, pred, pub = so[s4], pred[s4], pub[s4]
    boundary = np.empty(len(so), dtype=bool)
    boundary[0] = True
    boundary[1:] = (so[1:] != so[:-1]) | (pred[1:] != pred[:-1])
    starts = np.flatnonzero(boundary)
    offsets = np.append(starts, len(so)).astype(np.int64)
    lengths = np.diff(offsets)
    if (lengths > PUBLICATION_CAP).any():
        pub_lists = [
            pub[a:b][:PUBLICATION_CAP].tolist()
            for a, b in zip(offsets[:-1], offsets[1:])
        ]
        publications = pa.array(pub_lists, pa.list_(pa.string()))
    else:
        publications = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(pub, pa.string())
        )
    n_mentions = np.add.reduceat(n4, starts)
    inv = _ray.get(inv_ref)  # object ndarray: code -> curie
    so_h = so[starts]
    subj = inv[so_h >> 32]
    obj = inv[so_h & 0xFFFFFFFF]
    pred_h = pd.Series(pred[starts])
    n = len(starts)
    return pa.table(
        {
            "subj_id": pa.array(subj, pa.string()),
            "pred_id": pa.array(pred_h, pa.string()),
            "standard_label": pa.array(
                pred_h.str.replace(":", "_", regex=False), pa.string()),
            "obj_id": pa.array(obj, pa.string()),
            "edge_source": pa.array([EDGE_SOURCE] * n, pa.string()),
            "ctime": pa.array([BUILD_CTIME] * n, pa.int64()),
            "input_identifiers": pa.array(
                pd.Series(subj) + "," + pd.Series(obj), pa.string()),
            "publications": publications,
            "n_mentions": pa.array(n_mentions, pa.int64()),
            "is_support": pa.array([False] * n, pa.bool_()),
        },
        schema=EDGES_SCHEMA,
    )


def edges_stage(canonical, batch_size: int = 16_384,
                n_buckets: int = 64, entity_codes_ref=None):
    """Edge dedup/aggregation by (subj, pred, obj): per-batch projection ->
    ONE bucketed exchange (64 buckets) -> one vectorized merge per bucket.
    A bucket only sees its own key range so the merge is exact.
    ``bucketed_apply``'s sentinel padding keeps every reduce partition
    non-empty, so the exchange never emits the zero-column blocks that
    poison downstream schema unification (PandasBlockSchema warnings).

    With ``entity_codes_ref`` (the support path's broadcast
    {curie -> rank} map) the exchange runs CODED: packed int64 (s, o)
    keys, provenance reconstructed post-exchange — ~60% fewer shuffle
    bytes and an int-major bucket sort (BASELINE §2.9)."""
    import functools

    from ..functions.bucketing import bucketed_apply

    if entity_codes_ref is not None:
        import ray as _ray

        inv = np.array(sorted(_ray.get(entity_codes_ref)), dtype=object)
        inv_ref = _ray.put(inv)
        return bucketed_apply(
            canonical, ["so", "pred_id"],
            functools.partial(_edge_merge_bucket_coded, inv_ref=inv_ref),
            functools.partial(_edge_partial_coded, codes_ref=entity_codes_ref),
            n_buckets=n_buckets, batch_size=batch_size,
        )
    return bucketed_apply(
        canonical, _EDGE_KEYS, _edge_merge_bucket, _edge_partial,
        n_buckets=n_buckets, batch_size=batch_size,
    )
