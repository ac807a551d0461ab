"""Flagship pipeline: transcripts -> knowledge-graph node/edge/support tables.

Five stages (SURVEY §7.1), all Ray-Data-native and streaming end-to-end:

    read_parquet(transcripts)
      -> EXTRACT      stateless map_batches, zero-copy Arrow   (stages.extract)
      -> LINK         actor pool + broadcast lexicon + LRU     (stages.link)
      -> CANONICALIZE broadcast closure map join               (stages.canonicalize)
      -> SUPPORT      conv-scoped pairs + chi-square           (stages.support)
      -> MATERIALIZE  determinism sort + parquet + manifests   (state.lineage)

With ``checkpoint_dir`` set, every stage boundary is committed with a lineage
manifest and a re-run resumes from the last committed stage (north_rule
"resumable from checkpoint with per-partition lineage + metrics"); without
it the whole DAG is lazy and the streaming executor pipelines all stages
with backpressure.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import pyarrow.parquet as pq
import ray
import ray.data as rd

from ..gazetteer import Entity, canonical_map
from ..sources.corpus import ensure_corpus
from ..stages.canonicalize import canonicalize_stage, edges_stage, nodes_stage
from ..stages.extract import extract_stage
from ..stages.link import link_stage
from ..stages.support import support_stage


@dataclass
class LinkState:
    """Broadcast-once reference data (object-store refs, never per-batch)."""

    lexicon_ref: Any
    canon_ref: Any
    nodeinfo_ref: Any
    n_entities: int = 0
    extras: dict = field(default_factory=dict)


def load_link_state(corpus_paths: dict[str, str]) -> LinkState:
    """Build lexicon / canonical-closure / node-info dicts from the corpus
    reference tables (small side) and put them in the object store ONCE."""
    gaz = pq.read_table(corpus_paths["gazetteer"])
    ents = [
        Entity(c, n, t, tuple(s))
        for c, n, t, s in zip(
            gaz["curie"].to_pylist(),
            gaz["name"].to_pylist(),
            gaz["node_type"].to_pylist(),
            gaz["synonyms"].to_pylist(),
        )
    ]
    by_curie = {e.curie: e for e in ents}

    lex = pq.read_table(corpus_paths["lexicon"])
    lexicon: dict[str, tuple[str, ...]] = {}
    for surf, curie in zip(lex["surface_norm"].to_pylist(), lex["curie"].to_pylist()):
        lexicon[surf] = lexicon.get(surf, ()) + (curie,)

    br = pq.read_table(corpus_paths["bridges"])
    bridges = list(zip(br["a"].to_pylist(), br["b"].to_pylist()))
    canon = canonical_map(ents, bridges)

    members: dict[str, list[str]] = {}
    for curie, root in canon.items():
        members.setdefault(root, []).append(curie)
    nodeinfo: dict[str, tuple[str, str, list[str]]] = {}
    for root, mem in members.items():
        eq: set[str] = set()
        for m in mem:
            eq.add(m)
            eq.update(by_curie[m].synonyms)
        rep = by_curie[root]
        nodeinfo[root] = (rep.name, rep.node_type, sorted(eq))

    return LinkState(
        lexicon_ref=ray.put(lexicon),
        canon_ref=ray.put(canon),
        nodeinfo_ref=ray.put(nodeinfo),
        n_entities=len(ents),
    )


def n_distinct(ds, col: str) -> int:
    """Distinct count via bucketed two-phase dedup (functions.bucketing) —
    vectorized, no driver-side row iteration."""
    from ..functions.bucketing import bucketed_distinct

    return bucketed_distinct(ds.select_columns([col]), [col]).count()


def build_graph(
    sf_dir: str = "/root/testdata/sf0.001",
    checkpoint_dir: str | None = None,
    batch_size: int = 8192,
    link_concurrency: int | None = None,
    max_entities_per_conv: int = 256,
    transcripts_path: str | None = None,
    materialize_intermediate: bool = False,
    include_support: bool = True,
) -> dict[str, Any]:
    """Run (or resume) the flagship pipeline; returns named Datasets.

    Returned keys: transcripts, triples, linked, canonical, nodes, edges,
    support — all lazy unless ``checkpoint_dir`` committed them.
    """
    paths = ensure_corpus(sf_dir)
    if transcripts_path is None:
        transcripts_path = paths["transcripts"]
    state = load_link_state(paths)

    transcripts = rd.read_parquet(transcripts_path)

    def checkpointed(name: str, make):
        """Commit `make()` at a stage boundary when checkpointing is on."""
        if checkpoint_dir is None:
            return make()
        from ..state import lineage

        stage_dir = os.path.join(checkpoint_dir, name)
        if not lineage.is_complete(stage_dir):
            lineage.commit_stage(make(), stage_dir, inputs=[transcripts_path, name])
        return lineage.read_stage(stage_dir)

    triples = checkpointed("triples", lambda: extract_stage(transcripts, batch_size))
    linked = checkpointed(
        "linked",
        lambda: link_stage(triples, state.lexicon_ref, link_concurrency, batch_size),
    )
    canonical = checkpointed(
        "canonical", lambda: canonicalize_stage(linked, state.canon_ref)
    )
    if materialize_intermediate and checkpoint_dir is None:
        # canonical fans out to nodes/edges/support; pin it in the object
        # store so the three consumers don't each replay extract->link.
        # (With checkpoint_dir set, the parquet checkpoint serves this role.)
        canonical = canonical.materialize()
    nodes = nodes_stage(canonical, state.nodeinfo_ref)
    edges = edges_stage(canonical)
    # the support stage computes its marginal broadcast eagerly (it replays
    # the upstream chain), so it is built only when asked for
    n_convs = None
    support = None
    if include_support:
        n_convs = n_distinct(transcripts, "conv_id")
        support = support_stage(canonical, n_convs, max_entities_per_conv)

    return {
        "transcripts": transcripts,
        "triples": triples,
        "linked": linked,
        "canonical": canonical,
        "nodes": nodes,
        "edges": edges,
        "support": support,
        "n_conversations": n_convs,
        "state": state,
    }


def run_supporters(graph: dict[str, Any], names: list[str],
                   max_entities_per_conv: int = 256) -> dict[str, Any]:
    """Run named support modules (plugin registry, `builder/builder.py:
    320-323,567-571` ``-s`` analog) over the graph's candidate pairs.

    Returns {name: support-edge Dataset}."""
    from ..stages.support import candidate_pairs
    from ..stages.supporters import get_supporter

    ctx = {
        "canonical": graph["canonical"],
        "n_conversations": graph["n_conversations"]
        or n_distinct(graph["transcripts"], "conv_id"),
        "pairs": candidate_pairs(graph["canonical"], max_entities_per_conv),
        "state": graph["state"],
        "max_entities_per_conv": max_entities_per_conv,
    }
    return {name: get_supporter(name)(ctx) for name in names}


def materialize_graph(graph: dict[str, Any], out_dir: str) -> dict[str, dict]:
    """Stage 5 — determinism sort + committed parquet tables (S5/S6 analog).

    edges sorted by (subj_id, pred_id, obj_id); support by ascending p then
    pair key (`CooccurChi2.ipynb` cell 15, O3); nodes by id."""
    from ..state import lineage

    manifests = {}
    jobs = {
        "nodes": graph["nodes"].sort("id"),
        "edges": graph["edges"].sort(["subj_id", "pred_id", "obj_id"]),
    }
    if graph.get("support") is not None:
        jobs["support"] = graph["support"].sort(["p", "id_a", "id_b"])
    for sup_name, ds in graph.get("extra_supports", {}).items():
        jobs[f"support_{sup_name}"] = ds.sort(["id_a", "id_b"])
    for name, ds in jobs.items():
        manifests[name] = lineage.commit_stage(
            ds, os.path.join(out_dir, name), inputs=["canonical"]
        )
    return manifests
