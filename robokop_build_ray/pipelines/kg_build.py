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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

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

    # entity int codes for the support fast path: rank in the SORTED
    # canonical-id universe, so int order == lexicographic order (every
    # cap/sort contract in the support family is lex-specified)
    codes = {k: i for i, k in enumerate(sorted(nodeinfo))}
    return LinkState(
        lexicon_ref=ray.put(lexicon),
        canon_ref=ray.put(canon),
        nodeinfo_ref=ray.put(nodeinfo),
        n_entities=len(ents),
        extras={"entity_codes_ref": ray.put(codes)},
    )


def n_distinct(ds, col: str) -> int:
    """Distinct count via bucketed two-phase dedup (functions.bucketing) —
    vectorized, no driver-side row iteration."""
    from ..functions.bucketing import bucketed_distinct

    return bucketed_distinct(ds.select_columns([col]), [col]).count()


def build_graph(
    sf_dir: str = "/root/testdata/sf0.001",
    checkpoint_dir: str | None = None,
    # 16384 measured best for the arrow-native extract+link chain at the
    # bench tier (5.87 s vs 6.13 s at 8192, 6.20 s at 32768 — BASELINE
    # §2.8); the old 8192 default was tuned for the pandas-era linker
    batch_size: int = 16_384,
    link_concurrency: int | None = None,
    max_entities_per_conv: int = 256,
    transcripts_path: str | None = None,
    materialize_intermediate: bool = False,
    include_support: bool = True,
    support_async: bool = False,
    timings: dict | None = None,
    path: str | None = None,
    start: str | None = None,
    end: str | None = None,
) -> dict[str, Any]:
    """Run (or resume) the flagship pipeline; returns named Datasets.

    Returned keys: transcripts, triples, linked, canonical, nodes, edges,
    support — all lazy unless ``checkpoint_dir`` committed them.
    """
    paths = ensure_corpus(sf_dir)
    if transcripts_path is None:
        transcripts_path = paths["transcripts"]
    state = load_link_state(paths)

    from ..sources.readers import read_transcripts

    transcripts = read_transcripts(transcripts_path)

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
    if checkpoint_dir is None:
        # fast path: canonicalization fused into the linking actors (one
        # actor stage, one broadcast, one pandas conversion); the separate
        # `linked` chain stays available lazily for stage-level inspection
        linked = link_stage(triples, state.lexicon_ref, link_concurrency,
                            batch_size)
        canonical = link_stage(triples, state.lexicon_ref, link_concurrency,
                               batch_size, canon_ref=state.canon_ref)
    else:
        # checkpoint mode commits each stage boundary separately
        linked = checkpointed(
            "linked",
            lambda: link_stage(triples, state.lexicon_ref, link_concurrency,
                               batch_size),
        )
        canonical = checkpointed(
            "canonical", lambda: canonicalize_stage(linked, state.canon_ref)
        )
    if path is not None and start is not None:
        # anchored query (--start/--end, `builder/builder.py:574-602`):
        # DSL scoping x hop-distance gate from the resolved anchor(s)
        canonical = anchored_path_filter(
            canonical, path, _resolve_anchor(start, state),
            state.nodeinfo_ref,
            end_curie=None if end is None else _resolve_anchor(end, state))
    elif path is not None:
        # Path-DSL scoping (M1 -> §2.10 consumer): the parsed Steps drive
        # which triples reach the graph, like the reference's run()
        canonical = path_filter(canonical, path, state.nodeinfo_ref)
    if materialize_intermediate and checkpoint_dir is None:
        # canonical fans out to nodes/edges/support; pin it in the object
        # store so the three consumers don't each replay extract->link.
        # (With checkpoint_dir set, the parquet checkpoint serves this role.)
        import time as _time

        _t0 = _time.time()
        canonical = canonical.materialize()
        if timings is not None:
            timings["extract_link_canonicalize"] = round(_time.time() - _t0, 3)
    # exchange-width knob for the bench A/B (round-3 verdict #7): the
    # 64-bucket constant was tuned at round-1 throughput; GRAFT_N_BUCKETS
    # lets a bench window re-measure it without a code edit
    _nb = int(os.environ.get("GRAFT_N_BUCKETS", "64"))
    nodes = nodes_stage(canonical, state.nodeinfo_ref)
    edges = edges_stage(canonical, n_buckets=_nb,
                        entity_codes_ref=state.extras.get("entity_codes_ref"))
    # the support stage computes its marginal broadcast eagerly (it replays
    # the upstream chain), so it is built only when asked for
    n_convs = None
    support = None
    support_future = None
    if include_support:
        # population size N (`builder/cdw.py:16` total analog): read from the
        # corpus metadata when generation recorded it, else count distinct
        meta_path = os.path.join(os.path.dirname(transcripts_path), "_META.json")
        if os.path.exists(meta_path):
            import json

            with open(meta_path) as f:
                n_convs = json.load(f)["n_conversations"]
        else:
            n_convs = n_distinct(transcripts, "conv_id")
        import time as _time

        def _mk_support():
            _t0 = _time.time()
            s = support_stage(
                canonical, n_convs, max_entities_per_conv, n_buckets=_nb,
                entity_codes_ref=state.extras.get("entity_codes_ref"))
            if timings is not None:
                timings["support_build"] = round(_time.time() - _t0, 3)
            return s

        if support_async:
            # overlap: the support exchange (the longest phase) executes on
            # a driver thread CONCURRENTLY with the node/edge sort+write
            # jobs that materialize_graph launches — Ray Data supports
            # concurrent dataset executions, so the streaming executor
            # interleaves both over the same CPU pool and the write phase
            # hides under the support build instead of following it.
            support_future = _SUPPORT_POOL.submit(_mk_support)
        else:
            support = _mk_support()

    return {
        "transcripts": transcripts,
        "triples": triples,
        "linked": linked,
        "canonical": canonical,
        "nodes": nodes,
        "edges": edges,
        "support": support,
        "support_future": support_future,
        "n_conversations": n_convs,
        "state": state,
    }


def path_filter(canonical, path: str, nodeinfo_ref):
    """Scope canonical triples to a Path-DSL pattern (M1 consumer): keep a
    triple when its endpoint node types match ANY adjacent step pair of the
    path, in either direction; ``?`` is a wildcard. This is the engine-side
    analog of the reference's DSL -> query derivation
    (`builder/builder.py:497-521`): the DSL now drives which triples flow to
    the graph, not just a parsed-and-dropped artifact."""
    import pandas as pd
    import ray as _ray

    from ..functions.pathdsl import step_type_pairs, tokenize_path

    pairs = step_type_pairs(tokenize_path(path))
    if not pairs:
        raise ValueError(f"path {path!r} has fewer than two steps")

    class TypePairFilter:
        def __init__(self):
            info = _ray.get(nodeinfo_ref)
            self.types = {k: v[1] for k, v in info.items()}
            universe = sorted(set(self.types.values()))
            # expand wildcards against the (small) type universe, then match
            # vectorized on 'a|b' keys in BOTH directions
            allowed: set[str] = set()
            for x, y in pairs:
                xs = universe if x == "unspecified" else [x]
                ys = universe if y == "unspecified" else [y]
                for a in xs:
                    for c in ys:
                        allowed.add(f"{a}|{c}")
                        allowed.add(f"{c}|{a}")
            self.allowed = allowed

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            key = b["subj_id"].map(self.types) + "|" + b["obj_id"].map(self.types)
            return b[key.isin(self.allowed)]

    return canonical.map_batches(TypePairFilter, batch_format="pandas",
                                 concurrency=(1, 2))


def path_filter_varlen(canonical, path: str, nodeinfo_ref):
    """VAR-LENGTH Path-DSL execution (M1 + `builder/userquery.py:26-37`
    ``-[:translation*min..max]-`` semantics): keep a canonical triple when
    it lies on a path whose OUTER endpoint types match a step pair,
    honoring the step's edge bounds — direct hops when ``min <= 1`` (the
    ``path_filter`` behavior) and 2-hop paths through ANY intermediate
    node when ``max >= 2``, so ``S(2-2)D`` keeps exactly the triples that
    are either hop of a chemical--*--disease 2-path.

    Scale shape: the canonical node universe is ENTITY-BOUNDED (gazetteer
    components), so the distinct edge set and the per-vertex
    neighbor-type counts it implies are computed with one bucketed
    distinct + a driver fold and broadcast; the corpus-scale triple
    stream is then filtered vectorized — never joined."""
    import pandas as pd
    import ray as _ray

    from ..functions.bucketing import bucketed_distinct
    from ..functions.pathdsl import NODE_TYPE_BY_CODE, tokenize_path

    steps = tokenize_path(path)
    if len(steps) < 2:
        raise ValueError(f"path {path!r} has fewer than two steps")
    # (X_code, lo, hi, Y_code) per adjacent pair; bounds ride on the step
    # the edge leads INTO (pathdsl contract)
    legs = [
        (NODE_TYPE_BY_CODE[a.nodetype], b.min_path_length,
         b.max_path_length, NODE_TYPE_BY_CODE[b.nodetype])
        for a, b in zip(steps[:-1], steps[1:])
    ]
    if any(hi > 2 for _, _, hi, _ in legs):
        raise ValueError("path bounds beyond 2 hops are not implemented")

    # distinct undirected edge set (entity-pair-bounded collect, same
    # boundedness argument as nodes_stage's coalesced distinct)
    dist = bucketed_distinct(
        canonical.select_columns(["subj_id", "obj_id"]),
        ["subj_id", "obj_id"],
    ).take_all()
    neighbors: dict[str, set] = {}
    for r in dist:
        a, b = r["subj_id"], r["obj_id"]
        if a == b:
            continue  # self-loops are not path hops
        neighbors.setdefault(a, set()).add(b)
        neighbors.setdefault(b, set()).add(a)

    info = _ray.get(nodeinfo_ref)
    types = {k: v[1] for k, v in info.items()}
    universe = sorted(set(types.values()))

    def tset(code: str) -> frozenset:
        return frozenset(universe if code == "unspecified" else [code])

    # per-leg broadcast state: for the 2-hop legs, per-vertex counts of
    # neighbors whose type falls in the X / Y type sets
    leg_state = []
    for x, lo, hi, y in legs:
        xs, ys = tset(x), tset(y)
        cnt_x = {v: sum(1 for w in nb if types.get(w) in xs)
                 for v, nb in neighbors.items()} if hi >= 2 else {}
        cnt_y = {v: sum(1 for w in nb if types.get(w) in ys)
                 for v, nb in neighbors.items()} if hi >= 2 else {}
        leg_state.append((xs, ys, lo, hi, cnt_x, cnt_y))
    state_ref = _ray.put((types, leg_state))

    return canonical.map_batches(
        VarLenFilter, batch_format="pandas", concurrency=(1, 2),
        fn_constructor_kwargs={"state_ref": state_ref})


class VarLenFilter:
    """MODULE-LEVEL actor UDF (CLAUDE.md rule: local classes pickle by
    value, so workers skip the package import that installs the
    empty-block size-warning filter and re-ship the class per task);
    broadcast state arrives via ``fn_constructor_kwargs``."""

    def __init__(self, state_ref):
        import ray as _ray

        self.types, self.legs = _ray.get(state_ref)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        ta = b["subj_id"].map(self.types)
        tb = b["obj_id"].map(self.types)
        keep = pd.Series(False, index=b.index)
        for xs, ys, lo, hi, cnt_x, cnt_y in self.legs:
            in_xa, in_ya = ta.isin(xs), ta.isin(ys)
            in_xb, in_yb = tb.isin(xs), tb.isin(ys)
            if lo <= 1:
                keep |= (in_xa & in_yb) | (in_ya & in_xb)
            if hi >= 2:
                # outer endpoint on one side, middle on the other: a
                # 2-path x-m-y exists iff the middle has ANOTHER
                # neighbor of the far type (its own partner excluded
                # when its type already falls in that set)
                nyb = b["obj_id"].map(cnt_y).fillna(0) - in_ya
                nxb = b["obj_id"].map(cnt_x).fillna(0) - in_xa
                nya = b["subj_id"].map(cnt_y).fillna(0) - in_yb
                nxa = b["subj_id"].map(cnt_x).fillna(0) - in_xb
                keep |= (in_xa & (nyb >= 1)) | (in_ya & (nxb >= 1))
                keep |= (in_xb & (nya >= 1)) | (in_yb & (nxa >= 1))
        return b[keep]


def path_scoped_pairs(canonical, path: str, nodeinfo_ref,
                      n_buckets: int = 64):
    """PATH-POSITION-SCOPED support candidate pairs — the
    ``generate_links_from_paths`` analog (`builder/builder.py:372-407`):
    support candidates are generated ONLY between entities lying on a
    realized instance of the active DSL path, not between all
    conversation co-occurrences. Mirrors the reference's prefix-path
    semantics exactly: walking positions 0..k, every node reached at
    position i pairs with ALL its path ancestors (`builder.py:396-399`
    ``ancestors[other].update(...)``), so a prefix that dies before the
    final position still contributes its pairs; self pairs collapse
    (the reference's (v, v) entries are dropped here by the a < b
    normalization). Output: Dataset(id_a < id_b), distinct.

    Supported paths: 2 or 3 direct-hop positions (``SGD``, ``S?D``, …;
    ``?`` is the wildcard). Var-length legs compose via
    :func:`path_filter_varlen` upstream instead — bounds > 1 raise.

    Scale shape: distinct undirected edges -> per-MID-node grouped
    expansion (one bucketed exchange keyed on the path's middle
    position, srcs x dsts vectorized per group — the metapath_2hop
    pattern) -> one bucketed distinct on the pair. Node types ride the
    entity-bounded ``nodeinfo_ref`` broadcast; per-mid fan-out is
    deg_T0(mid) x deg_T2(mid) — salt/cap hubs if a corpus grows
    super-hubs (the metapath cost profile)."""
    import ray as _ray
    import ray.data as _rd

    from ..functions.bucketing import bucketed_distinct, bucketed_group_pairs
    from ..functions.pathdsl import NODE_TYPE_BY_CODE, tokenize_path
    from ..stages.graph_metrics import _adjacency, undirected_pairs

    steps = tokenize_path(path)
    if any(s.max_path_length > 1 for s in steps[1:]):
        raise ValueError(
            "path_scoped_pairs takes direct hops only; compose "
            "path_filter_varlen upstream for var-length legs")
    if len(steps) < 2:
        raise ValueError(f"path {path!r} has fewer than two positions")

    info = _ray.get(nodeinfo_ref)
    types = {k: v[1] for k, v in info.items()}
    universe = sorted(set(types.values()))

    def tset(code: str) -> frozenset:
        t = NODE_TYPE_BY_CODE[code]
        return frozenset(universe if t == "unspecified" else [t])

    tsets = [tset(s.nodetype) for s in steps]
    und = undirected_pairs(canonical, n_buckets=n_buckets)
    types_ref = _ray.put(types)

    _empty = {"id_a": pd.Series([], dtype=object),
              "id_b": pd.Series([], dtype=object)}

    seed_tbl = pa.table({"id_a": pa.array([], pa.string()),
                         "id_b": pa.array([], pa.string())})
    if len(steps) > 3:
        # GENERAL-k, DISTRIBUTED (r04 verdict #6): per-position
        # prefix-instance closure — A_i(v) = union over edges (u, v) with
        # u realized at position i-1 of {u} + A_{i-1}(u); pairs = every
        # (v, a) with a in A_i(v). On distinct-type paths this is exactly
        # the reference walk (`builder.py:379-405`); under WILDCARDS the
        # reference's single global ancestor dict is iteration-ORDER-
        # DEPENDENT (in-round feedback when a node realizes consecutive
        # positions — measured 12.6% divergence across orders on random
        # graphs), so the well-defined per-position completion is the
        # pinned contract (tests/test_round4.py).
        #
        # Scale shape: the ancestor relation (up to entities^2) lives as
        # a bucketed (k, a) Dataset, never a driver dict; each round is
        # ONE bucketed cross-expansion keyed on the current node (direct
        # + transitive contributions together) plus a bucketed distinct.
        # Driver state is only the realized-position node set (the same
        # entity bound as the BFS frontier / nodeinfo broadcast).
        from ..functions.bucketing import bucketed_group_pairs as _bgp
        from ..stages.graph_metrics import degree_map

        adj = _adjacency(und).materialize()
        cur = {n for n in degree_map(und)
               if types.get(n, "") in tsets[0]}
        _kv_empty = {"k": pd.Series([], dtype=object),
                     "a": pd.Series([], dtype=object)}
        rounds = []
        anc_prev = None
        for ts in tsets[1:]:
            if not cur:
                break
            cur_ref = _ray.put(cur)
            allowed = frozenset(ts)

            def step_tag(b: pd.DataFrame, _cur=cur_ref, _ts=allowed,
                         _ty=types_ref) -> pd.DataFrame:
                tm, cs = _ray.get(_ty), _ray.get(_cur)
                sub = b[b["id"].isin(cs)]
                if len(sub):
                    tv = sub["nb"].map(lambda x: tm.get(x, ""))
                    sub = sub[tv.isin(_ts).to_numpy()]
                return pd.DataFrame({"k": sub["id"], "side": "E",
                                     "val": sub["nb"]})

            tagged = adj.map_batches(step_tag, batch_format="pandas")
            if anc_prev is not None:

                def tag_anc(b: pd.DataFrame) -> pd.DataFrame:
                    return pd.DataFrame({"k": b["k"], "side": "A",
                                         "val": b["a"]})

                tagged = tagged.union(
                    anc_prev.map_batches(tag_anc, batch_format="pandas"))

            def cross(g: pd.DataFrame) -> pd.DataFrame:
                if len(g) == 0 or "side" not in g.columns:
                    return pd.DataFrame(_kv_empty)
                vs = g.loc[g["side"] == "E", "val"].to_numpy(dtype=object)
                if len(vs) == 0:
                    return pd.DataFrame(_kv_empty)
                u = g["k"].iloc[0]
                ancs = g.loc[g["side"] == "A", "val"].to_numpy(dtype=object)
                ks = np.concatenate([vs, np.repeat(vs, len(ancs))])
                vals = np.concatenate([np.full(len(vs), u, dtype=object),
                                       np.tile(ancs, len(vs))])
                return pd.DataFrame({"k": ks, "a": vals})

            anc_i = bucketed_distinct(
                _bgp(tagged, ["k"], cross, n_buckets), ["k", "a"],
                n_buckets).materialize()
            rounds.append(anc_i)
            cur = {r["k"] for r in bucketed_distinct(
                anc_i.select_columns(["k"]), ["k"], n_buckets).take_all()}
            anc_prev = anc_i
        if not rounds:
            return _rd.from_arrow(seed_tbl)
        allp = rounds[0]
        for r in rounds[1:]:
            allp = allp.union(r)

        def norm_pairs(b: pd.DataFrame) -> pd.DataFrame:
            m = (b["k"] != b["a"]).to_numpy()
            ia = b["k"].to_numpy(dtype=object)[m]
            ib = b["a"].to_numpy(dtype=object)[m]
            return pd.DataFrame({"id_a": np.minimum(ia, ib),
                                 "id_b": np.maximum(ia, ib)})

        pairs = allp.map_batches(norm_pairs, batch_format="pandas")
    elif len(steps) == 2:
        t0, t1 = tsets

        def edge_pairs(b: pd.DataFrame) -> pd.DataFrame:
            tm = _ray.get(types_ref)
            ta = b["a"].map(lambda x: tm.get(x, ""))
            tb = b["b"].map(lambda x: tm.get(x, ""))
            keep = ((ta.isin(t0) & tb.isin(t1))
                    | (ta.isin(t1) & tb.isin(t0)))
            return pd.DataFrame({"id_a": b["a"][keep],
                                 "id_b": b["b"][keep]})

        pairs = und.map_batches(edge_pairs, batch_format="pandas")
    else:
        t0, t1, t2 = tsets

        def mid_expand(g: pd.DataFrame) -> pd.DataFrame:
            if len(g) == 0 or "id" not in g.columns:
                return pd.DataFrame(_empty)  # empty-bucket probe call
            tm = _ray.get(types_ref)
            mid = g["id"].iloc[0]
            if tm.get(mid, "") not in t1:
                return pd.DataFrame(_empty)
            nbs = g["nb"].to_numpy(dtype=object)
            kinds = np.array([tm.get(x, "") for x in nbs], dtype=object)
            srcs = nbs[np.array([k in t0 for k in kinds], dtype=bool)]
            dsts = nbs[np.array([k in t2 for k in kinds], dtype=bool)]
            outs = []
            if len(srcs):
                # prefix pairs (v0, v1): reached mids pair with ancestors
                outs.append(pd.DataFrame({"id_a": srcs, "id_b": mid}))
                if len(dsts):
                    # (v1, v2): v2 reached because SOME src realized the
                    # prefix (the src may be v2 itself, builder.py:394-398)
                    outs.append(pd.DataFrame({"id_a": dsts, "id_b": mid}))
                    a = np.repeat(srcs, len(dsts))
                    d = np.tile(dsts, len(srcs))
                    keep = a != d  # (v0, v2) self pairs collapse
                    outs.append(pd.DataFrame({"id_a": a[keep],
                                              "id_b": d[keep]}))
            if not outs:
                return pd.DataFrame(_empty)
            out = pd.concat(outs, ignore_index=True)
            ia = out["id_a"].to_numpy(dtype=object)
            ib = out["id_b"].to_numpy(dtype=object)
            return pd.DataFrame({"id_a": np.minimum(ia, ib),
                                 "id_b": np.maximum(ia, ib)})

        pairs = bucketed_group_pairs(_adjacency(und), ["id"], mid_expand,
                                     n_buckets)

    seed = _rd.from_arrow(pa.table({"id_a": pa.array([], pa.string()),
                                    "id_b": pa.array([], pa.string())}))

    def typed(b: pd.DataFrame) -> pa.Table:
        return pa.table({"id_a": pa.array(b["id_a"], pa.string()),
                         "id_b": pa.array(b["id_b"], pa.string())})

    return (bucketed_distinct(pairs, ["id_a", "id_b"], n_buckets)
            .map_batches(typed, batch_format="pandas").union(seed))


def path_node_contexts(canonical, path: str, nodeinfo_ref,
                       n_buckets: int = 64):
    """Per-node path-position CONTEXTS (`builder/builder.py:381,396` —
    ``node.contexts[program_number]``): which DSL positions each node
    realizes on a COMPLETE path instance. In the reference, contexts are
    assigned from full cypher query matches, so position i membership
    requires BOTH a realized prefix reaching the node at i AND a
    realized suffix continuing to the final position — here
    ``F_i ∩ B_i`` of a forward and a backward typed frontier closure
    over the undirected simple graph. Returns Dataset(id, pos) exploded
    rows, distinct (the exported node table derives its ``contexts``
    list by grouping this).

    Scale shape: each closure round is one distributed adjacency filter
    against the broadcast frontier plus a bucketed distinct of the next
    frontier; driver state is only the per-position node sets (the BFS
    frontier / nodeinfo entity bound). Direct-hop positions only, like
    :func:`path_scoped_pairs`."""
    import ray as _ray
    import ray.data as _rd

    from ..functions.bucketing import bucketed_distinct
    from ..functions.pathdsl import NODE_TYPE_BY_CODE, tokenize_path
    from ..stages.graph_metrics import _adjacency, degree_map, undirected_pairs

    steps = tokenize_path(path)
    if any(s.max_path_length > 1 for s in steps[1:]):
        raise ValueError("path_node_contexts takes direct hops only")
    info = _ray.get(nodeinfo_ref)
    types = {k: v[1] for k, v in info.items()}
    universe = sorted(set(types.values()))

    def tset(code: str) -> frozenset:
        t = NODE_TYPE_BY_CODE[code]
        return frozenset(universe if t == "unspecified" else [t])

    tsets = [tset(s.nodetype) for s in steps]
    und = undirected_pairs(canonical, n_buckets=n_buckets)
    adj = _adjacency(und).materialize()
    graph_nodes = set(degree_map(und))  # entity-bounded
    types_ref = _ray.put(types)

    def closure(ts_list: list[frozenset]) -> list[set]:
        """[P_0..P_{k-1}]: P_0 = typed graph nodes; P_i = typed
        neighbors of P_{i-1} — one distributed pass per round."""
        cur = {n for n in graph_nodes if types.get(n, "") in ts_list[0]}
        sets = [cur]
        for ts in ts_list[1:]:
            if not cur:
                cur = set()
                sets.append(cur)
                continue
            cur_ref = _ray.put(cur)
            allowed = frozenset(ts)

            def step(b: pd.DataFrame, _cur=cur_ref, _ts=allowed,
                     _ty=types_ref) -> pd.DataFrame:
                tm, cs = _ray.get(_ty), _ray.get(_cur)
                sub = b[b["id"].isin(cs)]
                if len(sub):
                    tv = sub["nb"].map(lambda x: tm.get(x, ""))
                    sub = sub[tv.isin(_ts).to_numpy()]
                return pd.DataFrame({"nb": sub["nb"]})

            cur = {r["nb"] for r in bucketed_distinct(
                adj.map_batches(step, batch_format="pandas"), ["nb"],
                n_buckets).take_all()}
            sets.append(cur)
        return sets

    F = closure(tsets)
    R = closure(list(reversed(tsets)))  # R_j = B_{k-1-j}
    k = len(tsets)
    ids, poss = [], []
    for i in range(k):
        for n in sorted(F[i] & R[k - 1 - i]):
            ids.append(n)
            poss.append(i)
    return _rd.from_arrow(pa.table({
        "id": pa.array(ids, pa.string()),
        "pos": pa.array(poss, pa.int64())}))


def nodes_with_contexts(nodes, canonical, path: str, nodeinfo_ref,
                        n_buckets: int = 64):
    """Attach the reference's per-node ``contexts`` (list<int32> of DSL
    positions realized on complete instances of the ACTIVE path query,
    `builder/builder.py:381,396`) to an exported node table; nodes off
    the path carry an empty list. The context map is entity-bounded —
    broadcast once, applied map-side (no shuffle)."""
    import ray as _ray

    ctx = path_node_contexts(canonical, path, nodeinfo_ref, n_buckets)
    m: dict[str, list[int]] = {}
    for r in ctx.take_all():  # entity-bounded
        m.setdefault(r["id"], []).append(int(r["pos"]))
    m_ref = _ray.put({k: sorted(v) for k, v in m.items()})

    def attach(t: pa.Table, _m=m_ref) -> pa.Table:
        mm = _ray.get(_m)
        vals = [mm.get(i, []) for i in t["id"].to_pylist()]
        return t.append_column(
            "contexts", pa.array(vals, pa.list_(pa.int32())))

    return nodes.map_batches(attach, batch_format="pyarrow")


def _resolve_anchor(name_or_curie: str, state) -> str:
    """Resolve a CLI anchor to a canonical CURIE (the reference resolves
    ``--start``/``--end`` names through `builder/lookup_utils.py` before
    building): a string containing ``:`` is taken as a CURIE verbatim;
    otherwise the lexicon lookup (first match, D1 order) resolves the
    name, then the canonical map collapses synonyms. Raises on no match
    — the reference errors out the build the same way."""
    import ray as _ray

    from ..functions.lookup import lookup_drug_by_name

    if ":" in name_or_curie:
        curie = name_or_curie
    else:
        hits = lookup_drug_by_name(name_or_curie,
                                   _ray.get(state.lexicon_ref))
        if not hits:
            raise ValueError(f"anchor {name_or_curie!r} resolved to no "
                             "CURIE in the lexicon")
        curie = hits[0]
    return _ray.get(state.canon_ref).get(curie, curie)


class AnchorFilter:
    """MODULE-LEVEL actor UDF (same pickling rule as VarLenFilter): keeps
    triples whose BOTH endpoints fall in the broadcast anchor-reachable
    node set."""

    def __init__(self, allow_ref):
        import ray as _ray

        self.allow = _ray.get(allow_ref)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        return b[b["subj_id"].isin(self.allow)
                 & b["obj_id"].isin(self.allow)]


def anchored_path_filter(canonical, path: str, start_curie: str,
                         nodeinfo_ref, end_curie: str | None = None,
                         n_buckets: int = 64):
    """ANCHORED Path-DSL scoping — the reference CLI's ``--start``/
    ``--end`` semantics (`builder/builder.py:574-602` anchors every query
    at a named entity; `builder/examples.sh`): the DSL type filter
    (:func:`path_filter`) composes with hop-distance gating, keeping a
    triple only when both endpoints lie within the path's total edge
    budget (sum of per-step max bounds) of the start anchor — and of the
    end anchor too when given, approximating "on a path between them".

    Scale shape: the BFS distance maps are node-bounded (gazetteer
    universe) driver state exactly like :func:`~..stages.graph_metrics.
    bfs_distances`; the corpus-scale triple stream is then filtered
    vectorized against ONE broadcast allow-set — no joins, no extra
    shuffles beyond the BFS's own bounded exchanges."""
    import ray as _ray

    from ..functions.pathdsl import tokenize_path
    from ..stages.graph_metrics import bfs_distances

    steps = tokenize_path(path)
    if len(steps) < 2:
        raise ValueError(f"path {path!r} has fewer than two steps")
    budget = sum(s.max_path_length for s in steps[1:])

    scoped = path_filter(canonical, path, nodeinfo_ref)
    allow = {r["id"] for r in bfs_distances(
        canonical, None, "", rounds=budget, seeds={start_curie},
        n_buckets=n_buckets).take_all()}  # node-bounded
    if end_curie is not None:
        allow &= {r["id"] for r in bfs_distances(
            canonical, None, "", rounds=budget, seeds={end_curie},
            n_buckets=n_buckets).take_all()}
    allow_ref = _ray.put(allow)
    return scoped.map_batches(
        AnchorFilter, batch_format="pandas", concurrency=(1, 2),
        fn_constructor_kwargs={"allow_ref": allow_ref})


def combined_edges(graph: dict[str, Any],
                   max_entities_per_conv: int = 256):
    """ONE edge table, reference-sink shape (`builder/builder.py:32-41`):
    extraction edges + cooccur support edges + shared-pubs support edges,
    with the support stats payload (`builder/cdw.py:55-60` props dict
    {c1,c2,c,e,p}) flattened to Arrow-typed nullable columns (p excluded:
    it is a monotone erfc transform of chi2, pytest-checked; DuckDB cannot
    recompute erfc for the oracle)."""
    import numpy as np
    import pyarrow as pa

    from ..stages.support import shared_publications_stage

    SUPPORT_PRED = "SUPPORT:literature_co-occurence"
    SUPPORT_LABEL = "SUPPORT_literature_co-occurence"

    def pad_edges(t: pa.Table) -> pa.Table:
        n = len(t)
        return t.drop_columns([c for c in ("p",) if c in t.column_names]) \
            .append_column("c1", pa.nulls(n, pa.int64())) \
            .append_column("c2", pa.nulls(n, pa.int64())) \
            .append_column("c", pa.nulls(n, pa.int64())) \
            .append_column("expected", pa.nulls(n, pa.float64())) \
            .append_column("chi2", pa.nulls(n, pa.float64()))

    def support_to_edges(t: pa.Table) -> pa.Table:
        n = len(t)
        from ..stages.canonicalize import BUILD_CTIME
        import pyarrow.compute as pc

        return pa.table(
            {
                "subj_id": t["id_a"],
                "pred_id": pa.array([SUPPORT_PRED] * n, pa.string()),
                "standard_label": pa.array([SUPPORT_LABEL] * n, pa.string()),
                "obj_id": t["id_b"],
                "edge_source": pa.array(["cooccur.term_to_term"] * n,
                                        pa.string()),
                "ctime": pa.array(np.full(n, BUILD_CTIME), pa.int64()),
                "input_identifiers": pc.binary_join_element_wise(
                    pc.cast(t["id_a"], pa.string()),
                    pc.cast(t["id_b"], pa.string()), ","
                ),
                "publications": pa.array([[]] * n, pa.list_(pa.string())),
                "n_mentions": pa.nulls(n, pa.int64()),
                "is_support": pa.array([True] * n, pa.bool_()),
                "c1": t["c1"], "c2": t["c2"], "c": t["c"],
                "expected": t["expected"], "chi2": t["chi2"],
            }
        )

    def pubs_to_edges(t: pa.Table) -> pa.Table:
        n = len(t)
        from ..stages.canonicalize import BUILD_CTIME
        import pyarrow.compute as pc

        return pa.table(
            {
                "subj_id": t["id_a"],
                "pred_id": pa.array([SUPPORT_PRED] * n, pa.string()),
                "standard_label": pa.array([SUPPORT_LABEL] * n, pa.string()),
                "obj_id": t["id_b"],
                "edge_source": t["edge_source"],
                "ctime": pa.array(np.full(n, BUILD_CTIME), pa.int64()),
                "input_identifiers": pc.binary_join_element_wise(
                    pc.cast(t["id_a"], pa.string()),
                    pc.cast(t["id_b"], pa.string()), ","
                ),
                "publications": t["publications"],
                "n_mentions": pa.nulls(n, pa.int64()),
                "is_support": t["is_support"],
                "c1": pa.nulls(n, pa.int64()),
                "c2": pa.nulls(n, pa.int64()),
                "c": pa.nulls(n, pa.int64()),
                "expected": pa.nulls(n, pa.float64()),
                "chi2": pa.nulls(n, pa.float64()),
            }
        )

    if graph.get("support") is None:
        raise ValueError("combined_edges requires include_support=True")
    e = graph["edges"].map_batches(pad_edges, batch_format="pyarrow")
    s = graph["support"].select_columns(
        ["id_a", "id_b", "c1", "c2", "c", "expected", "chi2"]
    ).map_batches(support_to_edges, batch_format="pyarrow")
    p = shared_publications_stage(
        graph["canonical"], max_entities_per_conv
    ).map_batches(pubs_to_edges, batch_format="pyarrow")
    return e.union(s, p)


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


def _ensure_fsspec_http_stub() -> None:
    """Make ``fsspec.implementations.http`` importable deterministically.

    The module needs aiohttp (absent here); Ray's path resolution retries the
    failing import on EVERY write and only catches ModuleNotFoundError —
    under concurrent writes a thread can observe the partially-initialized
    module and crash with a plain ImportError. A stub module whose
    HTTPFileSystem is a never-instantiated class keeps Ray's isinstance
    checks correct (always False) and thread-safe."""
    import sys
    import types

    try:
        import fsspec.implementations.http  # noqa: F401
        return
    except ImportError:
        pass
    mod = types.ModuleType("fsspec.implementations.http")

    class HTTPFileSystem:  # stub for isinstance checks only
        pass

    mod.HTTPFileSystem = HTTPFileSystem
    sys.modules["fsspec.implementations.http"] = mod


# dedicated single-thread pool for the async support build (kept at module
# scope so the worker outlives the build_graph call that submitted to it)
from concurrent.futures import ThreadPoolExecutor as _TPE

_SUPPORT_POOL = _TPE(max_workers=1, thread_name_prefix="support-build")

SMALL_SORT_MAX_ROWS = 4_000_000
# output files per table: parquet ENCODE parallelism for the write phase
# (one 225 MB edge file was a single-task encode — write_edges dominated
# BENCH_r02's wall); also the resumable-output layout (north_rule).
# 16 measured best at the bench tier: 8 left write_edges at ~17% of e2e
# wall (8.9 s of 53.6 s, round 3), 16 halves the per-task encode size
# while files stay >= 4096 rows (~14 MB each for the list-heavy edges).
WRITE_FANOUT = 16


def _small_sort(ds, keys: list[str], out_blocks: int = WRITE_FANOUT):
    """Exact global sort for AGGREGATE-BOUNDED outputs (node/edge/support
    tables are bounded by the entity universe, not the corpus): coalesce to
    one block and sort it — skips the sort-shuffle's fixed AllToAll cost —
    then SPLIT the sorted block (order-preserving repartition) so the
    parquet encode fans out over ``out_blocks`` write tasks. For outputs
    that outgrow a single block, use ``Dataset.sort``
    (``materialize_graph`` enforces this with a row-count check)."""
    return ds.repartition(1).map_batches(
        lambda t: t.sort_by([(k, "ascending") for k in keys]),
        batch_format="pyarrow",
        batch_size=None,
    ).repartition(out_blocks)


def materialize_graph(graph: dict[str, Any], out_dir: str,
                      small_sorts: bool = True,
                      timings: dict | None = None) -> dict[str, dict]:
    """Stage 5 — determinism sort + committed parquet tables (S5/S6 analog).

    edges sorted by (subj_id, pred_id, obj_id); support by ascending p then
    pair key (`CooccurChi2.ipynb` cell 15, O3); nodes by id."""
    from ..state import lineage

    manifests = {}
    # jobs stay LAZY here — run() materializes, and doing that during dict
    # construction would serialize the three table DAGs that the thread pool
    # exists to overlap
    # edges FIRST: the nodes job derives its id universe from the PINNED
    # edge aggregate when possible (distinct subj/obj over the deduped
    # edge table == distinct over canonical, since every canonical row is
    # an edge-group member) — skipping a second corpus-scale scan. Order
    # matters for GRAFT_SERIAL_WRITES=1, where jobs run in dict order.
    jobs = {
        "edges": (graph["edges"], ["subj_id", "pred_id", "obj_id"]),
        "nodes": (graph["nodes"], ["id"]),
    }
    if graph.get("support") is not None:
        jobs["support"] = (graph["support"], ["p", "id_a", "id_b"])
    elif graph.get("support_future") is not None:
        # async support build (build_graph(support_async=True)): the job
        # blocks on the future inside its own thread, so node/edge writes
        # proceed while the support exchange is still executing
        jobs["support"] = (graph["support_future"], ["p", "id_a", "id_b"])
    for sup_name, ds in graph.get("extra_supports", {}).items():
        jobs[f"support_{sup_name}"] = (ds, ["id_a", "id_b"])
    # the three output pipelines are independent: execute them CONCURRENTLY
    # (driver threads; Ray Data supports concurrent dataset executions) so
    # wall time is max(job), not sum(job). GRAFT_SERIAL_WRITES=1 serializes
    # them (diagnostic for concurrent-execution scheduler contention).
    from concurrent.futures import ThreadPoolExecutor

    max_workers = (1 if os.environ.get("GRAFT_SERIAL_WRITES") == "1"
                   else len(jobs))

    _ensure_fsspec_http_stub()

    import threading

    edges_pinned: dict[str, Any] = {}
    edges_ready = threading.Event()

    def run(item):
        import time as _time
        from concurrent.futures import Future

        name, (ds, keys) = item
        t0 = _time.time()
        if isinstance(ds, Future):
            ds = ds.result()  # async support build (overlapped, see above)
        if (name == "nodes" and "edges" in jobs
                and graph.get("state") is not None):
            # wait for the edges job's pinned aggregate and derive the id
            # universe from it (aggregate-bounded scan, not corpus-scale);
            # fall back to the canonical-scan plan if edges failed
            edges_ready.wait(timeout=3600)
            if "ds" in edges_pinned:
                ds = nodes_stage(edges_pinned["ds"],
                                 graph["state"].nodeinfo_ref)
        if name == "nodes" and graph.get("node_decorator") is not None:
            # post-rebuild hook (the pinned-edges rebuild above REPLACES
            # the dataset, so decorations like the --contexts column must
            # attach here, not upstream)
            ds = graph["node_decorator"](ds)
        # phase accounting: `agg_<name>` is the upstream AGGREGATION compute
        # (executing the table's DAG from canonical); `write_<name>` is the
        # actual determinism sort + parquet encode + manifest commit
        try:
            if small_sorts:
                # the "aggregate-bounded" assumption is ENFORCED, not
                # assumed: pin the table (it is about to be written
                # anyway), fall back to the distributed sort when it
                # outgrows a single block
                mat = ds.materialize()
                n = mat.count()
                if timings is not None:
                    timings[f"agg_{name}"] = round(_time.time() - t0, 3)
                t1 = _time.time()
                if name == "edges":
                    edges_pinned["ds"] = mat
                    edges_ready.set()
                sorted_ds = (mat.sort(keys) if n > SMALL_SORT_MAX_ROWS
                             else _small_sort(mat, keys))
            else:
                sorted_ds, n = ds.sort(keys), None
                t1 = t0
        finally:
            if name == "edges":
                edges_ready.set()  # unblock nodes even when edges failed
        # file granularity: WRITE_FANOUT files per table (parallel encode,
        # resumable parts), floored so tiny tables stay one file
        mrpf = (200_000 if n is None
                else max(4096, min(200_000, n // WRITE_FANOUT)))
        m = lineage.commit_stage(sorted_ds, os.path.join(out_dir, name),
                                 inputs=["canonical"],
                                 min_rows_per_file=mrpf)
        if timings is not None:
            timings[f"write_{name}"] = round(_time.time() - t1, 3)
        return name, m

    with ThreadPoolExecutor(max_workers=max_workers) as pool:
        for name, m in pool.map(run, jobs.items()):
            manifests[name] = m
    return manifests
