"""Stage 2 — LINK: mention surface -> CURIE entity linking (actor pool).

Rebuilds the reference's name-lookup services (`builder/lookup_utils.py:4-77`)
as a stateful ``map_batches`` actor pool: the lexicon dictionary is put in the
object store ONCE (``ray.put``) and each actor materializes its read view in
``__init__`` — never re-shipped per batch. Per-actor LRU cache over normalized
surfaces is the analog of the reference's Redis op-cache
(`builder/output:3`, `builder/builder.py:350-356`): within a batch we look up
each *unique* surface once, and hot surfaces stay cached across batches.

Union semantics: a surface matching multiple dictionary entries links to ALL
of them (`builder/lookup_utils.py:50-66` multi-source union); unmatched
mentions are dropped (`builder/lookup_utils.py:10-12` logs and yields none).
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import pandas as pd
import ray

from ..functions.text import normalize_name

LINKED_COLUMNS = ["conv_id", "turn_idx", "subj_id", "pred_id", "obj_id"]


class EntityLinker:
    """Callable class for ``map_batches(..., concurrency=N)``.

    ``lexicon_ref``: ``ray.ObjectRef`` of dict[surface_norm -> tuple[curie,...]].
    """

    def __init__(self, lexicon_ref, cache_size: int = 65_536, canon_ref=None):
        self.lexicon: dict[str, tuple[str, ...]] = ray.get(lexicon_ref)
        self.cache_size = cache_size
        self._lru: OrderedDict[str, tuple[str, ...]] = OrderedDict()
        # optional fused canonicalization (`stages.canonicalize` semantics):
        # when set, surfaces resolve STRAIGHT to canonical ids — one actor
        # stage instead of two, one pandas conversion instead of two
        self.canon: dict[str, str] | None = (
            ray.get(canon_ref) if canon_ref is not None else None
        )

    def _ids_for(self, surface: str) -> tuple[str, ...]:
        hit = self._lru.get(surface)
        if hit is not None:
            self._lru.move_to_end(surface)
            return hit
        ids = self.lexicon.get(normalize_name(surface), ())
        if self.canon is not None:
            ids = tuple(self.canon.get(i, i) for i in ids)
        self._lru[surface] = ids
        if len(self._lru) > self.cache_size:
            self._lru.popitem(last=False)
        return ids

    def __call__(self, batch: "pa.Table") -> "pa.Table":
        """Arrow-native linking: surfaces dictionary-encode in C, lookups
        run once per UNIQUE surface, and the (overwhelmingly common)
        single-id rows resolve via `pc.take` over per-unique id arrays —
        zero Python-object churn on the 10^12-turn hot path. Rows whose
        surfaces link to multiple CURIEs take a rare Python cartesian
        branch; multiset output equals the old pandas double-explode
        (pinned by test_linker_arrow_matches_pandas_reference)."""
        import pyarrow as pa
        import pyarrow.compute as pc

        empty = pa.table({
            "conv_id": pa.array([], pa.string()),
            "turn_idx": pa.array([], pa.int32()),
            "subj_id": pa.array([], pa.string()),
            "pred_id": pa.array([], pa.string()),
            "obj_id": pa.array([], pa.string()),
        })
        if len(batch) == 0:
            return empty
        s_enc = pc.dictionary_encode(batch["subj"].combine_chunks())
        o_enc = pc.dictionary_encode(batch["obj"].combine_chunks())
        p_enc = pc.dictionary_encode(batch["pred"].combine_chunks())
        s_codes = s_enc.indices.to_numpy()
        o_codes = o_enc.indices.to_numpy()
        ids_s = [self._ids_for(s) for s in s_enc.dictionary.to_pylist()]
        ids_o = [self._ids_for(s) for s in o_enc.dictionary.to_pylist()]
        s_len = np.fromiter(map(len, ids_s), np.int64, len(ids_s))
        o_len = np.fromiter(map(len, ids_o), np.int64, len(ids_o))
        rep = s_len[s_codes] * o_len[o_codes]
        single = np.flatnonzero(rep == 1)
        multi = np.flatnonzero(rep > 1)
        if len(single) == 0 and len(multi) == 0:
            return empty
        s_first = pa.array([t[0] if t else None for t in ids_s],
                           pa.string())
        o_first = pa.array([t[0] if t else None for t in ids_o],
                           pa.string())
        subj_col = pc.take(s_first, pa.array(s_codes[single]))
        obj_col = pc.take(o_first, pa.array(o_codes[single]))
        row_idx = single
        if len(multi):
            m_rows: list[int] = []
            m_subj: list[str] = []
            m_obj: list[str] = []
            for r in multi.tolist():
                for a in ids_s[s_codes[r]]:
                    for b in ids_o[o_codes[r]]:
                        m_rows.append(r)
                        m_subj.append(a)
                        m_obj.append(b)
            row_idx = np.concatenate(
                [single, np.asarray(m_rows, np.int64)])
            subj_col = pa.concat_arrays(
                [subj_col, pa.array(m_subj, pa.string())])
            obj_col = pa.concat_arrays(
                [obj_col, pa.array(m_obj, pa.string())])
        idx = pa.array(row_idx)
        pred_vals = pa.array(
            ["PRED:" + p for p in p_enc.dictionary.to_pylist()],
            pa.string())
        p_codes = p_enc.indices.to_numpy()
        return pa.table({
            "conv_id": pc.take(batch["conv_id"], idx),
            "turn_idx": pc.cast(pc.take(batch["turn_idx"], idx),
                                pa.int32()),
            "subj_id": subj_col,
            "pred_id": pc.take(pred_vals, pa.array(p_codes[row_idx])),
            "obj_id": obj_col,
        })


def link_stage(triples, lexicon_ref, concurrency: int | None = None,
               batch_size: int = 8192, canon_ref=None):
    """raw triples Dataset -> linked triples Dataset (actor pool); pass
    ``canon_ref`` to fuse canonicalization into the same actors."""
    if concurrency is None:
        # the fused extract+link actor pool is the hot stage: let it scale to
        # (almost) the whole cluster; autoscaling min stays low so small test
        # clusters never deadlock
        cpus = int(ray.cluster_resources().get("CPU", 8))
        # min sized so the pool ramps immediately (slow autoscale ramp is a
        # fixed wall-time cost) while leaving headroom for read/downstream
        # tasks; still starts on a 4-CPU test cluster without deadlocking
        # min leaves >= 4 CPUs of headroom: a downstream actor pool, the
        # read task, AND up to a couple of straggler actors from a prior
        # execution in the same process must all fit, or the executor
        # deadlocks (observed at 8 CPUs: 5-min pool + 2 orphaned linker
        # actors + 1 attacher = 8 leases, read task starved forever)
        concurrency = (max(1, min((2 * cpus) // 3, cpus - 4)),
                       max(2, cpus - 2))
    if isinstance(concurrency, int):
        concurrency = (1, concurrency)  # autoscaling pool: never deadlocks small clusters
    return triples.map_batches(
        EntityLinker,
        fn_constructor_args=(lexicon_ref,),
        fn_constructor_kwargs={"canon_ref": canon_ref},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
