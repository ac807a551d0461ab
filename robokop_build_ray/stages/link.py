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

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({c: [] for c in LINKED_COLUMNS})
        # one lookup per UNIQUE surface in the batch, not per row
        uniq = pd.unique(np.concatenate([batch["subj"].values, batch["obj"].values]))
        table = {s: self._ids_for(s) for s in uniq}
        out = pd.DataFrame(
            {
                "conv_id": batch["conv_id"].values,
                "turn_idx": batch["turn_idx"].values,
                "subj_id": batch["subj"].map(table),
                "pred_id": "PRED:" + batch["pred"],
                "obj_id": batch["obj"].map(table),
            }
        )
        out = out.explode("subj_id", ignore_index=True)
        out = out.explode("obj_id", ignore_index=True)
        out = out.dropna(subset=["subj_id", "obj_id"])
        out["turn_idx"] = out["turn_idx"].astype("int32")
        return out[LINKED_COLUMNS]


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
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
