"""Stage 4 — SUPPORT: per-conversation co-occurrence scoring.

The reference scores ALL node pairs of the built graph with remote
co-occurrence services (`builder/builder.py:320-370` all-pairs +
`builder/cdw.py` chi-square over patient count tables). O(n_graph²) does not
scale; following the reference's own mitigation (path-scoped pairs,
`builder/builder.py:372-407`) pairs are scoped to entities co-occurring in
the SAME conversation (SURVEY J5), bounded by conversation entity count (cap
``max_entities_per_conv``, lexicographically-first, deterministic).

Statistics mirror `builder/cdw.py:37-100` + `CDW/CooccurChi2.ipynb` cells 2-5:
marginal count c1/c2 = conversations containing the entity, joint c =
conversations containing both, expected = c1*c2/N, 2x2 chi-square with Yates
correction, p = erfc(sqrt(chi2/2)) (df=1), and privacy suppression of small
joint counts (c < 11 -> suppressed, `builder/cdw.py:94-98`; modeled as a bool
flag per SURVEY §7.4.6 to stay Arrow-typed).

Shuffle plan: distinct (conv_id, entity) via per-batch dedup + groupby;
marginals are an entity-bounded SMALL table -> driver dict -> ``ray.put``
broadcast (no join shuffle); joints via groupby on the canonical unordered
pair key (min,max) (`builder/builder.py:367-369`).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

SUPPORT_SOURCE = "cooccur.term_to_term"
SUPPRESS_BELOW = 11

SUPPORT_SCHEMA = pa.schema(
    [
        ("id_a", pa.string()),
        ("id_b", pa.string()),
        ("c1", pa.int64()),
        ("c2", pa.int64()),
        ("c", pa.int64()),
        ("expected", pa.float64()),
        ("chi2", pa.float64()),
        ("p", pa.float64()),
        ("suppressed", pa.bool_()),
    ]
)

_erfc = np.frompyfunc(math.erfc, 1, 1)


def chi2_yates_vec(c: np.ndarray, c1: np.ndarray, c2: np.ndarray, n: int):
    """Vectorized (expected, chi2, p) for 2x2 tables with Yates correction."""
    c = c.astype(np.float64)
    c1 = c1.astype(np.float64)
    c2 = c2.astype(np.float64)
    expected = c1 * c2 / n
    denom = c1 * c2 * (n - c1) * (n - c2)
    o11, o12, o21, o22 = c, c1 - c, c2 - c, n - c1 - c2 + c
    num = np.maximum(0.0, np.abs(o11 * o22 - o12 * o21) - n / 2.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        chi2 = np.where(denom > 0, n * num * num / np.maximum(denom, 1.0), 0.0)
    p = _erfc(np.sqrt(chi2 / 2.0)).astype(np.float64)
    return expected, chi2, p


def _conv_entity_batch(batch: pa.Table) -> pa.Table:
    """Partial distinct of (conv_id, entity) — explode subj/obj endpoints."""
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    s = batch["subj_id"].to_numpy(zero_copy_only=False)
    o = batch["obj_id"].to_numpy(zero_copy_only=False)
    df = pd.DataFrame(
        {"conv_id": np.concatenate([conv, conv]), "entity": np.concatenate([s, o])}
    ).drop_duplicates()
    return pa.Table.from_pandas(df, preserve_index=False)


def conv_entity_stage(canonical, salt_k: int | None = 64):
    """-> distinct (conv_id, entity) Dataset.

    One fused map (explode subj/obj endpoints + per-batch dedup + salted
    bucket key over BOTH columns) and ONE shuffle: a hot conversation's rows
    spread over ``salt_k`` reducers because the bucket hash includes the
    entity (the explicit salted shuffle of the north_rule). ``salt_k=None``
    degrades to a single reducer; both produce identical output
    (tests/test_skew.py)."""
    # explode stays ARROW-format (zero-copy column reads; converting the
    # full 5-column canonical batch to pandas measurably regresses), the
    # bucketed distinct then touches only the two key columns
    partial = canonical.map_batches(_conv_entity_batch, batch_format="pyarrow")
    from ..functions.skew import plain_distinct, salted_distinct

    if salt_k is None:
        return plain_distinct(partial, ["conv_id", "entity"])
    return salted_distinct(partial, ["conv_id", "entity"],
                           salt_from="entity", k=salt_k)


def _pairs_group(group: pd.DataFrame, cap: int) -> pd.DataFrame:
    ids = np.sort(group["entity"].unique())[:cap]
    if len(ids) < 2:
        return pd.DataFrame({"id_a": [], "id_b": []})
    ii, jj = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})


def _pairs_stage(conv_ent, cap: int, n_buckets: int = 64,
                 counted: bool = False):
    """Within-conversation unordered pairs. Conversations are hash-bucketed
    (functions.bucketing) so the shuffle produces ~n_buckets groups and pair
    generation runs as ONE vectorized Python call per bucket (not one per
    conversation); per-conv work is bounded by ``cap`` (O(cap^2)) regardless
    of conversation size.

    ``counted=True`` pre-aggregates pair counts INSIDE the conv-bucket merge
    (columns id_a, id_b, n): the downstream pair-keyed exchange then ships
    ~|distinct pairs per bucket| rows instead of every raw pair."""
    from ..functions.bucketing import bucketed_apply

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        outs = [_pairs_group(sub, cap)
                for _, sub in g.groupby("conv_id", sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            empty = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                  "id_b": pd.Series([], dtype=object)})
            if counted:
                empty["n"] = pd.Series([], dtype="int64")
            return empty
        cat = pd.concat(outs, ignore_index=True)
        if counted:
            cat = (cat.groupby(["id_a", "id_b"], sort=False)
                   .size().rename("n").reset_index())
        return cat

    return bucketed_apply(conv_ent, ["conv_id"], merge, None, n_buckets)


def candidate_pairs(canonical, max_entities_per_conv: int = 256):
    """Distinct candidate entity pairs (unordered, min<max) from
    per-conversation co-occurrence — the input contract every supporter
    shares (the reference's `generate_all_links`/path-scoped equivalent,
    `builder/builder.py:364-407`, pair-dedup per its support cache
    `builder/builder.py:348-356`)."""
    from ..functions.bucketing import bucketed_distinct

    conv_ent = conv_entity_stage(canonical)
    pairs = _pairs_stage(conv_ent, max_entities_per_conv)
    return bucketed_distinct(pairs, ["id_a", "id_b"])


class SupportScorer:
    """Attach marginals (broadcast dict) and compute chi2 stats per batch."""

    def __init__(self, marginals_ref, n_conversations: int):
        self.marg: dict[str, int] = ray.get(marginals_ref)
        self.n = n_conversations

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:
            return SUPPORT_SCHEMA.empty_table()
        c = batch["c"].to_numpy()
        c1 = batch["id_a"].map(self.marg).to_numpy(dtype=np.int64)
        c2 = batch["id_b"].map(self.marg).to_numpy(dtype=np.int64)
        expected, chi2, p = chi2_yates_vec(c, c1, c2, self.n)
        return pa.table(
            {
                "id_a": pa.array(batch["id_a"], pa.string()),
                "id_b": pa.array(batch["id_b"], pa.string()),
                "c1": pa.array(c1, pa.int64()),
                "c2": pa.array(c2, pa.int64()),
                "c": pa.array(c, pa.int64()),
                "expected": pa.array(expected, pa.float64()),
                "chi2": pa.array(chi2, pa.float64()),
                "p": pa.array(p, pa.float64()),
                "suppressed": pa.array(c < SUPPRESS_BELOW),
            },
            schema=SUPPORT_SCHEMA,
        )


def support_stage(canonical, n_conversations: int,
                  max_entities_per_conv: int = 256):
    """canonical triples -> scored co-occurrence pair table."""
    # materialized: consumed twice (marginals broadcast + pair generation)
    conv_ent = conv_entity_stage(canonical).materialize()

    from ..functions.bucketing import bucketed_sum
    from ..functions.ray_utils import rename

    # marginals: entity-bounded small aggregate. conv_ent is already
    # distinct, so counting per entity is a streamed driver-side
    # accumulation over its batches — the result dict must fit the driver
    # anyway (it is broadcast to scorers), and skipping the extra shuffle
    # saves a whole AllToAll exchange.
    marg: dict[str, int] = {}
    for batch in conv_ent.iter_batches(batch_size=65_536, batch_format="pandas"):
        for ent, n in batch["entity"].value_counts().items():
            marg[ent] = marg.get(ent, 0) + int(n)
    marg_ref = ray.put(marg)

    pairs = _pairs_stage(conv_ent, max_entities_per_conv, counted=True)
    joint = rename(
        bucketed_sum(pairs, ["id_a", "id_b"], "n"), {"n": "c"}
    )
    return joint.map_batches(
        SupportScorer,
        fn_constructor_args=(marg_ref, n_conversations),
        batch_format="pandas",
        batch_size=65_536,
        concurrency=(1, 2),
    )
