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

Shuffle plan (fused): ONE conv-keyed bucketed exchange performs within-conv
distinct + per-bucket marginal partials + counted pair generation (map-side
per-batch dedup bounds hot-conversation skew before the shuffle); the only
other exchange is the pair-keyed count sum (`builder/builder.py:367-369`).
The driver collects only the entity-bounded marginal aggregate, then
``ray.put`` broadcast — no corpus-scale driver stream.
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
    return pa.Table.from_pandas(df, preserve_index=False).replace_schema_metadata(None)


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


def _pairs_all(d: pd.DataFrame, cap: int,
               with_conv: bool = False) -> pd.DataFrame:
    """All within-conversation unordered pairs of a DEDUPED (conv_id,
    entity) frame, fully vectorized across conversations (no per-conv
    Python loop — one bucket of ~10^4 conversations is a handful of numpy
    calls, the repeat+offset pattern of text_analysis.chunk_spans_batch).
    Per conv: entities sorted ascending, truncated to ``cap``, then every
    (i < j) pair — identical output multiset to mapping
    :func:`_pairs_group` over conversations. ``with_conv=True`` carries
    the originating conv_id onto every emitted pair (the provenance grain
    :func:`shared_publications_stage` needs)."""
    cols = (["id_a", "id_b", "conv_id"] if with_conv else ["id_a", "id_b"])
    empty = pd.DataFrame({c: pd.Series([], dtype=object) for c in cols})
    if len(d) == 0:
        return empty
    d2 = d.sort_values(["conv_id", "entity"], kind="mergesort")
    conv = d2["conv_id"].to_numpy()
    ent = d2["entity"].to_numpy()
    new = np.empty(len(conv), dtype=bool)
    new[0] = True
    new[1:] = conv[1:] != conv[:-1]
    starts = np.flatnonzero(new)
    k = np.diff(np.append(starts, len(conv)))
    # cap: keep each conversation's first `cap` (sorted) entities
    rank = np.arange(len(conv), dtype=np.int64) - np.repeat(starts, k)
    keep = rank < cap
    kc = np.minimum(k, cap)
    if not keep.all():
        ent = ent[keep]
        conv = conv[keep]
        rank = rank[keep]
    # element at in-conv rank i of a size-kc group leads (kc-1-i) pairs
    m = np.repeat(kc, kc) - 1 - rank
    total = int(m.sum())
    if total == 0:
        return empty
    a_idx = np.repeat(np.arange(len(ent), dtype=np.int64), m)
    off = (np.arange(total, dtype=np.int64)
           - np.repeat(np.concatenate([[0], np.cumsum(m)[:-1]]), m) + 1)
    out = {"id_a": ent[a_idx], "id_b": ent[a_idx + off]}
    if with_conv:
        out["conv_id"] = conv[a_idx]
    return pd.DataFrame(out)


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
        cat = _pairs_all(g.drop_duplicates(["conv_id", "entity"]), cap)
        if not len(cat):
            if counted:
                cat["n"] = pd.Series([], dtype="int64")
            return cat
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


SHARED_PUBS_SOURCE = "shared_pubs.term_to_term"
SHARED_PUBS_CAP = 10_000  # `builder/chemotext.py:42` LIMIT 10000

SHARED_PUBS_SCHEMA = pa.schema(
    [
        ("id_a", pa.string()),
        ("id_b", pa.string()),
        ("publications", pa.list_(pa.string())),
        ("n_pubs", pa.int64()),
        ("edge_source", pa.string()),
        ("is_support", pa.bool_()),
    ]
)


def shared_publications_stage(canonical, max_entities_per_conv: int = 256,
                              cap: int = SHARED_PUBS_CAP, n_buckets: int = 64):
    """Per-pair SHARED provenance lists — the omnicorp/chemotext supporter
    family (`builder/omnicorp.py:14-32` ``get_shared_pmids``,
    `builder/chemotext.py:48-61` article accumulation with LIMIT 10000):
    for every within-conversation entity pair, the sorted list of
    conversations (``CONV:<id>`` — the corpus' PMID analog) mentioning BOTH
    entities, capped at ``cap``.

    Plan: conv-scoped pair rows CARRYING conv_id (one bucketed exchange on
    conv) -> pair-keyed bucketed merge collecting sorted distinct lists as an
    Arrow ListArray (one vectorized call per bucket)."""
    from ..functions.bucketing import bucketed_apply

    conv_ent = conv_entity_stage(canonical)

    def conv_pairs(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized call per bucket (the _pairs_group per-conv loop
        # retired to the _pairs_all repeat+offset pattern, conv_id carried
        # onto each pair; output multiset pinned by test_support_pubs)
        p = _pairs_all(g.drop_duplicates(["conv_id", "entity"]),
                       max_entities_per_conv, with_conv=True)
        if not len(p):
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object),
                                 "pub": pd.Series([], dtype=object)})
        p["pub"] = "CONV:" + p.pop("conv_id").astype(str)
        return p

    pair_rows = bucketed_apply(conv_ent, ["conv_id"], conv_pairs,
                               None, n_buckets)

    def merge_lists(g: pd.DataFrame) -> pa.Table:
        if len(g) == 0:
            return SHARED_PUBS_SCHEMA.empty_table()
        g = g.drop_duplicates(["id_a", "id_b", "pub"])
        g = g.sort_values(["id_a", "id_b", "pub"], kind="mergesort")
        key = g["id_a"] + "\x00" + g["id_b"]
        kv = key.to_numpy()
        boundary = np.empty(len(g), dtype=bool)
        boundary[0] = True
        boundary[1:] = kv[1:] != kv[:-1]
        starts = np.flatnonzero(boundary)
        offsets = np.append(starts, len(g)).astype(np.int64)
        lengths = np.diff(offsets)
        if (lengths > cap).any():
            pubs_vals = g["pub"].to_numpy()
            publications = pa.array(
                [pubs_vals[a:b][:cap].tolist()
                 for a, b in zip(offsets[:-1], offsets[1:])],
                pa.list_(pa.string()),
            )
            n_pubs = np.minimum(lengths, cap)
        else:
            publications = pa.ListArray.from_arrays(
                pa.array(offsets), pa.array(g["pub"], pa.string())
            )
            n_pubs = lengths
        head = g.iloc[starts]
        return pa.table(
            {
                "id_a": pa.array(head["id_a"], pa.string()),
                "id_b": pa.array(head["id_b"], pa.string()),
                "publications": publications,
                "n_pubs": pa.array(n_pubs, pa.int64()),
                "edge_source": pa.array([SHARED_PUBS_SOURCE] * len(starts),
                                        pa.string()),
                "is_support": pa.array([True] * len(starts), pa.bool_()),
            },
            schema=SHARED_PUBS_SCHEMA,
        )

    return bucketed_apply(pair_rows, ["id_a", "id_b"], merge_lists,
                          None, n_buckets)


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


_ENCODER_CACHE: dict[str, pd.Index] = {}


def encoder_index(codes_ref) -> pd.Index:
    """Entity-bounded ``pd.Index`` over the SORTED canonical universe,
    cached per worker process by broadcast ref (int code == rank == lex
    order — the shared contract of every coded exchange: support pairs,
    marginals, and the coded edges aggregate)."""
    key = codes_ref.hex()
    idx = _ENCODER_CACHE.get(key)
    if idx is None:
        if len(_ENCODER_CACHE) > 4:  # stale runs' indexes, bounded
            _ENCODER_CACHE.clear()
        idx = pd.Index(sorted(ray.get(codes_ref)))
        _ENCODER_CACHE[key] = idx
    return idx


def _conv_entity_encode(batch: pa.Table, codes_ref) -> pd.DataFrame:
    """Explode subj/obj endpoints, ENCODE entities as int32 codes (rank in
    the sorted canonical-id universe — so int order == the lexicographic
    order every cap/sort contract is specified in), and dedup per batch.

    Runs in the TASK pool (full cluster width, no actor-pool spin-up on
    the support critical path — measured: a (1, 24) actor pool cost ~2 s
    of support_build at the bench tier); the entity-bounded ``pd.Index``
    is built once per WORKER PROCESS via a module-level cache keyed by
    the broadcast ref, and ``get_indexer`` makes encoding one vectorized
    hash probe per batch. Module-level function (pickles by reference)."""
    idx = encoder_index(codes_ref)
    conv = batch["conv_id"].to_numpy(zero_copy_only=False)
    s = batch["subj_id"].to_numpy(zero_copy_only=False)
    o = batch["obj_id"].to_numpy(zero_copy_only=False)
    return pd.DataFrame({
        "conv_id": np.concatenate([conv, conv]),
        "entity": idx.get_indexer(
            np.concatenate([s, o])).astype(np.int32),
    }).drop_duplicates()


_FUSED_CODED_EMPTY = {
    "id_a": pd.Series([], dtype="int32"),
    "id_b": pd.Series([], dtype="int32"),
    "n": pd.Series([], dtype="int64"),
    "kind": pd.Series([], dtype="int8"),
}


def _fused_conv_merge_coded(g: pd.DataFrame, cap: int) -> pd.DataFrame:
    """Int32-coded variant of :func:`_fused_conv_merge`: marginal partials
    ride as kind=0 rows (id_b = -1 sentinel), counted pairs as kind=1 —
    fully typed (no object columns), so the pair-keyed exchange ships
    12-byte rows instead of two curie strings.

    One packed ``(conv_code << 32) | entity`` int64 ``np.unique`` replaces
    the string-path drop_duplicates + marginal groupby + (conv, entity)
    object mergesort: the sorted unique keys are already grouped by conv
    with entities ASCENDING inside each group (int code order == lex
    order), which is exactly the layout the capped pair expansion needs.
    Output multiset identical to the string path
    (test_support_coded_path_equivalence)."""
    if len(g) == 0:
        return pd.DataFrame(_FUSED_CODED_EMPTY)
    conv_codes = pd.factorize(g["conv_id"], sort=False)[0].astype(np.int64)
    ent = g["entity"].to_numpy(np.int64)
    uk = np.unique((conv_codes << 32) | ent)  # entity codes are >= 0
    conv_u = uk >> 32
    ent_u = uk & 0xFFFFFFFF
    # marginals: conversations per entity over the distinct pairs
    me, mc = np.unique(ent_u, return_counts=True)
    marg = pd.DataFrame({
        "id_a": me.astype(np.int32),
        "id_b": np.full(len(me), -1, np.int32),
        "n": mc.astype(np.int64),
        "kind": np.zeros(len(me), np.int8),
    })
    # capped within-conv (i < j) pair expansion (the _pairs_all
    # repeat+offset pattern on int arrays)
    new = np.empty(len(conv_u), dtype=bool)
    new[0] = True
    new[1:] = conv_u[1:] != conv_u[:-1]
    starts = np.flatnonzero(new)
    k = np.diff(np.append(starts, len(conv_u)))
    rank = np.arange(len(conv_u), dtype=np.int64) - np.repeat(starts, k)
    keep = rank < cap
    kc = np.minimum(k, cap)
    if not keep.all():
        ent_u = ent_u[keep]
        rank = rank[keep]
    m = np.repeat(kc, kc) - 1 - rank
    total = int(m.sum())
    if total == 0:
        return marg if len(marg) else pd.DataFrame(_FUSED_CODED_EMPTY)
    a_idx = np.repeat(np.arange(len(ent_u), dtype=np.int64), m)
    off = (np.arange(total, dtype=np.int64)
           - np.repeat(np.concatenate([[0], np.cumsum(m)[:-1]]), m) + 1)
    pa_, pb_ = ent_u[a_idx], ent_u[a_idx + off]
    pk, pn = np.unique((pa_ << 32) | pb_, return_counts=True)
    pairs = pd.DataFrame({
        "id_a": (pk >> 32).astype(np.int32),
        "id_b": (pk & 0xFFFFFFFF).astype(np.int32),
        "n": pn.astype(np.int64),
        "kind": np.ones(len(pk), np.int8),
    })
    return pd.concat([marg, pairs], ignore_index=True)


class _SumScoreBucket:
    """Pair-keyed reduce FUSED with the chi2 scorer and the code->curie
    decode: one bucket call sums the per-conv-bucket pair partials,
    attaches marginals by int indexing (vectorized — no dict .map), and
    emits the final scored SUPPORT_SCHEMA rows. Module-level for
    by-reference serialization."""

    def __init__(self, marg_ref, inv_ref, n_conversations: int):
        # hold REFS (instances ship inside per-task closures): the arrays
        # stay in plasma and each worker ray.gets them zero-copy on first
        # use instead of riding pickled in every task payload
        self.marg_ref = marg_ref  # code -> c1 (int64)
        self.inv_ref = inv_ref    # code -> curie (object)
        self.n = n_conversations
        self.marg: np.ndarray | None = None
        self.inv: np.ndarray | None = None

    def __call__(self, g: pd.DataFrame) -> pa.Table:
        if self.marg is None:
            self.marg = ray.get(self.marg_ref)
            self.inv = ray.get(self.inv_ref)
        if len(g) == 0:
            return SUPPORT_SCHEMA.empty_table()
        agg = g.groupby(["id_a", "id_b"], sort=False, as_index=False)[
            "n"].sum()
        ia = agg["id_a"].to_numpy(np.int64)
        ib = agg["id_b"].to_numpy(np.int64)
        c = agg["n"].to_numpy(np.int64)
        c1 = self.marg[ia]
        c2 = self.marg[ib]
        expected, chi2, p = chi2_yates_vec(c, c1, c2, self.n)
        return pa.table(
            {
                "id_a": pa.array(self.inv[ia], pa.string()),
                "id_b": pa.array(self.inv[ib], pa.string()),
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


def _fused_conv_merge(g: pd.DataFrame, cap: int) -> pd.DataFrame:
    """Per-conv-bucket fused merge: exact within-conv distinct, per-bucket
    partial MARGINAL counts (rows kind='m'), and counted candidate pairs
    (rows kind='p') — one exchange produces everything the support scorer
    needs upstream of the pair-keyed sum."""
    empty = pd.DataFrame({"id_a": pd.Series([], dtype=object),
                          "id_b": pd.Series([], dtype=object),
                          "n": pd.Series([], dtype="int64"),
                          "kind": pd.Series([], dtype=object)})
    if len(g) == 0:
        return empty
    d = g.drop_duplicates(["conv_id", "entity"])
    marg = d.groupby("entity", sort=False).size().rename("n").reset_index()
    marg = pd.DataFrame({"id_a": marg["entity"], "id_b": None,
                         "n": marg["n"].astype("int64"), "kind": "m"})
    cat = _pairs_all(d, cap)
    if len(cat):
        pairs = (cat.groupby(["id_a", "id_b"], sort=False)
                 .size().rename("n").reset_index())
        pairs["kind"] = "p"
        return pd.concat([marg, pairs], ignore_index=True)
    return marg if len(marg) else empty


def support_stage(canonical, n_conversations: int,
                  max_entities_per_conv: int = 256, n_buckets: int = 64,
                  entity_codes_ref=None):
    """canonical triples -> scored co-occurrence pair table.

    ONE conv-keyed exchange does within-conv distinct + marginal partials +
    counted pair generation (see :func:`_fused_conv_merge`): per-batch
    dedup in `_conv_entity_batch` already bounds a hot conversation's
    map-side contribution to ~|entity pool| rows per batch, so conv-keyed
    reducers see no skew and the separate salted distinct exchange +
    marginal pass of the unfused plan collapse away (3 AllToAlls -> 2 on
    the support critical path).

    ``entity_codes_ref`` (a broadcast {curie -> rank-in-sorted-universe
    int} dict — entity-bounded, built once per run) selects the CODED fast
    path: entities ride both exchanges as int32 codes (int order == lex
    order, so every cap/sort contract is unchanged), the pair-keyed reduce
    fuses sum + chi2 scoring + decode into ONE bucket call
    (:class:`_SumScoreBucket`), and marginals attach by vectorized int
    indexing instead of a dict map. Output is bit-identical to the string
    path (pinned by test_support_coded_path_equivalence)."""
    from ..functions.bucketing import bucketed_apply, bucketed_sum
    from ..functions.ray_utils import rename

    if entity_codes_ref is not None:
        import functools

        explode = canonical.map_batches(
            functools.partial(_conv_entity_encode,
                              codes_ref=entity_codes_ref),
            batch_format="pyarrow")
        fused = bucketed_apply(
            explode, ["conv_id"],
            lambda g: _fused_conv_merge_coded(g, max_entities_per_conv),
            None, n_buckets,
        ).materialize()
        codes: dict[str, int] = ray.get(entity_codes_ref)
        inv = np.empty(len(codes), dtype=object)
        for k, i in codes.items():
            inv[i] = k
        marg_arr = np.zeros(len(codes), dtype=np.int64)
        # entity-bounded: <= n_buckets x |entities| aggregated partials
        for r in fused.filter(expr="kind == 0").take_all():
            marg_arr[int(r["id_a"])] += int(r["n"])
        pairs = fused.filter(expr="kind == 1").drop_columns(["kind"])
        return bucketed_apply(
            pairs, ["id_a", "id_b"],
            _SumScoreBucket(ray.put(marg_arr), ray.put(inv),
                            n_conversations),
            None, n_buckets)

    explode = canonical.map_batches(_conv_entity_batch, batch_format="pyarrow")
    fused = bucketed_apply(
        explode, ["conv_id"],
        lambda g: _fused_conv_merge(g, max_entities_per_conv),
        None, n_buckets,
    ).materialize()

    # marginals: per-bucket partials are entity-bounded; the driver merges
    # <= n_buckets x |entities| aggregated rows, never the corpus stream
    marg: dict[str, int] = {}
    for r in fused.filter(expr="kind == 'm'").take_all():
        marg[r["id_a"]] = marg.get(r["id_a"], 0) + int(r["n"])
    marg_ref = ray.put(marg)

    pairs = fused.filter(expr="kind == 'p'").drop_columns(["kind"])
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


def turn_window_pairs(canonical, window: int = 2,
                      max_entities_per_conv: int = 256,
                      n_buckets: int = 64):
    """TURN-WINDOW co-occurrence — the omnicorp analog at finer grain
    (`builder/omnicorp.py` counts article-level co-mentions; real
    omnicorp counts SENTENCE-level; here: entity pairs co-mentioned
    within ``window`` turns of the same conversation).

    Dataset(id_a, id_b, n_windows): per unordered pair, the number of
    (turn_a, turn_b) mention combinations with |turn_a - turn_b| <=
    window. Mentions are distinct (conv, turn, entity); the same
    lexicographically-first entity cap as support_stage bounds the
    per-conversation quadratic. ONE conv-keyed bucketed exchange; the
    per-bucket pairing is a vectorized self-merge + window filter (no
    per-conversation Python), followed by a pair-keyed count exchange."""
    import pandas as pd

    from ..functions.bucketing import bucketed_apply, bucketed_count

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.concat([
            b[["conv_id", "turn_idx", "subj_id"]].rename(
                columns={"subj_id": "id"}),
            b[["conv_id", "turn_idx", "obj_id"]].rename(
                columns={"obj_id": "id"}),
        ], ignore_index=True)
        return out.drop_duplicates()

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "conv_id" not in g.columns:
            return pd.DataFrame({"id_a": pd.Series([], dtype=object),
                                 "id_b": pd.Series([], dtype=object)})
        g = g.drop_duplicates(["conv_id", "turn_idx", "id"])
        # per-conv entity cap (lexicographically-first, like support)
        ce = g[["conv_id", "id"]].drop_duplicates().sort_values(
            ["conv_id", "id"], kind="mergesort")
        ce["rk"] = ce.groupby("conv_id", sort=False).cumcount()
        keep = ce[ce["rk"] < max_entities_per_conv][["conv_id", "id"]]
        g = g.merge(keep, on=["conv_id", "id"])
        m = g.merge(g, on="conv_id", suffixes=("_a", "_b"))
        m = m[(m["id_a"] < m["id_b"])
              & ((m["turn_idx_a"] - m["turn_idx_b"]).abs() <= window)]
        return m[["id_a", "id_b"]]

    paired = bucketed_apply(canonical, ["conv_id"], pairs, prep, n_buckets)
    counts = bucketed_count(paired, ["id_a", "id_b"], name="n_windows",
                            n_buckets=n_buckets)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["n_windows"] = b["n_windows"].astype("int64")
        return b

    return counts.map_batches(final, batch_format="pandas")


TRIPLE_CAP = 64  # SPEC: per-conv entity cap for triple generation
TRIPLE_MIN_SUP = 2  # SPEC: minimum conversations per reported triple


def support_triples_stage(canonical, cap: int = TRIPLE_CAP,
                          min_sup: int = TRIPLE_MIN_SUP,
                          n_buckets: int = 64):
    """Frequent entity TRIPLES by conversation co-mention (the Apriori
    level-3 / market-basket grain above :func:`candidate_pairs`):
    Dataset(id_a < id_b < id_c, n_convs) for triples co-mentioned in
    >= ``min_sup`` conversations, each conversation contributing its
    lexicographically-first ``cap`` distinct entities (a SPEC cap like
    max_entities_per_conv, mirrored exactly by the oracle).

    Scale shape: conv-bucketed generation (one vectorized two-merge
    expansion per bucket, O(cap^3) bounded per conversation) emits
    per-bucket PRE-COUNTED partials; one triple-keyed exchange folds
    counts and applies the min-support filter map-side of the output —
    the same two-exchange shape as the counted pair stage."""
    from ..functions.bucketing import bucketed_apply

    conv_ent = conv_entity_stage(canonical)

    _empty = {
        "id_a": pd.Series([], dtype=object),
        "id_b": pd.Series([], dtype=object),
        "id_c": pd.Series([], dtype=object),
        "n": pd.Series([], dtype="int64"),
    }

    def gen(g: pd.DataFrame) -> pd.DataFrame:
        d = (g.drop_duplicates(["conv_id", "entity"])
             .sort_values(["conv_id", "entity"], kind="mergesort"))
        rank = d.groupby("conv_id", sort=False).cumcount()
        d = d[rank.to_numpy() < cap][["conv_id", "entity"]]
        if len(d) < 3:
            return pd.DataFrame(_empty)
        p = d.merge(d, on="conv_id")
        p = p[p["entity_x"].to_numpy() < p["entity_y"].to_numpy()]
        if len(p) == 0:
            return pd.DataFrame(_empty)
        t = p.merge(d, on="conv_id")
        t = t[t["entity"].to_numpy() > t["entity_y"].to_numpy()]
        if len(t) == 0:
            return pd.DataFrame(_empty)
        out = (t.groupby(["entity_x", "entity_y", "entity"], sort=False)
               .size().rename("n").reset_index())
        out.columns = ["id_a", "id_b", "id_c", "n"]
        return out.astype({"n": "int64"})

    counted = bucketed_apply(conv_ent, ["conv_id"], gen, None, n_buckets)

    _empty_out = {
        "id_a": pd.Series([], dtype=object),
        "id_b": pd.Series([], dtype=object),
        "id_c": pd.Series([], dtype=object),
        "n_convs": pd.Series([], dtype="int64"),
    }

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(_empty_out)
        out = (g.groupby(["id_a", "id_b", "id_c"], sort=False,
                         as_index=False)["n"].sum())
        out = out[out["n"].to_numpy() >= min_sup]
        out = out.rename(columns={"n": "n_convs"})
        return out.astype({"n_convs": "int64"})

    return bucketed_apply(counted, ["id_a", "id_b", "id_c"], fold, None,
                          n_buckets)
