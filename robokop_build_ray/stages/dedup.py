"""Deduplication operators over the ``documents`` table.

Training-data-pipeline dedup family, all Ray-Data-first:

- exact:        content fingerprint -> hash-partition groupby -> keep min id
- minhash-LSH:  shingle -> minhash sig -> band buckets (groupby) -> candidate
                pairs -> signature-Jaccard verify
- simhash:      64-bit simhash -> 16-bit chunk buckets (pigeonhole for
                hamming<=3) -> verify hamming distance
- ngram-jaccard: exact Jaccard over word n-gram shingle sets within LSH
                candidate buckets (no all-pairs at scale)
- embedding:    cosine near-dup within label blocks (numpy matmul per group)

All hashes are process-stable (fixed-key siphash / FNV folds), never
Python's randomized ``hash``. Stateful pieces (permutation tables) live in
actor ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_MERSENNE = (1 << 61) - 1


def shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    """Stable hashes of word n-gram shingles (sorted unique, uint64) —
    one vectorized fixed-key siphash call per doc, no per-gram Python loop."""
    toks = text.lower().split()
    if len(toks) < n:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    if not grams:
        return np.array([], dtype=np.uint64)
    return np.unique(pd.util.hash_array(np.asarray(grams, dtype=object)))


# ------------------------------------------------------------------ exact

def exact_dedup(docs, batch_size: int = 4096, n_buckets: int = 64):
    """Survivors (min doc_id) per exact normalized-content fingerprint.

    Scale shape (r04 verdict #3): fingerprint cardinality ~= corpus size,
    so the keep-first reduce goes through the bucketed partial-agg
    exchange (per-batch groupby-min BEFORE the shuffle, then per-bucket
    merge) — BASELINE §2.5 measured the native sort-based string-key
    groupby 108x slower at this key shape; §2.9 has the microbench."""
    from ..functions.bucketing import bucketed_min
    from .text_analysis import fingerprint_batch

    fp = docs.map_batches(fingerprint_batch, batch_format="pandas",
                          batch_size=batch_size)
    return bucketed_min(fp, ["fingerprint"], "doc_id",
                        n_buckets=n_buckets).select_columns(["doc_id"])


def incremental_dedup(docs, mod: int = 3, batch_size: int = 4096,
                      n_buckets: int = 64):
    """Incremental exact dedup (the nightly-crawl pattern): docs with
    ``doc_id % mod == 0`` are the NEW shard, the rest the BASE snapshot
    already in the corpus. Survivors = min new doc_id per fingerprint
    among new docs whose fingerprint appears nowhere in the base —
    Dataset(doc_id).

    Scale shape: both shards reduce to 8-byte fingerprints before any
    exchange (text never shuffles), new-vs-base is ONE bucketed ANTI
    semi (both sides fact-scale, neither key set driver-bounded), and
    new-vs-new keep-first is the exact-dedup groupby-min."""
    from ..functions.bucketing import bucketed_min, bucketed_semi
    from .text_analysis import fingerprint_batch, resolve_parity

    fp = docs.map_batches(fingerprint_batch, batch_format="pandas",
                          batch_size=batch_size)
    # typed-empty dtype must track the fingerprint mode (int64 siphash
    # fast path vs md5-hex parity path)
    fp_dtype = object if resolve_parity(None) else "int64"

    def split(b: pd.DataFrame, new: bool) -> pd.DataFrame:
        m = (b["doc_id"].to_numpy(np.int64) % mod == 0) == new
        return b.loc[m]

    import functools

    new_fp = fp.map_batches(functools.partial(split, new=True),
                            batch_format="pandas")
    base_fp = fp.map_batches(functools.partial(split, new=False),
                             batch_format="pandas")
    fresh = bucketed_semi(
        new_fp, base_fp, left_on="fingerprint", right_on="fingerprint",
        left_cols=["doc_id", "fingerprint"], n_buckets=n_buckets,
        anti=True,
        empty_dtypes={"doc_id": "int64", "fingerprint": fp_dtype})
    return bucketed_min(fresh, ["fingerprint"], "doc_id",
                        n_buckets=n_buckets).select_columns(["doc_id"])


def conversation_dedup(transcripts, n_buckets: int = 64,
                       parity: bool | None = None):
    """Conversation-grain exact dedup over the transcript table: each
    conversation reduces to a fingerprint of its turn texts concatenated
    in stable turn order; survivors = min conv_id per fingerprint —
    Dataset(conv_id). The first pass a transcript-training pipeline runs
    before any turn-level work (whole-conversation repost removal).

    Scale shape: ONE bucketed exchange on conv_id (the same conv-keyed
    partitioning every transcript stage uses) concatenates each
    conversation inside its bucket — text leaves the exchange as one
    8-byte/32-hex fingerprint per conversation — then the keep-first
    groupby-min is conversation-bounded."""
    from ..functions.bucketing import bucketed_apply, bucketed_min
    from .text_analysis import resolve_parity

    par = resolve_parity(parity)

    def conv_fp(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "conv_id": pd.Series([], dtype=object),
                "fp": pd.Series([], dtype=object if par else "int64")})
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        joined = g.groupby("conv_id", sort=False)["text"].agg(
            "\n".join)
        if par:
            fp = [hashlib.md5(t.encode()).hexdigest() for t in joined]
        else:
            fp = pd.util.hash_array(
                joined.to_numpy(dtype=object)).view(np.int64)
        return pd.DataFrame({"conv_id": joined.index.to_numpy(object),
                             "fp": fp})

    fps = bucketed_apply(
        transcripts.select_columns(["conv_id", "turn_idx", "text"]),
        ["conv_id"], conv_fp, None, n_buckets)
    return bucketed_min(fps, ["fp"], "conv_id",
                        n_buckets=n_buckets).select_columns(["conv_id"])


WINNOW_K = 4       # tokens per k-gram
WINNOW_W = 4       # grams per winnow window
WINNOW_MIN_SHARED = 2
WINNOW_BUCKET_CAP = 200  # SPEC: mirrored by the dedup_winnow_pairs oracle
# (__ray_entry__ `sel` CTE, rk <= 200) — change both together


def _winnow_doc_fps(toks: list[str], parity: bool) -> list:
    """Winnowed fingerprint SET of one token list (Schleimer et al. 2003
    MOSS): k-gram hashes -> min per sliding w-window -> distinct. Docs
    shorter than k tokens hash the whole text as one gram; fewer than w
    grams collapse to a single whole-doc window."""
    if len(toks) < WINNOW_K:
        grams = [" ".join(toks)]
    else:
        grams = [" ".join(toks[i:i + WINNOW_K])
                 for i in range(len(toks) - WINNOW_K + 1)]
    if parity:
        gh: list = [hashlib.md5(g.encode()).hexdigest() for g in grams]
    else:
        gh = list(pd.util.hash_array(np.asarray(grams, dtype=object)))
    if len(gh) <= WINNOW_W:
        return [min(gh)]
    return sorted({min(gh[i:i + WINNOW_W])
                   for i in range(len(gh) - WINNOW_W + 1)})


def winnow_pairs(docs, min_shared: int = WINNOW_MIN_SHARED,
                 n_buckets: int = 64, cap: int = WINNOW_BUCKET_CAP,
                 parity: bool | None = None):
    """Near-duplicate pairs by shared winnowed fingerprints (the MOSS
    plagiarism-detection shape, Schleimer et al. 2003): docs sharing at
    least ``min_shared`` distinct winnow fingerprints —
    Dataset(id_a, id_b, n_shared).

    Scale shape: each doc reduces to its winnowed fingerprint set (text
    never shuffles); fingerprints bucket by value, per-fp doc lists pair
    inside the bucket (hot fps capped with a warning, the LSH-band
    contract), and n_shared is ONE bucketed integer sum over pairs.
    Parity mode selects mins over md5 hex (DuckDB-recomputable); the
    default selects over vectorized siphash — same algorithm, different
    (documented) fingerprint choice, like fingerprint_batch's modes."""
    from ..functions.bucketing import bucketed_group_pairs, bucketed_sum
    from .text_analysis import resolve_parity

    par = resolve_parity(parity)

    def fp_rows(b: pd.DataFrame) -> pd.DataFrame:
        ids, fps = [], []
        for did, text in zip(b["doc_id"], b["text"]):
            for fp in _winnow_doc_fps(text.lower().split(), par):
                ids.append(did)
                fps.append(fp)
        return pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "fp": pd.Series(fps,
                            dtype=object if par else "uint64")})

    def pair_fn(sub: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(sub["doc_id"].to_numpy(np.int64))
        if len(ids) > cap:
            import warnings

            warnings.warn(
                f"winnow fp bucket holds {len(ids)} docs > cap {cap};"
                f" truncated (recall loss — raise cap)", stacklevel=2)
            ids = ids[:cap]
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64")})
        i, j = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[i], "id_b": ids[j],
                             "w": np.ones(len(i), dtype=np.int64)})

    shared = bucketed_sum(
        bucketed_group_pairs(
            docs.select_columns(["doc_id", "text"]).map_batches(
                fp_rows, batch_format="pandas"),
            ["fp"], pair_fn, n_buckets),
        ["id_a", "id_b"], "w", n_buckets=n_buckets)

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        m = b["w"].to_numpy(np.int64) >= min_shared
        return pd.DataFrame({
            "id_a": b["id_a"].to_numpy(np.int64)[m],
            "id_b": b["id_b"].to_numpy(np.int64)[m],
            "n_shared": b["w"].to_numpy(np.int64)[m]})

    import ray.data as _rd

    seed = _rd.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "n_shared": pa.array([], pa.int64()),
    }))
    return shared.map_batches(finish,
                              batch_format="pandas").union(seed)


# ------------------------------------------------------------------ minhash

class MinHasher:
    """Per-actor state: (a, b) permutation tables built once."""

    def __init__(self, num_perm: int = 128, shingle_n: int = 3, seed: int = 7):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.shingle_n = shingle_n

    def signature(self, text: str) -> np.ndarray:
        h = shingle_hashes(text, self.shingle_n)
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        # (num_perm, n_shingles) universal hashing, min per row
        vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        # fully batch-vectorized: ONE siphash call over every shingle in the
        # batch, one (num_perm, total_grams) universal-hash matrix, per-doc
        # min via minimum.reduceat (min over the gram multiset == min over
        # the unique set, so no per-doc unique needed)
        grams: list[str] = []
        counts = np.empty(len(batch), dtype=np.int64)
        for i, text in enumerate(batch["text"]):
            toks = text.lower().split()
            if len(toks) < self.shingle_n:
                g = [" ".join(toks)] if toks else []
            else:
                g = [" ".join(toks[j : j + self.shingle_n])
                     for j in range(len(toks) - self.shingle_n + 1)]
            grams.extend(g)
            counts[i] = len(g)
        sig_mat = np.zeros((len(batch), self.num_perm), dtype=np.uint64)
        if grams:
            h = pd.util.hash_array(np.asarray(grams, dtype=object))
            with np.errstate(over="ignore"):
                vals = (self.a[:, None] * h[None, :] + self.b[:, None]) % _MERSENNE
            ne = np.flatnonzero(counts > 0)
            offsets = np.concatenate(([0], np.cumsum(counts[ne])[:-1]))
            mins = np.minimum.reduceat(vals, offsets, axis=1)  # (perm, ne)
            sig_mat[ne] = mins.T.astype(np.uint64)
        sigs = [sig_mat[i].tobytes() for i in range(len(batch))]
        return pa.table(
            {
                "doc_id": pa.array(batch["doc_id"], pa.int64()),
                "sig": pa.array(sigs, pa.binary()),
            }
        )


def minhash_signatures(docs, num_perm: int = 128, shingle_n: int = 3,
                       batch_size: int = 1024, concurrency=(1, 4)):
    return docs.map_batches(
        MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "shingle_n": shingle_n},
        batch_format="pandas", batch_size=batch_size, concurrency=concurrency,
    )


_FNV_PRIME = np.uint64(1099511628211)


def _band_rows(batch: pa.Table, bands: int, rows: int) -> pa.Table:
    """Vectorized band expansion: all signatures view as one (n, bands, rows)
    uint64 array; the band bucket id is a polynomial (FNV-style) hash folded
    over the rows axis — ``rows`` iterations of whole-array ops, no per-doc
    Python loop. Bucket ids only GROUP candidates (verification filters any
    hash collision), so the hash needs stability, not cryptography."""
    sig_col = batch["sig"].to_pylist()
    n = len(sig_col)
    if n == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "band_id": pa.array([], pa.int32()),
             "band_hash": pa.array([], pa.int64())}
        )
    sigs = np.frombuffer(b"".join(sig_col), dtype=np.uint64).reshape(
        n, bands, rows
    )
    h = np.zeros((n, bands), dtype=np.uint64)
    for r in range(rows):  # rows is small (e.g. 4): vectorized over n*bands
        h = h * _FNV_PRIME + sigs[:, :, r]
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(np.repeat(ids, bands), pa.int64()),
            "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n)),
            "band_hash": pa.array(h.reshape(-1).view(np.int64)),
        }
    )


# Mirrored in the oracle's ranked band-bucket CTE (entry_sql.
# _minhash_pair_ctes `rk <= 200`) — change both together (the
# WINNOW_BUCKET_CAP pattern).
LSH_BUCKET_CAP = 200


def _bucket_pairs(g: pd.DataFrame, cap: int = LSH_BUCKET_CAP) -> pd.DataFrame:
    uniq = np.sort(g["doc_id"].unique())
    if len(uniq) > cap:  # no silent caps: a truncated bucket is a recall loss
        import warnings

        warnings.warn(
            f"LSH bucket holds {len(uniq)} docs > cap {cap}; candidate "
            f"pairs truncated to the {cap} smallest doc_ids (recall loss "
            f"on this bucket — raise cap or add bands)",
            stacklevel=2)
    ids = uniq[:cap]
    if len(ids) < 2:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    ii, jj = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"id_a": ids[ii], "id_b": ids[jj]})


def _checkpointed(ds, checkpoint_dir: str | None, inputs: list[str]):
    """Signature-table source factory: the table is consumed by SEVERAL
    downstream stages (banding + two verify attaches), so it must not be
    recomputed per consumer. ``checkpoint_dir=None`` pins it in the object
    store (``materialize()`` — fine while signatures fit the cluster's
    store); a directory routes it through ``lineage.commit_stage`` so the
    peak object-store footprint is the WORKING SET, not the corpus: each
    consumer streams the parquet back independently, and a resumed run
    skips the signature computation entirely (manifest hit)."""
    if checkpoint_dir is None:
        m = ds.materialize()
        return lambda: m
    from ..state import lineage

    lineage.commit_stage(ds, checkpoint_dir, inputs=inputs,
                         min_rows_per_file=100_000)
    return lambda: lineage.read_stage(checkpoint_dir)


def minhash_lsh_pairs(docs, threshold: float = 0.8, num_perm: int = 128,
                      bands: int = 32, checkpoint_dir: str | None = None):
    """Near-duplicate candidate pairs with signature-estimated Jaccard >=
    threshold. bands*rows == num_perm. ``checkpoint_dir`` spills the
    signature table to parquet instead of pinning it in the object store
    (see :func:`_checkpointed`)."""
    rows = num_perm // bands
    sigs = _checkpointed(minhash_signatures(docs, num_perm),
                         checkpoint_dir, inputs=["documents"])
    band_ds = sigs().map_batches(
        lambda t: _band_rows(t, bands, rows), batch_format="pyarrow"
    )
    from ..functions.bucketing import (
        bucketed_attach,
        bucketed_distinct,
        bucketed_group_pairs,
    )

    cand = bucketed_distinct(
        bucketed_group_pairs(band_ds, ["band_id", "band_hash"], _bucket_pairs),
        ["id_a", "id_b"],
    )
    # verify: estimated Jaccard = fraction of equal signature coordinates.
    # signature attach via the bucketed merge join (acero Dataset.join
    # raises on the empty hash partitions sparse candidate sets produce)
    joined = bucketed_attach(
        cand, sigs(), "id_a", "doc_id", ["id_a", "id_b"], {"sig": "sig_a"},
        empty_dtypes={"id_a": "int64", "id_b": "int64", "sig_a": object},
    )
    joined = bucketed_attach(
        joined, sigs(), "id_b", "doc_id", ["id_a", "id_b", "sig_a"],
        {"sig": "sig_b"}, left_fill={"sig_a": b""},
        empty_dtypes={"id_a": "int64", "id_b": "int64", "sig_a": object,
                      "sig_b": object},
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "est_jaccard": pd.Series([], dtype="float64")})
        a = np.stack([np.frombuffer(x, dtype=np.uint64)
                      for x in batch["sig_a"]])
        b = np.stack([np.frombuffer(x, dtype=np.uint64)
                      for x in batch["sig_b"]])
        est = (a == b).mean(axis=1)
        out = pd.DataFrame(
            {"id_a": batch["id_a"], "id_b": batch["id_b"], "est_jaccard": est}
        )
        return out[out["est_jaccard"] >= threshold]

    return joined.map_batches(verify, batch_format="pandas")


def _bucket_pairs_touching_new(g: pd.DataFrame, mod: int,
                               cap: int = LSH_BUCKET_CAP) -> pd.DataFrame:
    """Bucket pairs restricted to those TOUCHING the new shard
    (doc_id % mod == 0) — base-vs-base pairs are never generated, so
    per-bucket cost is |new| x |bucket|, not |bucket|^2."""
    uniq = np.sort(g["doc_id"].unique())
    if len(uniq) > cap:
        import warnings

        warnings.warn(
            f"LSH bucket holds {len(uniq)} docs > cap {cap}; candidate "
            f"pairs truncated to the {cap} smallest doc_ids",
            stacklevel=2)
    ids = uniq[:cap]
    if len(ids) < 2:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    ii, jj = np.triu_indices(len(ids), k=1)
    ia, ib = ids[ii], ids[jj]
    m = (ia % mod == 0) | (ib % mod == 0)
    return pd.DataFrame({"id_a": ia[m], "id_b": ib[m]})


def incremental_lsh_pairs(docs, mod: int = 3, threshold: float = 0.5,
                          num_perm: int = 128, bands: int = 32,
                          checkpoint_dir: str | None = None):
    """Incremental NEAR-dup discovery — :func:`incremental_dedup`'s
    sketch-grain sibling (the nightly-crawl LSH pattern): docs with
    ``doc_id % mod == 0`` are the NEW shard; candidate pairs are
    restricted to those touching it (new-vs-base and new-vs-new), since
    base-vs-base near-dups are already known to the snapshot. Output:
    (id_a, id_b, est_jaccard) with signature-estimated Jaccard >=
    ``threshold`` and at least one new side.

    Scale shape identical to :func:`minhash_lsh_pairs` — signatures
    lineage-checkpointed via ``checkpoint_dir`` (resumable; in
    production the BASE signatures are the prior run's checkpoint, so
    only the new shard hashes text), banded candidate buckets with the
    same cap-and-warn contract, bucketed-attach verification."""
    rows = num_perm // bands
    sigs = _checkpointed(minhash_signatures(docs, num_perm),
                         checkpoint_dir, inputs=["documents"])
    band_ds = sigs().map_batches(
        lambda t: _band_rows(t, bands, rows), batch_format="pyarrow"
    )
    from ..functions.bucketing import (
        bucketed_attach,
        bucketed_distinct,
        bucketed_group_pairs,
    )

    cand = bucketed_distinct(
        bucketed_group_pairs(
            band_ds, ["band_id", "band_hash"],
            lambda g: _bucket_pairs_touching_new(g, mod)),
        ["id_a", "id_b"],
    )
    joined = bucketed_attach(
        cand, sigs(), "id_a", "doc_id", ["id_a", "id_b"], {"sig": "sig_a"},
        empty_dtypes={"id_a": "int64", "id_b": "int64", "sig_a": object},
    )
    joined = bucketed_attach(
        joined, sigs(), "id_b", "doc_id", ["id_a", "id_b", "sig_a"],
        {"sig": "sig_b"}, left_fill={"sig_a": b""},
        empty_dtypes={"id_a": "int64", "id_b": "int64", "sig_a": object,
                      "sig_b": object},
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "est_jaccard": pd.Series([],
                                                          dtype="float64")})
        a = np.stack([np.frombuffer(x, dtype=np.uint64)
                      for x in batch["sig_a"]])
        b = np.stack([np.frombuffer(x, dtype=np.uint64)
                      for x in batch["sig_b"]])
        est = (a == b).mean(axis=1)
        out = pd.DataFrame(
            {"id_a": batch["id_a"], "id_b": batch["id_b"],
             "est_jaccard": est}
        )
        return out[out["est_jaccard"] >= threshold]

    import ray.data as _rd

    seed = _rd.from_arrow(pa.table({
        "id_a": pa.array([], pa.int64()),
        "id_b": pa.array([], pa.int64()),
        "est_jaccard": pa.array([], pa.float64()),
    }))
    return joined.map_batches(verify, batch_format="pandas").union(seed)


# ---------------------------------------------------------------- ngram exact

def ngram_jaccard_pairs(docs, threshold: float = 0.5, shingle_n: int = 3,
                        bands: int = 16, num_perm: int = 64, cap: int = 200,
                        checkpoint_dir: str | None = None):
    """EXACT n-gram Jaccard over LSH-blocked candidates: blocking via minhash
    bands (scale path), verification over true shingle sets.
    ``checkpoint_dir`` spills the signature AND shingle-set tables to
    parquet instead of pinning them (see :func:`_checkpointed`)."""
    rows = num_perm // bands
    sigs = _checkpointed(
        minhash_signatures(docs, num_perm),
        None if checkpoint_dir is None else f"{checkpoint_dir}/sigs",
        inputs=["documents"])
    band_ds = sigs().map_batches(
        lambda t: _band_rows(t, bands, rows), batch_format="pyarrow"
    )
    from ..functions.bucketing import bucketed_distinct, bucketed_group_pairs

    cand = bucketed_distinct(
        bucketed_group_pairs(band_ds, ["band_id", "band_hash"],
                             lambda g: _bucket_pairs(g, cap)),
        ["id_a", "id_b"],
    )
    shingles = _checkpointed(
        docs.map_batches(
            lambda b: pa.table(
                {
                    "doc_id": pa.array(b["doc_id"], pa.int64()),
                    "sh": pa.array(
                        [shingle_hashes(t, shingle_n).tobytes()
                         for t in b["text"]],
                        pa.binary(),
                    ),
                }
            ),
            batch_format="pandas",
        ),
        None if checkpoint_dir is None else f"{checkpoint_dir}/shingles",
        inputs=["documents"])
    from ..functions.bucketing import bucketed_attach

    joined = bucketed_attach(
        cand, shingles(), "id_a", "doc_id", ["id_a", "id_b"], {"sh": "sh_a"},
        empty_dtypes={"id_a": "int64", "id_b": "int64", "sh_a": object},
    )
    joined = bucketed_attach(
        joined, shingles(), "id_b", "doc_id", ["id_a", "id_b", "sh_a"],
        {"sh": "sh_b"}, left_fill={"sh_a": b""},
        empty_dtypes={"id_a": "int64", "id_b": "int64", "sh_a": object,
                      "sh_b": object},
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for ia, ib, sa, sb in zip(batch["id_a"], batch["id_b"],
                                  batch["sh_a"], batch["sh_b"]):
            A = set(np.frombuffer(sa, dtype=np.uint64).tolist())
            B = set(np.frombuffer(sb, dtype=np.uint64).tolist())
            if not A and not B:
                continue
            j = len(A & B) / len(A | B)
            if j >= threshold:
                out_a.append(ia)
                out_b.append(ib)
                out_j.append(j)
        return pd.DataFrame(
            {"id_a": pd.Series(out_a, dtype="int64"),
             "id_b": pd.Series(out_b, dtype="int64"),
             "jaccard": pd.Series(out_j, dtype="float64")}
        )

    return joined.map_batches(verify, batch_format="pandas")


# ------------------------------------------------------------------ simhash

def simhash_values(texts, shingle_n: int = 3) -> np.ndarray:
    """Vectorized 64-bit simhash over word n-gram shingle features.

    Word n-grams (not unigrams) are the features: unigram bags collapse on
    template-heavy corpora where unrelated docs share most of the vocabulary.
    Feature hashes come from ``pd.util.hash_array`` (fixed-key siphash —
    process-stable); the whole batch is hashed in ONE call and bit votes are
    reduced per-doc with ``np.add.reduceat`` — no per-token Python loop.
    Vote scores accumulate in int64 (uint64 arithmetic would wrap negative
    votes into huge positives and set nearly every bit)."""
    grams: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = text.lower().split()
        if len(toks) < shingle_n:
            g = [" ".join(toks)] if toks else []
        else:
            g = [" ".join(toks[j : j + shingle_n])
                 for j in range(len(toks) - shingle_n + 1)]
        grams.extend(g)
        counts[i] = len(g)
    out = np.zeros(len(texts), dtype=np.uint64)
    if not grams:
        return out
    hs = pd.util.hash_array(np.asarray(grams, dtype=object))
    bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(
        np.int64
    )
    # segment offsets over nonempty docs only (empty docs keep simhash 0 and
    # would corrupt reduceat boundaries otherwise)
    ne = np.flatnonzero(counts > 0)
    ne_counts = counts[ne]
    offsets = np.concatenate(([0], np.cumsum(ne_counts)[:-1]))
    sums = np.add.reduceat(bits, offsets, axis=0)
    score = 2 * sums - ne_counts[:, None]  # +1/-1 votes per bit
    sig = ((score > 0).astype(np.uint64)
           << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
    out[ne] = sig
    return out


class SimHasher:
    """Batch simhash stage (see :func:`simhash_values`)."""

    def __init__(self, shingle_n: int = 3):
        self.shingle_n = shingle_n

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        vals = simhash_values(list(batch["text"]), self.shingle_n)
        return pd.DataFrame({"doc_id": batch["doc_id"],
                             "simhash": pd.Series(vals, dtype="uint64")})


def simhash_pairs(docs, max_hamming: int = 3, batch_size: int = 2048,
                  concurrency=(1, 4), max_bucket: int = 1024):
    """Near-dup pairs with hamming(simhash) <= max_hamming; pigeonhole
    blocking on 16-bit chunks (any pair within distance <= 3 is guaranteed to
    share one of the 4 chunks). Hot buckets are capped at ``max_bucket``
    lowest doc_ids (skew guard — a bucket holding half the corpus would be
    O(n^2); documented completeness trade-off, same spirit as the
    reference's path-scoped pair restriction `builder/builder.py:372-407`)."""
    # single consumer: stream straight into chunk expansion, no pin
    sh = docs.map_batches(SimHasher, batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)

    def chunks(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for did, h in zip(batch["doc_id"], batch["simhash"]):
            for k in range(4):
                rows.append((did, int(h), k, (int(h) >> (16 * k)) & 0xFFFF))
        return pd.DataFrame(rows, columns=["doc_id", "simhash", "chunk_idx", "chunk_val"])

    def bucket_verify(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) > max_bucket:  # no silent caps (recall loss on hot chunks)
            import warnings

            warnings.warn(
                f"simhash chunk bucket holds {len(g)} docs > max_bucket "
                f"{max_bucket}; truncated (recall loss on this bucket)",
                stacklevel=2)
            g = g.head(max_bucket)
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.uint64)
        if len(ids) < 2:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64"),
                                 "hamming": pd.Series([], dtype="int64")})
        ii, jj = np.triu_indices(len(ids), k=1)
        x = hs[ii] ^ hs[jj]
        ham = np.zeros(len(x), dtype=np.int64)
        for _ in range(64):
            ham += (x & 1).astype(np.int64)
            x >>= np.uint64(1)
            if not x.any():
                break
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ii][keep], "id_b": ids[jj][keep],
                             "hamming": ham[keep]})

    from ..functions.bucketing import bucketed_group_pairs, bucketed_min

    pairs = bucketed_group_pairs(
        sh.map_batches(chunks, batch_format="pandas"),
        ["chunk_idx", "chunk_val"], bucket_verify,
    )
    # dup pairs across chunks carry the same hamming -> min is a dedup
    return bucketed_min(pairs, ["id_a", "id_b"], "hamming")


# ------------------------------------------------------------- embeddings

# Hot-cluster guard for embedding_cosine_pairs: a degenerate label block
# is truncated to the EMB_BLOCK_CAP smallest vec_ids (deterministic,
# loudly warned). MIRRORED in the dedup_embedding_cosine oracle
# (`rk <= 20000` per label) — change both together (the WINNOW_BUCKET_CAP
# pattern, CLAUDE.md).
EMB_BLOCK_CAP = 20_000


def embedding_cosine_pairs(embeddings, threshold: float = 0.95,
                           n_buckets: int = 64, tile: int = 4096,
                           block_cap: int = EMB_BLOCK_CAP):
    """Near-dup pairs with cosine >= threshold, blocked by the ``label``
    column (cluster id) — never all-pairs across the full table.

    Scale shape (r04 verdict #4): the label exchange goes through the
    bucketed pattern (one hash-bucket shuffle, complete label groups per
    bucket), the within-block matmul is TILED (``tile`` rows x block — a
    degenerate block peaks at tile*n floats, not n^2), and a block larger
    than ``block_cap`` is truncated to its ``block_cap`` smallest vec_ids
    with a loud warning (cap mirrored in the oracle, WINNOW pattern)."""

    def _label_pairs(g: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
        g = g.sort_values("vec_id")
        if len(g) > block_cap:
            import warnings

            warnings.warn(
                f"embedding_cosine_pairs: label block of {len(g)} rows "
                f"truncated to its {block_cap} smallest vec_ids "
                "(EMB_BLOCK_CAP — mirrored in the oracle)", stacklevel=2)
            g = g.iloc[:block_cap]
        ids = g["vec_id"].to_numpy()
        M = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        M = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True),
                        1e-12, None)
        n = len(ids)
        aa, bb = [], []
        for s in range(0, n, tile):
            e = min(s + tile, n)
            S = M[s:e] @ M.T
            r, c = np.nonzero(S >= threshold)
            gi = r + s
            keep = c > gi  # global upper triangle: j > i
            if keep.any():
                aa.append(ids[gi[keep]])
                bb.append(ids[c[keep]])
        if not aa:
            z = np.array([], dtype=np.int64)
            return z, z
        return np.concatenate(aa), np.concatenate(bb)

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                              "id_b": pd.Series([], dtype="int64")})
        if len(b) < 2:
            return empty
        outs = [empty]
        for _, g in b.groupby("label", sort=False):
            if len(g) < 2:
                continue
            a, bcol = _label_pairs(g)
            if len(a):
                outs.append(pd.DataFrame({"id_a": a.astype("int64"),
                                          "id_b": bcol.astype("int64")}))
        return pd.concat(outs, ignore_index=True)

    from ..functions.bucketing import bucketed_apply

    return bucketed_apply(embeddings, ["label"], merge,
                          n_buckets=n_buckets)


# ----------------------------------------------------------------- clusters

def near_dup_clusters(docs, threshold: float = 0.8, num_perm: int = 128,
                      bands: int = 32, checkpoint_dir: str | None = None):
    """Full near-dup WORKFLOW composition: minhash-LSH candidate pairs ->
    distributed connected components -> (doc_id, cluster) where cluster =
    min doc_id of the duplicate group (singletons map to themselves).

    doc ids are zero-padded in the component labels so lexicographic min ==
    numeric min."""
    import pyarrow.compute as pc

    from .components import connected_components

    pairs = minhash_lsh_pairs(docs, threshold, num_perm, bands,
                              checkpoint_dir=checkpoint_dir)

    def pad(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "a": pc.utf8_lpad(pc.cast(t["id_a"], pa.string()), 12, "0"),
                "b": pc.utf8_lpad(pc.cast(t["id_b"], pa.string()), 12, "0"),
            }
        )

    from ..functions.bucketing import bucketed_apply
    from ..functions.ray_utils import default_parallelism

    comp = connected_components(pairs.map_batches(pad, batch_format="pyarrow"),
                                num_partitions=default_parallelism())

    # cluster membership is O(duplicated docs) — NOT driver-sized at scale.
    # Attach labels with a bucketed LEFT merge (docs + labels co-bucket on
    # the doc key, one pandas merge per bucket); acero joins are avoided
    # (they fail on empty hash partitions when there are no duplicates).
    def doc_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {"k": pc.cast(t["doc_id"], pa.int64()),
             "comp": pa.nulls(len(t), pa.int64())}
        )

    def label_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {"k": pc.cast(t["id"], pa.int64()),
             "comp": pc.cast(t["component"], pa.int64())}
        )

    u = docs.select_columns(["doc_id"]).map_batches(
        doc_side, batch_format="pyarrow"
    ).union(comp.map_batches(label_side, batch_format="pyarrow"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        left = g.loc[g["comp"].isna(), ["k"]]
        lab = g.loc[g["comp"].notna(), ["k", "comp"]]
        m = left.merge(lab, on="k", how="left")
        return pd.DataFrame(
            {"doc_id": m["k"].astype("int64"),
             "cluster": m["comp"].fillna(m["k"]).astype("int64")}
        )

    return bucketed_apply(u, ["k"], merge)


def near_dup_keep_list(docs, threshold: float = 0.8, num_perm: int = 128,
                       bands: int = 32, checkpoint_dir: str | None = None):
    """The MATERIALIZED dedup decision — (doc_id, cluster, kept) where
    ``kept`` iff the doc is its cluster's canonical representative (min
    doc_id; singletons keep themselves). This is the 'drop the duplicates'
    step the near-dup workflow exists for: filtering the corpus to
    ``kept == true`` yields the deduplicated training set, and the
    (doc_id -> cluster) rows double as the lineage record of what was
    dropped and why."""
    import pyarrow.compute as pc

    comp = near_dup_clusters(docs, threshold, num_perm, bands,
                             checkpoint_dir=checkpoint_dir)

    def decide(t: pa.Table) -> pa.Table:
        return t.append_column("kept", pc.equal(t["doc_id"], t["cluster"]))

    return comp.map_batches(decide, batch_format="pyarrow")


# ------------------------------------------------------- decontamination

EVAL_GRAM_CAP = 50_000_000  # broadcast bound: ~400 MB of uint64 hashes


class Decontaminator:
    """Flags training docs sharing >=1 ``window``-token span with the
    broadcast eval-gram set. Module-level (state via
    ``fn_constructor_kwargs``) per the by-reference serialization
    invariant — see quantiles._HistPartial."""

    def __init__(self, ev_ref, eval_mod, window):
        import ray

        self.ev = ray.get(ev_ref)  # sorted uint64 eval-gram hashes
        self.eval_mod = eval_mod
        self.window = window

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        from .text_analysis import window_hashes_numeric

        if self.eval_mod is not None:
            b = b[b["doc_id"] % self.eval_mod != 0]
        empty = pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "n_eval_grams": pd.Series([], dtype="int64")})
        if len(b) == 0:
            return empty
        hs, counts = window_hashes_numeric(b["text"], self.window)
        if len(hs) == 0:
            return empty
        # distinct shared spans per doc: membership via binary search
        # into the sorted eval set, then per-(doc, gram) dedup
        idx = np.searchsorted(self.ev, hs)
        idx[idx == len(self.ev)] = 0
        member = self.ev[idx] == hs
        df = pd.DataFrame({
            "i": np.repeat(np.arange(len(b), dtype=np.int64), counts),
            "h": hs.view(np.int64),
        })[member]
        if len(df) == 0:
            return empty
        hits = (df.drop_duplicates().groupby("i", sort=True).size()
                .rename("n_eval_grams").reset_index())
        ids = b["doc_id"].to_numpy()
        return pd.DataFrame({
            "doc_id": ids[hits["i"].to_numpy()].astype("int64"),
            "n_eval_grams": hits["n_eval_grams"].astype("int64"),
        })


def contamination_check(docs, eval_docs=None, eval_mod: int = 50,
                        window: int = 8, batch_size: int = 1024,
                        concurrency=(1, 4),
                        eval_gram_cap: int = EVAL_GRAM_CAP):
    """Benchmark decontamination — the n-gram-overlap screen an LLM
    training pipeline runs before training (GPT-3 appendix C shape): flag
    every training doc sharing at least one ``window``-token span with an
    eval/benchmark set. Output: (doc_id, n_eval_grams) per contaminated
    training doc, counting DISTINCT shared spans.

    Scale shape: an eval set is SMALL BY CONTRACT (a benchmark, not a
    corpus) — pass it as ``eval_docs`` (a Dataset with (doc_id, text));
    its gram-hash set is computed distributed, collected once
    (eval-bounded, ``eval_gram_cap``-gated so a corpus-sized table fed by
    mistake fails LOUDLY instead of flooding the driver), and broadcast
    via ``ray.put``; the training stream then maps over it embarrassingly
    parallel — ZERO shuffles at any corpus size. When ``eval_docs`` is
    None, the deterministic ``doc_id % eval_mod == 0`` slice of ``docs``
    stands in for the benchmark file (test/oracle mode; its bound is
    corpus/eval_mod, so production callers should pass a real table).
    Output exposes only COUNTS (never hash values), so gram hashing is
    the vectorized batch siphash (``pd.util.hash_array`` — one C call per
    batch) unconditionally: the oracle's distinct-shared-window counts
    are hash-function-independent."""
    import ray

    from .text_analysis import window_hashes_numeric

    if eval_docs is None:
        ev_src = docs.map_batches(
            lambda b: b[b["doc_id"] % eval_mod == 0],
            batch_format="pandas", batch_size=batch_size)
        mod = eval_mod
    else:
        ev_src = eval_docs
        mod = None  # external benchmark: every row of `docs` is training

    def eval_grams(b: pd.DataFrame) -> pd.DataFrame:
        hs, _ = window_hashes_numeric(b["text"], window)
        return pd.DataFrame({"gram": np.unique(hs).view(np.int64)})

    # gate on a DISTRIBUTED count BEFORE any driver collect (ADVICE r04
    # #1: the old order take_all-then-len flooded the driver with the
    # oversized set before the loud failure); materialize keeps the gram
    # pass single-execution (count is then metadata-free)
    ev_gr = ev_src.map_batches(eval_grams, batch_format="pandas",
                               batch_size=batch_size).materialize()
    n_ev = ev_gr.count()
    if n_ev > eval_gram_cap:
        raise ValueError(
            f"eval gram set holds {n_ev} > cap {eval_gram_cap}: "
            "the eval side must be benchmark-sized (pass a bounded "
            "eval_docs table, or raise eval_gram_cap deliberately)")
    ev_rows = ev_gr.take_all()
    # view as uint64 BEFORE unique: sortedness must hold in the dtype
    # searchsorted compares in (int64 order != uint64 order on the top bit)
    ev = np.unique(np.fromiter((r["gram"] for r in ev_rows),
                               dtype=np.int64, count=len(ev_rows))
                   .view(np.uint64))
    ev_ref = ray.put(ev)

    import ray.data as _rd

    # typed empty seed: a clean corpus yields ZERO flagged docs, and an
    # all-empty pandas-block result loses its schema (repo zero-row rule)
    seed = _rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_eval_grams": pa.array([], pa.int64()),
    }))
    return docs.map_batches(
        Decontaminator, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"ev_ref": ev_ref, "eval_mod": mod,
                               "window": window}).union(seed)


# ------------------------------------------------------------- edit distance

def _within_edit1(a: str, b: str) -> bool:
    """levenshtein(a, b) <= 1, exact (one substitution OR one indel)."""
    if a == b:
        return True
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        seen = False
        for x, y in zip(a, b):
            if x != y:
                if seen:
                    return False
                seen = True
        return True
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = 0
    skipped = False
    while i < la:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif skipped:
            return False
        else:
            skipped = True
            j += 1
    return True


def edit_distance_pairs(ds, id_col: str = "doc_id", text_col: str = "text",
                        cap: int = 1000, n_buckets: int = 64):
    """(id_a, id_b) with levenshtein(text) <= 1 — SymSpell-style blocking:
    two strings within one edit ALWAYS share a member of
    {s} ∪ {s minus one char}, so candidates are exactly the pairs meeting
    in a deletion-variant bucket (complete, never all-pairs). Texts ride
    the variant rows so verification is local to the pair-generation
    bucket; a second exchange dedups pairs that met in several variants.
    ``cap`` bounds any one variant bucket (hot variant = mass-duplicated
    short string); capped groups are logged, mirroring _bucket_pairs."""
    import logging

    from ..functions.bucketing import bucketed_apply, bucketed_distinct

    log = logging.getLogger(__name__)

    def variants(b: pd.DataFrame) -> pd.DataFrame:
        ids, texts, keys = [], [], []
        for i, t in zip(b[id_col], b[text_col]):
            t = str(t)
            ids.append(i)
            texts.append(t)
            keys.append(t)
            for d in range(len(t)):
                ids.append(i)
                texts.append(t)
                keys.append(t[:d] + t[d + 1:])
        return pd.DataFrame({"vkey": keys, "vid": ids, "vtext": texts})

    def pairs_in_bucket(g: pd.DataFrame) -> pd.DataFrame:
        outs_a, outs_b = [], []
        for _, sub in g.groupby("vkey", sort=False):
            sub = sub.drop_duplicates("vid").sort_values("vid")
            if len(sub) > cap:
                log.warning("edit_distance_pairs: variant bucket %r capped "
                            "%d -> %d", sub["vkey"].iloc[0], len(sub), cap)
                sub = sub.head(cap)
            if len(sub) < 2:
                continue
            ids = sub["vid"].to_numpy()
            txt = sub["vtext"].to_numpy()
            ii, jj = np.triu_indices(len(ids), k=1)
            ok = np.fromiter(
                (_within_edit1(txt[x], txt[y]) for x, y in zip(ii, jj)),
                dtype=bool, count=len(ii))
            outs_a.append(ids[ii][ok])
            outs_b.append(ids[jj][ok])
        if not outs_a:
            return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                                 "id_b": pd.Series([], dtype="int64")})
        return pd.DataFrame({"id_a": np.concatenate(outs_a),
                             "id_b": np.concatenate(outs_b)})

    cand = bucketed_apply(
        ds.map_batches(variants, batch_format="pandas"),
        ["vkey"], pairs_in_bucket, None, n_buckets)
    return bucketed_distinct(cand, ["id_a", "id_b"], n_buckets)


# ----------------------------------------------- duplicate n-gram spans

def duplicate_ngrams(docs, window: int = 8, min_docs: int = 2,
                     n_buckets: int = 64, parity: bool | None = None):
    """Cross-document repeated token windows -> Dataset(gram, n_docs,
    n_occurrences): every ``window``-token span whose hash appears in at
    least ``min_docs`` distinct documents (the exact-substring duplication
    signal of Lee et al. 2021, "Deduplicating Training Data Makes Language
    Models Better" — the suffix-array pass re-expressed as a fixed-width
    window count, the streaming-friendly variant).

    Scale shape: per-batch windowing emits PER-DOC partial counts (a doc's
    text lives in one row, so each (gram, doc) partial is complete at the
    scan), then ONE bucketed salted exchange on the gram hash folds
    distinct-doc and occurrence counts; the >= min_docs filter drops the
    unique-gram long tail inside the merge, so only duplicated spans leave
    the exchange. Gram hashing defaults to the vectorized batch siphash
    (one ``pd.util.hash_array`` call per batch, int64 gram column);
    ``parity`` switches to md5 hex so DuckDB's ``md5()`` verifies the gram
    VALUES byte-for-byte (see ``text_analysis.resolve_parity``)."""
    from ..functions.bucketing import bucketed_apply
    from .text_analysis import resolve_parity, window_hashes_numeric

    use_md5 = resolve_parity(parity)

    def windows(batch: pd.DataFrame) -> pd.DataFrame:
        if use_md5:
            import hashlib
            from collections import Counter

            grams: list[str] = []
            dids: list[int] = []
            occs: list[int] = []
            for did, text in zip(batch["doc_id"], batch["text"]):
                toks = text.lower().split()
                if len(toks) < window:
                    continue
                c = Counter(
                    hashlib.md5(
                        " ".join(toks[i:i + window]).encode()).hexdigest()
                    for i in range(len(toks) - window + 1))
                grams.extend(c.keys())
                dids.extend([did] * len(c))
                occs.extend(c.values())
            return pd.DataFrame({
                "gram": pd.Series(grams, dtype=object),
                "doc_id": pd.Series(dids, dtype="int64"),
                "n": pd.Series(occs, dtype="int64"),
            })
        hs_u, counts = window_hashes_numeric(batch["text"], window)
        if len(hs_u) == 0:
            return pd.DataFrame({
                "gram": pd.Series([], dtype="int64"),
                "doc_id": pd.Series([], dtype="int64"),
                "n": pd.Series([], dtype="int64")})
        df = pd.DataFrame({
            "gram": hs_u.view(np.int64),
            "doc_id": np.repeat(batch["doc_id"].to_numpy(), counts),
        })
        return (df.groupby(["gram", "doc_id"], sort=False).size()
                .rename("n").reset_index())

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        a = (g.groupby("gram", sort=False)
             .agg(n_docs=("doc_id", "nunique"), n_occurrences=("n", "sum"))
             .reset_index())
        a = a[a["n_docs"] >= min_docs]
        return a.astype({"n_docs": "int64", "n_occurrences": "int64"})

    return bucketed_apply(docs.map_batches(windows, batch_format="pandas"),
                          ["gram"], merge, None, n_buckets)


# ------------------------------------------- chunk-grain cross-doc dedup

CHUNK_DEDUP_TOKENS = 16


def _chunk_rows(batch: pd.DataFrame, w: int) -> pd.DataFrame:
    """Flat-map docs -> (doc_id, chunk_idx, chunk): fixed ``w``-token
    windows of the whitespace token stream (same segmentation as
    text_analysis.chunk_spans_batch, here carrying the chunk TEXT). The
    repeat+offset arithmetic is vectorized; the join-back-to-string is the
    unavoidable per-chunk string op of a flat-map whose output IS text."""
    toks = [t.split() for t in batch["text"].astype(str)]
    k = np.fromiter(((len(t) + w - 1) // w for t in toks), np.int64,
                    len(toks))
    total = int(k.sum())
    if total == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "chunk_idx": pd.Series([], dtype="int64"),
                             "chunk": pd.Series([], dtype=object)})
    doc_ids = np.repeat(batch["doc_id"].to_numpy(np.int64), k)
    starts = np.repeat(np.concatenate([[0], np.cumsum(k)[:-1]]), k)
    idx = np.arange(total, dtype=np.int64) - starts
    texts: list[str] = []
    for t, kk in zip(toks, k):
        texts.extend(" ".join(t[i * w:(i + 1) * w]) for i in range(kk))
    return pd.DataFrame({"doc_id": doc_ids, "chunk_idx": idx,
                         "chunk": np.asarray(texts, dtype=object)})


def chunk_dedup(docs, chunk_tokens: int = CHUNK_DEDUP_TOKENS,
                n_buckets: int = 64, batch_size: int = 4096):
    """Chunk-grain exact dedup ACROSS documents (the RefinedWeb/C4 "remove
    repeated spans, keep the document" shape — Penedo et al. 2023 line-wise
    dedup adapted to fixed token windows, since the synthetic docs carry no
    newlines): every occurrence of a chunk whose text appears in MORE THAN
    ONE distinct document is dropped, and each document is reassembled from
    its kept chunks in order.

    Dataset(doc_id, clean_text, n_kept, n_dropped), one row per document
    with >= 1 token. Exactly TWO bucketed exchanges, both fact-scale-safe:

    1. key = chunk text: per-group distinct-doc count sets a kept flag on
       every occurrence (no driver-side dup set, no broadcast — the dup
       universe is corpus-scale at 100 TB);
    2. key = doc_id: ordered rejoin of kept chunks + kept/dropped counts.

    Within-document repeats survive (distinct-doc count is 1), matching
    the cross-document semantics of the reference pipelines."""
    chunks = docs.map_batches(
        lambda b: _chunk_rows(b, chunk_tokens),
        batch_format="pandas", batch_size=batch_size)

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "chunk" not in g.columns:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "chunk_idx": pd.Series([], dtype="int64"),
                                 "chunk": pd.Series([], dtype=object),
                                 "kept": pd.Series([], dtype=bool)})
        nd = g.groupby("chunk", sort=False)["doc_id"].transform("nunique")
        out = g.copy()
        out["kept"] = (nd == 1).to_numpy()
        return out

    from ..functions.bucketing import bucketed_apply

    marked = bucketed_apply(chunks, ["chunk"], mark, None, n_buckets)

    def rejoin(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "doc_id" not in g.columns:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "clean_text": pd.Series([], dtype=object),
                                 "n_kept": pd.Series([], dtype="int64"),
                                 "n_dropped": pd.Series([], dtype="int64")})
        g = g.sort_values(["doc_id", "chunk_idx"], kind="stable")
        kept = g[g["kept"]]
        clean = kept.groupby("doc_id", sort=False)["chunk"].agg(" ".join)
        nk = kept.groupby("doc_id", sort=False).size()
        nall = g.groupby("doc_id", sort=False).size()
        ids = nall.index.to_numpy(np.int64)
        nkv = nk.reindex(nall.index, fill_value=0).to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": ids,
            "clean_text": clean.reindex(nall.index, fill_value="")
                               .to_numpy(dtype=object),
            "n_kept": nkv,
            "n_dropped": nall.to_numpy(np.int64) - nkv,
        })

    return bucketed_apply(marked, ["doc_id"], rejoin, None, n_buckets)


def near_dup_keep_best(clusters, docs, n_buckets: int = 64,
                       batch_size: int = 4096):
    """Quality-aware keep policy over the near-dup clusters: instead of
    min-doc_id (``near_dup_keep_list``), keep the LONGEST document of each
    cluster — token count is the integer-exact quality proxy (the policy
    real training pipelines use: survivors should be the most complete
    copy, not the lowest id). Tie-break: min doc_id among the longest.

    Dataset(doc_id, cluster, n_tokens, kept). Two bucketed exchanges:
    doc_id key (attach token counts — both sides are corpus-scale, no
    broadcast) then cluster key (per-group argmax via ONE sort + first-row
    flag, no per-cluster Python)."""
    from ..functions.bucketing import bucketed_apply, bucketed_attach

    def toks(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "n_tokens": b["text"].str.count(r"\S+").astype("int64"),
        })

    tok = docs.map_batches(toks, batch_format="pandas",
                           batch_size=batch_size)
    enriched = bucketed_attach(
        clusters, tok, "doc_id", "doc_id",
        left_cols=["doc_id", "cluster"], payload={"n_tokens": "n_tokens"},
        payload_fill=np.int64(0), n_buckets=n_buckets,
        empty_dtypes={"doc_id": "int64", "cluster": "int64",
                      "n_tokens": "int64"})

    def decide(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "cluster" not in g.columns:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "cluster": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "kept": pd.Series([], dtype=bool)})
        g = g.sort_values(["cluster", "n_tokens", "doc_id"],
                          ascending=[True, False, True], kind="mergesort")
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "cluster": g["cluster"].to_numpy(np.int64),
            "n_tokens": g["n_tokens"].to_numpy(np.int64),
            "kept": (~g["cluster"].duplicated()).to_numpy(),
        })

    return bucketed_apply(enriched, ["cluster"], decide, None, n_buckets)


def chunk_dedup_keepfirst(docs, chunk_tokens: int = CHUNK_DEDUP_TOKENS,
                          n_buckets: int = 64, batch_size: int = 4096):
    """C4's EXACT chunk-dedup policy (Raffel et al. 2020 §2.2 "three-
    sentence span" rule adapted to fixed token windows): of every
    duplicated chunk, the GLOBALLY FIRST occurrence (min (doc_id,
    chunk_idx)) survives and all other occurrences are dropped — unlike
    :func:`chunk_dedup`, which drops cross-doc duplicates entirely.
    Same two bucketed exchanges; the winner is a per-group vectorized
    argmin inside the chunk-keyed exchange, never a driver set."""
    chunks = docs.map_batches(
        lambda b: _chunk_rows(b, chunk_tokens),
        batch_format="pandas", batch_size=batch_size)

    def mark(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "chunk" not in g.columns:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "chunk_idx": pd.Series([], dtype="int64"),
                                 "chunk": pd.Series([], dtype=object),
                                 "kept": pd.Series([], dtype=bool)})
        g = g.sort_values(["chunk", "doc_id", "chunk_idx"],
                          kind="mergesort")
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "chunk_idx": g["chunk_idx"].to_numpy(np.int64),
            "chunk": g["chunk"].to_numpy(dtype=object),
            "kept": (~g["chunk"].duplicated()).to_numpy(),
        })

    from ..functions.bucketing import bucketed_apply

    marked = bucketed_apply(chunks, ["chunk"], mark, None, n_buckets)

    def rejoin(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "doc_id" not in g.columns:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "clean_text": pd.Series([], dtype=object),
                                 "n_kept": pd.Series([], dtype="int64"),
                                 "n_dropped": pd.Series([], dtype="int64")})
        g = g.sort_values(["doc_id", "chunk_idx"], kind="stable")
        kept = g[g["kept"]]
        clean = kept.groupby("doc_id", sort=False)["chunk"].agg(" ".join)
        nk = kept.groupby("doc_id", sort=False).size()
        nall = g.groupby("doc_id", sort=False).size()
        nkv = nk.reindex(nall.index, fill_value=0).to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": nall.index.to_numpy(np.int64),
            "clean_text": clean.reindex(nall.index, fill_value="")
                               .to_numpy(dtype=object),
            "n_kept": nkv,
            "n_dropped": nall.to_numpy(np.int64) - nkv,
        })

    return bucketed_apply(marked, ["doc_id"], rejoin, None, n_buckets)


# -------------------------------------------------- containment (overlap)

def _rare_shingle_pairs(g: pd.DataFrame, max_df: int) -> pd.DataFrame:
    """Candidate pairs from one shingle's posting list; hot shingles
    (df > max_df) are skipped WITH a warning — the blocking recall
    tradeoff, never silent (repo no-silent-caps rule)."""
    uniq = np.sort(g["doc_id"].unique())
    if len(uniq) > max_df:
        import warnings

        warnings.warn(
            f"containment blocking: shingle shared by {len(uniq)} docs "
            f"> max_df {max_df}; posting list skipped (qualifying pairs "
            "sharing ONLY hot shingles are missed — raise max_df)",
            stacklevel=2)
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    if len(uniq) < 2:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    ii, jj = np.triu_indices(len(uniq), k=1)
    return pd.DataFrame({"id_a": uniq[ii], "id_b": uniq[jj]})


def overlap_coefficient_pairs(docs, threshold: float = 0.8,
                              shingle_n: int = 3, max_df: int = 64,
                              checkpoint_dir: str | None = None):
    """CONTAINMENT near-dup pairs by the Szymkiewicz-Simpson overlap
    coefficient |A ∩ B| / min(|A|, |B|) over word n-gram shingle sets —
    the asymmetric-duplication detector Jaccard misses: a short document
    quoted wholesale inside a long one has overlap 1.0 but Jaccard
    |A|/|B| ~ 0 (Broder 1997 distinguishes resemblance vs containment).

    Blocking is a shared-shingle inverted index restricted to rare
    shingles (posting lists with df <= ``max_df``): any pair with
    overlap >= threshold shares >= ceil(threshold * |smaller|) shingles,
    so it is found unless ALL its shared shingles are hotter than
    ``max_df`` — skipped lists are warned, never silent. Verification is
    exact over the true shingle-hash sets; the float is ONE division.

    Scale shape: one shingle-grain exchange (posting lists bounded by
    max_df; the hot tail is dropped map-side after the group forms), one
    distinct-pair exchange, two bucketed set attaches — no all-pairs
    stage anywhere; ``checkpoint_dir`` spills the shingle table via
    lineage instead of pinning it (see :func:`_checkpointed`)."""
    from ..functions.bucketing import (
        bucketed_attach,
        bucketed_distinct,
        bucketed_group_pairs,
    )

    shingles = _checkpointed(
        docs.map_batches(
            lambda b: pa.table({
                "doc_id": pa.array(b["doc_id"], pa.int64()),
                "sh": pa.array(
                    [shingle_hashes(t, shingle_n).tobytes()
                     for t in b["text"]], pa.binary()),
            }),
            batch_format="pandas",
        ),
        None if checkpoint_dir is None else f"{checkpoint_dir}/shingles",
        inputs=["documents"])

    def postings(b: pd.DataFrame) -> pd.DataFrame:
        arrs = [np.frombuffer(x, dtype=np.uint64) for x in b["sh"]]
        lens = np.fromiter((len(a) for a in arrs), np.int64, len(arrs))
        if lens.sum() == 0:
            return pd.DataFrame({"h": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "h": np.concatenate(arrs).view(np.int64),
            "doc_id": np.repeat(b["doc_id"].to_numpy(np.int64), lens)})

    cand = bucketed_distinct(
        bucketed_group_pairs(
            shingles().map_batches(postings, batch_format="pandas"),
            ["h"], lambda g: _rare_shingle_pairs(g, max_df)),
        ["id_a", "id_b"],
    )
    joined = bucketed_attach(
        cand, shingles(), "id_a", "doc_id", ["id_a", "id_b"], {"sh": "sh_a"},
        empty_dtypes={"id_a": "int64", "id_b": "int64", "sh_a": object},
    )
    joined = bucketed_attach(
        joined, shingles(), "id_b", "doc_id", ["id_a", "id_b", "sh_a"],
        {"sh": "sh_b"}, left_fill={"sh_a": b""},
        empty_dtypes={"id_a": "int64", "id_b": "int64", "sh_a": object,
                      "sh_b": object},
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_c, out_o = [], [], [], []
        for ia, ib, sa, sb in zip(batch["id_a"], batch["id_b"],
                                  batch["sh_a"], batch["sh_b"]):
            A = set(np.frombuffer(sa, dtype=np.uint64).tolist())
            B = set(np.frombuffer(sb, dtype=np.uint64).tolist())
            if not A or not B:
                continue
            inter = len(A & B)
            ov = inter / min(len(A), len(B))
            if ov >= threshold:
                out_a.append(ia)
                out_b.append(ib)
                out_c.append(inter)
                out_o.append(ov)
        return pd.DataFrame(
            {"id_a": pd.Series(out_a, dtype="int64"),
             "id_b": pd.Series(out_b, dtype="int64"),
             "n_common": pd.Series(out_c, dtype="int64"),
             "overlap": pd.Series(out_o, dtype="float64")})

    return joined.map_batches(verify, batch_format="pandas")


# --------------------------------------------- prefix-filtered jaccard join

def _prefix_candidates(g: pd.DataFrame, t_num: int, t_den: int,
                       cap: int) -> pd.DataFrame:
    """Candidate pairs from one prefix token's posting list, pruned by the
    exact-integer length filter (J >= t forces min|set| * t_den >=
    max|set| * t_num); hot lists beyond ``cap`` are truncated WITH a
    warning (repo no-silent-caps rule) — frequency-ordered prefixes make
    this the df-heaviest tail only."""
    sub = g[["doc_id", "sz"]].drop_duplicates("doc_id")
    ids = sub["doc_id"].to_numpy(np.int64)
    szs = sub["sz"].to_numpy(np.int64)
    order = np.argsort(ids, kind="stable")
    ids, szs = ids[order], szs[order]
    if len(ids) > cap:
        import warnings

        warnings.warn(
            f"prefix-join posting list holds {len(ids)} docs > cap {cap}; "
            f"truncated to the {cap} smallest doc_ids (completeness loss "
            "on this token — raise cap)", stacklevel=2)
        ids, szs = ids[:cap], szs[:cap]
    if len(ids) < 2:
        return pd.DataFrame({"id_a": pd.Series([], dtype="int64"),
                             "id_b": pd.Series([], dtype="int64")})
    ii, jj = np.triu_indices(len(ids), k=1)
    lo = np.minimum(szs[ii], szs[jj])
    hi = np.maximum(szs[ii], szs[jj])
    keep = lo * t_den >= hi * t_num  # exact-integer length filter
    return pd.DataFrame({"id_a": ids[ii][keep], "id_b": ids[jj][keep]})


def prefix_jaccard_pairs(docs, threshold_num: int = 1,
                         threshold_den: int = 2, shingle_n: int = 3,
                         cap: int = 1000, n_buckets: int = 64,
                         checkpoint_dir: str | None = None):
    """EXACT word n-gram Jaccard >= t join via PREFIX FILTERING (the
    AllPairs / PPJoin blocking of Bayardo, Ma & Srikant 2007, WWW):
    Dataset(id_a, id_b, jaccard). Unlike the repo's LSH-banded
    (:func:`ngram_jaccard_pairs`) and rare-shingle
    (:func:`overlap_coefficient_pairs`) blockers — both of which trade
    recall for bound bucket sizes — prefix filtering is PROVABLY
    COMPLETE: order every doc's shingles by ascending global document
    frequency (rarest first; ties by token), keep each doc's first
    ``p = |x| - ceil(t*|x|) + 1`` tokens, and any pair with J >= t must
    collide on some token BOTH kept (if all common tokens sat past a
    doc's prefix, the intersection would be < ceil(t*|x|), contradicting
    J >= t). ``threshold`` is the rational ``t_num/t_den`` so the length
    filter and prefix lengths are exact integer arithmetic; the output
    float is ONE division of exact set-size integers (repo float rule).

    Scale shape: ONE token-keyed exchange computing global df AND
    attaching it to the posting rows (all rows of a token co-locate, so
    df is an in-group transform — count + attach fused), one doc-keyed
    exchange for the vectorized per-doc prefix cut, one prefix-token
    exchange emitting length-filtered pairs (frequency ordering keeps
    posting lists near-minimal — the classic AllPairs result; residual
    hot lists capped WITH a warning), one distinct-pair exchange, two
    set attaches for the exact verify. No all-pairs stage, no LSH miss
    probability, no driver-side state. ``checkpoint_dir`` spills the
    shingle-set table via lineage instead of pinning it.

    The reference's near-dup surface is single-node exact comparison
    (builder/builder.py synonym merge); this is the operator a 100 TB
    corpus needs when the dedup SLA says "no missed pairs"."""
    from ..functions.bucketing import (
        _typed_empty,
        bucketed_apply,
        bucketed_attach,
        bucketed_distinct,
        bucketed_group_pairs,
    )

    shingles = _checkpointed(
        docs.map_batches(
            lambda b: pa.table({
                "doc_id": pa.array(b["doc_id"], pa.int64()),
                "sh": pa.array(
                    [shingle_hashes(t_, shingle_n).tobytes()
                     for t_ in b["text"]], pa.binary()),
            }),
            batch_format="pandas",
        ),
        None if checkpoint_dir is None else f"{checkpoint_dir}/shingles",
        inputs=["documents"])

    def postings(b: pd.DataFrame) -> pd.DataFrame:
        arrs = [np.frombuffer(x, dtype=np.uint64) for x in b["sh"]]
        lens = np.fromiter((len(a) for a in arrs), np.int64, len(arrs))
        if lens.sum() == 0:
            return pd.DataFrame({"h": pd.Series([], dtype="int64"),
                                 "doc_id": pd.Series([], dtype="int64"),
                                 "sz": pd.Series([], dtype="int64")})
        return pd.DataFrame({
            "h": np.concatenate(arrs).view(np.int64),
            "doc_id": np.repeat(b["doc_id"].to_numpy(np.int64), lens),
            "sz": np.repeat(lens, lens)})

    toks = shingles().map_batches(postings, batch_format="pandas")

    def df_attach(g: pd.DataFrame) -> pd.DataFrame:
        # the exchange is keyed by h, so EVERY posting row of a token is
        # in this group: global df is one in-group transform — fusing the
        # count exchange and the attach exchange into ONE AllToAll
        if len(g) == 0:
            return _typed_empty(["doc_id", "h", "sz", "f"],
                                {"doc_id": "int64", "h": "int64",
                                 "sz": "int64", "f": "int64"})
        g = g.copy()
        g["f"] = g.groupby("h", sort=False)["h"].transform("size")
        return g[["doc_id", "h", "sz", "f"]]

    with_f = bucketed_apply(toks, ["h"], df_attach, n_buckets=n_buckets)

    def prefix_cut(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return _typed_empty(["h", "doc_id", "sz"],
                                {"h": "int64", "doc_id": "int64",
                                 "sz": "int64"})
        g = g.sort_values(["doc_id", "f", "h"], kind="mergesort")
        pos = g.groupby("doc_id", sort=False).cumcount().to_numpy(np.int64)
        sz = g["sz"].to_numpy(np.int64)
        # p = |x| - ceil(t|x|) + 1, exact integer ceil
        p = sz - (sz * threshold_num + threshold_den - 1) // threshold_den + 1
        return g.loc[pos < p, ["h", "doc_id", "sz"]]

    prefixes = bucketed_apply(with_f, ["doc_id"], prefix_cut,
                              n_buckets=n_buckets)
    cand = bucketed_distinct(
        bucketed_group_pairs(
            prefixes, ["h"],
            lambda g: _prefix_candidates(g, threshold_num, threshold_den,
                                         cap),
            n_buckets=n_buckets),
        ["id_a", "id_b"], n_buckets=n_buckets)
    joined = bucketed_attach(
        cand, shingles(), "id_a", "doc_id", ["id_a", "id_b"], {"sh": "sh_a"},
        empty_dtypes={"id_a": "int64", "id_b": "int64", "sh_a": object},
    )
    joined = bucketed_attach(
        joined, shingles(), "id_b", "doc_id", ["id_a", "id_b", "sh_a"],
        {"sh": "sh_b"}, left_fill={"sh_a": b""},
        empty_dtypes={"id_a": "int64", "id_b": "int64", "sh_a": object,
                      "sh_b": object},
    )

    def verify(batch: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_j = [], [], []
        for ia, ib, sa, sb in zip(batch["id_a"], batch["id_b"],
                                  batch["sh_a"], batch["sh_b"]):
            A = set(np.frombuffer(sa, dtype=np.uint64).tolist())
            B = set(np.frombuffer(sb, dtype=np.uint64).tolist())
            if not A and not B:
                continue
            inter, union = len(A & B), len(A | B)
            # exact-integer threshold gate (inter/union >= num/den), float
            # computed only for the surviving output rows: ONE division
            if inter * threshold_den >= union * threshold_num:
                out_a.append(ia)
                out_b.append(ib)
                out_j.append(inter / union)
        return pd.DataFrame(
            {"id_a": pd.Series(out_a, dtype="int64"),
             "id_b": pd.Series(out_b, dtype="int64"),
             "jaccard": pd.Series(out_j, dtype="float64")})

    return joined.map_batches(verify, batch_format="pandas")
