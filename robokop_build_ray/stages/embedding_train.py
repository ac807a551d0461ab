"""Distributed skip-gram-with-negative-sampling (SGNS) graph-embedding
training — the word2vec objective (Mikolov et al. 2013) over the
deterministic DeepWalk corpus (Perozzi et al. 2014); completes the
node2vec-style pipeline already staged as
``graph_metrics.random_walks -> walk_skipgrams -> walk_skipgram_negatives``
with the actual TRAINING step. Graph representation learning is the
analytics family the reference defers to its neo4j sink
(`builder/builder.py:497-521`); here it runs on the engine.

Exactness scheme (the ``classifier.lr_fit`` / ``clustering.kmeans_fit``
pattern applied to a two-matrix model): every GD iteration is ONE
streaming pass over the labeled-pair table; each pair's per-coordinate
gradient term is quantized to int64 (``floor(g * Q)``) INSIDE the batch,
so the cross-batch reduction is an order-free associative INTEGER sum and
the final embeddings are bit-identical at any parallelism / partitioning
to a sequential fit with the same spec (``entry_sql.ensure_sgns_aux``
re-derives walks, pairs, negatives AND the fit from the corpus with an
independently-structured implementation and pins the result as a
signature parquet).

Spec constants below are SPEC in the CLAUDE.md sense: changing any of
them (or the walk/negative parameters a caller passes) changes the
published embeddings — bump ``entry_sql._AUX_VERSION`` so the oracle
signature tables regenerate.

At 100 TB: driver state is two (nodes x DIM) float matrices — the
node-bounded budget the canonicalization broadcast already sets; the
labeled-pair stream is never collected (one map pass per iteration over
a checkpointed/materialized table). For corpora whose node universe
exceeds driver memory the upgrade path is parameter-server actors
sharded by node-hash — same integer-sum exchange, sharded state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

DIM = 8
SGNS_ITERS = 10
SGNS_LR = 0.5
Q = 1_000_000_000
# deterministic init: a pure integer function of (sorted-node index, dim)
W_SALTS = (131, 31)
C_SALTS = (137, 29)


def init_matrix(n: int, salts: tuple[int, int]) -> np.ndarray:
    """((i*sa + j*sb) % 201 - 100) / 1000 — exact in float64, identical
    in any implementation that evaluates the same integer expression."""
    i = np.arange(n, dtype=np.int64)[:, None]
    j = np.arange(DIM, dtype=np.int64)[None, :]
    return (((i * salts[0] + j * salts[1]) % 201 - 100) / 1000.0)


def _fixed_order_dot(W: np.ndarray, C: np.ndarray, ci: np.ndarray,
                     xi: np.ndarray) -> np.ndarray:
    """Row dot with a FIXED left-to-right accumulation over j (the
    ``classifier._logits`` convention) so engine and sequential oracle
    share the exact float op order."""
    z = np.zeros(len(ci), dtype=np.float64)
    for j in range(DIM):
        z = z + W[ci, j] * C[xi, j]
    return z


def _grad_partial(b: pd.DataFrame, W: np.ndarray, C: np.ndarray,
                  uni: np.ndarray) -> pd.DataFrame:
    """Per-batch quantized gradient partial: (idx, w0..w7, c0..c7) int64
    rows, one per node touched in this batch. floor() is applied PER
    PAIR TERM, so regrouping pairs across batches cannot change the
    global integer sums."""
    cols = (["idx"] + [f"w{j}" for j in range(DIM)]
            + [f"c{j}" for j in range(DIM)])
    if len(b) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="int64") for c in cols})
    ci = np.searchsorted(uni, b["center"].to_numpy(dtype=object))
    xi = np.searchsorted(uni, b["ctx"].to_numpy(dtype=object))
    y = b["y"].to_numpy(dtype=np.float64)
    p = 1.0 / (1.0 + np.exp(-_fixed_order_dot(W, C, ci, xi)))
    err = p - y
    gW = np.zeros((len(uni), DIM), dtype=np.int64)
    gC = np.zeros((len(uni), DIM), dtype=np.int64)
    for j in range(DIM):
        np.add.at(gW[:, j], ci,
                  np.floor(err * C[xi, j] * Q).astype(np.int64))
        np.add.at(gC[:, j], xi,
                  np.floor(err * W[ci, j] * Q).astype(np.int64))
    nz = np.nonzero(gW.any(axis=1) | gC.any(axis=1))[0]
    out = {"idx": nz.astype(np.int64)}
    for j in range(DIM):
        out[f"w{j}"] = gW[nz, j]
    for j in range(DIM):
        out[f"c{j}"] = gC[nz, j]
    return pd.DataFrame(out)


class _GradPass:
    """MODULE-LEVEL actor UDF (CLAUDE.md rule): the weight matrices and
    node universe arrive as one object-store ref per iteration via
    ``fn_constructor_kwargs`` — read once per actor, never per batch."""

    def __init__(self, state_ref):
        self.W, self.C, self.uni = ray.get(state_ref)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        return _grad_partial(b, self.W, self.C, self.uni)


def _labeled_pairs(edges, n_walks: int, walk_len: int, window: int,
                   k_neg: int):
    """(center, ctx, y) training stream: each distinct skip-gram pair once
    with y=1, plus its k deterministic negatives with y=0 — built from the
    staged walk pipeline, shuffle shapes unchanged."""
    from .graph_metrics import (
        random_walks,
        walk_skipgram_negatives,
        walk_skipgrams,
    )

    negs = walk_skipgram_negatives(
        walk_skipgrams(random_walks(edges, n_walks, walk_len),
                       window=window), k=k_neg)

    def pos(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["neg_rank"] == 0).to_numpy()  # one positive per pair row
        return pd.DataFrame({
            "center": b["center"].to_numpy(dtype=object)[m],
            "ctx": b["context"].to_numpy(dtype=object)[m],
            "y": np.ones(int(m.sum()), dtype=np.float64)})

    def neg(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "center": b["center"].to_numpy(dtype=object),
            "ctx": b["negative"].to_numpy(dtype=object),
            "y": np.zeros(len(b), dtype=np.float64)})

    return (negs.map_batches(pos, batch_format="pandas")
            .union(negs.map_batches(neg, batch_format="pandas")))


def sgns_embeddings(edges, n_walks: int = 2, walk_len: int = 3,
                    window: int = 2, k_neg: int = 2,
                    iters: int = SGNS_ITERS, lr: float = SGNS_LR):
    """Train SGNS over the walk corpus of ``edges``; returns
    Dataset(id, e0_q..e{DIM-1}_q) — each coordinate ``floor(w * Q)`` of
    the final CENTER embedding (the standard word2vec output matrix),
    int64 so the contract comparison is exact by construction.

    Full-batch GD: z = w_c . c_x (fixed op order), p = sigmoid(z),
    per-pair gradient (p - y) * counterpart coordinate, floor-quantized
    per term, integer-summed across the cluster, then ONE float update
    ``M -= lr * (g / Q) / n_pairs`` per iteration on the driver."""
    import ray.data as rd

    from ..functions.bucketing import bucketed_distinct

    lab = _labeled_pairs(edges, n_walks, walk_len, window,
                         k_neg).materialize()
    # node universe: distinct walk-start ids == every node of the simple
    # graph (walks start from all nodes) — entity-bounded driver state
    ids = bucketed_distinct(lab.select_columns(["center"]),
                            ["center"]).take_all()
    uni = np.asarray(sorted(r["center"] for r in ids), dtype=object)
    n = len(uni)
    empty_cols = {"id": pa.array([], pa.string()),
                  **{f"e{j}_q": pa.array([], pa.int64())
                     for j in range(DIM)}}
    if n == 0:
        return rd.from_arrow(pa.table(empty_cols))
    n_pairs = lab.count()
    W = init_matrix(n, W_SALTS)
    C = init_matrix(n, C_SALTS)
    for _ in range(iters):
        ref = ray.put((W.copy(), C.copy(), uni))
        parts = lab.map_batches(
            _GradPass, batch_format="pandas", concurrency=(1, 2),
            fn_constructor_kwargs={"state_ref": ref},
        ).to_pandas()  # node-bounded x blocks, never pair-scale
        agg = parts.groupby("idx", sort=False).sum()
        gW = np.zeros((n, DIM), dtype=np.int64)
        gC = np.zeros((n, DIM), dtype=np.int64)
        idx = agg.index.to_numpy(dtype=np.int64)
        for j in range(DIM):
            gW[idx, j] = agg[f"w{j}"].to_numpy(dtype=np.int64)
            gC[idx, j] = agg[f"c{j}"].to_numpy(dtype=np.int64)
        W = W - lr * (gW / Q) / n_pairs
        C = C - lr * (gC / Q) / n_pairs
    out = {"id": pa.array(uni.tolist(), pa.string())}
    for j in range(DIM):
        out[f"e{j}_q"] = pa.array(
            np.floor(W[:, j] * Q).astype(np.int64), pa.int64())
    return rd.from_arrow(pa.table(out))
