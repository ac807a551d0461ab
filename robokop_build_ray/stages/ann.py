"""Similarity search over an embedding column (``list<float>``).

- ``brute_force_topk``: baseline — the query matrix is broadcast ONCE via
  ``ray.put``; each batch does one numpy matmul and emits its local top-k;
  a tiny groupby-per-query merge produces the global top-k. Scales linearly
  with corpus size, never materializes the corpus.
- ``ivf_topk``: scale path — coarse quantizer (per-``label`` centroids,
  computed with a partial-aggregate groupby) prunes the corpus to the
  ``nprobe`` closest inverted lists before the same batch-matmul scan.

Determinism: ties broken by vec_id everywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray


def _as_matrix(col) -> np.ndarray:
    return np.stack(col.to_numpy()).astype(np.float64)


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.clip(np.linalg.norm(M, axis=1, keepdims=True), 1e-12, None)


class BruteForceScorer:
    """Actor: normalized query matrix loaded once from the object store."""

    def __init__(self, queries_ref, k: int):
        qids, Q = ray.get(queries_ref)
        self.qids = qids
        self.Q = _normalize(Q)
        self.k = k

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "cosine": pd.Series([], dtype="float64")})
        ids = batch["vec_id"].to_numpy()
        M = _normalize(_as_matrix(batch["embedding"]))
        S = self.Q @ M.T  # (n_queries, n_batch)
        out_q, out_n, out_c = [], [], []
        k = min(self.k, S.shape[1])
        for qi, qid in enumerate(self.qids):
            row = S[qi]
            # local top-k with deterministic vec_id tiebreak
            order = np.lexsort((ids, -row))[:k]
            out_q.extend([qid] * len(order))
            out_n.extend(ids[order])
            out_c.extend(row[order])
        return pd.DataFrame({"query_id": pd.Series(out_q, dtype="int64"),
                             "neighbor_id": pd.Series(out_n, dtype="int64"),
                             "cosine": pd.Series(out_c, dtype="float64")})


def _merge_topk(k: int):
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return fn


def brute_force_topk(embeddings, queries_ref, k: int = 10,
                     batch_size: int = 4096, concurrency=(1, 4),
                     exclude_self: bool = True):
    """-> (query_id, neighbor_id, cosine, rank)."""
    scored = embeddings.map_batches(
        BruteForceScorer,
        fn_constructor_args=(queries_ref, k + (1 if exclude_self else 0)),
        batch_format="pandas", batch_size=batch_size, concurrency=concurrency,
    )
    if exclude_self:
        scored = scored.filter(expr="query_id != neighbor_id")
    return scored.groupby("query_id").map_groups(_merge_topk(k),
                                                 batch_format="pandas")


def make_query_ref(embeddings, n_queries: int = 5):
    """First ``n_queries`` vectors by vec_id, broadcast once."""
    head = embeddings.sort("vec_id").limit(n_queries).take_all()
    qids = np.array([r["vec_id"] for r in head], dtype=np.int64)
    Q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in head])
    return ray.put((qids, Q))


# ---------------------------------------------------------------------- IVF

def label_centroids(embeddings):
    """Coarse quantizer: per-label mean vector via partial aggregation
    (sum+count per batch, tiny final groupby) — no full shuffle."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lbl, g in batch.groupby("label"):
            M = _as_matrix(g["embedding"])
            rows.append((int(lbl), M.sum(axis=0).tolist(), len(g)))
        return pd.DataFrame(rows, columns=["label", "vsum", "n"])

    parts = embeddings.map_batches(partial, batch_format="pandas").take_all()
    acc: dict[int, tuple[np.ndarray, int]] = {}
    for r in parts:
        v = np.asarray(r["vsum"], dtype=np.float64)
        s, n = acc.get(r["label"], (np.zeros_like(v), 0))
        acc[r["label"]] = (s + v, n + r["n"])
    labels = sorted(acc)
    C = np.stack([acc[l][0] / acc[l][1] for l in labels])
    return np.array(labels, dtype=np.int64), C


def lsh_buckets(M: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Random-hyperplane LSH bucket ids: sign bits of M @ R packed to int."""
    bits = (M @ R) > 0
    return (bits.astype(np.int64)
            << np.arange(R.shape[1], dtype=np.int64)[None, :]).sum(axis=1)


def lsh_probe_set(Q: np.ndarray, R: np.ndarray, multiprobe: int = 1) -> set[int]:
    """Buckets each query probes: its own bucket plus all buckets within
    hamming distance ``multiprobe`` (flip subsets of bits)."""
    from itertools import combinations

    n_planes = R.shape[1]
    probe: set[int] = set()
    for b in lsh_buckets(Q, R):
        b = int(b)
        probe.add(b)
        for d in range(1, multiprobe + 1):
            for flips in combinations(range(n_planes), d):
                m = 0
                for f in flips:
                    m |= 1 << f
                probe.add(b ^ m)
    return probe


def lsh_topk(embeddings, queries_ref, k: int = 10, n_planes: int = 6,
             multiprobe: int = 1, seed: int = 11,
             batch_size: int = 4096, concurrency=(1, 4)):
    """LSH-bucketed ANN (the scale path alongside IVF): random-hyperplane
    buckets prune the corpus to the probed buckets (query bucket +
    hamming<=multiprobe neighbors), then the same broadcast batch-matmul
    scan. Deterministic: hyperplanes from a seeded RNG; probe set is a pure
    function of (queries, seed), so the oracle can recompute membership."""
    qids, Q = ray.get(queries_ref)
    dim = Q.shape[1]
    rng = np.random.default_rng(seed)
    R = rng.standard_normal((dim, n_planes))
    probed = lsh_probe_set(np.asarray(Q, dtype=np.float64), R, multiprobe)
    R_ref = ray.put((R, frozenset(probed)))

    class BucketFilter:
        def __init__(self):
            self.R, self.probed = ray.get(R_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            if len(b) == 0:
                return b
            M = _as_matrix(b["embedding"])
            keep = np.fromiter(
                (int(x) in self.probed for x in lsh_buckets(M, self.R)),
                dtype=bool, count=len(b),
            )
            return b[keep]

    pruned = embeddings.map_batches(BucketFilter, batch_format="pandas",
                                    batch_size=batch_size,
                                    concurrency=concurrency)
    return brute_force_topk(pruned, queries_ref, k, batch_size, concurrency)


def ivf_topk(embeddings, queries_ref, k: int = 10, nprobe: int = 2,
             batch_size: int = 4096, concurrency=(1, 4)):
    """IVF scan: keep only vectors whose label is among each query's nprobe
    nearest centroids, then brute-force within the probed lists."""
    labels, C = label_centroids(embeddings)
    qids, Q = ray.get(queries_ref)
    sims = _normalize(Q) @ _normalize(C).T
    probe_labels: set[int] = set()
    for qi in range(len(qids)):
        order = np.argsort(-sims[qi])[:nprobe]
        probe_labels.update(int(labels[o]) for o in order)
    probed = embeddings.filter(
        expr=f"label in {sorted(probe_labels)!r}"
    )
    return brute_force_topk(probed, queries_ref, k, batch_size, concurrency)
