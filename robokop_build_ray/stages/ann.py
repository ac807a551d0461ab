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


# ------------------------------------------------- product quantization (ADC)

# SPEC constants shared with the oracle recomputation (changing any of
# these changes pq results; see entry_sql._AUX_VERSION doctrine).
PQ_M = 16      # subspaces (dim 64 -> 4 dims per subspace)
PQ_K = 64      # codewords per subspace (96-bit codes: measured recall@10 0.60
               # on the near-uniform synthetic embeddings vs 0.24 at 32 bits)
PQ_ITERS = 5   # Lloyd's iterations


def pq_fit(embeddings, m: int = PQ_M, k: int = PQ_K, iters: int = PQ_ITERS,
           coalesce: int = 16) -> np.ndarray:
    """Product-quantization codebook (m, k, dim/m) — Jegou et al. 2011's
    PQ trained distributed: ALL m subspace k-means advance in ONE pass
    per Lloyd's iteration (per-batch partial stats keyed (subspace,
    codeword), coalesced to an m*k-bounded table; the corpus is never
    materialized). Partial sums accumulate QUANTIZED int64 components
    (clustering.QUANT), so the codebook is bit-identical to
    :func:`pq_fit_sequential` at any parallelism/batching — the repo's
    iterative-algorithm determinism contract."""
    from .clustering import QUANT, assign_nearest, initial_centroids

    M0 = initial_centroids(embeddings, k)
    dim = M0.shape[1]
    d = dim // m
    C = np.stack([M0[:, s * d:(s + 1) * d].copy() for s in range(m)])
    for _ in range(iters):
        Ci = C.copy()

        vcols = [f"v{t}" for t in range(d)]

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            # sum components FLATTENED to int64 scalar columns: an
            # object column of numpy arrays pickles per element through
            # the exchange (measured 9 s vs <1 s for this all-numeric
            # Arrow-native frame)
            X = _as_matrix(b["embedding"])
            sums = np.zeros((m, k, d), dtype=np.int64)
            cnts = np.zeros((m, k), dtype=np.int64)
            for s in range(m):
                Xs = X[:, s * d:(s + 1) * d]
                a = assign_nearest(Xs, Ci[s])
                np.add.at(sums[s], a, np.rint(Xs * QUANT).astype(np.int64))
                cnts[s] = np.bincount(a, minlength=k)
            out = pd.DataFrame({
                "s": np.repeat(np.arange(m, dtype=np.int64), k),
                "j": np.tile(np.arange(k, dtype=np.int64), m),
                "n": cnts.reshape(-1),
            })
            flat = sums.reshape(-1, d)
            for t, c in enumerate(vcols):
                out[c] = flat[:, t]
            return out

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            return g.groupby(["s", "j"], sort=True, as_index=False)[
                ["n", *vcols]].sum()

        # to_pandas, NOT take_all: take_all's per-row dict conversion
        # measured ~1.7 ms/row (27 s for the 16k partial rows); the Arrow
        # block -> DataFrame path is milliseconds
        stats = (embeddings.map_batches(partial, batch_format="pandas")
                 .repartition(coalesce)
                 .map_batches(merge, batch_format="pandas", batch_size=None)
                 .to_pandas())
        tot = stats.groupby(["s", "j"], sort=True, as_index=False)[
            ["n", *vcols]].sum()
        n = tot["n"].to_numpy()
        v = tot[vcols].to_numpy(dtype=np.int64)
        nz = n > 0  # empty codeword keeps its previous position
        upd = C.reshape(m * k, d).copy()
        upd[nz] = v[nz].astype(np.float64) / (n[nz, None].astype(np.float64)
                                              * QUANT)
        C = upd.reshape(m, k, d)
    return C


def pq_fit_sequential(sf_dir: str, m: int = PQ_M, k: int = PQ_K,
                      iters: int = PQ_ITERS) -> np.ndarray:
    """Independent single-process recomputation (oracle side): same
    quantized-sum arithmetic -> bit-identical to :func:`pq_fit`."""
    from .clustering import QUANT, assign_nearest

    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    X = np.stack([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    d = X.shape[1] // m
    C = np.stack([X[:k, s * d:(s + 1) * d].copy() for s in range(m)])
    for _ in range(iters):
        for s in range(m):
            Xs = X[:, s * d:(s + 1) * d]
            a = assign_nearest(Xs, C[s])
            q = np.rint(Xs * QUANT).astype(np.int64)
            for j in range(k):
                msk = a == j
                n = int(msk.sum())
                if n > 0:
                    C[s, j] = q[msk].sum(axis=0).astype(np.float64) / (
                        n * QUANT)
    return C


class PQScorer:
    """Actor: asymmetric-distance (ADC) scan. The codebook and the query
    matrix load once per actor; each batch is ENCODED (per-subspace
    nearest codeword — at scale the uint8 codes, 8 bytes/vector vs 256,
    are what an index would persist) and scored by Euclidean distance
    from each query to the batch's RECONSTRUCTIONS. Emits a per-batch
    partial top-n per query, so the merge sees n_queries x topn rows per
    batch, never the corpus."""

    def __init__(self, queries_ref, cb_ref, topn: int):
        self.qids, self.Q = ray.get(queries_ref)
        self.C = ray.get(cb_ref)
        self.topn = topn

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        from .clustering import assign_nearest

        if len(batch) == 0:
            return pd.DataFrame({"query_id": pd.Series([], dtype="int64"),
                                 "neighbor_id": pd.Series([], dtype="int64"),
                                 "adc_d": pd.Series([], dtype="float64")})
        ids = batch["vec_id"].to_numpy()
        X = _as_matrix(batch["embedding"])
        m, _, d = self.C.shape
        recon = np.empty_like(X)
        for s in range(m):
            a = assign_nearest(X[:, s * d:(s + 1) * d], self.C[s])
            recon[:, s * d:(s + 1) * d] = self.C[s][a]
        out_q, out_n, out_d = [], [], []
        topn = min(self.topn, len(batch))
        for qi, qid in enumerate(self.qids):
            dist = np.sqrt(((recon - self.Q[qi][None, :]) ** 2).sum(axis=1))
            order = np.lexsort((ids, dist))[:topn]
            out_q.extend([qid] * len(order))
            out_n.extend(ids[order])
            out_d.extend(dist[order])
        return pd.DataFrame({"query_id": pd.Series(out_q, dtype="int64"),
                             "neighbor_id": pd.Series(out_n, dtype="int64"),
                             "adc_d": pd.Series(out_d, dtype="float64")})


def pq_topk(embeddings, queries_ref, k: int = 10, m: int = PQ_M,
            n_codes: int = PQ_K, iters: int = PQ_ITERS,
            batch_size: int = 4096, concurrency=(1, 4),
            codebook: np.ndarray | None = None):
    """PQ/ADC top-k -> (query_id, neighbor_id, adc_d, rank): the
    memory-bounded scale path — at 100 TB the scan reads 8-byte codes
    instead of raw vectors, and the codebook (m x k x d/m floats) is the
    only broadcast state. Ties broken by neighbor_id; self excluded by
    id (its quantized distance is nonzero)."""
    C = pq_fit(embeddings, m, n_codes, iters) if codebook is None else codebook
    cb_ref = ray.put(C)
    scored = embeddings.map_batches(
        PQScorer, fn_constructor_args=(queries_ref, cb_ref, k + 1),
        batch_format="pandas", batch_size=batch_size, concurrency=concurrency,
    ).filter(expr="query_id != neighbor_id")

    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["adc_d", "neighbor_id"],
                          ascending=[True, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(fn, batch_format="pandas")


def sql_pq_topk(C: np.ndarray, k: int = 10, n_queries: int = 5) -> str:
    """DuckDB oracle for :func:`pq_topk` from codebook literals (codebook
    from the INDEPENDENT sequential fit — the kmeans/IVF trust pattern):
    per-(vector, subspace) nearest codeword, reconstruction by ordered
    flatten, ADC distance + rank per query. Rank-only output (floats on
    the two sides differ in summation order; ties break by neighbor_id)."""
    m, _, d = C.shape
    rows = []
    for s in range(m):
        for j in range(C.shape[1]):
            lit = ", ".join(repr(float(x)) for x in C[s, j])
            rows.append(f"({s}, {j}, CAST([{lit}] AS DOUBLE[]))")
    cb = ",\n    ".join(rows)
    return f"""
WITH cb(s, j, ce) AS (VALUES
    {cb}
),
subs AS (SELECT DISTINCT s FROM cb),
sv AS (
  SELECT e.vec_id, ss.s,
         CAST(list_slice(e.embedding, ss.s*{d} + 1, ss.s*{d} + {d})
              AS DOUBLE[]) AS x
  FROM embeddings e CROSS JOIN subs ss
),
a AS (
  SELECT sv.vec_id, sv.s, cb.ce,
         row_number() OVER (PARTITION BY sv.vec_id, sv.s
                            ORDER BY list_distance(sv.x, cb.ce), cb.j) AS rn
  FROM sv JOIN cb USING (s)
),
recon AS (
  SELECT vec_id, flatten(list(ce ORDER BY s)) AS rv
  FROM a WHERE rn = 1 GROUP BY vec_id
),
q AS (SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qe
      FROM embeddings ORDER BY vec_id LIMIT {n_queries}),
sc AS (
  SELECT q.qid AS query_id, r.vec_id AS neighbor_id,
         list_distance(q.qe, r.rv) AS dd
  FROM recon r CROSS JOIN q WHERE r.vec_id <> q.qid
)
SELECT query_id, neighbor_id, rank FROM (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dd, neighbor_id) AS rank
  FROM sc
) WHERE rank <= {k}"""
