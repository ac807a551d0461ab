"""Distributed k-means (Lloyd's) over an embedding column + SemDeDup-style
semantic near-dup pairs (k-means blocking -> per-cluster cosine).

Scale shape: each Lloyd's iteration is ONE pass of per-batch partial
statistics (assignment by nearest centroid, then per-cluster vector sums)
coalesced to a k-bounded table — centroid state is k x dim floats, always
driver-sized; the data is never materialized. This is the canonical
"iterative algorithm as repeated map_batches + tiny reduce" pattern.

Determinism contract (repo invariant — results must be bit-identical to a
sequential recomputation regardless of batch boundaries or parallelism):
partial sums accumulate QUANTIZED int64 components (exact, associative),
so merge order cannot perturb centroids; per-row assignment math
(:func:`assign_nearest`) is shared between the distributed and the
sequential-oracle paths and has no cross-row accumulation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

# fixed-point scale for order-independent integer partial sums: float32
# inputs have 24-bit mantissas, so *2^20 keeps ~6 decimal digits; int64
# overflows only past ~2^43 rows per cluster per batch-tree level.
QUANT = 1 << 20

KMEANS_K = 8
KMEANS_ITERS = 5


def _matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def assign_nearest(M: np.ndarray, C: np.ndarray) -> np.ndarray:
    """Nearest centroid per row (squared L2, ties -> lowest cluster id).
    Shared by the distributed fit/assign AND the sequential oracle
    recomputation so per-row float math is identical in both."""
    d2 = ((M[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1)


def _partial_stats(M: np.ndarray, C: np.ndarray, k: int) -> pd.DataFrame:
    a = assign_nearest(M, C)
    q = np.rint(M * QUANT).astype(np.int64)
    sums = np.zeros((k, M.shape[1]), dtype=np.int64)
    np.add.at(sums, a, q)
    counts = np.bincount(a, minlength=k).astype(np.int64)
    return pd.DataFrame({
        "cluster": np.arange(k, dtype=np.int64),
        "n": counts,
        "s": list(sums),
    })


def _merge_stats(frames: pd.DataFrame) -> pd.DataFrame:
    out = []
    for cl, g in frames.groupby("cluster", sort=True):
        out.append({
            "cluster": cl,
            "n": int(g["n"].sum()),
            "s": np.sum(np.stack(g["s"].to_numpy()), axis=0),
        })
    return pd.DataFrame(out)


def initial_centroids(embeddings, k: int) -> np.ndarray:
    """First ``k`` vectors by vec_id — deterministic init without a full
    sort: per-batch partial min-k, coalesce, final min-k (k-bounded)."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values("vec_id").head(k)[["vec_id", "embedding"]]

    rows = (embeddings.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(partial, batch_format="pandas", batch_size=None)
            .take_all())
    rows = sorted(rows, key=lambda r: r["vec_id"])[:k]
    return _matrix([r["embedding"] for r in rows])


def kmeans_fit(embeddings, k: int = KMEANS_K, iters: int = KMEANS_ITERS,
               coalesce: int = 16) -> np.ndarray:
    """Distributed Lloyd's: returns final centroids (k x dim float64).
    ``embeddings`` needs columns vec_id, embedding(list<float>)."""
    C = initial_centroids(embeddings, k)
    for _ in range(iters):
        Ci = C  # bind per-iteration (closure ships k x dim floats per task)

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            return _partial_stats(_matrix(b["embedding"].to_numpy()), Ci, k)

        stats = _merge_stats(pd.DataFrame(
            (embeddings.map_batches(partial, batch_format="pandas")
             .repartition(coalesce)
             .map_batches(_merge_stats, batch_format="pandas",
                          batch_size=None)
             .take_all())
        ))
        C = Ci.copy()
        for r in stats.itertuples(index=False):
            if r.n > 0:  # empty cluster keeps its previous centroid
                C[r.cluster] = np.asarray(r.s, dtype=np.float64) / (
                    float(r.n) * QUANT)
    return C


def kmeans_fit_sequential(sf_dir: str, k: int = KMEANS_K,
                          iters: int = KMEANS_ITERS) -> np.ndarray:
    """Independent single-process recomputation (oracle side): same
    quantized-sum arithmetic -> bit-identical centroids to
    :func:`kmeans_fit` by construction."""
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet").sort_values("vec_id")
    M = _matrix(emb["embedding"].to_numpy())
    C = M[:k].copy()
    for _ in range(iters):
        a = assign_nearest(M, C)
        q = np.rint(M * QUANT).astype(np.int64)
        for j in range(k):
            m = a == j
            n = int(m.sum())
            if n > 0:
                C[j] = q[m].sum(axis=0).astype(np.float64) / (n * QUANT)
    return C


def kmeans_assign(embeddings, C: np.ndarray):
    """(vec_id, cluster) assignment under fixed centroids."""

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        a = assign_nearest(_matrix(b["embedding"].to_numpy()), C)
        return pd.DataFrame({"vec_id": b["vec_id"],
                             "cluster": a.astype(np.int64)})

    return embeddings.map_batches(assign, batch_format="pandas")


def embedding_kmeans(sf_dir: str, k: int = KMEANS_K,
                     iters: int = KMEANS_ITERS):
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    C = kmeans_fit(emb, k, iters)
    return kmeans_assign(emb, C)


def embedding_cluster_sizes(sf_dir: str, k: int = KMEANS_K,
                            iters: int = KMEANS_ITERS):
    """IVF/partition balance audit: Dataset(cluster, n_vectors,
    share) — per fitted-k-means-cell member counts and their share of
    the table (ONE division per row). The imbalance report that decides
    whether an IVF index needs re-training or cell splitting.

    Shape: the kmeans fit (centroid-bounded driver state) + one
    zero-shuffle assignment scan with k-bounded count partials."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    C = kmeans_fit(emb, k, iters)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        a = assign_nearest(_matrix(b["embedding"].to_numpy()), C)
        vc = pd.Series(a).value_counts()
        return pd.DataFrame({"cluster": vc.index.to_numpy(np.int64),
                             "n_vectors": vc.to_numpy(np.int64)})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("cluster", as_index=False)["n_vectors"].sum()
        g = g.sort_values("cluster").reset_index(drop=True)
        n = int(g["n_vectors"].sum())
        return pd.DataFrame({
            "cluster": g["cluster"].astype("int64"),
            "n_vectors": g["n_vectors"].astype("int64"),
            "share": (g["n_vectors"].to_numpy(np.int64)
                      / float(n))})

    return (emb.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def sql_embedding_cluster_sizes(C: np.ndarray) -> str:
    """Oracle for :func:`embedding_cluster_sizes` over the sequential
    fit's centroid literals."""
    inner = sql_kmeans_assign(C)
    return f"""
WITH asg AS ({inner})
SELECT CAST(cluster AS BIGINT) AS cluster,
       CAST(count(*) AS BIGINT) AS n_vectors,
       CAST(count(*) AS DOUBLE)
         / (SELECT count(*) FROM asg) AS share
FROM asg GROUP BY cluster"""


def semantic_dedup_pairs(sf_dir: str, threshold: float = 0.4,
                         k: int = KMEANS_K, iters: int = KMEANS_ITERS):
    """SemDeDup-shaped semantic near-dup pairs: k-means clusters as the
    blocking key, exact cosine within each cluster (never all-pairs across
    the table). Returns (id_a, id_b) with cosine >= threshold and both ids
    in the same fitted cluster."""
    from .dedup import embedding_cosine_pairs

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    C = kmeans_fit(emb, k, iters)

    def label(b: pd.DataFrame) -> pd.DataFrame:
        a = assign_nearest(_matrix(b["embedding"].to_numpy()), C)
        return pd.DataFrame({"vec_id": b["vec_id"],
                             "embedding": b["embedding"],
                             "label": a.astype(np.int64)})

    return embedding_cosine_pairs(
        emb.map_batches(label, batch_format="pandas"), threshold)


# ---------------------------------------------------------------- oracle SQL

def _centroid_values_sql(C: np.ndarray) -> str:
    rows = []
    for j, c in enumerate(C):
        lit = ", ".join(repr(float(x)) for x in c)
        rows.append(f"({j}, CAST([{lit}] AS DOUBLE[]))")
    return ",\n    ".join(rows)


def sql_kmeans_assign(C: np.ndarray) -> str:
    """Assignment recomputed by DuckDB from centroid literals (centroids
    from the INDEPENDENT sequential fit — same trust pattern as the IVF
    probe-set oracle)."""
    return f"""
WITH c(cluster, ce) AS (VALUES
    {_centroid_values_sql(C)}
),
a AS (
  SELECT e.vec_id, c.cluster,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.ce),
                    c.cluster) AS rn
  FROM embeddings e CROSS JOIN c
)
SELECT vec_id, cluster FROM a WHERE rn = 1"""


def sql_semantic_dedup(C: np.ndarray, threshold: float = 0.4) -> str:
    # rk <= 20000 mirrors dedup.EMB_BLOCK_CAP (hot-cluster truncation to
    # the smallest vec_ids) — change both together
    return f"""
WITH c(cluster, ce) AS (VALUES
    {_centroid_values_sql(C)}
),
a AS (
  SELECT e.vec_id, e.embedding, c.cluster,
         row_number() OVER (
           PARTITION BY e.vec_id
           ORDER BY list_distance(CAST(e.embedding AS DOUBLE[]), c.ce),
                    c.cluster) AS rn
  FROM embeddings e CROSS JOIN c
),
r AS (
  SELECT vec_id, embedding, cluster,
         row_number() OVER (PARTITION BY cluster ORDER BY vec_id) AS rk
  FROM a WHERE rn = 1
)
SELECT x.vec_id AS id_a, y.vec_id AS id_b
FROM r x JOIN r y
  ON x.cluster = y.cluster AND x.vec_id < y.vec_id
WHERE x.rk <= 20000 AND y.rk <= 20000
  AND list_cosine_similarity(CAST(x.embedding AS DOUBLE[]),
                             CAST(y.embedding AS DOUBLE[])) >= {threshold}"""


def embedding_gram(sf_dir: str):
    """Exact integer Gram matrix of the embedding table (upper triangle):
    Dataset(i, j, gram) with gram = sum over rows of q_i * q_j, where q is
    the vector quantized floor(x * QUANT + 0.5) — the covariance /
    PCA-input primitive (X^T X) computed the way a 100 TB pipeline must:
    per-batch int64 BLAS-style matmul partials (dim x dim), folded in ONE
    dim^2-bounded block (no shuffle; 64-dim -> 2080 rows). Quantized
    integers make the fold order-independent (the kmeans QUANT contract),
    and DuckDB re-derives the identical sums from the raw floats."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        M = _matrix(b["embedding"])
        Q = np.floor(M * QUANT + 0.5).astype(np.int64)
        G = Q.T @ Q
        iu, ju = np.triu_indices(G.shape[0])
        return pd.DataFrame({"i": iu.astype(np.int64),
                             "j": ju.astype(np.int64),
                             "gram": G[iu, ju]})

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["i", "j"], sort=True, as_index=False)["gram"].sum()

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["embedding"])
    return (emb.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(merge, batch_format="pandas", batch_size=None))


def sql_embedding_gram() -> str:
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {QUANT}.0 + 0.5)
              AS BIGINT) AS v
  FROM embeddings
)
SELECT a.i, b.i AS j, CAST(sum(a.v * b.v) AS BIGINT) AS gram
FROM q a JOIN q b ON b.vec_id = a.vec_id AND b.i >= a.i
GROUP BY a.i, b.i"""


RP_DIM = 8


def _rp_signs(in_dim: int, out_dim: int) -> np.ndarray:
    """Deterministic +-1 projection matrix: sign((3 * i + 7 * j) % 2) —
    a fixed arithmetic pattern both engine and oracle re-derive (no RNG,
    no shipped literal). Entry (i out-dim row, j in-dim col) is +1 when
    (i * 31 + j * 17) % 3 != 0 else -1 — coprime strides give balanced
    +-1 mix across rows."""
    i = np.arange(out_dim, dtype=np.int64)[:, None]
    j = np.arange(in_dim, dtype=np.int64)[None, :]
    return np.where((i * 31 + j * 17) % 3 != 0, 1, -1).astype(np.int64)


def embedding_rp(sf_dir: str, out_dim: int = RP_DIM):
    """Deterministic signed random projection (Achlioptas 2003 /
    Johnson-Lindenstrauss grain): Dataset(vec_id, k, proj) — each vector
    quantized to int64 (the QUANT contract) then multiplied by a fixed
    +-1 matrix derived from an arithmetic pattern, so the reduced
    representation is EXACT integers: order-independent, bit-identical
    at any parallelism, and re-derivable by the SQL oracle from the raw
    floats. This is the dimension-reduction front-end an ANN / LSH
    pipeline runs before bucketing; per batch it is one int64 matmul —
    embarrassingly parallel, no shuffle."""

    def project(b: pd.DataFrame) -> pd.DataFrame:
        M = _matrix(b["embedding"])
        S = _rp_signs(M.shape[1], out_dim)
        Q = np.floor(M * QUANT + 0.5).astype(np.int64)
        P = Q @ S.T  # (n, out_dim) exact ints
        n = len(b)
        return pd.DataFrame({
            "vec_id": np.repeat(b["vec_id"].to_numpy().astype(np.int64),
                                out_dim),
            "k": np.tile(np.arange(out_dim, dtype=np.int64), n),
            "proj": P.reshape(-1),
        })

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    return emb.map_batches(project, batch_format="pandas")


def sql_embedding_rp(out_dim: int = RP_DIM) -> str:
    return f"""
WITH q AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {QUANT}.0 + 0.5)
              AS BIGINT) AS v
  FROM embeddings
),
k AS (SELECT unnest(range({out_dim})) AS k)
SELECT q.vec_id, k.k,
       CAST(sum(q.v * (CASE WHEN (k.k * 31 + q.j * 17) % 3 <> 0
                            THEN 1 ELSE -1 END)) AS BIGINT) AS proj
FROM q CROSS JOIN k
GROUP BY q.vec_id, k.k"""


PCA_ITERS = 3
PCA_SCALE = 1 << 20  # rescale target after each power iteration


def _power_iterate(G: list[list[int]], iters: int, scale: int) -> list[int]:
    """Deterministic integer power iteration on an exact integer Gram
    matrix: v0 = ones; per round w = G v (arbitrary-precision ints ==
    the oracle's HUGEINT), then rescale v = sign(w) * (|w| * scale // m)
    with m = max|w| — truncating division on NON-NEGATIVE operands, so
    Python // and DuckDB // agree exactly. No sqrt, no float: the
    returned direction is bit-identical to the unrolled SQL."""
    dim = len(G)
    v = [1] * dim
    for _ in range(iters):
        w = [sum(G[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        m = max(abs(x) for x in w)
        if m == 0:
            return v
        v = [(-1 if x < 0 else 1) * ((abs(x) * scale) // m) for x in w]
    return v


def embedding_pca_proj(sf_dir: str, iters: int = PCA_ITERS):
    """Distributed PCA first-component projection (the whitening /
    dedup-direction primitive): Dataset(vec_id, pc1_proj) — every vector's
    EXACT integer dot product with the dominant eigendirection of X^T X,
    found by ``iters`` integer power iterations (SPEC constants like
    WL_ROUNDS; converged or not, engine and unrolled oracle agree
    bit-for-bit).

    Scale shape: the Gram matrix folds from per-batch int64 matmul
    partials with NO shuffle (embedding_gram's dim^2-bounded fold — the
    only driver state is 64x64); the power iteration is driver-side
    arithmetic on that dim^2 table; the projection pass broadcasts the
    64-int direction and is one int64 matmul per batch, embarrassingly
    parallel. This is exactly how a 100 TB PCA runs: moments small,
    data-pass wide."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        M = _matrix(b["embedding"])
        Q = np.floor(M * QUANT + 0.5).astype(np.int64)
        G = Q.T @ Q
        iu, ju = np.indices(G.shape)
        return pd.DataFrame({"i": iu.reshape(-1).astype(np.int64),
                             "j": ju.reshape(-1).astype(np.int64),
                             "gram": G.reshape(-1)})

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["i", "j"], sort=True, as_index=False)["gram"].sum()

    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    gram = (emb.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(merge, batch_format="pandas", batch_size=None))
    # dim^2-bounded driver fold (the embedding_gram budget)
    rows = gram.take_all()
    if not rows:
        return rd.from_arrow(pa.table({"vec_id": pa.array([], pa.int64()),
                                       "pc1_proj": pa.array([], pa.int64())}))
    dim = max(r["i"] for r in rows) + 1
    G = [[0] * dim for _ in range(dim)]
    for r in rows:
        G[r["i"]][r["j"]] = int(r["gram"])
    v = np.array(_power_iterate(G, iters, PCA_SCALE), dtype=np.int64)

    def project(b: pd.DataFrame, _v=v) -> pd.DataFrame:
        M = _matrix(b["embedding"])
        Q = np.floor(M * QUANT + 0.5).astype(np.int64)
        return pd.DataFrame({
            "vec_id": b["vec_id"].to_numpy().astype(np.int64),
            "pc1_proj": Q @ _v,
        })

    return emb.map_batches(project, batch_format="pandas")


def sql_embedding_pca_proj(iters: int = PCA_ITERS) -> str:
    s = PCA_SCALE
    ctes = [f"""q AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS j,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {QUANT}.0 + 0.5)
              AS BIGINT) AS v
  FROM embeddings)""",
            """g AS MATERIALIZED (
  SELECT a.j AS i, b.j AS j,
         CAST(sum(CAST(a.v AS HUGEINT) * b.v) AS HUGEINT) AS gv
  FROM q a JOIN q b ON b.vec_id = a.vec_id GROUP BY a.j, b.j)""",
            """v0 AS MATERIALIZED (
  SELECT DISTINCT i AS j, CAST(1 AS HUGEINT) AS v FROM g)"""]
    for r in range(1, iters + 1):
        ctes.append(f"""w{r} AS MATERIALIZED (
  SELECT g.i AS j, sum(g.gv * p.v) AS w
  FROM g JOIN v{r - 1} p ON p.j = g.j GROUP BY g.i)""")
        ctes.append(f"""v{r} AS MATERIALIZED (
  SELECT j, CASE WHEN w < 0 THEN -1 ELSE 1 END
            * ((abs(w) * {s}) // (SELECT max(abs(w)) FROM w{r})) AS v
  FROM w{r})""")
    return ("WITH " + ",\n".join(ctes) + f"""
SELECT q.vec_id, CAST(sum(q.v * v{iters}.v) AS BIGINT) AS pc1_proj
FROM q JOIN v{iters} ON v{iters}.j = q.j
GROUP BY q.vec_id""")


# ----------------------------------------------- k-center coreset pick

K_CENTERS = 6


def _kcenter_partial(b: pd.DataFrame, centers_ref) -> pd.DataFrame:
    """Per-batch greedy k-center candidate: quantize the batch (QUANT
    contract), compute each row's min squared-L2 distance to the
    broadcast centers, emit ONE row (best d, its vec_id, its vector) —
    max distance, ties to the smallest vec_id. Plain TASK map (same
    broadcast pattern as events_value_ntile's assign): per-round actor
    pools cost more in spin-up than the whole scan."""
    import ray as _ray

    C = _ray.get(centers_ref)  # int64 (r x dim)
    q = np.floor(_matrix(b["embedding"]) * QUANT + 0.5).astype(
        np.int64)  # same half-up rule as the gram/kcenter oracles
    diff = q[:, None, :] - C[None, :, :]
    d = (diff * diff).sum(axis=2).min(axis=1)  # exact int64
    ids = b["vec_id"].to_numpy(np.int64)
    best = d.max()
    cand = np.flatnonzero((d == best) & (ids == ids[d == best].min()))
    j = int(cand[0])
    return pd.DataFrame({
        "d": np.asarray([best], dtype=np.int64),
        "vec_id": np.asarray([ids[j]], dtype=np.int64),
        "vec": [q[j].tolist()],  # one row per batch — cheap payload
    })


def _mmr_partial(b: pd.DataFrame, state_ref) -> pd.DataFrame:
    """Per-batch MMR candidate: quantize, drop excluded ids, score
    rel - max_sim_to_selected (rel alone when nothing is selected yet),
    emit ONE row (best score, its vec_id, its vector) — max score, ties
    to the smallest vec_id. Same broadcast task-map shape as
    :func:`_kcenter_partial`."""
    import ray as _ray

    qv, sel, excl = _ray.get(state_ref)
    q = np.floor(_matrix(b["embedding"]) * QUANT + 0.5).astype(np.int64)
    ids = b["vec_id"].to_numpy(np.int64)
    keep = ~np.isin(ids, excl)
    empty = pd.DataFrame({"sc": pd.Series([], dtype="int64"),
                          "vec_id": pd.Series([], dtype="int64"),
                          "vec": pd.Series([], dtype=object)})
    if not keep.any():
        return empty
    q, ids = q[keep], ids[keep]
    rel = q @ qv  # exact int64 dots
    sc = rel - (q @ sel.T).max(axis=1) if len(sel) else rel
    best = sc.max()
    j = int(np.flatnonzero((sc == best)
                           & (ids == ids[sc == best].min()))[0])
    return pd.DataFrame({
        "sc": np.asarray([best], dtype=np.int64),
        "vec_id": np.asarray([ids[j]], dtype=np.int64),
        "vec": [q[j].tolist()],
    })


def embedding_mmr(sf_dir: str, k: int = K_CENTERS):
    """Greedy Maximal Marginal Relevance selection (Carbonell &
    Goldstein 1998, lambda = 1/2) — the relevance-vs-redundancy pick a
    curation pipeline uses to choose diverse examples near a query:
    query = the smallest-vec_id vector; each round selects the candidate
    maximizing rel(x) - max_sim(x, selected) (dot products; the empty
    selected set contributes 0, so round 0 is the pure-relevance pick).
    Dataset(sel_round, vec_id, mmr_x2) where mmr_x2 is 2x the
    lambda=1/2 MMR score — an exact int64, no float anywhere.

    Exactness/scale: identical profile to :func:`embedding_kcenter` —
    quantized int64 dots, k zero-shuffle scans with one candidate row
    per batch, broadcast state k x dim ints."""
    import ray as _ray
    import ray.data as rd

    def scan():
        return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    first = int(scan().min("vec_id"))
    got = scan().filter(expr=f"vec_id == {first}").take_all()
    qvec = np.floor(
        np.asarray(got[0]["embedding"], dtype=np.float64) * QUANT
        + 0.5).astype(np.int64)
    rows: list[tuple[int, int, int]] = []
    sel: list[np.ndarray] = []
    excl = [first]
    for r in range(k):
        ref = _ray.put((qvec,
                        np.stack(sel) if sel else np.empty(
                            (0, len(qvec)), dtype=np.int64),
                        np.asarray(excl, dtype=np.int64)))
        parts = scan().map_batches(
            _mmr_partial, batch_format="pandas",
            fn_kwargs={"state_ref": ref}).to_pandas()
        if len(parts) == 0:
            break  # candidate pool exhausted
        best = int(parts["sc"].max())
        win = parts.loc[parts["sc"] == best]
        win = win.loc[win["vec_id"] == win["vec_id"].min()].iloc[0]
        rows.append((r, int(win["vec_id"]), best))
        sel.append(np.asarray(win["vec"], dtype=np.int64))
        excl.append(int(win["vec_id"]))

    return rd.from_arrow(pa.table({
        "sel_round": pa.array([r for r, _, _ in rows], pa.int64()),
        "vec_id": pa.array([v for _, v, _ in rows], pa.int64()),
        "mmr_x2": pa.array([s for _, _, s in rows], pa.int64()),
    }))


def sql_embedding_mmr(k: int = K_CENTERS) -> str:
    """Oracle for :func:`embedding_mmr` — unrolled greedy rounds over
    list-kernel integer dots (the kcenter template with least -> greatest
    and distance -> rel - maxsim), every CTE MATERIALIZED per the
    multi-arm unrolled-oracle invariant."""
    dot = ("list_sum(list_transform(range(1, len({a}.q) + 1),"
           " i -> {a}.q[i] * {b}.q[i]))")
    ctes = [f"""qa AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {QUANT}.0 + 0.5) AS BIGINT)) AS q
  FROM embeddings),
qv AS MATERIALIZED (SELECT q FROM qa
                    WHERE vec_id = (SELECT min(vec_id) FROM qa)),
rel AS MATERIALIZED (
  SELECT a.vec_id, a.q, {dot.format(a='a', b='v')} AS rel
  FROM qa a CROSS JOIN qv v
  WHERE a.vec_id <> (SELECT min(vec_id) FROM qa)),
s0 AS MATERIALIZED (SELECT vec_id, rel AS sc, q FROM rel
                    ORDER BY rel DESC, vec_id LIMIT 1)"""]
    sel = ["SELECT CAST(0 AS BIGINT) AS sel_round,"
           " (SELECT vec_id FROM s0) AS vec_id,"
           " CAST((SELECT sc FROM s0) AS BIGINT) AS mmr_x2"]
    for r in range(1, k):
        prev = "rel" if r == 1 else f"m{r - 2}"
        ms = (f"greatest(m.ms, {dot.format(a='m', b='c')})" if r > 1
              else dot.format(a="m", b="c"))
        ctes.append(f"""m{r - 1} AS MATERIALIZED (
  SELECT m.vec_id, m.q, m.rel, {ms} AS ms
  FROM {prev} m CROSS JOIN s{r - 1} c
  WHERE m.vec_id <> c.vec_id)""")
        ctes.append(f"""s{r} AS MATERIALIZED (
  SELECT vec_id, rel - ms AS sc, q FROM m{r - 1}
  ORDER BY sc DESC, vec_id LIMIT 1)""")
        sel.append(f"SELECT {r}, (SELECT vec_id FROM s{r}),"
                   f" CAST((SELECT sc FROM s{r}) AS BIGINT)")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sel)


def embedding_kcenter(sf_dir: str, k: int = K_CENTERS):
    """Greedy k-CENTER coreset selection (Gonzalez 1985 — the farthest-
    point-first pick SemDeDup-style curation and active-learning loops
    seed clusters with): start from the smallest vec_id, then k-1 rounds
    of "farthest point from the chosen set" -> Dataset(sel_round,
    vec_id, dist_sq) where dist_sq is the selection's exact min squared
    distance to the prior centers (the covering radius trace).

    Exactness: vectors quantize to int64 (QUANT contract) so every
    distance is an exact integer — argmax + smallest-vec_id tie-break is
    deterministic at any parallelism, and the oracle's unrolled rounds
    reproduce it bit-for-bit. Scale: each round is ONE zero-shuffle
    streaming scan emitting one candidate row per batch (driver fold is
    batch-count-bounded); broadcast state is k x dim ints. k rounds of
    k·dim work per row — the standard coreset cost profile."""
    import ray as _ray
    import ray.data as rd

    def scan():
        return rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])

    first = int(scan().min("vec_id"))
    got = scan().filter(expr=f"vec_id == {first}").take_all()
    first_vec = np.floor(
        np.asarray(got[0]["embedding"], dtype=np.float64) * QUANT
        + 0.5).astype(np.int64)
    rows = [(0, first, 0)]
    vecs = [first_vec]  # k x dim driver state (the chosen centers)
    for r in range(1, k):
        ref = _ray.put(np.stack(vecs))
        parts = scan().map_batches(
            _kcenter_partial, batch_format="pandas",
            fn_kwargs={"centers_ref": ref}).to_pandas()
        best = int(parts["d"].max())
        win = parts.loc[parts["d"] == best]
        win = win.loc[win["vec_id"] == win["vec_id"].min()].iloc[0]
        rows.append((r, int(win["vec_id"]), best))
        vecs.append(np.asarray(win["vec"], dtype=np.int64))

    return rd.from_arrow(pa.table({
        "sel_round": pa.array([r for r, _, _ in rows], pa.int64()),
        "vec_id": pa.array([v for _, v, _ in rows], pa.int64()),
        "dist_sq": pa.array([d for _, _, d in rows], pa.int64()),
    }))


def sql_embedding_kcenter(k: int = K_CENTERS) -> str:
    # list-kernel distances (list_sum over a 64-wide list_transform) —
    # the unnest-join formulation measured 22 s vs 0.09 s for identical
    # results at 500 vectors; every CTE is MATERIALIZED per the repo's
    # multi-arm unrolled-oracle invariant
    ctes = [f"""qa AS MATERIALIZED (
  SELECT vec_id,
         list_transform(embedding, x ->
           CAST(floor(CAST(x AS DOUBLE) * {QUANT}.0 + 0.5) AS BIGINT)) AS q
  FROM embeddings),
c0 AS MATERIALIZED (SELECT vec_id AS cid, q FROM qa
                    WHERE vec_id = (SELECT min(vec_id) FROM qa)),
m0 AS MATERIALIZED (
  SELECT a.vec_id,
         list_sum(list_transform(range(1, len(a.q) + 1),
                  i -> (a.q[i] - c.q[i]) * (a.q[i] - c.q[i]))) AS d
  FROM qa a CROSS JOIN c0 c)"""]
    sel = ["SELECT CAST(0 AS BIGINT) AS sel_round,"
           " (SELECT cid FROM c0) AS vec_id, CAST(0 AS BIGINT) AS dist_sq"]
    for r in range(1, k):
        ctes.append(f"""c{r} AS MATERIALIZED (
  SELECT m.vec_id AS cid, m.d, a.q
  FROM m{r - 1} m JOIN qa a ON a.vec_id = m.vec_id
  ORDER BY m.d DESC, m.vec_id LIMIT 1)""")
        sel.append(f"SELECT {r}, (SELECT cid FROM c{r}),"
                   f" CAST((SELECT d FROM c{r}) AS BIGINT)")
        if r < k - 1:
            ctes.append(f"""m{r} AS MATERIALIZED (
  SELECT m.vec_id,
         least(m.d, (SELECT list_sum(list_transform(range(1, len(a.q) + 1),
               i -> (a.q[i] - c.q[i]) * (a.q[i] - c.q[i])))
               FROM c{r} c)) AS d
  FROM m{r - 1} m JOIN qa a ON a.vec_id = m.vec_id)""")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(sel)


# ------------------------------------------ centroid drift (A/B halves)

def embedding_centroid_drift(sf_dir: str):
    """Per-label CENTROID DRIFT between the even- and odd-``vec_id``
    halves (the two-run / two-shard consistency probe an embedding
    pipeline publishes after a model or preprocessing change):
    -> (label, n_a, n_b, drift_l1_num, drift).

    Exactness: the L1 distance between the two half-centroids is
    evaluated WITHOUT forming means — drift_l1_num = sum_i
    |s1_i * n_b - s2_i * n_a| over QUANT-quantized int64 component sums
    (common-denominator cross-multiplication; magnitudes stay well under
    int64). ``drift`` = num / (n_a * n_b * QUANT) is the single float
    division. L1 (not L2) keeps every intermediate in int64 — the
    squared form would need int128 (the corr/HUGEINT class).

    Shape: one streaming pass of per-batch (label, dim) partial sums +
    count marker rows; the fold is (labels x dim)-bounded driver work —
    zero shuffles."""
    import ray.data as rd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(_matrix(b["embedding"]) * QUANT + 0.5).astype(
            np.int64)
        ids = b["vec_id"].to_numpy(np.int64)
        lab = b["label"].to_numpy(np.int64)
        even = ids % 2 == 0
        outs = []
        for lb in np.unique(lab):
            m = lab == lb
            s1 = q[m & even].sum(axis=0, dtype=np.int64)
            s2 = q[m & ~even].sum(axis=0, dtype=np.int64)
            d = len(s1)
            outs.append(pd.DataFrame({
                "label": np.full(d + 1, lb, dtype=np.int64),
                "i": np.r_[np.arange(d, dtype=np.int64), -1],
                "s1": np.r_[s1, int((m & even).sum())],
                "s2": np.r_[s2, int((m & ~even).sum())],
            }))
        return (pd.concat(outs, ignore_index=True) if outs
                else pd.DataFrame({"label": pd.Series([], dtype="int64"),
                                   "i": pd.Series([], dtype="int64"),
                                   "s1": pd.Series([], dtype="int64"),
                                   "s2": pd.Series([], dtype="int64")}))

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding", "label"])
    frames = list(ds.map_batches(partial, batch_format="pandas")
                  .iter_batches(batch_format="pandas", batch_size=None))
    agg = (pd.concat(frames, ignore_index=True)
           .groupby(["label", "i"], as_index=False)[["s1", "s2"]].sum())
    rows = []
    for lb, g in agg.groupby("label", sort=True):
        cnt = g.loc[g["i"] < 0]
        n_a = int(cnt["s1"].iloc[0])
        n_b = int(cnt["s2"].iloc[0])
        if n_a == 0 or n_b == 0:
            continue  # a half is empty: drift undefined (oracle matches)
        s = g.loc[g["i"] >= 0].sort_values("i")
        num = int(np.abs(s["s1"].to_numpy(np.int64) * n_b
                         - s["s2"].to_numpy(np.int64) * n_a).sum())
        rows.append((int(lb), n_a, n_b, num,
                     num / (n_a * n_b * QUANT)))  # one division
    return rd.from_arrow(pa.table({
        "label": pa.array([r[0] for r in rows], pa.int64()),
        "n_a": pa.array([r[1] for r in rows], pa.int64()),
        "n_b": pa.array([r[2] for r in rows], pa.int64()),
        "drift_l1_num": pa.array([r[3] for r in rows], pa.int64()),
        "drift": pa.array([r[4] for r in rows], pa.float64()),
    }))


def sql_embedding_centroid_drift() -> str:
    return f"""
WITH q AS (
  SELECT vec_id, label, generate_subscripts(embedding, 1) - 1 AS i,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * {QUANT}.0 + 0.5)
              AS BIGINT) AS v
  FROM embeddings
),
s AS (
  SELECT label, i,
         CAST(sum(CASE WHEN vec_id % 2 = 0 THEN v ELSE 0 END)
              AS BIGINT) AS s1,
         CAST(sum(CASE WHEN vec_id % 2 = 1 THEN v ELSE 0 END)
              AS BIGINT) AS s2
  FROM q GROUP BY label, i
),
n AS (
  SELECT label,
         CAST(count(*) FILTER (vec_id % 2 = 0) AS BIGINT) AS n_a,
         CAST(count(*) FILTER (vec_id % 2 = 1) AS BIGINT) AS n_b
  FROM embeddings GROUP BY label
)
SELECT CAST(s.label AS BIGINT) AS label, n.n_a, n.n_b,
       CAST(sum(abs(s.s1 * n.n_b - s.s2 * n.n_a)) AS BIGINT)
         AS drift_l1_num,
       1.0 * CAST(sum(abs(s.s1 * n.n_b - s.s2 * n.n_a)) AS BIGINT)
         / (n.n_a * n.n_b * {QUANT}) AS drift
FROM s JOIN n USING (label)
WHERE n.n_a > 0 AND n.n_b > 0
GROUP BY s.label, n.n_a, n.n_b"""


# ------------------------------------------------ silhouette evaluation

def embedding_silhouette(sf_dir: str, k: int = KMEANS_K,
                         iters: int = KMEANS_ITERS):
    """Per-vector simplified silhouette over the fitted k-means clusters
    -> (vec_id, cluster, a2, b2, s): a2 = squared distance to the OWN
    (nearest) centroid, b2 = squared distance to the best OTHER centroid,
    s = (b2 - a2) / max(a2, b2) — the centroid-based silhouette
    (Vendramin et al.'s simplified variant: O(n*k), never the O(n^2)
    pairwise form — the only silhouette a 100 TB table can afford).

    Exactness: both the vectors and the fitted centroids are quantized to
    the gram op's integer grid (floor(x * QUANT + 0.5)), so a2/b2 are
    EXACT int64 (dim * (2*QUANT)^2 ~ 2.8e14 << 2^63) and the assignment
    (argmin d2, ties -> lowest cluster) is decided in integer space —
    bit-identical to the oracle's row_number ordering with no float-tie
    hazard. s is the single float division (repo rule).

    Shape: the kmeans_fit rounds (centroid-bounded driver state), then
    ONE zero-shuffle scoring scan (k x dim broadcast in the closure)."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    C = kmeans_fit(emb, k, iters)
    Cq = np.floor(C * QUANT + 0.5).astype(np.int64)
    cn2 = (Cq * Cq).sum(axis=1)

    def score(b: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(_matrix(b["embedding"].to_numpy()) * QUANT
                     + 0.5).astype(np.int64)
        d2 = (q * q).sum(axis=1)[:, None] + cn2[None, :] - 2 * (q @ Cq.T)
        rows = np.arange(len(q))
        own = d2.argmin(axis=1)           # ties -> lowest cluster id
        a2 = d2[rows, own]
        masked = d2.copy()
        masked[rows, own] = np.iinfo(np.int64).max
        b2 = masked.min(axis=1)
        mx = np.maximum(a2, b2)
        s = np.where(mx == 0, 0.0,
                     (b2 - a2).astype(np.float64)
                     / np.maximum(mx, 1).astype(np.float64))
        return pd.DataFrame({
            "vec_id": b["vec_id"].astype("int64"),
            "cluster": own.astype(np.int64),
            "a2": a2, "b2": b2, "s": s,
        })

    return emb.map_batches(score, batch_format="pandas")


def _centroid_int_values_sql(Cq: np.ndarray) -> str:
    rows = []
    for j, c in enumerate(Cq):
        lit = ", ".join(str(int(x)) for x in c)
        rows.append(f"({j}, CAST([{lit}] AS BIGINT[]))")
    return ",\n    ".join(rows)


def embedding_outliers(sf_dir: str, k: int = KMEANS_K,
                       iters: int = KMEANS_ITERS, topn: int = 20):
    """Embedding-QA outlier report: the ``topn`` vectors FARTHEST from
    their own fitted k-means centroid -> (rk, vec_id, cluster, dist_sq)
    — the mislabeled/garbage-embedding screen a curation pipeline
    reviews before training. Same integer-grid exactness and
    zero-shuffle scoring scan as :func:`embedding_silhouette`, plus a
    per-block top-n cap before the single-block final sort."""
    emb = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    C = kmeans_fit(emb, k, iters)
    Cq = np.floor(C * QUANT + 0.5).astype(np.int64)
    cn2 = (Cq * Cq).sum(axis=1)

    by, asc = ["dist_sq", "vec_id"], [False, True]

    def score(b: pd.DataFrame) -> pd.DataFrame:
        q = np.floor(_matrix(b["embedding"].to_numpy()) * QUANT
                     + 0.5).astype(np.int64)
        d2 = (q * q).sum(axis=1)[:, None] + cn2[None, :] - 2 * (q @ Cq.T)
        own = d2.argmin(axis=1)
        out = pd.DataFrame({
            "vec_id": b["vec_id"].astype("int64"),
            "cluster": own.astype(np.int64),
            "dist_sq": d2[np.arange(len(q)), own],
        })
        return out.sort_values(by, ascending=asc,
                               kind="mergesort").head(topn)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(by, ascending=asc, kind="mergesort").head(topn)
        b = b.reset_index(drop=True)
        b["rk"] = np.arange(1, len(b) + 1)
        return b[["rk", "vec_id", "cluster", "dist_sq"]]

    return (emb.map_batches(score, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def sql_embedding_outliers(C: np.ndarray, topn: int = 20) -> str:
    """Oracle for :func:`embedding_outliers` — own-centroid distance
    from the sequential fit's quantized centroid literals, global
    top-n."""
    Cq = np.floor(C * QUANT + 0.5).astype(np.int64)
    return f"""
WITH cq(cluster, ce) AS (VALUES
    {_centroid_int_values_sql(Cq)}
),
q AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
           x -> CAST(floor(x * {QUANT}.0 + 0.5) AS BIGINT)) AS qv
  FROM embeddings),
d AS (
  SELECT q.vec_id, c.cluster,
         CAST(list_sum(list_transform(range(1, len(qv) + 1),
           i -> (qv[i] - ce[i]) * (qv[i] - ce[i]))) AS BIGINT) AS d2
  FROM q CROSS JOIN cq c),
a AS (
  SELECT vec_id, cluster, d2 FROM (
    SELECT vec_id, cluster, d2,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY d2, cluster) AS rn
    FROM d) WHERE rn = 1)
SELECT rk, vec_id, cluster, dist_sq FROM (
  SELECT row_number() OVER (ORDER BY d2 DESC, vec_id) AS rk,
         vec_id, cluster, d2 AS dist_sq
  FROM a
) WHERE rk <= {topn}"""


def sql_embedding_silhouette(C: np.ndarray) -> str:
    """Oracle: centroids from the INDEPENDENT sequential fit, quantized to
    the same integer grid; distances, assignment and the silhouette ratio
    recomputed entirely inside DuckDB."""
    Cq = np.floor(C * QUANT + 0.5).astype(np.int64)
    return f"""
WITH cq(cluster, ce) AS (VALUES
    {_centroid_int_values_sql(Cq)}
),
q AS (
  SELECT vec_id,
         list_transform(CAST(embedding AS DOUBLE[]),
           x -> CAST(floor(x * {QUANT}.0 + 0.5) AS BIGINT)) AS qv
  FROM embeddings),
d AS (
  SELECT q.vec_id, c.cluster,
         CAST(list_sum(list_transform(range(1, len(qv) + 1),
           i -> (qv[i] - ce[i]) * (qv[i] - ce[i]))) AS BIGINT) AS d2
  FROM q CROSS JOIN cq c),
r AS (
  SELECT vec_id, cluster, d2,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY d2, cluster) AS rn
  FROM d),
a AS (SELECT vec_id, cluster, d2 AS a2 FROM r WHERE rn = 1),
b AS (SELECT vec_id, min(d2) AS b2 FROM r WHERE rn > 1 GROUP BY vec_id)
SELECT a.vec_id, a.cluster, CAST(a.a2 AS BIGINT) AS a2,
       CAST(b.b2 AS BIGINT) AS b2,
       CASE WHEN greatest(a.a2, b.b2) = 0 THEN 0.0
            ELSE CAST(b.b2 - a.a2 AS DOUBLE) / greatest(a.a2, b.b2)
       END AS s
FROM a JOIN b ON a.vec_id = b.vec_id"""
