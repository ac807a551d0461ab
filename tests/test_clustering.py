"""Distributed k-means: bit-identity with the sequential oracle fit,
planted-cluster recovery, and SemDeDup pair sanity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from robokop_build_ray.stages import clustering as cl

SF = "/root/testdata/sf0.001"


def test_distributed_fit_bit_identical_to_sequential():
    emb = rd.read_parquet(f"{SF}/embeddings.parquet",
                          columns=["vec_id", "embedding"])
    C_dist = cl.kmeans_fit(emb, k=4, iters=3)
    C_seq = cl.kmeans_fit_sequential(SF, k=4, iters=3)
    # quantized integer partial sums make merge order irrelevant: the
    # distributed and single-process fits must agree to the last bit
    assert np.array_equal(C_dist, C_seq)


def test_planted_clusters_recovered(tmp_path):
    rng = np.random.default_rng(7)
    centers = np.array([[10.0, 0.0], [-10.0, 0.0], [0.0, 10.0]])
    pts = np.concatenate(
        [c + 0.1 * rng.standard_normal((20, 2)) for c in centers]
    ).astype(np.float32)
    # put one point of each planted cluster first so init picks 3 seeds
    order = np.r_[0, 20, 40, np.setdiff1d(np.arange(60), [0, 20, 40])]
    pts = pts[order]
    t = pa.table({
        "vec_id": pa.array(range(60), pa.int64()),
        "embedding": pa.array([list(map(float, p)) for p in pts],
                              pa.list_(pa.float32())),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    out = cl.embedding_kmeans(str(tmp_path), k=3, iters=4).to_pandas()
    df = out.sort_values("vec_id").reset_index(drop=True)
    groups = np.repeat([0, 1, 2], 20)[order]
    for g in range(3):
        assigned = df.loc[groups == g, "cluster"]
        assert assigned.nunique() == 1  # each planted cluster stays whole


def test_semantic_dedup_finds_planted_near_dup(tmp_path):
    rng = np.random.default_rng(3)
    base = rng.standard_normal((30, 8)).astype(np.float32)
    base[1] = base[0] + 0.001  # planted near-duplicate of row 0
    t = pa.table({
        "vec_id": pa.array(range(30), pa.int64()),
        "embedding": pa.array([list(map(float, p)) for p in base],
                              pa.list_(pa.float32())),
    })
    pq.write_table(t, tmp_path / "embeddings.parquet")
    pairs = cl.semantic_dedup_pairs(str(tmp_path), threshold=0.95,
                                    k=4, iters=3).to_pandas()
    assert (0, 1) in set(zip(pairs["id_a"], pairs["id_b"]))


def test_embedding_gram_order_independent(ray_session, tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    M = rng.normal(scale=0.2, size=(40, 5)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(40), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in M],
                              pa.list_(pa.float32())),
        "label": pa.array(["x"] * 40, pa.string()),
    }), tmp_path / "embeddings.parquet")
    from robokop_build_ray.stages.clustering import QUANT, embedding_gram

    got = {(r["i"], r["j"]): r["gram"]
           for r in embedding_gram(str(tmp_path)).take_all()}
    Q = np.floor(M.astype(np.float64) * QUANT + 0.5).astype(np.int64)
    G = Q.T @ Q
    want = {(i, j): int(G[i, j]) for i in range(5) for j in range(5)
            if j >= i}
    assert got == want


def test_embedding_rp_exact_and_balanced(ray_session, tmp_path):
    import pyarrow.parquet as pq

    rng = np.random.default_rng(11)
    M = rng.normal(scale=0.2, size=(30, 6)).astype(np.float32)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(30), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in M],
                              pa.list_(pa.float32())),
        "label": pa.array(["x"] * 30, pa.string()),
    }), tmp_path / "embeddings.parquet")
    from robokop_build_ray.stages.clustering import (
        QUANT, _rp_signs, embedding_rp)

    got = {(r["vec_id"], r["k"]): r["proj"]
           for r in embedding_rp(str(tmp_path), out_dim=4).take_all()}
    S = _rp_signs(6, 4)
    assert set(np.unique(S)) == {-1, 1}  # both signs present
    Q = np.floor(M.astype(np.float64) * QUANT + 0.5).astype(np.int64)
    P = Q @ S.T
    want = {(v, k): int(P[v, k]) for v in range(30) for k in range(4)}
    assert got == want
