"""Round-5 directives: zero-row driver stability, bucketed exact dedup,
tiled/capped embedding cosine blocks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _rng(seed: int) -> np.random.Generator:
    return np.random.default_rng(seed)


def _emb_frame(n: int, label: int, dim: int = 8, seed: int = 0,
               id0: int = 0) -> pd.DataFrame:
    M = _rng(seed).normal(size=(n, dim))
    return pd.DataFrame({
        "vec_id": np.arange(id0, id0 + n, dtype=np.int64),
        "embedding": list(M.astype(np.float64)),
        "label": np.full(n, label, dtype=np.int64),
    })


def _pairs_reference(df: pd.DataFrame, threshold: float) -> set:
    """Direct per-label all-pairs cosine (the pre-round-5 semantics)."""
    out = set()
    for _, g in df.groupby("label"):
        g = g.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        M = np.stack(g["embedding"].to_numpy()).astype(np.float64)
        M = M / np.clip(np.linalg.norm(M, axis=1, keepdims=True),
                        1e-12, None)
        S = M @ M.T
        ii, jj = np.triu_indices(len(ids), k=1)
        for a, b in zip(ids[ii[S[ii, jj] >= threshold]],
                        ids[jj[S[ii, jj] >= threshold]]):
            out.add((int(a), int(b)))
    return out


def test_embedding_cosine_tiled_matches_direct():
    """Tiling (tile smaller than the block) must not change the pair set."""
    from robokop_build_ray.stages.dedup import embedding_cosine_pairs

    df = pd.concat([_emb_frame(37, 0, seed=1),
                    _emb_frame(23, 1, seed=2, id0=100),
                    _emb_frame(1, 2, seed=3, id0=500)], ignore_index=True)
    want = _pairs_reference(df, 0.3)
    got = embedding_cosine_pairs(rd.from_pandas(df), threshold=0.3,
                                 tile=8, n_buckets=4).to_pandas()
    assert set(zip(got["id_a"], got["id_b"])) == want
    assert len(got) == len(want)


def test_embedding_cosine_hot_block_cap():
    """A planted hot cluster larger than block_cap is truncated to its
    smallest vec_ids (deterministic, warned) — the EMB_BLOCK_CAP contract
    mirrored in the oracle's rk <= cap."""
    from robokop_build_ray.stages.dedup import embedding_cosine_pairs

    df = _emb_frame(50, 7, seed=4)
    capped = _pairs_reference(df.iloc[:30], 0.2)
    # (the truncation warning fires inside the Ray worker — semantics
    # only here)
    got = embedding_cosine_pairs(
        rd.from_pandas(df), threshold=0.2, tile=16, n_buckets=2,
        block_cap=30).to_pandas()
    assert set(zip(got["id_a"], got["id_b"])) == capped


def test_exact_dedup_bucketed_semantics():
    """Bucketed exact_dedup == one survivor (min doc_id) per fingerprint,
    checked against a driver-side pandas recompute on real tier docs."""
    from robokop_build_ray.stages.dedup import exact_dedup
    from robokop_build_ray.stages.text_analysis import fingerprint_batch

    docs = rd.read_parquet(f"{SF}/documents.parquet",
                           columns=["doc_id", "text"])
    got = sorted(exact_dedup(docs, n_buckets=8).to_pandas()["doc_id"])
    pdf = docs.to_pandas()
    fp = fingerprint_batch(pdf)
    want = sorted(fp.groupby("fingerprint")["doc_id"].min())
    assert got == want


def test_driver_stable_zero_row_keeps_schema():
    """_driver_stable hands the driver a typed Arrow table at 0 rows —
    to_pandas() keeps every column (the CORRECTNESS_r04 red path)."""
    import __ray_entry__ as e

    # mirror the repo's real zero-row pattern: an all-filtered map output
    # unioned with a typed Arrow seed (the CLAUDE zero-row invariant)
    seed = rd.from_arrow(pa.table({
        "a": pa.array([], pa.string()),
        "n": pa.array([], pa.int64())}))
    src = rd.from_pandas(pd.DataFrame({"a": ["x"], "n": [1]}))
    empty = src.map_batches(
        lambda t: t.filter(pa.array([False] * len(t))),
        batch_format="pyarrow").union(seed)
    out = e._driver_stable(lambda sf: empty)("unused")
    assert isinstance(out, pa.Table)
    pdf = out.to_pandas()
    assert list(pdf.columns) == ["a", "n"]
    assert len(pdf) == 0


def test_driver_stable_nonempty_passthrough():
    import __ray_entry__ as e

    ds = rd.from_pandas(pd.DataFrame({"x": [1, 2, 3]}))
    out = e._driver_stable(lambda sf: ds)("unused")
    assert sorted(out.to_pandas()["x"]) == [1, 2, 3]


def test_nodes_with_contexts_list_column():
    """The exported node table carries contexts as list<int32> — nodes on
    the path get their sorted positions, off-path nodes an empty list
    (`builder/builder.py:381,396` semantics)."""
    import ray
    import pyarrow as pa

    from robokop_build_ray.pipelines.kg_build import (nodes_with_contexts,
                                                      path_node_contexts)

    types = {"C:1": "chemical_substance", "G:1": "gene", "D:1": "disease",
             "G:2": "gene"}
    canonical = rd.from_pandas(pd.DataFrame({
        "subj_id": ["C:1", "G:1", "G:2"],
        "obj_id": ["G:1", "D:1", "G:1"]}))
    info_ref = ray.put({k: ("n", v) for k, v in types.items()})
    ctx = path_node_contexts(canonical, "SGD", info_ref,
                             n_buckets=4).to_pandas()
    got = {(r.id, r.pos) for r in ctx.itertuples()}
    # complete SGD instance: C:1 - G:1 - D:1 only (G:2 has no disease nb)
    assert got == {("C:1", 0), ("G:1", 1), ("D:1", 2)}
    nodes = rd.from_arrow(pa.table({
        "id": pa.array(["C:1", "G:1", "G:2", "D:1"], pa.string())}))
    out = nodes_with_contexts(nodes, canonical, "SGD", info_ref,
                              n_buckets=4).to_pandas()
    m = dict(zip(out["id"], out["contexts"]))
    assert list(m["C:1"]) == [0] and list(m["G:1"]) == [1]
    assert list(m["G:2"]) == [] and list(m["D:1"]) == [2]


def test_extract_sentence_path_matches_finditer():
    """The C sentence fast path is bit-identical to the generic finditer
    fallback — corpus shapes plus adversarial edges (no trailing
    terminator, multi-sentence, multi-match, newline, null, empty)."""
    import pyarrow as pa

    from robokop_build_ray.stages.extract import (DEFAULT_RULE, ExtractRule,
                                                  TRIPLE_REGEX,
                                                  extract_triples_batch)

    texts = [
        "Aspirin treats headache. Sounds good, thanks.",
        "A treats B. C causes D. E interacts with F.",
        "No predicates here at all",
        "Dangling X treats Y",          # no terminator -> no match
        "X is associated with Y.\nAnd X causes Z.",
        None,
        "",
        "Multi, part-name interacts with other-name2. filler.",
        "a treats b period missing",
        "Aspirin treats headache, severe. ok.",
    ]
    batch = pa.table({
        "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
        "turn_idx": pa.array(list(range(len(texts))), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    fallback_rule = ExtractRule(
        "fallback", TRIPLE_REGEX, dict(DEFAULT_RULE.phrase_to_pred))
    assert fallback_rule.sentence_regex is None
    fast = extract_triples_batch(batch, (DEFAULT_RULE,)).to_pandas()
    slow = extract_triples_batch(batch, (fallback_rule,)).to_pandas()
    cols = list(fast.columns)
    fast = fast.sort_values(cols, ignore_index=True)
    slow = slow.sort_values(cols, ignore_index=True)
    pd.testing.assert_frame_equal(fast, slow)
    assert len(fast) > 0


def test_edges_stage_coded_equals_string_path():
    """The coded edges exchange (packed int64 keys, post-exchange pub
    reconstruction) is row-for-row identical to the string path on real
    tier data — schema, publications order, mention counts."""
    import ray

    from robokop_build_ray.pipelines.kg_build import build_graph
    from robokop_build_ray.stages.canonicalize import edges_stage

    graph = build_graph(SF, materialize_intermediate=True,
                        include_support=False)
    canonical = graph["canonical"]
    codes_ref = graph["state"].extras["entity_codes_ref"]
    coded = edges_stage(canonical, n_buckets=8,
                        entity_codes_ref=codes_ref).to_pandas()
    plain = edges_stage(canonical, n_buckets=8).to_pandas()
    for df in (coded, plain):
        df["publications"] = df["publications"].map(tuple)
    cols = list(coded.columns)
    coded = coded.sort_values(["subj_id", "pred_id", "obj_id"],
                              ignore_index=True)[cols]
    plain = plain.sort_values(["subj_id", "pred_id", "obj_id"],
                              ignore_index=True)[cols]
    pd.testing.assert_frame_equal(coded, plain)
    assert len(coded) > 0
