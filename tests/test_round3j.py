"""Unit tests for the session-J operators: exact skewness/kurtosis,
type x hour mutual information, per-user entropy, Markov conditional
entropy, distinct-n-gram diversity, source vocabulary Jaccard, Zipf fit,
simplified silhouette, and video scene-cut detection."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from robokop_build_ray.pipelines import relational as rel
from robokop_build_ray.pipelines import temporal as tmp


def _write_events(dirp, rows):
    df = pd.DataFrame(rows)
    t = pa.table({
        "event_id": pa.array(df["event_id"], pa.int64()),
        "ts": pa.array(df["ts_us"], pa.timestamp("us")),
        "user_id": pa.array(df["user_id"], pa.int64()),
        "event_type": pa.array(df["event_type"], pa.string()),
        "value": pa.array(df["value"], pa.float64()),
    })
    pq.write_table(t, f"{dirp}/events.parquet")


def _write_docs(dirp, rows):
    df = pd.DataFrame(rows)
    t = pa.table({
        "doc_id": pa.array(df["doc_id"], pa.int64()),
        "text": pa.array(df["text"], pa.string()),
        "lang": pa.array(df.get("lang", ["en"] * len(df)), pa.string()),
        "source": pa.array(df["source"], pa.string()),
        "n_chars": pa.array(df["text"].str.len(), pa.int64()),
    })
    pq.write_table(t, f"{dirp}/documents.parquet")


H = 3600 * 1_000_000


def test_skewkurt_matches_moment_formula(tmp_path):
    # hand series per type 'a': values 1.00, 2.00, 2.00, 7.00 dollars
    vals = [1.00, 2.00, 2.00, 7.00]
    _write_events(tmp_path, [
        {"event_id": i, "ts_us": i * H, "user_id": 1,
         "event_type": "a", "value": v} for i, v in enumerate(vals)
    ] + [  # constant-value type 'b' must be EXCLUDED (zero variance)
        {"event_id": 10 + i, "ts_us": i * H, "user_id": 2,
         "event_type": "b", "value": 3.00} for i in range(3)
    ])
    out = rel.events_value_skewkurt(str(tmp_path)).to_pandas()
    assert list(out["event_type"]) == ["a"]
    y = np.array([100, 200, 200, 700], dtype=np.float64)
    m = y.mean()
    m2 = ((y - m) ** 2).mean()
    m3 = ((y - m) ** 3).mean()
    m4 = ((y - m) ** 4).mean()
    assert out["n_events"][0] == 4
    assert abs(out["skewness"][0] - m3 / m2 ** 1.5) < 1e-9
    assert abs(out["kurtosis"][0] - (m4 / m2 ** 2 - 3.0)) < 1e-9


def test_type_hour_mi_independent_and_determined(tmp_path):
    # independent grid: every (type, hour) cell equal count -> MI == 0
    rows = []
    eid = 0
    for t in ("a", "b"):
        for h in (0, 1):
            for _ in range(5):
                rows.append({"event_id": eid, "ts_us": h * H,
                             "user_id": 1, "event_type": t, "value": 1.0})
                eid += 1
    _write_events(tmp_path, rows)
    out = rel.events_type_hour_mi(str(tmp_path)).to_pandas()
    assert out["n_events"][0] == 20
    assert abs(out["mi"][0]) < 1e-12
    assert abs(out["h_type"][0] - math.log(2)) < 1e-12
    # fully determined: type == hour -> MI == H(type)
    d2 = tmp_path / "d2"
    d2.mkdir()
    rows = []
    for i, (t, h) in enumerate([("a", 0)] * 5 + [("b", 1)] * 5):
        rows.append({"event_id": i, "ts_us": h * H, "user_id": 1,
                     "event_type": t, "value": 1.0})
    _write_events(d2, rows)
    out2 = rel.events_type_hour_mi(str(d2)).to_pandas()
    assert abs(out2["mi"][0] - out2["h_type"][0]) < 1e-12


def test_user_entropy_values(tmp_path):
    # user 1: uniform over 2 types -> ln 2; user 2: single type -> 0
    _write_events(tmp_path, [
        {"event_id": 0, "ts_us": 0, "user_id": 1, "event_type": "a",
         "value": 1.0},
        {"event_id": 1, "ts_us": H, "user_id": 1, "event_type": "b",
         "value": 1.0},
        {"event_id": 2, "ts_us": 0, "user_id": 2, "event_type": "a",
         "value": 1.0},
    ])
    out = (rel.events_user_entropy(str(tmp_path)).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert abs(out["entropy"][0] - math.log(2)) < 1e-12
    assert out["n_types"][0] == 2
    assert out["entropy"][1] == 0.0
    assert out["n_types"][1] == 1


def test_markov_conditional_entropy(tmp_path):
    # deterministic chain a->b->a->b per user -> H(next|prev) == 0
    rows = []
    for i in range(6):
        rows.append({"event_id": i, "ts_us": i * H, "user_id": 1,
                     "event_type": "ab"[i % 2], "value": 1.0})
    _write_events(tmp_path, rows)
    out = tmp.events_markov_entropy(str(tmp_path)).to_pandas()
    assert out["n_transitions"][0] == 5
    assert abs(out["h_cond"][0]) < 1e-12
    assert abs(out["h_joint"][0] - out["h_from"][0]) < 1e-12


def test_distinct_ngrams_diversity(tmp_path):
    from robokop_build_ray.stages.vocab import distinct_ngrams

    import ray.data as rd

    _write_docs(tmp_path, pd.DataFrame({
        "doc_id": [0, 1, 2],
        # srcA: "a b c a b c" -> grams: abc bca cab abc (4 total 3 distinct)
        # srcB: two docs "x y z" (1 gram each, identical) -> 2 total 1 dist
        "text": ["a b c a b c", "x y z", "x y z"],
        "source": ["srcA", "srcB", "srcB"],
    }))
    docs = rd.read_parquet(f"{tmp_path}/documents.parquet")
    out = (distinct_ngrams(docs).to_pandas()
           .sort_values("source").reset_index(drop=True))
    assert list(out["source"]) == ["srcA", "srcB"]
    assert list(out["total_ngrams"]) == [4, 2]
    assert list(out["distinct_ngrams"]) == [3, 1]
    assert abs(out["diversity"][0] - 0.75) < 1e-12
    # unigram edge case (the n>=2 slice arithmetic would emit nothing):
    # srcA has 6 tokens 3 distinct, srcB 6 tokens 3 distinct
    uni = (distinct_ngrams(docs, n=1).to_pandas()
           .sort_values("source").reset_index(drop=True))
    assert list(uni["total_ngrams"]) == [6, 6]
    assert list(uni["distinct_ngrams"]) == [3, 3]


def test_source_vocab_jaccard(tmp_path):
    from robokop_build_ray.stages.vocab import source_vocab_jaccard

    import ray.data as rd

    _write_docs(tmp_path, pd.DataFrame({
        "doc_id": [0, 1],
        "text": ["a b c", "b c d e"],
        "source": ["s1", "s2"],
    }))
    docs = rd.read_parquet(f"{tmp_path}/documents.parquet")
    out = source_vocab_jaccard(docs).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["src_a"], r["src_b"]) == ("s1", "s2")
    assert (r["n_a"], r["n_b"], r["n_common"]) == (3, 4, 2)
    assert abs(r["jaccard"] - 2.0 / 5.0) < 1e-12


def test_zipf_fit_exact_power_law(tmp_path):
    from robokop_build_ray.stages.vocab import zipf_fit

    import ray.data as rd

    # frequencies tf(rank) = round(64 / rank) for 4 terms: exact -1 slope
    # is only approximate after rounding, so fit tf = 8 / rank exactly:
    # t1 x8, t2 x4, t3 x2, t4 x1 with halving -> slope = -1 in log2 and
    # in ln space slope = ln(tf2/tf1)/ln(2/1) = -1 exactly? ln tf = ln 8
    # - rank-log... use tf = {8, 4, 2, 1} at ranks {1, 2, 4, 8}? ranks are
    # consecutive ints, so use the regression itself as the check: y =
    # ln(8) - 1.0 * ln(rank) only when tf(rank) = 8 / rank at ranks
    # 1, 2, 4, 8 — not consecutive. Instead check against numpy polyfit.
    words = (["alpha"] * 8) + (["beta"] * 4) + (["gamma"] * 2) + ["delta"]
    _write_docs(tmp_path, pd.DataFrame({
        "doc_id": [0], "text": [" ".join(words)], "source": ["s"],
    }))
    docs = rd.read_parquet(f"{tmp_path}/documents.parquet")
    out = zipf_fit(docs, k=4).to_pandas()
    x = np.log(np.arange(1, 5, dtype=np.float64))
    y = np.log(np.array([8, 4, 2, 1], dtype=np.float64))
    slope_ref, icpt_ref = np.polyfit(x, y, 1)
    assert out["k"][0] == 4
    assert abs(out["slope"][0] - slope_ref) < 1e-9
    assert abs(out["intercept"][0] - icpt_ref) < 1e-9


def test_silhouette_separated_clusters(tmp_path):
    from robokop_build_ray.stages.clustering import embedding_silhouette

    # two tight, well-separated blobs in 4-d; k=2, 1 iter is enough
    rng = np.random.RandomState(0)
    a = rng.uniform(-0.01, 0.01, (6, 4)) + np.array([1, 0, 0, 0])
    b = rng.uniform(-0.01, 0.01, (6, 4)) + np.array([-1, 0, 0, 0])
    vecs = np.vstack([a, b]).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(12), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 6 + [1] * 6, pa.int32()),
    })
    pq.write_table(t, f"{tmp_path}/embeddings.parquet")
    out = embedding_silhouette(str(tmp_path), k=2, iters=3).to_pandas()
    assert len(out) == 12
    # well-separated tight blobs: silhouette near 1 everywhere
    assert (out["s"] > 0.95).all()
    assert (out["b2"] > out["a2"]).all()
    # blob membership must map to one cluster each
    by = out.sort_values("vec_id")["cluster"].to_numpy()
    assert len(set(by[:6])) == 1 and len(set(by[6:])) == 1
    assert by[0] != by[6]


def test_video_scenecut_planted_cut():
    import ray.data as rd

    from robokop_build_ray.stages import multimodal as mm

    # 4 near-identical dark frames, then 3 bright checker frames:
    # exactly one cut at the transition (frame_idx == 4)
    dark = np.zeros((16, 16, 3), dtype=np.uint8)
    rng = np.random.RandomState(1)
    bright = (rng.randint(0, 2, (16, 16, 1)) * 255).astype(
        np.uint8).repeat(3, axis=2)
    frames = [dark.copy() for _ in range(4)] + [bright.copy()
                                                for _ in range(3)]
    payload = mm.encode_avi_mjpeg(frames, fps=5, quality=90)
    media = rd.from_arrow(pa.table({
        "media_id": pa.array([7], pa.int64()),
        "kind": pa.array(["video"], pa.string()),
        "mime": pa.array([mm.AVI_MIME], pa.string()),
        "payload": pa.array([payload], pa.binary()),
    }))
    out = (mm.video_scenecuts(media).to_pandas()
           .sort_values("frame_idx").reset_index(drop=True))
    assert len(out) == 6
    cuts = out[out["is_cut"]]
    assert list(cuts["frame_idx"]) == [4]
    # steady segments hash identically after decode round-trip
    assert (out[out["frame_idx"] != 4]["hamming"] <= 4).all()
