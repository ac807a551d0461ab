"""Unit tests for the session-I operators: LOCF grid resampling,
debounce throttle filter, trigram sequence mining, seasonal residual
outliers, and interpolated p95."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from robokop_build_ray.pipelines import relational as rel
from robokop_build_ray.pipelines import temporal as tmp


def _write_events(dirp, rows):
    df = pd.DataFrame(rows)
    # real testdata carries timestamp[us] — match it exactly
    t = pa.table({
        "event_id": pa.array(df["event_id"], pa.int64()),
        "ts": pa.array(df["ts_us"], pa.timestamp("us")),
        "user_id": pa.array(df["user_id"], pa.int64()),
        "event_type": pa.array(df["event_type"], pa.string()),
        "value": pa.array(df["value"], pa.float64()),
    })
    pq.write_table(t, f"{dirp}/events.parquet")


H = 3600 * 1_000_000  # one hour in us


def test_resample_locf_and_ties(tmp_path):
    # user 1: events at t=30m (c=100), 90m (c=200) and a SAME-ts tie at
    # 90m with higher event_id (c=250) -> grid (step 1h) points at 1h, 2h
    # (span 30m..150m); 1h carries 100, 2h carries the TIE WINNER 250.
    # user 2: single event exactly ON a grid point (t=2h, c=700) -> one
    # grid row at 2h with its own value (ts <= grid inclusive).
    _write_events(tmp_path, [
        {"event_id": 1, "ts_us": 30 * 60 * 1_000_000, "user_id": 1,
         "event_type": "view", "value": 1.00},
        {"event_id": 2, "ts_us": 90 * 60 * 1_000_000, "user_id": 1,
         "event_type": "view", "value": 2.00},
        {"event_id": 3, "ts_us": 90 * 60 * 1_000_000, "user_id": 1,
         "event_type": "view", "value": 2.50},
        {"event_id": 4, "ts_us": 150 * 60 * 1_000_000, "user_id": 1,
         "event_type": "view", "value": 9.99},
        {"event_id": 5, "ts_us": 2 * H, "user_id": 2,
         "event_type": "view", "value": 7.00},
    ])
    got = (tmp.events_user_resample(str(tmp_path), step_us=H)
           .to_pandas().sort_values(["user_id", "grid_ts_us"])
           .reset_index(drop=True))
    assert got["user_id"].tolist() == [1, 1, 2]
    assert got["grid_ts_us"].tolist() == [H, 2 * H, 2 * H]
    assert got["value_cents"].tolist() == [100, 250, 700]


def test_debounce_lag_semantics(tmp_path):
    # stream (u1, view): t=0 keep, t=0+30m drop, t=30m+25h keep (gap to
    # PREVIOUS event, not previous kept). Other type is independent.
    m = 60 * 1_000_000
    _write_events(tmp_path, [
        {"event_id": 1, "ts_us": 0 * m, "user_id": 1,
         "event_type": "view", "value": 1.0},
        {"event_id": 2, "ts_us": 30 * m, "user_id": 1,
         "event_type": "view", "value": 1.0},
        {"event_id": 3, "ts_us": 30 * m + 25 * 60 * m, "user_id": 1,
         "event_type": "view", "value": 1.0},
        {"event_id": 4, "ts_us": 5 * m, "user_id": 1,
         "event_type": "click", "value": 1.0},
    ])
    got = tmp.events_debounced(str(tmp_path)).to_pandas()
    assert sorted(got["event_id"].tolist()) == [1, 3, 4]


def test_trigrams_counts(tmp_path):
    # u1 sequence A B A B -> (A,B,A), (B,A,B); u2 sequence A B A ->
    # (A,B,A) again => {(A,B,A): 2, (B,A,B): 1}
    rows = []
    eid = 0
    for uid, seq in ((1, "ABAB"), (2, "ABA")):
        for i, ch in enumerate(seq):
            eid += 1
            rows.append({"event_id": eid, "ts_us": i * H, "user_id": uid,
                         "event_type": ch, "value": 1.0})
    _write_events(tmp_path, rows)
    got = (tmp.events_user_trigrams(str(tmp_path)).to_pandas()
           .set_index(["t1", "t2", "t3"])["n"].to_dict())
    assert got == {("A", "B", "A"): 2, ("B", "A", "B"): 1}


def test_seasonal_outliers_integer_rule(tmp_path):
    # hour 0 / type A cell: values 1.00, 1.00, 4.00 -> sum 600c, n=3,
    # flag iff cents*3*2 > 3*600 i.e. cents > 300 -> only the 4.00 event.
    _write_events(tmp_path, [
        {"event_id": i + 1, "ts_us": i * 60 * 1_000_000, "user_id": 1,
         "event_type": "A", "value": v}
        for i, v in enumerate([1.0, 1.0, 4.0])
    ])
    got = tmp.events_seasonal_outliers(str(tmp_path)).to_pandas()
    assert got["event_id"].tolist() == [3]
    assert got["value_cents"].tolist() == [400]


def test_p95_interpolation_exact(tmp_path):
    # one type, n=5 values 10..50 dollars: pos=(5-1)*0.95=3.8 ->
    # lo=3 (40.00), r=16 -> x20 = 4000*4 + 5000*16 = 96000 (=48.00)
    _write_events(tmp_path, [
        {"event_id": i + 1, "ts_us": i * H, "user_id": 1,
         "event_type": "A", "value": 10.0 * (i + 1)}
        for i in range(5)
    ])
    got = rel.events_value_p95(str(tmp_path)).to_pandas()
    assert got["p95_x20_cents"].tolist() == [96000]
    assert got["p95"].tolist() == [48.0]


def _write_docs(dirp, texts):
    pq.write_table(pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "source": pa.array(["s"] * len(texts), pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }), f"{dirp}/documents.parquet")


def test_textrank_graph_and_ranks(tmp_path):
    # "foo bar foo" + "bar baz ok": edges foo-bar (x2, distinct once),
    # bar-baz; "ok" is 2 chars -> filtered; "baz ok" pair dropped.
    from robokop_build_ray.stages.vocab import doc_textrank

    _write_docs(tmp_path, ["foo bar foo", "bar baz ok"])
    got = (doc_textrank(str(tmp_path)).to_pandas()
           .sort_values("id").reset_index(drop=True))
    assert got["id"].tolist() == ["bar", "baz", "foo"]
    # undirected graph: bar has degree 2, foo/baz degree 1 -> bar ranks
    # strictly highest; foo == baz by symmetry
    r = dict(zip(got["id"], got["rank_units"]))
    assert r["bar"] > r["foo"] == r["baz"]


def test_kcenter_greedy_farthest(tmp_path):
    # 1-D embeddings at 0, 1, 10, 11 (padded to dim 4): start at vec 1
    # (value 0); farthest is 11 (vec 4); then max-min-dist point is 1
    # (vec 2, d=1) vs 10 (d=1) -> tie on distance? d(10)=min(100,1)=1,
    # d(1)=min(1,100)=1 -> tie -> smaller vec_id 2 wins.
    from robokop_build_ray.stages.clustering import QUANT, embedding_kcenter

    vals = [0.0, 1.0, 10.0, 11.0]
    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "embedding": pa.array([[v, 0.0, 0.0, 0.0] for v in vals],
                              pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0, 0], pa.int32()),
    }), f"{tmp_path}/embeddings.parquet")
    got = embedding_kcenter(str(tmp_path), k=3).to_pandas()
    assert got["vec_id"].tolist() == [1, 4, 2]
    assert got["dist_sq"].tolist() == [0, 121 * QUANT * QUANT,
                                       1 * QUANT * QUANT]


def test_mmr_prefers_diverse_over_redundant(tmp_path):
    # query = vec 1 [1,0]; candidates: 2 [2,0] (most relevant), 3 [1.5,0]
    # (relevant but redundant with 2), 4 [0,1] (orthogonal/diverse).
    # Round 0 picks 2 (pure relevance); round 1: score(3) = 1.5 - 3 < 0
    # while score(4) = 0 - 0 = 0 -> the diverse 4 beats the redundant 3.
    from robokop_build_ray.stages.clustering import QUANT, embedding_mmr

    vecs = {1: [1.0, 0.0], 2: [2.0, 0.0], 3: [1.5, 0.0], 4: [0.0, 1.0]}
    pq.write_table(pa.table({
        "vec_id": pa.array(sorted(vecs), pa.int64()),
        "embedding": pa.array([vecs[i] + [0.0, 0.0] for i in sorted(vecs)],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 4, pa.int32()),
    }), f"{tmp_path}/embeddings.parquet")
    got = embedding_mmr(str(tmp_path), k=3).to_pandas()
    assert got["vec_id"].tolist() == [2, 4, 3]
    q2 = QUANT * QUANT
    assert got["mmr_x2"].tolist() == [2 * q2, 0, -(3 * q2) // 2]


def test_length_ks_one_vs_rest(tmp_path):
    # src a lengths {1,2}, src b lengths {3,4}: perfectly separated ->
    # D = 1 -> d_num = n_a * n_b = 4 for both sources.
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array(["x"] * 4, pa.string()),
        "lang": pa.array(["en"] * 4, pa.string()),
        "source": pa.array(["a", "a", "b", "b"], pa.string()),
        "n_chars": pa.array([1, 2, 3, 4], pa.int64()),
    }), f"{tmp_path}/documents.parquet")
    from robokop_build_ray.stages.text_analysis import length_ks_by_source
    import ray.data as rd

    got = (length_ks_by_source(
        rd.read_parquet(f"{tmp_path}/documents.parquet"))
        .to_pandas().set_index("source"))
    assert got.loc["a", "d_num"] == 4 and got.loc["b", "d_num"] == 4
    assert got.loc["a", "d"] == 1.0


def test_user_decay_integer_halving(tmp_path):
    # watermark = last event; ages 0d, 1d, 2.5d -> shifts 0, 1, 2:
    # 4.00 >> 2 = 100, 4.00 >> 1 = 200, 4.00 >> 0 = 400 -> 700 cents
    D = 24 * 3600 * 1_000_000
    _write_events(tmp_path, [
        {"event_id": 1, "ts_us": 0, "user_id": 1,
         "event_type": "A", "value": 4.0},          # age 2.5d -> >>2
        {"event_id": 2, "ts_us": int(1.5 * D), "user_id": 1,
         "event_type": "A", "value": 4.0},          # age 1d   -> >>1
        {"event_id": 3, "ts_us": int(2.5 * D), "user_id": 1,
         "event_type": "A", "value": 4.0},          # age 0    -> >>0
    ])
    got = rel.events_user_decay(str(tmp_path)).to_pandas()
    assert got["decayed_cents"].tolist() == [700]


def test_kanonymity_small_classes(tmp_path):
    # class (A, hour 0, bucket 0): 5 members -> NOT flagged (n >= k);
    # class (B, hour 0, bucket 0): 2 members -> flagged.
    rows = [{"event_id": i + 1, "ts_us": i, "user_id": 1,
             "event_type": "A", "value": 1.0} for i in range(5)]
    rows += [{"event_id": 10 + i, "ts_us": i, "user_id": 1,
              "event_type": "B", "value": 1.0} for i in range(2)]
    _write_events(tmp_path, rows)
    got = rel.events_kanonymity(str(tmp_path)).to_pandas()
    assert got["event_type"].tolist() == ["B"]
    assert got["n"].tolist() == [2]


def test_winsorized_clip(tmp_path):
    # 16 values 1..16 dollars: p(1/16) = v[ceil(16/16)-1] = 1.00,
    # p(15/16) = v[ceil(15)-1] = 15.00 -> 16.00 clips to 15.00:
    # sum = (1+..+15) + 15 = 120 + 15 = 135 dollars = 13500 cents
    _write_events(tmp_path, [
        {"event_id": i + 1, "ts_us": i * H, "user_id": 1,
         "event_type": "A", "value": float(i + 1)}
        for i in range(16)
    ])
    got = rel.events_value_winsorized(str(tmp_path)).to_pandas()
    assert got["n"].tolist() == [16]
    assert got["clipped_cents"].tolist() == [13500]


def test_densest_peel_trace():
    # K4 on {a,b,c,d} plus pendant e-a: round 0 has V=5, E=7 (avg 2.8);
    # keep deg*5 > 14 -> only deg >= 3 nodes: a(4),b,c,d(3) -> e peels.
    # round 1: K4 -> V=4, E=6, avg 3; keep deg*4 > 12 -> none (deg 3
    # each) -> empty. Trace = 2 rows; densest witness is round 1 (1.5).
    import ray.data as rd
    from robokop_build_ray.stages.graph_metrics import densest_subgraph

    edges = rd.from_items([
        {"subj_id": s, "obj_id": o}
        for s, o in [("a", "b"), ("a", "c"), ("a", "d"),
                     ("b", "c"), ("b", "d"), ("c", "d"), ("e", "a")]
    ])
    got = densest_subgraph(edges).to_pandas()
    assert got["round"].tolist() == [0, 1]
    assert got["v_count"].tolist() == [5, 4]
    assert got["e_count"].tolist() == [7, 6]
    assert got["density"].tolist() == [1.4, 1.5]


def test_expectations_counts(tmp_path):
    # one violating row per rule class: status X, date 2001, price -1
    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 3], pa.int64()),
        "o_custkey": pa.array([1, 1, 1], pa.int64()),
        "o_orderstatus": pa.array(["O", "X", "F"], pa.string()),
        "o_totalprice": pa.array([10.0, 5.0, -1.0], pa.float64()),
        "o_orderdate": pa.array([0, 10**15, 2 * 10**15],
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT", "9-BAD", "5-LOW"],
                                    pa.string()),
    }), f"{tmp_path}/orders.parquet")
    got = (rel.orders_expectations(str(tmp_path)).to_pandas()
           .set_index("rule")["n_violations"].to_dict())
    # 10^15 us = 2001-09, 2*10^15 = 2033 -> both >= 2000-01-01
    assert got == {"totalprice_positive": 1, "status_in_enum": 1,
                   "date_before_2000": 2, "priority_format": 1,
                   "custkey_positive": 0}


def test_centroid_drift_exact():
    # label 0: even half {(1,0)}, odd half {(0,1)} (QUANT units):
    # s1=(Q,0) n_a=1, s2=(0,Q) n_b=1 -> num = Q + Q; drift = 2Q/Q = 2.0
    import pyarrow.parquet as _pq
    import tempfile
    from robokop_build_ray.stages.clustering import (
        QUANT, embedding_centroid_drift)

    with tempfile.TemporaryDirectory() as d:
        _pq.write_table(pa.table({
            "vec_id": pa.array([0, 1], pa.int64()),
            "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                                  pa.list_(pa.float32())),
            "label": pa.array([0, 0], pa.int32()),
        }), f"{d}/embeddings.parquet")
        got = embedding_centroid_drift(d).to_pandas()
    assert got["drift_l1_num"].tolist() == [2 * QUANT]
    assert got["drift"].tolist() == [2.0]


def test_props_extraction_with_missing(tmp_path):
    df = pd.DataFrame({
        "event_id": [1, 2, 3],
        "ts_us": [0, 1, 2],
        "user_id": [1, 1, 1],
        "event_type": ["A", "A", "A"],
        "value": [1.0, 1.0, 1.0],
    })
    t = pa.table({
        "event_id": pa.array(df["event_id"], pa.int64()),
        "ts": pa.array(df["ts_us"], pa.timestamp("us")),
        "user_id": pa.array(df["user_id"], pa.int64()),
        "event_type": pa.array(df["event_type"], pa.string()),
        "value": pa.array(df["value"], pa.float64()),
        "props": pa.array(['{"k": 7}', "oops", '{"k": 3}'], pa.string()),
    })
    pq.write_table(t, f"{tmp_path}/events.parquet")
    got = rel.events_props_stats(str(tmp_path)).to_pandas()
    assert got["n"].tolist() == [3]
    assert got["n_missing"].tolist() == [1]
    assert got["sum_k"].tolist() == [10]
    assert got["min_k"].tolist() == [3]
    assert got["max_k"].tolist() == [7]


def test_bipartite_odd_even_cycles():
    # square a-b-c-d-a (even cycle: bipartite) + triangle x-y-z (odd),
    # plus a path p-q (trivially bipartite)
    import ray.data as rd
    from robokop_build_ray.stages.graph_metrics import bipartite_components

    edges = rd.from_items([
        {"subj_id": s, "obj_id": o}
        for s, o in [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
                     ("x", "y"), ("y", "z"), ("z", "x"), ("p", "q")]
    ])
    got = (bipartite_components(edges).to_pandas()
           .set_index("component"))
    assert got.loc["a", "n_nodes"] == 4 and got.loc["a", "is_bipartite"] == 1
    assert got.loc["x", "n_nodes"] == 3 and got.loc["x", "is_bipartite"] == 0
    assert got.loc["p", "n_nodes"] == 2 and got.loc["p", "is_bipartite"] == 1
