"""Temporal joins: as-of, interval join, per-key top-k (planted cases with
hand-computed expectations, plus dtype/empty-side behavior)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from robokop_build_ray.pipelines import temporal as tmp

US = 1_000_000


@pytest.fixture(scope="module")
def events_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("temporal")
    rows = [
        # user 1: view@10, view@20, purchase@25, error@26, error@100000
        (1, 1, 10, "view", 1.00),
        (2, 1, 20, "view", 2.00),
        (3, 1, 25, "purchase", 9.99),
        (4, 1, 26, "error", 0.50),
        (5, 1, 100_000, "error", 0.25),
        # user 2: purchase with NO prior view (view comes after)
        (6, 2, 5, "purchase", 3.00),
        (7, 2, 9, "view", 1.50),
        # user 3: only views
        (8, 3, 7, "view", 4.00),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] * US for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    pq.write_table(t, d / "events.parquet")
    return str(d)


def test_asof_backward_picks_latest_prior(events_dir):
    out = (tmp.events_asof_join(events_dir).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # purchase 3 (user 1, t=25) -> view 2 (t=20), not view 1 (t=10);
    # purchase 6 (user 2) has no PRIOR view -> dropped (inner as-of)
    assert out["event_id"].tolist() == [3]
    assert out["ref_event_id"].tolist() == [2]
    assert out["gap_us"].tolist() == [5 * US]
    assert all(str(out[c].dtype) == "int64" for c in out.columns)


def test_window_join_counts_and_sums(events_dir):
    out = (tmp.events_window_join(events_dir, window_s=60).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # purchase 3 (t=25): error 4 (t=26) inside [25, 85); error 5 is not.
    # purchase 6 (user 2): no errors at all -> zeros (left semantics).
    assert out["event_id"].tolist() == [3, 6]
    assert out["n_follow"].tolist() == [1, 0]
    assert out["sum_value_cents"].tolist() == [50, 0]


def test_user_topk_rank_and_tiebreak(events_dir):
    out = (tmp.events_user_topk(events_dir, k=2).to_pandas()
           .sort_values(["user_id", "rk"]).reset_index(drop=True))
    # user 1 by cents: 999 (id 3), 200 (id 2); user 2: 300 (6), 150 (7);
    # user 3: single row rank 1
    got = list(zip(out["user_id"], out["rk"], out["event_id"]))
    assert got == [(1, 1, 3), (1, 2, 2), (2, 1, 6), (2, 2, 7), (3, 1, 8)]


def test_user_sample_deterministic_and_capped(events_dir):
    from robokop_build_ray.pipelines import relational as rel

    a = (rel.events_user_sample(events_dir, k=2).to_pandas()
         .sort_values(["user_id", "h"]).reset_index(drop=True))
    b = (rel.events_user_sample(events_dir, k=2).to_pandas()
         .sort_values(["user_id", "h"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b)  # seed-free, rerun-stable
    assert a.groupby("user_id").size().max() <= 2
    # hash order, not id order: the kept ids are the k smallest by h
    h = (a["event_id"] * rel._SAMPLE_A) % rel._SAMPLE_M
    assert (a["h"] == h).all()


def test_type_pivot_counts(events_dir):
    from robokop_build_ray.pipelines import relational as rel

    out = (rel.events_type_pivot(events_dir).to_pandas()
           .set_index("user_id").sort_index())
    assert out.loc[1, "n_view"] == 2
    assert out.loc[1, "n_error"] == 2
    assert out.loc[1, "n_purchase"] == 1
    assert out.loc[3, "n_view"] == 1
    assert out.loc[3, ["n_click", "n_error", "n_purchase", "n_signup"]].sum() == 0


def test_user_topk_tie_on_cents_prefers_lower_event_id(tmp_path):
    t = pa.table({
        "event_id": pa.array([11, 10, 12], pa.int64()),
        "user_id": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([0, 0, 0], pa.timestamp("us")),
        "event_type": pa.array(["click"] * 3),
        "value": pa.array([5.0, 5.0, 1.0], pa.float64()),
    })
    pq.write_table(t, tmp_path / "events.parquet")
    out = (tmp.events_user_topk(str(tmp_path), k=2).to_pandas()
           .sort_values("rk"))
    assert out["event_id"].tolist() == [10, 11]


def test_session_table_hand_values(events_dir):
    # gap 30 s: user 1 -> sessions {10,20,25,26} then {100000};
    # user 2 -> {5, 9}; user 3 -> {7}
    out = (tmp.events_session_table(events_dir, gap_us=30 * US,
                                    n_buckets=4).to_pandas()
           .sort_values(["user_id", "session_idx"])
           .reset_index(drop=True))
    got = [tuple(r) for r in out.itertuples(index=False)]
    assert got == [
        (1, 0, 4, 10 * US, 26 * US, 16 * US, 1349),
        (1, 1, 1, 100_000 * US, 100_000 * US, 0, 25),
        (2, 0, 2, 5 * US, 9 * US, 4 * US, 450),
        (3, 0, 1, 7 * US, 7 * US, 0, 400),
    ]
    assert all(str(out[c].dtype) == "int64" for c in out.columns)


def test_events_user_ewma_recurrence(tmp_path):
    import pyarrow.parquet as pq

    ts = pd.Timestamp("2026-01-01")
    rows = pd.DataFrame({
        "event_id": [1, 2, 3, 4],
        "user_id": [7, 7, 7, 9],
        "ts": [ts, ts + pd.Timedelta(seconds=1),
               ts + pd.Timedelta(seconds=2), ts],
        "value": [1.00, 2.00, 10.00, 5.00],
    })
    pq.write_table(pa.Table.from_pandas(rows), f"{tmp_path}/events.parquet")
    from robokop_build_ray.pipelines.temporal import events_user_ewma

    got = {r["event_id"]: r["ewma_c"]
           for r in events_user_ewma(str(tmp_path), n_buckets=4).take_all()}
    # user 7: s1=100; s2=(200+3*100)//4=125; s3=(1000+3*125)//4=343
    assert got == {1: 100, 2: 125, 3: 343, 4: 500}


def test_events_type_transitions_hand(tmp_path):
    ts = pd.Timestamp("2026-01-01")
    rows = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [7, 7, 7, 9, 9],
        "ts": [ts + pd.Timedelta(seconds=i) for i in range(5)],
        "event_type": ["view", "click", "view", "view", "click"],
    })
    pq.write_table(pa.Table.from_pandas(rows), f"{tmp_path}/events.parquet")
    from robokop_build_ray.pipelines.temporal import events_type_transitions

    got = {(r["from_type"], r["to_type"]): (r["n"], r["p"])
           for r in events_type_transitions(str(tmp_path),
                                            n_buckets=4).take_all()}
    # user 7: view->click, click->view; user 9: view->click
    assert got == {("view", "click"): (2, 1.0),
                   ("click", "view"): (1, 1.0)}
