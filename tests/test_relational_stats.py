"""Hand-computed cases for the per-user statistical aggregates (OLS trend,
Simpson type diversity) — the oracle harness checks them at corpus tiers;
these pin the arithmetic on a planted table."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from robokop_build_ray.pipelines import relational as rel

US = 1_000_000
DAY_US = 86_400 * US


@pytest.fixture(scope="module")
def stats_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rel_stats")
    rows = [
        # user 1: 1.00 / 2.00 / 3.00 on days 0 / 1 / 2 -> slope 100 c/day
        (1, 1, 0 * DAY_US, "view", 1.00),
        (2, 1, 1 * DAY_US, "view", 2.00),
        (3, 1, 2 * DAY_US, "purchase", 3.00),
        # user 2: both events on ONE day -> zero x variance, excluded
        (4, 2, 5 * DAY_US, "click", 1.00),
        (5, 2, 5 * DAY_US + 7 * US, "click", 9.00),
    ]
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array([r[4] for r in rows], pa.float64()),
    })
    pq.write_table(t, d / "events.parquet")
    return str(d)


def test_user_trend_hand_values(stats_dir):
    out = (rel.events_user_trend(stats_dir).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    # user 2 is excluded (den = n*sxx - sx^2 = 0); user 1: exact fit
    assert out["user_id"].tolist() == [1]
    assert out["n"].tolist() == [3]
    assert out["slope"].tolist() == [100.0]       # cents per day
    assert out["intercept"].tolist() == [100.0]   # cents at day 0
    assert str(out["slope"].dtype) == "float64"


def test_type_diversity_hand_values(stats_dir):
    out = (rel.events_type_diversity(stats_dir).to_pandas()
           .sort_values("user_id").reset_index(drop=True))
    assert out["user_id"].tolist() == [1, 2]
    assert out["n"].tolist() == [3, 2]
    assert out["n_types"].tolist() == [2, 1]
    # user 1: (9 - (4 + 1)) / 9; user 2: single type -> 0.0
    assert out["simpson"].tolist() == [4.0 / 9.0, 0.0]
