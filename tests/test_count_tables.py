"""Static count-table reader (S4) + static_counts supporter (T4/J4):
round-trip, symmetric pair keys, absent-pair fallback semantics."""

from __future__ import annotations

import math

import pytest
import ray
import ray.data as rd

from robokop_build_ray.sources.count_tables import (
    read_count_tables,
    write_count_tables,
)
from robokop_build_ray.stages.supporters import static_counts_supporter


@pytest.fixture()
def counts(tmp_path):
    c = {
        "total": 1000,
        "marginals": {"A:1": 100, "B:2": 50, "C:3": 20},
        "pairs": {("A:1", "B:2"): 30, ("B:2", "C:3"): 5},
    }
    paths = write_count_tables(c, str(tmp_path))
    return read_count_tables(paths["marginal_path"], paths["pair_path"],
                             total=1000)


def test_round_trip_and_symmetry(counts):
    assert counts["total"] == 1000
    assert counts["marginals"]["A:1"] == 100
    # canonical (min,max) orientation serves both lookups
    assert counts["pairs"][("A:1", "B:2")] == 30
    assert ("B:2", "A:1") not in counts["pairs"]


def test_supporter_scoring_and_fallback(counts):
    pairs = rd.from_items(
        [
            {"id_a": "A:1", "id_b": "B:2"},   # present, above threshold
            {"id_a": "B:2", "id_b": "C:3"},   # present, suppressed (5 < 11)
            {"id_a": "A:1", "id_b": "C:3"},   # ABSENT pair -> fallback branch
        ]
    )
    out = {(r["id_a"], r["id_b"]): r
           for r in static_counts_supporter(pairs, ray.put(counts)).take_all()}

    r = out[("A:1", "B:2")]
    assert (r["c1"], r["c2"], r["c"]) == (100, 50, 30)
    assert math.isclose(r["expected"], 100 * 50 / 1000)
    assert not r["suppressed"] and r["chi2"] > 0

    assert out[("B:2", "C:3")]["suppressed"]  # small count suppression

    f = out[("A:1", "C:3")]  # absent-pair fallback: `builder/cdw.py:92-100`
    assert f["c"] == 0 and f["suppressed"]
    assert math.isclose(f["expected"], 100 * 20 / 1000)
