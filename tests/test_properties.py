"""Property-based tests (hypothesis) for the pure functions — no Ray."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from robokop_build_ray.functions.text import normalize_name, pair_key


# ASCII only: the reference's name space is ASCII biomedical labels; unicode
# case-folding edge cases (e.g. dotless-i) are out of contract
names = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 ,-",
    min_size=1, max_size=40,
)


@given(names)
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    once = normalize_name(s)
    assert normalize_name(once) == once or ", " in once  # comma-free after one pass unless commas remain mid-token


@given(names)
@settings(max_examples=200, deadline=None)
def test_normalize_case_insensitive(s):
    assert normalize_name(s.upper()) == normalize_name(s.lower())


@given(st.text(min_size=1, max_size=20), st.text(min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_pair_key_symmetric_and_ordered(a, b):
    k = pair_key(a, b)
    assert k == pair_key(b, a)
    assert k[0] <= k[1]


@given(
    st.integers(min_value=0, max_value=1000),
    st.integers(min_value=0, max_value=1000),
    st.integers(min_value=0, max_value=1000),
    st.integers(min_value=1, max_value=100000),
)
@settings(max_examples=300, deadline=None)
def test_chi2_vec_well_defined(c, c1, c2, n):
    """chi2 >= 0, p in [0,1], expected = c1*c2/n — for ANY count inputs
    (even inconsistent ones the pipeline can never produce)."""
    from robokop_build_ray.stages.support import chi2_yates_vec

    e, chi2, p = chi2_yates_vec(
        np.array([c]), np.array([c1]), np.array([c2]), n
    )
    assert math.isclose(e[0], c1 * c2 / n)
    assert chi2[0] >= 0.0 and np.isfinite(chi2[0])
    assert 0.0 <= p[0] <= 1.0


@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=60))
@settings(max_examples=100, deadline=None)
def test_union_find_matches_bruteforce(edges):
    """gazetteer.canonical_map union-find == brute-force closure."""
    from robokop_build_ray.gazetteer import Entity, canonical_map

    ids = sorted({f"N:{i:03d}" for e in edges for i in e} | {"N:000"})
    ents = [Entity(i, i, "t", ()) for i in ids]
    bridges = [(f"N:{a:03d}", f"N:{b:03d}") for a, b in edges]

    got = canonical_map(ents, bridges)

    # brute force: repeated relabel to min neighbor
    lbl = {i: i for i in ids}
    changed = True
    while changed:
        changed = False
        for a, b in bridges:
            m = min(lbl[a], lbl[b])
            for x in (a, b):
                if lbl[x] != m:
                    lbl[x] = m
                    changed = True
        # propagate through labels (path closure)
        for x in ids:
            if lbl[lbl[x]] != lbl[x]:
                lbl[x] = lbl[lbl[x]]
                changed = True
    assert got == lbl


@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=30),
                min_size=2, max_size=2))
@settings(max_examples=100, deadline=None)
def test_shingle_jaccard_bounds(texts):
    from robokop_build_ray.stages.dedup import shingle_hashes

    A = set(shingle_hashes(texts[0]).tolist())
    B = set(shingle_hashes(texts[1]).tolist())
    if A or B:
        j = len(A & B) / max(1, len(A | B))
        assert 0.0 <= j <= 1.0
        if texts[0] == texts[1]:
            assert j == 1.0 or not A


@given(st.lists(st.tuples(st.integers(0, 50), st.integers(0, 20)),
                min_size=0, max_size=60))
@settings(max_examples=40, deadline=None)
def test_pareto2d_block_matches_bruteforce(pts):
    import pandas as pd

    from robokop_build_ray.pipelines.relational import _pareto2d_block

    df = pd.DataFrame({
        "p_partkey": np.arange(len(pts), dtype=np.int64),
        "price_cents": np.array([p for p, _ in pts], dtype=np.int64),
        "p_size": np.array([s for _, s in pts], dtype=np.int64),
    })
    got = set(_pareto2d_block(df)["p_partkey"].tolist())
    want = set()
    for i, (pi, si) in enumerate(pts):
        dominated = any(
            (pj <= pi and sj >= si and (pj < pi or sj > si))
            for j, (pj, sj) in enumerate(pts) if j != i)
        if not dominated:
            want.add(i)
    assert got == want
    # skyline-of-skylines identity: front of two half-blocks re-folded
    # equals the one-pass front
    half = len(df) // 2
    refold = _pareto2d_block(pd.concat(
        [_pareto2d_block(df.iloc[:half]), _pareto2d_block(df.iloc[half:])],
        ignore_index=True))
    assert set(refold["p_partkey"].tolist()) == want
