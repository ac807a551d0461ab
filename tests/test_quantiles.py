"""Exact distributed order statistics: histogram-pass path pinned against
a straight numpy sort, and quantile_disc rank semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from robokop_build_ray.functions.quantiles import grouped_exact_ranks, quantile_disc_rank


def test_quantile_disc_rank_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    for n in (1, 2, 4, 5, 7, 10, 33):
        vals = ",".join(f"({i + 1})" for i in range(n))
        for q in (0.25, 0.5, 0.75):
            want = con.execute(
                f"SELECT quantile_disc(x, {q}) FROM (VALUES {vals}) t(x)"
            ).fetchone()[0]
            assert quantile_disc_rank(q, n) == want - 1, (n, q)


def test_grouped_exact_ranks_forced_histogram_path():
    rng = np.random.default_rng(11)
    frames = []
    for g, n in (("a", 900), ("b", 400)):
        frames.append(pd.DataFrame({"grp": g, "value": rng.normal(size=n)}))
    df = pd.concat(frames, ignore_index=True)
    ds = rd.from_pandas(df).repartition(6)

    targets = {
        g: [(f"q{int(q * 100)}", quantile_disc_rank(q, n))
            for q in (0.25, 0.5, 0.75)]
        for g, n in (("a", 900), ("b", 400))
    }
    # collect_cap=10 forces the iterative narrowing passes to run
    got = grouped_exact_ranks(lambda: ds, "grp", "value", targets,
                              collect_cap=10)
    for g, sub in df.groupby("grp"):
        v = np.sort(sub["value"].to_numpy())
        for q in (0.25, 0.5, 0.75):
            assert got[(g, f"q{int(q * 100)}")] == v[
                quantile_disc_rank(q, len(v))], (g, q)


def test_grouped_exact_ranks_duplicate_heavy_group():
    df = pd.DataFrame({"grp": "x", "value": [3.5] * 50 + [1.0, 9.0]})
    ds = rd.from_pandas(df)
    got = grouped_exact_ranks(
        lambda: ds, "grp", "value",
        {"x": [("q50", quantile_disc_rank(0.5, len(df)))]}, collect_cap=5)
    assert got[("x", "q50")] == 3.5


def test_sorted_rank_weight_sum_matches_numpy(ray_session):
    """The distributed Gini rank moment (sort + contiguous-batch partials
    reassembled on (min, max)) equals the straight numpy fold, tie-heavy
    and multi-block included."""
    from robokop_build_ray.functions.quantiles import sorted_rank_weight_sum

    rng = np.random.default_rng(23)
    for n, tie_span in ((1, 1), (7, 2), (500, 10), (1000, 3)):
        vals = rng.integers(0, tie_span * 7, size=n).astype(np.int64)
        ds = rd.from_pandas(pd.DataFrame({"vc": vals})).repartition(7)
        got = sorted_rank_weight_sum(ds, "vc")
        v = np.sort(vals)
        want = (n, int(v.sum()),
                int(np.dot(np.arange(1, n + 1, dtype=np.int64), v)))
        assert got == want, (n, tie_span, got, want)
    empty = rd.from_pandas(
        pd.DataFrame({"vc": pd.Series([], dtype="int64")}))
    assert sorted_rank_weight_sum(empty, "vc") == (0, 0, 0)


def test_events_lorenz_forced_histogram_path(ray_session, tmp_path):
    """events_lorenz's decile boundaries resolve identically through the
    collect path and the forced iterative-histogram path (collect_cap=0 —
    the 100x-scale shape), pinned against a driver-side ntile fold."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from robokop_build_ray.pipelines.relational import _cents, events_lorenz

    rng = np.random.default_rng(31)
    n_ev = 4000
    users = rng.integers(0, 137, size=n_ev).astype(np.int64)
    value = np.round(rng.exponential(20.0, size=n_ev), 2)
    pq.write_table(pa.table({"user_id": users, "value": value}),
                   str(tmp_path / "events.parquet"))

    rows = sorted(
        (tuple(r.values()) for r in
         events_lorenz(str(tmp_path), collect_cap=0).take_all()))
    rows_easy = sorted(
        (tuple(r.values()) for r in
         events_lorenz(str(tmp_path)).take_all()))
    assert rows == rows_easy

    df = pd.DataFrame({"user_id": users, "vc": _cents(value)})
    tot = (df.groupby("user_id", as_index=False)["vc"].sum()
           .sort_values(["vc", "user_id"], kind="mergesort"))
    v = tot["vc"].to_numpy(np.int64)
    n = len(v)
    total = int(v.sum())
    base, rem = divmod(n, 10)
    sizes = [base + 1] * rem + [base] * (10 - rem)
    want, pos = [], 0
    for d, sz in enumerate(sizes, start=1):
        if sz == 0:
            continue
        seg = int(v[pos:pos + sz].sum())
        want.append((d, sz, seg, float(seg) / float(total)))
        pos += sz
    assert rows == sorted(want)


def test_events_lorenz_fewer_users_than_deciles(ray_session, tmp_path):
    """n < k: only the first n ntile buckets are non-empty (DuckDB
    remainder-to-first rule), the last boundary rank equals n, and the
    shares still sum to 1."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from robokop_build_ray.pipelines.relational import events_lorenz

    pq.write_table(pa.table({
        "user_id": np.array([7, 7, 3, 5], np.int64),
        "value": np.array([1.25, 2.00, 10.00, 0.50], np.float64),
    }), str(tmp_path / "events.parquet"))
    rows = sorted((r["decile"], r["n_users"], r["decile_cents"],
                   r["value_share"])
                  for r in events_lorenz(str(tmp_path)).take_all())
    # user totals (cents): u3=1000, u5=50, u7=325 -> asc: u5, u7, u3
    assert rows == [(1, 1, 50, 50 / 1375.0),
                    (2, 1, 325, 325 / 1375.0),
                    (3, 1, 1000, 1000 / 1375.0)]


def test_weighted_prefix_cut_matches_bruteforce(ray_session):
    import ray.data as rd

    from robokop_build_ray.functions.quantiles import weighted_prefix_cut

    rng = np.random.default_rng(17)
    n = 200
    vals = rng.integers(1, 40, size=n).astype(np.int64) * 7  # many ties
    ties = np.arange(n, dtype=np.int64)
    ds = rd.from_pandas(pd.DataFrame({"v": vals, "k": ties})).repartition(6)
    total = int(vals.sum())
    order = sorted(zip(vals, ties), key=lambda x: (-x[0], x[1]))
    for num, den in ((4, 5), (19, 20), (1, 2), (1, 100)):
        cut = weighted_prefix_cut(ds, "v", "v", "k", num, den, total)
        cut_dist = weighted_prefix_cut(ds, "v", "v", "k", num, den, total,
                                       local_threshold=0)
        assert cut == cut_dist, (num, den, cut, cut_dist)
        cum = 0
        want = set()
        for v, k in order:
            if (cum + v) * den > num * total:
                break
            cum += v
            want.add((v, k))
        if cut is None:
            assert not want
            continue
        cv, ct = cut
        got = {(v, k) for v, k in order
               if v > cv or (ct is not None and v == cv and k <= ct)}
        assert got == want, (num, den, cut)
