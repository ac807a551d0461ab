"""Exact distributed order statistics (multi-quantile generalization of
``relational.events_value_median``'s iterative histogram selection).

``grouped_exact_ranks`` resolves ANY set of per-group 0-based rank targets
(e.g. the three quartile indices) without ever materializing a group: each
pass streams the fact table once, histograms every still-open
(group, target) candidate range with a distributed bucketed aggregate, and
the driver narrows each range ``N_BUCKETS``-fold using only the
group x bucket aggregate (driver-bounded). The final pass collects ONLY
in-range rows (``collect_cap``-gated). Exactness: bucket boundaries are
measured fresh each pass (below-range counts come from the same filter
that defines the histogram), so float rounding can never desynchronize
rank bookkeeping from filter semantics.

Quantile targets use DuckDB ``quantile_disc`` semantics — element at
``ceil(q*n) - 1`` (exact arithmetic; callers should pick binary-exact
``q`` like 0.25/0.5/0.75 so float and decimal evaluation agree).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import ray

N_BUCKETS = 4096

_EMPTY_HIST = {
    "g": pd.Series([], dtype=object),
    "label": pd.Series([], dtype=object),
    "bucket": pd.Series([], dtype="int64"),
    "n": pd.Series([], dtype="int64"),
}
_EMPTY_RANGE = {
    "g": pd.Series([], dtype=object),
    "label": pd.Series([], dtype=object),
    "value": pd.Series([], dtype="float64"),
    "nbelow": pd.Series([], dtype="int64"),
}


class _HistPartial:
    """Per-batch histogram partials for every open (group, target) range.

    Module-level (not a closure) so Ray serializes it BY REFERENCE: workers
    import the package — which installs the empty-block size-warning filter
    — instead of receiving a by-value pickle that skips package import."""

    def __init__(self, ranges_ref, group_col: str, value_col: str):
        self.ranges = ray.get(ranges_ref)
        self.group_col = group_col
        self.value_col = value_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (g, label), (lo, hi) in self.ranges.items():
            v = b.loc[b[self.group_col] == g, self.value_col].to_numpy()
            n_below = int((v < lo).sum())
            v = v[(v >= lo) & (v <= hi)]
            buckets, ns = [], []
            if n_below:
                buckets.append(-1)
                ns.append(n_below)
            if len(v):
                idx = np.minimum(
                    ((v - lo) * (N_BUCKETS / (hi - lo))).astype(np.int64),
                    N_BUCKETS - 1)
                bc = np.bincount(np.maximum(idx, 0), minlength=N_BUCKETS)
                nz = np.flatnonzero(bc)
                buckets.extend(nz.tolist())
                ns.extend(bc[nz].tolist())
            if buckets:
                outs.append(pd.DataFrame(
                    {"g": g, "label": label, "bucket": buckets, "n": ns}))
        if not outs:
            return pd.DataFrame(_EMPTY_HIST)
        return pd.concat(outs, ignore_index=True)


class _RangeFilter:
    """Final-pass collector: rows inside each still-open range plus a
    below-range count marker row. Module-level for the same by-reference
    serialization reason as ``_HistPartial``."""

    def __init__(self, ranges_ref, group_col: str, value_col: str):
        self.ranges = ray.get(ranges_ref)
        self.group_col = group_col
        self.value_col = value_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for (g, label), (lo, hi) in self.ranges.items():
            v = b.loc[b[self.group_col] == g, self.value_col]
            n_below = int((v < lo).sum())
            v = v[(v >= lo) & (v <= hi)]
            if len(v):
                outs.append(pd.DataFrame(
                    {"g": g, "label": label, "value": v, "nbelow": 0}))
            if n_below:
                outs.append(pd.DataFrame(
                    {"g": [g], "label": [label], "value": [np.nan],
                     "nbelow": [n_below]}))
        if not outs:
            return pd.DataFrame(_EMPTY_RANGE)
        return pd.concat(outs, ignore_index=True)


def quantile_disc_rank(q: float, n: int) -> int:
    """DuckDB quantile_disc target index (0-based)."""
    return max(0, math.ceil(q * n) - 1)


def grouped_exact_ranks(
    scan,
    group_col: str,
    value_col: str,
    targets: dict[str, list[tuple[str, int]]],
    collect_cap: int = 100_000,
    max_passes: int = 4,
) -> dict[tuple[str, str], float]:
    """scan() -> Dataset with (group_col, value_col); ``targets`` maps
    group -> [(label, 0-based rank)]. Returns {(group, label): value}."""
    from ray.data.aggregate import Max, Min

    from .bucketing import bucketed_sum

    from ray.data.aggregate import Count

    stats = {
        r[group_col]: (float(r["lo"]), float(r["hi"]), int(r["n"]))
        for r in scan().groupby(group_col)
        .aggregate(Min(value_col, alias_name="lo"),
                   Max(value_col, alias_name="hi"),
                   Count(alias_name="n")).take_all()
    }
    state: dict[tuple[str, str], dict] = {}
    for g, pairs in targets.items():
        lo, hi, n = stats[g]
        for label, rank in pairs:
            # seeding in_range with the true group size lets driver-sized
            # groups skip the histogram passes and go straight to collect
            state[(g, label)] = {"lo": lo, "hi": hi, "r": int(rank),
                                 "in_range": n, "done": hi <= lo,
                                 "value": lo if hi <= lo else None}

    for _ in range(max_passes):
        open_keys = {k: s for k, s in state.items()
                     if not s["done"] and s["in_range"] > collect_cap}
        if not open_keys:
            break
        ranges_ref = ray.put(
            {k: (s["lo"], s["hi"]) for k, s in open_keys.items()})

        # to_pandas, not take_all: take_all on pandas-format blocks pays
        # ~1 ms/row (keys x 4097 rows -> tens of seconds per pass)
        hist = bucketed_sum(
            scan().map_batches(
                _HistPartial, batch_format="pandas", concurrency=(1, 4),
                fn_constructor_kwargs={"ranges_ref": ranges_ref,
                                       "group_col": group_col,
                                       "value_col": value_col}),
            ["g", "label", "bucket"], "n").to_pandas()
        per_key: dict[tuple[str, str], np.ndarray] = {}
        below_meas: dict[tuple[str, str], int] = {}
        for row in hist.itertuples(index=False):
            k = (row.g, row.label)
            if int(row.bucket) < 0:
                below_meas[k] = int(row.n)
                continue
            per_key.setdefault(k, np.zeros(N_BUCKETS, dtype=np.int64))[
                int(row.bucket)] += int(row.n)
        for k, s in open_keys.items():
            counts = per_key.get(k)
            below = below_meas.get(k, 0)
            if counts is None:
                s["value"], s["done"] = s["lo"], True
                continue
            cum = np.cumsum(counts)
            w = (s["hi"] - s["lo"]) / N_BUCKETS
            b1 = int(np.searchsorted(cum, s["r"] - below, side="right"))
            s["lo"], s["hi"] = (s["lo"] + b1 * w,
                                min(s["hi"], s["lo"] + (b1 + 1) * w))
            s["in_range"] = int(cum[b1] - (cum[b1 - 1] if b1 > 0 else 0))
            if s["hi"] - s["lo"] < 1e-12:
                s["value"], s["done"] = s["lo"], True

    open_keys = {k: s for k, s in state.items() if not s["done"]}
    if open_keys:
        ranges_ref = ray.put({k: (s["lo"], s["hi"])
                              for k, s in open_keys.items()})

        rows = scan().map_batches(
            _RangeFilter, batch_format="pandas", concurrency=(1, 4),
            fn_constructor_kwargs={"ranges_ref": ranges_ref,
                                   "group_col": group_col,
                                   "value_col": value_col}).to_pandas()
        marker = rows["nbelow"] > 0
        below_final = (rows.loc[marker].groupby(["g", "label"])["nbelow"]
                       .sum().to_dict())
        vals = {k: gg["value"].to_numpy(dtype=np.float64)
                for k, gg in rows.loc[~marker].groupby(["g", "label"])}
        for k, s in open_keys.items():
            v = np.sort(vals.get(k, np.array([], dtype=np.float64)))
            s["value"] = float(v[s["r"] - int(below_final.get(k, 0))])
            s["done"] = True

    return {k: float(s["value"]) for k, s in state.items()}


# ----------------------------------------- sorted rank-weight moment

_EMPTY_MOMENT = {
    "mn": pd.Series([], dtype="int64"),
    "mx": pd.Series([], dtype="int64"),
    "cnt": pd.Series([], dtype="int64"),
    "s": pd.Series([], dtype="int64"),
    "s1": pd.Series([], dtype="int64"),
}


class _SortedMomentPartial:
    """Per-batch partial of the rank-weight moment over a SORTED dataset:
    (min, max, count, sum, local Σ i*v_i with 1-based batch-local ranks).
    Module-level for by-reference serialization (see _HistPartial)."""

    def __init__(self, value_col: str):
        self.value_col = value_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or self.value_col not in b.columns:
            # Ray's sort boundary sampling emits zero-column empty blocks
            return pd.DataFrame(_EMPTY_MOMENT)
        v = np.sort(b[self.value_col].to_numpy(np.int64))
        n = len(v)
        i = np.arange(1, n + 1, dtype=np.int64)
        vmax = max(abs(int(v[0])), abs(int(v[-1])))
        s1l = int(np.dot(i, v)) if vmax * n * n < 2 ** 62 else \
            sum(int(j) * int(x) for j, x in zip(i.tolist(), v.tolist()))
        if not (-2 ** 63 <= s1l < 2 ** 63):
            raise OverflowError(
                "rank-weight partial exceeds int64 — the BIGINT oracle "
                "overflows at the same magnitude")
        return pd.DataFrame({"mn": [int(v[0])], "mx": [int(v[-1])],
                             "cnt": [n], "s": [int(v.sum())],
                             "s1": [s1l]})


def sorted_rank_weight_sum(ds, value_col: str) -> tuple[int, int, int]:
    """Exact ``(n, s0, s1)`` with ``s1 = Σ_i i*v_i`` over ASCENDING value
    order (1-based ``i``; tie order is irrelevant — permuting equal values
    leaves the sum unchanged) — the Gini / rank-moment primitive, computed
    WITHOUT collecting the table to the driver.

    Distributed shape: ONE ``ds.sort(value_col)`` (Ray's range-partitioned
    distributed sort — the only all-to-all), then a ``map_batches`` partial
    per batch. Each batch of a sorted dataset is a CONTIGUOUS value range
    (tasks read consecutive sorted blocks in order), so the driver can
    reassemble global ranks by ordering the batch-bounded partials on
    ``(min, max)`` and offsetting each batch's local moment by the
    cumulative count before it: ``s1 = Σ_b (local_s1_b + offset_b * s_b)``
    in exact Python-int arithmetic. Driver state = one 5-int row per batch
    (corpus/batch_size-bounded), never the value stream. Values must be
    int64."""
    rows = ds.sort(value_col).map_batches(
        _SortedMomentPartial, batch_format="pandas",
        fn_constructor_kwargs={"value_col": value_col},
        concurrency=(1, 8)).take_all()
    # (mn, mx) totally orders contiguous ranges: for batches A before B in
    # sorted order, mn_A <= mn_B, and mn_A == mn_B forces max_A <= min_B
    # (a shared boundary tie), hence mx_A <= mx_B
    rows.sort(key=lambda r: (int(r["mn"]), int(r["mx"])))
    n = s0 = s1 = 0
    for r in rows:
        s1 += int(r["s1"]) + n * int(r["s"])
        s0 += int(r["s"])
        n += int(r["cnt"])
    return n, s0, s1


# -------------------------------------------- weighted prefix cuts (ABC)

_EMPTY_WHIST = {
    "bucket": pd.Series([], dtype="int64"),
    "w": pd.Series([], dtype="int64"),
    "n": pd.Series([], dtype="int64"),
}


class _WeightedHistPartial:
    """Per-batch weighted histogram over one open integer value range,
    DESCENDING order semantics: bucket -1 accumulates the weight of
    values ABOVE the range (already decided in), in-range values bin by
    integer width. Module-level for by-reference serialization (see
    _HistPartial)."""

    def __init__(self, lo: int, hi: int, width: int,
                 value_col: str, weight_col: str):
        self.lo, self.hi, self.width = lo, hi, width
        self.value_col, self.weight_col = value_col, weight_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        v = b[self.value_col].to_numpy(np.int64)
        w = b[self.weight_col].to_numpy(np.int64)
        above = v > self.hi
        m = (v >= self.lo) & (v <= self.hi)
        rows_b, rows_w, rows_n = [], [], []
        if above.any():
            rows_b.append(-1)
            rows_w.append(int(w[above].sum()))
            rows_n.append(int(above.sum()))
        if m.any():
            idx = (v[m] - self.lo) // self.width
            wi = np.zeros(int(idx.max()) + 1, dtype=np.int64)
            np.add.at(wi, idx, w[m])
            ns = np.bincount(idx)
            nz = np.flatnonzero(ns)
            rows_b.extend(nz.tolist())
            rows_w.extend(wi[nz].tolist())
            rows_n.extend(ns[nz].tolist())
        if not rows_b:
            return pd.DataFrame(_EMPTY_WHIST)
        return pd.DataFrame({"bucket": rows_b, "w": rows_w, "n": rows_n})


class _TieCollect:
    """Collect rows at exactly one value (the crossing tie group)."""

    def __init__(self, value: int, value_col: str, cols: list):
        self.value, self.value_col, self.cols = value, value_col, cols

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b[self.value_col].to_numpy(np.int64) == self.value,
                     self.cols]


def weighted_prefix_cut(ds, value_col: str, weight_col: str, tie_col: str,
                        num: int, den: int, total: int,
                        tie_cap: int = 1_000_000,
                        local_threshold: int = 1_000_000):
    """Exact distributed quota cut in (value DESC, tie ASC) order: the
    LAST key of the maximal prefix whose cumulative weight ``cum``
    satisfies ``cum * den <= num * total`` — the ABC-segmentation /
    quota-threshold primitive, computed WITHOUT a global sort and
    without value-domain driver state.

    Same doctrine as :func:`grouped_exact_ranks`: each pass streams the
    table once, builds a driver-bounded weighted histogram of the open
    integer range, and narrows ~4096x until the crossing value is
    pinned; the final pass collects ONLY that value's tie group
    (``tie_cap``-gated) and walks it in tie order with exact int
    arithmetic. Returns ``(cut_value, cut_tie)`` — a row is inside the
    quota iff value > cut_value OR (value == cut_value AND
    tie <= cut_tie) — or ``None`` when even the first key overflows the
    quota. All comparisons are exact int64 (weights must be int64)."""
    if total <= 0:
        return None
    if ds.count() <= local_threshold:
        # hybrid gate (kcore/ktruss doctrine): under it one driver walk
        # in the oracle's exact shape; above it the iterative histogram
        # path below (pinned by tests with local_threshold=0)
        rows = []
        for b in ds.iter_batches(batch_format="pandas", batch_size=None):
            rows.extend(zip(b[value_col].astype("int64").tolist(),
                            b[tie_col].tolist(),
                            b[weight_col].astype("int64").tolist()))
        rows.sort(key=lambda r: (-r[0], r[1]))
        cum = 0
        cut = None
        for v, t, w in rows:
            if (cum + w) * den > num * total:
                return cut if cut is not None else (v + 1, None)
            cum += w
            cut = (v, t)
        return cut
    lo, hi = None, None
    for b in ds.map_batches(
            lambda t: pd.DataFrame({
                "lo": [t[value_col].min()], "hi": [t[value_col].max()]}),
            batch_format="pandas").iter_batches(
            batch_format="pandas", batch_size=None):
        bl = int(b["lo"].min())
        bh = int(b["hi"].max())
        lo = bl if lo is None else min(lo, bl)
        hi = bh if hi is None else max(hi, bh)
    if lo is None:
        return None
    w_above = 0  # exact weight of values strictly above current range
    while hi > lo:
        width = max(1, (hi - lo) // N_BUCKETS + 1)
        agg: dict[int, int] = {}
        for b in ds.map_batches(
                _WeightedHistPartial,
                fn_constructor_kwargs=dict(
                    lo=lo, hi=hi, width=width,
                    value_col=value_col, weight_col=weight_col),
                batch_format="pandas",
                concurrency=(1, 8)).iter_batches(
                batch_format="pandas", batch_size=None):
            for k, w in zip(b["bucket"], b["w"]):
                agg[int(k)] = agg.get(int(k), 0) + int(w)
        cum = w_above + agg.get(-1, 0)
        target_hit = None
        for k in sorted((k for k in agg if k >= 0), reverse=True):
            nxt = cum + agg[k]
            if nxt * den > num * total:
                target_hit = k
                break
            cum = nxt
        if target_hit is None:
            # unreachable for num < den with positive weights (the full
            # prefix always overflows); defensively pin the minimum value
            hi = lo
            w_above = cum - agg.get(0, 0)
            break
        w_above = cum
        lo, hi = lo + target_hit * width, min(hi,
                                              lo + (target_hit + 1)
                                              * width - 1)
    # crossing value pinned at lo == hi (or quota swallowed the range)
    v_star = lo
    ties = []
    for b in ds.map_batches(
            _TieCollect,
            fn_constructor_kwargs=dict(value=v_star, value_col=value_col,
                                       cols=[tie_col, weight_col]),
            batch_format="pandas",
            concurrency=(1, 8)).iter_batches(
            batch_format="pandas", batch_size=None):
        ties.extend(zip(b[tie_col].tolist(),
                        b[weight_col].astype("int64").tolist()))
    if len(ties) > tie_cap:
        raise ValueError(f"tie group at {v_star} exceeds cap: {len(ties)}")
    ties.sort()
    cum = w_above
    cut_tie = None
    for t, w in ties:
        if (cum + w) * den > num * total:
            break
        cum += w
        cut_tie = t
    if cut_tie is None:
        # not even the first tie fits: the cut ends strictly above v_star
        return (v_star + 1, None)
    return (v_star, cut_tie)
