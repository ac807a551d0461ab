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
