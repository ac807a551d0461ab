"""Bucketed (salted) aggregation primitives.

Ray Data's native groupby-aggregate on HIGH-CARDINALITY string keys pays a
per-key cost in the sort-based reduce (measured: 65 s for a 600k-row
two-string-key count at 32 CPUs vs 0.6 s bucketed — see BASELINE.md). The
scalable pattern used across this repo:

1. per-batch PARTIAL aggregation (vectorized pandas/pyarrow) inside
   ``map_batches``;
2. an explicit hash-bucket column ``_b = stable_row_hash(keys) % n_buckets``
   — this IS the salted shuffle key (north_rule): a hot logical key spreads
   only when the bucket hash includes a fine-grained column, and every
   bucket holds a disjoint slice of the key space;
3. one shuffle on ``_b`` (n_buckets groups, never millions);
4. ONE vectorized merge call per bucket (pandas groupby inside).

``n_buckets`` bounds reducer count: set ≳ cluster cores (default 64). Hashes
come from ``pd.util.hash_pandas_object`` (fixed-key siphash — stable across
processes, unlike Python's ``hash``).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd


def _bucket_col(df: pd.DataFrame, keys: list[str], n_buckets: int) -> np.ndarray:
    h = pd.util.hash_pandas_object(df[keys], index=False).to_numpy()
    return (h % np.uint64(n_buckets)).astype(np.int64)


class _PrepBatch:
    """MODULE-LEVEL callable (CLAUDE.md rule): instances of module-level
    classes unpickle via the package import, which installs the
    empty-block log filters in every worker — function-local closures
    pickle by value and skip it (worker-side warning storms)."""

    def __init__(self, keys, n_buckets, partial_fn):
        self.keys = keys
        self.n_buckets = n_buckets
        self.partial_fn = partial_fn
        self.__name__ = "prep"  # operator display + map_groups contract

    def __call__(self, batch: pd.DataFrame):
        import pyarrow as pa

        if self.partial_fn is not None:
            batch = self.partial_fn(batch)
        batch = batch.copy()
        if len(batch) == 0:
            batch["_b"] = pd.Series([], dtype="int64")
            batch["_s"] = pd.Series([], dtype="int64")
            return pa.Table.from_pandas(batch, preserve_index=False).replace_schema_metadata(None)
        batch["_b"] = _bucket_col(batch, self.keys, self.n_buckets)
        batch["_s"] = 0
        # SENTINEL PADDING: one type-perfect row (copied from the batch) per
        # bucket id, dropped again in `_RunBucket`. Guarantees every reduce
        # partition is non-empty — Ray's sort emits ZERO-COLUMN blocks for
        # empty partitions, which bypass map operators and crash any later
        # AllToAll concat (acero joins and repartition both choke on them).
        pad = batch.iloc[[0] * self.n_buckets].copy()
        pad["_b"] = np.arange(self.n_buckets, dtype=np.int64)
        pad["_s"] = 1
        out = pd.concat([batch, pad], ignore_index=True)
        # emit ARROW blocks: the AllToAll exchange serializes pandas object
        # columns via pickle, Arrow string columns zero-copy
        return pa.Table.from_pandas(out, preserve_index=False).replace_schema_metadata(None)


class _RunBucket:
    """Module-level for the same worker-import reason as ``_PrepBatch``."""

    def __init__(self, bucket_fn):
        self.bucket_fn = bucket_fn
        self.__name__ = "run"  # operator display + map_groups contract

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        real = group.loc[group["_s"] == 0]
        return self.bucket_fn(real.drop(columns=["_b", "_s"]))


def bucketed_apply(
    ds,
    keys: list[str],
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    n_buckets: int = 64,
    batch_size: int | None = None,
):
    """Generic bucketed exchange: optional per-batch partial -> one shuffle
    on the key-hash bucket -> ``bucket_fn`` once per bucket (all rows of any
    key land in exactly one bucket)."""
    # COALESCE to n_buckets blocks before the exchange: Ray's sort-based
    # groupby creates one reduce partition PER INPUT BLOCK, so B blocks make
    # B x B shuffle objects with at most n_buckets non-empty — measured
    # superlinear slowdown at 288 blocks (9.6M rows). The repartition is a
    # block split/merge (no row re-keying), cost O(data) once.
    kw = {} if batch_size is None else {"batch_size": batch_size}
    return (
        ds.map_batches(_PrepBatch(keys, n_buckets, partial_fn),
                       batch_format="pandas", **kw)
        .repartition(n_buckets)
        .groupby("_b")
        .map_groups(_RunBucket(bucket_fn), batch_format="pandas")
    )


def bucketed_count(ds, keys: list[str], name: str = "c", n_buckets: int = 64):
    """groupby(keys).count() for high-cardinality keys."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(keys, sort=False).size().rename(name).reset_index()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, sort=False, as_index=False)[name].sum()

    return bucketed_apply(ds, keys, merge, partial, n_buckets)


def coalesced_count(ds, keys: list[str], name: str = "c",
                    coalesce: int = 16):
    """groupby(keys).count() for KEY-BOUNDED cardinality (e.g. entities):
    per-batch partial counts -> block COALESCE (``repartition`` without a
    shuffle — blocks move, rows don't re-key) -> one vectorized merge per
    coalesced block. Skips the sort-based AllToAll entirely; the result has
    at most ``coalesce`` x |keys| rows (collect + final merge driver-side).
    Use :func:`bucketed_count` when the key space itself is corpus-scale."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(keys, sort=False).size().rename(name).reset_index()

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(keys, sort=False, as_index=False)[name].sum()

    return (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(coalesce)
        .map_batches(merge, batch_format="pandas", batch_size=None)
    )


def bucketed_distinct(ds, keys: list[str], n_buckets: int = 64):
    """DISTINCT over keys for high-cardinality keys. ``n_buckets=1`` is the
    degenerate unsalted case (single reducer) used as the equivalence
    reference in tests."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b[keys].drop_duplicates()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(keys)

    return bucketed_apply(ds, keys, merge, partial, n_buckets)


def bucketed_sum(ds, keys: list[str], value: str, n_buckets: int = 64):
    """groupby(keys).sum(value) for high-cardinality keys."""

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(keys, sort=False, as_index=False)[value].sum()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, sort=False, as_index=False)[value].sum()

    return bucketed_apply(ds, keys, merge, partial, n_buckets)


def bucketed_min(ds, keys: list[str], value: str, n_buckets: int = 64):
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(keys, sort=False, as_index=False)[value].min()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(keys, sort=False, as_index=False)[value].min()

    return bucketed_apply(ds, keys, merge, partial, n_buckets)


def _typed_empty(cols: list[str], dtypes: dict | None) -> pd.DataFrame:
    """Zero-row frame whose dtypes come from ``dtypes`` (fallback object).
    Untyped empties poison downstream schema unification — Ray logs
    ``PandasBlockSchema(names=[])`` / size-calculation warnings and Arrow
    cannot unify an all-object empty with typed non-empty blocks."""
    d = dtypes or {}
    return pd.DataFrame(
        {c: pd.Series([], dtype=d.get(c, object)) for c in cols}
    )


def bucketed_attach(left, right, left_on: str, right_on: str,
                    left_cols: list[str], payload: dict[str, str],
                    n_buckets: int = 64, payload_fill=b"",
                    left_fill: dict | None = None,
                    empty_dtypes: dict | None = None):
    """INNER hash-join replacement: attach ``right``'s payload columns to
    ``left`` rows by key equality through ONE bucketed exchange. Used where
    pyarrow's acero `Dataset.join` cannot go: empty sides / empty hash
    partitions (acero raises "No match for key field") and binary or
    list-typed payload columns. ``payload`` maps right column -> output
    column name; the right side's key must be unique per row (dict-like).
    ``payload_fill`` is one sentinel for every payload column, or a dict
    keyed by OUTPUT column name when the payload columns mix types."""
    import pandas as pd

    dsts = list(payload.values())

    def prep_left(b: pd.DataFrame) -> pd.DataFrame:
        out = b[left_cols].copy()
        out["_k"] = b[left_on]
        for d in dsts:
            # typed sentinel, not None: an all-null column becomes Arrow
            # null-type and the exchange cannot unify it with the right
            # side's real payload type (these placeholders are dropped
            # before the merge)
            out[d] = (payload_fill[d] if isinstance(payload_fill, dict)
                      else payload_fill)
        out["_side"] = 0
        return out

    fills = left_fill or {}

    fillmap = (payload_fill if isinstance(payload_fill, dict)
               else {d: payload_fill for d in dsts})

    def prep_right(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"_k": b[right_on]})
        for c in left_cols:
            # type-compatible filler (dropped in the merge): keeps every
            # union block's schema identical so the exchange can concat.
            # Non-key-typed left columns need an explicit left_fill entry.
            out[c] = fills.get(c, b[right_on])
        for src, dst in payload.items():
            col = b[src]
            fv = fillmap.get(dst)
            # widen the payload to the sentinel's dtype (e.g. an int32
            # parquet column vs an int64 placeholder) so the union's block
            # schemas agree — divergent blocks log Ray schema warnings and
            # are a unification hazard at high task counts
            if isinstance(fv, np.generic) and col.dtype != fv.dtype:
                col = col.astype(fv.dtype)
            out[dst] = col
        out["_side"] = 1
        return out[left_cols + ["_k"] + dsts + ["_side"]]

    u = left.map_batches(prep_left, batch_format="pandas").union(
        right.map_batches(prep_right, batch_format="pandas")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "_side" not in g.columns:
            return _typed_empty([*left_cols, *dsts], empty_dtypes)
        l = g.loc[g["_side"] == 0, [*left_cols, "_k"]]
        r = g.loc[g["_side"] == 1, ["_k", *dsts]].drop_duplicates("_k")
        m = l.merge(r, on="_k", how="inner")
        return m[[*left_cols, *dsts]]

    return bucketed_apply(u, ["_k"], merge, None, n_buckets)


def bucketed_semi(left, right, left_on: str, right_on: str,
                  left_cols: list[str], n_buckets: int = 64,
                  anti: bool = False, left_fill: dict | None = None,
                  empty_dtypes: dict | None = None):
    """Distributed SEMI (``anti=False``) / ANTI (``anti=True``) join: keep
    ``left`` rows whose key does / does not appear anywhere in ``right`` —
    for the case where BOTH sides are fact-scale so neither key set is
    driver-bounded. The right side is deduplicated per batch (membership
    needs each key once), both sides meet in ONE bucketed exchange, and the
    per-bucket test is a single vectorized ``isin``. When one key set IS
    memory-bounded, prefer the broadcast pattern
    (``relational.customers_without_orders``) — it skips the shuffle."""
    import pandas as pd

    fills = left_fill or {}

    def prep_left(b: pd.DataFrame) -> pd.DataFrame:
        out = b[left_cols].copy()
        out["_k"] = b[left_on]
        out["_side"] = 0
        return out

    def prep_right(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[right_on].drop_duplicates()
        out = pd.DataFrame({"_k": keys})
        for c in left_cols:
            # type-compatible filler (dropped in the merge) so union blocks
            # share one schema; non-key-typed columns need a left_fill entry
            out[c] = fills.get(c, keys)
        out["_side"] = 1
        return out[left_cols + ["_k", "_side"]]

    u = left.map_batches(prep_left, batch_format="pandas").union(
        right.map_batches(prep_right, batch_format="pandas")
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        # same guard as bucketed_attach.merge: when BOTH sides filter to
        # zero rows Ray's sort can hand map_groups a column-less group —
        # g["_side"] would raise KeyError
        if len(g) == 0 or "_side" not in g.columns:
            return _typed_empty(left_cols, empty_dtypes)
        l = g.loc[g["_side"] == 0]
        present = l["_k"].isin(g.loc[g["_side"] == 1, "_k"].unique())
        keep = l.loc[~present if anti else present]
        return keep[left_cols]

    return bucketed_apply(u, ["_k"], merge, None, n_buckets)


def bucketed_group_pairs(ds, group_keys: list[str],
                         pair_fn: Callable[[pd.DataFrame], pd.DataFrame],
                         n_buckets: int = 64):
    """Apply ``pair_fn`` to every (group_keys) group, with groups co-located
    by bucket so the shuffle has n_buckets partitions and the per-group
    Python loop runs inside ONE call per bucket."""

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        outs = [pair_fn(sub) for _, sub in g.groupby(group_keys, sort=False)]
        outs = [o for o in outs if len(o)]
        if not outs:
            return pair_fn(g.iloc[0:0])
        return pd.concat(outs, ignore_index=True)

    return bucketed_apply(ds, group_keys, merge, None, n_buckets)


def bucketed_outer_unique(left, right, on: str,
                          left_vals: list[str], right_vals: list[str],
                          fills: dict, n_buckets: int = 64):
    """FULL OUTER merge of two UNIQUE-keyed datasets (the
    aggregate-reconciliation shape: both sides are keyed aggregates, so
    every key appears at most once per side) through ONE bucketed
    exchange — the join class acero's Dataset.join cannot provide here
    (same empty-partition failure mode as the attach/semi bans).
    ``fills`` maps every value column to its typed absent-side sentinel;
    output dtypes are restored from the sentinels after the outer merge
    (pandas widens int64 to float when a side is missing)."""
    import pandas as pd

    def prep_l(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[on, *left_vals]].copy()
        for c in right_vals:
            out[c] = fills[c]
        out["_side"] = 0
        return out[[on, *left_vals, *right_vals, "_side"]]

    def prep_r(b: pd.DataFrame) -> pd.DataFrame:
        out = b[[on, *right_vals]].copy()
        for c in left_vals:
            out[c] = fills[c]
        out["_side"] = 1
        return out[[on, *left_vals, *right_vals, "_side"]]

    u = left.map_batches(prep_l, batch_format="pandas").union(
        right.map_batches(prep_r, batch_format="pandas"))

    dtypes = {c: np.asarray([v]).dtype for c, v in fills.items()}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "_side" not in g.columns:
            return _typed_empty([on, *left_vals, *right_vals],
                                {on: object, **dtypes})
        l = g.loc[g["_side"] == 0, [on, *left_vals]]
        r = g.loc[g["_side"] == 1, [on, *right_vals]]
        m = l.merge(r, on=on, how="outer")
        for c in (*left_vals, *right_vals):
            m[c] = m[c].fillna(fills[c]).astype(dtypes[c])
        return m[[on, *left_vals, *right_vals]]

    return bucketed_apply(u, [on], merge, None, n_buckets)
