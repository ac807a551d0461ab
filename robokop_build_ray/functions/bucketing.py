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


def bucketed_apply(
    ds,
    keys: list[str],
    bucket_fn: Callable[[pd.DataFrame], pd.DataFrame],
    partial_fn: Callable[[pd.DataFrame], pd.DataFrame] | None = None,
    n_buckets: int = 64,
):
    """Generic bucketed exchange: optional per-batch partial -> one shuffle
    on the key-hash bucket -> ``bucket_fn`` once per bucket (all rows of any
    key land in exactly one bucket)."""

    def prep(batch: pd.DataFrame):
        import pyarrow as pa

        if partial_fn is not None:
            batch = partial_fn(batch)
        batch = batch.copy()
        if len(batch) == 0:
            batch["_b"] = pd.Series([], dtype="int64")
        else:
            batch["_b"] = _bucket_col(batch, keys, n_buckets)
        # emit ARROW blocks: the AllToAll exchange serializes pandas object
        # columns via pickle, Arrow string columns zero-copy
        return pa.Table.from_pandas(batch, preserve_index=False)

    def run(group: pd.DataFrame) -> pd.DataFrame:
        return bucket_fn(group.drop(columns=["_b"]))

    return ds.map_batches(prep, batch_format="pandas").groupby("_b").map_groups(
        run, batch_format="pandas"
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
