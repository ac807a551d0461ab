"""Table profiling: per-column data-quality statistics.

A training-data pipeline's first pass over any new table is a profile —
row count, null rate, exact distinct cardinality, value range per column
(the reference does the analogous sanity pass by eyeballing its builder
output counts, `builder/builder.py:129-134` node/edge tallies; this makes
it a first-class engine operator over arbitrary tables).

Scale shape: the count/null/min/max pass is ONE streaming scan with
single-row per-batch partials (associative: sum/sum/min/min), merged
through a small repartition — no shuffle, no driver-side data path. The
exact distinct count is one bucketed salted exchange PER COLUMN
(``functions/bucketing.bucketed_distinct``): exactness over a corpus-scale
column is inherently a shuffle; callers who can trade exactness for one
pass should use the mergeable KMV sketch (``functions/sketches``) instead.

Determinism: counts are int64; min/max pick existing values (no
arithmetic) and are emitted as float64, bit-identical to the oracle's
``CAST(min(col) AS DOUBLE)`` for integer/double columns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.bucketing import bucketed_distinct


def table_profile(ds, columns: list[str], n_buckets: int = 64):
    """Profile ``columns`` (numeric) of ``ds`` ->
    Dataset(column_name, n, n_null, n_distinct, min_v, max_v)."""
    import ray.data as rd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        row: dict[str, list] = {}
        for c in columns:
            v = b[c]
            vv = v.dropna().to_numpy(dtype=np.float64)
            row[f"n_{c}"] = [np.int64(len(v))]
            row[f"null_{c}"] = [np.int64(v.isna().sum())]
            row[f"min_{c}"] = [float(vv.min()) if len(vv) else np.inf]
            row[f"max_{c}"] = [float(vv.max()) if len(vv) else -np.inf]
        return pd.DataFrame(row)

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        out: dict[str, list] = {}
        for c in columns:
            out[f"n_{c}"] = [np.int64(b[f"n_{c}"].sum())]
            out[f"null_{c}"] = [np.int64(b[f"null_{c}"].sum())]
            out[f"min_{c}"] = [float(b[f"min_{c}"].min())]
            out[f"max_{c}"] = [float(b[f"max_{c}"].max())]
        return pd.DataFrame(out)

    small = (
        ds.map_batches(partial, batch_format="pandas")
        .repartition(4)
        .map_batches(merge, batch_format="pandas", batch_size=None)
        .take_all()  # <= 4 single-stat rows, never corpus data
    )
    agg = pd.DataFrame(small)

    # exact per-column distinct: one bucketed exchange per column
    # (column-count-bounded number of jobs, each fully distributed)
    def drop_nulls(t: pa.Table, col: str) -> pa.Table:
        return t.filter(t[col].combine_chunks().is_valid())

    n_distinct = {}
    for c in columns:
        vals = ds.select_columns([c]).map_batches(
            lambda t, _c=c: drop_nulls(t, _c), batch_format="pyarrow")
        n_distinct[c] = bucketed_distinct(vals, [c], n_buckets).count()

    return rd.from_arrow(pa.table({
        "column_name": pa.array(columns, pa.string()),
        "n": pa.array([int(agg[f"n_{c}"].sum()) for c in columns],
                      pa.int64()),
        "n_null": pa.array([int(agg[f"null_{c}"].sum()) for c in columns],
                           pa.int64()),
        "n_distinct": pa.array([int(n_distinct[c]) for c in columns],
                               pa.int64()),
        "min_v": pa.array([float(agg[f"min_{c}"].min()) for c in columns],
                          pa.float64()),
        "max_v": pa.array([float(agg[f"max_{c}"].max()) for c in columns],
                          pa.float64()),
    }))
