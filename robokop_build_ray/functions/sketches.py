"""Mergeable sketches (the per-batch-sketch -> tiny-merge aggregation
pattern from the Ray Data guide): Misra-Gries heavy hitters.

Shape: ``map_batches`` emits ONE serialized sketch row per batch (vectorized
``value_counts`` inside), a single driver-side merge combines them — the
shuffle moves #batches rows instead of #input rows. Misra-Gries guarantees:
any key with frequency > n/capacity survives, and estimated counts are exact
when (distinct keys) <= capacity — which makes the result SQL-verifiable on
low-cardinality columns while remaining a true bounded-memory sketch for
high-cardinality ones.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


class MisraGries:
    """Bounded-count heavy-hitter sketch with merge support.

    ``exact`` turns False the moment any decrement fires (capacity
    exceeded): counts are then lower-bound estimates, not exact — consumers
    presenting counts as exact MUST check the flag."""

    def __init__(self, capacity: int = 1024):
        self.capacity = capacity
        self.counts: dict = {}
        self.exact = True

    def add_counts(self, items: dict) -> None:
        for k, c in items.items():
            if k in self.counts:
                self.counts[k] += c
            else:
                self.counts[k] = c
                if len(self.counts) > self.capacity:
                    self._decrement()

    def _decrement(self) -> None:
        self.exact = False
        dec = min(self.counts.values())
        self.counts = {k: v - dec for k, v in self.counts.items() if v > dec}

    def merge(self, other: "MisraGries") -> "MisraGries":
        self.add_counts(other.counts)
        self.exact = self.exact and other.exact
        return self

    def top(self, k: int) -> list[tuple[object, int]]:
        return sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def heavy_hitters(ds, col: str, k: int = 10, capacity: int = 1024,
                  batch_size: int = 65_536):
    """-> Dataset (value, n) of the top-k values of ``col``.

    Exact (== SQL GROUP BY count) whenever the column's distinct count fits
    ``capacity``; otherwise Misra-Gries approximate with the standard
    frequency guarantee. One sketch per batch, merged in one pass."""

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        sk = MisraGries(capacity)
        sk.add_counts(b[col].value_counts().to_dict())
        import pickle

        return pd.DataFrame({"sketch": [pickle.dumps(sk)]})

    sketches = ds.select_columns([col]).map_batches(
        per_batch, batch_size=batch_size, batch_format="pandas"
    ).take_all()

    import pickle

    total = MisraGries(capacity)
    for r in sketches:
        total.merge(pickle.loads(r["sketch"]))
    if not total.exact:
        # the oracle compares against an exact GROUP BY: surface the loss of
        # exactness loudly instead of silently returning estimates as truth
        import warnings

        warnings.warn(
            f"heavy_hitters({col!r}): distinct count exceeded sketch "
            f"capacity {capacity}; counts are lower-bound estimates",
            stacklevel=2,
        )

    top = total.top(k)
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                col: pa.array([t[0] for t in top]),
                "n": pa.array([int(t[1]) for t in top], pa.int64()),
            }
        )
    )


class KMinValues:
    """KMV distinct-count sketch: keeps the k smallest stable 64-bit hashes
    of the values seen. Mergeable (union + re-truncate). While fewer than
    ``k`` distinct hashes exist the sketch holds ALL of them, so the count
    is exact; past capacity the standard (k-1)/max_kept estimator applies
    and ``exact`` turns False (same consumer contract as MisraGries)."""

    def __init__(self, k: int = 1024):
        import numpy as np

        self.k = k
        self.vals = np.array([], dtype=np.uint64)

    def add_hashes(self, h) -> None:
        import numpy as np

        self.vals = np.unique(np.concatenate([self.vals, h]))[: self.k]

    def merge(self, other: "KMinValues") -> "KMinValues":
        self.add_hashes(other.vals)
        return self

    @property
    def exact(self) -> bool:
        return len(self.vals) < self.k

    def estimate(self) -> int:
        if self.exact:
            return int(len(self.vals))
        frac = float(self.vals[-1]) / float(1 << 64)
        return int(round((self.k - 1) / frac))


def grouped_distinct_count(ds, key: str, col: str, k: int = 1024,
                           batch_size: int = 65_536):
    """-> Dataset (key, n_distinct): distinct ``col`` values per ``key``
    via one KMV sketch per (batch, key) — the shuffle moves
    #batches x #keys sketch rows, never input rows. Exact whenever each
    key's distinct count fits ``k`` (warned otherwise, like
    :func:`heavy_hitters`); ``key`` must be enum-bounded (one merged
    sketch per key is held driver-side)."""
    import pickle
    import warnings

    import numpy as np
    import ray.data as rd

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, g in b.groupby(key, sort=False):
            sk = KMinValues(k)
            sk.add_hashes(pd.util.hash_array(g[col].unique()))
            rows.append((kv, pickle.dumps(sk)))
        return pd.DataFrame(rows, columns=[key, "sketch"])

    merged: dict = {}
    for r in ds.select_columns([key, col]).map_batches(
        per_batch, batch_size=batch_size, batch_format="pandas"
    ).iter_rows():
        sk = pickle.loads(r["sketch"])
        if r[key] in merged:
            merged[r[key]].merge(sk)
        else:
            merged[r[key]] = sk
    for kv, sk in merged.items():
        if not sk.exact:
            warnings.warn(
                f"grouped_distinct_count({key!r}, {col!r}): key {kv!r} "
                f"exceeded sketch capacity {k}; count is an estimate",
                stacklevel=2,
            )
    keys = sorted(merged)
    return rd.from_arrow(pa.table({
        key: pa.array(keys),
        "n_distinct": pa.array([merged[x].estimate() for x in keys],
                               pa.int64()),
    }))


def grouped_set_overlap(ds, key: str, col: str, k: int = 1024,
                        batch_size: int = 65_536):
    """KMV set ALGEBRA over the per-key sketches: for every unordered key
    pair (a < b), the union and intersection distinct-count estimates of
    their ``col`` value sets — Dataset (type_a, type_b, n_a, n_b, n_union,
    n_intersect). Union = sketch merge (k smallest of both); intersection
    = inclusion-exclusion (n_a + n_b - n_union), the standard KMV
    combinator. While every sketch is under capacity the counts are EXACT
    (warned otherwise, same contract as :func:`grouped_distinct_count`);
    ``key`` must be enum-bounded — the pairwise merge is a driver-side
    fold over #keys^2 sketches, never input rows. The expensive scan
    (one sketch per batch x key) stays distributed."""
    import pickle
    import warnings

    import numpy as np
    import ray.data as rd

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, g in b.groupby(key, sort=False):
            sk = KMinValues(k)
            sk.add_hashes(pd.util.hash_array(g[col].unique()))
            rows.append((kv, pickle.dumps(sk)))
        return pd.DataFrame(rows, columns=[key, "sketch"])

    merged: dict = {}
    for r in ds.select_columns([key, col]).map_batches(
        per_batch, batch_size=batch_size, batch_format="pandas"
    ).iter_rows():
        sk = pickle.loads(r["sketch"])
        if r[key] in merged:
            merged[r[key]].merge(sk)
        else:
            merged[r[key]] = sk
    for kv, sk in merged.items():
        if not sk.exact:
            warnings.warn(
                f"grouped_set_overlap({key!r}, {col!r}): key {kv!r} "
                f"exceeded sketch capacity {k}; counts are estimates",
                stacklevel=2,
            )
    keys = sorted(merged)
    ta, tb, na, nb, nu, ni = [], [], [], [], [], []
    for i, a in enumerate(keys):
        for b_ in keys[i + 1:]:
            u = KMinValues(k)
            u.add_hashes(merged[a].vals)
            u.add_hashes(merged[b_].vals)
            ea, eb, eu = (merged[a].estimate(), merged[b_].estimate(),
                          u.estimate())
            ta.append(a)
            tb.append(b_)
            na.append(ea)
            nb.append(eb)
            nu.append(eu)
            ni.append(ea + eb - eu)
    return rd.from_arrow(pa.table({
        "type_a": pa.array(ta), "type_b": pa.array(tb),
        "n_a": pa.array(na, pa.int64()), "n_b": pa.array(nb, pa.int64()),
        "n_union": pa.array(nu, pa.int64()),
        "n_intersect": pa.array(ni, pa.int64()),
    }))


# ------------------------------------------------------- count-min sketch

CM_DEPTH = 4
CM_WIDTH = 256


def _cm_bucket(key, j: int, width: int) -> int:
    import hashlib

    return int(hashlib.md5(f"{key}:cm{j}".encode()).hexdigest()[:8],
               16) % width


def cm_sketch_estimates(ds, col: str, k: int = 10,
                        depth: int = CM_DEPTH, width: int = CM_WIDTH,
                        n_buckets: int = 16):
    """Count-Min sketch (Cormode & Muthukrishnan 2005) frequency
    estimation vs exact truth -> Dataset(key, n, est) for the ``k``
    most frequent values of ``col`` (count desc, key asc). ``est`` is
    the sketch's min-over-rows read — always >= the true count, equal
    when the key's buckets are collision-free; surfacing BOTH makes the
    estimation error a checked output instead of a silent property (the
    KMV/heavy-hitter precedent).

    Determinism: row hashes are salted md5 (``key:cm{j}``) — process-
    stable and recomputable by DuckDB, so the sketch table itself is
    oracle-checkable. Scale shape: per-batch partial sketches are
    (depth x width)-bounded rows regardless of batch size; the merge is
    one sum exchange over a depth*width key space (mergeability IS the
    point of CM at 100 TB — sketches from any shard partition add);
    driver state is the merged (depth x width) table + the k-bounded
    top-key list."""
    import hashlib

    import pandas as pd

    from .bucketing import bucketed_sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        keys = b[col].astype(str)
        js, bs = [], []
        for j in range(depth):
            pre = keys + f":cm{j}"
            js.append(np.full(len(b), j, dtype=np.int64))
            bs.append(np.fromiter(
                (int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % width
                 for s in pre), np.int64, len(b)))
        df = pd.DataFrame({"j": np.concatenate(js),
                           "b": np.concatenate(bs)})
        out = df.groupby(["j", "b"], sort=False).size().rename(
            "c").reset_index()
        return out

    sketch = {}  # (depth x width)-bounded
    for r in bucketed_sum(
            ds.select_columns([col]).map_batches(
                partial, batch_format="pandas"),
            ["j", "b"], "c", n_buckets=n_buckets).take_all():
        sketch[(int(r["j"]), int(r["b"]))] = int(r["c"])

    from .bucketing import bucketed_count

    exact = bucketed_count(ds.select_columns([col]), [col], name="n",
                           n_buckets=n_buckets)

    def cap(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["n", col], ascending=[False, True],
                             kind="mergesort").head(k)

    import ray.data as rd

    top = pd.DataFrame(
        exact.map_batches(cap, batch_format="pandas").take_all())
    top = top.sort_values(["n", col], ascending=[False, True],
                          kind="mergesort").head(k).reset_index(drop=True)
    est = [min(sketch.get((j, _cm_bucket(key, j, width)), 0)
               for j in range(depth))
           for key in top[col].astype(str)]
    import pyarrow as pa

    return rd.from_arrow(pa.table({
        "key": pa.array(top[col].astype("int64"), pa.int64()),
        "n": pa.array(top["n"].astype("int64"), pa.int64()),
        "est": pa.array(np.asarray(est, dtype=np.int64), pa.int64()),
    }))


def sql_cm_sketch(col: str = "user_id", k: int = 10,
                  depth: int = CM_DEPTH, width: int = CM_WIDTH) -> str:
    """Oracle for cm_sketch_estimates: DuckDB rebuilds the identical
    salted-md5 sketch table and reads the same min-over-rows estimate."""
    hx = (f"CAST(('0x' || substr(md5(CAST({{v}} AS VARCHAR) || ':cm' || "
          f"CAST({{j}} AS VARCHAR)), 1, 8)) AS UBIGINT) % {width}")
    return f"""
WITH h AS (SELECT {col}, count(*) AS n FROM events GROUP BY {col}),
top AS (SELECT {col}, n FROM h ORDER BY n DESC, {col} LIMIT {k}),
bkt AS MATERIALIZED (
  SELECT r.j, {hx.format(v=f'events.{col}', j='r.j')} AS b,
         count(*) AS c
  FROM events JOIN range({depth}) r(j) ON TRUE
  GROUP BY 1, 2)
SELECT t.{col} AS key, CAST(t.n AS BIGINT) AS n,
       CAST(min(bk.c) AS BIGINT) AS est
FROM top t
JOIN range({depth}) r(j) ON TRUE
JOIN bkt bk ON bk.j = r.j
  AND bk.b = {hx.format(v=f't.{col}', j='r.j')}
GROUP BY t.{col}, t.n"""


# -------------------------------------------------------------- hyperloglog

HLL_M = 64          # registers (b = 6 bucket bits)
HLL_WBITS = 58      # rank field width: 64 - 6
# alpha_64 = 0.7213 / (1 + 1.079/64) quantized to a rational SPEC constant
HLL_ALPHA_NUM, HLL_ALPHA_DEN = 70934, 100000
_HLL_K = 62         # Z scaled by 2^62 so every term is a BIGINT shift


# linear-counting spec table: HLL_LC_TABLE[V-1] = round(m * ln(m / V))
# for V zero registers of m=64 — precomputed integers shared verbatim with
# the SQL oracle (no runtime transcendental on either side)
import math as _math

HLL_LC_TABLE = tuple(round(HLL_M * _math.log(HLL_M / v))
                     for v in range(1, HLL_M + 1))


def _hll_h64(key) -> int:
    import hashlib

    return int(hashlib.md5(f"{key}:hll".encode()).hexdigest()[:16], 16)


def hll_distinct(ds, col: str, n_buckets: int = 16):
    """HyperLogLog distinct-count estimate vs exact truth (Flajolet et
    al. 2007) -> Dataset(m, est, n_exact) — one row. Register j
    (= h64 % m) holds the max rank (leading-zero count + 1) of the
    remaining 58 hash bits; the raw estimator alpha*m^2/Z is computed
    with Z scaled to the EXACT integer sum(2^(62 - M_j)), so ``est`` is
    one integer floor division — no float anywhere, and DuckDB rebuilds
    the identical registers from the same salted md5. The small-range
    linear-counting correction is deliberately omitted (its log is
    float-order-dependent); the exact count sits beside the estimate so
    the error is a CHECKED output (the CM-sketch convention).

    Scale shape: per-batch partial registers are m-bounded rows; the
    merge is one max exchange over m keys — HLL registers merge by MAX,
    which is what makes the sketch shippable from any shard at 100 TB.
    """
    import pandas as pd

    from .bucketing import bucketed_distinct, bucketed_min

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        regs: dict[int, int] = {}
        for key in b[col]:
            h = _hll_h64(key)
            j = h % HLL_M
            w = h >> 6
            rank = (HLL_WBITS + 1 if w == 0
                    else HLL_WBITS - w.bit_length() + 1)
            if rank > regs.get(j, 0):
                regs[j] = rank
        return pd.DataFrame({
            "j": np.fromiter(regs.keys(), np.int64, len(regs)),
            # negated: bucketed_min is the available mergeable fold
            "neg_rank": np.fromiter((-v for v in regs.values()), np.int64,
                                    len(regs))})

    merged = bucketed_min(
        ds.select_columns([col]).map_batches(partial,
                                             batch_format="pandas"),
        ["j"], "neg_rank", n_buckets=min(n_buckets, 8))
    regs = {int(r["j"]): -int(r["neg_rank"]) for r in merged.take_all()}
    z_scaled = sum(1 << (_HLL_K - regs.get(j, 0)) for j in range(HLL_M))
    est = (HLL_ALPHA_NUM * HLL_M * HLL_M << _HLL_K) // (
        HLL_ALPHA_DEN * z_scaled)
    # small-range (linear counting, Flajolet et al. 2007 4.3): when zero
    # registers exist and the raw estimate is under 5m/2, the standard
    # correction m*ln(m/V) applies — read from the precomputed INTEGER
    # spec table so no transcendental runs in either engine
    v_zero = HLL_M - len(regs)
    if v_zero > 0 and est <= 5 * HLL_M // 2:
        est = HLL_LC_TABLE[v_zero - 1]

    n_exact = bucketed_distinct(ds.select_columns([col]), [col],
                                min(n_buckets, 8)).count()
    import pyarrow as pa
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "m": pa.array([HLL_M], pa.int64()),
        "est": pa.array([est], pa.int64()),
        "n_exact": pa.array([n_exact], pa.int64()),
    }))


def sql_hll_distinct(col: str = "user_id") -> str:
    """Oracle for hll_distinct: DuckDB rebuilds the identical registers
    (same salted 64-bit md5, bucket = h % m, rank via length(bin(w)))
    and the same integer-shift estimator."""
    one62 = "CAST((1::BIGINT << 62) AS HUGEINT)"
    return f"""
WITH u AS (SELECT DISTINCT {col} FROM events),
h AS (SELECT CAST(('0x' || substr(md5(CAST({col} AS VARCHAR) || ':hll'),
                                  1, 16)) AS UBIGINT) AS h64 FROM u),
r AS (SELECT CAST(h64 % {HLL_M} AS BIGINT) AS j,
             CAST(h64 // {HLL_M} AS UBIGINT) AS w FROM h),
mx AS (SELECT j, max(CASE WHEN w = 0 THEN {HLL_WBITS + 1}
                          ELSE {HLL_WBITS} - length(bin(w)) + 1 END) AS mx
       FROM r GROUP BY j),
regs AS (SELECT g.j, coalesce(mx.mx, 0) AS mx
         FROM range({HLL_M}) g(j) LEFT JOIN mx ON mx.j = g.j),
z AS (SELECT CAST(sum(CAST(1::BIGINT << ({_HLL_K} - mx) AS HUGEINT))
                  AS HUGEINT) AS zs,
             CAST(sum(CASE WHEN mx = 0 THEN 1 ELSE 0 END) AS BIGINT) AS v
      FROM regs),
raw AS (SELECT v,
               CAST(({HLL_ALPHA_NUM}::HUGEINT * {HLL_M} * {HLL_M}
                     * {one62})
                    // ({HLL_ALPHA_DEN}::HUGEINT * zs) AS BIGINT) AS est
        FROM z)
SELECT CAST({HLL_M} AS BIGINT) AS m,
       CASE WHEN v > 0 AND est <= {5 * HLL_M // 2}
            THEN list_extract({list(HLL_LC_TABLE)}, CAST(v AS INT))
            ELSE est END AS est,
       (SELECT count(*) FROM u) AS n_exact
FROM raw"""
