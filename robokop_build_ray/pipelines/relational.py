"""Relational operator coverage over the testdata star schema.

These queries exercise the core relational surface (filter -> project ->
broadcast join -> partial aggregate -> groupby -> sort/limit, plus a
sessionization window) the way the 100 TB engine would run them:

- fact tables (lineitem / orders / events) STREAM through ``map_batches``
  with column pruning at the read;
- dimension tables (customer / nation / part / filtered orders) are
  broadcast once via ``ray.put`` and looked up per batch — no shuffle joins;
- aggregates are pre-combined per batch, the final groupby shuffles only
  key-cardinality rows.

Float determinism: monetary aggregates are summed as integer cents
(``floor(x*100 + 0.5)`` per row, then int64 sum) so Ray's partial-sum order
and DuckDB's sequential sum produce BIT-IDENTICAL results — the driver
hash-compares values exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Sum

from ..functions.ray_utils import rename


def _cents(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 100.0 + 0.5).astype(np.int64)


# ------------------------------------------------------------------- Q1

def q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 shape: per (returnflag, linestatus) pricing summary."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        ep = b["l_extendedprice"].to_numpy()
        disc = b["l_discount"].to_numpy()
        return pd.DataFrame(
            {
                "l_returnflag": b["l_returnflag"],
                "l_linestatus": b["l_linestatus"],
                "qty": b["l_quantity"],
                "base_cents": _cents(ep),
                "disc_cents": _cents(ep * (1.0 - disc)),
            }
        )

    return (
        ds.map_batches(derive, batch_format="pandas")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("base_cents", alias_name="sum_base_cents"),
            Sum("disc_cents", alias_name="sum_disc_cents"),
            Count(alias_name="count_order"),
        )
    )


def sql_q1() -> str:
    return """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_base_cents,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_disc_cents,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus"""


# ------------------------------------------------------------------- Q3

SEGMENT = "BUILDING"
Q3_DATE = "1995-06-01"


def q3_top_orders(sf_dir: str, k: int = 10):
    """Revenue of unshipped BUILDING-segment orders; top-k by revenue.

    orders AND customer both grow with scale factor, so nothing here is
    driver state: the segment membership test is a distributed
    ``bucketed_semi`` (orders vs. the segment-filtered customer scan) and
    the lineitem->orders attachment is the repo's ``bucketed_attach`` merge
    join (Ray 2.49's hash-shuffle ``Dataset.join`` raises ArrowInvalid on
    empty hash partitions — CLAUDE.md invariant). The order date rides the
    exchange as int64 microseconds (one fill type per exchange) and turns
    back into a timestamp at the driver-sized top-k. The top-k itself is a
    per-batch local top-k partial followed by a single-block final merge,
    never a full sort of the aggregate."""
    from ..functions.bucketing import (bucketed_attach, bucketed_semi,
                                       bucketed_sum)

    cutoff = np.datetime64(Q3_DATE)
    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"],
        filter=pc.field("c_mktsegment") == SEGMENT,
    )

    def order_prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"],
            "o_custkey": b["o_custkey"],
            "o_date_us": b["o_orderdate"].astype("datetime64[us]")
            .astype("int64"),
        })

    orders = bucketed_semi(
        rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderkey", "o_custkey", "o_orderdate"],
            filter=pc.field("o_orderdate") < pa.scalar(
                cutoff.astype("datetime64[us]")),
        ).map_batches(order_prep, batch_format="pandas"),
        cust, left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_orderkey", "o_date_us"],
        empty_dtypes={"o_orderkey": "int64", "o_date_us": "int64"},
    )

    def rev_partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = _cents(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        )
        out = pd.DataFrame({"l_orderkey": b["l_orderkey"], "rev": rev})
        return out.groupby("l_orderkey", as_index=False)["rev"].sum()

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_shipdate") > pa.scalar(
            cutoff.astype("datetime64[us]")),
    ).map_batches(rev_partial, batch_format="pandas")

    joined = bucketed_attach(
        li, orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "rev"],
        payload={"o_date_us": "o_date_us"}, payload_fill=np.int64(0),
        empty_dtypes={"l_orderkey": "int64", "rev": "int64",
                      "o_date_us": "int64"},
    )
    agg = rename(
        bucketed_sum(joined, ["l_orderkey", "o_date_us"], "rev"),
        {"rev": "revenue_cents"},
    )

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["revenue_cents", "l_orderkey"],
                             ascending=[False, True]).head(k)

    def finish(b: pd.DataFrame) -> pa.Table:
        b = local_topk(b)
        return pa.table({
            "l_orderkey": pa.array(b["l_orderkey"].astype("int64"),
                                   pa.int64()),
            "revenue_cents": pa.array(b["revenue_cents"].astype("int64"),
                                      pa.int64()),
            "o_orderdate": pa.array(
                pd.to_datetime(b["o_date_us"].astype("int64"), unit="us"),
                pa.timestamp("us")),
        })

    # typed empty seed: a tier where no order matches must still carry the
    # output schema (Ray skips map UDFs on zero-row blocks)
    seed = rd.from_arrow(pa.table({
        "l_orderkey": pa.array([], pa.int64()),
        "revenue_cents": pa.array([], pa.int64()),
        "o_orderdate": pa.array([], pa.timestamp("us")),
    }))
    return (
        agg.map_batches(local_topk, batch_format="pandas")
        .repartition(1)
        .map_batches(finish, batch_format="pandas", batch_size=None)
        .union(seed)
    )


def sql_q3(k: int = 10) -> str:
    return f"""
SELECT l_orderkey,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       o_orderdate
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{SEGMENT}'
  AND o_orderdate < DATE '{Q3_DATE}'
  AND l_shipdate > DATE '{Q3_DATE}'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue_cents DESC, l_orderkey
LIMIT {k}"""


# ------------------------------------------------------- nation revenue

def nation_revenue(sf_dir: str):
    """Revenue per customer nation.

    nation is a true constant (25 rows) and broadcasts; customer and
    orders grow with scale factor, so the order->nation attachment is two
    bucketed merge joins — orders pick up c_nationkey from the customer
    scan, lineitem revenue partials pick up the nation name from the
    mapped orders stream. No driver-side dict ever holds an SF-scale
    table, and ``Dataset.join`` stays banned (CLAUDE.md invariant)."""
    from ..functions.bucketing import bucketed_attach

    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()
    }
    nref = ray.put(nation)

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    )
    orders = bucketed_attach(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"]),
        cust, left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_orderkey"],
        payload={"c_nationkey": "c_nat"}, payload_fill=np.int64(0),
        empty_dtypes={"o_orderkey": "int64", "c_nat": "int64"},
    )

    class OrderNation:  # 25-key constant dimension: broadcast lookup
        def __init__(self):
            self.nation = ray.get(nref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "o_orderkey": b["o_orderkey"],
                "n_name": b["c_nat"].map(self.nation),
            })

    orders = orders.map_batches(OrderNation, batch_format="pandas",
                                concurrency=(1, 4))

    def rev_partial(b: pd.DataFrame) -> pd.DataFrame:
        rev = _cents(
            b["l_extendedprice"].to_numpy() * (1.0 - b["l_discount"].to_numpy())
        )
        out = pd.DataFrame({"l_orderkey": b["l_orderkey"], "rev": rev})
        return out.groupby("l_orderkey", as_index=False)["rev"].sum()

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    ).map_batches(rev_partial, batch_format="pandas")

    joined = bucketed_attach(
        li, orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["rev"], payload={"n_name": "n_name"}, payload_fill="",
        empty_dtypes={"rev": "int64", "n_name": object},
    )
    # n_name cardinality is tiny (25): native groupby-sum after the join
    return rename(
        joined.groupby("n_name").sum("rev"), {"sum(rev)": "revenue_cents"}
    )


def sql_nation_revenue() -> str:
    return """
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name"""


# ------------------------------------------------------------ events

def events_hourly(sf_dir: str):
    """Tumbling 1-hour windowed aggregate per user (streaming-shaped)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def derive(b: pa.Table) -> pa.Table:
        hour = pc.divide(pc.cast(b["ts"], pa.int64()), 3_600_000_000)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b["value"], 100.0), 0.5)), pa.int64()
        )
        return pa.table(
            {"user_id": b["user_id"], "hour": hour, "value_cents": cents}
        )

    return (
        ev.map_batches(derive, batch_format="pyarrow")
        .groupby(["user_id", "hour"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )


def sql_events_hourly() -> str:
    return """
SELECT user_id,
       epoch_us(ts) // 3600000000 AS hour,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS sum_value_cents
FROM events
GROUP BY user_id, hour"""


def events_sliding(sf_dir: str, step_s: int = 1800):
    """Sliding 1-hour window (step 30 min): every event lands in exactly two
    windows (size = 2 x step), emitted by a vectorized flat-map and
    aggregated per window_start."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def expand(b: pa.Table) -> pa.Table:
        sec = pc.divide(pc.cast(b["ts"], pa.int64()), 1_000_000)
        k = pc.divide(sec, step_s)
        cents = pc.cast(pc.floor(pc.add(pc.multiply(b["value"], 100.0), 0.5)),
                        pa.int64())
        w0 = pc.multiply(k, step_s)
        w1 = pc.multiply(pc.subtract(k, 1), step_s)
        return pa.table(
            {
                "window_start": pa.concat_arrays(
                    [w0.combine_chunks(), w1.combine_chunks()]
                ),
                "cents": pa.concat_arrays(
                    [cents.combine_chunks(), cents.combine_chunks()]
                ),
            }
        )

    return (
        ev.map_batches(expand, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Count(alias_name="n_events"),
                   Sum("cents", alias_name="sum_value_cents"))
    )


def sql_events_sliding(step_s: int = 1800) -> str:
    return f"""
WITH e AS (
  SELECT epoch_us(ts) // 1000000 AS sec,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
  FROM events
),
w AS (
  SELECT (sec // {step_s}) * {step_s} AS window_start, cents FROM e
  UNION ALL
  SELECT (sec // {step_s} - 1) * {step_s} AS window_start, cents FROM e
)
SELECT window_start, count(*) AS n_events,
       CAST(sum(cents) AS BIGINT) AS sum_value_cents
FROM w GROUP BY window_start"""


def events_hourly_users(sf_dir: str, n_buckets: int = 64):
    """Windowed COUNT DISTINCT: unique users per 1-hour tumbling window.
    Exact, one bucketed exchange: per-batch (hour, user) dedup partial ->
    (hour, user)-bucketed global dedup emitting per-hour partial counts
    (each pair lands in exactly one bucket, so bucket counts are disjoint)
    -> tiny hour-bounded final sum (n_buckets x |hours| rows)."""
    from ..functions.bucketing import bucketed_apply

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def derive(b: pa.Table) -> pa.Table:
        hour = pc.divide(pc.cast(b["ts"], pa.int64()), 3_600_000_000)
        return pa.table({"user_id": b["user_id"], "hour": hour})

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["hour", "user_id"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["hour", "user_id"])
        return (g.groupby("hour", sort=False).size()
                .rename("n_users").reset_index())

    def final(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("hour", sort=False, as_index=False)["n_users"].sum()
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return (
        bucketed_apply(ev.map_batches(derive, batch_format="pyarrow"),
                       ["hour", "user_id"], merge, partial, n_buckets)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def sql_events_hourly_users() -> str:
    return """
SELECT epoch_us(ts) // 3600000000 AS hour,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY hour"""


def events_sliding_users(sf_dir: str, step_s: int = 1800,
                         n_buckets: int = 64):
    """Sliding-window COUNT DISTINCT: unique users per 1-hour window
    stepping every 30 min — the composition of events_sliding's window
    expansion (each event lands in exactly two windows) with
    events_hourly_users' exact one-exchange distinct: per-batch
    (window, user) dedup partial -> (window, user)-bucketed global dedup
    emitting per-window partial counts (disjoint across buckets) ->
    window-bounded final sum. DISTINCT over overlapping windows is the
    aggregate that does NOT decompose into tumbling partials — the
    row-amplification + keyed-dedup shape here is the standard exact
    answer; the sketch path (events_hll_users) is the approximate one."""
    from ..functions.bucketing import bucketed_apply

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def expand(b: pa.Table) -> pa.Table:
        sec = pc.divide(pc.cast(b["ts"], pa.int64()), 1_000_000)
        k = pc.divide(sec, step_s)
        w0 = pc.multiply(k, step_s)
        w1 = pc.multiply(pc.subtract(k, 1), step_s)
        u = b["user_id"].combine_chunks()
        return pa.table({
            "window_start": pa.concat_arrays(
                [w0.combine_chunks(), w1.combine_chunks()]),
            "user_id": pa.concat_arrays([u, u])})

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates(["window_start", "user_id"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["window_start", "user_id"])
        return (g.groupby("window_start", sort=False).size()
                .rename("n_users").reset_index())

    def final(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("window_start", sort=False,
                        as_index=False)["n_users"].sum()
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return (
        bucketed_apply(ev.map_batches(expand, batch_format="pyarrow"),
                       ["window_start", "user_id"], merge, partial,
                       n_buckets)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def sql_events_sliding_users(step_s: int = 1800) -> str:
    return f"""
WITH e AS (
  SELECT epoch_us(ts) // 1000000 AS sec, user_id FROM events
),
w AS (
  SELECT (sec // {step_s}) * {step_s} AS window_start, user_id FROM e
  UNION ALL
  SELECT (sec // {step_s} - 1) * {step_s} AS window_start, user_id FROM e
)
SELECT window_start, count(DISTINCT user_id) AS n_users
FROM w GROUP BY window_start"""


SESSION_GAP_US = 1_800_000_000  # 30 min


def events_sessions(sf_dir: str):
    """Sessionization: per-user session count under a 30-minute idle gap —
    the ordered-log window pattern (groupby key, sort by ts in the group)."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])

    def sessions(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        e = g["ts"].astype("int64")
        n = 1 + int((e.diff().fillna(0) > SESSION_GAP_US).sum())
        return pd.DataFrame({"user_id": [g["user_id"].iloc[0]], "n_sessions": [n]})

    return ev.groupby("user_id").map_groups(sessions, batch_format="pandas")


def sql_events_sessions() -> str:
    return f"""
WITH d AS (
  SELECT user_id,
         epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
  FROM events
)
SELECT user_id,
       1 + count(*) FILTER (WHERE gap > {SESSION_GAP_US}) AS n_sessions
FROM d GROUP BY user_id"""


def events_running_total(sf_dir: str, n_buckets: int = 64):
    """Ordered window function: per-user running total of value_cents over
    (ts, event_id) order — one user-bucketed exchange, then a single
    vectorized sort + groupby-cumsum per bucket (no per-user Python
    calls). Output is event-grain, streaming out one block per bucket."""
    from ..functions.bucketing import bucketed_apply

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["event_id", "user_id", "ts"]].copy()
        out["cents"] = np.floor(
            b["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g["running_cents"] = g.groupby("user_id", sort=False)["cents"].cumsum()
        return g[["event_id", "user_id", "ts", "running_cents"]]

    return bucketed_apply(ev, ["user_id"], merge, prep, n_buckets)


def sql_events_running_total() -> str:
    return """
SELECT event_id, user_id, ts,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
            OVER (PARTITION BY user_id ORDER BY ts, event_id)
            AS BIGINT) AS running_cents
FROM events"""


def events_psi(sf_dir: str, quant: int = 1_000_000):
    """Population Stability Index of the event-type mix between the
    first and second time halves (the ML-monitoring drift gate):
    ONE row (n_types, n_first, n_second, psi) with
    psi = sum_i (p_i - q_i) * ln(p_i / q_i) over add-one-smoothed type
    shares, halves split at the midpoint of the event-time range.

    Exactness: every per-type term is ONE double expression evaluated
    in a FIXED order on both sides (ratios of exactly-converted ints,
    libm LN), and the cross-type sum is a LEFT FOLD over types sorted
    by name — DuckDB's list_sum(list(term ORDER BY ...)) is the same
    left fold (the events_type_hour_mi precedent). Enum-bounded
    contingency partials; the threshold comes from two cheap min/max
    aggregates broadcast into the scan."""
    def scan():
        return rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({"t": t["ts"].cast(pa.int64()),
                         "event_type": t["event_type"]})

    ts = scan().map_batches(prep, batch_format="pyarrow")
    lo = int(ts.min("t"))
    hi = int(ts.max("t"))
    thr = (lo + hi) // 2

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        first = (b["t"].to_numpy(np.int64) < thr).astype(np.int64)
        out = pd.DataFrame({"event_type": b["event_type"],
                            "a": first, "b": 1 - first})
        return out.groupby("event_type", sort=False,
                           as_index=False).sum()

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        import math

        g = b.groupby("event_type", as_index=False)[["a", "b"]].sum()
        g = g.sort_values("event_type").reset_index(drop=True)
        t_n = len(g)
        big_a = int(g["a"].sum()) + t_n
        big_b = int(g["b"].sum()) + t_n
        psi = 0.0
        for a, bb in zip(g["a"].astype(int) + 1,
                         g["b"].astype(int) + 1):
            term = ((float(a) / float(big_a) - float(bb) / float(big_b))
                    * math.log(float(a * big_b) / float(bb * big_a)))
            psi += term  # left fold in event_type order
        return pd.DataFrame({
            "n_types": pd.Series([t_n], dtype="int64"),
            "n_first": pd.Series([big_a - t_n], dtype="int64"),
            "n_second": pd.Series([big_b - t_n], dtype="int64"),
            "psi": pd.Series([psi], dtype="float64")})

    return (ts.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def sql_events_psi() -> str:
    """Oracle for events_psi: identical smoothed terms in the identical
    type order, summed by DuckDB's ordered-list left fold."""
    return """
WITH b AS (SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS thr
           FROM events),
cnt AS (
  SELECT event_type,
         CAST(sum(CASE WHEN epoch_us(ts) < b.thr THEN 1 ELSE 0 END)
              AS BIGINT) + 1 AS a,
         CAST(sum(CASE WHEN epoch_us(ts) < b.thr THEN 0 ELSE 1 END)
              AS BIGINT) + 1 AS bb
  FROM events, b GROUP BY event_type),
tot AS (SELECT CAST(sum(a) AS BIGINT) AS big_a,
               CAST(sum(bb) AS BIGINT) AS big_b,
               CAST(count(*) AS BIGINT) AS t_n FROM cnt)
SELECT tot.t_n AS n_types,
       tot.big_a - tot.t_n AS n_first,
       tot.big_b - tot.t_n AS n_second,
       (SELECT list_sum(list(
            (CAST(a AS DOUBLE) / big_a - CAST(bb AS DOUBLE) / big_b)
            * LN(CAST(a * big_b AS DOUBLE) / CAST(bb * big_a AS DOUBLE))
          ORDER BY event_type))
        FROM cnt, tot) AS psi
FROM tot"""


GAP_HORIZONS_US = (60_000_000, 300_000_000, 3_600_000_000,
                   21_600_000_000, 86_400_000_000)  # 1m 5m 1h 6h 1d


def events_gap_survival(sf_dir: str, n_buckets: int = 64):
    """Inter-event gap SURVIVAL curve (the churn/re-engagement grain):
    Dataset(horizon_us, n_gaps, n_exceed, survival) — over all per-user
    adjacent gaps, the fraction exceeding each fixed horizon (1m, 5m,
    1h, 6h, 1d). Exact integer counts per horizon (enum-bounded), ONE
    division per row.

    Scale shape: the events_user_gaps sorted-diff bucket pass, but the
    partial is a horizons-bounded (threshold, count) table — nothing
    user-scale leaves the bucket."""
    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "t": t["ts"].cast(pa.int64()),
        })

    hz = np.asarray(GAP_HORIZONS_US, dtype=np.int64)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"horizon_us": pd.Series([], dtype="int64"),
                              "n_gaps": pd.Series([], dtype="int64"),
                              "n_exceed": pd.Series([], dtype="int64")})
        if len(g) < 2:
            return empty
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["t"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        if not same.any():
            return empty
        gaps = (t[1:] - t[:-1])[same]
        return pd.DataFrame({
            "horizon_us": hz,
            "n_gaps": np.full(len(hz), len(gaps), dtype=np.int64),
            "n_exceed": (gaps[None, :] > hz[:, None]).sum(
                axis=1).astype(np.int64)})

    parts = bucketed_apply(ds.map_batches(prep, batch_format="pyarrow"),
                           ["user_id"], merge, None, n_buckets)

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("horizon_us", as_index=False)[
            ["n_gaps", "n_exceed"]].sum()
        g = g.sort_values("horizon_us").reset_index(drop=True)
        return pd.DataFrame({
            "horizon_us": g["horizon_us"].astype("int64"),
            "n_gaps": g["n_gaps"].astype("int64"),
            "n_exceed": g["n_exceed"].astype("int64"),
            "survival": (g["n_exceed"].to_numpy(np.int64)
                         / g["n_gaps"].to_numpy(np.int64).astype(
                             np.float64))})

    return (parts.repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def sql_events_gap_survival() -> str:
    """Oracle for events_gap_survival: lag() gaps, one row per fixed
    horizon."""
    arms = "\nUNION ALL\n".join(
        f"SELECT CAST({h} AS BIGINT) AS horizon_us,"
        f" CAST(count(*) AS BIGINT) AS n_gaps,"
        f" CAST(sum(CASE WHEN gap > {h} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS n_exceed FROM gaps"
        for h in GAP_HORIZONS_US)
    return f"""
WITH seq AS (
  SELECT user_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY epoch_us(ts), event_id)
           AS prev_t
  FROM events
),
gaps AS (SELECT t - prev_t AS gap FROM seq WHERE prev_t IS NOT NULL)
SELECT horizon_us, n_gaps, n_exceed,
       CAST(n_exceed AS DOUBLE) / n_gaps AS survival
FROM ({arms})"""


def events_user_gaps(sf_dir: str, n_buckets: int = 64):
    """Ordered LAG window: per-user inter-event gap statistics
    (n_gaps, min/max/sum in microseconds, mean as one exact-int division)
    for users with >= 2 events. One user-bucketed exchange; the per-bucket
    merge sorts once and diffs the whole bucket vectorized (user
    boundaries masked) — no per-user Python calls."""
    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "t": t["ts"].cast(pa.int64()),  # microseconds since epoch
        })

    _empty = {
        "user_id": pd.Series([], dtype="int64"),
        "n_gaps": pd.Series([], dtype="int64"),
        "min_gap_us": pd.Series([], dtype="int64"),
        "max_gap_us": pd.Series([], dtype="int64"),
        "sum_gap_us": pd.Series([], dtype="int64"),
        "mean_gap_us": pd.Series([], dtype="float64"),
    }

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(_empty)
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["t"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame(_empty)
        gaps = pd.DataFrame({"user_id": u[1:][same],
                             "gap": (t[1:] - t[:-1])[same]})
        agg = gaps.groupby("user_id", sort=False).agg(
            n_gaps=("gap", "size"), min_gap_us=("gap", "min"),
            max_gap_us=("gap", "max"), sum_gap_us=("gap", "sum"),
        ).reset_index()
        # ONE IEEE division of exact ints (repo float invariant)
        agg["mean_gap_us"] = (agg["sum_gap_us"].to_numpy(np.float64)
                              / agg["n_gaps"].to_numpy(np.int64))
        for c in ("n_gaps", "min_gap_us", "max_gap_us", "sum_gap_us"):
            agg[c] = agg[c].astype("int64")
        return agg

    return bucketed_apply(ds.map_batches(prep, batch_format="pyarrow"),
                          ["user_id"], merge, None, n_buckets)


def events_hour_profile(sf_dir: str):
    """Hour-of-day seasonality profile: per (hour 0-23, event_type) the
    event count and exact cents sum — the diurnal-load report a streaming
    pipeline publishes. Pure modulo-time grouping: one vectorized
    hour-extraction map + a coalesced enum-bounded count (24 x types
    keys), zero wide shuffles."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame({
            "hour": b["ts"].dt.hour.astype("int64"),
            "event_type": b["event_type"],
            "n": np.ones(len(b), dtype=np.int64),
            "cents": np.floor(
                b["value"].to_numpy() * 100.0 + 0.5).astype(np.int64),
        })
        return p.groupby(["hour", "event_type"],
                         as_index=False)[["n", "cents"]].sum()

    parts = ds.map_batches(partial, batch_format="pandas")
    frames = list(parts.iter_batches(batch_format="pandas",
                                     batch_size=None))
    df = (pd.concat(frames, ignore_index=True)
          .groupby(["hour", "event_type"], as_index=False)[["n", "cents"]]
          .sum())  # 24 x enum keys
    df["n"] = df["n"].astype("int64")
    df["cents"] = df["cents"].astype("int64")
    return rd.from_pandas(df)


def events_daily_active(sf_dir: str, n_buckets: int = 64):
    """Calendar-window distinct: DAILY ACTIVE USERS — per date the exact
    distinct user count. Two-phase: (date, user) bucketed distinct (the
    fact-scale dedup), then an enum-bounded per-date fold. The distinct
    pass is the scale step; the date universe is calendar-bounded."""
    from ..functions.bucketing import bucketed_distinct

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"d": b["ts"].dt.strftime("%Y-%m-%d"),
                             "user_id": b["user_id"]})

    du = bucketed_distinct(ev.map_batches(prep, batch_format="pandas"),
                           ["d", "user_id"], n_buckets)
    frames = list(
        du.map_batches(
            lambda b: b.groupby("d", sort=False).size()
                       .rename("dau").reset_index(),
            batch_format="pandas")
        .iter_batches(batch_format="pandas", batch_size=None))
    df = (pd.concat(frames, ignore_index=True)
          .groupby("d", as_index=False)["dau"].sum())  # calendar-bounded
    df["dau"] = df["dau"].astype("int64")
    return rd.from_pandas(df.sort_values("d", kind="mergesort")
                          .reset_index(drop=True))


def sql_events_daily_active() -> str:
    return """
SELECT strftime(ts, '%Y-%m-%d') AS d,
       CAST(count(DISTINCT user_id) AS BIGINT) AS dau
FROM events GROUP BY 1"""


def sql_events_hour_profile() -> str:
    return """
SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour, event_type,
       count(*) AS n,
       CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS cents
FROM events GROUP BY 1, 2"""


def doc_tokens_median_by_lang(sf_dir: str):
    """Median token count per language — the iterative histogram
    selection generalized to a DERIVED integer column of a second table
    (the corpus-stats report a data pipeline publishes per shard). The
    token count is re-derived vectorized inside every selection pass, so
    no token-count table materializes."""
    from ..functions.quantiles import grouped_exact_ranks

    def scan():
        ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                             columns=["lang", "text"])

        def toks(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "lang": b["lang"],
                "n_tokens": b["text"].str.count(r"\S+").astype("int64")})

        return ds.map_batches(toks, batch_format="pandas")

    counts = {r["lang"]: int(r["count()"])
              for r in scan().groupby("lang").count().take_all()}
    targets = {g: [("m1", (n - 1) // 2), ("m2", n // 2)]
               for g, n in counts.items()}
    got = grouped_exact_ranks(scan, "lang", "n_tokens", targets)
    langs = sorted(counts)
    return rd.from_pandas(pd.DataFrame({
        "lang": langs,
        "median_tokens": [(got[(g, "m1")] + got[(g, "m2")]) / 2
                          for g in langs],
    }))


def sql_doc_tokens_median_by_lang() -> str:
    return r"""
SELECT lang,
       median(CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT))
         AS median_tokens
FROM documents GROUP BY lang"""


def events_first_touch(sf_dir: str, n_buckets: int = 64):
    """FIRST_VALUE window shape (first-touch attribution): each user's
    FIRST event (by ts, event_id) assigns their acquisition channel;
    output is the per-channel user count. One user-bucketed exchange;
    the per-bucket first row per user is a vectorized sort + duplicated
    mask, the channel rollup is enum-bounded."""
    from ..functions.bucketing import bucketed_apply

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts",
                                  "event_type"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "user_id" not in g.columns:
            return pd.DataFrame({
                "first_type": pd.Series([], dtype=object),
                "n_users": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        first = g[~g["user_id"].duplicated()]
        out = (first.groupby("event_type", as_index=False)
               .size().rename(columns={"event_type": "first_type",
                                       "size": "n_users"}))
        out["n_users"] = out["n_users"].astype("int64")
        return out

    parts = bucketed_apply(ev, ["user_id"], merge, None, n_buckets)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        # enum-bounded rollup of the per-bucket partials
        out = b.groupby("first_type", as_index=False)["n_users"].sum()
        out["n_users"] = out["n_users"].astype("int64")
        return out

    frames = list(parts.iter_batches(batch_format="pandas",
                                     batch_size=None))
    df = final(pd.concat(frames, ignore_index=True) if frames
               else pd.DataFrame({"first_type": [], "n_users": []}))
    return rd.from_pandas(df)


def sql_events_first_touch() -> str:
    return """
WITH f AS (
  SELECT user_id,
         first_value(event_type)
           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS first_type
  FROM events
)
SELECT first_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM f GROUP BY first_type"""


def events_trailing_avg(sf_dir: str, frame: int = 3, n_buckets: int = 64):
    """FRAME-BOUNDED window aggregate (``ROWS 2 PRECEDING AND CURRENT
    ROW``): per event, the trailing ``frame``-row sum/count/mean of value
    over (ts, event_id) order within the user partition — the window shape
    running_total (unbounded frame) and user_gaps (LAG) don't cover.

    One user-bucketed exchange; the per-bucket merge sorts once and
    computes every frame with pure cumsum arithmetic — trailing sum =
    cs[i] - cs[i - k] where k = min(within-user row index + 1, frame), all
    vectorized, no per-user Python calls. trail_avg is ONE IEEE division
    of exact ints (cents / (100 * k)), bit-identical to the SQL window."""
    from ..functions.bucketing import bucketed_apply

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        out = b[["event_id", "user_id", "ts"]].copy()
        out["cents"] = np.floor(
            b["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        return out

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "user_id" not in g.columns:
            return pd.DataFrame({
                "event_id": pd.Series([], dtype="int64"),
                "user_id": pd.Series([], dtype="int64"),
                "ts": pd.Series([], dtype="datetime64[us]"),
                "trail_cents": pd.Series([], dtype="int64"),
                "trail_n": pd.Series([], dtype="int64"),
                "trail_avg": pd.Series([], dtype="float64"),
            })
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        c = g["cents"].to_numpy(np.int64)
        cs = np.concatenate([[0], np.cumsum(c)])
        idx = g.groupby("user_id", sort=False).cumcount().to_numpy(np.int64)
        k = np.minimum(idx + 1, frame)
        pos = np.arange(len(g), dtype=np.int64) + 1
        trail = cs[pos] - cs[pos - k]
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(),
            "user_id": g["user_id"].to_numpy(),
            "ts": g["ts"].to_numpy(),
            "trail_cents": trail,
            "trail_n": k,
            "trail_avg": trail / (100.0 * k),
        })

    return bucketed_apply(ev, ["user_id"], merge, prep, n_buckets)


def sql_events_trailing_avg(frame: int = 3) -> str:
    return f"""
SELECT event_id, user_id, ts,
       CAST(sum(c) OVER w AS BIGINT) AS trail_cents,
       CAST(count(*) OVER w AS BIGINT) AS trail_n,
       CAST(sum(c) OVER w AS DOUBLE) / (100 * count(*) OVER w) AS trail_avg
FROM (SELECT event_id, user_id, ts,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN {frame - 1} PRECEDING AND CURRENT ROW)"""


def sql_events_user_gaps() -> str:
    return """
WITH o AS (
  SELECT user_id, epoch_us(ts) AS t,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id
                                 ORDER BY ts, event_id) AS pt
  FROM events
),
g AS (SELECT user_id, t - pt AS gap FROM o WHERE pt IS NOT NULL)
SELECT user_id, count(*) AS n_gaps,
       min(gap) AS min_gap_us, max(gap) AS max_gap_us,
       CAST(sum(gap) AS BIGINT) AS sum_gap_us,
       1.0 * CAST(sum(gap) AS BIGINT) / count(*) AS mean_gap_us
FROM g GROUP BY user_id"""


def part_copurchase_topk(sf_dir: str, k: int = 25, n_buckets: int = 64):
    """Market-basket pair mining: top-k part pairs by co-occurrence across
    orders -> (rk, part_a, part_b, n).

    Same shape as the KG support-pair stage at relational grain: an order's
    lines can span input blocks, so pair generation happens after ONE
    orderkey-bucketed exchange (per-order fanout is bounded — TPC-H orders
    have <= 7-ish parts); pair counts partial-aggregate inside the bucket
    (a vectorized self-merge, no per-order Python), then one pair-bucketed
    sum and a partial-capped top-k."""
    from ..functions.bucketing import bucketed_apply, bucketed_sum

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])

    def dedup(b: pd.DataFrame) -> pd.DataFrame:
        return b.drop_duplicates()

    _empty = {
        "part_a": pd.Series([], dtype="int64"),
        "part_b": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
    }

    def pair_counts(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["l_orderkey", "l_partkey"])
        m = g.merge(g, on="l_orderkey")
        m = m[m["l_partkey_x"] < m["l_partkey_y"]]
        if len(m) == 0:
            return pd.DataFrame(_empty)
        out = (m.groupby(["l_partkey_x", "l_partkey_y"], sort=False)
               .size().rename("n").reset_index())
        return out.rename(columns={"l_partkey_x": "part_a",
                                   "l_partkey_y": "part_b"})

    counted = bucketed_apply(li, ["l_orderkey"], pair_counts, dedup,
                             n_buckets)
    agg = bucketed_sum(counted, ["part_a", "part_b"], "n", n_buckets)

    by, asc = ["n", "part_a", "part_b"], [False, True, True]

    def local_topk(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(by, ascending=asc, kind="mergesort").head(k)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(by, ascending=asc, kind="mergesort").head(k)
        b = b.reset_index(drop=True)
        b["rk"] = np.arange(1, len(b) + 1)
        b["n"] = b["n"].astype("int64")
        return b[["rk", "part_a", "part_b", "n"]]

    return (agg.map_batches(local_topk, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def sql_part_copurchase_topk(k: int = 25) -> str:
    return f"""
WITH pp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n
  FROM pp a JOIN pp b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
)
SELECT rk, part_a, part_b, n FROM (
  SELECT row_number() OVER (ORDER BY n DESC, part_a, part_b) AS rk,
         part_a, part_b, n
  FROM pairs
) WHERE rk <= {k}"""


def events_funnel(sf_dir: str, n_buckets: int = 64):
    """Funnel analysis: for every ordered event-type pair (a, b), the
    number of users whose FIRST a precedes their LAST b ->
    (step_a, step_b, n_users).

    Per-batch partial min/max ts per (user, type) shrinks the exchange to
    user x type rows; one user-bucketed fold completes the extrema; the
    pair comparison is a vectorized per-user self-merge inside the bucket
    (type fan-out is enum-bounded); the final count is a tiny native
    aggregate."""
    from ..functions.bucketing import bucketed_apply

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_type": t["event_type"],
            "t": t["ts"].cast(pa.int64()),
        })

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby(["user_id", "event_type"], as_index=False).agg(
            mn=("t", "min"), mx=("t", "max"))

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["user_id", "event_type"], as_index=False).agg(
            mn=("mn", "min"), mx=("mx", "max"))
        p = m.merge(m, on="user_id")
        p = p[(p["event_type_x"] != p["event_type_y"])
              & (p["mn_x"] < p["mx_y"])]
        out = (p.groupby(["event_type_x", "event_type_y"], sort=False)
               .size().rename("n_users").reset_index())
        return out.rename(columns={"event_type_x": "step_a",
                                   "event_type_y": "step_b"})

    folded = bucketed_apply(ev.map_batches(prep, batch_format="pyarrow"),
                            ["user_id"], merge, partial, n_buckets)
    return rename(
        folded.groupby(["step_a", "step_b"]).sum("n_users"),
        {"sum(n_users)": "n_users"},
    )


def sql_events_funnel() -> str:
    return """
WITH m AS (
  SELECT user_id, event_type, min(ts) AS mn, max(ts) AS mx
  FROM events GROUP BY user_id, event_type
)
SELECT a.event_type AS step_a, b.event_type AS step_b,
       count(*) AS n_users
FROM m a JOIN m b
  ON a.user_id = b.user_id AND a.event_type <> b.event_type
WHERE a.mn < b.mx
GROUP BY step_a, step_b"""


def lineitem_qty_price_corr(sf_dir: str):
    """Moment-based distributed Pearson correlation of quantity vs
    extended price per return flag -> (l_returnflag, n, corr).

    The five moment sums (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as EXACT
    int64 partials inside the scan (x = quantity units, y = price cents),
    so the shuffle carries six ints per (flag, batch) and the merge is
    associative integer addition — bit-identical at any parallelism. Only
    the final correlation converts to float, with the same operation order
    as the oracle expression (products of exact ints promoted one at a
    time via 1.0*), so the doubles match bit-for-bit."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_quantity", "l_extendedprice"],
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = b["l_quantity"].to_numpy().astype(np.int64)  # integral qty
        y = _cents(b["l_extendedprice"].to_numpy())
        df = pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "n": np.ones(len(b), dtype=np.int64),
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x, "syy": y * y,
        })
        return df.groupby("l_returnflag", as_index=False).sum()

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("l_returnflag")
           .aggregate(Sum("n", alias_name="n"),
                      Sum("sx", alias_name="sx"),
                      Sum("sy", alias_name="sy"),
                      Sum("sxy", alias_name="sxy"),
                      Sum("sxx", alias_name="sxx"),
                      Sum("syy", alias_name="syy")))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        import math

        # EXACT arbitrary-precision integer moments (Python int == the
        # oracle's HUGEINT), ONE rounding each at the double conversion —
        # group-bounded rows, so the per-row loop is free
        corrs = []
        for n, sx, sy, sxy, sxx, syy in zip(
            b["n"], b["sx"], b["sy"], b["sxy"], b["sxx"], b["syy"]
        ):
            n, sx, sy = int(n), int(sx), int(sy)
            sxy, sxx, syy = int(sxy), int(sxx), int(syy)
            num = n * sxy - sx * sy
            dxx, dyy = n * sxx - sx * sx, n * syy - sy * sy
            corrs.append(float(num)
                         / (math.sqrt(float(dxx)) * math.sqrt(float(dyy))))
        return pd.DataFrame({
            "l_returnflag": b["l_returnflag"],
            "n": b["n"].astype("int64"),
            "corr": np.array(corrs, dtype=np.float64),
        })

    return agg.map_batches(finish, batch_format="pandas")


def sql_lineitem_qty_price_corr() -> str:
    return """
WITH m AS (
  SELECT l_returnflag,
         count(*) AS n,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sx,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sy,
         CAST(sum(CAST(l_quantity AS BIGINT)
                  * CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sxy,
         CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
              AS BIGINT) AS sxx,
         CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
                  * CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS syy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * sx AS DOUBLE))
            * sqrt(CAST(CAST(n AS HUGEINT) * syy
                        - CAST(sy AS HUGEINT) * sy AS DOUBLE))) AS corr
FROM m"""


ORDERS_YEAR = 1996


def orders_priority_year(sf_dir: str):
    """Predicate pushdown at the read: per-priority order count + value for
    one order year. The date filter is a pyarrow expression handed to the
    parquet scan (``filter=``), so row groups outside the year never leave
    storage — the prune-at-the-read pattern every 100 TB scan needs."""
    from datetime import datetime

    import pyarrow.compute as pc

    lo = pa.scalar(datetime(ORDERS_YEAR, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(ORDERS_YEAR + 1, 1, 1), pa.timestamp("us"))
    ds = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_totalprice"],
        filter=(pc.field("o_orderdate") >= lo)
        & (pc.field("o_orderdate") < hi),
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderpriority": b["o_orderpriority"],
            "cents": _cents(b["o_totalprice"].to_numpy()),
        }).groupby("o_orderpriority", as_index=False).agg(
            n=("cents", "size"), cents=("cents", "sum"))

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("o_orderpriority")
           .aggregate(Sum("n", alias_name="n_orders"),
                      Sum("cents", alias_name="total_cents")))

    def fix(b: pd.DataFrame) -> pd.DataFrame:
        b["n_orders"] = b["n_orders"].astype("int64")
        b["total_cents"] = b["total_cents"].astype("int64")
        return b

    return agg.map_batches(fix, batch_format="pandas")


def sql_orders_priority_year() -> str:
    return f"""
SELECT o_orderpriority, count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS total_cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '{ORDERS_YEAR}-01-01'
  AND o_orderdate < TIMESTAMP '{ORDERS_YEAR + 1}-01-01'
GROUP BY o_orderpriority"""


HIST_BIN_WIDTH = 50.0


def events_value_histogram(sf_dir: str):
    """Fixed-width binned histogram per event type -> (event_type, bin, n).
    Binning is a vectorized floor-divide inside the scan (same IEEE ops as
    the oracle's floor(value / width)); the groupby key space is tiny
    (types x bins), so partials collapse in one native aggregate."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        bins = np.floor(b["value"].to_numpy()
                        / HIST_BIN_WIDTH).astype(np.int64)
        df = pd.DataFrame({"event_type": b["event_type"], "bin": bins})
        return (df.groupby(["event_type", "bin"], sort=False)
                .size().rename("n").reset_index())

    return rename(
        ev.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "bin"]).sum("n"),
        {"sum(n)": "n"},
    )


def sql_events_value_histogram() -> str:
    return f"""
SELECT event_type, CAST(floor(value / {HIST_BIN_WIDTH}) AS BIGINT) AS bin,
       count(*) AS n
FROM events GROUP BY event_type, bin"""


# -------------------------------------------------------------- Q7 shape

Q7_NATIONS = ("NATION_1", "NATION_2")


def q7_nation_trade(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q7 shape: bilateral trade volume between two nations per ship
    year. supplier->nation and customer->nation are dimension maps
    (broadcast once); lineitem streams with a per-batch partial keyed on
    (orderkey, supp_nation, year); the supplier->nation and
    customer->nation attachments are bucketed merge joins (supplier and
    customer grow with scale factor — only the 25-row nation table
    broadcasts), and the order->cust_nation attachment is the same
    bucketed merge join — Ray 2.49's hash-shuffle ``Dataset.join`` raises
    ArrowInvalid when a hash partition comes up empty (tiny tiers /
    sparse filters), the same failure mode as acero, so fact joins here
    always go through ``bucketing`` (CLAUDE.md invariant); the final
    groupby is tiny (2 directions x years)."""
    from ..functions.bucketing import bucketed_attach

    nation = {
        r["n_nationkey"]: r["n_name"]
        for r in rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()
    }
    pair = set(Q7_NATIONS)
    pair_keys = {k for k, v in nation.items() if v in pair}
    nref = ray.put(nation)

    orders = bucketed_attach(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"]),
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"]),
        left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_orderkey"],
        payload={"c_nationkey": "c_nat"}, payload_fill=np.int64(0),
        n_buckets=n_buckets,
        empty_dtypes={"o_orderkey": "int64", "c_nat": "int64"},
    )

    class OrderNation:  # 25-key constant: broadcast name lookup + pair prune
        def __init__(self):
            self.nation = ray.get(nref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            keep = b["c_nat"].isin(pair_keys).to_numpy()
            b = b[keep]
            return pd.DataFrame({"o_orderkey": b["o_orderkey"],
                                 "cust_nation": b["c_nat"].map(self.nation)})

    orders = orders.map_batches(OrderNation, batch_format="pandas",
                                concurrency=(1, 4))

    def li_derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "l_year": b["l_shipdate"].dt.year.astype("int64"),
            "rev": _cents(b["l_extendedprice"].to_numpy()
                          * (1.0 - b["l_discount"].to_numpy())),
        })

    li_sn = bucketed_attach(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount", "l_shipdate"],
        ).map_batches(li_derive, batch_format="pandas"),
        rd.read_parquet(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]),
        left_on="l_suppkey", right_on="s_suppkey",
        left_cols=["l_orderkey", "l_year", "rev"],
        payload={"s_nationkey": "s_nat"}, payload_fill=np.int64(0),
        n_buckets=n_buckets,
        empty_dtypes={"l_orderkey": "int64", "l_year": "int64",
                      "rev": "int64", "s_nat": "int64"},
    )

    class LiPartial:
        def __init__(self):
            self.nation = ray.get(nref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            keep = b["s_nat"].isin(pair_keys).to_numpy()
            b = b[keep]
            out = pd.DataFrame({
                "l_orderkey": b["l_orderkey"],
                "supp_nation": b["s_nat"].map(self.nation),
                "l_year": b["l_year"],
                "rev": b["rev"],
            })
            return out.groupby(["l_orderkey", "supp_nation", "l_year"],
                               as_index=False)["rev"].sum()

    li = li_sn.map_batches(LiPartial, batch_format="pandas",
                           concurrency=(1, 8))

    joined = bucketed_attach(
        li, orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["supp_nation", "l_year", "rev"],
        payload={"cust_nation": "cust_nation"}, payload_fill="",
        left_fill={"supp_nation": ""}, n_buckets=n_buckets,
    )

    def partial_fold(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["supp_nation"] != b["cust_nation"]]
        return (b.groupby(["supp_nation", "cust_nation", "l_year"],
                          sort=False, as_index=False)["rev"].sum())

    def final(b: pd.DataFrame) -> pa.Table:
        g = (b.groupby(["supp_nation", "cust_nation", "l_year"],
                       sort=False, as_index=False)["rev"].sum()
             if len(b) else b)
        return pa.table({
            "supp_nation": pa.array(g["supp_nation"], pa.string()),
            "cust_nation": pa.array(g["cust_nation"], pa.string()),
            "l_year": pa.array(g["l_year"], pa.int64()),
            "revenue_cents": pa.array(g["rev"], pa.int64()),
        })

    seed = rd.from_arrow(pa.table({
        "supp_nation": pa.array([], pa.string()),
        "cust_nation": pa.array([], pa.string()),
        "l_year": pa.array([], pa.int64()),
        "revenue_cents": pa.array([], pa.int64()),
    }))
    # union a typed empty seed: Ray skips map UDFs on zero-row blocks, so
    # a tier where the nation pair traded nothing would otherwise emit a
    # SCHEMA-LESS empty dataset (schema() is None)
    return (joined.map_batches(partial_fold, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None)
            .union(seed))


def sql_q7_nation_trade() -> str:
    n1, n2 = Q7_NATIONS
    return f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(rev) AS BIGINT) AS revenue_cents
FROM (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
              AS BIGINT) AS rev
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation ns ON ns.n_nationkey = s_nationkey
  JOIN nation nc ON nc.n_nationkey = c_nationkey
  WHERE ns.n_name IN ('{n1}', '{n2}') AND nc.n_name IN ('{n1}', '{n2}')
    AND ns.n_name <> nc.n_name
)
GROUP BY supp_nation, cust_nation, l_year"""


def customer_order_counts(sf_dir: str, n_buckets: int = 64):
    """LEFT OUTER aggregate: every customer with their order count,
    including zero. Expressed without an outer-join operator: the order
    counts union a zero row per customer, and one bucketed sum folds them
    — valid because o_custkey is a foreign key into customer, so the union
    key set IS the customer key set."""
    from ..functions.bucketing import bucketed_count, bucketed_sum

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey"])
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    counts = bucketed_count(orders, ["o_custkey"], name="n_orders",
                            n_buckets=n_buckets).map_batches(
        lambda b: pd.DataFrame({
            "c_custkey": b["o_custkey"].astype("int64"),
            "n_orders": b["n_orders"].astype("int64"),
        }), batch_format="pandas")
    zeros = cust.map_batches(
        lambda b: pd.DataFrame({
            "c_custkey": b["c_custkey"].astype("int64"),
            "n_orders": np.zeros(len(b), dtype=np.int64),
        }), batch_format="pandas")
    return bucketed_sum(counts.union(zeros), ["c_custkey"], "n_orders",
                        n_buckets=n_buckets).map_batches(
        lambda b: b.astype({"n_orders": "int64"}), batch_format="pandas")


def sql_customer_order_counts() -> str:
    return """
SELECT c_custkey, count(o.o_custkey) AS n_orders
FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c_custkey"""


# ------------------------------------------------------------ small ops

def part_topk(sf_dir: str, k: int = 20):
    ds = rd.read_parquet(f"{sf_dir}/part.parquet",
                         columns=["p_partkey", "p_name", "p_retailprice"])
    ds = ds.map_batches(
        lambda b: pd.DataFrame(
            {
                "p_partkey": b["p_partkey"],
                "p_name": b["p_name"],
                "price_cents": _cents(b["p_retailprice"].to_numpy()),
            }
        ),
        batch_format="pandas",
    )
    return ds.sort(["price_cents", "p_partkey"], descending=[True, False]).limit(k)


def sql_part_topk(k: int = 20) -> str:
    return f"""
SELECT p_partkey, p_name,
       CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) AS price_cents
FROM part ORDER BY price_cents DESC, p_partkey LIMIT {k}"""


# Knuth multiplicative hash: a deterministic pseudo-random ordering both
# the engine (vectorized int64 numpy) and DuckDB (BIGINT arithmetic) can
# compute identically. Safe from int64 overflow while id * A < 2^63
# (ids < ~3.4e9; asserted below, documented at scale in SCALE.md).
_SAMPLE_A = 2654435761
_SAMPLE_M = 1 << 32


def events_user_sample(sf_dir: str, k: int = 5):
    """Deterministic per-key sample: each user's ``k`` events with the
    smallest multiplicative hash of event_id — an order-stable,
    seed-free uniform-ish subsample (training-data "cap rows per group"
    op). Per-batch partials keep <= k rows per user before the exchange,
    so shuffle volume is O(users x k) like the top-k operator."""
    from ..functions.bucketing import bucketed_apply

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id"])

    by = ["user_id", "h", "event_id"]

    def topk(b: pd.DataFrame) -> pd.DataFrame:
        return (b.sort_values(by, kind="mergesort")
                .groupby("user_id", sort=False).head(k))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["event_id"].to_numpy()
        assert ids.max(initial=0) < (1 << 62) // _SAMPLE_A
        out = pd.DataFrame({
            "user_id": b["user_id"],
            "event_id": ids,
            "h": (ids * _SAMPLE_A) % _SAMPLE_M,
        })
        return topk(out)

    return bucketed_apply(ev, ["user_id"], topk, partial)


def sql_events_user_sample(k: int = 5) -> str:
    return f"""
SELECT user_id, event_id, h FROM (
  SELECT user_id, event_id,
         (event_id * {_SAMPLE_A}) % {_SAMPLE_M} AS h,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY (event_id * {_SAMPLE_A}) % {_SAMPLE_M},
                                     event_id) AS rn
  FROM events
) WHERE rn <= {k}"""


EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def events_type_pivot(sf_dir: str):
    """PIVOT: one row per user with per-event-type counts as columns.
    The type enum is a fixed, schema-level list (documented assumption —
    a pivot's output schema must be known up front); counts accumulate as
    per-batch partial crosstabs, so the exchange carries one row per
    (user, batch), never per event."""
    from ..functions.bucketing import bucketed_apply

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])
    cols = [f"n_{t}" for t in EVENT_TYPES]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        ct = pd.crosstab(b["user_id"], b["event_type"])
        for t in EVENT_TYPES:
            if t not in ct.columns:
                ct[t] = 0
        ct = ct[EVENT_TYPES].astype("int64")
        ct.columns = cols
        return ct.reset_index()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("user_id", sort=False, as_index=False)[cols].sum()

    return bucketed_apply(ev, ["user_id"], merge, partial)


def sql_events_type_pivot() -> str:
    counts = ",\n       ".join(
        f"CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT) AS n_{t}"
        for t in EVENT_TYPES
    )
    return f"SELECT user_id,\n       {counts}\nFROM events GROUP BY user_id"


def orders_status_histogram(sf_dir: str):
    return (
        rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderstatus"])
        .groupby("o_orderstatus")
        .count()
        .rename_columns({"count()": "n"})
    )


def sql_orders_status_histogram() -> str:
    return "SELECT o_orderstatus, count(*) AS n FROM orders GROUP BY o_orderstatus"


def orders_rollup(sf_dir: str):
    """GROUPING SETS / ROLLUP: counts at (status, priority), per-status
    subtotals, and the grand total, with 'ALL' as the rolled-up marker.
    Both grouping columns are schema-level enums, so the base aggregate is
    key-bounded: per-batch partials -> block coalesce -> one merge; the
    rollup levels derive from the TINY base result (<= |status| x
    |priority| rows), never from a second fact scan."""
    from ..functions.bucketing import coalesced_count

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderstatus", "o_orderpriority"])
    base = pd.DataFrame(
        coalesced_count(orders, ["o_orderstatus", "o_orderpriority"],
                        name="n").take_all()
    ).groupby(["o_orderstatus", "o_orderpriority"], as_index=False)["n"].sum()
    sub = base.groupby("o_orderstatus", as_index=False)["n"].sum()
    sub["o_orderpriority"] = "ALL"
    total = pd.DataFrame({"o_orderstatus": ["ALL"],
                          "o_orderpriority": ["ALL"],
                          "n": [base["n"].sum()]})
    out = pd.concat([base, sub, total], ignore_index=True)
    return rd.from_arrow(pa.table({
        "o_orderstatus": pa.array(out["o_orderstatus"], pa.string()),
        "o_orderpriority": pa.array(out["o_orderpriority"], pa.string()),
        "n": pa.array(out["n"].astype("int64"), pa.int64()),
    }))


def sql_orders_rollup() -> str:
    return """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*) AS n
FROM orders
GROUP BY ROLLUP (o_orderstatus, o_orderpriority)"""


def orders_cube(sf_dir: str):
    """CUBE grouping sets: counts at (status, priority), BOTH one-column
    marginals, and the grand total — the grouping set ROLLUP cannot
    express is the priority-only marginal. Same scale shape as
    :func:`orders_rollup`: the base aggregate is enum-key-bounded
    (per-batch partials -> coalesce -> one merge) and every CUBE level
    derives from the tiny base result, never from a second fact scan."""
    from ..functions.bucketing import coalesced_count

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderstatus", "o_orderpriority"])
    base = pd.DataFrame(
        coalesced_count(orders, ["o_orderstatus", "o_orderpriority"],
                        name="n").take_all()
    ).groupby(["o_orderstatus", "o_orderpriority"], as_index=False)["n"].sum()
    sub_s = base.groupby("o_orderstatus", as_index=False)["n"].sum()
    sub_s["o_orderpriority"] = "ALL"
    sub_p = base.groupby("o_orderpriority", as_index=False)["n"].sum()
    sub_p["o_orderstatus"] = "ALL"
    total = pd.DataFrame({"o_orderstatus": ["ALL"],
                          "o_orderpriority": ["ALL"],
                          "n": [base["n"].sum()]})
    out = pd.concat([base, sub_s, sub_p, total], ignore_index=True)
    return rd.from_arrow(pa.table({
        "o_orderstatus": pa.array(out["o_orderstatus"], pa.string()),
        "o_orderpriority": pa.array(out["o_orderpriority"], pa.string()),
        "n": pa.array(out["n"].astype("int64"), pa.int64()),
    }))


def sql_orders_cube() -> str:
    return """
SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)"""


class _BoundaryBelowPartial:
    """Per-batch (count, sum) of values strictly below each boundary —
    the fold that turns pinned decile boundary VALUES into exact prefix
    cents without collecting the totals table. Module-level for
    by-reference serialization (see quantiles._HistPartial)."""

    def __init__(self, bounds: list, value_col: str):
        self.bounds = bounds
        self.value_col = value_col

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or self.value_col not in b.columns:
            return pd.DataFrame({"j": pd.Series([], dtype="int64"),
                                 "cnt": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="int64")})
        v = np.sort(b[self.value_col].to_numpy(np.int64))
        cum = np.concatenate([[0], np.cumsum(v)])
        js, cnts, ss = [], [], []
        for j, bound in enumerate(self.bounds):
            p = int(np.searchsorted(v, bound, side="left"))
            js.append(j)
            cnts.append(p)
            ss.append(int(cum[p]))
        return pd.DataFrame({"j": np.asarray(js, np.int64),
                             "cnt": np.asarray(cnts, np.int64),
                             "s": np.asarray(ss, np.int64)})


def events_lorenz(sf_dir: str, k: int = 10, n_buckets: int = 64,
                  collect_cap: int = 100_000):
    """Lorenz concentration deciles of per-user value (gini's curve
    form): Dataset(decile, n_users, decile_cents, value_share) — users
    ranked by (total cents asc, user_id asc) and split into k ntile
    buckets with DuckDB's remainder-to-the-FIRST-buckets rule, each
    reporting its exact integer cents and its share of the grand total
    (ONE division per row).

    Shape (scale-safe, no user-scale driver fold): per-user totals via
    one bucketed sum, materialized once (user-bounded working set); the
    k-1 decile boundary VALUES resolve through
    ``quantiles.grouped_exact_ranks`` (iterative-histogram rank selection
    — driver state is histogram-bounded, the collect pass
    ``collect_cap``-gated); decile cents then need only per-boundary
    below-counts/sums (one streaming pass, k-1 ints of driver state) plus
    tie arithmetic: every user tied AT a boundary value contributes that
    exact value, so prefix_cents(p) = sum_below + (p - count_below) *
    boundary_value without touching user ids."""
    from ..functions.bucketing import bucketed_sum
    from ..functions.quantiles import grouped_exact_ranks

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": b["user_id"].astype("int64"),
                             "vc": _cents(b["value"].to_numpy())})

    totals = bucketed_sum(ev.map_batches(prep, batch_format="pandas"),
                          ["user_id"], "vc",
                          n_buckets=n_buckets).materialize()
    empty = pa.table({"decile": pa.array([], pa.int64()),
                      "n_users": pa.array([], pa.int64()),
                      "decile_cents": pa.array([], pa.int64()),
                      "value_share": pa.array([], pa.float64())})
    n = totals.count()
    if n == 0:
        return rd.from_arrow(empty)
    total = 0
    for r in totals.map_batches(
            lambda b: pd.DataFrame({"s": [int(b["vc"].sum())]})
            if len(b) and "vc" in b.columns
            else pd.DataFrame({"s": pd.Series([], dtype="int64")}),
            batch_format="pandas").take_all():  # batch-bounded partials
        total += int(r["s"])
    base, rem = divmod(n, k)
    sizes = [base + 1] * rem + [base] * (k - rem)
    prefix_ranks = list(np.cumsum(sizes)[:-1])  # p_1 .. p_{k-1}
    # boundary VALUE at ntile prefix p = vc of the p-th user in
    # (vc, user_id) order = the value at ascending-vc rank p-1 (tie
    # order cannot change the value multiset)
    uniq = sorted({int(p) for p in prefix_ranks if p > 0})
    const = totals.map_batches(
        lambda b: b.assign(g="all") if len(b) and "vc" in b.columns
        else pd.DataFrame({"user_id": pd.Series([], dtype="int64"),
                           "vc": pd.Series([], dtype="int64"),
                           "g": pd.Series([], dtype=object)}),
        batch_format="pandas")
    ranks = grouped_exact_ranks(
        lambda: const, "g", "vc",
        {"all": [(f"p{p}", p - 1) for p in uniq]},
        collect_cap=collect_cap)
    # boundary values round-trip through float64 (grouped_exact_ranks
    # returns the collected value as float): exact only while per-user
    # cent totals stay below 2^53 — guard the reconstruction LOUDLY
    # instead of silently mis-ranking at the 10^12-turn design point
    # (ADVICE r04 #4)
    bound_val = {}
    for p in uniq:
        f = ranks[("all", f"p{p}")]
        v = int(round(f))
        if float(v) != f or abs(v) > (1 << 53):
            raise ValueError(
                f"lorenz boundary p{p}={f!r} is not exactly representable "
                "as int64 through float64 (per-user cent total exceeds "
                "2^53) — widen grouped_exact_ranks to integer collection")
        bound_val[p] = v
    # one streaming pass: strictly-below count/sum per distinct boundary
    below = {j: [0, 0] for j in range(len(uniq))}
    for r in totals.map_batches(
            _BoundaryBelowPartial, batch_format="pandas",
            fn_constructor_kwargs={"bounds": [bound_val[p] for p in uniq],
                                   "value_col": "vc"},
            concurrency=(1, 8)).take_all():
        below[int(r["j"])][0] += int(r["cnt"])
        below[int(r["j"])][1] += int(r["s"])
    prefix_cents = {0: 0}
    for p in uniq:
        j = uniq.index(p)
        cnt_b, sum_b = below[j]
        prefix_cents[p] = sum_b + (p - cnt_b) * bound_val[p]
    rows, prev_p, prev_cents = [], 0, 0
    for d, sz in enumerate(sizes, start=1):
        if sz == 0:
            continue
        p = prev_p + sz
        cents_p = total if p == n else prefix_cents[p]
        seg = cents_p - prev_cents
        rows.append((d, sz, seg, float(seg) / float(total)))
        prev_p, prev_cents = p, cents_p
    return rd.from_arrow(pa.table({
        "decile": pa.array([r[0] for r in rows], pa.int64()),
        "n_users": pa.array([r[1] for r in rows], pa.int64()),
        "decile_cents": pa.array([r[2] for r in rows], pa.int64()),
        "value_share": pa.array([r[3] for r in rows], pa.float64()),
    }))


def sql_events_lorenz(k: int = 10) -> str:
    """Oracle for events_lorenz: ntile over (total asc, user_id)."""
    return f"""
WITH tot AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS vc
  FROM events GROUP BY user_id),
nt AS (SELECT vc, ntile({k}) OVER (ORDER BY vc, user_id) AS decile
       FROM tot),
g AS (SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(vc) AS BIGINT) AS decile_cents
      FROM nt GROUP BY decile)
SELECT CAST(decile AS BIGINT) AS decile, n_users, decile_cents,
       CAST(decile_cents AS DOUBLE)
         / (SELECT CAST(sum(vc) AS DOUBLE) FROM tot) AS value_share
FROM g"""


def events_value_gini(sf_dir: str, n_buckets: int = 64):
    """Gini concentration of per-user event value -> one row
    (n_users, total_cents, gini): how unequally total spend distributes
    across users, the marketing/abuse 'whale concentration' metric. For
    user totals sorted ascending v_1 <= ... <= v_n,
    G = (2*sum(i*v_i) - (n+1)*sum(v)) / (n*sum(v)); tie order is
    irrelevant because permuting equal values leaves sum(i*v_i)
    unchanged. Both moments are EXACT integers, the float is ONE
    division (repo rule).

    Shape (scale-safe, no user-scale driver fold): per-user totals via
    one bucketed sum (user-bounded result); the rank moment Σ i*v_i comes
    from ``quantiles.sorted_rank_weight_sum`` — one distributed sort of
    the totals table plus batch-bounded partials reassembled by contiguous
    (min, max) range, so driver state is one row per batch, never the
    user stream."""
    from ..functions.bucketing import bucketed_sum
    from ..functions.quantiles import sorted_rank_weight_sum

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": b["user_id"].astype("int64"),
                             "vc": _cents(b["value"].to_numpy())})

    totals = bucketed_sum(ev.map_batches(prep, batch_format="pandas"),
                          ["user_id"], "vc", n_buckets=n_buckets)
    n, s0, s1 = sorted_rank_weight_sum(totals, "vc")
    if n == 0:
        return rd.from_arrow(pa.table({
            "n_users": pa.array([0], pa.int64()),
            "total_cents": pa.array([0], pa.int64()),
            "gini": pa.array([0.0], pa.float64())}))
    # ONE division, float64(num)/float64(den) like the oracle's
    # CAST(... AS DOUBLE) / (n * s0)
    gini = float(2 * s1 - (n + 1) * s0) / float(n * s0)
    return rd.from_arrow(pa.table({
        "n_users": pa.array([n], pa.int64()),
        "total_cents": pa.array([s0], pa.int64()),
        "gini": pa.array([gini], pa.float64()),
    }))


def sql_events_value_gini() -> str:
    return """
WITH t AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS vc
  FROM events GROUP BY user_id
),
r AS (SELECT vc, row_number() OVER (ORDER BY vc) AS i FROM t),
m AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(vc) AS BIGINT) AS s0,
             CAST(sum(i * vc) AS BIGINT) AS s1 FROM r)
SELECT n AS n_users, s0 AS total_cents,
       CAST(2 * s1 - (n + 1) * s0 AS DOUBLE) / (n * s0) AS gini
FROM m"""


REFRESH_DEL_MOD = 97
REFRESH_INS_MOD = 89
REFRESH_KEY_OFFSET = 10_000_000  # above any tested tier's max orderkey


def orders_refresh(sf_dir: str, n_buckets: int = 64):
    """TPC-H refresh-stream shape (spec 2.27: RF2 deletes + RF1 inserts)
    as one incremental-maintenance pass over the orders table ->
    post-refresh (o_orderkey, o_orderstatus, total_cents). The delete set
    (keys ``% REFRESH_DEL_MOD == 0``) is materialized as a KEY TABLE and
    applied with a true keyed ANTI exchange (``bucketed_semi`` — the
    operator a real refresh stream needs, since its keys arrive as data,
    not as a predicate); the insert batch re-keys ``% REFRESH_INS_MOD``
    orders above ``REFRESH_KEY_OFFSET`` with status 'N' and unions in —
    zero shuffles beyond the anti exchange. The relational sibling of the
    KG side's ``merge_edge_runs`` delete-then-create upsert
    (`builder/builder.py:16-41`)."""
    from ..functions.bucketing import bucketed_semi

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "o_orderkey": b["o_orderkey"].astype("int64"),
            "o_orderstatus": b["o_orderstatus"],
            "total_cents": _cents(b["o_totalprice"].to_numpy()),
        })

    base = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderstatus", "o_totalprice"],
    ).map_batches(prep, batch_format="pandas")

    del_keys = base.map_batches(
        lambda b: pd.DataFrame(
            {"k": b.loc[b["o_orderkey"] % REFRESH_DEL_MOD == 0,
                        "o_orderkey"].astype("int64")}),
        batch_format="pandas")
    kept = bucketed_semi(
        base, del_keys, left_on="o_orderkey", right_on="k",
        left_cols=["o_orderkey", "o_orderstatus", "total_cents"],
        n_buckets=n_buckets, anti=True,
        left_fill={"o_orderstatus": ""},  # string col: key-typed filler
        empty_dtypes={"o_orderkey": "int64", "o_orderstatus": object,
                      "total_cents": "int64"})
    inserts = base.map_batches(
        lambda b: (lambda m: pd.DataFrame({
            "o_orderkey": (b.loc[m, "o_orderkey"].astype("int64")
                           + REFRESH_KEY_OFFSET),
            "o_orderstatus": "N",
            "total_cents": b.loc[m, "total_cents"].astype("int64"),
        }))(b["o_orderkey"] % REFRESH_INS_MOD == 0),
        batch_format="pandas")
    return kept.union(inserts)


def sql_orders_refresh() -> str:
    return f"""
WITH base AS (
  SELECT o_orderkey, o_orderstatus,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_cents
  FROM orders
)
SELECT o_orderkey, o_orderstatus, total_cents FROM base
WHERE o_orderkey % {REFRESH_DEL_MOD} <> 0
UNION ALL
SELECT o_orderkey + {REFRESH_KEY_OFFSET}, 'N', total_cents FROM base
WHERE o_orderkey % {REFRESH_INS_MOD} = 0"""


def customers_with_orders_bloom(sf_dir: str, n_buckets: int = 64):
    """SEMI join through the bloom-join prefilter (functions/bloom.py):
    customers holding >= 1 URGENT order. Output is bit-identical to the
    exact bucketed_semi (no false negatives); the broadcast bit array
    drops non-matching customers map-side BEFORE the exchange — the
    runtime-filter regime between broadcast-set and pure-exchange."""
    from ..functions.bloom import bloom_semi

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pc.field("o_orderpriority") == "1-URGENT")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    n_keys = orders.count()  # distinct upper bound; one cheap count scan
    return bloom_semi(
        cust, orders, left_on="c_custkey", right_on="o_custkey",
        left_cols=["c_custkey", "c_name"], n_items=max(64, n_keys),
        n_buckets=n_buckets, left_fill={"c_name": ""},
        empty_dtypes={"c_custkey": "int64", "c_name": object})


def sql_customers_with_orders_bloom() -> str:
    return """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN
  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')"""


def customers_without_orders(sf_dir: str, n_buckets: int = 64):
    """Distributed ANTI JOIN: customers with no URGENT orders. Both sides
    grow with scale factor (the URGENT key set is customer-scale), so the
    key sets meet in ONE bucketed exchange (``bucketed_semi(anti=True)``)
    instead of a driver-collected key-set broadcast — the same plan as
    ``q22_idle_customers``."""
    from ..functions.bucketing import bucketed_semi

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pc.field("o_orderpriority") == "1-URGENT")
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    return bucketed_semi(
        cust, orders, left_on="c_custkey", right_on="o_custkey",
        left_cols=["c_custkey", "c_name"], anti=True, n_buckets=n_buckets,
        left_fill={"c_name": ""},
        empty_dtypes={"c_custkey": "int64", "c_name": object})


def sql_customers_without_orders() -> str:
    return """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN
  (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')"""


def mktsegments(sf_dir: str):
    """Distinct values (set op) via partial per-batch dedup + groupby."""
    ds = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_mktsegment"])
    partial = ds.map_batches(
        lambda t: t.group_by("c_mktsegment").aggregate([]), batch_format="pyarrow"
    )
    return partial.groupby("c_mktsegment").count().drop_columns(["count()"])


def sql_mktsegments() -> str:
    return "SELECT DISTINCT c_mktsegment FROM customer"


# ------------------------------------------------------------------- Q5

def q5_local_supplier_volume(sf_dir: str, region: str = "ASIA",
                             n_buckets: int = 64):
    """TPC-H Q5 shape: revenue from lineitems where the SUPPLIER and the
    ordering CUSTOMER share a nation inside one region.

    Only nation/region (true constants, <=25 rows) broadcast; supplier and
    customer grow with scale factor, so their nationkey attachments ride
    bucketed merge joins: lineitem picks up s_nationkey from the supplier
    scan (then prunes to the region and partial-sums per order x nation),
    orders pick up c_nationkey from the customer scan, and the two streams
    meet in a third bucketed exchange on the order key where the locality
    predicate (s_nat == c_nat) evaluates vectorized. ``Dataset.join``
    stays banned (CLAUDE.md invariant)."""
    from ..functions.bucketing import bucketed_attach

    nation_rows = rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()
    region_keys = {
        r["r_regionkey"]
        for r in rd.read_parquet(f"{sf_dir}/region.parquet").take_all()
        if r["r_name"] == region
    }
    nation_name = {r["n_nationkey"]: r["n_name"] for r in nation_rows
                   if r["n_regionkey"] in region_keys}
    nn_ref = ray.put(nation_name)

    def li_derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"],
            "l_suppkey": b["l_suppkey"],
            "rev": _cents(b["l_extendedprice"].to_numpy()
                          * (1.0 - b["l_discount"].to_numpy())),
        })

    li = bucketed_attach(
        rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                     "l_discount"],
        ).map_batches(li_derive, batch_format="pandas"),
        rd.read_parquet(f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"]),
        left_on="l_suppkey", right_on="s_suppkey",
        left_cols=["l_orderkey", "rev"],
        payload={"s_nationkey": "s_nat"}, payload_fill=np.int64(0),
        n_buckets=n_buckets,
        empty_dtypes={"l_orderkey": "int64", "rev": "int64",
                      "s_nat": "int64"},
    )

    class RegionPartial:  # prune to region + per (order, nation) partial
        def __init__(self):
            self.in_region = set(ray.get(nn_ref))

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["s_nat"].isin(self.in_region)]
            return b.groupby(["l_orderkey", "s_nat"],
                             as_index=False)["rev"].sum()

    li = li.map_batches(RegionPartial, batch_format="pandas",
                        concurrency=(1, 4))

    orders = bucketed_attach(
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_orderkey", "o_custkey"]),
        rd.read_parquet(f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"]),
        left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_orderkey"],
        payload={"c_nationkey": "c_nat"}, payload_fill=np.int64(0),
        n_buckets=n_buckets,
        empty_dtypes={"o_orderkey": "int64", "c_nat": "int64"},
    )

    joined = bucketed_attach(
        li, orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["s_nat", "rev"],
        payload={"c_nat": "c_nat"}, payload_fill=np.int64(0),
        n_buckets=n_buckets,
        empty_dtypes={"s_nat": "int64", "rev": "int64", "c_nat": "int64"},
    )

    class LocalNation:
        def __init__(self):
            self.nn = ray.get(nn_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            b = b[b["s_nat"] == b["c_nat"]]  # supplier nation == customer nation
            return pd.DataFrame(
                {"n_name": b["s_nat"].map(self.nn), "rev": b["rev"]}
            )

    return rename(
        joined.map_batches(LocalNation, batch_format="pandas",
                           concurrency=(1, 4))
        .groupby("n_name").sum("rev"),
        {"sum(rev)": "revenue_cents"},
    )


def sql_q5(region: str = "ASIA") -> str:
    return f"""
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN supplier ON l_suppkey = s_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = '{region}'
GROUP BY n_name"""


# -------------------------------------------------------------- percentile

_MEDIAN_BUCKETS = 4096
_MEDIAN_COLLECT_CAP = 65_536


def events_value_median(sf_dir: str, collect_cap: int = _MEDIAN_COLLECT_CAP):
    """EXACT median event value per event_type, scale-safe: never
    materializes a full group. Iterative histogram selection — each pass
    streams the fact table, counts values per (group, uniform bucket) with a
    distributed aggregate, and the driver narrows each group's candidate
    range 4096x until the in-range row count is driver-sized; the final pass
    collects only those rows and picks the exact order statistics (average
    of the two middle values for even n, matching DuckDB ``median``).
    Duplicate-heavy groups terminate via the zero-width-range shortcut."""
    from ray.data.aggregate import Max, Min

    from ..functions.bucketing import bucketed_sum

    def scan():
        return rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    stats = (
        scan().groupby("event_type")
        .aggregate(Count(alias_name="n"), Min("value", alias_name="lo"),
                   Max("value", alias_name="hi"))
        .take_all()
    )
    # state per group: candidate range [lo, hi], below = #values < lo,
    # target global 0-based ranks r1 <= r2 (median = (v[r1]+v[r2])/2)
    state: dict[str, dict] = {}
    for r in stats:
        n = int(r["n"])
        state[r["event_type"]] = {
            "lo": float(r["lo"]), "hi": float(r["hi"]),
            "r1": (n - 1) // 2, "r2": n // 2, "in_range": n, "done": False,
        }

    def resolve_trivial():
        for s in state.values():
            if not s["done"] and (s["hi"] <= s["lo"] or s["in_range"] == 0):
                s["median"] = s["lo"]
                s["done"] = True

    resolve_trivial()
    for _ in range(4):  # 4096^4 range reduction; 2 passes in practice
        open_groups = {g: s for g, s in state.items()
                       if not s["done"] and s["in_range"] > collect_cap}
        if not open_groups:
            break
        ranges_ref = ray.put({g: (s["lo"], s["hi"]) for g, s in open_groups.items()})

        class HistPartial:
            """Per-batch counts: bucket -1 = values BELOW the range (measured
            fresh each pass — never derived, so float boundary rounding can
            never desynchronize rank bookkeeping from filter semantics)."""

            def __init__(self):
                self.ranges = ray.get(ranges_ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                outs = []
                for g, (lo, hi) in self.ranges.items():
                    v = b.loc[b["event_type"] == g, "value"].to_numpy()
                    n_below = int((v < lo).sum())
                    v = v[(v >= lo) & (v <= hi)]
                    buckets, ns = [], []
                    if n_below:
                        buckets.append(-1)
                        ns.append(n_below)
                    if len(v):
                        idx = np.minimum(
                            ((v - lo) * (_MEDIAN_BUCKETS / (hi - lo)))
                            .astype(np.int64),
                            _MEDIAN_BUCKETS - 1,
                        )
                        bc = np.bincount(np.maximum(idx, 0),
                                         minlength=_MEDIAN_BUCKETS)
                        nz = np.flatnonzero(bc)
                        buckets.extend(nz.tolist())
                        ns.extend(bc[nz].tolist())
                    if buckets:
                        outs.append(pd.DataFrame(
                            {"event_type": g, "bucket": buckets, "n": ns}
                        ))
                if not outs:
                    return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                         "bucket": pd.Series([], dtype="int64"),
                                         "n": pd.Series([], dtype="int64")})
                return pd.concat(outs, ignore_index=True)

        # to_pandas, not take_all: take_all on pandas-format blocks pays
        # ~1 ms/row (groups x 4097 rows -> tens of seconds); block -> frame
        # conversion is milliseconds. Still driver-bounded.
        hist = bucketed_sum(
            scan().map_batches(HistPartial, batch_format="pandas",
                               concurrency=(1, 4)),
            ["event_type", "bucket"], "n",
        ).to_pandas()  # <= groups x 4097 aggregated rows: driver-bounded
        per_group: dict[str, np.ndarray] = {}
        below_meas: dict[str, int] = {}
        for row in hist.itertuples(index=False):
            if int(row.bucket) < 0:
                below_meas[row.event_type] = int(row.n)
                continue
            per_group.setdefault(row.event_type,
                                 np.zeros(_MEDIAN_BUCKETS, dtype=np.int64))[
                int(row.bucket)] += int(row.n)
        for g, s in open_groups.items():
            counts = per_group.get(g)
            below = below_meas.get(g, 0)
            if counts is None:
                s["median"], s["done"] = s["lo"], True
                continue
            cum = np.cumsum(counts)
            w = (s["hi"] - s["lo"]) / _MEDIAN_BUCKETS
            b1 = int(np.searchsorted(cum, s["r1"] - below, side="right"))
            b2 = int(np.searchsorted(cum, s["r2"] - below, side="right"))
            s["lo"], s["hi"] = s["lo"] + b1 * w, min(s["hi"], s["lo"] + (b2 + 1) * w)
            s["in_range"] = int(cum[b2] - (cum[b1 - 1] if b1 > 0 else 0))
            if s["hi"] - s["lo"] < 1e-12:  # duplicate-heavy: range collapsed
                s["median"], s["done"] = s["lo"], True
        resolve_trivial()

    # final pass: collect ONLY the candidate-range rows per group
    open_groups = {g: s for g, s in state.items() if not s["done"]}
    if open_groups:
        ranges_ref = ray.put({g: (s["lo"], s["hi"])
                              for g, s in open_groups.items()})

        class RangeFilter:
            """Emit in-range values, plus one NaN row per (batch, group)
            carrying the measured count of values BELOW the range (needed to
            convert global ranks to in-range indices)."""

            def __init__(self):
                self.ranges = ray.get(ranges_ref)

            def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
                outs = []
                for g, (lo, hi) in self.ranges.items():
                    v = b.loc[b["event_type"] == g, "value"]
                    n_below = int((v < lo).sum())
                    v = v[(v >= lo) & (v <= hi)]
                    if len(v):
                        outs.append(pd.DataFrame(
                            {"event_type": g, "value": v, "nbelow": 0}))
                    if n_below:
                        outs.append(pd.DataFrame(
                            {"event_type": [g], "value": [np.nan],
                             "nbelow": [n_below]}))
                if not outs:
                    return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                                         "value": pd.Series([], dtype="float64"),
                                         "nbelow": pd.Series([], dtype="int64")})
                return pd.concat(outs, ignore_index=True)

        rows = scan().map_batches(RangeFilter, batch_format="pandas",
                                  concurrency=(1, 4)).to_pandas()
        marker = rows["nbelow"] > 0
        below_final = (rows.loc[marker].groupby("event_type")["nbelow"]
                       .sum().to_dict())
        vals = {g: gg["value"].to_numpy(dtype=np.float64)
                for g, gg in rows.loc[~marker].groupby("event_type")}
        for g, s in open_groups.items():
            v = np.sort(vals.get(g, np.array([], dtype=np.float64)))
            below = int(below_final.get(g, 0))
            i1, i2 = s["r1"] - below, s["r2"] - below
            s["median"] = float((v[i1] + v[i2]) / 2.0)
            s["done"] = True

    out = pd.DataFrame(
        {"event_type": sorted(state),
         "median_value": [float(state[g]["median"]) for g in sorted(state)]}
    )
    return rd.from_pandas(out)


def events_value_quartiles(sf_dir: str):
    """EXACT per-group quartiles (p25/p50/p75) via the generalized
    iterative histogram selection (functions/quantiles.py) — same
    scale-safe guarantee as events_value_median but resolving three rank
    targets per group in shared passes over the fact table. Quantile
    index semantics = DuckDB quantile_disc (exact ceil(q*n)-1; the three
    q are binary-exact so float evaluation agrees)."""
    from ..functions.quantiles import grouped_exact_ranks, quantile_disc_rank

    def scan():
        return rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    counts = {r["event_type"]: int(r["count()"])
              for r in scan().groupby("event_type").count().take_all()}
    targets = {
        g: [(lbl, quantile_disc_rank(q, n))
            for lbl, q in (("q25", 0.25), ("q50", 0.5), ("q75", 0.75))]
        for g, n in counts.items()
    }
    got = grouped_exact_ranks(scan, "event_type", "value", targets)
    groups = sorted(counts)
    return rd.from_pandas(pd.DataFrame({
        "event_type": groups,
        "q25": [got[(g, "q25")] for g in groups],
        "q50": [got[(g, "q50")] for g in groups],
        "q75": [got[(g, "q75")] for g in groups],
    }))


def events_value_ntile(sf_dir: str):
    """Per-event QUANTILE-BIN assignment (feature binning, the
    training-pipeline companion of events_value_quartiles): bucket =
    1 + (v > q25) + (v > q50) + (v > q75) with the per-type thresholds
    computed by the same scale-safe iterative histogram selection, then
    BROADCAST — the fact-grain pass is a zero-shuffle vectorized map.
    Thresholds are actual data values (quantile_disc), so the float
    comparisons are well-defined and bit-identical to the oracle."""
    from ..functions.quantiles import grouped_exact_ranks, quantile_disc_rank

    def scan():
        return rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_id", "event_type", "value"])

    counts = {r["event_type"]: int(r["count()"])
              for r in scan().groupby("event_type").count().take_all()}
    targets = {
        g: [(lbl, quantile_disc_rank(q, n))
            for lbl, q in (("q25", 0.25), ("q50", 0.5), ("q75", 0.75))]
        for g, n in counts.items()
    }
    got = grouped_exact_ranks(
        lambda: scan().select_columns(["event_type", "value"]),
        "event_type", "value", targets)
    thresholds = {g: (got[(g, "q25")], got[(g, "q50")], got[(g, "q75")])
                  for g in counts}  # enum-bounded broadcast state
    import ray as _ray

    ref = _ray.put(thresholds)

    def assign(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        th = _ray.get(_ref)
        v = b["value"].to_numpy()
        q = np.array([th[t] for t in b["event_type"]], dtype=np.float64)
        bucket = (1 + (v > q[:, 0]).astype(np.int64)
                  + (v > q[:, 1]) + (v > q[:, 2]))
        return pd.DataFrame({"event_id": b["event_id"],
                             "event_type": b["event_type"],
                             "value": v,
                             "bucket": bucket.astype(np.int64)})

    return scan().map_batches(assign, batch_format="pandas")


def events_value_mad(sf_dir: str):
    """Robust dispersion: per-type MEDIAN ABSOLUTE DEVIATION — the
    outlier-resistant scale statistic (Hampel 1974) a cleaning pipeline
    pairs with quantile binning. TWO stages of the same scale-safe exact
    histogram selection: (1) per-type median (both central ranks, avg of
    two — DuckDB ``median`` semantics), (2) broadcast the medians and
    select the median of the |value - median| TRANSFORMED scan — the
    transform is a zero-shuffle vectorized map re-derived on every
    selection pass, so no deviation table is ever materialized."""
    import ray as _ray

    from ..functions.quantiles import grouped_exact_ranks

    def scan():
        return rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    counts = {r["event_type"]: int(r["count()"])
              for r in scan().groupby("event_type").count().take_all()}
    targets = {g: [("m1", (n - 1) // 2), ("m2", n // 2)]
               for g, n in counts.items()}

    got = grouped_exact_ranks(scan, "event_type", "value", targets)
    med = {g: (got[(g, "m1")] + got[(g, "m2")]) / 2 for g in counts}
    ref = _ray.put(med)

    def dev(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        m = _ray.get(_ref)
        c = np.array([m[t] for t in b["event_type"]], dtype=np.float64)
        return pd.DataFrame({
            "event_type": b["event_type"],
            "value": np.abs(b["value"].to_numpy() - c)})

    got2 = grouped_exact_ranks(
        lambda: scan().map_batches(dev, batch_format="pandas"),
        "event_type", "value", targets)
    groups = sorted(counts)
    return rd.from_pandas(pd.DataFrame({
        "event_type": groups,
        "median_value": [med[g] for g in groups],
        "mad": [(got2[(g, "m1")] + got2[(g, "m2")]) / 2 for g in groups],
    }))


def sql_events_value_mad() -> str:
    return """
WITH m AS (SELECT event_type, median(value) AS med
           FROM events GROUP BY event_type)
SELECT e.event_type, m.med AS median_value,
       median(abs(e.value - m.med)) AS mad
FROM events e JOIN m USING (event_type)
GROUP BY e.event_type, m.med"""


def sql_events_value_ntile() -> str:
    return """
WITH q AS (
  SELECT event_type,
         quantile_disc(value, 0.25) AS q25,
         quantile_disc(value, 0.50) AS q50,
         quantile_disc(value, 0.75) AS q75
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       CAST(1 + CAST(e.value > q.q25 AS INT)
              + CAST(e.value > q.q50 AS INT)
              + CAST(e.value > q.q75 AS INT) AS BIGINT) AS bucket
FROM events e JOIN q USING (event_type)"""


def events_value_p95(sf_dir: str):
    """INTERPOLATED per-type p95 (``percentile_cont`` semantics) with the
    exact-integer x20 trick: pos = (n-1) * 19/20 splits into lo = floor
    and a /20 remainder r, so ``p95_x20_cents = cents(v_lo) * (20 - r) +
    cents(v_hi) * r`` is an exact BIGINT both engines compute identically;
    the float ``p95`` is ONE division (/2000: x20 and cents). The two
    order statistics resolve through the same scale-safe iterative
    histogram selection as the quartiles — both ranks of every type
    advance in shared passes, no group ever materializes."""
    from ..functions.quantiles import grouped_exact_ranks

    def scan():
        return rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    counts = {r["event_type"]: int(r["count()"])
              for r in scan().groupby("event_type").count().take_all()}
    targets, pos = {}, {}
    for g, n in counts.items():
        num = (n - 1) * 19
        lo, r = num // 20, num % 20
        pos[g] = (lo, r)
        targets[g] = [("lo", lo)] + ([("hi", lo + 1)] if r else [])
    got = grouped_exact_ranks(scan, "event_type", "value", targets)
    groups = sorted(counts)
    x20, p95 = [], []
    for g in groups:
        lo, r = pos[g]
        c_lo = int(np.floor(got[(g, "lo")] * 100.0 + 0.5))
        c_hi = (int(np.floor(got[(g, "hi")] * 100.0 + 0.5))
                if r else c_lo)
        x = c_lo * (20 - r) + c_hi * r
        x20.append(x)
        p95.append(x / 2000.0)  # single float division (repo invariant)
    return rd.from_arrow(pa.table({
        "event_type": pa.array(groups, pa.string()),
        "p95_x20_cents": pa.array(x20, pa.int64()),
        "p95": pa.array(p95, pa.float64()),
    }))


def sql_events_value_p95() -> str:
    return """
WITH n AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
p AS (
  SELECT event_type, ((n - 1) * 19) // 20 AS lo, ((n - 1) * 19) % 20 AS r
  FROM n
),
s AS (
  SELECT event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type ORDER BY value) - 1
           AS rk
  FROM events
),
sel AS (
  SELECT s.event_type,
         CAST(sum(CASE WHEN s.rk = p.lo THEN s.cents * (20 - p.r)
                       WHEN s.rk = p.lo + 1 THEN s.cents * p.r
                       ELSE 0 END) AS BIGINT) AS x
  FROM s JOIN p USING (event_type)
  WHERE s.rk = p.lo OR (p.r > 0 AND s.rk = p.lo + 1)
  GROUP BY s.event_type
)
SELECT event_type, x AS p95_x20_cents, x / 2000.0 AS p95 FROM sel"""


def sql_events_value_quartiles() -> str:
    return """
SELECT event_type,
       quantile_disc(value, 0.25) AS q25,
       quantile_disc(value, 0.50) AS q50,
       quantile_disc(value, 0.75) AS q75
FROM events GROUP BY event_type"""


def sql_events_value_median() -> str:
    return """
SELECT event_type, median(value) AS median_value
FROM events GROUP BY event_type"""


# -------------------------------------------------- table profiling

PROFILE_COLS = ["l_quantity", "l_extendedprice", "l_discount",
                "l_partkey", "l_suppkey"]


def lineitem_profile(sf_dir: str):
    """Data-quality profile of lineitem's numeric columns ->
    (column_name, n, n_null, n_distinct, min_v, max_v). One streaming
    scan for count/null/min/max + one bucketed distinct per column
    (stages/profile.py for the scale argument)."""
    from ..stages.profile import table_profile

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=PROFILE_COLS)
    return table_profile(ds, PROFILE_COLS)


def sql_lineitem_profile() -> str:
    parts = [
        f"""SELECT '{c}' AS column_name, count(*) AS n,
       count(*) - count({c}) AS n_null,
       count(DISTINCT {c}) AS n_distinct,
       CAST(min({c}) AS DOUBLE) AS min_v,
       CAST(max({c}) AS DOUBLE) AS max_v
FROM lineitem"""
        for c in PROFILE_COLS
    ]
    return "\nUNION ALL\n".join(parts)


# ------------------------------------------------------ Q14 / Q18 shapes

Q14_YEAR, Q14_MONTH = 1995, 9


def q14_promo_revenue(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q14 shape: promo-part revenue share for one ship month ->
    one row (promo_cents, total_cents, promo_pct).

    The month predicate is pushed into the parquet scan; part type rides
    in via ONE bucketed merge join on the part key (part scales with SF —
    never a driver broadcast); both sums accumulate as exact int64 cents
    and the percentage is the single float expression both sides share."""
    from datetime import datetime

    import pyarrow.compute as pc

    from ..functions.bucketing import bucketed_attach

    lo = pa.scalar(datetime(Q14_YEAR, Q14_MONTH, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(Q14_YEAR, Q14_MONTH + 1, 1), pa.timestamp("us"))
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    )

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": b["l_partkey"],
            "rc": _cents(b["l_extendedprice"].to_numpy()
                         * (1.0 - b["l_discount"].to_numpy())),
        })

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
    joined = bucketed_attach(
        li.map_batches(derive, batch_format="pandas"), part,
        left_on="l_partkey", right_on="p_partkey",
        left_cols=["rc"], payload={"p_type": "p_type"},
        payload_fill="", n_buckets=n_buckets,
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rc = b["rc"].to_numpy(dtype=np.int64)
        promo = (b["p_type"] == "PROMO").to_numpy()
        return pd.DataFrame({"promo_cents": [np.int64(rc[promo].sum())],
                             "total_cents": [np.int64(rc.sum())]})

    sums = (joined.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(
                lambda b: pd.DataFrame({
                    "promo_cents": [np.int64(b["promo_cents"].sum())],
                    "total_cents": [np.int64(b["total_cents"].sum())]}),
                batch_format="pandas", batch_size=None))

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        p = int(b["promo_cents"].iloc[0])
        t = int(b["total_cents"].iloc[0])
        b = b.copy()
        b["promo_pct"] = 100.0 * float(p) / float(t)
        return b

    return sums.map_batches(finish, batch_format="pandas")


def sql_q14_promo_revenue() -> str:
    m = f"{Q14_YEAR}-{Q14_MONTH:02d}"
    nxt = f"{Q14_YEAR}-{Q14_MONTH + 1:02d}"
    return f"""
WITH j AS (
  SELECT CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
              AS BIGINT) AS rc,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{m}-01' AND l_shipdate < TIMESTAMP '{nxt}-01'
)
SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rc ELSE 0 END) AS BIGINT)
         AS promo_cents,
       CAST(sum(rc) AS BIGINT) AS total_cents,
       100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN rc ELSE 0 END)
                    AS DOUBLE)
             / CAST(sum(rc) AS DOUBLE) AS promo_pct
FROM j"""


Q18_QTY = 300


def q18_large_orders(sf_dir: str, threshold: int = Q18_QTY,
                     n_buckets: int = 64):
    """TPC-H Q18 shape: orders whose total quantity exceeds ``threshold``
    -> (c_name, c_custkey, o_orderkey, o_totalprice, sum_qty).

    The per-order quantity fold is one bucketed salted exchange over the
    full fact table; the HAVING filter shrinks it to a result-bounded set,
    and order/customer attributes ride in via two bucketed merge joins
    (orders is fact-scale, customer scales with SF — neither is ever a
    driver broadcast)."""
    from ..functions.bucketing import bucketed_attach, bucketed_sum

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_quantity"])

    def to_int(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"],
            "q": b["l_quantity"].to_numpy().astype(np.int64),
        })

    per_order = bucketed_sum(li.map_batches(to_int, batch_format="pandas"),
                             ["l_orderkey"], "q", n_buckets)
    big = per_order.filter(expr=f"q > {threshold}")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    with_ord = bucketed_attach(
        big, orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "q"],
        payload={"o_custkey": "o_custkey", "o_totalprice": "o_totalprice"},
        payload_fill=0.0, n_buckets=n_buckets,
    ).map_batches(
        # re-type the join key: the attach's float sentinel fill upcasts
        # o_custkey, and a float64 key hashes into different buckets than
        # the customer table's int64 key
        lambda b: pd.DataFrame({
            "l_orderkey": b["l_orderkey"].astype("int64"),
            "q": b["q"].astype("int64"),
            "o_custkey": b["o_custkey"].astype("int64"),
            "o_totalprice": b["o_totalprice"].astype("float64"),
        }),
        batch_format="pandas",
    )
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name"])
    with_cust = bucketed_attach(
        with_ord, cust, left_on="o_custkey", right_on="c_custkey",
        left_cols=["l_orderkey", "q", "o_custkey", "o_totalprice"],
        payload={"c_name": "c_name"}, payload_fill="",
        left_fill={"o_totalprice": 0.0}, n_buckets=n_buckets,
    )
    return with_cust.map_batches(
        lambda b: pd.DataFrame({
            "c_name": b["c_name"],
            "c_custkey": b["o_custkey"].astype("int64"),
            "o_orderkey": b["l_orderkey"].astype("int64"),
            "o_totalprice": b["o_totalprice"].astype("float64"),
            "sum_qty": b["q"].astype("int64"),
        }),
        batch_format="pandas")


def sql_q18_large_orders() -> str:
    return f"""
WITH big AS (
  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT)
           AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(CAST(l_quantity AS BIGINT)) > {Q18_QTY}
)
SELECT c_name, c_custkey, o_orderkey, o_totalprice, sum_qty
FROM big
JOIN orders ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey"""


Q4_QUARTER = ("1996-07-01", "1996-10-01")


def q4_order_priority(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q4 shape: one quarter's orders having at least one RETURNED
    lineitem, counted per priority -> (o_orderpriority, order_count).

    A distributed SEMI join (EXISTS): the returned-lineitem key stream and
    the date-filtered orders are BOTH fact-scale, so they meet in one
    bucketed exchange (``bucketed_semi``) — no key set ever lands on the
    driver. Survivors fold into an enum-bounded count (5 priorities) via
    per-batch partials + a single-block merge, no second shuffle.
    Reference analog: EXISTS-style support gating in
    ``builder/builder.py:364-370`` (pairs kept only when evidence exists)."""
    import pyarrow.compute as pc

    from ..functions.bucketing import bucketed_semi

    lo, hi = Q4_QUARTER
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"],
        filter=(pc.field("o_orderdate") >= pa.scalar(np.datetime64(lo, "us")))
        & (pc.field("o_orderdate") < pa.scalar(np.datetime64(hi, "us"))),
    )
    returned = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey"],
        filter=pc.field("l_returnflag") == "R",
    )
    kept = bucketed_semi(
        orders, returned, left_on="o_orderkey", right_on="l_orderkey",
        left_cols=["o_orderkey", "o_orderpriority"],
        left_fill={"o_orderpriority": ""}, n_buckets=n_buckets,
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby("o_orderpriority", sort=False).size()
                .rename("order_count").reset_index())

    return (kept.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(
                lambda b: b.groupby("o_orderpriority", sort=False,
                                    as_index=False)["order_count"].sum(),
                batch_format="pandas", batch_size=None))


def sql_q4_order_priority() -> str:
    lo, hi = Q4_QUARTER
    return f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '{lo}' AND o_orderdate < TIMESTAMP '{hi}'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority"""


Q12_YEAR = 1997
_Q12_HIGH = ("1-URGENT", "2-HIGH")


def q12_priority_lines(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q12 shape: lines shipped in one year, split into high- vs
    low-priority order counts per linestatus ->
    (l_linestatus, high_line_count, low_line_count).

    The year predicate is pushed into the lineitem scan; order priority
    rides in via ONE bucketed merge join on the order key (orders is
    fact-scale — never a broadcast); the conditional counts are per-batch
    int64 partials folded in a single-block merge (enum-bounded output)."""
    import pyarrow.compute as pc

    from ..functions.bucketing import bucketed_attach

    lo = np.datetime64(f"{Q12_YEAR}-01-01", "us")
    hi = np.datetime64(f"{Q12_YEAR + 1}-01-01", "us")
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_linestatus"],
        filter=(pc.field("l_shipdate") >= pa.scalar(lo))
        & (pc.field("l_shipdate") < pa.scalar(hi)),
    )
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderpriority"])
    joined = bucketed_attach(
        li, orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_linestatus"], payload={"o_orderpriority": "prio"},
        payload_fill="", left_fill={"l_linestatus": ""}, n_buckets=n_buckets,
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        high = b["prio"].isin(_Q12_HIGH).to_numpy()
        g = pd.DataFrame({
            "l_linestatus": b["l_linestatus"],
            "high_line_count": high.astype(np.int64),
            "low_line_count": (~high).astype(np.int64),
        })
        return g.groupby("l_linestatus", sort=False, as_index=False).sum()

    return (joined.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(
                lambda b: b.groupby("l_linestatus", sort=False,
                                    as_index=False).sum(),
                batch_format="pandas", batch_size=None))


def sql_q12_priority_lines() -> str:
    hi_set = ", ".join(f"'{p}'" for p in _Q12_HIGH)
    return f"""
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ({hi_set}) THEN 1 ELSE 0 END)
            AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ({hi_set}) THEN 0 ELSE 1 END)
            AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '{Q12_YEAR}-01-01'
  AND l_shipdate < TIMESTAMP '{Q12_YEAR + 1}-01-01'
GROUP BY l_linestatus"""


Q10_QUARTER = ("1996-01-01", "1996-04-01")


def q10_returned_items(sf_dir: str, k: int = 20, n_buckets: int = 64):
    """TPC-H Q10 shape: top-k customers by revenue lost to returned items
    in one quarter -> (c_custkey, c_name, n_name, revenue_cents).

    lineitem (returnflag filter pushed to the scan) joins quarter-filtered
    orders through ONE bucketed exchange on the order key; per-customer
    cents fold in a second bucketed exchange; the top-k is per-batch
    partial top-k + a single-block final merge. Only then — with a
    RESULT-BOUNDED k-row set — do customer/nation names attach via a
    key-filtered dimension read (k keys, never the fact stream)."""
    import pyarrow.compute as pc

    from ..functions.bucketing import bucketed_attach, bucketed_sum

    lo, hi = Q10_QUARTER
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey"],
        filter=(pc.field("o_orderdate") >= pa.scalar(np.datetime64(lo, "us")))
        & (pc.field("o_orderdate") < pa.scalar(np.datetime64(hi, "us"))),
    )
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
        filter=pc.field("l_returnflag") == "R",
    )

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"],
            "rc": _cents(b["l_extendedprice"].to_numpy()
                         * (1.0 - b["l_discount"].to_numpy())),
        })

    joined = bucketed_attach(
        li.map_batches(derive, batch_format="pandas"), orders,
        left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["rc"], payload={"o_custkey": "o_custkey"},
        payload_fill=np.int64(0), n_buckets=n_buckets,
    )
    per_cust = bucketed_sum(joined, ["o_custkey"], "rc", n_buckets)

    def topk_part(b: pd.DataFrame) -> pd.DataFrame:
        return b.sort_values(["rc", "o_custkey"],
                             ascending=[False, True]).head(k)

    top = (per_cust.map_batches(topk_part, batch_format="pandas")
           .repartition(1)
           .map_batches(topk_part, batch_format="pandas", batch_size=None))
    rows = top.take_all()  # k rows — result-bounded by construction
    keys = [int(r["o_custkey"]) for r in rows]

    cust = rd.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_nationkey"],
        filter=pc.field("c_custkey").isin(keys),
    ).take_all()  # k dimension rows
    cmap = {r["c_custkey"]: (r["c_name"], r["c_nationkey"]) for r in cust}
    nmap = {r["n_nationkey"]: r["n_name"]
            for r in rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()}
    return pd.DataFrame({
        "c_custkey": pd.Series(keys, dtype="int64"),
        "c_name": [cmap[c][0] for c in keys],
        "n_name": [nmap[cmap[c][1]] for c in keys],
        "revenue_cents": pd.Series([int(r["rc"]) for r in rows],
                                   dtype="int64"),
    })


def events_user_median(sf_dir: str, n_buckets: int = 64):
    """Per-USER exact median at HIGH key cardinality -> (user_id,
    med2_cents, n_events). ``med2_cents`` is the doubled median as an
    exact int (lower middle + upper middle of the sorted per-user cents)
    so no float ever enters the hash compare.

    This is the OTHER exact-quantile scale shape: the global
    iterative-histogram selection (``events_value_median``) rescans the
    fact table per refinement round and never co-locates a group — right
    when groups are enum-bounded but each group's volume is corpus-scale.
    Here the per-key value set is BOUNDED (one user's events fit a
    reducer), so ONE bucketed exchange co-locates each user's values and
    a single vectorized sort-within-bucket computes every median: one
    pass, no iteration. Choose by per-key volume, not key count."""
    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"user_id": b["user_id"],
                             "vc": _cents(b["value"].to_numpy())})

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "user_id": pd.Series([], dtype="int64"),
                "med2_cents": pd.Series([], dtype="int64"),
                "n_events": pd.Series([], dtype="int64")})
        g = g.sort_values(["user_id", "vc"], kind="mergesort")
        uid = g["user_id"].to_numpy()
        vc = g["vc"].to_numpy()
        users, starts = np.unique(uid, return_index=True)
        counts = np.diff(np.append(starts, len(g)))
        lower = vc[starts + (counts - 1) // 2]
        upper = vc[starts + counts // 2]
        return pd.DataFrame({"user_id": users,
                             "med2_cents": lower + upper,
                             "n_events": counts.astype(np.int64)})

    return bucketed_apply(ds.map_batches(to_cents, batch_format="pandas"),
                          ["user_id"], merge, None, n_buckets)


def sql_events_user_median() -> str:
    return """
WITH v AS (
  SELECT user_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
  FROM events
),
s AS (SELECT user_id, list_sort(list(vc)) AS l, count(*) AS n
      FROM v GROUP BY user_id)
SELECT user_id,
       l[CAST((n + 1) // 2 AS BIGINT)] + l[CAST(n // 2 + 1 AS BIGINT)]
         AS med2_cents,
       n AS n_events
FROM s"""


def events_user_mode(sf_dir: str, n_buckets: int = 64):
    """Per-user MODAL event type -> (user_id, mode_type, n_events) with a
    deterministic tie-break (highest count, then lexicographically
    smallest type) so every parallelism level picks the same winner.

    Grouped argmax at high key cardinality: per-batch (user, type) count
    partials shrink the map output to the per-batch key universe, ONE
    bucketed exchange on the user hash co-locates each user's counts, and
    the winner falls out of a vectorized sort + drop_duplicates per
    bucket — no per-user Python."""
    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(["user_id", "event_type"], sort=False).size()
                .rename("n").reset_index())

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "event_type"], sort=False,
                      as_index=False)["n"].sum()
        c = c.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True], kind="mergesort")
        w = c.drop_duplicates("user_id")
        return pd.DataFrame({"user_id": w["user_id"],
                             "mode_type": w["event_type"],
                             "n_events": w["n"].astype(np.int64)})

    return bucketed_apply(ds, ["user_id"], merge, partial, n_buckets)


def sql_events_user_mode() -> str:
    return """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n
  FROM events GROUP BY user_id, event_type
)
SELECT user_id, event_type AS mode_type, n AS n_events FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY n DESC, event_type) AS rk
  FROM c
) WHERE rk = 1"""


_WEEK_US = 604_800_000_000  # 7 * 86400 * 1e6 microseconds


def events_cohort_retention(sf_dir: str, n_buckets: int = 64):
    """Cohort retention -> (cohort_week, week_offset, n_users): users
    grouped by first-active epoch-week, counted per later active week.

    The classic event-analytics rollup, shaped for scale: per-batch
    distinct (user, week) partials bound a hot user's map output to one
    row per (batch, week); ONE bucketed exchange on the user hash
    co-locates each user's weeks, and each bucket derives (cohort,
    offset) partial counts locally (first week = min over the co-located
    set — the per-key-aggregate join-back without a second exchange).
    The final fold is KEY-BOUNDED (weeks x offsets, not users), so it
    coalesces to a single block instead of shuffling."""
    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        wk = b["ts"].astype("datetime64[ns]").astype("int64") \
            // (_WEEK_US * 1000)
        return pd.DataFrame({"user_id": b["user_id"],
                             "wk": wk}).drop_duplicates()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["user_id", "wk"])
        first = g.groupby("user_id", sort=False)["wk"].transform("min")
        out = pd.DataFrame({"cohort_week": first,
                            "week_offset": g["wk"].to_numpy() - first})
        return (out.groupby(["cohort_week", "week_offset"], sort=False)
                .size().rename("n_users").reset_index())

    counts = bucketed_apply(ds, ["user_id"], merge, partial, n_buckets)
    return (counts.repartition(1)
            .map_batches(
                lambda b: b.groupby(["cohort_week", "week_offset"],
                                    sort=False, as_index=False)
                ["n_users"].sum(),
                batch_format="pandas", batch_size=None))


def sql_events_cohort_retention() -> str:
    return f"""
WITH w AS (
  SELECT DISTINCT user_id, epoch_us(ts) // {_WEEK_US} AS wk FROM events
),
f AS (SELECT user_id, min(wk) AS cw FROM w GROUP BY user_id)
SELECT f.cw AS cohort_week, w.wk - f.cw AS week_offset,
       count(*) AS n_users
FROM w JOIN f USING (user_id)
GROUP BY f.cw, w.wk - f.cw"""


def events_value_dense_rank(sf_dir: str, n_buckets: int = 64):
    """Fact-grain window function WITHOUT a global sort ->
    (event_id, event_type, vc, rnk): per-type ``dense_rank()`` of the
    event's cent value.

    A corpus-scale ``ORDER BY`` per partition is the classic shuffle
    bottleneck; dense rank needs only the DISTINCT-value order, and the
    cent domain is VALUE-BOUNDED (price-like columns always are), so the
    whole rank table is a (type, vc) histogram: one bounded bucketed
    exchange builds it, the driver broadcasts per-type sorted value
    arrays, and every scan batch assigns ranks with a vectorized
    ``searchsorted`` — the fact table itself is never sorted, never
    shuffled."""
    from ..functions.bucketing import bucketed_distinct

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_id": b["event_id"],
                             "event_type": b["event_type"],
                             "vc": _cents(b["value"].to_numpy())})

    cents = ds.map_batches(to_cents, batch_format="pandas")
    distinct = bucketed_distinct(
        cents.select_columns(["event_type", "vc"]), ["event_type", "vc"],
        n_buckets)
    vals: dict[str, list[int]] = {}
    for r in distinct.take_all():  # value-domain-bounded, never fact-scale
        vals.setdefault(r["event_type"], []).append(int(r["vc"]))
    ranks_ref = ray.put({t: np.array(sorted(v), dtype=np.int64)
                         for t, v in vals.items()})

    class Rank:
        def __init__(self):
            self.sorted_vals = ray.get(ranks_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            rnk = np.zeros(len(b), dtype=np.int64)
            vc = b["vc"].to_numpy()
            et = b["event_type"].to_numpy()
            for t, sv in self.sorted_vals.items():
                m = et == t
                if m.any():
                    rnk[m] = np.searchsorted(sv, vc[m], side="left") + 1
            out = b.copy()
            out["rnk"] = rnk
            return out

    return cents.map_batches(Rank, batch_format="pandas",
                             concurrency=(1, 2))


def sql_events_value_dense_rank() -> str:
    return """
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
  FROM events
)
SELECT event_id, event_type, vc,
       dense_rank() OVER (PARTITION BY event_type ORDER BY vc) AS rnk
FROM v"""


def events_value_cume_dist(sf_dir: str, n_buckets: int = 64):
    """Fact-grain ``cume_dist()`` window WITHOUT a global sort ->
    (event_id, event_type, vc, cume): fraction of the type's events with
    value <= this one. Same doctrine as :func:`events_value_dense_rank`
    but the broadcast state is the (type, vc) HISTOGRAM with cumulative
    counts (still value-domain-bounded, never fact-scale): one bounded
    bucketed exchange builds it, each scan batch resolves its cumulative
    count with a vectorized ``searchsorted`` and the float is ONE
    division count/n — bit-identical to the window function."""
    from ..functions.bucketing import bucketed_count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_id": b["event_id"],
                             "event_type": b["event_type"],
                             "vc": _cents(b["value"].to_numpy())})

    cents = ds.map_batches(to_cents, batch_format="pandas")
    hist = bucketed_count(cents.select_columns(["event_type", "vc"]),
                          ["event_type", "vc"], name="cnt",
                          n_buckets=n_buckets)
    per_type: dict[str, list[tuple[int, int]]] = {}
    for r in hist.take_all():  # value-domain-bounded, never fact-scale
        per_type.setdefault(r["event_type"], []).append(
            (int(r["vc"]), int(r["cnt"])))
    state = {}
    for t, pairs in per_type.items():
        pairs.sort()
        sv = np.array([p[0] for p in pairs], dtype=np.int64)
        cum = np.cumsum([p[1] for p in pairs]).astype(np.int64)
        state[t] = (sv, cum, int(cum[-1]))
    state_ref = ray.put(state)

    class Cume:
        """Histogram deserialized ONCE per actor, not per batch."""

        def __init__(self):
            self.state = ray.get(state_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            cume = np.zeros(len(b), dtype=np.float64)
            vc = b["vc"].to_numpy()
            et = b["event_type"].to_numpy()
            for t, (sv, cum, n) in self.state.items():
                m = et == t
                if m.any():
                    pos = np.searchsorted(sv, vc[m], side="right")
                    cume[m] = cum[pos - 1] / n  # ONE division
            out = b.copy()
            out["cume"] = cume
            return out[["event_id", "event_type", "vc", "cume"]]

    return cents.map_batches(Cume, batch_format="pandas",
                             concurrency=(1, 4))


def sql_events_value_cume_dist() -> str:
    return """
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
  FROM events
)
SELECT event_id, event_type, vc,
       cume_dist() OVER (PARTITION BY event_type ORDER BY vc) AS cume
FROM v"""


Q6_YEAR = 1997
Q6_DISC_LO_BP, Q6_DISC_HI_BP = 500, 700  # discount band in basis points
Q6_QTY = 24


def q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6: revenue increase from discount-band small-qty lines in
    one ship year -> one row (revenue_cents, n_lines).

    The canonical prune-at-the-read aggregate: year + quantity predicates
    push into the parquet scan (row groups outside never leave storage);
    the discount-band test runs in integer BASIS POINTS (floor(d*10000 +
    0.5)) so the float column never decides a row; revenue = sum of
    price*discount cents, folded as int64 partials."""
    import pyarrow.compute as pc

    lo = pa.scalar(np.datetime64(f"{Q6_YEAR}-01-01", "us"))
    hi = pa.scalar(np.datetime64(f"{Q6_YEAR + 1}-01-01", "us"))
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi)
        & (pc.field("l_quantity") < Q6_QTY),
    )

    def partial(b: pd.DataFrame) -> pa.Table:
        bp = np.floor(b["l_discount"].to_numpy() * 10_000.0
                      + 0.5).astype(np.int64)
        keep = (bp >= Q6_DISC_LO_BP) & (bp <= Q6_DISC_HI_BP)
        rc = _cents(b["l_extendedprice"].to_numpy()
                    * b["l_discount"].to_numpy())[keep]
        # Arrow out: the identity seed below is an Arrow block, and the
        # repartition reduce cannot mix Arrow and pandas block types
        return pa.table({"revenue_cents": pa.array([int(rc.sum())], pa.int64()),
                         "n_lines": pa.array([int(keep.sum())], pa.int64())})

    # typed one-row identity seed: an ungrouped SQL aggregate always emits
    # exactly one row even over zero input rows, but Ray skips map UDFs on
    # empty blocks, so an all-filtered scan would otherwise return 0 rows
    seed = rd.from_arrow(pa.table({"revenue_cents": pa.array([0], pa.int64()),
                                   "n_lines": pa.array([0], pa.int64())}))
    return (ds.map_batches(partial, batch_format="pandas")
            .union(seed)
            .repartition(1)
            .map_batches(
                lambda b: pd.DataFrame({
                    "revenue_cents": [np.int64(b["revenue_cents"].sum())],
                    "n_lines": [np.int64(b["n_lines"].sum())]}),
                batch_format="pandas", batch_size=None))


def sql_q6_forecast_revenue() -> str:
    return f"""
SELECT CAST(COALESCE(sum(CAST(floor(l_extendedprice * l_discount * 100.0
                                    + 0.5) AS BIGINT)), 0)
            AS BIGINT) AS revenue_cents,
       count(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{Q6_YEAR}-01-01'
  AND l_shipdate < TIMESTAMP '{Q6_YEAR + 1}-01-01'
  AND l_quantity < {Q6_QTY}
  AND CAST(floor(l_discount * 10000.0 + 0.5) AS BIGINT)
      BETWEEN {Q6_DISC_LO_BP} AND {Q6_DISC_HI_BP}"""


Q19_TERMS = (  # (brand, max_size, qty_lo, qty_hi) — SPEC disjunction terms
    ("Brand#12", 5, 1, 11),
    ("Brand#23", 10, 10, 20),
    ("Brand#34", 15, 20, 30),
)


def q19_disjunctive_revenue(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q19 shape: revenue from lines matching a DISJUNCTION of
    conjunctive (brand x size-range x quantity-range) terms -> one row
    (revenue_cents, n_lines).

    The shape is compound-predicate evaluation AFTER a fact join: no
    single term is scan-pushable (each mixes part and lineitem columns),
    so brand/size ride in via one bucketed merge join and the OR-of-ANDs
    evaluates as a vectorized boolean reduction per batch — never a
    row-at-a-time predicate interpreter."""
    from ..functions.bucketing import bucketed_attach

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice",
                 "l_discount"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_partkey": b["l_partkey"],
            "q": b["l_quantity"].to_numpy().astype(np.int64),
            "rc": _cents(b["l_extendedprice"].to_numpy()
                         * (1.0 - b["l_discount"].to_numpy())),
        })

    # brand and size fused into ONE string payload: bucketed_attach uses a
    # single type-compatible fill for all payload columns, so mixed-type
    # payloads ride as an encoded column and split after the join
    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_size"],
    ).map_batches(
        lambda b: pd.DataFrame({
            "p_partkey": b["p_partkey"],
            "bs": b["p_brand"] + "|" + b["p_size"].astype(str)}),
        batch_format="pandas")
    joined = bucketed_attach(
        li.map_batches(derive, batch_format="pandas"), part,
        left_on="l_partkey", right_on="p_partkey",
        left_cols=["q", "rc"],
        payload={"bs": "bs"}, payload_fill="", n_buckets=n_buckets,
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = b["q"].to_numpy(dtype=np.int64)
        parts = b["bs"].str.partition("|")
        sz = pd.to_numeric(parts[2]).to_numpy()
        br = parts[0].to_numpy()
        keep = np.zeros(len(b), dtype=bool)
        for brand, max_size, qlo, qhi in Q19_TERMS:
            keep |= ((br == brand) & (sz >= 1) & (sz <= max_size)
                     & (q >= qlo) & (q <= qhi))
        rc = b["rc"].to_numpy(dtype=np.int64)[keep]
        # Arrow out to match the seed block type (see q6)
        return pa.table({"revenue_cents": pa.array([int(rc.sum())], pa.int64()),
                         "n_lines": pa.array([int(keep.sum())], pa.int64())})

    # typed one-row identity seed — same degenerate-tier contract as q6
    seed = rd.from_arrow(pa.table({"revenue_cents": pa.array([0], pa.int64()),
                                   "n_lines": pa.array([0], pa.int64())}))
    return (joined.map_batches(partial, batch_format="pandas")
            .union(seed)
            .repartition(1)
            .map_batches(
                lambda b: pd.DataFrame({
                    "revenue_cents": [np.int64(b["revenue_cents"].sum())],
                    "n_lines": [np.int64(b["n_lines"].sum())]}),
                batch_format="pandas", batch_size=None))


def sql_q19_disjunctive_revenue() -> str:
    terms = " OR ".join(
        f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {s} "
        f"AND l_quantity BETWEEN {lo} AND {hi})"
        for b, s, lo, hi in Q19_TERMS)
    return f"""
SELECT CAST(COALESCE(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                    * 100.0 + 0.5) AS BIGINT)), 0)
            AS BIGINT) AS revenue_cents,
       count(*) AS n_lines
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE {terms}"""


OUTLIER_Z2 = 9  # z^2 (3-sigma) — SPEC shared with the oracle SQL


def events_value_outliers(sf_dir: str, z2: int = OUTLIER_Z2):
    """Per-type z-score outliers with an EXACT integer decision rule ->
    (event_id, event_type, vc): keep events where
    ``(n*vc - s)^2 > z^2 * (n*q - s^2)`` (s = sum cents, q = sum squared
    cents, n = count) — algebraically |vc - mean| > z * stddev, but no
    float ever decides a row, so every parallelism level and the oracle
    keep the identical set.

    Scale shape: the per-type moments are enum-bounded coalesced partials
    (three int64 scalars per type) collected driver-side as PYTHON ints
    (arbitrary precision — n*q overflows int64 long before the data stops
    fitting the cluster) and broadcast; the scan-side filter stays in
    int64 while the per-type guard ``(n*max|vc| + |s|)^2 < 2^63`` holds
    and switches that type's compare to object-dtype Python ints beyond
    it (exact either way)."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "event_type", "value"])

    def to_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"event_id": b["event_id"],
                             "event_type": b["event_type"],
                             "vc": _cents(b["value"].to_numpy())})

    cents = ds.map_batches(to_cents, batch_format="pandas")

    def moments(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("event_type", sort=False)["vc"]
        out = g.sum().rename("s").to_frame()
        out["q"] = b.assign(v2=b["vc"] ** 2) \
            .groupby("event_type", sort=False)["v2"].sum()
        out["n"] = g.size()
        out["m"] = g.apply(lambda x: np.abs(x.to_numpy()).max())
        return out.reset_index()

    parts = (cents.map_batches(moments, batch_format="pandas")
             .repartition(1)
             .map_batches(
                 lambda b: b.groupby("event_type", sort=False,
                                     as_index=False)
                 .agg({"s": "sum", "q": "sum", "n": "sum", "m": "max"}),
                 batch_format="pandas", batch_size=None)
             .take_all())  # enum-bounded: one row per event type
    stats = {}
    for r in parts:
        n, s, q, m = int(r["n"]), int(r["s"]), int(r["q"]), int(r["m"])
        rhs = z2 * (n * q - s * s)  # Python ints: never overflows
        fits64 = (n * m + abs(s)) ** 2 < 2 ** 63 and rhs < 2 ** 63
        stats[r["event_type"]] = (n, s, rhs, fits64)
    stats_ref = ray.put(stats)

    class Filter:
        def __init__(self):
            self.stats = ray.get(stats_ref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            keep = np.zeros(len(b), dtype=bool)
            vc = b["vc"].to_numpy()
            et = b["event_type"].to_numpy()
            for t, (n, s, rhs, fits64) in self.stats.items():
                mask = et == t
                if not mask.any():
                    continue
                v = vc[mask]
                if fits64:
                    d = n * v.astype(np.int64) - s
                    hit = d * d > rhs
                else:  # exact big-int path (object dtype, still one pass)
                    d = n * v.astype(object) - s
                    hit = np.asarray(d * d > rhs, dtype=bool)
                keep[np.flatnonzero(mask)[hit]] = True
            return b[keep]

    return cents.map_batches(Filter, batch_format="pandas",
                             concurrency=(1, 2))


def sql_events_value_outliers(z2: int = OUTLIER_Z2) -> str:
    return f"""
WITH v AS (
  SELECT event_id, event_type,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS vc
  FROM events
),
m AS (SELECT event_type, count(*) AS n, sum(vc) AS s, sum(vc * vc) AS q
      FROM v GROUP BY event_type)
SELECT event_id, v.event_type, vc
FROM v JOIN m USING (event_type)
WHERE (n * vc - s) * (n * vc - s) > {z2} * (n * q - s * s)"""


Q17_BRAND = "Brand#1"


def q17_small_qty_revenue(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q17 shape: revenue from small-quantity lines of one brand —
    lines whose quantity is below 20% of their part's average quantity ->
    one row (small_qty_cents, n_lines, avg_yearly).

    The new shape is the JOIN-BACK OF A PER-KEY AGGREGATE onto the fact
    stream that produced it (a correlated scalar subquery): per-part
    (sum, count) partials fold in one bucketed exchange, then ride back
    onto the brand-filtered lines via a second bucketed exchange. The
    threshold test is EXACT integer arithmetic — ``5 * qty * count < sum``
    instead of ``qty < 0.2 * avg`` — so no float ever decides a row. The
    brand-filtered stream is consumed twice (aggregate + join-back); it
    re-executes from the column-pruned scan rather than materializing,
    which is the right trade at fact scale."""
    from ..functions.bucketing import bucketed_apply, bucketed_attach

    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_brand"])

    def brand_lines():
        li = rd.read_parquet(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_quantity", "l_extendedprice"])

        def derive(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "l_partkey": b["l_partkey"],
                "q": b["l_quantity"].to_numpy().astype(np.int64),
                "ec": _cents(b["l_extendedprice"].to_numpy()),
            })

        withbrand = bucketed_attach(
            li.map_batches(derive, batch_format="pandas"), part,
            left_on="l_partkey", right_on="p_partkey",
            left_cols=["l_partkey", "q", "ec"],
            payload={"p_brand": "brand"}, payload_fill="",
            n_buckets=n_buckets,
        )
        return withbrand.filter(expr=f"brand == '{Q17_BRAND}'")

    def agg_partial(b: pd.DataFrame) -> pd.DataFrame:
        g = b.groupby("l_partkey", sort=False)["q"]
        out = g.sum().rename("s").to_frame()
        out["c"] = g.size()
        return out.reset_index()

    def agg_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("l_partkey", sort=False, as_index=False).sum()

    per_part = bucketed_apply(
        brand_lines().select_columns(["l_partkey", "q"]),
        ["l_partkey"], agg_merge, agg_partial, n_buckets)

    lines = bucketed_attach(
        brand_lines(), per_part, left_on="l_partkey", right_on="l_partkey",
        left_cols=["q", "ec"], payload={"s": "s", "c": "c"},
        payload_fill=np.int64(0), n_buckets=n_buckets,
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = b["q"].to_numpy(dtype=np.int64)
        small = 5 * q * b["c"].to_numpy(dtype=np.int64) \
            < b["s"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            "small_qty_cents": [np.int64(b["ec"].to_numpy()[small].sum())],
            "n_lines": [np.int64(small.sum())],
        })

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        cents = np.int64(b["small_qty_cents"].sum())
        return pd.DataFrame({
            "small_qty_cents": [cents],
            "n_lines": [np.int64(b["n_lines"].sum())],
            "avg_yearly": [float(cents) / 700.0],
        })

    return (lines.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(finish, batch_format="pandas", batch_size=None))


def sql_q17_small_qty_revenue() -> str:
    return f"""
WITH pa AS (
  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS s,
         count(*) AS c
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{Q17_BRAND}'
  GROUP BY l_partkey
)
SELECT CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
            AS BIGINT) AS small_qty_cents,
       count(*) AS n_lines,
       CAST(sum(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
            AS DOUBLE) / 700.0 AS avg_yearly
FROM lineitem JOIN pa USING (l_partkey)
WHERE 5 * CAST(l_quantity AS BIGINT) * pa.c < pa.s"""


def q22_idle_customers(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q22 shape: per-nation count + balance of above-average-balance
    customers with no URGENT order -> (n_name, numcust, totacctbal_cents).

    Three composed shapes: a GLOBAL SCALAR SUBQUERY (positive-balance
    average, folded from int64-cents partials and broadcast as two scalars
    — the comparison is exact ``cents * count > sum``, no float threshold),
    a distributed ANTI join against the fact-scale filtered order stream
    (``bucketed_semi(anti=True)`` — the NOT EXISTS), and an enum-bounded
    final rollup keyed by the broadcast nation dimension. (TPC-H proper
    anti-joins ALL orders; this corpus gives every customer some order, so
    the urgency filter keeps the result non-degenerate while exercising
    the identical plan.)"""
    from ..functions.bucketing import bucketed_semi

    cust_cols = ["c_custkey", "c_nationkey", "c_acctbal"]

    def with_cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "c_custkey": b["c_custkey"],
            "c_nationkey": b["c_nationkey"],
            "ac": _cents(b["c_acctbal"].to_numpy()),
        })

    def cust():
        return rd.read_parquet(
            f"{sf_dir}/customer.parquet", columns=cust_cols
        ).map_batches(with_cents, batch_format="pandas")

    # scalar subquery: (sum, count) of positive balances -> two driver ints
    pos = (cust()
           .filter(expr="ac > 0")
           .map_batches(
               lambda b: pd.DataFrame({
                   "s": [np.int64(b["ac"].sum())],
                   "c": [np.int64(len(b))]}),
               batch_format="pandas")
           .repartition(1)
           .map_batches(
               lambda b: pd.DataFrame({"s": [np.int64(b["s"].sum())],
                                       "c": [np.int64(b["c"].sum())]}),
               batch_format="pandas", batch_size=None)
           .take_all())
    s_pos, c_pos = int(pos[0]["s"]), int(pos[0]["c"])

    rich = cust().map_batches(
        lambda b: b[b["ac"].to_numpy(dtype=np.int64) * c_pos > s_pos],
        batch_format="pandas")

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pc.field("o_orderpriority") == "1-URGENT")
    idle = bucketed_semi(
        rich, orders, left_on="c_custkey", right_on="o_custkey",
        left_cols=["c_nationkey", "ac"], anti=True, n_buckets=n_buckets)

    nmap = {r["n_nationkey"]: r["n_name"]
            for r in rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()}
    nref = ray.put(nmap)

    class Partial:
        def __init__(self):
            self.nmap = ray.get(nref)

        def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby("c_nationkey", sort=False)["ac"]
            out = g.sum().rename("totacctbal_cents").to_frame()
            out["numcust"] = g.size()
            out = out.reset_index()
            out["n_name"] = out["c_nationkey"].map(self.nmap)
            return out[["n_name", "numcust", "totacctbal_cents"]]

    def final(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:  # typed empty, never a schema-less block
            return pd.DataFrame({"n_name": pd.Series([], dtype=object),
                                 "numcust": pd.Series([], dtype="int64"),
                                 "totacctbal_cents": pd.Series([], dtype="int64")})
        return (b.groupby("n_name", sort=False, as_index=False)
                [["numcust", "totacctbal_cents"]].sum())

    return (idle.map_batches(Partial, batch_format="pandas",
                             concurrency=(1, 2))
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def sql_q22_idle_customers() -> str:
    return """
WITH c AS (
  SELECT c_custkey, c_nationkey,
         CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS ac
  FROM customer
),
pos AS (
  SELECT CAST(sum(ac) AS BIGINT) AS s, count(*) AS c FROM c WHERE ac > 0
)
SELECT n_name, count(*) AS numcust,
       CAST(sum(ac) AS BIGINT) AS totacctbal_cents
FROM c, pos
JOIN nation ON n_nationkey = c_nationkey
WHERE ac * pos.c > pos.s
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderpriority = '1-URGENT')
GROUP BY n_name"""


def sql_q10_returned_items(k: int = 20) -> str:
    lo, hi = Q10_QUARTER
    return f"""
WITH rev AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
                             + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{lo}' AND o_orderdate < TIMESTAMP '{hi}'
  GROUP BY o_custkey
)
SELECT c_custkey, c_name, n_name, revenue_cents
FROM rev
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
ORDER BY revenue_cents DESC, c_custkey
LIMIT {k}"""


Q15_START = (1996, 1)  # quarter start; window = 3 months
Q8_REGION = "ASIA"
Q8_NATION = "NATION_2"
Q8_TYPE = "PROMO"
Q8_YEARS = (1995, 1996)


def q15_top_supplier(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q15 shape: supplier(s) with the maximum revenue over one ship
    quarter -> (s_suppkey, s_name, total_rev_cents), ties included.

    The quarter predicate is pushed into the parquet scan; per-supplier
    revenue is a bucketed int64-cents sum (supplier scales with SF — never
    a driver dict); the global max folds from the AGGREGATED per-supplier
    table (a Dataset.max scalar, supplier-bounded); the name attach is a
    bucketed merge join. The reference for the join discipline is
    q7_nation_trade (CLAUDE.md Dataset.join ban)."""
    from datetime import datetime

    import pyarrow.compute as pc

    from ..functions.bucketing import bucketed_attach, bucketed_sum

    y, m = Q15_START
    lo = pa.scalar(datetime(y, m, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(y, m + 3, 1), pa.timestamp("us"))
    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    )

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
            "rc": _cents(b["l_extendedprice"].to_numpy()
                         * (1.0 - b["l_discount"].to_numpy())),
        })
        return out.groupby("l_suppkey", sort=False, as_index=False)[
            "rc"].sum()

    rev = bucketed_sum(
        li.map_batches(derive, batch_format="pandas"),
        ["l_suppkey"], "rc", n_buckets).materialize()  # supplier-bounded
    if rev.count() == 0:
        return rd.from_arrow(pa.table({
            "s_suppkey": pa.array([], pa.int64()),
            "s_name": pa.array([], pa.string()),
            "total_rev_cents": pa.array([], pa.int64()),
        }))
    top = int(rev.max("rc"))

    winners = rev.map_batches(
        lambda b: b[b["rc"].to_numpy(np.int64) == top],
        batch_format="pandas")
    named = bucketed_attach(
        winners, rd.read_parquet(f"{sf_dir}/supplier.parquet",
                                 columns=["s_suppkey", "s_name"]),
        left_on="l_suppkey", right_on="s_suppkey",
        left_cols=["l_suppkey", "rc"], payload={"s_name": "s_name"},
        payload_fill="", left_fill={"rc": np.int64(0)},
        n_buckets=n_buckets)

    def final(b: pd.DataFrame) -> pa.Table:
        return pa.table({
            "s_suppkey": pa.array(b["l_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "s_name": pa.array(b["s_name"], pa.string()),
            "total_rev_cents": pa.array(b["rc"].to_numpy(np.int64),
                                        pa.int64()),
        })

    return named.map_batches(final, batch_format="pandas")


def sql_q15_top_supplier() -> str:
    y, m = Q15_START
    lo, hi = f"{y}-{m:02d}-01", f"{y}-{m + 3:02d}-01"
    return f"""
WITH rev AS (
  SELECT l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
                             + 0.5) AS BIGINT)) AS BIGINT) AS rc
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{lo}' AND l_shipdate < TIMESTAMP '{hi}'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, rc AS total_rev_cents
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE rc = (SELECT max(rc) FROM rev)"""


def q8_market_share(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q8 shape: the target nation's share of a region's market for
    one part type, per order year -> (o_year, nation_cents, total_cents,
    mkt_share).

    Five tables meet on the lineitem stream without any driver-scale
    state: orders (date-pruned at the scan) carries the year; customer and
    supplier nationkeys ride in via bucketed merge joins (both grow with
    SF); part-type membership is a bucketed SEMI join (part grows with
    SF); only the 25-row nation->region map broadcasts. The final fold is
    enum-bounded (years x in/out flag) and the share is one division of
    two exact int64 cent sums."""
    from datetime import datetime

    import pyarrow.compute as pc

    from ..functions.bucketing import bucketed_attach, bucketed_semi

    nat = rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()
    reg = {r["r_regionkey"]: r["r_name"]
           for r in rd.read_parquet(f"{sf_dir}/region.parquet").take_all()}
    region_keys = {r["n_nationkey"] for r in nat
                   if reg[r["n_regionkey"]] == Q8_REGION}
    target_keys = {r["n_nationkey"] for r in nat if r["n_name"] == Q8_NATION}

    y0, y1 = Q8_YEARS
    lo = pa.scalar(datetime(y0, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(y1 + 1, 1, 1), pa.timestamp("us"))
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(pc.field("o_orderdate") >= lo)
        & (pc.field("o_orderdate") < hi),
    ).map_batches(
        lambda b: pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(np.int64),
            "o_custkey": b["o_custkey"].to_numpy(np.int64),
            "o_year": b["o_orderdate"].dt.year.astype("int64"),
        }), batch_format="pandas")

    orders = bucketed_attach(
        orders, rd.read_parquet(f"{sf_dir}/customer.parquet",
                                columns=["c_custkey", "c_nationkey"]),
        left_on="o_custkey", right_on="c_custkey",
        left_cols=["o_orderkey", "o_year"],
        payload={"c_nationkey": "c_nat"}, payload_fill=np.int64(0),
        left_fill={"o_orderkey": np.int64(0), "o_year": np.int64(0)},
        n_buckets=n_buckets,
        empty_dtypes={"o_orderkey": "int64", "o_year": "int64",
                      "c_nat": "int64"},
    ).map_batches(
        # 25-key constant filter: keep orders whose customer sits in the
        # target region
        lambda b: b.loc[b["c_nat"].isin(region_keys),
                        ["o_orderkey", "o_year"]],
        batch_format="pandas")

    def li_derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
            "rev": _cents(b["l_extendedprice"].to_numpy()
                          * (1.0 - b["l_discount"].to_numpy())),
        })

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_derive, batch_format="pandas")

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"],
        filter=pc.field("p_type") == Q8_TYPE,
    )
    li = bucketed_semi(
        li, part, left_on="l_partkey", right_on="p_partkey",
        left_cols=["l_orderkey", "l_suppkey", "rev"],
        left_fill={"rev": np.int64(0)}, n_buckets=n_buckets,
        empty_dtypes={"l_orderkey": "int64", "l_suppkey": "int64",
                      "rev": "int64"},
    )

    li = bucketed_attach(
        li, rd.read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"]),
        left_on="l_suppkey", right_on="s_suppkey",
        left_cols=["l_orderkey", "rev"],
        payload={"s_nationkey": "s_nat"}, payload_fill=np.int64(0),
        left_fill={"l_orderkey": np.int64(0), "rev": np.int64(0)},
        n_buckets=n_buckets,
        empty_dtypes={"l_orderkey": "int64", "rev": "int64",
                      "s_nat": "int64"},
    )

    joined = bucketed_attach(
        li, orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["rev", "s_nat"],
        payload={"o_year": "o_year"}, payload_fill=np.int64(0),
        left_fill={"rev": np.int64(0), "s_nat": np.int64(0)},
        n_buckets=n_buckets,
        empty_dtypes={"rev": "int64", "s_nat": "int64", "o_year": "int64"},
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rc = b["rev"].to_numpy(np.int64)
        tgt = b["s_nat"].isin(target_keys).to_numpy()
        out = pd.DataFrame({"o_year": b["o_year"].to_numpy(np.int64),
                            "nc": np.where(tgt, rc, 0).astype(np.int64),
                            "tc": rc})
        return out.groupby("o_year", sort=False, as_index=False)[
            ["nc", "tc"]].sum()

    def final(b: pd.DataFrame) -> pa.Table:
        g = (b.groupby("o_year", sort=False, as_index=False)[
            ["nc", "tc"]].sum() if len(b) else b)
        nc = g["nc"].to_numpy(np.int64)
        tc = g["tc"].to_numpy(np.int64)
        return pa.table({
            "o_year": pa.array(g["o_year"].to_numpy(np.int64), pa.int64()),
            "nation_cents": pa.array(nc, pa.int64()),
            "total_cents": pa.array(tc, pa.int64()),
            "mkt_share": pa.array(
                np.divide(nc, tc, out=np.zeros(len(g)), where=tc > 0),
                pa.float64()),
        })

    seed = rd.from_arrow(pa.table({
        "o_year": pa.array([], pa.int64()),
        "nation_cents": pa.array([], pa.int64()),
        "total_cents": pa.array([], pa.int64()),
        "mkt_share": pa.array([], pa.float64()),
    }))
    return (joined.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None)
            .union(seed))


def sql_q8_market_share() -> str:
    y0, y1 = Q8_YEARS
    return f"""
WITH j AS (
  SELECT year(o_orderdate) AS o_year,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
              AS BIGINT) AS rc,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region   ON cn.n_regionkey = r_regionkey
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
  WHERE r_name = '{Q8_REGION}' AND p_type = '{Q8_TYPE}'
    AND o_orderdate >= TIMESTAMP '{y0}-01-01'
    AND o_orderdate < TIMESTAMP '{y1 + 1}-01-01'
)
SELECT o_year,
       CAST(sum(CASE WHEN supp_nation = '{Q8_NATION}' THEN rc ELSE 0 END)
            AS BIGINT) AS nation_cents,
       CAST(sum(rc) AS BIGINT) AS total_cents,
       CASE WHEN sum(rc) = 0 THEN 0.0
            ELSE CAST(sum(CASE WHEN supp_nation = '{Q8_NATION}'
                              THEN rc ELSE 0 END) AS DOUBLE)
                 / CAST(sum(rc) AS DOUBLE)
       END AS mkt_share
FROM j GROUP BY o_year"""


# ------------------------------------------------------------ Q13 / Q21

Q13_EXCLUDED = "1-URGENT"  # the o_comment NOT LIKE '%special%requests%' analog


def q13_customer_distribution(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q13 shape: customer order-count DISTRIBUTION -> (n_orders,
    custdist), counting only non-excluded orders and including zero-order
    customers (the LEFT OUTER + two-level aggregate shape; the testdata
    schema has no o_comment, so the exclusion predicate is the priority
    enum).

    Level 1 reuses the union-with-zeros LEFT OUTER fold
    (``customer_order_counts``): order counts union a zero row per customer,
    one bucketed sum — valid because o_custkey is a foreign key. Level 2 is
    domain-bounded (distinct order counts ~O(100)) so it folds via per-batch
    partials + one coalesced merge, no second shuffle."""
    from ..functions.bucketing import bucketed_count, bucketed_sum

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_custkey"],
        filter=pc.field("o_orderpriority") != Q13_EXCLUDED,
    )
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey"])
    counts = bucketed_count(orders, ["o_custkey"], name="n_orders",
                            n_buckets=n_buckets).map_batches(
        lambda b: pd.DataFrame({
            "c_custkey": b["o_custkey"].astype("int64"),
            "n_orders": b["n_orders"].astype("int64"),
        }), batch_format="pandas")
    zeros = cust.map_batches(
        lambda b: pd.DataFrame({
            "c_custkey": b["c_custkey"].astype("int64"),
            "n_orders": np.zeros(len(b), dtype=np.int64),
        }), batch_format="pandas")
    per_cust = bucketed_sum(counts.union(zeros), ["c_custkey"], "n_orders",
                            n_buckets=n_buckets)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby("n_orders", sort=False).size()
                .rename("custdist").reset_index())

    return (per_cust.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(
                lambda b: b.groupby("n_orders", sort=False, as_index=False)
                ["custdist"].sum().astype({"n_orders": "int64",
                                           "custdist": "int64"}),
                batch_format="pandas", batch_size=None))


def sql_q13_customer_distribution() -> str:
    return f"""
WITH c AS (
  SELECT c_custkey, count(o.o_custkey) AS n_orders
  FROM customer LEFT JOIN orders o
    ON o.o_custkey = c_custkey AND o.o_orderpriority <> '{Q13_EXCLUDED}'
  GROUP BY c_custkey
)
SELECT n_orders, count(*) AS custdist FROM c GROUP BY n_orders"""


def q21_waiting_supplier(sf_dir: str, k: int = 100, n_buckets: int = 64):
    """TPC-H Q21 shape: suppliers who SOLELY caused a problem on
    multi-supplier finalized orders -> top-k (s_name, numwait).

    The testdata schema has no commit/receipt dates, so "late line" =
    l_returnflag = 'R' (the returned line is the fault signal); order scope
    is o_orderstatus = 'F' exactly as in Q21. Per supplier s, an order o
    counts iff: s shipped a late line of o, o has >1 distinct suppliers
    (EXISTS another supplier), and NO other supplier was late (NOT EXISTS)
    — the grouped set-cardinality form of Q21's correlated EXISTS pair.

    Plan (zero driver-side key state, three bounded exchanges):
      1. SEMI join lineitem against F-status orders (``bucketed_semi``,
         both sides fact-scale).
      2. ONE orderkey-bucketed exchange: map-side partial dedups to
         (orderkey, suppkey, any_late) — bounding a hot order's map output
         — and the in-bucket merge computes per-order n_supp / n_late and
         emits the sole-fault winners' partial per-supplier counts.
      3. Supplier-keyed bucketed sum + ``bucketed_attach`` of s_name
         (supplier grows with SF: never a driver broadcast), then a
         result-bounded sort/limit."""
    from ..functions.bucketing import (bucketed_apply, bucketed_attach,
                                       bucketed_semi, bucketed_sum)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"],
    )
    f_orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey"],
        filter=pc.field("o_orderstatus") == "F",
    )
    scoped = bucketed_semi(
        li, f_orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "l_suppkey", "l_returnflag"],
        left_fill={"l_suppkey": 0, "l_returnflag": ""},
        n_buckets=n_buckets,
        empty_dtypes={"l_orderkey": "int64", "l_suppkey": "int64",
                      "l_returnflag": object},
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"l_orderkey": pd.Series([], dtype="int64"),
                                 "l_suppkey": pd.Series([], dtype="int64"),
                                 "late": pd.Series([], dtype="int64")})
        d = pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy().astype(np.int64),
            "l_suppkey": b["l_suppkey"].to_numpy().astype(np.int64),
            "late": (b["l_returnflag"] == "R").to_numpy().astype(np.int64),
        })
        return d.groupby(["l_orderkey", "l_suppkey"], sort=False,
                         as_index=False)["late"].max()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"l_suppkey": pd.Series([], dtype="int64"),
                                 "numwait": pd.Series([], dtype="int64")})
        d = g.groupby(["l_orderkey", "l_suppkey"], sort=False,
                      as_index=False)["late"].max()
        per_order = d.groupby("l_orderkey", sort=False)
        n_supp = per_order["l_suppkey"].transform("size")
        n_late = per_order["late"].transform("sum")
        win = d.loc[(d["late"] == 1) & (n_late == 1) & (n_supp > 1)]
        return (win.groupby("l_suppkey", sort=False).size()
                .rename("numwait").reset_index())

    waits = bucketed_apply(scoped, ["l_orderkey"], merge, partial,
                           n_buckets=n_buckets)
    totals = bucketed_sum(waits, ["l_suppkey"], "numwait", n_buckets=16)
    named = bucketed_attach(
        totals, rd.read_parquet(f"{sf_dir}/supplier.parquet",
                                columns=["s_suppkey", "s_name"]),
        left_on="l_suppkey", right_on="s_suppkey",
        left_cols=["numwait"], payload={"s_name": "s_name"},
        left_fill={"numwait": 0}, payload_fill="", n_buckets=16,
        empty_dtypes={"numwait": "int64", "s_name": object},
    )
    out = named.map_batches(
        lambda b: pd.DataFrame({
            "s_name": b["s_name"].astype(str),
            "numwait": b["numwait"].astype("int64"),
        }) if len(b) else pd.DataFrame({
            "s_name": pd.Series([], dtype=object),
            "numwait": pd.Series([], dtype="int64")}),
        batch_format="pandas")
    # result-bounded: one row per at-fault supplier
    return out.sort(["numwait", "s_name"], descending=[True, False]).limit(k)


def sql_q21_waiting_supplier(k: int = 100) -> str:
    return f"""
WITH l AS (
  SELECT l_orderkey, l_suppkey,
         max(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS late
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey, l_suppkey
),
o AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(late) AS n_late
  FROM l GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM l JOIN o USING (l_orderkey) JOIN supplier ON s_suppkey = l_suppkey
WHERE l.late = 1 AND o.n_late = 1 AND o.n_supp > 1
GROUP BY s_name
ORDER BY numwait DESC, s_name LIMIT {k}"""


# ------------------------------------------------------------------- Q9

Q9_NAME_TOKEN = "red"  # the p_name LIKE '%green%' analog for this corpus


def q9_product_profit(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q9 shape: profit per (supplier nation, order year) over parts
    whose name matches a token -> (nation, o_year, profit_cents).

    The testdata has no partsupp table, so per-unit supply cost is derived
    from the part itself (60% of retail price, exact integer cents) — the
    shape is unchanged: a name-filtered part attach prices the fact stream,
    supplier and orders attach nation/year, and the fold is enum-bounded
    (25 nations x ~8 years). All money stays int64 cents
    (profit = rc - cost*qty), so the oracle matches bit-for-bit.

    Scale: part/supplier/orders all grow with SF -> every join is a
    bucketed exchange on the fact stream; only the 25-row nation name map
    broadcasts. Same plan family as ``q8_market_share``."""
    from ..functions.bucketing import bucketed_attach

    nat_name = {r["n_nationkey"]: r["n_name"]
                for r in rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()}

    def li_derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "l_orderkey": b["l_orderkey"].to_numpy(np.int64),
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
            "rc": _cents(b["l_extendedprice"].to_numpy()
                         * (1.0 - b["l_discount"].to_numpy())),
            "qty": np.floor(b["l_quantity"].to_numpy() + 0.5).astype(np.int64),
        })

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_derive, batch_format="pandas")

    def part_derive(b: pd.DataFrame) -> pd.DataFrame:
        m = b["p_name"].str.contains(Q9_NAME_TOKEN, regex=False)
        kept = b.loc[m]
        return pd.DataFrame({
            "p_partkey": kept["p_partkey"].to_numpy(np.int64),
            "cost": np.floor(kept["p_retailprice"].to_numpy() * 60.0
                             + 0.5).astype(np.int64),
        })

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_retailprice"],
    ).map_batches(part_derive, batch_format="pandas")

    # inner-join semantics of the attach double as the name filter
    li = bucketed_attach(
        li, part, left_on="l_partkey", right_on="p_partkey",
        left_cols=["l_orderkey", "l_suppkey", "rc", "qty"],
        payload={"cost": "cost"}, payload_fill=np.int64(0),
        left_fill={"l_orderkey": np.int64(0), "l_suppkey": np.int64(0),
                   "rc": np.int64(0), "qty": np.int64(0)},
        n_buckets=n_buckets,
        empty_dtypes={"l_orderkey": "int64", "l_suppkey": "int64",
                      "rc": "int64", "qty": "int64", "cost": "int64"},
    )

    li = bucketed_attach(
        li, rd.read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"]),
        left_on="l_suppkey", right_on="s_suppkey",
        left_cols=["l_orderkey", "rc", "qty", "cost"],
        payload={"s_nationkey": "s_nat"}, payload_fill=np.int64(0),
        left_fill={"l_orderkey": np.int64(0), "rc": np.int64(0),
                   "qty": np.int64(0), "cost": np.int64(0)},
        n_buckets=n_buckets,
        empty_dtypes={"l_orderkey": "int64", "rc": "int64", "qty": "int64",
                      "cost": "int64", "s_nat": "int64"},
    )

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"],
    ).map_batches(
        lambda b: pd.DataFrame({
            "o_orderkey": b["o_orderkey"].to_numpy(np.int64),
            "o_year": b["o_orderdate"].dt.year.astype("int64"),
        }), batch_format="pandas")

    joined = bucketed_attach(
        li, orders, left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["rc", "qty", "cost", "s_nat"],
        payload={"o_year": "o_year"}, payload_fill=np.int64(0),
        left_fill={"rc": np.int64(0), "qty": np.int64(0),
                   "cost": np.int64(0), "s_nat": np.int64(0)},
        n_buckets=n_buckets,
        empty_dtypes={"rc": "int64", "qty": "int64", "cost": "int64",
                      "s_nat": "int64", "o_year": "int64"},
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "s_nat": b["s_nat"].to_numpy(np.int64),
            "o_year": b["o_year"].to_numpy(np.int64),
            "profit_cents": (b["rc"].to_numpy(np.int64)
                             - b["cost"].to_numpy(np.int64)
                             * b["qty"].to_numpy(np.int64)),
        })
        return out.groupby(["s_nat", "o_year"], sort=False,
                           as_index=False)["profit_cents"].sum()

    def final(b: pd.DataFrame) -> pa.Table:
        g = (b.groupby(["s_nat", "o_year"], sort=False, as_index=False)
             ["profit_cents"].sum() if len(b) else b)
        return pa.table({
            "nation": pa.array([nat_name[int(x)] for x in g["s_nat"]],
                               pa.string()),
            "o_year": pa.array(g["o_year"].to_numpy(np.int64), pa.int64()),
            "profit_cents": pa.array(g["profit_cents"].to_numpy(np.int64),
                                     pa.int64()),
        })

    seed = rd.from_arrow(pa.table({
        "nation": pa.array([], pa.string()),
        "o_year": pa.array([], pa.int64()),
        "profit_cents": pa.array([], pa.int64()),
    }))
    return (joined.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None)
            .union(seed))


def sql_q9_product_profit() -> str:
    return f"""
WITH j AS (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
              AS BIGINT)
         - CAST(floor(p_retailprice * 60.0 + 0.5) AS BIGINT)
           * CAST(floor(l_quantity + 0.5) AS BIGINT) AS profit_cents
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  WHERE p_name LIKE '%{Q9_NAME_TOKEN}%'
)
SELECT nation, o_year, CAST(sum(profit_cents) AS BIGINT) AS profit_cents
FROM j GROUP BY nation, o_year"""


# ------------------------------------------------------- Q2 / Q11 / Q16 / Q20
# The last four TPC-H shapes. The testdata has no partsupp table, so the
# per-(part, supplier) offer grain is derived from lineitem: min/sum over
# the fact stream replaces ps_supplycost / ps_availqty (reference parity:
# the robokop CDW reader also derives pair grain from observation facts,
# /root/reference/builder/cdw.py). Shapes — correlated-min subquery (Q2),
# share-of-global-scalar HAVING (Q11), distinct-count with anti-joined
# exclusions (Q16), nested double-aggregate semi chain (Q20) — are intact.

Q2_TYPE = "STANDARD"
Q2_MIN_SIZE = 25
Q2_REGION = "EUROPE"


def _region_nations(sf_dir: str, region: str) -> set[int]:
    """nationkeys of one region — 25/5-row constant tables, driver-bounded
    by SPEC (TPC-H nation/region never grow with SF)."""
    reg = {r["r_regionkey"] for r in
           rd.read_parquet(f"{sf_dir}/region.parquet").take_all()
           if r["r_name"] == region}
    return {r["n_nationkey"] for r in
            rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()
            if r["n_regionkey"] in reg}


def q2_min_cost_supplier(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q2 shape: for each part of one type/size class, the region
    supplier(s) offering the minimum cost -> (p_partkey, p_name, s_suppkey,
    s_name, s_acctbal, n_name, min_cost_cents), ties included (no LIMIT —
    the driver compare is order-free).

    Plan: lineitem collapses to the (part, supplier) offer grain with a
    bucketed min (cost = min extendedprice cents); supplier nation/name/
    acctbal attach through one bucketed exchange (supplier scales with SF —
    never a driver dict); the region filter is a vectorized isin against
    the 25-nation broadcast; the CORRELATED MIN is one exchange on partkey
    (groupby-transform-min inside the bucket); the part type/size filter
    rides the inner-attach semantics. Raw s_acctbal doubles pass through
    untouched on both sides, so the hash compare is bit-exact."""
    from ..functions.bucketing import bucketed_apply, bucketed_attach, bucketed_min

    nations = _region_nations(sf_dir, Q2_REGION)
    nat_name = {r["n_nationkey"]: r["n_name"]
                for r in rd.read_parquet(f"{sf_dir}/nation.parquet").take_all()}

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    ).map_batches(
        lambda b: pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
            "cost": _cents(b["l_extendedprice"].to_numpy()),
        }), batch_format="pandas")
    offers = bucketed_min(li, ["l_partkey", "l_suppkey"], "cost", n_buckets)

    offers = bucketed_attach(
        offers, rd.read_parquet(f"{sf_dir}/supplier.parquet",
                                columns=["s_suppkey", "s_name",
                                         "s_nationkey", "s_acctbal"]),
        left_on="l_suppkey", right_on="s_suppkey",
        left_cols=["l_partkey", "l_suppkey", "cost"],
        payload={"s_name": "s_name", "s_nationkey": "s_nat",
                 "s_acctbal": "s_acctbal"},
        payload_fill={"s_name": "", "s_nat": np.int64(0),
                      "s_acctbal": np.float64(0.0)},
        left_fill={"l_partkey": np.int64(0), "l_suppkey": np.int64(0),
                   "cost": np.int64(0)},
        n_buckets=n_buckets,
        empty_dtypes={"l_partkey": "int64", "l_suppkey": "int64",
                      "cost": "int64", "s_name": object, "s_nat": "int64",
                      "s_acctbal": "float64"},
    )

    nat_ref = ray.put(nations)

    def in_region(b: pd.DataFrame) -> pd.DataFrame:
        ns = ray.get(nat_ref)
        return b[b["s_nat"].isin(list(ns))]

    regional = offers.map_batches(in_region, batch_format="pandas")

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("l_partkey", sort=False)["cost"].transform("min")
        return g[g["cost"].to_numpy(np.int64) == m.to_numpy(np.int64)]

    winners = bucketed_apply(regional, ["l_partkey"], keep_min,
                             n_buckets=n_buckets)

    def part_filter(b: pd.DataFrame) -> pd.DataFrame:
        m = (b["p_type"] == Q2_TYPE) & (b["p_size"].to_numpy(np.int64)
                                        >= Q2_MIN_SIZE)
        return b.loc[m, ["p_partkey", "p_name"]]

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_type", "p_size"],
    ).map_batches(part_filter, batch_format="pandas")

    named = bucketed_attach(
        winners, part, left_on="l_partkey", right_on="p_partkey",
        left_cols=["l_partkey", "l_suppkey", "cost", "s_name", "s_nat",
                   "s_acctbal"],
        payload={"p_name": "p_name"}, payload_fill="",
        left_fill={"l_partkey": np.int64(0), "l_suppkey": np.int64(0),
                   "cost": np.int64(0), "s_name": "", "s_nat": np.int64(0),
                   "s_acctbal": np.float64(0.0)},
        n_buckets=n_buckets,
        empty_dtypes={"l_partkey": "int64", "l_suppkey": "int64",
                      "cost": "int64", "s_name": object, "s_nat": "int64",
                      "s_acctbal": "float64", "p_name": object},
    )

    def final(b: pd.DataFrame) -> pa.Table:
        return pa.table({
            "p_partkey": pa.array(b["l_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "p_name": pa.array(b["p_name"], pa.string()),
            "s_suppkey": pa.array(b["l_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "s_name": pa.array(b["s_name"], pa.string()),
            "s_acctbal": pa.array(b["s_acctbal"].to_numpy(np.float64),
                                  pa.float64()),
            "n_name": pa.array([nat_name[int(x)] for x in b["s_nat"]],
                               pa.string()),
            "min_cost_cents": pa.array(b["cost"].to_numpy(np.int64),
                                       pa.int64()),
        })

    seed = rd.from_arrow(pa.table({
        "p_partkey": pa.array([], pa.int64()),
        "p_name": pa.array([], pa.string()),
        "s_suppkey": pa.array([], pa.int64()),
        "s_name": pa.array([], pa.string()),
        "s_acctbal": pa.array([], pa.float64()),
        "n_name": pa.array([], pa.string()),
        "min_cost_cents": pa.array([], pa.int64()),
    }))
    return named.map_batches(final, batch_format="pandas").union(seed)


def sql_q2_min_cost_supplier() -> str:
    return f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         CAST(min(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), rps AS (
  SELECT ps.*, s_name, s_acctbal, n_name
  FROM ps
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = '{Q2_REGION}'
)
SELECT p_partkey, p_name, l_suppkey AS s_suppkey, s_name, s_acctbal,
       n_name, cost AS min_cost_cents
FROM rps JOIN part ON l_partkey = p_partkey
WHERE p_type = '{Q2_TYPE}' AND p_size >= {Q2_MIN_SIZE}
  AND cost = (SELECT min(cost) FROM rps r2
              WHERE r2.l_partkey = rps.l_partkey)"""


Q11_REGION = "ASIA"
Q11_SHARE_DENOM = 1000  # keep parts with value * DENOM > total (exact ints)


def q11_important_stock(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q11 shape: parts whose inventory value held by one region's
    suppliers exceeds a fixed fraction of the region total ->
    (p_partkey, value_cents).

    Plan: supplier nation rides one bucketed attach onto the fact stream
    (supplier scales with SF), the region filter is an isin against the
    25-nation broadcast, per-part value is a bucketed int64-cents sum, and
    the HAVING-over-global-scalar folds from the AGGREGATED per-part table
    (Dataset.sum scalar — part-cardinality input, same boundedness as
    q15's supplier materialize). The share test is exact integer math:
    value * {Q11_SHARE_DENOM} > total, never a float division."""
    from ..functions.bucketing import bucketed_attach, bucketed_sum

    nations = _region_nations(sf_dir, Q11_REGION)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_extendedprice"],
    ).map_batches(
        lambda b: pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
            "vc": _cents(b["l_extendedprice"].to_numpy()),
        }), batch_format="pandas")

    li = bucketed_attach(
        li, rd.read_parquet(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_nationkey"]),
        left_on="l_suppkey", right_on="s_suppkey",
        left_cols=["l_partkey", "vc"],
        payload={"s_nationkey": "s_nat"}, payload_fill=np.int64(0),
        left_fill={"l_partkey": np.int64(0), "vc": np.int64(0)},
        n_buckets=n_buckets,
        empty_dtypes={"l_partkey": "int64", "vc": "int64", "s_nat": "int64"},
    )

    nat_ref = ray.put(nations)

    def in_region(b: pd.DataFrame) -> pd.DataFrame:
        ns = ray.get(nat_ref)
        return b.loc[b["s_nat"].isin(list(ns)), ["l_partkey", "vc"]]

    regional = li.map_batches(in_region, batch_format="pandas")
    per_part = bucketed_sum(regional, ["l_partkey"], "vc",
                            n_buckets).materialize()  # part-bounded

    seed = rd.from_arrow(pa.table({
        "p_partkey": pa.array([], pa.int64()),
        "value_cents": pa.array([], pa.int64()),
    }))
    if per_part.count() == 0:
        return seed
    total = int(per_part.sum("vc"))

    def keep(b: pd.DataFrame) -> pa.Table:
        v = b["vc"].to_numpy(np.int64)
        m = v * Q11_SHARE_DENOM > total
        return pa.table({
            "p_partkey": pa.array(b.loc[m, "l_partkey"].to_numpy(np.int64),
                                  pa.int64()),
            "value_cents": pa.array(v[m], pa.int64()),
        })

    return per_part.map_batches(keep, batch_format="pandas").union(seed)


def sql_q11_important_stock() -> str:
    return f"""
WITH rli AS (
  SELECT l_partkey,
         CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS vc
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = '{Q11_REGION}'
)
SELECT l_partkey AS p_partkey, CAST(sum(vc) AS BIGINT) AS value_cents
FROM rli GROUP BY l_partkey
HAVING CAST(sum(vc) AS BIGINT) * {Q11_SHARE_DENOM}
       > (SELECT CAST(sum(vc) AS BIGINT) FROM rli)"""


Q16_EXCL_BRAND = "Brand#13"
Q16_EXCL_TYPE = "PROMO"         # p_type <> analog of NOT LIKE 'MEDIUM%'
Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)
Q16_ACCTBAL_MIN = 1000.0        # s_comment complaints analog: exclude below


def q16_supplier_counts(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q16 shape: distinct supplier count per (brand, type, size)
    class, excluding one brand/type, a size whitelist, and "complaint"
    suppliers (acctbal analog) -> (p_brand, p_type, p_size, supplier_cnt).

    Plan: the (part, supplier) offer grain is a bucketed DISTINCT over the
    fact stream (partial drop_duplicates per batch bounds shuffle volume);
    complaint suppliers leave via a bucketed ANTI join (supplier scales
    with SF — never a driver set); part attrs ride the inner attach which
    doubles as the class filter; the distinct supplier count folds in one
    more partial-deduped exchange, and the final count is class-bounded
    (25 brands x 6 types x {len(Q16_SIZES)} sizes) so it coalesces to one
    block without an AllToAll."""
    from ..functions.bucketing import (bucketed_attach, bucketed_distinct,
                                       bucketed_semi)

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"],
    ).map_batches(
        lambda b: pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
        }), batch_format="pandas")
    pairs = bucketed_distinct(li, ["l_partkey", "l_suppkey"], n_buckets)

    excluded = rd.read_parquet(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"],
        filter=(pc.field("s_acctbal") < Q16_ACCTBAL_MIN),
    )
    pairs = bucketed_semi(
        pairs, excluded, left_on="l_suppkey", right_on="s_suppkey",
        left_cols=["l_partkey", "l_suppkey"], anti=True,
        left_fill={"l_partkey": np.int64(0)},
        n_buckets=n_buckets,
        empty_dtypes={"l_partkey": "int64", "l_suppkey": "int64"},
    )

    def part_filter(b: pd.DataFrame) -> pd.DataFrame:
        m = ((b["p_brand"] != Q16_EXCL_BRAND)
             & (b["p_type"] != Q16_EXCL_TYPE)
             & b["p_size"].isin(list(Q16_SIZES)))
        return b.loc[m, ["p_partkey", "p_brand", "p_type", "p_size"]]

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).map_batches(part_filter, batch_format="pandas")

    classed = bucketed_attach(
        pairs, part, left_on="l_partkey", right_on="p_partkey",
        left_cols=["l_suppkey"],
        payload={"p_brand": "p_brand", "p_type": "p_type",
                 "p_size": "p_size"},
        payload_fill={"p_brand": "", "p_type": "", "p_size": np.int64(0)},
        left_fill={}, n_buckets=n_buckets,
        empty_dtypes={"l_suppkey": "int64", "p_brand": object,
                      "p_type": object, "p_size": "int64"},
    )

    # distinct (class, supplier) — partial dedup per batch, one exchange
    dsupp = bucketed_distinct(
        classed, ["p_brand", "p_type", "p_size", "l_suppkey"], n_buckets)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(["p_brand", "p_type", "p_size"], sort=False)
                .size().rename("supplier_cnt").reset_index())

    def final(b: pd.DataFrame) -> pa.Table:
        g = (b.groupby(["p_brand", "p_type", "p_size"], sort=False,
                       as_index=False)["supplier_cnt"].sum()
             if len(b) else b)
        return pa.table({
            "p_brand": pa.array(g["p_brand"], pa.string()),
            "p_type": pa.array(g["p_type"], pa.string()),
            "p_size": pa.array(g["p_size"].to_numpy(np.int64), pa.int64()),
            "supplier_cnt": pa.array(
                g["supplier_cnt"].to_numpy(np.int64), pa.int64()),
        })

    seed = rd.from_arrow(pa.table({
        "p_brand": pa.array([], pa.string()),
        "p_type": pa.array([], pa.string()),
        "p_size": pa.array([], pa.int64()),
        "supplier_cnt": pa.array([], pa.int64()),
    }))
    return (dsupp.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None)
            .union(seed))


def sql_q16_supplier_counts() -> str:
    sizes = ", ".join(str(s) for s in Q16_SIZES)
    return f"""
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
  WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                          WHERE s_acctbal < {Q16_ACCTBAL_MIN})
)
SELECT p_brand, p_type, p_size,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM pairs JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{Q16_EXCL_BRAND}' AND p_type <> '{Q16_EXCL_TYPE}'
  AND p_size IN ({sizes})
GROUP BY p_brand, p_type, p_size"""


Q20_YEAR = 1997
Q20_PREFIX = "cold"
Q20_REGION = "AMERICA"


def q20_excess_suppliers(sf_dir: str, n_buckets: int = 64):
    """TPC-H Q20 shape: suppliers in one region who dominate the supply of
    some name-prefixed part over one year (pair qty > half the part's
    total) -> (s_suppkey, s_name).

    Plan: the year predicate pushes into the parquet scan; the part-name
    semi filter is a bucketed SEMI (part scales with SF); the pair grain
    is a bucketed int64 sum; the NESTED aggregate (pair vs per-part total)
    is ONE exchange on partkey — transform-sum inside the bucket, dominance
    test vectorized (2*pair > total, exact ints); the surviving supplier
    set is distinct-folded, named via a bucketed attach, and region-
    filtered against the 25-nation broadcast."""
    from datetime import datetime

    from ..functions.bucketing import (bucketed_apply, bucketed_attach,
                                       bucketed_distinct, bucketed_semi,
                                       bucketed_sum)

    nations = _region_nations(sf_dir, Q20_REGION)
    lo = pa.scalar(datetime(Q20_YEAR, 1, 1), pa.timestamp("us"))
    hi = pa.scalar(datetime(Q20_YEAR + 1, 1, 1), pa.timestamp("us"))

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity"],
        filter=(pc.field("l_shipdate") >= lo) & (pc.field("l_shipdate") < hi),
    ).map_batches(
        lambda b: pd.DataFrame({
            "l_partkey": b["l_partkey"].to_numpy(np.int64),
            "l_suppkey": b["l_suppkey"].to_numpy(np.int64),
            "qty": np.floor(b["l_quantity"].to_numpy()
                            + 0.5).astype(np.int64),
        }), batch_format="pandas")

    def part_filter(b: pd.DataFrame) -> pd.DataFrame:
        return b.loc[b["p_name"].str.startswith(Q20_PREFIX), ["p_partkey"]]

    part = rd.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"],
    ).map_batches(part_filter, batch_format="pandas")

    li = bucketed_semi(
        li, part, left_on="l_partkey", right_on="p_partkey",
        left_cols=["l_partkey", "l_suppkey", "qty"],
        left_fill={"l_suppkey": np.int64(0), "qty": np.int64(0)},
        n_buckets=n_buckets,
        empty_dtypes={"l_partkey": "int64", "l_suppkey": "int64",
                      "qty": "int64"},
    )
    pairs = bucketed_sum(li, ["l_partkey", "l_suppkey"], "qty", n_buckets)

    def dominant(g: pd.DataFrame) -> pd.DataFrame:
        tot = g.groupby("l_partkey", sort=False)["qty"].transform("sum")
        keep = 2 * g["qty"].to_numpy(np.int64) > tot.to_numpy(np.int64)
        return g.loc[keep, ["l_suppkey"]]

    supps = bucketed_apply(pairs, ["l_partkey"], dominant,
                           n_buckets=n_buckets)
    supps = bucketed_distinct(supps, ["l_suppkey"], n_buckets)

    named = bucketed_attach(
        supps, rd.read_parquet(f"{sf_dir}/supplier.parquet",
                               columns=["s_suppkey", "s_name",
                                        "s_nationkey"]),
        left_on="l_suppkey", right_on="s_suppkey",
        left_cols=["l_suppkey"],
        payload={"s_name": "s_name", "s_nationkey": "s_nat"},
        payload_fill={"s_name": "", "s_nat": np.int64(0)},
        left_fill={}, n_buckets=n_buckets,
        empty_dtypes={"l_suppkey": "int64", "s_name": object,
                      "s_nat": "int64"},
    )

    nat_ref = ray.put(nations)

    def final(b: pd.DataFrame) -> pa.Table:
        ns = ray.get(nat_ref)
        kept = b[b["s_nat"].isin(list(ns))]
        return pa.table({
            "s_suppkey": pa.array(kept["l_suppkey"].to_numpy(np.int64),
                                  pa.int64()),
            "s_name": pa.array(kept["s_name"], pa.string()),
        })

    seed = rd.from_arrow(pa.table({
        "s_suppkey": pa.array([], pa.int64()),
        "s_name": pa.array([], pa.string()),
    }))
    return named.map_batches(final, batch_format="pandas").union(seed)


def sql_q20_excess_suppliers() -> str:
    return f"""
WITH li AS (
  SELECT l_partkey, l_suppkey,
         CAST(floor(l_quantity + 0.5) AS BIGINT) AS q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{Q20_YEAR}-01-01'
    AND l_shipdate <  TIMESTAMP '{Q20_YEAR + 1}-01-01'
    AND l_partkey IN (SELECT p_partkey FROM part
                      WHERE p_name LIKE '{Q20_PREFIX}%')
), pairs AS (
  SELECT l_partkey, l_suppkey, CAST(sum(q) AS BIGINT) AS qty
  FROM li GROUP BY l_partkey, l_suppkey
), tot AS (
  SELECT l_partkey, CAST(sum(qty) AS BIGINT) AS t FROM pairs
  GROUP BY l_partkey
), dom AS (
  SELECT DISTINCT l_suppkey FROM pairs JOIN tot USING (l_partkey)
  WHERE 2 * qty > t
)
SELECT s_suppkey, s_name
FROM supplier JOIN dom ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = '{Q20_REGION}'"""


def _pareto2d_block(b: pd.DataFrame) -> pd.DataFrame:
    """Vectorized 2-D pareto front of one block: price_cents ASC better,
    p_size DESC better. Sort-based: a row survives iff its size equals
    its price-group max AND that max strictly beats the running max over
    all cheaper prices (ties on BOTH axes survive together — neither
    dominates)."""
    cols = ["p_partkey", "price_cents", "p_size"]
    if len(b) == 0:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype="int64"),
                             "price_cents": pd.Series([], dtype="int64"),
                             "p_size": pd.Series([], dtype="int64")})
    g = (b.groupby("price_cents", sort=True)["p_size"].max()
         .rename("gmax").reset_index())
    prior = g["gmax"].cummax().shift(1, fill_value=np.iinfo(np.int64).min)
    g = g[g["gmax"].to_numpy() > prior.to_numpy()]
    m = b.merge(g, on="price_cents")
    m = m[m["p_size"].to_numpy() == m["gmax"].to_numpy()]
    return m[cols].astype({"p_partkey": "int64", "price_cents": "int64",
                           "p_size": "int64"})


def part_skyline(sf_dir: str):
    """Pareto skyline over parts (Borzsony et al. 2001 'The Skyline
    Operator'): parts not dominated on (cheaper retail price, larger
    size) -> (p_partkey, price_cents, p_size), equal-on-both-axes ties
    all kept. Price compares in integer cents so no float ever decides
    a row.

    Distributed shape: the skyline-of-skylines identity — each block
    reduces to its local pareto front (vectorized sort-based pass),
    fronts union into ONE block (skyline cardinality is O(log n) in
    expectation for independent 2-D axes — single-block-fold budget, the
    LangIdConfusion class), and the same pass runs once more on the
    union. No shuffle at all: dominance is global, but the local front
    is a complete filter (any globally dominated row is dominated inside
    its own block or by a surviving front row)."""
    part = rd.read_parquet(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_retailprice", "p_size"])

    def derive(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "p_partkey": b["p_partkey"].to_numpy().astype(np.int64),
            "price_cents": _cents(b["p_retailprice"].to_numpy()),
            "p_size": b["p_size"].to_numpy().astype(np.int64),
        })

    local = part.map_batches(derive, batch_format="pandas").map_batches(
        _pareto2d_block, batch_format="pandas")
    return local.repartition(1).map_batches(_pareto2d_block,
                                            batch_format="pandas")


def sql_part_skyline() -> str:
    return """
WITH p AS (
  SELECT p_partkey,
         CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) AS price_cents,
         CAST(p_size AS BIGINT) AS p_size
  FROM part
)
SELECT p.p_partkey, p.price_cents, p.p_size
FROM p
WHERE NOT EXISTS (
  SELECT 1 FROM p q
  WHERE q.price_cents <= p.price_cents AND q.p_size >= p.p_size
    AND (q.price_cents < p.price_cents OR q.p_size > p.p_size))"""


def events_user_streaks(sf_dir: str, n_buckets: int = 64):
    """Gaps-and-islands: per-user active-day streaks ->
    (user_id, n_active_days, max_streak) where a streak is a maximal run
    of CONSECUTIVE calendar days with >= 1 event. The island key is the
    classic ``day - rank`` trick, vectorized over the whole bucket
    (one sort + cumcount — no per-user Python). Map side pre-distincts
    (user, day) per batch so the exchange carries at most one row per
    user-day; bucket-local distinct completes exactness (all rows of a
    user land in one bucket)."""
    from ..functions.bucketing import bucketed_apply

    _US_PER_DAY = 86_400_000_000

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "user_id"])

    def prep(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame({
            "user_id": t["user_id"].to_pandas().astype("int64"),
            "day": (t["ts"].cast(pa.int64()).to_pandas() // _US_PER_DAY)
            .astype("int64"),
        })
        return df.drop_duplicates()

    _empty = {
        "user_id": pd.Series([], dtype="int64"),
        "n_active_days": pd.Series([], dtype="int64"),
        "max_streak": pd.Series([], dtype="int64"),
    }

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(_empty)
        g = g.drop_duplicates().sort_values(["user_id", "day"],
                                            kind="mergesort")
        r = g.groupby("user_id", sort=False).cumcount().to_numpy(np.int64)
        island = g["day"].to_numpy(np.int64) - r
        runs = (pd.DataFrame({"user_id": g["user_id"].to_numpy(np.int64),
                              "island": island})
                .groupby(["user_id", "island"], sort=False)
                .size().rename("len").reset_index())
        out = runs.groupby("user_id", sort=False).agg(
            n_active_days=("len", "sum"),
            max_streak=("len", "max")).reset_index()
        return out.astype({"user_id": "int64", "n_active_days": "int64",
                           "max_streak": "int64"})

    return bucketed_apply(ds.map_batches(prep, batch_format="pyarrow"),
                          ["user_id"], merge, None, n_buckets)


def sql_events_user_streaks() -> str:
    return """
WITH d AS (
  SELECT DISTINCT user_id,
         epoch_us(ts) // 86400000000 AS day
  FROM events
),
r AS (
  SELECT user_id, day,
         day - row_number() OVER (PARTITION BY user_id ORDER BY day)
           AS island
  FROM d
),
s AS (SELECT user_id, island, count(*) AS len FROM r GROUP BY 1, 2)
SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
       CAST(max(len) AS BIGINT) AS max_streak
FROM s GROUP BY user_id"""


def supplier_abc(sf_dir: str, n_buckets: int = 64):
    """ABC / Pareto revenue segmentation of suppliers -> (l_suppkey,
    revenue_cents, abc_class): class A = suppliers inside the first 80%
    of total discounted revenue in (revenue DESC, suppkey ASC) order
    (cumulative INCLUDING self, exact ints: cum*5 <= 4*total), B inside
    95% (cum*20 <= 19*total), C the tail.

    Scale shape: supplier revenue folds in one key-bucketed exchange;
    the two quota boundaries come from
    :func:`~robokop_build_ray.functions.quantiles.weighted_prefix_cut`
    (iterative weighted histogram selection — O(log) streams over the
    supplier-grain table, driver state histogram-bounded), then ONE
    broadcast-scalar class-assignment map. No global sort, no
    supplier-scale driver dict (the round-2 verdict's broadcast ban)."""
    from ..functions.bucketing import bucketed_apply
    from ..functions.quantiles import weighted_prefix_cut

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_suppkey", "l_extendedprice",
                                  "l_discount"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        rc = _cents(b["l_extendedprice"].to_numpy()
                    * (1.0 - b["l_discount"].to_numpy()))
        out = pd.DataFrame({"l_suppkey": b["l_suppkey"], "rc": rc})
        return out.groupby("l_suppkey", sort=False, as_index=False).sum()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_suppkey", sort=False, as_index=False)["rc"].sum()
        return pd.DataFrame({
            "l_suppkey": out["l_suppkey"].astype("int64"),
            "revenue_cents": out["rc"].astype("int64")})

    sup = bucketed_apply(li, ["l_suppkey"], merge, partial,
                         n_buckets).materialize()

    total = 0
    for b in sup.map_batches(
            lambda g: pd.DataFrame({"t": [g["revenue_cents"].sum()]}),
            batch_format="pandas").iter_batches(batch_format="pandas",
                                                batch_size=None):
        total += int(b["t"].sum())

    cuts = {}
    for name, (num, den) in (("a", (4, 5)), ("b", (19, 20))):
        cuts[name] = weighted_prefix_cut(
            sup, "revenue_cents", "revenue_cents", "l_suppkey",
            num, den, total)

    cuts_ref = ray.put(cuts)

    def classify(b: pd.DataFrame, _ref=cuts_ref) -> pd.DataFrame:
        c = ray.get(_ref)
        rv = b["revenue_cents"].to_numpy(np.int64)
        sk = b["l_suppkey"].to_numpy(np.int64)

        def inside(cut):
            if cut is None:
                return np.zeros(len(b), dtype=bool)
            v, t = cut
            m = rv > v
            if t is not None:
                m |= (rv == v) & (sk <= t)
            return m

        cls = np.where(inside(c["a"]), "A",
                       np.where(inside(c["b"]), "B", "C"))
        out = b.copy()
        out["abc_class"] = cls
        return out[["l_suppkey", "revenue_cents", "abc_class"]]

    return sup.map_batches(classify, batch_format="pandas")


def sql_supplier_abc() -> str:
    return """
WITH r AS (
  SELECT l_suppkey,
         CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0
                             + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
  FROM lineitem GROUP BY l_suppkey
),
c AS (
  SELECT l_suppkey, revenue_cents,
         sum(revenue_cents)
           OVER (ORDER BY revenue_cents DESC, l_suppkey) AS cum,
         sum(revenue_cents) OVER () AS tot
  FROM r
)
SELECT l_suppkey, revenue_cents,
       CASE WHEN cum * 5 <= tot * 4 THEN 'A'
            WHEN cum * 20 <= tot * 19 THEN 'B'
            ELSE 'C' END AS abc_class
FROM c"""


YOY_YEAR_A = 1995  # SPEC: reconciliation years
YOY_YEAR_B = 1996


def part_year_over_year(sf_dir: str, n_buckets: int = 64):
    """FULL OUTER reconciliation of two derived aggregates: per-part
    shipped quantity in YOY_YEAR_A vs YOY_YEAR_B -> (l_partkey,
    qty_a, qty_b) with zero fills on the absent side — parts shipped in
    only one of the years survive with the other column 0 (the join
    class the attach/semi family can't express).

    Scale shape: each year folds in its own key-bucketed exchange off a
    date-pruned scan; the reconciliation is ONE
    `bucketing.bucketed_outer_unique` exchange over the two part-grain
    aggregates (unique keys by construction)."""
    from ..functions.bucketing import bucketed_apply, bucketed_outer_unique

    def year_qty(year: int, out_col: str):
        li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                             columns=["l_partkey", "l_quantity",
                                      "l_shipdate"])
        lo = np.datetime64(f"{year}-01-01")
        hi = np.datetime64(f"{year + 1}-01-01")

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            d = b["l_shipdate"].to_numpy()
            m = (d >= lo) & (d < hi)
            out = pd.DataFrame({
                "l_partkey": b["l_partkey"].to_numpy(np.int64)[m],
                out_col: b["l_quantity"].to_numpy(np.int64)[m]})
            return out.groupby("l_partkey", sort=False,
                               as_index=False).sum()

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("l_partkey", sort=False,
                            as_index=False)[out_col].sum()
            return out.astype({"l_partkey": "int64", out_col: "int64"})

        return bucketed_apply(li, ["l_partkey"], merge, partial, n_buckets)

    return bucketed_outer_unique(
        year_qty(YOY_YEAR_A, "qty_a"), year_qty(YOY_YEAR_B, "qty_b"),
        on="l_partkey", left_vals=["qty_a"], right_vals=["qty_b"],
        fills={"qty_a": np.int64(0), "qty_b": np.int64(0)},
        n_buckets=n_buckets)


def sql_part_year_over_year() -> str:
    return f"""
WITH a AS (
  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_a
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{YOY_YEAR_A}-01-01'
    AND l_shipdate <  TIMESTAMP '{YOY_YEAR_A + 1}-01-01'
  GROUP BY l_partkey
),
b AS (
  SELECT l_partkey, CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_b
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{YOY_YEAR_B}-01-01'
    AND l_shipdate <  TIMESTAMP '{YOY_YEAR_B + 1}-01-01'
  GROUP BY l_partkey
)
SELECT CAST(coalesce(a.l_partkey, b.l_partkey) AS BIGINT) AS l_partkey,
       CAST(coalesce(a.qty_a, 0) AS BIGINT) AS qty_a,
       CAST(coalesce(b.qty_b, 0) AS BIGINT) AS qty_b
FROM a FULL OUTER JOIN b ON b.l_partkey = a.l_partkey"""


def events_user_rfm(sf_dir: str, n_buckets: int = 64):
    """RFM segmentation (direct-marketing classic): per user the exact
    recency / frequency / monetary stats plus a binary class per axis —
    class 1 = inside the top half of users in (stat DESC, user_id ASC)
    order, exact-int rule ``2 * rank <= n_users`` (no ntile float, no
    odd-n ambiguity) -> (user_id, last_ts_us, n_events, cents, r_class,
    f_class, m_class).

    Scale shape: one user-bucketed stats exchange; each axis boundary is
    a `quantiles.weighted_prefix_cut` with UNIT weights (a pure rank
    cut — same O(log) histogram streams, no user-scale broadcast), then
    one broadcast-scalar classification map."""
    from ..functions.bucketing import bucketed_apply
    from ..functions.quantiles import weighted_prefix_cut

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "user_id": b["user_id"].to_numpy(np.int64),
            "t": b["ts"].to_numpy("datetime64[us]").view(np.int64),
            "cents": _cents(b["value"].to_numpy()),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("user_id", sort=False).agg(
            last_ts_us=("t", "max"), n_events=("t", "size"),
            cents=("cents", "sum")).reset_index()
        out["one"] = np.int64(1)
        return out.astype({c: "int64" for c in out.columns})

    stats = bucketed_apply(ev.map_batches(prep, batch_format="pandas"),
                           ["user_id"], merge, None,
                           n_buckets).materialize()

    n_users = 0
    for b in stats.map_batches(
            lambda g: pd.DataFrame({"n": [len(g)]}),
            batch_format="pandas").iter_batches(batch_format="pandas",
                                                batch_size=None):
        n_users += int(b["n"].sum())

    cuts = {
        axis: weighted_prefix_cut(stats, col, "one", "user_id",
                                  1, 2, n_users)
        for axis, col in (("r", "last_ts_us"), ("f", "n_events"),
                          ("m", "cents"))
    }
    cuts_ref = ray.put(cuts)

    def classify(b: pd.DataFrame, _ref=cuts_ref) -> pd.DataFrame:
        c = ray.get(_ref)
        uid = b["user_id"].to_numpy(np.int64)

        def cls(col, cut):
            v = b[col].to_numpy(np.int64)
            if cut is None:
                return np.full(len(b), 2, dtype=np.int64)
            cv, ct = cut
            m = v > cv
            if ct is not None:
                m |= (v == cv) & (uid <= ct)
            return np.where(m, 1, 2).astype(np.int64)

        out = b[["user_id", "last_ts_us", "n_events", "cents"]].copy()
        out["r_class"] = cls("last_ts_us", c["r"])
        out["f_class"] = cls("n_events", c["f"])
        out["m_class"] = cls("cents", c["m"])
        return out

    return stats.map_batches(classify, batch_format="pandas")


def sql_events_user_rfm() -> str:
    return """
WITH s AS (
  SELECT user_id,
         CAST(max(epoch_us(ts)) AS BIGINT) AS last_ts_us,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
              AS BIGINT) AS cents
  FROM events GROUP BY user_id
)
SELECT user_id, last_ts_us, n_events, cents,
  CASE WHEN 2 * row_number() OVER (ORDER BY last_ts_us DESC, user_id)
            <= (SELECT count(*) FROM s) THEN 1 ELSE 2 END AS r_class,
  CASE WHEN 2 * row_number() OVER (ORDER BY n_events DESC, user_id)
            <= (SELECT count(*) FROM s) THEN 1 ELSE 2 END AS f_class,
  CASE WHEN 2 * row_number() OVER (ORDER BY cents DESC, user_id)
            <= (SELECT count(*) FROM s) THEN 1 ELSE 2 END AS m_class
FROM s"""


def orders_open_per_month(sf_dir: str, n_buckets: int = 64):
    """Interval sweep-line counting: per calendar month, how many orders
    are OPEN — month between o_orderdate's month and the order's LAST
    lineitem ship month -> (ym, n_open), ym = year*100+month, months
    with zero open orders omitted.

    The algorithmic shape is delta encoding + prefix sum over the
    BOUNDED time domain (the classic interval-overlap trick): each order
    contributes +1 at its start month and -1 after its end month, the
    per-batch deltas fold into a month-domain-bounded table (~10^2 keys
    regardless of fact scale), and one driver prefix turns deltas into
    open counts. Exchanges: one per-order max fold + one key-bucketed
    date attach — never an order x month blowup."""
    from ..functions.bucketing import bucketed_apply, bucketed_attach

    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet",
                         columns=["l_orderkey", "l_shipdate"])

    def li_prep(b: pd.DataFrame) -> pd.DataFrame:
        mm = (b["l_shipdate"].to_numpy("datetime64[M]")
              .view(np.int64) + 1970 * 12)
        out = pd.DataFrame({"l_orderkey": b["l_orderkey"].to_numpy(np.int64),
                            "em": mm})
        return out.groupby("l_orderkey", sort=False, as_index=False).max()

    def li_merge(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("l_orderkey", sort=False, as_index=False)["em"].max()
        return out.astype({"l_orderkey": "int64", "em": "int64"})

    last_ship = bucketed_apply(li, ["l_orderkey"], li_merge, li_prep,
                               n_buckets)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_orderkey", "o_orderdate"])

    def o_prep(b: pd.DataFrame) -> pd.DataFrame:
        mm = (b["o_orderdate"].to_numpy("datetime64[M]")
              .view(np.int64) + 1970 * 12)
        return pd.DataFrame({"o_orderkey": b["o_orderkey"].to_numpy(np.int64),
                             "sm": mm})

    spans = bucketed_attach(
        last_ship, orders.map_batches(o_prep, batch_format="pandas"),
        left_on="l_orderkey", right_on="o_orderkey",
        left_cols=["l_orderkey", "em"], payload={"sm": "sm"},
        payload_fill=np.int64(-1), n_buckets=n_buckets,
        empty_dtypes={"l_orderkey": "int64", "em": "int64", "sm": "int64"})

    def deltas(b: pd.DataFrame) -> pd.DataFrame:
        sm = b["sm"].to_numpy(np.int64)
        # clamp: the synthetic data does not enforce ship >= order, so an
        # order is open at least its own order month (oracle mirrors via
        # greatest(sm, em))
        em = np.maximum(sm, b["em"].to_numpy(np.int64))
        m = np.concatenate([sm, em + 1])
        d = np.concatenate([np.ones(len(sm), dtype=np.int64),
                            -np.ones(len(em), dtype=np.int64)])
        out = pd.DataFrame({"m": m, "d": d})
        return out.groupby("m", sort=False, as_index=False).sum()

    agg: dict[int, int] = {}
    for b in spans.map_batches(deltas, batch_format="pandas").iter_batches(
            batch_format="pandas", batch_size=None):
        for m, d in zip(b["m"], b["d"]):
            agg[int(m)] = agg.get(int(m), 0) + int(d)
    # month-domain-bounded driver prefix (the time axis, never fact-scale)
    ms = sorted(agg)
    ym_out, n_out, run = [], [], 0
    for i, m in enumerate(ms):
        run += agg[m]
        nxt = ms[i + 1] if i + 1 < len(ms) else m + 1
        for mm in range(m, nxt):
            if run > 0:
                ym_out.append((mm // 12) * 100 + mm % 12 + 1)
                n_out.append(run)
    return rd.from_arrow(pa.table({
        "ym": pa.array(ym_out, pa.int64()),
        "n_open": pa.array(n_out, pa.int64())}))


def sql_orders_open_per_month() -> str:
    return """
WITH spans AS (
  SELECT o.o_orderkey,
         year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1 AS sm,
         max(year(l.l_shipdate) * 12 + month(l.l_shipdate) - 1) AS em
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
months AS (
  SELECT unnest(range((SELECT min(sm) FROM spans),
                      (SELECT max(em) FROM spans) + 1)) AS m
)
SELECT CAST((m // 12) * 100 + (m % 12) + 1 AS BIGINT) AS ym,
       CAST(count(*) AS BIGINT) AS n_open
FROM months JOIN spans ON m BETWEEN sm AND greatest(sm, em)
GROUP BY m"""


def events_benford(sf_dir: str):
    """Benford first-digit profile (fraud-analytics classic): per leading
    digit 1-9 of the integer-cents event value, the count and its share
    of all positive-cents events (ONE exact-int division). Pure
    enum-bounded partials: a vectorized digit extraction per batch, a
    9-key fold — zero wide shuffles."""
    ev = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = _cents(b["value"].to_numpy())
        c = c[c > 0]
        if len(c) == 0:
            return pd.DataFrame({"digit": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        # exact integer digit count (no float log): c has k digits iff
        # 10^(k-1) <= c < 10^k
        p10 = 10 ** np.arange(1, 19, dtype=np.int64)
        ndig = np.searchsorted(p10, c, side="right")  # digits - 1
        d = c // 10 ** ndig
        vc = pd.Series(d).value_counts()
        return pd.DataFrame({"digit": vc.index.to_numpy(np.int64),
                             "n": vc.to_numpy(np.int64)})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        out = b.groupby("digit", sort=True, as_index=False)["n"].sum()
        tot = int(out["n"].sum())
        out["share"] = out["n"].to_numpy(np.float64) / tot  # ONE division
        return out.astype({"digit": "int64", "n": "int64"})

    return (ev.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def sql_events_benford() -> str:
    return """
WITH c AS (
  SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents FROM events
),
d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM c WHERE cents > 0
)
SELECT digit, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM d) AS share
FROM d GROUP BY digit"""


# ------------------------------------------- per-user OLS trend (regr_slope)

def events_user_trend(sf_dir: str, n_buckets: int = 64):
    """Per-user least-squares trend of spend over time -> (user_id, n,
    slope, intercept): OLS fit of value (cents) against the event's DAY
    INDEX (epoch days — bounds x² so the moment sums stay exact int64 at
    fact scale; epoch-second x would overflow the partials).

    regr_slope / regr_intercept shape without a window function or a
    per-user Python pass over facts: per-batch user-keyed moment partials
    (n, Σx, Σy, Σxy, Σx²) accumulate as EXACT int64 inside the scan, ONE
    bucketed exchange on the user hash merges them by integer addition
    (order-free — bit-identical at any parallelism), and the finish
    converts each user's arbitrary-precision moments (Python int ==
    the oracle's HUGEINT) to float in the oracle's exact operation
    order: slope = ONE division of two exact products, intercept =
    (Σy - slope·Σx)/n in fixed IEEE order. Users whose events all fall
    on one day (zero x variance) are excluded in both engines."""
    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        x = (b["ts"].astype("datetime64[ns]").astype("int64")
             // 86_400_000_000_000)  # epoch-day index
        y = _cents(b["value"].to_numpy())
        df = pd.DataFrame({
            "user_id": b["user_id"],
            "n": np.ones(len(b), dtype=np.int64),
            "sx": x, "sy": y, "sxy": x * y, "sxx": x * x,
        })
        return df.groupby("user_id", as_index=False).sum()

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby("user_id", as_index=False).sum()
        uid, ns, slopes, icepts = [], [], [], []
        # user-bounded rows per bucket, so the exact-int loop is free
        for u, n, sx, sy, sxy, sxx in zip(m["user_id"], m["n"], m["sx"],
                                          m["sy"], m["sxy"], m["sxx"]):
            n, sx, sy = int(n), int(sx), int(sy)
            den = n * int(sxx) - sx * sx
            if den <= 0:
                continue
            num = n * int(sxy) - sx * sy
            slope = float(num) / float(den)
            icept = (float(sy) - slope * float(sx)) / float(n)
            uid.append(u)
            ns.append(n)
            slopes.append(slope)
            icepts.append(icept)
        return pd.DataFrame({
            "user_id": np.array(uid, dtype=np.int64),
            "n": np.array(ns, dtype=np.int64),
            "slope": np.array(slopes, dtype=np.float64),
            "intercept": np.array(icepts, dtype=np.float64),
        })

    return bucketed_apply(ds, ["user_id"], merge, partial, n_buckets)


def sql_events_user_trend() -> str:
    return """
WITH m AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(epoch_us(ts) // 86400000000) AS BIGINT) AS sx,
         CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sy,
         CAST(sum((epoch_us(ts) // 86400000000)
                  * CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS sxy,
         CAST(sum((epoch_us(ts) // 86400000000)
                  * (epoch_us(ts) // 86400000000)) AS BIGINT) AS sxx
  FROM events GROUP BY user_id
),
s AS (
  SELECT user_id, n, sx, sy,
         CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
           / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
                  AS DOUBLE) AS slope
  FROM m
  WHERE CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
)
SELECT user_id, n, slope,
       (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)
         AS intercept
FROM s"""


# --------------------------------------- per-user Simpson type diversity

def events_type_diversity(sf_dir: str, n_buckets: int = 64):
    """Per-user Simpson diversity of event types -> (user_id, n, n_types,
    simpson): 1 - Σ(c_t/n)² computed as (n² - Σc_t²)/n² — ONE float
    division of two exact integers (the repo's lift-not-PMI doctrine:
    entropy's runtime log never reaches an oracle-compared float; Simpson
    carries the same concentration signal in exact arithmetic).

    Per-batch (user, type) count partials bound a hot user's map output
    to types × batches rows; ONE bucketed exchange on the user hash
    co-locates each user's counts; the n / Σc² / distinct-type fold is
    vectorized per bucket (int64 exact — n² overflows only past 3e9
    events per user, far beyond any per-key bound this engine assumes)."""
    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(["user_id", "event_type"], sort=False).size()
                .rename("c").reset_index())

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby(["user_id", "event_type"], sort=False,
                      as_index=False)["c"].sum()
        cc = c["c"].to_numpy(np.int64)
        a = (pd.DataFrame({"user_id": c["user_id"], "n": cc,
                           "ssq": cc * cc,
                           "n_types": np.ones(len(c), dtype=np.int64)})
             .groupby("user_id", as_index=False).sum())
        n = a["n"].to_numpy(np.int64)
        ssq = a["ssq"].to_numpy(np.int64)
        return pd.DataFrame({
            "user_id": a["user_id"].astype("int64"),
            "n": n,
            "n_types": a["n_types"].astype("int64"),
            "simpson": (n * n - ssq).astype(np.float64)
            / (n * n).astype(np.float64),
        })

    return bucketed_apply(ds, ["user_id"], merge, partial, n_buckets)


def sql_events_type_diversity() -> str:
    return """
WITH c AS (
  SELECT user_id, event_type, count(*) AS c
  FROM events GROUP BY user_id, event_type
),
a AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ssq,
         count(*) AS n_types
  FROM c GROUP BY user_id
)
SELECT user_id, n, CAST(n_types AS BIGINT) AS n_types,
       CAST(CAST(n AS HUGEINT) * n - ssq AS DOUBLE)
         / CAST(CAST(n AS HUGEINT) * n AS DOUBLE) AS simpson
FROM a"""


def events_user_cusum(sf_dir: str, n_buckets: int = 64):
    """Per-user CUSUM changepoint detection (Page 1954 grain) over the
    time-ordered spend series: for user events ordered by (ts, event_id)
    with prefix sums P_k of cents and total T over n events, the scaled
    deviation d_k = n*P_k - k*T is EXACT int64 (the mean-free CUSUM times
    n — the same no-division trick as events_user_trend's moments); the
    changepoint is argmax |d_k| over k in 1..n-1, ties -> smallest k.
    Returns (user_id, n, cusum_max, cp_index, cp_event_id) for users with
    >= 2 events.

    ONE user-bucketed exchange; the per-bucket merge sorts once and
    computes every user's prefix series with whole-bucket numpy
    (offset-subtracted cumsum, lexsort argmax) — no per-user Python."""
    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "t": t["ts"].cast(pa.int64()),
            "y": pa.array(_cents(t["value"].to_numpy(zero_copy_only=False)),
                          pa.int64()),
        })

    _empty = {
        "user_id": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
        "cusum_max": pd.Series([], dtype="int64"),
        "cp_index": pd.Series([], dtype="int64"),
        "cp_event_id": pd.Series([], dtype="int64"),
    }

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(_empty)
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        e = g["event_id"].to_numpy(np.int64)
        first = np.r_[True, u[1:] != u[:-1]]
        gid = np.cumsum(first) - 1
        start = np.flatnonzero(first)
        counts = np.diff(np.r_[start, len(u)])
        cs = np.cumsum(y)
        offset = np.r_[np.int64(0), cs[start[1:] - 1]]
        p = cs - offset[gid]
        k = np.arange(len(u), dtype=np.int64) - start[gid] + 1
        n_row = counts[gid]
        tot_row = p[start + counts - 1][gid]
        ad = np.abs(n_row * p - k * tot_row)
        mask = k < n_row  # drop the final (always-zero) point; n==1 users
        if not mask.any():
            return pd.DataFrame(_empty)
        um, km, adm, em, nm = u[mask], k[mask], ad[mask], e[mask], n_row[mask]
        order = np.lexsort((km, -adm, um))
        um, km, adm, em, nm = (um[order], km[order], adm[order],
                               em[order], nm[order])
        keep = np.r_[True, um[1:] != um[:-1]]
        return pd.DataFrame({
            "user_id": um[keep], "n": nm[keep], "cusum_max": adm[keep],
            "cp_index": km[keep], "cp_event_id": em[keep],
        })

    return bucketed_apply(ds.map_batches(prep, batch_format="pyarrow"),
                          ["user_id"], merge, None, n_buckets)


def sql_events_user_cusum() -> str:
    return """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y FROM events),
w AS (
  SELECT user_id, event_id,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY t, event_id) AS k,
         sum(y) OVER (PARTITION BY user_id ORDER BY t, event_id
                      ROWS UNBOUNDED PRECEDING) AS p,
         count(*) OVER (PARTITION BY user_id) AS n,
         sum(y) OVER (PARTITION BY user_id) AS tot
  FROM e),
d AS (
  SELECT user_id, event_id, k, n, abs(n * p - k * tot) AS ad
  FROM w WHERE k < n),
r AS (
  SELECT user_id, n, k, event_id, ad,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ad DESC, k) AS rn
  FROM d)
SELECT user_id, CAST(n AS BIGINT) AS n, CAST(ad AS BIGINT) AS cusum_max,
       CAST(k AS BIGINT) AS cp_index,
       CAST(event_id AS BIGINT) AS cp_event_id
FROM r WHERE rn = 1"""


def events_user_autocorr(sf_dir: str, n_buckets: int = 64):
    """Per-user lag-1 autocorrelation of the time-ordered spend series
    -> (user_id, n_pairs, acf1): Pearson correlation of consecutive
    (value_t, value_{t+1}) cent pairs ordered by (ts, event_id) — the
    burstiness/momentum diagnostic of a usage stream.

    ONE user-bucketed exchange (the ordered-pair sibling of
    events_user_gaps): the per-bucket merge sorts once, builds every
    user's lag pairs with one boundary-masked shift, accumulates the five
    moment sums as EXACT int64, and finishes with
    lineitem_qty_price_corr's arbitrary-precision-int -> one-double
    conversion in the oracle's operation order. Users with zero variance
    on either side (constant runs) are excluded in both engines."""
    import math

    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "value"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "t": t["ts"].cast(pa.int64()),
            "y": pa.array(_cents(t["value"].to_numpy(zero_copy_only=False)),
                          pa.int64()),
        })

    _empty = {
        "user_id": pd.Series([], dtype="int64"),
        "n_pairs": pd.Series([], dtype="int64"),
        "acf1": pd.Series([], dtype="float64"),
    }

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) < 2:
            return pd.DataFrame(_empty)
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        y = g["y"].to_numpy(np.int64)
        same = u[1:] == u[:-1]
        if not same.any():
            return pd.DataFrame(_empty)
        x, y2, uu = y[:-1][same], y[1:][same], u[1:][same]
        df = pd.DataFrame({
            "user_id": uu, "n": np.ones(len(uu), dtype=np.int64),
            "sx": x, "sy": y2, "sxy": x * y2, "sxx": x * x, "syy": y2 * y2,
        })
        m = df.groupby("user_id", as_index=False).sum()
        uid, ns, corrs = [], [], []
        # user-bounded rows per bucket, so the exact-int loop is free
        for r in m.itertuples(index=False):
            n, sx, sy = int(r.n), int(r.sx), int(r.sy)
            sxy, sxx, syy = int(r.sxy), int(r.sxx), int(r.syy)
            dxx, dyy = n * sxx - sx * sx, n * syy - sy * sy
            if dxx <= 0 or dyy <= 0:
                continue
            num = n * sxy - sx * sy
            uid.append(r.user_id)
            ns.append(n)
            corrs.append(float(num)
                         / (math.sqrt(float(dxx)) * math.sqrt(float(dyy))))
        return pd.DataFrame({
            "user_id": np.array(uid, dtype=np.int64),
            "n_pairs": np.array(ns, dtype=np.int64),
            "acf1": np.array(corrs, dtype=np.float64),
        })

    return bucketed_apply(ds.map_batches(prep, batch_format="pyarrow"),
                          ["user_id"], merge, None, n_buckets)


def sql_events_user_autocorr() -> str:
    return """
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS t,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y FROM events),
l AS (
  SELECT user_id, y AS x,
         lead(y) OVER (PARTITION BY user_id ORDER BY t, event_id) AS y2
  FROM e),
m AS (
  SELECT user_id, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y2) AS BIGINT) AS sy,
         CAST(sum(x * y2) AS BIGINT) AS sxy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y2 * y2) AS BIGINT) AS syy
  FROM l WHERE y2 IS NOT NULL GROUP BY user_id)
SELECT user_id, CAST(n AS BIGINT) AS n_pairs,
       CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
         / (sqrt(CAST(CAST(n AS HUGEINT) * sxx
                      - CAST(sx AS HUGEINT) * sx AS DOUBLE))
            * sqrt(CAST(CAST(n AS HUGEINT) * syy
                        - CAST(sy AS HUGEINT) * sy AS DOUBLE))) AS acf1
FROM m
WHERE CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
  AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0"""


# SCD2 open-interval sentinel: epoch_us of 9999-12-31 00:00:00 UTC (the
# classic warehouse high-date; both engines emit the same constant)
_SCD2_OPEN_US = 253_402_214_400_000_000


def events_user_scd2(sf_dir: str, n_buckets: int = 64):
    """Slowly-changing-dimension TYPE 2 history build from the event
    stream: consecutive runs of the same event_type per user (ordered by
    ts, event_id) collapse into versioned validity intervals ->
    (user_id, version, event_type, valid_from_us, valid_to_us, n_events),
    valid_to = the next run's start, open runs closed with the 9999-12-31
    high-date sentinel — the dimension-table maintenance step every
    warehouse load performs on a mutable attribute feed.

    ONE user-bucketed exchange; the per-bucket merge is whole-bucket
    numpy gaps-and-islands (boundary-masked change flags -> cumsum run
    ids -> one groupby), no per-user Python."""
    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "event_type": t["event_type"],
            "t": t["ts"].cast(pa.int64()),
        })

    _empty = {
        "user_id": pd.Series([], dtype="int64"),
        "version": pd.Series([], dtype="int64"),
        "event_type": pd.Series([], dtype=object),
        "valid_from_us": pd.Series([], dtype="int64"),
        "valid_to_us": pd.Series([], dtype="int64"),
        "n_events": pd.Series([], dtype="int64"),
    }

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(_empty)
        g = g.sort_values(["user_id", "t", "event_id"], kind="mergesort")
        u = g["user_id"].to_numpy(np.int64)
        t = g["t"].to_numpy(np.int64)
        ty = g["event_type"].to_numpy(dtype=object)
        new_user = np.r_[True, u[1:] != u[:-1]]
        change = new_user | np.r_[False, ty[1:] != ty[:-1]]
        run_start = np.flatnonzero(change)
        run_len = np.diff(np.r_[run_start, len(u)])
        ru = u[run_start]
        r_from = t[run_start]
        # version = run rank within user
        user_first = new_user[run_start]  # first run of each user
        ver = np.arange(len(run_start), dtype=np.int64)
        ver -= np.maximum.accumulate(np.where(user_first, ver, 0))
        ver += 1
        # valid_to = next run's start within the same user, else sentinel
        nxt_same = np.r_[ru[1:] == ru[:-1], False]
        r_to = np.where(nxt_same, np.r_[r_from[1:], 0],
                        np.int64(_SCD2_OPEN_US))
        return pd.DataFrame({
            "user_id": ru, "version": ver,
            "event_type": pd.Series(ty[run_start], dtype=object),
            "valid_from_us": r_from, "valid_to_us": r_to,
            "n_events": run_len.astype(np.int64),
        })

    return bucketed_apply(ds.map_batches(prep, batch_format="pyarrow"),
                          ["user_id"], merge, None, n_buckets)


def sql_events_user_scd2() -> str:
    return f"""
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_us(ts) AS t FROM events),
o AS (
  SELECT user_id, event_id, event_type, t,
         CASE WHEN lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY t, event_id)
                   IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
  FROM e),
r AS (
  SELECT user_id, event_type, t,
         sum(chg) OVER (PARTITION BY user_id ORDER BY t, event_id
                        ROWS UNBOUNDED PRECEDING) AS run_id
  FROM o),
runs AS (
  SELECT user_id, run_id, min(event_type) AS event_type,
         min(t) AS valid_from_us, count(*) AS n_events
  FROM r GROUP BY user_id, run_id)
SELECT user_id,
       CAST(row_number() OVER (PARTITION BY user_id ORDER BY run_id)
            AS BIGINT) AS version,
       event_type,
       CAST(valid_from_us AS BIGINT) AS valid_from_us,
       CAST(coalesce(lead(valid_from_us) OVER (PARTITION BY user_id
                                               ORDER BY run_id),
                     {_SCD2_OPEN_US}) AS BIGINT) AS valid_to_us,
       CAST(n_events AS BIGINT) AS n_events
FROM runs"""


BAND_DELTA_CENTS = 500  # band half-width: $5 in exact cents


def events_value_band_pairs(sf_dir: str, delta: int = BAND_DELTA_CENTS,
                            n_buckets: int = 64):
    """Distributed BAND JOIN (value range self-join): per event type, the
    EXACT count of unordered event pairs whose spend differs by at most
    ``delta`` cents -> (event_type, n_pairs). The |a.c - b.c| <= delta
    theta-join Ray Data has no operator for, expressed with the classic
    band-blocking decomposition: bucket values by floor(c / delta) (bucket
    width == band width, so every qualifying pair lives in the SAME or
    ADJACENT buckets), replicate each row into its successor bucket, and
    count inside each (type, bucket) group — within-bucket pairs by sorted
    searchsorted prefix counts, cross-bucket pairs by replica-vs-home
    range counts. No pair is materialized, no pair is counted twice
    (cross pairs straddle distinct buckets; within pairs use positional
    i < j), and the exchange is ONE bucketed shuffle of 2x the input
    rows."""
    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        ty = t["event_type"].combine_chunks().cast(pa.string())
        c = _cents(t["value"].to_numpy(zero_copy_only=False))
        b = c // delta
        return pa.table({
            "event_type": pa.concat_arrays([ty, ty]),
            "bkt": pa.array(np.r_[b, b + 1], pa.int64()),
            "c": pa.array(np.r_[c, c], pa.int64()),
            "home": pa.array(np.r_[np.ones(len(c), bool),
                                   np.zeros(len(c), bool)]),
        })

    _empty = {"event_type": pd.Series([], dtype=object),
              "n_pairs": pd.Series([], dtype="int64")}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(_empty)
        tys, ns = [], []
        # (type x value-range/delta)-bounded groups; numpy inside each
        for (ty, _b), sub in g.groupby(["event_type", "bkt"], sort=False):
            home = np.sort(sub.loc[sub["home"], "c"].to_numpy(np.int64))
            n = 0
            if len(home) > 1:
                idx = np.searchsorted(home, home + delta, side="right")
                n += int((idx - np.arange(1, len(home) + 1)).sum())
            lo = sub.loc[~sub["home"], "c"].to_numpy(np.int64)
            if len(lo) and len(home):
                n += int(np.searchsorted(home, lo + delta,
                                         side="right").sum())
            if n:
                tys.append(ty)
                ns.append(n)
        return pd.DataFrame({"event_type": pd.Series(tys, dtype=object),
                             "n_pairs": pd.Series(ns, dtype="int64")})

    parts = bucketed_apply(ds.map_batches(prep, batch_format="pyarrow"),
                           ["event_type", "bkt"], merge, None, n_buckets)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame(_empty)
        out = b.groupby("event_type", as_index=False)["n_pairs"].sum()
        out["n_pairs"] = out["n_pairs"].astype("int64")
        return out

    # enum-bounded final fold (one row per event type)
    return (parts.repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def sql_events_value_band_pairs(delta: int = BAND_DELTA_CENTS) -> str:
    return f"""
WITH e AS (
  SELECT event_type, event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events)
SELECT a.event_type, CAST(count(*) AS BIGINT) AS n_pairs
FROM e a JOIN e b
  ON b.event_type = a.event_type AND b.event_id > a.event_id
  AND abs(a.c - b.c) <= {delta}
GROUP BY a.event_type"""


RECORDS_RANGES = 256


def events_records(sf_dir: str, n_ranges: int = RECORDS_RANGES):
    """Running-record detection over ARRIVAL order — the distributed
    PREFIX-SCAN primitive: an event is a record iff its spend strictly
    exceeds every earlier (by event_id) event's spend. Returns
    (event_id, cents, prev_max_cents), the first event included with
    prev_max_cents = -1.

    A global ordered cummax cannot be one bucketed exchange (every row
    depends on ALL earlier rows), so this is the classic two-pass scan:
    (1) partition the id domain into ``n_ranges`` contiguous ranges and
    fold each range's max through a coalesced partial pass (driver state
    = n_ranges ints); (2) exclusive-prefix-max those on the driver and
    broadcast, then ONE range-bucketed exchange re-runs the cummax inside
    each range with its carry-in. At 10^12 rows the scan nests
    (log_R levels of the same fold); everything else is unchanged."""
    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "value"])
    max_id = int(ds.max("event_id"))
    span = max_id // n_ranges + 1

    def prep(t: pa.Table) -> pa.Table:
        c = _cents(t["value"].to_numpy(zero_copy_only=False))
        e = t["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"rng": pa.array(e // span, pa.int64()),
                         "event_id": pa.array(e, pa.int64()),
                         "cents": pa.array(c, pa.int64())})

    # consumed twice — recompute from the pruned 2-column read both times
    # rather than pinning a corpus-scale (rng, id, cents) table
    scan = ds.map_batches(prep, batch_format="pyarrow")

    def rmax_partial(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("rng", as_index=False)["cents"].max()

    def rmax_merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("rng", as_index=False)["cents"].max()

    parts = (scan.map_batches(rmax_partial, batch_format="pandas")
             .repartition(8)
             .map_batches(rmax_merge, batch_format="pandas",
                          batch_size=None))
    rmax: dict[int, int] = {}
    for b in parts.iter_batches(batch_format="pandas", batch_size=None):
        for r, m in zip(b["rng"], b["cents"]):
            rmax[int(r)] = max(rmax.get(int(r), -1), int(m))
    # exclusive prefix max over the range-bounded driver array
    pre: dict[int, int] = {}
    run = -1
    for r in sorted(rmax):
        pre[r] = run
        run = max(run, rmax[r])
    pre_ref = ray.put(pre)

    _empty = {"event_id": pd.Series([], dtype="int64"),
              "cents": pd.Series([], dtype="int64"),
              "prev_max_cents": pd.Series([], dtype="int64")}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame(_empty)
        carry = ray.get(pre_ref)
        outs = []
        for r, sub in g.groupby("rng", sort=False):  # n_ranges-bounded
            sub = sub.sort_values("event_id", kind="mergesort")
            c = sub["cents"].to_numpy(np.int64)
            mx = np.maximum.accumulate(c)
            cin = np.int64(carry.get(int(r), -1))
            prev = np.maximum(np.r_[cin, mx[:-1]], cin)
            rec = c > prev
            if rec.any():
                outs.append(pd.DataFrame({
                    "event_id": sub["event_id"].to_numpy(np.int64)[rec],
                    "cents": c[rec],
                    "prev_max_cents": prev[rec],
                }))
        if not outs:
            return pd.DataFrame(_empty)
        return pd.concat(outs, ignore_index=True)

    return bucketed_apply(scan, ["rng"], merge, None,
                          n_buckets=min(n_ranges, 64))


def sql_events_records() -> str:
    return """
WITH e AS (
  SELECT event_id,
         CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c FROM events),
w AS (
  SELECT event_id, c,
         max(c) OVER (ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS mx
  FROM e)
SELECT event_id, c AS cents,
       CAST(coalesce(mx, -1) AS BIGINT) AS prev_max_cents
FROM w WHERE mx IS NULL OR c > mx"""


# snapshot-diff mutation constants are SPEC (shared by query and oracle):
# %97 rows change status, %101 rows are deleted, %103 rows are re-inserted
# under a shifted key ("added")
DIFF_CHANGE_MOD = 97
DIFF_DELETE_MOD = 101
DIFF_INSERT_MOD = 103
DIFF_KEY_SHIFT = 10_000_000


def orders_snapshot_diff(sf_dir: str, n_buckets: int = 64):
    """Snapshot reconciliation (table diff): compare snapshot A (orders as
    stored) against snapshot B (a deterministic mutation of A) and emit one
    row per divergent key with its change kind ('added' | 'removed' |
    'changed').

    The core incremental-maintenance primitive at 100 TB: both snapshots
    are fact-scale, so neither side can broadcast — each row is tagged with
    its side, both sides meet in ONE key-bucketed exchange, and the
    per-bucket compare is a vectorized outer merge + payload equality on
    integer cents. Unchanged keys (the overwhelming majority in a real
    diff) never leave their bucket. Payload equality here is direct column
    compare; with wide payloads, substitute one row-hash column computed
    map-side so the exchange ships (key, hash) only."""
    from ..functions.bucketing import bucketed_apply

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    base = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)

    def prep_a(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": b["o_orderkey"].to_numpy(np.int64),
            "s": b["o_orderstatus"].astype(object),
            "p": _cents(b["o_totalprice"].to_numpy()),
            "_side": np.int64(0),
        })

    def prep_b(b: pd.DataFrame) -> pd.DataFrame:
        k = b["o_orderkey"].to_numpy(np.int64)
        s = b["o_orderstatus"].to_numpy(object).copy()
        p = _cents(b["o_totalprice"].to_numpy())
        s[k % DIFF_CHANGE_MOD == 0] = "X"
        keep = k % DIFF_DELETE_MOD != 0
        ins = k % DIFF_INSERT_MOD == 0
        return pd.DataFrame({
            "k": np.r_[k[keep], k[ins] + DIFF_KEY_SHIFT],
            # inserted rows carry the ORIGINAL status (pre-mutation)
            "s": np.r_[s[keep],
                       b["o_orderstatus"].to_numpy(object)[ins]],
            "p": np.r_[p[keep], p[ins]],
            "_side": np.int64(1),
        })

    u = base.map_batches(prep_a, batch_format="pandas").union(
        base.map_batches(prep_b, batch_format="pandas"))

    _empty = {"o_orderkey": pd.Series([], dtype="int64"),
              "change": pd.Series([], dtype="object")}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "_side" not in g.columns:
            return pd.DataFrame(_empty)
        a = g.loc[g["_side"] == 0, ["k", "s", "p"]]
        bb = g.loc[g["_side"] == 1, ["k", "s", "p"]]
        m = a.merge(bb, on="k", how="outer", suffixes=("_a", "_b"),
                    indicator=True)
        added = m["_merge"] == "right_only"
        removed = m["_merge"] == "left_only"
        both = m["_merge"] == "both"
        # cents fit float64 exactly, so the post-outer-merge float compare
        # is still exact; NaN != NaN never fires because `both` gates it
        changed = both & ((m["s_a"] != m["s_b"]) | (m["p_a"] != m["p_b"]))
        out = m.loc[added | removed | changed, ["k"]].copy()
        kind = np.where(added[added | removed | changed], "added",
                        np.where(removed[added | removed | changed],
                                 "removed", "changed"))
        if len(out) == 0:
            return pd.DataFrame(_empty)
        return pd.DataFrame({"o_orderkey": out["k"].to_numpy(np.int64),
                             "change": kind.astype(object)})

    return bucketed_apply(u, ["k"], merge, None, n_buckets)


def sql_orders_snapshot_diff() -> str:
    return f"""
WITH a AS (
  SELECT o_orderkey AS k, o_orderstatus AS s,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS p
  FROM orders),
b AS (
  SELECT k, CASE WHEN k % {DIFF_CHANGE_MOD} = 0 THEN 'X' ELSE s END AS s, p
  FROM a WHERE k % {DIFF_DELETE_MOD} <> 0
  UNION ALL
  SELECT k + {DIFF_KEY_SHIFT}, s, p FROM a WHERE k % {DIFF_INSERT_MOD} = 0),
j AS (
  SELECT coalesce(a.k, b.k) AS o_orderkey,
         CASE WHEN a.k IS NULL THEN 'added'
              WHEN b.k IS NULL THEN 'removed'
              WHEN a.s <> b.s OR a.p <> b.p THEN 'changed' END AS change
  FROM a FULL OUTER JOIN b ON a.k = b.k)
SELECT o_orderkey, change FROM j WHERE change IS NOT NULL"""


CHECKSUM_MOD = 2_147_483_647  # per-row reduction so BIGINT sums never wrap


def lineitem_checksum(sf_dir: str, parity: bool | None = None):
    """Order-independent table checksum: one row (n_rows, checksum) where
    checksum = sum over rows of (row_hash % {CHECKSUM_MOD}) % {CHECKSUM_MOD}.

    The cheapest cross-site reconciliation primitive: two clusters (or a
    source and its replica) each stream their copy through embarrassingly
    parallel per-batch partials — NO shuffle, NO sort, commutative merge —
    and compare two integers. Fast path hashes each canonical row string
    with one vectorized siphash call per batch; parity mode (md5, the tier
    oracles check — this query's OUTPUT is hash-valued so it always passes
    parity=True) matches DuckDB's md5_number_lower = lower 8 md5 bytes,
    little-endian."""
    import hashlib

    from ..stages.text_analysis import resolve_parity

    use_md5 = resolve_parity(parity) if parity is None else parity
    cols = ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus",
            "l_quantity"]
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=cols)

    def partial(b: pd.DataFrame) -> pa.Table:
        q = _cents(b["l_quantity"].to_numpy())
        s = (b["l_orderkey"].astype(str) + "|"
             + b["l_linenumber"].astype(str) + "|"
             + b["l_returnflag"].astype(str) + "|"
             + b["l_linestatus"].astype(str) + "|"
             + pd.Series(q, index=b.index).astype(str))
        if use_md5:
            v = np.fromiter(
                (int.from_bytes(hashlib.md5(x.encode()).digest()[8:],
                                "little") % CHECKSUM_MOD for x in s),
                np.int64, len(s))
        else:
            v = (pd.util.hash_array(s.to_numpy(object))
                 % np.uint64(CHECKSUM_MOD)).astype(np.int64)
        return pa.table({"n_rows": pa.array([len(s)], pa.int64()),
                         "checksum": pa.array([int(v.sum()) % CHECKSUM_MOD],
                                              pa.int64())})

    seed = rd.from_arrow(pa.table({"n_rows": pa.array([0], pa.int64()),
                                   "checksum": pa.array([0], pa.int64())}))
    return (ds.map_batches(partial, batch_format="pandas")
            .union(seed)
            .repartition(1)
            .map_batches(
                lambda b: pd.DataFrame({
                    "n_rows": [np.int64(b["n_rows"].sum())],
                    "checksum": [np.int64(b["checksum"].sum()
                                          % CHECKSUM_MOD)]}),
                batch_format="pandas", batch_size=None))


def sql_lineitem_checksum() -> str:
    return f"""
SELECT count(*) AS n_rows,
       CAST(COALESCE(sum(md5_number_lower(
                concat_ws('|', l_orderkey, l_linenumber, l_returnflag,
                          l_linestatus,
                          CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)))
                % {CHECKSUM_MOD}), 0) % {CHECKSUM_MOD} AS BIGINT) AS checksum
FROM lineitem"""


FD_PAIRS = (  # candidate functional dependencies profiled over orders: SPEC
    ("o_orderkey", "o_orderstatus"),    # holds (determinant is the key)
    ("o_custkey", "o_orderpriority"),   # expected to fail
    ("o_orderdate", "o_orderstatus"),   # expected to fail
)


def orders_fd_profile(sf_dir: str, n_buckets: int = 64):
    """Functional-dependency discovery (data profiling): for each candidate
    A -> B, count the distinct determinant values and how many of them
    VIOLATE the dependency (map to >1 distinct B). One row per candidate:
    (determinant, dependent, n_det, n_violating).

    Scale shape: all candidates melt into ONE stream of (pair, a, b)
    triples, map-side deduplicated per batch, then a single
    (pair, a)-bucketed exchange computes per-determinant distinct-B counts
    — every (pair, a) group lands whole in one bucket, so the per-bucket
    partials (n_det, n_violating) sum exactly in a pair-bounded driver
    fold. Adding candidates widens the melt, never adds exchanges."""
    from ..functions.bucketing import bucketed_apply

    cols = sorted({c for pr in FD_PAIRS for c in pr})
    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=cols)

    def prep(b: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for i, (a, dep) in enumerate(FD_PAIRS):
            outs.append(pd.DataFrame({
                "pair": np.int64(i),
                # str casts are injective on int64/timestamp/string, and
                # distinct counts (not the rendered values) are compared
                "a": b[a].astype(str),
                "b": b[dep].astype(str),
            }).drop_duplicates())
        return pd.concat(outs, ignore_index=True)

    _empty = {"pair": pd.Series([], dtype="int64"),
              "n_det": pd.Series([], dtype="int64"),
              "n_violating": pd.Series([], dtype="int64")}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "a" not in g.columns:
            return pd.DataFrame(_empty)
        nb = (g.groupby(["pair", "a"], sort=False)["b"].nunique()
              .reset_index(name="nb"))
        out = nb.groupby("pair", sort=False).agg(
            n_det=("nb", "size"), n_violating=("nb", lambda s: int((s > 1).sum())))
        return out.reset_index().astype(
            {"pair": "int64", "n_det": "int64", "n_violating": "int64"})

    parts = bucketed_apply(ds.map_batches(prep, batch_format="pandas"),
                           ["pair", "a"], merge, None, n_buckets)
    # typed identity seed: an all-empty scan must still emit one zero row
    # per candidate, matching the oracle's outer aggregate. Pandas block
    # (not Arrow) because bucketed_apply emits pandas blocks and the
    # repartition reduce cannot mix block types (q6's pitfall, inverted).
    seed = rd.from_pandas(pd.DataFrame({
        "pair": np.arange(len(FD_PAIRS), dtype=np.int64),
        "n_det": np.zeros(len(FD_PAIRS), dtype=np.int64),
        "n_violating": np.zeros(len(FD_PAIRS), dtype=np.int64)}))

    det = {i: p[0] for i, p in enumerate(FD_PAIRS)}
    dep = {i: p[1] for i, p in enumerate(FD_PAIRS)}

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("pair").sum().reset_index()
        return pd.DataFrame({
            "determinant": s["pair"].map(det).astype(object),
            "dependent": s["pair"].map(dep).astype(object),
            "n_det": s["n_det"].to_numpy(np.int64),
            "n_violating": s["n_violating"].to_numpy(np.int64)})

    return (parts.union(seed).repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def sql_orders_fd_profile() -> str:
    parts = []
    for a, dep in FD_PAIRS:
        parts.append(f"""
SELECT '{a}' AS determinant, '{dep}' AS dependent,
       count(*) AS n_det,
       CAST(coalesce(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_violating
FROM (SELECT {a} AS a, count(DISTINCT {dep}) AS nb
      FROM orders GROUP BY {a})""")
    return "\nUNION ALL\n".join(parts)


ZORDER_BITS = 8   # 8+8-bit Morton cells: 65,536-cell bounded domain (SPEC)
ZORDER_TOPK = 32


def events_zorder_cells(sf_dir: str, k: int = ZORDER_TOPK):
    """Z-order (Morton) locality clustering: map each event to a 16-bit
    Morton cell interleaving (user_id % 256) with (whole currency units
    % 256), count per cell, return the top-``k`` hottest cells with both
    decoded coordinates — the layout primitive behind multi-dimensional
    file clustering (Delta/Iceberg OPTIMIZE ZORDER): rows sharing a cell
    prefix are co-located, so 2-D range predicates prune contiguously.

    Scale shape: the interleave is three vectorized shift-or passes per
    batch, partials are a 65,536-bounded ``bincount`` per batch, the fold
    is one tiny exchange — no row ever shuffles."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "value"])
    n_cells = 1 << (2 * ZORDER_BITS)

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        u = (b["user_id"].to_numpy(np.int64) % 256).astype(np.uint32)
        v = ((_cents(b["value"].to_numpy()) // 100) % 256).astype(np.uint32)
        cell = np.zeros(len(u), dtype=np.int64)
        for i in range(ZORDER_BITS):
            cell |= (((u >> i) & 1) << (2 * i + 1)).astype(np.int64)
            cell |= (((v >> i) & 1) << (2 * i)).astype(np.int64)
        counts = np.bincount(cell, minlength=n_cells)
        nz = np.flatnonzero(counts)
        return pd.DataFrame({"cell": nz.astype(np.int64),
                             "n_events": counts[nz].astype(np.int64)})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        s = (b.groupby("cell", as_index=False)["n_events"].sum()
             .sort_values(["n_events", "cell"], ascending=[False, True],
                          kind="mergesort")
             .head(k))
        cell = s["cell"].to_numpy(np.int64)
        u = np.zeros(len(cell), dtype=np.int64)
        v = np.zeros(len(cell), dtype=np.int64)
        for i in range(ZORDER_BITS):
            u |= ((cell >> (2 * i + 1)) & 1) << i
            v |= ((cell >> (2 * i)) & 1) << i
        return pd.DataFrame({"cell": cell, "u_bucket": u, "v_bucket": v,
                             "n_events": s["n_events"].to_numpy(np.int64)})

    # cell domain is 65,536-bounded, so the fold is one tiny reduce
    return (ds.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def sql_events_zorder_cells(k: int = ZORDER_TOPK) -> str:
    interleave = " + ".join(
        f"((((user_id % 256) >> {i}) & 1) << {2 * i + 1})"
        f" + ((((CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 100) % 256)"
        f" >> {i} & 1) << {2 * i})"
        for i in range(8))
    return f"""
WITH c AS (
  SELECT {interleave} AS cell, count(*) AS n_events
  FROM events GROUP BY 1)
SELECT cell,
       {" + ".join(f"(((cell >> {2 * i + 1}) & 1) << {i})" for i in range(8))}
           AS u_bucket,
       {" + ".join(f"(((cell >> {2 * i}) & 1) << {i})" for i in range(8))}
           AS v_bucket,
       n_events
FROM c
ORDER BY n_events DESC, cell ASC
LIMIT {k}"""


RI_BACKFILL_MOD = 7  # SPEC: rel 0 audits a parent snapshot mid-backfill


def ri_audit(sf_dir: str, n_buckets: int = 64):
    """Referential-integrity audit across three FK relationships — the
    data-quality gate a 100 TB ingest runs before publishing a snapshot.
    Per relationship: child row count, orphan child rows (FK value absent
    from the parent), distinct parent keys, and parent keys never
    referenced. Relationship 0 deliberately audits lineitem against a
    parent snapshot missing every ``o_orderkey % {RI_BACKFILL_MOD} == 0``
    row (a backfill in flight), so the orphan path is exercised for real;
    relationships 1-2 are the natural (clean) FKs.

    Scale shape: all three relationships melt into ONE (rel, key)-bucketed
    exchange of map-side-reduced (key, side, cnt) partials; each bucket
    reconciles its keys vectorized and emits per-rel partial counters, so
    the driver fold is 3-rows-bounded. Adding FKs widens the melt only."""
    from ..functions.bucketing import bucketed_apply

    rels = ("lineitem.l_orderkey->orders[backfill].o_orderkey",
            "orders.o_custkey->customer.c_custkey",
            "events.user_id->customer.c_custkey")

    def child_prep(col, rel):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            g = b.groupby(col, sort=False).size()
            return pd.DataFrame({"rel": np.int64(rel),
                                 "key": g.index.to_numpy(np.int64),
                                 "side": np.int64(0),
                                 "cnt": g.to_numpy(np.int64)})
        return f

    def parent_prep(col, rel, mod=None):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            k = b[col].drop_duplicates().to_numpy(np.int64)
            if mod is not None:
                k = k[k % mod != 0]
            return pd.DataFrame({"rel": np.int64(rel), "key": k,
                                 "side": np.int64(1),
                                 "cnt": np.int64(0)})
        return f

    def rp(table, cols):
        return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=cols)

    streams = [
        rp("lineitem", ["l_orderkey"]).map_batches(
            child_prep("l_orderkey", 0), batch_format="pandas"),
        rp("orders", ["o_orderkey"]).map_batches(
            parent_prep("o_orderkey", 0, RI_BACKFILL_MOD),
            batch_format="pandas"),
        rp("orders", ["o_custkey"]).map_batches(
            child_prep("o_custkey", 1), batch_format="pandas"),
        rp("customer", ["c_custkey"]).map_batches(
            parent_prep("c_custkey", 1), batch_format="pandas"),
        rp("events", ["user_id"]).map_batches(
            child_prep("user_id", 2), batch_format="pandas"),
        rp("customer", ["c_custkey"]).map_batches(
            parent_prep("c_custkey", 2), batch_format="pandas"),
    ]
    u = streams[0]
    for s in streams[1:]:
        u = u.union(s)

    _empty = {"rel": pd.Series([], dtype="int64"),
              "n_child": pd.Series([], dtype="int64"),
              "n_orphans": pd.Series([], dtype="int64"),
              "n_parents": pd.Series([], dtype="int64"),
              "n_unref_parents": pd.Series([], dtype="int64")}

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "side" not in g.columns:
            return pd.DataFrame(_empty)
        piv = (g.groupby(["rel", "key", "side"], sort=False)["cnt"].sum()
               .unstack("side", fill_value=-1).reset_index())
        child = piv[0] if 0 in piv.columns else pd.Series(-1, index=piv.index)
        parent = piv[1] if 1 in piv.columns else pd.Series(-1, index=piv.index)
        has_child, has_parent = child >= 0, parent >= 0
        out = piv.assign(
            n_child=child.clip(lower=0),
            n_orphans=np.where(has_parent, 0, child.clip(lower=0)),
            n_parents=has_parent.astype(np.int64),
            n_unref_parents=(has_parent & ~has_child).astype(np.int64),
        ).groupby("rel", as_index=False)[
            ["n_child", "n_orphans", "n_parents", "n_unref_parents"]].sum()
        return out.astype("int64")

    parts = bucketed_apply(u, ["rel", "key"], merge, None, n_buckets)
    seed = rd.from_pandas(pd.DataFrame({
        "rel": np.arange(len(rels), dtype=np.int64),
        "n_child": np.zeros(len(rels), dtype=np.int64),
        "n_orphans": np.zeros(len(rels), dtype=np.int64),
        "n_parents": np.zeros(len(rels), dtype=np.int64),
        "n_unref_parents": np.zeros(len(rels), dtype=np.int64)}))

    names = dict(enumerate(rels))

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        s = b.groupby("rel", as_index=False).sum()
        return pd.DataFrame({
            "relationship": s["rel"].map(names).astype(object),
            "n_child": s["n_child"].to_numpy(np.int64),
            "n_orphans": s["n_orphans"].to_numpy(np.int64),
            "n_parents": s["n_parents"].to_numpy(np.int64),
            "n_unref_parents": s["n_unref_parents"].to_numpy(np.int64)})

    return (parts.union(seed).repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def sql_ri_audit() -> str:
    m = RI_BACKFILL_MOD
    rels = [
        ("lineitem.l_orderkey->orders[backfill].o_orderkey",
         "SELECT l_orderkey AS k FROM lineitem",
         f"SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderkey % {m} <> 0"),
        ("orders.o_custkey->customer.c_custkey",
         "SELECT o_custkey AS k FROM orders",
         "SELECT DISTINCT c_custkey AS k FROM customer"),
        ("events.user_id->customer.c_custkey",
         "SELECT user_id AS k FROM events",
         "SELECT DISTINCT c_custkey AS k FROM customer"),
    ]
    parts = []
    for name, child, parent in rels:
        parts.append(f"""
SELECT '{name}' AS relationship,
       (SELECT count(*) FROM ({child})) AS n_child,
       (SELECT count(*) FROM ({child}) c
        WHERE c.k NOT IN (SELECT k FROM ({parent}))) AS n_orphans,
       (SELECT count(*) FROM ({parent})) AS n_parents,
       (SELECT count(*) FROM ({parent}) p
        WHERE p.k NOT IN (SELECT k FROM ({child}))) AS n_unref_parents""")
    return "\nUNION ALL\n".join(parts)


# -------------------------------------------- time-decayed engagement

DECAY_HALFLIFE_US = 24 * 3600 * 1_000_000  # 1-day half-life (SPEC)


def events_user_decay(sf_dir: str, n_buckets: int = 64):
    """Time-DECAYED engagement score: per user the sum of event values
    halved for every full day of age at the corpus watermark (max ts) —
    the recency-weighted activity feature a ranking/retention model
    consumes. -> (user_id, decayed_cents).

    Exactness: weight is the INTEGER floor division cents >> age_days
    (cents // 2^age) — no float powers, so any engine reproduces it
    bit-for-bit; values are positive so floor == truncation in both
    engines. Shape: one streaming aggregate for the watermark (driver
    scalar, broadcast in the closure), a zero-shuffle vectorized decay
    map, ONE user-bucketed sum exchange."""
    from ..functions.bucketing import bucketed_sum

    def scan():
        return rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["ts", "user_id", "value"])

    # watermark: one streaming aggregate -> a driver scalar (us epoch)
    t_max = int(pd.Timestamp(scan().max("ts")).value // 1000)

    def decay(t: pa.Table) -> pa.Table:
        ts = pc.cast(t["ts"], pa.int64()).to_numpy()
        cents = np.floor(
            t["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        age = (t_max - ts) // DECAY_HALFLIFE_US
        dec = cents >> np.minimum(age, 62)
        return pa.table({
            "user_id": t["user_id"],
            "decayed_cents": pa.array(dec, pa.int64()),
        })

    return bucketed_sum(scan().map_batches(decay, batch_format="pyarrow"),
                        ["user_id"], "decayed_cents", n_buckets)


def sql_events_user_decay() -> str:
    return f"""
WITH m AS (SELECT max(epoch_us(ts)) AS t_max FROM events)
SELECT user_id,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)
                // (CAST(1 AS BIGINT)
                    << ((m.t_max - epoch_us(ts)) // {DECAY_HALFLIFE_US})))
            AS BIGINT) AS decayed_cents
FROM events, m
GROUP BY user_id"""


# ------------------------------------------------- k-anonymity audit

KANON_K = 5
KANON_VALUE_BUCKET_CENTS = 1000  # $10 quasi-identifier value bins


def events_kanonymity(sf_dir: str, k: int = KANON_K, n_buckets: int = 64):
    """k-ANONYMITY audit (data-governance gate): equivalence classes of
    the quasi-identifier tuple (event_type, hour-of-day, $10 value bin)
    with FEWER than ``k`` members — the re-identifiable cells a privacy
    review must suppress or generalize before publishing the table.
    -> (event_type, hour, value_bucket, n) for n < k.

    Shape: per-batch partial counts -> ONE quasi-id-bucketed sum
    exchange -> vectorized n < k filter inside the merge. Class count is
    bounded by the quasi-id domain (enum x 24 x value bins), never the
    fact count."""
    from ..functions.bucketing import bucketed_apply

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "ts", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame({
            "event_type": b["event_type"],
            "hour": b["ts"].dt.hour.astype("int64"),
            "value_bucket": (np.floor(
                b["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
                // KANON_VALUE_BUCKET_CENTS),
        })
        p["n"] = np.int64(1)
        return p.groupby(["event_type", "hour", "value_bucket"],
                         as_index=False)["n"].sum()

    _empty = {
        "event_type": pd.Series([], dtype=object),
        "hour": pd.Series([], dtype="int64"),
        "value_bucket": pd.Series([], dtype="int64"),
        "n": pd.Series([], dtype="int64"),
    }

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "event_type" not in g.columns:
            return pd.DataFrame(_empty)
        agg = g.groupby(["event_type", "hour", "value_bucket"],
                        as_index=False)["n"].sum()
        agg["n"] = agg["n"].astype("int64")
        out = agg.loc[agg["n"] < k]
        return out if len(out) else pd.DataFrame(_empty)

    return bucketed_apply(
        ds.map_batches(partial, batch_format="pandas"),
        ["event_type", "hour", "value_bucket"], merge, None, n_buckets)


def sql_events_kanonymity(k: int = KANON_K) -> str:
    return f"""
SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
       CAST(floor(value * 100 + 0.5) AS BIGINT)
         // {KANON_VALUE_BUCKET_CENTS} AS value_bucket,
       CAST(count(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2, 3
HAVING count(*) < {k}"""


# --------------------------------------------- winsorized aggregates

def events_value_winsorized(sf_dir: str):
    """WINSORIZED per-type totals: values clipped to the type's exact
    [p(1/16), p(15/16)] quantiles (binary-exact q per the quantiles
    module contract; quantile_disc data values from the scale-safe histogram
    selection, broadcast), then an enum-bounded (n, clipped-cents-sum)
    fold — the outlier-robust revenue rollup a cleaning pipeline
    publishes next to the raw sum. Clip thresholds are actual data
    values so the cents comparison is bit-identical to the oracle."""
    from ..functions.quantiles import grouped_exact_ranks, quantile_disc_rank

    def scan():
        return rd.read_parquet(f"{sf_dir}/events.parquet",
                               columns=["event_type", "value"])

    counts = {r["event_type"]: int(r["count()"])
              for r in scan().groupby("event_type").count().take_all()}
    targets = {
        g: [(lbl, quantile_disc_rank(q, n))
            for lbl, q in (("plo", 0.0625), ("phi", 0.9375))]
        for g, n in counts.items()
    }
    got = grouped_exact_ranks(scan, "event_type", "value", targets)
    lim = {g: (int(np.floor(got[(g, "plo")] * 100.0 + 0.5)),
               int(np.floor(got[(g, "phi")] * 100.0 + 0.5)))
           for g in counts}  # enum-bounded broadcast cents thresholds
    import ray as _ray

    ref = _ray.put(lim)

    def partial(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        th = _ray.get(_ref)
        cents = np.floor(
            b["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        lo = np.array([th[t][0] for t in b["event_type"]], dtype=np.int64)
        hi = np.array([th[t][1] for t in b["event_type"]], dtype=np.int64)
        p = pd.DataFrame({
            "event_type": b["event_type"],
            "n": np.ones(len(b), dtype=np.int64),
            "clipped_cents": np.clip(cents, lo, hi),
        })
        return p.groupby("event_type",
                         as_index=False)[["n", "clipped_cents"]].sum()

    frames = list(scan().map_batches(partial, batch_format="pandas")
                  .iter_batches(batch_format="pandas", batch_size=None))
    agg = (pd.concat(frames, ignore_index=True)
           .groupby("event_type", as_index=False)[["n", "clipped_cents"]]
           .sum().sort_values("event_type"))  # enum-bounded fold
    return rd.from_arrow(pa.table({
        "event_type": pa.array(agg["event_type"], pa.string()),
        "n": pa.array(agg["n"].astype("int64"), pa.int64()),
        "clipped_cents": pa.array(agg["clipped_cents"].astype("int64"),
                                  pa.int64()),
    }))


def sql_events_value_winsorized() -> str:
    return """
WITH q AS (
  SELECT event_type,
         CAST(floor(quantile_disc(value, 0.0625) * 100 + 0.5) AS BIGINT)
           AS lo,
         CAST(floor(quantile_disc(value, 0.9375) * 100 + 0.5) AS BIGINT)
           AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(least(greatest(
              CAST(floor(e.value * 100 + 0.5) AS BIGINT), q.lo), q.hi))
            AS BIGINT) AS clipped_cents
FROM events e JOIN q USING (event_type)
GROUP BY e.event_type"""


# ------------------------------------------------ expectations audit

# declarative data-contract rules over orders (SPEC suite): each rule is
# a named vectorized predicate; the report is rule-bounded.
ORDERS_EXPECTATIONS = (
    "totalprice_positive",   # o_totalprice > 0
    "status_in_enum",        # o_orderstatus in {O, F} (P = exception row)
    "date_before_2000",      # o_orderdate < 2000-01-01
    "priority_format",       # o_orderpriority matches ^[1-5]-
    "custkey_positive",      # o_custkey > 0
)


def orders_expectations(sf_dir: str):
    """Declarative DATA-CONTRACT audit (the expectations suite an ingest
    gate runs before publishing): per named rule the violation count and
    the total row count -> (rule, n_violations, n_rows). One streaming
    pass of vectorized per-batch predicate counts; the fold is
    rule-bounded (5 x batch partials). Rules are SPEC constants shared
    with the oracle."""
    import re

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet",
                         columns=["o_totalprice", "o_orderstatus",
                                  "o_orderdate", "o_orderpriority",
                                  "o_custkey"])
    cutoff = pd.Timestamp("2000-01-01")
    prio_re = re.compile(r"^[1-5]-")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        viol = {
            "totalprice_positive": (~(b["o_totalprice"] > 0)).sum(),
            "status_in_enum": (~b["o_orderstatus"].isin(["O", "F"])).sum(),
            "date_before_2000": (~(b["o_orderdate"] < cutoff)).sum(),
            "priority_format":
                (~b["o_orderpriority"].str.match(prio_re)).sum(),
            "custkey_positive": (~(b["o_custkey"] > 0)).sum(),
        }
        return pd.DataFrame({
            "rule": list(ORDERS_EXPECTATIONS),
            "n_violations": np.array(
                [viol[r] for r in ORDERS_EXPECTATIONS], dtype=np.int64),
            "n_rows": np.full(len(ORDERS_EXPECTATIONS), len(b),
                              dtype=np.int64),
        })

    frames = list(ds.map_batches(partial, batch_format="pandas")
                  .iter_batches(batch_format="pandas", batch_size=None))
    agg = (pd.concat(frames, ignore_index=True)
           .groupby("rule", as_index=False)[["n_violations", "n_rows"]]
           .sum().sort_values("rule"))  # rule-bounded fold
    return rd.from_arrow(pa.table({
        "rule": pa.array(agg["rule"], pa.string()),
        "n_violations": pa.array(agg["n_violations"].astype("int64"),
                                 pa.int64()),
        "n_rows": pa.array(agg["n_rows"].astype("int64"), pa.int64()),
    }))


def sql_orders_expectations() -> str:
    return """
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM orders)
SELECT 'custkey_positive' AS rule,
       CAST(count(*) FILTER (NOT (o_custkey > 0)) AS BIGINT)
         AS n_violations, n.n_rows
FROM orders, n GROUP BY n.n_rows
UNION ALL
SELECT 'date_before_2000',
       CAST(count(*) FILTER (NOT (o_orderdate < TIMESTAMP '2000-01-01'))
            AS BIGINT), n.n_rows
FROM orders, n GROUP BY n.n_rows
UNION ALL
SELECT 'priority_format',
       CAST(count(*) FILTER (NOT regexp_matches(o_orderpriority,
                                                '^[1-5]-')) AS BIGINT),
       n.n_rows
FROM orders, n GROUP BY n.n_rows
UNION ALL
SELECT 'status_in_enum',
       CAST(count(*) FILTER (o_orderstatus NOT IN ('O', 'F')) AS BIGINT),
       n.n_rows
FROM orders, n GROUP BY n.n_rows
UNION ALL
SELECT 'totalprice_positive',
       CAST(count(*) FILTER (NOT (o_totalprice > 0)) AS BIGINT), n.n_rows
FROM orders, n GROUP BY n.n_rows"""


# --------------------------------------- semi-structured props parsing

PROPS_KEY_RE = r'"k":\s*(\d+)'


def events_props_stats(sf_dir: str):
    """Semi-structured EXTRACTION over the JSON ``props`` column (the
    ELT parse step for event payloads): pull the integer ``k`` field
    with ONE vectorized regex pass per batch and publish per-type
    stats -> (event_type, n, n_missing, sum_k, min_k, max_k).

    The extraction rule is the SPEC regex shared with the oracle (a
    JSON-path oracle would also work — the regex keeps both engines on
    one grammar). Rows whose props carry no integer ``k`` count as
    n_missing and are excluded from the aggregates. One streaming pass,
    enum-bounded fold, zero shuffles."""
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        k = b["props"].str.extract(PROPS_KEY_RE, expand=False)
        miss = k.isna()
        kv = pd.to_numeric(k, errors="coerce")
        p = pd.DataFrame({
            "event_type": b["event_type"],
            "n": np.ones(len(b), dtype=np.int64),
            "n_missing": miss.to_numpy().astype(np.int64),
            "sum_k": kv.fillna(0).astype(np.int64),
            "min_k": kv.fillna(np.inf),
            "max_k": kv.fillna(-np.inf),
        })
        agg = p.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), n_missing=("n_missing", "sum"),
            sum_k=("sum_k", "sum"), min_k=("min_k", "min"),
            max_k=("max_k", "max"))
        return agg

    frames = list(ds.map_batches(partial, batch_format="pandas")
                  .iter_batches(batch_format="pandas", batch_size=None))
    agg = (pd.concat(frames, ignore_index=True)
           .groupby("event_type", as_index=False)
           .agg(n=("n", "sum"), n_missing=("n_missing", "sum"),
                sum_k=("sum_k", "sum"), min_k=("min_k", "min"),
                max_k=("max_k", "max"))
           .sort_values("event_type"))  # enum-bounded fold
    present = agg["n"] > agg["n_missing"]
    return rd.from_arrow(pa.table({
        "event_type": pa.array(agg["event_type"], pa.string()),
        "n": pa.array(agg["n"].astype("int64"), pa.int64()),
        "n_missing": pa.array(agg["n_missing"].astype("int64"),
                              pa.int64()),
        "sum_k": pa.array(agg["sum_k"].astype("int64"), pa.int64()),
        "min_k": pa.array(
            np.where(present, agg["min_k"], 0).astype(np.int64),
            pa.int64()),
        "max_k": pa.array(
            np.where(present, agg["max_k"], 0).astype(np.int64),
            pa.int64()),
    }))


def sql_events_props_stats() -> str:
    return r"""
WITH x AS (
  SELECT event_type,
         TRY_CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS BIGINT)
           AS k
  FROM events
)
SELECT event_type, CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) FILTER (k IS NULL) AS BIGINT) AS n_missing,
       CAST(coalesce(sum(k), 0) AS BIGINT) AS sum_k,
       CAST(coalesce(min(k), 0) AS BIGINT) AS min_k,
       CAST(coalesce(max(k), 0) AS BIGINT) AS max_k
FROM x GROUP BY event_type"""


# ------------------------------- exact distributed skewness / kurtosis

def events_value_skewkurt(sf_dir: str):
    """Per-event-type EXACT skewness and excess kurtosis of the cent
    value -> (event_type, n_events, skewness, kurtosis) — the
    distribution-shape profile a data-quality monitor alarms on.

    Distributed higher moments need sum(y^3) / sum(y^4), which overflow
    int64 even WITHIN one batch (y <= ~5e4 cents -> y^4 up to 6.25e18;
    a 100k-row batch sums to ~1e23). The partials therefore carry each
    power in HI/LO bit-split components that provably fit int64 per
    batch — y^2 = a*2^16 + b with a,b < 2^16 for any y < 2^16 cents, so
    every component element (a*a, a*b, b*b, y*a, y*b) is < 2^32 and a
    2-billion-row batch cannot overflow the int64 partial sum. The
    enum-bounded fold reconstructs the exact sums as arbitrary-precision
    Python ints (pandas object-dtype sums: the int64 column sums would
    overflow at fact scale even though each batch partial fits). Floats
    appear only in the final double combination, computed in the
    IDENTICAL operation order as the DuckDB oracle (HUGEINT sums there)
    so the doubles are bit-exact. Zero-variance groups are excluded in
    both engines via the exact integer test n*s2 - s1^2 > 0.

    Shape: zero wide shuffles — vectorized per-batch partials,
    repartition(1) coalesce of enum-bounded rows, one driver-grain fold
    (the events_benford budget class)."""
    import math

    def hug2d(x: int) -> float:
        # DuckDB's HUGEINT->DOUBLE cast is NOT correctly rounded above
        # 2^64: it converts the two 64-bit halves separately and combines
        # in double (double rounding, observed 1-ulp-off at sf0.01).
        # Python's float(int) IS correctly rounded, so mimic DuckDB here.
        return (float(x >> 64) * 18446744073709551616.0
                + float(x & 0xFFFFFFFFFFFFFFFF))

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "value"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        y = _cents(b["value"].to_numpy())
        if len(y) and int(y.max()) >= 1 << 16:
            raise ValueError(
                "events_value_skewkurt: cent values >= 2^16 break the "
                "hi/lo split bound; widen the split constant")
        y2 = y * y
        a, lo = y2 >> 16, y2 & 0xFFFF
        df = pd.DataFrame({
            "event_type": b["event_type"].to_numpy(),
            "n": np.ones(len(y), dtype=np.int64),
            "s1": y, "s2": y2,
            "s3a": y * a, "s3b": y * lo,
            "s4aa": a * a, "s4ab": a * lo, "s4bb": lo * lo,
        })
        return df.groupby("event_type", as_index=False).sum()

    _empty = {
        "event_type": pd.Series([], dtype="object"),
        "n_events": pd.Series([], dtype="int64"),
        "skewness": pd.Series([], dtype="float64"),
        "kurtosis": pd.Series([], dtype="float64"),
    }

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "event_type" not in b.columns:
            return pd.DataFrame(_empty)
        rows = []
        for et, t in b.groupby("event_type", sort=True):
            # object-dtype sums: exact Python ints, no int64 overflow
            n = int(t["n"].astype(object).sum())
            s1 = int(t["s1"].astype(object).sum())
            s2 = int(t["s2"].astype(object).sum())
            s3 = (int(t["s3a"].astype(object).sum()) << 16) \
                + int(t["s3b"].astype(object).sum())
            s4 = (int(t["s4aa"].astype(object).sum()) << 32) \
                + (int(t["s4ab"].astype(object).sum()) << 17) \
                + int(t["s4bb"].astype(object).sum())
            if n * s2 - s1 * s1 <= 0:  # exact zero-variance exclusion
                continue
            nd = float(n)
            m1 = hug2d(s1) / nd
            r2 = hug2d(s2) / nd
            r3 = hug2d(s3) / nd
            r4 = hug2d(s4) / nd
            m2 = r2 - m1 * m1
            m3 = r3 - 3.0 * m1 * r2 + 2.0 * (m1 * m1 * m1)
            m4 = (r4 - 4.0 * m1 * r3 + 6.0 * (m1 * m1) * r2
                  - 3.0 * ((m1 * m1) * (m1 * m1)))
            rows.append((et, n, m3 / (m2 * math.sqrt(m2)),
                         m4 / (m2 * m2) - 3.0))
        if not rows:
            return pd.DataFrame(_empty)
        return pd.DataFrame({
            "event_type": [r[0] for r in rows],
            "n_events": np.array([r[1] for r in rows], dtype=np.int64),
            "skewness": np.array([r[2] for r in rows], dtype=np.float64),
            "kurtosis": np.array([r[3] for r in rows], dtype=np.float64),
        })

    return (ev.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def sql_events_value_skewkurt() -> str:
    # operation order mirrors the engine's fold EXACTLY (bit-identical
    # doubles): HUGEINT power sums -> per-sum single division by n ->
    # the same central-moment association order -> skew/kurt divisions.
    return """
WITH y AS (
  SELECT event_type,
         CAST(CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS HUGEINT) AS y
  FROM events),
s AS (
  SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
         sum(y) AS s1, sum(y * y) AS s2, sum((y * y) * y) AS s3,
         sum((y * y) * (y * y)) AS s4
  FROM y GROUP BY event_type),
m AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
         CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
         CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
         CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
  FROM s WHERE n * s2 - s1 * s1 > 0),
c AS (
  SELECT event_type, n,
         r2 - m1 * m1 AS m2,
         r3 - 3.0 * m1 * r2 + 2.0 * (m1 * m1 * m1) AS m3,
         r4 - 4.0 * m1 * r3 + 6.0 * (m1 * m1) * r2
           - 3.0 * ((m1 * m1) * (m1 * m1)) AS m4
  FROM m)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       m3 / (m2 * sqrt(m2)) AS skewness,
       m4 / (m2 * m2) - 3.0 AS kurtosis
FROM c"""


# ------------------------- type x hour mutual information / entropies

def events_type_hour_mi(sf_dir: str):
    """Dependence between event type and hour-of-day -> ONE row
    (n_events, h_type, h_hour, mi): Shannon entropies of both marginals
    and their mutual information in nats — the seasonality-coupling
    audit ("are error events clock-dependent?") that chi2 flags but
    does not quantify in bits.

    Floats here are multi-term transcendental sums, which the repo's
    one-division rule cannot cover — instead the ENUM-BOUNDED cells
    (types x 24) are folded in a FIXED sorted order on both sides:
    Python accumulates terms sequentially over cells sorted by
    (event_type, hour), and the oracle folds the identical terms with
    ``list_sum(list(term ORDER BY ...))`` — DuckDB's list_sum is a
    sequential left fold (verified), and ln() is the same libm call, so
    every intermediate double is bit-identical. The fact-scale work is
    the same zero-shuffle enum-bounded partial pass as
    events_hour_profile; only the <=  types x 24 contingency reaches the
    driver-grain fold."""
    import math

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["ts", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame({
            "event_type": b["event_type"],
            "hour": b["ts"].dt.hour.astype("int64"),
            "n": np.ones(len(b), dtype=np.int64),
        })
        return p.groupby(["event_type", "hour"], as_index=False)["n"].sum()

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        c = (b.groupby(["event_type", "hour"], as_index=False)["n"].sum()
             .sort_values(["event_type", "hour"], kind="mergesort"))
        n = int(c["n"].sum())
        nd = float(n)
        nx = c.groupby("event_type")["n"].sum().sort_index()
        ny = c.groupby("hour")["n"].sum().sort_index()
        hx = 0.0
        for v in nx:  # sequential fold in sorted-key order (oracle order)
            p = float(int(v)) / nd
            hx += p * math.log(p)
        hy = 0.0
        for v in ny:
            p = float(int(v)) / nd
            hy += p * math.log(p)
        mi = 0.0
        nx_of = dict(nx.items())
        ny_of = dict(ny.items())
        for r in c.itertuples(index=False):
            mi += ((float(int(r.n)) / nd)
                   * math.log((float(int(r.n)) * nd)
                              / (float(int(nx_of[r.event_type]))
                                 * float(int(ny_of[r.hour])))))
        return pd.DataFrame({
            "n_events": np.array([n], dtype=np.int64),
            "h_type": np.array([-hx], dtype=np.float64),
            "h_hour": np.array([-hy], dtype=np.float64),
            "mi": np.array([mi], dtype=np.float64),
        })

    return (ds.map_batches(partial, batch_format="pandas")
            .repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def sql_events_type_hour_mi() -> str:
    return """
WITH c AS (
  SELECT event_type, CAST(hour(ts) AS BIGINT) AS hour,
         CAST(count(*) AS BIGINT) AS nxy
  FROM events GROUP BY event_type, hour(ts)),
tot AS (SELECT CAST(sum(nxy) AS DOUBLE) AS nd,
               CAST(sum(nxy) AS BIGINT) AS n FROM c),
mx AS (SELECT event_type, CAST(sum(nxy) AS BIGINT) AS nx
       FROM c GROUP BY event_type),
my AS (SELECT hour, CAST(sum(nxy) AS BIGINT) AS ny FROM c GROUP BY hour),
terms AS (
  SELECT c.event_type, c.hour,
         (CAST(c.nxy AS DOUBLE) / t.nd)
           * ln((CAST(c.nxy AS DOUBLE) * t.nd)
                / (CAST(mx.nx AS DOUBLE) * CAST(my.ny AS DOUBLE))) AS term
  FROM c CROSS JOIN tot t
  JOIN mx ON mx.event_type = c.event_type
  JOIN my ON my.hour = c.hour),
hx AS (SELECT list_sum(list((CAST(nx AS DOUBLE) / t.nd)
                            * ln(CAST(nx AS DOUBLE) / t.nd)
                            ORDER BY event_type)) AS s
       FROM mx CROSS JOIN tot t),
hy AS (SELECT list_sum(list((CAST(ny AS DOUBLE) / t.nd)
                            * ln(CAST(ny AS DOUBLE) / t.nd)
                            ORDER BY hour)) AS s
       FROM my CROSS JOIN tot t),
mi AS (SELECT list_sum(list(term ORDER BY event_type, hour)) AS s
       FROM terms)
SELECT (SELECT n FROM tot) AS n_events,
       -(SELECT s FROM hx) AS h_type,
       -(SELECT s FROM hy) AS h_hour,
       (SELECT s FROM mi) AS mi"""


# --------------------------------------- per-user behavioral entropy

def events_user_entropy(sf_dir: str, n_buckets: int = 64):
    """Per-user Shannon entropy of the event-type mix -> (user_id,
    n_events, n_types, entropy): the behavioral-diversity segmentation
    feature (0 = single-behavior user; ln(5) = uniform over all types).

    ONE user-bucketed exchange of per-batch (user, type) partial counts;
    each user's <= |type-enum| terms fold sequentially in sorted type
    order with libm ln (the events_type_hour_mi doctrine — np.log is NOT
    bit-identical to libm, measured, so the per-user loop stays scalar;
    it runs over user x type rows, never events)."""
    import math

    from ..functions.bucketing import bucketed_apply

    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        p = pd.DataFrame({"user_id": b["user_id"].astype("int64"),
                          "event_type": b["event_type"],
                          "n": np.ones(len(b), dtype=np.int64)})
        return p.groupby(["user_id", "event_type"],
                         as_index=False)["n"].sum()

    _empty = {
        "user_id": pd.Series([], dtype="int64"),
        "n_events": pd.Series([], dtype="int64"),
        "n_types": pd.Series([], dtype="int64"),
        "entropy": pd.Series([], dtype="float64"),
    }

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "user_id" not in g.columns:
            return pd.DataFrame(_empty)
        c = (g.groupby(["user_id", "event_type"], as_index=False)["n"]
             .sum().sort_values(["user_id", "event_type"],
                                kind="mergesort"))
        uids, nevs, ntys, ents = [], [], [], []
        # rows here are user x type partials — never event-scale
        for uid, t in c.groupby("user_id", sort=True):
            n = int(t["n"].sum())
            nd = float(n)
            h = 0.0
            for v in t["n"]:  # sorted-type sequential fold (oracle order)
                p = float(int(v)) / nd
                h += p * math.log(p)
            uids.append(uid)
            nevs.append(n)
            ntys.append(len(t))
            ents.append(-h)
        return pd.DataFrame({
            "user_id": np.array(uids, dtype=np.int64),
            "n_events": np.array(nevs, dtype=np.int64),
            "n_types": np.array(ntys, dtype=np.int64),
            "entropy": np.array(ents, dtype=np.float64),
        })

    return bucketed_apply(ev, ["user_id"], merge, partial, n_buckets)


def sql_events_user_entropy() -> str:
    return """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type),
u AS (
  SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
         CAST(count(*) AS BIGINT) AS n_types,
         CAST(sum(n) AS DOUBLE) AS nd
  FROM c GROUP BY user_id),
h AS (
  SELECT c.user_id,
         list_sum(list((CAST(c.n AS DOUBLE) / u.nd)
                       * ln(CAST(c.n AS DOUBLE) / u.nd)
                       ORDER BY c.event_type)) AS s
  FROM c JOIN u ON u.user_id = c.user_id
  GROUP BY c.user_id)
SELECT u.user_id, u.n_events, u.n_types, -(h.s) AS entropy
FROM u JOIN h ON h.user_id = u.user_id"""
