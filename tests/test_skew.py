"""Hot-conversation skew handling: salted vs unsalted equivalence
(FIXTURES.md F4 "hot-conversation run produces identical output with and
without salting")."""

from __future__ import annotations

import pyarrow.parquet as pq
import ray.data as rd

from robokop_build_ray.functions.skew import plain_distinct, salted_distinct
from robokop_build_ray.pipelines.kg_build import build_graph
from robokop_build_ray.stages.support import conv_entity_stage


def _rows(ds):
    return sorted((r["conv_id"], r["entity"]) for r in ds.take_all())


def test_salted_distinct_equals_plain(smoke_corpus):
    g = build_graph("sf0.001", materialize_intermediate=True,
                    include_support=False)
    salted = conv_entity_stage(g["canonical"], salt_k=16)
    plain = conv_entity_stage(g["canonical"], salt_k=None)
    assert _rows(salted) == _rows(plain)


def test_hot_conversation_present_and_handled(smoke_corpus):
    """The smoke corpus has a hot conversation (conv-000000, ~100x median);
    the salted distinct must cover it fully."""
    tr = pq.read_table(smoke_corpus["transcripts"]).to_pandas()
    sizes = tr.groupby("conv_id").size()
    assert sizes["conv-000000"] >= 20 * sizes.median()

    g = build_graph("sf0.001", materialize_intermediate=True,
                    include_support=False)
    ents = _rows(conv_entity_stage(g["canonical"], salt_k=8))
    hot = [e for c, e in ents if c == "conv-000000"]
    assert len(hot) == len(set(hot)) > 0


def test_salted_distinct_generic():
    rows = [{"k": f"k{i % 3}", "v": f"v{i % 7}"} for i in range(500)]
    ds = rd.from_items(rows)
    a = sorted((r["k"], r["v"]) for r in
               salted_distinct(ds, ["k", "v"], "v", k=4).take_all())
    b = sorted((r["k"], r["v"]) for r in
               plain_distinct(ds, ["k", "v"]).take_all())
    assert a == b
    assert len(a) == 21


def test_coalesced_count_equals_bucketed():
    """coalesced_count (no sort AllToAll) must agree with bucketed_count
    after the driver-side final merge it documents."""
    from robokop_build_ray.functions.bucketing import (
        bucketed_count,
        coalesced_count,
    )

    rows = [{"e": f"e{i % 13}"} for i in range(2_000)]
    ds = rd.from_items(rows)
    want = {r["e"]: r["c"] for r in bucketed_count(ds, ["e"]).take_all()}
    got: dict[str, int] = {}
    for r in coalesced_count(ds, ["e"], coalesce=3).take_all():
        got[r["e"]] = got.get(r["e"], 0) + int(r["c"])
    assert got == want
    assert sum(got.values()) == 2_000


def test_bucketed_attach_equals_pandas_merge():
    """bucketed_attach == pandas inner merge, including binary payloads and
    keys missing from the right side (dropped rows)."""
    import pandas as pd

    from robokop_build_ray.functions.bucketing import bucketed_attach

    pairs = [{"id_a": i, "id_b": i + 100} for i in range(20)]
    sigs = [{"doc_id": i, "sig": bytes([i % 7] * 4)} for i in range(15)]
    left = rd.from_items(pairs)
    right = rd.from_items(sigs)
    out = bucketed_attach(left, right, "id_a", "doc_id",
                          ["id_a", "id_b"], {"sig": "sig_a"}).take_all()
    want = pd.DataFrame(pairs).merge(
        pd.DataFrame(sigs), left_on="id_a", right_on="doc_id"
    )
    got = sorted((r["id_a"], r["id_b"], r["sig_a"]) for r in out)
    assert got == sorted(map(tuple, want[["id_a", "id_b", "sig"]].values))
    assert len(got) == 15  # ids 15..19 have no signature -> dropped


def test_bucketed_semi_and_anti_equal_pandas():
    """bucketed_semi == pandas isin membership for both semi and anti,
    with a string attribute column riding along (left_fill) and right-side
    duplicate keys (membership counts once)."""
    from robokop_build_ray.functions.bucketing import bucketed_semi

    left_rows = [{"k": i, "attr": f"a{i % 4}"} for i in range(30)]
    right_rows = [{"rk": i % 10} for i in range(50)]  # keys 0..9, duplicated
    left = rd.from_items(left_rows)
    right = rd.from_items(right_rows)

    semi = sorted(
        (r["k"], r["attr"]) for r in bucketed_semi(
            left, right, "k", "rk", ["k", "attr"],
            left_fill={"attr": ""}, n_buckets=8,
        ).take_all()
    )
    anti = sorted(
        (r["k"], r["attr"]) for r in bucketed_semi(
            left, right, "k", "rk", ["k", "attr"],
            left_fill={"attr": ""}, n_buckets=8, anti=True,
        ).take_all()
    )
    want_semi = sorted((i, f"a{i % 4}") for i in range(10))
    want_anti = sorted((i, f"a{i % 4}") for i in range(10, 30))
    assert semi == want_semi
    assert anti == want_anti


def test_bucketed_apply_sparse_keys_typed_outputs():
    """2 distinct keys over 64 buckets: sentinel padding must keep every
    partition non-empty/typed, results unchanged, sentinels invisible."""
    from robokop_build_ray.functions.bucketing import bucketed_count

    rows = [{"k": "a"}] * 30 + [{"k": "b"}] * 12
    out = bucketed_count(rd.from_items(rows).repartition(6), ["k"]).take_all()
    assert sorted((r["k"], r["c"]) for r in out) == [("a", 30), ("b", 12)]


def test_bucketed_attach_mixed_payload_fill_and_widening():
    """payload_fill as a per-column dict (mixed str/int/float payloads) and
    dtype widening: an int32 right column must come back int64 when the
    sentinel is int64 — one block schema across the union."""
    import numpy as np
    import pandas as pd

    from robokop_build_ray.functions.bucketing import bucketed_attach

    left = rd.from_items([{"k": i, "v": i * 10} for i in range(8)])
    right_df = pd.DataFrame({
        "rk": pd.Series(range(6), dtype="int64"),
        "name": [f"n{i}" for i in range(6)],
        "nat": pd.Series(range(6), dtype="int32"),   # narrow on purpose
        "bal": pd.Series([1.5 * i for i in range(6)], dtype="float64"),
    })
    out = bucketed_attach(
        left, rd.from_pandas(right_df), "k", "rk", ["k", "v"],
        payload={"name": "name", "nat": "nat", "bal": "bal"},
        payload_fill={"name": "", "nat": np.int64(0),
                      "bal": np.float64(0.0)},
        left_fill={"v": np.int64(0)}, n_buckets=4,
    ).take_all()
    got = sorted((r["k"], r["v"], r["name"], r["nat"], r["bal"])
                 for r in out)
    want = [(i, i * 10, f"n{i}", i, 1.5 * i) for i in range(6)]
    assert got == want
    assert all(isinstance(r["nat"], int) for r in out)  # widened, not i32


def test_bucketed_outer_unique_edges(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from robokop_build_ray.functions.bucketing import bucketed_outer_unique

    l = rd.from_pandas(pd.DataFrame(
        {"k": ["a", "b", "c"], "x": np.array([1, 2, 3], dtype=np.int64)}))
    r = rd.from_pandas(pd.DataFrame(
        {"k": ["b", "c", "d"], "y": np.array([20, 30, 40],
                                             dtype=np.int64)}))
    got = {row["k"]: (row["x"], row["y"])
           for row in bucketed_outer_unique(
               l, r, "k", ["x"], ["y"],
               {"x": np.int64(0), "y": np.int64(0)},
               n_buckets=4).take_all()}
    assert got == {"a": (1, 0), "b": (2, 20), "c": (3, 30), "d": (0, 40)}
    # zero-overlap sides
    r2 = rd.from_pandas(pd.DataFrame(
        {"k": ["z"], "y": np.array([9], dtype=np.int64)}))
    got2 = {row["k"]: (row["x"], row["y"])
            for row in bucketed_outer_unique(
                l, r2, "k", ["x"], ["y"],
                {"x": np.int64(0), "y": np.int64(0)},
                n_buckets=4).take_all()}
    assert got2 == {"a": (1, 0), "b": (2, 0), "c": (3, 0), "z": (0, 9)}
    # dtypes stay int64 despite the outer-merge NaN widening
    tbl = bucketed_outer_unique(
        l, r, "k", ["x"], ["y"],
        {"x": np.int64(0), "y": np.int64(0)}, n_buckets=4).take_batch(
        batch_format="pandas")
    assert str(tbl["x"].dtype) == "int64" and str(tbl["y"].dtype) == "int64"
