"""Unit tests for the session-H operators: distributed prefix scan,
snapshot diff, table checksum, Z-order cells, FD profiling, RI audit,
and the zlib compression-ratio quality filter."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from robokop_build_ray.pipelines import relational as rel
from robokop_build_ray.stages import text_analysis as ta


def _write(dirp, name, df):
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{dirp}/{name}.parquet")


def test_prefix_scan_records_carry_in(tmp_path):
    # records: id 1 (first), id 3 (7>5), id 5 (10>7); n_ranges=2 forces a
    # non-trivial carry-in from range 0 into range 1
    _write(tmp_path, "events", pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5, 6],
        "value": [0.05, 0.03, 0.07, 0.07, 0.10, 0.01]}))
    got = (rel.events_records(str(tmp_path), n_ranges=2)
           .to_pandas().sort_values("event_id").reset_index(drop=True))
    assert got["event_id"].tolist() == [1, 3, 5]
    assert got["cents"].tolist() == [5, 7, 10]
    assert got["prev_max_cents"].tolist() == [-1, 5, 7]


def test_snapshot_diff_kinds(tmp_path):
    # 97 -> changed, 101 -> removed, 103 -> added (shifted key),
    # 97*101 -> removed wins over changed, 1 -> untouched
    keys = [1, 97, 101, 103, 97 * 101]
    _write(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": keys,
        "o_orderstatus": ["O"] * len(keys),
        "o_totalprice": [10.0] * len(keys)}))
    got = rel.orders_snapshot_diff(str(tmp_path)).to_pandas()
    kinds = dict(zip(got["o_orderkey"], got["change"]))
    assert kinds == {97: "changed", 101: "removed", 97 * 101: "removed",
                     103 + rel.DIFF_KEY_SHIFT: "added"}


@pytest.mark.parametrize("parity", [True, False])
def test_checksum_order_and_layout_independent(tmp_path, parity):
    df = pd.DataFrame({
        "l_orderkey": [3, 1, 2, 9], "l_linenumber": [1, 1, 2, 1],
        "l_returnflag": list("ANRA"), "l_linestatus": list("OFOF"),
        "l_quantity": [1.0, 2.0, 3.5, 4.25]})
    a, b = tmp_path / "a", tmp_path / "b"
    a.mkdir(), b.mkdir()
    _write(a, "lineitem", df)
    # permuted rows AND a different row-group split must not change it
    pq.write_table(pa.Table.from_pandas(df.iloc[::-1],
                                        preserve_index=False),
                   f"{b}/lineitem.parquet", row_group_size=2)
    ca = rel.lineitem_checksum(str(a), parity=parity).to_pandas()
    cb = rel.lineitem_checksum(str(b), parity=parity).to_pandas()
    assert ca["n_rows"].iat[0] == 4
    assert ca["checksum"].iat[0] == cb["checksum"].iat[0]
    # a one-cell edit must change it
    c = tmp_path / "c"
    c.mkdir()
    _write(c, "lineitem", df.assign(l_quantity=[1.0, 2.0, 3.5, 4.26]))
    cc = rel.lineitem_checksum(str(c), parity=parity).to_pandas()
    assert cc["checksum"].iat[0] != ca["checksum"].iat[0]


def test_zorder_cells_roundtrip_and_counts(tmp_path):
    # user 3 / 2 whole units -> (u=3, v=2) twice; user 1 / 0 units once
    _write(tmp_path, "events", pd.DataFrame({
        "user_id": [3, 3, 1], "value": [2.0, 2.5, 0.5]}))
    got = rel.events_zorder_cells(str(tmp_path)).to_pandas()
    by_uv = {(r.u_bucket, r.v_bucket): r.n_events
             for r in got.itertuples()}
    assert by_uv == {(3, 2): 2, (1, 0): 1}
    # interleave decodes back to the inputs for every row
    for r in got.itertuples():
        u = sum(((r.cell >> (2 * i + 1)) & 1) << i for i in range(8))
        v = sum(((r.cell >> (2 * i)) & 1) << i for i in range(8))
        assert (u, v) == (r.u_bucket, r.v_bucket)


def test_fd_profile_detects_violations(tmp_path):
    # o_custkey -> o_orderpriority: custkey 1 maps to 2 priorities
    # (violating), custkey 2 maps to 1 (clean)
    _write(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": [1, 2, 3],
        "o_custkey": [1, 1, 2],
        "o_orderstatus": ["O", "O", "F"],
        "o_orderdate": pd.to_datetime(["2024-01-01"] * 3),
        "o_orderpriority": ["1-URGENT", "2-HIGH", "1-URGENT"],
        "o_totalprice": [1.0, 2.0, 3.0]}))
    got = rel.orders_fd_profile(str(tmp_path)).to_pandas()
    row = got[got["determinant"] == "o_custkey"].iloc[0]
    assert (row["n_det"], row["n_violating"]) == (2, 1)
    key = got[got["determinant"] == "o_orderkey"].iloc[0]
    assert (key["n_det"], key["n_violating"]) == (3, 0)


def test_ri_audit_counts_orphans_and_unreferenced(tmp_path):
    # child lineitem orders: 7 and 14 vanish from the backfill parent view
    _write(tmp_path, "lineitem", pd.DataFrame({
        "l_orderkey": [7, 7, 14, 2, 3]}))
    _write(tmp_path, "orders", pd.DataFrame({
        "o_orderkey": [7, 14, 2, 3, 5],   # 5 is never referenced
        "o_custkey": [1, 1, 2, 2, 9]}))   # 9 is an orphan custkey
    _write(tmp_path, "customer", pd.DataFrame({"c_custkey": [1, 2, 3]}))
    _write(tmp_path, "events", pd.DataFrame({"user_id": [1, 3, 3]}))
    got = rel.ri_audit(str(tmp_path)).to_pandas()
    by = {r.relationship: r for r in got.itertuples()}
    li = by["lineitem.l_orderkey->orders[backfill].o_orderkey"]
    # parent view drops 7 and 14 -> their 3 child rows orphaned; parents
    # {2,3,5}, 5 unreferenced
    assert (li.n_child, li.n_orphans, li.n_parents,
            li.n_unref_parents) == (5, 3, 3, 1)
    oc = by["orders.o_custkey->customer.c_custkey"]
    assert (oc.n_child, oc.n_orphans, oc.n_parents,
            oc.n_unref_parents) == (5, 1, 3, 1)
    ev = by["events.user_id->customer.c_custkey"]
    assert (ev.n_child, ev.n_orphans, ev.n_parents,
            ev.n_unref_parents) == (3, 0, 3, 1)


def test_compression_flags_two_sided():
    rng = np.random.default_rng(7)
    short_random = "".join(chr(c) for c in rng.integers(0x4E00, 0x9FFF, 40))
    docs = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["ab" * 5000,                      # pm ~3: repetitive
                 "the cat sat on the mat " * 40,   # templated but English
                 short_random]}))                  # overhead > raw: high pm
    got = ta.compression_flags(docs).to_pandas()
    flags = dict(zip(got["doc_id"], got["flag"]))
    assert flags[1] == "repetitive"
    assert flags[3] == "incompressible"
    assert (got["ratio_pm"] < ta.COMP_RATIO_LO_PM).equals(
        got["flag"] == "repetitive")


def test_boruvka_msf_matches_bruteforce():
    # weights via mention counts: (A,B)x3 -> wt1, (B,C)x2 -> wt2,
    # (A,C)x1 -> wt3 (cycle: drop the heaviest), (C,D)x1 -> wt3 (bridge)
    from robokop_build_ray.stages.graph_metrics import (
        minimum_spanning_forest,
    )
    pairs = ([("A", "B")] * 3 + [("B", "C")] * 2
             + [("A", "C")] + [("C", "D")] + [("E", "F")])
    canonical = rd.from_pandas(pd.DataFrame(
        {"subj_id": [p[0] for p in pairs],
         "obj_id": [p[1] for p in pairs]}))
    got = minimum_spanning_forest(canonical).to_pandas()
    assert set(map(tuple, got.to_numpy())) == {
        ("A", "B", 1), ("B", "C", 2), ("C", "D", 3), ("E", "F", 3)}
