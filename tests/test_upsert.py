"""The four upsert-semantics properties from the reference's test suite
(`builder/test/test_graphdb_update.py:33-82`), re-expressed as table
properties over run-merge (FIXTURES.md F4)."""

from __future__ import annotations

import ray.data as rd

from robokop_build_ray.stages.upsert import merge_node_runs

FAKE = "FAKEY:MCFAKERSON"  # sentinel id, `test_graphdb_update.py:7-8`


def _run(rows):
    return rd.from_items(rows)


def _merged(*runs):
    out = merge_node_runs([_run(r) for r in runs]).take_all()
    return {r["id"]: r for r in out}


def _node(name=None, node_type="disease", eq=()):
    return {"id": FAKE, "name": name, "node_type": node_type,
            "equivalent_identifiers": list(eq)}


def test_create():
    m = _merged([_node(name="Fakey", eq=[FAKE])])
    assert m[FAKE]["node_types"] == ["disease"]
    assert m[FAKE]["name"] == "Fakey"


def test_label_union():
    m = _merged([_node(node_type="disease", eq=[FAKE])],
                [_node(node_type="genetic_condition", eq=[FAKE])])
    assert m[FAKE]["node_types"] == ["disease", "genetic_condition"]


def test_synonym_overwrite_last_writer_wins():
    m = _merged([_node(eq=[FAKE, "OLD:1", "OLD:2"])],
                [_node(eq=["NEW:9"])])
    assert m[FAKE]["equivalent_identifiers"] == [FAKE, "NEW:9"]


def test_name_overwrite_later_nonnull_wins():
    m = _merged([_node(name="Old Name", eq=[FAKE])],
                [_node(name="New Name", eq=[FAKE])])
    assert m[FAKE]["name"] == "New Name"
    # later null does NOT erase the earlier name
    m2 = _merged([_node(name="Kept", eq=[FAKE])], [_node(name=None, eq=[FAKE])])
    assert m2[FAKE]["name"] == "Kept"
