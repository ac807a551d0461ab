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


def _edge(s, o, pred="PRED:treats", src="extractor.triple_pattern",
          pubs=("CONV:c1#0",), n=1):
    return {"subj_id": s, "obj_id": o, "pred_id": pred, "edge_source": src,
            "publications": list(pubs), "n_mentions": n}


def test_edge_upsert_delete_and_replace_in_whole():
    from robokop_build_ray.stages.upsert import merge_edge_runs

    run1 = [
        _edge("A", "B", pubs=("CONV:c1#0", "CONV:c2#1"), n=2),
        _edge("A", "B", pred="PRED:causes"),   # second predicate, same key
        _edge("A", "C"),                       # key absent from run 2
    ]
    # run 2 rewrites (A, B): ONE predicate, smaller publication list —
    # the old (A, B) edges vanish entirely (no union, no summing)
    run2 = [_edge("A", "B", pubs=("CONV:c9#3",), n=1)]
    out = merge_edge_runs([rd.from_items(run1), rd.from_items(run2)],
                          n_buckets=4).take_all()
    got = sorted((r["subj_id"], r["obj_id"], r["pred_id"],
                  tuple(r["publications"]), r["n_mentions"]) for r in out)
    assert got == [
        ("A", "B", "PRED:treats", ("CONV:c9#3",), 1),  # replaced in whole
        ("A", "C", "PRED:treats", ("CONV:c1#0",), 1),  # run-1-only persists
    ]


def test_edge_upsert_distinct_sources_do_not_collide():
    from robokop_build_ray.stages.upsert import merge_edge_runs

    run1 = [_edge("A", "B", src="extractor.triple_pattern"),
            _edge("A", "B", src="cooccur", pred="PRED:related_to")]
    run2 = [_edge("A", "B", src="cooccur", pred="PRED:related_to",
                  pubs=("CONV:c5#0",))]
    out = merge_edge_runs([rd.from_items(run1), rd.from_items(run2)],
                          n_buckets=4).take_all()
    got = {(r["edge_source"]): tuple(r["publications"]) for r in out}
    # the extractor-sourced edge survives; only the cooccur one is replaced
    assert got == {"extractor.triple_pattern": ("CONV:c1#0",),
                   "cooccur": ("CONV:c5#0",)}
