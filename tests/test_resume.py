"""Checkpoint / lineage / resume semantics (SURVEY §7.4.4, north_rule
"resumable from checkpoint with per-partition lineage + metrics")."""

from __future__ import annotations

import json
import os
import shutil

import pytest

from robokop_build_ray.pipelines.kg_build import build_graph, materialize_graph
from robokop_build_ray.state import lineage


@pytest.fixture()
def ckpt(tmp_path):
    d = str(tmp_path / "ckpt")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _mtimes(stage_dir):
    return {
        f: os.path.getmtime(os.path.join(stage_dir, f))
        for f in os.listdir(stage_dir)
    }


def test_checkpointed_run_commits_manifests(ckpt, smoke_corpus):
    g = build_graph("sf0.001", checkpoint_dir=ckpt, include_support=False)
    g["triples"].count()  # consume
    for stage in ("triples", "linked", "canonical"):
        d = os.path.join(ckpt, stage)
        assert lineage.is_complete(d)
        m = lineage.read_manifest(d)
        assert m["rows"] > 0
        assert m["partitions"] and all(p["rows"] >= 0 for p in m["partitions"])
        assert "schema" in m and m["inputs"]


def test_resume_skips_completed_stages_and_is_identical(ckpt, smoke_corpus):
    g1 = build_graph("sf0.001", checkpoint_dir=ckpt, include_support=False)
    rows1 = sorted(
        (r["conv_id"], r["turn_idx"], r["subj_id"], r["pred_id"], r["obj_id"])
        for r in g1["canonical"].take_all()
    )
    before = _mtimes(os.path.join(ckpt, "triples"))

    # simulate a crashed downstream: wipe nothing, just re-run
    g2 = build_graph("sf0.001", checkpoint_dir=ckpt, include_support=False)
    rows2 = sorted(
        (r["conv_id"], r["turn_idx"], r["subj_id"], r["pred_id"], r["obj_id"])
        for r in g2["canonical"].take_all()
    )
    assert rows1 == rows2
    # committed stage was NOT recomputed (files untouched)
    assert _mtimes(os.path.join(ckpt, "triples")) == before


def test_uncommitted_garbage_is_wiped_and_rebuilt(ckpt, smoke_corpus):
    g1 = build_graph("sf0.001", checkpoint_dir=ckpt, include_support=False)
    g1["triples"].count()
    linked_dir = os.path.join(ckpt, "linked")
    # corrupt: remove the manifest (simulates a crash mid-commit)
    os.remove(os.path.join(linked_dir, lineage.MANIFEST))
    assert not lineage.is_complete(linked_dir)
    g2 = build_graph("sf0.001", checkpoint_dir=ckpt, include_support=False)
    assert lineage.is_complete(linked_dir)
    assert g2["linked"].count() == g1["linked"].count()


def test_materialize_outputs_sorted_and_committed(ckpt, smoke_corpus, tmp_path):
    out = str(tmp_path / "graph_out")
    g = build_graph("sf0.001", materialize_intermediate=True)
    manifests = materialize_graph(g, out)
    assert set(manifests) == {"nodes", "edges", "support"}
    for name, m in manifests.items():
        assert lineage.is_complete(os.path.join(out, name))
        assert m["rows"] > 0
    edges = lineage.read_stage(os.path.join(out, "edges")).take_all()
    keys = [(r["subj_id"], r["pred_id"], r["obj_id"]) for r in edges]
    assert keys == sorted(keys)
    support = lineage.read_stage(os.path.join(out, "support")).take_all()
    ps = [r["p"] for r in support]
    assert ps == sorted(ps)


def test_fused_and_checkpoint_paths_agree(ckpt, smoke_corpus):
    """The streaming fast path (canonicalization fused into linking actors)
    and the checkpoint path (separate link -> canonicalize stages) must emit
    identical canonical triples."""
    fused = build_graph("sf0.001", include_support=False)
    staged = build_graph("sf0.001", checkpoint_dir=ckpt, include_support=False)

    def rows(ds):
        return sorted(
            (r["conv_id"], r["turn_idx"], r["subj_id"], r["pred_id"], r["obj_id"])
            for r in ds.take_all()
        )

    assert rows(fused["canonical"]) == rows(staged["canonical"])


def test_support_async_matches_sync(smoke_corpus):
    """build_graph(support_async=True) must emit exactly the sync path's
    support rows (the overlap changes scheduling, never results)."""
    sync = build_graph("sf0.001", materialize_intermediate=True)
    asyn = build_graph("sf0.001", materialize_intermediate=True,
                       support_async=True)
    assert asyn["support"] is None
    rows_sync = sorted(
        tuple(sorted(r.items())) for r in sync["support"].take_all())
    rows_async = sorted(
        tuple(sorted(r.items()))
        for r in asyn["support_future"].result().take_all())
    assert rows_async == rows_sync


def test_compact_parquet_dir_preserves_content(ray_session, tmp_path):
    import os

    import pandas as pd
    import ray.data as rd

    from robokop_build_ray.state.lineage import compact_parquet_dir

    pre = str(tmp_path / "pre")
    post = str(tmp_path / "post")
    df = pd.DataFrame({"k": range(1000), "v": [f"x{i}" for i in range(1000)],
                       "tags": [[f"t{i % 3}", "z"] for i in range(1000)]})
    rd.from_pandas(df).repartition(16).write_parquet(pre)
    n_pre = sum(f.endswith(".parquet") for f in os.listdir(pre))
    stats = compact_parquet_dir(pre, post, target_rows_per_file=500)
    assert stats["files_in"] == n_pre and stats["rows"] == 1000
    assert stats["files_out"] <= 2 < n_pre
    got = rd.read_parquet(post).to_pandas().sort_values("k",
                                                        ignore_index=True)
    want = df.sort_values("k", ignore_index=True)
    assert got["k"].tolist() == want["k"].tolist()
    assert got["v"].tolist() == want["v"].tolist()
    assert [list(t) for t in got["tags"]] == want["tags"].tolist()
