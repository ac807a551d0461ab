"""Multi-format transcript readers produce the canonical schema and feed
the pipeline identically."""

from __future__ import annotations

import csv
import json

import pyarrow.parquet as pq
import pytest

from robokop_build_ray.sources.readers import TRANSCRIPT_SCHEMA, read_transcripts
from robokop_build_ray.stages.extract import extract_stage


@pytest.fixture(scope="module")
def small(smoke_corpus, tmp_path_factory):
    tbl = pq.read_table(smoke_corpus["transcripts"]).slice(0, 500)
    d = tmp_path_factory.mktemp("formats")
    pq_path = str(d / "t.parquet")
    pq.write_table(tbl, pq_path)

    rows = tbl.to_pylist()
    csv_path = str(d / "t.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        for r in rows:
            r = dict(r)
            r["ts"] = r["ts"].isoformat()
            w.writerow(r)

    json_path = str(d / "t.jsonl")
    with open(json_path, "w") as f:
        for r in rows:
            r = dict(r)
            r["ts"] = r["ts"].isoformat()
            f.write(json.dumps(r) + "\n")
    return {"parquet": pq_path, "csv": csv_path, "json": json_path}


def _triples(ds):
    return sorted(
        (r["conv_id"], r["turn_idx"], r["subj"], r["pred"], r["obj"])
        for r in extract_stage(ds).take_all()
    )


def test_all_formats_same_schema_and_triples(small):
    results = {}
    for fmt, path in small.items():
        ds = read_transcripts(path, format=fmt)
        assert ds.schema().names == [f.name for f in TRANSCRIPT_SCHEMA]
        results[fmt] = _triples(ds)
    assert results["parquet"] == results["csv"] == results["json"]
    assert len(results["parquet"]) > 0


def test_unknown_format_rejected(small):
    with pytest.raises(ValueError):
        read_transcripts(small["parquet"], format="xml")


def test_write_table_all_formats_roundtrip(tmp_path):
    import pandas as pd
    import ray.data as rd

    from robokop_build_ray.sources.readers import write_table

    rows = [{"id": f"N{i}", "vals": [f"a{i}", f"b{i}"], "n": i}
            for i in range(10)]
    ds = rd.from_items(rows)
    write_table(ds, str(tmp_path / "pq"), "parquet")
    write_table(ds, str(tmp_path / "csv"), "csv")
    write_table(ds, str(tmp_path / "jsonl"), "jsonl")

    back_pq = rd.read_parquet(str(tmp_path / "pq")).take_all()
    assert sorted(r["id"] for r in back_pq) == [f"N{i}" for i in range(10)]
    assert sorted(back_pq, key=lambda r: r["id"])[0]["vals"] == ["a0", "b0"]

    back_csv = rd.read_csv(str(tmp_path / "csv")).take_all()
    got = {r["id"]: r["vals"] for r in back_csv}
    assert got["N3"] == "a3|b3"  # lists join for the nested-type-free format

    back_js = rd.read_json(str(tmp_path / "jsonl")).take_all()
    assert {r["id"] for r in back_js} == {f"N{i}" for i in range(10)}

    try:
        write_table(ds, str(tmp_path / "x"), "xml")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
