"""Checkpoint-resumable stage boundaries with per-partition lineage manifests.

Parquet has no upsert; the reference's idempotent neo4j upserts
(`builder/builder.py:16-41,76-96`) are emulated with a commit protocol
(SURVEY §7.4.4): each stage writes its parquet part files into the stage
directory, then commits by writing ``_MANIFEST.json`` LAST (write-temp +
atomic rename). A directory without a manifest is garbage and is wiped before
rewrite; a directory with one is complete and a resumed run reads it instead
of recomputing (`pipelines.kg_build.build_graph(checkpoint_dir=...)``).

The manifest records lineage + metrics per stage: input stage names, row
count, per-file row counts/sizes, schema.
"""

from __future__ import annotations

import json
import os
import shutil

import pyarrow.parquet as pq

MANIFEST = "_MANIFEST.json"


def is_complete(stage_dir: str) -> bool:
    return os.path.exists(os.path.join(stage_dir, MANIFEST))


def read_manifest(stage_dir: str) -> dict:
    with open(os.path.join(stage_dir, MANIFEST)) as f:
        return json.load(f)


def commit_stage(ds, stage_dir: str, *, inputs: list[str],
                 min_rows_per_file: int = 200_000) -> dict:
    """Execute ``ds`` into ``stage_dir`` and commit the lineage manifest.

    Returns the manifest dict. If the stage was already committed, it is a
    no-op returning the existing manifest (idempotent restart, S5/S6
    semantics)."""
    if is_complete(stage_dir):
        return read_manifest(stage_dir)
    if os.path.exists(stage_dir):  # uncommitted garbage from a crashed run
        shutil.rmtree(stage_dir)
    os.makedirs(stage_dir, exist_ok=True)
    ds.write_parquet(stage_dir, min_rows_per_file=min_rows_per_file)

    parts = []
    total = 0
    schema_str = ""
    for name in sorted(os.listdir(stage_dir)):
        if not name.endswith(".parquet"):
            continue
        path = os.path.join(stage_dir, name)
        md = pq.ParquetFile(path)
        parts.append(
            {"file": name, "rows": md.metadata.num_rows,
             "bytes": os.path.getsize(path)}
        )
        total += md.metadata.num_rows
        schema_str = str(md.schema_arrow)
    manifest = {
        "stage_dir": stage_dir,
        "inputs": inputs,
        "rows": total,
        "partitions": parts,
        "schema": schema_str,
    }
    tmp = os.path.join(stage_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(stage_dir, MANIFEST))
    return manifest


def read_stage(stage_dir: str):
    import ray.data as rd

    files = [
        os.path.join(stage_dir, p["file"]) for p in read_manifest(stage_dir)["partitions"]
    ]
    return rd.read_parquet(files)


def compact_parquet_dir(in_dir: str, out_dir: str,
                        target_rows_per_file: int = 1_000_000) -> dict:
    """Storage-maintenance pass: coalesce a directory of (possibly many
    small) parquet part files into ~``target_rows_per_file``-row files.

    The small-file problem is the standard failure mode of resumable
    partitioned output at 10^5 tasks (one file per task -> metadata-bound
    reads); periodic compaction is the standard fix. Content-preserving
    by construction: a streaming read -> ``repartition(shuffle=False)``
    (split/merge of adjacent blocks — NO all-to-all exchange) -> write.
    Returns {files_in, files_out, rows}.
    """
    import math
    import os
    import shutil

    import ray.data as rd

    ds = rd.read_parquet(in_dir)
    rows = ds.count()
    files_in = sum(1 for f in os.listdir(in_dir) if f.endswith(".parquet"))
    n_files = max(1, math.ceil(rows / target_rows_per_file))
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    (rd.read_parquet(in_dir)
       .repartition(n_files, shuffle=False)
       .write_parquet(out_dir, min_rows_per_file=target_rows_per_file))
    files_out = sum(1 for f in os.listdir(out_dir) if f.endswith(".parquet"))
    return {"files_in": files_in, "files_out": files_out, "rows": rows}
