"""Transcript source readers: parquet (primary), CSV, JSONL.

The input contract is the BASELINE.json schema
(conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]); whatever the wire format, the Dataset that leaves this
module carries exactly that schema so every downstream stage is
format-agnostic. Parquet is the scale path (column pruning + row-group
pushdown); CSV/JSONL exist for interoperability and are normalized with a
vectorized Arrow cast after the read.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_COLS = [f.name for f in TRANSCRIPT_SCHEMA]


def _normalize(batch: pa.Table) -> pa.Table:
    cols = {}
    for field in TRANSCRIPT_SCHEMA:
        if field.name in batch.column_names:
            col = batch[field.name]
        else:  # missing optional column (e.g. tool in sparse exports)
            col = pa.nulls(len(batch), field.type)
        if col.type != field.type:
            col = col.combine_chunks().cast(field.type)
        cols[field.name] = col
    return pa.table(cols, schema=TRANSCRIPT_SCHEMA)


def read_transcripts(path: str, format: str = "parquet", **kwargs):
    """-> Dataset with TRANSCRIPT_SCHEMA, regardless of the wire format."""
    if format == "parquet":
        ds = rd.read_parquet(path, columns=_COLS, **kwargs)
    elif format == "csv":
        ds = rd.read_csv(path, **kwargs)
    elif format in ("json", "jsonl"):
        ds = rd.read_json(path, **kwargs)
    else:
        raise ValueError(f"unsupported transcript format: {format}")
    return ds.map_batches(_normalize, batch_format="pyarrow")


def write_table(ds, path: str, format: str = "parquet"):
    """Multi-format sink: write any output table (nodes / edges / support /
    doc results) as partitioned parquet (the scale path — one file per
    block, resumable), CSV, or JSONL. The non-parquet formats exist for
    interoperability (downstream tools that can't read parquet); list and
    timestamp columns are stringified for CSV because the format carries
    no nested types."""
    if format == "parquet":
        ds.write_parquet(path)
    elif format == "csv":
        def flatten(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            cols = {}
            for name in t.column_names:
                col = t[name]
                if pa.types.is_list(col.type) or pa.types.is_large_list(
                        col.type):
                    # lists join to a '|'-separated string (CSV carries no
                    # nested types; this sink is the interop path, not the
                    # scale path)
                    col = pc.binary_join(
                        col.combine_chunks().cast(pa.list_(pa.string())),
                        "|")
                elif pa.types.is_timestamp(col.type):
                    col = col.combine_chunks().cast(pa.string())
                cols[name] = col
            return pa.table(cols)

        ds.map_batches(flatten, batch_format="pyarrow").write_csv(path)
    elif format in ("json", "jsonl"):
        ds.write_json(path)
    else:
        raise ValueError(f"unsupported sink format: {format}")
