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
