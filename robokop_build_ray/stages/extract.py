"""Stage 1 — EXTRACT: per-turn (subj, pred, obj) triple extraction.

The Ray-Data replacement for the reference's federated edge-op fan-out
(`builder/builder.py:120-127` work queue; each ``source.function(curie) ->
[KEdge]``): every transcript turn independently yields its triples, so the
stage is a stateless ``map_batches`` over zero-copy Arrow batches — no
frontier, no queue, embarrassingly parallel (SURVEY §3.3).

Hot-path layout: a vectorized ``pyarrow.compute`` prefilter drops the
(majority) turns containing no predicate phrase before the compiled-regex
scan touches a row; the regex engine then does the character work in C.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..textgen import PHRASE_TO_PRED, PRED_PHRASES_ORDERED

# Shared with the DuckDB oracle SQL (entry.sql_oracle) — one source of truth
# for what a "triple sentence" is. Subject/object surfaces may contain
# letters, digits, spaces, commas and hyphens; never a sentence period.
SUBJ_OBJ = r"([A-Za-z][A-Za-z0-9,\- ]*?)"
TRIPLE_REGEX = (
    SUBJ_OBJ + r" (" + "|".join(PRED_PHRASES_ORDERED) + r") " + SUBJ_OBJ + r"\."
)
_TRIPLE_RE = re.compile(TRIPLE_REGEX)

TRIPLES_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
    ]
)


def extract_triples_batch(batch: pa.Table) -> pa.Table:
    """pyarrow in / pyarrow out; safe on empty batches."""
    text = batch["text"]
    # vectorized prefilter: any predicate phrase present?
    mask = None
    for phrase in PRED_PHRASES_ORDERED:
        m = pc.match_substring(text, f" {phrase} ")
        mask = m if mask is None else pc.or_(mask, m)
    hit = batch.filter(mask)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    subjs: list[str] = []
    preds: list[str] = []
    objs: list[str] = []
    for cid, tix, t in zip(
        hit["conv_id"].to_pylist(), hit["turn_idx"].to_pylist(), hit["text"].to_pylist()
    ):
        for m in _TRIPLE_RE.finditer(t):
            conv_ids.append(cid)
            turn_idxs.append(tix)
            subjs.append(m.group(1))
            preds.append(PHRASE_TO_PRED[m.group(2)])
            objs.append(m.group(3))
    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idxs, pa.int32()),
            "subj": pa.array(subjs, pa.string()),
            "pred": pa.array(preds, pa.string()),
            "obj": pa.array(objs, pa.string()),
        },
        schema=TRIPLES_SCHEMA,
    )


def extract_stage(transcripts, batch_size: int = 8192):
    """transcripts Dataset -> raw triples Dataset (stateless tasks)."""
    return transcripts.map_batches(
        extract_triples_batch, batch_format="pyarrow", batch_size=batch_size
    )
