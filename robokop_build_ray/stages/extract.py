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

import numpy as np
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


class ExtractRule:
    """One pluggable per-turn extraction rule (the user-extension surface of
    SURVEY §2.10: the reference's data-source op registry re-expressed as an
    extractor rule registry). ``pattern`` must expose groups (subj, phrase,
    obj); ``phrase_to_pred`` maps the matched phrase to a predicate key;
    ``prefilter`` substrings cheaply gate the regex scan."""

    def __init__(self, name: str, pattern: str,
                 phrase_to_pred: dict[str, str],
                 prefilter: list[str] | None = None):
        self.name = name
        self.regex = re.compile(pattern)
        self.phrase_to_pred = phrase_to_pred
        self.prefilter = (prefilter if prefilter is not None
                          else [f" {p} " for p in phrase_to_pred])


DEFAULT_RULE = ExtractRule(
    "triple_pattern", TRIPLE_REGEX,
    {p: PHRASE_TO_PRED[p] for p in PRED_PHRASES_ORDERED},
)

# registry: name -> rule (plugin-by-name, `builder/builder.py:322` analog)
EXTRACT_RULES: dict[str, ExtractRule] = {DEFAULT_RULE.name: DEFAULT_RULE}


def register_rule(rule: ExtractRule) -> ExtractRule:
    EXTRACT_RULES[rule.name] = rule
    return rule


def extract_triples_batch(batch: pa.Table,
                          rules: tuple[ExtractRule, ...] = (DEFAULT_RULE,)
                          ) -> pa.Table:
    """pyarrow in / pyarrow out; safe on empty batches and null text.

    Only ``text`` crosses into Python (the regex engine needs str);
    conv_id/turn_idx stay Arrow and attach to matches via one ``pc.take``
    per rule — at 10^12 turns the per-row id conversions cost more than
    the regex itself (measured: regex ≈ 45 core-s vs ≈ 60 core-s of
    to_pylist/rebuild overhead at the 9.6M-turn bench tier)."""
    text = pc.fill_null(batch["text"], "")
    parts = []
    for rule in rules:
        # vectorized prefilter: any predicate phrase present?
        mask = None
        for phrase in rule.prefilter:
            m = pc.match_substring(text, phrase)
            mask = m if mask is None else pc.or_(mask, m)
        hit = batch.filter(pc.fill_null(mask, False))
        if len(hit) == 0:
            continue
        rows: list[int] = []
        subjs: list[str] = []
        preds: list[str] = []
        objs: list[str] = []
        for i, t in enumerate(hit["text"].to_pylist()):
            for m in rule.regex.finditer(t or ""):
                rows.append(i)
                subjs.append(m.group(1))
                preds.append(rule.phrase_to_pred[m.group(2)])
                objs.append(m.group(3))
        if not rows:
            continue
        idx = pa.array(np.asarray(rows, dtype=np.int64))
        parts.append(pa.table(
            {
                "conv_id": pc.take(hit["conv_id"], idx).combine_chunks(),
                "turn_idx": pc.cast(pc.take(hit["turn_idx"], idx),
                                    pa.int32()).combine_chunks(),
                "subj": pa.array(subjs, pa.string()),
                "pred": pa.array(preds, pa.string()),
                "obj": pa.array(objs, pa.string()),
            },
            schema=TRIPLES_SCHEMA,
        ))
    if not parts:
        return TRIPLES_SCHEMA.empty_table()
    return parts[0] if len(parts) == 1 else pa.concat_tables(parts)


def extract_stage(transcripts, batch_size: int = 8192,
                  rule_names: tuple[str, ...] = ("triple_pattern",)):
    """transcripts Dataset -> raw triples Dataset (stateless tasks);
    ``rule_names`` selects registered extraction rules by name."""
    rules = tuple(EXTRACT_RULES[n] for n in rule_names)
    return transcripts.map_batches(
        lambda t: extract_triples_batch(t, rules),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
