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
                 prefilter: list[str] | None = None,
                 sentence_groups: tuple[str, str] | None = None):
        self.name = name
        self.regex = re.compile(pattern)
        self.phrase_to_pred = phrase_to_pred
        self.prefilter = (prefilter if prefilter is not None
                          else [f" {p} " for p in phrase_to_pred])
        # ONE combined RE2 alternation for the vectorized prefilter —
        # measured 8x faster than OR-ing one match_substring per phrase
        # (BASELINE §2.9 r05)
        self.prefilter_regex = "|".join(re.escape(p) for p in self.prefilter)
        # sentence fast path (r04 verdict #8): when the rule's matches are
        # provably one-per-'.'-terminated-sentence (subject/object classes
        # exclude the terminator), supply (subj_obj_class, terminator) and
        # the batch runs fully in C: split -> sentence prefilter -> ONE
        # pc.extract_regex — measured 4x over the finditer loop at 800k
        # turns, bit-identical output. Custom rules without it use the
        # generic Python fallback.
        self.sentence_groups = sentence_groups
        if sentence_groups is not None:
            so, term = sentence_groups
            alts = "|".join(phrase_to_pred)
            self.sentence_regex = (
                so.replace("(", "(?P<s>", 1) + " (?P<p>" + alts + ") "
                + so.replace("(", "(?P<o>", 1) + "$")
            self.terminator = term
        else:
            self.sentence_regex = None
            self.terminator = "."


DEFAULT_RULE = ExtractRule(
    "triple_pattern", TRIPLE_REGEX,
    {p: PHRASE_TO_PRED[p] for p in PRED_PHRASES_ORDERED},
    sentence_groups=(SUBJ_OBJ, "."),
)

# registry: name -> rule (plugin-by-name, `builder/builder.py:322` analog)
EXTRACT_RULES: dict[str, ExtractRule] = {DEFAULT_RULE.name: DEFAULT_RULE}


def register_rule(rule: ExtractRule) -> ExtractRule:
    EXTRACT_RULES[rule.name] = rule
    return rule


def _extract_sentence_path(hit: pa.Table, rule: ExtractRule) -> pa.Table | None:
    """Fully-C sentence fast path: split each hit turn on the rule's
    terminator, drop the unterminated tail fragment, prefilter sentences,
    then ONE ``pc.extract_regex`` — valid because the subject/object
    character classes exclude the terminator, so every ``finditer`` match
    of the full pattern lies inside exactly one terminated sentence and a
    sentence holds at most one match (its single terminator). Proven
    bit-identical to the Python loop at 800k corpus turns and pinned by
    tests/test_extract_rules.py."""
    htext = pc.fill_null(hit["text"], "").combine_chunks()
    sents = pc.split_pattern(htext, rule.terminator)
    offs = sents.offsets.to_numpy(zero_copy_only=False)
    vals = sents.values
    counts = np.diff(offs)
    parents = np.repeat(np.arange(len(htext), dtype=np.int64), counts)
    # the LAST fragment of every row never had a terminator -> never a match
    is_last = np.zeros(len(vals), dtype=bool)
    last_of_row = offs[1:] - 1
    is_last[last_of_row[counts > 0]] = True
    keep = ~is_last
    vals_k = vals.filter(pa.array(keep))
    par_k = parents[keep]
    m = pc.match_substring_regex(vals_k, rule.prefilter_regex)
    mnp = m.to_numpy(zero_copy_only=False)
    cand = vals_k.filter(m)
    par_c = par_k[mnp]
    if len(cand) == 0:
        return None
    ext = pc.extract_regex(cand, rule.sentence_regex)
    ok = pc.is_valid(ext)
    ext_ok = ext.filter(ok)
    if len(ext_ok) == 0:
        return None
    par_ok = par_c[ok.to_numpy(zero_copy_only=False)]
    phrases = list(rule.phrase_to_pred)
    pi = pc.index_in(pc.struct_field(ext_ok, "p"), pa.array(phrases))
    pred = pc.take(
        pa.array([rule.phrase_to_pred[p] for p in phrases]), pi)
    idx = pa.array(par_ok)
    return pa.table(
        {
            "conv_id": pc.take(hit["conv_id"], idx).combine_chunks(),
            "turn_idx": pc.cast(pc.take(hit["turn_idx"], idx),
                                pa.int32()).combine_chunks(),
            "subj": pc.cast(pc.struct_field(ext_ok, "s"), pa.string()),
            "pred": pc.cast(pred, pa.string()),
            "obj": pc.cast(pc.struct_field(ext_ok, "o"), pa.string()),
        },
        schema=TRIPLES_SCHEMA,
    )


def extract_triples_batch(batch: pa.Table,
                          rules: tuple[ExtractRule, ...] = (DEFAULT_RULE,)
                          ) -> pa.Table:
    """pyarrow in / pyarrow out; safe on empty batches and null text.

    Only ``text`` crosses into Python (the regex engine needs str) and —
    for rules with a sentence fast path — nothing does: the whole batch
    runs in C (combined-regex prefilter, split, one ``pc.extract_regex``;
    4x over the finditer loop, BASELINE §2.9 r05). conv_id/turn_idx stay
    Arrow and attach to matches via one ``pc.take`` per rule — at 10^12
    turns the per-row id conversions cost more than the regex itself."""
    text = pc.fill_null(batch["text"], "")
    parts = []
    for rule in rules:
        # vectorized prefilter: any predicate phrase present? (ONE
        # combined RE2 alternation — 8x over per-phrase match_substring)
        mask = pc.match_substring_regex(text, rule.prefilter_regex)
        hit = batch.filter(pc.fill_null(mask, False))
        if len(hit) == 0:
            continue
        if rule.sentence_regex is not None:
            part = _extract_sentence_path(hit, rule)
            if part is not None:
                parts.append(part)
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
