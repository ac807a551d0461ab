"""Deterministic synthetic transcript corpus (the pipeline's input table).

BASELINE.json ``input_hint`` fixes the input shape:
``conv_id:string, turn_idx:int32, role:string, text:string, tool:string,
ts:timestamp[us]``. No such table exists in /root/testdata, so it is
synthesized here — seeded, pure numpy, no external data — at three scale
tiers (FIXTURES.md F1/F5): skewed conversation sizes incl. one "hot"
conversation, rows emitted shuffled across conversations so stable-ordering
logic is actually exercised, surface variants (case / comma-inversion per
`builder/lookup_utils.py:7,23`) and 0..3 triple sentences per turn.

Turns play the role of the reference's federated op responses
(`builder/builder.py:120-127`): each triple sentence "<A> <pred phrase> <B>."
is one `source.function(curie) -> KEdge` result.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .gazetteer import Entity, build_entities

# predicate id <- (subj_type, obj_type); fallback related_to.
PRED_BY_TYPES: dict[tuple[str, str], str] = {
    ("chemical_substance", "disease"): "treats",
    ("gene", "disease"): "associated_with",
    ("chemical_substance", "gene"): "interacts_with",
    ("disease", "phenotypic_feature"): "causes",
}
PRED_PHRASE: dict[str, str] = {
    "treats": "treats",
    "associated_with": "is associated with",
    "causes": "causes",
    "interacts_with": "interacts with",
    "related_to": "is related to",
}
# Alternation order matters for the shared extraction regex: longest first.
PRED_PHRASES_ORDERED = [
    "is associated with", "is related to", "interacts with", "treats", "causes",
]
PHRASE_TO_PRED = {v: k for k, v in PRED_PHRASE.items()}

_FILLERS = [
    "Sounds good, thanks.",
    "Let me check the logs for that run.",
    "Here is the summary you asked for.",
    "The plan looks fine to me.",
    "I pushed the fix upstream.",
]
_MENTION_TPL = [
    "Consider {m} in this context.",
    "We looked at {m} yesterday.",
    "Any update on {m}?",
]
_ROLES = ["user", "assistant", "tool"]
_TOOLS = ["search", "lookup", "calc"]
_BASE_TS_US = 1_767_225_600_000_000  # 2026-01-01T00:00:00Z in microseconds


def predicate_for(subj: Entity, obj: Entity) -> str:
    return PRED_BY_TYPES.get((subj.node_type, obj.node_type), "related_to")


def _surface(e: Entity, variant: int) -> str:
    """Written surface variant; all normalize to the same lexicon key."""
    if variant == 1:
        return e.name.lower()
    if variant == 2 and ", " in e.name:
        head, _, tail = e.name.partition(", ")
        return f"{tail} {head}"  # un-inverted written form
    return e.name


def generate_transcripts(
    n_turns: int,
    n_entities: int = 400,
    seed: int = 42,
    hot_conv_factor: int = 100,
) -> pa.Table:
    """Deterministic transcript table with ~``n_turns`` rows."""
    rng = np.random.default_rng(seed)
    ents = build_entities(n_entities)

    conv_ids: list[str] = []
    turn_idxs: list[int] = []
    roles: list[str] = []
    texts: list[str] = []
    tools: list[str] = []
    tss: list[int] = []

    total = 0
    conv_i = 0
    median_size = 12
    while total < n_turns:
        if conv_i == 0 and n_turns >= 1000:
            size = median_size * hot_conv_factor  # hot conversation (skew test)
        else:
            size = 2 + int(rng.pareto(1.5) * median_size / 2)
            size = min(size, median_size * 40)
        size = min(size, n_turns - total) or 1
        cid = f"conv-{conv_i:06d}"
        pool_n = int(rng.integers(3, 11))
        pool_idx = rng.choice(len(ents), size=min(pool_n, len(ents)), replace=False)
        pool = [ents[j] for j in pool_idx]

        for t in range(size):
            n_sent = int(rng.integers(1, 4))
            sents: list[str] = []
            for s in range(n_sent):
                kind = rng.random()
                if kind < 0.5 and len(pool) >= 2:
                    a, b = rng.choice(len(pool), size=2, replace=False)
                    subj, obj = pool[a], pool[b]
                    phrase = PRED_PHRASE[predicate_for(subj, obj)]
                    sents.append(
                        f"{_surface(subj, (t + s) % 3)} {phrase} "
                        f"{_surface(obj, (t + 2 * s + 1) % 3)}."
                    )
                elif kind < 0.7:
                    m = pool[int(rng.integers(0, len(pool)))]
                    sents.append(
                        _MENTION_TPL[(t + s) % len(_MENTION_TPL)].format(
                            m=_surface(m, t % 3)
                        )
                    )
                else:
                    sents.append(_FILLERS[int(rng.integers(0, len(_FILLERS)))])
            role = _ROLES[t % 3]
            conv_ids.append(cid)
            turn_idxs.append(t)
            roles.append(role)
            texts.append(" ".join(sents))
            tools.append(_TOOLS[t % 3] if role == "tool" else "")
            tss.append(_BASE_TS_US + conv_i * 3_600_000_000 + t * 7_000_000)
        total += size
        conv_i += 1

    # rows shuffled across conversations; the permutation is applied with
    # numpy BEFORE Arrow sees the data and the table is built in bounded
    # chunks — a single whole-table `take` (and even a chunk-sliced take
    # over a chunked source) concatenates the text column into one array,
    # which overflows int32 string offsets past 2 GiB ("offset overflow
    # while concatenating arrays", hit at the 38.4M-turn 4x tier).
    n = len(conv_ids)
    perm = rng.permutation(n)
    cv = np.asarray(conv_ids, dtype=object)
    ti = np.asarray(turn_idxs, dtype=np.int32)
    ro = np.asarray(roles, dtype=object)
    tx = np.asarray(texts, dtype=object)
    tl = np.asarray(tools, dtype=object)
    ts_ = np.asarray(tss, dtype=np.int64)
    chunk = 4_000_000
    pieces = []
    for s in range(0, max(n, 1), chunk):
        p = perm[s:s + chunk]
        pieces.append(pa.table(
            {
                "conv_id": pa.array(cv[p].tolist(), pa.string()),
                "turn_idx": pa.array(ti[p], pa.int32()),
                "role": pa.array(ro[p].tolist(), pa.string()),
                "text": pa.array(tx[p].tolist(), pa.string()),
                "tool": pa.array(tl[p].tolist(), pa.string()),
                "ts": pa.array(ts_[p], pa.timestamp("us")),
            }
        ))
    return pieces[0] if len(pieces) == 1 else pa.concat_tables(pieces)
