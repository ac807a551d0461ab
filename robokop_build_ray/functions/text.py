"""Scalar/string helpers shared by all stages.

Reference semantics re-expressed from NCATS-Gamma/robokop-build:

- CURIE prefix/suffix split on ``:`` — `builder/chemotext.py:27-31`,
  `builder/cdw.py:22,82,87` (greent's ``Text.get_curie``/``un_curie``).
- Predicate label sanitization ``:`` -> ``_`` — `builder/builder.py:36`.
- Case-insensitive, comma-inverting name normalization — documented at
  `builder/lookup_utils.py:7,23` ("Disease, Familial" == "Familial Disease").
- Punctuation strip + tokenize + domain stoplist — `builder/chemotext2.py:17-42`.

All functions are pure and vectorization-friendly; the hot paths call them on
whole columns (pandas/pyarrow), never row-by-row from the driver.
"""

from __future__ import annotations

import re

# `builder/chemotext2.py:35` strips "()-,;./" before splitting.
_PUNCT_RE = re.compile(r"[()\-,;./]")
_WS_RE = re.compile(r"\s+")

# 56-term domain stoplist analog (`builder/chemotext2.py:17-25`): tiny
# deterministic stoplist for phrase generation.
PHRASE_STOPLIST = frozenset(
    """disease syndrome disorder deficiency type acid chronic acute severe
    familial juvenile adult onset related associated virus infection agent
    receptor factor protein gene human alpha beta gamma delta anti agonist
    antagonist inhibitor induced dependent form variant classic primary
    secondary congenital hereditary idiopathic malignant benign recessive
    dominant linked early late stage group complex system cell tissue
    """.split()
)


def get_curie_prefix(identifier: str) -> str:
    """Prefix of a CURIE (``MONDO:0005136`` -> ``MONDO``); '' if no colon."""
    i = identifier.find(":")
    return identifier[:i] if i >= 0 else ""


def un_curie(identifier: str) -> str:
    """Suffix of a CURIE (``MESH:C032942`` -> ``C032942``)."""
    i = identifier.find(":")
    return identifier[i + 1 :] if i >= 0 else identifier


def sanitize_predicate_label(pred_id: str) -> str:
    """``:`` -> ``_`` so the predicate is a legal relationship label
    (`builder/builder.py:36`)."""
    return pred_id.replace(":", "_")


def normalize_name(name: str) -> str:
    """Case-insensitive, comma-inverting surface normalization.

    ``"Asthma, Allergic"`` -> ``"allergic asthma"`` — reference behavior
    described at `builder/lookup_utils.py:7,23`. Whitespace collapsed.
    """
    s = name.strip()
    if ", " in s:
        head, _, tail = s.partition(", ")
        s = f"{tail} {head}"
    return _WS_RE.sub(" ", s).lower().strip()


def generate_phrases(label: str) -> list[str]:
    """Phrase generation per `builder/chemotext2.py:30-42`: strip punctuation,
    whitespace-split; a single word maps to itself; otherwise keep words of
    length > 2 that are not in the stoplist."""
    cleaned = _PUNCT_RE.sub(" ", label)
    words = [w for w in _WS_RE.split(cleaned) if w]
    if len(words) <= 1:
        return words
    return [w for w in words if len(w) > 2 and w.lower() not in PHRASE_STOPLIST]


def pair_key(id_a: str, id_b: str) -> tuple[str, str]:
    """Canonical unordered pair (min, max) — symmetric pair identity per
    `builder/builder.py:367-369` / `builder/cdw.py:53-62`."""
    return (id_a, id_b) if id_a <= id_b else (id_b, id_a)
