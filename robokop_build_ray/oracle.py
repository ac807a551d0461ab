"""Pure-Python single-process oracle with reference semantics (SURVEY §5).

Independent re-implementation of the five pipeline stages — sentence parsing
here deliberately does NOT share code with the Ray extractor (string split vs
compiled regex) so tests compare two implementations, not one with itself.

Semantics mirrored from the reference:
- extraction = the op fan-out (`builder/builder.py:120-127`): one triple per
  "<A> <pred phrase> <B>." sentence;
- linking = name->CURIE union over all matching dictionary entries
  (`builder/lookup_utils.py:50-77`), case-insensitive + comma-inverting;
- canonicalization = synonym-closure merge (`builder/builder.py:136-167,
  249-264`) made deterministic: canonical id = min primary CURIE of the
  connected component (SURVEY §7.4.1);
- edge dedup by (subj, obj, source[, pred]) (`builder/builder.py:216-226`),
  publications list capped at 10_000 (`builder/chemotext.py:42,53`);
- support = per-conversation co-occurrence with 2x2 Yates chi-square and
  small-count suppression c < 11 (`builder/cdw.py:59,94-98`,
  `CDW/CooccurChi2.ipynb` cells 2-5).
"""

from __future__ import annotations

import math
import re
from collections import defaultdict

import pyarrow as pa

from .functions.text import normalize_name, sanitize_predicate_label
from .gazetteer import Entity, build_bridges, build_lexicon_rows, canonical_map
from .textgen import PHRASE_TO_PRED, PRED_PHRASES_ORDERED

EDGE_SOURCE = "extractor.triple_pattern"
SUPPORT_SOURCE = "cooccur.term_to_term"
PUBLICATION_CAP = 10_000
SUPPRESS_BELOW = 11


def parse_turn(text: str) -> list[tuple[str, str, str]]:
    """(subj_surface, pred, obj_surface) per sentence — split-based parser."""
    out = []
    for sent in re.split(r"[.?]", text):
        sent = sent.strip()
        if not sent:
            continue
        for phrase in PRED_PHRASES_ORDERED:
            mid = f" {phrase} "
            if mid in sent:
                subj, _, obj = sent.partition(mid)
                if subj and obj:
                    out.append((subj.strip(), PHRASE_TO_PRED[phrase], obj.strip()))
                break
    return out


def extract(transcripts: pa.Table) -> list[tuple[str, int, str, str, str]]:
    rows = []
    for cid, tix, text in zip(
        transcripts["conv_id"].to_pylist(),
        transcripts["turn_idx"].to_pylist(),
        transcripts["text"].to_pylist(),
    ):
        for s, p, o in parse_turn(text):
            rows.append((cid, tix, s, p, o))
    rows.sort()
    return rows


class OracleKG:
    """Full five-stage oracle over a transcript table + entity universe."""

    def __init__(self, ents: list[Entity]):
        self.ents = ents
        self.by_curie = {e.curie: e for e in ents}
        self.lexicon: dict[str, list[tuple[str, str]]] = defaultdict(list)
        for surf, curie, ntype in build_lexicon_rows(ents):
            self.lexicon[surf].append((curie, ntype))
        self.canon = canonical_map(ents, build_bridges(ents))

    def link(self, raw: list[tuple[str, int, str, str, str]]):
        """-> (conv_id, turn_idx, subj_id, pred_id, obj_id) with all-match
        union semantics; unlinked mentions dropped (reference logs the miss
        and returns nothing, `builder/lookup_utils.py:10-12`)."""
        out = []
        for cid, tix, s, p, o in raw:
            subs = self.lexicon.get(normalize_name(s), [])
            objs = self.lexicon.get(normalize_name(o), [])
            for sc, _ in subs:
                for oc, _ in objs:
                    out.append((cid, tix, sc, f"PRED:{p}", oc))
        return sorted(out)

    def canonical_triples(self, linked):
        return sorted(
            (cid, tix, self.canon[s], p, self.canon[o]) for cid, tix, s, p, o in linked
        )

    def nodes(self, canonical):
        """id, name, node_type, equivalent_identifiers (sorted) — per
        `builder/builder.py:76-96` with synonym-sort determinism."""
        members: dict[str, set[str]] = defaultdict(set)
        for e in self.ents:
            members[self.canon[e.curie]].add(e.curie)
        used = set()
        for _, _, s, _, o in canonical:
            used.add(s)
            used.add(o)
        rows = []
        for canon_id in sorted(used):
            eq: set[str] = set()
            for m in members[canon_id]:
                eq.add(m)
                eq.update(self.by_curie[m].synonyms)
            rep = self.by_curie[canon_id]
            rows.append((canon_id, rep.name, rep.node_type, sorted(eq)))
        return rows

    def edges(self, canonical):
        """Dedup by (subj, pred, obj, source); publications = sorted distinct
        provenance strings capped at PUBLICATION_CAP."""
        pubs: dict[tuple[str, str, str], set[str]] = defaultdict(set)
        n: dict[tuple[str, str, str], int] = defaultdict(int)
        for cid, tix, s, p, o in canonical:
            key = (s, p, o)
            pubs[key].add(f"CONV:{cid}#{tix}")
            n[key] += 1
        return [
            (
                s,
                p,
                sanitize_predicate_label(p),
                o,
                EDGE_SOURCE,
                sorted(pubs[(s, p, o)])[:PUBLICATION_CAP],
                n[(s, p, o)],
                False,
            )
            for (s, p, o) in sorted(pubs)
        ]

    def support(self, canonical, n_conversations: int):
        """id_a,id_b,c1,c2,c,expected,chi2,p,suppressed over per-conversation
        entity pairs."""
        ents_by_conv: dict[str, set[str]] = defaultdict(set)
        for cid, _, s, _, o in canonical:
            ents_by_conv[cid].update((s, o))
        marg: dict[str, int] = defaultdict(int)
        joint: dict[tuple[str, str], int] = defaultdict(int)
        for ids in ents_by_conv.values():
            sids = sorted(ids)
            for e in sids:
                marg[e] += 1
            for i in range(len(sids)):
                for j in range(i + 1, len(sids)):
                    joint[(sids[i], sids[j])] += 1
        N = n_conversations
        rows = []
        for (a, b), c in sorted(joint.items()):
            c1, c2 = marg[a], marg[b]
            rows.append((a, b, c1, c2, c, *chi2_yates(c, c1, c2, N), c < SUPPRESS_BELOW))
        return rows


def chi2_yates(c: int, c1: int, c2: int, n: int) -> tuple[float, float, float]:
    """(expected, chi2, p) for the 2x2 table [[c, c1-c],[c2-c, n-c1-c2+c]]
    with Yates continuity correction (scipy.chi2_contingency default used by
    `CDW/CooccurChi2.ipynb`); p via the df=1 closed form erfc(sqrt(x/2))."""
    expected = c1 * c2 / n
    denom = c1 * c2 * (n - c1) * (n - c2)
    if denom <= 0:
        return expected, 0.0, 1.0
    o11, o12, o21, o22 = c, c1 - c, c2 - c, n - c1 - c2 + c
    num = max(0.0, abs(o11 * o22 - o12 * o21) - n / 2.0)
    chi2 = n * num * num / denom
    return expected, chi2, math.erfc(math.sqrt(chi2 / 2.0))
