"""Supporter plugin registry (reference user-extension surface, SURVEY §2.10).

The reference loads support modules by name (`-s name` ->
``import_module(name).get_supporter(core)``, `builder/builder.py:320-323,
567-571`) with the contract ``prepare(nodes)`` + ``term_to_term(a, b) ->
KEdge | None``. Here a supporter is a named factory that turns the candidate
pair table (per-conversation co-occurring entity pairs) into a support-edge
table; each runs as an actor-pool ``map_batches`` stage.

Built-ins:
- ``cooccur``    — chi-square conversation co-occurrence (`builder/cdw.py`
                   semantics; the full stats pipeline lives in
                   ``stages.support``)
- ``phrase_sim`` — name-phrase similarity (the chemotext2 analog,
                   `builder/chemotext2.py:30-66`): max Jaccard over
                   ``generate_phrases`` of the two entity names, with the
                   argmax phrase pair carried in properties (A6 semantics).
- ``shared_pubs`` — per-pair shared provenance lists (the omnicorp/chemotext
                   analog, `builder/omnicorp.py:14-32` +
                   `builder/chemotext.py:48-61` LIMIT-10000 accumulation).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
import pyarrow as pa
import ray

from ..functions.text import generate_phrases

PHRASE_SIM_SOURCE = "phrase_sim.term_to_term"

PHRASE_SIM_SCHEMA = pa.schema(
    [
        ("id_a", pa.string()),
        ("id_b", pa.string()),
        ("similarity", pa.float64()),
        ("term_a", pa.string()),
        ("term_b", pa.string()),
        ("edge_source", pa.string()),
        ("is_support", pa.bool_()),
    ]
)


class PhraseSimScorer:
    """prepare() analog: node name dict broadcast once; term_to_term analog:
    per-pair max TOKEN-set Jaccard over generated phrase sets (the chemotext2
    semantics — "dog park" vs "grok pad" share zero tokens and score 0, where
    character-set Jaccard would spuriously score them ~1)."""

    def __init__(self, names_ref):
        self.names: dict[str, str] = ray.get(names_ref)
        # per-actor cache: node -> [(phrase, frozenset(tokens))]
        self._phrases: dict[str, list[tuple[str, frozenset]]] = {}

    def phrases(self, node_id: str) -> list[tuple[str, frozenset]]:
        ph = self._phrases.get(node_id)
        if ph is None:
            ph = [(p, frozenset(p.lower().split()))
                  for p in generate_phrases(self.names.get(node_id, node_id))]
            self._phrases[node_id] = ph
        return ph

    @staticmethod
    def _sim(A: frozenset, B: frozenset) -> float:
        if not A or not B:
            return 0.0
        inter = len(A & B)
        if inter == 0:
            return 0.0
        return inter / (len(A) + len(B) - inter)

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        ids_a, ids_b, sims, terms_a, terms_b = [], [], [], [], []
        for a, b in zip(batch["id_a"], batch["id_b"]):
            best, best_pair = -1.0, ("", "")
            for pa_, ta in self.phrases(a):
                for pb, tb in self.phrases(b):
                    s = self._sim(ta, tb)
                    if s > best:
                        best, best_pair = s, (pa_, pb)
                if best == 1.0:
                    break  # token sets can't beat exact overlap
            if best <= 0.0:
                continue  # term_to_term -> None (no edge)
            ids_a.append(a)
            ids_b.append(b)
            sims.append(best)
            terms_a.append(best_pair[0])
            terms_b.append(best_pair[1])
        n = len(ids_a)
        return pa.table(
            {
                "id_a": pa.array(ids_a, pa.string()),
                "id_b": pa.array(ids_b, pa.string()),
                "similarity": pa.array(sims, pa.float64()),
                "term_a": pa.array(terms_a, pa.string()),
                "term_b": pa.array(terms_b, pa.string()),
                "edge_source": pa.array([PHRASE_SIM_SOURCE] * n, pa.string()),
                "is_support": pa.array([True] * n, pa.bool_()),
            },
            schema=PHRASE_SIM_SCHEMA,
        )


def phrase_sim_supporter(pairs, nodeinfo_ref, concurrency=(1, 4),
                         batch_size: int = 8192):
    """pairs Dataset (id_a, id_b, ...) -> phrase-similarity support edges."""
    info = ray.get(nodeinfo_ref)
    names = {k: v[0] for k, v in info.items()}
    names_ref = ray.put(names)
    return pairs.map_batches(
        PhraseSimScorer,
        fn_constructor_args=(names_ref,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


# registry: name -> factory(graph_ctx) -> Dataset of support edges.
# graph_ctx carries {"pairs", "canonical", "n_conversations", "state"}.
SUPPORTERS: dict[str, Callable] = {}


def register(name: str):
    def deco(fn):
        SUPPORTERS[name] = fn
        return fn

    return deco


@register("cooccur")
def _cooccur(ctx):
    from .support import support_stage

    return support_stage(ctx["canonical"], ctx["n_conversations"],
                         ctx.get("max_entities_per_conv", 256))


@register("phrase_sim")
def _phrase_sim(ctx):
    return phrase_sim_supporter(ctx["pairs"], ctx["state"].nodeinfo_ref)


@register("shared_pubs")
def _shared_pubs(ctx):
    """omnicorp/chemotext analog: per-pair shared provenance lists
    (`builder/omnicorp.py:14-32`, `builder/chemotext.py:48-61`)."""
    from .support import shared_publications_stage

    return shared_publications_stage(
        ctx["canonical"], ctx.get("max_entities_per_conv", 256)
    )


class StaticCountScorer:
    """T4 analog: precomputed count dicts loaded once per actor; per-pair
    left-outer lookup with the absent-pair fallback (`builder/cdw.py:92-100`):
    absent -> c=0, suppressed, expected = c1*c2/N."""

    def __init__(self, counts_ref):
        import ray as _ray

        c = _ray.get(counts_ref)
        self.total: int = c["total"]
        self.marginals: dict[str, int] = c["marginals"]
        self.pairs: dict[tuple[str, str], int] = c["pairs"]

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        import numpy as np

        from .support import SUPPORT_SCHEMA, SUPPRESS_BELOW, chi2_yates_vec

        if len(batch) == 0:
            return SUPPORT_SCHEMA.empty_table()
        ids_a = batch["id_a"].to_numpy()
        ids_b = batch["id_b"].to_numpy()
        c1 = np.array([self.marginals.get(a, 0) for a in ids_a], dtype=np.int64)
        c2 = np.array([self.marginals.get(b, 0) for b in ids_b], dtype=np.int64)
        c = np.array(
            [self.pairs.get((a, b) if a <= b else (b, a), 0)
             for a, b in zip(ids_a, ids_b)],
            dtype=np.int64,
        )
        expected, chi2, p = chi2_yates_vec(c, c1, c2, self.total)
        return pa.table(
            {
                "id_a": pa.array(ids_a, pa.string()),
                "id_b": pa.array(ids_b, pa.string()),
                "c1": pa.array(c1, pa.int64()),
                "c2": pa.array(c2, pa.int64()),
                "c": pa.array(c, pa.int64()),
                "expected": pa.array(expected, pa.float64()),
                "chi2": pa.array(chi2, pa.float64()),
                "p": pa.array(p, pa.float64()),
                "suppressed": pa.array(c < SUPPRESS_BELOW),
            },
            schema=SUPPORT_SCHEMA,
        )


def static_counts_supporter(pairs, counts_ref, concurrency=(1, 4),
                            batch_size: int = 65_536):
    return pairs.map_batches(
        StaticCountScorer,
        fn_constructor_args=(counts_ref,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


@register("static_counts")
def _static_counts(ctx):
    """Requires ctx['state'].extras['counts_ref'] (see
    sources.count_tables.read_count_tables)."""
    return static_counts_supporter(ctx["pairs"], ctx["state"].extras["counts_ref"])


EMBEDDING_SIM_SOURCE = "embedding_sim.term_to_term"

EMBEDDING_SIM_SCHEMA = pa.schema(
    [
        ("id_a", pa.string()),
        ("id_b", pa.string()),
        ("similarity", pa.float64()),
        ("edge_source", pa.string()),
        ("is_support", pa.bool_()),
    ]
)


class EmbeddingSimScorer:
    """chemotext2's ACTUAL semantics (`builder/chemotext2.py:14-66` scores
    pairs through a word2vec similarity service): candidate pairs scored
    by cosine of the TRAINED SGNS graph embeddings — closing the T3
    phrase-Jaccard stand-in's documented deviation with real
    representation learning.

    Embedding matrix is entity-bounded, broadcast once (``ray.put`` in the
    factory, ``ray.get`` in ``__init__``), looked up vectorized per batch.
    A pair whose endpoint has no embedding (entity absent from the walk
    graph, e.g. self-loop-only) yields no edge (``term_to_term -> None``).
    Cosine is computed from the QUANTIZED int64 coordinates: exact int64
    dot products, then ONE double expression
    ``sab / sqrt(saa * sbb)`` — IEEE-deterministic, so the DuckDB oracle
    reproduces every value bit-for-bit."""

    def __init__(self, emb_ref):
        import numpy as np

        ids, M = ray.get(emb_ref)
        self.pos = {i: k for k, i in enumerate(ids)}
        self.M = M  # int64 (n, DIM) quantized center embeddings
        self.n2 = (M * M).sum(axis=1)  # int64 exact squared norms

    def __call__(self, batch: pd.DataFrame) -> pa.Table:
        import numpy as np

        if len(batch) == 0:
            return EMBEDDING_SIM_SCHEMA.empty_table()
        ia = batch["id_a"].map(self.pos)
        ib = batch["id_b"].map(self.pos)
        ok = ia.notna().to_numpy() & ib.notna().to_numpy()
        if not ok.any():
            return EMBEDDING_SIM_SCHEMA.empty_table()
        ca = ia.to_numpy()[ok].astype(np.int64)
        cb = ib.to_numpy()[ok].astype(np.int64)
        A, B = self.M[ca], self.M[cb]
        sab = (A * B).sum(axis=1)  # int64 exact
        saa, sbb = self.n2[ca], self.n2[cb]
        nz = (saa > 0) & (sbb > 0)  # zero vector -> no edge (oracle mirror)
        sim = (sab[nz].astype(np.float64)
               / np.sqrt(saa[nz].astype(np.float64)
                         * sbb[nz].astype(np.float64)))
        n = int(nz.sum())
        return pa.table(
            {
                "id_a": pa.array(
                    batch["id_a"].to_numpy()[ok][nz], pa.string()),
                "id_b": pa.array(
                    batch["id_b"].to_numpy()[ok][nz], pa.string()),
                "similarity": pa.array(sim, pa.float64()),
                "edge_source": pa.array([EMBEDDING_SIM_SOURCE] * n,
                                        pa.string()),
                "is_support": pa.array([True] * n, pa.bool_()),
            },
            schema=EMBEDDING_SIM_SCHEMA,
        )


def embedding_sim_supporter(pairs, emb_ref, concurrency=(1, 4),
                            batch_size: int = 65_536):
    """pairs Dataset (id_a, id_b, ...) -> embedding-cosine support edges."""
    return pairs.map_batches(
        EmbeddingSimScorer,
        fn_constructor_args=(emb_ref,),
        batch_format="pandas",
        batch_size=batch_size,
        concurrency=concurrency,
    )


@register("embedding_sim")
def _embedding_sim(ctx):
    """Train SGNS over the canonical graph's walk corpus (undirected_pairs
    dedups, so canonical mentions and the distinct edge table induce the
    SAME simple graph), collect the entity-bounded quantized embedding
    table once, broadcast, and score the candidate pairs."""
    import numpy as np

    from .embedding_train import DIM, sgns_embeddings

    rows = sgns_embeddings(ctx["canonical"]).take_all()  # entity-bounded
    ids = [r["id"] for r in rows]
    M = (np.array([[r[f"e{j}_q"] for j in range(DIM)] for r in rows],
                  dtype=np.int64)
         if rows else np.zeros((0, DIM), dtype=np.int64))
    return embedding_sim_supporter(ctx["pairs"], ray.put((ids, M)))


def get_supporter(name: str) -> Callable:
    """import-by-name analog of `builder/builder.py:322` (KeyError on
    unknown, mirroring the reference's ImportError)."""
    return SUPPORTERS[name]
