"""Text-analysis operators over the ``documents`` table (training-data ops).

Beyond-reference operators a large-scale training-data pipeline needs:
token counting, quality scoring, language-ID heuristic, content
fingerprinting. All are stateless-or-actor ``map_batches`` stages with
vectorized pandas/pyarrow bodies; every formula is deliberately expressible
in DuckDB SQL so the driver's oracle can verify values exactly.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd

TOKEN_RE = r"\S+"
STOPWORDS_RE = r"\b(the|and|of|to|in|is|a)\b"

# language marker word sets for the n-gram/stopword language-ID heuristic;
# scored by marker-hit counts, argmax with fixed priority tiebreak.
LANG_MARKERS: list[tuple[str, str]] = [
    ("en", r"\b(the|and|of|is|was)\b"),
    ("de", r"\b(der|die|und|ist|nicht)\b"),
    ("es", r"\b(el|los|las|es|y)\b"),
    ("fr", r"\b(le|la|les|et|est)\b"),
    ("zh", r"[一-鿿]"),
]


def token_stats_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_tokens (whitespace tokens), n_chars (codepoints)."""
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": batch["text"].str.count(TOKEN_RE).astype("int64"),
            "n_chars": batch["text"].str.len().astype("int64"),
        }
    )


def quality_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Length / stopword-ratio quality score (heuristic quality filter)."""
    text = batch["text"]
    n_tokens = text.str.count(TOKEN_RE).astype("int64")
    n_stop = text.str.lower().str.count(STOPWORDS_RE).astype("int64")
    stop_ratio = (1.0 * n_stop / n_tokens.clip(lower=1)).astype("float64")
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "stop_ratio": stop_ratio,
            "is_quality": (n_tokens >= 5) & (n_tokens <= 100_000) & (stop_ratio > 0.0),
        }
    )


class LangId:
    """Actor-pool language-ID: regexes compiled once per actor, applied
    vectorized per batch; argmax over marker-hit counts with fixed
    en>de>es>fr>zh priority on ties."""

    def __init__(self):
        self.markers = [(lang, re.compile(pat)) for lang, pat in LANG_MARKERS]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        low = batch["text"].str.lower()
        scores = [low.str.count(pat.pattern).astype("int64") for _, pat in self.markers]
        best = scores[0].copy()
        pred = pd.Series(self.markers[0][0], index=batch.index)
        for (lang, _), s in zip(self.markers[1:], scores[1:]):
            mask = s > best  # strict: earlier langs win ties
            pred = pred.mask(mask, lang)
            best = best.mask(mask, s)
        return pd.DataFrame({"doc_id": batch["doc_id"], "pred_lang": pred})


class LangIdConfusion(LangId):
    """Eval confusion partials: (gold lang, predicted lang, n) per batch —
    the model-evaluation counterpart of :class:`LangId`. Output is
    enum-bounded (|langs|^2 rows per batch), so the final fold is a
    single-block merge, never a shuffle."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        pred = super().__call__(batch)["pred_lang"]
        df = pd.DataFrame({"lang": batch["lang"].to_numpy(),
                           "pred_lang": pred.to_numpy()})
        return (df.groupby(["lang", "pred_lang"], sort=False).size()
                .rename("n").reset_index())


def langid_confusion(docs, batch_size: int = 4096, concurrency=(1, 2)):
    parts = docs.map_batches(LangIdConfusion, batch_format="pandas",
                             batch_size=batch_size, concurrency=concurrency)
    return (parts.repartition(1)
            .map_batches(
                lambda b: b.groupby(["lang", "pred_lang"], sort=False,
                                    as_index=False)["n"].sum(),
                batch_format="pandas", batch_size=None))


def resolve_parity(parity: bool | None) -> bool:
    """Oracle-parity mode: hash with md5 (byte-verifiable by DuckDB's
    ``md5()``, a per-value Python loop) instead of the default vectorized
    ``pd.util.hash_array`` siphash (one C call per batch — the pattern
    measured 108x in bucketing.py). ``None`` defers to the
    ``GRAFT_ORACLE_PARITY`` env var; the driver-checked queries that expose
    hash VALUES in their output pass ``parity=True`` explicitly."""
    if parity is None:
        import os

        return os.environ.get("GRAFT_ORACLE_PARITY", "") == "1"
    return parity


def fingerprint_batch(batch: pd.DataFrame,
                      parity: bool | None = None) -> pd.DataFrame:
    """Content fingerprint of lower(trim(text)). Default: one vectorized
    siphash call per batch (int64 fingerprints). Parity mode: md5 hex so
    DuckDB's ``md5()`` verifies byte-for-byte (see :func:`resolve_parity`)."""
    norm = batch["text"].str.strip().str.lower()
    if resolve_parity(parity):
        fp = [hashlib.md5(t.encode()).hexdigest() for t in norm]
        return pd.DataFrame({"doc_id": batch["doc_id"], "fingerprint": fp})
    h = pd.util.hash_array(norm.to_numpy(dtype=object)).view(np.int64)
    return pd.DataFrame({"doc_id": batch["doc_id"],
                         "fingerprint": pd.Series(h, index=batch.index)})


def window_strings(texts, window: int, min_one: bool = True):
    """Flatten token windows for a batch: (grams list, per-doc counts).
    ``min_one`` emits the whole-doc join for short docs (fingerprint
    semantics); otherwise short docs emit zero windows (Lee-et-al
    duplicate-span semantics)."""
    grams: list[str] = []
    counts = np.empty(len(texts), dtype=np.int64)
    for i, text in enumerate(texts):
        toks = text.lower().split()
        if len(toks) < window:
            g = [" ".join(toks)] if min_one else []
        else:
            g = [" ".join(toks[j:j + window])
                 for j in range(len(toks) - window + 1)]
        grams.extend(g)
        counts[i] = len(g)
    return grams, counts


# polynomial base for the numeric rolling window hash (FNV-1a prime);
# fast-path-internal — the oracle-checked parity mode is md5 windows
_ROLL_BASE = 1099511628211


def window_hashes_numeric(texts, window: int):
    """ALL token-window hashes for a batch, numerically: hash each token
    once (one vectorized siphash call), window hash = polynomial
    combination over token hashes (uint64 wrap) — no window strings.
    ``min_one=False`` semantics of :func:`window_strings`: docs shorter
    than ``window`` emit zero windows. Returns (uint64 flat hash array in
    doc order, int64 per-doc window counts). Values are consistent ACROSS
    docs (same token sequence -> same hash), which is what gram-grain
    exchanges key on; only the md5 parity tier is oracle-visible."""
    tok_lists = [t.lower().split() for t in texts]
    lens = np.fromiter((len(t) for t in tok_lists), np.int64,
                       len(tok_lists))
    counts = np.maximum(lens - window + 1, 0)
    flat = [w for t in tok_lists for w in t]
    if not flat or counts.sum() == 0:
        return np.array([], dtype=np.uint64), counts
    th = pd.util.hash_array(np.asarray(flat, dtype=object))
    pows = np.array([pow(_ROLL_BASE, j, 1 << 64) for j in range(window)],
                    dtype=np.uint64)
    L = len(th) - window + 1
    acc = np.zeros(L, dtype=np.uint64)
    for j in range(window):
        acc += th[j:j + L] * pows[j]
    ends = np.cumsum(lens)
    starts = ends - lens
    m = counts > 0
    reps = counts[m]
    base = np.repeat(starts[m], reps)
    intra = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
        np.cumsum(reps) - reps, reps)
    return acc[base + intra], counts


def rolling_fingerprints_batch(batch: pd.DataFrame, window: int = 8,
                               parity: bool | None = None) -> pd.DataFrame:
    """Winnowing-style document fingerprint: min hash over token windows.
    Default: ONE vectorized siphash call over every window in the batch +
    per-doc ``np.minimum.reduceat`` (int64 values). Parity mode:
    lexicographic min of md5 hex, byte-verifiable by DuckDB."""
    if resolve_parity(parity):
        out_ids, out_fp = [], []
        for did, text in zip(batch["doc_id"], batch["text"]):
            toks = text.lower().split()
            if len(toks) < window:
                wins = [" ".join(toks)]
            else:
                wins = [" ".join(toks[i : i + window])
                        for i in range(len(toks) - window + 1)]
            out_ids.append(did)
            out_fp.append(min(hashlib.md5(w.encode()).hexdigest()
                              for w in wins))
        return pd.DataFrame({"doc_id": out_ids, "rolling_fp": out_fp})
    if len(batch) == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "rolling_fp": pd.Series([], dtype="int64")})
    # numeric rolling hash: hash each TOKEN once (one vectorized siphash
    # call), then window hash = polynomial combination of token hashes
    # (uint64 wrap) via `window` shifted vector adds — building the
    # O(tokens x window) window STRINGS was the measured bottleneck
    # (4.3x: 19k -> 82k docs/s per core at 60-token docs), not hashing
    tok_lists = [t.lower().split() for t in batch["text"]]
    counts = np.fromiter((max(1, len(t)) for t in tok_lists), np.int64,
                         len(tok_lists))
    flat: list[str] = []
    for t in tok_lists:
        flat.extend(t if t else [""])  # empty doc: one empty-token window
    th = pd.util.hash_array(np.asarray(flat, dtype=object))
    ends = np.cumsum(counts)
    starts = ends - counts
    pows = np.array([pow(_ROLL_BASE, j, 1 << 64) for j in range(window)],
                    dtype=np.uint64)
    L = len(th) - window + 1
    if L > 0:
        acc = np.zeros(L, dtype=np.uint64)
        for j in range(window):
            acc += th[j:j + L] * pows[j]
    mins = np.empty(len(batch), dtype=np.uint64)
    for i in range(len(batch)):  # O(docs) slice-mins over vector work
        s, e = starts[i], ends[i]
        if counts[i] >= window:
            mins[i] = acc[s:e - window + 1].min()
        else:  # short doc: one whole-doc polynomial hash
            mins[i] = np.uint64(
                (th[s:e] * pows[: e - s]).sum(dtype=np.uint64))
    return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                         "rolling_fp": mins.view(np.int64)})


def rolling_fingerprints(docs, window: int = 8, batch_size: int = 4096,
                         parity: bool | None = None):
    return docs.map_batches(
        lambda b: rolling_fingerprints_batch(b, window, parity),
        batch_format="pandas", batch_size=batch_size,
    )


# BPE-ish pretokenizer (GPT-2-style contraction/word/number/punct pieces,
# simplified to what DuckDB's regex engine can mirror exactly)
BPE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+"

# PII patterns for redaction (emails, international-ish phone numbers,
# 16-digit card-like numbers) — the standard scrub pass a training-data
# pipeline runs before anything else sees the text
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\+?[0-9][0-9()\- ]{7,}[0-9]", "<PHONE>"),
]


def bpe_token_stats_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, n_bpe_tokens — subword-style piece count via the BPE-ish
    pretokenizer regex (vectorized str.count)."""
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_bpe_tokens": batch["text"].str.count(BPE_RE).astype("int64"),
        }
    )


class PiiRedactor:
    """Actor-pool scrub stage: patterns compiled once per actor, applied
    vectorized (`str.replace`) per batch; emits the redacted text plus a
    per-doc count of redactions (audit trail)."""

    def __init__(self):
        self.patterns = [(re.compile(p), repl) for p, repl in PII_PATTERNS]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        n_hits = pd.Series(0, index=batch.index, dtype="int64")
        for pat, repl in self.patterns:
            n_hits += text.str.count(pat.pattern).astype("int64")
            text = text.str.replace(pat.pattern, repl, regex=True)
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "text_redacted": text,
                "n_redactions": n_hits,
            }
        )


# Blocklist scan (C4 §2.2 "bad word" filter shape, Raffel et al. 2020):
# SPEC literal substrings, case-insensitive on the lowercased text,
# non-overlapping occurrence counts (== SQL replace()-length counting).
# The list is a SPEC constant like SPLIT_THRESHOLDS: changing it changes
# the published decision, so it is shared verbatim with the SQL oracle.
BLOCKLIST_PATTERNS: tuple[str, ...] = (
    "hash value", "big big", "value table", "spark a",
    "window window", "merge batch", "drop table",
)


class BlocklistScanner:
    """Actor-pool curation stage: the pattern set is bound once per actor
    (``fn_constructor_kwargs``), each pattern counted with one vectorized
    C-speed pass over the batch (`str.count` on the escaped literal).
    Zero shuffles; the doc stream never leaves its shard. For pattern
    sets far beyond SPEC size (10^4+, e.g. URL blocklists) the upgrade
    path is an Aho-Corasick automaton built in ``__init__`` — same actor
    signature, one text pass total; per-pattern vectorized passes win at
    the tens-of-patterns scale used here."""

    def __init__(self, patterns: tuple[str, ...] = None):
        pats = BLOCKLIST_PATTERNS if patterns is None else patterns
        self.patterns = [(p, re.compile(re.escape(p))) for p in pats]

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        low = batch["text"].str.lower()
        total = pd.Series(0, index=batch.index, dtype="int64")
        npat = pd.Series(0, index=batch.index, dtype="int64")
        for _, rx in self.patterns:
            c = low.str.count(rx).astype("int64")
            total += c
            npat += (c > 0).astype("int64")
        return pd.DataFrame(
            {
                "doc_id": batch["doc_id"],
                "n_patterns": npat,
                "hits_total": total,
                "blocked": (total > 0),
            }
        )


def blocklist_scan(docs, patterns: tuple[str, ...] = None,
                   batch_size: int = 4096, concurrency=(1, 2)):
    """doc_id, n_patterns, hits_total, blocked — per-doc blocklist audit
    (the flag plus the evidence counts a curation report needs)."""
    return docs.map_batches(
        BlocklistScanner, batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"patterns": patterns})


def sql_blocklist(patterns: tuple[str, ...] = None) -> str:
    """Oracle: per-pattern non-overlapping occurrence counts via the
    replace()-length identity, aggregated per doc."""
    pats = BLOCKLIST_PATTERNS if patterns is None else patterns
    values = ", ".join("('" + p.replace("'", "''") + "')" for p in pats)
    return f"""
WITH pats(pat) AS (VALUES {values}),
per AS (
  SELECT d.doc_id,
         CAST((length(lower(d.text))
               - length(replace(lower(d.text), p.pat, '')))
              // length(p.pat) AS BIGINT) AS c
  FROM documents d CROSS JOIN pats p
)
SELECT doc_id,
       CAST(count(*) FILTER (WHERE c > 0) AS BIGINT) AS n_patterns,
       CAST(sum(c) AS BIGINT) AS hits_total,
       sum(c) > 0 AS blocked
FROM per GROUP BY doc_id"""


def bpe_token_stats(docs, batch_size: int = 4096):
    return docs.map_batches(bpe_token_stats_batch, batch_format="pandas",
                            batch_size=batch_size)


def redact_pii(docs, batch_size: int = 4096, concurrency=(1, 2)):
    return docs.map_batches(PiiRedactor, batch_format="pandas",
                            batch_size=batch_size, concurrency=concurrency)


def token_stats(docs, batch_size: int = 4096):
    return docs.map_batches(token_stats_batch, batch_format="pandas",
                            batch_size=batch_size)


def quality(docs, batch_size: int = 4096):
    return docs.map_batches(quality_batch, batch_format="pandas",
                            batch_size=batch_size)


def langid(docs, batch_size: int = 4096, concurrency=(1, 2)):
    return docs.map_batches(LangId, batch_format="pandas",
                            batch_size=batch_size, concurrency=concurrency)


def fingerprints(docs, batch_size: int = 4096, parity: bool | None = None):
    return docs.map_batches(lambda b: fingerprint_batch(b, parity),
                            batch_format="pandas", batch_size=batch_size)


# train/val/test thresholds: exact 0.8 * 2^32 and 0.9 * 2^32 — SPEC
# constants shared with the oracle SQL (lowercase fixed-width hex compares
# lexicographically == numerically, so both sides test integers, no floats)
SPLIT_THRESHOLDS = (0xCCCCCCCC, 0xE6666666)


def split_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, lang, split — deterministic 80/10/10 train/val/test
    assignment from md5(doc_id). md5 (not Python ``hash``) keeps the
    assignment stable across worker processes, runs and cluster sizes, AND
    recomputable by DuckDB's ``md5()``; no shuffle, no stored split table —
    any stage can re-derive a doc's split locally (the property a 100 TB
    corpus needs: re-sharding never re-splits)."""
    import hashlib

    t_train, t_val = SPLIT_THRESHOLDS
    hs = np.fromiter(
        (int(hashlib.md5(str(d).encode()).hexdigest()[:8], 16)
         for d in batch["doc_id"]),
        dtype=np.uint64, count=len(batch),
    )
    split = np.where(hs < t_train, "train",
                     np.where(hs < t_val, "val", "test"))
    return pd.DataFrame({"doc_id": batch["doc_id"], "lang": batch["lang"],
                         "split": split})


def train_split(docs, batch_size: int = 4096):
    return docs.map_batches(split_batch, batch_format="pandas",
                            batch_size=batch_size)


def epoch_order_batch(batch: pd.DataFrame, n_epochs: int = 2) -> pd.DataFrame:
    """(epoch, doc_id, shuffle_key) for every doc x epoch — a
    deterministic GLOBAL training-order shuffle without a shuffle: the
    16-hex-char md5 key (fixed length, so lexicographic order IS numeric
    order) is a pure function of (doc_id, epoch). Consumers range-
    partition or sort by the key; no materialized permutation table, any
    node re-derives any doc's position locally, each epoch's order is
    independent of every other's. Flat-map grain change (docs ->
    docs x epochs)."""
    import hashlib

    n = len(batch)
    doc_ids = np.tile(batch["doc_id"].to_numpy(), n_epochs)
    epochs = np.repeat(np.arange(n_epochs, dtype=np.int64), n)
    keys = [hashlib.md5(f"{d}:epoch{e}".encode()).hexdigest()[:16]
            for d, e in zip(doc_ids, epochs)]
    return pd.DataFrame({
        "epoch": epochs,
        "doc_id": doc_ids.astype("int64"),
        "shuffle_key": keys,
    })


def epoch_order(docs, n_epochs: int = 2, batch_size: int = 4096):
    return docs.select_columns(["doc_id"]).map_batches(
        lambda b: epoch_order_batch(b, n_epochs),
        batch_format="pandas", batch_size=batch_size)


def sql_epoch_order(n_epochs: int = 2) -> str:
    return f"""
SELECT e.epoch, d.doc_id,
       substr(md5(CAST(d.doc_id AS VARCHAR) || ':epoch' ||
                  CAST(e.epoch AS VARCHAR)), 1, 16) AS shuffle_key
FROM documents d CROSS JOIN
     (SELECT unnest(range({n_epochs})) AS epoch) e"""


def mixture_rate_permille(source: str) -> int:
    """SPEC per-source keep rate (Pile/Dolma-style mixture weighting):
    ``srcN`` keeps ``980 - 35*N`` permille (980 down to 315) — a
    deterministic stand-in for the per-source weights a real corpus
    mixture config would supply."""
    return 980 - 35 * int(source[3:])


def _mixture_threshold_hex(rate_permille: int) -> str:
    """Keep iff the first 8 md5 hex chars of ``{doc_id}:mix`` compare
    below this threshold — the exact string DuckDB's md5() produces."""
    return format(rate_permille * 2**32 // 1000, "08x")


def mixture_sample_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """doc_id, source for the KEPT docs. Same scale properties as
    ``split_batch``: doc_id-keyed md5 (salted ':mix' so mixture and
    train/val/test decisions are independent), no shuffle, no stored
    decision table, stable across re-sharding; the keep rate is a pure
    function of the source column."""
    import hashlib

    pfx = [hashlib.md5(f"{d}:mix".encode()).hexdigest()[:8]
           for d in batch["doc_id"]]
    thr = {s: _mixture_threshold_hex(mixture_rate_permille(s))
           for s in batch["source"].unique()}
    keep = np.fromiter(
        (p < thr[s] for p, s in zip(pfx, batch["source"])),
        dtype=bool, count=len(batch),
    )
    out = batch.loc[keep, ["doc_id", "source"]].reset_index(drop=True)
    out["doc_id"] = out["doc_id"].astype("int64")
    return out


def mixture_sample(docs, batch_size: int = 4096):
    return docs.map_batches(mixture_sample_batch, batch_format="pandas",
                            batch_size=batch_size)


def sql_mixture_sample(n_sources: int = 20) -> str:
    cases = " ".join(
        f"WHEN 'src{i}' THEN '{_mixture_threshold_hex(mixture_rate_permille(f'src{i}'))}'"
        for i in range(n_sources)
    )
    return f"""
SELECT doc_id, source FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8) <
      CASE source {cases} END"""


PPS_TARGET_K = 50


def pps_sample(docs, k: int = PPS_TARGET_K, weight_col: str = "n_chars",
               batch_size: int = 4096):
    """Poisson probability-proportional-to-size sample (classic PPS /
    Hájek survey-sampling shape, the weighted counterpart of
    ``mixture_sample``): doc i is included iff

        md5_32(doc_id:pps) * W  <  k * w_i * 2^32

    i.e. with probability min(1, k * w_i / W) where W = sum of weights —
    expected sample size ~k, inclusion probability proportional to the
    doc's weight, heavy docs with k*w >= W always kept. The decision is
    an EXACT integer cross-multiplication (Python bigints / DuckDB
    HUGEINT), so there is no float anywhere — the deterministic-sampling
    family rule (split/mixture/epoch) extended to weighted draws.

    Scale shape: pass 1 is one streaming aggregate for the scalar W;
    pass 2 is a zero-shuffle filter map (W rides in the closure). The
    ':pps' salt keeps decisions independent of the split/mix/epoch
    hashes; re-sharding never changes the sample."""
    import hashlib

    W = int(docs.select_columns([weight_col]).sum(weight_col))

    def keep(batch: pd.DataFrame) -> pd.DataFrame:
        rhs_scale = k << 32
        m = np.fromiter(
            (int(hashlib.md5(f"{d}:pps".encode()).hexdigest()[:8], 16) * W
             < rhs_scale * int(w)
             for d, w in zip(batch["doc_id"], batch[weight_col])),
            dtype=bool, count=len(batch))
        out = batch.loc[m, ["doc_id", weight_col]].reset_index(drop=True)
        out["doc_id"] = out["doc_id"].astype("int64")
        out[weight_col] = out[weight_col].astype("int64")
        return out

    return docs.select_columns(["doc_id", weight_col]).map_batches(
        keep, batch_format="pandas", batch_size=batch_size)


def sql_pps_sample(k: int = PPS_TARGET_K) -> str:
    return f"""
WITH tot AS (SELECT CAST(sum(n_chars) AS HUGEINT) AS w_total
             FROM documents)
SELECT doc_id, n_chars FROM documents, tot
WHERE CAST(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':pps'),
                                1, 8)) AS UBIGINT) AS HUGEINT) * w_total
      < CAST({k} AS HUGEINT) * n_chars * 4294967296"""


def chunk_spans_batch(batch: pd.DataFrame,
                      chunk_tokens: int = 64) -> pd.DataFrame:
    """Context-window chunking -> (doc_id, chunk_idx, n_tokens): each
    doc's whitespace-token stream split into fixed-budget windows (the
    sequence-packing precursor every LM training pipeline runs). A
    flat-map shape — output grain is chunks, input grain docs — kept
    vectorized with np.repeat + offset arithmetic, no per-doc loop.
    Zero-token docs emit no chunk."""
    n = batch["text"].str.count(TOKEN_RE).to_numpy(dtype=np.int64)
    k = (n + chunk_tokens - 1) // chunk_tokens  # ceil, 0 for empty docs
    doc_ids = np.repeat(batch["doc_id"].to_numpy(), k)
    total = int(k.sum())
    if total == 0:
        return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                             "chunk_idx": pd.Series([], dtype="int64"),
                             "n_tokens": pd.Series([], dtype="int64")})
    # per-row 0..k_i-1 index: global arange minus each row's start offset
    starts = np.repeat(np.concatenate([[0], np.cumsum(k)[:-1]]), k)
    idx = np.arange(total, dtype=np.int64) - starts
    rem = np.repeat(n, k) - idx * chunk_tokens
    return pd.DataFrame({
        "doc_id": doc_ids,
        "chunk_idx": idx,
        "n_tokens": np.minimum(rem, chunk_tokens).astype(np.int64),
    })


def chunk_spans(docs, chunk_tokens: int = 64, batch_size: int = 4096):
    return docs.map_batches(
        lambda b: chunk_spans_batch(b, chunk_tokens),
        batch_format="pandas", batch_size=batch_size)


# alnum tokens, shared with stages.vocab (the bigram key is space-joined,
# tokens are space-free, so the key is unambiguous)
WORD_RE = r"[a-z0-9]+"


def repetition_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Within-document repetition metrics (Gopher-style quality rules,
    Rae et al. 2021 §A1.1 adapted to token n-grams):

    - ``top_bigram_frac`` — fraction of a doc's bigrams taken by its single
      most frequent bigram (high = boilerplate / TEMPLATED text),
    - ``dup_trigram_frac`` — fraction of a doc's trigrams that occur more
      than once within the doc (high = loops / repeated spans).

    Per-doc only (no shuffle): the whole batch's tokens are exploded ONCE,
    n-grams formed by adjacent-position masks, and per-(doc, gram) counts
    come from a single pandas groupby — no per-doc Python loop. Fractions
    are a single int/int division (bit-identical to the oracle); docs with
    too few tokens report 0 counts and 0.0 fractions."""
    pos = np.arange(len(batch))
    flat = (batch["text"].str.lower().str.findall(WORD_RE)
            .set_axis(pos).explode().dropna())
    idx = flat.index.to_numpy(dtype=np.int64)
    vals = flat.to_numpy(dtype=object)

    def gram_counts(k: int):
        """per-(doc-position, k-gram) counts as a MultiIndex Series."""
        if len(vals) < k:
            return None
        same = np.ones(len(vals) - (k - 1), dtype=bool)
        grams = vals[: len(vals) - k + 1].copy()
        for j in range(1, k):
            same &= idx[j: len(idx) - (k - 1) + j] == idx[: len(idx) - (k - 1)]
            grams = grams + " " + vals[j: len(vals) - (k - 1) + j]
        d = idx[: len(idx) - (k - 1)][same]
        if len(d) == 0:
            return None
        return (pd.DataFrame({"d": d, "g": grams[same]})
                .groupby(["d", "g"], sort=False).size())

    out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()})
    zeros = np.zeros(len(batch), dtype=np.int64)
    bg = gram_counts(2)
    if bg is None:
        top_c, n_bg = zeros, zeros
    else:
        per = bg.groupby(level=0)
        top_c = per.max().reindex(pos, fill_value=0).to_numpy(np.int64)
        n_bg = per.sum().reindex(pos, fill_value=0).to_numpy(np.int64)
    tg = gram_counts(3)
    if tg is None:
        dup_c, n_tg = zeros, zeros
    else:
        per3 = tg.groupby(level=0)
        n_tg = per3.sum().reindex(pos, fill_value=0).to_numpy(np.int64)
        dup = tg[tg > 1].groupby(level=0).sum()
        dup_c = dup.reindex(pos, fill_value=0).to_numpy(np.int64)
    out["n_bigrams"] = n_bg
    out["top_bigram_c"] = top_c
    out["top_bigram_frac"] = np.divide(
        top_c, n_bg, out=np.zeros(len(batch)), where=n_bg > 0)
    out["n_trigrams"] = n_tg
    out["dup_trigram_c"] = dup_c
    out["dup_trigram_frac"] = np.divide(
        dup_c, n_tg, out=np.zeros(len(batch)), where=n_tg > 0)
    return out


def repetition_stats(docs, batch_size: int = 4096):
    return docs.map_batches(repetition_batch, batch_format="pandas",
                            batch_size=batch_size)


def sql_repetition(table: str = "documents") -> str:
    """DuckDB oracle for :func:`repetition_stats` (same grams, same
    single-division fractions; SUM() is cast from HUGEINT to BIGINT)."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{WORD_RE}') AS tk
  FROM {table}
),
big AS (
  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                                       i -> tk[i] || ' ' || tk[i + 1])) AS g
  FROM toks
),
bc AS (SELECT doc_id, g, count(*) AS c FROM big GROUP BY doc_id, g),
bstat AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_c,
                 CAST(sum(c) AS BIGINT) AS n_bigrams
          FROM bc GROUP BY doc_id),
tri AS (
  SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
          i -> tk[i] || ' ' || tk[i + 1] || ' ' || tk[i + 2])) AS g
  FROM toks
),
tc AS (SELECT doc_id, g, count(*) AS c FROM tri GROUP BY doc_id, g),
tstat AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_trigrams,
                 CAST(coalesce(sum(c) FILTER (WHERE c > 1), 0) AS BIGINT)
                     AS dup_trigram_c
          FROM tc GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(b.n_bigrams, 0) AS n_bigrams,
       coalesce(b.top_bigram_c, 0) AS top_bigram_c,
       CASE WHEN coalesce(b.n_bigrams, 0) = 0 THEN 0.0
            ELSE CAST(b.top_bigram_c AS DOUBLE) / b.n_bigrams
       END AS top_bigram_frac,
       coalesce(t.n_trigrams, 0) AS n_trigrams,
       coalesce(t.dup_trigram_c, 0) AS dup_trigram_c,
       CASE WHEN coalesce(t.n_trigrams, 0) = 0 THEN 0.0
            ELSE CAST(t.dup_trigram_c AS DOUBLE) / t.n_trigrams
       END AS dup_trigram_frac
FROM {table} d
LEFT JOIN bstat b USING (doc_id)
LEFT JOIN tstat t USING (doc_id)"""


# sequence packing: tokens per training sequence + docs per packing shard.
# SPEC constants shared with the oracle SQL.
PACK_BUDGET = 256
PACK_SHARD_DOCS = 1000


def pack_batch(g: pd.DataFrame) -> pd.DataFrame:
    """One packing shard: docs in doc_id order, concatenated then cut
    every PACK_BUDGET tokens (GPT-style concat-and-chunk packing)."""
    g = g.sort_values("doc_id", kind="mergesort")
    n = g["n_tokens"].to_numpy(np.int64)
    cum = np.concatenate([[0], np.cumsum(n)[:-1]])
    return pd.DataFrame({
        "doc_id": g["doc_id"].to_numpy(np.int64),
        "shard": g["shard"].to_numpy(np.int64),
        "n_tokens": n,
        "offset": cum,
        "pack_first": cum // PACK_BUDGET,
        "pack_last": np.maximum(cum, cum + n - 1) // PACK_BUDGET,
    })


def pack_assignments(docs, batch_size: int = 4096, n_buckets: int = 64):
    """LM training-sequence packing assignment per document: concatenate
    docs in doc_id order within fixed shards of PACK_SHARD_DOCS ids, cut
    every PACK_BUDGET tokens, report each doc's byte-free (token) offset
    and first/last pack index -> (doc_id, shard, n_tokens, offset,
    pack_first, pack_last).

    Scale shape: the sequential dependency of packing is SCOPED to a
    shard (doc_id // PACK_SHARD_DOCS — fixed-size, deterministic under
    any resharding), so shards pack embarrassingly parallel through one
    bucketed exchange; the in-shard pass is a sort + cumsum over
    <= PACK_SHARD_DOCS rows. A zero-token doc occupies zero span:
    pack_last = pack_first of its offset."""
    from ..functions.bucketing import bucketed_apply

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "shard": (b["doc_id"].to_numpy(np.int64)
                      // PACK_SHARD_DOCS),
            "n_tokens": b["text"].str.count(TOKEN_RE).to_numpy(np.int64),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({
                "doc_id": pd.Series([], dtype="int64"),
                "shard": pd.Series([], dtype="int64"),
                "n_tokens": pd.Series([], dtype="int64"),
                "offset": pd.Series([], dtype="int64"),
                "pack_first": pd.Series([], dtype="int64"),
                "pack_last": pd.Series([], dtype="int64"),
            })
        return pd.concat([pack_batch(s) for _, s in
                          g.groupby("shard", sort=False)],
                         ignore_index=True)

    return bucketed_apply(
        docs.select_columns(["doc_id", "text"]), ["shard"], merge,
        partial, n_buckets)


def sql_pack_assignments() -> str:
    b, s = PACK_BUDGET, PACK_SHARD_DOCS
    return f"""
WITH t AS (
  SELECT doc_id, doc_id // {s} AS shard,
         CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT)
             AS n_tokens
  FROM documents
),
c AS (
  SELECT doc_id, shard, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS "offset"
  FROM t
)
SELECT doc_id, shard, n_tokens, "offset",
       "offset" // {b} AS pack_first,
       greatest("offset", "offset" + n_tokens - 1) // {b} AS pack_last
FROM c"""


# ---------------------------------------------------------------------------
# Composite quality-filter pipeline (FineWeb / Gopher-style gate chain).
# Every gate is an INTEGER decision rule — no float ever decides a row, so
# the engine and the DuckDB oracle agree bit-for-bit. Gate order is SPEC
# (fail_reason reports the FIRST failing gate).
FILTER_MIN_TOKENS = 5
FILTER_MAX_TOKENS = 100_000
FILTER_TOP_BIGRAM_DEN = 5   # top bigram must take <= 1/5 of bigrams
FILTER_DUP_TRIGRAM_DEN = 3  # duplicated trigrams must be <= 1/3 of trigrams
FILTER_KEEP_LANG = "en"


class FilterPipeline(LangId):
    """Fused single-pass composite document filter — the gate chain a
    pretraining corpus runs before tokenization (FineWeb's filter stack /
    Gopher rules, Rae et al. 2021 §A1.1), composed from this module's
    vectorized scorers so the corpus is read ONCE and never shuffled:

    1. ``length``     — whitespace-token count in [5, 100000],
    2. ``stopword``   — at least one English stopword hit (n_stop > 0),
    3. ``repetition`` — top bigram <= 1/5 of bigrams AND duplicated
       trigrams <= 1/3 of trigrams (integer cross-multiplication, never
       the float fractions),
    4. ``language``   — marker-argmax language-ID == 'en'.

    Output per doc: the four gate booleans, ``kept`` (AND of all), and
    ``fail_reason`` (first failing gate name, '' when kept). Scale shape:
    stateless map over batches (regexes compiled once per actor via the
    LangId base), zero shuffles, output grain == input grain — at 100 TB
    this is a pure streaming pass whose cost is the regex scans."""

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        text = batch["text"]
        n_tokens = text.str.count(TOKEN_RE).to_numpy(np.int64)
        n_stop = (text.str.lower().str.count(STOPWORDS_RE)
                  .to_numpy(np.int64))
        rep = repetition_batch(batch)
        pred = LangId.__call__(self, batch)["pred_lang"].to_numpy()

        pass_length = ((n_tokens >= FILTER_MIN_TOKENS)
                       & (n_tokens <= FILTER_MAX_TOKENS))
        pass_stop = n_stop > 0
        pass_rep = ((rep["top_bigram_c"].to_numpy(np.int64)
                     * FILTER_TOP_BIGRAM_DEN
                     <= rep["n_bigrams"].to_numpy(np.int64))
                    & (rep["dup_trigram_c"].to_numpy(np.int64)
                       * FILTER_DUP_TRIGRAM_DEN
                       <= rep["n_trigrams"].to_numpy(np.int64)))
        pass_lang = pred == FILTER_KEEP_LANG
        kept = pass_length & pass_stop & pass_rep & pass_lang
        fail_reason = np.where(
            ~pass_length, "length",
            np.where(~pass_stop, "stopword",
                     np.where(~pass_rep, "repetition",
                              np.where(~pass_lang, "language", ""))))
        return pd.DataFrame({
            "doc_id": batch["doc_id"].to_numpy(),
            "n_tokens": n_tokens,
            "pass_length": pass_length,
            "pass_stop": pass_stop,
            "pass_rep": pass_rep,
            "pass_lang": pass_lang,
            "kept": kept,
            "fail_reason": fail_reason,
        })


def filter_pipeline(docs, batch_size: int = 4096, concurrency=(1, 2)):
    return docs.map_batches(FilterPipeline, batch_format="pandas",
                            batch_size=batch_size, concurrency=concurrency)


def sql_filter_pipeline(langid_sql: str, table: str = "documents") -> str:
    """DuckDB oracle for :func:`filter_pipeline`: same integer gates over
    the shared repetition CTE and the caller's language-ID assignment SQL
    (the one the doc_langid oracle uses, so the two queries can never
    drift)."""
    return f"""
WITH tok AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text, '{TOKEN_RE}')) AS BIGINT)
             AS n_tokens,
         CAST(len(regexp_extract_all(lower(text), '{STOPWORDS_RE}'))
              AS BIGINT) AS n_stop
  FROM {table}
),
rep AS ({sql_repetition(table)}),
lang AS ({langid_sql}),
gates AS (
  SELECT t.doc_id, t.n_tokens,
         (t.n_tokens >= {FILTER_MIN_TOKENS}
          AND t.n_tokens <= {FILTER_MAX_TOKENS}) AS pass_length,
         (t.n_stop > 0) AS pass_stop,
         (r.top_bigram_c * {FILTER_TOP_BIGRAM_DEN} <= r.n_bigrams
          AND r.dup_trigram_c * {FILTER_DUP_TRIGRAM_DEN} <= r.n_trigrams)
             AS pass_rep,
         (l.pred_lang = '{FILTER_KEEP_LANG}') AS pass_lang
  FROM tok t
  JOIN rep r USING (doc_id)
  JOIN lang l USING (doc_id)
)
SELECT doc_id, n_tokens, pass_length, pass_stop, pass_rep, pass_lang,
       (pass_length AND pass_stop AND pass_rep AND pass_lang) AS kept,
       CASE WHEN NOT pass_length THEN 'length'
            WHEN NOT pass_stop THEN 'stopword'
            WHEN NOT pass_rep THEN 'repetition'
            WHEN NOT pass_lang THEN 'language'
            ELSE '' END AS fail_reason
FROM gates"""


# ---------------------------------------------------------------------------
# Deterministic per-language stratified downsampling (corpus rebalancing).
# Thresholds are SPEC 8-hex-char md5 prefixes: lowercase fixed-width hex
# compares lexicographically == numerically, so engine and oracle test the
# same integers. The salt decouples the sample from doc_split's md5(doc_id).
SAMPLE_SALT = "s:"
SAMPLE_THRESHOLDS: dict[str, str] = {"en": "40000000"}  # keep ~25% of en


def stratified_sample_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Keep rows per :data:`SAMPLE_THRESHOLDS`: languages not listed pass
    through whole; listed languages keep docs whose salted
    md5 8-hex prefix is below the language's threshold. Deterministic,
    shuffle-free and resharding-stable (same property as train_split): at
    100 TB the rebalance is a pure streaming filter, and any later stage
    can re-derive membership locally without a stored sample table."""
    lang = batch["lang"].to_numpy()
    down = np.isin(lang, list(SAMPLE_THRESHOLDS))
    keep = np.ones(len(batch), dtype=bool)
    if down.any():
        ids = batch["doc_id"].to_numpy()
        thr = np.array([SAMPLE_THRESHOLDS.get(l, "g") for l in lang])
        hx = np.fromiter(
            (hashlib.md5(f"{SAMPLE_SALT}{d}".encode()).hexdigest()[:8]
             for d in ids[down]),
            dtype="U8", count=int(down.sum()))
        keep[down] = hx < thr[down]
    return pd.DataFrame({"doc_id": batch["doc_id"].to_numpy()[keep],
                         "lang": lang[keep]})


def stratified_sample(docs, batch_size: int = 4096):
    return docs.select_columns(["doc_id", "lang"]).map_batches(
        stratified_sample_batch, batch_format="pandas",
        batch_size=batch_size)


def sql_stratified_sample(table: str = "documents") -> str:
    clauses = " OR ".join(
        f"(lang = '{l}' AND substr(md5('{SAMPLE_SALT}' "
        f"|| CAST(doc_id AS VARCHAR)), 1, 8) < '{thr}')"
        for l, thr in SAMPLE_THRESHOLDS.items())
    langs = ", ".join(f"'{l}'" for l in SAMPLE_THRESHOLDS)
    return f"""
SELECT doc_id, lang FROM {table}
WHERE lang NOT IN ({langs}) OR {clauses}"""


def lang_source_chi2(docs, batch_size: int = 65_536):
    """CooccurChi2 generalized to corpus metadata (`CDW/CooccurChi2.ipynb`
    shape on the documents table): per (lang, source) cell the 2x2 Yates
    chi-square of language-source association — the mixture-drift report
    a corpus curator reads before re-weighting sources.

    One streaming pass of per-batch (lang, source) partial counts; the
    fold, marginals and the vectorized chi2 (`support.chi2_yates_vec`,
    the SAME op order the oracle mirrors) are enum-bounded driver work."""
    import numpy as np

    from .support import chi2_yates_vec

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(["lang", "source"], sort=False)
                .size().rename("c").reset_index())

    frames = list(docs.select_columns(["lang", "source"])
                  .map_batches(partial, batch_format="pandas",
                               batch_size=batch_size)
                  .iter_batches(batch_format="pandas", batch_size=None))
    df = (pd.concat(frames, ignore_index=True)
          .groupby(["lang", "source"], as_index=False)["c"].sum())
    n = int(df["c"].sum())
    m1 = df.groupby("lang")["c"].sum()
    m2 = df.groupby("source")["c"].sum()
    c1 = df["lang"].map(m1).to_numpy(np.int64)
    c2 = df["source"].map(m2).to_numpy(np.int64)
    c = df["c"].to_numpy(np.int64)
    expected, chi2, _p = chi2_yates_vec(c, c1, c2, n)
    import ray.data as rd

    out = pd.DataFrame({
        "lang": df["lang"], "source": df["source"],
        "c1": c1, "c2": c2, "c": c,
        "expected": expected, "chi2": chi2,
    }).sort_values(["lang", "source"], kind="mergesort")
    return rd.from_pandas(out.reset_index(drop=True))


# zlib compression-ratio quality filter (the Gopher / RefinedWeb signal):
# level and thresholds are SPEC, shared with entry_sql.ensure_zlib_aux
ZLIB_LEVEL = 6
COMP_RATIO_LO_PM = 430   # compresses too well -> repetitive / templated
COMP_RATIO_HI_PM = 900   # barely compresses -> near-random / binary-ish


def compression_flags_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Per-doc zlib compression ratio in permille (comp*1000 // raw) with
    two-sided quality flags. The per-doc ``zlib.compress`` call is the
    deliberate hot loop: DEFLATE is inherently per-document and each call
    is C-speed; there is no vectorized form to prefer. Emits only flagged
    docs (the filter's output), typed even when the batch flags none."""
    import zlib

    raw = [t.encode("utf-8") for t in batch["text"]]
    rl = np.fromiter((len(b) for b in raw), np.int64, len(raw))
    cl = np.fromiter((len(zlib.compress(b, ZLIB_LEVEL)) for b in raw),
                     np.int64, len(raw))
    pm = cl * 1000 // np.maximum(rl, 1)
    keep = (pm < COMP_RATIO_LO_PM) | (pm > COMP_RATIO_HI_PM)
    flag = np.where(pm < COMP_RATIO_LO_PM, "repetitive", "incompressible")
    return pd.DataFrame({
        "doc_id": batch["doc_id"].to_numpy(np.int64)[keep],
        "raw_len": rl[keep],
        "comp_len": cl[keep],
        "ratio_pm": pm[keep],
        "flag": flag[keep].astype(object),
    })


def compression_flags(docs, batch_size: int = 2048):
    return docs.map_batches(compression_flags_batch, batch_format="pandas",
                            batch_size=batch_size)


def length_ks_by_source(docs, batch_size: int = 65_536):
    """Distribution-DRIFT screen: per source, the exact two-sample
    Kolmogorov-Smirnov statistic between that source's doc-length
    (n_chars) distribution and the REST of the corpus — the
    one-vs-rest test a curator runs to spot a source whose scrape
    changed shape. -> (source, n_s, d_num, d).

    Exactness: D = max_x |F_s(x) - F_rest(x)| is evaluated as the
    INTEGER cross-multiplication d_num = max |cum_s(x) * n_rest -
    cum_rest(x) * n_s| (both engines bit-identical); ``d`` is the ONE
    float division d_num / (n_s * n_rest).

    Scale: one streaming pass of per-batch (source, n_chars) partial
    counts; the fold is (sources x distinct lengths)-bounded — when the
    length domain is unbounded a drift report buckets lengths to a SPEC
    grid first (same histogram doctrine as the selection passes). All
    sources' cumsums advance in one vectorized pivot on the driver."""
    import numpy as np
    import ray.data as rd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        return (b.groupby(["source", "n_chars"], sort=False)
                .size().rename("k").reset_index())

    frames = list(docs.select_columns(["source", "n_chars"])
                  .map_batches(partial, batch_format="pandas",
                               batch_size=batch_size)
                  .iter_batches(batch_format="pandas", batch_size=None))
    df = (pd.concat(frames, ignore_index=True)
          .groupby(["source", "n_chars"], as_index=False)["k"].sum())
    # dense (source x sorted-length) count grid, cumulative along lengths
    piv = (df.pivot(index="n_chars", columns="source", values="k")
           .fillna(0).astype(np.int64).sort_index())
    cum = piv.cumsum(axis=0).to_numpy(np.int64)      # cum_s per column
    n_s = piv.sum(axis=0).to_numpy(np.int64)
    n = int(n_s.sum())
    cum_tot = cum.sum(axis=1, keepdims=True)
    cum_rest = cum_tot - cum
    n_rest = n - n_s
    d_num = np.abs(cum * n_rest[None, :]
                   - cum_rest * n_s[None, :]).max(axis=0)
    out = pd.DataFrame({
        "source": piv.columns.to_numpy(dtype=object),
        "n_s": n_s,
        "d_num": d_num.astype(np.int64),
        "d": d_num / (n_s * n_rest),  # one division of exact ints
    }).sort_values("source", kind="mergesort")
    return rd.from_pandas(out.reset_index(drop=True))


def sql_length_ks_by_source() -> str:
    return """
WITH c AS (
  SELECT source, n_chars, CAST(count(*) AS BIGINT) AS k
  FROM documents GROUP BY 1, 2
),
tot AS (SELECT n_chars, CAST(sum(k) AS BIGINT) AS kt FROM c GROUP BY 1),
ns AS (SELECT source, CAST(sum(k) AS BIGINT) AS n_s FROM c GROUP BY 1),
ntot AS (SELECT CAST(sum(k) AS BIGINT) AS n FROM c),
grid AS (
  SELECT s.source, t.n_chars, coalesce(c.k, 0) AS k, t.kt
  FROM (SELECT DISTINCT source FROM c) s
  CROSS JOIN tot t
  LEFT JOIN c ON c.source = s.source AND c.n_chars = t.n_chars
),
cum AS (
  SELECT source, n_chars,
         CAST(sum(k) OVER w AS BIGINT) AS cs,
         CAST(sum(kt) OVER w AS BIGINT) AS ct
  FROM grid
  WINDOW w AS (PARTITION BY source ORDER BY n_chars)
),
d AS (
  SELECT cum.source, s.n_s,
         max(abs(cs * (n.n - s.n_s) - (ct - cs) * s.n_s)) AS d_num
  FROM cum JOIN ns s USING (source) CROSS JOIN ntot n
  GROUP BY cum.source, s.n_s, n.n
)
SELECT d.source, d.n_s, CAST(d.d_num AS BIGINT) AS d_num,
       1.0 * d.d_num / (d.n_s * ((SELECT n FROM ntot) - d.n_s)) AS d
FROM d"""
