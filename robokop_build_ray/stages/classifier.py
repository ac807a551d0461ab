"""Distributed supervised model training: a logistic-regression document
quality/language classifier, trained full-batch on the engine.

The iterative-training pattern proven by ``clustering.kmeans_fit`` applied
to supervised learning: each GD iteration is ONE streaming pass over the
document table; per-document gradient contributions are quantized to int64
(``floor(g * Q)``) inside the batch, so the cross-batch reduction is an
INTEGER sum — associative and order-free — and the resulting weights are
bit-identical at any parallelism / partitioning to a sequential fit with
the same spec (the oracle). Driver state is the 4-float weight vector.

Features (SPEC — the DuckDB oracle recomputes them independently with
``regexp_extract_all``): bias, ``[a-z0-9]+`` token count / 100, total
alnum token length / 1000, English-stopword hits / 10. Label:
``lang == 'en'``. Scoring emits the quantized logit (``floor(z * Q)``)
and the sign prediction, both exactly reproducible relationally.

At 100 TB: full-batch GD is iters x one-scan; production would subsample
or switch to minibatch SGD after the first epochs — the exchange shape
(int64 partial sums, weight broadcast via ``ray.put``) is unchanged.

Note on the driver table: its ``lang`` labels are deliberately
uncorrelated with the synthetic text, so the driver query verifies
trainer EXACTNESS (distributed == sequential, bit-for-bit), not model
accuracy; learning ability is tested on a planted separable corpus in
tests/test_classifier.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray

Q = 1_000_000_000
LR = 0.1
ITERS = 15
TOKEN_RE = r"[a-z0-9]+"
STOPWORD_RE = r"\b(?:the|and|of|is|was)\b"


def _features(b: pd.DataFrame) -> np.ndarray:
    """(n, 4) float64 feature matrix — every operation chosen to be
    exactly reproducible in DuckDB (integer counts, fixed divisors)."""
    low = b["text"].str.lower()
    toks = low.str.findall(TOKEN_RE)
    n_tok = toks.str.len().to_numpy(dtype=np.float64)
    ex = toks.explode().dropna()
    alnum = (ex.str.len().groupby(level=0).sum()
             .reindex(b.index, fill_value=0).to_numpy(dtype=np.float64))
    s_en = low.str.count(STOPWORD_RE).to_numpy(dtype=np.float64)
    return np.column_stack([
        np.ones(len(b)), n_tok / 100.0, alnum / 1000.0, s_en / 10.0,
    ])


def _logits(X: np.ndarray, w: np.ndarray) -> np.ndarray:
    """w . x with a FIXED left-to-right accumulation order (matches the
    SQL oracle's ((w0 + a) + b) + c evaluation exactly)."""
    z = np.full(len(X), w[0])
    for j in range(1, X.shape[1]):
        z = z + w[j] * X[:, j]
    return z


def lr_fit(docs, iters: int = ITERS, lr: float = LR) -> np.ndarray:
    """Full-batch GD; returns the 4-weight vector. Bit-identical to
    :func:`lr_fit_sequential` at any parallelism (integer-quantized
    gradient partials)."""
    w = np.zeros(4, dtype=np.float64)
    scan = docs.select_columns(["text", "lang"])
    for _ in range(iters):
        wref = ray.put(w.copy())

        def partial(b: pd.DataFrame, _wref=wref) -> pd.DataFrame:
            wv = ray.get(_wref)
            X = _features(b)
            y = (b["lang"] == "en").to_numpy(dtype=np.float64)
            p = 1.0 / (1.0 + np.exp(-_logits(X, wv)))
            gq = np.floor((p - y)[:, None] * X * Q).astype(np.int64)
            out = {f"g{j}": [int(gq[:, j].sum())] for j in range(4)}
            out["n"] = [len(b)]
            return pd.DataFrame(out)

        sums = scan.map_batches(partial, batch_format="pandas").to_pandas()
        n = int(sums["n"].sum())
        g = np.array([int(sums[f"g{j}"].sum()) for j in range(4)],
                     dtype=np.float64)
        w = w - lr * (g / Q) / n
    return w


def lr_fit_sequential(sf_dir: str, iters: int = ITERS,
                      lr: float = LR) -> np.ndarray:
    """Single-process reference fit from the parquet table directly —
    same spec, no Ray; the distributed fit must reproduce it exactly."""
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text", "lang"])
    X = _features(docs)
    y = (docs["lang"] == "en").to_numpy(dtype=np.float64)
    w = np.zeros(4, dtype=np.float64)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-_logits(X, w)))
        gq = np.floor((p - y)[:, None] * X * Q).astype(np.int64)
        w = w - lr * (gq.sum(axis=0) / Q) / len(X)
    return w


def lr_scores(docs, w: np.ndarray):
    """Score pass: (doc_id, logit_q, pred) with ``logit_q = floor(z*Q)``
    — both columns exactly recomputable in SQL from the weight literals."""
    wref = ray.put(np.asarray(w, dtype=np.float64))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        z = _logits(_features(b), ray.get(wref))
        return pd.DataFrame({
            "doc_id": b["doc_id"].astype("int64"),
            "logit_q": np.floor(z * Q).astype(np.int64),
            "pred": z > 0,
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        score, batch_format="pandas")


def lr_train_and_score(docs):
    """The full query: distributed fit, then a distributed scoring pass."""
    return lr_scores(docs, lr_fit(docs))


def sql_lr_scores(w: np.ndarray) -> str:
    """Oracle: features recomputed relationally, logits from the
    SEQUENTIAL fit's weight literals — so it passes only if the
    distributed fit reproduced the sequential weights bit-for-bit."""
    w0, w1, w2, w3 = (f"{float(x):.17g}" for x in w)
    z = (f"(({w0} + {w1} * (n_tok / 100.0)) + {w2} * (alnum / 1000.0))"
         f" + {w3} * (s_en / 10.0)")
    return rf"""
WITH f AS (
  SELECT doc_id,
    len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tok,
    COALESCE(list_aggregate(list_transform(
      regexp_extract_all(lower(text), '{TOKEN_RE}'),
      x -> length(x)), 'sum'), 0) AS alnum,
    len(regexp_extract_all(lower(text), '\b(?:the|and|of|is|was)\b')) AS s_en
  FROM documents
)
SELECT doc_id,
  CAST(floor(({z}) * {Q}) AS BIGINT) AS logit_q,
  ({z}) > 0 AS pred
FROM f"""


def lr_auc(docs):
    """Exact ROC-AUC of the trained classifier against its labels ->
    one row (n_pos, n_neg, auc): the Mann-Whitney rank statistic with
    tie-averaging, computed distributed as EXACT integers — per batch a
    (score, n_pos, n_neg) histogram partial, coalesced score-bounded
    (scores are the quantized logit_q ints), then
    2U = sum_s [2*n_pos(s)*N_neg_below(s) + n_pos(s)*n_neg(s)] folded in
    arbitrary-precision Python ints and ONE IEEE division 2U / (2*P*N).
    Identical to the oracle's window-rank formulation
    (sum of tie-averaged positive ranks) by the standard U-statistic
    identity. The model-quality gate a training-data pipeline runs after
    every classifier refresh."""
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    w = lr_fit(docs)
    wref = ray.put(np.asarray(w, dtype=np.float64))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        z = _logits(_features(b), ray.get(wref))
        df = pd.DataFrame({
            "score": np.floor(z * Q).astype(np.int64),
            "pos": (b["lang"] == "en").to_numpy(np.int64),
        })
        g = df.groupby("score", as_index=False).agg(
            n_pos=("pos", "sum"), n=("pos", "size"))
        g["n_neg"] = (g["n"] - g["n_pos"]).astype("int64")
        return g[["score", "n_pos", "n_neg"]]

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("score", as_index=False)[["n_pos", "n_neg"]].sum()

    parts = (docs.select_columns(["text", "lang"])
             .map_batches(partial, batch_format="pandas")
             .repartition(16)
             .map_batches(merge, batch_format="pandas", batch_size=None))
    # score-cardinality-bounded driver fold (logit_q histogram)
    hist: dict[int, list[int]] = {}
    for b in parts.iter_batches(batch_format="pandas", batch_size=None):
        for s, npos, nneg in zip(b["score"], b["n_pos"], b["n_neg"]):
            e = hist.setdefault(int(s), [0, 0])
            e[0] += int(npos)
            e[1] += int(nneg)
    p = sum(v[0] for v in hist.values())
    nn = sum(v[1] for v in hist.values())
    empty = pa.table({"n_pos": pa.array([], pa.int64()),
                      "n_neg": pa.array([], pa.int64()),
                      "auc": pa.array([], pa.float64())})
    if p == 0 or nn == 0:
        return rd.from_arrow(empty)
    a2, cum_neg = 0, 0
    for s in sorted(hist):
        npos, nneg = hist[s]
        a2 += 2 * npos * cum_neg + npos * nneg
        cum_neg += nneg
    return rd.from_arrow(pa.table({
        "n_pos": pa.array([p], pa.int64()),
        "n_neg": pa.array([nn], pa.int64()),
        "auc": pa.array([float(a2) / float(2 * p * nn)], pa.float64()),
    }))


def lr_calibration(docs, n_bins: int = 10):
    """Reliability-diagram calibration of the trained classifier:
    Dataset(bin, n, n_pos, frac_pos, avg_p) — documents bucketed by
    predicted probability decile, with the observed positive rate and
    the mean predicted probability per bin (the curve a quality-filter
    owner compares before trusting thresholds).

    Exactness: probabilities derive from the QUANTIZED logit
    (p = sigmoid(logit_q / Q)) via libm exp on a correctly-rounded
    double — bit-identical to the oracle's EXP; per-score sigmoid runs
    once per DISTINCT logit_q in the score-bounded driver fold (the
    lr_auc histogram shape), never per row; avg_p sums the per-score
    floor(Q*p) ints and divides ONCE."""
    import math

    import pyarrow as pa
    import ray.data as rd

    w = lr_fit(docs)
    wref = ray.put(np.asarray(w, dtype=np.float64))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        z = _logits(_features(b), ray.get(wref))
        df = pd.DataFrame({
            "score": np.floor(z * Q).astype(np.int64),
            "pos": (b["lang"] == "en").to_numpy(np.int64),
        })
        g = df.groupby("score", as_index=False).agg(
            n_pos=("pos", "sum"), n=("pos", "size"))
        return g.astype({"n_pos": "int64", "n": "int64"})

    def merge(b: pd.DataFrame) -> pd.DataFrame:
        return b.groupby("score", as_index=False)[["n_pos", "n"]].sum()

    parts = (docs.select_columns(["text", "lang"])
             .map_batches(partial, batch_format="pandas")
             .repartition(16)
             .map_batches(merge, batch_format="pandas", batch_size=None))
    bins: dict[int, list[int]] = {}
    for b in parts.iter_batches(batch_format="pandas", batch_size=None):
        # score-cardinality-bounded fold: sigmoid per DISTINCT logit_q
        for s, npos, n in zip(b["score"], b["n_pos"], b["n"]):
            p = 1.0 / (1.0 + math.exp(-(int(s) / Q)))
            bn = min(n_bins - 1, math.floor(n_bins * p))
            pq = math.floor(Q * p)
            e = bins.setdefault(bn, [0, 0, 0])
            e[0] += int(n)
            e[1] += int(npos)
            e[2] += int(n) * pq
    out = sorted(bins)
    return rd.from_arrow(pa.table({
        "bin": pa.array(out, pa.int64()),
        "n": pa.array([bins[x][0] for x in out], pa.int64()),
        "n_pos": pa.array([bins[x][1] for x in out], pa.int64()),
        "frac_pos": pa.array(
            [float(bins[x][1]) / float(bins[x][0]) for x in out],
            pa.float64()),
        "avg_p": pa.array(
            [float(bins[x][2]) / float(bins[x][0] * Q) for x in out],
            pa.float64()),
    }))


def sql_lr_calibration(w: np.ndarray, n_bins: int = 10) -> str:
    """Oracle for lr_calibration — sigmoid of the quantized logit via
    the same libm EXP, decile bins, integer sums, one division per
    float column."""
    w0, w1, w2, w3 = (f"{float(x):.17g}" for x in w)
    z = (f"(({w0} + {w1} * (n_tok / 100.0)) + {w2} * (alnum / 1000.0))"
         f" + {w3} * (s_en / 10.0)")
    sig = f"(1.0 / (1.0 + EXP(-(CAST(floor(({z}) * {Q}) AS BIGINT)"
    sig += f" / {float(Q):.1f}))))"
    return rf"""
WITH f AS (
  SELECT doc_id, lang,
    len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tok,
    COALESCE(list_aggregate(list_transform(
      regexp_extract_all(lower(text), '{TOKEN_RE}'),
      x -> length(x)), 'sum'), 0) AS alnum,
    len(regexp_extract_all(lower(text), '\b(?:the|and|of|is|was)\b')) AS s_en
  FROM documents
),
s AS (
  SELECT least({n_bins - 1},
               CAST(floor({n_bins} * {sig}) AS BIGINT)) AS bin,
         CAST(floor({Q} * {sig}) AS BIGINT) AS pq,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM f
)
SELECT bin, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(pos) AS BIGINT) AS n_pos,
       CAST(sum(pos) AS DOUBLE) / count(*) AS frac_pos,
       CAST(sum(pq) AS DOUBLE) / (count(*) * {Q}) AS avg_p
FROM s GROUP BY bin"""


def sql_lr_auc(w: np.ndarray) -> str:
    """Oracle for lr_auc: tie-averaged rank-sum AUC over the sequential
    fit's scores (passes only if the distributed fit matched those
    weights bit-for-bit, like sql_lr_scores)."""
    w0, w1, w2, w3 = (f"{float(x):.17g}" for x in w)
    z = (f"(({w0} + {w1} * (n_tok / 100.0)) + {w2} * (alnum / 1000.0))"
         f" + {w3} * (s_en / 10.0)")
    return rf"""
WITH f AS (
  SELECT doc_id, lang,
    len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS n_tok,
    COALESCE(list_aggregate(list_transform(
      regexp_extract_all(lower(text), '{TOKEN_RE}'),
      x -> length(x)), 'sum'), 0) AS alnum,
    len(regexp_extract_all(lower(text), '\b(?:the|and|of|is|was)\b')) AS s_en
  FROM documents
),
s AS (
  SELECT CAST(floor(({z}) * {Q}) AS BIGINT) AS score,
         (lang = 'en') AS y
  FROM f),
r AS (
  SELECT y, 2 * rank() OVER (ORDER BY score)
            + count(*) OVER (PARTITION BY score) - 1 AS r2
  FROM s),
a AS (
  SELECT CAST(sum(CASE WHEN y THEN r2 ELSE 0 END) AS HUGEINT) AS s2,
         CAST(count(*) FILTER (WHERE y) AS HUGEINT) AS p,
         CAST(count(*) FILTER (WHERE NOT y) AS HUGEINT) AS nn
  FROM r)
SELECT CAST(p AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       CAST(s2 - p * (p + 1) AS DOUBLE) / CAST(2 * p * nn AS DOUBLE) AS auc
FROM a WHERE p > 0 AND nn > 0"""
