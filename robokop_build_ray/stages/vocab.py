"""Corpus vocabulary / term-statistics operators over the documents table.

The three classic index-building passes a training-data pipeline runs over a
text corpus, each expressed as bucketed exchanges (functions/bucketing.py)
so the shuffle moves aggregated term rows, never raw text:

- :func:`vocab_topk` — global term frequencies, top-k (word-count with a
  per-batch combiner; the canonical MapReduce example, Ray-Data-shaped).
- :func:`doc_tfidf` — per-document top-k terms by a df-normalized term
  frequency (tf/df). The weight is a single exact-int division so the
  float is bit-identical to the DuckDB oracle (repo float-determinism
  rule); a log-idf variant would rank identically for fixed tf.
- :func:`inverted_index` — term -> sorted posting list of doc_ids, bounded
  to a df band (stop-words and hapaxes excluded), the retrieval-index
  build step.

Terms are ``[a-z0-9]+`` runs of the lower-cased text — chosen because
DuckDB's ``regexp_extract_all`` tokenizes identically, which is what makes
the oracles exact.

Scale notes (100 TB): tf is computed entirely within a batch (one document
is one row, so a doc's term counts never span batches — no exchange);
df and the postings lists shuffle one row per DISTINCT (term, doc) pair
through a term-hash bucket; the df->tf attach is a bucketed merge join
(vocabulary at web scale is corpus-sized — never broadcast it); per-doc
top-k caps rows per (doc, batch) BEFORE its exchange so shuffle volume is
O(docs * k).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.bucketing import (
    bucketed_apply,
    bucketed_attach,
    bucketed_count,
    bucketed_sum,
)

TOKEN_RE = r"[a-z0-9]+"


def _tf_batch(b: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, term, tf) for every batch — complete per doc, since one
    document is one input row."""
    toks = b["text"].str.lower().str.findall(TOKEN_RE)
    flat = toks.explode().dropna()
    if len(flat) == 0:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype="int64"),
            "term": pd.Series([], dtype=object),
            "tf": pd.Series([], dtype="int64"),
        })
    out = pd.DataFrame({
        "doc_id": b["doc_id"].loc[flat.index].to_numpy(),
        "term": flat.to_numpy(),
    })
    return (out.groupby(["doc_id", "term"], sort=False).size()
            .rename("tf").reset_index())


def vocab_topk(docs, k: int = 100, n_buckets: int = 64):
    """Global top-k terms by total frequency -> (rk, term, tf).

    Per-batch counts (combiner) -> term-bucketed sum -> per-bucket top-k
    (buckets hold disjoint term slices, so the global top-k is a subset of
    the per-bucket winners) -> one tiny final cut. Tie-break (tf desc,
    term asc) matches the oracle's row_number ordering."""
    by, asc = ["tf", "term"], [False, True]

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(TOKEN_RE)
        flat = toks.explode().dropna()
        return (flat.value_counts().rename("tf").rename_axis("term")
                .reset_index())

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("term", sort=False, as_index=False)["tf"].sum()
        return g.sort_values(by, ascending=asc, kind="mergesort").head(k)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(by, ascending=asc, kind="mergesort").head(k)
        b["rk"] = np.arange(1, len(b) + 1)
        b["tf"] = b["tf"].astype("int64")
        return b[["rk", "term", "tf"]]

    return (
        bucketed_apply(docs.select_columns(["text"]), ["term"], merge,
                       partial, n_buckets)
        .repartition(1)
        .map_batches(final, batch_format="pandas", batch_size=None)
    )


def sql_vocab_topk(k: int = 100) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents
),
counts AS (SELECT term, count(*) AS tf FROM toks GROUP BY term)
SELECT rk, term, tf FROM (
  SELECT term, tf,
         row_number() OVER (ORDER BY tf DESC, term) AS rk
  FROM counts
) WHERE rk <= {k}"""


def doc_tfidf(docs, k: int = 5, n_buckets: int = 64):
    """Per-document top-k terms by df-normalized frequency
    -> (doc_id, term, tf, df, score) with score = tf / df.

    Three exchanges, each bucketed: df count on term, df->tf attach on
    term (bucketed merge join — the vocabulary is corpus-scale, never a
    broadcast), per-doc top-k on doc_id (partial caps k rows per doc per
    batch before the shuffle). score is one IEEE division of two exact
    ints, bit-identical to the oracle's CAST(tf AS DOUBLE)/df."""
    tf = docs.select_columns(["doc_id", "text"]).map_batches(
        _tf_batch, batch_format="pandas")
    # one row per (doc, term) -> row-count per term IS the document freq
    df = bucketed_count(tf, ["term"], name="df", n_buckets=n_buckets)
    joined = bucketed_attach(
        tf, df, left_on="term", right_on="term",
        left_cols=["doc_id", "term", "tf"], payload={"df": "df"},
        n_buckets=n_buckets,
        payload_fill=np.int64(0),
        left_fill={"doc_id": np.int64(0), "tf": np.int64(0)},
    )

    by, asc = ["doc_id", "score", "term"], [True, False, True]

    def score_topk(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        b["score"] = b["tf"].to_numpy(np.int64) / b["df"].to_numpy(np.int64)
        b = b.sort_values(by, ascending=asc, kind="mergesort")
        return b.groupby("doc_id", sort=False).head(k)

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.sort_values(by, ascending=asc, kind="mergesort")
             .groupby("doc_id", sort=False).head(k))
        g["tf"] = g["tf"].astype("int64")
        g["df"] = g["df"].astype("int64")
        return g[["doc_id", "term", "tf", "df", "score"]]

    return bucketed_apply(joined, ["doc_id"], merge, score_topk, n_buckets)


def sql_doc_tfidf(k: int = 5) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT doc_id, term, tf, df, score FROM (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) / df.df AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / df.df DESC, tf.term) AS rk
  FROM tf JOIN df USING (term)
) WHERE rk <= {k}"""


def bigram_lift(docs, k: int = 50, min_count: int = 5, n_buckets: int = 64):
    """Collocation mining: top-k within-document bigrams by lift
    c_xy * N / (c_x * c_y) -> (rk, bigram, c_xy, lift).

    Lift orders identically to PMI (log is monotone) but stays ONE float
    expression over exact ints, so the ranking and the value are
    bit-identical to the oracle. Bigram and unigram counts are each a
    bucketed word-count (combiner per batch); the two unigram attaches are
    bucketed merge joins on w1/w2 (the vocabulary is corpus-scale at web
    scale — never a broadcast); N folds from the unigram table (a tiny
    aggregate). Tokens are space-free (``TOKEN_RE``), so the space-joined
    bigram string is unambiguous."""

    def uni_partial(b: pd.DataFrame) -> pd.DataFrame:
        flat = b["text"].str.lower().str.findall(TOKEN_RE).explode().dropna()
        return (flat.value_counts().rename("c").rename_axis("w")
                .reset_index())

    def uni_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("w", sort=False, as_index=False)["c"].sum()

    uni = bucketed_apply(docs.select_columns(["text"]), ["w"], uni_merge,
                         uni_partial, n_buckets).materialize()
    n_tokens = int(uni.sum("c"))

    def big_partial(b: pd.DataFrame) -> pd.DataFrame:
        # explode all tokens once; adjacent pairs with the same (reset)
        # doc index are the within-document bigrams — no per-doc loop
        flat = (b["text"].str.lower().str.findall(TOKEN_RE)
                .reset_index(drop=True).explode().dropna())
        idx = flat.index.to_numpy()
        vals = flat.to_numpy(dtype=object)
        if len(vals) < 2:
            return pd.DataFrame({"bigram": pd.Series([], dtype=object),
                                 "c_xy": pd.Series([], dtype="int64")})
        same = idx[1:] == idx[:-1]
        bigrams = vals[:-1][same] + " " + vals[1:][same]
        return (pd.Series(bigrams).value_counts().rename("c_xy")
                .rename_axis("bigram").reset_index())

    def big_merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.groupby("bigram", sort=False, as_index=False)["c_xy"].sum()
        return g[g["c_xy"] >= min_count]

    big = bucketed_apply(docs.select_columns(["text"]), ["bigram"],
                         big_merge, big_partial, n_buckets)

    def split_w(col: int):
        def f(b: pd.DataFrame) -> pd.DataFrame:
            out = b.copy()
            out["_w"] = b["bigram"].str.split(" ").str[col]
            return out
        return f

    with_w1 = bucketed_attach(
        big.map_batches(split_w(0), batch_format="pandas"), uni,
        left_on="_w", right_on="w", left_cols=["bigram", "c_xy"],
        payload={"c": "c_x"}, n_buckets=n_buckets,
        payload_fill=np.int64(0), left_fill={"c_xy": np.int64(0)})
    with_both = bucketed_attach(
        with_w1.map_batches(split_w(1), batch_format="pandas"), uni,
        left_on="_w", right_on="w", left_cols=["bigram", "c_xy", "c_x"],
        payload={"c": "c_y"}, n_buckets=n_buckets,
        payload_fill=np.int64(0),
        left_fill={"c_xy": np.int64(0), "c_x": np.int64(0)})

    by, asc = ["lift", "bigram"], [False, True]

    def score(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({"bigram": pd.Series([], dtype=object),
                                 "c_xy": pd.Series([], dtype="int64"),
                                 "lift": pd.Series([], dtype="float64")})
        out = b[["bigram"]].copy()
        out["c_xy"] = b["c_xy"].astype("int64")
        # mirrors the oracle's ((1.0 * c_xy) * N) / (c_x * c_y) op order
        out["lift"] = (b["c_xy"].to_numpy(np.float64) * np.float64(n_tokens)
                       ) / (b["c_x"].to_numpy(np.int64)
                            * b["c_y"].to_numpy(np.int64))
        return out.sort_values(by, ascending=asc, kind="mergesort").head(k)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        b = b.sort_values(by, ascending=asc, kind="mergesort").head(k)
        b = b.reset_index(drop=True)
        b["rk"] = np.arange(1, len(b) + 1)
        return b[["rk", "bigram", "c_xy", "lift"]]

    return (with_both.map_batches(score, batch_format="pandas")
            .repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def sql_bigram_lift(k: int = 50, min_count: int = 5) -> str:
    return f"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_RE}') AS tk FROM documents
),
big AS (
  SELECT unnest(list_transform(range(1, len(tk)),
                               i -> tk[i] || ' ' || tk[i + 1])) AS bigram
  FROM toks
),
bc AS (SELECT bigram, count(*) AS c_xy FROM big
       GROUP BY bigram HAVING count(*) >= {min_count}),
uni AS (SELECT unnest(tk) AS w FROM toks),
uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
tot AS (SELECT count(*) AS n FROM uni),
scored AS (
  SELECT b.bigram, b.c_xy,
         1.0 * b.c_xy * t.n / (u1.c * u2.c) AS lift
  FROM bc b
  JOIN uc u1 ON u1.w = split_part(b.bigram, ' ', 1)
  JOIN uc u2 ON u2.w = split_part(b.bigram, ' ', 2)
  CROSS JOIN tot t
)
SELECT rk, bigram, c_xy, lift FROM (
  SELECT row_number() OVER (ORDER BY lift DESC, bigram) AS rk,
         bigram, c_xy, lift
  FROM scored
) WHERE rk <= {k}"""


def inverted_index(docs, min_df: int = 30, max_df: int = 390,
                   n_buckets: int = 64):
    """Retrieval-index build: term -> (df, sorted int64 posting list),
    restricted to the useful df band (rarer than stop-words, more than a
    hapax). One term-bucketed exchange over distinct (term, doc) pairs;
    postings emit as a typed Arrow ListArray per bucket."""

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        return _tf_batch(b)[["term", "doc_id"]]

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", "doc_id"], kind="mergesort")
        sizes = g.groupby("term", sort=False)["doc_id"].size()
        keep = sizes[(sizes >= min_df) & (sizes <= max_df)]
        g = g[g["term"].isin(keep.index)]
        if len(g) == 0:
            return pd.DataFrame({
                "term": pd.Series([], dtype=object),
                "df": pd.Series([], dtype="int64"),
                "postings": pd.Series([], dtype=object),
            })
        agg = g.groupby("term", sort=False)["doc_id"].agg(list)
        return pd.DataFrame({
            "term": agg.index.to_numpy(),
            "df": agg.str.len().astype("int64").to_numpy(),
            "postings": agg.to_numpy(),
        })

    return bucketed_apply(
        docs.select_columns(["doc_id", "text"]), ["term"], merge,
        pairs, n_buckets)


def sql_inverted_index(min_df: int = 30, max_df: int = 390) -> str:
    return f"""
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents
)
SELECT term, count(*) AS df, list_sort(list(doc_id)) AS postings
FROM toks GROUP BY term
HAVING count(*) BETWEEN {min_df} AND {max_df}"""


def lm_score(docs, n_buckets: int = 64, quant: int = 1_000_000):
    """CCNet-style corpus-LM quality score per document: the average
    next-token conditional probability under a bigram LM fit on the corpus
    itself (Wenzek et al. 2020 filter by LM score; here MLE bigram instead
    of KenLM so the value is exactly recomputable by the oracle).

    q(w1 w2) = floor(quant * c(w1 w2) / c(w1-as-prefix)) — EXACT integer
    arithmetic end to end (no float, no log): the per-doc score is
    sum_k(count_in_doc * q) over the doc's distinct bigrams, and
    ``avg_p_ppm`` = score_sum / n_bigrams is the single final division
    (both operands < 2^53, so the double is exact on both sides).

    Shape at 100 TB — TWO exchanges total. The per-batch partial is the
    per-(doc, bigram) instance-count table; bucketing it by the bigram's
    FIRST WORD co-locates, in one bucket, (a) every instance of a bigram
    (global c_xy = an in-bucket sum), (b) every bigram sharing a prefix
    (c(w1) = an in-bucket sum), and (c) the instances the q values join
    back to — so counts, marginals, quantization and the join all happen
    inside ONE merge call with no broadcast and no second corpus pass.
    Exchange 2 is the entity-bounded per-doc sum. Known skew: a hot prefix
    word concentrates its bigram family in one bucket (~the hot word's
    token share); if that ever dominates, split into the 2-exchange
    variant (count table bucketed by w1, instance join bucketed by full
    bigram hash) at the cost of one more AllToAll.
    ``quant * c_xy`` stays in int64 up to c_xy ~ 9.2e12 — at bigger counts
    raise to int128 via decimal or drop quant."""

    def inst_partial(b: pd.DataFrame) -> pd.DataFrame:
        flat = (b["text"].str.lower().str.findall(TOKEN_RE)
                .set_axis(np.arange(len(b))).explode().dropna())
        idx = flat.index.to_numpy(dtype=np.int64)
        vals = flat.to_numpy(dtype=object)
        empty = pd.DataFrame({"w1": pd.Series([], dtype=object),
                              "bigram": pd.Series([], dtype=object),
                              "doc_id": pd.Series([], dtype="int64"),
                              "k": pd.Series([], dtype="int64")})
        if len(vals) < 2:
            return empty
        same = idx[1:] == idx[:-1]
        if not same.any():
            return empty
        d = b["doc_id"].to_numpy()[idx[:-1][same]]
        w1 = vals[:-1][same]
        grams = w1 + " " + vals[1:][same]
        cnt = (pd.DataFrame({"w1": w1, "bigram": grams, "doc_id": d})
               .groupby(["w1", "bigram", "doc_id"], sort=False).size()
               .rename("k").reset_index())
        cnt["k"] = cnt["k"].astype("int64")
        cnt["doc_id"] = cnt["doc_id"].astype("int64")
        return cnt

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        # global bigram counts: every instance of any bigram in this bucket
        # lives in this bucket, so the in-bucket sum IS c_xy
        c_xy = g.groupby("bigram", sort=False)["k"].sum()
        # prefix marginals likewise (all bigrams sharing w1 are co-located)
        key_w1 = c_xy.index.str.split(" ").str[0]
        c_x = c_xy.groupby(key_w1).transform("sum").to_numpy(np.int64)
        q = pd.Series((quant * c_xy.to_numpy(np.int64)) // c_x,
                      index=c_xy.index)
        contrib = g["k"].to_numpy(np.int64) * q.reindex(
            g["bigram"]).to_numpy(np.int64)
        per = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                            "s": contrib,
                            "n": g["k"].to_numpy(np.int64)})
        return per.groupby("doc_id", sort=False, as_index=False)[
            ["s", "n"]].sum()

    per_doc_partials = bucketed_apply(
        docs.select_columns(["doc_id", "text"]), ["w1"], bucket_merge,
        inst_partial, n_buckets)

    def doc_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("doc_id", sort=False, as_index=False)[
            ["s", "n"]].sum()

    per_doc = bucketed_apply(per_doc_partials, ["doc_id"], doc_merge,
                             None, n_buckets)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        n = b["n"].to_numpy(np.int64)
        s = b["s"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "n_bigrams": n,
            "score_sum": s,
            "avg_p_ppm": np.divide(s, n, out=np.zeros(len(b)),
                                   where=n > 0),
        })

    import pyarrow as _pa
    import ray.data as _rd

    seed = _rd.from_arrow(_pa.table({
        "doc_id": _pa.array([], _pa.int64()),
        "n_bigrams": _pa.array([], _pa.int64()),
        "score_sum": _pa.array([], _pa.int64()),
        "avg_p_ppm": _pa.array([], _pa.float64()),
    }))
    # typed empty seed: a degenerate tier with no bigrams still yields the
    # contract schema (zero-row datasets otherwise lose their columns)
    return per_doc.map_batches(final, batch_format="pandas").union(seed)


def dsir_weights(docs, target_lang: str = "en", n_buckets: int = 64,
                 quant: int = 1_000_000):
    """DSIR-style data-selection importance weight per document (Xie et
    al. 2023 shape — unigram MLE LMs with add-one smoothing instead of
    hashed n-gram features, so the weight is exactly recomputable):
    Dataset(doc_id, n_tokens, logratio_q, logratio). The target LM is
    fit on the ``target_lang`` slice, the raw LM on the whole corpus;

        t(w) = floor(Q * ln( ((c_t(w)+1) * (N_r+V))
                             / ((c_r(w)+1) * (N_t+V)) ))
        weight(d) = sum over doc tokens of t(w)

    Every per-token term is an order-free int64 (the Adamic-Adar libm
    trick: both sides take ln of the SAME exactly-converted double
    ratio, multiply by the integer Q and floor), so the per-doc sum is
    bit-identical at any parallelism; ``logratio`` is ONE division.
    Select top-weight docs downstream to shift the corpus toward the
    target distribution.

    Shape at 100 TB — one scalar pre-pass + TWO exchanges. Both LMs'
    token counts (c_t, c_r) are in-bucket sums once instances bucket by
    token; the three global scalars (N_t, N_r, V) fold from one
    n_buckets-row collect; exchange 2 is the per-doc sum. The smoothed
    products stay exact doubles while (c+1)*(N+V) < 2^53 — beyond that
    split the ln into quantized ln-count lookups."""
    import math

    def inst_partial(b: pd.DataFrame) -> pd.DataFrame:
        flat = (b["text"].str.lower().str.findall(TOKEN_RE)
                .set_axis(np.arange(len(b))).explode().dropna())
        empty = pd.DataFrame({"w": pd.Series([], dtype=object),
                              "doc_id": pd.Series([], dtype="int64"),
                              "k": pd.Series([], dtype="int64"),
                              "kt": pd.Series([], dtype="int64")})
        if len(flat) == 0:
            return empty
        idx = flat.index.to_numpy(dtype=np.int64)
        w = flat.to_numpy(dtype=object)
        d = b["doc_id"].to_numpy()[idx]
        is_t = (b["lang"].to_numpy(dtype=object)[idx]
                == target_lang).astype(np.int64)
        cnt = (pd.DataFrame({"w": w, "doc_id": d, "k": 1, "kt": is_t})
               .groupby(["w", "doc_id"], sort=False, as_index=False)
               [["k", "kt"]].sum())
        cnt["doc_id"] = cnt["doc_id"].astype("int64")
        cnt["k"] = cnt["k"].astype("int64")
        cnt["kt"] = cnt["kt"].astype("int64")
        return cnt

    pruned = docs.select_columns(["doc_id", "lang", "text"])

    # ---- pass 1: the three global LM scalars (n_buckets-row collect)
    def stats_merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"v": pd.Series([], dtype="int64"),
                                 "sk": pd.Series([], dtype="int64"),
                                 "skt": pd.Series([], dtype="int64")})
        per_w = g.groupby("w", sort=False)[["k", "kt"]].sum()
        return pd.DataFrame({"v": [len(per_w)],
                             "sk": [int(per_w["k"].sum())],
                             "skt": [int(per_w["kt"].sum())]})

    rows = bucketed_apply(pruned, ["w"], stats_merge, inst_partial,
                          n_buckets).take_all()  # n_buckets-bounded
    vocab_v = sum(r["v"] for r in rows)
    n_raw = sum(r["sk"] for r in rows)
    n_tgt = sum(r["skt"] for r in rows)

    # ---- pass 2: per-token terms inside the token bucket, per-doc sums
    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0:
            return pd.DataFrame({"doc_id": pd.Series([], dtype="int64"),
                                 "s": pd.Series([], dtype="int64"),
                                 "n": pd.Series([], dtype="int64")})
        cw = g.groupby("w", sort=False)[["k", "kt"]].sum()
        cr = cw["k"].to_numpy(np.int64)
        ct = cw["kt"].to_numpy(np.int64)
        t = np.fromiter(
            (math.floor(quant * math.log(
                float((int(c_t) + 1) * (n_raw + vocab_v))
                / float((int(c_r) + 1) * (n_tgt + vocab_v))))
             for c_r, c_t in zip(cr, ct)),
            np.int64, len(cw))
        tmap = pd.Series(t, index=cw.index)
        contrib = (g["k"].to_numpy(np.int64)
                   * tmap.reindex(g["w"]).to_numpy(np.int64))
        per = pd.DataFrame({"doc_id": g["doc_id"].to_numpy(np.int64),
                            "s": contrib,
                            "n": g["k"].to_numpy(np.int64)})
        return per.groupby("doc_id", sort=False, as_index=False)[
            ["s", "n"]].sum()

    per_doc_partials = bucketed_apply(pruned, ["w"], bucket_merge,
                                      inst_partial, n_buckets)

    def doc_merge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("doc_id", sort=False, as_index=False)[
            ["s", "n"]].sum()

    per_doc = bucketed_apply(per_doc_partials, ["doc_id"], doc_merge,
                             None, n_buckets)

    def final(b: pd.DataFrame) -> pd.DataFrame:
        s = b["s"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "n_tokens": b["n"].to_numpy(np.int64),
            "logratio_q": s,
            "logratio": s / float(quant),  # ONE division
        })

    import ray.data as _rd

    seed = _rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "logratio_q": pa.array([], pa.int64()),
        "logratio": pa.array([], pa.float64()),
    }))
    return per_doc.map_batches(final, batch_format="pandas").union(seed)


def ccnet_buckets(docs, n_buckets: int = 64):
    """CCNet-style head/middle/tail corpus split (Wenzek et al. 2020):
    Dataset(doc_id, bucket) with bucket 3 = head (best corpus-LM score
    tertile), 2 = middle, 1 = tail. Thresholds are quantile_disc tertile
    VALUES of :func:`lm_score`'s avg_p_ppm (actual data values, so the
    float comparisons are well-defined and bit-identical to the
    oracle); the assignment pass is a zero-shuffle vectorized map over
    the broadcast thresholds — the events_value_ntile shape applied to
    a computed quality score instead of a raw column."""
    import ray as _ray

    from ..functions.quantiles import grouped_exact_ranks, quantile_disc_rank

    scores = lm_score(docs, n_buckets=n_buckets).materialize()
    n = scores.count()

    def as_group(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"g": np.zeros(len(b), dtype=np.int64),
                             "value": b["avg_p_ppm"].to_numpy(np.float64)})

    targets = {0: [("t1", quantile_disc_rank(1.0 / 3.0, n)),
                   ("t2", quantile_disc_rank(2.0 / 3.0, n))]}
    got = grouped_exact_ranks(
        lambda: scores.map_batches(as_group, batch_format="pandas"),
        "g", "value", targets)
    ref = _ray.put((got[(0, "t1")], got[(0, "t2")]))

    def assign(b: pd.DataFrame, _ref=ref) -> pd.DataFrame:
        t1, t2 = _ray.get(_ref)
        v = b["avg_p_ppm"].to_numpy(np.float64)
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(np.int64),
            "bucket": (1 + (v > t1).astype(np.int64) + (v > t2))})

    return scores.map_batches(assign, batch_format="pandas")


def sql_ccnet_buckets(quant: int = 1_000_000) -> str:
    """Oracle for :func:`ccnet_buckets` — lm_score's CTE + quantile_disc
    tertile thresholds + the identical comparison rule."""
    lm = sql_lm_score(quant)
    return f"""
WITH lm AS ({lm}),
th AS (SELECT quantile_disc(avg_p_ppm, 1.0/3.0) AS t1,
              quantile_disc(avg_p_ppm, 2.0/3.0) AS t2 FROM lm)
SELECT doc_id,
       CAST(1 + (avg_p_ppm > th.t1)::INT + (avg_p_ppm > th.t2)::INT
            AS BIGINT) AS bucket
FROM lm, th"""


def sql_dsir_weights(target_lang: str = "en",
                     quant: int = 1_000_000) -> str:
    """Oracle for :func:`dsir_weights` — identical smoothed unigram
    log-ratio, recomputed relationally (LN of the same exact double
    ratio, FLOOR, integer sum)."""
    return f"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS w
  FROM documents
),
cnt AS (SELECT w, CAST(count(*) AS BIGINT) AS cr,
               CAST(count(*) FILTER (WHERE lang = '{target_lang}')
                    AS BIGINT) AS ct
        FROM toks GROUP BY w),
tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr,
               CAST(sum(ct) AS BIGINT) AS nt,
               CAST(count(*) AS BIGINT) AS v FROM cnt),
tw AS (SELECT w, CAST(FLOOR({quant} * LN(
           CAST((ct + 1) * (nr + v) AS DOUBLE)
           / CAST((cr + 1) * (nt + v) AS DOUBLE))) AS BIGINT) AS t
       FROM cnt, tot)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(sum(tw.t) AS BIGINT) AS logratio_q,
       CAST(sum(tw.t) AS DOUBLE) / {quant} AS logratio
FROM toks JOIN tw USING (w)
GROUP BY doc_id"""


def sql_lm_score(quant: int = 1_000_000) -> str:
    """Oracle for :func:`lm_score` — same integer floor-division quantized
    conditional probabilities, recomputed relationally."""
    return f"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS tk
  FROM documents
),
big AS (
  SELECT doc_id, unnest(list_transform(range(1, len(tk)),
                                       i -> tk[i] || ' ' || tk[i + 1])) AS g
  FROM toks
),
bc AS (SELECT g, CAST(count(*) AS BIGINT) AS c_xy FROM big GROUP BY g),
pc AS (SELECT split_part(g, ' ', 1) AS w1, CAST(sum(c_xy) AS BIGINT) AS c_x
       FROM bc GROUP BY 1),
q AS (SELECT g, ({quant} * bc.c_xy) // pc.c_x AS q
      FROM bc JOIN pc ON pc.w1 = split_part(bc.g, ' ', 1))
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       CAST(sum(q.q) AS BIGINT) AS score_sum,
       CAST(sum(q.q) AS DOUBLE) / count(*) AS avg_p_ppm
FROM big JOIN q USING (g)
GROUP BY doc_id"""


# ------------------------------------------------------------ BPE trainer

def _bpe_merge_loop(word_counts: dict[str, int],
                    n_merges: int) -> list[tuple[int, str, str, int]]:
    """Greedy BPE merges over a (word -> count) table (Sennrich et al.
    2016): symbols start as characters plus an end-of-word marker; each
    round merges the most frequent adjacent pair, count-weighted by word
    frequency. Deterministic tie-break: highest count, then
    lexicographically smallest (left, right). Returns
    [(rank, left, right, pair_count)]."""
    seqs: dict[str, tuple[str, ...]] = {
        w: tuple(w) + ("</w>",) for w in word_counts
    }
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for w, cnt in word_counts.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best_n = max(pair_counts.values())
        left, right = min(p for p, c in pair_counts.items() if c == best_n)
        merges.append((rank + 1, left, right, best_n))
        joined = left + right
        for w, s in seqs.items():
            if left not in s:
                continue
            out: list[str] = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                    out.append(joined)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


def bpe_train(docs, n_merges: int = 60, max_vocab_words: int = 200_000,
              n_buckets: int = 64):
    """Distributed BPE tokenizer training -> (rank, left, right, pair_count).

    Phase 1 — the ONLY corpus-scale pass: the word-frequency table via
    per-batch ``value_counts`` combiners and one term-bucketed exchange
    (identical shape to :func:`vocab_topk`). Phase 2 — the greedy merge
    loop runs driver-side over that table, which is VOCABULARY-bounded,
    not corpus-bounded: this is how production tokenizer trainers
    (sentencepiece, HF tokenizers) are built, because merge decisions
    depend only on (word, count). At web scale the table is capped to the
    ``max_vocab_words`` most frequent words (count desc, word asc) with a
    warning — rare-tail words cannot influence early merges materially.
    """
    import warnings

    import ray.data as rd

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(TOKEN_RE)
        flat = toks.explode().dropna()
        return (flat.value_counts().rename("n").rename_axis("term")
                .reset_index())

    wc = bucketed_sum(
        docs.select_columns(["text"]).map_batches(
            partial, batch_format="pandas"),
        ["term"], "n", n_buckets=n_buckets,
    ).to_pandas()
    if len(wc) > max_vocab_words:
        warnings.warn(
            f"bpe_train: word table has {len(wc)} entries; capping to the "
            f"{max_vocab_words} most frequent (merge decisions on the "
            "rare tail are not affected materially)", stacklevel=2)
        wc = wc.sort_values(["n", "term"], ascending=[False, True],
                            kind="mergesort").head(max_vocab_words)
    merges = _bpe_merge_loop(
        dict(zip(wc["term"], wc["n"].astype(int))), n_merges)
    tbl = pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "pair_count": pa.array([m[3] for m in merges], pa.int64()),
    })
    return rd.from_arrow(tbl)


# ------------------------------------------------------- BPE tokenization


class _BpeEncoder:
    """Actor-pool BPE encoder (the APPLY half of the tokenizer loop —
    ``bpe_train`` learns the merges, this stage tokenizes the corpus with
    them). Merge ranks are built ONCE per actor in ``__init__``
    (merge-table-bounded, ~n_merges entries); a per-actor word -> encoding
    cache means each unique word TYPE is encoded once per actor, not once
    per occurrence — the cost profile production tokenizers rely on
    (encode work ~ O(unique words x merge depth), stream work ~ O(tokens
    x dict lookup)).

    Encoding uses the lowest-rank-present loop (the HF-tokenizers shape):
    repeatedly merge every occurrence of the lowest-ranked pair present.
    Provably equivalent to applying merges in rank order — a pair
    containing a rank-r product can only have rank > r — but structured
    independently from the oracle's per-rank regex-substitution pass
    (entry_sql.ensure_bpe_encode_aux), which is what makes the parity
    check meaningful.
    """

    def __init__(self, merges: list[tuple[int, str, str]],
                 parity: bool = False):
        self.ranks = {(l, r): k for k, l, r in merges}
        self.cache: dict[str, tuple[str, int]] = {}
        self.parity = parity

    def _encode(self, w: str) -> tuple[str, int]:
        got = self.cache.get(w)
        if got is None:
            syms = list(w) + ["</w>"]
            ranks = self.ranks
            while len(syms) > 1:
                best_rank = None
                best_pair = None
                for pair in zip(syms, syms[1:]):
                    rk = ranks.get(pair)
                    if rk is not None and (best_rank is None
                                           or rk < best_rank):
                        best_rank, best_pair = rk, pair
                if best_pair is None:
                    break
                a, b = best_pair
                ab = a + b
                out: list[str] = []
                i = 0
                n = len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        out.append(ab)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            got = (" ".join(syms), len(syms))
            self.cache[w] = got
        return got

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        import hashlib

        toks = batch["text"].str.lower().str.findall(TOKEN_RE)
        enc = self._encode
        strs: list[str] = []
        counts = np.zeros(len(batch), dtype=np.int64)
        for i, words in enumerate(toks):
            parts = [enc(w) for w in words]
            strs.append(" ".join(p[0] for p in parts))
            counts[i] = sum(p[1] for p in parts)
        out = pd.DataFrame({"doc_id": batch["doc_id"].to_numpy(),
                            "n_bpe_tokens": counts})
        if self.parity:
            out["tok_hash"] = [hashlib.md5(s.encode()).hexdigest()
                               for s in strs]
        else:
            out["tok_hash"] = pd.Series(
                pd.util.hash_array(np.asarray(strs, dtype=object))
                .view(np.int64), index=out.index)
        return out


def bpe_encode(docs, n_merges: int = 60, max_vocab_words: int = 200_000,
               n_buckets: int = 64, parity: bool | None = None,
               batch_size: int = 2048):
    """Train-then-tokenize: learn ``n_merges`` BPE merges over the corpus
    (:func:`bpe_train` — one word-count exchange), then encode every
    document with them through an actor-pool stage. Returns one row per
    doc: ``doc_id, n_bpe_tokens, tok_hash`` (md5 of the space-joined
    token stream in parity mode, vectorized siphash otherwise — same
    convention as ``text_analysis.fingerprint_batch``).

    Scale notes (100 TB): the merge table is n_merges rows (driver-side
    ``take_all`` is merge-bounded, never corpus-bounded) and ships to each
    actor once via ``fn_constructor_kwargs``; the encode pass is a single
    zero-shuffle map over the document stream. Re-expresses the tokenizer
    loop a training-data pipeline runs after ``bpe_train``; reference
    analog: builder-side tokenization before counting
    (/root/reference/builder/chemotext.py-style corpus passes).
    """
    from ..stages.text_analysis import resolve_parity

    merges_rows = bpe_train(
        docs, n_merges, max_vocab_words, n_buckets).take_all()
    merges = [(int(m["rank"]), m["left"], m["right"]) for m in merges_rows]
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _BpeEncoder,
        fn_constructor_kwargs={"merges": merges,
                               "parity": resolve_parity(parity)},
        batch_format="pandas", batch_size=batch_size,
        concurrency=(1, 4),
    )


RAKE_K = 30
RAKE_STOPWORDS = ("the", "and", "of", "to", "in", "is", "a")


def _rake_phrases(b: pd.DataFrame) -> pd.DataFrame:
    """Per-occurrence RAKE candidate phrases: maximal runs of consecutive
    non-stopword tokens in the token sequence -> (phrase, plen). Whole-batch
    numpy gaps-and-islands (doc-boundary OR stopword breaks), one groupby
    join — no per-document Python."""
    toks = b["text"].str.lower().str.findall(TOKEN_RE)
    ex = toks.explode().dropna()
    empty = pd.DataFrame({"phrase": pd.Series([], dtype=object),
                          "plen": pd.Series([], dtype="int64")})
    if len(ex) == 0:
        return empty
    doc = ex.index.to_numpy()
    w = ex.to_numpy(dtype=object)
    stop = np.isin(w, RAKE_STOPWORDS)
    brk = np.r_[True, (doc[1:] != doc[:-1]) | stop[:-1]]
    isl = np.cumsum(brk)
    keep = ~stop
    if not keep.any():
        return empty
    df = pd.DataFrame({"isl": isl[keep], "w": w[keep]})
    g = df.groupby("isl", sort=False)["w"]
    return pd.DataFrame({
        "phrase": g.agg(" ".join).to_numpy(dtype=object),
        "plen": g.size().to_numpy(np.int64),
    })


def rake_keywords(docs, k: int = RAKE_K, n_buckets: int = 64):
    """RAKE keyword extraction (Rose et al. 2010 grain) over the corpus ->
    top-k candidate phrases (rk, phrase, n_occ, sum_deg, sum_freq, score):
    phrases are stopword-delimited token runs; freq(w) = occurrences of w
    inside candidate phrases, deg(w) = sum of the lengths of the phrases
    each occurrence sits in (co-occurrence degree incl. self); the phrase
    score is the RAKE ratio computed as ONE exact-int division
    sum_deg / sum_freq over the phrase's word multiset (single-division
    variant of the per-word ratio sum, keeping the float bit-identical to
    the oracle).

    Scale shape: extraction is one batch pass (a doc never spans rows);
    word stats and phrase counts each ONE term/phrase-bucketed exchange
    over pre-aggregated partials; stats re-attach by bucketed merge join
    (the vocabulary is never broadcast); final cut is k-bounded. The
    phrase-occurrence table is materialized once to feed both exchanges —
    token-bounded; checkpoint it to parquet at corpus scale (the minhash
    signature pattern)."""
    occ = (docs.select_columns(["text"])
           .map_batches(_rake_phrases, batch_format="pandas")
           .materialize())

    def wrows(b: pd.DataFrame) -> pd.DataFrame:
        sp = b["phrase"].str.split(" ")
        ex = sp.explode()
        return pd.DataFrame({
            "w": ex.to_numpy(dtype=object),
            "plen": b["plen"].loc[ex.index].to_numpy(np.int64),
        })

    def wpartial(g: pd.DataFrame) -> pd.DataFrame:
        return (g.groupby("w", sort=False)
                .agg(freq=("plen", "size"), deg=("plen", "sum"))
                .reset_index())

    def wmerge(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("w", sort=False, as_index=False)[
            ["freq", "deg"]].sum()

    wstats = bucketed_apply(
        occ.map_batches(wrows, batch_format="pandas"), ["w"],
        wmerge, wpartial, n_buckets)

    pcounts = bucketed_count(occ, ["phrase"], name="n_occ",
                             n_buckets=n_buckets)

    def pw(b: pd.DataFrame) -> pd.DataFrame:
        sp = b["phrase"].str.split(" ")
        ex = sp.explode()
        return pd.DataFrame({
            "w": ex.to_numpy(dtype=object),
            "phrase": b["phrase"].loc[ex.index].to_numpy(dtype=object),
        })

    tagged = bucketed_attach(
        pcounts.map_batches(pw, batch_format="pandas"), wstats,
        left_on="w", right_on="w", left_cols=["phrase"],
        payload={"freq": "freq", "deg": "deg"},
        payload_fill=np.int64(0), n_buckets=n_buckets,
        empty_dtypes={"phrase": object, "freq": np.int64, "deg": np.int64})

    def psum(g: pd.DataFrame) -> pd.DataFrame:
        out = (g.groupby("phrase", sort=False)
               .agg(sum_deg=("deg", "sum"), sum_freq=("freq", "sum"))
               .reset_index())
        return out

    sums = bucketed_apply(tagged, ["phrase"], psum, None, n_buckets)
    scored = bucketed_attach(
        sums, pcounts, left_on="phrase", right_on="phrase",
        left_cols=["phrase", "sum_deg", "sum_freq"],
        payload={"n_occ": "n_occ"}, payload_fill=np.int64(0),
        left_fill={"sum_deg": np.int64(0), "sum_freq": np.int64(0)},
        n_buckets=n_buckets,
        empty_dtypes={"phrase": object, "sum_deg": np.int64,
                      "sum_freq": np.int64, "n_occ": np.int64})

    def final(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0:
            return pd.DataFrame({
                "rk": pd.Series([], dtype="int64"),
                "phrase": pd.Series([], dtype=object),
                "n_occ": pd.Series([], dtype="int64"),
                "sum_deg": pd.Series([], dtype="int64"),
                "sum_freq": pd.Series([], dtype="int64"),
                "score": pd.Series([], dtype="float64"),
            })
        b = b.copy()
        b["score"] = (b["sum_deg"].to_numpy(np.int64).astype(np.float64)
                      / b["sum_freq"].to_numpy(np.int64))
        b = b.sort_values(["score", "phrase"], ascending=[False, True],
                          kind="mergesort").head(k)
        b["rk"] = np.arange(1, len(b) + 1)
        for c in ("n_occ", "sum_deg", "sum_freq"):
            b[c] = b[c].astype("int64")
        return b[["rk", "phrase", "n_occ", "sum_deg", "sum_freq", "score"]]

    return (scored.repartition(1)
            .map_batches(final, batch_format="pandas", batch_size=None))


def sql_rake_keywords(k: int = RAKE_K) -> str:
    stop = ", ".join(f"'{w}'" for w in RAKE_STOPWORDS)
    return f"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(lower(text), '{TOKEN_RE}') AS l
  FROM documents),
toks AS (
  SELECT doc_id, unnest(l) AS term, generate_subscripts(l, 1) AS i FROM d),
marked AS (
  SELECT doc_id, term, i, term IN ({stop}) AS stop FROM toks),
brk AS (
  SELECT doc_id, term, i, stop,
         CASE WHEN coalesce(lag(stop) OVER (PARTITION BY doc_id
                                            ORDER BY i), TRUE)
              THEN 1 ELSE 0 END AS b
  FROM marked),
isl AS (
  SELECT doc_id, term, i, stop,
         sum(b) OVER (PARTITION BY doc_id ORDER BY i
                      ROWS UNBOUNDED PRECEDING) AS isl
  FROM brk),
ph AS (
  SELECT doc_id, isl, string_agg(term, ' ' ORDER BY i) AS phrase,
         count(*) AS plen
  FROM isl WHERE NOT stop GROUP BY doc_id, isl),
pw_occ AS (
  SELECT unnest(string_split(phrase, ' ')) AS w, plen FROM ph),
ws AS (
  SELECT w, count(*) AS freq, sum(plen) AS deg FROM pw_occ GROUP BY w),
pc AS (SELECT phrase, count(*) AS n_occ FROM ph GROUP BY phrase),
pd AS (
  SELECT phrase, unnest(string_split(phrase, ' ')) AS w FROM pc),
sums AS (
  SELECT pd.phrase, CAST(sum(ws.deg) AS BIGINT) AS sum_deg,
         CAST(sum(ws.freq) AS BIGINT) AS sum_freq
  FROM pd JOIN ws ON ws.w = pd.w GROUP BY pd.phrase),
scored AS (
  SELECT s.phrase, pc.n_occ, s.sum_deg, s.sum_freq,
         CAST(s.sum_deg AS DOUBLE) / s.sum_freq AS score
  FROM sums s JOIN pc ON pc.phrase = s.phrase)
SELECT rk, phrase, CAST(n_occ AS BIGINT) AS n_occ, sum_deg, sum_freq, score
FROM (SELECT *, row_number() OVER (ORDER BY score DESC, phrase) AS rk
      FROM scored)
WHERE rk <= {k}"""


# ------------------------------------------------------------ TextRank

def doc_textrank(sf_dir: str, n_buckets: int = 64):
    """TextRank keyword ranking (Mihalcea & Tarau 2004 shape): PageRank
    over the word co-occurrence graph -> Dataset(id=term, rank_units).

    SPEC graph: an undirected edge joins every pair of ADJACENT tokens
    (TOKEN_RE over lowered text) where both tokens are >= 3 chars —
    window 2 over the raw sequence (the classic POS filter is replaced by
    the deterministic length gate). Ranks are the repo's quantized-int64
    PageRank (stages/pagerank.py SCALE/damping/iters), so the oracle's
    unrolled integer iterations match bit-exactly.

    Scale: pair extraction is a zero-shuffle vectorized flat-map (explode
    + shift, doc boundaries masked); the distinct-edge exchange and the
    rank loop are VOCABULARY-bounded — the same reason the BPE trainer
    scales (corpus-size-independent state). Self-loops (a word adjacent
    to itself) are kept; both engines see them identically."""
    import ray.data as rd

    from .pagerank import pagerank

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["text"])

    _empty = {"src": pd.Series([], dtype=object),
              "dst": pd.Series([], dtype=object)}

    def pairs(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        if lens.sum() == 0:
            return pd.DataFrame(_empty)
        flat = np.concatenate([np.asarray(t, dtype=object)
                               for t in toks if len(t)])
        did = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
        a, bb = flat[:-1], flat[1:]
        same = did[1:] == did[:-1]
        la = np.fromiter((len(x) for x in a), count=len(a), dtype=np.int64)
        lb = np.fromiter((len(x) for x in bb), count=len(bb),
                         dtype=np.int64)
        keep = same & (la >= 3) & (lb >= 3)
        a, bb = a[keep], bb[keep]
        lo = np.where(a <= bb, a, bb)
        hi = np.where(a <= bb, bb, a)
        out = pd.DataFrame({"src": lo, "dst": hi}).drop_duplicates()
        return out if len(out) else pd.DataFrame(_empty)

    und = docs.map_batches(pairs, batch_format="pandas")

    def both_dirs(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "src" not in b.columns:
            return pd.DataFrame(_empty)
        rev = b.loc[b["src"] != b["dst"], ["src", "dst"]].rename(
            columns={"src": "dst", "dst": "src"})
        return pd.concat([b[["src", "dst"]], rev[["src", "dst"]]],
                         ignore_index=True)

    edges = und.map_batches(both_dirs, batch_format="pandas")
    return pagerank(edges, src="src", dst="dst", n_buckets=n_buckets)


def sql_doc_textrank(iters: int = 3) -> str:
    ctes = [f"""tk AS (
  SELECT regexp_extract_all(lower(text), '{TOKEN_RE}') AS tk
  FROM documents),
adj AS (
  SELECT unnest(list_transform(range(1, len(tk)),
    i -> CASE WHEN tk[i] <= tk[i+1] THEN tk[i] || ' ' || tk[i+1]
              ELSE tk[i+1] || ' ' || tk[i] END)) AS pr
  FROM tk),
p AS (
  SELECT DISTINCT split_part(pr, ' ', 1) AS a, split_part(pr, ' ', 2) AS b
  FROM adj
  WHERE length(split_part(pr, ' ', 1)) >= 3
    AND length(split_part(pr, ' ', 2)) >= 3),
e AS (
  SELECT DISTINCT src, dst FROM (
    SELECT a AS src, b AS dst FROM p
    UNION ALL SELECT b, a FROM p)),
nodes AS (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM e UNION ALL SELECT dst FROM e)),
deg AS (SELECT src AS id, count(*) AS deg FROM e GROUP BY src),
meta AS (SELECT count(*) AS n FROM nodes),
it0 AS (SELECT id, 1000000000000 // (SELECT n FROM meta) AS r FROM nodes)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""it{i} AS (
  SELECT nd.id,
         150000000000 // (SELECT n FROM meta)
           + (85 * coalesce(s.inb, 0)) // 100 AS r
  FROM nodes nd LEFT JOIN (
    SELECT e.dst AS id, sum(p.r // d.deg) AS inb
    FROM e JOIN it{i-1} p ON e.src = p.id JOIN deg d ON d.id = e.src
    GROUP BY e.dst) s ON nd.id = s.id)""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT id, CAST(r AS BIGINT) AS rank_units FROM it{iters}")


# --------------------------------------- per-source n-gram diversity

def distinct_ngrams(docs, n: int = 3, n_buckets: int = 64):
    """Per-source distinct word-n-gram diversity -> (source, total_ngrams,
    distinct_ngrams, diversity): the distinct-n generation-diversity /
    templating-detection metric (a boilerplate-heavy source shows a low
    distinct-over-total ratio). Tokens are the vocab TOKEN_RE convention;
    only full n-grams count (docs shorter than n tokens contribute none).

    Shape: per-batch vectorized gram construction (token explode + two
    shifted object-array concats — no per-doc Python loop) pre-aggregated
    to (source, gram, c) combiner rows, ONE (source, gram)-bucketed
    exchange whose merge emits enum-bounded per-source partials (buckets
    partition the gram space, so per-bucket distinct counts sum exactly),
    and a driver-grain fold with the single diversity division."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "source": pd.Series([], dtype=object),
            "gram": pd.Series([], dtype=object),
            "c": pd.Series([], dtype="int64"),
        })
        toks = b["text"].str.lower().str.findall(TOKEN_RE)
        lens = toks.str.len().to_numpy(np.int64)
        flat = toks.explode().dropna()
        if len(flat) < n:
            return empty
        tok = np.asarray(flat.to_numpy(), dtype=object)
        di = np.repeat(np.arange(len(b), dtype=np.int64), lens)
        if n == 1:
            # unigrams: every token is a gram (the n>=2 slice arithmetic
            # would compute tok[:-(0)] == tok[:0] and emit nothing)
            grams = tok
            src = b["source"].to_numpy()[di]
        else:
            ok = di[: -(n - 1)] == di[n - 1:]  # all n positions in one doc
            if not ok.any():
                return empty
            grams = tok[: -(n - 1)][ok]
            for j in range(1, n):
                shifted = tok[j: len(tok) - (n - 1) + j] if j < n - 1 \
                    else tok[n - 1:]
                grams = grams + " " + shifted[ok]
            src = b["source"].to_numpy()[di[: -(n - 1)][ok]]
        out = pd.DataFrame({"source": src, "gram": grams})
        return (out.groupby(["source", "gram"], sort=False).size()
                .rename("c").reset_index())

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "source" not in g.columns:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "total": pd.Series([], dtype="int64"),
                "distinct": pd.Series([], dtype="int64"),
            })
        per = g.groupby("source", as_index=False).agg(
            total=("c", "sum"), distinct=("gram", "nunique"))
        return per.astype({"total": "int64", "distinct": "int64"})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        if len(b) == 0 or "source" not in b.columns:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "total_ngrams": pd.Series([], dtype="int64"),
                "distinct_ngrams": pd.Series([], dtype="int64"),
                "diversity": pd.Series([], dtype="float64"),
            })
        per = b.groupby("source", as_index=False).sum()
        d = per["distinct"].to_numpy(np.int64)
        t = per["total"].to_numpy(np.int64)
        return pd.DataFrame({
            "source": per["source"],
            "total_ngrams": t,
            "distinct_ngrams": d,
            "diversity": d.astype(np.float64) / t,  # ONE division
        })

    return (bucketed_apply(docs.select_columns(["source", "text"]),
                           ["source", "gram"], merge, partial, n_buckets)
            .repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def sql_distinct_ngrams(n: int = 3) -> str:
    return f"""
WITH toks AS (
  SELECT source, regexp_extract_all(lower(text), '{TOKEN_RE}') AS tk
  FROM documents),
g AS (
  SELECT source,
         unnest(list_transform(range(1, len(tk) - {n - 2}),
           i -> {" || ' ' || ".join(f"tk[i + {j}]" if j else "tk[i]"
                                    for j in range(n))})) AS gram
  FROM toks WHERE len(tk) >= {n})
SELECT source, CAST(count(*) AS BIGINT) AS total_ngrams,
       CAST(count(DISTINCT gram) AS BIGINT) AS distinct_ngrams,
       CAST(count(DISTINCT gram) AS DOUBLE) / count(*) AS diversity
FROM g GROUP BY source"""


# ------------------------------------ cross-source vocabulary overlap

def source_vocab_jaccard(docs, n_buckets: int = 64):
    """Pairwise vocabulary Jaccard between sources -> (src_a, src_b,
    n_a, n_b, n_common, jaccard) for src_a < src_b: the corpus-mixing
    diagnostic (near-identical vocabularies flag mirrored / templated
    sources; disjoint ones flag domain or language splits).

    Shape: per-batch distinct (source, term) combiner rows -> ONE
    term-bucketed exchange; each bucket computes its local per-source
    vocab sizes AND per-pair intersection counts from a terms x sources
    membership pivot (term sets are disjoint across buckets, so both
    partials sum exactly) -> enum-pair-bounded fold with the single
    Jaccard division. The vocabulary itself is never broadcast and never
    leaves its bucket — only O(sources^2) count rows move."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].str.lower().str.findall(TOKEN_RE)
        flat = toks.explode().dropna()
        if len(flat) == 0:
            return pd.DataFrame({
                "source": pd.Series([], dtype=object),
                "term": pd.Series([], dtype=object),
            })
        out = pd.DataFrame({
            "source": b["source"].loc[flat.index].to_numpy(),
            "term": flat.to_numpy(),
        })
        return out.drop_duplicates()

    _partial_empty = {
        "src_a": pd.Series([], dtype=object),
        "src_b": pd.Series([], dtype=object),
        "n_a": pd.Series([], dtype="int64"),
        "n_common": pd.Series([], dtype="int64"),
    }

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        if len(g) == 0 or "source" not in g.columns:
            return pd.DataFrame(_partial_empty)
        g = g.drop_duplicates(["source", "term"])
        # terms x sources membership pivot: bucket-local, source-bounded
        m = pd.crosstab(g["term"], g["source"]).astype(np.int64)
        srcs = sorted(m.columns)
        mv = m[srcs].to_numpy()
        inter = mv.T @ mv  # sources x sources co-membership counts
        rows = {"src_a": [], "src_b": [], "n_a": [], "n_common": []}
        for i, sa in enumerate(srcs):
            # diagonal row carries the per-source vocab-size partial
            rows["src_a"].append(sa)
            rows["src_b"].append(sa)
            rows["n_a"].append(int(inter[i, i]))
            rows["n_common"].append(0)
            for j in range(i + 1, len(srcs)):
                rows["src_a"].append(sa)
                rows["src_b"].append(srcs[j])
                rows["n_a"].append(0)
                rows["n_common"].append(int(inter[i, j]))
        out = pd.DataFrame(rows)
        return out.astype({"n_a": "int64", "n_common": "int64"})

    def fold(b: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({
            "src_a": pd.Series([], dtype=object),
            "src_b": pd.Series([], dtype=object),
            "n_a": pd.Series([], dtype="int64"),
            "n_b": pd.Series([], dtype="int64"),
            "n_common": pd.Series([], dtype="int64"),
            "jaccard": pd.Series([], dtype="float64"),
        })
        if len(b) == 0 or "src_a" not in b.columns:
            return empty
        agg = b.groupby(["src_a", "src_b"], as_index=False).sum()
        sizes = {r.src_a: int(r.n_a)
                 for r in agg[agg["src_a"] == agg["src_b"]]
                 .itertuples(index=False)}
        pairs = agg[agg["src_a"] != agg["src_b"]]
        # vocabulary-disjoint pairs (zero shared terms) are absent from the
        # oracle's inner join on term — drop them so engine and oracle agree
        # even when two sources share no vocabulary at all
        pairs = pairs[pairs["n_common"].astype("int64") > 0]
        if len(pairs) == 0:
            return empty
        na = pairs["src_a"].map(sizes).fillna(0).astype(np.int64)
        nb = pairs["src_b"].map(sizes).fillna(0).astype(np.int64)
        nc = pairs["n_common"].astype(np.int64)
        union = na + nb - nc
        out = pd.DataFrame({
            "src_a": pairs["src_a"].to_numpy(),
            "src_b": pairs["src_b"].to_numpy(),
            "n_a": na.to_numpy(),
            "n_b": nb.to_numpy(),
            "n_common": nc.to_numpy(),
            "jaccard": nc.to_numpy(np.float64) / union.to_numpy(),
        })
        return out[union.to_numpy() > 0].sort_values(
            ["src_a", "src_b"], kind="mergesort").reset_index(drop=True)

    return (bucketed_apply(docs.select_columns(["source", "text"]),
                           ["term"], merge, partial, n_buckets)
            .repartition(1)
            .map_batches(fold, batch_format="pandas", batch_size=None))


def sql_source_vocab_jaccard() -> str:
    return f"""
WITH v AS (
  SELECT DISTINCT source,
         unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents),
sz AS (SELECT source, count(*) AS n FROM v GROUP BY source),
inter AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
  FROM v a JOIN v b ON a.term = b.term AND a.source < b.source
  GROUP BY a.source, b.source)
SELECT i.src_a, i.src_b,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       CAST(i.n_common AS BIGINT) AS n_common,
       CAST(i.n_common AS DOUBLE) / (sa.n + sb.n - i.n_common) AS jaccard
FROM inter i JOIN sz sa ON sa.source = i.src_a
             JOIN sz sb ON sb.source = i.src_b
WHERE sa.n + sb.n - i.n_common > 0"""


# ----------------------------------------------------- Zipf-law fit

def zipf_fit(docs, k: int = 100, n_buckets: int = 64):
    """Zipf rank-frequency fit over the global top-k vocabulary -> ONE
    row (k, slope, intercept): OLS of ln(tf) against ln(rank) — the
    corpus-health check (natural text slopes ~ -1; template/spam-heavy
    corpora flatten, truncated vocabularies steepen).

    The fact-scale work is exactly vocab_topk's shape (per-batch count
    combiner -> term-bucketed sum -> per-bucket top-k cap); only the
    k-bounded rank table reaches the driver. The four transcendental
    moment sums fold sequentially in rank order with libm ln on both
    sides (events_type_hour_mi doctrine), then slope/intercept use the
    IDENTICAL operation order as the oracle."""
    import math

    top = pd.DataFrame(vocab_topk(docs, k, n_buckets).take_all())
    top = top.sort_values("rk", kind="mergesort")  # k-bounded
    sx = sy = sxy = sxx = 0.0
    for r in top.itertuples(index=False):
        x = math.log(float(int(r.rk)))
        y = math.log(float(int(r.tf)))
        sx += x
        sy += y
        sxy += x * y
        sxx += x * x
    kd = float(len(top))
    slope = (kd * sxy - sx * sy) / (kd * sxx - sx * sx)
    intercept = (sy - slope * sx) / kd
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "k": pa.array([len(top)], pa.int64()),
        "slope": pa.array([slope], pa.float64()),
        "intercept": pa.array([intercept], pa.float64()),
    }))


def sql_zipf_fit(k: int = 100) -> str:
    return f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS term
  FROM documents),
counts AS (SELECT term, count(*) AS tf FROM toks GROUP BY term),
topk AS (
  SELECT rk, tf FROM (
    SELECT tf, row_number() OVER (ORDER BY tf DESC, term) AS rk
    FROM counts
  ) WHERE rk <= {k}),
s AS (
  SELECT CAST(count(*) AS DOUBLE) AS kd,
         CAST(count(*) AS BIGINT) AS kn,
         list_sum(list(ln(CAST(rk AS DOUBLE)) ORDER BY rk)) AS sx,
         list_sum(list(ln(CAST(tf AS DOUBLE)) ORDER BY rk)) AS sy,
         list_sum(list(ln(CAST(rk AS DOUBLE)) * ln(CAST(tf AS DOUBLE))
                       ORDER BY rk)) AS sxy,
         list_sum(list(ln(CAST(rk AS DOUBLE)) * ln(CAST(rk AS DOUBLE))
                       ORDER BY rk)) AS sxx
  FROM topk)
SELECT kn AS k,
       (kd * sxy - sx * sy) / (kd * sxx - sx * sx) AS slope,
       (sy - ((kd * sxy - sx * sy) / (kd * sxx - sx * sx)) * sx) / kd
         AS intercept
FROM s"""
