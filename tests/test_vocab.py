"""Vocabulary / index-building operators (stages/vocab.py) vs tiny
hand-computable corpora, plus the KMV distinct sketch."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from robokop_build_ray.functions.sketches import KMinValues, grouped_distinct_count
from robokop_build_ray.stages import vocab


def _corpus():
    return rd.from_items([
        {"doc_id": 1, "text": "apple banana apple Cherry"},
        {"doc_id": 2, "text": "banana cherry cherry date!"},
        {"doc_id": 3, "text": "apple date 42"},
        {"doc_id": 4, "text": ""},
    ])


def test_vocab_topk_counts_and_order():
    out = vocab.vocab_topk(_corpus(), k=3).take_all()
    # totals: apple 3, cherry 3, banana 2, date 2, 42 1
    assert [(r["rk"], r["term"], r["tf"]) for r in out] == [
        (1, "apple", 3), (2, "cherry", 3), (3, "banana", 2)]


def test_doc_tfidf_score_and_cut():
    out = pd.DataFrame(vocab.doc_tfidf(_corpus(), k=2).take_all())
    # doc 2: cherry tf=2 df=2 -> 1.0 beats banana tf=1 df=2 and date tf=1 df=2
    d2 = out[out.doc_id == 2].sort_values("score", ascending=False)
    assert list(d2["term"])[0] == "cherry"
    assert d2.iloc[0]["score"] == 1.0
    assert (out.groupby("doc_id").size() <= 2).all()
    # score is exactly tf/df (single IEEE division)
    assert np.array_equal(out["score"], out["tf"] / out["df"])


def test_inverted_index_band_and_postings():
    out = {r["term"]: r for r in
           vocab.inverted_index(_corpus(), min_df=2, max_df=2).take_all()}
    # df: apple 2, banana 2, cherry 2, date 2, 42 1 -> band [2,2] keeps 4
    assert set(out) == {"apple", "banana", "cherry", "date"}
    assert list(out["apple"]["postings"]) == [1, 3]
    assert out["apple"]["df"] == 2


def test_kmv_exact_below_capacity_and_merge():
    a, b = KMinValues(k=64), KMinValues(k=64)
    a.add_hashes(pd.util.hash_array(np.array(["u1", "u2", "u3"], dtype=object)))
    b.add_hashes(pd.util.hash_array(np.array(["u2", "u4"], dtype=object)))
    assert a.exact and b.exact
    assert a.merge(b).estimate() == 4


def test_grouped_distinct_count_matches_pandas():
    rows = [{"k": f"t{i % 3}", "v": f"u{i % 17}"} for i in range(300)]
    got = {r["k"]: r["n_distinct"]
           for r in grouped_distinct_count(
               rd.from_items(rows), "k", "v", k=256).take_all()}
    want = pd.DataFrame(rows).groupby("k")["v"].nunique().to_dict()
    assert got == want


def test_edit_distance_pairs_planted():
    from robokop_build_ray.stages.dedup import _within_edit1, edit_distance_pairs

    assert _within_edit1("bolt", "bolt")
    assert _within_edit1("bolt", "bolts")      # insertion
    assert _within_edit1("bolt", "bot" + "t")  # substitution
    assert _within_edit1("bolt", "olt")        # deletion
    assert not _within_edit1("bolt", "gear")
    assert not _within_edit1("bolt", "boltss")

    ds = rd.from_items([
        {"doc_id": 1, "text": "red bolt"},
        {"doc_id": 2, "text": "red bolts"},   # 1 edit from doc 1
        {"doc_id": 3, "text": "red bolt"},    # identical to doc 1
        {"doc_id": 4, "text": "blue gear"},
    ])
    got = sorted((r["id_a"], r["id_b"])
                 for r in edit_distance_pairs(ds, n_buckets=4).take_all())
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_lm_score_hand_values():
    """Bigram-LM quality score on a 2-doc corpus, checked by hand:
    counts ab=2 ba=1 ac=1 bb=1; prefixes a=3 b=2; q = floor(1e6*c/cx)."""
    ds = rd.from_items([
        {"doc_id": 0, "text": "a b a c"},
        {"doc_id": 1, "text": "a b b"},
    ])
    got = {r["doc_id"]: r for r in vocab.lm_score(ds, n_buckets=4).take_all()}
    assert got[0]["n_bigrams"] == 3
    assert got[0]["score_sum"] == 666666 + 500000 + 333333
    assert got[0]["avg_p_ppm"] == got[0]["score_sum"] / 3
    assert got[1]["n_bigrams"] == 2
    assert got[1]["score_sum"] == 666666 + 500000
    assert got[1]["avg_p_ppm"] == got[1]["score_sum"] / 2


def test_repetition_stats_hand_values():
    from robokop_build_ray.stages.text_analysis import repetition_batch

    b = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["a b a b a b", "x y z", "solo"],
    })
    out = repetition_batch(b).set_index("doc_id")
    # doc 0: bigrams ab,ba,ab,ba,ab -> top 3/5; trigrams aba,bab,aba,bab
    # all duplicated -> 4/4
    assert out.loc[0, "n_bigrams"] == 5
    assert out.loc[0, "top_bigram_c"] == 3
    assert out.loc[0, "top_bigram_frac"] == 3 / 5
    assert out.loc[0, "n_trigrams"] == 4
    assert out.loc[0, "dup_trigram_c"] == 4
    assert out.loc[0, "dup_trigram_frac"] == 1.0
    # doc 1: no repeats
    assert out.loc[1, "n_bigrams"] == 2
    assert out.loc[1, "top_bigram_frac"] == 0.5
    assert out.loc[1, "dup_trigram_c"] == 0
    # doc 2: single token -> all zeros
    assert out.loc[2].tolist() == [0, 0, 0.0, 0, 0, 0.0]


def test_bpe_merge_loop_sennrich_example():
    # the classic corpus from Sennrich et al. (2016): 'es' dominates,
    # then chains to 'est' and 'est</w>'; tie (l,o)=7 beats (e,w)... and
    # at equal counts the lexicographically smaller pair wins
    merges = vocab._bpe_merge_loop(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6)
    assert merges[:3] == [(1, "e", "s", 9), (2, "es", "t", 9),
                          (3, "est", "</w>", 9)]
    assert merges[3] == (4, "l", "o", 7)
    assert merges[4] == (5, "lo", "w", 7)


def test_bpe_merge_loop_tiebreak_and_exhaustion():
    # 'ab' and 'cd' both appear once: lexicographic tie-break picks (a,b)
    merges = vocab._bpe_merge_loop({"ab": 1, "cd": 1}, 100)
    assert merges[0][1:3] == ("a", "b")
    # requesting more merges than exist terminates when pairs run out
    # (every word eventually collapses to a single symbol)
    assert len(merges) < 100
    assert merges[-1][3] >= 1


def test_bpe_train_distributed_matches_loop(ray_session):
    docs = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(
            ["low low low low low lower lower",
             "newest newest newest newest newest newest",
             "widest widest widest"])]
    ).repartition(3)
    got = vocab.bpe_train(docs, n_merges=6).take_all()
    want = vocab._bpe_merge_loop(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6)
    assert [(r["rank"], r["left"], r["right"], r["pair_count"])
            for r in got] == want


def test_bpe_train_cap_warns(ray_session):
    import warnings

    docs = rd.from_items(
        [{"doc_id": i, "text": f"unique{i} shared shared"}
         for i in range(20)])
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        got = vocab.bpe_train(docs, n_merges=3, max_vocab_words=5).take_all()
    assert any("capping" in str(x.message) for x in w)
    # 'shared' (count 40) survives the cap and drives the first merges
    assert got[0]["pair_count"] >= 40


def test_grouped_set_overlap_exact_hand_values():
    from robokop_build_ray.functions.sketches import grouped_set_overlap

    # A users {1,2,3}, B users {2,3,4,5}, C users {9}
    rows = ([{"t": "A", "u": x} for x in (1, 2, 3)]
            + [{"t": "B", "u": x} for x in (2, 3, 4, 5, 5)]
            + [{"t": "C", "u": 9}])
    got = {(r["type_a"], r["type_b"]):
           (r["n_a"], r["n_b"], r["n_union"], r["n_intersect"])
           for r in grouped_set_overlap(rd.from_items(rows), "t", "u",
                                        k=64).take_all()}
    assert got == {("A", "B"): (3, 4, 5, 2),
                   ("A", "C"): (3, 1, 4, 0),
                   ("B", "C"): (4, 1, 5, 0)}


def test_bpe_encoder_matches_rank_order_application():
    # Sennrich example: encoder's lowest-rank-present loop must equal
    # applying merges in rank order (the oracle's structure).
    merges_raw = vocab._bpe_merge_loop(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 8)
    merges = [(m[0], m[1], m[2]) for m in merges_raw]
    enc = vocab._BpeEncoder(merges, parity=True)
    for w in ["low", "lower", "newest", "widest", "lowest", "new", "zzz"]:
        # independent per-rank-order application
        syms = list(w) + ["</w>"]
        for _, left, right in merges:
            out, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == left
                        and syms[i + 1] == right):
                    out.append(left + right)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        want = (" ".join(syms), len(syms))
        assert enc._encode(w) == want
        assert enc._encode(w) == want  # cached path identical


def test_bpe_encode_e2e_counts_and_hash(ray_session):
    import hashlib

    docs = rd.from_items(
        [{"doc_id": i, "text": t} for i, t in enumerate(
            ["low low low low low lower lower",
             "newest newest newest newest newest newest",
             "widest widest widest", ""])]
    ).repartition(2)
    got = {r["doc_id"]: r for r in
           vocab.bpe_encode(docs, n_merges=6, parity=True).take_all()}
    assert len(got) == 4
    # empty doc: zero tokens, md5 of the empty stream
    assert got[3]["n_bpe_tokens"] == 0
    assert got[3]["tok_hash"] == hashlib.md5(b"").hexdigest()
    # sequential re-derivation of doc 0
    merges = [(m[0], m[1], m[2]) for m in vocab._bpe_merge_loop(
        {"low": 5, "lower": 2, "newest": 6, "widest": 3}, 6)]
    enc = vocab._BpeEncoder(merges, parity=True)
    parts = [enc._encode("low")] * 5 + [enc._encode("lower")] * 2
    stream = " ".join(p[0] for p in parts)
    assert got[0]["n_bpe_tokens"] == sum(p[1] for p in parts)
    assert got[0]["tok_hash"] == hashlib.md5(stream.encode()).hexdigest()
