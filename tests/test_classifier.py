"""Distributed logistic-regression trainer: bit-identity + learning."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from robokop_build_ray.stages import classifier

SF = "/root/testdata/sf0.001"


def test_lr_fit_bit_identical_across_parallelism(ray_session):
    want = classifier.lr_fit_sequential(SF, iters=5)
    for parts in (1, 7):
        docs = rd.read_parquet(f"{SF}/documents.parquet").repartition(parts)
        got = classifier.lr_fit(docs, iters=5)
        assert got.tolist() == want.tolist(), parts  # exact, not allclose


def test_lr_learns_planted_signal(ray_session):
    # planted separable corpus: 'en' docs are stopword-dense, non-en docs
    # stopword-free with longer tokens — the trainer must find the signal
    # (the driver-table label is deliberately NOT learnable from text;
    # the doc_lr_quality oracle checks trainer EXACTNESS, this checks
    # that the same machinery can actually learn)
    rows = []
    for i in range(120):
        if i % 2 == 0:
            rows.append({"doc_id": i, "lang": "en",
                         "text": "the cat and the dog is of the was and "
                                 "the end of the day is was " * 2})
        else:
            rows.append({"doc_id": i, "lang": "de",
                         "text": "zugzwang weltanschauung schadenfreude "
                                 "kindergarten doppelganger wanderlust "
                                 "zeitgeist " * 3})
    docs = rd.from_items(rows).repartition(4)
    scored = {r["doc_id"]: r["pred"]
              for r in classifier.lr_train_and_score(docs).take_all()}
    acc = float(np.mean([scored[i] == (i % 2 == 0) for i in range(120)]))
    assert acc == 1.0, acc


def test_lr_scores_deterministic(ray_session):
    docs = rd.read_parquet(f"{SF}/documents.parquet")
    w = classifier.lr_fit(docs, iters=3)
    a = sorted((r["doc_id"], r["logit_q"]) for r in
               classifier.lr_scores(docs, w).take_all())
    b = sorted((r["doc_id"], r["logit_q"]) for r in
               classifier.lr_scores(docs.repartition(5), w).take_all())
    assert a == b

def test_lr_calibration_separable_corpus(ray_session):
    # same planted separable corpus: calibration must put positives in
    # the top bin (frac_pos 1.0) and negatives in the bottom (0.0), and
    # avg_p must sit inside each bin's probability decile
    rows = []
    for i in range(120):
        if i % 2 == 0:
            rows.append({"doc_id": i, "lang": "en",
                         "text": "the cat and the dog is of the was and "
                                 "the end of the day is was " * 2})
        else:
            rows.append({"doc_id": i, "lang": "de",
                         "text": "zugzwang weltanschauung schadenfreude "
                                 "kindergarten doppelganger wanderlust "
                                 "zeitgeist " * 3})
    docs = rd.from_items(rows).repartition(4)
    got = {r["bin"]: r for r in
           classifier.lr_calibration(docs).take_all()}
    assert sum(r["n"] for r in got.values()) == 120
    lo, hi = min(got), max(got)
    assert got[lo]["n_pos"] == 0 and got[lo]["frac_pos"] == 0.0
    assert got[hi]["n_pos"] == got[hi]["n"]
    assert got[hi]["frac_pos"] == 1.0
    for b, r in got.items():
        assert b / 10 <= r["avg_p"] <= (b + 1) / 10 or b == 9
