"""Table profiling: hand-checkable stats incl. the null path (the driver
testdata carries no NULLs, so this is the only coverage of n_null)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from robokop_build_ray.stages.profile import table_profile


def test_profile_hand_values_with_nulls():
    df = pd.DataFrame({
        "x": [1.0, 2.0, 2.0, np.nan, 5.0],
        "y": [10, 10, 10, 10, 10],
    })
    ds = rd.from_pandas(df).repartition(3)  # exercise partial merge
    rows = {r["column_name"]: r
            for r in table_profile(ds, ["x", "y"], n_buckets=4).take_all()}
    x = rows["x"]
    assert (x["n"], x["n_null"], x["n_distinct"]) == (5, 1, 3)
    assert (x["min_v"], x["max_v"]) == (1.0, 5.0)
    y = rows["y"]
    assert (y["n"], y["n_null"], y["n_distinct"]) == (5, 0, 1)
    assert (y["min_v"], y["max_v"]) == (10.0, 10.0)


def test_duplicate_ngrams_planted():
    import ray.data as rd

    from robokop_build_ray.stages.dedup import duplicate_ngrams

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    docs = rd.from_items([
        {"doc_id": 1, "text": f"{shared} tail one"},
        {"doc_id": 2, "text": f"lead {shared} and {shared}"},
        {"doc_id": 3, "text": "совершенно unrelated text with nothing shared here at all"},
        {"doc_id": 4, "text": "short doc"},
    ])
    rows = duplicate_ngrams(docs, window=8, n_buckets=4,
                            parity=True).take_all()
    import hashlib

    g = hashlib.md5(shared.encode()).hexdigest()
    got = {r["gram"]: (r["n_docs"], r["n_occurrences"]) for r in rows}
    # the planted 8-gram: docs {1,2}, 3 occurrences (doc 2 has it twice)
    assert got[g] == (2, 3)
    # every reported gram spans >= 2 docs
    assert all(nd >= 2 for nd, _ in got.values())
    # default fast mode (vectorized siphash grams): identical count
    # structure — same number of duplicated spans, same count multiset
    fast = duplicate_ngrams(docs, window=8, n_buckets=4,
                            parity=False).take_all()
    assert sorted((r["n_docs"], r["n_occurrences"]) for r in fast) == \
        sorted(got.values())
    import numpy as np

    from robokop_build_ray.stages.text_analysis import window_hashes_numeric

    # fast grams are the numeric polynomial window hashes (int64 view)
    hs, counts = window_hashes_numeric([shared], 8)
    assert list(counts) == [1]
    gh = int(hs.view(np.int64)[0])
    fast_got = {r["gram"]: (r["n_docs"], r["n_occurrences"]) for r in fast}
    assert fast_got[gh] == (2, 3)
