"""Doc-ops micro-benchmark: hash-path throughput at >=1M documents.

Measures the document hot-path operators (fingerprint, rolling
fingerprint, duplicate n-grams, decontamination) in their DEFAULT
vectorized-siphash mode vs the md5 oracle-parity mode, over a synthetic
corpus of N documents (deterministic, ~40 tokens each). Prints ONE JSON
line; results recorded in BASELINE.md §2.7.

Usage: python tools/bench_docs.py [n_docs]   (default 1_000_000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_docs(n: int):
    """Deterministic doc table: ~40 tokens/doc with cross-doc repeated
    spans (so duplicate_ngrams and decontamination do real work)."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    words = np.array([f"w{i:03d}" for i in range(500)], dtype=object)
    rng = np.random.default_rng(7)
    idx = rng.integers(0, len(words), size=(n, 40))
    # every 10th doc repeats doc 0's middle span (planted duplication)
    idx[::10, 10:20] = idx[0, 10:20]
    texts = np.array([" ".join(row) for row in words[idx]], dtype=object)
    t = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    return rd.from_arrow(t).repartition(64).materialize()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    import ray

    ray.init(address="local",
             num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
             include_dashboard=False, ignore_reinit_error=True,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from robokop_build_ray.functions.ray_utils import (
        silence_empty_block_schema_warnings,
    )

    silence_empty_block_schema_warnings()
    from robokop_build_ray.stages import dedup, text_analysis as ta

    docs = make_docs(n)

    def timed(fn) -> float:
        t0 = time.time()
        fn()
        return round(time.time() - t0, 3)

    out = {"metric": "doc_ops_sec", "n_docs": n, "unit": "sec",
           "queries": {}}
    q = out["queries"]
    q["fingerprint_fast"] = timed(
        lambda: ta.fingerprints(docs, parity=False).count())
    q["fingerprint_md5"] = timed(
        lambda: ta.fingerprints(docs, parity=True).count())
    q["rolling_fp_fast"] = timed(
        lambda: ta.rolling_fingerprints(docs, parity=False).count())
    q["rolling_fp_md5"] = timed(
        lambda: ta.rolling_fingerprints(docs, parity=True).count())
    q["dup_ngrams_fast"] = timed(
        lambda: dedup.duplicate_ngrams(docs, parity=False).count())
    q["dup_ngrams_md5"] = timed(
        lambda: dedup.duplicate_ngrams(docs, parity=True).count())
    q["decontaminate"] = timed(
        lambda: dedup.contamination_check(docs).count())
    for base in ("fingerprint", "rolling_fp", "dup_ngrams"):
        fast, md5 = q[f"{base}_fast"], q[f"{base}_md5"]
        out[f"{base}_speedup"] = round(md5 / fast, 2) if fast else None
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
