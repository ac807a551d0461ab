"""Bloom prefilter: no false negatives ever; bloom_semi output equals the
exact bucketed_semi; the prefilter actually drops non-matching rows."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from robokop_build_ray.functions.bloom import (BloomFilter, bloom_semi,
                                               build_bloom, _key_hashes)
from robokop_build_ray.functions.bucketing import bucketed_semi


def test_no_false_negatives_dense():
    f = BloomFilter(n_items=500, fpp=0.01)
    added = np.arange(500, dtype=np.int64) * 7919
    f.add_hashes(_key_hashes(added))
    assert f.contains_hashes(_key_hashes(added)).all()


def test_fpp_roughly_bounded():
    f = BloomFilter(n_items=1000, fpp=0.01)
    f.add_hashes(_key_hashes(np.arange(1000, dtype=np.int64)))
    probe = np.arange(100_000, 150_000, dtype=np.int64)
    fp = f.contains_hashes(_key_hashes(probe)).mean()
    assert fp < 0.05  # ~1% nominal; generous bound against hash quirks


def test_merge_equals_single_build():
    a, b = BloomFilter(100, 0.01), BloomFilter(100, 0.01)
    xs = np.arange(50, dtype=np.int64)
    ys = np.arange(50, 100, dtype=np.int64)
    a.add_hashes(_key_hashes(xs))
    b.add_hashes(_key_hashes(ys))
    one = BloomFilter(100, 0.01).add_hashes(
        _key_hashes(np.arange(100, dtype=np.int64)))
    assert (a.merge(b).bits == one.bits).all()


def test_bloom_semi_matches_exact_semi():
    rng = np.random.default_rng(3)
    left = rd.from_pandas(pd.DataFrame({
        "k": rng.integers(0, 1000, size=2000),
        "payload": np.arange(2000)}))
    right = rd.from_pandas(pd.DataFrame(
        {"rk": rng.integers(0, 120, size=300)}))
    exact = sorted((r["k"], r["payload"]) for r in bucketed_semi(
        left, right, "k", "rk", ["k", "payload"], n_buckets=4).take_all())
    got = sorted((r["k"], r["payload"]) for r in bloom_semi(
        left, right, "k", "rk", ["k", "payload"], n_items=200,
        n_buckets=4).take_all())
    assert got == exact and len(got) > 0


def test_build_bloom_streaming_drops_nonmatches():
    right = rd.from_pandas(pd.DataFrame({"rk": np.arange(50)}))
    f = build_bloom(right, "rk", n_items=50, fpp=0.01)
    probe = _key_hashes(np.arange(10_000, 20_000))
    assert f.contains_hashes(probe).mean() < 0.05
    assert f.contains_hashes(_key_hashes(np.arange(50))).all()
