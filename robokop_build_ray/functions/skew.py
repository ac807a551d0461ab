"""Skew handling: explicit salted/bucketed shuffles for hot keys (north_rule).

A conversation 100x the median size ("hot conversation", FIXTURES.md F1)
must not serialize a shuffle stage onto one reducer, and Ray Data's native
high-cardinality string-key aggregates pay a large per-key reduce cost
(measured 65 s vs 0.6 s bucketed for a 600k-row pair count — BASELINE.md).
Both problems share one fix — the explicit bucket/salt shuffle implemented
in ``functions.bucketing``:

- row-independent stages (extract, link, canonicalize) need NO conv
  co-location — blocks split freely;
- conv-scoped DISTINCT runs as ``salted_distinct``: the shuffle key is
  ``stable_hash(conv_id, entity) % k`` so a hot conversation's rows spread
  over k reducers; results are provably identical to the single-reducer
  distinct (dedup is idempotent) — asserted by tests/test_skew.py;
- per-conversation PAIR GENERATION bounds per-group work with a hard cap on
  distinct entities per conversation (the reference's own mitigation shape:
  path-scoped pairs, `builder/builder.py:372-407`), so group cost is
  O(cap^2) regardless of conversation length.
"""

from __future__ import annotations

from .bucketing import bucketed_distinct


def salted_distinct(ds, keys: list[str], salt_from: str | None = None,
                    k: int = 64):
    """DISTINCT over ``keys`` with an explicit salted shuffle: bucket =
    stable row-hash of ALL key columns (covers ``salt_from``) mod k, so any
    hot coarse key (e.g. one conv_id) spreads across k reducers."""
    return bucketed_distinct(ds, keys, n_buckets=k)


def plain_distinct(ds, keys: list[str]):
    """Unsalted reference implementation — single reducer (n_buckets=1);
    used by tests to assert salted == unsalted."""
    return bucketed_distinct(ds, keys, n_buckets=1)
