"""Extractor rule registry (§2.10 user-extension surface) + null safety."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from robokop_build_ray.stages.extract import (
    DEFAULT_RULE,
    EXTRACT_RULES,
    ExtractRule,
    extract_stage,
    extract_triples_batch,
)


def _transcripts(texts):
    return pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array(range(len(texts)), pa.int32()),
            "role": pa.array(["user"] * len(texts)),
            "text": pa.array(texts, pa.string()),
            "tool": pa.array([""] * len(texts)),
        }
    )


def test_null_and_empty_text_are_safe():
    t = _transcripts(["Aspirin treats Headache.", None, "", "no triples here."])
    out = extract_triples_batch(t)
    assert out.num_rows == 1
    assert out["subj"][0].as_py() == "Aspirin"


def test_custom_rule_registration():
    rule = ExtractRule(
        "inhibits", r"([A-Za-z][A-Za-z0-9 ]*?) (inhibits|activates) "
                    r"([A-Za-z][A-Za-z0-9 ]*?)\.",
        {"inhibits": "inhibits", "activates": "activates"},
    )
    try:
        EXTRACT_RULES[rule.name] = rule
        ds = rd.from_arrow(
            _transcripts(["FooKinase inhibits BarGene.",
                          "X activates Y. A treats B."])
        )
        rows = sorted(
            (r["subj"], r["pred"], r["obj"])
            for r in extract_stage(
                ds, rule_names=("triple_pattern", "inhibits")
            ).take_all()
        )
        assert rows == [
            ("A", "treats", "B"),
            ("FooKinase", "inhibits", "BarGene"),
            ("X", "activates", "Y"),
        ]
    finally:
        EXTRACT_RULES.pop("inhibits", None)


def test_default_registry_contents():
    assert EXTRACT_RULES["triple_pattern"] is DEFAULT_RULE
