"""Generator + oracle sanity: duplicate classes land in their expected
tier bands (FIXTURES.md §1) and the corpus is deterministic."""

from __future__ import annotations

import pandas as pd

from pipeline import oracle, synth


def test_determinism():
    a = synth.generate(n_base=30, seed=11)
    b = synth.generate(n_base=30, seed=11)
    pd.testing.assert_frame_equal(a.turns, b.turns)
    pd.testing.assert_frame_equal(a.true_pairs, b.true_pairs)


def test_schema_matches_input_hint():
    c = synth.generate(n_base=5, seed=1)
    assert list(c.turns.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(c.turns["turn_idx"].dtype) == "int32"
    assert c.turns["ts"].dtype.kind == "M"


def test_class_bands(corpus):
    labeled = oracle.oracle_labels(corpus.turns, corpus.true_pairs)
    m = labeled.merge(
        corpus.true_pairs, on=["conv_id_a", "conv_id_b"], suffixes=("", "_truth")
    )
    by_class = m.groupby("dup_class")

    # exact-equivalent classes reach the exact tier
    for cls in ["exact", "norm_eq"]:
        grp = by_class.get_group(cls)
        assert (grp["tier"] == "exact").mean() >= 0.95, cls

    # duplicate classes match at >= 95% (reference acceptance, README.md:283)
    dup = m[m["dup_class"].isin(
        ["exact", "norm_eq", "token_swap", "typo", "truncate", "heavy"]
    )]
    assert dup["is_match"].mean() >= 0.95

    # distractors stay below threshold (FIXTURES.md §4: ~zero matches)
    dis = by_class.get_group("distractor")
    assert dis["is_match"].mean() <= 0.10


def test_oracle_generator_agreement(corpus):
    labeled = oracle.oracle_labels(corpus.turns, corpus.true_pairs)
    m = labeled.merge(
        corpus.true_pairs, on=["conv_id_a", "conv_id_b"], suffixes=("", "_truth")
    )
    assert (m["is_match"] == m["is_match_truth"]).mean() >= 0.98
