"""Worked examples: REFERENCE arithmetic computed BY HAND (plain literals,
no shared pipeline code) asserted against BOTH the pandas oracle and the
Spark Column expressions.

Each expected value below was derived manually from
``optimized.py:686-737`` (weighted confidence), ``:659-673`` (house
penalty ladder), ``:191-218`` (exact predicate) and
``ultimate_address_matcher.py:760-838, 845-864, 910-921``
(quality/reliability/warnings + post-clamp unit bonus), using the default
weights street .40 / house .25 / city .15 / zip .10 / state .05 /
unit .05 (optimized.py:115-121) under the declared channel mapping
street->token_sort, house->num, city->partial, zip->jaccard, jaro->state,
unit->struct, similarity->text.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pipeline import oracle
from pipeline.config import DEFAULT_CONFIG
from pipeline.scoring import CHANNELS, with_decisions

# (case, s-dict, expected confidence) — the arithmetic for each expected
# value is written out in the comment so it can be re-checked by hand.
CASES = [
    # house present & poor -> early return min(house, 70) (OPT:703-706)
    ("house_poor_65", dict(token_sort=100, num=65, partial=100, jaccard=100, jaro=100, struct=100, text=100), 65.0),
    ("house_poor_75", dict(token_sort=100, num=75, partial=100, jaccard=100, jaro=100, struct=100, text=100), 70.0),
    # house absent (0) -> NO house cap; street poor -> min(street, 60) (OPT:708-710)
    ("street_poor_55", dict(token_sort=55, num=0, partial=100, jaccard=100, jaro=100, struct=100, text=100), 55.0),
    ("street_poor_68", dict(token_sort=68, num=0, partial=100, jaccard=100, jaro=100, struct=100, text=100), 60.0),
    # no caps: ws = 92*.40 + 95*.25 + 80*.15 + 60*.10 + 88*.05 + 100*.05
    #             = 36.8 + 23.75 + 12.0 + 6.0 + 4.4 + 5.0 ~= 87.95 ; > 85
    # but house 95>=90 and street 92>=85 -> no post-hoc caps. (Expected
    # values are written as the accumulation the formula performs — hand-
    # derived term by term — because the decimal sums are not exact in FP.)
    ("no_caps", dict(token_sort=92, num=95, partial=80, jaccard=60, jaro=88, struct=100, text=100),
     (((((92 * 0.40 + 95 * 0.25) + 80 * 0.15) + 60 * 0.10) + 88 * 0.05) + 100 * 0.05)
     / (((((0.40 + 0.25) + 0.15) + 0.10) + 0.05) + 0.05)),
    # ws = 36.8 + 85*.25(=21.25) + 12 + 6 + 4.4 + 5 ~= 85.45 > 85 and house
    # 85 in (0,90) -> post-hoc cap min(ws, 75) = 75 (OPT:728-732)
    ("posthoc_house_guard", dict(token_sort=92, num=85, partial=80, jaccard=60, jaro=88, struct=100, text=100), 75.0),
    # ws = 84*.40(=33.6) + 23.75 + 12 + 6 + 4.4 + 5 ~= 84.75 — NOT > 85,
    # so no post-hoc caps apply even though street 84 < 85
    ("below_posthoc_threshold", dict(token_sort=84, num=95, partial=80, jaccard=60, jaro=88, struct=100, text=100),
     (((((84 * 0.40 + 95 * 0.25) + 80 * 0.15) + 60 * 0.10) + 88 * 0.05) + 100 * 0.05)
     / (((((0.40 + 0.25) + 0.15) + 0.10) + 0.05) + 0.05)),
    # absent house (weight -> 0), city 0 (weight -> 0), zip 30 < 50
    # (channel dropped): weights used .40+.05+.05 = .50;
    # score = 100*.40 + 80*.05 + 100*.05 = 49.0 ; ws = 49/.50 = 98.0
    # (zero-weight terms add exactly 0.0, so they are omitted here)
    ("absent_channels", dict(token_sort=100, num=0, partial=0, jaccard=30, jaro=80, struct=100, text=100),
     ((100 * 0.40 + 80 * 0.05) + 100 * 0.05)
     / ((((0.40 + 0.0) + 0.0) + 0.05) + 0.05)),
    # zip 49.999 dropped: weights .40+.25+.15+.05+.05 = .90;
    # score = 40 + 25 + 70*.15(=10.5) + 100*.05 + 100*.05 = 85.5 ;
    # ws = 85.5/.90 = 95.0 ; house 100, street 100 -> stays
    ("zip_just_dropped", dict(token_sort=100, num=100, partial=70, jaccard=49.999, jaro=100, struct=100, text=100),
     ((((100 * 0.40 + 100 * 0.25) + 70 * 0.15) + 100 * 0.05) + 100 * 0.05)
     / ((((0.40 + 0.25) + 0.15) + 0.05) + 0.05)),
    # zip exactly 50 KEPT: weights .40+.15+.10+.05+.05 = .75 (house absent);
    # score = 90*.40 + 50*.15 + 50*.10 + 50*.05 + 50*.05 = 53.5 ; ws = 53.5/.75
    ("zip_kept_at_50", dict(token_sort=90, num=0, partial=50, jaccard=50, jaro=50, struct=50, text=100),
     ((((90 * 0.40 + 50 * 0.15) + 50 * 0.10) + 50 * 0.05) + 50 * 0.05)
     / (((((0.40 + 0.0) + 0.15) + 0.10) + 0.05) + 0.05)),
]


@pytest.mark.parametrize("name,s,expected", CASES, ids=[c[0] for c in CASES])
def test_oracle_confidence_matches_hand_arithmetic(name, s, expected):
    got = oracle.weighted_confidence({k: float(v) for k, v in s.items()})
    assert got == expected, (name, got, expected)


def _spark_decisions(spark, cases):
    rows = []
    for name, s, _ in cases:
        rows.append(
            {
                "case": name,
                **{f"s_{c}": float(s[c]) for c in CHANNELS},
                "_norm_a": "hello 123 conversation text",
                "_norm_b": "hello 123 conversation text two",
                "_roles_a": "ua",
                "_roles_b": "ua",
            }
        )
    df = spark.createDataFrame(pd.DataFrame(rows))
    return {
        r["case"]: r
        for r in with_decisions(df, DEFAULT_CONFIG).collect()
    }


def test_spark_confidence_matches_hand_arithmetic(spark):
    got = _spark_decisions(spark, CASES)
    for name, _s, expected in CASES:
        assert got[name]["confidence"] == expected, (
            name,
            got[name]["confidence"],
            expected,
        )


def test_house_penalty_ladder_hand_example():
    """F9 (OPT:659-673) on digit signatures: '123 456' vs '123 457' —
    InDel: LCS=6 of len 7+7 -> distance 14-12=2 -> ratio 100*(1-2/14)
    = 85.714..., < 90 -> ladder subtracts 20."""
    s = oracle.component_scores("go to 123 then 456", "go to 123 then 457", "ua", "ua")
    expected = 100.0 * (1.0 - 2.0 / 14.0) - 20.0
    assert s["num"] == expected
    # and absent-on-one-side -> 0 (no penalty, no cap)
    s2 = oracle.component_scores("go to 123 then 456", "go to x then y", "ua", "ua")
    assert s2["num"] == 0.0


def test_street_is_reorder_invariant_exact_first():
    """OPT:634-639: normalized-equal OR sorted-token-equal -> 100."""
    s = oracle.component_scores("alpha beta gamma", "gamma alpha beta", "ua", "ua")
    assert s["token_sort"] == 100.0
    assert s["text"] < 100.0  # overall similarity sees the reorder


QUALITY_S = dict(
    token_sort=100.0, num=100.0, partial=90.0, jaccard=80.0,
    jaro=95.0, struct=100.0, text=100.0,
)
# confidence: 40 + 25 + 13.5 + 8 + 4.75 + 5 = 96.25 (no caps)
# quality (UAM:760-838): base = 96.25
#   +20 street presence (norm_b non-empty)   -> 116.25
#   +15 house presence (digits in norm_b)    -> 131.25
#   +30 unit presence (roles_b non-empty)    -> 161.25
#   +10 city (partial > 0)                   -> 171.25
#   +5 state (jaro > 0)                      -> 176.25
#   +5 zip (jaccard >= 50)                   -> 181.25
#   +min(es/10, 20) with es = 10*1 family    -> 182.25
#   +min(100/5, 15) similarity bonus         -> 197.25
#   +0 exact-level adjustment                -> 197.25
#   clamp [0,100]                            -> 100.0
#   POST-clamp unit bonus +50 (roles equal, UAM:910-921) -> 150.0
EXPECTED_QUALITY = 150.0


def test_quality_clamp_order_quirk_hand_example(spark):
    conf = oracle.weighted_confidence(QUALITY_S)
    assert conf == 96.25
    tier = oracle.assign_tier(conf)
    assert tier == "exact"
    q, band, warnings = oracle.quality_warnings(
        QUALITY_S, conf, tier,
        norm_a="hello 123 conversation text",
        norm_b="hello 123 conversation text two",
        roles_a="ua", roles_b="ua", n_families=1,
    )
    assert q == EXPECTED_QUALITY  # exceeds 100: clamp-BEFORE-bonus quirk
    assert band == "high"
    assert warnings == []
    assert oracle.is_exact(QUALITY_S, conf)

    got = _spark_decisions(spark, [("q", QUALITY_S, None)])["q"]
    assert got["quality"] == EXPECTED_QUALITY
    assert got["reliability"] == "high"
    assert got["is_exact"] is True
    assert got["unit_exact"] is True


def test_wrong_unit_penalty_goes_below_clamp(spark):
    """UAM:919-921: matched side HAS a unit but it differs -> -20 AFTER
    the clamp; a quality clamped to 0 goes to -20."""
    s = dict(token_sort=10.0, num=0.0, partial=0.0, jaccard=0.0,
             jaro=0.0, struct=40.0, text=10.0)
    conf = oracle.weighted_confidence(s)
    assert conf == 10.0  # street cap: min(10, 60)
    tier = oracle.assign_tier(conf)  # desperate (>=5)
    q, band, warnings = oracle.quality_warnings(
        s, conf, tier,
        norm_a="zz", norm_b="completely different words",
        roles_a="ua", roles_b="au", n_families=1,
    )
    # base = 10 + 20(street) + 0(no digits) + 30(unit present) + 0 + 0 + 0
    #        + 1(es) + 2(sim 10/5) - 75(desperate) - 30(too_short query)
    #      = -42 -> clamp 0 -> wrong-unit -20 -> -20
    assert q == -20.0
    assert band == "speculative"
    assert warnings == ["low_confidence_level", "low_similarity"]
