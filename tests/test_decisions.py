"""P2 feature-null gates, P5 exact predicate, C3 unit-exact tie-break."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from pipeline.blocking import candidate_pairs, rejected_docs
from pipeline.canonicalize import canonicalize
from pipeline.config import DEFAULT_CONFIG, MatchConfig
from pipeline.features import featurize
from pipeline.linkage import best_matches
from pipeline.scoring import CHANNELS, with_decisions


def _pair_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(rows))


def test_empty_text_pair_cannot_reach_exact(spark):
    """P2 (optimized.py:784-793): two punctuation-only conversations
    normalize to empty text; without the gate they'd score text=100
    (equal strings) -> tier exact. The gate zeroes everything."""
    rows = [
        {
            **{f"s_{c}": 100.0 for c in CHANNELS},
            "_norm_a": "",
            "_norm_b": "",
            "_roles_a": "ua",
            "_roles_b": "ua",
        }
    ]
    out = with_decisions(_pair_df(spark, rows), DEFAULT_CONFIG).collect()[0]
    assert out["confidence"] == 0.0
    assert out["tier"] == "none"
    assert out["is_exact"] is False
    assert out["is_match"] is False
    assert out["quality"] == 0.0
    assert list(out["warnings"]) == ["empty_critical_feature"]


def test_gated_docs_generate_no_blocking_keys(spark):
    """Empty-norm docs are excluded from candidate generation and audited
    (the reference returns the empty MatchResult before retrieval)."""
    turns = pd.DataFrame(
        {
            "conv_id": ["e1", "e1", "e2", "e2", "ok1", "ok1", "ok2", "ok2"],
            "turn_idx": [0, 1] * 4,
            "role": ["user", "assistant"] * 4,
            "text": ["...", "!!!", "???", "...", "hello world foo", "bar baz",
                     "hello world foo", "bar baz"],
            "tool": [None] * 8,
            "ts": pd.to_datetime(["2024-01-01"] * 8),
        }
    )
    feats = featurize(canonicalize(spark.createDataFrame(turns)))
    pairs, _ = candidate_pairs(feats)
    got = pairs.select("conv_id_a", "conv_id_b").toPandas()
    ids = set(got["conv_id_a"]) | set(got["conv_id_b"])
    assert "e1" not in ids and "e2" not in ids
    assert ("ok1" in ids) and ("ok2" in ids)
    rej = rejected_docs(feats).toPandas()
    assert set(rej["conv_id"]) == {"e1", "e2"}
    assert (rej["reason"] == "empty_critical_feature").all()


def test_require_roles_gate(spark):
    cfg = MatchConfig(require_roles=True)
    rows = [
        {
            **{f"s_{c}": 100.0 for c in CHANNELS},
            "_norm_a": "hello world conversation",
            "_norm_b": "hello world conversation",
            "_roles_a": "",
            "_roles_b": "ua",
        }
    ]
    out = with_decisions(_pair_df(spark, rows), cfg).collect()[0]
    assert out["tier"] == "none" and out["is_match"] is False


def test_exact_requires_component_minimums(spark):
    """P5 (optimized.py:191-218): confidence >= 95 alone is NOT exact —
    a present house channel below 95 disqualifies."""
    base = {
        "s_token_sort": 100.0, "s_num": 0.0, "s_partial": 100.0,
        "s_jaccard": 100.0, "s_jaro": 100.0, "s_struct": 100.0,
        "s_text": 100.0,
        "_norm_a": "hello world conversation", "_norm_b": "hello world conversation",
        "_roles_a": "ua", "_roles_b": "ua",
    }
    ok = dict(base)
    bad_house = dict(base, s_num=92.0)      # present but < 95
    bad_sim = dict(base, s_text=94.0)       # similarity < 95
    bad_zip = dict(base, s_jaccard=79.0)    # present but < 80
    out = {
        i: r
        for i, r in enumerate(
            with_decisions(
                _pair_df(spark, [ok, bad_house, bad_sim, bad_zip]),
                DEFAULT_CONFIG,
            ).collect()
        )
    }
    # NB: rows come back in input order for a local 1-partition frame
    flags = [r["is_exact"] for r in out.values()]
    confs = [r["confidence"] for r in out.values()]
    assert flags[0] is True
    assert all(c >= 95.0 for c in confs[:3])
    assert flags[1] is False  # house present < 95
    assert flags[2] is False  # similarity < 95
    assert flags[3] is False  # zip present < 80


def test_best_match_unit_tiebreak(spark):
    """C3 (UAM:910-943): at equal confidence, the unit-exact candidate
    wins; is_exact outranks everything."""
    rows = pd.DataFrame(
        [
            # query q: partner a (unit differs), partner b (unit exact),
            # same confidence — b must win despite higher partner id
            {"conv_id_a": "q", "conv_id_b": "a", "confidence": 80.0,
             "tier": "relaxed", "is_exact": False, "unit_exact": False},
            {"conv_id_a": "q", "conv_id_b": "b", "confidence": 80.0,
             "tier": "relaxed", "is_exact": False, "unit_exact": True},
            # query z: lower-confidence exact candidate outranks a
            # higher-confidence non-exact one (exact-first, OPT:758-776)
            {"conv_id_a": "z", "conv_id_b": "c", "confidence": 99.0,
             "tier": "exact", "is_exact": False, "unit_exact": False},
            {"conv_id_a": "z", "conv_id_b": "d", "confidence": 96.0,
             "tier": "exact", "is_exact": True, "unit_exact": True},
        ]
    )
    best = best_matches(spark.createDataFrame(rows)).toPandas()
    best = best.set_index("conv_id")["partner_id"].to_dict()
    assert best["q"] == "b"
    assert best["z"] == "d"


def test_match_text_bound_is_sound_vs_kernel():
    """The match-only prune relies on s_text <= 200*min(la,lb)/(la+lb).
    Pin the inequality against the real kernel on adversarial pairs so a
    future s_text redefinition cannot silently break prune soundness."""
    import itertools
    import random

    from pipeline import kernels

    rng = random.Random(7)
    strs = ["", "a", "ab" * 40, "hello world", "hello world " * 10,
            "the quick brown fox", "xyz", "aaaa", "abab" * 25]
    strs += [
        "".join(rng.choice("abcde ") for _ in range(rng.randint(0, 120)))
        for _ in range(40)
    ]
    for a, b in itertools.combinations(strs, 2):
        s = 100.0 if a == b else kernels.indel_ratio(a, b)
        total = len(a) + len(b)
        ub = 100.0 if (total == 0 or a == b) else 200.0 * min(len(a), len(b)) / total
        assert s <= ub + 1e-9, (a[:30], b[:30], s, ub)


def test_match_only_fast_path_equals_full_filter(spark):
    """score_pairs(match_only=True) must return EXACTLY
    score_pairs().where(is_match) — the length-ratio prune is provably
    lossless — while actually pruning pairs before the kernel stage
    (the corpus pairs same-token-set docs with 6x length skew)."""
    base = "alpha beta gamma delta epsilon zeta theta kappa"
    turns = pd.DataFrame(
        {
            "conv_id": [f"c{i}" for i in range(8) for _ in (0, 1)],
            "turn_idx": [0, 1] * 8,
            "role": ["user", "assistant"] * 8,
            # c0/c1: near-identical short docs (true match); c2..c7: the
            # SAME token set as c0 but 6x longer (blocked together via
            # token-set keys, provably sub-floor on length ratio)
            "text": sum(
                [
                    [base, "ack"],
                    [base + " x", "ack"],
                ]
                + [[(base + " ") * 6, "ack"] for _ in range(6)],
                [],
            ),
            "tool": [None] * 16,
            "ts": pd.to_datetime(["2024-01-01"] * 16),
        }
    )
    from pipeline.scoring import match_text_keep_col, score_pairs

    feats = featurize(canonicalize(spark.createDataFrame(turns)))
    pairs, _ = candidate_pairs(feats)

    full = score_pairs(feats, pairs).where("is_match")
    fast = score_pairs(feats, pairs, match_only=True)
    cols = ["conv_id_a", "conv_id_b", "confidence", "tier", "is_match"]
    pd.testing.assert_frame_equal(
        full.select(cols).orderBy(cols[:2]).toPandas(),
        fast.select(cols).orderBy(cols[:2]).toPandas(),
    )

    # the prune must actually drop work: some blocked pair fails the bound
    fa = feats.select(F.col("conv_id").alias("conv_id_a"),
                      F.col("norm_text").alias("_norm_a"))
    fb = feats.select(F.col("conv_id").alias("conv_id_b"),
                      F.col("norm_text").alias("_norm_b"))
    joined = pairs.join(fa, "conv_id_a").join(fb, "conv_id_b")
    n_pruned = joined.where(~match_text_keep_col(DEFAULT_CONFIG)).count()
    assert n_pruned > 0, "fixture produced no prunable pairs"

    # and the prune sits BELOW the Arrow stage in the physical plan
    # (filter on the join output, kernels never see pruned rows)
    plan = fast._jdf.queryExecution().executedPlan().toString().lower()
    arrow_pos = plan.find("arrowevalpython")
    filter_pos = plan.find("least(length")
    assert arrow_pos != -1 and filter_pos != -1, plan[:2000]
    # physical plans print top-down: the prune filter must be BELOW
    # (= printed after) the Arrow stage, so kernels never see pruned rows
    assert filter_pos > arrow_pos, "length-bound filter not below Arrow stage"


def test_match_only_prune_respects_kernel_truncation(spark):
    """The kernels truncate texts to score_text_max_chars (2048) before
    scoring, so a pair that is EQUAL after truncation scores s_text=100
    even with wildly different full lengths. The prune bound must use
    the truncated lengths — with full lengths this true match would be
    pruned (round-3 review finding: 2700 vs ~17k chars gives a raw
    length bound of ~26 < floor 45)."""
    from pipeline.scoring import score_pairs

    base = ("lorem ipsum dolor sit amet " * 100).strip()  # ~2700 chars
    long_b = base + " tail" * 3000                        # ~+15k chars
    turns = pd.DataFrame(
        {
            "conv_id": ["shortdoc", "longdoc"],
            "turn_idx": [0, 0],
            "role": ["user", "user"],
            "text": [base, long_b],
            "tool": [None, None],
            "ts": pd.to_datetime(["2024-01-01"] * 2),
        }
    )
    feats = featurize(canonicalize(spark.createDataFrame(turns)))
    pairs, _ = candidate_pairs(feats)
    assert pairs.count() == 1, "prefix family should block the pair"

    cols = ["conv_id_a", "conv_id_b", "confidence", "tier", "is_match"]
    full = score_pairs(feats, pairs).where("is_match").select(cols).toPandas()
    fast = score_pairs(feats, pairs, match_only=True).select(cols).toPandas()
    assert len(full) == 1, "pair must be a true match (equal after truncation)"
    pd.testing.assert_frame_equal(
        full.sort_values(cols[:2]).reset_index(drop=True),
        fast.sort_values(cols[:2]).reset_index(drop=True),
    )


def test_random_configs_spark_matches_oracle(spark):
    """Config-space pinning: the JVM decision layer (confidence caps,
    tier, exact predicate, quality, warnings) equals the pandas oracle
    BIT-FOR-BIT under randomized weight configurations and randomized
    channel-score inputs — not just the default and strict configs the
    contract queries exercise."""
    import random

    from pipeline import oracle
    from pipeline.config import TIER_ADJUSTMENT

    rng = random.Random(42)
    for trial in range(4):
        raw = [rng.randint(1, 100) for _ in range(6)]
        # exact closed-form weights that sum to 1.0 in float (normalize,
        # then absorb the residue into the first weight)
        ws = [r / sum(raw) for r in raw]
        ws[0] = 1.0 - sum(ws[1:])
        cfg = MatchConfig(
            w_token_sort=ws[0], w_num=ws[1], w_partial=ws[2],
            w_jaccard=ws[3], w_jaro=ws[4], w_struct=ws[5],
            match_tier_threshold=rng.choice([35.0, 55.0, 75.0]),
            match_text_floor=rng.choice([0.0, 45.0, 60.0]),
        )
        rows = []
        score_rows = []
        for _ in range(120):
            s = {c: rng.choice([0.0, 25.0, 49.9, 50.0, 69.9, 70.0, 79.9,
                                80.0, 85.0, 89.9, 90.0, 95.0, 100.0])
                 for c in CHANNELS}
            na = rng.choice(["hello world", "x" * 12, "abc 123"])
            nb = rng.choice(["hello world", "", "zz 9"])
            ra = rng.choice(["ua", ""])
            rb = rng.choice(["ua", "au"])
            rows.append({**{f"s_{c}": s[c] for c in CHANNELS},
                         "_norm_a": na, "_norm_b": nb,
                         "_roles_a": ra, "_roles_b": rb})
            score_rows.append((s, na, nb, ra, rb))
        got = (
            with_decisions(_pair_df(spark, rows), cfg)
            .toPandas()
        )
        for i, (s, na, nb, ra, rb) in enumerate(score_rows):
            gated = cfg.require_text and (not na or not nb)
            if gated:
                conf, tier = 0.0, "none"
                quality = 0.0
                warnings = ["empty_critical_feature"]
            else:
                conf = oracle.weighted_confidence(s, cfg)
                tier = oracle.assign_tier(conf)
                quality, _band, warnings = oracle.quality_warnings(
                    s, conf, tier, na, nb, ra, rb, 1.0
                )
            r = got.iloc[i]
            assert r["confidence"] == conf, (trial, i, s)
            assert r["tier"] == tier
            assert r["quality"] == quality, (trial, i, s, quality)
            assert list(r["warnings"]) == warnings
            adj = max(0.0, conf + TIER_ADJUSTMENT.get(tier, -80.0))
            assert r["confidence_adjusted"] == adj
            exp_match = (not gated) and conf >= cfg.match_tier_threshold \
                and s["text"] >= cfg.match_text_floor
            if gated:
                exp_match = False
            assert bool(r["is_match"]) == exp_match
