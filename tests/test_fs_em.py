"""Fellegi–Sunter EM (pipeline/fellegi_sunter.py) vs the independently
coded numpy twin (pipeline/twin.py:fs_em_pd), parameter recovery on a
known two-class mixture, and the Spark contract pieces."""

from __future__ import annotations

import math
from itertools import product

import pandas as pd
import pytest

from pipeline.fellegi_sunter import (
    DEFAULT_CHANNELS,
    EM_ITERS,
    INIT_M,
    INIT_P,
    INIT_U,
    _em,
    comparison_patterns,
    em_weights,
    fs_score_col,
)
from pipeline.twin import fs_em_pd, fs_patterns_pd


def _mixture_counts(p, m, u, n_total):
    """Deterministic EXPECTED pattern counts of a two-class conditional-
    independence mixture — no sampling, so recovery tolerances are pure
    EM behavior, not noise."""
    C = len(m)
    rows = []
    for bits in product("01", repeat=C):
        pat = "".join(bits)
        pm, pu = p, 1.0 - p
        for i, b in enumerate(pat):
            pm *= m[i] if b == "1" else 1.0 - m[i]
            pu *= u[i] if b == "1" else 1.0 - u[i]
        rows.append((pat, (pm + pu) * n_total))
    return rows


def test_em_recovers_planted_parameters():
    true_p, true_m, true_u = 0.3, [0.95, 0.85, 0.7], [0.05, 0.2, 0.4]
    pats = _mixture_counts(true_p, true_m, true_u, 100_000)
    p, m, u = _em(pats, 3, iters=200, init_p=0.1, init_m=0.9, init_u=0.1)
    assert abs(p - true_p) < 0.01
    for i in range(3):
        assert abs(m[i] - true_m[i]) < 0.02, (i, m[i])
        assert abs(u[i] - true_u[i]) < 0.02, (i, u[i])


def test_em_matches_numpy_twin_bitwise_to_6dp():
    """The driver hash-compares 6-dp literals; plain-float loop and
    vectorized numpy must land on the same rounded values."""
    channels = [("c0", 50.0), ("c1", 50.0), ("c2", 50.0)]
    pats = _mixture_counts(0.25, [0.9, 0.8, 0.6], [0.1, 0.3, 0.5], 9999)
    pats = [(p_, round(n)) for p_, n in pats if round(n) > 0]
    p, m, u = _em(pats, 3, EM_ITERS, INIT_P, INIT_M, INIT_U)
    twin = fs_em_pd(
        pd.DataFrame(
            {"pattern": [x for x, _ in pats], "n_pairs": [n for _, n in pats]}
        ),
        channels,
        EM_ITERS,
        INIT_P,
        INIT_M,
        INIT_U,
    )
    for i in range(3):
        assert round(m[i], 6) == twin["m_prob"][i]
        assert round(u[i], 6) == twin["u_prob"][i]
        assert round(math.log2(m[i] / u[i]), 6) == twin["w_agree"][i]
    assert round(p, 6) == twin["match_prior"][0]


def test_degenerate_channel_clamps_to_zero_weight():
    """A channel whose gamma never varies (the corpus's s_struct) must
    not blow up: m == u at the clamp, weights finite and ~0."""
    # channel 1 always agrees; channel 0 is informative
    pats = [("01", 600), ("11", 400)]
    p, m, u = _em(pats, 2, 50, INIT_P, INIT_M, INIT_U)
    w_agree = math.log2(m[1] / u[1])
    assert abs(w_agree) < 0.1
    assert math.isfinite(math.log2((1.0 - m[1]) / (1.0 - u[1])))


def test_spark_patterns_and_weights_match_twin(spark):
    """comparison_patterns + em_weights on a scored-like DF == the
    pandas twin on the same rows."""
    rows = []
    # two latent classes, deterministic scores
    for i in range(40):
        rows.append((90.0, 100.0, 80.0, 95.0, 90.0, 100.0))  # agree-ish
    for i in range(60):
        rows.append((50.0, 0.0, 40.0, 30.0, 60.0, 100.0))  # disagree-ish
    for i in range(10):
        rows.append((90.0, 0.0, 40.0, 95.0, 60.0, 100.0))  # mixed
    cols = [f"s_{name}" for name, _ in DEFAULT_CHANNELS]
    pdf = pd.DataFrame(rows, columns=cols)
    sdf = spark.createDataFrame(pdf)

    got_pat = comparison_patterns(sdf).toPandas()
    want_pat = fs_patterns_pd(pdf, DEFAULT_CHANNELS)
    got_sorted = got_pat.sort_values("pattern").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_sorted.astype({"n_pairs": "int64"}),
        want_pat.astype(
            {c: got_sorted[c].dtype for c in want_pat.columns if c != "pattern"}
        ),
    )
    assert len(got_pat) <= 2 ** len(DEFAULT_CHANNELS)

    got_w = em_weights(spark, sdf).toPandas()
    want_w = fs_em_pd(
        want_pat, DEFAULT_CHANNELS, EM_ITERS, INIT_P, INIT_M, INIT_U
    )
    pd.testing.assert_frame_equal(got_w, want_w)


def test_fs_score_col_separates_classes(spark):
    """Composite FS log-odds from learned weights orders a clear match
    above a clear non-match."""
    rows = [
        ("hi", 90.0, 100.0, 80.0, 95.0, 90.0, 100.0),
        ("lo", 50.0, 0.0, 40.0, 30.0, 60.0, 100.0),
    ] * 50
    cols = ["pid"] + [f"s_{name}" for name, _ in DEFAULT_CHANNELS]
    sdf = spark.createDataFrame(pd.DataFrame(rows, columns=cols))
    w = {r["channel"]: r for r in em_weights(spark, sdf).collect()}
    weights = [
        (name, thr, w[name]["w_agree"], w[name]["w_disagree"])
        for name, thr in DEFAULT_CHANNELS
    ]
    scored = sdf.withColumn("fs", fs_score_col(weights))
    by_pid = {r["pid"]: r["fs"] for r in scored.dropDuplicates(["pid"]).collect()}
    assert by_pid["hi"] > by_pid["lo"] + 1.0


def test_em_weights_empty_scored_returns_initial_params(spark):
    """Round-5 review fix: an empty scored table (blocking found no
    candidates at tiny SF) used to crash _em with ZeroDivisionError;
    both engines now return the clamped INITIAL parameters, agreeing
    bit-for-bit."""
    import pandas as pd

    from pipeline.fellegi_sunter import (
        DEFAULT_CHANNELS, EM_ITERS, INIT_M, INIT_P, INIT_U, em_weights,
    )
    from pipeline.twin import fs_em_pd

    cols = ", ".join(f"s_{name} double" for name, _ in DEFAULT_CHANNELS)
    empty = spark.createDataFrame([], cols)
    got = em_weights(spark, empty).toPandas()
    assert len(got) == len(DEFAULT_CHANNELS)
    assert (got["match_prior"] == round(INIT_P, 6)).all()

    twin = fs_em_pd(
        pd.DataFrame({"pattern": [], "n_pairs": []}),
        DEFAULT_CHANNELS, EM_ITERS, INIT_P, INIT_M, INIT_U,
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), twin.reset_index(drop=True)
    )


def test_fs_patterns_pd_empty_scored_reaches_em_fallback():
    """Zero scored pairs: fs_patterns_pd must return a schema-correct
    EMPTY pattern table (the .str accessor raised on an empty object
    column — round-5 review), so fs_em_pd's mirrored empty-table EM
    fallback is actually reachable."""
    import pandas as pd

    from pipeline.fellegi_sunter import DEFAULT_CHANNELS
    from pipeline.twin import fs_em_pd, fs_patterns_pd

    scored = pd.DataFrame(
        {f"s_{name}": pd.Series([], dtype=float)
         for name, _ in DEFAULT_CHANNELS}
    )
    pats = fs_patterns_pd(scored, DEFAULT_CHANNELS)
    assert len(pats) == 0
    assert list(pats.columns) == (
        ["pattern"] + [f"g_{n}" for n, _ in DEFAULT_CHANNELS] + ["n_pairs"]
    )
    w = fs_em_pd(pats, DEFAULT_CHANNELS, iters=5, init_p=0.1,
                 init_m=0.9, init_u=0.1)
    assert len(w) == len(DEFAULT_CHANNELS)


def test_linkage_pd_zero_pairs_yields_singletons():
    """A corpus where blocking proposes no pairs must label every doc a
    singleton, not KeyError on the column-less empty scored frame
    (round-5 review)."""
    import pandas as pd

    from pipeline.twin import linkage_pd

    turns = pd.DataFrame(
        {
            "conv_id": ["a", "b"],
            "turn_idx": [0, 0],
            "role": ["user", "user"],
            "text": ["completely unrelated alpha", "zzz omega nine"],
            "tool": [None, None],
            "ts": pd.to_datetime(["2026-01-01", "2026-01-02"]).astype(
                "datetime64[us]"
            ),
        }
    )
    out = linkage_pd(turns)
    cl = out["clusters"]
    assert sorted(cl["conv_id"]) == ["a", "b"]
    assert (cl["conv_id"] == cl["entity_id"]).all()
