"""End-to-end: blocking recall, oracle parity (F1 >= 0.99 — the
BASELINE.json gate), tier histogram, hot-key capping."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pipeline import oracle
from pipeline.blocking import candidate_pairs
from pipeline.canonicalize import canonicalize
from pipeline.config import DEFAULT_CONFIG
from pipeline.evaluate import pairwise_f1
from pipeline.features import featurize
from pipeline.linkage import build_plan
from pipeline.scoring import score_pairs


@pytest.fixture(scope="module")
def plan(spark, turns_df):
    return build_plan(turns_df)


@pytest.fixture(scope="module")
def scored_pd(plan):
    return plan["scored"].toPandas()


def test_blocking_recall(plan, corpus):
    """Every true duplicate pair must be proposed by some key family
    (blocking recall — the ES-retrieval analogue must not lose matches)."""
    pairs = plan["pairs"].select("conv_id_a", "conv_id_b").toPandas()
    got = set(map(tuple, pairs.values))
    truth = corpus.true_pairs[corpus.true_pairs["is_match"]].copy()
    truth["hit"] = [
        t in got for t in map(tuple, truth[["conv_id_a", "conv_id_b"]].values)
    ]
    by_class = truth.groupby("dup_class")["hit"].mean()
    # exact/token-structure classes: key family is deterministic -> ~100%
    for cls in ["exact", "norm_eq", "token_swap", "truncate", "typo"]:
        if cls in by_class:
            assert by_class[cls] >= 0.97, by_class
    # heavy (sim 45-60) rides minhash + rare-token anchors — best-effort,
    # like the reference's keyword/desperate tiers (size-capped ES probes)
    if "heavy" in by_class:
        assert by_class["heavy"] >= 0.80, by_class
    assert truth["hit"].mean() >= 0.95, by_class


def test_distractors_are_blocked_candidates(plan, corpus):
    """Distractor pairs share a blocking key by construction — they must
    appear as candidates (and later score below threshold)."""
    pairs = plan["pairs"].select("conv_id_a", "conv_id_b").toPandas()
    got = set(map(tuple, pairs.values))
    dis = corpus.true_pairs[corpus.true_pairs["dup_class"] == "distractor"]
    hit = sum(
        1 for t in map(tuple, dis[["conv_id_a", "conv_id_b"]].values) if t in got
    )
    assert hit / max(len(dis), 1) >= 0.9


def test_oracle_parity_f1(plan, scored_pd, corpus, spark):
    """THE gate: pipeline match decisions vs oracle labels on the same
    blocked candidate pairs — pairwise F1 >= 0.99."""
    cand = scored_pd[["conv_id_a", "conv_id_b"]]
    labels = oracle.oracle_labels(corpus.turns, cand)
    lab_df = spark.createDataFrame(
        labels[["conv_id_a", "conv_id_b", "is_match"]]
    )
    metrics = pairwise_f1(plan["scored"], lab_df)
    assert metrics["f1"] >= 0.99, metrics


def test_scores_bitwise_equal_oracle(scored_pd, corpus):
    """Stronger than F1: confidence / tier / quality / warnings / exact
    predicates must equal the oracle exactly (shared kernels +
    FP-op-order-matched JVM expressions)."""
    cand = scored_pd[["conv_id_a", "conv_id_b", "families"]]
    labels = oracle.oracle_labels(corpus.turns, cand)
    m = scored_pd.merge(
        labels, on=["conv_id_a", "conv_id_b"], suffixes=("_spark", "_oracle")
    )
    assert len(m) == len(scored_pd)
    for col in ["confidence", "confidence_adjusted", "quality"]:
        diff = (m[f"{col}_spark"] - m[f"{col}_oracle"]).abs()
        assert diff.max() == 0.0, (col, m.loc[diff.idxmax()])
    for col in ["tier", "is_match", "is_exact", "unit_exact", "reliability"]:
        assert (m[f"{col}_spark"] == m[f"{col}_oracle"]).all(), col
    assert all(
        list(a) == list(b)
        for a, b in zip(m["warnings_spark"], m["warnings_oracle"])
    )


def test_true_pair_tiers(scored_pd, corpus):
    m = scored_pd.merge(
        corpus.true_pairs,
        on=["conv_id_a", "conv_id_b"],
        how="inner",
        suffixes=("", "_truth"),
    )
    dup = m[m["dup_class"].isin(["exact", "norm_eq"])]
    assert (dup["tier"] == "exact").mean() >= 0.95
    dis = m[m["dup_class"] == "distractor"]
    if len(dis):
        assert dis["is_match"].mean() <= 0.10


def test_hot_key_capping(spark, hot_corpus):
    """90 identical boilerplate convs (cap 64): membership is capped,
    the drop is audited, and the pipeline completes."""
    turns = spark.createDataFrame(hot_corpus.turns)
    feats = featurize(canonicalize(turns))
    pairs, audit = candidate_pairs(feats)
    audit_pd = audit.toPandas()
    assert (audit_pd["members"] >= 90).any(), audit_pd
    n_hot_pairs = (
        pairs.where(
            F.col("conv_id_a").startswith("hot")
            & F.col("conv_id_b").startswith("hot")
        ).count()
    )
    cap = DEFAULT_CONFIG.pairs_per_key_cap
    # far below the uncapped 90*89/2 = 4005
    assert 0 < n_hot_pairs <= cap * (3 + DEFAULT_CONFIG.minhash_bands)


def test_pair_cap_audit_reports_drops(spark, hot_corpus):
    """The blocking star+cap pair rule audits what it drops, per key —
    the blocking twin of the dedup layer's pair-cap audit."""
    turns = spark.createDataFrame(hot_corpus.turns)
    feats = featurize(canonicalize(turns))
    pairs, _hot, pair_audit = candidate_pairs(
        feats, return_pair_audit=True
    )
    audit_pd = pair_audit.toPandas()
    assert list(audit_pd.columns) == ["family", "key", "pairs_total", "pairs_kept"]
    assert len(audit_pd) > 0  # 90 identical convs must trip the cap
    assert (audit_pd["pairs_kept"] < audit_pd["pairs_total"]).all()
    cap = DEFAULT_CONFIG.pairs_per_key_cap
    star_max = DEFAULT_CONFIG.block_key_cap - 1
    assert (audit_pd["pairs_kept"] <= cap + star_max).all()
