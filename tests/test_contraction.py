"""Exact-dup contraction pre-pass (pipeline.linkage.contract_exact_dups).

The equivalence theorem under test: contraction collapses gate-eligible
docs with identical (norm_text, roles_sig) to their minimum-id
representative, links reps only, and expands labels through (rep, member)
edges — final clusters must equal the uncontracted run's EXACTLY (anchor
document frequencies pinned to full-population statistics via the
multiplicity-weighted df table).
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pipeline.config import DEFAULT_CONFIG
from pipeline.features import featurize
from pipeline.linkage import (
    build_contracted_plan,
    build_plan,
    cluster_edges,
    contract_exact_dups,
)
from pipeline.session import release_caches


def _labels(plan, spark) -> pd.DataFrame:
    clusters, _ = cluster_edges(plan["edges"], plan["features"])
    out = (
        clusters.orderBy("conv_id").toPandas().reset_index(drop=True)
    )
    release_caches()
    return out


@pytest.fixture(scope="module")
def feats(spark, turns_df):
    from pipeline.canonicalize import canonicalize

    return featurize(canonicalize(turns_df), DEFAULT_CONFIG).cache()


def test_contraction_is_nonvacuous(spark, feats):
    """The fixture corpus must actually contain exact-signature dups,
    otherwise the equality tests prove nothing."""
    _, dup_map, _ = contract_exact_dups(feats, DEFAULT_CONFIG)
    assert dup_map.count() > 0


def test_rep_is_class_minimum_and_map_is_consistent(spark, feats):
    rep_feats, dup_map, _ = contract_exact_dups(feats, DEFAULT_CONFIG)
    pdf = feats.select("conv_id", "norm_text", "roles_sig").toPandas()
    pdf["roles_sig"] = pdf["roles_sig"].fillna("")
    expected = (
        pdf.groupby(["norm_text", "roles_sig"])["conv_id"]
        .agg(["min", "count"])
        .reset_index()
    )
    # pandas-computed (member -> class min) map for eligible docs
    sig_min = pdf.merge(
        expected, on=["norm_text", "roles_sig"], how="left"
    )
    eligible = sig_min[sig_min["norm_text"].str.len() > 0]
    want = {
        r.conv_id: r.min
        for r in eligible.itertuples()
        if r.conv_id != r.min
    }
    got = {
        r["conv_id"]: r["rep_id"] for r in dup_map.collect()
    }
    assert got == want
    # rep_feats holds exactly one row per class (plus rejected rows)
    n_rejected = int((pdf["norm_text"].str.len() == 0).sum())
    assert rep_feats.count() == len(
        eligible.drop_duplicates(["norm_text", "roles_sig"])
    ) + n_rejected


def test_weighted_df_equals_full_token_df(spark, feats):
    from pipeline.blocking import token_df

    _, _, weighted = contract_exact_dups(feats, DEFAULT_CONFIG)
    full = {r["token"]: r["df"] for r in token_df(feats, DEFAULT_CONFIG).collect()}
    contracted = {r["token"]: r["df"] for r in weighted.collect()}
    assert contracted == full


def test_contracted_labels_equal_batch(spark, turns_df):
    base = _labels(build_plan(turns_df, DEFAULT_CONFIG), spark)
    contracted = _labels(
        build_contracted_plan(turns_df, DEFAULT_CONFIG), spark
    )
    pd.testing.assert_frame_equal(base, contracted)


def test_contracted_pair_stage_shrinks(spark, turns_df):
    """The point of the pre-pass: fewer pairs reach scoring."""
    base = build_plan(turns_df, DEFAULT_CONFIG)
    contracted = build_contracted_plan(turns_df, DEFAULT_CONFIG)
    n_base, n_contracted = base["pairs"].count(), contracted["pairs"].count()
    release_caches()
    assert n_contracted < n_base


def test_rejected_twins_stay_singletons(spark):
    """Two byte-identical conversations that FAIL the required-feature
    gate must not be collapsed (the full run never pairs them — the gate
    rejects both before blocking — so each is its own entity)."""
    from datetime import datetime

    rows = [
        ("rej_a", 0, "user", "", None, datetime(2025, 1, 1)),
        ("rej_b", 0, "user", "", None, datetime(2025, 1, 1)),
        ("ok_a", 0, "user", "hello world again", None, datetime(2025, 1, 1)),
        ("ok_b", 0, "user", "hello world again", None, datetime(2025, 1, 1)),
    ]
    turns = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    plan = build_contracted_plan(turns, DEFAULT_CONFIG)
    clusters, _ = cluster_edges(plan["edges"], plan["features"])
    got = {r["conv_id"]: r["entity_id"] for r in clusters.collect()}
    release_caches()
    assert got["rej_a"] == "rej_a" and got["rej_b"] == "rej_b"
    assert got["ok_a"] == got["ok_b"] == "ok_a"


def test_run_staged_contracted_clusters_identical(spark, turns_df, tmp_path):
    """Production surface: run_staged(contract_dups=True) yields the SAME
    clusters as the plain staged run, the rep stages commit manifests,
    and resume skips them."""
    from pipeline.linkage import run_staged

    plain = run_staged(
        spark, turns_df, str(tmp_path / "plain"), DEFAULT_CONFIG
    )
    want = plain["clusters"].orderBy("conv_id").toPandas()

    cdir = str(tmp_path / "contracted")
    contracted = run_staged(
        spark, turns_df, cdir, DEFAULT_CONFIG, contract_dups=True
    )
    got = contracted["clusters"].orderBy("conv_id").toPandas()
    pd.testing.assert_frame_equal(want, got)

    # rep pair stage really shrank vs the plain run's
    assert contracted["pairs"].count() < plain["pairs"].count()

    # resume: every stage (incl. rep_features / dup_map / anchor_df)
    # reports resumed=True and clusters are unchanged
    again = run_staged(
        spark, turns_df, cdir, DEFAULT_CONFIG, contract_dups=True
    )
    resumed = {
        m["stage"]: m.get("resumed")
        for m in again["_runner"].metrics
        if "resumed" in m
    }
    assert resumed["rep_features"] and resumed["dup_map"]
    assert resumed["anchor_df"] and resumed["clusters"]
    pd.testing.assert_frame_equal(
        want, again["clusters"].orderBy("conv_id").toPandas()
    )


def test_run_staged_contraction_composes_with_audit_sampling(
    spark, turns_df, tmp_path
):
    """The two production cost controls together: contraction (rep pairs
    only) + audit sampling (match-only scoring, sampled histograms) must
    still produce the plain run's exact clusters."""
    from pipeline.linkage import run_staged

    plain = run_staged(
        spark, turns_df, str(tmp_path / "plain"), DEFAULT_CONFIG
    )
    want = plain["clusters"].orderBy("conv_id").toPandas()
    both = run_staged(
        spark,
        turns_df,
        str(tmp_path / "both"),
        DEFAULT_CONFIG,
        audit_sample_rate=0.5,
        contract_dups=True,
    )
    pd.testing.assert_frame_equal(
        want, both["clusters"].orderBy("conv_id").toPandas()
    )
    # sampled audit histogram exists and carries the sample_rate label
    assert "sample_rate" in both["tier_histogram"].columns


def test_contracted_labels_equal_under_binding_caps(spark):
    """Mini skew corpus: a 150-member exact/norm-noise boilerplate group
    against block_key_cap=16 — the caps BIND in the uncontracted run
    (hot_key_star keeps the group whole there); the contracted run never
    even creates the hot key. Labels must agree: one entity either way."""
    from dataclasses import replace

    from pipeline import synth

    cfg = replace(
        DEFAULT_CONFIG,
        block_key_cap=16,
        pairs_per_key_cap=12,
        hot_key_star=True,
    )
    corpus = synth.generate_skew(
        n_base=25, boiler_members=150, hotkey_convs=30, seed=11
    )
    turns = spark.createDataFrame(corpus.turns)

    base = _labels(build_plan(turns, cfg), spark)
    contracted = _labels(build_contracted_plan(turns, cfg), spark)
    pd.testing.assert_frame_equal(base, contracted)

    boiler = contracted[contracted["conv_id"].str.startswith("boil")]
    assert boiler["entity_id"].nunique() == 1
