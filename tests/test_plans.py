"""Physical-plan property tests: the optimizations SURVEY.md §4 promises
must actually appear in the plan (and stay there). Plan-only — nothing
executes."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def _formatted_plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_column_pruning_reaches_scan(spark):
    """doc_stats projects 2 of 5 document columns — the parquet scan must
    read only those (Catalyst column pruning)."""
    import __spark_entry__ as em

    plan = _formatted_plan(em.q_doc_stats(spark, SF_DIR))
    read_schema = re.search(r"ReadSchema: struct<([^>]*)>", plan).group(1)
    cols = {c.split(":")[0] for c in read_schema.split(",")}
    assert cols == {"doc_id", "text"}, cols


def test_filter_pushdown_reaches_scan(spark):
    """The shipdate predicate must be pushed into the parquet scan."""
    import __spark_entry__ as em

    plan = _formatted_plan(em.q_pricing_summary(spark, SF_DIR))
    assert re.search(r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate", plan), (
        plan[:2000]
    )


def test_scoring_has_single_arrow_stage(spark, turns_df):
    """All six similarity channels ride ONE ArrowEvalPython stage — no
    per-channel Python round trips."""
    from pipeline.linkage import build_plan

    plan_df = build_plan(turns_df)["scored"]
    plan = _formatted_plan(plan_df)
    # each node appears once in the tree and once in the details section;
    # count unique node ids
    n_arrow = len(re.findall(r"\(\d+\) ArrowEvalPython", plan))
    assert n_arrow == 1, n_arrow
    # no row-at-a-time Python UDF anywhere
    assert "BatchEvalPython" not in plan


def test_hot_key_list_is_broadcast(spark, turns_df):
    """The hot-key frequency table joins back via broadcast, not a
    shuffled join (it is tiny by construction)."""
    from pipeline.blocking import candidate_pairs
    from pipeline.canonicalize import canonicalize
    from pipeline.features import featurize

    pairs, _ = candidate_pairs(featurize(canonicalize(turns_df)))
    plan = _formatted_plan(pairs)
    assert "BroadcastHashJoin" in plan


def test_no_cartesian_products(spark, turns_df):
    """Candidate generation is equi-join-only — a cartesian in the plan
    means a blocking key disappeared."""
    from pipeline.linkage import build_plan

    plan = _formatted_plan(build_plan(turns_df)["scored"])
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_knn_broadcasts_queries(spark):
    """Brute-force kNN broadcasts the bounded query set, streams the
    corpus side."""
    import __spark_entry__ as em

    plan = _formatted_plan(em.q_knn_cosine(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
