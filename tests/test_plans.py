"""Physical-plan property tests: the optimizations SURVEY.md §4 promises
must actually appear in the plan (and stay there). Plan-only — nothing
executes."""

from __future__ import annotations

import os
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


def test_bucketed_join_avoids_shuffle(spark, turns_df, tmp_path):
    """Docs stored bucketed by conv_id join WITHOUT an Exchange on either
    side — the storage-partitioned join the production Iceberg layout
    (bucket(N, conv_id)) gives the scoring stage."""
    from pipeline.canonicalize import canonicalize
    from pipeline.io import write_bucketed

    import shutil

    docs = canonicalize(turns_df).select("conv_id", "n_turns")
    # warehouse dir is static config — uses ./spark-warehouse (gitignored).
    # the in-memory metastore forgets tables between sessions while files
    # persist, so clear any stale location first
    spark.sql("drop table if exists docs_bucketed")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, "docs_bucketed"), ignore_errors=True)
    write_bucketed(docs, "docs_bucketed", n_buckets=8)
    try:
        t = spark.table("docs_bucketed")
        joined = t.alias("a").join(t.alias("b"), "conv_id")
        # disable broadcast so the bucketed path is exercised
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = _formatted_plan(joined)
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", "10485760"
            )
        n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
        assert n_exchange == 0, (
            f"bucketed self-join still shuffles:\n{plan[:1500]}"
        )
        assert "SortMergeJoin" in plan
    finally:
        spark.sql("drop table if exists docs_bucketed")


def test_decision_layer_adds_no_exchange_or_python(spark, turns_df):
    """The round-2 decision layer (gates, exact predicate, quality,
    warnings, unit flags) is pure Column arithmetic: the scored plan has
    exactly the shuffles the joins need and exactly one Python stage —
    adding the new columns must not introduce either."""
    from pipeline.linkage import build_plan

    plan = _formatted_plan(build_plan(turns_df)["scored"])
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1
    assert "BatchEvalPython" not in plan
    # quality/warnings/gates ride the UDF's Project — no window, no agg
    assert "Window" not in plan.split("ArrowEvalPython")[0].split("\n")[0]


def test_lsh_pair_cap_single_shuffle_per_bucket_family(spark):
    """minhash candidate capping uses ONE hash-partitioned window per
    band-bucket keyset (WindowGroupLimit pushes the rank filter down),
    and no cartesian appears anywhere in the dedup plan."""
    import __spark_entry__ as em

    plan = _formatted_plan(em.q_minhash_dedup(spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the star-preserving pair cap compiles to a rank-limited window
    assert "WindowGroupLimit" in plan or "RunningWindowFunction" in plan or "Window" in plan


def test_knn_broadcasts_queries(spark):
    """Brute-force kNN broadcasts the bounded query set, streams the
    corpus side."""
    import __spark_entry__ as em

    plan = _formatted_plan(em.q_knn_cosine(spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_winnow_selection_never_shuffles_grams(spark):
    """The winnowing sampler's sliding-window selection must find its
    per-doc clustering already satisfied: in the selection stage the
    ONLY Exchange is the REPARTITION_BY_COL of the narrow doc rows,
    placed UNDER the gram explode — the stride-1 gram table (len(text)
    rows per doc) is generated in place and sorted within partitions,
    never shuffled."""
    import pandas as pd
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from pipeline.extras.dedup import _H

    k, w = 40, 8
    docs = spark.createDataFrame(
        pd.DataFrame(
            {"doc_id": range(8), "text": ["some longer text for spans " * 4] * 8}
        )
    )
    H = _H("md5")
    doc_rows = (
        docs.where(F.length("text") >= k)
        .select("doc_id", F.col("text").alias("_t"))
        .repartition("doc_id")
    )
    grams = doc_rows.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.length("_t") - F.lit(k))).alias("pos"),
        "_t",
    ).select(
        "doc_id", "pos",
        H(F.lit("ss"), F.expr(f"substring(_t, pos + 1, {k})")).alias("h"),
    )
    ws = Window.partitionBy("doc_id").orderBy("pos")
    sel = (
        grams.withColumn(
            "_wm", F.min("h").over(ws.rowsBetween(Window.currentRow, w - 1))
        )
        .withColumn(
            "_mx", F.max("_wm").over(ws.rowsBetween(-(w - 1), Window.currentRow))
        )
        .where("_mx = h")
    )
    plan = sel._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    exchanges = [l for l in lines if "Exchange hashpartitioning" in l]
    assert len(exchanges) == 1, exchanges
    assert "REPARTITION_BY_COL" in exchanges[0], exchanges[0]
    gen_idx = next(i for i, l in enumerate(lines) if "Generate explode" in l)
    ex_idx = next(
        i for i, l in enumerate(lines) if "Exchange hashpartitioning" in l
    )
    assert ex_idx > gen_idx, "doc-row exchange must sit under the explode"
    # exactly one Sort serves BOTH windows (same spec)
    assert sum("Sort [doc_id" in l for l in lines) == 1


def test_minhash_single_pass_equals_per_hash(spark):
    """featurize's single-pass minhash aggregate (round-6 optimization:
    one array traversal with an n_hashes-slot accumulator instead of
    n_hashes interpreted transform+array_min passes) must produce
    bit-identical minhashes to the per-hash form, for BOTH hash impls
    (md5 drives the DuckDB-checked contract queries)."""
    from pipeline.features import _minhash_array, _shingles, hash_fn
    from pipeline.config import MatchConfig

    docs = spark.createDataFrame(
        [
            ("d1", "the quick brown fox jumps over the lazy dog"),
            ("d2", "aaaa"),  # fewer chars than several shingle spans
            ("d3", ""),  # empty text -> single empty shingle
            ("d4", "abcabcabcabc"),  # heavy intra-doc shingle repeats
        ],
        "conv_id string, norm_text string",
    )
    for impl in ("md5", "xxhash64"):
        cfg = MatchConfig(hash_impl=impl)
        H = hash_fn(cfg)
        sh = docs.withColumn(
            "_shingles", _shingles("norm_text", cfg.shingle_size)
        )
        n = cfg.minhash_hashes
        single = sh.withColumn(
            "_mh", _minhash_array(F.col("_shingles"), n, H)
        ).select(
            "conv_id",
            *[
                F.coalesce(
                    F.element_at("_mh", i + 1), F.lit(0).cast("long")
                ).alias(f"h{i}")
                for i in range(n)
            ],
        )
        # NB: single-arg lambda — a two-arg lambda would receive the
        # ARRAY INDEX as its second argument (pyspark transform arity
        # dispatch), not the loop variable. pyspark evaluates the lambda
        # eagerly while building the expression, so capturing the loop
        # variable here is safe.
        per_hash = sh.select(
            "conv_id",
            *[
                F.coalesce(
                    F.array_min(
                        F.transform(
                            F.col("_shingles"), lambda t: H(F.lit(i), t)
                        )
                    ),
                    F.lit(0).cast("long"),
                ).alias(f"h{i}")
                for i in range(n)
            ],
        )
        a = {r["conv_id"]: tuple(r[1:]) for r in single.collect()}
        b = {r["conv_id"]: tuple(r[1:]) for r in per_hash.collect()}
        assert a == b, (impl, a, b)
