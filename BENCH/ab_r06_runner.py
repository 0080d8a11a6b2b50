"""One round-6 A/B leg against ONE code tree.

Invoked by BENCH/ab_r06.py in a fresh subprocess per leg with
``PYTHONPATH=<tree>`` and ``cwd=<tree>`` so the driver import AND the
Spark Python workers resolve ``pipeline`` from that tree — either the
round-6 start (commit 21cdec3, pre-optimization, git worktree) or HEAD.
Probe construction lives HERE so both legs run the identical inputs and
methodology; only the ``pipeline`` package under test differs.

Probes (all warm: one untimed pass first, then timed best-of-N):

  * featurize_s   — noop of featurize over the documents-derived turns
                    (round-6 change #1: single-pass minhash aggregate)
  * ring_steady_s — 600k-pair saturated ring scoring, best-of-2 after
                    the kernel-cache warmup pass (change #4: Arrow-stage
                    partition policy)
  * step_s        — the bench q11b incremental step, best-of-2, with the
                    committed base state built untimed (changes #1-#5)
  * cc_tail_s     — driver union-find materialization + singleton
                    anti-join + noop over a pre-checkpointed edge list
                    (change #2: Arrow createDataFrame + broadcast anti)

Prints ONE JSON line. Env: AB_CPUS, SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    cpus = int(os.environ.get("AB_CPUS", "32"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import pipeline
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from pipeline.blocking import key_table_with_counts, token_df
    from pipeline.canonicalize import canonicalize
    from pipeline.cluster import (
        _canonical_edges,
        _driver_union_find,
        connected_components,
    )
    from pipeline.config import PRODUCTION_CONFIG
    from pipeline.features import featurize
    from pipeline.incremental import incremental_link, increment_tuning
    from pipeline.linkage import build_plan, cluster_edges
    from pipeline.normalize import norm_text_col
    from pipeline.scoring import score_pairs
    from pipeline.session import get_spark, release_caches

    spark = get_spark(
        app_name=f"ab-r06-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd  # noqa: F401

    def _warm_fn(s):
        from pipeline.oracle import component_scores  # noqa: F401

        return s

    _warm = F.pandas_udf(_warm_fn, returnType="long")
    spark.range(cpus * 6).repartition(cpus * 3).select(
        _warm("id")
    ).write.format("noop").mode("overwrite").save()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    rec: dict = {
        "pipeline_file": os.path.abspath(pipeline.__file__),
        "cpus": cpus,
    }

    # ---- featurize ------------------------------------------------------
    doc_turns = em._turns_from_documents(spark, sf_dir)
    feats_plain = featurize(canonicalize(doc_turns), PRODUCTION_CONFIG)
    noop(feats_plain)  # warm codegen
    walls = []
    for _ in range(3):
        t0 = time.time()
        noop(feats_plain)
        walls.append(round(time.time() - t0, 3))
    rec["featurize_s"] = min(walls)
    rec["featurize_walls"] = walls

    # ---- saturated ring (bench q10 methodology) -------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    ring_k = max(1, 600_000 // max(n_docs, 1))
    roles_mix = F.array(
        F.lit("ua"), F.lit("uaua"), F.lit("uauaua"), F.lit("au")
    )
    dfeats = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        norm_text_col("text").alias("norm_text"),
        F.element_at(
            roles_mix, F.pmod(F.col("doc_id"), F.lit(4)).cast("int") + 1
        ).alias("roles_sig"),
    ).localCheckpoint(eager=True)
    ring = (
        dfeats.select(F.col("conv_id").cast("long").alias("i"))
        .select("i", F.explode(F.sequence(F.lit(1), F.lit(ring_k))).alias("k"))
        .select(
            F.col("i").cast("string").alias("conv_id_a"),
            F.pmod(F.col("i") + F.col("k"), F.lit(n_docs))
            .cast("string")
            .alias("conv_id_b"),
            F.lit(0).cast("long").alias("block_key"),
            F.array(F.lit(0)).alias("families"),
        )
    )
    sat = score_pairs(dfeats, ring)
    noop(sat)  # kernel-cache warmup pass
    walls = []
    for _ in range(2):
        t0 = time.time()
        noop(sat)
        walls.append(round(time.time() - t0, 3))
    rec["ring_steady_s"] = min(walls)
    rec["ring_pairs_per_sec"] = round(n_docs * ring_k / rec["ring_steady_s"], 1)
    rec["ring_walls"] = walls

    # ---- q11b incremental step -----------------------------------------
    slot = F.expr("cast(substring(conv_id, 2) as int) % 20")
    base_plan = build_plan(doc_turns.where(slot != 19), PRODUCTION_CONFIG)
    base_clusters, _ = cluster_edges(base_plan["edges"], base_plan["features"])
    base_feats = base_plan["features"]
    base_feats.count()
    base_clusters = base_clusters.localCheckpoint(eager=True)
    base_anchor_df = token_df(base_feats, PRODUCTION_CONFIG).localCheckpoint(
        eager=True
    )
    base_keys, base_counts = key_table_with_counts(
        base_feats, PRODUCTION_CONFIG, base_anchor_df
    )
    base_keys = base_keys.localCheckpoint(eager=True)
    base_counts = base_counts.localCheckpoint(eager=True)

    def step():
        with increment_tuning(spark):
            out = incremental_link(
                base_feats, base_clusters, doc_turns.where(slot == 19),
                PRODUCTION_CONFIG, anchor_df=base_anchor_df,
                existing_keys=base_keys, existing_key_counts=base_counts,
            )
            noop(out["clusters"])
        release_caches()

    step()  # warm codegen
    walls = []
    for _ in range(2):
        t0 = time.time()
        step()
        walls.append(round(time.time() - t0, 3))
    rec["step_s"] = min(walls)
    rec["step_walls"] = walls

    # ---- CC driver tail -------------------------------------------------
    edges = base_plan["scored"].where("is_match").select(
        F.col("conv_id_a").alias("src"), F.col("conv_id_b").alias("dst")
    )
    cur = _canonical_edges(edges).localCheckpoint(eager=True)  # untimed

    def cc_tail():
        clusters, _ = connected_components(
            cur.select(F.col("u").alias("src"), F.col("v").alias("dst")),
            all_nodes=base_feats.select("conv_id"),
        )
        noop(clusters)

    cc_tail()  # warm
    walls = []
    for _ in range(3):
        t0 = time.time()
        cc_tail()
        walls.append(round(time.time() - t0, 3))
    rec["cc_tail_s"] = min(walls)
    rec["cc_tail_walls"] = walls

    print(json.dumps(rec))


if __name__ == "__main__":
    main()
