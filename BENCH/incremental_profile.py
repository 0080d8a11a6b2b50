"""Phase profile of the q11b incremental step (round-4 VERDICT task 5).

A diagnostic TWIN of ``pipeline.incremental.incremental_link`` with a
timer around each first-firing action, run against the same committed
state the driver bench builds for q11b (sf0.1 documents corpus, 5%
increment, PRODUCTION_CONFIG, frozen anchors, committed blocking
state). The phases sum to ~the q11b wall; the output names which jobs
carry the fixed cost.

Kept in lock-step with the production body (round 5): the step runs
under ``increment_tuning`` (AQE off for increment-sized plans), pins
the increment-sized intermediates with eager ``localCheckpoint``
(``incremental._pin``) so each phase's action is the ONLY execution of
its stage, and right-sizes the Arrow scoring stage from the cached
pair count exactly as ``incremental_link`` does. The feats_scoring
cache-fill is timed as its own phase here; in production that fill
happens inside the scored pin (phase 4a) — read 3 + 4a together as
"the scoring phase".

Usage: python BENCH/incremental_profile.py [sf_dir] [cpus]
Writes BENCH/incremental_profile.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main() -> dict:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from pipeline.blocking import key_table_with_counts, token_df
    from pipeline.canonicalize import canonicalize
    from pipeline.cluster import connected_components
    from pipeline.config import PRODUCTION_CONFIG as cfg
    from pipeline.features import featurize
    from pipeline.incremental import (
        _pin,
        increment_tuning,
        incremental_candidate_pairs,
    )
    from pipeline.linkage import build_plan, cluster_edges
    from pipeline.scoring import score_pairs
    from pipeline.session import get_spark, release_caches, track_cache

    spark = get_spark(
        app_name="inc-profile",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    doc_turns = em._turns_from_documents(spark, sf_dir)
    slot = F.expr("cast(substring(conv_id, 2) as int) % 20")

    # committed state — outside the timers, exactly like bench q11b
    base_plan = build_plan(doc_turns.where(slot != 19), cfg)
    base_clusters, _ = cluster_edges(base_plan["edges"], base_plan["features"])
    base_feats = base_plan["features"]
    base_feats.count()
    base_clusters = base_clusters.localCheckpoint(eager=True)
    anchor_df = token_df(base_feats, cfg).localCheckpoint(eager=True)
    base_keys, base_counts = key_table_with_counts(base_feats, cfg, anchor_df)
    base_keys = base_keys.localCheckpoint(eager=True)
    base_counts = base_counts.localCheckpoint(eager=True)
    new_turns = doc_turns.where(slot == 19)

    phases: dict[str, float] = {}

    def timed(name, fn):
        t0 = time.time()
        out = fn()
        phases[name] = round(time.time() - t0, 3)
        print(f"[prof] {name}: {phases[name]}s", file=sys.stderr)
        return out

    t_all0 = time.time()
    tuning = increment_tuning(spark)
    tuning.__enter__()

    # ---- the incremental_link body, phase by phase -----------------------
    new_feats = featurize(canonicalize(new_turns), cfg)
    new_feats = new_feats.join(
        base_feats.select("conv_id"), "conv_id", "left_anti"
    )
    new_feats = timed("1_featurize_antijoin_pin", lambda: _pin(new_feats))
    new_ids = new_feats.select("conv_id")
    feats_all = base_feats.unionByName(new_feats)

    pairs, hot_audit, pair_audit, cap_risk, union_keys, union_counts, _nk = (
        incremental_candidate_pairs(
            feats_all, new_ids, cfg, True, anchor_df,
            base_keys, base_counts, new_feats,
        )
    )
    pairs = timed("2_candidate_pairs_pin", lambda: _pin(pairs))
    n_pairs = pairs.count()

    touched = (
        pairs.select(F.col("conv_id_a").alias("conv_id"))
        .union(pairs.select(F.col("conv_id_b").alias("conv_id")))
        .distinct()
    )
    feats_scoring = track_cache(
        feats_all.join(F.broadcast(touched), "conv_id", "semi")
    )
    timed("3_feats_scoring_cachefill", feats_scoring.count)

    cores = spark.sparkContext.defaultParallelism
    n_score_parts = max(1, min(cores * 3, -(-n_pairs // 2000)))
    scored = score_pairs(
        feats_scoring, pairs, cfg, match_only=True,
        n_partitions=n_score_parts,
    )
    scored = timed("4a_arrow_scoring_pin", lambda: _pin(scored))
    lab = base_clusters.select(
        F.col("conv_id").alias("_cid"), F.col("entity_id").alias("_ent")
    )
    edges = (
        scored.select("conv_id_a", "conv_id_b")
        .join(lab.withColumnRenamed("_cid", "conv_id_a"), "conv_id_a", "left")
        .withColumnRenamed("_ent", "_ent_a")
        .join(lab.withColumnRenamed("_cid", "conv_id_b"), "conv_id_b", "left")
        .withColumnRenamed("_ent", "_ent_b")
        .select(
            F.coalesce("_ent_a", "conv_id_a").alias("src"),
            F.coalesce("_ent_b", "conv_id_b").alias("dst"),
        )
    )
    comp, cc_metrics = timed(
        "4b_edges_cc",
        lambda: connected_components(edges, all_nodes=new_ids),
    )

    merge_map = (
        comp.join(
            base_clusters.select(
                F.col("entity_id").alias("conv_id")
            ).distinct(),
            "conv_id",
        )
        .where(F.col("entity_id") != F.col("conv_id"))
        .select(
            F.col("conv_id").alias("_old_ent"),
            F.col("entity_id").alias("_new_ent"),
        )
    )
    existing_updated = (
        base_clusters.join(
            F.broadcast(merge_map),
            base_clusters["entity_id"] == merge_map["_old_ent"],
            "left",
        )
        .select(
            "conv_id", F.coalesce("_new_ent", "entity_id").alias("entity_id")
        )
    )
    new_assign = comp.join(new_ids, "conv_id").select("conv_id", "entity_id")
    clusters = existing_updated.unionByName(new_assign)
    timed(
        "5_relabel_union_write",
        lambda: clusters.write.format("noop").mode("overwrite").save(),
    )

    total = round(time.time() - t_all0, 3)
    tuning.__exit__(None, None, None)
    release_caches()
    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "n_pairs": n_pairs,
        "cc_mode": (cc_metrics or [{}])[-1].get("mode"),
        "phases_s": phases,
        "step_total_s": total,
    }
    print(json.dumps(out))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "incremental_profile.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
