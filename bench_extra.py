"""Extra benchmarks: per-phase isolation of the expensive bench.py lines
(guide §1.4 noop-sink isolation; bench.py itself is FROZEN for driver
measurement, so auxiliary numbers live here).

Usage: python bench_extra.py <probe> [...probe]
Probes: q6_phases q11_phases q11b_phases gramstats q10_kernel
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
Prints one JSON object per probe.
"""

from __future__ import annotations

import json
import os
import sys
import time


def _spark():
    from pipeline.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name=f"bench-extra-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, out: dict, name: str, fn):
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    r = fn()
    out[name] = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    return r


def _warm(spark, cpus: int):
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    def _warm_fn(s):
        from pipeline.oracle import component_scores  # noqa: F401

        return s

    w = F.pandas_udf(_warm_fn, returnType="long")
    spark.range(cpus * 6).repartition(cpus * 3).select(w("id")).write.format(
        "noop"
    ).mode("overwrite").save()


def q6_phases(spark, sf_dir: str) -> dict:
    """minhash_lsh_pairs (md5 + xxhash64 legs) split at its seams:
    minhash aggregation / banding+cap+pair gen / verify Jaccard."""
    from pyspark.sql import functions as F

    from pipeline.extras.dedup import (
        _bucket_pair_cap,
        _hashed_grams,
        _shingle_minhash,
        minhash_lsh_pairs,
    )
    from pipeline.normalize import norm_text_col
    from pipeline.session import release_caches, track_cache

    out: dict = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for impl in ("md5", "xxhash64"):
        normed = track_cache(
            docs.select(
                F.col("doc_id"), norm_text_col("text").alias("_norm")
            ).repartition(spark.sparkContext.defaultParallelism * 2)
        )
        normed.count()
        mh = _shingle_minhash(normed, 5, 12, impl)
        _timed(spark, out, f"{impl}_1_shingle_minhash_agg", lambda: _noop(mh))
        _timed(
            spark, out, f"{impl}_1b_shingle_minhash_again", lambda: _noop(mh)
        )
        grams_all = normed.select("doc_id", _hashed_grams(5, impl))
        _timed(spark, out, f"{impl}_2_verify_grams_all", lambda: _noop(grams_all))
        release_caches()
        _timed(
            spark,
            out,
            f"{impl}_3_full_operator",
            lambda: _noop(
                minhash_lsh_pairs(docs, jaccard_threshold=0.3, hash_impl=impl)
            ),
        )
        release_caches()
    return out


def gramstats(spark, sf_dir: str) -> dict:
    """Duplication factor of 5-gram shingles (distinct-vs-total) — sizes
    the win of hashing distinct grams once."""
    from pyspark.sql import functions as F

    from pipeline.normalize import norm_text_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    normed = docs.select(norm_text_col("text").alias("_norm"))
    sh = normed.select(
        F.explode(
            F.expr(
                "array_distinct(transform("
                "sequence(1, greatest(length(_norm)-4,1)),"
                " i -> substring(_norm, i, 5)))"
            )
        ).alias("g")
    )
    row = sh.agg(
        F.count(F.lit(1)).alias("total"),
        F.count_distinct("g").alias("distinct"),
    ).collect()[0]
    return {
        "gram_rows_total": int(row["total"]),
        "gram_distinct": int(row["distinct"]),
        "dup_factor": round(row["total"] / max(row["distinct"], 1), 2),
    }


def q11_phases(spark, sf_dir: str) -> dict:
    """Batch linkage over the documents corpus, stage-isolated."""
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from pipeline.config import PRODUCTION_CONFIG
    from pipeline.linkage import build_plan, cluster_edges
    from pipeline.scoring import score_pairs
    from pipeline.session import release_caches

    out: dict = {}
    doc_turns = em._turns_from_documents(spark, sf_dir)
    plan = build_plan(doc_turns, PRODUCTION_CONFIG)
    feats = plan["features"]
    _timed(spark, out, "1_featurize", lambda: _noop(feats))
    pairs = plan["pairs"]
    _timed(spark, out, "2_blocking_pairs", lambda: _noop(pairs))
    out["n_pairs"] = pairs.count()
    scored = score_pairs(feats, pairs, PRODUCTION_CONFIG)
    _timed(spark, out, "3_scoring", lambda: _noop(scored))
    edges = scored.where("is_match").select(
        F.col("conv_id_a").alias("src"), F.col("conv_id_b").alias("dst")
    )

    def _cc():
        clusters, _ = cluster_edges(edges, feats)
        _noop(clusters)

    _timed(spark, out, "4_cc_and_clusters", _cc)
    release_caches()

    def _full():
        p = build_plan(doc_turns, PRODUCTION_CONFIG)
        clusters, _ = cluster_edges(p["edges"], p["features"])
        _noop(clusters)

    _timed(spark, out, "5_full_e2e", _full)
    release_caches()
    return out


def q11b_phases(spark, sf_dir: str) -> dict:
    """Incremental step phase profile (the bench q11b shape), with a job
    count per phase via the status tracker."""
    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from pipeline.blocking import key_table_with_counts, token_df
    from pipeline.config import PRODUCTION_CONFIG
    from pipeline.incremental import (
        _score_increment_pairs,
        _edges_to_entities,
        _merge_labels,
        incremental_candidate_pairs,
        increment_tuning,
    )
    from pipeline.canonicalize import canonicalize
    from pipeline.features import featurize
    from pipeline.incremental import _pin
    from pipeline.linkage import build_plan, cluster_edges
    from pipeline.session import release_caches

    out: dict = {}
    doc_turns = em._turns_from_documents(spark, sf_dir)
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
    release_caches()

    tracker = spark.sparkContext.statusTracker()

    def _jobs():
        return len(tracker.getJobIdsForGroup(None) or [])

    j0 = len(spark.sparkContext.statusTracker().getActiveJobsIds() or [])
    new_turns = doc_turns.where(slot == 19)
    with increment_tuning(spark):
        jobs_before: dict = {}
        all_ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)

        def njobs():
            ids = spark.sparkContext.statusTracker().getJobIdsForGroup(None)
            return len(ids) if ids else 0

        n_start = njobs()
        new_feats = _timed(
            spark,
            out,
            "1_featurize_antijoin_pin",
            lambda: _pin(
                featurize(canonicalize(new_turns), PRODUCTION_CONFIG).join(
                    base_feats.select("conv_id"), "conv_id", "left_anti"
                )
            ),
        )
        out["jobs_1"] = njobs() - n_start
        n1 = njobs()
        new_ids = new_feats.select("conv_id")
        feats_all = base_feats.unionByName(new_feats)
        res = _timed(
            spark,
            out,
            "2_candidate_pairs",
            lambda: incremental_candidate_pairs(
                feats_all, new_ids, PRODUCTION_CONFIG, True, base_anchor_df,
                base_keys, base_counts, new_feats,
            ),
        )
        pairs = res[0]
        scored = _timed(
            spark,
            out,
            "3_score_pairs_pinned",
            lambda: _score_increment_pairs(
                feats_all, pairs, PRODUCTION_CONFIG, True
            ),
        )
        out["jobs_23"] = njobs() - n1
        n2 = njobs()

        def _tail():
            edges = _edges_to_entities(scored, base_clusters)
            clusters, _ = _merge_labels(base_clusters, edges, new_ids)
            _noop(clusters)

        _timed(spark, out, "4_edges_cc_relabel_write", _tail)
        out["jobs_4"] = njobs() - n2
        out["jobs_total"] = njobs() - n_start
    release_caches()
    return out


def q10_kernel(spark, sf_dir: str) -> dict:
    """Pure-Python kernel throughput on ring pairs (no Spark in the timed
    region): isolates kernel CPU from Spark scheduling."""
    from pyspark.sql import functions as F

    from pipeline.kernels_batch import batch_component_scores
    from pipeline.normalize import norm_text_col

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    rows = (
        docs.select(
            F.col("doc_id").cast("long").alias("i"),
            norm_text_col("text").alias("norm_text"),
        )
        .orderBy("i")
        .collect()
    )
    texts = [r["norm_text"] for r in rows]
    n = len(texts)
    roles = ["ua", "uaua", "uauaua", "au"]
    a_list, b_list, ra_list, rb_list = [], [], [], []
    for i in range(n):
        for k in (1, 2):
            j = (i + k) % n
            a_list.append(texts[i])
            b_list.append(texts[j])
            ra_list.append(roles[i % 4])
            rb_list.append(roles[j % 4])
    # warm the per-doc kernel caches once (as production scoring does)
    batch_component_scores(a_list[:10000], b_list[:10000], ra_list[:10000],
                           rb_list[:10000])
    t0 = time.time()
    B = 10000
    for s in range(0, len(a_list), B):
        batch_component_scores(
            a_list[s : s + B], b_list[s : s + B],
            ra_list[s : s + B], rb_list[s : s + B],
        )
    dt = time.time() - t0
    return {
        "pairs": len(a_list),
        "wall_s": round(dt, 3),
        "pairs_per_sec_single_core": round(len(a_list) / dt, 1),
    }


PROBES = {
    "q6_phases": q6_phases,
    "q11_phases": q11_phases,
    "q11b_phases": q11b_phases,
    "gramstats": gramstats,
    "q10_kernel": q10_kernel,
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = _spark()
    _warm(spark, cpus)
    for name in sys.argv[1:]:
        fn = PROBES[name]
        result = fn(spark, sf_dir)
        print(json.dumps({"probe": name, "sf": sf_dir, **result}))


if __name__ == "__main__":
    main()
