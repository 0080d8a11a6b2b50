"""End-to-end linkage composition (lazy) + staged resumable runner.

``build_plan`` composes the whole pipeline lazily — a single Catalyst plan
per output, suitable for tests and the driver contract. ``run_staged``
materializes each stage with commit manifests (resume semantics, SURVEY.md
§3.4):

  turns -> docs -> features -> candidate pairs (+hot-key audit)
        -> scored pairs -> clusters -> audit
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline import audit as audit_mod
from pipeline.blocking import candidate_pairs
from pipeline.canonicalize import canonicalize
from pipeline.cluster import connected_components
from pipeline.config import DEFAULT_CONFIG, MatchConfig
from pipeline.features import featurize
from pipeline.io import StageRunner
from pipeline.scoring import score_pairs


def build_plan(
    turns: DataFrame,
    cfg: MatchConfig = DEFAULT_CONFIG,
    anchor_df: DataFrame | None = None,
) -> dict[str, DataFrame]:
    """Lazy end-to-end plan. Clustering needs actions (iterative), so the
    returned ``edges`` is the match edge list; call
    ``cluster_edges`` to materialize clusters.

    ``features`` is persisted (memory+disk): it feeds blocking key
    exploding, the key-frequency pass, BOTH sides of the pair self-join
    and BOTH sides of the scoring join — without persistence Catalyst
    re-derives the canonicalize aggregation + MinHash for every branch
    (measured 12 scans of the turns table). run_staged gets the same
    effect from stage materialization.
    """
    from pipeline.session import track_cache

    docs = canonicalize(turns)
    feats = track_cache(featurize(docs, cfg))
    pairs, hot_audit = candidate_pairs(feats, cfg, anchor_df=anchor_df)
    pairs = track_cache(pairs)
    scored = score_pairs(feats, pairs, cfg)
    edges = scored.where("is_match").select(
        F.col("conv_id_a").alias("src"), F.col("conv_id_b").alias("dst")
    )
    return {
        "docs": docs,
        "features": feats,
        "pairs": pairs,
        "hot_key_audit": hot_audit,
        "scored": scored,
        "edges": edges,
    }


def cluster_edges(
    edges: DataFrame, feats: DataFrame
) -> tuple[DataFrame, list[dict]]:
    return connected_components(edges, all_nodes=feats.select("conv_id"))


def best_matches(scored: DataFrame) -> DataFrame:
    """W1-W4 best-candidate selection with the C3 unit-exact tie-break.

    The reference ranks exact matches first (``_rank_results``,
    optimized.py:739-776) and RETURNS EARLY on a unit-exact hit even at a
    lower cascade level (UAM:910-943) — a unit-exact candidate outranks a
    same-confidence candidate whose unit differs. Recast as a total
    ordering: is_exact desc, unit_exact desc, confidence desc, partner id
    asc (deterministic).
    """
    from pyspark.sql import Window

    cols = ["confidence", "tier", "is_exact", "unit_exact"]
    sym = scored.select(
        F.col("conv_id_a").alias("conv_id"),
        F.col("conv_id_b").alias("partner_id"),
        *cols,
    ).unionByName(
        scored.select(
            F.col("conv_id_b").alias("conv_id"),
            F.col("conv_id_a").alias("partner_id"),
            *cols,
        )
    )
    w = Window.partitionBy("conv_id").orderBy(
        F.desc("is_exact"),
        F.desc("unit_exact"),
        F.desc("confidence"),
        F.asc("partner_id"),
    )
    return (
        sym.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("conv_id", "partner_id", *cols)
    )


def run_staged(
    spark: SparkSession,
    turns: DataFrame,
    out_dir: str,
    cfg: MatchConfig = DEFAULT_CONFIG,
    audit_sample_rate: float | None = None,
) -> dict[str, DataFrame]:
    """Materialize every stage with commit manifests (resumable).

    ``audit_sample_rate`` (round-3 VERDICT task 6, opt-in): by default
    every pair is scored FULLY because the audit histograms need every
    pair's decision columns. With a rate in (0, 1], the scored stage
    takes the ``match_only`` fast path (cluster edges only — provably
    the identical match set, so CLUSTERS ARE IDENTICAL; pinned by
    ``tests/test_resume.py::test_audit_sample_seam``), and the full
    decision columns are computed on a DETERMINISTIC sample of pairs
    (the shared hash coin on the pair key) for the audit tables, which
    carry ``sample_rate`` so consumers read them as estimates.
    """
    # deterministic ACROSS PROCESSES: hash() of a dataclass with str
    # fields is salted per interpreter (PYTHONHASHSEED), which would
    # silently defeat resume; repr() of a frozen dataclass is stable
    import hashlib

    fingerprint = "cfg:" + hashlib.md5(
        (repr(cfg) + f":audit={audit_sample_rate}").encode("utf-8")
    ).hexdigest()
    runner = StageRunner(spark, out_dir, fingerprint=fingerprint)

    docs = runner.run("docs", lambda: canonicalize(turns))
    feats = runner.run("features", lambda: featurize(docs, cfg))

    def _pairs() -> DataFrame:
        p, hot, pair_cap = candidate_pairs(feats, cfg, return_pair_audit=True)
        runner.run("hot_key_audit", lambda: hot)
        runner.run("pair_cap_audit", lambda: pair_cap)
        return p

    pairs = runner.run("pairs", _pairs)
    scored = runner.run(
        "scored",
        lambda: score_pairs(
            feats, pairs, cfg, match_only=audit_sample_rate is not None
        ),
    )

    def _clusters() -> DataFrame:
        edges = scored.where("is_match").select(
            F.col("conv_id_a").alias("src"), F.col("conv_id_b").alias("dst")
        )
        clusters, cc_metrics = connected_components(
            edges, all_nodes=feats.select("conv_id")
        )
        runner.metrics.extend(
            {"stage": "cc", **m} for m in cc_metrics
        )
        return clusters

    clusters = runner.run("clusters", _clusters)
    if audit_sample_rate is None:
        audit_scored = scored
    else:
        from pipeline.features import hash_fn
        from pipeline.hashing import coin_col

        coin = coin_col(hash_fn(cfg), "audit", "conv_id_a", "conv_id_b")
        audit_scored = runner.run(
            "scored_audit_sample",
            lambda: score_pairs(
                feats, pairs.where(coin < F.lit(float(audit_sample_rate))), cfg
            ),
        )

    def _label(df: DataFrame) -> DataFrame:
        if audit_sample_rate is None:
            return df
        return df.withColumn(
            "sample_rate", F.lit(float(audit_sample_rate))
        )

    tiers = runner.run(
        "tier_histogram",
        lambda: _label(audit_mod.tier_histogram(audit_scored)),
    )
    summary = runner.run(
        "match_summary", lambda: _label(audit_mod.match_summary(audit_scored))
    )
    # per-partition lineage of the scored table (north_rule: resumable
    # with per-partition lineage + metrics) — one row per partition
    lineage = runner.run(
        "partition_lineage", lambda: audit_mod.partition_lineage(scored)
    )

    # persist the run's stage metrics as an audit table (Iceberg append in
    # production; parquet here) — one row per stage/CC-iteration event
    import json as _json

    metrics_df = spark.createDataFrame(
        [(m.get("stage", "?"), _json.dumps(m, default=str)) for m in runner.metrics],
        "stage string, payload string",
    )
    from pipeline.io import write_table

    write_table(metrics_df, runner.stage_dir("audit_metrics"))

    # every stage is materialized to its table by now — release any
    # tracked caches so a long-lived session doesn't accumulate storage
    from pipeline.session import release_caches

    release_caches()

    return {
        "docs": docs,
        "features": feats,
        "pairs": pairs,
        "scored": scored,
        "clusters": clusters,
        "tier_histogram": tiers,
        "match_summary": summary,
        "partition_lineage": lineage,
        "_runner": runner,
    }
