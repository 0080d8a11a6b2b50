"""Stage 4 — pairwise scoring: vectorized kernels + JVM tier cascade.

Two layers, split exactly as SURVEY.md §2.11 prescribes:

* **Channel scores** (InDel ratio, token-sort, partial, Jaccard,
  Jaro-Winkler, role-structure) — an Arrow-batched pandas UDF calling the
  SAME kernel code as the pandas oracle (``pipeline.oracle
  .component_scores``), so pipeline and oracle cannot diverge. This is the
  only Python on the pair path; every kernel early-exits on equal strings,
  so exact/norm_eq pairs cost ~nothing.

* **Weighted confidence + tier cascade + quality/reliability** — pure JVM
  Column expressions reproducing ``optimized.py:686-737`` (caps, presence
  weights, post-hoc guards) and the 10-level cascade recast as a one-pass
  max-tier assignment (SURVEY.md §2.9 C1: thresholds are monotone, so
  "first level that hits" == "highest tier whose threshold the pair
  meets"). Floating-point op ORDER matches the oracle's accumulation
  order, so JVM doubles equal Python doubles bit-for-bit.

Scale: the scoring stage is a narrow map over the pairs table — no
shuffle. Arrow batch size is capped in the session config because paired
canonical texts are wide rows.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pipeline.config import (
    DEFAULT_CONFIG,
    MatchConfig,
    RELIABILITY_BANDS,
    TIERS,
    TIER_ADJUSTMENT,
)

CHANNELS = ["text", "token_sort", "partial", "jaccard", "jaro", "struct"]

_SCORE_SCHEMA = T.StructType(
    [T.StructField(f"s_{c}", T.DoubleType()) for c in CHANNELS]
)


def make_score_udf(cfg: MatchConfig = DEFAULT_CONFIG):
    """Series->DataFrame pandas UDF computing the six channel scores."""

    def _score_batch(
        norm_a: pd.Series, norm_b: pd.Series, roles_a: pd.Series, roles_b: pd.Series
    ) -> pd.DataFrame:
        # import inside the UDF so executors resolve it after --py-files
        from pipeline.oracle import component_scores

        rows = [
            component_scores(a or "", b or "", ra or "", rb or "", cfg)
            for a, b, ra, rb in zip(norm_a, norm_b, roles_a, roles_b)
        ]
        return pd.DataFrame(
            {f"s_{c}": [r[c] for r in rows] for c in CHANNELS}
        )

    return F.pandas_udf(_score_batch, returnType=_SCORE_SCHEMA)


def confidence_col(cfg: MatchConfig = DEFAULT_CONFIG) -> Column:
    """Weighted confidence over s_* columns — oracle.weighted_confidence
    as a Column expression, FP-op-order identical."""
    s = {c: F.col(f"s_{c}") for c in CHANNELS}
    w = cfg.weights()

    w_partial = F.when(s["partial"] == 0.0, F.lit(0.0)).otherwise(
        F.lit(w["partial"])
    )
    jacc_kept = s["jaccard"] >= 50.0
    jacc_score_term = F.when(jacc_kept, s["jaccard"] * F.lit(w["jaccard"])).otherwise(
        F.lit(0.0)
    )
    jacc_weight_term = F.when(jacc_kept, F.lit(w["jaccard"])).otherwise(F.lit(0.0))

    total_score = (
        s["text"] * F.lit(w["text"])
        + s["token_sort"] * F.lit(w["token_sort"])
        + s["partial"] * w_partial
        + jacc_score_term
        + s["jaro"] * F.lit(w["jaro"])
        + s["struct"] * F.lit(w["struct"])
    )
    total_weight = (
        F.lit(w["text"])
        + F.lit(w["token_sort"])
        + w_partial
        + jacc_weight_term
        + F.lit(w["jaro"])
        + F.lit(w["struct"])
    )
    ws = F.when(total_weight == 0.0, F.lit(0.0)).otherwise(
        total_score / total_weight
    )

    # post-hoc high-confidence guards (optimized.py:728-735)
    ws_a = F.when(s["text"] < 90.0, F.least(ws, F.lit(75.0))).otherwise(ws)
    ws_b = F.when(s["token_sort"] < 85.0, F.least(ws_a, F.lit(80.0))).otherwise(ws_a)
    guarded = F.when(ws > 85.0, ws_b).otherwise(ws)

    # critical-channel early return (optimized.py:704-706)
    return F.when(
        s["token_sort"] < 70.0, F.least(s["token_sort"], F.lit(60.0))
    ).otherwise(guarded)


def tier_col(conf: Column) -> Column:
    """One-pass max-tier assignment (cascade recast, SURVEY.md §2.9 C1)."""
    expr = F.lit("none")
    for name, threshold, _k in reversed(TIERS):
        expr = F.when(conf >= F.lit(threshold), F.lit(name)).otherwise(expr)
    return expr


def adjustment_col(tier: Column) -> Column:
    expr = F.lit(-100.0)
    for name, adj in TIER_ADJUSTMENT.items():
        expr = F.when(tier == name, F.lit(adj)).otherwise(expr)
    return expr


def reliability_col(quality: Column) -> Column:
    expr = F.lit("speculative")
    for threshold, band in reversed(RELIABILITY_BANDS):
        expr = F.when(quality >= F.lit(threshold), F.lit(band)).otherwise(expr)
    return expr


def with_decisions(
    scored: DataFrame, cfg: MatchConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Add confidence / tier / adjusted / quality / reliability / is_match
    over a DataFrame that already has the s_* channel columns."""
    out = scored.withColumn("confidence", confidence_col(cfg))
    out = out.withColumn("tier", tier_col(F.col("confidence")))
    adj = adjustment_col(F.col("tier"))
    out = out.withColumn(
        "confidence_adjusted", F.greatest(F.lit(0.0), F.col("confidence") + adj)
    )
    out = out.withColumn(
        "quality",
        F.greatest(
            F.lit(0.0),
            F.least(
                F.lit(100.0),
                F.col("confidence")
                + F.least(F.col("s_text") / 5.0, F.lit(15.0))
                + adj,
            ),
        ),
    )
    out = out.withColumn("reliability", reliability_col(F.col("quality")))
    out = out.withColumn(
        "is_match",
        (F.col("confidence") >= F.lit(cfg.match_tier_threshold))
        & (F.col("s_text") >= F.lit(cfg.match_text_floor)),
    )
    return out


def score_pairs(
    feats: DataFrame, pairs: DataFrame, cfg: MatchConfig = DEFAULT_CONFIG
) -> DataFrame:
    """pairs + features -> scored pairs with decisions.

    Two equi-joins pull each side's (norm_text, roles_sig); then one
    narrow UDF stage + column arithmetic. On a bucketed production table
    both joins are shuffle-free (storage-partitioned on conv_id).
    """
    fa = feats.select(
        F.col("conv_id").alias("conv_id_a"),
        F.col("norm_text").alias("_norm_a"),
        F.col("roles_sig").alias("_roles_a"),
    )
    fb = feats.select(
        F.col("conv_id").alias("conv_id_b"),
        F.col("norm_text").alias("_norm_b"),
        F.col("roles_sig").alias("_roles_b"),
    )
    # The kernel UDF is CPU-bound Python: AQE sizes partitions by BYTES, so
    # a small-but-expensive pair table gets coalesced into 1-2 tasks (and a
    # broadcast join keeps it in the upstream stage) — measured 0.17 scaling
    # efficiency without this. Hash-repartition on the pair key to
    # 3x cores so every core scores. Repartition BEFORE the text joins:
    # the pre-join rows are ids-only (~60x narrower than with both
    # canonical texts attached), so the forced shuffle moves megabytes,
    # not the full pair-text volume; a broadcast text join preserves the
    # partitioning into the UDF stage.
    n_parts = pairs.sparkSession.sparkContext.defaultParallelism * 3
    joined = (
        pairs.repartition(n_parts, "conv_id_a", "conv_id_b")
        .join(fa, "conv_id_a")
        .join(fb, "conv_id_b")
    )

    udf = make_score_udf(cfg)
    scored = joined.withColumn(
        "_s", udf("_norm_a", "_norm_b", "_roles_a", "_roles_b")
    )
    scored = scored.select(
        "conv_id_a", "conv_id_b", "block_key", "families", "_s.*"
    )
    return with_decisions(scored, cfg)
