"""Stage 6b — pairwise precision/recall/F1 vs labels (BASELINE.json metric:
F1 >= 0.99 on labeled candidate pairs at the same blocking key)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pairwise_f1(scored: DataFrame, labels: DataFrame) -> dict:
    """scored(conv_id_a, conv_id_b, is_match) vs
    labels(conv_id_a, conv_id_b, is_match) -> {precision, recall, f1, ...}.

    Pairs are compared on canonical (a < b) ordering; label pairs missing
    from ``scored`` count as predicted non-match (blocking miss -> recall
    hit), mirroring the reference's "no candidate returned" failure mode
    (ultimate_address_matcher.py:950-952).
    """
    pred = scored.select(
        "conv_id_a", "conv_id_b", F.col("is_match").alias("pred")
    )
    lab = labels.select(
        "conv_id_a", "conv_id_b", F.col("is_match").alias("truth")
    )
    j = lab.join(pred, ["conv_id_a", "conv_id_b"], "left").fillna(
        {"pred": False}
    )
    row = j.agg(
        F.sum(F.when(F.col("pred") & F.col("truth"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("pred") & ~F.col("truth"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~F.col("pred") & F.col("truth"), 1).otherwise(0)).alias("fn"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    tp, fp, fn = int(row["tp"]), int(row["fp"]), int(row["fn"])
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "n_labeled": int(row["n"]),
        "precision": precision,
        "recall": recall,
        "f1": f1,
    }


def cluster_agreement(clusters: DataFrame, expected: DataFrame) -> dict:
    """Fraction of conv_ids whose co-cluster set matches ground truth
    exactly, via pair comparison within expected entities."""
    got = clusters.alias("g")
    exp = expected.alias("e")
    j = exp.join(got, F.col("e.conv_id") == F.col("g.conv_id"), "left")
    # same expected entity -> same produced entity?
    pairs = (
        j.select(
            F.col("e.conv_id").alias("conv_id"),
            F.col("e.entity_id").alias("true_e"),
            F.col("g.entity_id").alias("got_e"),
        )
    )
    a = pairs.alias("a")
    b = pairs.alias("b")
    cross = a.join(
        b, F.col("a.conv_id") < F.col("b.conv_id")
    ).select(
        (F.col("a.true_e") == F.col("b.true_e")).alias("t"),
        (F.col("a.got_e") == F.col("b.got_e")).alias("g"),
    )
    row = cross.agg(
        F.sum(F.when(F.col("t") & F.col("g"), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(~F.col("t") & F.col("g"), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("t") & ~F.col("g"), 1).otherwise(0)).alias("fn"),
    ).collect()[0]
    tp, fp, fn = int(row["tp"]), int(row["fp"]), int(row["fn"])
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision,
            "recall": recall, "f1": f1}
