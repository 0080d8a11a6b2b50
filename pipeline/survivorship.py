"""Entity survivorship — one golden record per resolved entity.

The reference stops at per-query best-result ranking
(ultimate_address_matcher.py:930-1010 picks the single best candidate
for one input address); it has no merged-entity view at all. A
production ER system needs one: after clustering, every entity should
surface a canonical member (the "survivor") plus merged provenance
fields (member count, activity span, total volume).

Spark-first shape: one equi-join of clusters to the narrow
``(conv_id, n_turns, norm_len, ts_us)`` doc projection, then rep
selection and every merged aggregate as window functions over the SAME
``partitionBy(entity_id)`` spec — a single entity-keyed Exchange serves
the row_number AND all four aggregates, and nothing wider than those
four columns ever shuffles. Survivor choice is a deterministic TOTAL
order (n_turns desc, norm_len desc, first_ts asc, conv_id asc —
conv_id is unique, so ties cannot exist), which makes the output stable
across runs/partitionings and lets the DuckDB oracle reproduce it
bit-for-bit with the same ``row_number()``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def entity_canonical(
    clusters: DataFrame, docs: DataFrame, include_text: bool = False
) -> DataFrame:
    """clusters(conv_id, entity_id) ⋈ docs -> one golden record per entity.

    ``docs`` needs conv_id, n_turns, first_ts and norm_text — the
    ``featurize`` output satisfies the default path. With
    ``include_text=True`` it additionally needs canonical_text, which
    ``featurize`` DROPS: pass the ``canonicalize`` output joined with
    the feature columns (or re-select canonical_text before the
    projection) for that mode (round-5 review — the old text sent
    callers to an input that cannot resolve the column).

    Returns entity_id, canonical_id (the survivor), n_members,
    total_turns, first_seen_us / last_seen_us (microsecond epochs — the
    driver's hash compare is exact on bigint where raw timestamps would
    be format-fragile), canonical_norm_len, and optionally the
    survivor's canonical_text.
    """
    cols = [
        F.col("conv_id"),
        F.col("n_turns"),
        F.length("norm_text").alias("norm_len"),
        F.unix_micros("first_ts").alias("ts_us"),
    ]
    if include_text:
        cols.append(F.col("canonical_text"))
    narrow = docs.select(*cols)
    j = clusters.join(narrow, "conv_id")

    part = Window.partitionBy("entity_id")
    order = part.orderBy(
        F.col("n_turns").desc(),
        F.col("norm_len").desc(),
        F.col("ts_us").asc(),
        F.col("conv_id").asc(),
    )
    ranked = j.select(
        "entity_id",
        F.row_number().over(order).alias("_rn"),
        F.col("conv_id").alias("canonical_id"),
        F.count(F.lit(1)).over(part).alias("n_members"),
        F.sum("n_turns").over(part).alias("total_turns"),
        F.min("ts_us").over(part).alias("first_seen_us"),
        F.max("ts_us").over(part).alias("last_seen_us"),
        F.col("norm_len").alias("canonical_norm_len"),
        *( [F.col("canonical_text")] if include_text else [] ),
    )
    return ranked.where(F.col("_rn") == 1).drop("_rn")
