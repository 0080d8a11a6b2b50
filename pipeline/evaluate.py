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
    def _canon(df: DataFrame, val: str, alias: str) -> DataFrame:
        # enforce the canonical (a < b) ordering instead of assuming it:
        # a label row carried as (b, a) must still join its scored twin
        return df.select(
            F.least("conv_id_a", "conv_id_b").alias("conv_id_a"),
            F.greatest("conv_id_a", "conv_id_b").alias("conv_id_b"),
            F.col(val).alias(alias),
        )

    pred = _canon(scored, "is_match", "pred")
    lab = _canon(labels, "is_match", "truth")
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


def _c2(c: str):
    """C(n,2) over column ``c`` in EXACT integer arithmetic: halve the
    even factor BEFORE the multiply. n*(n-1)/2 overflows the long
    intermediate past n~3.04e9 (ANSI error at exactly the degenerate
    everything-merged inputs these metrics exist to catch) and the
    double division silently loses exactness past n~1.3e8 (2^53);
    div-first is exact for every n whose C(n,2) fits a BIGINT."""
    return F.expr(
        f"case when {c} % 2 = 0 then ({c} div 2) * ({c} - 1) "
        f"else {c} * (({c} - 1) div 2) end"
    ).cast("long")


def cluster_agreement(clusters: DataFrame, expected: DataFrame) -> dict:
    """Pair-counting precision/recall/F1 of the produced clustering
    against ground truth, over the expected conv_ids. (Round-5 review:
    the old docstring claimed an exact-co-cluster-set fraction, which
    this never was.)

    Contingency-table formulation — tp/fp/fn are C(n,2) sums over the
    (true_entity, got_entity) cell counts, so cost is O(entities), never
    the item-level pair enumeration the old non-equi self-join did
    (quadratic in conv_ids; the exact blowup ``clustering_metrics``
    exists to avoid)."""
    got = clusters.alias("g")
    exp = expected.alias("e")
    j = exp.join(got, F.col("e.conv_id") == F.col("g.conv_id"), "left")
    pairs = (
        j.select(
            F.col("e.entity_id").alias("true_e"),
            # a conv the produced clustering is MISSING must still score:
            # NULL cells would collapse together. A per-row sentinel
            # entity ("__missing__<conv_id>") makes it a singleton
            # (contributes zero same-got pairs), exactly as before.
            F.coalesce(
                F.col("g.entity_id"),
                F.concat(F.lit("__missing__"), F.col("e.conv_id")),
            ).alias("got_e"),
        )
    )
    cells = pairs.groupBy("true_e", "got_e").agg(
        F.count(F.lit(1)).alias("n_pt")
    )
    per_got = cells.groupBy("got_e").agg(F.sum("n_pt").alias("n_p"))
    per_true = cells.groupBy("true_e").agg(F.sum("n_pt").alias("n_t"))
    zsum = lambda c: F.coalesce(F.sum(_c2(c)), F.lit(0))  # noqa: E731
    row = (
        cells.agg(zsum("n_pt").alias("tp"))
        .crossJoin(per_got.agg(zsum("n_p").alias("pairs_pred")))
        .crossJoin(per_true.agg(zsum("n_t").alias("pairs_true")))
        .collect()[0]
    )
    tp = int(row["tp"])
    fp = int(row["pairs_pred"]) - tp
    fn = int(row["pairs_true"]) - tp
    precision = tp / (tp + fp) if tp + fp else 1.0
    recall = tp / (tp + fn) if tp + fn else 1.0
    f1 = (
        2 * precision * recall / (precision + recall)
        if precision + recall
        else 0.0
    )
    return {"tp": tp, "fp": fp, "fn": fn, "precision": precision,
            "recall": recall, "f1": f1}


def clustering_metrics(pred: DataFrame, truth: DataFrame) -> DataFrame:
    """Extrinsic cluster-quality metrics between two clusterings — the
    standard ER evaluation pair: B-cubed precision/recall/F1 (Bagga &
    Baldwin 1998; Amigo et al. 2009 show it is the only common metric
    satisfying all four clustering-evaluation constraints) and
    pair-counting precision/recall/F1 (the Rand family). The reference
    has no evaluation surface at all — quality is eyeballed per query
    (ultimate_address_matcher.py:760-866 emits per-result quality, never
    corpus-level truth comparison); production ER lives and dies by
    these numbers.

    Inputs are two assignments ``(conv_id, entity_id)``; only conv_ids
    present in BOTH are evaluated (the labeled subset). Output is ONE
    row, all BIGINT:

    - ``n_items``, ``n_pred_entities``, ``n_truth_entities``
    - ``pair_tp`` / ``pair_pred`` / ``pair_truth`` — co-clustered pair
      counts (exact integers)
    - ``pair_precision_x1e6`` / ``pair_recall_x1e6`` / ``pair_f1_x1e6``
    - ``bcubed_precision_x1e6`` / ``bcubed_recall_x1e6`` /
      ``bcubed_f1_x1e6``

    Scale shape: ONE conv_id equi-join (co-partitioned shuffle of two
    narrow id->label frames), ONE contingency aggregation to
    ``(p, t, n_pt)`` cells — from there everything operates on
    entity-count-sized frames (windows + a 1-row agg). No item-level
    pair enumeration anywhere: pair counts come from C(n,2) over the
    contingency table, so a 20k-member entity contributes one cell, not
    2*10^8 rows.

    Cross-engine determinism (the DuckDB oracle replays this SQL): every
    averaged quantity is summed as exact BIGINTs — each B-cubed item
    contribution is rounded to integer nano-units per CELL
    (``round(n_pt^2 * 1e9 / n_p)``), then BIGINT-summed, so the result
    is independent of summation order (float sums are not). One
    division + one round per cell is bit-identical across Spark/DuckDB
    (both round positive halves away from zero). Exact while
    ``n_pt * 1e9 < 2^53`` per cell (~9e6 items in one intersection
    cell); past that the last digits degrade gracefully.
    """
    from pyspark.sql import Window

    j = pred.select("conv_id", F.col("entity_id").alias("p")).join(
        truth.select("conv_id", F.col("entity_id").alias("t")), "conv_id"
    )
    cells = j.groupBy("p", "t").agg(
        F.count(F.lit(1)).cast("long").alias("n_pt")
    )
    wp, wt = Window.partitionBy("p"), Window.partitionBy("t")
    cells = (
        cells.withColumn("n_p", F.sum("n_pt").over(wp))
        .withColumn("n_t", F.sum("n_pt").over(wt))
        # first-cell flags: count each pred/truth entity exactly once in
        # the single-row agg below (no second pass over the cells)
        .withColumn(
            "rn_p", F.row_number().over(wp.orderBy("t"))
        )
        .withColumn(
            "rn_t", F.row_number().over(wt.orderBy("p"))
        )
    )
    nano = lambda num, den: F.round(  # noqa: E731
        F.col(num) * F.col(num) * F.lit(1_000_000_000.0) / F.col(den)
    ).cast("long")
    c2 = _c2
    # sum over an EMPTY cells frame is NULL, not 0 — and NULL == 0 is
    # NULL, so none of the empty-denominator defaults below would fire
    # (the whole row came back NULL). Coalesce every aggregate so zero
    # shared conv_ids yields the documented defined values.
    zsum = lambda c: F.coalesce(F.sum(c), F.lit(0))  # noqa: E731
    stats = cells.agg(
        zsum("n_pt").cast("long").alias("n_items"),
        zsum(F.when(F.col("rn_p") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_pred_entities"),
        zsum(F.when(F.col("rn_t") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_truth_entities"),
        zsum(c2("n_pt")).cast("long").alias("pair_tp"),
        zsum(F.when(F.col("rn_p") == 1, c2("n_p")).otherwise(0))
        .cast("long")
        .alias("pair_pred"),
        zsum(F.when(F.col("rn_t") == 1, c2("n_t")).otherwise(0))
        .cast("long")
        .alias("pair_truth"),
        zsum(nano("n_pt", "n_p")).cast("long").alias("bp_nano"),
        zsum(nano("n_pt", "n_t")).cast("long").alias("br_nano"),
    )
    # ratios: ONE integer-fed division + round each -> deterministic
    # across engines; empty denominator => metric defined as 1.0 (no
    # predicted/true pairs to get wrong), F1 of (0,0) => 0.
    x1e6 = F.lit(1_000_000.0)
    ratio6 = lambda num, den: F.when(  # noqa: E731
        F.col(den) == 0, F.lit(1_000_000).cast("long")
    ).otherwise(F.round(F.col(num) * x1e6 / F.col(den)).cast("long"))
    f1_6 = lambda p6, r6: F.when(  # noqa: E731
        (F.col(p6) + F.col(r6)) == 0, F.lit(0).cast("long")
    ).otherwise(
        F.round(
            F.lit(2.0) * F.col(p6) * F.col(r6) / (F.col(p6) + F.col(r6))
        ).cast("long")
    )
    return (
        stats.withColumn(
            "pair_precision_x1e6", ratio6("pair_tp", "pair_pred")
        )
        .withColumn("pair_recall_x1e6", ratio6("pair_tp", "pair_truth"))
        .withColumn(
            "pair_f1_x1e6", f1_6("pair_precision_x1e6", "pair_recall_x1e6")
        )
        # bcubed_p = bp_nano / (n_items * 1e9); x1e6 => / (n_items * 1e3)
        .withColumn(
            "bcubed_precision_x1e6",
            F.when(F.col("n_items") == 0, F.lit(1_000_000).cast("long"))
            .otherwise(
                F.round(
                    F.col("bp_nano") / (F.col("n_items") * F.lit(1000.0))
                ).cast("long")
            ),
        )
        .withColumn(
            "bcubed_recall_x1e6",
            F.when(F.col("n_items") == 0, F.lit(1_000_000).cast("long"))
            .otherwise(
                F.round(
                    F.col("br_nano") / (F.col("n_items") * F.lit(1000.0))
                ).cast("long")
            ),
        )
        .withColumn(
            "bcubed_f1_x1e6",
            f1_6("bcubed_precision_x1e6", "bcubed_recall_x1e6"),
        )
        .drop("bp_nano", "br_nano")
    )


def review_queue(
    scored: DataFrame,
    lo: float = 55.0,
    hi: float = 85.0,
    boundary: float = 70.0,
    top_n: int = 1000,
) -> DataFrame:
    """Clerical-review queue — the human-in-the-loop seam every
    production linkage deployment needs (Fellegi & Sunter 1969's
    'possible link' region): scored pairs whose confidence falls inside
    the ambiguity band ``[lo, hi)``, ranked by distance to the decision
    ``boundary`` (closest = most informative to adjudicate first),
    deterministic id tiebreak, truncated to ``top_n``.

    The reference exposes only accept/reject (best-result or None,
    ultimate_address_matcher.py:930-952) — ambiguous candidates are
    silently dropped; this surfaces them instead.

    Scale shape: band filter is a codegen'd scan predicate; the global
    rank is orderBy+limit — Spark executes TakeOrderedAndProject
    (per-partition top-N, then a single bounded merge), so nothing
    resembling a global sort of the pair table ever runs. The
    row_number window at the end operates on <= top_n rows (a bounded
    reduction, same class as the CC checksum).
    """
    from pyspark.sql import Window

    # distance as x1e6 BIGINT, not a rounded DOUBLE: confidence is
    # bit-equal across engines (pinned by linkage_scored_pairs), so one
    # abs-diff + one round-to-integer is too — while round(x, 6) as a
    # DOUBLE can differ by 1 ULP between implementations and break the
    # cross-engine hash (and the ordering it feeds).
    band = scored.where(
        (F.col("confidence") >= F.lit(lo)) & (F.col("confidence") < F.lit(hi))
    ).withColumn(
        "boundary_dist_x1e6",
        F.round(
            F.abs(F.col("confidence") - F.lit(boundary)) * F.lit(1_000_000.0)
        ).cast("long"),
    )
    order = [
        F.col("boundary_dist_x1e6").asc(),
        F.col("conv_id_a").asc(),
        F.col("conv_id_b").asc(),
    ]
    top = band.orderBy(*order).limit(top_n)
    return top.withColumn(
        "review_rank",
        F.row_number().over(Window.partitionBy().orderBy(*order)),
    ).select(
        "review_rank",
        "conv_id_a",
        "conv_id_b",
        "confidence",
        "tier",
        "is_match",
        "boundary_dist_x1e6",
    )


def blocking_metrics(pairs: DataFrame, labels: DataFrame) -> DataFrame:
    """Blocking-quality metrics — the standard candidate-generation
    evaluation pair (Christen 2012): **pairs completeness** (share of
    true co-entity pairs that survived blocking; a blocking miss is an
    unrecoverable recall loss — scoring never sees the pair) and
    **reduction ratio** (share of the full O(n^2) pair space blocking
    eliminated). The reference can't measure either: its recall losses
    disappear inside OpenSearch result windows.

    ``pairs(conv_id_a, conv_id_b)`` = candidate pairs, ``labels(conv_id,
    entity_id)`` = ground-truth assignment over the corpus. Candidates
    are graded on the labeled universe (inner join on both endpoints).
    One row, all BIGINT:

    - ``n_docs``, ``n_candidate_pairs``, ``n_true_candidates``
      (candidates whose endpoints share a truth entity),
      ``n_truth_pairs`` (C(n,2) summed per truth entity)
    - ``pairs_completeness_x1e6`` = n_true_candidates / n_truth_pairs
    - ``reduction_ratio_x1e6`` = 1 - n_candidate_pairs / C(n_docs, 2)

    Scale shape: two id equi-joins label the candidate endpoints (both
    sides narrow id->label frames), truth pair counts come from C(n,2)
    on per-entity sizes — no pair enumeration of the truth side, so a
    20k-member entity costs one row. The two 1-row aggregates crossJoin
    into the result (one job).
    """
    lab = labels.select("conv_id", "entity_id")
    la = lab.select(
        F.col("conv_id").alias("conv_id_a"), F.col("entity_id").alias("ea")
    )
    lb = lab.select(
        F.col("conv_id").alias("conv_id_b"), F.col("entity_id").alias("eb")
    )
    cand = (
        pairs.select("conv_id_a", "conv_id_b")
        .join(la, "conv_id_a")
        .join(lb, "conv_id_b")
    )
    cand_stats = cand.agg(
        F.count(F.lit(1)).cast("long").alias("n_candidate_pairs"),
        F.coalesce(
            F.sum(F.when(F.col("ea") == F.col("eb"), 1).otherwise(0)), F.lit(0)
        )
        .cast("long")
        .alias("n_true_candidates"),
    )
    truth_stats = (
        lab.groupBy("entity_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            # coalesce: sum over an empty labels frame is NULL and the
            # empty-denominator defaults downstream never fire on NULL
            F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n_docs"),
            # same exact halve-first C(n,2) as clustering_metrics
            F.coalesce(
                F.sum(
                    F.expr(
                        "case when n % 2 = 0 then (n div 2) * (n - 1) "
                        "else n * ((n - 1) div 2) end"
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_truth_pairs"),
        )
    )
    x1e6 = F.lit(1_000_000.0)
    return (
        cand_stats.crossJoin(truth_stats)
        .withColumn(
            "pairs_completeness_x1e6",
            F.when(
                F.col("n_truth_pairs") == 0, F.lit(1_000_000).cast("long")
            ).otherwise(
                F.round(
                    F.col("n_true_candidates") * x1e6 / F.col("n_truth_pairs")
                ).cast("long")
            ),
        )
        .withColumn(
            "reduction_ratio_x1e6",
            F.when(F.col("n_docs") < 2, F.lit(1_000_000).cast("long"))
            .otherwise(
                F.round(
                    (
                        F.lit(1.0)
                        - F.col("n_candidate_pairs")
                        / F.expr(
                            "case when n_docs % 2 = 0 then "
                            "(n_docs div 2) * (n_docs - 1) else "
                            "n_docs * ((n_docs - 1) div 2) end"
                        )
                    )
                    * x1e6
                ).cast("long")
            ),
        )
        .select(
            "n_docs",
            "n_candidate_pairs",
            "n_true_candidates",
            "n_truth_pairs",
            "pairs_completeness_x1e6",
            "reduction_ratio_x1e6",
        )
    )


def cluster_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """Entity churn between two cluster assignments — the "what changed
    since the last run" view every production ER deployment reports
    (incremental step vs yesterday's batch, pre- vs post-retraction,
    config A vs config B). The reference, being stateless per query, has
    no notion of assignment drift at all.

    One row per NEW entity, classified by how it relates to the OLD
    assignment:

    - ``identical`` — exactly one source entity, carried whole, nothing
      added (the stable case an incremental run should dominate in)
    - ``grew``      — one whole source entity + newly-appeared items
    - ``merged``    — >= 2 source entities, each carried WHOLE, no adds
    - ``split``     — a strict subset of one source entity
    - ``mixed``     — any other combination (partial sources + adds)
    - ``new``       — no member existed in the old assignment

    Columns: ``entity_id``, ``n_members``, ``n_carried`` (members that
    existed in old), ``n_added``, ``n_src_entities`` (distinct old
    entities contributing), ``n_whole_srcs`` (those carried in full),
    ``change``. Old entities that vanished entirely are the complement
    (old minus the ``src`` set) — derivable with one anti-join; they are
    not rows here because this frame is keyed by NEW entities.

    Scale shape: one full-outer-free composition — new left-joins old on
    conv_id (two narrow id->label frames), one (new, old) contingency
    aggregation, one broadcast-sized join against old entity sizes, one
    final per-new-entity aggregation. Everything after the first join is
    entity-count-sized; no pair enumeration anywhere.
    """
    o = old.select("conv_id", F.col("entity_id").alias("old_e"))
    n = new.select("conv_id", F.col("entity_id").alias("new_e"))
    j = n.join(o, "conv_id", "left")
    cells = j.groupBy("new_e", "old_e").agg(
        F.count(F.lit(1)).cast("long").alias("n_cell")
    )
    old_sizes = o.groupBy("old_e").agg(
        F.count(F.lit(1)).cast("long").alias("old_size")
    )
    cells = cells.join(old_sizes, "old_e", "left")
    per_new = cells.groupBy("new_e").agg(
        F.sum("n_cell").cast("long").alias("n_members"),
        F.sum(F.when(F.col("old_e").isNotNull(), F.col("n_cell")).otherwise(0))
        .cast("long")
        .alias("n_carried"),
        F.sum(F.when(F.col("old_e").isNull(), F.col("n_cell")).otherwise(0))
        .cast("long")
        .alias("n_added"),
        F.sum(F.when(F.col("old_e").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_src_entities"),
        F.sum(
            F.when(
                F.col("old_e").isNotNull()
                & (F.col("n_cell") == F.col("old_size")),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_whole_srcs"),
    )
    src, whole = F.col("n_src_entities"), F.col("n_whole_srcs")
    added = F.col("n_added")
    change = (
        F.when(src == 0, F.lit("new"))
        .when((src == 1) & (whole == 1) & (added == 0), F.lit("identical"))
        .when((src == 1) & (whole == 1), F.lit("grew"))
        # split = a STRICT SUBSET of one source entity (docstring):
        # partial source + additions is 'mixed', not 'split'
        .when((src == 1) & (added == 0), F.lit("split"))
        .when((src == whole) & (added == 0), F.lit("merged"))
        .otherwise(F.lit("mixed"))
    )
    return per_new.select(
        F.col("new_e").alias("entity_id"),
        "n_members",
        "n_carried",
        "n_added",
        "n_src_entities",
        "n_whole_srcs",
        change.alias("change"),
    )
