"""Dataset-curation operators for training-data pipelines, over
``documents(doc_id, text, lang, ...)``.

Three operators a pretraining data pipeline runs after dedup/quality:

  * deterministic stratified sampling — seeded hash-coin selection, two
    shapes: ``sample_rate`` (stateless coin < rate filter: no shuffle,
    no skew, the 100-TB path) and ``sample_topn`` (exact n per stratum
    via a windowed coin rank: exact counts, pays one shuffle by stratum
    — use rate-based for power-law strata).
  * sequence packing — concat-and-chunk assignment of documents to
    fixed token-budget bins (the standard pretraining batch-prep step):
    deterministic order, running token offset, ``bin_id = floor(offset /
    budget)``. Global order = one window partition, so production runs
    it per shard (``partition_col``) — bins are then locally dense per
    shard, which is exactly how multi-worker pretraining shards batches
    anyway.
  * decontamination — flag documents whose hashed char-n-gram overlap
    with a benchmark/eval corpus exceeds a threshold. The benchmark
    gram set is DISTINCT + broadcast (eval sets are tiny next to the
    corpus); the corpus side explodes to hashed longs only, so the join
    moves 8-byte keys. The overlap fraction is exact, not sketched.

Every operator keys its coins/grams off the engine-neutral 60-bit hash
(``pipeline.hashing``), so all three have DuckDB oracle twins in
``__spark_entry__`` (contract queries ``sample_stratified``,
``pack_sequences``, ``decontaminate``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline.hashing import coin_col, h60_col
from pipeline.normalize import norm_text_col


def _coin(seed: str, id_col: str):
    """Engine-neutral coin (shared idiom: ``pipeline.hashing.coin_col``)."""
    return coin_col(h60_col, seed, F.col(id_col))


def sample_rate(
    docs: DataFrame, rate: float, seed: str = "sample", id_col: str = "doc_id"
) -> DataFrame:
    """Stateless deterministic sample: keep rows whose coin < rate.

    No shuffle, no state, reproducible across engines and reruns —
    survives any corpus size and any stratum skew (each row decides for
    itself). Expected kept fraction = rate.
    """
    return docs.where(_coin(seed, id_col) < F.lit(rate))


def sample_topn(
    docs: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    seed: str = "sample",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum, chosen by coin rank
    (ties broken by id — fully deterministic). One shuffle by stratum;
    a power-law stratum concentrates its rows on one partition, so use
    ``sample_rate`` when strata can be huge."""
    w = Window.partitionBy(stratum_col).orderBy(
        _coin(seed, id_col).asc(), F.col(id_col).asc()
    )
    return (
        docs.withColumn("_rank", F.row_number().over(w))
        .where(F.col("_rank") <= n_per_stratum)
        .drop("_rank")
    )


def pack_sequences(
    docs: DataFrame,
    token_budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    partition_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk packing: deterministic ``id_col`` order, running
    token offset, ``bin_id = floor(offset_tokens / token_budget)``.

    Returns (id, n_tokens, offset_tokens, bin_id) — a document may
    straddle a budget boundary, exactly like pretraining concat-then-
    chunk tokenization. With ``partition_col`` the running offset (and
    bin ids) restart per partition value: the scale path — a global
    ordered window is one task, a per-shard window is embarrassingly
    parallel and matches per-worker batch sharding.
    """
    # textstats.token_count_col is the one tokenization idiom; its
    # lower() is count-neutral (case never changes the whitespace split)
    from pipeline.extras.textstats import token_count_col

    toks = token_count_col(text_col)
    if partition_col is None:
        w = Window.orderBy(F.col(id_col).asc())
        part_cols = []
    else:
        w = Window.partitionBy(partition_col).orderBy(F.col(id_col).asc())
        part_cols = [partition_col]
    offset = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    return (
        docs.select(*part_cols, id_col, toks.cast("long").alias("n_tokens"))
        .withColumn("offset_tokens", offset)
        .withColumn(
            "bin_id", F.floor(F.col("offset_tokens") / F.lit(token_budget))
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    overlap_threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Benchmark-overlap contamination check.

    Both sides are normalized and shingled into hashed char n-grams
    (60-bit longs). The benchmark's DISTINCT gram set is broadcast; each
    corpus document's exact overlap fraction = |grams ∩ bench| /
    |grams|. Returns (doc_id, n_grams, n_overlap, overlap_frac,
    contaminated). Scale: corpus side shuffles nothing (broadcast hash
    join on 8-byte keys after an explode); benchmark distinct-set size
    is the only memory bound (eval sets are ~MBs).
    """
    def grams(df: DataFrame, idc: str) -> DataFrame:
        # docs shorter than n produce NO grams (round-5 review: the old
        # greatest(..., 1) floor gave them one whole-text gram, so every
        # doc normalizing to the same short/empty string scored
        # overlap_frac 1.0 against any benchmark sharing it — whole
        # classes of short docs falsely flagged, all-or-nothing)
        return df.select(
            F.col(idc).alias("_id"),
            F.explode(
                F.array_distinct(
                    F.expr(
                        f"case when length(_n) >= {n} then "
                        f"transform(sequence(1, length(_n)-{n - 1}), "
                        f"i -> substring(_n, i, {n})) "
                        "else cast(array() as array<string>) end"
                    )
                )
            ).alias("_g"),
        ).select("_id", h60_col("_g").alias("_h"))

    d = docs.select(F.col(id_col), norm_text_col(text_col).alias("_n"))
    b = benchmark.select(F.col(id_col), norm_text_col(text_col).alias("_n"))
    doc_grams = grams(d, id_col)
    bench_set = grams(b, id_col).select("_h").distinct()
    joined = doc_grams.join(
        F.broadcast(bench_set.withColumn("_hit", F.lit(1))), "_h", "left"
    )
    agg = joined.groupBy("_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_overlap"),
    )
    # gram-less docs (shorter than n) re-join with n_grams = 0 and are
    # NEVER contaminated — there is no evidence either way
    out = d.select(F.col(id_col).alias("_id")).join(agg, "_id", "left")
    n_grams = F.coalesce(F.col("n_grams"), F.lit(0)).cast("long")
    n_overlap = F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long")
    frac = F.when(n_grams == 0, F.lit(0.0)).otherwise(n_overlap / n_grams)
    return out.select(
        F.col("_id").alias(id_col),
        n_grams.alias("n_grams"),
        n_overlap.alias("n_overlap"),
        frac.alias("overlap_frac"),
        ((n_grams > 0) & (frac >= F.lit(overlap_threshold))).alias(
            "contaminated"
        ),
    )
