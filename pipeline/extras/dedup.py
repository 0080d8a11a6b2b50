"""Deduplication operators over a ``documents(doc_id, text, ...)`` table.

Five families, each usable standalone and each exposed through the driver
contract (``__spark_entry__.queries``):

  * exact           — hash-groupBy on the normalized text (keep min doc_id)
  * minhash_lsh     — shingle -> MinHash -> banding -> bucket self-join
  * simhash         — 64-bit SimHash over token hashes; bucket by rotated
                      prefixes for Hamming-distance candidate generation
  * ngram_jaccard   — n-gram Jaccard on LSH candidates (verification step)
  * embedding near-dup — cosine >= threshold over LSH/bucketed vectors
                      (see pipeline.extras.similarity)

All candidate generation is equi-join on deterministic keys (shuffle-
friendly, AQE-skew-safe); verification is column arithmetic or an
Arrow-batched kernel. No driver-side loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from pipeline.normalize import norm_text_col


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized text: one survivor (min id) per group.

    Returns (doc_id, canonical_id, group_size); rows with canonical_id !=
    doc_id are duplicates. Single hash-aggregate — the minimal plan.
    """
    normed = docs.select(
        F.col(id_col).alias("doc_id"), norm_text_col(text_col).alias("_norm")
    )
    grouped = normed.groupBy("_norm").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        normed.join(grouped, "_norm")
        .select("doc_id", "canonical_id", "group_size")
    )


def _shingle_minhash(normed: DataFrame, n: int, hashes: int) -> DataFrame:
    """(doc_id, _mh0.._mhH-1) via explode -> hash-once -> min-aggregate.

    The inline form (one array_min(transform(shingles,...)) column per
    hash) re-evaluates the shingle array once PER HASH — Catalyst
    collapses the projections and higher-order functions don't get
    common-subexpression elimination. Exploding hashes each shingle
    exactly once and the map-side partial min keeps the shuffle at
    H longs per doc. The shuffle also restores parallelism when the
    input is a single parquet file (1-partition scan)."""
    shingles = normed.select(
        "doc_id",
        F.explode(
            F.expr(
                f"array_distinct(transform("
                f"sequence(1, greatest(length(_norm)-{n-1},1)),"
                f" i -> substring(_norm, i, {n})))"
            )
        ).alias("_g"),
    )
    return shingles.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64("_g", F.lit(i))).alias(f"_mh{i}")
            for i in range(hashes)
        ]
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    hashes: int = 12,
    bands: int = 4,
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + n-gram Jaccard verify.

    Returns (doc_id_a, doc_id_b, jaccard) for verified pairs. The banding
    join proposes, the Jaccard (computed on exact shingle sets via an
    array intersection in the JVM) disposes.
    """
    normed = docs.select(
        F.col(id_col).alias("doc_id"), norm_text_col(text_col).alias("_norm")
    )
    # a small corpus often arrives as ONE parquet file -> 1-partition scan
    # -> serial shingle generation; spread it (cheap: ids+text only)
    normed = normed.repartition(
        normed.sparkSession.sparkContext.defaultParallelism * 2
    ).persist()
    mh = _shingle_minhash(normed, n, hashes)
    rows = hashes // bands
    band_keys = [
        F.xxhash64(*[F.col(f"_mh{b * rows + r}") for r in range(rows)], F.lit(b))
        for b in range(bands)
    ]
    # band join proposes on (doc_id, band_key) only — shingle arrays are
    # NOT dragged through the shuffle; the verify step joins them back
    # from a persisted per-doc table (each doc's shingles computed once)
    keyed = mh.select(
        "doc_id", F.explode(F.array(*band_keys)).alias("band_key")
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    # verify on HASHED shingle sets: same Jaccard (64-bit collisions are
    # ~|S|^2/2^64 per pair — negligible), but long arrays shuffle ~2x
    # smaller and intersect far faster than string arrays
    sh = F.expr(
        f"array_distinct(transform(transform("
        f"sequence(1, greatest(length(_norm)-{n-1},1)),"
        f" i -> substring(_norm, i, {n})), g -> xxhash64(g)))"
    )
    grams = normed.select("doc_id", sh.alias("grams")).persist()
    ga = grams.select(F.col("doc_id").alias("doc_id_a"), F.col("grams").alias("_sa"))
    gb = grams.select(F.col("doc_id").alias("doc_id_b"), F.col("grams").alias("_sb"))
    verified = (
        cand.join(ga, "doc_id_a")
        .join(gb, "doc_id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sa", "_sb"))
            / F.size(F.array_union("_sa", "_sb")),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("doc_id_a", "doc_id_b", "jaccard")
    )
    return verified


def simhash_col(tokens_col, bits: int = 64):
    """64-bit SimHash of a token array, pure JVM.

    Classic Charikar sketch: for each bit position, sum +1/-1 votes from
    each token's hash bit; bit set iff the sum is positive. Expressed as
    an aggregate over the token array per bit — compiled into one
    whole-stage-codegen pass (no Python).
    """
    acc = F.lit(0).cast("long")
    for bit in range(bits):
        vote = F.aggregate(
            tokens_col,
            F.lit(0),
            lambda s, t: s
            + F.when(
                F.shiftright(F.xxhash64(t), bit).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
        acc = acc.bitwiseOR(
            F.when(vote > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            * F.lit(2 ** bit).cast("long")
            if bit < 63
            else F.when(vote > 0, F.lit(-(2 ** 63))).otherwise(F.lit(0)).cast("long")
        )
    return acc


def simhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    n_tables: int = 4,
) -> DataFrame:
    """SimHash near-dup candidates: docs whose 64-bit SimHash agree on a
    16-bit block (4 tables); verify Hamming distance <= max_hamming.

    By pigeonhole, any pair within Hamming distance 3 agrees on at least
    one of the 4 16-bit blocks — the standard multi-table SimHash index.
    """
    normed = docs.select(
        F.col(id_col).alias("doc_id"), norm_text_col(text_col).alias("_norm")
    )
    toks = normed.withColumn(
        "_tokens", F.array_remove(F.split("_norm", " "), "")
    )
    sh = toks.withColumn("simhash", simhash_col(F.col("_tokens"))).select(
        "doc_id", "simhash"
    )
    block_keys = [
        F.shiftrightunsigned(F.col("simhash"), 16 * t).bitwiseAND(F.lit(0xFFFF))
        for t in range(n_tables)
    ]
    keyed = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(F.array(*block_keys)).alias("table", "block"),
    )
    a, b = keyed.alias("a"), keyed.alias("b")
    cand = (
        a.join(b, ["table", "block"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("_ha"),
            F.col("b.simhash").alias("_hb"),
        )
        .dropDuplicates(["doc_id_a", "doc_id_b"])
    )
    return (
        cand.withColumn(
            "hamming", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_id_a", "doc_id_b", "hamming")
    )
