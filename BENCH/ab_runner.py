"""One saturated-ring scoring run against ONE code tree (A/B leg).

Invoked by BENCH/ab_kernels.py in a fresh subprocess per leg with
``PYTHONPATH=<tree>`` and ``cwd=<tree>`` so BOTH the driver import and the
Spark Python workers resolve ``pipeline`` from that tree — either the
round-2 code state (per-pair kernels, commit 8e5af82, checked out as a
git worktree) or HEAD (numpy batch kernels). The ring construction lives
HERE, not in the tree, so both legs score the IDENTICAL mixed-roles input
under the current bench methodology (round-3 realism fix included) — the
r2 bench.py predates mixed roles and would flatter the per-pair kernels
with the constant-roles struct-channel early exit.

Methodology per leg (same as bench.py q10): worker warmup, one untimed
warmup pass over the ring (per-worker kernel-cache build), then two timed
passes, steady = best-of-2. Prints ONE JSON line.

Env: AB_CPUS (parallelism), AB_PAIRS (ring size), SPARK_GRAFT_SF_DIR.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    cpus = int(os.environ.get("AB_CPUS", "32"))
    target_pairs = int(os.environ.get("AB_PAIRS", "600000"))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import pipeline
    from pyspark.sql import functions as F

    from pipeline.normalize import norm_text_col
    from pipeline.scoring import score_pairs
    from pipeline.session import get_spark

    spark = get_spark(
        app_name=f"ab-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    # worker warmup (same treatment both legs)
    import pandas as pd  # noqa: F401

    def _warm_fn(s):
        from pipeline.oracle import component_scores  # noqa: F401

        return s

    _warm = F.pandas_udf(_warm_fn, returnType="long")
    spark.range(cpus * 6).repartition(cpus * 3).select(
        _warm("id")
    ).write.format("noop").mode("overwrite").save()

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    ring_k = max(1, target_pairs // max(n_docs, 1))
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
    scored = score_pairs(dfeats, ring)

    def one_pass() -> float:
        t0 = time.time()
        scored.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    cold = one_pass()  # warmup pass: kernel caches build here
    steady = min(one_pass(), one_pass())
    pairs = n_docs * ring_k
    print(
        json.dumps(
            {
                "tree": os.path.dirname(os.path.dirname(pipeline.__file__)),
                "pipeline_file": pipeline.__file__,
                "cpus": cpus,
                "pairs": pairs,
                "cold_s": round(cold, 3),
                "steady_s": round(steady, 3),
                "pairs_per_sec": round(pairs / max(steady, 1e-9), 1),
                "pairs_per_sec_cold": round(pairs / max(cold, 1e-9), 1),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
