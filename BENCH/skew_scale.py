"""Adversarial-skew scale run (round-4 VERDICT task 1): make the caps
earn their keep.

Corpus (``pipeline.synth.generate_skew``): an ordinary Zipf-vocabulary
corpus PLUS one ~20k-member boilerplate near-duplicate mega-group (one
true entity) and ~2k byte-identical degenerate convs — the power-law
head every 100-TB transcript corpus has. Config: PRODUCTION_CONFIG with
its caps AT DEFAULTS (block_key_cap=64, pairs_per_key_cap=50, anchors
on, hot_key_star on, xxhash64) — every cap BINDS.

Deliverables (the VERDICT's 'done' list):
  (a) hot_key_audit / pair_cap_audit / hot-bucket audits NON-EMPTY,
      row counts + the biggest memberships recorded;
  (b) clusters transitively correct UNDER BINDING CAPS — the mega-group
      resolves to ONE entity (the round-5 star-preserving member cap;
      without it the plain coin cap shatters the group, see
      tests/test_hot_key_star.py), the degenerate block stays one
      entity, and ordinary true exact/norm pairs still co-cluster;
  (c) a BENCH line with scoring pairs/s while the caps bind, next to
      the uncapped steady-state number from the driver bench.

Also times the minhash/simhash dedup family with production bucket caps
binding on the same corpus (``hot_bucket_star=True``), validating the
20k-member bucket stays ONE connected component of verified pairs.

Writes BENCH/skew_scale.json; BENCH/skew_scale.md is the hand-written
narrative — after re-running, sync its tables to the fresh json by hand
(the md explains cap semantics and correctness checks, not just walls).
Usage: python BENCH/skew_scale.py [n_base] [boiler_members] [cpus]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def timed(fn):
    t0 = time.time()
    out = fn()
    return round(time.time() - t0, 3), out


def main() -> dict:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 6000
    boiler = int(sys.argv[2]) if len(sys.argv) > 2 else 20_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import functions as F

    from pipeline import synth
    from pipeline.blocking import candidate_pairs
    from pipeline.canonicalize import canonicalize
    from pipeline.cluster import connected_components
    from pipeline.config import PRODUCTION_CONFIG
    from pipeline.features import featurize
    from pipeline.scoring import score_pairs
    from pipeline.session import get_spark, release_caches

    cfg = PRODUCTION_CONFIG  # caps AT DEFAULTS — they must bind
    spark = get_spark(
        app_name="skew-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    print(
        f"[skew] generating corpus n_base={n_base} boiler={boiler}...",
        file=sys.stderr,
    )
    corpus = synth.generate_skew(
        n_base=n_base, boiler_members=boiler, hotkey_convs=2000, seed=17
    )
    turns = spark.createDataFrame(corpus.turns).localCheckpoint(eager=True)
    n_convs = turns.select("conv_id").distinct().count()
    print(f"[skew] {n_convs} convs", file=sys.stderr)

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # fixed calibration workload (bench.py q0, same constants): stamps the
    # VM's speed into this run so cross-run diffs can see host drift —
    # the sandbox VM has shown >5x day-to-day swings after reboots.
    def _calibration() -> float:
        def run():
            noop(
                spark.range(0, 400_000_000, 1, cpus * 2)
                .select(F.xxhash64("id").alias("h"))
                .groupBy(F.pmod("h", F.lit(97)).alias("g"))
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.expr("bit_xor(h)").alias("x"),
                )
            )
        run()  # warm
        return min(timed(run)[0], timed(run)[0])

    calibration_start = _calibration()
    print(f"[skew] calibration {calibration_start}s", file=sys.stderr)

    # -- featurize + blocking under binding caps ---------------------------
    feats = featurize(canonicalize(turns), cfg)
    t_feat, _ = timed(lambda: noop(feats))
    feats = feats.localCheckpoint(eager=True)

    pairs, hot_audit, pair_audit = candidate_pairs(
        feats, cfg, return_pair_audit=True
    )
    t_block, _ = timed(lambda: noop(pairs))
    pairs = pairs.localCheckpoint(eager=True)
    n_pairs = pairs.count()

    hot_pd = hot_audit.orderBy(F.desc("members")).limit(10).toPandas()
    n_hot = hot_audit.count()
    n_pair_audit = pair_audit.count()
    assert n_hot > 0, "hot_key_audit EMPTY — caps did not bind"
    assert n_pair_audit > 0, "pair_cap_audit EMPTY — pair cap did not bind"
    print(
        f"[skew] pairs={n_pairs} hot_keys={n_hot} "
        f"top_members={hot_pd['members'].max()}",
        file=sys.stderr,
    )

    # -- scoring throughput while capped (steady: pairs pre-materialized;
    # best-of-2 so a single VM-drift hiccup can't own the number) --------
    scored = score_pairs(feats, pairs, cfg)
    t_score = min(
        timed(lambda: noop(scored))[0], timed(lambda: noop(scored))[0]
    )
    pairs_per_s = round(n_pairs / t_score, 1)

    # -- clustering + label validation under binding caps ------------------
    edges = (
        score_pairs(feats, pairs, cfg, match_only=True)
        .select(F.col("conv_id_a").alias("src"), F.col("conv_id_b").alias("dst"))
    )
    t_cc, (clusters, cc_metrics) = timed(
        lambda: (lambda c, m: (c.localCheckpoint(eager=True), m))(
            *connected_components(edges, all_nodes=feats.select("conv_id"))
        )
    )

    def n_entities(prefix: str) -> int:
        return (
            clusters.where(F.col("conv_id").startswith(prefix))
            .select("entity_id")
            .distinct()
            .count()
        )

    boiler_entities = n_entities("boil")
    hot_entities = n_entities("hot")
    boiler_size = (
        clusters.alias("c")
        .join(
            clusters.where(F.col("conv_id") == "boil000000").select(
                "entity_id"
            ),
            "entity_id",
            "semi",
        )
        .count()
    )
    assert boiler_entities == 1, (
        f"mega-group SHATTERED under caps: {boiler_entities} entities"
    )
    assert hot_entities == 1, f"degenerate block: {hot_entities} entities"
    assert boiler_size == boiler, (boiler_size, boiler)

    # ordinary-corpus recall under binding caps: true exact/norm_eq pairs
    # must still co-cluster
    tp = corpus.true_pairs
    strong = tp[tp["dup_class"].isin(["exact", "norm_eq"]) & tp["is_match"]]
    lab = dict(
        zip(
            *(
                lambda p: (p["conv_id"], p["entity_id"])
            )(clusters.toPandas())
        )
    )
    co = [
        lab.get(a) == lab.get(b)
        for a, b in zip(strong["conv_id_a"], strong["conv_id_b"])
    ]
    strong_recall = round(sum(co) / max(len(co), 1), 4)
    assert strong_recall >= 0.97, strong_recall
    release_caches()

    # -- round-5 exact-dup contraction pre-pass on the SAME corpus ----------
    # The star cap's honest caveat was hub fan-in: one (hub, member) edge
    # per dropped member still reaches scoring. Contraction collapses the
    # signature classes (boiler-exact copies, the degenerate block) to one
    # rep BEFORE blocking, so those members never generate keys at all —
    # measure the pair-stage shrink and validate the labels against the
    # star-capped run's.
    from pipeline.linkage import contract_exact_dups

    t_contract, (rep_feats, dup_map, weighted_df) = timed(
        lambda: (
            lambda r, d, w: (
                r.localCheckpoint(eager=True),
                d.localCheckpoint(eager=True),
                w.localCheckpoint(eager=True),
            )
        )(*contract_exact_dups(feats, cfg))
    )
    n_reps, n_dup_members = rep_feats.count(), dup_map.count()

    c_pairs, _c_hot = candidate_pairs(rep_feats, cfg, anchor_df=weighted_df)
    t_c_block, _ = timed(lambda: noop(c_pairs))
    c_pairs = c_pairs.localCheckpoint(eager=True)
    n_c_pairs = c_pairs.count()

    # scoring wall star-vs-contracted: INTERLEAVED rounds (the VM shows
    # >3x drift within a single run — see the calibration stamps — so
    # only per-round pairing isolates the operator difference)
    c_scored = score_pairs(rep_feats, c_pairs, cfg)
    noop(c_scored)  # warm (star side is already warm from its own leg)
    ab_rounds = []
    for _ in range(2):
        ab_rounds.append(
            {
                "star_s": timed(lambda: noop(scored))[0],
                "contracted_s": timed(lambda: noop(c_scored))[0],
            }
        )
    t_c_score = min(r["contracted_s"] for r in ab_rounds)
    t_star_rescore = min(r["star_s"] for r in ab_rounds)

    c_edges = (
        score_pairs(rep_feats, c_pairs, cfg, match_only=True)
        .select(F.col("conv_id_a").alias("src"), F.col("conv_id_b").alias("dst"))
        .unionByName(
            dup_map.select(
                F.col("rep_id").alias("src"), F.col("conv_id").alias("dst")
            )
        )
    )
    t_c_cc, c_clusters = timed(
        lambda: connected_components(
            c_edges, all_nodes=feats.select("conv_id")
        )[0].localCheckpoint(eager=True)
    )
    c_boiler_entities = (
        c_clusters.where(F.col("conv_id").startswith("boil"))
        .select("entity_id").distinct().count()
    )
    assert c_boiler_entities == 1, c_boiler_entities
    label_mismatches = (
        clusters.join(
            c_clusters.withColumnRenamed("entity_id", "c_entity_id"),
            "conv_id",
        )
        .where(F.col("entity_id") != F.col("c_entity_id"))
        .count()
    )
    # direction of any divergence: recall over ALL true match pairs, both
    # paths. Under binding caps the two pair sets differ in the tail —
    # contraction shrinks hot-key memberships, so the coin cap drops
    # FEWER true pairs there; contracted recall must never be worse.
    c_lab = dict(
        zip(
            *(lambda p: (p["conv_id"], p["entity_id"]))(
                c_clusters.toPandas()
            )
        )
    )
    tpm = tp[tp["is_match"]]
    def _recall(m, sub=None):
        d = tpm if sub is None else tpm[tpm["dup_class"] == sub]
        co = [
            m.get(a) == m.get(b)
            for a, b in zip(d["conv_id_a"], d["conv_id_b"])
        ]
        return round(sum(co) / max(len(co), 1), 5)
    recall_star, recall_contracted = _recall(lab), _recall(c_lab)
    # per-class: separates threshold behavior (the 'heavy' class is
    # DESIGNED to sit at similarity ~45-60, borderline by construction)
    # from any cap-induced loss on the strong classes
    recall_by_class = {
        cls: {"star": _recall(lab, cls), "contracted": _recall(c_lab, cls)}
        for cls in sorted(tpm["dup_class"].unique())
    }
    assert recall_contracted >= recall_star, (
        recall_contracted, recall_star,
    )
    print(
        f"[skew] contraction: reps={n_reps} collapsed={n_dup_members} "
        f"pairs={n_c_pairs} (star path: {n_pairs}) "
        f"label_mismatches_vs_star={label_mismatches} "
        f"recall star={recall_star} contracted={recall_contracted}",
        file=sys.stderr,
    )
    release_caches()

    # -- dedup family with production bucket caps binding -------------------
    from pipeline.extras.dedup import minhash_lsh_pairs, simhash_dedup_pairs

    docs = canonicalize(turns).select(
        F.col("conv_id").alias("doc_id"),
        F.col("canonical_text").alias("text"),
    ).localCheckpoint(eager=True)

    mh_pairs, mh_audit = minhash_lsh_pairs(
        docs, jaccard_threshold=0.5, hash_impl=cfg.hash_impl,
        return_audit=True, hot_bucket_star=True,
    )
    t_minhash, _ = timed(lambda: noop(mh_pairs))
    mh_pairs = mh_pairs.localCheckpoint(eager=True)
    mh_audit_n = mh_audit.count()
    assert mh_audit_n > 0, "minhash hot-bucket audit empty"
    mh_edges = mh_pairs.select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    )
    mh_cc, _ = connected_components(
        mh_edges, all_nodes=docs.select(F.col("doc_id").alias("conv_id"))
    )
    mh_pd = (
        mh_cc.where(F.col("conv_id").startswith("boil")).toPandas()
    )
    meta = corpus.conv_meta
    near_ids = set(
        meta[meta["dup_class"].isin(["boiler_exact", "boiler_norm"])][
            "conv_id"
        ]
    )
    # the exact/normalization variants are TRUE 5-gram-Jaccard near-dups
    # and must stay ONE component under binding bucket caps; the
    # token-REORDERED variants are genuinely below the 0.5 char-shingle
    # Jaccard threshold (linkage catches them via the reorder-invariant
    # token_sort channel) — count them separately, they are not a cap
    # failure
    mh_near_groups = mh_pd[mh_pd["conv_id"].isin(near_ids)][
        "entity_id"
    ].nunique()
    mh_boiler_groups = mh_pd["entity_id"].nunique()
    assert mh_near_groups == 1, (
        f"near-dup mega-bucket SHATTERED under caps: {mh_near_groups}"
    )
    release_caches()

    sh_pairs, sh_audit = simhash_dedup_pairs(
        docs, max_hamming=3, hash_impl=cfg.hash_impl,
        return_audit=True, hot_bucket_star=True,
    )
    t_simhash, _ = timed(lambda: noop(sh_pairs))
    sh_pairs = sh_pairs.localCheckpoint(eager=True)
    sh_audit_n = sh_audit.count()
    assert sh_audit_n > 0, "simhash hot-bucket audit empty"
    # simhash sketches the TOKEN multiset — reorder-invariant, so here
    # the whole 20k group (swaps included) must stay one component
    sh_cc, _ = connected_components(
        sh_pairs.select(
            F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
        ),
        all_nodes=docs.select(F.col("doc_id").alias("conv_id")),
    )
    sh_boiler_groups = (
        sh_cc.where(F.col("conv_id").startswith("boil"))
        .select("entity_id")
        .distinct()
        .count()
    )
    assert sh_boiler_groups == 1, sh_boiler_groups
    release_caches()

    # -- embedding family with production bucket caps binding (round-5:
    # the hub-star rule on the embedding leg). Embeddings are synthesized
    # deterministically from the corpus labels: every boilerplate member
    # shares ONE unit vector — byte-identical embeddings land in the same
    # bucket in EVERY LSH table, the worst case for a member cap — and
    # every other conv gets a seeded random unit vector (sorted-id order
    # fixes the stream). 32 dims x ~37.7k ids, built in pandas.
    import numpy as np

    from pipeline.extras.similarity import embedding_near_dup_pairs

    meta_ids = sorted(corpus.conv_meta["conv_id"])
    dim = 32
    rng = np.random.RandomState(7)
    M = rng.normal(size=(len(meta_ids), dim))
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    is_boiler = np.array([i.startswith("boil") for i in meta_ids])
    hub_vec = np.zeros(dim)
    hub_vec[0] = 1.0
    M[is_boiler] = hub_vec
    import pandas as pd

    vec_df = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": meta_ids, "embedding": [r.tolist() for r in M]}
        )
    ).localCheckpoint(eager=True)

    emb_pairs, emb_audit = embedding_near_dup_pairs(
        vec_df, n_dims=dim, cosine_threshold=0.95, bucket_cap=256,
        pairs_per_bucket_cap=50, id_col="vec_id",
        hash_impl=cfg.hash_impl, return_audit=True, hot_bucket_star=True,
    )
    t_embed, _ = timed(lambda: noop(emb_pairs))
    emb_pairs = emb_pairs.localCheckpoint(eager=True)
    emb_audit_n = emb_audit.count()
    assert emb_audit_n > 0, "embedding hot-bucket audit empty"
    emb_cc, _ = connected_components(
        emb_pairs.select(
            F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
        ),
        all_nodes=vec_df.select(F.col("vec_id").alias("conv_id")),
    )
    emb_boiler_groups = (
        emb_cc.where(F.col("conv_id").startswith("boil"))
        .select("entity_id")
        .distinct()
        .count()
    )
    assert emb_boiler_groups == 1, (
        f"identical-embedding mega-bucket SHATTERED under caps: "
        f"{emb_boiler_groups}"
    )
    release_caches()

    # -- exact dedup at skew: the 20k boiler-exact subgroup and the 2k
    # degenerate block are giant identical-text groups — the hash-groupBy
    # path must keep them single groups with min-id canonicals
    from pipeline.extras.dedup import exact_dedup

    t_exact, _ = timed(lambda: noop(exact_dedup(docs)))
    exact_groups = exact_dedup(docs)
    hot_canon = (
        exact_groups.where(F.col("doc_id").startswith("hot"))
        .select("canonical_id")
        .distinct()
        .count()
    )
    assert hot_canon == 1, f"degenerate exact-dup block: {hot_canon} canonicals"
    max_exact_group = (
        exact_groups.agg(F.max("group_size")).collect()[0][0]
    )
    release_caches()

    # -- ANN top-k over the same skewed embeddings: the 20k-identical
    # bucket is the adversarial case for bucketed ANN — the member cap
    # bounds the bucket self-join while identical-vector neighbors still
    # fill every query's top-k at cosine 1.0
    from pipeline.extras.similarity import lsh_topk

    queries_df = vec_df.limit(64).select("vec_id", "embedding")
    t_ann, _ = timed(
        lambda: noop(
            lsh_topk(
                vec_df, queries_df, k=10, n_dims=dim,
                id_col="vec_id", hash_impl=cfg.hash_impl,
            )
        )
    )
    release_caches()

    # -- second scale point for the remaining families (round-4 VERDICT
    # task 8 stretch): substring-span dedup + text stats over the same
    # 37.7k-doc skew corpus (~7x the sf0.1 documents table). The winnow
    # sampler sees the 20k-member boilerplate head (identical canonical
    # texts = maximal shared-substring density).
    from pipeline.extras.dedup import repeated_substring_spans
    from pipeline.extras.textstats import document_stats

    t_winnow, _ = timed(
        lambda: noop(
            repeated_substring_spans(
                docs, sampler="winnow", hash_impl=cfg.hash_impl
            )
        )
    )
    release_caches()
    t_stats, _ = timed(lambda: noop(document_stats(docs)))
    release_caches()

    # uncapped steady-state reference from the committed driver bench
    uncapped = {}
    try:
        with open(os.path.join(REPO, "BENCH_r04.json")) as f:
            parsed = json.load(f)["parsed"]
        uncapped = {
            "saturated_pairs_per_sec": parsed.get("saturated_pairs_per_sec"),
            "saturated_pairs": parsed.get("saturated_pairs"),
            "e2e_pairs_per_sec": parsed.get("pairs_per_sec"),
        }
    except Exception:
        pass

    calibration_end = _calibration()
    out = {
        "calibration_s_start": calibration_start,
        "calibration_s_end": calibration_end,
        "calibration_reference": (
            "committed driver bench q0 on a healthy VM: ~1.08s; "
            "scale every wall in this file by the calibration ratio "
            "before cross-run comparison"
        ),
        "n_convs": n_convs,
        "n_base": n_base,
        "boiler_members": boiler,
        "hotkey_convs": 2000,
        "config": "PRODUCTION_CONFIG (caps at defaults, hot_key_star on)",
        "t_featurize_s": t_feat,
        "t_blocking_s": t_block,
        "pairs_after_caps": n_pairs,
        "t_scoring_s": t_score,
        "pairs_per_s_capped": pairs_per_s,
        "t_cc_s": t_cc,
        "cc_mode": (cc_metrics or [{}])[-1].get("mode"),
        "hot_key_audit_rows": n_hot,
        "hot_key_top_members": int(hot_pd["members"].max()),
        "pair_cap_audit_rows": n_pair_audit,
        "boiler_entities": boiler_entities,
        "boiler_entity_size": boiler_size,
        "degenerate_entities": hot_entities,
        "strong_pair_recall_under_caps": strong_recall,
        "contraction": {
            "t_contract_s": t_contract,
            "t_blocking_s": t_c_block,
            "t_scoring_s": t_c_score,
            "t_star_rescore_s": t_star_rescore,
            "scoring_ab_rounds": ab_rounds,
            "t_cc_s": t_c_cc,
            "reps": n_reps,
            "collapsed_members": n_dup_members,
            "pairs_after_contraction": n_c_pairs,
            "pairs_star_path": n_pairs,
            "boiler_entities": c_boiler_entities,
            "label_mismatches_vs_star": label_mismatches,
            "true_match_recall_star": recall_star,
            "true_match_recall_contracted": recall_contracted,
            "true_match_recall_by_class": recall_by_class,
            "note": (
                "exact-dup contraction collapses signature classes to one "
                "rep BEFORE blocking — the mega-group's hub fan-in edges "
                "(one per dropped member) are replaced by zero pairs; "
                "labels expand through (rep, member) edges"
            ),
        },
        "minhash": {
            "t_s": t_minhash,
            "hot_bucket_audit_rows": mh_audit_n,
            "near_dup_components": mh_near_groups,
            "boiler_components_incl_reordered": mh_boiler_groups,
            "note": (
                "token-reordered variants are below the 0.5 char-shingle "
                "Jaccard threshold by design — not a cap failure"
            ),
        },
        "simhash": {
            "t_s": t_simhash,
            "hot_bucket_audit_rows": sh_audit_n,
            "boiler_components": sh_boiler_groups,
        },
        "embedding": {
            "t_s": t_embed,
            "hot_bucket_audit_rows": emb_audit_n,
            "boiler_components": emb_boiler_groups,
            "note": (
                "20k byte-identical boiler embeddings vs bucket_cap=256 "
                "in all 4 tables; hub-star keeps ONE component"
            ),
        },
        "exact_dedup": {
            "t_s": t_exact,
            "max_group_size": int(max_exact_group),
            "degenerate_canonicals": hot_canon,
        },
        "ann_lsh_topk": {
            "t_s": t_ann,
            "n_queries": 64,
            "k": 10,
            "note": (
                "corpus-side bucket cap (4096) bounds the 20k-identical "
                "bucket's self-join contribution"
            ),
        },
        "substring_winnow_t_s": t_winnow,
        "doc_stats_t_s": t_stats,
        "uncapped_reference": {
            **uncapped,
            "note": (
                "driver bench BENCH_r04.json (sf0.1, no caps binding). "
                "Caps change the PAIR SET (80k pairs instead of ~200M "
                "for the mega-group), not per-pair scoring cost; at 80k "
                "pairs the fixed Arrow-stage spin-up dominates the "
                f"{t_score:.1f}s scoring wall"
            ),
        },
    }
    print(json.dumps(out))
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "skew_scale.json"), "w") as f:
        json.dump(out, f, indent=1)
    return out


if __name__ == "__main__":
    main()
