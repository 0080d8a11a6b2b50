"""Second scale point for the document/embedding operator families
(round-4 VERDICT task 8, stretch): the SAME operator code at 5k and
50k documents drawn from ONE self-similar seeded generator, with the
two scales' legs timed back-to-back per query so each 10x ratio is
drift-paired, and the fixed q0 calibration workload stamped at both
ends of the run.

The linkage family already has second scale points — the 37.7k-conv
skew corpus under binding caps (BENCH/skew_scale.md) and the
70.8k-conv incremental separation (BENCH/incremental_scale.md) — this
run covers the remaining bench families: minhash-LSH dedup (both hash
impls), substring-span dedup (mod sampler + winnowing), doc stats,
rare-token anchor keys, brute-force knn.

Generator: vocabulary, unigram frequencies and the token-count /
lang / source distributions are MEASURED from the driver's read-only
sf0.1 documents table, then documents are sampled i.i.d. from those
empirical distributions at any n. The last 3% of doc_ids are
duplicates of uniformly-chosen earlier docs (1% exact copies, 2%
near-dups with ~10% token perturbation), so duplicate DENSITY is
scale-invariant: duplicate-group sizes stay O(1) as n grows, LSH
bucket membership and pair volume stay linear, and the 10x wall ratio
reads as the operator's true scaling law rather than a quadratic
corpus artifact. Embeddings keep sf0.1's 0.4 vec/doc ratio: dim 64,
5 Gaussian label clusters.

Interpretation: scale_exponent = log10(t_50k / t_5k). 1.0 = linear,
< 1 = sublinear (fixed per-job cost still amortizing at 50k),
~2 = quadratic (a cap or blocking failure — should never appear).

Usage: python BENCH/suite_scale.py [small_n] [large_n] [cpus]
Writes BENCH/suite_scale.json.
"""

from __future__ import annotations

import collections
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

SF01_DOCS = "/root/testdata/sf0.1/documents.parquet"
EXACT_FRAC, NEAR_FRAC, PERTURB = 0.01, 0.02, 0.10
VEC_PER_DOC, DIM, N_LABELS = 0.4, 64, 5


def _empirical(seed: int = 42):
    """Measured distributions from the driver's sf0.1 documents table."""
    import pyarrow.parquet as pq

    t = pq.read_table(SF01_DOCS, columns=["text", "lang", "source"])
    texts = t.column("text").to_pylist()
    counts: collections.Counter = collections.Counter()
    n_tokens = []
    for x in texts:
        toks = x.split()
        n_tokens.append(len(toks))
        counts.update(toks)
    vocab = sorted(counts)
    freq = np.array([counts[v] for v in vocab], dtype=np.float64)
    freq /= freq.sum()
    langs = collections.Counter(t.column("lang").to_pylist())
    lang_v = sorted(langs)
    lang_p = np.array([langs[v] for v in lang_v], dtype=np.float64)
    lang_p /= lang_p.sum()
    srcs = sorted(set(t.column("source").to_pylist()))
    return vocab, freq, np.array(n_tokens), lang_v, lang_p, srcs


def generate(out_dir: str, n_docs: int, seed: int = 7) -> None:
    """Deterministic self-similar corpus at ``n_docs`` scale."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    vocab, freq, tok_counts, lang_v, lang_p, srcs = _empirical()
    rng = np.random.default_rng(seed)
    vocab_arr = np.array(vocab)

    n_dup = int(n_docs * (EXACT_FRAC + NEAR_FRAC))
    n_base = n_docs - n_dup
    lens = rng.choice(tok_counts, size=n_base)
    texts: list[str] = []
    for i in range(n_base):
        toks = vocab_arr[rng.choice(len(vocab_arr), size=int(lens[i]), p=freq)]
        texts.append(" ".join(toks))
    # duplicate tail: scale-invariant density, O(1) group sizes
    n_exact = int(n_docs * EXACT_FRAC)
    src_ids = rng.integers(0, n_base, size=n_dup)
    for j in range(n_dup):
        base = texts[int(src_ids[j])]
        if j < n_exact:
            texts.append(base)
        else:
            toks = base.split()
            n_flip = max(1, int(len(toks) * PERTURB))
            pos = rng.choice(len(toks), size=min(n_flip, len(toks)), replace=False)
            repl = vocab_arr[rng.choice(len(vocab_arr), size=len(pos), p=freq)]
            for k, p in enumerate(pos):
                toks[int(p)] = str(repl[k])
            texts.append(" ".join(toks))
    # rare-token tail: the i.i.d. unigram draw alone leaves no token in
    # the anchor df-band [2,30] (every vocab token is either everywhere
    # or nowhere), so inject n_docs/100 marker tokens, each into exactly
    # 3 distinct docs — linear count, constant df: density stays
    # scale-invariant and q9 has real output at both scales.
    n_rare = n_docs // 100
    for r in range(n_rare):
        for d in rng.choice(n_docs, size=3, replace=False):
            texts[int(d)] += f" anchortok{r}"
    lang = rng.choice(lang_v, size=n_docs, p=lang_p)
    source = np.array(srcs)[rng.integers(0, len(srcs), size=n_docs)]
    os.makedirs(out_dir, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(np.arange(n_docs, dtype=np.int64)),
                "text": pa.array(texts, type=pa.string()),
                "lang": pa.array(lang.tolist(), type=pa.string()),
                "source": pa.array(source.tolist(), type=pa.string()),
                "n_chars": pa.array(
                    np.array([len(x) for x in texts], dtype=np.int64)
                ),
            }
        ),
        os.path.join(out_dir, "documents.parquet"),
    )
    n_vec = int(n_docs * VEC_PER_DOC)
    centers = rng.normal(size=(N_LABELS, DIM))
    labels = rng.integers(0, N_LABELS, size=n_vec)
    vecs = centers[labels] + 0.3 * rng.normal(size=(n_vec, DIM))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n_vec, dtype=np.int64)),
                "embedding": pa.array(
                    [row.astype(np.float32) for row in vecs],
                    type=pa.list_(pa.float32()),
                ),
                "label": pa.array(labels.astype(np.int32)),
            }
        ),
        os.path.join(out_dir, "embeddings.parquet"),
    )


def main() -> dict:
    small_n = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000
    large_n = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    cpus = int(sys.argv[3]) if len(sys.argv) > 3 else 32

    from pyspark.sql import functions as F

    import __spark_entry__ as em
    from pipeline.session import get_spark, release_caches

    small_dir = f"/tmp/suite_scale_{small_n}"
    large_dir = f"/tmp/suite_scale_{large_n}"
    generate(small_dir, small_n)
    generate(large_dir, large_n)

    spark = get_spark(
        app_name="suite-scale",
        master=f"local[{cpus}]",
        shuffle_partitions=max(cpus, 8),
    )

    def noop_write(df):
        df.write.format("noop").mode("overwrite").save()

    def calibration():
        # bench.py's q0, verbatim — the cross-round drift meter
        noop_write(
            spark.range(0, 400_000_000, 1, cpus * 2)
            .select(F.xxhash64("id").alias("h"))
            .groupBy(F.pmod("h", F.lit(97)).alias("g"))
            .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("x"))
        )

    def q6b(sf_dir):
        from pipeline.extras.dedup import minhash_lsh_pairs

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        return minhash_lsh_pairs(docs, jaccard_threshold=0.3, hash_impl="xxhash64")

    QUERIES = [
        ("q6_minhash_dedup", lambda d: em.q_minhash_dedup(spark, d)),
        ("q6b_minhash_dedup_xxhash64", q6b),
        ("q12_substring_spans", lambda d: em.q_substring_spans(spark, d)),
        ("q12b_substring_spans_winnow", lambda d: em.q_substring_spans_winnow(spark, d)),
        ("q7_doc_stats", lambda d: em.q_doc_stats(spark, d)),
        ("q8_knn_cosine", lambda d: em.q_knn_cosine(spark, d)),
        ("q9_anchor_keys", lambda d: em.q_anchor_keys(spark, d)),
    ]

    out: dict = {
        "small_n": small_n,
        "large_n": large_n,
        "cpus": cpus,
        "generator": {
            "exact_frac": EXACT_FRAC,
            "near_frac": NEAR_FRAC,
            "perturb": PERTURB,
            "vec_per_doc": VEC_PER_DOC,
            "dim": DIM,
            "seed": 7,
        },
        "queries": {},
    }
    calibration()  # warm, untimed
    t0 = time.time()
    calibration()
    out["calibration_s_start"] = round(time.time() - t0, 3)

    factor = large_n / small_n
    for name, fn in QUERIES:
        rec: dict = {}
        for tag, d in (("small", small_dir), ("large", large_dir)):
            walls = []
            rows = None
            for _ in range(2):
                t0 = time.time()
                df = fn(d)
                noop_write(df)
                walls.append(round(time.time() - t0, 3))
                release_caches()
            # rows-out once, outside the timers (sanity: output grows too)
            rows = fn(d).count()
            release_caches()
            rec[tag] = {"walls_s": walls, "best_s": min(walls), "rows_out": rows}
        ratio = rec["large"]["best_s"] / max(rec["small"]["best_s"], 1e-9)
        rec["wall_ratio"] = round(ratio, 3)
        rec["scale_exponent"] = round(
            float(np.log(ratio) / np.log(factor)), 3
        )
        out["queries"][name] = rec
        print(json.dumps({name: rec}), flush=True)

    t0 = time.time()
    calibration()
    out["calibration_s_end"] = round(time.time() - t0, 3)

    path = os.path.join(REPO, "BENCH", "suite_scale.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"calibration": [out["calibration_s_start"], out["calibration_s_end"]]}))
    spark.stop()
    return out


if __name__ == "__main__":
    main()
