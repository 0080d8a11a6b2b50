"""Deduplication operators over a ``documents(doc_id, text, ...)`` table.

Five families, each usable standalone and each exposed through the driver
contract (``__spark_entry__.queries``):

  * exact           — hash-groupBy on the normalized text (keep min doc_id)
  * minhash_lsh     — shingle -> MinHash -> banding -> bucket self-join
  * simhash         — 60-bit SimHash over token hashes; candidates from
                      (max_hamming + 1) bit-block tables (pigeonhole)
  * ngram_jaccard   — n-gram Jaccard on LSH candidates (verification step)
  * embedding near-dup — cosine >= threshold over LSH-bucketed vectors
                      (see pipeline.extras.similarity)

All candidate generation is equi-join on deterministic keys; every bucket
self-join goes through ``blocking.cap_hot_buckets`` (a degenerate
boilerplate bucket is down-sampled deterministically and AUDITED, never
silently quadratic). Verification is column arithmetic — no Python on the
pair path, no driver-side loops.

Hashing is the engine-neutral 60-bit md5 hash (``pipeline.hashing``) by
default, so every step here has a DuckDB oracle twin in
``__spark_entry__.oracle_sql``; pass ``hash_impl="xxhash64"`` for the
faster non-verifiable keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pipeline.blocking import cap_hot_buckets
from pipeline.hashing import h60_col
from pipeline.normalize import norm_text_col
from pipeline.session import track_cache

SIMHASH_BITS = 60  # the neutral hash is 60-bit; 4 tables x 15-bit blocks


def _H(hash_impl: str):
    return F.xxhash64 if hash_impl == "xxhash64" else h60_col


def repeated_substring_spans(
    docs: DataFrame,
    k: int = 40,
    sample_mod: int = 4,
    min_docs: int = 2,
    merge_gap: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_impl: str = "md5",
    sampler: str = "mod",
    winnow_window: int = 8,
) -> DataFrame:
    """Substring-LEVEL duplicated-span detection — the exact-substring
    dedup of training-data curation (Lee et al. 2022 do it with suffix
    arrays; a distributed suffix array is the wrong tool on Spark), as
    content-defined fingerprint sampling, entirely JVM-side:

      1. every k-char gram of every doc is hashed (posexplode of a
         sequence + substring — whole-stage codegen; the unsampled grams
         die in the same stage, nothing shuffles at stride 1);
      2. a gram is a FINGERPRINT iff ``hash % sample_mod == 0``
         (``sampler="mod"``, default — map-side filter, zero shuffle) or
         iff it wins a ``winnow_window`` sliding-minimum
         (``sampler="winnow"`` — winnowing, GUARANTEED detection of any
         shared substring of length >= k + 2*(winnow_window-1); one
         doc-partitioned window pass, Exchange on narrow doc rows only).
         Either way selection depends only on content (the mod coin on
         the gram alone; the winnow choice on the gram and its w-1
         neighbors each side), so two docs sharing a substring select
         the same interior fingerprints regardless of alignment (the
         content-defined-chunking trick);
      3. fingerprints repeated across >= ``min_docs`` distinct docs are
         hits; per doc, hits within ``merge_gap`` (default 2k) chars of
         each other merge into one span.

    Returns (doc_id, span_start, span_end, span_len, n_fingerprints):
    character ranges [span_start, span_end) likely duplicated verbatim
    elsewhere in the corpus — the actionable artifact (cut the spans, or
    drop docs whose spans cover most of their length).

    Detection under ``sampler="mod"`` is probabilistic with a
    quantifiable miss rate: a shared substring of length L >= k contains
    L - k + 1 fingerprint candidates, each sampled with prob
    1/sample_mod, so P(miss) = (1 - 1/sample_mod) ** (L - k + 1) — for
    L = 200, k = 40, mod = 4 that is ~9e-21; short repeats near k chars
    are the blind spot. ``sampler="winnow"`` CLOSES that blind spot:
    every window of ``winnow_window`` consecutive positions contains a
    selected one and interior selections are alignment-invariant, so any
    shared substring of length L >= k + 2*(winnow_window - 1) is
    detected with certainty (k=40, w=8: guaranteed at L >= 54), at the
    cost of one per-doc sliding-window pass instead of a stateless
    filter.
    Span bounds are approximate in BOTH directions: boundaries are
    fingerprint positions, so a span understates the true repeat by
    < k + sample_mod chars per side in expectation, AND two distinct
    repeats whose fingerprints sit within ``merge_gap`` of each other
    merge into one span that can include up to ``merge_gap`` chars of
    unique text between them (``cut_spans`` would delete it — size
    merge_gap to taste before cutting aggressively).

    Scale: the only shuffles are (a) sampled fingerprints (~len/mod rows
    per doc, narrow), (b) the per-hash distinct-doc count (map-side
    partial agg), (c) a per-doc window over that doc's HITS. Hot
    boilerplate hashes produce big hit groups but never a pair join —
    this operator is linear in hits, there is no candidate-pair stage.
    """
    if merge_gap is None:
        merge_gap = 2 * k
    # cut_spans' non-overlap guarantee needs merge_gap >= k: two hits
    # closer than k chars produce spans [p1, p1+k) and [p2, p2+k) that
    # OVERLAP unless they merge, and they only merge when gap <= merge_gap
    # (round-3 ADVICE). Clamp rather than raise — a smaller gap has no
    # legitimate semantics, the spans always extend k past the last hit.
    merge_gap = max(merge_gap, k)
    H = _H(hash_impl)
    doc_rows = docs.where(F.length(text_col) >= k).select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("_t"),
    )
    if sampler == "winnow":
        # pre-partition the NARROW doc rows by doc_id so the per-doc
        # sliding-window selection below finds its required clustering
        # already satisfied — the Exchange moves documents, never the
        # stride-1 gram table (len(text) rows/doc)
        doc_rows = doc_rows.repartition("doc_id")
    grams = (
        doc_rows.select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.length("_t") - F.lit(k))
            ).alias("pos"),
            F.col("_t"),
        )
        .select(
            "doc_id",
            "pos",
            H(
                F.lit("ss"), F.expr(f"substring(_t, pos + 1, {k})")
            ).alias("h"),
        )
    )
    if sampler == "mod":
        selected = grams.where(F.pmod(F.col("h"), F.lit(sample_mod)) == 0)
    elif sampler == "winnow":
        # WINNOWING (Schleimer/Wilkerson/Aiken, SIGMOD'03): a position is
        # selected iff its hash is the minimum of at least one window of
        # ``winnow_window`` consecutive gram hashes. Computed in two
        # sliding passes — wm(p) = min over [p, p+w-1]; p selected iff
        # max of wm over the windows COVERING p equals h(p) (wm(q) <=
        # h(p) for every covering q, so equality can only hold at the
        # max). Selection depends only on the w-1 neighbors each side,
        # so two docs sharing a substring select IDENTICAL interior
        # positions, and every w consecutive positions contain >= 1
        # selected one — a shared substring of length
        # L >= k + 2*(winnow_window - 1) is detected with certainty
        # (the mod sampler's short-repeat blind spot, where P(miss) =
        # (1-1/mod)^(L-k+1), closes to ZERO above that length).
        # Expected density ~ 2/(w+1) — comparable volume to mod=4.
        wspec = Window.partitionBy("doc_id").orderBy("pos")
        wm = F.min("h").over(
            wspec.rowsBetween(Window.currentRow, winnow_window - 1)
        )
        mx = F.max("_wm").over(
            wspec.rowsBetween(-(winnow_window - 1), Window.currentRow)
        )
        selected = (
            grams.withColumn("_wm", wm)
            .withColumn("_mx", mx)
            .where(F.col("_mx") == F.col("h"))
            .select("doc_id", "pos", "h")
        )
    else:
        raise ValueError(f"unknown sampler {sampler!r} (mod | winnow)")
    # the fingerprint table feeds BOTH the repeat-count agg and the hits
    # join — cache it or the full stride-1 gram hashing pass runs twice
    # (released via session.release_caches, same pattern as blocking)
    sampled = track_cache(selected)
    rep = (
        sampled.groupBy("h")
        .agg(F.count_distinct("doc_id").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
        .select("h")
    )
    hits = sampled.join(rep, "h")
    w = Window.partitionBy("doc_id").orderBy("pos")
    spans = (
        hits.withColumn(
            "_new",
            F.when(
                F.lag("pos").over(w).isNull()
                | (F.col("pos") - F.lag("pos").over(w) > merge_gap),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn("_span", F.sum("_new").over(w))
        .groupBy("doc_id", "_span")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(k)).alias("span_end"),
            F.count(F.lit(1)).alias("n_fingerprints"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_len"),
            "n_fingerprints",
        )
    )
    return spans


def cut_spans(
    docs: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Remove [span_start, span_end) character ranges from each doc —
    the consumer step of ``repeated_substring_spans`` (detect -> cut).

    Returns (id_col, text_clean, chars_removed, n_cut); docs with no
    span pass through verbatim with 0/0. Precondition: a doc's spans do
    not overlap (``repeated_substring_spans`` guarantees it via the
    merge-gap rule); spans are sorted here so input order is free.
    ``spans`` always carries its id as ``doc_id`` (every operator in
    this module normalizes to that name); ``id_col`` renames only the
    DOCS side.

    All JVM: spans collect per doc (bounded — spans per doc <=
    len/merge_gap), and the splice is one ``F.aggregate`` over the
    sorted span array building the kept text left-to-right. No UDF, no
    shuffle beyond the one groupBy/join on doc id (co-located on
    bucketed storage)."""
    sp = spans.groupBy(F.col("doc_id").alias("_sid")).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("span_start").alias("s"),
                    F.col("span_end").alias("e"),
                )
            )
        ).alias("_spans")
    )
    joined = docs.select(id_col, text_col).join(
        sp, F.col(id_col) == F.col("_sid"), "left"
    )
    t = F.col(text_col)
    spliced = F.aggregate(
        "_spans",
        F.struct(
            F.lit(0).cast("int").alias("last"), F.lit("").alias("txt")
        ),
        lambda acc, s: F.struct(
            s["e"].cast("int").alias("last"),
            F.concat(
                acc["txt"],
                F.substring(t, acc["last"] + 1, s["s"] - acc["last"]),
            ).alias("txt"),
        ),
        lambda acc: F.concat(
            acc["txt"], F.substring(t, acc["last"] + 1, F.length(t))
        ),
    )
    return joined.select(
        id_col,
        F.when(F.col("_spans").isNull(), t)
        .otherwise(spliced)
        .alias("text_clean"),
        F.coalesce(
            F.aggregate(
                "_spans",
                F.lit(0).cast("long"),
                lambda acc, s: acc + (s["e"] - s["s"]).cast("long"),
            ),
            F.lit(0).cast("long"),
        ).alias("chars_removed"),
        F.coalesce(F.size("_spans"), F.lit(0)).cast("int").alias("n_cut"),
    )


def _bucket_pair_cap(
    cand: DataFrame,
    key_cols: list[str],
    cap: int,
    return_audit: bool = False,
):
    """Star-preserving per-bucket PAIR cap (the blocking layer's
    pairs_per_key_cap, applied to LSH buckets).

    Keeps, per bucket: (a) EVERY pair whose left side is the bucket's
    minimum member — the star that connects all m members through the
    min, so the transitive dedup component over a bucket of any size up
    to ``bucket_cap`` survives the cap (round-2 ADVICE: a plain first-50
    lexicographic cap was a star covering only 51 members — members
    52..256 of an exact-dup bucket silently lost every edge); plus (b)
    the first ``cap`` pairs in (doc_id_a, doc_id_b) order as clique
    extras for verify quality. Per-bucket output is <= cap + members - 1
    pairs; the pre-cap pair count is itself bounded by the upstream
    ``cap_hot_buckets`` member cap (C(bucket_cap, 2) worst case).

    With ``return_audit``, also returns (key_cols..., pairs_total,
    pairs_kept) for buckets where the cap dropped anything — the same
    never-silent contract as ``cap_hot_buckets``.

    The keep rule and audit are ``blocking.star_pair_flag`` /
    ``star_pair_audit`` — the SAME definition the blocking layer's
    ``star_capped_pairs`` applies, so the cap rule cannot drift between
    the linkage and dedup layers (round-5 review: the two
    hand-maintained copies had already drifted on caching).
    """
    from pipeline.blocking import star_pair_audit, star_pair_flag

    flagged = star_pair_flag(cand, key_cols, "doc_id_a", "doc_id_b", cap)
    if return_audit:
        # the audit AND the pairs table both derive from flagged; without
        # this cache consuming both re-executes the bucket self-join plus
        # both window passes. Bounded by the upstream member cap
        # (<= C(bucket_cap, 2) + members per bucket).
        flagged = track_cache(flagged)
    kept = flagged.where("_keep").drop("_rn", "_min_a", "_keep", *key_cols)
    if not return_audit:
        return kept
    return kept, star_pair_audit(flagged, key_cols)


def exact_dedup(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup on normalized text: one survivor (min id) per group.

    Returns (doc_id, canonical_id, group_size); rows with canonical_id !=
    doc_id are duplicates. Groups and joins back on TWO independent
    60-bit text hashes — the shuffle still moves 16-byte keys instead of
    full documents, and a false merge now needs a simultaneous 120-bit
    collision. (Round-2 ADVICE: with one 60-bit hash, the birthday bound
    gives ~O(1) expected collisions once the corpus holds ~2^30 distinct
    texts — i.e. dozens of expected false merges at 10^9+ docs. Two
    independent hashes push the collision corpus size to ~2^60 distinct
    texts.) The DuckDB oracle groups by the TEXT itself, so any residual
    collision at test scale would surface as a hash mismatch.
    """
    norm = norm_text_col(text_col)
    normed = docs.select(
        F.col(id_col).alias("doc_id"),
        h60_col(norm).alias("_h"),
        h60_col(F.lit("x2"), norm).alias("_h2"),
    )
    grouped = normed.groupBy("_h", "_h2").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        normed.join(grouped, ["_h", "_h2"])
        .select("doc_id", "canonical_id", "group_size")
    )


def _shingle_minhash(
    normed: DataFrame, n: int, hashes: int, hash_impl: str
) -> DataFrame:
    """(doc_id, _mh0.._mhH-1) via explode -> hash-once -> min-aggregate.

    The inline form (one array_min(transform(shingles,...)) column per
    hash) re-evaluates the shingle array once PER HASH — Catalyst
    collapses the projections and higher-order functions don't get
    common-subexpression elimination. Exploding hashes each shingle
    exactly once and the map-side partial min keeps the shuffle at
    H longs per doc. The shuffle also restores parallelism when the
    input is a single parquet file (1-partition scan)."""
    H = _H(hash_impl)
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
            F.min(H(F.lit(i), "_g")).alias(f"_mh{i}")
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
    bucket_cap: int = 256,
    pairs_per_bucket_cap: int = 50,
    hash_impl: str = "md5",
    return_audit: bool = False,
    hot_bucket_star: bool = False,
    return_pair_audit: bool = False,
):
    """Near-duplicate pairs via MinHash banding + n-gram Jaccard verify.

    Returns (doc_id_a, doc_id_b, jaccard) for verified pairs — or
    (pairs, hot_bucket_audit) with ``return_audit``. The banding join
    proposes, the Jaccard (computed on exact hashed-shingle sets via an
    array intersection in the JVM) disposes. Band buckets over
    ``bucket_cap`` members are down-sampled + audited (cap_hot_buckets).

    ``hot_bucket_star`` (production skew defense, round-5): hub star
    edges for coin-dropped members of hot buckets, so a mega-duplicate
    group larger than ``bucket_cap`` still yields a CONNECTED verified
    pair set (one Jaccard-verified hop per member) instead of
    shattering; volume stays linear in bucket membership
    (BENCH/skew_scale.py validates at 20k members).
    """
    H = _H(hash_impl)
    normed = docs.select(
        F.col(id_col).alias("doc_id"), norm_text_col(text_col).alias("_norm")
    )
    # a small corpus often arrives as ONE parquet file -> 1-partition scan
    # -> serial shingle generation; spread it (cheap: ids+text only)
    normed = track_cache(
        normed.repartition(normed.sparkSession.sparkContext.defaultParallelism * 2)
    )
    if bands < 1 or hashes % bands != 0:
        # silent degeneracy otherwise: hashes=12, bands=16 -> rows=0 ->
        # every band key is a CONSTANT and the whole corpus lands in one
        # bucket per band (recall collapses to the cap sample); leftover
        # minhashes (hashes % bands) would silently never participate
        raise ValueError(
            f"hashes ({hashes}) must be a positive multiple of bands "
            f"({bands}): rows-per-band = hashes // bands must be >= 1 "
            "with no remainder"
        )
    mh = _shingle_minhash(normed, n, hashes, hash_impl)
    rows = hashes // bands
    band_keys = [
        H(F.lit("band"), F.lit(b), *[F.col(f"_mh{b * rows + r}") for r in range(rows)])
        for b in range(bands)
    ]
    # band join proposes on (doc_id, band_key) only — shingle arrays are
    # NOT dragged through the shuffle; the verify step joins them back
    # from a persisted per-doc table (each doc's shingles computed once)
    keyed = mh.select(
        "doc_id", F.explode(F.array(*band_keys)).alias("band_key")
    )
    star = None
    if hot_bucket_star:
        keyed, audit, star = cap_hot_buckets(
            keyed, ["band_key"], "doc_id", bucket_cap, hash_impl,
            return_star_pairs=True,
        )
    else:
        keyed, audit = cap_hot_buckets(
            keyed, ["band_key"], "doc_id", bucket_cap, hash_impl
        )
    # NOT re-persisted post-cap: cap_hot_buckets pins the pre-cap table
    # and the cap is a broadcast-join + filter over it — a second
    # bucket-table-sized persist doubled peak memory (round-5 review)
    a, b = keyed.alias("a"), keyed.alias("b")
    raw_pairs = (
        a.join(b, "band_key")
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            "band_key",
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
    )
    if star is not None:
        raw_pairs = raw_pairs.unionByName(star)
    # the pair audit (and the flagged-table cache that makes it cheap to
    # share) is built ONLY when the caller consumes it — materializing a
    # cache for a discarded audit was measurable dead weight on the
    # audit-less path (round-5 bench A/B)
    if return_pair_audit:
        cand, pair_audit = _bucket_pair_cap(
            raw_pairs, ["band_key"], pairs_per_bucket_cap, return_audit=True
        )
    else:
        cand = _bucket_pair_cap(raw_pairs, ["band_key"], pairs_per_bucket_cap)
    cand = track_cache(cand.dropDuplicates(["doc_id_a", "doc_id_b"]))
    # verify on HASHED shingle sets: same Jaccard (60-bit collisions are
    # ~|S|^2/2^60 per pair — negligible), but long arrays shuffle ~2x
    # smaller and intersect far faster than string arrays. Compute them
    # ONLY for candidate endpoints (semi-join): LSH typically touches a
    # small fraction of a large corpus, and a corpus-wide gram cache is
    # the dominant verify-stage cost at 10^8+ docs (same `touched`
    # pattern as pipeline.incremental).
    touched = (
        cand.select(F.col("doc_id_a").alias("doc_id"))
        .unionByName(cand.select(F.col("doc_id_b").alias("doc_id")))
        .distinct()
    )
    grams = track_cache(
        normed.join(touched, "doc_id", "semi").select(
            "doc_id", _hashed_grams(n, hash_impl)
        )
    )
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
    if return_pair_audit:
        # never-silent contract, pair-cap half: buckets whose clique
        # extras were truncated at pairs_per_bucket_cap
        return verified, audit, pair_audit
    return (verified, audit) if return_audit else verified


def _hashed_grams(n: int, hash_impl: str) -> Column:
    """Distinct hashed n-gram set of ``_norm`` as an alias'd column."""
    H = _H(hash_impl)
    raw = F.expr(
        f"array_distinct(transform("
        f"sequence(1, greatest(length(_norm)-{n-1},1)),"
        f" i -> substring(_norm, i, {n})))"
    )
    # hash each distinct gram; re-distinct is unnecessary (injective on
    # distinct inputs up to negligible collisions) but cheap and keeps
    # exact-set semantics under collision
    return F.array_distinct(F.transform(raw, lambda g: H(g))).alias("grams")


def simhash_col(tokens_col, hash_impl: str = "md5", bits: int = SIMHASH_BITS):
    """SimHash of a token array, pure JVM.

    Classic Charikar sketch: for each bit position, sum +1/-1 votes from
    each token's hash bit; bit set iff the sum is positive. The token
    array is hashed ONCE (transform -> long array); each bit's vote is a
    size(filter(...)) over the long array — whole-stage-codegen, no
    Python. 60 bits with the neutral hash (fits a signed LONG exactly).
    """
    H = _H(hash_impl)
    hashed = F.transform(tokens_col, lambda t: H(t))
    n = F.size(tokens_col)
    acc = F.lit(0).cast("long")
    for bit in range(bits):
        set_count = F.size(
            F.filter(
                hashed,
                lambda h: F.shiftrightunsigned(h, bit).bitwiseAND(F.lit(1)) == 1,
            )
        )
        # votes = set - unset > 0  <=>  2*set > n
        acc = acc + F.when(
            (set_count * 2) > n, F.lit(2**bit).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return acc


def simhash_dedup_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    bucket_cap: int = 256,
    pairs_per_bucket_cap: int = 50,
    hash_impl: str = "md5",
    return_audit: bool = False,
    hot_bucket_star: bool = False,
    return_pair_audit: bool = False,
):
    """SimHash near-dup pairs: docs whose 60-bit SimHash agrees on one of
    ``max_hamming + 1`` equal-width bit blocks; verify Hamming distance.

    By pigeonhole, any pair within Hamming distance h agrees on at least
    one of h+1 disjoint blocks — n_tables is DERIVED from max_hamming
    (round-1 ADVICE: a fixed 4-table index silently missed distances > 3).
    Block width 60/(h+1); h=3 -> 4 tables x 15-bit blocks -> 32k buckets
    per table. Bucket population is bounded by cap_hot_buckets, so even
    at 10^9+ docs a degenerate block key cannot go quadratic (the
    round-1 16-bit/65k-bucket scale concern).
    """
    n_tables = max_hamming + 1
    width = SIMHASH_BITS // n_tables
    normed = docs.select(
        F.col(id_col).alias("doc_id"), norm_text_col(text_col).alias("_norm")
    )
    toks = normed.withColumn(
        "_tokens", F.array_remove(F.split("_norm", " "), "")
    )
    sh = toks.withColumn(
        "simhash", simhash_col(F.col("_tokens"), hash_impl)
    ).select("doc_id", "simhash")
    block_keys = [
        F.shiftrightunsigned(F.col("simhash"), width * t).bitwiseAND(
            F.lit((1 << width) - 1)
        )
        for t in range(n_tables)
    ]
    keyed = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(F.array(*block_keys)).alias("table", "block"),
    )
    star = None
    if hot_bucket_star:
        sh = track_cache(sh)  # star sides re-join the (expensive) sketch
        keyed, audit, star = cap_hot_buckets(
            keyed, ["table", "block"], "doc_id", bucket_cap, hash_impl,
            return_star_pairs=True,
        )
    else:
        keyed, audit = cap_hot_buckets(
            keyed, ["table", "block"], "doc_id", bucket_cap, hash_impl
        )
    # NOT re-persisted post-cap: cap_hot_buckets pins the pre-cap table
    # and the cap is a broadcast-join + filter over it — a second
    # bucket-table-sized persist doubled peak memory (round-5 review)
    a, b = keyed.alias("a"), keyed.alias("b")
    raw_pairs = (
        a.join(b, ["table", "block"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            "table",
            "block",
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
            F.col("a.simhash").alias("_ha"),
            F.col("b.simhash").alias("_hb"),
        )
    )
    if star is not None:
        star = (
            star.join(
                sh.select(
                    F.col("doc_id").alias("doc_id_a"),
                    F.col("simhash").alias("_ha"),
                ),
                "doc_id_a",
            )
            .join(
                sh.select(
                    F.col("doc_id").alias("doc_id_b"),
                    F.col("simhash").alias("_hb"),
                ),
                "doc_id_b",
            )
            .select("table", "block", "doc_id_a", "doc_id_b", "_ha", "_hb")
        )
        raw_pairs = raw_pairs.unionByName(star)
    # same audit-on-demand rule as minhash_lsh_pairs: no flagged-table
    # cache materialization when the pair audit is never consumed
    if return_pair_audit:
        cand, pair_audit = _bucket_pair_cap(
            raw_pairs, ["table", "block"], pairs_per_bucket_cap,
            return_audit=True,
        )
    else:
        cand = _bucket_pair_cap(
            raw_pairs, ["table", "block"], pairs_per_bucket_cap
        )
    cand = cand.dropDuplicates(["doc_id_a", "doc_id_b"])
    out = (
        cand.withColumn(
            "hamming", F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb")))
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_id_a", "doc_id_b", "hamming")
    )
    if return_pair_audit:
        return out, audit, pair_audit
    return (out, audit) if return_audit else out
