"""Stage 2b — feature columns + blocking keys, all JVM expressions.

The reference's candidate generation is an ES bool query mixing exact term
clauses and fuzzy matches (``optimized.py:541-615``). Set-oriented rebuild
(SURVEY.md §2.3 J1-J3): every document gets a small set of deterministic
BLOCKING KEYS; candidate pairs are equi-self-joins per key family:

  family 0  exact     xxhash64(norm_text)                — direct-match fast
                      path (UAM:1301-1352 analogue)
  family 1  token_set xxhash64(sorted distinct tokens)   — reorder-invariant
                      (token_sort tier analogue, optimized.py:639)
  family 2  prefix    xxhash64(first K chars of norm)    — sorted-neighborhood
                      stand-in; catches truncation (partial tier analogue)
  family 3  minhash   5 band keys (3 rows each) from a 15-hash MinHash
                      signature over CHAR-4-GRAM shingles — catches
                      char-level edits by Jaccard proximity (fuzzy tiers)
  family 4  anchor    rare-token anchors, built in ``pipeline.blocking``
                      (needs a global document-frequency pass) — keyword /
                      desperate tier analogue (UAM:740-758)

MinHash is computed entirely JVM-side: hash_i(doc) = min over shingles of
H(i, shingle); band key = H("band", b, h_{3j},..,h_{3j+2}). No Python, no
pyspark.ml pipeline objects, fully codegen'd. H is the engine-neutral
60-bit md5 hash by default (``pipeline.hashing``, cfg.hash_impl) so the
same keys are computable in DuckDB and in the pandas blocking twin;
xxhash64 is the opt-in fast path.

Key collisions are harmless: keys only PROPOSE candidates; the scoring
stage decides on the actual texts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline.config import DEFAULT_CONFIG, MatchConfig
from pipeline.hashing import h60_col
from pipeline.normalize import norm_text_col

FAMILY_NAMES = ["exact", "token_set", "prefix", "minhash", "anchor"]


def hash_fn(cfg: MatchConfig):
    """The configured key-hash function: (*cols) -> LONG Column."""
    if cfg.hash_impl == "xxhash64":
        return F.xxhash64
    return h60_col


def _shingles(col: str, n: int) -> Column:
    """Distinct character n-gram shingles of a string column (JVM)."""
    return F.expr(
        f"array_distinct(transform("
        f"  sequence(1, greatest(length({col}) - {n - 1}, 1)),"
        f"  i -> substring({col}, i, {n})))"
    )


def _minhash_array(shingles: Column, n_hashes: int, H) -> Column:
    """[h_0..h_{n-1}] where h_i = min over shingles of H(i, shingle) —
    one aggregate pass.

    The round-5 form built one ``array_min(transform(shingles, ...))``
    column per hash: higher-order functions are interpreted (no
    whole-stage codegen, no common-subexpression elimination), so the
    shingle array was traversed ``n_hashes`` times per row with one
    array allocation each. This form folds ONE pass over the array with
    an ``n_hashes``-slot accumulator (``zip_with`` + ``least``) — the
    same H(i, shingle) calls, identical values (pinned by
    ``tests/test_plans.py::test_minhash_single_pass_equals_per_hash``),
    ~13% off the featurize projection at sf0.1 (round-6 A/B). The
    caller MUST bind the result as its own column and read slots via
    ``element_at`` from that bound column — inlining this expression
    into several consumers would re-run the whole aggregate per
    consumer (no CSE in interpreted projections).
    ``array_distinct`` upstream stays: MIN is idempotent so distinctness
    never changes a value, but deduping ~6.7x repeated shingles per doc
    before hashing them is a measured win (the no-distinct variant
    re-hashes every position and loses the A/B).

    The accumulator slots start at Long.MAX and the shingle array is
    never empty (``_shingles`` emits at least [substring(text, 1, n)]),
    so every slot is overwritten by a real hash."""
    LMAX = (1 << 63) - 1
    init = F.array(*[F.lit(LMAX).cast("long") for _ in range(n_hashes)])
    return F.aggregate(
        shingles,
        init,
        lambda acc, g: F.zip_with(
            acc,
            F.array(*[H(F.lit(i), g) for i in range(n_hashes)]),
            lambda a, h: F.least(a, h),
        ),
    )


def featurize(docs: DataFrame, cfg: MatchConfig = DEFAULT_CONFIG) -> DataFrame:
    """docs -> docs + norm_text + tokens + blocking key columns.

    Output: conv_id, norm_text, tokens, roles_sig, n_turns, first_ts,
    key_exact, key_token_set, key_prefix, key_band_0..b-1 (keys are LONG).
    """
    out = docs.withColumn("norm_text", norm_text_col("canonical_text"))
    out = out.withColumn(
        "tokens",
        F.array_remove(F.split(F.col("norm_text"), " "), ""),
    )

    H = hash_fn(cfg)
    out = out.withColumn("key_exact", H(F.col("norm_text")))
    out = out.withColumn(
        "key_token_set",
        H(F.array_join(F.array_sort(F.array_distinct(F.col("tokens"))), " ")),
    )
    out = out.withColumn(
        "key_prefix",
        H(F.substring(F.col("norm_text"), 1, cfg.prefix_key_len)),
    )

    out = out.withColumn("_shingles", _shingles("norm_text", cfg.shingle_size))
    # bind the one-pass minhash array as its own column: each band key
    # reads 3 slots of it, and a bound non-cheap column referenced from
    # several projections is computed ONCE (Catalyst refuses to collapse
    # a projection into consumers that reference it more than once) —
    # inlining the aggregate into the 5 band keys would run it 5x/row
    out = out.withColumn(
        "_mh",
        _minhash_array(F.col("_shingles"), cfg.minhash_hashes, H),
    )
    # null-impossible (see _minhash_array) but keep the old 0 fallback
    mh = [
        F.coalesce(F.element_at("_mh", i + 1), F.lit(0).cast("long"))
        for i in range(cfg.minhash_hashes)
    ]
    rows_per_band = cfg.minhash_hashes // cfg.minhash_bands
    for b in range(cfg.minhash_bands):
        band = mh[b * rows_per_band : (b + 1) * rows_per_band]
        out = out.withColumn(
            f"key_band_{b}", H(F.lit("band"), F.lit(b), *band)
        )

    return out.drop("_shingles", "_mh", "canonical_text", "tools_sig")


def key_columns(cfg: MatchConfig = DEFAULT_CONFIG) -> list[tuple[int, str]]:
    """(family_id, column_name) for every per-row blocking key column.
    (Family 4 anchor keys are row-exploded in ``pipeline.blocking``.)"""
    cols = [(0, "key_exact"), (1, "key_token_set"), (2, "key_prefix")]
    cols += [(3, f"key_band_{b}") for b in range(cfg.minhash_bands)]
    return cols
