"""Pipeline configuration — the analogue of the reference's ``MatchConfig``.

Reference: ``optimized.py:112-157`` (component weights summing to 1,
similarity thresholds, ``max_results`` caps) and the 10-level cascade
factories ``ultimate_address_matcher.py:276-364`` (thresholds
95/85/75/65/55/45/35/25/15/5 with per-level top-k 1/3/5/10/15/20/25/30/35/50).

We keep the numerology — the tier thresholds, the weight shape (six
components summing to 1), the per-tier candidate caps — but re-key the
components to the transcript domain per SURVEY.md §1.2: the six address
components (street/house/city/zip/state/unit) become six conversation-level
similarity channels with the same default weights.
"""

from __future__ import annotations

from dataclasses import dataclass, field


# The 10 cascade tiers, highest-precision first, exactly the reference's
# level names + thresholds (ultimate_address_matcher.py:276-364) and the
# per-level candidate top-k caps.
TIERS: list[tuple[str, float, int]] = [
    ("exact", 95.0, 1),
    ("relaxed", 85.0, 3),
    ("partial", 75.0, 5),
    ("geographic", 65.0, 10),
    ("fuzzy", 55.0, 15),
    ("ultra_fuzzy", 45.0, 20),
    ("semantic", 35.0, 25),
    ("phonetic", 25.0, 30),
    ("keyword", 15.0, 35),
    ("desperate", 5.0, 50),
]

TIER_NAMES: list[str] = [t[0] for t in TIERS]
TIER_THRESHOLDS: dict[str, float] = {t[0]: t[1] for t in TIERS}
TIER_TOPK: dict[str, int] = {t[0]: t[2] for t in TIERS}

# Per-level confidence/quality adjustment (ultimate_address_matcher.py:820-827,
# applied at :923-929): 0/-5/-10/-15/-25/-35/-45/-55/-65/-75.
TIER_ADJUSTMENT: dict[str, float] = {
    "exact": 0.0,
    "relaxed": -5.0,
    "partial": -10.0,
    "geographic": -15.0,
    "fuzzy": -25.0,
    "ultra_fuzzy": -35.0,
    "semantic": -45.0,
    "phonetic": -55.0,
    "keyword": -65.0,
    "desperate": -75.0,
}

# Reliability bands over quality (ultimate_address_matcher.py:845-854).
RELIABILITY_BANDS: list[tuple[float, str]] = [
    (80.0, "high"),
    (60.0, "medium"),
    (40.0, "low"),
    (20.0, "very_low"),
]


@dataclass(frozen=True)
class MatchConfig:
    """Weights + thresholds. Defaults mirror ``optimized.py:115-124``.

    DECLARED channel mapping (transcript <- address), re-keyed in round 2
    to match how the reference actually SCORES each component:

      token_sort <- street (.40): the reference scores street as
          normalized-equal -> 100 else fuzz.token_sort_ratio
          (optimized.py:634-639) — i.e. the street channel IS the
          reorder-invariant token-sort channel. Critical-channel caps
          (<70 -> min(,60); post-hoc <85 -> cap 80) live here.
      num        <- house  (.25): house number = the DIGIT-RUN SIGNATURE
          of the canonical text (space-joined \\d+ runs — the transcript's
          numeric identity). Exact -> 100; else plain InDel ratio with the
          F9 penalty ladder (ratio<90 -> max(0, ratio-20),
          optimized.py:666-673). Absent on either side -> 0 = channel
          absent (the reference only scores house when both sides have
          one), and an absent channel is excluded from the weighted sum.
      partial    <- city   (.15): best-window partial ratio (truncation)
      jaccard    <- zip    (.10): token-set Jaccard x100; dropped < 50
      jaro       <- state  (.05): Jaro-Winkler x100 (128-char prefix)
      struct     <- unit   (.05): role-sequence signature similarity

      s_text (plain InDel ratio on the full normalized text, exact-first)
      is NOT a weighted component: it is the reference's separate OVERALL
      SIMILARITY (fuzz.ratio of normalized query vs matched address,
      optimized.py:753-754), used for the exact predicate (similarity>=95),
      the quality bonus (min(sim/5,15)), the low-similarity warning
      (sim<50) and the match-decision floor — exactly the four places the
      reference uses `similarity`.
    """

    w_token_sort: float = 0.40
    w_num: float = 0.25
    w_partial: float = 0.15
    w_jaccard: float = 0.10
    w_jaro: float = 0.05
    w_struct: float = 0.05

    # optimized.py:123-124
    min_similarity_threshold: float = 70.0
    exact_threshold: float = 98.0

    # Tier at/above which a pair counts as a match decision. fuzzy=55:
    # under a realistic Zipf vocabulary, shared high-frequency tokens lift
    # unrelated (distractor) pairs into the ultra_fuzzy band, so the match
    # cutoff sits one tier higher; every FIXTURES.md duplicate class still
    # scores >= 55 (see tests/test_synth_oracle.py).
    match_tier_threshold: float = 55.0
    # The critical-channel floor for the MATCH DECISION: a pair only
    # links if the primary text channel (the reference's street/overall
    # similarity, optimized.py:753-754) also clears this. Rationale: the
    # weighted-confidence early-return cap (optimized.py:704-706) emits
    # min(token_sort, 60) for poor-critical-channel pairs, which lands
    # borderline unrelated pairs exactly in the fuzzy band (measured:
    # every false cluster edge had s_text <= 44 while true fuzzy-band
    # duplicates sit >= 54 — transitive closure amplifies those few
    # false edges into large wrong clusters).
    match_text_floor: float = 45.0

    # Key hashing: "md5" = engine-neutral 60-bit hash (pipeline.hashing)
    # — identical keys in Spark, DuckDB and Python, so every bucketing
    # operator is oracle-checkable and the pandas blocking twin is exact.
    # "xxhash64" = Spark-native (~2x faster per key, not verifiable);
    # for clusters where the oracle never runs.
    hash_impl: str = "md5"

    # Blocking knobs.
    prefix_key_len: int = 32
    # MinHash-LSH over char-4-gram shingles: 5 bands x 3 rows — tuned so
    # P(candidate) ~= 0.98 at shingle-Jaccard 0.8 (typo class) while the
    # background rate at J~0.03 stays ~1e-4 (measured on the synthetic
    # corpus; see tests/test_pipeline_e2e.py).
    minhash_hashes: int = 15
    minhash_bands: int = 5
    shingle_size: int = 4
    # Rare-token anchor keys (keyword-tier analogue, UAM:740-758): tokens
    # with document frequency in [2, anchor_max_df] are blocking anchors;
    # each doc contributes its anchor_tokens rarest. Cold keys by
    # construction (<= anchor_max_df members per key), so scale-safe.
    # max_df=8: true duplicate groups have df 2-6 (group size + chain),
    # while df 9-30 is mid-tail vocabulary shared by UNRELATED docs — at
    # 2000-base scale max_df=30 made anchors emit 47 candidates/doc (89%
    # of all candidates); 8 keeps heavy-class recall ~0.8 at ~15/doc.
    anchor_max_df: int = 8
    anchor_tokens: int = 16
    # Hot-key protection: keys with more members than this are capped
    # (deterministically, keeping lowest conv_ids) and audited. The reference
    # silently caps at ES `size` (optimized.py:603); we cap *visibly*.
    block_key_cap: int = 64
    # Max candidate pairs retained per blocking key after the self-join
    # (per-level top-k analogue, ultimate_address_matcher.py:276-364).
    pairs_per_key_cap: int = 50
    # Star-preserving MEMBER cap (round-5): with the plain coin cap a
    # hot key keeps ~block_key_cap members and every other member loses
    # the key entirely — a 20k-member true-duplicate group shatters into
    # singletons because no kept pair touches the dropped members. With
    # hot_key_star, each hot key's minimum member (the hub) is always
    # kept and one (hub, member) star edge is emitted per DROPPED member
    # — pair volume stays LINEAR in hot-key membership while every
    # member remains one scored hop from the hub, so a true mega-group
    # still resolves to one entity (validated at 20k members,
    # BENCH/skew_scale.py). Off by default: the oracle contract surface
    # (DEFAULT_CONFIG) predates the rule; production runs enable it.
    hot_key_star: bool = False

    # Scoring knobs.
    score_text_max_chars: int = 2048  # kernel cost guard; documented truncation

    # Required-feature gates (P2, optimized.py:130-131 require_house /
    # require_zip + :784-793 empty-query guard): a doc whose critical
    # feature is missing cannot be a match query — its pairs score
    # confidence 0 / tier none and it generates no blocking keys.
    # text is THE critical feature here (street/house analogue);
    # roles_sig is the unit analogue (off by default, like require_house).
    require_text: bool = True
    require_roles: bool = False

    # P5 exact-match predicate minimums (optimized.py:191-218
    # _is_truly_exact, channel-for-channel):
    # is_exact = s_text >= exact_similarity_min AND confidence >= 95
    #            AND (s_num > 0 -> s_num >= exact_house_min)
    #            AND s_token_sort >= exact_street_min
    #            AND (s_jaccard > 0 -> s_jaccard >= exact_zip_min)
    exact_similarity_min: float = 95.0
    exact_house_min: float = 95.0
    exact_street_min: float = 85.0
    exact_zip_min: float = 80.0

    def weights(self) -> dict[str, float]:
        """The six WEIGHTED channels (s_text is the similarity, not a
        component — see class docstring). Insertion order is the
        accumulation order of the confidence formula (FP-op-order parity
        between the pandas oracle and the JVM expression)."""
        return {
            "token_sort": self.w_token_sort,
            "num": self.w_num,
            "partial": self.w_partial,
            "jaccard": self.w_jaccard,
            "jaro": self.w_jaro,
            "struct": self.w_struct,
        }

    def __post_init__(self) -> None:
        total = sum(self.weights().values())
        # optimized.py:140-146 validates weights sum to 1.
        if abs(total - 1.0) > 1e-9:
            raise ValueError(f"component weights must sum to 1.0, got {total}")
        # silent LSH degeneracy otherwise (round-5 review, same guard as
        # extras.dedup.minhash_lsh_pairs): bands > hashes makes
        # rows_per_band = 0, so every band key is a CONSTANT and the
        # blocking self-join goes quadratic in corpus size; a remainder
        # silently discards minhashes the config claims to use
        if self.minhash_bands < 1 or self.minhash_hashes % self.minhash_bands:
            raise ValueError(
                f"minhash_hashes ({self.minhash_hashes}) must be a "
                f"positive multiple of minhash_bands "
                f"({self.minhash_bands}): rows-per-band = hashes // "
                "bands must be >= 1 with no remainder"
            )

    @classmethod
    def from_file(cls, path: str) -> "MatchConfig":
        """Config source (reference ``MatchConfig.from_file``,
        optimized.py:148-157): JSON always; YAML when pyyaml is present
        (import-gated — not guaranteed in this environment)."""
        import json

        with open(path) as f:
            raw = f.read()
        if path.endswith((".yaml", ".yml")):
            try:
                import yaml  # type: ignore
            except ImportError as e:
                raise ValueError(
                    "YAML config requires pyyaml; use JSON here"
                ) from e
            data = yaml.safe_load(raw)
        else:
            data = json.loads(raw)
        return cls(**data)


DEFAULT_CONFIG = MatchConfig()

# PRODUCTION defaults: identical match semantics, Spark-native xxhash64
# for every blocking/bucketing key instead of the engine-neutral 60-bit
# md5 (pipeline.hashing). Key hashing only affects WHICH bucket a row
# lands in, never a score — but md5 keys cost ~21% on the dedup family
# (measured, bench q6 vs q6b), so production runs (main.py) take the
# fast hash and md5 stays the ORACLE config: contract queries pin
# DEFAULT_CONFIG so every operator remains DuckDB-verifiable
# (round-3 VERDICT task 3).
PRODUCTION_CONFIG = MatchConfig(hash_impl="xxhash64", hot_key_star=True)


def build_exact_match_config() -> MatchConfig:
    """Strict-mode config — the reference's ``build_exact_match_config``
    (optimized.py:905-924): heavier weights on the critical channels
    (.45/.30/.10/.10/.03/.02), min similarity raised to 75. Used when the
    corpus is boilerplate-heavy (e.g. machine-generated event streams)
    and only partial-or-better tiers should link."""
    return MatchConfig(
        w_token_sort=0.45,
        w_num=0.30,
        w_partial=0.10,
        w_jaccard=0.10,
        w_jaro=0.03,
        w_struct=0.02,
        min_similarity_threshold=75.0,
        match_tier_threshold=75.0,
    )

# Stop words for keyword extraction (ultimate_address_matcher.py:745).
STOPWORDS = frozenset(
    {"the", "and", "or", "of", "in", "at", "to", "for", "with", "by"}
)
