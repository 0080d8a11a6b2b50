"""Pure-pandas reference-semantics oracle (label generator / parity check).

This is the single-node twin of the Spark pipeline: same normalization
(``pipeline.textnorm``), same similarity kernels (``pipeline.kernels``),
same weighted-confidence formula and tier ladder. The Spark pipeline must
reproduce its match decisions with pairwise F1 >= 0.99 (BASELINE.json).

Channel mapping (transcript <- reference address component), weights from
``optimized.py:115-121``; formula structure from
``_calculate_weighted_confidence`` ``optimized.py:686-737``. The mapping
mirrors how the reference SCORES each component (see
``pipeline.config.MatchConfig`` for the full declaration):

  token_sort (.40) <- street: normalized-equal -> 100 else
                      token_sort_ratio (optimized.py:634-639 — street IS
                      the reorder-invariant channel in the reference)
  num        (.25) <- house:  digit-run signature; exact -> 100 else
                      InDel ratio through the F9 penalty ladder
                      (ratio<90 -> max(0, ratio-20), optimized.py:659-673);
                      absent on either side -> 0 (channel excluded)
  partial    (.15) <- city:   partial_ratio (truncation tolerant,
                      optimized.py:675-676)
  jaccard    (.10) <- zip:    token-set Jaccard x100; dropped when <50
                      (optimized.py:714-715)
  jaro       (.05) <- state:  Jaro-Winkler x100 on 128-char prefix
  struct     (.05) <- unit:   role-sequence signature similarity
  text  (unweighted) : plain InDel ratio on full normalized text — the
                      reference's separate OVERALL SIMILARITY
                      (optimized.py:753-754), used for the exact
                      predicate / quality bonus / warnings / match floor.

Caps (optimized.py:700-737, channel-for-channel):
  * num in (0, 80)   -> confidence = min(num, 70)      (house cap,
                        optimized.py:703-706; 0 = absent, no cap)
  * token_sort < 70  -> confidence = min(token_sort, 60) (street cap,
                        optimized.py:708-710)
  * num == 0         -> num weight := 0 (absent channel; the reference
                        omits missing components from the weighted sum)
  * partial == 0     -> partial weight := 0  (city, optimized.py:712-713)
  * jaccard < 50     -> jaccard channel dropped (zip, optimized.py:714-715)
  * post-hoc, if ws > 85 (optimized.py:728-735):
      num in (0, 90)   -> ws = min(ws, 75)   (house guard)
      token_sort < 85  -> ws = min(ws, 80)   (street guard)

Tier = highest cascade tier whose threshold <= confidence
(ultimate_address_matcher.py:276-364 recast per SURVEY.md §2.9 C1);
adjusted confidence = max(0, conf + tier adjustment)
(ultimate_address_matcher.py:923-929).
"""

from __future__ import annotations

import pandas as pd

from pipeline import kernels
from pipeline.config import (
    DEFAULT_CONFIG,
    MatchConfig,
    RELIABILITY_BANDS,
    TIERS,
    TIER_ADJUSTMENT,
)
from pipeline.textnorm import normalize_py

JARO_PREFIX = 128  # kernel cost guard; same on the Spark side


def canonicalize_pd(turns: pd.DataFrame) -> pd.DataFrame:
    """turns -> conversation docs; pandas twin of ``pipeline.canonicalize``.

    Joins turn texts in ``turn_idx`` order with the \\x1e record separator
    (preserves the per-turn text equality invariant: splitting on \\x1e
    recovers the sanitized turn texts in order — a literal \\x1e inside
    a turn folds to a space first, in every engine).
    """
    t = turns.sort_values(["conv_id", "turn_idx"])
    g = t.groupby("conv_id", sort=True)
    docs = pd.DataFrame(
        {
            # null text keeps its (empty) separator slot, exactly like
            # the Spark side's per-turn coalesce(text, ''); a raw join
            # raised TypeError on None and NaN is truthy, so the twin
            # crashed or diverged on the degenerate row the pipeline
            # handles (round-5 review)
            "canonical_text": g["text"].apply(
                lambda s: "\x1e".join(
                    "" if pd.isna(x) else x.replace("\x1e", " ")
                    for x in s
                )
            ),
            "n_turns": g["turn_idx"].count().astype("int64"),
            # null/empty roles contribute nothing to the signature
            # (array_join drops nulls; substring('',1,1) = '')
            "roles_sig": g["role"].apply(
                lambda s: "".join(
                    x[0] for x in s if isinstance(x, str) and x
                )
            ),
            "first_ts": g["ts"].min(),
        }
    ).reset_index()
    return docs


def featurize_pd(docs: pd.DataFrame) -> pd.DataFrame:
    docs = docs.copy()
    # normalization treats the turn separator as whitespace-ish: \x1e is not
    # in [\w\s\-#/] so it folds to a space in the chain
    docs["norm_text"] = docs["canonical_text"].map(normalize_py)
    return docs


def component_scores(
    norm_a: str,
    norm_b: str,
    roles_a: str,
    roles_b: str,
    cfg: MatchConfig = DEFAULT_CONFIG,
) -> dict[str, float]:
    cap = cfg.score_text_max_chars
    a, b = norm_a[:cap], norm_b[:cap]
    sorted_a = kernels.sorted_form(a)
    sorted_b = kernels.sorted_form(b)
    # street channel (optimized.py:634-639): exact-normalized -> 100,
    # else token_sort_ratio (reorder-invariant)
    if a == b or sorted_a == sorted_b:
        token_sort = 100.0
    else:
        token_sort = kernels.indel_ratio(sorted_a, sorted_b)
    # house channel (optimized.py:659-673): digit-run signature; exact ->
    # 100, else ratio through the F9 penalty ladder; absent -> 0
    num_a, num_b = kernels.digit_sig(a), kernels.digit_sig(b)
    if not num_a or not num_b:
        num = 0.0
    elif num_a == num_b:
        num = 100.0
    else:
        r = kernels.indel_ratio(num_a, num_b)
        num = r if r >= 90.0 else max(0.0, r - 20.0)
    return {
        "token_sort": token_sort,
        "num": num,
        "partial": kernels.partial_ratio(a, b),
        "jaccard": 100.0 * kernels.token_set_jaccard(a, b),
        "jaro": 100.0 * kernels.jaro_winkler(a[:JARO_PREFIX], b[:JARO_PREFIX]),
        "struct": 100.0
        if roles_a == roles_b
        else kernels.indel_ratio(roles_a, roles_b),
        # overall similarity (optimized.py:753-754) — NOT a weighted
        # component; exact-first like the reference's normalize-then-ratio
        "text": 100.0 if a == b else kernels.indel_ratio(a, b),
    }


def weighted_confidence(
    s: dict[str, float], cfg: MatchConfig = DEFAULT_CONFIG
) -> float:
    """Reference formula (optimized.py:686-737), channel-for-channel:
    street -> token_sort, house -> num."""
    street, house = s["token_sort"], s["num"]
    # house cap (optimized.py:703-706): present but poor -> cap 70
    if 0.0 < house < 80.0:
        return min(house, 70.0)
    # street cap (optimized.py:708-710): critical channel poor -> cap 60
    if street < 70.0:
        return min(street, 60.0)

    w = dict(cfg.weights())
    if house == 0.0:
        w["num"] = 0.0  # absent component (reference omits it entirely)
    if s["partial"] == 0.0:
        w["partial"] = 0.0  # optimized.py:712-713 (city score 0)
    use = {k: s[k] for k in w}
    if s["jaccard"] < 50.0:
        use.pop("jaccard")  # optimized.py:714-715

    total_score = 0.0
    total_weight = 0.0
    for name, score in use.items():
        weight = w[name]
        total_score += score * weight
        total_weight += weight
    if total_weight == 0.0:
        return 0.0
    ws = total_score / total_weight

    # post-hoc high-confidence guards (optimized.py:728-735): house must be
    # very good (if present) and street very close to claim high confidence
    if ws > 85.0:
        if 0.0 < house < 90.0:
            ws = min(ws, 75.0)
        if street < 85.0:
            ws = min(ws, 80.0)
    return ws


def assign_tier(conf: float) -> str:
    for name, threshold, _k in TIERS:
        if conf >= threshold:
            return name
    return "none"


def reliability(quality: float) -> str:
    for threshold, band in RELIABILITY_BANDS:
        if quality >= threshold:
            return band
    return "speculative"


def is_exact(
    s: dict[str, float], conf: float, cfg: MatchConfig = DEFAULT_CONFIG
) -> bool:
    """P5 multi-component exact predicate (optimized.py:191-218
    ``MatchResult.exact`` / ``_is_truly_exact``), channel-for-channel:
    similarity -> text, house -> num, street -> token_sort, zip ->
    jaccard. A high confidence alone is NOT exact: each critical channel
    that is present must clear its own minimum."""
    if s["text"] < cfg.exact_similarity_min or conf < 95.0:
        return False
    if 0.0 < s["num"] < cfg.exact_house_min:
        return False
    if s["token_sort"] < cfg.exact_street_min:
        return False
    if 0.0 < s["jaccard"] < cfg.exact_zip_min:
        return False
    return True


def quality_warnings(
    s: dict[str, float],
    conf: float,
    tier: str,
    norm_a: str,
    norm_b: str,
    roles_a: str,
    roles_b: str,
    n_families: int = 1,
) -> tuple[float, str, list[str]]:
    """Quality score + reliability + warnings — the reference's
    ``_calculate_enhanced_quality_score`` (UAM:760-838), post-clamp unit
    bonus (UAM:910-921 — the clamp-order quirk, SURVEY §7.5 risk 4, is
    reproduced deliberately: quality may exceed 100 after the bonus) and
    ``_assess_reliability`` warnings (UAM:845-864).

    Domain recast of the presence bonuses (matched-side components):
      street  +20 <- norm_text_b non-empty
      house   +15 <- norm_text_b contains a digit run
      unit    +30 <- roles_sig_b non-empty; elif struct channel scored, +25
                    (APTNBR/APTTYPE field bonuses are address-index quirks
                    with no transcript analogue — SURVEY §2.8)
      city    +10 <- partial channel informative (s_partial > 0)
      state   +5  <- jaro channel informative (s_jaro > 0)
      zip     +5  <- jaccard channel kept (s_jaccard >= 50)
    es_score  <- 10 x number of blocking families that proposed the pair
                 (the retrieval-signal analogue of the ES _score).
    Preprocessing-issue penalties (UAM:829-836) apply to the QUERY side:
    empty -50, too_short(<10 chars) -30, numeric_only -20.
    """
    base = conf
    if norm_b:
        base += 20.0
    if any(c.isdigit() for c in norm_b):
        base += 15.0
    if roles_b:
        base += 30.0
    elif s["struct"] > 0.0:
        base += 25.0
    if s["partial"] > 0.0:
        base += 10.0
    if s["jaro"] > 0.0:
        base += 5.0
    if s["jaccard"] >= 50.0:
        base += 5.0
    es = 10.0 * float(n_families)
    if es > 0.0:
        base += min(es / 10.0, 20.0)
    if s["text"] > 0.0:
        base += min(s["text"] / 5.0, 15.0)
    base += TIER_ADJUSTMENT.get(tier, -80.0)
    if not norm_a:
        base -= 50.0
    elif len(norm_a) < 10:
        base -= 30.0
    elif norm_a.replace(" ", "").isdigit():
        base -= 20.0
    quality = max(0.0, min(100.0, base))
    # POST-clamp unit bonus (UAM:910-921): query side has a unit analogue
    # and the matched side too -> exact +50 / wrong -20, applied AFTER the
    # [0,100] clamp exactly like the reference
    if roles_a and roles_b:
        quality += 50.0 if roles_a == roles_b else -20.0
    band = reliability(quality)
    warnings: list[str] = []
    if tier in ("phonetic", "keyword", "desperate"):
        warnings.append("low_confidence_level")
    if s["text"] < 50.0:
        warnings.append("low_similarity")
    if es < 5.0:
        warnings.append("low_retrieval_score")
    return quality, band, warnings


def score_pairs_pd(
    docs: pd.DataFrame,
    pairs: pd.DataFrame,
    cfg: MatchConfig = DEFAULT_CONFIG,
) -> pd.DataFrame:
    """Score (conv_id_a, conv_id_b) pairs against featurized docs.

    Returns pairs + component scores + confidence + tier + adjusted
    confidence + quality + reliability + is_match.
    """
    feats = docs.set_index("conv_id")
    fam_counts = (
        [int(len(f)) for f in pairs["families"]]
        if "families" in pairs.columns
        else [1] * len(pairs)
    )
    rows = []
    for a, b, nf in zip(pairs["conv_id_a"], pairs["conv_id_b"], fam_counts):
        fa, fb = feats.loc[a], feats.loc[b]
        na, nb = fa["norm_text"], fb["norm_text"]
        ra, rb = fa["roles_sig"], fb["roles_sig"]
        # P2 required-feature gate (optimized.py:784-793): a doc missing
        # its critical feature cannot link — the reference returns the
        # empty MatchResult (confidence 0, no component scores)
        gated = (cfg.require_text and (not na or not nb)) or (
            cfg.require_roles and (not ra or not rb)
        )
        if gated:
            s = {k: 0.0 for k in ("token_sort", "num", "partial",
                                  "jaccard", "jaro", "struct", "text")}
            conf, tier = 0.0, "none"
            quality, band = 0.0, "speculative"
            warnings = ["empty_critical_feature"]
        else:
            s = component_scores(na, nb, ra, rb, cfg)
            conf = weighted_confidence(s, cfg)
            tier = assign_tier(conf)
            quality, band, warnings = quality_warnings(
                s, conf, tier, na, nb, ra, rb, nf
            )
        adj = max(0.0, conf + TIER_ADJUSTMENT.get(tier, -80.0))
        rows.append(
            {
                "conv_id_a": a,
                "conv_id_b": b,
                **{f"s_{k}": v for k, v in s.items()},
                "confidence": conf,
                "tier": tier,
                "confidence_adjusted": adj,
                "is_exact": (not gated) and is_exact(s, conf, cfg),
                "unit_exact": bool(ra) and ra == rb,
                "quality": quality,
                "reliability": band,
                "warnings": warnings,
                "is_match": (not gated)
                and conf >= cfg.match_tier_threshold
                and s["text"] >= cfg.match_text_floor,
            }
        )
    return pd.DataFrame(rows)


def oracle_labels(
    turns: pd.DataFrame,
    pairs: pd.DataFrame,
    cfg: MatchConfig = DEFAULT_CONFIG,
) -> pd.DataFrame:
    """End-to-end: turns + candidate pairs -> labeled pairs."""
    docs = featurize_pd(canonicalize_pd(turns))
    return score_pairs_pd(docs, pairs, cfg)
