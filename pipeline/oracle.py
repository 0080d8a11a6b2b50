"""Pure-pandas reference-semantics oracle (label generator / parity check).

This is the single-node twin of the Spark pipeline: same normalization
(``pipeline.textnorm``), same similarity kernels (``pipeline.kernels``),
same weighted-confidence formula and tier ladder. The Spark pipeline must
reproduce its match decisions with pairwise F1 >= 0.99 (BASELINE.json).

Channel mapping (transcript <- reference address component), weights from
``optimized.py:115-121``; formula structure from
``_calculate_weighted_confidence`` ``optimized.py:686-737``:

  text       (.40) <- street: 100 if normalized-equal else InDel ratio on
                      normalized canonical text (exact-first, optimized.py:634-639)
  token_sort (.25) <- house:  100 if sorted-token forms equal else
                      token_sort_ratio (reorder-invariant critical channel)
  partial    (.15) <- city:   partial_ratio (truncation tolerant,
                      optimized.py:675-676)
  jaccard    (.10) <- zip:    token-set Jaccard x100; dropped when <50
                      (optimized.py:708-709)
  jaro       (.05) <- state:  Jaro-Winkler x100 on 128-char prefix
  struct     (.05) <- unit:   role-sequence signature similarity

Caps (structure preserved from optimized.py:700-737, remapped to the
critical transcript channel):
  * token_sort < 70        -> confidence = min(token_sort, 60)   (early return)
  * partial == 0           -> partial weight := 0
  * jaccard < 50           -> jaccard channel dropped
  * post-hoc, if ws > 85:  text < 90 -> ws = min(ws, 75);
                           token_sort < 85 -> ws = min(ws, 80)

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
    recovers the exact turn texts in order).
    """
    t = turns.sort_values(["conv_id", "turn_idx"])
    g = t.groupby("conv_id", sort=True)
    docs = pd.DataFrame(
        {
            "canonical_text": g["text"].apply(lambda s: "\x1e".join(s)),
            "n_turns": g["turn_idx"].count().astype("int64"),
            "roles_sig": g["role"].apply(
                lambda s: "".join(x[0] for x in s if x)
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
    sorted_a = " ".join(sorted(a.split()))
    sorted_b = " ".join(sorted(b.split()))
    return {
        "text": 100.0 if a == b else kernels.indel_ratio(a, b),
        "token_sort": 100.0
        if sorted_a == sorted_b
        else kernels.indel_ratio(sorted_a, sorted_b),
        "partial": kernels.partial_ratio(a, b),
        "jaccard": 100.0 * kernels.token_set_jaccard(a, b),
        "jaro": 100.0 * kernels.jaro_winkler(a[:JARO_PREFIX], b[:JARO_PREFIX]),
        "struct": 100.0
        if roles_a == roles_b
        else kernels.indel_ratio(roles_a, roles_b),
    }


def weighted_confidence(
    s: dict[str, float], cfg: MatchConfig = DEFAULT_CONFIG
) -> float:
    """Reference formula (optimized.py:686-737), channels remapped."""
    # critical-channel early return (street cap, optimized.py:704-706)
    if s["token_sort"] < 70.0:
        return min(s["token_sort"], 60.0)

    w = dict(cfg.weights())
    if s["partial"] == 0.0:
        w["partial"] = 0.0
    use = dict(s)
    if s["jaccard"] < 50.0:
        use.pop("jaccard")

    total_score = 0.0
    total_weight = 0.0
    for name, score in use.items():
        weight = w[name]
        total_score += score * weight
        total_weight += weight
    if total_weight == 0.0:
        return 0.0
    ws = total_score / total_weight

    # post-hoc high-confidence guards (optimized.py:728-735)
    if ws > 85.0:
        if s["text"] < 90.0:
            ws = min(ws, 75.0)
        if s["token_sort"] < 85.0:
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
    rows = []
    for a, b in zip(pairs["conv_id_a"], pairs["conv_id_b"]):
        fa, fb = feats.loc[a], feats.loc[b]
        s = component_scores(
            fa["norm_text"], fb["norm_text"], fa["roles_sig"], fb["roles_sig"], cfg
        )
        conf = weighted_confidence(s, cfg)
        tier = assign_tier(conf)
        adj = max(0.0, conf + TIER_ADJUSTMENT.get(tier, -100.0))
        # quality: conf + similarity bonus, clamped (UAM:760-838 simplified
        # to the domain-neutral terms), then reliability bands (UAM:845-854)
        quality = max(0.0, min(100.0, conf + min(s["text"] / 5.0, 15.0)
                               + TIER_ADJUSTMENT.get(tier, -100.0)))
        rows.append(
            {
                "conv_id_a": a,
                "conv_id_b": b,
                **{f"s_{k}": v for k, v in s.items()},
                "confidence": conf,
                "tier": tier,
                "confidence_adjusted": adj,
                "quality": quality,
                "reliability": reliability(quality),
                "is_match": conf >= cfg.match_tier_threshold
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
