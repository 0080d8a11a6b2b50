"""partial_ratio SPEC vs exhaustive all-alignments: measured divergence
bound over 10k seeded synthetic pairs (round-2 VERDICT 'what's missing'
#1: the divergence RATE on realistic pairs was unmeasured).

The engine's kernel is a SPEC'd bounded-window variant (extremes +
anchor 8-grams; pipeline/kernels.py docstring). This property test pins
its relationship to the exhaustive definition:

  * On every STRUCTURED pair — truncation (the channel's use case),
    middle slice, character reversal, token shuffle, <=8 char edits —
    spec == exhaustive EXACTLY (an anchor 8-gram always lands when a
    real alignment exists): 0 divergent pairs in ~8.3k.
  * Divergence is confined to UNRELATED-text pairs (~69% of them), where
    NO window aligns: both values sit in the noise band — every
    divergent pair's exhaustive value measured < 62, far below the 70
    similarity threshold — and the spec only ever UNDERSHOOTS (a lower
    score for unrelated text). Max undershoot measured ~20 points; via
    the .15 city-channel weight that is <= 3 confidence points on pairs
    that are unrelated anyway.

The exhaustive side scans every full-length window with the batch InDel
kernel (itself pinned bit-equal to the per-pair kernel and to the
independent golden DP data) — shared-window-set tautology is broken by
enumerating ALL starts here, not the spec's candidate set.
"""

from __future__ import annotations

import random

import numpy as np

from pipeline import kernels
from pipeline.kernels_batch import batch_indel_distance

VOCAB = [
    "alpha", "bravo", "charlie", "delta", "echo", "fox", "golf", "hotel",
    "india", "jul", "kilo", "lima", "mike", "nov", "oscar", "papa",
    "quebec", "rom", "sierra", "tango", "uni", "victor", "whiskey",
    "xray", "yankee", "zulu", "12", "345", "6789", "order", "refund",
    "help", "account", "login", "ship", "track", "cancel", "item",
]

N_PAIRS = 10_000
NOISE_BAND_CEILING = 70.0  # min_similarity_threshold: no decision power
MAX_DELTA = 25.0           # measured max undershoot ~20, margin to 25


def _gen_pairs(seed: int = 20260816):
    rng = random.Random(seed)

    def doc(n: int) -> str:
        return " ".join(rng.choice(VOCAB) for _ in range(n))

    pairs, kinds = [], []
    for _ in range(N_PAIRS):
        base = doc(rng.randint(10, 80))
        kind = rng.randrange(6)
        if kind == 0:  # truncation — the partial channel's reason to exist
            cut = rng.randint(5, max(6, len(base) // 2))
            other = base[cut:] if rng.random() < 0.5 else base[: len(base) - cut]
        elif kind == 1:  # middle slice
            i = rng.randint(0, len(base) // 3)
            j = rng.randint(2 * len(base) // 3, len(base))
            other = base[i:j]
        elif kind == 2:  # full character reversal
            other = base[::-1]
        elif kind == 3:  # token shuffle
            t = base.split()
            rng.shuffle(t)
            other = " ".join(t)
        elif kind == 4:  # up to 8 random character edits
            s = list(base)
            for _ in range(rng.randint(1, 8)):
                p = rng.randrange(len(s))
                s[p] = rng.choice("abcdefgh ")
            other = "".join(s)
        else:  # unrelated text
            other = doc(rng.randint(10, 80))
        pairs.append((base, other))
        kinds.append("unrelated" if kind == 5 else "structured")
    return pairs, kinds


def _exhaustive_partial(pairs) -> np.ndarray:
    jobs_a, jobs_b, slots = [], [], []
    out = np.zeros(len(pairs))
    for idx, (a, b) in enumerate(pairs):
        if a == b:
            out[idx] = 100.0
            continue
        s, l = (a, b) if len(a) <= len(b) else (b, a)
        ls, ll = len(s), len(l)
        hit = False
        for st in range(ll - ls + 1):
            w = l[st : st + ls]
            if s == w:
                out[idx] = 100.0
                hit = True
                break
            jobs_a.append(s)
            jobs_b.append(w)
            slots.append(idx)
        if hit:
            continue
    if jobs_a:
        dist = batch_indel_distance(jobs_a, jobs_b)
        tot = np.array(
            [len(x) + len(y) for x, y in zip(jobs_a, jobs_b)], dtype=np.float64
        )
        np.maximum.at(out, np.array(slots), 100.0 * (1.0 - dist / tot))
    return out


def test_partial_ratio_divergence_bound():
    pairs, kinds = _gen_pairs()
    exhaustive = _exhaustive_partial(pairs)
    spec = np.array([kernels.partial_ratio(a, b) for a, b in pairs])
    delta = exhaustive - spec

    # the spec never OVERSHOOTS the exhaustive definition (its windows
    # are a subset of all windows)
    assert (delta >= -1e-9).all()

    structured = np.array([k == "structured" for k in kinds])
    # bound 1: structured pairs — truncations, slices, reversals,
    # shuffles, edits — are EXACT (0 divergent pairs)
    assert (delta[structured] <= 1e-9).all(), (
        f"{(delta[structured] > 1e-9).sum()} structured pairs diverged; "
        f"max delta {delta[structured].max():.2f}"
    )

    # bound 2: every divergent (unrelated) pair sits in the noise band
    divergent = delta > 1e-9
    if divergent.any():
        assert exhaustive[divergent].max() < NOISE_BAND_CEILING
        assert delta.max() < MAX_DELTA
