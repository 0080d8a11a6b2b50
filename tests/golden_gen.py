"""Golden-data generator for the similarity kernels.

INDEPENDENT implementations of the published algorithms — textbook
O(n*m) dynamic programming, no code shared with ``pipeline.kernels``
(which uses bit-parallel LCS, a bounded-window partial ratio, and a
flag-array Jaro). Run once, output committed as
``tests/data/golden_kernels.json``; ``test_kernels_golden_external.py``
pins the kernels against it.

    python tests/golden_gen.py   # regenerates the JSON (should be a no-op)

For ``partial_ratio`` the golden file stores BOTH:
  * ``partial_exact``  — the all-alignments definition: max InDel ratio of
    the shorter string against EVERY full-length window of the longer
    (the published fuzzywuzzy/rapidfuzz semantics, exhaustive).
  * ``partial_spec``   — the engine's documented bounded-window spec
    (extreme alignments + anchor-located windows), computed here by an
    independent re-implementation of that spec.
The engine must equal ``partial_spec`` everywhere and may fall below
``partial_exact`` only on the explicitly-listed divergence cases.
"""

from __future__ import annotations

import json
import os


# ---- independent reference implementations (textbook DP) -------------------


def lcs_dp(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        ai = a[i - 1]
        for j in range(1, lb + 1):
            if ai == b[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    return prev[lb]


def indel_ratio_ref(a: str, b: str) -> float:
    if a == b:
        return 100.0
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    if not a or not b:
        return 0.0
    dist = total - 2 * lcs_dp(a, b)
    return 100.0 * (1.0 - dist / total)


def token_sort_ref(a: str, b: str) -> float:
    return indel_ratio_ref(
        " ".join(sorted(a.split())), " ".join(sorted(b.split()))
    )


def partial_exact_ref(a: str, b: str) -> float:
    """All-alignments partial ratio: every full-length window scanned."""
    if a == b:
        return 100.0
    if not a or not b:
        return 0.0
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    ls, ll = len(shorter), len(longer)
    if ls == ll:
        return indel_ratio_ref(shorter, longer)
    return max(
        indel_ratio_ref(shorter, longer[start : start + ls])
        for start in range(ll - ls + 1)
    )


def partial_spec_ref(a: str, b: str) -> float:
    """Independent re-implementation of the engine's bounded-window SPEC
    (pipeline/kernels.py partial_ratio docstring): candidate starts =
    two extremes + anchor 8-grams at 5 fixed offsets located via find."""
    if a == b:
        return 100.0
    if not a or not b:
        return 0.0
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    ls, ll = len(shorter), len(longer)
    if ls == ll:
        return indel_ratio_ref(shorter, longer)
    starts = {0, ll - ls}
    for off in (0, ls // 4, ls // 2, (3 * ls) // 4, max(ls - 8, 0)):
        gram = shorter[off : off + 8]
        pos = longer.find(gram)
        if pos >= 0:
            starts.add(min(max(pos - off, 0), ll - ls))
    return max(
        indel_ratio_ref(shorter, longer[s : s + ls]) for s in sorted(starts)
    )


def jaro_ref(a: str, b: str) -> float:
    """Textbook Jaro (Winkler 1990 formulation)."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    window = max(max(la, lb) // 2 - 1, 0)
    matched_b = set()
    a_matches, b_matches = [], []
    for i in range(la):
        for j in range(max(0, i - window), min(lb, i + window + 1)):
            if j not in matched_b and a[i] == b[j]:
                matched_b.add(j)
                a_matches.append(i)
                break
    if not a_matches:
        return 0.0
    b_order = sorted(matched_b)
    transpositions = sum(
        1 for i, j in zip(a_matches, b_order) if a[i] != b[j]
    ) / 2
    m = len(a_matches)
    return (m / la + m / lb + (m - transpositions) / m) / 3.0


def jaro_winkler_ref(a: str, b: str) -> float:
    j = jaro_ref(a, b)
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * 0.1 * (1.0 - j)


def jaccard_ref(a: str, b: str) -> float:
    sa, sb = set(a.split()), set(b.split())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# ---- case corpus ------------------------------------------------------------

CASES: list[tuple[str, str, str]] = [
    # (name, a, b)
    ("identical", "hello world", "hello world"),
    ("empty_both", "", ""),
    ("empty_one", "hello", ""),
    ("single_char", "a", "b"),
    ("single_eq", "a", "a"),
    ("typo", "the quick brown fox", "the quikc brown fox"),
    ("case_insensitivity_not", "Hello", "hello"),
    ("token_swap", "alpha beta gamma delta", "delta gamma beta alpha"),
    ("truncate_half", "one two three four five six seven eight", "one two three four"),
    ("substring_mid", "xxxxx target phrase yyyyy", "target phrase"),
    ("substring_end", "prefix padding then the payload", "the payload"),
    ("substring_start", "the payload then suffix padding", "the payload"),
    ("repeat_blocks", "ab" * 30, "ba" * 30),
    ("disjoint", "aaaaaaa", "bbbbbbb"),
    ("transposition", "martha", "marhta"),
    ("jaro_classic", "dixon", "dicksonx"),
    ("jaro_prefix", "prefixed string one", "prefixed string two"),
    ("unicode", "héllo wörld", "hello world"),
    ("whitespace_heavy", "a  b   c", "a b c"),
    ("numbers", "order 12345 confirmed", "order 12354 confirmed"),
    ("long_vs_short", "w " * 200 + "needle in here", "needle in here"),
    # adversarial partial_ratio: the best window is NOT at an anchor or
    # extreme — misleading 8-grams appear early in the longer string
    (
        "adversarial_anchor_decoy",
        "abcdefgh".join(["zz", "qq", "kk"]),
        "abcdefgh" + "x" * 40 + "zzabcdefghqqabcdefghkk" + "y" * 40,
    ),
    (
        "adversarial_no_gram_hit",
        "a1b2c3d4e5f6g7h8",
        "x" * 20 + "a1b2c3d4e5f6g7h8"[::-1] + "x" * 20,
    ),
    (
        "adversarial_shifted_window",
        "the needle text body here",
        "x" * 33 + "the needle text body here" + "y" * 51,
    ),
    ("near_dup_sentence",
     "customer asked about refund policy for damaged items",
     "customer asked about the refund policy for damaged item"),
    ("rotated", "one two three four five", "four five one two three"),
    ("padded_typo", "z" * 25 + "the quick brown fox" + "z" * 25,
     "the quikc brown fox"),
    ("all_same_char", "aaaaaaaaaa", "aaaa"),
    ("interleave", "abcdefghij", "aXbXcXdXeXfXgXhXiXj"),
    ("html_ish", "<p>hello <b>world</b></p>", "hello world"),
]
# a sweep of deterministic pseudo-random word pairs (no RNG state — fixed
# congruential sequence so regeneration is reproducible forever)
_WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
          "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]
for k in range(20):
    x = (k * 2654435761) % (1 << 32)
    wa = [_WORDS[(x >> (2 * i)) % len(_WORDS)] for i in range(8)]
    wb = list(wa)
    if k % 3 == 0:
        wb[k % 8] = _WORDS[(k * 7 + 3) % len(_WORDS)]  # one word swapped
    if k % 3 == 1:
        wb = wb[: 4 + (k % 4)]  # truncated
    if k % 3 == 2:
        wb = wb[::-1]  # reversed order
    CASES.append((f"sweep_{k:02d}", " ".join(wa), " ".join(wb)))


def generate() -> list[dict]:
    rows = []
    for name, a, b in CASES:
        rows.append(
            {
                "name": name,
                "a": a,
                "b": b,
                "indel_ratio": indel_ratio_ref(a, b),
                "token_sort_ratio": token_sort_ref(a, b),
                "partial_exact": partial_exact_ref(a, b),
                "partial_spec": partial_spec_ref(a, b),
                "jaro": jaro_ref(a, b),
                "jaro_winkler": jaro_winkler_ref(a, b),
                "token_set_jaccard": jaccard_ref(a, b),
            }
        )
    return rows


if __name__ == "__main__":
    out = os.path.join(os.path.dirname(__file__), "data", "golden_kernels.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(generate(), f, indent=1)
    print(f"wrote {out}: {len(CASES)} cases")
