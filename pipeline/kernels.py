"""Self-contained string-similarity kernels (reference semantics).

The reference scores components with rapidfuzz (``fuzz.ratio`` at
``optimized.py:656,668,679,682,754``; ``fuzz.token_sort_ratio`` at
``optimized.py:639``; ``fuzz.partial_ratio`` at ``optimized.py:676``).
rapidfuzz is not available in this environment, so the kernels are
reimplemented here from their published definitions:

* ``indel_ratio`` — normalized InDel similarity x100, the exact metric of
  ``fuzz.ratio``: ``(1 - indel_distance/(len_a+len_b)) * 100`` where the
  InDel distance is Levenshtein with substitutions forbidden, i.e.
  ``len_a + len_b - 2*LCS``. Computed with the bit-parallel LCS algorithm
  (Hyyro 2004, "Bit-parallel LCS-length computation revisited") using Python
  big-int bitmasks — O(len_a/64 * len_b) word ops, no per-cell DP.
* ``token_sort_ratio`` — whitespace-tokenize, sort, rejoin, indel_ratio.
* ``partial_ratio`` — classic fuzzywuzzy algorithm: align the shorter string
  against candidate windows of the longer chosen from SequenceMatcher
  matching blocks, take the max windowed indel_ratio.
* ``jaro_winkler`` — standard Jaro-Winkler (prefix cap 4, scaling 0.1,
  no boost threshold — rapidfuzz default).
* ``token_set_jaccard`` — |A∩B| / |A∪B| over whitespace token sets.

These functions are THE single source of truth for match semantics: the
Spark pandas UDFs (``pipeline.scoring``) and the pure-pandas oracle
(``pipeline.oracle``) both call them, which pins the pipeline to the oracle
bit-for-bit (SURVEY.md §7.5 risk 2).
"""

from __future__ import annotations

import re
from functools import lru_cache

_DIGIT_RE = re.compile(r"\d+")


@lru_cache(maxsize=16384)
def sorted_form(s: str) -> str:
    """Sorted-token form (token_sort input). Cached per doc text: in
    blocked scoring the same document recurs across many candidate
    pairs — the sort is paid once per doc, not once per pair."""
    return " ".join(sorted(s.split()))


@lru_cache(maxsize=16384)
def token_set(s: str) -> frozenset[str]:
    """Whitespace token set, cached per doc text."""
    return frozenset(s.split())


@lru_cache(maxsize=16384)
def digit_sig(s: str) -> str:
    """Digit-run signature — the house-number analogue: every ``\\d+`` run
    of the normalized text joined by single spaces, in order. Empty when
    the text has no digits (channel absent, like an address without a
    house number)."""
    return " ".join(_DIGIT_RE.findall(s))


@lru_cache(maxsize=16384)  # ~4KB/entry at 300-char texts -> ~64MB/worker
def _match_masks(a: str) -> tuple[dict[str, int], int]:
    """Per-string char->bitmask table for the bit-parallel LCS. Cached:
    in blocked pair scoring the same document text recurs across many
    candidate pairs, and partial_ratio slides many windows against one
    fixed shorter string."""
    masks: dict[str, int] = {}
    bit = 1
    for ch in a:
        masks[ch] = masks.get(ch, 0) | bit
        bit <<= 1
    return masks, (1 << len(a)) - 1


def lcs_length(a: str, b: str) -> int:
    """Length of the longest common subsequence, bit-parallel.

    Hyyro's bit-vector LCS: maintain V (len_a bits, initially all ones);
    for each char of b with match-mask M: t = V & M; V = (V + t) | (V - t).
    LCS = number of zero bits in V.
    """
    la = len(a)
    if la == 0 or len(b) == 0:
        return 0
    masks, full = _match_masks(a)
    v = full
    for ch in b:
        m = masks.get(ch)
        if m:
            t = v & m
            v = ((v + t) | (v - t)) & full
    # zeros in v within la bits = LCS length
    return la - bin(v).count("1")


def indel_distance(a: str, b: str) -> int:
    """InDel distance = Levenshtein with substitutions forbidden."""
    return len(a) + len(b) - 2 * lcs_length(a, b)


def indel_ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.ratio`` semantics: normalized InDel similarity x100."""
    if a == b:
        return 100.0
    total = len(a) + len(b)
    if total == 0:
        return 100.0
    if not a or not b:
        return 0.0
    return 100.0 * (1.0 - indel_distance(a, b) / total)


def token_sort_ratio(a: str, b: str) -> float:
    """rapidfuzz ``fuzz.token_sort_ratio``: sort whitespace tokens, ratio.
    Reuses the cached canonical ``sorted_form`` (one definition, one
    lru cache) instead of a second inline copy of the sort idiom."""
    return indel_ratio(sorted_form(a), sorted_form(b))


def partial_windows(shorter: str, longer: str) -> list[int]:
    """Sorted candidate window starts for ``partial_ratio`` — the two
    extremes (prefix-/suffix-aligned) plus anchor 8-grams sampled at 5
    fixed offsets of the shorter string located via ``str.find``. Shared
    by the per-pair kernel below and the numpy batch path
    (``pipeline.kernels_batch``) so both score the SAME window set."""
    ls, ll = len(shorter), len(longer)
    starts = {0, ll - ls}
    for off in (0, ls // 4, ls // 2, (3 * ls) // 4, max(ls - 8, 0)):
        gram = shorter[off : off + 8]
        pos = longer.find(gram)
        if pos >= 0:
            starts.add(min(max(pos - off, 0), ll - ls))
    return sorted(starts)


def partial_ratio(a: str, b: str) -> float:
    """Best-window ratio of the shorter string inside the longer — a
    SPEC'd bounded-window kernel (this docstring IS the definition; the
    committed golden data pins it, tests/test_kernels_golden_external.py,
    including its measured divergence from the exhaustive all-alignments
    definition: one pathological reversed-needle case in 50).

    difflib-based block discovery costs O(n*m) on long similar strings
    (measured 44 ms/pair at ~1.3k chars — the scoring hot-path killer);
    instead, candidate window starts come from ``partial_windows``:
      * the two extremes (prefix-aligned, suffix-aligned), and
      * anchor 8-grams sampled at 5 fixed offsets of the shorter string,
        located in the longer via str.find (C-speed).
    Each candidate window is scored with the exact bit-parallel InDel
    ratio; worst case ~7 windows. Deterministic; shared verbatim by the
    Spark UDF and the pandas oracle.

    Measured divergence from the exhaustive all-alignments definition
    (tests/test_partial_divergence.py, 10k seeded pairs): EXACT on every
    structured pair — truncations, middle slices, reversals, token
    shuffles, <=8-char edits (an anchor 8-gram always lands when a real
    alignment exists). Divergence occurs only on UNRELATED-text pairs
    (~69% of those), always as an UNDERSHOOT, always inside the noise
    band (exhaustive value < 62 on every divergent pair, vs the 70
    similarity threshold), max undershoot ~20 points (~3 confidence
    points through the .15 channel weight).
    """
    if a == b:
        return 100.0
    if not a or not b:
        return 0.0
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    ls, ll = len(shorter), len(longer)
    if ls == ll:
        return indel_ratio(shorter, longer)

    best = 0.0
    for start in partial_windows(shorter, longer):
        window = longer[start : start + ls]
        score = indel_ratio(shorter, window)
        if score > best:
            best = score
            if best >= 100.0:
                break
    return best


@lru_cache(maxsize=16384)
def _char_positions(b: str) -> dict[str, list[int]]:
    pos: dict[str, list[int]] = {}
    for j, ch in enumerate(b):
        pos.setdefault(ch, []).append(j)
    return pos


def jaro(a: str, b: str) -> float:
    """Standard Jaro similarity in [0, 1].

    O(la + lb) cursor formulation of the classic flag-array greedy: the
    greedy picks, for each a[i] in order, the smallest unused j in
    [i-window, i+window] with b[j]==a[i]. Because the window's lower
    bound is non-decreasing in i, a per-character cursor over b's
    position lists visits each position once — same matches, same
    transposition count as the textbook double loop (pinned bit-for-bit
    by tests/test_kernels_golden_external.py against the textbook DP
    implementation)."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    match_window = max(la, lb) // 2 - 1
    if match_window < 0:
        match_window = 0
    positions = _char_positions(b)
    cursors: dict[str, int] = {}
    a_match_chars: list[str] = []
    b_match_js: list[int] = []
    for i, ch in enumerate(a):
        plist = positions.get(ch)
        if plist is None:
            continue
        c = cursors.get(ch, 0)
        n = len(plist)
        lo = i - match_window
        while c < n and plist[c] < lo:
            c += 1
        if c < n and plist[c] <= i + match_window:
            a_match_chars.append(ch)
            b_match_js.append(plist[c])
            c += 1
        cursors[ch] = c
    m = len(a_match_chars)
    if m == 0:
        return 0.0
    transpositions = 0
    for ch, j in zip(a_match_chars, sorted(b_match_js)):
        if ch != b[j]:
            transpositions += 1
    t = transpositions / 2
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler(a: str, b: str, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler in [0, 1]; common-prefix cap 4, no boost threshold."""
    j = jaro(a, b)
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca == cb:
            prefix += 1
        else:
            break
    return j + prefix * prefix_weight * (1.0 - j)


def token_set_jaccard(a: str, b: str) -> float:
    """Jaccard over whitespace token sets, in [0, 1]."""
    sa, sb = token_set(a), token_set(b)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


_SOUNDEX_CODES = {
    **dict.fromkeys("BFPV", "1"),
    **dict.fromkeys("CGJKQSXZ", "2"),
    **dict.fromkeys("DT", "3"),
    "L": "4",
    **dict.fromkeys("MN", "5"),
    "R": "6",
}


def soundex(s: str) -> str:
    """Reference soundex, reproduced EXACTLY (optimized.py:235-251).

    The reference variant differs from standard/Spark ``F.soundex``:
    vowels and H/W are skipped without breaking runs (so codes repeated
    across any separator collapse — standard soundex only collapses
    across H/W), the first letter's own code is never suppressed, and
    empty input returns "0000". We match the reference bit-for-bit
    (SURVEY.md §2.7 F5: "verify parity on edge cases; else own kernel").
    """
    if not s:
        return "0000"
    s = s.upper()
    out = s[0]
    for ch in s[1:]:
        code = _SOUNDEX_CODES.get(ch)
        if code and code != out[-1]:
            out += code
    return out[:4].ljust(4, "0")


def ngrams(s: str, n: int = 3) -> set[str]:
    """Character n-gram shingle set (for n-gram Jaccard dedup)."""
    if len(s) < n:
        return {s} if s else set()
    return {s[i : i + n] for i in range(len(s) - n + 1)}


def ngram_jaccard(a: str, b: str, n: int = 3) -> float:
    sa, sb = ngrams(a, n), ngrams(b, n)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)
