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

from difflib import SequenceMatcher


def lcs_length(a: str, b: str) -> int:
    """Length of the longest common subsequence, bit-parallel.

    Hyyro's bit-vector LCS: maintain V (len_a bits, initially all ones);
    for each char of b with match-mask M: t = V & M; V = (V + t) | (V - t).
    LCS = number of zero bits in V.
    """
    la = len(a)
    if la == 0 or len(b) == 0:
        return 0
    # Match masks: bit i set in masks[c] iff a[i] == c.
    masks: dict[str, int] = {}
    bit = 1
    for ch in a:
        masks[ch] = masks.get(ch, 0) | bit
        bit <<= 1
    full = (1 << la) - 1
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
    """rapidfuzz ``fuzz.token_sort_ratio``: sort whitespace tokens, ratio."""
    sa = " ".join(sorted(a.split()))
    sb = " ".join(sorted(b.split()))
    return indel_ratio(sa, sb)


def partial_ratio(a: str, b: str) -> float:
    """Best-window ratio of the shorter string inside the longer.

    Classic fuzzywuzzy algorithm (which rapidfuzz's partial_ratio refines):
    candidate window starts come from SequenceMatcher matching blocks;
    score = max indel_ratio(shorter, window).
    """
    if a == b:
        return 100.0
    if not a or not b:
        return 0.0
    shorter, longer = (a, b) if len(a) <= len(b) else (b, a)
    if len(shorter) == len(longer):
        return indel_ratio(shorter, longer)
    sm = SequenceMatcher(None, shorter, longer, autojunk=False)
    best = 0.0
    seen: set[int] = set()
    for i, j, _size in sm.get_matching_blocks():
        start = max(j - i, 0)
        if start in seen:
            continue
        seen.add(start)
        window = longer[start : start + len(shorter)]
        score = indel_ratio(shorter, window)
        if score > best:
            best = score
            if best >= 100.0:
                break
    return best


def jaro(a: str, b: str) -> float:
    """Standard Jaro similarity in [0, 1]."""
    la, lb = len(a), len(b)
    if la == 0 and lb == 0:
        return 1.0
    if la == 0 or lb == 0:
        return 0.0
    match_window = max(la, lb) // 2 - 1
    if match_window < 0:
        match_window = 0
    a_flags = [False] * la
    b_flags = [False] * lb
    matches = 0
    for i, ch in enumerate(a):
        lo = max(0, i - match_window)
        hi = min(lb, i + match_window + 1)
        for j in range(lo, hi):
            if not b_flags[j] and b[j] == ch:
                a_flags[i] = True
                b_flags[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    transpositions = 0
    k = 0
    for i in range(la):
        if a_flags[i]:
            while not b_flags[k]:
                k += 1
            if a[i] != b[k]:
                transpositions += 1
            k += 1
    t = transpositions / 2
    m = matches
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
    sa, sb = set(a.split()), set(b.split())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


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
