"""Text normalization chain (reference: ``AddressNormalizer.normalize``,
``optimized.py:271-304``).

The reference chain: unidecode -> lower -> strip chars outside [\\w\\s\\-#/]
-> collapse whitespace -> word-boundary abbreviation replacement -> collapse
ordinal suffixes ``(\\d+)(st|nd|rd|th|ht|tt|thh|ndd|rdd|h|t)`` -> ``\\1``
(note the reference deliberately includes typo suffixes).

We keep the full chain, domain-neutral: the street/direction abbreviation
dictionaries (``optimized.py:259-269``) are NYC address vocabulary and are
NOT ported (SURVEY.md §7.6); the rest of the chain is payload-agnostic and
is reproduced exactly.

The chain is declared as DATA (ordered regex/replacement steps + an ASCII
fold table) so that:
  * ``normalize_py`` (used by the pandas oracle) and
  * ``pipeline.normalize.norm_text_col`` (Spark Column expressions) and
  * the DuckDB oracle SQL in ``__spark_entry__.py``
are provably the same transformation.
"""

from __future__ import annotations

import re

# ASCII fold for common Latin accents (unidecode-lite; deterministic 1:1 so
# it is expressible as F.translate on the Spark side and translate() in
# DuckDB). Multi-char expansions (ae, ss) are handled as explicit regex
# steps because translate is 1:1.
ACCENT_SRC = "àáâãäåçèéêëìíîïñòóôõöøùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖØÙÚÛÜÝ"
ACCENT_DST = "aaaaaaceeeeiiiinoooooouuuuyyAAAAAACEEEEIIIINOOOOOOUUUUY"

# Multi-char folds applied before the 1:1 translate.
MULTI_FOLDS: list[tuple[str, str]] = [
    ("æ", "ae"),
    ("Æ", "AE"),
    ("œ", "oe"),
    ("Œ", "OE"),
    ("ß", "ss"),
    # U+0130 LATIN CAPITAL LETTER I WITH DOT ABOVE is the ONE BMP
    # codepoint where the three engines' lower() disagrees: Python/Java
    # emit 'i' + combining dot (U+0307, later folded to a space by the
    # char-class step) while DuckDB emits plain 'i' — 'İstanbul' would
    # normalize differently per engine (round-5 review, full-BMP scan).
    # Pre-folding to ASCII 'I' BEFORE lower() pins all three.
    ("İ", "I"),
]

# Explicit ASCII-whitespace character list (the INNER part of a character
# class — use as f"[{ASCII_WS}]"). Java regex \s is [ \t\n\x0B\f\r] and
# Python re.ASCII \s matches it, but RE2 (DuckDB) \s omits \x0B — so any
# pattern shared across the three engines must spell the class out
# (round-3 ADVICE). All three parse the \t \n \r \f \x0B escapes.
ASCII_WS = r" \t\n\r\f\x0B"

# Ordered regex steps applied AFTER fold+lower. Tuples are
# (java_and_re2_compatible_pattern, replacement). Patterns restricted to the
# common subset of Java regex (Spark), RE2 (DuckDB) and Python re.
REGEX_STEPS: list[tuple[str, str]] = [
    # replace everything outside word chars, whitespace, -, #, / with a
    # space (optimized.py:284). Whitespace is the explicit ASCII_WS class,
    # not \s — RE2's \s omits \x0B (round-3 ADVICE)
    (rf"[^\w{ASCII_WS}\-#/]", " "),
    # collapse whitespace (optimized.py:285)
    (rf"[{ASCII_WS}]+", " "),
    # collapse ordinal suffixes incl. the reference's typo set
    # (optimized.py:295)
    (r"\b(\d+)[-_]?(st|nd|rd|th|ht|tt|thh|ndd|rdd|h|t)\b", "$1"),
]

_TRANSLATE = str.maketrans(ACCENT_SRC, ACCENT_DST)


def normalize_py(s: str | None) -> str:
    """Pure-Python normalization — oracle-side twin of the Spark chain."""
    if s is None:
        return ""
    for src, dst in MULTI_FOLDS:
        s = s.replace(src, dst)
    s = s.translate(_TRANSLATE)
    s = s.lower()
    for pattern, repl in REGEX_STEPS:
        # re.ASCII pins \w \s \b to ASCII semantics — matching Java regex
        # (Spark) and RE2 (DuckDB) defaults, so all three engines agree.
        s = re.sub(pattern, repl.replace("$1", r"\1"), s, flags=re.ASCII)
    return s.strip()


def normalize_unit_py(s: str | None) -> str:
    """Reference ``normalize_unit`` (optimized.py:308-314): lower, drop
    spaces, strip leading apt/unit/ste/suite/# prefixes, upper."""
    if not s:
        return ""
    s = s.lower().replace(" ", "")
    s = re.sub(r"^(apt|unit|ste|suite|#)+", "", s)
    return s.upper()


def tokens_py(norm: str) -> list[str]:
    return norm.split()
