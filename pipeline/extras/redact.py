"""PII-style redaction + repetition/boilerplate signals for training-data
curation, over ``documents(doc_id, text, ...)``.

A 100-TB pretraining pipeline scrubs obvious PII carriers (emails, URLs,
IPs, long digit runs) and filters boilerplate by repetition signals
(Gopher-style duplicate-line fraction / most-frequent-token fraction)
BEFORE tokenization. Both are pure JVM column expressions here — no
Python on the path, whole-stage codegen, trivially scale-linear — and
every regex sticks to the Java-regex ∩ RE2 ∩ Python common subset (no
alternation ambiguity, no lookaround, no backrefs) so the DuckDB oracle
reproduces the EXACT redacted text (contract query ``redact_stats``
compares md5 of the redacted output).

Order matters and is part of the spec: URL first (a URL may embed an
email-like or digit-run substring), then EMAIL, then IPv4, then digit
runs. Each tag is angle-bracketed so a second pass cannot re-match.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pipeline.textnorm import ASCII_WS

# (name, pattern, tag) — applied IN ORDER; patterns are Java/RE2/Python
# common-subset (greedy quantifiers only, no alternation, no lookaround).
# Whitespace is the explicit ASCII_WS class, not \s: Java's \s includes
# \x0B, RE2's does not, so \s would diverge Spark vs the DuckDB oracle on
# a document containing a vertical tab (round-3 ADVICE).
REDACT_RULES: list[tuple[str, str, str]] = [
    ("url", rf"https?://[^{ASCII_WS}]+", "<URL>"),
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("num", r"\b\d{7,}\b", "<ID>"),
]


def redact_text_col(text_col: str = "text") -> Column:
    """Redacted text: the rule chain applied in order."""
    out = F.col(text_col)
    for _name, pattern, tag in REDACT_RULES:
        out = F.regexp_replace(out, pattern, tag)
    return out


def redact_count_cols(text_col: str = "text") -> list[Column]:
    """One LONG count column per rule (n_url, n_email, n_ip, n_num),
    counted on the PRE-redaction text but after earlier rules applied —
    i.e. what each rule actually replaced, so counts sum consistently."""
    cols = []
    cur = F.col(text_col)
    for name, pattern, tag in REDACT_RULES:
        cols.append(F.regexp_count(cur, F.lit(pattern)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pattern, tag)
    return cols


def _lines(text_col: str) -> Column:
    return F.split(F.col(text_col), "\n")


def dup_line_frac_col(text_col: str = "text") -> Column:
    """Gopher-style duplicate-line fraction: 1 - distinct/total lines."""
    lines = _lines(text_col)
    return (
        F.lit(1.0)
        - F.size(F.array_distinct(lines)) / F.greatest(F.size(lines), F.lit(1))
    )


def top_token_frac_col(text_col: str = "text") -> Column:
    """Fraction of tokens taken by the single most frequent token
    (boilerplate flag when high). O(distinct x tokens) per doc via
    higher-order functions — fine for natural documents (hundreds of
    tokens); a corpus of pathological million-token docs should compute
    this via explode + groupBy instead."""
    # THE tokenization idiom lives in textstats.tokens_col (round-5
    # review: three hand-maintained copies of the same expression)
    from pipeline.extras.textstats import tokens_col

    toks = tokens_col(text_col)
    counts = F.transform(
        F.array_distinct(toks),
        lambda d: F.size(F.filter(toks, lambda t: t == d)),
    )
    return F.when(F.size(toks) == 0, F.lit(0.0)).otherwise(
        F.array_max(counts) / F.size(toks)
    )
