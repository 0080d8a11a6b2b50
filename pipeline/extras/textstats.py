"""Text-analysis operators for training-data curation, over
``documents(doc_id, text, lang, ...)``.

All pure JVM column expressions (whole-stage codegen; no UDFs):

  * token_count        — whitespace tokens + a BPE-ish subword estimate
  * quality_score      — length / punctuation-ratio / stopword-ratio /
                         mean-token-length heuristics composed into [0,100]
  * language_id        — n-gram/stopword-hit heuristic over a small
                         per-language marker list (deterministic, tiny)
  * doc_fingerprint    — md5 content fingerprint + a 64-bit rolling-style
                         hash (xxhash64) for cheap joins
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pipeline.config import STOPWORDS
from pipeline.textnorm import ASCII_WS

# tiny deterministic marker lists (language-ID heuristic; not a model)
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in", "is", "you", "that"],
    "de": ["der", "die", "und", "das", "ist", "nicht", "ich", "ein"],
    "fr": ["le", "la", "les", "et", "est", "une", "que", "pour"],
    "es": ["el", "la", "los", "que", "de", "es", "una", "por"],
}


def tokens_col(text_col: str = "text") -> Column:
    return F.array_remove(
        F.split(
            F.regexp_replace(F.lower(F.col(text_col)), rf"[{ASCII_WS}]+", " "),
            " ",
        ),
        ""
    )


def token_count_col(text_col: str = "text") -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text_col))


def subword_count_col(text_col: str = "text") -> Column:
    """BPE-ish subword estimate: alnum runs + punctuation marks, via a
    regex token class (approximates a byte-level BPE pre-tokenizer)."""
    return F.size(
        F.regexp_extract_all(
            F.col(text_col), F.lit(rf"[A-Za-z0-9]{{1,4}}|[^A-Za-z0-9{ASCII_WS}]"), 0
        )
    )


def punct_ratio_col(text_col: str = "text") -> Column:
    n_punct = F.length(F.regexp_replace(F.col(text_col), r"[^.,;:!?'\"]", ""))
    return n_punct / F.greatest(F.length(F.col(text_col)), F.lit(1))


def stopword_ratio_col(text_col: str = "text") -> Column:
    toks = tokens_col(text_col)
    sw = F.filter(
        toks, lambda t: t.isin(list(STOPWORDS))
    )
    return F.size(sw) / F.greatest(F.size(toks), F.lit(1))


def quality_score_col(text_col: str = "text") -> Column:
    """Composite quality in [0,100] — length band + punctuation sanity +
    stopword presence + mean token length band (heuristics in the spirit
    of C4/Gopher quality filters, expressed as one codegen'd expression)."""
    n_chars = F.length(F.col(text_col))
    toks = tokens_col(text_col)
    n_toks = F.greatest(F.size(toks), F.lit(1))
    mean_tok_len = n_chars / n_toks
    punct = punct_ratio_col(text_col)
    sw_ratio = stopword_ratio_col(text_col)

    length_pts = (
        F.when(n_chars >= 200, F.lit(30.0))
        .when(n_chars >= 50, F.lit(20.0))
        .when(n_chars >= 10, F.lit(10.0))
        .otherwise(F.lit(0.0))
    )
    punct_pts = F.when((punct >= 0.005) & (punct <= 0.15), F.lit(25.0)).otherwise(
        F.lit(5.0)
    )
    sw_pts = F.when(sw_ratio >= 0.05, F.lit(25.0)).otherwise(F.lit(5.0))
    tok_pts = F.when(
        (mean_tok_len >= 3.0) & (mean_tok_len <= 12.0), F.lit(20.0)
    ).otherwise(F.lit(5.0))
    return length_pts + punct_pts + sw_pts + tok_pts


def language_id_col(text_col: str = "text") -> Column:
    """Predicted language = argmax marker-hit count (ties -> first in
    declaration order); 'und' when nothing hits."""
    toks = tokens_col(text_col)
    best_lang = F.lit("und")
    best_hits = F.lit(0)
    for lang, markers in LANG_MARKERS.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(markers)))
        improved = hits > best_hits
        best_lang = F.when(improved, F.lit(lang)).otherwise(best_lang)
        best_hits = F.when(improved, hits).otherwise(best_hits)
    return best_lang


def fingerprint_cols(text_col: str = "text") -> list[Column]:
    return [
        F.md5(F.col(text_col)).alias("fp_md5"),
        F.xxhash64(F.col(text_col)).alias("fp_xx64"),
    ]


def document_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """All stats in one projection (single scan, columns pruned)."""
    return docs.select(
        "doc_id",
        token_count_col(text_col).alias("n_tokens"),
        subword_count_col(text_col).alias("n_subwords"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.round(punct_ratio_col(text_col), 6).alias("punct_ratio"),
        F.round(stopword_ratio_col(text_col), 6).alias("stopword_ratio"),
        quality_score_col(text_col).alias("quality"),
        language_id_col(text_col).alias("lang_pred"),
        *fingerprint_cols(text_col),
    )
