"""Stage 2a — normalization as pure JVM Column expressions.

Spark twin of ``pipeline.textnorm.normalize_py`` (reference chain
``optimized.py:271-304``). Both sides are generated from the SAME data
(``MULTI_FOLDS``, ``ACCENT_SRC/DST``, ``REGEX_STEPS``) so they cannot
drift. ``norm_sql_duckdb`` renders the identical chain as a DuckDB SQL
expression for the driver's oracle contract.

Everything here is whole-stage-codegen-friendly (lower / translate /
regexp_replace) — no Python on the hot path (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pipeline.textnorm import ACCENT_DST, ACCENT_SRC, MULTI_FOLDS, REGEX_STEPS


def norm_text_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    c = F.coalesce(c, F.lit(""))
    for src, dst in MULTI_FOLDS:
        c = F.replace(c, F.lit(src), F.lit(dst))
    c = F.translate(c, ACCENT_SRC, ACCENT_DST)
    c = F.lower(c)
    for pattern, repl in REGEX_STEPS:
        c = F.regexp_replace(c, pattern, repl)  # Java regex: $1 backrefs
    return F.trim(c)


def norm_unit_col(col: Column | str) -> Column:
    """Reference ``normalize_unit`` (optimized.py:308-314) as a Column:
    lower, drop spaces, strip leading apt/unit/ste/suite/# prefixes,
    upper. Twin of ``textnorm.normalize_unit_py``."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.replace(F.lower(F.coalesce(c, F.lit(""))), F.lit(" "), F.lit(""))
    c = F.regexp_replace(c, r"^(apt|unit|ste|suite|#)+", "")
    return F.upper(c)


def norm_sql_duckdb(expr: str) -> str:
    """Render the same chain as a DuckDB SQL scalar expression over
    ``expr``. DuckDB regexp_replace needs the 'g' flag for global
    replacement and \\1-style backrefs (RE2)."""
    out = f"coalesce({expr}, '')"
    for src, dst in MULTI_FOLDS:
        out = f"replace({out}, '{src}', '{dst}')"
    out = f"translate({out}, '{ACCENT_SRC}', '{ACCENT_DST}')"
    out = f"lower({out})"
    for pattern, repl in REGEX_STEPS:
        re2_repl = repl.replace("$1", "\\1")
        out = f"regexp_replace({out}, '{pattern}', '{re2_repl}', 'g')"
    return f"trim({out})"
