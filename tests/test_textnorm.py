"""Normalization chain tests: Python oracle vs Spark JVM chain vs DuckDB
SQL — all three engines must agree exactly (SURVEY.md §5.2 item 1;
reference chain optimized.py:271-304)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pipeline.normalize import norm_sql_duckdb, norm_text_col
from pipeline.textnorm import normalize_py

CASES = [
    ("Hello, World!", "hello world"),
    ("  collapse   spaces\tand\nnewlines ", "collapse spaces and newlines"),
    ("Café déjà-vu", "cafe deja-vu"),
    ("ÆON œuvre straße", "aeon oeuvre strasse"),
    # ordinal collapse incl. the reference's typo suffixes (optimized.py:295)
    ("92nd street 3rd 1st 4thh", "92 street 3 1 4"),
    ("21tt 7ht 9t 5h 12-th", "21 7 9 5 12"),
    ("keep #hash and/or dash-words 3/4", "keep #hash and/or dash-words 3/4"),
    ("MiXeD CaSe", "mixed case"),
    ("semi;colon:and.dots", "semi colon and dots"),
    ("", ""),
    ("ok\x1ethanks\x1eok", "ok thanks ok"),  # turn separator folds to space
]


@pytest.mark.parametrize("raw,expected", CASES)
def test_normalize_py(raw, expected):
    assert normalize_py(raw) == expected


def test_spark_matches_python(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"raw": [c[0] for c in CASES if c[0]]})
    )
    got = df.select(norm_text_col("raw").alias("n")).toPandas()["n"].tolist()
    want = [normalize_py(c[0]) for c in CASES if c[0]]
    assert got == want


def test_duckdb_matches_python():
    con = duckdb.connect()
    raws = pd.DataFrame({"raw": [c[0] for c in CASES]})
    con.register("t", raws)
    sql = norm_sql_duckdb("raw")
    got = con.sql(f"select {sql} as n from t").df()["n"].tolist()
    want = [normalize_py(c[0]) for c in CASES]
    assert got == want


def test_normalize_idempotent():
    """normalize(normalize(x)) == normalize(x) — required for resume
    determinism and for variant keys built on normalized text."""
    import random

    rng = random.Random(9)
    alphabet = "abZ 12 ,.! àü ß #-/ \t3rd"
    for _ in range(300):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 50)))
        n = normalize_py(s)
        assert normalize_py(n) == n, (s, n)


def test_three_way_on_random_unicodeish():
    import random

    rng = random.Random(3)
    alphabet = "abc ABC 123 ,.!? àéîöü Æœß #-/ \t"
    raws = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 60)))
        for _ in range(200)
    ]
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"raw": raws}))
    got = con.sql(f"select {norm_sql_duckdb('raw')} as n from t").df()["n"].tolist()
    want = [normalize_py(r) for r in raws]
    assert got == want


def test_turkish_dotted_capital_i_three_engine_parity(spark):
    """U+0130 is the one BMP codepoint where the engines' lower()
    disagrees (Python/Java: 'i'+combining dot; DuckDB: 'i') — the
    pre-lower fold to 'I' pins all three (round-5 review)."""
    import duckdb

    from pipeline.normalize import norm_sql_duckdb, norm_text_col
    from pipeline.textnorm import normalize_py

    cases = ["aİb", "İstanbul ŞEHİR apt 3rd", "ı İ i I"]
    sdf = spark.createDataFrame([(c,) for c in cases], "t string")
    spark_out = [r[0] for r in sdf.select(norm_text_col("t")).collect()]
    con = duckdb.connect()
    duck_out = [
        con.sql(
            f"select {norm_sql_duckdb('?::varchar')}", params=[x]
        ).fetchone()[0]
        for x in cases
    ]
    for case, s_o, d_o in zip(cases, spark_out, duck_out):
        p_o = normalize_py(case)
        assert p_o == s_o == d_o, (case, p_o, s_o, d_o)
