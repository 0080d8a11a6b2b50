"""Three-engine equality of the neutral 60-bit hash (Spark / DuckDB /
Python) — the foundation of every oracle-checkable bucketing operator."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pipeline.hashing import h60_col, h60_py, h60_sql

VALS = ["hello", "a b c", "", "123", "x" * 500, "ünïcode ♥ test", "\x1e sep"]


def test_h60_three_engine_equality(spark):
    df = spark.createDataFrame([(v,) for v in VALS], "s string")
    got_spark = {
        r["s"]: (r["h1"], r["h2"])
        for r in df.select(
            "s",
            h60_col(F.lit("seed"), F.lit(7), "s").alias("h1"),
            h60_col("s").alias("h2"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("create table t(s varchar)")
    con.executemany("insert into t values (?)", [(v,) for v in VALS])
    sql = (
        "select s, "
        + h60_sql("'seed'", "'7'", "s")
        + " as h1, "
        + h60_sql("s")
        + " as h2 from t"
    )
    got_duck = {s: (h1, h2) for s, h1, h2 in con.sql(sql).fetchall()}
    for v in VALS:
        py = (h60_py("seed", 7, v), h60_py(v))
        assert got_spark[v] == py, v
        assert got_duck[v] == py, v


def test_h60_range_and_determinism():
    for v in VALS:
        h = h60_py(v)
        assert 0 <= h < (1 << 60)
        assert h == h60_py(v)
    assert h60_py("a", "b") != h60_py("ab")  # separator prevents gluing
