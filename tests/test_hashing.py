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


def test_coin_resolution_finer_than_1e6(spark):
    """The down-sampling coin must quantize finer than the old 1e-6 grid:
    a coin with k steps floors every keep probability at 1/k, so a cap of
    c silently stops holding once a bucket exceeds c*k members — at the
    default block_key_cap=64 the 1e-6 coin lost containment past 64M
    members with NO audit signal (round-5 review). The coin is now
    pmod(h, 2^40)/2^40, exact in a double, identical in all three
    engines."""
    from pyspark.sql import functions as F

    from pipeline.hashing import COIN_MOD, coin_col, h60_col, h60_py

    assert COIN_MOD == 2 ** 40
    df = spark.range(500).select(
        F.col("id").cast("string").alias("conv_id"), F.lit("k1").alias("key")
    )
    coins = {
        r.conv_id: r.c
        for r in df.select(
            "conv_id", coin_col(h60_col, "coin", "conv_id", "key").alias("c")
        ).collect()
    }
    # python twin agreement, value by value
    for cid, c in coins.items():
        assert c == (h60_py("coin", cid, "k1") % COIN_MOD) / float(COIN_MOD)
    # strictly finer quantization than the old grid: some coin must NOT
    # be a multiple of 1e-6 (under the old coin, every one was)
    assert any((c * 1_000_000) % 1 != 0 for c in coins.values())
    # still a uniform [0, 1) coin
    vals = list(coins.values())
    assert all(0.0 <= c < 1.0 for c in vals)
    assert 0.3 < sum(vals) / len(vals) < 0.7
