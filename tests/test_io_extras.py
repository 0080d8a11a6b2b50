"""Soundex parity (kernel vs Spark F.soundex), CSV sink, catalog listing."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pipeline.kernels import soundex


WORDS = [
    "Robert", "Rupert", "Ashcraft", "Ashcroft", "Tymczak", "Pfister",
    "Honeyman", "street", "strete", "avenue", "avnue", "x", "Main",
]


def test_soundex_reference_semantics():
    # values computed by the reference algorithm (optimized.py:235-251):
    # separators never break runs, first-letter code not suppressed,
    # empty -> "0000"
    assert soundex("Robert") == "R163"
    assert soundex("Rupert") == "R163"
    assert soundex("Ashcraft") == "A261"
    assert soundex("Tymczak") == "T520"   # standard soundex: T522
    assert soundex("") == "0000"          # standard: empty/err
    assert soundex("Pfister") == "P123"


def test_soundex_vs_spark_divergence_documented(spark):
    """Reference soundex == Spark F.soundex on plain runs; known, deliberate
    divergence on vowel-separated duplicate codes (we follow the reference)."""
    plain = ["Robert", "Rupert", "street", "avenue", "Main", "Ashcraft"]
    df = spark.createDataFrame(pd.DataFrame({"w": plain}))
    got = df.select(F.soundex("w").alias("s")).toPandas()["s"].tolist()
    assert got == [soundex(w) for w in plain]
    # divergent case stays divergent (guards against silent behavior change)
    spark_t = (
        spark.createDataFrame(pd.DataFrame({"w": ["Tymczak"]}))
        .select(F.soundex("w").alias("s"))
        .first()["s"]
    )
    assert spark_t == "T522" and soundex("Tymczak") == "T520"


def test_csv_export_roundtrip(spark, tmp_path):
    from pipeline.io import export_results_csv

    df = spark.createDataFrame(
        pd.DataFrame(
            {"conv_id": ["a", "b"], "score": [1.5, 2.5]}
        )
    ).withColumn("families", F.array(F.lit(1), F.lit(2)))
    out = str(tmp_path / "csv")
    export_results_csv(df, out)
    back = spark.read.option("header", "true").csv(out).toPandas()
    assert len(back) == 2
    assert set(back.columns) == {"conv_id", "score", "families"}
    assert set(back["families"]) == {"[1,2]"}


def test_list_tables(spark, tmp_path):
    from pipeline.io import StageRunner, list_tables

    runner = StageRunner(spark, str(tmp_path), fingerprint="v1")
    runner.run("tbl_a", lambda: spark.range(3))
    names = list_tables(spark, str(tmp_path))
    assert "tbl_a" in names


def test_stage_runner_iceberg_mode_stubbed(spark, monkeypatch, tmp_path):
    """Iceberg-mode StageRunner skip logic against a stubbed catalog:
    first run writes (createOrReplace seam) and records the fingerprint;
    second run with the same fingerprint SKIPS; a changed fingerprint
    rebuilds (replace — never append/duplicate)."""
    from pipeline import io as pio

    catalog: dict[str, dict] = {}  # ident -> {"fingerprint", "writes"}

    def fake_write(df, ident, fingerprint):
        ent = catalog.setdefault(ident, {"writes": 0})
        ent["fingerprint"] = fingerprint
        ent["writes"] = ent["writes"] + 1
        # materialize to parquet so read_table's stub can serve it
        df.write.mode("overwrite").parquet(str(tmp_path / ident.replace(".", "_")))

    def fake_fp(spark_, ident):
        return catalog.get(ident, {}).get("fingerprint")

    def fake_read(spark_, ident, fmt="parquet"):
        assert fmt == "iceberg"
        return spark_.read.parquet(str(tmp_path / ident.replace(".", "_")))

    monkeypatch.setattr(pio, "_iceberg_write", fake_write)
    monkeypatch.setattr(pio, "_iceberg_fingerprint", fake_fp)
    monkeypatch.setattr(pio, "read_table", fake_read)

    builds = []

    def mk():
        builds.append(1)
        return spark.range(5)

    r = pio.StageRunner(spark, "cat.db", fingerprint="fp1", use_iceberg=True)
    out1 = r.run("stage_a", mk)
    assert out1.count() == 5
    assert builds == [1]
    assert catalog["cat.db.stage_a"] == {"writes": 1, "fingerprint": "fp1"}

    out2 = r.run("stage_a", mk)  # same fingerprint -> resumed, no rebuild
    assert out2.count() == 5
    assert builds == [1]
    assert r.metrics[-1]["resumed"] is True
    assert catalog["cat.db.stage_a"]["writes"] == 1

    r2 = pio.StageRunner(spark, "cat.db", fingerprint="fp2", use_iceberg=True)
    r2.run("stage_a", mk)  # changed config -> REPLACE (writes=2, not append)
    assert builds == [1, 1]
    assert catalog["cat.db.stage_a"] == {"writes": 2, "fingerprint": "fp2"}


def test_iceberg_fingerprint_missing_table_returns_none(spark):
    from pipeline import io as pio

    # missing TABLE (resolvable catalog) -> not committed -> None
    assert pio._iceberg_fingerprint(spark, "no_such_table_xyz") is None
    assert (
        pio._iceberg_fingerprint(spark, "spark_catalog.default.no_such_t")
        is None
    )


def test_iceberg_fingerprint_bad_catalog_raises(spark):
    # a misconfigured/typo'd catalog must SURFACE, not read as
    # 'uncommitted' (which would silently rebuild a committed stage on
    # every run while resume appears to work)
    import pytest

    from pipeline import io as pio

    with pytest.raises(Exception, match="no_such_cat|NAMESPACE"):
        pio._iceberg_fingerprint(spark, "no_such_cat.db.t")
