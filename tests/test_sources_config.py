"""Sources (parquet/json/csv loaders with schema contract), config file
loading, normalize_unit column parity."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pipeline import synth
from pipeline.config import MatchConfig
from pipeline.normalize import norm_unit_col
from pipeline.sources import read_turns
from pipeline.textnorm import normalize_unit_py


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    c = synth.generate(n_base=10, seed=5)
    d = tmp_path_factory.mktemp("src")
    synth.write_parquet(c, str(d))
    return c, str(d)


def test_read_turns_parquet(spark, tiny):
    c, d = tiny
    df = read_turns(spark, os.path.join(d, "turns.parquet"))
    assert df.count() == len(c.turns)
    assert [f.name for f in df.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]


def test_read_turns_json_roundtrip(spark, tiny, tmp_path):
    c, d = tiny
    p = read_turns(spark, os.path.join(d, "turns.parquet"))
    jdir = str(tmp_path / "json")
    p.write.json(jdir)
    back = read_turns(spark, jdir, fmt="json")
    assert back.count() == len(c.turns)
    # content equality
    a = p.orderBy("conv_id", "turn_idx").select("conv_id", "text").toPandas()
    b = back.orderBy("conv_id", "turn_idx").select("conv_id", "text").toPandas()
    assert a.equals(b)


def test_read_turns_missing_column(spark, tiny, tmp_path):
    c, d = tiny
    bad = str(tmp_path / "bad.parquet")
    t = c.turns.drop(columns=["role"]).assign(
        ts=c.turns["ts"].astype("datetime64[us]")
    )
    t.to_parquet(bad, index=False)
    with pytest.raises(ValueError, match="missing columns"):
        read_turns(spark, bad)


def test_config_from_file(tmp_path):
    p = str(tmp_path / "cfg.json")
    with open(p, "w") as f:
        json.dump({"w_token_sort": 0.5, "w_num": 0.2, "w_partial": 0.1,
                   "w_jaccard": 0.1, "w_jaro": 0.05, "w_struct": 0.05,
                   "match_tier_threshold": 65.0}, f)
    cfg = MatchConfig.from_file(p)
    assert cfg.w_token_sort == 0.5 and cfg.match_tier_threshold == 65.0
    with open(p, "w") as f:
        json.dump({"w_token_sort": 0.9}, f)  # weights no longer sum to 1
    with pytest.raises(ValueError):
        MatchConfig.from_file(p)


UNITS = ["Apt 4B", "unit12", "#7", "suite 300", "apt unit 9c", "", "B2"]


def test_normalize_unit_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({"u": UNITS}))
    got = df.select(norm_unit_col("u").alias("n")).toPandas()["n"].tolist()
    assert got == [normalize_unit_py(u) for u in UNITS]


def test_minhash_band_divisibility_validated():
    """bands > hashes (rows_per_band = 0) makes every band key constant —
    quadratic blocking; a remainder silently discards configured hashes.
    Both now fail at config construction (round-5 review)."""
    from dataclasses import replace

    import pytest

    from pipeline.config import DEFAULT_CONFIG

    with pytest.raises(ValueError, match="minhash"):
        replace(DEFAULT_CONFIG, minhash_bands=5, minhash_hashes=4)
    with pytest.raises(ValueError, match="minhash"):
        replace(DEFAULT_CONFIG, minhash_hashes=16, minhash_bands=5)
    replace(DEFAULT_CONFIG, minhash_hashes=16, minhash_bands=4)  # ok


def test_read_turns_failfast_on_malformed_json(spark, tmp_path):
    """PERMISSIVE parsing turned a malformed row into an all-null row
    that canonicalize groups into a junk NULL-conv document; FAILFAST
    raises instead (round-5 review)."""
    import pytest

    from pipeline.sources import read_turns

    p = tmp_path / "turns.json"
    p.write_text(
        '{"conv_id": "c1", "turn_idx": 0, "role": "user", "text": "hi", '
        '"tool": null, "ts": "2026-01-01T00:00:00"}\n'
        '{"conv_id": "c2", "turn_idx": 0, TRUNCATED'
    )
    with pytest.raises(Exception, match="(?i)malformed|failfast"):
        read_turns(spark, str(p), fmt="json").collect()
