"""Turn-table sources (SURVEY.md §2.1 S4/S6/S7 analogues).

The reference reads one address per line from a batch file
(optimized.py:1037-1044) and probes index schemas at runtime
(ultimate_address_matcher.py:191-242). Spark-side: typed loaders for the
``transcripts_turns`` schema from parquet (canonical), JSON-lines, and
CSV, all validated against the contract StructType — the runtime
schema-probe becomes a static check.

Production source is Iceberg (``spark.read.format("iceberg")``); the
seam falls back to parquet when no catalog is configured (SURVEY.md
§7.0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pipeline.streaming import TURNS_SCHEMA

REQUIRED_COLUMNS = [f.name for f in TURNS_SCHEMA.fields]


def _validate(df: DataFrame) -> DataFrame:
    missing = [c for c in REQUIRED_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"turns source missing columns: {missing}")
    # normalize types to the contract (schema probe -> static cast)
    return df.select(
        F.col("conv_id").cast("string"),
        F.col("turn_idx").cast("int"),
        F.col("role").cast("string"),
        F.col("text").cast("string"),
        F.col("tool").cast("string"),
        F.col("ts").cast("timestamp"),
    )


def read_turns(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Load a turns table from parquet / iceberg / json-lines / csv."""
    if fmt == "iceberg":
        return _validate(spark.read.format("iceberg").load(path))
    if fmt == "parquet":
        return _validate(spark.read.parquet(path))
    # FAILFAST: default PERMISSIVE parsing turns a malformed row into an
    # all-null row that passes the column-name validation and flows into
    # canonicalize as a junk conv_id=NULL document — silent corruption
    # (round-5 review). Fail-loudly is this repo's contract; callers who
    # want salvage parsing can pre-clean upstream.
    if fmt == "json":
        return _validate(
            spark.read.schema(TURNS_SCHEMA)
            .option("mode", "FAILFAST")
            .json(path)
        )
    if fmt == "csv":
        return _validate(
            spark.read.schema(TURNS_SCHEMA)
            .option("header", "true")
            .option("timestampFormat", "yyyy-MM-dd HH:mm:ss[.SSSSSS]")
            .option("mode", "FAILFAST")
            .csv(path)
        )
    raise ValueError(f"unsupported turns format: {fmt}")
