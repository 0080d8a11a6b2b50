"""Entity survivorship (pipeline/survivorship.py) — golden record per
entity: survivor total order, merged aggregates, plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pipeline.survivorship import entity_canonical

UTC = dt.timezone.utc


def _docs(spark, rows):
    """rows: (conv_id, n_turns, norm_text, first_ts_iso[, canonical_text])."""
    data = [
        (
            r[0],
            r[1],
            r[2],
            dt.datetime.fromisoformat(r[3]),
            r[4] if len(r) > 4 else r[2].upper(),
        )
        for r in rows
    ]
    return spark.createDataFrame(
        data, "conv_id string, n_turns long, norm_text string, "
        "first_ts timestamp, canonical_text string"
    )


def _clusters(spark, pairs):
    return spark.createDataFrame(pairs, "conv_id string, entity_id string")


def _us(iso: str) -> int:
    return int(
        dt.datetime.fromisoformat(iso).replace(tzinfo=UTC).timestamp() * 1_000_000
    )


def test_survivor_total_order(spark):
    """Each ordering term in turn: n_turns beats norm_len beats first_ts
    beats conv_id."""
    docs = _docs(
        spark,
        [
            # e1: b has more turns -> wins despite shorter text, later ts
            ("a", 2, "xxxxxxxxxx", "2024-01-01T00:00:00"),
            ("b", 3, "xx", "2024-06-01T00:00:00"),
            # e2: equal turns, c longer text -> wins
            ("c", 1, "xxxxx", "2024-06-01T00:00:00"),
            ("d", 1, "xxx", "2024-01-01T00:00:00"),
            # e3: equal turns+len, earlier ts wins
            ("e", 1, "xxx", "2024-02-01T00:00:00"),
            ("f", 1, "xxx", "2024-01-01T00:00:00"),
            # e4: full tie except conv_id -> min id wins
            ("g", 1, "xxx", "2024-01-01T00:00:00"),
            ("h", 1, "xxx", "2024-01-01T00:00:00"),
        ],
    )
    clusters = _clusters(
        spark,
        [("a", "e1"), ("b", "e1"), ("c", "e2"), ("d", "e2"),
         ("e", "e3"), ("f", "e3"), ("g", "e4"), ("h", "e4")],
    )
    got = {
        r["entity_id"]: r.asDict()
        for r in entity_canonical(clusters, docs).collect()
    }
    assert got["e1"]["canonical_id"] == "b"
    assert got["e2"]["canonical_id"] == "c"
    assert got["e3"]["canonical_id"] == "f"
    assert got["e4"]["canonical_id"] == "g"
    assert got["e1"]["n_members"] == 2
    assert got["e1"]["total_turns"] == 5
    assert got["e1"]["first_seen_us"] == _us("2024-01-01T00:00:00")
    assert got["e1"]["last_seen_us"] == _us("2024-06-01T00:00:00")
    # canonical_norm_len is the SURVIVOR's length, not the max
    assert got["e1"]["canonical_norm_len"] == 2


def test_singletons_and_text(spark):
    docs = _docs(
        spark,
        [("a", 1, "solo doc", "2024-01-01T00:00:00", "Solo Doc")],
    )
    clusters = _clusters(spark, [("a", "a")])
    row = entity_canonical(clusters, docs, include_text=True).collect()[0]
    assert row["canonical_id"] == "a"
    assert row["n_members"] == 1
    assert row["canonical_text"] == "Solo Doc"
    assert row["first_seen_us"] == row["last_seen_us"]


def test_single_entity_exchange(spark):
    """The window block costs ONE entity-keyed Exchange: rep selection
    and all merged aggregates share the partitionBy(entity_id) spec, so
    Catalyst plans exactly one hashpartitioning(entity_id) — a second
    entity-side pass would double the shuffle volume at 10^9 members."""
    docs = _docs(
        spark, [("a", 1, "xx", "2024-01-01T00:00:00")]
    ).localCheckpoint()
    clusters = _clusters(spark, [("a", "e1")]).localCheckpoint()
    out = entity_canonical(clusters, docs)
    plan = out._jdf.queryExecution().executedPlan().toString()
    n_entity_exchanges = plan.count("hashpartitioning(entity_id")
    assert n_entity_exchanges == 1, plan[:3000]
