"""Contracted incremental linkage: the exact-dup short-circuit.

An increment doc whose (norm_text, roles_sig) signature already exists in
the committed rep set must (a) never enter blocking or scoring, (b) land
in its twin's entity, and (c) leave the final labeling IDENTICAL to one
plain batch run over the union — single step and chained, under the same
population-independence conditions as the uncontracted theorem.
"""

from __future__ import annotations

from dataclasses import replace

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pipeline.config import DEFAULT_CONFIG
from pipeline.incremental import incremental_link_contracted
from pipeline.linkage import build_contracted_plan, build_plan, cluster_edges
from pipeline.session import release_caches


@pytest.fixture(autouse=True)
def _release_caches_after_each_test():
    """Both plan builders and incremental_link_contracted persist
    intermediates via track_cache; without a per-test release the cached
    RDDs accumulate across this file's five Spark-heavy tests and exhaust
    the local[4] JVM's execution memory (observed: TaskMemoryManager page
    allocation failures then a Py4JJavaError at localCheckpoint)."""
    yield
    release_caches()

NOCAP = replace(
    DEFAULT_CONFIG,
    pairs_per_key_cap=1_000_000,
    block_key_cap=1_000_000,
    anchor_max_df=1,
)


def _clusters_pd(df) -> pd.DataFrame:
    return (
        df.select("conv_id", "entity_id")
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )


def _turns(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "conv_id": [r[0] for r in rows],
                "turn_idx": [0] * len(rows),
                "role": ["user"] * len(rows),
                "text": [r[1] for r in rows],
                "tool": [None] * len(rows),
                "ts": pd.to_datetime(["2024-01-01"] * len(rows)),
            }
        )
    )


def _base_state(turns, cfg):
    plan = build_contracted_plan(turns, cfg)
    clusters, _ = cluster_edges(plan["edges"], plan["features"])
    return plan, clusters


def test_short_circuit_skips_blocking_and_labels_match_batch(spark):
    """Handcrafted corpus where every short-circuit branch fires: a
    committed-twin hit (a2 dups committed a1), an intra-increment dup
    class (z1/z2), a genuinely new doc that must still block+score
    against the committed corpus (b2 fuzzy-matches committed b1), and an
    isolated new doc (solo). Hits must produce ZERO candidate pairs."""
    base_rows = [
        ("a1", "alpha beta gamma delta epsilon zeta"),
        ("b1", "the quick brown fox jumps over the lazy dog today"),
        ("q1", "completely unrelated committed conversation text here"),
    ]
    inc_rows = [
        ("a2", "alpha beta gamma delta epsilon zeta"),  # exact twin of a1
        ("b2", "the quick brown fox jumps over the lazy dog toady"),  # typo
        ("z1", "zulu yankee xray whiskey victor uniform sierra"),
        ("z2", "zulu yankee xray whiskey victor uniform sierra"),
        ("solo", "nothing matches this lonely increment document"),
    ]
    base_turns = _turns(spark, base_rows)
    inc_turns = _turns(spark, inc_rows)

    plan, base_clusters = _base_state(base_turns, NOCAP)
    out = incremental_link_contracted(
        plan["rep_features"], base_clusters, inc_turns, NOCAP
    )

    # the hit never reaches the pair pipeline
    dup = out["dup_assign"].toPandas().set_index("conv_id")
    assert dup.loc["a2", "rep_id"] == "a1" and bool(dup.loc["a2", "hit"])
    assert dup.loc["z2", "rep_id"] == "z1" and not bool(dup.loc["z2", "hit"])
    pair_ids = set(
        out["scored"].select("conv_id_a").toPandas()["conv_id_a"]
    ) | set(out["scored"].select("conv_id_b").toPandas()["conv_id_b"])
    assert "a2" not in pair_ids and "z2" not in pair_ids

    # labels equal one plain batch run over the union
    full_plan = build_plan(base_turns.unionByName(inc_turns), NOCAP)
    full_clusters, _ = cluster_edges(full_plan["edges"], full_plan["features"])
    pd.testing.assert_frame_equal(
        _clusters_pd(full_clusters), _clusters_pd(out["clusters"])
    )
    got = _clusters_pd(out["clusters"]).set_index("conv_id")["entity_id"]
    assert got["a2"] == got["a1"]
    assert got["b2"] == got["b1"]
    assert got["z1"] == got["z2"] == "z1"
    assert got["solo"] == "solo"


def test_smaller_id_hit_relabels_committed_entity(spark):
    """A dup hit whose conv_id sorts BELOW its committed twin's entity
    label must win the min-id and relabel the committed rows (the
    broadcast merge map path, exercised through a hit edge)."""
    base_turns = _turns(
        spark, [("m9", "omega psi chi phi upsilon tau sigma rho")]
    )
    inc_turns = _turns(
        spark, [("m0", "omega psi chi phi upsilon tau sigma rho")]
    )
    plan, base_clusters = _base_state(base_turns, NOCAP)
    out = incremental_link_contracted(
        plan["rep_features"], base_clusters, inc_turns, NOCAP
    )
    got = _clusters_pd(out["clusters"]).set_index("conv_id")["entity_id"]
    assert got["m9"] == got["m0"] == "m0"


def test_contracted_incremental_equals_batch_synth(spark, turns_df):
    """Synth-corpus equality: contracted base + contracted increment ==
    plain batch over the union (same split and config as
    test_incremental_equals_batch — duplicate partners land on both
    sides, so committed-twin hits actually occur)."""
    cfg = replace(DEFAULT_CONFIG, pairs_per_key_cap=1_000_000, anchor_max_df=1)
    parity = F.crc32(F.col("conv_id").cast("binary")) % 2
    base_turns = turns_df.where(parity == 0)
    inc_turns = turns_df.where(parity == 1)

    full_plan = build_plan(turns_df, cfg)
    full_clusters, _ = cluster_edges(full_plan["edges"], full_plan["features"])

    plan, base_clusters = _base_state(base_turns, cfg)
    out = incremental_link_contracted(
        plan["rep_features"], base_clusters, inc_turns, cfg
    )
    assert out["hot_key_audit"].count() == 0
    assert out["cap_risk_audit"].count() == 0
    pd.testing.assert_frame_equal(
        _clusters_pd(full_clusters), _clusters_pd(out["clusters"])
    )


def test_chained_contracted_increments_match_batch(spark, turns_df):
    """Two successive contracted increments, each consuming the previous
    step's returned rep state (rep_features + keys + key_counts), must
    equal one plain batch run — and step 2's committed-sig lookup must
    see step 1's NEW reps (a step-2 twin of a step-1 doc short-circuits).

    State is materialized between steps (materialize_state), exactly as
    production commits it to parquet between increments — chaining the
    raw lazy frames compounds the plan multiplicatively and the driver
    spends minutes re-rendering plan descriptions per AQE stage (see
    materialize_state's docstring)."""
    from pipeline.blocking import key_table_with_counts
    from pipeline.incremental import materialize_state

    cfg = NOCAP
    slot = F.crc32(F.col("conv_id").cast("binary")) % 3
    t0, t1, t2 = (turns_df.where(slot == i) for i in range(3))

    full_plan = build_plan(turns_df, cfg)
    full_clusters, _ = cluster_edges(full_plan["edges"], full_plan["features"])

    plan, base_clusters = _base_state(t0, cfg)
    k0, c0 = key_table_with_counts(plan["rep_features"], cfg)
    step1 = materialize_state(
        incremental_link_contracted(
            plan["rep_features"], base_clusters, t1, cfg,
            existing_keys=k0, existing_key_counts=c0,
        )
    )
    step2 = incremental_link_contracted(
        step1["rep_features"], step1["clusters"], t2, cfg,
        existing_keys=step1["keys"], existing_key_counts=step1["key_counts"],
    )
    assert step2["hot_key_audit"].count() == 0
    assert step2["cap_risk_audit"].count() == 0
    pd.testing.assert_frame_equal(
        _clusters_pd(full_clusters), _clusters_pd(step2["clusters"])
    )


def test_redelivered_ids_are_dropped(spark):
    """An increment id already present in committed clusters (collapsed
    members included) is anti-joined out — no duplicate feature rows, no
    duplicate cluster rows."""
    base_turns = _turns(
        spark,
        [
            ("r1", "redelivery guard base conversation text"),
            ("r2", "redelivery guard base conversation text"),  # collapsed
        ],
    )
    plan, base_clusters = _base_state(base_turns, NOCAP)
    inc_turns = _turns(
        spark,
        [
            ("r2", "redelivery guard base conversation text"),  # re-sent
            ("r3", "a brand new increment conversation arrives"),
        ],
    )
    out = incremental_link_contracted(
        plan["rep_features"], base_clusters, inc_turns, NOCAP
    )
    cl = _clusters_pd(out["clusters"])
    assert cl["conv_id"].tolist() == ["r1", "r2", "r3"]
    assert out["new_rep_features"].count() == 1  # only r3
