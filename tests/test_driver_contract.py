"""Driver-contract parity harness: every queries() entry with an
oracle_sql() twin must match DuckDB exactly (row count + schema names +
order-insensitive values) at sf0.01 — a local replica of the driver's
CORRECTNESS gate."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"create view {t} as select * from read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            # doubles must be bit-identical; repr keeps full precision
            df[c] = df[c].map(lambda v: repr(float(v)))
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "M":
            df[c] = df[c].astype(str)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ORACLE_QUERIES = sorted(entrymod.oracle_sql())


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, con, name):
    q = entrymod.queries()[name]
    got = _normalize(q(spark, SF_DIR).toPandas())
    want = _normalize(con.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"column mismatch: {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"row count {len(got)} vs {len(want)}"
    assert len(got) > 0, "query returned no rows — trivially passing"
    neq = (got != want).any(axis=1)
    assert not neq.any(), (
        f"value mismatch in {int(neq.sum())} rows, first:\n"
        f"spark: {got[neq].head(3)}\noracle: {want[neq].head(3)}"
    )


ROWS_ONLY = sorted(set(entrymod.queries()) - set(entrymod.oracle_sql()))

if ROWS_ONLY:

    @pytest.mark.parametrize("name", ROWS_ONLY)
    def test_rows_only_queries_run(spark, name):
        q = entrymod.queries()[name]
        df = q(spark, SF_DIR)
        n = df.count()
        assert n >= 0
        df.limit(5).collect()  # schema + execution sanity

else:

    def test_every_query_has_an_oracle():
        """No rows-only queries exist: every queries() entry carries a
        DuckDB oracle (this used to surface as a confusing
        'empty parameter set' SKIP in the suite summary)."""
        assert set(entrymod.queries()) == set(entrymod.oracle_sql())


def test_entry_smoke(spark):
    out = entrymod.entry(spark)
    assert out.count() > 0
    assert set(out.columns) == {"conv_id", "entity_id"}


def test_audit_sampled_oracle_handles_empty_coin(monkeypatch):
    """Round-4 ADVICE: with no scored pair passing the 0.25 coin the
    oracle used to emit malformed SQL ('from (values )'). Force the
    empty branch by making every coin value land above the threshold
    and assert the fallback is valid DuckDB SQL with the contract
    schema and zero rows."""
    import pipeline.hashing as hashing

    # a stub hash whose coin (h % COIN_MOD / COIN_MOD) lands above the
    # 0.25 threshold for the CURRENT coin modulus — not a hardcoded
    # magic number that silently stops forcing the branch when the coin
    # resolution changes (it did: 999_999 forced ~1.0 under the 1e-6
    # coin but ~9e-7 under the 2^40 one)
    high_coin = hashing.COIN_MOD - 1
    monkeypatch.setattr(hashing, "h60_py", lambda *parts: high_coin)
    sql = entrymod._linkage_audit_sampled_sql()
    out = duckdb.sql(sql).df()
    assert list(out.columns) == ["tier", "n_pairs", "sample_rate"]
    assert len(out) == 0


def test_knn_oracle_parity_with_zero_vector(spark, tmp_path):
    """Degenerate-input parity pin for the cosine twins: an all-zeros
    embedding is cosine 0.0 on the Spark side (cosine_col's guard) and
    must be 0 — not NULL/inf — in the DuckDB oracle (round-5 review:
    SQL_KNN also used list_sum, the one unpinned FP accumulation)."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for i in range(20):
        v = rng.normal(size=8).astype("float32")
        if i == 3:
            v = np.zeros(8, dtype="float32")  # degenerate row
        rows.append((i, [float(x) for x in v]))
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    ).write.parquet(os.path.join(sf, "embeddings.parquet"))

    got = _normalize(entrymod.q_knn_cosine(spark, sf).toPandas())
    c = duckdb.connect()
    c.sql(
        "create view embeddings as select * from "
        f"read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    want = _normalize(c.sql(entrymod.SQL_KNN).df())
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    assert got.equals(want), (got, want)
    # the zero vector is a QUERY too (vec_id 3 < 10): all its scores 0
    raw = entrymod.q_knn_cosine(spark, sf).toPandas()
    z = raw[raw["query_id"] == 3]
    assert len(z) == 3 and (z["score_x10000"] == 0).all()


def test_canonicalize_oracle_parity_with_null_value(spark, tmp_path):
    """NULL event value -> NULL turn text in BOTH engines; the Spark side
    keeps the empty separator slot (coalesce per turn) and the oracle's
    string_agg must too (round-5 review: string_agg silently dropped the
    row, desyncing canonical_text from n_turns)."""
    import pandas as pd

    ev = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "user_id": [1, 1, 1, 2],
            "event_type": ["view", "click", "view", "click"],
            "value": [10.0, None, 30.0, 40.0],
            "props": ["a", "b", None, "d"],
            "ts": pd.to_datetime(
                ["2026-01-01", "2026-01-02", "2026-01-03", "2026-01-04"]
            ).astype("datetime64[us]"),
        }
    )
    sf = str(tmp_path)
    spark.createDataFrame(ev).write.parquet(
        os.path.join(sf, "events.parquet")
    )
    got = _normalize(entrymod.q_canonicalize(spark, sf).toPandas())
    c = duckdb.connect()
    c.sql(
        "create view events as select * from "
        f"read_parquet('{sf}/events.parquet/*.parquet')"
    )
    want = _normalize(c.sql(entrymod.SQL_CANONICALIZE).df())
    assert list(got.columns) == list(want.columns)
    assert got.equals(want), (got, want)
    # the NULL-value turn keeps its slot: separators == n_turns - 1
    raw = entrymod.q_canonicalize(spark, sf).toPandas()
    u1 = raw[raw["conv_id"] == "u1"].iloc[0]
    assert u1["canonical_text"].count("\x1e") == int(u1["n_turns"]) - 1
