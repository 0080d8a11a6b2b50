"""Canonicalization invariant (BASELINE.json input_hint): exploding docs
back to turns recovers per-turn text equality under stable turn ordering,
regardless of input row order."""

from __future__ import annotations

from pyspark.sql import functions as F

from pipeline.canonicalize import canonicalize, explode_docs


def test_roundtrip_invariant(spark, turns_df, corpus):
    docs = canonicalize(turns_df)
    back = explode_docs(docs).toPandas()
    src = corpus.turns[["conv_id", "turn_idx", "text"]]

    merged = src.merge(
        back, on=["conv_id", "turn_idx"], how="outer", suffixes=("_src", "_got"),
        indicator=True,
    )
    assert (merged["_merge"] == "both").all(), "turn set mismatch"
    assert (merged["text_src"] == merged["text_got"]).all(), "turn text mismatch"


def test_doc_count_and_meta(spark, turns_df, corpus):
    docs = canonicalize(turns_df).toPandas()
    assert len(docs) == corpus.turns["conv_id"].nunique()
    nt = corpus.turns.groupby("conv_id")["turn_idx"].count()
    got = docs.set_index("conv_id")["n_turns"]
    assert (got.sort_index() == nt.sort_index()).all()


def test_roles_sig_ordered(spark, turns_df, corpus):
    docs = canonicalize(turns_df).toPandas().set_index("conv_id")
    src = corpus.turns.sort_values(["conv_id", "turn_idx"])
    want = src.groupby("conv_id")["role"].apply(
        lambda s: "".join(x[0] for x in s)
    )
    assert (docs["roles_sig"].sort_index() == want.sort_index()).all()


def test_canonicalize_matches_pandas_oracle(spark, turns_df, corpus):
    from pipeline.oracle import canonicalize_pd

    got = (
        canonicalize(turns_df)
        .select("conv_id", "canonical_text")
        .toPandas()
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    want = (
        canonicalize_pd(corpus.turns)[["conv_id", "canonical_text"]]
        .sort_values("conv_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_turn_sep_in_text_is_sanitized_roundtrip(spark):
    """A literal \x1e inside a turn text must not split that turn in two
    on the way back (round-5 review): every engine folds it to a space
    before joining, and the explode inverse then recovers the sanitized
    texts exactly."""
    import pandas as pd

    from pipeline.canonicalize import canonicalize, explode_docs
    from pipeline.oracle import canonicalize_pd

    t = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": [0, 1, 0],
            "role": ["user", "assistant", "user"],
            "text": ["hello \x1e world", "plain", "also\x1e\x1eodd"],
            "tool": [None, None, None],
            "ts": pd.to_datetime(["2026-01-01"] * 3).astype("datetime64[us]"),
        }
    )
    docs = canonicalize(spark.createDataFrame(t))
    got = docs.toPandas().set_index("conv_id")
    assert int(got.loc["c1", "n_turns"]) == 2
    assert got.loc["c1", "canonical_text"].count("\x1e") == 1
    assert got.loc["c1", "canonical_text"] == "hello   world\x1eplain"
    assert got.loc["c2", "canonical_text"] == "also  odd"
    # inverse recovers exactly n_turns sanitized texts per conv
    back = explode_docs(docs).toPandas()
    assert back.groupby("conv_id")["turn_idx"].count().to_dict() == {
        "c1": 2,
        "c2": 1,
    }
    # pandas twin agrees byte-for-byte
    want = canonicalize_pd(t).set_index("conv_id")
    for cid in ("c1", "c2"):
        assert (
            got.loc[cid, "canonical_text"] == want.loc[cid, "canonical_text"]
        )
