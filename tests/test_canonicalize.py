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
