"""Batch (numpy) kernels vs per-pair kernels: bit-equality.

The Spark scoring UDF now runs ``pipeline.kernels_batch`` (SIMD across
the Arrow batch) while the pandas oracle keeps the per-pair
``pipeline.kernels`` / ``oracle.component_scores`` path. These tests pin
the two paths bit-for-bit — the channel doubles must be IDENTICAL, not
approximately equal, because the oracle-parity contract queries hash the
values. Coverage: synth-corpus realistic pairs, word-width boundary fuzz
(63/64/65/127/128/129 chars), empty/equal/one-sided trivials, the
non-ASCII fallback path, and hypothesis-generated adversarial strings.
"""

from __future__ import annotations

import random

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pipeline import kernels, oracle
from pipeline import kernels_batch as kb
from pipeline.config import DEFAULT_CONFIG
from pipeline.synth import generate

CHANNELS = ["token_sort", "num", "partial", "jaccard", "jaro", "struct", "text"]


@pytest.fixture(autouse=True)
def _force_batch_path(monkeypatch):
    """The hybrid dispatch routes small batches to the per-pair kernels
    (measured crossover ~600 pairs); these tests exist to pin the NUMPY
    path, so force it regardless of batch size."""
    monkeypatch.setattr(kb, "_BATCH_MIN_ROWS", 0)


def _assert_rows_equal(na, nb, ra, rb):
    batch = kb.batch_component_scores(na, nb, ra, rb)
    for i in range(len(na)):
        ref = oracle.component_scores(
            (na[i] or "")[: DEFAULT_CONFIG.score_text_max_chars],
            (nb[i] or "")[: DEFAULT_CONFIG.score_text_max_chars],
            ra[i] or "",
            rb[i] or "",
        )
        for ch in CHANNELS:
            assert batch[ch][i] == ref[ch], (
                f"row {i} channel {ch}: batch={batch[ch][i]!r} "
                f"oracle={ref[ch]!r} a={na[i]!r} b={nb[i]!r}"
            )


def test_jaro_prefix_constants_agree():
    assert kb._JARO_PREFIX == oracle.JARO_PREFIX


def test_synth_corpus_pairs_bitwise_equal():
    corpus = generate(n_base=150, seed=99, hotkey_convs=10)
    docs = oracle.canonicalize_pd(corpus.turns)
    docs = oracle.featurize_pd(docs)
    norms = docs["norm_text"].tolist()
    roles = docs["roles_sig"].tolist()
    n = len(norms)
    rng = random.Random(3)
    na, nb, ra, rb = [], [], [], []
    for _ in range(600):
        i, j = rng.randrange(n), rng.randrange(n)
        na.append(norms[i])
        nb.append(norms[j])
        ra.append(roles[i])
        rb.append(roles[j])
    _assert_rows_equal(na, nb, ra, rb)


def test_width_boundaries_and_trivials():
    rng = random.Random(17)
    alpha = "ab c01-#/"
    lengths = [0, 1, 2, 5, 63, 64, 65, 127, 128, 129, 191, 192, 300, 2047]

    def mk(length):
        return "".join(rng.choice(alpha) for _ in range(length))

    na, nb = [], []
    for la in lengths:
        for lb in [0, 1, 64, 65, 128, 300]:
            na.append(mk(la))
            nb.append(mk(lb))
    # equal pairs, shared prefixes, digit-heavy pairs
    na += ["abc 123", "9 9 9", "", "123 456"]
    nb += ["abc 123", "9 9 9 9", "", "123 457"]
    ra = ["ua"] * len(na)
    rb = ["au"] * len(na)
    _assert_rows_equal(na, nb, ra, rb)


def test_non_ascii_falls_back_to_per_pair():
    na = ["héllo wörld", "abc", "\x00weird", "ok"]
    nb = ["hello world", "abç", "weird", "ok"]
    ra = ["ua", "uß", "ua", ""]
    rb = ["ua", "ua", "ua", "au"]
    _assert_rows_equal(na, nb, ra, rb)


def test_none_inputs():
    _assert_rows_equal([None, "a"], ["b", None], [None, "u"], ["u", None])


def test_batch_indel_distance_matches_kernels():
    rng = random.Random(5)
    alpha = "abcd 0123-"
    al, bl = [], []
    for _ in range(400):
        al.append("".join(rng.choice(alpha) for _ in range(rng.randint(1, 400))))
        bl.append("".join(rng.choice(alpha) for _ in range(rng.randint(1, 400))))
    dist = kb.batch_indel_distance(al, bl)
    for i, (a, b) in enumerate(zip(al, bl)):
        assert int(dist[i]) == kernels.indel_distance(a, b)


def test_batch_jaro_matches_kernels():
    rng = random.Random(6)
    alpha = "abcdef 012"
    al, bl = [], []
    for _ in range(500):
        al.append("".join(rng.choice(alpha) for _ in range(rng.randint(0, 128))))
        bl.append("".join(rng.choice(alpha) for _ in range(rng.randint(0, 128))))
    jw = kb.batch_jaro_winkler(al, bl)
    for i, (a, b) in enumerate(zip(al, bl)):
        assert jw[i] == kernels.jaro_winkler(a, b), (a, b)


def test_batch_jaro_truncates_long_inputs_like_oracle():
    """Public-function guard (round-3 ADVICE): >128-char inputs must be
    sliced to _JARO_PREFIX inside batch_jaro_winkler — the two-word
    bitmask is silently wrong past 128 — and equal the per-pair kernel
    on the same truncated pair (the oracle's JARO_PREFIX semantics)."""
    rng = random.Random(7)
    alpha = "abcdef 012"
    al, bl = [], []
    for _ in range(100):
        al.append("".join(rng.choice(alpha) for _ in range(rng.randint(129, 400))))
        bl.append("".join(rng.choice(alpha) for _ in range(rng.randint(0, 400))))
    jw = kb.batch_jaro_winkler(al, bl)
    for i, (a, b) in enumerate(zip(al, bl)):
        assert jw[i] == kernels.jaro_winkler(
            a[: kb._JARO_PREFIX], b[: kb._JARO_PREFIX]
        ), (a, b)


@settings(max_examples=300, deadline=None)
@given(
    st.text(alphabet="ab1 -", max_size=200),
    st.text(alphabet="ab1 -", max_size=200),
)
def test_hypothesis_single_pair_equal(a, b):
    batch = kb.batch_component_scores([a], [b], ["ua"], ["ua"])
    ref = oracle.component_scores(
        a[: DEFAULT_CONFIG.score_text_max_chars],
        b[: DEFAULT_CONFIG.score_text_max_chars],
        "ua",
        "ua",
    )
    for ch in CHANNELS:
        assert batch[ch][0] == ref[ch], (ch, a, b)


def test_chunk_boundary_grouping():
    """Jobs spanning several word widths in one call stay correct when
    chunk packing merges/splits groups."""
    old = kb._CHUNK_WORD_ROWS
    kb._CHUNK_WORD_ROWS = 8  # force many tiny chunks
    try:
        rng = random.Random(8)
        alpha = "xyz 12"
        al = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 200))) for _ in range(60)]
        bl = ["".join(rng.choice(alpha) for _ in range(rng.randint(1, 200))) for _ in range(60)]
        dist = kb.batch_indel_distance(al, bl)
        for i, (a, b) in enumerate(zip(al, bl)):
            assert int(dist[i]) == kernels.indel_distance(a, b)
    finally:
        kb._CHUNK_WORD_ROWS = old


def test_driver_corpus_ring_bitwise_equal():
    """Batch vs per-pair equality on the REAL driver documents table
    (sf0.001) — catches alphabet/length-distribution issues synthetic
    strings might miss (this is the bench's saturated-ring shape)."""
    import duckdb

    from pipeline.textnorm import normalize_py

    texts = [
        r[0]
        for r in duckdb.sql(
            "select text from read_parquet("
            "'/root/testdata/sf0.001/documents.parquet') limit 400"
        ).fetchall()
    ]
    norms = [normalize_py(t) for t in texts]
    n = len(norms)
    roles = ["ua", "uaua", "uauaua", "au"]
    na = [norms[i] for i in range(n)]
    nb = [norms[(i + 1) % n] for i in range(n)]
    ra = [roles[i % 4] for i in range(n)]
    rb = [roles[(i + 1) % 4] for i in range(n)]
    _assert_rows_equal(na, nb, ra, rb)
