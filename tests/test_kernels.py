"""Kernel golden values + property tests (SURVEY.md §5.2 item 1).

Golden values cross-checked against published rapidfuzz/Jaro-Winkler
examples; the bit-parallel LCS is property-tested against a reference DP.
"""

from __future__ import annotations

import random
import string

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pipeline import kernels as K


def lcs_dp(a: str, b: str) -> int:
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            dp[i][j] = (
                dp[i - 1][j - 1] + 1
                if a[i - 1] == b[j - 1]
                else max(dp[i - 1][j], dp[i][j - 1])
            )
    return dp[-1][-1]


@given(
    st.text(alphabet="abcd ", max_size=40), st.text(alphabet="abcd ", max_size=40)
)
@settings(max_examples=200, deadline=None)
def test_lcs_bitparallel_matches_dp(a, b):
    assert K.lcs_length(a, b) == lcs_dp(a, b)


def test_indel_ratio_golden():
    # rapidfuzz fuzz.ratio("hello world","hello wrld") == 95.238...
    assert K.indel_ratio("hello world", "hello wrld") == pytest.approx(
        95.23809523809523
    )
    assert K.indel_ratio("", "") == 100.0
    assert K.indel_ratio("abc", "") == 0.0
    assert K.indel_ratio("abc", "abc") == 100.0
    # InDel != plain Levenshtein: substitution costs 2
    assert K.indel_distance("abc", "abd") == 2


def test_token_sort_ratio():
    assert K.token_sort_ratio("world hello", "hello world") == 100.0
    assert K.token_sort_ratio("a b c", "c a b") == 100.0


def test_partial_ratio():
    assert K.partial_ratio("abc", "xxabcxx") == 100.0
    assert K.partial_ratio("hello", "say hello world") == 100.0
    assert K.partial_ratio("", "x") == 0.0


def test_jaro_winkler_golden():
    # canonical textbook values
    assert K.jaro_winkler("martha", "marhta") == pytest.approx(0.9611111111)
    assert K.jaro_winkler("dixon", "dicksonx") == pytest.approx(0.8133333333)
    assert K.jaro_winkler("abc", "abc") == 1.0
    assert K.jaro_winkler("", "") == 1.0
    assert K.jaro_winkler("a", "") == 0.0


def test_token_set_jaccard():
    assert K.token_set_jaccard("a b c", "c b a") == 1.0
    assert K.token_set_jaccard("a b", "b c") == pytest.approx(1 / 3)
    assert K.token_set_jaccard("", "") == 1.0


def test_ngram_jaccard():
    assert K.ngram_jaccard("abcd", "abcd") == 1.0
    assert 0.0 < K.ngram_jaccard("abcdef", "abcxef") < 1.0


@given(st.text(alphabet="ab ", max_size=30), st.text(alphabet="ab ", max_size=30))
@settings(max_examples=100, deadline=None)
def test_ratio_bounds_and_symmetry(a, b):
    r = K.indel_ratio(a, b)
    assert 0.0 <= r <= 100.0
    assert r == K.indel_ratio(b, a)
