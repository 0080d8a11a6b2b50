from __future__ import annotations

import pytest

from pipeline import synth
from pipeline.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="pytest-linkage", master="local[4]", shuffle_partitions=8
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    """Tiny deterministic corpus (FIXTURES.md sandbox size 'tiny')."""
    return synth.generate(n_base=120, seed=42, hotkey_convs=0)


@pytest.fixture(scope="session")
def hot_corpus():
    return synth.generate(n_base=40, seed=7, hotkey_convs=90)


@pytest.fixture(scope="session")
def turns_df(spark, corpus):
    return spark.createDataFrame(corpus.turns)
