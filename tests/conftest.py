"""Shared pytest fixtures: one SparkSession per test run, tiny corpus."""

from __future__ import annotations

import pytest

from address_match_recommend_spark.datagen import Corpus, corpus_to_spark, generate_corpus
from address_match_recommend_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="tests",
        cores=8,
        shuffle_partitions=8,
        driver_memory="8g",
    )
    yield s


@pytest.fixture(scope="session")
def tiny_corpus() -> Corpus:
    return generate_corpus(n_entities=12, seed=42)


@pytest.fixture(scope="session")
def tiny_tables(spark, tiny_corpus):
    return corpus_to_spark(spark, tiny_corpus)
