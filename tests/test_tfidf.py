"""Tokenizer + TF-IDF goldens on a tiny hand-computed corpus
(reference test style 1 — assertion goldens, SURVEY §5)."""

import math

import pytest
from pyspark.sql import functions as F

from address_match_recommend_spark.config import PipelineConfig
from address_match_recommend_spark.functions.tokenize import (
    explode_tokens,
    make_tokenize_udf,
    tokenize_col,
)
from address_match_recommend_spark.operators.tfidf import (
    document_frequency,
    idf_table,
    tfidf_vectors,
)


@pytest.fixture(scope="module")
def mini(spark):
    rows = [
        ("d1", "the cat sat"),
        ("d2", "the cat ran"),
        ("d3", "a dog ran far"),
    ]
    return spark.createDataFrame(rows, "conv_id string, canonical_text string")


def test_tokenize_builtin(spark):
    df = spark.createDataFrame(
        [("x", "Hello, World! run-42 __x9__")], "conv_id string, canonical_text string"
    )
    toks = df.select(tokenize_col(F.col("canonical_text")).alias("t")).first()["t"]
    assert toks == ["hello", "world", "run", "42", "x9"]


def test_tokenize_udf_matches_builtin(spark, tiny_tables):
    from address_match_recommend_spark.operators.canonicalize import canonicalize

    conv = canonicalize(tiny_tables["transcripts"]).limit(20)
    udf = make_tokenize_udf()
    both = conv.select(
        tokenize_col(F.col("canonical_text")).alias("a"),
        udf(F.col("canonical_text")).alias("b"),
    )
    assert both.filter(F.col("a") != F.col("b")).count() == 0


def test_document_frequency(spark, mini):
    tokens = explode_tokens(mini)
    df_counts = {r["token"]: r["df"] for r in document_frequency(tokens).collect()}
    assert df_counts == {"the": 2, "cat": 2, "sat": 1, "ran": 2, "a": 1, "dog": 1, "far": 1}


def test_idf_values(spark, mini):
    tokens = explode_tokens(mini)
    idf = {r["token"]: r["idf"] for r in idf_table(tokens, 3).collect()}
    assert idf["the"] == pytest.approx(max(math.log(3 / 3), 0.0))
    assert idf["sat"] == pytest.approx(math.log(3 / 2))


def test_vectors_norm_and_tf(spark, mini):
    cfg = PipelineConfig()
    tokens = explode_tokens(mini)
    idf = idf_table(tokens, 3, cfg)
    vec = {r["conv_id"]: r for r in tfidf_vectors(tokens, idf, cfg).collect()}
    d3 = vec["d3"]
    assert d3["n_tokens"] == 4
    # weight(token) = (1/4) * ln(3/2) for each of the 4 singleton tokens
    w = 0.25 * math.log(3 / 2)
    for tok in ("a", "dog", "far"):
        assert d3["vec"][tok] == pytest.approx(w)
    assert d3["vec"]["ran"] == pytest.approx(0.25 * math.log(3 / 3))
    expected_norm = math.sqrt(3 * w * w)  # 'ran' has idf 0
    assert d3["norm"] == pytest.approx(expected_norm)


def test_broadcast_idf_flag_identical_vectors(spark, mini):
    """cfg.broadcast_idf=False drops the forced broadcast hint on the IDF
    weight join (VERDICT r4 Missing #3: a 10^12-turn raw vocabulary can
    outgrow executor memory; AQE then picks broadcast vs shuffle from
    runtime stats) — the vectors must be IDENTICAL either way."""
    tokens = explode_tokens(mini)
    idf = idf_table(tokens, 3)
    on = tfidf_vectors(tokens, idf, PipelineConfig(broadcast_idf=True))
    off = tfidf_vectors(tokens, idf, PipelineConfig(broadcast_idf=False))

    def rows(df):
        return {
            (r["conv_id"], r["n_tokens"], round(r["norm"], 12),
             tuple(sorted((k, round(v, 12)) for k, v in r["vec"].items())))
            for r in df.collect()
        }

    assert rows(on) == rows(off)
    # the hint is really gone: only the flag-on logical plan carries it
    assert "hint" in on._jdf.queryExecution().logical().toString().lower()
    assert "hint" not in off._jdf.queryExecution().logical().toString().lower()
