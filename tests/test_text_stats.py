"""Text-analysis functions: token counts, quality, lang-id, fingerprint."""

import pytest
from pyspark.sql import functions as F

from address_match_recommend_spark.functions.text_stats import (
    bpe_ish_token_count,
    content_fingerprint,
    lang_id,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
)


@pytest.fixture(scope="module")
def texts(spark):
    rows = [
        (1, "the cat and the dog sat in a house for fun"),
        (2, "der hund ist nicht ein katze und der vogel"),
        (3, "le chat est un animal et les chiens"),
        (4, "xyzzy qwerty plugh"),
        (5, "!!! ??? ***"),
    ]
    return spark.createDataFrame(rows, "id int, text string")


def _one(df, col, id_):
    return {r["id"]: r["v"] for r in df.select("id", col.alias("v")).collect()}[id_]


def test_token_count(spark, texts):
    assert _one(texts, token_count(F.col("text")), 1) == 11
    assert _one(texts, token_count(F.col("text")), 5) == 0


def test_bpe_ish(spark, texts):
    # "xyzzy qwerty plugh" → ceil(5/4)+ceil(6/4)+ceil(5/4) = 2+2+2
    assert _one(texts, bpe_ish_token_count(F.col("text")), 4) == 6


def test_punct_ratio(spark, texts):
    assert _one(texts, punct_ratio(F.col("text")), 1) == 0.0
    assert _one(texts, punct_ratio(F.col("text")), 5) > 0.5


def test_stopword_ratio(spark, texts):
    v = _one(texts, stopword_ratio(F.col("text"), "en"), 1)
    assert v == pytest.approx(6 / 11)  # the, and, the, in, a, for


def test_lang_id(spark, texts):
    got = {r["id"]: r["v"] for r in texts.select("id", lang_id(F.col("text")).alias("v")).collect()}
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[5] == "und"


def test_quality_score_bounds(spark, texts):
    vals = [r["v"] for r in texts.select(quality_score(F.col("text")).alias("v")).collect()]
    assert all(0.0 <= v <= 1.0 for v in vals)


def test_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta alpha"), (3, "alpha beta delta")],
        "id int, text string",
    )
    got = {r["id"]: r["v"] for r in df.select("id", content_fingerprint(F.col("text")).alias("v")).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]
