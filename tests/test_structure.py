"""Typed structural tokens + boost table (reference C14 analog)."""

from __future__ import annotations

from pyspark.sql import functions as F

from address_match_recommend_spark.operators.canonicalize import canonicalize
from address_match_recommend_spark.operators.structure import (
    DEFAULT_BOOSTS,
    boost_weights,
    tokens_with_structure,
    typed_tokens,
)


def test_typed_tokens(spark, tiny_tables):
    conv = canonicalize(tiny_tables["transcripts"])
    toks = typed_tokens(conv)
    by_type = {
        r["type"]: r["n"]
        for r in toks.groupBy("type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    n_conv = conv.count()
    assert by_type["N"] == n_conv  # exactly one turn-bucket per conversation
    assert by_type["R"] >= n_conv  # ≥1 role each
    # tokens are namespaced
    assert toks.filter(~F.col("token").rlike("^(role|tool|nturns):")).count() == 0
    # nturns bucket is a power of two
    sample = toks.filter(F.col("type") == "N").select("token").first()["token"]
    bucket = int(sample.split(":")[1])
    assert bucket & (bucket - 1) == 0


def test_boost_weights(spark, tiny_tables):
    conv = canonicalize(tiny_tables["transcripts"])
    boosted = boost_weights(typed_tokens(conv))
    got = {
        r["type"]: r["b"]
        for r in boosted.groupBy("type").agg(F.first("boost").alias("b")).collect()
    }
    for t, b in got.items():
        assert b == DEFAULT_BOOSTS[t]


def test_tokens_with_structure_union(spark, tiny_tables):
    conv = canonicalize(tiny_tables["transcripts"])
    both = tokens_with_structure(conv)
    types = {r["type"] for r in both.select("type").distinct().collect()}
    assert "X" in types and "R" in types and "N" in types
    # structural tokens never collide with text tokens (':' unreachable by
    # the tokenizer pattern)
    text_colliding = both.filter(
        (F.col("type") == "X") & F.col("token").contains(":")
    )
    assert text_colliding.count() == 0
