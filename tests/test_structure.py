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


def test_boosted_vectors_scale_weights(spark, tiny_tables):
    """tfidf_vectors consumes the boost column: weight = tf·idf·boost
    (reference C14, /root/reference/core/similarity.go:494,513-516)."""
    from address_match_recommend_spark.config import PipelineConfig
    from address_match_recommend_spark.operators.tfidf import idf_table, tfidf_vectors

    conv = canonicalize(tiny_tables["transcripts"])
    toks = boost_weights(tokens_with_structure(conv))
    cfg = PipelineConfig(use_tf=False)
    idf = idf_table(toks, conv.count())
    vec = tfidf_vectors(toks, idf, cfg)
    # pick one conversation's nturns token: weight must be idf·3.0
    row = (
        vec.select("conv_id", F.explode("vec").alias("token", "w"))
        .filter(F.col("token").startswith("nturns:"))
        .first()
    )
    idf_val = idf.filter(F.col("token") == row["token"]).first()["idf"]
    assert abs(row["w"] - idf_val * DEFAULT_BOOSTS["N"]) < 1e-9


def test_nturns_nearmiss_raises_cosine(spark):
    """The pair-conditional near-miss (reference road-number analog,
    similarity.go:305-316): two conversations with identical text but
    nturns buckets 4 vs 8 get a dampened — not zero — structural
    contribution, so cosine WITH the near-miss beats cosine without."""
    from datetime import datetime

    from address_match_recommend_spark.config import PipelineConfig
    from address_match_recommend_spark.operators.scoring import score_pairs
    from address_match_recommend_spark.operators.tfidf import idf_table, tfidf_vectors

    TS = datetime(2025, 1, 1)
    rows = []
    # c1: 7 turns (bucket 4), c2: 9 turns (bucket 8), same text per turn
    for i in range(7):
        rows.append(("c1", i, "user", "shared content words here", "", TS))
    for i in range(9):
        rows.append(("c2", i, "user", "shared content words here", "", TS))
    # distractor so idf is finite
    rows.append(("c3", 0, "user", "completely different topic entirely", "", TS))
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    conv = canonicalize(t).persist()
    toks = boost_weights(tokens_with_structure(conv))
    cfg = PipelineConfig(use_structure=True, use_tf=False, tau_lo=0.0)
    idf = idf_table(toks, conv.count())
    vec = tfidf_vectors(toks, idf, cfg).persist()
    vec.count()
    pairs = spark.createDataFrame(
        [("c1", "c2")], "conv_id_a string, conv_id_b string"
    )
    # control: conversations=None skips the near-miss block
    c0 = score_pairs(pairs, vec, None, cfg).first()["cosine"]
    c1 = score_pairs(pairs, vec, conv, cfg).first()["cosine"]
    assert c1 > c0, (c0, c1)
    assert c1 < 1.0


def test_nturns_damp_raw_parity_mode(spark):
    """nturns_damp_raw (ADVICE r2): same-bucket pairs with unequal RAW
    turn counts (9 vs 15, both bucket 8) keep the full 3.0 exact boost by
    default but are dampened under the parity flag — so parity cosine <
    default cosine, and equal raw counts are untouched by the flag."""
    from datetime import datetime

    from address_match_recommend_spark.config import PipelineConfig
    from address_match_recommend_spark.operators.scoring import score_pairs
    from address_match_recommend_spark.operators.tfidf import idf_table, tfidf_vectors

    TS = datetime(2025, 1, 1)
    rows = []
    for i in range(9):
        rows.append(("c1", i, "user", "shared content words here", "", TS))
    for i in range(15):
        rows.append(("c2", i, "user", "shared content words here", "", TS))
    # three distractors so df=2 tokens (incl. nturns:8) keep idf > 0
    rows.append(("c3", 0, "user", "completely different topic entirely", "", TS))
    rows.append(("c4", 0, "user", "another unrelated subject matter", "", TS))
    rows.append(("c5", 0, "user", "yet more dissimilar filler prose", "", TS))
    t = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
    )
    conv = canonicalize(t).persist()
    toks = boost_weights(tokens_with_structure(conv))
    cfg = PipelineConfig(use_structure=True, use_tf=False, tau_lo=0.0)
    cfg_damp = PipelineConfig(
        use_structure=True, use_tf=False, tau_lo=0.0, nturns_damp_raw=True
    )
    idf = idf_table(toks, conv.count())
    vec = tfidf_vectors(toks, idf, cfg).persist()
    vec.count()
    pairs = spark.createDataFrame(
        [("c1", "c2")], "conv_id_a string, conv_id_b string"
    )
    c_default = score_pairs(pairs, vec, conv, cfg).first()["cosine"]
    c_damp = score_pairs(pairs, vec, conv, cfg_damp).first()["cosine"]
    assert c_damp < c_default, (c_damp, c_default)
    assert c_damp > 0


def test_structure_mode_f1_gate(spark):
    """Boosts must not regress the end-to-end F1 gate (judge round-1 #4)."""
    from address_match_recommend_spark.config import PipelineConfig
    from address_match_recommend_spark.datagen import corpus_to_spark, generate_corpus
    from address_match_recommend_spark.plans.evaluate import pairwise_f1
    from address_match_recommend_spark.plans.pipeline import run_pipeline

    tables = corpus_to_spark(spark, generate_corpus(n_entities=120, seed=1234))
    cfg = PipelineConfig(use_structure=True)
    result = run_pipeline(tables["transcripts"], cfg)
    metrics = pairwise_f1(
        tables["labeled_pairs"], result.clusters, by_blocking_key=True
    )
    assert metrics["f1"] >= 0.99, metrics


def test_explain_matches(spark, tiny_tables):
    """Explain output — reference MatchedTerm{Term, Coord, Density, Boost,
    TfIdf} (/root/reference/models/matched_term.go:4-10)."""
    from address_match_recommend_spark.config import PipelineConfig
    from address_match_recommend_spark.operators.scoring import explain_matches
    from address_match_recommend_spark.operators.tfidf import idf_table, tfidf_vectors

    conv = canonicalize(tiny_tables["transcripts"]).persist()
    toks = boost_weights(tokens_with_structure(conv)).persist()
    toks.count()
    idf = idf_table(toks, conv.count())
    vec = tfidf_vectors(toks, idf).persist()
    vec.count()
    ids = [r["conv_id"] for r in conv.select("conv_id").orderBy("conv_id").limit(2).collect()]
    pairs = spark.createDataFrame(
        [(ids[0], ids[1])], "conv_id_a string, conv_id_b string"
    )
    exp = explain_matches(pairs, vec, toks).toPandas()
    assert len(exp) > 0
    # matched terms exist on both sides (weight 0 is legal: idf=0 for
    # tokens present in every conversation)
    assert (exp["w_a"] >= 0).all() and (exp["w_b"] >= 0).all()
    assert (exp["w_a"] > 0).any()
    # typed terms carry their boost; coord/density = -1 for non-text
    typed = exp[exp["type"] != "X"]
    if len(typed):
        assert set(typed["coord"]) == {-1.0} and set(typed["density"]) == {-1.0}
        for _, r in typed.iterrows():
            assert r["boost"] == DEFAULT_BOOSTS[r["type"]]
    text = exp[exp["type"] == "X"]
    if len(text):
        assert ((text["coord"] >= 0.5) & (text["coord"] <= 1.0)).all()
        assert (text["boost"] == DEFAULT_BOOSTS["X"]).all()


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
