"""Near-dup family: MinHash-LSH, SimHash, n-gram Jaccard."""

import pytest
from pyspark.sql import functions as F

from address_match_recommend_spark.operators.neardup import (
    minhash_jaccard_estimate,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_pairs,
    word_ngrams,
)


@pytest.fixture(scope="module")
def docs(spark):
    base = "spark shuffles data across the cluster when joins need colocation of keys"
    near = "spark shuffles data across the network when joins need colocation of keys"
    rows = [
        ("a", base),
        ("b", base),  # exact dup
        ("c", near),  # near dup
        ("d", "completely unrelated text about cooking pasta with tomato sauce"),
        ("e", "another unrelated document discussing mountain hiking trails today"),
    ]
    return spark.createDataFrame(rows, "id string, text string")


def test_minhash_identical_and_near(spark, docs):
    sigs = minhash_signatures(docs, n_hashes=32)
    pairs = minhash_lsh_pairs(sigs, n_hashes=32, bands=8)
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in minhash_jaccard_estimate(sigs, pairs, 32).collect()
    }
    assert est[("a", "b")] == 1.0
    assert est[("a", "c")] > 0.5
    assert ("a", "d") not in est or est[("a", "d")] < 0.3


def test_simhash_hamming(spark, docs):
    sigs = simhash(docs)
    vals = {r["id"]: r["simhash"] for r in sigs.collect()}
    assert vals["a"] == vals["b"]
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"] for r in simhash_pairs(sigs, 16).collect()
    }
    assert pairs[("a", "b")] == 0
    assert pairs[("a", "c")] <= 16


def test_word_ngrams(spark):
    df = spark.createDataFrame([("x", "a b c d")], "id string, text string")
    got = df.select(word_ngrams(F.col("text"), 2).alias("g")).first()["g"]
    assert got == ["a_b", "b_c", "c_d"]


def test_ngram_jaccard(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, n=3).collect()
    }
    assert pairs[("a", "b")] == pytest.approx(1.0)
    assert 0.3 < pairs[("a", "c")] < 1.0
    assert ("a", "d") not in pairs
