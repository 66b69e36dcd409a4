"""coord/density parity measures (reference A4/A5, documented float math)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from address_match_recommend_spark.operators.scoring import coord_density


def test_coord_density_hand_computed(spark):
    # query a: tokens [x y z y] (4 positions); doc b contains {x, y}
    rows = [
        ("a", 0, "x"), ("a", 1, "y"), ("a", 2, "z"), ("a", 3, "y"),
        ("b", 0, "x"), ("b", 1, "y"), ("b", 2, "q"),
    ]
    tokens = spark.createDataFrame(rows, "conv_id string, pos int, token string")
    pairs = spark.createDataFrame([("a", "b")], "conv_id_a string, conv_id_b string")
    got = coord_density(pairs, tokens).collect()[0]
    # matched positions in a: 0 (x), 1 (y), 3 (y) → matched=3, span 0..3
    assert got["matched"] == 3
    assert got["coord"] == pytest.approx(math.sqrt(3 / 4) * 0.5 + 0.5)
    assert got["density"] == pytest.approx(math.sqrt(3 / 4) * 0.5 + 0.5)


def test_identical_docs_perfect_scores(spark):
    rows = [("a", i, t) for i, t in enumerate(["u", "v", "w"])] + [
        ("b", i, t) for i, t in enumerate(["u", "v", "w"])
    ]
    tokens = spark.createDataFrame(rows, "conv_id string, pos int, token string")
    pairs = spark.createDataFrame([("a", "b")], "conv_id_a string, conv_id_b string")
    got = coord_density(pairs, tokens).collect()[0]
    # all positions match, contiguous span → coord = density = 1.0
    assert got["coord"] == pytest.approx(1.0)
    assert got["density"] == pytest.approx(1.0)


def test_no_overlap_pair_absent(spark):
    rows = [("a", 0, "x"), ("b", 0, "y")]
    tokens = spark.createDataFrame(rows, "conv_id string, pos int, token string")
    pairs = spark.createDataFrame([("a", "b")], "conv_id_a string, conv_id_b string")
    assert coord_density(pairs, tokens).count() == 0
