"""Degenerate inputs must not crash the pipeline (reference F2 blank
guard, /root/reference/core/similarity.go:50-52, generalized)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from address_match_recommend_spark.datagen import TRANSCRIPTS_DDL
from address_match_recommend_spark.plans.pipeline import find_similar, run_pipeline

TS = datetime(2025, 1, 1)


def test_empty_transcripts(spark):
    empty = spark.createDataFrame([], TRANSCRIPTS_DDL)
    res = run_pipeline(empty)
    assert res.clusters.count() == 0
    assert res.scored.count() == 0


def test_single_conversation(spark):
    rows = [("c1", 0, "user", "hello world", "", TS), ("c1", 1, "assistant", "hi", "", TS)]
    res = run_pipeline(spark.createDataFrame(rows, TRANSCRIPTS_DDL))
    got = res.clusters.collect()
    assert len(got) == 1 and got[0]["entity_id"] == "c1"


def test_all_exact_duplicates(spark):
    rows = []
    for i in range(5):
        rows += [(f"c{i}", 0, "user", "identical text", "", TS)]
    res = run_pipeline(spark.createDataFrame(rows, TRANSCRIPTS_DDL))
    ents = {r["entity_id"] for r in res.clusters.collect()}
    assert ents == {"c0"}  # one cluster, min-id representative
    assert res.scored.count() == 0  # nothing was pairwise-scored


def test_blank_text_conversations_dropped(spark):
    """F2 blank guard (default ON): whitespace-only conversations are
    dropped at canonicalize and never reach blocking/scoring."""
    rows = [
        ("c1", 0, "user", "", "", TS),
        ("c2", 0, "user", "   ", "", TS),
        ("c3", 0, "user", "real content here about spark", "", TS),
    ]
    res = run_pipeline(spark.createDataFrame(rows, TRANSCRIPTS_DDL))
    clusters = {r["conv_id"]: r["entity_id"] for r in res.clusters.collect()}
    assert set(clusters) == {"c3"} and clusters["c3"] == "c3"


def test_blank_text_conversations_guard_off(spark):
    """With the guard off, blanks survive as exact duplicates of each
    other and are still never pairwise-scored (empty token vectors)."""
    from address_match_recommend_spark.config import PipelineConfig

    rows = [
        ("c1", 0, "user", "", "", TS),
        ("c2", 0, "user", "", "", TS),
        ("c3", 0, "user", "real content here about spark", "", TS),
    ]
    cfg = PipelineConfig(drop_blank_conversations=False)
    res = run_pipeline(spark.createDataFrame(rows, TRANSCRIPTS_DDL), cfg)
    clusters = {r["conv_id"]: r["entity_id"] for r in res.clusters.collect()}
    assert clusters["c1"] == clusters["c2"] == "c1"
    assert clusters["c3"] == "c3"
    assert res.scored.count() == 0


def test_find_similar_empty(spark):
    empty = spark.createDataFrame([], TRANSCRIPTS_DDL)
    assert find_similar(empty).count() == 0
