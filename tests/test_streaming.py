"""Structured Streaming ingest: exactly-once file drain, watermarked
exact-dedup, append-mode canonicalization (stable turn ordering)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from address_match_recommend_spark.datagen import corpus_to_spark
from address_match_recommend_spark.streaming.ingest import (
    stream_transcripts,
    streaming_canonicalize,
    streaming_exact_dedup,
    write_stream_parquet,
)
from address_match_recommend_spark.operators.canonicalize import canonicalize


@pytest.fixture(scope="module")
def transcript_files(spark, tiny_corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("stream_in"))
    tables = corpus_to_spark(spark, tiny_corpus)
    tables["transcripts"].repartition(4).write.mode("overwrite").parquet(path)
    return path


def _drain(spark, stream_df, out, ck):
    q = write_stream_parquet(stream_df, out, ck, available_now=True)
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_streaming_dedup_drains_all_distinct_turns(spark, transcript_files, tmp_path):
    stream = streaming_exact_dedup(stream_transcripts(spark, transcript_files))
    got = _drain(spark, stream, str(tmp_path / "out"), str(tmp_path / "ck"))
    batch = spark.read.parquet(transcript_files)
    want = batch.dropDuplicates(["conv_id", "turn_idx", "text"]).count()
    assert got.count() == want
    assert set(got.columns) == set(batch.columns)


def test_streaming_canonicalize_matches_batch(spark, transcript_files, tmp_path):
    """Append-mode watermarked canonicalization emits the same
    (conv_id → canonical_text) as the batch stage once windows close.
    Conversations whose turns span a window boundary emit per-window
    partials; the fixture corpus keeps each conversation within one hour,
    so window output == batch output."""
    stream = streaming_canonicalize(
        stream_transcripts(spark, transcript_files), watermark="1 hour"
    )
    got = _drain(spark, stream, str(tmp_path / "out"), str(tmp_path / "ck"))

    batch = canonicalize(spark.read.parquet(transcript_files)).select(
        "conv_id", "canonical_text", "text_hash"
    )
    merged = (
        got.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_windows"))
        .filter(F.col("n_windows") > 1)
    )
    # every conversation that landed wholly in one window must match batch
    single = got.join(merged, "conv_id", "left_anti").select(
        "conv_id", "canonical_text"
    )
    assert single.count() > 0
    got_rows = {
        (r["conv_id"], r["canonical_text"]) for r in single.collect()
    }
    want_rows = {
        (r["conv_id"], r["canonical_text"])
        for r in batch.join(single.select("conv_id"), "conv_id").collect()
    }
    assert got_rows == want_rows


def test_streaming_is_incremental(spark, transcript_files, tmp_path):
    """Second drain over the same input emits nothing new (exactly-once
    from the streaming checkpoint)."""
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    stream = streaming_exact_dedup(stream_transcripts(spark, transcript_files))
    first = _drain(spark, stream, out, ck).count()
    again = _drain(
        spark,
        streaming_exact_dedup(stream_transcripts(spark, transcript_files)),
        out,
        ck,
    ).count()
    assert again == first
