"""Structured Streaming ingest — the incremental-import path at scale.

The reference's write path is a synchronous per-record insert + Bloom-set
(``ImportAddr``, /root/reference/core/similarity.go:551-581) and a
line-by-line bulk import (/root/reference/sh/import_base_addrs.go:13-68).
The streaming analog: a file/Iceberg stream of transcript turns →
watermarked dedup / canonicalization → durable sink, with exactly-once
file-source semantics from the streaming checkpoint.

Batch remains the primary execution mode (SURVEY §2.10 — the reference is
batch + point inserts); these operators make the ingest edge continuous
without changing any downstream batch stage: the sink table is the same
transcripts/conversations layout the batch pipeline reads.

Scale notes
-----------
- ``streaming_exact_dedup`` keys state by sha256(conv_id, turn text) with a
  watermark so state is bounded — the streaming twin of the batch
  hash-dedup (the reference's Bloom filter, bounded at n=1e6 keys; state
  store + watermark removes that ceiling).
- ``streaming_canonicalize`` is a watermarked groupBy(conv_id) in append
  mode: a conversation is emitted once its event-time window closes (late
  turns beyond the watermark are dropped — the documented late-data
  policy; re-opening closed conversations is a batch re-run over the
  affected conv_ids, found by anti-join on the lineage ledger).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.readers import TRANSCRIPTS_SCHEMA


def stream_transcripts(
    spark: SparkSession, path: str, fmt: str = "parquet", max_files: int = 16
) -> DataFrame:
    """File-source stream of transcript turns (exactly-once per file via
    the sink's streaming checkpoint; ``maxFilesPerTrigger`` bounds batch
    size so one trigger never reads an unbounded backlog)."""
    return (
        spark.readStream.format(fmt)
        .schema(TRANSCRIPTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .load(path)
    )


def streaming_exact_dedup(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Drop turns whose (conv_id, turn_idx, text) was already seen within
    the watermark horizon — the streaming analog of the reference's
    Bloom-filter fast path (/root/reference/core/similarity.go:55-61),
    with bounded state instead of a fixed-size filter."""
    keyed = stream.withColumn(
        "turn_hash",
        F.sha2(
            F.concat_ws(
                "\x00", "conv_id", F.col("turn_idx").cast("string"), "text"
            ),
            256,
        ),
    )
    return keyed.withWatermark("ts", watermark).dropDuplicates(["turn_hash"]).drop(
        "turn_hash"
    )


def streaming_canonicalize(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Watermarked per-conversation canonicalization (append mode).

    Same invariant as the batch stage (stable turn ordering, per-turn text
    equality): turns are collected with their turn_idx and array_sort'ed
    inside the aggregate, never left to arrival order. Emits when the
    max-ts window closes under the watermark.
    """
    turn = F.struct(
        F.col("turn_idx").alias("turn_idx"), F.col("text").alias("text")
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("conv_id"), F.window("ts", watermark).alias("w"))
        .agg(
            F.array_sort(F.collect_list(turn)).alias("turns"),
            F.count(F.lit(1)).cast("int").alias("n_turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )
    return agg.select(
        "conv_id",
        F.array_join(F.transform("turns", lambda t: t["text"]), "\n").alias(
            "canonical_text"
        ),
        "n_turns",
        "first_ts",
        "last_ts",
    ).withColumn("text_hash", F.sha2(F.col("canonical_text"), 256))


def write_stream_parquet(
    canonical: DataFrame,
    out_path: str,
    checkpoint_path: str,
    available_now: bool = True,
):
    """Append sink. ``available_now=True`` drains the current backlog and
    stops — the batch-friendly trigger used in tests and backfills; a
    production tail uses the default continuous micro-batching."""
    writer = (
        canonical.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
