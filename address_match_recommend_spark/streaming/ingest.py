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
- ``streaming_exact_dedup`` keys state by sha256(conv_id, turn_idx, text)
  via ``dropDuplicatesWithinWatermark`` so the state store actually
  EVICTS keys older than the watermark horizon (round-2 fix: plain
  ``dropDuplicates`` on a non-event-time subset never evicts — unbounded
  state on a long-running stream). The streaming twin of the batch
  hash-dedup / the reference's Bloom filter (bounded at n=1e6 keys;
  state store + watermark removes that ceiling).
- ``streaming_canonicalize`` groups by ``(conv_id, session_window(ts))``
  in append mode: a conversation emits ONE canonical row per activity
  session, where the session keeps extending as long as consecutive
  turns arrive within ``gap`` of each other — a conversation spanning
  many hours of steady activity stays one row (round-2 fix: the previous
  fixed ``window(ts, watermark)`` split any conversation straddling an
  aligned boundary into multiple rows with the same conv_id, violating
  the one-row-per-conversation layout downstream batch stages read).
  A conversation only splits if its turns pause for longer than ``gap``
  — that split is inherent to append-mode streaming (state must be
  emittable); re-unifying dormant-then-resumed conversations is a batch
  re-run over the affected conv_ids, found by anti-join on the lineage
  ledger (the documented late-data policy).
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
    # dropDuplicatesWithinWatermark (not dropDuplicates): dedup state for a
    # key is evicted once the watermark passes its event time — bounded
    # state on an unbounded stream. Plain dropDuplicates on a subset
    # without the event-time column keeps every key forever.
    return (
        keyed.withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["turn_hash"])
        .drop("turn_hash")
    )


def streaming_canonicalize(
    stream: DataFrame, watermark: str = "1 hour", gap: str = "1 hour"
) -> DataFrame:
    """Session-windowed per-conversation canonicalization (append mode).

    Same invariant as the batch stage (stable turn ordering, per-turn text
    equality): turns are collected with their turn_idx and array_sort'ed
    inside the aggregate, never left to arrival order. A session keeps
    extending while consecutive turns arrive within ``gap``, so one
    active conversation = one emitted row no matter how long it runs
    (see module docstring); the row emits once the watermark passes the
    session's close.
    """
    turn = F.struct(
        F.col("turn_idx").alias("turn_idx"), F.col("text").alias("text")
    )
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.col("conv_id"), F.session_window(F.col("ts"), gap).alias("w"))
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
