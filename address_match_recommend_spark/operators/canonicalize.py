"""Stage 1 — canonicalize: transcripts → conversations.

The analog of the reference's ``Interpret`` stage
(/root/reference/core/interpreter.go:169-200): the raw record (there a
free-text address, here a multi-turn transcript) becomes one structured row
per logical entity-candidate. The per-row invariant (BASELINE.json
input_hint) is **per-turn text equality under stable turn ordering**:
canonical_text is the newline-join of turn texts sorted by turn_idx, stable
under shuffle because the sort key is carried inside the aggregated array
(``array_sort`` on ``struct(turn_idx, text)``), never left to partition
order.

Scale note: this is a single hash aggregation on conv_id — one shuffle,
map-side partial aggregation, no window (a window would sort whole
partitions; collect_list+array_sort only sorts within each conversation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig


def _turn_struct():
    """Struct carried per turn inside the sort array; turn_idx leads so
    array_sort orders by it (text as deterministic tie-break)."""
    return F.struct(
        F.col("turn_idx").alias("turn_idx"),
        F.col("text").alias("text"),
        F.col("role").alias("role"),
        F.col("tool").alias("tool"),
    )


def canonicalize(
    transcripts: DataFrame, cfg: PipelineConfig | None = None
) -> DataFrame:
    """Aggregate turn rows into one conversation row.

    Output schema: conv_id, canonical_text, n_turns, roles array<string>,
    tools array<string>, first_ts, last_ts, text_hash (sha256 of
    canonical_text — the exact-dedup key, analog of the reference's Bloom
    key /root/reference/core/similarity.go:55-61).

    Blank guard (F2, /root/reference/core/similarity.go:50-52): when
    cfg.drop_blank_conversations (default True), conversations whose
    canonical text is empty/whitespace-only are dropped HERE, so they
    never reach tokenize/blocking/scoring — they would tokenize to empty
    vectors and only ever produce noise pairs through structural tokens.
    """
    cfg = cfg or PipelineConfig()
    turns_sorted = F.array_sort(F.collect_list(_turn_struct()))
    df = (
        transcripts.groupBy("conv_id")
        .agg(
            turns_sorted.alias("turns"),
            F.count(F.lit(1)).cast("int").alias("n_turns"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .select(
            "conv_id",
            F.array_join(F.transform("turns", lambda t: t["text"]), "\n").alias(
                "canonical_text"
            ),
            "n_turns",
            F.transform("turns", lambda t: t["role"]).alias("roles"),
            F.filter(
                F.transform("turns", lambda t: t["tool"]),
                lambda x: (x.isNotNull()) & (x != ""),
            ).alias("tools"),
            "first_ts",
            "last_ts",
        )
        .withColumn("text_hash", F.sha2(F.col("canonical_text"), 256))
    )
    if cfg.drop_blank_conversations:
        df = df.filter(F.trim(F.coalesce(F.col("canonical_text"), F.lit(""))) != "")
    return df
