"""Exact deduplication — the analog of the reference's Bloom-filter
short-circuit (/root/reference/core/similarity.go:55-61, utils/bloom.go).

The reference answers "have I seen this exact raw text?" with an in-memory
FNV Bloom filter sized n=1e6, p=1e-5 (:29) plus a confirming
``WHERE raw_text=?``. Distributed, the same semantics is a hash aggregation
on sha2(canonical_text): one shuffle, map-side combined, no false
positives, no 1e6-row ceiling. (A probabilistic pre-filter is still
available at scale via ``DataFrame.stat.bloomFilter`` or parquet/Iceberg
bloom write-properties; unnecessary here because the hash agg IS the
blocking stage for exact dups.)

Near-duplicate families (MinHash-LSH / SimHash / n-gram Jaccard) live in
``operators/neardup.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def exact_dup_groups(conversations: DataFrame, hash_col: str = "text_hash") -> DataFrame:
    """(conv_id, rep_id) for conversations whose canonical text is
    byte-identical; rep_id = min conv_id of the group."""
    reps = conversations.groupBy(hash_col).agg(
        F.min("conv_id").alias("rep_id"), F.count(F.lit(1)).alias("n")
    )
    return (
        conversations.select("conv_id", hash_col)
        .join(reps.filter(F.col("n") > 1).drop("n"), hash_col)
        .select("conv_id", "rep_id")
    )


def dedup_exact(conversations: DataFrame, hash_col: str = "text_hash") -> DataFrame:
    """One representative row per distinct canonical text (min conv_id
    wins — deterministic under shuffle). Equivalent semantics to the
    reference's "exact duplicate → don't re-score" fast path."""
    w_min = conversations.groupBy(hash_col).agg(F.min("conv_id").alias("conv_id"))
    return conversations.join(w_min, [hash_col, "conv_id"], "left_semi")


def exact_dup_edges(conversations: DataFrame, hash_col: str = "text_hash") -> DataFrame:
    """(conv_id_a, conv_id_b) edges rep ↔ duplicate, feeding the
    connected-components stage so exact dups land in the same entity
    without being pairwise-scored."""
    groups = exact_dup_groups(conversations, hash_col)
    return (
        groups.filter(F.col("conv_id") != F.col("rep_id"))
        .select(
            F.least("rep_id", "conv_id").alias("conv_id_a"),
            F.greatest("rep_id", "conv_id").alias("conv_id_b"),
        )
    )
