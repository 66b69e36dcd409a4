"""Stage 5/6 — blocking: inverted index → candidate pairs.

The reference blocks by administrative region: ``buildCacheKey`` =
"province-city(-district)" (/root/reference/core/similarity.go:658-668) and
partition-pruned scans LoadAddrsPC/PCD (/root/reference/models/persister.go:
100-121), then scores the query against EVERY record in the block (an
O(N·Q) nested loop, /root/reference/core/similarity.go:74-79).

Here blocking is a DataFrame-materialized inverted index — posting lists
token → conv_id — and candidate generation is a posting-list self-join
(`a.conv_id < b.conv_id` triangular pruning), the standard distributed
sparse-similarity design. Three explicit skew/scale controls (north rule):

1. **df cap** — tokens with df > max_block_df never block (they carry ~zero
   IDF and would quadratically explode the join). Tokens with df < 2
   cannot produce a pair.
2. **per-conversation token budget** — each conversation blocks on at most
   its K rarest tokens, bounding per-record pair fan-out.
3. **salting** — posting lists longer than salt_bucket are split into
   ceil(df/salt_bucket) random sub-blocks; pairs are generated within a
   sub-block. This trades a small recall loss on mid-frequency tokens for
   a hard bound (salt_bucket²/2) on the per-key join fan-out — at 10^12
   turns an unsalted 10^6-long posting list would emit 5·10^11 pairs from
   one key. Duplicate records share many rare tokens, so pair recall
   survives (verified by the F1 gate).

AQE skew-join splitting remains enabled as the runtime backstop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..config import PipelineConfig


def postings(
    tokens: DataFrame,
    idf: DataFrame,
    cfg: PipelineConfig | None = None,
) -> DataFrame:
    """(token, conv_id, df) — the inverted index, restricted to blockable
    tokens (min_block_df ≤ df ≤ max_block_df), at most
    max_block_tokens_per_conv rarest tokens per conversation."""
    cfg = cfg or PipelineConfig()
    blockable = idf.filter(
        (F.col("df") >= cfg.min_block_df) & (F.col("df") <= cfg.max_block_df)
    ).select("token", "df")
    # No forced broadcast: `blockable` is O(vocab) — tiny here, but a
    # heavy-tailed 10^12-turn vocabulary makes the df∈[2,200] band the
    # BULK of the vocab. AQE broadcasts automatically while it fits under
    # autoBroadcastJoinThreshold and falls back to a shuffled join beyond.
    post = tokens.select("conv_id", "token").distinct().join(blockable, "token")
    if cfg.max_block_tokens_per_conv:
        w = Window.partitionBy("conv_id").orderBy(F.asc("df"), F.asc("token"))
        post = (
            post.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= cfg.max_block_tokens_per_conv)
            .drop("rk")
        )
    return post


def candidate_pairs(post: DataFrame, cfg: PipelineConfig | None = None) -> DataFrame:
    """(conv_id_a, conv_id_b) distinct, a < b.

    Hot posting lists are salted: block key becomes (token, salt) with
    salt = pmod(xxhash64(conv_id), ceil(df / salt_bucket)) — deterministic
    per conv_id so both members of a sub-block agree on the key.

    ``min_shared_tokens`` semantics (round-2 fix of a real recall bug,
    round-3 fix of the resulting cost bug):
    the threshold counts **raw shared blockable tokens, pre-salt** — NOT
    shared (token, salt) keys. Counting post-salt keys undercounts pairs
    whose shared tokens land in different salt sub-blocks. Two rules:

    1. pair *generation* stays salted (the fan-out bound is untouched);
    2. a generated pair qualifies when its TRUE shared-token count (a
       join-back of pairs against the unsalted postings — bounded by
       |pairs| × tokens-per-conv) meets the threshold. The count includes
       hot tokens (the join-back is pre-salt), so a pair sharing one hot
       token plus any other blockable token passes threshold 2.

    Pairs sharing ONLY one salted hot token are admitted only under
    ``cfg.admit_single_salted`` (reference parity: one shared blocking
    key suffices, /root/reference/core/similarity.go:74-79). The round-2
    unconditional bypass re-admitted unbounded hot-token noise into the
    dominant-cost scoring stage — see the cost envelope on the config
    field; threshold now applies uniformly to the true count by default.
    """
    cfg = cfg or PipelineConfig()
    n_salts = F.greatest(
        F.ceil(F.col("df") / F.lit(cfg.salt_bucket)).cast("int"), F.lit(1)
    )
    salted = (
        post.withColumn("n_salts", n_salts)
        .withColumn("salt", F.pmod(F.xxhash64("conv_id"), F.col("n_salts")).cast("int"))
        .select("token", "salt", "conv_id", (F.col("n_salts") > 1).alias("is_salted"))
        # Both sides of the self-join (and the join-back below) read
        # this; materialized EAGERLY or the first downstream action
        # schedules both sides before either has populated a lazy cache
        # and the postings plan (tokenize + distinct + window) runs twice
        # concurrently. localCheckpoint also truncates lineage, so the
        # self-join's driver-side planning sees a LogicalRDD instead of
        # the full upstream DAG (see plans/pipeline.py ckpt docstring).
        .localCheckpoint(eager=True)
    )

    a = salted.alias("a")
    b = salted.alias("b")
    matched = a.join(
        b,
        on=[
            F.col("a.token") == F.col("b.token"),
            F.col("a.salt") == F.col("b.salt"),
            F.col("a.conv_id") < F.col("b.conv_id"),
        ],
    ).select(
        F.col("a.conv_id").alias("conv_id_a"),
        F.col("b.conv_id").alias("conv_id_b"),
        F.col("a.is_salted").alias("is_salted"),
    )
    # distinct pairs + "was any generating key salted" flag
    pairs_raw = matched.groupBy("conv_id_a", "conv_id_b").agg(
        F.max("is_salted").alias("via_salted")
    )
    if cfg.min_shared_tokens <= 1:
        return pairs_raw.drop("via_salted")

    # True shared-token count, pre-salt: join the (already bounded) pair
    # set back against unsalted postings on each side. |pairs| × K rows
    # max (K = max_block_tokens_per_conv) — cheap relative to scoring.
    pa = salted.select(F.col("conv_id").alias("conv_id_a"), "token")
    pb = salted.select(F.col("conv_id").alias("conv_id_b"), "token")
    counted = (
        pairs_raw.join(pa, "conv_id_a")
        .join(pb, ["conv_id_b", "token"])
        .groupBy("conv_id_a", "conv_id_b")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.max("via_salted").alias("via_salted"),
        )
    )
    qualifies = F.col("n_shared") >= cfg.min_shared_tokens
    if cfg.admit_single_salted:
        qualifies = qualifies | F.col("via_salted")
    return counted.filter(qualifies).select("conv_id_a", "conv_id_b")
