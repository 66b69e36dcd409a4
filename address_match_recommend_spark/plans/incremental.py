"""Incremental append — the reference's write path, distributed.

The reference's ``ImportAddr`` (/root/reference/core/similarity.go:551-581)
parses one new address, inserts it, and sets the Bloom filter; new records
join the corpus without rescoring everything. At 10^12 turns the same
property is essential: an appended batch of transcripts must NOT trigger a
full re-canonicalize / re-score of the old corpus.

Strategy (anti-join + re-cluster of affected blocks, SURVEY §2.10):

1. Canonicalize ONLY the new batch; anti-join on conv_id drops replays.
2. Exact duplicates of existing canonical texts (hash join on text_hash)
   link straight to their representative — zero scoring, the Bloom fast
   path generalized.
3. Genuinely new conversations are tokenized and weighted with the
   EXISTING IDF dictionary (unseen tokens get MissingIdf, the reference's
   own semantics, /root/reference/core/similarity.go:19). The corpus IDF
   is NOT refit per batch — identical to the reference, which computes IDF
   from the stored corpus, and it keeps old vectors valid. Refit on a
   cadence (e.g. after corpus grows 2×) with a full run.
4. Candidate pairs = new postings ⋈ (old ∪ new) postings on blocking
   token — only blocks CONTAINING a new conversation produce pairs; the
   old corpus's pairs are never regenerated.
5. Prior clustering re-enters as star edges (conv_id → entity_id), which
   are connectivity-equivalent to the full old edge set, so connected
   components over {star edges ∪ new match edges ∪ new dup edges}
   correctly merges old clusters that a new conversation bridges.

Every input here is a checkpointed stage of the previous run
(conversations, representatives, idf, postings, clusters) — the
incremental job reads the ledger, never the old raw turns.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F

from ..config import PipelineConfig
from ..functions.tokenize import explode_tokens
from ..operators.blocking import postings as build_postings
from ..operators.canonicalize import canonicalize
from ..operators.clustering import connected_components
from ..operators.dedup import dedup_exact
from ..operators.scoring import score_pairs
from ..operators.tfidf import tfidf_vectors


@dataclass
class IncrementalResult:
    conversations: DataFrame  # full updated corpus
    representatives: DataFrame
    postings: DataFrame  # full updated inverted index
    new_pairs: DataFrame
    scored: DataFrame
    clusters: DataFrame  # full updated clustering
    metrics: dict
    # batch DELTAS (what this update ADDED, disjoint from the prev state)
    # — streaming/incremental.py persists these per micro-batch instead
    # of rewriting the O(corpus) full frames
    new_conversations: DataFrame | None = None
    new_representatives: DataFrame | None = None
    new_postings: DataFrame | None = None


def incremental_update(
    prev_conversations: DataFrame,
    prev_representatives: DataFrame,
    prev_idf: DataFrame,
    prev_postings: DataFrame,
    prev_clusters: DataFrame,
    new_transcripts: DataFrame,
    cfg: PipelineConfig | None = None,
) -> IncrementalResult:
    cfg = cfg or PipelineConfig()

    # 1. canonicalize the batch only; drop conv_ids we already have
    new_conv = canonicalize(new_transcripts, cfg).join(
        prev_conversations.select("conv_id"), "conv_id", "left_anti"
    ).persist()
    n_new = new_conv.count()

    conversations = prev_conversations.unionByName(new_conv)

    # 2. exact duplicates of EXISTING texts → direct edge to representative
    prev_hashes = prev_representatives.select(
        "text_hash", F.col("conv_id").alias("rep_id")
    )
    dup_edges_old = (
        new_conv.select("conv_id", "text_hash")
        .join(prev_hashes, "text_hash")
        .select(
            F.least("conv_id", "rep_id").alias("conv_id_a"),
            F.greatest("conv_id", "rep_id").alias("conv_id_b"),
        )
    )
    # representatives among the new batch itself (intra-batch dups collapse)
    new_reps = dedup_exact(new_conv).join(
        prev_hashes.select("text_hash"), "text_hash", "left_anti"
    ).persist()
    representatives = prev_representatives.unionByName(new_reps)
    dup_edges_new = (
        new_conv.select("conv_id", "text_hash")
        .join(
            new_reps.select("text_hash", F.col("conv_id").alias("rep_id")),
            "text_hash",
        )
        .filter(F.col("conv_id") != F.col("rep_id"))
        .select(
            F.least("conv_id", "rep_id").alias("conv_id_a"),
            F.greatest("conv_id", "rep_id").alias("conv_id_b"),
        )
    )

    # 3. tokenize new reps; weight with the existing (broadcast) IDF —
    #    unseen tokens take cfg.missing_idf inside tfidf_vectors
    new_tokens = explode_tokens(new_reps, cfg).persist()
    new_tokens.count()
    new_vectors = tfidf_vectors(new_tokens, prev_idf, cfg)

    # Blocking IDF: tokens the old corpus never saw (e.g. the signature
    # vocabulary of a brand-new entity) must still block within the batch,
    # or duplicates arriving together could never pair. Their df is the
    # batch-local document frequency; their idf is MissingIdf.
    from ..operators.tfidf import document_frequency

    unseen_df = (
        document_frequency(new_tokens)
        .join(prev_idf.select("token"), "token", "left_anti")
        # Index unseen tokens IMMEDIATELY, even at batch df 1 — the
        # reference inserts every record's tokens into the index on
        # ImportAddr (/root/reference/core/similarity.go:551-581).
        # min_block_df assumes a static corpus, where a df-1 token can
        # never produce a pair; here a FUTURE batch can arrive sharing
        # the token, and because the IDF is bootstrap-frozen the token
        # stays "unseen" forever — dropping it would silently lose the
        # pair and make recall depend on how arrivals were split into
        # micro-batches (pinned by the streaming split-invariance
        # test). Clamping df up to min_block_df admits the token to
        # the blockable band; the max_block_df hot-token cap still
        # applies to the true batch-local df.
        .withColumn("df", F.greatest(F.col("df"), F.lit(cfg.min_block_df)))
        .withColumn("idf", F.lit(float(cfg.missing_idf)))
    )
    blocking_idf = prev_idf.select("token", "df", "idf").unionByName(unseen_df)

    # 4. pairs only from blocks containing a new conversation
    new_post = build_postings(new_tokens, blocking_idf, cfg)
    all_post = prev_postings.unionByName(new_post).persist()
    all_post.count()
    postings_new_side = new_post.select(
        "token", F.col("conv_id").alias("new_id")
    )
    matched = (
        postings_new_side.join(all_post, "token")
        .filter(F.col("new_id") != F.col("conv_id"))
        .select(
            "token",
            F.least("new_id", "conv_id").alias("conv_id_a"),
            F.greatest("new_id", "conv_id").alias("conv_id_b"),
        )
        .distinct()  # new↔new pairs arrive in both join directions
    )
    pairs = (
        matched.groupBy("conv_id_a", "conv_id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= max(cfg.min_shared_tokens, 1))
        .drop("n_shared")
    )

    # old-side vectors: only partners that actually appear in a pair
    partner_ids = (
        pairs.select(F.col("conv_id_a").alias("conv_id"))
        .unionByName(pairs.select(F.col("conv_id_b").alias("conv_id")))
        .distinct()
        .join(new_reps.select("conv_id"), "conv_id", "left_anti")
    )
    old_partner_tokens = explode_tokens(
        prev_representatives.join(partner_ids, "conv_id", "left_semi"), cfg
    )
    old_vectors = tfidf_vectors(old_partner_tokens, prev_idf, cfg)
    vectors = new_vectors.unionByName(old_vectors).persist()
    vectors.count()

    scored = score_pairs(pairs, vectors, representatives, cfg)
    match_edges = scored.filter(F.col("is_match")).select("conv_id_a", "conv_id_b")

    # 5. prior clusters as star edges + all new edges → merged components
    star_edges = prev_clusters.filter(
        F.col("conv_id") != F.col("entity_id")
    ).select(
        F.col("conv_id").alias("conv_id_a"), F.col("entity_id").alias("conv_id_b")
    )
    edges = (
        match_edges.unionByName(dup_edges_old)
        .unionByName(dup_edges_new)
        .unionByName(star_edges)
    )
    components = connected_components(edges, cfg=cfg)
    clusters = (
        conversations.select("conv_id")
        .join(components, "conv_id", "left")
        .select(
            "conv_id",
            F.coalesce(F.col("entity_id"), F.col("conv_id")).alias("entity_id"),
        )
    )

    return IncrementalResult(
        conversations=conversations,
        representatives=representatives,
        postings=all_post,
        new_pairs=pairs,
        scored=scored,
        clusters=clusters,
        metrics={"n_new_conversations": n_new},
        new_conversations=new_conv,
        new_representatives=new_reps,
        new_postings=new_post,
    )
