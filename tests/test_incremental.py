"""Incremental append (reference ImportAddr path, S6): appending a batch
must produce the same clustering as a full-batch rerun, without
re-canonicalizing or re-scoring the old corpus."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from address_match_recommend_spark.datagen import (
    TRANSCRIPTS_DDL,
    corpus_to_spark,
    generate_corpus,
)
from address_match_recommend_spark.plans.incremental import incremental_update
from address_match_recommend_spark.plans.pipeline import run_pipeline


def _partition(df) -> set[frozenset]:
    """Cluster partitioning as a set of frozensets (id-convention-free)."""
    groups: dict[str, set] = {}
    for r in df.collect():
        groups.setdefault(r["entity_id"], set()).add(r["conv_id"])
    return {frozenset(v) for v in groups.values()}


@pytest.fixture(scope="module")
def split_corpus(spark):
    """Corpus of 20 entities; batch B holds every conversation of the last
    6 entities (brand-new entities arriving later) plus 2 extra duplicate
    conversations of old entities (cluster-growing appends)."""
    corpus = generate_corpus(n_entities=20, seed=1234)
    tr = corpus.transcripts
    clusters = corpus.expected_clusters
    entities = sorted(clusters["entity_id"].unique())
    new_entities = set(entities[-6:])
    new_convs = set(
        clusters[clusters["entity_id"].isin(new_entities)]["conv_id"]
    )
    # two extra dups of old entities: highest conv_id of first two old ents
    for ent in entities[:2]:
        members = sorted(clusters[clusters["entity_id"] == ent]["conv_id"])
        new_convs.add(members[-1])
    batch_mask = tr["conv_id"].isin(new_convs)
    old_tr = spark.createDataFrame(tr[~batch_mask], schema=TRANSCRIPTS_DDL)
    new_tr = spark.createDataFrame(tr[batch_mask], schema=TRANSCRIPTS_DDL)
    full = corpus_to_spark(spark, corpus)
    return old_tr, new_tr, full


def test_incremental_matches_full_batch(spark, split_corpus):
    old_tr, new_tr, full = split_corpus
    prev = run_pipeline(old_tr)
    inc = incremental_update(
        prev.conversations,
        prev.representatives,
        prev.idf,
        prev.postings,
        prev.clusters,
        new_tr,
    )
    from address_match_recommend_spark.plans.evaluate import pairwise_f1

    # the incremental clustering must pass the same F1 gate as a full
    # batch run (exact partition equality is NOT required: the batch run
    # refits IDF over the union, so borderline cosines can differ)
    f1 = pairwise_f1(full["labeled_pairs"], inc.clusters)["f1"]
    assert f1 >= 0.99, f1

    batch = run_pipeline(full["transcripts"])
    f1_batch = pairwise_f1(full["labeled_pairs"], batch.clusters)["f1"]
    assert f1_batch >= 0.99, f1_batch
    # new pairs never touch two old conversations
    old_ids = {r["conv_id"] for r in prev.conversations.select("conv_id").collect()}
    new_ids = {r["conv_id"] for r in inc.conversations.select("conv_id").collect()} - old_ids
    for r in inc.new_pairs.collect():
        assert r["conv_id_a"] in new_ids or r["conv_id_b"] in new_ids


def test_incremental_replay_is_noop(spark, split_corpus):
    """Re-appending already-ingested transcripts changes nothing (the
    anti-join replay guard)."""
    old_tr, _, _ = split_corpus
    prev = run_pipeline(old_tr)
    inc = incremental_update(
        prev.conversations,
        prev.representatives,
        prev.idf,
        prev.postings,
        prev.clusters,
        old_tr,  # replay of the same batch
    )
    assert inc.metrics["n_new_conversations"] == 0
    assert _partition(inc.clusters) == _partition(prev.clusters)
