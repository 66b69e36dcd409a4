"""cfg.hash_token_features — int64 feature ids for the token stream.

The flag swaps the token string for xxhash64(token) inside run_pipeline
(plans/pipeline.py) so every downstream shuffle of the ~200×-exploded
token stream moves fixed-width longs. These tests pin that the swap is
semantics-preserving end to end: identical clusters with the flag on and
off, in both the default and the structure-aware (typed tokens +
nturns near-miss, the element_at key-domain fix in scoring.py) modes,
and that the coord_density parity gate keeps strings.
"""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType

from address_match_recommend_spark.config import PipelineConfig
from address_match_recommend_spark.datagen import corpus_to_spark, generate_corpus
from address_match_recommend_spark.plans.pipeline import run_pipeline


@pytest.fixture(scope="module")
def transcripts(spark):
    corpus = generate_corpus(n_entities=80, seed=321)
    return corpus_to_spark(spark, corpus)["transcripts"].localCheckpoint()


def _clusters(transcripts, **kw):
    result = run_pipeline(transcripts, PipelineConfig(**kw))
    return sorted(
        (r["conv_id"], r["entity_id"]) for r in result.clusters.collect()
    )


def test_vec_keys_are_long_when_hashed(spark, transcripts):
    result = run_pipeline(
        transcripts, PipelineConfig(hash_token_features=True), until="vectors"
    )
    assert isinstance(result.vectors.schema["vec"].dataType.keyType, LongType)
    assert isinstance(result.idf.schema["token"].dataType, LongType)


def test_clusters_identical_to_string_path(spark, transcripts):
    hashed = _clusters(transcripts, hash_token_features=True)
    strings = _clusters(transcripts, hash_token_features=False)
    assert hashed == strings
    assert len(hashed) > 0


def test_structure_mode_identical(spark, transcripts):
    """Typed tokens + the nturns near-miss lookup (element_at against the
    vec map) must agree across key domains — the scorer re-hashes the
    reconstructed nturns token when the map is long-keyed."""
    hashed = _clusters(transcripts, hash_token_features=True, use_structure=True)
    strings = _clusters(transcripts, hash_token_features=False, use_structure=True)
    assert hashed == strings


def test_coord_density_parity_keeps_strings(spark, transcripts):
    """use_coord_density reads token TEXT off the vec keys (is_text
    rlike) — the pipeline must refuse to hash under that mode."""
    result = run_pipeline(
        transcripts,
        PipelineConfig(hash_token_features=True, use_coord_density=True),
        until="vectors",
    )
    assert isinstance(result.vectors.schema["vec"].dataType.keyType, StringType)
