"""Generator invariants: determinism, schema, planted structure."""

import pandas as pd

from address_match_recommend_spark.datagen import HOT_TOKEN, generate_corpus


def test_deterministic():
    a = generate_corpus(n_entities=6, seed=7)
    b = generate_corpus(n_entities=6, seed=7)
    pd.testing.assert_frame_equal(a.transcripts, b.transcripts)
    pd.testing.assert_frame_equal(a.labeled_pairs, b.labeled_pairs)


def test_schema_and_ordering(tiny_corpus):
    t = tiny_corpus.transcripts
    assert list(t.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(t["turn_idx"].dtype) == "int32"
    # turn_idx contiguous from 0 per conv, ts monotonic
    for _, g in t.groupby("conv_id"):
        idx = g.sort_values("turn_idx")["turn_idx"].tolist()
        assert idx == list(range(len(idx)))
        ts = g.sort_values("turn_idx")["ts"].tolist()
        assert ts == sorted(ts)


def test_clusters_and_pairs(tiny_corpus):
    clusters = tiny_corpus.expected_clusters
    # every entity_id is the min conv_id of its cluster
    mins = clusters.groupby("entity_id")["conv_id"].min()
    assert (mins.index == mins.values).all()
    # at least one cluster has >= 2 members
    assert (clusters.groupby("entity_id").size() >= 2).any()
    pairs = tiny_corpus.labeled_pairs
    assert pairs["label"].any() and (~pairs["label"]).any()
    assert (pairs["conv_id_a"] < pairs["conv_id_b"]).all()
    # labels agree with expected_clusters
    ent = clusters.set_index("conv_id")["entity_id"]
    same = pairs["conv_id_a"].map(ent) == pairs["conv_id_b"].map(ent)
    assert (same == pairs["label"]).all()


def test_planted_features(tiny_corpus):
    t = tiny_corpus.transcripts
    full = " ".join(t["text"])
    assert HOT_TOKEN in full
    g = tiny_corpus.golden_canonical
    # exact duplicates exist (hash-dedup path is exercised)
    assert g["text_hash"].duplicated().any()
