"""Broadcast-trie dictionary matching (reference J4/C5 analog)."""

from __future__ import annotations

from address_match_recommend_spark.functions.dictmatch import (
    Trie,
    build_trie,
    extract_dictionary_terms,
)


def test_trie_longest_match():
    t = build_trie({"new": "N", "new york": "NY", "new york city": "NYC"})
    # longest-first preference (reference models/region.go:53-87)
    end, payload = t.longest_match("new york city wins", 0)
    assert payload == "NYC" and end == len("new york city")
    end, payload = t.longest_match("new yorker", 0)
    assert payload == "NY"  # 'new york' matches, 'new york city' doesn't
    assert t.longest_match("old york", 0) is None


def test_extract_dictionary_terms(spark):
    rows = [
        ("c1", "ran Bash then web search for spark docs"),
        ("c2", "nothing relevant here"),
        ("c3", "bash bash BASH"),  # repeated + case-insensitive
    ]
    df = spark.createDataFrame(rows, "conv_id string, canonical_text string")
    hits = extract_dictionary_terms(
        df, {"bash": "tool", "web search": "tool", "spark": "tech"}
    )
    got = [(r["id"], r["term"], r["label"], r["pos"]) for r in hits.collect()]
    assert ("c1", "bash", "tool", 4) in got
    assert ("c1", "web search", "tool", 14) in got
    assert ("c1", "spark", "tech", 29) in got
    assert sum(1 for g in got if g[0] == "c3") == 3
    assert not any(g[0] == "c2" for g in got)


def test_overlapping_entries_consume_longest(spark):
    df = spark.createDataFrame(
        [("c1", "san francisco bay area")], "conv_id string, canonical_text string"
    )
    hits = extract_dictionary_terms(
        df, ["san", "san francisco", "francisco bay", "bay area"]
    )
    got = {r["term"] for r in hits.collect()}
    # 'san francisco' consumed first (longest at pos 0) -> 'francisco bay'
    # can't match inside it; 'bay area' still matches after
    assert got == {"san francisco", "bay area"}
