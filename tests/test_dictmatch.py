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


# ---------------------------------------------------------------------------
# hierarchical disambiguation — analog of the reference's hard trie cases
# (/root/reference/index/index_test.go:10-56: same village name under
# different towns, resolved by the already-matched parent path)
# ---------------------------------------------------------------------------

HIER = [
    # (term, node_id, parent_id) — two orgs, each with a team and tools;
    # 'deploy' and 'rollback' are ambiguous across orgs
    ("acme", "org.acme", None),
    ("beta", "org.beta", None),
    ("platform", "team.acme.platform", "org.acme"),
    ("platform", "team.beta.platform", "org.beta"),
    ("deploy", "tool.acme.deploy", "team.acme.platform"),
    ("deploy", "tool.beta.deploy", "team.beta.platform"),
    ("rollback", "tool.acme.rollback", "team.acme.platform"),
]


def _hier_hits(spark, text):
    from address_match_recommend_spark.functions.dictmatch import (
        extract_hierarchical_terms,
    )

    df = spark.createDataFrame([("c1", text)], "conv_id string, canonical_text string")
    return {
        (r["term"], r["label"]) for r in extract_hierarchical_terms(df, HIER).collect()
    }


def test_hier_exact_child_wins(spark):
    """'platform deploy' inside an acme conversation resolves to the acme
    tool (visitor priority 1: exact child of the matched parent)."""
    got = _hier_hits(spark, "acme platform deploy")
    assert ("deploy", "tool.acme.deploy") in got
    assert ("platform", "team.acme.platform") in got


def test_hier_other_branch(spark):
    got = _hier_hits(spark, "beta platform deploy")
    assert ("deploy", "tool.beta.deploy") in got
    assert ("platform", "team.beta.platform") in got


def test_hier_missing_level_bridge(spark):
    """'acme ... deploy' with the team level unnamed still resolves deploy
    to the acme branch (visitor priority 2: an ancestor — grandparent —
    already matched bridges the missing level; reference case: province +
    district with the city unnamed, index_test.go:10-56)."""
    got = _hier_hits(spark, "acme says deploy now")
    assert ("deploy", "tool.acme.deploy") in got


def test_hier_repeat_and_fallback(spark):
    """Unanchored ambiguous term falls back to first-indexed item
    (priority 4), and a re-mention keeps the same resolution
    (priority 3)."""
    got = _hier_hits(spark, "deploy then deploy again")
    assert got == {("deploy", "tool.acme.deploy")}
