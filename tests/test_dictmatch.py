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


# --- dictionary segmenter (C12 full analog, VERDICT r3 next #3) --------

REGION_DICT = (
    # region/community entries a gse-style dictionary would carry
    # (/root/reference/index/index_test.go:10-56 hard cases)
    "山东", "青岛", "青岛市", "李沧区", "延川路", "绿城城园东区",
    "北京", "海淀区", "丹棱街", "创富大厦",
    "四川省", "成都", "高新", "博士公馆",
    "新疆", "阿克苏地区", "阿拉尔市", "新苑祥和小区",
    "湖南", "湘潭市", "湘潭县", "易俗河镇", "中南建材市场",
)


def _segment(spark, texts, dictionary=REGION_DICT, **cfg_kw):
    from address_match_recommend_spark.config import PipelineConfig
    from address_match_recommend_spark.functions.tokenize import explode_tokens

    cfg = PipelineConfig(dictionary=dictionary, **cfg_kw)
    df = spark.createDataFrame(
        [(f"c{i}", t) for i, t in enumerate(texts)],
        "conv_id string, canonical_text string",
    )
    out = explode_tokens(df, cfg)
    rows = out.orderBy("conv_id", "pos").collect()
    by_id = {}
    for r in rows:
        by_id.setdefault(r["conv_id"], []).append(r["token"])
    return [by_id.get(f"c{i}", []) for i in range(len(texts))]


def test_dict_segmenter_reference_hard_cases(spark):
    """Goldens on the reference's own test addresses: dictionary entries
    segment as units, digit runs fall back to the regex tokenizer, and
    non-dictionary CJK residue (号/楼/单元/户 unit suffixes) is skipped —
    exactly the gse + SimpleSegmenter split."""
    got = _segment(
        spark,
        [
            "山东青岛李沧区延川路116号绿城城园东区7号楼2单元802户",
            "北京海淀区丹棱街18号创富大厦1106",
            "四川省成都高新博士公馆",
        ],
    )
    assert got[0] == [
        "山东", "青岛", "李沧区", "延川路", "116",
        "绿城城园东区", "7", "2", "802",
    ]
    assert got[1] == ["北京", "海淀区", "丹棱街", "18", "创富大厦", "1106"]
    assert got[2] == ["四川省", "成都", "高新", "博士公馆"]


def test_dict_segmenter_greedy_longest_match(spark):
    """青岛市南区: with both 青岛 and 青岛市 in the dictionary the greedy
    longest match consumes 青岛市 (reference longest-first alias order,
    models/region.go:53-87) — 南区 isn't an entry, so it's residue."""
    (got,) = _segment(spark, ["青岛市南区"])
    assert got == ["青岛市"]


def test_dict_segmenter_mixed_ascii_fallback(spark):
    """ASCII spans between dictionary hits go through the regex fallback
    with stopword/min-length filtering intact."""
    (got,) = _segment(
        spark,
        ["deploy failed in 北京 region us-east-1 the end"],
        stopwords=("the", "in"),
    )
    assert got == ["deploy", "failed", "北京", "region", "us", "east", "1", "end"]


def test_dict_segmenter_default_mode_unchanged(spark):
    """Empty dictionary keeps the JVM regex path byte-identical."""
    from address_match_recommend_spark.config import PipelineConfig
    from address_match_recommend_spark.functions.tokenize import explode_tokens

    df = spark.createDataFrame(
        [("c0", "Alpha beta-42 GAMMA")], "conv_id string, canonical_text string"
    )
    base = [tuple(r) for r in explode_tokens(df, PipelineConfig()).collect()]
    assert base == [("c0", 0, "alpha"), ("c0", 1, "beta"), ("c0", 2, "42"), ("c0", 3, "gamma")]
    plan = explode_tokens(df, PipelineConfig())._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
