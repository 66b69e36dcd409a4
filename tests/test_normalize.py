"""Text-structure normalization (reference C2/C4/C6-C9 analogs) — golden
assertions in the style of the reference's only true unit tests
(/root/reference/core/interpreter_test.go:114-137 bracket/scrub goldens,
utils/string_utils_test.go rune-safety)."""

from __future__ import annotations

from pyspark.sql import functions as F

from address_match_recommend_spark.functions.normalize import (
    cjk_numeral_to_int,
    collapse_repeat_digits,
    extract_brackets,
    extract_cascade,
    normalize_dashes,
    normalize_fullwidth,
    prepare_text,
    remove_first_match,
    scrub_suffixes,
    strip_brackets,
    _cjk_to_int,
)


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).first()["v"]


def test_extract_brackets_all_styles(spark):
    """Golden in the reference's style (interpreter_test.go:114-127):
    every bracket style extracted, residual clean."""
    text = "run (aa) then [bb] and {cc} plus <dd> done"
    got = _one(spark, extract_brackets(F.lit(text)))
    assert got == ["(aa)", "[bb]", "{cc}", "<dd>"]
    residual = _one(spark, strip_brackets(F.lit(text)))
    assert residual == "run  then  and  plus  done"


def test_extract_brackets_cjk_styles(spark):
    text = "地址（北京）【朝阳】「详情」"
    got = _one(spark, extract_brackets(F.lit(text)))
    assert got == ["（北京）", "【朝阳】", "「详情」"]
    assert _one(spark, strip_brackets(F.lit(text))) == "地址"


def test_extract_cascade_first_match_wins(spark):
    pats = [r"error code [0-9]+", r"step [0-9]+", r"[0-9]+ms"]
    assert (
        _one(spark, extract_cascade(F.lit("at step 3 error code 500"), pats))
        == "error code 500"
    )
    assert _one(spark, extract_cascade(F.lit("took 42ms at step 3"), pats)) == "step 3"
    assert _one(spark, extract_cascade(F.lit("took 42ms only"), pats)) == "42ms"
    assert _one(spark, extract_cascade(F.lit("nothing here"), pats)) == ""


def test_remove_first_match(spark):
    pats = [r"error code [0-9]+", r"step [0-9]+"]
    assert (
        _one(spark, remove_first_match(F.lit("at step 3 error code 500"), pats))
        == "at step 3 "
    )
    assert _one(spark, remove_first_match(F.lit("clean text"), pats)) == "clean text"


def test_remove_first_match_single_occurrence(spark):
    """Round-3 fix (ADVICE r2): only the FIRST occurrence of the winning
    pattern is deleted, mirroring extract_cascade's first-match-only
    extraction — the residual keeps later, never-extracted spans."""
    pats = [r"error code [0-9]+"]
    assert (
        _one(
            spark,
            remove_first_match(
                F.lit("error code 500 then error code 500 again"), pats
            ),
        )
        == " then error code 500 again"
    )


def test_remove_repeated_span(spark):
    """C6 removeRedundancy analog (core/interpreter.go:393-450): every
    residual occurrence of the already-extracted span is deleted."""
    from address_match_recommend_spark.functions.normalize import (
        remove_repeated_span,
    )

    assert (
        _one(
            spark,
            remove_repeated_span(
                F.lit("step a SYS step b SYS step c"), F.lit("SYS")
            ),
        )
        == "step a  step b  step c"
    )
    # empty / null span: unchanged
    assert (
        _one(spark, remove_repeated_span(F.lit("unchanged"), F.lit("")))
        == "unchanged"
    )
    assert (
        _one(
            spark,
            remove_repeated_span(
                F.lit("unchanged"), F.lit(None).cast("string")
            ),
        )
        == "unchanged"
    )


def test_collapse_repeat_digits(spark):
    """RemoveRepeatNum analog (string_utils.go:107-129): runs ≥ n digits
    deleted, shorter runs kept."""
    assert (
        _one(spark, collapse_repeat_digits(F.lit("id 1234567890 room 302"), 6))
        == "id  room 302"
    )
    assert _one(spark, collapse_repeat_digits(F.lit("12345 only"), 6)) == "12345 only"


def test_scrub_suffixes(spark):
    got = _one(
        spark, scrub_suffixes(F.lit("took 120ms and 4kb in run 7"), ["ms", "kb"])
    )
    assert got == "took  and  in run 7"


def test_normalize_fullwidth(spark):
    assert _one(spark, normalize_fullwidth(F.lit("路１２３号"))) == "路123号"


def test_normalize_dashes(spark):
    """C1 prepare dash table (interpreter.go:203-215): every variant
    folds to ASCII '-'."""
    assert _one(spark, normalize_dashes(F.lit("aー b_ c－ d— e/ f／"))) == (
        "a- b_ c- d- e- f-".replace("_", "-")
    )


def test_prepare_text(spark):
    """C1 prepare analog: leading alnum garbage trimmed, dashes folded,
    CJK text untouched."""
    assert _one(spark, prepare_text(F.lit("77x 中山ー路"))) == "中山-路"
    assert _one(spark, prepare_text(F.lit("[a] b"))) == "[a] b"


def test_cjk_numeral_state_machine():
    """translateRoadNum semantics (similarity.go:675-774), pure-python
    goldens (same shape as the reference's inline expectations)."""
    cases = {
        "一": 1, "九": 9, "十": 10, "十五": 15, "二十": 20,
        "二十一": 21, "一十二": 12, "九十九": 99, "一百零三": 103,
        "123": 123, "１２３": 123, "": 0, "abc": 0,
    }
    for s, want in cases.items():
        assert _cjk_to_int(s) == want, (s, want)


def test_cjk_numeral_udf(spark):
    df = spark.createDataFrame(
        [("十五",), ("二十一",), ("１２",), ("7",)], "s string"
    )
    got = [r["n"] for r in df.select(cjk_numeral_to_int()(F.col("s")).alias("n")).collect()]
    assert got == [15, 21, 12, 7]
