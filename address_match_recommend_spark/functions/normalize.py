"""Text-structure normalization — the reference's interpret-stage string
surgery (C2/C4/C6-C9), re-expressed as generic JVM-side column functions
for transcript text.

The reference parses Chinese addresses with a cascade of regex extractors
that each (a) pull a structured span out of free text and (b) remove it
from the residual (/root/reference/core/interpreter.go:169-200):
brackets (`bracketPattern` :38, extractBrackets :339-362), building
numbers (reBuildingNum0..3 :20-35, extractBuildingNum :218-312), roads
(reROAD :41, extractRoad :452-498), unit-suffix scrub (:192-193),
redundancy removal (:393-450), long-digit-run collapse
(utils.RemoveRepeatNum, /root/reference/utils/string_utils.go:107-129)
and CJK-numeral translation (translateRoadNum,
/root/reference/core/similarity.go:675-774).

Transcript analogs, same extract-and-strip shape, all
whole-stage-codegen `pyspark.sql.functions` except the CJK numeral state
machine (an Arrow-batched pandas UDF, the one genuinely sequential
piece):

- :func:`extract_brackets` / :func:`strip_brackets` — bracketed spans
  (code fences, [tool] tags, parentheticals) pulled out before
  tokenization, re-appendable afterwards like the reference (:194-199).
- :func:`extract_cascade` — ordered regex cascade, first match wins,
  residual returned (the extractBuildingNum/extractRoad shape) for
  structured fields like error codes / step numbers.
- :func:`collapse_repeat_digits` — collapse runs of ≥ n digits
  (RemoveRepeatNum: ids/hashes carry no similarity signal).
- :func:`scrub_suffixes` — delete unit-like `\\d+<suffix>` fragments.
- :func:`normalize_fullwidth` — full-width digits/letters → ASCII.
- :func:`cjk_numeral_to_int` — Chinese numerals → int (十-positional
  state machine, same semantics as translateRoadNum, original
  implementation).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

#: the reference's 9 bracket styles (core/interpreter.go:38) — open and
#: close classes, ASCII + full-width + CJK corners
_OPEN = r"(（{<〈\[【「"
_CLOSE = r")）}>〉\]】」"
BRACKET_RE = f"[{_OPEN}][^{_CLOSE}]*[{_CLOSE}]"

FULLWIDTH_DIGITS = "０１２３４５６７８９"
ASCII_DIGITS = "0123456789"

#: the reference's dash-variant table (prepare, core/interpreter.go:203-215):
#: CJK long sound mark, underscore, full-width hyphen, em dash, ASCII and
#: full-width slash — all folded to '-'
DASH_VARIANTS = "ー_－—/／"


def normalize_dashes(col: Column) -> Column:
    """Fold every dash variant to ASCII '-' — the table-translate half of
    C1 ``prepare`` (/root/reference/core/interpreter.go:203-215). The
    reference computes this but discards the result (Go ReplaceAll return
    value unused — a latent bug, SURVEY §2.9); we implement the documented
    intent. One ``translate`` inside whole-stage codegen."""
    return F.translate(col, DASH_VARIANTS, "-" * len(DASH_VARIANTS))


def prepare_text(col: Column) -> Column:
    """C1 ``prepare`` analog (/root/reference/core/interpreter.go:203-215):
    trim a leading digit/letter garbage run (the reference trims leading
    digits, letters and punctuation noise before parsing), then normalize
    dash variants. Transcript analog: strip a leading message-id/counter
    prefix so it never pollutes blocking tokens."""
    return normalize_dashes(F.regexp_replace(col, r"^[0-9A-Za-z]+\s*", ""))


def extract_brackets(col: Column) -> Column:
    """array<string> of every bracketed span (contents including the
    brackets), in order — C4's FindAllString (:345)."""
    return F.regexp_extract_all(col, F.lit(f"({BRACKET_RE})"), 1)


def strip_brackets(col: Column) -> Column:
    """Text with every bracketed span removed — C4's ReplaceAllString
    (:357). Compose: brackets = extract_brackets(text);
    residual = strip_brackets(text); re-append after region/road
    extraction like the reference (:194-199)."""
    return F.regexp_replace(col, BRACKET_RE, "")


def extract_cascade(col: Column, patterns: list[str]) -> Column:
    """First-match-wins over an ordered pattern cascade
    (extractBuildingNum's reBuildingNum0..3 shape, :218-312): returns the
    first pattern's first match, or '' when none match. Pure F.when chain
    — stays in codegen."""
    out = F.lit("")
    for pat in reversed(patterns):
        m = F.regexp_extract(col, pat, 0)
        out = F.when(m != "", m).otherwise(out)
    return out


def remove_first_match(col: Column, patterns: list[str]) -> Column:
    """Residual text after deleting the cascade's winning match — the
    'matched span is removed from the text' half of every reference
    extractor.

    Round-3 fix (ADVICE r2): deletes only the FIRST occurrence of the
    winning pattern's extracted span, matching ``extract_cascade`` which
    extracts only the first match — a global regexp_replace silently
    dropped spans that were never extracted. Implementation: locate the
    extracted span literally (``instr``) and splice it out with
    ``overlay``. The literal first occurrence coincides with the regex
    match except for context-anchored patterns whose matched string also
    appears earlier unmatched — acceptable for the extractor cascade's
    self-contained patterns, and exact for the reference's (the Go code
    removes by matched-span position, core/interpreter.go:218-312)."""
    # apply only the first matching pattern: when pattern i matches,
    # delete its first occurrence and stop (nested whens mirror the Go
    # early-return)
    result = col
    for pat in reversed(patterns):
        m = F.regexp_extract(col, pat, 0)
        pos = F.instr(col, m)
        spliced = F.overlay(col, F.lit(""), pos, F.length(m))
        result = F.when((m != "") & (pos > 0), spliced).otherwise(result)
    return result


def remove_repeated_span(col: Column, span: Column) -> Column:
    """C6 ``removeRedundancy`` analog (/root/reference/core/interpreter.go:
    393-450): the reference re-scans the residual text for a repeated
    mention of an already-extracted span (province/city re-stated mid-
    address) and deletes the redundant occurrence. Transcript analog: a
    span already extracted from the conversation (a quoted system
    preamble, a replayed tool tag) re-occurring in the residual carries
    no similarity signal — delete every literal occurrence of it.

    ``span`` is the already-extracted text (every occurrence left in the
    residual is by definition redundant — the extraction consumed the
    authoritative one). Empty/null spans leave the text unchanged.
    JVM-side only: one ``replace`` call inside whole-stage codegen."""
    return F.when(
        span.isNull() | (span == ""), col
    ).otherwise(F.replace(col, span, F.lit("")))


def collapse_repeat_digits(col: Column, n: int = 6) -> Column:
    """Delete digit runs of length ≥ n (RemoveRepeatNum,
    utils/string_utils.go:107-129): long ids/hashes/phone numbers carry
    no similarity signal and pollute blocking."""
    return F.regexp_replace(col, rf"[0-9]{{{n},}}", "")


def scrub_suffixes(col: Column, suffixes: list[str]) -> Column:
    """Delete `\\d+<suffix>` fragments (the reference's unit-suffix scrub,
    core/interpreter.go:192-193: \\d+(单元|楼|室|层|米|户|#)). Transcript
    callers pass e.g. ["ms", "px", "kb"] to drop measurement noise."""
    alt = "|".join(suffixes)
    return F.regexp_replace(col, rf"[0-9]+({alt})", "")


def normalize_fullwidth(col: Column) -> Column:
    """Full-width digits → ASCII (the table-translate half of C9;
    reference translateRoadNum handles ０-９ inline,
    core/similarity.go:692-711)."""
    return F.translate(col, FULLWIDTH_DIGITS, ASCII_DIGITS)


#: Chinese numeral values for the state machine
_CJK_DIGITS = {
    "零": 0, "一": 1, "二": 2, "三": 3, "四": 4,
    "五": 5, "六": 6, "七": 7, "八": 8, "九": 9,
}


def _cjk_to_int(s: str) -> int:
    """十-positional parse, same semantics as the reference's
    translateRoadNum state machine (core/similarity.go:675-774):
    一十二 → 12, 二十 → 20, 十五 → 15; ASCII/full-width digits pass
    through; unparseable → 0. Original implementation."""
    if not s:
        return 0
    s = s.translate(str.maketrans(FULLWIDTH_DIGITS, ASCII_DIGITS))
    if s.isdigit():
        return int(s)
    total, current = 0, 0
    for ch in s:
        if ch in _CJK_DIGITS:
            current = current * 10 + _CJK_DIGITS[ch]
        elif ch == "十":
            total += (current if current else 1) * 10
            current = 0
        elif ch == "百":
            total += (current if current else 1) * 100
            current = 0
        elif ch.isdigit():
            current = current * 10 + int(ch)
        else:
            return 0
    return total + current


def cjk_numeral_to_int():
    """pandas UDF Series[str] → Series[int]: Chinese/full-width numerals
    to integers (C9). The one sequential state machine in this module —
    Arrow-batched, never per-row Python."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fn(s):
        return s.map(lambda x: _cjk_to_int(x or ""))

    # set real (non-string) annotations: `from __future__ import
    # annotations` stringifies inline hints, which pandas_udf can't resolve
    _fn.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_fn, "int")
